package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Similarity}

/** Cache-lifecycle contract for the LLM operators: each call may
  * persist intermediates, but by the time it returns the ONLY blocks
  * left in the CacheManager are the ones backing the returned
  * (already-materialized) frame — released by the caller's single
  * `.unpersist()`. A library caller looping over corpora/batches must
  * not accumulate cached frames (the round-3 verdict's persist-leak
  * trio).
  *
  * Methodology: diff `sc.getPersistentRDDs` around the call, then
  * unpersist the returned frame and assert every NEW entry is gone —
  * robust to residue other suites leave in the shared session.
  */
class CacheHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.read(spark, sf, "documents")
  private def emb = Tables.read(spark, sf, "embeddings")

  /** Runs `op`, unpersists its result, and asserts no new persistent
    * RDDs survive. Returns the row count so callers can sanity-check
    * the operator actually did work.
    */
  private def assertReleasesAll(op: => DataFrame): Long = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val result = op
    val n = result.count()
    result.unpersist(blocking = true)
    val leaked = sc.getPersistentRDDs.keySet.diff(before)
    assert(leaked.isEmpty,
      s"operator leaked ${leaked.size} persistent RDD(s): " +
        leaked.toSeq.sorted.map(sc.getPersistentRDDs(_).name).mkString(", "))
    n
  }

  /** Like [[assertReleasesAll]] but for operators composing
    * `exactQuantiles` in its default (fire-and-forget) form: the
    * quantile result is an eager localCheckpoint whose blocks
    * ContextCleaner reclaims on GC, so the entry MAY linger in
    * `getPersistentRDDs` after the call — the leak class this suite
    * guards against is the CacheManager persist (never auto-
    * reclaimed), so assert any residue is checkpoint-backed.
    */
  private def assertNoCacheResidue(op: => DataFrame): Long = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val result = op
    val n = result.count()
    result.unpersist(blocking = true)
    val residue = sc.getPersistentRDDs.keySet.diff(before)
    val cached = residue.filterNot(id =>
      sc.getPersistentRDDs.get(id).exists(_.isCheckpointed))
    assert(cached.isEmpty,
      s"operator leaked ${cached.size} NON-checkpoint persistent " +
        s"RDD(s): ${cached.toSeq.sorted
          .map(sc.getPersistentRDDs(_).name).mkString(", ")}")
    n
  }

  test("the exactQuantiles fire-and-forget callers leave no cache entries") {
    // the four composing operators the round-8 advice flagged: each
    // ran the quantile selector in persisted form without releasing
    // it — a long-lived driver looping over corpora accumulated one
    // pinned cache entry per call
    assert(assertNoCacheResidue(graft.llm.CorpusStats.quantileTiers(
      docs, "n_chars", tiers = 4)) > 0)
    assert(assertNoCacheResidue(graft.operators.Profiling.profileNumeric(
      docs, Seq("doc_id", "n_chars"))) > 0)
    assert(assertNoCacheResidue(graft.operators.Profiling.winsorize(
      docs, "source", "n_chars", 0.05, 0.95)) > 0)
    assert(assertNoCacheResidue(graft.llm.Selection.dsirSampleFraction(
      docs, docs.filter(col("doc_id") < 100), "doc_id", "text",
      frac = 0.5)) > 0)
  }

  test("minhashNearDups releases its shingle and signature caches") {
    val n = assertReleasesAll(
      Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.8))
    assert(n > 0)
  }

  test("simhashNearDups releases its chunk cache") {
    val n = assertReleasesAll(
      Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3))
    assert(n > 0)
  }

  test("bloom-prefiltered contaminationCheck releases the eval gram cache") {
    val n = assertReleasesAll(
      Dedup.contaminationCheck(docs.filter(col("doc_id") < 450),
        "doc_id", "text", docs.filter(col("doc_id") >= 450),
        "doc_id", "text", n = 8, bloomFpp = Some(0.01)))
    assert(n > 0)
  }

  test("unigramLogProb releases the hashed-token cache") {
    val n = assertReleasesAll(
      graft.llm.TextAnalysis.unigramLogProb(docs, "doc_id", "text"))
    assert(n > 0)
  }

  test("ngramJaccardNearDups releases its gram and prefix caches") {
    val n = assertReleasesAll(
      Dedup.ngramJaccardNearDups(docs, "doc_id", "text",
        n = 3, threshold = 0.5))
    assert(n > 0)
  }

  test("ivfTopK releases the corpus vector cache") {
    val n = assertReleasesAll(
      Similarity.ivfTopK(emb, emb.limit(3), "vec_id", "vec_id", "embedding",
        k = 5, nlist = 4, nprobe = 4))
    assert(n == 15)
  }

  test("pqTopK releases the normalized-corpus cache") {
    val n = assertReleasesAll(
      Similarity.pqTopK(emb, emb.limit(3), "vec_id", "vec_id", "embedding",
        k = 5, m = 4, ncodes = 8, shortlist = 20))
    assert(n == 15)
  }

  test("cosineNearDups releases the band signature cache") {
    assertReleasesAll(
      Similarity.cosineNearDups(emb, "vec_id", "embedding",
        threshold = 0.4))
  }

  test("probeMinhashIndex and probeIvfIndex release per-batch caches") {
    val mhDir = tmpDir("graft-hyg-mh")
    val corpus = docs.filter($"doc_id" < 400)
    val batch = docs.filter($"doc_id" >= 400)
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", mhDir)
    assertReleasesAll(
      Dedup.probeMinhashIndex(mhDir, corpus, batch, "doc_id", "text"))

    val ivfDir = tmpDir("graft-hyg-ivf")
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", ivfDir, nlist = 4)
    val n = assertReleasesAll(
      Similarity.probeIvfIndex(ivfDir, emb.limit(2), "vec_id", "embedding",
        k = 3, nprobe = 4))
    assert(n == 6)
  }

  test("buildMinhashIndex and buildIvfIndex leave no caches behind") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    Dedup.buildMinhashIndex(docs, "doc_id", "text", tmpDir("graft-hyg-mh2"))
    Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      tmpDir("graft-hyg-ivf2"), nlist = 4)
    val leaked = sc.getPersistentRDDs.keySet.diff(before)
    assert(leaked.isEmpty, s"index build leaked ${leaked.size} RDD(s)")
  }

  test("round-5 operators leave no caches behind") {
    assert(assertReleasesAll(Dedup.removeDuplicatedLines(
      docs.select(col("doc_id"),
        regexp_replace(col("text"), " the ", "\n").as("text")),
      "doc_id", "text")) > 0)
    assert(assertReleasesAll(graft.llm.TextAnalysis.tfidfTopTerms(
      docs, "doc_id", "text", k = 3)) > 0)
    assert(assertReleasesAll(Similarity.groupCentroidAffinity(
      emb.join(docs.select(col("doc_id"), col("source")),
        col("vec_id") === col("doc_id")),
      "source", "embedding")) > 0)
  }

  test("containment join and the round-5 text scorers release caches") {
    assert(assertReleasesAll(Dedup.ngramContainmentJoin(
      docs, "doc_id", "text", n = 3, threshold = 0.7)) > 0)
    assert(assertReleasesAll(graft.llm.TextAnalysis.vocabCoverage(
      docs, "doc_id", "text", vocabSize = 50)) > 0)
    assert(assertReleasesAll(graft.llm.TextAnalysis.bigramLogProb(
      docs, "doc_id", "text")) > 0)
  }

  test("trainBpeMerges leaves no caches behind") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val merges = graft.llm.Bpe.trainBpeMerges(
      docs.filter(col("doc_id") < 50), "text", numMerges = 4)
    val leaked = sc.getPersistentRDDs.keySet.diff(before)
    assert(leaked.isEmpty, s"bpe training leaked ${leaked.size} RDD(s)")
    assert(merges.size == 4)
  }

  test("ivf-pq build leaves no caches; probe releases its probe cache") {
    val sc = spark.sparkContext
    val dir = tmpDir("graft-hyg-ivfpq")
    val before = sc.getPersistentRDDs.keySet
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", dir,
      nlist = 4, m = 8, ncodes = 16)
    val leaked = sc.getPersistentRDDs.keySet.diff(before)
    assert(leaked.isEmpty, s"ivf-pq build leaked ${leaked.size} RDD(s)")
    val n = assertReleasesAll(
      Similarity.probeIvfPqIndex(dir, emb.limit(2), "vec_id",
        "embedding", k = 3, nprobe = 4, shortlist = 10))
    assert(n == 6)
  }

  test("corpusDataCard releases its base projection") {
    val n = assertReleasesAll(graft.llm.DataCard.corpusDataCard(
      docs, "doc_id", "text", "lang", "source"))
    assert(n > 0)
  }

  test("gramNoveltyAgainst releases its batch gram cache; lazy form persists nothing") {
    val sc = spark.sparkContext
    val gs = Dedup.buildGramSet(docs.filter(col("doc_id") < 300),
      "doc_id", "text", n = 5).persist()
    gs.count()
    try {
      val n = assertReleasesAll(Dedup.gramNoveltyAgainst(
        docs.filter(col("doc_id") >= 300), gs, "doc_id", "text",
        n = 5))
      assert(n > 0)
      // the per-micro-batch form must not cache at all — a streaming
      // gate calls it once per batch forever
      val before = sc.getPersistentRDDs.keySet
      val lazyRes = Dedup.gramNoveltyAgainst(
        docs.filter(col("doc_id") >= 300), gs, "doc_id", "text",
        n = 5, materialize = false)
      assert(lazyRes.count() == n)
      assert(sc.getPersistentRDDs.keySet.diff(before).isEmpty,
        "lazy gramNoveltyAgainst must persist nothing")
    } finally { gs.unpersist(blocking = true); () }
  }

  test("checkpointTracked carries MEASURED stats and survives deep iteration") {
    // localCheckpoint freezes the pre-checkpoint plan ESTIMATE into
    // the LogicalRDD leaf; Catalyst's size-only estimator multiplies
    // sizeInBytes through inner joins, so an iterative self-joining
    // loop compounds the estimate quadratically per round until the
    // BigInt overflows its 2^31-bit ceiling at ~25 rounds (measured:
    // the distributed dupClusters loop at maxIter=45 died in PLANNING
    // with "BigInteger would overflow supported range"). The fix
    // replaces the frozen estimate with the measured block size.
    val base = spark.range(1000).select(
      col("id"), (col("id") % 7).as("k"))
    // 1) the checkpointed leaf's stats are the measured size: small
    //    (kilobytes), not the pre-checkpoint estimate and not
    //    defaultSizeInBytes (Long.MaxValue)
    val (cp0, rdds0) = graft.operators.Lineage.checkpointTracked(base)
    val leafStats = cp0.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(leafStats > 0 && leafStats < 10L * 1024 * 1024,
      s"expected measured-kilobyte stats, got $leafStats")
    rdds0.foreach(_.unpersist(blocking = false))
    // 2) 30 rounds of checkpoint + self-join must keep PLANNING alive
    //    (pre-fix this overflowed at ~25) and keep stats bounded
    var cur = base
    var rdds = Seq.empty[org.apache.spark.rdd.RDD[_]]
    try {
      (1 to 30).foreach { _ =>
        val joined = cur.as("a").join(cur.as("b"), "k")
          .groupBy(col("k")).agg(min(col("a.id")).as("id"))
          .select(col("id"), col("k"))
        val (next, nextRdds) = graft.operators.Lineage.checkpointTracked(joined)
        rdds.foreach(_.unpersist(blocking = false))
        rdds = nextRdds
        cur = next
      }
      val finalStats = cur.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(finalStats.bitLength < 64,
        s"stats compounded across rounds: ${finalStats.bitLength} bits")
      assert(cur.count() == 7)
    } finally rdds.foreach(_.unpersist(blocking = false))
  }
}

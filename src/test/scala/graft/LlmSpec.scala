package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Unit coverage for the LLM-pipeline operators beyond what the
  * correctness gate proves: deterministic winners, LSH recall under
  * approximation (nprobe < nlist), and the multimodal batch path.
  */
class LlmSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.read(spark, sf, "documents")
  private def emb = Tables.read(spark, sf, "embeddings")

  test("exactDedup keeps the smallest id per duplicated content") {
    val corpus = docs.select("doc_id", "text").unionByName(
      docs.filter($"doc_id" < 10)
        .select(($"doc_id" + 1000).as("doc_id"), $"text"))
    val deduped = Dedup.exactDedup(corpus, "doc_id", "text")
    assert(deduped.count() == docs.count())
    // every surviving duplicate must be the original (small) id
    assert(deduped.filter($"doc_id" >= 1000).count() == 0)
  }

  test("minhash candidates never include a sub-threshold false positive") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      threshold = 0.8).collect()
    assert(pairs.forall(_.getDouble(2) >= 0.8))
    assert(pairs.nonEmpty)
  }

  test("map-side pair sketch cut yields the identical pair set") {
    // force the sketch cut ON below its corpus knee (the conf's <= 0 /
    // tiny value path) and pin row identity against the default
    // (cut-off at this corpus size) run — the cut is a prefilter with
    // the funnel's 6σ recall contract; survivors are exact-verified,
    // so the returned pairs must be byte-identical either way
    def run() = Dedup.minhashNearDups(docs, "doc_id", "text",
      threshold = 0.8)
    val dflt = run().as[(Long, Long, Double)].collect().toSet
    spark.conf.set("graft.dedup.pairSketchMinCorpus", "1")
    try {
      val cut = run().as[(Long, Long, Double)].collect().toSet
      assert(cut == dflt,
        s"sketch-cut pair set diverged: only-default " +
          s"${(dflt -- cut).take(3)}, only-cut ${(cut -- dflt).take(3)}")
      assert(cut.nonEmpty)
    } finally spark.conf.unset("graft.dedup.pairSketchMinCorpus")
  }

  test("estimate-join semi-filter yields the identical pair set") {
    // graft.dedup.estimateSemiJoinMinCorpus gates the r14 shape that
    // materializes the candidate set and semi-joins the signature
    // cache down to candidate ids before the two estimate joins (one
    // corpus-sized scan instead of two). The estimate joins only ever
    // match candidate ids, so restricting their scan side is a pure
    // plan change — pairs must be byte-identical to the default
    // (below-knee, two-full-scans) path on this corpus
    def run() = Dedup.minhashNearDups(docs, "doc_id", "text",
      threshold = 0.8)
    val dflt = run().as[(Long, Long, Double)].collect().toSet
    spark.conf.set("graft.dedup.estimateSemiJoinMinCorpus", "1")
    try {
      val semi = run().as[(Long, Long, Double)].collect().toSet
      assert(semi == dflt,
        s"estimate-semi pair set diverged: only-default " +
          s"${(dflt -- semi).take(3)}, only-semi ${(semi -- dflt).take(3)}")
      assert(semi.nonEmpty)
    } finally spark.conf.unset("graft.dedup.estimateSemiJoinMinCorpus")
  }

  test("one-buffer signature aggregate yields the identical pair set") {
    // graft.dedup.sigAgg (the default) swaps 128 codegen'd MIN
    // aggregates for one typed aggregate over a primitive long[] —
    // same affine family, so signatures (and therefore bands,
    // candidates, and verified pairs) must be byte-identical to the
    // per-column MIN formulation (the opt-out arm)
    def run() = Dedup.minhashNearDups(docs, "doc_id", "text",
      threshold = 0.8)
    val agg = run().as[(Long, Long, Double)].collect().toSet
    spark.conf.set("graft.dedup.sigAgg", "false")
    val mins =
      try run().as[(Long, Long, Double)].collect().toSet
      finally spark.conf.unset("graft.dedup.sigAgg")
    assert(agg == mins,
      s"sigAgg pair set diverged: only-mins ${(mins -- agg).take(3)}, " +
        s"only-agg ${(agg -- mins).take(3)}")
    assert(agg.nonEmpty)
  }

  test("OPH signature family finds the identical verified pair set") {
    // a DIFFERENT hash family (one-permutation + rotation
    // densification): signatures, bands, and candidates all differ
    // from the affine family's, but at these parameters both
    // families' LSH recall is 1 on this corpus and every survivor is
    // exact-verified — so the RETURNED pair sets (with exact
    // jaccards) must agree, and misuse must fail loudly
    def run(fam: String) = Dedup.minhashNearDups(docs, "doc_id",
        "text", threshold = 0.8, sigFamily = fam)
      .as[(Long, Long, Double)].collect().toSet
    val affine = run("affine")
    val oph = run("oph")
    assert(oph == affine,
      s"family pair sets diverged: only-affine ${(affine -- oph).take(3)}, " +
        s"only-oph ${(oph -- affine).take(3)}")
    assert(oph.nonEmpty)
    intercept[graft.exceptions.InvalidArgumentValue] {
      Dedup.minhashNearDups(docs, "doc_id", "text", sigFamily = "simd")
    }
  }

  test("dupClusters labels chains with their min id; dedup keeps one per cluster") {
    // chain 1~2~3 plus isolated pair 7~8: components {1,2,3} and {7,8}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val labels = Dedup.dupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
    val corpus = Seq(1L, 2L, 3L, 5L, 7L, 8L).toDF("doc_id")
      .withColumn("text", concat(lit("doc"), $"doc_id"))
    val kept = Dedup.dedupNearDups(corpus, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    // winners 1 and 7, untouched 5, losers 2/3/8 dropped
    assert(kept == Set(1L, 5L, 7L))
  }

  test("dupClusters labels a 40-link chain within the round budget") {
    // a long path exercises the contraction bound — plain label
    // propagation would need 40 rounds, beyond the 20-round floor,
    // and this would throw non-convergence. Force the DISTRIBUTED
    // loop (the small-graph fast path would otherwise take over).
    spark.conf.set("graft.dedup.maxDriverEdges", "0")
    try {
      val chain = (1L until 41L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val labels = Dedup.dupClusters(chain)
        .as[(Long, Long)].collect().toMap
      assert(labels.size == 41)
      assert(labels.values.forall(_ == 1L))
    } finally spark.conf.unset("graft.dedup.maxDriverEdges")
  }

  test("dupClusters handles a 1000-link MONOTONE-id chain (the " +
    "deterministic-contraction adversary) within the auto budget") {
    // ids increasing along the path was the worst case for raw-id
    // star contraction: every node's min-id neighbor is its
    // predecessor, so the chain shortened by ~2 nodes per round
    // (simulated 500 rounds for 1000 links — round-12 advisor
    // finding) and the auto budget (max(20, log2(2E)+8) = 20 here)
    // threw non-convergence. The per-round HASHED contraction keys
    // make merge direction independent of id structure, so this
    // converges in O(log n) rounds w.h.p. — and deterministically
    // reproducibly, since the round hashes are seeded by round
    // number. Also pins the post-convergence min-relabel: roots are
    // hash-argmin representatives internally, but the returned label
    // must be the component MIN id.
    spark.conf.set("graft.dedup.maxDriverEdges", "0")
    try {
      val chain = (1L until 1001L).map(i => (i, i + 1))
        .toDF("id_a", "id_b")
      val labels = Dedup.dupClusters(chain)
        .as[(Long, Long)].collect().toMap
      assert(labels.size == 1001)
      assert(labels.values.forall(_ == 1L),
        "component label must be the min id after relabeling")
    } finally spark.conf.unset("graft.dedup.maxDriverEdges")
  }

  test("driver-side materialization guards fail fast on over-cap frames") {
    // the bounded-collect contracts (round-8 verdict task #6): each
    // guard CLASS must error with the conf key instead of letting a
    // misuse-sized frame reach driver memory / a broadcast build
    val conf = spark.conf
    // class 1: broadcast query-set guard (bruteForceTopK/ivfTopK/
    // hardNegatives/probeIvfIndex share it)
    conf.set("graft.ann.maxDriverQueries", "2")
    try {
      val e1 = intercept[graft.exceptions.InvalidArgumentValue] {
        Similarity.bruteForceTopK(emb, emb.limit(3), "vec_id",
          "vec_id", "embedding", k = 2)
      }
      assert(e1.getMessage.contains("graft.ann.maxDriverQueries"))
      // class 2: collected query-set guard (pqTopK/probeIvfPqIndex)
      val e2 = intercept[graft.exceptions.InvalidArgumentValue] {
        Similarity.pqTopK(emb, emb.limit(3), "vec_id", "vec_id",
          "embedding", k = 2, m = 4, ncodes = 8, shortlist = 10)
      }
      assert(e2.getMessage.contains("graft.ann.maxDriverQueries"))
    } finally conf.unset("graft.ann.maxDriverQueries")
    // class 3: index-sidecar guard — a "centroids" table bigger than
    // the cap (e.g. a wrong path handed to a probe) must error, not
    // collect
    val idx = tmpDir("llm-guard-ivf")
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", idx, nlist = 4)
    conf.set("graft.ann.maxDriverIndexRows", "2")
    try {
      val e3 = intercept[graft.exceptions.InvalidArgumentValue] {
        Similarity.probeIvfIndex(idx, emb.limit(1), "vec_id",
          "embedding", k = 2, nprobe = 2)
      }
      assert(e3.getMessage.contains("graft.ann.maxDriverIndexRows"))
    } finally conf.unset("graft.ann.maxDriverIndexRows")
  }

  test("dupClusters local fast path equals the distributed loop") {
    // random multi-component graphs: the driver union-find and the
    // pointer-jump loop must produce the SAME (id, root) labeling —
    // root is the component min either way
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 40
      val pairs = (1 to n).map { _ =>
        val a = rnd.nextInt(50).toLong + 1
        val b = rnd.nextInt(50).toLong + 1
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).toDF("id_a", "id_b")
      val local = Dedup.dupClusters(pairs)
        .as[(Long, Long)].collect().toMap
      spark.conf.set("graft.dedup.maxDriverEdges", "0")
      val dist =
        try Dedup.dupClusters(pairs).as[(Long, Long)].collect().toMap
        finally spark.conf.unset("graft.dedup.maxDriverEdges")
      assert(local == dist, s"trial $trial: local != distributed")
    }
  }

  test("index probe equals whole-corpus minhash restricted to the split") {
    val corpus = docs.filter($"doc_id" < 400)
    val batch = docs.filter($"doc_id" >= 400)
    val idx = tmpDir("llm-minhash-idx")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx)
    val probed = Dedup.probeMinhashIndex(idx, corpus, batch,
        "doc_id", "text", threshold = 0.8, minBandMatches = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val whole = Dedup.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.8, minBandMatches = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .filter { case (a, b) => a < 400 && b >= 400 }.toSet
    assert(probed == whole)
    assert(probed.nonEmpty)
    // parameter mismatch is rejected, not silently wrong
    intercept[graft.exceptions.InvalidArgumentValue] {
      Dedup.probeMinhashIndex(idx, corpus, batch, "doc_id", "text",
        numHashes = 64)
    }
  }

  test("probe map-side sketch cut yields the identical pair set") {
    // the probe's cut is on by default (no corpus knee — see the
    // no-widened-exchange rationale at the call site); pin the
    // opted-out plan row-identical: the cut is a prefilter under the
    // funnel's 6σ recall contract, survivors still exact-verified
    val corpus = docs.filter($"doc_id" < 400)
    val batch = docs.filter($"doc_id" >= 400)
    val idx = tmpDir("mh-probe-sketch")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx)
    def probe() = Dedup.probeMinhashIndex(idx, corpus, batch,
        "doc_id", "text", threshold = 0.8, minBandMatches = 3)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val withCut = probe()
    spark.conf.set("graft.dedup.probePairSketch", "false")
    val without =
      try probe()
      finally spark.conf.unset("graft.dedup.probePairSketch")
    assert(withCut == without,
      s"probe sketch-cut pair set diverged: only-cut " +
        s"${(withCut -- without).take(3)}, only-plain " +
        s"${(without -- withCut).take(3)}")
    assert(withCut.nonEmpty)
  }

  test("probe over-cap shuffled fallback returns identical pairs") {
    // graft.dedup.maxBroadcastCandidates is the probe's 8 GB-limit
    // escape hatch: past the cap every static broadcast (batch bands,
    // candidates, candA) degrades to a shuffled join. Force the
    // degraded path and pin it row-identical to the broadcast path —
    // the fallback must change the PLAN, never the answer.
    val corpus = docs.filter($"doc_id" < 400)
    val batch = docs.filter($"doc_id" >= 400)
    val idx = tmpDir("mh-nobcast")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx)
    def probe() = Dedup.probeMinhashIndex(idx, corpus, batch,
        "doc_id", "text", threshold = 0.8, minBandMatches = 3)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val bcast = probe()
    spark.conf.set("graft.dedup.maxBroadcastCandidates", "1")
    val shuffled =
      try probe()
      finally spark.conf.unset("graft.dedup.maxBroadcastCandidates")
    assert(shuffled == bcast)
    assert(shuffled.nonEmpty)
  }

  test("dupClusters rejects NULL ids on both paths") {
    // a null id in a near-dup pair list is an upstream bug; the
    // driver fast path and the distributed loop must agree on the
    // contract (fail fast) instead of diverging silently
    val withNull = Seq((Option(1L), Option(2L)), (Option.empty[Long],
      Option(3L))).toDF("id_a", "id_b")
    val e = intercept[graft.exceptions.InvalidArgumentValue] {
      Dedup.dupClusters(withNull)
    }
    assert(e.getMessage.contains("NULL"))
    spark.conf.set("graft.dedup.maxDriverEdges", "0")
    try intercept[graft.exceptions.InvalidArgumentValue] {
      Dedup.dupClusters(withNull)
    } finally spark.conf.unset("graft.dedup.maxDriverEdges")
  }

  test("minhash append with an empty batch retracts the tag's previous rows") {
    val corpus = docs.filter($"doc_id" < 400)
    val late = docs.filter($"doc_id" >= 400 && $"doc_id" < 420)
    val idx = tmpDir("mh-retract")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx)
    Dedup.appendToMinhashIndex(late, "doc_id", "text", idx, "day1")
    val withTag = spark.read.parquet(idx)
      .select("batch").distinct().as[String].collect().toSet
    assert(withTag == Set("base", "day1"))
    // retraction: a same-tag re-run whose batch is now empty must
    // REMOVE the previous append, not silently keep it
    Dedup.appendToMinhashIndex(docs.filter(lit(false)),
      "doc_id", "text", idx, "day1")
    val after = spark.read.parquet(idx)
      .select("batch").distinct().as[String].collect().toSet
    assert(after == Set("base"), s"stale tag survived retraction: $after")
  }

  test("minhash index compaction preserves probe results and the meta") {
    val corpus = docs.filter($"doc_id" < 400)
    val late = docs.filter($"doc_id" >= 400 && $"doc_id" < 450)
    val batch = docs.filter($"doc_id" >= 450)
    val idx = tmpDir("mh-compact")
    // AQE coalesces this tiny fixture to one file per batch; disable
    // it for the builds so each batch lands several small files — the
    // geometry months of daily appends produce at real scale
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Dedup.buildMinhashIndex(corpus.repartition(8), "doc_id", "text", idx)
      Dedup.appendToMinhashIndex(late.repartition(8), "doc_id", "text",
        idx, "day1")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    def probe() = Dedup.probeMinhashIndex(idx,
        corpus.unionByName(late), batch, "doc_id", "text",
        minBandMatches = 3)
      .select("id_a", "id_b", "jaccard").orderBy("id_a", "id_b")
      .collect().toSeq
    val before = probe()
    val filesBefore = graft.sources.FsOps.listObjects(spark, idx)
      .count(_.path.endsWith(".parquet"))
    val stats = Dedup.compactMinhashIndex(spark, idx)
    val filesAfter = graft.sources.FsOps.listObjects(spark, idx)
      .count(_.path.endsWith(".parquet"))
    assert(filesAfter < filesBefore,
      s"compaction did not reduce files: $filesBefore -> $filesAfter")
    assert(stats.filesBefore === filesBefore)
    // probe results bit-identical, and the meta survived the swap —
    // an append against the compacted index still validates + lands
    assert(probe() === before)
    Dedup.appendToMinhashIndex(batch.limit(5), "doc_id", "text",
      idx, "day2")
    // a non-index dir is refused, not silently rewritten
    intercept[graft.exceptions.InvalidArgumentValue] {
      Dedup.compactMinhashIndex(spark, tmpDir("mh-not-an-index"))
    }
  }

  test("index append equals one-shot build; re-append is idempotent") {
    val early = docs.filter($"doc_id" < 300)
    val mid = docs.filter($"doc_id" >= 300 && $"doc_id" < 400)
    val corpus = docs.filter($"doc_id" < 400)
    val batch = docs.filter($"doc_id" >= 400)
    val idxA = tmpDir("mh-append")
    val idxB = tmpDir("mh-oneshot")
    Dedup.buildMinhashIndex(early, "doc_id", "text", idxA)
    Dedup.appendToMinhashIndex(mid, "doc_id", "text", idxA, "day1")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idxB)
    def probePairs(idx: String): Set[(Long, Long)] = {
      val r = Dedup.probeMinhashIndex(idx, corpus, batch,
        "doc_id", "text", minBandMatches = 3)
      val out = r.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      r.unpersist()
      out
    }
    assert(probePairs(idxA) == probePairs(idxB))
    // replaying the same tag REPLACES its partition, never doubles it
    val n1 = spark.read.parquet(idxA).count()
    Dedup.appendToMinhashIndex(mid, "doc_id", "text", idxA, "day1")
    assert(spark.read.parquet(idxA).count() == n1)
    // a rebuild clears stale appends (static overwrite of the path)
    Dedup.buildMinhashIndex(early, "doc_id", "text", idxA)
    assert(spark.read.parquet(idxA).select("batch").distinct()
      .as[String].collect().toSeq == Seq("base"))
    // parameter / tag misuse is rejected, not silently wrong
    intercept[graft.exceptions.InvalidArgumentValue] {
      Dedup.appendToMinhashIndex(mid, "doc_id", "text", idxA, "day2",
        shingleK = 5)
    }
    intercept[graft.exceptions.InvalidArgumentValue] {
      Dedup.appendToMinhashIndex(mid, "doc_id", "text", idxA, "base")
    }
  }

  test("append rejects an unbuilt path; duplicate-id appends can't skew the probe") {
    val early = docs.filter($"doc_id" < 300)
    val mid = docs.filter($"doc_id" >= 300 && $"doc_id" < 400)
    val corpus = docs.filter($"doc_id" < 400)
    val batch = docs.filter($"doc_id" >= 400)
    // appending where no build ever ran must fail loudly, not create a
    // meta-less partial "index" the meta check would then vacuously pass
    intercept[graft.exceptions.InvalidArgumentValue] {
      Dedup.appendToMinhashIndex(mid, "doc_id", "text",
        tmpDir("mh-nometa"), "day1")
    }
    // a doc landed under TWO tags (caller violates the id-uniqueness
    // contract) must not double-count shingle intersections — jaccard
    // stays exact, identical to a clean one-shot build
    val dup = tmpDir("mh-dup")
    val clean = tmpDir("mh-clean")
    Dedup.buildMinhashIndex(early, "doc_id", "text", dup)
    Dedup.appendToMinhashIndex(mid, "doc_id", "text", dup, "day1")
    Dedup.appendToMinhashIndex(mid, "doc_id", "text", dup, "day2")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", clean)
    def probe(idx: String): Set[(Long, Long, Double)] = {
      val r = Dedup.probeMinhashIndex(idx, corpus, batch,
        "doc_id", "text", minBandMatches = 3)
      val out = r.as[(Long, Long, Double)].collect().toSet
      r.unpersist()
      out
    }
    assert(probe(dup) == probe(clean))
  }

  test("maxBandBucket survives a boilerplate flood without losing its cluster") {
    // the web-scale killer: one doc mass-duplicated 40× puts all 40
    // ids in ONE bucket of every band — quadratic for the all-pairs
    // join, linear for the capped star
    val boiler = "the quick brown fox jumps over the lazy dog while " +
      "reciting terms of service paragraph seven about liability " +
      "limitation and consequential damages in all jurisdictions"
    val nearA = "an entirely different document about spark physical " +
      "plans, shuffle exchanges, and adaptive query execution knobs"
    val nearB = nearA.replace("knobs", "flags")
    val flood = (0L until 40L).map(i => (i, boiler))
    val filler = Vector(
      "amber onyx quartz travertine gypsum basalt obsidian marble",
      "violin cello timpani oboe clarinet bassoon trumpet piccolo",
      "sourdough focaccia brioche ciabatta baguette pumpernickel rye",
      "nimbus cirrus stratus cumulus derecho haboob chinook mistral",
      "peregrine osprey kestrel merlin goshawk harrier gyrfalcon kite")
    val others = Seq(100L -> nearA, 101L -> nearB) ++
      filler.zipWithIndex.map { case (t, i) => (200L + i, t) }
    val df = (flood ++ others).toDF("doc_id", "text")
    def pairsOf(cap: Int): Set[(Long, Long)] = {
      val r = Dedup.minhashNearDups(df, "doc_id", "text",
        threshold = 0.8, maxBandBucket = cap)
      val out = r.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      r.unpersist()
      out
    }
    val uncapped = pairsOf(0)
    val capped = pairsOf(8)
    // capping only removes pairs, never invents them (verify is exact)
    assert(capped.subsetOf(uncapped))
    // the ordinary near-dup pair lives in small buckets — untouched
    assert(capped.contains((100L, 101L)))
    // identical docs collapse to the min-id star: 39 hub edges, not 780
    assert(uncapped.count(p => p._1 < 40 && p._2 < 40) == 780)
    assert(capped.filter(p => p._1 < 40 && p._2 < 40) ==
      (1L until 40L).map((0L, _)).toSet)
    // and the star keeps the flood ONE cluster: keep-one-per-cluster
    // lands the same survivors either way
    def survivors(pairs: Set[(Long, Long)]): Set[Long] = {
      val p = pairs.toSeq.toDF("id_a", "id_b")
      Dedup.dedupNearDups(df, "doc_id", p).select("doc_id")
        .as[Long].collect().toSet
    }
    assert(survivors(capped) == survivors(uncapped))
  }

  test("repetitionStats matches hand-computed metrics") {
    // "a b a b c": tokens 5, distinct 3 → 0.6; bigrams with
    // multiplicity: (a b)×2, (b a), (b c) → 4 instances, top = 2/4,
    // duplicated instances = 2/4
    val df = Seq((1L, "a b a b c"), (2L, "x"), (3L, "p q"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(got(0) == ((1L, 5L, 0.6, 0.5, 0.5)))
    // single token: no bigrams → both bigram metrics 0 by definition
    assert(got(1) == ((2L, 1L, 1.0, 0.0, 0.0)))
    // two distinct tokens: one bigram occurring once
    assert(got(2) == ((3L, 2L, 1.0, 1.0, 0.0)))
  }

  test("leakageSafeSplit never lets a near-dup pair straddle splits") {
    val corpus = docs.select("doc_id", "text")
    val pairs = Dedup.minhashNearDups(corpus, "doc_id", "text",
      threshold = 0.8, minBandMatches = 3)
    val split = Dedup.leakageSafeSplit(corpus, "doc_id", pairs,
      evalKeep = 2, evalOutOf = 10)
    val assign = split.select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val straddling = pairs.select("id_a", "id_b").as[(Long, Long)]
      .collect().filter { case (a, b) => assign(a) != assign(b) }
    pairs.unpersist()
    assert(straddling.isEmpty,
      s"pairs across train/eval: ${straddling.take(5).mkString(", ")}")
    // every document is assigned exactly once, to one of the two splits
    assert(assign.size == corpus.count())
    assert(assign.values.toSet.subsetOf(Set("train", "eval")))
    // both splits are populated at a 20% eval target on 500 docs
    val nEval = assign.values.count(_ == "eval")
    assert(nEval > 0 && nEval < assign.size)
    // determinism: a second run assigns identically
    val pairs2 = Dedup.minhashNearDups(corpus, "doc_id", "text",
      threshold = 0.8, minBandMatches = 3)
    val again = Dedup.leakageSafeSplit(corpus, "doc_id", pairs2,
      evalKeep = 2, evalOutOf = 10)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    pairs2.unpersist()
    assert(again == assign)
  }

  test("packSequences packs greedily in id order within each shard") {
    // single shard so the whole corpus packs as one ordered stream
    val df = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 300L),
        (5L, 50L), (6L, 40L))
      .toDF("doc_id", "n_tok")
    val got = TextAnalysis
      .packSequences(df, "doc_id", "n_tok", capacity = 256L, shards = 1)
      .orderBy("id").as[(Long, Long, Int, Long)].collect()
    // greedy: [100+100]=200 | [100]=100 + oversized 300 alone | [50+40]
    val bins = got.map(r => r._1 -> r._4).toMap
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L,
      5L -> 3L, 6L -> 3L))

    // sharded run: every doc assigned once; no multi-doc bin overflows
    val docsTok = docs
      .withColumn("n_tok", TextAnalysis.approxBpeTokens($"text"))
    val packed = TextAnalysis.packSequences(docsTok, "doc_id", "n_tok",
      capacity = 256L, shards = 4)
    assert(packed.count() == docs.count())
    val over = packed.groupBy("shard", "bin")
      .agg(sum("n_tokens").as("used"), count(lit(1)).as("n"))
      .filter($"used" > 256 && $"n" > 1)
    assert(over.isEmpty, "a multi-document bin exceeds capacity")
    // determinism: identical assignment on a second run
    val again = TextAnalysis.packSequences(docsTok, "doc_id", "n_tok",
      capacity = 256L, shards = 4)
    assert(packed.except(again).isEmpty && again.except(packed).isEmpty)
  }

  test("contaminationCheck flags exactly the docs sharing an n-gram") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated words nothing shared here at all ok"),
      (3L, "prefix words then the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val got = Dedup.contaminationCheck(corpus, "doc_id", "text",
        eval, "doc_id", "text", n = 8)
      .orderBy("id").as[(Long, Long, Long, Double)].collect()
    // docs 1 and 3 contain the eval doc's 8-grams; doc 2 shares none
    assert(got.map(_._1).toSeq == Seq(1L, 3L))
    assert(got.forall(_._3 == 1L)) // one eval doc hit
    assert(got.forall(r => r._4 > 0.0 && r._4 <= 1.0))
  }

  test("bloom-prefiltered contaminationCheck returns identical rows") {
    val corpus = docs.filter($"doc_id" < 450)
    val eval = docs.filter($"doc_id" >= 450)
    val base = Dedup.contaminationCheck(corpus, "doc_id", "text",
      eval, "doc_id", "text", n = 8)
    val bloom = Dedup.contaminationCheck(corpus, "doc_id", "text",
      eval, "doc_id", "text", n = 8, bloomFpp = Some(0.01))
    assert(base.except(bloom).isEmpty && bloom.except(base).isEmpty)
    assert(base.count() > 0, "fixture must actually plant contamination")
  }

  test("qualityFilter rules pass/fail independently and fail closed") {
    val rules = TextAnalysis.QualityRules(minTokens = 3, maxTokens = 5,
      minAvgTokenLen = 2.0, maxAvgTokenLen = 4.0, maxSymbolFrac = 0.3,
      minAlphaTokenFrac = 0.6, minStopwordHits = 1)
    val df = Seq(
      (1L, "the cat sat"),                   // every rule passes
      (2L, "cat sat"),                       // too short + no stopword
      (3L, "### ... ### cat the"),           // symbol + alpha fail
      (4L, "extraordinarily magnificent the"), // avg word length fail
      (5L, ""))                              // empty: all fail closed
      .toDF("doc_id", "text")
    val got = TextAnalysis.qualityFilter(df, "doc_id", "text", rules)
      .orderBy("doc_id")
      .select("doc_id", "ok_n_tokens", "ok_token_len", "ok_symbol",
        "ok_alpha", "ok_stopwords", "keep")
      .as[(Long, Int, Int, Int, Int, Int, Int)].collect()
    assert(got(0) == ((1L, 1, 1, 1, 1, 1, 1)))
    assert(got(1) == ((2L, 0, 1, 1, 1, 0, 0)))
    assert(got(2) == ((3L, 1, 1, 0, 0, 1, 0)))
    assert(got(3) == ((4L, 1, 0, 1, 1, 1, 0)))
    assert(got(4) == ((5L, 0, 0, 0, 0, 0, 0)))
  }

  test("removeDuplicatedSpans deletes exactly the cross-doc spans") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon unique1 tail1 tail2 tail3"),
      (2L, "intro alpha beta gamma delta epsilon other words here too"),
      (3L, "Totally Different Content with no shared five gram run"),
      (4L, "tiny doc"), // shorter than n: no grams, passes through
      (5L, "alpha beta gamma delta epsilon")) // fully duplicated
      .toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(corpus, "doc_id", "text",
        n = 5, minDocs = 2)
      .orderBy("id").as[(Long, Long, Long, String)].collect()
    assert(got(0) == ((1L, 9L, 5L, "unique1 tail1 tail2 tail3")))
    assert(got(1) == ((2L, 10L, 5L, "intro other words here too")))
    // untouched docs come back normalized (lowercased) but whole
    assert(got(2) == ((3L, 9L, 0L,
      "totally different content with no shared five gram run")))
    assert(got(3) == ((4L, 2L, 0L, "tiny doc")))
    assert(got(4) == ((5L, 5L, 5L, "")))
  }

  test("quality filter and span removal handle CJK, emoji, and multi-byte symbols") {
    // alpha rule: a token counts iff it has an a-z char — CJK and
    // emoji tokens don't; the '…' ellipsis (multi-byte) is a symbol
    val rules = TextAnalysis.QualityRules(minTokens = 1,
      maxTokens = 100, minAvgTokenLen = 0.0, maxAvgTokenLen = 1e9,
      maxSymbolFrac = 0.0, minAlphaTokenFrac = 0.5, minStopwordHits = 0)
    val df = Seq(
      (1L, "日本語 テスト 深層 学習 モデル the"), // 1/6 alpha
      (2L, "café naïve … résumé #tag"),           // symbols: … and #
      (3L, "😀 😀 😀 data"))                      // surrogate pairs
      .toDF("doc_id", "text")
    val got = TextAnalysis.qualityFilter(df, "doc_id", "text", rules)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "ok_symbol", "ok_alpha")
      .as[(Long, Long, Int, Int)].collect()
    assert(got(0) == ((1L, 6L, 1, 0)))
    assert(got(1) == ((2L, 5L, 0, 1)))
    assert(got(2) == ((3L, 4L, 1, 0)))

    // an unknown stopword language is a caller error, reported with
    // the module's exception type and the supported set — not a raw
    // NoSuchElementException out of the map lookup
    val bad = intercept[graft.exceptions.InvalidArgumentValue] {
      TextAnalysis.qualityFilter(df, "doc_id", "text",
        TextAnalysis.QualityRules(stopLang = "xx"))
    }
    assert(bad.getMessage.contains("xx"))
    assert(bad.getMessage.contains("en"))

    val rm = Dedup.removeDuplicatedSpans(
        Seq((1L, "深層 学習 モデル x"), (2L, "y 深層 学習 別"))
          .toDF("doc_id", "text"),
        "doc_id", "text", n = 2, minDocs = 2)
      .orderBy("id").as[(Long, Long, Long, String)].collect()
    // the shared CJK 2-gram is excised at different positions
    assert(rm(0) == ((1L, 4L, 2L, "モデル x")))
    assert(rm(1) == ((2L, 4L, 2L, "y 別")))
  }

  test("removeDuplicatedSpans is a no-op on a gram-disjoint corpus") {
    val corpus = Seq(
      (1L, "one two three four five six"),
      (2L, "seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(corpus, "doc_id", "text",
      n = 5, minDocs = 2)
    assert(got.filter($"n_removed" > 0).count() == 0)
  }

  test("curation pipeline funnel is monotone and token-conserving") {
    val rows = QueriesLlm.q67CurationPipeline(spark, sf)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq ==
      Seq("0_raw", "1_quality", "2_dedup", "3_packed"))
    val Seq(raw, quality, dedup, packed) = rows.toSeq
    // each filtering stage can only shrink the corpus
    assert(raw._2 >= quality._2 && quality._2 >= dedup._2)
    assert(raw._3 >= quality._3 && quality._3 >= dedup._3)
    // packing regroups but never drops tokens; bins ≤ docs
    assert(packed._3 == dedup._3)
    assert(packed._2 <= dedup._2 && packed._2 > 0)
  }

  test("trainBpeMerges learns deterministic merges; token counts shrink with vocab") {
    import graft.llm.Bpe
    val corpus = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    // pair counts round 1: (a,a)=2, (a,b)=1 → merge ("a","a");
    // round 2: only (a,b)=1 remains; round 3: nothing — early stop
    val merges = Bpe.trainBpeMerges(corpus, "text", numMerges = 5)
    assert(merges == Seq(("a", "a"), ("a", "b")))
    // both execution tiers agree: in-memory (default — the word table
    // fits) and forced-distributed batched rounds
    assert(Bpe.trainBpeMerges(corpus, "text", 5,
      maxDriverWords = 0) == merges)
    def count(ms: Seq[(String, String)]): Long =
      Bpe.bpeTokenCount(corpus, "doc_id", "text", ms)
        .as[(Long, Long)].head()._2
    assert(count(Nil) == 6L)           // 2+2+2 chars
    assert(count(merges.take(1)) == 4L) // aa,aa merged; a,b split
    assert(count(merges) == 3L)        // every word one token
    // determinism: identical merges on a second run
    assert(Bpe.trainBpeMerges(corpus, "text", numMerges = 5) == merges)
  }

  test("trainBpeMerges survives 500 merges (checkpoint rotation) and equals the in-memory reference") {
    import graft.llm.Bpe
    // deterministic corpus with enough pair vocabulary for 500 full
    // rounds: 200 pseudo-random 16-char words over a 26-letter
    // alphabet. Without the per-round localCheckpoint the plan nests
    // one cached plan per round and the per-job explain string grows
    // ~2^N (AQE prints nested plans twice) — measured driver OOM
    // around round ~100 with a 32-round persist rotation.
    // 400 DISTINCT words (base-26 prefix guarantees distinctness — a
    // modular generator alone collapses to 26 repeated words and the
    // pair vocabulary runs dry before 500 rounds)
    val words = (0 until 400).map { i =>
      val prefix = {
        var n = i
        (0 until 4).map { _ =>
          val c = ('a' + n % 26).toChar; n /= 26; c
        }.mkString
      }
      val body = (0 until 16).map { j =>
        ('a' + ((i * 31 + j * 7 + i * j) % 26 + 26) % 26).toChar
      }.mkString
      prefix + body
    }
    val corpus = words.grouped(20).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    // maxDriverWords = 0 forces the DISTRIBUTED path — this test
    // exists to prove the checkpoint rotation survives a deep train
    val got = Bpe.trainBpeMerges(corpus, "text", numMerges = 500,
      maxDriverWords = 0)
    assert(got.size == 500, s"early stop at ${got.size} merges")
    // rotation frees every persist AND every checkpoint block it made
    assert(spark.sparkContext.getPersistentRDDs.keySet == cachedBefore)
    // in-memory reference replay (same tie-break: count desc, pair asc)
    var w = words.groupBy(identity)
      .map { case (k, ks) => (k.map(_.toString).toArray, ks.size.toLong) }
      .toSeq
    val ref = scala.collection.mutable.ListBuffer.empty[(String, String)]
    while (ref.size < 500) {
      val counts = scala.collection.mutable
        .Map.empty[(String, String), Long].withDefaultValue(0L)
      w.foreach { case (syms, c) =>
        (0 until syms.length - 1)
          .foreach(i => counts((syms(i), syms(i + 1))) += c)
      }
      val top = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
      ref += top
      w = w.map { case (s, c) =>
        (if (s.length > 1) Bpe.applyMerge(s, top._1, top._2) else s, c)
      }
    }
    assert(got == ref.toList)
    // the delta-maintained in-memory tier produces the identical deep
    // vocabulary (500 merges exercises delta bookkeeping far past
    // where a stale count or index entry would surface)
    assert(Bpe.trainBpeMerges(corpus, "text", numMerges = 500) == got)
  }

  test("shingles are distinct lowercase k-grams") {
    val row = Seq(("AbAb")).toDF("t")
      .select(Dedup.shingles($"t", 2).as("s")).head()
    assert(row.getSeq[String](0).sorted == Seq("ab", "ba"))
  }

  test("simhash of identical texts is identical; near texts are close") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox leaps over the lazy dog"),
      (4L, "completely different words entirely unrelated content")
    ).toDF("id", "text")
    val sigs = df.select($"id", Dedup.simhash($"text").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(3L)) < ham(sigs(1L), sigs(4L)))
  }

  test("ivf with nprobe < nlist recalls most of the exact top-k") {
    val queries = emb.filter($"vec_id" < 3)
    val corpus = emb.filter($"vec_id" >= 3)
    val exact = Similarity.bruteForceTopK(corpus, queries,
        "vec_id", "vec_id", "embedding", k = 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(corpus, queries,
        "vec_id", "vec_id", "embedding", k = 5, nlist = 4, nprobe = 2)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    assert(approx.size == exact.size)
    // recall need not be perfect (that's the point of nprobe<nlist),
    // but probing half the cells on near-random data should find >40%
    assert(approx.intersect(exact).size >= exact.size * 2 / 5)
  }

  test("ivf index compaction preserves probe results and cell pruning") {
    val queries = emb.filter($"vec_id" < 3)
    val corpus = emb.filter($"vec_id" >= 3)
    val idx = tmpDir("ivf-compact")
    Similarity.buildIvfIndex(corpus, "vec_id", "embedding", idx, nlist = 4)
    def probe() = Similarity.probeIvfIndex(idx, queries,
        "vec_id", "embedding", k = 5, nprobe = 4)
      .orderBy("qid", "rnk").collect().toSeq
    val before = probe()
    Similarity.compactIvfIndex(spark, idx)
    assert(probe() === before)
    // static cell pruning still works on the compacted layout
    val partial = Similarity.probeIvfIndex(idx, queries,
      "vec_id", "embedding", k = 5, nprobe = 1)
    val pf = partial.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf.contains("cell"))
    intercept[graft.exceptions.InvalidArgumentValue] {
      Similarity.compactIvfIndex(spark, tmpDir("ivf-not-an-index"))
    }
  }

  test("ivf index probe at full nprobe equals brute force; pruning is static") {
    val queries = emb.filter($"vec_id" < 3)
    val corpus = emb.filter($"vec_id" >= 3)
    val idx = tmpDir("llm-ivf-idx")
    Similarity.buildIvfIndex(corpus, "vec_id", "embedding", idx, nlist = 4)
    val probed = Similarity.probeIvfIndex(idx, queries,
      "vec_id", "embedding", k = 5, nprobe = 4)
    val exact = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "vec_id", "embedding", k = 5)
    assert(probed.orderBy("qid", "rnk").collect().toSeq ==
      exact.orderBy("qid", "rnk").collect().toSeq)
    // partial probe: the cell scan must carry a literal partition
    // filter (static pruning — unprobed cells never read)
    val partial = Similarity.probeIvfIndex(idx, queries,
      "vec_id", "embedding", k = 5, nprobe = 1)
    val plan = partial.queryExecution.executedPlan.toString
    val pf = plan.linesIterator
      .filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf.contains("cell"),
      s"expected a cell partition filter, got [$pf] in:\n$plan")
    assert(partial.groupBy("qid").count().filter($"count" =!= 5)
      .count() == 0)
    intercept[graft.exceptions.InvalidArgumentValue] {
      Similarity.probeIvfIndex(idx, queries, "vec_id",
        "embedding", k = 5, nprobe = 9)
    }
  }

  test("ivf-pq index probe at full fidelity equals brute force; pruning is static") {
    val queries = emb.filter($"vec_id" < 3)
    val corpus = emb.filter($"vec_id" >= 3)
    val idx = tmpDir("llm-ivfpq-idx")
    Similarity.buildIvfPqIndex(corpus, "vec_id", "embedding", idx,
      nlist = 4, m = 8, ncodes = 16)
    // full nprobe + corpus-wide shortlist ⇒ every row reaches the
    // exact re-rank on RAW vectors ⇒ bit-identical to brute force
    val n = corpus.count().toInt
    val probed = Similarity.probeIvfPqIndex(idx, queries,
      "vec_id", "embedding", k = 5, nprobe = 4, shortlist = n)
    val exact = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "vec_id", "embedding", k = 5)
    assert(probed.orderBy("qid", "rnk").collect().toSeq ==
      exact.orderBy("qid", "rnk").collect().toSeq)
    probed.unpersist()
    // partial probe: literal cell partition filter (static pruning)
    val partial = Similarity.probeIvfPqIndex(idx, queries,
      "vec_id", "embedding", k = 5, nprobe = 1, shortlist = 10)
    val plan = partial.queryExecution.executedPlan.toString
    val pf = plan.linesIterator
      .filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf.contains("cell"),
      s"expected a cell partition filter, got [$pf]")
    assert(partial.groupBy("qid").count().filter($"count" =!= 5)
      .count() == 0)
    partial.unpersist()
    intercept[graft.exceptions.InvalidArgumentValue] {
      Similarity.probeIvfPqIndex(idx, queries, "vec_id", "embedding",
        k = 5, nprobe = 9)
    }
  }

  test("over-cap index probes take the distributed fallback, rows identical") {
    // the factor-100 decade run failed q73 at the old fail-fast: a
    // queries-∝-corpus batch crossed graft.ann.maxDriverQueries and
    // the probe THREW instead of distributing. Both probe operators
    // must now fall back to unhinted joins (and, for PQ, codebook-
    // recompute ADC) with bit-identical rows.
    val queries = emb.filter($"vec_id" < 8)
    val corpus = emb.filter($"vec_id" >= 8)
    val ivf = tmpDir("llm-ivf-overcap")
    val ivfpq = tmpDir("llm-ivfpq-overcap")
    Similarity.buildIvfIndex(corpus, "vec_id", "embedding", ivf, nlist = 4)
    Similarity.buildIvfPqIndex(corpus, "vec_id", "embedding", ivfpq,
      nlist = 4, m = 8, ncodes = 16)
    def runIvf() = Similarity.probeIvfIndex(ivf, queries,
      "vec_id", "embedding", k = 5, nprobe = 2)
      .orderBy("qid", "rnk").collect().toSeq
    def runPq() = Similarity.probeIvfPqIndex(ivfpq, queries,
      "vec_id", "embedding", k = 5, nprobe = 2, shortlist = 20)
      .orderBy("qid", "rnk").collect().toSeq
    val (ivfSmall, pqSmall) = (runIvf(), runPq())
    graft.llm.GuardEvents.clear("probeIvfIndex")
    graft.llm.GuardEvents.clear("probeIvfPqIndex")
    spark.conf.set("graft.ann.maxDriverQueries", "3") // 8 queries > 3
    try {
      assert(runIvf() == ivfSmall,
        "probeIvfIndex over-cap fallback changed rows")
      assert(runPq() == pqSmall,
        "probeIvfPqIndex recompute fallback changed rows (the dot " +
          "recompute must be bit-equal to the table lookup)")
      // production over-cap engagement must be observable the same
      // way the bucket guards are (round-12 verdict task #7)
      val ivfEvt = graft.llm.GuardEvents.lastFor("probeIvfIndex")
      assert(ivfEvt.exists(_.contains("unhinted")),
        s"probeIvfIndex over-cap fallback left no GuardEvents entry: $ivfEvt")
      val pqEvt = graft.llm.GuardEvents.lastFor("probeIvfPqIndex")
      assert(pqEvt.exists(_.contains("chunk")),
        s"probeIvfPqIndex chunk recursion left no GuardEvents entry: $pqEvt")
    } finally spark.conf.unset("graft.ann.maxDriverQueries")
  }

  test("cap disabled (<=0) keeps the broadcast probe hot path") {
    // graft.ann.maxDriverQueries <= 0 means "no cap" module-wide; it
    // must DISABLE the guard, not (as the round-11 qCap.max(1L)
    // arithmetic did — round-12 advisor finding) shrink the broadcast
    // threshold to nprobe rows and silently shuffle every batch
    val queries = emb.filter($"vec_id" < 4)
    val corpus = emb.filter($"vec_id" >= 4)
    val ivf = tmpDir("llm-ivf-nocap")
    Similarity.buildIvfIndex(corpus, "vec_id", "embedding", ivf, nlist = 4)
    def run() = Similarity.probeIvfIndex(ivf, queries,
      "vec_id", "embedding", k = 3, nprobe = 2)
      .orderBy("qid", "rnk").collect().toSeq
    val base = run()
    graft.llm.GuardEvents.clear("probeIvfIndex")
    spark.conf.set("graft.ann.maxDriverQueries", "0")
    try {
      assert(run() == base, "cap-disabled probe changed rows")
      assert(graft.llm.GuardEvents.lastFor("probeIvfIndex").isEmpty,
        "cap-disabled probe must stay on the broadcast path (no " +
          "over-cap fallback event)")
    } finally spark.conf.unset("graft.ann.maxDriverQueries")
  }

  test("auto LSH geometry: legacy below the budget knee, escape at " +
    "200k, recall never below the legacy design point") {
    // corpora whose predicted enumeration fits the budget must
    // reproduce the legacy (bands=32, r=8) geometry EXACTLY — that is
    // what keeps q35/q77's sf0.01 oracle hashes (and the sf0.1 bench
    // profile: the 20k-embedding corpus measured 2-3× slower under a
    // blanket log2-N rule) byte-identical to the legacy default
    for (n <- Seq(1L, 100L, 2050L, 4096L, 20050L, 50000L);
         t <- Seq(0.4, 0.9, 0.99))
      assert(Similarity.autoLshParams(n, t) == (32, 8),
        s"n=$n t=$t must resolve to the legacy geometry")
    // at the CosineEscapeCheck-measured N=200k escape point the gate
    // engages near the measured (r=14, b=90): enumeration at r=8
    // would be 2.5e9 comparisons (it measured 2.97e9 in production)
    val (b200k, r200k) = Similarity.autoLshParams(200050L, 0.9)
    assert(r200k >= 12 && r200k <= 15,
      s"expected r near the measured 14 at N=200k, got $r200k")
    assert(b200k >= 60 && b200k <= 100,
      s"expected b near the measured 90 at N=200k/t=0.9, got $b200k")
    for (n <- Seq(10000L, 200000L, 2000000L, 100000000L);
         t <- Seq(0.3, 0.5, 0.7, 0.9, 0.95, 0.99)) {
      val (b, r) = Similarity.autoLshParams(n, t)
      // equal-or-better recall than the fixed legacy default at the
      // threshold, everywhere on the grid
      val s = 1.0 - math.acos(t) / math.Pi
      val missAuto = b * math.log1p(-math.pow(s, r))
      val missLegacy = 32 * math.log1p(-math.pow(s, 8))
      assert(missAuto <= missLegacy + 1e-12,
        s"auto geometry (b=$b, r=$r) at n=$n t=$t has HIGHER miss " +
          s"probability than legacy (32, 8): " +
          s"${math.exp(missAuto)} > ${math.exp(missLegacy)}")
      assert(r >= 8 && r <= 20)
      // the budget property: either predicted enumeration fits the
      // 2e8 budget, or raising r further is blocked (plane cap 20 or
      // the 512-band recall-cost cap — enumeration then unavoidable;
      // the runtime monitor is the honest signal)
      def bNext = math.max(1, math.ceil(32.0 *
        math.log1p(-math.pow(s, 8)) /
        math.log1p(-math.pow(s, r + 1))).toInt)
      val enum0 = b * math.pow(n.toDouble, 2) / math.pow(2.0, r + 1)
      assert(enum0 <= 2e8 + 1 || r == 20 || bNext > 512,
        s"n=$n t=$t: enumeration $enum0 over budget with r=$r < 20 " +
          s"and next-band cost $bNext <= 512")
      assert(b <= 512, s"band count $b escaped the closure cap")
    }
  }

  test("autoLshParams warns AT DERIVATION when the band cap binds") {
    // at threshold ~0.4 on a huge corpus the 512-band closure cap
    // pins the geometry while predicted enumeration stays over the
    // 2e8 budget — the derivation itself must record the guidance
    // (round-12 verdict #8), not just the post-hoc runtime monitor
    graft.llm.GuardEvents.clear("autoLshParams")
    val (bLow, rLow) = Similarity.autoLshParams(100000000L, 0.4)
    assert(bLow <= 512)
    val evt = graft.llm.GuardEvents.lastFor("autoLshParams")
    assert(evt.exists(_.contains("raise the threshold")),
      s"cap-bound low-threshold derivation (b=$bLow, r=$rLow) left no " +
        s"GuardEvents guidance: $evt")
    // below-budget derivations stay silent
    graft.llm.GuardEvents.clear("autoLshParams")
    assert(Similarity.autoLshParams(20050L, 0.9) == (32, 8))
    assert(graft.llm.GuardEvents.lastFor("autoLshParams").isEmpty,
      "below-knee derivation must not record a warning")
  }

  test("over-cap PQ probe with DUPLICATED query ids equals under-cap") {
    // hash chunking must pin every duplicate of a qid into ONE chunk
    // — rank-based chunking could split duplicates across chunks and
    // double per-query work/rows (round-12 advisor finding)
    val queries = emb.filter($"vec_id" < 4)
      .union(emb.filter($"vec_id" < 2)) // qids 0,1 appear twice
    val corpus = emb.filter($"vec_id" >= 4)
    val ivfpq = tmpDir("llm-ivfpq-dupqid")
    Similarity.buildIvfPqIndex(corpus, "vec_id", "embedding", ivfpq,
      nlist = 4, m = 8, ncodes = 16)
    def run() = Similarity.probeIvfPqIndex(ivfpq, queries,
      "vec_id", "embedding", k = 3, nprobe = 2, shortlist = 10)
      .orderBy("qid", "rnk", "cid").collect().toSeq
    val underCap = run()
    spark.conf.set("graft.ann.maxDriverQueries", "3") // 6 rows > 3
    try {
      assert(run() == underCap,
        "duplicate qids split across chunks changed the result")
    } finally spark.conf.unset("graft.ann.maxDriverQueries")
  }

  test("PQ probe batch that hashing cannot split fails fast, not loops") {
    // the ONE batch chunk-and-recurse cannot handle: a single qid
    // duplicated past the cap lands whole in every chunk of every
    // modulus, so recursion would never shrink it — the guard must
    // throw the documented advice instead of recursing to the depth
    // bound doing useless work (or worse, looping)
    val one = emb.filter($"vec_id" === 0)
    val queries = one.union(one).union(one).union(one) // 4 copies
    val corpus = emb.filter($"vec_id" >= 4)
    val ivfpq = tmpDir("llm-ivfpq-unsplittable")
    Similarity.buildIvfPqIndex(corpus, "vec_id", "embedding", ivfpq,
      nlist = 4, m = 8, ncodes = 16)
    spark.conf.set("graft.ann.maxDriverQueries", "3") // 4 dup rows > 3
    try {
      val e = intercept[graft.exceptions.InvalidArgumentValue] {
        Similarity.probeIvfPqIndex(ivfpq, queries,
          "vec_id", "embedding", k = 3, nprobe = 2, shortlist = 10)
      }
      assert(e.getMessage.contains("cannot be hash-chunked") &&
        e.getMessage.contains("deduplicate the query"),
        s"wrong unsplittable-batch error: ${e.getMessage}")
    } finally spark.conf.unset("graft.ann.maxDriverQueries")
  }

  test("ivf-pq recall@10 >= 0.9 on clustered vectors at nprobe=nlist/2") {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(8, 16)(rnd.nextGaussian())
    val vecs = (0L until 300L).map { i =>
      val c = centers((i % 8).toInt)
      i -> c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq
    }.toDF("vec_id", "embedding")
    val corpus = vecs.filter($"vec_id" >= 10)
    val queries = vecs.filter($"vec_id" < 10)
    val idx = tmpDir("llm-ivfpq-recall")
    Similarity.buildIvfPqIndex(corpus, "vec_id", "embedding", idx,
      nlist = 4, m = 4, ncodes = 16)
    val got = Similarity.probeIvfPqIndex(idx, queries,
      "vec_id", "embedding", k = 10, nprobe = 2, shortlist = 50)
    val exact = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "vec_id", "embedding", k = 10)
    val gotSet = got.select("qid", "cid").as[(Long, Long)].collect().toSet
    val exSims = exact.select("qid", "cid", "sim")
      .as[(Long, Long, Double)].collect()
      .map { case (q, c, s) => (q, c) -> s }.toMap
    val recall = gotSet.count(exSims.contains).toDouble / exSims.size
    assert(recall >= 0.9, s"ivf-pq recall@10 was $recall")
    // wherever the index found a true hit, the re-ranked sim is the
    // exact cosine
    val gotSims = got.select("qid", "cid", "sim")
      .as[(Long, Long, Double)].collect()
    got.unpersist()
    gotSims.filter(r => exSims.contains((r._1, r._2))).foreach {
      case (q, c, s) =>
        assert(math.abs(s - exSims((q, c))) < 1e-9,
          s"rerank sim not exact for ($q,$c)")
    }
  }

  test("ivf index append equals a full-corpus probe; re-append is idempotent") {
    val queries = emb.filter($"vec_id" < 3).select("vec_id", "embedding")
    val early = emb.filter($"vec_id" >= 3 && $"vec_id" < 40)
    val late = emb.filter($"vec_id" >= 40)
    val idx = tmpDir("ivf-append")
    Similarity.buildIvfIndex(early, "vec_id", "embedding", idx, nlist = 4)
    Similarity.appendToIvfIndex(late, "vec_id", "embedding", idx, "day1")
    // full-nprobe probe over the grown index must equal brute force
    // over the UNION corpus (append = the vectors are really there)
    val probed = Similarity.probeIvfIndex(idx, queries,
      "vec_id", "embedding", k = 5, nprobe = 4)
    val brute = Similarity.bruteForceTopK(emb.filter($"vec_id" >= 3),
      queries, "vec_id", "vec_id", "embedding", k = 5)
    val p = probed.select("qid", "rnk", "cid")
      .as[(Long, Long, Long)].collect().toSet
    val b = brute.select("qid", "rnk", "cid")
      .as[(Long, Long, Long)].collect().toSet
    probed.unpersist()
    brute.unpersist()
    assert(p == b)
    // same-tag replay replaces, never doubles
    val n1 = spark.read.parquet(s"$idx/cells").count()
    Similarity.appendToIvfIndex(late, "vec_id", "embedding", idx, "day1")
    assert(spark.read.parquet(s"$idx/cells").count() == n1)
    // rebuild clears stale appends
    Similarity.buildIvfIndex(early, "vec_id", "embedding", idx, nlist = 4)
    assert(spark.read.parquet(s"$idx/cells").select("batch").distinct()
      .as[String].collect().toSeq == Seq("base"))
    intercept[graft.exceptions.InvalidArgumentValue] {
      Similarity.appendToIvfIndex(late, "vec_id", "embedding", idx, "base")
    }
  }

  private def corpusIds(idx: String): Set[Long] =
    spark.read.parquet(s"$idx/cells").select("cid").as[Long]
      .collect().toSet

  test("ivf-pq append equals a full-corpus probe; re-append is idempotent") {
    val queries = emb.filter($"vec_id" < 3).select("vec_id", "embedding")
    val early = emb.filter($"vec_id" >= 3 && $"vec_id" < 40)
    val late = emb.filter($"vec_id" >= 40)
    val idx = tmpDir("ivfpq-append")
    Similarity.buildIvfPqIndex(early, "vec_id", "embedding", idx,
      nlist = 4, m = 8, ncodes = 16)
    Similarity.appendToIvfPqIndex(late, "vec_id", "embedding", idx, "day1")
    // full fidelity over the grown index == brute force over the union
    val n = emb.filter($"vec_id" >= 3).count().toInt
    val probed = Similarity.probeIvfPqIndex(idx, queries,
      "vec_id", "embedding", k = 5, nprobe = 4, shortlist = n)
    val brute = Similarity.bruteForceTopK(emb.filter($"vec_id" >= 3),
      queries, "vec_id", "vec_id", "embedding", k = 5)
    assert(probed.orderBy("qid", "rnk").collect().toSeq ==
      brute.orderBy("qid", "rnk").collect().toSeq)
    probed.unpersist(); brute.unpersist()
    // same-tag replay replaces, never doubles
    val n1 = spark.read.parquet(s"$idx/cells").count()
    Similarity.appendToIvfPqIndex(late, "vec_id", "embedding", idx, "day1")
    assert(spark.read.parquet(s"$idx/cells").count() == n1)
    // SHRUNKEN same-tag re-run: the corrected batch lands in fewer
    // cells — the old cells' rows under the tag must not survive
    val sub = late.filter($"vec_id" < 45)
    Similarity.appendToIvfPqIndex(sub, "vec_id", "embedding", idx, "day1")
    val n2 = corpusIds(idx)
    val want2 = (early.select("vec_id").as[Long].collect() ++
      sub.select("vec_id").as[Long].collect()).toSet
    assert(n2 == want2, "stale cells survived a shrunken re-append")
    // rebuild clears stale appends
    Similarity.buildIvfPqIndex(early, "vec_id", "embedding", idx,
      nlist = 4, m = 8, ncodes = 16)
    assert(spark.read.parquet(s"$idx/cells").select("batch").distinct()
      .as[String].collect().toSeq == Seq("base"))
    intercept[graft.exceptions.InvalidArgumentValue] {
      Similarity.appendToIvfPqIndex(late, "vec_id", "embedding", idx,
        "base")
    }
    intercept[graft.exceptions.InvalidArgumentValue] {
      Similarity.appendToIvfPqIndex(late, "vec_id", "embedding",
        tmpDir("ivfpq-unbuilt"), "day1")
    }
  }

  test("zero vectors never outrank real matches in top-k") {
    // cosine(0-vector, q) = 0/0 = NaN, and Spark sorts NaN above every
    // double — without the NaN guard the zero vector would be rank 1
    // for every query
    val corpus = emb.filter($"vec_id" >= 3 && $"vec_id" < 50)
      .select("vec_id", "embedding")
      .unionByName(Seq((999L, Seq.fill(64)(0.0f)))
        .toDF("vec_id", "embedding"))
    val queries = emb.filter($"vec_id" < 3).select("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "vec_id", "embedding", k = 5)
    assert(top.filter($"cid" === 999L).count() == 0)
    assert(top.groupBy("qid").count().filter($"count" =!= 5).count() == 0)
    // dimension mismatch is a typed error, not an executor crash
    intercept[graft.exceptions.InvalidArgumentValue] {
      Similarity.bruteForceTopK(
        corpus, queries.select($"vec_id",
          slice($"embedding", 1, 32).as("embedding")),
        "vec_id", "vec_id", "embedding", k = 5)
    }
  }

  test("int8 quantization round-trips within scale/2 per element") {
    // deterministic subset: limit() without ordering may pick
    // different rows across the two evaluations
    val sub = emb.filter($"vec_id" < 50)
    val q = Similarity.quantizeInt8(sub, "vec_id", "embedding")
    val joined = q.join(sub, "vec_id")
      .select($"vec_id", $"scale",
        Similarity.dequantize($"qvec", $"scale").as("dq"),
        transform($"embedding", x => x.cast("double")).as("v"))
    val rows = joined.select($"scale",
        array_max(zip_with($"v", $"dq", (a, b) => abs(a - b))).as("err"))
      .as[(Double, Double)].collect()
    rows.foreach { case (scale, err) =>
      assert(err <= scale / 2 + 1e-12, s"err $err > scale/2 ${scale / 2}")
    }
    // quantized values stay in int8 range
    val bounds = q.select(array_max($"qvec"), array_min($"qvec"))
      .as[(Int, Int)].collect()
    assert(bounds.forall { case (hi, lo) => hi <= 127 && lo >= -127 })
  }

  test("cosine of a vector with a scaled copy is exactly 1") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(2.0f, 4.0f, 6.0f)))
      .toDF("a", "b")
    val c = df.select(Similarity.cosine($"a", $"b")).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("language id predicts via stopword argmax with fixed tiebreak") {
    val df = Seq(
      (1L, "the cat and the dog"),
      (2L, "der hund und die katze ist von mir"),
      (3L, "xyzzy plugh")).toDF("id", "text")
    val out = TextAnalysis.languageId(df, "id", "text")
      .select("id", "predicted").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "und")
  }

  test("fingerprint ignores case, whitespace, and punctuation") {
    val df = Seq(("Hello,   World!"), ("hello world"), ("other"))
      .toDF("t").select(TextAnalysis.fingerprint($"t").as("fp"))
    val fps = df.as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("chunking covers every token with the configured overlap") {
    val df = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("id", "text")
    val chunks = TextAnalysis.chunk(df, "id", "text",
        chunkTokens = 4, overlapTokens = 1)
      .orderBy("chunk_idx")
      .select("chunk_text").as[String].collect().toSeq
    assert(chunks == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    // short doc → exactly one (shorter) chunk
    val short = TextAnalysis.chunk(
      Seq((2L, "a b")).toDF("id", "text"), "id", "text", 4, 1)
    assert(short.count() == 1)
    assert(short.head().getAs[String]("chunk_text") == "a b")
  }

  test("approx BPE token count is ceil(chars/4)") {
    val df = Seq(("abcdefgh"), ("abc")).toDF("t")
    assert(df.select(TextAnalysis.approxBpeTokens($"t"))
      .as[Long].collect().toSeq == Seq(2L, 1L))
  }

  test("multimodal extractFeatures decodes real pixels to known channel stats") {
    implicit val s = spark
    // a solid-color PNG (lossless): channel means are exactly the
    // fill color / 255 and stddevs exactly 0
    def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val orange = solidPng(6, 4, 0xff8800)
    val rows = Seq(
      Multimodal.MediaRow(1L, orange, "image/png"),
      Multimodal.MediaRow(2L, Array[Byte](1, 2, 3, 4), "image/png"),
      Multimodal.MediaRow(3L, null, "image/png"))
    val out = Multimodal.extractFeatures(rows.toDS()).collect()
      .sortBy(_.id)
    assert(out.map(_.sizeBytes).toSeq == Seq(orange.length.toLong, 4L, 0L))
    // the decoded row: [w, h, meanR, meanG, meanB, stdR, stdG, stdB]
    val f = out(0).features.get
    assert(f.length == Multimodal.ImageDecoder.FeatureDim)
    assert(f(0) == 6f && f(1) == 4f)
    assert(math.abs(f(2) - 255f / 255f) < 1e-6 &&
      math.abs(f(3) - 136f / 255f) < 1e-6 &&
      math.abs(f(4) - 0f) < 1e-6, s"means: ${f.toSeq}")
    assert(f(5) == 0f && f(6) == 0f && f(7) == 0f, s"stds: ${f.toSeq}")
    // non-image payloads fail soft: features null, size kept
    assert(out(1).features.isEmpty && out(2).features.isEmpty)
    // deterministic: same payload → same features
    val again = Multimodal.extractFeatures(rows.toDS()).collect()
      .sortBy(_.id)
    assert(out.map(_.features.map(_.toSeq)).toSeq ==
      again.map(_.features.map(_.toSeq)).toSeq)
  }

  test("de-HOF'd stats and languageId equal the HOF formulations") {
    // the round-2 implementations used aggregate/transform/filter —
    // CodegenFallback HOFs; this pins the codegen'd rewrites
    // (regexp-based avg_token_len and stopword counts) to the exact
    // old semantics over the real documents table
    val toks = TextAnalysis.tokens($"text")
    val nToks = size(toks).cast("double")
    val hofStats = docs.select($"doc_id",
      round(aggregate(transform(toks, t => length(t).cast("double")),
        lit(0.0), (acc, x) => acc + x) / nToks, 6).as("avg_token_len"))
    val newStats = TextAnalysis.stats(docs, "doc_id", "text")
      .select("doc_id", "avg_token_len")
    assert(newStats.except(hofStats).isEmpty &&
      hofStats.except(newStats).isEmpty)

    val hofHits = TextAnalysis.stopwords.keys.toSeq.sorted.map { lang =>
      val set = TextAnalysis.stopwords(lang)
      size(filter(toks, t => set.map(s => t === s).reduce(_ || _)))
        .cast("long").as(s"s_$lang")
    }
    val oldLang = docs.select(($"doc_id" +: hofHits): _*)
    val newLang = docs.select(
      ($"doc_id" +: TextAnalysis.stopwords.keys.toSeq.sorted.map(l =>
        TextAnalysis.stopwordHits($"text", l).as(s"s_$l"))): _*)
    assert(newLang.except(oldLang).isEmpty &&
      oldLang.except(newLang).isEmpty)
  }

  test("ivf recall@10 at nprobe=nlist/2: pinned on real data, >=0.9 on clustered") {
    // the approximate-path quality dial (VERDICT r2 item 4). Two data
    // regimes, both fully deterministic (ivfTopK seeds k-means from
    // the nlist lowest ids):
    //  - the real embeddings table is near-random (max pairwise cosine
    //    ~0.51, labels don't cluster), the worst case for IVF — there
    //    neighbor cells barely correlate with query cells, and the
    //    measured recall@10 at nprobe=nlist/2 is 0.78; pin >=0.7 as
    //    the regression floor and as documentation of the dial's cost
    //    on unclustered data;
    //  - on clustered vectors (the regime real embedding corpora are
    //    in, and where IVF is the right tool) the same half-probe
    //    setting must clear the 0.9 bar.
    def recallAt(corpus: org.apache.spark.sql.DataFrame,
                 queries: org.apache.spark.sql.DataFrame): Double = {
      val exact = Similarity.bruteForceTopK(corpus, queries,
          "vec_id", "vec_id", "embedding", k = 10)
        .select("qid", "cid").as[(Long, Long)].collect().toSet
      val approx = Similarity.ivfTopK(corpus, queries,
          "vec_id", "vec_id", "embedding", k = 10, nlist = 8, nprobe = 4)
        .select("qid", "cid").as[(Long, Long)].collect().toSet
      approx.intersect(exact).size.toDouble / exact.size
    }
    val realRecall = recallAt(emb.filter($"vec_id" >= 20)
        .select($"vec_id", $"embedding"),
      emb.filter($"vec_id" < 20).select($"vec_id", $"embedding"))
    assert(realRecall >= 0.7, s"recall@10 on embeddings was $realRecall")

    val rnd = new scala.util.Random(42)
    val centers = Array.fill(8, 16)(rnd.nextGaussian())
    val clustered = (0L until 400L).map { i =>
      val c = centers((i % 8).toInt)
      i -> c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq
    }.toDF("vec_id", "embedding")
    val clRecall = recallAt(clustered.filter($"vec_id" >= 20),
      clustered.filter($"vec_id" < 20))
    assert(clRecall >= 0.9, s"recall@10 on clustered vectors was $clRecall")
  }

  test("withMeta extracts size and hash without decoding") {
    val df = docs.limit(3).withColumn("content", $"text".cast("binary"))
    val m = Multimodal.withMeta(df, "doc_id", "content", "text/plain")
    val r = m.select($"meta.mime", $"meta.size_bytes", $"meta.sha").head()
    assert(r.getString(0) == "text/plain")
    assert(r.getLong(1) > 0)
    assert(r.getString(2).length == 32)
  }

  /** Encode a real image with the JDK's own writers — the fixtures
    * are genuine PNG/GIF/BMP/JPEG byte streams, not hand-built
    * headers.
    */
  private def encodeImage(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) { img.setRGB(x, 0, 0xff8800 + x); x += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos),
      s"no JDK writer for $fmt")
    bos.toByteArray
  }

  test("withImageMeta decodes real encoded PNG/GIF/BMP/JPEG headers") {
    val fixtures = Seq(
      (1L, encodeImage("png", 13, 7), "png", 13, 7),
      (2L, encodeImage("gif", 5, 9), "gif", 5, 9),
      (3L, encodeImage("bmp", 21, 4), "bmp", 21, 4),
      (4L, encodeImage("jpg", 16, 11), "jpeg", 16, 11))
    val df = fixtures.map { case (id, b, _, _, _) => (id, b) }
      .toDF("id", "content")
    val got = Multimodal.withImageMeta(df, "id", "content")
      .orderBy("id").collect()
    fixtures.zip(got).foreach { case ((id, _, f, w, h), r) =>
      assert(r.getLong(0) == id)
      assert(r.getString(1) == f, s"format for id=$id")
      assert(r.getInt(2) == w, s"width for id=$id")
      assert(r.getInt(3) == h, s"height for id=$id")
    }
  }

  test("withImageMeta fails soft (null row, no task failure) on bad payloads") {
    val png = encodeImage("png", 8, 8)
    val rows = Seq(
      (1L, png.take(10)),                               // truncated PNG
      (2L, Array[Byte](0xff.toByte, 0xd8.toByte, 0, 1)), // JPEG desync
      (3L, "just some text".getBytes("UTF-8")),          // not an image
      (4L, Array.empty[Byte]),                           // empty
      (5L, null.asInstanceOf[Array[Byte]]),              // null payload
      (6L, png))                                         // one good row
    val got = Multimodal.withImageMeta(rows.toDF("id", "content"),
      "id", "content").orderBy("id").collect()
    got.take(5).foreach { r =>
      assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3),
        s"row ${r.getLong(0)} should be all-null")
    }
    assert(got(5).getString(1) == "png")
    assert(got(5).getInt(2) == 8 && got(5).getInt(3) == 8)
  }

  /** Real WAV fixture via the JDK's own encoder (javax.sound). */
  private def encodeWav(rate: Float, channels: Int,
                        frames: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, 16, channels, true, false)
    val pcm = new Array[Byte](frames * fmt.getFrameSize)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Minimal valid FLAC: "fLaC" + last-block STREAMINFO (type 0,
    * 34 bytes) encoding 44100 Hz, 2ch, 16-bit, 88200 samples.
    */
  private def encodeFlacHeader(): Array[Byte] = {
    val out = new Array[Byte](4 + 4 + 34)
    "fLaC".getBytes("US-ASCII").copyToArray(out, 0)
    out(4) = 0x80.toByte // last-block flag, type 0
    out(7) = 34          // block length (be24)
    val o = 8
    // bytes 10-12: rate 44100 (20 bits) | channels-1=1 (3) | bps-1 hi
    out(o + 10) = ((44100 >> 12) & 0xff).toByte
    out(o + 11) = ((44100 >> 4) & 0xff).toByte
    out(o + 12) = (((44100 & 0xf) << 4) | (1 << 1) | 0).toByte
    // byte 13: bps-1 low nibble (15) | total-samples bits 35-32 (0)
    out(o + 13) = 0xf0.toByte
    // bytes 14-17: total samples 88200 (be32)
    out(o + 14) = ((88200 >> 24) & 0xff).toByte
    out(o + 15) = ((88200 >> 16) & 0xff).toByte
    out(o + 16) = ((88200 >> 8) & 0xff).toByte
    out(o + 17) = (88200 & 0xff).toByte
    out
  }

  test("withAudioMeta decodes WAV and FLAC headers; fails soft otherwise") {
    val wav = encodeWav(8000f, 2, 4000) // 0.5 s stereo
    val rows = Seq(
      (1L, wav),
      (2L, encodeFlacHeader()),
      (3L, wav.take(11)),                      // truncated RIFF
      (4L, "not audio at all".getBytes("UTF-8")),
      (5L, null.asInstanceOf[Array[Byte]]))
    val got = Multimodal.withAudioMeta(rows.toDF("id", "content"),
      "id", "content").orderBy("id").collect()
    val w = got(0)
    assert(w.getString(1) == "wav" && w.getInt(2) == 2 &&
      w.getInt(3) == 8000 && w.getInt(4) == 16 && w.getLong(5) == 500L)
    val f = got(1)
    assert(f.getString(1) == "flac" && f.getInt(2) == 2 &&
      f.getInt(3) == 44100 && f.getInt(4) == 16 &&
      f.getLong(5) == 2000L)
    got.drop(2).foreach { r =>
      (1 to 5).foreach(i => assert(r.isNullAt(i),
        s"row ${r.getLong(0)} col $i should be null"))
    }
  }

  test("pq with one codeword per vector and no rerank is exact cosine") {
    // m=1, ncodes = |corpus|, distinct vectors: k-means init gives each
    // vector its own codeword and the means fix-point there, so the ADC
    // lookup IS dot(q̂, ĉ) = exact cosine — the degenerate configuration
    // that pins the whole table/encode/scan path numerically
    val corpus = Seq(
      (10L, Seq(1f, 0f, 0f, 0f)), (11L, Seq(0f, 1f, 0f, 0f)),
      (12L, Seq(0f, 0f, 1f, 0f)), (13L, Seq(0f, 0f, 0f, 1f)),
      (14L, Seq(1f, 1f, 0f, 0f)), (15L, Seq(0f, 1f, 1f, 0f)),
      (16L, Seq(1f, 0f, 0f, 1f)), (17L, Seq(2f, 1f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((0L, Seq(3f, 1f, 0f, 0f)), (1L, Seq(0f, 1f, 2f, 1f)))
      .toDF("vec_id", "embedding")
    val pq = Similarity.pqTopK(corpus, queries, "vec_id", "vec_id",
      "embedding", k = 8, m = 1, ncodes = 8, kmeansIters = 2,
      shortlist = 8, rerank = false)
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id",
      "vec_id", "embedding", k = 8)
    val got = pq.orderBy("qid", "rnk")
      .as[(Long, Long, Long, Double)].collect()
    val want = exact.orderBy("qid", "rnk")
      .as[(Long, Long, Long, Double)].collect()
    pq.unpersist()
    assert(got.length == want.length)
    got.zip(want).foreach { case ((gq, gr, gc, gs), (wq, wr, wc, ws)) =>
      assert((gq, gr, gc) == (wq, wr, wc))
      assert(math.abs(gs - ws) < 1e-9, s"sim $gs != $ws at ($gq,$gr)")
    }
  }

  test("pq rerank recall@10 >= 0.9 on clustered vectors with exact sims") {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(8, 16)(rnd.nextGaussian())
    val vecs = (0L until 300L).map { i =>
      val c = centers((i % 8).toInt)
      i -> c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq
    }.toDF("vec_id", "embedding")
    val corpus = vecs.filter($"vec_id" >= 10)
    val queries = vecs.filter($"vec_id" < 10)
    val pq = Similarity.pqTopK(corpus, queries, "vec_id", "vec_id",
      "embedding", k = 10, m = 4, ncodes = 16, shortlist = 50)
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id",
      "vec_id", "embedding", k = 10)
    val pqSet = pq.select("qid", "cid").as[(Long, Long)].collect().toSet
    val exSims = exact.select("qid", "cid", "sim")
      .as[(Long, Long, Double)].collect()
      .map { case (q, c, s) => (q, c) -> s }.toMap
    val recall = pqSet.count(exSims.contains).toDouble / exSims.size
    assert(recall >= 0.9, s"pq recall@10 was $recall")
    // reranked sims must be the EXACT cosine wherever pq found a true hit
    val pqSims = pq.select("qid", "cid", "sim")
      .as[(Long, Long, Double)].collect()
    pq.unpersist()
    pqSims.filter(r => exSims.contains((r._1, r._2))).foreach {
      case (q, c, s) =>
        assert(math.abs(s - exSims((q, c))) < 1e-9,
          s"rerank sim not exact for ($q,$c)")
    }
  }

  test("pq argument guards reject bad geometry") {
    val corpus = emb.limit(20)
    intercept[graft.exceptions.InvalidArgumentValue] {
      Similarity.pqTopK(corpus, corpus.limit(2), "vec_id", "vec_id",
        "embedding", k = 5, m = 7) // 64 % 7 != 0
    }
    intercept[graft.exceptions.InvalidArgumentValue] {
      Similarity.pqTopK(corpus, corpus.limit(2), "vec_id", "vec_id",
        "embedding", k = 10, shortlist = 5)
    }
  }

  test("sampleToBudget equals the naive one-window rule; unweighted groups drop") {
    import org.apache.spark.sql.expressions.Window
    val corpus = (1L to 60L).map(i =>
      (i, Seq("a", "b", "c")((i % 3).toInt), i * 7 % 50 + 10))
      .toDF("doc_id", "source", "n_chars")
    val got = TextAnalysis.sampleToBudget(corpus, "doc_id", "n_chars",
      "source", Map("a" -> 1.0, "b" -> 3.0), totalBudget = 400L)
    // budgets: floor(400·1/4)=100, floor(400·3/4)=300
    val w = Window.partitionBy($"source")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = corpus.filter($"source".isin("a", "b"))
      .withColumn("cum", sum($"n_chars".cast("long")).over(w))
      .withColumn("budget",
        when($"source" === "a", 100L).otherwise(300L))
      .filter($"cum" <= $"budget")
      .select("doc_id").as[Long].collect().toSet
    val gotIds = got.select("doc_id").as[Long].collect().toSet
    assert(gotIds == expected)
    assert(gotIds.nonEmpty)
    // the sample is a strict subset: adding any group's next-in-hash-order
    // doc would blow its budget, and group c (no weight) contributes nothing
    assert(got.filter($"source" === "c").count() == 0)
    assert(got.columns.toSeq ==
      Seq("source", "doc_id", "n_chars")) // original columns, no temps
  }

  test("sampleToBudget: zero budget keeps nothing; ample budget keeps all weighted") {
    val corpus = (1L to 20L).map(i => (i, "a", 10L))
      .toDF("doc_id", "source", "n_chars")
    val none = TextAnalysis.sampleToBudget(corpus, "doc_id", "n_chars",
      "source", Map("a" -> 1.0), totalBudget = 0L)
    assert(none.count() == 0)
    val all = TextAnalysis.sampleToBudget(corpus, "doc_id", "n_chars",
      "source", Map("a" -> 1.0), totalBudget = 1000000L)
    assert(all.count() == 20)
  }

  test("duplicatedGramStats computes per-doc shared-gram fractions") {
    val corpus = Seq(
      (1L, "a b c d e f"), // trigrams: abc bcd cde def
      (2L, "a b c d e f"), // identical → every gram shared
      (3L, "x y z w v u")  // disjoint
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedGramStats(corpus, "doc_id", "text", n = 3)
      .orderBy("id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 4L, 4L, 1.0), (2L, 4L, 4L, 1.0),
      (3L, 4L, 0L, 0.0)))
  }

  test("duplicatedGramStats clips docs shorter than n to one gram") {
    val corpus = Seq((1L, "hello"), (2L, "hello"), (3L, "bye"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicatedGramStats(corpus, "doc_id", "text", n = 5)
      .orderBy("id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1L, 1L, 1.0), (2L, 1L, 1L, 1.0),
      (3L, 1L, 0L, 0.0)))
    intercept[graft.exceptions.InvalidArgumentValue] {
      Dedup.duplicatedGramStats(corpus, "doc_id", "text", n = 3,
        minDocs = 1)
    }
  }

  test("removeDuplicatedLines strips cross-doc boilerplate, keeps structure") {
    val corpus = Seq(
      (1L, "cookie banner\nunique one\ncookie banner"),
      (2L, "cookie banner\nunique two"),
      (3L, "   \nunique three\n   "), // whitespace-only lines stay
      (4L, "cookie banner")           // all boilerplate → empty doc
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedLines(corpus, "doc_id", "text")
      .orderBy("id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, "unique one"),
      (2L, 2L, 1L, "unique two"),
      (3L, 3L, 0L, "   \nunique three\n   "),
      (4L, 1L, 1L, "")))
    // multi-char separator round trip
    val sep2 = Dedup.removeDuplicatedLines(
        Seq((1L, "dup||keep a"), (2L, "dup||keep b"))
          .toDF("doc_id", "text"), "doc_id", "text", sep = "||")
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    assert(sep2 == Seq((1L, 2L, 1L, "keep a"), (2L, 2L, 1L, "keep b")))
    intercept[graft.exceptions.InvalidArgumentValue] {
      Dedup.removeDuplicatedLines(corpus, "doc_id", "text", minDocs = 1)
    }
    intercept[graft.exceptions.InvalidArgumentValue] {
      Dedup.removeDuplicatedLines(corpus, "doc_id", "text", sep = "")
    }
  }

  test("removeDuplicatedLines counts docs, not occurrences") {
    // the dup line repeats 3x in ONE doc — distinct-doc count is 1,
    // below minDocs=2, so nothing is removed
    val corpus = Seq((1L, "x\nx\nx"), (2L, "y")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedLines(corpus, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 3L, 0L, "x\nx\nx"), (2L, 1L, 0L, "y")))
  }

  test("tfidfTopTerms equals the naive one-window formulation") {
    val docs = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "banana cherry cherry date"),
      (3L, "apple date date date egg"),
      (4L, "fig fig fig grape apple")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .select("id", "term", "tf", "df", "score", "rk")
      .orderBy("id", "rk")
      .as[(Long, String, Long, Long, Double, Long)].collect().toSeq
    // naive replica: explode, count, window rank — driver-side
    val n = 4.0
    val rows = Seq(1L -> "apple apple banana cherry",
      2L -> "banana cherry cherry date",
      3L -> "apple date date date egg",
      4L -> "fig fig fig grape apple")
    val toks = rows.flatMap { case (id, t) =>
      t.split("\\s+").map(id -> _) }
    val tf = toks.groupBy(identity).map { case ((id, w), xs) =>
      (id, w, xs.size.toLong) }
    val dfm = toks.distinct.groupBy(_._2).map { case (w, xs) =>
      w -> xs.size.toLong }
    val expect = tf.map { case (id, w, f) =>
      (id, w, f, dfm(w),
        f * (math.log((n + 1.0) / (dfm(w) + 1.0)) + 1.0)) }
      .groupBy(_._1).toSeq.flatMap { case (_, xs) =>
        xs.toSeq.sortBy(x => (-x._5, x._2)).take(2).zipWithIndex
          .map { case ((id, w, f, d, s), i) =>
            (id, w, f, d, s, (i + 1).toLong) }
      }.sortBy(x => (x._1, x._6))
    assert(got.map(x => (x._1, x._2, x._3, x._4, x._6)) ==
      expect.map(x => (x._1, x._2, x._3, x._4, x._6)))
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._5 - e._5) < 1e-12) }
    // minDf drops singletons entirely
    val rare = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text",
      k = 5, minDf = 2)
    assert(!rare.select("term").as[String].collect().contains("egg"))
    intercept[graft.exceptions.InvalidArgumentValue] {
      TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 0)
    }
  }

  test("semanticDedup keeps one representative per high-cosine group") {
    val rnd = new scala.util.Random(11L)
    val base = (0L until 10L).map(i =>
      i -> Array.fill(16)(rnd.nextGaussian().toFloat))
    // ids 10..14 are jittered copies of bases 0..4 → cosine ≈ 1
    val jitter = (0L until 5L).map { i =>
      (i + 10L) -> base(i.toInt)._2.map(x => x * 1.0001f + 1e-6f)
    }
    val df = (base ++ jitter).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(df, "vec_id", "embedding",
        threshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    // each jitter clusters with its base; min id (the base) survives
    assert(kept == (0L until 10L).toSet)
    // schema passes through unchanged
    assert(Similarity.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.999).columns.toSeq == Seq("vec_id", "embedding"))
  }

  test("cosineNearDups enumeration monitor warns on dense buckets, rows unchanged") {
    // dense corpus: 60 jittered copies of ONE vector land every id in
    // the same bucket of every band → the band join enumerates
    // bands * n*(n-1)/2 sketch comparisons (= 32 * 1770 = 56,640 with
    // the defaults), far beyond a low-set warn threshold
    val rnd = new scala.util.Random(23L)
    val proto = Array.fill(16)(rnd.nextGaussian().toFloat)
    val dense = (0L until 60L).map { i =>
      (i, proto.map(x => x * (1.0f + i * 1e-5f)).toSeq)
    }
    val distinctTail = (100L until 110L).map { i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq)
    }
    val df = (dense ++ distinctTail).toDF("vec_id", "embedding")
    def pairsOf(): Set[(Long, Long)] = {
      val r = Similarity.cosineNearDups(df, "vec_id", "embedding",
        threshold = 0.999)
      val out = r.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      r.unpersist()
      out
    }
    graft.llm.GuardEvents.clear("cosineNearDups")
    val key = "graft.similarity.warnEnumeratedPairs"
    try {
      spark.conf.set(key, "1000")
      val warned = pairsOf()
      val event = graft.llm.GuardEvents.lastFor("cosineNearDups")
      assert(event.isDefined, "expected the enumeration warn to fire")
      assert(event.get.contains("planesPerBand"),
        "warn must carry the planesPerBand escape guidance")
      // monitor only: the warn changes no rows
      spark.conf.set(key, "0") // disabled
      graft.llm.GuardEvents.clear("cosineNearDups")
      val silent = pairsOf()
      assert(graft.llm.GuardEvents.lastFor("cosineNearDups").isEmpty)
      assert(warned == silent)
      // the dense family is fully paired (exact verify keeps them all)
      assert(warned.count(p => p._1 < 60 && p._2 < 60) == 60 * 59 / 2)
    } finally spark.conf.unset(key)
  }

  test("extractAudioFeatures: exact PCM stats from a hand-built WAV") {
    import graft.llm.Multimodal
    // 1-channel 8 kHz 16-bit PCM square wave at +-8192 (= 0.25 of
    // full scale): rms = peak = 0.25 exactly, dc offset = 0
    def wav(samples: Seq[Int], ch: Int, rate: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
      def fcc(s: String): Unit = s.foreach(c => out.write(c.toInt))
      val dataLen = samples.size * 2
      fcc("RIFF"); w32(36 + dataLen); fcc("WAVE")
      fcc("fmt "); w32(16); w16(1); w16(ch); w32(rate)
      w32(rate * ch * 2); w16(ch * 2); w16(16)
      fcc("data"); w32(dataLen); samples.foreach(w16)
      out.toByteArray
    }
    val square = wav((0 until 400).map(i =>
      if (i % 2 == 0) 8192 else -8192), ch = 1, rate = 8000)
    val df = Seq(1L -> square, 2L -> "not audio".getBytes)
      .toDF("clip_id", "content")
    val got = Multimodal.extractAudioFeatures(df, "clip_id", "content")
      .orderBy("id")
      .as[(Long, Long, Option[Seq[Float]])].collect()
    val f = got(0)._3.get
    assert(f.size == Multimodal.AudioDecoder.FeatureDim)
    assert(f(0) == 1.0f && f(1) == 8000.0f && f(2) == 400.0f)
    assert(math.abs(f(3) - 0.25f) < 1e-6, s"rms ${f(3)}")
    assert(f(4) == 0.25f, s"peak ${f(4)}")
    assert(math.abs(f(5)) < 1e-6, s"dc ${f(5)}")
    // compressed/garbage payloads fail soft (size kept, features null)
    assert(got(1)._3.isEmpty && got(1)._2 > 0)
  }

  test("AudioDecoder: WAVE_FORMAT_EXTENSIBLE with a PCM sub-format decodes") {
    import graft.llm.Multimodal
    // stereo 16-bit PCM wrapped in the EXTENSIBLE fmt chunk (tag
    // 0xFFFE, 40-byte fmt with cbSize=22 and the
    // KSDATAFORMAT_SUBTYPE_PCM GUID) — the common multi-channel
    // layout; the samples need no codec (round-12 advisor finding)
    def extWav(samples: Seq[Int], ch: Int, rate: Int,
               subFormatCode: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
      def fcc(s: String): Unit = s.foreach(c => out.write(c.toInt))
      val dataLen = samples.size * 2
      fcc("RIFF"); w32(60 + dataLen); fcc("WAVE")
      fcc("fmt "); w32(40); w16(0xFFFE); w16(ch); w32(rate)
      w32(rate * ch * 2); w16(ch * 2); w16(16)
      w16(22) // cbSize
      w16(16) // wValidBitsPerSample
      w32(3)  // dwChannelMask (FL | FR)
      w16(subFormatCode); w16(0) // SubFormat GUID Data1 (le)
      w16(0); w16(0x10) // Data2, Data3
      Seq(0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71)
        .foreach(out.write) // Data4
      fcc("data"); w32(dataLen); samples.foreach(w16)
      out.toByteArray
    }
    // interleaved stereo square wave at +-8192: rms = peak = 0.25
    val samples = (0 until 400).map(i => if (i % 2 == 0) 8192 else -8192)
    val pcm = Multimodal.AudioDecoder.decode(extWav(samples, 2, 44100, 1))
    assert(pcm.isDefined, "extensible-PCM WAV must decode")
    val f = pcm.get
    assert(f(0) == 2.0f && f(1) == 44100.0f && f(2) == 200.0f) // 400 samples / 2 ch
    assert(f(4) == 0.25f && math.abs(f(3) - 0.25f) < 1e-6)
    // a NON-PCM sub-format (e.g. IEEE float = 3) still needs a codec
    assert(Multimodal.AudioDecoder.decode(extWav(samples, 2, 44100, 3)).isEmpty,
      "extensible with non-PCM sub-format must fail soft")
  }

  test("resizeImages: aspect-preserving downscale, pass-through, fail-soft") {
    import graft.llm.Multimodal
    def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val big = solidPng(100, 80, 0x2266aa) // longer edge 100 > 50
    val small = solidPng(30, 20, 0x2266aa) // already fits
    val df = Seq(1L -> big, 2L -> small, 3L -> "junk".getBytes)
      .toDF("img_id", "content")
    val out = Multimodal.resizeImages(df, "img_id", "content", maxDim = 50)
      .orderBy("id")
      .as[(Long, Option[Array[Byte]], Option[Int], Option[Int])]
      .collect()
    // downscaled aspect-preserving: 100x80 -> 50x40, and the re-encoded
    // PNG really has those pixel dims with the fill color preserved
    // (solid color survives bilinear resampling exactly)
    assert(out(0)._3 == Some(50) && out(0)._4 == Some(40))
    val re = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0)._2.get))
    assert(re.getWidth == 50 && re.getHeight == 40)
    assert((re.getRGB(25, 20) & 0xffffff) == 0x2266aa)
    // already-fitting payloads pass through BYTE-identical (no
    // generation loss on the common path)
    assert(out(1)._2.get.sameElements(small) &&
      out(1)._3 == Some(30) && out(1)._4 == Some(20))
    // garbage: null row, id kept, never a throw
    assert(out(2)._1 == 3L && out(2)._2.isEmpty && out(2)._3.isEmpty)
    intercept[graft.exceptions.InvalidArgumentValue] {
      Multimodal.resizeImages(df, "img_id", "content", maxDim = 0)
    }
  }

  test("video headers: AVI synthesize/parse round-trip and fail-soft") {
    import graft.llm.Multimodal.{VideoHeaders, VideoInfo}
    val b = VideoHeaders.syntheticAvi(usecPerFrame = 40000,
      totalFrames = 250, width = 1920, height = 1080)
    // 250 frames * 40000 usec / 1000 = 10000 ms
    assert(VideoHeaders.parse(b) === Some(VideoInfo("avi", Some(10000L),
      Some(250L), Some(40000L), Some(1920), Some(1080))))
    // the fail-soft contract: truncation, garbage, null — None, never
    // a throw (at 100 TB some payloads WILL be garbage)
    assert(VideoHeaders.parse(b.take(40)) === None)
    assert(VideoHeaders.parse("not a video at all".getBytes) === None)
    assert(VideoHeaders.parse(null) === None)
    assert(VideoHeaders.parse(Array.empty[Byte]) === None)
    intercept[graft.exceptions.InvalidArgumentValue] {
      VideoHeaders.syntheticAvi(0, 1, 1, 1)
    }
  }

  test("video headers: minimal MP4 mvhd/tkhd parse") {
    import graft.llm.Multimodal.{VideoHeaders, VideoInfo}
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(cc: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ cc.getBytes("ISO-8859-1") ++ payload
    // mvhd v0: version+flags, ctime, mtime, timescale=1000,
    // duration=7500 -> 7500 ms (minimal payload; the parser is
    // bounds-checked, not schema-strict)
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++
      be32(0) ++ be32(1000) ++ be32(7500))
    // tkhd: the display dims are the LAST 8 bytes, 16.16 fixed point
    val tkhd = box("tkhd",
      Array.fill[Byte](8)(0) ++ be32(640L << 16) ++ be32(360L << 16))
    val bytes = box("ftyp", "isomiso2".getBytes("ISO-8859-1")) ++
      box("moov", mvhd ++ box("trak", tkhd))
    assert(VideoHeaders.parse(bytes) === Some(VideoInfo("mp4",
      Some(7500L), None, None, Some(640), Some(360))))
    // mvhd v1 (64-bit ctime/mtime/duration)
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++
      Array.fill[Byte](16)(0) ++ be32(600) ++ be32(0) ++ be32(1200))
    val bytes1 = box("ftyp", "isom".getBytes) ++ box("moov", mvhd1)
    assert(VideoHeaders.parse(bytes1) ===
      Some(VideoInfo("mp4", Some(2000L), None, None, None, None)))
  }

  test("sampleFrameIndices: uniform spacing, dedup past n, fail-soft") {
    import graft.llm.Multimodal
    val v1 = Multimodal.VideoHeaders.syntheticAvi(33333, 10, 320, 240)
    val v2 = Multimodal.VideoHeaders.syntheticAvi(500000, 2, 64, 48)
    val df = Seq(1L -> v1, 2L -> v2, 3L -> "garbage".getBytes)
      .toDF("vid", "content")
    val got = Multimodal.sampleFrameIndices(df, "vid", "content", k = 4)
      .orderBy("id", "frame_idx")
      .as[(Long, Long, Long)].collect().toSeq
    // vid 1 (n=10): floor(j*10/4) = 0,2,5,7 at 33333 usec/frame;
    // vid 2 (n=2): floor(j*2/4) = 0,0,1,1 -> dedup {0,1};
    // vid 3: unparseable, skipped (fail-soft)
    assert(got === Seq(
      (1L, 0L, 0L), (1L, 2L, 66L), (1L, 5L, 166L), (1L, 7L, 233L),
      (2L, 0L, 0L), (2L, 1L, 500L)))
    intercept[graft.exceptions.InvalidArgumentValue] {
      Multimodal.sampleFrameIndices(df, "vid", "content", k = 0)
    }
  }

  test("sampleFrameFeatures: stubbed decode is deterministic and total") {
    import graft.llm.Multimodal
    val v1 = Multimodal.VideoHeaders.syntheticAvi(33333, 10, 320, 240)
    val df = Seq(1L -> v1).toDF("vid", "content")
    def run() = Multimodal.sampleFrameFeatures(df, "vid", "content", k = 3)
      .orderBy("frame_idx")
      .as[(Long, Long, Long, Option[Seq[Float]])].collect().toSeq
    val a = run()
    assert(a.size == 3 && a.forall(_._4.exists(
      _.size == Multimodal.VideoFrameDecoder.FeatureDim)))
    // the stub is a DETERMINISTIC fake (the codec seam's contract):
    // same payload + frame -> same features, different frames differ
    assert(run() === a)
    assert(a.map(_._4.get).distinct.size == 3)
  }

  test("MJPEG-in-AVI: real frame pixel decode, exact gray round trip") {
    import graft.llm.Multimodal
    // 5 uniform-gray JPEG frames; gray(j) spans low/mid/high values
    val grays = Seq(0, 37, 128, 200, 255)
    val avi = Multimodal.VideoHeaders.syntheticMjpegAvi(
      usecPerFrame = 40000, width = 48, height = 32, frameGrays = grays)
    // the avih header still parses (q138's parser path)
    val info = Multimodal.VideoHeaders.parse(avi).get
    assert(info.format == "avi" && info.nFrames.contains(5L) &&
      info.width.contains(48) && info.height.contains(32))
    // chunk walk: every frame extracts as a standalone JPEG (SOI) and
    // decodes to EXACTLY its source gray (DC-only JPEG round trip)
    grays.zipWithIndex.foreach { case (v, j) =>
      val chunk = Multimodal.VideoHeaders.videoFrameChunk(avi, j.toLong)
      assert(chunk.isDefined, s"frame $j missing from movi walk")
      assert((chunk.get(0) & 0xff) == 0xff && (chunk.get(1) & 0xff) == 0xd8)
      val st = Multimodal.VideoFrameDecoder.jpegStats(chunk.get).get
      assert(st(0) == 48f && st(1) == 32f, s"frame $j dims ${st.toSeq}")
      assert(st(2) == v.toFloat && st(3) == v.toFloat,
        s"frame $j gray $v decoded to mean=${st(2)} max=${st(3)}")
    }
    // out-of-range / non-AVI → None from the chunk walk
    assert(Multimodal.VideoHeaders.videoFrameChunk(avi, 5L).isEmpty)
    assert(Multimodal.VideoHeaders
      .videoFrameChunk("junk".getBytes, 0L).isEmpty)
    // end-to-end through the Spark operator: sampled frames carry the
    // REAL decoded stats
    val df = Seq(7L -> avi).toDF("vid", "content")
    val got = Multimodal.sampleFrameFeatures(df, "vid", "content", k = 5)
      .orderBy("frame_idx")
      .as[(Long, Long, Long, Option[Seq[Float]])].collect().toSeq
    assert(got.size == 5)
    got.foreach { case (_, fi, _, f) =>
      assert(f.get(2) == grays(fi.toInt).toFloat,
        s"frame $fi decoded mean ${f.get(2)} != ${grays(fi.toInt)}")
    }
    // a CORRUPT JPEG chunk fails soft to None (never a fake, never a
    // task failure): truncate the last frame's JPEG mid-stream
    val corrupt = Multimodal.VideoHeaders.syntheticMjpegAvi(
      40000, 48, 32, Seq(100))
    // SOI survives, body is zeroed -> ImageIO decode fails
    val chunkOff = {
      // locate the 00dc payload: header(12) + hdrl LIST(8+68) + LIST
      // movi header(12) + chunk header(8)
      12 + 76 + 12 + 8
    }
    java.util.Arrays.fill(corrupt, chunkOff + 2, corrupt.length, 0.toByte)
    val bad = Multimodal.sampleFrameFeatures(
      Seq(9L -> corrupt).toDF("vid", "content"), "vid", "content", k = 1)
      .as[(Long, Long, Long, Option[Seq[Float]])].collect().toSeq
    assert(bad.size == 1 && bad.head._4.isEmpty,
      s"corrupt MJPEG frame must yield null features: ${bad.head}")
  }

  test("capped estimator sketch (b*r > 256) matches exact cosine truth") {
    // the round-12 sketch cap: an explicit (40, 10) geometry carries
    // 400 banding bits but the banded rows' estimator is capped at
    // 256 (t=0.9 needs 63) — this test pins the CAPPED path, which no
    // below-knee corpus exercises (auto picks b*r = 256 there), against
    // driver-computed exact truth: every returned pair is a true
    // >= threshold pair (exact verify) and every planted near-dup is
    // found. Deterministic: fixed vector seed, fixed plane seed.
    val rnd = new scala.util.Random(97L)
    val base = (0L until 300L).map(i =>
      i -> Array.fill(24)(rnd.nextGaussian()))
    val jitter = (0L until 40L).map { i =>
      (i + 1000L) -> base(i.toInt)._2.map(x => x * 1.0001 + 1e-5)
    }
    val all = base ++ jitter
    val df = all.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    val truth = (for {
      x <- all.indices.iterator
      y <- (x + 1) until all.size
      if cos(all(x)._2, all(y)._2) >= 0.9
    } yield {
      val (i, j) = (all(x)._1, all(y)._1)
      (math.min(i, j), math.max(i, j))
    }).toSet
    assert(truth.size >= 40, "fixture lost its planted pairs")
    val r = Similarity.cosineNearDups(df, "vec_id", "embedding",
      threshold = 0.9, bands = 40, planesPerBand = 10)
    val got = r.select("id_a", "id_b").as[(Long, Long)].collect()
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    r.unpersist()
    assert(got == truth,
      s"capped-sketch pairs diverge from exact truth: missing " +
        s"${(truth -- got).take(5)}, extra ${(got -- truth).take(5)}")
  }

  test("cosineNearDups: pre-counted knownCount yields identical pairs") {
    // composed pipelines (semanticDedup, caller-persisted frames) can
    // pass the corpus size and skip the input-count job (round-12
    // verdict #6) — rows must be byte-identical to the counting path
    val df = emb.select($"vec_id",
      $"embedding".cast("array<double>").as("v"))
    val n = df.count()
    def pairs(r: org.apache.spark.sql.DataFrame) = {
      val s = r.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      r.unpersist(); s
    }
    val counted = pairs(
      Similarity.cosineNearDups(df, "vec_id", "v", threshold = 0.95))
    val known = pairs(Similarity.cosineNearDups(df, "vec_id", "v",
      threshold = 0.95, knownCount = n))
    assert(counted == known,
      s"knownCount path diverged: ${counted.size} vs ${known.size} pairs")
  }

  test("groupCentroidAffinity: hand-checked cosines, zero-norm is null") {
    val vecs = Seq(
      ("a", Seq(1.0f, 0.0f)), ("a", Seq(3.0f, 0.0f)), // centroid (2,0)
      ("b", Seq(0.0f, 2.0f)),                         // centroid (0,2)
      ("c", Seq(1.0f, 1.0f)),                         // centroid (1,1)
      ("z", Seq(0.0f, 0.0f))                          // zero centroid
    ).toDF("src", "vec")
    val got = Similarity.groupCentroidAffinity(vecs, "src", "vec")
      .orderBy("group_a", "group_b")
      .as[(String, String, Option[Double])].collect().toSeq
    val byPair = got.map(x => (x._1, x._2) -> x._3).toMap
    assert(byPair(("a", "b")).get == 0.0)
    assert(math.abs(byPair(("a", "c")).get - 1.0 / math.sqrt(2)) < 1e-12)
    assert(math.abs(byPair(("b", "c")).get - 1.0 / math.sqrt(2)) < 1e-12)
    assert(byPair(("a", "z")).isEmpty) // zero-norm → null, not NaN
    assert(got.size == 6) // 4 groups → 6 unordered pairs
  }

  test("kmeansAssign splits obvious clusters; trajectory is partitioning-independent") {
    val df = Seq(
      (1L, Seq(1.0f, 0.02f)), (2L, Seq(0.9f, -0.01f)),
      (3L, Seq(1.1f, 0.0f)),
      (4L, Seq(0.01f, 1.0f)), (5L, Seq(0.0f, 0.9f)),
      (6L, Seq(-0.02f, 1.2f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.kmeansAssign(df, "vec_id", "embedding",
        k = 2, iters = 3)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val cl = got.map(r => r._1 -> r._2).toMap
    assert(Set(cl(1L), cl(2L), cl(3L)).size == 1)
    assert(Set(cl(4L), cl(5L), cl(6L)).size == 1)
    assert(cl(1L) != cl(4L))
    assert(got.forall(_._3 > 0.9)) // tight clusters → high cosine
    // the rounded trajectory must not depend on input partitioning
    val re = Similarity.kmeansAssign(df.repartition(7), "vec_id",
        "embedding", k = 2, iters = 3)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(re == got)
    intercept[graft.exceptions.InvalidArgumentValue] {
      Similarity.kmeansAssign(df, "vec_id", "embedding", k = 0, iters = 1)
    }
    intercept[graft.exceptions.InvalidArgumentValue] {
      Similarity.kmeansAssign(df, "vec_id", "embedding", k = 2, iters = -1)
    }
  }

  test("kmeansAssign: zero-norm vector lands in cluster 0 with NaN sim") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (9L, Seq(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val z = Similarity.kmeansAssign(df, "vec_id", "embedding",
        k = 2, iters = 1)
      .filter($"id" === 9L).as[(Long, Long, Double)].head()
    assert(z._2 == 0L)
    assert(z._3.isNaN)
  }

  test("prototypePrune drops floor(n*f) per cluster; ranks match a naive window") {
    import org.apache.spark.sql.expressions.Window
    val assigned = Similarity.kmeansAssign(emb, "vec_id", "embedding",
      k = 4, iters = 2)
    val sizes = assigned.groupBy("cluster").count()
      .as[(Long, Long)].collect().toMap
    val pruned = Similarity.prototypePrune(emb, "vec_id", "embedding",
      k = 4, iters = 2, pruneFraction = 0.25)
    val kept = pruned.groupBy("cluster").count()
      .as[(Long, Long)].collect().toMap
    sizes.foreach { case (c, n) =>
      assert(kept.getOrElse(c, 0L) == n - math.floor(n * 0.25).toLong)
    }
    // fraction 0 keeps every row, and the distributed global-index
    // rank must equal the one-window-per-cluster naive rank
    val all = Similarity.prototypePrune(emb, "vec_id", "embedding",
      k = 4, iters = 2, pruneFraction = 0.0)
    assert(all.count() == assigned.count())
    val naive = assigned.withColumn("rk_naive",
      row_number().over(Window.partitionBy("cluster")
        .orderBy(col("sim").desc, col("id").asc)).cast("long"))
    val mismatches = all.join(naive.select("id", "rk_naive"), "id")
      .filter($"rk" =!= $"rk_naive").count()
    assert(mismatches == 0)
    intercept[graft.exceptions.InvalidArgumentValue] {
      Similarity.prototypePrune(emb, "vec_id", "embedding",
        k = 4, iters = 1, pruneFraction = 1.0)
    }
  }

  test("redactPii: counts on original text, replacements in rule order") {
    val df = Seq(
      (1L, "mail a@b.com and c@d.org ip 10.0.0.1 ssn 123-45-6789"),
      (2L, "clean text, no pii at all"),
      (3L, "ip-like 999.1.2.3 inside 1.2.3.4.5 runs")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(df, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got(0) == ((1L,
      "mail <EMAIL> and <EMAIL> ip <IP> ssn <SSN>", 2L, 1L, 1L)))
    assert(got(1) == ((2L, "clean text, no pii at all", 0L, 0L, 0L)))
    // \b is a word boundary, not an anchor: 999.1.2.3 matches, and
    // the 5-octet run matches its first 4 octets (documented
    // precision-first tradeoff of the conservative default pattern)
    assert(got(2)._4 == 2L)
    // custom rules: count measured on ORIGINAL text even when an
    // earlier rule's replacement destroys the later rule's match
    val over = TextAnalysis.redactPii(
      Seq((1L, "x@y.com")).toDF("doc_id", "text"), "doc_id", "text",
      Seq(TextAnalysis.PiiRule("em", "x@y\\.com", "<GONE>"),
          TextAnalysis.PiiRule("dom", "y\\.com", "<DOM>")))
      .as[(Long, String, Long, Long)].head()
    assert(over == ((1L, "<GONE>", 1L, 1L)))
    intercept[graft.exceptions.InvalidArgumentValue] {
      TextAnalysis.redactPii(df, "doc_id", "text", Seq.empty)
    }
    intercept[graft.exceptions.InvalidArgumentValue] {
      TextAnalysis.redactPii(df, "doc_id", "text",
        Seq(TextAnalysis.PiiRule("a", "x", "y"),
            TextAnalysis.PiiRule("a", "z", "w")))
    }
  }

  test("chunkDocuments: hand-traced windows, overlap, truncated tail") {
    val df = Seq(
      (1L, "a b c d e f g"), // 7 tokens
      (2L, "x"),             // single token
      (3L, "")               // phantom "" token -> one empty chunk
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(df, "doc_id", "text",
        chunkTokens = 3, overlapTokens = 1)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // step = 2: starts 0,2,4,6
    assert(got.filter(_._1 == 1L) == Seq(
      (1L, 0L, 3L, "a b c"), (1L, 1L, 3L, "c d e"),
      (1L, 2L, 3L, "e f g"), (1L, 3L, 1L, "g")))
    assert(got.filter(_._1 == 2L) == Seq((2L, 0L, 1L, "x")))
    // split("") yields [""] — the module's documented phantom token
    assert(got.filter(_._1 == 3L) == Seq((3L, 0L, 1L, "")))
    intercept[graft.exceptions.InvalidArgumentValue] {
      TextAnalysis.chunkDocuments(df, "doc_id", "text", 0, 0)
    }
    intercept[graft.exceptions.InvalidArgumentValue] {
      TextAnalysis.chunkDocuments(df, "doc_id", "text", 3, 3)
    }
  }

  test("clusterOutliers flags the planted far vector, skips singletons") {
    val rnd = new scala.util.Random(5L)
    // tight cluster around (1, 0, ...) + one far vector + a singleton
    val tight = (0L until 20L).map { i =>
      val v = Array.fill(8)(rnd.nextGaussian().toFloat * 0.01f)
      v(0) += 1.0f
      (i, v.toSeq)
    }
    val far = Seq((99L, (Array(0.5f, 0.86f) ++
      Array.fill(6)(0.0f)).toSeq))
    val lone = Seq((200L, (Array.fill(7)(0.0f) :+ 1.0f).toSeq))
    val df = (tight ++ far ++ lone).toDF("vec_id", "embedding")
    val out = Similarity.clusterOutliers(df, "vec_id", "embedding",
        k = 2, iters = 2, zThreshold = 1.5)
      .as[(Long, Long, Double, Double)].collect().toSeq
    // the far vector is the only z < -1.5 row; the singleton cluster
    // has null sample stddev and never surfaces
    assert(out.map(_._1) == Seq(99L))
    assert(out.head._4 < -1.5)
    intercept[graft.exceptions.InvalidArgumentValue] {
      Similarity.clusterOutliers(df, "vec_id", "embedding",
        k = 2, iters = 1, zThreshold = 0.0)
    }
  }

  test("vocabCoverage: hand-checked OOV against the top-K vocab") {
    // token counts: a×4, b×3, c×1, d×1 — top-2 vocab = {a, b}
    // (c and d tie at 1 but lose to counts 4 and 3)
    val df = Seq((1L, "a b a"), (2L, "b a c"), (3L, "a b d"),
      (4L, ""), (5L, "   ")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(df, "doc_id", "text", 2)
    val rows = got.orderBy("id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    got.unpersist()
    assert(rows == Seq((1L, 3L, 0L, 0.0), (2L, 3L, 1L, 0.333333),
      (3L, 3L, 1L, 0.333333)))
    // tie at the boundary breaks by token asc: vocab of size 3 is
    // {a, b, c} (c < d), so only doc 3 has OOV
    val g3 = TextAnalysis.vocabCoverage(df, "doc_id", "text", 3)
    val oov3 = g3.filter($"n_oov" > 0).select("id").as[Long]
      .collect().toSeq
    g3.unpersist()
    assert(oov3 == Seq(3L))
    intercept[graft.exceptions.InvalidArgumentValue] {
      TextAnalysis.vocabCoverage(df, "doc_id", "text", 0)
    }
  }

  test("bigramLogProb: hand-checked smoothed conditional MLE") {
    // corpus: "a b" ×2, "a c", "z" — bigrams: (a,b)×2, (a,c)×1.
    // c(a)=3 as w1; V = |{a,b,c,z}| = 4 (z counted via its final
    // token even though it forms no bigram); k=0.5:
    //   p(b|a) = (2+0.5)/(3+0.5*4) = 0.5, p(c|a) = 1.5/5 = 0.3
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(df, "doc_id", "text")
    val rows = got.orderBy("id")
      .select($"id", $"n_bigrams",
        round($"bits_per_bigram", 6).as("b"))
      .as[(Long, Long, Double)].collect().toSeq
    got.unpersist()
    val bitsB = -math.log(0.5) / math.log(2.0)   // 1.0
    val bitsC = -math.log(0.3) / math.log(2.0)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(rows == Seq((1L, 1L, r6(bitsB)), (2L, 1L, r6(bitsB)),
      (3L, 1L, r6(bitsC))))
    // doc 4 has no bigrams -> no row (and docs with <2 tokens never
    // corrupt V: z IS in the vocabulary)
    assert(!rows.exists(_._1 == 4L))
  }

  test("compressionRatio separates repetitive from diverse text") {
    val rep = "spam spam spam " * 50
    val div = (1 to 150).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    val df = Seq((1L, rep), (2L, div), (3L, ""), (4L, null))
      .toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatio(df, "doc_id", "text")
      .orderBy("id").collect()
    val repRatio = got(0).getDouble(3)
    val divRatio = got(1).getDouble(3)
    assert(repRatio < 0.1, s"repetitive text should crush: $repRatio")
    assert(divRatio > 3 * repRatio,
      s"diverse ($divRatio) vs repetitive ($repRatio) separation")
    assert(got(0).getLong(1) == rep.getBytes("UTF-8").length)
    // empty + null fail soft with null metrics
    Seq(2, 3).foreach { i =>
      (1 to 3).foreach(c => assert(got(i).isNullAt(c),
        s"row ${got(i).getLong(0)} col $c"))
    }
    // deterministic across calls (fixed level, reset deflater)
    val again = TextAnalysis.compressionRatio(df, "doc_id", "text")
      .orderBy("id").collect()
    assert(got.map(_.toString).toSeq == again.map(_.toString).toSeq)
    intercept[graft.exceptions.InvalidArgumentValue] {
      TextAnalysis.compressionRatio(df, "doc_id", "text", level = 0)
    }
  }

  test("lzProxyRatio: hand-checked counts, and rank-agrees with deflate") {
    // hand check: "aaaaaaaaaa" (10 chars, k=4) → 7 grams, 1 novel
    // → cost 1·4 + 6·3 = 22, ratio 22/28
    val tiny = Seq((1L, "aaaaaaaaaa")).toDF("doc_id", "text")
    val row = TextAnalysis.lzProxyRatio(tiny, "doc_id", "text", k = 4)
      .head()
    assert((row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) == ((10L, 7L, 1L, 22L)))
    assert(math.abs(row.getDouble(5) - 22.0 / 28) < 1e-6)
    // short docs (< k chars) are omitted, matching the oracle twin
    assert(TextAnalysis.lzProxyRatio(
      Seq((1L, "ab")).toDF("doc_id", "text"), "doc_id", "text").count() == 0)
    // the deflate-twin contract (q107 ↔ q137): the proxy must order
    // repetitive vs diverse text the same way the real deflate ratio
    // does, on real corpus docs plus engineered extremes
    // graded repetition ladder: doc r mixes r% repeats of one token
    // with (100−r)% distinct tokens — deflate and the proxy must both
    // order the ladder monotonically (STRICT agreement on every pair;
    // mid-range corpus docs from the 31-word synthetic vocabulary are
    // too uniformly repetitive to separate and are not the contract)
    val ladder = (0 to 10).map { r =>
      val words = (1 to 300).map(i =>
        if (i % 10 < r) "spam" else s"w${i * 7919 % 99991}")
      (r.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val proxy = TextAnalysis.lzProxyRatio(ladder, "doc_id", "text")
      .select($"id", $"lz_ratio").as[(Long, Double)].collect().toMap
    val deflate = TextAnalysis.compressionRatio(ladder, "doc_id", "text")
      .select($"id", $"compression_ratio").as[(Long, Double)]
      .collect().toMap
    for (i <- 0L to 10L; j <- 0L to 10L if i < j) {
      assert(proxy(i) > proxy(j) == deflate(i) > deflate(j),
        s"rank disagreement at ($i, $j): proxy ${proxy(i)} vs " +
          s"${proxy(j)}, deflate ${deflate(i)} vs ${deflate(j)}")
    }
  }

  test("lzProxyRatio map kernel == relational formulation, astral chars") {
    // the kernel walks CODE POINTS so astral (surrogate-pair) chars
    // must gram exactly like Spark's substring in the relational path
    val docs = Tables.read(spark, sf, "documents").limit(200)
      .select($"doc_id", $"text")
    val astral = Seq(
      (9001L, "a😀b😀" * 6),
      (9002L, "abécdé " * 10),
      (9003L, null.asInstanceOf[String]),
      (9004L, "short")).toDF("doc_id", "text")
    val corpus = docs.unionByName(astral)
    def rows(kernel: Boolean): Seq[String] = {
      spark.conf.set("graft.text.lzMapKernel", kernel.toString)
      try TextAnalysis.lzProxyRatio(corpus, "doc_id", "text")
        .orderBy("id").collect().map(_.toString).toSeq
      finally spark.conf.unset("graft.text.lzMapKernel")
    }
    val kernel = rows(true)
    assert(kernel.nonEmpty && kernel == rows(false))
  }

  test("ngramContainmentJoin equals all-pairs exact containment") {
    val docs = Tables.read(spark, sf, "documents")
      .filter($"doc_id" < 40)
    val frags = docs.filter($"doc_id" < 10)
      .select(($"doc_id" + 1000).as("doc_id"),
        concat_ws(" ",
          slice(split(trim(lower($"text")), "\\s+"), 1, 12)).as("text"))
    val corpus = docs.select($"doc_id", $"text").unionByName(frags)
    val got = Dedup.ngramContainmentJoin(corpus, "doc_id", "text",
      n = 3, threshold = 0.7)
    val gotSet = got.select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    got.unpersist()
    // driver replica: distinct word-3-gram sets, all ordered pairs
    val gramSets = corpus.select($"doc_id", trim(lower($"text")))
      .as[(Long, String)].collect().toMap
      .view.mapValues { t =>
        val w = t.split("\\s+").toSeq
        (if (w.length <= 3) Seq(w.mkString(" "))
         else w.sliding(3).map(_.mkString(" ")).toSeq).toSet
      }.toMap
    val want = (for {
      (a, ga) <- gramSets.toSeq; (b, gb) <- gramSets.toSeq
      if a != b && ga.intersect(gb).size.toDouble / ga.size >= 0.7
    } yield (a, b)).toSet
    assert(gotSet == want)
    // every planted fragment is contained in its source at 1.0
    (1000L until 1010L).foreach { f =>
      assert(gotSet.contains((f, f - 1000)), s"fragment $f missing")
    }
  }

  test("filterBoilerplateLines applies the three C4 rules per line") {
    val text = Seq(
      "A good long sentence.",      // kept
      "short.",                     // < 3 words
      "no terminal punctuation",    // no [.!?]$
      "Accept Cookie Policy now.",  // blacklist (case-insensitive)
      "He said \"stop!\"",          // punct inside closing quote: kept
      "Fine line with question?"    // kept
    ).mkString("\n")
    val df = Seq((1L, text), (2L, "none of this survives"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.filterBoilerplateLines(df, "doc_id", "text",
        TextAnalysis.LineRules(minWords = 3))
      .orderBy("id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 6L, 3L, Seq("A good long sentence.", "He said \"stop!\"",
        "Fine line with question?").mkString("\n")),
      (2L, 1L, 0L, "")))
    intercept[graft.exceptions.InvalidArgumentValue] {
      TextAnalysis.filterBoilerplateLines(df, "doc_id", "text",
        TextAnalysis.LineRules(blacklist = Seq("")))
    }
  }

  test("randomProjection is deterministic and distance-preserving") {
    val emb = Tables.read(spark, sf, "embeddings")
    val p1 = Similarity.randomProjection(emb, "vec_id", "embedding", 16)
    val p2 = Similarity.randomProjection(emb, "vec_id", "embedding", 16)
    // byte-identical across calls: the matrix is hash-derived state,
    // not RNG state
    assert(p1.exceptAll(p2).count() == 0 && p1.count() == emb.count() * 16)
    // JL/Achlioptas: projected squared distances concentrate around
    // the originals — check the mean ratio over a sample of pairs
    // lands near 1 (loose 3-sigma-ish band; 16 dims is coarse)
    val a = emb.limit(20).select($"vec_id",
      transform($"embedding", x => x.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect()
    val proj = p1.groupBy("id").agg(
        sort_array(collect_list(struct($"j", $"proj"))).as("s"))
      .select($"id", transform($"s", e => e("proj")).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    def d2(x: Seq[Double], y: Seq[Double]): Double =
      x.zip(y).map { case (u, w) => (u - w) * (u - w) }.sum
    val ratios = for {
      i <- a.indices; k <- (i + 1) until a.length
      orig = d2(a(i)._2, a(k)._2) if orig > 0
    } yield d2(proj(a(i)._1), proj(a(k)._1)) / orig
    // the 1/√outDim in the projection makes E[ratio] = 1 exactly
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3,
      s"mean distance ratio $mean out of band")
    intercept[graft.exceptions.InvalidArgumentValue] {
      Similarity.randomProjection(emb, "vec_id", "embedding", 0)
    }
  }

  test("randomProjection fails fast on ragged vectors") {
    // longer-than-first rows would otherwise AIOOBE inside the
    // compiled kernel; shorter rows would silently truncate
    val ragged = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (3L, Seq(1.0f))
    ).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.randomProjection(ragged, "vec_id", "embedding", 4)
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains("expected 3")),
      s"wanted a dim-mismatch failure, got $e")
  }

  test("gram-saturation guard fires on a closed vocabulary and not on open text") {
    // 3-word vocabulary: ≤ 27 distinct trigrams no matter how many
    // docs — the measured SCALING.md quadratic case in miniature
    val vocab = Array("aa", "bb", "cc")
    val closed = (0 until 40).map { i =>
      (i.toLong, (0 until 30).map(j => vocab((i + j) % 3)).mkString(" "))
    }.toDF("doc_id", "text")
    val e = intercept[graft.exceptions.InvalidArgumentValue] {
      Dedup.ngramJaccardNearDups(closed, "doc_id", "text", n = 3,
        threshold = 0.9, saturationMode = "raise")
    }
    assert(e.getMessage.contains("SATURATED") &&
      e.getMessage.contains("minhashNearDups"))
    intercept[graft.exceptions.InvalidArgumentValue] {
      Dedup.ngramContainmentJoin(closed, "doc_id", "text", n = 3,
        threshold = 0.9, saturationMode = "raise")
    }
    // same corpus with the guard off still computes (slow-but-correct
    // contract), and open-vocabulary text never trips "raise"
    val r = Dedup.ngramJaccardNearDups(closed, "doc_id", "text", n = 3,
      threshold = 0.999, saturationMode = "off")
    r.unpersist()
    val open = (0 until 40).map(i =>
      (i.toLong, (0 until 30).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val r2 = Dedup.ngramJaccardNearDups(open, "doc_id", "text", n = 3,
      threshold = 0.9, saturationMode = "raise")
    r2.unpersist()
    intercept[graft.exceptions.InvalidArgumentValue] {
      Dedup.ngramJaccardNearDups(open, "doc_id", "text", n = 3,
        threshold = 0.9, saturationMode = "bogus")
    }
  }

  test("lexicalStats: hand-checked TTR and deterministic top token") {
    // src1: tokens a a b c -> 4 tokens, 3 types, top = a (2, share .5)
    // src2: b and c tie at 2 -> top breaks to the LARGER token string
    //       (max over (count, token) structs): c
    val df = Seq(
      (1L, "a a", "src1"), (2L, "b c", "src1"),
      (3L, "b c", "src2"), (4L, "c b", "src2"),
      (5L, "", "src3"), (6L, "  ", "src3")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.lexicalStats(df, "source", "text")
      .orderBy("grp")
      .as[(String, Long, Long, Double, String, Double)]
      .collect().toSeq
    // src3 has zero tokens -> no row at all (nothing to divide by)
    assert(got == Seq(
      ("src1", 4L, 3L, 0.75, "a", 0.5),
      ("src2", 4L, 2L, 0.5, "c", 0.5)))
  }

  test("langMixStats aggregates per-line language verdicts") {
    val df = Seq(
      // 3 non-blank lines: en, de, und — plus a blank line skipped
      (1L, "the a of words\n\nder und ist hier\nzzz qqq"),
      // monolingual: two en lines => entropy exactly 0
      (2L, "the a of\nthe is in"),
      // only blank lines => no language evidence, absent from output
      (3L, " \n\n  ")).toDF("id", "txt")
    val got = TextAnalysis.langMixStats(df, "id", "txt")
      .orderBy("id").collect()
    assert(got.length === 2)
    val r1 = got(0)
    assert(r1.getLong(1) === 3L && r1.getLong(2) === 3L)
    // all counts 1: struct-max tie-break picks the lexicographically
    // largest lang
    assert(r1.getString(3) === "und")
    assert(math.abs(r1.getDouble(4) - 1.0 / 3) < 1e-12)
    assert(math.abs(r1.getDouble(5) - math.log(3)) < 1e-12)
    val r2 = got(1)
    assert(r2.getLong(1) === 2L && r2.getLong(2) === 1L)
    assert(r2.getString(3) === "en")
    assert(r2.getDouble(4) === 1.0)
    assert(math.abs(r2.getDouble(5)) < 1e-12)
  }

  test("gramNoveltyScore counts grams unseen in the reference") {
    val scored = Seq((1L, "a b c d e f"), (2L, "x y z w v"))
      .toDF("id", "txt")
    val ref = Seq((10L, "a b c d e")).toDF("id", "txt")
    val got = Dedup.gramNoveltyScore(scored, ref, "id", "txt",
        "id", "txt", n = 5)
      .orderBy("id").collect()
    // doc 1: 5-grams {a b c d e, b c d e f} — first is in ref
    assert(got(0).getLong(1) === 2L && got(0).getLong(2) === 1L)
    assert(got(0).getDouble(3) === 0.5)
    // doc 2: one gram, fully novel
    assert(got(1).getLong(1) === 1L && got(1).getLong(2) === 1L)
    assert(got(1).getDouble(3) === 1.0)
    // scoring against itself => zero novelty everywhere
    val self = Dedup.gramNoveltyScore(scored, scored, "id", "txt",
      "id", "txt", n = 5)
    assert(self.filter(col("n_novel") =!= 0L).count() === 0)
    intercept[graft.exceptions.InvalidArgumentValue] {
      Dedup.gramNoveltyScore(scored, ref, "id", "txt", "id", "txt",
        n = 0)
    }
  }

  test("gramNoveltyAgainst equals gramNoveltyScore on a prepared gram set") {
    val ref = docs.filter($"doc_id" < 300)
    val scored = docs.filter($"doc_id" >= 300 && $"doc_id" < 400)
      .unionByName(ref.limit(20)) // overlap rows => novelty 0 present
    val direct = Dedup.gramNoveltyScore(scored, ref, "doc_id", "text",
        "doc_id", "text", n = 5)
      .orderBy("id").collect().toSeq
    val gs = Dedup.buildGramSet(ref, "doc_id", "text", n = 5)
    val prepared = Dedup.gramNoveltyAgainst(scored, gs, "doc_id",
        "text", n = 5)
      .orderBy("id").collect().toSeq
    assert(direct == prepared)
    intercept[graft.exceptions.InvalidArgumentValue] {
      Dedup.gramNoveltyAgainst(scored, gs, "doc_id", "text", n = 0)
    }
  }

  test("bpeFertility: hand-traced totals and ratios; sums match bpeTokenCount") {
    // merges (a,b)->"ab": "abab" -> [ab, ab] (2 toks), "ba" -> [b, a]
    val rows = Seq(("s1", "abab ba"), ("s1", "abab"), ("s2", "ba"))
      .toDF("src", "txt")
    val fert = graft.llm.Bpe.bpeFertility(rows, "src", "txt",
        Seq(("a", "b")))
      .orderBy("grp").collect()
    // s1: words 3 (abab, ba, abab), chars 4+2+4=10, bpe 2+2+2=6
    assert(fert(0).getString(0) == "s1")
    assert(fert(0).getLong(1) == 3L && fert(0).getLong(2) == 10L &&
      fert(0).getLong(3) == 6L)
    assert(fert(0).getDouble(4) == 2.0) // tokens/word
    assert(math.abs(fert(0).getDouble(5) - 10.0 / 6) < 1e-6)
    // s2: 1 word, 2 chars, 2 bpe tokens (no adjacency merged in "ba")
    assert(fert(1).getString(0) == "s2")
    assert(fert(1).getLong(3) == 2L)
    // group sums equal the per-doc counts on the real corpus
    val m = Seq(("e", "r"), ("t", "h"), ("th", "e"))
    val perDoc = graft.llm.Bpe.bpeTokenCount(docs, "doc_id", "text", m)
      .agg(sum("n_bpe_tokens")).head().getLong(0)
    val perSrc = graft.llm.Bpe.bpeFertility(docs, "source", "text", m)
      .agg(sum("n_bpe_tokens")).head().getLong(0)
    assert(perDoc == perSrc)
  }

  test("extractHtmlText strips blocks/tags, decodes entities once, scores links") {
    val page = "<html><!-- c --><head><script>if (1 < 2) x();</script>" +
      "<style>p{}</style></head><body><h1>Hi</h1><p>a &amp;lt; b " +
      "&nbsp;&#39;q&#39;</p><a href=\"/x\"><b>go</b> now</a></body></html>"
    val out = TextAnalysis.extractHtmlText(
      Seq((1L, page), (2L, "<a href=\"/y\">only link</a>"),
        (3L, "<p></p>")).toDF("id", "html"), "id", "html")
      .orderBy("id").collect()
    // blocks die whole (the 1 < 2 never leaks), tags become spaces,
    // &amp;lt; decodes exactly one level to &lt;
    assert(out(0).getString(1) == "Hi a &lt; b 'q' go now")
    // anchor text "go now" = 6 chars of the full text
    val full = out(0).getString(1).length
    assert(math.abs(out(0).getDouble(3) - math.rint(6.0 / full * 1e6) / 1e6)
      < 1e-9)
    // all-anchor page: density exactly 1.0; empty page: 0.0 not NaN
    assert(out(1).getString(1) == "only link" && out(1).getDouble(3) == 1.0)
    assert(out(2).getString(1) == "" && out(2).getDouble(3) == 0.0)
  }

  test("corpusDataCard: hand-checked sections on a tiny corpus") {
    val tiny = Seq(
      (1L, "the cat sat", "en", "web"),
      (2L, "the cat sat", "en", "web"),
      (3L, "le chat", "fr", "books"))
      .toDF("doc_id", "text", "lang", "source")
    val card = graft.llm.DataCard.corpusDataCard(tiny, "doc_id",
        "text", "lang", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(2)).toMap
    assert(card(("corpus", "n_docs")) == 3.0)
    assert(card(("corpus", "n_tokens")) == 8.0)
    assert(card(("dedup", "exact_dup_rate")) ==
      math.rint(1.0 / 3 * 1e6) / 1e6)
    assert(card(("lang", "share:fr")) == math.rint(1.0 / 3 * 1e6) / 1e6)
    assert(card(("source", "share:web")) ==
      math.rint(2.0 / 3 * 1e6) / 1e6)
    assert(card(("source", "token_share:books")) == 0.25)
    assert(card(("length", "p50")) == 11.0)
    // nothing passes the default 50-token minimum
    assert(card(("quality", "pass_rate")) == 0.0)
    // schema is stable: every row belongs to a known section
    assert(card.keys.map(_._1).toSet ==
      Set("corpus", "dedup", "lang", "source", "length", "quality"))
  }

  test("removeContaminatedSpans deletes exactly the eval-covered spans") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "totally clean document with no overlap at all here now"),
      (3L, "short doc")).toDF("doc_id", "text")
    val evalSet = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val out = Dedup.removeContaminatedSpans(corpus, "doc_id", "text",
        evalSet, "doc_id", "text", n = 8)
      .orderBy("id").collect()
    // doc 1: only the i=1 8-gram matches → positions 1..8 covered
    assert(out(0).getLong(1) == 10L && out(0).getLong(2) == 8L)
    assert(out(0).getString(3) == "iota kappa")
    // doc 2: no overlap → untouched (post-normalization)
    assert(out(1).getLong(2) == 0L && out(1).getString(3) ==
      "totally clean document with no overlap at all here now")
    // doc 3: shorter than n → documented pass-through
    assert(out(2).getLong(2) == 0L && out(2).getString(3) == "short doc")
    intercept[graft.exceptions.InvalidArgumentValue] {
      Dedup.removeContaminatedSpans(corpus, "doc_id", "text",
        evalSet, "doc_id", "text", n = 0)
    }
  }

  test("dataCardDiff: changed metrics get deltas, appeared/vanished get NULLs") {
    val a = Seq(("corpus", "n_docs", 2.0), ("lang", "share:en", 0.5),
      ("quality", "pass_rate", 0.25)).toDF("section", "metric", "value")
    val b = Seq(("corpus", "n_docs", 3.0), ("lang", "share:fr", 1.0),
      ("quality", "pass_rate", 0.25)).toDF("section", "metric", "value")
    val d = graft.llm.DataCard.dataCardDiff(a, b).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // unchanged rows are absent from the diff
    assert(!d.contains(("quality", "pass_rate")))
    assert(d(("corpus", "n_docs")).getDouble(4) == 1.0)
    // vanished: NULL new side and NULL delta (distinct from zero)
    assert(d(("lang", "share:en")).isNullAt(3) &&
      d(("lang", "share:en")).isNullAt(4))
    // appeared: NULL old side and NULL delta
    assert(d(("lang", "share:fr")).isNullAt(2) &&
      d(("lang", "share:fr")).isNullAt(4))
  }
}

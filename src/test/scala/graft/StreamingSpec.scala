package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Stream-vs-batch equivalence over the events table: the same
  * windowed aggregation through a file-source stream must match the
  * batch plan exactly.
  */
class StreamingSpec extends SparkSpec {

  private lazy val events: DataFrame = Tables.read(spark, sf, "events")

  /** Copy the events parquet into a directory usable as a stream
    * source (file streams need a directory, not a single file).
    */
  private lazy val streamDir: String = {
    val dir = tmpDir("stream-events")
    // rewrite through Spark so the stream source sees µs timestamps,
    // not the raw ns column the nanosAsLong conf handles in Tables.read
    events.write.mode("overwrite").parquet(dir + "/data")
    dir + "/data"
  }

  test("streamed windowed counts equal the batch aggregation") {
    val streamed = Streaming.windowedCounts(
      Streaming.readParquetStream(spark, streamDir, events),
      "ts", "5 minutes")
    val got = Streaming.runToMemory(spark, streamed, "win_counts")
      .orderBy("window_start", "event_type")
    val want = Streaming.windowedCounts(events, "ts", "5 minutes")
      .orderBy("window_start", "event_type")
    assert(got.collect().toSeq == want.collect().toSeq)
    assert(got.count() > 0)
  }

  test("streamed windowed approx-distinct equals the batch sketch") {
    val streamed = Streaming.windowedApproxDistinct(
      Streaming.readParquetStream(spark, streamDir, events),
      "ts", "user_id", "15 minutes")
    val got = Streaming.runToMemory(spark, streamed, "win_distinct")
      .orderBy("window_start")
    val want = Streaming.windowedApproxDistinct(events, "ts",
        "user_id", "15 minutes")
      .orderBy("window_start")
    // HLL registers are deterministic and mergeable, so incremental
    // micro-batch aggregation lands on the SAME estimate as batch
    assert(got.collect().toSeq == want.collect().toSeq)
    assert(got.count() > 0)
  }

  test("streamed windowed heavy hitters converge to the batch pass") {
    // capacity (4096) ≥ distinct event types, so space-saving is
    // provably exact and the micro-batch continuation must land on
    // the batch one-pass counts regardless of file arrival order.
    // The 40-day watermark exceeds the data span: no row is ever
    // late, no window times out, state continues across all triggers.
    val streamed = Streaming.windowedHeavyHitters(
      Streaming.readParquetStream(spark, streamDir, events,
        maxFilesPerTrigger = 1),
      "ts", "event_type", "1 hour", k = 5, watermark = "40 days")
    val got = Streaming.runToMemory(spark, streamed.toDF(),
      "win_hh", outputMode = "update")
    // est per (window, token) is monotone across triggers in the
    // exact regime — max est IS the final emission
    val finals = got.groupBy("window_start", "token")
      .agg(max(col("est")).as("est"), max(col("err")).as("err"))
    val want = Streaming.windowedHeavyHitters(events, "ts",
        "event_type", "1 hour", k = 5)
      .toDF().select("window_start", "token", "est", "err")
    assert(finals.count() === want.count())
    assert(finals.join(want,
      Seq("window_start", "token", "est", "err")).count() === want.count())
    // exact regime: every emitted error bound is zero
    assert(got.filter(col("err") =!= 0).count() === 0)
  }

  test("windowed heavy hitters emit closed rows when windows expire") {
    val streamed = Streaming.windowedHeavyHitters(
      Streaming.readParquetStream(spark, streamDir, events,
        maxFilesPerTrigger = 1),
      "ts", "event_type", "1 hour", k = 3, watermark = "1 minute")
    val got = Streaming.runToMemory(spark, streamed.toDF(),
      "win_hh_closed", outputMode = "update")
    // with a tight watermark and multiple triggers over out-of-order
    // files, event-time timeouts must fire final emissions
    assert(got.filter(col("closed")).count() > 0)
    assert(got.filter(col("rk") < 1 || col("rk") > 3).count() === 0)
  }

  test("sessionization works identically on batch frames") {
    val sessions = Streaming.sessionized(events, "ts", "30 minutes")
    assert(sessions.count() > 0)
    // every session must contain at least one event and end after start
    assert(sessions.filter(col("session_end") <= col("session_start"))
      .count() == 0)
    assert(sessions.filter(col("n_events") < 1).count() == 0)
  }

  test("stateful running totals accumulate across micro-batches") {
    import org.apache.spark.sql.functions.{col, round, sum, count, lit, max, struct}
    val streamed = Streaming.statefulRunningTotals(
      Streaming.readParquetStream(spark, streamDir, events,
        maxFilesPerTrigger = 1),
      "user_id", "value")
    Streaming.runToMemory(spark, streamed.toDF(), "stateful_totals",
      outputMode = "update")
    // the LAST update per key (highest n) must equal the batch
    // aggregate in BOTH the count and the running value sum
    val finals = spark.table("stateful_totals")
      .groupBy("key")
      .agg(max(struct(col("n"), col("total"))).as("s"))
      .select(col("key"), col("s.n").as("n"),
        round(col("s.total"), 2).as("total"))
    val expect = events.groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
    assert(finals.join(expect, Seq("key", "n", "total")).count() ==
      expect.count())
  }

  test("streaming ingest dedup lands exactly the batch-mode survivors") {
    import graft.llm.Dedup
    import spark.implicits._
    val docs = Tables.read(spark, sf, "documents")
    val corpus = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
      .select("doc_id", "text")
    val idx = tmpDir("stream-dedup-idx")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx)

    val srcDir = tmpDir("stream-dedup-src")
    batch.write.mode("overwrite").parquet(srcDir + "/in")
    val outDir = tmpDir("stream-dedup-out") + "/clean"
    val q = Streaming.dedupIngestStream(
      Streaming.readParquetStream(spark, srcDir + "/in", batch,
        maxFilesPerTrigger = 2),
      "doc_id", "text", idx, corpus, outDir,
      tmpDir("stream-dedup-ckpt"), minBandMatches = 3)
    try q.processAllAvailable() finally q.stop()

    val landed = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    val dupIds = Dedup.probeMinhashIndex(idx, corpus, batch,
        "doc_id", "text", minBandMatches = 3)
      .select("id_b").as[Long].collect().toSet
    val expected = batch.select("doc_id").as[Long].collect().toSet -- dupIds
    assert(dupIds.nonEmpty)
    assert(landed == expected)
  }

  test("ingest quality gate rejects low-quality docs before probe and landing") {
    import graft.llm.{Dedup, TextAnalysis}
    import spark.implicits._
    val docs = Tables.read(spark, sf, "documents")
    val corpus = docs.filter(col("doc_id") < 400)
    val base = docs.filter(col("doc_id") >= 400).select("doc_id", "text")
    // plant a doc that fails the token-count rule but duplicates nothing
    val batch = base.unionByName(
      Seq((9001L, "too short")).toDF("doc_id", "text"))
    val idx = tmpDir("stream-gate-idx")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx)

    // every rule permissive except minTokens — the gate under test
    val rules = TextAnalysis.QualityRules(minTokens = 5,
      maxTokens = 100000, minAvgTokenLen = 0.0, maxAvgTokenLen = 1e9,
      maxSymbolFrac = 1.0, minAlphaTokenFrac = 0.0, minStopwordHits = 0)
    val gate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.join(
        TextAnalysis.qualityFilter(df, "doc_id", "text", rules)
          .filter(col("keep") === 1).select("doc_id"),
        Seq("doc_id"))

    val srcDir = tmpDir("stream-gate-src")
    batch.write.mode("overwrite").parquet(srcDir + "/in")
    val outDir = tmpDir("stream-gate-out") + "/clean"
    val q = Streaming.dedupIngestStream(
      Streaming.readParquetStream(spark, srcDir + "/in", batch,
        maxFilesPerTrigger = 2),
      "doc_id", "text", idx, corpus, outDir,
      tmpDir("stream-gate-ckpt"), minBandMatches = 3,
      qualityGate = Some(gate))
    try q.processAllAvailable() finally q.stop()
    val landed = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet

    // batch-mode oracle: gate first, then corpus-dup removal
    val gated = gate(batch)
    val dups = Dedup.probeMinhashIndex(idx, corpus, gated,
      "doc_id", "text", minBandMatches = 3)
    val dupIds = dups.select("id_b").as[Long].collect().toSet
    dups.unpersist()
    val expected =
      gated.select("doc_id").as[Long].collect().toSet -- dupIds
    assert(!landed.contains(9001L), "gate-rejected doc landed")
    assert(dupIds.nonEmpty)
    assert(landed == expected)
  }

  test("novelty gate drops re-crawled mosaics the near-dup probe misses") {
    import graft.llm.Dedup
    import spark.implicits._
    val docs = Tables.read(spark, sf, "documents")
    val corpus = docs.filter(col("doc_id") < 400)
    val base = docs.filter(col("doc_id") >= 400)
      .limit(20).select("doc_id", "text")
    // a mosaic of two corpus docs' halves: almost every word 5-gram
    // exists in the corpus (novelty ≈ 0) but it is a near-dup of
    // NEITHER source, so the minhash probe alone would land it
    val parts = corpus.filter(col("doc_id") < 2)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val mosaic = parts(0L).take(150) + " " + parts(1L).take(150)
    val batch = base.unionByName(Seq((9002L, mosaic)).toDF("doc_id", "text"))
    val idx = tmpDir("stream-novel-idx")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx)

    // the probe does NOT flag the mosaic — that is the gap the gate
    // closes (assert it so the test stays honest if thresholds move)
    val probed = Dedup.probeMinhashIndex(idx, corpus, batch,
      "doc_id", "text", minBandMatches = 3)
    val probedIds = probed.select("id_b").as[Long].collect().toSet
    probed.unpersist()
    assert(!probedIds.contains(9002L),
      "the mosaic must evade the near-dup probe for this test to bite")

    // gate: keep docs with >= 30% novel word-5-grams vs the corpus —
    // the shipped PREPARED form (gram set built once, the scale-
    // correct composition; Streaming.noveltyGate)
    val gramSet = Dedup.buildGramSet(corpus, "doc_id", "text", n = 5)
      .persist()
    val gate = Streaming.noveltyGate(gramSet, "doc_id", "text",
      n = 5, minNovelty = 0.3)
    // prepared gate decisions == the naive per-batch composition
    val naiveKept = {
      val nov = Dedup.gramNoveltyScore(batch, corpus, "doc_id", "text",
        "doc_id", "text", n = 5)
      nov.filter(col("novelty") >= 0.3).select("id").as[Long]
        .collect().toSet
    }
    val preparedKept = gate(batch).select("doc_id").as[Long]
      .collect().toSet
    assert(preparedKept == naiveKept,
      "prepared and naive novelty gates must agree doc-for-doc")

    val srcDir = tmpDir("stream-novel-src")
    batch.write.mode("overwrite").parquet(srcDir + "/in")
    val outDir = tmpDir("stream-novel-out") + "/clean"
    val q = Streaming.dedupIngestStream(
      Streaming.readParquetStream(spark, srcDir + "/in", batch,
        maxFilesPerTrigger = 3),
      "doc_id", "text", idx, corpus, outDir,
      tmpDir("stream-novel-ckpt"), minBandMatches = 3,
      qualityGate = Some(gate))
    try q.processAllAvailable() finally {
      q.stop(); gramSet.unpersist(blocking = true); ()
    }
    val landed = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(!landed.contains(9002L),
      "the low-novelty mosaic must be gated out")
    // the fresh docs are novel against the corpus and must land
    assert(landed.nonEmpty && landed.subsetOf(
      base.select("doc_id").as[Long].collect().toSet))
  }

  test("within-batch ingest dedup lands one survivor per internal near-dup pair") {
    import graft.llm.Dedup
    import spark.implicits._
    val docs = Tables.read(spark, sf, "documents")
    val corpus = docs.filter(col("doc_id") < 400)
    val base = docs.filter(col("doc_id") >= 400).select("doc_id", "text")
    val idx = tmpDir("stream-wb-idx")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx)

    // plant an internal near-dup: clone a batch doc that is NOT
    // itself a corpus dup (else the probe would drop both halves of
    // the planted pair and the test would assert nothing)
    val preDup = Dedup.probeMinhashIndex(idx, corpus, base,
      "doc_id", "text", minBandMatches = 3)
    val dupIds = preDup.select("id_b").as[Long].collect().toSet
    preDup.unpersist()
    val cloneSrc = (base.select("doc_id").as[Long].collect().toSet --
      dupIds).min
    val batch = base.unionByName(
      base.filter(col("doc_id") === cloneSrc)
        .select((col("doc_id") + 9000).as("doc_id"), col("text")))

    val srcDir = tmpDir("stream-wb-src")
    // one file + high maxFilesPerTrigger = the planted pair shares a
    // micro-batch (within-batch dedup is per-micro-batch by design)
    batch.coalesce(1).write.mode("overwrite").parquet(srcDir + "/in")
    val outDir = tmpDir("stream-wb-out") + "/clean"
    val q = Streaming.dedupIngestStream(
      Streaming.readParquetStream(spark, srcDir + "/in", batch,
        maxFilesPerTrigger = 100),
      "doc_id", "text", idx, corpus, outDir,
      tmpDir("stream-wb-ckpt"), minBandMatches = 3,
      dedupWithinBatch = true)
    try q.processAllAvailable() finally q.stop()
    val landed = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet

    // batch-mode oracle: corpus-dup removal, then one-per-cluster.
    // dups stays cached until everything derived from survivors is
    // collected — probe results cannot be recomputed once released
    // (their funnel internals are lineage-cut checkpoints)
    val dups = Dedup.probeMinhashIndex(idx, corpus, batch,
      "doc_id", "text", minBandMatches = 3)
    val survivors = batch.join(
      dups.select(col("id_b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    val pairs = Dedup.minhashNearDups(survivors, "doc_id", "text",
      minBandMatches = 3)
    val expected = Dedup.dedupNearDups(survivors, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    dups.unpersist()
    pairs.unpersist()
    assert(landed == expected)
    // the planted pair resolved to its min-id winner
    assert(landed.contains(cloneSrc) && !landed.contains(cloneSrc + 9000))
  }

  test("updateIndex folds landed survivors so later batches dedup against them") {
    import graft.llm.Dedup
    import spark.implicits._
    val docs = Tables.read(spark, sf, "documents")
    val corpus = docs.filter(col("doc_id") < 400).select("doc_id", "text")
    val idx = tmpDir("upd-idx")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx)

    // novel vocabulary guarantees no accidental corpus similarity
    val novelA = Seq.fill(20)("zebra quartz vortex jigsaw").mkString(" ")
    val novelB = Seq.fill(20)("glimmer fjord yacht pylon").mkString(" ")
    val src = tmpDir("upd-src") + "/in"
    val outDir = tmpDir("upd-out") + "/clean"
    Seq((9100L, novelA)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(src)
    val q = Streaming.dedupIngestStream(
      Streaming.readParquetStream(spark, src,
        Seq((0L, "")).toDF("doc_id", "text")),
      "doc_id", "text", idx, corpus, outDir,
      tmpDir("upd-ckpt"), minBandMatches = 3, updateIndex = true)
    try {
      q.processAllAvailable()
      // batch 2: a clone of the batch-1 survivor plus a fresh doc —
      // the clone must be caught by the index UPDATE, not the base
      Seq((9200L, novelA), (9300L, novelB)).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(landed.contains(9100L) && landed.contains(9300L))
    assert(!landed.contains(9200L))
    // the index now carries base + both batch tags
    val tags = spark.read.parquet(idx).select("batch").distinct()
      .as[String].collect().toSet
    assert(tags.contains("base") && tags.exists(_.startsWith("b")))
  }

  test("dedup within watermark drops injected duplicates") {
    val dup = events.limit(100)
    val withDups = events.unionByName(dup)
    val deduped = Streaming.dedupedWithinWatermark(withDups, "ts",
      Seq("event_id"))
    assert(deduped.count() == events.count())
  }
}

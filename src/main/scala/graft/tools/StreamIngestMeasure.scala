package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{functions => F}

import graft.GraftSession
import graft.llm.Dedup
import graft.streaming.Streaming

/** Streaming ingest-dedup decade measurement (SCALING.md's evidence
  * for `dedupIngestStream`): build the persisted minhash index from a
  * GenDocs corpus, then stream the SAME fixed 500-doc batch against
  * it — the recurring per-batch cost. Run with the sf0.1 and sf1
  * corpora: the probe's shuffle must be bounded by the batch's band
  * signatures joined against matching index partitions, not by corpus
  * mass, so the decade should move the index BUILD (linear) but leave
  * the per-batch probe near-flat.
  *
  * Streaming microbatches run on the stream-execution thread, so the
  * job-group trick can't attribute stages; nothing else runs during
  * the measured window, so the listener sums ALL task metrics between
  * the start/stop marks.
  *
  * With the 3rd arg `novelty`/`noveltynaive`, the gram-novelty gate
  * (StreamingSpec's mosaic-catcher composition: keep docs with ≥ 30%
  * novel word-5-grams vs the corpus) runs BEFORE the probe. The
  * decade question is where the reference-gram term lands:
  * `noveltynaive` calls gramNoveltyScore per batch, so every batch
  * re-derives the reference's distinct gram set (measured
  * 8.4×/decade probe shuffle — the whole corpus gram mass recurs);
  * `novelty` builds the gram set ONCE (`Dedup.buildGramSet`, timed
  * as gramset_build) and probes batches against it
  * (`gramNoveltyAgainst`), so the recurring per-batch cost is
  * batch-bounded and the linear term is one-time.
  *
  * Usage: runMain graft.tools.StreamIngestMeasure <docsParquet> <label> [novelty|noveltynaive]
  *   novelty      — prepared gram set built once, probed per batch
  *   noveltynaive — gramNoveltyScore recomputes the reference's
  *                  distinct grams every batch (the decade comparison)
  */
object StreamIngestMeasure {

  private class Totals extends SparkListener {
    val on = new java.util.concurrent.atomic.AtomicBoolean(false)
    val shuffle = new AtomicLong(0)
    val taskMs = new AtomicLong(0)
    val tasks = new AtomicLong(0)
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      if (on.get()) Option(e.taskMetrics).foreach { m =>
        shuffle.addAndGet(m.shuffleReadMetrics.totalBytesRead +
          m.shuffleWriteMetrics.bytesWritten)
        taskMs.addAndGet(m.executorRunTime)
        tasks.incrementAndGet()
      }
    def reset(): Unit = { shuffle.set(0); taskMs.set(0); tasks.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val docsPath = args(0)
    val label = args.lift(1).getOrElse("gen")
    val mode = args.lift(2).getOrElse("")
    val noveltyGate = mode.startsWith("novelty")
    val noveltyNaive = mode == "noveltynaive"
    val spark = GraftSession.builder("graft-ingest-measure", "local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.applyEngineConf(spark)
    val listener = new Totals
    spark.sparkContext.addSparkListener(listener)
    val baseFile = new java.io.File(s"target/im-$label")
    // clean slate: a leftover checkpoint would mark the batch already
    // processed (skewing landed counts) and a leftover index would be
    // appended to
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmRf)
      f.delete(): Unit
    }
    if (baseFile.exists()) rmRf(baseFile)
    val base = baseFile.getAbsolutePath

    val corpus = spark.read.parquet(docsPath).select("doc_id", "text")
    val nCorpus = corpus.count()

    // the fixed probe batch: 500 docs, half copied from the corpus
    // (guaranteed dups), half with a disambiguating suffix — SAME
    // batch shape at every corpus scale
    val batch = corpus.orderBy("doc_id").limit(500)
      .select((F.col("doc_id") + 10000000L).as("doc_id"),
        F.when(F.col("doc_id") % 2 === 0, F.col("text"))
          .otherwise(F.concat(F.col("text"),
            F.lit(" zzqx unique suffix marker"))).as("text"))
    batch.cache().count()

    val idx = s"$base/idx"
    val t0 = System.nanoTime()
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx)
    val buildWall = (System.nanoTime() - t0) / 1e9
    println(f"[im] index_build | corpus=$nCorpus | wall=$buildWall%.2f s")

    // prepared novelty gate: the reference gram set is built ONCE
    // (its linear-in-corpus cost lands here, with the index build)
    // and probed per batch — `noveltynaive` keeps the per-batch
    // recompute for the decade comparison
    val gramSet =
      if (noveltyGate && !noveltyNaive) {
        val tg = System.nanoTime()
        val gs = Dedup.buildGramSet(corpus, "doc_id", "text", n = 5)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nG = gs.count()
        println(f"[im] gramset_build | corpus=$nCorpus | " +
          f"wall=${(System.nanoTime() - tg) / 1e9}%.2f s | grams=$nG")
        Some(gs)
      } else None

    val srcDir = s"$base/in"
    batch.write.mode("overwrite").parquet(srcDir)

    // one untimed warmup pass (codegen), then the timed pass
    for (rep <- 0 to 1) {
      val out = s"$base/clean-$rep"
      val ckpt = s"$base/ckpt-$rep"
      if (rep == 1) { listener.reset(); listener.on.set(true) }
      val t1 = System.nanoTime()
      val gate: Option[org.apache.spark.sql.DataFrame =>
          org.apache.spark.sql.DataFrame] =
        if (!noveltyGate) None
        else gramSet match {
          case Some(gs) =>
            Some(Streaming.noveltyGate(gs, "doc_id", "text", n = 5))
          case None => Some { df =>
            val nov = Dedup.gramNoveltyScore(df, corpus, "doc_id",
              "text", "doc_id", "text", n = 5)
            df.join(nov.filter(F.col("novelty") >= 0.3)
              .select(F.col("id").as("doc_id")), Seq("doc_id"))
          }
        }
      val q = Streaming.dedupIngestStream(
        Streaming.readParquetStream(spark, srcDir, batch,
          maxFilesPerTrigger = 100),
        "doc_id", "text", idx, corpus, out, ckpt, minBandMatches = 3,
        qualityGate = gate)
      try q.processAllAvailable() finally q.stop()
      val wall = (System.nanoTime() - t1) / 1e9
      if (rep == 1) {
        listener.on.set(false)
        Thread.sleep(1500)
        val landed = spark.read.parquet(out).count()
        val tag =
          if (noveltyNaive) "probe_batch_noveltynaive"
          else if (noveltyGate) "probe_batch_novelty"
          else "probe_batch"
        println(f"[im] $tag | corpus=$nCorpus | wall=$wall%.2f s | " +
          f"task=${listener.taskMs.get() / 1e3}%.1f s | " +
          f"shuffle_mb=${listener.shuffle.get() / 1e6}%.2f | " +
          f"tasks=${listener.tasks.get()} | landed=$landed")
      }
    }
    spark.stop()
  }
}

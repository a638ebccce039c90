package graft.tools

import org.apache.spark.sql.{functions => F}

import graft.{GraftSession, Tables}

/** Flood-slope measurement for the winnow overlap join, backing the
  * BENCHNOTES/SCALING round-8 entry: a boilerplate document is
  * replicated N× on top of the sf corpus, so its fingerprints land in
  * every copy and the UNGUARDED fp self-join enumerates N² pairs per
  * flooded hash — the same mechanism as the measured-unfinishable LSH
  * flood (BENCHNOTES round 5). Times `winnowNearDups` (guard
  * defaulted ON) vs the unguarded join across a copies ladder, so the
  * table shows capped-flat vs uncapped-quadratic.
  *
  * Usage: runMain graft.tools.WinnowFloodMeasure [sfDir] [copiesCsv] [mode]
  *   mode: both | cap | uncap (default both)
  */
object WinnowFloodMeasure {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val ladder = args.lift(1).getOrElse("300,1000,3000")
      .split(",").map(_.trim.toInt).toSeq
    val mode = args.lift(2).getOrElse("both")
    val spark = GraftSession.builder("graft-winnow-flood", "local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.applyEngineConf(spark)
    val docs = Tables.read(spark, sfDir, "documents")
      .select(F.col("doc_id").cast("long").as("doc_id"), F.col("text"))
    val boiler = docs.orderBy("doc_id").limit(1)
      .select("text").head().getString(0)
    def corpusWith(copies: Int) =
      docs.unionByName(spark.range(copies).select(
        (F.col("id") + 1000000L).as("doc_id"), F.lit(boiler).as("text")))
    def time(copies: Int, cap: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val pairs = graft.llm.Dedup.winnowNearDups(corpusWith(copies),
        "doc_id", "text", minShared = 3, minContainment = 0.8,
        maxDocFreq = cap)
      val n = pairs.count()
      val dt = (System.nanoTime() - t0) / 1e9
      pairs.unpersist(blocking = true)
      spark.catalog.clearCache()
      (dt, n)
    }
    ladder.foreach { copies =>
      if (mode != "uncap") {
        val (t, n) = time(copies, 1000)
        println(f"CAPPED   cap=1000 copies=$copies%5d: $t%7.1f s, $n pairs")
      }
      if (mode != "cap") {
        val (t, n) = time(copies, 0)
        println(f"UNCAPPED          copies=$copies%5d: $t%7.1f s, $n pairs")
      }
    }
    spark.stop()
  }
}

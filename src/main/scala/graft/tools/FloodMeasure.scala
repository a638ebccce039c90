package graft.tools

import org.apache.spark.sql.{functions => F}

import graft.{GraftSession, Tables}

/** One-off measurement backing BENCHNOTES.md's flood-guard entry:
  * times `minhashNearDups` over documents plus a 3000×-replicated
  * boilerplate doc, capped (maxBandBucket = 1000) vs uncapped.
  *
  * Usage: runMain graft.tools.FloodMeasure [sfDir] [floodCopies]
  */
object FloodMeasure {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(3000)
    val spark = GraftSession.builder("graft-flood", "local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.applyEngineConf(spark)
    val docs = Tables.read(spark, sfDir, "documents")
      .select(F.col("doc_id").cast("long").as("doc_id"), F.col("text"))
    val boiler = docs.orderBy("doc_id").limit(1)
      .select("text").head().getString(0)
    val corpus = docs.unionByName(spark.range(copies).select(
      (F.col("id") + 1000000L).as("doc_id"), F.lit(boiler).as("text")))
    def time(cap: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val pairs = graft.llm.Dedup.minhashNearDups(corpus, "doc_id",
        "text", threshold = 0.8, minBandMatches = 3, maxBandBucket = cap)
      val n = pairs.count()
      val dt = (System.nanoTime() - t0) / 1e9
      pairs.unpersist(blocking = true)
      spark.catalog.clearCache()
      (dt, n)
    }
    val mode = args.lift(2).getOrElse("both")
    if (mode != "uncap") {
      val (tCap, nCap) = time(1000)
      println(f"CAPPED   cap=1000 copies=$copies: $tCap%.1f s, $nCap pairs")
    }
    if (mode != "cap") {
      val (tOff, nOff) = time(0)
      println(f"UNCAPPED          copies=$copies: $tOff%.1f s, $nOff pairs")
    }
    spark.stop()
  }
}

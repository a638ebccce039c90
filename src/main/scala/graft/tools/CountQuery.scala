package graft.tools

import graft.{GraftSession, SparkEntry}

/** Count a registered query's (or ScaleMeasure extra's) result rows
  * at an arbitrary data dir — the recall companion to ScaleMeasure
  * for parameter-lever comparisons (e.g. q31 vs q31_bucketcap pair
  * counts: cost tables alone can hide a recall trade).
  *
  * Usage: runMain graft.tools.CountQuery <sfDir> <name>[,<name>...]
  */
object CountQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = GraftSession.builder("graft-count", "local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.applyEngineConf(spark)
    names.foreach { name =>
      val fn = ScaleMeasure.Extras.getOrElse(name,
        SparkEntry.queries(name))
      val n = fn(spark, sfDir).count()
      println(s"[count] $name | $sfDir | rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

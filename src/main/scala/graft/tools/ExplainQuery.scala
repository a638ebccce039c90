package graft.tools

import graft.{GraftSession, SparkEntry}

/** Print a registered query's formatted plan against an arbitrary
  * data dir — the diagnosis companion to ScaleMeasure (PLANS.md dumps
  * the sf0.001 plans; scale anomalies need the plan AT the anomalous
  * scale, post-AQE).
  *
  * Usage: runMain graft.tools.ExplainQuery <sfDir> <queryName> [exec]
  *   exec: also run the query and print the FINAL adaptive plan
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val exec = args.lift(2).contains("exec")
    val spark = GraftSession.builder("graft-explain", "local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.applyEngineConf(spark)
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (exec) df.write.format("noop").mode("overwrite").save()
    println("=== plan ===")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}

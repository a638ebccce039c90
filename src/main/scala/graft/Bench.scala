package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Times every SparkEntry query at the
  * SPARK_GRAFT_SF_DIR scale factor and emits one JSON line.
  *
  * Methodology:
  *   - the action is a `noop`-format write, not `count()` — count lets
  *     Catalyst prune unreferenced projections, under-measuring
  *     expression-heavy queries;
  *   - one warmup pass at sf0.001 first (JIT + codegen caches), so the
  *     first timed query doesn't absorb JVM warmup;
  *   - the JSON line is printed to stdout AND written to
  *     $SPARK_GRAFT_BENCH_OUT (default bench_out.json) so the driver
  *     doesn't have to fish it out of the sbt log tail.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder("graft-bench", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.applyEngineConf(spark)

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
            dir: String): Unit =
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      // LLM operators persist() intermediates their lazy result plans
      // reference; free them between queries so 39 queries don't
      // accumulate cached blocks across the run
      finally spark.catalog.clearCache()

    // warmup (untimed, small scale)
    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn, warmDir) catch { case _: Throwable => () }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try run(fn, sfDir) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    println(line)
    spark.stop()
  }
}

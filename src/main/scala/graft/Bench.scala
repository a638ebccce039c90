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
  *   - each query is timed SPARK_GRAFT_BENCH_REPS times (default 3) and
  *     the MEDIAN is reported — a single timing conflates the query
  *     with whatever GC/compilation debt the previous query left
  *     behind (the round-2 q31/q43 outliers were exactly this);
  *   - reps are interleaved (all queries rep 1, then all rep 2, …) so a
  *     run-order effect lands on different queries each rep instead of
  *     inflating the same median 3×;
  *   - a query that throws records -1 (NOT its time-to-failure, which
  *     reads as a plausible fast timing) and lands in the "errors"
  *     list;
  *   - the JSON line is printed to stdout AND written to
  *     $SPARK_GRAFT_BENCH_OUT (default bench_out.json) so the driver
  *     doesn't have to fish it out of the sbt log tail.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = GraftSession.builder("graft-bench", s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.applyEngineConf(spark)

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
            dir: String): Unit =
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      // LLM operators persist() their intermediates; free them between
      // queries so 45 queries don't accumulate cached blocks
      finally spark.catalog.clearCache()

    // warmup (untimed, small scale)
    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn, warmDir) catch { case _: Throwable => () }
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // timings(name) accumulates one entry per successful rep
    val timings = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    for (_ <- 1 to reps; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        run(fn, sfDir)
        timings(name) ::= (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => failed += name }
    }

    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      s(s.size / 2)
    }
    // ANY failed rep marks the query failed (-1, listed in errors) —
    // reporting a median of the surviving reps would let an
    // intermittently-broken query masquerade as a clean timing
    val results = names.map { name =>
      val ts = timings(name)
      name -> (if (failed(name) || ts.isEmpty) -1.0 else median(ts))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$reps,"errors":$errs,"sf":"$sfDir"}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    println(line)
    spark.stop()
  }
}

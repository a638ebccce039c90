package graft

/** Smoke-level invariants for every registry query at sf0.001: runs,
  * returns rows, oracle entry exists. Value-level correctness is the
  * driver's DuckDB gate (tools/check_correctness.py locally).
  */
class QueriesSpec extends SparkSpec {

  test("every query has an oracle or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.forall(_.endsWith("_noracle")),
      s"queries missing oracle SQL: $noOracle")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sf)
      assert(df.count() > 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

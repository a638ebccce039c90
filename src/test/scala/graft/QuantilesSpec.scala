package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.exceptions.InvalidArgumentValue
import graft.operators.Quantiles

/** Pins `Quantiles.exactQuantiles` BIT-equal to Spark's built-in
  * `percentile` aggregate (the parity contract that lets it replace
  * the single-buffer aggregate in profileNumeric/winsorize/q70
  * without touching their green oracle hashes), and the scale shape:
  * no Percentile aggregate in the plan, no leaked checkpoint blocks.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def forAllSeeded[A](gen: Gen[A], cases: Int = 30)(check: A => Unit): Unit =
    (1 to cases).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  /** Bit-compare exactQuantiles against percentile on (grp, v) rows.
    * Tiny buckets/threshold force several refinement iterations so
    * the interval bookkeeping (not just the final window) is what is
    * actually under test.
    */
  private def assertParity(rows: Seq[(String, java.lang.Double)],
                           ps: Seq[Double], buckets: Int = 4,
                           threshold: Long = 3,
                           broadcastTargetLimit: Long = 100000L): Unit = {
    val df = rows.toDF("grp", "v")
    val got = Quantiles.exactQuantiles(df, Seq("grp"), "v", ps,
        buckets = buckets, threshold = threshold,
        broadcastTargetLimit = broadcastTargetLimit)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (if (r.isNullAt(2)) null else r.getAs[Double](2).asInstanceOf[Any]))
      .toMap
    val psSql = ps.mkString("array(", ",", ")")
    val want = df.groupBy("grp")
      .agg(expr(s"percentile(v, $psSql)").as("qs"))
      .collect().flatMap { r =>
        val qs = r.getAs[scala.collection.Seq[Any]]("qs")
        if (qs == null) ps.map(p => (r.getString(0), p) -> null)
        else ps.zip(qs).map { case (p, q) => (r.getString(0), p) -> q }
      }.toMap
    assert(got.keySet == want.keySet,
      s"key sets differ: ${got.keySet} vs ${want.keySet}")
    want.foreach { case (k, w) =>
      val gv = got(k)
      val same = (w, gv) match {
        case (null, null) => true
        case (a: Double, b: Double) =>
          java.lang.Double.doubleToLongBits(a) ==
            java.lang.Double.doubleToLongBits(b)
        case _ => false
      }
      assert(same, s"$k: percentile=$w exactQuantiles=$gv")
    }
  }

  test("many-group regime (group-partitioned data, no broadcast) keeps bit parity") {
    // broadcastTargetLimit = 0 forces the keyed-join path plus the
    // one-time group-keyed re-persist — parity must be unaffected by
    // the physical-plan change
    val gen = for {
      n <- Gen.chooseNum(1, 120)
      vals <- Gen.listOfN(n, for {
        g <- Gen.chooseNum(0, 5)
        v <- Gen.chooseNum(-1e6, 1e6)
      } yield (s"g$g", java.lang.Double.valueOf(v)))
    } yield vals
    forAllSeeded(gen, cases = 10) { rows =>
      assertParity(rows, Seq(0.05, 0.5, 0.95),
        broadcastTargetLimit = 0L)
    }
  }

  test("continuous doubles: bit-equal to percentile across seeds") {
    val gen = for {
      n <- Gen.chooseNum(1, 120)
      groups <- Gen.chooseNum(1, 4)
      vals <- Gen.listOfN(n, for {
        g <- Gen.chooseNum(0, groups - 1)
        v <- Gen.chooseNum(-1e6, 1e6)
      } yield (s"g$g", java.lang.Double.valueOf(v)))
    } yield vals
    forAllSeeded(gen) { rows =>
      assertParity(rows, Seq(0.0, 0.05, 0.5, 0.9, 0.99, 1.0))
    }
  }

  test("integer-valued and tie-heavy data: bit-equal across seeds") {
    val gen = for {
      n <- Gen.chooseNum(1, 150)
      vals <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b")
        v <- Gen.chooseNum(0, 7) // few distinct values → deep ties
      } yield (g, java.lang.Double.valueOf(v.toDouble)))
    } yield vals
    forAllSeeded(gen) { rows =>
      assertParity(rows, Seq(0.25, 0.5, 0.75))
    }
  }

  test("near-ulp clustered values converge (progress guard)") {
    // all values within a few ulps: histogram width underflows fast;
    // the guard must exit to the final window, not loop to maxIter
    val base = 1.0
    val rows = (0 until 40).map(i =>
      ("a", java.lang.Double.valueOf(base + i % 3 * java.lang.Math.ulp(base))))
    assertParity(rows, Seq(0.1, 0.5, 0.9), buckets = 4, threshold = 2)
  }

  test("all-null group yields NULL q; mixed nulls are skipped") {
    val rows: Seq[(String, java.lang.Double)] = Seq(
      ("dead", null), ("dead", null),
      ("live", java.lang.Double.valueOf(3.0)), ("live", null),
      ("live", java.lang.Double.valueOf(9.0)))
    assertParity(rows, Seq(0.5))
  }

  test("global (empty groupCols) matches global percentile") {
    val vs = Seq(3.25, -1.5, 7.75, 2.0, 100.0, 0.125, 8.5)
    val df = vs.toDF("v")
    val got = Quantiles.exactQuantiles(df, Nil, "v", Seq(0.5, 0.9),
        buckets = 2, threshold = 1)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val Row(qs: scala.collection.Seq[Any] @unchecked) = df
      .agg(expr("percentile(v, array(0.5, 0.9))")).head()
    assert(got(0.5) == qs(0) && got(0.9) == qs(1))
    assert(!got.keySet.exists(_.isNaN))
  }

  test("single-row group, p=0 and p=1 exact endpoints") {
    assertParity(Seq(("a", java.lang.Double.valueOf(42.0))), Seq(0.0, 0.5, 1.0))
  }

  test("NaN input is rejected; bad args are rejected") {
    val df = Seq(("a", Double.NaN), ("a", 1.0)).toDF("grp", "v")
    intercept[InvalidArgumentValue] {
      Quantiles.exactQuantiles(df, Seq("grp"), "v", Seq(0.5))
    }
    val ok = Seq(("a", 1.0)).toDF("grp", "v")
    intercept[InvalidArgumentValue] {
      Quantiles.exactQuantiles(ok, Seq("grp"), "v", Nil)
    }
    intercept[InvalidArgumentValue] {
      Quantiles.exactQuantiles(ok, Seq("grp"), "v", Seq(1.5))
    }
    intercept[InvalidArgumentValue] {
      Quantiles.exactQuantiles(ok, Seq("grp"), "nope", Seq(0.5))
    }
    intercept[InvalidArgumentValue] {
      Quantiles.exactQuantiles(ok, Seq("grp"), "v", Seq(0.5), buckets = 1)
    }
  }

  test("no Percentile aggregate in the result plan (scale contract)") {
    val df = (1 to 1000).map(i => (s"g${i % 3}", i * 0.37)).toDF("grp", "v")
    val out = Quantiles.exactQuantiles(df, Seq("grp"), "v", Seq(0.5, 0.95))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("percentile"),
      "exactQuantiles must not fall back to the percentile aggregate")
    assert(out.count() == 6)
  }

  test("no checkpoint blocks or cache entries leak past the call") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val df = (1 to 5000).map(i => (s"g${i % 5}", i * 1.7)).toDF("grp", "v")
    val out = Quantiles.exactQuantiles(df, Seq("grp"), "v",
      Seq(0.5), buckets = 8, threshold = 16)
    out.collect()
    // only the final result's own localCheckpoint blocks may remain
    // (they back the returned frame; ContextCleaner frees them on GC)
    val leaked = sc.getPersistentRDDs.keySet.diff(before)
    assert(leaked.size <= 1,
      s"expected at most the result's own checkpoint, got $leaked")
  }
}

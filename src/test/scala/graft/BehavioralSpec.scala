package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.exceptions._
import graft.operators.{Behavioral, Profiling}

/** Behavioral analytics (rolling event-time windows, cohort
  * retention, ordered funnels) + winsorization: each operator must
  * match a naive/hand-computed replay exactly — the distributed plan
  * is an optimization, never a semantics change.
  */
class BehavioralSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val events = Tables.read(spark, sf, "events")

  test("rollingWindow matches a naive time-range self-join") {
    // round(2) both sides: the window's ordered sum and the join's
    // partial-aggregated sum accumulate doubles in different orders
    val got = Behavioral.rollingWindow(events, "user_id", "ts",
        "value", 3600L)
      .select($"event_id", $"n_window",
        round($"sum_window", 2).as("sum_window"))
    // naive quadratic replay: for every event, scan the user's events
    // in (ts - 1h, ts]
    val e = events.select($"user_id", $"ts", $"value", $"event_id")
    val naive = e.as("a").join(e.as("b"),
        $"a.user_id" === $"b.user_id" &&
          $"b.ts" >= ($"a.ts" - expr("INTERVAL 1 HOUR")) &&
          $"b.ts" <= $"a.ts")
      .groupBy($"a.event_id".as("event_id"))
      .agg(count(lit(1)).as("n_window"),
        round(sum($"b.value"), 2).as("sum_window"))
    assert(got.join(naive, Seq("event_id", "n_window", "sum_window"))
      .count() == events.count())
  }

  test("rollingWindow frame is inclusive at exactly lookback distance") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 11:00:00"), 2.0), // exactly 1h later: included
      // 1h+1µs after the 11:00 event: that event falls OUTSIDE this
      // frame, so only the row itself is counted
      (1L, ts("2024-01-01 12:00:00.000001"), 4.0)
    ).toDF("k", "ts", "v")
    val out = Behavioral.rollingWindow(df, "k", "ts", "v", 3600L)
      .orderBy("ts").select("n_window", "sum_window")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 1.0), (2L, 3.0), (1L, 4.0)))
  }

  test("cohortRetention matches a hand-computed matrix") {
    val df = Seq(
      // user 1: first event Mon Jan 1 week, active weeks 0 and 2
      (1L, ts("2024-01-03 10:00:00")),
      (1L, ts("2024-01-16 10:00:00")),
      // user 2: same cohort week, active week 0 only (two events,
      // one distinct week)
      (2L, ts("2024-01-05 09:00:00")),
      (2L, ts("2024-01-07 23:00:00")),
      // user 3: cohort week of Jan 8, active weeks 0 and 1
      (3L, ts("2024-01-08 00:00:00")),
      (3L, ts("2024-01-14 12:00:00")),
      (3L, ts("2024-01-15 12:00:00"))
    ).toDF("user_id", "ts")
    val got = Behavioral.cohortRetention(df, "user_id", "ts", 8)
      .select(col("cohort_week").cast("string"), col("k_weeks"),
        col("n_active"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)))
  }

  test("funnel requires strict temporal order through the stages") {
    val df = Seq(
      // u1 completes a → b → c in order
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 11:00:00"), "b"),
      (1L, ts("2024-01-01 12:00:00"), "c"),
      // u2 has all three types but c precedes b: stops after b
      (2L, ts("2024-01-01 10:00:00"), "a"),
      (2L, ts("2024-01-01 09:00:00"), "c"),
      (2L, ts("2024-01-01 11:00:00"), "b"),
      // u3 never does a: counts nowhere
      (3L, ts("2024-01-01 10:00:00"), "b"),
      (3L, ts("2024-01-01 11:00:00"), "c"),
      // u4 does a then c but no b: stops after a
      (4L, ts("2024-01-01 10:00:00"), "a"),
      (4L, ts("2024-01-01 11:00:00"), "c")
    ).toDF("user_id", "ts", "event_type")
    val got = Behavioral.funnel(df, "user_id", "ts", "event_type",
        Seq("a", "b", "c"))
      .orderBy("stage_idx")
      .select("stage", "n_entities").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("funnel equal timestamps do not advance a stage (strictly after)") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 10:00:00"), "b")
    ).toDF("user_id", "ts", "event_type")
    val got = Behavioral.funnel(df, "user_id", "ts", "event_type",
        Seq("a", "b")).orderBy("stage_idx")
      .select("n_entities").as[Long].collect().toSeq
    assert(got == Seq(1L, 0L))
  }

  test("behavioral argument validation") {
    intercept[InvalidArgumentValue] {
      Behavioral.rollingWindow(events, "user_id", "ts", "value", 0L)
    }
    intercept[InvalidArgumentValue] {
      Behavioral.rollingWindow(events, "nope", "ts", "value", 10L)
    }
    intercept[InvalidArgumentValue] {
      Behavioral.funnel(events, "user_id", "ts", "event_type", Nil)
    }
    intercept[InvalidArgumentValue] {
      Behavioral.funnel(events, "user_id", "ts", "event_type",
        Seq("a", "a"))
    }
    intercept[InvalidArgumentValue] {
      Behavioral.cohortRetention(events, "user_id", "ts", -1)
    }
  }

  test("transitionMatrix counts adjacency under the total order") {
    val df = Seq(
      // user 1 sequence by (ts, id): a(1) b(2) b(3) c(4) — ties at
      // 11:00 broken by the id tiebreaker
      (1L, ts("2024-01-01 10:00:00"), "a", 1L),
      (1L, ts("2024-01-01 11:00:00"), "b", 2L),
      (1L, ts("2024-01-01 11:00:00"), "b", 3L),
      (1L, ts("2024-01-01 12:00:00"), "c", 4L),
      // user 2: a c — one transition
      (2L, ts("2024-01-01 10:00:00"), "a", 5L),
      (2L, ts("2024-01-01 11:00:00"), "c", 6L),
      // user 3: single event, no transitions
      (3L, ts("2024-01-01 10:00:00"), "a", 7L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = graft.operators.Behavioral.transitionMatrix(
        df, "user_id", "ts", "event_type", "event_id")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Double)].collect().toSeq
    // from a: b×1, c×1 (p=.5 each); from b: b×1, c×1 (p=.5 each)
    assert(got == Seq(
      ("a", "b", 1L, 0.5), ("a", "c", 1L, 0.5),
      ("b", "b", 1L, 0.5), ("b", "c", 1L, 0.5)))
  }

  test("snapshotDiff classifies added/removed/changed null-safely") {
    import graft.operators.Relational
    val oldDf = Seq(
      (1L, Some(10.0), "x"), // unchanged -> dropped
      (2L, Some(20.0), "x"), // value change
      (3L, None: Option[Double], "x"), // null -> value: changed
      (4L, Some(40.0), "x"), // removed
      (5L, None: Option[Double], "x") // null == null: unchanged
    ).toDF("k", "v", "s")
    val newDf = Seq(
      (1L, Some(10.0), "x"),
      (2L, Some(21.0), "x"),
      (3L, Some(30.0), "x"),
      (5L, None: Option[Double], "x"),
      (6L, Some(60.0), "x") // added
    ).toDF("k", "v", "s")
    val got = Relational.snapshotDiff(oldDf, newDf, Seq("k"),
        Seq("v", "s"))
      .select("k", "change_type")
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "changed", 3L -> "changed",
      4L -> "removed", 6L -> "added"))
    intercept[InvalidArgumentValue] {
      Relational.snapshotDiff(oldDf, newDf, Nil, Seq("v"))
    }
    intercept[InvalidArgumentValue] {
      Relational.snapshotDiff(oldDf, newDf, Seq("k"), Seq("nope"))
    }
  }

  test("skewReport summarizes per-key counts and ranks heavy keys") {
    // counts: a×4, b×2, c×1, d×1 → mean 2, max 4, skew 2;
    // interpolated percentiles of [1,1,2,4]: p50 1.5, p90 3.4
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "x")
    val rows = Profiling.skewReport(df, Seq("k"), topK = 2)
      .orderBy(col("kind"), col("n_rows").desc, col("key"))
      .collect()
    val s = rows.last
    assert(s.getString(0) == "summary" && s.getLong(2) == 8L &&
      s.getDouble(4) == 1.5 && s.getDouble(5) == 3.4 &&
      s.getDouble(7) == 2.0)
    val heavy = rows.init.map(r =>
      (r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(heavy == Seq(("a", 4L, 0.5), ("b", 2L, 0.25)))
    intercept[InvalidArgumentValue] {
      Profiling.skewReport(df, Nil)
    }
  }

  test("skewReport keys: NULLs and separator chars cannot collide") {
    // ("a", NULL) vs ("a",) missing-style vs ("a|b", "c") vs ("a", "b|c"):
    // concat_ws grouping would merge some of these; struct grouping
    // must keep all four distinct with exact counts
    val df = Seq(
      ("a", null, 1), ("a", null, 2), ("a", null, 3),
      ("a|b", "c", 4), ("a|b", "c", 5),
      ("a", "b|c", 6),
      ("a", "", 7)
    ).toDF("k1", "k2", "x")
    val heavy = Profiling.skewReport(df, Seq("k1", "k2"), topK = 10)
      .filter(col("kind") === "heavy_key")
      .select("key", "n_rows").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(heavy.values.toSeq.sorted == Seq(1L, 1L, 2L, 3L),
      s"counts misattributed: $heavy")
    // NULL renders as ␀, literal '|' in a value is escaped — the
    // four rendered keys are distinct strings
    assert(heavy.keySet.size == 4, s"rendered keys collided: ${heavy.keySet}")
    assert(heavy("a|␀") == 3L)
    assert(heavy("a\\|b|c") == 2L)
    assert(heavy("a|b\\|c") == 1L)
    assert(heavy("a|") == 1L)
  }

  test("skewReport keys: a literal ␀ value is distinct from NULL") {
    // a value that IS the NULL sentinel character must not render
    // byte-identically to an actual NULL — it is backslash-escaped
    val df = Seq(("a", "␀", 1), ("a", null, 2), ("a", null, 3))
      .toDF("k1", "k2", "x")
    val heavy = Profiling.skewReport(df, Seq("k1", "k2"), topK = 10)
      .filter(col("kind") === "heavy_key")
      .select("key", "n_rows").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(heavy.keySet.size == 2, s"sentinel collided: ${heavy.keySet}")
    assert(heavy("a|␀") == 2L)      // the real NULLs
    assert(heavy("a|\\␀") == 1L)    // the literal character, escaped
  }

  test("interArrivalStats computes tie-broken gap percentiles") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:00:10"), 2L),
      (1L, ts("2024-01-01 10:00:30"), 3L),
      (2L, ts("2024-01-01 10:00:00"), 4L) // single event: no gaps
    ).toDF("user_id", "ts", "event_id")
    val got = graft.operators.Behavioral.interArrivalStats(
        df, "user_id", "ts", "event_id")
      .orderBy("user_id").collect()
    // user 1: gaps 10 s and 20 s → p50 15, p90 19, max 20
    val u1 = got(0)
    assert(u1.getLong(1) == 3L && u1.getLong(2) == 2L &&
      u1.getDouble(3) == 15.0 && u1.getDouble(4) == 19.0 &&
      u1.getDouble(5) == 20.0)
    val u2 = got(1)
    assert(u2.getLong(1) == 1L && u2.getLong(2) == 0L &&
      u2.isNullAt(3) && u2.isNullAt(4) && u2.isNullAt(5))
  }

  test("approxDistinctProfile stays within the sketch error bound") {
    val li = Tables.read(spark, sf, "lineitem")
    val got = Profiling.approxDistinctProfile(li, "l_returnflag",
        Seq("l_orderkey", "l_shipdate"))
      .as[(String, String, Long, Long)].collect()
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("ok"),
        countDistinct("l_shipdate").as("sd"))
      .as[(String, Long, Long)].collect()
      .flatMap { case (g, ok, sd) =>
        Seq((g, "l_orderkey") -> ok, (g, "l_shipdate") -> sd)
      }.toMap
    assert(got.nonEmpty)
    got.foreach { case (g, c, _, approx) =>
      val ex = exact((g, c)).toDouble
      assert(math.abs(approx - ex) / ex < 0.10,
        s"($g, $c): approx $approx vs exact $ex")
    }
    intercept[InvalidArgumentValue] {
      Profiling.approxDistinctProfile(li, "l_returnflag", Nil)
    }
  }

  test("winsorize clips exactly to the group percentile bounds") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "x")
    val out = Profiling.winsorize(df, "grp", "x", 0.10, 0.90)
    // interpolated p10 of 1..100 = 10.9, p90 = 90.1
    val bounds = out.select("lo_bound", "hi_bound").distinct()
      .as[(Double, Double)].collect().toSeq
    assert(bounds == Seq((10.9, 90.1)))
    val clipped = out.select("clipped").as[Double].collect()
    assert(clipped.min == 10.9 && clipped.max == 90.1)
    // interior values pass through unclipped
    assert(out.filter($"x" === 50.0).select("clipped")
      .as[Double].head() == 50.0)
    intercept[InvalidArgumentValue] {
      Profiling.winsorize(df, "grp", "x", 0.9, 0.1)
    }
    intercept[InvalidArgumentValue] {
      Profiling.winsorize(df, "nope", "x", 0.1, 0.9)
    }
  }
}

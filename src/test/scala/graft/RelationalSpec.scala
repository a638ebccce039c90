package graft

import org.apache.spark.sql.functions._

import graft.exceptions._
import graft.operators.Relational

/** Distributed-relational helpers: global indexing/ntile semantics
  * and the skew-salting operators (results must match their unsalted
  * equivalents exactly).
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def orders = Tables.read(spark, sf, "orders")

  test("withGlobalIndex assigns a dense 0..n-1 index in sort order") {
    val df = orders.select("o_orderkey", "o_totalprice")
    val indexed = Relational.withGlobalIndex(df,
      Seq($"o_totalprice".asc, $"o_orderkey".asc), "idx",
      numPartitions = Some(7))
    val n = df.count()
    assert(indexed.agg(min("idx"), max("idx"), countDistinct("idx"))
      .as[(Long, Long, Long)].head() == (0L, n - 1, n))
    // index order must equal sort order
    val first = indexed.orderBy("idx").limit(3)
      .select("o_orderkey").as[Long].collect().toSeq
    val expect = df.orderBy($"o_totalprice".asc, $"o_orderkey".asc)
      .limit(3).select("o_orderkey").as[Long].collect().toSeq
    assert(first == expect)
  }

  test("ntileBucketed matches SQL ntile bucket sizes") {
    // 10 rows, 3 buckets → sizes 4,3,3 (first n%k buckets get +1)
    val df = (1 to 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
    val out = Relational.ntileBucketed(df, 3, Seq($"v".asc, $"id".asc),
        "b", numPartitions = Some(3))
      .groupBy("b").count().orderBy("b")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 4L), (2L, 3L), (3L, 3L)))
  }

  test("asOfJoin matches a naive latest-at-or-before lookup") {
    val events = Tables.read(spark, sf, "events")
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"), $"value".as("p_value"))
    val others = events.filter($"event_type" =!= "purchase")
      .select("event_id", "user_id", "ts", "value")
    val got = Relational.asOfJoin(others, purchases, Seq("user_id"),
      "ts", "p_ts")

    // naive oracle: non-equi join to ALL earlier purchases, keep the
    // max p_ts per event (exactly what as-of means, at O(L*R) cost)
    val best = others.as("l")
      .join(purchases.as("r"),
        $"l.user_id" === $"r.user_id" && $"l.ts" >= $"r.p_ts", "left")
      .groupBy($"l.event_id".as("event_id"))
      .agg(max(struct($"r.p_ts", $"r.p_value")).as("m"))
      .select($"event_id", $"m.p_ts".as("e_ts"), $"m.p_value".as("e_value"))
    val joined = got.join(best, "event_id")
    assert(joined.count() == others.count())
    assert(joined.filter(
      !($"p_ts" <=> $"e_ts") || !($"p_value" <=> $"e_value")).count() == 0)
    // inner drops exactly the unmatched rows
    val inner = Relational.asOfJoin(others, purchases, Seq("user_id"),
      "ts", "p_ts", joinType = "inner")
    assert(inner.count() == got.filter($"p_ts".isNotNull).count())
    // exact-time matches are INCLUSIVE: a row at a purchase's own ts
    // must see that purchase
    val self = purchases.select($"user_id", $"p_ts".as("ts"),
      $"p_value".as("probe_v"))
    val exact = Relational.asOfJoin(self, purchases, Seq("user_id"),
      "ts", "p_ts")
    assert(exact.filter($"p_ts".isNull).count() == 0)
    assert(exact.filter($"p_ts" > $"ts").count() == 0)
    intercept[InvalidArgumentValue] {
      Relational.asOfJoin(others, purchases.withColumnRenamed("p_ts", "ts"),
        Seq("user_id"), "ts", "ts")
    }
  }

  test("asOfJoin carries the matched right row whole, nulls included") {
    // the matched right row at t=20 has a NULL value; a per-column
    // ignoreNulls carry would backfill 5.0 from the older t=10 row,
    // fabricating a (t=20, 5.0) row that never existed
    val left = Seq((1L, 10L, 30L)).toDF("eid", "k", "t")
    val right = Seq((10L, 10L, Some(5.0)), (10L, 20L, None))
      .toDF("k", "r_t", "r_v")
    val out = Relational.asOfJoin(left, right, Seq("k"), "t", "r_t")
      .select("r_t", "r_v").as[(Option[Long], Option[Double])].head()
    assert(out == (Some(20L), None))
    // and inner keeps the row: the match exists even with null fields
    assert(Relational.asOfJoin(left, right, Seq("k"), "t", "r_t",
      joinType = "inner").count() == 1)
  }

  test("rangeJoin equals the naive BETWEEN join, overlaps included") {
    val pts = orders.select("o_orderkey", "o_totalprice")
    val bands = Seq((1L, 0.0, 60000.0), (2L, 40000.0, 200000.0),
      (3L, 150000.0, 600000.0)).toDF("band_id", "lo", "hi")
    val got = Relational.rangeJoin(pts, bands, "o_totalprice",
        "lo", "hi", binWidth = 25000.0)
      .select("o_orderkey", "band_id")
    val naive = pts.join(bands,
        $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
      .select("o_orderkey", "band_id")
    assert(got.count() == naive.count())
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
    // points in the two overlap windows [40k,60k) and [150k,200k)
    // must match BOTH of their bands
    assert(got.groupBy("o_orderkey").count().filter($"count" === 2)
      .count() == pts.filter(
        ($"o_totalprice" >= 40000.0 && $"o_totalprice" < 60000.0) ||
        ($"o_totalprice" >= 150000.0 && $"o_totalprice" < 200000.0))
      .count())
  }

  test("saltedJoin equals the plain join on skewed keys") {
    // skew: 90% of rows share one key
    val probe = (1 to 1000)
      .map(i => (if (i <= 900) 1L else i.toLong, i.toDouble))
      .toDF("k", "v")
    val build = Seq((1L, "hot"), (950L, "cold")).toDF("k", "name")
    val plain = probe.join(build, Seq("k"))
      .agg(count(lit(1)), round(sum("v"), 2)).as[(Long, Double)].head()
    val salted = Relational.saltedJoin(probe, build, Seq("k"), 8)
      .agg(count(lit(1)), round(sum("v"), 2)).as[(Long, Double)].head()
    assert(salted == plain)
    // left join keeps unmatched probe rows exactly once
    val plainLeft = probe.join(build, Seq("k"), "left").count()
    val saltedLeft = Relational
      .saltedJoin(probe, build, Seq("k"), 8, "left").count()
    assert(saltedLeft == plainLeft)
  }

  test("saltedAggregate merges partials to the exact plain result") {
    val df = orders.select($"o_orderstatus".as("k"),
      $"o_totalprice".as("v"))
    val plain = df.groupBy("k").agg(
        sum("v").as("v_sum"), count("v").as("v_count"),
        min("v").as("v_min"), max("v").as("v_max"))
      .orderBy("k").collect().toSeq
    val salted = Relational.saltedAggregate(df, Seq("k"),
        Seq("v" -> "sum", "v" -> "count", "v" -> "min", "v" -> "max"), 8)
      .orderBy("k").collect().toSeq
    assert(salted.map(_.toSeq.map {
      case d: Double => math.round(d * 100) / 100.0
      case x => x
    }) == plain.map(_.toSeq.map {
      case d: Double => math.round(d * 100) / 100.0
      case x => x
    }))
    intercept[InvalidArgumentValue] {
      Relational.saltedAggregate(df, Seq("k"), Seq("v" -> "avg"), 4)
    }
    intercept[InvalidArgumentValue] { // empty spec
      Relational.saltedAggregate(df, Seq("k"), Nil, 4)
    }
    intercept[InvalidArgumentValue] { // duplicate spec entries
      Relational.saltedAggregate(df, Seq("k"),
        Seq("v" -> "sum", "v" -> "sum"), 4)
    }
  }

  test("saltedJoin rejects outer joins that would duplicate build rows") {
    val probe = Seq((1L, 1.0)).toDF("k", "v")
    val build = Seq((2L, "unmatched")).toDF("k", "name")
    intercept[InvalidArgumentValue] {
      Relational.saltedJoin(probe, build, Seq("k"), 8, "full")
    }
    intercept[InvalidArgumentValue] {
      Relational.saltedJoin(probe, build, Seq("k"), 8, "right")
    }
  }

  test("stratifiedSampleExact keeps exactly min(k, |stratum|) rows, deterministically") {
    val df = (1L to 100L).map(i => (i, (i % 3).toString))
      .toDF("id", "stratum")
    val sampled = Relational.stratifiedSampleExact(df, Seq("stratum"), "id", 7)
    val perStratum = sampled.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(perStratum.values.forall(_ == 7L))
    // a stratum smaller than k returns whole
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "stratum")
    assert(Relational.stratifiedSampleExact(
      tiny, Seq("stratum"), "id", 7).count() == 3)
    // membership matches the md5-rank reference and repeats identically
    val expect = df.as[(Long, String)].collect()
      .groupBy(_._2).toSeq.flatMap { case (_, rows) =>
        rows.sortBy { case (id, _) =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          (md, id)
        }.take(7).map(_._1)
      }.toSet
    val got = sampled.select("id").as[Long].collect().toSet
    assert(got == expect)
    val again = Relational.stratifiedSampleExact(df, Seq("stratum"), "id", 7)
      .select("id").as[Long].collect().toSet
    assert(again == got)
  }

  test("topKPerGroup equals the naive one-window rank; small groups whole") {
    val df = (1L to 200L)
      .map(i => (i, (i % 5).toString, (i * 37 % 101).toDouble))
      .toDF("id", "grp", "score")
      .repartition(7) // rows of one group spread across partitions
    val got = Relational.topKPerGroup(df, Seq("grp"),
        Seq(col("score").desc, col("id").asc), k = 4)
      .select("grp", "rk", "id").as[(String, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("score").desc, col("id").asc)
    val naive = df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 4)
      .select("grp", "rk", "id").as[(String, Long, Long)].collect().toSet
    assert(got == naive && got.nonEmpty)
    // a group smaller than k returns whole, correctly ranked
    val tiny = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 9.0))
      .toDF("id", "grp", "score")
    val t = Relational.topKPerGroup(tiny, Seq("grp"),
        Seq(col("score").desc, col("id").asc), k = 5)
      .select("grp", "rk", "id").as[(String, Long, Long)].collect().toSet
    assert(t == Set(("a", 1L, 2L), ("a", 2L, 1L), ("b", 1L, 3L)))
    intercept[graft.exceptions.InvalidArgumentValue] {
      Relational.topKPerGroup(tiny, Seq.empty, Seq(col("score")), 3)
    }
  }

  test("sessionize breaks on gap, not at exactly-gap, per key") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // user 1: 3 events inside 10-min gaps, then a >10-min jump
      (1L, 1L, ts("2024-01-01 00:00:00")),
      (1L, 2L, ts("2024-01-01 00:05:00")),
      (1L, 3L, ts("2024-01-01 00:15:00")), // exactly 600 s: SAME session
      (1L, 4L, ts("2024-01-01 01:00:00")), // new session
      // same timestamp: event_id tiebreak keeps numbering deterministic
      (1L, 5L, ts("2024-01-01 01:00:00")),
      // user 2: independent numbering restarts at 1
      (2L, 6L, ts("2024-01-01 05:00:00")))
      .toDF("user_id", "event_id", "ts")
      .repartition(5)
    val got = Relational.sessionize(events, "user_id", "ts",
        gapSeconds = 600, tiebreak = Seq("event_id"))
      .select("user_id", "event_id", "session_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L),
      (1L, 4L, 2L), (1L, 5L, 2L), (2L, 6L, 1L)))
    intercept[graft.exceptions.InvalidArgumentValue] {
      Relational.sessionize(events, "user_id", "ts", gapSeconds = 0)
    }
  }

  test("resampleGapFill densifies per key; chunked grid == plain sequence") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // user 1: events in hours 0 and 3 → grid must cover 0,1,2,3
      (1L, ts("2024-01-01 00:10:00"), 2.0),
      (1L, ts("2024-01-01 00:50:00"), 3.0),
      (1L, ts("2024-01-01 03:05:00"), 5.0),
      // user 2: single event → single-bucket grid
      (2L, ts("2024-01-02 07:30:00"), 1.5))
      .toDF("user_id", "ts", "value").repartition(3)
    val h0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      .getTime / 1000 / 3600
    def run(chunk: Int) = Relational.resampleGapFill(events,
        "user_id", "ts", "value", bucketSeconds = 3600, chunk = chunk)
      .as[(Long, Long, Long, Double)].collect().toSet
    // chunk=2 forces the double explode to split the 4-bucket span
    val got = run(2)
    assert(got == Set(
      (1L, h0, 2L, 5.0), (1L, h0 + 1, 0L, 0.0), (1L, h0 + 2, 0L, 0.0),
      (1L, h0 + 3, 1L, 5.0), (2L, h0 + 31, 1L, 1.5)))
    // chunk larger than any span degenerates to one sequence — same grid
    assert(run(1000000) == got)
    intercept[graft.exceptions.InvalidArgumentValue] {
      Relational.resampleGapFill(events, "user_id", "ts", "value", 0)
    }
    intercept[graft.exceptions.InvalidArgumentValue] {
      Relational.resampleGapFill(events, "user_id", "ts", "value",
        3600, chunk = 0)
    }
  }

  test("profileNumeric and correlationMatrix: hand-checked, null-aware") {
    val df = Seq(
      (Some(1.0), Some(2.0)), (Some(2.0), Some(4.0)),
      (Some(3.0), Some(6.0)), (None, Some(8.0)))
      .toDF("x", "y").repartition(3)
    val prof = graft.operators.Profiling
      .profileNumeric(df, Seq("x", "y")).orderBy("column")
      .as[(String, Long, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(prof(0) == (("x", 3L, 1L, 2.0, 1.0, 1.0, 3.0, 2.0)))
    assert(prof(1) == (("y", 4L, 0L, 5.0,
      2.581989, 2.0, 8.0, 5.0))) // stddev_samp([2,4,6,8]) rounded
    // y = 2x exactly where both present → corr 1.0 (null row ignored)
    val c = graft.operators.Profiling
      .correlationMatrix(df, Seq("x", "y"))
      .as[(String, String, Double)].head()
    assert(c == (("x", "y", 1.0)))
    intercept[graft.exceptions.InvalidArgumentValue] {
      graft.operators.Profiling.profileNumeric(df, Seq.empty)
    }
    intercept[graft.exceptions.InvalidArgumentValue] {
      graft.operators.Profiling.profileNumeric(df, Seq("missing"))
    }
    intercept[graft.exceptions.InvalidArgumentValue] {
      graft.operators.Profiling.correlationMatrix(df, Seq("x"))
    }
    intercept[graft.exceptions.InvalidArgumentValue] {
      graft.operators.Profiling.profileNumeric(
        df.withColumn("s", lit("a")), Seq("s"))
    }
  }

  test("histogram: hand-checked buckets, dense spine, degenerate column") {
    val df = Seq(0.0, 0.5, 1.0, 2.5, 10.0).toDF("v").repartition(3)
    // lo=0, hi=10, w=2.5: buckets 0:[0,2.5) -> {0,0.5,1.0}, 1 -> {2.5},
    // 2 -> {}, 3 (last, closed) -> {10}
    val h = graft.operators.Profiling.histogram(df, "v", 4)
      .orderBy("bucket")
      .as[(Long, Double, Double, Long)].collect().toSeq
    assert(h == Seq((0L, 0.0, 2.5, 3L), (1L, 2.5, 5.0, 1L),
      (2L, 5.0, 7.5, 0L), (3L, 7.5, 10.0, 1L)))
    // min == max: everything in bucket 0, spine still dense
    val d = graft.operators.Profiling
      .histogram(Seq(7.0, 7.0).toDF("v"), "v", 3)
      .orderBy("bucket").as[(Long, Double, Double, Long)]
      .collect().toSeq
    assert(d.map(r => (r._1, r._4)) == Seq((0L, 2L), (1L, 0L), (2L, 0L)))
    // nulls ignored, not a bucket
    val n = graft.operators.Profiling
      .histogram(Seq(Some(1.0), None, Some(3.0)).toDF("v"), "v", 2)
      .agg(sum("n")).as[Long].head()
    assert(n == 2L)
    intercept[graft.exceptions.InvalidArgumentValue] {
      graft.operators.Profiling.histogram(df, "v", 0)
    }
  }

  test("editDistanceJoin equals all-pairs levenshtein, long and short strings") {
    // mix: long strings (>= minCovered for q=3,d=2 -> 11 chars) with
    // planted 1- and 2-edit variants, short strings down to 2 chars
    // (the band path), and a cross-boundary near-pair
    val strs = Seq(
      1L -> "distributed analytics", 2L -> "distribXted analytics",
      3L -> "distribXtedZanalytics", 4L -> "wholly different text!",
      5L -> "ab", 6L -> "ac", 7L -> "abcd", 8L -> "xy",
      9L -> "crossboundary", 10L -> "crossboundar",
      11L -> "short str", 12L -> "short strs").toDF("id", "s")
      .repartition(5)
    for (d <- Seq(1, 2)) {
      val got = Relational.editDistanceJoin(strs, "id", "s", maxDist = d)
        .select("id_a", "id_b", "dist").orderBy("id_a", "id_b")
        .as[(Long, Long, Long)].collect().toSeq
      val naive = strs.as("l").join(strs.as("r"), $"l.id" < $"r.id")
        .select($"l.id", $"r.id",
          levenshtein($"l.s", $"r.s").cast("long").as("dist"))
        .filter($"dist" <= d).orderBy("l.id", "r.id")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == naive, s"maxDist=$d")
      assert(got.nonEmpty)
    }
    // flood guard high enough to drop nothing -> identical result
    val capped = Relational
      .editDistanceJoin(strs, "id", "s", maxDist = 2, maxGramFreq = 100)
      .count()
    val uncapped = Relational
      .editDistanceJoin(strs, "id", "s", maxDist = 2).count()
    assert(capped == uncapped)
    intercept[graft.exceptions.InvalidArgumentValue] {
      Relational.editDistanceJoin(strs, "id", "s", maxDist = 0)
    }
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second batch of relational operators (SURVEY.md §2.4): windows,
  * grouping sets, set ops, semi/anti joins, subqueries, outer joins.
  * All delegated-to-Athena capabilities in the reference, native
  * Catalyst plans here.
  */
object QueriesRelational2 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(spark, dir, name)

  /** q08 — ranking window: top-3 orders per market segment.
    * Partial ranking is shuffle-bounded by segment cardinality (5), so
    * at 100 TB the win is filtering rank<=3 BEFORE any later join.
    */
  def q08WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .join(broadcast(t(spark, dir, "customer")),
            col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("c_mktsegment"), col("rnk").cast("long").as("rnk"),
              col("o_orderkey"), round(col("o_totalprice"), 2).as("total"))
      .orderBy("c_mktsegment", "rnk")
  }

  /** q09 — running aggregate + lag over event streams per user.
    * Explicit ROWS frame on both sides (default RANGE differs on ties).
    */
  def q09WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .withColumn("running_value", round(sum("value").over(wf), 2))
      .withColumn("prev_value", lag("value", 1).over(w))
      .select(col("user_id"), col("event_id"), col("running_value"),
              col("prev_value"))
      .orderBy("user_id", "event_id")
  }

  /** q10 — ROLLUP: hierarchical subtotals (status -> priority). */
  def q10Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
           round(sum("o_totalprice"), 2).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
              coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
              col("n"), col("total"))
      .orderBy("status", "priority")

  /** q11 — CUBE over nation x segment via a broadcast dim chain. */
  def q11Cube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment"), col("c_acctbal"))
      .cube(col("n_name").as("nation"), col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"),
           round(avg("c_acctbal"), 4).as("avg_bal"))
      .na.fill("ALL", Seq("nation", "segment"))
      .orderBy("nation", "segment")

  /** q12 — set operations: INTERSECT / EXCEPT (distinct semantics). */
  def q12SetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val y94 = o.filter(year(col("o_orderdate")) === 1994).select("o_custkey")
    val y95 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
    val both = y94.intersect(y95).agg(count(lit(1)).as("cnt"))
      .select(lit("both_94_95").as("cohort"), col("cnt"))
    val only94 = y94.except(y95).agg(count(lit(1)).as("cnt"))
      .select(lit("only_94").as("cohort"), col("cnt"))
    val union = y94.union(y95).distinct().agg(count(lit(1)).as("cnt"))
      .select(lit("union_94_95").as("cohort"), col("cnt"))
    both.unionByName(only94).unionByName(union).orderBy("cohort")
  }

  /** q13 — left-semi / left-anti joins (EXISTS / NOT EXISTS shape). */
  def q13SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("cnt")).select(lit("with_orders").as("grp"), col("cnt"))
    val noOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("cnt")).select(lit("no_orders").as("grp"), col("cnt"))
    withOrders.unionByName(noOrders).orderBy("grp")
  }

  /** q14 — correlated EXISTS + scalar subquery through spark.sql (the
    * engine's Athena-equivalent SQL entry point).
    */
  def q14SqlSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    graft.sql.Sql.readSqlQuery(spark, """
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS big_spenders
      FROM customer
      WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_totalprice > (SELECT avg(o_totalprice) FROM orders))
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""").df
  }

  /** q15 — left outer join with null-side aggregation: order counts per
    * customer including zero-order customers, histogrammed.
    */
  def q15OuterJoin(spark: SparkSession, dir: String): DataFrame = {
    // aggregate-pushdown: pre-aggregate orders per custkey BEFORE the
    // join so the shuffle carries one row per customer, not the full
    // fact table (null-extension via left join + coalesce(0) preserves
    // zero-order customers exactly as count(o_orderkey) would)
    val c = t(spark, dir, "customer")
    val perCust = t(spark, dir, "orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
    c.join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("cnt"), lit(0L)).as("n_orders"))
      .groupBy("n_orders")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("n_orders")
  }

  /** q16 — conditional aggregation + HAVING. */
  def q16CaseHaving(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(sum(when(col("l_discount") > 0.05,
                       col("l_extendedprice") * col("l_discount"))
                  .otherwise(0.0)), 2).as("hi_disc_revenue"),
        sum(when(col("l_quantity") >= 25, 1L).otherwise(0L)).as("bulk_lines"),
        count(lit(1)).as("n"))
      .filter(col("n") > 100)
      .orderBy("l_returnflag")

  /** q17 — date functions: monthly revenue time series. */
  def q17DateFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(round(sum("o_totalprice"), 2).as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy("month")

  /** q18 — IN-list + BETWEEN + LIKE predicate mix. */
  def q18PredicateMix(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
              col("p_size").between(5, 25) &&
              col("p_type").like("%R%"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
           round(avg("p_retailprice"), 4).as("avg_price"))
      .orderBy("p_brand")

  /** q19 — full outer join + coalesced keys (supplier/customer nations). */
  def q19FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val cn = t(spark, dir, "customer").groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"))
    val sn = t(spark, dir, "supplier").groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_supp"))
    cn.join(sn, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).cast("long").as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  /** q20 — quartile distribution buckets. A naive `ntile(4) OVER
    * (ORDER BY …)` collapses the whole table to ONE partition (Spark
    * warns and OOMs at scale); `Relational.ntileBucketed` keeps the
    * exact ntile semantics on a range-partitioned distributed plan.
    */
  def q20Ntile(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Relational
      .ntileBucketed(
        t(spark, dir, "orders").select("o_orderkey", "o_totalprice"),
        4, Seq(col("o_totalprice").asc, col("o_orderkey").asc), "quartile")
      .groupBy("quartile")
      .agg(count(lit(1)).as("n"),
           round(min("o_totalprice"), 2).as("min_price"),
           round(max("o_totalprice"), 2).as("max_price"))
      .orderBy("quartile")

  /** q43 — JSON column processing (the reference delegates
    * json_extract to Athena; native here): `from_json` with an
    * explicit schema parses each row ONCE into a typed struct —
    * `get_json_object` re-parses the document per call, which at N
    * extracted fields costs N parses per row.
    */
  def q43JsonExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      // k as STRING then cast — mirrors the oracle's
      // json_extract_string→CAST and tolerates "12" vs 12 encodings
      .withColumn("k",
        from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k STRING"))
          .getField("k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           sum("k").as("sum_k"),
           round(avg("k"), 4).as("avg_k"))
      .orderBy("event_type")

  /** q44 — explode/UNNEST (Generator path): token frequencies across
    * documents, top 10 with deterministic tiebreak.
    */
  def q44ExplodeTokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(10)

  /** q45 — regexp functions: extract the numeric brand suffix and
    * aggregate over it.
    */
  def q45Regexp(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .withColumn("brand_num",
        regexp_extract(col("p_brand"), "(\\d+)$", 1).cast("long"))
      .filter(col("p_name").rlike("^[a-z]"))
      .groupBy("brand_num")
      .agg(count(lit(1)).as("n"),
           round(avg("p_retailprice"), 4).as("avg_price"))
      .orderBy("brand_num")

  /** q50 — backward as-of join (point-in-time): every non-purchase
    * event picks up the same user's most recent purchase at-or-before
    * its timestamp. `Relational.asOfJoin` is the union+window form —
    * one shuffle on user_id, no per-row lookups, no pair explosion —
    * an operator Spark lacks natively (DuckDB's ASOF JOIN is the
    * oracle).
    */
  def q50AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    val others = ev.filter(col("event_type") =!= "purchase")
      .select("event_id", "user_id", "ts", "event_type", "value")
    graft.operators.Relational
      .asOfJoin(others, purchases, Seq("user_id"), "ts", "p_ts")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           count(col("p_value")).as("n_matched"),
           round(avg(col("value") - col("p_value")), 4).as("avg_delta"))
      .orderBy("event_type")
  }

  /** q51 — interval/range join via bin bucketing: order totals matched
    * to (overlapping) price bands. A raw BETWEEN join plans as a
    * nested-loop cross product; `Relational.rangeJoin` bins the domain
    * so Catalyst gets an equi-join.
    */
  def q51RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      (1L, 0.0, 1000.0),
      (2L, 1000.0, 50000.0),
      (3L, 30000.0, 150000.0), // overlaps band 2 on [30k, 50k)
      (4L, 150000.0, 600000.0)).toDF("band_id", "lo", "hi")
    graft.operators.Relational.rangeJoin(
        t(spark, dir, "orders").select("o_orderkey", "o_totalprice"),
        bands, "o_totalprice", "lo", "hi", binWidth = 10000.0)
      .groupBy("band_id")
      .agg(count(lit(1)).as("n"),
           round(sum("o_totalprice"), 2).as("total"))
      .orderBy("band_id")
  }

  /** q78 — gap-based sessionization: per-user sessions break on >4 h
    * inactivity (`Relational.sessionize`), then session-level stats.
    * Epoch seconds (not timestamp strings) cross the oracle boundary —
    * sub-second formatting differs between engines, integer seconds
    * don't. The session numbering is a total order (ts, event_id), so
    * the grouping is deterministic.
    */
  def q78Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val sessions = graft.operators.Relational.sessionize(
      t(spark, dir, "events"), "user_id", "ts",
      gapSeconds = 14400, tiebreak = Seq("event_id"))
    sessions
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
           min("sec").as("start_sec"), max("sec").as("end_sec"),
           (max("sec") - min("sec")).as("dur_sec"),
           round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** q85 — pivot (long→wide conditional aggregation): daily sum of
    * `value` per event_type as columns. The pivot values are pinned
    * explicitly, which skips the driver-side distinct-scan job Spark
    * otherwise runs before planning — the scale-correct form.
    */
  def q85PivotEvents(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(round(sum("value"), 6))
      .orderBy("day")

  /** q86 — hourly resample with gap fill: every (user, hour) bucket
    * between each user's first and last event, zeros where no events
    * landed. chunk=1000 exercises the bounded-memory chunked grid.
    */
  def q86GapFill(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Relational.resampleGapFill(
        t(spark, dir, "events"), "user_id", "ts", "value",
        bucketSeconds = 3600, chunk = 1000)
      .orderBy("user_id", "bucket")

  /** q88 — numeric profiling (the pandas `describe()` surface): all
    * four lineitem measures summarized in ONE aggregation pass.
    */
  def q88Profile(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.profileNumeric(t(spark, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy("column")

  /** q89 — pairwise Pearson correlation, all 6 pairs in one pass. */
  def q89Correlation(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.correlationMatrix(t(spark, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy("col_a", "col_b")

  /** q91 — edit-distance fuzzy join (entity matching) on a corpus
    * with PLANTED typos: the first 300 part names plus copies with
    * their 6th character deleted (re-keyed +100000). The q-gram
    * count-filtered join must recover every planted pair and any
    * true near-matches among the originals — the oracle replays
    * all-pairs `levenshtein` on the same constructed corpus.
    */
  def q91FuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "part").filter(col("p_partkey") <= 300)
      .select(col("p_partkey").as("id"), col("p_name").as("s"))
    val typos = base.select((col("id") + 100000).as("id"),
      expr("concat(substring(s, 1, 5), substring(s, 7))").as("s"))
    graft.operators.Relational
      .editDistanceJoin(base.unionByName(typos), "id", "s", maxDist = 1)
      .orderBy("id_a", "id_b")
  }

  /** q92 — fixed-width histogram of l_extendedprice in 20 buckets
    * between the global min and max: one bounds scan, one
    * partial-aggregated counting scan, a dense driver-sized spine.
    */
  def q92Histogram(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.histogram(
        t(spark, dir, "lineitem"), "l_extendedprice", 20)
      .orderBy("bucket")

  /** q94 — trailing 1-hour event-time window per user: count and
    * value sum at each event's decision time. ONE keyed RANGE window
    * over epoch micros — never a time-range self-join.
    */
  def q94RollingWindow(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Behavioral.rollingWindow(
        t(spark, dir, "events"), "user_id", "ts", "value", 3600L)
      .select(col("event_id"), col("user_id"), col("n_window"),
        round(col("sum_window"), 2).as("sum_window"))
      .orderBy("event_id")

  /** q95 — weekly cohort retention matrix: users by first-event week,
    * distinct-active counts k weeks on. Two linear aggregations + one
    * key join; |cohorts|·maxWeeks result rows.
    */
  def q95CohortRetention(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Behavioral.cohortRetention(
        t(spark, dir, "events"), "user_id", "ts", maxWeeks = 8)
      .orderBy("cohort_week", "k_weeks")

  /** q96 — ordered funnel view → click → purchase with earliest-
    * completion semantics: one conditional-min pass per stage, one
    * 1-row final count, fully lazy.
    */
  def q96Funnel(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Behavioral.funnel(
        t(spark, dir, "events"), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("stage_idx")

  /** q98 — per-returnflag winsorization of l_quantity at [p05, p95]:
    * exact interpolated group bounds joined back to the scan; the
    * outlier clip run before any mean-based metric.
    */
  def q98Winsorize(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.winsorize(
        t(spark, dir, "lineitem"), "l_returnflag", "l_quantity",
        0.05, 0.95)
      .select(col("l_orderkey"), col("l_linenumber").cast("long")
          .as("l_linenumber"), col("l_returnflag"),
        col("l_quantity").cast("double").as("l_quantity"),
        col("lo_bound"), col("hi_bound"), col("clipped"))
      .orderBy("l_orderkey", "l_linenumber")

  /** q100 — keyed snapshot diff between two deterministic "versions"
    * of orders (old = keys ∤ 7; new = keys ∤ 5 with prices DOUBLED on
    * keys ÷ 3 — ×2 is exact in binary, so neither engine rounds):
    * one full outer join, null-safe compare, unchanged keys dropped.
    */
  def q100SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
      .select(col("o_orderkey"),
        col("o_totalprice").cast("double").as("o_totalprice"),
        col("o_orderstatus"))
    val oldSnap = orders.filter(col("o_orderkey") % 7 =!= 0)
    val newSnap = orders.filter(col("o_orderkey") % 5 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 3 === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
    graft.operators.Relational.snapshotDiff(oldSnap, newSnap,
        Seq("o_orderkey"), Seq("o_totalprice", "o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** q101 — first-order event-type transition matrix: one keyed
    * window for adjacency (ts, event_id total order), |types|²
    * result with conditional probabilities.
    */
  def q101Transitions(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Behavioral.transitionMatrix(
        t(spark, dir, "events"), "user_id", "ts", "event_type",
        "event_id")
      .orderBy("from_type", "to_type")

  /** q102 — HLL cardinality profile. RETIRED from the registry in
    * round 11 (kept as a callable: PlanSpec pins the constant-size
    * sketch shuffle, BehavioralSpec the 10%-band-vs-exact contract):
    * sketches legitimately differ across engines so the registry row
    * could only ever be rows-only, and q108 — the exact-distinct twin
    * with the same melt/group/join shape — carries the profile logic
    * through the hash-checked gate. The shuffle carries constant-size
    * registers per (group, column) — the only cardinality profile
    * that survives 100 TB.
    */
  def q102ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.approxDistinctProfile(
        t(spark, dir, "lineitem"), "l_returnflag",
        Seq("l_orderkey", "l_partkey", "l_shipdate"))
      .orderBy("grp", "column")

  /** q104 — key-skew report over lineitem's supplier key: the
    * pre-salting diagnostic. One (key → count) pass, percentile
    * summary + top-10 heavy keys.
    */
  def q104SkewReport(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.skewReport(
        t(spark, dir, "lineitem"), Seq("l_suppkey"), topK = 10)
      .orderBy(col("kind"), col("n_rows").desc, col("key"))

  /** q105 — per-user inter-arrival cadence: one keyed lag window +
    * per-entity percentile aggregate.
    */
  def q105InterArrival(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Behavioral.interArrivalStats(
        t(spark, dir, "events"), "user_id", "ts", "event_id")
      .orderBy("user_id")

  /** q108 — the EXACT distinct profile: same melt/group/join shape
    * as q102's HLL profile but with true count(DISTINCT), giving the
    * profile logic a replayable oracle hash (q102 itself stays
    * rows-only by the sketch convention).
    */
  def q108DistinctExact(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.distinctProfile(
        t(spark, dir, "lineitem"), "l_returnflag",
        Seq("l_orderkey", "l_partkey", "l_shipdate"))
      .orderBy("grp", "column")

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q08_window_rank"    -> (q08WindowRank _),
    "q09_window_running" -> (q09WindowRunning _),
    "q10_rollup"         -> (q10Rollup _),
    "q11_cube"           -> (q11Cube _),
    "q12_setops"         -> (q12SetOps _),
    "q13_semi_anti"      -> (q13SemiAnti _),
    "q14_sql_subquery"   -> (q14SqlSubquery _),
    "q15_outer_join"     -> (q15OuterJoin _),
    "q16_case_having"    -> (q16CaseHaving _),
    "q17_date_fns"       -> (q17DateFns _),
    "q18_predicate_mix"  -> (q18PredicateMix _),
    "q19_full_outer"     -> (q19FullOuter _),
    "q20_ntile"          -> (q20Ntile _),
    "q43_json_extract"   -> (q43JsonExtract _),
    "q44_explode_tokens" -> (q44ExplodeTokens _),
    "q45_regexp"         -> (q45Regexp _),
    "q50_asof_join"      -> (q50AsofJoin _),
    "q51_range_join"     -> (q51RangeJoin _),
    "q78_sessionize"     -> (q78Sessionize _),
    "q85_pivot_events"   -> (q85PivotEvents _),
    "q86_gap_fill"       -> (q86GapFill _),
    "q88_profile"        -> (q88Profile _),
    "q89_correlation"    -> (q89Correlation _),
    "q91_fuzzy_join"     -> (q91FuzzyJoin _),
    "q92_histogram"      -> (q92Histogram _),
    "q94_rolling_window" -> (q94RollingWindow _),
    "q95_cohort_retention" -> (q95CohortRetention _),
    "q96_funnel"         -> (q96Funnel _),
    "q98_winsorize"      -> (q98Winsorize _),
    "q100_snapshot_diff" -> (q100SnapshotDiff _),
    "q101_transitions"   -> (q101Transitions _),
    "q104_skew_report"   -> (q104SkewReport _),
    "q105_inter_arrival" -> (q105InterArrival _),
    "q108_distinct_exact" -> (q108DistinctExact _))

  val oracles: Map[String, String] = Map(
    "q08_window_rank" ->
      """SELECT c_mktsegment, CAST(rnk AS BIGINT) AS rnk, o_orderkey,
                round(o_totalprice, 2) AS total
         FROM (
           SELECT c_mktsegment, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY c_mktsegment
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
           FROM orders JOIN customer ON o_custkey = c_custkey)
         WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""",
    "q09_window_running" ->
      """SELECT user_id, event_id,
                round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                  AS running_value,
                lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id)
                  AS prev_value
         FROM events ORDER BY user_id, event_id""",
    "q10_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
                coalesce(o_orderpriority, 'ALL') AS priority,
                count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY status, priority""",
    "q11_cube" ->
      """SELECT coalesce(n_name, 'ALL') AS nation,
                coalesce(c_mktsegment, 'ALL') AS segment,
                count(*) AS n, round(avg(c_acctbal), 4) AS avg_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY CUBE (n_name, c_mktsegment)
         ORDER BY nation, segment""",
    "q12_setops" ->
      """WITH y94 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1994),
              y95 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995)
         SELECT 'both_94_95' AS cohort,
                (SELECT count(*) FROM (SELECT * FROM y94 INTERSECT SELECT * FROM y95)) AS cnt
         UNION ALL
         SELECT 'only_94',
                (SELECT count(*) FROM (SELECT * FROM y94 EXCEPT SELECT * FROM y95))
         UNION ALL
         SELECT 'union_94_95',
                (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM
                  (SELECT * FROM y94 UNION ALL SELECT * FROM y95)))
         ORDER BY cohort""",
    "q13_semi_anti" ->
      """SELECT 'with_orders' AS grp, count(*) AS cnt FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         UNION ALL
         SELECT 'no_orders', count(*) FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY grp""",
    "q14_sql_subquery" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS big_spenders
         FROM customer
         WHERE EXISTS (
           SELECT 1 FROM orders
           WHERE o_custkey = c_custkey
             AND o_totalprice > (SELECT avg(o_totalprice) FROM orders))
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q15_outer_join" ->
      """SELECT n_orders, count(*) AS n_customers FROM (
           SELECT c_custkey, count(o_orderkey) AS n_orders
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           GROUP BY c_custkey)
         GROUP BY n_orders ORDER BY n_orders""",
    "q16_case_having" ->
      """SELECT l_returnflag,
                round(sum(CASE WHEN l_discount > 0.05
                          THEN l_extendedprice * l_discount ELSE 0.0 END), 2)
                  AS hi_disc_revenue,
                CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT)
                  AS bulk_lines,
                count(*) AS n
         FROM lineitem GROUP BY l_returnflag
         HAVING count(*) > 100 ORDER BY l_returnflag""",
    "q17_date_fns" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                round(sum(o_totalprice), 2) AS revenue,
                count(*) AS n_orders
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q18_predicate_mix" ->
      """SELECT p_brand, count(*) AS n, round(avg(p_retailprice), 4) AS avg_price
         FROM part
         WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
           AND p_size BETWEEN 5 AND 25
           AND p_type LIKE '%R%'
         GROUP BY p_brand ORDER BY p_brand""",
    "q19_full_outer" ->
      """SELECT CAST(coalesce(c_nationkey, s_nationkey) AS BIGINT) AS nationkey,
                coalesce(n_cust, 0) AS n_cust,
                coalesce(n_supp, 0) AS n_supp
         FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1) cn
         FULL OUTER JOIN
              (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1) sn
         ON c_nationkey = s_nationkey
         ORDER BY nationkey""",
    "q20_ntile" ->
      """SELECT quartile, count(*) AS n,
                round(min(o_totalprice), 2) AS min_price,
                round(max(o_totalprice), 2) AS max_price
         FROM (SELECT o_totalprice,
                      CAST(ntile(4) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC)
                           AS BIGINT) AS quartile
               FROM orders)
         GROUP BY quartile ORDER BY quartile""",
    "q43_json_extract" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                     AS BIGINT) AS sum_k,
                round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)),
                      4) AS avg_k
         FROM events GROUP BY 1 ORDER BY 1""",
    "q44_explode_tokens" ->
      """SELECT token, count(*) AS n
         FROM (SELECT unnest(string_split_regex(lower(text), '\s+'))
                 AS token FROM documents)
         GROUP BY token ORDER BY n DESC, token ASC LIMIT 10""",
    "q45_regexp" ->
      """SELECT CAST(regexp_extract(p_brand, '(\d+)$', 1) AS BIGINT)
                  AS brand_num,
                count(*) AS n,
                round(avg(p_retailprice), 4) AS avg_price
         FROM part
         WHERE regexp_matches(p_name, '^[a-z]')
         GROUP BY 1 ORDER BY 1""",
    "q50_asof_join" ->
      """SELECT l.event_type, count(*) AS n,
                count(r.p_value) AS n_matched,
                round(avg(l.value - r.p_value), 4) AS avg_delta
         FROM (SELECT * FROM events WHERE event_type <> 'purchase') l
         ASOF LEFT JOIN (SELECT user_id, ts AS p_ts, value AS p_value
                         FROM events WHERE event_type = 'purchase') r
           ON l.user_id = r.user_id AND l.ts >= r.p_ts
         GROUP BY 1 ORDER BY 1""",
    "q51_range_join" ->
      """SELECT CAST(band_id AS BIGINT) AS band_id, count(*) AS n,
                round(sum(o_totalprice), 2) AS total
         FROM orders
         JOIN (VALUES (1, 0.0, 1000.0), (2, 1000.0, 50000.0),
                      (3, 30000.0, 150000.0), (4, 150000.0, 600000.0))
              b(band_id, lo, hi)
           ON o_totalprice >= lo AND o_totalprice < hi
         GROUP BY 1 ORDER BY 1""",
    "q78_sessionize" ->
      """WITH o AS (
           SELECT user_id, event_id, value, ts,
                  CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                  lag(ts) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS prev
           FROM events),
         b AS (SELECT *, CASE WHEN prev IS NULL OR
                      CAST(floor(epoch(ts)) AS BIGINT)
                        - CAST(floor(epoch(prev)) AS BIGINT) > 14400
                    THEN 1 ELSE 0 END AS brk
               FROM o),
         s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS session_id
               FROM b)
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                count(*) AS n_events,
                min(sec) AS start_sec, max(sec) AS end_sec,
                max(sec) - min(sec) AS dur_sec,
                round(sum(value), 2) AS sum_value
         FROM s GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",
    "q85_pivot_events" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                round(sum(CASE WHEN event_type = 'click'
                          THEN value END), 6) AS click,
                round(sum(CASE WHEN event_type = 'error'
                          THEN value END), 6) AS error,
                round(sum(CASE WHEN event_type = 'purchase'
                          THEN value END), 6) AS purchase,
                round(sum(CASE WHEN event_type = 'signup'
                          THEN value END), 6) AS signup,
                round(sum(CASE WHEN event_type = 'view'
                          THEN value END), 6) AS view
         FROM events GROUP BY 1 ORDER BY 1""",
    "q86_gap_fill" ->
      """WITH e AS (SELECT user_id,
                CAST(floor(epoch(ts)/3600) AS BIGINT) AS b, value
              FROM events),
         agg AS (SELECT user_id, b, count(*) AS n,
                        round(sum(value), 6) AS sv
                 FROM e GROUP BY 1, 2),
         span AS (SELECT user_id, min(b) AS b0, max(b) AS b1
                  FROM e GROUP BY 1),
         grid AS (SELECT user_id, unnest(generate_series(b0, b1)) AS b
                  FROM span)
         SELECT g.user_id, g.b AS bucket,
                COALESCE(a.n, 0) AS n_events,
                COALESCE(a.sv, 0.0) AS sum_value
         FROM grid g LEFT JOIN agg a USING (user_id, b)
         ORDER BY user_id, bucket""",
    "q88_profile" ->
      """SELECT * FROM (
         SELECT 'l_quantity' AS "column", count(l_quantity) AS n_nonnull,
                count(*) - count(l_quantity) AS n_null,
                round(avg(l_quantity), 6) AS mean,
                round(stddev_samp(l_quantity), 6) AS sd,
                round(CAST(min(l_quantity) AS DOUBLE), 6) AS min,
                round(CAST(max(l_quantity) AS DOUBLE), 6) AS max,
                round(quantile_cont(l_quantity, 0.5), 6) AS median
         FROM lineitem
         UNION ALL
         SELECT 'l_extendedprice' AS "column", count(l_extendedprice) AS n_nonnull,
                count(*) - count(l_extendedprice) AS n_null,
                round(avg(l_extendedprice), 6) AS mean,
                round(stddev_samp(l_extendedprice), 6) AS sd,
                round(CAST(min(l_extendedprice) AS DOUBLE), 6) AS min,
                round(CAST(max(l_extendedprice) AS DOUBLE), 6) AS max,
                round(quantile_cont(l_extendedprice, 0.5), 6) AS median
         FROM lineitem
         UNION ALL
         SELECT 'l_discount' AS "column", count(l_discount) AS n_nonnull,
                count(*) - count(l_discount) AS n_null,
                round(avg(l_discount), 6) AS mean,
                round(stddev_samp(l_discount), 6) AS sd,
                round(CAST(min(l_discount) AS DOUBLE), 6) AS min,
                round(CAST(max(l_discount) AS DOUBLE), 6) AS max,
                round(quantile_cont(l_discount, 0.5), 6) AS median
         FROM lineitem
         UNION ALL
         SELECT 'l_tax' AS "column", count(l_tax) AS n_nonnull,
                count(*) - count(l_tax) AS n_null,
                round(avg(l_tax), 6) AS mean,
                round(stddev_samp(l_tax), 6) AS sd,
                round(CAST(min(l_tax) AS DOUBLE), 6) AS min,
                round(CAST(max(l_tax) AS DOUBLE), 6) AS max,
                round(quantile_cont(l_tax, 0.5), 6) AS median
         FROM lineitem) ORDER BY "column"""",
    "q89_correlation" ->
      """SELECT * FROM (
         SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
                round(corr(l_quantity, l_extendedprice), 6) AS corr FROM lineitem
         UNION ALL
         SELECT 'l_quantity' AS col_a, 'l_discount' AS col_b,
                round(corr(l_quantity, l_discount), 6) AS corr FROM lineitem
         UNION ALL
         SELECT 'l_quantity' AS col_a, 'l_tax' AS col_b,
                round(corr(l_quantity, l_tax), 6) AS corr FROM lineitem
         UNION ALL
         SELECT 'l_extendedprice' AS col_a, 'l_discount' AS col_b,
                round(corr(l_extendedprice, l_discount), 6) AS corr FROM lineitem
         UNION ALL
         SELECT 'l_extendedprice' AS col_a, 'l_tax' AS col_b,
                round(corr(l_extendedprice, l_tax), 6) AS corr FROM lineitem
         UNION ALL
         SELECT 'l_discount' AS col_a, 'l_tax' AS col_b,
                round(corr(l_discount, l_tax), 6) AS corr FROM lineitem) ORDER BY col_a, col_b""",
    // q91: the oracle is the ALL-PAIRS answer on the same constructed
    // corpus — the q-gram count filter must lose nothing
    "q91_fuzzy_join" ->
      """WITH base AS (SELECT p_partkey AS id, p_name AS s
              FROM part WHERE p_partkey <= 300),
         typos AS (SELECT id + 100000 AS id,
                     substr(s, 1, 5) || substr(s, 7) AS s FROM base),
         c AS (SELECT * FROM base UNION ALL SELECT * FROM typos)
         SELECT a.id AS id_a, b.id AS id_b, a.s AS str_a, b.s AS str_b,
                CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
         FROM c a JOIN c b ON a.id < b.id
         WHERE levenshtein(a.s, b.s) <= 1
         ORDER BY id_a, id_b""",
    // q92: the same floor((x-lo)/w) formula over the same doubles —
    // bucket assignment is bit-reproducible across engines
    "q92_histogram" ->
      """WITH b AS (SELECT CAST(min(l_extendedprice) AS DOUBLE) AS blo,
                      CAST(max(l_extendedprice) AS DOUBLE) AS bhi
                    FROM lineitem),
         x AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x
               FROM lineitem WHERE l_extendedprice IS NOT NULL),
         cnt AS (SELECT CASE WHEN bhi = blo THEN 0
                   ELSE CAST(least(floor((x - blo) / ((bhi - blo) / 20)),
                        19) AS BIGINT) END AS bucket,
                   count(*) AS n
                 FROM x, b GROUP BY 1),
         spine AS (SELECT unnest(generate_series(0, 19)) AS bucket)
         SELECT s.bucket, round(blo + s.bucket * (bhi - blo) / 20, 6) AS lo,
                round(blo + (s.bucket + 1) * (bhi - blo) / 20, 6) AS hi,
                COALESCE(c.n, 0) AS n
         FROM spine s CROSS JOIN b LEFT JOIN cnt c USING (bucket)
         ORDER BY bucket""",
    // q94: RANGE frame over epoch micros — integer-offset replay of
    // INTERVAL 1 HOUR PRECEDING, inclusive both ends on both engines
    "q94_rolling_window" ->
      """SELECT event_id, user_id,
                count(*) OVER w AS n_window,
                round(sum(value) OVER w, 2) AS sum_window
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    // q95: Monday-started weeks on both engines (date_trunc 'week');
    // week deltas are exact multiples of 7 days, so the division is
    // integral by construction
    "q95_cohort_retention" ->
      """WITH fw AS (SELECT user_id,
                CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
              FROM events GROUP BY 1),
         aw AS (SELECT DISTINCT user_id,
                CAST(date_trunc('week', ts) AS DATE) AS aweek
              FROM events)
         SELECT cohort_week,
                CAST(datediff('day', cohort_week, aweek) / 7 AS BIGINT)
                  AS k_weeks,
                count(DISTINCT a.user_id) AS n_active
         FROM aw a JOIN fw f USING (user_id)
         WHERE datediff('day', cohort_week, aweek) / 7 BETWEEN 0 AND 8
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // q96: earliest-completion funnel — stage i+1's time is the min
    // event of its type strictly after stage i's time
    "q96_funnel" ->
      """WITH t0 AS (SELECT user_id, min(ts) AS t FROM events
                     WHERE event_type = 'view' GROUP BY 1),
         t1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                JOIN t0 ON e.user_id = t0.user_id AND e.ts > t0.t
                WHERE e.event_type = 'click' GROUP BY 1),
         t2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t
                WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT * FROM (VALUES
           (CAST(0 AS BIGINT), 'view',
            (SELECT count(*) FROM t0)),
           (CAST(1 AS BIGINT), 'click',
            (SELECT count(*) FROM t1)),
           (CAST(2 AS BIGINT), 'purchase',
            (SELECT count(*) FROM t2)))
           AS v(stage_idx, stage, n_entities)
         ORDER BY stage_idx""",
    // q98: quantile_cont == Spark percentile (continuous
    // interpolation), clip replayed with the same least/greatest
    "q98_winsorize" ->
      """WITH b AS (SELECT l_returnflag,
                round(quantile_cont(l_quantity, 0.05), 6) AS lo_bound,
                round(quantile_cont(l_quantity, 0.95), 6) AS hi_bound
              FROM lineitem GROUP BY 1)
         SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT)
                  AS l_linenumber, l.l_returnflag,
                CAST(l.l_quantity AS DOUBLE) AS l_quantity,
                b.lo_bound, b.hi_bound,
                round(least(greatest(CAST(l.l_quantity AS DOUBLE),
                  b.lo_bound), b.hi_bound), 6) AS clipped
         FROM lineitem l JOIN b USING (l_returnflag)
         ORDER BY l.l_orderkey, l.l_linenumber""",
    // q100: the same two snapshot constructions, then a full outer
    // join with IS DISTINCT FROM (the null-safe compare) — unchanged
    // keys classify to NULL and drop
    "q100_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey,
                CAST(o_totalprice AS DOUBLE) AS p, o_orderstatus
              FROM orders WHERE o_orderkey % 7 <> 0),
         n AS (SELECT o_orderkey,
                CASE WHEN o_orderkey % 3 = 0
                     THEN CAST(o_totalprice AS DOUBLE) * 2
                     ELSE CAST(o_totalprice AS DOUBLE) END AS p,
                o_orderstatus
              FROM orders WHERE o_orderkey % 5 <> 0),
         d AS (SELECT COALESCE(o.o_orderkey, n.o_orderkey)
                  AS o_orderkey,
                CASE WHEN o.o_orderkey IS NULL THEN 'added'
                     WHEN n.o_orderkey IS NULL THEN 'removed'
                     WHEN o.p IS DISTINCT FROM n.p
                       OR o.o_orderstatus IS DISTINCT FROM
                          n.o_orderstatus THEN 'changed'
                END AS change_type,
                o.p AS o_totalprice_old, n.p AS o_totalprice_new,
                o.o_orderstatus AS o_orderstatus_old,
                n.o_orderstatus AS o_orderstatus_new
              FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
         SELECT * FROM d WHERE change_type IS NOT NULL
         ORDER BY o_orderkey""",
    // q101: lead over the same (ts, event_id) total order, then the
    // conditional-probability join
    "q101_transitions" ->
      """WITH s AS (SELECT event_type AS from_type,
                lead(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS to_type
              FROM events),
         c AS (SELECT from_type, to_type, count(*) AS n
               FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2),
         t AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY 1)
         SELECT c.from_type, c.to_type, c.n,
                round(c.n * 1.0 / t.tot, 6) AS p
         FROM c JOIN t USING (from_type)
         ORDER BY c.from_type, c.to_type""",
    // q104: the same (key → count) pass, quantile_cont summary, and
    // deterministic (n desc, key asc) top-10
    "q104_skew_report" ->
      """WITH c AS (SELECT CAST(l_suppkey AS VARCHAR) AS key,
                count(*) AS n
              FROM lineitem GROUP BY 1),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS total_rows,
                 max(n) AS mx, avg(n) AS mean,
                 quantile_cont(n, 0.5) AS p50,
                 quantile_cont(n, 0.9) AS p90,
                 quantile_cont(n, 0.99) AS p99
               FROM c),
         s AS (SELECT 'summary' AS kind, '*' AS key,
                 total_rows AS n_rows, 1.0 AS share,
                 round(p50, 6) AS metric_p50,
                 round(p90, 6) AS metric_p90,
                 round(p99, 6) AS metric_p99,
                 round(mx / mean, 6) AS skew
               FROM t),
         h AS (SELECT 'heavy_key' AS kind, key, n AS n_rows,
                 round(n * 1.0 / t.total_rows, 6) AS share,
                 CAST(NULL AS DOUBLE) AS metric_p50,
                 CAST(NULL AS DOUBLE) AS metric_p90,
                 CAST(NULL AS DOUBLE) AS metric_p99,
                 CAST(NULL AS DOUBLE) AS skew
               FROM c, t ORDER BY n DESC, key ASC LIMIT 10)
         SELECT * FROM (SELECT * FROM s UNION ALL SELECT * FROM h)
         ORDER BY kind, n_rows DESC, key""",
    // q105: lag over the same (epoch micros, event_id) order; the
    // quantile runs over INTEGER microsecond gaps (int64 midpoints are
    // exact in double), is rounded half-up to integer µs via
    // floor(x+0.5) — IEEE-exact, engine-independent, unlike decimal
    // round() which breaks the frequent x.5 µs ties differently per
    // engine — and only then divided to seconds, matching the Spark
    // side bit-for-bit
    "q105_inter_arrival" ->
      """WITH s AS (SELECT user_id, epoch_us(ts) AS e, event_id
              FROM events),
         g AS (SELECT user_id,
                 e - lag(e) OVER (PARTITION BY user_id
                    ORDER BY e, event_id) AS gap_us
               FROM s)
         SELECT user_id, count(*) AS n_events,
                count(gap_us) AS n_gaps,
                floor(quantile_cont(gap_us, 0.5) + 0.5) / 1e6 AS p50_gap_s,
                floor(quantile_cont(gap_us, 0.9) + 0.5) / 1e6 AS p90_gap_s,
                max(gap_us) / 1e6 AS max_gap_s
         FROM g GROUP BY 1 ORDER BY user_id""",
    // q108: per-group exact distinct counts, one UNION ALL branch per
    // profiled column, joined to the shared per-group row count
    "q108_distinct_exact" ->
      """WITH n AS (SELECT l_returnflag AS grp, count(*) AS n_rows
              FROM lineitem GROUP BY 1),
         d AS (
           SELECT l_returnflag AS grp, 'l_orderkey' AS "column",
                  count(DISTINCT l_orderkey) AS n_distinct
           FROM lineitem GROUP BY 1
           UNION ALL
           SELECT l_returnflag, 'l_partkey',
                  count(DISTINCT l_partkey)
           FROM lineitem GROUP BY 1
           UNION ALL
           SELECT l_returnflag, 'l_shipdate',
                  count(DISTINCT l_shipdate)
           FROM lineitem GROUP BY 1)
         SELECT d.grp, d."column", n.n_rows, d.n_distinct
         FROM d JOIN n USING (grp)
         ORDER BY grp, "column"""")
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The operator inventory (SURVEY.md §2) as runnable queries over the
  * driver testdata, each paired with DuckDB oracle SQL in `oracles`.
  *
  * DataFrame-first: plans are declared with the Dataset API so Catalyst
  * owns pushdown/pruning/join selection; `broadcast()` hints mark the
  * dimension sides that must never shuffle at 100 TB.
  */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(spark, dir, name)

  // ---------------------------------------------------------------- //
  // Relational core (reference delegates these to Athena SQL —        //
  // SURVEY.md §2.4; here they are native Catalyst plans).             //
  // ---------------------------------------------------------------- //

  /** q01 — grouped aggregation w/ partial (map-side) agg; TPC-H Q1 shape. */
  def q01Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q02 — selective filter + narrow projection; predicate & column
    * pruning must reach the parquet scan (TPC-H Q6 shape).
    */
  def q02FilterPushdown(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-01-01").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
             .as("revenue"),
           count(lit(1)).as("n"))

  /** q03 — fact ⋈ broadcast dim + aggregation. */
  def q03JoinBroadcast(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(broadcast(t(spark, dir, "customer")),
            col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(round(sum("o_totalprice"), 2).as("total_price"),
           count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")

  /** q04 — global sort + limit: planner should pick TakeOrderedAndProject
    * (no full sort shuffle at scale).
    */
  def q04TopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total"))

  /** q05 — scalar string/math/date functions, row-parallel projection. */
  def q05ScalarFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(col("p_partkey") <= 100)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_type"), 1, 5).as("type5"),
        // concat (NULL-propagating) matches the oracle's `||`; concat_ws
        // would skip NULL operands and diverge on null brand/type
        concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"),
        (col("p_size") % 7).cast("long").as("size_mod"),
        round(abs(col("p_retailprice") - 1000.0), 2).as("price_dist"))
      .orderBy("p_partkey")

  /** q06 — distinct aggregation (expand + two-phase agg under the hood). */
  def q06Distinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
           countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_status"),
           countDistinct(col("l_orderkey")).as("n_orders"))

  /** Flagship star join: broadcast the whole dim chain, single shuffle
    * for the final aggregate.
    */
  def starJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o  = t(spark, dir, "orders")
    val c  = broadcast(t(spark, dir, "customer"))
    val n  = broadcast(t(spark, dir, "nation"))
    val r  = broadcast(t(spark, dir, "region"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
             .as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy("r_name", "o_year")
  }

  // ---------------------------------------------------------------- //
  // Registry + oracles                                                //
  // ---------------------------------------------------------------- //

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_groupby"    -> (q01Agg _),
    "q02_filter_pushdown"-> (q02FilterPushdown _),
    "q03_join_broadcast" -> (q03JoinBroadcast _),
    "q04_topk"           -> (q04TopK _),
    "q05_scalar_fns"     -> (q05ScalarFns _),
    "q06_distinct"       -> (q06Distinct _),
    "q07_star_join"      -> (starJoin _))

  val oracles: Map[String, String] = Map(
    "q01_agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS count_order
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q02_filter_pushdown" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
         count(*) AS n
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01'
           AND l_shipdate <  TIMESTAMP '1996-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q03_join_broadcast" ->
      """SELECT c_mktsegment,
         round(sum(o_totalprice), 2) AS total_price,
         count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "q04_topk" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS total
         FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q05_scalar_fns" ->
      """SELECT p_partkey,
         upper(p_brand) AS brand_u,
         CAST(length(p_name) AS BIGINT) AS name_len,
         substring(p_type, 1, 5) AS type5,
         p_brand || '-' || p_type AS brand_type,
         CAST(p_size % 7 AS BIGINT) AS size_mod,
         round(abs(p_retailprice - 1000.0), 2) AS price_dist
         FROM part WHERE p_partkey <= 100 ORDER BY p_partkey""",
    "q06_distinct" ->
      """SELECT count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status,
         count(DISTINCT l_orderkey) AS n_orders
         FROM lineitem""",
    "q07_star_join" ->
      """SELECT r_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         count(*) AS n_lines
         FROM lineitem
         JOIN orders   ON l_orderkey  = o_orderkey
         JOIN customer ON o_custkey   = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY 1, 2 ORDER BY 1, 2""")
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.exceptions._

/** Event-behavioral analytics over a timestamped event table — the
  * rolling-feature / cohort / funnel family every product-analytics
  * or feature-engineering pipeline runs. The reference delegates all
  * of these to Athena SQL (SURVEY.md §2.4); here they are native
  * Catalyst plans shaped for the 100 TB case: every window is
  * partitioned by the entity key (never a global `orderBy` window),
  * every aggregation partial-aggregates map-side, and nothing ever
  * collects event rows to the driver.
  */
object Behavioral {

  private def requireCols(df: DataFrame, cols: String*): Unit =
    cols.foreach { c =>
      if (!df.columns.contains(c))
        throw InvalidArgumentValue(
          s"no such column: $c (have ${df.columns.mkString(",")})")
    }

  /** Trailing event-time window aggregate per entity: for EVERY event,
    * the count and sum of `valueCol` over that entity's events in
    * `[ts − lookbackSec, ts]` (inclusive both ends — the RANGE-frame
    * convention both Spark and ANSI SQL share). The classic
    * feature-engineering primitive ("activity in the last hour at
    * decision time") that a naive self-join on time ranges turns into
    * a pair explosion.
    *
    * Scale shape: ONE keyed window — range-shuffle on `keyCol`, local
    * sort by event time, a linear frame sweep per partition. No
    * self-join, no per-row driver work; skewed keys are bounded by
    * the per-key event count, not the corpus.
    */
  def rollingWindow(events: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, lookbackSec: Long): DataFrame = {
    if (lookbackSec <= 0)
      throw InvalidArgumentValue(
        s"lookbackSec must be positive: $lookbackSec")
    requireCols(events, keyCol, tsCol, valueCol)
    // RANGE frames need a numeric ordering expression: epoch MICROS
    // (`unix_micros`), so sub-second event times keep exact interval
    // semantics — an engine replaying the frame over raw timestamps
    // (`RANGE INTERVAL … PRECEDING`) agrees event-for-event
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__epoch"))
      .rangeBetween(-lookbackSec * 1000000L, Window.currentRow)
    events
      .withColumn("__epoch", unix_micros(col(tsCol)))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sum", sum(col(valueCol)).over(w))
      .drop("__epoch")
      .withColumnRenamed("__n", "n_window")
      .withColumnRenamed("__sum", "sum_window")
  }

  /** Weekly cohort retention: assign each entity to the week of its
    * FIRST event (the cohort), then count how many entities of each
    * cohort were active k weeks later, k = 0..maxWeeks. The retention
    * matrix behind every growth dashboard.
    *
    * Scale shape: one per-entity min-aggregate (linear shuffle on the
    * key), one distinct-(entity, week) aggregate, one equi-join on the
    * entity key, one final (cohort, k) count — all partial-aggregated.
    * The result is |cohorts|·maxWeeks rows, driver-tiny.
    *
    * Weeks are Monday-started (`date_trunc('week', …)` in both Spark
    * and DuckDB/Postgres), k = floor-days/7 between cohort week and
    * activity week.
    */
  def cohortRetention(events: DataFrame, keyCol: String, tsCol: String,
                      maxWeeks: Int = 8): DataFrame = {
    if (maxWeeks < 0)
      throw InvalidArgumentValue(s"maxWeeks must be >= 0: $maxWeeks")
    requireCols(events, keyCol, tsCol)
    val firstWeek = events
      .groupBy(col(keyCol).as("__k"))
      .agg(date_trunc("week", min(col(tsCol))).cast("date")
        .as("cohort_week"))
    val activeWeeks = events
      .select(col(keyCol).as("__k"),
        date_trunc("week", col(tsCol)).cast("date").as("__aw"))
      .distinct()
    activeWeeks
      .join(firstWeek, "__k")
      .withColumn("k_weeks",
        (datediff(col("__aw"), col("cohort_week")) / 7).cast("long"))
      .filter(col("k_weeks").between(0, maxWeeks))
      .groupBy("cohort_week", "k_weeks")
      .agg(countDistinct(col("__k")).as("n_active"))
  }

  /** Ordered funnel: for a stage sequence like view → click →
    * purchase, an entity reaches stage i+1 only via an event of that
    * type STRICTLY AFTER its stage-i completion time (earliest-
    * completion semantics: stage time i+1 = min event time of that
    * type after stage time i). Returns one row per stage with the
    * number of entities that reached it.
    *
    * Scale shape: one conditional-min aggregation per stage — each a
    * linear keyed shuffle joined back into a per-entity stage-times
    * frame that holds ONE row per entity — then a single 1-row global
    * count melted to long form. Everything is LAZY (one composed plan,
    * one job at the caller's action): `stages.length` passes over the
    * type-filtered event scan, never a self-join of events against
    * events; column pruning keeps each pass at (key, ts, type).
    */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    if (stages.isEmpty)
      throw InvalidArgumentValue("stages must be non-empty")
    if (stages.distinct.size != stages.size)
      throw InvalidArgumentValue(
        s"duplicate stages: ${stages.mkString(",")}")
    requireCols(events, keyCol, tsCol, typeCol)
    val ev = events.select(col(keyCol).as("__k"),
      col(tsCol).as("__ts"), col(typeCol).as("__ty"))
    // per-entity stage-completion times, built left-to-right: stage 0
    // is the plain earliest event of that type; stage i the earliest
    // of its type strictly after stage i−1's time (`__ts > null`
    // filters entities that never reached i−1 for free)
    var stageTimes: DataFrame = ev.filter(col("__ty") === stages.head)
      .groupBy("__k").agg(min(col("__ts")).as("__t0"))
    stages.indices.drop(1).foreach { i =>
      val next = ev.filter(col("__ty") === stages(i))
        .join(stageTimes.select(col("__k"),
          col(s"__t${i - 1}").as("__prev")), "__k")
        .filter(col("__ts") > col("__prev"))
        .groupBy("__k").agg(min(col("__ts")).as(s"__t$i"))
      stageTimes = stageTimes.join(next, Seq("__k"), "left")
    }
    val entries = stages.zipWithIndex.map { case (st, i) =>
      struct(lit(i).cast("long").as("stage_idx"), lit(st).as("stage"),
        col(s"__c$i").as("n_entities"))
    }
    stageTimes
      .agg(count(col("__t0")).as("__c0"),
        stages.indices.drop(1)
          .map(i => count(col(s"__t$i")).as(s"__c$i")): _*)
      .select(explode(array(entries: _*)).as("__e"))
      .select(col("__e.stage_idx"), col("__e.stage"),
        col("__e.n_entities"))
  }

  /** Event-type transition matrix (first-order Markov chain over each
    * entity's time-ordered event sequence): for every consecutive
    * pair, count (from_type → to_type) and the conditional probability
    * p(to|from) = n / Σ n over the from row. The "what do users do
    * next" table, and the sequence-model sanity check before training
    * anything on event streams.
    *
    * Adjacency is per entity, ordered by (ts, tiebreakCol) — the
    * tiebreaker makes the sequence (and therefore the matrix) total,
    * so any engine replays it exactly.
    *
    * Scale shape: one keyed window (partitioned by entity — the only
    * shuffle that grows with data) for the lead, then a
    * |types|²-bounded count and a |types|-row broadcast-sized
    * denominator join. No self-joins on time.
    */
  def transitionMatrix(events: DataFrame, keyCol: String, tsCol: String,
                       typeCol: String, tiebreakCol: String): DataFrame = {
    requireCols(events, keyCol, tsCol, typeCol, tiebreakCol)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val pairs = events
      .select(col(keyCol), col(tsCol), col(tiebreakCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type")
      .agg(sum("n").as("__tot"))
    pairs.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("__tot"), 6).as("p"))
  }

  /** Per-entity inter-arrival statistics: gaps (seconds, µs
    * precision) between consecutive events under the (ts, tiebreak)
    * total order, summarized as count + interpolated p50/p90 + max.
    * The activity-cadence profile behind session-gap tuning (what
    * threshold does `sessionize` deserve?) and bot/burst detection
    * (p50 near zero at high counts = machine traffic).
    *
    * Scale shape: one keyed window for the lag — the only data-sized
    * shuffle — then a per-entity aggregate; the result is one row per
    * entity. Single-event entities emit n_gaps = 0 with null stats.
    *
    * Numeric contract: the percentile runs over INTEGER microsecond
    * gaps and converts to seconds only after aggregation. Int64
    * interpolation midpoints are exactly representable in double, so
    * any engine's linear-interpolation quantile (Spark `percentile`,
    * DuckDB `quantile_cont`) agrees bit-for-bit; dividing first would
    * interpolate between inexact doubles and diverge at half-ulp
    * round boundaries. The result is then rounded half-up to integer
    * microseconds via `floor(x + 0.5)` — NOT a decimal `round(x, 6)`
    * after division, because a p50 midpoint of two integers lands
    * exactly on x.5 µs (a 6-dp decimal tie in seconds) half the time,
    * and engines break decimal ties differently (Spark rounds the
    * shortest decimal string HALF_UP; DuckDB rounds in binary).
    * floor/+0.5 are IEEE-exact on the exact midpoint double, so both
    * engines produce the same integer, and integer/1e6 is the same
    * IEEE division — bit-identical output with ≤6 decimal digits.
    */
  def interArrivalStats(events: DataFrame, keyCol: String,
                        tsCol: String, tiebreakCol: String): DataFrame = {
    requireCols(events, keyCol, tsCol, tiebreakCol)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__e"), col(tiebreakCol))
    events
      .select(col(keyCol), unix_micros(col(tsCol)).as("__e"),
        col(tiebreakCol))
      .withColumn("__gap_us",
        col("__e") - lag(col("__e"), 1).over(w))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        count(col("__gap_us")).as("n_gaps"),
        (floor(expr("percentile(__gap_us, 0.5)") + 0.5) / 1e6)
          .as("p50_gap_s"),
        (floor(expr("percentile(__gap_us, 0.9)") + 0.5) / 1e6)
          .as("p90_gap_s"),
        (max(col("__gap_us")) / 1e6).as("max_gap_s"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.exceptions._

/** Dataset profiling (the `df.describe()` surface a pandas-on-AWS
  * user reaches for first): per-column numeric summaries and pairwise
  * Pearson correlation. The moment statistics are SINGLE-scan wide
  * aggregations — all columns' statistics (or all pairs' moments)
  * partial-aggregate map-side in one pass, then a driver-sized melt
  * to long form. Medians and winsorize bounds run through
  * [[Quantiles.exactQuantiles]] (histogram-refinement distributed
  * selection): identical values to the `percentile` aggregate —
  * QuantilesSpec pins bit-equality — but with O(buckets)-row
  * aggregation state instead of percentile's value→count map of
  * every distinct value in one task's heap, which for continuous
  * columns is the group's row count and an OOM at 100 TB.
  */
object Profiling {

  private def requireNumeric(df: DataFrame, cols: Seq[String]): Unit = {
    if (cols.isEmpty)
      throw InvalidArgumentValue("cols must be non-empty")
    val dup = cols.diff(cols.distinct)
    if (dup.nonEmpty)
      throw InvalidArgumentValue(s"duplicate cols: ${dup.mkString(",")}")
    cols.foreach { c =>
      val f = df.schema.fields.find(_.name == c).getOrElse(
        throw InvalidArgumentValue(s"no such column: $c"))
      if (!f.dataType.isInstanceOf[NumericType])
        throw InvalidArgumentValue(
          s"column $c is ${f.dataType.simpleString}, not numeric")
    }
  }

  /** Per-column summary statistics, one row per column:
    * (column, n_nonnull, n_null, mean, sd, min, max, median) — sd is
    * the sample stddev, median the interpolated exact percentile, all
    * rounded to 6 decimals so any engine re-derives the same values.
    *
    * The moments come from one wide scan; the medians from a melted
    * (column, value) frame through `exactQuantiles` — 2–3 more linear
    * scans, but no task ever buffers a column's distinct values
    * (`percentile` would, and a continuous column's distinct count ≈
    * the row count). The quantile refinement runs Spark jobs eagerly,
    * so this returns a small materialized frame, not a lazy plan.
    */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    requireNumeric(df, cols)
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        round(avg(col(c)), 6).as(s"__mean_$c"),
        round(stddev_samp(col(c)), 6).as(s"__sd_$c"),
        round(min(col(c)).cast("double"), 6).as(s"__min_$c"),
        round(max(col(c)).cast("double"), 6).as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val melted = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("colname"),
          col(c).cast("double").as("v"))): _*)).as("e"))
      .select("e.colname", "e.v")
    val medians = Quantiles
      .exactQuantiles(melted, Seq("colname"), "v", Seq(0.5))
      .select(col("colname").as("column"),
        round(col("q"), 6).as("median"))
    val entries = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__n_$c").as("n_nonnull"),
        (col("__total") - col(s"__n_$c")).as("n_null"),
        col(s"__mean_$c").as("mean"),
        col(s"__sd_$c").as("sd"),
        col(s"__min_$c").as("min"),
        col(s"__max_$c").as("max"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
      .join(medians, Seq("column"), "left")
  }

  /** Pairwise Pearson correlation over the given columns, one row per
    * unordered pair (col_a < col_b lexicographically by input order):
    * (col_a, col_b, corr) rounded to 6 decimals. All n(n−1)/2
    * coefficients come out of ONE aggregation pass.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    requireNumeric(df, cols)
    if (cols.size < 2)
      throw InvalidArgumentValue("need at least two cols for corr")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      round(corr(col(a), col(b)), 6).as(s"__corr_${a}__$b")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__corr_${a}__$b").as("corr"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Fixed-width histogram of a numeric column: `nBuckets` equal
    * buckets spanning [min, max], bucket i covering
    * [min + i·w, min + (i+1)·w) with the last bucket closed at max
    * (`least(floor((x−min)/w), nBuckets−1)` — the exact formula any
    * engine replays). Empty buckets are emitted with n = 0 so the
    * result always has `nBuckets` rows; a degenerate column
    * (min == max) lands everything in bucket 0. Nulls are ignored.
    *
    * Scale shape: one scan for the (min, max) bounds — a 2-value
    * broadcast — and one scan that partial-aggregates bucket counts
    * map-side; at most `nBuckets` rows ever shuffle. The dense
    * bucket spine is a driver-sized `spark.range`.
    *
    * @return (bucket, lo, hi, n) rounded to 6 decimals on the bounds
    */
  /** Key-skew report — the diagnostic run BEFORE deciding whether a
    * join/aggregation needs `Relational.saltedJoin`/`saltedAggregate`:
    * per-key row counts summarized as (total keys, total rows, max,
    * p50/p90/p99 interpolated percentiles, skew = max/mean) plus the
    * `topK` heaviest keys with their share of all rows. A key whose
    * share approaches one partition's fraction of the data is the
    * shuffle straggler; salt it.
    *
    * Scale shape: one partial-aggregated (key → count) pass — the
    * only data-sized shuffle — then a |keys|-row percentile aggregate
    * and a TakeOrderedAndProject top-K (driver cost K, never a sort
    * of all keys). Long form: kind ∈ {summary, heavy_key}.
    *
    * @return (kind, key, n_rows, share, metric_p50, metric_p90,
    *         metric_p99, skew) — summary row has key = "*"
    */
  def skewReport(df: DataFrame, keyCols: Seq[String],
                 topK: Int = 10): DataFrame = {
    if (keyCols.isEmpty)
      throw InvalidArgumentValue("keyCols must be non-empty")
    if (topK <= 0)
      throw InvalidArgumentValue(s"topK must be positive: $topK")
    keyCols.foreach { c =>
      if (!df.columns.contains(c))
        throw InvalidArgumentValue(s"no such column: $c")
    }
    // group on the STRUCT of key columns (exact tuple identity —
    // concat_ws alone would both skip NULLs and let values containing
    // the separator collide, misattributing counts), then render the
    // display string afterward: NULL → ␀ (U+2400); literal '|', '\'
    // AND '␀' backslash-escaped (a value that IS the NULL sentinel
    // must not render identically to NULL), so distinct tuples render
    // distinctly
    val rendered = concat_ws("|", keyCols.map(c =>
      coalesce(regexp_replace(col(c).cast("string"),
        "([\\\\|␀])", "\\\\$1"), lit("␀"))): _*)
    val counts = df
      .groupBy(struct(keyCols.map(col): _*).as("__t"), rendered.as("key"))
      .agg(count(lit(1)).as("n"))
      .drop("__t")
    val total = counts.agg(
      sum("n").as("__rows"), count(lit(1)).as("__keys"),
      max("n").as("__max"), avg("n").as("__mean"),
      expr("percentile(n, 0.5)").as("__p50"),
      expr("percentile(n, 0.9)").as("__p90"),
      expr("percentile(n, 0.99)").as("__p99"))
    val summary = total.select(
      lit("summary").as("kind"), lit("*").as("key"),
      col("__rows").as("n_rows"), lit(1.0).as("share"),
      round(col("__p50"), 6).as("metric_p50"),
      round(col("__p90"), 6).as("metric_p90"),
      round(col("__p99"), 6).as("metric_p99"),
      round(col("__max") / col("__mean"), 6).as("skew"))
    val heavy = counts
      .orderBy(col("n").desc, col("key").asc)
      .limit(topK)
      .crossJoin(broadcast(total.select(col("__rows"))))
      .select(lit("heavy_key").as("kind"), col("key"),
        col("n").as("n_rows"),
        round(col("n").cast("double") / col("__rows"), 6).as("share"),
        lit(null).cast("double").as("metric_p50"),
        lit(null).cast("double").as("metric_p90"),
        lit(null).cast("double").as("metric_p99"),
        lit(null).cast("double").as("skew"))
    summary.unionByName(heavy)
  }

  /** Sketch-based cardinality profile: per group, the APPROXIMATE
    * distinct count of each requested column (HyperLogLog++, default
    * 2% relative SD) next to the exact row count. At 100 TB this is
    * THE way to profile cardinality: exact `countDistinct` shuffles
    * every distinct value; the sketch partial-aggregates a
    * constant-size register set per (group, column) — the shuffle
    * carries kilobytes per group regardless of data size.
    *
    * Approximate by contract, so no DuckDB-hash oracle (different
    * engines' sketches disagree legitimately); the spec pins the
    * relative error against exact counts instead.
    *
    * @return one row per (group, column): (group, column,
    *         n_rows, approx_distinct)
    */
  def approxDistinctProfile(df: DataFrame, groupCol: String,
                            cols: Seq[String],
                            relativeSD: Double = 0.02): DataFrame = {
    if (cols.isEmpty)
      throw InvalidArgumentValue("cols must be non-empty")
    if (!df.columns.contains(groupCol))
      throw InvalidArgumentValue(s"no such column: $groupCol")
    cols.foreach { c =>
      if (!df.columns.contains(c))
        throw InvalidArgumentValue(s"no such column: $c")
    }
    val aggs = count(lit(1)).as("__n") +: cols.map(c =>
      approx_count_distinct(col(c), relativeSD).as(s"__ad_$c"))
    val wide = df.groupBy(col(groupCol).as("grp"))
      .agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c => struct(lit(c).as("column"),
      col(s"__ad_$c").as("approx_distinct")))
    wide.select(col("grp"), col("__n").as("n_rows"),
        explode(array(entries: _*)).as("__e"))
      .select(col("grp"), col("__e.column"), col("n_rows"),
        col("__e.approx_distinct"))
  }

  /** EXACT distinct-count twin of [[approxDistinctProfile]] — same
    * output shape with true `count(DISTINCT ...)` values, so the
    * profile's melt/group/join logic gets a replayable oracle hash
    * (the HLL variant can only ever be rows-checked: register sets
    * legitimately differ across engines).
    *
    * Scale note: this is the verification twin — exact distinct
    * shuffles every distinct value per (group, column) (Spark expands
    * k distinct aggregates into a k-fold Expand before the shuffle).
    * At the 100 TB design point use `approxDistinctProfile`, whose
    * shuffle carries constant-size sketch registers instead.
    *
    * @return one row per (group, column): (grp, column, n_rows,
    *         n_distinct)
    */
  def distinctProfile(df: DataFrame, groupCol: String,
                      cols: Seq[String]): DataFrame = {
    if (cols.isEmpty)
      throw InvalidArgumentValue("cols must be non-empty")
    if (!df.columns.contains(groupCol))
      throw InvalidArgumentValue(s"no such column: $groupCol")
    cols.foreach { c =>
      if (!df.columns.contains(c))
        throw InvalidArgumentValue(s"no such column: $c")
    }
    val aggs = count(lit(1)).as("__n") +: cols.map(c =>
      countDistinct(col(c)).as(s"__d_$c"))
    val wide = df.groupBy(col(groupCol).as("grp"))
      .agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c => struct(lit(c).as("column"),
      col(s"__d_$c").as("n_distinct")))
    wide.select(col("grp"), col("__n").as("n_rows"),
        explode(array(entries: _*)).as("__e"))
      .select(col("grp"), col("__e.column"), col("n_rows"),
        col("__e.n_distinct"))
  }

  /** Per-group winsorization: clip a numeric column to its group's
    * [pLo, pHi] interpolated percentiles — the standard outlier
    * treatment before aggregates/metrics that a single corrupt value
    * would drag (doc lengths, event values, latency columns). Returns
    * the input rows plus (lo_bound, hi_bound, clipped).
    *
    * Scale shape: the per-group bounds come from
    * [[Quantiles.exactQuantiles]] — the same interpolated values the
    * `percentile` aggregate produces (bit-equal, QuantilesSpec) with
    * O(buckets) aggregation state per target instead of a per-group
    * value→count map of every distinct value; for continuous columns
    * that map is the group's row count in one task's heap, the exact
    * single-buffer OOM this module is designed to avoid at 100 TB.
    * The bounds (|groups| rows) then join back to the scan; AQE
    * broadcasts them whenever they fit. The quantile refinement runs
    * jobs eagerly, so the bounds are materialized at call time.
    */
  def winsorize(df: DataFrame, groupCol: String, c: String,
                pLo: Double, pHi: Double): DataFrame = {
    requireNumeric(df, Seq(c))
    if (!(pLo >= 0 && pLo < pHi && pHi <= 1))
      throw InvalidArgumentValue(
        s"need 0 <= pLo < pHi <= 1: ($pLo, $pHi)")
    if (!df.columns.contains(groupCol))
      throw InvalidArgumentValue(s"no such column: $groupCol")
    val bounds = Quantiles
      .exactQuantiles(df, Seq(groupCol), c, Seq(pLo, pHi))
      .groupBy(col(groupCol))
      .agg(round(max(when(col("p") === pLo, col("q"))), 6).as("lo_bound"),
        round(max(when(col("p") === pHi, col("q"))), 6).as("hi_bound"))
    // no broadcast hint: |groups| is data-dependent, AQE broadcasts
    // the bounds side whenever it actually fits
    df.join(bounds, groupCol)
      .withColumn("clipped",
        round(least(greatest(col(c).cast("double"), col("lo_bound")),
          col("hi_bound")), 6))
  }

  def histogram(df: DataFrame, c: String, nBuckets: Int): DataFrame = {
    requireNumeric(df, Seq(c))
    if (nBuckets <= 0)
      throw InvalidArgumentValue(s"nBuckets must be positive: $nBuckets")
    val spark = df.sparkSession
    val bounds = df.agg(min(col(c)).cast("double").as("__lo"),
      max(col(c)).cast("double").as("__hi"))
    val counts = df.select(col(c).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
      .crossJoin(broadcast(bounds))
      .select(when(col("__hi") === col("__lo"), lit(0L))
        .otherwise(least(
          floor((col("__x") - col("__lo")) /
            ((col("__hi") - col("__lo")) / nBuckets)),
          lit(nBuckets - 1L))).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    spark.range(nBuckets).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .crossJoin(broadcast(bounds))
      .select(col("bucket"),
        round(col("__lo") +
          col("bucket") * (col("__hi") - col("__lo")) / nBuckets, 6)
          .as("lo"),
        round(col("__lo") +
          (col("bucket") + 1) * (col("__hi") - col("__lo")) / nBuckets, 6)
          .as("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.exceptions._

/** Relational helpers for operations Spark only offers as
  * single-partition global windows (`Window.orderBy` with no
  * partitionBy moves ALL rows to one partition — a guaranteed OOM at
  * scale). These stay distributed:
  *
  *   range-shuffle on the sort keys → per-partition local sort →
  *   per-partition sequential index + partition-size offsets (one
  *   lightweight count job) → global index.
  *
  * The reference delegates these to Athena/Presto (SURVEY.md §2.4);
  * here they are the 100 TB-safe equivalents of `row_number()/ntile()
  * OVER (ORDER BY …)`.
  */
object Relational {

  /** Append a 0-based globally-ordered row index without ever
    * collapsing to one partition.
    *
    * `sortCols` must define a TOTAL order (include a tiebreaker key);
    * with ties the index assignment between tied rows is
    * partitioner-dependent.
    *
    * Implementation: `repartitionByRange` gives ordered disjoint key
    * ranges per partition, `sortWithinPartitions` orders locally, and
    * `zipWithIndex` assigns the global index distributively (it runs
    * one extra job to collect per-partition counts — O(numPartitions)
    * driver memory, never row data).
    */
  def withGlobalIndex(df: DataFrame, sortCols: Seq[Column],
                      indexCol: String = "row_idx",
                      numPartitions: Option[Int] = None): DataFrame = {
    if (sortCols.isEmpty)
      throw InvalidArgumentValue("sortCols must be non-empty")
    val parts = numPartitions.getOrElse(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val sorted = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add(indexCol, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    df.sparkSession.createDataFrame(indexed, schema)
  }

  /** Distributed equivalent of `ntile(k) OVER (ORDER BY sortCols)`:
    * same bucket semantics (first `n % k` buckets get the extra row),
    * no single-partition window. Costs one extra pass for the total
    * count; at scale, persist `df` first if it is expensive to
    * recompute.
    */
  def ntileBucketed(df: DataFrame, k: Int, sortCols: Seq[Column],
                    bucketCol: String = "bucket",
                    numPartitions: Option[Int] = None): DataFrame = {
    if (k <= 0) throw InvalidArgumentValue(s"k must be positive, got $k")
    val n = df.count()
    val idxCol = "__graft_idx"
    val indexed = withGlobalIndex(df, sortCols, idxCol, numPartitions)
    val base = n / k
    val rem = n % k
    val cut = rem * (base + 1) // first `rem` buckets carry base+1 rows
    val bucket =
      if (base == 0) col(idxCol) + 1L // n < k: one row per bucket
      else
        when(col(idxCol) < cut, expr(s"$idxCol div ${base + 1}") + 1L)
          .otherwise(lit(rem) + expr(s"($idxCol - $cut) div $base") + 1L)
    indexed.withColumn(bucketCol, bucket.cast("long")).drop(idxCol)
  }

  /** Backward as-of join: for each left row, attach the LATEST right
    * row of the same key with `rightTime <= leftTime` (inclusive) —
    * the standard point-in-time join Spark has no native operator for
    * (quotes-to-trades, latest-feature-value-at-event-time).
    *
    * Implementation is the scalable union+window form, NOT a
    * per-row lookup or a range cross-join:
    *
    *   union(left tagged 1, right tagged 0)
    *     → window per key ordered by (time, tag)
    *     → running `last(rightCol, ignoreNulls)` carries the most
    *       recent right values forward onto each left row.
    *
    * One shuffle on the key, sort within partitions, no broadcast and
    * no O(|L|·|R|) pair generation — at 100 TB this is a plain
    * sort-merge-shaped plan. Each KEY's rows must fit one task
    * partition (same contract as any keyed window, e.g. q09); keys at
    * that cardinality are the salting/sessionization regime instead.
    *
    * Ordering ties: right rows sort BEFORE left rows at the same
    * timestamp, so an exact-time match is visible to the left row
    * (ASOF's inclusive convention). Multiple right rows at the same
    * (key, time) resolve arbitrarily — pre-deduplicate the right side
    * if that matters.
    *
    * @param joinType "left" (unmatched left rows keep nulls) or
    *   "inner" (unmatched left rows drop)
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               joinType: String = "left"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (keys.isEmpty) throw InvalidArgumentValue("keys must be non-empty")
    if (!Set("left", "inner")(joinType))
      throw InvalidArgumentValue(
        s"joinType must be left|inner, got $joinType")
    val leftVals = left.columns.filterNot(keys.contains).toSeq
    val rightVals = right.columns.filterNot(keys.contains).toSeq
    val clash = rightVals.intersect(left.columns.toSeq)
    if (clash.nonEmpty)
      throw InvalidArgumentValue(
        s"right columns collide with left: ${clash.mkString(", ")} — " +
          "rename before joining")
    val tag = "__graft_asof_side"
    val t = "__graft_asof_t"
    val rStruct = "__graft_asof_r"
    // the right row travels as ONE struct, not per-column: running
    // `last(ignoreNulls)` per column would backfill a null FIELD of
    // the matched right row from an older right row, fabricating a
    // mixed row that never existed. The struct itself is non-null
    // exactly when a right row exists, so one last() carries the
    // whole matched row (nulls in its fields included).
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)))
    val lAligned = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as(t), lit(1).as(tag)) ++
        leftVals.map(col) :+
        lit(null).cast(rStructType).as(rStruct): _*)
    val rAligned = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as(t), lit(0).as(tag)) ++
        leftVals.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightVals.map(col): _*).as(rStruct): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(t).asc, col(tag).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lAligned.unionByName(rAligned)
      .withColumn(rStruct, last(col(rStruct), ignoreNulls = true).over(w))
      .filter(col(tag) === 1)
    // inner = matched-only; the STRUCT's nullness is the match flag
    // (a matched right row may legitimately carry null fields)
    val kept =
      if (joinType == "inner") carried.filter(col(rStruct).isNotNull)
      else carried
    kept.select(
      keys.map(col) ++ leftVals.map(col) ++
        rightVals.map(c => col(s"$rStruct.$c").as(c)): _*)
  }

  /** Interval/range join: pair each left "point" row with every right
    * row whose [lo, hi) interval contains it (optionally also matching
    * equi-`keys`). Spark plans a raw `BETWEEN` join as
    * BroadcastNestedLoopJoin — O(|L|·|R|) compares; this operator bins
    * the domain so it becomes an EQUI join Catalyst can hash/sort-merge:
    *
    *   right rows explode to one row per `binWidth` bin their interval
    *   overlaps; left rows compute their single containing bin; join
    *   on (keys, bin) then re-check the exact bounds.
    *
    * Cost scales with |R| · avg(interval/binWidth) replicas — pick
    * binWidth near the median interval length so replication stays
    * O(1) per interval. Intervals may overlap; every containing
    * interval matches (a point falls in exactly one bin, so no dedup
    * step is needed).
    */
  def rangeJoin(points: DataFrame, ranges: DataFrame, pointCol: String,
                loCol: String, hiCol: String, binWidth: Double,
                keys: Seq[String] = Nil): DataFrame = {
    if (binWidth <= 0)
      throw InvalidArgumentValue(s"binWidth must be positive: $binWidth")
    val bin = "__graft_bin"
    val p = points.withColumn(bin,
      floor(col(pointCol) / binWidth).cast("long"))
    val r = ranges.withColumn(bin,
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(r, keys :+ bin)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop(bin)
  }

  private val SaltCol = "__graft_salt"

  /** Skew-resistant equi-join: the probe (large, skewed) side gets a
    * uniform salt, the build side is replicated once per salt value,
    * and the join key becomes (keys, salt) — one hot key now spreads
    * over `saltFactor` tasks instead of melting a single one. AQE's
    * skew-join handles sort-merge cases adaptively; explicit salting
    * is for when the hot keys are known/extreme or AQE can't split
    * (e.g. aggregations after the join keep the skewed partitioning).
    *
    * Build-side rows are duplicated saltFactor×, so use this when the
    * build side is small relative to the skew (the usual case).
    */
  /** Join types where replicating the build side cannot duplicate or
    * drop rows: the build side only ever matches (inner/left*); outer
    * variants that null-extend the build side would emit one row PER
    * SALT REPLICA for unmatched build keys.
    */
  private val SaltSafeJoins =
    Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")

  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    if (saltFactor <= 0)
      throw InvalidArgumentValue(s"saltFactor must be positive: $saltFactor")
    if (!SaltSafeJoins(joinType.toLowerCase.replace(" ", "")))
      throw InvalidArgumentValue(
        s"saltedJoin supports inner/left/left_semi/left_anti, got " +
          s"$joinType — right/full outer would duplicate unmatched " +
          "build rows once per salt replica")
    val probeS = probe.withColumn(SaltCol,
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val buildS = build.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    probeS.join(buildS, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  /** Skew-resistant aggregation: phase 1 aggregates on (keys, salt) —
    * hot keys split across saltFactor reducers — phase 2 merges the
    * partials per key. Supported merges: sum, count, min, max
    * (count merges by summing partial counts).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
                      aggSpec: Seq[(String, String)],
                      saltFactor: Int): DataFrame = {
    if (saltFactor <= 0)
      throw InvalidArgumentValue(s"saltFactor must be positive: $saltFactor")
    if (aggSpec.isEmpty)
      throw InvalidArgumentValue("aggSpec must be non-empty")
    val dup = aggSpec.groupBy(identity).collect {
      case (spec, hits) if hits.size > 1 => s"${spec._1}:${spec._2}"
    }
    if (dup.nonEmpty)
      throw InvalidArgumentValue(
        s"duplicate aggSpec entries: ${dup.mkString(", ")}")
    val bad = aggSpec.collect {
      case (_, fn) if !Set("sum", "count", "min", "max")(fn) => fn
    }
    if (bad.nonEmpty)
      throw InvalidArgumentValue(
        s"unsupported salted aggregations: ${bad.mkString(", ")}")
    val salted = df.withColumn(SaltCol,
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val partials = aggSpec.map {
      case (c, "sum")   => sum(col(c)).as(s"${c}_sum")
      case (c, "count") => count(col(c)).as(s"${c}_count")
      case (c, "min")   => min(col(c)).as(s"${c}_min")
      case (c, "max")   => max(col(c)).as(s"${c}_max")
    }
    val merged = aggSpec.map {
      case (c, "sum")   => sum(col(s"${c}_sum")).as(s"${c}_sum")
      case (c, "count") => sum(col(s"${c}_count")).as(s"${c}_count")
      case (c, "min")   => min(col(s"${c}_min")).as(s"${c}_min")
      case (c, "max")   => max(col(s"${c}_max")).as(s"${c}_max")
    }
    salted
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merged.head, merged.tail: _*)
  }

  /** Top-k rows per group under an explicit ordering — the
    * quality-based selection step of a curation pipeline ("keep the 3
    * best-scored documents per (lang, source)"), where
    * `stratifiedSampleExact` keeps a RANDOM k.
    *
    * Two-phase, like the ANN top-k: a local rank per
    * (group, input-partition) keeps ≤ k rows per partition, so the
    * global per-group rank window receives at most k·P rows per group
    * — a group holding 30 TB never streams through one task, which a
    * naive single window per group would force.
    *
    * `orderCols` MUST be a total order (add an id tiebreak): with ties
    * across partitions the two phases could otherwise keep different
    * representatives.
    *
    * @return the surviving rows plus `rk` (1..k within the group)
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderCols: Seq[Column], k: Int): DataFrame = {
    if (groupCols.isEmpty)
      throw InvalidArgumentValue("groupCols must be non-empty")
    if (orderCols.isEmpty)
      throw InvalidArgumentValue("orderCols must be non-empty")
    if (k <= 0)
      throw InvalidArgumentValue(s"k must be positive: $k")
    val localW = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col) :+ spark_partition_id(): _*)
      .orderBy(orderCols: _*)
    val globalW = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(orderCols: _*)
    df.withColumn("__lr", row_number().over(localW))
      .filter(col("__lr") <= k).drop("__lr")
      .withColumn("rk", row_number().over(globalW).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Exactly-k-per-stratum deterministic sample: keep the `k` rows of
    * each stratum whose md5(id) ranks lowest (ties broken by id —
    * total order, so the sample is unique and re-derivable forever,
    * unlike `TABLESAMPLE`/`rand()` which change per run and per
    * partitioning). The md5 rank makes membership independent of the
    * id distribution — sequential ids don't bias toward old rows.
    *
    * One window per stratum (shuffle on strataCols, sort by the
    * hash); a stratum's rows land in one task, which is fine for
    * strata like language/source/bucket but NOT for high-cardinality
    * skew — salt first (`saltedAggregate`'s trick) if one stratum is
    * a large fraction of the corpus.
    */
  def stratifiedSampleExact(df: DataFrame, strataCols: Seq[String],
                            idCol: String, k: Int): DataFrame = {
    if (strataCols.isEmpty)
      throw InvalidArgumentValue("strataCols must be non-empty")
    if (k <= 0)
      throw InvalidArgumentValue(s"k must be positive: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Gap-based sessionization: number each key's rows into sessions
    * that break whenever consecutive timestamps are more than
    * `gapSeconds` apart (the classic 30-minute web-session rule; also
    * the batch twin of `streaming`'s session windows, which hold the
    * same gap semantics under a watermark).
    *
    * One shuffle on the key, one keyed window (lag + running sum of
    * boundary flags) — the same per-key-fits-a-task contract as
    * [[asOfJoin]]; users with pathological single-key volume are in
    * the salting regime, not the sessionization regime.
    *
    * `tiebreak` completes the order for same-timestamp rows; pass the
    * event id so session numbering is a total order and therefore
    * deterministic.
    *
    * @return `df` plus `sessionCol` (1-based Long, scoped per key)
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gapSeconds: Long, tiebreak: Seq[String] = Seq.empty,
                 sessionCol: String = "session_id"): DataFrame = {
    if (gapSeconds <= 0)
      throw InvalidArgumentValue(
        s"gapSeconds must be positive: $gapSeconds")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc +: tiebreak.map(col(_).asc): _*)
    val prev = lag(col(tsCol), 1).over(w)
    val boundary = when(prev.isNull, 1L)
      .when(unix_timestamp(col(tsCol)) - unix_timestamp(prev)
        > gapSeconds, 1L)
      .otherwise(0L)
    df.withColumn(sessionCol,
      sum(boundary).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
  }

  /** Time-series resampling with gap fill (densify): bucket each
    * key's events into `bucketSeconds` windows, then emit EVERY bucket
    * between the key's first and last event — missing buckets as
    * (0, 0.0) rows — so downstream window math (moving averages,
    * anomaly baselines) sees a regular grid.
    *
    * The grid is generated with a chunked double explode: first
    * `chunk`-sized ranges, then positions within a range. A single
    * `sequence(b0, b1)` would materialize one array spanning the whole
    * key history — a years-long key at small buckets is a multi-GB
    * row; chunking bounds per-row memory at `chunk` elements no
    * matter the span. Shuffle shape: two partial-aggregated passes
    * over the events (bucket agg + span agg) and one equi-join of the
    * grid against the bucket aggregates.
    *
    * @return (key, bucket, n_events, sum_value); bucket is
    *         floor(epochSeconds / bucketSeconds)
    */
  def resampleGapFill(df: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String, bucketSeconds: Long,
                      chunk: Int = 4096): DataFrame = {
    if (bucketSeconds <= 0)
      throw InvalidArgumentValue(
        s"bucketSeconds must be positive: $bucketSeconds")
    if (chunk <= 0)
      throw InvalidArgumentValue(s"chunk must be positive: $chunk")
    val b = floor(unix_timestamp(col(tsCol)) / bucketSeconds)
      .cast("long")
    val base = df.select(col(keyCol), b.as("__b"), col(valueCol))
    val perBucket = base.groupBy(keyCol, "__b").agg(
      count(lit(1)).as("__n"), round(sum(valueCol), 6).as("__sv"))
    val span = base.groupBy(keyCol).agg(
      min("__b").as("__b0"), max("__b").as("__b1"))
    val grid = span
      .select(col(keyCol), col("__b1"),
        explode(sequence(col("__b0"), col("__b1"), lit(chunk.toLong)))
          .as("__c"))
      .select(col(keyCol),
        explode(sequence(col("__c"),
          least(col("__c") + (chunk - 1).toLong, col("__b1"))))
          .as("__b"))
    grid.join(perBucket, Seq(keyCol, "__b"), "left")
      .select(col(keyCol), col("__b").as("bucket"),
        coalesce(col("__n"), lit(0L)).as("n_events"),
        coalesce(col("__sv"), lit(0.0)).as("sum_value"))
  }

  /** Edit-distance similarity join (fuzzy entity matching): all pairs
    * (a, b) with a.id < b.id and levenshtein(a.str, b.str) ≤ maxDist.
    * Recall-GUARANTEED candidate generation via q-gram count
    * filtering (Gravano et al., VLDB 2001): an edit destroys at most
    * q of a string's positional q-grams, so ed(s,t) ≤ d ⇒ the strings
    * share ≥ max(|s|,|t|) − q + 1 − q·d q-gram occurrences. Candidates
    * come from a gram equi-join counted against that bound (multiset
    * semantics — grams carry their duplicate ordinal so "aaaa"-style
    * repeats count correctly), plus the length filter ||s|−|t|| ≤ d;
    * strings too short to be covered by the bound
    * (len < q·(d+1) + q − 1) pair within driver-sized length bands
    * instead. Exact `levenshtein` verifies every candidate — the
    * result is exactly the all-pairs answer, never all-pairs cost.
    *
    * Scale shape: explode → gram equi-join → pair count ≥ threshold
    * (partial-aggregated) → verify. The gram join is the one shuffle
    * that grows with data. `maxGramFreq` (0 = off, the default —
    * `minhashNearDups`' `maxBandBucket` convention) drops grams seen
    * in more strings than that from candidate generation; both strings'
    * thresholds are lowered by their own dropped-occurrence counts,
    * so the only pairs the guard can lose are those whose EVERY
    * shared gram is flooded — a property spec pins `== all-pairs`
    * with the guard off, and callers flooding on boilerplate corpora
    * opt in to that trade.
    *
    * Short strings (len < q·(d+1) + q − 1) have too few grams for the
    * bound and pair within length bands instead — quadratic WITHIN a
    * band by nature (two 5-char strings within distance 2 can share
    * zero 3-grams), so exact-dedup sub-`q·(d+1)`-char strings first
    * if the corpus is short-string-heavy.
    *
    * @param df  (idCol, strCol) — ids must be unique
    * @return (id_a, id_b, str_a, str_b, dist), id_a < id_b
    */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
                       maxDist: Int, q: Int = 3,
                       maxGramFreq: Long = 0L): DataFrame = {
    if (maxDist <= 0)
      throw InvalidArgumentValue(s"maxDist must be positive: $maxDist")
    if (q < 2)
      throw InvalidArgumentValue(s"q must be >= 2: $q")
    val gramFreqCap = if (maxGramFreq <= 0) Long.MaxValue else maxGramFreq
    val spark = df.sparkSession
    import spark.implicits._
    val strs = df.select(col(idCol).cast("long").as("id"),
      col(strCol).as("s"), length(col(strCol)).as("len"))
    val minCovered = q * (maxDist + 1) + q - 1
    val long = strs.filter(col("len") >= minCovered)
    // positional q-grams with duplicate ordinals: the k-th occurrence
    // of gram g only matches the other string's k-th occurrence, so
    // the join counts multiset intersection, which the Gravano bound
    // is stated over
    val grams = long
      .select(col("id"), col("len"),
        posexplode(expr(
          s"transform(sequence(1, len - ${q - 1}), i -> substring(s, i, $q))"))
          .as(Seq("__p", "g")))
      .withColumn("__k", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("id", "g").orderBy("__p")))
      .select(col("id"), col("len"), col("g"), col("__k"))
    val flood = grams.groupBy("g", "__k")
      .agg(countDistinct("id").as("__nids"))
      .filter(col("__nids") > gramFreqCap)
      .select(col("g"), col("__k"), lit(1).as("__flooded"))
    val kept = grams.join(broadcast(flood), Seq("g", "__k"), "left")
    // per-string count of dropped gram occurrences: lowers that
    // string's threshold so the bound stays exact without the flood
    // gram ever entering the join
    val dropped = kept.groupBy("id")
      .agg(count(when(col("__flooded").isNotNull, 1)).as("__dropped"))
    val candidates = kept.filter(col("__flooded").isNull)
      .select(col("id"), col("len"), col("g"), col("__k"))
      .as("l")
      .join(kept.filter(col("__flooded").isNull)
        .select(col("id"), col("len"), col("g"), col("__k")).as("r"),
        $"l.g" === $"r.g" && $"l.__k" === $"r.__k" &&
          $"l.id" < $"r.id" &&
          abs($"l.len" - $"r.len") <= maxDist)
      .groupBy($"l.id".as("id_a"), $"r.id".as("id_b"),
        $"l.len".as("len_a"), $"r.len".as("len_b"))
      .agg(count(lit(1)).as("__shared"))
      .join(dropped.select(col("id").as("id_a"),
        col("__dropped").as("__da")), Seq("id_a"))
      .join(dropped.select(col("id").as("id_b"),
        col("__dropped").as("__db")), Seq("id_b"))
      .filter(col("__shared") >=
        greatest(col("len_a"), col("len_b")) - (q - 1) - q * maxDist -
          col("__da") - col("__db"))
      .select(col("id_a"), col("id_b"))
    // short strings: too few grams for the bound — pair within length
    // bands via an EQUI-join on the band key (left side replicated to
    // each length within maxDist, right side at its own length), so
    // Spark shuffles on the key instead of planning a nested loop.
    // Each unordered pair is emitted exactly once (by the l.id < r.id
    // side whose band hits the other's length).
    val short = strs.filter(col("len") < minCovered)
    val banded = short
      .select(col("id"), col("len"),
        explode(sequence(col("len") - maxDist, col("len") + maxDist))
          .as("__band"))
    val shortPairs = banded.as("l")
      .join(short.as("r"),
        $"l.__band" === $"r.len" && $"l.id" < $"r.id")
      .select($"l.id".as("id_a"), $"r.id".as("id_b"))
    // a short and a long string can also pair when lengths differ by
    // <= maxDist across the minCovered boundary — the long side of
    // the band join is only lengths < minCovered + maxDist
    val bridge = banded.as("l")
      .join(long.filter(col("len") < minCovered + maxDist).as("r"),
        $"l.__band" === $"r.len")
      .select(least($"l.id", $"r.id").as("id_a"),
        greatest($"l.id", $"r.id").as("id_b"))
    val all = candidates.unionByName(shortPairs).unionByName(bridge)
      .distinct()
    all
      .join(strs.select(col("id").as("id_a"), col("s").as("str_a")),
        Seq("id_a"))
      .join(strs.select(col("id").as("id_b"), col("s").as("str_b")),
        Seq("id_b"))
      .filter(levenshtein(col("str_a"), col("str_b")) <= maxDist)
      .select(col("id_a"), col("id_b"), col("str_a"), col("str_b"),
        levenshtein(col("str_a"), col("str_b")).cast("long").as("dist"))
  }

  /** Keyed snapshot diff — the dataset-versioning primitive behind
    * "what changed between yesterday's export and today's": classify
    * every key as `added` (new only), `removed` (old only), or
    * `changed` (both sides, any compare column differs; null-safe).
    * Unchanged keys are dropped — at 100 TB the diff is the small
    * output, the snapshots are the big inputs.
    *
    * Keys must be unique per snapshot (enforce upstream with exact
    * dedup); with duplicate keys the join multiplies rows and the
    * classification is per-pair, not per-key.
    *
    * Scale shape: ONE full outer equi-join on the key columns — the
    * single data-sized shuffle — with the null-safe compare evaluated
    * as a codegen'd projection on the joined row. Column pruning
    * reaches both scans (only key + compare columns are read).
    *
    * @return key columns + (change_type) — `changed` rows carry each
    *         compare column twice as `<c>_old` / `<c>_new`
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    if (keyCols.isEmpty)
      throw InvalidArgumentValue("keyCols must be non-empty")
    if (compareCols.isEmpty)
      throw InvalidArgumentValue("compareCols must be non-empty")
    (keyCols ++ compareCols).foreach { c =>
      Seq(oldDf, newDf).foreach { df =>
        if (!df.columns.contains(c))
          throw InvalidArgumentValue(s"no such column: $c")
      }
    }
    val o = oldDf.select(
      (keyCols.map(col) :+ lit(1).as("__in_old")) ++
        compareCols.map(c => col(c).as(s"${c}_old")): _*)
    val n = newDf.select(
      (keyCols.map(col) :+ lit(1).as("__in_new")) ++
        compareCols.map(c => col(c).as(s"${c}_new")): _*)
    val joined = o.join(n, keyCols, "full_outer")
    val anyDiff = compareCols
      .map(c => !(col(s"${c}_old") <=> col(s"${c}_new")))
      .reduce(_ || _)
    joined
      .withColumn("change_type",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(anyDiff, lit("changed")))
      .filter(col("change_type").isNotNull)
      .select((keyCols.map(col) :+ col("change_type")) ++
        compareCols.flatMap(c =>
          Seq(col(s"${c}_old"), col(s"${c}_new"))): _*)
  }
}

package org.apache.spark.sql.execution

import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.Dataset

/** Replaces a checkpointed frame's frozen size ESTIMATE with the
  * MEASURED block size (graft's one Spark-internals escape hatch, the
  * `org.apache.spark.sql` package-object pattern ecosystem libraries
  * use for the same reason).
  *
  * Why it exists: `Dataset.localCheckpoint` freezes the pre-checkpoint
  * logical plan's `stats` into the resulting `LogicalRDD` leaf
  * (`originStats`) so downstream join-strategy decisions survive the
  * lineage cut. For ITERATIVE self-joining loops that is poison:
  * without column stats, Catalyst's size-only estimator multiplies
  * `sizeInBytes` through every inner join, so round N's estimate is
  * ~(round N−1's)² — the bit LENGTH of the BigInt doubles per round
  * and `java.math.BigInteger` overflows its 2³¹-bit ceiling at ~25
  * rounds (measured: graft's distributed pointer-jump loop at
  * maxIter=45 on a 2M-edge graph died in planning with "BigInteger
  * would overflow supported range" — BENCHNOTES round-11).
  *
  * The fix prefers strictly better stats and guarantees bounded ones:
  * the checkpoint is EAGER, so when BlockManager's status listener
  * has caught up the leaf's `originStats` becomes
  * `Statistics(measured mem+disk bytes)` — accurate for
  * broadcast-threshold decisions (a genuinely small iteration state
  * keeps broadcasting; quantile-refinement targets rely on that) and
  * constant across rounds. When the storage info is NOT yet visible
  * (the status bus is async and a tight driver loop outruns it), an
  * inherited estimate above Long.MaxValue is CAPPED there instead —
  * same join decisions as any huge size, planning-cost bounded, no
  * compounding past the cap. Small inherited estimates pass through
  * untouched.
  */
object GraftCheckpointStats {

  private val Cap = BigInt(Long.MaxValue)

  def withMeasuredStats[T](ds: org.apache.spark.sql.Dataset[T])
      : org.apache.spark.sql.Dataset[T] = {
    val classic = ds.asInstanceOf[Dataset[T]]
    val spark = classic.sparkSession
    val storage = spark.sparkContext.getRDDStorageInfo
    // A checkpointed Dataset's analyzed plan is exactly one LogicalRDD
    // leaf, so the rebuild matches the ROOT — deliberately NOT
    // plan.transform: LogicalRDD's case-class equality covers only its
    // first parameter list (originStats lives in the curried second
    // list), so a rebuilt node compares EQUAL to the original and
    // transform silently keeps the old node.
    classic.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val newStats = storage.find(_.id == l.rdd.id) match {
          case Some(info) if info.memSize + info.diskSize > 0 =>
            Some(Statistics(
              sizeInBytes = BigInt(info.memSize + info.diskSize)))
          case _ if l.stats.sizeInBytes > Cap =>
            Some(Statistics(sizeInBytes = Cap))
          case _ => None
        }
        newStats match {
          case Some(stats) =>
            // originStats/originConstraints live in LogicalRDD's
            // SECOND parameter list (invisible to copy) — rebuild the
            // leaf; constraints are an optimizer hint only, safe to
            // drop
            val leaf = LogicalRDD(l.output, l.rdd, l.outputPartitioning,
              l.outputOrdering, l.isStreaming, l.stream)(
              spark, Some(stats), None)
            Dataset.ofRows(spark, leaf).as(classic.encoder)
          case None => ds
        }
      case _ => ds
    }
  }
}

package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Lineage-cut helpers shared by the iterative / funnel operators.
  *
  * An eager `localCheckpoint` truncates a plan to a flat `LogicalRDD`
  * leaf — the tool this library uses to (a) bound iterative plan
  * growth (pointer jumping, quantile refinement, BPE rounds) and
  * (b) keep cached-frame NESTING out of explain trees (a persisted
  * frame re-prints its cached child at every reference, so deep
  * funnels otherwise render multiplicatively large plan strings —
  * see BENCHNOTES round 8). Checkpoint blocks live OUTSIDE the
  * CacheManager (`Dataset.unpersist`/`clearCache` cannot free them),
  * so every cut must hand its caller the backing RDDs for explicit
  * release.
  *
  * The RDDs are taken DIRECTLY from the checkpointed Dataset's
  * `LogicalRDD` node — never by diffing
  * `sparkContext.getPersistentRDDs` around the call. The diff looks
  * equivalent but is wrong under concurrency: the test harness (and
  * any multi-threaded driver) runs other queries against the same
  * SparkContext, and a diff window captures THEIR freshly
  * materialized persists/checkpoints, force-unpersisting blocks a
  * concurrent query still needs (measured:
  * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND failures under the parallel
  * test suite). Direct extraction releases exactly the blocks this
  * cut created.
  */
object Lineage {

  /** Eagerly checkpoint `df`, returning the flat frame and the
    * RDD(s) backing it. Callers unpersist those RDDs once every
    * consumer of the frame has materialized (the returned frame is
    * unreadable afterwards — its lineage is truncated).
    */
  def checkpointTracked[T](ds: Dataset[T]): (Dataset[T], Seq[RDD[_]]) = {
    val out0 = ds.localCheckpoint(true)
    // replace the frozen pre-checkpoint size ESTIMATE with the
    // MEASURED block size: localCheckpoint copies the original plan's
    // stats into the LogicalRDD leaf, and in an iterative self-joining
    // loop that estimate compounds quadratically round-over-round
    // until Catalyst's BigInt sizeInBytes overflows at ~25 rounds
    // (measured — see GraftCheckpointStats). The checkpoint is eager,
    // so the real size is known here.
    val out = org.apache.spark.sql.execution.GraftCheckpointStats
      .withMeasuredStats(out0)
    val rdds = out.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd
    }
    (out, rdds)
  }
}

package graft.tools

import scala.jdk.CollectionConverters._

import graft.GraftSession

/** Driver-heap headroom measurement for dupClusters' small-graph fast
  * path (round-9 verdict task #5 / advice #2): generates a seeded
  * random edge set at the requested size, takes the LOCAL union-find
  * path, and reports the JVM-wide PEAK heap delta across the call
  * (MemoryPoolMXBean peaks are reset immediately before, so the peak
  * captures the packed collect + sort/unique remap + LocalRelation
  * transients — the worst moment, not the after-GC steady state).
  *
  * Node count is the adversarial part: V = 2·E draws leave ~79% of
  * slots occupied, so distinct nodes ≈ 1.6·E — near the 2·E worst
  * case for the remap arrays and output rows.
  *
  * Mode `distributed` (round-10 verdict task #8) forces the
  * pointer-jump loop instead (maxDriverEdges=0) on the same seeded
  * graph — the crossover measurement for graphs above the 2M driver
  * cap: what does a 5M/20M-edge graph pay on the distributed path vs
  * a hypothetical larger-heap driver pass?
  *
  * Usage: runMain graft.tools.UnionFindMeasure [edges] [nodeSpace] [local|distributed] [maxIter]
  */
object UnionFindMeasure {

  private def heapUsed(): Long = {
    System.gc(); Thread.sleep(200); System.gc()
    val m = java.lang.management.ManagementFactory.getMemoryMXBean
    m.getHeapMemoryUsage.getUsed
  }

  private def resetPeaks(): Unit =
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .foreach(_.resetPeakUsage())

  private def peakUsed(): Long =
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(_.getPeakUsage.getUsed).sum

  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nodeSpace = args.lift(1).map(_.toLong).getOrElse(2 * nEdges)
    val mode = args.lift(2).getOrElse("local")
    val spark = GraftSession.builder("graft-ufmeasure", "local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // keep the per-round convergence curve visible under WARN
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.llm.Dedup$", org.apache.logging.log4j.Level.INFO)
    import org.apache.spark.sql.functions._

    // seeded splitmix-style endpoints; self-loops filtered so every
    // row is a real union
    val pairs = spark.range(nEdges)
      .select(
        pmod(hash(col("id"), lit(1)).cast("long") * 2654435761L,
          lit(nodeSpace)).as("id_a"),
        pmod(hash(col("id"), lit(2)).cast("long") * 2654435761L,
          lit(nodeSpace)).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val realEdges = pairs.count()

    spark.conf.set("graft.dedup.maxDriverEdges",
      if (mode == "distributed") "0" else (nEdges + 1).toString)
    val before = heapUsed()
    resetPeaks()
    val t0 = System.nanoTime()
    // maxIter defaults to dupClusters' auto budget (0 ⇒ log₂(2E)+8
    // rounds): the fixed 20 default FAILED here at 2M edges — this
    // graph family sits at the critical mean-degree-1 regime (tree
    // components, diameter ~n^⅓) and the loop's empirical round bound
    // is O(log n), the round-11 finding that made the budget adaptive.
    val labels = graft.llm.Dedup.dupClusters(pairs,
      maxIter = args.lift(3).map(_.toInt).getOrElse(0))
    val nLabels = labels.count()
    val wall = (System.nanoTime() - t0) / 1e9
    val peak = peakUsed()
    val after = heapUsed() // labels (LocalRelation) still referenced

    def mb(b: Long): Double = math.rint(b / 1e4) / 100
    println(s"""{"mode":"$mode","edges":$realEdges,"nodes":$nLabels,""" +
      s""""wall_sec":${math.rint(wall * 100) / 100},""" +
      s""""heap_before_mb":${mb(before)},"peak_heap_mb":${mb(peak)},""" +
      s""""peak_delta_mb":${mb(peak - before)},""" +
      s""""after_gc_with_result_mb":${mb(after)},""" +
      s""""retained_delta_mb":${mb(after - before)},""" +
      s""""max_heap_mb":${mb(Runtime.getRuntime.maxMemory)}}""")
    spark.stop()
  }
}

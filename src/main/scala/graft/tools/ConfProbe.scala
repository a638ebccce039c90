package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** TEMPORARY diagnostic: cached-plan partition counts with and
  * without spark.sql.optimizer.canChangeCachedPlanOutputPartitioning.
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-confprobe", "local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def probe(label: String): Unit = {
      val df = spark.range(1000)
        .select((col("id") % 7).as("k"), col("id").as("v"))
        .groupBy("k").agg(sum("v").as("s"))
        .persist()
      df.count()
      println(s"[probe] $label cached partitions = " +
        df.rdd.getNumPartitions)
      df.unpersist(true)
      // explicit-count repartition inside a cached plan: is it exempt?
      val df2 = spark.range(1000)
        .select((col("id") % 7).as("k"), col("id").as("v"))
        .repartition(32, col("k"))
        .groupBy("k").agg(sum("v").as("s"))
        .persist()
      df2.count()
      println(s"[probe] $label cached-with-pinned-repartition partitions = " +
        df2.rdd.getNumPartitions)
      df2.unpersist(true)
      // localCheckpoint partitioning (AQE applies to .rdd?)
      val df3 = spark.range(1000)
        .select((col("id") % 7).as("k"), col("id").as("v"))
        .groupBy("k").agg(sum("v").as("s"))
        .localCheckpoint(true)
      println(s"[probe] $label localCheckpoint partitions = " +
        df3.rdd.getNumPartitions)
    }

    probe("default")
    spark.conf.set(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    probe("canChange=true")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + engine configuration.
  *
  * Mirrors the reference's global-config surface
  * (reference: awswrangler/_config.py:25-42) as `graft.*` conf keys read
  * through `spark.conf`, and applies the scale-oriented defaults every
  * entry point relies on (AQE, UTC, sane shuffle parallelism).
  */
object GraftSession {

  /** Conf keys honored by the engine (set via SparkConf / spark.conf). */
  object confKeys {
    val database          = "graft.catalog.database"       // default db
    val cacheSeconds      = "graft.sql.maxCacheSeconds"    // result cache TTL
    val s3BlockSize       = "graft.fs.blockSize"           // passthrough to hadoop conf
    val concurrentWrites  = "graft.write.concurrent"
  }

  def builder(appName: String = "graft", master: String = "local[*]"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Helpers to expose the driver's testdata star schema as temp views so
  * `spark.sql` can reference bare table names — the engine-side analog
  * of Glue-table resolution (reference: awswrangler/athena/_read.py:743).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Read one parquet table from an sf directory. */
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register all tables in the sf directory as temp views; idempotent. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n =>
      read(spark, sfDir, n).createOrReplaceTempView(n)
    }
}

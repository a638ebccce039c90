package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, substring}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.exceptions._
import graft.types.AthenaTypes

/** Read-side operators (SURVEY.md §2.1; reference awswrangler/s3/
  * _read_parquet.py, _read_text.py).
  *
  * Spark-first mapping: the reference's hand-rolled listing/pruning/
  * union machinery collapses into one declarative scan — Hadoop globs
  * do the listing, Catalyst does partition pruning (partitionFilter
  * becomes a `Column` predicate on partition columns, pruned BEFORE
  * any data read, same guarantee as the reference's path callback),
  * and column pruning/predicate pushdown reach the parquet reader
  * automatically. Nothing here materializes on the driver.
  */
object Reader {

  /** Options mirroring the reference's read_parquet surface
    * (s3/_read_parquet.py:400-576), re-expressed for Catalyst:
    *
    * @param columns          projection (column pruning pushed to scan)
    * @param partitionFilter  predicate over partition columns —
    *                         replaces the reference's per-path callback;
    *                         Catalyst prunes directories before reading
    * @param dataset          treat path as a partitioned dataset root
    * @param mergeSchema      union schemas across files (reference's
    *                         validate_schema=False merge behavior)
    * @param validateSchema   strict: all files must share one schema
    *                         (reference: s3/_read_parquet.py:83-109)
    * @param pathSuffix       keep only files ending with one of these
    * @param pathIgnoreSuffix drop files ending with one of these
    * @param lastModifiedBegin/End epoch-ms window on file mtime
    *                         (reference: s3/_list.py:99-104)
    * @param dtype            per-column Athena-type-string cast
    *                         override applied after the read — the
    *                         reference's escape hatch for null columns
    *                         and forced types (reference:
    *                         _data_types.py:446-464)
    */
  case class ReadOptions(
      columns: Seq[String] = Nil,
      partitionFilter: Option[Column] = None,
      dataset: Boolean = false,
      mergeSchema: Boolean = false,
      validateSchema: Boolean = false,
      pathSuffix: Seq[String] = Nil,
      pathIgnoreSuffix: Seq[String] = Nil,
      lastModifiedBegin: Option[java.time.Instant] = None,
      lastModifiedEnd: Option[java.time.Instant] = None,
      dtype: Map[String, String] = Map.empty,
      options: Map[String, String] = Map.empty)

  /** Surface the reference's NoFilesFound instead of Spark's
    * AnalysisException when a read path simply isn't there.
    */
  private def translateMissingPath[T](paths: Seq[String])(read: => T): T =
    try read
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if Option(e.getErrorClass).exists(_.contains("PATH_NOT_FOUND")) =>
        throw NoFilesFound(
          s"no files under ${paths.mkString(", ")}: ${e.getMessage}")
    }

  /** Apply the Athena-type dtype override: cast listed columns,
    * leave the rest untouched.
    */
  private def applyDtype(df: DataFrame,
                         dtype: Map[String, String]): DataFrame =
    if (dtype.isEmpty) df
    else {
      val missing = dtype.keys.filterNot(df.columns.contains)
      if (missing.nonEmpty)
        throw InvalidArgumentValue(
          s"dtype columns not in data: ${missing.mkString(", ")}")
      df.select(df.columns.map { c =>
        dtype.get(c) match {
          case Some(t) => col(c).cast(AthenaTypes.toSpark(t)).as(c)
          case None    => col(c)
        }
      }: _*)
    }

  def readParquet(spark: SparkSession, paths: Seq[String],
                  opts: ReadOptions = ReadOptions()): DataFrame = {
    if (paths.isEmpty) throw InvalidArgumentValue("paths must be non-empty")
    var reader = spark.read
    if (opts.mergeSchema) reader = reader.option("mergeSchema", "true")
    opts.pathSuffix match {
      case Seq(one) => reader = reader.option("pathGlobFilter", s"*$one")
      case _ => () // multiple suffixes filtered below via listing
    }
    opts.lastModifiedBegin.foreach(i =>
      reader = reader.option("modifiedAfter", i.toString))
    opts.lastModifiedEnd.foreach(i =>
      reader = reader.option("modifiedBefore", i.toString))
    reader = reader.options(opts.options)

    val resolvedPaths =
      if (opts.pathSuffix.size > 1 || opts.pathIgnoreSuffix.nonEmpty) {
        // multi-suffix filters need explicit listing (still driver-side
        // metadata only, no data read)
        paths.flatMap(p => FsOps.listObjects(spark, p,
          suffix = opts.pathSuffix, ignoreSuffix = opts.pathIgnoreSuffix)
          .map(_.path))
      } else paths

    if (resolvedPaths.isEmpty) throw NoFilesFound(s"no files under $paths")

    if (opts.validateSchema) validateEqualSchemas(spark, resolvedPaths)

    var df = translateMissingPath(resolvedPaths) {
      reader.parquet(resolvedPaths: _*)
    }
    opts.partitionFilter.foreach(pf => df = df.filter(pf))
    if (opts.columns.nonEmpty)
      df = df.select(opts.columns.map(col): _*)
    applyDtype(df, opts.dtype)
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    readParquet(spark, Seq(path))

  def readParquet(spark: SparkSession, path: String, opts: ReadOptions): DataFrame =
    readParquet(spark, Seq(path), opts)

  /** Strict schema-equality pre-pass (reference raises on divergence,
    * s3/_read_parquet.py:83-121). Footer-only reads, fanned out on a
    * driver thread pool — the reference read footers concurrently too
    * (s3/_read_parquet.py:83-109); serial reads over thousands of
    * objects would make the pre-pass the bottleneck.
    */
  private def validateEqualSchemas(spark: SparkSession, paths: Seq[String]): Unit = {
    val schemas =
      FsOps.parallelMap(paths)(p => p -> spark.read.parquet(p).schema)
    val distinct = schemas.map(_._2).distinct
    if (distinct.size > 1)
      throw InvalidSchemaConvergence(
        s"schemas diverge across files: ${schemas.map { case (p, s) =>
          s"$p -> ${s.simpleString}" }.mkString("; ")}")
  }

  /** Schema + partition types without reading data (reference:
    * s3.read_parquet_metadata). Returns (columnsTypes, partitionsTypes)
    * as Athena type strings; partition columns are detected from the
    * dataset layout.
    */
  def readParquetMetadata(spark: SparkSession, path: String,
                          dataset: Boolean = false)
      : (Map[String, String], Map[String, String]) = {
    val df = spark.read.parquet(path)
    val partitionCols: Set[String] =
      if (dataset) partitionColumnsOf(spark, path) else Set.empty
    val all = AthenaTypes.fromSchema(df.schema).toMap
    (all.view.filterKeys(!partitionCols.contains(_)).toMap,
     all.view.filterKeys(partitionCols.contains).toMap)
  }

  /** Listing-free partitioned read via PARTITION PROJECTION: partition
    * directories are COMPUTED from the per-column value domains
    * (cartesian product, in column order) instead of listed from
    * storage — the point of Athena's partition projection
    * (reference: catalog/_create.py:56-95) and the thing that saves
    * minutes of S3 LIST calls on tables with millions of partitions.
    * `basePath` keeps the partition columns in the schema. Paths whose
    * projected combination doesn't exist are skipped (spark handles
    * missing leaf dirs when at least one exists).
    */
  def readProjectedPartitions(spark: SparkSession, root: String,
                              partitionValues: Seq[(String, Seq[String])],
                              opts: ReadOptions = ReadOptions()): DataFrame = {
    if (partitionValues.isEmpty)
      throw InvalidArgumentValue("partitionValues must be non-empty")
    val base = root.stripSuffix("/")
    val combos = partitionValues.foldLeft(Seq("")) { case (acc, (k, vs)) =>
      for { prefix <- acc; v <- vs } yield s"$prefix/$k=$v"
    }
    // parallel existence probes (one HEAD per projected dir) — still
    // O(|projection|) round trips but no recursive LIST; callers with
    // guaranteed-dense domains can skip by pre-filtering their values
    val paths = FsOps.parallelMap(combos.map(c => s"$base$c")) { p =>
      p -> FsOps.doesObjectExist(spark, p)
    }.collect { case (p, true) => p }
    if (paths.isEmpty)
      throw NoFilesFound(
        s"no projected partitions exist under $root for $partitionValues")
    // options that only make sense against a LISTED dataset are
    // rejected rather than silently ignored
    if (opts.pathSuffix.nonEmpty || opts.pathIgnoreSuffix.nonEmpty ||
        opts.validateSchema || opts.lastModifiedBegin.isDefined ||
        opts.lastModifiedEnd.isDefined)
      throw InvalidArgumentCombination(
        "readProjectedPartitions supports columns/dtype/partitionFilter/" +
          "mergeSchema/options only")
    var reader = spark.read.option("basePath", base)
    if (opts.mergeSchema) reader = reader.option("mergeSchema", "true")
    var df = reader.options(opts.options).parquet(paths: _*)
    opts.partitionFilter.foreach(pf => df = df.filter(pf))
    if (opts.columns.nonEmpty) df = df.select(opts.columns.map(col): _*)
    applyDtype(df, opts.dtype)
  }

  /** Partition column names inferred from `k=v` directory layout. */
  def partitionColumnsOf(spark: SparkSession, root: String): Set[String] =
    FsOps.listObjects(spark, root).map(_.path).flatMap { p =>
      p.stripPrefix(root.stripSuffix("/") + "/").split('/').dropRight(1)
        .filter(_.contains('=')).map(_.split('=')(0))
    }.toSet

  /** CSV reader with pandas-kwargs-style passthrough (reference:
    * s3.read_csv; kwargs become DataFrameReader options).
    */
  def readCsv(spark: SparkSession, paths: Seq[String],
              schema: Option[StructType] = None,
              options: Map[String, String] = Map.empty,
              opts: ReadOptions = ReadOptions()): DataFrame = {
    var reader = spark.read
      .option("header", "true")
      .options(options)
    schema match {
      case Some(s) => reader = reader.schema(s)
      case None    => reader = reader.option("inferSchema", "true")
    }
    var df = translateMissingPath(paths) { reader.csv(paths: _*) }
    opts.partitionFilter.foreach(pf => df = df.filter(pf))
    if (opts.columns.nonEmpty) df = df.select(opts.columns.map(col): _*)
    applyDtype(df, opts.dtype)
  }

  /** JSON / JSON-lines (reference: s3.read_json; lines=True default,
    * non-lines orients → multiLine).
    */
  def readJson(spark: SparkSession, paths: Seq[String],
               lines: Boolean = true,
               schema: Option[StructType] = None,
               options: Map[String, String] = Map.empty): DataFrame = {
    var reader = spark.read.options(options)
    if (!lines) reader = reader.option("multiLine", "true")
    schema.foreach(s => reader = reader.schema(s))
    translateMissingPath(paths) { reader.json(paths: _*) }
  }

  /** Fixed-width files (reference: s3.read_fwf). Spark has no native
    * FWF source: read as text and generate substring projections from
    * (name, width) specs — stays fully codegen'd and distributed.
    */
  def readFwf(spark: SparkSession, paths: Seq[String],
              widths: Seq[Int], names: Seq[String],
              dtype: Map[String, String] = Map.empty): DataFrame = {
    if (widths.size != names.size)
      throw InvalidArgumentCombination(
        s"widths(${widths.size}) and names(${names.size}) must align")
    val starts = widths.scanLeft(1)(_ + _)
    val projections = names.zip(widths).zip(starts).map {
      case ((name, width), start) =>
        val c = substring(col("value"), start, width).as(name)
        dtype.get(name) match {
          case Some(t) =>
            // trim then cast via the Athena type bridge
            org.apache.spark.sql.functions.trim(substring(col("value"), start, width))
              .cast(AthenaTypes.toSpark(t)).as(name)
          case None => c
        }
    }
    spark.read.text(paths: _*).select(projections: _*)
  }

  /** Driver-side bounded iteration adapter for the reference's
    * `chunked=N` generators (s3/_read_parquet.py:257-325). The lazy
    * DataFrame replaces the need in pipelines; this exists for parity
    * where a caller genuinely wants bounded-memory local iteration.
    */
  def toLocalChunks(df: DataFrame, chunkRows: Int): Iterator[Seq[Row]] = {
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala.grouped(chunkRows)
  }
}

package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.exceptions._
import graft.sources.FsOps

/** Write-side operators (SURVEY.md §2.2; reference awswrangler/s3/
  * _write_parquet.py:450-573, _write_dataset.py:16-92,
  * _write_text.py:58-546).
  *
  * Spark-first mapping: the reference's pandas `groupby(partition_cols)`
  * → per-directory writer fan-out collapses into
  * `df.write.partitionBy(...)` — executors parallelize partition writes
  * natively and the commit protocol replaces the reference's manual
  * delete-then-write. The three dataset modes map to:
  *
  *   append               → SaveMode.Append
  *   overwrite            → SaveMode.Overwrite + static partition
  *                          overwrite (whole prefix replaced, like the
  *                          reference's delete-prefix-first at
  *                          s3/_write_dataset.py:68-69)
  *   overwrite_partitions → SaveMode.Overwrite + DYNAMIC partition
  *                          overwrite (only touched `k=v` dirs replaced,
  *                          s3/_write_dataset.py:29-35)
  *
  * `schemaEvolution=false` reproduces the reference's guard
  * (s3/_write_parquet.py:27-41): appending a frame whose schema adds a
  * column or changes a type versus the existing dataset raises
  * InvalidArgumentValue instead of silently diverging files.
  */
object Writer {

  val Modes = Set("append", "overwrite", "overwrite_partitions")

  /** Options mirroring the reference's to_parquet/to_csv/to_json
    * surface (s3/_write_parquet.py:196-573).
    *
    * @param dataset        partitioned-dataset semantics (modes,
    *                       partitionCols, schema evolution guard)
    * @param partitionCols  Hive-style partition columns
    * @param mode           append | overwrite | overwrite_partitions
    * @param schemaEvolution when false, reject new columns / changed
    *                       types vs the existing dataset schema
    * @param maxRowsByFile  cap rows per output file (reference's
    *                       max_rows_by_file → maxRecordsPerFile)
    * @param compression    parquet/text codec (snappy | gzip | none …)
    * @param singleFile     file-mode only: coalesce to one output file
    *                       (the reference's one-object-per-call shape)
    * @param filesPerPartition pre-shuffle rows so each `k=v` dir gets at
    *                       most this many files. Without it, partitionBy
    *                       emits (#tasks × #partition-values) files — the
    *                       small-files problem that kills listing and
    *                       scan throughput at 100 TB. Implemented as
    *                       repartition(partitionCols + salt) so large
    *                       partitions still write in parallel.
    * @param options        passthrough DataFrameWriter options
    *                       (reference's pandas_kwargs)
    */
  case class WriteOptions(
      dataset: Boolean = false,
      partitionCols: Seq[String] = Nil,
      mode: String = "append",
      schemaEvolution: Boolean = true,
      maxRowsByFile: Option[Long] = None,
      compression: Option[String] = None,
      singleFile: Boolean = false,
      filesPerPartition: Option[Int] = None,
      options: Map[String, String] = Map.empty)

  def toParquet(spark: SparkSession, df: DataFrame, path: String,
                opts: WriteOptions = WriteOptions()): Unit =
    write(spark, df, path, "parquet", opts)

  def toCsv(spark: SparkSession, df: DataFrame, path: String,
            opts: WriteOptions = WriteOptions()): Unit =
    write(spark, df, path, "csv",
      opts.copy(options = Map("header" -> "true") ++ opts.options))

  def toJson(spark: SparkSession, df: DataFrame, path: String,
             opts: WriteOptions = WriteOptions()): Unit =
    write(spark, df, path, "json", opts)

  private def write(spark: SparkSession, df: DataFrame, path: String,
                    format: String, opts: WriteOptions): Unit = {
    validate(df, opts)
    if (opts.dataset && !opts.schemaEvolution)
      checkSchemaEvolution(spark, df, path, opts)

    var out = df
    if (opts.singleFile && !opts.dataset) out = out.coalesce(1)
    // graft.write.concurrent supplies the default file fan-out per
    // partition when the caller doesn't pass one (the reference's
    // concurrent_partitioning config, _config.py:25-42)
    val filesPerPartition = opts.filesPerPartition.orElse(
      spark.conf.getOption(graft.GraftSession.confKeys.concurrentWrites)
        .flatMap(v => scala.util.Try(v.toInt).toOption))
    filesPerPartition.foreach { n =>
      if (n <= 0) throw InvalidArgumentValue(
        s"filesPerPartition must be positive, got $n")
      if (opts.dataset && opts.partitionCols.nonEmpty) {
        // co-locate each partition's rows onto ≤ n tasks: hash on the
        // partition values plus an n-way salt hashed from the row —
        // a spark_partition_id() salt would cap the fan-out at the
        // number of INPUT partitions, under-delivering when the
        // upstream frame arrives in fewer than n partitions.
        // hash() rejects MapType at plan time, so map-bearing columns
        // stay out of the salt; if NOTHING is hashable fall back to
        // the partition-id salt (safe, input-width-capped). Column
        // refs are backtick-quoted — col("a.b") would parse as struct
        // access. Known limit: rows identical across all hashable
        // columns share one salt bucket, so a constant-duplicate-heavy
        // frame under-fans; there is no DETERMINISTIC disambiguator
        // for identical rows, and a nondeterministic one (rand/
        // partition-id mixes) risks row loss on task retry under a
        // repartition. The <= n cap always holds.
        import org.apache.spark.sql.functions.{col, hash, lit, pmod, spark_partition_id}
        def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean =
          dt match {
            case _: org.apache.spark.sql.types.MapType => true
            case s: org.apache.spark.sql.types.StructType =>
              s.fields.exists(f => hasMap(f.dataType))
            case a: org.apache.spark.sql.types.ArrayType =>
              hasMap(a.elementType)
            case _ => false
          }
        def q(name: String) = col(s"`${name.replace("`", "``")}`")
        val hashable = df.schema.fields
          .filterNot(f => hasMap(f.dataType)).map(f => q(f.name))
        val salt =
          if (hashable.nonEmpty) pmod(hash(hashable: _*), lit(n))
          else pmod(spark_partition_id(), lit(n))
        out = out.repartition(opts.partitionCols.map(q) :+ salt: _*)
      } else out = out.coalesce(n)
    }

    var writer = out.write.format(format)
    opts.compression.foreach(c => writer = writer.option("compression", c))
    opts.maxRowsByFile.foreach(n =>
      writer = writer.option("maxRecordsPerFile", n.toString))
    writer = writer.options(opts.options)

    if (opts.dataset) {
      if (opts.partitionCols.nonEmpty)
        writer = writer.partitionBy(opts.partitionCols: _*)
      opts.mode match {
        case "append" =>
          writer.mode("append").save(path)
        case "overwrite" =>
          // static: the whole dataset prefix is replaced
          writer.mode("overwrite")
            .option("partitionOverwriteMode", "static").save(path)
        case "overwrite_partitions" =>
          // dynamic: only partitions present in df are replaced
          writer.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic").save(path)
      }
    } else {
      // file mode: one parquet/csv/json object per call in the
      // reference (s3/_write_parquet.py:140-192); modes beyond plain
      // write need dataset=true, matching its InvalidArgumentCombination
      if (opts.mode != "append" && opts.mode != "overwrite")
        throw InvalidArgumentCombination(
          s"mode=${opts.mode} requires dataset=true")
      writer.mode(opts.mode).save(path)
    }
  }

  /** Bucketed managed table: rows are hash-bucketed (and optionally
    * sorted) on the given columns, so equi-joins and aggregations on
    * those keys between co-bucketed tables run with NO shuffle — the
    * pre-partitioning strategy for repeated 100 TB joins (bucket
    * pruning + exchange elimination are free afterwards). Bucketing
    * requires the table path (`saveAsTable`), not a bare directory.
    */
  def toBucketedTable(spark: SparkSession, df: DataFrame,
                      database: String, table: String,
                      bucketCols: Seq[String], numBuckets: Int,
                      sortCols: Seq[String] = Nil,
                      mode: String = "overwrite",
                      format: String = "parquet"): Unit = {
    // bucketed managed tables support plain append/overwrite only —
    // no dynamic partition overwrite semantics
    if (mode != "append" && mode != "overwrite")
      throw InvalidArgumentValue(
        s"toBucketedTable mode must be append|overwrite, got $mode")
    validate(df, WriteOptions(mode = mode))
    if (bucketCols.isEmpty || numBuckets <= 0)
      throw InvalidArgumentValue(
        s"need bucketCols and positive numBuckets, got $bucketCols/$numBuckets")
    var w = df.write.format(format).mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty)
      w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(s"`$database`.`$table`")
  }

  /** Dataset write + catalog registration in one call, with the
    * reference's rollback contract (s3/_write_parquet.py:534-572): if
    * the catalog commit fails, the files THIS call wrote are deleted
    * before the error is rethrown, so data and metadata never diverge.
    */
  def toParquetCataloged(spark: SparkSession, df: DataFrame, path: String,
                         database: String, table: String,
                         opts: WriteOptions = WriteOptions()): Unit = {
    val effective = opts.copy(dataset = true)
    val before: Set[String] =
      if (FsOps.doesObjectExist(spark, path))
        FsOps.listObjects(spark, path).map(_.path).toSet
      else Set.empty
    toParquet(spark, df, path, effective)
    try {
      val (cols, parts) =
        graft.catalog.Catalog.extractAthenaTypes(df, effective.partitionCols)
      val catalogMode =
        if (effective.mode == "overwrite") "overwrite" else "append"
      graft.catalog.Catalog.createParquetTable(spark, database, table, path,
        cols, parts, catalogMode)
      if (effective.partitionCols.nonEmpty)
        graft.catalog.Catalog.repairTable(spark, database, table)
      // append mode reaches here without any DDL (createParquetTable
      // keeps an existing definition), but the path's DATA changed —
      // a cached SELECT must not serve the pre-write result within TTL
      graft.sql.Sql.invalidateCache(spark)
    } catch {
      case e: Throwable =>
        val fresh = FsOps.listObjects(spark, path).map(_.path)
          .filterNot(before)
        FsOps.deleteObjects(spark, fresh)
        throw e
    }
  }

  private def validate(df: DataFrame, opts: WriteOptions): Unit = {
    if (df.schema.isEmpty)
      throw EmptyDataFrame("DataFrame has no columns")
    val dup = df.columns.groupBy(identity).collect {
      case (c, hits) if hits.length > 1 => c
    }
    if (dup.nonEmpty)
      throw InvalidDataFrame(s"Duplicated column names: ${dup.mkString(", ")}")
    if (!Modes(opts.mode))
      throw InvalidArgumentValue(
        s"mode must be one of ${Modes.mkString("|")}, got ${opts.mode}")
    if (!opts.dataset && opts.partitionCols.nonEmpty)
      throw InvalidArgumentCombination(
        "partitionCols requires dataset=true")
    val missing = opts.partitionCols.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw InvalidArgumentValue(
        s"partitionCols not in DataFrame: ${missing.mkString(", ")}")
  }

  /** Reject new columns / changed types versus the existing dataset
    * (reference: s3/_write_parquet.py:27-41). Footer-only read of the
    * current dataset schema; no data is touched. Absent targets pass.
    */
  private def checkSchemaEvolution(spark: SparkSession, df: DataFrame,
                                   path: String, opts: WriteOptions): Unit = {
    if (opts.mode == "overwrite") return // full replace: any schema ok
    if (!FsOps.doesObjectExist(spark, path)) return
    if (FsOps.listObjects(spark, path).isEmpty) return
    val existing = spark.read.parquet(path).schema
    val existingTypes = existing.fields.map(f => f.name -> f.dataType).toMap
    val partitionCols = opts.partitionCols.toSet
    df.schema.fields.foreach { f =>
      existingTypes.get(f.name) match {
        case None =>
          throw InvalidArgumentValue(
            s"schema_evolution=false: new column '${f.name}' not in " +
              s"existing dataset schema ${existing.simpleString}")
        case Some(t) if t != f.dataType &&
            !partitionCols.contains(f.name) =>
          // partition columns are exempt from the type check: their
          // values round-trip through directory names and Hive
          // partition-type INFERENCE (long → int, etc.), so a
          // mismatch there is an artifact of discovery, not evolution
          throw InvalidArgumentValue(
            s"schema_evolution=false: column '${f.name}' type " +
              s"${f.dataType.simpleString} != existing ${t.simpleString}")
        case _ => ()
      }
    }
  }
}

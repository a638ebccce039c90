package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.exceptions._
import graft.sources.Reader
import graft.sql.SqlText.lit
import graft.types.AthenaTypes

/** Catalog operators over the Spark session catalog / metastore
  * (SURVEY.md §2.5; reference awswrangler/catalog/_create.py:27-773,
  * _get.py:101-484, _add.py:38-159, _delete.py:17-183).
  *
  * The reference drives the Glue API with TableInput dicts; here every
  * operation is Spark DDL / `spark.catalog`, so the same tables are
  * visible to `spark.sql`, `spark.table`, and any metastore-backed
  * deployment (in-memory catalog locally, Hive metastore on a
  * cluster). Identifiers are backtick-quoted; column/table names are
  * sanitized with the reference's Athena rules on creation.
  */
object Catalog {

  /** Mutating DDL changes what a `SELECT` can see, so every mutating
    * entry point below drops the session's SQL result cache — an
    * engine extension beyond the reference's TTL-only reuse (a cached
    * result must never serve pre-overwrite data inside its TTL).
    */
  private def invalidateSqlCache(spark: SparkSession): Unit =
    graft.sql.Sql.invalidateCache(spark)

  private def q(ident: String): String = s"`${ident.replace("`", "``")}`"
  private def qt(database: String, table: String): String =
    s"${q(database)}.${q(table)}"

  // ------------------------------------------------------------------ //
  // databases                                                          //
  // ------------------------------------------------------------------ //

  /** reference: catalog.create_database (catalog/_create.py:468-510) */
  def createDatabase(spark: SparkSession, name: String,
                     description: String = ""): Unit = {
    val comment =
      if (description.nonEmpty) s" COMMENT ${lit(spark, description)}"
      else ""
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${q(name)}$comment")
    invalidateSqlCache(spark)
  }

  /** reference: catalog.delete_database (catalog/_delete.py:17-44) */
  def deleteDatabase(spark: SparkSession, name: String,
                     cascade: Boolean = true): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS ${q(name)}" +
      (if (cascade) " CASCADE" else ""))
    invalidateSqlCache(spark)
  }

  /** Database names as a DataFrame (reference: catalog.databases). */
  def databases(spark: SparkSession): DataFrame =
    spark.sql("SHOW DATABASES")

  // ------------------------------------------------------------------ //
  // tables                                                             //
  // ------------------------------------------------------------------ //

  /** reference: catalog.does_table_exist (catalog/_utils.py:39-67) */
  def doesTableExist(spark: SparkSession, database: String,
                     table: String): Boolean =
    spark.catalog.tableExists(qt(database, table))

  /** Create an external table over an existing path.
    *
    * reference: catalog.create_parquet_table
    * (catalog/_create.py:513-637); modes: `overwrite` drops and
    * recreates (archiving the old schema into the version log, the
    * engine's emulation of Glue table versioning —
    * catalog/_get.py:896-969), `append`/`update` keep an existing
    * table. Types are Athena type strings (the reference's contract),
    * bridged through AthenaTypes.
    */
  def createParquetTable(spark: SparkSession, database: String,
                         table: String, path: String,
                         columnsTypes: Seq[(String, String)],
                         partitionsTypes: Seq[(String, String)] = Nil,
                         mode: String = "overwrite",
                         description: String = "",
                         parameters: Map[String, String] = Map.empty,
                         columnsComments: Map[String, String] = Map.empty): Unit =
    createTable(spark, database, table, path, columnsTypes,
      partitionsTypes, mode, description, parameters, "PARQUET",
      Map.empty, columnsComments)

  /** reference: catalog.create_csv_table (catalog/_create.py:640-773) */
  def createCsvTable(spark: SparkSession, database: String, table: String,
                     path: String,
                     columnsTypes: Seq[(String, String)],
                     partitionsTypes: Seq[(String, String)] = Nil,
                     mode: String = "overwrite",
                     sep: String = ",",
                     skipHeaderLines: Int = 0,
                     parameters: Map[String, String] = Map.empty): Unit =
    createTable(spark, database, table, path, columnsTypes,
      partitionsTypes, mode, "", parameters, "CSV",
      Map("sep" -> sep, "header" -> (skipHeaderLines > 0).toString),
      Map.empty)

  private def createTable(spark: SparkSession, database: String,
                          table: String, path: String,
                          columnsTypes: Seq[(String, String)],
                          partitionsTypes: Seq[(String, String)],
                          mode: String, description: String,
                          parameters: Map[String, String],
                          format: String,
                          formatOptions: Map[String, String],
                          columnsComments: Map[String, String]): Unit = {
    if (columnsTypes.isEmpty)
      throw InvalidArgumentValue("columnsTypes must be non-empty")
    val exists = doesTableExist(spark, database, table)
    // version-log emulation of Glue table versioning: on overwrite of
    // an existing table, archive the outgoing schema into properties
    var archived: Map[String, String] = Map.empty
    mode match {
      case "overwrite" =>
        if (exists) {
          val prev = getTableParameters(spark, database, table)
          val prevVersion = prev.getOrElse("graft.version", "1").toInt
          archived = prev.view.filterKeys(_.startsWith("graft.version"))
            .toMap ++ Map(
            "graft.version" -> (prevVersion + 1).toString,
            s"graft.version.$prevVersion.schema" ->
              spark.table(qt(database, table)).schema.toDDL)
          deleteTableIfExists(spark, database, table)
        }
      case "append" | "update" =>
        if (exists) return // keep the existing definition
      case other =>
        throw InvalidArgumentValue(
          s"mode must be overwrite|append|update, got $other")
    }
    // data columns first, partition columns last (Hive layout); all
    // sanitized + bridged through the Athena type grammar
    def colsDdl(cols: Seq[(String, String)]): String =
      cols.map { case (n, t) =>
        val comment = columnsComments.get(n)
          .map(c => s" COMMENT ${lit(spark, c)}").getOrElse("")
        s"${q(AthenaTypes.sanitizeName(n))} ${AthenaTypes.toSpark(t).sql}$comment"
      }.mkString(", ")
    val partClause =
      if (partitionsTypes.isEmpty) ""
      else s" PARTITIONED BY (${partitionsTypes
        .map(p => q(AthenaTypes.sanitizeName(p._1))).mkString(", ")})"
    val optClause =
      if (formatOptions.isEmpty) ""
      else s" OPTIONS (${formatOptions
        .map { case (k, v) => s"${lit(spark, k)} ${lit(spark, v)}" }.mkString(", ")})"
    val commentClause =
      if (description.nonEmpty) s" COMMENT ${lit(spark, description)}"
      else ""
    val allProps = parameters ++ archived
    val propsClause =
      if (allProps.isEmpty) ""
      else s" TBLPROPERTIES (${allProps
        .map { case (k, v) => s"${lit(spark, k)}=${lit(spark, v)}" }
        .mkString(", ")})"
    spark.sql(
      s"CREATE TABLE ${qt(database, table)} " +
        s"(${colsDdl(columnsTypes ++ partitionsTypes)}) " +
        s"USING $format$optClause$partClause$commentClause" +
        s" LOCATION ${lit(spark, path)}$propsClause")
    if (partitionsTypes.nonEmpty) repairTable(spark, database, table)
    invalidateSqlCache(spark)
  }

  /** Glue-table-version emulation: the current version number plus the
    * archived schemas recorded by overwrites (reference:
    * catalog.get_table_versions, catalog/_get.py:896-969 — a
    * documented Glue-only feature reproduced via table properties).
    */
  def getTableVersions(spark: SparkSession, database: String,
                       table: String): Seq[(Int, String)] = {
    val props = getTableParameters(spark, database, table)
    val current = props.getOrElse("graft.version", "1").toInt
    val past = props.collect {
      case (k, v) if k.startsWith("graft.version.") &&
          k.endsWith(".schema") =>
        k.stripPrefix("graft.version.").stripSuffix(".schema").toInt -> v
    }.toSeq
    (past :+ (current -> spark.table(qt(database, table)).schema.toDDL))
      .sortBy(_._1)
  }

  def getTableNumberOfVersions(spark: SparkSession, database: String,
                               table: String): Int =
    getTableVersions(spark, database, table).size

  /** Register partitions discovered on disk (the reference's
    * "no MSCK REPAIR needed" add-all path, catalog/_add.py:38-159,
    * is exactly what RECOVER PARTITIONS does natively).
    */
  def repairTable(spark: SparkSession, database: String, table: String): Unit = {
    spark.sql(s"MSCK REPAIR TABLE ${qt(database, table)}")
    invalidateSqlCache(spark)
  }

  /** Explicit partition registration
    * (reference: catalog.add_parquet_partitions).
    */
  def addPartitions(spark: SparkSession, database: String, table: String,
                    partitions: Seq[Map[String, String]]): Unit = {
    partitions.foreach { spec =>
      val kv = spec.map { case (k, v) =>
        s"${q(k)}=${lit(spark, v)}" }.mkString(", ")
      spark.sql(
        s"ALTER TABLE ${qt(database, table)} ADD IF NOT EXISTS PARTITION ($kv)")
    }
    invalidateSqlCache(spark)
  }

  /** Partition specs currently registered
    * (reference: catalog.get_partitions).
    */
  def getPartitions(spark: SparkSession, database: String,
                    table: String): Seq[Map[String, String]] =
    spark.sql(s"SHOW PARTITIONS ${qt(database, table)}")
      .collect().toSeq.map { row =>
        row.getString(0).split('/').map { seg =>
          val Array(k, v) = seg.split("=", 2)
          k -> v
        }.toMap
      }

  def deletePartitions(spark: SparkSession, database: String, table: String,
                       partitions: Seq[Map[String, String]]): Unit = {
    partitions.foreach { spec =>
      val kv = spec.map { case (k, v) =>
        s"${q(k)}=${lit(spark, v)}" }.mkString(", ")
      spark.sql(
        s"ALTER TABLE ${qt(database, table)} DROP IF EXISTS PARTITION ($kv)")
    }
    invalidateSqlCache(spark)
  }

  /** reference: catalog.delete_table_if_exists (catalog/_delete.py:47) */
  def deleteTableIfExists(spark: SparkSession, database: String,
                          table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${qt(database, table)}")
    invalidateSqlCache(spark)
  }

  /** Table metadata as a DataFrame (reference: catalog.tables returns a
    * pandas DF of table metadata).
    */
  def getTables(spark: SparkSession, database: String): DataFrame =
    spark.sql(s"SHOW TABLES IN ${q(database)}")

  /** Rich table listing across one or all databases (reference:
    * catalog.tables, catalog/_get.py:253-322): database, table,
    * description, type, temporary flag.
    */
  def tables(spark: SparkSession,
             database: Option[String] = None): DataFrame = {
    import spark.implicits._
    val dbs = database.map(Seq(_)).getOrElse(
      spark.catalog.listDatabases().collect().map(_.name).toSeq)
    dbs.flatMap { db =>
      spark.catalog.listTables(db).collect().map { t =>
        (Option(t.database).getOrElse(""), t.name,
          Option(t.description).getOrElse(""), t.tableType,
          t.isTemporary)
      }
    }.toDF("database", "table", "description", "table_type",
      "is_temporary")
  }

  /** Substring search over table names + descriptions (reference:
    * catalog.search_tables, catalog/_get.py:323-380).
    */
  def searchTables(spark: SparkSession, text: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lower => lc, lit}
    tables(spark).filter(
      lc(col("table")).contains(text.toLowerCase) ||
        lc(col("description")).contains(text.toLowerCase))
  }

  /** Table-level description/comment (reference:
    * catalog.get_table_description).
    */
  def getTableDescription(spark: SparkSession, database: String,
                          table: String): Option[String] =
    Option(spark.catalog.getTable(database, table).description)
      .filter(_.nonEmpty)

  /** {column -> comment} (reference: catalog.get_columns_comments). */
  def getColumnsComments(spark: SparkSession, database: String,
                         table: String): Map[String, String] =
    spark.catalog.listColumns(qt(database, table)).collect()
      .flatMap(c => Option(c.description).filter(_.nonEmpty)
        .map(c.name -> _)).toMap

  /** Athena partition-projection properties (reference:
    * catalog/_create.py:56-95): stored as TBLPROPERTIES passthrough —
    * meaningful to Athena readers of the same metastore; Spark itself
    * prunes from discovered partitions, so these are interop metadata
    * (SURVEY.md §4 item 12).
    */
  def buildProjectionParameters(
      types: Map[String, String] = Map.empty,
      ranges: Map[String, String] = Map.empty,
      values: Map[String, String] = Map.empty,
      intervals: Map[String, String] = Map.empty,
      digits: Map[String, String] = Map.empty,
      formats: Map[String, String] = Map.empty): Map[String, String] = {
    val enabled =
      if (types.nonEmpty) Map("projection.enabled" -> "true")
      else Map.empty[String, String]
    enabled ++
      types.map { case (c, v) => s"projection.$c.type" -> v } ++
      ranges.map { case (c, v) => s"projection.$c.range" -> v } ++
      values.map { case (c, v) => s"projection.$c.values" -> v } ++
      intervals.map { case (c, v) => s"projection.$c.interval" -> v } ++
      digits.map { case (c, v) => s"projection.$c.digits" -> v } ++
      formats.map { case (c, v) => s"projection.$c.format" -> v }
  }

  /** reference: catalog.get_table_location (catalog/_get.py:455-484) */
  def getTableLocation(spark: SparkSession, database: String,
                       table: String): String = {
    val rows = spark.sql(s"DESCRIBE TABLE EXTENDED ${qt(database, table)}")
      .collect()
    rows.find(_.getString(0) == "Location") match {
      case Some(r) => r.getString(1)
      case None => throw InvalidTable(s"no location for $database.$table")
    }
  }

  /** {column -> athena type string} (reference: catalog.get_table_types). */
  def getTableTypes(spark: SparkSession, database: String,
                    table: String): Map[String, String] =
    spark.table(qt(database, table)).schema.fields
      .map(f => f.name -> AthenaTypes.fromSpark(f.dataType)).toMap

  // ------------------------------------------------------------------ //
  // table properties (reference: catalog/_get.py:781-816,               //
  // _create.py:169-211,354-465)                                        //
  // ------------------------------------------------------------------ //

  def getTableParameters(spark: SparkSession, database: String,
                         table: String): Map[String, String] =
    spark.sql(s"SHOW TBLPROPERTIES ${qt(database, table)}")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  /** Merge-in semantics (reference: upsert_table_parameters). */
  def upsertTableParameters(spark: SparkSession, database: String,
                            table: String,
                            parameters: Map[String, String]): Map[String, String] = {
    if (parameters.nonEmpty) {
      val kv = parameters
        .map { case (k, v) => s"${lit(spark, k)}=${lit(spark, v)}" }
        .mkString(", ")
      spark.sql(s"ALTER TABLE ${qt(database, table)} SET TBLPROPERTIES ($kv)")
      invalidateSqlCache(spark)
    }
    getTableParameters(spark, database, table)
  }

  // ------------------------------------------------------------------ //
  // schema helpers                                                     //
  // ------------------------------------------------------------------ //

  /** DataFrame schema → (columns, partitions) Athena type dicts
    * (reference: catalog.extract_athena_types,
    * catalog/_utils.py:209-259).
    */
  def extractAthenaTypes(df: DataFrame,
                         partitionCols: Seq[String] = Nil)
      : (Seq[(String, String)], Seq[(String, String)]) = {
    val all = AthenaTypes.fromSchema(df.schema)
    (all.filterNot(c => partitionCols.contains(c._1)),
     partitionCols.flatMap(p => all.find(_._1 == p)))
  }

  /** Crawl a parquet dataset prefix, infer schema + partitions, and
    * register the table with all partitions (reference:
    * s3.store_parquet_metadata, s3/_write_parquet.py:577-778).
    */
  def storeParquetMetadata(spark: SparkSession, path: String,
                           database: String, table: String,
                           mode: String = "overwrite",
                           parameters: Map[String, String] = Map.empty): Unit = {
    val (cols, parts) = Reader.readParquetMetadata(spark, path, dataset = true)
    createParquetTable(spark, database, table, path,
      cols.toSeq, parts.toSeq, mode, parameters = parameters)
  }

  // ------------------------------------------------------------------ //
  // reads resolved through the catalog (reference:                     //
  // s3.read_parquet_table / athena.read_sql_table)                     //
  // ------------------------------------------------------------------ //

  def readParquetTable(spark: SparkSession, database: String,
                       table: String): DataFrame = {
    if (!doesTableExist(spark, database, table))
      throw InvalidTable(s"$database.$table does not exist")
    spark.table(qt(database, table))
  }

  def readSqlTable(spark: SparkSession, database: String,
                   table: String): DataFrame =
    readParquetTable(spark, database, table)
}

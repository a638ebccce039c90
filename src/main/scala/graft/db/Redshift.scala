package graft.db

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.exceptions._
import graft.sources.FsOps
import graft.types.AthenaTypes

/** Redshift bulk-load/unload machinery (reference awswrangler/db.py:
  * 654-1290): COPY/UNLOAD SQL builders, DDL generation with
  * diststyle/sortkey validation, and the S3 manifest writer. These are
  * pure builders + a filesystem write — no cluster required to prove
  * them — and the high-throughput pattern they implement (stage
  * parquet → COPY, UNLOAD → read parquet) is exactly what a Spark job
  * feeding Redshift still wants at scale.
  */
object Redshift {

  val Diststyles = Set("AUTO", "EVEN", "ALL", "KEY")
  val Sortstyles = Set("COMPOUND", "INTERLEAVED")

  /** Spark type → Redshift column type (reference:
    * _data_types.py:91-118 athena2redshift; binary unsupported there
    * too).
    */
  def redshiftType(athenaType: String): String = athenaType match {
    case "tinyint" | "smallint" => "SMALLINT"
    case "int"                  => "INTEGER"
    case "bigint"               => "BIGINT"
    case "float"                => "FLOAT4"
    case "double"               => "FLOAT8"
    case "boolean"              => "BOOL"
    case "string"               => "VARCHAR(256)"
    case "timestamp"            => "TIMESTAMP"
    case "date"                 => "DATE"
    case t if t.startsWith("decimal") => t.toUpperCase
    case t if t.startsWith("char") || t.startsWith("varchar") =>
      t.toUpperCase
    case other =>
      throw UnsupportedType(s"No Redshift type for '$other'")
  }

  /** CREATE TABLE DDL with distribution/sort validation (reference:
    * _rs_create_table db.py:71-118, validation :121-147).
    */
  def createTableSql(table: String, schema: StructType,
                     diststyle: String = "AUTO",
                     distkey: Option[String] = None,
                     sortstyle: String = "COMPOUND",
                     sortkey: Seq[String] = Nil,
                     primaryKeys: Seq[String] = Nil): String = {
    val cols = schema.fields.map(f => f.name -> redshiftType(
      AthenaTypes.fromSpark(f.dataType)))
    val names = cols.map(_._1).toSet
    val ds = diststyle.toUpperCase
    val ss = sortstyle.toUpperCase
    if (!Diststyles(ds))
      throw InvalidRedshiftDiststyle(s"diststyle must be in $Diststyles")
    if (ds == "KEY" && distkey.isEmpty)
      throw InvalidRedshiftDistkey("diststyle KEY requires a distkey")
    if (ds != "KEY" && distkey.isDefined)
      throw InvalidRedshiftDiststyle(
        s"distkey given but diststyle is $ds — pass diststyle KEY")
    distkey.foreach(k => if (!names(k))
      throw InvalidRedshiftDistkey(s"distkey '$k' not in columns"))
    if (!Sortstyles(ss))
      throw InvalidRedshiftSortstyle(s"sortstyle must be in $Sortstyles")
    sortkey.foreach(k => if (!names(k))
      throw InvalidRedshiftSortkey(s"sortkey '$k' not in columns"))
    primaryKeys.foreach(k => if (!names(k))
      throw InvalidRedshiftPrimaryKeys(s"primary key '$k' not in columns"))

    val colsDdl = cols.map { case (n, t) => s"$n $t" } ++
      (if (primaryKeys.nonEmpty)
         Seq(s"PRIMARY KEY (${primaryKeys.mkString(", ")})")
       else Nil)
    val distClause = distkey match {
      case Some(k) => s" DISTSTYLE KEY DISTKEY($k)"
      case None    => s" DISTSTYLE $ds"
    }
    val sortClause =
      if (sortkey.nonEmpty) s" $ss SORTKEY(${sortkey.mkString(", ")})"
      else ""
    s"CREATE TABLE IF NOT EXISTS $table (${colsDdl.mkString(", ")})" +
      distClause + sortClause
  }

  /** COPY from a parquet manifest (reference: _rs_copy db.py:150-174). */
  def copySql(table: String, manifestPath: String, iamRole: String): String =
    s"COPY $table FROM '$manifestPath' IAM_ROLE '$iamRole' " +
      "FORMAT AS PARQUET MANIFEST"

  /** UNLOAD to parquet (reference: unload builder db.py:1263-1288). */
  def unloadSql(sql: String, path: String, iamRole: String,
                maxFileSizeMb: Option[Double] = None,
                kmsKeyId: Option[String] = None,
                partitionCols: Seq[String] = Nil): String = {
    val escaped = sql.replace("'", "''")
    val opts = new StringBuilder(
      s"UNLOAD ('$escaped') TO '$path' IAM_ROLE '$iamRole' " +
        "ALLOWOVERWRITE PARALLEL ON FORMAT PARQUET")
    if (partitionCols.nonEmpty)
      opts ++= s" PARTITION BY (${partitionCols.mkString(", ")})"
    maxFileSizeMb.foreach(m => opts ++= s" MAXFILESIZE ${m} MB")
    kmsKeyId.foreach(k => opts ++= s" KMS_KEY_ID '$k' ENCRYPTED")
    opts.toString
  }

  /** COPY manifest JSON for a list of staged files (reference:
    * db.write_redshift_copy_manifest, db.py:966-1038): entries carry
    * url, mandatory, and content_length so COPY can verify the load.
    */
  def buildManifest(files: Seq[(String, Long)]): String = {
    val entries = files.map { case (url, len) =>
      s"""{"url": "$url", "mandatory": true, """ +
        s""""meta": {"content_length": $len}}"""
    }
    s"""{"entries": [${entries.mkString(", ")}]}"""
  }

  /** Write the manifest for every data file under a staged prefix. */
  def writeCopyManifest(spark: SparkSession, stagedPrefix: String,
                        manifestPath: String): Seq[(String, Long)] = {
    val files = FsOps.listObjects(spark, stagedPrefix,
      suffix = Seq(".parquet")).map(o => o.path -> o.size)
    if (files.isEmpty)
      throw NoFilesFound(s"nothing staged under $stagedPrefix")
    val json = buildManifest(files)
    val (fs, p) = {
      val path = new org.apache.hadoop.fs.Path(manifestPath)
      (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
    }
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    files
  }

  /** Stage a frame as parquet + manifest, returning the (copySql,
    * expectedFileCount) a caller executes over JDBC — the
    * reference's copy_to_redshift flow (db.py:654-810) minus the
    * cluster. File-count verification mirrors db.py:150-174.
    */
  def stageForCopy(spark: SparkSession, df: DataFrame, stagePrefix: String,
                   table: String, iamRole: String,
                   maxRowsByFile: Long = 10000000L): (String, Int) = {
    graft.sinks.Writer.toParquet(spark, df, stagePrefix,
      graft.sinks.Writer.WriteOptions(mode = "overwrite",
        maxRowsByFile = Some(maxRowsByFile)))
    val manifestPath = s"$stagePrefix/manifest.json"
    val files = writeCopyManifest(spark, stagePrefix, manifestPath)
    (copySql(table, manifestPath, iamRole), files.size)
  }
}

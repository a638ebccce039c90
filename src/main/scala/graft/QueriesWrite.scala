package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.Writer
import graft.sinks.Writer.WriteOptions
import graft.sources.Reader
import graft.sources.Reader.ReadOptions

/** Write-path operators exercised end-to-end (SURVEY.md §2.2): each
  * query writes a dataset with `Writer`, reads it back with `Reader`
  * (partition pruning included), and aggregates — so the oracle over
  * the ORIGINAL table proves the round trip byte-preserving.
  *
  * Scratch space lives under target/ (never the read-only testdata);
  * every query starts with a full-overwrite write, so re-runs are
  * idempotent.
  */
object QueriesWrite {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(spark, dir, name)

  /** Per-(scale-factor, query) scratch dataset root. */
  private def rt(dir: String, name: String): String =
    Tables.scratch(dir, name)

  /** q21 — partitioned parquet dataset round trip + partition-filter
    * pruning: only the `l_returnflag=R` directory is scanned on read.
    */
  def q21WriteDatasetRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val root = rt(dir, "q21")
    Writer.toParquet(spark, t(spark, dir, "lineitem"), root,
      WriteOptions(dataset = true, partitionCols = Seq("l_returnflag"),
        mode = "overwrite"))
    Reader.readParquet(spark, Seq(root),
        ReadOptions(dataset = true,
          partitionFilter = Some(col("l_returnflag") === "R")))
      .groupBy("l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
           round(sum("l_extendedprice"), 2).as("sum_price"),
           count(lit(1)).as("n"))
      .orderBy("l_linestatus")
  }

  /** q22 — overwrite_partitions: full write, then replace ONLY the
    * `o_orderstatus=F` partition with doubled prices (dynamic partition
    * overwrite — untouched partitions must survive byte-identical).
    */
  def q22WriteOverwritePartitions(spark: SparkSession, dir: String): DataFrame = {
    val root = rt(dir, "q22")
    val orders = t(spark, dir, "orders")
    val opts = WriteOptions(dataset = true,
      partitionCols = Seq("o_orderstatus"), mode = "overwrite",
      filesPerPartition = Some(4))
    Writer.toParquet(spark, orders, root, opts)
    Writer.toParquet(spark,
      orders.filter(col("o_orderstatus") === "F")
        .withColumn("o_totalprice", col("o_totalprice") * 2),
      root, opts.copy(mode = "overwrite_partitions"))
    Reader.readParquet(spark, Seq(root), ReadOptions(dataset = true))
      .groupBy("o_orderstatus")
      .agg(round(sum("o_totalprice"), 2).as("total"),
           count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  /** q23 — append mode with the schema-evolution guard active: two
    * disjoint year slices appended into one dataset must reassemble
    * the full table.
    */
  def q23WriteAppend(spark: SparkSession, dir: String): DataFrame = {
    val root = rt(dir, "q23")
    val orders = t(spark, dir, "orders")
    val early = orders.filter(year(col("o_orderdate")) < 1995)
    val late  = orders.filter(year(col("o_orderdate")) >= 1995)
    Writer.toParquet(spark, early, root,
      WriteOptions(dataset = true, partitionCols = Seq("o_orderpriority"),
        mode = "overwrite"))
    Writer.toParquet(spark, late, root,
      WriteOptions(dataset = true, partitionCols = Seq("o_orderpriority"),
        mode = "append", schemaEvolution = false))
    Reader.readParquet(spark, Seq(root), ReadOptions(dataset = true))
      .groupBy("o_orderpriority")
      .agg(round(sum("o_totalprice"), 2).as("total"),
           count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  /** q24 — CSV dataset round trip (text serialization + schema
    * inference on read, reference s3.to_csv/read_csv surface).
    */
  def q24WriteCsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val root = rt(dir, "q24")
    Writer.toCsv(spark, t(spark, dir, "customer"), root,
      WriteOptions(dataset = true, partitionCols = Seq("c_mktsegment"),
        mode = "overwrite"))
    Reader.readCsv(spark, Seq(root))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
           round(sum("c_acctbal"), 2).as("total_bal"),
           countDistinct("c_nationkey").as("n_nations"))
      .orderBy("c_mktsegment")
  }

  /** q25 — JSON-lines dataset round trip (timestamp-free projection:
    * JSON schema inference reads timestamps back as strings, so the
    * year is materialized before writing).
    */
  def q25WriteJsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val root = rt(dir, "q25")
    val slim = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
              year(col("o_orderdate")).cast("long").as("o_year"))
    Writer.toJson(spark, slim, root,
      WriteOptions(dataset = true, partitionCols = Seq("o_year"),
        mode = "overwrite", filesPerPartition = Some(4)))
    Reader.readJson(spark, Seq(root))
      .groupBy(col("o_year").cast("long").as("o_year"))
      .agg(round(sum("o_totalprice"), 2).as("total"),
           countDistinct("o_custkey").as("n_cust"))
      .orderBy("o_year")
  }

  /** q26 — write → catalog registration → read back via `spark.table`
    * (the reference's to_parquet(database=, table=) + read_parquet_table
    * lifecycle, including MSCK-style partition recovery).
    */
  def q26CatalogTable(spark: SparkSession, dir: String): DataFrame = {
    val root = rt(dir, "q26")
    // the library's own name sanitization (reference: catalog
    // sanitize_table_name) — a scale dir like "gen-sf0.1x" must yield
    // a legal database identifier, not an analysis error
    val db = "graft_" + graft.types.AthenaTypes.sanitizeName(
      new java.io.File(dir).getName)
    graft.catalog.Catalog.createDatabase(spark, db)
    Writer.toParquetCataloged(spark, t(spark, dir, "lineitem"), root,
      db, "lineitem_ds",
      WriteOptions(partitionCols = Seq("l_returnflag"),
        mode = "overwrite", filesPerPartition = Some(4)))
    graft.catalog.Catalog.readParquetTable(spark, db, "lineitem_ds")
      .filter(col("l_returnflag") =!= "N")
      .groupBy("l_returnflag")
      .agg(round(sum("l_extendedprice"), 2).as("sum_price"),
           count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** q40 — JDBC round trip through embedded Derby: to_sql →
    * read_sql_table → aggregate (the reference's db module lifecycle,
    * db.py:269-522, with Derby standing in for Postgres/Redshift).
    * The read is RANGE-PARTITIONED on the key (the reference's
    * `chunksize`, round-10 verdict #5): the registry's 10× screen had
    * this row at 3.66× wall — row-bound through ONE connection — and
    * N bounded slice scans is how a real warehouse extract stays
    * linear; rows are identical by the slice-never-filters contract.
    */
  def q40JdbcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val con = graft.db.Db.Connection(
      url = "jdbc:derby:memory:graftq40;create=true",
      driver = Some("org.apache.derby.iapi.jdbc.AutoloadedDriver"))
    val cust = t(spark, dir, "customer")
    graft.db.Db.toSql(cust, "customer_rt", con,
      mode = "overwrite",
      columnTypes = Some("c_name VARCHAR(64), c_mktsegment VARCHAR(32)"))
    val maxKey = cust.agg(max("c_custkey")).head().getLong(0)
    graft.db.Db.readSqlTable(spark, "customer_rt", con,
        range = Some(graft.db.Db.RangePartition(
          "c_custkey", "1", maxKey.toString, 4)))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
           round(sum("c_acctbal"), 2).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  /** q49 — executor-side dataset mirror (reference: s3.merge_datasets):
    * write a partitioned dataset, mirror it with
    * `mergeDatasets(distributed = true)` — the 100 TB copy path, where
    * each executor copies a slice of the file list instead of every
    * byte funneling through the driver — and aggregate the MIRROR; the
    * oracle over the original table proves the mirror lossless.
    */
  def q49MergeDatasets(spark: SparkSession, dir: String): DataFrame = {
    val src = rt(dir, "q49_src")
    val dst = rt(dir, "q49_dst")
    Writer.toParquet(spark, t(spark, dir, "supplier"), src,
      WriteOptions(dataset = true, partitionCols = Seq("s_nationkey"),
        mode = "overwrite"))
    graft.sources.FsOps.mergeDatasets(spark, src, dst, "overwrite",
      distributed = true)
    Reader.readParquet(spark, Seq(dst), ReadOptions(dataset = true))
      .groupBy(col("s_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n"),
           round(sum("s_acctbal"), 2).as("total_bal"))
      .orderBy("nationkey")
  }

  /** q131 — schema evolution read back through the oracle: a v1
    * batch (3 columns) and a widened v2 batch (+o_orderpriority)
    * land as sibling partitions; `mergeSchema = true` must surface
    * the union schema with v1's missing column as NULL (the
    * reference's evolved-dataset read, s3/_read_parquet.py's
    * pyarrow dataset semantics). The oracle replays the evolution
    * with UNION ALL BY NAME over an explicit NULL column.
    */
  def q131WriteMergeSchema(spark: SparkSession, dir: String): DataFrame = {
    val root = rt(dir, "q131")
    val orders = t(spark, dir, "orders")
    val v1 = orders.filter(year(col("o_orderdate")) < 1998)
      .select(col("o_orderkey"), col("o_totalprice"),
        lit("v1").as("batch"))
    val v2 = orders.filter(year(col("o_orderdate")) >= 1998)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority"), lit("v2").as("batch"))
    Writer.toParquet(spark, v1, root,
      WriteOptions(dataset = true, partitionCols = Seq("batch"),
        mode = "overwrite"))
    Writer.toParquet(spark, v2, root,
      WriteOptions(dataset = true, partitionCols = Seq("batch"),
        mode = "append", schemaEvolution = true))
    Reader.readParquet(spark, Seq(root),
        ReadOptions(dataset = true, mergeSchema = true))
      .groupBy("batch")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("total"),
        count(col("o_orderpriority")).as("n_with_priority"),
        countDistinct("o_orderpriority").as("n_priorities"))
      .orderBy("batch")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_write_dataset_roundtrip"   -> (q21WriteDatasetRoundtrip _),
    "q22_write_overwrite_partitions"-> (q22WriteOverwritePartitions _),
    "q23_write_append"              -> (q23WriteAppend _),
    "q24_write_csv_roundtrip"       -> (q24WriteCsvRoundtrip _),
    "q25_write_json_roundtrip"      -> (q25WriteJsonRoundtrip _),
    "q26_catalog_table"             -> (q26CatalogTable _),
    "q40_jdbc_roundtrip"            -> (q40JdbcRoundtrip _),
    "q49_merge_datasets"            -> (q49MergeDatasets _),
    "q131_write_merge_schema"       -> (q131WriteMergeSchema _))

  val oracles: Map[String, String] = Map(
    "q21_write_dataset_roundtrip" ->
      """SELECT l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_price,
                count(*) AS n
         FROM lineitem WHERE l_returnflag = 'R'
         GROUP BY 1 ORDER BY 1""",
    "q22_write_overwrite_partitions" ->
      """SELECT o_orderstatus,
                round(sum(CASE WHEN o_orderstatus = 'F'
                          THEN o_totalprice * 2 ELSE o_totalprice END), 2)
                  AS total,
                count(*) AS n
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q23_write_append" ->
      """SELECT o_orderpriority, round(sum(o_totalprice), 2) AS total,
                count(*) AS n
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q24_write_csv_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n,
                round(sum(c_acctbal), 2) AS total_bal,
                count(DISTINCT c_nationkey) AS n_nations
         FROM customer GROUP BY 1 ORDER BY 1""",
    "q25_write_json_roundtrip" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                round(sum(o_totalprice), 2) AS total,
                count(DISTINCT o_custkey) AS n_cust
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q26_catalog_table" ->
      """SELECT l_returnflag, round(sum(l_extendedprice), 2) AS sum_price,
                count(*) AS n
         FROM lineitem WHERE l_returnflag <> 'N'
         GROUP BY 1 ORDER BY 1""",
    "q40_jdbc_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n,
                round(sum(c_acctbal), 2) AS total_bal
         FROM customer GROUP BY 1 ORDER BY 1""",
    "q49_merge_datasets" ->
      """SELECT CAST(s_nationkey AS BIGINT) AS nationkey, count(*) AS n,
                round(sum(s_acctbal), 2) AS total_bal
         FROM supplier GROUP BY 1 ORDER BY 1""",
    "q131_write_merge_schema" ->
      """WITH v1 AS (SELECT o_orderkey, o_totalprice,
                            CAST(NULL AS VARCHAR) AS o_orderpriority,
                            'v1' AS batch
                     FROM orders WHERE year(o_orderdate) < 1998),
         v2 AS (SELECT o_orderkey, o_totalprice, o_orderpriority,
                       'v2' AS batch
                FROM orders WHERE year(o_orderdate) >= 1998),
         u AS (SELECT * FROM v1 UNION ALL BY NAME SELECT * FROM v2)
         SELECT batch, count(*) AS n,
                round(sum(o_totalprice), 2) AS total,
                count(o_orderpriority) AS n_with_priority,
                count(DISTINCT o_orderpriority) AS n_priorities
         FROM u GROUP BY 1 ORDER BY 1""")
}

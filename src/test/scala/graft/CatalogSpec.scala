package graft

import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.exceptions._
import graft.sinks.Writer
import graft.sinks.Writer.WriteOptions

/** Catalog CRUD lifecycle over the session catalog, mirroring the
  * reference's Glue flows (create/get/partition/properties/delete).
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private val db = "graft_cat_test"

  override def beforeAll(): Unit = {
    super.beforeAll()
    Catalog.createDatabase(spark, db, "catalog spec scratch")
  }

  override def afterAll(): Unit = {
    Catalog.deleteDatabase(spark, db)
    super.afterAll()
  }

  private def orders = Tables.read(spark, sf, "orders")

  test("create/list/drop database") {
    Catalog.createDatabase(spark, "graft_tmp_db")
    assert(Catalog.databases(spark).as[String].collect()
      .contains("graft_tmp_db"))
    Catalog.deleteDatabase(spark, "graft_tmp_db")
    assert(!Catalog.databases(spark).as[String].collect()
      .contains("graft_tmp_db"))
  }

  test("create partitioned parquet table, recover partitions, query") {
    val root = tmpDir("cat-table")
    Writer.toParquet(spark, orders, root,
      WriteOptions(dataset = true, partitionCols = Seq("o_orderstatus"),
        mode = "overwrite"))
    val (cols, parts) = Catalog.extractAthenaTypes(orders,
      Seq("o_orderstatus"))
    Catalog.createParquetTable(spark, db, "orders_t", root, cols, parts)
    assert(Catalog.doesTableExist(spark, db, "orders_t"))
    assert(spark.table(s"$db.orders_t").count() == orders.count())
    val partSpecs = Catalog.getPartitions(spark, db, "orders_t")
    assert(partSpecs.map(_("o_orderstatus")).toSet == Set("F", "O", "P"))
    assert(Catalog.getTableLocation(spark, db, "orders_t")
      .contains(new java.io.File(root).getName))
    val types = Catalog.getTableTypes(spark, db, "orders_t")
    assert(types("o_totalprice") == "double")
    assert(types("o_orderstatus") == "string")
  }

  test("storeParquetMetadata infers schema and partitions from disk") {
    val root = tmpDir("cat-store")
    Writer.toParquet(spark, orders, root,
      WriteOptions(dataset = true, partitionCols = Seq("o_orderpriority"),
        mode = "overwrite"))
    Catalog.storeParquetMetadata(spark, root, db, "orders_crawled")
    assert(spark.table(s"$db.orders_crawled").count() == orders.count())
    assert(Catalog.getPartitions(spark, db, "orders_crawled").nonEmpty)
  }

  test("table parameters upsert merges and persists") {
    val root = tmpDir("cat-props")
    Writer.toParquet(spark, orders.limit(5), root,
      WriteOptions(dataset = true, mode = "overwrite"))
    val (cols, _) = Catalog.extractAthenaTypes(orders)
    Catalog.createParquetTable(spark, db, "props_t", root, cols,
      parameters = Map("origin" -> "graft"))
    val p1 = Catalog.getTableParameters(spark, db, "props_t")
    assert(p1("origin") == "graft")
    val p2 = Catalog.upsertTableParameters(spark, db, "props_t",
      Map("rounds" -> "2", "origin" -> "graft2"))
    assert(p2("rounds") == "2" && p2("origin") == "graft2")
  }

  test("add and drop explicit partitions") {
    val root = tmpDir("cat-addpart")
    Writer.toParquet(spark, orders.filter($"o_orderstatus" === "F"), root,
      WriteOptions(dataset = true, partitionCols = Seq("o_orderstatus"),
        mode = "overwrite"))
    val (cols, parts) = Catalog.extractAthenaTypes(orders,
      Seq("o_orderstatus"))
    Catalog.createParquetTable(spark, db, "addpart_t", root, cols, parts)
    Catalog.deletePartitions(spark, db, "addpart_t",
      Seq(Map("o_orderstatus" -> "F")))
    assert(Catalog.getPartitions(spark, db, "addpart_t").isEmpty)
    Catalog.addPartitions(spark, db, "addpart_t",
      Seq(Map("o_orderstatus" -> "F")))
    assert(Catalog.getPartitions(spark, db, "addpart_t")
      .map(_("o_orderstatus")) == Seq("F"))
  }

  test("toParquetCataloged rolls back written files on catalog failure") {
    val root = tmpDir("cat-rollback")
    // invalid table name containing a dot defeats createParquetTable →
    // the files written by this call must be removed again
    intercept[Exception] {
      Writer.toParquetCataloged(spark, orders.limit(10), root,
        db, "bad`name`.t",
        WriteOptions(mode = "overwrite"))
    }
    assert(graft.sources.FsOps.listObjects(spark, root)
      .forall(o => o.path.endsWith("_SUCCESS")))
  }

  test("readParquetTable raises InvalidTable on missing tables") {
    intercept[InvalidTable] {
      Catalog.readParquetTable(spark, db, "nope_t")
    }
  }

  test("overwrite archives the outgoing schema as a table version") {
    val root = tmpDir("cat-ver")
    Writer.toParquet(spark, orders.limit(5), root,
      WriteOptions(dataset = true, mode = "overwrite"))
    val (cols, _) = Catalog.extractAthenaTypes(orders)
    Catalog.createParquetTable(spark, db, "ver_t", root, cols)
    assert(Catalog.getTableNumberOfVersions(spark, db, "ver_t") == 1)
    // second overwrite with fewer columns bumps the version
    Catalog.createParquetTable(spark, db, "ver_t", root,
      cols.take(2))
    val versions = Catalog.getTableVersions(spark, db, "ver_t")
    assert(versions.size == 2)
    assert(versions.last._2.split(",").length == 2)
    assert(versions.head._2.contains("o_totalprice"))
  }

  test("tables/searchTables list and filter table metadata") {
    val root = tmpDir("cat-search")
    Writer.toParquet(spark, orders.limit(5), root,
      WriteOptions(dataset = true, mode = "overwrite"))
    val (cols, _) = Catalog.extractAthenaTypes(orders)
    Catalog.createParquetTable(spark, db, "searchable_orders", root, cols)
    val all = Catalog.tables(spark, Some(db))
    assert(all.filter(col("table") === "searchable_orders").count() == 1)
    assert(Catalog.searchTables(spark, "searchable")
      .filter(col("database") === db).count() == 1)
    assert(Catalog.searchTables(spark, "zzz_nothing").count() == 0)
  }

  test("column comments round-trip through table creation") {
    val root = tmpDir("cat-comments")
    Writer.toParquet(spark, orders.limit(5), root,
      WriteOptions(dataset = true, mode = "overwrite"))
    val (cols, _) = Catalog.extractAthenaTypes(orders)
    Catalog.createParquetTable(spark, db, "commented_t", root, cols,
      description = "orders snapshot",
      columnsComments = Map("o_totalprice" -> "gross order value"))
    val comments = Catalog.getColumnsComments(spark, db, "commented_t")
    assert(comments("o_totalprice") == "gross order value")
    assert(Catalog.getTableDescription(spark, db, "commented_t")
      .contains("orders snapshot"))
  }

  test("QuickSight column extraction reads ordered athena types") {
    import graft.qs.QuickSight
    spark.sql(s"CREATE TABLE IF NOT EXISTS `$db`.`qs_cols` " +
      "(id BIGINT, body STRING, score DOUBLE) USING parquet")
    assert(QuickSight.extractTableColumns(spark, db, "qs_cols") == Seq(
      "id" -> "bigint", "body" -> "string", "score" -> "double"))
    // query path: the analyzer answers schema without executing
    assert(QuickSight.extractQueryColumns(spark,
      "SELECT 1 AS one, CAST('2020-01-01' AS DATE) AS d") ==
      Seq("one" -> "int", "d" -> "date"))
  }

  test("projection parameters build the Athena property map") {
    val props = Catalog.buildProjectionParameters(
      types = Map("dt" -> "date", "region" -> "enum"),
      ranges = Map("dt" -> "2020-01-01,NOW"),
      values = Map("region" -> "us,eu"),
      formats = Map("dt" -> "yyyy-MM-dd"))
    assert(props("projection.enabled") == "true")
    assert(props("projection.dt.type") == "date")
    assert(props("projection.region.values") == "us,eu")
    assert(props("projection.dt.format") == "yyyy-MM-dd")
  }
}

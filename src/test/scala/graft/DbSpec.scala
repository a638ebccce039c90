package graft

import org.apache.spark.sql.functions._

import graft.db.{Db, Redshift}
import graft.exceptions._

/** db module against embedded Derby (the jars ship with Spark), plus
  * the Redshift builders as pure-function tests — mirroring
  * tests/test_db.py's to_sql/read_sql/upsert flows without a cluster.
  */
class DbSpec extends SparkSpec {
  import spark.implicits._

  private val derby = Db.Connection(
    url = "jdbc:derby:memory:graftdb;create=true",
    driver = Some("org.apache.derby.iapi.jdbc.AutoloadedDriver"))

  private val custTypes =
    "c_name VARCHAR(64), c_mktsegment VARCHAR(32)"

  test("toSql + readSqlTable round trip") {
    val cust = Tables.read(spark, sf, "customer")
    Db.toSql(cust, "customer_rt", derby, mode = "overwrite",
      columnTypes = Some(custTypes))
    val back = Db.readSqlTable(spark, "customer_rt", derby)
    assert(back.count() == cust.count())
    assert(back.agg(round(sum("c_acctbal"), 2)).head.getDouble(0) ==
      cust.agg(round(sum("c_acctbal"), 2)).head.getDouble(0))
  }

  test("readSqlQuery pushes the SQL down to the database") {
    val cust = Tables.read(spark, sf, "customer")
    Db.toSql(cust, "customer_q", derby, mode = "overwrite",
      columnTypes = Some(custTypes))
    // quoted identifiers: Spark's JDBC writer creates case-sensitive
    // lowercase column names in Derby
    val df = Db.readSqlQuery(spark,
      "SELECT \"c_mktsegment\", count(*) AS n FROM customer_q " +
        "GROUP BY \"c_mktsegment\"", derby)
    assert(df.count() == cust.select("c_mktsegment").distinct().count())
    assert(df.agg(sum("n")).head.getLong(0) == cust.count())
  }

  test("partitioned JDBC read produces numPartitions splits with identical rows") {
    val cust = Tables.read(spark, sf, "customer")
    Db.toSql(cust, "customer_part", derby, mode = "overwrite",
      columnTypes = Some(custTypes))
    val whole = Db.readSqlTable(spark, "customer_part", derby)
    // the reference's chunksize becomes Spark's bounded partitioned
    // read: each of the 4 partitions issues its own bounded query —
    // the parallel-scan path a real warehouse extract rides
    val parts = Db.readSqlTable(spark, "customer_part", derby,
      options = Map(
        "partitionColumn" -> "c_custkey",
        "lowerBound" -> "0",
        "upperBound" -> cust.count().toString,
        "numPartitions" -> "4"))
    assert(parts.rdd.getNumPartitions == 4,
      s"expected 4 JDBC partitions, got ${parts.rdd.getNumPartitions}")
    val a = whole.orderBy("c_custkey").collect().toSeq
    val b = parts.orderBy("c_custkey").collect().toSeq
    assert(a == b, "partitioned read must return identical rows")
  }

  test("ranged readSqlQuery slices an arbitrary query across N connections") {
    // the query option can't carry partitionColumn in Spark's JDBC
    // source — the range path must stage the SQL as a derived table
    // and still return the single-connection result exactly
    val cust = Tables.read(spark, sf, "customer")
    Db.toSql(cust, "customer_rq", derby, mode = "overwrite",
      columnTypes = Some(custTypes))
    val sql = "SELECT \"c_custkey\", \"c_mktsegment\", \"c_acctbal\" " +
      "FROM customer_rq WHERE \"c_acctbal\" > 0"
    val whole = Db.readSqlQuery(spark, sql, derby)
    val ranged = Db.readSqlQuery(spark, sql, derby,
      range = Some(Db.RangePartition("c_custkey", "0",
        cust.count().toString, 4)))
    assert(ranged.rdd.getNumPartitions == 4,
      s"expected 4 JDBC partitions, got ${ranged.rdd.getNumPartitions}")
    assert(ranged.orderBy("c_custkey").collect().toSeq ==
      whole.orderBy("c_custkey").collect().toSeq)
    // out-of-bounds rows are sliced, never filtered: shrink the bounds
    // to the middle half and the row set must not change
    val n = cust.count()
    val narrow = Db.readSqlQuery(spark, sql, derby,
      range = Some(Db.RangePartition("c_custkey",
        (n / 4).toString, (n / 2).toString, 3)))
    assert(narrow.count() == whole.count())
    intercept[InvalidArgumentValue] {
      Db.RangePartition("c_custkey", "0", "10", 0)
    }
  }

  test("ranged readSqlTable matches the options pass-through path") {
    val cust = Tables.read(spark, sf, "customer")
    Db.toSql(cust, "customer_rt2", derby, mode = "overwrite",
      columnTypes = Some(custTypes))
    val ranged = Db.readSqlTable(spark, "customer_rt2", derby,
      range = Some(Db.RangePartition("c_custkey", "0",
        cust.count().toString, 4)))
    assert(ranged.rdd.getNumPartitions == 4)
    assert(ranged.count() == cust.count())
  }

  test("upsert replaces matching primary keys and inserts new rows") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    Db.toSql(base, "ups_t", derby, mode = "overwrite",
      columnTypes = Some("name VARCHAR(16)"))
    val delta = Seq((2L, "B2", 99.0), (4L, "d", 40.0))
      .toDF("id", "name", "v")
    Db.upsert(delta, "ups_t", derby, primaryKeys = Seq("id"),
      columnTypes = Some("name VARCHAR(16)"))
    val out = Db.readSqlTable(spark, "ups_t", derby)
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "B2", 99.0),
      (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("upsert with reordered columns maps values by name") {
    val base = Seq((1L, "a", 10.0)).toDF("id", "name", "v")
    Db.toSql(base, "ups_ord", derby, mode = "overwrite",
      columnTypes = Some("name VARCHAR(16)"))
    // same schema, different column ORDER — must not transpose values
    val delta = Seq((2L, 20.0, "b")).toDF("id", "v", "name")
    Db.upsert(delta, "ups_ord", derby, primaryKeys = Seq("id"),
      columnTypes = Some("name VARCHAR(16)"))
    val out = Db.readSqlTable(spark, "ups_ord", derby)
      .orderBy("id").select("id", "name", "v")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "b", 20.0)))
  }

  test("connection registry resolves by name and rejects unknowns") {
    Db.registerConnection("warehouse", derby)
    assert(Db.getConnection("warehouse").url == derby.url)
    intercept[InvalidConnection] { Db.getConnection("missing") }
  }

  test("redshift DDL builder validates dist/sort/pk configuration") {
    val schema = Tables.read(spark, sf, "customer").schema
    val ddl = Redshift.createTableSql("public.customer", schema,
      diststyle = "KEY", distkey = Some("c_custkey"),
      sortkey = Seq("c_mktsegment"), primaryKeys = Seq("c_custkey"))
    assert(ddl.contains("DISTKEY(c_custkey)"))
    assert(ddl.contains("COMPOUND SORTKEY(c_mktsegment)"))
    assert(ddl.contains("PRIMARY KEY (c_custkey)"))
    assert(ddl.contains("c_acctbal FLOAT8"))
    intercept[InvalidRedshiftDiststyle] {
      Redshift.createTableSql("t", schema, diststyle = "WRONG")
    }
    intercept[InvalidRedshiftDistkey] {
      Redshift.createTableSql("t", schema, diststyle = "KEY")
    }
    intercept[InvalidRedshiftSortkey] {
      Redshift.createTableSql("t", schema, sortkey = Seq("nope"))
    }
    intercept[InvalidRedshiftDiststyle] { // distkey demands KEY style
      Redshift.createTableSql("t", schema, diststyle = "EVEN",
        distkey = Some("c_custkey"))
    }
  }

  test("copy/unload SQL builders escape and compose options") {
    val copy = Redshift.copySql("t", "s3://b/manifest.json", "role")
    assert(copy == "COPY t FROM 's3://b/manifest.json' IAM_ROLE 'role' " +
      "FORMAT AS PARQUET MANIFEST")
    val unload = Redshift.unloadSql("SELECT * FROM t WHERE x = 'y'",
      "s3://b/out/", "role", maxFileSizeMb = Some(64.0),
      partitionCols = Seq("dt"))
    assert(unload.contains("''y''")) // quotes escaped inside UNLOAD
    assert(unload.contains("PARTITION BY (dt)"))
    assert(unload.contains("MAXFILESIZE 64.0 MB"))
  }

  test("stageForCopy writes parquet + manifest and counts files") {
    val root = tmpDir("rs-stage")
    val orders = Tables.read(spark, sf, "orders")
    val (copySql, nFiles) = Redshift.stageForCopy(spark, orders,
      s"$root/stage", "public.orders", "role")
    assert(copySql.contains(s"$root/stage/manifest.json"))
    assert(nFiles > 0)
    val manifest = spark.read.option("multiLine", "true")
      .json(s"$root/stage/manifest.json")
    assert(manifest.select(explode(col("entries"))).count() == nFiles)
  }
}

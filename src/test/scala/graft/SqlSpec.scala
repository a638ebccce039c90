package graft

import graft.sql.Sql

/** Canonical-SQL result cache semantics (reference:
  * athena/_read.py:80-96,146-203 + tests/test_athena_cache.py).
  */
class SqlSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    Tables.registerAll(spark, sf)
  }

  test("canonicalization collapses whitespace, case, and semicolons") {
    assert(Sql.canonicalize("SELECT  *\n FROM orders ;") ==
      Sql.canonicalize("select * from orders"))
    assert(Sql.canonicalize("SELECT 1") != Sql.canonicalize("SELECT 2"))
  }

  test("canonicalization preserves case inside quoted regions") {
    // 'F' and 'f' are different predicates — they must NOT share a key
    assert(Sql.canonicalize("SELECT * FROM t WHERE s = 'F'") !=
      Sql.canonicalize("SELECT * FROM t WHERE s = 'f'"))
    assert(Sql.canonicalize("SELECT `Col` FROM t") !=
      Sql.canonicalize("SELECT `col` FROM t"))
    // keyword case outside quotes still collapses
    assert(Sql.canonicalize("SELECT * FROM t WHERE s = 'F'") ==
      Sql.canonicalize("select * from t where s = 'F'"))
  }

  test("SqlText.lit renders valid literals under both parser modes") {
    import graft.sql.SqlText
    // default parser: backslash escapes, round-trip through spark.sql
    assert(spark.sql(s"SELECT ${SqlText.lit(spark, raw"O'Brien \ co")}")
      .head().getString(0) == raw"O'Brien \ co")
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try {
      assert(spark.sql(s"SELECT ${SqlText.lit(spark, "O'Brien")}")
        .head().getString(0) == "O'Brien")
      assert(spark.sql(s"SELECT ${SqlText.lit(spark, raw"a\z")}")
        .head().getString(0) == raw"a\z")
      intercept[graft.exceptions.InvalidArgumentValue] {
        SqlText.lit(spark, "both ' and \" quoted")
      }
      // canonicalize under the legacy parser: backslash before the
      // closing quote does NOT extend the literal
      val c = Sql.canonicalize(raw"SELECT '\', X", escapedStringLiterals = true)
      assert(c.endsWith(", x"))
    } finally spark.conf.unset("spark.sql.parser.escapedStringLiterals")
  }

  test("within TTL an equivalent query is a cache hit") {
    var now = 1_000_000L
    val clock = () => now
    val r1 = Sql.readSqlQuery(spark,
      "SELECT count(*) AS n FROM orders", Some(60), clock)
    assert(!r1.metadata.cacheHit)
    now += 30_000 // 30s later, TTL 60s
    val r2 = Sql.readSqlQuery(spark,
      "select   count(*) as n from orders;", Some(60), clock)
    assert(r2.metadata.cacheHit)
    assert(r2.metadata.queryId == r1.metadata.queryId)
    assert(r2.df.head().getLong(0) == r1.df.head().getLong(0))
  }

  test("past TTL the entry expires and the query re-executes") {
    var now = 2_000_000L
    val clock = () => now
    val r1 = Sql.readSqlQuery(spark,
      "SELECT count(*) AS n FROM customer", Some(10), clock)
    now += 11_000 // 11s later, TTL 10s
    val r2 = Sql.readSqlQuery(spark,
      "SELECT count(*) AS n FROM customer", Some(10), clock)
    assert(!r2.metadata.cacheHit)
    assert(r2.metadata.queryId != r1.metadata.queryId)
  }

  test("ttl=0 disables caching entirely") {
    val r1 = Sql.readSqlQuery(spark, "SELECT count(*) AS n FROM nation")
    val r2 = Sql.readSqlQuery(spark, "SELECT count(*) AS n FROM nation")
    assert(!r1.metadata.cacheHit && !r2.metadata.cacheHit)
  }

  test("an invalidation racing an in-flight readSqlQuery wins: no re-insert") {
    // deterministic interleaving via the injectable clock: the miss
    // path calls clock() three times (freshness check, started,
    // finished); firing invalidateCache on the SECOND call lands it
    // after the cache miss but before the execution's result is
    // inserted — the generation guard must refuse the insert, or an
    // invalidation could be silently undone by a query in flight
    var now = 3_000_000L
    var calls = 0
    val racingClock = () => {
      calls += 1
      if (calls == 2) Sql.invalidateCache(spark)
      now
    }
    val q = "SELECT count(*) AS n FROM region"
    val r1 = Sql.readSqlQuery(spark, q, Some(60), racingClock)
    assert(!r1.metadata.cacheHit)
    assert(r1.df.head().getLong(0) > 0) // the result itself is fine
    // the raced execution was NOT cached: the next call re-executes…
    val r2 = Sql.readSqlQuery(spark, q, Some(60), () => now)
    assert(!r2.metadata.cacheHit,
      "a racing invalidation was overwritten by the in-flight query")
    // …and normal caching resumes from that clean execution
    val r3 = Sql.readSqlQuery(spark, q, Some(60), () => now)
    assert(r3.metadata.cacheHit)
    assert(r3.metadata.queryId == r2.metadata.queryId)
  }

  test("two sessions have independent caches and invalidation scopes") {
    val s2 = spark.newSession()
    var now = 4_000_000L
    val clock = () => now
    val q = "SELECT 1 AS x" // table-free: temp views are session-scoped
    val a1 = Sql.readSqlQuery(spark, q, Some(60), clock)
    val b1 = Sql.readSqlQuery(s2, q, Some(60), clock)
    // the second session missed even though the first had the entry
    assert(!a1.metadata.cacheHit && !b1.metadata.cacheHit)
    Sql.invalidateCache(s2)
    val a2 = Sql.readSqlQuery(spark, q, Some(60), clock)
    val b2 = Sql.readSqlQuery(s2, q, Some(60), clock)
    assert(a2.metadata.cacheHit,
      "invalidating one session must not evict another session's cache")
    assert(!b2.metadata.cacheHit)
  }

  test("a cataloged write invalidates cached SELECTs within their TTL") {
    import spark.implicits._
    import graft.sinks.Writer
    val db = "cache_inval_db"
    val dir = tmpDir("sql-cache-inval")
    graft.catalog.Catalog.createDatabase(spark, db)
    try {
      Writer.toParquetCataloged(spark, Seq((1L, "a")).toDF("id", "s"),
        dir, db, "t", Writer.WriteOptions(mode = "overwrite"))
      val sql = s"SELECT count(*) AS n FROM $db.t"
      val r1 = Sql.readSqlQuery(spark, sql, Some(600))
      assert(!r1.metadata.cacheHit && r1.df.head().getLong(0) == 1L)
      // the overwrite lands inside r1's 600s TTL; without
      // invalidation the stale 1-row result would be served
      Writer.toParquetCataloged(spark,
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"),
        dir, db, "t", Writer.WriteOptions(mode = "overwrite"))
      val r2 = Sql.readSqlQuery(spark, sql, Some(600))
      assert(!r2.metadata.cacheHit)
      assert(r2.df.head().getLong(0) == 3L)
    } finally {
      graft.catalog.Catalog.deleteDatabase(spark, db)
      Sql.invalidateCache(spark)
    }
  }

  test("the graft.sql.maxCacheSeconds conf drives the default TTL") {
    spark.conf.set(GraftSession.confKeys.cacheSeconds, "300")
    try {
      val r1 = Sql.readSqlQuery(spark, "SELECT count(*) AS n FROM region")
      val r2 = Sql.readSqlQuery(spark, "SELECT count(*) AS n FROM region")
      assert(!r1.metadata.cacheHit && r2.metadata.cacheHit)
    } finally {
      spark.conf.set(GraftSession.confKeys.cacheSeconds, "0")
      Sql.invalidateCache(spark)
    }
  }

  test("graft.sql.ctasApproach stages results as parquet files") {
    // the reference's ctas_approach: the returned frame must read
    // FILES (one materialization, then file scans), not re-execute
    // the query per action
    val scratch = tmpDir("ctas-approach")
    spark.conf.set(GraftSession.confKeys.ctasApproach, "true")
    spark.conf.set(GraftSession.confKeys.ctasScratch, scratch)
    try {
      val r = Sql.readSqlQuery(spark,
        "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")
      assert(r.df.inputFiles.nonEmpty &&
        r.df.inputFiles.forall(_.contains("ctas-approach")),
        s"expected file-backed result, got ${r.df.inputFiles.toSeq}")
      assert(r.df.count() == 5)
      // identical rows to the direct execution
      val direct = spark.sql(
        "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")
      assert(r.df.orderBy("r_regionkey").collect().toSeq ==
        direct.collect().toSeq)
    } finally {
      spark.conf.unset(GraftSession.confKeys.ctasApproach)
      spark.conf.unset(GraftSession.confKeys.ctasScratch)
      Sql.invalidateCache(spark)
    }
  }

  test("graft.sql.ctasApproach rejects command statements clearly") {
    // a DDL/command statement yields a zero-column frame; staging it
    // used to die later in an opaque empty-schema AnalysisException
    // from the parquet writer. The reference's CTAS path is
    // SELECT-only by construction (CREATE TABLE AS <select>), so the
    // guard must throw the library's own error up front.
    val scratch = tmpDir("ctas-guard")
    spark.conf.set(GraftSession.confKeys.ctasApproach, "true")
    spark.conf.set(GraftSession.confKeys.ctasScratch, scratch)
    try {
      val ex = intercept[graft.exceptions.InvalidArgumentValue] {
        Sql.readSqlQuery(spark,
          "CREATE DATABASE IF NOT EXISTS ctas_guard_db")
      }
      assert(ex.getMessage.contains("SELECT"))
      // the same statement without ctasApproach still executes
      spark.conf.set(GraftSession.confKeys.ctasApproach, "false")
      Sql.readSqlQuery(spark, "DROP DATABASE IF EXISTS ctas_guard_db")
    } finally {
      spark.conf.unset(GraftSession.confKeys.ctasApproach)
      spark.conf.unset(GraftSession.confKeys.ctasScratch)
      spark.sql("DROP DATABASE IF EXISTS ctas_guard_db")
      Sql.invalidateCache(spark)
    }
  }

  test("engine conf parity: workgroup, s3 endpoint, catalog id") {
    val sc = spark.sparkContext
    try {
      // workgroup → the scheduler pool jobs from this thread run under
      spark.conf.set(GraftSession.confKeys.workgroup, "analytics-wg")
      // s3_endpoint_url → S3A endpoint
      spark.conf.set(GraftSession.confKeys.s3Endpoint,
        "https://s3.example.internal")
      // catalog_id → active catalog in the session's catalog namespace
      spark.conf.set(GraftSession.confKeys.catalogId, "spark_catalog")
      GraftSession.applyEngineConf(spark)
      assert(sc.getLocalProperty("spark.scheduler.pool") == "analytics-wg")
      assert(sc.hadoopConfiguration.get("fs.s3a.endpoint") ==
        "https://s3.example.internal")
      assert(spark.catalog.currentCatalog() == "spark_catalog")
    } finally {
      spark.conf.unset(GraftSession.confKeys.workgroup)
      spark.conf.unset(GraftSession.confKeys.s3Endpoint)
      spark.conf.unset(GraftSession.confKeys.catalogId)
      sc.setLocalProperty("spark.scheduler.pool", null)
      sc.hadoopConfiguration.unset("fs.s3a.endpoint")
    }
  }

  test("ctas materializes the result as a queryable parquet table") {
    graft.catalog.Catalog.createDatabase(spark, "graft_ctas_db")
    val path = tmpDir("ctas-out") + "/t"
    try {
      val df = Sql.ctas(spark,
        "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1",
        "graft_ctas_db", "status_counts", path)
      assert(df.count() == 3)
      // the data is really at the external location as parquet
      assert(spark.read.parquet(path).count() == 3)
    } finally {
      graft.catalog.Catalog.deleteDatabase(spark, "graft_ctas_db")
    }
  }

  test("readSqlTable resolves through the configured default database") {
    graft.catalog.Catalog.createDatabase(spark, "graft_sql_db")
    try {
      spark.sql(
        "CREATE TABLE graft_sql_db.t AS SELECT 1 AS one")
      spark.conf.set(GraftSession.confKeys.database, "graft_sql_db")
      assert(Sql.readSqlTable(spark, "t").head().getInt(0) == 1)
    } finally {
      spark.conf.unset(GraftSession.confKeys.database)
      graft.catalog.Catalog.deleteDatabase(spark, "graft_sql_db")
    }
  }
}

package graft.sql

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.GraftSession
import graft.exceptions._

/** SQL entry point (reference awswrangler/athena/_read.py:521-740).
  *
  * Where the reference ships SQL to Athena and polls for result files,
  * `spark.sql` parses/optimizes/executes natively — so the CTAS and
  * CSV-manifest machinery vanishes. What survives is the one genuinely
  * novel optimizer feature (SURVEY.md §4 item 5): the
  * **canonical-SQL result cache** (athena/_read.py:80-96,146-203) —
  * re-issuing a query whose canonical form matches a prior execution
  * inside the TTL returns the prior (persisted) result instead of
  * recomputing, plus the query-metadata attachment
  * (athena/_utils.py:22-31,247-251).
  */
object Sql {

  /** Execution metadata attached to every result (reference:
    * _QueryMetadata).
    */
  case class QueryMetadata(
      queryId: String,
      canonicalSql: String,
      startedAtMs: Long,
      finishedAtMs: Long,
      cacheHit: Boolean)

  case class QueryResult(df: DataFrame, metadata: QueryMetadata)

  private case class Entry(atMs: Long, ttlSec: Long, df: DataFrame,
                           queryId: String)

  /** Per-session cache state. `gen` is the invalidation generation:
    * `invalidateCache` bumps it BEFORE clearing, and `readSqlQuery`
    * refuses to (re-)insert an entry whose execution started under an
    * older generation — otherwise a query in flight across an
    * invalidation would re-populate the cache with a result computed
    * from pre-invalidation data.
    */
  private case class SessionCache(
      entries: TrieMap[String, Entry],
      gen: java.util.concurrent.atomic.AtomicLong)

  // one cache per SparkSession (results are session-scoped plans).
  // NOTE: weak keys alone can't reclaim a session whose cache holds
  // entries — Entry.df strongly references the session through its
  // plan — so every access also sweeps caches of STOPPED sessions.
  private val caches = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, SessionCache]())

  private def sweepStoppedSessions(): Unit = caches.synchronized {
    val it = caches.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getKey.sparkContext.isStopped) it.remove()
  }

  private def cacheOf(spark: SparkSession): SessionCache =
    caches.synchronized {
      sweepStoppedSessions()
      Option(caches.get(spark)).getOrElse {
        val m = SessionCache(TrieMap.empty[String, Entry],
          new java.util.concurrent.atomic.AtomicLong(0L))
        caches.put(spark, m)
        m
      }
    }

  /** Whitespace-collapse + lowercase + trailing-semicolon strip — the
    * reference's comparison form (athena/_read.py:80-86) — EXCEPT
    * inside quoted regions: lowercasing a string literal ('F' vs 'f')
    * or a quoted identifier would make semantically different queries
    * collide on one cache key and return wrong cached results.
    */
  /** @param escapedStringLiterals the session's
    *   `spark.sql.parser.escapedStringLiterals`: under the legacy
    *   parser a backslash is a plain character, so treating it as an
    *   escape would mis-track literal boundaries (and vice versa)
    */
  def canonicalize(sql: String,
                   escapedStringLiterals: Boolean = false): String = {
    val collapsed = sql.trim.stripSuffix(";").split("\\s+").mkString(" ")
    val out = new StringBuilder(collapsed.length)
    var quote: Char = 0 // 0 = outside any quoted region
    var escaped = false // previous char was a backslash inside a quote
    collapsed.foreach { c =>
      if (quote != 0) {
        out += c
        // a backslash-escaped quote ('a\'B') does NOT end the literal
        // under Spark's default lexer; without this the literal's tail
        // would be case-folded and two different queries would collide
        // on one cache key. Backtick identifiers escape by doubling,
        // never backslash, and the legacy escapedStringLiterals parser
        // has no backslash escapes at all.
        if (escaped) escaped = false
        else if (c == '\\' && quote != '`' && !escapedStringLiterals)
          escaped = true
        else if (c == quote) quote = 0
      }
      else if (c == '\'' || c == '"' || c == '`') { quote = c; out += c }
      else out += c.toLower
    }
    out.toString
  }

  /** Execute SQL with optional result-cache reuse.
    *
    * @param maxCacheSeconds TTL; falls back to the
    *   `graft.sql.maxCacheSeconds` session conf (0 = cache off — the
    *   reference's default, athena/_read.py:689)
    * @param clock injectable for tests
    */
  def readSqlQuery(spark: SparkSession, sql: String,
                   maxCacheSeconds: Option[Long] = None,
                   clock: () => Long = () => System.currentTimeMillis())
      : QueryResult = {
    if (sql.trim.isEmpty) throw InvalidArgumentValue("empty SQL")
    val ttlSec = maxCacheSeconds.getOrElse(
      spark.conf.get(GraftSession.confKeys.cacheSeconds, "0").toLong)
    val canon = canonicalize(sql,
      spark.conf.get("spark.sql.parser.escapedStringLiterals", "false")
        .toBoolean)
    val sc = cacheOf(spark)
    val cache = sc.entries
    // snapshot the invalidation generation BEFORE any work: if an
    // invalidateCache lands anywhere during this call, the result of
    // this execution must not be (re-)inserted
    val genAtStart = sc.gen.get()
    val now = clock()

    // drop + unpersist expired entries on EVERY access (each entry
    // carries the TTL it was stored under, so a later ttl=0 caller
    // still releases storage pinned by earlier cached results)
    cache.filterInPlace { (_, e) =>
      val live = now - e.atMs <= e.ttlSec * 1000
      if (!live) e.df.unpersist(blocking = false)
      live
    }

    // a hit must also be FRESH under the CALLER's window: the reference
    // compares the cached execution's CompletionDateTime against the
    // current call's max_cache_seconds (athena/_read.py cache check),
    // so a 10s-freshness caller never gets an 800s-old result that was
    // stored under a 900s TTL
    cache.get(canon) match {
      case Some(e) if ttlSec > 0 && now - e.atMs <= ttlSec * 1000 =>
        QueryResult(e.df,
          QueryMetadata(e.queryId, canon, e.atMs, now, cacheHit = true))
      case _ =>
        val started = clock()
        val queryId = java.util.UUID.randomUUID().toString
        var df = spark.sql(sql)
        // ctas_approach parity (athena/_read.py:700s CTAS path): the
        // reference materializes heavy query results as parquet on S3
        // once and reads FILES back — every later consumption is a
        // file scan, never a re-execution, even with the result cache
        // off. Same semantics here: stage to the scratch root under a
        // per-query id and return the read-back frame (lineage cut to
        // storage). Cleanup of the staging dir is the caller's, like
        // the reference's keep_files default.
        // SELECT-only guard (advisor round-10): a command/DDL statement
        // yields a zero-column frame, and staging it would die later in
        // an opaque empty-schema AnalysisException from the parquet
        // writer. The reference's CTAS path is SELECT-only by
        // construction (CREATE TABLE AS <select>), so refuse clearly.
        if (spark.conf.get(GraftSession.confKeys.ctasApproach, "false")
            .toBoolean && df.schema.isEmpty)
          throw InvalidArgumentValue(
            "ctasApproach requires a result-producing SELECT statement; " +
              "got a command/DDL statement with an empty result schema")
        if (spark.conf.get(GraftSession.confKeys.ctasApproach, "false")
            .toBoolean) {
          val root = spark.conf.get(GraftSession.confKeys.ctasScratch,
            sys.props("java.io.tmpdir") + "/graft-ctas")
          val dest = s"$root/$queryId"
          df.write.mode("overwrite").parquet(dest)
          df = spark.read.parquet(dest)
        }
        if (ttlSec > 0) {
          df = df.persist(StorageLevel.MEMORY_AND_DISK)
          if (sc.gen.get() == genAtStart) {
            // a still-live entry can be replaced here (stored-TTL live
            // but stale under THIS caller's window) — release its
            // persisted blocks or they stay pinned until session stop
            val inserted = Entry(started, ttlSec, df, queryId)
            cache.put(canon, inserted)
              .foreach(prev => prev.df.unpersist(blocking = false))
            // double-check: an invalidation between the generation
            // read and the put must still win — remove what we just
            // inserted (invalidateCache bumps gen BEFORE clearing, so
            // one of the two always sees the other's write). The
            // remove is scoped to OUR entry (conditional remove on the
            // exact instance): a fresh entry inserted meanwhile by a
            // query that started AFTER the invalidation must survive.
            if (sc.gen.get() != genAtStart &&
                cache.remove(canon, inserted))
              inserted.df.unpersist(blocking = false)
          } else {
            // an invalidation raced this execution: the result may
            // predate whatever the invalidation accounted for — do
            // not cache it; release the persist so nothing leaks
            df.unpersist(blocking = false)
          }
        }
        QueryResult(df,
          QueryMetadata(queryId, canon, started, clock(), cacheHit = false))
    }
  }

  /** `SELECT * FROM db.table` (reference: athena.read_sql_table);
    * the database defaults to the `graft.catalog.database` conf.
    */
  def readSqlTable(spark: SparkSession, table: String,
                   database: Option[String] = None): DataFrame = {
    val db = database.orElse(
      Option(spark.conf.get(GraftSession.confKeys.database, null)))
    db match {
      case Some(d) => spark.table(s"$d.$table")
      case None    => spark.table(table)
    }
  }

  /** Drop all cached results for a session (e.g. after writes that
    * invalidate them — the reference scopes cache reuse by TTL only,
    * so this is an engine extension).
    */
  def invalidateCache(spark: SparkSession): Unit = {
    val sc = cacheOf(spark)
    // generation first: any in-flight readSqlQuery that started before
    // this point sees the bump and refuses to re-insert its result
    sc.gen.incrementAndGet()
    sc.entries.values.foreach(_.df.unpersist(blocking = false))
    sc.entries.clear()
  }

  /** CTAS materialization: run the SQL and persist the result as a
    * parquet table at `path` (reference: the ctas_approach rewrite,
    * athena/_read.py:328-409 — there it was a workaround for CSV
    * results; here it is an explicit materialization primitive, since
    * plain readSqlQuery results are already distributed parquet-ready).
    */
  def ctas(spark: SparkSession, sql: String, database: String,
           table: String, path: String): DataFrame = {
    spark.sql(
      s"CREATE TABLE `$database`.`$table` USING PARQUET " +
        s"LOCATION ${SqlText.lit(spark, path)} AS $sql")
    invalidateCache(spark)
    spark.table(s"`$database`.`$table`")
  }

  // ------------------------------------------------------------------ //
  // thin DDL wrappers (reference: athena.repair_table,                 //
  // athena.describe_table, athena.show_create_table)                   //
  // ------------------------------------------------------------------ //

  def repairTable(spark: SparkSession, database: String,
                  table: String): Unit =
    graft.catalog.Catalog.repairTable(spark, database, table)

  def describeTable(spark: SparkSession, database: String,
                    table: String): DataFrame =
    spark.sql(s"DESCRIBE TABLE EXTENDED `$database`.`$table`")

  def showCreateTable(spark: SparkSession, database: String,
                      table: String): String =
    spark.sql(s"SHOW CREATE TABLE `$database`.`$table`")
      .head().getString(0)
}

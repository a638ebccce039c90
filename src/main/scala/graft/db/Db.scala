package graft.db

import java.sql.DriverManager

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.exceptions._

/** JDBC database operators (SURVEY.md §2.1/2.2 db.* rows; reference
  * awswrangler/db.py:269-522 + upsert db.py:54-68).
  *
  * The reference funnels everything through SQLAlchemy engines built
  * from Glue connections; here a named `Connection` registry plays the
  * Glue-connection role and Spark's JDBC source does the distributed
  * I/O (predicate pushdown via the `query` option, partitioned reads
  * via partitionColumn bounds). Driver-side statements (DDL, upsert
  * transactions) go through plain JDBC.
  */
object Db {

  /** A named JDBC connection profile (reference: catalog.get_connection
    * → engine, catalog/_get.py:487-583).
    */
  case class Connection(
      url: String,
      driver: Option[String] = None,
      user: Option[String] = None,
      password: Option[String] = None,
      properties: Map[String, String] = Map.empty)

  private val registry = TrieMap.empty[String, Connection]

  def registerConnection(name: String, conn: Connection): Unit =
    registry.put(name, conn)

  def getConnection(name: String): Connection =
    registry.getOrElse(name,
      throw InvalidConnection(s"no registered connection '$name'"))

  private def baseReader(spark: SparkSession, con: Connection) = {
    var r = spark.read.format("jdbc").option("url", con.url)
    con.driver.foreach(d => r = r.option("driver", d))
    con.user.foreach(u => r = r.option("user", u))
    con.password.foreach(p => r = r.option("password", p))
    r.options(con.properties)
  }

  /** Range-partitioned read spec — the Spark-native shape of the
    * reference's `chunksize` (db.py:369-443: chunked generators there,
    * N concurrent executor connections here, each scanning one
    * `column` range slice). All four values are required by Spark's
    * JDBC source; bounds only split the range, they never filter rows
    * (out-of-bounds rows land in the first/last slice), so a stale
    * bound estimate skews slice sizes but never loses rows.
    */
  case class RangePartition(column: String, lowerBound: String,
                            upperBound: String, numPartitions: Int) {
    if (numPartitions <= 0)
      throw InvalidArgumentValue(
        s"numPartitions must be positive: $numPartitions")
  }

  private def applyRange(
      r: org.apache.spark.sql.DataFrameReader,
      range: Option[RangePartition]) = range match {
    case Some(p) => r.option("partitionColumn", p.column)
      .option("lowerBound", p.lowerBound)
      .option("upperBound", p.upperBound)
      .option("numPartitions", p.numPartitions)
    case None => r
  }

  /** Arbitrary SQL pushed down to the database
    * (reference: db.read_sql_query, db.py:369-443). The reference's
    * `chunksize` maps to `range`: a row-bound single connection was
    * the registry screen's #2 scale outlier (q40 at 3.66× for 10×
    * rows — the database round-trip, not Spark, was the clock), and a
    * range-partitioned read opens `numPartitions` executor-side
    * connections each scanning one slice. Spark's JDBC source forbids
    * `partitionColumn` next to the `query` option, so a ranged query
    * is staged as a derived table (`(sql) graft_subq`) — same rows,
    * same pushdown, sliceable.
    */
  def readSqlQuery(spark: SparkSession, sql: String, con: Connection,
                   options: Map[String, String] = Map.empty,
                   range: Option[RangePartition] = None): DataFrame =
    range match {
      case None =>
        baseReader(spark, con).options(options).option("query", sql).load()
      case r @ Some(_) =>
        applyRange(baseReader(spark, con).options(options), r)
          .option("dbtable", s"($sql) graft_subq").load()
    }

  /** reference: db.read_sql_table (db.py:446-522); `range` as in
    * [[readSqlQuery]].
    */
  def readSqlTable(spark: SparkSession, table: String, con: Connection,
                   schema: Option[String] = None,
                   options: Map[String, String] = Map.empty,
                   range: Option[RangePartition] = None): DataFrame = {
    val qualified = schema.map(s => s"$s.$table").getOrElse(table)
    applyRange(baseReader(spark, con).options(options), range)
      .option("dbtable", qualified).load()
  }

  /** DataFrame → database table (reference: db.to_sql, db.py:269-366).
    * `columnTypes` maps to createTableColumnTypes (the reference's
    * sqlalchemy dtype overrides).
    */
  def toSql(df: DataFrame, table: String, con: Connection,
            mode: String = "append",
            columnTypes: Option[String] = None,
            options: Map[String, String] = Map.empty): Unit = {
    if (df.schema.isEmpty) throw EmptyDataFrame("DataFrame has no columns")
    var w = df.write.format("jdbc").option("url", con.url)
      .option("dbtable", table).mode(mode)
    con.driver.foreach(d => w = w.option("driver", d))
    con.user.foreach(u => w = w.option("user", u))
    con.password.foreach(p => w = w.option("password", p))
    columnTypes.foreach(t => w = w.option("createTableColumnTypes", t))
    w.options(options).save()
  }

  /** Execute statements on one driver-side JDBC connection inside a
    * single transaction (commit on success, rollback on failure).
    */
  def executeStatements(con: Connection, sqls: Seq[String]): Unit = {
    con.driver.foreach(Class.forName)
    val jdbc = (con.user, con.password) match {
      case (Some(u), Some(p)) => DriverManager.getConnection(con.url, u, p)
      case _ => DriverManager.getConnection(con.url)
    }
    try {
      jdbc.setAutoCommit(false)
      val st = jdbc.createStatement()
      try sqls.foreach(st.execute)
      finally st.close()
      jdbc.commit()
    } catch {
      case e: Throwable => jdbc.rollback(); throw e
    } finally jdbc.close()
  }

  /** Shut down AND DROP an embedded in-memory Derby database,
    * releasing its heap-resident pages. Derby signals a successful
    * in-memory drop by THROWING SQLException 08006 ("database ...
    * dropped") — so the exception is the success path here, and a
    * database that was never created is equally silent. Used at bench
    * query boundaries: an in-memory Derby DB otherwise lives for the
    * JVM and taxes every later query's GC (BENCHNOTES round-12
    * measured 76 s of q77 inflation from this co-tenancy).
    */
  def shutdownInMemoryDerby(dbName: String): Unit =
    try {
      DriverManager.getConnection(s"jdbc:derby:memory:$dbName;drop=true")
      ()
    } catch { case _: java.sql.SQLException => () }

  /** Upsert: stage the frame, then DELETE matching primary keys from
    * the target and INSERT the staging rows, in one transaction
    * (reference: _rs_upsert, db.py:54-68 — expressed with portable
    * `WHERE EXISTS` instead of Redshift's `USING`).
    */
  def upsert(df: DataFrame, table: String, con: Connection,
             primaryKeys: Seq[String],
             stagingTable: Option[String] = None,
             columnTypes: Option[String] = None): Unit = {
    if (primaryKeys.isEmpty)
      throw InvalidRedshiftPrimaryKeys("primaryKeys must be non-empty")
    val staging = stagingTable.getOrElse(s"${table}_graft_stage")
    toSql(df, staging, con, mode = "overwrite", columnTypes = columnTypes)
    // Spark's JDBC writer creates case-sensitive quoted column names —
    // reference them quoted so Derby/Postgres don't case-fold them away
    val pkMatch = primaryKeys
      .map(k => s"""$table."$k" = $staging."$k"""").mkString(" AND ")
    // name the insert columns: a positional SELECT * would silently
    // transpose values whenever the frame's column order differs from
    // the target table's
    val colList = df.columns.map(c => s""""$c"""").mkString(", ")
    try {
      executeStatements(con, Seq(
        s"DELETE FROM $table WHERE EXISTS " +
          s"(SELECT 1 FROM $staging WHERE $pkMatch)",
        s"INSERT INTO $table ($colList) SELECT $colList FROM $staging"))
    } finally {
      try executeStatements(con, Seq(s"DROP TABLE $staging"))
      catch { case _: Throwable => () }
    }
  }
}

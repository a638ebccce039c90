package graft.logs

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.exceptions._

/** CloudWatch Logs Insights reader (reference awswrangler/cloudwatch.py:
  * 18-236: start_query → poll → results → DataFrame).
  *
  * The AWS client is an injected trait — the control-plane call has no
  * Spark content and no cluster dependency, so the engine side (poll
  * loop, status handling, field-name normalization, timestamp parsing,
  * DataFrame construction) is fully testable with a fake. Results are
  * driver-side by design: the service caps result sets at 10k rows
  * (reference docs note the same), so distribution buys nothing.
  */
object Logs {

  /** Minimal client surface of the logs service (boto3's
    * start_query/get_query_results in the reference).
    */
  trait LogsClient {
    def startQuery(query: String, logGroupNames: Seq[String],
                   startTimeMs: Long, endTimeMs: Long, limit: Int): String
    /** One of Scheduled | Running | Complete | Failed | Cancelled. */
    def queryStatus(queryId: String): String
    /** Rows as (field → value) pairs, e.g. "@timestamp" → "...". */
    def queryResults(queryId: String): Seq[Seq[(String, String)]]
  }

  /** reference: cloudwatch.start_query + wait_query
    * (cloudwatch.py:18-171); 0.2s poll mirrors
    * _QUERY_WAIT_POLLING_DELAY (athena/_utils.py:17).
    */
  def runQuery(client: LogsClient, query: String,
               logGroupNames: Seq[String], startTimeMs: Long,
               endTimeMs: Long, limit: Int = 10000,
               pollMs: Long = 200, maxWaitMs: Long = 300000)
      : Seq[Seq[(String, String)]] = {
    if (logGroupNames.isEmpty)
      throw InvalidArgumentValue("logGroupNames must be non-empty")
    val id = client.startQuery(query, logGroupNames, startTimeMs,
      endTimeMs, limit)
    val deadline = System.currentTimeMillis() + maxWaitMs
    var status = client.queryStatus(id)
    while (status == "Scheduled" || status == "Running") {
      if (System.currentTimeMillis() > deadline)
        throw QueryFailed(s"logs query $id timed out after ${maxWaitMs}ms")
      Thread.sleep(pollMs)
      status = client.queryStatus(id)
    }
    status match {
      case "Complete"  => client.queryResults(id)
      case "Cancelled" => throw QueryCancelled(s"logs query $id cancelled")
      case other       => throw QueryFailed(s"logs query $id: $other")
    }
  }

  /** reference: cloudwatch.read_logs (cloudwatch.py:174-236): field
    * names lose their `@` prefix, the `@ptr` bookkeeping column is
    * dropped, and `timestamp` is parsed to TimestampType.
    */
  def readLogs(spark: SparkSession, client: LogsClient, query: String,
               logGroupNames: Seq[String], startTimeMs: Long,
               endTimeMs: Long, limit: Int = 10000): DataFrame = {
    val rows = runQuery(client, query, logGroupNames, startTimeMs,
      endTimeMs, limit)
    val fields = rows.flatMap(_.map(_._1)).distinct
      .filterNot(_ == "@ptr")
    // @x keeps its prefix when a plain field x also exists — stripping
    // both onto one name would build a duplicate-column frame
    val names = fields.map { f =>
      val stripped = f.stripPrefix("@")
      if (f.startsWith("@") && fields.contains(stripped)) f else stripped
    }
    val schema = StructType(names.map(StructField(_, StringType)))
    val data = rows.map { r =>
      val byField = r.toMap
      Row.fromSeq(fields.map(f => byField.getOrElse(f, null)))
    }
    var df = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1), schema)
    if (names.contains("timestamp"))
      df = df.withColumn("timestamp",
        to_timestamp(col("timestamp"), "yyyy-MM-dd HH:mm:ss.SSS"))
    df
  }
}

package graft

import scala.collection.mutable

import graft.exceptions._
import graft.logs.{Logs, Sts}

/** Logs/STS behavior with fake clients (the engine-side poll loop,
  * field normalization, and timestamp parsing are what's under test —
  * the AWS transport is injected).
  */
class LogsSpec extends SparkSpec {

  private class FakeLogs(statuses: Seq[String],
                         results: Seq[Seq[(String, String)]])
      extends Logs.LogsClient {
    val calls = mutable.Buffer.empty[String]
    private var i = -1
    override def startQuery(q: String, g: Seq[String], s: Long, e: Long,
                            l: Int): String = { calls += q; "qid-1" }
    override def queryStatus(id: String): String = {
      i = math.min(i + 1, statuses.size - 1); statuses(i)
    }
    override def queryResults(id: String): Seq[Seq[(String, String)]] =
      results
  }

  private val sample = Seq(
    Seq("@timestamp" -> "2026-01-02 03:04:05.678",
        "@message" -> "hello", "@ptr" -> "xyz"),
    Seq("@timestamp" -> "2026-01-02 03:04:06.000",
        "@message" -> "world", "@ptr" -> "abc"))

  test("readLogs polls to completion, strips @ fields, drops @ptr") {
    val client = new FakeLogs(
      Seq("Scheduled", "Running", "Complete"), sample)
    val df = Logs.readLogs(spark, client, "fields @timestamp, @message",
      Seq("group-a"), 0L, 1000L)
    assert(df.columns.toSeq == Seq("timestamp", "message"))
    assert(df.count() == 2)
    assert(df.schema("timestamp").dataType.typeName == "timestamp")
    assert(df.orderBy("timestamp").select("message")
      .collect().map(_.getString(0)).toSeq == Seq("hello", "world"))
  }

  test("failed and cancelled queries raise the reference exceptions") {
    intercept[QueryFailed] {
      Logs.readLogs(spark, new FakeLogs(Seq("Failed"), Nil), "q",
        Seq("g"), 0L, 1L)
    }
    intercept[QueryCancelled] {
      Logs.readLogs(spark, new FakeLogs(Seq("Cancelled"), Nil), "q",
        Seq("g"), 0L, 1L)
    }
    intercept[InvalidArgumentValue] {
      Logs.readLogs(spark, new FakeLogs(Seq("Complete"), Nil), "q",
        Nil, 0L, 1L)
    }
  }

  test("sts identity helpers parse the caller ARN") {
    val client = new Sts.StsClient {
      override def callerAccount: String = "123456789012"
      override def callerArn: String =
        "arn:aws:iam::123456789012:user/data-engineer"
    }
    assert(Sts.getAccountId(client) == "123456789012")
    assert(Sts.getCurrentIdentityName(client) == "data-engineer")
    assert(Sts.getCurrentIdentityArn(client).startsWith("arn:aws:iam"))
  }
}

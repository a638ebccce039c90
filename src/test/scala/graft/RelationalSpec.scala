package graft

import org.apache.spark.sql.functions._

import graft.exceptions._
import graft.operators.Relational

/** Distributed-relational helpers: global indexing/ntile semantics
  * and the skew-salting operators (results must match their unsalted
  * equivalents exactly).
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def orders = Tables.read(spark, sf, "orders")

  test("withGlobalIndex assigns a dense 0..n-1 index in sort order") {
    val df = orders.select("o_orderkey", "o_totalprice")
    val indexed = Relational.withGlobalIndex(df,
      Seq($"o_totalprice".asc, $"o_orderkey".asc), "idx",
      numPartitions = Some(7))
    val n = df.count()
    assert(indexed.agg(min("idx"), max("idx"), countDistinct("idx"))
      .as[(Long, Long, Long)].head() == (0L, n - 1, n))
    // index order must equal sort order
    val first = indexed.orderBy("idx").limit(3)
      .select("o_orderkey").as[Long].collect().toSeq
    val expect = df.orderBy($"o_totalprice".asc, $"o_orderkey".asc)
      .limit(3).select("o_orderkey").as[Long].collect().toSeq
    assert(first == expect)
  }

  test("ntileBucketed matches SQL ntile bucket sizes") {
    // 10 rows, 3 buckets → sizes 4,3,3 (first n%k buckets get +1)
    val df = (1 to 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
    val out = Relational.ntileBucketed(df, 3, Seq($"v".asc, $"id".asc),
        "b", numPartitions = Some(3))
      .groupBy("b").count().orderBy("b")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 4L), (2L, 3L), (3L, 3L)))
  }

  test("saltedJoin equals the plain join on skewed keys") {
    // skew: 90% of rows share one key
    val probe = (1 to 1000)
      .map(i => (if (i <= 900) 1L else i.toLong, i.toDouble))
      .toDF("k", "v")
    val build = Seq((1L, "hot"), (950L, "cold")).toDF("k", "name")
    val plain = probe.join(build, Seq("k"))
      .agg(count(lit(1)), round(sum("v"), 2)).as[(Long, Double)].head()
    val salted = Relational.saltedJoin(probe, build, Seq("k"), 8)
      .agg(count(lit(1)), round(sum("v"), 2)).as[(Long, Double)].head()
    assert(salted == plain)
    // left join keeps unmatched probe rows exactly once
    val plainLeft = probe.join(build, Seq("k"), "left").count()
    val saltedLeft = Relational
      .saltedJoin(probe, build, Seq("k"), 8, "left").count()
    assert(saltedLeft == plainLeft)
  }

  test("saltedAggregate merges partials to the exact plain result") {
    val df = orders.select($"o_orderstatus".as("k"),
      $"o_totalprice".as("v"))
    val plain = df.groupBy("k").agg(
        sum("v").as("v_sum"), count("v").as("v_count"),
        min("v").as("v_min"), max("v").as("v_max"))
      .orderBy("k").collect().toSeq
    val salted = Relational.saltedAggregate(df, Seq("k"),
        Seq("v" -> "sum", "v" -> "count", "v" -> "min", "v" -> "max"), 8)
      .orderBy("k").collect().toSeq
    assert(salted.map(_.toSeq.map {
      case d: Double => math.round(d * 100) / 100.0
      case x => x
    }) == plain.map(_.toSeq.map {
      case d: Double => math.round(d * 100) / 100.0
      case x => x
    }))
    intercept[InvalidArgumentValue] {
      Relational.saltedAggregate(df, Seq("k"), Seq("v" -> "avg"), 4)
    }
    intercept[InvalidArgumentValue] { // empty spec
      Relational.saltedAggregate(df, Seq("k"), Nil, 4)
    }
    intercept[InvalidArgumentValue] { // duplicate spec entries
      Relational.saltedAggregate(df, Seq("k"),
        Seq("v" -> "sum", "v" -> "sum"), 4)
    }
  }

  test("saltedJoin rejects outer joins that would duplicate build rows") {
    val probe = Seq((1L, 1.0)).toDF("k", "v")
    val build = Seq((2L, "unmatched")).toDF("k", "name")
    intercept[InvalidArgumentValue] {
      Relational.saltedJoin(probe, build, Seq("k"), 8, "full")
    }
    intercept[InvalidArgumentValue] {
      Relational.saltedJoin(probe, build, Seq("k"), 8, "right")
    }
  }
}

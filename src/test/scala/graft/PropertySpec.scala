package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Relational
import graft.sql.Sql
import graft.types.AthenaTypes

/** Property-based checks for the pure/semantic cores: the type
  * bridge round-trips arbitrary nested types, canonicalization is
  * idempotent and quote-preserving, and the distributed ntile exactly
  * matches Spark's window ntile on arbitrary data.
  */
class PropertySpec extends SparkSpec {

  /** Deterministic property driver: evaluate the generator across
    * fixed seeds (scalatestplus isn't on the offline classpath, so
    * this drives ScalaCheck Gens directly).
    */
  private def forAllSeeded[A](gen: Gen[A], cases: Int = 40)(check: A => Unit): Unit =
    (1 to cases).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }
  import spark.implicits._

  private val scalarTypes = Gen.oneOf("tinyint", "smallint", "int",
    "bigint", "float", "double", "boolean", "string", "timestamp",
    "date", "binary", "decimal(10,2)")

  private def nestedType(depth: Int): Gen[String] =
    if (depth <= 0) scalarTypes
    else Gen.frequency(
      4 -> scalarTypes,
      1 -> nestedType(depth - 1).map(t => s"array<$t>"),
      1 -> (for {
        k <- Gen.oneOf("string", "int")
        v <- nestedType(depth - 1)
      } yield s"map<$k,$v>"),
      1 -> (for {
        n <- Gen.chooseNum(1, 3)
        ts <- Gen.listOfN(n, nestedType(depth - 1))
      } yield ts.zipWithIndex
        .map { case (t, i) => s"f$i:$t" }.mkString("struct<", ",", ">")))

  test("athena type strings round-trip through the Spark bridge") {
    forAllSeeded(nestedType(3)) { t =>
      val spark1 = AthenaTypes.toSpark(t)
      val back = AthenaTypes.fromSpark(spark1)
      // the round trip must be a fixed point (synonyms collapse on
      // the first pass: int/integer, char/varchar → string)
      assert(AthenaTypes.toSpark(back) == spark1)
      assert(AthenaTypes.fromSpark(AthenaTypes.toSpark(back)) == back)
    }
  }

  test("sql canonicalization is idempotent and quote-preserving") {
    // bounded construction, not suchThat: a filtered generator returns
    // None for most seeds and forAllSeeded would silently skip them
    val sqlGen = for {
      kw <- Gen.oneOf("SELECT", "select", "SeLeCt")
      n <- Gen.chooseNum(0, 15)
      lit <- Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)
      ws <- Gen.oneOf(" ", "  ", "\n", "\t ")
    } yield s"$kw *${ws}FROM t${ws}WHERE c = '$lit';"
    forAllSeeded(sqlGen) { sql =>
      val c1 = Sql.canonicalize(sql)
      assert(Sql.canonicalize(c1) == c1) // idempotent
      // the literal survives byte-for-byte
      val lit = sql.substring(sql.indexOf('\'') + 1, sql.lastIndexOf('\''))
      assert(c1.contains(s"'$lit'"))
    }
  }

  test("asOfJoin equals the naive at-or-before lookup on random event sets") {
    val cases = for {
      nLeft <- Gen.chooseNum(0, 25)
      nRight <- Gen.chooseNum(0, 25)
      keys <- Gen.chooseNum(1, 4)
      lefts <- Gen.listOfN(nLeft,
        Gen.zip(Gen.chooseNum(0L, keys.toLong - 1), Gen.chooseNum(0L, 50L)))
      rights <- Gen.listOfN(nRight,
        Gen.zip(Gen.chooseNum(0L, keys.toLong - 1), Gen.chooseNum(0L, 50L)))
    } yield (lefts, rights)
    forAllSeeded(cases, cases = 12) { case (lefts, rights) =>
      val left = lefts.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("eid", "k", "t")
      // dedupe (k, time) on the right — ties among right rows at one
      // timestamp are documented as arbitrary, so the property pins
      // only the deterministic contract
      val right = rights.distinct.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong + 1000) }
        .toDF("k", "r_t", "r_v")
        .groupBy("k", "r_t").agg(min("r_v").as("r_v"))
      val got = Relational.asOfJoin(left, right, Seq("k"), "t", "r_t")
        .select("eid", "r_t", "r_v")
        .as[(Long, Option[Long], Option[Long])].collect().toSet
      val naive = left.as("l")
        .join(right.as("r"),
          $"l.k" === $"r.k" && $"l.t" >= $"r.r_t", "left")
        .groupBy($"l.eid".as("eid"))
        .agg(max(struct($"r.r_t", $"r.r_v")).as("m"))
        .select($"eid", $"m.r_t", $"m.r_v")
        .as[(Long, Option[Long], Option[Long])].collect().toSet
      assert(got == naive)
    }
  }

  test("rangeJoin equals the naive BETWEEN join on random intervals") {
    val cases = for {
      nPts <- Gen.chooseNum(0, 30)
      nRanges <- Gen.chooseNum(0, 10)
      binWidth <- Gen.oneOf(1.0, 3.0, 7.5, 100.0)
      pts <- Gen.listOfN(nPts, Gen.chooseNum(0, 100))
      ranges <- Gen.listOfN(nRanges,
        Gen.zip(Gen.chooseNum(0, 100), Gen.chooseNum(0, 40)))
    } yield (pts, ranges, binWidth)
    forAllSeeded(cases, cases = 12) { case (pts, ranges, binWidth) =>
      val points = pts.zipWithIndex
        .map { case (p, i) => (i.toLong, p.toDouble) }
        .toDF("pid", "x")
      val bands = ranges.zipWithIndex
        .map { case ((lo, w), i) => (i.toLong, lo.toDouble, (lo + w).toDouble) }
        .toDF("band_id", "lo", "hi")
      val got = Relational.rangeJoin(points, bands, "x", "lo", "hi",
          binWidth)
        .select("pid", "band_id").as[(Long, Long)].collect().sorted
      val naive = points.join(bands, $"x" >= $"lo" && $"x" < $"hi")
        .select("pid", "band_id").as[(Long, Long)].collect().sorted
      assert(got.toSeq == naive.toSeq)
    }
  }

  test("ntileBucketed equals window ntile for arbitrary n and k") {
    val cases = for {
      n <- Gen.chooseNum(1, 60)
      k <- Gen.chooseNum(1, 10)
    } yield (n, k)
    forAllSeeded(cases, cases = 15) { case (n, k) =>
      val df = (1 to n).map(i => (i.toLong, (i * 37 % 11).toDouble))
        .toDF("id", "v")
      val expect = df.withColumn("b",
          ntile(k).over(Window.orderBy($"v".asc, $"id".asc)).cast("long"))
        .select("id", "b").as[(Long, Long)].collect().toMap
      val got = Relational.ntileBucketed(df, k,
          Seq($"v".asc, $"id".asc), "b", numPartitions = Some(3))
        .select("id", "b").as[(Long, Long)].collect().toMap
      assert(got == expect)
    }
  }
}

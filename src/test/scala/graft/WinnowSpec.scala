package graft

import org.apache.spark.sql.functions._

import graft.exceptions.InvalidArgumentValue
import graft.llm.Dedup

/** Winnowing fingerprints (Schleimer et al. 2003): reference-replay
  * parity, the local guarantee, selection density, containment
  * scoring, and the doc-frequency flood guard.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  /** Independent straight-line replay of hashing + window minima. */
  private def refFps(text: String, k: Int,
                     w: Int): Set[(Long, Long)] = {
    val t = text.toLowerCase
    val md = java.security.MessageDigest.getInstance("MD5")
    val g = math.max(t.length - k + 1, 1)
    val h = (1 to g).map { j =>
      val gram = t.substring(j - 1, math.min(j - 1 + k, t.length))
      val hex = md.digest(gram.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    (1 to math.max(g - w + 1, 1)).map { s =>
      val end = math.min(s + w - 1, g)
      // rightmost minimal
      val best = (s to end).minBy(j => (h(j - 1), -j))
      (best.toLong, h(best - 1))
    }.toSet
  }

  test("winnowFingerprints equals the reference replay") {
    val docs = Tables.read(spark, sf, "documents").limit(60)
    val got = Dedup.winnowFingerprints(docs, "doc_id", "text",
        k = 4, w = 8)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSet)
      .toMap
    docs.select("doc_id", "text").collect().foreach { r =>
      assert(got.getOrElse(r.getLong(0), Set.empty) ===
        refFps(r.getString(1), 4, 8), s"doc ${r.getLong(0)} diverges")
    }
  }

  test("winnowFingerprints reference replay: multibyte and surrogate text") {
    // pins the round-13 kernel's two encodings against the hex-string
    // reference: the byte-slice fast path (surrogate-free multibyte)
    // and the per-gram substring fallback (astral chars, where a
    // window can split a surrogate pair)
    val docs = Seq(
      (1L, "abécdé fghîj klmnö pqrsü vwxyz aébcd"),
      (2L, "aa😀bb😀cc ddee ff😀gg hh iii jj"),
      (3L, "plain ascii text with several words here"),
      (4L, "😀" * 12)).toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(docs, "doc_id", "text",
        k = 4, w = 8)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSet)
      .toMap
    docs.select("doc_id", "text").collect().foreach { r =>
      assert(got.getOrElse(r.getLong(0), Set.empty) ===
        refFps(r.getString(1).toLowerCase, 4, 8),
        s"doc ${r.getLong(0)} diverges")
    }
  }

  test("local guarantee: a shared >= w+k-1 substring shares a hash") {
    // B embeds an 11-char (= w + k − 1) substring of A inside
    // otherwise-disjoint text; the guarantee promises >= 1 shared
    // fingerprint HASH (positions differ)
    val shared = "qwertyuiopz"
    val a = s"aaa bbb ccc $shared ddd eee"
    val b = s"111 222 333 $shared 444 555"
    val df = Seq((1L, a), (2L, b)).toDF("id", "txt")
    val fps = Dedup.winnowFingerprints(df, "id", "txt", k = 4, w = 8)
      .select("id", "fp").distinct().as[(Long, Long)].collect()
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
      "the guarantee requires a shared fingerprint hash")
  }

  test("selection density tracks 2/(w+1)") {
    val docs = Tables.read(spark, sf, "documents")
      .filter(col("n_chars") > 200)
    val stats = Dedup.winnowFingerprints(docs, "doc_id", "text",
        k = 4, w = 8)
      .groupBy("id").agg(count(lit(1)).as("nfp"))
      .join(docs.select(col("doc_id").as("id"), col("n_chars")), "id")
      .select(avg(col("nfp") / (col("n_chars") - 3))).head().getDouble(0)
    // expected 2/(w+1) = 0.222 on random text; template text repeats
    // grams so the DISTINCT (pos, hash) density sits in a loose band
    assert(stats > 0.1 && stats < 0.4, s"density $stats out of band")
  }

  test("winnowOverlapJoin scores a verbatim fragment at exactly 1.0") {
    val docs = Tables.read(spark, sf, "documents")
      .filter(col("doc_id") < 20).select("doc_id", "text")
    val frags = docs.select((col("doc_id") + 1000).as("doc_id"),
      substring(col("text"), 10, 150).as("text"))
    val out = Dedup.winnowOverlapJoin(docs.unionByName(frags),
      "doc_id", "text", minShared = 1, minContainment = 0.999)
    val pairs = out.select("id_a", "id_b").as[(Long, Long)]
      .collect().toSet
    out.unpersist(blocking = false)
    // every (source, fragment) pair must be present at containment 1
    (0L until 20L).foreach { i =>
      assert(pairs.contains((i, i + 1000)),
        s"fragment of doc $i not found at containment 1.0")
    }
  }

  test("maxDocFreq drops corpus-wide fingerprints before the join") {
    // 6 docs sharing one boilerplate sentence + unique tails: the
    // boilerplate fingerprints appear in all 6 docs and are the only
    // source of cross-pair overlap, so maxDocFreq = 3 kills them
    val boiler = "this exact header line appears everywhere verbatim"
    val df = (0 until 6).map(i =>
      (i.toLong, s"$boiler unique tail $i${"x" * i}y${i * 7}"))
      .toDF("id", "txt")
    val open = Dedup.winnowOverlapJoin(df, "id", "txt", minShared = 1)
    val openN = open.count()
    open.unpersist(blocking = false)
    val guarded = Dedup.winnowOverlapJoin(df, "id", "txt",
      minShared = 1, maxDocFreq = Some(3))
    val guardedN = guarded.count()
    guarded.unpersist(blocking = false)
    assert(openN > 0, "boilerplate must create pairs unguarded")
    assert(guardedN < openN,
      s"the guard must remove boilerplate pairs: $guardedN vs $openN")
    intercept[InvalidArgumentValue] {
      Dedup.winnowOverlapJoin(df, "id", "txt", maxDocFreq = Some(1))
    }
    intercept[InvalidArgumentValue] {
      Dedup.winnowOverlapJoin(df, "id", "txt", minContainment = 1.5)
    }
  }

  test("the guard prunes candidates but never changes a score") {
    // source doc = boilerplate + long unique body; fragment = a
    // verbatim substring spanning boilerplate AND unique body; 5
    // filler docs replicate the boilerplate so its fingerprints
    // exceed maxDocFreq = 3. The (source, fragment) pair must
    // survive the guard via the unique-body hashes AND still score
    // containment EXACTLY 1.0 — every fragment fingerprint,
    // including the flood-pruned boilerplate ones, is in the source
    // (the exact-verify recompute; pre-fix the pruned numerator
    // dragged it below 1.0).
    val boiler = "standard license header included on every page"
    val body = "the quick brown fox jumps over the lazy dog while " +
      "seventeen zebras quarrel about juxtaposed quilts near a " +
      "vexingly cozy fjord bank under amber twilight skies"
    val source = s"$boiler $body"
    val frag = source.substring(20, 120) // spans header + body
    val fillers = (10L until 15L).map(i =>
      (i, s"$boiler filler tail number $i ${"z" * i.toInt}"))
    val df = (Seq((0L, source), (1L, frag)) ++ fillers).toDF("id", "txt")
    val guarded = Dedup.winnowOverlapJoin(df, "id", "txt",
      minShared = 1, maxDocFreq = Some(3))
    val pair = guarded.filter(col("id_a") === 0 && col("id_b") === 1)
      .collect()
    guarded.unpersist(blocking = false)
    assert(pair.length == 1, "the fragment pair must survive the guard")
    assert(pair(0).getAs[Double]("containment") == 1.0,
      s"guard must not change the score: ${pair(0)}")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.exceptions.InvalidArgumentValue
import graft.llm.{Selection, Similarity}

/** Data-selection operators: DSIR importance weights/resampling and
  * temperature mixing, plus hard-negative mining (Similarity).
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.read(spark, sf, "documents")

  test("dsirLogWeights: target == raw gives exactly zero weights") {
    val w = Selection.dsirLogWeights(docs, docs, "doc_id", "text",
      numBuckets = 100)
    // ct == cr and NT == NR per bucket ⇒ every log-ratio term is the
    // difference of two IDENTICAL doubles — exact zero, not ≈ zero
    assert(w.filter(col("log_w") =!= 0.0).count() === 0)
    // one weight row per doc, n_grams = 2·tokens − 1 (uni + bi)
    assert(w.count() === docs.count())
  }

  test("dsirLogWeights ranks target-like docs above the rest") {
    val target = docs.filter(col("lang") === "en")
    val w = Selection.dsirLogWeights(docs, target, "doc_id", "text",
        numBuckets = 1000)
      .join(docs.select(col("doc_id").as("id"), col("lang")), "id")
    val avg = w.groupBy(col("lang") === "en")
      .agg(org.apache.spark.sql.functions.avg("log_w").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(avg(true) > avg(false),
      s"English docs must outscore the rest: $avg")
  }

  test("dsirLogWeights validates its arguments") {
    intercept[InvalidArgumentValue] {
      Selection.dsirLogWeights(docs, docs, "doc_id", "text",
        numBuckets = 1)
    }
    intercept[InvalidArgumentValue] {
      Selection.dsirLogWeights(docs, docs, "doc_id", "text",
        smoothing = 0.0)
    }
  }

  test("dsirResampleTopN is deterministic and sized n") {
    val target = docs.filter(col("lang") === "en")
    val a = Selection.dsirResampleTopN(docs, target, "doc_id", "text",
      n = 50, numBuckets = 1000).select("id").as[Long].collect().toSet
    val b = Selection.dsirResampleTopN(docs, target, "doc_id", "text",
      n = 50, numBuckets = 1000).select("id").as[Long].collect().toSet
    assert(a === b)
    assert(a.size === 50)
    intercept[InvalidArgumentValue] {
      Selection.dsirResampleTopN(docs, target, "doc_id", "text", n = 0)
    }
  }

  test("dsirSampleFraction equals the top-n cut at the same size") {
    val target = docs.filter(col("lang") === "en")
    val frac = Selection.dsirSampleFraction(docs, target, "doc_id",
      "text", frac = 0.25, numBuckets = 1000)
    val got = frac.select("id").as[Long].collect().toSet
    frac.unpersist(blocking = false)
    // the exact-quantile threshold keeps the top ⌈frac·(N−1)⌉-ish set;
    // derive the expected set from the full ranked key list
    val n = docs.count().toInt
    val all = Selection.dsirResampleTopN(docs, target, "doc_id", "text",
      n = n, numBuckets = 1000).collect()
    val keys = all.map(_.getDouble(2)).sorted
    val pos = 0.75 * (n - 1)
    val lo = keys(math.floor(pos).toInt)
    val hi = keys(math.ceil(pos).toInt)
    val thr = (math.ceil(pos) - pos) * lo + (pos - math.floor(pos)) * hi
    val want = all.filter(_.getDouble(2) >= thr).map(_.getLong(0)).toSet
    assert(got === want)
    intercept[InvalidArgumentValue] {
      Selection.dsirSampleFraction(docs, target, "doc_id", "text",
        frac = 1.0)
    }
  }

  test("temperatureWeights: α = 1 is natural, α = 0 is uniform") {
    val nat = Selection.temperatureWeights(docs, "source", "n_chars",
      alpha = 1.0).collect()
    nat.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getLong(1).toDouble) < 1e-6,
        s"α=1 weight must equal mass: $r")
    }
    val uni = Selection.temperatureWeights(docs, "source", "n_chars",
      alpha = 0.0)
    assert(uni.select("weight").distinct().count() === 1)
    val shares = uni.select(sum("share")).head().getDouble(0)
    assert(math.abs(shares - 1.0) < 1e-9)
    intercept[InvalidArgumentValue] {
      Selection.temperatureWeights(docs, "source", "n_chars", 1.5)
    }
  }

  test("temperatureMixSample respects per-source budgets and α flattens") {
    val budget = 30000L
    val sel = Selection.temperatureMixSample(docs, "doc_id", "n_chars",
      "source", alpha = 0.5, totalBudget = budget)
    val w = Selection.temperatureWeights(docs, "source", "n_chars", 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val kept = sel.groupBy("source")
      .agg(sum("n_chars").as("chars")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    kept.foreach { case (s, c) =>
      assert(c <= math.floor(budget * w(s)),
        s"source $s kept $c > budget ${budget * w(s)}")
    }
    // flattening: the max/min share ratio at α = 0.5 must be the
    // square root of the natural mass ratio (exactly, modulo the 9dp
    // weight rounding)
    val masses = docs.groupBy("source").agg(sum("n_chars").as("m"))
      .collect().map(_.getLong(1).toDouble)
    val natRatio = masses.max / masses.min
    val shares = w.values
    assert(math.abs(shares.max / shares.min -
      math.sqrt(natRatio)) < 1e-6)
  }

  test("temperatureMixSample drops zero-mass sources instead of failing") {
    val withZero = docs.withColumn("n_chars",
      when(col("source") === "src0", lit(0L))
        .otherwise(col("n_chars")))
    // at α > 0 the weight is 0; at α = 0 pow(0,0) = 1 would smuggle
    // the dead source a budget — both must drop on mass, not weight
    for (alpha <- Seq(0.5, 0.0)) {
      val sel = Selection.temperatureMixSample(withZero, "doc_id",
        "n_chars", "source", alpha = alpha, totalBudget = 10000L)
      assert(sel.filter(col("source") === "src0").count() === 0,
        s"alpha=$alpha kept zero-mass docs")
      assert(sel.count() > 0)
    }
    // empty corpus => empty selection, not a require() blow-up
    assert(Selection.temperatureMixSample(docs.filter(lit(false)),
      "doc_id", "n_chars", "source", alpha = 0.5,
      totalBudget = 10000L).count() === 0)
  }

  test("hardNegatives: labels always differ, band holds, rank is topK") {
    val emb = Tables.read(spark, sf, "embeddings")
    val anchors = emb.filter(col("vec_id") < 3)
    val corpus = emb.filter(col("vec_id") >= 3)
    val neg = Similarity.hardNegatives(corpus, anchors, "vec_id",
      "vec_id", "embedding", "label", k = 5, simLo = 0.0, simHi = 0.9)
    val rows = neg.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("q_label") != r.getAs[Int]("c_label"))
      val s = r.getAs[Double]("sim")
      assert(s >= 0.0 && s < 0.9)
    }
    // per-anchor: ranked descending, ≤ k rows
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.length <= 5)
      val sims = g.sortBy(_.getLong(1)).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    // against brute force: dropping the label/band filters, the top-k
    // with an all-pass band over a single-label corpus must equal
    // bruteForceTopK against the OTHER-labeled slice
    val lbl = corpus.filter(col("label") =!= 0)
    val a0 = anchors.filter(col("label") === 0)
    if (a0.count() > 0) {
      val viaHn = Similarity.hardNegatives(lbl, a0, "vec_id", "vec_id",
        "embedding", "label", k = 5)
        .select("qid", "rnk", "cid").collect().toSet
      val viaBf = Similarity.bruteForceTopK(lbl, a0, "vec_id", "vec_id",
        "embedding", k = 5)
        .select("qid", "rnk", "cid").collect().toSet
      assert(viaHn === viaBf)
    }
    intercept[InvalidArgumentValue] {
      Similarity.hardNegatives(corpus, anchors, "vec_id", "vec_id",
        "embedding", "label", k = 5, simLo = 0.5, simHi = 0.5)
    }
  }

  test("hardNegatives default band keeps exact-duplicate negatives") {
    // a scaled copy of the anchor under a DIFFERENT label has cosine
    // exactly 1.0 — the hardest possible negative; the default
    // (unbounded-above) band must return it at rank 1, while an
    // explicit semi-hard band < 1.0 excludes it
    val anchors = Seq((0L, Seq(1.0f, 0.0f), 0)).toDF(
      "vec_id", "embedding", "label")
    val corpus = Seq(
      (1L, Seq(2.0f, 0.0f), 1),   // exact direction copy, sim = 1.0
      (2L, Seq(1.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val dflt = Similarity.hardNegatives(corpus, anchors, "vec_id",
      "vec_id", "embedding", "label", k = 2).collect()
    assert(dflt.head.getLong(2) === 1L &&
      dflt.head.getAs[Double]("sim") === 1.0,
      s"sim=1.0 negative must rank first by default: ${dflt.toSeq}")
    val banded = Similarity.hardNegatives(corpus, anchors, "vec_id",
      "vec_id", "embedding", "label", k = 2, simLo = -1.0,
      simHi = 1.0).collect()
    assert(!banded.exists(_.getLong(2) == 1L),
      "an explicit [lo, 1.0) band must exclude the exact duplicate")
  }

  test("dsirSampleFraction on an empty corpus returns empty") {
    val empty = docs.filter(col("doc_id") < 0)
    val sel = Selection.dsirSampleFraction(empty, docs, "doc_id",
      "text", frac = 0.5)
    assert(sel.count() === 0)
    sel.unpersist(blocking = false)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Multimodal, Selection, Similarity, TextAnalysis}
import graft.operators.Relational

/** LLM-training-data pipeline operators exercised end-to-end over the
  * `documents` / `embeddings` testdata (SURVEY.md §7.2 M8 — the
  * BASELINE extensions beyond the reference surface).
  *
  * Oracle notes:
  *   - the documents table ships PLANTED near-duplicates: 25 pairs at
  *     char-4-gram Jaccard ≥ 0.8 (none in [0.75, 0.85] — clean margin)
  *     and 20 pairs at SimHash Hamming ≤ 3;
  *   - exact-duplicate / jitter corpora are CONSTRUCTED identically on
  *     both sides (Spark + oracle SQL), since the raw tables contain
  *     no exact dups and no high-cosine pairs;
  *   - every hash the oracle must reproduce is md5-based (DuckDB can't
  *     compute xxhash64); xxhash64 appears only where the oracle never
  *     sees it (MinHash signatures — verified by exact Jaccard).
  */
object QueriesLlm {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(spark, dir, name)

  /** q30 — exact dedup metrics on documents ∪ re-keyed copies of the
    * first 100 docs (the constructed corpus has exactly 100 dup groups).
    */
  def q30DedupExact(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val corpus = docs.select("doc_id", "text").unionByName(
      docs.filter(col("doc_id") < 100)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    Dedup.exactDupStats(corpus, "text")
  }

  /** q31 — MinHash-LSH near-dup pairs (banded candidates, exact
    * Jaccard verify) finding the planted near-duplicates. Runs the
    * DEFAULT path — which since round 9 includes the band-bucket
    * flood guard (maxBandBucket = 2000) — so the oracle hash pins
    * that the guard changes nothing on a non-flooded corpus.
    */
  def q31DedupMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDups(t(spark, dir, "documents"), "doc_id", "text",
        shingleK = 4, numHashes = 128, bands = 32, threshold = 0.8,
        minBandMatches = 3)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")

  /** q142 — q31's funnel on the ONE-PERMUTATION signature family
    * (`sigFamily = "oph"`: one bucket update per shingle occurrence
    * in place of 128 affine evaluations — the 100-TB signature-CPU
    * formulation, Li/Owen/Zhang 2012 + rotation densification).
    * Signatures, bands, and candidates all differ from q31's, but
    * every surviving pair is exact-verified, so the oracle is the
    * SAME DuckDB brute-force exact Jaccard — a hash match pins OPH
    * recall = 1 at these parameters on this corpus, not merely
    * plausible signatures.
    */
  def q142DedupMinhashOph(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDups(t(spark, dir, "documents"), "doc_id", "text",
        shingleK = 4, numHashes = 128, bands = 32, threshold = 0.8,
        minBandMatches = 3, sigFamily = "oph")
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")

  /** q32 — SimHash near-dup pairs; pigeonhole chunking makes the
    * candidate set a guaranteed superset at Hamming ≤ 3. Runs the
    * DEFAULT path — which since round 9 includes the chunk-bucket
    * flood guard (maxChunkBucket = 2000) — so the oracle hash pins
    * that the guard changes nothing on a non-flooded corpus.
    */
  def q32DedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDups(t(spark, dir, "documents"), "doc_id", "text",
        maxHamming = 3)
      .orderBy("id_a", "id_b")

  /** q55 — EXACT word-trigram Jaccard near-dup pairs via prefix
    * filtering (no sketch — the recall-guaranteed dedup mode). The
    * oracle recomputes the same thing by brute force in DuckDB.
    */
  def q55DedupJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardNearDups(t(spark, dir, "documents"), "doc_id",
        "text", n = 3, threshold = 0.5)
      .select(col("id_a"), col("id_b"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")

  /** q56 — Gopher-style repetition metrics (distinct-token fraction,
    * top-bigram fraction, duplicated-bigram fraction) per document.
    */
  def q56RepetitionStats(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(
        t(spark, dir, "documents").filter(col("doc_id") < 250),
        "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"),
        round(col("distinct_token_frac"), 6).as("distinct_token_frac"),
        round(col("top_bigram_frac"), 6).as("top_bigram_frac"),
        round(col("dup_bigram_frac"), 6).as("dup_bigram_frac"))
      .orderBy("doc_id")

  /** q57 — leakage-safe train/eval split: minhash near-dup pairs →
    * connected components → md5-mod split of the cluster ROOT, so no
    * near-dup pair straddles splits. The oracle recomputes the pair
    * set by brute-force Jaccard, the components by recursive CTE, and
    * the same md5 assignment.
    */
  def q57LeakageSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    // flood guard ON via the round-9 default (2000 — the measured
    // crossover value): a split pipeline runs unsupervised over
    // whatever the corpus contains, and hub-edge connectivity is all
    // dupClusters needs; on this clean corpus the cap provably
    // changes nothing (the oracle hash pins it)
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      shingleK = 4, numHashes = 128, bands = 32, threshold = 0.8,
      minBandMatches = 3)
    // dupClusters (inside leakageSafeSplit) is iterative and
    // therefore eager — by the time split is built, `pairs` has been
    // fully consumed and its cache can go
    val split = Dedup.leakageSafeSplit(docs, "doc_id", pairs,
      evalKeep = 2, evalOutOf = 10)
    pairs.unpersist(blocking = false)
    split.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("chars_total"))
      .orderBy("split")
  }

  /** q58 — sequence packing: greedy in-id-order binning of documents
    * into 256-token contexts across 4 md5-mod shards. The oracle
    * replays the same sequential fold with a recursive CTE.
    */
  def q58PackSequences(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.packSequences(
        t(spark, dir, "documents")
          .withColumn("n_tok", TextAnalysis.approxBpeTokens(col("text"))),
        "doc_id", "n_tok", capacity = 256L, shards = 4)
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("tokens_used"))
      .orderBy("shard", "bin")

  /** q59 — eval-set contamination: corpus docs (id < 450) sharing a
    * word 8-gram with any "benchmark" doc (id ≥ 450). Catches exactly
    * the planted near-dup pairs that straddle the split.
    */
  def q59Contamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Dedup.contaminationCheck(
        docs.filter(col("doc_id") < 450), "doc_id", "text",
        docs.filter(col("doc_id") >= 450), "doc_id", "text", n = 8)
      .select(col("id").as("doc_id"), col("n_shared_grams"),
        col("n_eval_docs"),
        round(col("contamination_frac"), 6).as("contamination_frac"))
      .orderBy("doc_id")
  }

  /** q60 — exactly-5-per-(lang, source) deterministic stratified
    * sample (md5-rank membership, re-derivable forever).
    */
  def q60StratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Relational.stratifiedSampleExact(t(spark, dir, "documents"),
        Seq("lang", "source"), "doc_id", k = 5)
      .select("lang", "source", "doc_id")
      .orderBy("lang", "source", "doc_id")

  /** q61 — token-budget mixture sampling: sources src0–src9 at weight
    * 1, src10–src14 at weight 2 (src15–src19 unweighted ⇒ dropped),
    * 60k chars of total budget split proportionally; each source
    * contributes docs in md5-of-id order until its budget is spent.
    * The oracle replays the identical running-sum rule with one
    * window (the engine's bucketed two-phase form must be
    * indistinguishable from the naive global form).
    */
  def q61MixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val weights =
      ((0 until 10).map(i => s"src$i" -> 1.0) ++
        (10 until 15).map(i => s"src$i" -> 2.0)).toMap
    TextAnalysis.sampleToBudget(t(spark, dir, "documents"),
        "doc_id", "n_chars", "source", weights, totalBudget = 60000L)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("chars_kept"))
      .orderBy("source")
  }

  /** q62 — cross-document duplicated-gram fraction (word 5-grams,
    * shared with ≥ 2 docs): the corpus-level boilerplate signal; the
    * planted near-dup pairs light up with frac ≈ 1 while the random
    * tail sits near 0.
    */
  def q62DupGramFrac(spark: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedGramStats(t(spark, dir, "documents"),
        "doc_id", "text", n = 5, minDocs = 2)
      .select(col("id").as("doc_id"), col("n_grams"), col("n_dup_grams"),
        round(col("dup_gram_frac"), 6).as("dup_gram_frac"))
      .orderBy("doc_id")

  /** q63 — product-quantization ANN with exact re-rank: corpus stored
    * as 8 byte-sized codes per vector (32× compression of the 64-dim
    * floats), ADC-table scan, top-50 shortlist, exact-cosine re-rank
    * to top-10. No SQL oracle — PQ's k-means codebooks aren't
    * SQL-expressible — so the driver records the rows-only check; the
    * ranking contract is pinned by LlmSpec (exactness in the
    * one-codeword-per-vector limit, recall ≥ 0.9 clustered, reranked
    * sims exactly equal brute-force cosines).
    */
  def q63AnnPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.pqTopK(
        emb.filter(col("vec_id") >= 5), emb.filter(col("vec_id") < 5),
        "vec_id", "vec_id", "embedding", k = 10, m = 8, ncodes = 16,
        shortlist = 50)
      .select(col("qid"), col("rnk"), col("cid"),
        round(col("sim"), 4).as("sim"))
      .orderBy("qid", "rnk")
  }

  /** q118 — the PQ ADC scan under FIXED codebooks, hash-checked
    * end-to-end (the oracle-checked companion to the rows-only q63):
    * with `kmeansIters = 0` the codebooks are exactly the 16
    * lowest-id normalized corpus vectors' subspace slices — fully
    * SQL-expressible — so the oracle replays the ENTIRE PQ pipeline
    * in DuckDB: normalize → slice codebooks → nearest-code encoding
    * (argmin L2, ties to the lowest code) → per-query ADC tables →
    * m-lookup approximate sims → top-50 shortlist → exact-cosine
    * re-rank to top-10. q63 keeps the trained-codebook configuration
    * (k-means artifacts aren't SQL-expressible); between them the
    * codebook training is spec-pinned and everything downstream of
    * the codebooks is oracle-pinned.
    */
  def q118AnnPqFixed(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.pqTopK(
        emb.filter(col("vec_id") >= 5), emb.filter(col("vec_id") < 5),
        "vec_id", "vec_id", "embedding", k = 10, m = 8, ncodes = 16,
        kmeansIters = 0, shortlist = 50)
      .select(col("qid"), col("rnk"), col("cid"),
        round(col("sim"), 4).as("sim"))
      .orderBy("qid", "rnk")
  }

  /** q119 — DSIR importance weights (Xie et al. 2023): target = the
    * English slice, raw = the whole corpus, hashed uni+bigram
    * features into 1000 md5 buckets, add-1 smoothing. English docs
    * must surface with log_w > the non-English tail — the signal the
    * resampler (q120) selects by. The oracle replays gram hashing,
    * both bucket models, and the log-ratio sum in DuckDB.
    */
  def q119DsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Selection.dsirLogWeights(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text", numBuckets = 1000, smoothing = 1.0)
      .select(col("id").as("doc_id"), col("n_grams"),
        round(col("log_w"), 6).as("log_w"))
      .orderBy("doc_id")
  }

  /** q120 — DSIR selection, fraction form (the 100 TB path): Gumbel
    * keys from md5-derived uniforms, the exact 0.75-quantile
    * threshold from the distributed histogram-refinement selector,
    * keep keys above it (≈ 25% of the corpus, skewed toward the
    * English target). Summarized per lang so the result is
    * selection-set-shaped, not float-shaped.
    */
  def q120DsirSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val sel = Selection.dsirSampleFraction(docs,
      docs.filter(col("lang") === "en"), "doc_id", "text",
      frac = 0.25, numBuckets = 1000, smoothing = 1.0)
    val out = sel.join(docs.select(col("doc_id").as("id"), col("lang"),
        col("source"), col("n_chars")), "id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("chars_kept"))
      .orderBy("lang")
    // sel is persisted by the operator (caller-unpersists contract):
    // materialize the summary before releasing it
    val matd = out.persist()
    matd.count()
    sel.unpersist(blocking = false)
    matd
  }

  /** q121 — temperature-mixed sample (α = 0.5, the XLM-R rule):
    * per-source budgets ∝ √mass normalized, filled by the
    * deterministic hash-ordered prefix rule (q61's machinery with
    * computed instead of literal weights). Flatter than natural: the
    * small sources keep a larger share than their mass.
    */
  def q121TemperatureMix(spark: SparkSession, dir: String): DataFrame =
    Selection.temperatureMixSample(t(spark, dir, "documents"),
        "doc_id", "n_chars", "source", alpha = 0.5,
        totalBudget = 60000L)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("chars_kept"))
      .orderBy("source")

  /** q122 — hard-negative mining for contrastive training: for the 5
    * anchor vectors, the 10 most-similar corpus vectors with a
    * DIFFERENT label inside the semi-hard band [0, 0.95) — informative
    * negatives, not mislabeled near-dups. Exact scoring (the oracle is
    * the same cross join + filters in DuckDB); at web scale the same
    * filters apply to IVF-probed candidates instead.
    */
  def q122HardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.hardNegatives(
        emb.filter(col("vec_id") >= 5), emb.filter(col("vec_id") < 5),
        "vec_id", "vec_id", "embedding", "label", k = 10,
        simLo = 0.0, simHi = 0.95)
      .select(col("qid"), col("rnk"), col("cid"),
        round(col("sim"), 4).as("sim"), col("q_label"), col("c_label"))
      .orderBy("qid", "rnk")
  }

  /** q123 — content-defined chunking: md5-gated token boundaries
    * (window 3, divisor 16, chunks clamped to [10, 40] tokens). The
    * oracle replays the boundary hash AND the greedy cut walk as a
    * recursive CTE over each doc's boundary list — every chunk's
    * position, length, and text hash-checked.
    */
  def q123CdcChunks(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.cdcChunkDocuments(t(spark, dir, "documents"),
        "doc_id", "text",
        windowTokens = 3, divisor = 16, minTokens = 10, maxTokens = 40)
      .select(col("id").as("doc_id"), col("chunk_id"),
        col("start_tok"), col("n_chunk_tokens"), col("chunk_text"))
      .orderBy("doc_id", "chunk_id")

  /** q124 — SHIFT-ROBUST chunk dedup: the corpus ∪ prefix-shifted
    * copies ("zzz " prepended, re-keyed ids). Fixed windows (q87)
    * find almost nothing here — one prepended token shifts every
    * 25-token window — while CDC boundaries re-align within one
    * chunk, so the copies light up with dup_frac ≈ 1. Same
    * distinct-(doc, chunk) ≥-2-docs counting shape as q62.
    */
  def q124CdcShiftDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    val shifted = docs.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(lit("zzz "), col("text")).as("text"))
    val corpus = docs.unionByName(shifted)
    val chunks = TextAnalysis.cdcChunkDocuments(corpus, "doc_id",
      "text", windowTokens = 3, divisor = 16, minTokens = 10,
      maxTokens = 40)
    val dg = chunks.select(col("id"), col("chunk_text")).distinct()
    val freq = dg.groupBy("chunk_text").agg(count(lit(1)).as("__nd"))
    dg.join(freq, "chunk_text")
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__nd") >= 2, 1L).otherwise(0L))
          .as("n_dup_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        round(col("n_dup_chunks") / col("n_chunks"), 6).as("dup_frac"))
      .orderBy("doc_id")
  }

  /** q125 — language-MIX statistics (code-switch detection): docs
    * constructed as 3-line composites (doc i + docs i+100, i+250 as
    * lines — the q74 line-synthesis convention), so cross-language
    * composites surface with n_langs ≥ 2 / entropy > 0 while
    * same-language composites stay monolingual. Each line is
    * language-ID'd by the q37 stopword-argmax rule; the oracle
    * replays per-line token-list filtering + the entropy formula.
    */
  def q125LangMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    val a = docs.filter(col("doc_id") < 100)
    val b = docs.select((col("doc_id") - 100).as("doc_id"),
      col("text").as("t2"))
    val c = docs.select((col("doc_id") - 250).as("doc_id"),
      col("text").as("t3"))
    val corpus = a.join(b, "doc_id").join(c, "doc_id")
      .select(col("doc_id"),
        concat_ws("\n", col("text"), col("t2"), col("t3")).as("text"))
    TextAnalysis.langMixStats(corpus, "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_lines"), col("n_langs"),
        col("top_lang"), round(col("top_share"), 6).as("top_share"),
        round(col("lang_entropy"), 6).as("lang_entropy"))
      .orderBy("doc_id")
  }

  /** q126 — cross-corpus n-gram novelty: sources src10–19 scored
    * against the src0–9 reference (word 5-grams, q62's gram
    * convention) — the "how much new content does this snapshot add"
    * signal. Spark joins on xxhash64 gram hashes, the oracle on gram
    * strings (the q59 precedent — collisions would need ~2^32
    * distinct grams).
    */
  def q126GramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val newSrc = (10 to 19).map(i => s"src$i")
    Dedup.gramNoveltyScore(
        docs.filter(col("source").isin(newSrc: _*)),
        docs.filter(!col("source").isin(newSrc: _*)),
        "doc_id", "text", "doc_id", "text", n = 5)
      .select(col("id").as("doc_id"), col("n_grams"), col("n_novel"),
        round(col("novelty"), 6).as("novelty"))
      .orderBy("doc_id")
  }

  /** q128 — winnowing fingerprints (MOSS): char-4-gram md5 hashes,
    * window 8, rightmost-minimal selection. The oracle replays gram
    * hashing, the per-window min, and the rightmost tie-break
    * position-for-position.
    */
  def q128Winnow(spark: SparkSession, dir: String): DataFrame =
    Dedup.winnowFingerprints(t(spark, dir, "documents"),
        "doc_id", "text", k = 4, w = 8)
      .select(col("id").as("doc_id"), col("pos"), col("fp"))
      .orderBy("doc_id", "pos", "fp")

  /** q129 — winnowed overlap pairs on the first 50 docs ∪ extracted
    * fragments (120-char substrings, re-keyed): a verbatim
    * fragment's fingerprints are ALL in its source, so every planted
    * pair sits at containment exactly 1.0 — the 0.8 threshold
    * surfaces them (plus any genuine near-containments the synthetic
    * corpus's shared phrasing creates, which the oracle reproduces
    * identically). Full SQL replay of hashing, window minima, sizes,
    * and the score.
    */
  def q129WinnowOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .filter(col("doc_id") < 50).select("doc_id", "text")
    val fragments = docs
      .select((col("doc_id") + 20000).as("doc_id"),
        substring(col("text"), 30, 120).as("text"))
    val out = Dedup.winnowOverlapJoin(docs.unionByName(fragments),
        "doc_id", "text", k = 4, w = 8, minShared = 3,
        minContainment = 0.8)
      .select(col("id_a"), col("id_b"), col("n_shared"),
        round(col("containment"), 6).as("containment"))
      .orderBy("id_a", "id_b")
    out
  }

  /** q130 — the composed winnow-dedup pipeline (guard defaulted ON):
    * q129's corpus through [[Dedup.dedupWinnowOverlaps]] — guarded
    * overlap pairs → connected components → min-id survivor per
    * cluster — with maxDocFreq = 20 so the flood guard is live on
    * this corpus's shared-phrasing fingerprints. The oracle replays
    * the doc-freq pruning, the EXACT n_shared recompute on unfiltered
    * sets, the containment filter, and the components (recursive CTE,
    * the q57 convention).
    */
  def q130WinnowDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .filter(col("doc_id") < 50).select("doc_id", "text")
    val fragments = docs
      .select((col("doc_id") + 20000).as("doc_id"),
        substring(col("text"), 30, 120).as("text"))
    Dedup.dedupWinnowOverlaps(docs.unionByName(fragments),
        "doc_id", "text", k = 4, w = 8, minShared = 3,
        minContainment = 0.8, maxDocFreq = 20)
      .select(col("doc_id").cast("long").as("doc_id"))
      .orderBy("doc_id")
  }

  /** q132 — tokenizer fertility per source under q72's fixed merge
    * list: word / in-word-char / BPE-token totals plus tokens-per-word
    * and chars-per-token. The oracle replays q72's replace-chain
    * segmentation per word (replace's left-to-right non-overlapping
    * scan IS `applyMerge`'s) and aggregates per source.
    */
  def q132BpeFertility(spark: SparkSession, dir: String): DataFrame =
    graft.llm.Bpe.bpeFertility(t(spark, dir, "documents"),
        "source", "text", Seq(("e", "r"), ("t", "h"), ("th", "e")))
      .orderBy("grp")

  /** q133 — HTML-to-text extraction with link density. The corpus has
    * no markup, so pages are built DETERMINISTICALLY on both sides:
    * every doc is wrapped in a fixed skeleton (comment + script +
    * style + h1 + p + one anchor), and ` and ` → ` &amp; ` plants
    * entities in the prose. The oracle replays block stripping, tag
    * removal, the entity chain (same order, `&amp;` last), whitespace
    * collapse, and the anchor-chars numerator with the same regexes
    * (DuckDB's RE2 and Java's regex agree on every pattern used:
    * non-greedy, (?si), \b, char classes).
    */
  def q133HtmlExtract(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val html = concat(
      lit("<html><!-- generated --><head><script type=\"text/javascript\">var x = 1 < 2;</script><style>p { color: red; }</style></head><body><h1>"),
      col("source"), lit("</h1><p>"),
      regexp_replace(col("text"), " and ", " &amp; "),
      lit("</p><a href=\"/doc/"), col("doc_id").cast("string"),
      lit("\">more &gt; here</a></body></html>"))
    TextAnalysis.extractHtmlText(
        docs.select(col("doc_id"), html.as("html")), "doc_id", "html")
      .select(col("id").as("doc_id"), col("text"), col("n_chars"),
        col("link_density"))
      .orderBy("doc_id")
  }

  /** q134 — the corpus data card: one long-format (section, metric,
    * value) summary composing global counts, exact-dup rate, lang and
    * source shares, exact length quantiles (`Quantiles.exactQuantiles`
    * == `quantile_cont`) and the q64-rule quality pass rate. The
    * oracle is a UNION ALL of each section's existing oracle shape.
    */
  def q134DataCard(spark: SparkSession, dir: String): DataFrame =
    graft.llm.DataCard.corpusDataCard(t(spark, dir, "documents"),
        "doc_id", "text", "lang", "source",
        TextAnalysis.QualityRules(minTokens = 30, maxTokens = 90,
          minAvgTokenLen = 3.0, maxAvgTokenLen = 4.5,
          maxSymbolFrac = 0.1, minAlphaTokenFrac = 0.8,
          minStopwordHits = 1))
      .orderBy("section", "metric")

  /** q135 — data-card DIFF between two snapshots: the first 400 docs
    * ("old") vs the full corpus ("new"), q134's rules on both sides.
    * The oracle computes both cards in ONE pass by tagging each doc
    * with the scopes it belongs to (old ⊆ new), grouping every card
    * section by scope, then full-outer-joining old vs new on
    * (section, metric) — the exact join `dataCardDiff` runs.
    */
  def q135DataCardDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val rules = TextAnalysis.QualityRules(minTokens = 30,
      maxTokens = 90, minAvgTokenLen = 3.0, maxAvgTokenLen = 4.5,
      maxSymbolFrac = 0.1, minAlphaTokenFrac = 0.8,
      minStopwordHits = 1)
    val oldCard = graft.llm.DataCard.corpusDataCard(
      docs.filter(col("doc_id") < 400), "doc_id", "text", "lang",
      "source", rules)
    val newCard = graft.llm.DataCard.corpusDataCard(
      docs, "doc_id", "text", "lang", "source", rules)
    graft.llm.DataCard.dataCardDiff(oldCard, newCard)
      .orderBy("section", "metric")
  }

  /** q136 — surgical decontamination: q59/q66's corpus/eval split
    * (docs < 450 vs ≥ 450, 8-grams), but instead of flagging the
    * contaminated docs, the covered spans are DELETED and the rest of
    * each doc survives. The oracle replays q65's span-surgery CTE
    * with the duplicated-gram set swapped for the eval set's distinct
    * full-width grams.
    */
  def q136DecontaminateSpans(spark: SparkSession,
                             dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Dedup.removeContaminatedSpans(
        docs.filter(col("doc_id") < 450), "doc_id", "text",
        docs.filter(col("doc_id") >= 450), "doc_id", "text", n = 8)
      .select(col("id").as("doc_id"), col("n_tokens"),
        col("n_removed"), col("text_clean"))
      .orderBy("doc_id")
  }

  /** q64 — Gopher-rule quality filter: thresholds chosen to split the
    * corpus on three rules (token count 30–90, avg word length ≤ 4.5,
    * ≥ 1 English stopword hit) while the symbol/alpha rules pass
    * trivially on this all-letters corpus (their logic is pinned by
    * LlmSpec on crafted fixtures).
    */
  def q64QualityFilter(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityFilter(t(spark, dir, "documents"),
        "doc_id", "text",
        TextAnalysis.QualityRules(minTokens = 30, maxTokens = 90,
          minAvgTokenLen = 3.0, maxAvgTokenLen = 4.5,
          maxSymbolFrac = 0.1, minAlphaTokenFrac = 0.8,
          minStopwordHits = 1))
      .orderBy("doc_id")

  /** q65 — duplicated-span REMOVAL (substring-level dedup): words
    * covered by any cross-document word 5-gram are deleted and the
    * survivors rejoined; the planted near-dup pairs lose most of their
    * text while the random tail passes through (lowercased) intact.
    */
  def q65RemoveSpans(spark: SparkSession, dir: String): DataFrame =
    Dedup.removeDuplicatedSpans(t(spark, dir, "documents"),
        "doc_id", "text", n = 5, minDocs = 2)
      .select(col("id").as("doc_id"), col("n_tokens"), col("n_removed"),
        col("text_clean"))
      .orderBy("doc_id")

  /** q66 — contamination with the Bloom prefilter engaged: must be
    * row-identical to q59 (same oracle SQL) — Bloom false positives
    * die in the exact join, so only the plan changes, never the
    * answer.
    */
  def q66ContaminationBloom(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Dedup.contaminationCheck(
        docs.filter(col("doc_id") < 450), "doc_id", "text",
        docs.filter(col("doc_id") >= 450), "doc_id", "text", n = 8,
        bloomFpp = Some(0.01))
      .select(col("id").as("doc_id"), col("n_shared_grams"),
        col("n_eval_docs"),
        round(col("contamination_frac"), 6).as("contamination_frac"))
      .orderBy("doc_id")
  }

  /** q67 — the end-to-end corpus-curation funnel, operators COMPOSED
    * the way a real pre-training pipeline chains them: Gopher quality
    * filter → exact n-gram-Jaccard near-dup clusters → keep-one-per-
    * cluster dedup → greedy sequence packing. One row per stage with
    * surviving unit count and token mass; the oracle replays all four
    * stages in one recursive-CTE SQL statement, so the COMPOSITION
    * (not just each operator) is hash-checked. The packed stage's
    * token mass must equal the dedup stage's — conservation is built
    * into the check.
    */
  def q67CurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val tok = TextAnalysis.approxBpeTokens(col("text"))
    val rules = TextAnalysis.QualityRules(minTokens = 30, maxTokens = 90,
      minAvgTokenLen = 3.0, maxAvgTokenLen = 4.5, maxSymbolFrac = 0.1,
      minAlphaTokenFrac = 0.8, minStopwordHits = 1)
    // The quality gate is computed ONCE on a spread scan and the
    // surviving (doc_id, text) rows persisted: the pre-r14 shape
    // re-ran qualityFilter's regex stats inside every downstream
    // subtree (the pair funnel, the dedup anti-join, two funnel
    // aggregates, the packing input) — four serial ~2.2 task-sec
    // single-task re-evaluations of the same gate at sf0.1
    // (JobBreakdown r14). Values are unchanged: the same rows flow
    // into every stage, they are just computed once.
    val docsS = graft.llm.InputSpread.spreadSmallScan(
      docs.select(col("doc_id"), col("text")), "doc_id")
    val quality = docsS.join(
        TextAnalysis.qualityFilter(docsS, "doc_id", "text", rules)
          .filter(col("keep") === 1).select("doc_id"),
        "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    quality.count()
    val pairs = Dedup.ngramJaccardNearDups(quality, "doc_id", "text",
      n = 3, threshold = 0.5)
    // dedupNearDups' cluster propagation is eager (it runs during this
    // call and checkpoints its labels), so the materialized pair frame
    // can be released immediately — the caller-unpersists contract
    val deduped =
      try Dedup.dedupNearDups(quality, "doc_id", pairs)
      finally pairs.unpersist(blocking = false)
    val packed = TextAnalysis.packSequences(
      deduped.withColumn("__tok", tok), "doc_id", "__tok",
      capacity = 256L, shards = 4)
    def funnel(df: DataFrame, stage: String): DataFrame =
      df.agg(count(lit(1)).as("n_units"),
          sum(tok).cast("long").as("n_tokens"))
        .select(lit(stage).as("stage"), col("n_units"), col("n_tokens"))
    // the 4-row result is materialized so the quality cache can be
    // released before returning (the minhashNearDups convention)
    val out = funnel(docs, "0_raw")
      .unionByName(funnel(quality, "1_quality"))
      .unionByName(funnel(deduped, "2_dedup"))
      .unionByName(packed.agg(
          count_distinct(struct(col("shard"), col("bin"))).as("n_units"),
          sum("n_tokens").cast("long").as("n_tokens"))
        .select(lit("3_packed").as("stage"), col("n_units"),
          col("n_tokens")))
      .orderBy("stage")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    quality.unpersist(blocking = false)
    out
  }

  /** q68 — corpus-trained unigram cross-entropy per document (the
    * SQL-replayable perplexity filter): the word-soup corpus scores a
    * narrow bits-per-token band; outliers would be the filter's catch.
    */
  def q68UnigramLogprob(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramLogProb(t(spark, dir, "documents"),
        "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_tokens"),
        round(col("bits_per_token"), 6).as("bits_per_token"))
      .orderBy("doc_id")

  /** q69 — top-3 best-quality documents per (lang, source): the
    * selection step of a curation pipeline, via the two-phase
    * `topKPerGroup` (no single-partition group windows). Ordering is
    * total: rounded quality score desc, doc_id asc.
    */
  def q69TopQualityPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val scored = docs.select(col("doc_id"), col("lang"), col("source"))
      .join(TextAnalysis.stats(docs, "doc_id", "text")
        .select(col("doc_id"), col("quality_score")), "doc_id")
    Relational.topKPerGroup(scored, Seq("lang", "source"),
        Seq(col("quality_score").desc, col("doc_id").asc), k = 3)
      .select(col("lang"), col("source"), col("rk"), col("doc_id"),
        col("quality_score"))
      .orderBy("lang", "source", "rk")
  }

  /** q70 — per-source length-distribution monitoring (exact
    * interpolated percentiles): the drift dashboard a curation
    * pipeline watches between ingests. The quantiles run through
    * `Quantiles.exactQuantiles` (bit-equal to `percentile`, which
    * shares DuckDB `quantile_cont`'s continuous interpolation, so the
    * oracle is a direct replay) — O(buckets) aggregation state per
    * group instead of percentile's per-group distinct-value map.
    */
  def q70LengthQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val qs = graft.operators.Quantiles
      .exactQuantiles(docs, Seq("source"), "n_chars", Seq(0.5, 0.9, 0.99))
      .groupBy("source")
      .agg(round(max(when(col("p") === 0.5, col("q"))), 6).as("p50"),
        round(max(when(col("p") === 0.9, col("q"))), 6).as("p90"),
        round(max(when(col("p") === 0.99, col("q"))), 6).as("p99"))
    docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(qs, "source")
      .orderBy("source")
  }

  /** q52 — near-dup CLUSTERS: simhash pairs → connected components →
    * (cluster root, size, surviving docs). Pairs alone over-count on
    * chains; this is the step a dedup pipeline actually ships. The
    * oracle recomputes the components with a recursive-CTE transitive
    * closure over the same brute-force pair set.
    */
  def q52DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    // persisted: dupClusters' symmetric edge union reads the pair
    // frame twice, and the simhash candidate self-join is the
    // dominant cost — without this it would execute twice
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text",
        maxHamming = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one propagation run feeds both the sizes and the survivor count
    // (label propagation itself is iterative and therefore eager;
    // everything below it stays a lazy plan)
    val clusters = Dedup.dupClusters(pairs)
    val sizes = clusters.groupBy("root").agg(count(lit(1)).as("n_docs"))
    val nLosers = clusters.filter(col("root") =!= col("id"))
      .agg(count(lit(1)).as("n_losers"))
    val nAll = docs.agg(count(lit(1)).as("n_all"))
    sizes.crossJoin(nAll).crossJoin(nLosers)
      .select(col("root"), col("n_docs"),
        (col("n_all") - col("n_losers")).as("n_survivors_total"))
      .orderBy("root")
  }

  /** q53 — incremental dedup against a signature index: docs < 400 are
    * the signed corpus (index built once to scratch), docs >= 400 the
    * incoming batch; probe finds the cross-batch near-dup pairs
    * without re-shingling the corpus (except candidate docs in the
    * exact verify). Oracle = brute-force exact Jaccard restricted to
    * pairs straddling the split.
    */
  def q53DedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
    val idx = Tables.scratch(dir, "q53_idx")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx)
    Dedup.probeMinhashIndex(idx, corpus, batch, "doc_id", "text",
        threshold = 0.8, minBandMatches = 3)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** q54 — index APPEND path: the base index signs docs < 300; docs
    * [300, 400) arrive later and fold in via `appendToMinhashIndex`
    * (an idempotent batch-tagged partition overwrite); docs >= 400
    * then probe the combined index. Oracle identical to q53 — growing
    * the index by appends must be indistinguishable from building it
    * over the full corpus in one shot.
    */
  def q54DedupIndexAppend(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val idx = Tables.scratch(dir, "q54_idx")
    Dedup.buildMinhashIndex(docs.filter(col("doc_id") < 300),
      "doc_id", "text", idx)
    Dedup.appendToMinhashIndex(
      docs.filter(col("doc_id") >= 300 && col("doc_id") < 400),
      "doc_id", "text", idx, "day1")
    Dedup.probeMinhashIndex(idx, docs.filter(col("doc_id") < 400),
        docs.filter(col("doc_id") >= 400), "doc_id", "text",
        threshold = 0.8, minBandMatches = 3)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** q33 — exact cosine top-10: first five vectors query the rest. */
  def q33AnnTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.bruteForceTopK(
        emb.filter(col("vec_id") >= 5), emb.filter(col("vec_id") < 5),
        "vec_id", "vec_id", "embedding", k = 10)
      .select(col("qid"), col("rnk"), col("cid"), round(col("sim"), 4).as("sim"))
      .orderBy("qid", "rnk")
  }

  /** q34 — IVF top-10 with nprobe == nlist (exhaustive ⇒ must equal
    * brute force, which is what the oracle computes); the same plan
    * with nprobe < nlist is the 100 TB approximate path.
    */
  def q34AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.ivfTopK(
        emb.filter(col("vec_id") < 495), emb.filter(col("vec_id") >= 495),
        "vec_id", "vec_id", "embedding", k = 10, nlist = 8, nprobe = 8)
      .select(col("qid"), col("rnk"), col("cid"), round(col("sim"), 4).as("sim"))
      .orderBy("qid", "rnk")
  }

  /** q35 — embedding near-dup pairs ≥ 0.9 cosine via hyperplane LSH +
    * exact verify, on embeddings ∪ jittered copies (+0.05 per element)
    * of the first 50 vectors.
    */
  def q35CosineNearDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val corpus = emb.unionByName(
      emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 10000).as("vec_id"),
          transform(col("v"), x => x + 0.05).as("v")))
    Similarity.cosineNearDups(corpus, "vec_id", "v", threshold = 0.9)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
      .orderBy("id_a", "id_b")
  }

  /** q36 — per-document text-quality statistics. */
  def q36TextStats(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.stats(
        t(spark, dir, "documents").filter(col("doc_id") < 250),
        "doc_id", "text")
      .orderBy("doc_id")

  /** q37 — stopword-argmax language ID with per-language scores. */
  def q37LangId(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.languageId(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** q38 — normalized-fingerprint dup groups: case/punctuation
    * variants of the first 80 docs must collapse onto their originals.
    */
  def q38Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val corpus = docs.select("doc_id", "text").unionByName(
      docs.filter(col("doc_id") < 80)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(upper(col("text")), lit("  !!")).as("text")))
    TextAnalysis.fingerprintDupStats(corpus, "text")
  }

  /** q39 — multimodal binary plumbing: text payloads as binary
    * columns with extracted metadata, aggregated. The image-header
    * decode runs over every payload too: none of the text payloads is
    * a valid PNG/GIF/BMP/JPEG, so the fail-soft decoder must produce
    * exactly zero decoded rows (and, critically, zero task failures) —
    * the oracle pins that contract as a constant.
    */
  def q39MultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .withColumn("content", col("text").cast("binary"))
    val media = Multimodal.withMeta(docs, "doc_id", "content",
      "text/plain")
    val decoded = Multimodal.withImageMeta(docs, "doc_id", "content")
      .agg(count(col("image_format")).as("n_decoded"))
    media.agg(
        count(lit(1)).as("n_docs"),
        sum(col("meta.size_bytes")).as("total_bytes"),
        countDistinct(col("meta.sha")).as("n_distinct_sha"))
      .crossJoin(broadcast(decoded))
  }

  /** q41 — sliding-window document chunking (64-token chunks, 16-token
    * overlap) — the chunk fan-out that feeds tokenizers at scale.
    */
  def q41Chunking(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunk(
        t(spark, dir, "documents").filter(col("doc_id") < 50),
        "doc_id", "text", chunkTokens = 64, overlapTokens = 16)
      .orderBy("doc_id", "chunk_idx")

  /** q42 — windowed event aggregation through the streaming module's
    * batch path (the stream path is proven equivalent in
    * StreamingSpec); window bounds emitted as strings for a stable
    * hash.
    */
  def q42StreamWindow(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming
      .windowedCounts(t(spark, dir, "events"), "ts", "5 minutes")
      .select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"),
        date_format(col("window_end"), "yyyy-MM-dd HH:mm:ss")
          .as("window_end"),
        col("event_type"), col("n"), col("total"))
      .orderBy("window_start", "event_type")

  /** q46 — PII/URL scrubbing over a corpus with injected addresses
    * (constructed identically on both sides); the md5 of each
    * scrubbed text proves the transformation byte-identical.
    */
  def q46TextScrub(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").filter(col("doc_id") < 100)
    val corpus = docs.select(col("doc_id"),
      concat(col("text"),
        lit(" mail u"), col("doc_id").cast("string"),
        lit("@ex.com or https://h"), col("doc_id").cast("string"),
        lit(".ex/p end")).as("text"))
    corpus.select(
        col("doc_id"),
        regexp_count(col("text"), lit("https?://\\S+")).cast("long")
          .as("n_urls"),
        md5(TextAnalysis.scrub(col("text"))).as("scrubbed_md5"))
      .orderBy("doc_id")
  }

  /** q47 — deterministic hash sampling (30% keep-rate), stratum sizes
    * per language: the reproducible alternative to rand() sampling for
    * corpus curation.
    */
  def q47HashSample(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(TextAnalysis.hashSample(col("doc_id"), keep = 3, outOf = 10))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"),
           sum("n_chars").as("chars_sampled"))
      .orderBy("lang")

  /** q48 — int8 quantization error THROUGH the module (quantize →
    * dequantize → elementwise error), aggregated by label; the oracle
    * recomputes the same round(x/scale)·scale arithmetic exactly.
    * Per-element error via posexplode + element_at (codegen'd) — the
    * zip_with/array_max HOF form is CodegenFallback, the interpreted
    * trap this repo's bulk paths avoid.
    */
  def q48QuantizeError(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding")
    emb.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .join(q, "vec_id")
      .select(col("vec_id"), col("label"),
        abs(col("x").cast("double") -
          element_at(col("qvec"), col("pos") + 1).cast("double") *
            col("scale")).as("e"))
      .groupBy("vec_id", "label").agg(max("e").as("err"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
           round(avg("err"), 6).as("avg_max_err"),
           round(max("err"), 6).as("worst_err"))
      .orderBy("label")
  }

  /** q71 — persisted IVF index through its full lifecycle: build over
    * vec_id < 400, fold [400, 495) in via a tagged append, probe with
    * the last five vectors at nprobe == nlist. Exhaustive probing
    * must be indistinguishable from brute force over build ∪ append —
    * which is exactly what the oracle computes (q34's SQL); the
    * pruned (nprobe < nlist) configuration's cell-scan plan and
    * recall are spec-pinned.
    */
  def q71IvfIndexProbe(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val idx = Tables.scratch(dir, "q71_idx")
    Similarity.buildIvfIndex(emb.filter(col("vec_id") < 400),
      "vec_id", "embedding", idx, nlist = 8)
    Similarity.appendToIvfIndex(
      emb.filter(col("vec_id") >= 400 && col("vec_id") < 495),
      "vec_id", "embedding", idx, "day1")
    Similarity.probeIvfIndex(idx, emb.filter(col("vec_id") >= 495),
        "vec_id", "embedding", k = 10, nprobe = 8)
      .select(col("qid"), col("rnk"), col("cid"),
        round(col("sim"), 4).as("sim"))
      .orderBy("qid", "rnk")
  }

  /** q72 — exact BPE token counts under a FIXED merge list
    * (("e","r"), ("t","h"), ("th","e") — all frequent in the corpus,
    * the third merging a produced symbol). The oracle replays
    * segmentation in SQL: each merge rule becomes a
    * `replace(pair → placeholder char)`, and SQL replace's
    * left-to-right non-overlapping scan is exactly `applyMerge`'s;
    * uppercase placeholders cannot collide with lowercased text.
    * Final token count = string length after the chain.
    */
  def q72BpeTokenCount(spark: SparkSession, dir: String): DataFrame =
    graft.llm.Bpe.bpeTokenCount(t(spark, dir, "documents"),
        "doc_id", "text", Seq(("e", "r"), ("t", "h"), ("th", "e")))
      .select(col("id").as("doc_id"), col("n_bpe_tokens"))
      .orderBy("doc_id")

  /** q73 — persisted IVF-PQ probe at nprobe == nlist with shortlist ≥
    * |corpus|: every row reaches the exact re-rank, so the result is
    * bit-identical to brute force (the documented contract) and the
    * plain cosine top-k oracle applies even though the PQ codebooks
    * themselves aren't SQL-expressible — they only decide what gets
    * PRUNED, and here nothing is. The pruned configuration's recall
    * is spec-pinned (LlmSpec).
    */
  def q73IvfPqIndexProbe(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val idx = Tables.scratch(dir, "q73_idx")
    Similarity.buildIvfPqIndex(emb.filter(col("vec_id") < 495),
      "vec_id", "embedding", idx, nlist = 8, m = 8, ncodes = 16)
    Similarity.probeIvfPqIndex(idx, emb.filter(col("vec_id") >= 495),
        "vec_id", "embedding", k = 10, nprobe = 8, shortlist = 500)
      .select(col("qid"), col("rnk"), col("cid"),
        round(col("sim"), 4).as("sim"))
      .orderBy("qid", "rnk")
  }

  /** q74 — duplicated-LINE removal (boilerplate filter). The corpus
    * has no newlines, so line structure is synthesized DETERMINISTI-
    * CALLY on both sides: every ` the ` becomes a newline (plain
    * non-overlapping left-to-right replace in both engines), and the
    * first 100 docs are re-keyed copies — their lines are exact
    * duplicates and must vanish, plus whatever shorter segments
    * recur naturally across the random tail.
    */
  def q74RemoveDupLines(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val corpus = docs.select(col("doc_id"), col("text")).unionByName(
        docs.filter(col("doc_id") < 100)
          .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      .select(col("doc_id"),
        regexp_replace(col("text"), " the ", "\n").as("text"))
    Dedup.removeDuplicatedLines(corpus, "doc_id", "text",
        sep = "\n", minDocs = 2)
      .select(col("id").as("doc_id"), col("n_lines"), col("n_removed"),
        col("text_clean"))
      .orderBy("doc_id")
  }

  /** q75 — TF-IDF top-3 keywords per document (smoothed sklearn idf),
    * ranked by (score desc, term asc) — a total order, so the two-
    * phase rank is deterministic and the oracle's row_number replays
    * it exactly.
    */
  def q75TfidfTopTerms(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopTerms(t(spark, dir, "documents"),
        "doc_id", "text", k = 3)
      .select(col("id").as("doc_id"), col("term"), col("tf"), col("df"),
        round(col("score"), 6).as("score"), col("rk"))
      .orderBy("doc_id", "rk")

  /** q76 — source-affinity map: per-source embedding centroids,
    * pairwise cosine between all 190 source pairs. The float means
    * accumulate in double on both sides; rounding at 6 absorbs
    * summation-order ulps.
    */
  def q76SourceAffinity(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val docs = t(spark, dir, "documents").select(
      col("doc_id"), col("source"))
    val joined = emb.join(docs, emb("vec_id") === docs("doc_id"))
    Similarity.groupCentroidAffinity(joined, "source", "embedding")
      .select(col("group_a"), col("group_b"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy("group_a", "group_b")
  }

  /** q77 — SEMANTIC dedup end-to-end (SemDeDup): the q35 corpus
    * (embeddings ∪ +0.05-jittered copies of the first 50 vectors) must
    * collapse back to the originals — survivors are the min-id
    * representative of each transitively-closed cosine-≥-0.9 group.
    * The oracle replays the grouping with a brute-force pair set and a
    * recursive-CTE transitive closure (the q52 form).
    */
  def q77SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val corpus = emb.unionByName(
      emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 10000).as("vec_id"),
          transform(col("v"), x => x + 0.05).as("v")))
    Similarity.semanticDedup(corpus, "vec_id", "v", threshold = 0.9)
      .select("vec_id").orderBy("vec_id")
  }

  /** q79 — distributed k-means (k=8, 2 Lloyd rounds, cosine): the
    * per-iteration centroid ROUNDING makes the whole trajectory
    * engine- and partitioning-independent, so DuckDB replays the two
    * update rounds exactly with chained CTEs (init = 8 lowest-id
    * vectors, empty cells COALESCE to their previous centroid).
    */
  def q79Kmeans(spark: SparkSession, dir: String): DataFrame =
    Similarity.kmeansAssign(t(spark, dir, "embeddings"),
        "vec_id", "embedding", k = 8, iters = 2)
      .select(col("id").as("vec_id"), col("cluster"),
        round(col("sim"), 6).as("sim"))
      .orderBy("vec_id")

  /** q80 — prototype pruning (SSL-prototypes/D4): drop the most
    * cluster-prototypical 25% of every k-means cluster. Oracle =
    * the q79 chain + per-cluster rank + floor(n·0.25) cutoff.
    */
  def q80PrototypePrune(spark: SparkSession, dir: String): DataFrame =
    Similarity.prototypePrune(t(spark, dir, "embeddings"),
        "vec_id", "embedding", k = 8, iters = 2, pruneFraction = 0.25)
      .select(col("id").as("vec_id"), col("cluster"),
        round(col("sim"), 6).as("sim"), col("rk"))
      .orderBy("vec_id")

  /** q81 — PII redaction: the corpus carries no real PII, so the
    * query first plants a deterministic email + IPv4 + SSN per doc
    * (pure arithmetic on doc_id, replayed verbatim by the oracle),
    * then counts and redacts all three classes in one zero-shuffle
    * codegen'd projection.
    */
  def q81RedactPii(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val planted = t(spark, dir, "documents").select(d,
      concat(col("text"),
        lit(" contact u"), d.cast("string"),
        lit("@ex"), (d % 7).cast("string"), lit(".com or "),
        (d % 256).cast("string"), lit(".0.0."),
        (d % 200).cast("string"), lit(" ssn "),
        lpad((lit(100) + d % 900).cast("string"), 3, "0"), lit("-"),
        lpad((d % 100).cast("string"), 2, "0"), lit("-"),
        lpad((d % 10000).cast("string"), 4, "0")).as("text"))
    TextAnalysis.redactPii(planted, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** q82 — overlapping document chunking (25-token chunks, 5-token
    * overlap): context-window / retrieval prep, replayed in SQL as a
    * generate_series explode + list slice.
    */
  def q82ChunkDocs(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkDocuments(t(spark, dir, "documents"),
        "doc_id", "text", chunkTokens = 25, overlapTokens = 5)
      .orderBy("doc_id", "chunk_id")

  /** q83 — per-cluster embedding outliers: rows whose rounded
    * cosine-to-centroid z-score is below −1.5 within their k-means
    * cluster. Oracle = the q79 CTE chain + per-cluster avg/stddev.
    */
  def q83ClusterOutliers(spark: SparkSession, dir: String): DataFrame =
    Similarity.clusterOutliers(t(spark, dir, "embeddings"),
        "vec_id", "embedding", k = 8, iters = 2, zThreshold = 1.5)
      .select(col("id").as("vec_id"), col("cluster"),
        col("sim"), col("z"))
      .orderBy("vec_id")

  /** q84 — canonical text normalization: the ASCII corpus is planted
    * with decomposed Unicode (e+◌́, o+◌̈), a BEL control char, and a
    * double space, then NFC-composed and cleaned. Spark plants via
    * Scala literals, the oracle via chr() — both are the same
    * codepoints, and NFC must compose them identically.
    */
  def q84NormalizeText(spark: SparkSession, dir: String): DataFrame = {
    val planted = t(spark, dir, "documents").select(col("doc_id"),
      concat(col("text"),
        lit(" cafe\u0301  no\u0308el"), lit("\u0007"), lit(" end"))
        .as("text"))
    TextAnalysis.normalizeText(planted, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** q87 — chunk-level exact dedup (the chunked twin of document
    * dedup: identical 25-token chunks across the corpus collapse to
    * their lexicographically-first (doc_id, chunk_id) owner). One
    * groupBy on chunk_text with `min(struct(...))` — partial-aggregated
    * map-side, so duplicate mass never reaches a single window task.
    */
  def q87ChunkDedup(spark: SparkSession, dir: String): DataFrame = {
    val chunks = TextAnalysis.chunkDocuments(t(spark, dir, "documents"),
      "doc_id", "text", chunkTokens = 25, overlapTokens = 5)
    chunks.groupBy("chunk_text")
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("__k"),
           count(lit(1)).as("n_copies"))
      .select(col("__k.doc_id").as("doc_id"),
        col("__k.chunk_id").as("chunk_id"),
        col("n_copies"), col("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  /** q90 — vocabulary coverage / OOV rate against the corpus's own
    * top-500 tokens: the tokenizer-vocab sizing check and per-source
    * drift signal. One tokenization feeds both the vocab top-K and
    * the per-document rescan; vocab broadcast.
    */
  def q90VocabOov(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabCoverage(t(spark, dir, "documents"),
        "doc_id", "text", vocabSize = 500)
      .select(col("id").as("doc_id"), col("n_tokens"),
        col("n_oov"), col("oov_rate"))
      .orderBy("doc_id")

  /** q93 — bigram cross-entropy per document (q68's unigram scorer
    * one n-gram order up): codegen'd array-slice bigrams, two
    * frequency models, one tokenization.
    */
  def q93BigramLogprob(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLogProb(t(spark, dir, "documents"),
        "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_bigrams"),
        round(col("bits_per_bigram"), 6).as("bits_per_bigram"))
      .orderBy("doc_id")

  /** q97 — deterministic sign random projection 64 → 8 dims (long
    * form, one row per output coordinate): the md5-derived Achlioptas
    * matrix makes the projection replayable on any engine with md5.
    * Row-parallel kernel, zero shuffle.
    */
  def q97RandomProjection(spark: SparkSession, dir: String): DataFrame =
    Similarity.randomProjection(t(spark, dir, "embeddings"),
        "vec_id", "embedding", outDim = 8)
      .select(col("id").as("vec_id"), col("j"), col("proj"))
      .orderBy("vec_id", "j")

  /** q99 — per-source lexical health: tokens, types, type-token
    * ratio, top-token mass share. One (source, token) partial
    * aggregation, then a |sources|-sized rollup.
    */
  def q99LexicalStats(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.lexicalStats(t(spark, dir, "documents"),
        "source", "text")
      .select(col("grp").as("source"), col("n_tokens"), col("n_types"),
        col("type_token_ratio"), col("top_token"),
        col("top_token_share"))
      .orderBy("source")

  /** q103 — C4-style boilerplate line filtering on a deterministic
    * lined corpus (" table " → ".\n" plants line structure AND
    * terminal punctuation): ≥3 words, ends in [.!?] (+ optional
    * quote), no "window" marker. Zero joins before the per-document
    * regroup.
    */
  def q103LineFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"),
        regexp_replace(col("text"), " table ", ".\n").as("text"))
    TextAnalysis.filterBoilerplateLines(docs, "doc_id", "text",
        TextAnalysis.LineRules(minWords = 3,
          requireTerminalPunct = true, blacklist = Seq("window")))
      .select(col("id").as("doc_id"), col("n_lines"), col("n_kept"),
        col("text_clean"))
      .orderBy("doc_id")
  }

  /** q106 — n-gram containment join on a corpus with PLANTED
    * fragments (first 15 words of each doc < 100, re-keyed +20000):
    * each fragment is fully contained in its source (containment
    * 1.0), which symmetric Jaccard would score far below threshold.
    * The oracle replays ALL-PAIRS exact containment — the prefix
    * filter must lose nothing.
    */
  def q106Containment(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val fragments = docs.filter(col("doc_id") < 100)
      .select((col("doc_id") + 20000).as("doc_id"),
        concat_ws(" ",
          slice(split(trim(lower(col("text"))), "\\s+"), 1, 15))
          .as("text"))
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(fragments)
    // caller-unpersists contract on the returned frame (q55's shape)
    Dedup.ngramContainmentJoin(corpus, "doc_id", "text",
        n = 3, threshold = 0.8)
      .select(col("id_a"), col("id_b"),
        round(col("containment"), 6).as("containment"))
      .orderBy("id_a", "id_b")
  }

  /** q107 — compression-ratio quality signal. RETIRED from the
    * registry in round 11 (kept as a callable + LlmSpec property):
    * deflate output is a library property, not SQL-replayable, so its
    * registry row could only ever be a rows-only check — and q137 (the
    * exact-oracle twin on a fixed dictionary-coder cost model, whose
    * rank agreement with deflate LlmSpec pins) now carries the signal
    * through the hash-checked gate. Dropping the row moves the
    * CORRECTNESS file toward 100% checkable without losing coverage.
    * Zero-shuffle row-parallel kernel.
    */
  def q107Compression(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.compressionRatio(t(spark, dir, "documents"),
        "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_bytes"),
        col("n_compressed"), col("compression_ratio"))
      .orderBy("doc_id")

  /** q137 — q107's oracle-checked twin: the LZ78-class dictionary-
    * coder size proxy (first k-gram occurrence = k literal units,
    * repeat = 3-unit reference — the constant the Spark kernel, the
    * DuckDB oracle, and SURVEY.md all pin), exact relational algebra
    * on both
    * engines. Retires the last convention-based no-oracle row that
    * had no hash-checked twin (round-9 verdict task #8).
    */
  def q137LzProxy(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.lzProxyRatio(t(spark, dir, "documents"),
        "doc_id", "text", k = 8)
      .select(col("id").as("doc_id"), col("n_chars"), col("n_grams"),
        col("n_novel"), col("lz_cost"), col("lz_ratio"))
      .orderBy("doc_id")

  /** q138 — video container parse + uniform frame sampling, the
    * multimodal VIDEO twin of q39: per doc a minimal-but-valid AVI
    * payload is synthesized with header fields derived
    * arithmetically from doc_id
    * (`Multimodal.VideoHeaders.syntheticAvi`), parsed back
    * byte-level by `VideoHeaders`/`withVideoMeta`, and fanned out to
    * k=4 uniform frame samples (`sampleFrameIndices`). The DuckDB
    * oracle derives the same fields and sample arithmetic directly
    * from doc_id, so the hash check covers the whole synthesize →
    * RIFF bytes → parse → sample round trip: any misread header
    * offset or divergent sampling rule breaks the hash. (Frame PIXEL
    * decode stays out of THIS row by design — q141 oracle-checks the
    * real MJPEG pixel decode path.)
    */
  def q138VideoFrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vids = t(spark, dir, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id").cast("long").as("doc_id"))
      .as[Long]
      .map { id =>
        (id, Multimodal.VideoHeaders.syntheticAvi(
          usecPerFrame = (33333 + (id % 7) * 1000).toInt,
          totalFrames = (10 + id % 90).toInt,
          width = (320 + (id % 4) * 80).toInt,
          height = (240 + (id % 4) * 60).toInt))
      }.toDF("doc_id", "content")
    val meta = Multimodal.withVideoMeta(vids, "doc_id", "content")
    val frames = Multimodal.sampleFrameIndices(vids, "doc_id", "content",
      k = 4)
    meta.join(frames, "id")
      .select(col("id").as("doc_id"), col("video_format"),
        col("n_frames"), col("duration_ms"), col("width"), col("height"),
        col("frame_idx"), col("ts_ms"))
      .orderBy("doc_id", "frame_idx")
  }

  /** q141 — REAL video frame pixel decode, oracle-checked: per doc an
    * MJPEG-in-AVI payload is synthesized in-engine
    * (`VideoHeaders.syntheticMjpegAvi`) — uniform-gray baseline JPEG
    * frames whose gray level is exact arithmetic in (doc_id,
    * frame_idx) — then `sampleFrameFeatures` walks the RIFF 'movi'
    * list, extracts each sampled frame's JPEG bytes, and decodes the
    * PIXELS through ImageIO (`VideoFrameDecoder.jpegStats`). A
    * uniform gray frame survives the JPEG round trip exactly (DC-only
    * blocks, quantizer divides the DC step — measured across 0..255),
    * so the DuckDB oracle derives the decoded mean/max luma
    * arithmetically: any misread chunk offset, broken JPEG decode, or
    * divergent sampling rule breaks the hash. The q138 codec stub is
    * thereby REPLACED by a real decode for the MJPEG container
    * family; other codecs keep the documented fake seam.
    */
  def q141MjpegFrameStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vids = t(spark, dir, "documents")
      .filter(col("doc_id") < 60)
      .select(col("doc_id").cast("long").as("doc_id"))
      .as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          val n = (4 + id % 5).toInt
          (id, Multimodal.VideoHeaders.syntheticMjpegAvi(
            usecPerFrame = 40000,
            width = (48 + (id % 3) * 16).toInt,
            height = (32 + (id % 2) * 16).toInt,
            frameGrays =
              (0 until n).map(j => (((id * 37 + j * 11) % 51) * 5).toInt)))
        }
      }.toDF("doc_id", "content")
    Multimodal.sampleFrameFeatures(vids, "doc_id", "content", k = 3)
      .select(col("id").as("doc_id"), col("frame_idx"), col("ts_ms"),
        col("features").getItem(0).cast("int").as("frame_w"),
        col("features").getItem(1).cast("int").as("frame_h"),
        col("features").getItem(2).cast("int").as("mean_luma"),
        col("features").getItem(3).cast("int").as("max_luma"))
      .orderBy("doc_id", "frame_idx")
  }

  /** q139 — real image resize, oracle-checked: per doc a solid-color
    * PNG is encoded in-engine at dimensions derived from doc_id
    * (widths 128/256, heights 64/96/128 — the max edge is always a
    * power-of-two multiple of maxDim=64, so the aspect-preserving
    * scale is exact binary arithmetic with no rounding ambiguity
    * between engines), pushed through `Multimodal.resizeImages`
    * (ImageIO decode → bilinear scale → PNG re-encode), and the
    * POST-RESIZE dimensions are hash-checked against a DuckDB oracle
    * that derives them arithmetically. A broken decode, scale, or
    * re-encode (the parsed dims come from the re-encoded payload via
    * withImageMeta) breaks the hash.
    */
  def q139ResizeImages(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val imgs = t(spark, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id").cast("long").as("doc_id"))
      .as[Long]
      .map { id =>
        // JVM-global + idempotent: without it the gen stage still
        // pays ImageIO's default temp-FILE stream cache per encoded
        // image on executors that haven't run resizeImages yet
        javax.imageio.ImageIO.setUseCache(false)
        val w = (128 + (id % 2) * 128).toInt
        val h = (64 + (id % 3) * 32).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        try {
          g.setColor(new java.awt.Color(0x33, 0x66, 0x99))
          g.fillRect(0, 0, w, h)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, bos.toByteArray)
      }.toDF("doc_id", "content")
    val resized = Multimodal.resizeImages(imgs, "doc_id", "content",
      maxDim = 64)
    // parse the RE-ENCODED payload's header too: the oracle row then
    // witnesses decode -> scale -> encode -> decode, not just the
    // row-local arithmetic
    Multimodal.withImageMeta(
        resized.select(col("id"), col("content")), "id", "content")
      .select(col("id").as("doc_id"), col("image_format"),
        col("image_width"), col("image_height"))
      .orderBy("doc_id")
  }

  /** q140 — real audio PCM decode, oracle-checked: per doc a 16-bit
    * PCM WAV square wave at amplitude (doc_id % 7 + 1)·4096 (an exact
    * 1/8-step of full scale, so rms/peak are exact in float AND in
    * the oracle's decimal arithmetic) is byte-assembled in-engine,
    * decoded by `Multimodal.AudioDecoder`, and the derived
    * [channels, rate, frames, rms, peak, dc] are hash-checked against
    * the DuckDB oracle's direct arithmetic. A misread chunk offset,
    * sign-extension bug, or normalization error breaks the hash.
    */
  def q140AudioPcmStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val clips = t(spark, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id").cast("long").as("doc_id"))
      .as[Long]
      .map { id =>
        val amp = ((id % 7 + 1) * 4096).toInt // max 28672 < 2^15
        val out = new java.io.ByteArrayOutputStream()
        def w16(v: Int): Unit = {
          out.write(v & 0xff); out.write((v >> 8) & 0xff)
        }
        def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
        def fcc(s: String): Unit = s.foreach(c => out.write(c.toInt))
        val n = 400
        fcc("RIFF"); w32(36 + n * 2); fcc("WAVE")
        fcc("fmt "); w32(16); w16(1); w16(1); w32(8000)
        w32(16000); w16(2); w16(16)
        fcc("data"); w32(n * 2)
        (0 until n).foreach(i => w16(if (i % 2 == 0) amp else -amp))
        (id, out.toByteArray)
      }.toDF("doc_id", "content")
    Multimodal.extractAudioFeatures(clips, "doc_id", "content")
      .select(col("id").as("doc_id"),
        col("features").getItem(0).cast("int").as("channels"),
        col("features").getItem(1).cast("int").as("sample_rate"),
        col("features").getItem(2).cast("long").as("n_frames"),
        round(col("features").getItem(3).cast("double"), 6).as("rms"),
        round(col("features").getItem(4).cast("double"), 6).as("peak"),
        round(col("features").getItem(5).cast("double"), 6).as("dc"))
      .orderBy("doc_id")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_dedup_exact"    -> (q30DedupExact _),
    "q31_dedup_minhash"  -> (q31DedupMinhash _),
    "q32_dedup_simhash"  -> (q32DedupSimhash _),
    "q33_ann_topk"       -> (q33AnnTopk _),
    "q34_ann_ivf"        -> (q34AnnIvf _),
    "q35_cosine_neardup" -> (q35CosineNearDup _),
    "q36_text_stats"     -> (q36TextStats _),
    "q37_langid"         -> (q37LangId _),
    "q38_fingerprint"    -> (q38Fingerprint _),
    "q39_multimodal_meta"-> (q39MultimodalMeta _),
    "q41_chunking"       -> (q41Chunking _),
    "q42_stream_window"  -> (q42StreamWindow _),
    "q46_text_scrub"     -> (q46TextScrub _),
    "q47_hash_sample"    -> (q47HashSample _),
    "q48_quantize_error" -> (q48QuantizeError _),
    "q52_dedup_clusters" -> (q52DedupClusters _),
    "q53_dedup_incremental" -> (q53DedupIncremental _),
    "q54_dedup_index_append" -> (q54DedupIndexAppend _),
    "q55_dedup_jaccard"  -> (q55DedupJaccard _),
    "q56_repetition"     -> (q56RepetitionStats _),
    "q57_leakage_split"  -> (q57LeakageSafeSplit _),
    "q58_pack_sequences" -> (q58PackSequences _),
    "q59_contamination"  -> (q59Contamination _),
    "q60_stratified_sample" -> (q60StratifiedSample _),
    "q61_mixture_sample" -> (q61MixtureSample _),
    "q62_dup_gram_frac"  -> (q62DupGramFrac _),
    "q63_ann_pq_noracle" -> (q63AnnPq _),
    "q118_ann_pq_fixed"  -> (q118AnnPqFixed _),
    "q119_dsir_weights"  -> (q119DsirWeights _),
    "q120_dsir_sample"   -> (q120DsirSample _),
    "q121_temperature_mix" -> (q121TemperatureMix _),
    "q122_hard_negatives" -> (q122HardNegatives _),
    "q123_cdc_chunks"    -> (q123CdcChunks _),
    "q124_cdc_shift_dedup" -> (q124CdcShiftDedup _),
    "q125_lang_mix"      -> (q125LangMix _),
    "q126_gram_novelty"  -> (q126GramNovelty _),
    "q128_winnow"        -> (q128Winnow _),
    "q129_winnow_overlap" -> (q129WinnowOverlap _),
    "q130_winnow_dedup"  -> (q130WinnowDedup _),
    "q132_bpe_fertility" -> (q132BpeFertility _),
    "q133_html_extract"  -> (q133HtmlExtract _),
    "q134_data_card"     -> (q134DataCard _),
    "q135_data_card_diff" -> (q135DataCardDiff _),
    "q136_decontaminate_spans" -> (q136DecontaminateSpans _),
    "q137_lz_proxy"      -> (q137LzProxy _),
    "q138_video_frame_sample" -> (q138VideoFrameSample _),
    "q139_resize_images" -> (q139ResizeImages _),
    "q140_audio_pcm_stats" -> (q140AudioPcmStats _),
    "q141_mjpeg_frame_stats" -> (q141MjpegFrameStats _),
    "q142_dedup_minhash_oph" -> (q142DedupMinhashOph _),
    "q64_quality_filter" -> (q64QualityFilter _),
    "q65_remove_spans"   -> (q65RemoveSpans _),
    "q66_contamination_bloom" -> (q66ContaminationBloom _),
    "q67_curation_pipeline" -> (q67CurationPipeline _),
    "q68_unigram_logprob" -> (q68UnigramLogprob _),
    "q69_top_quality_per_group" -> (q69TopQualityPerGroup _),
    "q70_length_quantiles" -> (q70LengthQuantiles _),
    "q71_ivf_index_probe" -> (q71IvfIndexProbe _),
    "q72_bpe_token_count" -> (q72BpeTokenCount _),
    "q73_ivfpq_index_probe" -> (q73IvfPqIndexProbe _),
    "q74_remove_dup_lines" -> (q74RemoveDupLines _),
    "q75_tfidf_top_terms" -> (q75TfidfTopTerms _),
    "q76_source_affinity" -> (q76SourceAffinity _),
    "q77_semantic_dedup" -> (q77SemanticDedup _),
    "q79_kmeans"         -> (q79Kmeans _),
    "q80_prototype_prune" -> (q80PrototypePrune _),
    "q81_redact_pii"     -> (q81RedactPii _),
    "q82_chunk_docs"     -> (q82ChunkDocs _),
    "q83_cluster_outliers" -> (q83ClusterOutliers _),
    "q84_normalize_text" -> (q84NormalizeText _),
    "q87_chunk_dedup"    -> (q87ChunkDedup _),
    "q90_vocab_oov"      -> (q90VocabOov _),
    "q93_bigram_logprob" -> (q93BigramLogprob _),
    "q97_random_projection" -> (q97RandomProjection _),
    "q99_lexical_stats"  -> (q99LexicalStats _),
    "q103_line_filter"   -> (q103LineFilter _),
    "q106_containment"   -> (q106Containment _))

  val oracles: Map[String, String] = Map(
    "q30_dedup_exact" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 10000, text FROM documents WHERE doc_id < 100),
         g AS (SELECT md5(text) AS h, count(*) AS cnt FROM corpus GROUP BY 1)
         SELECT CAST(sum(cnt) AS BIGINT) AS n_total,
                count(*) AS n_unique,
                CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_dup_groups,
                CAST(sum(cnt) - count(*) AS BIGINT) AS n_removed
         FROM g""",
    // q142: same exact-Jaccard oracle as q31 — the OPH family must
    // reproduce the identical verified pair set (recall = 1 at these
    // parameters), not merely plausible signatures
    "q142_dedup_minhash_oph" ->
      """WITH pos AS (SELECT doc_id, text,
                unnest(generate_series(1, greatest(length(text) - 3, 1))) AS i
              FROM documents),
         sh AS (SELECT DISTINCT doc_id, substr(lower(text), i::INT, 4) AS s
                FROM pos),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
                   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
         SELECT id_a, id_b,
                round(ix * 1.0 / (sa.n + sb.n - ix), 6) AS jaccard
         FROM inter
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b
         WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.8""",
    "q31_dedup_minhash" ->
      """WITH pos AS (SELECT doc_id, text,
                unnest(generate_series(1, greatest(length(text) - 3, 1))) AS i
              FROM documents),
         sh AS (SELECT DISTINCT doc_id, substr(lower(text), i::INT, 4) AS s
                FROM pos),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
                   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
         SELECT id_a, id_b,
                round(ix * 1.0 / (sa.n + sb.n - ix), 6) AS jaccard
         FROM inter
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b
         WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.8
         ORDER BY id_a, id_b""",
    "q53_dedup_incremental" ->
      """WITH pos AS (SELECT doc_id, text,
                unnest(generate_series(1, greatest(length(text) - 3, 1))) AS i
              FROM documents),
         sh AS (SELECT DISTINCT doc_id, substr(lower(text), i::INT, 4) AS s
                FROM pos),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
                   FROM sh a JOIN sh b ON a.s = b.s
                   WHERE a.doc_id < 400 AND b.doc_id >= 400
                   GROUP BY 1, 2)
         SELECT id_a, id_b,
                round(ix * 1.0 / (sa.n + sb.n - ix), 6) AS jaccard
         FROM inter
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b
         WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.8
         ORDER BY id_a, id_b""",
    // identical to q53's oracle on purpose: the engine-side append
    // path must produce exactly what a one-shot full build produces
    "q54_dedup_index_append" ->
      """WITH pos AS (SELECT doc_id, text,
                unnest(generate_series(1, greatest(length(text) - 3, 1))) AS i
              FROM documents),
         sh AS (SELECT DISTINCT doc_id, substr(lower(text), i::INT, 4) AS s
                FROM pos),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
                   FROM sh a JOIN sh b ON a.s = b.s
                   WHERE a.doc_id < 400 AND b.doc_id >= 400
                   GROUP BY 1, 2)
         SELECT id_a, id_b,
                round(ix * 1.0 / (sa.n + sb.n - ix), 6) AS jaccard
         FROM inter
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b
         WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.8
         ORDER BY id_a, id_b""",
    "q55_dedup_jaccard" ->
      """WITH toks AS (SELECT doc_id,
                regexp_split_to_array(trim(lower(text)), '\s+') AS t
              FROM documents),
         pos AS (SELECT doc_id, t,
                unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i
              FROM toks),
         g AS (SELECT DISTINCT doc_id,
                 array_to_string(t[i:i+2], ' ') AS gram
               FROM pos),
         sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS ix
                   FROM g a JOIN g b
                     ON a.gram = b.gram AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
         SELECT id_a, id_b,
                round(ix * 1.0 / (sa.n + sb.n - ix), 6) AS jaccard
         FROM inter
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b
         WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.5
         ORDER BY id_a, id_b""",
    "q56_repetition" ->
      """WITH toksa AS (SELECT doc_id,
                regexp_split_to_array(trim(lower(text)), '\s+') AS t
              FROM documents WHERE doc_id < 250),
         base AS (SELECT doc_id, t, len(t)::BIGINT AS n_tokens FROM toksa),
         tok AS (SELECT doc_id, unnest(t) AS tok FROM toksa),
         tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
         ta AS (SELECT doc_id, count(*) AS n_distinct FROM tc GROUP BY 1),
         bg AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
                FROM (SELECT doc_id, t,
                        unnest(generate_series(1, len(t) - 1)) AS i
                      FROM toksa WHERE len(t) >= 2)),
         bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
         ba AS (SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_c,
                  sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_inst
                FROM bc GROUP BY 1)
         SELECT b.doc_id, b.n_tokens,
                round(ta.n_distinct * 1.0 / b.n_tokens, 6)
                  AS distinct_token_frac,
                round(coalesce(ba.top_c, 0) * 1.0
                      / greatest(coalesce(ba.n_bigrams, 0), 1), 6)
                  AS top_bigram_frac,
                round(coalesce(ba.dup_inst, 0) * 1.0
                      / greatest(coalesce(ba.n_bigrams, 0), 1), 6)
                  AS dup_bigram_frac
         FROM base b
         JOIN ta ON ta.doc_id = b.doc_id
         LEFT JOIN ba ON ba.doc_id = b.doc_id
         ORDER BY b.doc_id""",
    "q57_leakage_split" ->
      """WITH RECURSIVE pos AS (SELECT doc_id, text,
                unnest(generate_series(1, greatest(length(text) - 3, 1))) AS i
              FROM documents),
         sh AS (SELECT DISTINCT doc_id, substr(lower(text), i::INT, 4) AS s
                FROM pos),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
                   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         pairs AS (SELECT id_a, id_b FROM inter
                   JOIN sizes sa ON sa.doc_id = id_a
                   JOIN sizes sb ON sb.doc_id = id_b
                   WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.8),
         edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach AS (SELECT a, b FROM edges
                   UNION
                   SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         roots AS (SELECT a AS id, least(a, min(b)) AS root
                   FROM reach GROUP BY a),
         allr AS (SELECT d.doc_id, coalesce(r.root, d.doc_id) AS root,
                         d.n_chars
                  FROM documents d LEFT JOIN roots r ON r.id = d.doc_id)
         SELECT CASE WHEN ('0x' || substr(md5(CAST(root AS VARCHAR)), 1, 15))
                            ::BIGINT % 10 < 2
                     THEN 'eval' ELSE 'train' END AS split,
                count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS chars_total
         FROM allr GROUP BY 1 ORDER BY 1""",
    "q58_pack_sequences" ->
      """WITH RECURSIVE d AS (SELECT doc_id,
                CAST(ceil(length(text) / 4.0) AS BIGINT) AS tok,
                CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                     ::BIGINT % 4 AS INT) AS shard
              FROM documents),
         s AS (SELECT doc_id, tok, shard,
                 row_number() OVER (PARTITION BY shard ORDER BY doc_id)
                   AS rn
               FROM d),
         st AS (
           SELECT shard, rn, doc_id, tok,
                  CAST(0 AS BIGINT) AS bin, tok AS used
           FROM s WHERE rn = 1
           UNION ALL
           SELECT s.shard, s.rn, s.doc_id, s.tok,
                  CASE WHEN st.used + s.tok > 256 THEN st.bin + 1
                       ELSE st.bin END,
                  CASE WHEN st.used + s.tok > 256 THEN s.tok
                       ELSE st.used + s.tok END
           FROM st JOIN s ON s.shard = st.shard AND s.rn = st.rn + 1)
         SELECT shard, bin, count(*) AS n_docs,
                CAST(sum(tok) AS BIGINT) AS tokens_used
         FROM st GROUP BY 1, 2 ORDER BY 1, 2""",
    "q59_contamination" ->
      """WITH toksa AS (SELECT doc_id,
                regexp_split_to_array(trim(lower(text)), '\s+') AS t
              FROM documents),
         g AS (SELECT DISTINCT doc_id,
                 array_to_string(t[i:i+7], ' ') AS gram
               FROM (SELECT doc_id, t,
                       unnest(generate_series(1, greatest(len(t) - 7, 1)))
                         AS i
                     FROM toksa)),
         c AS (SELECT doc_id, gram FROM g WHERE doc_id < 450),
         e AS (SELECT doc_id AS eid, gram FROM g WHERE doc_id >= 450),
         sizes AS (SELECT doc_id, count(*) AS n_grams FROM c GROUP BY 1),
         hits AS (SELECT c.doc_id,
                    count(DISTINCT c.gram) AS n_shared_grams,
                    count(DISTINCT e.eid) AS n_eval_docs
                  FROM c JOIN e ON c.gram = e.gram GROUP BY 1)
         SELECT h.doc_id, h.n_shared_grams, h.n_eval_docs,
                round(h.n_shared_grams * 1.0 / s.n_grams, 6)
                  AS contamination_frac
         FROM hits h JOIN sizes s ON s.doc_id = h.doc_id
         ORDER BY h.doc_id""",
    "q60_stratified_sample" ->
      """WITH rk AS (SELECT doc_id, lang, source,
                row_number() OVER (PARTITION BY lang, source
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
              FROM documents)
         SELECT lang, source, doc_id FROM rk WHERE rk <= 5
         ORDER BY lang, source, doc_id""",
    "q61_mixture_sample" ->
      """WITH w AS (SELECT * FROM (VALUES
             ('src0', 1.0), ('src1', 1.0), ('src2', 1.0), ('src3', 1.0),
             ('src4', 1.0), ('src5', 1.0), ('src6', 1.0), ('src7', 1.0),
             ('src8', 1.0), ('src9', 1.0), ('src10', 2.0), ('src11', 2.0),
             ('src12', 2.0), ('src13', 2.0), ('src14', 2.0))
             AS w(source, wt)),
         tot AS (SELECT sum(wt) AS ws FROM w),
         cum AS (SELECT d.source, d.n_chars,
                   sum(d.n_chars) OVER (PARTITION BY d.source
                     ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS c,
                   CAST(floor(60000 * w.wt / t.ws) AS BIGINT) AS budget
                 FROM documents d JOIN w USING (source) CROSS JOIN tot t)
         SELECT source, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS chars_kept
         FROM cum WHERE c <= budget
         GROUP BY source ORDER BY source""",
    // q137: q107's engine-replayable twin — the fixed dictionary-coder
    // cost model (first k-gram occurrence = k literal units, repeat =
    // 3-unit reference) is plain count / count-distinct over the
    // char-8-gram explode, so DuckDB replays it exactly
    "q137_lz_proxy" ->
      """WITH g AS (SELECT doc_id, length(text) AS n_chars,
                substr(text, i, 8) AS g
              FROM (SELECT doc_id, text,
                      unnest(generate_series(1, length(text) - 7)) AS i
                    FROM documents WHERE length(text) >= 8))
         SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                count(*) AS n_grams, count(DISTINCT g) AS n_novel,
                CAST(count(DISTINCT g)*8
                     + (count(*) - count(DISTINCT g))*3 AS BIGINT)
                  AS lz_cost,
                round((count(DISTINCT g)*8
                       + (count(*) - count(DISTINCT g))*3) * 1.0
                      / (count(*) * 8), 6) AS lz_ratio
         FROM g GROUP BY doc_id, n_chars ORDER BY doc_id""",
    // q138: the oracle derives the AVI header fields and the uniform
    // sample arithmetic straight from doc_id — the Spark side goes the
    // long way around (synthesize RIFF bytes, parse them back, sample
    // relationally), so the hash check pins the byte-level parser
    "q138_video_frame_sample" ->
      """WITH p AS (SELECT doc_id,
                33333 + (doc_id % 7) * 1000 AS usec,
                10 + doc_id % 90 AS frames,
                320 + (doc_id % 4) * 80 AS width,
                240 + (doc_id % 4) * 60 AS height
              FROM documents WHERE doc_id < 200),
         s AS (SELECT p.*, unnest(generate_series(0, 3)) AS j FROM p)
         SELECT DISTINCT doc_id, 'avi' AS video_format,
                CAST(frames AS BIGINT) AS n_frames,
                CAST(floor(frames * usec / 1000.0) AS BIGINT)
                  AS duration_ms,
                CAST(width AS INTEGER) AS width,
                CAST(height AS INTEGER) AS height,
                CAST(floor(j * frames / 4.0) AS BIGINT) AS frame_idx,
                CAST(floor(floor(j * frames / 4.0) * usec / 1000.0)
                     AS BIGINT) AS ts_ms
         FROM s ORDER BY doc_id, frame_idx""",
    // q139: source dims are 128/256 x 64/96/128 with maxDim 64 — the
    // max edge is always a power-of-two multiple of 64, so the
    // aspect-preserving scale is exact on both engines; the Spark side
    // witnesses the full decode -> bilinear scale -> PNG re-encode ->
    // header re-parse pipeline
    "q139_resize_images" ->
      """WITH p AS (SELECT doc_id,
                128 + (doc_id % 2) * 128 AS w,
                64 + (doc_id % 3) * 32 AS h
              FROM documents WHERE doc_id < 100)
         SELECT doc_id, 'png' AS image_format,
                CAST(w * 64 / greatest(w, h) AS INTEGER) AS image_width,
                CAST(h * 64 / greatest(w, h) AS INTEGER) AS image_height
         FROM p ORDER BY doc_id""",
    // q140: square wave at amplitude (doc_id%7+1)*4096 = an exact
    // (a %8 step hit 32768, which overflows int16 to -32768 and reads
    // back as an all--1.0 clip - caught by the oracle gate)
    // 1/8-step of int16 full scale, so rms = peak = amp/32768 exactly
    // in float and in decimal; dc of the +/- pairs is exactly 0
    "q140_audio_pcm_stats" ->
      """SELECT doc_id,
                1 AS channels, 8000 AS sample_rate,
                CAST(400 AS BIGINT) AS n_frames,
                round((doc_id % 7 + 1) * 4096 / 32768.0, 6) AS rms,
                round((doc_id % 7 + 1) * 4096 / 32768.0, 6) AS peak,
                CAST(0 AS DOUBLE) AS dc
         FROM documents WHERE doc_id < 100 ORDER BY doc_id""",
    // q141: uniform-gray MJPEG frames round-trip JPEG exactly (DC-only
    // blocks; measured across 0..255), so the oracle derives the
    // DECODED pixel stats arithmetically from (doc_id, frame_idx) —
    // the hash pins movi chunk walking + real ImageIO JPEG decode
    "q141_mjpeg_frame_stats" ->
      """WITH p AS (SELECT doc_id, 4 + doc_id % 5 AS n,
                48 + (doc_id % 3) * 16 AS w,
                32 + (doc_id % 2) * 16 AS h
              FROM documents WHERE doc_id < 60),
         s AS (SELECT p.*, unnest(generate_series(0, 2)) AS j FROM p),
         f AS (SELECT DISTINCT doc_id, n, w, h,
                CAST(floor(j * n / 3.0) AS BIGINT) AS frame_idx FROM s)
         SELECT doc_id, frame_idx,
                CAST(floor(frame_idx * 40000 / 1000.0) AS BIGINT) AS ts_ms,
                CAST(w AS INTEGER) AS frame_w,
                CAST(h AS INTEGER) AS frame_h,
                CAST(((doc_id * 37 + frame_idx * 11) % 51) * 5
                     AS INTEGER) AS mean_luma,
                CAST(((doc_id * 37 + frame_idx * 11) % 51) * 5
                     AS INTEGER) AS max_luma
         FROM f ORDER BY doc_id, frame_idx""",
    "q62_dup_gram_frac" ->
      """WITH toksa AS (SELECT doc_id,
                regexp_split_to_array(trim(lower(text)), '\s+') AS t
              FROM documents),
         g AS (SELECT DISTINCT doc_id,
                 array_to_string(t[i:i+4], ' ') AS gram
               FROM (SELECT doc_id, t,
                       unnest(generate_series(1, greatest(len(t) - 4, 1)))
                         AS i
                     FROM toksa)),
         freq AS (SELECT gram, count(*) AS nd FROM g GROUP BY 1),
         per AS (SELECT doc_id, count(*) AS n_grams,
                   sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS n_dup
                 FROM g JOIN freq USING (gram) GROUP BY 1)
         SELECT doc_id, n_grams,
                CAST(n_dup AS BIGINT) AS n_dup_grams,
                round(n_dup * 1.0 / n_grams, 6) AS dup_gram_frac
         FROM per ORDER BY doc_id""",
    // q64: the same \S+-run counting / length arithmetic as the engine,
    // via regexp_extract_all + list_filter (DuckDB's RE2 has no
    // lookarounds, so per-token predicates filter the split array
    // instead — same counts by construction)
    "q64_quality_filter" ->
      """WITH d AS (SELECT doc_id, trim(lower(text)) AS t FROM documents),
         m AS (SELECT doc_id,
                 len(regexp_extract_all(t, '\S+')) AS n_toks,
                 length(regexp_replace(t, '\s+', '', 'g')) AS non_ws,
                 len(regexp_extract_all(t, '#|…|\.\.\.')) AS n_sym,
                 len(list_filter(regexp_split_to_array(t, '\s+'),
                     x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
                 len(list_filter(regexp_split_to_array(t, '\s+'),
                     x -> x IN ('the','a','of','and','to','in','is')))
                   AS n_stop
               FROM d),
         f AS (SELECT doc_id, n_toks,
                 CASE WHEN n_toks BETWEEN 30 AND 90
                      THEN 1 ELSE 0 END AS ok_n,
                 CASE WHEN n_toks > 0
                       AND non_ws * 1.0 / n_toks BETWEEN 3.0 AND 4.5
                      THEN 1 ELSE 0 END AS ok_len,
                 CASE WHEN n_toks > 0 AND n_sym * 1.0 / n_toks <= 0.1
                      THEN 1 ELSE 0 END AS ok_sym,
                 CASE WHEN n_toks > 0 AND n_alpha * 1.0 / n_toks >= 0.8
                      THEN 1 ELSE 0 END AS ok_alpha,
                 CASE WHEN n_stop >= 1 THEN 1 ELSE 0 END AS ok_stop
               FROM m)
         SELECT doc_id, CAST(n_toks AS BIGINT) AS n_tokens,
                ok_n AS ok_n_tokens, ok_len AS ok_token_len,
                ok_sym AS ok_symbol, ok_alpha AS ok_alpha,
                ok_stop AS ok_stopwords,
                ok_n * ok_len * ok_sym * ok_alpha * ok_stop AS keep
         FROM f ORDER BY doc_id""",
    // q65: duplicated-span removal replayed literally — positioned
    // grams, doc-frequency filter, covered positions, anti-join,
    // order-preserving string_agg
    "q65_remove_spans" ->
      """WITH toksa AS (SELECT doc_id,
                regexp_split_to_array(trim(lower(text)), '\s+') AS t
              FROM documents),
         tk AS (SELECT doc_id, i AS p, t[i] AS tok
                FROM (SELECT doc_id, t,
                        unnest(generate_series(1, len(t))) AS i
                      FROM toksa)),
         g AS (SELECT doc_id, i, array_to_string(t[i:i+4], ' ') AS gram
               FROM (SELECT doc_id, t,
                       unnest(generate_series(1, len(t) - 4)) AS i
                     FROM toksa WHERE len(t) >= 5)),
         freq AS (SELECT gram FROM (SELECT gram,
                    count(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
                  WHERE nd >= 2),
         cov AS (SELECT DISTINCT g.doc_id, g.i + k.k AS p
                 FROM g JOIN freq USING (gram)
                 CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS k)
                   AS k),
         kept AS (SELECT tk.doc_id, tk.p, tk.tok FROM tk
                  ANTI JOIN cov
                    ON tk.doc_id = cov.doc_id AND tk.p = cov.p),
         agg AS (SELECT doc_id, count(*) AS n_kept,
                   string_agg(tok, ' ' ORDER BY p) AS text_clean
                 FROM kept GROUP BY 1)
         SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
                CAST(len(t.t) - coalesce(a.n_kept, 0) AS BIGINT)
                  AS n_removed,
                coalesce(a.text_clean, '') AS text_clean
         FROM toksa t LEFT JOIN agg a USING (doc_id)
         ORDER BY t.doc_id""",
    // q66: IDENTICAL SQL to q59 — the Bloom prefilter must not change
    // a single row
    "q66_contamination_bloom" ->
      """WITH toksa AS (SELECT doc_id,
                regexp_split_to_array(trim(lower(text)), '\s+') AS t
              FROM documents),
         g AS (SELECT DISTINCT doc_id,
                 array_to_string(t[i:i+7], ' ') AS gram
               FROM (SELECT doc_id, t,
                       unnest(generate_series(1, greatest(len(t) - 7, 1)))
                         AS i
                     FROM toksa)),
         c AS (SELECT doc_id, gram FROM g WHERE doc_id < 450),
         e AS (SELECT doc_id AS eid, gram FROM g WHERE doc_id >= 450),
         sizes AS (SELECT doc_id, count(*) AS n_grams FROM c GROUP BY 1),
         hits AS (SELECT c.doc_id,
                    count(DISTINCT c.gram) AS n_shared_grams,
                    count(DISTINCT e.eid) AS n_eval_docs
                  FROM c JOIN e ON c.gram = e.gram GROUP BY 1)
         SELECT h.doc_id, h.n_shared_grams, h.n_eval_docs,
                round(h.n_shared_grams * 1.0 / s.n_grams, 6)
                  AS contamination_frac
         FROM hits h JOIN sizes s ON s.doc_id = h.doc_id
         ORDER BY h.doc_id""",
    // q67: all four pipeline stages replayed in one statement —
    // quality rules (q64 form), exact Jaccard pairs (q55 form),
    // transitive-closure dedup (q52 form), greedy packing (q58 form)
    "q67_curation_pipeline" ->
      """WITH RECURSIVE
         d AS (SELECT doc_id, trim(lower(text)) AS t, text
               FROM documents),
         m AS (SELECT doc_id,
                 len(regexp_extract_all(t, '\S+')) AS n_toks,
                 length(regexp_replace(t, '\s+', '', 'g')) AS non_ws,
                 len(regexp_extract_all(t, '#|…|\.\.\.')) AS n_sym,
                 len(list_filter(regexp_split_to_array(t, '\s+'),
                     x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
                 len(list_filter(regexp_split_to_array(t, '\s+'),
                     x -> x IN ('the','a','of','and','to','in','is')))
                   AS n_stop,
                 CAST(ceil(length(text) / 4.0) AS BIGINT) AS tok
               FROM d),
         q AS (SELECT doc_id, tok FROM m
               WHERE n_toks BETWEEN 30 AND 90
                 AND n_toks > 0
                 AND non_ws * 1.0 / n_toks BETWEEN 3.0 AND 4.5
                 AND n_sym * 1.0 / n_toks <= 0.1
                 AND n_alpha * 1.0 / n_toks >= 0.8
                 AND n_stop >= 1),
         toksq AS (SELECT d.doc_id, regexp_split_to_array(d.t, '\s+') AS t
                   FROM d JOIN q USING (doc_id)),
         g AS (SELECT DISTINCT doc_id,
                 array_to_string(t[i:i+2], ' ') AS gram
               FROM (SELECT doc_id, t,
                       unnest(generate_series(1, greatest(len(t) - 2, 1)))
                         AS i
                     FROM toksq)),
         sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS ix
                   FROM g a JOIN g b
                     ON a.gram = b.gram AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         pairs AS (SELECT id_a, id_b FROM inter
                   JOIN sizes sa ON sa.doc_id = id_a
                   JOIN sizes sb ON sb.doc_id = id_b
                   WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.5),
         edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach AS (SELECT a, b FROM edges
                   UNION
                   SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         roots AS (SELECT a AS id, least(a, min(b)) AS root
                   FROM reach GROUP BY a),
         ded AS (SELECT q.doc_id, q.tok FROM q
                 WHERE q.doc_id NOT IN
                   (SELECT id FROM roots WHERE root <> id)),
         s AS (SELECT doc_id, tok,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                      ::BIGINT % 4 AS INT) AS shard
               FROM ded),
         sr AS (SELECT doc_id, tok, shard,
                  row_number() OVER (PARTITION BY shard ORDER BY doc_id)
                    AS rn
                FROM s),
         st AS (SELECT shard, rn, tok, CAST(0 AS BIGINT) AS bin,
                  tok AS used
                FROM sr WHERE rn = 1
                UNION ALL
                SELECT sr.shard, sr.rn, sr.tok,
                       CASE WHEN st.used + sr.tok > 256 THEN st.bin + 1
                            ELSE st.bin END,
                       CASE WHEN st.used + sr.tok > 256 THEN sr.tok
                            ELSE st.used + sr.tok END
                FROM st JOIN sr ON sr.shard = st.shard AND sr.rn = st.rn + 1)
         SELECT stage, n_units, n_tokens FROM (
           SELECT '0_raw' AS stage, count(*) AS n_units,
                  CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT))
                    AS BIGINT) AS n_tokens
           FROM documents
           UNION ALL
           SELECT '1_quality', count(*), CAST(sum(tok) AS BIGINT) FROM q
           UNION ALL
           SELECT '2_dedup', count(*), CAST(sum(tok) AS BIGINT) FROM ded
           UNION ALL
           SELECT '3_packed',
                  (SELECT count(*)
                   FROM (SELECT DISTINCT shard, bin FROM st)),
                  CAST((SELECT sum(tok) FROM st) AS BIGINT))
         ORDER BY stage""",
    // q68: the unigram "model" is a frequency table — replayed exactly;
    // avg of logs is rounded on both sides (accumulation-order ulps)
    "q68_unigram_logprob" ->
      """WITH toks AS (SELECT doc_id,
                unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                  AS tok
              FROM documents),
         freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
         tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n,
                   CAST(count(*) AS DOUBLE) AS v
                 FROM freq),
         sc AS (SELECT t.doc_id, count(*) AS n_tokens,
                  avg(-log2((f.c + 0.5) / (tt.n + 0.5 * tt.v))) AS bits
                FROM toks t JOIN freq f USING (tok) CROSS JOIN tot tt
                GROUP BY 1)
         SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                round(bits, 6) AS bits_per_token
         FROM sc ORDER BY doc_id""",
    // q69: q36's quality-score formula, ranked per (lang, source) with
    // a total order (rounded score desc, doc_id asc)
    "q69_top_quality_per_group" ->
      """WITH t AS (SELECT doc_id, lang, source,
                string_split_regex(lower(text), '\s+') AS toks
              FROM documents),
         sc AS (SELECT doc_id, lang, source,
                  round(least(len(toks) / 100.0, 1.0) *
                    (len(list_distinct(toks)) * 1.0 / len(toks)), 6)
                    AS quality_score
                FROM t),
         rk AS (SELECT *, CAST(row_number() OVER (
                  PARTITION BY lang, source
                  ORDER BY quality_score DESC, doc_id) AS BIGINT) AS rk
                FROM sc)
         SELECT lang, source, rk, doc_id, quality_score
         FROM rk WHERE rk <= 3
         ORDER BY lang, source, rk""",
    // q70: quantile_cont == Spark's interpolated percentile by
    // definition; rounded on both sides
    "q70_length_quantiles" ->
      """SELECT source, count(*) AS n_docs,
                round(quantile_cont(n_chars, 0.5), 6) AS p50,
                round(quantile_cont(n_chars, 0.9), 6) AS p90,
                round(quantile_cont(n_chars, 0.99), 6) AS p99
         FROM documents GROUP BY source ORDER BY source""",
    "q52_dedup_clusters" ->
      """WITH RECURSIVE toks AS (SELECT doc_id,
                unnest(string_split_regex(lower(text), '\s+')) AS tok
              FROM documents),
         h AS (SELECT doc_id,
                 ('0x' || substr(md5(tok), 1, 15))::BIGINT AS th
               FROM toks),
         bits AS (SELECT doc_id, b,
                 CASE WHEN 2 * count(*) FILTER (((th >> b) & 1) = 1)
                           >= count(*)
                      THEN (1::BIGINT << b) ELSE 0 END AS bv
                 FROM h CROSS JOIN
                      (SELECT unnest(generate_series(0, 59)) AS b)
                 GROUP BY doc_id, b),
         sig AS (SELECT doc_id, CAST(sum(bv) AS BIGINT) AS s
                 FROM bits GROUP BY 1),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                   FROM sig a JOIN sig b ON a.doc_id < b.doc_id
                   WHERE bit_count(xor(a.s, b.s)) <= 3),
         edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach AS (SELECT a, b FROM edges
                   UNION
                   SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         roots AS (SELECT a AS id, least(a, min(b)) AS root
                   FROM reach GROUP BY a)
         SELECT root, count(*) AS n_docs,
                (SELECT count(*) FROM documents)
                  - (SELECT count(*) FROM roots WHERE root <> id)
                  AS n_survivors_total
         FROM roots GROUP BY root ORDER BY root""",
    "q32_dedup_simhash" ->
      """WITH toks AS (SELECT doc_id,
                unnest(string_split_regex(lower(text), '\s+')) AS tok
              FROM documents),
         h AS (SELECT doc_id,
                 ('0x' || substr(md5(tok), 1, 15))::BIGINT AS th
               FROM toks),
         bits AS (SELECT doc_id, b,
                 CASE WHEN 2 * count(*) FILTER (((th >> b) & 1) = 1)
                           >= count(*)
                      THEN (1::BIGINT << b) ELSE 0 END AS bv
                 FROM h CROSS JOIN
                      (SELECT unnest(generate_series(0, 59)) AS b)
                 GROUP BY doc_id, b),
         sig AS (SELECT doc_id, CAST(sum(bv) AS BIGINT) AS s
                 FROM bits GROUP BY 1)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
         FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.s, b.s)) <= 3
         ORDER BY id_a, id_b""",
    "q33_ann_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
                    FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
               FROM embeddings WHERE vec_id >= 5),
         s AS (SELECT qid, cid, list_cosine_similarity(qe, ce) AS sim
               FROM q CROSS JOIN c),
         r AS (SELECT qid, cid, sim,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY sim DESC, cid ASC) AS rnk
               FROM s)
         SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid, round(sim, 4) AS sim
         FROM r WHERE rnk <= 10 ORDER BY qid, rnk""",
    "q118_ann_pq_fixed" ->
      """WITH raw AS (SELECT vec_id AS id, embedding::DOUBLE[] AS x
                      FROM embeddings),
         nn AS (SELECT id, x,
                       sqrt(list_sum(list_transform(x, v -> v * v))) AS nrm
                FROM raw),
         e AS (SELECT id,
                      CASE WHEN nrm > 0
                           THEN list_transform(x, v -> v / nrm)
                           ELSE x END AS v
               FROM nn),
         c AS (SELECT * FROM e WHERE id >= 5),
         q AS (SELECT * FROM e WHERE id < 5),
         -- codebooks with kmeansIters=0: the 16 lowest-id normalized
         -- corpus vectors, sliced into 8 subspaces of 8 dims
         cb AS (SELECT s.sub, b.code, p.pos,
                       b.v[s.sub * 8 + p.pos + 1] AS cen
                FROM (SELECT row_number() OVER (ORDER BY id) - 1 AS code, v
                      FROM (SELECT id, v FROM c ORDER BY id LIMIT 16)) b
                CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS sub) s
                CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS pos) p),
         -- nearest-code encoding: argmin L2 per (corpus id, subspace),
         -- ties to the lowest code
         enc AS (SELECT id, sub, code FROM (
                   SELECT id, sub, code,
                          row_number() OVER (PARTITION BY id, sub
                            ORDER BY d ASC, code ASC) AS rn
                   FROM (SELECT c.id, cb.sub, cb.code,
                                sum(pow(c.v[cb.sub * 8 + cb.pos + 1]
                                        - cb.cen, 2)) AS d
                         FROM c CROSS JOIN cb
                         GROUP BY c.id, cb.sub, cb.code))
                 WHERE rn = 1),
         -- per-query ADC tables: <query slice, codeword> per (sub, code)
         adc AS (SELECT q.id AS qid, cb.sub, cb.code,
                        sum(q.v[cb.sub * 8 + cb.pos + 1] * cb.cen) AS t
                 FROM q CROSS JOIN cb
                 GROUP BY 1, 2, 3),
         sims AS (SELECT adc.qid, enc.id AS cid, sum(adc.t) AS sim
                  FROM enc JOIN adc ON adc.sub = enc.sub
                                   AND adc.code = enc.code
                  GROUP BY 1, 2),
         sl AS (SELECT qid, cid FROM (
                  SELECT qid, cid,
                         row_number() OVER (PARTITION BY qid
                           ORDER BY sim DESC, cid ASC) AS rn
                  FROM sims WHERE NOT isnan(sim))
                WHERE rn <= 50),
         rr AS (SELECT sl.qid, sl.cid,
                       list_cosine_similarity(qr.x, cr.x) AS sim
                FROM sl
                JOIN raw qr ON qr.id = sl.qid
                JOIN raw cr ON cr.id = sl.cid)
         SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid,
                round(sim, 4) AS sim
         FROM (SELECT qid, cid, sim,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY sim DESC, cid ASC) AS rnk
               FROM rr WHERE NOT isnan(sim))
         WHERE rnk <= 10 ORDER BY qid, rnk""",
    // q119/q120: hashed uni+bigram DSIR — the gram builder mirrors
    // q62's unnest(generate_series) shape; buckets use the q47 md5
    // convention; smoothing add-1 over B=1000
    "q119_dsir_weights" ->
      """WITH toks AS (SELECT doc_id, lang,
                list_filter(
                  regexp_split_to_array(trim(lower(text)), '\s+'),
                  w -> length(w) > 0) AS t
              FROM documents),
         g AS (SELECT doc_id, lang, unnest(t) AS gram FROM toks
               UNION ALL
               SELECT doc_id, lang, t[i] || ' ' || t[i+1] AS gram
               FROM (SELECT doc_id, lang, t,
                       unnest(generate_series(1, len(t) - 1)) AS i
                     FROM toks WHERE len(t) >= 2)),
         bk AS (SELECT doc_id, lang,
                  ('0x' || substr(md5(gram), 1, 15))::BIGINT % 1000 AS b
                FROM g),
         rawc AS (SELECT b, count(*) AS cr FROM bk GROUP BY 1),
         tgtc AS (SELECT b, count(*) AS ct FROM bk
                  WHERE lang = 'en' GROUP BY 1),
         nt AS (SELECT count(*) AS n FROM bk WHERE lang = 'en'),
         nr AS (SELECT count(*) AS n FROM bk),
         model AS (SELECT rawc.b, cr, coalesce(ct, 0) AS ct
                   FROM rawc LEFT JOIN tgtc USING (b)),
         per AS (SELECT doc_id, b, count(*) AS c FROM bk GROUP BY 1, 2),
         sc AS (SELECT doc_id, sum(c) AS n_grams,
                  sum(c * (ln((ct + 1.0) / (nt.n + 1000.0))
                         - ln((cr + 1.0) / (nr.n + 1000.0)))) AS lw
                FROM per JOIN model USING (b)
                CROSS JOIN nt CROSS JOIN nr
                GROUP BY 1)
         SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
                round(lw, 6) AS log_w
         FROM sc ORDER BY doc_id""",
    // q120: q119's weights + md5-derived Gumbel keys; threshold =
    // interpolated 0.75 quantile (quantile_cont shares Spark's exact
    // interpolation bit-for-bit — the round-6 parity sweep)
    "q120_dsir_sample" ->
      """WITH toks AS (SELECT doc_id, lang,
                list_filter(
                  regexp_split_to_array(trim(lower(text)), '\s+'),
                  w -> length(w) > 0) AS t
              FROM documents),
         g AS (SELECT doc_id, lang, unnest(t) AS gram FROM toks
               UNION ALL
               SELECT doc_id, lang, t[i] || ' ' || t[i+1] AS gram
               FROM (SELECT doc_id, lang, t,
                       unnest(generate_series(1, len(t) - 1)) AS i
                     FROM toks WHERE len(t) >= 2)),
         bk AS (SELECT doc_id, lang,
                  ('0x' || substr(md5(gram), 1, 15))::BIGINT % 1000 AS b
                FROM g),
         rawc AS (SELECT b, count(*) AS cr FROM bk GROUP BY 1),
         tgtc AS (SELECT b, count(*) AS ct FROM bk
                  WHERE lang = 'en' GROUP BY 1),
         nt AS (SELECT count(*) AS n FROM bk WHERE lang = 'en'),
         nr AS (SELECT count(*) AS n FROM bk),
         model AS (SELECT rawc.b, cr, coalesce(ct, 0) AS ct
                   FROM rawc LEFT JOIN tgtc USING (b)),
         per AS (SELECT doc_id, b, count(*) AS c FROM bk GROUP BY 1, 2),
         sc AS (SELECT doc_id,
                  sum(c * (ln((ct + 1.0) / (nt.n + 1000.0))
                         - ln((cr + 1.0) / (nr.n + 1000.0)))) AS lw
                FROM per JOIN model USING (b)
                CROSS JOIN nt CROSS JOIN nr
                GROUP BY 1),
         keyed AS (SELECT doc_id, lw
                  + (-ln(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                         1, 15))::BIGINT % 1000000 + 0.5) / 1000000.0)))
                  AS key
                FROM sc),
         thr AS (SELECT quantile_cont(key, 0.75) AS q FROM keyed)
         SELECT d.lang, count(*) AS n_docs,
                CAST(sum(d.n_chars) AS BIGINT) AS chars_kept
         FROM keyed k CROSS JOIN thr
         JOIN documents d USING (doc_id)
         WHERE k.key >= thr.q
         GROUP BY 1 ORDER BY 1""",
    // q121: q61's budget-prefix shape with computed √mass weights
    // (round 9dp pins pow's ≤1-ulp engine spread)
    "q121_temperature_mix" ->
      """WITH m AS (SELECT source, sum(n_chars) AS mass
                    FROM documents GROUP BY 1),
         w AS (SELECT source,
                      round(power(mass * 1.0, 0.5), 9) AS wt FROM m),
         tot AS (SELECT sum(wt) AS ws FROM w),
         cum AS (SELECT d.source, d.n_chars,
                   sum(d.n_chars) OVER (PARTITION BY d.source
                     ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS c,
                   CAST(floor(60000 * w.wt / t.ws) AS BIGINT) AS budget
                 FROM documents d JOIN w USING (source) CROSS JOIN tot t)
         SELECT source, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS chars_kept
         FROM cum WHERE c <= budget
         GROUP BY source ORDER BY source""",
    // q123/q124: CDC boundaries via the q47 md5-bucket convention on
    // trailing 3-grams; the greedy [min,max]-clamped cut walk replays
    // as a recursive CTE stepping through each doc's boundary list
    "q123_cdc_chunks" ->
      """WITH RECURSIVE
         toks AS (SELECT doc_id,
                    regexp_split_to_array(trim(lower(text)), '\s+') AS t
                  FROM documents),
         meta AS (SELECT doc_id, t, len(t) AS L FROM toks),
         bnd AS (SELECT doc_id, list_sort(list(i)) AS bl
                 FROM (SELECT doc_id, i
                       FROM (SELECT doc_id, t,
                               unnest(generate_series(3, len(t))) AS i
                             FROM toks)
                       WHERE ('0x' || substr(md5(
                                array_to_string(t[i-2:i], ' ')),
                                1, 15))::BIGINT % 16 = 15)
                 GROUP BY doc_id),
         cuts AS (
           SELECT m.doc_id, m.t, m.L,
                  coalesce(b.bl, []::BIGINT[]) AS bl,
                  CAST(0 AS BIGINT) AS chunk_id,
                  CAST(1 AS BIGINT) AS strt,
                  least(coalesce(list_min(list_filter(
                          coalesce(b.bl, []::BIGINT[]),
                          x -> x >= 10 AND x <= 40)),
                        least(40, m.L)), m.L) AS fin
           FROM meta m LEFT JOIN bnd b USING (doc_id)
           UNION ALL
           SELECT doc_id, t, L, bl, chunk_id + 1, fin + 1,
                  least(coalesce(list_min(list_filter(bl,
                          x -> x >= fin + 10 AND x <= fin + 40)),
                        least(fin + 40, L)), L)
           FROM cuts WHERE fin < L)
         SELECT doc_id, chunk_id, strt AS start_tok,
                fin - strt + 1 AS n_chunk_tokens,
                array_to_string(t[strt:fin], ' ') AS chunk_text
         FROM cuts ORDER BY doc_id, chunk_id""",
    "q124_cdc_shift_dedup" ->
      """WITH RECURSIVE
         corpus AS (SELECT doc_id, text FROM documents
                    UNION ALL
                    SELECT doc_id + 1000000, 'zzz ' || text
                    FROM documents),
         toks AS (SELECT doc_id,
                    regexp_split_to_array(trim(lower(text)), '\s+') AS t
                  FROM corpus),
         meta AS (SELECT doc_id, t, len(t) AS L FROM toks),
         bnd AS (SELECT doc_id, list_sort(list(i)) AS bl
                 FROM (SELECT doc_id, i
                       FROM (SELECT doc_id, t,
                               unnest(generate_series(3, len(t))) AS i
                             FROM toks)
                       WHERE ('0x' || substr(md5(
                                array_to_string(t[i-2:i], ' ')),
                                1, 15))::BIGINT % 16 = 15)
                 GROUP BY doc_id),
         cuts AS (
           SELECT m.doc_id, m.t, m.L,
                  coalesce(b.bl, []::BIGINT[]) AS bl,
                  CAST(1 AS BIGINT) AS strt,
                  least(coalesce(list_min(list_filter(
                          coalesce(b.bl, []::BIGINT[]),
                          x -> x >= 10 AND x <= 40)),
                        least(40, m.L)), m.L) AS fin
           FROM meta m LEFT JOIN bnd b USING (doc_id)
           UNION ALL
           SELECT doc_id, t, L, bl, fin + 1,
                  least(coalesce(list_min(list_filter(bl,
                          x -> x >= fin + 10 AND x <= fin + 40)),
                        least(fin + 40, L)), L)
           FROM cuts WHERE fin < L),
         dg AS (SELECT DISTINCT doc_id,
                  array_to_string(t[strt:fin], ' ') AS chunk_text
                FROM cuts),
         freq AS (SELECT chunk_text, count(*) AS nd FROM dg GROUP BY 1),
         per AS (SELECT doc_id, count(*) AS n_chunks,
                   sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS n_dup
                 FROM dg JOIN freq USING (chunk_text) GROUP BY 1)
         SELECT doc_id, n_chunks,
                CAST(n_dup AS BIGINT) AS n_dup_chunks,
                round(n_dup * 1.0 / n_chunks, 6) AS dup_frac
         FROM per ORDER BY doc_id""",
    // q125: per-line q37-style stopword argmax over the synthesized
    // 3-line composites; entropy = ln N − Σ c·ln c / N; top tie-break
    // (count, lang) struct-max == ORDER BY c DESC, lang DESC
    "q125_lang_mix" ->
      """WITH corpus AS (
           SELECT a.doc_id,
                  a.text || chr(10) || b.text || chr(10) || c.text
                    AS text
           FROM documents a
           JOIN documents b ON b.doc_id = a.doc_id + 100
           JOIN documents c ON c.doc_id = a.doc_id + 250
           WHERE a.doc_id < 100),
         ln_ AS (SELECT doc_id, unnest(string_split(text, chr(10)))
                   AS line
                 FROM corpus),
         nb AS (SELECT doc_id, line FROM ln_ WHERE trim(line) <> ''),
         sc AS (SELECT doc_id,
                  string_split_regex(lower(line), '\s+') AS toks
                FROM nb),
         s AS (SELECT doc_id,
           CAST(len(list_filter(toks, x -> list_contains(
             ['the','a','of','and','to','in','is'], x))) AS BIGINT)
             AS s_en,
           CAST(len(list_filter(toks, x -> list_contains(
             ['der','die','das','und','ist','von','mit'], x))) AS BIGINT)
             AS s_de,
           CAST(len(list_filter(toks, x -> list_contains(
             ['el','la','de','y','en','que','los'], x))) AS BIGINT)
             AS s_es,
           CAST(len(list_filter(toks, x -> list_contains(
             ['le','la','de','et','les','des','un'], x))) AS BIGINT)
             AS s_fr
           FROM sc),
         p AS (SELECT doc_id,
                 CASE
                   WHEN s_en = greatest(s_en, s_de, s_es, s_fr)
                     AND s_en > 0 THEN 'en'
                   WHEN s_de = greatest(s_en, s_de, s_es, s_fr)
                     AND s_de > 0 THEN 'de'
                   WHEN s_es = greatest(s_en, s_de, s_es, s_fr)
                     AND s_es > 0 THEN 'es'
                   WHEN s_fr = greatest(s_en, s_de, s_es, s_fr)
                     AND s_fr > 0 THEN 'fr'
                   ELSE 'und' END AS lang
               FROM s),
         pl AS (SELECT doc_id, lang, count(*) AS c
                FROM p GROUP BY 1, 2),
         top AS (SELECT doc_id, lang, c,
                   row_number() OVER (PARTITION BY doc_id
                     ORDER BY c DESC, lang DESC) AS rn
                 FROM pl),
         agg AS (SELECT doc_id, sum(c) AS n_lines,
                   count(*) AS n_langs,
                   sum(c * ln(c)) AS clc
                 FROM pl GROUP BY 1)
         SELECT a.doc_id, CAST(a.n_lines AS BIGINT) AS n_lines,
                a.n_langs, t.lang AS top_lang,
                round(t.c * 1.0 / a.n_lines, 6) AS top_share,
                round(ln(a.n_lines) - a.clc / a.n_lines, 6)
                  AS lang_entropy
         FROM agg a JOIN top t ON t.doc_id = a.doc_id AND t.rn = 1
         ORDER BY a.doc_id""",
    // q126: q62's distinct word-5-gram construction on both sides;
    // membership by gram STRING (Spark joins the xxhash64 image — the
    // q59 precedent)
    "q126_gram_novelty" ->
      """WITH toksa AS (SELECT doc_id, source,
                regexp_split_to_array(trim(lower(text)), '\s+') AS t
              FROM documents),
         g AS (SELECT DISTINCT doc_id, source,
                 array_to_string(t[i:i+4], ' ') AS gram
               FROM (SELECT doc_id, source, t,
                       unnest(generate_series(1,
                         greatest(len(t) - 4, 1))) AS i
                     FROM toksa)),
         neu AS (SELECT doc_id, gram FROM g
                 WHERE source IN ('src10','src11','src12','src13',
                   'src14','src15','src16','src17','src18','src19')),
         ref AS (SELECT DISTINCT gram FROM g
                 WHERE source NOT IN ('src10','src11','src12','src13',
                   'src14','src15','src16','src17','src18','src19')),
         j AS (SELECT n.doc_id, n.gram,
                 CASE WHEN r.gram IS NULL THEN 1 ELSE 0 END AS novel
               FROM neu n LEFT JOIN ref r USING (gram))
         SELECT doc_id, count(*) AS n_grams,
                CAST(sum(novel) AS BIGINT) AS n_novel,
                round(sum(novel) * 1.0 / count(*), 6) AS novelty
         FROM j GROUP BY 1 ORDER BY doc_id""",
    // q128/q129: winnowing — grams via the q110 shingle convention,
    // hashes via the q47 md5 convention; per-window rightmost-minimal
    // selection = max(j) among h = window min
    "q128_winnow" ->
      """WITH d AS (SELECT doc_id, lower(text) AS t,
                           length(text) AS len
                    FROM documents),
         g AS (SELECT doc_id, i AS j,
                 ('0x' || substr(md5(substr(t, i::INT, 4)), 1, 15))
                   ::BIGINT AS h
               FROM (SELECT doc_id, t,
                       unnest(generate_series(1,
                         greatest(len - 3, 1))) AS i
                     FROM d)),
         gn AS (SELECT doc_id, max(j) AS gmax FROM g GROUP BY 1),
         win AS (SELECT doc_id, unnest(generate_series(1,
                   greatest(gmax - 7, 1))) AS s
                 FROM gn),
         wj AS (SELECT w.doc_id, w.s, g.j, g.h
                FROM win w JOIN g ON g.doc_id = w.doc_id
                  AND g.j >= w.s AND g.j <= w.s + 7),
         mn AS (SELECT doc_id, s, min(h) AS mh FROM wj GROUP BY 1, 2),
         sel AS (SELECT wj.doc_id, mn.s, max(wj.j) AS pos,
                        mn.mh AS fp
                 FROM wj JOIN mn ON wj.doc_id = mn.doc_id
                   AND wj.s = mn.s AND wj.h = mn.mh
                 GROUP BY wj.doc_id, mn.s, mn.mh)
         SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, fp
         FROM sel ORDER BY doc_id, pos, fp""",
    "q129_winnow_overlap" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents
                    WHERE doc_id < 50
                    UNION ALL
                    SELECT doc_id + 20000, substr(text, 30, 120)
                    FROM documents WHERE doc_id < 50),
         d AS (SELECT doc_id, lower(text) AS t,
                      length(text) AS len
               FROM corpus),
         g AS (SELECT doc_id, i AS j,
                 ('0x' || substr(md5(substr(t, i::INT, 4)), 1, 15))
                   ::BIGINT AS h
               FROM (SELECT doc_id, t,
                       unnest(generate_series(1,
                         greatest(len - 3, 1))) AS i
                     FROM d)),
         gn AS (SELECT doc_id, max(j) AS gmax FROM g GROUP BY 1),
         win AS (SELECT doc_id, unnest(generate_series(1,
                   greatest(gmax - 7, 1))) AS s
                 FROM gn),
         wj AS (SELECT w.doc_id, w.s, g.j, g.h
                FROM win w JOIN g ON g.doc_id = w.doc_id
                  AND g.j >= w.s AND g.j <= w.s + 7),
         mn AS (SELECT doc_id, s, min(h) AS mh FROM wj GROUP BY 1, 2),
         fps AS (SELECT DISTINCT doc_id, mh AS fp FROM mn),
         sz AS (SELECT doc_id, count(*) AS n FROM fps GROUP BY 1),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS n_shared
                   FROM fps a JOIN fps b
                     ON a.fp = b.fp AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         sc AS (SELECT id_a, id_b, n_shared,
                  n_shared * 1.0 / least(sa.n, sb.n) AS containment
                FROM pairs
                JOIN sz sa ON sa.doc_id = id_a
                JOIN sz sb ON sb.doc_id = id_b
                WHERE n_shared >= 3)
         SELECT id_a, id_b, n_shared,
                round(containment, 6) AS containment
         FROM sc WHERE containment >= 0.8 ORDER BY id_a, id_b""",
    // q130: q129's fingerprints + the doc-freq guard on CANDIDATES
    // only (exact n_shared recomputed on unfiltered sets), then
    // components via the q57 recursive-CTE convention; survivors =
    // min-id per cluster + unclustered
    "q130_winnow_dedup" ->
      """WITH RECURSIVE corpus AS (SELECT doc_id, text FROM documents
                    WHERE doc_id < 50
                    UNION ALL
                    SELECT doc_id + 20000, substr(text, 30, 120)
                    FROM documents WHERE doc_id < 50),
         d AS (SELECT doc_id, lower(text) AS t,
                      length(text) AS len
               FROM corpus),
         g AS (SELECT doc_id, i AS j,
                 ('0x' || substr(md5(substr(t, i::INT, 4)), 1, 15))
                   ::BIGINT AS h
               FROM (SELECT doc_id, t,
                       unnest(generate_series(1,
                         greatest(len - 3, 1))) AS i
                     FROM d)),
         gn AS (SELECT doc_id, max(j) AS gmax FROM g GROUP BY 1),
         win AS (SELECT doc_id, unnest(generate_series(1,
                   greatest(gmax - 7, 1))) AS s
                 FROM gn),
         wj AS (SELECT w.doc_id, w.s, g.j, g.h
                FROM win w JOIN g ON g.doc_id = w.doc_id
                  AND g.j >= w.s AND g.j <= w.s + 7),
         mn AS (SELECT doc_id, s, min(h) AS mh FROM wj GROUP BY 1, 2),
         fps AS (SELECT DISTINCT doc_id, mh AS fp FROM mn),
         sz AS (SELECT doc_id, count(*) AS n FROM fps GROUP BY 1),
         dfq AS (SELECT fp, count(*) AS dfc FROM fps GROUP BY 1),
         filt AS (SELECT f.doc_id, f.fp FROM fps f
                  JOIN dfq USING (fp) WHERE dfc <= 20),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM filt a JOIN filt b
                    ON a.fp = b.fp AND a.doc_id < b.doc_id),
         ex AS (SELECT c.id_a, c.id_b, count(*) AS n_shared
                FROM cand c
                JOIN fps fa ON fa.doc_id = c.id_a
                JOIN fps fb ON fb.doc_id = c.id_b AND fb.fp = fa.fp
                GROUP BY 1, 2),
         pairs AS (SELECT id_a, id_b FROM ex
                   JOIN sz sa ON sa.doc_id = id_a
                   JOIN sz sb ON sb.doc_id = id_b
                   WHERE n_shared >= 3
                     AND n_shared * 1.0 / least(sa.n, sb.n) >= 0.8),
         edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach AS (SELECT a, b FROM edges
                   UNION
                   SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         roots AS (SELECT a AS id, least(a, min(b)) AS root
                   FROM reach GROUP BY a),
         losers AS (SELECT id FROM roots WHERE root <> id)
         SELECT CAST(c.doc_id AS BIGINT) AS doc_id FROM corpus c
         WHERE c.doc_id NOT IN (SELECT id FROM losers)
         ORDER BY doc_id""",
    // q132: q72's replace-chain segmentation per word (left-to-right
    // non-overlapping scan == applyMerge), aggregated per source
    "q132_bpe_fertility" ->
      """WITH w AS (SELECT source,
                unnest(string_split_regex(trim(lower(text)), '\s+'))
                  AS wd
              FROM documents),
         f AS (SELECT source, wd,
                 replace(replace(replace(wd, 'er', 'A'), 'th', 'B'),
                   'Be', 'C') AS w2
               FROM w WHERE wd <> ''),
         a AS (SELECT source AS grp, count(*) AS nw,
                      sum(length(wd)) AS nc, sum(length(w2)) AS nb
               FROM f GROUP BY source)
         SELECT grp, CAST(nw AS BIGINT) AS n_words,
                CAST(nc AS BIGINT) AS n_chars,
                CAST(nb AS BIGINT) AS n_bpe_tokens,
                round(nb * 1.0 / nw, 6) AS tokens_per_word,
                round(nc * 1.0 / nb, 6) AS chars_per_token
         FROM a ORDER BY grp""",
    // q133: same deterministic page skeleton, then the same regex
    // chain — blocks, tags→space, entity decode (&amp; last),
    // whitespace collapse; link chars from non-greedy anchor inner
    // text put through the identical cleanup
    "q133_html_extract" ->
      """WITH h AS (SELECT doc_id,
           '<html><!-- generated --><head><script type="text/javascript">var x = 1 < 2;</script><style>p { color: red; }</style></head><body><h1>'
           || source || '</h1><p>'
           || replace(text, ' and ', ' &amp; ')
           || '</p><a href="/doc/' || doc_id
           || '">more &gt; here</a></body></html>' AS html
           FROM documents),
         b AS (SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(html,
             '(?s)<!--.*?-->', ' ', 'g'),
             '(?si)<script\b[^>]*>.*?</script>', ' ', 'g'),
             '(?si)<style\b[^>]*>.*?</style>', ' ', 'g') AS body
           FROM h),
         tx AS (SELECT doc_id,
           trim(regexp_replace(
             replace(replace(replace(replace(replace(replace(
               regexp_replace(body, '<[^>]*>', ' ', 'g'),
               '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
               '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
             '\s+', ' ', 'g')) AS text
           FROM b),
         lc AS (SELECT doc_id,
           coalesce(list_sum(list_transform(
             regexp_extract_all(body,
               '(?si)<a\b[^>]*>(.*?)</a>', 1),
             x -> length(trim(regexp_replace(
               replace(replace(replace(replace(replace(replace(
                 regexp_replace(x, '<[^>]*>', ' ', 'g'),
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                 '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
               '\s+', ' ', 'g'))))), 0) AS lchars
           FROM b)
         SELECT t.doc_id, t.text,
                CAST(length(t.text) AS BIGINT) AS n_chars,
                CASE WHEN length(t.text) = 0 THEN 0.0
                     ELSE round(lchars * 1.0 / length(t.text), 6)
                END AS link_density
         FROM tx t JOIN lc USING (doc_id) ORDER BY doc_id""",
    // q134: UNION ALL of each card section's existing oracle shape
    // (q64's quality CTE, q70's quantile_cont, md5 dup groups)
    "q134_data_card" ->
      """WITH d AS (SELECT doc_id, text, lang, source,
                length(text) AS n_chars,
                len(list_filter(
                  string_split_regex(trim(lower(text)), '\s+'),
                  x -> x <> '')) AS n_toks
              FROM documents),
         gl AS (
           SELECT 'corpus' AS section, 'n_docs' AS metric,
                  round(count(*) * 1.0, 6) AS value FROM d
           UNION ALL SELECT 'corpus', 'n_sources',
                  round(count(DISTINCT source) * 1.0, 6) FROM d
           UNION ALL SELECT 'corpus', 'n_langs',
                  round(count(DISTINCT lang) * 1.0, 6) FROM d
           UNION ALL SELECT 'corpus', 'n_tokens',
                  round(sum(n_toks) * 1.0, 6) FROM d
           UNION ALL SELECT 'corpus', 'n_chars',
                  round(sum(n_chars) * 1.0, 6) FROM d),
         dup AS (SELECT 'dedup' AS section,
                        'exact_dup_rate' AS metric,
                        round((count(*) - count(DISTINCT md5(text)))
                          * 1.0 / count(*), 6) AS value
                 FROM d),
         ls AS (SELECT 'lang' AS section,
                       'share:' || lang AS metric,
                       round(count(*) * 1.0 /
                         (SELECT count(*) FROM d), 6) AS value
                FROM d GROUP BY lang),
         ss AS (SELECT source, count(*) AS c, sum(n_toks) AS t
                FROM d GROUP BY source),
         s1 AS (SELECT 'source' AS section,
                       'share:' || source AS metric,
                       round(c * 1.0 / (SELECT sum(c) FROM ss), 6)
                         AS value
                FROM ss),
         s2 AS (SELECT 'source' AS section,
                       'token_share:' || source AS metric,
                       round(t * 1.0 / (SELECT sum(t) FROM ss), 6)
                         AS value
                FROM ss),
         lq AS (
           SELECT 'length' AS section, 'p50' AS metric,
                  round(quantile_cont(n_chars, 0.5), 6) AS value
           FROM d
           UNION ALL SELECT 'length', 'p90',
                  round(quantile_cont(n_chars, 0.9), 6) FROM d
           UNION ALL SELECT 'length', 'p99',
                  round(quantile_cont(n_chars, 0.99), 6) FROM d),
         qm AS (SELECT trim(lower(text)) AS t FROM documents),
         qf AS (SELECT len(regexp_extract_all(t, '\S+')) AS n_toks,
                  length(regexp_replace(t, '\s+', '', 'g')) AS non_ws,
                  len(regexp_extract_all(t, '#|…|\.\.\.')) AS n_sym,
                  len(list_filter(regexp_split_to_array(t, '\s+'),
                      x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
                  len(list_filter(regexp_split_to_array(t, '\s+'),
                      x -> x IN ('the','a','of','and','to','in','is')))
                    AS n_stop
                FROM qm),
         qk AS (SELECT
                  (CASE WHEN n_toks BETWEEN 30 AND 90
                        THEN 1 ELSE 0 END)
                * (CASE WHEN n_toks > 0
                         AND non_ws * 1.0 / n_toks BETWEEN 3.0 AND 4.5
                        THEN 1 ELSE 0 END)
                * (CASE WHEN n_toks > 0
                         AND n_sym * 1.0 / n_toks <= 0.1
                        THEN 1 ELSE 0 END)
                * (CASE WHEN n_toks > 0
                         AND n_alpha * 1.0 / n_toks >= 0.8
                        THEN 1 ELSE 0 END)
                * (CASE WHEN n_stop >= 1 THEN 1 ELSE 0 END) AS keep
                FROM qf),
         qr AS (SELECT 'quality' AS section, 'pass_rate' AS metric,
                       round(avg(keep * 1.0), 6) AS value
                FROM qk)
         SELECT section, metric, value FROM (
           SELECT * FROM gl UNION ALL SELECT * FROM dup
           UNION ALL SELECT * FROM ls
           UNION ALL SELECT * FROM s1 UNION ALL SELECT * FROM s2
           UNION ALL SELECT * FROM lq UNION ALL SELECT * FROM qr)
         ORDER BY section, metric""",
    // q135: q134's card computed per scope tag (old = doc_id < 400 ⊆
    // new = all) in one pass, then the full-outer diff join
    "q135_data_card_diff" ->
      """WITH sc AS (SELECT 'old' AS s UNION ALL SELECT 'new'),
         d AS (SELECT sc.s, doc_id, text, lang, source,
                length(text) AS n_chars,
                len(list_filter(
                  string_split_regex(trim(lower(text)), '\s+'),
                  x -> x <> '')) AS n_toks,
                trim(lower(text)) AS t
              FROM documents, sc
              WHERE sc.s = 'new' OR doc_id < 400),
         gl AS (
           SELECT s, 'corpus' AS section, 'n_docs' AS metric,
                  round(count(*) * 1.0, 6) AS value FROM d GROUP BY s
           UNION ALL SELECT s, 'corpus', 'n_sources',
                  round(count(DISTINCT source) * 1.0, 6)
                  FROM d GROUP BY s
           UNION ALL SELECT s, 'corpus', 'n_langs',
                  round(count(DISTINCT lang) * 1.0, 6)
                  FROM d GROUP BY s
           UNION ALL SELECT s, 'corpus', 'n_tokens',
                  round(sum(n_toks) * 1.0, 6) FROM d GROUP BY s
           UNION ALL SELECT s, 'corpus', 'n_chars',
                  round(sum(n_chars) * 1.0, 6) FROM d GROUP BY s),
         dup AS (SELECT s, 'dedup' AS section,
                        'exact_dup_rate' AS metric,
                        round((count(*) - count(DISTINCT md5(text)))
                          * 1.0 / count(*), 6) AS value
                 FROM d GROUP BY s),
         ls AS (SELECT s, 'lang' AS section,
                       'share:' || lang AS metric,
                       round(count(*) * 1.0 /
                         sum(count(*)) OVER (PARTITION BY s), 6)
                         AS value
                FROM d GROUP BY s, lang),
         ss AS (SELECT s, source, count(*) AS c, sum(n_toks) AS t
                FROM d GROUP BY s, source),
         s1 AS (SELECT s, 'source' AS section,
                       'share:' || source AS metric,
                       round(c * 1.0 /
                         sum(c) OVER (PARTITION BY s), 6) AS value
                FROM ss),
         s2 AS (SELECT s, 'source' AS section,
                       'token_share:' || source AS metric,
                       round(t * 1.0 /
                         sum(t) OVER (PARTITION BY s), 6) AS value
                FROM ss),
         lq AS (
           SELECT s, 'length' AS section, 'p50' AS metric,
                  round(quantile_cont(n_chars, 0.5), 6) AS value
           FROM d GROUP BY s
           UNION ALL SELECT s, 'length', 'p90',
                  round(quantile_cont(n_chars, 0.9), 6)
                  FROM d GROUP BY s
           UNION ALL SELECT s, 'length', 'p99',
                  round(quantile_cont(n_chars, 0.99), 6)
                  FROM d GROUP BY s),
         qf AS (SELECT s,
                  len(regexp_extract_all(t, '\S+')) AS n_toks,
                  length(regexp_replace(t, '\s+', '', 'g')) AS non_ws,
                  len(regexp_extract_all(t, '#|…|\.\.\.')) AS n_sym,
                  len(list_filter(regexp_split_to_array(t, '\s+'),
                      x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
                  len(list_filter(regexp_split_to_array(t, '\s+'),
                      x -> x IN ('the','a','of','and','to','in','is')))
                    AS n_stop
                FROM d),
         qk AS (SELECT s,
                  (CASE WHEN n_toks BETWEEN 30 AND 90
                        THEN 1 ELSE 0 END)
                * (CASE WHEN n_toks > 0
                         AND non_ws * 1.0 / n_toks BETWEEN 3.0 AND 4.5
                        THEN 1 ELSE 0 END)
                * (CASE WHEN n_toks > 0
                         AND n_sym * 1.0 / n_toks <= 0.1
                        THEN 1 ELSE 0 END)
                * (CASE WHEN n_toks > 0
                         AND n_alpha * 1.0 / n_toks >= 0.8
                        THEN 1 ELSE 0 END)
                * (CASE WHEN n_stop >= 1 THEN 1 ELSE 0 END) AS keep
                FROM qf),
         qr AS (SELECT s, 'quality' AS section,
                       'pass_rate' AS metric,
                       round(avg(keep * 1.0), 6) AS value
                FROM qk GROUP BY s),
         card AS (
           SELECT * FROM gl UNION ALL SELECT * FROM dup
           UNION ALL SELECT * FROM ls
           UNION ALL SELECT * FROM s1 UNION ALL SELECT * FROM s2
           UNION ALL SELECT * FROM lq UNION ALL SELECT * FROM qr),
         o AS (SELECT section, metric, value AS value_old
               FROM card WHERE s = 'old'),
         n AS (SELECT section, metric, value AS value_new
               FROM card WHERE s = 'new')
         SELECT coalesce(o.section, n.section) AS section,
                coalesce(o.metric, n.metric) AS metric,
                value_old, value_new,
                round(value_new - value_old, 6) AS delta
         FROM o FULL OUTER JOIN n
           ON o.section = n.section AND o.metric = n.metric
         WHERE value_old IS NULL OR value_new IS NULL
            OR value_old <> value_new
         ORDER BY section, metric""",
    // q136: q65's span-surgery CTE with the duplicated-gram set
    // replaced by the eval side's distinct full-width 8-grams (short
    // eval docs can't match a full-width corpus gram either way)
    "q136_decontaminate_spans" ->
      """WITH ca AS (SELECT doc_id,
                regexp_split_to_array(trim(lower(text)), '\s+') AS t
              FROM documents WHERE doc_id < 450),
         tk AS (SELECT doc_id, i AS p, t[i] AS tok
                FROM (SELECT doc_id, t,
                        unnest(generate_series(1, len(t))) AS i
                      FROM ca)),
         g AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS gram
               FROM (SELECT doc_id, t,
                       unnest(generate_series(1, len(t) - 7)) AS i
                     FROM ca WHERE len(t) >= 8)),
         ea AS (SELECT regexp_split_to_array(trim(lower(text)), '\s+')
                  AS t
                FROM documents WHERE doc_id >= 450),
         eg AS (SELECT DISTINCT array_to_string(t[i:i+7], ' ') AS gram
                FROM (SELECT t,
                        unnest(generate_series(1, len(t) - 7)) AS i
                      FROM ea WHERE len(t) >= 8)),
         cov AS (SELECT DISTINCT g.doc_id, g.i + k.k AS p
                 FROM g JOIN eg USING (gram)
                 CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS k)
                   AS k),
         kept AS (SELECT tk.doc_id, tk.p, tk.tok FROM tk
                  ANTI JOIN cov
                    ON tk.doc_id = cov.doc_id AND tk.p = cov.p),
         agg AS (SELECT doc_id, count(*) AS n_kept,
                   string_agg(tok, ' ' ORDER BY p) AS text_clean
                 FROM kept GROUP BY 1)
         SELECT c.doc_id, CAST(len(c.t) AS BIGINT) AS n_tokens,
                CAST(len(c.t) - coalesce(a.n_kept, 0) AS BIGINT)
                  AS n_removed,
                coalesce(a.text_clean, '') AS text_clean
         FROM ca c LEFT JOIN agg a USING (doc_id)
         ORDER BY c.doc_id""",
    // q122: q33's cross join with the label-inequality + semi-hard
    // band filters applied before the per-anchor rank
    "q122_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe,
                           label AS q_label
                    FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce,
                      label AS c_label
               FROM embeddings WHERE vec_id >= 5),
         s AS (SELECT qid, cid, q_label, c_label,
                      list_cosine_similarity(qe, ce) AS sim
               FROM q CROSS JOIN c
               WHERE q_label IS DISTINCT FROM c_label),
         f AS (SELECT * FROM s WHERE sim >= 0.0 AND sim < 0.95),
         r AS (SELECT qid, cid, sim, q_label, c_label,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY sim DESC, cid ASC) AS rnk
               FROM f)
         SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid,
                round(sim, 4) AS sim, q_label, c_label
         FROM r WHERE rnk <= 10 ORDER BY qid, rnk""",
    "q34_ann_ivf" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
                    FROM embeddings WHERE vec_id >= 495),
         c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
               FROM embeddings WHERE vec_id < 495),
         s AS (SELECT qid, cid, list_cosine_similarity(qe, ce) AS sim
               FROM q CROSS JOIN c),
         r AS (SELECT qid, cid, sim,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY sim DESC, cid ASC) AS rnk
               FROM s)
         SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid, round(sim, 4) AS sim
         FROM r WHERE rnk <= 10 ORDER BY qid, rnk""",
    "q35_cosine_neardup" ->
      """WITH corpus AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           UNION ALL
           SELECT vec_id + 10000,
                  list_transform(embedding::DOUBLE[], x -> x + 0.05)
           FROM embeddings WHERE vec_id < 50),
         p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                      list_cosine_similarity(a.v, b.v) AS sim
               FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
         SELECT id_a, id_b, round(sim, 4) AS sim
         FROM p WHERE sim >= 0.9 ORDER BY id_a, id_b""",
    "q36_text_stats" ->
      """WITH t AS (SELECT doc_id, text,
                string_split_regex(lower(text), '\s+') AS toks
              FROM documents WHERE doc_id < 250)
         SELECT doc_id,
                CAST(length(text) AS BIGINT) AS n_chars,
                CAST(len(toks) AS BIGINT) AS n_tokens,
                CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
                round(len(list_distinct(toks)) * 1.0 / len(toks), 6)
                  AS type_token_ratio,
                round(list_aggregate(list_transform(toks, x -> length(x)),
                        'sum') * 1.0 / len(toks), 6) AS avg_token_len,
                round(least(len(toks) / 100.0, 1.0) *
                        (len(list_distinct(toks)) * 1.0 / len(toks)), 6)
                  AS quality_score
         FROM t ORDER BY doc_id""",
    "q37_langid" ->
      """WITH t AS (SELECT doc_id,
                string_split_regex(lower(text), '\s+') AS toks
              FROM documents),
         s AS (SELECT doc_id,
           CAST(len(list_filter(toks, x -> list_contains(
             ['the','a','of','and','to','in','is'], x))) AS BIGINT) AS s_en,
           CAST(len(list_filter(toks, x -> list_contains(
             ['der','die','das','und','ist','von','mit'], x))) AS BIGINT) AS s_de,
           CAST(len(list_filter(toks, x -> list_contains(
             ['el','la','de','y','en','que','los'], x))) AS BIGINT) AS s_es,
           CAST(len(list_filter(toks, x -> list_contains(
             ['le','la','de','et','les','des','un'], x))) AS BIGINT) AS s_fr
           FROM t)
         SELECT doc_id, s_en, s_de, s_es, s_fr,
                CASE
                  WHEN s_en = greatest(s_en, s_de, s_es, s_fr) AND s_en > 0
                    THEN 'en'
                  WHEN s_de = greatest(s_en, s_de, s_es, s_fr) AND s_de > 0
                    THEN 'de'
                  WHEN s_es = greatest(s_en, s_de, s_es, s_fr) AND s_es > 0
                    THEN 'es'
                  WHEN s_fr = greatest(s_en, s_de, s_es, s_fr) AND s_fr > 0
                    THEN 'fr'
                  ELSE 'und' END AS predicted
         FROM s ORDER BY doc_id""",
    "q38_fingerprint" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 10000, upper(text) || '  !!'
           FROM documents WHERE doc_id < 80),
         g AS (SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                 AS fp, count(*) AS cnt
               FROM corpus GROUP BY 1)
         SELECT CAST(sum(cnt) AS BIGINT) AS n_total,
                count(*) AS n_fingerprints,
                CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_dup_groups
         FROM g""",
    "q39_multimodal_meta" ->
      """SELECT count(*) AS n_docs,
                CAST(sum(octet_length(encode(text))) AS BIGINT)
                  AS total_bytes,
                count(DISTINCT md5(text)) AS n_distinct_sha,
                -- text payloads are never valid image containers; the
                -- fail-soft header decoder must yield 0 decoded rows
                CAST(0 AS BIGINT) AS n_decoded
         FROM documents""",
    "q41_chunking" ->
      """WITH t AS (SELECT doc_id,
                string_split_regex(lower(text), '\s+') AS toks
              FROM documents WHERE doc_id < 50),
         n AS (SELECT doc_id, toks, len(toks) AS nt FROM t),
         c AS (SELECT doc_id, toks, nt,
                 unnest(generate_series(0,
                   greatest(CAST(ceil((nt - 64) / 48.0) AS INT), 0)))
                   AS ci
               FROM n)
         SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
                array_to_string(toks[ci*48+1 : ci*48+64], ' ')
                  AS chunk_text,
                CAST(len(toks[ci*48+1 : ci*48+64]) AS BIGINT)
                  AS n_chunk_tokens
         FROM c ORDER BY doc_id, chunk_idx""",
    "q42_stream_window" ->
      """SELECT strftime(make_timestamp(
                  CAST(floor(epoch(ts)/300)*300*1000000 AS BIGINT)),
                  '%Y-%m-%d %H:%M:%S') AS window_start,
                strftime(make_timestamp(
                  CAST((floor(epoch(ts)/300)*300+300)*1000000 AS BIGINT)),
                  '%Y-%m-%d %H:%M:%S') AS window_end,
                event_type, count(*) AS n, round(sum(value), 2) AS total
         FROM events GROUP BY 1, 2, 3 ORDER BY 1, 3""",
    "q46_text_scrub" ->
      """WITH corpus AS (
           SELECT doc_id,
                  text || ' mail u' || doc_id || '@ex.com or https://h'
                       || doc_id || '.ex/p end' AS text
           FROM documents WHERE doc_id < 100)
         SELECT doc_id,
                CAST(len(regexp_extract_all(text, 'https?://\S+'))
                     AS BIGINT) AS n_urls,
                md5(regexp_replace(
                      regexp_replace(text, 'https?://\S+', '<URL>', 'g'),
                      '\S+@\S+\.\S+', '<EMAIL>', 'g')) AS scrubbed_md5
         FROM corpus ORDER BY doc_id""",
    "q47_hash_sample" ->
      """SELECT lang, count(*) AS n_sampled,
                CAST(sum(n_chars) AS BIGINT) AS chars_sampled
         FROM documents
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 10 < 3
         GROUP BY 1 ORDER BY 1""",
    "q48_quantize_error" ->
      """WITH e AS (
           SELECT label,
                  list_max(list_transform(embedding::DOUBLE[],
                    x -> abs(x))) / 127.0 AS scale,
                  embedding::DOUBLE[] AS v
           FROM embeddings),
         errs AS (
           SELECT label,
                  list_max(list_transform(v,
                    x -> abs(x - round(x / scale) * scale))) AS err
           FROM e)
         SELECT label, count(*) AS n,
                round(avg(err), 6) AS avg_max_err,
                round(max(err), 6) AS worst_err
         FROM errs GROUP BY 1 ORDER BY 1""",
    // q71/q73: exhaustive probing of a persisted index equals brute
    // force over the full corpus — same SQL as q34 by design
    "q71_ivf_index_probe" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
                    FROM embeddings WHERE vec_id >= 495),
         c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
               FROM embeddings WHERE vec_id < 495),
         s AS (SELECT qid, cid, list_cosine_similarity(qe, ce) AS sim
               FROM q CROSS JOIN c),
         r AS (SELECT qid, cid, sim,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY sim DESC, cid ASC) AS rnk
               FROM s)
         SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid, round(sim, 4) AS sim
         FROM r WHERE rnk <= 10 ORDER BY qid, rnk""",
    // q72: each merge rule is a replace(pair -> placeholder); SQL
    // replace's left-to-right non-overlapping scan IS applyMerge's,
    // and uppercase placeholders cannot occur in lowercased text
    "q72_bpe_token_count" ->
      """WITH w AS (
           SELECT doc_id,
                  unnest(string_split_regex(trim(lower(text)), '\s+'))
                    AS wd
           FROM documents),
         s AS (SELECT doc_id,
                      replace(replace(replace(wd, 'er', 'A'),
                        'th', 'B'), 'Be', 'C') AS w2
               FROM w)
         SELECT doc_id, CAST(sum(length(w2)) AS BIGINT) AS n_bpe_tokens
         FROM s GROUP BY doc_id ORDER BY doc_id""",
    "q73_ivfpq_index_probe" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
                    FROM embeddings WHERE vec_id >= 495),
         c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
               FROM embeddings WHERE vec_id < 495),
         s AS (SELECT qid, cid, list_cosine_similarity(qe, ce) AS sim
               FROM q CROSS JOIN c),
         r AS (SELECT qid, cid, sim,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY sim DESC, cid ASC) AS rnk
               FROM s)
         SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid, round(sim, 4) AS sim
         FROM r WHERE rnk <= 10 ORDER BY qid, rnk""",
    // q74: duplicated-line removal — line synthesis (replace is the
    // same non-overlapping left-to-right scan as regexp_replace),
    // distinct-doc frequency, anti-join, order-preserving reassembly
    "q74_remove_dup_lines" ->
      """WITH corpus AS (
           SELECT doc_id, replace(text, ' the ', chr(10)) AS text
           FROM documents
           UNION ALL
           SELECT doc_id + 10000, replace(text, ' the ', chr(10))
           FROM documents WHERE doc_id < 100),
         la AS (SELECT doc_id, string_split(text, chr(10)) AS ls
                FROM corpus),
         ln AS (SELECT doc_id, i AS p, ls[i] AS line
                FROM (SELECT doc_id, ls,
                        unnest(generate_series(1, len(ls))) AS i
                      FROM la)),
         dup AS (SELECT line FROM (
                   SELECT line, count(DISTINCT doc_id) AS nd FROM ln
                   WHERE length(trim(line)) >= 1 GROUP BY 1)
                 WHERE nd >= 2),
         kept AS (SELECT ln.doc_id, ln.p, ln.line FROM ln
                  ANTI JOIN dup ON ln.line = dup.line),
         agg AS (SELECT doc_id, count(*) AS n_kept,
                   string_agg(line, chr(10) ORDER BY p) AS text_clean
                 FROM kept GROUP BY 1)
         SELECT la.doc_id, CAST(len(la.ls) AS BIGINT) AS n_lines,
                CAST(len(la.ls) - coalesce(agg.n_kept, 0) AS BIGINT)
                  AS n_removed,
                coalesce(agg.text_clean, '') AS text_clean
         FROM la LEFT JOIN agg USING (doc_id) ORDER BY la.doc_id""",
    // q75: tf / df / N are integers, ln is the one float op; the rank
    // order (score desc, term asc) is total on both sides
    "q75_tfidf_top_terms" ->
      """WITH d AS (SELECT doc_id,
                regexp_split_to_array(trim(lower(text)), '\s+') AS t
              FROM documents),
         tok AS (SELECT doc_id, unnest(t) AS term FROM d),
         tf AS (SELECT doc_id, term, count(*) AS tf
                FROM tok GROUP BY 1, 2),
         dfq AS (SELECT term, count(DISTINCT doc_id) AS df
                 FROM tok GROUP BY 1),
         n AS (SELECT count(*) AS n FROM d),
         s AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
                 tf.tf * (ln((n.n + 1.0) / (dfq.df + 1.0)) + 1.0)
                   AS score
               FROM tf JOIN dfq USING (term) CROSS JOIN n),
         r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, term) AS rk FROM s)
         SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
                CAST(df AS BIGINT) AS df, round(score, 6) AS score,
                CAST(rk AS BIGINT) AS rk
         FROM r WHERE rk <= 3 ORDER BY doc_id, rk""",
    // q76: centroids are per-(source, dim) double means; pairwise
    // cosine over the 20-source centroid table
    "q76_source_affinity" ->
      """WITH e AS (SELECT d.source AS grp, em.embedding AS v
                    FROM embeddings em
                    JOIN documents d ON em.vec_id = d.doc_id),
         x AS (SELECT grp, i AS dim, CAST(v[i] AS DOUBLE) AS val
               FROM (SELECT grp, v,
                       unnest(generate_series(1, len(v))) AS i FROM e)),
         c AS (SELECT grp, dim, avg(val) AS c FROM x GROUP BY 1, 2),
         p AS (SELECT a.grp AS group_a, b.grp AS group_b,
                 sum(a.c * b.c) AS dot, sum(a.c * a.c) AS na,
                 sum(b.c * b.c) AS nb
               FROM c a JOIN c b USING (dim) WHERE a.grp < b.grp
               GROUP BY 1, 2)
         SELECT group_a, group_b, round(dot / sqrt(na * nb), 6)
           AS cosine
         FROM p ORDER BY 1, 2""",
    "q77_semantic_dedup" ->
      """WITH RECURSIVE corpus AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           UNION ALL
           SELECT vec_id + 10000,
                  list_transform(embedding::DOUBLE[], x -> x + 0.05)
           FROM embeddings WHERE vec_id < 50),
         p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
               FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
               WHERE list_cosine_similarity(a.v, b.v) >= 0.9),
         edges AS (SELECT id_a AS a, id_b AS b FROM p
                   UNION SELECT id_b, id_a FROM p),
         reach AS (SELECT a, b FROM edges
                   UNION
                   SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         roots AS (SELECT a AS id, least(a, min(b)) AS root
                   FROM reach GROUP BY a)
         SELECT vec_id FROM corpus
         WHERE vec_id NOT IN (SELECT id FROM roots WHERE root <> id)
         ORDER BY vec_id""",
    "q79_kmeans" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
                    FROM embeddings),
         c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell,
                       v AS cen
                FROM (SELECT id, v FROM e ORDER BY id LIMIT 8)),
         a1 AS (SELECT id, v, cell FROM (
                  SELECT e.id, e.v, c0.cell,
                         row_number() OVER (PARTITION BY e.id
                           ORDER BY list_cosine_similarity(e.v, c0.cen)
                             DESC, c0.cell ASC) AS rn
                  FROM e CROSS JOIN c0) WHERE rn = 1),
         x1 AS (SELECT cell, i AS dim, v[i] AS val
                FROM (SELECT cell, v,
                        unnest(generate_series(1, len(v))) AS i
                      FROM a1)),
         m1 AS (SELECT cell, list(m ORDER BY dim) AS cen
                FROM (SELECT cell, dim, round(avg(val), 6) AS m
                      FROM x1 GROUP BY cell, dim) GROUP BY cell),
         c1 AS (SELECT c0.cell, COALESCE(m1.cen, c0.cen) AS cen
                FROM c0 LEFT JOIN m1 USING (cell)),
         a2 AS (SELECT id, v, cell FROM (
                  SELECT e.id, e.v, c1.cell,
                         row_number() OVER (PARTITION BY e.id
                           ORDER BY list_cosine_similarity(e.v, c1.cen)
                             DESC, c1.cell ASC) AS rn
                  FROM e CROSS JOIN c1) WHERE rn = 1),
         x2 AS (SELECT cell, i AS dim, v[i] AS val
                FROM (SELECT cell, v,
                        unnest(generate_series(1, len(v))) AS i
                      FROM a2)),
         m2 AS (SELECT cell, list(m ORDER BY dim) AS cen
                FROM (SELECT cell, dim, round(avg(val), 6) AS m
                      FROM x2 GROUP BY cell, dim) GROUP BY cell),
         c2 AS (SELECT c1.cell, COALESCE(m2.cen, c1.cen) AS cen
                FROM c1 LEFT JOIN m2 USING (cell)),
         af AS (SELECT id, cell, sim FROM (
                  SELECT e.id, c2.cell,
                         list_cosine_similarity(e.v, c2.cen) AS sim,
                         row_number() OVER (PARTITION BY e.id
                           ORDER BY list_cosine_similarity(e.v, c2.cen)
                             DESC, c2.cell ASC) AS rn
                  FROM e CROSS JOIN c2) WHERE rn = 1)
         SELECT id AS vec_id, CAST(cell AS BIGINT) AS cluster,
                round(sim, 6) AS sim
         FROM af ORDER BY vec_id""",
    "q80_prototype_prune" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
                    FROM embeddings),
         c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell,
                       v AS cen
                FROM (SELECT id, v FROM e ORDER BY id LIMIT 8)),
         a1 AS (SELECT id, v, cell FROM (
                  SELECT e.id, e.v, c0.cell,
                         row_number() OVER (PARTITION BY e.id
                           ORDER BY list_cosine_similarity(e.v, c0.cen)
                             DESC, c0.cell ASC) AS rn
                  FROM e CROSS JOIN c0) WHERE rn = 1),
         x1 AS (SELECT cell, i AS dim, v[i] AS val
                FROM (SELECT cell, v,
                        unnest(generate_series(1, len(v))) AS i
                      FROM a1)),
         m1 AS (SELECT cell, list(m ORDER BY dim) AS cen
                FROM (SELECT cell, dim, round(avg(val), 6) AS m
                      FROM x1 GROUP BY cell, dim) GROUP BY cell),
         c1 AS (SELECT c0.cell, COALESCE(m1.cen, c0.cen) AS cen
                FROM c0 LEFT JOIN m1 USING (cell)),
         a2 AS (SELECT id, v, cell FROM (
                  SELECT e.id, e.v, c1.cell,
                         row_number() OVER (PARTITION BY e.id
                           ORDER BY list_cosine_similarity(e.v, c1.cen)
                             DESC, c1.cell ASC) AS rn
                  FROM e CROSS JOIN c1) WHERE rn = 1),
         x2 AS (SELECT cell, i AS dim, v[i] AS val
                FROM (SELECT cell, v,
                        unnest(generate_series(1, len(v))) AS i
                      FROM a2)),
         m2 AS (SELECT cell, list(m ORDER BY dim) AS cen
                FROM (SELECT cell, dim, round(avg(val), 6) AS m
                      FROM x2 GROUP BY cell, dim) GROUP BY cell),
         c2 AS (SELECT c1.cell, COALESCE(m2.cen, c1.cen) AS cen
                FROM c1 LEFT JOIN m2 USING (cell)),
         af AS (SELECT id, cell, sim FROM (
                  SELECT e.id, c2.cell,
                         list_cosine_similarity(e.v, c2.cen) AS sim,
                         row_number() OVER (PARTITION BY e.id
                           ORDER BY list_cosine_similarity(e.v, c2.cen)
                             DESC, c2.cell ASC) AS rn
                  FROM e CROSS JOIN c2) WHERE rn = 1),
         r AS (SELECT id, cell, sim,
                      row_number() OVER (PARTITION BY cell
                        ORDER BY sim DESC, id ASC) AS rk,
                      count(*) OVER (PARTITION BY cell) AS n
               FROM af)
         SELECT id AS vec_id, CAST(cell AS BIGINT) AS cluster,
                round(sim, 6) AS sim, CAST(rk AS BIGINT) AS rk
         FROM r WHERE rk > CAST(floor(n * 0.25) AS BIGINT)
         ORDER BY vec_id""",
    "q81_redact_pii" ->
      """WITH d AS (SELECT doc_id,
                text || ' contact u' || doc_id || '@ex' || (doc_id%7)
                     || '.com or ' || (doc_id%256) || '.0.0.'
                     || (doc_id%200) || ' ssn '
                     || lpad(CAST(100+doc_id%900 AS VARCHAR),3,'0')
                     || '-' || lpad(CAST(doc_id%100 AS VARCHAR),2,'0')
                     || '-' || lpad(CAST(doc_id%10000 AS VARCHAR),4,'0')
                  AS text
              FROM documents)
         SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
             AS BIGINT) AS n_ip,
           CAST(len(regexp_extract_all(text,
             '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssn
         FROM d ORDER BY doc_id""",
    "q82_chunk_docs" ->
      """WITH d AS (SELECT doc_id,
                string_split_regex(trim(lower(text)), '\s+') AS toks
              FROM documents),
         s AS (SELECT doc_id, toks, len(toks) AS n,
                      unnest(generate_series(0, len(toks)-1, 20))
                        AS start
               FROM d WHERE len(toks) > 0)
         SELECT doc_id, CAST(start//20 AS BIGINT) AS chunk_id,
                CAST(least(start+25, n) - start AS BIGINT)
                  AS n_chunk_tokens,
                array_to_string(toks[start+1 : least(start+25, n)], ' ')
                  AS chunk_text
         FROM s ORDER BY doc_id, chunk_id""",
    "q83_cluster_outliers" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
                    FROM embeddings),
         c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell,
                       v AS cen
                FROM (SELECT id, v FROM e ORDER BY id LIMIT 8)),
         a1 AS (SELECT id, v, cell FROM (
                  SELECT e.id, e.v, c0.cell,
                         row_number() OVER (PARTITION BY e.id
                           ORDER BY list_cosine_similarity(e.v, c0.cen)
                             DESC, c0.cell ASC) AS rn
                  FROM e CROSS JOIN c0) WHERE rn = 1),
         x1 AS (SELECT cell, i AS dim, v[i] AS val
                FROM (SELECT cell, v,
                        unnest(generate_series(1, len(v))) AS i
                      FROM a1)),
         m1 AS (SELECT cell, list(m ORDER BY dim) AS cen
                FROM (SELECT cell, dim, round(avg(val), 6) AS m
                      FROM x1 GROUP BY cell, dim) GROUP BY cell),
         c1 AS (SELECT c0.cell, COALESCE(m1.cen, c0.cen) AS cen
                FROM c0 LEFT JOIN m1 USING (cell)),
         a2 AS (SELECT id, v, cell FROM (
                  SELECT e.id, e.v, c1.cell,
                         row_number() OVER (PARTITION BY e.id
                           ORDER BY list_cosine_similarity(e.v, c1.cen)
                             DESC, c1.cell ASC) AS rn
                  FROM e CROSS JOIN c1) WHERE rn = 1),
         x2 AS (SELECT cell, i AS dim, v[i] AS val
                FROM (SELECT cell, v,
                        unnest(generate_series(1, len(v))) AS i
                      FROM a2)),
         m2 AS (SELECT cell, list(m ORDER BY dim) AS cen
                FROM (SELECT cell, dim, round(avg(val), 6) AS m
                      FROM x2 GROUP BY cell, dim) GROUP BY cell),
         c2 AS (SELECT c1.cell, COALESCE(m2.cen, c1.cen) AS cen
                FROM c1 LEFT JOIN m2 USING (cell)),
         af AS (SELECT id, cell, sim FROM (
                  SELECT e.id, c2.cell,
                         list_cosine_similarity(e.v, c2.cen) AS sim,
                         row_number() OVER (PARTITION BY e.id
                           ORDER BY list_cosine_similarity(e.v, c2.cen)
                             DESC, c2.cell ASC) AS rn
                  FROM e CROSS JOIN c2) WHERE rn = 1),
         r AS (SELECT id, cell, round(sim, 6) AS sim FROM af),
         st AS (SELECT cell, avg(sim) AS mu, stddev_samp(sim) AS sd
                FROM r GROUP BY cell)
         SELECT id AS vec_id, CAST(cell AS BIGINT) AS cluster, sim,
                round((sim - mu) / sd, 6) AS z
         FROM r JOIN st USING (cell)
         WHERE round((sim - mu) / sd, 6) < -1.5
         ORDER BY vec_id""",
    "q84_normalize_text" ->
      """WITH d AS (SELECT doc_id,
                text || ' cafe' || chr(769) || '  no' || chr(776)
                     || 'el' || chr(7) || ' end' AS text
              FROM documents)
         SELECT doc_id,
                trim(regexp_replace(regexp_replace(
                  nfc_normalize(text),
                  '[\x00-\x08\x0E-\x1F\x7F-\x9F]', '', 'g'),
                  '\s+', ' ', 'g')) AS text_norm
         FROM d ORDER BY doc_id""",
    "q87_chunk_dedup" ->
      """WITH d AS (SELECT doc_id,
                string_split_regex(trim(lower(text)), '\s+') AS toks
              FROM documents),
         s AS (SELECT doc_id, toks, len(toks) AS n,
                      unnest(generate_series(0, len(toks)-1, 20))
                        AS start
               FROM d WHERE len(toks) > 0),
         c AS (SELECT doc_id, CAST(start//20 AS BIGINT) AS chunk_id,
                array_to_string(toks[start+1 : least(start+25, n)], ' ')
                  AS chunk_text
               FROM s),
         r AS (SELECT doc_id, chunk_id, chunk_text,
                row_number() OVER (PARTITION BY chunk_text
                  ORDER BY doc_id, chunk_id) AS rn,
                count(*) OVER (PARTITION BY chunk_text) AS nc
               FROM c)
         SELECT doc_id, chunk_id, CAST(nc AS BIGINT) AS n_copies,
                chunk_text
         FROM r WHERE rn = 1 ORDER BY doc_id, chunk_id""",
    // q90: the vocabulary is the top-500 tokens by (count desc, token
    // asc) — a total order, so both engines derive the same set
    "q90_vocab_oov" ->
      """WITH toks AS (SELECT doc_id,
                unnest(string_split_regex(trim(lower(text)), '\s+'))
                  AS tok
              FROM documents),
         toks2 AS (SELECT * FROM toks WHERE tok <> ''),
         vocab AS (SELECT tok FROM toks2 GROUP BY tok
                   ORDER BY count(*) DESC, tok ASC LIMIT 500),
         sc AS (SELECT t.doc_id, count(*) AS n_tokens,
                  count(*) FILTER (WHERE v.tok IS NULL) AS n_oov
                FROM toks2 t LEFT JOIN vocab v USING (tok)
                GROUP BY 1)
         SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                CAST(n_oov AS BIGINT) AS n_oov,
                round(n_oov * 1.0 / n_tokens, 6) AS oov_rate
         FROM sc ORDER BY doc_id""",
    // q93: bigrams via lateral unnest(range) over the token array —
    // the same adjacency the Spark side takes from array slicing; the
    // smoothed conditional MLE is replayed exactly, V = distinct
    // tokens corpus-wide
    "q93_bigram_logprob" ->
      """WITH d AS (SELECT doc_id,
                string_split_regex(trim(lower(text)), '\s+') AS a
              FROM documents),
         bi AS (SELECT doc_id, a[i] AS w1, a[i + 1] AS w2
                FROM d, unnest(range(1, len(a))) AS t(i)
                WHERE len(a) >= 2),
         uni AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
         bif AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
         v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS vn
               FROM (SELECT unnest(a) AS tok FROM d)
               WHERE tok <> ''),
         sc AS (SELECT b.doc_id, count(*) AS n_bigrams,
                  avg(-log2((f.c2 + 0.5) / (u.c1 + v.vn * 0.5)))
                    AS bits
                FROM bi b
                JOIN bif f USING (w1, w2)
                JOIN uni u USING (w1)
                CROSS JOIN v
                GROUP BY 1)
         SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
                round(bits, 6) AS bits_per_bigram
         FROM sc ORDER BY doc_id""",
    // q97: the sign matrix is re-derived from md5 in SQL — first hex
    // digit of md5('rp_<j>_<i>') in 0–7 ⇒ +1 — so the oracle replays
    // the exact projection, not an approximation of it
    "q97_random_projection" ->
      """SELECT vec_id, j,
                round(sum(CAST(embedding[i + 1] AS DOUBLE) *
                  CASE WHEN substring(md5('rp_' || j || '_' || i), 1, 1)
                         BETWEEN '0' AND '7'
                       THEN 1.0 ELSE -1.0 END) / sqrt(8.0), 6) AS proj
         FROM embeddings,
              unnest(range(0, 8)) AS tj(j),
              unnest(range(0, len(embedding))) AS ti(i)
         GROUP BY vec_id, j ORDER BY vec_id, j""",
    // q99: the deterministic top token is max over (count, token)
    // pairs — count desc, token desc on ties — replayed as a
    // row_number with the same order
    "q99_lexical_stats" ->
      """WITH tc AS (SELECT source, tok, count(*) AS c
              FROM (SELECT source,
                      unnest(string_split_regex(trim(lower(text)),
                        '\s+')) AS tok
                    FROM documents)
              WHERE tok <> '' GROUP BY 1, 2),
         tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                   count(*) AS n_types
                 FROM tc GROUP BY 1),
         top AS (SELECT source, tok, c,
                   row_number() OVER (PARTITION BY source
                     ORDER BY c DESC, tok DESC) AS rn
                 FROM tc)
         SELECT t.source, t.n_tokens, t.n_types,
                round(t.n_types * 1.0 / t.n_tokens, 6)
                  AS type_token_ratio,
                p.tok AS top_token,
                round(p.c * 1.0 / t.n_tokens, 6) AS top_token_share
         FROM tot t JOIN top p ON t.source = p.source AND p.rn = 1
         ORDER BY t.source""",
    // q103: same planted line construction, the three C4 rules
    // replayed verbatim (word count, terminal punct + optional
    // closing quote, case-insensitive blacklist), ordered reassembly
    "q103_line_filter" ->
      """WITH corpus AS (SELECT doc_id,
                replace(text, ' table ', '.' || chr(10)) AS text
              FROM documents),
         la AS (SELECT doc_id, string_split(text, chr(10)) AS ls
                FROM corpus),
         ln AS (SELECT doc_id, i AS p, ls[i] AS line
                FROM (SELECT doc_id, ls,
                        unnest(generate_series(1, len(ls))) AS i
                      FROM la)),
         kept AS (SELECT doc_id, p, line FROM ln
                  WHERE len(regexp_extract_all(trim(line), '\S+')) >= 3
                    AND regexp_matches(trim(line), '[.!?]["'']?$')
                    AND NOT contains(lower(line), 'window')),
         agg AS (SELECT doc_id, count(*) AS n_kept,
                   string_agg(line, chr(10) ORDER BY p) AS text_clean
                 FROM kept GROUP BY 1)
         SELECT la.doc_id, CAST(len(la.ls) AS BIGINT) AS n_lines,
                CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
                coalesce(agg.text_clean, '') AS text_clean
         FROM la LEFT JOIN agg USING (doc_id) ORDER BY la.doc_id""",
    // q106: the same planted-fragment corpus, ALL-PAIRS exact
    // containment over distinct word 3-grams — directional (a's gram
    // set divided by a's size)
    "q106_containment" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 20000,
                  array_to_string(
                    regexp_split_to_array(trim(lower(text)),
                      '\s+')[1:15], ' ')
           FROM documents WHERE doc_id < 100),
         toks AS (SELECT doc_id,
                regexp_split_to_array(trim(lower(text)), '\s+') AS t
              FROM corpus),
         pos AS (SELECT doc_id, t,
                unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i
              FROM toks),
         g AS (SELECT DISTINCT doc_id,
                 array_to_string(t[i:i+2], ' ') AS gram
               FROM pos),
         sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS ix
                   FROM g a JOIN g b
                     ON a.gram = b.gram AND a.doc_id <> b.doc_id
                   GROUP BY 1, 2)
         SELECT id_a, id_b,
                round(ix * 1.0 / sa.n, 6) AS containment
         FROM inter
         JOIN sizes sa ON sa.doc_id = id_a
         WHERE ix * 1.0 / sa.n >= 0.8
         ORDER BY id_a, id_b""")
}

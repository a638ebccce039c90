package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.CorpusStats

/** Corpus-level diagnostics (round 6): the [[graft.llm.CorpusStats]]
  * operators exercised end-to-end on the documents table, each with a
  * DuckDB oracle. Same determinism conventions as [[QueriesLlm]]
  * (integer inputs to every float op where possible, round(…, 6) on
  * both sides, total ORDER BY).
  */
object QueriesCorpus {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(spark, dir, name)

  /** q109 — space-saving heavy-hitter tokens. Capacity 2¹⁶ exceeds
    * every partition's distinct-token count at test scale, so the
    * sketch is provably exact (no counter evicted ⇒ est = true count,
    * err = 0 — see [[CorpusStats.heavyHitterTokens]]) and the oracle
    * is plain exact SQL top-k; the approximate regime's bound
    * invariants are property-tested in CorpusStatsSpec.
    */
  def q109HeavyHitters(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.heavyHitterTokens(t(spark, dir, "documents"), "text",
        k = 50, capacity = 1 << 16, mergeGroups = 8)
      .orderBy("rk")

  /** q110 — cross-source char-4-gram overlap matrix (the corpus-level
    * contamination diagnostic). */
  def q110SourceOverlap(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.sourceOverlapMatrix(t(spark, dir, "documents"),
        "source", "text", n = 4)
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        col("n_common"), round(col("jaccard"), 6).as("jaccard"),
        round(col("containment"), 6).as("containment"))
      .orderBy("group_a", "group_b")

  /** q111 — per-document character entropy. abs() squashes the −0.0 a
    * single-distinct-character document would produce (−1·log₂1), so
    * both engines hash the same bits. */
  def q111CharEntropy(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.charEntropy(t(spark, dir, "documents"), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_chars_text"),
        round(abs(col("char_entropy")), 6).as("char_entropy"))
      .orderBy("doc_id")

  /** q112 — per-source Zipf rank-frequency slope. */
  def q112ZipfSlope(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.zipfSlope(t(spark, dir, "documents"), "source", "text")
      .select(col("grp").as("source"),
        round(col("zipf_slope"), 6).as("zipf_slope"),
        col("n_types"), col("n_tokens"))
      .orderBy("source")

  /** q113 — top-100 adjacent-token PMI collocations (count ≥ 5). */
  def q113PmiBigrams(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.pmiCollocations(t(spark, dir, "documents"), "text",
        minCount = 5, k = 100)
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        round(col("pmi"), 6).as("pmi"), col("rk"))
      .orderBy("rk")

  /** q114 — the streaming windowed heavy hitter's BATCH path (the
    * same flatMapGroupsWithState code, fresh state, one pass). With
    * capacity ≫ the 5 event types the counters are provably exact,
    * so plain per-window top-3 SQL is the oracle; the stream==batch
    * convergence is StreamingSpec's half of the pin.
    */
  def q114WindowedHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.Streaming.windowedHeavyHitters(
        t(spark, dir, "events"), "ts", "event_type", "1 hour", k = 3)
      .toDF()
      .select(col("window_start").cast("string").as("window_start"),
        col("token"), col("est"), col("err"),
        col("rk").cast("long").as("rk"))
      .orderBy("window_start", "rk")

  /** q115 — per-source exact duplication rate over the q30-style
    * constructed corpus (documents ∪ re-keyed copies of the first 100
    * docs): which sources carry the duplicate mass.
    */
  def q115DupRateBySource(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val corpus = docs.select("source", "text").unionByName(
      docs.filter(col("doc_id") < 100).select("source", "text"))
    graft.llm.Dedup.exactDupStatsByGroup(corpus, "source", "text")
      .select(col("grp").as("source"), col("n_total"), col("n_unique"),
        col("n_dup_groups"), col("n_removed"), col("dup_rate"))
      .orderBy("source")
  }

  /** q116 — the Good–Turing count-of-counts table over the corpus
    * vocabulary. */
  def q116FreqOfFreqs(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.freqOfFreqs(t(spark, dir, "documents"), "text")
      .select(col("cnt"), col("n_types"), col("mass"),
        round(col("mass_share"), 6).as("mass_share"))
      .orderBy("cnt")

  /** q117 — decile tiers of document length with exact interpolated
    * bounds (the `exactQuantiles` selection primitive composed into
    * a curation dashboard row). */
  def q117QuantileTiers(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.quantileTiers(
        t(spark, dir, "documents").select("n_chars"), "n_chars")
      .select(col("tier"), col("n_rows"), col("v_min"), col("v_max"),
        round(col("v_avg"), 6).as("v_avg"))
      .orderBy("tier")

  /** q127 — per-source KL divergence from the corpus token
    * distribution (md5-bucketed, add-1 smoothed, exact over the full
    * bucket space incl. the closed-form never-observed term) — the
    * source-drift triage dashboard.
    */
  def q127SourceDivergence(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.sourceDivergence(t(spark, dir, "documents"),
        "source", "text", numBuckets = 1000, smoothing = 1.0)
      .select(col("source"), col("n_tokens"),
        round(col("kl_nats"), 6).as("kl_nats"))
      .orderBy("source")

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q127_source_divergence" -> (q127SourceDivergence _),
    "q109_heavy_hitters" -> (q109HeavyHitters _),
    "q110_source_overlap" -> (q110SourceOverlap _),
    "q111_char_entropy" -> (q111CharEntropy _),
    "q112_zipf_slope" -> (q112ZipfSlope _),
    "q113_pmi_bigrams" -> (q113PmiBigrams _),
    "q114_windowed_heavy_hitters" -> (q114WindowedHeavyHitters _),
    "q115_dup_rate_by_source" -> (q115DupRateBySource _),
    "q116_freq_of_freqs" -> (q116FreqOfFreqs _),
    "q117_quantile_tiers" -> (q117QuantileTiers _))

  val oracles: Map[String, String] = Map(
    // q127: md5-bucket (q47 convention) token models; KL over the
    // corpus-observed bucket grid plus the closed-form term for the
    // (numBuckets − observed) never-seen buckets — exact, λ = 1
    "q127_source_divergence" ->
      """WITH toks AS (SELECT source,
                unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                  AS tok
              FROM documents),
         bk AS (SELECT source,
                  ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1000 AS b
                FROM toks),
         gb AS (SELECT source, b, count(*) AS cg FROM bk GROUP BY 1, 2),
         cb AS (SELECT b, count(*) AS cc FROM bk GROUP BY 1),
         gt AS (SELECT source, CAST(sum(cg) AS BIGINT) AS ng
                FROM gb GROUP BY 1),
         ct AS (SELECT CAST(sum(cc) AS BIGINT) AS nc,
                       count(*) AS nb FROM cb),
         grid AS (SELECT gt.source, gt.ng, cb.b, cb.cc,
                    coalesce(gb.cg, 0) AS cg
                  FROM gt CROSS JOIN cb
                  LEFT JOIN gb ON gb.source = gt.source
                    AND gb.b = cb.b),
         obs AS (SELECT g.source, min(g.ng) AS n_tokens,
                   sum(((g.cg + 1.0) / (g.ng + 1000.0)) *
                     ln(((g.cg + 1.0) / (g.ng + 1000.0)) /
                        ((g.cc + 1.0) / (c.nc + 1000.0)))) AS klo
                 FROM grid g CROSS JOIN ct c GROUP BY 1)
         SELECT o.source, o.n_tokens,
                round(o.klo + (1000 - c.nb) *
                  (1.0 / (o.n_tokens + 1000.0)) *
                  ln((1.0 / (o.n_tokens + 1000.0)) /
                     (1.0 / (c.nc + 1000.0))), 6) AS kl_nats
         FROM obs o CROSS JOIN ct c ORDER BY o.source""",
    "q109_heavy_hitters" ->
      """WITH d AS (SELECT
                regexp_split_to_array(trim(lower(text)), '\s+') AS t
              FROM documents),
         tok AS (SELECT unnest(t) AS token FROM d),
         c AS (SELECT token, count(*) AS est FROM tok GROUP BY 1),
         r AS (SELECT token, est, CAST(0 AS BIGINT) AS err,
                 row_number() OVER (ORDER BY est DESC, token) AS rk
               FROM c)
         SELECT token, est, err, CAST(rk AS BIGINT) AS rk
         FROM r WHERE rk <= 50 ORDER BY rk""",
    // q110 mirrors q31's shingle construction, grouped by source
    "q110_source_overlap" ->
      """WITH pos AS (SELECT source, text,
                unnest(generate_series(1, greatest(length(text) - 3, 1))) AS i
              FROM documents),
         sh AS (SELECT DISTINCT source, substr(lower(text), i::INT, 4) AS g
                FROM pos),
         sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.source AS group_a, b.source AS group_b,
                     count(*) AS n_common
                   FROM sh a JOIN sh b
                     ON a.g = b.g AND a.source < b.source
                   GROUP BY 1, 2)
         SELECT group_a, group_b, sa.n AS n_a, sb.n AS n_b, n_common,
                round(n_common * 1.0 / (sa.n + sb.n - n_common), 6)
                  AS jaccard,
                round(n_common * 1.0 / least(sa.n, sb.n), 6)
                  AS containment
         FROM inter
         JOIN sizes sa ON sa.source = group_a
         JOIN sizes sb ON sb.source = group_b
         ORDER BY group_a, group_b""",
    // q111: DuckDB's entropy() is log2-based Shannon entropy over the
    // unnested character multiset — the same -Σ p·log₂p the engine
    // computes; round(6) absorbs summation-order ulps
    "q111_char_entropy" ->
      """WITH c AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
                    FROM documents)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chars_text,
                round(abs(entropy(ch)), 6) AS char_entropy
         FROM c GROUP BY doc_id ORDER BY doc_id""",
    "q112_zipf_slope" ->
      """WITH d AS (SELECT source,
                regexp_split_to_array(trim(lower(text)), '\s+') AS t
              FROM documents),
         tok AS (SELECT source, unnest(t) AS tok FROM d),
         f AS (SELECT source, tok, count(*) AS cnt
               FROM tok GROUP BY 1, 2),
         r AS (SELECT source, cnt, row_number() OVER (
                 PARTITION BY source ORDER BY cnt DESC, tok) AS rk
               FROM f)
         SELECT source, round(regr_slope(ln(cnt), ln(rk)), 6)
                  AS zipf_slope,
                count(*) AS n_types, CAST(sum(cnt) AS BIGINT) AS n_tokens
         FROM r GROUP BY source ORDER BY source""",
    // q113: every input to the final ln is an exact integer count, so
    // the score reproduces bit-for-bit from the counts on both engines
    "q113_pmi_bigrams" ->
      """WITH d AS (SELECT
                regexp_split_to_array(trim(lower(text)), '\s+') AS t
              FROM documents),
         bg AS (SELECT t[i] AS a, t[i + 1] AS b
                FROM (SELECT t,
                        unnest(generate_series(1, len(t) - 1)) AS i
                      FROM d)),
         cab AS (SELECT a, b, count(*) AS c_ab FROM bg
                 GROUP BY 1, 2 HAVING count(*) >= 5),
         uni AS (SELECT unnest(t) AS tok FROM d),
         cu AS (SELECT tok, count(*) AS c FROM uni GROUP BY 1),
         tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM cu) AS t_tokens,
                        (SELECT CAST(count(*) AS BIGINT) FROM bg) AS t_bigrams),
         s AS (SELECT cab.a, cab.b, cab.c_ab, ca.c AS c_a, cb.c AS c_b,
                 ln((cab.c_ab * 1.0 / tot.t_bigrams) /
                    ((ca.c * 1.0 / tot.t_tokens) *
                     (cb.c * 1.0 / tot.t_tokens))) AS pmi
               FROM cab
               JOIN cu ca ON ca.tok = cab.a
               JOIN cu cb ON cb.tok = cab.b
               CROSS JOIN tot),
         r AS (SELECT *, row_number() OVER (
                 ORDER BY pmi DESC, a, b) AS rk FROM s)
         SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab,
                CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
                round(pmi, 6) AS pmi, CAST(rk AS BIGINT) AS rk
         FROM r WHERE rk <= 100 ORDER BY rk""",
    // q114: Spark's epoch-aligned 1-hour tumbling window ==
    // date_trunc('hour'); exact regime ⇒ est = count, err = 0
    "q114_windowed_heavy_hitters" ->
      """WITH w AS (SELECT date_trunc('hour', ts) AS ws,
                event_type AS token FROM events),
         c AS (SELECT ws, token, count(*) AS est FROM w GROUP BY 1, 2),
         r AS (SELECT ws, token, est, row_number() OVER (
                 PARTITION BY ws ORDER BY est DESC, token) AS rk
               FROM c)
         SELECT CAST(ws AS VARCHAR) AS window_start, token, est,
                CAST(0 AS BIGINT) AS err, CAST(rk AS BIGINT) AS rk
         FROM r WHERE rk <= 3 ORDER BY window_start, rk""",
    "q115_dup_rate_by_source" ->
      """WITH corpus AS (SELECT source, text FROM documents
           UNION ALL
           SELECT source, text FROM documents WHERE doc_id < 100),
         g AS (SELECT source AS grp, md5(text) AS h, count(*) AS cnt
               FROM corpus GROUP BY 1, 2)
         SELECT grp AS source, CAST(sum(cnt) AS BIGINT) AS n_total,
                count(*) AS n_unique,
                CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_dup_groups,
                CAST(sum(cnt) - count(*) AS BIGINT) AS n_removed,
                round((sum(cnt) - count(*)) * 1.0 / sum(cnt), 6)
                  AS dup_rate
         FROM g GROUP BY grp ORDER BY grp""",
    "q116_freq_of_freqs" ->
      """WITH d AS (SELECT
                regexp_split_to_array(trim(lower(text)), '\s+') AS t
              FROM documents),
         tok AS (SELECT unnest(t) AS tok FROM d),
         f AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM f)
         SELECT f.c AS cnt, count(*) AS n_types,
                CAST(f.c * count(*) AS BIGINT) AS mass,
                round(f.c * count(*) * 1.0 / tot.t, 6) AS mass_share
         FROM f CROSS JOIN tot GROUP BY f.c, tot.t ORDER BY cnt""",
    // q117: bit-equal interpolated bounds (quantile_cont ==
    // exactQuantiles, QuantilesSpec), strictly-below tier rule on
    // both sides; a value on a bound stays in the lower tier
    "q117_quantile_tiers" ->
      """WITH b AS (SELECT quantile_cont(n_chars,
                [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
              FROM documents),
         t AS (SELECT d.n_chars,
                 1 + len(list_filter(b.bs, x -> d.n_chars > x)) AS tier
               FROM documents d CROSS JOIN b)
         SELECT CAST(tier AS BIGINT) AS tier, count(*) AS n_rows,
                min(n_chars) AS v_min, max(n_chars) AS v_max,
                round(avg(n_chars), 6) AS v_avg
         FROM t GROUP BY tier ORDER BY tier""")
}

package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.exceptions._

/** Byte-pair-encoding vocabulary induction over a corpus (Sennrich et
  * al., "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016) — the tokenizer-training step of a training-data
  * pipeline, distributed.
  *
  * The classic algorithm never touches the corpus after one pass: it
  * operates on the WORD-FREQUENCY table (distinct whitespace words +
  * counts — the corpus compressed from tokens to vocabulary), and each
  * merge round needs only pair counts over that table. That is exactly
  * the Spark shape: one explode→groupBy builds the table, and each
  * round is a pair explode + partial-aggregated count + a 1-row
  * argmax; only the winning pair (two strings) ever reaches the
  * driver. At 100 TB the word table is ~10⁸ rows — a small DataFrame —
  * and real tokenizers train on a corpus sample anyway
  * (`TextAnalysis.hashSample` composes upstream for that).
  *
  * Simplifications, documented divergences from production BPE:
  * symbols start as characters with NO end-of-word marker, and merges
  * apply left-to-right non-overlapping. Ties in pair frequency break
  * deterministically: (count desc, left asc, right asc) — identical
  * across runs, engines, and the in-memory reference the property
  * spec replays.
  */
object Bpe {

  /** One left-to-right, non-overlapping merge application — shared by
    * distributed training, segmentation, and the spec's in-memory
    * reference (being literally the same function is what makes the
    * property check meaningful).
    */
  private[graft] def applyMerge(syms: Array[String], a: String,
                              b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Segment one word with the learned merge list (applied in rank
    * order, as in training).
    */
  private[graft] def segmentWord(word: String,
                               merges: Seq[(String, String)]): Array[String] = {
    var syms = word.map(_.toString).toArray
    merges.foreach { case (a, b) =>
      if (syms.length > 1) syms = applyMerge(syms, a, b)
    }
    syms
  }

  /** Learn `numMerges` BPE merges from the corpus. Returns the merge
    * list in rank order — driver-sized by nature (the vocabulary is
    * the model), like the k-means centroids and PQ codebooks.
    *
    * Each round: explode current symbol sequences into
    * frequency-weighted adjacent pairs, partial-aggregated pair count,
    * 1-row deterministic argmax, compiled merge application. The word
    * table is eagerly `localCheckpoint`ed every round and the previous
    * round's checkpoint blocks released (the dupClusters pattern);
    * stops early when no pair remains.
    *
    * Why checkpoint EVERY round, not persist-rotate: `persist` caches
    * DATA but does not truncate the logical plan, so round N's plan
    * would nest N cached plans — and the per-job explain string the
    * SQL UI generates prints each nested AQE plan twice (initial +
    * final), i.e. ~2^N growth. Measured: a 500-merge train with
    * 32-round rotation OOMs the driver building `explainString`
    * around round ~100; per-round checkpoint keeps the plan a flat
    * scan. The eager checkpoint's materialization job REPLACES the
    * persist-rotation's `count()` job, so the job count per round is
    * unchanged. Checkpoint blocks live outside the CacheManager
    * (plain `unpersist` can't free them), so each round's new blocks
    * are captured by diffing `getPersistentRDDs` and explicitly
    * released when superseded — exactly `Dedup.dupClusters`.
    *
    * Cost model, stated plainly: BPE's argmax is inherently
    * sequential, so training launches two short Spark jobs per merge
    * (argmax + checkpoint). A 32k-merge train is 64k short jobs —
    * fine on a word table (~10⁸ rows at 100 TB), but train on a
    * corpus sample (`TextAnalysis.hashSample` upstream) rather than
    * the full corpus, as real tokenizers do.
    */
  def trainBpeMerges(df: DataFrame, textCol: String,
                     numMerges: Int): Seq[(String, String)] = {
    if (numMerges <= 0)
      throw InvalidArgumentValue(
        s"numMerges must be positive, got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    // tracked-checkpoint machinery (the dupClusters pattern,
    // Dedup.scala): capture the RDD blocks each eager localCheckpoint
    // creates by diffing getPersistentRDDs, so superseded checkpoints
    // can be freed the moment the next one lands
    val sc = spark.sparkContext
    def checkpointTracked[T](ds: org.apache.spark.sql.Dataset[T])
        : (org.apache.spark.sql.Dataset[T],
           Seq[org.apache.spark.rdd.RDD[_]]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = ds.localCheckpoint(true)
      val added = sc.getPersistentRDDs
        .collect { case (id, r) if !before.contains(id) => r }.toSeq
      (out, added)
    }
    var (words, ckptRdds) = checkpointTracked(df
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .map { case (w, cnt) => (w.map(_.toString).toArray, cnt) })

    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var done = false
    var round = 0
    while (round < numMerges && !done) {
      val top = words.flatMap { case (syms, cnt) =>
        (0 until syms.length - 1).iterator
          .map(i => ((syms(i), syms(i + 1)), cnt))
      }.toDF("pair", "cnt")
        .groupBy("pair").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("pair._1").asc, col("pair._2").asc)
        .limit(1)
        .select("pair._1", "pair._2").as[(String, String)]
        .collect().headOption
      top match {
        case None => done = true
        case Some((a, b)) =>
          merges += ((a, b))
          // lineage cut: eager localCheckpoint materializes AND
          // truncates the plan to a flat scan, then the superseded
          // round's checkpoint blocks are freed
          val (cp, added) = checkpointTracked(words.map { case (syms, cnt) =>
            (if (syms.length > 1) applyMerge(syms, a, b) else syms, cnt)
          })
          words = cp
          ckptRdds.foreach(_.unpersist(false))
          ckptRdds = added
      }
      round += 1
    }
    ckptRdds.foreach(_.unpersist(false))
    merges.toList
  }

  /** Exact BPE token count per document under a learned merge list —
    * the honest replacement for `TextAnalysis.approxBpeTokens` once a
    * vocabulary exists. Row-parallel `mapPartitions` with a
    * per-partition word→length memo (Zipf makes the hit rate ~99%);
    * the merge list rides the closure (vocabulary-sized).
    *
    * @return (id, n_bpe_tokens)
    */
  def bpeTokenCount(df: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        split(trim(lower(col(textCol))), "\\s+").as("toks"))
      .as[(Long, Seq[String])]
      .mapPartitions { rows =>
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        rows.map { case (id, toks) =>
          var n = 0L
          toks.foreach { w =>
            if (w.nonEmpty)
              n += memo.getOrElseUpdate(w, segmentWord(w, merges).length)
          }
          (id, n)
        }
      }.toDF("id", "n_bpe_tokens")
  }
}

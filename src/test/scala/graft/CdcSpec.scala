package graft

import org.apache.spark.sql.functions._

import graft.exceptions.InvalidArgumentValue
import graft.llm.TextAnalysis

/** Content-defined chunking: kernel correctness against an
  * independent in-memory reference, structural invariants, and the
  * shift-robustness property that motivates CDC over fixed windows.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  /** Straight-line reference replay of the boundary rule + cut walk
    * (independent code path: java MessageDigest + linear scans).
    */
  private def refChunks(text: String, w: Int, divisor: Int,
                        minT: Int, maxT: Int): Seq[(Int, Int, String)] = {
    val toks = text.trim.toLowerCase.split("\\s+", -1).toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    val bounds = (w to toks.length).filter { i =>
      val hex = md.digest(toks.slice(i - w, i).mkString(" ")
          .getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16) % divisor ==
        divisor - 1
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, String)]
    var start = 1
    while (start <= toks.length) {
      val cands = bounds
        .filter(b => b >= start + minT - 1 && b <= start + maxT - 1)
      val cut = cands.headOption
        .getOrElse(math.min(start + maxT - 1, toks.length))
      val end = math.min(cut, toks.length)
      out += ((start, end - start + 1,
        toks.slice(start - 1, end).mkString(" ")))
      start = end + 1
    }
    out.toSeq
  }

  test("cdcChunkDocuments equals the in-memory reference") {
    val docs = Tables.read(spark, sf, "documents").limit(100)
    val got = TextAnalysis.cdcChunkDocuments(docs, "doc_id", "text",
        windowTokens = 3, divisor = 16, minTokens = 10, maxTokens = 40)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1))
        .map(r => (r.getLong(2).toInt, r.getLong(3).toInt,
          r.getString(4))).toSeq).toMap
    val want = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        refChunks(r.getString(1), 3, 16, 10, 40)).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (id, chunks) =>
      assert(chunks === want(id), s"doc $id chunks diverge")
    }
  }

  test("chunks reassemble the token stream with clamped sizes") {
    val docs = Tables.read(spark, sf, "documents")
    val chunks = TextAnalysis.cdcChunkDocuments(docs, "doc_id",
      "text", minTokens = 10, maxTokens = 40).cache()
    // per doc: ordered chunk texts joined by one space == the
    // tokenized text joined by one space
    // collect_list order is not defined through a hash aggregation —
    // sort the (chunk_id, text) structs after collecting
    val re = chunks.groupBy("id")
      .agg(array_sort(collect_list(struct(col("chunk_id"),
        col("chunk_text")))).as("cs"))
      .select(col("id"), concat_ws(" ",
        transform(col("cs"), s => s.getField("chunk_text")))
        .as("rebuilt"))
    val orig = docs.select(col("doc_id").as("id"),
      concat_ws(" ", split(trim(lower(col("text"))), "\\s+"))
        .as("expect"))
    assert(re.join(orig, "id")
      .filter(col("rebuilt") =!= col("expect")).count() === 0)
    // every chunk ≤ max; every NON-FINAL chunk ≥ min
    assert(chunks.filter(col("n_chunk_tokens") > 40).count() === 0)
    val lastIds = chunks.groupBy("id")
      .agg(max("chunk_id").as("chunk_id"))
    assert(chunks.join(lastIds, Seq("id", "chunk_id"), "left_anti")
      .filter(col("n_chunk_tokens") < 10).count() === 0)
    chunks.unpersist(blocking = false)
  }

  test("CDC chunks survive a prefix shift; fixed windows do not") {
    val docs = Tables.read(spark, sf, "documents")
      .filter(col("n_chars") > 300).limit(50)
      .select("doc_id", "text")
    val shifted = docs.select(col("doc_id"),
      concat(lit("zzz "), col("text")).as("text"))
    def chunkSet(df: org.apache.spark.sql.DataFrame,
                 cdc: Boolean): Set[(Long, String)] = {
      val c =
        if (cdc) TextAnalysis.cdcChunkDocuments(df, "doc_id", "text",
          minTokens = 10, maxTokens = 40)
          .select(col("id"), col("chunk_text"))
        else TextAnalysis.chunkDocuments(df, "doc_id", "text",
          chunkTokens = 25, overlapTokens = 0)
          .select(col("doc_id").as("id"), col("chunk_text"))
      c.distinct().as[(Long, String)].collect().toSet
    }
    val cdcBase = chunkSet(docs, cdc = true)
    val cdcShift = chunkSet(shifted, cdc = true)
    val cdcShared = cdcBase.intersect(cdcShift).size.toDouble /
      cdcBase.size
    val fixBase = chunkSet(docs, cdc = false)
    val fixShift = chunkSet(shifted, cdc = false)
    val fixShared = fixBase.intersect(fixShift).size.toDouble /
      fixBase.size
    // one prepended token re-aligns CDC within the first chunk but
    // desynchronizes EVERY fixed window
    assert(cdcShared > 0.5,
      f"CDC should re-align after a prefix shift: $cdcShared%.2f")
    assert(fixShared < 0.2,
      f"fixed windows should NOT survive the shift: $fixShared%.2f")
    assert(cdcShared > fixShared * 2)
  }

  test("cdcChunkDocuments is deterministic and validates arguments") {
    val docs = Tables.read(spark, sf, "documents").limit(30)
    val a = TextAnalysis.cdcChunkDocuments(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val b = TextAnalysis.cdcChunkDocuments(
        docs.repartition(7), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(a === b)
    intercept[InvalidArgumentValue] {
      TextAnalysis.cdcChunkDocuments(docs, "doc_id", "text",
        windowTokens = 0)
    }
    intercept[InvalidArgumentValue] {
      TextAnalysis.cdcChunkDocuments(docs, "doc_id", "text",
        divisor = 1)
    }
    intercept[InvalidArgumentValue] {
      TextAnalysis.cdcChunkDocuments(docs, "doc_id", "text",
        minTokens = 20, maxTokens = 10)
    }
  }

  test("empty and single-token texts chunk to one clamped chunk") {
    val df = Seq((1L, ""), (2L, "word"), (3L, "  ")).toDF("id", "txt")
    val c = TextAnalysis.cdcChunkDocuments(df, "id", "txt")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(c.length === 3)
    c.foreach { case (_, (cid, st, n, _)) =>
      assert(cid === 0L && st === 1L && n === 1L)
    }
  }

  test("null text or id degrades to zero chunks, not an NPE") {
    val df = Seq((java.lang.Long.valueOf(1L), "some words here"),
        (java.lang.Long.valueOf(2L), null),
        (null.asInstanceOf[java.lang.Long], "orphan text"))
      .toDF("id", "txt")
    val c = TextAnalysis.cdcChunkDocuments(df, "id", "txt").collect()
    assert(c.map(_.getLong(0)).toSet === Set(1L),
      "only the well-formed row may produce chunks")
  }
}

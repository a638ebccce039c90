package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Measures the cosineNearDups in-bucket-enumeration ESCAPE the
  * operator's scaladoc (and its round-11 warn) prescribes: on the q35
  * corpus shape (embeddings + 50 planted near-dups at cosine ≳ 0.95),
  * run the default geometry (bands=32, planesPerBand=8) against an
  * escape geometry chosen to hold the recall product at the same
  * threshold-pair miss probability (threshold 0.9 ⇒ default miss
  * (1−p⁸)³² ≈ 1.8e-5 with p = 1−acos(0.9)/π ≈ 0.856; bands=90,
  * planesPerBand=14 gives (1−p¹⁴)⁹⁰ ≈ 1.7e-5) while cutting expected
  * random enumeration by (90/2¹⁴)/(32/2⁸) ≈ 23×. Prints wall seconds,
  * result pair counts, and the symmetric difference of the two pair
  * sets — the escape's contract is "same pairs, less CPU".
  *
  * Usage: runMain graft.tools.CosineEscapeCheck <sfDir>
  */
object CosineEscapeCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/gensf10")
    val spark = GraftSession.builder("graft-cosine-escape", "local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.applyEngineConf(spark)

    val emb = graft.Tables.read(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val corpus = emb.unionByName(
      emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 10000).as("vec_id"),
          transform(col("v"), x => x + 0.05).as("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count()

    def run(bands: Int, planes: Int): (Double, Set[(Long, Long)]) = {
      val t0 = System.nanoTime()
      val r = graft.llm.Similarity.cosineNearDups(
        corpus, "vec_id", "v", threshold = 0.9,
        bands = bands, planesPerBand = planes)
      val pairs = r.select("id_a", "id_b").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val wall = (System.nanoTime() - t0) / 1e9
      r.unpersist(blocking = false)
      (wall, pairs)
    }
    // warm once (codegen/JIT), then measure each geometry
    run(8, 8)
    val (wDef, pDef) = run(32, 8)
    val (wEsc, pEsc) = run(90, 14)
    println(s"""{"sf":"$sfDir","default_wall_sec":${math.rint(wDef * 100) / 100},""" +
      s""""escape_wall_sec":${math.rint(wEsc * 100) / 100},""" +
      s""""default_pairs":${pDef.size},"escape_pairs":${pEsc.size},""" +
      s""""sym_diff":${(pDef -- pEsc).size + (pEsc -- pDef).size}}""")
    spark.stop()
  }
}

package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct alongside.
  *
  * The decode step is a clearly-marked STUB (this environment has no
  * image/audio codecs); everything around it — schema shape,
  * partition-friendly batching via mapPartitions, deterministic
  * feature layout — is the real production plumbing. Swap
  * `FakeDecoder` for a JNI/codec-backed decoder without touching the
  * Spark side.
  */
object Multimodal {

  /** A media row: payload + extracted metadata. */
  case class MediaMeta(mime: String, sizeBytes: Long, sha: String)
  case class MediaRow(id: Long, content: Array[Byte], mime: String)
  case class MediaFeatures(id: Long, sizeBytes: Long,
                           features: Array[Float])

  /** Attach a metadata struct computed from the binary payload —
    * pure column expressions, no decode needed.
    */
  def withMeta(df: DataFrame, idCol: String, binCol: String,
               mime: String): DataFrame =
    df.select(
      col(idCol),
      col(binCol),
      struct(
        lit(mime).as("mime"),
        octet_length(col(binCol)).cast("long").as("size_bytes"),
        md5(col(binCol)).as("sha")).as("meta"))

  /** STUB decoder: a real implementation would hand `bytes` to an
    * image/audio codec. This deterministic fake derives a fixed-size
    * feature vector from the payload bytes so the batching/schema
    * path is testable end-to-end.
    */
  object FakeDecoder {
    val FeatureDim = 8
    def decode(bytes: Array[Byte]): Array[Float] = {
      // ??? real codec goes here — deterministic fake below
      val out = new Array[Float](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        out(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Feature extraction over binary payloads. mapPartitions (not a
    * per-row UDF) so a real decoder can amortize codec/model init
    * once per partition — the Scala analog of a pandas UDF over
    * `mapInPandas` batches.
    */
  def extractFeatures(ds: Dataset[MediaRow])
      (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        MediaFeatures(r.id, r.content.length.toLong,
          FakeDecoder.decode(r.content))
      }
    }
  }
}

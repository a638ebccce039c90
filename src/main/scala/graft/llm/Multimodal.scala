package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct alongside.
  *
  * The image METADATA decode is real: `ImageHeaders` parses PNG, GIF,
  * BMP, and JPEG headers (container signatures + dimension fields,
  * public file-format knowledge) directly from the payload bytes —
  * no codec library, no pixel decode, fail-soft `None` on anything
  * corrupt, truncated, or unrecognized. PIXEL decode is real too:
  * `ImageDecoder` runs the JDK's own codecs (`javax.imageio` ships
  * PNG/GIF/BMP/JPEG readers in every JRE — no external library) and
  * derives per-channel pixel statistics; a learned vision encoder
  * would slot in at the same `mapPartitions` seam without touching
  * the Spark side.
  */
object Multimodal {

  /** A media row: payload + extracted metadata. */
  case class MediaMeta(mime: String, sizeBytes: Long, sha: String)
  case class MediaRow(id: Long, content: Array[Byte], mime: String)
  case class MediaFeatures(id: Long, sizeBytes: Long,
                           features: Option[Array[Float]])

  /** Parsed image header: container format and pixel dimensions. */
  case class ImageInfo(format: String, width: Int, height: Int)

  /** Header-only image metadata extraction — signatures and dimension
    * fields per the public format specs (PNG IHDR, GIF logical screen
    * descriptor, BMP info header, JPEG SOF segment). Everything is
    * bounds-checked; ANY malformed, truncated, or unknown payload
    * returns None rather than throwing — at 100 TB some payloads WILL
    * be garbage and a task failure on row 10^12 is not acceptable.
    */
  object ImageHeaders {

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be16(b: Array[Byte], i: Int): Int =
      (u8(b, i) << 8) | u8(b, i + 1)
    private def le16(b: Array[Byte], i: Int): Int =
      u8(b, i) | (u8(b, i + 1) << 8)
    private def be32(b: Array[Byte], i: Int): Int =
      (u8(b, i) << 24) | (u8(b, i + 1) << 16) |
        (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def le32(b: Array[Byte], i: Int): Int =
      u8(b, i) | (u8(b, i + 1) << 8) |
        (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

    /** PNG: 8-byte signature, then the IHDR chunk (len + "IHDR" +
      * width/height as big-endian int32).
      */
    private def png(b: Array[Byte]): Option[ImageInfo] =
      if (b.length >= 24 &&
        u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b, 4) == 0x0d && u8(b, 5) == 0x0a &&
        u8(b, 6) == 0x1a && u8(b, 7) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val w = be32(b, 16); val h = be32(b, 20)
        if (w > 0 && h > 0) Some(ImageInfo("png", w, h)) else None
      } else None

    /** GIF87a/GIF89a: logical screen width/height, little-endian
      * uint16 at offset 6.
      */
    private def gif(b: Array[Byte]): Option[ImageInfo] =
      if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
        val w = le16(b, 6); val h = le16(b, 8)
        if (w > 0 && h > 0) Some(ImageInfo("gif", w, h)) else None
      } else None

    /** BMP: "BM" file header, then an info header whose first field is
      * its own size — 40+ (BITMAPINFOHEADER, int32 dims; height may be
      * negative for top-down rows) or 12 (BITMAPCOREHEADER, uint16).
      */
    private def bmp(b: Array[Byte]): Option[ImageInfo] =
      if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
        val hdr = le32(b, 14)
        if (hdr >= 40 && b.length >= 26) {
          val w = le32(b, 18); val h = math.abs(le32(b, 22))
          if (w > 0 && h > 0) Some(ImageInfo("bmp", w, h)) else None
        } else if (hdr == 12 && b.length >= 22) {
          val w = le16(b, 18); val h = le16(b, 20)
          if (w > 0 && h > 0) Some(ImageInfo("bmp", w, h)) else None
        } else None
      } else None

    /** JPEG: FF D8 start-of-image, then marker segments; dimensions
      * live in the first SOFn frame header (markers C0–CF excluding
      * C4/C8/CC): [len][precision][height be16][width be16].
      */
    private def jpeg(b: Array[Byte]): Option[ImageInfo] = {
      if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return None // marker desync = corrupt
        var marker = u8(b, i + 1)
        // fill bytes: FF can repeat before the marker id
        while (marker == 0xff && i + 2 < b.length) {
          i += 1; marker = u8(b, i + 1)
        }
        if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS first
        if (marker >= 0xd0 && marker <= 0xd7) { i += 2 } // RSTn: no length
        else {
          if (i + 3 >= b.length) return None
          val len = be16(b, i + 2)
          if (len < 2) return None
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (i + 8 >= b.length) return None
            val h = be16(b, i + 5); val w = be16(b, i + 7)
            return if (w > 0 && h > 0) Some(ImageInfo("jpeg", w, h))
            else None
          }
          i += 2 + len
        }
      }
      None
    }

    /** Parse any supported container; None for everything else. Never
      * throws.
      */
    def parse(bytes: Array[Byte]): Option[ImageInfo] =
      if (bytes == null) None
      else
        try png(bytes).orElse(gif(bytes)).orElse(bmp(bytes))
          .orElse(jpeg(bytes))
        catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Parsed audio header: container, channel layout, rate, depth,
    * and playback duration where the header carries enough to derive
    * it.
    */
  case class AudioInfo(format: String, channels: Int, sampleRate: Int,
                       bitsPerSample: Int, durationMs: Option[Long])

  /** Header-only audio metadata extraction — WAV (RIFF fmt/data
    * chunks) and FLAC (STREAMINFO block), both public format specs.
    * Same fail-soft contract as `ImageHeaders`: any malformed,
    * truncated, or unknown payload is None, never a task failure.
    */
  object AudioHeaders {

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def le16(b: Array[Byte], i: Int): Int =
      u8(b, i) | (u8(b, i + 1) << 8)
    private def le32(b: Array[Byte], i: Int): Long =
      (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
        (u8(b, i + 3).toLong << 24)) & 0xffffffffL
    private def tag(b: Array[Byte], i: Int, s: String): Boolean =
      b.length >= i + 4 && b(i) == s(0) && b(i + 1) == s(1) &&
        b(i + 2) == s(2) && b(i + 3) == s(3)

    /** WAV: "RIFF"…"WAVE", then [id][size le32][payload] chunks; the
      * "fmt " chunk carries channels/rate/depth, the "data" chunk's
      * size over the byte rate gives the duration.
      */
    private def wav(b: Array[Byte]): Option[AudioInfo] = {
      if (!(tag(b, 0, "RIFF") && tag(b, 8, "WAVE"))) return None
      var i = 12
      var fmt: Option[(Int, Int, Int, Long)] = None // ch, rate, bits, byteRate
      var dataSize: Option[Long] = None
      while (i + 8 <= b.length && (fmt.isEmpty || dataSize.isEmpty)) {
        val size = le32(b, i + 4)
        if (tag(b, i, "fmt ") && i + 24 <= b.length) {
          val ch = le16(b, i + 10)
          val rate = le32(b, i + 12).toInt
          val byteRate = le32(b, i + 16)
          val bits = le16(b, i + 22)
          if (ch > 0 && rate > 0 && bits > 0)
            fmt = Some((ch, rate, bits, byteRate))
          else return None
        } else if (tag(b, i, "data")) dataSize = Some(size)
        // chunks are word-aligned: odd sizes carry a pad byte; a size
        // that runs past the buffer (truncated payload or corrupt
        // field) just ends the walk — whatever was parsed so far
        // stands
        val step = size + (size % 2)
        if (step > b.length.toLong) i = b.length
        else i += 8 + step.toInt
      }
      fmt.map { case (ch, rate, bits, byteRate) =>
        AudioInfo("wav", ch, rate, bits,
          dataSize.filter(_ => byteRate > 0)
            .map(d => d * 1000L / byteRate))
      }
    }

    /** FLAC: "fLaC" then metadata blocks; STREAMINFO (type 0, 34
      * bytes) packs rate (20 bits), channels−1 (3), depth−1 (5), and
      * total samples (36) starting at its byte 10.
      */
    private def flac(b: Array[Byte]): Option[AudioInfo] = {
      if (!tag(b, 0, "fLaC")) return None
      // first block header at 4: [lastFlag|type][len be24]
      if (b.length < 8 || (u8(b, 4) & 0x7f) != 0) return None
      val len = (u8(b, 5) << 16) | (u8(b, 6) << 8) | u8(b, 7)
      if (len < 34 || b.length < 8 + 34) return None
      val o = 8
      val rate = (u8(b, o + 10) << 12) | (u8(b, o + 11) << 4) |
        (u8(b, o + 12) >> 4)
      val channels = ((u8(b, o + 12) >> 1) & 0x7) + 1
      val bits = (((u8(b, o + 12) & 1) << 4) | (u8(b, o + 13) >> 4)) + 1
      val totalSamples = ((u8(b, o + 13) & 0x0f).toLong << 32) |
        ((u8(b, o + 14).toLong << 24) | (u8(b, o + 15) << 16) |
          (u8(b, o + 16) << 8) | u8(b, o + 17))
      if (rate <= 0) return None
      Some(AudioInfo("flac", channels, rate, bits,
        if (totalSamples > 0) Some(totalSamples * 1000L / rate)
        else None))
    }

    /** Parse any supported container; None for everything else. Never
      * throws.
      */
    def parse(bytes: Array[Byte]): Option[AudioInfo] =
      if (bytes == null) None
      else
        try wav(bytes).orElse(flac(bytes))
        catch { case scala.util.control.NonFatal(_) => None }
  }

  // NOT private — same Janino-encoder constraint as ImageMetaRow.
  case class AudioMetaRow(id: Long, audio_format: Option[String],
                          audio_channels: Option[Int],
                          sample_rate: Option[Int],
                          bits_per_sample: Option[Int],
                          duration_ms: Option[Long])

  /** Audio metadata columns decoded from the payload header — the
    * audio twin of `withImageMeta`, same fail-soft null row and
    * mapPartitions batching seam.
    */
  def withAudioMeta(df: DataFrame, idCol: String,
                    binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          AudioHeaders.parse(bytes) match {
            case Some(a) => AudioMetaRow(id, Some(a.format),
              Some(a.channels), Some(a.sampleRate),
              Some(a.bitsPerSample), a.durationMs)
            case None => AudioMetaRow(id, None, None, None, None, None)
          }
        }
      }.toDF()
  }

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

  // NOT private: Spark's generated encoder code (Janino) must call the
  // accessors; a private nested case class forces a per-query codegen
  // compile failure + interpreted-serializer fallback.
  case class ImageMetaRow(id: Long, image_format: Option[String],
                          image_width: Option[Int],
                          image_height: Option[Int])

  /** Image metadata columns decoded from the payload header:
    * (id, image_format, image_width, image_height), all three null
    * when the payload is not a recognizable PNG/GIF/BMP/JPEG — the
    * fail-soft row, never a task failure. mapPartitions (the module's
    * batching seam), payload column pruned after parsing so only the
    * narrow metadata frame flows on.
    */
  def withImageMeta(df: DataFrame, idCol: String,
                    binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          ImageHeaders.parse(bytes) match {
            case Some(info) => ImageMetaRow(id, Some(info.format),
              Some(info.width), Some(info.height))
            case None => ImageMetaRow(id, None, None, None)
          }
        }
      }.toDF()
  }

  /** Real pixel decoder backed by the JDK's own codecs
    * (`javax.imageio` — PNG/GIF/BMP/JPEG readers ship in every JRE,
    * no external library, zero egress): decodes the payload and
    * derives a fixed-layout feature vector
    *   [width, height, meanR, meanG, meanB, stdR, stdG, stdB]
    * with means/stddevs over pixel channel values normalized to
    * [0, 1]. Fail-soft `None` on any unrecognized container, corrupt
    * stream, or codec failure — at 100 TB some payloads WILL be
    * garbage and a task failure on row 10^12 is not acceptable.
    */
  object ImageDecoder {
    val FeatureDim = 8
    // no temp-file stream cache inside executor tasks — decode from
    // the in-memory payload only
    javax.imageio.ImageIO.setUseCache(false)
    def decode(bytes: Array[Byte]): Option[Array[Float]] = {
      if (bytes == null || bytes.length == 0) return None
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val sum = new Array[Double](3)
          val sumSq = new Array[Double](3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y) // sRGB regardless of storage model
              var c = 0
              while (c < 3) {
                val v = ((rgb >> (16 - 8 * c)) & 0xff) / 255.0
                sum(c) += v
                sumSq(c) += v * v
                c += 1
              }
              x += 1
            }
            y += 1
          }
          val n = w.toDouble * h
          val out = new Array[Float](FeatureDim)
          out(0) = w.toFloat
          out(1) = h.toFloat
          var c = 0
          while (c < 3) {
            val m = sum(c) / n
            out(2 + c) = m.toFloat
            out(5 + c) =
              math.sqrt(math.max(0.0, sumSq(c) / n - m * m)).toFloat
            c += 1
          }
          Some(out)
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Feature extraction over binary payloads: real decoded-pixel
    * statistics per image (`ImageDecoder`), `features` null for
    * payloads that don't decode (size still reported — the row is
    * not lost). mapPartitions (not a per-row UDF) so a heavier
    * decoder or learned encoder can amortize init once per
    * partition — the Scala analog of a pandas UDF over `mapInPandas`
    * batches.
    */
  def extractFeatures(ds: Dataset[MediaRow])
      (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { rows =>
      // per-partition init for a heavier decoder would go here
      rows.map { r =>
        val size = if (r.content == null) 0L else r.content.length.toLong
        MediaFeatures(r.id, size, ImageDecoder.decode(r.content))
      }
    }
  }
}

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

  /** Real audio sample decode — 16-bit PCM WAV, the one mainstream
    * audio container whose samples are readable with zero codec deps
    * (RIFF chunk walk + little-endian int16 normalization; public
    * format knowledge). Derives a fixed-layout feature vector
    *   [channels, sampleRate, nFrames, rms, peak, dcOffset]
    * over all channels' samples normalized to [−1, 1]. Compressed
    * formats (FLAC frames, MP3, …) need a codec — they fail soft to
    * None here exactly like garbage does, and a real decoder slots in
    * at the same seam.
    */
  object AudioDecoder {
    val FeatureDim = 6
    // KSDATAFORMAT_SUBTYPE_PCM = 00000001-0000-0010-8000-00AA00389B71;
    // the leading 2 bytes are the le16 format code (1 = PCM, checked
    // separately below); this is the fixed 14-byte remainder
    private val PcmGuidTail: Array[Byte] = Array(0x00, 0x00, 0x00, 0x00,
      0x10, 0x00, 0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71)
      .map(_.toByte)
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def le16s(b: Array[Byte], i: Int): Int =
      ((u8(b, i) | (u8(b, i + 1) << 8)) << 16) >> 16 // sign-extended
    private def le16(b: Array[Byte], i: Int): Int =
      u8(b, i) | (u8(b, i + 1) << 8)
    private def le32(b: Array[Byte], i: Int): Long =
      (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
        (u8(b, i + 3).toLong << 24)) & 0xffffffffL
    private def tag(b: Array[Byte], i: Int, s: String): Boolean =
      b.length >= i + 4 && b(i) == s(0) && b(i + 1) == s(1) &&
        b(i + 2) == s(2) && b(i + 3) == s(3)

    def decode(bytes: Array[Byte]): Option[Array[Float]] = {
      if (bytes == null || bytes.length < 44) return None
      try {
        val b = bytes
        if (!(tag(b, 0, "RIFF") && tag(b, 8, "WAVE"))) return None
        var i = 12
        var fmt: Option[(Int, Int, Int)] = None // ch, rate, bits
        var data: Option[(Int, Int)] = None // offset, size
        while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
          val size = le32(b, i + 4)
          if (tag(b, i, "fmt ") && i + 24 <= b.length) {
            // format tag 1 = integer PCM. Tag 0xFFFE is
            // WAVE_FORMAT_EXTENSIBLE (common for multi-channel
            // files): the REAL format is the SubFormat GUID in the
            // fmt extension — accept it when that GUID is
            // KSDATAFORMAT_SUBTYPE_PCM (format code 1 + the fixed
            // media-subtype GUID tail), since those samples need no
            // codec either. Anything else (compressed formats) does.
            val ftag = le16(b, i + 8)
            val extensiblePcm = ftag == 0xFFFE && size >= 40 &&
              i + 48 <= b.length && le16(b, i + 32) == 1 &&
              PcmGuidTail.indices.forall(j =>
                b(i + 34 + j) == PcmGuidTail(j))
            if (ftag != 1 && !extensiblePcm) return None
            fmt = Some((le16(b, i + 10), le32(b, i + 12).toInt,
              le16(b, i + 22)))
          } else if (tag(b, i, "data")) {
            val avail = math.min(size, (b.length - i - 8).toLong).toInt
            data = Some((i + 8, avail))
          }
          val step = size + (size % 2)
          if (step > b.length.toLong) i = b.length
          else i += 8 + step.toInt
        }
        (fmt, data) match {
          case (Some((ch, rate, bits)), Some((off, len)))
              if ch > 0 && rate > 0 && bits == 16 && len >= 2 =>
            val n = len / 2
            var s = 0; var sum = 0.0; var sumSq = 0.0; var peak = 0.0
            while (s < n) {
              val v = le16s(b, off + 2 * s) / 32768.0
              sum += v; sumSq += v * v
              val a = math.abs(v); if (a > peak) peak = a
              s += 1
            }
            Some(Array(ch.toFloat, rate.toFloat, (n / ch).toFloat,
              math.sqrt(sumSq / n).toFloat, peak.toFloat,
              (sum / n).toFloat))
          case _ => None
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Audio feature extraction over binary payloads: real decoded PCM
    * statistics per clip (`AudioDecoder`), `features` null for
    * payloads that don't decode — the audio analog of
    * `extractFeatures`, same mapPartitions batching seam.
    */
  def extractAudioFeatures(df: DataFrame, idCol: String,
                           binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          MediaFeatures(id,
            if (bytes == null) 0L else bytes.length.toLong,
            AudioDecoder.decode(bytes))
        }
      }.toDF("id", "sizeBytes", "features")
  }

  // NOT private — same Janino-encoder constraint as ImageMetaRow.
  case class ResizedImageRow(id: Long, content: Option[Array[Byte]],
                             width: Option[Int], height: Option[Int])

  /** Real image RESIZE — JDK-only (ImageIO decode → Graphics2D
    * bilinear scale → PNG re-encode; every JRE ships all three, zero
    * external deps): payloads whose pixel dimensions exceed
    * `maxDim` are scaled down aspect-preserving so the longer edge
    * lands at `maxDim`; smaller images pass through UNTOUCHED (bytes
    * identical — no decode/re-encode generation loss on the common
    * path). Fail-soft: an unrecognized/corrupt payload yields a null
    * content row (id kept), never a task failure.
    *
    * Scale shape: one mapPartitions pass, payload in → payload out,
    * no shuffle; the per-partition seam amortizes codec init exactly
    * like `extractFeatures`.
    *
    * @return (id, content, width, height) — post-resize dimensions,
    *   null content/dims when the payload doesn't decode
    */
  def resizeImages(df: DataFrame, idCol: String, binCol: String,
                   maxDim: Int): DataFrame = {
    if (maxDim < 1)
      throw graft.exceptions.InvalidArgumentValue(
        s"maxDim must be >= 1: $maxDim")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // JVM-global and idempotent, set per-partition: without it an
        // executor that never touched ImageDecoder would run ImageIO's
        // default temp-FILE stream cache — disk I/O per image
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          try {
            val img =
              if (bytes == null || bytes.isEmpty) null
              else javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
            if (img == null || img.getWidth <= 0 || img.getHeight <= 0)
              ResizedImageRow(id, None, None, None)
            else if (img.getWidth <= maxDim && img.getHeight <= maxDim)
              ResizedImageRow(id, Some(bytes),
                Some(img.getWidth), Some(img.getHeight))
            else {
              val scale = maxDim.toDouble /
                math.max(img.getWidth, img.getHeight)
              val w = math.max(1, math.round(img.getWidth * scale).toInt)
              val h = math.max(1, math.round(img.getHeight * scale).toInt)
              val out = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, w, h, null)
              } finally g.dispose()
              val buf = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", buf)
              ResizedImageRow(id, Some(buf.toByteArray), Some(w), Some(h))
            }
          } catch {
            case scala.util.control.NonFatal(_) =>
              ResizedImageRow(id, None, None, None)
          }
        }
      }.toDF()
  }

  /** Parsed video container metadata. `usecPerFrame`/`nFrames` come
    * from AVI's MainAVIHeader; MP4 carries duration/timescale instead,
    * so those fields stay None there and `durationMs` is the common
    * denominator.
    */
  case class VideoInfo(format: String, durationMs: Option[Long],
                       nFrames: Option[Long], usecPerFrame: Option[Long],
                       width: Option[Int], height: Option[Int])

  /** Header-only video metadata extraction — AVI (RIFF `avih`
    * MainAVIHeader) and MP4/ISO-BMFF (`moov`→`mvhd` for duration,
    * first `trak`→`tkhd` for display dimensions), both public format
    * specs. Same fail-soft contract as `ImageHeaders`/`AudioHeaders`:
    * any malformed, truncated, or unknown payload is None, never a
    * task failure — at 100 TB some payloads WILL be garbage.
    */
  object VideoHeaders {

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def le32(b: Array[Byte], i: Int): Long =
      (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
        (u8(b, i + 3).toLong << 24)) & 0xffffffffL
    private def be32(b: Array[Byte], i: Int): Long =
      ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
        (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xffffffffL
    private def be64(b: Array[Byte], i: Int): Long =
      (be32(b, i) << 32) | be32(b, i + 4)
    private def tag(b: Array[Byte], i: Int, s: String): Boolean =
      i >= 0 && b.length >= i + 4 && b(i) == s(0) && b(i + 1) == s(1) &&
        b(i + 2) == s(2) && b(i + 3) == s(3)

    /** AVI: "RIFF"[size]"AVI " then the "hdrl" LIST whose first child
      * is the "avih" chunk carrying MainAVIHeader (all little-endian):
      * dwMicroSecPerFrame at payload offset 0, dwTotalFrames at 16,
      * dwWidth/dwHeight at 32/36. The synthesizer below emits exactly
      * this minimal layout; real muxers do too (hdrl is mandated
      * first).
      */
    private def avi(b: Array[Byte]): Option[VideoInfo] = {
      if (!(tag(b, 0, "RIFF") && tag(b, 8, "AVI ") &&
        tag(b, 12, "LIST") && tag(b, 20, "hdrl") &&
        tag(b, 24, "avih"))) return None
      val o = 32 // MainAVIHeader payload ('avih' fourcc + cb size skipped)
      if (b.length < o + 40) return None
      val usec = le32(b, o)
      val frames = le32(b, o + 16)
      val w = le32(b, o + 32)
      val h = le32(b, o + 36)
      if (usec <= 0 || usec > Int.MaxValue) return None
      Some(VideoInfo("avi",
        durationMs = Some(frames * usec / 1000L),
        nFrames = Some(frames),
        usecPerFrame = Some(usec),
        width = if (w > 0 && w <= Int.MaxValue) Some(w.toInt) else None,
        height = if (h > 0 && h <= Int.MaxValue) Some(h.toInt) else None))
    }

    /** Walk ISO-BMFF boxes in [from, until) invoking `f` at each
      * (payloadStart, payloadEnd, fourcc); size==1 means a 64-bit
      * largesize follows the fourcc, size==0 means to-end-of-enclosing.
      * Any nonsense size ends the walk (fail-soft).
      */
    private def walkBoxes(b: Array[Byte], from: Int, until: Int)(
        f: (Int, Int, String) => Unit): Unit = {
      var i = from
      while (i + 8 <= until) {
        val size0 = be32(b, i)
        val cc = new String(b, i + 4, 4, "ISO-8859-1")
        var header = 8
        val size =
          if (size0 == 1L && i + 16 <= until) { header = 16; be64(b, i + 8) }
          else if (size0 == 0L) (until - i).toLong
          else size0
        if (size < header || i + size > until) return
        f(i + header, i + size.toInt, cc)
        i += size.toInt
      }
    }

    /** MP4/ISO-BMFF: requires a leading "ftyp", then reads `mvhd`
      * (version 0 or 1) under `moov` for timescale/duration and the
      * first `trak`→`tkhd` for the 16.16 fixed-point display
      * dimensions (the last 8 bytes of tkhd).
      */
    private def mp4(b: Array[Byte]): Option[VideoInfo] = {
      if (!tag(b, 4, "ftyp")) return None
      var durationMs: Option[Long] = None
      var dims: Option[(Int, Int)] = None
      walkBoxes(b, 0, b.length) { (s, e, cc) =>
        if (cc == "moov") walkBoxes(b, s, e) { (cs, ce, ccc) =>
          if (ccc == "mvhd" && durationMs.isEmpty && ce - cs >= 4) {
            val v = u8(b, cs)
            if (v == 0 && ce - cs >= 20) {
              val ts = be32(b, cs + 12)
              val dur = be32(b, cs + 16)
              if (ts > 0) durationMs = Some(dur * 1000L / ts)
            } else if (v == 1 && ce - cs >= 32) {
              val ts = be32(b, cs + 20)
              val dur = be64(b, cs + 24)
              if (ts > 0 && dur >= 0) durationMs = Some(dur * 1000L / ts)
            }
          } else if (ccc == "trak" && dims.isEmpty)
            walkBoxes(b, cs, ce) { (ts_, te, tcc) =>
              if (tcc == "tkhd" && dims.isEmpty && te - ts_ >= 8) {
                val w = (be32(b, te - 8) >> 16).toInt
                val h = (be32(b, te - 4) >> 16).toInt
                if (w > 0 && h > 0) dims = Some((w, h))
              }
            }
        }
      }
      durationMs.map(d => VideoInfo("mp4", Some(d), None, None,
        dims.map(_._1), dims.map(_._2)))
    }

    /** Parse any supported container; None for everything else. Never
      * throws.
      */
    def parse(bytes: Array[Byte]): Option[VideoInfo] =
      if (bytes == null) None
      else
        try avi(bytes).orElse(mp4(bytes))
        catch { case scala.util.control.NonFatal(_) => None }

    /** Deterministic minimal AVI header (RIFF + hdrl LIST + avih with
      * a full 56-byte MainAVIHeader, no movi payload) — the
      * test/oracle fixture builder: `parse(syntheticAvi(u, n, w, h))`
      * round-trips the four fields exactly, so an oracle that derives
      * (u, n, w, h) arithmetically hash-checks the byte-level parser
      * end-to-end.
      */
    /** Extract the `idx`-th VIDEO-stream chunk payload from an AVI's
      * 'movi' LIST — chunk fourcc `##dc` (compressed frame) or `##db`
      * (uncompressed DIB), `##` the two-digit stream number; audio
      * (`##wb`) and text chunks don't count. Returns the raw codec
      * bytes (for MJPEG: one baseline JPEG per chunk). None when the
      * payload is not an AVI, has no movi list, has fewer video
      * chunks, or any size field is nonsense — never throws.
      */
    def videoFrameChunk(b: Array[Byte], idx: Long): Option[Array[Byte]] = {
      if (b == null || idx < 0 ||
        !(tag(b, 0, "RIFF") && tag(b, 8, "AVI "))) return None
      try {
        def digit(x: Byte): Boolean = x >= '0' && x <= '9'
        val riffEnd = math.min(b.length.toLong, 8 + le32(b, 4)).toInt
        var i = 12
        while (i + 8 <= riffEnd) {
          val size = le32(b, i + 4)
          if (tag(b, i, "LIST") && i + 12 <= riffEnd &&
            tag(b, i + 8, "movi")) {
            val end = math.min(riffEnd.toLong, i + 8 + size).toInt
            var j = i + 12
            var seen = 0L
            while (j + 8 <= end) {
              val csize = le32(b, j + 4)
              val isVideo = digit(b(j)) && digit(b(j + 1)) &&
                b(j + 2) == 'd' && (b(j + 3) == 'c' || b(j + 3) == 'b')
              if (isVideo) {
                if (seen == idx) {
                  if (csize < 0 || j + 8 + csize > end) return None
                  return Some(java.util.Arrays.copyOfRange(
                    b, j + 8, j + 8 + csize.toInt))
                }
                seen += 1
              }
              val step = csize + (csize % 2)
              if (step > end.toLong) return None
              j += 8 + step.toInt
            }
            return None
          }
          val step = size + (size % 2)
          if (step > riffEnd.toLong) return None
          i += 8 + step.toInt
        }
        None
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Deterministic MJPEG-in-AVI synthesizer — `syntheticAvi`'s
      * header plus a 'movi' LIST of '00dc' chunks, one single-component
      * grayscale baseline JPEG (ImageIO-encoded) per entry of
      * `frameGrays`. A UNIFORM gray frame survives the JPEG round trip
      * EXACTLY: the level-shifted DC coefficient 8·(v−128) is always a
      * multiple of the DC quantizer step, every AC coefficient is 0,
      * and grayscale has no chroma conversion — measured across the
      * full 0..255 range, not assumed — so an oracle can derive the
      * decoded pixel stats arithmetically (q141).
      */
    def syntheticMjpegAvi(usecPerFrame: Int, width: Int, height: Int,
                          frameGrays: Seq[Int]): Array[Byte] = {
      if (usecPerFrame <= 0 || width <= 0 || height <= 0)
        throw graft.exceptions.InvalidArgumentValue(
          s"bad MJPEG AVI params: usec=$usecPerFrame ${width}x$height")
      javax.imageio.ImageIO.setUseCache(false)
      val jpegs = frameGrays.map { v =>
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) { raster.setSample(x, y, 0, v); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      val out = new java.io.ByteArrayOutputStream(4096)
      def w32le(v: Long): Unit = {
        out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 24) & 0xff).toInt)
      }
      def fcc(s: String): Unit = s.foreach(c => out.write(c.toInt))
      val avihPayload = 56
      val hdrlSize = 4 + 8 + avihPayload
      val moviSize = 4 + jpegs.map(j => 8 + j.length + (j.length % 2)).sum
      fcc("RIFF"); w32le(4 + (8 + hdrlSize) + (8 + moviSize))
      fcc("AVI "); fcc("LIST"); w32le(hdrlSize); fcc("hdrl")
      fcc("avih"); w32le(avihPayload)
      w32le(usecPerFrame); w32le(0); w32le(0); w32le(0)
      w32le(frameGrays.size) // dwTotalFrames
      w32le(0); w32le(1); w32le(0)
      w32le(width); w32le(height)
      w32le(0); w32le(0); w32le(0); w32le(0)
      fcc("LIST"); w32le(moviSize); fcc("movi")
      jpegs.foreach { j =>
        fcc("00dc"); w32le(j.length); out.write(j, 0, j.length)
        if (j.length % 2 == 1) out.write(0) // RIFF word alignment
      }
      out.toByteArray
    }

    def syntheticAvi(usecPerFrame: Int, totalFrames: Int,
                     width: Int, height: Int): Array[Byte] = {
      if (usecPerFrame <= 0)
        throw graft.exceptions.InvalidArgumentValue(
          s"usecPerFrame must be > 0: $usecPerFrame")
      val out = new java.io.ByteArrayOutputStream(96)
      def w32le(v: Long): Unit = {
        out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 24) & 0xff).toInt)
      }
      def fcc(s: String): Unit = s.foreach(c => out.write(c.toInt))
      val avihPayload = 56 // full MainAVIHeader
      val listSize = 4 + 8 + avihPayload // 'hdrl' + avih chunk
      fcc("RIFF"); w32le(4 + 8 + listSize) // 'AVI ' + LIST chunk
      fcc("AVI "); fcc("LIST"); w32le(listSize); fcc("hdrl")
      fcc("avih"); w32le(avihPayload)
      w32le(usecPerFrame) // dwMicroSecPerFrame
      w32le(0); w32le(0); w32le(0) // maxBytesPerSec, padding, flags
      w32le(totalFrames) // dwTotalFrames
      w32le(0); w32le(1); w32le(0) // initialFrames, streams, bufSize
      w32le(width); w32le(height) // dwWidth, dwHeight
      w32le(0); w32le(0); w32le(0); w32le(0) // dwReserved[4]
      out.toByteArray
    }
  }

  // NOT private — same Janino-encoder constraint as ImageMetaRow.
  case class VideoMetaRow(id: Long, video_format: Option[String],
                          duration_ms: Option[Long],
                          n_frames: Option[Long],
                          width: Option[Int], height: Option[Int])

  /** Video metadata columns decoded from the payload header — the
    * video twin of `withImageMeta`/`withAudioMeta`: same fail-soft
    * null row and mapPartitions batching seam, payload pruned after
    * parsing so only the narrow metadata frame flows on.
    */
  def withVideoMeta(df: DataFrame, idCol: String,
                    binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          VideoHeaders.parse(bytes) match {
            case Some(v) => VideoMetaRow(id, Some(v.format), v.durationMs,
              v.nFrames, v.width, v.height)
            case None => VideoMetaRow(id, None, None, None, None, None)
          }
        }
      }.toDF()
  }

  /** Uniform frame sampling over parseable AVI payloads: for a video
    * with n frames, up to `k` frame indices floor(j·n/k) for
    * j = 0..k−1, deduplicated (k > n repeats collapse), each with its
    * millisecond timestamp floor(idx·usecPerFrame/1000) — the
    * frame-sample fan-out a vision-encoder ingest pipeline keys on.
    *
    * Scale shape: one mapPartitions parse to a narrow (id, n, usec)
    * frame — the payload column is pruned immediately — then a
    * relational posexplode over `k` (row-parallel, no windows, no
    * driver state). Pure integer arithmetic after the parse, so the
    * whole sample set is replayable in ANSI SQL (the q138 oracle).
    *
    * @return (id, frame_idx, ts_ms), only for payloads that parse as
    *   AVI with n_frames ≥ 1 — MP4 carries no frame count in mvhd,
    *   and unparseable payloads are skipped (fail-soft), never a task
    *   failure
    */
  def sampleFrameIndices(df: DataFrame, idCol: String, binCol: String,
                         k: Int): DataFrame = {
    if (k < 1)
      throw graft.exceptions.InvalidArgumentValue(s"k must be >= 1: $k")
    val spark = df.sparkSession
    import spark.implicits._
    val parsed = df
      .select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          VideoHeaders.parse(bytes) match {
            case Some(v) if v.nFrames.exists(_ >= 1L) &&
                v.usecPerFrame.isDefined =>
              Iterator.single((id, v.nFrames.get, v.usecPerFrame.get))
            case _ => Iterator.empty
          }
        }
      }.toDF("id", "n", "usec")
    parsed
      .select(col("id"), col("n"), col("usec"),
        explode(sequence(lit(0L), lit(k - 1L))).as("j"))
      .select(col("id"),
        (col("j") * col("n") / k).cast("long").as("frame_idx"),
        col("usec"))
      .distinct()
      .select(col("id"), col("frame_idx"),
        (col("frame_idx") * col("usec") / 1000L).cast("long").as("ts_ms"))
  }

  /** Frame pixel decode — REAL for MJPEG-in-AVI, stubbed elsewhere.
    *
    * MJPEG is the one mainstream video codec family whose frames are
    * decodable with zero external deps: each 'movi' chunk is a
    * standalone baseline JPEG, and every JRE ships a JPEG ImageIO
    * reader. For an AVI payload whose `frameIdx`-th video chunk
    * starts with the JPEG SOI marker, the decode is real:
    *   features = [width, height, meanLuma, maxLuma]
    * with luma per pixel = the single gray band, or (R+G+B)/3 for
    * 3-band rasters, in 0..255. A JPEG chunk that fails to decode
    * yields None (fail-soft — at 100 TB some frames WILL be garbage),
    * never a task failure.
    *
    * For every OTHER container/codec (H.264 in MP4, VP9, …) no
    * decoder exists in this zero-egress sandbox, so the documented
    * deterministic fake below stands in: FeatureDim floats in [0, 1)
    * derived from (payload length, payload first/last bytes,
    * frameIdx) — stable across runs and partitionings, so the
    * plumbing (schema, batching, fail-soft) stays fully testable. A
    * real codec (JavaCV/ffmpeg bindings) slots in at the same seam
    * without touching any Spark-side code.
    */
  object VideoFrameDecoder {
    val FeatureDim = 4

    /** Decoded-pixel stats for one standalone JPEG: [w, h, meanLuma,
      * maxLuma] (luma 0..255). None when ImageIO can't decode it.
      */
    private[graft] def jpegStats(jpeg: Array[Byte]): Option[Array[Float]] =
      try {
        javax.imageio.ImageIO.setUseCache(false)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(jpeg))
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
        else {
          val r = img.getRaster
          val nb = r.getNumBands
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0.0
          var maxL = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val l =
                if (nb >= 3)
                  (r.getSample(x, y, 0) + r.getSample(x, y, 1) +
                    r.getSample(x, y, 2)) / 3.0
                else r.getSample(x, y, 0).toDouble
              sum += l
              if (l > maxL) maxL = l
              x += 1
            }
            y += 1
          }
          Some(Array(w.toFloat, h.toFloat,
            (sum / (w.toLong * h)).toFloat, maxL.toFloat))
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    def decode(bytes: Array[Byte], frameIdx: Long): Option[Array[Float]] =
      if (bytes == null || bytes.length == 0 || frameIdx < 0) None
      else VideoHeaders.videoFrameChunk(bytes, frameIdx) match {
        case Some(jpeg) if jpeg.length >= 2 &&
            (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8 =>
          // REAL decode: MJPEG frame = standalone baseline JPEG
          jpegStats(jpeg)
        case _ => {
          // ---- STUB (deterministic fake pixels; see scaladoc) ----
          val h0 = bytes.length.toLong * 0x9E3779B97F4A7C15L ^
            (bytes(0).toLong << 32) ^ bytes(bytes.length - 1).toLong ^
            frameIdx * 0xC2B2AE3D27D4EB4FL
          val out = new Array[Float](FeatureDim)
          var i = 0
          var h = h0
          while (i < FeatureDim) {
            h = h * 6364136223846793005L + 1442695040888963407L
            out(i) = ((h >>> 40).toInt & 0xffff).toFloat / 65535.0f
            i += 1
          }
          Some(out)
          // ---- END STUB ----
        }
      }
  }

  // NOT private — same Janino-encoder constraint as ImageMetaRow.
  case class FrameFeatureRow(id: Long, frame_idx: Long, ts_ms: Long,
                             features: Option[Array[Float]])

  /** Sampled-frame feature extraction: `sampleFrameIndices` fan-out
    * joined back to the payload, decoded through the (stubbed)
    * `VideoFrameDecoder` in one mapPartitions pass — the video analog
    * of `extractFeatures`, with the same per-partition decoder-init
    * seam. Payloads travel ONCE into the decode stage; the sample
    * index set is computed from the narrow parsed frame first.
    */
  def sampleFrameFeatures(df: DataFrame, idCol: String, binCol: String,
                          k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idx = sampleFrameIndices(df, idCol, binCol, k)
    val payload = df.select(col(idCol).cast("long").as("id"),
      col(binCol).as("content"))
    idx.join(payload, "id")
      .select(col("id"), col("frame_idx"), col("ts_ms"), col("content"))
      .as[(Long, Long, Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init: the MJPEG path decodes via
        // ImageIO — disable its temp-FILE stream cache once per task
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, fi, ts, bytes) =>
          FrameFeatureRow(id, fi, ts, VideoFrameDecoder.decode(bytes, fi))
        }
      }.toDF()
  }
}

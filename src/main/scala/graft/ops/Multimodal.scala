package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * ride as opaque `binary` columns with typed metadata; decode /
  * feature-extract / frame-sample run as batched per-partition functions
  * (the Scala-native analog of `mapInPandas` — a typed Dataset
  * `mapPartitions` with explicit batch shape).
  *
  * All three modalities parse FOR REAL: [[decodeImage]] is pure-JVM
  * `javax.imageio` (PNG/BMP/GIF readers ship in every JRE),
  * [[decodeWav]] walks RIFF/WAVE chunks (rate, channels, duration), and
  * [[decodeMp4]] walks ISO-BMFF boxes (track dims, duration). Frame
  * PIXEL decode for audio/video would need codec libs this environment
  * lacks — but the container/structural metadata above is what a
  * pipeline filters and budgets by. Payloads the parsers can't read
  * fall back to [[stubDecode]]'s deterministic fakes (byte length, md5
  * digest, fake dimensions, token-stride frame sample). Everything
  * around the codec — binary schema, partition sizing, batch iteration,
  * typed output encoding — is the real production shape: swap the stub
  * for a JNI/codec call and nothing else changes.
  *
  * Scale: media rows are large (MBs); `repartitionForMedia` targets a
  * bounded per-partition byte budget so executors never hold more than
  * ~budget × batch rows of payload; decode is map-side, no shuffle.
  */
object Multimodal {

  /** Synthetic-media builder algorithm version for fixture stamps —
    * bump when [[syntheticImageMedia]]'s pixel/encode recipe changes,
    * so stored PNG corpora rebuild instead of replaying stale bytes. */
  val mediaAlgoVersion = 1

  // ImageIO defaults to FILE-backed stream caches — one temp-file
  // create/write/delete per encode/decode, which turns a CPU-bound
  // per-pixel stage into disk I/O. Payloads here are in-memory byte
  // arrays; cache in memory. (Object init runs once per executor JVM.)
  javax.imageio.ImageIO.setUseCache(false)

  /** Opaque payload + typed metadata (media_id, kind, content, n_bytes). */
  final case class MediaRow(media_id: Long, kind: String,
      content: Array[Byte], n_bytes: Long)

  /** Decoded features — the stub's deterministic fakes. */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      digest: String, width: Long, height: Long, frame_sample: String)

  /** Rows per decode batch (a real decoder amortizes codec init per
    * batch, exactly like a pandas-UDF batch). */
  val batchSize = 64

  /** documents → media stand-in: the text's UTF-8 bytes as the payload. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      col("text").cast("binary").as("content"),
      octet_length(col("text")).cast("bigint").as("n_bytes"))

  /** Bound partition payload: ~targetBytes of media per partition. */
  def repartitionForMedia(media: DataFrame, totalBytes: Long,
      targetBytes: Long = 128L << 20): DataFrame = {
    val parts = math.max(1, (totalBytes / targetBytes).toInt)
    media.repartition(parts)
  }

  /** THE STUB — deterministic fake decode. A real pipeline replaces this
    * body with the codec call; the signature (one batch in, features
    * out) is the contract. */
  def stubDecode(batch: Seq[MediaRow]): Seq[MediaFeatures] = batch.map { m =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(m.content).map("%02x".format(_)).mkString
    val tokens = new String(m.content, "UTF-8").split("\\s+")
    val sample = Seq(0, 10, 20, 30).filter(_ < tokens.length).map(tokens)
      .mkString(" ")
    MediaFeatures(m.media_id, m.kind, m.n_bytes, digest,
      m.n_bytes % 640, m.n_bytes % 480, sample)
  }

  /** REAL image decode — pure-JVM `javax.imageio` (PNG/BMP/GIF/JPEG
    * readers are part of the JRE; no native libs). None when the payload
    * isn't a parseable image, so callers can fall back to the stub.
    * ImageIO instantiation is per-call-site cheap (reader registry is
    * JVM-static), matching the batched-decode contract. */
  def decodeImage(content: Array[Byte]): Option[(Int, Int)] = {
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content)))
        .map(img => (img.getWidth, img.getHeight))
    } catch { case _: java.io.IOException => None }
  }

  /** REAL audio (WAV) decode — a pure-JVM RIFF/WAVE header walk, no
    * codec libs: validates the RIFF+WAVE magic, then scans chunks for
    * `fmt ` (channels, sample rate, bits/sample) and `data` (payload
    * size), from which the true duration follows:
    * dataBytes / (rate · channels · bits/8). PCM only (audioFormat 1);
    * anything else — and any non-WAV payload — returns None so callers
    * fall back to the stub. */
  def decodeWav(content: Array[Byte]): Option[(Int, Int, Long)] = {
    def le16(i: Int) = (content(i) & 0xff) | ((content(i + 1) & 0xff) << 8)
    def le32(i: Int): Long =
      (content(i) & 0xffL) | ((content(i + 1) & 0xffL) << 8) |
        ((content(i + 2) & 0xffL) << 16) | ((content(i + 3) & 0xffL) << 24)
    def tag(i: Int) = new String(content, i, 4, "US-ASCII")
    if (content.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") None
    else {
      var i = 12
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      var dataBytes: Option[Long] = None
      while (i + 8 <= content.length && (fmt.isEmpty || dataBytes.isEmpty)) {
        val id = tag(i)
        val sz = le32(i + 4)
        if (id == "fmt " && i + 24 <= content.length && le16(i + 8) == 1)
          fmt = Some((le16(i + 10), le32(i + 12).toInt, le16(i + 22)))
        if (id == "data") dataBytes = Some(sz)
        // corrupt size (negative/oversized) would stall or run the
        // cursor backwards — bail out of the walk instead
        if (sz < 0 || sz > content.length) i = content.length
        else i += 8 + sz.toInt + (sz.toInt & 1) // chunks 2-byte aligned
      }
      for {
        (channels, rate, bits) <- fmt
        data <- dataBytes
        // sub-byte PCM (bits < 8) would need packed-sample math the
        // duration formula below doesn't do — reject to the stub path
        // rather than yield a plausible-but-wrong duration
        if channels > 0 && rate > 0 && bits >= 8
      } yield (rate, channels,
        data * 1000L / (rate.toLong * channels * (bits / 8)))
    }
  }

  /** REAL video (MP4/ISO-BMFF) container parse — a pure-JVM box walk,
    * no codec libs: boxes are [size:4 BE][type:4][payload] (size 1 →
    * 64-bit largesize follows; size 0 → to end of enclosing box). The
    * walk requires an `ftyp` leading box, then descends `moov` →
    * `mvhd` (timescale + duration → true duration in ms) and `moov` →
    * `trak` → `tkhd` (presentation width/height as 16.16 fixed-point;
    * the first track with nonzero dims wins — audio tracks carry 0×0).
    * Frame DECODING needs a codec; the container's structural metadata
    * — the part a 100 TB pipeline filters and budgets by — does not.
    * Returns (width, height, durationMs); None for anything that is
    * not a well-formed MP4, so callers fall back to the stub. */
  def decodeMp4(content: Array[Byte]): Option[(Int, Int, Long)] = {
    def be16(i: Int) = ((content(i) & 0xff) << 8) | (content(i + 1) & 0xff)
    def be32(i: Int): Long =
      ((content(i) & 0xffL) << 24) | ((content(i + 1) & 0xffL) << 16) |
        ((content(i + 2) & 0xffL) << 8) | (content(i + 3) & 0xffL)
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Int) = new String(content, i, 4, "US-ASCII")

    /** (payloadStart, payloadEnd, boxEnd) of the box at `i`, bounded by
      * `end`; None when sizes are corrupt. */
    def box(i: Int, end: Int): Option[(Int, Int, Int)] = {
      if (i + 8 > end) return None
      val sz = be32(i)
      val (payload, boxEnd) =
        if (sz == 1L && i + 16 <= end) (i + 16L, i + be64(i + 8))
        else if (sz == 0L) (i + 8L, end.toLong)
        else (i + 8L, i + sz)
      if (sz != 0L && sz != 1L && sz < 8) None
      else if (boxEnd > end || payload > boxEnd) None
      else Some((payload.toInt, boxEnd.toInt, boxEnd.toInt))
    }

    /** first child box with `name` inside [from, end). */
    def find(name: String, from: Int, end: Int): Option[(Int, Int)] = {
      var i = from
      while (i + 8 <= end) {
        box(i, end) match {
          case Some((p, pe, be)) =>
            if (tag(i + 4) == name) return Some((p, pe))
            i = be
          case None => return None
        }
      }
      None
    }

    if (content.length < 16 || tag(4) != "ftyp") return None
    val end = content.length
    for {
      (moovP, moovE) <- find("moov", 0, end)
      (mvhdP, _) <- find("mvhd", moovP, moovE)
      durationMs <- {
        val v = content(mvhdP) & 0xff
        if (v == 0 && mvhdP + 24 <= moovE) {
          val timescale = be32(mvhdP + 12)
          if (timescale > 0) Some(be32(mvhdP + 16) * 1000L / timescale)
          else None
        } else if (v == 1 && mvhdP + 32 <= moovE) {
          val timescale = be32(mvhdP + 20)
          if (timescale > 0) Some(be64(mvhdP + 24) * 1000L / timescale)
          else None
        } else None
      }
      dims <- {
        // scan traks for the first with nonzero tkhd dims
        var i = moovP
        var found: Option[(Int, Int)] = None
        while (found.isEmpty && i + 8 <= moovE) {
          box(i, moovE) match {
            case Some((p, pe, be)) =>
              if (tag(i + 4) == "trak")
                find("tkhd", p, pe).foreach { case (tp, tpe) =>
                  val v = content(tp) & 0xff
                  val off = tp + (if (v == 1) 88 else 76)
                  if (off + 8 <= tpe) {
                    val w = be16(off).toInt // 16.16 fixed → integer part
                    val h = be16(off + 4).toInt
                    if (w > 0 && h > 0) found = Some((w, h))
                  }
                }
              i = be
            case None => i = moovE
          }
        }
        found
      }
    } yield (dims._1, dims._2, durationMs)
  }

  /** One decode batch: image kinds through the real image codec (true
    * width/height; frame_sample carries the true dims), audio kinds
    * through the WAV header parse (width = sample rate, height =
    * channels, frame_sample = "RATEhz CHch MSms"), everything else —
    * and unparseable payloads — through the stub. */
  def decode(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      val fallback = stubDecode(Seq(m)).head
      m.kind match {
        case "image" => decodeImage(m.content) match {
          case Some((w, h)) =>
            fallback.copy(width = w, height = h, frame_sample = s"${w}x$h")
          case None => fallback
        }
        case "audio" => decodeWav(m.content) match {
          case Some((rate, channels, ms)) =>
            fallback.copy(width = rate, height = channels,
              frame_sample = s"${rate}hz ${channels}ch ${ms}ms")
          case None => fallback
        }
        case "video" => decodeMp4(m.content) match {
          case Some((w, h, ms)) =>
            fallback.copy(width = w, height = h,
              frame_sample = s"${w}x$h ${ms}ms")
          case None => fallback
        }
        case _ => fallback
      }
    }

  /** decode pipeline: typed batched mapPartitions over the media rows. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(
      _.grouped(batchSize).flatMap(b => decode(b.toSeq)))
  }

  /** RESIZE STUB — deterministic fake of a bilinear downscale: the
    * "resized" payload samples every k-th byte so output size tracks the
    * target dims; a real implementation swaps the body for the codec
    * call. Metadata (n_bytes) is recomputed — the typed row stays
    * consistent through the stage. */
  def stubResize(batch: Seq[MediaRow], maxBytes: Int): Seq[MediaRow] =
    batch.map { m =>
      if (m.content.length <= maxBytes) m
      else {
        val stride = math.max(1, m.content.length / maxBytes)
        val resized = m.content.indices.collect {
          case i if i % stride == 0 => m.content(i)
        }.toArray
        m.copy(content = resized, n_bytes = resized.length.toLong)
      }
    }

  /** resize pipeline stage: same batched mapPartitions contract as the
    * decode — stages compose (media → resize → decode). */
  def resize(spark: SparkSession, media: DataFrame, maxBytes: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(
      _.grouped(batchSize).flatMap(b => stubResize(b.toSeq, maxBytes)))
  }

  /** Resized image output: true output dims + the raw RGB tensor's
    * metadata and an order-pinned integer checksum over its bytes —
    * what q133 verifies against a closed-form oracle. */
  final case class ResizedImage(media_id: Long, width: Long, height: Long,
      n_bytes: Long, checksum: Long)

  /** Deterministic synthetic image for media_id: dims (8 + id mod 13)
    * × (8 + id mod 7), pixel (x, y) =
    *   r = (id·31 + x·7 + y·3) mod 256
    *   g = (x·5 + y·11 + 1)    mod 256
    *   b = (id + x + y·13)     mod 256
    * encoded as a REAL PNG via ImageIO — the payload a pipeline would
    * carry — so the downstream decode is a genuine codec pass, while
    * the pixel function stays closed-form for the oracle. */
  def syntheticPng(mediaId: Long): Array[Byte] = {
    val w = (8 + mediaId % 13).toInt
    val h = (8 + mediaId % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((mediaId * 31 + x * 7 + y * 3) % 256).toInt
        val g = ((x * 5 + y * 11 + 1) % 256).toInt
        val b = ((mediaId + x + y * 13) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL per-pixel image resize: ImageIO-decode the payload, then
    * nearest-neighbor downscale to fit within `maxDim` (aspect kept,
    * src coordinate = x·W div w′ — exact integer math, deliberately NOT
    * a Java2D Graphics2D rescale whose interpolation is
    * implementation-defined; an arithmetic oracle needs bit-pinned
    * pixels). Output is the raw RGB tensor (w′·h′·3 bytes, row-major,
    * channel-minor) — the form a training pipeline ships to a model —
    * plus recomputed metadata. None when the payload isn't a decodable
    * image. */
  def resizeImagePixels(content: Array[Byte],
      maxDim: Int): Option[(Array[Byte], Int, Int)] = {
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))).map { img =>
        val (ws, hs) = (img.getWidth, img.getHeight)
        val m = math.max(ws, hs)
        val (w, h) =
          if (m <= maxDim) (ws, hs)
          else (math.max(1, ws * maxDim / m), math.max(1, hs * maxDim / m))
        val out = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          val sy = y * hs / h
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x * ws / w, sy)
            val o = (y * w + x) * 3
            out(o) = ((rgb >> 16) & 0xff).toByte
            out(o + 1) = ((rgb >> 8) & 0xff).toByte
            out(o + 2) = (rgb & 0xff).toByte
            x += 1
          }
          y += 1
        }
        (out, w, h)
      }
    } catch { case _: java.io.IOException => None }
  }

  /** Position-weighted checksum over a payload: Σ byte(p)·(p mod 97 + 1)
    * — order-sensitive (a pixel swap changes it) and closed-form
    * replayable. */
  def byteChecksum(bytes: Array[Byte]): Long = {
    var cs = 0L
    var p = 0
    while (p < bytes.length) {
      cs += (bytes(p) & 0xff).toLong * (p % 97 + 1)
      p += 1
    }
    cs
  }

  /** The real-resize pipeline stage: same typed batched mapPartitions
    * contract as [[decodeFeatures]] — decode, per-pixel resize,
    * tensorize, checksum, one batch at a time. Payloads that fail the
    * image decode are dropped (a production stage routes them to a
    * quarantine sink). */
  def resizeImages(spark: SparkSession, media: DataFrame,
      maxDim: Int): Dataset[ResizedImage] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.grouped(batchSize).flatMap(b =>
      b.flatMap(m => resizeImagePixels(m.content, maxDim).map {
        case (bytes, w, h) => ResizedImage(m.media_id, w, h,
          bytes.length.toLong, byteChecksum(bytes))
      })))
  }

  /** Resized-image TENSOR output: the raw RGB bytes themselves, for
    * stages that consume pixels (the image model seam — q210) rather
    * than audit them (q133's checksum). */
  final case class ImageTensor(media_id: Long, width: Long, height: Long,
      tensor: Array[Byte])

  /** As [[resizeImages]], but shipping the tensor forward instead of
    * reducing it to a checksum — the decode→resize half of the
    * decode→resize→embed pipeline, same batched partition-local
    * contract. */
  def resizeTensors(spark: SparkSession, media: DataFrame,
      maxDim: Int): Dataset[ImageTensor] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.grouped(batchSize).flatMap(b =>
      b.flatMap(m => resizeImagePixels(m.content, maxDim).map {
        case (bytes, w, h) => ImageTensor(m.media_id, w, h, bytes)
      })))
  }

  /** Synthetic-PNG media corpus keyed by doc_id (the multimodal
    * stand-in when the documents table is the only corpus): real PNG
    * payloads with closed-form pixels, built in the same batched
    * partition contract a media ingest uses. */
  def syntheticImageMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map(id =>
      MediaRow(id, "image", syntheticPng(id),
        -1L))).map(m => m.copy(n_bytes = m.content.length.toLong)).toDF()
  }

  /** Synthetic-WAV builder algorithm version for fixture stamps — bump
    * when [[syntheticWav]]'s sample/encode recipe changes ([[
    * mediaAlgoVersion]]'s role on the audio corpus). */
  val audioMediaAlgoVersion = 1

  /** Deterministic synthetic waveform for media_id: n = 48 + id mod 17
    * mono PCM-16 samples at 8 kHz, sample t =
    *   ((id·13 + t²·7 + t·29) mod 65536) − 32768
    * encoded as a REAL RIFF/WAVE payload (the bytes a pipeline would
    * carry — [[decodeWav]]/[[decodeWavSamples]] parse it as a genuine
    * container pass) while the sample function stays closed-form for
    * the oracle. */
  def syntheticWav(mediaId: Long): Array[Byte] = {
    val n = (48 + mediaId % 17).toInt
    val dataBytes = n * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(8000) // sample rate
      .putInt(16000) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits/sample
    out.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var t = 0
    while (t < n) {
      out.putShort(
        (((mediaId * 13 + t.toLong * t * 7 + t * 29L) % 65536) - 32768).toShort)
      t += 1
    }
    out.array()
  }

  /** REAL audio PCM decode — [[decodeWav]]'s RIFF/WAVE chunk walk,
    * extended to slurp the `data` chunk as signed samples (16-bit LE;
    * channel-interleaved order preserved — the waveform an audio model
    * consumes). None for anything that is not parseable 16-bit PCM, so
    * callers route to a quarantine path instead of embedding noise. */
  def decodeWavSamples(content: Array[Byte]): Option[Array[Long]] = {
    def le16(i: Int) = (content(i) & 0xff) | ((content(i + 1) & 0xff) << 8)
    def le32(i: Int): Long =
      (content(i) & 0xffL) | ((content(i + 1) & 0xffL) << 8) |
        ((content(i + 2) & 0xffL) << 16) | ((content(i + 3) & 0xffL) << 24)
    def tag(i: Int) = new String(content, i, 4, "US-ASCII")
    if (content.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") None
    else {
      var i = 12
      var bits = -1
      var data: Option[(Int, Int)] = None // (offset, nBytes)
      while (i + 8 <= content.length && (bits < 0 || data.isEmpty)) {
        val id = tag(i)
        val sz = le32(i + 4)
        if (id == "fmt " && i + 24 <= content.length && le16(i + 8) == 1)
          bits = le16(i + 22)
        if (id == "data" && i + 8 + sz <= content.length)
          data = Some((i + 8, sz.toInt))
        if (sz < 0 || sz > content.length) i = content.length
        else i += 8 + sz.toInt + (sz.toInt & 1)
      }
      for ((off, nBytes) <- data if bits == 16) yield {
        val samples = new Array[Long](nBytes / 2)
        var j = 0
        while (j < samples.length) {
          samples(j) = le16(off + j * 2).toShort.toLong // sign-extend
          j += 1
        }
        samples
      }
    }
  }

  /** Decoded waveform row — the audio twin of [[ImageTensor]]. */
  final case class WaveRow(media_id: Long, n_samples: Long,
      samples: Array[Long])

  /** The audio decode pipeline stage: WAV payloads → signed PCM
    * waveforms, batched partition-local (the decode→embed front half of
    * the audio seam — same contract as [[resizeTensors]] on images).
    * Unparseable payloads are dropped (quarantine sink in production). */
  def decodeWaves(spark: SparkSession, media: DataFrame): Dataset[WaveRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.grouped(batchSize).flatMap(b =>
      b.flatMap(m => decodeWavSamples(m.content).map(s =>
        WaveRow(m.media_id, s.length.toLong, s)))))
  }

  /** Synthetic-WAV media corpus keyed by doc_id — [[syntheticImageMedia]]
    * on the audio modality. */
  def syntheticAudioMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map(id =>
      MediaRow(id, "audio", syntheticWav(id),
        -1L))).map(m => m.copy(n_bytes = m.content.length.toLong)).toDF()
  }
}

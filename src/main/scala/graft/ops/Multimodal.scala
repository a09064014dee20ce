package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * stages as partition-batched transforms.
  *
  * The actual codec work (JPEG decode, audio resample, frame sampling)
  * needs native libraries that are not in this container, so the decode
  * kernel is a clearly marked DETERMINISTIC STUB — but everything Spark
  * cares about is real: the schema contract, the batch iteration shape
  * (one decoder init per partition, amortized across rows — the Scala
  * analog of `mapInPandas`), partitioning, and the downstream columnar
  * handoff.
  */
object Multimodal {

  /** A media row: payload + typed metadata, the schema a 100 TB corpus
    * would carry (payload in parquet binary or out-of-line object refs).
    */
  final case class MediaRow(
      doc_id: Long,
      media_type: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int)

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      feature: Array[Double])

  /** Wrap a text table as a fake media corpus: payload = UTF-8 bytes.
    * Lets the full pipeline run against the driver's `documents` table.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      // Deterministic fake modality assignment.
      element_at(lit(Array("image", "audio", "video")), (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(640)) + 1).cast("int").as("width"),
      (pmod(col("doc_id"), lit(480)) + 1).cast("int").as("height"),
      lit(16000).as("sample_rate"))

  /** Decode kernel. Image payloads (PNG/JPEG magic) go through a REAL
    * decoder — `javax.imageio` ships with the JDK, so no external codec
    * is needed — yielding [width, height, meanLuminance, nPixels].
    * Audio/video payloads would need ffmpeg-class libraries that are not
    * in this container, so they take the clearly-marked DETERMINISTIC
    * STUB (byte statistics) HERE; the content-level paths live in
    * [[AudioHash]] (real javax.sound WAV decode) and [[VideoHash]]
    * (the GVF1 raw-frame container). The Spark-side plumbing is
    * identical either way.
    */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    (p.length > 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p.length > 2 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8)

  private def decodeImage(payload: Array[Byte]): Option[Array[Double]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        var lum = 0.0
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            lum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val n = img.getWidth.toLong * img.getHeight
        Some(Array(img.getWidth.toDouble, img.getHeight.toDouble, lum / n, n.toDouble))
      }
    } catch { case _: Exception => None }

  private def looksLikeWav(p: Array[Byte]): Boolean =
    p.length > 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** WAV/PCM decode through the JDK's javax.sound.sampled — real sample
    * rate, duration, and RMS amplitude (first channel, 16-bit).
    */
  private def decodeWav(payload: Array[Byte]): Option[Array[Double]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = in.getFormat
      // The RMS loop below assumes 16-bit little-endian signed PCM; any
      // other valid WAV encoding (float, 24-bit, big-endian) would
      // silently reinterpret bytes — send those to the stub instead.
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) return None
      val bytes = in.readAllBytes()
      val frameSize = fmt.getFrameSize
      val n = bytes.length / frameSize
      var rms = 0.0
      var i = 0
      while (i < n) {
        val off = i * frameSize
        val s = ((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort / 32768.0
        rms += s * s
        i += 1
      }
      Some(Array(fmt.getSampleRate.toDouble, n.toDouble / fmt.getSampleRate,
        math.sqrt(rms / math.max(n, 1)), n.toDouble))
    } catch { case _: Exception => None }

  /** The codec boundary, made explicit: payloads the JDK can decode
    * (PNG/JPEG images, 16-bit PCM WAV) yield real features; anything
    * else — video, compressed audio, corrupt media — is an UNSUPPORTED
    * FORMAT (those codecs need ffmpeg-class libraries this container
    * does not ship). Callers choose the policy: [[extractFeatures]]
    * substitutes deterministic byte statistics (the clearly-documented
    * fake that keeps the pipeline exercised end-to-end),
    * [[extractFeaturesStrict]] routes them to typed reject rows — the
    * `Flatten.rejects` discipline.
    */
  private def decode(payload: Array[Byte]): Either[String, Array[Double]] =
    if (looksLikeImage(payload))
      decodeImage(payload).toRight("corrupt_image")
    else if (looksLikeWav(payload))
      decodeWav(payload).toRight("unsupported_wav_encoding")
    else Left("unsupported_format")

  /** Deterministic byte statistics — the documented stand-in feature
    * vector for unsupported formats on the lenient path. Empty payload →
    * all-zero features, not the untouched min/max sentinels (±2^63
    * would poison any downstream aggregate).
    */
  private def byteStats(payload: Array[Byte]): Array[Double] = {
    if (payload.isEmpty) return Array(0.0, 0.0, 0.0, 0.0)
    var sum = 0L; var mx = Long.MinValue; var mn = Long.MaxValue
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xffL
      sum += b; if (b > mx) mx = b; if (b < mn) mn = b
      i += 1
    }
    val n = payload.length
    Array(n.toDouble, sum.toDouble / n, mx.toDouble, mn.toDouble)
  }

  private def decodeStub(payload: Array[Byte]): Array[Double] =
    decode(payload).getOrElse(byteStats(payload))

  /** A payload the codec boundary refused, as data: the reason plus
    * enough identity to route it to a quarantine sink — same shape of
    * contract as `Flatten.rejects` (bad input becomes a typed row, never
    * an aborted job, never silently-fake analytics).
    */
  final case class MediaReject(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      reason: String)

  /** Partition-batched decode + feature extraction. `mapPartitions` is
    * the deliberate choice here (SURVEY preference order (d)): codec
    * initialization is expensive and must amortize across a partition,
    * exactly like a Pandas-UDF batch on the Python side.
    */
  // Pre-derived encoders: runtime derivation via spark.implicits trips
  // scala-reflection in REPL classloaders (sbt console / spark-shell).
  private implicit val mediaRowEnc: org.apache.spark.sql.Encoder[MediaRow] =
    org.apache.spark.sql.Encoders.product[MediaRow]
  private implicit val mediaFeaturesEnc: org.apache.spark.sql.Encoder[MediaFeatures] =
    org.apache.spark.sql.Encoders.product[MediaFeatures]
  private implicit val mediaRejectEnc: org.apache.spark.sql.Encoder[MediaReject] =
    org.apache.spark.sql.Encoders.product[MediaReject]

  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] =
    media.as[MediaRow].mapPartitions { rows =>
      // (stub) per-partition decoder init would happen here, once.
      rows.map { r =>
        // null payload (a NULL source column) = empty: decode must not
        // NPE a whole task over one bad row
        val p = if (r.payload == null) Array.emptyByteArray else r.payload
        MediaFeatures(r.doc_id, r.media_type, p.length.toLong, decodeStub(p))
      }
    }

  /** [[extractFeatures]] with the strict codec policy: only genuinely
    * decoded payloads produce features; unsupported or corrupt media
    * become [[MediaReject]] rows instead of fake byte-stat vectors.
    * Both relations are map-only over `media`; materializing BOTH decodes
    * every payload twice, so at 100 TB write them from one pass (decode
    * into a status-tagged union, then split at the sink) when decode
    * cost dominates the scan — here the split keeps the two contracts
    * independently typed and testable.
    */
  def extractFeaturesStrict(
      media: DataFrame): (Dataset[MediaFeatures], Dataset[MediaReject]) = {
    val rows = media.as[MediaRow]
    def payloadOf(r: MediaRow): Array[Byte] =
      if (r.payload == null) Array.emptyByteArray else r.payload
    val feats = rows.mapPartitions { it =>
      it.flatMap { r =>
        val p = payloadOf(r)
        decode(p).toOption.map(f =>
          MediaFeatures(r.doc_id, r.media_type, p.length.toLong, f))
      }
    }
    val rejects = rows.mapPartitions { it =>
      it.flatMap { r =>
        val p = payloadOf(r)
        decode(p).left.toOption.map(reason =>
          MediaReject(r.doc_id, r.media_type, p.length.toLong, reason))
      }
    }
    (feats, rejects)
  }

  /** SQL-expressible slice of the pipeline (payload length + modality
    * metadata) — this is what the cross-engine oracle checks; the stub
    * features are covered by the ScalaTest suite instead.
    */
  def metadataSummary(media: DataFrame): DataFrame =
    media.groupBy("media_type")
      .agg(
        count(lit(1)).as("n_items"),
        sum(length(col("payload"))).cast("long").as("total_bytes"),
        max(col("width")).cast("long").as("max_width"))
      .orderBy("media_type")
}

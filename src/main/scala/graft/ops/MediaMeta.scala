package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Container-METADATA extraction over opaque media payloads — the
  * triage/catalog stage a 100 TB multimodal pipeline runs before it
  * decides what to decode: one map-only pass sniffs each payload's
  * container and parses its structural metadata (duration, sample
  * rate, channels, track count, dimensions, frame count) WITHOUT
  * decoding any media data. Corrupt or unsupported payloads become
  * typed reject rows with the container still identified when the
  * magic was readable — the [[VideoHash]]/[[AudioHash]] reject
  * discipline extended to the metadata layer.
  *
  * Containers parsed natively (pure JVM, public formats):
  *   - MP4 / ISO-BMFF (ISO 14496-12 box walk: `ftyp`, `moov`/`mvhd`
  *     version 0 and 1, 32- and 64-bit box sizes; duration from
  *     mvhd duration/timescale; tracks = `trak` count),
  *   - MP3 / MPEG audio Layer III (ID3v2 skip, frame-header walk
  *     across MPEG-1/2/2.5, bitrate/samplerate tables, padding;
  *     duration from the exact frame sample count — VBR streams sum
  *     per-frame; trailing ID3v1 `TAG` tolerated),
  *   - WAV / RIFF (fmt chunk: channels/rate/bits; duration from the
  *     data chunk length),
  *   - FLAC (metadata-block walk to STREAMINFO: sample rate /
  *     channels / total samples as packed bit fields — duration is
  *     exact without touching a single audio frame),
  *   - OGG/Opus (page walk: the terminal granule position is the
  *     48 kHz sample count, so duration = (granule − preskip)/48
  *     exactly; OpusHead carries channels and the input rate;
  *     non-Opus Ogg streams become a typed `unsupported_codec`),
  *   - AVI and GVF (delegated to [[VideoHash.decodeVideo]]'s demux:
  *     dimensions + frame count — those containers carry no timebase
  *     in the fields the demux keeps),
  *   - GIF87a/89a ([[Gif.meta]]'s structure-only block walk: logical
  *     screen dims, image count, duration from the graphic-control
  *     delays — LZW data skipped by sub-block length, never decoded;
  *     the full pixel decode lives behind [[VideoHash.decodeVideo]]).
  *
  * This parses STRUCTURE only — no entropy decoding, so MP4/MP3
  * handling here does not contradict the decode seam's typed-reject
  * boundary for those codecs ([[VideoHash.decodeVideo]]): a payload
  * can be cataloged here and still reject at decode.
  *
  * 100 TB shape: one `Dataset.map` over the binary column — map-only,
  * no shuffle, no driver involvement; schema fixed so the output
  * joins/aggregates like any relation.
  */
object MediaMeta {

  /** One cataloged-or-rejected payload. `reason = Some(...)` marks a
    * reject; `container` stays identified whenever the magic was
    * readable ("mp4" + truncated_box, not "unknown"). Absent fields
    * are None — e.g. video containers here carry no duration, audio
    * ones no dimensions.
    */
  final case class MediaInfo(
      id: Long,
      n_bytes: Long,
      container: String,
      duration_ms: Option[Long],
      sample_rate: Option[Int],
      channels: Option[Int],
      tracks: Option[Int],
      width: Option[Int],
      height: Option[Int],
      frames: Option[Int],
      reason: Option[String])

  private def rej(id: Long, n: Long, c: String, why: String): MediaInfo =
    MediaInfo(id, n, c, None, None, None, None, None, None, None, Some(why))

  /** Container sniff by magic — never throws, never reads past the
    * prefix. "unknown" routes to the unsupported_format reject.
    */
  def sniff(p: Array[Byte]): String = {
    def at(off: Int, s: String): Boolean =
      p.length >= off + s.length &&
        s.indices.forall(i => (p(off + i) & 0xff) == s.charAt(i))
    if (p.length >= 12 && at(4, "ftyp")) "mp4"
    else if (at(0, "ID3")) "mp3"
    else if (p.length >= 2 && (p(0) & 0xff) == 0xff && (p(1) & 0xe0) == 0xe0)
      "mp3"
    else if (at(0, "RIFF") && at(8, "WAVE")) "wav"
    else if (at(0, "RIFF") && at(8, "AVI ")) "avi"
    else if (at(0, "fLaC")) "flac"
    else if (at(0, "OggS")) "ogg"
    else if (at(0, "GVF1")) "gvf"
    else if (Gif.isGif(p)) "gif"
    else "unknown"
  }

  /** Parse one payload to its [[MediaInfo]] — total (never throws). */
  def parse(id: Long, p: Array[Byte]): MediaInfo = {
    val n = if (p == null) 0L else p.length.toLong
    if (n == 0) return rej(id, 0, "unknown", "empty_payload")
    sniff(p) match {
      case "mp4" => parseMp4(id, p)
      case "mp3" => parseMp3(id, p)
      case "wav" => parseWav(id, p)
      case "flac" => parseFlac(id, p)
      case "ogg" => parseOgg(id, p)
      case c @ ("avi" | "gvf") =>
        VideoHash.decodeVideo(p) match {
          case Right(v) => MediaInfo(id, n, c, None, None, None, None,
            Some(v.w), Some(v.h), Some(v.n), None)
          case Left(why) => rej(id, n, c, why)
        }
      case "gif" =>
        // structure-only walk (Gif.meta) — frame data sub-blocks are
        // skipped by length, never LZW-decoded, the catalog discipline;
        // GIF delays make this the one video container with a duration
        Gif.meta(p) match {
          case Right(m) => MediaInfo(id, n, "gif", Some(m.durationMs),
            None, None, None, Some(m.w), Some(m.h), Some(m.frames), None)
          case Left(why) => rej(id, n, "gif", why)
        }
      case _ => rej(id, n, "unknown", "unsupported_format")
    }
  }

  /** The map-only catalog pass: `(idCol: long, payloadCol: binary)` →
    * [[MediaInfo]] rows, one per input row.
    */
  def probe(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaInfo] = {
    val spark = df.sparkSession
    import spark.implicits._
    implicit val enc: org.apache.spark.sql.Encoder[MediaInfo] =
      org.apache.spark.sql.Encoders.product[MediaInfo]
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, p) => parse(id, p) }
  }

  // ---------------------------------------------------------------
  // MP4 / ISO-BMFF
  // ---------------------------------------------------------------

  private def be32(p: Array[Byte], off: Int): Long =
    ((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
      ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL)
  private def be64(p: Array[Byte], off: Int): Long =
    (be32(p, off) << 32) | be32(p, off + 4)
  private def boxType(p: Array[Byte], off: Int): String =
    new String(p, off + 4, 4, "ISO-8859-1")

  /** Walk boxes in [from, to); f gets (type, payloadStart, payloadEnd).
    * Returns Some(reject reason) on a malformed box.
    */
  private def walkBoxes(p: Array[Byte], from: Long, to: Long)(
      f: (String, Long, Long) => Unit): Option[String] = {
    var off = from
    while (off < to) {
      if (to - off < 8) return Some("truncated_box")
      val size0 = be32(p, off.toInt)
      val t = boxType(p, off.toInt)
      var payload = off + 8
      val size =
        if (size0 == 1) {
          if (to - off < 16) return Some("truncated_box")
          payload = off + 16
          be64(p, off.toInt + 8)
        } else if (size0 == 0) to - off // box extends to end
        else size0
      if (size < payload - off || off + size > to) return Some("truncated_box")
      f(t, payload, off + size)
      off += size
    }
    None
  }

  private def parseMp4(id: Long, p: Array[Byte]): MediaInfo = {
    val n = p.length.toLong
    var duration: Option[Long] = None
    var tracks = 0
    var sawMoov = false
    var dims: Option[(Int, Int)] = None
    var bad: Option[String] = None
    val topErr = walkBoxes(p, 0, n) { (t, ps, pe) =>
      if (t == "moov" && bad.isEmpty) {
        sawMoov = true
        val err = walkBoxes(p, ps, pe) { (ct, cps, cpe) =>
          if (ct == "trak") {
            tracks += 1
            // first trak with a nonzero tkhd presentation size wins —
            // width/height are 16.16 fixed point at v0 offset 76/80
            // (v1: 88/92, the 64-bit ctime/mtime/duration shift)
            if (dims.isEmpty && bad.isEmpty) {
              val terr = walkBoxes(p, cps, cpe) { (tt, tps, tpe) =>
                if (tt == "tkhd" && dims.isEmpty && tpe - tps >= 4) {
                  val v1 = (p(tps.toInt) & 0xff) == 1
                  val wOff = if (v1) 88 else 76
                  if (tpe - tps >= wOff + 8) {
                    val w = (be32(p, tps.toInt + wOff) >> 16).toInt
                    val h = (be32(p, tps.toInt + wOff + 4) >> 16).toInt
                    if (w > 0 && h > 0) dims = Some((w, h))
                  }
                }
              }
              if (terr.isDefined && bad.isEmpty) bad = terr
            }
          }
          else if (ct == "mvhd" && bad.isEmpty) {
            if (cpe - cps < 4) bad = Some("truncated_box")
            else {
              val version = p(cps.toInt) & 0xff
              if (version == 1) {
                if (cpe - cps < 32) bad = Some("truncated_box")
                else {
                  val ts = be32(p, cps.toInt + 20)
                  val dur = be64(p, cps.toInt + 24)
                  if (ts <= 0) bad = Some("bad_timescale")
                  else duration = Some(dur * 1000L / ts)
                }
              } else {
                if (cpe - cps < 24) bad = Some("truncated_box")
                else {
                  val ts = be32(p, cps.toInt + 12)
                  val dur = be32(p, cps.toInt + 16)
                  if (ts <= 0) bad = Some("bad_timescale")
                  else duration = Some(dur * 1000L / ts)
                }
              }
            }
          }
        }
        if (err.isDefined && bad.isEmpty) bad = err
      }
    }
    topErr.orElse(bad) match {
      case Some(why) => rej(id, n, "mp4", why)
      case None =>
        if (!sawMoov) rej(id, n, "mp4", "no_moov")
        else if (duration.isEmpty) rej(id, n, "mp4", "no_mvhd")
        else MediaInfo(id, n, "mp4", duration, None, None, Some(tracks),
          dims.map(_._1), dims.map(_._2), None, None)
    }
  }

  // ---------------------------------------------------------------
  // MP3 / MPEG audio Layer III
  // ---------------------------------------------------------------

  private val BrV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BrV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val SrV1 = Array(44100, 48000, 32000)

  private def parseMp3(id: Long, p: Array[Byte]): MediaInfo = {
    val n = p.length.toLong
    var off = 0L
    // ID3v2: "ID3" + ver(2) + flags(1) + syncsafe size(4), then body;
    // the size EXCLUDES the 10-byte header and the optional 10-byte
    // ID3v2.4 footer (flags bit 0x10), so a footer adds 10 more
    if (n >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
      val sz = ((p(6) & 0x7fL) << 21) | ((p(7) & 0x7fL) << 14) |
        ((p(8) & 0x7fL) << 7) | (p(9) & 0x7fL)
      off = 10 + sz + (if ((p(5) & 0x10) != 0) 10 else 0)
      if (off >= n) return rej(id, n, "mp3", "truncated_frame")
    }
    var frames = 0
    var totalSamples = 0L
    var rate = -1
    var chans = -1
    while (off < n) {
      // trailing ID3v1 tag: exactly 128 bytes of "TAG..."
      if (n - off == 128 && p(off.toInt) == 'T' && p(off.toInt + 1) == 'A' &&
          p(off.toInt + 2) == 'G' && frames > 0)
        off = n
      else {
        if (n - off < 4) return rej(id, n, "mp3", "truncated_frame")
        val i = off.toInt
        if ((p(i) & 0xff) != 0xff || (p(i + 1) & 0xe0) != 0xe0)
          return rej(id, n, "mp3",
            if (frames == 0) "no_sync" else "mid_stream_desync")
        val verBits = (p(i + 1) >> 3) & 3   // 0=2.5, 2=V2, 3=V1
        val layerBits = (p(i + 1) >> 1) & 3 // 1 = Layer III
        if (verBits == 1) return rej(id, n, "mp3", "bad_header")
        if (layerBits != 1) return rej(id, n, "mp3", "unsupported_layer")
        val brIdx = (p(i + 2) >> 4) & 15
        val srIdx = (p(i + 2) >> 2) & 3
        if (brIdx == 15 || srIdx == 3) return rej(id, n, "mp3", "bad_header")
        if (brIdx == 0) return rej(id, n, "mp3", "free_bitrate")
        val v1 = verBits == 3
        val br = (if (v1) BrV1L3 else BrV2L3)(brIdx) * 1000
        val sr = SrV1(srIdx) / (if (v1) 1 else if (verBits == 2) 2 else 4)
        val pad = (p(i + 2) >> 1) & 1
        val mono = ((p(i + 3) >> 6) & 3) == 3
        if (rate < 0) { rate = sr; chans = if (mono) 1 else 2 }
        else if (rate != sr)
          // constant-rate contract: the exact-duration arithmetic
          // below assumes one rate; real mixed-rate streams exist but
          // are degenerate — reject loudly rather than approximate
          return rej(id, n, "mp3", "mixed_sample_rate")
        val spf = if (v1) 1152 else 576
        val frameLen = (spf / 8) * br / sr + pad
        if (frameLen < 4 || off + frameLen > n)
          return rej(id, n, "mp3", "truncated_frame")
        frames += 1
        totalSamples += spf
        off += frameLen
      }
    }
    if (frames == 0) rej(id, n, "mp3", "no_frames")
    else MediaInfo(id, n, "mp3", Some(totalSamples * 1000L / rate),
      Some(rate), Some(chans), None, None, None, Some(frames), None)
  }

  // ---------------------------------------------------------------
  // WAV / RIFF (metadata only — [[AudioHash.decodeSamples]] is the
  // full-decode twin with the same chunk discipline)
  // ---------------------------------------------------------------

  private def le16(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
  private def le32(p: Array[Byte], off: Int): Long =
    (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
      ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)

  private def parseWav(id: Long, p: Array[Byte]): MediaInfo = {
    val n = p.length.toLong
    if (n < 12) return rej(id, n, "wav", "truncated_chunk")
    var off = 12L
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var dataLen = -1L
    while (off < n) {
      if (n - off < 8) return rej(id, n, "wav", "truncated_chunk")
      val cid = new String(p, off.toInt, 4, "ISO-8859-1")
      val sz = le32(p, off.toInt + 4)
      val body = off + 8
      if (body + sz > n) return rej(id, n, "wav", "truncated_chunk")
      if (cid == "fmt ") {
        if (sz < 16) return rej(id, n, "wav", "bad_fmt")
        val ch = le16(p, body.toInt + 2)
        val rate = le32(p, body.toInt + 4).toInt
        val bits = le16(p, body.toInt + 14)
        if (ch <= 0 || rate <= 0 || bits <= 0 || bits % 8 != 0)
          return rej(id, n, "wav", "bad_fmt")
        fmt = Some((ch, rate, bits))
      } else if (cid == "data") dataLen = sz
      off = body + sz + (sz & 1) // chunks are word-aligned
    }
    (fmt, dataLen) match {
      case (None, _) => rej(id, n, "wav", "no_fmt")
      case (_, -1L)  => rej(id, n, "wav", "no_data")
      case (Some((ch, rate, bits)), dl) =>
        val bytesPerSec = rate.toLong * ch * (bits / 8)
        MediaInfo(id, n, "wav", Some(dl * 1000L / bytesPerSec),
          Some(rate), Some(ch), None, None, None, None, None)
    }
  }

  // ---------------------------------------------------------------
  // FLAC — metadata-block walk to STREAMINFO (block type 0, 34 bytes):
  // the packed fields at byte offset 10 of the block body are
  // sample rate (20 bits), channels−1 (3), bits/sample−1 (5), and
  // total samples (36) — duration needs no frame ever read.
  // ---------------------------------------------------------------

  private def parseFlac(id: Long, p: Array[Byte]): MediaInfo = {
    val n = p.length.toLong
    var off = 4L
    var last = false
    while (!last) {
      if (n - off < 4) return rej(id, n, "flac", "truncated_block")
      val i = off.toInt
      last = (p(i) & 0x80) != 0
      val btype = p(i) & 0x7f
      val size = ((p(i + 1) & 0xffL) << 16) | ((p(i + 2) & 0xffL) << 8) |
        (p(i + 3) & 0xffL)
      if (off + 4 + size > n) return rej(id, n, "flac", "truncated_block")
      if (btype == 0) {
        if (size < 34) return rej(id, n, "flac", "bad_streaminfo")
        val b = i + 4
        // bytes 10..17 of the body: 20-bit rate, 3-bit ch−1, 5-bit
        // bps−1, 36-bit total samples
        val rate = (((p(b + 10) & 0xffL) << 12) | ((p(b + 11) & 0xffL) << 4) |
          ((p(b + 12) & 0xf0L) >> 4)).toInt
        val ch = (((p(b + 12) & 0x0e) >> 1) + 1)
        val total = ((p(b + 13) & 0x0fL) << 32) | ((p(b + 14) & 0xffL) << 24) |
          ((p(b + 15) & 0xffL) << 16) | ((p(b + 16) & 0xffL) << 8) |
          (p(b + 17) & 0xffL)
        if (rate <= 0) return rej(id, n, "flac", "bad_streaminfo")
        return MediaInfo(id, n, "flac", Some(total * 1000L / rate),
          Some(rate), Some(ch), None, None, None, None, None)
      }
      off += 4 + size
    }
    rej(id, n, "flac", "no_streaminfo")
  }

  // ---------------------------------------------------------------
  // OGG / Opus — page walk + the OpusHead identification header.
  // Opus granule positions are ALWAYS 48 kHz samples (RFC 7845 §4)
  // regardless of the input rate, so the terminal granule minus the
  // preskip is the exact playable sample count.
  // ---------------------------------------------------------------

  private def le64(p: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (p(off + i) & 0xffL); i -= 1 }
    v
  }

  private def parseOgg(id: Long, p: Array[Byte]): MediaInfo = {
    val n = p.length.toLong
    var off = 0L
    var first = true
    var chans = -1
    var rate = -1
    var preskip = 0
    var lastGranule = -1L
    while (off < n) {
      if (n - off < 27) return rej(id, n, "ogg", "truncated_page")
      val i = off.toInt
      if (!(p(i) == 'O' && p(i + 1) == 'g' && p(i + 2) == 'g' &&
          p(i + 3) == 'S'))
        return rej(id, n, "ogg", "bad_page_magic")
      if ((p(i + 4) & 0xff) != 0) return rej(id, n, "ogg", "bad_version")
      val granule = le64(p, i + 6)
      val nsegs = p(i + 26) & 0xff
      if (n - off < 27 + nsegs) return rej(id, n, "ogg", "truncated_page")
      var body = 0L
      var s = 0
      while (s < nsegs) { body += (p(i + 27 + s) & 0xff); s += 1 }
      val bodyStart = off + 27 + nsegs
      if (bodyStart + body > n) return rej(id, n, "ogg", "truncated_page")
      if (first) {
        // the BOS page must carry the codec id header; only Opus is
        // parsed (Vorbis etc become a typed reject, not a guess)
        val b = bodyStart.toInt
        val isOpus = body >= 19 &&
          "OpusHead".indices.forall(k =>
            (p(b + k) & 0xff) == "OpusHead".charAt(k))
        if (!isOpus) return rej(id, n, "ogg", "unsupported_codec")
        chans = p(b + 9) & 0xff
        preskip = le16(p, b + 10)
        rate = le32(p, b + 12).toInt
        first = false
      }
      if (granule >= 0) lastGranule = math.max(lastGranule, granule)
      off = bodyStart + body
    }
    if (first) rej(id, n, "ogg", "no_pages")
    else if (lastGranule < 0) rej(id, n, "ogg", "no_granule")
    else MediaInfo(id, n, "ogg",
      Some(math.max(0L, lastGranule - preskip) * 1000L / 48000L),
      Some(rate), Some(chans), None, None, None, None, None)
  }

  // ---------------------------------------------------------------
  // Fixture encoders — minimal VALID files (used by the gate query
  // and the spec; also handy to smoke a real tool against the parser)
  // ---------------------------------------------------------------

  /** The Ogg page CRC (CRC-32, poly 0x04c11db7, no reflection, zero
    * init/xorout), computed with the crc field zeroed — emitted so the
    * fixture files check out under real tools, though [[parseOgg]]
    * itself does not verify it.
    */
  private def oggCrc(page: Array[Byte]): Int = {
    var crc = 0
    var i = 0
    while (i < page.length) {
      crc ^= (page(i) & 0xff) << 24
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80000000) != 0) (crc << 1) ^ 0x04c11db7
              else crc << 1
        b += 1
      }
      i += 1
    }
    crc
  }

  /** Minimal Ogg/Opus: a BOS page carrying OpusHead (version 1,
    * preskip 0) and an EOS page with a 1-byte packet whose granule
    * position is `totalSamples` (48 kHz units).
    */
  def encodeOggOpus(totalSamples: Long, inputRate: Int,
      channels: Int): Array[Byte] = {
    require(totalSamples >= 0 && inputRate > 0 && channels >= 1 &&
      channels <= 255, "encodeOggOpus")
    def page(headerType: Int, granule: Long, seq: Int,
        packet: Array[Byte]): Array[Byte] = {
      require(packet.length < 255, "single-segment fixture pages only")
      val out = new Array[Byte](27 + 1 + packet.length)
      out(0) = 'O'; out(1) = 'g'; out(2) = 'g'; out(3) = 'S'
      out(5) = headerType.toByte
      var g = granule
      (0 until 8).foreach { k => out(6 + k) = (g & 0xff).toByte; g >>= 8 }
      out(14) = 1 // serial 1, LE
      out(18) = seq.toByte
      out(26) = 1 // one lacing segment
      out(27) = packet.length.toByte
      System.arraycopy(packet, 0, out, 28, packet.length)
      val crc = oggCrc(out)
      (0 until 4).foreach(k => out(22 + k) = ((crc >> (8 * k)) & 0xff).toByte)
      out
    }
    val head = new Array[Byte](19)
    "OpusHead".indices.foreach(k => head(k) = "OpusHead".charAt(k).toByte)
    head(8) = 1 // version
    head(9) = channels.toByte
    head(12) = (inputRate & 0xff).toByte
    head(13) = ((inputRate >> 8) & 0xff).toByte
    head(14) = ((inputRate >> 16) & 0xff).toByte
    head(15) = ((inputRate >> 24) & 0xff).toByte
    page(0x02, 0L, 0, head) ++
      page(0x04, totalSamples, 1, Array[Byte](0))
  }

  /** Minimal VIDEO mp4: [[encodeMp4]]'s layout with ONE trak holding
    * a version-0 `tkhd` whose 16.16 presentation size is (w, h).
    * 232 bytes.
    */
  def encodeMp4Video(durationTicks: Long, timescale: Int,
      w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w < 0x10000 && h < 0x10000,
      "encodeMp4Video: dims must fit the 16.16 integer part")
    val base = encodeMp4(durationTicks, timescale, tracks = 0)
    val trak = new Array[Byte](8 + 8 + 84)
    def putBE(a: Array[Byte], off: Int, v: Long): Unit = {
      a(off) = (v >> 24).toByte; a(off + 1) = (v >> 16).toByte
      a(off + 2) = (v >> 8).toByte; a(off + 3) = v.toByte
    }
    def putType(a: Array[Byte], off: Int, s: String): Unit =
      s.indices.foreach(i => a(off + i) = s.charAt(i).toByte)
    putBE(trak, 0, trak.length.toLong); putType(trak, 4, "trak")
    putBE(trak, 8, 8 + 84); putType(trak, 12, "tkhd")
    putBE(trak, 16 + 76, w.toLong << 16)
    putBE(trak, 16 + 80, h.toLong << 16)
    // grow moov's size field to cover the appended trak
    val out = base ++ trak
    putBE(out, 16, (8 + 108 + trak.length).toLong)
    out
  }

  /** Minimal FLAC: magic + one last-flagged STREAMINFO block (no
    * audio frames — legal for the metadata layer this parser reads).
    */
  def encodeFlac(totalSamples: Long, sampleRate: Int, channels: Int): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20) && channels >= 1 &&
      channels <= 8 && totalSamples >= 0 && totalSamples < (1L << 36),
      "encodeFlac: fields out of STREAMINFO range")
    val out = new Array[Byte](4 + 4 + 34)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    out(4) = 0x80.toByte // last block, type 0 (STREAMINFO)
    out(7) = 34          // 24-bit block size
    val b = 8
    out(b + 10) = ((sampleRate >> 12) & 0xff).toByte
    out(b + 11) = ((sampleRate >> 4) & 0xff).toByte
    out(b + 12) = (((sampleRate & 0xf) << 4) | ((channels - 1) << 1)).toByte
    out(b + 13) = ((totalSamples >> 32) & 0x0f).toByte
    out(b + 14) = ((totalSamples >> 24) & 0xff).toByte
    out(b + 15) = ((totalSamples >> 16) & 0xff).toByte
    out(b + 16) = ((totalSamples >> 8) & 0xff).toByte
    out(b + 17) = (totalSamples & 0xff).toByte
    out
  }

  /** Minimal ISO-BMFF file: 16-byte `ftyp` (major isom) + `moov`
    * holding one version-0 `mvhd` (rate/volume/matrix zeroed — the
    * parser only reads timescale/duration) and `tracks` empty `trak`
    * boxes. 132 + 8·tracks bytes.
    */
  def encodeMp4(durationTicks: Long, timescale: Int, tracks: Int): Array[Byte] = {
    require(timescale > 0 && durationTicks >= 0 && durationTicks <= 0xffffffffL
      && tracks >= 0, "encodeMp4: v0 mvhd needs 32-bit duration, ts > 0")
    val moovSize = 8 + 108 + 8 * tracks
    val out = new Array[Byte](16 + moovSize)
    def putBE(off: Int, v: Long): Unit = {
      out(off) = (v >> 24).toByte; out(off + 1) = (v >> 16).toByte
      out(off + 2) = (v >> 8).toByte; out(off + 3) = v.toByte
    }
    def putType(off: Int, s: String): Unit =
      s.indices.foreach(i => out(off + i) = s.charAt(i).toByte)
    putBE(0, 16); putType(4, "ftyp"); putType(8, "isom"); putBE(12, 0)
    putBE(16, moovSize); putType(20, "moov")
    putBE(24, 108); putType(28, "mvhd")
    // version/flags 0, ctime 0, mtime 0 — then timescale, duration
    putBE(24 + 8 + 12, timescale.toLong)
    putBE(24 + 8 + 16, durationTicks)
    var off = 24 + 108
    (0 until tracks).foreach { _ =>
      putBE(off, 8); putType(off + 4, "trak"); off += 8
    }
    out
  }

  /** Minimal MPEG audio Layer III stream: `frames` silence frames at
    * a constant bitrate/samplerate, no ID3 tags, no padding bits.
    * `v1 = false` emits MPEG-2 (576 samples/frame).
    */
  def encodeMp3(frames: Int, v1: Boolean, bitrateKbps: Int,
      sampleRate: Int, mono: Boolean): Array[Byte] = {
    val brTable = if (v1) BrV1L3 else BrV2L3
    val brIdx = brTable.indexOf(bitrateKbps)
    val baseSr = if (v1) sampleRate else sampleRate * 2
    val srIdx = SrV1.indexOf(baseSr)
    require(frames > 0 && brIdx > 0 && srIdx >= 0,
      s"encodeMp3: unsupported (frames=$frames, br=$bitrateKbps, sr=$sampleRate)")
    val spf = if (v1) 1152 else 576
    val frameLen = (spf / 8) * (bitrateKbps * 1000) / sampleRate
    val out = new Array[Byte](frames * frameLen)
    (0 until frames).foreach { f =>
      val o = f * frameLen
      out(o) = 0xff.toByte
      out(o + 1) = (0xe0 | ((if (v1) 3 else 2) << 3) | (1 << 1) | 1).toByte
      out(o + 2) = ((brIdx << 4) | (srIdx << 2)).toByte
      out(o + 3) = (if (mono) 3 << 6 else 0).toByte
    }
    out
  }

  /** Minimal PCM-16 WAV: header + `samples` zero frames per channel. */
  def encodeWav(samples: Int, sampleRate: Int, channels: Int): Array[Byte] = {
    require(samples >= 0 && sampleRate > 0 && channels > 0, "encodeWav")
    val dataLen = samples * channels * 2
    val out = new Array[Byte](44 + dataLen)
    def putLE32(off: Int, v: Long): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    def putLE16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    def putType(off: Int, s: String): Unit =
      s.indices.foreach(i => out(off + i) = s.charAt(i).toByte)
    putType(0, "RIFF"); putLE32(4, 36L + dataLen); putType(8, "WAVE")
    putType(12, "fmt "); putLE32(16, 16); putLE16(20, 1)
    putLE16(22, channels); putLE32(24, sampleRate.toLong)
    putLE32(28, sampleRate.toLong * channels * 2)
    putLE16(32, channels * 2); putLE16(34, 16)
    putType(36, "data"); putLE32(40, dataLen.toLong)
    out
  }
}

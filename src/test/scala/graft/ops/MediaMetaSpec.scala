package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Container-metadata extraction ([[MediaMeta]]): encoder→parser
  * round-trips pin the exact duration arithmetic per container, every
  * typed reject fires on a hand-corrupted payload, and the map-only
  * probe catalogs a mixed relation end to end.
  */
class MediaMetaSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def info(p: Array[Byte]) = MediaMeta.parse(7L, p)

  test("mp4: round-trip duration/tracks; v1 mvhd; 64-bit box size") {
    val p = MediaMeta.encodeMp4(durationTicks = 90500, timescale = 1000,
      tracks = 2)
    val m = info(p)
    assert(m.reason.isEmpty && m.container == "mp4")
    assert(m.duration_ms.contains(90500L) && m.tracks.contains(2))
    assert(m.n_bytes == p.length.toLong)
    // non-1000 timescale: integer floor division
    val q = MediaMeta.encodeMp4(durationTicks = 48000 * 3 + 24000,
      timescale = 48000, tracks = 1)
    assert(info(q).duration_ms.contains(3500L))
    // version-1 mvhd (64-bit times): hand-build moov > mvhd v1
    val v1 = {
      val out = new Array[Byte](16 + 8 + 8 + 32)
      def be(off: Int, v: Long): Unit = {
        out(off) = (v >> 24).toByte; out(off + 1) = (v >> 16).toByte
        out(off + 2) = (v >> 8).toByte; out(off + 3) = v.toByte
      }
      def t(off: Int, s: String): Unit =
        s.indices.foreach(i => out(off + i) = s.charAt(i).toByte)
      be(0, 16); t(4, "ftyp"); t(8, "isom")
      be(16, 8 + 8 + 32); t(20, "moov")
      be(24, 8 + 32); t(28, "mvhd")
      out(32) = 1 // version 1
      // v1 layout: ver/flags 4 + ctime 8 + mtime 8 -> ts @ +20, dur @ +24
      be(32 + 20, 600)
      be(32 + 24, 0); be(32 + 28, 1200) // 64-bit duration = 1200 ticks
      out
    }
    val mv1 = info(v1)
    assert(mv1.reason.isEmpty && mv1.duration_ms.contains(2000L), mv1)
    // a largesize (size0 == 1) box before moov parses through
    val big = {
      val base = MediaMeta.encodeMp4(1000, 1000, 0)
      val free = new Array[Byte](24) // size=1, "free", largesize=24
      free(3) = 1
      "free".indices.foreach(i => free(4 + i) = "free".charAt(i).toByte)
      free(15) = 24
      base.take(16) ++ free ++ base.drop(16)
    }
    assert(info(big).duration_ms.contains(1000L), info(big))
  }

  test("mp4: tkhd presentation size surfaces as width/height") {
    val p = MediaMeta.encodeMp4Video(durationTicks = 7000, timescale = 1000,
      w = 640, h = 360)
    val m = info(p)
    assert(m.reason.isEmpty && m.container == "mp4")
    assert(m.width.contains(640) && m.height.contains(360))
    assert(m.tracks.contains(1) && m.duration_ms.contains(7000L))
    // audio-style mp4 (empty traks, no tkhd) keeps dims absent
    val a = info(MediaMeta.encodeMp4(5000, 1000, 2))
    assert(a.width.isEmpty && a.height.isEmpty && a.tracks.contains(2))
  }

  test("mp4: typed rejects — truncation, no moov, bad timescale") {
    val p = MediaMeta.encodeMp4(90500, 1000, 2)
    assert(info(p.dropRight(20)).reason.contains("truncated_box"))
    assert(info(p.take(16)).reason.contains("no_moov"))
    assert(info(MediaMeta.encodeMp4(500, 1000, 0).updated(44, 0.toByte)
      .updated(45, 0.toByte).updated(46, 0.toByte).updated(47, 0.toByte))
      .reason.contains("bad_timescale"))
  }

  test("mp3: V1/V2 round-trip, exact sample-count durations") {
    val v1 = MediaMeta.encodeMp3(frames = 38, v1 = true, bitrateKbps = 128,
      sampleRate = 44100, mono = false)
    val m1 = info(v1)
    assert(m1.reason.isEmpty && m1.container == "mp3")
    assert(m1.frames.contains(38) && m1.sample_rate.contains(44100) &&
      m1.channels.contains(2))
    assert(m1.duration_ms.contains(38L * 1152 * 1000 / 44100))
    val v2 = MediaMeta.encodeMp3(frames = 25, v1 = false, bitrateKbps = 64,
      sampleRate = 22050, mono = true)
    val m2 = info(v2)
    assert(m2.frames.contains(25) && m2.sample_rate.contains(22050) &&
      m2.channels.contains(1))
    assert(m2.duration_ms.contains(25L * 576 * 1000 / 22050))
  }

  test("mp3: ID3v2 skip, trailing ID3v1, and the typed rejects") {
    val body = MediaMeta.encodeMp3(5, v1 = true, bitrateKbps = 128,
      sampleRate = 44100, mono = true)
    // ID3v2 header: "ID3", ver, flags, syncsafe size 200
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 1, 72) ++
      new Array[Byte](200)
    val withTag = id3 ++ body
    assert(info(withTag).frames.contains(5))
    assert(info(withTag).n_bytes == withTag.length.toLong)
    // trailing ID3v1: 128-byte "TAG..." block after the last frame
    val v1tag = body ++ ("TAG".getBytes ++ new Array[Byte](125))
    assert(info(v1tag).frames.contains(5))
    // ID3v2.4 FOOTER flag (0x10): the tag occupies 10 + size + 10
    // bytes — without the extra skip the parser lands on the footer
    // and false-rejects a valid file
    val footered = {
      val h = Array[Byte]('I', 'D', '3', 4, 0, 0x10, 0, 0, 0, 20)
      h ++ new Array[Byte](20) ++ ("3DI".getBytes ++ new Array[Byte](7)) ++
        body
    }
    assert(info(footered).frames.contains(5), info(footered))
    assert(info(body.dropRight(3)).reason.contains("truncated_frame"))
    // first sync ok, second frame header corrupted
    val desync = body.clone
    desync(417) = 0x00
    assert(info(desync).reason.contains("mid_stream_desync"))
    // layer II header (layer bits = 2)
    val l2 = body.clone
    l2(1) = (0xe0 | (3 << 3) | (2 << 1) | 1).toByte
    assert(info(l2).reason.contains("unsupported_layer"))
    // free-format bitrate (index 0)
    val free = body.clone
    free(2) = 0
    assert(info(free).reason.contains("free_bitrate"))
  }

  test("wav: round-trip duration/rate/channels; rejects") {
    val p = MediaMeta.encodeWav(samples = 4000, sampleRate = 8000,
      channels = 2)
    val m = info(p)
    assert(m.reason.isEmpty && m.container == "wav")
    assert(m.duration_ms.contains(500L) && m.sample_rate.contains(8000) &&
      m.channels.contains(2))
    assert(info(p.dropRight(5)).reason.contains("truncated_chunk"))
    assert(info(p.take(36)).reason.contains("no_data"))
  }

  test("flac: STREAMINFO bit fields round-trip; rejects") {
    val p = MediaMeta.encodeFlac(totalSamples = 441000, sampleRate = 44100,
      channels = 2)
    val m = info(p)
    assert(m.reason.isEmpty && m.container == "flac")
    assert(m.duration_ms.contains(10000L) && m.sample_rate.contains(44100) &&
      m.channels.contains(2))
    // non-typical rate exercises the full 20-bit field
    val hi = info(MediaMeta.encodeFlac(96000, 96000, 8))
    assert(hi.duration_ms.contains(1000L) && hi.sample_rate.contains(96000)
      && hi.channels.contains(8))
    assert(info(p.take(20)).reason.contains("truncated_block"))
    // a last-flagged non-STREAMINFO block only → no_streaminfo
    val noSi = p.clone
    noSi(4) = (0x80 | 4).toByte // VORBIS_COMMENT
    assert(info(noSi).reason.contains("no_streaminfo"))
  }

  test("ogg/opus: terminal granule gives the exact duration; rejects") {
    val p = MediaMeta.encodeOggOpus(totalSamples = 96000, inputRate = 48000,
      channels = 2)
    val m = info(p)
    assert(m.reason.isEmpty && m.container == "ogg", m)
    assert(m.duration_ms.contains(2000L) && m.sample_rate.contains(48000) &&
      m.channels.contains(2))
    // Opus granules are 48 kHz regardless of the declared input rate
    val m2 = info(MediaMeta.encodeOggOpus(24000, inputRate = 16000,
      channels = 1))
    assert(m2.duration_ms.contains(500L) && m2.sample_rate.contains(16000))
    assert(info(p.dropRight(3)).reason.contains("truncated_page"))
    // a BOS page carrying a non-Opus id header is a typed reject
    val vorb = p.clone
    "VorbisXX".indices.foreach(k => vorb(28 + k) = "VorbisXX".charAt(k).toByte)
    assert(info(vorb).reason.contains("unsupported_codec"))
  }

  test("avi/gvf delegate to the video demux; unknown/empty reject") {
    val gvf = {
      val out = new Array[Byte](16 + 3 * 4 * 3 * 2) // 4x3, 2 frames
      out(0) = 'G'; out(1) = 'V'; out(2) = 'F'; out(3) = '1'
      out(7) = 4; out(11) = 3; out(15) = 2
      out
    }
    val m = info(gvf)
    assert(m.container == "gvf" && m.reason.isEmpty)
    assert(m.width.contains(4) && m.height.contains(3) &&
      m.frames.contains(2))
    assert(info("nonsense payload".getBytes).reason
      .contains("unsupported_format"))
    assert(info(Array.empty[Byte]).reason.contains("empty_payload"))
  }

  test("probe: map-only catalog over a mixed relation") {
    import spark.implicits._
    val rows = Seq(
      (1L, MediaMeta.encodeMp4(5000, 1000, 1)),
      (2L, MediaMeta.encodeMp3(10, v1 = true, bitrateKbps = 128,
        sampleRate = 44100, mono = true)),
      (3L, MediaMeta.encodeWav(800, 8000, 1)),
      (4L, "junk".getBytes)).toDF("doc_id", "payload")
    val got = MediaMeta.probe(rows, "doc_id", "payload")
      .collect().map(m => m.id -> m).toMap
    assert(got(1L).container == "mp4" && got(1L).duration_ms.contains(5000L))
    assert(got(2L).container == "mp3" && got(2L).frames.contains(10))
    assert(got(3L).container == "wav" && got(3L).duration_ms.contains(100L))
    assert(got(4L).reason.contains("unsupported_format"))
  }
}

package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Native GIF87a/89a decode ([[Gif]]): the LZW coder round-trips and
  * is pinned against the JDK's INDEPENDENT ImageIO GIF implementation
  * (both directions of the seam — our encoder's bytes through their
  * decoder, frame-for-frame, pixel-for-pixel), composition covers
  * sub-rects / transparency / all disposal methods against a tiny
  * reference compositor, interlace round-trips, the structure-only
  * [[Gif.meta]] walk matches, and the decoder is TOTAL over mutated
  * payloads (typed rejects, never throws).
  */
class GifSpec extends AnyFunSuite {

  /** 64-color deterministic palette (the q242 fixture's). */
  private val pal64: Array[Int] = Array.tabulate(64)(i =>
    (((i * 37 + 11) % 256) << 16) | (((i * 59 + 3) % 256) << 8) |
      ((i * 83 + 7) % 256))

  private def fullFrame(w: Int, h: Int, f: Int, seed: Long): Array[Byte] =
    Array.tabulate(w * h)(i =>
      (((i % w) + 7 * (i / w) + 11 * f + seed) % 64).toByte)

  /** All frames of a GIF payload through the JDK's own reader — raw
    * per-image rects, no composition (callers use full-frame fixtures).
    */
  private def jdkFrames(p: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    assert(it.hasNext, "JDK GIF reader missing")
    val reader = it.next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(p))
    reader.setInput(iis)
    val n = reader.getNumImages(true)
    val out = (0 until n).map(reader.read)
    reader.dispose(); iis.close()
    out
  }

  private def gvfPixel(v: VideoHash.Gvf, f: Int, x: Int, y: Int): Int = {
    val o = VideoHash.HeaderLen + 3 * ((f * v.h + y) * v.w + x)
    ((v.bytes(o) & 0xff) << 16) | ((v.bytes(o + 1) & 0xff) << 8) |
      (v.bytes(o + 2) & 0xff)
  }

  test("JDK cross-check: our encoder's bytes decode identically under " +
      "ImageIO and our decoder (3 frames, 64 colors)") {
    val (w, h) = (40, 30)
    val frames = (0 until 3).map(f => Gif.Frame(0, 0, w, h,
      fullFrame(w, h, f, seed = 5), delayCs = 6))
    val p = Gif.encodeGif(w, h, pal64, bg = 0, frames)
    val ours = Gif.decodeGif(p).toOption.get
    assert(ours.w == w && ours.h == h && ours.n == 3)
    val theirs = jdkFrames(p)
    assert(theirs.size == 3)
    for (f <- 0 until 3; y <- 0 until h; x <- 0 until w) {
      assert((theirs(f).getRGB(x, y) & 0xffffff) == gvfPixel(ours, f, x, y),
        s"pixel mismatch at f=$f ($x,$y)")
      val want = pal64(fullFrame(w, h, f, 5)(y * w + x) & 0xff)
      assert(gvfPixel(ours, f, x, y) == want)
    }
  }

  test("LZW width growth to 12 bits and table-full CLEAR: high-entropy " +
      "256-color image round-trips and matches ImageIO") {
    val (w, h) = (200, 160) // 32k pixels: forces >4096 table entries
    val pal = Array.tabulate(256)(i =>
      (((i * 31 + 1) % 256) << 16) | (((i * 97 + 5) % 256) << 8) |
        ((i * 13 + 9) % 256))
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((x * 7 + y * 13 + x * y + (x * x + y) % 41) % 256).toByte
    }
    val p = Gif.encodeGif(w, h, pal, 0,
      Seq(Gif.Frame(0, 0, w, h, px)))
    val ours = Gif.decodeGif(p).toOption.get
    val theirs = jdkFrames(p)
    for (y <- 0 until h; x <- 0 until w) {
      assert(gvfPixel(ours, 0, x, y) == pal(px(y * w + x) & 0xff))
      assert((theirs(0).getRGB(x, y) & 0xffffff) == gvfPixel(ours, 0, x, y))
    }
  }

  test("KwKwK and degenerate sizes: constant runs, 1x1, 2-color palette") {
    // all-same-index image: every step is the code == next case family
    val pal2 = Array(0x000000, 0xffffff)
    val runs = Gif.encodeGif(10, 10, pal2, 0,
      Seq(Gif.Frame(0, 0, 10, 10, Array.fill(100)(1.toByte))))
    val v = Gif.decodeGif(runs).toOption.get
    for (y <- 0 until 10; x <- 0 until 10)
      assert(gvfPixel(v, 0, x, y) == 0xffffff)
    val theirs = jdkFrames(runs)
    for (y <- 0 until 10; x <- 0 until 10)
      assert((theirs(0).getRGB(x, y) & 0xffffff) == 0xffffff)
    // 1x1 single pixel
    val one = Gif.encodeGif(1, 1, pal64, 0,
      Seq(Gif.Frame(0, 0, 1, 1, Array(17.toByte))))
    val v1 = Gif.decodeGif(one).toOption.get
    assert(v1.w == 1 && v1.h == 1 && v1.n == 1)
    assert(gvfPixel(v1, 0, 0, 0) == pal64(17))
  }

  test("interlaced image decodes to the same pixels as progressive " +
      "(and matches ImageIO)") {
    val (w, h) = (23, 17) // odd dims exercise all four pass boundaries
    val px = fullFrame(w, h, 1, seed = 9)
    val prog = Gif.encodeGif(w, h, pal64, 0, Seq(Gif.Frame(0, 0, w, h, px)))
    val inter = Gif.encodeGif(w, h, pal64, 0,
      Seq(Gif.Frame(0, 0, w, h, px, interlaced = true)))
    val a = Gif.decodeGif(prog).toOption.get
    val b = Gif.decodeGif(inter).toOption.get
    val theirs = jdkFrames(inter)
    for (y <- 0 until h; x <- 0 until w) {
      assert(gvfPixel(a, 0, x, y) == gvfPixel(b, 0, x, y))
      assert((theirs(0).getRGB(x, y) & 0xffffff) == gvfPixel(b, 0, x, y))
    }
  }

  test("composition: sub-rects, transparency, disposal 2 (background) " +
      "and 3 (previous), local palettes — vs a reference compositor") {
    val (w, h) = (8, 6)
    val palL = Array.tabulate(8)(i => (i * 0x111111) | 0x040201)
    val f0 = Gif.Frame(0, 0, w, h,
      Array.tabulate(w * h)(i => (i % 4).toByte), disposal = 1)
    // sub-rect drawn then RESTORED TO BACKGROUND after its snapshot
    val f1 = Gif.Frame(2, 1, 4, 3,
      Array.tabulate(12)(i => (4 + i % 3).toByte), disposal = 2)
    // transparent holes over the post-disposal canvas, local palette
    val f2 = Gif.Frame(1, 2, 5, 4,
      Array.tabulate(20)(i => (i % 3).toByte),
      disposal = 3, transparent = 1, palette = Some(palL))
    // after f2's disposal-3, canvas reverts to the pre-f2 state
    val f3 = Gif.Frame(0, 0, 2, 2, Array.fill(4)(9.toByte), disposal = 0)
    val frames = Seq(f0, f1, f2, f3)
    val p = Gif.encodeGif(w, h, pal64, bg = 5, frames)
    val v = Gif.decodeGif(p).toOption.get
    assert(v.n == 4)

    // reference compositor: same rules, independent arithmetic
    val bg = pal64(5)
    var canvas = Array.fill(w * h)(bg)
    val expect = frames.map { f =>
      val saved = if (f.disposal == 3) canvas.clone() else null
      val pal = f.palette.getOrElse(pal64)
      for (r <- 0 until f.fh; c <- 0 until f.fw) {
        val idx = f.indices(r * f.fw + c) & 0xff
        if (idx != f.transparent)
          canvas((f.top + r) * w + f.left + c) = pal(idx)
      }
      val snap = canvas.clone()
      f.disposal match {
        case 2 =>
          for (r <- 0 until f.fh; c <- 0 until f.fw)
            canvas((f.top + r) * w + f.left + c) = bg
        case 3 => canvas = saved
        case _ => ()
      }
      snap
    }
    for (f <- 0 until 4; y <- 0 until h; x <- 0 until w)
      assert(gvfPixel(v, f, x, y) == expect(f)(y * w + x),
        s"composition mismatch at f=$f ($x,$y)")
    // canvas actually changed per frame (the fixture isn't degenerate)
    assert(expect.map(_.toSeq).distinct.size == 4)
  }

  test("meta: structure-only dims/frames/duration; MediaMeta catalogs " +
      "gif with duration; decodeVideo dispatches on magic") {
    val frames = (0 until 3).map(f => Gif.Frame(0, 0, 12, 7,
      fullFrame(12, 7, f, 3), delayCs = 5 + f))
    val p = Gif.encodeGif(12, 7, pal64, 0, frames)
    val m = Gif.meta(p).toOption.get
    assert(m == Gif.GifMeta(12, 7, 3, (5 + 6 + 7) * 10L))
    val mi = MediaMeta.parse(3L, p)
    assert(mi.container == "gif" && mi.reason.isEmpty)
    assert(mi.width.contains(12) && mi.height.contains(7) &&
      mi.frames.contains(3) && mi.duration_ms.contains(180L))
    val viaDispatch = VideoHash.decodeVideo(p).toOption.get
    assert(viaDispatch.w == 12 && viaDispatch.h == 7 && viaDispatch.n == 3)
    // the decoded plane feeds the video kernels directly
    assert(VideoHash.frameLumSums(viaDispatch).length == 3)
  }

  test("format independence: the same footage as GIF and as GVF1 decodes " +
      "to BIT-IDENTICAL planes, so every fingerprint agrees") {
    val (w, h, n) = (18, 12, 4)
    val idx = (0 until n).map(f => fullFrame(w, h, f, seed = 21))
    val gif = Gif.encodeGif(w, h, pal64, 0,
      idx.zipWithIndex.map { case (px, f) =>
        Gif.Frame(0, 0, w, h, px, interlaced = f % 2 == 1) })
    val gvf = new Array[Byte](VideoHash.HeaderLen + 3 * w * h * n)
    gvf(0) = 'G'; gvf(1) = 'V'; gvf(2) = 'F'; gvf(3) = '1'
    def be(o: Int, v: Int): Unit = {
      gvf(o) = (v >> 24).toByte; gvf(o + 1) = (v >> 16).toByte
      gvf(o + 2) = (v >> 8).toByte; gvf(o + 3) = v.toByte
    }
    be(4, w); be(8, h); be(12, n)
    for (f <- 0 until n; i <- 0 until w * h) {
      val rgb = pal64(idx(f)(i) & 0xff)
      val o = VideoHash.HeaderLen + 3 * (f * w * h + i)
      gvf(o) = ((rgb >> 16) & 0xff).toByte
      gvf(o + 1) = ((rgb >> 8) & 0xff).toByte
      gvf(o + 2) = (rgb & 0xff).toByte
    }
    val a = VideoHash.decodeVideo(gif).toOption.get
    val b = VideoHash.decodeVideo(gvf).toOption.get
    assert(java.util.Arrays.equals(a.bytes, b.bytes),
      "GIF and GVF planes diverged")
    // the whole fingerprint stack therefore agrees bit-for-bit
    assert(VideoHash.frameLumSums(a).toSeq === VideoHash.frameLumSums(b).toSeq)
    assert(VideoHash.frameDiffs(a).map(_.toSeq).toSeq ===
      VideoHash.frameDiffs(b).map(_.toSeq).toSeq)
  }

  /** A STRICT spec-schedule GIF-LZW reader: consumes codes through the
    * EOI (which the repo decoder and ImageIO never read — they stop at
    * pixel count), erroring if the stream runs dry or over-produces.
    * Pins the encoder's width accounting on the FINAL code: the
    * decoder-side table add for it can bump the width, and EOI must be
    * written at the bumped width for validating decoders.
    */
  private def strictLzwDecode(gif: Array[Byte]): Array[Byte] = {
    def le16(o: Int) = (gif(o) & 0xff) | ((gif(o + 1) & 0xff) << 8)
    val w = le16(6); val h = le16(8)
    var off = 13 + (if ((gif(10) & 0x80) != 0) 3 * (2 << (gif(10) & 7)) else 0)
    while ((gif(off) & 0xff) == 0x21) { // skip extensions
      off += 2
      while ((gif(off) & 0xff) != 0) off += 1 + (gif(off) & 0xff)
      off += 1
    }
    assert((gif(off) & 0xff) == 0x2c)
    off += 10 // full-frame fixtures: no LCT
    val minCode = gif(off) & 0xff; off += 1
    val data = new java.io.ByteArrayOutputStream()
    while ((gif(off) & 0xff) != 0) {
      val len = gif(off) & 0xff
      data.write(gif, off + 1, len); off += 1 + len
    }
    val bytesIn = data.toByteArray
    val clear = 1 << minCode; val eoi = clear + 1
    val prefix = new Array[Int](4096); val suffix = new Array[Byte](4096)
    var next = clear + 2; var width = minCode + 1; var prev = -1
    var acc = 0L; var bits = 0; var pos = 0
    val out = new java.io.ByteArrayOutputStream()
    def firstOf(c0: Int): Byte = {
      var c = c0; while (c >= clear + 2) c = prefix(c); c.toByte
    }
    def emit(c0: Int, extra: Int): Unit = {
      val stack = scala.collection.mutable.ArrayBuffer.empty[Byte]
      if (extra >= 0) stack += extra.toByte
      var c = c0
      while (c >= clear + 2) { stack += suffix(c); c = prefix(c) }
      stack += c.toByte
      stack.reverse.foreach(out.write(_))
    }
    var done = false
    while (!done) {
      while (bits < width) {
        assert(pos < bytesIn.length,
          s"strict decoder ran out of data reading a $width-bit code " +
            s"(next=$next) — encoder/decoder width schedules diverged")
        acc |= (bytesIn(pos) & 0xffL) << bits; bits += 8; pos += 1
      }
      val code = (acc & ((1 << width) - 1)).toInt
      acc >>>= width; bits -= width
      if (code == clear) { next = clear + 2; width = minCode + 1; prev = -1 }
      else if (code == eoi) done = true
      else if (prev == -1) { emit(code, -1); prev = code }
      else {
        if (code == next) emit(prev, firstOf(prev) & 0xff)
        else { assert(code < next, s"code $code past table $next"); emit(code, -1) }
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = if (code == next) firstOf(prev) else firstOf(code)
          if (next == (1 << width) - 1 && width < 12) width += 1
          next += 1
        }
        prev = code
      }
    }
    val px = out.toByteArray
    assert(px.length == w * h, s"strict decode: ${px.length} != ${w * h}")
    px
  }

  test("strict-schedule LZW: EOI is consumed at the correct width over " +
      "many randomized streams (incl. width-bump-boundary cases)") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 0 until 300) {
      val w = 3 + rnd.nextInt(30)
      val h = 3 + rnd.nextInt(24)
      val palBits = 1 + rnd.nextInt(7) // 2..128 colors
      val palN = 1 << palBits
      val pal = Array.tabulate(palN)(i => i * 0x010203)
      // mix of high-entropy and runny streams to sweep boundary cases
      val px = Array.tabulate(w * h) { i =>
        if (trial % 3 == 0) (rnd.nextInt(palN)).toByte
        else if (trial % 3 == 1) ((i / (1 + trial % 7)) % palN).toByte
        else ((i * 31 + trial) % palN).toByte
      }
      val gif = Gif.encodeGif(w, h, pal, 0, Seq(Gif.Frame(0, 0, w, h, px)))
      assert(strictLzwDecode(gif).toSeq === px.toSeq, s"trial $trial")
      // and our own decoder agrees
      val v = Gif.decodeGif(gif).toOption.get
      for (i <- 0 until w * h)
        assert(gvfPixel(v, 0, i % w, i / w) == pal(px(i) & 0xff))
    }
  }

  test("typed rejects and totality: truncation, bad rects, fuzzed bytes") {
    val good = Gif.encodeGif(9, 9, pal64, 0,
      Seq(Gif.Frame(0, 0, 9, 9, fullFrame(9, 9, 0, 1))))
    assert(Gif.decodeGif("GIF8".getBytes) == Left("unsupported_format"))
    assert(Gif.decodeGif("GIF89a".getBytes) == Left("corrupt_video"))
    // crafted huge dimensions must typed-reject BEFORE any allocation:
    // 65535×65535 overflows Int (NegativeArraySizeException unguarded),
    // and a small payload declaring many frames over a large screen
    // must not accumulate gigabytes of canvas clones
    val huge = "GIF89a".getBytes ++ Array[Byte](
      -1, -1, -1, -1, 0, 0, 0) // w = h = 0xffff, no GCT
    assert(Gif.decodeGif(huge) == Left("corrupt_video"))
    val wide = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIF89a".getBytes)
      out.write(Array[Byte](-1, 127, -1, 127, 0, 0, 0)) // 32767×32767
      out.toByteArray
    }
    assert(Gif.decodeGif(wide) == Left("corrupt_video")) // 3·w·h > MaxInt
    assert(Gif.decodeGif(good.dropRight(5)) == Left("corrupt_video"))
    assert(Gif.meta(good.dropRight(5)) == Left("corrupt_video"))
    assert(Gif.decodeGif(Array.emptyByteArray) == Left("empty_payload"))
    // frame rect outside the logical screen
    val badRect = good.clone()
    // image descriptor: find 0x2c introducer (after 13 + GCT + GCE)
    val imgAt = good.indexWhere(_ == 0x2c, 13)
    badRect(imgAt + 5) = 99.toByte // fw low byte -> 99 > screen w
    assert(Gif.decodeGif(badRect) == Left("corrupt_video"))
    // totality: every single-byte mutation decodes or rejects, never throws
    for (i <- good.indices; delta <- Seq(1, 0x80)) {
      val mut = good.clone()
      mut(i) = (mut(i) + delta).toByte
      Gif.decodeGif(mut)
      Gif.meta(mut)
    }
    // truncation at every length never throws
    for (len <- 0 until good.length) {
      Gif.decodeGif(good.take(len)); Gif.meta(good.take(len))
    }
  }
}

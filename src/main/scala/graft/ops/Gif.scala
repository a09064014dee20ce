package graft.ops

/** Pure-JVM GIF87a/GIF89a decoder — the third REAL container behind
  * the [[VideoHash.decodeVideo]] seam (after RIFF/AVI-MJPEG and the
  * GVF1 stand-in) and the first whose entropy coding is decoded
  * natively: the LZW variant GIF mandates (LSB-first variable-width
  * codes, CLEAR/EOI, 12-bit cap) is ~80 lines of table arithmetic, so
  * unlike H.264/MP3 it fits the no-dependency sandbox as a complete,
  * bit-exact implementation rather than a typed reject. Animated GIFs
  * are genuinely a video container (frame sequence + per-frame delay),
  * so the decode lands in the same [[VideoHash.Gvf]] RGB24 plane every
  * video kernel reads — fingerprints, temporal grids, frame votes all
  * apply unchanged.
  *
  * Implemented surface (the full static/animated format):
  *   - logical screen descriptor, global + local color tables,
  *   - LZW image data (variable code width 3..12, CLEAR handling
  *     including encoder-deferred clears, the KwKwK `code == next`
  *     case),
  *   - interlaced images (the 8/8/4/2 four-pass row order),
  *   - frame COMPOSITION over the logical screen: sub-rectangle
  *     frames, transparency (transparent pixels leave the canvas),
  *     and disposal methods 0/1 (leave), 2 (restore the frame's rect
  *     to the background color) and 3 (restore the previous canvas),
  *   - graphic control / comment / application / plain-text extension
  *     blocks (non-GCE extensions skipped by sub-block length).
  *
  * Composition note: "restore to background" writes the global color
  * table's background COLOR (the GIF89a reading; some renderers write
  * transparent instead — with no alpha in the RGB24 plane the color is
  * the deterministic choice, and it only differs on streams that
  * actually use disposal 2 over later-uncovered pixels).
  *
  * Rejects follow the [[VideoHash]] typed vocabulary: `empty_payload`,
  * `unsupported_format` (magic mismatch), `corrupt_video` (truncated
  * blocks, LZW codes past the table, frame rects outside the screen,
  * pixel data that ends early, frames with no color table).
  *
  * [[meta]] is the structure-only twin for the [[MediaMeta]] catalog:
  * dimensions, frame count and total duration from the block walk
  * alone — data sub-blocks are SKIPPED by length, never LZW-decoded,
  * keeping the catalog pass byte-cheap (the MediaMeta discipline).
  *
  * 100 TB shape: like every decode kernel, this runs inside the one
  * map-only fingerprint pass — payload bytes never shuffle; the
  * decoder allocates the canvas + one 4096-entry table per payload.
  */
object Gif {

  /** Structure-only catalog row: logical screen dims, image count,
    * total animation duration (Σ per-frame delays; GIF delays are
    * centiseconds, so `durationMs` is exact ×10 arithmetic).
    */
  final case class GifMeta(w: Int, h: Int, frames: Int, durationMs: Long)

  def isGif(p: Array[Byte]): Boolean =
    p != null && p.length >= 6 &&
      p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
      (p(4) == '7' || p(4) == '9') && p(5) == 'a'

  private def le16(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)

  /** Skip a sub-block chain starting at `off`; returns the offset just
    * past the 0 terminator, or -1 when truncated.
    */
  private def skipSubBlocks(p: Array[Byte], off0: Int): Int = {
    var off = off0
    while (off < p.length) {
      val len = p(off) & 0xff
      if (len == 0) return off + 1
      if (off + 1 + len > p.length) return -1
      off += 1 + len
    }
    -1
  }

  // ------------------------------------------------------------------
  // Decode
  // ------------------------------------------------------------------

  /** Decode a complete GIF payload into the [[VideoHash.Gvf]] RGB24
    * frame plane (one frame per image descriptor, each the FULL
    * logical screen after composition).
    */
  def decodeGif(payload: Array[Byte]): Either[String, VideoHash.Gvf] = {
    if (payload == null || payload.isEmpty) return Left("empty_payload")
    if (!isGif(payload)) return Left("unsupported_format")
    val p = payload
    if (p.length < 13) return Left("corrupt_video")
    val w = le16(p, 6)
    val h = le16(p, 8)
    if (w <= 0 || h <= 0) return Left("corrupt_video")
    // structural allocation bound BEFORE any canvas allocation: a
    // single frame must fit the Gvf plane (w·h up to 65535² overflows
    // Int — unguarded, a 13-byte crafted header would throw
    // NegativeArraySizeException out of the typed-reject contract or
    // force a multi-GB allocation)
    val pixels = w.toLong * h
    if (3L * pixels + 16 > Int.MaxValue) return Left("corrupt_video")
    val packed = p(10) & 0xff
    val hasGct = (packed & 0x80) != 0
    val gctSize = 2 << (packed & 7)
    val bgIndex = p(11) & 0xff
    var off = 13
    val gct: Array[Int] =
      if (hasGct) {
        if (off + 3 * gctSize > p.length) return Left("corrupt_video")
        val t = readPalette(p, off, gctSize)
        off += 3 * gctSize
        t
      } else null
    val bg: Int =
      if (gct != null && bgIndex < gct.length) gct(bgIndex) else 0

    // composition canvas: one RGB int per logical-screen pixel
    val canvas = Array.fill(w * h)(bg)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    var pendingDisposal = 0
    var pendingTransparent = -1
    var sawTrailer = false

    while (!sawTrailer) {
      if (off >= p.length) return Left("corrupt_video")
      (p(off) & 0xff) match {
        case 0x3b => // trailer
          sawTrailer = true

        case 0x21 => // extension
          if (off + 2 > p.length) return Left("corrupt_video")
          val label = p(off + 1) & 0xff
          if (label == 0xf9) { // graphic control
            if (off + 3 > p.length) return Left("corrupt_video")
            val blen = p(off + 2) & 0xff
            if (blen < 4 || off + 3 + blen > p.length)
              return Left("corrupt_video")
            val gpacked = p(off + 3) & 0xff
            pendingDisposal = (gpacked >> 2) & 7
            pendingTransparent =
              if ((gpacked & 1) != 0) p(off + 6) & 0xff else -1
          }
          off = skipSubBlocks(p, off + 2)
          if (off < 0) return Left("corrupt_video")

        case 0x2c => // image descriptor
          if (off + 10 > p.length) return Left("corrupt_video")
          val left = le16(p, off + 1)
          val top = le16(p, off + 3)
          val fw = le16(p, off + 5)
          val fh = le16(p, off + 7)
          val ipacked = p(off + 9) & 0xff
          if (fw <= 0 || fh <= 0 || left + fw > w || top + fh > h)
            return Left("corrupt_video")
          val interlaced = (ipacked & 0x40) != 0
          var ioff = off + 10
          val lct: Array[Int] =
            if ((ipacked & 0x80) != 0) {
              val lctSize = 2 << (ipacked & 7)
              if (ioff + 3 * lctSize > p.length) return Left("corrupt_video")
              val t = readPalette(p, ioff, lctSize)
              ioff += 3 * lctSize
              t
            } else gct
          if (lct == null) return Left("corrupt_video") // no color table at all
          if (ioff >= p.length) return Left("corrupt_video")
          val minCode = p(ioff) & 0xff
          if (minCode < 2 || minCode > 8) return Left("corrupt_video")
          ioff += 1
          val indices = new Array[Byte](fw * fh)
          val after = lzwDecode(p, ioff, minCode, indices)
          if (after < 0) return Left("corrupt_video")
          ioff = after

          // compose: disposal 3 snapshots BEFORE drawing
          val saved: Array[Int] =
            if (pendingDisposal == 3) canvas.clone() else null
          var r = 0
          while (r < fh) {
            val destRow = if (interlaced) deinterlaceRow(r, fh) else r
            var c = 0
            while (c < fw) {
              val idx = indices(r * fw + c) & 0xff
              if (idx != pendingTransparent) {
                if (idx >= lct.length) return Left("corrupt_video")
                canvas((top + destRow) * w + left + c) = lct(idx)
              }
              c += 1
            }
            r += 1
          }
          // the Gvf total bound, enforced per frame BEFORE the clone —
          // a small payload declaring thousands of frames over a large
          // screen must reject, not accumulate gigabytes of clones
          if (16L + 3L * pixels * (frames.length + 1) > Int.MaxValue)
            return Left("corrupt_video")
          frames += canvas.clone()
          pendingDisposal match {
            case 2 =>
              var y = top
              while (y < top + fh) {
                var x = left
                while (x < left + fw) { canvas(y * w + x) = bg; x += 1 }
                y += 1
              }
            case 3 => System.arraycopy(saved, 0, canvas, 0, canvas.length)
            case _ => ()
          }
          pendingDisposal = 0
          pendingTransparent = -1
          off = ioff

        case _ => return Left("corrupt_video")
      }
    }
    if (frames.isEmpty) return Left("corrupt_video")
    val n = frames.length
    val total = 16L + 3L * pixels * n // ≤ Int.MaxValue by the per-frame bound
    val bytes = new Array[Byte](total.toInt)
    bytes(0) = 'G'; bytes(1) = 'V'; bytes(2) = 'F'; bytes(3) = '1'
    def putIntBE(o: Int, v: Int): Unit = {
      bytes(o) = (v >> 24).toByte; bytes(o + 1) = (v >> 16).toByte
      bytes(o + 2) = (v >> 8).toByte; bytes(o + 3) = v.toByte
    }
    putIntBE(4, w); putIntBE(8, h); putIntBE(12, n)
    var f = 0
    while (f < n) {
      val fr = frames(f)
      var i = 0
      while (i < fr.length) {
        val rgb = fr(i)
        val o = 16 + 3 * (f * w * h + i)
        bytes(o) = ((rgb >> 16) & 0xff).toByte
        bytes(o + 1) = ((rgb >> 8) & 0xff).toByte
        bytes(o + 2) = (rgb & 0xff).toByte
        i += 1
      }
      f += 1
    }
    Right(VideoHash.Gvf(w, h, n, bytes))
  }

  /** Interlaced GIFs store rows in four passes (every 8th from 0, every
    * 8th from 4, every 4th from 2, every 2nd from 1): sequential stored
    * row `r` of an `fh`-row image lands on this display row.
    */
  private def deinterlaceRow(r: Int, fh: Int): Int = {
    val p1 = (fh + 7) / 8          // rows in pass 1
    val p2 = (fh + 3) / 8          // pass 2: rows ≡ 4 (mod 8)
    val p3 = (fh + 1) / 4          // pass 3: rows ≡ 2 (mod 4)
    if (r < p1) r * 8
    else if (r < p1 + p2) 4 + (r - p1) * 8
    else if (r < p1 + p2 + p3) 2 + (r - p1 - p2) * 4
    else 1 + (r - p1 - p2 - p3) * 2
  }

  private def readPalette(p: Array[Byte], off: Int, size: Int): Array[Int] = {
    val t = new Array[Int](size)
    var i = 0
    while (i < size) {
      t(i) = ((p(off + 3 * i) & 0xff) << 16) |
        ((p(off + 3 * i + 1) & 0xff) << 8) | (p(off + 3 * i + 2) & 0xff)
      i += 1
    }
    t
  }

  /** GIF-LZW decode of the sub-block chain at `off` into exactly
    * `out.length` pixel indices. Returns the offset just past the
    * chain's 0 terminator, or -1 on any corruption (code past the
    * table, data exhausted before the pixel count, truncated blocks).
    * Handles CLEAR (including mid-stream resets), EOI, the KwKwK
    * `code == next` case, and encoder-deferred clears (a full table
    * simply stops growing).
    */
  private def lzwDecode(
      p: Array[Byte], off0: Int, minCode: Int, out: Array[Byte]): Int = {
    val clear = 1 << minCode
    val eoi = clear + 1
    // table as (prefix link, suffix byte); roots are implicit
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = clear + 2
    var width = minCode + 1
    var prev = -1
    var produced = 0
    // expand a code's string into `out` backwards via the prefix links
    val stack = new Array[Byte](4096)
    def firstOf(code0: Int): Byte = {
      var c = code0
      while (c >= clear + 2) c = prefix(c)
      c.toByte
    }
    def emit(code0: Int, extra: Int): Boolean = { // extra: -1 or a byte
      var depth = 0
      if (extra >= 0) { stack(depth) = extra.toByte; depth += 1 }
      var c = code0
      while (c >= clear + 2) {
        stack(depth) = suffix(c); depth += 1
        c = prefix(c)
      }
      stack(depth) = c.toByte; depth += 1
      if (produced + depth > out.length) return false
      while (depth > 0) {
        depth -= 1
        out(produced) = stack(depth)
        produced += 1
      }
      true
    }

    var off = off0
    var blockEnd = off // exclusive end of current sub-block's data
    var bits = 0
    var acc = 0L
    var done = false
    while (!done) {
      // refill to `width` bits, crossing sub-block boundaries
      while (bits < width) {
        if (off == blockEnd) {
          if (off >= p.length) return -1
          val len = p(off) & 0xff
          if (len == 0) return -1 // terminator before EOI
          if (off + 1 + len > p.length) return -1
          off += 1
          blockEnd = off + len
        }
        acc |= (p(off) & 0xffL) << bits
        bits += 8
        off += 1
      }
      val code = (acc & ((1 << width) - 1)).toInt
      acc >>>= width
      bits -= width
      if (code == clear) {
        next = clear + 2
        width = minCode + 1
        prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev == -1) {
        if (code >= clear) return -1
        if (!emit(code, -1)) return -1
        prev = code
      } else {
        if (code > next || (code > clear && code < clear + 2)) return -1
        if (code == next) {
          // KwKwK: prev's string + its own first char
          if (!emit(prev, firstOf(prev) & 0xff)) return -1
        } else {
          if (!emit(code, -1)) return -1
        }
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = if (code == next) firstOf(prev) else firstOf(code)
          if (next == (1 << width) - 1 && width < 12) width += 1
          next += 1
        }
        prev = code
      }
      if (produced == out.length && !done) {
        // all pixels in hand: the stream owes an EOI (tolerated absent
        // by some writers) and the terminator; scan forward leniently
        done = true
      }
    }
    if (produced != out.length) return -1
    // skip unread padding: `blockEnd` is the next length byte whether
    // the last code landed mid-block or exactly on its boundary
    skipSubBlocks(p, blockEnd)
  }

  // ------------------------------------------------------------------
  // Structure-only catalog walk (the MediaMeta twin — no LZW)
  // ------------------------------------------------------------------

  /** Dimensions, frame count, total duration — data sub-blocks skipped
    * by length, never decoded. Delays accumulate only when their GCE is
    * consumed by an image (a trailing GCE with no image adds nothing).
    */
  def meta(payload: Array[Byte]): Either[String, GifMeta] = {
    if (payload == null || payload.isEmpty) return Left("empty_payload")
    if (!isGif(payload)) return Left("unsupported_format")
    val p = payload
    if (p.length < 13) return Left("corrupt_video")
    val w = le16(p, 6)
    val h = le16(p, 8)
    if (w <= 0 || h <= 0) return Left("corrupt_video")
    val packed = p(10) & 0xff
    var off = 13
    if ((packed & 0x80) != 0) {
      off += 3 * (2 << (packed & 7))
      if (off > p.length) return Left("corrupt_video")
    }
    var frames = 0
    var durationMs = 0L
    var pendingDelay = 0L
    while (true) {
      if (off >= p.length) return Left("corrupt_video")
      (p(off) & 0xff) match {
        case 0x3b =>
          return if (frames == 0) Left("corrupt_video")
            else Right(GifMeta(w, h, frames, durationMs))
        case 0x21 =>
          if (off + 2 > p.length) return Left("corrupt_video")
          if ((p(off + 1) & 0xff) == 0xf9) {
            if (off + 3 > p.length) return Left("corrupt_video")
            val blen = p(off + 2) & 0xff
            if (blen < 4 || off + 3 + blen > p.length)
              return Left("corrupt_video")
            pendingDelay = le16(p, off + 4).toLong * 10L
          }
          off = skipSubBlocks(p, off + 2)
          if (off < 0) return Left("corrupt_video")
        case 0x2c =>
          if (off + 10 > p.length) return Left("corrupt_video")
          val fw = le16(p, off + 5)
          val fh = le16(p, off + 7)
          val left = le16(p, off + 1)
          val top = le16(p, off + 3)
          val ipacked = p(off + 9) & 0xff
          if (fw <= 0 || fh <= 0 || left + fw > w || top + fh > h)
            return Left("corrupt_video")
          off += 10
          if ((ipacked & 0x80) != 0) {
            off += 3 * (2 << (ipacked & 7))
            if (off > p.length) return Left("corrupt_video")
          }
          if (off >= p.length) return Left("corrupt_video")
          val minCode = p(off) & 0xff
          if (minCode < 2 || minCode > 8) return Left("corrupt_video")
          off = skipSubBlocks(p, off + 1)
          if (off < 0) return Left("corrupt_video")
          frames += 1
          durationMs += pendingDelay
          pendingDelay = 0L
        case _ => return Left("corrupt_video")
      }
    }
    Left("corrupt_video") // unreachable
  }

  // ------------------------------------------------------------------
  // Fixture encoder — a complete GIF89a writer (real LZW, optional
  // interlace/transparency/sub-rects), used by the gate query and the
  // spec; output checks out under real decoders.
  // ------------------------------------------------------------------

  /** One frame to encode: `indices` is `fw·fh` palette indices in row
    * order (the encoder interlaces them when `interlaced`). `disposal`
    * is the GIF disposal method (0..3), `transparent` a palette index
    * or -1, `palette` an optional local color table (RGB ints; padded
    * to the next power of two).
    */
  final case class Frame(
      left: Int, top: Int, fw: Int, fh: Int,
      indices: Array[Byte],
      delayCs: Int = 0,
      disposal: Int = 1,
      transparent: Int = -1,
      interlaced: Boolean = false,
      palette: Option[Array[Int]] = None)

  /** Encode a complete animated GIF89a: logical screen `w`×`h`, global
    * color table from `globalPalette` (RGB ints, 2..256 entries,
    * padded to a power of two), background index `bg`, one GCE +
    * image block per frame.
    */
  def encodeGif(
      w: Int, h: Int,
      globalPalette: Array[Int], bg: Int,
      frames: Seq[Frame]): Array[Byte] = {
    require(w > 0 && w < 0x10000 && h > 0 && h < 0x10000, "encodeGif: dims")
    require(globalPalette.nonEmpty && globalPalette.length <= 256,
      "encodeGif: global palette 1..256")
    require(frames.nonEmpty, "encodeGif: no frames")
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    "GIF89a".foreach(c => w8(c))
    w16(w); w16(h)
    val (gctBits, gctPadded) = padPalette(globalPalette)
    w8(0x80 | (gctBits - 1)) // GCT flag + size
    w8(bg); w8(0)
    gctPadded.foreach { rgb => w8(rgb >> 16); w8(rgb >> 8); w8(rgb) }
    frames.foreach { f =>
      require(f.fw > 0 && f.fh > 0 && f.left >= 0 && f.top >= 0 &&
        f.left + f.fw <= w && f.top + f.fh <= h, "encodeGif: frame rect")
      require(f.indices.length == f.fw * f.fh, "encodeGif: index count")
      require(f.disposal >= 0 && f.disposal <= 3, "encodeGif: disposal")
      // GCE
      w8(0x21); w8(0xf9); w8(4)
      w8((f.disposal << 2) | (if (f.transparent >= 0) 1 else 0))
      w16(f.delayCs)
      w8(math.max(f.transparent, 0)); w8(0)
      // image descriptor
      w8(0x2c)
      w16(f.left); w16(f.top); w16(f.fw); w16(f.fh)
      f.palette match {
        case Some(lp) =>
          require(lp.nonEmpty && lp.length <= 256, "encodeGif: local palette")
          val (lctBits, lctPadded) = padPalette(lp)
          w8(0x80 | (if (f.interlaced) 0x40 else 0) | (lctBits - 1))
          lctPadded.foreach { rgb => w8(rgb >> 16); w8(rgb >> 8); w8(rgb) }
          writeImageData(out, f, lctPadded.length)
        case None =>
          w8(if (f.interlaced) 0x40 else 0)
          writeImageData(out, f, gctPadded.length)
      }
    }
    w8(0x3b)
    out.toByteArray
  }

  private def padPalette(pal: Array[Int]): (Int, Array[Int]) = {
    var bits = 1
    while ((1 << bits) < pal.length) bits += 1
    bits = math.max(bits, 1)
    (bits, pal ++ Array.fill((1 << bits) - pal.length)(0))
  }

  private def writeImageData(
      out: java.io.ByteArrayOutputStream, f: Frame, palSize: Int): Unit = {
    // stored row order: interlace passes when flagged
    val rows: Seq[Int] =
      if (!f.interlaced) 0 until f.fh
      else (0 until f.fh by 8) ++ (4 until f.fh by 8) ++
        (2 until f.fh by 4) ++ (1 until f.fh by 2)
    val pixels = new Array[Byte](f.indices.length)
    var o = 0
    rows.foreach { r =>
      System.arraycopy(f.indices, r * f.fw, pixels, o, f.fw)
      o += f.fw
    }
    pixels.foreach { b =>
      require((b & 0xff) < palSize, "encodeGif: index past palette")
    }
    var minCode = 2
    while ((1 << minCode) < palSize) minCode += 1
    out.write(minCode)
    val data = lzwEncode(pixels, minCode)
    // sub-blocks of ≤ 255
    var i = 0
    while (i < data.length) {
      val len = math.min(255, data.length - i)
      out.write(len)
      out.write(data, i, len)
      i += len
    }
    out.write(0)
  }

  /** GIF-variant LZW encode (the inverse of [[lzwDecode]]'s width
    * schedule: width bumps when the just-assigned table index reaches
    * `2^width − 1`; at 4096 entries a CLEAR resets the table).
    */
  private def lzwEncode(pixels: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var bits = 0
    var width = minCode + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << bits
      bits += width
      while (bits >= 8) {
        out.write((acc & 0xff).toInt)
        acc >>>= 8
        bits -= 8
      }
    }
    val table = new java.util.HashMap[Integer, Integer]()
    var next = clear + 2
    def reset(): Unit = { table.clear(); next = clear + 2; width = minCode + 1 }
    put(clear)
    var cur = pixels(0) & 0xff
    var i = 1
    while (i < pixels.length) {
      val px = pixels(i) & 0xff
      val key = Integer.valueOf((cur << 8) | px)
      val hit = table.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        put(cur)
        if (next < 4096) {
          // width bump BEFORE the add, on the pre-add count: the
          // encoder's table runs one entry ahead of the decoder's
          // (decoder assigns entry k while reading code k+1), so the
          // decoder-side "assigned index == 2^width − 1" bump lands
          // here as "pre-add next == 2^width" (ppmtogif's schedule)
          if (next == (1 << width) && width < 12) width += 1
          table.put(key, Integer.valueOf(next))
          next += 1
        } else {
          put(clear)
          reset()
        }
        cur = px
      }
      i += 1
    }
    put(cur)
    // the decoder adds a table entry for this final data code too, and
    // bumps its width when that entry lands on index 2^width − 1 — so
    // a strict decoder reads EOI at the BUMPED width; mirror the
    // accounting (sans the now-useless table insert) or EOI would be
    // emitted one bit short on exactly-boundary streams
    if (next < 4096) {
      if (next == (1 << width) && width < 12) width += 1
      next += 1
    }
    put(eoi)
    if (bits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }
}

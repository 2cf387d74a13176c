package graft.llmops

/** REAL baseline JPEG decode — the last content kernel that was a
  * declared stub. Implements the public ITU-T T.81 sequential-DCT
  * Huffman path from the byte layout up, JDK-only:
  *
  *  - marker segment walk: DQT / DHT / SOF0+SOF1 / DRI / SOS (APPn and
  *    COM skipped); progressive (SOF2), arithmetic-coded, hierarchical,
  *    12-bit, and >3-component streams are refused with None
  *  - entropy decode: canonical Huffman per T.81 F.16 (mincode /
  *    maxcode / valptr tables), bit reader with 0xFF00 unstuffing and
  *    RSTn restart handling (byte-align, DC predictors reset)
  *  - per block: DC diff + AC run-length/EOB/ZRL, dequantization with
  *    the zigzag-order table, inverse zigzag, separable 8x8 IDCT in
  *    double precision (basis matrix precomputed), +128 level shift,
  *    clamp to [0,255]
  *  - arbitrary sampling factors in {1,2,4} with nearest-neighbor
  *    (replication) chroma upsampling — covers 4:4:4, 4:2:2, 4:2:0
  *  - JFIF full-range CCIR 601 YCbCr -> RGB for 3-component frames;
  *    1-component frames decode to a single gray channel
  *
  * Contract shared with pngDecode/bmpPixels: a crawl media column is
  * full of garbage, so EVERY malformed/unsupported/truncated input
  * yields None, never a throw, and header-claimed dimensions are
  * bounded with Long math against the compressed size BEFORE any plane
  * allocation (entropy-coded data needs >= 1 bit per 64-pixel block, so
  * total pixels beyond bits*64 cannot be backed by ANY valid stream).
  *
  * Reference behaviors cross-checked in MultimodalContentSpec against
  * the JDK's own ImageIO JPEG codec on generated fixtures (tolerances
  * cover the spec-permitted IDCT slop and the reader's fancier chroma
  * upsampling).
  */
object Jpeg {

  /** Natural-order index for each zigzag position (T.81 figure A.6). */
  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** IDCT basis: basis(x)(u) = C(u)/2 * cos((2x+1) u pi / 16). */
  private val basis: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Huffman decode tables in the T.81 F.16 shape. */
  private final class HuffTable(counts: Array[Int], vals: Array[Byte]) {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17) // -1 = no codes of this length
    val valptr = new Array[Int](17)
    val huffval: Array[Byte] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) == 0) maxcode(l) = -1
        else {
          valptr(l) = k
          mincode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  private object Bail extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // scalastyle:off method.length cyclomatic.complexity
  def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 16) return None
    def u8(i: Int): Int =
      if (i < bytes.length) bytes(i) & 0xff else throw Bail
    def beU16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (u8(0) != 0xff || u8(1) != 0xd8) return None

    try {
      // ---- marker walk -------------------------------------------------
      val qt = new Array[Array[Int]](4) // zigzag-order quant tables
      val dcTab = new Array[HuffTable](4)
      val acTab = new Array[HuffTable](4)
      var w = -1; var h = -1
      var nComp = -1
      var compH: Array[Int] = null; var compV: Array[Int] = null
      var compQ: Array[Int] = null; var compId: Array[Int] = null
      var compDc: Array[Int] = null; var compAc: Array[Int] = null
      var restartInterval = 0
      var sosAt = -1 // entropy-coded data start

      var i = 2
      while (sosAt < 0) {
        if (u8(i) != 0xff) throw Bail
        var m = u8(i + 1)
        while (m == 0xff) { i += 1; m = u8(i + 1) } // fill bytes
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) { i += 2 } // standalone
        else if (m == 0xd9) throw Bail // EOI before SOS
        else {
          val len = beU16(i + 2)
          if (len < 2 || i + 2 + len > bytes.length) throw Bail
          val seg = i + 4 // first payload byte
          val segEnd = i + 2 + len
          m match {
            case 0xdb => // DQT: one or more (Pq|Tq, 64/128 bytes) tables
              var p = seg
              while (p < segEnd) {
                val pq = u8(p) >> 4; val tq = u8(p) & 15
                if (tq > 3) throw Bail
                if (pq == 0) {
                  if (p + 65 > segEnd) throw Bail
                  qt(tq) = Array.tabulate(64)(j => u8(p + 1 + j))
                  p += 65
                } else if (pq == 1) { // 16-bit precision: legal, rare
                  if (p + 129 > segEnd) throw Bail
                  qt(tq) = Array.tabulate(64)(j => beU16(p + 1 + 2 * j))
                  p += 129
                } else throw Bail
              }
            case 0xc4 => // DHT: one or more Huffman tables
              var p = seg
              while (p < segEnd) {
                val tc = u8(p) >> 4; val th = u8(p) & 15
                if (tc > 1 || th > 3 || p + 17 > segEnd) throw Bail
                val counts = Array.tabulate(16)(j => u8(p + 1 + j))
                val total = counts.sum
                if (total > 256 || p + 17 + total > segEnd) throw Bail
                val vals = java.util.Arrays.copyOfRange(bytes, p + 17,
                  p + 17 + total)
                val t = new HuffTable(counts, vals)
                if (tc == 0) dcTab(th) = t else acTab(th) = t
                p += 17 + total
              }
            case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 ext. sequential
              if (u8(seg) != 8) throw Bail // sample precision
              h = beU16(seg + 1); w = beU16(seg + 3)
              nComp = u8(seg + 5)
              if (w <= 0 || h <= 0 || (nComp != 1 && nComp != 3)) throw Bail
              if (seg + 6 + 3 * nComp > segEnd) throw Bail
              compId = new Array[Int](nComp)
              compH = new Array[Int](nComp); compV = new Array[Int](nComp)
              compQ = new Array[Int](nComp)
              var c = 0
              while (c < nComp) {
                compId(c) = u8(seg + 6 + 3 * c)
                val hv = u8(seg + 7 + 3 * c)
                compH(c) = hv >> 4; compV(c) = hv & 15
                compQ(c) = u8(seg + 8 + 3 * c)
                if (!Set(1, 2, 4).contains(compH(c)) ||
                  !Set(1, 2, 4).contains(compV(c)) || compQ(c) > 3) throw Bail
                c += 1
              }
            case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
                0xcd | 0xce | 0xcf =>
              throw Bail // progressive / lossless / arithmetic / diff
            case 0xdd => // DRI
              if (len != 4) throw Bail
              restartInterval = beU16(seg)
            case 0xda => // SOS
              if (nComp < 0) throw Bail
              val ns = u8(seg)
              if (ns != nComp || seg + 1 + 2 * ns + 3 > segEnd) throw Bail
              compDc = new Array[Int](nComp); compAc = new Array[Int](nComp)
              var s = 0
              while (s < ns) {
                val cs = u8(seg + 1 + 2 * s)
                val c = compId.indexOf(cs)
                if (c < 0) throw Bail
                compDc(c) = u8(seg + 2 + 2 * s) >> 4
                compAc(c) = u8(seg + 2 + 2 * s) & 15
                s += 1
              }
              sosAt = segEnd
            case _ => () // APPn / COM / others: skip
          }
          i = i + 2 + len
        }
      }

      // ---- dimension plausibility BEFORE allocating planes ------------
      // entropy data supplies >= 1 bit per 8x8 block; total pixels
      // beyond dataBits*64 cannot be produced by any valid stream.
      val maxH = compH.max; val maxV = compV.max
      val dataBits = (bytes.length - sosAt).toLong * 8
      if (dataBits <= 0) throw Bail
      val pixelsL = w.toLong * h * nComp
      if (pixelsL > dataBits * 64 || pixelsL > (1L << 28)) throw Bail
      val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
      val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
      val planeW = new Array[Int](nComp); val planeH = new Array[Int](nComp)
      val planes = new Array[Array[Byte]](nComp)
      var c = 0
      while (c < nComp) {
        planeW(c) = mcusX * 8 * compH(c)
        planeH(c) = mcusY * 8 * compV(c)
        val sz = planeW(c).toLong * planeH(c)
        if (sz > (1L << 29)) throw Bail
        planes(c) = new Array[Byte](sz.toInt)
        if (qt(compQ(c)) == null || dcTab(compDc(c)) == null ||
          acTab(compAc(c)) == null) throw Bail
        c += 1
      }

      // ---- bit reader with FF00 unstuffing ----------------------------
      var pos = sosAt
      var bitBuf = 0
      var bitCnt = 0
      def nextBit(): Int = {
        if (bitCnt == 0) {
          val b = u8(pos); pos += 1
          if (b == 0xff) {
            val b2 = u8(pos)
            if (b2 == 0x00) pos += 1 // stuffed FF
            else throw Bail // marker inside entropy data = truncation
          }
          bitBuf = b; bitCnt = 8
        }
        bitCnt -= 1
        (bitBuf >> bitCnt) & 1
      }
      def receive(n: Int): Int = {
        var v = 0; var j = 0
        while (j < n) { v = (v << 1) | nextBit(); j += 1 }
        v
      }
      def extend(v: Int, n: Int): Int = // T.81 F.12 sign extension
        if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v
      def huffDecode(t: HuffTable): Int = {
        var code = nextBit()
        var l = 1
        while (code > t.maxcode(l) || t.maxcode(l) == -1) {
          l += 1
          if (l > 16) throw Bail
          code = (code << 1) | nextBit()
        }
        t.huffval(t.valptr(l) + code - t.mincode(l)) & 0xff
      }

      // ---- MCU loop ----------------------------------------------------
      val pred = new Array[Int](nComp)
      val coef = new Array[Double](64)
      val tmp = new Array[Double](64)
      def decodeBlock(c: Int, bx: Int, by: Int): Unit = {
        java.util.Arrays.fill(coef, 0.0)
        val q = qt(compQ(c))
        val t = huffDecode(dcTab(compDc(c)))
        if (t > 15) throw Bail
        pred(c) += extend(receive(t), t)
        coef(0) = pred(c).toDouble * q(0)
        var k = 1
        var eob = false
        while (!eob && k < 64) {
          val rs = huffDecode(acTab(compAc(c)))
          val r = rs >> 4; val s = rs & 15
          if (s == 0) {
            if (r == 15) k += 16 else eob = true // ZRL vs EOB
          } else {
            k += r
            if (k > 63) throw Bail
            coef(zigzag(k)) = extend(receive(s), s).toDouble * q(k)
            k += 1
          }
        }
        // IDCT: rows then columns against the precomputed basis
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            var acc = 0.0
            var u = 0
            while (u < 8) { acc += basis(x)(u) * coef(y * 8 + u); u += 1 }
            tmp(y * 8 + x) = acc
            x += 1
          }
          y += 1
        }
        val pw = planeW(c)
        val out = planes(c)
        var x = 0
        while (x < 8) {
          var yy = 0
          while (yy < 8) {
            var acc = 0.0
            var v = 0
            while (v < 8) { acc += basis(yy)(v) * tmp(v * 8 + x); v += 1 }
            val s = math.round(acc + 128.0).toInt
            val px = bx * 8 + x; val py = by * 8 + yy
            out(py * pw + px) =
              (if (s < 0) 0 else if (s > 255) 255 else s).toByte
            yy += 1
          }
          x += 1
        }
      }

      var mcu = 0
      val nMcus = mcusX * mcusY
      var rstExpect = 0
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          // byte-align and consume RSTn; reset DC predictors
          bitCnt = 0
          if (u8(pos) != 0xff || u8(pos + 1) != 0xd0 + rstExpect) throw Bail
          pos += 2
          rstExpect = (rstExpect + 1) & 7
          java.util.Arrays.fill(pred, 0)
        }
        val mx = mcu % mcusX; val my = mcu / mcusX
        var c = 0
        while (c < nComp) {
          var v = 0
          while (v < compV(c)) {
            var hh = 0
            while (hh < compH(c)) {
              decodeBlock(c, mx * compH(c) + hh, my * compV(c) + v)
              hh += 1
            }
            v += 1
          }
          c += 1
        }
        mcu += 1
      }

      // ---- upsample + color convert ------------------------------------
      val outPix = new Array[Byte](w * h * nComp)
      if (nComp == 1) {
        val p0 = planes(0); val pw = planeW(0)
        var y = 0
        while (y < h) {
          System.arraycopy(p0, y * pw, outPix, y * w, w)
          y += 1
        }
      } else {
        val py0 = planes(0); val pcb = planes(1); val pcr = planes(2)
        def clamp(d: Double): Byte = {
          val v = math.round(d).toInt
          (if (v < 0) 0 else if (v > 255) 255 else v).toByte
        }
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val yy = py0((y * compV(0) / maxV) * planeW(0) +
              (x * compH(0) / maxH)) & 0xff
            val cb = (pcb((y * compV(1) / maxV) * planeW(1) +
              (x * compH(1) / maxH)) & 0xff) - 128
            val cr = (pcr((y * compV(2) / maxV) * planeW(2) +
              (x * compH(2) / maxH)) & 0xff) - 128
            val o = (y * w + x) * 3
            outPix(o) = clamp(yy + 1.402 * cr)
            outPix(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
            outPix(o + 2) = clamp(yy + 1.772 * cb)
            x += 1
          }
          y += 1
        }
      }
      Some((w, h, nComp, outPix))
    } catch {
      case Bail => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }
  // scalastyle:on method.length cyclomatic.complexity
}

package graft

import graft.llmops.Multimodal

/** Content-kernel correctness: PNG encode/decode round-trip across all
  * five scanline filters, BMP pixel extraction against a hand-built
  * known-answer file, baseline JPEG decode cross-checked against the
  * JDK's own ImageIO codec, WAV PCM amplitude stats, and the
  * garbage-never-throws contract shared by every media kernel.
  */
class MultimodalContentSpec extends SparkSpec {

  private def pix(w: Int, h: Int, ch: Int)(f: (Int, Int, Int) => Int)
      : Array[Byte] = {
    val out = new Array[Byte](w * h * ch)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
      out((y * w + x) * ch + c) = (f(x, y, c) & 0xff).toByte
    out
  }

  test("png round-trip: rgb8, >=5 rows so every filter 0-4 is exercised") {
    val (w, h) = (7, 11) // 11 rows -> filters 0..4 each appear >= 2x
    val p = pix(w, h, 3)((x, y, c) => 13 * x + 7 * y + 11 * c + 5)
    val png = Multimodal.pngEncode(w, h, 3, p)
    val Some((dw, dh, dc, dp)) = Multimodal.pngDecode(png)
    assert((dw, dh, dc) === ((w, h, 3)))
    assert(dp.toSeq === p.toSeq)
  }

  test("png round-trip: grayscale, extreme values survive mod-256 filters") {
    val (w, h) = (5, 9)
    val p = pix(w, h, 1)((x, y, _) =>
      if ((x + y) % 3 == 0) 255 else if ((x + y) % 3 == 1) 0 else 127)
    val png = Multimodal.pngEncode(w, h, 1, p)
    val Some((dw, dh, dc, dp)) = Multimodal.pngDecode(png)
    assert((dw, dh, dc) === ((w, h, 1)))
    assert(dp.toSeq === p.toSeq)
  }

  test("png decode rejects unsupported shapes, never throws on garbage") {
    // palette color type (3) must be refused, not misdecoded
    val p = pix(2, 2, 1)((x, y, _) => x + y)
    val png = Multimodal.pngEncode(2, 2, 1, p)
    val paletted = png.clone()
    // IHDR color type byte: 8(sig) + 8(len+type) + 9 offset within data
    paletted(8 + 8 + 9) = 3.toByte
    assert(Multimodal.pngDecode(paletted).isEmpty)
    assert(Multimodal.pngDecode(null).isEmpty)
    assert(Multimodal.pngDecode(Array.fill[Byte](64)(0x42)).isEmpty)
    // valid signature + IHDR but truncated IDAT stream
    assert(Multimodal.pngDecode(png.take(png.length - 20)).isEmpty)
  }

  test("overflow-crafted headers yield None, never a throw or a " +
    "gigabyte allocation (r14 ADVICE: int arithmetic on claimed dims)") {
    // PNG claiming w = h = 2^30 over a 4x4 image's tiny IDAT: the raw
    // buffer length (w*3+1)*h overflows int; pre-fix this threw
    // NegativeArraySizeException from inside the decode batch
    val small = Multimodal.pngEncode(4, 4, 3, pix(4, 4, 3)((x, y, c) =>
      x + y + c))
    def putBeU32(a: Array[Byte], off: Int, v: Long): Unit = {
      a(off) = ((v >> 24) & 0xff).toByte; a(off + 1) = ((v >> 16) & 0xff).toByte
      a(off + 2) = ((v >> 8) & 0xff).toByte; a(off + 3) = (v & 0xff).toByte
    }
    val hugeWh = small.clone()
    putBeU32(hugeWh, 16, 1L << 30) // IHDR width  (8 sig + 8 len/type)
    putBeU32(hugeWh, 20, 1L << 30) // IHDR height
    assert(Multimodal.pngDecode(hugeWh).isEmpty)
    // width alone huge (raw length positive but >> 1032x the IDAT):
    // must be rejected by the zlib max-expansion plausibility cap
    val hugeW = small.clone()
    putBeU32(hugeW, 16, 1L << 20)
    assert(Multimodal.pngDecode(hugeW).isEmpty)
    // BMP claiming w = 2^30: stride = w*3 overflowed int to a negative,
    // defeating the bounds check before the pixel alloc
    val bmpHdr = new Array[Byte](64)
    bmpHdr(0) = 'B'; bmpHdr(1) = 'M'
    bmpHdr(10) = 54 // dataOff
    bmpHdr(14) = 40 // hdrSize
    bmpHdr(21) = 0x40 // width le32 = 0x40000000 = 2^30
    bmpHdr(22) = 2 // height = 2
    bmpHdr(26) = 1 // planes
    bmpHdr(28) = 24 // bpp
    assert(Multimodal.bmpPixels(bmpHdr).isEmpty)
    // BMP height = Int.MinValue (abs(x) == x < 0) must be rejected too
    val bmpMinH = bmpHdr.clone()
    bmpMinH(21) = 0; bmpMinH(18) = 2 // width = 2
    bmpMinH(22) = 0; bmpMinH(25) = 0x80.toByte // height le32 = 0x80000000
    assert(Multimodal.bmpPixels(bmpMinH).isEmpty)
  }

  test("bmp pixels: hand-built 2x2 24-bit bottom-up with row padding") {
    // rows are 2*3=6 bytes -> padded to 8; bottom-up: file row 0 is
    // image row 1. Image (RGB): (0,0)=(1,2,3) (1,0)=(4,5,6)
    //                           (0,1)=(7,8,9) (1,1)=(10,11,12)
    val header = Array[Int](
      'B', 'M', 70, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // file header
      40, 0, 0, 0, 2, 0, 0, 0, 2, 0, 0, 0, 1, 0, 24, 0, // w=2 h=2
      0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0)
    val rows = Array[Int]( // stored B,G,R per pixel
      9, 8, 7, 12, 11, 10, 0, 0, // image row 1 first (bottom-up)
      3, 2, 1, 6, 5, 4, 0, 0)
    val bmp = (header ++ rows).map(_.toByte)
    val Some((w, h, ch, p)) = Multimodal.bmpPixels(bmp)
    assert((w, h, ch) === ((2, 2, 3)))
    assert(p.map(_ & 0xff).toSeq === Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
    // top-down variant (negative height) yields identical image pixels
    // when the row payload order is flipped to match
    val td = (header ++ (rows.slice(8, 16) ++ rows.slice(0, 8))).map(_.toByte)
    td(22) = 0xfe.toByte; td(23) = 0xff.toByte // height = -2 (le i32)
    td(24) = 0xff.toByte; td(25) = 0xff.toByte
    val Some((_, _, _, p2)) = Multimodal.bmpPixels(td)
    assert(p2.toSeq === p.toSeq)
    assert(Multimodal.bmpPixels(null).isEmpty)
    assert(Multimodal.bmpPixels(bmp.take(53)).isEmpty)
  }

  private def jpegBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    baos.toByteArray
  }

  test("jpeg decode: grayscale matches the JDK's own codec within the " +
    "spec-permitted IDCT slop") {
    // deterministic non-trivial pattern: gradients + a block edge
    val img = new java.awt.image.BufferedImage(64, 48,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 48; x <- 0 until 64) {
      val v = (x * 3 + y * 2 + (if ((x / 16 + y / 16) % 2 == 0) 40 else 0)) % 256
      img.getRaster.setSample(x, y, 0, v)
    }
    val bytes = jpegBytes(img)
    val Some((w, h, ch, pix)) = graft.llmops.Jpeg.decode(bytes)
    assert((w, h, ch) === ((64, 48, 1)))
    // reference: the JDK codec decoding the SAME file
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    var sumDiff = 0L
    for (y <- 0 until 48; x <- 0 until 64) {
      val ours = pix(y * 64 + x) & 0xff
      val theirs = ref.getRaster.getSample(x, y, 0)
      val d = math.abs(ours - theirs)
      maxDiff = math.max(maxDiff, d); sumDiff += d
    }
    // both are conformant IDCTs of the same coefficients: tiny rounding
    // differences only (T.81 annex A allows ~1 LSB per sample)
    assert(maxDiff <= 2, s"max gray diff $maxDiff")
    assert(sumDiff.toDouble / (64 * 48) <= 0.5,
      s"mean gray diff ${sumDiff.toDouble / (64 * 48)}")
  }

  test("jpeg decode: rgb (chroma-subsampled) tracks the JDK codec; " +
    "replication vs fancy upsampling bounded on a smooth gradient") {
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 64; x <- 0 until 64) {
      val r = (x * 2 + 30) % 256
      val g = (y * 2 + 60) % 256
      val b = (x + y + 90) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = jpegBytes(img)
    val Some((w, h, ch, pix)) = graft.llmops.Jpeg.decode(bytes)
    assert((w, h, ch) === ((64, 64, 3)))
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    var sumDiff = 0L
    for (y <- 0 until 64; x <- 0 until 64) {
      val rgb = ref.getRGB(x, y)
      val theirs = Seq((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      for (c <- 0 until 3) {
        val d = math.abs((pix((y * 64 + x) * 3 + c) & 0xff) - theirs(c))
        maxDiff = math.max(maxDiff, d); sumDiff += d
      }
    }
    // the JDK reader uses triangle chroma upsampling; ours replicates.
    // On a smooth gradient the divergence is bounded by the per-pixel
    // chroma step; IDCT slop adds ~1
    assert(maxDiff <= 8, s"max rgb diff $maxDiff")
    assert(sumDiff.toDouble / (64 * 64 * 3) <= 2.0,
      s"mean rgb diff ${sumDiff.toDouble / (64 * 64 * 3)}")
  }

  test("jpeg decode: deterministic, and garbage/truncated/overflow " +
    "inputs yield None, never a throw") {
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 32; x <- 0 until 32)
      img.getRaster.setSample(x, y, 0, (x * 7 + y * 5) % 256)
    val bytes = jpegBytes(img)
    val a = graft.llmops.Jpeg.decode(bytes)
    val b = graft.llmops.Jpeg.decode(bytes)
    assert(a.isDefined && a.get._4.toSeq === b.get._4.toSeq)
    assert(graft.llmops.Jpeg.decode(null).isEmpty)
    assert(graft.llmops.Jpeg.decode(Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array.fill[Byte](64)(0x55)).isEmpty)
    // truncated mid-entropy: must bail on exhausted bits, not throw
    assert(graft.llmops.Jpeg.decode(bytes.take(bytes.length - 10)).isEmpty)
    // SOF dimensions crafted far beyond what the entropy data could
    // back (w=h=0xFFF0, 3 comps over a ~1KB stream): plausibility cap
    val huge = bytes.clone()
    val sof = {
      var i = 2; var at = -1
      while (at < 0 && i + 4 < huge.length) {
        if ((huge(i) & 0xff) == 0xff && (huge(i + 1) & 0xff) == 0xc0) at = i
        else i += 1
      }
      at
    }
    assert(sof > 0)
    huge(sof + 5) = 0xff.toByte; huge(sof + 6) = 0xf0.toByte // height
    huge(sof + 7) = 0xff.toByte; huge(sof + 8) = 0xf0.toByte // width
    assert(graft.llmops.Jpeg.decode(huge).isEmpty)
  }

  test("jpeg rides withImagePixelStats as px_format=jpeg with stats " +
    "consistent with the direct decode") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(40, 24,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 24; x <- 0 until 40)
      img.setRGB(x, y, ((x * 5 % 256) << 16) | ((y * 9 % 256) << 8) |
        ((x + y) % 256))
    val bytes = jpegBytes(img)
    val Some((_, _, _, pix)) = graft.llmops.Jpeg.decode(bytes)
    val expSums = Array.fill(3)(0L)
    for (i <- pix.indices) expSums(i % 3) += pix(i) & 0xff
    val df = Seq((1L, bytes), (2L, Array.fill[Byte](16)(7)))
      .toDF("id", "media")
    val out = Multimodal.withImagePixelStats(df, "media")
      .orderBy("id").collect()
    assert(out(0).getAs[String]("px_format") === "jpeg")
    assert(out(0).getAs[Int]("px_width") === 40)
    assert(out(0).getAs[Int]("px_channels") === 3)
    assert(out(0).getAs[Seq[Long]]("px_sum") === expSums.toSeq)
    assert(out(1).isNullAt(out(1).fieldIndex("px_format")))
  }

  test("media content features: known-answer 2x2 pooling, spatial " +
    "discrimination px_sum cannot provide, empty cells, null path") {
    import spark.implicits._
    // 4x2 grayscale: left half all 10, right half all 200. Mirror has
    // identical global sum/min/max but opposite layout.
    val left = pix(4, 2, 1)((x, _, _) => if (x < 2) 10 else 200)
    val mirror = pix(4, 2, 1)((x, _, _) => if (x < 2) 200 else 10)
    // 1x1: with grid=2 only cell (0,0) is populated; 3 cells empty -> 0
    val tiny = pix(1, 1, 1)((_, _, _) => 77)
    val df = Seq(
      (1L, Multimodal.pngEncode(4, 2, 1, left)),
      (2L, Multimodal.pngEncode(4, 2, 1, mirror)),
      (3L, Multimodal.pngEncode(1, 1, 1, tiny)),
      (4L, Array.fill[Byte](10)(3))).toDF("id", "media")
    val out = Multimodal.withMediaContentFeatures(df, "media", grid = 2)
      .orderBy("id").collect()
    // y in {0,1} -> rows split across gy=0/gy=1; x 0..3 -> gx split 0/1
    assert(out(0).getSeq[Long](out(0).fieldIndex("media_feat")) ===
      Seq(10000000L, 200000000L, 10000000L, 200000000L))
    assert(out(1).getSeq[Long](out(0).fieldIndex("media_feat")) ===
      Seq(200000000L, 10000000L, 200000000L, 10000000L))
    // identical global stats, different vectors: the point of pooling
    val st = Multimodal.withImagePixelStats(
      df.where($"id" < 3), "media").orderBy("id").collect()
    assert(st(0).getSeq[Long](st(0).fieldIndex("px_sum")) ===
      st(1).getSeq[Long](st(0).fieldIndex("px_sum")))
    assert(out(0).getSeq[Long](out(0).fieldIndex("media_feat")) !==
      out(1).getSeq[Long](out(0).fieldIndex("media_feat")))
    assert(out(2).getSeq[Long](out(0).fieldIndex("media_feat")) ===
      Seq(77000000L, 0L, 0L, 0L))
    assert(out(3).isNullAt(out(3).fieldIndex("media_feat")))
  }

  test("media content features: rgb interleave + jpeg decode ride the " +
    "same kernel; exact integer division semantics") {
    import spark.implicits._
    // 2x2 RGB: per-channel constant ramps -> every cell has 1 pixel,
    // feature = value * 1e6 exactly; 3x1 exercises truncating division
    // (cells of 1 or 2 pixels)
    val rgb = pix(2, 2, 3)((x, y, c) => 50 * c + 10 * x + y)
    val wide = pix(3, 1, 1)((x, _, _) => Seq(5, 8, 9)(x))
    val df = Seq(
      (1L, Multimodal.pngEncode(2, 2, 3, rgb)),
      (2L, Multimodal.pngEncode(3, 1, 1, wide))).toDF("id", "media")
    val out = Multimodal.withMediaContentFeatures(df, "media", grid = 2)
      .orderBy("id").collect()
    val f1 = out(0).getSeq[Long](out(0).fieldIndex("media_feat"))
    assert(f1.length === 12)
    for (cell <- 0 until 4; c <- 0 until 3) {
      val (gx, gy) = (cell % 2, cell / 2)
      assert(f1(cell * 3 + c) === (50 * c + 10 * gx + gy) * 1000000L)
    }
    // gx = x*2//3: x in {0,1} -> 0 (mean floor((5+8)*1e6/2)), x=2 -> 1
    assert(out(1).getSeq[Long](out(0).fieldIndex("media_feat")) ===
      Seq((5L + 8L) * 1000000L / 2L, 9000000L, 0L, 0L))
  }

  test("wav pcm stats: 16-bit two's complement, peak/clip/sum_sq exact") {
    val samples = Seq(0, 100, -100, 32767, -32768, -1)
    val data = samples.flatMap { s =>
      val v = if (s < 0) s + 65536 else s
      Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    }.toArray
    def le32(v: Long) = Array(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff,
      (v >> 24) & 0xff).map(_.toByte)
    def le16(v: Int) = Array(v & 0xff, (v >> 8) & 0xff).map(_.toByte)
    val wav = "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(16000) ++
      le32(32000) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(data.length) ++ data
    val Some((n, sumSq, peak, clipped)) = Multimodal.wavPcmStats(wav)
    assert(n === 6L)
    assert(sumSq === samples.map(s => s.toLong * s).sum)
    assert(peak === 32768)
    assert(clipped === 2L)
    // non-PCM format code refused
    val bad = wav.clone(); bad(20) = 3.toByte
    assert(Multimodal.wavPcmStats(bad).isEmpty)
    assert(Multimodal.wavPcmStats("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  test("box-filter resize: exact block means with edge clamp, factor-1 " +
    "identity, PNG re-encode round trip, garbage null") {
    import spark.implicits._
    // 5x3 grayscale, factor 2 -> 3x2 with clamped right column and
    // bottom row; reference computed by brute force here
    val w = 5; val h = 3
    val src = pix(w, h, 1)((x, y, _) => 17 * x + 41 * y + 3)
    def ref(factor: Int): (Int, Int, Array[Int]) = {
      val ow = (w + factor - 1) / factor
      val oh = (h + factor - 1) / factor
      val out = for (oy <- 0 until oh; ox <- 0 until ow) yield {
        val xs = (ox * factor) until math.min((ox + 1) * factor, w)
        val ys = (oy * factor) until math.min((oy + 1) * factor, h)
        val vals = for (y <- ys; x <- xs) yield src((y * w + x)) & 0xff
        vals.sum / vals.length
      }
      (ow, oh, out.toArray)
    }
    val df = Seq(
      (1L, Multimodal.pngEncode(w, h, 1, src)),
      (2L, "not an image".getBytes)).toDF("id", "media")
    val out = Multimodal.withResizedPixels(df, "media", factor = 2)
      .orderBy("id").collect()
    val (ow, oh, expect) = ref(2)
    assert(out(0).getInt(out(0).fieldIndex("rz_width")) === ow)
    assert(out(0).getInt(out(0).fieldIndex("rz_height")) === oh)
    assert(out(0).getString(out(0).fieldIndex("rz_format")) === "png")
    val Some((dw, dh, dc, dp)) = Multimodal.pngDecode(
      out(0).getAs[Array[Byte]](out(0).fieldIndex("rz_png")))
    assert((dw, dh, dc) === ((ow, oh, 1)))
    assert(dp.map(_ & 0xff).toSeq === expect.toSeq)
    assert(out(1).isNullAt(out(1).fieldIndex("rz_png")))
    // factor 1 is the identity (every block is one pixel)
    val id1 = Multimodal.withResizedPixels(
      df.where($"id" === 1), "media", factor = 1).head()
    val Some((iw, ih, _, ip)) = Multimodal.pngDecode(
      id1.getAs[Array[Byte]](id1.fieldIndex("rz_png")))
    assert((iw, ih) === ((w, h)))
    assert(ip.toSeq === src.toSeq)
    // RGB channels resize independently
    val rgb = pix(4, 4, 3)((x, y, c) => 60 * c + 9 * x + 5 * y)
    val rdf = Seq((1L, Multimodal.pngEncode(4, 4, 3, rgb)))
      .toDF("id", "media")
    val rout = Multimodal.withResizedPixels(rdf, "media", factor = 2)
      .head()
    val Some((_, _, rc, rp)) = Multimodal.pngDecode(
      rout.getAs[Array[Byte]](rout.fieldIndex("rz_png")))
    assert(rc === 3)
    // block (0,0) channel c: pixels (0,0),(1,0),(0,1),(1,1) ->
    // mean of 60c + {0, 9, 5, 14} = 60c + 7
    for (c <- 0 until 3)
      assert((rp(c) & 0xff) === 60 * c + 7)
  }
}

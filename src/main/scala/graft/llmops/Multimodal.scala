package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns + typed
  * metadata, with decode/feature steps as per-partition batch functions.
  *
  * Three tiers, from real to stubbed:
  *  1. REAL container-header parsers (PNG/GIF/BMP/JPEG/TIFF/WAV) — pure
  *     public byte layouts, no codec needed.
  *  2. REAL content kernels: uncompressed 24-bit BMP pixels, PNG
  *     grayscale/RGB8 via `java.util.zip.Inflater` + scanline
  *     unfiltering, WAV linear-PCM amplitude stats, and (r15) baseline
  *     JPEG entropy decode from the byte layout up ([[Jpeg]]: T.81
  *     Huffman + IDCT + chroma upsampling, spec-verified against the
  *     JDK's own ImageIO codec). PNG/BMP/WAV produce exact integer
  *     statistics (sums/extrema), so gates hash-match a SQL oracle that
  *     knows the pixel/sample formula; JPEG is lossy, so its kernel is
  *     spec-level.
  *  3. STUBS only where an external NEURAL model would be required:
  *     `decodeStub` / `withMediaFeatures` keep the schema,
  *     partition-level batching, column pruning, and UDF seam real —
  *     swapping in an actual model (or a `mapInPandas`-style vectorized
  *     bridge) changes no plumbing. For TEXT, a genuinely corpus-TRAINED
  *     embedding exists since r15 — [[LearnedEmbeddings]] (gated PPMI +
  *     sign projection); this seam remains only for image/audio nets.
  */
object Multimodal {

  final case class MediaMeta(byte_len: Int, content_md5: String,
      format: String, width: Int, height: Int)

  /** STUB decode: deterministic fake dimensions derived from the content
    * hash (stands in for an image decoder; see module doc).
    */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null) return MediaMeta(-1, "", "unknown", -1, -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(bytes)
    val hex = d.map("%02x".format(_)).mkString
    val w = 16 + (java.lang.Integer.parseInt(hex.substring(0, 4), 16) % 4080)
    val h = 16 + (java.lang.Integer.parseInt(hex.substring(4, 8), 16) % 4080)
    val fmt = (d(8) & 3) match {
      case 0 => "jpeg"; case 1 => "png"; case 2 => "webp"; case _ => "gif"
    }
    MediaMeta(bytes.length, hex, fmt, w, h)
  }

  /** Attach decoded metadata to a binary media column. Runs as a
    * per-partition map over the ORIGINAL rows (one decoder instance per
    * partition, batch-shaped like a real codec bridge) -- no join, so
    * duplicate payloads can't multiply rows and row identity/order within
    * a partition is preserved.
    */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val idx = df.schema.fieldIndex(binCol)
    val metaNames = Encoders.product[MediaMeta].schema.fieldNames
    val clash = metaNames.filter(df.columns.contains)
    require(clash.isEmpty,
      s"withMediaMeta output columns already present in input: ${clash.mkString(", ")}")
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields ++
        Encoders.product[MediaMeta].schema.fields)
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      // decoder init would happen here, once per partition
      it.map { row =>
        val m = decodeStub(row.getAs[Array[Byte]](idx))
        org.apache.spark.sql.Row.fromSeq(row.toSeq ++
          Seq(m.byte_len, m.content_md5, m.format, m.width, m.height))
      }
    }(rowEnc).toDF()
  }

  /** REAL image-header parser -- past the stub line: container headers
    * are fixed public layouts, so no codec is needed to read true
    * dimensions from the leading bytes of a binary column.
    *
    *  - PNG: 8-byte signature, IHDR chunk -> big-endian u32 width at
    *    offset 16, height at 20.
    *  - GIF (87a/89a): logical-screen little-endian u16 width at 6,
    *    height at 8.
    *  - BMP: 14-byte file header + BITMAPINFOHEADER -> little-endian
    *    i32 width at 18, height at 22 (abs: height may be negative for
    *    top-down rows).
    *  - JPEG: FF D8 then an FF-marker segment walk to the first SOF
    *    (C0-C3, C5-C7, C9-CB, CD-CF): big-endian u16 height then width
    *    after the precision byte.
    *  - TIFF (II/MM + magic 42): IFD entry walk for tags 256/257
    *    (ImageWidth/ImageLength), SHORT and LONG value types, in the
    *    file's declared byte order.
    *
    * Unknown/truncated payloads -> ("unknown", -1, -1), never a throw:
    * a crawl's media column always contains garbage.
    */
  def imageHeaderMeta(bytes: Array[Byte]): (String, Int, Int) = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def beU32(i: Int): Long = (u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)
    def beU16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def leU16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def leI32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
      (u8(i + 3) << 24)
    // null is ordinary crawl-column garbage, same contract as truncated
    val n = if (bytes == null) -1 else bytes.length
    if (n >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
        u8(3) == 'G' && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a &&
        u8(7) == 0x0a)
      ("png", beU32(16).toInt, beU32(20).toInt)
    else if (n >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
        u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
      ("gif", leU16(6), leU16(8))
    else if (n >= 26 && u8(0) == 'B' && u8(1) == 'M')
      ("bmp", leI32(18), math.abs(leI32(22)))
    else if (n >= 8 &&
        ((u8(0) == 'I' && u8(1) == 'I' && u8(2) == 0x2a && u8(3) == 0) ||
         (u8(0) == 'M' && u8(1) == 'M' && u8(2) == 0 && u8(3) == 0x2a))) {
      // TIFF: byte-order flag (II little / MM big), magic 42, u32 offset
      // to the first IFD; the IFD is a u16 entry count then 12-byte
      // entries (tag u16, type u16, count u32, value u32 -- a SHORT
      // value sits in the value field's FIRST two bytes in file byte
      // order). Dims are tags 256 (ImageWidth) / 257 (ImageLength),
      // type SHORT(3) or LONG(4).
      val le = u8(0) == 'I'
      def u16o(i: Int): Int = if (le) leU16(i) else beU16(i)
      def u32o(i: Int): Long =
        if (le) leI32(i).toLong & 0xffffffffL else beU32(i)
      val ifd = u32o(4).toInt
      var w = -1
      var h = -1
      if (ifd >= 0 && ifd + 2 <= n) {
        val cnt = u16o(ifd)
        var e = 0
        while (e < cnt && ifd + 2 + 12 * (e + 1) <= n) {
          val off = ifd + 2 + 12 * e
          val tag = u16o(off)
          val v = u16o(off + 2) match {
            case 3 => u16o(off + 8)
            case 4 => u32o(off + 8).toInt
            case _ => -1
          }
          if (tag == 256) w = v else if (tag == 257) h = v
          e += 1
        }
      }
      ("tiff", w, h)
    }
    else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // segment walk: FF marker, 2-byte big-endian length including
      // itself; stop at the first SOF frame header
      var i = 2
      var out = ("jpeg", -1, -1)
      var done = false
      while (!done && i + 3 < n) {
        if (u8(i) != 0xff) { done = true } // desynced -> give up
        else {
          val marker = u8(i + 1)
          if (marker == 0xff) i += 1 // fill byte
          else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7))
            i += 2 // standalone markers, no length
          else {
            val len = beU16(i + 2)
            val isSof = (marker >= 0xc0 && marker <= 0xcf) &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc
            if (isSof) {
              if (i + 9 <= n)
                out = ("jpeg", beU16(i + 7), beU16(i + 5)) // (width, height)
              done = true
            } else if (len < 2) done = true
            else i += 2 + len
          }
        }
      }
      out
    } else ("unknown", -1, -1)
  }

  /** Attach the REAL header parse to a binary column: img_format /
    * img_width / img_height via the same per-partition map shape as
    * [[withMediaMeta]].
    */
  def withImageHeaderMeta(df: DataFrame, binCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(binCol)
    val add = Seq("img_format", "img_width", "img_height")
    val clash = add.filter(df.columns.contains)
    require(clash.isEmpty,
      s"withImageHeaderMeta output columns already present: ${clash.mkString(", ")}")
    import org.apache.spark.sql.types._
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("img_format", StringType),
      StructField("img_width", IntegerType),
      StructField("img_height", IntegerType)))
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val (f, w, h) = imageHeaderMeta(row.getAs[Array[Byte]](idx))
        org.apache.spark.sql.Row.fromSeq(row.toSeq ++ Seq(f, w, h))
      }
    }(rowEnc).toDF()
  }

  /** REAL WAV (RIFF/WAVE) header parser -- same no-codec principle as
    * [[imageHeaderMeta]]: the container layout is a fixed public spec,
    * so channels / sample rate / bit depth / payload size read straight
    * off the leading bytes. RIFF signature at 0, WAVE at 8, then a
    * 4-byte-id + little-endian-u32-size chunk walk: "fmt " carries
    * channels (u16 @+2), sample rate (u32 @+4), bits/sample (u16 @+14);
    * "data"'s size is the payload byte length. Chunks are word-aligned
    * (odd sizes pad one byte). Unknown/truncated payloads ->
    * (-1, -1, -1, -1), never a throw.
    */
  def wavHeaderMeta(bytes: Array[Byte]): (Int, Int, Int, Long) = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def leU16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def leU32(i: Int): Long = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int): String =
      new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    val n = if (bytes == null) -1 else bytes.length
    if (n < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") (-1, -1, -1, -1L)
    else {
      var i = 12
      var ch = -1
      var rate = -1
      var bits = -1
      var dataLen = -1L
      while (i + 8 <= n && (ch < 0 || dataLen < 0)) {
        val id = tag(i)
        val size = leU32(i + 4)
        if (id == "fmt " && size >= 16 && i + 24 <= n) {
          ch = leU16(i + 10)
          rate = leU32(i + 12).toInt
          bits = leU16(i + 22)
        } else if (id == "data") dataLen = size
        // step stays in Long: a crawl-garbage chunk size >= 2^31 would
        // truncate to a zero/negative Int step (infinite loop or
        // negative index); any step past n just ends the walk
        val step = 8L + size + (size & 1L)
        if (i + step > n) i = n else i += step.toInt
      }
      (ch, rate, bits, dataLen)
    }
  }

  /** Attach the REAL WAV header parse to a binary column: wav_channels /
    * wav_sample_rate / wav_bits / wav_data_len via the same
    * per-partition map shape as [[withImageHeaderMeta]].
    */
  def withWavHeaderMeta(df: DataFrame, binCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(binCol)
    val add = Seq("wav_channels", "wav_sample_rate", "wav_bits",
      "wav_data_len")
    val clash = add.filter(df.columns.contains)
    require(clash.isEmpty,
      s"withWavHeaderMeta output columns already present: ${clash.mkString(", ")}")
    import org.apache.spark.sql.types._
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("wav_channels", IntegerType),
      StructField("wav_sample_rate", IntegerType),
      StructField("wav_bits", IntegerType),
      StructField("wav_data_len", LongType)))
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val (c, r, b, l) = wavHeaderMeta(row.getAs[Array[Byte]](idx))
        // Seq[Any]: a bare Seq(c, r, b, l) weakly unifies Int|Long to
        // Seq[Long], silently widening the Int fields past the schema
        org.apache.spark.sql.Row.fromSeq(row.toSeq ++ Seq[Any](c, r, b, l))
      }
    }(rowEnc).toDF()
  }

  /** 16-bucket high-nibble byte histogram of a binary column (integer
    * counts, order-independent -- the cheap content-type/entropy feature
    * a media pipeline screens payloads with before decode). Compiled
    * per-partition loop; a SQL oracle recomputes it from the hex
    * encoding (high nibble of byte j = hex char 2j+1).
    */
  def byteHistogramUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      if (bytes == null) null // null payload -> null histogram, like hex(null)
      else {
        val counts = new Array[Long](16)
        var i = 0
        while (i < bytes.length) {
          counts((bytes(i) >> 4) & 0xf) += 1
          i += 1
        }
        counts.toSeq
      }
    }

  // ---------------------------------------------------------------------
  // REAL content kernels — past the header line: pixel/sample-level
  // decode for the formats whose payload layout is pure public spec and
  // needs only JDK facilities (java.util.zip for PNG's zlib stream).
  // These replace the declared stubs for BMP / PNG / WAV content: a
  // pipeline can now screen media on actual pixel statistics and PCM
  // amplitude, not just container metadata.
  // ---------------------------------------------------------------------

  /** Uncompressed 24-bit BMP (BI_RGB) → (width, height, 3,
    * RGB-interleaved pixel bytes). Handles bottom-up (positive height)
    * and top-down (negative) row order and the 4-byte row padding.
    * Anything else (palette/16/32-bit, RLE, truncated) → None, never a
    * throw — crawl media columns always contain garbage.
    */
  def bmpPixels(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 54) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def leU16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def leI32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
      (u8(i + 3) << 24)
    if (u8(0) != 'B' || u8(1) != 'M') return None
    val dataOff = leI32(10)
    val hdrSize = leI32(14)
    val w = leI32(18)
    val rawH = leI32(22)
    val h = math.abs(rawH)
    if (hdrSize < 40 || leU16(26) != 1 || leU16(28) != 24 ||
      leI32(30) != 0 || w <= 0 || h <= 0) return None
    // Long math BEFORE any allocation: a header claiming w ~ 2^30 made
    // `w * 3` overflow to a negative stride, which defeated the bounds
    // check below and let the pixel-buffer alloc throw inside a
    // mapPartitions batch — garbage must yield None, never a throw.
    // (h <= 0 above also rejects rawH == Int.MinValue, whose abs is
    // itself.) BMP is uncompressed, so dataOff + stride*h <= file size
    // bounds w*h*3 too.
    val strideL = ((w.toLong * 3 + 3) / 4) * 4
    if (dataOff < 54 || dataOff.toLong + strideL * h > bytes.length)
      return None
    val stride = strideL.toInt
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      // file stores bottom-up when rawH > 0: file row 0 = image row h-1
      val src = dataOff + (if (rawH > 0) h - 1 - y else y) * stride
      var x = 0
      while (x < w) {
        val s = src + x * 3
        val dPix = (y * w + x) * 3
        out(dPix) = bytes(s + 2) // stored B,G,R -> emit R,G,B
        out(dPix + 1) = bytes(s + 1)
        out(dPix + 2) = bytes(s)
        x += 1
      }
      y += 1
    }
    Some((w, h, 3, out))
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    // PNG spec 9.4: predictor closest to p = a + b - c, ties a > b > c
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt)
    bb.array()
  }

  /** Minimal PNG encoder for bit-depth-8 grayscale (1 channel, color
    * type 0) or RGB (3 channels, color type 2): per-scanline filter
    * y % 5 so every filter type (None/Sub/Up/Average/Paeth) appears in
    * any image of >= 5 rows, zlib-deflated IDAT, CRC'd chunks. Exists to
    * ROUND-TRIP the decoder against known pixels — the encode side of
    * the llm_image_stats gate fixture.
    */
  def pngEncode(w: Int, h: Int, channels: Int, pix: Array[Byte]): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels=$channels")
    require(pix.length == w * h * channels, "pixel buffer size mismatch")
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val f = y % 5
      raw(y * (stride + 1)) = f.toByte
      var i = 0
      while (i < stride) {
        val cur = pix(y * stride + i) & 0xff
        val a = if (i >= channels) pix(y * stride + i - channels) & 0xff else 0
        val b = if (y > 0) pix((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= channels)
          pix((y - 1) * stride + i - channels) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ => paeth(a, b, c)
        }
        raw(y * (stride + 1) + 1 + i) = ((cur - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put((if (channels == 1) 0 else 2).toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    sig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", out.toByteArray) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** REAL PNG pixel decode for the encoder's subset (bit depth 8, color
    * type 0 grayscale / 2 RGB, no interlace): concatenates IDAT chunks,
    * inflates the zlib stream with `java.util.zip.Inflater`, and inverts
    * scanline filters 0-4 per the public spec (reconstruction uses the
    * already-RECONSTRUCTED left/up/up-left bytes, not the filtered
    * ones). → (width, height, channels, interleaved pixels); any other
    * color type / depth / malformed stream → None.
    */
  def pngDecode(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 45) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def beU32(i: Int): Long = (u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)
    val sigOk = u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
      u8(3) == 'G' && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a &&
      u8(7) == 0x0a
    if (!sigOk) return None
    var w = -1; var h = -1; var channels = -1
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var end = false
    while (!end && i + 8 <= bytes.length) {
      val len = beU32(i).toInt
      val typ = new String(bytes, i + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (len < 0 || i + 12L + len > bytes.length) return None
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          w = beU32(i + 8).toInt; h = beU32(i + 12).toInt
          val (depth, color) = (u8(i + 16), u8(i + 17))
          val (comp, filt, inter) = (u8(i + 18), u8(i + 19), u8(i + 20))
          if (depth != 8 || (color != 0 && color != 2) || comp != 0 ||
            filt != 0 || inter != 0) return None
          channels = if (color == 0) 1 else 3
        case "IDAT" => idat.write(bytes, i + 8, len)
        case "IEND" => end = true
        case _ => () // ancillary chunks skipped
      }
      i += 12 + len
    }
    if (w <= 0 || h <= 0 || channels < 0 || idat.size() == 0) return None
    // Long math + a plausibility cap BEFORE allocating: header-claimed
    // dimensions are attacker/garbage-controlled, and (stride+1)*h in
    // int arithmetic overflowed for w ~ 2^30, throwing
    // NegativeArraySizeException (or OOM-allocating gigabytes) inside
    // the decode batch. zlib's maximum expansion is 1032:1, so a raw
    // scanline buffer beyond idat*1032 (+64 slack for tiny streams)
    // cannot be satisfied by ANY valid stream — reject without touching
    // the allocator.
    val strideL = w.toLong * channels
    val rawLenL = (strideL + 1L) * h
    if (rawLenL > Int.MaxValue ||
      rawLenL > idat.size().toLong * 1032L + 64L) return None
    val stride = strideL.toInt
    val raw = new Array[Byte](rawLenL.toInt)
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      inf.end()
      if (off != raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    val pix = new Array[Byte]((strideL * h).toInt) // <= rawLenL, int-safe
    var y = 0
    while (y < h) {
      val f = raw(y * (stride + 1)) & 0xff
      if (f > 4) return None
      var k = 0
      while (k < stride) {
        val x = raw(y * (stride + 1) + 1 + k) & 0xff
        val a = if (k >= channels) pix(y * stride + k - channels) & 0xff else 0
        val b = if (y > 0) pix((y - 1) * stride + k) & 0xff else 0
        val c = if (y > 0 && k >= channels)
          pix((y - 1) * stride + k - channels) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ => paeth(a, b, c)
        }
        pix(y * stride + k) = ((x + pred) & 0xff).toByte
        k += 1
      }
      y += 1
    }
    Some((w, h, channels, pix))
  }

  /** Decode a binary image column (PNG via [[pngDecode]], BMP via
    * [[bmpPixels]], baseline JPEG via [[Jpeg.decode]]) and emit integer
    * per-channel pixel statistics — exact sums/extrema, no floats, so a
    * SQL oracle that knows the pixel-generating formula matches
    * hash-for-hash (PNG/BMP; JPEG is lossy, so its stats are
    * spec-verified against the JDK codec instead of SQL-oracled).
    * Undecodable payloads keep the row with nulls. Columns: px_format,
    * px_width, px_height, px_channels, px_sum array<long>,
    * px_min/px_max array<int> (channel-indexed, RGB order for color).
    */
  def withImagePixelStats(df: DataFrame, binCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(binCol)
    val add = Seq("px_format", "px_width", "px_height", "px_channels",
      "px_sum", "px_min", "px_max")
    val clash = add.filter(df.columns.contains)
    require(clash.isEmpty,
      s"withImagePixelStats output columns already present: ${clash.mkString(", ")}")
    import org.apache.spark.sql.types._
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("px_format", StringType),
      StructField("px_width", IntegerType),
      StructField("px_height", IntegerType),
      StructField("px_channels", IntegerType),
      StructField("px_sum", ArrayType(LongType, containsNull = false)),
      StructField("px_min", ArrayType(IntegerType, containsNull = false)),
      StructField("px_max", ArrayType(IntegerType, containsNull = false))))
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        decodeImage(row.getAs[Array[Byte]](idx)) match {
          case Some((fmt, w, h, ch, pix)) =>
            val sums = new Array[Long](ch)
            val mins = Array.fill(ch)(255)
            val maxs = Array.fill(ch)(0)
            var i = 0
            while (i < pix.length) {
              val c = i % ch
              val v = pix(i) & 0xff
              sums(c) += v
              if (v < mins(c)) mins(c) = v
              if (v > maxs(c)) maxs(c) = v
              i += 1
            }
            org.apache.spark.sql.Row.fromSeq(row.toSeq ++ Seq[Any](fmt, w,
              h, ch, sums.toSeq, mins.toSeq, maxs.toSeq))
          case None =>
            org.apache.spark.sql.Row.fromSeq(row.toSeq ++
              Seq[Any](null, null, null, null, null, null, null))
        }
      }
    }(rowEnc).toDF()
  }

  /** Decode any supported still-image payload to (format, w, h,
    * channels, row-major channel-interleaved pixels).
    */
  private def decodeImage(
      bytes: Array[Byte]): Option[(String, Int, Int, Int, Array[Byte])] =
    pngDecode(bytes).map { case (w, h, c, p) => ("png", w, h, c, p) }
      .orElse(bmpPixels(bytes).map { case (w, h, c, p) =>
        ("bmp", w, h, c, p) })
      .orElse(Jpeg.decode(bytes).map { case (w, h, c, p) =>
        ("jpeg", w, h, c, p) })

  /** REAL content-derived media feature vector: decode the image and
    * mean-pool each channel over a `grid` x `grid` spatial grid — the
    * classic non-neural thumbnail/color-layout descriptor (MPEG-7 color
    * layout without the DCT), and the baseline feature for media
    * near-dup / similarity search.
    *
    * Pixel (x, y) falls in cell (x*grid/w, y*grid/h) (integer div, the
    * standard pooling partition); feature index = (gy*grid + gx)*ch + c;
    * value = floor(cellSum * 1e6 / cellCount) — ONE integer division,
    * so the vector is exact cross-engine and cross-partitioning. Cells
    * with no pixels (image narrower/shorter than the grid) emit 0.
    *
    * Columns added: mf_format/mf_width/mf_height/mf_channels and
    * `media_feat: array<long>` (length grid*grid*channels; nulls for
    * undecodable payloads). Scale shape: per-partition batch map — no
    * shuffle, no join; downstream ANN composes on the integer vectors.
    */
  def withMediaContentFeatures(df: DataFrame, binCol: String,
      grid: Int = 2): DataFrame = {
    require(grid > 0, "grid must be positive")
    val idx = df.schema.fieldIndex(binCol)
    val add = Seq("mf_format", "mf_width", "mf_height", "mf_channels",
      "media_feat")
    val clash = add.filter(df.columns.contains)
    require(clash.isEmpty,
      s"withMediaContentFeatures output columns already present: ${clash.mkString(", ")}")
    import org.apache.spark.sql.types._
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("mf_format", StringType),
      StructField("mf_width", IntegerType),
      StructField("mf_height", IntegerType),
      StructField("mf_channels", IntegerType),
      StructField("media_feat", ArrayType(LongType, containsNull = false))))
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        decodeImage(row.getAs[Array[Byte]](idx)) match {
          case Some((fmt, w, h, ch, pix)) =>
            val cells = grid * grid
            val sums = new Array[Long](cells * ch)
            val counts = new Array[Long](cells * ch)
            var i = 0
            while (i < pix.length) {
              val p = i / ch
              val c = i % ch
              val x = p % w
              val y = p / w
              val cell = (y * grid / h) * grid + (x * grid / w)
              sums(cell * ch + c) += (pix(i) & 0xff)
              counts(cell * ch + c) += 1L
              i += 1
            }
            val feat = new Array[Long](cells * ch)
            var k = 0
            while (k < feat.length) {
              feat(k) =
                if (counts(k) == 0) 0L
                else sums(k) * 1000000L / counts(k)
              k += 1
            }
            org.apache.spark.sql.Row.fromSeq(row.toSeq ++
              Seq[Any](fmt, w, h, ch, feat.toSeq))
          case None =>
            org.apache.spark.sql.Row.fromSeq(row.toSeq ++
              Seq[Any](null, null, null, null, null))
        }
      }
    }(rowEnc).toDF()
  }

  /** REAL resize kernel — replaces the identity-resize stub at the
    * pixel level: exact box-filter (area-average) downscale by integer
    * `factor`, the mipmap/thumbnail standard. out(x,y,c) =
    * floor(blockSum / blockCount), where the factor x factor source
    * block CLAMPS at the right/bottom edges (blockCount < factor^2
    * there), so every (w,h) resizes, not just multiples. Output dims =
    * ceil(w/factor) x ceil(h/factor). The result re-encodes as a real
    * PNG ([[pngEncode]]) so downstream kernels (pixel stats, grid
    * features, ANN over media vectors) compose on an actual image —
    * the llm_image_resize gate round-trips decode -> resize -> encode
    * -> decode and the oracle recomputes every output pixel straight
    * from the fixture formula. Adds rz_format (the SOURCE container),
    * rz_width/rz_height/rz_channels and rz_png; undecodable payloads
    * yield null fields, never a throw. Scale shape: per-partition
    * batch map, no shuffle.
    */
  def withResizedPixels(df: DataFrame, binCol: String,
      factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val idx = df.schema.fieldIndex(binCol)
    val add = Seq("rz_format", "rz_width", "rz_height", "rz_channels",
      "rz_png")
    val clash = add.filter(df.columns.contains)
    require(clash.isEmpty,
      s"withResizedPixels output columns already present: ${clash.mkString(", ")}")
    import org.apache.spark.sql.types._
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("rz_format", StringType),
      StructField("rz_width", IntegerType),
      StructField("rz_height", IntegerType),
      StructField("rz_channels", IntegerType),
      StructField("rz_png", BinaryType)))
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        decodeImage(row.getAs[Array[Byte]](idx)) match {
          case Some((fmt, w, h, ch, pix)) =>
            val ow = (w + factor - 1) / factor
            val oh = (h + factor - 1) / factor
            val out = new Array[Byte](ow * oh * ch)
            var oy = 0
            while (oy < oh) {
              val sy0 = oy * factor
              val sy1 = math.min(sy0 + factor, h)
              var ox = 0
              while (ox < ow) {
                val sx0 = ox * factor
                val sx1 = math.min(sx0 + factor, w)
                val n = (sy1 - sy0) * (sx1 - sx0)
                var c = 0
                while (c < ch) {
                  var sum = 0L
                  var sy = sy0
                  while (sy < sy1) {
                    var sx = sx0
                    while (sx < sx1) {
                      sum += (pix((sy * w + sx) * ch + c) & 0xff)
                      sx += 1
                    }
                    sy += 1
                  }
                  out((oy * ow + ox) * ch + c) = (sum / n).toByte
                  c += 1
                }
                ox += 1
              }
              oy += 1
            }
            org.apache.spark.sql.Row.fromSeq(row.toSeq ++
              Seq[Any](fmt, ow, oh, ch, pngEncode(ow, oh, ch, out)))
          case None =>
            org.apache.spark.sql.Row.fromSeq(row.toSeq ++
              Seq[Any](null, null, null, null, null))
        }
      }
    }(rowEnc).toDF()
  }

  /** REAL WAV PCM amplitude statistics: walks the RIFF chunks like
    * [[wavHeaderMeta]], requires audio format 1 (linear PCM) at 16 or 8
    * bits, and reduces the data payload to exact integers — sample
    * count, sum of squared amplitudes, peak |amplitude|, and the count
    * of clipped samples (full-scale codes: ±32767/-32768 at 16-bit,
    * 0/255 at 8-bit where amplitude = code - 128). 16-bit samples are
    * little-endian two's complement. Non-PCM / truncated → None.
    */
  def wavPcmStats(bytes: Array[Byte]): Option[(Long, Long, Int, Long)] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def leU16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def leU32(i: Int): Long = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int): String =
      new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    val n = if (bytes == null) -1 else bytes.length
    if (n < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmtCode = -1; var bits = -1
    var dataOff = -1; var dataLen = -1L
    while (i + 8 <= n && (fmtCode < 0 || dataOff < 0)) {
      val id = tag(i); val size = leU32(i + 4)
      if (id == "fmt " && size >= 16 && i + 24 <= n) {
        fmtCode = leU16(i + 8)
        bits = leU16(i + 22)
      } else if (id == "data") { dataOff = i + 8; dataLen = size }
      val step = 8L + size + (size & 1L)
      if (i + step > n) i = n else i += step.toInt
    }
    if (fmtCode != 1 || (bits != 16 && bits != 8) || dataOff < 0 ||
      dataOff + dataLen > n) return None
    var count = 0L; var sumSq = 0L; var peak = 0; var clipped = 0L
    if (bits == 16) {
      var j = dataOff
      val lim = dataOff + (dataLen - (dataLen & 1L)).toInt
      while (j + 2 <= lim) {
        val v = leU16(j)
        val s = if (v >= 32768) v - 65536 else v
        count += 1; sumSq += s.toLong * s
        val as = math.abs(s)
        if (as > peak) peak = as
        if (s == 32767 || s == -32768) clipped += 1
        j += 2
      }
    } else {
      var j = dataOff
      val lim = dataOff + dataLen.toInt
      while (j < lim) {
        val v = u8(j)
        val s = v - 128
        count += 1; sumSq += s.toLong * s
        val as = math.abs(s)
        if (as > peak) peak = as
        if (v == 0 || v == 255) clipped += 1
        j += 1
      }
    }
    Some((count, sumSq, peak, clipped))
  }

  /** Attach [[wavPcmStats]] to a binary column: pcm_samples /
    * pcm_sum_sq / pcm_peak / pcm_clipped, nulls for non-PCM payloads.
    */
  def withWavPcmStats(df: DataFrame, binCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(binCol)
    val add = Seq("pcm_samples", "pcm_sum_sq", "pcm_peak", "pcm_clipped")
    val clash = add.filter(df.columns.contains)
    require(clash.isEmpty,
      s"withWavPcmStats output columns already present: ${clash.mkString(", ")}")
    import org.apache.spark.sql.types._
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("pcm_samples", LongType),
      StructField("pcm_sum_sq", LongType),
      StructField("pcm_peak", IntegerType),
      StructField("pcm_clipped", LongType)))
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        wavPcmStats(row.getAs[Array[Byte]](idx)) match {
          case Some((cnt, ss, pk, cl)) =>
            org.apache.spark.sql.Row.fromSeq(row.toSeq ++
              Seq[Any](cnt, ss, pk, cl))
          case None =>
            org.apache.spark.sql.Row.fromSeq(row.toSeq ++
              Seq[Any](null, null, null, null))
        }
      }
    }(rowEnc).toDF()
  }

  /** Deterministic frame-sample positions for a (fake-)video column:
    * `n` evenly spaced byte offsets -- the partition/batch shape of a real
    * frame sampler.
    */
  def frameSampleOffsets(df: DataFrame, binCol: String, n: Int): DataFrame =
    df.withColumn("frame_offsets",
      transform(sequence(lit(0), lit(n - 1)), i =>
        (i * greatest(length(col(binCol)) - 1, lit(1))) / lit(math.max(1, n - 1))))

  /** Resize step, stubbed at the identity level: a real resize kernel
    * consumes the payload and emits new bytes; the stub emits the content
    * IDENTITY those bytes would carry -- md5(content_md5 ":WxH") -- plus
    * the target dims, as plain codegen'd column expressions. Downstream
    * stages (feature extraction, dedup, ANN) key on content identity, so
    * swapping in a real kernel changes no downstream plumbing.
    */
  def withResizedMeta(df: DataFrame, md5Col: String, targetW: Int,
      targetH: Int): DataFrame =
    df.withColumn("resized_md5",
        md5(concat(col(md5Col), lit(s":${targetW}x$targetH"))))
      .withColumn("resized_width", lit(targetW))
      .withColumn("resized_height", lit(targetH))

  /** Media feature extraction (pseudo-embedding), BATCH-shaped: the
    * kernel receives fixed-size slices of each partition's rows -- the
    * exact seam of a vectorized codec/model bridge (`mapInPandas`
    * batches, ONNX batch inference). Swap the stub body for a real model
    * call and the schema, batching, and partition mapping are unchanged.
    *
    * Stub features are the DeterministicEmbedder construction over the
    * content id: v_i = hex32(md5("id:i")) % 10000 / 10000 -- one integer
    * hash and ONE double division per dim, so any SQL oracle reproduces
    * the doubles bit-for-bit.
    */
  def withMediaFeatures(df: DataFrame, md5Col: String, dims: Int,
      batchSize: Int = 64): DataFrame = {
    require(dims > 0 && batchSize > 0)
    val idx = df.schema.fieldIndex(md5Col)
    require(!df.columns.contains("media_embedding"),
      "withMediaFeatures output column media_embedding already present")
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        "media_embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false)))
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      // model/codec init once per partition; inference per BATCH
      val md = java.security.MessageDigest.getInstance("MD5")
      def hash32(s: String): Long = {
        val d = md.digest(s.getBytes("UTF-8"))
        ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      }
      it.grouped(batchSize).flatMap { batch =>
        // a real bridge would run ONE batched forward pass here
        batch.map { row =>
          val id = row.getString(idx)
          val v = Array.tabulate(dims)(i =>
            (hash32(s"$id:$i") % 10000L).toDouble / 10000.0)
          org.apache.spark.sql.Row.fromSeq(row.toSeq :+ v.toSeq)
        }
      }
    }(rowEnc).toDF()
  }
}

package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns + typed
  * metadata, with decode/feature steps as per-partition batch functions.
  *
  * The image/audio codecs are NOT available in this environment, so the
  * decode kernel is a clearly-marked deterministic stub; everything the
  * cluster cares about -- schema, partition-level batching, column
  * pruning, the UDF seam -- is real. Swapping `decodeStub` for an actual
  * codec (or an `mapInPandas`-style vectorized bridge on PySpark) changes
  * no plumbing.
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

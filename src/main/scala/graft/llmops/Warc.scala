package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500, the Common Crawl container) ingestion — the front
  * door of every web-scale LLM training pipeline. Three surfaces over
  * one shared validating parser kernel:
  *
  *  - [[parseArchive]]: archive text -> records. Splits on WARC version
  *    lines and REJOINS false splits (a payload that itself contains
  *    "WARC/1.0\r\n" does not tear the record — a chunk whose head does
  *    not parse as a WARC named-field block is a payload continuation).
  *  - [[withWarcRecords]]: explode an archive-per-row string column
  *    into typed record rows (map-side, codegen boundary only at the
  *    kernel — the per-partition batch shape shared by the media
  *    kernels).
  *  - [[readWarc]] / [[readWarcGz]]: files. Plain `.warc` reads
  *    SPLITTABLE via the custom-record-delimiter technique proven by
  *    the PGN reader (ingest/IngestJob.readPgnSplittable): Hadoop
  *    re-synchronizes each split at the next version line, a false
  *    split at a split boundary is healed by a cross-split carry plan
  *    (pass 1 emits one tiny row per split; the driver chains leading
  *    continuation text backward; pass 2 re-reads and appends). The
  *    gzip form (`.warc.gz`, per-record gzip members concatenated —
  *    how Common Crawl actually ships) is NOT splittable by the codec,
  *    so parallelism is across files — the production shape, where a
  *    crawl segment is thousands of ~1 GB members — and each file
  *    DECODES INCREMENTALLY through [[streamRecords]] (r16), bounding
  *    task memory by the largest record instead of the archive.
  *  - [[readWarcStream]]: the Structured Streaming surface (segments
  *    arrive continuously; checkpointed exactly-once drain).
  *  - [[toWet]] / [[writeWet]]: WARC -> WET conversion records and
  *    sharded `.warc.wet[.gz]` output, the extracted-text sidecar.
  *
  * Text fidelity: payload bytes pass through UTF-8 decoding with
  * replacement (the reader targets textual response payloads for LLM
  * curation; archives of binary media belong to the binary-column
  * multimodal path). Content-Length is parsed and VALIDATED against
  * the observed payload (declared_len_ok), never trusted for walking —
  * records are bounded by version-line re-sync, so a lying length
  * cannot desynchronize the stream (the crawl-garbage contract: parse
  * what is parseable, flag the rest, never throw).
  */
object Warc {

  final case class WarcRecord(
      warc_type: String,
      warc_url: String,
      warc_date: String,
      warc_record_id: String,
      warc_refers_to: String,
      content_length: Long,
      declared_len_ok: Boolean,
      http_status: Integer,
      http_content_type: String,
      http_location: String,
      warc_body: String)

  // UNIX_LINES: MULTILINE '^' must anchor ONLY after '\n' — Java's
  // default also fires after a lone '\r'/NEL/LS/PS, where the streaming
  // path's line reader (which splits at '\n' alone) would NOT split, so
  // batch and streaming could diverge on adversarial payloads
  private val versionRe = java.util.regex.Pattern.compile(
    "^WARC/1\\.[01]\r?\n",
    java.util.regex.Pattern.MULTILINE | java.util.regex.Pattern.UNIX_LINES)
  private val fieldRe =
    java.util.regex.Pattern.compile("^[A-Za-z][A-Za-z0-9_-]*:.*")
  // precompiled: headerMap runs twice per record (WARC + HTTP heads),
  // and String.split(regex) recompiles its Pattern per call
  private val headerLineRe = java.util.regex.Pattern.compile("\r?\n")

  /** True iff the text after a version line starts with a plausible
    * WARC named-field block (first line is `Name: value`). Payload
    * bytes that merely contain a version line almost never satisfy
    * this; when they do AND the fake block contains a WARC-Type field,
    * the split is accepted — the same fundamental ambiguity every
    * delimiter-resync reader has, absent in length-walked single-file
    * readers and excluded by the WARC spec's recommendation to encode
    * payloads (gzip members) at rest.
    */
  private def validStart(chunk: String): Boolean = {
    val eol = {
      val i = chunk.indexOf('\n')
      if (i < 0) chunk.length else i
    }
    val first = chunk.substring(0, eol).stripSuffix("\r")
    fieldRe.matcher(first).matches() && {
      val headEnd = headerBlockEnd(chunk)
      val head = chunk.substring(0, headEnd._1)
      head.toLowerCase(java.util.Locale.ROOT).contains("warc-type:")
    }
  }

  /** (end-of-headers offset, start-of-payload offset). */
  private def headerBlockEnd(s: String): (Int, Int) = {
    val rr = s.indexOf("\r\n\r\n")
    val nn = s.indexOf("\n\n")
    if (rr >= 0 && (nn < 0 || rr <= nn)) (rr, rr + 4)
    else if (nn >= 0) (nn, nn + 2)
    else (s.length, s.length)
  }

  private def headerMap(head: String): Map[String, String] =
    headerLineRe.split(head).iterator
      .filter(l => l.contains(":"))
      .map { l =>
        val i = l.indexOf(':')
        l.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT) ->
          l.substring(i + 1).trim
      }.toMap

  /** `transparent`: the archive text was decoded ISO-8859-1 (one char
    * per byte, bijective on 0..255 — the byte-transparent mode that
    * feeds [[graft.llmops.Web.withTranscodedBody]]), so the payload's
    * byte length IS its char length; in the default UTF-8 mode the
    * payload re-encodes to count bytes.
    */
  private def parseOne(chunk: String,
      transparent: Boolean = false): WarcRecord = {
    val (hEnd, pStart) = headerBlockEnd(chunk)
    val fields = headerMap(chunk.substring(0, hEnd))
    // the content block is followed by EXACTLY ONE \r\n\r\n record
    // separator (ISO 28500 §4), which delimiter splitting leaves on the
    // chunk tail -- strip one separator only, so payloads that
    // legitimately end in CRLFs (an HTTP request's final blank line)
    // survive byte-exact and their Content-Length validates
    val payload = {
      val p = chunk.substring(math.min(pStart, chunk.length))
      if (p.endsWith("\r\n\r\n")) p.dropRight(4)
      else if (p.endsWith("\n\n")) p.dropRight(2)
      else if (p.endsWith("\r\n")) p.dropRight(2) // partial sep at EOF
      else if (p.endsWith("\n")) p.dropRight(1)
      else p
    }
    val declared = fields.get("content-length")
      .flatMap(v => scala.util.Try(v.toLong).toOption).getOrElse(-1L)
    val declaredOk = declared >= 0 &&
      declared == (if (transparent) payload.length.toLong
        else payload.getBytes(
          java.nio.charset.StandardCharsets.UTF_8).length.toLong)
    val (status, ctype, loc, body) =
      if (payload.startsWith("HTTP/")) {
        val (he, ps) = headerBlockEnd(payload)
        val statusLine = payload.substring(0,
          math.min(he, payload.length))
        val st = statusLine.split("\\s+") match {
          case arr if arr.length >= 2 =>
            scala.util.Try(arr(1).toInt).toOption
          case _ => None
        }
        val hh = headerMap(payload.substring(0, he))
        (st.map(Integer.valueOf).orNull,
          hh.get("content-type").orNull,
          hh.get("location").orNull, // redirect target (301/302/...)
          payload.substring(math.min(ps, payload.length)))
      } else (null: Integer, null: String, null: String, payload)
    WarcRecord(
      fields.getOrElse("warc-type", ""),
      fields.getOrElse("warc-target-uri", null),
      fields.getOrElse("warc-date", null),
      fields.getOrElse("warc-record-id", null),
      fields.getOrElse("warc-refers-to", null),
      declared, declaredOk, status, ctype, loc, body)
  }

  /** Split archive text into per-record chunks (version line stripped),
    * healing false splits. Leading bytes before the first version line
    * are dropped (mid-stream entry — the splittable reader's carry
    * machinery hands them to the owner of the record they belong to).
    * Returns (leadingContinuationText, records-as-chunks).
    */
  private[llmops] def chunkArchive(
      text: String): (String, Vector[String]) = {
    val m = versionRe.matcher(text)
    val starts = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    while (m.find()) starts += ((m.start(), m.end()))
    if (starts.isEmpty) return (text, Vector.empty)
    val leading = text.substring(0, starts.head._1)
    val raw = starts.indices.map { i =>
      val from = starts(i)._2
      val until =
        if (i + 1 < starts.length) starts(i + 1)._1 else text.length
      (text.substring(starts(i)._1, starts(i)._2),
        text.substring(from, until))
    }
    // accumulate per-record in StringBuilders: a payload that embeds
    // many version lines heals in O(n), not O(n^2) immutable concats
    // (an adversarial crawl page must not stall the task)
    val out = scala.collection.mutable.ArrayBuffer.empty[StringBuilder]
    val leadAcc = new StringBuilder(leading)
    raw.foreach { case (ver, chunk) =>
      if (validStart(chunk)) out += new StringBuilder(chunk)
      else if (out.nonEmpty) { out.last ++= ver; out.last ++= chunk }
      else { leadAcc ++= ver; leadAcc ++= chunk } // continuation before any record
    }
    (leadAcc.toString, out.iterator.map(_.toString).toVector)
  }

  /** Parse a full archive string into records (false splits healed,
    * leading garbage dropped). Never throws on crawl garbage.
    * `byteTransparent`: see [[parseOne]].
    */
  def parseArchive(text: String,
      byteTransparent: Boolean = false): Seq[WarcRecord] =
    if (text == null) Seq.empty
    else chunkArchive(text)._2.map(parseOne(_, byteTransparent))

  /** Buffered line reader that PRESERVES terminators, so record text
    * reassembles byte-exact. bufSize is a test knob (boundary-straddle
    * coverage); 64 KB in production.
    */
  private final class LineReader(r: java.io.Reader, bufSize: Int) {
    private val buf = new Array[Char](bufSize)
    private var len = 0
    private var pos = 0
    private def fill(): Boolean = {
      var n = r.read(buf)
      while (n == 0) n = r.read(buf)
      pos = 0; len = math.max(n, 0); n > 0
    }
    /** Next line INCLUDING its '\n' (last line may lack one); null at
      * EOF. */
    def readLine(): String = {
      if (pos >= len && !fill()) return null
      val sb = new StringBuilder
      var done = false
      while (!done) {
        if (pos >= len && !fill()) done = true
        else {
          val c = buf(pos); pos += 1
          sb += c
          if (c == '\n') done = true
        }
      }
      sb.toString
    }
  }

  /** Exactly the version lines [[chunkArchive]]'s anchored regex
    * accepts: the line reader splits at every '\n', so a match of
    * `(?m)^WARC/1\.[01]\r?\n` is precisely a line equal to one of
    * these four forms.
    */
  private def isVersionLine(line: String): Boolean =
    line == "WARC/1.0\r\n" || line == "WARC/1.1\r\n" ||
      line == "WARC/1.0\n" || line == "WARC/1.1\n"

  /** Streaming record iterator over a character stream — the
    * `.warc.gz` kernel. Memory is bounded by the LARGEST RECORD, never
    * the archive: a ~1 GB gz member (3-4 GB of text) flows through a
    * 64 KB decode window instead of materializing as one String.
    *
    * Semantics are IDENTICAL to [[parseArchive]] by construction, not
    * by parallel reimplementation: chunks are delimited at the same
    * anchored version lines ([[isVersionLine]] ≡ the regex on
    * line-reader output), and each candidate chunk's accept/heal
    * decision calls the SAME [[validStart]] on a prefix that provably
    * yields the same answer — the prefix extends to the first header
    * separator (headerBlockEnd's earliest match, found incrementally),
    * the next version line, or EOF, whichever comes first, and
    * validStart never reads past the first of those. A first line that
    * fails the named-field shape short-circuits to "continuation"
    * without buffering the payload (the common false-split case).
    * Equivalence is property-tested against parseArchive in WarcSpec.
    */
  def streamRecords(reader: java.io.Reader,
      bufSize: Int = 1 << 16,
      byteTransparent: Boolean = false): Iterator[WarcRecord] =
    new scala.collection.AbstractIterator[WarcRecord] {
      private val lr = new LineReader(reader, bufSize)
      private var cur: StringBuilder = null // current record (post-version-line)
      private var pendingVer: String = null // version line awaiting its chunk
      private var ready: WarcRecord = null
      private var eof = false

      /** Earliest header-separator end position in `tent` (the
        * incremental mirror of headerBlockEnd's indexOf scan), or -1.
        * Checked over the tail window only, so the scan is O(text).
        */
      private def sepFoundIn(tent: StringBuilder, prevLen: Int): Boolean = {
        val from = math.max(0, prevLen - 3)
        tent.indexOf("\r\n\r\n", from) >= 0 ||
          tent.indexOf("\n\n", from) >= 0
      }

      private def flushCur(): Unit =
        if (cur != null) {
          ready = parseOne(cur.toString, byteTransparent); cur = null
        }

      private def advance(): Unit = {
        while (ready == null) {
          if (pendingVer == null && eof) { flushCur(); return }
          if (pendingVer == null) {
            val line = lr.readLine()
            if (line == null) eof = true // next iteration flushes
            else if (isVersionLine(line)) pendingVer = line
            else if (cur != null) cur ++= line
            // else: leading garbage before the first record, dropped
          } else {
            val ver = pendingVer; pendingVer = null
            // candidate chunk: buffer until the validity decision is
            // forced (first header separator / next version line /
            // EOF), then ask the SAME validStart as the batch path
            val tent = new StringBuilder
            var decided = false
            var first = true
            var fieldish = false
            while (!decided) {
              val line = lr.readLine()
              if (line == null) { eof = true; decided = true }
              else if (isVersionLine(line)) {
                pendingVer = line; decided = true
              } else {
                if (first) {
                  first = false
                  val bare = line.stripSuffix("\n").stripSuffix("\r")
                  fieldish = fieldRe.matcher(bare).matches()
                  tent ++= line
                  if (!fieldish) decided = true // continuation for sure
                  else decided = sepFoundIn(tent, 0)
                } else {
                  val prevLen = tent.length
                  tent ++= line
                  decided = sepFoundIn(tent, prevLen)
                }
              }
            }
            if (fieldish && validStart(tent.toString)) {
              flushCur() // previous record is complete
              cur = new StringBuilder(tent.toString)
            } else if (cur != null) { cur ++= ver; cur ++= tent }
            // else: continuation before any record, dropped
            // (an EOF reached here is handled by the loop head, AFTER
            // any record this decision completed is consumed)
          }
        }
      }

      advance()
      override def hasNext: Boolean = ready != null
      override def next(): WarcRecord = {
        val r = ready; ready = null; advance(); r
      }
    }

  /** Explode an archive-per-row string/binary column into WARC record
    * rows: input columns + rec_idx + the [[WarcRecord]] fields.
    * Map-side batch kernel, no shuffle.
    *
    * `byteTransparent = true` decodes a BINARY archive column
    * ISO-8859-1 instead of UTF-8: latin1 maps byte k to codepoint k, so
    * `warc_body`'s CHARS are the payload's BYTES, undamaged — the
    * shape [[graft.llmops.Web.withTranscodedBody]] needs to recover
    * Shift_JIS/windows-1251/... pages (UTF-8-with-replacement decode
    * destroys every non-UTF-8 byte run as U+FFFD). WARC and HTTP
    * headers are ASCII either way, so field parsing is unaffected.
    */
  def withWarcRecords(df: DataFrame, archiveCol: String,
      byteTransparent: Boolean = false): DataFrame = {
    val idx = df.schema.fieldIndex(archiveCol)
    import org.apache.spark.sql.types._
    val recFields = Seq(
      StructField("rec_idx", IntegerType, nullable = false),
      StructField("warc_type", StringType),
      StructField("warc_url", StringType),
      StructField("warc_date", StringType),
      StructField("warc_record_id", StringType),
      StructField("warc_refers_to", StringType),
      StructField("content_length", LongType, nullable = false),
      StructField("declared_len_ok", BooleanType, nullable = false),
      StructField("http_status", IntegerType),
      StructField("http_content_type", StringType),
      StructField("http_location", StringType),
      StructField("warc_body", StringType))
    val clash = recFields.map(_.name).filter(df.columns.contains)
    require(clash.isEmpty,
      s"withWarcRecords output columns already present: ${clash.mkString(", ")}")
    val outSchema = StructType(df.schema.fields ++ recFields)
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val raw = row.get(idx) match {
          case null => null
          case b: Array[Byte] =>
            new String(b,
              if (byteTransparent)
                java.nio.charset.StandardCharsets.ISO_8859_1
              else java.nio.charset.StandardCharsets.UTF_8)
          case s: String => s
          case other => other.toString
        }
        parseArchive(raw, byteTransparent).zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(row.toSeq ++ Seq[Any](i,
            r.warc_type, r.warc_url, r.warc_date, r.warc_record_id,
            r.warc_refers_to, r.content_length, r.declared_len_ok,
            r.http_status, r.http_content_type, r.http_location,
            r.warc_body))
        }
      }
    }(rowEnc).toDF()
  }

  /** WARC -> WET conversion (the Common Crawl "extracted text"
    * sidecar format): one `WARC-Type: conversion` record per response,
    * payload = the extracted plain text, `WARC-Refers-To` linking back
    * to the source record. Input is the [[withWarcRecords]] /
    * [[readWarc]] column shape; `textCol` is the extraction the caller
    * chose (Web.htmlTextUdf, Web.mainContentUdf, ...). Adds
    * `wet_text` and the fully rendered `wet_record` — PURE column
    * expressions (concat/when/octet_length), so the render runs inside
    * whole-stage codegen and its Content-Length is byte-consistent
    * with the parser by construction (gated round-trip:
    * llm_wet_roundtrip re-parses the rendered record and the declared
    * length must validate).
    */
  def toWet(records: DataFrame,
      textCol: org.apache.spark.sql.Column): DataFrame = {
    def headerLine(name: String,
        v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(v.isNull, lit("")).otherwise(
        concat(lit(name + ": "), v, lit("\r\n")))
    val text = coalesce(textCol, lit(""))
    // every conversion record carries its OWN WARC-Record-ID (Common
    // Crawl WET convention — downstream keyed on record id must not see
    // nulls): a urn:uuid shaped deterministically from the source
    // record's identity (id, else url), so re-runs are reproducible and
    // an oracle can replay it
    val idSeed = md5(concat_ws("|", lit("graft-wet"),
      coalesce(col("warc_record_id"), col("warc_url"), lit(""))))
    val wetId = concat(lit("<urn:uuid:"),
      substring(idSeed, 1, 8), lit("-"), substring(idSeed, 9, 4),
      lit("-"), substring(idSeed, 13, 4), lit("-"),
      substring(idSeed, 17, 4), lit("-"), substring(idSeed, 21, 12),
      lit(">"))
    records.where(col("warc_type") === "response")
      .withColumn("wet_text", text)
      .withColumn("wet_record", concat(
        lit("WARC/1.0\r\nWARC-Type: conversion\r\n"),
        headerLine("WARC-Target-URI", col("warc_url")),
        headerLine("WARC-Date", col("warc_date")),
        headerLine("WARC-Record-ID", wetId),
        headerLine("WARC-Refers-To", col("warc_record_id")),
        lit("Content-Type: text/plain\r\n"),
        lit("Content-Length: "),
        octet_length(col("wet_text")).cast("string"),
        lit("\r\n\r\n"), col("wet_text"), lit("\r\n\r\n")))
  }

  /** Write rendered WET records (`wet_record` column) as sharded
    * `.warc.wet[.gz]` files, one file per non-empty partition via the
    * Hadoop FileSystem API (works on any scheme the executors know).
    * Files round-trip through [[readWarc]] / [[readWarcGz]] /
    * [[parseArchive]]. Returns the number of shard files written.
    * Spark's text sink is NOT usable here: it appends '\n' per row,
    * which would corrupt the byte-exact record separator the
    * Content-Length validation depends on.
    */
  def writeWet(wet: DataFrame, dir: String, gzip: Boolean = true): Long = {
    import org.apache.spark.sql.Encoders
    val spark = wet.sparkSession
    // ship the DRIVER's effective Hadoop conf to the writer tasks (as a
    // broadcast entry list — SerializableConfiguration is private[spark]):
    // a bare `new Configuration()` would drop every spark.hadoop.*
    // setting (s3a credentials, custom scheme impls), so "any scheme the
    // executors know" would silently mean "defaults only"
    val confEntries = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    val bcConf = spark.sparkContext.broadcast(confEntries)
    val written = wet.select(col("wet_record")).as(Encoders.STRING)
      .rdd.mapPartitionsWithIndex { (i, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          val suffix = if (gzip) ".warc.wet.gz" else ".warc.wet"
          val p = new org.apache.hadoop.fs.Path(dir, f"wet-$i%05d$suffix")
          val conf = new org.apache.hadoop.conf.Configuration(false)
          bcConf.value.foreach { case (k, v) => conf.set(k, v) }
          val fs = p.getFileSystem(conf)
          val base = fs.create(p, true)
          val out: java.io.OutputStream =
            if (gzip) new java.util.zip.GZIPOutputStream(base, 1 << 16)
            else base
          try it.foreach(s =>
            out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          finally out.close()
          Iterator.single(1L)
        }
      }
    written.sum().toLong
  }

  private val recordSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("source_file",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("rec_idx",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("warc_type",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("warc_url",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("warc_date",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("warc_record_id",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("warc_refers_to",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("content_length",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("declared_len_ok",
      org.apache.spark.sql.types.BooleanType, nullable = false),
    org.apache.spark.sql.types.StructField("http_status",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("http_content_type",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("http_location",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("warc_body",
      org.apache.spark.sql.types.StringType)))

  private def recordRow(file: String, idx: Long,
      r: WarcRecord): org.apache.spark.sql.Row =
    org.apache.spark.sql.Row(file, idx, r.warc_type, r.warc_url,
      r.warc_date, r.warc_record_id, r.warc_refers_to,
      r.content_length, r.declared_len_ok, r.http_status,
      r.http_content_type, r.http_location, r.warc_body)

  /** Splittable plain-`.warc` reader. Hadoop TextInputFormat with the
    * record delimiter "WARC/1.0\r\n": splits re-synchronize at version
    * lines; a FALSE split (payload containing the delimiter) that
    * lands inside one split is healed locally by [[chunkArchive]], and
    * one that lands at a split boundary is healed by the two-pass
    * carry plan (pass 1: one row per split with its leading
    * continuation text and record count; driver: chain continuations
    * backward to the split owning the torn record, assign global
    * per-file record indices; pass 2: re-read, append carry, emit).
    * Both passes share the same kernel, so counts and slots cannot
    * disagree — the readPgnSplittable design, citation there.
    */
  /** `maxCarryChars` BOUNDS the driver-side carry plan: pass 1 ships a
    * split's leading continuation text only up to this cap (a normal
    * split's lead is ~0 bytes; a lead is nonzero only when a FALSE
    * split lands exactly on a split boundary). A file containing an
    * over-cap lead — an adversarial record spanning whole splits —
    * falls back to a single-task whole-file read for THAT file: such a
    * record must reassemble inside one task anyway, so the fallback
    * changes locality, not the memory bound, and the collected report
    * stays O(splits × cap) instead of O(splits × split-size).
    */
  /** `byteTransparent` also applies to the SPLITTABLE path (r18): the
    * "WARC/1.0\r\n" record delimiter is pure ASCII, so TextInputFormat
    * re-sync is byte-oblivious to the payload encoding, and decoding
    * each chunk's raw bytes as ISO-8859-1 (one char per byte) instead
    * of Text.toString's UTF-8-with-replacement makes the whole
    * carry/splice machinery byte-exact — chars == bytes, so the carry
    * cap, Content-Length validation and fallback all measure bytes.
    * Plain `.warc` therefore keeps split-level parallelism even when
    * the caller needs byte fidelity for charset transcoding.
    */
  def readWarc(spark: SparkSession, path: String,
      hadoopConf: Map[String, String] = Map.empty,
      maxCarryChars: Int = 1 << 20,
      byteTransparent: Boolean = false): DataFrame =
    readWarcFiles(spark, Seq(path), hadoopConf, maxCarryChars,
      byteTransparent)

  /** Multi-file form of [[readWarc]]. Paths are registered per-Path
    * through FileInputFormat (which escapes its own separators), never
    * comma-joined — a legal HDFS/S3 object name containing a comma
    * reads as ONE path instead of splitting into two nonexistent ones.
    * Each entry may still be a glob.
    */
  def readWarcFiles(spark: SparkSession, paths: Seq[String],
      hadoopConf: Map[String, String] = Map.empty,
      maxCarryChars: Int = 1 << 20,
      byteTransparent: Boolean = false): DataFrame = {
    require(paths.nonEmpty, "readWarcFiles: empty path list")
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", "WARC/1.0\r\n")
    hadoopConf.foreach { case (k, v) => conf.set(k, v) }
    val job = org.apache.hadoop.mapreduce.Job.getInstance(conf)
    org.apache.hadoop.mapreduce.lib.input.FileInputFormat.setInputPaths(
      job, paths.map(p => new org.apache.hadoop.fs.Path(p)): _*)
    val jobConf = job.getConfiguration

    def scan[U: scala.reflect.ClassTag](
        f: (String, Long, Boolean, Iterator[String]) => Iterator[U]) =
      spark.sparkContext.newAPIHadoopRDD(
        jobConf,
        classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
        classOf[org.apache.hadoop.io.LongWritable],
        classOf[org.apache.hadoop.io.Text])
        .asInstanceOf[org.apache.spark.rdd.NewHadoopRDD[
          org.apache.hadoop.io.LongWritable, org.apache.hadoop.io.Text]]
        .mapPartitionsWithInputSplit { (split, iter) =>
          val fs = split
            .asInstanceOf[org.apache.hadoop.mapreduce.lib.input.FileSplit]
          val u = fs.getPath.toUri
          val file = new java.net.URI(u.getScheme,
            Option(u.getAuthority).getOrElse(""), u.getPath, null, null)
            .toString
          // transparent mode decodes the chunk's raw bytes latin1 so
          // chars==bytes end to end; default keeps Text's UTF-8
          val decode: org.apache.hadoop.io.Text => String =
            if (byteTransparent) t => new String(t.getBytes, 0,
              t.getLength, java.nio.charset.StandardCharsets.ISO_8859_1)
            else _.toString
          f(file, fs.getStart, fs.getStart == 0L, iter.map(kv =>
            decode(kv._2)))
        }

    // Reassemble the split's text: the delimiter is stripped between
    // records; only the file head keeps (or lacks) its own version
    // line. Re-attaching "WARC/1.0\r\n" before every non-head chunk
    // reproduces the split's bytes, and chunkArchive re-validates.
    def splitText(isFileHead: Boolean, chunks: Iterator[String]): String = {
      val sb = new StringBuilder
      var first = true
      chunks.foreach { c =>
        if (!(first && isFileHead)) sb ++= "WARC/1.0\r\n"
        first = false
        sb ++= c
      }
      sb.toString
    }

    // Pass 1: per split — leading continuation text (payload tail of a
    // record owned by an earlier split; shipped only up to the cap, so
    // the collect stays bounded) plus its TRUE length, and the number
    // of records STARTING here.
    val reports = scan { (file, start, head, iter) =>
      val (lead, recs) = chunkArchive(splitText(head, iter))
      val shipped = if (lead.length <= maxCarryChars) lead else ""
      Iterator((file, start, shipped, lead.length.toLong, recs.size))
    }.collect()

    // Driver plan: for each split, the carry text to APPEND to its
    // last record = concatenation of following splits' leading
    // continuations while those splits contain the continuation chain
    // (a split that is ALL continuation contributes and forwards), and
    // the global base index = sum of record counts of earlier splits.
    // A file whose chain NEEDS a lead that was over-cap (truncated to
    // "") cannot be spliced from the report — it re-reads whole, one
    // task, below. The head split's lead is pre-first-record garbage
    // and never needed, so it cannot force a fallback.
    val byFile = reports.groupBy(_._1)
    val fallbackFiles = scala.collection.mutable.LinkedHashSet.empty[String]
    val plan: Map[(String, Long), (Long, String)] = byFile.flatMap {
      case (file, rs) =>
        val sorted = rs.sortBy(_._2)
        val truncated = sorted.indices.exists { i =>
          i > 0 && sorted(i)._4 > maxCarryChars
        }
        if (truncated) {
          fallbackFiles += file
          Seq.empty
        } else {
          var base = 0L
          sorted.indices.map { i =>
            val (f, start, _, _, n) = sorted(i)
            val myBase = base
            base += n
            // carry: chain of subsequent splits' leading texts, stopping
            // after the first split that has records of its own
            val carry = new StringBuilder
            var j = i + 1
            var open = true
            while (open && j < sorted.length) {
              carry ++= sorted(j)._3
              if (sorted(j)._5 > 0) open = false
              j += 1
            }
            (f, start) -> ((myBase, carry.toString))
          }
        }
    }
    val bc = spark.sparkContext.broadcast(plan)

    val rows = scan { (file, start, head, iter) =>
      bc.value.get((file, start)) match {
        case None => Iterator.empty // file on the whole-read fallback
        case Some((base, carry)) =>
          val (_, recs) = chunkArchive(splitText(head, iter) + carry)
          recs.iterator.zipWithIndex.map { case (chunk, i) =>
            recordRow(file, base + i, parseOne(chunk, byteTransparent))
          }
      }
    }
    val normal = spark.createDataFrame(rows, recordSchema)
    if (fallbackFiles.isEmpty) normal
    else
      normal.union(wholeFileRows(spark, fallbackFiles.toSeq, conf,
        byteTransparent))
  }

  /** Whole-file reads for the over-cap fallback: one task per file
    * (such a record must reassemble in one task anyway), each path
    * opened directly through its FileSystem — never comma-joined, and
    * honoring the caller's `byteTransparent` so an over-cap file keeps
    * the same byte fidelity as the spliced path.
    */
  private def wholeFileRows(spark: SparkSession, files: Seq[String],
      conf: org.apache.hadoop.conf.Configuration,
      byteTransparent: Boolean): DataFrame = {
    val sconf = new SerializableHadoopConf(conf)
    val bt = byteTransparent
    val rows = spark.sparkContext.parallelize(files, files.size)
      .flatMap { f =>
        val hp = new org.apache.hadoop.fs.Path(f)
        val hfs = hp.getFileSystem(sconf.value)
        val u = hp.toUri
        val file = new java.net.URI(u.getScheme,
          Option(u.getAuthority).getOrElse(""), u.getPath, null, null)
          .toString
        val len = hfs.getFileStatus(hp).getLen
        require(len <= Int.MaxValue,
          s"over-cap fallback file exceeds 2 GB single-buffer read: $f")
        val bytes = new Array[Byte](len.toInt)
        val in = hfs.open(hp)
        try org.apache.hadoop.io.IOUtils.readFully(in, bytes, 0, len.toInt)
        finally in.close()
        val text = new String(bytes,
          if (bt) java.nio.charset.StandardCharsets.ISO_8859_1
          else java.nio.charset.StandardCharsets.UTF_8)
        chunkArchive(text)._2.iterator.zipWithIndex.map {
          case (chunk, i) => recordRow(file, i.toLong, parseOne(chunk, bt))
        }
      }
    spark.createDataFrame(rows, recordSchema)
  }

  /** Hadoop Configuration is not Serializable; this minimal wrapper
    * ships it to executors via its own Writable form (the standard
    * pattern — Spark's internal equivalent is private[spark]).
    */
  private final class SerializableHadoopConf(
      @transient private var conf: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    def value: org.apache.hadoop.conf.Configuration = conf
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new org.apache.hadoop.conf.Configuration(false)
      conf.readFields(in)
    }
  }

  /** Read every WARC file under `dir` with the right reader per
    * at-rest form: `.gz` members through the streaming gz reader
    * (parallel across files — the Common Crawl sharding), everything
    * else through the splittable plain reader. One union DataFrame in
    * the shared record schema — the one-call front door PipelineApp's
    * --warc mode uses. Listing is driver-side (file COUNT, not data)
    * and RECURSIVE: real crawl dumps nest
    * (`segments/<id>/warc/...`, the Common Crawl layout). Only files
    * whose NAME ends in a known archive suffix are read — sidecars a
    * crawl dir legitimately contains (`.crc` checksums the local FS
    * writes next to [[writeWet]] output, `warc.paths` listings,
    * `_SUCCESS` markers, dot-hidden files) must not reach a parser.
    */
  private val archiveSuffixes =
    Seq(".warc", ".warc.gz", ".wet", ".wet.gz")

  def readWarcDir(spark: SparkSession, dir: String,
      byteTransparent: Boolean = false): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val fp = it.next().getPath
        val name = fp.getName
        if (!name.startsWith(".") && !name.startsWith("_") &&
            archiveSuffixes.exists(name.endsWith)) buf += fp.toString
      }
      buf.toSeq
    }
    require(files.nonEmpty, s"no .warc/.wet files under $dir")
    // de-twin (r19): a dir holding the SAME archive as both `x.warc`
    // and `x.warc.gz` (what an archive transcoder leaves behind) must
    // not read every record twice through the union — prefer the gz
    // twin (one task per file either way; the gz is the at-rest form
    // a crawl dir keeps)
    val have = files.toSet
    val twins = files.filter(f =>
      !f.endsWith(".gz") && have.contains(f + ".gz"))
    if (twins.nonEmpty) {
      // say which plain files were skipped: if a twin pair legitimately
      // DIFFERS (partial transcode, re-crawl under the same stem) the
      // plain file's records are intentionally not read — an operator
      // must be able to see that from the log rather than discover
      // missing records downstream
      org.slf4j.LoggerFactory.getLogger("graft.llmops.Warc").warn(
        s"readWarcDir: skipping ${twins.size} plain archive(s) whose " +
          s".gz twin exists in the same dir (gz wins; first: " +
          s"${twins.head}). If a twin pair is NOT a transcode of the " +
          "same archive, read the plain file explicitly.")
    }
    val detwinned = files.filterNot(f =>
      !f.endsWith(".gz") && have.contains(f + ".gz"))
    val (gz, plain) = detwinned.partition(_.endsWith(".gz"))
    val parts = Seq(
      if (gz.nonEmpty)
        Some(readWarcGzFiles(spark, gz,
          byteTransparent = byteTransparent))
      else None,
      if (plain.nonEmpty)
        // the splittable reader handles BOTH fidelity modes (latin1
        // chunk decode under byteTransparent, r18) — plain .warc keeps
        // split-level parallelism either way
        Some(readWarcFiles(spark, plain,
          byteTransparent = byteTransparent))
      else None).flatten
    parts.reduce(_ union _)
  }

  /** Structured Streaming WARC source: crawl segments ARRIVE
    * continuously in production, so the front door needs a streaming
    * surface with exactly-once file semantics (checkpointed
    * file-source offsets — a re-run picks up only NEW segments, the
    * streaming replacement for ledger bookkeeping). Built on the
    * binaryFile source (which materializes each segment's compressed
    * bytes per row — the source's contract); the decode still runs
    * through [[streamRecords]], so the 3-4x decompressed-text blowup
    * never materializes and per-file memory is compressed size + one
    * record. `.gz` paths decode as concatenated members; everything
    * else parses as plain archive text. Drain with
    * `Trigger.AvailableNow` for batch-compatible runs (the
    * StreamingIngest pattern, streaming/StreamingIngest.scala).
    */
  def readWarcStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16,
      byteTransparent: Boolean = false): DataFrame = {
    import spark.implicits._
    // the binaryFile source's fixed schema, spelled out because
    // streaming file sources refuse to infer one
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        val in: java.io.InputStream =
          new java.io.ByteArrayInputStream(
            if (bytes == null) Array.emptyByteArray else bytes)
        val reader = new java.io.InputStreamReader(
          if (file.endsWith(".gz"))
            new java.util.zip.GZIPInputStream(in, 1 << 16)
          else in,
          if (byteTransparent)
            java.nio.charset.StandardCharsets.ISO_8859_1
          else java.nio.charset.StandardCharsets.UTF_8)
        val base = streamRecords(reader, byteTransparent = byteTransparent)
        // end the gzip Inflater's native buffer eagerly on exhaustion,
        // AND on early task end (failure / limit / query stop) via the
        // task-completion listener — the readWarcGz contract
        val closing = new scala.collection.AbstractIterator[WarcRecord] {
          override def hasNext: Boolean = {
            val h = base.hasNext
            if (!h) reader.close()
            h
          }
          override def next(): WarcRecord = base.next()
        }
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try reader.close() catch { case _: Exception => () }))
        var idx = -1L
        closing.map { r =>
          idx += 1
          (file, idx, r.warc_type, r.warc_url, r.warc_date,
            r.warc_record_id, r.warc_refers_to, r.content_length,
            r.declared_len_ok,
            Option(r.http_status).map(_.intValue()),
            r.http_content_type, r.http_location, r.warc_body)
        }
      }
      .toDF("source_file", "rec_idx", "warc_type", "warc_url",
        "warc_date", "warc_record_id", "warc_refers_to",
        "content_length", "declared_len_ok", "http_status",
        "http_content_type", "http_location", "warc_body")
  }

  /** `.warc.gz` reader: concatenated per-record gzip members (the
    * Common Crawl at-rest format). The gzip codec is not splittable,
    * so each FILE decodes in one task (JDK GZIPInputStream reads
    * concatenated members natively) and parallelism comes from the
    * file set — the production sharding, where a crawl segment is many
    * ~1 GB files. minPartitions spreads small file sets across tasks.
    *
    * The decode is STREAMED ([[streamRecords]]): task memory is
    * bounded by the largest single record, so a ~1 GB member (~3-4 GB
    * of decompressed text) never materializes as one String — the
    * pre-r16 readAllBytes shape OOM'd exactly the production file
    * size the Scaladoc promised.
    */
  def readWarcGz(spark: SparkSession, path: String,
      minPartitions: Int = 0,
      byteTransparent: Boolean = false): DataFrame = {
    val mp = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    val rows = spark.sparkContext
      .binaryFiles(path, mp)
      .flatMap { case (file, pds) =>
        // InputStreamReader(UTF_8) replaces malformed sequences, the
        // same policy as `new String(bytes, UTF_8)` — byte-identical
        // output to the materializing path, tested in WarcSpec.
        // byteTransparent decodes latin1 (see withWarcRecords) so
        // non-UTF-8 payload bytes survive for charset transcoding.
        val reader = new java.io.InputStreamReader(
          new java.util.zip.GZIPInputStream(pds.open(), 1 << 16),
          if (byteTransparent)
            java.nio.charset.StandardCharsets.ISO_8859_1
          else java.nio.charset.StandardCharsets.UTF_8)
        val base = streamRecords(reader, byteTransparent = byteTransparent)
        var idx = -1L
        // close on exhaustion; tasks that stop early are covered by
        // the task-completion listener below
        val closing = new scala.collection.AbstractIterator[WarcRecord] {
          override def hasNext: Boolean = {
            val h = base.hasNext
            if (!h) reader.close()
            h
          }
          override def next(): WarcRecord = base.next()
        }
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try reader.close() catch { case _: Exception => () }))
        closing.map { r => idx += 1; recordRow(file, idx, r) }
      }
    spark.createDataFrame(rows, recordSchema)
  }

  /** Multi-file form of [[readWarcGz]]: one task per file (gzip is not
    * splittable; parallelism across files is the production shape),
    * each path opened directly through its FileSystem — comma-safe,
    * same contract as [[readWarcFiles]]. Streaming decode through
    * [[streamRecords]], so task memory stays bounded by the largest
    * record.
    */
  def readWarcGzFiles(spark: SparkSession, paths: Seq[String],
      byteTransparent: Boolean = false): DataFrame = {
    require(paths.nonEmpty, "readWarcGzFiles: empty path list")
    val sconf = new SerializableHadoopConf(
      new org.apache.hadoop.conf.Configuration(
        spark.sparkContext.hadoopConfiguration))
    val bt = byteTransparent
    val rows = spark.sparkContext.parallelize(paths, paths.size)
      .flatMap { p =>
        val hp0 = new org.apache.hadoop.fs.Path(p)
        val hfs = hp0.getFileSystem(sconf.value)
        // qualify + rebuild without query/fragment, the EXACT key
        // rendering readWarcFiles derives from its FileSplit — so
        // doc_id = xxhash64(source_file, rec_idx) is stable across
        // reader entry points for the same file (an unqualified
        // '/tmp/x.warc.gz' used to render differently here)
        val hp = hfs.makeQualified(hp0)
        val u = hp.toUri
        val file = new java.net.URI(u.getScheme,
          Option(u.getAuthority).getOrElse(""), u.getPath, null, null)
          .toString
        val reader = new java.io.InputStreamReader(
          new java.util.zip.GZIPInputStream(hfs.open(hp), 1 << 16),
          if (bt) java.nio.charset.StandardCharsets.ISO_8859_1
          else java.nio.charset.StandardCharsets.UTF_8)
        val base = streamRecords(reader, byteTransparent = bt)
        val closing = new scala.collection.AbstractIterator[WarcRecord] {
          override def hasNext: Boolean = {
            val h = base.hasNext
            if (!h) reader.close()
            h
          }
          override def next(): WarcRecord = base.next()
        }
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try reader.close() catch { case _: Exception => () }))
        var idx = -1L
        closing.map { r => idx += 1; recordRow(file, idx, r) }
      }
    spark.createDataFrame(rows, recordSchema)
  }
}

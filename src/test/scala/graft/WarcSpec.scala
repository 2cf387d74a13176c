package graft

import graft.llmops.Warc

class WarcSpec extends SparkSpec {

  private def resp(url: String, html: String,
      extra: String = ""): String = {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    val len = http.getBytes("UTF-8").length
    s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      s"WARC-Record-ID: <urn:uuid:$url>\r\n" +
      extra +
      s"Content-Length: $len\r\n\r\n" + http + "\r\n\r\n"
  }

  private def req(url: String): String = {
    val http = s"GET / HTTP/1.1\r\nHost: h\r\n\r\n"
    s"WARC/1.0\r\nWARC-Type: request\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n" +
      http + "\r\n\r\n"
  }

  test("parseArchive: typed fields, HTTP split, length validation") {
    val arc = req("http://a.com/") +
      resp("http://a.com/", "<html><body>hello world</body></html>") +
      "WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 999\r\n\r\n" +
      "via: crawler\r\n\r\n"
    val rs = Warc.parseArchive(arc)
    assert(rs.map(_.warc_type) === Seq("request", "response", "metadata"))
    val r = rs(1)
    assert(r.warc_url === "http://a.com/")
    assert(r.http_status === 200)
    assert(r.http_content_type === "text/html")
    assert(r.warc_body === "<html><body>hello world</body></html>")
    assert(r.declared_len_ok)
    // metadata record lies about its length -> flagged, still parsed
    assert(!rs(2).declared_len_ok)
    assert(rs(2).warc_body === "via: crawler")
    assert(rs(2).http_status === null)
    // request records carry no HTTP *response* status, and a payload
    // that legitimately ENDS in CRLFs (the request's blank line)
    // survives byte-exact so its declared length validates
    assert(rs(0).http_status === null)
    assert(rs(0).warc_body === "GET / HTTP/1.1\r\nHost: h\r\n\r\n")
    assert(rs(0).declared_len_ok)
  }

  test("false split healed: payload containing the version line stays " +
    "one record") {
    val evil = "leading text\r\nWARC/1.0\r\nnot a header block\r\nmore"
    val arc = resp("http://e.com/", s"<p>$evil</p>") +
      resp("http://f.com/", "<p>clean</p>")
    val rs = Warc.parseArchive(arc)
    assert(rs.length === 2)
    assert(rs(0).warc_body === s"<p>$evil</p>")
    assert(rs(0).declared_len_ok)
    assert(rs(1).warc_url === "http://f.com/")
  }

  test("crawl garbage never throws: empty, null, no records, " +
    "truncated header") {
    assert(Warc.parseArchive(null) === Seq.empty)
    assert(Warc.parseArchive("") === Seq.empty)
    assert(Warc.parseArchive("no warc here at all") === Seq.empty)
    val t = Warc.parseArchive("WARC/1.0\r\nWARC-Type: response")
    assert(t.length === 1 && t.head.warc_type === "response")
  }

  test("withWarcRecords: archive-per-row column explodes to typed rows") {
    import spark.implicits._
    val df = Seq(
      (1L, req("http://a/") + resp("http://a/", "<b>A</b>")),
      (2L, resp("http://b/", "<i>B</i>")),
      (3L, "not an archive"),
      (4L, null: String)).toDF("id", "arc")
    val out = Warc.withWarcRecords(df, "arc")
      .select("id", "rec_idx", "warc_type", "warc_url", "warc_body")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.toSeq.sorted === Seq((1L, 0, "request"),
      (1L, 1, "response"), (2L, 0, "response")))
  }

  test("readWarc splittable: forced 512-byte splits reproduce the " +
    "single-split read; boundary false split healed by the carry plan") {
    val dir = java.nio.file.Files.createTempDirectory("warc").toString
    // ~40 records so 512-byte splits cut many boundaries; record 17's
    // payload embeds the delimiter to force a torn record somewhere
    val arc = (0 until 40).map { i =>
      val evil = if (i == 17)
        "X\r\nWARC/1.0\r\nfake continuation bytes\r\nY" else s"body $i"
      resp(s"http://site.com/p$i", s"<html><p>$evil</p></html>")
    }.mkString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a.warc"),
      arc.getBytes("UTF-8"))
    val whole = Warc.readWarc(spark, dir)
      .orderBy("rec_idx")
      .select("rec_idx", "warc_url", "warc_body", "declared_len_ok")
      .collect()
    val split = Warc.readWarc(spark, dir, hadoopConf = Map(
      "mapreduce.input.fileinputformat.split.maxsize" -> "512",
      "mapreduce.input.fileinputformat.split.minsize" -> "512"))
      .orderBy("rec_idx")
      .select("rec_idx", "warc_url", "warc_body", "declared_len_ok")
      .collect()
    assert(whole.length === 40)
    assert(split.length === 40)
    assert(split.map(_.toSeq).toSeq === whole.map(_.toSeq).toSeq)
    assert(whole(17).getString(2).contains("WARC/1.0\r\nfake"))
    assert(whole.forall(_.getBoolean(3)))
  }

  test("readWarc carry bound: an over-cap record spanning many splits " +
    "falls back to a whole-file read, results unchanged") {
    // one record whose payload embeds a false delimiter and then runs
    // for ~4 forced 512-byte splits: its continuation lead exceeds a
    // tiny cap, so the FILE must re-read whole (single task) while a
    // clean sibling file stays on the splittable path
    val bigPayload = "x\r\nWARC/1.0\r\nnot a header " + ("y" * 2200)
    val arc = resp("http://big/", s"<p>$bigPayload</p>") +
      resp("http://after/", "<p>tail</p>")
    val cleanArc = (0 until 6).map(i =>
      resp(s"http://clean/$i", s"<p>c $i</p>")).mkString
    val dir = java.nio.file.Files.createTempDirectory("warccap")
    java.nio.file.Files.write(dir.resolve("big.warc"),
      arc.getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("clean.warc"),
      cleanArc.getBytes("UTF-8"))
    val conf = Map(
      "mapreduce.input.fileinputformat.split.maxsize" -> "512",
      "mapreduce.input.fileinputformat.split.minsize" -> "512")
    def rows(cap: Int) =
      Warc.readWarc(spark, dir.toString, hadoopConf = conf,
        maxCarryChars = cap)
        .select("source_file", "rec_idx", "warc_url", "warc_body",
          "declared_len_ok")
        .collect()
        .map(r => (r.getString(0).split('/').last, r.getLong(1),
          r.getString(2), r.getString(3), r.getBoolean(4)))
        .sortBy(t => (t._1, t._2))
    val capped = rows(64) // forces the fallback for big.warc
    val roomy = rows(1 << 20) // splice path for both files
    assert(capped.toSeq === roomy.toSeq)
    assert(capped.count(_._1 == "big.warc") === 2)
    assert(capped.count(_._1 == "clean.warc") === 6)
    val big = capped.filter(t => t._1 == "big.warc" && t._2 == 0L).head
    assert(big._3 === "http://big/")
    assert(big._4.contains("y" * 2200)) // reassembled across splits
    assert(capped.forall(_._5)) // every Content-Length validates
  }

  private def respBytes(url: String, body: Array[Byte]): Array[Byte] = {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
      .getBytes("ISO-8859-1") ++ body
    (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
      http ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  test("splittable byte-transparent: non-UTF-8 payload bytes survive " +
    "on BOTH the carry-splice path and the over-cap fallback path") {
    val sjis = Array(0x93, 0xFA, 0x96, 0x7B).map(_.toByte) // 日本
    // big.warc: a record whose payload embeds a false delimiter and
    // spans ~4 forced 512-byte splits -> over-cap -> whole-file
    // fallback; its payload carries the SJIS bytes
    val bigBody = "x\r\nWARC/1.0\r\nnot a header ".getBytes("ISO-8859-1") ++
      sjis ++ ("y" * 2200).getBytes("ISO-8859-1")
    val big = respBytes("http://big/", bigBody) ++
      respBytes("http://after/", "<p>tail</p>".getBytes("ISO-8859-1"))
    // clean.warc: several records, SJIS bytes in one payload, no
    // over-cap lead -> carry-splice path under forced splits
    val clean = (0 until 6).map(i => respBytes(s"http://clean/$i",
      ("<p>c ".getBytes("ISO-8859-1") ++ sjis ++
        s" $i</p>".getBytes("ISO-8859-1")))).reduce(_ ++ _)
    val dir = java.nio.file.Files.createTempDirectory("warcbt")
    java.nio.file.Files.write(dir.resolve("big.warc"), big)
    java.nio.file.Files.write(dir.resolve("clean.warc"), clean)
    val conf = Map(
      "mapreduce.input.fileinputformat.split.maxsize" -> "512",
      "mapreduce.input.fileinputformat.split.minsize" -> "512")
    val rows = Warc.readWarc(spark, dir.toString, hadoopConf = conf,
      maxCarryChars = 64, byteTransparent = true)
      .select("source_file", "rec_idx", "warc_url", "warc_body",
        "declared_len_ok")
      .collect()
      .map(r => (r.getString(0).split('/').last, r.getLong(1),
        r.getString(2), r.getString(3), r.getBoolean(4)))
      .sortBy(t => (t._1, t._2))
    assert(rows.count(_._1 == "big.warc") === 2)
    assert(rows.count(_._1 == "clean.warc") === 6)
    // byte fidelity: latin1 round-trip recovers the exact SJIS bytes
    // on the fallback (big) AND splice (clean) paths, and Content-
    // Length validates byte-exactly everywhere
    val bigBody0 = rows.filter(_._1 == "big.warc").head._4
    assert(bigBody0.getBytes("ISO-8859-1").containsSlice(sjis))
    rows.filter(_._1 == "clean.warc").foreach { t =>
      assert(t._4.getBytes("ISO-8859-1").containsSlice(sjis)) }
    assert(rows.forall(_._5))
    // and the transcode kernel recovers the real code points
    assert(graft.llmops.Web.transcode(
      bigBody0.getBytes("ISO-8859-1"), "shift_jis").contains("日本"))
  }

  test("comma-named archive files read as ONE path, never split in two") {
    val dir = java.nio.file.Files.createTempDirectory("warccomma")
    java.nio.file.Files.write(dir.resolve("seg,a.warc"),
      resp("http://plain/", "<p>plain</p>").getBytes("UTF-8"))
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("seg,b.warc.gz")))
    gz.write(resp("http://gzed/", "<p>gz</p>").getBytes("UTF-8"))
    gz.close()
    // the dir front door routes each through its comma-safe reader
    val urls = Warc.readWarcDir(spark, dir.toString)
      .select("warc_url").collect().map(_.getString(0)).sorted
    assert(urls.toSeq === Seq("http://gzed/", "http://plain/"))
    // explicit multi-file form too
    val plainUrls = Warc.readWarcFiles(spark,
      Seq(dir.resolve("seg,a.warc").toString))
      .select("warc_url").collect().map(_.getString(0))
    assert(plainUrls.toSeq === Seq("http://plain/"))
    val gzUrls = Warc.readWarcGzFiles(spark,
      Seq(dir.resolve("seg,b.warc.gz").toString))
      .select("warc_url").collect().map(_.getString(0))
    assert(gzUrls.toSeq === Seq("http://gzed/"))
  }

  test("twin archives (x.warc beside x.warc.gz) read ONCE, gz " +
    "preferred; untwinned plain files still read") {
    val dir = java.nio.file.Files.createTempDirectory("warctwin")
    val arc = resp("http://twin/", "<p>t</p>")
    java.nio.file.Files.write(dir.resolve("x.warc"),
      arc.getBytes("UTF-8"))
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("x.warc.gz")))
    gz.write(arc.getBytes("UTF-8")); gz.close()
    java.nio.file.Files.write(dir.resolve("solo.warc"),
      resp("http://solo/", "<p>s</p>").getBytes("UTF-8"))
    val rows = Warc.readWarcDir(spark, dir.toString)
      .select("warc_url", "source_file").collect()
    // the twin's records appear once (from the gz), not twice
    assert(rows.map(_.getString(0)).sorted.toSeq ===
      Seq("http://solo/", "http://twin/"))
    assert(rows.find(_.getString(0) == "http://twin/").get
      .getString(1).endsWith("x.warc.gz"))
  }

  test("source_file keys are entry-point independent: an unqualified " +
    "path through readWarcGzFiles renders the qualified-dir key") {
    val dir = java.nio.file.Files.createTempDirectory("warckey")
    val f = dir.resolve("k.warc.gz")
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(f))
    gz.write(resp("http://k/", "<p>k</p>").getBytes("UTF-8")); gz.close()
    val viaDir = Warc.readWarcDir(spark, dir.toString)
      .select("source_file").head().getString(0)
    val viaGz = Warc.readWarcGzFiles(spark, Seq(f.toString))
      .select("source_file").head().getString(0)
    // doc_id = xxhash64(source_file, rec_idx) must not depend on which
    // reader entry point opened the file
    assert(viaDir === viaGz)
  }

  test("readWarcDir skips sidecars: .crc checksums, listings, markers " +
    "and hidden files never reach a parser") {
    val dir = java.nio.file.Files.createTempDirectory("warcside")
    java.nio.file.Files.write(dir.resolve("a.warc"),
      resp("http://real/", "<p>r</p>").getBytes("UTF-8"))
    // the sidecars a real crawl/output dir contains
    java.nio.file.Files.write(dir.resolve(".a.warc.wet.gz.crc"),
      Array[Byte](1, 2, 3))
    java.nio.file.Files.write(dir.resolve("_SUCCESS"), Array.empty[Byte])
    java.nio.file.Files.write(dir.resolve("warc.paths"),
      "segments/a.warc\n".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve(".hidden.warc"),
      resp("http://hidden/", "<p>h</p>").getBytes("UTF-8"))
    val urls = Warc.readWarcDir(spark, dir.toString)
      .select("warc_url").collect().map(_.getString(0))
    assert(urls.toSeq === Seq("http://real/"))
  }

  test("byte-transparent read + transcode: Shift_JIS/cp1251 bytes " +
    "survive latin1 decode and recover real text") {
    import graft.llmops.Web
    // "日本" in Shift_JIS — invalid as UTF-8, so the default decode
    // would smash it to U+FFFD and no transcoder could recover it
    val sjis = Array(0x93, 0xFA, 0x96, 0x7B).map(_.toByte)
    val html = "<html><head><meta charset=\"shift_jis\"></head><body>"
      .getBytes("ISO-8859-1") ++ sjis ++
      "</body></html>".getBytes("ISO-8859-1")
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n")
      .getBytes("ISO-8859-1") ++ html
    val arc = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://jp/\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
      http ++ "\r\n\r\n".getBytes("ISO-8859-1")
    // transparent parse: body chars == payload bytes, length validates
    val rs = Warc.parseArchive(
      new String(arc, "ISO-8859-1"), byteTransparent = true)
    assert(rs.length === 1)
    assert(rs.head.declared_len_ok)
    val body = rs.head.warc_body
    assert(body.getBytes("ISO-8859-1").containsSlice(sjis))
    // the default UTF-8 parse destroys the bytes (replacement chars)
    val utf8Body = Warc.parseArchive(new String(arc, "UTF-8")).head
    assert(!utf8Body.warc_body.contains("日本"))
    assert(!utf8Body.declared_len_ok) // replacement changed byte count
    // transcode recovers the real code points
    assert(Web.transcode(body.getBytes("ISO-8859-1"), "shift_jis")
      .contains("日本"))
    // windows-1251, unknown charset fallback, null tolerance
    val cp1251 = Array(0xCF, 0xF0, 0xE8, 0xE2, 0xE5, 0xF2).map(_.toByte)
    assert(Web.transcode(cp1251, "windows-1251") ===
      "Привет")
    assert(Web.transcode("héllo".getBytes("UTF-8"), "no-such-cs")
      === "héllo") // unknown name -> UTF-8
    assert(Web.transcode(null, "utf-8") === "")
    // gz reader round trip in transparent mode
    val dir = java.nio.file.Files.createTempDirectory("warctrans")
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("a.warc.gz")))
    gz.write(arc); gz.close()
    val df = Warc.readWarcGz(spark, dir.toString + "/*.warc.gz",
      byteTransparent = true)
    val out = Web.withTranscodedBody(
      Web.withCharset(df, "http_content_type", "warc_body"),
      "warc_body", "charset").select("text_utf8", "declared_len_ok")
      .collect()
    assert(out.length === 1)
    assert(out(0).getString(0).contains("日本"))
    assert(out(0).getBoolean(1))
  }

  test("streamRecords == parseArchive on adversarial archives " +
    "(seeded sweep, tiny decode buffers)") {
    // every shape that has ever mattered: false splits whose next line
    // IS field-shaped, mixed \n / \r\n terminators, leading garbage,
    // empty chunks (version line immediately followed by another),
    // headerless chunks that run to EOF, truncated final records,
    // payloads ending in blank lines, version line as the last bytes
    val pieces = Vector[String](
      resp("http://a/", "<p>plain</p>"),
      resp("http://b/", "<p>x\r\nWARC/1.0\r\nnot: a real header\r\ny</p>"),
      // false split where the next line LOOKS like a named field but
      // the pseudo-header block has no WARC-Type
      resp("http://c/", "<p>q\r\nWARC/1.0\r\nFake-Field: v\r\n\r\nz</p>"),
      // false split with a field-shaped line and NO blank line after
      // (decision forced only at the next version line)
      resp("http://d/", "<p>r\nWARC/1.1\nAlso-Fake: v\nnever blank</p>"),
      "WARC/1.0\r\n\r\n\r\n", // empty header block
      "WARC/1.0\r\n", // empty chunk (next piece starts a new record)
      "WARC/1.0\nWARC-Type: metadata\nContent-Length: 3\n\nabc\n\n",
      "WARC/1.0\r\nWARC-Type: response", // truncated at EOF
      // lone-\r terminator before a version line: Java MULTILINE '^'
      // fires after a bare \r unless UNIX_LINES is set; the streaming
      // line reader splits at '\n' only, so the two paths MUST agree
      // that this does not open a record
      resp("http://e/", "<p>s\rWARC/1.0\r\nWARC-Type: x\r\n\r\nt</p>"),
      "leading garbage with no version line at all\r\n")
    val rnd = new scala.util.Random(16)
    (0 until 200).foreach { _ =>
      val n = 1 + rnd.nextInt(6)
      val text = Vector.fill(n)(pieces(rnd.nextInt(pieces.length)))
        .mkString
      val batch = Warc.parseArchive(text)
      Seq(1 << 16, 7, 1).foreach { buf =>
        val streamed = Warc.streamRecords(
          new java.io.StringReader(text), bufSize = buf).toVector
        assert(streamed === batch,
          s"divergence at buf=$buf for:\n$text")
      }
    }
    // degenerate inputs
    Seq("", "WARC/1.0\r\n", "no records", "WARC/1.0").foreach { t =>
      assert(Warc.streamRecords(new java.io.StringReader(t)).toVector
        === Warc.parseArchive(t))
    }
  }

  test("readWarcGz streams: one huge member decodes record-by-record " +
    "without materializing the archive") {
    // 4k small records in ONE gzip member: the old readAllBytes path
    // would hold all ~2 MB as one String; here we only assert the
    // streamed output is exactly the batch parse of the same text
    // (the memory bound is by construction: LineReader's 64 KB window
    // + the largest single record)
    val arc = (0 until 4000).map(i =>
      resp(s"http://m/$i", s"<p>body $i</p>")).mkString
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(arc.getBytes("UTF-8")); g.close()
    val dir = java.nio.file.Files.createTempDirectory("warcbig").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "big.warc.gz"), bo.toByteArray)
    val out = Warc.readWarcGz(spark, dir)
    assert(out.count() === 4000L)
    import org.apache.spark.sql.functions._
    val agg = out.agg(
      sum(when(col("declared_len_ok"), 0L).otherwise(1L)),
      min("rec_idx"), max("rec_idx")).head()
    assert(agg.getLong(0) === 0L)
    assert(agg.getLong(1) === 0L && agg.getLong(2) === 3999L)
  }

  test("readWarcGz: concatenated gzip members, parallel across files") {
    val dir = java.nio.file.Files.createTempDirectory("warcgz").toString
    def gz(s: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes("UTF-8")); g.close()
      bo.toByteArray
    }
    // member-per-record concatenation, two files
    val f1 = gz(resp("http://g1/", "<p>one</p>")) ++
      gz(resp("http://g2/", "<p>two</p>"))
    val f2 = gz(resp("http://g3/", "<p>three</p>"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "s1.warc.gz"), f1)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "s2.warc.gz"), f2)
    val out = Warc.readWarcGz(spark, dir)
      .select("warc_url", "warc_body").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted
    assert(out.toSeq === Seq(
      ("http://g1/", "<p>one</p>"), ("http://g2/", "<p>two</p>"),
      ("http://g3/", "<p>three</p>")))
  }

  test("extractMainContent: boilerplate dropped, prose kept, density " +
    "boundary exact") {
    import graft.llmops.Web.extractMainContent
    val prose = "This paragraph has comfortably more than forty " +
      "characters of real prose in it."
    val html = "<html><body>" +
      "<nav><a href='/'>Home page link</a> <a href='/a'>About page " +
      "link here</a> <a href='/c'>Contact support link</a></nav>" +
      s"<p>$prose</p>" +
      "<p>tiny</p>" +
      "<footer>(c) 2024 <a href='/t'>Terms</a></footer>" +
      "</body></html>"
    assert(extractMainContent(html) === prose)
    // two kept blocks join with \n in document order
    assert(extractMainContent(s"<p>$prose</p><div>$prose</div>") ===
      prose + "\n" + prose)
    // density boundary: 3*linkChars <= totalChars keeps, above drops.
    // 60 non-link + 30 link = 90 total, 3*30 == 90 -> kept
    val nonLink = "x" * 60
    val link = "y" * 30
    assert(extractMainContent(s"<p>$nonLink<a>$link</a></p>") ===
      nonLink + " " + link) // the dropped <a> tag becomes one space
    // 59 non-link + 30 link: 3*30 = 90 > 89 -> dropped
    assert(extractMainContent(
      s"<p>${"x" * 59}<a>$link</a></p>") === "")
    // self-closing detection: an UNQUOTED href ending in '/' OPENS an
    // anchor (the slash is the value's last char — 30 link chars at 59
    // non-link drops the block), while a real XML-empty `<a ... />`
    // contributes no link depth (the same 30 chars count as prose and
    // the block survives)
    assert(extractMainContent(
      s"<p>${"x" * 59}<a href=/foo/>${"y" * 30}</a></p>") === "")
    assert(extractMainContent(
      s"<p>${"x" * 59}<a href='/foo'/>${"y" * 30}</a></p>") ===
      "x" * 59 + " " + "y" * 30)
    // script content never leaks into a block; entities decode
    assert(extractMainContent(
      s"<p><script>var no = 'leak';</script>$prose &amp; more</p>") ===
      prose + " & more")
    // comment contents contribute NOTHING: no text (the '>' inside
    // must not truncate the scan), no link chars (dead nav must not
    // skew density), no block boundary
    assert(extractMainContent(
      s"<p>$prose<!-- <a href='/x'>dead > nav</a> --></p>") === prose)
    assert(extractMainContent(
      s"<p><!-- <a>${"y" * 500}</a> -->$prose</p>") === prose)
    assert(extractMainContent(s"<p>$prose<!-- unterminated") === prose)
    assert(extractMainContent(
      s"<p>$prose<![CDATA[ <a>raw]] bytes ]]></p>") === prose)
    // garbage contract
    assert(extractMainContent(null) === "")
    assert(extractMainContent("<p" + "x" * 50) === "")
    assert(extractMainContent("plain text with no tags at all but " +
      "definitely longer than forty characters") ===
      "plain text with no tags at all but definitely longer than " +
        "forty characters")
  }

  test("toWet + writeWet: WARC responses become WET conversion " +
    "records that round-trip through files") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, req("http://a/") + resp("http://a/", "<p>alpha  text</p>")),
      (2L, resp("http://b/", "<b>beta</b> stuff"))).toDF("id", "arc")
    val recs = Warc.withWarcRecords(df, "arc")
    val wet = Warc.toWet(recs,
      graft.llmops.Web.htmlTextUdf(col("warc_body")))
    // requests are filtered out; text extracted; render parses back
    val direct = Warc.withWarcRecords(
      wet.select(col("id"), col("wet_record")), "wet_record")
      .select("id", "warc_type", "warc_url", "warc_refers_to",
        "declared_len_ok", "warc_body")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4), r.getString(5))).sortBy(_._1)
    assert(direct.toSeq === Seq(
      (1L, "conversion", "http://a/", "<urn:uuid:http://a/>", true,
        "alpha text"),
      (2L, "conversion", "http://b/", "<urn:uuid:http://b/>", true,
        "beta stuff")))
    // file round trip, both at-rest formats
    val d1 = java.nio.file.Files.createTempDirectory("wetgz").toString
    val n1 = Warc.writeWet(wet, d1, gzip = true)
    assert(n1 >= 1L)
    val back1 = Warc.readWarcGz(spark, d1)
      .select("warc_type", "warc_url", "warc_body", "declared_len_ok")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getBoolean(3))).sortBy(_._2)
    assert(back1.toSeq === Seq(
      ("conversion", "http://a/", "alpha text", true),
      ("conversion", "http://b/", "beta stuff", true)))
    val d2 = java.nio.file.Files.createTempDirectory("wetplain").toString
    Warc.writeWet(wet, d2, gzip = false)
    val back2 = Warc.readWarc(spark, d2)
      .select("warc_url", "warc_body").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(back2.toSeq === Seq(("http://a/", "alpha text"),
      ("http://b/", "beta stuff")))
  }

  test("crawl front-end composition: warc -> response filter -> html " +
    "text -> url canon") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L,
      req("http://a.com/x?utm_source=t&q=1") +
        resp("HTTP://WWW.A.com:80/x/?utm_source=t&q=1",
          "<html><script>var x=1;</script><body>Real &amp; prose" +
            "</body></html>"))).toDF("id", "arc")
    val out = Warc.withWarcRecords(df, "arc")
      .where(col("warc_type") === "response" && col("http_status") === 200)
      .select(graft.llmops.Web.urlCanonCol(col("warc_url")).as("url"),
        graft.llmops.Web.htmlTextUdf(col("warc_body")).as("text"))
      .collect()
    assert(out.length === 1)
    assert(out(0).getString(0) === "http://a.com/x?q=1")
    assert(out(0).getString(1) === "Real & prose")
  }
}

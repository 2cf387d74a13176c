package graft

import graft.app.PipelineApp

/** One-command pipeline composition: manifest-gated two-level resume,
  * kill-between-stages and kill-mid-stage recovery with artifact reuse,
  * and parameter-change invalidation.
  */
class PipelineAppSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def cfg(out: String) = PipelineApp.parse(Array(
    s"$sf/documents.parquet", out, "--min-quality=0.2", "--rate=0.9"))

  private def mtime(p: String): Long = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(p))
      .iterator().asScala
      .map(f => java.nio.file.Files.getLastModifiedTime(f).toMillis)
      .max
  }

  private def rows(p: String): Seq[String] =
    spark.read.parquet(p).collect().map(_.toString).sorted.toSeq

  test("full run: both stages land, manifest records them, curate " +
    "consumed the dedup survivors") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_pipe").toString
    val report = PipelineApp.run(spark, cfg(out)).toMap
    for (a <- Seq("dedup/pairs", "dedup/clusters", "dedup/survivors",
        "curate/scored", "curate/kept", "curate/shards"))
      assert(graft.core.StageIo.committed(spark, s"$out/$a"), a)
    val m = PipelineApp.readManifest(out)
    assert(m.keySet === Set("dedup", "curate"))
    // curate's corpus IS the survivor set
    val survivors = spark.read.parquet(s"$out/dedup/survivors").count()
    assert(report("curate_n_docs") === survivors)
    assert(report("dedup_n_docs") ===
      spark.read.parquet(s"$sf/documents.parquet").count())
    assert(report("curate_n_shards") > 0)
  }

  test("--warc front door: crawl dir -> ingest stage -> dedup -> " +
    "curate in one run; robots filter applies; resume skips decode") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 40 responses across two files (one gz), two domains; blocked.com
    // is robots-disallowed; one page 404s; duplicate texts dedup
    def rec(i: Int, host: String, status: Int = 200): String = {
      val text = s"Paragraph number ${i % 7} with plenty of prose " +
        "to clear the main-content minimum length threshold easily."
      val html = s"<html><body><nav><a href='/x'>navlinkfarm</a></nav>" +
        s"<p>$text</p></body></html>"
      val http = s"HTTP/1.1 $status OK\r\nContent-Type: text/html\r\n\r\n$html"
      s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: https://$host/p/$i\r\n" +
        s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n" +
        http + "\r\n\r\n"
    }
    val dir = java.nio.file.Files.createTempDirectory("pipe_warc")
    val a = (0 until 20).map(i => rec(i, "ok.com")).mkString
    val b = (20 until 38).map(i => rec(i, "blocked.com")).mkString +
      rec(38, "ok.com") + rec(39, "ok.com", status = 404)
    java.nio.file.Files.write(dir.resolve("a.warc"), a.getBytes("UTF-8"))
    // the gz shard NESTS (segments/<id>/warc/..., the Common Crawl
    // layout) — readWarcDir must list recursively
    val nested = java.nio.file.Files.createDirectories(
      dir.resolve("segments").resolve("s0").resolve("warc"))
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(nested.resolve("b.warc.gz")))
    gz.write(b.getBytes("UTF-8")); gz.close()
    val polDir = java.nio.file.Files.createTempDirectory("pipe_pol")
    Seq(("blocked.com", "User-agent: *\nDisallow: /\n"))
      .toDF("domain", "robots_txt")
      .write.mode("overwrite").parquet(s"$polDir/pol")
    val out = java.nio.file.Files
      .createTempDirectory("pipe_warc_out").toString
    val c = PipelineApp.parse(Array("-", out, s"--warc=$dir",
      s"--robots=$polDir/pol", "--frontier", "--min-quality=0.0",
      "--rate=1.0"))
    val report = PipelineApp.run(spark, c).toMap
    // 20 + 1 ok.com pages survive: blocked.com robots-filtered, the
    // 404 status-filtered
    assert(report("ingest_docs") === 21L)
    assert(PipelineApp.readManifest(out).keySet ===
      Set("ingest", "dedup", "curate"))
    val docs = spark.read.parquet(s"$out/ingest/docs")
    assert(docs.columns.sorted.toSeq ===
      Seq("doc_id", "domain", "n_chars", "text", "url"))
    assert(docs.where(col("domain") === "blocked.com").count() === 0)
    // main-content extraction dropped the nav link farm
    assert(!docs.select("text").as[String].head().contains("navlinkfarm"))
    // dedup consumed the ingest docs (7 distinct texts among 21 pages)
    assert(report("dedup_n_docs") === 21L)
    assert(report("dedup_n_removed") === 14L) // 21 pages, 7 texts
    // --frontier: the next round's fetch schedule — the one outlink
    // (/x on ok.com, never fetched) lands with every page's reference,
    // slot 0 at the default delay; blocked.com's links never appear
    // because its pages were politeness-filtered upstream
    val frontier = spark.read.parquet(s"$out/ingest/frontier").collect()
    assert(frontier.length === 1)
    val fr = frontier.head
    assert(fr.getAs[String]("url") === "https://ok.com/x")
    assert(fr.getAs[Long]("n_refs") === 21L)
    assert(fr.getAs[Long]("robots_delay_ms") === 1000L)
    assert(fr.getAs[Long]("fetch_slot") === 0L)
    // resume: ingest stage skips wholesale (docs untouched)
    val t0 = mtime(s"$out/ingest/docs")
    PipelineApp.run(spark, c.copy(resume = true))
    assert(mtime(s"$out/ingest/docs") === t0)
    // --psl: the registered-domain key follows the rule table (ok.com
    // unchanged, but a github.io-style private registry would split);
    // also proves the ingest identity string invalidates on the flag
    val out2 = java.nio.file.Files
      .createTempDirectory("pipe_warc_psl").toString
    val pslFile = dir.resolve("psl.dat")
    java.nio.file.Files.write(pslFile,
      "// test psl\ncom\nok.com\n".getBytes("UTF-8"))
    val c2 = PipelineApp.parse(Array("-", out2, s"--warc=$dir",
      s"--psl=$pslFile", "--min-quality=0.0", "--rate=1.0"))
    PipelineApp.run(spark, c2)
    val domains2 = spark.read.parquet(s"$out2/ingest/docs")
      .select("domain").distinct().as[String].collect().toSet
    // rule 'ok.com' makes ok.com itself a public suffix (no
    // registrable part -> null domain), while blocked.com registers
    // under the plain 'com' rule — the heuristic would have said
    // 'ok.com' for both shapes
    assert(domains2 === Set(null: String, "blocked.com"))
  }

  test("--warc front door transcodes by default: a Shift_JIS page's " +
    "real code points reach ingest/docs; --transcode=off ships mojibake") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def recBytes(url: String, html: Array[Byte],
        ctype: String = "text/html"): Array[Byte] = {
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n\r\n")
        .getBytes("ISO-8859-1") ++ html
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: $url\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n")
        .getBytes("ISO-8859-1") ++ http ++
        "\r\n\r\n".getBytes("ISO-8859-1")
    }
    val prose = "Plenty of plain prose so the page body clears any " +
      "length threshold with room to spare. "
    // Shift_JIS page declared via <meta charset>
    val sjHtml = ("<html><head><meta charset=\"shift_jis\"></head>" +
      s"<body><p>$prose").getBytes("ISO-8859-1") ++
      "日本語のテキスト".getBytes("Shift_JIS") ++
      "</p></body></html>".getBytes("ISO-8859-1")
    // windows-1251 page declared via the HTTP Content-Type header
    val cpHtml = (s"<html><body><p>$prose").getBytes("ISO-8859-1") ++
      "Привет мир".getBytes("windows-1251") ++
      "</p></body></html>".getBytes("ISO-8859-1")
    // plain UTF-8 page, no declaration — must round-trip untouched
    val utfHtml = (s"<html><body><p>$prose utf-8 café naïve" +
      "</p></body></html>").getBytes("UTF-8")
    val dir = java.nio.file.Files.createTempDirectory("pipe_tc")
    java.nio.file.Files.write(dir.resolve("a.warc"),
      recBytes("https://jp.example/p", sjHtml) ++
        recBytes("https://ru.example/p", cpHtml,
          ctype = "text/html; charset=windows-1251") ++
        recBytes("https://en.example/p", utfHtml))
    def texts(out: String, extra: String*): Map[String, String] = {
      val c = PipelineApp.parse(Array("-", out, s"--warc=$dir",
        "--warc-text=all", "--min-quality=0.0", "--rate=1.0") ++ extra)
      PipelineApp.run(spark, c)
      spark.read.parquet(s"$out/ingest/docs")
        .select("url", "text").as[(String, String)].collect().toMap
    }
    val on = texts(java.nio.file.Files
      .createTempDirectory("pipe_tc_on").toString)
    assert(on("https://jp.example/p").contains("日本語のテキスト"))
    assert(on("https://ru.example/p").contains("Привет мир"))
    assert(on("https://en.example/p").contains("café naïve"))
    val off = texts(java.nio.file.Files
      .createTempDirectory("pipe_tc_off").toString, "--transcode=off")
    // UTF-8-with-replacement decode destroyed the non-UTF-8 pages
    assert(!off("https://jp.example/p").contains("日本語のテキスト"))
    assert(!off("https://ru.example/p").contains("Привет"))
    assert(off("https://en.example/p").contains("café naïve"))
  }

  test("crawler loop closes across two rounds: round 2 fetches " +
    "round 1's frontier in schedule order, and --crawled= keeps " +
    "round-1 urls out of round 2's frontier") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val prose = "Plenty of plain prose here so the extracted body " +
      "text clears the main-content length threshold comfortably. "
    def rec(url: String, hrefs: Seq[String]): String = {
      val html = s"<html><body>" +
        hrefs.map(h => s"""<a href="$h">x</a> """).mkString +
        s"<p>$prose</p></body></html>"
      val http =
        s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$html"
      s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: $url\r\n" +
        s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n" +
        http + "\r\n\r\n"
    }
    // ---- round 1: 4 pages on a.com; /n/1 referenced by 3 pages,
    // /n/2 by 2, /n/3 by 1; internal links (/p/*) are all crawled ----
    val segA = java.nio.file.Files.createTempDirectory("loop_a")
    java.nio.file.Files.write(segA.resolve("a.warc"), (
      rec("https://a.com/p/0", Seq("/n/1", "/n/2", "/p/1")) +
        rec("https://a.com/p/1", Seq("/n/1", "/n/2", "/p/2")) +
        rec("https://a.com/p/2", Seq("/n/1", "/n/3", "/p/0")) +
        rec("https://a.com/p/3", Seq("/p/0"))).getBytes("UTF-8"))
    val out1 = java.nio.file.Files
      .createTempDirectory("loop_out1").toString
    PipelineApp.run(spark, PipelineApp.parse(Array("-", out1,
      s"--warc=$segA", "--frontier", "--min-quality=0.0", "--rate=1.0")))
    val f1 = spark.read.parquet(s"$out1/ingest/frontier")
      .orderBy("fetch_slot")
      .select("url", "n_refs", "fetch_slot", "fetch_time_ms")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // anti-join: no crawled url appears; schedule order follows
    // n_refs desc; fetch times are slot x default delay
    assert(f1.map(_._1).toSeq === Seq("https://a.com/n/1",
      "https://a.com/n/2", "https://a.com/n/3"))
    assert(f1.map(_._2).toSeq === Seq(3L, 2L, 1L))
    assert(f1.map(_._4).toSeq === Seq(0L, 1000L, 2000L))
    // ---- round 2: the fetcher honors the schedule — segment B is
    // round 1's frontier IN fetch_time ORDER; fetched pages link
    // back to round-1 urls AND to brand-new /m/* urls ----
    val segB = java.nio.file.Files.createTempDirectory("loop_b")
    val fetchList = f1.sortBy(_._4).map(_._1) // fetch_time order
    java.nio.file.Files.write(segB.resolve("b.warc"),
      fetchList.zipWithIndex.map { case (u, i) =>
        rec(u, Seq("/p/0", "/p/1", s"/m/$i", "/m/9"))
      }.mkString.getBytes("UTF-8"))
    val out2 = java.nio.file.Files
      .createTempDirectory("loop_out2").toString
    PipelineApp.run(spark, PipelineApp.parse(Array("-", out2,
      s"--warc=$segB", "--frontier", s"--crawled=$out1/ingest/docs",
      "--min-quality=0.0", "--rate=1.0")))
    val f2 = spark.read.parquet(s"$out2/ingest/frontier")
      .select("url", "n_refs").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // round-1 urls (/p/*) are excluded via --crawled even though
    // round 2 never fetched them; round 2's own fetches (/n/*)
    // excluded by the in-run anti-join; only the new /m/* remain
    assert(f2.keySet === Set("https://a.com/m/0", "https://a.com/m/1",
      "https://a.com/m/2", "https://a.com/m/9"))
    assert(f2("https://a.com/m/9") === 3L) // referenced by all three
    // without --crawled, round-1 urls WOULD re-enter the frontier —
    // the flag is what closes the loop
    val out3 = java.nio.file.Files
      .createTempDirectory("loop_out3").toString
    PipelineApp.run(spark, PipelineApp.parse(Array("-", out3,
      s"--warc=$segB", "--frontier", "--min-quality=0.0",
      "--rate=1.0")))
    val f3 = spark.read.parquet(s"$out3/ingest/frontier")
      .select("url").as[String].collect().toSet
    assert(f3.contains("https://a.com/p/0"))
  }

  test("--robots-warc derives the policy table from fetched " +
    "robots.txt (latest wins) and sitemap pages seed the frontier " +
    "with lastmod recency ranking") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val prose = "Plenty of plain prose here so the extracted body " +
      "text clears the main-content length threshold comfortably. "
    def recRaw(url: String, body: String, ctype: String,
        date: String): String = {
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n\r\n$body"
      s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: $url\r\nWARC-Date: $date\r\n" +
        s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n" +
        http + "\r\n\r\n"
    }
    def page(url: String, hrefs: Seq[String]): String =
      recRaw(url, "<html><body>" +
        hrefs.map(h => s"""<a href="$h">x</a> """).mkString +
        s"<p>$prose</p></body></html>", "text/html",
        "2024-01-01T00:00:00Z")
    // robots segment (the Common Crawl robotstxt/ layout): TWO
    // fetches of blocked.com's robots.txt — the older allows
    // everything, the newer disallows all; latest must win
    val robotsDir = java.nio.file.Files.createTempDirectory("rw_rob")
    java.nio.file.Files.write(robotsDir.resolve("r.warc"), (
      recRaw("https://blocked.com/robots.txt", "User-agent: *\nAllow: /\n",
        "text/plain", "2024-01-01T00:00:00Z") +
        recRaw("https://blocked.com/robots.txt",
          "User-agent: *\nDisallow: /\n",
          "text/plain", "2024-02-01T00:00:00Z") +
        recRaw("https://ok.com/robots.txt",
          "User-agent: *\nCrawl-delay: 2\n",
          "text/plain", "2024-01-01T00:00:00Z")).getBytes("UTF-8"))
    // crawl segment: ok.com pages (one links /f/1), one blocked.com
    // page (must be politeness-filtered by the DERIVED policy), and
    // ok.com's sitemap with dated + undated seeds
    val segDir = java.nio.file.Files.createTempDirectory("rw_seg")
    val sitemap = """<?xml version="1.0"?><urlset>
      <url><loc>https://ok.com/s/fresh</loc>
        <lastmod>2024-03-02</lastmod></url>
      <url><loc>https://ok.com/s/stale</loc>
        <lastmod>2024-01-02</lastmod></url>
      <url><loc>https://ok.com/p/0</loc>
        <lastmod>2024-03-05</lastmod></url>
      </urlset>"""
    java.nio.file.Files.write(segDir.resolve("s.warc"), (
      page("https://ok.com/p/0", Seq("/f/1", "/f/1")) +
        page("https://ok.com/p/1", Seq("/f/1")) +
        page("https://blocked.com/p/9", Seq("/x/1")) +
        recRaw("https://ok.com/sitemap.xml", sitemap,
          "application/xml", "2024-01-01T00:00:00Z"))
      .getBytes("UTF-8"))
    val out = java.nio.file.Files
      .createTempDirectory("rw_out").toString
    PipelineApp.run(spark, PipelineApp.parse(Array("-", out,
      s"--warc=$segDir", s"--robots-warc=$robotsDir", "--frontier",
      "--min-quality=0.0", "--rate=1.0")))
    val docs = spark.read.parquet(s"$out/ingest/docs")
    // latest robots fetch wins: blocked.com page filtered out;
    // the sitemap XML itself never becomes a corpus doc
    assert(docs.where(col("domain") === "blocked.com").count() === 0)
    assert(docs.where(col("url").endsWith("sitemap.xml")).count() === 0)
    assert(docs.count() === 2L)
    val fr = spark.read.parquet(s"$out/ingest/frontier")
      .orderBy("fetch_slot")
      .select("url", "lastmod", "n_refs", "robots_delay_ms",
        "fetch_slot").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // ok.com/p/0 was CRAWLED: its sitemap entry must not re-enter;
    // blocked.com's outlink /x/1 never appears (page filtered
    // upstream); recency ranks fresh (03-02) over stale (01-02) over
    // the undated-but-popular link target /f/1; the crawl-derived
    // Crawl-delay (2 s) prices the slots
    assert(fr.map(_._1).toSeq === Seq("https://ok.com/s/fresh",
      "https://ok.com/s/stale", "https://ok.com/f/1"))
    assert(fr.map(_._2).toSeq === Seq("2024-03-02", "2024-01-02", null))
    assert(fr.map(_._3).toSeq === Seq(1L, 1L, 3L))
    assert(fr.forall(_._4 == 2000L))
    assert(fr.map(_._5).toSeq === Seq(0L, 1L, 2L))
  }

  test("--robots-warc applies RFC 9309 status semantics: newest 5xx " +
    "blocks the domain, 3xx follows Location, 4xx allows; an HTML " +
    "page mentioning '<urlset' stays a corpus doc; --frontier " +
    "advisory mentions the transient pages/ scratch") {
    import org.apache.spark.sql.functions._
    val prose = "Plenty of plain prose here so the extracted body " +
      "text clears the main-content length threshold comfortably. "
    def rec(url: String, body: String, ctype: String, date: String,
        status: Int = 200, location: Option[String] = None): String = {
      val loc = location.map(l => s"Location: $l\r\n").getOrElse("")
      val http = s"HTTP/1.1 $status X\r\nContent-Type: $ctype\r\n" +
        loc + s"\r\n$body"
      s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: $url\r\nWARC-Date: $date\r\n" +
        s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n" +
        http + "\r\n\r\n"
    }
    def page(url: String, extra: String = ""): String =
      rec(url, s"<html><body><p>$prose$extra</p></body></html>",
        "text/html", "2024-01-01T00:00:00Z")
    val robotsDir = java.nio.file.Files.createTempDirectory("rfc_rob")
    java.nio.file.Files.write(robotsDir.resolve("r.warc"), (
      // err.com: old 200 allow-all, NEWER 503 — complete disallow wins
      rec("https://err.com/robots.txt", "User-agent: *\nAllow: /\n",
        "text/plain", "2024-01-01T00:00:00Z") +
        rec("https://err.com/robots.txt", "oops", "text/plain",
          "2024-02-01T00:00:00Z", status = 503) +
        // redir.com: 301 to a fetched target whose policy blocks /q
        rec("https://redir.com/robots.txt", "", "text/plain",
          "2024-01-01T00:00:00Z", status = 301,
          location = Some("https://redir.com/real.txt")) +
        rec("https://redir.com/real.txt", "User-agent: *\nDisallow: /q\n",
          "text/plain", "2024-01-01T00:00:00Z") +
        // gone.com: 404 — unavailable = allow-all
        rec("https://gone.com/robots.txt", "nope", "text/plain",
          "2024-01-01T00:00:00Z", status = 404))
      .getBytes("UTF-8"))
    val segDir = java.nio.file.Files.createTempDirectory("rfc_seg")
    java.nio.file.Files.write(segDir.resolve("s.warc"), (
      page("https://err.com/p/1") +
        page("https://redir.com/p/1") +
        page("https://redir.com/q/1") +
        page("https://gone.com/p/1") +
        // mentions the sitemap root tag mid-document: must remain a
        // corpus doc, not be sniffed as a sitemap and dropped
        page("https://gone.com/docs/sitemaps",
          "Example: a sitemap begins with &lt;?xml and &lt;urlset " +
            "— the literal string <urlset> appears here in prose."))
      .getBytes("UTF-8"))
    val out = java.nio.file.Files
      .createTempDirectory("rfc_out").toString
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      PipelineApp.run(spark, PipelineApp.parse(Array("-", out,
        s"--warc=$segDir", s"--robots-warc=$robotsDir", "--frontier",
        "--min-quality=0.0", "--rate=1.0")))
    }
    val docs = spark.read.parquet(s"$out/ingest/docs")
    val urls = docs.select("url").collect().map(_.getString(0)).toSet
    assert(!urls.exists(_.startsWith("https://err.com/")),
      "newest 503 robots fetch must block the whole domain")
    assert(urls.contains("https://redir.com/p/1"))
    assert(!urls.contains("https://redir.com/q/1"),
      "redirect target's Disallow /q must govern redir.com")
    assert(urls.contains("https://gone.com/p/1"),
      "404 robots = allow-all")
    assert(urls.contains("https://gone.com/docs/sitemaps"),
      "prose mentioning <urlset is not a sitemap")
    assert(buf.toString("UTF-8").contains("pages/ intermediate"),
      "--frontier advisory must mention the transient disk footprint")
  }

  test("--robots-warc takes comma-separated dirs: a robots redirect " +
    "whose target lives in a SECOND segment dir still resolves") {
    import org.apache.spark.sql.functions._
    val prose = "Plenty of plain prose here so the extracted body " +
      "text clears the main-content length threshold comfortably. "
    def rec(url: String, body: String, ctype: String, date: String,
        status: Int = 200, location: Option[String] = None): String = {
      val loc = location.map(l => s"Location: $l\r\n").getOrElse("")
      val http = s"HTTP/1.1 $status X\r\nContent-Type: $ctype\r\n" +
        loc + s"\r\n$body"
      s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: $url\r\nWARC-Date: $date\r\n" +
        s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n" +
        http + "\r\n\r\n"
    }
    def page(url: String): String =
      rec(url, s"<html><body><p>$prose</p></body></html>",
        "text/html", "2024-01-01T00:00:00Z")
    // dir 1: cdn.com's robots.txt 301s to a policy host fetched in
    // dir 2 (RELATIVE Location — exercises the RFC 9110 resolution
    // through the multi-dir union too)
    val robDir1 = java.nio.file.Files.createTempDirectory("mdir_rob1")
    java.nio.file.Files.write(robDir1.resolve("r1.warc"),
      rec("https://cdn.com/robots.txt", "", "text/plain",
        "2024-01-01T00:00:00Z", status = 301,
        location = Some("/policies/robots.txt")).getBytes("UTF-8"))
    val robDir2 = java.nio.file.Files.createTempDirectory("mdir_rob2")
    java.nio.file.Files.write(robDir2.resolve("r2.warc"),
      rec("https://cdn.com/policies/robots.txt",
        "User-agent: *\nDisallow: /q\n", "text/plain",
        "2024-01-01T00:00:00Z").getBytes("UTF-8"))
    val segDir = java.nio.file.Files.createTempDirectory("mdir_seg")
    java.nio.file.Files.write(segDir.resolve("s.warc"), (
      page("https://cdn.com/p/1") + page("https://cdn.com/q/1"))
      .getBytes("UTF-8"))
    val out = java.nio.file.Files
      .createTempDirectory("mdir_out").toString
    PipelineApp.run(spark, PipelineApp.parse(Array("-", out,
      s"--warc=$segDir", s"--robots-warc=$robDir1,$robDir2",
      "--min-quality=0.0", "--rate=1.0")))
    val urls = spark.read.parquet(s"$out/ingest/docs")
      .select("url").collect().map(_.getString(0)).toSet
    assert(urls.contains("https://cdn.com/p/1"),
      "allowed path must survive the cross-dir-resolved policy")
    assert(!urls.contains("https://cdn.com/q/1"),
      "the second dir's Disallow /q must govern cdn.com")
  }

  test("kill between stages: missing curate stage reruns on --resume; " +
    "dedup artifacts untouched; content identical to a fresh run") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_pipe_kill").toString
    val fresh = java.nio.file.Files
      .createTempDirectory("graft_pipe_ref").toString
    PipelineApp.run(spark, cfg(out))
    PipelineApp.run(spark, cfg(fresh))
    // simulate a kill after dedup committed but before curate finished:
    // drop curate's manifest line + artifacts
    val keep = PipelineApp.readManifest(out)("dedup")
    java.nio.file.Files.deleteIfExists(PipelineApp.manifestPath(out))
    PipelineApp.record(out, "dedup", keep._1, keep._2, s"$out/dedup", "done")
    def rmrf(p: String): Unit = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(root))
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
    }
    rmrf(s"$out/curate")
    Thread.sleep(1100)
    val before = mtime(s"$out/dedup/pairs")
    PipelineApp.run(spark, cfg(out).copy(resume = true))
    assert(mtime(s"$out/dedup/pairs") === before) // dedup stage reused
    assert(PipelineApp.readManifest(out).keySet === Set("dedup", "curate"))
    // rebuilt curate artifacts carry the same content as a fresh run
    assert(rows(s"$out/curate/kept") === rows(s"$fresh/curate/kept"))
    assert(rows(s"$out/curate/shards") === rows(s"$fresh/curate/shards"))
  }

  test("kill mid-stage: an uncommitted sub-artifact reruns, committed " +
    "sub-artifacts of the same stage are reused") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_pipe_mid").toString
    PipelineApp.run(spark, cfg(out))
    // simulate a kill while curate was writing kept/: manifest has no
    // curate line yet, scored/ committed, kept/ partially written
    val keep = PipelineApp.readManifest(out)("dedup")
    val curStarted = PipelineApp.readManifest(out)("curate")
    java.nio.file.Files.deleteIfExists(PipelineApp.manifestPath(out))
    PipelineApp.record(out, "dedup", keep._1, keep._2, s"$out/dedup", "done")
    // the app had recorded curate "started" before the kill
    PipelineApp.record(out, "curate", curStarted._1, curStarted._2,
      s"$out/curate", "started")
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$out/curate/kept/_SUCCESS"))
    val keptBefore = rows(s"$out/curate/kept")
    Thread.sleep(1100)
    val scoredM = mtime(s"$out/curate/scored")
    PipelineApp.run(spark, cfg(out).copy(resume = true))
    assert(mtime(s"$out/curate/scored") === scoredM) // committed: reused
    assert(graft.core.StageIo.committed(spark, s"$out/curate/kept"))
    assert(rows(s"$out/curate/kept") === keptBefore) // deterministic
  }

  test("parse rejects unknown flags and --incremental with a pointer " +
    "to the DedupApp composition (fail-fast, AnnIndexApp protocol)") {
    val ok = PipelineApp.parse(Array("d", "o", "--threshold=0.7",
      "--rate=0.5", "--resume"))
    assert(ok.dedup.threshold === 0.7 && ok.curate.rate === 0.5 && ok.resume)
    val inc = intercept[IllegalArgumentException] {
      PipelineApp.parse(Array("d", "o", "--incremental=/prior/dedup"))
    }
    assert(inc.getMessage.contains("DedupApp --incremental"))
    val typo = intercept[IllegalArgumentException] {
      PipelineApp.parse(Array("d", "o", "--treshold=0.7"))
    }
    assert(typo.getMessage.contains("unknown flag: --treshold=0.7"))
  }

  test("manifest round-trips quotes/backslashes in values and dedupes " +
    "by the parsed stage field, not substring containment") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_pipe_esc").toString
    // a params value that CONTAINS the other stage's key used to evict
    // that stage's line via substring-based dedupe
    val trap = """bench=see "stage":"curate" docs\path"""
    PipelineApp.record(out, "dedup", trap, "in\"put", s"$out/dedup", "done")
    PipelineApp.record(out, "curate", "p2", "i2", s"$out/curate", "done")
    // upserting dedup again must replace ONLY the dedup line
    PipelineApp.record(out, "dedup", trap, "in\"put", s"$out/dedup", "done")
    val m = PipelineApp.readManifest(out)
    assert(m.keySet === Set("dedup", "curate"))
    assert(m("dedup") === ((trap, "in\"put", "done")))
    assert(m("curate") === (("p2", "i2", "done")))
    // two lines on disk, both valid
    assert(java.nio.file.Files.readAllLines(
      PipelineApp.manifestPath(out)).size() === 2)
  }

  test("chained snapshots: full pipeline run N, then DedupApp " +
    "--incremental=<runN>/dedup for snapshot N+1, curate over the " +
    "updated survivors — monotone end-to-end") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val runN = java.nio.file.Files
      .createTempDirectory("graft_pipe_chainN").toString
    PipelineApp.run(spark, cfg(runN))
    val priorIds = spark.read.parquet(s"$runN/dedup/survivors")
      .select("doc_id").as[Long].collect().toSet

    // snapshot N+1: an exact copy of a retained doc + a novel doc
    val keepOne = spark.read.parquet(s"$runN/dedup/survivors")
      .orderBy("doc_id").limit(1).select("text").head().getString(0)
    val snapshot = Seq(
      (8000001L, keepOne, "en", "web"),
      (8000002L, "a chained-snapshot novel document with enough unique " +
        "shingles to stand on its own in the retained corpus", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val snapPath = java.nio.file.Files
      .createTempDirectory("graft_pipe_chain_snap").toString + "/docs"
    snapshot.write.parquet(snapPath)

    // incremental dedup points at the PIPELINE's dedup stage dir
    val incOut = java.nio.file.Files
      .createTempDirectory("graft_pipe_chain_inc").toString
    val report = graft.app.DedupApp.run(spark, graft.app.DedupApp.Config(
      snapPath, incOut, incremental = Some(s"$runN/dedup"))).toMap
    assert(report("n_dup_exact") === 1L && report("n_added") === 1L)
    val updated = spark.read.parquet(s"$incOut/survivors")
      .select("doc_id").as[Long].collect().toSet
    assert(updated === priorIds + 8000002L) // monotone: nothing undone

    // curate consumes the UPDATED survivors — the composition the
    // PipelineApp error message points at
    val curOut = java.nio.file.Files
      .createTempDirectory("graft_pipe_chain_cur").toString
    val curReport = graft.app.CurateApp.run(spark, graft.app.CurateApp
      .parse(Array(s"$incOut/survivors", curOut, "--min-quality=0.2",
        "--rate=0.9"))).toMap
    assert(curReport("n_docs") === updated.size.toLong)
    assert(graft.core.StageIo.committed(spark, s"$curOut/shards"))
  }

  test("parameter change invalidates the manifest entry: dedup reruns " +
    "and downstream curate reruns too (input identity)") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_pipe_par").toString
    val base = cfg(out)
    PipelineApp.run(spark, base)
    Thread.sleep(1100)
    val pairsM = mtime(s"$out/dedup/pairs")
    val keptM = mtime(s"$out/curate/kept")
    // same resume call, different dedup threshold -> both stages rerun
    val changed = base.copy(resume = true,
      dedup = base.dedup.copy(threshold = 0.7))
    PipelineApp.run(spark, changed)
    assert(mtime(s"$out/dedup/pairs") > pairsM)
    assert(mtime(s"$out/curate/kept") > keptM)
    // and a second resume with the SAME changed params now skips both
    Thread.sleep(1100)
    val pairs2 = mtime(s"$out/dedup/pairs")
    PipelineApp.run(spark, changed)
    assert(mtime(s"$out/dedup/pairs") === pairs2)
  }
}

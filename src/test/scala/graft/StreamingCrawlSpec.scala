package graft

import graft.llmops.Warc
import org.apache.spark.sql.streaming.Trigger

/** Streaming crawl ingestion: segments arrive over time; the
  * checkpointed file source must drain each exactly once, mixed
  * at-rest formats and false splits included.
  */
class StreamingCrawlSpec extends SparkSpec {

  private def resp(url: String, html: String): String = {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n" +
      http + "\r\n\r\n"
  }

  private def gz(s: String): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(s.getBytes("UTF-8")); g.close()
    bo.toByteArray
  }

  test("AvailableNow drains present segments exactly once; a re-run " +
    "picks up only new arrivals") {
    val in = java.nio.file.Files.createTempDirectory("crawl_in").toString
    val out = java.nio.file.Files.createTempDirectory("crawl_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("crawl_ck").toString
    // mixed formats in one drop: gz members + plain, with a false
    // split inside one payload
    java.nio.file.Files.write(
      java.nio.file.Paths.get(in, "seg1.warc.gz"),
      gz(resp("http://s1/a", "<p>one</p>")) ++
        gz(resp("http://s1/b",
          "<p>x\r\nWARC/1.0\r\nnot a header\r\ny</p>")))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(in, "seg2.warc"),
      resp("http://s2/a", "<p>two</p>").getBytes("UTF-8"))

    def drain(): Unit = {
      val q = Warc.readWarcStream(spark, in).writeStream
        .format("parquet")
        .option("path", s"$out/records")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    val r1 = spark.read.parquet(s"$out/records")
    assert(r1.count() === 3L)
    import org.apache.spark.sql.functions._
    assert(r1.where(!col("declared_len_ok")).count() === 0L)
    val evil = r1.where(col("warc_url") === "http://s1/b")
      .select("warc_body").head().getString(0)
    assert(evil.contains("WARC/1.0\r\nnot a header"))

    // second arrival: only the new segment is read (exactly-once)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(in, "seg3.warc.gz"),
      gz(resp("http://s3/a", "<p>three</p>")))
    drain()
    val r2 = spark.read.parquet(s"$out/records")
    assert(r2.count() === 4L)
    assert(r2.where(col("warc_url") === "http://s1/a").count() === 1L)
    assert(r2.where(col("warc_url") === "http://s3/a").count() === 1L)
    // urls distinct across the whole table: nothing drained twice
    assert(r2.select("warc_url").distinct().count() === 4L)
  }

  test("the crawl DAG runs IN STREAMING mode: url parts -> robots " +
    "filter -> extraction -> WET render are all map-side, so the " +
    "whole front end composes on the stream") {
    import org.apache.spark.sql.functions._
    val in = java.nio.file.Files.createTempDirectory("crawl2_in").toString
    val out = java.nio.file.Files.createTempDirectory("crawl2_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("crawl2_ck").toString
    val prose = "Streaming prose long enough to clear the jusText " +
      "length rule comfortably, forty plus characters."
    java.nio.file.Files.write(
      java.nio.file.Paths.get(in, "seg.warc.gz"),
      gz(resp("https://h.com/keep/1", s"<p>$prose</p>") +
        resp("https://h.com/private/2", s"<p>$prose</p>")))
    val policy = "User-agent: *\nDisallow: /private/\n"
    val stream = {
      val recs = Warc.readWarcStream(spark, in)
        .where(col("warc_type") === "response")
      val parts = graft.llmops.Web.withUrlParts(recs, "warc_url")
      val polite = graft.llmops.Web.withRobotsAllowed(parts,
        "url_path", policy, "bot").where(col("robots_allowed"))
      Warc.toWet(polite,
        graft.llmops.Web.mainContentUdf(col("warc_body")))
    }
    val q = stream.writeStream.format("parquet")
      .option("path", s"$out/wet")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val res = spark.read.parquet(s"$out/wet")
      .select("warc_url", "wet_text", "wet_record").collect()
    assert(res.length === 1) // the impolite fetch never reaches WET
    assert(res(0).getString(0) === "https://h.com/keep/1")
    assert(res(0).getString(1) === prose)
    // the rendered WET record re-parses byte-exactly even when built
    // inside a micro-batch
    val back = Warc.parseArchive(res(0).getString(2))
    assert(back.length === 1 && back.head.declared_len_ok)
    assert(back.head.warc_body === prose)
  }

  test("byte-transparent STREAMING read: Shift_JIS payload bytes " +
    "survive the micro-batch and transcode to real text") {
    import org.apache.spark.sql.functions._
    val in = java.nio.file.Files.createTempDirectory("crawl3_in").toString
    val out = java.nio.file.Files.createTempDirectory("crawl3_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("crawl3_ck").toString
    // "日本" in Shift_JIS inside a meta-labeled page — built at the
    // BYTE level (the string-template resp() would mangle it)
    val sjis = Array(0x93, 0xFA, 0x96, 0x7B).map(_.toByte)
    val html = "<html><head><meta charset=\"shift_jis\"></head><body>"
      .getBytes("ISO-8859-1") ++ sjis ++
      "</body></html>".getBytes("ISO-8859-1")
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
      .getBytes("ISO-8859-1") ++ html
    val arc = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://jp/\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
      http ++ "\r\n\r\n".getBytes("ISO-8859-1")
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(arc); g.close()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(in, "jp.warc.gz"), bo.toByteArray)
    val stream = graft.llmops.Web.withTranscodedBody(
      graft.llmops.Web.withCharset(
        Warc.readWarcStream(spark, in, byteTransparent = true),
        "http_content_type", "warc_body"),
      "warc_body", "charset")
      .select("warc_url", "charset", "text_utf8", "declared_len_ok")
    val q = stream.writeStream.format("parquet")
      .option("path", s"$out/t")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val res = spark.read.parquet(s"$out/t").collect()
    assert(res.length === 1)
    assert(res(0).getString(1) === "shift_jis")
    assert(res(0).getString(2).contains("日本"))
    assert(res(0).getBoolean(3)) // byte-count Content-Length validates
  }
}

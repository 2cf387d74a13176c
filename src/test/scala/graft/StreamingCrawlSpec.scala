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
}

package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingStats

/** Watermark + event-time window semantics: a window emits once (Append
  * mode) after the watermark passes its end; rows later than the
  * watermark for a CLOSED window are dropped, not double-counted.
  */
class StreamingStatsSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts close on watermark; late rows for closed windows drop") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val in = mem.toDF().toDF("ts_sec", "key")
      .withColumn("ts", col("ts_sec").cast("timestamp"))
    val q = StreamingStats.windowedCounts(in, "ts", "key",
      windowDur = "10 seconds", watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Append()).start()
    try {
      // window [0,10): two 'a' rows. Watermark after this batch: 2-5 -> 0.
      mem.addData((1L, "a"), (2L, "a"))
      q.processAllAvailable()
      assert(spark.table("wc").isEmpty) // [0,10) still open
      // event at 20 pushes the watermark to 15: [0,10) closes and emits.
      mem.addData((20L, "b"))
      q.processAllAvailable()
      // one more batch so the updated watermark takes effect in append
      mem.addData((21L, "b"))
      q.processAllAvailable()
      val closed = spark.table("wc")
        .select("key", "n").as[(String, Long)].collect().toSet
      assert(closed == Set(("a", 2L)))
      // a latecomer for the CLOSED [0,10) window: dropped, no re-emit.
      mem.addData((3L, "a"))
      q.processAllAvailable()
      // push the watermark past [20,30) so the 'b' window closes too.
      mem.addData((40L, "c"))
      q.processAllAvailable()
      mem.addData((41L, "c"))
      q.processAllAvailable()
      val all = spark.table("wc")
        .select("key", "n").as[(String, Long)].collect().toList.sorted
      // 'a' stayed 2 (late row dropped), 'b' window emitted exactly once.
      assert(all == List(("a", 2L), ("b", 2L)))
    } finally q.stop()
  }
}

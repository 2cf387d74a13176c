package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, Sessionize}

/** Sessionize + AsofJoin semantics: gap boundaries, tie rules, strict
  * mode, no-match nulls. These are the operators the q22/q23 gate queries
  * exercise at scale.
  */
class SessionOpsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize: diff > gap splits, diff <= gap merges") {
    // user 1, gap 100: ts 0,99,199 all merge (diffs 99 and exactly 100 —
    // Spark extends at ==gap), then 300 splits (diff 101). user 2: single.
    val e = Seq((1L, 0L, 1.0), (1L, 99L, 2.0), (1L, 199L, 4.0),
      (1L, 300L, 16.0), (2L, 5L, 8.0)).toDF("user_id", "ts_us", "value")
    val out = Sessionize.sessions(e, "user_id", "ts_us", gapUs = 100L,
      aggs = Seq(sum(col("value").cast("long")).as("v")))
      .orderBy("user_id", "session_start_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 0L, 199L, 3L, 7L),
      (1L, 300L, 300L, 1L, 16L),
      (2L, 5L, 5L, 1L, 8L)))
  }

  test("sessionize: no extra aggs -> 4-column summary") {
    val e = Seq((1L, 10L), (1L, 20L)).toDF("user_id", "ts_us")
    val out = Sessionize.sessions(e, "user_id", "ts_us", gapUs = 100L)
    assert(out.columns.toSeq ===
      Seq("user_id", "session_start_us", "session_end_us", "n_events"))
    assert(out.as[(Long, Long, Long, Long)].collect().toSeq ===
      Seq((1L, 10L, 20L, 2L)))
  }

  private val left = Seq(
    (10L, 1L, 100L), // after r1, at r2's exact ts
    (11L, 1L, 50L),  // after r1 only
    (12L, 1L, 5L),   // before all right rows
    (13L, 2L, 100L)  // key with no right rows
  ).toDF("event_id", "user_id", "ts_us")

  private val right = Seq(
    (1L, 10L, 900L, 1.5),
    (1L, 100L, 901L, 2.5),
    (1L, 100L, 902L, 3.5) // same (key, ts) as 901 -> max tiebreak wins
  ).toDF("user_id", "p_ts_us", "p_event_id", "p_value")

  test("asof: latest right at-or-before wins; max tiebreak on equal ts") {
    val out = AsofJoin.asof(left, right, Seq("user_id"),
        leftTs = "ts_us", rightTs = "p_ts_us",
        payload = Seq("p_event_id", "p_value"), tiebreak = "p_event_id")
      .orderBy("event_id")
      .select("event_id", "p_event_id")
      .as[(Long, Option[Long])].collect().toSeq
    assert(out === Seq(
      (10L, Some(902L)), // equal ts visible, tiebreak picks 902 over 901
      (11L, Some(900L)),
      (12L, None),
      (13L, None)))
  }

  test("asof strict: equal-ts right row is NOT visible") {
    val out = AsofJoin.asof(left, right, Seq("user_id"),
        leftTs = "ts_us", rightTs = "p_ts_us",
        payload = Seq("p_event_id", "p_value"), tiebreak = "p_event_id",
        strict = true)
      .orderBy("event_id")
      .select("event_id", "p_event_id")
      .as[(Long, Option[Long])].collect().toSeq
    assert(out === Seq(
      (10L, Some(900L)), // 901/902 at ts=100 excluded by strict
      (11L, Some(900L)),
      (12L, None),
      (13L, None)))
  }

  test("streaming sessions match the batch operator (append after watermark)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val in = mem.toDF().toDF("user_id", "ts_us")
    val q = Sessionize.streamingSessions(in, "user_id", "ts_us",
        gapUs = 100L, watermarkDelay = "0 microseconds")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two sessions' worth of events for user 1
      mem.addData((1L, 0L), (1L, 50L), (1L, 300L))
      q.processAllAvailable()
      // batch 2: far-future event advances the watermark past both closes
      mem.addData((2L, 1000000L))
      q.processAllAvailable()
      val emitted = spark.table("sessions_out")
        .orderBy("user_id", "session_start_us")
        .as[(Long, Long, Long, Long)].collect().toSeq
      // the user-2 session is still open (watermark at its own ts), but
      // both user-1 sessions closed and must match the batch operator
      val batch = Sessionize.sessions(
          Seq((1L, 0L), (1L, 50L), (1L, 300L)).toDF("user_id", "ts_us"),
          "user_id", "ts_us", gapUs = 100L)
        .orderBy("user_id", "session_start_us")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(emitted === batch)
      assert(emitted === Seq((1L, 0L, 50L, 2L), (1L, 300L, 300L, 1L)))
    } finally q.stop()
  }

  test("streaming tumbling window matches the batch bucket arithmetic (q16)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val bucketUs = 1000L
    val mem = MemoryStream[(Long, Long)]
    val in = mem.toDF().toDF("user_id", "ts_us")
    val q = in
      .withColumn("__event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("__event_ts", "0 microseconds")
      .groupBy(window(col("__event_ts"), s"$bucketUs microseconds"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("window.start")).as("w_start_us"), col("cnt"))
      .writeStream.format("memory").queryName("tumble_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, 100L), (1L, 900L), (2L, 1500L), (1L, 2100L))
      q.processAllAvailable()
      mem.addData((2L, 999999L)) // advance watermark, close all windows
      q.processAllAvailable()
      val streamed = spark.table("tumble_out")
        .as[(Long, Long)].collect().toMap
      // batch q16-style bucket arithmetic over the same closed events
      val batch = Seq(100L, 900L, 1500L, 2100L)
        .groupBy(_ / bucketUs * bucketUs).view.mapValues(_.size.toLong).toMap
      assert(streamed.filterKeys(_ < 999000L).toMap === batch)
    } finally q.stop()
  }

  test("asof: payload fields travel together (no cross-row mixing)") {
    val out = AsofJoin.asof(left, right, Seq("user_id"),
        leftTs = "ts_us", rightTs = "p_ts_us",
        payload = Seq("p_event_id", "p_value"), tiebreak = "p_event_id")
      .where(col("event_id") === 10L)
      .select("p_event_id", "p_value")
      .as[(Long, Double)].collect().toSeq
    assert(out === Seq((902L, 3.5)))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gap-based sessionization: group each key's events into sessions where
  * consecutive events are less than `gap` apart.
  *
  * Batch path uses Spark's native `session_window` (3.2+): a single
  * groupBy(key, session_window) — one shuffle, codegen'd session merge,
  * and the SAME operator works under Structured Streaming with a
  * watermark, so the batch and streaming definitions of a "session"
  * cannot drift. Semantics: an event at exactly last_ts + gap EXTENDS
  * the current session (verified against Spark 4: windows merge when
  * next.start <= prev.end); only diff > gap starts a new session.
  */
object Sessionize {

  /** Per-session summary over an epoch-MICROSECOND long ts column.
    *
    * @param df      input
    * @param keyCol  session key (e.g. user id)
    * @param tsUsCol event time, epoch micros (long)
    * @param gapUs   session gap, microseconds
    * @param aggs    extra aggregates; each must carry an alias (.as(...))
    * @return (keyCol, session_start_us, session_end_us, n_events, aggs...)
    */
  def sessions(df: DataFrame, keyCol: String, tsUsCol: String, gapUs: Long,
      aggs: Seq[Column] = Nil): DataFrame = {
    val base = min(col(tsUsCol)).as("session_start_us") +:
      max(col(tsUsCol)).as("session_end_us") +:
      count(lit(1)).as("n_events") +: aggs
    val out = df.groupBy(col(keyCol),
        session_window(timestamp_micros(col(tsUsCol)), s"$gapUs microseconds"))
      .agg(base.head, base.tail: _*)
    // Output order after agg is (key, session_window, session_start_us,
    // session_end_us, n_events, aggs...); agg names are taken positionally
    // from the schema rather than via Column.expr (not public API).
    out.select(out.columns.filterNot(_ == "session_window").map(col): _*)
  }

  /** Streaming variant: the SAME session_window aggregation over a
    * streaming DataFrame, with a watermark bounding session state. In
    * append mode a session emits once the watermark passes its close
    * (last_ts + gap): state is dropped after emission, so per-key state
    * size is bounded by the number of OPEN sessions -- this is what makes
    * gap sessionization feasible on an unbounded 100 TB/day stream,
    * where a batch groupBy would need the full history.
    *
    * @param watermarkDelay max event lateness, e.g. "10 minutes"
    */
  def streamingSessions(df: DataFrame, keyCol: String, tsUsCol: String,
      gapUs: Long, watermarkDelay: String,
      aggs: Seq[Column] = Nil): DataFrame = {
    val base = min(col(tsUsCol)).as("session_start_us") +:
      max(col(tsUsCol)).as("session_end_us") +:
      count(lit(1)).as("n_events") +: aggs
    val out = df
      .withColumn("__event_ts", timestamp_micros(col(tsUsCol)))
      .withWatermark("__event_ts", watermarkDelay)
      .groupBy(col(keyCol),
        session_window(col("__event_ts"), s"$gapUs microseconds"))
      .agg(base.head, base.tail: _*)
    out.select(out.columns.filterNot(_ == "session_window").map(col): _*)
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with a watermark -- the canonical
  * Structured Streaming shape (readStream -> watermark -> window ->
  * agg): per-key counts over tumbling event-time windows, with state for
  * a window evicted once the watermark passes its end and later-arriving
  * rows for closed windows DROPPED, not double-counted.
  *
  * Scale shape: identical to a batch groupBy((window, key)) -- ONE
  * shuffle on the composite key into the state store; the watermark
  * bounds state to the windows still open (O(keys x open windows)), so a
  * continuous 100 TB/day feed runs with bounded memory. In Append mode a
  * window emits exactly once, when it closes -- the contract downstream
  * parquet/Kafka sinks need for exactly-once window results.
  *
  * Runs unchanged on a batch frame (watermark is a no-op there),
  * so the same code serves the backfill and the live path.
  */
object StreamingStats {

  /** @param df             input (streaming or batch) with an event-time
    *                       timestamp column
    * @param tsCol          event-time column (timestamp type)
    * @param keyCol         aggregation key
    * @param windowDur      tumbling window duration, e.g. "10 seconds"
    * @param watermarkDelay max expected lateness, e.g. "5 seconds"
    */
  def windowedCounts(df: DataFrame, tsCol: String, keyCol: String,
      windowDur: String, watermarkDelay: String): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol), col("n"))
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication with CUSTOM state: the first row per key
  * ever seen passes, every later duplicate (same micro-batch or any later
  * one) drops. This is `flatMapGroupsWithState` doing what
  * `dropDuplicates` cannot in a stream without a watermark bound: an
  * explicit, inspectable per-key state (one boolean), the building block
  * for exact corpus dedup during continuous ingestion (e.g. dedup by
  * content md5 while a 100 TB/day crawl lands).
  *
  * Scale shape: state lives in the state store partitioned by key hash --
  * the same ONE shuffle a batch dropDuplicates pays, but amortized across
  * the stream's lifetime; state size is O(distinct keys), and for
  * content-hash keys an optional TTL (`keepAlive`) bounds it when
  * upstream guarantees duplicates arrive within a window.
  *
  * Also works on a batch DataFrame (Spark runs the same operator with
  * transient state): equivalent to dropDuplicates(keyCol) keeping an
  * arbitrary-but-deterministic-per-partition-order first row.
  */
object StreamingDedup {

  /** Stream-static decontamination: drop every streamed document whose
    * text shares >= minHits distinct shingles with the STATIC benchmark
    * frame -- the batch [[graft.llmops.Curation]] semantics applied to
    * continuous ingestion. The benchmark's shingle set (small by
    * definition: benchmark suites vs a crawl) is collected ONCE from the
    * static side and broadcast into a per-row counting filter, so the
    * operator is a pure map-side predicate: Append-mode safe, no state
    * store, no shuffle, no per-batch joins. The batch variant
    * ([[graft.llmops.Curation.contaminationHits]]) keeps the set
    * distributed instead -- same semantics, different residency.
    */
  def decontaminated(stream: DataFrame, benchmark: DataFrame,
      textCol: String, shingleN: Int = 3, minHits: Int = 1): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = graft.functions.TextFunctions
    val bench = benchmark
      .select(explode(array_distinct(
        t.shingles(t.tokens(col(textCol)), shingleN))).as("sh"))
      .distinct()
      .collect().map(_.getString(0)).toSet
    val bc = stream.sparkSession.sparkContext.broadcast(bench)
    val hitsUdf = org.apache.spark.sql.functions.udf(
      (sh: Seq[String]) => sh.count(bc.value.contains))
    stream.where(hitsUdf(array_distinct(
      t.shingles(t.tokens(col(textCol)), shingleN))) < minHits)
  }

  /** @param df        input (streaming or batch)
    * @param keyCol    dedup key column (stringified for state keying)
    * @param keepAlive optional state TTL in ms of PROCESSING time; None =
    *                  keep forever (exact dedup). With a TTL, a duplicate
    *                  arriving after the key's state expired passes again.
    */
  def firstOccurrence(df: DataFrame, keyCol: String,
      keepAlive: Option[Long] = None): DataFrame = {
    require(df.columns.contains(keyCol), s"missing key column '$keyCol'")
    val rowEnc = Encoders.row(df.schema)
    val timeout = keepAlive.fold(GroupStateTimeout.NoTimeout())(_ =>
      GroupStateTimeout.ProcessingTimeTimeout())
    val dedup = (key: String, rows: Iterator[Row],
        state: GroupState[Boolean]) => {
      if (state.hasTimedOut) {
        // TTL fired with no new rows: drop the state, emit nothing.
        state.remove()
        Iterator.empty
      } else if (state.exists) {
        keepAlive.foreach(state.setTimeoutDuration)
        Iterator.empty
      } else {
        state.update(true)
        keepAlive.foreach(state.setTimeoutDuration)
        rows.take(1)
      }
    }
    df.as(rowEnc)
      .groupByKey((r: Row) => String.valueOf(r.getAs[Any](keyCol)))(
        Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(dedup)(
        Encoders.scalaBoolean, rowEnc)
      .toDF()
  }
}

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
    * continuous ingestion. Either way the operator is a pure map-side
    * predicate: Append-mode safe, no state store, no shuffle, no
    * per-batch joins. Two residency tiers for the benchmark set:
    *
    *  - `bloomBits = 0` (exact): the raw shingle set is collected ONCE
    *    and broadcast. Right for real benchmark suites (small by
    *    definition vs a crawl), and the only driver structure that
    *    grows with the static side.
    *  - `bloomBits > 0` (sketch): the shingle set is folded
    *    DISTRIBUTED into a [[graft.llmops.Sketches.bloomSketch]] and
    *    only the fixed mBits/62-word bitset ships to the driver /
    *    broadcast -- memory is O(bloomBits) no matter how large the
    *    contamination list grows (e.g. screening against a full prior
    *    corpus snapshot). Guarantee is ONE-SIDED: a Bloom filter has
    *    no false negatives, so every truly contaminated doc still
    *    drops; a clean doc may additionally drop at the FP rate
    *    (~(1-e^(-kn/m))^k) -- the conservative direction for
    *    decontamination. Kept rows are always a subset of the exact
    *    path's kept rows. For exact batch semantics over a huge set,
    *    use [[graft.llmops.Curation.decontaminate]]'s bloom tier,
    *    which can afford the exact verify join a stateless
    *    append-mode stream cannot.
    */
  def decontaminated(stream: DataFrame, benchmark: DataFrame,
      textCol: String, shingleN: Int = 3, minHits: Int = 1,
      bloomBits: Int = 0, bloomK: Int = 3): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = graft.functions.TextFunctions
    val shingleCol = array_distinct(
      t.shingles(t.tokens(col(textCol)), shingleN))
    val benchShingles = benchmark.select(explode(array_distinct(
        t.shingles(t.tokens(col(textCol)), shingleN))).as("sh"))
      .distinct()
    val hitsUdf =
      if (bloomBits > 0) {
        val sk = graft.llmops.Sketches.bloomSketch(benchShingles, "sh",
          mBits = bloomBits, k = bloomK, salt = "decontam")
        val words = graft.llmops.Sketches.bloomWords(sk, bloomBits)
        val bc = stream.sparkSession.sparkContext.broadcast(words)
        org.apache.spark.sql.functions.udf((sh: Seq[String]) =>
          sh.count(s => graft.llmops.Sketches.bloomHit(bc.value,
            bloomBits, bloomK, "decontam", s)))
      } else {
        val bench = benchShingles.collect().map(_.getString(0)).toSet
        val bc = stream.sparkSession.sparkContext.broadcast(bench)
        org.apache.spark.sql.functions.udf(
          (sh: Seq[String]) => sh.count(bc.value.contains))
      }
    stream.where(hitsUdf(shingleCol) < minHits)
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
    val keyIdx = df.schema.fieldIndex(keyCol)
    // Map-side pre-dedup BEFORE the state shuffle (r22, guide §2.3:
    // flatMapGroupsWithState ships every row; built-in aggregations
    // would partial-aggregate map-side and this restores that): each
    // input partition forwards only its FIRST row per key, so the
    // shuffle into the state store carries at most
    // (partitions × distinct keys) rows instead of every duplicate —
    // at crawl scale (content-hash dedup of a 100 TB/day feed) the
    // duplicate volume never leaves the scan stage. Semantics are
    // unchanged: the operator's contract is "an arbitrary-but-
    // deterministic-per-partition-order first row per key"; the state
    // operator still picks one row per key across partitions, and a
    // within-partition duplicate could never win anyway (state.exists
    // is true from the first row of the group iterator on). The TTL
    // path is also unchanged — expiry happens between micro-batches,
    // and within one batch duplicates collapse in state regardless.
    val prededup = (it: Iterator[Row]) => {
      val seen = new java.util.HashSet[String]()
      it.filter(r => seen.add(String.valueOf(r.get(keyIdx))))
    }
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
      .mapPartitions(prededup)(rowEnc)
      .groupByKey((r: Row) => String.valueOf(r.getAs[Any](keyIdx)))(
        Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(dedup)(
        Encoders.scalaBoolean, rowEnc)
      .toDF()
  }
}

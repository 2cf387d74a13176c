package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hex8

/** Sketch aggregations for corpus-scale statistics.
  *
  * HyperLogLog distinct counting (Flajolet et al. 2007): the standard
  * way to count distinct tokens/URLs/users per group over 100 TB
  * without shuffling the distinct sets -- registers aggregate with MAX,
  * so the shuffle carries at most `groups x 2^p` tiny rows and the
  * map side pre-combines.
  *
  * Exact cross-engine determinism (unusual for HLL, deliberate here):
  * the hash is md5-derived (hex8), the register is an integer, and the
  * harmonic denominator sums 2^-M_j terms -- dyadic rationals that
  * double addition represents EXACTLY (max register 27 and <= 2^p terms
  * keep the sum far inside the 53-bit mantissa), so the group sum is
  * order-independent and any SQL oracle reproduces every bit. The one
  * float step (alpha * m^2 / denom) is a single multiply + divide of
  * identical doubles. The small-range linear-counting correction uses
  * ln(), whose last bit is libm-dependent -- [[hllDistinct]] exposes
  * the raw estimate for cross-engine gates and [[correctedEstimate]]
  * (driver-side, on the collected frame) for consumers who want the
  * textbook correction.
  */
object Sketches {

  /** Registers: (groupCol, bucket, register) with register =
    * max over values of rho(hash suffix). p bits of bucket, rho =
    * leading-zero count of the remaining (32-p) bits + 1; all-zero
    * suffix -> (32-p)+1.
    */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
      p: Int): DataFrame = {
    require(p >= 2 && p <= 12)
    val suffixBits = 32 - p
    val h = hex8(col(valueCol))
    // integer ops only: shiftright for the bucket (Column./ would go
    // through DOUBLE), % stays exact on non-negative longs.
    val bucket = shiftright(h, suffixBits)
    val rest = h % (1L << suffixBits)
    // bit-length via bin(): both Spark and DuckDB print minimal binary
    // strings, so length(bin(rest)) is the highest-set-bit position.
    val rho = when(rest === 0, lit(suffixBits + 1))
      .otherwise(lit(suffixBits) - length(bin(rest)) + 1)
    df.select(col(groupCol), bucket.as("bucket"), rho.as("rho"))
      .groupBy(groupCol, "bucket")
      .agg(max(col("rho")).as("register"))
  }

  /** Per-group raw HLL estimate. Returns (groupCol, buckets_seen,
    * denom_micro, raw_est): denominator = sum over ALL m = 2^p buckets
    * of 2^-register (unseen buckets contribute 2^-0 = 1), raw_est =
    * alpha_m * m^2 / denominator. denom_micro is exact (dyadic sum);
    * floor it to micros for hash-stable gates.
    */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String,
      p: Int): DataFrame = {
    val m = 1 << p
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    hllRegisters(df, groupCol, valueCol, p)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("buckets_seen"),
        // 2^-register via an integer shift + ONE division: exact dyadic
        // doubles (pow() would route through libm, whose last bit is
        // implementation-defined).
        sum(lit(1.0) /
          expr("CAST(shiftleft(CAST(1 AS BIGINT), register) AS DOUBLE)"))
          .as("__seen_denom"))
      .withColumn("__denom",
        col("__seen_denom") + (lit(m) - col("buckets_seen")).cast("double"))
      .select(col(groupCol), col("buckets_seen"),
        floor(col("__denom") * 1000000).cast("long").as("denom_micro"),
        (lit(alpha * m.toDouble * m.toDouble) / col("__denom"))
          .as("raw_est"))
  }

  /** Merge register frames (the property that makes HLL a SCALE tool:
    * sketch each shard/snapshot independently, MAX-combine the
    * registers, estimate the union's cardinality without re-reading
    * anything). Exactly equals the registers of the unioned inputs --
    * LlmOpsSpec asserts frame equality.
    */
  def hllMergeRegisters(a: DataFrame, b: DataFrame,
      groupCol: String): DataFrame =
    a.union(b).groupBy(groupCol, "bucket")
      .agg(max(col("register")).as("register"))

  /** Textbook small/large-range corrected estimate (driver-side helper;
    * uses ln(), so NOT for cross-engine hash gates).
    */
  def correctedEstimate(rawEst: Double, bucketsSeen: Long, p: Int): Double = {
    val m = 1 << p
    val zeros = m - bucketsSeen
    if (rawEst <= 2.5 * m && zeros > 0)
      m * math.log(m.toDouble / zeros) // linear counting
    else rawEst
  }

  // --- count-min sketch -------------------------------------------------
  // Heavy-hitter counting in fixed memory: depth x width integer counters,
  // point estimate = min over rows (always an over-estimate, tight for
  // heavy hitters). The update shuffle carries (row, slot) keys only --
  // depth small integers per input value -- so counting a 100 TB token
  // stream costs depth tiny groupBys worth of traffic, never a
  // per-distinct-value state.

  /** Build the sketch: (row, slot, cnt) for depth rows of width slots;
    * slot_r(v) = hex8(md5("r:" || v)) % width. Absent (row, slot) pairs
    * mean zero.
    *
    * Hashing happens AFTER a per-value count aggregate: slot ids depend
    * only on the distinct value, so the depth md5s run once per DISTINCT
    * value and the counts ride as weights (sum, not count) -- on a token
    * stream with Zipfian repetition that is orders of magnitude less
    * hash work, and the first groupBy's map-side partial combine shrinks
    * the shuffle to the distinct-value set. Output is identical (sum of
    * per-value counts == count of occurrences).
    */
  def cmSketch(df: DataFrame, valueCol: String, depth: Int = 4,
      width: Int = 256): DataFrame =
    cmSketchFromCounts(
      df.groupBy(col(valueCol).cast("string").as("__v"))
        .agg(count(lit(1)).as("__c")),
      "__v", "__c", depth, width)

  /** [[cmSketch]] from a pre-aggregated (value, count) frame — the
    * r22 one-pass path for callers that already hold per-value counts
    * (llm_cms_counts pins the token-count aggregate and derives both
    * the sketch and the exact top-k from it). Identical output to
    * cmSketch over the expanded stream: sum of per-value counts ==
    * count of occurrences.
    */
  def cmSketchFromCounts(counts: DataFrame, valueCol: String,
      countCol: String, depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2)
    counts
      .select(col(countCol).as("__c"),
        posexplode(transform(sequence(lit(0), lit(depth - 1)), r =>
          hex8(concat(r.cast("string"), lit(":"),
            col(valueCol).cast("string"))) % width))
          .as(Seq("row", "slot")))
      .groupBy("row", "slot")
      .agg(sum(col("__c")).as("cnt"))
  }

  /** Point estimates for `queries` (a frame with valueCol): min over
    * rows of the matching slot counters. Missing slots count as zero
    * (only possible for values the sketch never saw).
    *
    * depth/width MUST equal the values the sketch was built with -- a
    * mismatch would silently yield wrong (often zero) estimates, so this
    * validates against the sketch frame itself: a non-empty sketch has
    * max(row) == depth-1 (every update writes all depth rows) and every
    * slot < width. The check is an eager aggregate over the sketch --
    * bounded by construction (depth x width counters), and the frame is
    * broadcast into the estimate join anyway. Heuristic limit: a sketch
    * built WIDER than `width` whose occupied slots all happen to fall
    * below `width` passes; carrying depth/width in a config table fixes
    * that at the cost of the plain-frame API.
    */
  def cmEstimate(sketch0: DataFrame, queries: DataFrame, valueCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    // validation is an eager action over the sketch; scoped-persist so
    // an uncached build plan executes once, not once per consumer
    val sketch = graft.core.Caches.scoped(sketch0)
    val chk = sketch.agg(max(col("row")).as("mr"), max(col("slot")).as("ms"))
      .head()
    if (!chk.isNullAt(0)) {
      // row is posexplode's int, slot is hex8 % width (long) -- widen both
      val (mr, ms) = (chk.getAs[Number](0).intValue(),
        chk.getAs[Number](1).intValue())
      require(mr == depth - 1,
        s"sketch depth mismatch: max(row)=$mr implies depth ${mr + 1}, got $depth")
      require(ms < width,
        s"sketch width mismatch: max(slot)=$ms >= width $width")
    }
    val slots = queries
      .select(col(valueCol),
        posexplode(transform(sequence(lit(0), lit(depth - 1)), r =>
          hex8(concat(r.cast("string"), lit(":"),
            col(valueCol).cast("string"))) % width))
          .as(Seq("row", "slot")))
    slots
      .join(broadcast(sketch), Seq("row", "slot"), "left")
      .groupBy(valueCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  // --- histogram quantile sketch ----------------------------------------

  /** Histogram-based quantile estimates: bin = FLOOR-division of the
    * value by binWidth (pmod-adjusted -- Spark's `div` truncates toward
    * zero, which would shift every negative value's bin up by one and
    * make `est` the bin's UPPER edge), so the q-quantile estimate is the
    * bin's LOWER EDGE for negative values too. The estimate is the first
    * bin whose cumulative count reaches ceil(q * N). All-integer
    * arithmetic (bin ids, counts, a cross-multiplied threshold), so
    * estimates are bit-reproducible -- unlike interpolated
    * percentile_approx, whose float interpolation is engine-specific.
    * Error is bounded by binWidth by construction.
    *
    * Scale shape: ONE groupBy on the bin id; the cumulative window runs
    * over the BIN frame only (bounded by the value range / binWidth,
    * thousands of rows at most -- the packSequences totals-frame
    * pattern), never over the data.
    *
    * @param qMillis quantiles in milli-units (500 = p50, 990 = p99).
    * Returns (q_milli, bin, est = bin * binWidth, n).
    */
  def histogramQuantiles(df: DataFrame, valueCol: String, binWidth: Long,
      qMillis: Seq[Int]): DataFrame = {
    require(binWidth >= 1 && qMillis.nonEmpty)
    // floor division via pmod: (v - pmod(v, w)) is exactly divisible by
    // w and pmod is non-negative, so the quotient floors for any sign --
    // integer-exact, no doubles.
    val bins = df
      .select(expr(s"""(CAST($valueCol AS BIGINT)
          - pmod(CAST($valueCol AS BIGINT), $binWidth)) div $binWidth""")
        .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = bins.withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val qcols = qMillis.map(qm =>
      min(when(col("cum") * 1000 >= lit(qm.toLong) * col("n"), col("bin")))
        .as(s"__b$qm"))
    cum.groupBy(col("n"))
      .agg(qcols.head, qcols.tail: _*)
      .select(col("n"), explode(array(qMillis.map(qm =>
        struct(lit(qm).as("q_milli"), col(s"__b$qm").as("bin"))): _*))
        .as("q"))
      .select(col("q.q_milli").as("q_milli"), col("q.bin").as("bin"),
        (col("q.bin") * binWidth).as("est"), col("n"))
  }

  // --- bottom-k (KMV) set signatures -----------------------------------
  // The k smallest md5 hashes of a group's distinct values. Unlike the
  // per-seed MinHash signature (k passes over the values), bottom-k is
  // ONE pass + a per-group top-k, and signatures COMPOSE: the Jaccard of
  // two groups is estimated from their signatures alone -- the standard
  // way to compare token/url/user sets ACROSS sources or snapshots
  // without ever co-shuffling the raw sets.

  /** (groupCol, signature array<string>): the k lexicographically
    * smallest md5(value) per group, ascending. One distinct + one
    * per-group rank window; at 100 TB the window input is (group, 16-byte
    * hash) rows only.
    */
  def bottomK(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    require(k >= 1)
    val hashed = df
      .select(col(groupCol), md5(col(valueCol).cast("string")).as("__h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__h"))
    hashed.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .groupBy(groupCol)
      .agg(sort_array(collect_list(col("__h"))).as("signature"))
  }

  /** All-pairs Jaccard estimates from bottom-k signatures (groups x
    * groups is tiny; the raw sets never meet): est = |K(A u B) n A n B|
    * / |K(A u B)| where K takes the k smallest of the merged signature.
    * Integer-count division, floored to micros.
    *
    * `k` must equal the k the signatures were built with; a signature
    * LONGER than k proves a mismatch and fails fast (the eager max-size
    * aggregate is over the tiny sketch frame). The converse -- signatures
    * all shorter than k because every group had few distinct values --
    * is indistinguishable from a smaller build k, and in that case the
    * estimate is unaffected (the merged prefix is the full union either
    * way), so the heuristic guard is sufficient.
    */
  // --- Bloom filter -----------------------------------------------------
  // The set-membership sketch (Bloom 1970): k md5-derived bit positions
  // per item, OR'd into an mBits-wide bitset carried as int64 words of
  // 62 USABLE BITS each -- bits 62/63 stay clear because engines that
  // check signed overflow (DuckDB errors on 1 << 63) could not rebuild
  // a 64-bit layout, and the layout is ours to define. Deterministic
  // (hex8(i:salt:value) % mBits), so any engine rebuilds the identical
  // bitset and membership answers -- including the false positives --
  // bit-for-bit. The 100 TB use is broadcast decontamination/join
  // pre-filtering: the sketch is mBits/62 rows regardless of corpus
  // size (1 GB of bits screens ~1e9 members at 1% FP), where the exact
  // shingle set would be a corpus-scale shuffle.

  /** Build: (word_idx, bits) rows; absent words are all-zero (omitted).
    * mBits must be a multiple of 62 (62 usable bits per int64 word).
    */
  def bloomSketch(df: DataFrame, valueCol: String, mBits: Int = 15872,
      k: Int = 3, salt: String = "bloom"): DataFrame = {
    require(mBits > 0 && mBits % 62 == 0, "mBits must be a multiple of 62")
    require(k >= 1, "k must be >= 1")
    df.select(explode(transform(sequence(lit(0), lit(k - 1)), i =>
        hex8(concat(i.cast("string"), lit(s":$salt:"),
          col(valueCol).cast("string"))) % mBits)).as("pos"))
      .groupBy((col("pos") / 62).cast("long").as("word_idx"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), " +
        "cast(pos % 62 as int)))").as("bits"))
  }

  /** Dense word array of a built sketch: index = word_idx, value =
    * bits. The collect is bounded by LAYOUT (mBits/62 rows max),
    * independent of the member-set size -- the structure that makes
    * broadcast decontamination driver-memory-constant at any corpus
    * scale, where collecting the raw member set is
    * O(benchmark). Fails fast on a sketch built with a larger mBits.
    */
  def bloomWords(sketch: DataFrame, mBits: Int = 15872): Array[Long] = {
    require(mBits > 0 && mBits % 62 == 0, "mBits must be a multiple of 62")
    val words = new Array[Long](mBits / 62)
    sketch.select(col("word_idx").cast("long"), col("bits").cast("long"))
      .collect().foreach { r =>
        val i = r.getLong(0)
        require(i >= 0 && i < words.length,
          s"sketch width mismatch: word_idx $i outside ${words.length} words")
        words(i.toInt) = r.getLong(1)
      }
    words
  }

  /** JVM mirror of the [[bloomSketch]] / [[bloomContains]] hash layout
    * -- byte-equal positions (first 8 md5 hex chars of "i:salt:value"
    * parsed base 16, mod mBits; 62 usable bits per word) -- so a
    * map-side closure can answer membership against a broadcast
    * [[bloomWords]] array with zero joins. True iff all k bits set:
    * no false negatives; false positives at the sketch's FP rate.
    */
  def bloomHit(words: Array[Long], mBits: Int, k: Int, salt: String,
      value: String): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < k) {
      md.reset()
      val d = md.digest(s"$i:$salt:$value".getBytes("UTF-8"))
      // first 8 hex chars == first 4 digest bytes as unsigned 32-bit
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val pos = h % mBits
      if ((words((pos / 62).toInt) &
          (1L << (pos % 62).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  /** Probe: one row per DISTINCT probe VALUE with `might_contain` --
    * true iff all k positions are set. Duplicate probe values collapse
    * to one row and no other probe column is carried (the groupBy keys
    * on the value alone); callers wanting per-row answers join this
    * result back on `valueCol`. Parameters must match the build (the
    * [[cmEstimate]] convention); the width check catches a sketch built
    * with larger mBits. Validation is an eager action, so the sketch is
    * scoped-persisted first -- its build plan runs once and the probe
    * join reuses the cache instead of rebuilding.
    */
  def bloomContains(sketch0: DataFrame, probes: DataFrame,
      valueCol: String, mBits: Int = 15872, k: Int = 3,
      salt: String = "bloom"): DataFrame = {
    require(mBits > 0 && mBits % 62 == 0, "mBits must be a multiple of 62")
    val sketch = graft.core.Caches.scoped(sketch0)
    val chk = sketch.agg(max(col("word_idx"))).head()
    if (!chk.isNullAt(0))
      require(chk.getAs[Number](0).longValue() < mBits / 62,
        s"sketch width mismatch: max(word_idx)=${chk.get(0)} >= ${mBits / 62}")
    probes
      .select(col(valueCol),
        explode(transform(sequence(lit(0), lit(k - 1)), i =>
          hex8(concat(i.cast("string"), lit(s":$salt:"),
            col(valueCol).cast("string"))) % mBits)).as("pos"))
      .withColumn("word_idx", (col("pos") / 62).cast("long"))
      .join(broadcast(sketch), Seq("word_idx"), "left")
      .groupBy(valueCol)
      .agg(expr("bool_and((coalesce(bits, cast(0 as bigint)) & " +
        "shiftleft(cast(1 as bigint), cast(pos % 62 as int))) != 0)")
        .as("might_contain"))
  }

  def bottomKJaccardPairs(sketches: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    val chk = sketches.agg(max(size(col("signature")))).head()
    if (!chk.isNullAt(0))
      require(chk.getInt(0) <= k,
        s"signature length ${chk.getInt(0)} exceeds k=$k: built with larger k")
    val l = sketches.select(col(groupCol).as("g_a"),
      col("signature").as("__sa"))
    val r = sketches.select(col(groupCol).as("g_b"),
      col("signature").as("__sb"))
    l.join(r, col("g_a") < col("g_b"))
      .withColumn("__u",
        slice(array_sort(array_union(col("__sa"), col("__sb"))), 1, k))
      .select(col("g_a"), col("g_b"),
        floor(size(array_intersect(array_intersect(col("__u"),
            col("__sa")), col("__sb"))).cast("double") * 1000000.0 /
          least(lit(k), size(col("__u"))).cast("double")).cast("long")
          .as("est_jaccard_micro"))
  }
}

package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus curation operators (beyond-reference §2.9): the
  * selection half of a data pipeline -- reproducible sampling, per-domain
  * quota mixing, and benchmark decontamination.
  *
  * Scale notes (100 TB):
  *   - deterministicSample is a pure filter over a hash of the id: no
  *     shuffle, no RNG state, survives repartitioning/retries, and the
  *     SAME rows are kept on every engine (the sampling analog of
  *     content-derived ids). A seeded `df.sample` depends on partition
  *     layout; this does not.
  *   - groupQuota is one shuffle on the group key; the per-group top-k
  *     goes through a rank window, so AQE can split skewed groups'
  *     sort spill but the quota semantics stay exact.
  *   - contamination joins the corpus against the BENCHMARK shingle set,
  *     which is small by definition (benchmark suites are ~1e5 docs vs
  *     1e10 training docs) -- broadcast, so the corpus never shuffles;
  *     only the matched candidates reach the per-doc count.
  */
object Curation {

  /** Keep a row iff hex32(md5(salt:id)) % 10000 < rate*10000 -- a
    * deterministic Bernoulli sample at 0.01% rate resolution,
    * recomputable in any engine with md5.
    */
  def sampleKeep(idCol: Column, rate: Double, salt: String): Column = {
    val bucket = conv(substring(
      md5(concat(lit(salt + ":"), idCol.cast("string"))), 1, 8), 16, 10)
      .cast("long") % 10000L
    bucket < math.round(rate * 10000.0)
  }

  def deterministicSample(df: DataFrame, idCol: String, rate: Double,
      salt: String): DataFrame =
    df.where(sampleKeep(col(idCol), rate, salt))

  /** EXACT-count deterministic sample: the n rows with the smallest
    * md5(salt:id) (id tiebreak — md5 collisions are theoretical but the
    * order must be total). Rate-based sampling can't hit "give me
    * exactly 10k eval docs"; hash-ranking can, stays layout/RNG
    * independent, and is NESTED like the rate sampler (the exact-n set
    * is a subset of the exact-m set for n < m, same salt). Scale shape:
    * orderBy.limit = TakeOrderedAndProject — per-partition top-n + one
    * driver-side merge of n*partitions rows, never a full sort.
    */
  def exactSample(df: DataFrame, idCol: String, n: Int,
      salt: String): DataFrame = {
    require(n >= 0, "n must be non-negative")
    df.withColumn("__sk",
        md5(concat(lit(salt + ":"), col(idCol).cast("string"))))
      .orderBy(col("__sk"), col(idCol))
      .limit(n)
      .drop("__sk")
  }


  /** Per-stratum deterministic sampling -- the data-mixing primitive
    * ("keep 10% of en, 100% of low-resource langs"). Same hash-of-id
    * filter as [[deterministicSample]] with a per-stratum rate; strata
    * not in `rates` fall back to `defaultRate`. Still a pure filter:
    * no shuffle, layout/RNG independent, and nested (a stratum's kept
    * set at rate r is a subset of its kept set at any r' > r).
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: String): DataFrame = {
    val bucket = conv(substring(
      md5(concat(lit(salt + ":"), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long") % 10000L
    val threshold = rates.foldLeft(lit(math.round(defaultRate * 10000.0))) {
      case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, lit(math.round(r * 10000.0)))
          .otherwise(acc)
    }
    df.where(bucket < threshold)
  }

  /** Deterministic train/validation/test split: every row gets exactly
    * one named split, decided by the same layout/RNG-independent
    * hash-of-id bucket as [[deterministicSample]] (0.01% resolution).
    * The split assignment is a pure map -- no shuffle, stable under
    * repartitioning/retries, and any engine reproduces it from (salt,
    * id) alone, so train/test membership survives reprocessing: the
    * property that prevents silent test-set leakage when a 100 TB
    * corpus is re-curated.
    *
    * `fractions` are (name, fraction) in assignment order; they must sum
    * to 1 at the 1/10000 resolution (checked). A row's bucket falls in
    * exactly one cumulative interval, so splits are disjoint and
    * exhaustive by construction.
    */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty, "hashSplit needs at least one split")
    val widths = fractions.map { case (_, f) => math.round(f * 10000.0) }
    require(widths.sum == 10000L,
      s"split fractions must sum to 1 at 1/10000 resolution, " +
        s"got ${widths.sum / 10000.0}")
    val bucket = conv(substring(
      md5(concat(lit(salt + ":"), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long") % 10000L
    val cuts = widths.scanLeft(0L)(_ + _).tail // cumulative upper bounds
    val split = fractions.map(_._1).zip(cuts).init
      .foldRight(lit(fractions.last._1): Column) {
        case ((name, cut), acc) => when(bucket < cut, name).otherwise(acc)
      }
    df.withColumn("split", split)
  }

  /** Deterministic WEIGHTED Bernoulli sampling: keep a row with
    * probability weightMicro/1e6 (integer micros in [0, 1e6], e.g. a
    * quality or novelty score), decided by the same layout/RNG
    * independent hash-of-id bucket as [[deterministicSample]] -- the
    * "sample proportional to score" curation primitive with exact
    * cross-engine reproducibility. Monotone in the weight (raising a
    * row's weight can only keep it) and nested across salts like the
    * unweighted sampler. Still a pure filter: no shuffle.
    */
  def weightedSample(df: DataFrame, idCol: String,
      weightMicroCol: String, salt: String): DataFrame = {
    val bucket = conv(substring(
      md5(concat(lit(salt + ":"), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long") % 1000000L
    df.where(bucket < col(weightMicroCol).cast("long"))
  }

  /** Temperature-based data mixing (the multilingual-LM sampling
    * scheme, alpha = 0.5): per-group keep rate sqrt(n_min / n_g), so
    * the smallest group is kept in full and group g's expected share
    * becomes proportional to sqrt(n_g) -- flattening the natural
    * distribution toward low-resource groups without upsampling.
    *
    * Scale shape: one tiny count aggregate, its result BROADCAST back,
    * then the same pure hash-of-id filter as [[deterministicSample]] --
    * the corpus itself never shuffles. Determinism: rate = one division
    * + one sqrt (both correctly-rounded IEEE ops), threshold = floor to
    * 0.01% resolution; any engine reproduces the kept set exactly.
    */
  def temperatureMix(df: DataFrame, idCol: String, groupCol: String,
      salt: String): DataFrame = {
    // NULL groups never survive an equi-join, so they are coalesced to a
    // sentinel key: null-group rows form their own stratum and
    // participate deterministically instead of being silently dropped
    // (the stratifiedSample defaultRate analog). The sentinel starts
    // with "\\u0000" -- not producible by any sane group value; a collision
    // would only merge that group with the null stratum, never drop rows.
    val gk = coalesce(col(groupCol).cast("string"), lit("\u0000null"))
    val withKey = df.withColumn("__gk", gk)
    val counts = withKey.groupBy(col("__gk")).agg(count(lit(1)).as("__n"))
    val nmin = counts.agg(min(col("__n")).as("__nmin"))
    val thresholds = counts.crossJoin(broadcast(nmin))
      .select(col("__gk"),
        floor(sqrt(col("__nmin").cast("double") / col("__n").cast("double"))
          * 10000.0).cast("long").as("__thr"))
    val bucket = conv(substring(
      md5(concat(lit(salt + ":"), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long") % 10000L
    withKey.join(broadcast(thresholds), Seq("__gk"))
      .where(bucket < col("__thr"))
      .drop("__thr", "__gk")
  }

  /** Snapshot diff between two corpus versions: per id, `added`
    * (only in B), `removed` (only in A), `changed` (content hash
    * differs) or `unchanged` -- the bookkeeping primitive for
    * incremental crawls and dataset versioning (what moved between two
    * 100 TB snapshots without comparing text: one full outer join on
    * the id carrying 16-byte hashes).
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ha = a.select(col(idCol).as("id"), md5(col(textCol)).as("__ha"))
    val hb = b.select(col(idCol).as("id"), md5(col(textCol)).as("__hb"))
    ha.join(hb, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("__ha").isNull, "added")
          .when(col("__hb").isNull, "removed")
          .when(col("__ha") === col("__hb"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** N-gram novelty score: per document, the fraction of its DISTINCT
    * shingles that occur nowhere else in the corpus (corpus-wide count
    * == 1) -- the inverse of the boilerplate signal, used to up-weight
    * genuinely novel text in curation. Integer-count division.
    *
    * EVERY input document gets an output row: documents too short to
    * produce a shingle (fewer than shingleN tokens) would vanish from
    * the exploded aggregate, so the per-doc stats are LEFT-joined back
    * onto the corpus and short docs get the defined score
    * (n_shingles = 0, unique_shingles = 0, novelty_micro = 0) --
    * downstream novelty-weighted joins never drop or misclassify them.
    *
    * Scale shape: one explode + groupBy on the shingle (md5-sized keys),
    * one join back on the shingle, one per-doc groupBy, one id-keyed
    * join back to the (narrow) id projection. Hot shingles are
    * exactly the non-novel ones, so skew on the shingle key is bounded
    * by AQE's skew split and never reaches the per-doc agg.
    */
  def noveltyScore(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3): DataFrame = {
    val t = graft.functions.TextFunctions
    // scoped-persisted: the tokenize+shingle+explode corpus scan has two
    // consumers (the corpus-frequency aggregate and the per-doc join)
    // that exchange reuse cannot cover -- same rationale as the
    // minhash/simhash base pins.
    val docSh = graft.core.Caches.scoped(
      df.select(col(idCol).as("id"),
        explode(graft.llmops.Dedup.distinctShinglesUdf(shingleN)(
          col(textCol))).as("sh")))
    val corpus = docSh.groupBy("sh").agg(count(lit(1)).as("cnt"))
    val perDoc = docSh.join(corpus, Seq("sh"))
      .groupBy("id")
      .agg(count(lit(1)).as("__ns"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("__us"))
    df.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("__ns"), lit(0L)).as("n_shingles"),
        coalesce(col("__us"), lit(0L)).as("unique_shingles"),
        coalesce(
          floor(col("__us").cast("double") * 1000000.0 /
            col("__ns").cast("double")).cast("long"),
          lit(0L)).as("novelty_micro"))
  }

  /** Epoch upsampling: repeat each row `repeats(group)` times (default
    * 1), emitting a copy index -- the integer-repeat mixing scheme
    * ("3 epochs of books, 1 of web"). A pure map-side explode: no
    * shuffle, no RNG, and the copy index keeps downstream packing /
    * shuffling deterministic.
    */
  def withRepeats(df: DataFrame, groupCol: String,
      repeats: Map[String, Int], defaultRepeat: Int = 1): DataFrame = {
    require(defaultRepeat >= 0 && repeats.values.forall(_ >= 0))
    val n = repeats.foldLeft(lit(defaultRepeat)) {
      case (acc, (g, r)) =>
        when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    // sequence(1, 0) DESCENDS in Spark (default step -1) instead of
    // being empty -- a zero repeat must map to an empty array explicitly.
    df.withColumn("copy", explode(
      when(n < 1, array().cast("array<int>"))
        .otherwise(sequence(lit(1), n))))
  }

  /** Per-group quota: the k best rows per group by (orderCol DESC, id
    * ASC) -- domain-quota data mixing ("at most k docs per source,
    * best-quality first").
    */
  def groupQuota(df: DataFrame, groupCol: String, orderCol: String,
      idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /** Distinct-shingle overlap counts between corpus docs and a benchmark
    * frame: (id, hits) for every corpus doc sharing >= minHits distinct
    * shingles with ANY benchmark doc. Shingle construction is exactly
    * [[graft.functions.TextFunctions.shingles]] over
    * [[graft.functions.TextFunctions.tokens]] (the same definition the
    * n-gram dedup gate proves against DuckDB).
    */
  def contaminationHits(docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3,
      minHits: Int = 1): DataFrame = {
    val benchShingles = distinctShingles(benchmark, textCol, shingleN)
    contaminationHitsOn(docs, benchShingles, idCol, textCol, shingleN,
      minHits, hintBroadcast = true)
  }

  private def distinctShingles(df: DataFrame, textCol: String,
      shingleN: Int): DataFrame =
    df.select(explode(graft.llmops.Dedup.distinctShinglesUdf(shingleN)(
      col(textCol))).as("sh"))
      .distinct()

  private def contaminationHitsOn(docs: DataFrame,
      benchShingles: DataFrame, idCol: String, textCol: String,
      shingleN: Int, minHits: Int, hintBroadcast: Boolean): DataFrame = {
    val docShingles = docs.select(col(idCol).as("id"),
      explode(graft.llmops.Dedup.distinctShinglesUdf(shingleN)(
        col(textCol))).as("sh"))
    docShingles
      .join(if (hintBroadcast) broadcast(benchShingles) else benchShingles,
        Seq("sh"))
      .groupBy("id")
      .agg(count(lit(1)).as("hits")) // shingles already distinct per side
      .where(col("hits") >= minHits)
  }

  /** Corpus minus contaminated docs (decontamination before training).
    *
    * `bloomBits > 0` turns on the big-benchmark tier for contamination
    * lists too large to broadcast raw (a prior corpus snapshot, not a
    * benchmark suite): the benchmark's shingle set folds DISTRIBUTED
    * into a fixed-width [[Sketches.bloomSketch]], the mBits/62-word
    * bitset broadcasts into a map-side candidate filter (no false
    * negatives, so the candidate set is a SUPERSET of the contaminated
    * docs), and the exact shingle join + count runs over candidates
    * only -- the Bloom FP rate is exactly the fraction of clean docs
    * that pay the join, and the verify removes every FP, so the OUTPUT
    * is identical to the exact path at any bloomBits. The verify join
    * is left unhinted in this tier (candidates are few; the benchmark
    * side is assumed too big to broadcast -- AQE picks).
    */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3, minHits: Int = 1,
      bloomBits: Int = 0, bloomK: Int = 3): DataFrame = {
    val bad =
      if (bloomBits <= 0)
        contaminationHits(docs, benchmark, idCol, textCol,
          shingleN, minHits).select(col("id").as(idCol))
      else {
        val benchShingles = distinctShingles(benchmark, textCol, shingleN)
        val sk = Sketches.bloomSketch(benchShingles, "sh",
          mBits = bloomBits, k = bloomK, salt = "decontam")
        val words = Sketches.bloomWords(sk, bloomBits)
        val bc = docs.sparkSession.sparkContext.broadcast(words)
        val bloomHits = udf((sh: Seq[String]) =>
          sh.count(s => Sketches.bloomHit(bc.value, bloomBits, bloomK,
            "decontam", s)))
        val candidates = docs.where(bloomHits(
          graft.llmops.Dedup.distinctShinglesUdf(shingleN)(col(textCol)))
          >= minHits)
        contaminationHitsOn(candidates, benchShingles, idCol, textCol,
          shingleN, minHits, hintBroadcast = false)
          .select(col("id").as(idCol))
      }
    docs.join(bad, Seq(idCol), "left_anti")
  }

  /** One row of the DSIR weight table: add-one-smoothed log-likelihood
    * ratio of a hashed-shingle bucket's target vs raw frequency, floored
    * to integer micros. Carrying the two counts alongside the ratio lets
    * a SQL oracle recompute the counts and join on ALL THREE columns --
    * any count drift breaks the join and surfaces as a hash mismatch.
    */
  final case class DsirWeight(bucket: Int, targetCount: Long,
      rawCount: Long, llrMicro: Long)

  private def dsirBucketCol(shCol: Column, buckets: Int): Column =
    (graft.functions.TextFunctions.hex8(shCol) % buckets).cast("int")

  /** Per-bucket shingle-occurrence counts, collected driver-side: the
    * frame is at most `buckets` rows by construction (the k-means-sample
    * pattern -- bounded collect feeding a broadcast table).
    */
  private def dsirBucketCounts(df: DataFrame, textCol: String,
      shingleN: Int, buckets: Int): Map[Int, Long] = {
    val t = graft.functions.TextFunctions
    df.select(explode(graft.llmops.Dedup.shinglesUdf(shingleN)(col(textCol))).as("s"))
      .select(dsirBucketCol(col("s"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  /** DSIR-shape importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", public literature):
    * per md5-hashed shingle bucket b,
    *   llr(b) = ln((t_b + 1) / (T + B)) - ln((r_b + 1) / (R + B))
    * -- the add-one-smoothed log ratio of the bucket's frequency in a
    * TARGET corpus vs the RAW corpus (T/R = total occurrences, B =
    * bucket count). Every bucket gets a weight (zero-count buckets get
    * the smoothing floor), so downstream scoring joins never drop a
    * shingle.
    *
    * Determinism protocol: the bucket counts are exact integer
    * aggregates; ln() -- libm, last-bit engine-dependent -- is evaluated
    * ONCE, here on the JVM, and only the floored integer micro-weights
    * travel (broadcast into scoring; injected as a VALUES table into the
    * gate's SQL oracle, the trained-centroid pattern). Both engines then
    * perform integer-only sums and compares: no cross-engine FP decision
    * exists, so no margin guard is needed.
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, textCol: String,
      shingleN: Int = 2, buckets: Int = 256): Seq[DsirWeight] = {
    require(buckets > 0, "buckets must be positive")
    val tc = dsirBucketCounts(target, textCol, shingleN, buckets)
    val rc = dsirBucketCounts(raw, textCol, shingleN, buckets)
    val tTot = tc.values.sum.toDouble + buckets
    val rTot = rc.values.sum.toDouble + buckets
    (0 until buckets).map { b =>
      val t = tc.getOrElse(b, 0L)
      val r = rc.getOrElse(b, 0L)
      val llr = math.log((t + 1).toDouble / tTot) -
        math.log((r + 1).toDouble / rTot)
      DsirWeight(b, t, r, math.floor(llr * 1e6).toLong)
    }
  }

  /** Score + select raw-corpus docs by DSIR importance: a doc's score is
    * the integer sum of its shingle occurrences' bucket llr-micros, and
    * it is kept when its MEAN llr clears `thresholdMicro`
    * (cross-multiplied: score >= threshold * n_grams -- no per-doc
    * division). Docs with no shingles keep a row (n_grams = 0, score 0,
    * keep = false), the [[noveltyScore]] completeness rule.
    *
    * Scale shape: the <= `buckets`-row weight table broadcasts; the wide
    * stages are the shingle explode (map-side) and the per-doc groupBy
    * on the id. Returns (idCol, n_grams, score_micro, keep).
    */
  def dsirScores(raw: DataFrame, idCol: String, textCol: String,
      weights: Seq[DsirWeight], shingleN: Int = 2, buckets: Int = 256,
      thresholdMicro: Long = 0L): DataFrame = {
    require(weights.length == buckets,
      s"weight table has ${weights.length} rows, expected $buckets")
    val t = graft.functions.TextFunctions
    val spark = raw.sparkSession
    import spark.implicits._
    val w = broadcast(
      weights.map(x => (x.bucket, x.llrMicro)).toDF("bucket", "llr_micro"))
    val sh = raw.select(col(idCol).as("id"),
        explode(graft.llmops.Dedup.shinglesUdf(shingleN)(col(textCol))).as("s"))
      .select(col("id"), dsirBucketCol(col("s"), buckets).as("bucket"))
    val agg = sh.join(w, Seq("bucket"))
      .groupBy("id")
      .agg(count(lit(1)).as("__n"), sum(col("llr_micro")).as("__sc"))
    raw.select(col(idCol).as("id"))
      .join(agg, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("__n"), lit(0L)).as("n_grams"),
        coalesce(col("__sc"), lit(0L)).as("score_micro"),
        (coalesce(col("__n"), lit(0L)) > 0 &&
          coalesce(col("__sc"), lit(0L)) >=
            lit(thresholdMicro) * coalesce(col("__n"), lit(0L)))
          .as("keep"))
  }

  /** CCNet-shape n-gram LM quality scoring (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data",
    * public literature) re-expressed integer-exactly: the "language
    * model" is the per-bucket occurrence count table of hashed bigrams
    * over a TARGET (reference) corpus, and a document's fluency score is
    * the sum over its shingles of bitlen(c_b + 1) -- the integer
    * floor(log2)+1 of the add-one-smoothed bucket count, a monotone
    * stand-in for log-probability. Low mean bits = shingles rarely seen
    * in the reference corpus = high perplexity; the keep cut is the
    * cross-multiplied mean threshold in DECI-bits (score * 10 >=
    * minMeanDeciBits * n_grams -- no per-doc division, and tenth-of-a-bit
    * resolution because real corpora's mean-bits distributions are
    * tight).
    *
    * Determinism protocol: unlike [[dsirWeights]] there is NO floating
    * point anywhere -- counts are exact integer aggregates and bitlen
    * is `length(bin(x))` in both Spark and DuckDB -- so the SQL oracle
    * recomputes the ENTIRE pipeline, model training included (no
    * injected constants).
    *
    * Scale shape: the model is a <= `buckets`-row count frame
    * (broadcast into the scoring join); the corpus-side stages are the
    * map-side shingle explode and one groupBy on the doc id. Docs with
    * no shingles keep a row (n_grams = 0, lm_bits = 0, keep = false) --
    * the [[noveltyScore]] completeness rule.
    */
  def lmScores(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 2, buckets: Int = 4096,
      minMeanDeciBits: Long = 0L): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val t = graft.functions.TextFunctions
    val counts = target
      .select(explode(graft.llmops.Dedup.shinglesUdf(shingleN)(col(textCol))).as("s"))
      .select(dsirBucketCol(col("s"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("__c"))
    val sh = raw.select(col(idCol).as("id"),
        explode(graft.llmops.Dedup.shinglesUdf(shingleN)(col(textCol))).as("s"))
      .select(col("id"), dsirBucketCol(col("s"), buckets).as("bucket"))
    val agg = sh.join(broadcast(counts), Seq("bucket"), "left")
      .select(col("id"),
        length(bin(coalesce(col("__c"), lit(0L)) + 1)).cast("long")
          .as("__bits"))
      .groupBy("id")
      .agg(count(lit(1)).as("__n"), sum(col("__bits")).as("__sc"))
    raw.select(col(idCol).as("id"))
      .join(agg, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("__n"), lit(0L)).as("n_grams"),
        coalesce(col("__sc"), lit(0L)).as("lm_bits"),
        (coalesce(col("__n"), lit(0L)) > 0 &&
          coalesce(col("__sc"), lit(0L)) * 10 >=
            lit(minMeanDeciBits) * coalesce(col("__n"), lit(0L)))
          .as("keep"))
  }

  /** Deterministic epoch shuffle for training-data export: a pure
    * hash-of-(epoch-salt, id) sort key. Writing
    * `repartitionByRange(col("shuffle_key")) .sortWithinPartitions`
    * produces a globally shuffled, reproducible epoch order with NO
    * single-partition stage (range exchange + local sorts); a different
    * epoch salt reshuffles the corpus, and any engine recomputes the
    * same order (md5 keys, id tiebreak). The gate materializes explicit
    * positions through a window for verification only -- the write path
    * above is the scale shape.
    */
  def withEpochShuffle(df: DataFrame, idCol: String, epoch: Int,
      salt: String = "shuffle"): DataFrame =
    df.withColumn("shuffle_key",
      md5(concat(lit(s"$salt:$epoch:"), col(idCol).cast("string"))))

  /** Hash-filter stride for the boundary sample: CEILING division, so the
    * expected sample size count/stride is <= cap and the hash filter --
    * not the ordered limit -- is what bounds the sample. Floor division
    * would give stride=1 for any cap < count < 2*cap, making every row
    * pass the filter and limit(cap) keep only the smallest ids: boundary
    * ids then span just the low end of the id space and the LAST range
    * absorbs the rest of the corpus through one window partition.
    */
  def sampleStride(count: Long, cap: Long): Long =
    math.max(1L, (count + cap - 1) / cap)

  /** Sequence packing, concat-and-cut semantics: documents are
    * concatenated in `idCol` order into one token stream that is cut
    * every `capacity` tokens (how pretraining batches are actually
    * packed); each doc lands in bin = tokens_before / capacity at
    * offset tokens_before % capacity.
    *
    * Scale design: the global running sum is a DISTRIBUTED prefix sum,
    * not a single-partition window -- partition the id range, cumulative
    * window WITHIN each range, then add per-range starting offsets
    * computed from a tiny (numPartitions-row) totals frame. No stage
    * ever funnels the corpus through one task.
    *
    * Range placement is DETERMINISTIC BY CONSTRUCTION: boundaries come
    * from a hash-mod sample of ids (layout/retry independent), sorted,
    * and injected as literals, so the range id is a pure function of the
    * row. This replaces the earlier repartitionByRange + persist design:
    * repartitionByRange picks boundaries by sampling with a per-RDD
    * seed, so the two consumers of the ranged frame (per-range totals
    * and the cumulative window) could see DIFFERENT placements unless
    * the whole corpus was persisted between them -- a cache of the full
    * input this version no longer needs.
    *
    * @return input columns + `bin` and `bin_offset` (both long)
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      capacity: Long, partitions: Int = 0,
      persistInput: Boolean = true): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    // The operator makes FOUR passes over its input: the count, the
    // boundary-id sample (both eager), the per-range totals, and the main
    // windowed frame (both in the returned plan). These are separate
    // actions/subtrees with no exchange to reuse, so an expensive
    // upstream (llm_pipeline feeds a 5-stage curation chain in here)
    // would re-execute once per pass. Persisting the input is the
    // stage-table pattern: at 100 TB you'd write the curated corpus to a
    // table before packing; scoped MEMORY_AND_DISK is the in-session
    // analog (harnesses release scoped caches between queries).
    val in = if (persistInput) graft.core.Caches.scoped(df) else df
    withExclusivePrefix(in, idCol, tokensCol, n)
      .withColumn("bin", expr(s"__before div ${capacity}"))
      .withColumn("bin_offset", pmod(col("__before"), lit(capacity)))
      .drop("__before")
  }

  /** The distributed exclusive prefix sum both [[packSequences]] and
    * [[budgetSelect]] ride on: adds `__before` = sum of `tokensCol`
    * over all rows strictly ahead of this one in `idCol` order, with NO
    * single-partition window over the data -- n-1 boundary ids from a
    * bounded deterministic sample split the corpus into ranges, a
    * <= n-row totals frame carries the cross-range offsets, and each
    * range windows locally.
    */
  private def withExclusivePrefix(in: DataFrame, idCol: String,
      tokensCol: String, n: Int): DataFrame = {
    val idc = col(idCol)
    // n-1 boundary ids from a bounded deterministic sample (<= sampleCap
    // rows collected, any orderable id type). Comparisons against the
    // literal boundaries use the column's native ordering -- the same
    // ordering the per-range window sorts by, so ordering by
    // (range, id) == ordering by id globally.
    val sampleCap = 100000
    val stride = sampleStride(in.count(), sampleCap)
    val sampled: Array[Any] = in
      .where(pmod(hash(idc), lit(stride)) === 0)
      .select(idc.as("__id")).orderBy(col("__id")).limit(sampleCap)
      .collect().map(_.get(0))
    val bounds: Seq[Any] =
      if (n <= 1 || sampled.length <= 1) Nil
      else (1 until n)
        .map(i => sampled((i.toLong * sampled.length / n).toInt))
        .distinct
    val pid = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(idc > lit(b), 1).otherwise(0)
    }
    val ranged = in.withColumn("__pid", pid)
    // exclusive running offsets over the numPartitions-row totals frame
    // (single-partition window over <= n rows -- not a scale concern)
    val wp = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = ranged.groupBy("__pid")
      .agg(sum(col(tokensCol).cast("long")).as("__t"))
      .withColumn("__off", sum(col("__t")).over(wp) - col("__t"))
      .select("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol).asc)
    val before = col("__off") +
      sum(col(tokensCol).cast("long")).over(w) - col(tokensCol).cast("long")
    ranged.join(broadcast(offsets), Seq("__pid"))
      .withColumn("__before", before)
      .drop("__pid", "__off")
  }

  /** Token-budget prefix selection: sort the corpus by (score desc, id
    * asc), keep the longest prefix whose INCLUSIVE token sum stays
    * within `budget` -- the "best docs until the budget is spent"
    * curation primitive (data mixing under a fixed token budget). Docs
    * past the cut drop even if a smaller later doc would still fit:
    * prefix semantics keep the selection a rank cut, reproducible by
    * any engine with one window, instead of a sequential knapsack.
    *
    * The sort key is a zero-padded string composite
    * (MaxValue - score, id), so lexicographic order IS (score desc, id
    * asc) and the prefix sum rides the same sampled-boundary machinery
    * as [[packSequences]] -- no single-partition window. Requires
    * non-negative long scores and ids, ENFORCED per-row: a negative
    * value would render as a '-'-prefixed 20-char segment that silently
    * corrupts lexicographic order and the prefix cut, so the key
    * expression raises instead of mis-selecting.
    *
    * Returns kept rows: (idCol, scoreCol, tokensCol, cum_tokens).
    */
  def budgetSelect(df: DataFrame, idCol: String, tokensCol: String,
      scoreCol: String, budget: Long, partitions: Int = 0): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    val keyed0 = df.select(col(idCol), col(scoreCol), col(tokensCol))
      .withColumn("__bk", concat(
        format_string("%019d", lit(Long.MaxValue) -
          requireNonNeg(col(scoreCol).cast("long"), "score")),
        lit(":"),
        format_string("%019d",
          requireNonNeg(col(idCol).cast("long"), "id"))))
    // the prefix-sum machinery makes four passes (count, boundary
    // sample, range totals, final); scoped-persist the narrow keyed
    // input so an expensive upstream (llm_pipeline4 feeds a
    // tokenizer-costed quality join in here) executes once --
    // packSequences' pattern
    val keyed = graft.core.Caches.scoped(keyed0)
    withExclusivePrefix(keyed, "__bk", tokensCol, n)
      .withColumn("cum_tokens",
        col("__before") + col(tokensCol).cast("long"))
      .where(col("cum_tokens") <= budget)
      .select(col(idCol), col(scoreCol), col(tokensCol), col("cum_tokens"))
  }

  /** Per-source curation dashboard: for each value of `groupCol`
    * (source/domain/crawl), the document count, total token count,
    * number of documents whose exact text also appears elsewhere in the
    * CORPUS (cross-source duplicate pressure -- the per-domain signal
    * web-curation pipelines act on), and the mean quality score
    * (micro-quantized integer mean, exact cross-engine).
    *
    * Scale shape: one narrow projection, one hash-partitioned groupBy on
    * the content hash (partial aggregation map-side), one shuffle join
    * back on the hash, one groupBy on the source. Both shuffles are on
    * high-cardinality keys; the output is one row per source, so the
    * final agg collapses to a tiny frame. Mean quality is computed as
    * an integer `div` of two exact long sums -- never a float mean, so
    * the result is independent of aggregation order at any scale.
    */
  def sourceStats(df: DataFrame, idCol: String, textCol: String,
      groupCol: String): DataFrame = {
    // compiled counts + the shared score arithmetic (identical doubles
    // to the TextFunctions expression form — the withQuality parity)
    val base = df
      .withColumn("__qc", graft.functions.QualityCountsExpr(col(textCol)))
      .select(col(groupCol), col(idCol),
        md5(col(textCol)).as("__h"),
        col("__qc.nTokens").cast("long").as("__ntok"),
        floor(TextAnalysis.qualityScoreFromCounts(col("__qc"),
          length(col(textCol))) * 1000000.0).cast("long").as("__qm"))
    val dupCounts = base.groupBy("__h").agg(count(lit(1)).as("__cnt"))
    base.join(dupCounts, Seq("__h"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ntok")).as("n_tokens"),
        sum(when(col("__cnt") > 1, 1L).otherwise(0L)).as("dup_docs"),
        sum(col("__qm")).as("__qsum"))
      .withColumn("mean_quality_micro",
        expr("__qsum div n_docs"))
      .drop("__qsum")
  }

  /** Per-row fail-fast guard for %019d composite keying: a negative
    * long renders as a 20-char '-'-prefixed segment that silently
    * corrupts lexicographic order, so raise instead. NULL passes
    * through unchanged (pre-existing key-of-null behavior).
    */
  private def requireNonNeg(c: Column, what: String): Column =
    when(c < 0, raise_error(concat(
      lit(s"composite sort key requires non-negative $what, got "),
      c.cast("string"))).cast("long"))
      .otherwise(c)

  /** Deterministic shard-export plan (the WebDataset/tfrecord write
    * stage): documents are laid out in EPOCH-SHUFFLED order (md5 of
    * salt:epoch:id -- reshuffled every epoch, reproducible from the
    * epoch number alone) and cut into shards of `targetTokens` tokens by
    * the same distributed prefix sum [[packSequences]] rides on. Each
    * doc lands in exactly one shard at a deterministic offset, so a
    * 1000-executor writer can produce byte-identical shards with no
    * coordination: shard assignment is a pure function of (id, epoch).
    *
    * The order key appends the zero-padded id to the hash so exact hash
    * collisions cannot make placement ambiguous. Returns the input
    * columns plus `shard_id` and `shard_offset` (both long).
    */
  def shardPlan(df: DataFrame, idCol: String, tokensCol: String,
      targetTokens: Long, epoch: Int, partitions: Int = 0): DataFrame = {
    require(targetTokens > 0, "targetTokens must be positive")
    val keyed = df.withColumn("__sk", concat(
      md5(concat(lit(s"shard:$epoch:"), col(idCol).cast("string"))),
      lit(":"),
      format_string("%019d", requireNonNeg(col(idCol).cast("long"), "id"))))
    packSequences(keyed, "__sk", tokensCol, targetTokens, partitions)
      .withColumnRenamed("bin", "shard_id")
      .withColumnRenamed("bin_offset", "shard_offset")
      .drop("__sk")
  }
}

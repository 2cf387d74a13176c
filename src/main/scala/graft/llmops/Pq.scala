package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding compression + fast
  * approximate scoring (Jegou et al., "Product Quantization for Nearest
  * Neighbor Search", public literature).
  *
  * Vectors are L2-normalized, split into `m` contiguous subspaces, and
  * each subspace is k-means-quantized to one of `k` centroids: a D-dim
  * float vector becomes m small ints (e.g. 64-d float64 = 512 bytes ->
  * 8 bytes at m=8/k<=256, a 64x compression). Query scoring is ADC
  * (asymmetric distance computation): the query stays exact; per
  * subspace a k-entry lookup table of partial dot products is built once
  * on the driver, and each row's approximate cosine is m table lookups
  * -- no float math per dimension.
  *
  * At 100 TB this is the memory-tier path: codes for 1B vectors fit in
  * executor memory where raw floats cannot; `adcTopK` scans codes,
  * over-fetches `rerank` candidates by ADC score, then re-scores ONLY
  * those exactly (one small join back to the full vectors).
  */
object Pq {

  /** centroids(sub)(code) = centroid vector of that subspace. */
  final case class Model(dims: Int, m: Int,
      centroids: Array[Array[Array[Double]]]) {
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    def subDim: Int = dims / m
  }

  /** Train per-subspace codebooks on a deterministic hash sample
    * (driver-side Lloyd, like Ann.trainCentroids).
    */
  def train(df: DataFrame, vecCol: String, m: Int, k: Int,
      iters: Int = 5, sampleCap: Int = 20000): Model = {
    require(m > 0 && k > 1)
    val sample = Ann.hashSample(df, vecCol, sampleCap)
    val dims = sample(0).length
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val subDim = dims / m
    val centroids = (0 until m).map { s =>
      val chunk = sample.map(v => v.slice(s * subDim, (s + 1) * subDim))
      Ann.lloyd(chunk, k, iters)
    }.toArray
    Model(dims, m, centroids)
  }

  /** Attach the `pq_code` column (array<int> of length m). Normalizes
    * each vector first so ADC dot sums approximate cosine.
    */
  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    val enc = udf { (v: Seq[Double]) =>
      val x = Ann.l2normalize(v.toArray)
      val sd = model.subDim
      Array.tabulate(model.m) { s =>
        val chunk = x.slice(s * sd, (s + 1) * sd)
        var bc = 0; var bd = Double.MinValue; var c = 0
        val cents = model.centroids(s)
        while (c < cents.length) {
          val d = Ann.dot(chunk, cents(c))
          if (d > bd) { bd = d; bc = c }
          c += 1
        }
        bc
      }
    }
    df.withColumn("pq_code", enc(col(vecCol).cast("array<double>")))
  }

  /** Approximate cosine of each encoded row to `query` via ADC lookup
    * tables (micro-quantized long, deterministic).
    */
  def adcScore(model: Model, query: Seq[Double]):
      org.apache.spark.sql.Column = {
    val q = Ann.l2normalize(query.toArray)
    val sd = model.subDim
    // table(s)(c) = dot(query chunk s, centroid c of subspace s)
    val table: Array[Array[Double]] = Array.tabulate(model.m) { s =>
      val chunk = q.slice(s * sd, (s + 1) * sd)
      model.centroids(s).map(cvec => Ann.dot(chunk, cvec))
    }
    val score = udf { (code: Seq[Int]) =>
      var s = 0.0; var i = 0
      while (i < code.length) { s += table(i)(code(i)); i += 1 }
      math.round(s * 1000000)
    }
    score(col("pq_code"))
  }

  /** Top-k by ADC with exact rerank: scan codes only, over-fetch
    * `rerank` candidates, re-score those exactly against the original
    * vectors. rerank >= row count degenerates to exact brute force.
    */
  def adcTopK(encoded: DataFrame, idCol: String, vecCol: String,
      model: Model, query: Seq[Double], k: Int, rerank: Int): DataFrame = {
    require(rerank >= k)
    val cand = encoded
      .select(col(idCol).as("id"), col(vecCol),
        adcScore(model, query).as("adc_micro"))
      .orderBy(desc("adc_micro"), col("id"))
      .limit(rerank)
    cand.select(col("id"),
        graft.functions.CosineSimilarity(col(vecCol),
          org.apache.spark.sql.functions.typedLit(query)).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }

  /** IVF x PQ composition (the IVFADC layout of Jegou et al. §IV, cosine
    * flavor): rows carry BOTH a trained-centroid cell
    * (Ann.withIvfCentroidCell) and a pq_code; a query probes the `probes`
    * nearest cells, ADC-scores ONLY the probed rows' codes, and
    * exact-reranks the over-fetched candidates. Cost shape at scale: the
    * code scan touches ~probes/nCells of the table (partition-prunable
    * when written via Ann.writePartitionedByCell), and full float vectors
    * are read for just the `rerank` rows -- the two pruning axes
    * (row pruning from IVF, byte pruning from PQ) multiply.
    */
  def ivfAdcTopK(encodedCelled: DataFrame, idCol: String, vecCol: String,
      model: Model, centroids: Array[Array[Double]], query: Seq[Double],
      k: Int, probes: Int, rerank: Int): DataFrame = {
    require(rerank >= k)
    val order = Ann.probeCells(query, centroids, probes)
    adcTopK(encodedCelled.where(col("cell").isin(order: _*)),
      idCol, vecCol, model, query, k, rerank)
  }

  // --- int8 scalar quantization (SQ8) ---------------------------------
  // The simpler sibling of PQ (the FAISS ScalarQuantizer shape, public):
  // per-DIMENSION affine bounds map each component to an 8-bit code --
  // 8x smaller than float64 with no codebook training, and candidate
  // scoring becomes an INTEGER dot product of code arrays. Unlike PQ's
  // ADC (driver-built float tables), the whole SQ8 scoring chain is
  // integer arithmetic over expressions both engines evaluate with the
  // SAME per-element IEEE ops (sub, mul, div, floor -- no accumulation
  // order to disagree on), so a SQL oracle reproduces it bit-for-bit
  // with no FP-margin machinery.

  /** Per-dimension bounds, from an EXACT one-pass aggregate (min/max are
    * exact over doubles regardless of partitioning; no sampling, no
    * RNG). dims is bounded (embedding width), so the collected frame is
    * tiny.
    */
  final case class Sq8Model(mins: Array[Double], maxs: Array[Double])

  def sq8Train(df: DataFrame, vecCol: String): Sq8Model = {
    val rows = df
      .select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("dim", "x")))
      .groupBy("dim").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy("dim")
      .collect()
    Sq8Model(rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** Column of int8 codes: code_i = floor((x_i - mn_i) * 255 /
    * (mx_i - mn_i)) clamped to [0, 255]; constant dimensions code to 0.
    * Pure per-element column expressions (codegen'd, no UDF), written in
    * the exact operation order the SQL oracle uses.
    */
  def sq8CodeCol(vec: org.apache.spark.sql.Column,
      model: Sq8Model): org.apache.spark.sql.Column = {
    val mins = typedLit(model.mins.toSeq)
    val maxs = typedLit(model.maxs.toSeq)
    zip_with(vec.cast("array<double>"),
      sequence(lit(1), lit(model.mins.length)), (x, i) => {
        val mn = element_at(mins, i.cast("int"))
        val mx = element_at(maxs, i.cast("int"))
        when(mx === mn, lit(0))
          .otherwise(greatest(least(
            floor((x - mn) * lit(255.0) / (mx - mn)), lit(255.0)), lit(0.0))
            .cast("int"))
      })
  }

  def withSq8(df: DataFrame, vecCol: String, model: Sq8Model): DataFrame =
    df.withColumn("sq_code", sq8CodeCol(col(vecCol), model))

  /** Candidate top-k by INTEGER code dot product (the memory-tier scan:
    * 1 byte/dim, integer multiply-adds), then exact cosine rerank on the
    * over-fetched candidates -- the adcTopK contract with SQ8 codes.
    * `sq8IntTopK` exposes the pure-integer candidate stage on its own
    * (what the gate oracles bit-for-bit). The code dot approximates the
    * raw DOT product: on cosine workloads with varied magnitudes,
    * quantize L2-NORMALIZED vectors (measured in BASELINE.md -- recall
    * roughly doubles; AnnRecall's sq8 rows do exactly that).
    */
  def sq8IntTopK(encoded: DataFrame, idCol: String, query: Seq[Double],
      model: Sq8Model, k: Int): DataFrame = {
    // ASYMMETRIC integer scoring (the scalar-quantizer ADC shape): rank
    // by sum_i code_i * floor(q_i * (mx_i - mn_i) * 1e6 / 255). Up to
    // code quantization this equals dot(dequant(x), q) * 1e6 minus the
    // candidate-independent sum_i mn_i*q_i term, which cancels in
    // ranking -- unlike a symmetric code x code dot, whose dropped
    // affine cross-terms VARY per candidate and scramble the order
    // (measured on sf0.1 embeddings at rerank 50: recall@10 0.22
    // symmetric vs 1.00 asymmetric -- 8-bit dequant noise is far below
    // this corpus's neighbor gaps). The weights are per-element FP ops
    // in one fixed order
    // (mul, mul, div, floor), so both engines produce identical
    // integers; the scan itself is integer multiply-adds over codes.
    val qw: Seq[Long] = query.indices.map { i =>
      val r = model.maxs(i) - model.mins(i)
      math.floor(query(i) * r * 1000000.0 / 255.0).toLong
    }
    encoded
      .select(col(idCol).as("id"),
        aggregate(zip_with(col("sq_code"), typedLit(qw),
          (a, b) => a.cast("long") * b),
          lit(0L), (acc, x) => acc + x).as("score_int"))
      .orderBy(desc("score_int"), col("id"))
      .limit(k)
  }

  def sq8TopK(encoded: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], model: Sq8Model, k: Int, rerank: Int): DataFrame = {
    require(rerank >= k)
    val cand = withSq8(encoded, vecCol, model)
    val ids = sq8IntTopK(cand, idCol, query, model, rerank)
    ids.join(encoded.select(col(idCol).as("id"), col(vecCol)), Seq("id"))
      .select(col("id"),
        graft.functions.CosineSimilarity(col(vecCol),
          org.apache.spark.sql.functions.typedLit(query)).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }

  // --- IVF x SQ8 at rest ----------------------------------------------
  // The serving layout you'd actually run at 100 TB: the CODES table
  // (1 byte/dim + an id) written cell-partitioned parquet via the
  // trained-centroid IVF, so a query (a) PRUNES PARTITIONS down to its
  // `probes` cells -- Spark lists only the probed directories -- then
  // (b) scans 8x-compressed integer codes for candidates, and (c) reads
  // full float vectors for just the `rerank` survivors (a semi-join back
  // to the vectors table). The two pruning axes multiply: row pruning
  // from IVF (~probes/nCells of the table) times byte pruning from SQ8
  // (1/8 of the float bytes) before any exact math runs.

  /** Write the at-rest IVF x SQ8 codes table: (idCol, sq_code) parquet,
    * directory-partitioned by trained-centroid cell. Full vectors are
    * deliberately NOT stored here — the rerank joins back to the vectors
    * table, keeping the hot artifact 8x smaller than the corpus.
    */
  def writeIvfSq8AtRest(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], model: Sq8Model,
      path: String): Unit =
    Ann.withIvfCentroidCell(df, vecCol, centroids)
      .select(col(idCol), col("cell"),
        sq8CodeCol(col(vecCol), model).as("sq_code"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** The integer candidate stage over the at-rest codes table: probe the
    * `probes` cells nearest the query (partition pruning, not row
    * filtering), rank by the asymmetric integer code score, return the
    * top `k` (id, score_int). Pure integers downstream of the probe —
    * the gate oracle reproduces it bit-for-bit.
    */
  def ivfSq8CandidatesAtRest(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, query: Seq[Double], model: Sq8Model,
      centroids: Array[Array[Double]], probes: Int, k: Int): DataFrame = {
    val order = Ann.probeCells(query, centroids, probes)
    sq8IntTopK(
      spark.read.parquet(path).where(col("cell").isin(order: _*)),
      idCol, query, model, k)
  }

  /** Full at-rest serving path: probe-pruned integer candidates
    * over-fetched to `rerank`, then exact cosine rerank against the full
    * `vectors` table (joined on id — only `rerank` float vectors are
    * ever read). Returns (id, score) like [[sq8TopK]].
    */
  def ivfSq8TopKAtRest(spark: org.apache.spark.sql.SparkSession,
      path: String, vectors: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], model: Sq8Model,
      centroids: Array[Array[Double]], k: Int, probes: Int,
      rerank: Int): DataFrame = {
    require(rerank >= k)
    val ids = ivfSq8CandidatesAtRest(spark, path, idCol, query, model,
      centroids, probes, rerank)
    ids.join(vectors.select(col(idCol).as("id"), col(vecCol)), Seq("id"))
      .select(col("id"),
        graft.functions.CosineSimilarity(col(vecCol),
          org.apache.spark.sql.functions.typedLit(query)).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }
}

package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design: every near-dup variant is CANDIDATE-GENERATION by LSH
  * bucketing (shuffle on band key, pairs only within buckets) followed by
  * exact verification on the candidates -- never an O(n^2) cross join.
  * At 100 TB the band-key shuffle is the only wide stage and is keyed so
  * AQE can split skewed buckets.
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct hash with the
    * canonical (min) id and the duplicate count. `keep` joins back to
    * select survivors.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("dup_count"))

  /** Survivors of exact dedup (keeps min id per content hash). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("content_hash", md5(col(textCol)))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("content_hash").orderBy(col(idCol))))
      .where(col("__rn") === 1).drop("__rn", "content_hash")

  /** MinHash+LSH near-dup pairs.
    *
    * shingle(n-gram) -> k-minhash signature -> bands -> bucket join ->
    * exact Jaccard verification >= threshold. Returns (id_a, id_b,
    * jaccard) with id_a < id_b.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 32, bandRows: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      shingles(tokens(col(textCol)), shingleN).as("sh"))
      .where(size(col("sh")) > 0)
    val sigs = base.withColumn("sig", minhashSignature(col("sh"), k))
    val banded = sigs.select(col("id"), col("sh"),
      explode(minhashBands(col("sig"), k, bandRows)).as("b"))
      .select(col("id"), col("sh"), col("b.band"), col("b.band_hash"))
    val candidates = banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") &&
          col("l.band_hash") === col("r.band_hash") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.sh").as("sh_a"), col("r.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup pairs: `bits`-bit simhash, banded into bits/bandBits
    * chunks for candidate generation, hamming-distance verification.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 64, bandBits: Int = 16, maxHamming: Int = 3): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      simhash(tokens(col(textCol)), bits).as("sh"))
    val nBands = bits / bandBits
    val banded = base.select(col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(nBands - 1)), b =>
        struct(b.as("band"),
          col("sh").substr(b * bandBits + 1, lit(bandBits)).as("chunk"))))
        .as("b"))
      .select(col("id"), col("sh"), col("b.band"), col("b.chunk"))
    banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") &&
          col("l.chunk") === col("r.chunk") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.sh").as("sh_a"), col("r.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hammingBits(col("sh_a"), col("sh_b"), bits))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** N-gram Jaccard similarity for ALL pairs above a floor, LSH-free but
    * bucketed by a cheap length band so comparisons stay local. Intended
    * for small/medium corpora or post-LSH verification; minhashPairs is
    * the scale path.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      array_distinct(shingles(tokens(col(textCol)), shingleN)).as("sh"))
      .where(size(col("sh")) > 0)
    // Jaccard >= t implies size ratio within [t, 1/t]: band by log-size so
    // only adjacent bands need comparing.
    val logBase = math.log(math.max(1.25, 1.0 / threshold))
    val withBand = base.withColumn("band",
      floor(log(size(col("sh")).cast("double")) / logBase))
    val joined = withBand.as("l").join(withBand.as("r"),
      col("l.id") < col("r.id") &&
        (col("l.band") === col("r.band") ||
          col("l.band") === col("r.band") + 1 ||
          col("l.band") + 1 === col("r.band")))
    joined.select(col("l.id").as("id_a"), col("r.id").as("id_b"),
      jaccard(col("l.sh"), col("r.sh")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Embedding near-dup: cosine >= threshold pairs via sign-bit LSH
    * bucketing over `prefixBits` leading dimensions (candidates must share
    * the sign pattern; exact cosine verifies). Brute-force fallback when
    * prefixBits = 0 (small data / recall experiments).
    */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.9, prefixBits: Int = 8): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val withKey =
      if (prefixBits <= 0) v.withColumn("bucket", lit(0))
      else v.withColumn("bucket",
        concat((0 until prefixBits).map(i =>
          when(element_at(col("v"), i + 1) >= 0, "1").otherwise("0")): _*))
    withKey.as("l").join(withKey.as("r"),
      col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        VectorFunctions.cosine(col("l.v"), col("r.v")).as("cosine"))
      .where(col("cosine") >= threshold)
  }
}

package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** DataFrame-level text-analysis operators over a text column:
  * language ID, quality scoring, token accounting, fingerprinting.
  * All column expressions -- single narrow projection, fully codegen'd,
  * no shuffle.
  */
object TextAnalysis {

  def withLangId(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("lang_pred", langId(col(textCol)))

  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val feats = qualityFeatures(col(textCol))
    feats.foldLeft(df) { case (acc, (name, c)) => acc.withColumn(name, c) }
      .withColumn("quality_score", qualityScore(col(textCol)))
  }

  def withTokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("ws_tokens", whitespaceTokenCount(col(textCol)))
      .withColumn("bpeish_tokens", bpeishTokenCount(col(textCol)))

  def withFingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fingerprint", fingerprint(col(textCol)))

  /** Split documents into overlapping token windows (training-sample
    * chunking): rows (original cols..., chunk_idx, chunk_text,
    * chunk_tokens). Stride < window gives overlap; the final partial
    * window is kept iff it starts before the text ends.
    */
  def chunkDocuments(df: DataFrame, textCol: String, window: Int,
      stride: Int): DataFrame = {
    require(window > 0 && stride > 0)
    val chunks = bind(tokens(col(textCol))) { toks =>
      val nChunks = greatest(
        ceil((size(toks) - window).cast("double") / stride).cast("int") + 1,
        lit(1))
      transform(sequence(lit(0), nChunks - 1), i =>
        struct(i.as("chunk_idx"),
          concat_ws(" ", slice(toks, i * stride + 1, lit(window)))
            .as("chunk_text"),
          least(size(toks) - i * stride, lit(window)).as("chunk_tokens")))
    }
    df.withColumn("c", explode(chunks))
      .select(col("*"), col("c.chunk_idx"), col("c.chunk_text"),
        col("c.chunk_tokens"))
      .drop("c")
  }

  /** Corpus vocabulary: token -> document frequency + total count
    * (the groupBy that feeds tokenizer training / stopword mining).
    *
    * @param idCol document identity for doc_freq; pass the table's id so
    *              exact-duplicate texts each count (None falls back to
    *              md5(text), which collapses duplicates).
    */
  def vocabulary(df: DataFrame, textCol: String,
      idCol: Option[String] = None): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"),
      idCol.map(col).getOrElse(md5(col(textCol))).as("doc_key"))
      .groupBy("token")
      .agg(count(lit(1)).as("total_count"),
        countDistinct("doc_key").as("doc_freq"))
}

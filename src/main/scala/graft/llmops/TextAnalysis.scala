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
}

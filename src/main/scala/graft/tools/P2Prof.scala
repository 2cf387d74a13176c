package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llmops.{Curation, Dedup, TextAnalysis}
import graft.functions.TextFunctions._

/** Scratch A/B for the llm_pipeline2 classifier-stage regression:
  * times the gate body with the compiled classifier UDF vs the old
  * expression form, 3 warm reps each, on one SparkSession.
  */
object P2Prof {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    println(s"docs: ${docs.count()}")

    def withClassifierOld(df: org.apache.spark.sql.DataFrame,
        textCol: String): org.apache.spark.sql.DataFrame = {
      val withSum = df
        .withColumn("clf_weight_sum",
          hashedWeightSum(tokens(col(textCol)), 64, "clf"))
        .withColumn("__n", size(tokens(col(textCol))))
      withSum
        .withColumn("clf_score_micro",
          when(col("__n") === 0, 0L).otherwise(
            floor(col("clf_weight_sum").cast("double") * 1000000.0 /
              (col("__n").cast("double") * 1000.0)).cast("long")))
        .withColumn("clf_keep", col("clf_weight_sum") > 0)
        .drop("__n")
    }

    def body(useOld: Boolean): Long = {
      val cleaned = Dedup.lineDedup(docs, "doc_id", "text",
        window = 2, maxDocFrac = 0.03)
        .where(col("kept_lines") > 0)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      val clf = if (useOld) withClassifierOld(cleaned, "clean_text")
        else TextAnalysis.withClassifier(cleaned, "clean_text")
      val kept = graft.core.Caches.scoped(clf.where(col("clf_keep")))
      val out = Curation.temperatureMix(kept, "doc_id", "lang",
        salt = "p2")
        .select(col("doc_id"), col("lang"),
          md5(col("clean_text")).as("clean_md5"))
      val n = out.count()
      n
    }
    // NO unpersist between reps — the Bench shape: each rep persists a
    // NEW frame, and rep 2+ hits CacheManager's canonicalized
    // plan-match substitution iff the plan (incl. UDF identity)
    // canonicalizes equal to rep 1's
    for (label <- Seq("new", "new", "new", "old", "old", "old")) {
      val t0 = System.nanoTime()
      val n = body(label == "old")
      println(f"[p2] $label%-4s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    spark.stop()
  }
}

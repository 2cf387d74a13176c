package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llmops.{Curation, TextAnalysis}

/** Operational runner for a curation pipeline over a documents table —
  * the llm_pipeline gate chain as durable STAGE ARTIFACTS (the third
  * runner beside DedupApp and AnnIndexApp):
  *
  *   scored/     quality features + composite score per doc
  *   kept/       docs passing the quality cut, decontaminated against
  *               the optional benchmark parquet, then deterministically
  *               sampled at --rate (hash-of-id: layout/RNG independent)
  *   shards/     the deterministic shard-export plan over the kept set
  *               (doc_id, shard_id, shard_offset) at --shard-tokens
  *   report/     one row: docs in, scored, kept, sampled, shards
  *
  * Each stage reads the previous stage's parquet; --resume reuses
  * completed artifacts (the DedupApp contract).
  *
  *   runMain graft.app.CurateApp <documentsParquet> <outDir>
  *     [--benchmark=<parquet>] [--min-quality=0.5] [--rate=1.0]
  *     [--shard-tokens=16384] [--epoch=1] [--resume]
  */
object CurateApp {

  final case class Config(docs: String, outDir: String,
      benchmark: Option[String] = None, minQuality: Double = 0.5,
      rate: Double = 1.0, shardTokens: Long = 16384L, epoch: Int = 1,
      resume: Boolean = false)

  def parse(args: Array[String]): Config = {
    require(args.length >= 2, "usage: CurateApp <documentsParquet> " +
      "<outDir> [--benchmark=] [--min-quality=] [--rate=]" +
      " [--shard-tokens=] [--epoch=] [--resume]")
    def flag(name: String): Option[String] =
      args.collectFirst { case s if s.startsWith(s"--$name=") =>
        s.stripPrefix(s"--$name=") }
    Config(args(0), args(1),
      benchmark = flag("benchmark"),
      minQuality = flag("min-quality").map(_.toDouble).getOrElse(0.5),
      rate = flag("rate").map(_.toDouble).getOrElse(1.0),
      shardTokens = flag("shard-tokens").map(_.toLong).getOrElse(16384L),
      epoch = flag("epoch").map(_.toInt).getOrElse(1),
      resume = args.contains("--resume"))
  }

  def run(spark: SparkSession, cfg: Config): Seq[(String, Long)] = {
    val docs = spark.read.parquet(cfg.docs)
    def stage(name: String)(build: => org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      graft.core.StageIo.stage(spark, s"${cfg.outDir}/$name", cfg.resume)(
        build)

    val scored = stage("scored") {
      // quality cut compares INTEGER micros (floor(score*1e6)) so the
      // artifact is engine-exact and the cut reproducible from it
      TextAnalysis.withQuality(docs, "text")
        .withColumn("quality_micro",
          floor(col("quality_score") * 1000000).cast("long"))
        .drop("quality_score", "mean_token_len", "alpha_ratio",
          "stopword_ratio")
    }
    val kept = stage("kept") {
      val q = scored.where(
        col("quality_micro") >= math.floor(cfg.minQuality * 1000000).toLong)
      val clean = cfg.benchmark match {
        case Some(b) => Curation.decontaminate(q,
          spark.read.parquet(b), "doc_id", "text")
        case None => q
      }
      if (cfg.rate >= 1.0) clean
      else Curation.deterministicSample(clean, "doc_id", cfg.rate,
        salt = s"curate:${cfg.epoch}")
    }
    val shards = stage("shards") {
      Curation.shardPlan(kept.select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", cfg.shardTokens, cfg.epoch)
        .select("doc_id", "shard_id", "shard_offset")
    }
    stage("report") {
      import spark.implicits._
      // coalesce: max(shard_id) is NULL over an empty kept set (strict
      // --min-quality / aggressive decontamination) — report 0 shards
      // instead of dying with an NPE at the final stage.
      Seq((docs.count(), scored.count(), kept.count(),
        shards.select(coalesce(max(col("shard_id")) + 1L, lit(0L)))
          .head().getLong(0)))
        .toDF("n_docs", "n_scored", "n_kept", "n_shards")
    }.head() match { case r =>
      r.schema.fieldNames.toSeq.map(n => n -> r.getAs[Long](n))
    }
  }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-curate")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val report = run(spark, cfg)
    println("[curate] stage artifacts under " + cfg.outDir +
      ": scored/ kept/ shards/ report/")
    report.foreach { case (k, v) => println(f"[curate] $k%-12s $v") }
    spark.stop()
  }
}

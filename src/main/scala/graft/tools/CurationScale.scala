package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end LLM-curation pipeline at replicated scale — the llmops
  * analogue of [[PipelineScale]] (which proves the chess path at 100k
  * games). Replicates the sf documents table R× with ten exact-variant
  * groups per source doc (replica r appends one suffix token ``v<r%10>``),
  * the web-crawl duplication shape:
  *
  *   - 90% of the corpus is EXACT duplicate pressure → stage 1
  *     (hash dedup + best-copy representatives) must collapse R×n → 10×n.
  *   - each surviving group of 10 is mutually NEAR-dup (one-token suffix
  *     diff) → stage 2 (capped minhash pairs → connected components →
  *     survivors) must collapse 10×n → ~n with every hot band bucket
  *     sub-split by the maxBandPop cap (the groups all collide).
  *   - the curation tail runs on survivors: Gopher rules + the TRAINED
  *     NB classifier (seed = doc_id % 3 == 0, labeled by lang) +
  *     decontamination (Bloom tier) + hash-ranked exact sample + epoch
  *     shuffle + shard plan.
  *
  * Every stage WRITES PARQUET and the next stage reads it back — stage
  * timings measure real execution of the real artifact chain, exactly
  * how the DedupApp/CurateApp runners compose at 100 TB.
  *
  * Usage: runMain graft.tools.CurationScale [sfDir] [replicas]
  * Default 200 replicas over sf0.1 = 1,000,000 input documents.
  */
object CurationScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val replicas = if (args.length > 1) args(1).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files
      .createTempDirectory("curation_scale").toString

    // stage harness: materialize as parquet, read the artifact back
    var stageSecs = List.empty[(String, Double, Long)]
    def stage(name: String)(build: => DataFrame): DataFrame = {
      val p = s"$root/$name"
      val t0 = System.nanoTime()
      build.write.mode("overwrite").parquet(p)
      val out = spark.read.parquet(p)
      val n = out.count()
      val secs = (System.nanoTime() - t0) / 1e9
      stageSecs ::= ((name, secs, n))
      println(f"[scale] $name%-14s $secs%7.1f s -> $n%,12d rows")
      out
    }

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val n0 = base.count()

    // replica ids keep the source id recoverable (id*R + r); the suffix
    // token makes exactly 10 distinct exact-variants per source doc.
    val docs = stage("land") {
      base.withColumn("r", explode(sequence(lit(0), lit(replicas - 1))))
        .select((col("doc_id") * replicas + col("r")).as("doc_id"),
          concat(col("text"), lit(" v"), (col("r") % 10).cast("string"))
            .as("text"),
          col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    val nIn = stageSecs.head._3
    println(f"[scale] input = ${n0}%,d x $replicas%d = $nIn%,d docs")

    val exact = stage("exact_dedup") {
      graft.llmops.Dedup
        .exactRepresentatives(docs, "doc_id", "text", "n_chars")
        .where(col("is_rep"))
        .select("doc_id", "text", "lang", "source", "n_chars")
    }

    val survivors = stage("near_dedup") {
      val pairs = graft.llmops.Dedup.minhashPairs(exact, "doc_id",
        "text", shingleN = 3, k = 8, bandRows = 4, threshold = 0.8,
        maxBandPop = 64)
      val clusters = graft.llmops.Dedup.connectedComponents(
        pairs, "id_a", "id_b")
      graft.llmops.Dedup.nearDupSurvivorsBy(exact, "doc_id", "n_chars",
        clusters)
    }

    val kept = stage("quality_nb") {
      val ruled = graft.llmops.TextAnalysis.gopherRules(survivors,
        "text", minTokens = 5, maxTokens = 100000)
      val nb = graft.llmops.TextAnalysis.nbClassify(ruled,
        ruled.where(col("doc_id") % 3 === 0)
          .withColumn("is_en", col("lang") === "en"),
        "doc_id", "text", "is_en")
      ruled.where(col("keep"))
        .join(nb.select("doc_id", "nb_pred"), Seq("doc_id"))
    }

    val clean = stage("decontam") {
      val benchmark = base.where(col("doc_id") % 97 === 0)
        .select(col("text"))
      // minHits 3: the synthetic corpus shares a small vocabulary, so
      // single-3-gram hits are ubiquitous; 3+ distinct shared shingles
      // is the contamination signal (the llm_decontam gate's regime).
      graft.llmops.Curation.decontaminate(kept, benchmark, "doc_id",
        "text", shingleN = 3, minHits = 3, bloomBits = 15872)
    }
    val nClean = stageSecs.head._3

    val shards = stage("sample_shard") {
      val sampled = graft.llmops.Curation.exactSample(clean, "doc_id",
        n = (nClean * 4 / 5).toInt, salt = "scale")
      graft.llmops.Curation.shardPlan(
        graft.llmops.Curation.withEpochShuffle(sampled, "doc_id",
          epoch = 1),
        "doc_id", "n_chars", targetTokens = 16384, epoch = 1)
    }
    val nShards = shards.agg(countDistinct("shard_id")).head().getLong(0)

    val total = stageSecs.map(_._2).sum
    val work = total - stageSecs.find(_._1 == "land").get._2
    println(f"[scale] shards: $nShards%,d")
    println(f"[scale] TOTAL $total%.1f s (pipeline after landing " +
      f"$work%.1f s) = ${nIn / work}%,.0f docs/s end-to-end")
    spark.stop()
  }
}

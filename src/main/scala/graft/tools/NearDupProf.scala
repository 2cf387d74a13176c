package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Substage wall-clock breakdown of the near-dup stage (the 91%-of-wall
  * stage in the 10M CurationScale record): band keys → candidate join →
  * exact-jaccard verify → connected components → keep-best, each
  * materialized and timed separately on the same replicated corpus
  * CurationScale uses. Exists to aim optimization at the real
  * bottleneck instead of the assumed one.
  *
  *   runMain graft.tools.NearDupProf [sfDir] [replicas] [variantMod]
  */
object NearDupProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val replicas = if (args.length > 1) args(1).toInt else 200
    val variantMod = if (args.length > 2) args(2).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val docs = base
      .withColumn("r", explode(sequence(lit(0), lit(replicas - 1))))
      .select((col("doc_id") * replicas + col("r")).as("doc_id"),
        concat(col("text"), lit(" v"), (col("r") % variantMod).cast("string"))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val exact = graft.llmops.Dedup
      .exactRepresentatives(docs, "doc_id", "text", "n_chars")
      .where(col("is_rep"))
      .select("doc_id", "text", "lang", "source", "n_chars").cache()
    println(s"[prof] exact reps = ${exact.count()}")

    val pairs = timed("minhashPairs") {
      val p = graft.llmops.Dedup.minhashPairs(exact, "doc_id", "text",
        shingleN = 3, k = 8, bandRows = 4, threshold = 0.8,
        maxBandPop = 64).cache()
      println(s"[prof]   pairs = ${p.count()}")
      p
    }
    val clusters = timed("connectedComponents") {
      val c = graft.llmops.Dedup.connectedComponents(pairs, "id_a", "id_b")
        .cache()
      println(s"[prof]   clustered ids = ${c.count()}")
      c
    }
    timed("clusters recount") {
      println(s"[prof]   recount = ${clusters.count()}") // cache hit?
    }
    timed("clusters recount2") {
      println(s"[prof]   recount2 = ${clusters.count()}")
    }
    println("[prof] cached RDD blocks: " +
      spark.sparkContext.getPersistentRDDs.size)
    timed("collected x2") {
      // driver-side copy: is the slowness in reading, or in the plan?
      val local = clusters.collect()
      println(s"[prof]   collected = ${local.length}")
    }
    timed("winners agg") {
      val scored = clusters.join(exact.select(col("doc_id").as("id"),
        col("n_chars").as("__s")), Seq("id"))
      println(s"[prof]   winners = ${scored.groupBy("cluster_id")
        .agg(min_by(col("id"), struct((lit(0d) - col("__s").cast("double"))
          .as("n"), col("id").as("id"))).as("doc_id")).count()}")
    }
    timed("keepBest") {
      println(s"[prof]   survivors = ${graft.llmops.Dedup
        .nearDupSurvivorsBy(exact, "doc_id", "n_chars", clusters).count()}")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump physical plans of the load-bearing pipelines for scale review:
  * confirms predicate pushdown (PushedFilters), column pruning
  * (ReadSchema), broadcast joins, and TakeOrderedAndProject top-k.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def show(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }

    // 1. Filter+projection pushdown into the parquet scan.
    show("q2_filter pushdown") {
      graft.gate.RelationalQueries.queries("q2_filter")(spark, sf)
    }
    // 2. Broadcast dimension joins.
    show("q3_join_agg broadcast") {
      graft.gate.RelationalQueries.queries("q3_join_agg")(spark, sf)
    }
    // 3. Top-k => TakeOrderedAndProject (no global sort).
    show("q7_topk") {
      graft.gate.RelationalQueries.queries("q7_topk")(spark, sf)
    }
    // 3b. Sessionize: ONE shuffle on the key, session merge inside agg.
    show("q22_sessionize single shuffle") {
      graft.gate.RelationalQueries.queries("q22_sessionize")(spark, sf)
    }
    // 3c. As-of join: union + window carry -- one shuffle, no join node.
    show("q23_asof_join window carry") {
      graft.gate.RelationalQueries.queries("q23_asof_join")(spark, sf)
    }
    // 4. Hybrid query end-to-end.
    import spark.implicits._
    val files = spark.createDataset(graft.core.Fixtures.all)
    val t = graft.ingest.IngestJob.tables(spark,
      graft.ingest.IngestJob.gamesFromText(spark, files))
    val e = graft.embed.DeterministicEmbedder(16)
    val v = graft.embed.VectorsJob.build(spark, t.games, t.players,
      t.positions, e)
    val plan = graft.query.QueryIntent.analyse(graft.query.QueryIntent
      .Request("games where white is rated at least 2500", Some(5)))
    show("hybrid ranked results") {
      graft.query.HybridExecutor.execute(spark,
        graft.query.HybridExecutor.Tables(t.games, t.players, Some(v)),
        plan, e).results
    }
    // 5. KNN scored scan on its own.
    show("vector knn top-k") {
      graft.query.HybridExecutor.vectorHits(v, plan,
        graft.query.HybridExecutor.queryVector(plan, e))
    }

    // 6. ANN at rest: cell-partitioned vectors + probe => the cell
    // predicate must appear as PartitionFilters on the scan (files of
    // non-probed cells never open), not as a row filter.
    {
      val emb = graft.core.Tables.embeddings(spark, sf)
      val cents = graft.llmops.Ann.trainCentroids(emb, "embedding",
        nCells = 16)
      val dir = java.nio.file.Files
        .createTempDirectory("plancheck_ann").toString + "/vectors"
      graft.llmops.Ann.writePartitionedByCell(emb, "embedding", cents, dir)
      val q = emb.where(col("vec_id") === 7)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      val probe = graft.llmops.Ann.ivfCentroidTopKAtRest(spark, dir,
        "vec_id", "embedding", q, 10, cents, probes = 4)
      show("ann at rest: partition-pruned probe")(probe)
      val scan = probe.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
      val total = spark.read.parquet(dir)
      val totalParts = total.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head.selectedPartitions.partitionCount
      val cells = graft.llmops.Ann.probeCells(q, cents, 4)
      val probedRows = total.where(col("cell").isin(cells: _*)).count()
      println(s"partition filters : ${scan.partitionFilters.mkString(", ")}")
      println(s"cell partitions   : ${scan.selectedPartitions.partitionCount} probed" +
        s" of $totalParts at rest")
      println(s"rows scanned      : $probedRows probed of ${total.count()}" +
        " at rest")
    }
    spark.stop()
  }
}

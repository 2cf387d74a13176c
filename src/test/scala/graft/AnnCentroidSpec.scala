package graft

import org.apache.spark.sql.functions._
import graft.llmops.Ann

/** Trained-centroid IVF: determinism, cell partitioning, and recall on
  * clustered data (where an IVF must beat data-oblivious cells).
  */
class AnnCentroidSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated clusters in 8-d, 40 points each, deterministic jitter
  private lazy val clustered = {
    val base = Seq(
      Array(1.0, 0, 0, 0, 0, 0, 0, 0),
      Array(0.0, 1, 0, 0, 0, 0, 0, 0),
      Array(0.0, 0, 1, 0, 0, 0, 0, 0),
      Array(0.0, 0, 0, 1, 0, 0, 0, 0))
    val rows = for {
      c <- base.indices
      i <- 0 until 40
    } yield {
      val jitter = (0 until 8).map(d =>
        ((c * 1000 + i * 17 + d * 3) % 13 - 6) / 100.0)
      val v = base(c).zip(jitter).map { case (b, j) => b + j }
      (c.toLong * 100 + i, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("trainCentroids is deterministic and yields nCells centroids") {
    val a = Ann.trainCentroids(clustered, "embedding", 4)
    val b = Ann.trainCentroids(clustered, "embedding", 4)
    assert(a.length === 4)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("cells separate the clusters; every row gets exactly one cell") {
    val cents = Ann.trainCentroids(clustered, "embedding", 4)
    val celled = Ann.withIvfCentroidCell(clustered, "embedding", cents)
    assert(celled.count() === 160)
    // each true cluster maps to a single learned cell
    val purity = celled
      .withColumn("truth", (col("vec_id") / 100).cast("int"))
      .groupBy("truth").agg(countDistinct("cell").as("ncells"))
      .agg(max("ncells")).head().getLong(0)
    assert(purity === 1L)
  }

  test("1-probe search on clustered data matches brute force exactly") {
    val cents = Ann.trainCentroids(clustered, "embedding", 4)
    val q = clustered.where(col("vec_id") === 205L)
      .select(col("embedding")).head().getSeq[Double](0)
    val exact = Ann.bruteForceTopK(clustered, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Ann.ivfCentroidTopK(clustered, "vec_id", "embedding", q, 10,
      cents, probes = 1).collect().map(_.getLong(0)).toSet
    assert(approx === exact) // all 10 neighbors live in the query's cluster
  }

  test("probing all cells recovers brute force on any data") {
    val cents = Ann.trainCentroids(clustered, "embedding", 4)
    val q = Seq(0.5, 0.5, 0.0, 0.0, 0.1, 0.0, 0.0, 0.0)
    val exact = Ann.bruteForceTopK(clustered, "vec_id", "embedding", q, 15)
      .collect().map(_.getLong(0)).toSeq
    val all = Ann.ivfCentroidTopK(clustered, "vec_id", "embedding", q, 15,
      cents, probes = 4).collect().map(_.getLong(0)).toSeq
    assert(all === exact)
  }

  test("at rest: cell-partitioned probe PRUNES partitions, matches in-memory") {
    val cents = Ann.trainCentroids(clustered, "embedding", 4)
    val dir = java.nio.file.Files
      .createTempDirectory("ann_at_rest").toString + "/vectors"
    Ann.writePartitionedByCell(clustered, "embedding", cents, dir)
    val q = clustered.where(col("vec_id") === 205L)
      .select(col("embedding")).head().getSeq[Double](0)
    val atRest = Ann.ivfCentroidTopKAtRest(spark, dir, "vec_id", "embedding",
      q, 10, cents, probes = 1)
    val inMem = Ann.ivfCentroidTopK(clustered, "vec_id", "embedding", q, 10,
      cents, probes = 1).collect().map(_.getLong(0)).toSeq
    assert(atRest.collect().map(_.getLong(0)).toSeq === inMem)
    // the cell predicate must reach the scan as a PARTITION filter (file
    // pruning), not a data filter: 1 of 4 cell directories read.
    // sparkPlan (pre-AQE) so the scan node is reachable via collect
    val scans = atRest.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.nonEmpty,
      "cell predicate did not become a partition filter")
    val selected = scans.head.selectedPartitions.partitionCount
    assert(selected === 1,
      s"expected 1 pruned cell partition, scan reads $selected")
  }
}

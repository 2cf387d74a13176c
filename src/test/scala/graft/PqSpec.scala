package graft

import org.apache.spark.sql.functions._
import graft.llmops.{Ann, Pq}

/** Product quantization: determinism, compression shape, ADC+rerank
  * recall on clustered data, exact degeneration at full rerank.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4 separated clusters in 8-d (same generator as AnnCentroidSpec)
  private lazy val clustered = {
    val base = Seq(
      Array(1.0, 0, 0, 0, 0, 0, 0, 0),
      Array(0.0, 1, 0, 0, 0, 0, 0, 0),
      Array(0.0, 0, 1, 0, 0, 0, 0, 0),
      Array(0.0, 0, 0, 1, 0, 0, 0, 0))
    val rows = for { c <- base.indices; i <- 0 until 40 } yield {
      val jitter = (0 until 8).map(d =>
        ((c * 1000 + i * 17 + d * 3) % 13 - 6) / 100.0)
      (c.toLong * 100 + i, base(c).zip(jitter).map { case (b, j) => b + j }.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("train is deterministic; encode emits m codes per row") {
    val a = Pq.train(clustered, "embedding", m = 4, k = 8)
    val b = Pq.train(clustered, "embedding", m = 4, k = 8)
    assert(a.centroids.map(_.map(_.toSeq).toSeq).toSeq ===
      b.centroids.map(_.map(_.toSeq).toSeq).toSeq)
    val enc = Pq.encode(clustered, "embedding", a)
    assert(enc.count() === 160)
    val lens = enc.select(size(col("pq_code"))).distinct()
      .as[Int].collect().toSeq
    assert(lens === Seq(4))
  }

  test("ADC + exact rerank recovers brute-force top-k on clustered data") {
    val model = Pq.train(clustered, "embedding", m = 4, k = 16)
    val enc = Pq.encode(clustered, "embedding", model)
    val q = clustered.where(col("vec_id") === 205L)
      .select(col("embedding")).head().getSeq[Double](0)
    val exact = Ann.bruteForceTopK(clustered, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Pq.adcTopK(enc, "vec_id", "embedding", model, q,
      k = 10, rerank = 40).collect().map(_.getLong(0)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall < 0.9")
  }

  test("rerank = n degenerates to exact brute force") {
    val model = Pq.train(clustered, "embedding", m = 2, k = 4)
    val enc = Pq.encode(clustered, "embedding", model)
    val q = Seq(0.7, 0.1, 0.0, 0.2, 0.0, 0.0, 0.0, 0.0)
    val exact = Ann.bruteForceTopK(clustered, "vec_id", "embedding", q, 15)
      .collect().map(_.getLong(0)).toSeq
    val full = Pq.adcTopK(enc, "vec_id", "embedding", model, q,
      k = 15, rerank = 160).collect().map(_.getLong(0)).toSeq
    assert(full === exact)
  }

  test("IVF x PQ: probed composition matches flat PQ on clustered data") {
    val model = Pq.train(clustered, "embedding", m = 4, k = 16)
    val cents = Ann.trainCentroids(clustered, "embedding", 4)
    val both = Pq.encode(
      Ann.withIvfCentroidCell(clustered, "embedding", cents),
      "embedding", model)
    val q = clustered.where(col("vec_id") === 205L)
      .select(col("embedding")).head().getSeq[Double](0)
    // 1 probe on well-separated clusters: the probed cell holds the whole
    // true top-10 (AnnCentroidSpec), so the composition scans 1/4 of the
    // codes yet must recall at least as well as flat PQ at the same
    // rerank budget (the probe EXCLUDES cross-cluster ADC-noise
    // candidates that can displace true neighbors from a small
    // over-fetch, so >= -- not ==).
    val composed = Pq.ivfAdcTopK(both, "vec_id", "embedding", model, cents,
      q, k = 10, probes = 1, rerank = 20).collect().map(_.getLong(0)).toSet
    val flat = Pq.adcTopK(both, "vec_id", "embedding", model, q,
      k = 10, rerank = 20).collect().map(_.getLong(0)).toSet
    val exact = Ann.bruteForceTopK(clustered, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    def recallOf(s: Set[Long]) = (exact intersect s).size.toDouble / exact.size
    assert(recallOf(composed) >= recallOf(flat),
      s"composition ${recallOf(composed)} worse than flat ${recallOf(flat)}")
    assert(recallOf(composed) >= 0.9, s"recall ${recallOf(composed)} < 0.9")
    // probing ALL cells with full rerank degenerates to exact
    val all = Pq.ivfAdcTopK(both, "vec_id", "embedding", model, cents,
      q, k = 10, probes = 4, rerank = 160).collect().map(_.getLong(0)).toSet
    assert(all === exact)
  }

  test("IVF x SQ8 at rest: probe PRUNES partitions; candidates and " +
    "rerank match the in-memory composition") {
    val cents = Ann.trainCentroids(clustered, "embedding", 4)
    val model = Pq.sq8Train(clustered, "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_sq8_at_rest").toString + "/codes"
    Pq.writeIvfSq8AtRest(clustered, "vec_id", "embedding", cents, model, dir)
    // the artifact holds codes + id only (8x-smaller hot tier), never
    // the float vectors
    val stored = spark.read.parquet(dir)
    assert(stored.columns.sorted.toSeq === Seq("cell", "sq_code", "vec_id"))
    val q = clustered.where(col("vec_id") === 205L)
      .select(col("embedding")).head().getSeq[Double](0)
    // integer candidate stage at rest == in-memory probe-filtered stage
    val atRest = Pq.ivfSq8CandidatesAtRest(spark, dir, "vec_id", q, model,
      cents, probes = 1, k = 10)
    val probeSet = Ann.probeCells(q, cents, 1)
    val inMem = Pq.sq8IntTopK(
      Pq.withSq8(Ann.withIvfCentroidCell(clustered, "embedding", cents)
        .where(col("cell").isin(probeSet: _*)), "embedding", model),
      "vec_id", q, model, 10)
    assert(atRest.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      inMem.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // the probe predicate must reach the codes scan as a PARTITION
    // filter: 1 of 4 cell directories listed, 3 never opened
    val scans = atRest.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.head.partitionFilters.nonEmpty,
      "probe predicate did not become a partition filter")
    assert(scans.head.selectedPartitions.partitionCount === 1)
    // full serving path (exact rerank joined back to the vectors table):
    // with rerank >= cell population the probed cell's rows are ALL
    // candidates, so the exact rerank returns the cell-restricted exact
    // top-10 — which IS the global top-10 on this data (AnnCentroidSpec
    // shows the query's cluster cell holds every true neighbor). The
    // integer stage's raw-dot magnitude bias therefore cannot cost
    // recall here; its ordering quality is the BASELINE.md recall row's
    // job, not this equivalence spec's.
    val exact = Ann.bruteForceTopK(clustered, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val served = Pq.ivfSq8TopKAtRest(spark, dir, clustered, "vec_id",
      "embedding", q, model, cents, k = 10, probes = 1, rerank = 40)
      .collect().map(_.getLong(0)).toSet
    assert(served === exact)
    // probing ALL cells with full rerank degenerates to exact
    val all = Pq.ivfSq8TopKAtRest(spark, dir, clustered, "vec_id",
      "embedding", q, model, cents, k = 10, probes = 4, rerank = 160)
      .collect().map(_.getLong(0)).toSet
    assert(all === exact)
  }

  test("SQ8: codes bounded, reconstruction within a bin, rerank recalls") {
    val model = Pq.sq8Train(clustered, "embedding")
    assert(model.mins.length == 8)
    val enc = Pq.withSq8(clustered, "embedding", model)
    val rows = enc.select(col("embedding"), col("sq_code")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](0)
      val c = r.getSeq[Int](1)
      assert(c.forall(x => x >= 0 && x <= 255))
      // dequantized bin midpoint sits within one bin of the original
      // (quantizer bins are range/255 wide)
      v.indices.foreach { i =>
        val range = model.maxs(i) - model.mins(i)
        if (range > 0) {
          val deq = model.mins(i) + (c(i) + 0.5) * range / 255.0
          assert(math.abs(deq - v(i)) <= range / 255.0 + 1e-12)
        }
      }
    }
    val q = clustered.where(col("vec_id") === 7)
      .select(col("embedding")).head().getSeq[Double](0)
    // the integer candidate stage ranks by (dequantized) DOT product:
    // every candidate comes from the query's own cluster (ids 0-99 --
    // larger-magnitude same-direction vectors may outrank the query
    // itself; cosine exactness is the rerank stage's job)
    val cand = Pq.sq8IntTopK(enc, "vec_id", q, model, 10).collect()
    assert(cand.map(_.getLong(0)).forall(_ < 100L))
    // exact rerank over a generous over-fetch recovers brute-force top-k
    val exact = Ann.bruteForceTopK(clustered, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val sq = Pq.sq8TopK(clustered, "vec_id", "embedding", q, model,
      k = 10, rerank = 60).collect().map(_.getLong(0)).toSet
    assert((exact intersect sq).size >= 9,
      s"SQ8 recall ${(exact intersect sq).size}/10")
  }
}

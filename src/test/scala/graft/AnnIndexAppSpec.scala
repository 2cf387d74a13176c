package graft

import graft.app.AnnIndexApp

/** Operational IVF x SQ8 index: model round-trips exactly through
  * model.json, and the query path over the loaded model equals the
  * library path with freshly trained parameters.
  */
class AnnIndexAppSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("build + query: loaded model reproduces the library result " +
    "bit-for-bit; model.json round-trips doubles exactly") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ann_index").toString
    val m = AnnIndexApp.build(spark, s"$sf/embeddings.parquet", idx,
      cells = 16, idCol = "vec_id", vecCol = "embedding")
    // JSON round-trip is exact (shortest-round-trip doubles)
    val rt = AnnIndexApp.parseModel(AnnIndexApp.render(m))
    assert(rt.cells === m.cells && rt.dims === m.dims)
    assert(rt.centroids.map(_.toSeq).toSeq === m.centroids.map(_.toSeq).toSeq)
    assert(rt.mins.toSeq === m.mins.toSeq && rt.maxs.toSeq === m.maxs.toSeq)

    val hits = AnnIndexApp.query(spark, s"$sf/embeddings.parquet", idx,
      queryId = 7L, k = 10, probes = 4, rerank = 100)
    assert(hits.size === 10)
    // library path with freshly trained params must agree exactly
    // (training is deterministic)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = graft.llmops.Ann.trainCentroids(emb, "embedding", 16)
    val sq8 = graft.llmops.Pq.sq8Train(emb, "embedding")
    val q = emb.where(org.apache.spark.sql.functions.col("vec_id") === 7L)
      .selectExpr("cast(embedding as array<double>)")
      .head().getSeq[Double](0)
    val lib = graft.llmops.Pq.ivfSq8TopKAtRest(spark, s"$idx/codes", emb,
      "vec_id", "embedding", q, sq8, cents, k = 10, probes = 4,
      rerank = 100).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(hits === lib)
    // self-hit: vec 7 is its own nearest neighbor at cosine 1
    assert(hits.head._1 === 7L)
    assert(math.abs(hits.head._2 - 1.0) < 1e-12)
  }
}

package graft

import graft.app.DedupApp

/** Operational dedup stage runner: every stage lands as a parquet
  * artifact, the stages are mutually consistent, and --resume reuses
  * earlier artifacts instead of recomputing them.
  */
class DedupAppSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("stage artifacts are written and mutually consistent") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_dedup_app").toString
    val cfg = DedupApp.Config(s"$sf/documents.parquet", out)
    val report = DedupApp.run(spark, cfg).toMap

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pairs = spark.read.parquet(s"$out/pairs")
    val clusters = spark.read.parquet(s"$out/clusters")
    val survivors = spark.read.parquet(s"$out/survivors")

    assert(pairs.columns.toSeq ===
      Seq("id_a", "id_b", "jaccard_micro"))
    assert(pairs.count() > 0)
    // every paired id is clustered; cluster count and removal count
    // reconcile with the survivors artifact
    assert(report("n_docs") === docs.count())
    assert(report("n_clustered") === clusters.count())
    assert(report("n_removed") ===
      docs.count() - survivors.count())
    // survivors preserve the full document schema
    assert(survivors.columns.sorted.toSeq === docs.columns.sorted.toSeq)
    // keep-best: within each cluster the surviving member has the max
    // n_chars (min id on ties) — recheck directly against the artifacts
    val surviving = survivors.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val byCluster = clusters.collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._2)
    val chars = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCluster.values.foreach { members =>
      val ids = members.map(_._1).toSeq
      val kept = ids.filter(surviving)
      assert(kept.size === 1, s"cluster $ids kept $kept")
      val best = ids.maxBy(id => (chars(id), -id))
      assert(kept.head === best)
    }
  }

  test("--resume reuses existing artifacts (pairs mtime unchanged)") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_dedup_resume").toString
    val cfg = DedupApp.Config(s"$sf/documents.parquet", out)
    DedupApp.run(spark, cfg)
    def mtime(p: String): Long = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(p))
        .iterator().asScala
        .map(f => java.nio.file.Files.getLastModifiedTime(f).toMillis)
        .max
    }
    val before = mtime(s"$out/pairs")
    Thread.sleep(1100)
    val r2 = DedupApp.run(spark, cfg.copy(resume = true)).toMap
    assert(mtime(s"$out/pairs") === before) // not rewritten
    assert(r2("n_docs") > 0)
  }

  test("flag parsing covers every knob") {
    val c = DedupApp.parse(Array("in.parquet", "/tmp/o",
      "--id-col=id", "--text-col=body", "--score-col=quality",
      "--threshold=0.7", "--shingle=2", "--hashes=16",
      "--band-rows=8", "--resume"))
    assert(c === DedupApp.Config("in.parquet", "/tmp/o", "id", "body",
      "quality", 0.7, 2, 16, 8, resume = true))
  }
}

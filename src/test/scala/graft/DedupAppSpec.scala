package graft

import org.apache.spark.sql.functions._

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

    // a stage whose job never committed (no _SUCCESS marker — e.g. the
    // run was killed mid-write) must be REBUILT on resume, not reused:
    // a partial parquet dir can still expose a readable schema.
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$out/pairs/_SUCCESS"))
    assert(!graft.core.StageIo.committed(spark, s"$out/pairs"))
    Thread.sleep(1100)
    DedupApp.run(spark, cfg.copy(resume = true))
    assert(mtime(s"$out/pairs") > before) // rebuilt
    assert(graft.core.StageIo.committed(spark, s"$out/pairs"))
  }

  test("flag parsing covers every knob") {
    val c = DedupApp.parse(Array("in.parquet", "/tmp/o",
      "--id-col=id", "--text-col=body", "--score-col=quality",
      "--threshold=0.7", "--shingle=2", "--hashes=16",
      "--band-rows=8", "--max-band-pop=64", "--resume",
      "--source-col=src"))
    assert(c === DedupApp.Config("in.parquet", "/tmp/o", "id", "body",
      "quality", 0.7, 2, 16, 8, maxBandPop = 64, resume = true,
      sourceCol = Some("src")))
  }

  test("hot-bucket cap is ON by default: a near-identical corpus " +
    "completes with bounded pairs and one survivor family") {
    import spark.implicits._
    // 3,000 near-identical docs (the shape that put every doc in one
    // LSH bucket and hung the uncapped 2M CLI run this round): with
    // the default cap the candidate volume is bounded by pop x cap and
    // keep-best leaves far fewer survivors than docs
    // 200 distinct shared tokens -> ~200 shared shingles vs ~3
    // doc-specific ones: jaccard ~0.985, every doc in one hot bucket
    val shared = (1 to 200).map(w => s"word$w").mkString(" ")
    val docs = (1L to 3000L).map(i =>
      (i, s"$shared record $i", shared.length.toLong))
      .toDF("doc_id", "text", "n_chars")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dedup_cap").toString
    docs.write.mode("overwrite").parquet(s"$dir/docs")
    val cfg = DedupApp.Config(s"$dir/docs", s"$dir/out")
    val report = DedupApp.run(spark, cfg).toMap
    val pairs = spark.read.parquet(s"$dir/out/pairs").count()
    assert(pairs > 0)
    assert(pairs <= 3000L * cfg.maxBandPop) // bounded, never O(n^2)
    assert(report("n_removed") > 2000L) // the family truly collapses
  }

  test("--source-col lands the overlap/ artifact consistent with " +
    "pairs/ (cell totals reconcile; absent without the flag)") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files
      .createTempDirectory("graft_dedup_overlap").toString
    DedupApp.run(spark, DedupApp.Config(s"$sf/documents.parquet", out,
      sourceCol = Some("source")))
    val pairs = spark.read.parquet(s"$out/pairs")
    val overlap = spark.read.parquet(s"$out/overlap")
    assert(overlap.columns.toSeq ===
      Seq("src_lo", "src_hi", "pair_count", "jaccard_micro_sum"))
    // cells partition the pair set: totals reconcile exactly
    val tot = overlap.agg(sum("pair_count"), sum("jaccard_micro_sum"))
      .head()
    val ptot = pairs.agg(count(lit(1)), sum("jaccard_micro")).head()
    assert(tot.getLong(0) === ptot.getLong(0))
    assert(tot.getLong(1) === ptot.getLong(1))
    // no flag -> no artifact
    val out2 = java.nio.file.Files
      .createTempDirectory("graft_dedup_nooverlap").toString
    DedupApp.run(spark, DedupApp.Config(s"$sf/documents.parquet", out2))
    assert(!new java.io.File(s"$out2/overlap").exists())
  }

  test("--incremental: new snapshot vs prior run artifacts; adding " +
    "docs never un-flags a prior duplicate") {
    import spark.implicits._
    val priorOut = java.nio.file.Files
      .createTempDirectory("graft_dedup_inc_prior").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // full run over the base corpus establishes the retained set
    DedupApp.run(spark, DedupApp.Config(s"$sf/documents.parquet", priorOut))
    val priorSurv = spark.read.parquet(s"$priorOut/survivors")
    val priorIds = priorSurv.select("doc_id").as[Long].collect().toSet
    val removedIds = docs.select("doc_id").as[Long].collect().toSet -- priorIds
    assert(removedIds.nonEmpty) // the base corpus has near-dups

    // new snapshot: one EXACT copy of a retained doc (new id), one
    // NEAR copy (one appended token), and one genuinely novel doc
    val keepOne = priorSurv.orderBy("doc_id").limit(1)
      .select(col("doc_id"), col("text")).head()
    val novelText = "a completely novel document about spark incremental " +
      "dedup with plenty of distinct shingles to call its own"
    val newDocs = Seq(
      (9000001L, keepOne.getString(1), "en", "web"),
      (9000002L, keepOne.getString(1) + " zyx", "en", "web"),
      (9000003L, novelText, "en", "web"),
      // WITHIN-BATCH duplicates of the novel doc: an exact copy and a
      // near copy. Neither is a dup of the PRIOR corpus, so both pass
      // the flags stage clean — the batch self-dedup must catch them
      // (r14 ADVICE: pre-fix, both landed in additions/ forever)
      (9000004L, novelText, "en", "web"),
      (9000005L, novelText + " qqq", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val newPath = java.nio.file.Files
      .createTempDirectory("graft_dedup_inc_new").toString + "/docs"
    newDocs.write.parquet(newPath)

    val incOut = java.nio.file.Files
      .createTempDirectory("graft_dedup_inc_out").toString
    val report = DedupApp.run(spark, DedupApp.Config(newPath, incOut,
      incremental = Some(priorOut))).toMap
    val flags = spark.read.parquet(s"$incOut/flags")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(flags(9000001L)._1) // exact copy flagged dup_exact
    assert(flags(9000002L)._2) // near copy flagged dup_near
    // the three novel-content docs are all clean VS THE PRIOR CORPUS —
    // the within-batch redundancy is invisible to the flags stage
    assert(flags(9000003L) === ((false, false)))
    assert(flags(9000004L) === ((false, false)))
    assert(flags(9000005L) === ((false, false)))
    // ...but the batch self-dedup keeps exactly ONE representative:
    // exact reps collapse {3,4} to 9000003 (equal score, min id), then
    // the near chain collapses {9000003, 9000005} keep-best by n_chars
    // — 9000005 (" qqq" appended) is longer and wins
    assert(report("n_new") === 5L && report("n_added") === 1L)
    assert(report("n_batch_dup") === 2L)

    // monotonicity: the updated survivors = prior retained + the one
    // novel representative; NO doc the prior run removed reappears
    val updated = spark.read.parquet(s"$incOut/survivors")
      .select("doc_id").as[Long].collect().toSet
    assert(updated === priorIds + 9000005L)
    assert(updated.intersect(removedIds).isEmpty)
    assert(report("n_retained") === report("n_prior_retained") + 1L)
  }
}

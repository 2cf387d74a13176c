package graft

import org.apache.spark.sql.functions._
import graft.app.CurateApp

/** Operational curation stage runner: artifacts consistent across
  * stages, the quality cut reproducible from the scored artifact, the
  * shard plan conserving the kept set.
  */
class CurateAppSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("stages are written and mutually consistent; shard plan " +
    "conserves the kept set") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_curate_app").toString
    val cfg = CurateApp.Config(s"$sf/documents.parquet", out,
      minQuality = 0.5, rate = 0.5, shardTokens = Some(8192L))
    val report = CurateApp.run(spark, cfg).toMap

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val scored = spark.read.parquet(s"$out/scored")
    val kept = spark.read.parquet(s"$out/kept")
    val shards = spark.read.parquet(s"$out/shards")

    assert(report("n_docs") === docs.count())
    assert(report("n_scored") === scored.count())
    assert(report("n_kept") === kept.count())
    assert(report("n_kept") > 0 && report("n_kept") < report("n_docs"))
    // the cut is reproducible from the scored artifact: every kept doc
    // clears the integer-micro threshold, every scored-but-dropped one
    // either fails it or fell to the sample
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    scored.select("doc_id", "quality_micro").collect().foreach { r =>
      if (keptIds(r.getLong(0)))
        assert(r.getLong(1) >= 500000L)
    }
    // shard plan covers exactly the kept set, shard ids are dense
    assert(shards.count() === kept.count())
    assert(shards.select("doc_id").distinct().count() === kept.count())
    val ids = shards.select("shard_id").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until report("n_shards")).toSeq)
    // concat-and-cut invariants: every doc STARTS inside its shard
    // (offset in [0, target)), and the shard count equals
    // ceil(total_tokens / target) — docs crossing a boundary belong to
    // the shard where they start, so per-shard full-doc sums may exceed
    // the target by design
    val offs = shards.select("shard_offset").collect().map(_.getLong(0))
    assert(offs.forall(o => o >= 0L && o < 8192L))
    val total = kept.agg(sum("n_chars")).head().getLong(0)
    assert(report("n_shards") === (total + 8191L) / 8192L)
  }

  test("default shard-tokens is the training-sized 16384 (logical " +
    "shard size decoupled from --shard-files) and keeps the packing " +
    "invariants") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_curate_auto").toString
    // defaults: shardTokens = None -> 16384, shardFiles bounds only
    // the PHYSICAL export files, never the logical shard size
    val cfg = CurateApp.Config(s"$sf/documents.parquet", out,
      minQuality = 0.0)
    val report = CurateApp.run(spark, cfg).toMap
    val kept = spark.read.parquet(s"$out/kept")
    val shards = spark.read.parquet(s"$out/shards")
    val total = kept.agg(sum("n_chars")).head().getLong(0)
    val target = CurateApp.resolveShardTokens(cfg)
    assert(target === CurateApp.DefaultShardTokens)
    // the resolved target must reproduce the artifact exactly, and a
    // tiny --shard-files must NOT inflate the logical shard size
    assert(CurateApp.resolveShardTokens(cfg.copy(shardFiles = 2))
      === CurateApp.DefaultShardTokens)
    assert(report("n_shards") === (total + target - 1) / target)
    assert(shards.count() === kept.count())
    // non-export run: kept keeps its narrow schema (no shard cols)
    assert(!kept.columns.contains("shard_id"))
    val offs = shards.select("shard_offset").collect().map(_.getLong(0))
    assert(offs.forall(o => o >= 0L && o < target))
    val ids = shards.select("shard_id").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until report("n_shards")).toSeq)
  }

  test("--export materializes bounded physical shards: whole shards " +
    "per file, in-file (shard_id, shard_offset) order, full " +
    "conservation") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_curate_export").toString
    val cfg = CurateApp.Config(s"$sf/documents.parquet", out,
      minQuality = 0.0, shardTokens = Some(4096L), shardFiles = 7,
      export = true)
    val report = CurateApp.run(spark, cfg).toMap
    val kept = spark.read.parquet(s"$out/kept")
    val export = spark.read.parquet(s"$out/export")
    // r20 A/B: the narrow plan + doc_id join stays (folding shard
    // assignment into kept measured net slower at 8M) — kept keeps
    // its narrow schema in export mode too
    assert(!kept.columns.contains("shard_id"))
    // conservation: every kept doc exported exactly once, text intact
    assert(export.count() === kept.count())
    assert(export.select("doc_id").distinct().count() === kept.count())
    assert(export.join(kept.select("doc_id", "text"), Seq("doc_id"))
      .where(export("text") =!= kept("text")).count() === 0L)
    // bounded file count; whole shards per file; in-file pack order
    val files = new java.io.File(s"$out/export").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length <= 7)
    assert(report("n_shards") > 7,
      "fixture must plan more shards than files to prove grouping")
    val shardToFile = scala.collection.mutable.Map.empty[Long, String]
    files.foreach { f =>
      val rows = spark.read.parquet(f)
        .select("shard_id", "shard_offset").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // sorted by (shard_id, shard_offset) within the file
      assert(rows.toSeq == rows.toSeq.sorted)
      rows.map(_._1).distinct.foreach { sid =>
        assert(!shardToFile.contains(sid) || shardToFile(sid) == f,
          s"shard $sid split across files")
        shardToFile(sid) = f
      }
    }
  }

  test("rate=1.0 skips sampling; benchmark decontamination drops " +
    "contaminated docs") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_curate_bench").toString
    // benchmark = the texts of 5 high-quality docs -> those docs (at
    // least) must disappear from kept
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val scoredAll = graft.llmops.TextAnalysis.withQuality(docs, "text")
      .where(floor(col("quality_score") * 1000000) >= 500000L)
    val benchIds = scoredAll.select("doc_id").limit(5)
      .collect().map(_.getLong(0)).toSet
    val benchPath = s"$out/benchmark.parquet"
    docs.where(col("doc_id").isin(benchIds.toSeq: _*))
      .select("text").write.parquet(benchPath)
    val cfg = CurateApp.Config(s"$sf/documents.parquet", out,
      benchmark = Some(benchPath), minQuality = 0.5, rate = 1.0)
    CurateApp.run(spark, cfg)
    val keptIds = spark.read.parquet(s"$out/kept").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(benchIds.intersect(keptIds).isEmpty,
      s"contaminated docs survived: ${benchIds.intersect(keptIds)}")
  }
}

package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-command curation pipeline: DedupApp then CurateApp (which ends in
  * the shard-export plan) as a single run sharing ONE manifest —
  *
  *   <outDir>/manifest.jsonl   one line per completed top-level stage:
  *                             {"stage","params","input","out","status"}
  *   <outDir>/dedup/           pairs/ clusters/ survivors/ report/
  *   <outDir>/curate/          scored/ kept/ shards/ report/
  *
  * Resume semantics (`--resume`) are two-level:
  *  - a top-level stage is skipped wholesale iff the manifest records it
  *    done WITH IDENTICAL params+input AND every artifact directory has
  *    its `_SUCCESS` marker (so a manifest from a different
  *    configuration, or artifacts from a run killed mid-write, are never
  *    silently reused — changing any knob invalidates the stage);
  *  - a stage that is not skippable reruns with intra-stage resume, so
  *    its own committed sub-artifacts ([[graft.core.StageIo]]) are kept
  *    and only the incomplete tail is rebuilt.
  * The manifest line is appended ONLY after the stage's artifacts are
  * fully committed, via write-temp + ATOMIC_MOVE — a kill at any point
  * leaves either no line (stage reruns, sub-stages resume) or a
  * complete line over complete artifacts.
  *
  *   runMain graft.app.PipelineApp <documentsParquet> <outDir>
  *     [dedup: --id-col= --text-col= --score-col= --threshold=
  *      --shingle= --hashes= --band-rows= --source-col=]
  *     [curate: --benchmark= --min-quality= --rate= --shard-tokens=
  *      --epoch=] [--resume]
  */
object PipelineApp {

  final case class Config(docs: String, outDir: String,
      dedup: DedupApp.Config, curate: CurateApp.Config,
      resume: Boolean)

  def parse(args: Array[String]): Config = {
    require(args.length >= 2,
      "usage: PipelineApp <documentsParquet> <outDir> [stage flags] [--resume]")
    val docs = args(0); val outDir = args(1)
    val d = DedupApp.parse(Array(docs, s"$outDir/dedup") ++
      args.drop(2).filterNot(f => Seq("--benchmark=", "--min-quality=",
        "--rate=", "--shard-tokens=", "--epoch=").exists(f.startsWith)))
    val c = CurateApp.parse(Array(s"$outDir/dedup/survivors",
      s"$outDir/curate") ++ args.drop(2).filter(f =>
      Seq("--benchmark=", "--min-quality=", "--rate=", "--shard-tokens=",
        "--epoch=", "--resume").exists(f.startsWith)))
    Config(docs, outDir, d, c, resume = args.contains("--resume"))
  }

  /** Canonical parameter strings — strict string equality decides
    * whether a manifest entry still matches the requested run.
    */
  def dedupParams(c: DedupApp.Config): String =
    s"id=${c.idCol};text=${c.textCol};score=${c.scoreCol};" +
      s"thr=${c.threshold};sh=${c.shingleN};k=${c.k};br=${c.bandRows};" +
      s"src=${c.sourceCol.getOrElse("-")}"
  def curateParams(c: CurateApp.Config): String =
    s"bench=${c.benchmark.getOrElse("-")};minq=${c.minQuality};" +
      s"rate=${c.rate};shard=${c.shardTokens};epoch=${c.epoch}"

  def manifestPath(outDir: String): java.nio.file.Path =
    java.nio.file.Paths.get(outDir, "manifest.jsonl")

  /** stage -> (params, input, status) for every stage the manifest
    * mentions ("started" or "done"). Minimal fixed-shape field
    * extraction (zero-dependency rule, same approach as
    * AnnIndexApp.parseModel).
    */
  def readManifest(outDir: String): Map[String, (String, String, String)] = {
    val p = manifestPath(outDir)
    if (!java.nio.file.Files.exists(p)) return Map.empty
    def field(line: String, name: String): Option[String] = {
      val k = s""""$name":""""
      val i = line.indexOf(k)
      if (i < 0) None
      else {
        val start = i + k.length
        val end = line.indexOf('"', start)
        if (end < 0) None else Some(line.substring(start, end))
      }
    }
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(p)).asScala
      .flatMap { line =>
        (field(line, "stage"), field(line, "params"), field(line, "input"),
          field(line, "status")) match {
          case (Some(s), Some(pr), Some(in), Some(st)) =>
            Some(s -> (pr, in, st))
          case _ => None
        }
      }.toMap
  }

  /** Upsert a stage line atomically: rewrite the whole manifest to a
    * temp file and ATOMIC_MOVE over the old one, so a kill during the
    * write can never leave a torn line for a later resume to misread.
    */
  def record(outDir: String, stage: String, params: String,
      input: String, out: String, status: String): Unit = {
    val p = manifestPath(outDir)
    java.nio.file.Files.createDirectories(p.getParent)
    val existing =
      if (java.nio.file.Files.exists(p))
        scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(p)).asScala.toSeq
          .filterNot(_.contains(s""""stage":"$stage""""))
      else Seq.empty
    val line = s"""{"stage":"$stage","params":"$params","input":"$input",""" +
      s""""out":"$out","status":"$status"}"""
    val tmp = p.resolveSibling(s".manifest.${System.nanoTime()}.tmp")
    java.nio.file.Files.write(tmp,
      scala.jdk.CollectionConverters.SeqHasAsJava(existing :+ line).asJava)
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** True iff the manifest records `stage` DONE with identical
    * params+input AND every listed artifact committed (`_SUCCESS`).
    */
  def skippable(spark: SparkSession, outDir: String, stage: String,
      params: String, input: String, artifacts: Seq[String]): Boolean =
    readManifest(outDir).get(stage)
      .contains((params, input, "done")) &&
      artifacts.forall(a => graft.core.StageIo.committed(spark, a))

  /** Run (or resume) the full pipeline. Returns the combined report
    * rows, prefixed per stage.
    */
  def run(spark: SparkSession, cfg: Config): Seq[(String, Long)] = {
    if (!cfg.resume) { // fresh run: a stale manifest must not gate skips
      java.nio.file.Files.deleteIfExists(manifestPath(cfg.outDir))
    }
    val dedupOut = s"${cfg.outDir}/dedup"
    val dedupCfg = cfg.dedup.copy(docs = cfg.docs, outDir = dedupOut,
      resume = cfg.resume)
    val dp = dedupParams(dedupCfg)
    val dedupArts = (Seq("pairs", "clusters", "survivors", "report") ++
      dedupCfg.sourceCol.map(_ => "overlap").toSeq).map(a => s"$dedupOut/$a")
    // intra-stage resume is granted only when the manifest's STARTED (or
    // done) record carries the same params+input — sub-artifacts written
    // under different knobs must be rebuilt, not resumed over
    def innerResume(stage: String, params: String, input: String): Boolean =
      cfg.resume && readManifest(cfg.outDir).get(stage)
        .exists { case (p, i, _) => p == params && i == input }
    if (!skippable(spark, cfg.outDir, "dedup", dp, cfg.docs, dedupArts)) {
      val r = innerResume("dedup", dp, cfg.docs)
      record(cfg.outDir, "dedup", dp, cfg.docs, dedupOut, "started")
      DedupApp.run(spark, dedupCfg.copy(resume = r))
      record(cfg.outDir, "dedup", dp, cfg.docs, dedupOut, "done")
    }

    val curateOut = s"${cfg.outDir}/curate"
    val curateCfg = cfg.curate.copy(docs = s"$dedupOut/survivors",
      outDir = curateOut, resume = cfg.resume)
    val cp = curateParams(curateCfg)
    val curateArts = Seq("scored", "kept", "shards", "report")
      .map(a => s"$curateOut/$a")
    // curate's input identity includes the dedup params that produced
    // the survivors — a dedup re-run must invalidate downstream even
    // though the path string is unchanged
    val curateInput = s"$dedupOut/survivors@$dp"
    if (!skippable(spark, cfg.outDir, "curate", cp, curateInput,
        curateArts)) {
      val r = innerResume("curate", cp, curateInput)
      record(cfg.outDir, "curate", cp, curateInput, curateOut, "started")
      CurateApp.run(spark, curateCfg.copy(resume = r))
      record(cfg.outDir, "curate", cp, curateInput, curateOut, "done")
    }

    def reportOf(path: String, prefix: String): Seq[(String, Long)] = {
      val df = spark.read.parquet(path)
      val r = df.head()
      df.schema.fieldNames.toSeq.map(n => s"$prefix$n" -> r.getAs[Long](n))
    }
    reportOf(s"$dedupOut/report", "dedup_") ++
      reportOf(s"$curateOut/report", "curate_")
  }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val report = run(spark, cfg)
    println("[pipeline] manifest " + manifestPath(cfg.outDir) +
      "; artifacts under " + cfg.outDir + "/{dedup,curate}/")
    report.foreach { case (k, v) => println(f"[pipeline] $k%-24s $v") }
    spark.stop()
  }
}

package graft.embed

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Snapshot create/list/restore for the vectors table (reference S9:
  * repo_qdrant.ml:262-342 wraps the Qdrant snapshot API + a local journal).
  * Here the "index" is a parquet table, so snapshots are versioned output
  * directories (`vectors/v=N/`) plus a newline-JSON manifest -- atomic by
  * directory rename semantics of the parquet committer.
  */
object Snapshots {

  final case class Snapshot(version: Int, rows: Long, createdAtMs: Long)

  private def manifestPath(baseDir: String) =
    Paths.get(baseDir, "snapshots.jsonl")

  def create(vectors: DataFrame, baseDir: String): Snapshot = {
    val versions = list(baseDir).map(_.version)
    val next = if (versions.isEmpty) 1 else versions.max + 1
    vectors.write.mode("errorifexists").parquet(s"$baseDir/v=$next")
    val rows = vectors.sparkSession.read.parquet(s"$baseDir/v=$next").count()
    val snap = Snapshot(next, rows, System.currentTimeMillis())
    Files.createDirectories(Paths.get(baseDir))
    Files.write(manifestPath(baseDir),
      s"""{"version":${snap.version},"rows":${snap.rows},"created_at_ms":${snap.createdAtMs}}\n"""
        .getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    snap
  }

  def list(baseDir: String): Seq[Snapshot] = {
    val p = manifestPath(baseDir)
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map { line =>
      def field(k: String): String =
        line.split(s""""$k":""")(1).takeWhile(c => c.isDigit)
      Snapshot(field("version").toInt, field("rows").toLong,
        field("created_at_ms").toLong)
    }
  }

  /** Latest (or a specific) snapshot as a DataFrame. */
  def restore(spark: SparkSession, baseDir: String,
      version: Option[Int] = None): DataFrame = {
    val snaps = list(baseDir)
    require(snaps.nonEmpty, s"no snapshots under $baseDir")
    val v = version.getOrElse(snaps.map(_.version).max)
    spark.read.parquet(s"$baseDir/v=$v")
  }
}

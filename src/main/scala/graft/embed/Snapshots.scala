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
    // Next version = past BOTH the journal and any landed v-dir: a
    // writer that crashed after landing v=N but before the journal
    // append (or whose tail line was torn) leaves a dir the journal
    // does not know about, and re-picking N would abort on the
    // errorifexists write below.
    val journaled = list(baseDir).map(_.version)
    val landed = Option(Paths.get(baseDir).toFile.listFiles())
      .getOrElse(Array())
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .flatMap(f => f.getName.stripPrefix("v=").toIntOption)
    val next = (journaled ++ landed).maxOption.getOrElse(0) + 1
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
    else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).flatMap {
      line =>
        // A writer that died mid-append leaves one torn line at the
        // tail; a journal parser that throws on it would brick every
        // later create/list/restore. Skip what does not parse -- the
        // torn line's version was never published (_CURRENT moves
        // after the journal append), so dropping it loses nothing.
        def field(k: String): Option[String] =
          line.split(s""""$k":""") match {
            case Array(_, rest) =>
              Some(rest.takeWhile(_.isDigit)).filter(_.nonEmpty)
            case _ => None
          }
        for {
          v <- field("version")
          r <- field("rows")
          c <- field("created_at_ms")
        } yield Snapshot(v.toInt, r.toLong, c.toLong)
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

  // --- atomic commit pointer (snapshot-isolated reads) ----------------
  // The journal above records history; it does NOT give readers isolation
  // from an in-flight write (a reader picking "max version" can catch a
  // version whose parquet files are still landing). The fix is the
  // standard manifest-pointer pattern: data lands fully under v=N, THEN a
  // one-line _CURRENT file is atomically moved into place. Readers
  // resolve _CURRENT and only ever see fully-committed versions; a
  // crashed writer leaves an unpublished v-dir that vacuum() collects.

  private def currentPath(baseDir: String) = Paths.get(baseDir, "_CURRENT")

  /** Write `df` as the next version and atomically publish it. Returns
    * the published snapshot. Single-writer (the engine's batch model);
    * readers need no coordination.
    */
  def commit(df: DataFrame, baseDir: String): Snapshot = {
    val snap = create(df, baseDir) // data fully lands under v=N first
    val tmp = Paths.get(baseDir, s"_CURRENT.tmp${snap.version}")
    Files.write(tmp, s"${snap.version}\n".getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, currentPath(baseDir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    snap
  }

  /** The committed version readers should use, if any. */
  def currentVersion(baseDir: String): Option[Int] = {
    val p = currentPath(baseDir)
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p), "UTF-8").trim.toInt)
  }

  /** Read the committed snapshot -- never an in-flight one. */
  def readCurrent(spark: SparkSession, baseDir: String): DataFrame = {
    val v = currentVersion(baseDir).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $baseDir"))
    spark.read.parquet(s"$baseDir/v=$v")
  }

  /** Compact the CURRENT snapshot into a new committed version: read
    * v=cur, coalesce to ~targetFileBytes files, land as v=cur+1, flip
    * the pointer atomically. Unlike an in-place rename-swap
    * (core/Compact.compactDir), readers NEVER observe a swap window --
    * anyone resolving _CURRENT sees either the old fully-committed
    * version or the new one, and vacuum() reclaims superseded versions
    * later (the Delta/Iceberg rewrite pattern on plain parquet).
    */
  def compactCurrent(spark: SparkSession, baseDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Snapshot = {
    require(targetFileBytes > 0)
    val v = currentVersion(baseDir).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $baseDir"))
    val dir = new org.apache.hadoop.fs.Path(s"$baseDir/v=$v")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(dir)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    // coalesce, not repartition: merging files needs no shuffle
    commit(spark.read.parquet(dir.toString).coalesce(nOut), baseDir)
  }

  /** Delete version dirs that are (a) unpublished leftovers of crashed
    * writers (newer than _CURRENT) or (b) older than the `keep` most
    * recent committed versions. Never touches _CURRENT's target.
    */
  def vacuum(baseDir: String, keep: Int = 2): Seq[Int] = {
    require(keep >= 1)
    val cur = currentVersion(baseDir) match {
      case Some(c) => c
      case None => return Seq.empty // nothing published: can't tell a
        // crashed leftover from a first write in flight -- touch nothing
    }
    // the journal records CREATED versions; only those at or below the
    // pointer were ever published
    val published = list(baseDir).map(_.version).filter(_ <= cur).sorted
    val keepSet = (published.takeRight(keep) :+ cur).toSet
    val dirs = Option(Paths.get(baseDir).toFile.listFiles()).getOrElse(Array())
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(f => f.getName.stripPrefix("v=").toInt)
    // everything else is superseded history (< cur, outside the keep
    // window) or an unpublished crashed-writer leftover (> cur)
    val doomed = dirs.filter(v => !keepSet.contains(v)).sorted
    doomed.foreach { v =>
      val d = Paths.get(baseDir, s"v=$v")
      val walk = Files.walk(d)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally walk.close()
    }
    doomed.toSeq
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.app.WorkerApp
import graft.embed.{DeterministicEmbedder, Embedder}
import graft.ingest.IngestJob

/** E7 — worker drain loop over the derived job queue (reference
  * services/embedding_worker/embedding_worker.ml): batch claims,
  * incremental progress, failure ledger, empty-poll exit, and
  * drain ≡ one-shot build parity.
  */
class WorkerAppSpec extends SparkSpec {

  private def freshTables(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_worker").toString
    import spark.implicits._
    val files = spark.createDataset(graft.core.Fixtures.all)
    val t = IngestJob.tables(spark, IngestJob.gamesFromText(spark, files))
    IngestJob.write(t, dir)
    dir
  }

  test("drain embeds everything in batch-size increments, then exits " +
    "after the empty streak") {
    val dir = freshTables()
    val nIds = spark.read.parquet(s"$dir/positions")
      .select("vector_id").distinct().count()
    assert(nIds > 30)
    val s = WorkerApp.drain(spark, dir, batchSize = 16,
      embedder = DeterministicEmbedder(16), exitAfterEmpty = Some(2))
    assert(s.processed === nIds)
    assert(s.failed === 0)
    assert(s.emptyPolls === 2)
    // ceil(nIds / 16) busy polls + the 2 empty exit polls
    assert(s.polls === ((nIds + 15) / 16 + 2))
    assert(s.fenChars > 0)
    // queue fully drained; vectors cover every position row
    assert(WorkerApp.pending(spark, dir).count() === 0)
    val vectors = spark.read.parquet(s"$dir/vectors")
    assert(vectors.count() ===
      spark.read.parquet(s"$dir/positions").count())
    // drain ≡ one-shot build: same vector_id set, 16-dim embeddings
    assert(vectors.select("vector_id").distinct().count() === nIds)
    assert(vectors.selectExpr("size(embedding)").distinct().head()
      .getInt(0) === 16)
  }

  test("a second drain is a no-op (idempotent against the sinks)") {
    val dir = freshTables()
    WorkerApp.drain(spark, dir, batchSize = 64,
      embedder = DeterministicEmbedder(16), exitAfterEmpty = Some(1))
    val before = spark.read.parquet(s"$dir/vectors").count()
    val s2 = WorkerApp.drain(spark, dir, batchSize = 64,
      embedder = DeterministicEmbedder(16), exitAfterEmpty = Some(1))
    assert(s2.processed === 0)
    assert(s2.polls === 1 && s2.emptyPolls === 1)
    assert(spark.read.parquet(s"$dir/vectors").count() === before)
  }

  test("failed embeddings land in the ledger and are not re-claimed") {
    val dir = freshTables()
    // embedder that fails on fens whose md5 vector_id starts with a
    // hex digit < '4' (deterministic ~25% failure subset)
    val failing: Embedder = new Embedder {
      val dims = 16
      private val ok = DeterministicEmbedder(16)
      def embed(fen: String): Array[Double] =
        if (graft.chess.Fen.hash(fen).head < '4') null else ok.embed(fen)
      def embedCol(text: org.apache.spark.sql.Column)
          : org.apache.spark.sql.Column =
        udf((s: String) => embed(s)).apply(text)
    }
    val s = WorkerApp.drain(spark, dir, batchSize = 16,
      embedder = failing, exitAfterEmpty = Some(1))
    val failures = spark.read.parquet(s"$dir/vector_failures")
    assert(failures.count() > 0)
    assert(failures.columns.contains("last_error"))
    assert(s.failed === failures.count())
    // failed ids are excluded from the derived queue (reference
    // status='failed' rows are not re-claimed)
    assert(WorkerApp.pending(spark, dir).count() === 0)
    // vectors and failures partition the distinct-fen universe
    val nIds = spark.read.parquet(s"$dir/positions")
      .select("vector_id").distinct().count()
    val done = spark.read.parquet(s"$dir/vectors")
      .select("vector_id").distinct().count()
    assert(done + failures.select("vector_id").distinct().count() === nIds)
  }

  test("a stuck claim (orphan positions, no games row) exits via the " +
    "empty streak instead of livelocking") {
    val dir = freshTables()
    import spark.implicits._
    // positions whose game_id has no games row: buildWithLedger's
    // payload join drops them, so they yield neither a vectors row nor
    // a failures row and stay pending forever — the re-claim is
    // byte-identical every poll
    val template = spark.read.parquet(s"$dir/positions").limit(1).collect()(0)
    val orphan = Seq(("no_such_game", 1, 1, "white", "e4",
      template.getString(template.fieldIndex("fen")) + " orphan",
      false, "00_orphan_vector_id"))
      .toDF("game_id", "ply", "move_number", "side_to_move", "san",
        "fen", "fen_valid", "vector_id")
    orphan.write.mode("append").parquet(s"$dir/positions")
    val s = WorkerApp.drain(spark, dir, batchSize = 16,
      embedder = DeterministicEmbedder(16), exitAfterEmpty = Some(2),
      maxPolls = 200)
    // terminated well before the maxPolls backstop: the identical
    // re-claim was counted into the empty streak
    assert(s.polls < 200)
    assert(s.emptyPolls >= 2)
    // the orphan id is still pending (honest: it was never embedded)
    val left = WorkerApp.pending(spark, dir)
      .select("vector_id").collect().map(_.getString(0)).toSeq
    assert(left === Seq("00_orphan_vector_id"))
    // processed stays bounded: every real position counted once, plus
    // at most one orphan-claim slot per busy poll (the endless no-op
    // re-claim polls no longer accumulate into it)
    val nReal = spark.read.parquet(s"$dir/positions")
      .where(col("game_id") =!= "no_such_game")
      .select("vector_id").distinct().count()
    assert(s.processed >= nReal && s.processed <= nReal + s.polls)
  }

  test("metrics file rewritten in the reference worker's format") {
    val dir = freshTables()
    val mpath = java.nio.file.Files
      .createTempFile("graft_worker_metrics", ".prom").toString
    WorkerApp.drain(spark, dir, batchSize = 64,
      embedder = DeterministicEmbedder(16), exitAfterEmpty = Some(1),
      metricsPath = Some(mpath))
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(mpath))
    assert(lines.size === 4)
    assert(lines.get(0).startsWith("embedding_jobs_processed_total "))
    assert(lines.get(0).split(' ')(1).toLong > 0)
    assert(lines.get(1) === "embedding_jobs_failed_total 0")
    assert(lines.get(2).startsWith("embedding_worker_jobs_per_min "))
    assert(lines.get(3)
      .startsWith("embedding_worker_characters_per_sec "))
  }
}

package graft.embed

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build the denormalized `vectors` table: one row per position, carrying
  * the embedding plus the payload the reference stores in Qdrant
  * (repo_postgres_caqti.ml:640-698, embedding_worker.ml:250-256).
  *
  * Scale design:
  *   - Embedding is computed once per DISTINCT fen (content-addressed by
  *     vector_id = md5(fen)) then joined back -- the reference's in-memory
  *     embeddings cache (embeddings_cache.ml) expressed as dedup+join.
  *     Identical positions across millions of games (openings!) collapse.
  *   - the positions->games join shuffles on game_id, which downstream
  *     consumers reuse; the player dimension joins without a forced
  *     broadcast (AQE decides from runtime size).
  *   - Incremental runs: anti-join on vector_id against the existing
  *     vectors table replaces the reference's job queue (0001_init.sql
  *     embedding_jobs + FOR UPDATE SKIP LOCKED claim).
  */
object VectorsJob {

  /** Game phase from ply (engine extension: the reference leaves position
    * tags empty at ingest and fills them from annotations later; a
    * deterministic ply-derived phase keeps the phase/theme filter path
    * exercisable end-to-end).
    */
  def phaseCol(ply: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(ply <= 20, "opening").when(ply <= 60, "middlegame")
      .otherwise("endgame")

  /** vectors + the E6 failure ledger (reference 0001_init.sql:61-73
    * embedding_jobs.attempts/last_error, repo_postgres_caqti.ml:450-457):
    * rows whose embedding comes back invalid are EXCLUDED from vectors
    * and recorded as (vector_id, fen_preview, attempts, last_error) --
    * the embed analog of IngestJob's `issues` frame. `attempts` is the
    * backend-side retry budget (E3's Retry runs inside the embedder
    * call); a row still invalid after that lands here rather than
    * vanishing.
    */
  final case class Result(vectors: DataFrame, failures: DataFrame)

  def buildWithLedger(spark: SparkSession, games: DataFrame,
      players: DataFrame, positions: DataFrame,
      embedder: Embedder = DeterministicEmbedder(),
      existing: Option[DataFrame] = None,
      attempts: Int = graft.core.Retry.Policy().maxAttempts): Result = {

    // E8: embed once per distinct fen; cache-as-dedup.
    val todo = positions.select("vector_id", "fen").dropDuplicates("vector_id")
    val fresh = existing match {
      case Some(ex) => todo.join(ex.select("vector_id"), Seq("vector_id"),
        "left_anti")
      case None => todo
    }
    // Embedding + validity computed in ONE compiled pass. A column-level
    // `when` chain over the embedding expression is the documented
    // expression-re-evaluation hazard: Catalyst pushes the error filter
    // through the projection by substituting the whole embedding tree
    // into every reference, re-running the embedder ~5x per row. The UDF
    // returns struct(embedding float[], last_error) and is marked
    // non-deterministic so the optimizer can neither duplicate it into
    // filter predicates nor collapse it into multi-reference projections
    // (it IS deterministic; the flag is an evaluate-once barrier).
    val dims = embedder.dims
    val embedOnce = udf((fen: String) => {
      val e = embedder.embed(fen)
      val f =
        if (e == null) null
        else {
          val a = new Array[Float](e.length)
          var i = 0
          while (i < e.length) { a(i) = e(i).toFloat; i += 1 }
          a
        }
      val err =
        if (f == null) "null_embedding"
        else if (f.length == 0) "empty_embedding"
        else if (f.length != dims) "wrong_dims"
        else {
          var bad = false
          var i = 0
          while (i < f.length && !bad) {
            val v = f(i)
            if (java.lang.Float.isNaN(v) || java.lang.Float.isInfinite(v))
              bad = true
            i += 1
          }
          if (bad) "non_finite_values" else null
        }
      (f, err)
    }).asNondeterministic()

    val embeddedAll = fresh.withColumn("__e", embedOnce(col("fen")))
    val failures = embeddedAll
      .where(col("__e._2").isNotNull)
      .select(col("vector_id"), substring(col("fen"), 1, 120).as("fen_preview"),
        lit(attempts).as("attempts"), col("__e._2").as("last_error"))
    val embedded = embeddedAll
      .where(col("__e._2").isNull)
      .withColumn("embedding", col("__e._1"))

    val w = players.select(col("id").as("white_player_id"),
      col("name").as("white"))
    val b = players.select(col("id").as("black_player_id"),
      col("name").as("black"))

    // E4 payload join: positions x games x players(x2). No forced
    // broadcast on the player dimension (unbounded at design scale);
    // AQE broadcasts when the runtime size allows.
    val payload = positions
      .join(games.select("game_id", "white_player_id", "black_player_id",
        "opening_slug", "opening_name", "eco_code", "result",
        "white_rating", "black_rating"), Seq("game_id"))
      .join(w, Seq("white_player_id"), "left")
      .join(b, Seq("black_player_id"), "left")
      .select(
        col("vector_id"), col("game_id"), col("ply"), col("san"),
        col("side_to_move"), col("fen"),
        array(phaseCol(col("ply"))).as("phases"),
        // I7 theme features over the position SAN + any annotation tags;
        // fixture corpus has no annotations so this is usually empty
        // (parity: reference positions start with empty tags too).
        graft.chess.PositionFeatures.themesCol(array(col("san")))
          .as("themes"),
        array().cast("array<string>").as("keywords"),
        col("opening_slug"), col("opening_name"),
        col("eco_code").as("eco"), col("result"),
        col("white_rating").as("white_elo"),
        col("black_rating").as("black_elo"),
        col("white"), col("black"))

    Result(
      payload.join(embedded.select("vector_id", "embedding"), Seq("vector_id")),
      failures)
  }

  /** vectors only (failed embeds dropped; use [[buildWithLedger]] to also
    * collect the failure ledger).
    */
  def build(spark: SparkSession, games: DataFrame, players: DataFrame,
      positions: DataFrame, embedder: Embedder = DeterministicEmbedder(),
      existing: Option[DataFrame] = None): DataFrame =
    buildWithLedger(spark, games, players, positions, embedder,
      existing).vectors

  def write(vectors: DataFrame, outDir: String): Unit =
    vectors.write.mode("overwrite").parquet(s"$outDir/vectors")

  def writeFailures(failures: DataFrame, outDir: String): Unit =
    failures.write.mode("overwrite").parquet(s"$outDir/vector_failures")
}

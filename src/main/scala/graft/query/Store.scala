package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small store-access helpers mirroring reference repo operators that are
  * not part of the hybrid DAG itself.
  */
object Store {

  /** R5: PGN batch fetch by id list (repo_postgres_caqti.ml:346-363) --
    * `isin` for small lists (pushed to the scan), broadcast join past the
    * literal-size threshold.
    */
  def fetchGamePgns(games: DataFrame, ids: Seq[String]): DataFrame = {
    val distinctIds = ids.distinct
    if (distinctIds.size <= 1000)
      games.where(col("game_id").isin(distinctIds: _*))
        .select("game_id", "pgn")
    else {
      val s = games.sparkSession
      import s.implicits._
      games.join(broadcast(distinctIds.toDF("game_id")), Seq("game_id"))
        .select("game_id", "pgn")
    }
  }

  /** R7/I8: un-embedded position count (the batch replacement for the
    * pending-jobs scalar + ingest queue guard, ingest_command.ml:15-44).
    */
  def pendingEmbeddingCount(positions: DataFrame,
      vectors: Option[DataFrame]): Long = vectors match {
    case None => positions.select("vector_id").distinct().count()
    case Some(v) => positions.select("vector_id").distinct()
      .join(v.select("vector_id").distinct(), Seq("vector_id"), "left_anti")
      .count()
  }

  /** I8 guard: throw if the un-embedded backlog exceeds the cap (default
    * 250k, CHESSMATE_MAX_PENDING_EMBEDDINGS).
    */
  def assertBacklogUnder(positions: DataFrame, vectors: Option[DataFrame],
      cap: Long = 250000): Long = {
    val pending = pendingEmbeddingCount(positions, vectors)
    require(pending <= cap,
      s"embedding backlog $pending exceeds cap $cap; run the embed stage first")
    pending
  }
}

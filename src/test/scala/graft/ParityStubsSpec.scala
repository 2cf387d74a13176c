package graft

import graft.chess.PositionFeatures
import graft.core.Sanitizer
import graft.query.{CircuitBreaker, QueryIntent, Store}

/** Specs for the smaller parity operators: I7 themes, P8 sanitizer,
  * A5 circuit breaker, R5/R7 store helpers, R1 vector_only.
  */
class ParityStubsSpec extends SparkSpec {

  test("position features: substring tag -> theme (I7)") {
    assert(PositionFeatures.themesOfTags(Seq("strong Kingside Attack brewing"))
      == Seq("king_attack"))
    assert(PositionFeatures.themesOfTags(
      Seq("queenside pawn majority", "central break!"))
      == Seq("queenside_majority", "central_break"))
    assert(PositionFeatures.themesOfTags(Seq("quiet move")).isEmpty)
  }

  test("sanitizer redacts secrets and url userinfo (P8)") {
    assert(Sanitizer.sanitize("api_key=sk-12345 rest") ==
      "api_key=[REDACTED] rest")
    assert(Sanitizer.sanitize("Authorization: Bearer abc.def") ==
      "Authorization: Bearer [REDACTED]")
    assert(Sanitizer.sanitize("postgres://user:pw@host/db") ==
      "postgres://[REDACTED]@host/db")
    assert(Sanitizer.sanitize("plain text") == "plain text")
  }

  test("circuit breaker: threshold opens, cool-off half-opens (A5)") {
    var clock = 0L
    val cb = new CircuitBreaker(threshold = 3, cooloffMs = 100,
      now = () => clock)
    assert(cb.shouldAllow && cb.state == "closed")
    (1 to 3).foreach(_ => cb.recordFailure())
    assert(!cb.shouldAllow && cb.state == "open")
    clock = 150
    assert(cb.shouldAllow && cb.state == "half_open")
    cb.recordFailure() // half-open failure re-opens
    assert(!cb.shouldAllow)
    clock = 300
    cb.recordSuccess()
    assert(cb.shouldAllow && cb.state == "closed")
  }

  private lazy val tables = {
    import spark.implicits._
    val files = spark.createDataset(graft.core.Fixtures.all)
    graft.ingest.IngestJob.tables(spark,
      graft.ingest.IngestJob.gamesFromText(spark, files))
  }

  test("store: fetch PGNs by id list (R5) and pending count (R7/I8)") {
    val ids = tables.games.select("game_id").collect().map(_.getString(0))
    val pgns = Store.fetchGamePgns(tables.games, ids.toSeq :+ ids.head)
    assert(pgns.count() == 3)
    assert(Store.pendingEmbeddingCount(tables.positions, None) ==
      tables.positions.select("vector_id").distinct().count())
    val v = graft.embed.VectorsJob.build(spark, tables.games, tables.players,
      tables.positions, graft.embed.DeterministicEmbedder(8))
    assert(Store.pendingEmbeddingCount(tables.positions, Some(v)) == 0)
    assert(Store.assertBacklogUnder(tables.positions, Some(v)) == 0)
  }

  test("vector_only filter: semi-join vs embedded games (R1)") {
    import org.apache.spark.sql.functions._
    val v = graft.embed.VectorsJob.build(spark, tables.games, tables.players,
      tables.positions.filter(col("ply") <= 6), // all 3 games have <=6 plies embedded
      graft.embed.DeterministicEmbedder(8))
    val vOnly = v.where(col("game_id") =!=
      tables.games.filter("source_file = 'sample_game.pgn'")
        .select("game_id").head().getString(0))
    val plan0 = QueryIntent.analyse(QueryIntent.Request("games", Some(10)))
    val plan = plan0.copy(filters =
      List(QueryIntent.MetadataFilter("vector_only", "true")))
    val exec = graft.query.HybridExecutor.execute(spark,
      graft.query.HybridExecutor.Tables(tables.games, tables.players,
        Some(vOnly)), plan, graft.embed.DeterministicEmbedder(8))
    assert(exec.total == 2) // sample game excluded
    val planFalse = plan0.copy(filters =
      List(QueryIntent.MetadataFilter("vector_only", "false")))
    val exec2 = graft.query.HybridExecutor.execute(spark,
      graft.query.HybridExecutor.Tables(tables.games, tables.players,
        Some(vOnly)), planFalse, graft.embed.DeterministicEmbedder(8))
    assert(exec2.total == 1)
  }
}

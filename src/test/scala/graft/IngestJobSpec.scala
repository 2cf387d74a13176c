package graft

import graft.core.Fixtures
import graft.embed.{DeterministicEmbedder, VectorsJob}
import graft.ingest.IngestJob

/** End-to-end ingest over the reference fixtures: mirrors the reference
  * integration suite counts (test/test_integration.ml:21-155 -- 1 game,
  * 2 players, 6 positions from sample_game.pgn; README.md:229-231 -- 77
  * positions from extended_sample_game.pgn).
  */
class IngestJobSpec extends SparkSpec {

  private lazy val tables = {
    import spark.implicits._
    val files = spark.createDataset(Fixtures.all)
    IngestJob.tables(spark, IngestJob.gamesFromText(spark, files))
  }

  test("sample game: 1 game, 2 players, 6 positions, all FENs valid") {
    val g = tables.games.filter("source_file = 'sample_game.pgn'")
    assert(g.count() == 1)
    val gid = g.select("game_id").head().getString(0)
    val pos = tables.positions.filter(s"game_id = '$gid'")
    assert(pos.count() == 6)
    assert(pos.filter("not fen_valid").count() == 0)
    assert(pos.filter("side_to_move = 'black'").count() == 3)
  }

  test("extended game: 77 positions (README ingest example)") {
    val g = tables.games.filter("source_file = 'extended_sample_game.pgn'")
    assert(g.select("ply_count").head().getInt(0) == 77)
  }

  test("annotated game: comments/NAGs/variations stripped, 16 positions") {
    val g = tables.games.filter("source_file = 'annotated_game.pgn'")
    assert(g.select("ply_count").head().getInt(0) == 16)
  }

  test("players dimension dedups by name key") {
    // 3 fixture games name 6 player slots; all six names are distinct.
    assert(tables.players.count() == 6)
    assert(tables.players.select("id").distinct().count() == 6)
  }

  test("game metadata projected: eco/opening/result/date") {
    val row = tables.games.filter("source_file = 'extended_sample_game.pgn'")
      .select("eco_code", "result", "played_on", "white_rating")
      .head()
    assert(!row.isNullAt(0))
    assert(!row.isNullAt(2))
  }

  test("positions are content-addressed: vector_id = md5(fen)") {
    import org.apache.spark.sql.functions._
    val bad = tables.positions
      .filter(md5(col("fen")) =!= col("vector_id")).count()
    assert(bad == 0)
  }

  test("vectors table: one row per position, payload joined, embedding dims") {
    val vectors = VectorsJob.build(spark, tables.games, tables.players,
      tables.positions, DeterministicEmbedder(dims = 32))
    assert(vectors.count() == tables.positions.count())
    val row = vectors.select("embedding", "white", "opening_slug", "phases")
      .filter("white is not null").head()
    assert(row.getSeq[Float](0).length == 32)
  }

  test("embedCol agrees exactly with pure-Scala embed") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e = DeterministicEmbedder(dims = 8)
    val texts = Seq("hello world", "rnbqkbnr/pppppppp w KQkq - 0 1", "", "a b a")
    val fromCol = spark.createDataset(texts).toDF("t")
      .select(e.embedCol(col("t")).as("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    texts.zip(fromCol).foreach { case (t, got) =>
      assert(got.toSeq == e.embed(t).toSeq, s"mismatch for '$t'")
    }
  }

  test("malformed games land in issues, not exceptions") {
    import spark.implicits._
    val bad = "[Event \"X\"]\n\n1. e4 e9 1-0\n"
    val files = spark.createDataset(Seq(("bad.pgn", bad)))
    val t = IngestJob.tables(spark, IngestJob.gamesFromText(spark, files))
    assert(t.games.count() == 0)
    assert(t.issues.count() == 1)
  }
}

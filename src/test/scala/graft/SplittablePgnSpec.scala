package graft

import graft.ingest.IngestJob

/** S1 at the 100 TB shape: the record-boundary-splitting PGN reader must
  * produce byte-identical GameRecords (including game_id, which encodes
  * the per-file index) to the wholetext reader, and must survive a file
  * being chopped into many input splits mid-game.
  */
class SplittablePgnSpec extends SparkSpec {

  /** One multi-game dump: banner + the three fixtures concatenated. */
  private def writeDump(copies: Int = 1): (String, String) = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_split_pgn").toString
    val games = (1 to copies).flatMap { c =>
      graft.core.Fixtures.all.map { case (name, text) =>
        // vary a header so replicated copies stay distinct games
        text.replaceFirst("""\[Event "([^"]*)"\]""",
          s"""[Event "$$1 copy$c"]""")
      }
    }
    val dump = "% TWIC-style banner line\n" + games.mkString("\n\n") + "\n"
    val f = s"$dir/dump.pgn"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(f), dump)
    (dir, dump)
  }

  private def canon(ds: org.apache.spark.sql.Dataset[
      graft.ingest.IngestJob.GameRecord]): Seq[(String, Int, Boolean, Int)] =
    ds.collect().toSeq
      .map(g => (g.game_id, g.game_index, g.parse_ok, g.positions.length))
      .sortBy(_._1)

  test("splittable reader ≡ wholetext reader on a multi-game dump " +
    "(same game_ids, same positions)") {
    val (dir, _) = writeDump()
    val whole = IngestJob.readPgn(spark, dir)
    val split = IngestJob.readPgnSplittable(spark, dir)
    val a = canon(whole)
    val b = canon(split)
    assert(a.nonEmpty && a.map(_._3).forall(identity))
    assert(a === b)
  }

  test("records survive forced sub-file splits (many splits, one file)") {
    val (dir, dump) = writeDump(copies = 8) // 24 games, ~60 KB
    assert(dump.length > 16384)
    val split = IngestJob.readPgnSplittable(spark, dir, hadoopConf = Map(
      // force ~2 KB splits: dozens of splits land mid-game and the
      // record reader must re-synchronize on the delimiter
      "mapreduce.input.fileinputformat.split.maxsize" -> "2048",
      "mapreduce.input.fileinputformat.split.minsize" -> "1"))
    val whole = IngestJob.readPgn(spark, dir)
    assert(canon(split) === canon(whole))
    assert(split.count() === 24)
  }

  test("tables built from the splittable reader match the wholetext path") {
    val (dir, _) = writeDump()
    val tw = IngestJob.tables(spark, IngestJob.readPgn(spark, dir))
    val ts = IngestJob.tables(spark, IngestJob.readPgnSplittable(spark, dir))
    assert(tw.games.count() === ts.games.count())
    assert(tw.positions.count() === ts.positions.count())
    val aw = tw.positions.select("vector_id").collect().map(_.getString(0))
      .sorted.toSeq
    val as = ts.positions.select("vector_id").collect().map(_.getString(0))
      .sorted.toSeq
    assert(aw === as)
  }
}

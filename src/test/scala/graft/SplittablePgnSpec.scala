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

  test("the splittable read is shuffle-free (machine-checked contract)") {
    val (dir, _) = writeDump(copies = 4)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit =
        shuffleBytes.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val n = IngestJob.readPgnSplittable(spark, dir, hadoopConf = Map(
        "mapreduce.input.fileinputformat.split.maxsize" -> "4096",
        "mapreduce.input.fileinputformat.split.minsize" -> "1")).count()
      assert(n === 12)
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      // pass 1 collects one tiny row per split and pass 2 emits records
      // straight out of the scan; the only shuffle is count()'s
      // single-long partial-agg exchange. Anything above a few KB means
      // the text started crossing the wire again.
      assert(shuffleBytes.get() < 65536,
        s"splittable read shuffled ${shuffleBytes.get()} bytes")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("garbage between games never throws and stays reader-invariant") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_split_garbage").toString
    val games = graft.core.Fixtures.all.map(_._2)
    // binary-ish noise, a truncated header block, and stray brackets
    // between real games -- the splitter must keep parity and emit
    // parse_ok=false rows rather than throwing anywhere
    val garbage = "\u0000\u0001\u00ff garbage {unclosed comment\n"
    val truncated = "[Event \"half\"]\n[White \"nobody\n1. e4 e5"
    val dump = games(0) + "\n\n" + garbage + "\n\n" + games(1) + "\n\n" +
      truncated + "\n\n" + games(2) + "\n"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/dump.pgn"), dump)
    val whole = canon(IngestJob.readPgn(spark, dir))
    val split = canon(IngestJob.readPgnSplittable(spark, dir,
      hadoopConf = Map(
        "mapreduce.input.fileinputformat.split.maxsize" -> "2048",
        "mapreduce.input.fileinputformat.split.minsize" -> "1")))
    assert(whole === split)
    assert(whole.nonEmpty)
    // the three real games parsed; garbage landed in error rows, not
    // exceptions
    assert(whole.count(_._3) >= 3)
  }

  test("bzip2-compressed dumps read identically (splittable codec; " +
    "record keys repeat per block)") {
    val (plainDir, dump) = writeDump(copies = 8)
    val bz2Dir = java.nio.file.Files
      .createTempDirectory("graft_split_bz2").toString
    val codec = new org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(new org.apache.hadoop.conf.Configuration())
    val out = codec.createOutputStream(
      new java.io.FileOutputStream(s"$bz2Dir/dump.pgn.bz2"))
    out.write(dump.getBytes("UTF-8")); out.close()
    val split = IngestJob.readPgnSplittable(spark, bz2Dir).collect()
      .toSeq.map(g => (g.game_index, g.parse_ok, g.positions.length,
        g.pgn)).sortBy(_._1)
    val whole = IngestJob.readPgn(spark, plainDir).collect()
      .toSeq.map(g => (g.game_index, g.parse_ok, g.positions.length,
        g.pgn)).sortBy(_._1)
    // source_file differs (`dump.pgn.bz2` path), so compare everything
    // BUT the path-derived fields: same games, same order, same raws
    assert(split === whole)
    assert(split.size === 24)
  }

  test("trailing [EventDate-style tags after move text keep game_ids " +
    "byte-identical (regression: phantom closed slot)") {
    // `[EventDate` starts with "[Event" (so the wholetext splitter opens
    // a new moveless block that merges FORWARD into the next game) but
    // does not match the "\n[Event " record delimiter (so the splittable
    // reader sees it inside the movesful chunk). Before the
    // splitRawsWithTail fix the splittable path emitted it as its own
    // closed slot: 3 games instead of 2, and every later game_id shifted.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_split_eventdate").toString
    val g = graft.core.Fixtures.all.map(_._2)
    val dump = g(0) + "\n[EventDate \"2024.01.01\"]\n\n" + g(1) + "\n" +
      "[EventSponsor \"acme\"]\n"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/dump.pgn"), dump)
    val whole = canon(IngestJob.readPgn(spark, dir))
    val split = canon(IngestJob.readPgnSplittable(spark, dir,
      hadoopConf = Map(
        "mapreduce.input.fileinputformat.split.maxsize" -> "512",
        "mapreduce.input.fileinputformat.split.minsize" -> "1")))
    assert(whole === split)
    // wholetext semantics: [EventDate merges into game 2's raw; the
    // file-final [EventSponsor block is its own (failed-parse) slot
    assert(whole.size === 3)
    assert(whole.count(_._3) === 2)
  }

  test("multi-file dirs: per-file index bases and carries stay isolated " +
    "(mixed plain + bz2 in one directory)") {
    // one directory holding TWO dumps — a plain multi-game file with a
    // banner and a bz2-compressed one — read in a single splittable
    // pass: planSplits must chain carries/bases PER FILE, never across
    // files, and game_ids must match reading each file alone.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_split_multi").toString
    val g = graft.core.Fixtures.all.map(_._2)
    val dumpA = "% banner A\n" + g(0) + "\n\n" + g(1) + "\n"
    val dumpB = g(2) + "\n[EventDate \"2024.02.02\"]\n\n" + g(0)
      .replaceFirst("\\[Event \"([^\"]*)\"\\]", "[Event \"$1 B\"]") + "\n"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/a.pgn"), dumpA)
    val codec = new org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(new org.apache.hadoop.conf.Configuration())
    val out = codec.createOutputStream(
      new java.io.FileOutputStream(s"$dir/b.pgn.bz2"))
    out.write(dumpB.getBytes("UTF-8")); out.close()
    val together = IngestJob.readPgnSplittable(spark, dir, hadoopConf =
      Map("mapreduce.input.fileinputformat.split.maxsize" -> "512",
        "mapreduce.input.fileinputformat.split.minsize" -> "1"))
      .collect().toSeq
      .map(r => (r.source_file, r.game_index, r.pgn))
      .sortBy(x => (x._1, x._2))
    val whole = IngestJob.readPgn(spark, dir).collect().toSeq
      .map(r => (r.source_file, r.game_index, r.pgn))
      .sortBy(x => (x._1, x._2))
    assert(together === whole)
    // both files contribute, indices restart per file at 1
    val byFile = together.groupBy(_._1)
    assert(byFile.size === 2)
    byFile.values.foreach { gs =>
      assert(gs.map(_._2) === (1 to gs.size))
    }
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

package graft.tools

import org.apache.spark.sql.SparkSession

object DiffServe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = graft.core.Fixtures.extendedSampleGame
    val corpus = (1 to 200).map { i =>
      (s"bench_$i.pgn", base.replace(
        "[Event \"Interpolis International Tournament\"]",
        s"""[Event "Bench $i"]"""))
    }
    val files = spark.createDataset(corpus)
    val t = graft.ingest.IngestJob.tables(spark,
      graft.ingest.IngestJob.gamesFromText(spark, files),
      persistRecords = true)
    t.games.cache(); t.players.cache(); t.positions.cache()
    t.positions.count()
    val embedder = graft.embed.DeterministicEmbedder(dims = 256)
    val vectors = graft.embed.VectorsJob.build(spark, t.games, t.players,
      t.positions, embedder)
    vectors.cache(); vectors.count()
    val summaries = graft.query.HybridExecutor.summaries(t.games, t.players)
    summaries.cache(); summaries.count()
    val ht = graft.query.HybridExecutor.Tables(t.games, t.players,
      Some(vectors), summariesPrebuilt = Some(summaries))
    val qs = Seq(
      "find top 5 games where white is rated at least 2500",
      "show black wins", "english opening games",
      "kingside attack in the endgame", "best games after 1990",
      "games where black is rated at least 2400", "queens gambit declined",
      "tactical middlegame sacrifices", "show draws",
      "najdorf sicilian games")
    val plans = qs.map(q => graft.query.QueryIntent.analyse(
      graft.query.QueryIntent.Request(q, Some(5))))
    val batch = graft.query.HybridExecutor.executeBatch(spark, ht, plans,
      embedder)
    plans.zip(batch).zip(qs).foreach { case ((p, b), q) =>
      val s = graft.query.HybridExecutor.execute(spark, ht, p, embedder)
      val br = b.results.collect().toSeq
      val sr = s.results.collect().toSeq
      if (b.total != s.total) println(s"TOTAL DIFF [$q]: ${b.total} vs ${s.total}")
      if (br != sr) {
        println(s"ROWS DIFF [$q]: batch=${br.length} single=${sr.length}")
        br.zipAll(sr, null, null).zipWithIndex.foreach { case ((x, y), i) =>
          if (x != y) println(s"  row $i:\n   batch=$x\n   singl=$y")
        }
      }
    }
    spark.stop()
  }
}

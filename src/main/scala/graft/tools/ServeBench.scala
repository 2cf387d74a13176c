package graft.tools

import org.apache.spark.sql.SparkSession

/** Hybrid-serving micro-bench and scale curve: exactly Bench's
  * chessmate-workload serving section (synthetic corpus -> cached
  * tables/vectors/summaries -> per-query latencies + batch-amortized),
  * without the 100+ gate queries -- for fast iteration on the serving
  * path, and for the serving analog of the dedup-family ScaleCurve:
  * per-query p50 should stay FLAT as the corpus grows (top-k cost
  * tracks k and the per-action scheduling floor, not corpus size, once
  * the scan is cached/columnar), while executeBatch wall tracks the
  * batch's matched-row volume.
  *
  *   runMain graft.tools.ServeBench [nGames] [nQueries] [scalesCsv]
  *
  * With scalesCsv (e.g. "1,4,16"), rebuilds the corpus at
  * nGames*scale per scale and prints one JSON row each.
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val nGames = if (args.nonEmpty) args(0).toInt else 500
    val nReps = if (args.length > 1) args(1).toInt else 9
    val scales = (if (args.length > 2) args(2) else "1")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val embedder = graft.embed.DeterministicEmbedder(dims = 256)
    val base = graft.core.Fixtures.extendedSampleGame
    val batchQs = Seq(
      "find top 5 games where white is rated at least 2500",
      "show black wins",
      "english opening games",
      "kingside attack in the endgame",
      "best games after 1990",
      "games where black is rated at least 2400",
      "queens gambit declined",
      "tactical middlegame sacrifices",
      "show draws",
      "najdorf sicilian games")

    scales.foreach { s =>
      val n = nGames * s
      val corpus = (1 to n).map { i =>
        (s"bench_$i.pgn", base.replace(
          "[Event \"Interpolis International Tournament\"]",
          s"""[Event "Bench $i"]"""))
      }
      val files = spark.createDataset(corpus)
      val t = graft.ingest.IngestJob.tables(spark,
        graft.ingest.IngestJob.gamesFromText(spark, files),
        persistRecords = true)
      t.games.cache(); t.players.cache(); t.positions.cache()
      val nPos = t.positions.count(); t.games.count(); t.players.count()
      val vectors = graft.embed.VectorsJob.build(spark, t.games, t.players,
        t.positions, embedder)
      vectors.cache(); vectors.count()
      val summaries = graft.query.HybridExecutor.summaries(t.games,
        t.players)
      summaries.cache(); summaries.count()
      val ht = graft.query.HybridExecutor.Tables(t.games, t.players,
        Some(vectors), summariesPrebuilt = Some(summaries))
      val plan = graft.query.QueryIntent.analyse(graft.query.QueryIntent
        .Request("find top 5 games where white is rated at least 2500"))
      // warm once, then reps
      graft.query.HybridExecutor.execute(spark, ht, plan, embedder)
        .results.collect()
      val times = (1 to nReps).map { _ =>
        val t0 = System.nanoTime()
        val e = graft.query.HybridExecutor.execute(spark, ht, plan,
          embedder)
        e.results.collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      // batch: warm the branch plans once, then one timed run; count
      // the batch's result-row volume for the linearity axis
      val plans = batchQs.map(q => graft.query.QueryIntent.analyse(
        graft.query.QueryIntent.Request(q, Some(5))))
      graft.query.HybridExecutor.executeBatch(spark, ht, plans, embedder)
      val b0 = System.nanoTime()
      val batch = graft.query.HybridExecutor.executeBatch(spark, ht,
        plans, embedder)
      val batchSec = (System.nanoTime() - b0) / 1e9
      val batchRows = batch.map(_.results.collect().length.toLong).sum
      val batchTotal = batch.map(_.total).sum
      println(f"""{"serve_scale":$s,"games":$n,"positions":$nPos,""" +
        f""""p50":${times(times.length / 2)}%.3f,""" +
        f""""min":${times.head}%.3f,"max":${times.last}%.3f,""" +
        f""""batch10_sec":$batchSec%.3f,""" +
        f""""batch10_amortized":${batchSec / plans.length}%.3f,""" +
        f""""batch_rows":$batchRows,"batch_total_matched":$batchTotal}""")
      // drop this scale's caches so the next scale starts clean
      spark.sharedState.cacheManager.clearCache()
      graft.core.Caches.releaseScoped()
    }
    spark.stop()
  }
}

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
      // warm once, then reps; count Spark jobs per query -- the eager
      // path should cost exactly TWO scheduled jobs (page action +
      // concurrent top-k), with the scoring tail folded to a jobless
      // LocalTableScan
      val jobCounter = new java.util.concurrent.atomic.AtomicLong()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCounter.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      graft.query.HybridExecutor.execute(spark, ht, plan, embedder)
        .results.collect()
      // drain the async listener bus before each counter read, or
      // late-delivered onJobStart events are missed / cross-attributed
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      val jobsBefore = jobCounter.get()
      val times = (1 to nReps).map { _ =>
        val t0 = System.nanoTime()
        val e = graft.query.HybridExecutor.execute(spark, ht, plan,
          embedder)
        e.results.collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      val jobsPerQuery =
        (jobCounter.get() - jobsBefore).toDouble / nReps
      spark.sparkContext.removeSparkListener(listener)
      // Floor probes: the cheapest possible actions in this session,
      // measured the same way as the query reps. `range1` = bare
      // scheduler+codegen floor for ONE job; `page5` = the minimal
      // page-shaped action over the cached summaries (scan + per-
      // partition top-k + driver merge). execute() runs a page action,
      // a concurrent top-k action, and a driver-local scoring job, so
      // p50 - (page5 + range1) ~ the engine's own margin.
      val range1 = (1 to nReps).map { _ =>
        val t0 = System.nanoTime()
        spark.range(1).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(nReps / 2)
      val page5 = (1 to nReps).map { _ =>
        val t0 = System.nanoTime()
        summaries.orderBy(org.apache.spark.sql.functions
          .col("game_id").desc).limit(5).collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(nReps / 2)
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
        f""""batch_rows":$batchRows,"batch_total_matched":$batchTotal,""" +
        f""""floor_range1":$range1%.3f,"floor_page5":$page5%.3f,""" +
        f""""jobs_per_query":$jobsPerQuery%.1f}""")
      // drop this scale's caches so the next scale starts clean
      spark.sharedState.cacheManager.clearCache()
      graft.core.Caches.releaseScoped()
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Hybrid-serving micro-bench: exactly Bench's chessmate-workload
  * serving section (synthetic corpus -> cached tables/vectors/summaries
  * -> per-query latencies + batch-amortized), without the 100+ gate
  * queries -- for fast iteration on the serving path.
  *
  *   runMain graft.tools.ServeBench [nGames] [nQueries]
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val nGames = if (args.nonEmpty) args(0).toInt else 500
    val nReps = if (args.length > 1) args(1).toInt else 9
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
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val base = graft.core.Fixtures.extendedSampleGame
    val corpus = (1 to nGames).map { i =>
      (s"bench_$i.pgn", base.replace(
        "[Event \"Interpolis International Tournament\"]",
        s"""[Event "Bench $i"]"""))
    }
    val files = spark.createDataset(corpus)
    val t = graft.ingest.IngestJob.tables(spark,
      graft.ingest.IngestJob.gamesFromText(spark, files),
      persistRecords = true)
    t.games.cache(); t.players.cache(); t.positions.cache()
    t.positions.count(); t.games.count(); t.players.count()
    val embedder = graft.embed.DeterministicEmbedder(dims = 256)
    val vectors = graft.embed.VectorsJob.build(spark, t.games, t.players,
      t.positions, embedder)
    vectors.cache(); vectors.count()
    val summaries = graft.query.HybridExecutor.summaries(t.games, t.players)
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
      val e = graft.query.HybridExecutor.execute(spark, ht, plan, embedder)
      val tExec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      e.results.collect()
      val tColl = (System.nanoTime() - t1) / 1e9
      System.err.println(f"[phase] exec=$tExec%.3f collect=$tColl%.3f")
      tExec + tColl
    }.sorted
    println(f"[serve] per-query p50=${times(times.length / 2)}%.3f " +
      f"min=${times.head}%.3f max=${times.last}%.3f n=$nReps")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serving-floor experiment: the per-query hybrid path costs two
  * CONCURRENT actions (page TakeOrderedAndProject + vector top-k).
  * Would ONE action over a tagged union of both bounded subtrees beat
  * it? One job = one scheduler slot, but each non-terminal
  * orderBy.limit branch pays a single-partition merge exchange the
  * terminal executeCollect path skips. This probe measures both shapes
  * on the bench corpus so the serving design is decided by data, not
  * guesswork (r9's floor analysis: ~0.07-0.11 s per action slot).
  *
  *   runMain graft.tools.UnionProbe [nGames] [reps]
  */
object UnionProbe {
  def main(args: Array[String]): Unit = {
    val nGames = if (args.nonEmpty) args(0).toInt else 500
    val reps = if (args.length > 1) args(1).toInt else 15
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

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
    val summaries = graft.query.HybridExecutor.summaries(t.games,
      t.players)
    summaries.cache(); summaries.count()

    val plan = graft.query.QueryIntent.analyse(graft.query.QueryIntent
      .Request("find top 5 games where white is rated at least 2500"))
    val qv = graft.query.HybridExecutor.queryVector(plan, embedder)

    // shape A: two concurrent actions (today's serving path shape)
    def pageDf = summaries
      .where(col("white_rating") >= 2500)
      .orderBy(col("played_on").desc_nulls_last, col("game_id").desc)
      .limit(5)
    def topkDf = graft.query.HybridExecutor.vectorTopK(vectors, plan, qv)

    def shapeA(): Int = {
      val fut = scala.concurrent.Future(topkDf.collect())(
        scala.concurrent.ExecutionContext.global)
      val page = pageDf.collect()
      val hits = scala.concurrent.Await.result(fut,
        scala.concurrent.duration.Duration.Inf)
      page.length + hits.length
    }

    // shape B: ONE action over a tagged union of the two bounded
    // subtrees, harmonized to a common (tag, game_id, payload...) shape
    def shapeB(): Int = {
      val p = pageDf.select(lit("p").as("t"), col("game_id"),
        lit(null).cast("double").as("hit_score"))
      val h = topkDf.select(lit("v").as("t"), col("game_id"),
        col("score").cast("double").as("hit_score"))
      p.unionByName(h).collect().length
    }

    // warm both plans
    shapeA(); shapeB()
    def bench(f: () => Int): (Double, Double) = {
      val xs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.sorted
      (xs(xs.length / 2), xs.head)
    }
    val (aP50, aMin) = bench(() => shapeA())
    val (bP50, bMin) = bench(() => shapeB())
    println(f"""{"games":$nGames,"reps":$reps,""" +
      f""""two_actions_p50":$aP50%.3f,"two_actions_min":$aMin%.3f,""" +
      f""""union_one_action_p50":$bP50%.3f,""" +
      f""""union_one_action_min":$bMin%.3f}""")
    spark.stop()
  }
}

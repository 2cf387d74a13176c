package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every gate query on SPARK_GRAFT_SF_DIR plus a
  * chessmate-workload section (ingest games/sec, embedding positions/sec,
  * hybrid query latency -- the BASELINE.md metrics), and prints ONE JSON
  * line for the driver.
  */
object Bench {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // test tables are single-row-group files; allow sub-file splits
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    // 1) Gate queries (SURVEY §2 inventory) on the sf tables.
    // A failed query records -elapsed (negative sentinel) so a broken query
    // can't masquerade as a fast one in the bench JSON.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      var failed = false
      val sec = time {
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            failed = true
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
      }
      results(name) = if (failed) -sec else sec
    }

    // 2) Chessmate workload (BASELINE.md metrics), on a synthetic corpus:
    //    the 77-ply fixture replicated with distinct headers.
    import spark.implicits._
    val nGames = sys.env.getOrElse("SPARK_GRAFT_BENCH_GAMES", "500").toInt
    val base = graft.core.Fixtures.extendedSampleGame
    val corpus = (1 to nGames).map { i =>
      (s"bench_$i.pgn", base.replace(
        "[Event \"Interpolis International Tournament\"]",
        s"""[Event "Bench $i"]"""))
    }
    val files = spark.createDataset(corpus)

    var positionCount = 0L
    var t: graft.ingest.IngestJob.ChessTables = null
    val ingestSec = time {
      t = graft.ingest.IngestJob.tables(spark,
        graft.ingest.IngestJob.gamesFromText(spark, files),
        persistRecords = true)
      t.games.cache(); t.players.cache(); t.positions.cache()
      positionCount = t.positions.count()
      t.games.count(); t.players.count()
    }
    val embedder = graft.embed.DeterministicEmbedder(dims = 256)
    var vectors: org.apache.spark.sql.DataFrame = null
    val embedSec = time {
      vectors = graft.embed.VectorsJob.build(spark, t.games, t.players,
        t.positions, embedder)
      vectors.cache()
      vectors.count()
    }
    val plan = graft.query.QueryIntent.analyse(graft.query.QueryIntent
      .Request("find top 5 games where white is rated at least 2500"))
    // summaries materialized once (the reference serves queries from a
    // warm, indexed game_summary view; this is the Spark analog).
    val summaries = graft.query.HybridExecutor.summaries(t.games, t.players)
    summaries.cache(); summaries.count()
    val queryTimes = (1 to 5).map { _ =>
      time {
        graft.query.HybridExecutor.execute(spark,
          graft.query.HybridExecutor.Tables(t.games, t.players, Some(vectors),
            summariesPrebuilt = Some(summaries)),
          plan, embedder).results.collect()
      }
    }.sorted

    results("chess_ingest") = ingestSec
    results("chess_embed") = embedSec
    results("chess_query_p50") = queryTimes(queryTimes.length / 2)
    val total = results.values.sum // seconds only; rates appended after
    results("chess_ingest_games_per_sec") = nGames / ingestSec
    results("chess_embed_positions_per_sec") = positionCount / embedSec

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.4f" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

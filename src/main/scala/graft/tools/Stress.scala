package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproducible chessmate-workload stress run (the BASELINE.md "Measured"
  * corpus): replicate the 77-ply fixture N times with distinct headers,
  * ingest -> embed -> hybrid-query, print throughput + latency.
  *
  *   runMain graft.tools.Stress [nGames] [embedDims]
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val nGames = if (args.nonEmpty) args(0).toInt else 20000
    val dims = if (args.length > 1) args(1).toInt else 256
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val fixture = graft.core.Fixtures.all
      .find(_._1.contains("extended")).getOrElse(graft.core.Fixtures.all.head)
      ._2
    // distinct Event/White headers per replica -> distinct games/players
    val texts = spark.range(nGames).map { i =>
      (s"game_$i.pgn", fixture
        .replaceFirst("\\[Event \"[^\"]*\"\\]", s"[Event \"Stress $i\"]")
        .replaceFirst("\\[White \"[^\"]*\"\\]", s"[White \"Player W$i\"]"))
    }.toDF("path", "text").as[(String, String)]

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val (t, ingestSec) = timed {
      val tt = graft.ingest.IngestJob.tables(spark,
        graft.ingest.IngestJob.gamesFromText(spark, texts))
      tt.games.cache().count(); tt.players.cache().count()
      tt.positions.cache().count()
      tt
    }
    val nPos = t.positions.count()
    println(f"[stress] ingest: $nGames games, $nPos positions in " +
      f"$ingestSec%.1f s = ${nGames / ingestSec}%.0f games/s")

    val embedder = graft.embed.DeterministicEmbedder(dims)
    val (vectors, embedSec) = timed {
      val v = graft.embed.VectorsJob.build(spark, t.games, t.players,
        t.positions, embedder)
      v.cache().count()
      v
    }
    println(f"[stress] embed: $nPos positions in $embedSec%.1f s = " +
      f"${nPos / embedSec}%.0f positions/s (dedup-by-fen pipeline)")

    val plan = graft.query.QueryIntent.analyse(graft.query.QueryIntent
      .Request("games where white is rated at least 2500", Some(5)))
    // warm + 5 timed runs, page-only (computeTotal=false)
    val run = () => graft.query.HybridExecutor.execute(spark,
      graft.query.HybridExecutor.Tables(t.games, t.players, Some(vectors)),
      plan, embedder, computeTotal = false).results.count()
    run()
    val lats = (1 to 5).map(_ => timed(run())._2)
    println(f"[stress] hybrid query p50 ${lats.sorted.apply(2)}%.2f s " +
      f"(min ${lats.min}%.2f, max ${lats.max}%.2f) over $nPos positions, " +
      f"$dims-d vectors")
    spark.stop()
  }
}

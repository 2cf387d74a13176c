package graft.app

import org.apache.spark.sql.SparkSession
import graft.query.{HybridExecutor, QueryIntent, ResultFormatter}
import graft.embed.DeterministicEmbedder

/** CLI: NL question -> hybrid search over ingested tables.
  *
  *   runMain graft.app.QueryApp <tablesDir> <question words...> [--limit=N] [--offset=N]
  *
  * Batch mode -- many questions separated by `;;` run through ONE
  * amortized pass ([[HybridExecutor.executeBatch]]: constant stage
  * count regardless of batch size):
  *
  *   runMain graft.app.QueryApp <tablesDir> "q1 ;; q2 ;; q3" [--limit=N]
  *
  * Mirrors POST /query (reference services/api/chessmate_api.ml:586-724)
  * minus the HTTP envelope: same plan, same scoring, same pagination.
  */
object QueryApp {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: QueryApp <tablesDir> <question...> [--limit=N] [--offset=N]")
    val dir = args(0)
    // sbt's runMain tokenizes on whitespace, so the question arrives as
    // many tokens; limit/offset are explicit flags (a bare trailing int
    // would be ambiguous with rating numbers in the question itself).
    val rest = args.drop(1)
    val limit = rest.collectFirst { case s if s.startsWith("--limit=") =>
      s.stripPrefix("--limit=").toInt }
    val offset = rest.collectFirst { case s if s.startsWith("--offset=") =>
      s.stripPrefix("--offset=").toInt }
    rest.filter(_.startsWith("--")).foreach { t =>
      require(t.startsWith("--limit=") || t.startsWith("--offset="),
        s"unrecognized flag '$t'; " +
          "usage: QueryApp <tablesDir> <question...> [--limit=N] [--offset=N]")
    }
    val question = rest.filterNot(_.startsWith("--")).mkString(" ")
    require(question.nonEmpty,
      "usage: QueryApp <tablesDir> <question...> [--limit=N] [--offset=N]")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-query")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val questions = question.split(";;").map(_.trim).filter(_.nonEmpty)
    val plans = questions.toSeq.map(q =>
      QueryIntent.analyse(QueryIntent.Request(q, limit, offset)))
    plans.foreach(plan =>
      println(s"[plan] cleaned='${plan.cleanedText}' limit=${plan.limit} " +
        s"offset=${plan.offset} filters=${plan.filters} " +
        s"rating=${plan.rating} keywords=${plan.keywords}"))

    val games = spark.read.parquet(s"$dir/games")
    val players = spark.read.parquet(s"$dir/players")
    val vectors =
      try Some(spark.read.parquet(s"$dir/vectors"))
      catch { case _: Throwable => None }
    val embedder = DeterministicEmbedder(dims = vectors.map(v =>
      v.selectExpr("size(embedding)").head().getInt(0)).getOrElse(1536))
    val tables = HybridExecutor.Tables(games, players, vectors)

    val execs =
      if (plans.length == 1)
        Seq(HybridExecutor.execute(spark, tables, plans.head, embedder))
      else HybridExecutor.executeBatch(spark, tables, plans, embedder)

    plans.zip(execs).foreach { case (plan, exec) =>
      if (plans.length > 1) println(s"\n=== ${plan.cleanedText} ===")
      exec.warnings.foreach(w => println(s"[warning] $w"))
      val rows = exec.results.collect()
      println(s"[results] total=${exec.total} returned=${rows.length} " +
        s"has_more=${exec.hasMore}")
      println(ResultFormatter.summarize(rows.toSeq))
      rows.foreach(r => println(ResultFormatter.resultFields(r)))
    }
    spark.stop()
  }
}

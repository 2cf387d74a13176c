package graft

import org.apache.spark.sql.functions._
import graft.core.{Fixtures, Retry}
import graft.embed.{Chunker, DeterministicEmbedder, Snapshots, VectorsJob}
import graft.ingest.IngestJob
import graft.query.{QueryIntent, Reranker}
import graft.streaming.StreamingIngest

/** Streaming ingest, snapshots, incremental embedding, retry/chunker, and
  * the agent-rerank blend (reference §2.7/§2.3 operators).
  */
class OpsSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.newTmp(prefix)

  object Files {
    def newTmp(prefix: String): String =
      java.nio.file.Files.createTempDirectory(prefix).toString
  }

  test("streaming ingest drains fixture files exactly once (AvailableNow)") {
    val in = tmpDir("pgn-in")
    Fixtures.all.foreach { case (name, text) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(in, name),
        text.getBytes("UTF-8"))
    }
    val out = tmpDir("pgn-out")
    val ckpt = tmpDir("pgn-ckpt")
    val q = StreamingIngest.runAvailableNow(spark, in, out, ckpt)
    q.awaitTermination(120000)
    val got = spark.read.parquet(s"$out/positions_stream")
    assert(got.count() == 99) // 6 + 77 + 16
    // re-run with same checkpoint: no new files -> no new rows.
    val q2 = StreamingIngest.runAvailableNow(spark, in, out, ckpt)
    q2.awaitTermination(120000)
    assert(spark.read.parquet(s"$out/positions_stream").count() == 99)
  }

  test("snapshots: create/list/restore versioned vectors") {
    import spark.implicits._
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("vector_id", "payload")
    val df2 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("vector_id", "payload")
    val base = tmpDir("snaps")
    val s1 = Snapshots.create(df1, base)
    val s2 = Snapshots.create(df2, base)
    assert(s1.version == 1 && s2.version == 2)
    assert(Snapshots.list(base).map(_.rows) == Seq(2L, 3L))
    assert(Snapshots.restore(spark, base).count() == 3)
    assert(Snapshots.restore(spark, base, Some(1)).count() == 2)
  }

  test("incremental embedding: anti-join skips already-embedded fens") {
    import spark.implicits._
    val files = spark.createDataset(Fixtures.all)
    val t = IngestJob.tables(spark, IngestJob.gamesFromText(spark, files))
    val e = DeterministicEmbedder(8)
    val v1 = VectorsJob.build(spark, t.games, t.players,
      t.positions.filter(col("ply") <= 3), e)
    val v2 = VectorsJob.build(spark, t.games, t.players, t.positions, e,
      existing = Some(v1.select("vector_id")))
    // full build joins ALL positions against embeddings of fresh fens only;
    // rows with already-known vector_ids drop out of the payload join.
    val freshIds = v2.select("vector_id").distinct().count()
    val v1Ids = v1.select("vector_id").distinct().count()
    val allIds = t.positions.select("vector_id").distinct().count()
    assert(freshIds == allIds - v1Ids)
  }

  test("retry: backs off then succeeds; gives up on persistent failure") {
    var calls = 0
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = Retry.withBackoff(Retry.Policy(maxAttempts = 3,
      initialDelayMs = 10), sleep = slept.append(_)) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      "ok"
    }
    assert(out == "ok" && calls == 3 && slept.length == 2)
    assert(slept(1) > slept(0)) // exponential
    intercept[RuntimeException] {
      Retry.withBackoff(Retry.Policy(maxAttempts = 2, initialDelayMs = 1),
        sleep = _ => ()) { throw new RuntimeException("always") }
    }
  }

  test("chunker: count split then char-budget bisection (E2)") {
    val items = Seq.fill(5)("x" * 60)
    val chunks = Chunker.chunk(items, Chunker.Limits(maxItems = 4,
      maxChars = 150))
    // first group of 4 (240 chars) bisects into 2+2; trailing group of 1.
    assert(chunks.map(_.length) == Seq(2, 2, 1))
    assert(Chunker.chunk(Seq("a" * 500),
      Chunker.Limits(maxChars = 100)).map(_.length) == Seq(1)) // never empty
  }

  test("reranker: agent blend changes ranking, min(1,...) cap holds") {
    import spark.implicits._
    val files = spark.createDataset(Fixtures.all)
    val t = IngestJob.tables(spark, IngestJob.gamesFromText(spark, files))
    val plan = QueryIntent.analyse(QueryIntent.Request("games", Some(10)))
    val exec = graft.query.HybridExecutor.execute(spark,
      graft.query.HybridExecutor.Tables(t.games, t.players, None), plan)
    val before = exec.results.collect().map(_.getAs[String]("game_id"))
    // mock reranker: favor the LAST game, like test_query.ml's fake agent.
    val favored = before.last
    val mock = new Reranker {
      def scores(candidates: org.apache.spark.sql.DataFrame,
          p: QueryIntent.Plan): org.apache.spark.sql.DataFrame = {
        val s = candidates.sparkSession
        import s.implicits._
        candidates.select("game_id").as[String].collect().toSeq
          .map(id => (id, if (id == favored) 1.0 else 0.1, "mock"))
          .toDF("game_id", "agent_score", "explanation")
      }
    }
    val after = Reranker.apply(exec.results, plan, mock).collect()
    assert(after.head.getAs[String]("game_id") == favored)
    after.foreach(r => assert(r.getAs[Double]("total_score") <= 1.0))
  }

  test("windowed streaming agg compiles with watermark (batch check)") {
    import spark.implicits._
    // batch DataFrame through the same windowed-agg builder
    val df = Seq(
      (1L, "f.pgn", java.sql.Timestamp.valueOf("2024-01-01 00:00:10")),
      (1L, "f.pgn", java.sql.Timestamp.valueOf("2024-01-01 00:00:50")),
      (2L, "f.pgn", java.sql.Timestamp.valueOf("2024-01-01 00:01:10")))
      .toDF("game_id", "source_file", "ts")
    val out = StreamingIngest.windowedGameRate(df, "ts").collect()
    assert(out.map(_.getAs[Long]("positions")).sum == 3)
  }
}

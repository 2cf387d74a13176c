package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.query.{EvalCache, QueryIntent, Reranker}

/** A4 agent-eval cache: hit avoids re-evaluation (test_query.ml's "agent
  * cache hit avoids 2nd call"), key sensitivity, LRU eviction.
  */
class EvalCacheSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(q: String): QueryIntent.Plan =
    QueryIntent.analyse(QueryIntent.Request(q, Some(5)))

  /** Counts invocations; scores numeric-string game_id/10.0. */
  private class CountingReranker extends Reranker {
    var calls = 0
    var rowsScored = 0
    def scores(candidates: DataFrame, plan: QueryIntent.Plan): DataFrame = {
      calls += 1
      val n = candidates.count().toInt
      rowsScored += n
      candidates.select(col("game_id"),
        (col("game_id").cast("double") / lit(10.0)).as("agent_score"),
        lit("mock").as("explanation"))
    }
  }

  private def candidates(ids: Long*): DataFrame =
    ids.map(i => (i.toString, s"pgn-of-$i")).toDF("game_id", "pgn")

  test("second evaluation with same plan+pgns is served from cache") {
    val inner = new CountingReranker
    val cache = new EvalCache.LruBackend()
    val r = EvalCache.cached(inner, cache)
    val plan = planOf("top games in the english opening")
    val first = r.scores(candidates(10L, 20L), plan)
      .orderBy("game_id").as[(String, Double, String)].collect().toSeq
    val second = r.scores(candidates(10L, 20L), plan)
      .orderBy("game_id").as[(String, Double, String)].collect().toSeq
    assert(first === second)
    assert(inner.calls === 1) // 2nd scores() call never reached the agent
    assert(inner.rowsScored === 2)
  }

  test("partial hit: only missing candidates reach the evaluator") {
    val inner = new CountingReranker
    val r = EvalCache.cached(inner, new EvalCache.LruBackend())
    val plan = planOf("draws in the endgame")
    r.scores(candidates(1L, 2L), plan).collect()
    r.scores(candidates(2L, 3L), plan).collect()
    assert(inner.rowsScored === 3) // 1,2 then only 3
  }

  test("different plan text misses; different pgn misses") {
    val k1 = EvalCache.key(planOf("white wins"), "pgn")
    assert(k1 === EvalCache.key(planOf("white wins"), "pgn"))
    assert(k1 !== EvalCache.key(planOf("black wins"), "pgn"))
    assert(k1 !== EvalCache.key(planOf("white wins"), "pgn2"))
    // PGN truncated at 3000 chars before hashing (agent_evaluator.ml:30-33)
    val long = "x" * EvalCache.pgnTruncateChars
    assert(EvalCache.key(planOf("q"), long) ===
      EvalCache.key(planOf("q"), long + "tail-the-agent-never-sees"))
  }

  test("rating/opening/result filters change the key") {
    val base = EvalCache.key(planOf("show games"), "p")
    assert(base !== EvalCache.key(planOf("show games with white over 2500"), "p"))
    assert(base !== EvalCache.key(planOf("show games in the sicilian defense"), "p"))
    assert(base !== EvalCache.key(planOf("show games where white wins"), "p"))
  }

  test("LRU evicts beyond capacity; re-evaluation after eviction") {
    val inner = new CountingReranker
    val backend = new EvalCache.LruBackend(capacity = 2)
    val r = EvalCache.cached(inner, backend)
    val plan = planOf("anything")
    r.scores(candidates(1L), plan).collect()
    r.scores(candidates(2L), plan).collect()
    r.scores(candidates(3L), plan).collect() // evicts key(1)
    assert(backend.size === 2)
    r.scores(candidates(1L), plan).collect() // must re-evaluate
    assert(inner.rowsScored === 4)
  }

  test("persistent backend: hit/miss parity with LRU, survives reopen") {
    val dir = java.nio.file.Files.createTempDirectory("evalcache")
    val inner = new CountingReranker
    val backend = new EvalCache.PersistentBackend(dir)
    val r = EvalCache.cached(inner, backend)
    val plan = planOf("top games in the english opening")
    val first = r.scores(candidates(10L, 20L), plan)
      .orderBy("game_id").as[(String, Double, String)].collect().toSeq
    val second = r.scores(candidates(10L, 20L), plan)
      .orderBy("game_id").as[(String, Double, String)].collect().toSeq
    assert(first === second)
    assert(inner.calls === 1) // same contract as the LRU backend
    // a NEW process (fresh backend over the same dir) still hits
    val inner2 = new CountingReranker
    val reopened = new EvalCache.PersistentBackend(dir)
    assert(reopened.size === 2)
    val r2 = EvalCache.cached(inner2, reopened)
    val third = r2.scores(candidates(10L, 20L), plan)
      .orderBy("game_id").as[(String, Double, String)].collect().toSeq
    assert(third === first)
    assert(inner2.calls === 0)
    // partial hit after reopen: only the new candidate is evaluated
    r2.scores(candidates(10L, 30L), plan).collect()
    assert(inner2.rowsScored === 1)
  }

  test("persistent backend: last-write-wins, torn tail skipped, compact") {
    val dir = java.nio.file.Files.createTempDirectory("evalcache2")
    val b = new EvalCache.PersistentBackend(dir)
    b.put("k1", EvalCache.Entry(0.1, "first"))
    b.put("k1", EvalCache.Entry(0.9, "second\nline \"quoted\" \\ tab\t"))
    b.put("k2", EvalCache.Entry(-0.5, "neg"))
    assert(b.get("k1").map(_.agentScore) === Some(0.9))
    assert(b.get("k1").map(_.explanation) ===
      Some("second\nline \"quoted\" \\ tab\t"))
    // simulate a crash mid-append: torn final line must not poison load
    val f = dir.resolve("eval_cache.jsonl")
    java.nio.file.Files.writeString(f, "{\"k\":\"torn",
      java.nio.file.StandardOpenOption.APPEND)
    val b2 = new EvalCache.PersistentBackend(dir)
    assert(b2.size === 2)
    assert(b2.get("k1").map(_.agentScore) === Some(0.9))
    // compact rewrites to one live line per key (3 appends + torn -> 2)
    b2.compact()
    val lines = java.nio.file.Files.readAllLines(f)
    assert(lines.size === 2)
    val b3 = new EvalCache.PersistentBackend(dir)
    assert(b3.get("k1").map(_.explanation) === b2.get("k1").map(_.explanation))
    assert(b3.get("k2").map(_.agentScore) === Some(-0.5))
  }

  test("cached reranker composes with Reranker.apply blend") {
    val inner = new CountingReranker
    val r = EvalCache.cached(inner, new EvalCache.LruBackend())
    val ranked = Seq(
      ("1", 0.5, "2000-01-01", "p1"), ("2", 0.9, "2000-01-02", "p2"))
      .toDF("game_id", "total_score", "played_on_str", "pgn")
    val plan = planOf("best games")
    val out = Reranker.apply(ranked, plan, r)
      .select("game_id", "total_score")
      .as[(String, Double)].collect().toMap
    // blend: min(1, 0.6*total + 0.4*clamp(gid/10))
    assert(math.abs(out("1") - (0.6 * 0.5 + 0.4 * 0.1)) < 1e-9)
    assert(math.abs(out("2") - (0.6 * 0.9 + 0.4 * 0.2)) < 1e-9)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.query.{AgentEvaluator, AgentTelemetry, CircuitBreaker,
  QueryIntent, Reranker}
import graft.core.Retry
import graft.embed.Chunker

/** A2 evaluator + A6 telemetry: prompt assembly, effort/verbosity rules,
  * deterministic scoring, retry/breaker wiring, batching, cost math.
  */
class AgentEvaluatorSpec extends SparkSpec {
  import spark.implicits._
  import AgentEvaluator._

  private def planOf(q: String): QueryIntent.Plan =
    QueryIntent.analyse(QueryIntent.Request(q, Some(5)))

  test("effort: theme filter or >=4 keywords raises to high") {
    assert(effortForPlan(planOf("best games")) == "medium")
    assert(effortForPlan(planOf("sicilian games with tactics")) == "high")
    val many = planOf("a").copy(keywords = List("k1", "k2", "k3", "k4"))
    assert(effortForPlan(many) == "high")
  }

  test("verbosity: low only for simple plans") {
    assert(verbosityForPlan(planOf("best games")) == "low")
    val busy = planOf("a").copy(keywords = List("k1", "k2", "k3"))
    assert(verbosityForPlan(busy) == "medium")
  }

  test("pgn truncation appends the reference marker") {
    val long = "y" * (maxPgnChars + 5)
    assert(truncatePgn("short") == "short")
    assert(truncatePgn(long) ==
      "y" * maxPgnChars + "\n... [PGN truncated]")
  }

  test("candidate block matches the reference format, defaults included") {
    val c = Candidate("abc123", "W", "B", None, None, None, None,
      Some(2500), None, "1. e4 e5")
    assert(candidateBlock(c) ==
      """Game ID: abc123
White: W
Black: B
Result: *
Opening: Unknown opening (Unknown ECO)
Played on: Unknown date
Ratings (White | Black): 2500 vs ?
PGN:
1. e4 e5""")
  }

  test("deterministic score: two-decimal in [0,1], question-sensitive") {
    val s1 = score("q1", "block")
    assert(s1 == score("q1", "block"))
    assert(s1 >= 0.0 && s1 <= 1.0)
    assert(math.abs(s1 * 100 - math.round(s1 * 100)) < 1e-9)
    assert(s1 != score("q2", "block") || s1 != score("q1", "other"))
  }

  private def gamesDf: DataFrame =
    Seq(("g1", "1. e4 e5"), ("g2", "1. d4 d5"), ("g3", "1. c4 c5"))
      .toDF("game_id", "pgn")

  private def candidatesDf: DataFrame =
    Seq(("g1", 0.5, "2020-01-01"), ("g2", 0.6, "2020-01-02"),
      ("g3", 0.7, "2020-01-03"))
      .toDF("game_id", "total_score", "played_on_str")

  test("AgentReranker scores every candidate; blend composes (A2+A3)") {
    val sink = new AgentTelemetry.BufferSink
    val r = new AgentReranker(gamesDf, telemetry = sink,
      rates = AgentTelemetry.Rates(None, None, None))
    val plan = planOf("best games")
    val out = Reranker.apply(candidatesDf, plan, r)
      .select("game_id", "total_score", "agent_score").collect()
    assert(out.length == 3)
    out.foreach { row =>
      val total = row.getDouble(1)
      val agent = row.getDouble(2)
      assert(agent >= 0.0 && agent <= 1.0)
      assert(total <= 1.0)
    }
    assert(sink.records.nonEmpty)
    assert(sink.records.map(_.evaluated).sum == 3)
    assert(sink.records.head.reasoningEffort == "medium")
  }

  test("retry: transient failures recover; breaker records them") {
    var calls = 0
    val flaky = new Backend {
      def generate(e: String, v: String, s: String, u: String,
          c: Seq[Candidate], q: String): Response = {
        calls += 1
        if (calls < 3) throw new RuntimeException("transient")
        new DeterministicBackend().generate(e, v, s, u, c, q)
      }
    }
    val breaker = new CircuitBreaker()
    val r = new AgentReranker(gamesDf, backend = flaky, breaker = breaker,
      policy = Retry.Policy(maxAttempts = 3, initialDelayMs = 1),
      telemetry = new AgentTelemetry.BufferSink,
      rates = AgentTelemetry.Rates(None, None, None), sleep = _ => ())
    val out = r.scores(candidatesDf, planOf("best games")).collect()
    assert(calls == 3 && out.length == 3)
    assert(breaker.state == "closed") // success resets
  }

  test("open breaker refuses evaluation (A5 wiring)") {
    val breaker = new CircuitBreaker(threshold = 1,
      cooloffMs = 60000, now = () => 0L)
    breaker.recordFailure()
    val r = new AgentReranker(gamesDf, breaker = breaker,
      telemetry = new AgentTelemetry.BufferSink,
      rates = AgentTelemetry.Rates(None, None, None))
    intercept[IllegalArgumentException] {
      r.scores(candidatesDf, planOf("best games"))
    }
  }

  test("char budget splits candidates into multiple batched calls (E2)") {
    val sink = new AgentTelemetry.BufferSink
    val r = new AgentReranker(gamesDf,
      limits = Chunker.Limits(maxItems = 25, maxChars = 10),
      telemetry = sink, rates = AgentTelemetry.Rates(None, None, None))
    val out = r.scores(candidatesDf, planOf("best games")).collect()
    assert(out.length == 3)
    assert(sink.records.length == 3) // one telemetry record per call
  }

  test("applyOrFallback keeps heuristic ranking when the agent dies") {
    val dead = new Backend {
      def generate(e: String, v: String, s: String, u: String,
          c: Seq[Candidate], q: String): Response =
        throw new RuntimeException("backend down")
    }
    val r = new AgentReranker(gamesDf, backend = dead,
      policy = Retry.Policy(maxAttempts = 2, initialDelayMs = 1),
      telemetry = new AgentTelemetry.BufferSink,
      rates = AgentTelemetry.Rates(None, None, None), sleep = _ => ())
    val (out, warnings) =
      Reranker.applyOrFallback(candidatesDf, planOf("best games"), r)
    val rows = out.orderBy(desc("total_score")).collect()
    assert(rows.map(_.getAs[String]("game_id")).toSeq ==
      Seq("g3", "g2", "g1")) // heuristic order intact
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("agent_score"))))
    assert(warnings.exists(_.contains("keeping heuristic ranking")))
  }

  test("telemetry cost: rate * tokens / 1000 per component (A6)") {
    val tokens = AgentTelemetry.Tokens(Some(2000), Some(500), None)
    val c = AgentTelemetry.cost(tokens,
      AgentTelemetry.Rates(Some(0.01), Some(0.03), Some(0.05)))
    assert(c.input.contains(0.02))
    assert(c.output.contains(0.015))
    assert(c.reasoning.isEmpty) // no reasoning tokens reported
    assert(c.total.exists(t => math.abs(t - 0.035) < 1e-12))
    val unpriced = AgentTelemetry.cost(tokens,
      AgentTelemetry.Rates(None, None, None))
    assert(unpriced.isEmpty)
  }

  test("telemetry rates: garbage and negatives are rejected") {
    var warns = 0
    def parse(v: String) =
      AgentTelemetry.Rates.parseRate("X", Some(v), _ => warns += 1)
    assert(parse("0.25").contains(0.25))
    assert(parse("  0.5  ").contains(0.5))
    assert(parse("-1").isEmpty)
    assert(parse("abc").isEmpty)
    assert(parse("").isEmpty)
    assert(warns == 2) // -1 and abc warn; empty is silent like the reference
  }

  test("question truncation at 160 chars") {
    val q = "z" * 200
    assert(AgentTelemetry.truncateQuestion(q) == "z" * 160 + "...")
    assert(AgentTelemetry.truncateQuestion("  hi  ") == "hi")
  }
}

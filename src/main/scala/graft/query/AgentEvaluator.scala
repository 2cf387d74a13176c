package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Retry
import graft.embed.Chunker

/** A2 agent evaluation tier (reference lib/query/agent_evaluator.ml).
  *
  * The reference assembles one batched prompt over <= 25 candidates
  * (per-candidate metadata block + truncated PGN), picks reasoning
  * effort/verbosity from the plan, calls GPT-5 with a JSON response
  * schema, clamps scores to [0,1], and logs telemetry. This module keeps
  * that pipeline -- prompt assembly, effort rules, batching, retry,
  * circuit breaker, clamping, telemetry -- behind a pluggable `Backend`.
  * The bundled backend is DETERMINISTIC (zero-egress env, matching the
  * reference's behavior with no AGENT_API_KEY): each candidate scores
  * md5(question ' ' block) % 101 / 100 -- two-decimal in [0,1], exactly
  * recomputable in DuckDB SQL, which is what lets a gate query verify
  * the full rerank path end-to-end.
  */
object AgentEvaluator {

  val maxCandidates = 25 // agent_evaluator.ml:28
  val maxPgnChars = 3000 // agent_evaluator.ml:29

  // --- effort / verbosity selection (agent_evaluator.ml:35-48) ---------

  /** "high" when a theme filter is present or >= 4 keywords. */
  def effortForPlan(plan: QueryIntent.Plan): String =
    if (plan.filters.exists(_.field.toLowerCase == "theme") ||
      plan.keywords.length >= 4) "high"
    else "medium"

  /** Low verbosity for simple plans (<= 1 filter and <= 2 keywords). */
  def verbosityForPlan(plan: QueryIntent.Plan): String =
    if (plan.filters.length <= 1 && plan.keywords.length <= 2) "low"
    else "medium"

  // --- prompt assembly (agent_evaluator.ml:31-33, 51-100) --------------

  def truncatePgn(pgn: String): String =
    if (pgn.length <= maxPgnChars) pgn
    else pgn.take(maxPgnChars) + "\n... [PGN truncated]"

  final case class Candidate(
      gameId: String, white: String, black: String,
      result: Option[String], playedOn: Option[String],
      eco: Option[String], opening: Option[String],
      whiteRating: Option[Int], blackRating: Option[Int],
      pgn: String)

  /** Per-candidate block, byte-for-byte the reference's
    * build_candidate_block (agent_evaluator.ml:51-84).
    */
  def candidateBlock(c: Candidate): String = {
    def rating(r: Option[Int]) = r.map(_.toString).getOrElse("?")
    s"""Game ID: ${c.gameId}
White: ${c.white}
Black: ${c.black}
Result: ${c.result.getOrElse("*")}
Opening: ${c.opening.getOrElse("Unknown opening")} (${c.eco.getOrElse("Unknown ECO")})
Played on: ${c.playedOn.getOrElse("Unknown date")}
Ratings (White | Black): ${rating(c.whiteRating)} vs ${rating(c.blackRating)}
PGN:
${truncatePgn(c.pgn)}"""
  }

  val systemMessage: String =
    "You are a chess analyst. Score each candidate game for relevance to " +
      "the user's question. Provide concise, factual explanations " +
      "referencing the moves or strategic ideas (e.g., queenside pawn " +
      "majority)."

  def userMessage(plan: QueryIntent.Plan, blocks: Seq[String]): String = {
    val instructions =
      "Evaluate each candidate chess game for the user's question. For " +
        "every game, assign a relevance score between 0.0 and 1.0 (two " +
        "decimal precision) and explain why it matches or fails the " +
        "request. Scores must reflect confidence in the match, where 1.0 " +
        "represents a perfect match and 0.0 represents not relevant.\n\n" +
        "Return JSON that conforms to the provided schema with one entry " +
        "per evaluated game. If a game lacks sufficient information to " +
        "judge relevance, return a score of 0.0 and explain the " +
        "uncertainty.\n\nUser question: "
    s"$instructions${plan.cleanedText}\n\nCandidates:\n\n" +
      blocks.mkString("\n\n---\n\n")
  }

  // --- backend ---------------------------------------------------------

  final case class Usage(inputTokens: Option[Long], outputTokens: Option[Long],
      reasoningTokens: Option[Long])

  final case class Evaluation(gameId: String, score: Double,
      explanation: String)

  final case class Response(evaluations: Seq[Evaluation], usage: Usage)

  /** One batched evaluation call. A live HTTP backend would send
    * (system, user) with a JSON response schema and parse the content;
    * the deterministic backend derives scores from the same inputs.
    * Implementations throw on transient failure (Retry wraps the call).
    */
  trait Backend {
    def generate(effort: String, verbosity: String, system: String,
        user: String, candidates: Seq[Candidate],
        question: String): Response
  }

  /** Deterministic zero-egress backend.
    *
    * score(candidate) = (hex32(md5(question ' ' block)) % 101) / 100.0
    * where hex32 = first 8 hex chars of md5 as an unsigned 32-bit int
    * (the repo's canonical md5-derived hash, same shape as
    * DeterministicEmbedder.bucket). Two-decimal scores in [0.00, 1.00],
    * sensitive to both the question and every block field the reference
    * evaluator's prompt carries. Usage is estimated at 1 token per 4
    * chars of prompt (input) and 40 tokens per evaluated candidate
    * (output) -- deterministic so telemetry/cost tests are exact.
    */
  final class DeterministicBackend extends Backend with Serializable {
    def generate(effort: String, verbosity: String, system: String,
        user: String, candidates: Seq[Candidate],
        question: String): Response = {
      val evals = candidates.map { c =>
        Evaluation(c.gameId, score(question, candidateBlock(c)),
          s"deterministic[$effort/$verbosity]")
      }
      Response(evals, Usage(
        inputTokens = Some((system.length + user.length).toLong / 4),
        outputTokens = Some(40L * candidates.length),
        reasoningTokens = None))
    }
  }

  def score(question: String, block: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest((question + " " + block).getBytes("UTF-8"))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (v % 101L).toDouble / 100.0
  }

  // --- the Reranker implementation ------------------------------------

  /** Reranker over the agent tier: candidate rows (<= 25, A1) are
    * collected driver-side exactly like the reference's per-query
    * candidate list, PGNs fetched by id (R5), blocks chunked to bound
    * prompt size (E2 chunker), each batch called behind retry (E3) and
    * the circuit breaker (A5), scores clamped, telemetry logged (A6).
    *
    * @param games full games table (pgn lookup by candidate id)
    * @param limits prompt batching: the reference sends all <= 25
    *   candidates in ONE call; the char budget here bounds prompt size
    *   the same way the embedding chunker bounds payloads.
    */
  final class AgentReranker(
      games: DataFrame,
      backend: Backend = new DeterministicBackend,
      policy: Retry.Policy = Retry.Policy(),
      breaker: CircuitBreaker = new CircuitBreaker(),
      limits: Chunker.Limits = Chunker.Limits(maxItems = maxCandidates),
      telemetry: AgentTelemetry.Sink = AgentTelemetry.StderrSink,
      rates: AgentTelemetry.Rates = AgentTelemetry.Rates.fromEnv(),
      sleep: Long => Unit = Thread.sleep) extends Reranker {

    def scores(candidates: DataFrame, plan: QueryIntent.Plan): DataFrame = {
      val spark = candidates.sparkSession
      import spark.implicits._
      require(breaker.shouldAllow,
        "agent circuit breaker open; fall back to heuristic scoring")

      def optCol(n: String) =
        if (candidates.columns.contains(n)) col(n) else lit(null).cast("string")
      val metaRows = candidates.limit(maxCandidates).select(
        col("game_id"), optCol("white"), optCol("black"),
        optCol("result"), optCol("played_on_str"), optCol("eco_code"),
        optCol("opening_name"),
        optCol("white_rating").cast("int"), optCol("black_rating").cast("int"))
        .collect()
      if (metaRows.isEmpty) return Seq.empty[(String, Double, String)]
        .toDF("game_id", "agent_score", "explanation")

      val ids = metaRows.map(_.getString(0)).toSeq
      val pgns = Store.fetchGamePgns(games, ids)
        .as[(String, String)].collect().toMap
      val cands = metaRows.map { r =>
        Candidate(r.getString(0),
          Option(r.getString(1)).getOrElse(""),
          Option(r.getString(2)).getOrElse(""),
          Option(r.getString(3)), Option(r.getString(4)),
          Option(r.getString(5)), Option(r.getString(6)),
          if (r.isNullAt(7)) None else Some(r.getInt(7)),
          if (r.isNullAt(8)) None else Some(r.getInt(8)),
          pgns.getOrElse(r.getString(0), ""))
      }.toSeq

      val effort = effortForPlan(plan)
      val verbosity = verbosityForPlan(plan)
      // chunk candidates by their block sizes (order-preserving), then
      // regroup candidates to match the chunk boundaries.
      val blocks = cands.map(candidateBlock)
      val chunks = Chunker.chunk(blocks, limits)
      var rest = cands
      val batches = chunks.map { ch =>
        val (batch, tail) = rest.splitAt(ch.length)
        rest = tail
        batch
      }

      val evals = batches.flatMap { batch =>
        val user = userMessage(plan, batch.map(candidateBlock))
        val started = System.nanoTime()
        val resp =
          try {
            val r = Retry.withBackoff(policy, sleep = sleep)(
              backend.generate(effort, verbosity, systemMessage, user,
                batch, plan.cleanedText))
            breaker.recordSuccess()
            EngineMetrics.agentEvalTotal.inc(Seq("success"))
            EngineMetrics.agentEvalLatency.observe(
              (System.nanoTime() - started) / 1e9, Seq("success"))
            r
          } catch {
            case t: Throwable =>
              breaker.recordFailure()
              EngineMetrics.agentEvalTotal.inc(Seq("failure"))
              EngineMetrics.agentEvalLatency.observe(
                (System.nanoTime() - started) / 1e9, Seq("failure"))
              EngineMetrics.breakerState.set(
                if (breaker.state == "open") 1.0 else 0.0)
              throw t
          }
        EngineMetrics.breakerState.set(
          if (breaker.state == "open") 1.0 else 0.0)
        val latencyMs = (System.nanoTime() - started) / 1e6
        val tokens = AgentTelemetry.Tokens(resp.usage.inputTokens,
          resp.usage.outputTokens, resp.usage.reasoningTokens)
        telemetry.log(AgentTelemetry.Record(
          timestampMs = System.currentTimeMillis(),
          question = AgentTelemetry.truncateQuestion(plan.cleanedText),
          candidateCount = batch.length,
          evaluated = resp.evaluations.length,
          reasoningEffort = effort,
          latencyMs = latencyMs,
          tokens = tokens,
          cost = AgentTelemetry.cost(tokens, rates)))
        resp.evaluations
      }

      evals.map(e => (e.gameId,
        math.max(0.0, math.min(1.0, e.score)), // clamp, agent_evaluator.ml:196
        e.explanation))
        .toDF("game_id", "agent_score", "explanation")
    }
  }
}

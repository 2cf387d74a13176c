package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Optional agent re-ranking tier (reference §2.7: agent_evaluator.ml,
  * hybrid_executor.ml:235-240). Disabled by default -- exactly the
  * reference with no AGENT_API_KEY. A live LLM backend would implement
  * `scores` with batched remote calls behind Retry/Chunker; tests use
  * deterministic mocks (mirroring test_query.ml:258-283's injected
  * evaluator).
  */
trait Reranker extends Serializable {
  /** (game_id, agent_score in [0,1], explanation) for <= n candidates. */
  def scores(candidates: DataFrame, plan: QueryIntent.Plan): DataFrame
}

object Reranker {

  val candidateMultiplier = 5 // config.ml:99
  val candidateMax = 25 // config.ml:100
  val heuristicWeight = 0.6 // hybrid_executor.ml:239
  val agentWeight = 0.4

  def candidateCount(limit: Int): Int =
    math.min(candidateMax, math.max(limit, limit * candidateMultiplier))

  /** A3 blend: total = min(1, 0.6*heuristic + 0.4*agent); rows without an
    * agent score keep the heuristic total.
    */
  def blend(total: Column, agentScore: Column): Column =
    when(agentScore.isNotNull,
      least(lit(1.0), lit(heuristicWeight) * total +
        lit(agentWeight) * least(greatest(agentScore, lit(0.0)), lit(1.0))))
      .otherwise(total)

  /** Apply a reranker to ranked hybrid results: score top candidates,
    * blend, re-sort. Candidates frame is tiny (<= 25 rows) -- broadcast.
    */
  def apply(ranked: DataFrame, plan: QueryIntent.Plan,
      reranker: Reranker): DataFrame = {
    val n = candidateCount(plan.limit)
    val candidates = ranked.limit(n)
    val scored = reranker.scores(candidates, plan)
      .select(col("game_id"), col("agent_score"), col("explanation"))
    ranked.join(broadcast(scored), Seq("game_id"), "left")
      .withColumn("total_score", blend(col("total_score"), col("agent_score")))
      .orderBy(desc("total_score"), col("played_on_str").desc_nulls_last,
        col("game_id").desc)
  }

  /** The reference's degraded agent behavior (hybrid_executor.ml
    * evaluate_agent error paths): on ANY agent-tier failure -- breaker
    * open, retries exhausted, PGN fetch error -- the query KEEPS its
    * heuristic ranking, gains null agent columns for schema symmetry,
    * and surfaces a warning instead of failing.
    */
  def applyOrFallback(ranked: DataFrame, plan: QueryIntent.Plan,
      reranker: Reranker): (DataFrame, Seq[String]) =
    try {
      (apply(ranked, plan, reranker), Seq.empty)
    } catch {
      case scala.util.control.NonFatal(t) =>
        (ranked
          .withColumn("agent_score", lit(null).cast("double"))
          .withColumn("explanation", lit(null).cast("string")),
          Seq("Agent evaluation failed; keeping heuristic ranking: " +
            t.getMessage))
    }
}

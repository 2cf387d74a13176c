package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.query.QueryIntent.{MetadataFilter, Plan, RatingFilter}

/** Plan -> Catalyst predicates. ONE compiler for both targets: the
  * reference splits predicate compilation between SQL WHERE clauses
  * (repo_postgres_caqti.ml:137-205) and Qdrant payload filters
  * (hybrid_planner.ml:18-53); on Spark both sides are Columns and Catalyst
  * pushes them into the parquet scans.
  *
  * Field whitelist preserved exactly -- unknown fields are silently
  * dropped (SQL-injection-safety parity, test_sql_filters.ml:8-35).
  */
object PlanCompiler {

  /** eco_range value: "A10-A39" -> Range, else Exact (uppercased). */
  def ecoFilter(value: String): Either[String, (String, String)] = {
    val v = value.trim.toUpperCase
    v.split("-", -1) match {
      case Array(lo, hi) if lo.nonEmpty && hi.nonEmpty => Right((lo, hi))
      case _ => Left(v)
    }
  }

  private def ecoPred(col0: Column, value: String): Column =
    ecoFilter(value) match {
      case Right((lo, hi)) => upper(col0).between(lo, hi)
      case Left(exact) => upper(col0) === exact
    }

  /** Game-side predicate (R1). Column names follow the summary frame built
    * by HybridExecutor: white/black are joined player names.
    */
  def gameFilter(f: MetadataFilter): Option[Column] =
    f.field.toLowerCase match {
      case "opening" | "opening_slug" =>
        Some(lower(col("opening_slug")) === f.value.toLowerCase)
      case "event" => Some(lower(col("event")) === f.value.toLowerCase)
      case "result" => Some(col("result") === f.value)
      case "white" => Some(lower(col("white")) === f.value.toLowerCase)
      case "black" => Some(lower(col("black")) === f.value.toLowerCase)
      case "eco_range" => Some(ecoPred(col("eco_code"), f.value))
      case "vector_only" =>
        // game has at least one embedded position; compiled by the
        // executor as a semi-join flag instead of a scalar predicate.
        None
      case _ => None // unknown fields silently dropped
    }

  /** R2: rating predicates with NOT NULL guards. */
  def ratingPredicate(r: RatingFilter): Column = {
    val preds = Seq(
      r.whiteMin.map(v => col("white_rating").isNotNull &&
        col("white_rating") >= v),
      r.blackMin.map(v => col("black_rating").isNotNull &&
        col("black_rating") >= v),
      r.maxRatingDelta.map(d => col("white_rating").isNotNull &&
        col("black_rating").isNotNull &&
        abs(col("white_rating") - col("black_rating")) <= d)
    ).flatten
    preds.reduceOption(_ && _).getOrElse(lit(true))
  }

  def gamePredicate(plan: Plan): Column =
    (plan.filters.flatMap(gameFilter) :+ ratingPredicate(plan.rating))
      .reduce(_ && _)

  /** Vector-side payload predicate (V1): opening/phase/theme/result +
    * rating gte; eco_range deliberately NOT pushed (delegated to the
    * game-side predicate -- hybrid_planner.ml:34).
    */
  def vectorPredicate(plan: Plan): Column = {
    val filterPreds = plan.filters.flatMap { f =>
      f.field.toLowerCase match {
        case "opening" =>
          Some(lower(col("opening_slug")) === f.value.trim.toLowerCase)
        case "phase" =>
          Some(array_contains(col("phases"), f.value.trim.toLowerCase))
        case "theme" =>
          Some(array_contains(col("themes"), f.value.trim.toLowerCase))
        case "result" => Some(col("result") === f.value.trim)
        case _ => None
      }
    }
    val ratingPreds = Seq(
      plan.rating.whiteMin.map(v => col("white_elo") >= v),
      plan.rating.blackMin.map(v => col("black_elo") >= v)).flatten
    (filterPreds ++ ratingPreds).reduceOption(_ && _).getOrElse(lit(true))
  }

  /** In-memory post-filter match (V7 / fallback scoring): opening, result,
    * eco_range re-checked; phase/theme/unknown count as matched
    * (hybrid_executor.ml filter_matches -> `_ -> true`).
    */
  def filterMatchCol(f: MetadataFilter): Column =
    f.field.toLowerCase match {
      case "opening" =>
        coalesce(col("opening_slug"), lit("unknown_opening")) ===
          f.value.toLowerCase
      case "result" => coalesce(col("result"), lit("*")) === f.value
      case "eco_range" =>
        col("eco_code").isNotNull && ecoPred(col("eco_code"), f.value)
      case _ => lit(true)
    }
}

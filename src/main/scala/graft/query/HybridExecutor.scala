package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.embed.{DeterministicEmbedder, Embedder}
import graft.functions.VectorFunctions._
import graft.query.QueryIntent.Plan

/** The hybrid retrieval engine (reference lib/query/hybrid_executor.ml),
  * as ONE DataFrame DAG per query:
  *
  *   games x players  --filter/sort/page-->  summaries (date-ordered page)
  *   vectors --payload-filter--> cosine top-k --> per-game hit collapse
  *   summaries LEFT JOIN hits --> score columns --> stable sort --> limit
  *
  * Scale notes:
  *   - Both the game page and the KNN are `orderBy(...).limit(n)` =>
  *     Catalyst TakeOrderedAndProject: per-partition top-k then a single
  *     tiny merge -- no global sort, no single-partition shuffle at any
  *     data size.
  *   - The hit frame is <= max(3*limit,15) rows => broadcast join.
  *   - Pagination windows only ever run over the already-limited page
  *     (<= offset+limit <= 1000 rows), never the full table.
  */
object HybridExecutor {

  /** @param summariesPrebuilt optional materialized summaries projection
    *   (games x players already joined, [[summaries]] shape). The
    *   reference queries a warm, indexed game_summary view per request;
    *   the Spark analog is building the projection once (cached or
    *   written bucketed) and reusing it across queries instead of
    *   re-joining the player dimension per query.
    */
  final case class Tables(games: DataFrame, players: DataFrame,
      vectors: Option[DataFrame],
      summariesPrebuilt: Option[DataFrame] = None)

  final case class Execution(results: DataFrame, total: Long, hasMore: Boolean,
      warnings: Seq[String])

  val vectorWeight = 0.75
  val keywordWeight = 0.25
  val agentWeight = 0.4 // total = min(1, 0.6*heuristic + 0.4*agent)

  /** games x players(x2) -> the reference's game_summary shape
    * (repo_postgres_caqti.ml:215-227). No forced broadcast hint: the
    * player dimension grows with the corpus (1e8+ players at design
    * scale would OOM a forced broadcast); AQE broadcasts it when the
    * runtime size is actually small, and the bucketed-table path keeps
    * the sort-merge alternative shuffle-free.
    */
  def summaries(games: DataFrame, players: DataFrame): DataFrame = {
    val w = players.select(col("id").as("white_player_id"),
      col("name").as("white"))
    val b = players.select(col("id").as("black_player_id"),
      col("name").as("black"))
    games
      .join(w, Seq("white_player_id"), "left")
      .join(b, Seq("black_player_id"), "left")
      .select(col("game_id"), coalesce(col("white"), lit("")).as("white"),
        coalesce(col("black"), lit("")).as("black"), col("event"),
        col("played_on"), date_format(col("played_on"), "yyyy-MM-dd")
          .as("played_on_str"),
        col("eco_code"), col("opening_name"), col("opening_slug"),
        col("result"), col("white_rating"), col("black_rating"))
  }

  /** Summary keyword tokens (V8): alnum runs of length >= 3 from
    * white/black/event/opening_name/opening_slug, lowercased, dedup-sorted.
    */
  def summaryTokensCol: Column = {
    val src = concat_ws(" ", col("white"), col("black"), col("event"),
      col("opening_name"), col("opening_slug"))
    array_sort(array_distinct(filter(
      split(lower(src), "[^a-z0-9]+"), t => length(t) >= 3)))
  }

  /** Deterministic query vector (query_embedding_provider.ml:27-42):
    * tokens = keywords if non-empty else [cleaned_text], mean of per-token
    * buckets per dim.
    */
  def queryVector(plan: Plan, embedder: DeterministicEmbedder): Array[Double] = {
    val tokens =
      if (plan.keywords.nonEmpty) plan.keywords else List(plan.cleanedText)
    val dims = embedder.dims
    val out = new Array[Double](dims)
    if (tokens.isEmpty) return out
    var d = 0
    while (d < dims) {
      var sum = 0L
      tokens.foreach { t => sum += embedder.bucket(t, d) }
      out(d) = math.max(0.0, math.min(1.0,
        sum.toDouble / (tokens.length * 10000.0)))
      d += 1
    }
    out
  }

  /** V3+V5: payload-filtered cosine top-k, collapsed per game
    * (score=max, lists=lowercased dedup-sorted unions).
    */
  def vectorHits(vectors: DataFrame, plan: Plan, qv: Array[Double]): DataFrame = {
    val k = math.max(3 * plan.limit, 15)
    val lower_ = (c: Column) => transform(c, x => lower(x))
    vectors
      .where(PlanCompiler.vectorPredicate(plan))
      .withColumn("score",
        normalizeScore(graft.functions.CosineSimilarity(col("embedding"),
          org.apache.spark.sql.functions.typedLit(qv.toSeq))))
      .orderBy(desc("score"), desc("vector_id"))
      .limit(k)
      .groupBy("game_id")
      // typed Aggregator (TagUnionAgg): buffer = distinct tag set with
      // map-side partial agg, not every hit's list via collect_list
      .agg(max("score").as("hit_score"),
        graft.functions.TagUnionAgg.lowerSortedUnion(col("phases"))
          .as("hit_phases"),
        graft.functions.TagUnionAgg.lowerSortedUnion(col("themes"))
          .as("hit_themes"),
        graft.functions.TagUnionAgg.lowerSortedUnion(col("keywords"))
          .as("hit_keywords"))
  }

  /** Full execution of a plan.
    *
    * @param computeTotal when true (the reference always pays it:
    *   repo_postgres_caqti.ml:293), the exact filtered total is
    *   piggybacked onto the page scan via `Observation`/CollectMetrics
    *   -- TakeOrderedAndProject consumes every input row, so the count
    *   rides the SAME single pass instead of a second full scan; the
    *   page is materialized inside this call to resolve the metric.
    *   When false, skips the count (total = -1, hasMore unknown) and
    *   returns a lazy frame.
    */
  def execute(spark: SparkSession, tables: Tables, plan: Plan,
      embedder: DeterministicEmbedder = DeterministicEmbedder(),
      computeTotal: Boolean = true): Execution = {
    val started = System.nanoTime()
    try {
      val e = execute0(spark, tables, plan, embedder, computeTotal)
      EngineMetrics.requestsTotal.inc(Seq("hybrid", "ok"))
      EngineMetrics.requestLatency.observe(
        (System.nanoTime() - started) / 1e9, Seq("hybrid"))
      e
    } catch {
      case t: Throwable =>
        EngineMetrics.requestsTotal.inc(Seq("hybrid", "error"))
        throw t
    }
  }

  private def execute0(spark: SparkSession, tables: Tables, plan: Plan,
      embedder: DeterministicEmbedder,
      computeTotal: Boolean): Execution = {

    val base = tables.summariesPrebuilt
      .getOrElse(summaries(tables.games, tables.players))
    val prefiltered = base.where(PlanCompiler.gamePredicate(plan))
    // R1 vector_only: semi/anti-join against embedded game ids (the
    // reference's `positions.vector_id IS (NOT) NULL` EXISTS clause).
    val filtered0 = plan.filters.find(_.field.toLowerCase == "vector_only")
      .flatMap { f =>
        tables.vectors.map { v =>
          val embedded = v.select("game_id").distinct()
          val joinType =
            if (f.value.trim.toLowerCase == "false") "left_anti" else "left_semi"
          prefiltered.join(embedded, Seq("game_id"), joinType)
        }
      }.getOrElse(prefiltered)
    // R3 page: played_on DESC NULLS LAST, id DESC; TakeOrderedAndProject.
    val pageOrder = Seq(col("played_on").desc_nulls_last, col("game_id").desc)
    val pageLimit = plan.offset + plan.limit
    // QueryIntent.analyse clamps limit (<= maxLimit) but preserves any
    // requested offset (reference parity: query_intent.ml only enforces
    // offset >= 0). This guard is therefore the real gate: pages up to
    // maxOffset+maxLimit rows take the single-pass Observation path and
    // are collected to the driver; anything larger (a client paging past
    // 5000, or a hand-built Plan) falls back to two distributed actions
    // (lazy count + lazy window page) instead of being truncated.
    val collectSafe =
      pageLimit <= QueryIntent.maxOffset + QueryIntent.maxLimit
    val obs = if (computeTotal && collectSafe)
      Some(org.apache.spark.sql.Observation()) else None
    val filtered = obs.map(o =>
      filtered0.observe(o, count(lit(1)).as("total"))).getOrElse(filtered0)
    // With computeTotal the page is collected HERE, as the terminal op of
    // its own action: a terminal orderBy.limit.collect() runs as
    // TakeOrderedAndProject.executeCollect (per-partition top-k + driver
    // merge, NO exchange above the metrics node), so the observed count
    // rides the same single pass. Leaving the page lazy instead plans the
    // downstream re-sort as a global Sort whose range-partitioning
    // exchange SAMPLES its input -- an extra pass over the observed
    // subtree that double-counts the metric (and an extra scan at scale).
    // The collected page is <= offset+limit rows, and collectSafe bounds
    // that by QueryIntent.maxOffset + maxLimit (= 5,500 small summary
    // rows) by design; offset is applied by dropping the already-sorted
    // prefix, exactly what the row_number window does on the lazy path.
    val (page, total) = obs match {
      case Some(o) =>
        val rows = filtered.orderBy(pageOrder: _*).limit(pageLimit).collect()
        val local = spark.createDataFrame(
          java.util.Arrays.asList(rows.drop(plan.offset): _*),
          org.apache.spark.sql.types.StructType(filtered.schema))
        val t = o.get("total") match {
          case n: Long => n
          case n: Number => n.longValue()
        }
        (local, t)
      case None =>
        val page0 = filtered.orderBy(pageOrder: _*).limit(pageLimit)
        val lazyPage = if (plan.offset == 0) page0 else {
          // window over <= offset+limit rows only (already limited above).
          val wspec = Window.orderBy(pageOrder: _*)
          page0.withColumn("__rn", row_number().over(wspec))
            .where(col("__rn") > plan.offset).drop("__rn")
        }
        val t = if (computeTotal) filtered0.count() else -1L
        (lazyPage, t)
    }

    // Vector stage (degrades to fallback scoring when no vectors table --
    // the reference's "vector search unavailable" path).
    val (withHits, warnings) = tables.vectors match {
      case Some(vectors) =>
        val qv = queryVector(plan, embedder)
        EngineMetrics.queryEmbeddingTotal.inc(Seq("deterministic"))
        val hits = vectorHits(vectors, plan, qv)
        (page.join(broadcast(hits), Seq("game_id"), "left"), Seq.empty[String])
      case None =>
        (page.withColumn("hit_score", lit(null).cast("double"))
          .withColumn("hit_phases", lit(null).cast("array<string>"))
          .withColumn("hit_themes", lit(null).cast("array<string>"))
          .withColumn("hit_keywords", lit(null).cast("array<string>")),
          Seq("Vector search unavailable (no vectors table)"))
    }

    val ratingMatch = PlanCompiler.ratingPredicate(plan.rating)

    // V10 fallback score for games without a vector hit.
    val fallback: Column =
      if (plan.filters.isEmpty) when(ratingMatch, 0.6).otherwise(0.0)
      else {
        val matched = plan.filters.map(f =>
          when(PlanCompiler.filterMatchCol(f), 1).otherwise(0))
          .reduce(_ + _)
        when(!ratingMatch, 0.0)
          .otherwise(lit(0.4) + lit(0.6) * matched / lit(plan.filters.size))
      }

    val vectorScore =
      when(col("hit_score").isNotNull,
        when(ratingMatch, least(col("hit_score"), lit(1.0))).otherwise(0.0))
        .otherwise(fallback)

    // V8/V9 keyword overlap over summary tokens merged with hit keywords.
    val tokens = when(col("hit_keywords").isNotNull,
      array_sort(array_distinct(concat(summaryTokensCol, col("hit_keywords")))))
      .otherwise(summaryTokensCol)
    val kwArray = array(plan.keywords.map(lit): _*)
    val keywordScore =
      if (plan.keywords.isEmpty) lit(0.0)
      else size(array_intersect(kwArray, col("tokens"))).cast("double") /
        lit(math.max(1, plan.keywords.size)).cast("double")

    val planPhases = plan.filters.filter(_.field == "phase").map(_.value)
      .distinct.sorted
    val planThemes = plan.filters.filter(_.field == "theme").map(_.value)
      .distinct.sorted
    def mergedList(planList: Seq[String], hitCol: Column): Column = {
      val planArr = if (planList.isEmpty) array().cast("array<string>")
        else array(planList.map(lit): _*)
      when(hitCol.isNotNull && size(hitCol) > 0,
        array_sort(array_distinct(concat(planArr, hitCol))))
        .otherwise(planArr)
    }

    val scored = withHits
      .withColumn("tokens", tokens)
      .withColumn("vector_score", vectorScore)
      .withColumn("keyword_score", keywordScore)
      .withColumn("total_score",
        lit(vectorWeight) * col("vector_score") +
          lit(keywordWeight) * col("keyword_score"))
      .withColumn("phases", mergedList(planPhases, col("hit_phases")))
      .withColumn("themes", mergedList(planThemes, col("hit_themes")))
      .withColumn("keywords",
        array_sort(array_distinct(concat(
          array(plan.keywords.map(k => lit(k.toLowerCase)): _*),
          col("tokens")))))

    // V13: stable sort -- score desc, ties keep the page's date order
    // (OCaml List.sort is stable; Spark orderBy is not, so the original
    // order keys are explicit tiebreakers).
    val ranked = scored
      .orderBy(desc("total_score"), col("played_on").desc_nulls_last,
        col("game_id").desc)
      .limit(plan.limit)
      .select("game_id", "white", "black", "event", "played_on_str",
        "eco_code", "opening_name", "opening_slug", "result",
        "white_rating", "black_rating", "total_score", "vector_score",
        "keyword_score", "phases", "themes", "keywords")

    val hasMore =
      if (computeTotal) {
        val returned = math.min(plan.limit.toLong,
          math.max(0L, total - plan.offset))
        plan.offset + returned < total
      } else false // unknown without the count; callers opted out
    Execution(ranked, total, hasMore, warnings = warnings)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import graft.core.Fixtures
import graft.embed.{DeterministicEmbedder, VectorsJob}
import graft.ingest.IngestJob
import graft.query.{HybridExecutor, PlanCompiler, QueryIntent, ResultFormatter}

/** Hybrid executor semantics, mirroring the reference unit suite
  * (test/test_query.ml): scoring weights, fallback paths, pagination,
  * and the English-opening session documented in README.md:275-288.
  */
class HybridExecutorSpec extends SparkSpec {

  private lazy val tables = {
    import spark.implicits._
    val files = spark.createDataset(Fixtures.all)
    IngestJob.tables(spark, IngestJob.gamesFromText(spark, files))
  }
  private lazy val embedder = DeterministicEmbedder(dims = 16)
  private lazy val vectors = VectorsJob.build(spark, tables.games,
    tables.players, tables.positions, embedder)
  private def exec(question: String, limit: Option[Int] = None,
      offset: Option[Int] = None, withVectors: Boolean = true) = {
    val plan = QueryIntent.analyse(QueryIntent.Request(question, limit, offset))
    HybridExecutor.execute(spark,
      HybridExecutor.Tables(tables.games, tables.players,
        if (withVectors) Some(vectors) else None),
      plan, embedder)
  }

  test("no filters, no vectors: fallback score 0.6 * 0.75 weight") {
    val e = exec("anything at all", limit = Some(10), withVectors = false)
    assert(e.total == 3)
    assert(e.warnings.exists(_.contains("Vector search unavailable")))
    val rows = e.results.collect()
    assert(rows.length == 3)
    // vector fallback = 0.6 (no filters); keyword overlap 0 -> total 0.45.
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("vector_score") - 0.6) < 1e-9)
      assert(math.abs(r.getAs[Double]("total_score") - 0.45) < 1e-9)
    }
  }

  test("result filter narrows the page (R1) and fallback hits 1.0") {
    val e = exec("show black wins", limit = Some(10), withVectors = false)
    // only the extended fixture is 0-1.
    assert(e.total == 1)
    val r = e.results.collect().head
    assert(r.getAs[String]("result") == "0-1")
    // filters nonempty + all matched -> fallback 0.4+0.6 = 1.0.
    assert(math.abs(r.getAs[Double]("vector_score") - 1.0) < 1e-9)
  }

  test("rating threshold filters games via R2") {
    val e = exec("games where white rated at least 2500", limit = Some(10),
      withVectors = false)
    // extended fixture: WhiteElo 2568 -> only match.
    assert(e.total == 1)
    val r = e.results.collect().head
    assert(r.getAs[Int]("white_rating") >= 2500)
  }

  test("vector path: hits boost games and scores stay in [0,1]") {
    val e = exec("kingside attack in the endgame", limit = Some(10))
    val rows = e.results.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Double]("total_score")
      assert(t >= 0.0 && t <= 1.0)
    }
  }

  test("pagination: offset beyond total -> empty page, has_more false") {
    val e = exec("anything", limit = Some(2), offset = Some(5),
      withVectors = false)
    assert(e.total == 3)
    assert(e.results.collect().isEmpty)
    assert(!e.hasMore)
  }

  test("pagination: offset 0 limit 2 of 3 -> has_more true") {
    val e = exec("anything", limit = Some(2), withVectors = false)
    assert(e.results.collect().length == 2)
    assert(e.hasMore)
  }

  test("pagination: offset past maxOffset is preserved, not clamped") {
    // Reference parity (query_intent.ml enforces only offset >= 0): a
    // client paging past 5000 gets the lazy two-action path and an empty
    // page -- never page-5000's rows.
    val plan = QueryIntent.analyse(QueryIntent.Request("anything",
      Some(2), Some(QueryIntent.maxOffset + 1000)))
    assert(plan.offset == QueryIntent.maxOffset + 1000)
    val e = exec("anything", limit = Some(2),
      offset = Some(QueryIntent.maxOffset + 1000), withVectors = false)
    assert(e.total == 3)
    assert(e.results.collect().isEmpty)
    assert(!e.hasMore)
  }

  test("batch execution is byte-identical to per-query execution") {
    val questions = Seq(
      "anything at all",
      "show black wins",
      "games where white rated at least 2500",
      "kingside attack in the endgame",
      "english opening games",
      "best games", // repeated intents amortize too
      "show draws after 1990",
      "find top games where black is rated at least 2400",
      "queens gambit declined",
      "tactical middlegame sacrifices")
    val plans = questions.map(q =>
      QueryIntent.analyse(QueryIntent.Request(q, Some(5))))
    val t = HybridExecutor.Tables(tables.games, tables.players, Some(vectors))
    val batch = HybridExecutor.executeBatch(spark, t, plans, embedder)
    assert(batch.length == plans.length)
    plans.zip(batch).foreach { case (plan, b) =>
      val single = HybridExecutor.execute(spark, t, plan, embedder)
      assert(b.total == single.total, s"total for '${plan.cleanedText}'")
      assert(b.hasMore == single.hasMore)
      assert(b.results.collect().toSeq == single.results.collect().toSeq,
        s"rows for '${plan.cleanedText}'")
    }
    // offset paging agrees too (window-over-page branch)
    val off = QueryIntent.analyse(
      QueryIntent.Request("anything", Some(2), Some(1)))
    val bOff = HybridExecutor.executeBatch(spark, t, Seq(off), embedder).head
    val sOff = HybridExecutor.execute(spark, t, off, embedder)
    assert(bOff.results.collect().toSeq == sOff.results.collect().toSeq)
    assert(bOff.total == sOff.total && bOff.hasMore == sOff.hasMore)
    // no-vectors degradation carries the warning per plan
    val nv = HybridExecutor.Tables(tables.games, tables.players, None)
    val bNv = HybridExecutor.executeBatch(spark, nv, Seq(plans.head), embedder)
    assert(bNv.head.warnings.exists(_.contains("Vector search unavailable")))
  }

  test("keyword overlap contributes 0.25-weighted score") {
    // 'smyslov' appears in the extended game's Black name.
    val e = exec("find smyslov games", limit = Some(10), withVectors = false)
    val rows = e.results.collect()
    val smy = rows.find(_.getAs[String]("black").toLowerCase.contains("smyslov")).get
    val other = rows.find(!_.getAs[String]("black").toLowerCase.contains("smyslov")).get
    assert(smy.getAs[Double]("keyword_score") > other.getAs[Double]("keyword_score"))
    assert(smy.getAs[Double]("total_score") > other.getAs[Double]("total_score"))
  }

  test("eco_range predicate compiles to BETWEEN semantics") {
    import graft.query.QueryIntent.MetadataFilter
    val pred = PlanCompiler.gameFilter(MetadataFilter("eco_range", "E60-E99")).get
    val df = tables.games.where(pred)
    // extended fixture is E11 -> excluded; none of the fixtures are E60+.
    assert(df.count() == 0)
    val pred2 = PlanCompiler.gameFilter(MetadataFilter("eco_range", "E00-E59")).get
    assert(tables.games.where(pred2).count() == 1)
  }

  test("unknown filter fields are silently dropped (injection safety)") {
    import graft.query.QueryIntent.MetadataFilter
    assert(PlanCompiler.gameFilter(
      MetadataFilter("opening; DROP TABLE games", "x")).isEmpty)
  }

  test("result formatter: synopsis, year, slug prettification") {
    assert(ResultFormatter.prettifySlug("kings_indian_defense") ==
      "Kings Indian Defense")
    assert(ResultFormatter.yearOf(Some("1994-05-12")).contains(1994))
    assert(ResultFormatter.yearOf(Some("????")).isEmpty)
    assert(ResultFormatter.synopsis("7f00ba", "A", "B", 0.875) ==
      "#7f00ba A vs B (score 0.88)")
  }
}

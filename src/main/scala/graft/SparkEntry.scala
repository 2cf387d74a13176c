package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.gate.RelationalQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * end-to-end hybrid search over the ingested fixture corpus.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val files = spark.createDataset(graft.core.Fixtures.all)
    val t = graft.ingest.IngestJob.tables(spark,
      graft.ingest.IngestJob.gamesFromText(spark, files))
    val embedder = graft.embed.DeterministicEmbedder(dims = 64)
    val vectors = graft.embed.VectorsJob.build(spark, t.games, t.players,
      t.positions, embedder)
    val plan = graft.query.QueryIntent.analyse(
      graft.query.QueryIntent.Request("show me the best games", Some(10)))
    graft.query.HybridExecutor.execute(spark,
      graft.query.HybridExecutor.Tables(t.games, t.players, Some(vectors)),
      plan, embedder).results
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ graft.gate.ChessQueries.queries ++
      graft.gate.LlmQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ graft.gate.ChessQueries.oracles ++
      graft.gate.LlmQueries.oracles

  /** Oracles whose SQL embeds data-derived constants (e.g. llm_ann_ivf's
    * trained centroids as a VALUES table) -- built by Verify with the
    * live session + sf dir and merged into oracle_sql.json.
    */
  def dynamicOracleSql(spark: SparkSession,
      sfDir: String): Map[String, String] =
    graft.gate.LlmQueries.dynamicOracles(spark, sfDir)
}

package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.Fixtures
import graft.embed.{DeterministicEmbedder, Embedder, VectorsJob}
import graft.ingest.IngestJob

/** Embeds normally, except: fens with side-to-move 'b' -> null (a backend
  * that exhausted its retries). Top-level class: embedders ship to
  * executors inside the VectorsJob UDF, so they must be serializable
  * WITHOUT capturing the test suite.
  */
private class FlakyEmbedder extends Embedder {
  private val inner = DeterministicEmbedder(8)
  def dims: Int = 8
  def embed(text: String): Array[Double] =
    if (text.contains(" b ")) null else inner.embed(text)
  def embedCol(text: Column): Column =
    when(text.contains(" b "), lit(null).cast("array<double>"))
      .otherwise(inner.embedCol(text))
}

/** Claims 8 dims, produces 4 -- every embedding lands in the ledger. */
private class ShortEmbedder extends Embedder {
  def dims: Int = 8
  private val inner = DeterministicEmbedder(4)
  def embed(text: String): Array[Double] = inner.embed(text)
  def embedCol(text: Column): Column = inner.embedCol(text)
}

/** E6 failure ledger: invalid embeddings land in the failures frame with
  * attempts/last_error, and never reach the vectors table.
  */
class VectorsLedgerSpec extends SparkSpec {

  private lazy val tables = {
    import spark.implicits._
    val files = spark.createDataset(Fixtures.all)
    IngestJob.tables(spark, IngestJob.gamesFromText(spark, files))
  }

  test("failed embeds land in the ledger, not the vectors table") {
    val r = VectorsJob.buildWithLedger(spark, tables.games, tables.players,
      tables.positions, new FlakyEmbedder, attempts = 3)
    val posCount = tables.positions.count()
    val blackToMove = tables.positions
      .where(col("fen").contains(" b ")).select("vector_id").distinct().count()
    val distinctAll = tables.positions.select("vector_id").distinct().count()

    val failures = r.failures.collect()
    assert(failures.length == blackToMove)
    assert(failures.forall(_.getAs[String]("last_error") == "null_embedding"))
    assert(failures.forall(_.getAs[Int]("attempts") == 3))
    assert(failures.forall(f =>
      Option(f.getAs[String]("fen_preview")).exists(_.nonEmpty)))

    // vectors: only positions whose fen embedded; none with null embedding
    assert(r.vectors.where(col("embedding").isNull).count() == 0)
    val vectorIds = r.vectors.select("vector_id").distinct().count()
    assert(vectorIds == distinctAll - blackToMove)
    assert(r.vectors.count() < posCount)
  }

  test("wrong-dims embeddings are classified distinctly") {
    import spark.implicits._
    val r = VectorsJob.buildWithLedger(spark, tables.games, tables.players,
      tables.positions, new ShortEmbedder)
    assert(r.vectors.count() == 0)
    assert(r.failures.select("last_error").as[String].collect()
      .forall(_ == "wrong_dims"))
  }

  test("healthy embedder: empty ledger; build() = vectors projection") {
    val r = VectorsJob.buildWithLedger(spark, tables.games, tables.players,
      tables.positions, DeterministicEmbedder(8))
    assert(r.failures.count() == 0)
    val direct = VectorsJob.build(spark, tables.games, tables.players,
      tables.positions, DeterministicEmbedder(8))
    assert(direct.count() == r.vectors.count())
  }
}

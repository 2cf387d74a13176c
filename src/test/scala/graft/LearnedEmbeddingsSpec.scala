package graft

import org.apache.spark.sql.functions._
import graft.llmops.LearnedEmbeddings

class LearnedEmbeddingsSpec extends SparkSpec {

  private def docsOf(texts: (Long, String)*) = {
    import spark.implicits._
    texts.toDF("doc_id", "text")
  }

  test("skipGramPairs: exact window semantics, empty docs drop") {
    val df = docsOf(0L -> "a b c d", 1L -> "", 2L -> "x")
    val got = LearnedEmbeddings.skipGramPairs(df, "text", window = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    // positions 1..4: each token pairs with its immediate neighbors
    assert(got == Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b",
      "c" -> "d", "d" -> "c").sorted)
    // single-token and empty docs emit nothing
    assert(LearnedEmbeddings.skipGramPairs(docsOf(0L -> "solo"), "text",
      window = 3).count() == 0)
  }

  test("ppmiCells: symmetric counts, strictly positive micros") {
    val df = docsOf(
      0L -> "cat purrs cat purrs cat naps",
      1L -> "dog barks dog barks dog naps",
      2L -> "cat purrs dog barks")
    val cells = LearnedEmbeddings.ppmiCells(df, "text", vocabSize = 10,
      window = 2).collect()
    assert(cells.nonEmpty)
    assert(cells.forall(_.getLong(3) > 0))
    // symmetric window => symmetric co-occurrence matrix
    val byPair = cells.map(r =>
      (r.getString(1), r.getString(0)) -> r.getLong(2)).toMap
    cells.foreach { r =>
      assert(byPair((r.getString(0), r.getString(1))) == r.getLong(2))
    }
  }

  test("termEmbeddings: exact repartition invariance (integer protocol)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") < 100)
    def rows(df: org.apache.spark.sql.DataFrame) =
      LearnedEmbeddings.termEmbeddings(df, "text", vocabSize = 20,
        window = 3, dims = 4)
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .toSet
    val base = rows(docs)
    assert(base.nonEmpty)
    assert(rows(docs.repartition(7)) == base)
    assert(rows(docs.coalesce(1)) == base)
  }

  test("termEmbeddings: vocab-prefiltered pair stream equals the " +
    "join-based relational construction (r21 fast path)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") < 120)
    val (vocabSize, window, dims, seed) = (20, 3, 4, "emb")
    val got = LearnedEmbeddings.termEmbeddings(docs, "text", vocabSize,
      window, dims)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .toSet
    // reference: unfiltered skipGramPairs -> inner joins on the
    // distinct vocab -> the identical PPMI + signed-projection chain
    val vocab = broadcast(
      LearnedEmbeddings.topVocab(docs, "text", vocabSize))
    val cooc = LearnedEmbeddings.skipGramPairs(docs, "text", window)
      .join(vocab.select(col("token").as("t")), "t")
      .join(vocab.select(col("token").as("c")), "c")
      .groupBy("t", "c").agg(count(lit(1)).as("cnt"))
    val marg = cooc.groupBy("t").agg(sum("cnt").cast("long").as("m"))
    val tot = cooc.agg(sum("cnt").cast("long").as("tt"))
    val want = cooc
      .join(broadcast(marg.select(col("t"), col("m").as("mt"))), "t")
      .join(broadcast(marg.select(col("t").as("c"), col("m").as("mc"))),
        "c")
      .crossJoin(broadcast(tot))
      .withColumn("ppmi_micro",
        floor(log((col("cnt").cast("double") * col("tt")) /
          (col("mt").cast("double") * col("mc"))) * 1000000.0)
          .cast("long"))
      .where(col("ppmi_micro") > 0)
      .select(col("t").as("token"), col("c"), col("ppmi_micro"),
        explode(sequence(lit(0), lit(dims - 1))).as("dim"))
      .groupBy("token", "dim")
      .agg(sum(col("ppmi_micro") *
        LearnedEmbeddings.projSign(col("c"), col("dim"), seed))
        .as("e_micro"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .toSet
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("termEmbeddings are LEARNED: same token, different corpus, " +
    "different vector") {
    val corpusA = docsOf(
      0L -> "bank river bank river bank water",
      1L -> "river water bank shore")
    val corpusB = docsOf(
      0L -> "bank money bank money bank loan",
      1L -> "money loan bank credit")
    def vecOf(df: org.apache.spark.sql.DataFrame) =
      LearnedEmbeddings.termEmbeddings(df, "text", vocabSize = 10,
        window = 2, dims = 4)
        .where(col("token") === "bank")
        .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    val va = vecOf(corpusA)
    val vb = vecOf(corpusB)
    assert(va.nonEmpty && vb.nonEmpty)
    assert(va != vb, "vector must be a function of the corpus")
  }

  test("docEmbeddings: fixed dim order/length; topical neighbors closer " +
    "than cross-topic pairs") {
    val docs = docsOf(
      0L -> "cat purrs softly cat naps cat purrs",
      1L -> "cat naps cat purrs softly sleepy cat",
      2L -> "stocks rally markets surge stocks climb",
      3L -> "markets surge stocks rally traders cheer")
    val dims = 8
    val emb = LearnedEmbeddings.docEmbeddings(docs, "doc_id", "text",
      LearnedEmbeddings.termEmbeddings(docs, "text", vocabSize = 20,
        window = 2, dims = dims))
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).map(_.toDouble))
      .toMap
    assert(vecs.size == 4)
    assert(vecs.values.forall(_.length == dims))
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    assert(cos(vecs(0L), vecs(1L)) > cos(vecs(0L), vecs(2L)))
    assert(cos(vecs(2L), vecs(3L)) > cos(vecs(3L), vecs(1L)))
  }
}

package graft.llmops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *   - bruteForceTopK: exact scored scan + TakeOrderedAndProject. At any
  *     scale this is one pass over the vectors table, no shuffle beyond
  *     the final tiny top-k merge -- the right baseline, and what the
  *     reference effectively does via Qdrant (repo_qdrant.ml:132-170).
  *   - ivfTopK: sign-bit coarse quantization (IVF-style cells). The table
  *     is bucketed once by cell; a query probes its own cell (+ optional
  *     neighbor cells), scanning ~n/2^bits rows. Trades recall for a
  *     2^bits scan reduction; recall of the probe set is exact.
  */
object Ann {

  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.CosineSimilarity(col(vecCol),
        org.apache.spark.sql.functions.typedLit(query)).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)

  /** Sign-bit cell id over the first `bits` dimensions. */
  def cellOf(query: Seq[Double], bits: Int): String =
    query.take(bits).map(x => if (x >= 0) '1' else '0').mkString

  def withCell(df: DataFrame, vecCol: String, bits: Int): DataFrame =
    df.withColumn("cell",
      concat((0 until bits).map(i =>
        when(element_at(col(vecCol).cast("array<double>"), i + 1) >= 0, "1")
          .otherwise("0")): _*))

  /** Probe the query's cell (exact scan within the cell). `probes` > 1
    * additionally probes cells at hamming distance 1 in sign-bit order
    * until the probe budget is exhausted (multi-probe LSH).
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, bits: Int = 8, probes: Int = 1): DataFrame = {
    val cell0 = cellOf(query, bits)
    val cells = (cell0 +: (0 until bits).map { i =>
      val flipped = cell0.updated(i, if (cell0(i) == '1') '0' else '1')
      flipped
    }).take(math.max(1, probes))
    withCell(df, vecCol, bits)
      .where(col("cell").isin(cells: _*))
      .select(col(idCol).as("id"),
        graft.functions.CosineSimilarity(col(vecCol),
        org.apache.spark.sql.functions.typedLit(query)).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }

  /** All-pairs top-k join: for each left row, the k nearest right rows --
    * brute force within sign-bit buckets (both sides bucketed), for
    * KNN-graph construction at scale.
    */
  def knnJoin(left: DataFrame, right: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int = 8): DataFrame = {
    val l = withCell(left, vecCol, bits)
      .select(col(idCol).as("lid"), col(vecCol).cast("array<double>").as("lv"),
        col("cell"))
    val r = withCell(right, vecCol, bits)
      .select(col(idCol).as("rid"), col(vecCol).cast("array<double>").as("rv"),
        col("cell"))
    val scored = l.join(r, Seq("cell"))
      .where(col("lid") =!= col("rid"))
      .select(col("lid"), col("rid"), graft.functions.CosineSimilarity(col("lv"), col("rv")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lid").orderBy(desc("score"), col("rid"))
    scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k).drop("__rn")
  }
}

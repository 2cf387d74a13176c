package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for each left row, attach the LATEST right row with
  * `right.ts <= left.ts` (or `<` when `strict`) and equal keys.
  *
  * Spark-first design: instead of a range join (which plans as a
  * nested-loop or needs bucketed range candidates), tag and UNION the two
  * sides, then carry the most recent right payload forward with
  * `last(_, ignoreNulls)` over a single `(keys) ORDER BY (ts, side, tb)`
  * window. ONE shuffle on the keys, no join at all, and the window is a
  * running carry (no re-sort per row). At 100 TB this is the minimal data
  * movement for as-of semantics: both sides partition by the same key
  * hash, AQE sizes the partitions, and per-key data streams through the
  * window operator in sort order. The whole right payload travels as ONE
  * struct so null payload fields can never mix values from different
  * right rows.
  *
  * Tie rules (deterministic): right rows at the same (key, ts) are
  * ordered by `tiebreak` and the LAST one wins; at equal ts the right row
  * is visible to left rows iff not `strict`.
  */
object AsofJoin {

  /** @param left      probe side; all its columns are preserved
    * @param right     reference side
    * @param keys      equi-join key columns (same names both sides)
    * @param leftTs    left event-time column (any orderable type)
    * @param rightTs   right event-time column (same type as leftTs)
    * @param payload   right columns to attach (must not clash with left's)
    * @param tiebreak  right column ordering same-(key, ts) rows; the max
    *                  wins. Pass a unique id for full determinism.
    * @param strict    true = `right.ts < left.ts` (exclude equal ts)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tiebreak: String, strict: Boolean = false): DataFrame = {
    require(payload.nonEmpty, "asof needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(payload.forall(!leftCols.contains(_)),
      s"payload $payload clashes with left columns; rename first")
    val rightSchema = right.schema

    // Side ordering at equal ts: the right row sorts BEFORE the left row
    // exactly when it should be visible to it (non-strict).
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)

    val payloadType = StructType(payload.map(p => rightSchema(p)))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(leftSide))
      .withColumn("__tb", lit(null).cast(rightSchema(tiebreak).dataType))
      .withColumn("__p", lit(null).cast(payloadType))
    val rBase = right.select(
      keys.map(col) :+ col(rightTs).as("__ts") :+ col(tiebreak).as("__tb")
        :+ struct(payload.map(col): _*).as("__p"): _*)
      .withColumn("__side", lit(rightSide))
    val r = leftCols.filterNot(keys.contains)
      .foldLeft(rBase) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }

    val u = l.unionByName(r.select(l.columns.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u.withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
    carried.where(col("__side") === leftSide)
      .select(leftCols.map(col) ++ payload.map(p => col(s"__m.$p").as(p)): _*)
  }
}

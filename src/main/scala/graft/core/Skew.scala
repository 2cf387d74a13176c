package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join splitting covers joins; for
  * heavily-skewed AGGREGATIONS (one giant group -- e.g. per-opening
  * position counts where one opening dominates a 100 TB corpus) use
  * two-phase salted aggregation: partial-agg on (key, salt) then final
  * agg on key. Works for any algebraic aggregate expressed as
  * (partial, merge) pairs.
  */
object Skew {

  /** Two-phase salted count+sum aggregate.
    *
    * @param salts number of salt buckets the hot keys spread over
    * @param sums  numeric columns to sum (name -> expr)
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
      sums: Map[String, Column]): DataFrame = {
    require(salts > 0)
    // Salt must not be a pure function of row content: a hot group made of
    // EXACT-duplicate rows would land in one (key, salt) bucket. Mix in
    // physical position (partition id + per-partition row id) so identical
    // rows still spread across the salt space.
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col) :+ spark_partition_id()
        :+ monotonically_increasing_id(): _*), lit(salts)))
    val partialAggs =
      count(lit(1)).as("__cnt") +:
        sums.toSeq.map { case (name, c) => sum(c).as(s"__sum_$name") }
    val partial = salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs =
      sum("__cnt").as("cnt") +:
        sums.keys.toSeq.map(n => sum(s"__sum_$n").as(n))
    partial.groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}

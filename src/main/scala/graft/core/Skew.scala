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
    * The salt MUST be a deterministic function of row content: a salt built
    * from spark_partition_id()/monotonically_increasing_id()/rand() makes the
    * shuffle map output indeterminate, and on a fetch-failure retry the
    * recomputed map tasks emit different salts than what surviving reducers
    * already consumed — double-counting or losing rows (SPARK-23207 class).
    * We therefore salt by hash(all columns). The one case this cannot spread
    * is a hot group consisting of EXACT-duplicate rows; for that, pass a
    * pre-existing stable uniquifier column (a source row id, file offset,
    * etc.) via `uniquifier` and it is mixed into the salt.
    *
    * @param salts      number of salt buckets the hot keys spread over
    * @param sums       numeric columns to sum (name -> expr)
    * @param uniquifier optional stable per-row id column for spreading
    *                   exact-duplicate hot rows
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
      sums: Map[String, Column], uniquifier: Option[String] = None): DataFrame = {
    require(salts > 0)
    uniquifier.foreach { u =>
      require(df.columns.contains(u), s"uniquifier column '$u' not in input")
    }
    val saltInputs = df.columns.map(col) ++ uniquifier.map(col)
    val salted = df.withColumn("__salt",
      pmod(hash(saltInputs: _*), lit(salts)))
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

package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator for the V5 hit-collapse tag union (reference
  * hybrid_planner.ml:110-142): dedup-union of lowercased string arrays,
  * emitted sorted.
  *
  * Semantically identical to
  * `array_sort(array_distinct(lower(flatten(collect_list(c)))))`, but the
  * aggregation buffer is the DISTINCT tag set -- bounded by the tag
  * vocabulary, not by hit count x list length -- and it participates in
  * map-side partial aggregation, so a hot game_id with millions of hits
  * ships one small set per map partition instead of every input list
  * through the shuffle (the SURVEY §4 item 2 efficiency note, realized).
  */
object TagUnionAgg
    extends Aggregator[Seq[String], mutable.HashSet[String], Seq[String]] {

  def zero: mutable.HashSet[String] = mutable.HashSet.empty

  def reduce(b: mutable.HashSet[String],
      a: Seq[String]): mutable.HashSet[String] = {
    if (a != null) a.foreach(t => if (t != null) b += t.toLowerCase)
    b
  }

  def merge(x: mutable.HashSet[String],
      y: mutable.HashSet[String]): mutable.HashSet[String] = { x ++= y; x }

  def finish(b: mutable.HashSet[String]): Seq[String] = b.toSeq.sorted

  def bufferEncoder: Encoder[mutable.HashSet[String]] =
    Encoders.kryo[mutable.HashSet[String]]

  def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()

  /** Column form: lowerSortedUnion(col) in a .agg(...). */
  val lowerSortedUnion: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(this)
}

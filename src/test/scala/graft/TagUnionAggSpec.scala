package graft

import org.apache.spark.sql.functions._
import graft.functions.TagUnionAgg

/** TagUnionAgg must be indistinguishable from the built-in expression it
  * replaces: array_sort(array_distinct(lower(flatten(collect_list(c))))).
  */
class TagUnionAggSpec extends SparkSpec {
  import spark.implicits._

  test("equals the collect_list expression on mixed-case, dup, null data") {
    val df = Seq(
      (1L, Seq("Endgame", "TACTICS")),
      (1L, Seq("endgame", "sacrifice")),
      (1L, Seq.empty[String]),
      (2L, Seq("King_Attack")),
      (3L, null.asInstanceOf[Seq[String]]),
      (3L, Seq("a", "b", "a"))
    ).toDF("game_id", "tags")
    val viaAgg = df.groupBy("game_id")
      .agg(TagUnionAgg.lowerSortedUnion(col("tags")).as("u"))
      .orderBy("game_id")
      .as[(Long, Seq[String])].collect().toSeq
    val viaExpr = df.groupBy("game_id")
      .agg(array_sort(array_distinct(transform(
        flatten(collect_list("tags")), t => lower(t)))).as("u"))
      .orderBy("game_id")
      .as[(Long, Seq[String])].collect().toSeq
    assert(viaAgg === viaExpr)
    assert(viaAgg === Seq(
      (1L, Seq("endgame", "sacrifice", "tactics")),
      (2L, Seq("king_attack")),
      (3L, Seq("a", "b"))))
  }

  test("map-side partial aggregation survives repartitioning") {
    val df = spark.range(10000)
      .select((col("id") % 3).as("game_id"),
        array(concat(lit("tag"), (col("id") % 7).cast("string"))).as("tags"))
      .repartition(16)
    val out = df.groupBy("game_id")
      .agg(TagUnionAgg.lowerSortedUnion(col("tags")).as("u"))
      .as[(Long, Seq[String])].collect().toMap
    val expected = (0 until 7).map(i => s"tag$i").sorted
    assert(out.values.forall(_ == expected))
  }
}

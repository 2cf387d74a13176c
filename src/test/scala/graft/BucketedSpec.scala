package graft

import org.apache.spark.sql.functions._
import graft.core.Fixtures
import graft.ingest.IngestJob

/** Bucketed-table write: the positions<->games join must plan with no
  * shuffle exchange on the bucketed sides.
  */
class BucketedSpec extends SparkSpec {

  test("bucketBy(game_id) join plans without exchanges on bucketed sides") {
    import spark.implicits._
    val files = spark.createDataset(Fixtures.all)
    val t = IngestJob.tables(spark, IngestJob.gamesFromText(spark, files))
    IngestJob.writeBucketed(t, "graft_test_db", buckets = 4)

    val games = spark.table("graft_test_db.games")
    val positions = spark.table("graft_test_db.positions")
    val joined = positions.join(games.select("game_id", "result"),
      Seq("game_id"))
      .groupBy("result").agg(count(lit(1)).as("n"))
    assert(joined.collect().map(_.getLong(1)).sum == 99)

    // with matching bucketing on the join key, SortMergeJoin reads both
    // sides bucket-aligned: no ShuffleExchange below the join.
    val plan = joined.queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("SortMergeJoin")
    if (joinIdx >= 0) {
      val below = plan.substring(joinIdx)
      assert(!below.contains("Exchange hashpartitioning(game_id"),
        s"unexpected shuffle on join key:\n$plan")
    }
  }
}

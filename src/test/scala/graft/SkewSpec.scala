package graft

import org.apache.spark.sql.functions._
import graft.core.Skew

class SkewSpec extends SparkSpec {

  test("salted aggregate equals plain aggregate on skewed keys") {
    import spark.implicits._
    // 10k rows, 95% on one hot key
    val df = spark.range(10000)
      .withColumn("key", when(col("id") % 20 =!= 0, "hot").otherwise(
        concat(lit("k"), (col("id") % 7).cast("string"))))
      .withColumn("v", (col("id") % 100).cast("long"))
    val plain = df.groupBy("key")
      .agg(count(lit(1)).as("cnt"), sum("v").as("v_sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val salted = Skew.saltedAgg(df, Seq("key"), salts = 16,
      Map("v_sum" -> col("v")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(salted == plain)
  }

  test("executor computeTotal=false skips the count scan") {
    import spark.implicits._
    val files = spark.createDataset(graft.core.Fixtures.all)
    val t = graft.ingest.IngestJob.tables(spark,
      graft.ingest.IngestJob.gamesFromText(spark, files))
    val plan = graft.query.QueryIntent.analyse(
      graft.query.QueryIntent.Request("games", Some(2)))
    val e = graft.query.HybridExecutor.execute(spark,
      graft.query.HybridExecutor.Tables(t.games, t.players, None), plan,
      computeTotal = false)
    assert(e.total == -1L)
    assert(e.results.collect().length == 2)
  }
}

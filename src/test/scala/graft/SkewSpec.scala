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

  test("uniquifier spreads exact-duplicate hot rows across salts") {
    import spark.implicits._
    // 8k EXACT-duplicate rows (one hot group of identical content): without
    // a uniquifier they hash to ONE salt bucket; with a stable row id they
    // spread, and the result is still exact.
    val df = spark.range(8000)
      .select(col("id").as("row_id"), lit("hot").as("key"), lit(7L).as("v"))
    val noUniq = Skew.saltedAgg(df.drop("row_id"), Seq("key"), salts = 16,
      Map("v_sum" -> col("v")))
    val withUniq = Skew.saltedAgg(df, Seq("key"), salts = 16,
      Map("v_sum" -> col("v")), uniquifier = Some("row_id"))
    // both exact...
    assert(noUniq.collect().map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((8000L, 56000L)))
    assert(withUniq.collect().map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((8000L, 56000L)))
    // ...but only the uniquified variant spreads: count distinct salts in
    // the partial stage by re-deriving the salt expression
    val salts = df.withColumn("__salt",
      pmod(hash((df.columns.map(col) :+ col("row_id")): _*), lit(16)))
      .select(countDistinct(col("__salt"))).head().getLong(0)
    assert(salts > 1)
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

package graft

import graft.core.Compact

class CompactSpec extends SparkSpec {
  import spark.implicits._

  test("compaction merges small files without changing the data") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val df = (1L to 1000L).map(i => (i, s"row-$i")).toDF("id", "s")
    df.repartition(20).write.parquet(dir)
    val before = Compact.compactDir(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    assert(before.filesBefore === 20)
    assert(before.filesAfter === 1)
    val back = spark.read.parquet(dir)
    assert(back.count() === 1000L)
    assert(back.as[(Long, String)].collect().toSet ===
      (1L to 1000L).map(i => (i, s"row-$i")).toSet)
  }

  test("already-compact dir is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("compact2").toString + "/t"
    (1L to 10L).toDF("id").coalesce(1).write.parquet(dir)
    val s = Compact.compactDir(spark, dir)
    assert(s.filesBefore === 1 && s.filesAfter === 1)
    assert(spark.read.parquet(dir).count() === 10L)
  }
}

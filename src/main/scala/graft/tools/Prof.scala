package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query profiler: times named gate queries (cold + warm) on one
  * session, optionally dumping the formatted plan. Usage:
  *
  *   runMain graft.tools.Prof <sfDir> <name1,name2,...> [explain]
  *
  * Same session config as Bench so numbers are comparable; unlike Bench
  * it runs ONLY the requested queries, for fast iteration on a hotspot.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val explain = args.length > 2 && args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // same warmup as Bench so the first query isn't charged for fixtures
    graft.gate.ChessQueries.data(spark)._1.games.count()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      val cold = time(fn(spark, sfDir).count())
      val warm = time(fn(spark, sfDir).count())
      val warm2 = time(fn(spark, sfDir).count())
      println(f"[prof] $name%-24s cold=$cold%7.3f warm=$warm%7.3f warm2=$warm2%7.3f")
    }
    spark.stop()
  }
}

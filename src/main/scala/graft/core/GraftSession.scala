package graft.core

import org.apache.spark.sql.SparkSession

/** Recommended SparkSession settings for this engine.
  *
  * `tuned` applies scale-relevant defaults: AQE (runtime re-planning,
  * skew-join splitting, partition coalescing), ns-timestamp parquet
  * compatibility, UTC. Shuffle partitions default to cluster parallelism
  * -- at 1000 executors set `spark.sql.shuffle.partitions` explicitly to
  * 2-3x total cores via config.
  */
object GraftSession {

  def tuned(builder: SparkSession.Builder): SparkSession.Builder =
    builder
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Local session for CLIs/tests. */
  def local(appName: String, cores: Int = 0,
      shufflePartitions: Int = 0): SparkSession = {
    val c = if (cores > 0) cores.toString else "*"
    val sp = if (shufflePartitions > 0) shufflePartitions
      else Runtime.getRuntime.availableProcessors()
    val s = tuned(SparkSession.builder()
      .master(s"local[$c]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

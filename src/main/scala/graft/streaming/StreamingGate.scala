package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Batch-parity harness for the streaming family: run a Structured
  * Streaming transform over the sf parquet files with
  * `Trigger.AvailableNow`, write the Append-mode sink to parquet, and
  * return the sink read back as a plain DataFrame -- which makes a
  * streaming operator's OUTPUT gateable against a DuckDB SQL oracle
  * like any batch query (the one family CORRECTNESS_r08 could not
  * cover, because DuckDB cannot run a stream).
  *
  * AvailableNow processes every file already present, then runs the
  * no-data micro-batch that advances the watermark and flushes every
  * closed window / final state before terminating -- so the sink is a
  * complete, deterministic function of the input files, and append-mode
  * semantics (e.g. windows still open at the final watermark are
  * withheld) are part of what the oracle asserts.
  *
  * Scale shape: this is exactly the production backfill path -- the
  * same query that tails a 100 TB/day feed replays history by pointing
  * the source at the archived files and triggering AvailableNow; state
  * store, watermark, and sink transaction log behave identically.
  */
object StreamingGate {

  /** @param srcParquet parquet/dir to stream (schema inferred from
    *                   a batch read of the same path)
    * @param sinkName   per-gate sink namespace under /tmp; sink and
    *                   checkpoint are wiped first so every run is a
    *                   clean deterministic replay
    * @param statePartitions shuffle/state-store partition count for the
    *                   streaming query, sized to the STATE volume (a few
    *                   hundred open windows here), not the batch
    *                   default: every micro-batch — including the
    *                   zero-row watermark-advance batch AvailableNow
    *                   always appends — pays a per-state-partition
    *                   cycle (provider load, delta write, sink commit),
    *                   which r13 forensics (tools/StreamProbe) measured
    *                   at ~1.3 s/run of pure overhead at 32 partitions
    *                   vs 8 for identical output. A production stream
    *                   sizes this to throughput; a backfill gate sizes
    *                   it to state. Applied via the session conf around
    *                   query start (the only hook Spark offers) and
    *                   restored after.
    */
  def availableNow(spark: SparkSession, srcParquet: String,
      sinkName: String, statePartitions: Int = 8)
      (transform: DataFrame => DataFrame): DataFrame = {
    val dir = java.nio.file.Paths.get(
      s"/tmp/graft_stream_gate/$sinkName")
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    val schema = spark.read.parquet(srcParquet).schema
    // The file stream source lists a DIRECTORY; the sf tables are single
    // files, so stage a symlink under the (fresh) gate dir.
    val srcDir = dir.resolve("src")
    java.nio.file.Files.createDirectories(srcDir)
    java.nio.file.Files.createSymbolicLink(
      srcDir.resolve(java.nio.file.Paths.get(srcParquet).getFileName),
      java.nio.file.Paths.get(srcParquet).toAbsolutePath)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      statePartitions.toString)
    try {
      val in = spark.readStream.schema(schema).parquet(srcDir.toString)
      val q = transform(in).writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    spark.read.parquet(s"$dir/out")
  }
}

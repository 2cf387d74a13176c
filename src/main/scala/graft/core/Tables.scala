package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md) and for
  * chessmate tables written by [[graft.ingest.IngestJob]].
  *
  * All reads go through `spark.read.parquet` so Catalyst keeps predicate
  * pushdown + column pruning; never cache here — callers decide persistence.
  */
object Tables {
  val tpch: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events with `ts` normalized to epoch-NANOSECOND longs. The driver has
    * shipped this column as parquet TIMESTAMP(NANOS) (read as raw longs
    * under `nanosAsLong`) and as TIMESTAMP(MICROS) (read as a real
    * timestamp); every consumer does exact integer time arithmetic on
    * `ts`, so pin one representation here instead of per call site.
    */
  def events(s: SparkSession, d: String): DataFrame =
    withTsNanos(load(s, d, "events"))

  /** Normalize a `ts` column to epoch-nanosecond longs whatever the
    * source type. NTZ wall-clock is interpreted in the session timezone
    * (every Graft session pins UTC), matching DuckDB's `epoch_ns` on the
    * same naive parquet timestamps.
    */
  def withTsNanos(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df
    case TimestampType =>
      df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    case TimestampNTZType =>
      df.withColumn("ts",
        unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    case other => throw new IllegalArgumentException(
      s"events.ts: expected long or timestamp, got $other")
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

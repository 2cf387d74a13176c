package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet table directories.
  *
  * Long-running ingestion (micro-batches, per-round incremental writes)
  * accumulates many small files; at scale that turns every scan into a
  * file-listing + task-scheduling problem (one task per tiny file) and
  * wrecks row-group locality. Compaction rewrites a directory to
  * ~targetFileBytes files and swaps it in.
  *
  * The swap is rename-based (write to a sibling tmp dir, move the old dir
  * away, rename tmp into place, delete old): readers that START during
  * the swap window can fail -- single-writer batch semantics, same as
  * every non-transactional parquet layout. For swap-window-free
  * compaction use `embed/Snapshots.compactCurrent`, which lands the
  * compacted data as a NEW committed version behind the atomic _CURRENT
  * pointer (the Delta/Iceberg rewrite pattern); this in-place variant is
  * for plain directories outside snapshot management.
  */
object Compact {

  final case class Stats(filesBefore: Int, filesAfter: Int, bytes: Long)

  /** Compact a flat (non-partition-subdir) parquet directory in place.
    *
    * @param targetFileBytes desired output file size; output file count =
    *   ceil(totalBytes / targetFileBytes). Parquet compression makes this
    *   approximate -- it bounds task count, not exact sizes.
    */
  def compactDir(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Stats = {
    require(targetFileBytes > 0)
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (files.length <= nOut) return Stats(files.length, files.length, totalBytes)

    val df = spark.read.parquet(dir)
    val tmp = new Path(dir + "__compact_tmp")
    val old = new Path(dir + "__compact_old")
    fs.delete(tmp, true); fs.delete(old, true)
    // coalesce, not repartition: merging files needs no shuffle
    df.coalesce(nOut).write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(path, old))
      throw new java.io.IOException(s"compact: cannot move $path aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // roll back
      throw new java.io.IOException(s"compact: cannot move $tmp into place")
    }
    fs.delete(old, true)
    val after = fs.listStatus(path)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    Stats(files.length, after, totalBytes)
  }
}

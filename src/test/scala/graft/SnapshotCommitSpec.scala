package graft

import graft.embed.Snapshots

/** Atomic commit pointer: readers only ever see fully-committed versions;
  * crashed writers' leftovers are invisible and vacuumable.
  */
class SnapshotCommitSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("snapcommit").toString

  test("commit publishes atomically; readCurrent tracks the pointer") {
    val dir = tmp()
    assert(Snapshots.currentVersion(dir).isEmpty)
    Snapshots.commit((1L to 10L).toDF("id"), dir)
    assert(Snapshots.currentVersion(dir) === Some(1))
    assert(Snapshots.readCurrent(spark, dir).count() === 10L)
    Snapshots.commit((1L to 25L).toDF("id"), dir)
    assert(Snapshots.currentVersion(dir) === Some(2))
    assert(Snapshots.readCurrent(spark, dir).count() === 25L)
  }

  test("an unpublished (crashed-writer) version is invisible to readers") {
    val dir = tmp()
    Snapshots.commit((1L to 5L).toDF("id"), dir)
    // simulate a writer that landed data but died before publishing:
    // create() writes v=2 + journal line but no _CURRENT move
    Snapshots.create((1L to 999L).toDF("id"), dir)
    assert(Snapshots.currentVersion(dir) === Some(1))
    assert(Snapshots.readCurrent(spark, dir).count() === 5L)
  }

  test("vacuum removes unpublished leftovers and old history, keeps current") {
    val dir = tmp()
    Snapshots.commit((1L to 1L).toDF("id"), dir)  // v1
    Snapshots.commit((1L to 2L).toDF("id"), dir)  // v2
    Snapshots.commit((1L to 3L).toDF("id"), dir)  // v3 (current)
    Snapshots.create((1L to 9L).toDF("id"), dir)  // v4 unpublished
    val removed = Snapshots.vacuum(dir, keep = 2)
    assert(removed === Seq(1, 4)) // v1 superseded, v4 crashed leftover
    assert(Snapshots.currentVersion(dir) === Some(3))
    assert(Snapshots.readCurrent(spark, dir).count() === 3L)
    // v2 kept (within keep=2 window) and still readable
    assert(Snapshots.restore(spark, dir, Some(2)).count() === 2L)
  }

  test("compactCurrent: new committed version, same data, fewer files") {
    val dir = tmp()
    // many small files: repartition(16) on a tiny frame
    Snapshots.commit((1L to 100L).toDF("id").repartition(16), dir)
    def fileCount(v: Int): Int =
      java.nio.file.Files.list(java.nio.file.Paths.get(dir, s"v=$v"))
        .toArray.map(_.toString).count(_.endsWith(".parquet"))
    assert(fileCount(1) == 16)
    val snap = Snapshots.compactCurrent(spark, dir)
    assert(snap.version == 2)
    assert(Snapshots.currentVersion(dir) === Some(2))
    assert(fileCount(2) == 1) // tiny table -> one target file
    assert(Snapshots.readCurrent(spark, dir).as[Long].collect().sorted
      .toSeq == (1L to 100L))
    // the superseded version is intact until vacuum reclaims it
    assert(fileCount(1) == 16)
    Snapshots.vacuum(dir, keep = 1)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "v=1")))
  }
}

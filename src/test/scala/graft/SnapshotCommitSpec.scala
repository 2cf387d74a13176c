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

  test("torn pointer write / partial version dir never reach readers") {
    import java.nio.file.{Files, Paths}
    val dir = tmp()
    Snapshots.commit((1L to 7L).toDF("id"), dir) // v1 committed
    // CRASH SHAPE 1 -- torn pointer: commit() writes _CURRENT.tmpN then
    // ATOMIC_MOVEs it, so a crash mid-write can only strand a tmp file
    // (possibly holding garbage or a half-written version number);
    // _CURRENT itself is never partially written. Readers must ignore
    // strays entirely.
    Files.write(Paths.get(dir, "_CURRENT.tmp9"), "9".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "_CURRENT.tmp10"),
      Array[Byte](0x31, 0x00, 0x7f)) // binary garbage
    assert(Snapshots.currentVersion(dir) === Some(1))
    assert(Snapshots.readCurrent(spark, dir).count() === 7L)
    // CRASH SHAPE 2 -- partial version dir: a writer died mid-landing,
    // leaving v=9 with a stray temp file and NO journal line or pointer.
    val partial = Paths.get(dir, "v=9")
    Files.createDirectories(partial)
    Files.write(partial.resolve("_temporary_part-0000.parquet.crc"),
      "junk".getBytes("UTF-8"))
    assert(Snapshots.currentVersion(dir) === Some(1))
    assert(Snapshots.readCurrent(spark, dir).count() === 7L)
    // recovery: the next commit numbers PAST the crashed writer's
    // landed dir (v=9 -> next is 10, never an errorifexists collision
    // with debris) and publishes atomically
    val snap = Snapshots.commit((1L to 11L).toDF("id"), dir)
    assert(snap.version === 10)
    assert(Snapshots.currentVersion(dir) === Some(10))
    assert(Snapshots.readCurrent(spark, dir).count() === 11L)
    // vacuum reclaims the partial dir (unpublished, > pointer at the
    // time it crashed is irrelevant -- it is simply not in the keep set)
    val removed = Snapshots.vacuum(dir, keep = 2)
    assert(removed.contains(9))
    assert(!Files.exists(partial))
    assert(Snapshots.readCurrent(spark, dir).count() === 11L)
    // CRASH SHAPE 3 -- torn journal append: a writer that died mid-line
    // leaves a truncated record at the manifest tail. list() skips it
    // (the torn version was never published: the pointer moves only
    // after the append), and the next commit numbers PAST the torn line
    // rather than colliding with its landed v-dir.
    Files.write(Paths.get(dir, "snapshots.jsonl"),
      "{\"version\":12,\"ro".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    assert(Snapshots.list(dir).map(_.version) === Seq(1, 10))
    assert(Snapshots.readCurrent(spark, dir).count() === 11L)
    val after = Snapshots.commit((1L to 3L).toDF("id"), dir)
    assert(after.version === 11)
    assert(Snapshots.readCurrent(spark, dir).count() === 3L)
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

  test("retention: keep-last-N window restorable under interleaved writes") {
    val dir = tmp()
    def commitN(n: Long) = Snapshots.commit((1L to n).toDF("id"), dir)
    commitN(10) // v1
    Snapshots.create((1L to 999L).toDF("id"), dir) // v2: crashed writer
    commitN(20) // v3
    // a reader that resolved _CURRENT before the next commit keeps its
    // fully-committed version -- the files are immutable until vacuum
    val early = Snapshots.readCurrent(spark, dir) // resolves v3
    commitN(30) // v4
    assert(early.count() === 20L)
    // retention pass: window = last 2 published + current
    val removed1 = Snapshots.vacuum(dir, keep = 2)
    assert(removed1 === Seq(1, 2)) // old history + crashed leftover
    assert(Snapshots.restore(spark, dir, Some(3)).count() === 20L)
    assert(Snapshots.readCurrent(spark, dir).count() === 30L)
    // a vacuumed version is GONE, not half-readable
    intercept[Throwable] {
      Snapshots.restore(spark, dir, Some(1)).count()
    }
    // concurrent-ish: a reader loop polling readCurrent while more
    // commits land must only ever observe fully-committed row counts
    val valid = Set(30L, 40L, 50L)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try seen.add(Snapshots.readCurrent(spark, dir).count())
        catch { case _: Throwable => () }
      }
    })
    reader.start()
    try {
      commitN(40) // v5
      commitN(50) // v6
    } finally { stop.set(true); reader.join() }
    assert(!seen.isEmpty)
    seen.forEach(c => assert(valid.contains(c),
      s"reader observed a torn/partial snapshot count $c"))
    // second retention pass over the deeper history
    val removed2 = Snapshots.vacuum(dir, keep = 3)
    assert(removed2 === Seq(3))
    for ((ver, n) <- Seq(4 -> 30L, 5 -> 40L, 6 -> 50L))
      assert(Snapshots.restore(spark, dir, Some(ver)).count() === n)
    assert(Snapshots.currentVersion(dir) === Some(6))
  }
}

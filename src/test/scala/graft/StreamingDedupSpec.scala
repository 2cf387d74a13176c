package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingDedup

/** flatMapGroupsWithState custom-state dedup: first occurrence ever wins,
  * across micro-batches -- the thing a watermarkless dropDuplicates can't
  * promise on a stream.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("duplicates drop across micro-batches (state persists)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val in = mem.toDF().toDF("content_md5", "doc_id")
    val q = StreamingDedup.firstOccurrence(in, "content_md5")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(("a", 1L), ("b", 2L), ("a", 3L)) // a dup within batch
      q.processAllAvailable()
      mem.addData(("a", 4L), ("c", 5L)) // a dup across batches
      q.processAllAvailable()
      val out = spark.table("dedup_out")
        .as[(String, Long)].collect().toMap
      assert(out.keySet === Set("a", "b", "c"))
      assert(out("a") === 1L) // the FIRST a, not a later one
      assert(out("c") === 5L)
    } finally q.stop()
  }

  test("stream-static decontamination filters contaminated docs") {
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val in = mem.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.decontaminated(in, bench, "text",
      shingleN = 3, minHits = 1)
      .writeStream.format("memory").queryName("decontam_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (1L, "alpha beta gamma something else entirely"), // contaminated
        (2L, "totally unrelated clean document text here"))
      q.processAllAvailable()
      mem.addData((3L, "delta epsilon is fine but beta gamma delta hits"))
      q.processAllAvailable()
      val out = spark.table("decontam_out")
        .select("doc_id").as[Long].collect().toSet
      assert(out === Set(2L))
    } finally q.stop()
  }

  test("batch decontamination agrees with the Curation operator") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma something else entirely"),
      (2L, "totally unrelated clean document text here"),
      (3L, "delta epsilon is fine but beta gamma delta hits"))
      .toDF("doc_id", "text")
    val streaming = StreamingDedup.decontaminated(corpus, bench, "text")
      .select("doc_id").as[Long].collect().toSet
    val batch = graft.llmops.Curation.decontaminate(corpus, bench,
      "doc_id", "text").select("doc_id").as[Long].collect().toSet
    assert(streaming === batch && streaming === Set(2L))
  }

  test("bloom decontamination tier: one-sided, subset of exact keeps") {
    // wide sketch: FP-free at this size -> bloom path == exact path
    val bench = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma something else entirely"),
      (2L, "totally unrelated clean document text here"),
      (3L, "delta epsilon is fine but beta gamma delta hits"),
      (4L, "another spotless document with original words only"))
      .toDF("doc_id", "text")
    val exact = StreamingDedup.decontaminated(corpus, bench, "text")
      .select("doc_id").as[Long].collect().toSet
    val wide = StreamingDedup.decontaminated(corpus, bench, "text",
      bloomBits = 62 * 64).select("doc_id").as[Long].collect().toSet
    assert(exact === Set(2L, 4L))
    assert(wide === exact)
    // saturated 62-bit sketch: heavy FP, but the guarantee stays
    // one-sided -- kept rows are a SUBSET of the exact keeps (clean
    // docs may over-drop; contaminated docs NEVER pass)
    val tiny = StreamingDedup.decontaminated(corpus, bench, "text",
      bloomBits = 62, bloomK = 1).select("doc_id").as[Long].collect().toSet
    assert(tiny.subsetOf(exact))
    assert(tiny.intersect(Set(1L, 3L)).isEmpty)
  }

  test("batch bloom decontaminate verifies FPs away: output exact") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma something else entirely"),
      (2L, "totally unrelated clean document text here"),
      (3L, "delta epsilon is fine but beta gamma delta hits"),
      (4L, "another spotless document with original words only"))
      .toDF("doc_id", "text")
    val exact = graft.llmops.Curation.decontaminate(corpus, bench,
      "doc_id", "text").select("doc_id").as[Long].collect().toSet
    // even a SATURATED 62-bit sketch (every doc a candidate) must give
    // the exact output: the verify join removes every false positive
    for (bits <- Seq(62, 62 * 64)) {
      val got = graft.llmops.Curation.decontaminate(corpus, bench,
        "doc_id", "text", bloomBits = bits, bloomK = 1)
        .select("doc_id").as[Long].collect().toSet
      assert(got === exact, s"bloom tier at $bits bits diverged")
    }
    assert(exact === Set(2L, 4L))
  }

  test("batch mode behaves like dropDuplicates on the key") {
    val df = Seq(("x", 1L), ("y", 2L), ("x", 3L), ("z", 4L), ("y", 5L))
      .toDF("content_md5", "doc_id")
    val out = StreamingDedup.firstOccurrence(df, "content_md5")
    assert(out.columns.toSeq === Seq("content_md5", "doc_id"))
    val keys = out.select("content_md5").as[String].collect().sorted.toSeq
    assert(keys === Seq("x", "y", "z"))
  }

  test("missing key column is rejected") {
    val df = Seq(("x", 1L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      StreamingDedup.firstOccurrence(df, "nope")
    }
  }
}

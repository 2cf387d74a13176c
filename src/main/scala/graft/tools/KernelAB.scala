package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-JVM A/B for the r21 kernel rewrites the r21 verdict flagged as
  * unmeasured (simhash count-weighting, windowHexes) plus the r22
  * candidates: min-of-3 reps over the KProf synthetic corpus in ONE
  * JVM, so the comparison is immune to host drift. The "old" forms are
  * inlined verbatim from the r20 tree (c1c3de3) — they are reference
  * implementations for measurement, not query paths.
  *
  * Usage: runMain graft.tools.KernelAB [nDocs] [name...]
  */
object KernelAB {

  /** r20 simhash: one digest per token OCCURRENCE (the form the r22
    * revert restored — timed here against the count-weighted r21 form).
    */
  private def simhashOccUdf(bits: Int) =
    udf((text: String) => {
      val toks =
        if (text == null) Array.empty[String]
        else graft.llmops.TextAnalysis.alnumTokens(text)
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](bits)
      var i = 0
      while (i < toks.length) {
        val d = md.digest(toks(i).getBytes("UTF-8"))
        var j = 0
        while (j < bits) {
          val nibIdx = j / 4
          val nib = (d(nibIdx / 2) >> (4 * (1 - nibIdx % 2))) & 0xf
          votes(j) += (((nib >> (3 - j % 4)) & 1) * 2) - 1
          j += 1
        }
        i += 1
      }
      val out = new Array[Char](bits)
      var j = 0
      while (j < bits) { out(j) = if (votes(j) > 0) '1' else '0'; j += 1 }
      new String(out)
    })

  /** r21 simhash: one digest per DISTINCT token, vote × count. */
  private def simhashCntUdf(bits: Int) =
    udf((text: String) => {
      val toks =
        if (text == null) Array.empty[String]
        else graft.llmops.TextAnalysis.alnumTokens(text)
      val counts = new java.util.HashMap[String, Int](toks.length * 2)
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        counts.put(t, counts.getOrDefault(t, 0) + 1)
        i += 1
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](bits)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        val d = md.digest(e.getKey.getBytes("UTF-8"))
        var j = 0
        while (j < bits) {
          val nibIdx = j / 4
          val nib = (d(nibIdx / 2) >> (4 * (1 - nibIdx % 2))) & 0xf
          votes(j) += ((((nib >> (3 - j % 4)) & 1) * 2) - 1) * c
          j += 1
        }
      }
      val out = new Array[Char](bits)
      var j = 0
      while (j < bits) { out(j) = if (votes(j) > 0) '1' else '0'; j += 1 }
      new String(out)
    })

  /** r20 window fingerprints: per-window slice + mkString + getBytes. */
  private def windowFpOldUdf(window: Int) =
    udf((text: String) => {
      val toks = text.toLowerCase(java.util.Locale.ROOT)
        .split("[^a-z0-9]+").filter(_.nonEmpty)
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(s: String): String = {
        val d = md.digest(s.getBytes("UTF-8"))
        val out = new Array[Char](32)
        var i = 0
        while (i < 16) {
          out(2 * i) = "0123456789abcdef" ((d(i) >> 4) & 0xf)
          out(2 * i + 1) = "0123456789abcdef" (d(i) & 0xf)
          i += 1
        }
        new String(out)
      }
      if (toks.length < window) Seq(hex(toks.mkString(" ")))
      else (0 to toks.length - window).map(i =>
        hex(toks.slice(i, i + window).mkString(" ")))
    })

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 500000L
    val only = args.drop(1).toSet
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the KProf synthetic corpus: ~190 tokens/doc of 2–8 char md5
    // fragments (the sf-table documents generator's shape)
    val docsPath = java.nio.file.Files
      .createTempDirectory("kernelab").toString + "/docs"
    spark.range(nDocs).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(189)), i =>
          substring(md5(concat(col("doc_id").cast("string"),
            lit(":"), i.cast("string"))), lit(1),
            (pmod(xxhash64(col("doc_id"), i), lit(7)) + 2).cast("int")))))
      .write.mode("overwrite").parquet(docsPath)
    val docs = spark.read.parquet(docsPath).cache()
    docs.count()

    def minOf3(df: => org.apache.spark.sql.DataFrame): Double = {
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        df.head()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }
    def timed(name: String)(c: org.apache.spark.sql.Column): Unit =
      if (only.isEmpty || only(name)) {
        val best = minOf3(docs.agg(max(xxhash64(c))))
        println(f"[kernelab] $name%-22s $best%7.2f s  ($nDocs%,d docs)")
      }

    timed("simhash64_occ")(simhashOccUdf(64)(col("text")))
    timed("simhash64_cnt")(simhashCntUdf(64)(col("text")))
    timed("simhash64_cur")(
      graft.llmops.Dedup.simhashTextUdf(64)(col("text")))
    timed("winfp_old")(windowFpOldUdf(20)(col("text")))
    timed("winfp_new")(
      graft.llmops.Dedup.windowFingerprintsUdf(20)(col("text")))
    timed("winfp_new_distinct")(
      graft.llmops.Dedup.distinctWindowFingerprintsUdf(20)(col("text")))
    timed("winfp_old_distinct")(
      array_distinct(windowFpOldUdf(20)(col("text"))))
    spark.stop()
  }
}

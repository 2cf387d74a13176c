package graft.tools

import org.apache.spark.sql.SparkSession

/** Sequential-vs-batched BPE training wall-clock: the same total merge
  * count as one-argmax-per-round (bpeTrain) and as perRound
  * symbol-disjoint merges per pair-count round (bpeTrainBatched). The
  * claim under test: wall tracks DRIVER ACTIONS (pair-count rounds),
  * not merges -- the property that makes 10^4-merge vocabularies
  * practical.
  *
  *   runMain graft.tools.BpeBench [sfDir] [merges] [perRound]
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val merges = if (args.length > 1) args(1).toInt else 16
    val perRound = if (args.length > 2) args(2).toInt else 4
    require(merges % perRound == 0, "merges must divide by perRound")
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }
    // warm the word-count path once so neither contender absorbs JIT
    graft.llmops.TextAnalysis.bpeTrain(docs, "text", rounds = 1).count()
    graft.core.Caches.releaseScoped()
    val (nSeq, tSeq) = time {
      graft.llmops.TextAnalysis.bpeTrain(docs, "text", rounds = merges)
        .count()
    }
    graft.core.Caches.releaseScoped()
    val (nBat, tBat) = time {
      graft.llmops.TextAnalysis.bpeTrainBatched(docs, "text",
        rounds = merges / perRound, perRound = perRound).count()
    }
    graft.core.Caches.releaseScoped()
    println(f"""{"merges":$merges,"seq_merges":$nSeq,"seq_sec":$tSeq%.2f,""" +
      f""""batched_merges":$nBat,"batched_rounds":${merges / perRound},""" +
      f""""batched_sec":$tBat%.2f,"speedup":${tSeq / tBat}%.2f}""")
    spark.stop()
  }
}

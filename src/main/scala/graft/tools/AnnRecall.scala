package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.Ann

/** Measure ANN recall@k vs brute force on the embeddings table: the
  * cell-probe variants trade recall for scan reduction; this prints the
  * actual numbers (recorded in BASELINE.md).
  *
  *   runMain graft.tools.AnnRecall [sfDir] [k] [nQueries]
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 10
    val nQ = if (args.length > 2) args(2).toInt else 20
    val spark = SparkSession.builder().master("local[*]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()
    val n = emb.count()
    val queries = emb.orderBy("vec_id").limit(nQ)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))

    def recall(name: String,
        search: Seq[Double] => org.apache.spark.sql.DataFrame,
        scanned: Seq[Double] => Long): Unit = {
      var hit = 0
      var total = 0
      var scanSum = 0L
      queries.foreach { case (_, q) =>
        val exact = Ann.bruteForceTopK(emb, "vec_id", "embedding", q, k)
          .collect().map(_.getLong(0)).toSet
        val approx = search(q).collect().map(_.getLong(0)).toSet
        hit += (exact intersect approx).size
        total += exact.size
        scanSum += scanned(q)
      }
      println(f"[recall] $name%-28s recall@$k = ${hit.toDouble / total}%.3f" +
        f"  avg scanned = ${scanSum / queries.length}%d / $n rows")
    }

    recall("ivf(bits=3, probes=2)",
      q => Ann.ivfTopK(emb, "vec_id", "embedding", q, k, bits = 3, probes = 2),
      q => n / 8 * 2)
    recall("ivf(bits=6, probes=1)",
      q => Ann.ivfTopK(emb, "vec_id", "embedding", q, k, bits = 6),
      q => Ann.withCell(emb, "embedding", 6)
        .where(col("cell") === Ann.cellOf(q, 6)).count())
    recall("ivf(bits=6, probes=4)",
      q => Ann.ivfTopK(emb, "vec_id", "embedding", q, k, bits = 6, probes = 4),
      q => n / 64 * 4)
    recall("hyperplane(12 planes, 4 probes)",
      q => Ann.hyperplaneTopK(emb, "vec_id", "embedding", q, k,
        planes = 12, probes = 4),
      q => n / 4096 * 4)
    recall("hyperplane(8 planes, 8 probes)",
      q => Ann.hyperplaneTopK(emb, "vec_id", "embedding", q, k,
        planes = 8, probes = 8),
      q => n / 256 * 8)
    recall("hyperplane(4 planes, 4 probes)",
      q => Ann.hyperplaneTopK(emb, "vec_id", "embedding", q, k,
        planes = 4, probes = 4),
      q => n / 16 * 4)
    spark.stop()
  }
}

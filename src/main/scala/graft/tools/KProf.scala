package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.{TextAnalysis, Dedup}
object KProf {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 2000000L
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docsPath = java.nio.file.Files.createTempDirectory("kprof").toString + "/docs"
    spark.range(nDocs).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(189)), i =>
          substring(md5(concat(col("doc_id").cast("string"), lit(":"), i.cast("string"))), lit(1),
            (pmod(xxhash64(col("doc_id"), i), lit(7)) + 2).cast("int")))))
      .write.mode("overwrite").parquet(docsPath)
    val docs = spark.read.parquet(docsPath)
    def timed(name: String)(c: org.apache.spark.sql.Column): Unit = {
      // warm once cheap? just run 2 reps, min
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        docs.agg(max(xxhash64(c))).head()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[kprof] $name%-18s $best%7.2f s  ($nDocs%,d docs)")
    }
    timed("pii_expr")(hash(graft.functions.TextFunctions.redactPii(col("text"))))
    timed("pii_udf")(hash(graft.functions.TextFunctions.redactPiiUdf(col("text"))))
    timed("qc_expr")(hash(graft.functions.QualityCountsExpr(col("text"))))
    timed("qc_udf")(hash(TextAnalysis.qualityCountsUdf(col("text"))))
    val nB = if (args.length > 1) args(1).toLong else nDocs / 20
    val bdocs = docs.where(col("doc_id") < nB).repartition(32).cache()
    bdocs.count()
    def timedB(name: String)(c: org.apache.spark.sql.Column): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        bdocs.agg(max(xxhash64(c))).head()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[kprof] $name%-18s $best%7.2f s  ($nB%,d docs)")
    }
    timedB("bands_expr")(hash(graft.functions.MinhashBandKeys(col("text"), 3, 32, 4)))
    timedB("bands_udf")(hash(Dedup.bandKeysUdf(3, 32, 4)(col("text"))))
    timedB("bands8_expr")(hash(graft.functions.MinhashBandKeys(col("text"), 3, 8, 4)))
    timedB("bands8_udf")(hash(Dedup.bandKeysUdf(3, 8, 4)(col("text"))))
    val exploded_e = bdocs.select(posexplode(
      graft.functions.MinhashBandKeys(col("text"), 3, 8, 4)).as(Seq("band", "bh")))
    val exploded_u = bdocs.select(posexplode(
      Dedup.bandKeysUdf(3, 8, 4)(col("text"))).as(Seq("band", "bh")))
    def timedDf(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        df.agg(max(xxhash64(col("band"), col("bh")))).head()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[kprof] $name%-18s $best%7.2f s  ($nB%,d docs)")
    }
    timedDf("posexp8_expr")(exploded_e)
    timedDf("posexp8_udf")(exploded_u)
    spark.stop()
  }
}

package graft.embed

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable embedding backend (reference: lib/embedding/embedding_client.ml
  * for the HTTP path, lib/query/query_embedding_provider.ml:22-42 for the
  * deterministic fallback). In this zero-egress environment the
  * deterministic embedder is the default; an HTTP embedder would plug in
  * behind the same trait via `mapPartitions` batching.
  */
trait Embedder extends Serializable {
  def dims: Int
  /** Pure per-string embedding (driver-side query embedding + tests). */
  def embed(text: String): Array[Double]
  /** Column expression embedding (distributed path). Must agree exactly
    * with [[embed]].
    */
  def embedCol(text: Column): Column
}

/** Canonical deterministic embedder.
  *
  * Structure mirrors the reference fallback (query_embedding_provider.ml:
  * 22-42): per (token, dim) hash -> bucket in [0,10000) -> mean over tokens
  * -> value in [0,1), clamped. The reference uses OCaml `Hashtbl.hash`,
  * which is not portable; we DEFINE the canonical hash as the first 8 hex
  * chars of md5("token:dim") parsed as an unsigned 32-bit int (documented
  * in SURVEY.md "hard parts"). md5 is public and bit-identical in Spark,
  * DuckDB, and java.security -- so the embedding is reproducible across
  * engines and test oracles.
  *
  * Determinism note: the mean is computed as an exact integer sum of
  * buckets followed by ONE double division, so token order / aggregation
  * order cannot perturb low bits.
  */
final case class DeterministicEmbedder(dims: Int = 1536) extends Embedder {

  private def tokensOf(text: String): Array[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  // MessageDigest.digest() resets the instance, so one per embed() call is
  // reused across all dims x tokens hashes (this is the distributed hot
  // path: VectorsJob runs embed() inside a compiled UDF).
  private def hash32(md: java.security.MessageDigest, s: String): Long = {
    val d = md.digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def bucket(token: String, dim: Int): Long =
    hash32(java.security.MessageDigest.getInstance("MD5"),
      s"$token:$dim") % 10000L

  def embed(text: String): Array[Double] = {
    val toks = tokensOf(text)
    val out = new Array[Double](dims)
    if (toks.isEmpty) return out
    val md = java.security.MessageDigest.getInstance("MD5")
    var d = 0
    while (d < dims) {
      var sum = 0L
      var i = 0
      while (i < toks.length) {
        sum += hash32(md, s"${toks(i)}:$d") % 10000L
        i += 1
      }
      val v = sum.toDouble / (toks.length * 10000.0)
      out(d) = math.max(0.0, math.min(1.0, v))
      d += 1
    }
    out
  }

  def embedCol(text: Column): Column = {
    // hash32 as a column expr: conv(hex8, 16, 10) -> unsigned 32-bit value.
    def bucketCol(tok: Column, dim: Column): Column =
      conv(substring(md5(concat(tok, lit(":"), dim.cast("string"))), 1, 8),
        16, 10).cast("long") % 10000L
    // bind: evaluate the tokenizer once per row, not once per dim.
    graft.functions.TextFunctions.bind(
      filter(split(lower(text), "\\s+"), t => length(t) > 0)) { toks =>
      transform(sequence(lit(0), lit(dims - 1)), dim => {
        val sum = aggregate(toks, lit(0L), (acc, t) => acc + bucketCol(t, dim))
        val n = size(toks)
        when(n === 0, 0.0).otherwise(
          least(greatest(sum.cast("double") / (n.cast("double") * 10000.0),
            lit(0.0)), lit(1.0)))
      })
    }
  }
}

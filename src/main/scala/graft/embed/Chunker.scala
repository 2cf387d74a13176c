package graft.embed

/** Batch chunker for remote embedding calls (reference
  * lib/embedding/embedding_client.ml:12-50): split by item count, then
  * recursively bisect any chunk whose total chars exceed the budget.
  * Runs inside `mapPartitions` of an HTTP-backed Embedder.
  */
object Chunker {
  final case class Limits(maxItems: Int = 2048, maxChars: Int = 120000)

  def chunk(items: Seq[String], limits: Limits = Limits()): Seq[Seq[String]] = {
    def bisect(chunk: Seq[String]): Seq[Seq[String]] = {
      if (chunk.isEmpty) Nil
      else if (chunk.map(_.length.toLong).sum <= limits.maxChars ||
        chunk.length == 1) Seq(chunk)
      else {
        val (a, b) = chunk.splitAt(chunk.length / 2)
        bisect(a) ++ bisect(b)
      }
    }
    items.grouped(limits.maxItems).toSeq.flatMap(bisect)
  }
}

package graft.llmops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over document-similarity graphs (the companion to
  * [[Dedup.connectedComponents]]): centrality scoring for curation --
  * e.g. rank documents by how centrally they sit in the near-dup /
  * knn graph and keep the most-connected exemplar per region, or
  * propagate a quality prior along similarity edges.
  *
  * Determinism: ranks are INTEGER MICROS end to end -- per-edge
  * contributions use integer division, per-node sums are exact longs
  * (order-independent), damping is an integer multiply + divide. Every
  * iteration is therefore bit-reproducible on any engine, which is what
  * makes a cross-engine oracle (and retry-safe production runs) possible;
  * textbook float PageRank changes low bits with partitioning.
  *
  * Scale shape: the symmetric edge list is persisted PRE-PARTITIONED on
  * the join key once (like connectedComponents); each iteration joins
  * the small (node, rank) frame to it, aggregates by destination, and
  * never moves the edges again. iters is a small constant -- the loop
  * runs on the driver but every step is a distributed plan.
  */
object Graphs {

  /** Integer PageRank over an undirected pair list. Returns
    * (id, rank_micro) after `iters` rounds from a uniform start of
    * 1e6 micros per node:
    *   rank'(n) = (1000 - dampingMilli) * 1000
    *            + dampingMilli * sum_{(v,n) in E} (rank(v) div deg(v))
    *              div 1000
    */
  def pageRank(pairs: DataFrame, aCol: String, bCol: String,
      iters: Int = 3, dampingMilli: Int = 850): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    require(iters >= 1 && dampingMilli >= 0 && dampingMilli <= 1000)
    val spark = pairs.sparkSession
    // materialize the projected pairs before the symmetrize union: both
    // union branches reference them, and unpersisted that re-executes
    // the (expensive) pair-generator DAG twice -- same fix as
    // connectedComponents
    val half = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .persist(MEMORY_AND_DISK)
    half.count()
    val edges = half.union(half.select(col("dst").as("src"),
        col("src").as("dst")))
      .repartition(col("src"))
      .persist(MEMORY_AND_DISK)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .persist(MEMORY_AND_DISK)
    val base = (1000L - dampingMilli) * 1000L
    // iters is FIXED (no convergence check), so the whole rank chain is
    // one lazy plan: 3 chained (join + agg) rounds over the CACHED edge
    // list, executed by a single action -- no per-iteration
    // materialization (a persist+count per round tripled this
    // operator's wall time at gate scale).
    // ranks CARRIES deg (r21): the contribution join needs rank AND
    // out-degree per src — keeping deg as a column of the rank frame
    // halves the per-iteration joins (edges ⋈ ranks ⋈ deg was two;
    // edges ⋈ ranks is one), and the final round drops the column.
    // Arithmetic is unchanged, so ranks stay bit-identical.
    var ranks = deg.select(col("src").as("id"), col("deg"),
      lit(1000000L).as("rank_micro"))
    var i = 0
    while (i < iters) {
      val contrib = edges
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"),
          expr("rank_micro div deg").as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("csum"))
      ranks = deg.select(col("src").as("id"), col("deg"))
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"), col("deg"),
          (lit(base) + expr(s"($dampingMilli * coalesce(csum, 0L)) div 1000"))
            .as("rank_micro"))
      i += 1
    }
    val out = graft.core.Caches.scoped(ranks.drop("deg"))
    out.count() // one action fills the cache through all rounds
    half.unpersist()
    edges.unpersist()
    deg.unpersist()
    out // scoped: harnesses release between queries; callers may earlier
  }
}

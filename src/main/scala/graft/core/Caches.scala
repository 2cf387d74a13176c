package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for operator-INTERNAL persists (the stage-table pattern:
  * a multi-consumer subtree pinned for the duration of one operator's
  * evaluation). Operators cannot unpersist these themselves -- they
  * return lazy frames and the final action happens in the caller -- so
  * "never unpersisted" was the previous convention, bounded only by
  * Spark's LRU eviction. That is fine for one query but accumulates
  * across a 109-gate session and can evict hotter caches.
  *
  * `scoped` persists AND registers (weakly -- an operator frame that
  * becomes unreachable is simply dropped); a harness calls
  * `releaseScoped()` at its natural barrier (Verify: after each query's
  * dump; Bench: after each timed run) to unpersist everything the
  * finished queries pinned. Caches the harness did NOT register (warm
  * fixture tables, prebuilt summaries) are untouched -- the reason this
  * is a registry and not `spark.catalog.clearCache()`.
  */
object Caches {

  private val reg =
    new java.util.concurrent.ConcurrentLinkedQueue[
      java.lang.ref.WeakReference[DataFrame]]()

  /** Persist `df` at `level` (no-op if already persisted) and register
    * it for the next [[releaseScoped]].
    */
  def scoped(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) df.persist(level)
    reg.add(new java.lang.ref.WeakReference(df))
    df
  }

  /** Unpersist (non-blocking) every registered frame; returns how many
    * were still persisted. Safe to call at any barrier: frames are
    * re-persisted by the operator on its next invocation.
    */
  def releaseScoped(): Int = {
    var n = 0
    var ref = reg.poll()
    while (ref != null) {
      val df = ref.get()
      if (df != null && df.storageLevel != StorageLevel.NONE) {
        df.unpersist(blocking = false)
        n += 1
      }
      ref = reg.poll()
    }
    n
  }
}

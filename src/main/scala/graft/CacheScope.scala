package graft

import scala.collection.mutable
import org.apache.spark.sql.Dataset

/** Pairs every engine-internal `Dataset.cache()` with an `unpersist`.
  *
  * Query builders return LAZY DataFrames — the action that materializes an
  * internal cache happens later, in the caller — so the builder itself
  * cannot unpersist without defeating the cache. Sites therefore register
  * through [[cached]], and the harness (Bench / Verify / Scratch, or any
  * library caller) calls [[drain]] after the final action on the returned
  * plan. Blocking unpersist, so executor storage memory is measurably empty
  * afterward (`sparkContext.getPersistentRDDs` — pinned by BenchSpec).
  *
  * At 100 TB this is the difference between "bounded intermediate per
  * query" and "storage memory monotonically accumulating across a long
  * session": `catalog.clearCache()` also works but is a global hammer that
  * would evict caches a co-resident application owns; drain() releases
  * exactly what this engine took.
  */
object CacheScope {
  private val live = mutable.ArrayBuffer.empty[Dataset[_]]

  /** Cache `df` and register it for the next [[drain]]. */
  def cached[T](df: Dataset[T]): Dataset[T] = synchronized {
    val c = df.cache()
    live += c
    c
  }

  /** Unpersist (blocking) every dataset cached since the last drain. */
  def drain(): Unit = synchronized {
    live.foreach(_.unpersist(blocking = true))
    live.clear()
  }
}

package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry of intra-operator persisted frames.
  *
  * Several operators persist an intermediate frame because it feeds two
  * or more consumers inside one query (LSH shingle corpora, prefix
  * inverted indexes, the profiling prefix-sum scan, self-joined edge
  * sets). `Dataset.persist` entries live in the session's CacheManager
  * until someone unpersists them — fine under Bench/Verify, which clear
  * the cache after every query, but a library caller composing many
  * operators in one long-lived session would accumulate cached frames
  * until eviction pressure. The registry makes the cleanup contract
  * explicit and uniform instead of per-operator scaladoc folklore:
  *
  *  - operators persist via [[CacheScope.ScopedPersist.persistScoped]]
  *    (or pass an already-persisted frame to [[register]]);
  *  - the caller runs `CacheScope.drain()` once the query's RESULT is
  *    materialized (written/collected/counted). Draining earlier is
  *    unsafe: some persists are correctness-critical while the plan is
  *    live (see Profiling.cumCounts — nondeterministic range partitioner
  *    seeds across re-evaluations).
  *
  * Bench and Verify drain after every query; ScalaTest sessions drain at
  * suite teardown via `clearCache`. Unpersisting an already-unpersisted
  * frame is a no-op, so operators that clean up after themselves (the
  * connected-components loops, MultiSink) may also register defensively.
  */
object CacheScope {

  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Track an already-persisted frame for the next [[drain]]. */
  def register[T](ds: Dataset[T]): Dataset[T] = { frames.add(ds); ds }

  /** Unpersist (non-blocking) every registered frame; returns how many
    * were released. Call only after the consuming query's result is
    * materialized.
    */
  def drain(): Int = {
    var n = 0
    var f = frames.poll()
    while (f != null) {
      try f.unpersist(blocking = false)
      catch { case _: Throwable => () } // a stopped session is not an error
      n += 1
      f = frames.poll()
    }
    n
  }

  /** `.persistScoped()` = persist at MEMORY_AND_DISK + register. */
  implicit final class ScopedPersist[T](private val ds: Dataset[T])
    extends AnyVal {
    def persistScoped(): Dataset[T] =
      register(ds.persist(StorageLevel.MEMORY_AND_DISK))
  }
}

package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Scoped registry of intra-operator persisted frames.
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
  *  - the caller releases them once the query's RESULT is materialized
  *    (written/collected/counted). Releasing earlier is unsafe: some
  *    persists are correctness-critical while the plan is live (see
  *    Profiling.cumCounts — nondeterministic range partitioner seeds
  *    across re-evaluations would misalign prefix sums).
  *
  * ==Two release modes==
  *
  *  - '''`CacheScope.scoped { … }`''' (concurrent-safe): frames
  *    registered on the calling thread inside the block go to a scope
  *    private to that block, drained when it exits. Two queries running
  *    on different threads each wrap their build-and-materialize in
  *    `scoped {}` and can never unpersist each other's live frames.
  *    The body MUST materialize its result before returning — a block
  *    returning a lazy DataFrame would have its persists released
  *    before evaluation (the correctness hazard above).
  *  - '''global [[drain]]''' (single-threaded sessions): frames
  *    registered outside any scope land in a process-wide queue that
  *    `drain()` empties. This is what Bench/Verify use — they run
  *    queries strictly sequentially. `drain()` is WHOLE-PROCESS: under
  *    concurrent query execution it would release frames still live
  *    inside another in-flight query, so concurrent callers must use
  *    `scoped {}` instead.
  */
object CacheScope {

  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Innermost active scope of the calling thread, if any. */
  private val active =
    new ThreadLocal[List[java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]]] {
      override def initialValue: List[java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]] = Nil
    }

  /** Track an already-persisted frame: to the calling thread's innermost
    * [[scoped]] block if one is active, else to the global queue for the
    * next [[drain]].
    */
  def register[T](ds: Dataset[T]): Dataset[T] = {
    active.get() match {
      case q :: _ => q.add(ds)
      case Nil    => frames.add(ds)
    }
    ds
  }

  /** Run `body` with a private scope: every frame registered on THIS
    * thread inside the block is released when the block exits (also on
    * exception). Safe under concurrent query execution — sibling scopes
    * and the global queue are untouched. `body` must materialize its
    * result before returning (see class doc).
    */
  def scoped[A](body: => A): A = {
    val q = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()
    active.set(q :: active.get())
    try body
    finally {
      active.set(active.get().tail)
      drainQueue(q)
    }
  }

  /** Unpersist (non-blocking) every GLOBALLY registered frame; returns
    * how many were released. Whole-process — call only from
    * single-threaded sessions, after the consuming query's result is
    * materialized; concurrent callers use [[scoped]].
    */
  def drain(): Int = drainQueue(frames)

  private def drainQueue(
      q: java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]): Int = {
    var n = 0
    var f = q.poll()
    while (f != null) {
      try f.unpersist(blocking = false)
      catch { case _: Throwable => () } // a stopped session is not an error
      n += 1
      f = q.poll()
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

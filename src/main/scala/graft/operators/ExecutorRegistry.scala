package graft.operators

import scala.collection.concurrent.TrieMap

/** Executor-side object registry ≅ the reference's ObjectRegistry
  * (tez-api/src/main/java/org/apache/tez/runtime/api/ObjectRegistry.java:37,
  * impl tez-runtime-internals/.../objectregistry/ObjectRegistryImpl.java):
  * a per-JVM cache letting tasks share expensive-to-build objects
  * (codecs, compiled automata, dictionaries) across tasks that land on the
  * same executor — container reuse made useful.
  *
  * Scope semantics: the reference offers session/DAG/vertex scopes; on
  * Spark the JVM outlives queries the same way (resident executors), so a
  * namespaced key plus explicit [[clear]] covers the same lifecycle. For
  * cluster-wide read-only data prefer a broadcast variable; this registry
  * is for lazily-built, non-serializable, or task-local-expensive state.
  */
object ExecutorRegistry {
  private val cache = TrieMap.empty[String, AnyRef]

  /** Get or build-and-cache; `build` runs at most once per executor JVM
    * per key (TrieMap getOrElseUpdate is atomic).
    */
  def cachedOrBuild[T <: AnyRef](key: String)(build: => T): T =
    cache.getOrElseUpdate(key, build).asInstanceOf[T]

  def clear(prefix: String): Unit =
    cache.keys.filter(_.startsWith(prefix)).foreach(cache.remove)
}

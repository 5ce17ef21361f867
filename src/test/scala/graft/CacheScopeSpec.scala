package graft

import org.scalatest.funsuite.AnyFunSuite

class CacheScopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("drain unpersists every registered frame and empties the registry") {
    import graft.CacheScope.ScopedPersist
    val a = Seq(1, 2, 3).toDF("x").persistScoped()
    val b = Seq(4, 5).toDF("y").persistScoped()
    a.count(); b.count() // materialize both caches
    assert(a.storageLevel.useMemory && b.storageLevel.useMemory)
    val n = CacheScope.drain()
    assert(n >= 2) // ours, plus whatever earlier suites left behind
    assert(!a.storageLevel.useMemory && !b.storageLevel.useMemory)
    assert(CacheScope.drain() == 0) // registry is empty now
  }

  test("register returns the same dataset and double-drain is a no-op") {
    val df = Seq(1).toDF("x").persist()
    assert(CacheScope.register(df) eq df)
    assert(CacheScope.drain() == 1)
    // unpersisting an already-unpersisted frame must not throw
    CacheScope.register(df)
    assert(CacheScope.drain() == 1)
  }
}

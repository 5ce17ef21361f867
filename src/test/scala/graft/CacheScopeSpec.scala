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

  test("scoped releases its own frames on exit and leaves the global queue alone") {
    import graft.CacheScope.ScopedPersist
    CacheScope.drain() // start clean
    val global = Seq(9).toDF("g").persistScoped() // outside any scope
    val inner = CacheScope.scoped {
      val a = Seq(1, 2).toDF("x").persistScoped()
      a.count() // materialize: the scoped contract
      assert(a.storageLevel.useMemory)
      a
    }
    // scope exit released the inner frame…
    assert(!inner.storageLevel.useMemory)
    // …but NOT the globally registered one (a concurrent query's frame)
    global.count()
    assert(global.storageLevel.useMemory)
    assert(CacheScope.drain() == 1) // only the global frame remained
  }

  test("scoped releases frames on exception and nests correctly") {
    import graft.CacheScope.ScopedPersist
    CacheScope.drain()
    var leaked: org.apache.spark.sql.DataFrame = null
    intercept[RuntimeException] {
      CacheScope.scoped {
        leaked = Seq(1).toDF("x").persistScoped()
        leaked.count()
        throw new RuntimeException("boom")
      }
    }
    assert(!leaked.storageLevel.useMemory) // released despite the throw
    // nesting: the inner scope drains only its own registrations
    CacheScope.scoped {
      val outer = Seq(2).toDF("y").persistScoped()
      outer.count()
      CacheScope.scoped {
        val in = Seq(3).toDF("z").persistScoped()
        in.count()
      }
      assert(outer.storageLevel.useMemory) // inner exit left it cached
    }
    assert(CacheScope.drain() == 0) // both scopes cleaned up after themselves
  }

  test("scoped isolates registrations across threads") {
    import graft.CacheScope.ScopedPersist
    CacheScope.drain()
    val t1Frame = Seq(1).toDF("a").persist()
    t1Frame.count()
    // a scope on another thread must not capture this thread's frames,
    // and draining it must not touch them
    val other = new Thread(() => {
      CacheScope.scoped {
        val mine = Seq(2).toDF("b").persistScoped()
        mine.count()
      }
    })
    CacheScope.scoped {
      CacheScope.register(t1Frame)
      other.start(); other.join()
      assert(t1Frame.storageLevel.useMemory) // survived the sibling's drain
    }
    assert(!t1Frame.storageLevel.useMemory) // our own scope released it
  }
}

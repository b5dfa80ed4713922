package graft.core

import graft.SparkSpec

class CachingSpec extends SparkSpec {
  import spark.implicits._

  test("within TTL the same persisted plan is returned") {
    Caching.invalidateAll()
    val a = Caching.cached(Seq(1, 2, 3).toDS(), "k1", ttlMs = 60000)
    val b = Caching.cached(Seq(9, 9, 9).toDS(), "k1", ttlMs = 60000)
    // second call ignored its argument — the cache hit wins inside TTL
    b.collect().sorted shouldBe Array(1, 2, 3)
    a.storageLevel.useMemory shouldBe true
  }

  test("after expiry the fresh dataset replaces the cached one") {
    Caching.invalidateAll()
    Caching.cached(Seq(1).toDS(), "k2", ttlMs = 1)
    Thread.sleep(10)
    val fresh = Caching.cached(Seq(2).toDS(), "k2", ttlMs = 60000)
    fresh.collect() shouldBe Array(2)
  }

  test("invalidate evicts and unpersists") {
    Caching.invalidateAll()
    Caching.cached(Seq(1).toDS(), "k3", ttlMs = 60000)
    Caching.size shouldBe 1
    Caching.invalidate("k3")
    Caching.size shouldBe 0
  }
}

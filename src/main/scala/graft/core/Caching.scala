package graft.core

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

import scala.collection.concurrent.TrieMap

/** TTL-based caching, mirroring the reference's `caching` module (SURVEY
  * §4.1 — trembita ships in-memory/infinispan caches with expiry; CITE:
  * caching/, recalled path — /root/reference empty).
  *
  * Spark-native form: `persist` with a driver-side expiry registry. On
  * access past the TTL the cached plan is unpersisted and re-persisted,
  * so the next action recomputes from source — the semantics a periodic
  * re-read of a slowly-changing dimension wants. Driver-side only; never
  * on the verified/bench path (wall-clock dependent).
  */
object Caching {

  private final case class Entry(ds: Dataset[_], expiresAtMs: Long)
  private val registry = TrieMap.empty[String, Entry]

  /** Persist `ds` under `key` for `ttlMs`. Subsequent calls within the TTL
    * return the SAME persisted plan; after expiry the old one is evicted
    * and the fresh dataset persisted in its place. */
  def cached[T](ds: Dataset[T], key: String, ttlMs: Long,
                level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] =
    // synchronized: a check-then-act race would double-persist and leak the
    // losing plan's blocks for the application lifetime; this is driver-side
    // and low-frequency, so a lock is the right tool
    registry.synchronized {
      val now = System.currentTimeMillis()
      // opportunistic sweep: without it, a key cached once and never
      // re-requested pins its persisted blocks for the application
      // lifetime (per-date keys leak one dataset per day) — expiry was
      // only ever checked on a same-key hit
      registry.filter { case (k, e) => k != key && e.expiresAtMs <= now }
        .keys.foreach(k => registry.remove(k).foreach(_.ds.unpersist(blocking = false)))
      registry.get(key) match {
        case Some(Entry(prev, exp)) if exp > now =>
          prev.asInstanceOf[Dataset[T]]
        case prior =>
          prior.foreach(_.ds.unpersist(blocking = false))
          val fresh = ds.persist(level)
          registry.put(key, Entry(fresh, now + ttlMs))
          fresh
      }
    }

  /** Evict one key (or everything) immediately. Synchronized on the same
    * lock as [[cached]]: an invalidateAll racing a concurrent cached()
    * could otherwise unpersist-then-clear around an in-flight persist and
    * leak the fresh entry's blocks. */
  def invalidate(key: String): Unit = registry.synchronized {
    registry.remove(key).foreach(_.ds.unpersist(blocking = false))
  }
  def invalidateAll(): Unit = registry.synchronized {
    registry.values.foreach(_.ds.unpersist(blocking = false))
    registry.clear()
  }

  def size: Int = registry.size
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small bounded memo for expensive materialized frames shared across
  * queries in one session (cluster labels, signature relations).
  *
  * Honesty about lifetime: a cached DataFrame strongly references its
  * SparkSession, so weak-keyed maps cannot evict (the value resurrects
  * the key — the classic WeakHashMap pitfall). Instead the cache is
  * strictly BOUNDED: at most [[MaxEntries]] frames, LRU-evicted, so a
  * JVM cycling through sessions or datasets retains a fixed number of
  * checkpointed frames at worst (their blocks are reclaimed by the
  * ContextCleaner once evicted and unreferenced). Sessions are keyed by
  * identity, values by a caller-chosen string; datasets under a key are
  * assumed immutable for the session — callers that rewrite a path in
  * place must [[invalidate]].
  */
object QueryMemo {

  val MaxEntries = 16

  private val cache =
    new java.util.LinkedHashMap[(Int, String), DataFrame](32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Int, String), DataFrame]): Boolean =
        size() > MaxEntries
    }

  private def k(s: SparkSession, key: String): (Int, String) =
    (System.identityHashCode(s), key)

  def get(s: SparkSession, key: String)(compute: => DataFrame): DataFrame =
    cache.synchronized {
      val kk = k(s, key)
      val hit = cache.get(kk)
      if (hit != null) hit
      else {
        val v = compute
        cache.put(kk, v)
        v
      }
    }

  def invalidate(s: SparkSession, key: String): Unit =
    cache.synchronized { cache.remove(k(s, key)): Unit }
}

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
  * REFERENCE (SparkSession does not override equals, and the value
  * strongly references its session anyway — an identity-hash key could
  * collide across two live sessions and serve a frame whose blocks
  * belong to a different SparkContext); values by a caller-chosen
  * string. Callers that memoize dataset-derived state fold the
  * dataset's content fingerprint
  * ([[graft.sources.DatasetFingerprint]]) into their key, so a dataset
  * rewritten in place misses the memo instead of serving stale frames;
  * [[invalidate]] remains for forcing a cold path over unchanged data.
  */
object QueryMemo {

  // Sized above the number of per-dataset artifact families the full
  // registry touches in one sweep (~15 as of r10: shingle/signature/
  // label/rank frames, purchase edges, Lloyd fit, aHash, PQ books,
  // IVF metadata, basket tables) — at the old bound of 16 a sweep
  // over two datasets (tests + bench) could LRU-evict an artifact
  // mid-sweep and silently re-pay its build in a later consumer.
  val MaxEntries = 48

  /** Monotonic count of memo HITS served since JVM start. Bench snapshots
    * it around each query to tag entries that rode a warm artifact
    * (their measured time is join-cost, not standalone cost) — see
    * VERDICT r09 item 2: without the tag, a memo miss is
    * indistinguishable from a plan regression in round-over-round diffs.
    */
  private val hitCounter = new java.util.concurrent.atomic.AtomicLong

  def hitCount: Long = hitCounter.get

  /** Second warm channel: artifacts served from PERSISTENT storage
    * (the on-disk IVF index) rather than this memo. Adoption happens
    * on a memo MISS, so without this counter an index-riding query
    * would report adopt-cost as standalone and dodge the warm tag.
    * Producers call [[noteExternalArtifactHit]] at their adopt site;
    * Bench folds both counters into one warm signal.
    */
  private val externalHitCounter = new java.util.concurrent.atomic.AtomicLong

  def externalHitCount: Long = externalHitCounter.get

  def noteExternalArtifactHit(): Unit =
    externalHitCounter.incrementAndGet(): Unit

  /** Drop every memoized frame (bench cold-mode: measure standalone
    * cost of queries that normally share artifacts). Evicted blocks are
    * reclaimed by the ContextCleaner once unreferenced.
    */
  def clearAll(): Unit = cache.synchronized { cache.clear() }

  private val cache =
    new java.util.LinkedHashMap[(SparkSession, String), AnyRef](32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), AnyRef]): Boolean =
        size() > MaxEntries
    }

  private def k(s: SparkSession, key: String): (SparkSession, String) =
    (s, key)

  def get(s: SparkSession, key: String)(compute: => DataFrame): DataFrame =
    getAny[DataFrame](s, key)(compute)

  /** Same bounded memo for non-frame artifacts (a materialized index
    * path + its driver-side metadata). The caller owns key uniqueness
    * per value type — a key always maps to one type.
    */
  def getAny[T <: AnyRef](s: SparkSession, key: String)(compute: => T): T =
    cache.synchronized {
      val kk = k(s, key)
      val hit = cache.get(kk)
      if (hit != null) { hitCounter.incrementAndGet(); hit.asInstanceOf[T] }
      else {
        val v = compute
        cache.put(kk, v)
        v
      }
    }

  def invalidate(s: SparkSession, key: String): Unit =
    cache.synchronized { cache.remove(k(s, key)): Unit }
}

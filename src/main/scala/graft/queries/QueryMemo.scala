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

  /** Monotonic count of LRU EVICTIONS since JVM start. The r10 sweep
    * proved the failure mode this guards: a working set one artifact
    * family past [[MaxEntries]] silently re-charges evicted builds to
    * later consumers (82.6→89.7 s with every *edited* query improving —
    * SCALE.md §21). Bench snapshots this around the sweep and flags any
    * mid-sweep eviction in its JSON, so the cliff is detected
    * mechanically instead of by chasing a total-time regression.
    */
  private val evictionCounter = new java.util.concurrent.atomic.AtomicLong

  def evictionCount: Long = evictionCounter.get

  /** Drop every memoized frame (bench cold-mode: measure standalone
    * cost of queries that normally share artifacts). Evicted blocks are
    * reclaimed by the ContextCleaner once unreferenced.
    */
  def clearAll(): Unit = cache.synchronized { cache.clear() }

  private val cache =
    new java.util.LinkedHashMap[(SparkSession, String), AnyRef](32, 0.75f, true)

  /** Evict least-recently-used NON-Pending entries until the map is back
    * at [[MaxEntries]]. Runs under the cache monitor after each insert.
    * `removeEldestEntry` was the wrong hook for this (r11 ADVICE): it
    * inspects only the single eldest slot, so a long-running Pending
    * parked there suspended eviction entirely and the overshoot drained
    * one entry per later insert. An explicit sweep skips in-flight
    * Pendings (evicting one would let a second thread duplicate a
    * minutes-long build and would pollute the eviction-cliff signal)
    * but still evicts settled entries PAST them, so the overshoot is
    * bounded by the number of live Pendings by construction.
    */
  private def evictOverflow(): Unit =
    if (cache.size() > MaxEntries) {
      val it = cache.entrySet().iterator()
      while (cache.size() > MaxEntries && it.hasNext) {
        if (!it.next().getValue.isInstanceOf[Pending]) {
          it.remove()
          evictionCounter.incrementAndGet(): Unit
        }
      }
    }

  private def k(s: SparkSession, key: String): (SparkSession, String) =
    (s, key)

  def get(s: SparkSession, key: String)(compute: => DataFrame): DataFrame =
    getAny[DataFrame](s, key)(compute)

  /** In-flight build placeholder: `compute` (often minutes of Spark
    * jobs) runs OUTSIDE the cache monitor, so concurrent threads
    * touching other keys never block on an artifact build (r10 ADVICE —
    * the old compute-under-lock worked only via monitor reentrancy for
    * the nested candidateEdges→candidatePairs gets). A second thread
    * asking for the SAME key awaits the owner's latch instead of
    * duplicating the build.
    */
  private final class Pending {
    val done = new java.util.concurrent.CountDownLatch(1)
    val owner: Thread = Thread.currentThread()
    @volatile var value: AnyRef = null
    @volatile var failure: Throwable = null
  }

  /** Same bounded memo for non-frame artifacts (a materialized index
    * path + its driver-side metadata). The caller owns key uniqueness
    * per value type — a key always maps to one type. `compute` must not
    * re-enter the memo on ITS OWN key (self-recursive keys would await
    * their own latch); nested gets on other keys are fine and
    * lock-free.
    */
  def getAny[T <: AnyRef](s: SparkSession, key: String)(compute: => T): T = {
    val kk = k(s, key)
    var pending: Pending = null
    var owner = false
    cache.synchronized {
      cache.get(kk) match {
        case null =>
          pending = new Pending; owner = true; cache.put(kk, pending): Unit
          evictOverflow()
        case p: Pending => pending = p
        case v =>
          hitCounter.incrementAndGet()
          return v.asInstanceOf[T]
      }
    }
    if (owner) {
      try {
        val v = compute
        pending.value = v
        cache.synchronized {
          // publish ONLY into our own intact placeholder slot. An empty
          // or replaced slot means invalidate()/clearAll() (or a newer
          // build) intervened mid-build — re-inserting would silently
          // undo a force-cold drop, so the result is handed to waiters
          // but NOT cached.
          if (cache.get(kk) eq pending) cache.put(kk, v): Unit
        }
        pending.done.countDown()
        v
      } catch {
        case t: Throwable =>
          pending.failure = t
          cache.synchronized {
            if (cache.get(kk) eq pending) cache.remove(kk): Unit
          }
          pending.done.countDown()
          throw t
      }
    } else {
      // a compute re-entering the memo on ITS OWN key would await its
      // own latch — fail loudly instead of deadlocking (the old
      // compute-under-lock silently recomputed via monitor reentrancy)
      require(pending.owner ne Thread.currentThread(),
        s"self-recursive QueryMemo key: $key")
      // another thread is building this exact artifact: wait for it —
      // for bench warm-tagging this is a hit (the build cost lands on
      // the owner)
      pending.done.await()
      if (pending.failure != null) throw pending.failure
      hitCounter.incrementAndGet()
      pending.value.asInstanceOf[T]
    }
  }

  def invalidate(s: SparkSession, key: String): Unit =
    cache.synchronized { cache.remove(k(s, key)): Unit }
}

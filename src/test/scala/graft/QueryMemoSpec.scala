package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import graft.queries.QueryMemo

/** The memo's concurrency contract after the r10 ADVICE rework:
  * `compute` runs OUTSIDE the cache monitor behind a per-key in-flight
  * placeholder, so (1) one build per key no matter how many threads
  * race it, (2) a slow build on one key never blocks gets on other
  * keys, (3) a failed build propagates to its waiters and leaves no
  * poisoned entry behind.
  */
class QueryMemoSpec extends SparkSpec {

  private def key(tag: String) = s"memo-spec:$tag:${System.nanoTime()}"

  test("concurrent same-key gets run compute exactly once, all threads " +
      "see the same value") {
    val k = key("once")
    val computes = new AtomicInteger(0)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[AnyRef]()
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        val v = QueryMemo.getAny[java.lang.Long](spark, k) {
          computes.incrementAndGet()
          Thread.sleep(150)
          java.lang.Long.valueOf(42L)
        }
        results.add(v): Unit
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(10000))
    assert(computes.get() == 1, s"compute ran ${computes.get()} times")
    import scala.jdk.CollectionConverters._
    assert(results.asScala.toSet == Set(java.lang.Long.valueOf(42L)))
    QueryMemo.invalidate(spark, k)
  }

  test("a slow build on one key does not block a get on another key") {
    val slowK = key("slow"); val fastK = key("fast")
    val slowStarted = new CountDownLatch(1)
    val releaseSlow = new CountDownLatch(1)
    val fastDone = new CountDownLatch(1)
    val slow = new Thread(() =>
      QueryMemo.getAny[java.lang.Long](spark, slowK) {
        slowStarted.countDown()
        releaseSlow.await(10, TimeUnit.SECONDS)
        java.lang.Long.valueOf(1L)
      }: Unit)
    slow.start()
    assert(slowStarted.await(5, TimeUnit.SECONDS))
    // with compute-under-lock this get would deadlock until releaseSlow
    val fast = new Thread(() => {
      QueryMemo.getAny[java.lang.Long](spark, fastK)(
        java.lang.Long.valueOf(2L)): Unit
      fastDone.countDown()
    })
    fast.start()
    val fastFinishedWhileSlowHeld = fastDone.await(5, TimeUnit.SECONDS)
    releaseSlow.countDown(); slow.join(10000); fast.join(10000)
    assert(fastFinishedWhileSlowHeld,
      "get(fastKey) blocked behind the in-flight build of slowKey")
    QueryMemo.invalidate(spark, slowK); QueryMemo.invalidate(spark, fastK)
  }

  test("a failed build propagates to waiters and the key recomputes " +
      "on the next get") {
    val k = key("fail")
    val started = new CountDownLatch(1)
    val ownerFailed = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val waiterFailed = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val owner = new Thread(() =>
      try QueryMemo.getAny[java.lang.Long](spark, k) {
        started.countDown(); Thread.sleep(100)
        throw new IllegalStateException("build exploded")
      }: Unit
      catch { case t: Throwable => ownerFailed.set(t) })
    owner.start()
    assert(started.await(5, TimeUnit.SECONDS))
    val waiter = new Thread(() =>
      try QueryMemo.getAny[java.lang.Long](spark, k)(
        java.lang.Long.valueOf(9L)): Unit
      catch { case t: Throwable => waiterFailed.set(t) })
    waiter.start()
    owner.join(10000); waiter.join(10000)
    assert(ownerFailed.get() != null &&
      ownerFailed.get().getMessage == "build exploded")
    // the waiter either joined the failed build (sees its exception) or
    // arrived after the cleanup (recomputed 9L) — both are correct; what
    // is FORBIDDEN is a hang or a poisoned null
    if (waiterFailed.get() != null)
      assert(waiterFailed.get().getMessage == "build exploded")
    // the failed entry must not stick: a later get recomputes
    val v = QueryMemo.getAny[java.lang.Long](spark, k)(
      java.lang.Long.valueOf(7L))
    assert(v == 7L)
    QueryMemo.invalidate(spark, k)
  }

  test("LRU eviction proceeds PAST a parked in-flight build (r11 " +
      "ADVICE: the removeEldestEntry hook stalled while a Pending sat " +
      "eldest, letting the map overshoot unboundedly)") {
    val pendingK = key("parked")
    val started = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val builder = new Thread(() =>
      QueryMemo.getAny[java.lang.Long](spark, pendingK) {
        started.countDown()
        release.await(30, TimeUnit.SECONDS)
        java.lang.Long.valueOf(1L)
      }: Unit)
    builder.start()
    assert(started.await(5, TimeUnit.SECONDS))
    // the Pending is now the least-recently-used entry (nothing touches
    // it again); flood the memo past MaxEntries — eviction must skip
    // the Pending but still reclaim settled entries beyond it
    val before = QueryMemo.evictionCount
    val overshoot = 5
    val fills = (1 to QueryMemo.MaxEntries + overshoot).map(i => key(s"fill$i"))
    fills.foreach(kk => QueryMemo.getAny[java.lang.Long](spark, kk)(
      java.lang.Long.valueOf(0L)): Unit)
    val evicted = QueryMemo.evictionCount - before
    assert(evicted >= overshoot,
      s"only $evicted evictions after ${fills.size} inserts with a " +
        "Pending parked at the LRU position — eviction is stalling " +
        "behind the in-flight build again")
    // the in-flight build survived the sweep: its result publishes and
    // a later get is a HIT, not a duplicate compute
    release.countDown(); builder.join(10000)
    val recomputes = new AtomicInteger(0)
    val v = QueryMemo.getAny[java.lang.Long](spark, pendingK) {
      recomputes.incrementAndGet(); java.lang.Long.valueOf(99L)
    }
    assert(v == 1L && recomputes.get() == 0,
      "the parked build's entry was evicted mid-flight")
    QueryMemo.invalidate(spark, pendingK)
    fills.foreach(QueryMemo.invalidate(spark, _))
  }

  test("a self-recursive key fails loudly instead of deadlocking on " +
      "its own latch") {
    val k = key("recurse")
    val e = intercept[IllegalArgumentException] {
      QueryMemo.getAny[java.lang.Long](spark, k) {
        QueryMemo.getAny[java.lang.Long](spark, k)(
          java.lang.Long.valueOf(1L))
      }
    }
    assert(e.getMessage.contains("self-recursive"))
    // the failed build must not poison the key
    assert(QueryMemo.getAny[java.lang.Long](spark, k)(
      java.lang.Long.valueOf(5L)) == 5L)
    QueryMemo.invalidate(spark, k)
  }
}

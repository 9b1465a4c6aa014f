package graft.operators

/** The ONE definition of funnel-progression semantics, shared by the
  * batch query ([[graft.queries.TimeseriesQueries.q110]]) and the
  * streaming monitor
  * ([[graft.streaming.EventStreams.funnelMonitor]]) — train/serve
  * consistency for the funnel is literally both runtimes calling this
  * function.
  *
  * Contract: events arrive TIME-SORTED as `(event_type, micros)`;
  * the walk advances step `k` on the first event whose type is
  * `steps(k)` and whose micros are STRICTLY greater than step `k−1`'s
  * (same-micros never advances — every step time is a min over
  * values, so the result is tie-order-independent). Greedy
  * earliest-first is depth-OPTIMAL: it minimizes every prefix's
  * deadline, so any event chain feasible for some assignment is
  * feasible under it (PropertySpec pins this against a brute-force
  * maximal-chain search). It is also SPLIT-CONSISTENT:
  * `walk(a ++ b) == walk(b, init = walk(a))` for any time-ordered
  * split — the theorem that makes the streaming monitor's per-batch
  * resumption equal the batch backfill (PropertySpec pins this too).
  */
object FunnelWalk {

  /** Completed-step times after consuming `sorted` on top of the
    * already-completed prefix `init` (times of steps 0..init.length-1).
    */
  def walk(sorted: Iterable[(String, Long)], steps: IndexedSeq[String],
           init: List[Long] = Nil): List[Long] = {
    var times = init
    val it = sorted.iterator
    while (it.hasNext && times.length < steps.length) {
      val (tpe, tus) = it.next()
      val k = times.length
      if (tpe == steps(k) && (k == 0 || tus > times.last))
        times = times :+ tus
    }
    times
  }
}

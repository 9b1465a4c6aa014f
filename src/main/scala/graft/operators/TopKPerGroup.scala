package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k per group as a typed `Aggregator` — the scale-correct
  * generalization of [[ArgMinMax]] from k=1 to small k.
  *
  * The standard Spark recipe (`row_number()` over a window, filter
  * rank ≤ k) SORTS every group's full row set: the shuffle carries all
  * N rows and each partition runs a sort — at 100 TB that is the
  * dominant cost for a query whose answer is k rows per group. This
  * aggregator instead keeps a k-bounded buffer per group: partial
  * (map-side) aggregation reduces every input partition to ≤ k rows
  * per group BEFORE the shuffle, the exchange carries ≤ k·partitions
  * rows per group, and nothing is ever globally sorted. (Same plan
  * family as Spark's own `TakeOrderedAndProject`, but per group.)
  *
  * Determinism: callers supply a TOTAL ordering (tie-break included) —
  * the same repo-wide arbitration discipline as BandJoin/ArgMinMax.
  */
object TopKPerGroup {

  /** Typed top-k aggregator: retains the k smallest elements of the
    * group under `ord` (pass the reversed ordering for top-k-largest).
    * The buffer is a sorted ≤ k-element list, so reduce is O(k) per row
    * and merge O(k); both sides of the shuffle stay k-bounded.
    */
  class TopKAggregator[I](k: Int, ord: Ordering[I],
                          bufEnc: Encoder[List[I]], outEnc: Encoder[Seq[I]])
      extends Aggregator[I, List[I], Seq[I]] with Serializable {
    require(k > 0, "k must be positive")

    override def zero: List[I] = Nil

    // insert-in-order into a ≤k sorted list (no full re-sort per row)
    override def reduce(b: List[I], a: I): List[I] = {
      if (b.length >= k && ord.gteq(a, b.last)) b
      else {
        val (lt, gte) = b.span(x => ord.lt(x, a))
        (lt ::: a :: gte).take(k)
      }
    }

    override def merge(x: List[I], y: List[I]): List[I] = {
      // merge two sorted lists, keep k — O(k), not O(k log k)
      val out = List.newBuilder[I]
      var (a, b, n) = (x, y, 0)
      while (n < k && (a.nonEmpty || b.nonEmpty)) {
        if (b.isEmpty || (a.nonEmpty && ord.lteq(a.head, b.head))) {
          out += a.head; a = a.tail
        } else { out += b.head; b = b.tail }
        n += 1
      }
      out.result()
    }

    override def finish(b: List[I]): Seq[I] = b
    override def bufferEncoder: Encoder[List[I]] = bufEnc
    override def outputEncoder: Encoder[Seq[I]] = outEnc
  }

  /** Convenience constructor for Product element types (tuples, case
    * classes): reflection-derives the buffer/output encoders. Runtime
    * reflection can fail under REPL-style classloaders (e.g. the sbt
    * console) — use [[topKWith]] with explicit encoders there.
    */
  def topK[I <: Product: scala.reflect.runtime.universe.TypeTag](
      k: Int, ord: Ordering[I]): TopKAggregator[I] =
    new TopKAggregator[I](k, ord,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[I]](),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[I]]())

  /** Explicit-encoder variant for non-Product element types. */
  def topKWith[I](k: Int, ord: Ordering[I], bufEnc: Encoder[List[I]],
                  outEnc: Encoder[Seq[I]]): TopKAggregator[I] =
    new TopKAggregator[I](k, ord, bufEnc, outEnc)
}

package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch as a typed `Aggregator` — the mergeable frequency
  * sketch beside [[KmvSketch]]'s distinct-count sketch: a fixed
  * `depth × width` grid of long counters; every occurrence increments
  * one counter per depth row (`bucket_d = hash_d(key) % width`), and
  * the frequency estimate for a key is the MIN of its `depth` counters
  * — always ≥ the true count (counters only ever over-count on
  * collisions), with the classic `ε·N` overestimate bound at
  * `width = e/ε` (Cormode & Muthukrishnan).
  *
  * Like KMV — and unlike engine-private HLL registers — the state is a
  * pure, order-free function of the input MULTISET given public hash
  * functions: this engine derives `bucket_d` from the same 32-bit md5
  * convention the dedup surface uses (`md5("cms<d>-" + key)`), so the
  * whole grid AND every estimate replay exactly in SQL (per-depth
  * bucket sums, min across depths) and hash-gate with no error-bound
  * hedge. Addition is commutative/associative, so a streaming fold of
  * the same rows reaches the IDENTICAL grid in any arrival order or
  * micro-batch split — the property the streaming twin pins.
  *
  * Scale shape: the map side reduces EVERY partition to one
  * `depth·width` long array before the exchange — a 100 TB token
  * stream shuffles `depth·width·partitions` longs, never token rows —
  * and the merged grid is a bounded driver artifact (`depth·width·8`
  * bytes, ~8 KiB at 4×256) that broadcasts back into whatever
  * declarative estimate join needs it. The sketch answers point
  * frequency queries over keys chosen AFTER the pass (heavy-hitter
  * candidates, blocklist probes) without re-scanning the corpus.
  *
  * Input rows are pre-bucketed `(bucket_0 … bucket_{depth-1})` index
  * arrays: bucketization stays in codegen'd Column expressions
  * (md5 + pmod), the aggregator only increments — no per-row string
  * hashing inside the typed boundary.
  */
object CountMinSketch {

  class CmsAggregator(depth: Int, width: Int,
                      bufEnc: Encoder[Array[Long]],
                      outEnc: Encoder[Seq[Long]])
      extends Aggregator[Seq[Int], Array[Long], Seq[Long]] with Serializable {
    require(depth > 0 && width > 0, "depth and width must be positive")

    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(grid: Array[Long], buckets: Seq[Int]): Array[Long] = {
      var d = 0
      while (d < depth) {
        grid(d * width + buckets(d)) += 1L
        d += 1
      }
      grid
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(grid: Array[Long]): Seq[Long] =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(grid)
    override def bufferEncoder: Encoder[Array[Long]] = bufEnc
    override def outputEncoder: Encoder[Seq[Long]] = outEnc
  }

  def aggregator(depth: Int, width: Int,
                 bufEnc: Encoder[Array[Long]],
                 outEnc: Encoder[Seq[Long]]): CmsAggregator =
    new CmsAggregator(depth, width, bufEnc, outEnc)

  /** Weighted variant: one row per DISTINCT key carrying its
    * occurrence count, each counter bumped by the count. Because grid
    * cells are plain sums, folding (key, n) pairs is EXACTLY the
    * per-occurrence fold of the expanded multiset (addition is
    * commutative/associative — SamplingSpec pins the equality), which
    * lets a consumer that already aggregated exact counts (q116's
    * baseline side) derive the grid with |vocab| hash draws instead of
    * |tokens|. Streaming folds keep the per-occurrence form — a stream
    * has no final counts to ride.
    */
  class CmsWeightedAggregator(depth: Int, width: Int,
                              bufEnc: Encoder[Array[Long]],
                              outEnc: Encoder[Seq[Long]])
      extends Aggregator[(Seq[Int], Long), Array[Long], Seq[Long]]
      with Serializable {
    require(depth > 0 && width > 0, "depth and width must be positive")
    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(grid: Array[Long],
                        row: (Seq[Int], Long)): Array[Long] = {
      val (buckets, n) = row
      var d = 0
      while (d < depth) {
        grid(d * width + buckets(d)) += n
        d += 1
      }
      grid
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(grid: Array[Long]): Seq[Long] =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(grid)
    override def bufferEncoder: Encoder[Array[Long]] = bufEnc
    override def outputEncoder: Encoder[Seq[Long]] = outEnc
  }

  def weightedAggregator(depth: Int, width: Int,
                         bufEnc: Encoder[Array[Long]],
                         outEnc: Encoder[Seq[Long]]): CmsWeightedAggregator =
    new CmsWeightedAggregator(depth, width, bufEnc, outEnc)

  /** Point-frequency estimate from a merged grid: min over the key's
    * `depth` counters. Never under the true count; equality holds iff
    * some depth row gave the key a collision-free counter.
    */
  def estimate(grid: Seq[Long], width: Int, buckets: Seq[Int]): Long = {
    var best = Long.MaxValue
    var d = 0
    while (d < buckets.length) {
      val c = grid(d * width + buckets(d))
      if (c < best) best = c
      d += 1
    }
    best
  }
}

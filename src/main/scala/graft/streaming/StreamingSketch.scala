package graft.streaming

import graft.functions.DedupFunctions
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StateVersion.Ops

/** Streaming count-min sketch — the online twin of
  * [[graft.queries.SamplingQueries.q116]]'s batch grid, and the
  * third exactly-consistent sketch twin beside the KMV monitor
  * (order-free state: addition commutes, so any arrival order and any
  * micro-batch split reach the identical grid — StreamingSpec pins
  * stream ≡ batch with no cross-batch caveat).
  *
  * Scale shape: the state is SHARDED by token hash — each shard key
  * owns the tokens hashing to it and folds ONLY their increments into
  * its own depth×width grid, so sketch maintenance is spread across
  * `shards` parallel state keys instead of one global bottleneck key.
  * Because shards partition the token multiset, the full corpus grid
  * is the ELEMENTWISE SUM of shard grids — exact, not approximate:
  * each counter's total is a sum over disjoint contributions. A
  * consumer merges `shards` × 8 KiB arrays, never token rows. Per-key
  * state is one fixed-size long array forever; emission is one row
  * per shard per micro-batch that saw data.
  */
object StreamingSketch {

  /** One shard's grid state: depth·width counters, row-major. */
  case class CmsShardState(grid: Seq[Long])

  /** Emitted per micro-batch per shard that received tokens. */
  case class CmsShardRow(shard: Long, grid: Seq[Long])

  /** JVM-side twin of [[graft.queries.SamplingQueries.cmsBuckets]]:
    * same md5 seed convention, same modulus, same integer result.
    */
  private[graft] def bucketJvm(d: Int, token: String): Int =
    (DedupFunctions.md5Hash32Jvm(s"cms$d-$token") %
      graft.queries.SamplingQueries.CmsWidth).toInt

  /** Fold a token stream into sharded CMS grids. `shards` sizes the
    * state parallelism (production: O(cluster cores); the gate uses a
    * handful so every shard path is exercised).
    */
  def cmsMonitor(tokens: Dataset[String], shards: Int): Dataset[CmsShardRow] = {
    import tokens.sparkSession.implicits._
    val depth = graft.queries.SamplingQueries.CmsDepth
    val width = graft.queries.SamplingQueries.CmsWidth
    tokens
      .groupByKey(w => DedupFunctions.md5Hash32Jvm("cms-shard-" + w) % shards)
      .flatMapGroupsWithVersionedState[CmsShardState, CmsShardRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Long, it: Iterator[String], state: GroupState[CmsShardState]) =>
          val grid = state.getOption
            .map(_.grid.toArray)
            .getOrElse(new Array[Long](depth * width))
          it.foreach { w =>
            var d = 0
            while (d < depth) {
              grid(d * width + bucketJvm(d, w)) += 1L
              d += 1
            }
          }
          val snap = scala.collection.immutable.ArraySeq.unsafeWrapArray(grid)
          state.update(CmsShardState(snap))
          Iterator.single(CmsShardRow(shard, snap))
      }
  }

  /** Elementwise sum of the LATEST grid per shard — the exact full
    * corpus grid (shards partition the token multiset).
    */
  def mergeShardGrids(rows: Seq[CmsShardRow]): Seq[Long] = {
    val out = new Array[Long](
      graft.queries.SamplingQueries.CmsDepth *
        graft.queries.SamplingQueries.CmsWidth)
    rows.groupBy(_.shard).values.foreach { perShard =>
      // callers pass every emission; the last per shard is cumulative
      val last = perShard.last.grid
      var i = 0
      while (i < out.length) { out(i) += last(i); i += 1 }
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }
}

package graft.operators

import graft.Materialize.Ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Distributed sequence packing: assign every row a running token sum
  * and a fixed-budget bin id (greedy fill in `orderCol` order, restarted
  * per `keyCols` group) WITHOUT a per-key window.
  *
  * `Window.partitionBy(key).orderBy(order)` computes the same running
  * sum, but a window partition is ONE task: with a handful of sources
  * (the realistic corpus shape — "web" is most of a pretraining corpus)
  * the whole corpus sorts and prefix-sums through a few executors. This
  * operator is the classic two-pass distributed prefix sum instead:
  *
  *  1. range-partition on (keys…, order) — the engine's ordinary sort
  *     shuffle, every partition bounded by `maxPartitionBytes`-scale
  *     sizing, a hot key SPANS partitions instead of owning one task;
  *  2. pass 1: per-(partition, key) token subtotals — a tiny aggregate
  *     (at most partitions × live keys rows) collected to the driver;
  *  3. exclusive running offsets per key across partitions (driver-side
  *     scan of the tiny table, broadcast back);
  *  4. pass 2: NARROW per-partition local cumsum seeded from the
  *     broadcast offset — zero additional shuffle.
  *
  * Wall-clock parallelism is therefore `numPartitions` regardless of key
  * cardinality or skew. Output is bit-identical to the window form
  * because range partitioning totally orders (keys…, order) across
  * partitions; OperatorsSpec pins the equivalence both on a direct
  * collect AND through a downstream `.coalesce(1)`.
  *
  * The range-partitioned relation is materialized (Materialize seam) so both passes
  * read the SAME materialization: partition boundaries come from
  * sampling, and re-planning between passes could legally re-draw them,
  * desynchronizing pass-2 split ids from pass-1 offsets. The checkpoint
  * also means the corpus is tokenized/scanned once, not twice; its
  * blocks are reclaimed by the ContextCleaner when the result frame is
  * dropped.
  *
  * Both passes key the offset map by the checkpointed RDD's OWN split
  * index (`mapPartitionsWithIndex`), never `TaskContext.getPartitionId`:
  * the task partition id belongs to whatever task evaluates the plan,
  * so a downstream `coalesce` (one task evaluating many parent splits)
  * would alias every split to pid 0 and silently restart the running
  * sum at each range boundary. The split index is a property of the
  * materialized RDD itself and is immune to the consumer's physical
  * plan.
  */
object SequencePacking {

  /** @param df         input rows; output rows are the input rows plus
    *                    `cum_tokens`/`bin_id`
    * @param keyCols    packing restarts at 0 per distinct key tuple
    * @param orderCol   fill order within a key (must be unique per key
    *                    for deterministic output, e.g. a doc id)
    * @param tokensCol  integral token count column (int or long, non-null)
    * @param tokensPerBin bin budget; `bin_id = (cum - n) / budget` —
    *                    greedy by count, oversized rows own their bins
    * @param numPartitions pass-1/2 parallelism; 0 = session shuffle
    *                    partitions
    */
  def withBins(df: DataFrame, keyCols: Seq[String], orderCol: String,
               tokensCol: String, tokensPerBin: Long,
               numPartitions: Int = 0): DataFrame = {
    val s = df.sparkSession
    val p =
      if (numPartitions > 0) numPartitions
      else s.sessionState.conf.numShufflePartitions
    val rangeCols = (keyCols :+ orderCol).map(col)
    val parted = df
      .repartitionByRange(p, rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
      .materialize()
    val schema = parted.schema
    val keyIdx = keyCols.map(schema.fieldIndex).toArray
    val tokIdx = schema.fieldIndex(tokensCol)
    val tokOf: Row => Long = schema(tokIdx).dataType match {
      case LongType    => r => r.getLong(tokIdx)
      case IntegerType => r => r.getInt(tokIdx).toLong
      case other => throw new IllegalArgumentException(
        s"$tokensCol must be integral, got $other")
    }
    // NUL-joined so multi-column keys cannot collide by concatenation; a
    // pathological NUL inside a key value would only merge two keys'
    // running sums, never drop rows
    def keyOf(r: Row): String =
      keyIdx.map(i => String.valueOf(r.get(i))).mkString(0.toChar.toString)

    // Both passes run over the SAME deserialized view of the
    // checkpointed partitions, keyed by the RDD's own split index.
    val rdd = parted.rdd

    // pass 1: per-(split, key) subtotals — tiny relative to the data
    val subtotals: Array[(Int, String, Long)] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val sums = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { r =>
          val k = keyOf(r)
          sums.update(k, sums.getOrElse(k, 0L) + tokOf(r))
        }
        sums.iterator.map { case (k, n) => (pid, k, n) }
      }
      .collect()

    // exclusive prefix offsets per key in partition (= range) order
    val offsets: Map[(Int, String), Long] =
      subtotals.groupBy(_._2).iterator.flatMap { case (k, rows) =>
        var acc = 0L
        rows.sortBy(_._1).map { case (pid, _, n) =>
          val o = acc; acc += n; ((pid, k), o)
        }
      }.toMap
    val bc = s.sparkContext.broadcast(offsets)

    // pass 2: narrow local cumsum seeded from the broadcast offsets
    val outSchema = schema.add("cum_tokens", LongType).add("bin_id", LongType)
    val outRows = rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = scala.collection.mutable.HashMap.empty[String, Long]
      it.map { r =>
        val k = keyOf(r)
        val n = tokOf(r)
        val cum = acc.getOrElse(k, bc.value.getOrElse((pid, k), 0L)) + n
        acc.update(k, cum)
        Row.fromSeq(r.toSeq :+ cum :+ (cum - n) / tokensPerBin)
      }
    }
    s.createDataFrame(outRows, outSchema)
  }
}

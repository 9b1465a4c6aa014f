package graft.streaming

import java.sql.Timestamp

import graft.functions.DedupFunctions
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StateVersion.Ops

/** Incoming document on the stream. */
case class DocEv(doc_id: Long, text: String, ts: Timestamp)

/** Emitted near-dup candidate: the incoming doc collided with an
  * earlier doc in at least one LSH band.
  */
case class DupCandidate(doc_id: Long, matched_doc_id: Long,
                        band_idx: Int, ts: Timestamp)

/** Per-band state: the doc ids seen in this band within the horizon. */
case class BandState(docIds: Seq[Long])

/** Streaming near-duplicate detection — the streaming twin of the
  * batch MinHash+LSH pipeline (q29) and the incremental batch form
  * (q58): each arriving document is shingled and MinHash-folded with
  * the SAME constants as the batch path, exploded to its LSH band
  * keys, and matched against a per-band state of previously seen doc
  * ids via `flatMapGroupsWithState`.
  *
  * Scale shape: state is keyed by (band_idx, band_key) — the natural
  * shard key, hot documents spread over [[graft.queries.DedupQueries.NBands]]
  * keys — and holds only doc ids (no text, no signatures). Event-time
  * timeout drops bands idle past the horizon, so state is bounded by
  * the stream's active-band count, not its history: the same
  * watermark-bounds-state discipline as
  * [[EventStreams.dedupWithinWatermark]], at near-dup rather than
  * exact-id granularity.
  */
object StreamingDedup {

  /** Candidate pairs over the stream: every (incoming doc, previously
    * seen doc) pair sharing a band. Exact-dup of the batch semantics
    * for the pairs within the horizon; pairs beyond it are traded away
    * with the dropped state (the declared streaming approximation).
    */
  def candidates(docs: Dataset[DocEv], nBands: Int, rowsPerBand: Int,
                 horizonMinutes: Int): Dataset[DupCandidate] = {
    import docs.sparkSession.implicits._
    val horizonMs = horizonMinutes * 60000L

    val banded = docs
      .withWatermark("ts", s"$horizonMinutes minutes")
      .select(col("doc_id"), col("ts"),
        explode(DedupFunctions.lshBands(
          DedupFunctions.minHashSignature(
            graft.functions.TextFunctions.wordShingles(col("text"),
              graft.queries.DedupQueries.ShingleN),
            nBands * rowsPerBand),
          nBands, rowsPerBand)).as("band"))
      .select(col("doc_id"), col("ts"),
        col("band.band_idx").as("band_idx"), col("band.band_key").as("band_key"))
      .as[(Long, Timestamp, Int, String)]

    banded
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithVersionedState[BandState, DupCandidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, String), it: Iterator[(Long, Timestamp, Int, String)],
         state: GroupState[BandState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // deterministic within a micro-batch: process in doc order
            val batch = it.toVector.sortBy(r => (r._1, r._2.getTime))
            val out = Vector.newBuilder[DupCandidate]
            var seen = state.getOption.map(_.docIds.toVector).getOrElse(Vector.empty)
            var maxTs = 0L
            batch.foreach { case (docId, ts, bandIdx, _) =>
              if (!seen.contains(docId)) {
                seen.foreach(prev =>
                  out += DupCandidate(docId, prev, bandIdx, ts))
                seen :+= docId
              }
              maxTs = math.max(maxTs, ts.getTime)
            }
            state.update(BandState(seen))
            state.setTimeoutTimestamp(maxTs + horizonMs)
            out.result().iterator
          }
      }
  }

  /** Distinct unordered duplicate PAIRS from a BATCH view of the
    * candidate output (e.g. a sink table): canonical (min, max) order
    * plus an exact dropDuplicates, so a pair that collided in k bands
    * reports once. For the streaming-native form — where an unbounded
    * exact distinct would hold state forever — use
    * [[pairsWithinWatermark]].
    */
  def pairs(cands: Dataset[DupCandidate]): Dataset[(Long, Long)] = {
    import cands.sparkSession.implicits._
    cands.select(
      least(col("doc_id"), col("matched_doc_id")).as("a"),
      greatest(col("doc_id"), col("matched_doc_id")).as("b"))
      .dropDuplicates("a", "b")
      .as[(Long, Long)]
  }

  /** Streaming-native distinct pairs: a `foreachBatch` writer that
    * hands each micro-batch's DISTINCT canonical pairs to `sink`. All
    * k band collisions of one incoming document are emitted by the
    * same micro-batch (its bands are processed together), so per-batch
    * distinct yields exactly one row per (pair, collision event) —
    * with zero dedup state. Chaining a stateful global distinct after
    * `flatMapGroupsWithState` is instead rejected by Spark's
    * global-watermark correctness check; a pair re-colliding in a much
    * later batch re-reports, which downstream decisioning (idempotent
    * on the pair, like the batch verify phase) absorbs.
    */
  def pairsForEachBatch(cands: Dataset[DupCandidate])(
      sink: Dataset[(Long, Long)] => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[DupCandidate] =
    cands.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[DupCandidate], _: Long) => sink(pairs(batch))
    }

  /** SparkSession helper for symmetry with [[EventStreams.readEvents]]:
    * a parquet-directory document stream.
    */
  def readDocs(spark: SparkSession, path: String): Dataset[DocEv] = {
    import spark.implicits._
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType))))
      .parquet(path)
      .as[DocEv]
  }
}

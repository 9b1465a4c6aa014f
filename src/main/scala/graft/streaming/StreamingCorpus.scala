package graft.streaming

import graft.Materialize.Ops

import graft.queries.DedupQueries
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Media-ingest event: an opaque container payload arriving on the
  * stream — the binary column type the batch q40 decode processes,
  * with an arrival timestamp.
  */
case class MediaEv(doc_id: Long, payload: Array[Byte],
                   ts: java.sql.Timestamp)

/** The streaming → corpus bridge: [[StreamingDedup]] candidates are
  * materialized into the lake ([[LakeSink]]'s replay-safe layout) and
  * decided with the SAME q58 policy code the batch DAG ships
  * ([[DedupQueries.decisionFromCandidates]]) — so a corpus ingested as
  * a stream and a corpus re-derived by the batch incremental-dedup
  * query produce one artifact, not two near-agreeing ones
  * (StreamingSpec pins the equality end to end).
  *
  * Scale shape: the stream carries only (doc_id, matched_doc_id,
  * band_idx, ts) candidate rows — no text, no signatures — and the
  * decision is a batch job over that bounded relation plus the (tiny)
  * incoming-id set: the 100 TB corpus side never re-enters the
  * decision, exactly q58's asymmetric-cost contract.
  */
object StreamingCorpus {

  /** Materialize the candidate stream into `path` as replay-safe
    * `batch_id=<id>` parquet partitions. Attach a checkpointLocation
    * and start at the call site.
    */
  def writeCandidates(cands: Dataset[DupCandidate],
                      path: String): DataStreamWriter[Row] =
    LakeSink.writeTo(cands.toDF(), path)

  /** The q58-policy decision over the materialized candidates: which
    * of `incomingIds` (one `doc_id` column) survive. Pairs internal to
    * the pre-existing corpus — which the band state observes while the
    * backfill streams through — are flagged (false, false) and ignored
    * by the shared policy; candidate multiplicity from k-band
    * collisions and batch replays collapses through the distinct.
    */
  def decide(s: SparkSession, candPath: String,
             incomingIds: DataFrame): DataFrame = {
    // distinct: batch q58's incoming side is unique by construction; a
    // caller passing duplicate ids must not get duplicated decisions
    val inc = incomingIds.select(col("doc_id")).distinct().materialize()
    val incA = inc.select(col("doc_id").as("doc_a"),
      lit(true).as("a_inc"))
    val incB = inc.select(col("doc_id").as("doc_b"),
      lit(true).as("b_inc"))
    val cand = s.read.parquet(candPath)
      .select(least(col("doc_id"), col("matched_doc_id")).as("doc_a"),
        greatest(col("doc_id"), col("matched_doc_id")).as("doc_b"))
      .distinct()
      .join(incA, Seq("doc_a"), "left")
      .join(incB, Seq("doc_b"), "left")
      .select(col("doc_a"), col("doc_b"),
        coalesce(col("a_inc"), lit(false)).as("a_inc"),
        coalesce(col("b_inc"), lit(false)).as("b_inc"))
    DedupQueries.decisionFromCandidates(inc, cand)
  }

  /** Live corpus-quality monitor: watermarked 10-minute-window
    * aggregates over the incoming document stream — docs, whitespace
    * and subword tokens, and mean quality per window — the streaming
    * twin of the batch q34/q51/q72 reports, for ingestion dashboards
    * and bad-batch alarms (a crawler gone wrong shows up as a quality
    * cliff in the CURRENT window, not in next night's batch sweep).
    *
    * The per-doc scoring reuses the exact [[graft.functions.TextJvm]]
    * definitions the batch scorer compiles in, so a window's mean over
    * the same rows matches the batch computation bit-for-bit
    * (StreamingSpec pins it); the windowed aggregation is Structured
    * Streaming's ordinary watermark + tumbling-window state, so late
    * documents past the watermark are dropped, not double-counted.
    * Quality is summed exactly and divided once per window — no
    * incremental mean drift.
    */
  def qualityMonitor(docs: Dataset[DocEv],
                     watermarkMinutes: Int): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .map { d =>
        val (nWs, nSub) = graft.functions.TextJvm.wsAndSubwordCounts(d.text)
        (d.ts, nWs, nSub, graft.functions.TextJvm.qualityRaw(d.text))
      }
      .toDF("ts", "n_ws", "n_subword", "q_raw")
      .withWatermark("ts", s"$watermarkMinutes minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_ws")).as("n_ws_tokens"),
        sum(col("n_subword")).as("n_subword_tokens"),
        sum(col("q_raw")).as("q_sum"))
      .select(col("window.start").as("window_start"),
        col("n_docs"), col("n_ws_tokens"), col("n_subword_tokens"),
        round(col("q_sum") / col("n_docs").cast("double"), 4).as("mean_quality"))
  }

  /** Online contamination filter: probe every incoming document's word
    * [[DedupQueries.ShingleN]]-grams against a broadcast Bloom sketch
    * of the eval blocklist (q85's sketch — build once from the bounded
    * reference set, ship KBs of bits to every executor) and emit the
    * per-document verdict as the stream flows. A stateless map, so the
    * SAME code runs over a stream or a batch frame and produces
    * identical verdicts (StreamingSpec pins the equality) — the
    * streamed ingest can drop contaminated documents online instead of
    * waiting for the nightly q50 sweep. Bloom semantics carry over:
    * zero false negatives, fp rate bounded by the build-time budget.
    */
  def blocklistMonitor(docs: Dataset[DocEv],
                       bloom: org.apache.spark.util.sketch.BloomFilter)
      : DataFrame = {
    import docs.sparkSession.implicits._
    val bc = docs.sparkSession.sparkContext.broadcast(bloom)
    docs
      .map { d =>
        val ws = d.text.split("\\s+").filter(_.nonEmpty)
        val hits = ws.iterator.sliding(DedupQueries.ShingleN)
          .withPartial(false)
          .count(g => bc.value.mightContain(g.mkString(" ")))
        (d.ts, d.doc_id, hits.toLong, hits > 0)
      }
      .toDF("ts", "doc_id", "n_bloom_hits", "flagged")
  }

  /** ONLINE classifier gate: the q96 hashing-trick linear model scored
    * over the document stream — the model is a JVM constant (weights
    * ride the closure; a trained model would broadcast its literal
    * array the same way), the scoring a stateless map, so stream and
    * batch verdicts are identical by construction (StreamingSpec pins
    * it, same contract as [[blocklistMonitor]]). This is the ingest
    * shape of a production quality gate: score-at-arrival, drop or
    * route before anything lands in the lake.
    */
  def classifierMonitor(docs: Dataset[DocEv]): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .map { d =>
        val fs = graft.queries.SearchQueries.classifierFeatSum(d.text)
        (d.ts, d.doc_id, fs, fs > 0L)
      }
      .toDF("ts", "doc_id", "feat_sum", "keep")
  }

  /** MEDIA-ingest monitor: the q40 video-metadata decode at arrival —
    * each payload is parsed with the same strict
    * [[graft.functions.AviCodec]] the batch query runs, emitting the
    * decoded metadata plus an `ok` verdict. A malformed container is
    * QUARANTINED (`ok=false`, sentinel metadata), never thrown: one
    * corrupt blob must not kill a 100 TB ingest stream, and the
    * flagged row is what routes it to a dead-letter sink. The decode
    * is a stateless map, so stream and batch metadata are identical
    * by construction on well-formed payloads (StreamingSpec pins the
    * equality against q40 itself and the quarantine verdict against a
    * truncated container).
    *
    * Scale shape: the q40 cost model streamed — payload bytes die
    * inside the micro-batch task; only the typed scalar row flows on.
    */
  def mediaMonitor(media: Dataset[MediaEv]): DataFrame = {
    import media.sparkSession.implicits._
    media
      .map { m =>
        try {
          val clip = graft.functions.AviCodec.decode(m.payload)
          (m.ts, m.doc_id, m.payload.length.toLong,
            clip.meta.width.toLong, clip.meta.height.toLong,
            clip.meta.nFrames.toLong, clip.meta.usPerFrame, true)
        } catch {
          // decode's contract is IllegalArgumentException-only for
          // malformed input; NonFatal is the defense-in-depth backstop
          // so no byte pattern can fail the micro-batch task instead
          // of landing a quarantine row
          case scala.util.control.NonFatal(_) =>
            (m.ts, m.doc_id, m.payload.length.toLong,
              -1L, -1L, -1L, -1L, false)
        }
      }
      .toDF("ts", "doc_id", "n_bytes", "width", "height", "n_frames",
        "us_per_frame", "ok")
  }

  /** AUDIO-ingest monitor: [[mediaMonitor]]'s twin for WAV payloads —
    * the q118 feature decode at arrival via the same strict
    * [[graft.functions.WavCodec]] the batch query runs (round 13's
    * lock-free replacement for the JDK audio stack). Same quarantine
    * contract: a malformed container lands an `ok=false` row with
    * sentinel features, never an exception — WavCodec guarantees the
    * single-IllegalArgumentException contract structurally, and the
    * NonFatal backstop covers defense in depth. A WELL-FORMED but
    * non-mono/non-16-bit container is quarantined too: batch q118
    * REQUIRES mono PCM16, so passing a stereo clip through with
    * interleaved-channel features would silently break the stream ≡
    * batch contract — the monitor enforces the same format gate and
    * the features come from the SAME [[graft.functions.WavCodec
    * .features]] helper q118 calls (StreamingSpec pins the equality,
    * the corrupt-container quarantine, and the stereo quarantine).
    *
    * Scale shape: identical to [[mediaMonitor]] — PCM bytes die inside
    * the micro-batch task; only the typed feature row flows on.
    */
  def audioMonitor(media: Dataset[MediaEv]): DataFrame = {
    import media.sparkSession.implicits._
    media
      .map { m =>
        try {
          val clip = graft.functions.WavCodec.decode(m.payload)
          // the q118 format gate, as a quarantine instead of a crash
          require(clip.meta.bits == 16 && clip.meta.channels == 1,
            s"non-mono/non-16-bit stream payload: ${clip.meta}")
          val (sumAbs, transitions) =
            graft.functions.WavCodec.features(clip.samples)
          (m.ts, m.doc_id, m.payload.length.toLong,
            clip.meta.nFrames.toLong, clip.meta.sampleRate.toLong,
            sumAbs, transitions, true)
        } catch {
          case scala.util.control.NonFatal(_) =>
            (m.ts, m.doc_id, m.payload.length.toLong,
              -1L, -1L, -1L, -1L, false)
        }
      }
      .toDF("ts", "doc_id", "n_bytes", "n_samples", "sample_rate",
        "sum_abs", "n_transitions", "ok")
  }
}

package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** Version stamp for all `flatMapGroupsWithState` state (VERDICT r11
  * item 5). Spark's own state-schema check catches STRUCTURAL breaks
  * (renamed/retyped fields fail a restart loudly), but a SEMANTIC
  * re-versioning — same field names and types, new meaning, e.g.
  * switching `TwapState.cents` from a raw price to a pre-scaled one —
  * sails through the schema check and silently misdecodes every
  * carried-over state row. Every state value therefore rides in a
  * [[StateVersion.VState]] envelope stamped with [[StateVersion.Current]];
  * a resumed checkpoint whose states carry a different stamp fails the
  * first read with the named [[StateVersion.MismatchException]] instead
  * of emitting wrong numbers.
  *
  * Contract: bump [[Current]] in the SAME change that alters what any
  * state field means. The stamp is global to the library (one semantic
  * epoch, not per-operator) — a bump forces fresh checkpoints for all
  * stateful streams, which is the safe default for a library shipped as
  * one artifact.
  *
  * The envelope itself was a structural break once (r12, flat state →
  * `{v, s}` struct): checkpoints from before it fail Spark's schema
  * check on restart, which is the loud failure we want.
  */
object StateVersion {

  /** The library's state-semantics epoch. History:
    *  - 1 — r12: envelope introduced; state semantics of all monitors
    *    as of round 11 (SURVEY §2.9 streaming twins).
    */
  val Current: Int = 1

  /** Test hook: lets StreamingSpec resume a checkpoint across a
    * simulated epoch bump without editing [[Current]]. Driver-side AND
    * executor-side reads agree in local mode (one JVM); production
    * never touches it.
    */
  @volatile private[graft] var overrideCurrent: Option[Int] = None

  private[streaming] def current: Int = overrideCurrent.getOrElse(Current)

  final class MismatchException(val found: Int, val expected: Int)
    extends RuntimeException(
      s"graft streaming state version mismatch: checkpointed state " +
        s"carries v$found but this build expects v$expected. The state " +
        "semantics changed between the checkpoint and this binary — " +
        "restart from a fresh checkpoint (or replay the source) instead " +
        "of resuming; resuming would misdecode every carried state row.")

  /** The encoder-visible envelope each state value rides in. */
  case class VState[S](v: Int, s: S)

  /** GroupState view that exposes the unwrapped `S` to the operator
    * while stamping writes and checking reads. All timeout/watermark
    * plumbing delegates untouched.
    */
  private final class Guarded[S](underlying: GroupState[VState[S]])
      extends GroupState[S] {
    private def unwrap(vs: VState[S]): S =
      if (vs.v == current) vs.s
      else throw new MismatchException(vs.v, current)
    override def exists: Boolean = underlying.exists
    override def get: S = unwrap(underlying.get)
    override def getOption: Option[S] = underlying.getOption.map(unwrap)
    override def update(newState: S): Unit =
      underlying.update(VState(current, newState))
    override def remove(): Unit = underlying.remove()
    override def hasTimedOut: Boolean = underlying.hasTimedOut
    override def setTimeoutDuration(durationMs: Long): Unit =
      underlying.setTimeoutDuration(durationMs)
    override def setTimeoutDuration(duration: String): Unit =
      underlying.setTimeoutDuration(duration)
    override def setTimeoutTimestamp(timestampMs: Long): Unit =
      underlying.setTimeoutTimestamp(timestampMs)
    override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit =
      underlying.setTimeoutTimestamp(timestampMs, additionalDuration)
    override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit =
      underlying.setTimeoutTimestamp(timestamp)
    override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit =
      underlying.setTimeoutTimestamp(timestamp, additionalDuration)
    override def getCurrentWatermarkMs(): Long =
      underlying.getCurrentWatermarkMs()
    override def getCurrentProcessingTimeMs(): Long =
      underlying.getCurrentProcessingTimeMs()
  }

  /** Wrap a flatMapGroupsWithState update function so its state is
    * version-enveloped: the call site keeps its plain `GroupState[S]`
    * signature and only the declared state type changes to
    * `VState[S]`. A timed-out group's final `state.get` is checked
    * too — a mismatched leftover state must not close a session with
    * misread numbers.
    */
  def guard[K, V, S, O](f: (K, Iterator[V], GroupState[S]) => Iterator[O])
      : (K, Iterator[V], GroupState[VState[S]]) => Iterator[O] =
    (k, it, gs) => f(k, it, new Guarded(gs))

  /** Call-site spelling: `flatMapGroupsWithVersionedState[S, O]` is a
    * drop-in for `flatMapGroupsWithState[S, O]` — same type arguments,
    * same argument lists — that envelopes the declared state type and
    * wraps the update function in [[guard]]. Keeping the operator's
    * code on plain `GroupState[S]` means the versioning cannot be
    * forgotten at one of the 15 sites without a grep-visible bare
    * `flatMapGroupsWithState` call (pinned by StreamingSpec).
    */
  implicit final class Ops[K, V](
      private val kv: org.apache.spark.sql.KeyValueGroupedDataset[K, V])
      extends AnyVal {
    def flatMapGroupsWithVersionedState[S, O](
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeoutConf: org.apache.spark.sql.streaming.GroupStateTimeout)(
        func: (K, Iterator[V], GroupState[S]) => Iterator[O])(
        implicit se: org.apache.spark.sql.Encoder[VState[S]],
        oe: org.apache.spark.sql.Encoder[O]): org.apache.spark.sql.Dataset[O] =
      kv.flatMapGroupsWithState[VState[S], O](outputMode, timeoutConf)(guard(func))
  }
}

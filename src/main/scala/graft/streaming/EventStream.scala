package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming over the events schema.
  *
  * The reference pipeline is pure batch (`@daily` Airflow trigger,
  * `/root/reference/dags/bank_etl_dag.py:37`), so none of this is needed
  * for parity — it exists because a 100 TB ingestion pipeline invariably
  * grows a streaming leg, and the same transforms should run in both
  * modes. Every function here takes a DataFrame that may be batch
  * (`spark.read`) or streaming (`spark.readStream`) — the plan is
  * identical; only the sink differs.
  *
  * Scale notes: the windowed agg is a streaming state store keyed by
  * (window, event_type) — bounded by the watermark horizon; the
  * sessionizer keys state by user_id with a processing-timeout eviction,
  * so state is O(active users), not O(events).
  */
object EventStream {

  /** Tumbling-window counts/sums with a watermark (late data beyond 10
    * minutes is dropped; state for closed windows is evicted). Works on
    * batch frames too (window() is the same expression). */
  def windowedCounts(events: DataFrame,
                     windowLength: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("num_events"),
        sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("num_events"), col("total_value"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(count: Long, firstTs: Long, lastTs: Long)
  final case class Session(user_id: Long, num_events: Long,
                           session_seconds: Double, closed: Boolean)

  /** Fold a batch of event times into the open session state, splitting
    * wherever consecutive times are more than `gapMs` apart — returns
    * (sessions closed by this batch, the still-open tail session).
    * Shared by both sessionizers ([[sessionize]] passes gapMs =
    * Long.MaxValue → plain merge, never splits) so the merge arithmetic
    * cannot drift between them. Gap splits INSIDE a batch matter on the
    * backfill/replay path, where one micro-batch can span hours. */
  private[streaming] def mergeAndSplit(prev: Option[SessionState], times: Seq[Long],
                                       gapMs: Long): (Seq[SessionState], SessionState) = {
    require(times.nonEmpty, "mergeAndSplit needs at least one event time")
    val sorted = times.sorted
    val init = prev match {
      case Some(p) if sorted.head - p.lastTs <= gapMs =>
        (Seq.empty[SessionState], p)
      case Some(p) =>
        (Seq(p), SessionState(0L, sorted.head, sorted.head))
      case None =>
        (Seq.empty[SessionState], SessionState(0L, sorted.head, sorted.head))
    }
    sorted.foldLeft(init) { case ((closed, open), t) =>
      if (open.count > 0 && t - open.lastTs > gapMs)
        (closed :+ open, SessionState(1L, t, t))
      else
        (closed, SessionState(open.count + 1,
          math.min(open.firstTs, t), math.max(open.lastTs, t)))
    }
  }

  /** Stateful sessionization via mapGroupsWithState: per-user running
    * session with a 30-minute inactivity timeout (processing-time).
    * The state object is tiny and explicit — the pattern for any custom
    * streaming state (fraud windows, balance accumulators).
    *
    * `timeout` admits exactly two modes. ProcessingTimeTimeout (the
    * production default) evicts a silent user's state after 30 minutes,
    * keeping state O(active users). NoTimeout disarms eviction — state
    * is O(all users ever seen) — and is only for bounded streams and
    * batch runs (where per-group state doesn't outlive the job; the
    * specs use it to avoid wall-clock waits). EventTimeTimeout is
    * rejected up front: this function never sets a timeout timestamp,
    * so it would fail at query start with an opaque planner error —
    * the event-time sessionizer is [[sessionizeOnClose]]. */
  def sessionize(events: Dataset[Event],
                 timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
                (implicit enc1: org.apache.spark.sql.Encoder[Session]): Dataset[Session] = {
    require(timeout != GroupStateTimeout.EventTimeTimeout(),
      "sessionize supports ProcessingTimeTimeout (production) or NoTimeout " +
        "(bounded/batch runs, no state eviction); for event-time session close " +
        "use sessionizeOnClose")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, Session](timeout) {
        (userId, batch, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Session(userId, s.count, (s.lastTs - s.firstTs) / 1000.0, closed = true)
          } else {
            val times = batch.map(_.ts.getTime).toSeq
            // gapMs = MaxValue: the running-state sessionizer never
            // splits; closing is the timeout's job
            val (_, next) = mergeAndSplit(state.getOption, times, Long.MaxValue)
            state.update(next)
            // duration-based timeouts are only legal for processing-time
            // (event-time requires setTimeoutTimestamp and would throw)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout())
              state.setTimeoutDuration("30 minutes")
            Session(userId, next.count, (next.lastTs - next.firstTs) / 1000.0, closed = false)
          }
      }
  }

  /** Emit-on-close sessionization via flatMapGroupsWithState with an
    * EVENT-time timeout: a user's session emits exactly one immutable
    * row when the watermark passes its last event plus the gap —
    * append-mode output, the shape a downstream fact table wants
    * ([[sessionize]] is the update-mode running-state complement).
    * Sessions also close on the DATA path: a batch whose events sit
    * more than the gap past the open state (next micro-batch or a
    * multi-hour backfill batch) splits and emits the finished sessions
    * immediately — the event-time timeout only covers keys that go
    * fully silent. Keep `gapMinutes` larger than the lateness horizon:
    * the watermark trails the newest event by `lateness`, so
    * `lastTs + gap` then always exceeds the watermark (Spark rejects
    * timeout timestamps at or below it). State is O(active users) and
    * evicts with the watermark, so a 100 TB/day stream holds state
    * only for the gap + lateness horizon. */
  def sessionizeOnClose(events: Dataset[Event],
                        gapMinutes: Int = 30,
                        lateness: String = "10 minutes")
                       (implicit enc: org.apache.spark.sql.Encoder[Session]): Dataset[Session] = {
    // fail FAST on the documented precondition instead of letting a
    // misconfigured query run for hours and then die data-dependently:
    // with gap <= lateness, a key whose newest event trails the global
    // max by more than the gap gets a timeout timestamp at or below
    // the watermark, and setTimeoutTimestamp throws mid-stream.
    // Months are bounded at 31 days — OVER-estimating the lateness
    // horizon only tightens the check, never admits a bad config.
    val latenessMicros = {
      val i = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(lateness))
      i.months * 31L * 86400000000L + i.days * 86400000000L + i.microseconds
    }
    require(gapMinutes * 60000000L > latenessMicros,
      s"gapMinutes ($gapMinutes min) must exceed the lateness horizon " +
        s"('$lateness'): the session-close timeout would otherwise land " +
        "at or below the watermark and crash the query mid-run")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, batch, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              Session(userId, s.count, (s.lastTs - s.firstTs) / 1000.0, closed = true))
          } else {
            val times = batch.map(_.ts.getTime).toSeq
            // the gap can close sessions on the DATA path too: a key
            // with data never fires its timeout in that trigger, so a
            // later-than-gap event (next micro-batch, or hours later in
            // one backfill batch) must split here, not merge — the
            // timeout only covers keys that go fully silent
            val (closedNow, open) =
              mergeAndSplit(state.getOption, times, gapMinutes * 60000L)
            state.update(open)
            state.setTimeoutTimestamp(open.lastTs + gapMinutes * 60000L)
            closedNow.iterator.map(s =>
              Session(userId, s.count, (s.lastTs - s.firstTs) / 1000.0, closed = true))
          }
      }
  }

  /** Streaming exact dedup: drop events whose dedup key was already seen
    * within the watermark horizon — the streaming leg of the dedup
    * family (state is bounded by the horizon, evicted as the watermark
    * advances). Content dedup streams use a content hash as the key.
    * On a BATCH frame the within-watermark form is unsupported (Spark
    * rejects it — there is no incremental state to bound), so the batch
    * leg falls back to the exact global dedup, which is what a bounded
    * horizon converges to when the whole input is one batch. */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
                     watermark: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keyCols)
    else
      events.dropDuplicates(keyCols)

  /** Stream-static enrichment: join the event stream onto a (batch)
    * dimension frame. No streaming state is involved, so this composes
    * with any downstream stateful operator. Works identically on a
    * batch `events` frame.
    *
    * `broadcastDim` (default true) pins the dimension-sized plan: the
    * static side ships once per executor and the stream never shuffles
    * for the join. Pass false for a dim that is NOT dimension-sized —
    * the broadcast hint is a hard commitment (build fails above
    * Spark's 8 GB broadcast limit, and driver memory bounds it well
    * before that), and without the hint the planner still broadcasts
    * statistically small static sides on its own. */
  def enrich(events: DataFrame, dim: DataFrame, key: String,
             broadcastDim: Boolean = true): DataFrame =
    events.join(if (broadcastDim) broadcast(dim) else dim, Seq(key), "left")

  /** Watermarked stream-stream inner join: events matched to a second
    * stream on a key within a bounded event-time range. Both sides carry
    * watermarks and the join condition bounds right.ts to a window
    * around left.ts — that bound is what lets the state store evict
    * buffered rows as the watermark advances (an unbounded-time
    * stream-stream join would accumulate state forever). */
  def joinWithinInterval(left: DataFrame, right: DataFrame, key: String,
                         interval: String = "15 minutes",
                         watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col(key), col("ts").as("l_ts"),
        col("event_id").as("l_event_id"), col("value").as("l_value"))
    val r = right.withWatermark("ts", watermark)
      .select(col(key).as(s"r_$key"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"), col("value").as("r_value"))
    l.join(r,
      col(key) === col(s"r_$key") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $interval"))
      .select(col(key), col("l_event_id"), col("r_event_id"),
        col("l_ts"), col("r_ts"), col("l_value"), col("r_value"))
  }

  /** Wire a streaming frame to a console/memory sink for smoke runs. */
  def startToMemory(df: DataFrame, queryName: String,
                    mode: OutputMode = OutputMode.Update()) =
    df.writeStream.format("memory").queryName(queryName).outputMode(mode).start()
}

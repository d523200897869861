package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Sessionization — gap-based event grouping per user, the standard
  * behavioral-pipeline operator. Two implementations:
  *
  *  - [[batch]]: the declarative lag/flag/cumsum formulation (one window
  *    shuffle on user_id; at 100 TB this is the partition-and-sort-once
  *    shape, and the measure sums use exact cents so results are
  *    order-free).
  *  - [[streamingSessions]]: the stateful Structured Streaming
  *    formulation via `flatMapGroupsWithState` with processing-time
  *    timeout — the custom-state API the batch analog maps onto.
  */
object Sessionize {

  val gapMicros: Long = 30L * 60 * 1000000 // 30-minute session gap

  /** (user_id, session_idx, session_start, session_end, n_events,
    * value_cents). */
  def batch(events: DataFrame): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val flagged = events
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byTime))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMicros,
          1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_session")).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("bigint")).as("value_cents"))
  }

  final case class Ev(user_id: Long, event_id: Long, ts: Long, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, cents: Long,
      idx: Long)
  final case class Session(user_id: Long, session_idx: Long,
      session_start: Long, session_end: Long, n_events: Long,
      value_cents: Long)

  /** Streaming sessionizer: emits a session when the gap passes or the
    * group times out (processing-time timeout, default = one session gap,
    * so a user's final session is flushed once no events arrive for 30
    * min of wall clock — without it, continuous streams would never emit
    * the last session per user). Events within a micro-batch are sorted
    * by (ts, event_id) — same total order as the batch window.
    *
    * `timeoutMs = None` disables the timeout (open sessions then only
    * recoverable via [[openSessions]]). Required for test drivers built
    * on `processAllAvailable`: a registered processing-time timeout makes
    * `FlatMapGroupsWithStateExec.shouldRunAnotherBatch` always true, so
    * the engine's no-data batch loop never quiesces and
    * `processAllAvailable` never returns. */
  def streamingSessions(spark: SparkSession, events: Dataset[Ev],
      timeoutMs: Option[Long] = Some(gapMicros / 1000))
      : Dataset[Session] = {
    import spark.implicits._
    val conf = if (timeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append, conf) {
        (user: Long, evs: Iterator[Ev], state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            // No events for a full timeout of wall clock: close everything.
            val open = state.getOption.getOrElse(Nil)
            state.remove()
            open.reverseIterator.map(s =>
              Session(user, s.idx, s.start, s.last, s.n, s.cents))
          } else {
            var sessions = state.getOption.getOrElse(Nil)
            val out = scala.collection.mutable.ListBuffer[Session]()
            evs.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
              val cents = math.round(e.value * 100)
              sessions match {
                case cur :: rest if e.ts - cur.last <= gapMicros =>
                  sessions = cur.copy(last = e.ts, n = cur.n + 1,
                    cents = cur.cents + cents) :: rest
                case cur :: rest =>
                  out += Session(user, cur.idx, cur.start, cur.last, cur.n,
                    cur.cents) // gap passed — close it
                  sessions = SessionState(e.ts, e.ts, 1, cents, cur.idx + 1) :: rest
                case Nil =>
                  sessions = SessionState(e.ts, e.ts, 1, cents, 1) :: Nil
              }
            }
            state.update(sessions)
            timeoutMs.foreach(state.setTimeoutDuration) // default 30 min
            out.iterator
          }
      }
  }

  /** Flush helper for tests/AvailableNow runs: sessions still open in
    * state (the stream can't know they ended). */
  def openSessions(states: Map[Long, List[SessionState]]): Seq[Session] =
    states.toSeq.flatMap { case (u, ss) =>
      ss.map(s => Session(u, s.idx, s.start, s.last, s.n, s.cents))
    }

  /** The per-user session logic as a Spark 4 [[StatefulProcessor]]
    * (the `transformWithState` API — typed named state handles on the
    * RocksDB store, the successor to flatMapGroupsWithState, which the
    * engine is sunsetting): ONE ValueState[SessionState] holds the open
    * session (the fMGWS list never exceeds one element — its tail is
    * always Nil — so the state narrows to the value it really was), and
    * the idle flush uses a REAL processing-time timer (registered per
    * input batch, previous timer deleted — the sliding-deadline
    * semantics `GroupState.setTimeoutDuration` gave). Emission order,
    * gap rule (strict `> gapMicros`), cents arithmetic, and session
    * indexing are identical to [[streamingSessions]];
    * StreamingSessionizeSpec proves batch parity on this variant. */
  private class SessionProcessor(timeoutMs: Option[Long])
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Ev, Session] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo,
      OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var open: ValueState[SessionState] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[SessionState]("open",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)
    override def handleInputRows(user: Long, evs: Iterator[Ev],
        timerValues: TimerValues): Iterator[Session] = {
      var cur: Option[SessionState] = if (open.exists()) Some(open.get()) else None
      val out = scala.collection.mutable.ListBuffer[Session]()
      evs.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
        val cents = math.round(e.value * 100)
        cur match {
          case Some(s) if e.ts - s.last <= gapMicros =>
            cur = Some(s.copy(last = e.ts, n = s.n + 1,
              cents = s.cents + cents))
          case Some(s) =>
            out += Session(user, s.idx, s.start, s.last, s.n, s.cents)
            cur = Some(SessionState(e.ts, e.ts, 1, cents, s.idx + 1))
          case None =>
            cur = Some(SessionState(e.ts, e.ts, 1, cents, 1))
        }
      }
      cur.foreach(open.update)
      timeoutMs.foreach { ms =>
        getHandle.listTimers().toSeq.foreach(t => getHandle.deleteTimer(t))
        getHandle.registerTimer(
          timerValues.getCurrentProcessingTimeInMs() + ms)
      }
      out.iterator
    }
    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] = {
      // no events for a full timeout of wall clock: close the session
      val flushed = if (open.exists()) {
        val s = open.get()
        Iterator.single(Session(user, s.idx, s.start, s.last, s.n, s.cents))
      } else Iterator.empty
      open.clear()
      flushed
    }
  }

  /** [[streamingSessions]] re-expressed on `transformWithState` — same
    * outputs, state in named typed handles on the RocksDB provider
    * (caller must set `spark.sql.streaming.stateStore.providerClass`).
    * `timeoutMs = None` runs TimeMode.None (no timers — required for
    * `processAllAvailable` test drivers, same caveat as the fMGWS
    * variant); `Some(ms)` runs processing-time timers that flush a
    * user's final session after `ms` idle wall-clock. */
  def streamingSessionsTws(spark: SparkSession, events: Dataset[Ev],
      timeoutMs: Option[Long] = Some(gapMicros / 1000))
      : Dataset[Session] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val mode = if (timeoutMs.isDefined) TimeMode.ProcessingTime()
      else TimeMode.None()
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(timeoutMs), mode,
        OutputMode.Append())
  }
}

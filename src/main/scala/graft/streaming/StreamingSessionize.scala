package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization: the ingest-time form of
  * [[graft.operators.EventAnalytics.sessionize]] — every arriving event
  * is tagged with its user's 1-based session index, incrementing when the
  * gap to the user's previous event exceeds `gapMicros`. The per-event
  * mirror of `session_window` aggregation: raw events leave the stream
  * already session-tagged for downstream joins.
  *
  * Semantics vs the batch operator: events are processed in (tsu, id)
  * order within each micro-batch, and the state carries only (last event
  * time, current session index) — under ordered replay across batches
  * (non-decreasing event time per user) the assignment is identical to
  * the batch gaps-and-islands computation, pinned by
  * StreamingSessionizeSpec on the real corpus.
  *
  * State: 2 longs per user — bounded by the user population, the
  * smallest state class here (same as the reference's per-key EWMA
  * accumulator). With `idleTimeoutMs > 0` a processing-time
  * `GroupStateTimeout` evicts users idle longer than the timeout, so
  * state is bounded by the ACTIVE user population, not the all-time one.
  * Re-admission starts a new session — exactly what the gap rule says
  * when the timeout exceeds `gapMicros` (and processing time tracks
  * event time) — but the per-user `session_idx` numbering restarts at 1
  * in the new epoch; callers needing globally-unique session identity
  * should key on (user, first event tsu of the session), not the index.
  */
object StreamingSessionize {

  final case class SEvent(user: Long, tsu: Long, id: Long)
  final case class SessState(lastTsu: Long, idx: Long)
  final case class SessionRow(user: Long, tsu: Long, id: Long, session_idx: Long)

  def update(gapMicros: Long, idleTimeoutMs: Long)(
      user: Long,
      rows: Iterator[SEvent],
      state: GroupState[SessState]): Iterator[SessionRow] = {
    if (state.hasTimedOut) {
      // idle eviction: forget the user entirely; their next event (if any)
      // starts a fresh numbering epoch at session_idx = 1
      state.remove()
      return Iterator.empty
    }
    var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L))
    val out = rows.toSeq.sortBy(r => (r.tsu, r.id)).map { r =>
      val newSession = st.idx == 0L || r.tsu - st.lastTsu > gapMicros
      st = SessState(r.tsu, if (newSession) st.idx + 1 else st.idx)
      SessionRow(user, r.tsu, r.id, st.idx)
    }
    state.update(st)
    if (idleTimeoutMs > 0L) state.setTimeoutDuration(idleTimeoutMs)
    out.iterator
  }

  /** @param idleTimeoutMs 0 disables eviction (state bounded by all-time
    *   user population); > 0 evicts users idle that long in PROCESSING
    *   time — choose a value whose event-time equivalent exceeds
    *   `gapMicros` so eviction only drops sessions the gap rule had
    *   already closed.
    */
  def assign(
      events: DataFrame, userCol: String, tsMicrosCol: String, idCol: String,
      gapMicros: Long, idleTimeoutMs: Long = 0L): Dataset[SessionRow] = {
    require(gapMicros > 0, "gapMicros must be positive")
    require(idleTimeoutMs >= 0, "idleTimeoutMs must be >= 0 (0 = no eviction)")
    implicit val evEnc = Encoders.product[SEvent]
    implicit val stEnc = Encoders.product[SessState]
    implicit val outEnc = Encoders.product[SessionRow]
    implicit val keyEnc = Encoders.scalaLong
    events
      .select(col(userCol).cast("long").as("user"),
        col(tsMicrosCol).cast("long").as("tsu"),
        col(idCol).cast("long").as("id"))
      .as[SEvent]
      .groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append(),
        if (idleTimeoutMs > 0L) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout())(
        update(gapMicros, idleTimeoutMs))
  }
}

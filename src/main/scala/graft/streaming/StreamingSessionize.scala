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
  * accumulator). A processing-time `GroupStateTimeout` larger than
  * `gapMicros` would evict idle users entirely: re-admission starts a
  * new session, exactly what the gap rule says.
  */
object StreamingSessionize {

  final case class SEvent(user: Long, tsu: Long, id: Long)
  final case class SessState(lastTsu: Long, idx: Long)
  final case class SessionRow(user: Long, tsu: Long, id: Long, session_idx: Long)

  def update(gapMicros: Long)(
      user: Long,
      rows: Iterator[SEvent],
      state: GroupState[SessState]): Iterator[SessionRow] = {
    var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L))
    val out = rows.toSeq.sortBy(r => (r.tsu, r.id)).map { r =>
      val newSession = st.idx == 0L || r.tsu - st.lastTsu > gapMicros
      st = SessState(r.tsu, if (newSession) st.idx + 1 else st.idx)
      SessionRow(user, r.tsu, r.id, st.idx)
    }
    state.update(st)
    out.iterator
  }

  def assign(
      events: DataFrame, userCol: String, tsMicrosCol: String, idCol: String,
      gapMicros: Long): Dataset[SessionRow] = {
    require(gapMicros > 0, "gapMicros must be positive")
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
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        update(gapMicros))
  }
}

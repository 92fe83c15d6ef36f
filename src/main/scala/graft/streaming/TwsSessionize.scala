package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.streaming.StreamingSessionize.{SEvent, SessState, SessionRow}

/** Streaming gap-based sessionization on the transformWithState API
  * (Spark 4's arbitrary stateful processing v2): same semantics as
  * [[StreamingSessionize]] (flatMapGroupsWithState) — TwsSessionizeSpec
  * pins row-for-row equality between the two on the real corpus — but
  * with a typed ValueState handle, the RocksDB state store, and NATIVE
  * state TTL instead of a hand-rolled timeout: `idleTimeoutMs > 0` maps
  * to `TTLConfig`, so an idle user's state expires in the store itself
  * (expired values read as absent — no timeout batch needed) and
  * re-admission starts a new session numbering epoch, the same
  * idle-eviction contract as the fmgws variant.
  *
  * State: 2 longs per user under RocksDB — bounded by the active user
  * population with TTL, all-time without; the forward path for
  * long-lived deployments (TTL, timers, schema evolution come with the
  * API).
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * ...RocksDBStateStoreProvider` (rocksdbjni ships with Spark).
  */
object TwsSessionize {

  class Processor(gapMicros: Long, idleTimeoutMs: Long)
      extends StatefulProcessor[Long, SEvent, SessionRow] {
    @transient private var state: ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl =
        if (idleTimeoutMs > 0L) TTLConfig(Duration.ofMillis(idleTimeoutMs))
        else TTLConfig.NONE
      state = getHandle.getValueState[SessState](
        "sess", Encoders.product[SessState], ttl)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[SEvent],
        timerValues: TimerValues): Iterator[SessionRow] = {
      // an expired (TTL'd) value reads as absent: the fresh-user zero state
      var st = if (state.exists()) state.get() else SessState(Long.MinValue, 0L)
      val out = rows.toSeq.sortBy(r => (r.tsu, r.id)).map { r =>
        val newSession = st.idx == 0L || r.tsu - st.lastTsu > gapMicros
        st = SessState(r.tsu, if (newSession) st.idx + 1 else st.idx)
        SessionRow(key, r.tsu, r.id, st.idx)
      }
      state.update(st)
      out.iterator
    }
  }

  /** Same surface as [[StreamingSessionize.assign]]; `idleTimeoutMs` maps
    * to native state TTL (processing time) instead of a GroupStateTimeout.
    */
  def assign(
      events: DataFrame, userCol: String, tsMicrosCol: String, idCol: String,
      gapMicros: Long, idleTimeoutMs: Long = 0L): Dataset[SessionRow] = {
    require(gapMicros > 0, "gapMicros must be positive")
    require(idleTimeoutMs >= 0, "idleTimeoutMs must be >= 0 (0 = no TTL)")
    implicit val evEnc = Encoders.product[SEvent]
    implicit val outEnc = Encoders.product[SessionRow]
    events
      .select(col(userCol).cast("long").as("user"),
        col(tsMicrosCol).cast("long").as("tsu"),
        col(idCol).cast("long").as("id"))
      .as[SEvent]
      .groupByKey(_.user)(Encoders.scalaLong)
      .transformWithState(new Processor(gapMicros, idleTimeoutMs),
        if (idleTimeoutMs > 0L) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}

package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.streaming.StreamingVelocity.{VelocityRow, VelState, VEvent}

/** Streaming velocity features on the transformWithState API: same
  * semantics as [[StreamingVelocity]] (flatMapGroupsWithState) — the
  * merge/sweep/prune core is the same shared function
  * ([[StreamingVelocity.sweep]]), so the two forms cannot drift; and
  * TwsVelocitySpec pins row-for-row equality on the real corpus — but
  * with a typed ValueState handle, the RocksDB state store, and NATIVE
  * state TTL: `idleTimeoutMs > 0` maps to `TTLConfig`, so an idle user's
  * retained points expire in the store itself. When the TTL's event-time
  * equivalent is >= the lookback, expiry is semantically invisible
  * (every dropped point was already outside any future trailing window),
  * the same contract as the fmgws variant's GroupStateTimeout.
  *
  * State: per user, only the points inside the latest event's lookback —
  * bounded by event rate x lookback, and by the ACTIVE population with
  * TTL.
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * ...RocksDBStateStoreProvider` (rocksdbjni ships with Spark).
  */
object TwsVelocity {

  class Processor(lookbackMicros: Long, idleTimeoutMs: Long)
      extends StatefulProcessor[Long, VEvent, VelocityRow] {
    @transient private var state: ValueState[VelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl =
        if (idleTimeoutMs > 0L) TTLConfig(Duration.ofMillis(idleTimeoutMs))
        else TTLConfig.NONE
      state = getHandle.getValueState[VelState](
        "points", Encoders.product[VelState], ttl)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[VEvent],
        timerValues: TimerValues): Iterator[VelocityRow] = {
      // an expired (TTL'd) value reads as absent: the fresh-user state
      val (histT, histV) =
        if (state.exists()) { val s = state.get(); (s.times, s.vms) }
        else (Array.empty[Long], Array.empty[Long])
      val (out, next) =
        StreamingVelocity.sweep(lookbackMicros, key, histT, histV, rows.toArray)
      next.foreach(state.update)
      out.iterator
    }
  }

  /** Same surface as [[StreamingVelocity.features]]; `idleTimeoutMs` maps
    * to native state TTL (processing time) instead of a GroupStateTimeout.
    */
  def features(
      events: DataFrame, userCol: String, tsMicrosCol: String, valueCol: String,
      idCol: String, lookbackMicros: Long, idleTimeoutMs: Long = 0L): Dataset[VelocityRow] = {
    require(lookbackMicros > 0, "lookbackMicros must be positive")
    require(idleTimeoutMs >= 0, "idleTimeoutMs must be >= 0 (0 = no TTL)")
    implicit val evEnc = Encoders.product[VEvent]
    implicit val outEnc = Encoders.product[VelocityRow]
    events
      .select(col(userCol).cast("long").as("user"),
        col(tsMicrosCol).cast("long").as("tsu"),
        col(idCol).cast("long").as("id"),
        round(col(valueCol) * lit(1e6)).cast("bigint").as("vm"))
      .as[VEvent]
      .groupByKey(_.user)(Encoders.scalaLong)
      .transformWithState(new Processor(lookbackMicros, idleTimeoutMs),
        if (idleTimeoutMs > 0L) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}

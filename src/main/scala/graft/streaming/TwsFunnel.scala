package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.streaming.StreamingFunnel.{FunnelProgress, FunnelState, StepEvent}

/** Streaming ordered-funnel tracking on the transformWithState API: same
  * semantics as [[StreamingFunnel]] (flatMapGroupsWithState) — the chain
  * fill is literally the same shared function
  * ([[StreamingFunnel.fillChain]]), so the two forms cannot drift; and
  * TwsFunnelSpec pins row-for-row equality on the real corpus anyway —
  * but with a typed ValueState handle, the RocksDB state store, and
  * NATIVE state TTL instead of a hand-rolled GroupStateTimeout:
  * `idleTimeoutMs > 0` maps to `TTLConfig`, so an idle user's partial
  * chain expires in the store itself (expired values read as absent — no
  * timeout batch needed) and a later event starts a fresh funnel
  * attempt, the same idle-user-reset contract as the fmgws variant.
  *
  * State: k+1 longs per user under RocksDB — bounded by the active user
  * population with TTL; the forward path for long-lived deployments.
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * ...RocksDBStateStoreProvider` (rocksdbjni ships with Spark).
  */
object TwsFunnel {

  class Processor(nStepsTotal: Int, windowMicros: Long, idleTimeoutMs: Long)
      extends StatefulProcessor[Long, StepEvent, FunnelProgress] {
    @transient private var state: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl =
        if (idleTimeoutMs > 0L) TTLConfig(Duration.ofMillis(idleTimeoutMs))
        else TTLConfig.NONE
      state = getHandle.getValueState[FunnelState](
        "chain", Encoders.product[FunnelState], ttl)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[StepEvent],
        timerValues: TimerValues): Iterator[FunnelProgress] = {
      // an expired (TTL'd) value reads as absent: the fresh-chain state
      val t =
        if (state.exists()) state.get().times.clone()
        else Array.fill(nStepsTotal)(-1L)
      StreamingFunnel.fillChain(nStepsTotal, windowMicros, t, rows.toSeq)
      state.update(FunnelState(t))
      StreamingFunnel.progressOf(key, t, nStepsTotal)
    }
  }

  /** Same surface as [[StreamingFunnel.progress]]; `idleTimeoutMs` maps
    * to native state TTL (processing time) instead of a GroupStateTimeout.
    */
  def progress(
      events: DataFrame, userCol: String, typeCol: String, tsMicrosCol: String,
      idCol: String, steps: Seq[String], windowMicros: Long,
      idleTimeoutMs: Long = 0L): Dataset[FunnelProgress] = {
    require(steps.size >= 2 && steps.distinct.size == steps.size,
      "need >= 2 distinct steps")
    require(windowMicros > 0, "windowMicros must be positive")
    require(idleTimeoutMs >= 0, "idleTimeoutMs must be >= 0 (0 = no TTL)")
    implicit val evEnc = Encoders.product[StepEvent]
    implicit val outEnc = Encoders.product[FunnelProgress]
    val stepOf = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col("et") === s, lit(i)).otherwise(acc)
      }
    events
      .select(col(userCol).cast("long").as("user"), col(typeCol).as("et"),
        col(tsMicrosCol).cast("long").as("tsu"), col(idCol).cast("long").as("id"))
      .withColumn("step", stepOf)
      .filter(col("step") >= 0)
      .select(col("user"), col("step"), col("tsu"), col("id"))
      .as[StepEvent]
      .groupByKey(_.user)(Encoders.scalaLong)
      .transformWithState(new Processor(steps.size, windowMicros, idleTimeoutMs),
        if (idleTimeoutMs > 0L) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}

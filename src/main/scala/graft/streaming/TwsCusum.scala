package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

import graft.streaming.ContinuousCusum.{Sample, St, Update}

/** Continuous online CUSUM on the transformWithState API (Spark 4's
  * arbitrary stateful processing v2): IDENTICAL semantics to
  * [[ContinuousCusum]] (flatMapGroupsWithState) — the processor
  * delegates to the SAME `foldBatch`, which steps with the literal
  * [[graft.functions.CusumFunctions.step]] the batch UDAF uses, so all
  * three forms are one fold (the TwsLshDedup shared-fold rule) — but
  * with a typed ValueState handle and the RocksDB state store, the
  * forward path for long-lived monitor state (one small row per
  * monitored key, alive for the deployment's lifetime).
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * ...RocksDBStateStoreProvider` (rocksdbjni ships with Spark).
  */
object TwsCusum {

  class Processor(slackMicro: Long, hMicro: Long)
      extends StatefulProcessor[String, Sample, Update] {
    @transient private var state: ValueState[St] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[St](
        "cusum", Encoders.product[St],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String, rows: Iterator[Sample],
        timerValues: TimerValues): Iterator[Update] = {
      val prev = if (state.exists()) state.get() else ContinuousCusum.zeroState
      ContinuousCusum.foldBatch(prev, rows, slackMicro, hMicro) match {
        case Some(next) =>
          state.update(next)
          Iterator.single(Update(key, next.s_hi_micro, next.s_lo_micro,
            next.alarms_hi, next.alarms_lo, next.first_alarm, next.n))
        case None => Iterator.empty
      }
    }
  }

  def run(
      samples: Dataset[Sample], slackMicro: Long, hMicro: Long): Dataset[Update] = {
    implicit val outEnc = Encoders.product[Update]
    samples
      .groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new Processor(slackMicro, hMicro),
        TimeMode.None(), OutputMode.Append())
  }
}

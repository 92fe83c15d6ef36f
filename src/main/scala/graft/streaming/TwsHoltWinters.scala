package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

import graft.streaming.ContinuousHolt.Sample
import graft.streaming.ContinuousHoltWinters.{HwState, HwUpdate}

/** Continuous Holt-Winters on the transformWithState API (Spark 4's
  * arbitrary stateful processing v2): IDENTICAL semantics to
  * [[ContinuousHoltWinters]] (flatMapGroupsWithState) — the processor
  * delegates to the SAME `foldBatch`, which steps with the same
  * [[graft.functions.HoltFunctions.wintersStep]] the batch aggregator
  * uses, so all three forms are one fold (the TwsLshDedup shared-fold
  * rule) — but with a typed ValueState handle and the RocksDB state
  * store, the forward path for long-lived keyed state.
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * ...RocksDBStateStoreProvider` (rocksdbjni ships with Spark).
  */
object TwsHoltWinters {

  class Processor(alphaPpm: Long, betaPpm: Long, gammaPpm: Long, period: Int)
      extends StatefulProcessor[String, Sample, HwUpdate] {
    @transient private var state: ValueState[HwState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[HwState](
        "hw", Encoders.product[HwState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String, rows: Iterator[Sample],
        timerValues: TimerValues): Iterator[HwUpdate] = {
      val prev =
        if (state.exists()) state.get()
        else ContinuousHoltWinters.zeroState(period)
      ContinuousHoltWinters.foldBatch(prev, rows, alphaPpm, betaPpm,
        gammaPpm) match {
        case Some(next) =>
          state.update(next)
          val sNext = next.ring((next.t % period).toInt)
          Iterator.single(HwUpdate(key, next.l, next.b, sNext,
            next.l + next.b + sNext, next.t, next.lastTs))
        case None => Iterator.empty
      }
    }
  }

  def run(
      samples: Dataset[Sample], alphaPpm: Long, betaPpm: Long,
      gammaPpm: Long, period: Int): Dataset[HwUpdate] = {
    require(period >= 1 && period <= 366, "period in [1, 366]")
    implicit val outEnc = Encoders.product[HwUpdate]
    samples
      .groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new Processor(alphaPpm, betaPpm, gammaPpm, period),
        TimeMode.None(), OutputMode.Append())
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

import graft.streaming.ContinuousEwma.{EwmaState, EwmaUpdate, Sample}

/** Continuous EWMA on the transformWithState API (Spark 4's arbitrary
  * stateful processing v2): same semantics as
  * [[ContinuousEwma]] (flatMapGroupsWithState), but with typed ValueState
  * handles and the RocksDB state store — the forward path for long-lived
  * keyed state (state TTL, timers, schema evolution come with the API).
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * ...RocksDBStateStoreProvider` (rocksdbjni ships with Spark).
  */
object TwsEwma {

  class Processor(alpha: Double) extends StatefulProcessor[String, Sample, EwmaUpdate] {
    @transient private var state: ValueState[EwmaState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[EwmaState](
        "ewma", Encoders.product[EwmaState], org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String, rows: Iterator[Sample],
        timerValues: TimerValues): Iterator[EwmaUpdate] = {
      val prev = if (state.exists()) state.get() else ContinuousEwma.zeroState
      ContinuousEwma.foldBatch(prev, rows, alpha) match {
        case Some(next) =>
          state.update(next)
          Iterator.single(EwmaUpdate(key, next.current, next.n, next.lastTs))
        case None => Iterator.empty
      }
    }
  }

  def run(samples: Dataset[Sample], alpha: Double): Dataset[EwmaUpdate] = {
    implicit val outEnc = Encoders.product[EwmaUpdate]
    samples
      .groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new Processor(alpha), TimeMode.None(), OutputMode.Append())
  }
}

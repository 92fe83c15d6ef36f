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
      val prev = if (state.exists()) state.get()
        else EwmaState(0.0, Long.MinValue, Long.MinValue, 0L)
      val sorted = rows.toArray.sortBy(s => (s.ts, s.seq))
      var cur = prev.current
      var n = prev.n
      var lastTs = prev.lastTs
      var lastSeq = prev.lastSeq
      sorted.foreach { s =>
        if (s.ts > lastTs || (s.ts == lastTs && s.seq > lastSeq)) {
          cur = alpha * s.price + (1.0 - alpha) * cur
          n += 1
          lastTs = s.ts
          lastSeq = s.seq
        }
      }
      if (sorted.nonEmpty) {
        state.update(EwmaState(cur, lastTs, lastSeq, n))
        Iterator.single(EwmaUpdate(key, cur, n, lastTs))
      } else Iterator.empty
    }
  }

  def run(samples: Dataset[Sample], alpha: Double): Dataset[EwmaUpdate] = {
    implicit val outEnc = Encoders.product[EwmaUpdate]
    samples
      .groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new Processor(alpha), TimeMode.None(), OutputMode.Append())
  }
}

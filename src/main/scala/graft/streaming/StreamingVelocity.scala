package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming velocity features: the ingest-time form of
  * [[graft.operators.EventAnalytics.rollingCounts]] — for every arriving
  * event, the count and micro-sum of the SAME user's events in the
  * trailing `lookbackMicros` window (exclusive of the event itself). The
  * live form of a fraud/abuse velocity check ("how many times did this
  * user act in the last hour, as of this event").
  *
  * Semantics vs the batch operator: per micro-batch, a user's events are
  * processed in (tsu, id) order and the state's retained events are all
  * >= every prior event's time under ordered replay, so each event's
  * trailing window is computed over exactly the events the batch RANGE
  * frame sees — stream == batch whenever each user's events arrive in
  * non-decreasing event-time order across batches with equal-timestamp
  * events co-batched ([[StreamingFunnel]]'s contract; the spec pins
  * equality on the real corpus split across batches). Same-instant peers
  * exclude each other, matching the batch frame's `tsu - 1` upper bound.
  *
  * State: per user, only the events still inside the lookback window of
  * the LATEST seen event (older ones can never enter a future trailing
  * window under ordered arrival and are pruned every batch) — bounded by
  * the user's event rate x lookback, not by stream length. A
  * production deployment adds a processing-time `GroupStateTimeout` to
  * drop users idle longer than the lookback entirely.
  */
object StreamingVelocity {

  final case class VEvent(user: Long, tsu: Long, id: Long, vm: Long)
  final case class VelState(times: Array[Long], vms: Array[Long])
  final case class VelocityRow(
      user: Long, tsu: Long, id: Long, value_micro: Long,
      prev_n: Long, prev_sum_micro: Long)

  def update(lookbackMicros: Long)(
      user: Long,
      rows: Iterator[VEvent],
      state: GroupState[VelState]): Iterator[VelocityRow] = {
    var times = state.getOption.map(_.times).getOrElse(Array.empty[Long])
    var vms = state.getOption.map(_.vms).getOrElse(Array.empty[Long])
    val out = rows.toSeq.sortBy(r => (r.tsu, r.id)).map { r =>
      // trailing window [tsu - lookback, tsu - 1] over retained history
      var n = 0L
      var s = 0L
      var i = 0
      while (i < times.length) {
        if (times(i) >= r.tsu - lookbackMicros && times(i) <= r.tsu - 1) {
          n += 1; s += vms(i)
        }
        i += 1
      }
      times = times :+ r.tsu
      vms = vms :+ r.vm
      VelocityRow(user, r.tsu, r.id, r.vm, n, s)
    }
    // prune: anything older than the latest event's lookback can never be
    // seen again under ordered arrival
    if (times.nonEmpty) {
      val cut = times.max - lookbackMicros
      val keep = times.indices.filter(i => times(i) >= cut)
      state.update(VelState(keep.map(times).toArray, keep.map(vms).toArray))
    }
    out.iterator
  }

  def features(
      events: DataFrame, userCol: String, tsMicrosCol: String, valueCol: String,
      idCol: String, lookbackMicros: Long): Dataset[VelocityRow] = {
    require(lookbackMicros > 0, "lookbackMicros must be positive")
    implicit val evEnc = Encoders.product[VEvent]
    implicit val stEnc = Encoders.product[VelState]
    implicit val outEnc = Encoders.product[VelocityRow]
    implicit val keyEnc = Encoders.scalaLong
    events
      .select(col(userCol).cast("long").as("user"),
        col(tsMicrosCol).cast("long").as("tsu"),
        col(idCol).cast("long").as("id"),
        round(col(valueCol) * lit(1e6)).cast("bigint").as("vm"))
      .as[VEvent]
      .groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        update(lookbackMicros))
  }
}

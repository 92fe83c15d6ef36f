package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming multi-touch attribution: the ingest-time form of
  * [[graft.operators.EventAnalytics.attributeConversions]] — each arriving
  * conversion immediately emits its credit rows (one per touch inside the
  * lookback window, or one `direct` row when there is none) under all
  * three models at once: first-touch, last-touch, and remainder-exact
  * linear. Aggregating the emitted rows by channel reproduces the batch
  * operator's per-channel sums row-for-row (the spec pins this on the
  * real corpus split across micro-batches).
  *
  * Semantics: a conversion at time tc credits touches with
  * ttsu ∈ [tc − windowMicros, tc]. Within a batch, ALL batch touches are
  * merged into the retained history BEFORE conversions are scored, so a
  * same-timestamp touch credits its conversion regardless of id order —
  * exactly the batch join's time-only predicate. Stream ≡ batch under
  * [[StreamingFunnel]]'s ordered-replay contract (per-user non-decreasing
  * event time across batches, equal-timestamp events co-batched).
  *
  * State: per user, only the touches within `windowMicros` of the user's
  * LATEST seen event — older touches can never credit a future
  * conversion under ordered arrival and are pruned every batch — so
  * state is bounded by touch rate × window, never by stream length.
  * `idleTimeoutMs > 0` adds the standard processing-time eviction
  * ([[StreamingVelocity]]'s contract): a dropped idle user simply has no
  * attributable touches left, which matches the window semantics
  * whenever the timeout's event-time equivalent is ≥ the window.
  *
  * Per-conversion work is O(touches credited) after the O(m) merge — the
  * output's own size, so a hot user costs one busy task, never a
  * super-linear scan ([[StreamingSkewSpec]]'s bound).
  */
object StreamingAttribution {

  final case class AEvent(
      user: Long, tsu: Long, id: Long, conv: Boolean, channel: String, vm: Long)
  final case class TouchState(
      times: Array[Long], ids: Array[Long], chans: Array[String])
  /** One credit row per (conversion, touch); `tid == -1` marks the
    * synthetic `direct` touch of a touchless conversion. `pos_c` is the
    * U-shaped 40/20/40 model (the batch operator's conventions: 50/50 at
    * two touches, remainders to the earliest eligible touch).
    */
  final case class CreditRow(
      user: Long, cid: Long, ctsu: Long, channel: String, tid: Long,
      first_c: Long, last_c: Long, linear_c: Long, pos_c: Long)

  def update(windowMicros: Long, idleTimeoutMs: Long)(
      user: Long,
      rows: Iterator[AEvent],
      state: GroupState[TouchState]): Iterator[CreditRow] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val hist = state.getOption.getOrElse(
      TouchState(Array.empty, Array.empty, Array.empty))
    val evs = rows.toArray.sortBy(e => (e.tsu, e.id))
    val newTouches = evs.filter(!_.conv)
    // merged (tsu, id)-ordered touch list: retained history precedes the
    // batch under ordered replay; merge keeps correctness either way
    val m = hist.times.length + newTouches.length
    val t = new Array[Long](m)
    val ids = new Array[Long](m)
    val ch = new Array[String](m)
    var i = 0
    var j = 0
    while (i + j < m) {
      val takeHist = j >= newTouches.length ||
        (i < hist.times.length &&
          (hist.times(i) < newTouches(j).tsu ||
            (hist.times(i) == newTouches(j).tsu && hist.ids(i) <= newTouches(j).id)))
      if (takeHist) {
        t(i + j) = hist.times(i); ids(i + j) = hist.ids(i); ch(i + j) = hist.chans(i)
        i += 1
      } else {
        t(i + j) = newTouches(j).tsu; ids(i + j) = newTouches(j).id
        ch(i + j) = newTouches(j).channel
        j += 1
      }
    }
    // conversions arrive (tsu, id)-sorted, so both window bounds are
    // non-decreasing: two monotone pointers across all conversions
    var lo = 0
    var hi = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[CreditRow]
    evs.foreach { e =>
      if (e.conv) {
        while (hi < m && t(hi) <= e.tsu) hi += 1
        while (lo < m && t(lo) < e.tsu - windowMicros) lo += 1
        val n = (hi - lo).toLong
        if (n == 0) {
          out += CreditRow(user, e.id, e.tsu, "direct", -1L, e.vm, e.vm, e.vm, e.vm)
        } else {
          val per = e.vm / n // vm >= 0 by contract: floor == trunc
          val rem = e.vm % n
          val endShare = e.vm * 4000L / 10000L
          val midTotal = e.vm - 2L * endShare
          var k = lo
          while (k < hi) {
            val pos =
              if (n == 1) e.vm
              else if (n == 2) e.vm / 2 + (if (k == lo) e.vm % 2 else 0L)
              else if (k == lo || k == hi - 1) endShare
              else midTotal / (n - 2) + (if (k == lo + 1) midTotal % (n - 2) else 0L)
            out += CreditRow(user, e.id, e.tsu, ch(k), ids(k),
              if (k == lo) e.vm else 0L,
              if (k == hi - 1) e.vm else 0L,
              per + (if (k == lo) rem else 0L),
              pos)
            k += 1
          }
        }
      }
    }
    // prune: touches outside the latest event's window can never credit a
    // future conversion under ordered arrival
    if (evs.nonEmpty || m > 0) {
      val latest = if (evs.nonEmpty) evs.last.tsu
        else t(m - 1)
      val cut = latest - windowMicros
      var k = 0
      while (k < m && t(k) < cut) k += 1
      state.update(TouchState(t.slice(k, m), ids.slice(k, m), ch.slice(k, m)))
      if (idleTimeoutMs > 0L) state.setTimeoutDuration(idleTimeoutMs)
    }
    out.iterator
  }

  /** Wire the credit stream over a streaming event frame. Events whose
    * type is neither a touch nor the conversion are dropped in the
    * stateless pre-projection; only windowed touches live in state.
    *
    * @param idleTimeoutMs 0 disables eviction; > 0 evicts users idle that
    *   long in PROCESSING time — choose a value whose event-time
    *   equivalent is >= `windowMicros` so eviction cannot drop a touch a
    *   future conversion could still credit.
    */
  def credits(
      events: DataFrame, userCol: String, typeCol: String, tsMicrosCol: String,
      idCol: String, valueCol: String, touchTypes: Seq[String], convType: String,
      windowMicros: Long, idleTimeoutMs: Long = 0L): Dataset[CreditRow] = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convType), "convType cannot also be a touch type")
    require(windowMicros > 0, "windowMicros must be positive")
    require(idleTimeoutMs >= 0, "idleTimeoutMs must be >= 0 (0 = no eviction)")
    implicit val evEnc = Encoders.product[AEvent]
    implicit val stEnc = Encoders.product[TouchState]
    implicit val outEnc = Encoders.product[CreditRow]
    implicit val keyEnc = Encoders.scalaLong
    events
      .filter(col(typeCol).isin((touchTypes :+ convType): _*))
      .select(col(userCol).cast("long").as("user"),
        col(tsMicrosCol).cast("long").as("tsu"),
        col(idCol).cast("long").as("id"),
        (col(typeCol) === convType).as("conv"),
        col(typeCol).as("channel"),
        round(col(valueCol) * lit(1e6)).cast("bigint").as("vm"))
      .as[AEvent]
      .groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append(),
        if (idleTimeoutMs > 0L) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout())(
        update(windowMicros, idleTimeoutMs))
  }
}

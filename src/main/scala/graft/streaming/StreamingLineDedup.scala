package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming LINE-LEVEL exact dedup: the ingest-time form of
  * [[graft.operators.Curation.dedupLines]]. Every arriving document's
  * lines are checked against all previously-seen line content ACROSS
  * micro-batches; a >= minLen line keeps only at its first-arrived
  * occurrence, shorter structural lines always keep. Emits per-line
  * decisions (doc, idx, line, keep) — document reassembly is a cheap
  * downstream batch concern (group by doc, sort by idx), mirroring how
  * [[StreamingLshDedup]] leaves exact verification downstream.
  *
  * Semantics vs the batch operator: batch picks the GLOBAL minimum
  * (doc, idx) occurrence; the stream picks the FIRST-ARRIVED (ties
  * within one micro-batch broken by (doc, idx), so a batch containing
  * several copies decides exactly like the batch operator). When
  * documents arrive in ascending doc order the two are identical
  * (StreamingCurationSpec pins this, with the duplicate pair split
  * across micro-batches). Redelivered documents are absorbed
  * idempotently: their lines' first-seen key is their own, so every
  * re-emitted decision is identical.
  *
  * State: one row per DISTINCT eligible line — key is the line's md5
  * (16-byte identity, so state row width is bounded regardless of line
  * length), value the first (doc, idx) packed into one long. Unbounded
  * in distinct-line count, like any exact streaming dedup; a production
  * deployment bounds it with a `GroupStateTimeout` eviction (hook is in
  * place — pass a timeout and expired lines simply re-admit their next
  * occurrence, degrading gracefully toward windowed dedup).
  */
object StreamingLineDedup {

  final case class LineHit(doc: Long, idx: Int, line: String, h: String)
  final case class FirstSeen(key: Long)
  final case class LineDecision(doc: Long, idx: Int, line: String, keep: Boolean)

  private def packed(doc: Long, idx: Int): Long = doc * (1L << 31) + idx

  /** Per-line-content update: first occurrence (by arrival, then
    * (doc, idx) within the batch) keeps; everything else drops.
    */
  def update(
      key: String,
      rows: Iterator[LineHit],
      state: GroupState[FirstSeen]): Iterator[LineDecision] = {
    val sorted = rows.toSeq.sortBy(r => (r.doc, r.idx))
    val prior = state.getOption.map(_.key)
    var first = prior
    val out = sorted.map { r =>
      val k = packed(r.doc, r.idx)
      first match {
        case None =>
          first = Some(k)
          LineDecision(r.doc, r.idx, r.line, keep = true)
        case Some(f) =>
          LineDecision(r.doc, r.idx, r.line, keep = f == k)
      }
    }
    if (first != prior) state.update(FirstSeen(first.get))
    out.iterator
  }

  /** Wire the decision stream over a streaming (id, text) frame. Lines
    * shorter than `minLen` bypass state entirely (a stateless union
    * branch), so structural separators never grow the store.
    */
  def decisions(
      docs: DataFrame, textCol: String, idCol: String,
      minLen: Int = 20): Dataset[LineDecision] = {
    implicit val hitEnc = Encoders.product[LineHit]
    implicit val stateEnc = Encoders.product[FirstSeen]
    implicit val outEnc = Encoders.product[LineDecision]
    implicit val keyEnc = Encoders.STRING
    val lines = docs.select(col(idCol).cast("long").as("doc"),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("idx", "line")))
    val eligible = lines.filter(length(col("line")) >= minLen)
      .select(col("doc"), col("idx"), col("line"), md5(col("line")).as("h"))
      .as[LineHit]
    val short = lines.filter(length(col("line")) < minLen)
      .select(col("doc"), col("idx"), col("line"), lit(true).as("keep"))
      .as[LineDecision]
    eligible
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
      .union(short)
  }
}

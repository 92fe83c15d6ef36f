package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{TextFunctions => T}

/** Streaming MinHash-LSH near-dup CANDIDATE detection: flags incoming
  * documents that collide with ANY previously-seen document — across
  * micro-batches — in at least one LSH band. The streaming analog of
  * [[graft.operators.Dedup.minhashLshCandidates]], for deduplicating a
  * crawl/ingest stream against everything already accepted.
  *
  * Architecture mirrors the batch path: signatures and band keys come
  * from the same codegen expressions (so batch and stream agree on what
  * collides), candidate generation is per-bucket state, and exact
  * verification stays a downstream batch concern (candidates are cheap
  * to verify against a corpus store; an in-stream exact verify would
  * require keeping every shingle set in state).
  *
  * Scale design:
  *  - state is keyed by (band, bucket), value = the doc ids seen in that
  *    bucket — the stream-side inverted index. Per-key state is bounded
  *    by `maxBucket` (newest ids win): the streaming analog of the batch
  *    path's df cap, bounding both state size and the per-arrival O(f)
  *    pair fan-out in a hot bucket.
  *  - emission is incremental: a new doc pairs only against its bucket's
  *    existing ids, never all history; re-sent ids (at-least-once
  *    upstream) are absorbed idempotently.
  *  - the same pair may surface from several bands (exactly like the
  *    batch pre-distinct candidates); downstream dedup/verify collapses
  *    them.
  */
object StreamingLshDedup {

  final case class BandHit(doc: Long, band: Int, bkey: Long)
  final case class BucketState(ids: Seq[Long])
  final case class CandidatePair(id_a: Long, id_b: Long)

  /** Per-bucket update: pair each first-seen doc against the bucket's
    * members (and earlier first-seens of this batch, id-sorted for
    * determinism), then append to state, keeping the newest `maxBucket`.
    */
  def update(maxBucket: Int)(
      key: (Int, Long),
      rows: Iterator[BandHit],
      state: GroupState[BucketState]): Iterator[CandidatePair] = {
    val seen = state.getOption.map(_.ids).getOrElse(Seq.empty)
    val seenSet = seen.toSet
    val fresh = rows.map(_.doc).toSeq.distinct.sorted.filterNot(seenSet)
    val out = Seq.newBuilder[CandidatePair]
    var acc = seen
    fresh.foreach { n =>
      acc.foreach { s =>
        out += (if (s < n) CandidatePair(s, n) else CandidatePair(n, s))
      }
      acc = acc :+ n
    }
    if (fresh.nonEmpty) state.update(BucketState(acc.takeRight(maxBucket)))
    out.result().iterator
  }

  /** Wire the stateful candidate stream over a streaming (id, text) frame.
    * Emits (id_a, id_b) with id_a < id_b, possibly repeated across bands.
    */
  def candidates(
      docs: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 5, bands: Int = 16, rowsPerBand: Int = 4,
      maxBucket: Int = 1000): Dataset[CandidatePair] = {
    require(maxBucket >= 1, "maxBucket must be >= 1")
    implicit val hitEnc = Encoders.product[BandHit]
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val outEnc = Encoders.product[CandidatePair]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    val banded = docs
      .withColumn("__tok", T.hashAll(T.tokens(col(textCol))))
      .withColumn("__sh", array_distinct(
        org.apache.spark.sql.graftvec.TextExprs.shingleHashCol(col("__tok"), shingleK)))
      .withColumn("__sig", T.minhashSignatureFromHashes(col("__sh"), bands * rowsPerBand))
      .select(col(idCol).cast("long").as("doc"),
        posexplode(T.lshBandKeys(col("__sig"), bands, rowsPerBand)).as(Seq("band", "bkey")))
      .as[BandHit]
    banded
      .groupByKey(h => (h.band, h.bkey))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        update(maxBucket))
  }
}

package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, TimerValues, ValueState}

import graft.streaming.StreamingLshDedup.{BandHit, BucketState, CandidatePair}

/** Streaming MinHash-LSH candidate detection on the transformWithState
  * API (Spark 4's arbitrary stateful processing v2): same semantics as
  * [[StreamingLshDedup.candidates]] — TwsLshDedupSpec pins identical
  * candidate multisets between the two on the real corpus — but with a
  * typed ValueState handle, the RocksDB state store, and NATIVE state
  * TTL: `bucketTtlMs > 0` expires cold buckets in the store itself, the
  * retention policy a long-lived crawl dedup actually wants (a bucket
  * untouched for a quarter stops paying for its ids; a re-arrival simply
  * re-seeds it — candidate RECALL against evicted history is traded for
  * bounded total state, and the maxBucket cap still bounds per-bucket
  * size and pair fan-out regardless).
  *
  * The per-bucket arithmetic is the LITERAL
  * [[StreamingLshDedup.fold]] — one shared function, two state APIs, so
  * the forms cannot drift (the TwsSessionize/TwsFunnel/TwsVelocity
  * pattern applied to the dedup store).
  */
object TwsLshDedup {

  class Processor(maxBucket: Int, bucketTtlMs: Long)
      extends StatefulProcessor[(Int, Long), BandHit, CandidatePair] {
    @transient private var state: ValueState[BucketState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl =
        if (bucketTtlMs > 0L) TTLConfig(Duration.ofMillis(bucketTtlMs))
        else TTLConfig.NONE
      state = getHandle.getValueState[BucketState](
        "bucket", Encoders.product[BucketState], ttl)
    }

    override def handleInputRows(
        key: (Int, Long), rows: Iterator[BandHit],
        timerValues: TimerValues): Iterator[CandidatePair] = {
      // an expired (TTL'd) bucket reads as absent: the empty-bucket state
      val seen = if (state.exists()) state.get().ids else Seq.empty[Long]
      val (out, acc, changed) =
        StreamingLshDedup.fold(seen, rows.map(_.doc).toSeq, maxBucket)
      if (changed) state.update(BucketState(acc))
      out.iterator
    }
  }

  /** Same surface as [[StreamingLshDedup.candidates]] minus batch-corpus
    * seeding (materialize the corpus through the stream once instead);
    * `bucketTtlMs` maps to native state TTL (processing time).
    */
  def candidates(
      docs: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 5, bands: Int = 16, rowsPerBand: Int = 4,
      maxBucket: Int = 1000, bucketTtlMs: Long = 0L): Dataset[CandidatePair] = {
    require(maxBucket >= 1, "maxBucket must be >= 1")
    require(bucketTtlMs >= 0, "bucketTtlMs must be >= 0 (0 = no TTL)")
    implicit val outEnc = Encoders.product[CandidatePair]
    StreamingLshDedup.bandHits(docs, textCol, idCol, shingleK, bands, rowsPerBand)
      .groupByKey(h => (h.band, h.bkey))(
        Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .transformWithState(new Processor(maxBucket, bucketTtlMs),
        if (bucketTtlMs > 0L) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{CurationFunnel, Dedup}

/** The STREAMING daily-ingest front door: one foreachBatch pipeline that
  * runs [[graft.operators.CurationFunnel.decide]] — gopher gate →
  * near-dup vs the STORED fingerprint index → frozen-bloom
  * decontamination → frozen-LM quality gate — over each micro-batch of
  * arriving documents, appends the batch's fingerprints to the stored
  * index (so tomorrow's arrivals dedup against today's), and logs one
  * verdict row per document.
  *
  * foreachBatch, not a stateful operator, because the dedup state here
  * is a STORED TABLE, not executor state: at 100 TB the fingerprint
  * index is far beyond any state store, lives as parquet (`indexDir`),
  * and each micro-batch joins against it delta-sized. The literal batch
  * body is shared with the batch composition, so the two cannot drift
  * (StreamingCurationFunnelSpec pins stream == one-shot batch
  * row-for-row under id-ordered arrival — first-arrival-wins dedup;
  * see the decide() scaladoc for why the greedy rule is associative
  * across micro-batches).
  *
  * Both sinks are written as one OVERWRITTEN partition directory per
  * micro-batch (`batch_id=N`), which makes redelivery IDEMPOTENT: a
  * retried batch replaces its own partition instead of appending
  * duplicates, and [[readIndex]] filters to `batch_id < current`, so a
  * retry can never see the failed attempt's own fingerprints as "base"
  * (a document would otherwise near-dup ITSELF on retry). The seed
  * corpus lands at `batch_id=-1`, below every real batch. Exactly-once
  * end-to-end therefore needs no sink transaction — checkpointed source
  * offsets + idempotent partition overwrite. Small-file buildup across
  * many micro-batches is the store's compaction concern, as with any
  * partitioned streaming sink.
  */
object StreamingCurationFunnel {

  /** Write the already-accepted corpus's fingerprints as the stored
    * index's seed partition (`batch_id=-1`) — deploy the funnel against
    * an existing corpus without replaying it through the stream.
    */
  def seedIndex(
      corpus: DataFrame, textCol: String, idCol: String,
      shingleK: Int, indexDir: String): Unit =
    Dedup.buildShingleIndex(corpus, textCol, idCol, shingleK)
      .write.mode("overwrite").parquet(s"$indexDir/batch_id=-1")

  /** The stored fingerprint index as seen by batch `batchId`: every
    * partition written BEFORE it (partition-pruned scan), in the
    * [[Dedup.buildShingleIndex]] (doc, sh) schema.
    */
  def readIndex(spark: SparkSession, indexDir: String, batchId: Long): DataFrame =
    spark.read.parquet(indexDir)
      .filter(col("batch_id") < batchId)
      .select(col("doc"), col("sh"))

  /** One micro-batch: decide against the index-so-far, overwrite this
    * batch's decision partition, overwrite this batch's index partition.
    * Public so a retry / parity spec can drive it directly.
    */
  def processBatch(
      batch: DataFrame, batchId: Long, textCol: String, idCol: String,
      model: CurationFunnel.FunnelModel,
      indexDir: String, outDir: String): Unit = {
    val scope = Dedup.newScope()
    try Dedup.inScope(scope) {
      val base = readIndex(batch.sparkSession, indexDir, batchId)
      val (decisions, deltaIndex) =
        CurationFunnel.decide(batch, textCol, idCol, base, model)
      decisions.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      // deltaIndex is persisted inside decide's dedup stage, so this
      // write reuses the fingerprints the verify join just computed
      deltaIndex.write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
    } finally Dedup.releaseScope(scope)
  }

  /** Wire the funnel over a streaming documents frame. `indexDir` should
    * be seeded first ([[seedIndex]]) — or hold any (doc, sh) partitions
    * from a previous run of this stream, which the checkpoint's batch
    * ids continue past.
    */
  def run(
      docs: DataFrame, textCol: String, idCol: String,
      model: CurationFunnel.FunnelModel,
      indexDir: String, outDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, textCol, idCol, model, indexDir, outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}

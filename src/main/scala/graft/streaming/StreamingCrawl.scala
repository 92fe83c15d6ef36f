package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.WebCuration

/** The STREAMING CRAWL front door — the crawl → text ladder
  * ([[graft.operators.WebCuration.crawlDocs]]: WARC record walk → HTML
  * main-content extraction → kept-line reassembly → Gopher word gate)
  * run per micro-batch of arriving `.warc.gz` dumps, with each batch's
  * KEPT documents stored as one idempotent partition overwrite — the
  * [[StreamingCurationFunnel]] pattern applied to crawl ingest.
  *
  * foreachBatch + stored parquet, not a stateful operator, because the
  * door is STATELESS across documents (no index, no epoch — crawlDocs'
  * scaladoc): the only cross-batch artifact is the output itself.
  * Idempotence is the established contract — a retried batch overwrites
  * its own `batch_id=N` partition instead of appending duplicates, so
  * checkpointed source offsets + partition overwrite give exactly-once
  * end-to-end with no sink transaction. Stream ≡ batch row-for-row for
  * ANY split of the dump set (StreamingCrawlSpec pins it; statelessness
  * makes every split trivially associative, unlike the funnel's greedy
  * dedup which needed an ordering argument).
  *
  * 100 TB shape: a batch of per-document archives fans out map-only
  * (record walk + extraction are one generate per archive, no shuffle)
  * into the single doc-keyed reassembly aggregation; archives stream in
  * as files (`binaryFile` readStream over the dump directory in [[run]]),
  * and genuinely huge members (~1 GB Common Crawl .warc.gz) should
  * instead arrive as (doc, path) rows through
  * [[graft.operators.Multimodal.warcRecordsFromFiles]] — the per-record
  * streaming reader — with the same downstream ladder.
  */
object StreamingCrawl {

  /** One micro-batch: run the ladder over this batch's archives and
    * overwrite this batch's kept-docs partition. Public so a retry /
    * parity spec can drive it directly. */
  def processBatch(
      batch: DataFrame, batchId: Long, idCol: String, payloadCol: String,
      outDir: String, minWords: Int = 20, maxWords: Int = 100000,
      capBytes: Long = 64L << 20): Unit = {
    WebCuration.crawlDocs(batch, idCol, payloadCol, minWords, maxWords, capBytes)
      .filter(col("gopher_pass"))
      .select(col("doc"), col("clean"), col("n_kept_lines"))
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
  }

  /** [[processBatch]] with the archives STREAMED per record off storage
    * — batches carry `(doc, path)` rows (e.g. a file-listing source over
    * the crawl drop directory) and
    * [[graft.operators.WebCuration.crawlDocsFromFiles]] opens each
    * archive through Hadoop FS, one record in memory at a time: the
    * real-Common-Crawl door (~1 GB members never materialize). Same
    * output contract and idempotent partition overwrite. */
  def processBatchFromFiles(
      batch: DataFrame, batchId: Long, idCol: String, pathCol: String,
      outDir: String, minWords: Int = 20, maxWords: Int = 100000,
      perRecordCap: Long = 64L << 20): Unit = {
    WebCuration
      .crawlDocsFromFiles(batch, idCol, pathCol, minWords, maxWords,
        perRecordCap)
      .filter(col("gopher_pass"))
      .select(col("doc"), col("clean"), col("n_kept_lines"))
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
  }

  /** [[run]] over a streaming (doc, path) listing — the
    * [[processBatchFromFiles]] door. */
  def runFromFiles(
      listings: DataFrame, idCol: String, pathCol: String,
      outDir: String, checkpointDir: String,
      minWords: Int = 20, maxWords: Int = 100000,
      perRecordCap: Long = 64L << 20): StreamingQuery =
    listings.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatchFromFiles(batch, batchId, idCol, pathCol, outDir,
          minWords, maxWords, perRecordCap)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** The stored kept-docs table as seen after batch `upTo` (partition-
    * pruned scan — the readIndex convention). */
  def readKept(spark: SparkSession, outDir: String, upTo: Long): DataFrame =
    spark.read.parquet(outDir).filter(col("batch_id") <= upTo)

  /** Wire the door over a streaming dumps frame (e.g. `binaryFile`
    * readStream on the crawl drop directory, with the archive id derived
    * from the file name). Checkpointed batch ids continue across
    * restarts; every write is an idempotent partition overwrite. */
  def run(
      dumps: DataFrame, idCol: String, payloadCol: String,
      outDir: String, checkpointDir: String,
      minWords: Int = 20, maxWords: Int = 100000,
      capBytes: Long = 64L << 20): StreamingQuery =
    dumps.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, payloadCol, outDir,
          minWords, maxWords, capBytes)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}

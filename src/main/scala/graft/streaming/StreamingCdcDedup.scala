package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming content-defined-chunk dedup door: score each arriving
  * micro-batch against the STORED chunk index of everything accepted so
  * far ([[Dedup.cdcScoreAgainstBase]] — delta×base + delta×delta, never
  * base×base), then append the batch's own chunks to the store. The
  * storage-layer sibling of [[StreamingCurationFunnel]]'s fingerprint
  * index: same exactly-once discipline — per-batch partition OVERWRITES
  * (`batch_id=N`), readers filter `batch_id < current`, so a retried
  * batch ignores its own failed append and re-scores identically; the
  * pre-existing corpus seeds at `batch_id=-1`, below every real batch.
  *
  * Unlike the LSH candidate stream (driver-state per bucket), the chunk
  * index is corpus-proportional and lives in STORAGE, not executor
  * state: per batch the cost is one map-only chunking pass over the
  * delta plus two hash joins keyed by `(chunk_hash, chunk_len)` whose
  * probe side is delta-sized — the 100 TB shape.
  *
  * Long-running stores compact through the [[Manifests]] pointer
  * ([[compactChunks]]): chunk rows are immutable facts keyed by
  * `(doc, chunk_no)`, so the fold is a pure concatenation — nothing to
  * sum, nothing to dedup beyond legacy duplicate slots.
  */
object StreamingCdcDedup {

  private val ChunkCols =
    Seq("doc", "chunk_no", "c_start", "chunk_len", "chunk_hash")

  /** Seed the chunk store with an already-accepted batch corpus
    * (`batch_id=-1`): deploy the stream against an existing corpus
    * without replaying it. */
  def seedChunks(
      docs: DataFrame, textCol: String, idCol: String, chunkDir: String,
      window: Int = 8, boundaryHex: String = "08"): Unit =
    Dedup.cdcChunks(docs, textCol, idCol, window, boundaryHex)
      .write.mode("overwrite").parquet(s"$chunkDir/batch_id=-1")

  /** The stored chunk table as seen by batch `batchId`: every partition
    * written BEFORE it; manifest-aware — rows at or below a compaction
    * horizon resolve from the committed segment, later batches from the
    * live `batch_id=N` partitions. */
  def readChunks(
      spark: SparkSession, chunkDir: String, batchId: Long): DataFrame = {
    def pick(df: DataFrame): DataFrame = df.select(ChunkCols.map(col): _*)
    // unseeded store, first batch: an empty chunk frame (the door may
    // legitimately start cold — everything in batch 0 is then novel)
    if (Manifests.read(chunkDir).isEmpty && batchPartitions(chunkDir).isEmpty)
      return spark.range(0).select(
        col("id").as("doc"), col("id").as("chunk_no"),
        col("id").as("c_start"), col("id").as("chunk_len"),
        col("id").cast("string").as("chunk_hash"))
    Manifests.read(chunkDir) match {
      case Some(m) =>
        require(batchId > m.upTo,
          s"readChunks(batch $batchId) is below the compaction horizon " +
            s"${m.upTo} — compact only completed batches")
        val seg = pick(spark.read.parquet(s"$chunkDir/${m.dir}"))
        val later = batchPartitions(chunkDir).map(_._1)
          .filter(b => b > m.upTo && b < batchId)
        if (later.isEmpty) seg
        else seg.unionByName(
          pick(spark.read.parquet(chunkDir)
            .filter(col("batch_id") > m.upTo && col("batch_id") < batchId)))
      case None =>
        pick(spark.read.parquet(chunkDir)
          .filter(col("batch_id") < batchId))
    }
  }

  /** One micro-batch: chunk the delta ONCE (persisted — it feeds the
    * score's two consumers and the store append), score against the
    * chunks-so-far, then overwrite this batch's score and chunk
    * partitions concurrently (independent idempotent writes, the
    * funnel's pattern). Public so retry/parity specs drive it directly. */
  def processBatch(
      batch: DataFrame, batchId: Long, textCol: String, idCol: String,
      chunkDir: String, outDir: String,
      window: Int = 8, boundaryHex: String = "08"): Unit = {
    val spark = batch.sparkSession
    val dch = Dedup.cdcChunks(batch, textCol, idCol, window, boundaryHex)
      .persist()
    try {
      dch.count() // materialize before the concurrent consumers
      val scored = Dedup.cdcScoreAgainstBase(
        readChunks(spark, chunkDir, batchId), dch)
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      Seq(
        Future(scored.write.mode("overwrite")
          .parquet(s"$outDir/batch_id=$batchId")),
        Future(dch.write.mode("overwrite")
          .parquet(s"$chunkDir/batch_id=$batchId")))
        .foreach(Await.result(_, Duration.Inf))
    } finally { dch.unpersist(); () }
  }

  /** The per-doc scores written so far (`batch_id <= upTo`). */
  def readScores(spark: SparkSession, outDir: String, upTo: Long): DataFrame =
    spark.read.parquet(outDir).filter(col("batch_id") <= upTo)
      .drop("batch_id")

  /** COMPACT the chunk store: fold every visible row with
    * `batch_id <= upToBatch` into one consolidated segment, commit it
    * with the atomic [[Manifests]] pointer swap, GC the folded
    * partitions. Compact only COMPLETED batches (the readers' strict
    * `< current` filter is what makes a crash anywhere here leave
    * garbage, never wrong answers). */
  def compactChunks(
      spark: SparkSession, chunkDir: String, upToBatch: Long): Unit = {
    val prev = Manifests.read(chunkDir)
    require(prev.forall(_.upTo <= upToBatch),
      s"compactChunks($upToBatch) below the committed horizon " +
        s"${prev.map(_.upTo)}")
    val (gen, segRel) = Manifests.nextSegment(prev)
    readChunks(spark, chunkDir, upToBatch + 1)
      .dropDuplicates("doc", "chunk_no")
      .write.mode("overwrite").parquet(s"$chunkDir/$segRel")
    Manifests.commit(chunkDir, Manifests.Manifest(gen, segRel, upToBatch))
    val fs = Manifests.fsFor(new org.apache.hadoop.fs.Path(chunkDir))
    prev.foreach { m =>
      fs.delete(new org.apache.hadoop.fs.Path(chunkDir, m.dir), true); ()
    }
    batchPartitions(chunkDir).filter(_._1 <= upToBatch)
      .foreach { p => fs.delete(p._2, true); () }
  }

  private def batchPartitions(
      chunkDir: String): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val root = new org.apache.hadoop.fs.Path(chunkDir)
    val fs = Manifests.fsFor(root)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("batch_id=") =>
        (st.getPath.getName.stripPrefix("batch_id=").toLong, st.getPath)
    }
  }

  /** Wire the door over a streaming (id, text) frame. Seed `chunkDir`
    * first ([[seedChunks]]) or start empty. */
  def run(
      docs: DataFrame, textCol: String, idCol: String,
      chunkDir: String, outDir: String, checkpointDir: String,
      window: Int = 8, boundaryHex: String = "08"): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, textCol, idCol, chunkDir, outDir,
          window, boundaryHex)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}

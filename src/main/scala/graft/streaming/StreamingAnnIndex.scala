package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedup, Similarity}

/** The STREAMING ANN INDEX with a trigger-driven retrain loop — the
  * operator that ACTS on q291's verdict (the q284 decay curve told us
  * WHEN an incremental IVF-PQ index must retrain; q291 turned that into
  * a poll-able gate; this closes the loop the way
  * [[StreamingCurationFunnel]] closed the LM's):
  *
  *  - new vectors arrive as micro-batches; each batch is stored raw
  *    (`vecDir/batch_id=N` — the corpus of record a retrain reads),
  *    encoded under the CURRENT frozen model epoch (map-only
  *    [[Similarity.ivfPqEncode]], the q277 daily-ingest shape) and
  *    appended to the epoch's coded index
  *    (`codedDir/boundary=B/batch_id=N`);
  *  - after the append, the batch POLLS [[Similarity.ivfPqRetrainTrigger]]
  *    against the stored decay curve: the index composition is pure
  *    partition provenance (`is_base ⟺ batch_id < B` — rows the epoch's
  *    training saw), so the poll is one partition-pruned count;
  *  - when the trigger fires, the loop RETRAINS on the whole stored
  *    corpus ([[Similarity.ivfPqTrain]] — md5-deterministic bounded
  *    sample), persists the new epoch's model tables
  *    (`modelDir/boundary=N+1`), re-encodes the corpus under it as the
  *    new epoch's base partition, and HOT-SWAPS: the next batch resolves
  *    the new boundary from storage.
  *
  * Epoch discipline (the [[StreamingCurationFunnel]] refresh contract):
  * the boundary in force at batch N is a PURE FUNCTION of finalized
  * state — the largest stored `boundary ≤ N` — so retries and
  * checkpoint restarts rebuild every epoch bit-identically (a retrain
  * written by a crashed attempt has boundary N+1 and is invisible to
  * the retry of batch N); every write is an idempotent per-partition
  * overwrite. Training inputs and the trigger verdict are deterministic
  * functions of stored partitions, so the whole loop is replayable.
  *
  * 100 TB shape: per-batch cost is delta-sized (map-only encode + one
  * count + one bounded-sample poll); the retrain pays one corpus
  * re-encode — exactly the cost the decay curve says you must pay, now
  * paid only when the measured recall demands it. The model tables are
  * control-plane-sized (≤ 256 + m·256 rows); nothing collects beyond
  * them and the one-row trigger verdict.
  */
object StreamingAnnIndex {

  /** Frozen IVF-PQ training geometry (the q142/q277 constants). */
  final case class AnnParams(
      nClusters: Int = 8, coarseIters: Int = 3,
      m: Int = 4, nCentroids: Int = 16, pqIters: Int = 3)

  /** One ledger row per processed batch — what the loop decided and the
    * epoch that serves AFTER the batch. */
  final case class LedgerRow(
      batchId: Long, nBase: Long, nDelta: Long, currentDeltaBps: Long,
      maxSafeDeltaBps: Long, retrain: Boolean, boundaryAfter: Long)

  /** Bootstrap the stored state from an accepted corpus: raw vectors at
    * `vecDir/batch_id=-1`, epoch-0 model (trained on the seed) at
    * `modelDir/boundary=0`, seed encode at `codedDir/boundary=0/batch_id=-1`.
    */
  def seed(
      corpus: DataFrame, vecCol: String, idCol: String, p: AnnParams,
      vecDir: String, modelDir: String, codedDir: String): Unit = {
    val spark = corpus.sparkSession
    val scope = Dedup.newScope()
    try Dedup.inScope(scope) {
      corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
        .write.mode("overwrite").parquet(s"$vecDir/batch_id=-1")
      val seedVecs = spark.read.parquet(s"$vecDir/batch_id=-1")
      val (model, coded) = Similarity.ivfPqTrainEncode(
        seedVecs, "embedding", "vec_id",
        p.nClusters, p.coarseIters, p.m, p.nCentroids, p.pqIters)
      writeModel(spark, model, s"$modelDir/boundary=0")
      coded.write.mode("overwrite").parquet(s"$codedDir/boundary=0/batch_id=-1")
    } finally Dedup.releaseScope(scope)
  }

  private def writeModel(
      spark: SparkSession, model: Similarity.IvfPqModel, dir: String): Unit = {
    val (cents, books) = Similarity.ivfPqModelTables(spark, model)
    cents.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    books.coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
  }

  // epoch models are pure functions of (modelDir, boundary) over
  // finalized partitions — memo is retry/restart-safe like the funnel's
  private val modelMemo = scala.collection.concurrent.TrieMap
    .empty[(String, Long), Similarity.IvfPqModel]

  def clearModelMemo(): Unit = modelMemo.clear()

  private def readModel(
      spark: SparkSession, modelDir: String, boundary: Long): Similarity.IvfPqModel =
    modelMemo.getOrElseUpdate((modelDir, boundary),
      Similarity.ivfPqModelFromTables(
        spark.read.parquet(s"$modelDir/boundary=$boundary/centroids"),
        spark.read.parquet(s"$modelDir/boundary=$boundary/codebooks")))

  /** The stored boundary ids under a model/coded root, through Hadoop's
    * FileSystem ([[Manifests.fsFor]]) — the epoch discipline addresses
    * file:/HDFS/cloud schemes alike (the round-17 java.io.File walk was
    * local-only). */
  private def storedBoundaries(dir: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = Manifests.fsFor(root)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("boundary=") =>
        st.getPath.getName.stripPrefix("boundary=").toLong
    }
  }

  /** The boundary in force at batch `batchId`: the largest stored
    * boundary ≤ batchId (a retrain written by batch N stores N+1, so it
    * governs only LATER batches — which is what makes a retried batch N
    * deterministic). */
  def boundaryAt(modelDir: String, batchId: Long): Long = {
    val dirs = storedBoundaries(modelDir)
    require(dirs.nonEmpty, s"no model boundaries under $modelDir — seed() first")
    val eligible = dirs.filter(_ <= batchId)
    require(eligible.nonEmpty, s"no boundary <= $batchId under $modelDir")
    eligible.max
  }

  /** RETIRE superseded model/coded epochs — the storage-leak fix for the
    * retrain loop (each retrain re-encodes the WHOLE corpus under the new
    * boundary, so R retrains otherwise store R× the corpus in coded
    * form; the raw `vecDir` is the corpus of record and is never
    * touched). The maintenance companion to
    * [[StreamingCurationFunnel.compactIndex]], under the same visibility
    * discipline: call it only for COMPLETED batches (`upToBatch` strictly
    * below the stream's next batch id — e.g. while the query is stopped,
    * or against the last committed checkpoint batch).
    *
    * Retires every `boundary=B` partition of `modelDir` and `codedDir`
    * with B < the boundary in force at batch `upToBatch + 1` — which is
    * INVISIBLE from that point on: every future batch N > upToBatch
    * resolves [[boundaryAt]](N) = max stored ≤ N ≥ the serving boundary
    * (deleting smaller ids never changes a max), and batches ≤ upToBatch
    * are checkpoint-committed (foreachBatch runs batch ids sequentially),
    * so no retry can ever need them.
    *
    * Crash contract (the [[Manifests]] GC discipline): deleting starts
    * only once the serving boundary is resolved from finalized storage;
    * a crash mid-retire leaves some superseded dirs behind — garbage,
    * never wrong answers (readers take the max eligible boundary) — and
    * a rerun is idempotent. Returns the retired boundary ids.
    */
  def retireEpochs(
      modelDir: String, codedDir: String, upToBatch: Long): Seq[Long] = {
    val serving = boundaryAt(modelDir, upToBatch + 1)
    val retired = scala.collection.mutable.ArrayBuffer.empty[Long]
    Seq(modelDir, codedDir).foreach { dir =>
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = Manifests.fsFor(root)
      storedBoundaries(dir).filter(_ < serving).foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"boundary=$b"), true)
        retired += b
      }
    }
    // a retired epoch's memoized model is unreachable (no batch resolves
    // a deleted boundary), but drop it anyway so a long-lived driver
    // doesn't pin dead model tables
    modelMemo.keysIterator
      .filter { case (d, b) => d == modelDir && b < serving }
      .foreach(modelMemo.remove)
    retired.distinct.sorted.toSeq
  }

  /** One micro-batch of the loop: store raw, encode under the epoch in
    * force, append, poll the trigger, retrain + hot-swap when it fires.
    * Returns the ledger row (also how the parity spec reads the loop). */
  def processBatch(
      batch: DataFrame, batchId: Long, vecCol: String, idCol: String,
      p: AnnParams, curve: DataFrame, floorPpm: Long,
      vecDir: String, modelDir: String, codedDir: String): LedgerRow = {
    val spark = batch.sparkSession
    val scope = Dedup.newScope()
    try Dedup.inScope(scope) {
      batch.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
        .write.mode("overwrite").parquet(s"$vecDir/batch_id=$batchId")
      val b = boundaryAt(modelDir, batchId)
      val model = readModel(spark, modelDir, b)
      val batchVecs = spark.read.parquet(s"$vecDir/batch_id=$batchId")
      Similarity.ivfPqEncode(model, batchVecs, "embedding", "vec_id")
        .write.mode("overwrite").parquet(s"$codedDir/boundary=$b/batch_id=$batchId")
      // poll: composition = this epoch's partitions up to and incl. this
      // batch; provenance is the partition id (pure function of storage)
      val composition = spark.read.parquet(s"$codedDir/boundary=$b")
        .filter(col("batch_id") <= batchId)
        .withColumn("is_base", col("batch_id") < b)
      val verdict = Similarity
        .ivfPqRetrainTrigger(curve, composition, floorPpm)
        .collect()(0)
      val retrain = verdict.getAs[Boolean]("retrain")
      val boundaryAfter =
        if (!retrain) b
        else {
          // RETRAIN: new epoch over the whole stored corpus, re-encoded as
          // the new boundary's base partition (batch_id = batchId < N+1 ⟹
          // every re-encoded row reads is_base under the new epoch)
          val newB = batchId + 1
          val allVecs = spark.read.parquet(vecDir)
            .filter(col("batch_id") <= batchId)
            .select(col("vec_id"), col("embedding"))
          val (m2, coded2) = Similarity.ivfPqTrainEncode(
            allVecs, "embedding", "vec_id",
            p.nClusters, p.coarseIters, p.m, p.nCentroids, p.pqIters)
          writeModel(spark, m2, s"$modelDir/boundary=$newB")
          coded2.write.mode("overwrite")
            .parquet(s"$codedDir/boundary=$newB/batch_id=$batchId")
          newB
        }
      LedgerRow(batchId,
        verdict.getAs[Long]("n_base"), verdict.getAs[Long]("n_delta"),
        verdict.getAs[Long]("current_delta_bps"),
        verdict.getAs[Long]("max_safe_delta_bps"), retrain, boundaryAfter)
    } finally Dedup.releaseScope(scope)
  }

  /** The serving surface after batch `upTo`: (model epoch, coded index)
    * under the newest boundary ≤ upTo + 1 — probe with
    * [[Similarity.ivfPqProbeIndex]]. */
  def current(
      spark: SparkSession, modelDir: String, codedDir: String, upTo: Long)
      : (Similarity.IvfPqModel, DataFrame) = {
    val b = boundaryAt(modelDir, upTo + 1)
    (readModel(spark, modelDir, b),
      spark.read.parquet(s"$codedDir/boundary=$b").filter(col("batch_id") <= upTo)
        .drop("batch_id"))
  }

  /** Wire the loop over a streaming vector frame ([[seed]] the dirs
    * first). The checkpoint's batch ids continue across restarts, and
    * every per-batch artifact is an idempotent partition overwrite, so
    * the loop is retry- and restart-safe. */
  def run(
      vecs: DataFrame, vecCol: String, idCol: String, p: AnnParams,
      curve: DataFrame, floorPpm: Long,
      vecDir: String, modelDir: String, codedDir: String,
      checkpointDir: String): StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, vecCol, idCol, p, curve, floorPpm,
          vecDir, modelDir, codedDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}

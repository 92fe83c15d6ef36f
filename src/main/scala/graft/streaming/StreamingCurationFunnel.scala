package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{CurationFunnel, Dedup, TextPipeline}

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
    * an existing corpus without replaying it through the stream. The
    * seed is PRE-BANDED ([[Dedup.buildBandedIndex]] format v3, geometry
    * = (bands, rowsPerBand) stamped as `bands_geom`, which must match
    * the funnel model's — consumers validate the stamp and fall back to
    * recomputing keys on mismatch): band keys are stored next to the
    * fingerprints so no future batch ever re-runs the base side's
    * MinHash signatures.
    */
  def seedIndex(
      corpus: DataFrame, textCol: String, idCol: String,
      shingleK: Int, indexDir: String,
      bands: Int = 16, rowsPerBand: Int = 4): Unit =
    Dedup.buildBandedIndex(
        Dedup.buildShingleIndex(corpus, textCol, idCol, shingleK),
        bands, rowsPerBand)
      .write.mode("overwrite").parquet(s"$indexDir/batch_id=-1")

  /** The stored fingerprint index as seen by batch `batchId`: every
    * partition written BEFORE it (partition-pruned scan), in the
    * [[Dedup.buildBandedIndex]] (doc, sh, bands, bands_geom) v3 schema —
    * or the older v2 (no geometry stamp) / v1 (doc, sh) schemas, in
    * which case consumers validate what they can and recompute band keys
    * on the fly where trust fails (see the buildBandedIndex contract).
    */
  def readIndex(spark: SparkSession, indexDir: String, batchId: Long): DataFrame = {
    val raw = spark.read.parquet(indexDir).filter(col("batch_id") < batchId)
    val cols = Seq("doc", "sh") ++
      Seq("bands", "bands_geom").filter(raw.columns.contains)
    raw.select(cols.map(col): _*)
  }

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

  /** COMPACT the stored fingerprint index: fold every partition with
    * `batch_id <= upToBatch` into ONE consolidated partition at
    * `batch_id=upToBatch`, then delete the older partitions — the
    * maintenance job that keeps a long-running front door from
    * accumulating one small partition per micro-batch (thousands of
    * files after a quarter of daily batches). Visibility is preserved:
    * every future batch filters `batch_id < current > upToBatch`, so it
    * sees exactly the same fingerprints before and after
    * (StreamingCurationFunnelSpec pins decisions bit-for-bit).
    *
    * Call it only for COMPLETED batches (upToBatch strictly below the
    * stream's next batch id — e.g. while the query is stopped, or
    * against the last committed checkpoint batch).
    *
    * Crash contract (plain parquet directories are not transactional —
    * production would put the index behind a table format with an
    * atomic swap): the consolidated rows are staged under a dot-prefixed
    * temp dir (invisible to the reader), then swapped into the
    * `batch_id=upToBatch` slot, then the older partitions are deleted.
    * A crash between the swap and the deletes leaves DUPLICATE doc rows
    * — which would inflate the verify join's intersections — so
    * [[duplicateDocs]] is the health probe and RERUNNING compactIndex
    * with the same `upToBatch` is the recovery: the re-read
    * deduplicates by doc and completes the deletes (idempotent,
    * spec-pinned). Check health before resuming the stream after a
    * compaction crash.
    */
  def compactIndex(spark: SparkSession, indexDir: String, upToBatch: Long): Unit = {
    val staging = new java.io.File(indexDir, s".compact-$upToBatch")
    val raw = spark.read.parquet(indexDir).filter(col("batch_id") <= upToBatch)
    // stored band keys (+ the v3 geometry stamp) survive compaction —
    // they are a pure function of sh, so carrying them is a copy, not a
    // recompute
    val cols = Seq("doc", "sh") ++
      Seq("bands", "bands_geom").filter(raw.columns.contains)
    raw.select(cols.map(col): _*)
      .dropDuplicates("doc") // collapse a prior crash's duplicate slots
      .write.mode("overwrite").parquet(staging.getPath)
    // second job: the slot being overwritten is part of the first job's
    // input, so the swap must read from the staging copy
    spark.read.parquet(staging.getPath).write.mode("overwrite")
      .parquet(s"$indexDir/batch_id=$upToBatch")
    batchPartitions(indexDir).filter(_._1 < upToBatch)
      .foreach(p => deleteRecursively(p._2))
    deleteRecursively(staging)
  }

  /** Index health probe: the number of doc ids present in MORE than one
    * partition/row — nonzero only in the crash window documented on
    * [[compactIndex]] (recovery = rerun the compaction). */
  def duplicateDocs(spark: SparkSession, indexDir: String): Long =
    spark.read.parquet(indexDir)
      .groupBy(col("doc")).count().filter(col("count") > 1).count()

  private def batchPartitions(indexDir: String): Seq[(Long, java.io.File)] = {
    val kids = Option(new java.io.File(indexDir).listFiles()).getOrElse(Array.empty)
    kids.toSeq.collect {
      case f if f.isDirectory && f.getName.startsWith("batch_id=") =>
        (f.getName.stripPrefix("batch_id=").toLong, f)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
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

  // ------------------------------------------------- model-refresh cadence

  /** Seed the stored COUNTS table (`batch_id=-1`) with the accepted
    * corpus's piece counts under the frozen counting segmenter — the
    * third piece of stored front-door state next to the fingerprint
    * index and the decision log. Counts are vocabulary-bounded rows
    * ([[TextPipeline.unigramCounts]]), additive across id-disjoint
    * corpora, so the running table absorbs per-batch deltas without
    * ever re-reading yesterday's text.
    */
  def seedCounts(
      corpus: DataFrame, textCol: String,
      countingLm: TextPipeline.UnigramModel, countsDir: String): Unit =
    TextPipeline.unigramCounts(corpus, textCol, countingLm)
      .write.mode("overwrite").parquet(s"$countsDir/batch_id=-1")

  /** Seed the stored WORD-SEGMENTATION table (`batch_id=-1`) with the
    * accepted corpus's vocabulary segmented under the frozen counting
    * model — the incremental vocabulary artifact: with `segDir` wired
    * into [[processBatchWithRefresh]], each batch runs the Viterbi DP
    * only over words the corpus has NEVER seen (anti-join against the
    * stored table; under Zipfian arrival the new-word set per batch is
    * a sliver of the batch vocabulary, which is the difference between
    * vocabulary-sized and delta-sized count folds at 100 TB).
    */
  def seedSegments(
      corpus: DataFrame, textCol: String,
      countingLm: TextPipeline.UnigramModel, segDir: String): Unit =
    TextPipeline.unigramSegments(
        corpus.select(explode(
          graft.functions.TextFunctions.tokens(col(textCol))).as("w")),
        countingLm)
      .write.mode("overwrite").parquet(s"$segDir/batch_id=-1")

  /** The LM epoch in force at batch `boundary·refreshEvery`: fold the
    * seed counts with every kept-batch delta below `upToBatch` and
    * re-price ([[TextPipeline.unigramRefresh]] — bit-identical to an
    * M-step over the union corpus). Vocabulary-bounded collect. */
  def refreshedLm(
      spark: SparkSession, countsDir: String, upToBatch: Long,
      countingLm: TextPipeline.UnigramModel): TextPipeline.UnigramModel = {
    val all = spark.read.parquet(countsDir)
    TextPipeline.unigramRefreshModel(
      all.filter(col("batch_id") === -1L).select(col("piece"), col("cnt")),
      all.filter(col("batch_id") >= 0L && col("batch_id") < upToBatch)
        .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt")),
      countingLm)
  }

  // epoch models are pure functions of (countsDir, epoch) over FINALIZED
  // partitions, so the memo is retry/restart-safe: a restarted stream
  // rebuilds each epoch from storage on first use. Keyed by dir — tests
  // and concurrent funnels with distinct dirs never collide; reusing one
  // dir for a NEW seed requires clearRefreshMemo().
  private val lmMemo = scala.collection.concurrent.TrieMap
    .empty[(String, Long), TextPipeline.UnigramModel]

  def clearRefreshMemo(): Unit = lmMemo.clear()

  /** One micro-batch under the REFRESH CADENCE: batches are decided
    * under model epoch `batchId / refreshEvery` — epoch 0 serves
    * `model0` as-is; epoch e ≥ 1 serves the LM re-priced from the seed
    * counts plus every kept-batch count below `e·refreshEvery`
    * ([[refreshedLm]]) and the caller's per-epoch bloom (OR-merge new
    * benchmark deltas via [[TextPipeline.bloomMerge]] — merged ≡
    * union-built, q281). After deciding, the batch's KEPT documents'
    * piece counts land at `countsDir/batch_id=N` (idempotent partition
    * overwrite, like the index), so the refresh state is STORED —
    * retries and checkpoint restarts rebuild every epoch bit-identically
    * from finalized partitions, never from driver memory.
    *
    * COUNTING MODEL CONTRACT: deltas are always segmented under
    * `model0.lm` — the frozen epoch-0 segmenter — because count
    * additivity (the whole refresh algebra) holds only within one
    * segmenter; refresh RE-PRICES the scores the LM gate serves, it
    * never re-segments or grows the piece vocabulary (that is a
    * retrain, exactly the IVF-PQ codebook discipline of q277/q284).
    *
    * Pinned: (stream with refresh at batch k) ≡ (batch composition run
    * with the same two model epochs split at k) row-for-row
    * (StreamingCurationFunnelSpec; q289 oracles the batch composition).
    */
  def processBatchWithRefresh(
      batch: DataFrame, batchId: Long, textCol: String, idCol: String,
      model0: CurationFunnel.FunnelModel, refreshEvery: Long,
      bloomForEpoch: Long => TextPipeline.BloomModel,
      indexDir: String, outDir: String, countsDir: String,
      segDir: Option[String] = None): Unit = {
    require(refreshEvery >= 1, "refreshEvery >= 1")
    val spark = batch.sparkSession
    val epoch = batchId / refreshEvery
    val lm =
      if (epoch == 0L) model0.lm
      else lmMemo.getOrElseUpdate((countsDir, epoch),
        refreshedLm(spark, countsDir, epoch * refreshEvery, model0.lm))
    val model = model0.copy(lm = lm, bloom = bloomForEpoch(epoch))
    val scope = Dedup.newScope()
    try Dedup.inScope(scope) {
      val base = readIndex(spark, indexDir, batchId)
      val (decisions, deltaIndex) =
        CurationFunnel.decide(batch, textCol, idCol, base, model)
      decisions.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      deltaIndex.write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
      // the batch's kept documents feed the NEXT epoch's counts — read
      // back from the just-written partition (cheap, and exactly the
      // rows a retry would see), segmented under the frozen counter
      val kept = batch.join(
        spark.read.parquet(s"$outDir/batch_id=$batchId")
          .filter(col("keep")).select(col("doc").as(idCol)),
        Seq(idCol), "left_semi")
      val counts = segDir match {
        case None => TextPipeline.unigramCounts(kept, textCol, model0.lm)
        case Some(sd) =>
          // incremental vocabulary path ([[seedSegments]]): DP only the
          // words the stored table has never seen, append them as this
          // batch's partition (idempotent overwrite, `< batchId` read —
          // the index discipline), resolve counts through the table.
          // Bit-identical to the direct path (spec-pinned): the coalesce
          // fallback in unigramCountsFromSegments self-heals any gap.
          val wordCounts = Dedup.persistTracked(kept
            .select(explode(
              graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
            .groupBy(col("w")).agg(count(lit(1)).as("f")))
          val stored = spark.read.parquet(sd)
            .filter(col("batch_id") < batchId).select(col("w"), col("ps"))
          TextPipeline.unigramSegments(
              wordCounts.join(stored.select(col("w")), Seq("w"), "left_anti"),
              model0.lm)
            .write.mode("overwrite").parquet(s"$sd/batch_id=$batchId")
          TextPipeline.unigramCountsFromSegments(
            wordCounts,
            spark.read.parquet(sd).filter(col("batch_id") <= batchId)
              .select(col("w"), col("ps")),
            model0.lm)
      }
      counts.write.mode("overwrite").parquet(s"$countsDir/batch_id=$batchId")
    } finally Dedup.releaseScope(scope)
  }

  /** [[run]] under the refresh cadence: seed `indexDir` ([[seedIndex]])
    * and `countsDir` ([[seedCounts]], under `model0.lm`) first; pass
    * `segDir` (seeded via [[seedSegments]]) to fold counts through the
    * stored segmentation table — new-words-only DP per batch. */
  def runWithRefresh(
      docs: DataFrame, textCol: String, idCol: String,
      model0: CurationFunnel.FunnelModel, refreshEvery: Long,
      bloomForEpoch: Long => TextPipeline.BloomModel,
      indexDir: String, outDir: String, countsDir: String,
      checkpointDir: String, segDir: Option[String] = None): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatchWithRefresh(batch, batchId, textCol, idCol, model0,
          refreshEvery, bloomForEpoch, indexDir, outDir, countsDir, segDir)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}

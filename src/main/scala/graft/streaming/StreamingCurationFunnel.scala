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
    *
    * Manifest-aware ([[Manifests]]): a compacted store resolves rows at
    * or below the manifest horizon from its committed segment, later
    * batches from the live `batch_id=N` partitions; mixed format
    * versions NULL-fill and fall back per row. `batchId` must be above
    * the horizon (the run contract guarantees it — compaction folds only
    * COMPLETED batches, and every reader filters `batch_id < current`).
    */
  def readIndex(spark: SparkSession, indexDir: String, batchId: Long): DataFrame = {
    def pick(df: DataFrame): DataFrame = {
      val cols = Seq("doc", "sh") ++
        Seq("bands", "bands_geom").filter(df.columns.contains)
      df.select(cols.map(col): _*)
    }
    Manifests.read(indexDir) match {
      case Some(m) =>
        require(batchId > m.upTo,
          s"readIndex(batch $batchId) is below the compaction horizon " +
            s"${m.upTo} — compact only completed batches")
        val seg = pick(spark.read.parquet(s"$indexDir/${m.dir}"))
        val later = batchPartitions(indexDir).map(_._1)
          .filter(b => b > m.upTo && b < batchId)
        if (later.isEmpty) seg
        else seg.unionByName(
          pick(spark.read.parquet(indexDir)
            .filter(col("batch_id") > m.upTo && col("batch_id") < batchId)),
          allowMissingColumns = true)
      case None =>
        pick(spark.read.parquet(indexDir).filter(col("batch_id") < batchId))
    }
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
      // independent idempotent per-batch overwrites over already-persisted
      // inputs (deltaIndex projects decide()'s evaluated cache) — run
      // concurrently, exactly like processBatchWithRefresh's three writes
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      Seq(
        Future(decisions.write.mode("overwrite")
          .parquet(s"$outDir/batch_id=$batchId")),
        Future(deltaIndex.write.mode("overwrite")
          .parquet(s"$indexDir/batch_id=$batchId")))
        .foreach(Await.result(_, Duration.Inf))
    } finally Dedup.releaseScope(scope)
  }

  /** COMPACT the stored fingerprint index: fold every visible row with
    * `batch_id <= upToBatch` into ONE consolidated segment and commit it
    * with an ATOMIC manifest-pointer swap ([[Manifests]]), then
    * garbage-collect the folded partitions — the maintenance job that
    * keeps a long-running front door from accumulating one small
    * partition per micro-batch (thousands of files after a quarter of
    * daily batches). Visibility is preserved: every future batch filters
    * `batch_id < current > upToBatch`, so it sees exactly the same
    * fingerprints before and after (StreamingCurationFunnelSpec pins
    * decisions bit-for-bit).
    *
    * Call it only for COMPLETED batches (upToBatch strictly below the
    * stream's next batch id — e.g. while the query is stopped, or
    * against the last committed checkpoint batch).
    *
    * Crash contract (the round-17 atomic swap — the old two-job
    * slot-overwrite had a documented duplicate-rows window):
    *  - crash BEFORE the manifest rename → the staged segment is a
    *    dot-prefixed dir no reader resolves; the store serves the OLD
    *    state exactly; rerunning compactIndex writes a fresh-generation
    *    segment and completes (idempotent).
    *  - the rename itself is one atomic POSIX move — readers see either
    *    pointer, never a half-state, and duplicates are structurally
    *    impossible from the commit on.
    *  - crash AFTER the commit, during GC → superseded partitions linger
    *    but are INVISIBLE (readers resolve `<= upTo` through the
    *    manifest only); any later compaction — or a GC rerun — removes
    *    them. [[duplicateDocs]], the old crash-window health probe, is
    *    demoted to a regression assertion (spec-pinned at zero across
    *    injected crashes).
    */
  def compactIndex(spark: SparkSession, indexDir: String, upToBatch: Long): Unit = {
    val prev = Manifests.read(indexDir)
    require(prev.forall(_.upTo <= upToBatch),
      s"compactIndex($upToBatch) below the committed horizon ${prev.map(_.upTo)}")
    val (gen, segRel) = Manifests.nextSegment(prev)
    // stored band keys (+ the v3 geometry stamp) survive compaction —
    // they are a pure function of sh, so carrying them is a copy, not a
    // recompute; dropDuplicates collapses any legacy duplicate slots
    readIndex(spark, indexDir, upToBatch + 1)
      .dropDuplicates("doc")
      .write.mode("overwrite").parquet(s"$indexDir/$segRel")
    Manifests.commit(indexDir, Manifests.Manifest(gen, segRel, upToBatch))
    // GC — everything below is invisible from the commit on
    val fs = Manifests.fsFor(new org.apache.hadoop.fs.Path(indexDir))
    prev.foreach { m =>
      fs.delete(new org.apache.hadoop.fs.Path(indexDir, m.dir), true); ()
    }
    batchPartitions(indexDir).filter(_._1 <= upToBatch)
      .foreach { p => fs.delete(p._2, true); () }
  }

  /** Index health probe — DEMOTED to a regression assertion by the
    * round-17 atomic manifest commit: a doc id visible more than once is
    * now structurally impossible (readers resolve the compaction horizon
    * through one atomically-swapped pointer), so the spec pins this at
    * zero across injected crashes instead of operators polling it.
    * Counts over the VISIBLE store (manifest segment + live partitions
    * above the horizon — superseded dirs a crashed GC left behind don't
    * count, because readers can't see them). */
  def duplicateDocs(spark: SparkSession, indexDir: String): Long =
    readIndex(spark, indexDir, Long.MaxValue)
      .groupBy(col("doc")).count().filter(col("count") > 1).count()

  // store-dir walking routes through Hadoop's FileSystem (the Manifests
  // resolution point), so the index store works on file:/HDFS/cloud
  // schemes alike — the round-17 java.io.File walk was local-only
  private def batchPartitions(
      indexDir: String): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = Manifests.fsFor(root)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("batch_id=") =>
        (st.getPath.getName.stripPrefix("batch_id=").toLong, st.getPath)
    }
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

  /** The stored counts rows with `batch_id < belowBatch`, manifest-aware
    * ([[Manifests]] — the readIndex convention applied to the counts
    * store): a compacted store resolves rows at or below the horizon
    * from its committed SUMMED segment (exact, because counts are
    * additive per piece), later batches from the live `batch_id=N`
    * partitions. `belowBatch` must be above the horizon — compaction
    * folds only epochs no resumed stream can re-price
    * ([[compactCounts]]). */
  def readCounts(
      spark: SparkSession, countsDir: String, belowBatch: Long): DataFrame = {
    Manifests.read(countsDir) match {
      case Some(m) =>
        require(belowBatch > m.upTo,
          s"readCounts(< $belowBatch) is below the compaction horizon " +
            s"${m.upTo} — compact only epochs no reader re-prices")
        val seg = spark.read.parquet(s"$countsDir/${m.dir}")
          .select(col("piece"), col("cnt"))
        // a fully-folded store has no live partitions left — the root
        // scan would fail schema inference, so list before reading
        val later = batchPartitions(countsDir).map(_._1)
          .filter(b => b > m.upTo && b < belowBatch)
        if (later.isEmpty) seg
        else seg.unionByName(spark.read.parquet(countsDir)
          .filter(col("batch_id") > m.upTo && col("batch_id") < belowBatch)
          .select(col("piece"), col("cnt")))
      case None =>
        spark.read.parquet(countsDir)
          .filter(col("batch_id") < belowBatch) // seed (-1) included
          .select(col("piece"), col("cnt"))
    }
  }

  /** COMPACT the stored counts table: fold every partition with
    * `batch_id <= upToBatch` into ONE summed segment (exact — the
    * refresh algebra is additive long sums per piece, so fold-then-fold
    * ≡ fold) and commit it through the [[Manifests]] atomic pointer,
    * then GC the folded partitions — the maintenance job that keeps the
    * refresh fold from scanning one small partition per micro-batch
    * forever. The crash contract is [[compactIndex]]'s verbatim
    * (uncommitted segments invisible, the commit is one atomic pointer
    * swap, GC touches only post-commit-invisible dirs).
    *
    * Call it only for epochs no resumed stream will re-price: the
    * refresh reads counts `< epoch·refreshEvery` for the CURRENT epoch
    * onward, so `upToBatch` must sit strictly below the next batch's
    * epoch boundary (e.g. while the query is stopped,
    * `upToBatch < (nextBatch / refreshEvery) · refreshEvery`).
    * [[refreshedLm]] resolves through the manifest and is bit-identical
    * before/after (spec-pinned). */
  def compactCounts(
      spark: SparkSession, countsDir: String, upToBatch: Long): Unit = {
    val prev = Manifests.read(countsDir)
    require(prev.forall(_.upTo <= upToBatch),
      s"compactCounts($upToBatch) below the committed horizon ${prev.map(_.upTo)}")
    val (gen, segRel) = Manifests.nextSegment(prev)
    readCounts(spark, countsDir, upToBatch + 1)
      .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
      .write.mode("overwrite").parquet(s"$countsDir/$segRel")
    Manifests.commit(countsDir, Manifests.Manifest(gen, segRel, upToBatch))
    // GC — everything below is invisible from the commit on
    val fs = Manifests.fsFor(new org.apache.hadoop.fs.Path(countsDir))
    prev.foreach { m =>
      fs.delete(new org.apache.hadoop.fs.Path(countsDir, m.dir), true); ()
    }
    batchPartitions(countsDir).filter(_._1 <= upToBatch)
      .foreach { p => fs.delete(p._2, true); () }
  }

  /** The LM epoch in force at batch `boundary·refreshEvery`: fold the
    * seed counts with every kept-batch delta below `upToBatch` and
    * re-price — bit-identical to [[TextPipeline.unigramRefreshModel]]
    * over the same partitions (spec-pinned), but as ONE partition-pruned
    * scan + ONE vocabulary-bounded collect instead of a two-input
    * full-outer merge: counts are additive per piece, so the seed
    * partition and the deltas fold in a single groupBy, and the Laplace
    * M-step arithmetic (`floor(1e6·ln((c+1)/(T+V)) + 0.5)`) runs
    * driver-side over the collected vocabulary with the exact operators
    * Spark's `log`/`floor` evaluate (`java.lang.Math.log`, floor+0.5
    * round-half-up). Reads through [[readCounts]], so a compacted store
    * ([[compactCounts]]) re-prices bit-identically. */
  def refreshedLm(
      spark: SparkSession, countsDir: String, upToBatch: Long,
      countingLm: TextPipeline.UnigramModel): TextPipeline.UnigramModel = {
    val folded = readCounts(spark, countsDir, upToBatch)
      .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val t = folded.iterator.map(_._2).sum
    val v = folded.length.toLong
    TextPipeline.UnigramModel(
      folded.iterator.map { case (p, c) =>
        p -> math.floor(1e6 * math.log((c + 1.0) / (t + v).toDouble) + 0.5).toLong
      }.toMap,
      countingLm.maxPieceLen)
  }

  // epoch models are pure functions of (countsDir, epoch) over FINALIZED
  // partitions, so the memo is retry/restart-safe: a restarted stream
  // rebuilds each epoch from storage on first use. Keyed by dir — tests
  // and concurrent funnels with distinct dirs never collide; reusing one
  // dir for a NEW seed requires clearRefreshMemo().
  private val lmMemo = scala.collection.concurrent.TrieMap
    .empty[(String, Long), TextPipeline.UnigramModel]

  // per-word segmentations under the FROZEN counting model (a pure
  // per-word function, so memoizing is caching, never state): the counts
  // fold below runs the SQL DP only for words this stream has not
  // segmented yet — the driver-memo twin of the stored segDir table.
  // Keyed by countsDir like lmMemo (one frozen counter per stream).
  private val segMemo = scala.collection.concurrent.TrieMap
    .empty[(String, String), Seq[String]]

  def clearRefreshMemo(): Unit = { lmMemo.clear(); segMemo.clear() }

  /** Per-word piece segmentations under the frozen counter for exactly
    * `words`, via memo + the SQL DP ([[TextPipeline.unigramSegments]])
    * for the not-yet-seen remainder (often empty after the first batch —
    * Zipfian arrival). */
  private def segmentsFor(
      spark: SparkSession, countsDir: String, words: Seq[String],
      countingLm: TextPipeline.UnigramModel): Map[String, Seq[String]] = {
    val missing = words.filterNot(w => segMemo.contains((countsDir, w)))
    if (missing.nonEmpty) {
      import spark.implicits._
      TextPipeline.unigramSegments(missing.toDF("w"), countingLm)
        .collect().foreach { r =>
          segMemo.put((countsDir, r.getString(0)), r.getSeq[String](1)); ()
        }
    }
    words.map(w => w -> segMemo((countsDir, w))).toMap
  }

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
      val (decisions, deltaIndex, evaluated) =
        CurationFunnel.decideFull(batch, textCol, idCol, base, model)
      // The batch's three stored artifacts — decision log, index
      // partition, counts partition — are independent idempotent
      // per-batch overwrites, so their jobs run CONCURRENTLY: the wall
      // clock pays max(decisions, index, counts) instead of their sum
      // (the decide() phases are stage-barrier-bound, not compute-bound,
      // and the shared inputs are all persisted and already materialized
      // by decide()'s serve-table collect, so the concurrent jobs read
      // caches, never duplicate the scan). Failure of ANY write fails
      // the batch before the checkpoint commits, and a retry overwrites
      // all three partitions — the exact recovery contract the
      // sequential order had (retry-idempotence spec-pinned). The counts
      // future re-enters the batch's cache scope explicitly (the ambient
      // scope is thread-local and pooled executor threads don't inherit
      // it; the other two futures never persist).
      //
      // Kept ids for the counts fold come from the SAME decisions frame
      // being written (its inputs are all persisted, so the filter is a
      // cache projection — no parquet round-trip; a retry recomputes
      // decide() wholesale, so this reads exactly what a retry would),
      // and the kept TEXT from decide()'s persisted evaluated frame,
      // segmented under the frozen counter.
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      val writes = Seq(
        Future(decisions.write.mode("overwrite")
          .parquet(s"$outDir/batch_id=$batchId")),
        Future(deltaIndex.write.mode("overwrite")
          .parquet(s"$indexDir/batch_id=$batchId")),
        // re-enter the cache scope on the pooled thread: the segDir
        // branch persists its word-count frame and must register it here
        Future(Dedup.inScope(scope) {
          writeKeptCounts(decisions, evaluated, textCol, idCol, model0,
            countsDir, batchId, segDir)
        }))
      writes.foreach(Await.result(_, Duration.Inf))
    } finally Dedup.releaseScope(scope)
  }

  /** The per-batch counts fold (split out of [[processBatchWithRefresh]]
    * so the profiling harness can clock it in isolation). */
  private[graft] def writeKeptCounts(
      decisions: DataFrame, evaluated: DataFrame,
      textCol: String, idCol: String, model0: CurationFunnel.FunnelModel,
      countsDir: String, batchId: Long, segDir: Option[String]): Unit = {
    val spark = decisions.sparkSession
    val keptIds = decisions.filter(col("keep")).select(col("doc").as(idCol))
    val wordCounts = evaluated
      .join(broadcast(keptIds), Seq(idCol), "left_semi")
      .select(explode(
        graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    segDir match {
        case None =>
          // direct path: batch-VOCABULARY-bounded collect (the same
          // contract as decide()'s serve table and the dupIds broadcast),
          // per-word segmentations from the memoized SQL DP
          // ([[segmentsFor]] — batch 1 onward usually pays zero DP under
          // Zipfian arrival), and the per-piece totals assembled
          // driver-side in exact long arithmetic — one small write, no
          // exchange, no per-batch DP job. Bit-identical to
          // [[TextPipeline.unigramCountsFromWordTotals]] (spec-pinned):
          // same word totals, same DP pieces, same OOV drop, same
          // zero-fill over the closed vocabulary.
          val totals = wordCounts.collect()
            .map(r => (r.getString(0), r.getLong(1)))
          val segs = segmentsFor(spark, countsDir, totals.map(_._1), model0.lm)
          val pieceCounts =
            scala.collection.mutable.HashMap.empty[String, Long]
          totals.foreach { case (w, f) =>
            segs(w).foreach { p =>
              if (model0.lm.scores.contains(p)) // OOV pieces dropped
                pieceCounts.update(p, pieceCounts.getOrElse(p, 0L) + f)
            }
          }
          import spark.implicits._
          model0.lm.scores.keysIterator.toSeq.sorted
            .map(p => (p, pieceCounts.getOrElse(p, 0L)))
            .toDF("piece", "cnt")
            .write.mode("overwrite").parquet(s"$countsDir/batch_id=$batchId")
        case Some(sd) =>
          // incremental vocabulary path ([[seedSegments]]): DP only the
          // words the stored table has never seen, append them as this
          // batch's partition (idempotent overwrite, `< batchId` read —
          // the index discipline; manifest-aware via [[readSegments]]),
          // resolve counts through the table. Bit-identical to the
          // direct path (spec-pinned): the coalesce fallback in
          // unigramCountsFromSegments self-heals any gap.
          val wc = Dedup.persistTracked(wordCounts)
          val stored = readSegments(spark, sd, batchId)
          TextPipeline.unigramSegments(
              wc.join(stored.select(col("w")), Seq("w"), "left_anti"),
              model0.lm)
            .write.mode("overwrite").parquet(s"$sd/batch_id=$batchId")
          TextPipeline.unigramCountsFromSegments(
            wc, readSegments(spark, sd, batchId + 1), model0.lm)
            .write.mode("overwrite").parquet(s"$countsDir/batch_id=$batchId")
    }
  }

  /** The stored word-segmentation rows with `batch_id < belowBatch`,
    * manifest-aware (the [[readCounts]] convention applied to the segDir
    * store): a compacted store resolves words at or below the horizon
    * from its committed deduplicated segment, later batches live. */
  def readSegments(
      spark: SparkSession, segDir: String, belowBatch: Long): DataFrame =
    Manifests.read(segDir) match {
      case Some(m) =>
        require(belowBatch > m.upTo,
          s"readSegments(< $belowBatch) is below the compaction horizon " +
            s"${m.upTo} — compact only completed batches")
        val seg = spark.read.parquet(s"$segDir/${m.dir}")
          .select(col("w"), col("ps"))
        val later = batchPartitions(segDir).map(_._1)
          .filter(b => b > m.upTo && b < belowBatch)
        if (later.isEmpty) seg
        else seg.unionByName(spark.read.parquet(segDir)
          .filter(col("batch_id") > m.upTo && col("batch_id") < belowBatch)
          .select(col("w"), col("ps")))
      case None =>
        spark.read.parquet(segDir)
          .filter(col("batch_id") < belowBatch) // seed (-1) included
          .select(col("w"), col("ps"))
    }

  /** COMPACT the stored segmentation table: fold every partition with
    * `batch_id <= upToBatch` into ONE deduplicated segment committed
    * through the [[Manifests]] pointer, then GC the folded partitions —
    * [[compactCounts]]' crash contract verbatim. Exact by construction:
    * segmentation under the frozen counter is a PURE per-word function
    * (and the per-batch anti-join already makes words unique across
    * partitions), so dropDuplicates is a no-op copy, not a merge.
    * Call it only for completed batches, like [[compactIndex]]. */
  def compactSegments(
      spark: SparkSession, segDir: String, upToBatch: Long): Unit = {
    val prev = Manifests.read(segDir)
    require(prev.forall(_.upTo <= upToBatch),
      s"compactSegments($upToBatch) below the committed horizon ${prev.map(_.upTo)}")
    val (gen, segRel) = Manifests.nextSegment(prev)
    readSegments(spark, segDir, upToBatch + 1)
      .dropDuplicates("w")
      .write.mode("overwrite").parquet(s"$segDir/$segRel")
    Manifests.commit(segDir, Manifests.Manifest(gen, segRel, upToBatch))
    // GC — everything below is invisible from the commit on
    val fs = Manifests.fsFor(new org.apache.hadoop.fs.Path(segDir))
    prev.foreach { m =>
      fs.delete(new org.apache.hadoop.fs.Path(segDir, m.dir), true); ()
    }
    batchPartitions(segDir).filter(_._1 <= upToBatch)
      .foreach { p => fs.delete(p._2, true); () }
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

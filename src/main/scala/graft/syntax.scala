package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{EwmaFunctions, TextFunctions => T, VectorFunctions => V}
import graft.operators.{Dedup, Multimodal, Similarity, Skew}

/** Fluent user API: `import graft.syntax._` and chain the engine's
  * operators off any DataFrame. Thin forwarding only — every method
  * delegates to the tested operator objects, so plans and semantics are
  * identical to the explicit calls.
  *
  * {{{
  *   import graft.syntax._
  *   docs.nearDupPairsMinhash("text", "doc_id")        // LSH + verify
  *   docs.keepOnePerCluster("doc_id", pairs)           // CC dedup
  *   emb.cosineTopK(queries, "embedding", "vec_id", 10)
  *   events.windowedEwma("event_type", "ts", "tsl", "event_id", "value", 300)
  *   df.withTextStats("text")
  * }}}
  */
object syntax {

  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    // ------------------------------------------------------------- dedup
    def dedupExact(keyCol: String, idCol: String): DataFrame =
      Dedup.exact(df, keyCol, idCol)

    def nearDupPairsJaccard(
        textCol: String, idCol: String,
        shingleK: Int = 5, threshold: Double = 0.8, maxDf: Int = 1000): DataFrame =
      Dedup.ngramJaccardPairs(df, textCol, idCol, shingleK, threshold, maxDf)

    def nearDupPairsMinhash(
        textCol: String, idCol: String,
        shingleK: Int = 5, threshold: Double = 0.8,
        bands: Int = 16, rowsPerBand: Int = 4): DataFrame =
      Dedup.minhashNearDups(df, textCol, idCol, shingleK, threshold, bands, rowsPerBand)

    def nearDupPairsSimhash(
        textCol: String, idCol: String, maxHamming: Int = 3): DataFrame =
      Dedup.simhashNearDups(df, textCol, idCol, maxHamming)

    def nearDupPairsEmbedding(
        vecCol: String, idCol: String,
        threshold: Double = 0.95, bucketed: Boolean = false): DataFrame =
      Dedup.embeddingNearDups(df, vecCol, idCol, threshold, bucketed)

    /** Annotate with (component, keep): one representative per near-dup
      * cluster; filter on `keep` to materialize the deduped corpus.
      */
    def keepOnePerCluster(idCol: String, pairs: DataFrame): DataFrame =
      Dedup.keepRepresentatives(df, idCol, pairs)

    /** STREAMING near-dup candidates: on a streaming frame, emits
      * (id_a, id_b) LSH collisions against every previously-seen doc
      * (per-bucket state; see [[graft.streaming.StreamingLshDedup]]).
      */
    def nearDupCandidatesStream(
        textCol: String, idCol: String,
        shingleK: Int = 5, bands: Int = 16, rowsPerBand: Int = 4): DataFrame =
      graft.streaming.StreamingLshDedup
        .candidates(df, textCol, idCol, shingleK, bands, rowsPerBand).toDF()

    // -------------------------------------------------------- similarity
    def cosineTopK(queries: DataFrame, vecCol: String, idCol: String, k: Int): DataFrame =
      Similarity.bruteForceTopK(queries, df, vecCol, idCol, k)

    def cosineTopKLsh(
        queries: DataFrame, vecCol: String, idCol: String, k: Int,
        bits: Int = 16, probeHamming: Int = 6): DataFrame =
      Similarity.lshTopK(queries, df, vecCol, idCol, k, bits, probeHamming)

    def cosineTopKIvf(
        queries: DataFrame, vecCol: String, idCol: String, k: Int,
        nClusters: Int = 8, nProbe: Int = 2): DataFrame =
      Similarity.ivfKmeansTopK(queries, df, vecCol, idCol, k, nClusters, nProbe)

    // ------------------------------------------- embedding-space curation
    def semDedup(vecCol: String, idCol: String, eps: Double = 0.97,
        nClusters: Int = 8, iters: Int = 3): DataFrame =
      graft.operators.EmbeddingCuration.semDedup(df, vecCol, idCol, eps, nClusters, iters)

    def prototypicality(
        vecCol: String, idCol: String, nClusters: Int = 8, iters: Int = 3): DataFrame =
      graft.operators.EmbeddingCuration.prototypicality(df, vecCol, idCol, nClusters, iters)

    def tokenBudgetSelect(idCol: String, scoreCol: String, tokensCol: String,
        budget: Long, bucketScale: Double = 1.0): DataFrame =
      graft.operators.Curation.tokenBudgetSelect(df, idCol, scoreCol, tokensCol, budget, bucketScale)

    // --------------------------------------------------------------- text
    /** Token/char counts, BPE-ish subword count, quality score, language. */
    def withTextStats(textCol: String): DataFrame =
      df.withColumn("__tok", T.tokens(col(textCol)))
        .withColumn("n_tokens", size(col("__tok")).cast("bigint"))
        .withColumn("n_chars", length(col(textCol)).cast("bigint"))
        .withColumn("n_bpeish", T.bpeishTokenCount(col(textCol)).cast("bigint"))
        .withColumn("quality", T.qualityScoreFromTokens(col(textCol), col("__tok")))
        .withColumn("lang_pred", T.langIdFromTokens(col("__tok")))
        .drop("__tok")

    def withFingerprints(textCol: String): DataFrame =
      df.withColumn("fingerprint", T.rollingFingerprint(col(textCol)))
        .withColumn("simhash", T.simhash64(col(textCol)))

    def redactPii(textCol: String): DataFrame =
      df.withColumn(textCol, T.redactPii(col(textCol)))

    def repetitionScores(textCol: String, idCol: String): DataFrame =
      graft.operators.TextPipeline.repetitionScores(df, textCol, idCol)

    /** Rows of this corpus contaminated by (sharing k-shingles with) the
      * probe set — run before training, drop what it returns.
      */
    def contaminatedBy(
        probes: DataFrame, textCol: String, idCol: String,
        shingleK: Int = 5, minShared: Int = 1): DataFrame =
      graft.operators.TextPipeline.contaminated(df, probes, textCol, idCol, shingleK, minShared)

    /** [[contaminatedBy]] via a bloom filter built from the probe set —
      * MAP-ONLY on this corpus (no shuffle/join; one-sided error), the
      * 100 TB screening shape. Works on streaming frames via
      * `TextPipeline.bloomWords` + `bloomProbe` directly.
      */
    def bloomContaminatedBy(
        probes: DataFrame, textCol: String, idCol: String,
        shingleK: Int = 5, minShared: Int = 1): DataFrame =
      graft.operators.TextPipeline.bloomContaminated(
        df, probes, textCol, idCol, shingleK, minShared)

    // ---------------------------------------------------------- data prep
    /** Deterministic md5-bucket train/test split (adds bucket + split). */
    def hashSplit(idCol: String, trainBps: Int = 8000): DataFrame =
      graft.operators.DataPrep.hashSplit(df, idCol, trainBps)

    /** Sliding context-window chunks of `chunkSize` tokens every `stride`. */
    def chunkTokens(
        textCol: String, idCol: String,
        chunkSize: Int = 64, stride: Int = 48): DataFrame =
      graft.operators.DataPrep.chunkTokens(df, textCol, idCol, chunkSize, stride)

    /** Cumulative-offset packing into ~`budget`-token packs per group. */
    def packSequences(
        textCol: String, idCol: String, groupCol: String,
        budget: Int = 512): DataFrame =
      graft.operators.DataPrep.packSequences(df, textCol, idCol, groupCol, budget)

    /** Top-k TF-IDF terms per document. */
    def tfidfTopTerms(textCol: String, idCol: String, k: Int = 5): DataFrame =
      graft.operators.DataPrep.tfidfTopTerms(df, textCol, idCol, k)

    // ---------------------------------------------------------- curation
    def gopherFilter(
        textCol: String, idCol: String,
        minWords: Int = 50, maxWords: Int = 100000): DataFrame =
      graft.operators.Curation.gopherRules(df, textCol, idCol, minWords, maxWords)

    def corpusShards(idCol: String, nShards: Int = 64): DataFrame =
      graft.operators.Curation.corpusShards(df, idCol, nShards)

    def dupSpans(
        textCol: String, idCol: String,
        gramLen: Int = 32, stride: Int = 8): DataFrame =
      graft.operators.Curation.dupSpans(df, textCol, idCol, gramLen, stride)

    def removeDupSpans(textCol: String, idCol: String, gramLen: Int = 32): DataFrame =
      graft.operators.Curation.removeDupSpans(df, textCol, idCol, gramLen)

    /** Line-level exact dedup: a >= minLen-char line survives only at its
      * corpus-wide first occurrence (smallest doc, then line index).
      */
    def dedupLines(textCol: String, idCol: String, minLen: Int = 20): DataFrame =
      graft.operators.Curation.dedupLines(df, textCol, idCol, minLen)

    def importanceWeights(textCol: String, idCol: String, targetPred: Column): DataFrame =
      graft.operators.Curation.importanceWeights(df, textCol, idCol, targetPred)

    /** CCNet-style bigram-LM quality score: average NLL (micro units)
      * under an add-1 bigram model trained on the targetPred slice.
      */
    def lmQualityScores(textCol: String, idCol: String, targetPred: Column): DataFrame =
      graft.operators.Curation.bigramNll(df, textCol, idCol, targetPred)

    def heavyHitters(
        textCol: String, idCol: String,
        depth: Int = 4, width: Int = 1024, minCount: Long = 100L): DataFrame =
      graft.operators.Curation.cmsHeavyHitters(df, textCol, idCol, depth, width, minCount)

    def groupHashSample(idCol: String, groupCol: String, k: Int = 10): DataFrame =
      graft.operators.Curation.groupHashSample(df, idCol, groupCol, k)

    // --------------------------------------------------------- multimodal
    def withBinaryPayload(textCol: String = "text"): DataFrame =
      Multimodal.withBinary(df, textCol)

    def sampleFrames(frameBytes: Int): DataFrame =
      Multimodal.sampleFrames(df, frameBytes)

    // ------------------------------------------------------------- joins
    def saltedJoinOn(
        small: DataFrame, key: String, discriminator: Column,
        salts: Int, joinType: String = "inner"): DataFrame =
      Skew.saltedJoin(df, small, key, discriminator, salts, joinType)

    // ------------------------------------------------------------- ewma
    /** Per-key zero-seeded EWMA in (ts, seq) order (reference semantics). */
    def ewmaByKey(
        keyCol: String, tsCol: String, seqCol: String, valueCol: String,
        periodSeconds: Long): DataFrame = {
      val alpha = EwmaFunctions.alpha(periodSeconds)
      df.groupBy(col(keyCol))
        .agg(EwmaFunctions.ewmaOrdered(
          col(tsCol), col(seqCol), col(valueCol), alpha).as("ewma"))
        .filter(col("ewma") > 0)
    }

    /** Event-time windowed EWMA (batch form; streaming form in
      * [[graft.streaming.EwmaPipeline]]).
      */
    def windowedEwma(
        keyCol: String, eventTimeCol: String, tsCol: String,
        seqCol: String, valueCol: String, periodSeconds: Long): DataFrame =
      graft.streaming.EwmaPipeline.windowedEwmaBatch(
        df, keyCol, eventTimeCol, tsCol, seqCol, valueCol, periodSeconds)

    // ------------------------------------------------------------ vectors
    def withCosineTo(other: Column, vecCol: String): DataFrame =
      df.withColumn("cosine", V.cosine(V.asDouble(col(vecCol)), other))

    // -------------------------------------------------- curation (round 6)
    def removeBoilerplate(textCol: String, idCol: String, groupCol: String,
        minLen: Int = 20, maxDocs: Long = 2): DataFrame =
      graft.operators.Curation.removeBoilerplate(df, textCol, idCol, groupCol, minLen, maxDocs)

    def weightedSample(idCol: String, weightCol: String, k: Int): DataFrame =
      graft.operators.Curation.weightedSample(df, idCol, weightCol, k)

    def temperatureMix(idCol: String, groupCol: String, targetFrac: Double = 0.5): DataFrame =
      graft.operators.Curation.temperatureMix(df, idCol, groupCol, targetFrac)

    def charEntropy(textCol: String, idCol: String): DataFrame =
      graft.operators.TextPipeline.charEntropy(df, textCol, idCol)

    def pmiCollocations(textCol: String, minCount: Long = 5, k: Int = 50): DataFrame =
      graft.operators.TextPipeline.pmiCollocations(df, textCol, minCount, k)

    def bpeTrain(textCol: String, nMerges: Int): DataFrame =
      graft.operators.TextPipeline.bpeTrain(df, textCol, nMerges)

    def bpeEncode(textCol: String, idCol: String, merges: Seq[(String, String)]): DataFrame =
      graft.operators.TextPipeline.bpeEncode(df, textCol, idCol, merges)

    // --------------------------------------------------- event analytics
    def funnel(userCol: String, typeCol: String, tsMicrosCol: String,
        steps: Seq[String], windowMicros: Long): DataFrame =
      graft.operators.EventAnalytics.funnel(df, userCol, typeCol, tsMicrosCol, steps, windowMicros)

    def sessionize(userCol: String, tsMicrosCol: String, idCol: String,
        gapMicros: Long): DataFrame =
      graft.operators.EventAnalytics.sessionize(df, userCol, tsMicrosCol, idCol, gapMicros)

    def rollingFeatures(userCol: String, tsMicrosCol: String, valueCol: String,
        idCol: String, lookbackMicros: Long): DataFrame =
      graft.operators.EventAnalytics.rollingCounts(
        df, userCol, tsMicrosCol, valueCol, idCol, lookbackMicros)

    def zscoreOutliers(groupCol: String, valueCol: String, idCol: String,
        z: Int = 3): DataFrame =
      graft.operators.EventAnalytics.zscoreOutliers(df, groupCol, valueCol, idCol, z)

    // --------------------------------------------------------- cdc / scd2
    def latestByKey(keyCol: String, tsCol: String, tieCol: String): DataFrame =
      graft.operators.ChangeCapture.latestByKey(df, keyCol, tsCol, tieCol)

    def applyChanges(changes: DataFrame, keyCol: String): DataFrame =
      graft.operators.ChangeCapture.applyChanges(df, changes, keyCol)

    def scd2Merge(changes: DataFrame, keyCol: String, tsMicrosCol: String,
        skipReapplied: Boolean = false): DataFrame =
      graft.operators.ChangeCapture.scd2Merge(df, changes, keyCol, tsMicrosCol, skipReapplied)

    // -------------------------------------------------------------- graph
    def pageRank(srcCol: String, dstCol: String, weightCol: String,
        iterations: Int = 3, dampPpm: Long = 850000L): DataFrame =
      graft.operators.Graph.pageRank(df, srcCol, dstCol, weightCol, iterations, dampPpm)

    def hits(srcCol: String, dstCol: String, iterations: Int = 3): DataFrame =
      graft.operators.Graph.hits(df, srcCol, dstCol, iterations)

    // ------------------------------------- round-10 continuation surface
    /** Asymmetric containment near-dup pairs — catches embedded docs
      * symmetric Jaccard misses. */
    def nearDupPairsContainment(
        textCol: String, idCol: String, shingleK: Int = 5,
        thresholdPpm: Long = 800000L, maxDf: Int = 1000): DataFrame =
      Dedup.containmentPairs(df, textCol, idCol, shingleK, thresholdPpm, maxDf)

    /** Per-doc fraction of shingles first seen in this doc — the
      * pair-free dedup prioritization signal. */
    def shingleNovelty(textCol: String, idCol: String, shingleK: Int = 5): DataFrame =
      Dedup.shingleNovelty(df, textCol, idCol, shingleK)

    /** Keep the BEST-scoring doc per near-dup cluster (ties → min id). */
    def keepBestPerCluster(idCol: String, scoreCol: String, pairs: DataFrame): DataFrame =
      Dedup.keepBestRepresentatives(df, idCol, scoreCol, pairs)

    /** Sliding-window chunks with overlap — the retrieval/RAG splitter. */
    def chunkWithOverlap(
        textCol: String, idCol: String, chunkLen: Int, stride: Int): DataFrame =
      graft.operators.Curation.chunkDocuments(df, textCol, idCol, chunkLen, stride)

    /** Hashing-trick feature vectors (signed md5 buckets, sparse rows). */
    def hashedFeatures(textCol: String, idCol: String, dim: Int = 1024): DataFrame =
      graft.operators.TextPipeline.hashedFeatures(df, textCol, idCol, dim)

    /** Pairwise Jensen-Shannon divergence between group vocabularies. */
    def jsDivergenceBySource(textCol: String, groupCol: String): DataFrame =
      graft.operators.TextPipeline.jsDivergencePairs(df, textCol, groupCol)

    /** Duplicate-image pairs by perceptual dHash over the payload column. */
    def imageNearDups(idCol: String, payloadCol: String = "payload",
        maxHamming: Int = 3, bands: Int = 4): DataFrame =
      graft.operators.Multimodal.dhashNearDups(df, idCol, payloadCol, maxHamming, bands)

    /** Okapi BM25 top-k retrieval against a (query_id, term) frame. */
    def bm25TopK(textCol: String, idCol: String, queries: DataFrame,
        k: Int = 10): DataFrame =
      graft.operators.TextPipeline.bm25TopK(df, textCol, idCol, queries, k)

    /** Fuse per-query rankings (query_id, doc, rank) by reciprocal rank. */
    def rrfFuse(kRrf: Int = 60, topK: Int = 10): DataFrame =
      graft.operators.TextPipeline.rrfFuse(df, kRrf, topK)

    /** MMR-diversified top-k of this corpus against a query frame. */
    def mmrTopK(queries: DataFrame, vecCol: String, idCol: String,
        candidates: Int = 20, k: Int = 5, lambdaMilli: Int = 700): DataFrame =
      graft.operators.Similarity.mmrTopK(queries, df, vecCol, idCol,
        candidates, k, lambdaMilli)

    /** Offline CUSUM changepoint per group over the daily value series. */
    def cusumChangepoint(tsCol: String, valueCol: String,
        groupCol: String): DataFrame =
      graft.operators.EventAnalytics.cusumChangepoint(df, tsCol, valueCol, groupCol)

    /** Online CUSUM drift alarms against a frozen refDays reference mean. */
    def onlineCusum(tsCol: String, valueCol: String, groupCol: String,
        refDays: Int = 10, slackMicro: Long = 2000000L,
        hMicro: Long = 10000000L): DataFrame =
      graft.operators.EventAnalytics.onlineCusum(df, tsCol, valueCol, groupCol,
        refDays, slackMicro, hMicro)

    /** STL-lite trend + weekly-seasonal + residual per group and day. */
    def stlDecompose(tsCol: String, valueCol: String,
        groupCol: String): DataFrame =
      graft.operators.EventAnalytics.stlDecompose(df, tsCol, valueCol, groupCol)

    /** Key-skew diagnostics report for a prospective join/agg key. */
    def keySkewReport(keyCol: String): DataFrame =
      graft.operators.Skew.keySkewReport(df, keyCol)

    /** Data-contract audit: one scan, all rule predicates. */
    def constraintAudit(keyCol: String, rules: Seq[(String, String)]): DataFrame =
      graft.operators.DataPrep.constraintAudit(df, keyCol, rules)

    /** Benford leading-digit audit of a positive measure column. */
    def benfordAudit(valueCol: String): DataFrame =
      graft.operators.DataPrep.benfordAudit(df, valueCol)

    /** Post-stratified ATE of arm 1 vs arm 0 across strata. */
    def stratifiedAte(armCol: String, stratumCol: String,
        valueCol: String): DataFrame =
      graft.operators.FeatureEng.stratifiedAte(df, armCol, stratumCol, valueCol)

    /** Laplace-noised eps-DP per-group counts (deterministic salt draw). */
    def dpNoisyCounts(groupCol: String, epsilonMicro: Long,
        salt: String): DataFrame =
      graft.operators.Privacy.dpNoisyCounts(df, groupCol, epsilonMicro, salt)

    /** Keyed snapshot diff of this frame (old) against `other` (new). */
    def snapshotDiff(other: DataFrame, keyCol: String,
        compareCols: Seq[String]): DataFrame =
      graft.operators.ChangeCapture.snapshotDiff(df, other, keyCol, compareCols)

    /** Autocorrelation of each group's daily series at lags 1..maxLag. */
    def acf(tsCol: String, valueCol: String, groupCol: String,
        maxLag: Int = 7): DataFrame =
      graft.operators.EventAnalytics.acf(df, tsCol, valueCol, groupCol, maxLag)

    /** Per-label centroid drift of this snapshot (old) vs `other` (new). */
    def centroidDrift(other: DataFrame, vecCol: String,
        labelCol: String): DataFrame =
      graft.operators.Similarity.centroidDrift(df, other, vecCol, labelCol)

    /** Mann-Kendall monotone-trend test + Theil-Sen slope per group. */
    def mannKendall(tsCol: String, valueCol: String,
        groupCol: String): DataFrame =
      graft.operators.EventAnalytics.mannKendall(df, tsCol, valueCol, groupCol)

    /** Seasonal-naive forecast backtest (MASE) per group. */
    def forecastBacktest(tsCol: String, valueCol: String, groupCol: String,
        seasonLag: Int = 7): DataFrame =
      graft.operators.EventAnalytics.forecastBacktest(
        df, tsCol, valueCol, groupCol, seasonLag)

    /** Binary-segmentation multi-changepoint segments per group. */
    def binarySegmentation(tsCol: String, valueCol: String, groupCol: String,
        maxSplits: Int = 2): DataFrame =
      graft.operators.EventAnalytics.binarySegmentation(
        df, tsCol, valueCol, groupCol, maxSplits)

    /** Good-Turing frequency-of-frequencies vocabulary audit. */
    def goodTuring(textCol: String, maxR: Int = 10): DataFrame =
      graft.operators.TextPipeline.goodTuring(df, textCol, maxR)

    /** JL ±1-projection distortion audit on consecutive-id probe pairs. */
    def jlDistortion(vecCol: String, idCol: String,
        planes: Seq[Seq[Double]]): DataFrame =
      graft.operators.Similarity.jlDistortion(df, vecCol, idCol, planes)

    /** Lorenz concentration curve of a non-negative measure per group. */
    def lorenzCurve(groupCol: String, valueCol: String,
        buckets: Int = 10): DataFrame =
      graft.operators.DataPrep.lorenzCurve(df, groupCol, valueCol, buckets)

    /** Spearman rank correlation of two measures per group. */
    def spearmanCorr(groupCol: String, xCol: String,
        yCol: String): DataFrame =
      graft.operators.FeatureEng.spearmanCorr(df, groupCol, xCol, yCol)

    /** Hill tail-index of a positive measure per group (k top stats). */
    def hillTailIndex(groupCol: String, valueCol: String,
        k: Int = 100): DataFrame =
      graft.operators.DataPrep.hillTailIndex(df, groupCol, valueCol, k)

    /** Basis-point-parameterized trimmed mean per group. */
    def trimmedMeanBps(groupCol: String, valueCol: String,
        loBps: Int = 500, hiBps: Int = 9500): DataFrame =
      graft.operators.DataPrep.trimmedMeanBps(df, groupCol, valueCol,
        loBps, hiBps)

    /** Hyndman seasonality/trend strength of each group's daily series. */
    def seasonalStrength(tsCol: String, valueCol: String,
        groupCol: String): DataFrame =
      graft.operators.EventAnalytics.seasonalStrength(
        df, tsCol, valueCol, groupCol)

    /** PACF of each group's daily series (exact Cramer determinants). */
    def pacf(tsCol: String, valueCol: String, groupCol: String,
        maxLag: Int = 5): DataFrame =
      graft.operators.EventAnalytics.pacf(
        df, tsCol, valueCol, groupCol, maxLag)

    /** Jackknife SE of the per-group ratio metric sum(num)/sum(den). */
    def jackknifeRatio(groupCol: String, numCol: String,
        denCol: String): DataFrame =
      graft.operators.FeatureEng.jackknifeRatio(df, groupCol, numCol, denCol)

    /** Cochran–Mantel–Haenszel stratified 2×2 test (0/1 arm + outcome). */
    def cmhTest(stratumCol: String, armCol: String,
        outcomeCol: String): DataFrame =
      graft.operators.FeatureEng.cmhTest(df, stratumCol, armCol, outcomeCol)

    /** McNemar paired test of two 0/1 correctness indicator columns. */
    def mcnemarTest(correctACol: String, correctBCol: String): DataFrame =
      graft.operators.ModelEval.mcnemarTest(df, correctACol, correctBCol)
  }
}

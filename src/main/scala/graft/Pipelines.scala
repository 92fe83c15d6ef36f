package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** The composed end-to-end pipelines Bench times — factored out so
  * tools.ScaleSmoke can run the IDENTICAL composition on a ×10 corpus
  * (the shared-scan shapes are exactly where a superlinear surprise
  * would hide; a re-implementation in the smoke would test the wrong
  * plan).
  */
object Pipelines {

  /** The end-to-end curation funnel (PipelineEndToEndSpec, benched as
    * pipeline_full): gopher gate → exact dedup → near-dup keep-one (ONE
    * materialized shingle index) → bloom decontaminate → shard compose.
    * Returns the sharded row count.
    */
  def fullCuration(spark: SparkSession, sfDir: String): Long = {
    val docs = Tables.table(spark, sfDir, "documents")
    val rules = operators.Curation.gopherRules(docs, "text", "doc_id",
      minWords = 20, maxWords = 100000)
    val gated = docs.join(
      rules.filter(col("f_words") && col("f_mean_len") && col("f_alpha"))
        .select(col("doc").as("doc_id")), Seq("doc_id"), "left_semi")
    val exactReps = operators.Dedup.exact(gated, "text", "doc_id")
    val collapsed = gated.join(
      exactReps.select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
    val index = operators.Dedup.buildShingleIndex(collapsed, "text", "doc_id", 5)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val pairs = operators.Dedup.minhashNearDupsFromIndex(index, 0.8)
      val kept = operators.Dedup.keepRepresentatives(collapsed, "doc_id", pairs)
        .filter(col("keep")).drop("component", "keep")
      val probes = docs.filter(col("doc_id") < 10)
      val words = operators.TextPipeline.bloomWords(probes, "text", "doc_id")
      val clean = kept.join(
        operators.TextPipeline.bloomProbe(kept, words, "text", "doc_id")
          .select(col("doc").as("doc_id")), Seq("doc_id"), "left_anti")
      operators.Curation.corpusShards(clean, "doc_id", nShards = 16).count()
    } finally index.unpersist(blocking = false)
  }

  /** The shared-index dedup composition (benched as
    * pipeline_dedup_shared): q31+q32+q39 the way a production pipeline
    * runs them — ONE corpus scan builds the shingle index, all three
    * passes consume it. Returns (jaccardPairs, minhashPairs, keptDocs).
    */
  def dedupShared(spark: SparkSession, sfDir: String): (Long, Long, Long) = {
    val docs = Tables.table(spark, sfDir, "documents")
    val index = operators.Dedup.buildShingleIndex(docs, "text", "doc_id", 5)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the minhash pair frame feeds BOTH the count and keepRepresentatives:
    // persist it (tiny — the near-dup pair set) or the LSH banding +
    // self-join over the index runs twice
    val mh = operators.Dedup.minhashNearDupsFromIndex(index, 0.8)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      index.count()
      val nJac = operators.Dedup.ngramJaccardPairsFromIndex(index, 0.8).count()
      val nMh = mh.count()
      val nKeep = operators.Dedup.keepRepresentatives(docs, "doc_id", mh)
        .filter(col("keep")).count()
      (nJac, nMh, nKeep)
    } finally {
      mh.unpersist(blocking = false)
      index.unpersist(blocking = false)
    }
  }

  /** The streaming daily-ingest front door end-to-end (benched as
    * pipeline_stream_funnel): seed the stored fingerprint index from the
    * accepted base (doc_id < 250), freeze the bloom + unigram-LM
    * artifacts, then replay the delta (doc_id >= 250) through the
    * foreachBatch funnel — gopher → stored-index dedup → bloom → LM —
    * with volume-bounded micro-batches. Returns (decisions, kept).
    */
  def streamFunnel(spark: SparkSession, sfDir: String): (Long, Long) =
    streamFunnel(spark, sfDir, funnelModel(spark, sfDir))

  /** The funnel's frozen artifacts (bloom over the probe suite, unigram
    * LM over the reference corpus) — built OUTSIDE the benched replay,
    * because the front door SERVES frozen models; training cost is
    * measured by its own entries (q278/q281-family).
    */
  def funnelModel(spark: SparkSession, sfDir: String)
      : operators.CurationFunnel.FunnelModel = {
    val docs = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    operators.CurationFunnel.FunnelModel(
      bloom = operators.TextPipeline.bloomModel(
        docs.filter(col("doc_id") < 10), "text", "doc_id",
        shingleK = 5, mBits = 1 << 16, kHashes = 4),
      lm = operators.TextPipeline.unigramTrainModel(
        docs, "text", maxPieceLen = 3, nSeed = 32, emRounds = 2),
      maxNllMicro = 3520000L)
  }

  /** The replay body: seed the stored index from the accepted base, then
    * stream the delta through the foreachBatch funnel under the given
    * frozen model. */
  def streamFunnel(
      spark: SparkSession, sfDir: String,
      model: operators.CurationFunnel.FunnelModel): (Long, Long) = {
    import java.nio.file.Files
    val docs = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val tmp = Files.createTempDirectory("graft-sfunnel-").toString
    try {
      graft.streaming.StreamingCurationFunnel.seedIndex(
        docs.filter(col("doc_id") < 250), "text", "doc_id", 5, s"$tmp/idx")
      docs.filter(col("doc_id") >= 250).write.parquet(s"$tmp/in")
      val stream = spark.readStream.schema(docs.schema)
        .option("maxBytesPerTrigger", (64L * 1024 * 1024).toString)
        .parquet(s"$tmp/in")
      val q = graft.streaming.StreamingCurationFunnel.run(
        stream, "text", "doc_id", model, s"$tmp/idx", s"$tmp/out", s"$tmp/ckpt")
      try q.processAllAvailable() finally q.stop()
      val dec = spark.read.parquet(s"$tmp/out")
      (dec.count(), dec.filter(col("keep")).count())
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  /** The metric-monitoring suite (benched as pipeline_monitor): the
    * per-(type, day) daily stats computed ONCE (persisted) feed ELEVEN
    * monitors — offline changepoint, online CUSUM alarms, STL, Mann-
    * Kendall, MASE backtest, binary segmentation, PACF, seasonal/trend
    * strength, Fano dispersion, and the round-13 randomness screens
    * (runs test, turning points). Returns the named row counts.
    */
  def monitorSuite(spark: SparkSession, sfDir: String): Seq[(String, Long)] = {
    val daily = operators.EventAnalytics.dailyStats(
        Tables.events(spark, sfDir), "ts", "value", "event_type")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      daily.count()
      monitorFrames(daily).map { case (name, df) => name -> df.count() }
    } finally daily.unpersist(blocking = false)
  }

  /** The eleven FromDaily monitors as (name, frame) pairs off ONE
    * prepared daily frame — the LITERAL composition [[monitorSuite]]
    * times, exposed so StreamingMonitorParitySpec can run the identical
    * suite off the streamed daily sink (batch and live monitors sharing
    * one body cannot drift).
    */
  def monitorFrames(daily: org.apache.spark.sql.DataFrame)
      : Seq[(String, org.apache.spark.sql.DataFrame)] = {
    import operators.EventAnalytics
    Seq(
      "changepoints" -> EventAnalytics.cusumChangepointFromDaily(daily),
      "alarms" -> EventAnalytics
        .onlineCusumFromDaily(daily, 10, 2000000L, 10000000L),
      "stl" -> EventAnalytics.stlDecomposeFromDaily(daily),
      "mk" -> EventAnalytics.mannKendallFromDaily(daily),
      "mase" -> EventAnalytics.forecastBacktestFromDaily(daily),
      "segs" -> EventAnalytics.binarySegmentationFromDaily(daily),
      "pacf" -> EventAnalytics.pacfFromAcf(
        EventAnalytics.acfFromDaily(daily, maxLag = 5)),
      "ss" -> EventAnalytics.seasonalStrengthFromDaily(daily),
      "fano" -> EventAnalytics.fanoFromDailyCounts(daily),
      "runs" -> EventAnalytics.runsTestFromDaily(daily),
      "turns" -> EventAnalytics.turningPointsFromDaily(daily))
  }
}

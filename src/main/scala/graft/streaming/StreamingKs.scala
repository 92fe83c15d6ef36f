package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ModelEval

/** Streaming distribution-drift monitoring with the two-sample
  * Kolmogorov-Smirnov distance: live event-time windows scored against an
  * offline reference distribution with the SAME integer KS arithmetic as
  * the batch test — the reduction is literally the shared
  * [[ModelEval.ksFromCounts]], so batch and stream cannot diverge
  * (StreamingKsSpec pins window-KS ≡ batch-KS on the replayed corpus).
  * The binning-free sibling of [[StreamingDrift]]: PSI needs bin-width
  * choices, KS does not — run both when auditing live feature skew.
  *
  * Same two-stage split as StreamingDrift, for the same reasons:
  *  1. [[windowValueCounts]] — the STREAMING stage: event-time windowed
  *     counts per (window, group, micro value) with a watermark, emitted
  *     on window close (append mode). State is the open windows' DISTINCT
  *     micro values per group — bounded by the score's resolution (the
  *     rocAuc argument), not by event volume; a monitor feeding KS a
  *     continuous raw measurement should quantize it upstream.
  *  2. [[ksOfCounts]] — the STATELESS reduction: merge closed windows
  *     with the broadcast reference counts (full-outer on value) and
  *     reduce with the shared batch arithmetic, in `foreachBatch` or
  *     over the sink table. The always-on job is stage 1; stage 2 is a
  *     cheap per-trigger reduction feeding alerts.
  */
object StreamingKs {

  /** Batch-side reference: per-(group, micro value) counts of the
    * baseline corpus — the KS analogue of
    * [[graft.operators.FeatureEng.referenceBins]].
    */
  def referenceValueCounts(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol).as("grp"),
        round(col(valueCol) * lit(1e6)).cast("bigint").as("sm"))
      .agg(count(lit(1)).as("c"))

  /** Event-time windowed per-value counts:
    * `(win_start_us, grp, sm, d)` per closed window. Quantizes exactly
    * like [[referenceValueCounts]] so the value grids line up.
    */
  def windowValueCounts(
      events: DataFrame, groupCol: String, valueCol: String, tsCol: String,
      windowDuration: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration).as("win"),
        col(groupCol).as("grp"),
        round(col(valueCol) * lit(1e6)).cast("bigint").as("sm"))
      .agg(count(lit(1)).as("d"))
      .select(unix_micros(col("win.start")).as("win_start_us"),
        col("grp"), col("sm"), col("d"))

  /** KS per (window, group) of closed-window value counts against a
    * [[referenceValueCounts]] table — stateless: the reference is
    * broadcast-joined onto every observed window, merged full-outer with
    * the window's own counts (a value seen on only one side counts 0 on
    * the other), and reduced with the SHARED batch arithmetic. Output
    * follows [[ModelEval.ksFromCounts]]: side a = reference, side b =
    * the window.
    */
  def ksOfCounts(valueCounts: DataFrame, refCounts: DataFrame): DataFrame =
    ModelEval.ksFromCounts(mergedCounts(valueCounts, refCounts),
      Seq("win_start_us", "grp"))

  /** The shared merge: every closed (window, group) full-outer-joined
    * with the broadcast reference on the micro value grid —
    * `(win_start_us, grp, sm, ca = reference, cb = window)`. Feeds
    * [[ksOfCounts]] AND [[StreamingRankSum.rankSumOfCounts]] (one
    * streamed histogram, two drift tests).
    */
  private[streaming] def mergedCounts(
      valueCounts: DataFrame, refCounts: DataFrame): DataFrame = {
    val wins = valueCounts.select(col("win_start_us"), col("grp")).distinct()
    // fresh attribute ids before the full-outer self-join — the
    // StreamingDrift.psiOfCounts conflicting-reference lesson
    val refExpanded = wins.join(broadcast(refCounts), Seq("grp"))
      .select(col("win_start_us").as("rw"), col("grp").as("rg"),
        col("sm").as("rs"), col("c").as("rc"))
    refExpanded
      .join(valueCounts,
        col("rw") === col("win_start_us") && col("rg") === col("grp") &&
          col("rs") === col("sm"),
        "full_outer")
      .select(
        coalesce(col("rw"), col("win_start_us")).as("win_start_us"),
        coalesce(col("rg"), col("grp")).as("grp"),
        coalesce(col("rs"), col("sm")).as("sm"),
        coalesce(col("rc"), lit(0L)).as("ca"),
        coalesce(col("d"), lit(0L)).as("cb"))
  }
}

/** Streaming LOCATION-drift monitoring with the Mann–Whitney rank-sum
  * test: the same two-stage split (and literally the same stage-1 feed)
  * as [[StreamingKs]] — [[StreamingKs.windowValueCounts]] streams the
  * per-(window, group, micro value) histogram, and this reduction runs
  * the SHARED [[ModelEval.rankSumFromCounts]] arithmetic per closed
  * window against the broadcast reference, so batch and stream cannot
  * diverge (StreamingRankSumSpec pins window ≡ batch). KS answers "did
  * the SHAPE change", rank-sum answers "did the LEVEL shift" — a drift
  * dashboard reads both off one streamed histogram.
  */
object StreamingRankSum {

  /** Rank-sum per (window, group) of closed-window value counts against
    * a [[StreamingKs.referenceValueCounts]] table — stateless; side a =
    * reference, side b = the window.
    */
  def rankSumOfCounts(valueCounts: DataFrame, refCounts: DataFrame): DataFrame =
    ModelEval.rankSumFromCounts(
      StreamingKs.mergedCounts(valueCounts, refCounts),
      Seq("win_start_us", "grp"))
}

/** Streaming INTEGRATED-drift monitoring with the Cramér–von Mises
  * criterion — the fourth reduction over the ONE streamed histogram
  * ([[StreamingKs.windowValueCounts]]): KS reads the sharpest local CDF
  * break, EMD the transport cost, rank-sum the level shift, and CvM the
  * accumulated squared gap — the slow-persistent-drift signature the
  * other three can each miss. Shares [[ModelEval.cvmFromCounts]]
  * verbatim, so batch and stream cannot diverge (StreamingCvmSpec).
  */
object StreamingCvm {

  /** CvM per (window, group) of closed-window value counts against a
    * [[StreamingKs.referenceValueCounts]] table — stateless; side a =
    * reference, side b = the window.
    */
  def cvmOfCounts(valueCounts: DataFrame, refCounts: DataFrame): DataFrame =
    ModelEval.cvmFromCounts(
      StreamingKs.mergedCounts(valueCounts, refCounts),
      Seq("win_start_us", "grp"))
}

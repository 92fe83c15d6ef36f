package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.FeatureEng

/** Streaming feature-drift monitoring: live event windows scored against
  * an offline reference distribution with the SAME PSI arithmetic as the
  * batch monitor ([[FeatureEng.psi]] — the reduction is literally the
  * shared `psiFromMerged`, so batch and stream cannot diverge;
  * StreamingDriftSpec pins window-PSI ≡ batch-PSI on the replayed
  * corpus).
  *
  * Two stages, split where Structured Streaming requires it:
  *  1. [[windowBinCounts]] — the STREAMING stage: event-time windowed
  *     counts per (window, group, value-bin) with a watermark; emits on
  *     window close (append mode). State is the open windows' bin
  *     counts — bins × groups × open windows, independent of event
  *     volume.
  *  2. [[psiOfCounts]] — the STATELESS reduction: merge a closed
  *     window's bins with the broadcast reference table (union of bins,
  *     +1 smoothing) and reduce to one PSI row per (window, group).
  *     Chaining it directly after stage 1 would be a second stateful
  *     aggregation on a stream (unsupported in append mode), so run it
  *     in `foreachBatch` over the closed windows — or over the memory
  *     sink, as the spec does. At 100 TB this split is also the right
  *     operational shape: stage 1 is the always-on job, stage 2 a cheap
  *     per-trigger reduction feeding alerts.
  */
object StreamingDrift {

  /** Event-time windowed value-bin counts: `(win_start_us, grp, bin, d)`
    * per closed window. `valueCol` quantizes exactly like the batch
    * monitor so the bins line up.
    */
  def windowBinCounts(
      events: DataFrame, groupCol: String, valueCol: String, tsCol: String,
      windowDuration: String, watermark: String,
      binWidthMicro: Long): DataFrame = {
    require(binWidthMicro > 0, "binWidthMicro must be positive")
    events
      .withColumn("__vm", graft.operators.DataPrep.micro(col(valueCol)))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration).as("win"),
        col(groupCol).as("grp"),
        expr(s"__vm DIV $binWidthMicro").as("bin"))
      .agg(count(lit(1)).as("d"))
      .select(unix_micros(col("win.start")).as("win_start_us"),
        col("grp"), col("bin"), col("d"))
  }

  /** PSI per (window, group) of closed-window bin counts against a
    * [[FeatureEng.referenceBins]] table — stateless: the reference is
    * broadcast-joined onto every observed window (bins × windows rows),
    * merged full-outer with the window's own bins, and reduced with the
    * SHARED batch arithmetic.
    */
  def psiOfCounts(binCounts: DataFrame, refBins: DataFrame): DataFrame = {
    val wins = binCounts.select(col("win_start_us"), col("grp")).distinct()
    // the ref side re-joins against its own source (wins derives from
    // binCounts), so its output must carry FRESH attribute ids — alias
    // every column before the full-outer self-join and use an explicit
    // condition, or Spark's conflicting-reference check fires
    val refExpanded = wins.join(broadcast(refBins), Seq("grp"))
      .select(col("win_start_us").as("rw"), col("grp").as("rg"),
        col("bin").as("rb"), col("c").as("rc"))
    val merged = refExpanded
      .join(binCounts,
        col("rw") === col("win_start_us") && col("rg") === col("grp") &&
          col("rb") === col("bin"),
        "full_outer")
      .select(
        coalesce(col("rw"), col("win_start_us")).as("win_start_us"),
        coalesce(col("rg"), col("grp")).as("grp"),
        coalesce(col("rb"), col("bin")).as("bin"),
        coalesce(col("rc"), lit(0L)).as("c"), coalesce(col("d"), lit(0L)).as("d"))
    FeatureEng.psiFromMerged(merged, Seq("win_start_us", "grp"))
  }
}

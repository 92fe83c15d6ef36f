package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ModelEval

/** Streaming filter-threshold monitoring: per event-time window, the
  * lowest score cutoff that still meets the precision target, with the
  * SAME integer arithmetic as the batch selector — the reduction is
  * literally the shared [[ModelEval.thresholdFromScoreCounts]], so batch
  * and stream cannot diverge (StreamingThresholdSpec pins window
  * thresholds ≡ batch per closed day). The operational question this
  * answers: a filter config was chosen from last month's corpus — is
  * that cutoff still right on TODAY's traffic, or has score drift moved
  * the operating point? ([[StreamingKs]] says the distribution moved;
  * this says what the move DOES to the deployed threshold.)
  *
  *  1. [[windowScoreCounts]] — the STREAMING stage: per (window, group,
  *     distinct micro score) label counts under a watermark, append on
  *     close. State is the open windows' distinct scores per group —
  *     bounded by score resolution (the rocAuc argument), not volume.
  *  2. [[thresholdOfCounts]] — the STATELESS reduction per closed
  *     window, in `foreachBatch` or over the sink table.
  */
object StreamingThreshold {

  /** Event-time windowed per-score label counts:
    * `(win_start_us, grp, sm, pos, cnt)` per closed window — the count
    * schema [[ModelEval.thresholdFromScoreCounts]] reduces. Labels must
    * be 0/1 (guarded like the batch path).
    */
  def windowScoreCounts(
      events: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String, tsCol: String, windowDuration: String,
      watermark: String): DataFrame = {
    val y = when(col(labelCol).cast("bigint").isin(0L, 1L),
        col(labelCol).cast("bigint"))
      .otherwise(raise_error(lit("windowScoreCounts: label must be 0/1")))
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration).as("win"),
        col(groupCol).as("grp"),
        round(col(scoreCol) * lit(1e6)).cast("bigint").as("sm"))
      .agg(sum(y).as("pos"), count(lit(1)).as("cnt"))
      .select(unix_micros(col("win.start")).as("win_start_us"),
        col("grp"), col("sm"), col("pos"), col("cnt"))
  }

  /** Per-window threshold selection over closed-window score counts —
    * the shared batch reduction scoped by window; stateless.
    */
  def thresholdOfCounts(counts: DataFrame, targetPpm: Long): DataFrame =
    ModelEval.thresholdFromScoreCounts(counts, targetPpm,
      scope = Seq("win_start_us"))
}

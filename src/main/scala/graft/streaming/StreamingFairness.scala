package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ModelEval

/** Streaming fairness monitoring: live event-time windows of classifier
  * decisions audited for demographic-parity / equalized-odds gaps with
  * the SAME integer arithmetic as the batch audit — the reduction is
  * literally the shared [[ModelEval.fairnessFromCounts]], so batch and
  * stream cannot diverge (StreamingFairnessSpec pins window-gaps ≡
  * batch-gaps per closed day on the replayed corpus). The [[StreamingKs]]
  * / [[StreamingDrift]] two-stage shape, because a disparity that opens
  * up INSIDE a deployment window is exactly what a daily batch audit
  * smears away:
  *
  *  1. [[windowCohortCounts]] — the STREAMING stage: per (event-time
  *     window, cohort) confusion counts under a watermark, emitted on
  *     window close (append mode). State is the open windows' cohort
  *     cells — bounded by cohorts × open windows, independent of event
  *     volume.
  *  2. [[gapsOfCounts]] — the STATELESS reduction: the shared batch
  *     arithmetic scoped per window, run in `foreachBatch` or over the
  *     sink table, feeding alerts.
  */
object StreamingFairness {

  /** Event-time windowed per-cohort confusion counts:
    * `(win_start_us, grp, n, n_sel, n_pos, n_tp, n_fp)` per closed
    * window — the count schema [[ModelEval.fairnessFromCounts]] reduces.
    */
  def windowCohortCounts(
      events: DataFrame, protectedCol: String, labelCol: String,
      predCol: String, tsCol: String, windowDuration: String,
      watermark: String): DataFrame = {
    val bit = (c: String, n: String) =>
      when(col(c).cast("bigint").isin(0L, 1L), col(c).cast("bigint"))
        .otherwise(raise_error(lit(s"windowCohortCounts: $n must be 0/1")))
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration).as("win"),
        col(protectedCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(bit(predCol, "pred")).as("n_sel"),
        sum(bit(labelCol, "label")).as("n_pos"),
        sum(bit(labelCol, "label") * bit(predCol, "pred")).as("n_tp"),
        sum((lit(1L) - bit(labelCol, "label")) * bit(predCol, "pred"))
          .as("n_fp"))
      .select(unix_micros(col("win.start")).as("win_start_us"),
        col("grp"), col("n"), col("n_sel"), col("n_pos"), col("n_tp"),
        col("n_fp"))
  }

  /** Per-window fairness gaps of closed-window cohort counts — the
    * shared batch reduction scoped by window; stateless.
    */
  def gapsOfCounts(counts: DataFrame): DataFrame =
    ModelEval.fairnessFromCounts(counts, scope = Seq("win_start_us"))
}

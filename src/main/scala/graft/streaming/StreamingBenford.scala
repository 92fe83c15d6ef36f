package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.DataPrep

/** Streaming Benford leading-digit monitoring: live event-time windows of
  * a positive measure scored against the log₁₀(1 + 1/d) expectation with
  * the SAME integer arithmetic as the batch audit — the reduction is
  * literally the shared [[DataPrep.benfordOfCounts]] and the digit
  * extraction the shared [[DataPrep.leadingDigit]], so batch and stream
  * cannot diverge (StreamingBenfordSpec pins window ≡ batch per closed
  * window on the replayed corpus). A live TV spike says the measure's
  * magnitude mix changed — fee capping, unit mangling, a partner feed
  * going synthetic — hours before a batch audit would.
  *
  * Same two-stage split as StreamingKs/StreamingDrift, same reasons:
  *  1. [[windowDigitCounts]] — the STREAMING stage: event-time windowed
  *     counts per (window, digit) with a watermark, emitted on window
  *     close (append mode). State per open window is AT MOST 9 digit
  *     rows — the cheapest monitor state in the repo.
  *  2. [[DataPrep.benfordOfCounts]] keyed by `win_start_us` — the
  *     STATELESS reduction, in `foreachBatch` or over the sink table.
  */
object StreamingBenford {

  /** Event-time windowed per-digit counts `(win_start_us, digit, c)` on
    * window close. Works identically on a batch frame (the batch twin
    * below) — `window()` is the same function either way.
    */
  def windowDigitCounts(
      events: DataFrame, valueCol: String, tsCol: String,
      windowDuration: String, watermark: Option[String]): DataFrame = {
    val base = watermark.fold(events)(events.withWatermark(tsCol, _))
    base
      .withColumn("digit", DataPrep.leadingDigit(col(valueCol)))
      .filter(col("digit").isNotNull)
      .groupBy(window(col(tsCol), windowDuration).as("win"), col("digit"))
      .agg(count(lit(1)).as("c"))
      .select(unix_micros(col("win.start")).as("win_start_us"),
        col("digit"), col("c"))
  }

  /** Batch twin — the oracle-checked form (q229): the SAME stage-1
    * expressions without a watermark, reduced by the SAME shared
    * [[DataPrep.benfordOfCounts]].
    */
  def batchWindowBenford(
      events: DataFrame, valueCol: String, tsCol: String,
      windowDuration: String): DataFrame =
    DataPrep.benfordOfCounts(
      windowDigitCounts(events, valueCol, tsCol, windowDuration, None),
      Seq("win_start_us"))

  /** Streaming reduction for `foreachBatch` / sink-table use. */
  def benfordOfWindows(closedCounts: DataFrame): DataFrame =
    DataPrep.benfordOfCounts(closedCounts, Seq("win_start_us"))
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ModelEval

/** Streaming drift monitoring with the 1-D earth mover's distance: live
  * event-time windows scored against an offline reference with the SAME
  * integer arithmetic as the batch statistic — the reduction is
  * literally the shared [[ModelEval.emdFromCounts]], so batch and stream
  * cannot diverge (StreamingEmdSpec pins window-EMD ≡ the batch
  * reduction per closed day). Completes the monitor family:
  * [[StreamingDrift]] (PSI — binned, log-weighted), [[StreamingKs]]
  * (sup-distance — binning-free, displacement-blind), and this
  * (displacement-weighted — "everything shifted slightly" vs "a tail
  * teleported" separate cleanly, which both PSI and KS read alike).
  *
  * The STREAMING stage is literally [[StreamingKs.windowValueCounts]] /
  * [[StreamingKs.referenceValueCounts]] — one windowed count feed can
  * drive the KS and EMD reductions simultaneously; only the stateless
  * per-window reduction differs.
  */
object StreamingEmd {

  /** EMD per (window, group) of closed-window value counts against a
    * [[StreamingKs.referenceValueCounts]] table — stateless: reference
    * broadcast onto every observed window, merged full-outer on value (a
    * value seen on one side counts 0 on the other), reduced by the
    * shared batch arithmetic. Side a = the window, side b = reference.
    */
  def emdOfCounts(valueCounts: DataFrame, refCounts: DataFrame): DataFrame = {
    val wins = valueCounts.select(col("win_start_us"), col("grp")).distinct()
    // fresh attribute ids before the full-outer join — the
    // StreamingDrift.psiOfCounts conflicting-reference lesson
    val refExpanded = wins.join(broadcast(refCounts), Seq("grp"))
      .select(col("win_start_us").as("rw"), col("grp").as("rg"),
        col("sm").as("rs"), col("c").as("rc"))
    val merged = refExpanded
      .join(valueCounts,
        col("rw") === col("win_start_us") && col("rg") === col("grp") &&
          col("rs") === col("sm"),
        "full_outer")
      .select(
        coalesce(col("rw"), col("win_start_us")).as("win_start_us"),
        coalesce(col("rg"), col("grp")).as("grp"),
        coalesce(col("rs"), col("sm")).as("sm"),
        coalesce(col("d"), lit(0L)).as("ca"),
        coalesce(col("rc"), lit(0L)).as("cb"))
    ModelEval.emdFromCounts(merged, Seq("win_start_us", "grp"))
  }
}

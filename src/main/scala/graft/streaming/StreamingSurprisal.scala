package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Streaming LANGUAGE-MODEL drift monitoring: live document windows
  * scored against a FROZEN reference unigram LM — the serving-time
  * companion of the batch `TextPipeline.unigramCrossEntropy` (q207)
  * quality score and the `tokenCoverageAtK` (q208) planning curve. Two
  * numbers per closed event-time window:
  *
  *   ce_micro_nats — mean micro-nat surprisal of the window's token
  *     occurrences under the reference LM (rising = the stream reads
  *     less like the reference corpus);
  *   oov_ppm — fraction of occurrences whose type the reference never
  *     saw (rising = vocabulary shift: new domain, new language, spam).
  *
  * Unseen tokens score the add-one-smoothed unseen surprisal
  * `ln(N + V)` — exactly what the batch scorer assigns a count-0 type —
  * so the stream scoring is the batch formula evaluated against a
  * snapshot, not a new convention. The scoring fold and the window
  * reduction are shared verbatim between the batch and streaming entry
  * points (the [[StreamingKs]] factoring), so batch ≡ stream by
  * construction; StreamingSurprisalSpec pins per-closed-window equality
  * on a file replay.
  *
  * Scale shape: the reference is a (token, score) table joined
  * stream-static (vocabulary-sized — Spark plans broadcast when it
  * fits, shuffle otherwise); per-window state is one (count, Σscore,
  * Σoov) triple per open window — O(open windows), never token- or
  * document-scaled.
  */
object StreamingSurprisal {

  /** Frozen reference LM from a baseline corpus: the (token, surprisal)
    * score table plus the unseen-token surprisal, with the q207
    * arithmetic — `s(t) = round(10⁶·ln((N+V)/(cnt+1)))` micro-nats,
    * unseen = `round(10⁶·ln(N+V))`. The (N, V) totals are ONE collected
    * row (bounded driver state, the broadcast-table pattern).
    */
  def referenceLm(docs: DataFrame, textCol: String): (DataFrame, Long) = {
    val cnt = docs.select(explode(T.tokens(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("cf"))
    val tot = cnt.agg(coalesce(sum(col("cf")), lit(0L)).as("n"),
      count(lit(1)).as("v")).head()
    val nv = tot.getLong(0) + tot.getLong(1)
    require(nv > 0, "referenceLm: the reference corpus has no tokens")
    val scores = cnt.select(col("t"),
      round(lit(1e6) * log(lit(nv.toDouble) /
        (col("cf") + lit(1L)).cast("double"))).cast("bigint").as("s"))
    (scores, math.round(1e6 * math.log(nv.toDouble)))
  }

  /** The shared scoring fold: one row per token occurrence with its
    * reference surprisal and OOV flag (plus any carried group columns).
    * Works on a batch frame or a stream (the lm join is stream-static).
    */
  def scoredTokens(
      docs: DataFrame, textCol: String, tsCol: String,
      lmScores: DataFrame, oovMicroNats: Long,
      grpCols: Seq[String] = Nil): DataFrame =
    docs.select(col(tsCol) +: grpCols.map(col) :+
        explode(T.tokens(col(textCol))).as("t"): _*)
      .join(lmScores, Seq("t"), "left")
      .withColumn("is_oov", col("s").isNull.cast("bigint"))
      .withColumn("s", coalesce(col("s"), lit(oovMicroNats)))

  // the literal window reduction every entry point shares (grouped and
  // ungrouped — the grp columns just extend the aggregation key)
  private def reduce(
      scored: DataFrame, tsCol: String, windowDuration: String,
      grpCols: Seq[String]): DataFrame =
    scored
      .groupBy(window(col(tsCol), windowDuration).as("win") +:
        grpCols.map(col): _*)
      .agg(count(lit(1)).as("n_tokens"),
        // decimal sum: occurrences × ln N surprisals overflow long at
        // corpus scale
        sum(col("s").cast("decimal(38,0)")).as("ssum"),
        sum(col("is_oov")).as("n_oov"))
      .select(unix_micros(col("win.start")).as("win_start_us") +:
        grpCols.map(col) :+
        col("n_tokens") :+
        expr("CAST(ssum DIV n_tokens AS BIGINT)").as("ce_micro_nats") :+
        // decimal-cleared: 10⁶·n_oov overflows long past 10¹³ occurrences
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * n_oov)
               | DIV n_tokens AS BIGINT)""".stripMargin).as("oov_ppm"): _*)

  /** STREAMING stage: per closed event-time window (and optional group
    * columns — the per-source dashboard slice), the mean surprisal and
    * OOV rate of a document stream against the frozen LM (append mode;
    * watermark closes windows).
    */
  def windowSurprisal(
      docs: DataFrame, textCol: String, tsCol: String,
      lmScores: DataFrame, oovMicroNats: Long,
      windowDuration: String, watermark: String,
      grpCols: Seq[String] = Nil): DataFrame =
    reduce(
      scoredTokens(docs.withWatermark(tsCol, watermark), textCol, tsCol,
        lmScores, oovMicroNats, grpCols),
      tsCol, windowDuration, grpCols)

  /** The batch twin — the SAME fold and reduction with no watermark;
    * StreamingSurprisalSpec pins stream ≡ batch per closed window, and
    * q209 (global) / q211 (per-source) oracle this form against DuckDB.
    */
  def batchWindowSurprisal(
      docs: DataFrame, textCol: String, tsCol: String,
      lmScores: DataFrame, oovMicroNats: Long,
      windowDuration: String, grpCols: Seq[String] = Nil): DataFrame =
    reduce(scoredTokens(docs, textCol, tsCol, lmScores, oovMicroNats, grpCols),
      tsCol, windowDuration, grpCols)
}

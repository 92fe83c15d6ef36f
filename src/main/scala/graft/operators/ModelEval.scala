package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation analytics for classifier-driven data pipelines (the
  * quality-filter / decontamination-model feedback loop): exact ROC-AUC,
  * threshold-bucketed precision/recall, calibration bins, and chi-square
  * term selection. A 100-TB corpus is scored by a quality model and the
  * pipeline must decide thresholds from the scores — these are the
  * aggregates that decision reads.
  *
  * Everything follows the repo's exact-integer contract: scores live in
  * micro fixed point, every emitted statistic is an integer ratio cleared
  * through `DIV` (decimal(38,0) where products outgrow longs), so any
  * engine reproduces the numbers bit-for-bit — a float AUC computed two
  * ways can differ in the last ulp; an integer one cannot.
  */
object ModelEval {

  /** Exact tie-aware ROC-AUC per group, via the Mann-Whitney U statistic
    * in pair-counting form: aggregate to DISTINCT micro scores first
    * (`pos_s`, `neg_s` counts per score), then
    *
    *   2·U = Σ_s pos_s · (2·negBelow_s + neg_s)
    *   AUC = 2·U / (2·nPos·nNeg)
    *
    * — concordant pairs count twice, tied pairs once: the standard
    * average-rank tie convention with every quantity an integer. Emitted
    * as `auc_ppm = (1e6 · 2U) DIV (2·nPos·nNeg)` (decimal(38,0)
    * arithmetic; the product fits until nPos·nNeg ~ 5·10³¹ — beyond any
    * corpus — and a double pre-check raises loudly before a silent
    * non-ANSI decimal NULL). Single-class groups emit the -1 sentinel
    * (the q122 convention — no NULLs in gate-facing output).
    *
    * Scale shape: one shuffle to (grp, score) for the distinct-score
    * counts — map-side partial aggregation does the heavy lifting since
    * micro scores repeat — then a prefix window per group over DISTINCT
    * scores only (bounded by score resolution, not row count; a model
    * emitting 1e6 distinct scores costs a 1e6-row per-group sort, not a
    * corpus sort), then a per-group reduce. Groups parallelize
    * independently; nothing touches the driver.
    */
  def rocAuc(
      df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String): DataFrame = {
    val labeled = df.select(col(groupCol).as("grp"),
        round(col(scoreCol) * lit(1e6)).cast("bigint").as("sm"),
        col(labelCol).cast("bigint").as("y"))
      .withColumn("y", when(col("y").isin(0L, 1L), col("y"))
        .otherwise(raise_error(lit("rocAuc: label must be 0/1"))))
    val perScore = labeled.groupBy(col("grp"), col("sm"))
      .agg(sum(col("y")).as("pos"), (count(lit(1)) - sum(col("y"))).as("neg"))
    val wBelow = Window.partitionBy(col("grp")).orderBy(col("sm"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val perGrp = perScore
      .withColumn("neg_below", coalesce(sum(col("neg")).over(wBelow), lit(0L)))
      .groupBy(col("grp"))
      .agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum(col("pos") * (lit(2L) * col("neg_below") + col("neg"))).as("u2"))
    perGrp
      .withColumn("n_pos", // double pre-check: fail loudly, never NULL
        when(col("n_pos").cast("double") * col("n_neg").cast("double") < 5e31,
          col("n_pos"))
        .otherwise(raise_error(concat(
          lit("rocAuc: nPos*nNeg would overflow decimal(38,0) in group "),
          col("grp").cast("string")))))
      .select(col("grp"), col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(-1L))
          .otherwise(expr(
            """(CAST(1000000 AS DECIMAL(38,0)) * CAST(u2 AS DECIMAL(38,0)))
              | DIV (CAST(2 AS DECIMAL(38,0)) * CAST(n_pos AS DECIMAL(38,0))
              |      * CAST(n_neg AS DECIMAL(38,0)))""".stripMargin))
          .as("auc_ppm"))
  }

  /** Threshold-bucketed precision/recall curve: micro scores are cut into
    * `nBuckets` equal-WIDTH buckets between the global min and max (exact
    * integer edges: `bucket = ((sm - lo) * B) DIV (hi - lo + 1)`), and
    * each non-empty bucket emits the confusion counts and
    * precision/recall (in ppm) of the classifier "predict positive iff
    * score >= this bucket's lower edge" — scanning the curve top-down is
    * exactly how a corpus-filter threshold is picked.
    *
    * Scale shape: one 1-row global (min, max) aggregate broadcast back,
    * one groupBy(bucket) with map-side combine (corpus → ≤ B rows), then
    * a prefix window over ≤ B rows — bounded, not data-sized. Equal-width
    * (not equal-frequency) buckets are the deliberate scale choice: no
    * global rank is ever computed.
    */
  def prCurve(
      df: DataFrame, scoreCol: String, labelCol: String,
      nBuckets: Int = 20): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 100000, "nBuckets in [2, 100000]")
    val labeled = df.select(
        round(col(scoreCol) * lit(1e6)).cast("bigint").as("sm"),
        col(labelCol).cast("bigint").as("y"))
      .withColumn("y", when(col("y").isin(0L, 1L), col("y"))
        .otherwise(raise_error(lit("prCurve: label must be 0/1"))))
    val bounds = labeled.agg(min(col("sm")).as("lo"), max(col("sm")).as("hi"))
    val perBucket = labeled.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        expr(s"((sm - lo) * $nBuckets) DIV (hi - lo + 1)"))
      .groupBy(col("bucket"), col("lo"), col("hi"))
      .agg(sum(col("y")).as("pos"), (count(lit(1)) - sum(col("y"))).as("neg"))
    val wTop = Window.orderBy(col("bucket").desc) // ≤ nBuckets rows: bounded
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    perBucket
      .withColumn("tp", sum(col("pos")).over(wTop))
      .withColumn("fp", sum(col("neg")).over(wTop))
      .withColumn("all_pos", sum(col("pos")).over(wAll))
      .select(col("bucket"),
        (col("lo") + expr(s"(bucket * (hi - lo + 1)) DIV $nBuckets"))
          .as("threshold_micro"),
        col("tp"), col("fp"), (col("all_pos") - col("tp")).as("fn"),
        expr("(1000000 * tp) DIV (tp + fp)").as("precision_ppm"),
        when(col("all_pos") === 0, lit(-1L))
          .otherwise(expr("(1000000 * tp) DIV all_pos")).as("recall_ppm"))
      .orderBy(col("bucket").desc)
  }

  /** Calibration table: predictions (micro probabilities in [0, 1e6]) cut
    * into `nBins` equal-width bins; each bin emits its count, mean
    * predicted probability, and observed positive rate — the reliability
    * diagram a probability-emitting quality filter is audited with
    * (|mean_pred - pos_rate| is the per-bin calibration gap; the
    * n-weighted sum is ECE, left to the caller in integers).
    *
    * Pure groupBy with map-side combine — the ideal 100-TB aggregate:
    * corpus in, ≤ nBins rows out, no window, no join, no driver state.
    */
  def calibrationBins(
      df: DataFrame, predPpmCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && nBins <= 100000, "nBins in [2, 100000]")
    df.select(col(predPpmCol).cast("bigint").as("p"),
        col(labelCol).cast("bigint").as("y"))
      .withColumn("p", when(col("p").between(0L, 1000000L), col("p"))
        .otherwise(raise_error(
          lit("calibrationBins: pred must be ppm in [0, 1e6]"))))
      .withColumn("y", when(col("y").isin(0L, 1L), col("y"))
        .otherwise(raise_error(lit("calibrationBins: label must be 0/1"))))
      .withColumn("bin", least(lit(nBins - 1L),
        expr(s"(p * $nBins) DIV 1000000")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("p")).as("sum_p"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("sum_p DIV n").as("mean_pred_ppm"),
        expr("(1000000 * n_pos) DIV n").as("pos_rate_ppm"))
      .orderBy(col("bin"))
  }

  /** Two-sample Kolmogorov-Smirnov distance per group, exactly:
    *
    *   D = max over distinct values x of |F_a(x) − F_b(x)|
    *     = max |n_b·cumA(x) − n_a·cumB(x)| / (n_a·n_b)
    *
    * — clearing the denominators makes every intermediate an integer
    * (decimal(38,0) products), so the sup-distance AND its argmax
    * location are bit-identical in any engine; a float CDF subtraction
    * can flip the argmax between equal-height steps. Emitted in ppm with
    * the tie-broken location `at_micro` = the SMALLEST value achieving
    * the max. The nonparametric companion to the PSI drift monitor
    * ([[FeatureEng.psiDrift]]): PSI needs binning choices, KS does not —
    * run both when auditing a feature's train/serve skew. One-sided
    * groups emit the -1 sentinel.
    *
    * Scale shape: identical to [[rocAuc]] — distinct-value aggregation
    * with map-side combine, then per-group prefix windows over DISTINCT
    * micro values only (bounded by value resolution), then one reduce.
    */
  def ksTest(
      df: DataFrame, groupCol: String, valueCol: String,
      sideCol: String): DataFrame = {
    val labeled = df.select(col(groupCol).as("grp"),
        round(col(valueCol) * lit(1e6)).cast("bigint").as("sm"),
        col(sideCol).cast("bigint").as("side"))
      .withColumn("side", when(col("side").isin(0L, 1L), col("side"))
        .otherwise(raise_error(lit("ksTest: side must be 0/1"))))
    val perValue = labeled.groupBy(col("grp"), col("sm"))
      .agg(sum(lit(1L) - col("side")).as("ca"), sum(col("side")).as("cb"))
    ksFromCounts(perValue, Seq("grp"))
  }

  /** The KS reduction over PRE-AGGREGATED per-value counts
    * `(keys..., sm, ca, cb)` — the arithmetic [[ksTest]] and the
    * streaming drift monitor ([[graft.streaming.StreamingKs]]) share, so
    * batch and stream cannot diverge (the
    * [[graft.operators.FeatureEng.psiFromMerged]] convention). Emits one
    * row per key group: `(keys..., n_a, n_b, d_ppm, at_micro)`.
    */
  def ksFromCounts(perValue: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "ksFromCounts: need at least one key column")
    val kc = keys.map(col)
    val wCum = Window.partitionBy(kc: _*).orderBy(col("sm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(kc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val stepped = perValue
      .withColumn("cum_a", sum(col("ca")).over(wCum))
      .withColumn("cum_b", sum(col("cb")).over(wCum))
      .withColumn("n_a", sum(col("ca")).over(wAll))
      .withColumn("n_b", sum(col("cb")).over(wAll))
      .withColumn("n_a", // double pre-check: fail loudly, never NULL
        when(col("n_a").cast("double") * col("n_b").cast("double") < 5e31,
          col("n_a"))
        .otherwise(raise_error(concat(
          lit("ksTest: n_a*n_b would overflow decimal(38,0) in group "),
          col(keys.head).cast("string")))))
      .withColumn("diff", abs(
        col("n_b").cast("decimal(38,0)") * col("cum_a").cast("decimal(38,0)") -
        col("n_a").cast("decimal(38,0)") * col("cum_b").cast("decimal(38,0)")))
      .withColumn("maxd", max(col("diff")).over(
        Window.partitionBy(kc: _*)))
    stepped.groupBy(kc: _*)
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(col("maxd")).as("maxd"),
        min(when(col("diff") === col("maxd"), col("sm"))).as("at"))
      .select(kc ++ Seq(col("n_a"), col("n_b"),
        when(col("n_a") === 0 || col("n_b") === 0, lit(-1L))
          .otherwise(expr(
            """(CAST(1000000 AS DECIMAL(38,0)) * maxd)
              | DIV (CAST(n_a AS DECIMAL(38,0))
              |      * CAST(n_b AS DECIMAL(38,0)))""".stripMargin))
          .as("d_ppm"),
        when(col("n_a") === 0 || col("n_b") === 0, lit(-1L))
          .otherwise(col("at")).as("at_micro")): _*)
  }

  /** CRAMÉR–VON MISES two-sample criterion per key group — the
    * INTEGRATED-difference drift test between [[ksTest]] (sup of the CDF
    * gap: one sharp local break) and [[rankSumTest]] (location only):
    * CvM accumulates the SQUARED gap over the whole support, so many
    * small persistent deviations that never spike past KS's sup — the
    * classic slow-drift signature — still trip it.
    *
    *   T = (n·m/N²)·Σ_pooled (F_a(x) − F_b(x))²
    *     = Σ_blocks t·(m·cumA − n·cumB)² / (N²·n·m)
    *
    * evaluated with a DEFINED integer order (the kruskalWallis
    * convention): per block S = (m·cumA − n·cumB)² DIV (n·m) truncates
    * first, then `t_cvm_micro = (10⁶·Σ t·S) DIV N²` — engine-portable
    * to the last digit. Verdict vs the asymptotic 5% critical value
    * 0.46136 (Anderson 1962) as the micro literal 461360. Either side
    * empty reads the −1/−1 sentinels. The squared-gap product needs
    * n·m < 10¹⁸ (double pre-check raises the operator-named error).
    *
    * Scale shape: the [[ksFromCounts]] plan verbatim — one (keys, value)
    * micro-histogram with map-side combine, key-partitioned
    * resolution-bounded cumulative windows, one reduce. Streaming twin:
    * [[graft.streaming.StreamingCvm]] runs THIS reduction over the same
    * windowed histogram KS/EMD/rank-sum consume.
    */
  def cvmTest(
      df: DataFrame, groupCol: String, valueCol: String,
      sideCol: String): DataFrame = {
    val labeled = df.select(col(groupCol).as("grp"),
        round(col(valueCol) * lit(1e6)).cast("bigint").as("sm"),
        col(sideCol).cast("bigint").as("side"))
      .withColumn("side", when(col("side").isin(0L, 1L), col("side"))
        .otherwise(raise_error(lit("cvmTest: side must be 0/1"))))
    val perValue = labeled.groupBy(col("grp"), col("sm"))
      .agg(sum(lit(1L) - col("side")).as("ca"), sum(col("side")).as("cb"))
    cvmFromCounts(perValue, Seq("grp"))
  }

  /** The CvM reduction over PRE-AGGREGATED per-value counts
    * `(keys..., sm, ca, cb)` — shareable with the streaming monitor the
    * same way [[ksFromCounts]] is. Emits one row per key group:
    * `(keys..., n_a, n_b, t_cvm_micro, drift_95)`.
    */
  def cvmFromCounts(perValue: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "cvmFromCounts: need at least one key column")
    val kc = keys.map(col)
    val wCum = Window.partitionBy(kc: _*).orderBy(col("sm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(kc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val d = (c: String) => col(c).cast("decimal(38,0)")
    val stepped = perValue
      .withColumn("cum_a", sum(col("ca")).over(wCum))
      .withColumn("cum_b", sum(col("cb")).over(wCum))
      .withColumn("n_a", sum(col("ca")).over(wAll))
      .withColumn("n_b", sum(col("cb")).over(wAll))
      // double pre-check covering the FULL reduction, raising the NAMED
      // error (never NULL, never the generic ANSI overflow): the squared
      // gap is bounded by (n_a*n_b)^2 (needs n_a*n_b < 1e18), and the
      // final numerator 1e6*sum(t*s_blk) is bounded by 1e6*N*n_a*n_b
      // (needs (n_a+n_b)*n_a*n_b < 5e31 so 1e6x stays under ~5e37) —
      // the second bound catches extremely imbalanced arms (e.g.
      // n_a~9e17, n_b=1) that pass the product-only check
      .withColumn("n_a",
        when(col("n_a").cast("double") * col("n_b").cast("double") < 1e18
            && (col("n_a").cast("double") + col("n_b").cast("double"))
              * col("n_a").cast("double") * col("n_b").cast("double")
              < 5e31,
          col("n_a"))
          .otherwise(raise_error(concat(
            lit("cvmTest: squared CDF gap would overflow decimal(38,0) "),
            lit("in group "), col(keys.head).cast("string"),
            lit(" — shrink the sides or rescale counts")))))
      .withColumn("gap",
        d("n_b") * d("cum_a") - d("n_a") * d("cum_b"))
      .withColumn("s_blk",
        when(col("n_a") === 0L || col("n_b") === 0L,
          lit(0).cast("decimal(38,0)"))
          .otherwise(expr(
            "CAST((gap * gap) DIV (CAST(n_a AS DECIMAL(38,0)) * n_b)" +
              " AS DECIMAL(38,0))")))
    stepped.groupBy(kc: _*)
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum((d("ca") + d("cb")) * col("s_blk")).as("ts"))
      // compute the statistic ONCE and derive the verdict from the
      // column (the kruskalWallis/friedman pattern) — one division,
      // one expression to keep in sync
      .withColumn("t_cvm_micro",
        when(col("n_a") === 0L || col("n_b") === 0L, lit(-1L))
          .otherwise(expr(
            """CAST((CAST(1000000 AS DECIMAL(38,0)) * ts)
              | DIV ((CAST(n_a AS DECIMAL(38,0)) + n_b)
              |   * (CAST(n_a AS DECIMAL(38,0)) + n_b)) AS BIGINT)"""
              .stripMargin)))
      .withColumn("drift_95",
        when(col("n_a") === 0L || col("n_b") === 0L, lit(-1L))
          .otherwise((col("t_cvm_micro") >= lit(461360L)).cast("bigint")))
      .select(kc ++ Seq(col("n_a"), col("n_b"), col("t_cvm_micro"),
        col("drift_95")): _*)
  }

  /** MANN–WHITNEY U (Wilcoxon rank-sum) location test per key group —
    * the nonparametric "is arm b's value distribution shifted vs arm
    * a's" companion to [[ksTest]] (KS is sensitive to ANY shape
    * difference; rank-sum targets location, the usual experiment
    * question) — with ties handled by average ranks and the verdict
    * decided by an EXACT integer gate (the
    * [[graft.operators.FeatureEng.abTest]] clear-the-denominators
    * pattern), so the significance bit is identical in any engine:
    *
    * Doubled ranks keep everything integral: a tied value block at
    * cumulative offset c with t rows has doubled average rank
    * 2c + t + 1, so 2·R_a = Σ ca·(2c + t + 1) and 2·U_a = 2R_a −
    * n_a(n_a+1) are exact integers. With D = 2U_a − n_a·n_b (twice the
    * deviation from the null mean) and the tie-corrected variance, the
    * normal-approximation test |z| ≥ √(p/q) becomes
    *
    *   q·3·D²·N(N−1) ≥ p·n_a·n_b·(N(N−1)(N+1) − T),   T = Σ(t³ − t)
    *
    * — both sides exact decimal(38,0) products (double pre-check raises
    * loudly near the window, the abTest guard). A zero-variance group
    * (one arm empty handled by the −1 sentinel; all values tied makes
    * both sides 0) is not significant by convention (strict inequality).
    *
    * Scale shape: one (keys, value) micro-histogram with map-side
    * combine, per-key value-resolution-bounded cumulative windows
    * PARTITIONED by the keys, one reduce — the [[ksFromCounts]] plan.
    */
  def rankSumTest(
      df: DataFrame, groupCol: String, valueCol: String,
      sideCol: String, critP: Long = 2401L, critQ: Long = 625L): DataFrame = {
    val labeled = df.select(col(groupCol).as("grp"),
        round(col(valueCol) * lit(1e6)).cast("bigint").as("sm"),
        col(sideCol).cast("bigint").as("side"))
      .withColumn("side", when(col("side").isin(0L, 1L), col("side"))
        .otherwise(raise_error(lit("rankSumTest: side must be 0/1"))))
    val perValue = labeled.groupBy(col("grp"), col("sm"))
      .agg(sum(lit(1L) - col("side")).as("ca"), sum(col("side")).as("cb"))
    rankSumFromCounts(perValue, Seq("grp"), critP, critQ)
  }

  /** The rank-sum reduction over PRE-AGGREGATED per-value counts
    * `(keys..., sm, ca, cb)` — shareable with a streaming monitor the
    * same way [[ksFromCounts]] is. Emits one row per key group:
    * `(keys..., n_a, n_b, u2_a, shift_sign, significant_95)` where
    * `u2_a = 2·U_a` (the exact doubled U statistic) and `shift_sign` is
    * the direction of arm a's stochastic dominance (+1 = arm a larger).
    */
  def rankSumFromCounts(
      perValue: DataFrame, keys: Seq[String],
      critP: Long = 2401L, critQ: Long = 625L): DataFrame = {
    require(keys.nonEmpty, "rankSumFromCounts: need at least one key column")
    require(critP >= 1 && critQ >= 1, "critical value p/q must be positive")
    val kc = keys.map(col)
    val wCum = Window.partitionBy(kc: _*).orderBy(col("sm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d = (c: String) => col(c).cast("decimal(38,0)")
    val stepped = perValue
      .withColumn("t", col("ca") + col("cb"))
      .withColumn("cum", sum(col("t")).over(wCum))
      // doubled average rank of this tied block: 2·(cum−t) + t + 1
      .withColumn("r2", lit(2L) * (col("cum") - col("t")) + col("t") + lit(1L))
    val agg = stepped.groupBy(kc: _*)
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        sum(d("ca") * d("r2")).as("r2a"),
        sum(d("t") * d("t") * d("t") - d("t")).as("tie_t"))
      .withColumn("n_tot", col("n_a") + col("n_b"))
      .withColumn("u2a", col("r2a") - d("n_a") * (d("n_a") + lit(1)))
      .withColumn("dev", col("u2a") - d("n_a") * d("n_b"))
    // double pre-check: both gate sides must fit decimal(38,0)
    val nD = col("n_tot").cast("double")
    val devD = abs(col("dev").cast("double"))
    val lhsD = lit(critQ.toDouble * 3.0) * devD * devD * nD * nD
    val rhsD = lit(critP.toDouble) * col("n_a").cast("double") *
      col("n_b").cast("double") * nD * nD * nD
    val guarded = agg.withColumn("n_a",
      when(lhsD < 5e37 && rhsD < 5e37, col("n_a")).otherwise(raise_error(concat(
        lit("rankSumTest: gate product would overflow decimal(38,0) in group "),
        col(keys.head).cast("string"),
        lit(" — shrink the arms or rescale counts")))))
    guarded.select(kc ++ Seq(
      col("n_a"), col("n_b"),
      when(col("n_a") === 0L || col("n_b") === 0L, lit(-1L))
        .otherwise(col("u2a").cast("bigint")).as("u2_a"),
      when(col("n_a") === 0L || col("n_b") === 0L, lit(0L))
        .when(col("dev") > 0, lit(1L)).when(col("dev") < 0, lit(-1L))
        .otherwise(lit(0L)).as("shift_sign"),
      when(col("n_a") === 0L || col("n_b") === 0L, lit(0L))
        .otherwise((lit(critQ) * lit(3) * col("dev") * col("dev") *
          d("n_tot") * (d("n_tot") - lit(1)) >
          lit(critP) * d("n_a") * d("n_b") *
            (d("n_tot") * (d("n_tot") - lit(1)) * (d("n_tot") + lit(1)) -
              col("tie_t"))).cast("bigint")).as("significant_95")): _*)
  }

  // χ²(df, 0.95) critical values in micro for the Kruskal-Wallis verdict
  // (the EventAnalytics Ljung-Box table, repeated here to keep the two
  // operators dependency-free)
  private val KwCrit95Micro: Map[Long, Long] = Map(
    1L -> 3841459L, 2L -> 5991465L, 3L -> 7814728L, 4L -> 9487729L,
    5L -> 11070498L, 6L -> 12591587L, 7L -> 14067140L)

  /** KRUSKAL–WALLIS H — the k-group generalization of [[rankSumTest]]
    * ("does `valueCol`'s distribution differ across ANY of the classes"),
    * the nonparametric one-way ANOVA a pipeline runs before trusting a
    * per-class mean table. Doubled average ranks keep tied blocks exact
    * (the rank-sum convention); with R2_j = doubled rank sum of class j,
    * N total rows and T = Σ(t³ − t) over tied blocks, the tie-corrected
    * statistic reduces (the (N³−N)/(N(N+1)) = N−1 cancellation) to
    *
    *   H = 3·(Σ_j R2_j²/n_j − N(N+1)²)·(N−1) / (N³ − N − T)
    *
    * evaluated with a DEFINED integer order: each class term
    * `R2_j² DIV n_j` truncates before the sum, the final ratio is ONE
    * decimal(38,0) truncating division scaled to micro — bit-identical
    * anywhere. Verdict: `h_micro ≥ χ²(k−1, 0.95)` against the micro
    * literal (k ≤ 8 enforced — the table bound). All values tied (T =
    * N³−N) or a single class reads the −2·10⁶ sentinel with
    * `significant_95 = −1`. One output row.
    *
    * Scale shape: one (class, value) micro-histogram with map-side
    * combine, one value-resolution-bounded GLOBAL cumulative window
    * (the rank axis is shared across classes — bounded by distinct
    * values, never rows; the q219 histogram argument), one class
    * reduce, one 1-row reduce.
    */
  def kruskalWallis(
      df: DataFrame, classCol: String, valueCol: String): DataFrame =
    kruskalWallisFromCounts(
      df.select(col(classCol).as("cls"),
          round(col(valueCol) * lit(1e6)).cast("bigint").as("sm"))
        .groupBy(col("cls"), col("sm")).agg(count(lit(1)).as("cc")))

  /** The Kruskal–Wallis reduction over a PRE-AGGREGATED per-class value
    * histogram `(cls, sm, cc)` — the [[rankSumFromCounts]] convention,
    * shareable with any upstream that already holds counts (and the seam
    * the overflow-guard spec drives with fabricated counts).
    */
  def kruskalWallisFromCounts(hist: DataFrame): DataFrame = {
    // doubled average rank per value block over the CLASS-POOLED axis
    val wCum = Window.orderBy(col("sm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val blocks = hist.groupBy(col("sm")).agg(sum(col("cc")).as("t"))
      .withColumn("cum", sum(col("t")).over(wCum))
      .withColumn("r2", lit(2L) * (col("cum") - col("t")) + col("t") + lit(1L))
    val d = (c: String) => col(c).cast("decimal(38,0)")
    val perClass = hist.join(blocks.select(col("sm"), col("r2")), Seq("sm"))
      .groupBy(col("cls"))
      .agg(sum(col("cc")).as("n_j"), sum(d("cc") * d("r2")).as("r2j"))
    val ties = blocks.agg(
      coalesce(sum(d("t") * d("t") * d("t") - d("t")), lit(0).cast("decimal(38,0)"))
        .as("tie_t"),
      coalesce(sum(col("t")), lit(0L)).as("n_tot"))
    val agg = perClass
      .select(col("cls"), col("n_j"),
        expr("(CAST(r2j AS DECIMAL(38,0)) * r2j) DIV n_j").as("s_j"))
      .agg(count(lit(1)).as("k"), sum(col("s_j")).as("s"))
      .crossJoin(broadcast(ties))
    agg
      .withColumn("k", when(col("k") <= 8L, col("k"))
        .otherwise(raise_error(concat(
          lit("kruskalWallis: "), col("k").cast("string"),
          lit(" classes exceed the chi-square table bound (8)")))))
      .withColumn("den",
        d("n_tot") * d("n_tot") * d("n_tot") - d("n_tot") - col("tie_t"))
      // double pre-check (the rankSumFromCounts guard): the ~N^4-scale
      // numerator must fit decimal(38,0) — raise a NAMED error instead of
      // the generic ANSI decimal overflow
      .withColumn("__numD",
        lit(3e6) * abs(col("s").cast("double") -
          col("n_tot").cast("double") * (col("n_tot").cast("double") + 1d)
            * (col("n_tot").cast("double") + 1d)) *
          (col("n_tot").cast("double") - 1d))
      .withColumn("h_micro",
        when(col("k") < 2L || col("den") <= 0, lit(-2000000L))
          .when(col("__numD") >= 5e37, raise_error(concat(
            lit("kruskalWallis: statistic numerator would overflow "),
            lit("decimal(38,0) at n = "), col("n_tot").cast("string"),
            lit(" pooled rows — shrink the classes or rescale counts"))))
          .otherwise(expr(
            """CAST((CAST(1000000 AS DECIMAL(38,0)) * 3
              |  * (s - CAST(n_tot AS DECIMAL(38,0)) * (n_tot + 1) * (n_tot + 1))
              |  * (n_tot - 1)) DIV den AS BIGINT)""".stripMargin)))
      .drop("__numD")
      .withColumn("significant_95",
        when(col("k") < 2L || col("den") <= 0, lit(-1L))
          .otherwise((col("h_micro") >=
            element_at(typedLit(KwCrit95Micro), col("k") - lit(1L)))
            .cast("bigint")))
      .select(col("k"), col("n_tot").as("n"), col("h_micro"),
        col("significant_95"))
  }

  /** FRIEDMAN TEST — the repeated-measures companion of
    * [[kruskalWallis]]: k systems scored on the SAME n subjects ("do k
    * model variants rank consistently across benchmark items", "do the
    * event types order the same way every day"), blocking out
    * per-subject level differences that would drown a pooled rank test.
    * Values are reduced to the per-(subject, system) truncating micro
    * mean first (the dailyStats dm convention), subjects missing any
    * system are DROPPED (a complete-block design — `n_subjects` reports
    * the blocks actually used), and ranks are doubled within-subject
    * average ranks (ties exact, the rank-sum convention). With R2_j the
    * doubled rank sum of system j and A2 = Σ r2²  the tie-corrected
    * statistic is fully integral up to ONE final division:
    *
    *   q_micro = (10⁶·(k−1)·Σ_j (R2_j − n(k+1))²) DIV (A2 − n·k·(k+1)²)
    *
    * Verdict: `q_micro ≥ χ²(k−1, 0.95)` against the micro literal
    * (k ≤ 8 — the table bound, enforced). A zero denominator (all
    * systems tied within every subject) or n = 0 reads the −2·10⁶
    * sentinel with `significant_95 = −1`. One output row.
    *
    * Scale shape: one (subject, system) mean with map-side combine, a
    * subject-partitioned rank window over per-subject k-bounded blocks,
    * and k-bounded reductions; the distinct-system count is ONE bounded
    * driver action (systems are a catalog — the negativeSamples
    * maxVocab precedent).
    */
  def friedmanTest(
      df: DataFrame, subjectCol: String, systemCol: String,
      valueCol: String): DataFrame = {
    val cell = df.select(col(subjectCol).as("subj"), col(systemCol).as("sys"),
        round(col(valueCol) * lit(1e6)).cast("bigint").as("ym"))
      .groupBy(col("subj"), col("sys"))
      .agg(expr("sum(ym) DIV count(1)").as("sm"))
    val k = cell.select(col("sys")).distinct().count()
    require(k >= 2 && k <= 8,
      s"friedmanTest: $k systems — need 2..8 (chi-square table bound)")
    val complete = cell
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(col("subj"))))
      .filter(col("__cnt") === k)
      .drop("__cnt")
    // doubled within-subject average ranks over tied value blocks
    val wCum = Window.partitionBy(col("subj")).orderBy(col("sm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val blocks = complete.groupBy(col("subj"), col("sm"))
      .agg(count(lit(1)).as("t"))
      .withColumn("cum", sum(col("t")).over(wCum))
      .withColumn("r2", lit(2L) * (col("cum") - col("t")) + col("t") + lit(1L))
    val cells = complete.join(blocks.select(col("subj"), col("sm"), col("r2")),
      Seq("subj", "sm"))
    val d = (c: String) => col(c).cast("decimal(38,0)")
    val nFrame = cells.agg(
      (count_distinct(col("subj"))).as("n"),
      coalesce(sum(d("r2") * d("r2")), lit(0).cast("decimal(38,0)")).as("a2"))
    val perSys = cells.groupBy(col("sys")).agg(sum(col("r2")).as("r2j"))
    // s2 aggregated on its own 1-row frame so an EMPTY complete-block set
    // still yields one (sentinel) output row
    val s2only = perSys.crossJoin(broadcast(nFrame))
      .agg(coalesce(sum((d("r2j") - d("n") * lit(k + 1)) *
        (d("r2j") - d("n") * lit(k + 1))), lit(0).cast("decimal(38,0)"))
        .as("s2"))
    nFrame.crossJoin(broadcast(s2only))
      .withColumn("den",
        col("a2") - d("n") * lit(k) * lit((k + 1) * (k + 1)))
      .withColumn("q_micro",
        when(col("n") === 0L || col("den") <= 0, lit(-2000000L))
          // double pre-check (the rankSumFromCounts guard) on the
          // 10^6·(k−1)·s2 numerator — named raise, not generic overflow
          .when(lit(1e6 * (k - 1)) * col("s2").cast("double") >= 5e37,
            raise_error(concat(
              lit("friedmanTest: statistic numerator would overflow "),
              lit("decimal(38,0) at n = "), col("n").cast("string"),
              lit(" subjects — shrink the blocks or rescale counts"))))
          .otherwise(expr(
            s"""CAST((CAST(1000000 AS DECIMAL(38,0)) * ${k - 1} * s2)
               | DIV den AS BIGINT)""".stripMargin)))
      .withColumn("significant_95",
        when(col("n") === 0L || col("den") <= 0, lit(-1L))
          .otherwise((col("q_micro") >= lit(KwCrit95Micro(k - 1)))
            .cast("bigint")))
      .select(lit(k).as("k"), col("n").cast("bigint").as("n_subjects"),
        col("q_micro"), col("significant_95"))
  }

  /** MOOD'S MEDIAN TEST — the coarse-but-robust k-group location test:
    * classify every row as above / not-above the POOLED lower median and
    * chi-square the k×2 table ("do the classes straddle the common
    * median differently" — survives outliers and wild tails that bend
    * [[kruskalWallis]]' rank variance). No rows drop: the split is
    * `> median` vs `≤ median` (the standard Mood convention), so ties
    * with the median land in the lower cell deterministically.
    *
    * Exactness: with N rows, M above-median rows, n_j/a_j per class,
    * Pearson's χ² for the 2×k table reduces to
    *
    *   χ² = Σ_j (a_j·N − n_j·M)² / n_j  /  (M·(N−M))
    *
    * — evaluated with a DEFINED integer order (per-class truncating DIV,
    * then ONE final micro division), engine-portable. Verdict vs the
    * χ²(k−1, 0.95) micro literal (k ≤ 8 enforced). M = 0 or M = N (the
    * median swallows everything — no split exists) or k < 2 reads the
    * −2·10⁶ sentinel. One output row.
    *
    * Scale shape: one (class, value) micro-histogram with map-side
    * combine, one value-resolution-bounded GLOBAL cumulative window for
    * the pooled median (the q250 histogram argument), class-bounded
    * reductions after that.
    */
  def moodMedianTest(
      df: DataFrame, classCol: String, valueCol: String): DataFrame = {
    val hist = df.select(col(classCol).as("cls"),
        round(col(valueCol) * lit(1e6)).cast("bigint").as("sm"))
      .groupBy(col("cls"), col("sm")).agg(count(lit(1)).as("cc"))
    // pooled lower median over the class-pooled value histogram
    val wCum = Window.orderBy(col("sm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val med = hist.groupBy(col("sm")).agg(sum(col("cc")).as("t"))
      .withColumn("cum", sum(col("t")).over(wCum))
      .withColumn("ntot", sum(col("t")).over(wAll))
      .filter(col("cum") >= expr("(ntot + 1) DIV 2"))
      .agg(min(col("sm")).as("med"))
    val d = (c: String) => col(c).cast("decimal(38,0)")
    val perClass = hist.crossJoin(broadcast(med))
      .groupBy(col("cls"))
      .agg(sum(col("cc")).as("n_j"),
        sum(when(col("sm") > col("med"), col("cc")).otherwise(0L)).as("a_j"))
    val tot = perClass.agg(count(lit(1)).as("k"), sum(col("n_j")).as("n_tot"),
      sum(col("a_j")).as("m_above"))
    perClass.crossJoin(broadcast(tot))
      .select(col("cls"), col("k"), col("n_tot"), col("m_above"),
        // double pre-check (the rankSumFromCounts guard): the per-class
        // product is ~N^4-scale — raise a NAMED error before the generic
        // ANSI decimal overflow can
        expr("""CASE WHEN CAST(n_tot AS DOUBLE) * n_tot * n_tot * n_tot
               |    >= 5e37
               |  THEN raise_error(concat(
               |    'moodMedianTest: chi-square numerator would overflow ',
               |    'decimal(38,0) at n = ', CAST(n_tot AS STRING),
               |    ' pooled rows — shrink the classes or rescale counts'))
               |  ELSE CAST(((CAST(a_j AS DECIMAL(38,0)) * n_tot
               |    - CAST(n_j AS DECIMAL(38,0)) * m_above)
               |    * (CAST(a_j AS DECIMAL(38,0)) * n_tot
               |    - CAST(n_j AS DECIMAL(38,0)) * m_above)) DIV n_j
               |    AS DECIMAL(38,0)) END""".stripMargin).as("s_j"))
      .groupBy(col("k"), col("n_tot"), col("m_above"))
      .agg(sum(col("s_j")).as("s"))
      .withColumn("k", when(col("k") <= 8L, col("k"))
        .otherwise(raise_error(concat(
          lit("moodMedianTest: "), col("k").cast("string"),
          lit(" classes exceed the chi-square table bound (8)")))))
      .withColumn("chi2_micro",
        when(col("k") < 2L || col("m_above") === 0L ||
            col("m_above") === col("n_tot"), lit(-2000000L))
          .otherwise(expr(
            """CAST((CAST(1000000 AS DECIMAL(38,0)) * s)
              | DIV (CAST(m_above AS DECIMAL(38,0))
              |   * (n_tot - m_above)) AS BIGINT)""".stripMargin)))
      .withColumn("significant_95",
        when(col("chi2_micro") === -2000000L, lit(-1L))
          .otherwise((col("chi2_micro") >=
            element_at(typedLit(KwCrit95Micro), col("k") - lit(1L)))
            .cast("bigint")))
      .select(col("k"), col("n_tot").as("n"), col("m_above"),
        col("chi2_micro"), col("significant_95"))
  }

  /** COCHRAN'S Q — the BINARY repeated-measures test completing the
    * nonparametric ladder (rank-sum → Kruskal-Wallis → Friedman →
    * Cochran-Q): k systems judged pass/fail on the SAME n subjects ("do
    * k quality gates trip consistently across days", "do k model
    * variants solve the same benchmark items"). Outcomes must be 0/1
    * (anything else raises); multiple rows per (subject, system) cell
    * reduce by MAX (any success counts — document upstream if a
    * different cell rule is wanted); subjects missing any system are
    * DROPPED (complete blocks, the [[friedmanTest]] convention).
    *
    * With G_j = per-system success totals, L_i = per-subject totals and
    * T = ΣG_j = ΣL_i, the statistic is fully integral up to ONE
    * truncating decimal division:
    *
    *   q_micro = (10⁶·(k−1)·(k·ΣG_j² − T²)) DIV (k·T − ΣL_i²)
    *
    * Verdict: `q_micro ≥ χ²(k−1, 0.95)` micro literal (k ≤ 8 — the
    * table bound, enforced). A zero denominator (every subject all-0 or
    * all-1 — no within-block discrimination) or n = 0 reads the −2·10⁶
    * sentinel with `significant_95 = −1`. One output row.
    *
    * Scale shape: one (subject, system) max with map-side combine, then
    * system-bounded and subject-keyed sum reductions — no windows at
    * all (binary outcomes need no ranks); the distinct-system count is
    * ONE bounded driver action (systems are a catalog).
    */
  def cochranQ(
      df: DataFrame, subjectCol: String, systemCol: String,
      valueCol: String): DataFrame = {
    val cell = df.select(col(subjectCol).as("subj"), col(systemCol).as("sys"),
        col(valueCol).cast("bigint").as("y"))
      .withColumn("y", when(col("y").isin(0L, 1L), col("y"))
        .otherwise(raise_error(lit("cochranQ: outcomes must be 0/1"))))
      .groupBy(col("subj"), col("sys")).agg(max(col("y")).as("y"))
    val k = cell.select(col("sys")).distinct().count()
    require(k >= 2 && k <= 8,
      s"cochranQ: $k systems — need 2..8 (chi-square table bound)")
    val complete = cell
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(col("subj"))))
      .filter(col("__cnt") === k)
      .drop("__cnt")
    val d = (c: String) => col(c).cast("decimal(38,0)")
    val perSys = complete.groupBy(col("sys")).agg(sum(col("y")).as("g"))
      .agg(coalesce(sum(d("g") * d("g")), lit(0).cast("decimal(38,0)"))
        .as("sum_g2"),
        coalesce(sum(col("g")), lit(0L)).as("t_tot"))
    val perSubj = complete.groupBy(col("subj")).agg(sum(col("y")).as("l"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(d("l") * d("l")), lit(0).cast("decimal(38,0)"))
          .as("sum_l2"))
    perSubj.crossJoin(broadcast(perSys))
      .withColumn("den", lit(k) * d("t_tot") - col("sum_l2"))
      .withColumn("num",
        lit(k - 1) * (lit(k) * col("sum_g2") - d("t_tot") * d("t_tot")))
      .withColumn("q_micro",
        when(col("n") === 0L || col("den") <= 0, lit(-2000000L))
          // double pre-check (the rankSumFromCounts guard) — named raise
          .when(lit(1e6) * abs(col("num").cast("double")) >= 5e37,
            raise_error(concat(
              lit("cochranQ: statistic numerator would overflow "),
              lit("decimal(38,0) at n = "), col("n").cast("string"),
              lit(" subjects — shrink the blocks"))))
          .otherwise(expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * num) DIV den AS BIGINT)")))
      .withColumn("significant_95",
        when(col("n") === 0L || col("den") <= 0, lit(-1L))
          .otherwise((col("q_micro") >= lit(KwCrit95Micro(k - 1)))
            .cast("bigint")))
      .select(lit(k).as("k"), col("n").cast("bigint").as("n_subjects"),
        col("t_tot").as("n_successes"), col("q_micro"),
        col("significant_95"))
  }

  /** WILCOXON SIGNED-RANK — the PAIRED two-condition location test the
    * rank family was missing ([[rankSumTest]] compares independent arms;
    * this compares the SAME subjects under two conditions — "did
    * per-user engagement shift after the change", "does model B beat
    * model A on the same benchmark items"). Per (group, subject, side)
    * the value reduces to the truncating micro mean (the dailyStats dm
    * convention); subjects missing either side drop (paired design),
    * zero differences drop (the standard Wilcoxon convention), and
    * doubled average ranks over the |d| histogram keep ties exact:
    * `w2_plus = Σ_{d>0} r2 = 2·W⁺` is an exact integer.
    *
    * Verdict — the cleared-denominator exact gate: with D = 2·w2_plus −
    * n(n+1) = 4(W⁺ − E[W⁺]) and T = Σ(t³ − t) over tied |d| blocks,
    * 16·Var[W⁺] = (2n(n+1)(2n+1) − T)/3, so |z| > √(p/q) becomes
    *
    *   q·3·D² > p·(2n(n+1)(2n+1) − T)
    *
    * — both sides exact decimal(38,0) (double pre-check raises loudly
    * near the window). A group with no surviving pairs (no complete
    * pair, or every difference exactly zero) emits NO row.
    *
    * Scale shape: one (group, subject, side) mean with map-side combine,
    * one subject-keyed pair pivot, then a |d|-HISTOGRAM cumulative
    * window PARTITIONED by group (resolution-bounded, never
    * subject-bounded — the [[rankSumFromCounts]] plan) and one reduce.
    */
  def signedRankTest(
      df: DataFrame, groupCol: String, subjectCol: String,
      valueCol: String, sideCol: String,
      critP: Long = 2401L, critQ: Long = 625L): DataFrame = {
    require(critP >= 1 && critQ >= 1, "critical value p/q must be positive")
    val cell = df.select(col(groupCol).as("grp"),
        col(subjectCol).as("subj"),
        round(col(valueCol) * lit(1e6)).cast("bigint").as("ym"),
        col(sideCol).cast("bigint").as("side"))
      .withColumn("side", when(col("side").isin(0L, 1L), col("side"))
        .otherwise(raise_error(lit("signedRankTest: side must be 0/1"))))
      .groupBy(col("grp"), col("subj"), col("side"))
      .agg(expr("sum(ym) DIV count(1)").as("sm"))
    val paired = cell.groupBy(col("grp"), col("subj"))
      .agg(max(when(col("side") === 0L, col("sm"))).as("s0"),
        max(when(col("side") === 1L, col("sm"))).as("s1"))
      .filter(col("s0").isNotNull && col("s1").isNotNull)
      .select(col("grp"), (col("s1") - col("s0")).as("dv"))
      .filter(col("dv") =!= 0L)
    val hist = paired.groupBy(col("grp"), abs(col("dv")).as("ad"))
      .agg(sum(when(col("dv") > 0L, 1L).otherwise(0L)).as("cp"),
        sum(when(col("dv") < 0L, 1L).otherwise(0L)).as("cn"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("ad"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d = (c: String) => col(c).cast("decimal(38,0)")
    val stepped = hist
      .withColumn("t", col("cp") + col("cn"))
      .withColumn("cum", sum(col("t")).over(wCum))
      .withColumn("r2", lit(2L) * (col("cum") - col("t")) + col("t") + lit(1L))
    val agg = stepped.groupBy(col("grp"))
      .agg(sum(col("t")).as("n"),
        sum(d("cp") * d("r2")).as("w2p"),
        sum(d("t") * d("t") * d("t") - d("t")).as("tie_t"))
      .withColumn("dev", lit(2) * col("w2p") - d("n") * (d("n") + lit(1)))
    // double pre-check (the rankSumFromCounts guard): D ~ n², D² ~ n⁴
    val devD = abs(col("dev").cast("double"))
    val nD = col("n").cast("double")
    val guarded = agg.withColumn("n",
      when(lit(3.0 * critQ) * devD * devD < 5e37 &&
          lit(critP.toDouble) * 2.0 * nD * (nD + 1) * (nD * 2 + 1) < 5e37,
        col("n"))
        .otherwise(raise_error(concat(
          lit("signedRankTest: gate product would overflow decimal(38,0) "),
          lit("in group "), col("grp").cast("string"),
          lit(" — shrink the pairs or rescale")))))
    guarded.select(col("grp"), col("n").as("n_pairs"),
      when(col("n") === 0L, lit(-1L))
        .otherwise(col("w2p").cast("bigint")).as("w2_plus"),
      when(col("n") === 0L, lit(0L))
        .when(col("dev") > 0, lit(1L)).when(col("dev") < 0, lit(-1L))
        .otherwise(lit(0L)).as("shift_sign"),
      when(col("n") === 0L, lit(0L))
        .otherwise((lit(critQ) * lit(3) * col("dev") * col("dev") >
          lit(critP) * (lit(2) * d("n") * (d("n") + lit(1))
            * (lit(2) * d("n") + lit(1)) - col("tie_t"))).cast("bigint"))
        .as("significant_95"))
  }

  /** CLIFF'S DELTA — the rank-sum family's EFFECT SIZE: how often does
    * arm a's value exceed arm b's over all cross pairs, δ = (#(a>b) −
    * #(a<b)) / (n_a·n_b) ∈ [−1, 1] — the "is the shift big enough to
    * matter" companion every rank-sum verdict needs (significance says
    * nothing about magnitude at web-scale n). Equal to the normalized
    * doubled-U deviation: δ = (2U_a − n_a·n_b)/(n_a·n_b) = dev/(n_a·n_b),
    * so it rides [[rankSumFromCounts]]' exact integers — ONE truncating
    * ppm division. `magnitude` applies the standard Romano thresholds
    * (|δ| < 0.147 negligible / < 0.33 small / < 0.474 medium / else
    * large). An empty arm reads the −2·10⁶ sentinel with magnitude
    * 'undefined'. One row per key group.
    *
    * Scale shape: the [[rankSumTest]] plan verbatim (one value
    * micro-histogram, key-partitioned resolution-bounded windows, one
    * reduce) plus a map-only select.
    */
  def cliffsDelta(
      df: DataFrame, groupCol: String, valueCol: String,
      sideCol: String): DataFrame = {
    val rs = rankSumTest(df, groupCol, valueCol, sideCol)
    rs.select(col("grp"), col("n_a"), col("n_b"),
        when(col("n_a") === 0L || col("n_b") === 0L, lit(-2000000L))
          .otherwise(expr(
            """CAST((CAST(1000000 AS DECIMAL(38,0))
              |  * (u2_a - CAST(n_a AS DECIMAL(38,0)) * n_b))
              | DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"""
              .stripMargin))
          .as("delta_ppm"))
      .withColumn("magnitude",
        when(col("delta_ppm") === -2000000L, lit("undefined"))
          .when(abs(col("delta_ppm")) < 147000L, lit("negligible"))
          .when(abs(col("delta_ppm")) < 330000L, lit("small"))
          .when(abs(col("delta_ppm")) < 474000L, lit("medium"))
          .otherwise(lit("large")))
  }

  /** Chi-square term selection: for every (class, term) pair over a
    * document corpus, the 2×2 presence/absence contingency statistic
    *
    *   χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
    *
    * (a = class docs containing the term, b = other docs containing it,
    * c/d their complements), emitted in ppm for the `topK` terms per
    * class — the classical supervised vocabulary pruner (feature
    * selection for the fastText-style quality classifiers corpus filters
    * train). All counts are integers; χ² is one decimal(38,0) ratio per
    * pair, with the abTest-style double pre-check raising loudly on the
    * (astronomically distant) overflow window instead of NULLing.
    *
    * Scale shape: presence = per-doc DISTINCT tokens (array_distinct at
    * the scan, one explode), then three keyed aggregations — (class,
    * term), term, class — each with map-side combine. The contingency
    * table is the FULL |classes| × |vocab| grid (a term absent from a
    * class is evidence too, a = 0): vocab rows fan out by the broadcast
    * class list and left-join the observed (class, term) counts on their
    * own key. The final top-k window partitions by class over
    * vocabulary-sized input. No all-pairs, no driver state.
    */
  def chiSquareTerms(
      docs: DataFrame, classCol: String, textCol: String,
      topK: Int = 10): DataFrame = {
    require(topK >= 1 && topK <= 10000, "topK in [1, 10000]")
    import graft.functions.{TextFunctions => T}
    val present = docs
      .select(col(classCol).as("cls"), T.tokens(col(textCol)).as("w"))
      .withColumn("term", explode(array_distinct(col("w"))))
      .select(col("cls"), col("term"))
    val clsTerm = present.groupBy(col("cls"), col("term"))
      .agg(count(lit(1)).as("a"))
    val termTot = present.groupBy(col("term")).agg(count(lit(1)).as("t"))
    val docsPerCls = docs.select(col(classCol).as("cls"))
      .groupBy(col("cls")).agg(count(lit(1)).as("nc"))
    val nTotal = docs.agg(count(lit(1)).as("nn"))
    val d = (c: String) => col(c).cast("decimal(38,0)")
    // full class x vocab cells — a term ABSENT from a class is evidence too
    // (the textbook chi2 table has a = 0 there); the cross join fans each
    // vocab row out by the broadcast class list, |classes| x |vocab| rows
    val cells = termTot
      .crossJoin(broadcast(docsPerCls))
      .join(clsTerm, Seq("cls", "term"), "left")
      .withColumn("a", coalesce(col("a"), lit(0L)))
      .crossJoin(broadcast(nTotal))
      .withColumn("b", col("t") - col("a"))
      .withColumn("c", col("nc") - col("a"))
      .withColumn("dd", col("nn") - col("t") - col("c"))
    val numD = col("nn").cast("double") *
      pow(col("a").cast("double") * col("dd") - col("b").cast("double") * col("c"), 2)
    val scored = cells
      .withColumn("a", // 1e6·num must fit decimal(38,0): double pre-check
        when(numD < 5e31, col("a")).otherwise(raise_error(concat(
          lit("chiSquareTerms: chi2 numerator would overflow decimal(38,0) "
            + "for term "), col("term")))))
      .withColumn("delta", d("a") * d("dd") - d("b") * d("c"))
      .withColumn("num",
        lit(1000000L).cast("decimal(38,0)") * d("nn") * col("delta") * col("delta"))
      .withColumn("den", (d("a") + d("b")) * (d("c") + d("dd")) *
        (d("a") + d("c")) * (d("b") + d("dd")))
      .withColumn("chi2_ppm",
        when(col("den") === lit(0).cast("decimal(38,0)"), lit(-1L))
          .otherwise(expr("num DIV den")))
    val wTop = Window.partitionBy(col("cls"))
      .orderBy(col("chi2_ppm").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= topK)
      .select(col("cls"), col("rank").cast("bigint").as("rank"), col("term"),
        col("a").as("n_class_with_term"), col("b").as("n_other_with_term"),
        col("chi2_ppm"))
  }

  /** Cohen's kappa per group: chance-corrected inter-annotator agreement
    * over two label columns — the label-QC gate run before any
    * human-annotated (or dual-model-scored) set trains a quality
    * classifier (raw percent agreement flatters imbalanced label sets;
    * kappa does not). All-integer (q93 pattern), so bit-identical in any
    * engine:
    *
    *   po = agree/n,  pe = Σ_k rowA_k·colB_k / n²,
    *   kappa_ppm = 1e6·(n·agree − pe_num) DIV (n² − pe_num)
    *
    * with pe_num = Σ_k rowA_k·colB_k. Signed integer division truncates
    * toward zero in BOTH Spark (`DIV`) and DuckDB (`//`) — verified —
    * so negative kappas (worse-than-chance agreement) stay portable.
    * Degenerate groups (pe = 1: both raters constant) emit the −2000000
    * sentinel, outside kappa's [−1e6, 1e6] range (q122 convention — no
    * NULLs in gate-facing output).
    *
    * Scale shape: ONE shuffle to (grp, labelA, labelB) cells with
    * map-side combine (corpus → ≤ groups·labels² rows); totals, marginals
    * and the pe join all run over that bounded cell table, never the
    * corpus. Returns (grp, n_items, n_agree, po_ppm, pe_ppm, kappa_ppm).
    */
  def cohenKappa(
      df: DataFrame, groupCol: String,
      raterACol: String, raterBCol: String): DataFrame = {
    val cells = df.select(col(groupCol).as("grp"),
        col(raterACol).cast("bigint").as("ra"),
        col(raterBCol).cast("bigint").as("rb"))
      .groupBy(col("grp"), col("ra"), col("rb")).agg(count(lit(1)).as("c"))
    val totals = cells.groupBy(col("grp")).agg(
      sum(col("c")).as("n"),
      sum(when(col("ra") === col("rb"), col("c")).otherwise(lit(0L))).as("agree"))
    val ma = cells.groupBy(col("grp"), col("ra").as("k")).agg(sum(col("c")).as("na"))
    val mb = cells.groupBy(col("grp"), col("rb").as("k")).agg(sum(col("c")).as("nb"))
    val pe = ma.join(mb, Seq("grp", "k"))
      .groupBy(col("grp"))
      .agg(sum(col("na").cast("decimal(38,0)") * col("nb").cast("decimal(38,0)"))
        .as("pe_num"))
    totals
      .join(pe, Seq("grp"), "left")
      // disjoint label vocabularies: the marginal join is empty -> pe = 0
      .withColumn("pe_num", coalesce(col("pe_num"), lit(0L).cast("decimal(38,0)")))
      .withColumn("n", // 1e6·n² must fit decimal(38,0): n ≤ ~5.6e15 — pre-
        // check in double so overflow raises instead of NULLing (rocAuc)
        when(col("n").cast("double") < 5e15, col("n"))
          .otherwise(raise_error(concat(
            lit("cohenKappa: n too large for the 1e6*n^2 decimal window in group "),
            col("grp").cast("string")))))
      .select(col("grp"), col("n").as("n_items"), col("agree").as("n_agree"),
        expr("(1000000 * agree) DIV n").as("po_ppm"),
        expr("""(CAST(1000000 AS DECIMAL(38,0)) * pe_num)
                | DIV (CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)))"""
          .stripMargin).cast("bigint").as("pe_ppm"),
        when(expr("CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))") === col("pe_num"),
            lit(-2000000L))
          .otherwise(expr(
            """(CAST(1000000 AS DECIMAL(38,0)) *
              |   (CAST(n AS DECIMAL(38,0)) * CAST(agree AS DECIMAL(38,0)) - pe_num))
              | DIV (CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) - pe_num)"""
              .stripMargin).cast("bigint"))
          .as("kappa_ppm"))
  }

  /** ANN quality evaluation: per-query recall@k of an approximate
    * neighbor result against exact ground truth — THE metric that decides
    * whether an LSH/IVF/PQ index is good enough to replace brute force in
    * a similarity-dedup or retrieval pipeline. Both inputs are ranked
    * result frames `(query_id, rank, neighbor_id)` (what every operator
    * in [[Similarity]] emits); output is one row per ground-truth query:
    * `(query_id, n_true, n_hit, recall_ppm)` with
    * recall_ppm = (1e6 · |approx@k ∩ exact@k|) DIV |exact@k| — integer
    * ppm, bit-identical in any engine. Queries the approximate side
    * missed entirely still appear (n_hit = 0), because ground truth
    * drives the output — an index that silently drops queries must not
    * look perfect.
    *
    * Scale shape: both frames are |queries|·k rows (ground truth at
    * corpus scale is computed on a SAMPLED query set — the standard
    * recall-eval protocol), so the semi join and aggregation are bounded
    * by the evaluation sample, never the corpus.
    */
  def annRecallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val gt = exact.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val ap = approx.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = gt.join(ap, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    gt.groupBy(col("query_id")).agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("query_id"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .select(col("query_id"), col("n_true"), col("n_hit"),
        expr("(1000000 * n_hit) DIV n_true").as("recall_ppm"))
  }

  /** ANN mean-reciprocal-rank inputs: per ground-truth query, the rank of
    * the FIRST relevant result in the approximate list (relevant = member
    * of the exact top-k) and its reciprocal in integer ppm
    * (`rr_ppm = 1e6 DIV first_hit_rank`; 0-with-rank--1 when the index
    * never surfaces a relevant neighbor) — the "how deep must a user
    * scroll" companion to [[annRecallAtK]]'s set overlap. Averaging the
    * ppm column gives MRR; the per-query rows are emitted so the slow
    * queries are attributable, and ground truth drives the output
    * (queries the index dropped appear with rank −1, not silence).
    *
    * Scale shape: both inputs are |queries|·k ranked frames (the
    * annRecallAtK protocol), so the join and min-aggregate are bounded
    * by the evaluation sample, never the corpus.
    */
  def annMrrAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val gt = exact.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val firstHit = approx.filter(col("rank") <= k)
      .join(gt, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(min(col("rank")).cast("bigint").as("fr"))
    gt.select(col("query_id")).distinct()
      .join(firstHit, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("fr"), lit(-1L)).as("first_hit_rank"),
        coalesce(expr("1000000 DIV fr"), lit(0L)).as("rr_ppm"))
  }

  /** Per-class classification report — tp/fp/fn with precision, recall
    * and F1 in exact integer ppm, over any (label, predicted) frame
    * (e.g. [[graft.operators.Similarity.nearestCentroidClassify]]'s
    * output): the per-class quality audit a corpus-filter model gets
    * before its threshold ships. F1 uses the integer-exact form
    * `f1_ppm = (2e6·tp) DIV (2·tp + fp + fn)` — algebraically equal to
    * the harmonic mean, with no intermediate ratio to round. Classes
    * that appear only in predictions still get a row (their fn = 0,
    * recall undefined → −1 sentinel; precision likewise when the class
    * is never predicted).
    *
    * Scale shape: one (label, predicted)-keyed count with map-side
    * combine (corpus → ≤ labels² cells), then ONE union + aggregation
    * over the bounded cell table: each cell contributes an actual-side
    * row under its label and a predicted-side row under its prediction,
    * and tp/fp/fn fall out of a single groupBy — the earlier
    * marginals-plus-full-outer-join formulation cost four exchanges
    * (and, under AQE, a serial cascade of per-stage jobs) to compute the
    * same ≤ labels²-row arithmetic. Nothing after the first aggregation
    * touches the corpus.
    */
  def classificationReport(
      df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    // labels keep their own type (int classes, language codes, …) — every
    // downstream op is a groupBy/join/equality on the class key
    val cells = df.select(col(labelCol).as("y"), col(predCol).as("p"))
      .groupBy(col("y"), col("p")).agg(count(lit(1)).as("c"))
    // two tagged contribution rows per cell: (cls = y) carries the
    // actual-side count + tp when diagonal; (cls = p) the predicted-side
    // count (tp only counted on the actual side — no double count)
    cells.select(col("y").as("cls"),
        when(col("y") === col("p"), col("c")).otherwise(lit(0L)).as("tp"),
        col("c").as("n_actual"), lit(0L).as("n_pred"))
      .unionByName(cells.select(col("p").as("cls"), lit(0L).as("tp"),
        lit(0L).as("n_actual"), col("c").as("n_pred")))
      .groupBy(col("cls"))
      .agg(sum(col("tp")).as("tp"), sum(col("n_actual")).as("n_actual"),
        sum(col("n_pred")).as("n_pred"))
      .select(col("cls"), col("tp"),
        (col("n_pred") - col("tp")).as("fp"),
        (col("n_actual") - col("tp")).as("fn"))
      .select(col("cls"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") === 0, lit(-1L))
          .otherwise(expr("(1000000 * tp) DIV (tp + fp)")).as("precision_ppm"),
        when(col("tp") + col("fn") === 0, lit(-1L))
          .otherwise(expr("(1000000 * tp) DIV (tp + fn)")).as("recall_ppm"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") === 0, lit(-1L))
          .otherwise(expr("(2000000 * tp) DIV (2 * tp + fp + fn)")).as("f1_ppm"))
  }

  /** Matthews correlation coefficient per group — the single-number
    * binary-classifier summary that stays honest under class imbalance
    * (accuracy and F1 both saturate when one class dominates, the normal
    * state of a quality-filter corpus where 99% of documents pass):
    *
    *   MCC = (tp·tn − fp·fn) / √((tp+fp)(tp+fn)(tn+fp)(tn+fn))
    *
    * The four confusion cells are exact integer counts (one map-side-
    * combine aggregation per group); the numerator is formed in
    * decimal(38,0) (tp·tn alone overflows a long at ~3e9 rows per cell).
    * Only the FINAL ratio touches f64 — numerator and the four marginals
    * converted from exact integers, one fixed-order product, one IEEE
    * sqrt (correctly rounded from identical inputs in any engine), then
    * round to ppm — the q82/q88 ln convention: last-ulp engine agreement
    * everywhere except a measure-zero rounding boundary. Any zero
    * marginal (a degenerate group where a row or column of the confusion
    * matrix is empty) emits the −2e6 sentinel, outside MCC's [−1e6, 1e6]
    * range — the corrSpearman convention.
    *
    * Scale shape: corpus → 4 integers per group in ONE aggregation;
    * everything after is per-group constant work.
    */
  def mcc(
      df: DataFrame, groupCol: String, labelCol: String,
      predCol: String): DataFrame = {
    val bit = (c: String, n: String) =>
      when(col(c).cast("bigint").isin(0L, 1L), col(c).cast("bigint"))
        .otherwise(raise_error(lit(s"mcc: $n must be 0/1")))
    val cells = df
      .select(col(groupCol).as("grp"), bit(labelCol, "label").as("y"),
        bit(predCol, "pred").as("p"))
      .groupBy(col("grp"))
      .agg(sum(when(col("y") === 1 && col("p") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("y") === 0 && col("p") === 0, 1L).otherwise(0L)).as("tn"),
        sum(when(col("y") === 0 && col("p") === 1, 1L).otherwise(0L)).as("fp"),
        sum(when(col("y") === 1 && col("p") === 0, 1L).otherwise(0L)).as("fn"))
    // degenerate check marginal-by-marginal — a single long product of
    // the four marginals would ANSI-overflow-throw at ~1e5 rows per cell
    cells.select(col("grp"), col("tp"), col("tn"), col("fp"), col("fn"),
      when(col("tp") + col("fp") === 0 || col("tp") + col("fn") === 0
          || col("tn") + col("fp") === 0 || col("tn") + col("fn") === 0,
          lit(-2000000L))
        .otherwise(round(
          (col("tp").cast("decimal(38,0)") * col("tn").cast("decimal(38,0)")
            - col("fp").cast("decimal(38,0)") * col("fn").cast("decimal(38,0)"))
            .cast("double") * lit(1e6)
            / sqrt((col("tp") + col("fp")).cast("double")
              * (col("tp") + col("fn")).cast("double")
              * (col("tn") + col("fp")).cast("double")
              * (col("tn") + col("fn")).cast("double")))
          .cast("bigint")).as("mcc_ppm"))
  }

  /** Brier score + expected calibration error in ONE exact-integer pass —
    * the two-number probabilistic-quality summary next to
    * [[calibrationBins]]'s full reliability diagram. Per group:
    *
    *   brier_ppm = Σ (p − 1e6·y)² DIV (n · 1e6)
    *   ece_ppm   = Σ_bins |Σ p − 1e6·n_pos| DIV n
    *
    * The ECE identity: the usual (n_b/N)·|conf_b − acc_b| weighting has
    * the bin size cancel — n_b·|Σp/n_b − 1e6·pos_b/n_b| = |Σp − 1e6·pos_b|
    * — so the whole statistic is integer arithmetic on per-bin sums, no
    * rational intermediates at all. Both statistics are EXACT (not
    * last-ulp): any engine reproduces every bit. Per-row squared error is
    * ≤ 1e12, so sums fit decimal(38,0) to ~1e26 rows.
    *
    * Scale shape: one (grp, bin) aggregation with map-side combine
    * (corpus → groups·nBins cells), then a per-group reduce over the
    * bounded cell table.
    */
  def brierEce(
      df: DataFrame, groupCol: String, predPpmCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && nBins <= 100000, "nBins in [2, 100000]")
    df.select(col(groupCol).as("grp"),
        col(predPpmCol).cast("bigint").as("p"),
        col(labelCol).cast("bigint").as("y"))
      .withColumn("p", when(col("p").between(0L, 1000000L), col("p"))
        .otherwise(raise_error(lit("brierEce: pred must be ppm in [0, 1e6]"))))
      .withColumn("y", when(col("y").isin(0L, 1L), col("y"))
        .otherwise(raise_error(lit("brierEce: label must be 0/1"))))
      .withColumn("bin", least(lit(nBins - 1L),
        expr(s"(p * $nBins) DIV 1000000")))
      .groupBy(col("grp"), col("bin"))
      // per-row squared error <= 1e12 fits a long; the SUMS go through
      // decimal(38,0) so a trillion-row group cannot ANSI-overflow
      .agg(count(lit(1)).as("n"),
        sum(((col("p") - lit(1000000L) * col("y"))
          * (col("p") - lit(1000000L) * col("y")))
          .cast("decimal(38,0)")).as("se"),
        sum(col("p").cast("decimal(38,0)")).as("sp"),
        sum(col("y")).as("np"))
      .groupBy(col("grp"))
      .agg(sum(col("n")).as("n"), sum(col("se")).as("se"),
        sum(abs(col("sp")
          - col("np").cast("decimal(38,0)") * lit(1000000L))).as("ad"))
      .select(col("grp"), col("n"),
        expr("CAST(se DIV (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)")
          .as("brier_ppm"),
        expr("CAST(ad DIV CAST(n AS DECIMAL(38,0)) AS BIGINT)").as("ece_ppm"))
  }

  /** CUMULATIVE GAINS / LIFT chart per group — the "how much of the good
    * stuff is in the top k%" table (the marketing-curve cousin of
    * [[averagePrecision]]): rank rows by score descending (ties → id,
    * the pinned convention), cut into `nBuckets` equal-frequency
    * buckets, and per bucket report the cumulative positive share and
    * the lift over random selection:
    *
    *   gain_ppm = 10⁶·cumPos_b DIV totalPos
    *   lift_ppm = (10⁶·cumPos_b·n) DIV (totalPos·cumN_b)
    *
    * — a useless model reads lift 1e6 everywhere, a good one front-loads
    * (top decile lift ≫ 1e6). All exact integers; groups with no
    * positives emit −1 sentinels. The curation read: "keep the top 20%
    * by quality score" → this table says what fraction of known-good
    * documents that keeps.
    *
    * Scale shape: one per-group rank window (the [[averagePrecision]]
    * cost class), then a buckets-bounded aggregation; bucket =
    * `ceil(nBuckets·rank/n)` — the q123 exact-rational ntile.
    */
  def gainChart(
      df: DataFrame, groupCol: String, scoreCol: String, idCol: String,
      labelCol: String, nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 1000, "gainChart: nBuckets in [2, 1000]")
    val labeled = df.select(col(groupCol).as("grp"),
        round(col(scoreCol) * lit(1e6)).cast("bigint").as("sm"),
        col(idCol).as("id"), col(labelCol).cast("bigint").as("y"))
      .withColumn("y", when(col("y").isin(0L, 1L), col("y"))
        .otherwise(raise_error(lit("gainChart: label must be 0/1"))))
    val w = Window.partitionBy(col("grp"))
    val wr = w.orderBy(col("sm").desc, col("id"))
    val perBucket = labeled
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("bucket",
        expr(s"($nBuckets * rn + n - 1) DIV n"))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("n")).as("n_total"), count(lit(1)).as("n"),
        sum(col("y")).as("n_pos"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .withColumn("cum_n", sum(col("n")).over(wCum))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .withColumn("total_pos",
        sum(col("n_pos")).over(Window.partitionBy(col("grp"))))
      .select(col("grp"), col("bucket"), col("n"), col("n_pos"),
        when(col("total_pos") === 0, lit(-1L))
          .otherwise(expr("(1000000 * cum_pos) DIV total_pos")).as("gain_ppm"),
        when(col("total_pos") === 0, lit(-1L))
          .otherwise(expr(
            """CAST((CAST(1000000 AS DECIMAL(38,0)) * cum_pos * n_total)
              | DIV (CAST(total_pos AS DECIMAL(38,0)) * cum_n) AS BIGINT)""".stripMargin))
          .as("lift_ppm"))
  }

  /** 1-D EARTH MOVER'S DISTANCE between each group's value distribution
    * and the pooled global one — the drift number that weights mass by
    * how FAR it moved: TV/PSI/KS ([[ksTest]], `FeatureEng.psi`,
    * `TextPipeline.tokenDistributionDrift`) all read a small uniform
    * shift and a catastrophic tail teleport similarly; EMD = ∫|F_g − F|dx
    * charges by displacement, so "every score drifted +0.02" and "2% of
    * scores went to 0" separate cleanly. Exact integers on the merged
    * (global) support:
    *
    *   emd_micro = Σ_i |cumG_i·N − cumAll_i·n_g| · Δx_i  DIV  (n_g·N)
    *
    * with micro-quantized values, Δx the gap to the next distinct value,
    * and all products in decimal(38,0) — bit-reproducible anywhere.
    *
    * Scale shape: one (grp, value) count + one global value count (both
    * map-side combined); the grid is groups × DISTINCT VALUES — bounded
    * by score resolution (the rocAuc argument), never row count — with
    * one per-group prefix window over it. Quantize continuous raw
    * measurements upstream.
    */
  def emdVsGlobal(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("grp"),
      round(col(valueCol) * lit(1e6)).cast("bigint").as("sm"))
    val byGrp = base.groupBy(col("grp"), col("sm")).agg(count(lit(1)).as("cg"))
    val glob = base.groupBy(col("sm")).agg(count(lit(1)).as("c_all"))
    val ng = base.groupBy(col("grp")).agg(count(lit(1)).as("n_g"))
    // both grid sides are aggregate-bounded; hint the (smaller) group
    // list so the plan is a BroadcastNestedLoop by construction instead
    // of relying on AQE to rescue a cartesian exchange
    val grid = glob.crossJoin(broadcast(ng.select(col("grp"))))
      .join(byGrp, Seq("grp", "sm"), "left")
      .select(col("grp"), col("sm"),
        coalesce(col("cg"), lit(0L)).as("ca"), col("c_all").as("cb"))
    emdFromCounts(grid, Seq("grp"))
      .select(col("grp"), col("n_a").as("n"), col("emd_micro"))
  }

  /** The EMD reduction over PRE-AGGREGATED per-value counts
    * `(keys..., sm, ca, cb)` — the arithmetic [[emdVsGlobal]] and the
    * streaming drift monitor (`graft.streaming.StreamingEmd`) share, so
    * batch and stream cannot diverge (the [[ksFromCounts]] convention).
    * Emits one row per key group: `(keys..., n_a, n_b, emd_micro)` —
    * −1 when either side is empty.
    */
  def emdFromCounts(perValue: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "emdFromCounts: need at least one key column")
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("sm"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(kc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val d = (c: Column) => c.cast("decimal(38,0)")
    perValue
      .withColumn("cum_a", sum(col("ca")).over(wCum))
      .withColumn("cum_b", sum(col("cb")).over(wCum))
      .withColumn("n_a", sum(col("ca")).over(wAll))
      .withColumn("n_b", sum(col("cb")).over(wAll))
      .withColumn("dx", coalesce(lead(col("sm"), 1).over(w) - col("sm"), lit(0L)))
      .withColumn("term",
        abs(d(col("cum_a")) * d(col("n_b")) - d(col("cum_b")) * d(col("n_a")))
          * d(col("dx")))
      .groupBy(kc: _*)
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(col("term")).as("s"))
      .select(kc ++ Seq(col("n_a"), col("n_b"),
        when(col("n_a") === 0 || col("n_b") === 0, lit(-1L))
          .otherwise(expr(
            """CAST(s DIV (CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0)))
              | AS BIGINT)""".stripMargin))
          .as("emd_micro")): _*)
  }

  /** SPLIT-CONFORMAL prediction interval per group — distribution-free
    * uncertainty for ANY point predictor: on an md5-gated calibration
    * split, take the conformal quantile of absolute residuals
    *
    *   q̂ = the ⌈(n_cal+1)·(1−α)⌉-th smallest |actual − pred|
    *
    * and the interval `pred ± q̂` covers a fresh point with probability
    * ≥ 1−α, NO assumptions on the model or the noise (only
    * exchangeability). Split membership hashes on the id (the
    * `DataPrep.hashSplit` convention), the rank is the exact integer
    * conformal rank (clear-denominator: `rank = ((n_cal+1)·(den−num)
    * + den − 1) DIV den` for α = num/den), residuals are micro
    * integers. Also reports the EMPIRICAL coverage of `±q̂` on the
    * held-out (non-calibration) rows — the honesty check that the
    * guarantee actually materialized. Calibration sets too small for
    * the rank (rank > n_cal) emit the −1 sentinel. EVERY input group
    * emits a row (the `averagePrecision` all-groups convention): a
    * group whose rows all landed in the calibration split reports
    * `n_eval = 0, coverage_ppm = −1` instead of vanishing silently.
    *
    * Scale shape: one per-group rank window over CALIBRATION rows only,
    * one broadcast-size (group, q̂) table joined back for the coverage
    * count, one group-level driving aggregate — all group-parallel.
    */
  def splitConformalInterval(
      df: DataFrame, groupCol: String, predCol: String, actualCol: String,
      idCol: String, alphaNum: Long = 1L, alphaDen: Long = 10L,
      calBps: Int = 5000): DataFrame = {
    require(alphaNum >= 1 && alphaNum < alphaDen && alphaDen <= 1000,
      "splitConformalInterval: alpha must be a rational in (0, 1), den <= 1000")
    require(calBps >= 1 && calBps <= 9999,
      "splitConformalInterval: calBps in [1, 9999]")
    val gate = f"${calBps.toLong * 65536 / 10000}%04x"
    val base = df.select(col(groupCol).as("grp"),
        round(col(predCol) * lit(1e6)).cast("bigint").as("pm"),
        round(col(actualCol) * lit(1e6)).cast("bigint").as("am"),
        col(idCol).cast("bigint").as("id"))
      .withColumn("res", abs(col("am") - col("pm")))
      .withColumn("cal",
        (substring(md5(concat(lit("conf:"), col("id"))), 1, 4) < lit(gate))
          .cast("int"))
    val wr = Window.partitionBy(col("grp")).orderBy(col("res"), col("id"))
    val qhat = base.filter(col("cal") === 1)
      .withColumn("rn", row_number().over(wr))
      .withColumn("n_cal", count(lit(1)).over(Window.partitionBy(col("grp"))))
      .groupBy(col("grp"))
      .agg(max(col("n_cal")).as("n_cal"),
        min(when(col("rn") ===
            expr(s"((n_cal + 1) * ${alphaDen - alphaNum} + $alphaDen - 1) DIV $alphaDen"),
          col("res"))).as("qhat_micro"))
    val evalAgg = base.filter(col("cal") === 0)
      .join(broadcast(qhat), Seq("grp"), "left")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("res") <= col("qhat_micro"), 1L).otherwise(0L))
          .as("n_covered"))
    base.groupBy(col("grp")).agg(count(lit(1)).as("__n")).drop("__n")
      .join(broadcast(qhat), Seq("grp"), "left")
      .join(broadcast(evalAgg), Seq("grp"), "left")
      .select(col("grp"), coalesce(col("n_cal"), lit(0L)).as("n_cal"),
        coalesce(col("n_eval"), lit(0L)).as("n_eval"),
        coalesce(col("qhat_micro"), lit(-1L)).as("qhat_micro"),
        when(col("qhat_micro").isNull || col("n_eval").isNull, lit(-1L))
          .otherwise(expr("(1000000 * n_covered) DIV n_eval"))
          .as("coverage_ppm"))
  }

  /** RANK-BIASED OVERLAP at k between the approximate and exact result
    * lists — the ANN list-similarity number that weights agreement at the
    * TOP: recall@k treats depth-1 and depth-k agreement alike, nDCG needs
    * graded relevance; RBO's geometric depth weights (Webber et al.)
    * compare the two RANKINGS as a user would read them:
    *
    *   RBO@k = (1−p) · Σ_{d=1..k} p^(d−1) · X_d / d,
    *   X_d = |A[1..d] ∩ B[1..d]| ,  p = pNum/pDen (default 9/10)
    *
    * FULLY EXACT — no floats: with rational p every term is a rational
    * with denominator pDen^d·d, so the whole sum is taken over the
    * common denominator C = pDen^k·lcm(1..k) with per-depth integer
    * coefficients `coeff(d) = (pDen−pNum)·pNum^(d−1)·pDen^(k−d)·(L/d)`
    * precomputed as literals; `rbo_ppm = (10⁶·Σ coeff·X_d) DIV C`. An
    * item shared by both lists enters X_d from depth max(rank_a, rank_b).
    *
    * Scale shape: both inputs are |queries|·k ranked frames — one
    * inner join on (query, neighbor), one bounded per-query collect of
    * ≤ k depths, then an O(k²) literal fold per query. Ground truth
    * drives the output (dropped queries read 0, not silence). k ≤ 12
    * keeps C and every product inside decimal(38,0) comfortably.
    */
  def annRboAtK(
      approx: DataFrame, exact: DataFrame, k: Int,
      pNum: Long = 9L, pDen: Long = 10L): DataFrame = {
    require(k >= 1 && k <= 12, "annRboAtK: k in [1, 12]")
    require(pNum >= 1 && pNum < pDen && pDen <= 10,
      "annRboAtK: p = pNum/pDen must be a rational in (0, 1) with pDen <= 10")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcmK = (1L to k.toLong).reduce((a, b) => a / gcd(a, b) * b)
    val cDen = BigInt(pDen).pow(k).toLong * lcmK
    val coeffs = (1 to k).map { d =>
      (pDen - pNum) * BigInt(pNum).pow(d - 1).toLong *
        BigInt(pDen).pow(k - d).toLong * (lcmK / d)
    }
    val coeffLit = typedLit(coeffs)
    val shared = exact.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("rb"))
      .join(approx.filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("rank").as("ra")),
        Seq("query_id", "neighbor_id"))
      .select(col("query_id"),
        greatest(col("ra").cast("int"), col("rb").cast("int")).as("m"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_shared"),
        sort_array(collect_list(col("m"))).as("ms"))
    exact.filter(col("rank") <= k).groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_true"))
      .join(shared, Seq("query_id"), "left")
      .withColumn("__coeffs", coeffLit)
      .select(col("query_id"), col("n_true"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        coalesce(
          expr(s"""CAST((1000000 * aggregate(sequence(1, $k),
                  |  CAST(0 AS DECIMAL(38,0)),
                  |  (acc, d) -> acc + element_at(__coeffs, d)
                  |    * size(filter(ms, x -> x <= d))))
                  | DIV $cDen AS BIGINT)""".stripMargin),
          lit(0L)).as("rbo_ppm"))
  }

  /** THRESHOLD SELECTION for a target precision — the decision step the
    * whole eval family feeds: given scored+labeled rows, find the LOWEST
    * score cutoff whose "keep everything ≥ cutoff" policy still meets a
    * precision target (lowest = maximum recall at that precision). This
    * is the operator that turns a quality model into a filter config.
    *
    * Per group, over DISTINCT micro scores descending: cumulative
    * tp/kept prefix sums, the exact integer gate
    * `10⁶·tp_cum ≥ targetPpm·kept_cum`, then the minimum qualifying
    * score. Output: `threshold_micro` (−1 sentinel when no cutoff meets
    * the target — including no-positive groups), achieved
    * precision/recall at that cutoff, and kept counts. All integers; the
    * precision gate cannot straddle a float boundary.
    *
    * Scale shape: [[rocAuc]]'s — one (grp, score) aggregation with
    * map-side combine, prefix windows over DISTINCT scores only
    * (bounded by score resolution, not corpus size), one per-group
    * reduce.
    */
  def thresholdForPrecision(
      df: DataFrame, groupCol: String, scoreCol: String, labelCol: String,
      targetPpm: Long): DataFrame = {
    require(targetPpm >= 1 && targetPpm <= 1000000L,
      "thresholdForPrecision: targetPpm in [1, 1e6]")
    val labeled = df.select(col(groupCol).as("grp"),
        round(col(scoreCol) * lit(1e6)).cast("bigint").as("sm"),
        col(labelCol).cast("bigint").as("y"))
      .withColumn("y", when(col("y").isin(0L, 1L), col("y"))
        .otherwise(raise_error(lit("thresholdForPrecision: label must be 0/1"))))
    thresholdFromScoreCounts(
      labeled.groupBy(col("grp"), col("sm"))
        .agg(sum(col("y")).as("pos"), count(lit(1)).as("cnt")),
      targetPpm, scope = Seq.empty)
  }

  /** The [[thresholdForPrecision]] REDUCTION from per-(group, distinct
    * micro score) counts `(grp, sm, pos, cnt)` — shared by the batch
    * selector and `graft.streaming.StreamingThreshold` (whose windowed
    * counts reduce per closed window with `scope = Seq("win_start_us")`),
    * so batch and stream cannot diverge. Prefix sums and the qualifying
    * minimum are taken WITHIN each scope.
    */
  def thresholdFromScoreCounts(
      counts: DataFrame, targetPpm: Long, scope: Seq[String]): DataFrame = {
    require(targetPpm >= 1 && targetPpm <= 1000000L,
      "thresholdFromScoreCounts: targetPpm in [1, 1e6]")
    val keys = scope.map(col) :+ col("grp")
    val wDesc = Window.partitionBy(keys: _*).orderBy(col("sm").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("tp_cum", sum(col("pos")).over(wDesc))
      .withColumn("kept_cum", sum(col("cnt")).over(wDesc))
      .withColumn("ok",
        lit(1000000L) * col("tp_cum") >= lit(targetPpm) * col("kept_cum"))
      .groupBy(keys: _*)
      .agg(sum(col("pos")).as("n_pos"), sum(col("cnt")).as("n"),
        min(when(col("ok"), col("sm"))).as("threshold_micro"),
        // kept_cum strictly grows as the cutoff lowers, so the max struct
        // IS the stats row of the lowest qualifying cutoff
        max(when(col("ok"), struct(col("kept_cum"), col("tp_cum")))).as("best")
      )
      .select(scope.map(col) ++ Seq(col("grp"), col("n"), col("n_pos"),
        coalesce(col("threshold_micro"), lit(-1L)).as("threshold_micro"),
        when(col("threshold_micro").isNull, lit(-1L))
          .otherwise(expr("(1000000 * best.tp_cum) DIV best.kept_cum"))
          .as("precision_ppm"),
        when(col("threshold_micro").isNull, lit(-1L))
          .otherwise(when(col("n_pos") === 0, lit(-1L))
            .otherwise(expr("(1000000 * best.tp_cum) DIV n_pos")))
          .as("recall_ppm"),
        coalesce(col("best.kept_cum"), lit(0L)).as("n_kept")): _*)
  }

  /** NORMALIZED MUTUAL INFORMATION between a cluster assignment and a
    * label column — the external clustering-quality audit next to
    * `Similarity.clusterSilhouette`'s internal one: silhouette asks "are
    * the clusters compact?", NMI asks "do they MEAN anything?" (do IVF
    * buckets / LSH buckets / topic clusters line up with known classes).
    *
    *   MI    = Σ_{c,l} (n_cl/n)·ln(n_cl·n / (n_c·n_l))
    *   H(C)  = Σ_c (n_c/n)·ln(n/n_c),  H(L) likewise
    *   NMI   = MI / max(H(C), H(L))    (the max normalization — no sqrt)
    *
    * Each term is rounded to integer NANO-nats before the order-
    * independent sum (the jsDivergencePairs convention);
    * `nmi_ppm = (10⁶·mi_nano) DIV max(hc_nano, hl_nano)`, with the −1
    * sentinel when either partition is degenerate (single cluster or
    * single label ⇒ entropy 0 ⇒ NMI undefined).
    *
    * Scale shape: corpus → clusters×labels contingency cells in ONE
    * map-side-combine aggregation; marginals, entropies, and the final
    * ratio all derive from the bounded cell table. Per-group audits
    * parallelize independently.
    */
  def nmiClusterLabel(
      df: DataFrame, groupCol: String, clusterCol: String,
      labelCol: String): DataFrame = {
    val cells = df.select(col(groupCol).as("grp"),
        col(clusterCol).as("c"), col(labelCol).as("l"))
      .groupBy(col("grp"), col("c"), col("l")).agg(count(lit(1)).as("n_cl"))
    val mc = cells.groupBy(col("grp"), col("c")).agg(sum(col("n_cl")).as("n_c"))
    val ml = cells.groupBy(col("grp"), col("l")).agg(sum(col("n_cl")).as("n_l"))
    val nn = cells.groupBy(col("grp")).agg(sum(col("n_cl")).as("n"))
    val mi = cells.join(mc, Seq("grp", "c")).join(ml, Seq("grp", "l"))
      .join(nn, Seq("grp"))
      .select(col("grp"),
        round(lit(1e9) * (col("n_cl").cast("double") / col("n"))
          * log((col("n_cl").cast("double") * col("n"))
            / (col("n_c").cast("double") * col("n_l"))))
          .cast("bigint").as("t"))
      .groupBy(col("grp")).agg(sum(col("t")).as("mi_nano"))
    def entropy(marg: DataFrame, cntCol: String, out: String) =
      marg.join(nn, Seq("grp"))
        .select(col("grp"),
          round(lit(1e9) * (col(cntCol).cast("double") / col("n"))
            * log(col("n").cast("double") / col(cntCol)))
            .cast("bigint").as("t"))
        .groupBy(col("grp")).agg(sum(col("t")).as(out))
    nn.join(mi, Seq("grp"))
      .join(entropy(mc, "n_c", "hc_nano"), Seq("grp"))
      .join(entropy(ml, "n_l", "hl_nano"), Seq("grp"))
      .select(col("grp"), col("n"), col("mi_nano"), col("hc_nano"),
        col("hl_nano"),
        when(greatest(col("hc_nano"), col("hl_nano")) === 0L, lit(-1L))
          .otherwise(expr(
            "(1000000 * mi_nano) DIV greatest(hc_nano, hl_nano)"))
          .as("nmi_ppm"))
  }

  /** FAIRNESS AUDIT of a binary classifier across protected cohorts —
    * demographic parity (selection rate), equalized-odds TPR/FPR, and
    * each cohort's gap to the best-treated cohort, all exact integer
    * ppm. A quality/safety filter over a multilingual, multi-source
    * corpus IS a classifier over protected-ish cohorts (language,
    * region, dialect); this is the per-cohort disparity table that
    * decision reviews read:
    *
    *   sel_ppm = 10⁶·P(pred=1 | g),  tpr/fpr likewise conditioned on y,
    *   *_gap_ppm = max over cohorts − this cohort (sentinel cohorts —
    *   no positives / no negatives — emit −1 and stay out of the max).
    *
    * Scale shape: corpus → 5 integers per cohort in ONE map-side-combine
    * aggregation; the gap columns are a window over the cohort-bounded
    * result. Nothing after the first aggregation touches the corpus.
    */
  def fairnessGaps(
      df: DataFrame, protectedCol: String, labelCol: String,
      predCol: String): DataFrame = {
    val bit = (c: String, n: String) =>
      when(col(c).cast("bigint").isin(0L, 1L), col(c).cast("bigint"))
        .otherwise(raise_error(lit(s"fairnessGaps: $n must be 0/1")))
    fairnessFromCounts(
      df.select(col(protectedCol).as("grp"),
          bit(labelCol, "label").as("y"), bit(predCol, "pred").as("p"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"),
          sum(col("p")).as("n_sel"),
          sum(col("y")).as("n_pos"),
          sum(col("y") * col("p")).as("n_tp"),
          sum((lit(1L) - col("y")) * col("p")).as("n_fp")),
      scope = Seq.empty)
  }

  /** The [[fairnessGaps]] REDUCTION from per-cohort confusion counts
    * `(grp, n, n_sel, n_pos, n_tp, n_fp)` — shared by the batch audit
    * and `graft.streaming.StreamingFairness` (whose windowed counts
    * reduce per closed window with `scope = Seq("win_start_us")`), so
    * batch and stream cannot diverge. Gap maxima are taken WITHIN each
    * scope; sentinel cohorts stay out of the max.
    */
  def fairnessFromCounts(
      counts: DataFrame, scope: Seq[String]): DataFrame = {
    val all = Window.partitionBy(scope.map(col): _*)
    counts
      .select(scope.map(col) ++ Seq(col("grp"), col("n"),
        expr("(1000000 * n_sel) DIV n").as("sel_ppm"),
        when(col("n_pos") === 0, lit(-1L))
          .otherwise(expr("(1000000 * n_tp) DIV n_pos")).as("tpr_ppm"),
        when(col("n") - col("n_pos") === 0, lit(-1L))
          .otherwise(expr("(1000000 * n_fp) DIV (n - n_pos)")).as("fpr_ppm")): _*)
      .withColumn("sel_gap_ppm", max(col("sel_ppm")).over(all) - col("sel_ppm"))
      .withColumn("tpr_gap_ppm",
        when(col("tpr_ppm") === -1L, lit(-1L))
          .otherwise(max(when(col("tpr_ppm") >= 0L, col("tpr_ppm"))).over(all)
            - col("tpr_ppm")))
      .withColumn("fpr_gap_ppm",
        when(col("fpr_ppm") === -1L, lit(-1L))
          .otherwise(max(when(col("fpr_ppm") >= 0L, col("fpr_ppm"))).over(all)
            - col("fpr_ppm")))
  }

  /** AVERAGE PRECISION (area under the ranked precision-recall curve) per
    * group — the single-number PR summary next to [[prCurve]]'s bucketed
    * curve and [[rocAuc]]'s ranking quality: AUC asks "are positives
    * ranked above negatives?", AP asks "how early do they arrive?" —
    * under heavy class imbalance (every quality-filter corpus) AP is the
    * number that moves when the top of the ranking degrades.
    *
    *   AP = (1/P) · Σ_{rank k : y_k = 1} precision@k,
    *   precision@k = posCum(k)/k
    *
    * over the DETERMINISTIC order (score desc, id asc) — tie handling is
    * pinned by the id, so the statistic is exact and engine-portable:
    * `term_ppm = (10⁶·posCum) DIV k` at each positive rank,
    * `ap_ppm = Σ term DIV P`. All integers, no float boundary anywhere.
    * Groups with no positives emit the −1 sentinel.
    *
    * Scale shape: ONE per-group window sort over the scored rows (the
    * q81/q109 rank-window cost class — unlike [[rocAuc]] the ranked
    * definition genuinely depends on per-row order, so distinct-score
    * compression doesn't apply), then a per-group reduce over the
    * positive ranks only. Numeric window: 10⁶·posCum fits a long to
    * ~9·10¹² rows per group; sums go through decimal(38,0).
    */
  def averagePrecision(
      df: DataFrame, groupCol: String, scoreCol: String, idCol: String,
      labelCol: String): DataFrame = {
    val labeled = df.select(col(groupCol).as("grp"),
        round(col(scoreCol) * lit(1e6)).cast("bigint").as("sm"),
        col(idCol).as("id"), col(labelCol).cast("bigint").as("y"))
      .withColumn("y", when(col("y").isin(0L, 1L), col("y"))
        .otherwise(raise_error(lit("averagePrecision: label must be 0/1"))))
    val w = Window.partitionBy(col("grp")).orderBy(col("sm").desc, col("id"))
    val terms = labeled
      .withColumn("rank", row_number().over(w))
      .withColumn("pc",
        sum(col("y")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("y") === 1)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_pos"),
        sum(expr("(1000000 * pc) DIV rank").cast("decimal(38,0)")).as("s"))
    labeled.select(col("grp")).distinct()
      .join(terms, Seq("grp"), "left")
      .select(col("grp"), coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        when(col("n_pos").isNull, lit(-1L))
          .otherwise(expr("CAST(s DIV CAST(n_pos AS DECIMAL(38,0)) AS BIGINT)"))
          .as("ap_ppm"))
  }

  /** Benjamini–Hochberg FDR step-up over a FAMILY of hypothesis tests —
    * the multiple-comparisons control a pipeline needs the moment it runs
    * an A/B gate (q140), chi-square selection (q147), or KS drift test
    * (q154) per metric/segment/feature: at α=0.05, fifty independent true
    * nulls yield ~2.5 spurious "significant" results; BH caps the
    * expected FALSE-DISCOVERY fraction at α instead of the per-test
    * error.
    *
    * Procedure, all-integer (α given as the rational `alphaNum/alphaDen`):
    * rank p-values ascending (ties broken by test id — deterministic),
    * find the largest rank k with `p_(k)·m·alphaDen ≤ k·alphaNum·1e6`
    * (the exact clear-denominator form of p_(k) ≤ (k/m)·α — a float gate
    * can straddle the boundary, an integer product cannot), reject ranks
    * ≤ k. Also emits the BH ADJUSTED q-value as the running suffix-min of
    * `(p_(j)·m) DIV j` — the smallest α at which each test would still be
    * rejected (up to DIV truncation), monotone by construction.
    *
    * Scale shape: `m` is the number of TESTS (metrics × segments), not
    * corpus rows — the heavy per-test aggregation happened upstream. One
    * window sort per family; families parallelize independently.
    * Products go through decimal(38,0) so a million-test family with
    * alphaDen 1000 cannot overflow.
    */
  def bhFdr(
      df: DataFrame, groupCol: String, testCol: String, pPpmCol: String,
      alphaNum: Long = 1L, alphaDen: Long = 20L): DataFrame = {
    require(alphaNum >= 1 && alphaDen >= 1 && alphaNum < alphaDen,
      "bhFdr: alpha must be a rational in (0, 1)")
    val w = Window.partitionBy(col("grp"))
    val wRank = w.orderBy(col("p_ppm"), col("test_id"))
    val wSuffix = wRank.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    df.select(col(groupCol).as("grp"), col(testCol).as("test_id"),
        col(pPpmCol).cast("bigint").as("p_ppm"))
      .withColumn("p_ppm",
        when(col("p_ppm").between(0L, 1000000L), col("p_ppm"))
          .otherwise(raise_error(lit("bhFdr: p must be ppm in [0, 1e6]"))))
      .withColumn("m", count(lit(1)).over(w))
      .withColumn("rank", row_number().over(wRank))
      .withColumn("pass",
        col("p_ppm").cast("decimal(38,0)") * col("m") * lit(alphaDen)
          <= col("rank").cast("decimal(38,0)") * lit(alphaNum) * lit(1000000L))
      .withColumn("k", max(when(col("pass"), col("rank"))).over(w))
      .withColumn("q_ppm", least(lit(1000000L),
        min(expr("CAST((CAST(p_ppm AS DECIMAL(38,0)) * m) DIV rank AS BIGINT)"))
          .over(wSuffix)))
      .select(col("grp"), col("test_id"), col("p_ppm"), col("rank"),
        col("q_ppm"),
        (col("rank") <= coalesce(col("k"), lit(0L))).cast("bigint").as("rejected"))
  }

  /** ANN normalized discounted cumulative gain at k: position-weighted
    * relevance of the approximate list against the exact top-k —
    * [[annRecallAtK]] ignores WHERE in the window a true neighbor lands
    * and [[annMrrAtK]] only sees the first, nDCG weights every position:
    *
    *   DCG  = Σ_{i≤k, approx[i] ∈ exact top-k} 1/log2(i+1)
    *   IDCG = Σ_{i≤n_true} 1/log2(i+1),   ndcg_ppm = round(1e6·DCG/IDCG)
    *
    * The discounts 1/log2(i+1) are IEEE doubles of SMALL INTEGER
    * arguments summed in fixed rank order, so the q82 ln convention
    * applies: any engine agrees to the last ulp and the ppm rounding only
    * bites on a measure-zero boundary. Ground truth drives the output —
    * queries the index dropped score 0, not silence.
    *
    * Scale shape: both inputs are |queries|·k ranked frames (the
    * annRecallAtK protocol) — a semi join and two bounded aggregations.
    */
  def annNdcgAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val disc = (r: Column) => lit(1.0) / log2(r.cast("double") + lit(1.0))
    val gt = exact.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val wr = Window.partitionBy(col("query_id")).orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dcg = approx.filter(col("rank") <= k)
      .join(gt, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id"))
      // fixed summation order: rank ascending via sort_array over
      // (rank, discount) pairs would be overkill — discounts of distinct
      // small ranks sum identically in any order only up to ulps, so pin
      // the order with a rank-sorted array fold
      .agg(sort_array(collect_list(col("rank").cast("int"))).as("rks"))
      .select(col("query_id"), aggregate(col("rks"), lit(0.0),
        (acc, r) => acc + disc(r)).as("dcg"))
    gt.groupBy(col("query_id")).agg(count(lit(1)).cast("int").as("n_true"))
      .join(dcg, Seq("query_id"), "left")
      .select(col("query_id"), col("n_true").cast("bigint").as("n_true"),
        round(coalesce(col("dcg"), lit(0.0)) * lit(1e6)
          / aggregate(sequence(lit(1), col("n_true")), lit(0.0),
            (acc, r) => acc + disc(r))).cast("bigint").as("ndcg_ppm"))
  }

  /** CLASS-BALANCE report — the dataset-skew check run before any
    * classifier trains or any stratified mix is drawn: label entropy in
    * micro-nats (per-class terms `round(10⁶·(c·ln(N/c))/N)` — the q74 ln
    * convention, integer-summed so any engine reproduces the total), the
    * EFFECTIVE class count `exp(H)` (the "how many classes does this
    * dataset behave like" number — K balanced classes read exactly K;
    * one dominant class drags it toward 1), and the max/min class shares
    * in exact ppm. One row out:
    * `(n_rows, n_classes, entropy_micro_nats, effective_classes_micro,
    * max_share_ppm, min_share_ppm)`; an empty input reads −1 sentinels.
    * The one `exp` carries the same 1-ulp libm caveat as the ln terms,
    * corpus-validated per SF.
    *
    * Scale shape: one map-side-combined label count, a 1-row totals
    * broadcast, and a class-bounded reduction — nothing row-scaled past
    * the first aggregate.
    */
  def classBalance(df: DataFrame, labelCol: String): DataFrame = {
    val c = df.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("c"))
    val tot = c.agg(coalesce(sum(col("c")), lit(0L)).as("n"),
      count(lit(1)).as("k"),
      coalesce(max(col("c")), lit(0L)).as("cmax"),
      coalesce(min(col("c")), lit(0L)).as("cmin"))
    val h = c.crossJoin(broadcast(tot.select(col("n").as("__n"))))
      .select(round(lit(1e6) *
        (col("c").cast("double") *
          log(col("__n").cast("double") / col("c").cast("double"))) /
        col("__n").cast("double")).cast("bigint").as("term"))
      .agg(coalesce(sum(col("term")), lit(0L)).as("h_micro"))
    tot.crossJoin(broadcast(h))
      .select(col("n").as("n_rows"), col("k").as("n_classes"),
        when(col("n") === 0L, lit(-1L)).otherwise(col("h_micro"))
          .as("entropy_micro_nats"),
        when(col("n") === 0L, lit(-1L))
          .otherwise(round(lit(1e6) *
            exp(col("h_micro").cast("double") / lit(1e6))).cast("bigint"))
          .as("effective_classes_micro"),
        // decimal-cleared: 10⁶·count overflows long past 10¹³ rows
        when(col("n") === 0L, lit(-1L))
          .otherwise(expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * cmax) DIV n AS BIGINT)"))
          .as("max_share_ppm"),
        when(col("n") === 0L, lit(-1L))
          .otherwise(expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * cmin) DIV n AS BIGINT)"))
          .as("min_share_ppm"))
  }

  /** McNEMAR PAIRED test — "is filter/model B actually better than A on
    * the SAME examples?" (comparing two accuracies computed on one eval
    * set ignores the pairing; only the DISCORDANT examples carry
    * evidence). Input: two 0/1 correctness indicator columns. One row:
    * per-model accuracies in exact ppm, the discordant counts b (A
    * right, B wrong) and c (A wrong, B right), and the continuity-
    * corrected statistic
    *
    *   mcnemar_micro = round(10⁶·(|b−c|−1)₊² / (b+c))   (χ²₁),
    *
    * −1 sentinel when b+c = 0 (no discordance — the models are
    * indistinguishable on this set). Exactness: counts are exact, the
    * statistic is ONE f64 divide of exact integers rounded to micro
    * (q227 convention); accuracies are toward-zero ppm divisions.
    *
    * Scale shape: ONE aggregation over the eval frame — map-side
    * combined counts, no joins, no windows, nothing driver-side.
    */
  def mcnemarTest(
      df: DataFrame, correctACol: String, correctBCol: String): DataFrame =
    df.select(col(correctACol).cast("bigint").as("ca"),
        col(correctBCol).cast("bigint").as("cb"))
      .agg(count(lit(1)).as("n"), sum(col("ca")).as("na"),
        sum(col("cb")).as("nb"),
        sum(col("ca") * (lit(1L) - col("cb"))).as("b"),
        sum((lit(1L) - col("ca")) * col("cb")).as("c"))
      .select(col("n"),
        when(col("n") === 0L, lit(-1L))
          .otherwise(expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * na DIV n AS BIGINT)"))
          .as("acc_a_ppm"),
        when(col("n") === 0L, lit(-1L))
          .otherwise(expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * nb DIV n AS BIGINT)"))
          .as("acc_b_ppm"),
        coalesce(col("b"), lit(0L)).as("b"),
        coalesce(col("c"), lit(0L)).as("c"),
        when(coalesce(col("b"), lit(0L)) + coalesce(col("c"), lit(0L))
            === 0L, lit(-1L))
          .otherwise(expr(
            """CAST(round(1e6
              |  * CAST(CAST(greatest(CAST(0 AS BIGINT), abs(b - c) - 1)
              |      AS DECIMAL(38,0))
              |    * greatest(CAST(0 AS BIGINT), abs(b - c) - 1) AS DOUBLE)
              |  / CAST(b + c AS DOUBLE)) AS BIGINT)""".stripMargin))
          .as("mcnemar_micro"))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tabular feature-engineering stages for a training pipeline: the
  * transforms that turn raw event/transaction columns into model inputs
  * (discretize, encode, fold, clamp, pair-generate, align). Everything is
  * a single keyed shuffle or a map-only projection, and every output is
  * exact integer fixed point, so any engine reproduces the features
  * bit-for-bit — the feature-parity property online/offline serving
  * systems are built around.
  */
object FeatureEng {

  /** Equal-frequency discretization (quantile binning) per group:
    * `bin = (nBins * (rn - 1)) DIV n` over the deterministic (value, id)
    * rank — the rational-arithmetic form of ntile that every engine
    * reproduces exactly (ntile's remainder-distribution convention is
    * engine-folklore; a rank ratio is not). Bins are equal-frequency up
    * to integer rounding; the id tie-break makes duplicate values land
    * deterministically.
    *
    * One exchange on the group key (the [[DataPrep.rankedByGroup]]
    * window); map-only after that. At 100 TB: groups parallelize
    * independently, and a skewed group pays one sort of its own rows —
    * same contract as rankNormalize.
    */
  def quantileBin(
      df: DataFrame, groupCol: String, valueCol: String, idCol: String,
      nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 10000, "nBins in [2, 10000]")
    DataPrep.rankedByGroup(df, groupCol, valueCol, idCol)
      .select(col("id"), col("grp"), col("xm").as("value_micro"),
        expr(s"($nBins * (rn - 1)) DIV n").as("bin"))
  }

  /** Leave-one-out target encoding: each row's category is replaced by
    * the mean target of the OTHER rows in the category —
    * `enc = (sum - own) DIV (n - 1)` in micro fixed point (truncating
    * integer division; target must be non-negative for DIV to agree
    * across engines — checked). Excluding the row itself is the standard
    * leakage guard: a naive category mean feeds each row its own label.
    * Singleton categories have no peers and emit the -1 sentinel (the
    * q122 convention — no NULLs in gate-facing output).
    *
    * One window over the category key — single exchange, no join, no
    * driver state; category cardinality never matters because the
    * aggregates ride the same partitioning as the rows.
    */
  def targetEncode(
      df: DataFrame, catCol: String, targetCol: String, idCol: String): DataFrame = {
    val wc = Window.partitionBy(col("cat"))
    df.select(col(idCol).cast("bigint").as("id"), col(catCol).as("cat"),
        round(col(targetCol) * lit(1e6)).cast("bigint").as("tm"))
      .withColumn("tm", when(col("tm") >= 0, col("tm")).otherwise(raise_error(
        lit("targetEncode: negative target — DIV truncation is not "
          + "floor-division-portable below zero; shift the target first"))))
      .withColumn("n", count(lit(1)).over(wc))
      .withColumn("sum_tm", sum(col("tm")).over(wc))
      .select(col("id"), col("cat"), col("tm").as("target_micro"),
        when(col("n") === 1, lit(-1L))
          .otherwise(expr("(sum_tm - tm) DIV (n - 1)")).as("loo_mean_micro"))
  }

  /** Deterministic k-fold assignment for cross-validation:
    * `fold = md5(id)[0:8] % k` — content-independent, stateless,
    * map-only, and portable (the [[DataPrep.hashSplit]] family; the
    * first 8 hex chars fit exactly in a long, so the modulus is the same
    * integer everywhere). A row's fold never depends on other rows, so
    * folds are stable under reruns, repartitioning, and corpus growth.
    */
  def kFoldAssign(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 1000, "k in [2, 1000]")
    df.withColumn("fold",
      (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("bigint") % k).cast("bigint"))
  }

  /** Winsorization (percentile clamping) per group: values below the
    * `lowBps` percentile rise to it, values above `highBps` drop to it.
    * Percentiles use the explicit discrete-rank definition the oracle
    * family standardizes on (q81): cut rank r = max(1, ceil(p·n)) as the
    * exact integer `(bps·n + 9999) DIV 10000`, cut value = the xm at
    * rank r (computed as `min(xm | rn >= r)`, exact because xm is
    * monotone in rn). The tail-robustness transform for features whose
    * raw scale has heavy outliers — keeps the row count (unlike
    * [[DataPrep.trimmedMean]], which drops tails).
    *
    * Two aggregations on the same grp partitioning (rank window + cut
    * reduction) and one broadcast-friendly join of the per-group cut
    * table (group-cardinality-bounded, tiny) back onto the rows.
    */
  def winsorize(
      df: DataFrame, groupCol: String, valueCol: String, idCol: String,
      lowBps: Int = 500, highBps: Int = 9500): DataFrame = {
    require(lowBps >= 0 && highBps <= 10000 && lowBps < highBps,
      "need 0 <= lowBps < highBps <= 10000")
    val ranked = DataPrep.rankedByGroup(df, groupCol, valueCol, idCol)
    val cuts = ranked
      .withColumn("rlo", expr(s"greatest(1, ($lowBps * n + 9999) DIV 10000)"))
      .withColumn("rhi", expr(s"greatest(1, ($highBps * n + 9999) DIV 10000)"))
      .groupBy(col("grp"))
      .agg(min(when(col("rn") >= col("rlo"), col("xm"))).as("lo_micro"),
        min(when(col("rn") >= col("rhi"), col("xm"))).as("hi_micro"))
    ranked.join(broadcast(cuts), Seq("grp"))
      .select(col("id"), col("grp"), col("xm").as("value_micro"),
        greatest(col("lo_micro"), least(col("hi_micro"), col("xm")))
          .as("winsorized_micro"))
  }

  /** The TRAINED form of [[winsorize]]'s per-group cut table —
    * `(grp, lo_micro, hi_micro)` — for the offline-train / online-serve
    * split: train the cuts on yesterday's corpus, broadcast them, and
    * clamp live rows with [[applyWinsorize]] (stateless, so it runs
    * unchanged on a streaming frame — StreamingFeatureSpec pins
    * stream ≡ batch). Group-cardinality-bounded output.
    */
  def winsorizeCuts(
      df: DataFrame, groupCol: String, valueCol: String, idCol: String,
      lowBps: Int = 500, highBps: Int = 9500): DataFrame = {
    require(lowBps >= 0 && highBps <= 10000 && lowBps < highBps,
      "need 0 <= lowBps < highBps <= 10000")
    DataPrep.rankedByGroup(df, groupCol, valueCol, idCol)
      .withColumn("rlo", expr(s"greatest(1, ($lowBps * n + 9999) DIV 10000)"))
      .withColumn("rhi", expr(s"greatest(1, ($highBps * n + 9999) DIV 10000)"))
      .groupBy(col("grp"))
      .agg(min(when(col("rn") >= col("rlo"), col("xm"))).as("lo_micro"),
        min(when(col("rn") >= col("rhi"), col("xm"))).as("hi_micro"))
  }

  /** Apply a trained [[winsorizeCuts]] table to rows — a stateless
    * broadcast join + clamp, identical on batch and streaming frames.
    * Groups absent from the cut table pass through unclamped (the
    * new-group-at-serve-time convention; emit them to a monitor if that
    * matters).
    */
  def applyWinsorize(
      rows: DataFrame, cuts: DataFrame, groupCol: String, valueCol: String,
      idCol: String): DataFrame =
    rows.select(col(idCol).cast("bigint").as("id"), col(groupCol).as("grp"),
        round(col(valueCol) * lit(1e6)).cast("bigint").as("value_micro"))
      .join(broadcast(cuts), Seq("grp"), "left")
      .select(col("id"), col("grp"), col("value_micro"),
        greatest(coalesce(col("lo_micro"), col("value_micro")),
          least(coalesce(col("hi_micro"), col("value_micro")), col("value_micro")))
          .as("winsorized_micro"))

  /** The TRAINED category-mean table for serving-time target encoding —
    * `(cat, mean_micro, n_rows)`, full-category truncating mean (serving
    * uses the full mean; the leave-one-out exclusion in [[targetEncode]]
    * is a TRAIN-time leakage guard for rows whose own label is in the
    * table). Category-cardinality-bounded; broadcast it and apply with
    * [[applyEncoding]].
    */
  def encodingTable(
      df: DataFrame, catCol: String, targetCol: String): DataFrame =
    df.select(col(catCol).as("cat"),
        round(col(targetCol) * lit(1e6)).cast("bigint").as("tm"))
      .withColumn("tm", when(col("tm") >= 0, col("tm")).otherwise(raise_error(
        lit("encodingTable: negative target — DIV truncation is not "
          + "floor-division-portable below zero; shift the target first"))))
      .groupBy(col("cat"))
      .agg(count(lit(1)).as("n_rows"), sum(col("tm")).as("s"))
      .select(col("cat"), expr("s DIV n_rows").as("mean_micro"), col("n_rows"))

  /** A/B POWER ANALYSIS — the minimum detectable effect (MDE) for each
    * metric at the CURRENT arm sizes: the planning number read BEFORE
    * [[abTest]]'s verdict is trusted ("not significant" on an
    * underpowered experiment is silence, not evidence). Two-proportion
    * normal approximation:
    *
    *   MDE = (z_{α/2} + z_{power}) · √(p̂(1−p̂)·(1/n1 + 1/n2))
    *
    * with p̂ the pooled rate and the z quantiles passed as MICRO-integer
    * literals (defaults 1959964 and 841621 — the 97.5% and 80% normal
    * points; no inverse-CDF evaluation anywhere). The one √ follows the
    * q167 convention: exact integer inputs, one fixed-order f64
    * product+sqrt, round to ppm — last-ulp engine agreement. Also emits
    * the observed |Δ| so "observed vs detectable" reads off one row.
    *
    * Scale shape: pure map over the per-metric count table (the
    * [[abTest]] input shape — aggregation happened upstream).
    */
  def abPower(
      metrics: DataFrame, metricCol: String,
      x1Col: String, n1Col: String, x2Col: String, n2Col: String,
      zAlphaMicro: Long = 1959964L, zPowerMicro: Long = 841621L): DataFrame = {
    require(zAlphaMicro > 0 && zPowerMicro >= 0, "z quantiles must be positive")
    val base = metrics.select(col(metricCol).as("metric"),
      col(x1Col).cast("bigint").as("x1"), col(n1Col).cast("bigint").as("n1"),
      col(x2Col).cast("bigint").as("x2"), col(n2Col).cast("bigint").as("n2"))
    base
      .withColumn("p_pool",
        (col("x1") + col("x2")).cast("double") / (col("n1") + col("n2")))
      .select(col("metric"), col("n1"), col("n2"),
        expr("CAST((1000000 * x1) DIV n1 AS BIGINT)").as("rate1_ppm"),
        expr("CAST((1000000 * x2) DIV n2 AS BIGINT)").as("rate2_ppm"),
        round(abs(col("x1").cast("double") / col("n1")
          - col("x2").cast("double") / col("n2")) * lit(1e6))
          .cast("bigint").as("observed_delta_ppm"),
        round(lit((zAlphaMicro + zPowerMicro) / 1e6)
          * sqrt(col("p_pool") * (lit(1.0) - col("p_pool"))
            * (lit(1.0) / col("n1") + lit(1.0) / col("n2"))) * lit(1e6))
          .cast("bigint").as("mde_ppm"))
  }

  /** STRATIFIED k-fold assignment — [[kFoldAssign]] balanced WITHIN each
    * stratum: plain `md5(id) % k` leaves small strata with lopsided
    * folds (a 7-row language in a 5-fold split can easily land 4 rows in
    * one fold), which skews per-stratum validation metrics exactly where
    * they're noisiest. Here rows rank by md5 within their stratum and
    * `fold = (rank−1) % k`, so every (stratum, fold) cell holds
    * ⌊n_s/k⌋ or ⌈n_s/k⌉ rows — exact balance — while the md5 order keeps
    * the assignment content-independent, rerun-stable, and engine-
    * portable (rank ties impossible: the md5 hex of distinct ids is
    * distinct in practice and the id itself tiebreaks).
    *
    * Unlike the stateless [[kFoldAssign]], adding corpus rows RESHUFFLES
    * folds within the touched strata (ranks shift) — use this for
    * frozen evaluation snapshots and kFoldAssign for growing corpora.
    *
    * Scale shape: one stratum-keyed rank window; strata sort in
    * parallel, skew bound = stratum size.
    */
  def stratifiedKFold(
      df: DataFrame, stratumCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 1000, "stratifiedKFold: k in [2, 1000]")
    val w = Window.partitionBy(col("stratum"))
      .orderBy(col("h"), col("id"))
    df.select(col(idCol).cast("bigint").as("id"),
        col(stratumCol).as("stratum"))
      .withColumn("h", md5(concat(lit("skf:"), col("id"))))
      .withColumn("fold", (row_number().over(w) - 1) % k)
      .select(col("id"), col("stratum"), col("fold").cast("bigint").as("fold"))
  }

  /** SMOOTHED (m-estimate / empirical-Bayes) encoding table — the
    * production form of [[encodingTable]] for long-tail categories: a
    * category seen 3 times with 3 positives would encode as a perfect
    * 1.0 and leak noise straight into the model; the m-estimate shrinks
    * rare categories toward the global prior with pseudo-count weight m:
    *
    *   enc(c) = (Σ_c target + m·globalMean) / (n_c + m)
    *
    * in micro fixed point: `gm_micro = S_micro DIV N` first (one global
    * aggregate, crossed back in as a broadcast 1-row frame — no driver
    * round-trip), then `enc_micro = (s_c + m·gm_micro) DIV (n_c + m)`
    * — exact integers, the documented two-stage rounding.
    * As n_c → ∞ the prior washes out; at n_c = 0 (serving-time unseen)
    * [[applyEncoding]] still returns −1 — route to `gm_micro` downstream
    * if prior-fallback is wanted. Output schema matches
    * [[encodingTable]] (`cat, mean_micro, n_rows`) so [[applyEncoding]]
    * serves either table unchanged, batch or streaming.
    *
    * Scale shape: one (category) aggregation with map-side combine plus
    * a 1-row global aggregate crossed in — category-bounded output.
    */
  def encodingTableSmoothed(
      df: DataFrame, catCol: String, targetCol: String,
      m: Long = 20L): DataFrame = {
    require(m >= 1, "encodingTableSmoothed: m must be >= 1")
    val base = df.select(col(catCol).as("cat"),
        round(col(targetCol) * lit(1e6)).cast("bigint").as("tm"))
      .withColumn("tm", when(col("tm") >= 0, col("tm")).otherwise(raise_error(
        lit("encodingTableSmoothed: negative target — DIV truncation is not "
          + "floor-division-portable below zero; shift the target first"))))
    val global = base.agg(
      expr("CAST(sum(CAST(tm AS DECIMAL(38,0))) DIV count(1) AS BIGINT)")
        .as("gm_micro"))
    base.groupBy(col("cat"))
      .agg(count(lit(1)).as("n_rows"), sum(col("tm")).as("s"))
      .crossJoin(broadcast(global))
      .select(col("cat"),
        expr(s"CAST((CAST(s AS DECIMAL(38,0)) + $m * CAST(gm_micro AS DECIMAL(38,0))) DIV (n_rows + $m) AS BIGINT)")
          .as("mean_micro"),
        col("n_rows"))
  }

  /** Apply a trained [[encodingTable]] — stateless broadcast join,
    * identical on batch and streaming frames; unseen categories get the
    * -1 sentinel (route them to a default/prior downstream).
    */
  def applyEncoding(
      rows: DataFrame, table: DataFrame, catCol: String, idCol: String): DataFrame =
    rows.select(col(idCol).cast("bigint").as("id"), col(catCol).as("cat"))
      .join(broadcast(table.select(col("cat"), col("mean_micro"))), Seq("cat"), "left")
      .select(col("id"), col("cat"),
        coalesce(col("mean_micro"), lit(-1L)).as("enc_micro"))

  /** Skip-gram co-occurrence pair counts within sessions — the
    * training-pair generator for item2vec-style embedding models: items
    * are ordered within each session by (ts, id) position and every
    * ordered pair at position distance 1..`windowSize` counts once.
    * Output `(item_a, item_b, n_pairs)` — directional (a precedes b);
    * symmetrize downstream if the model wants it.
    *
    * One exchange on the session key for the position window, then a
    * self-equi-join ON SESSION with the position-distance predicate as a
    * post-join filter: per-session fan-out is `n·windowSize`, linear in
    * session length for fixed window — never all-pairs (a session of n
    * items yields at most n·w pairs, not n²). The final count shuffles
    * on the (tiny) item-pair space.
    */
  def cooccurrencePairs(
      events: DataFrame, sessionCol: String, itemCol: String, tsCol: String,
      idCol: String, windowSize: Int = 2): DataFrame = {
    require(windowSize >= 1 && windowSize <= 100, "windowSize in [1, 100]")
    val ws = Window.partitionBy(col("sess")).orderBy(col("tsu"), col("id"))
    val pos = events.select(col(sessionCol).as("sess"), col(itemCol).as("item"),
        col(tsCol).cast("bigint").as("tsu"), col(idCol).cast("bigint").as("id"))
      .withColumn("pos", row_number().over(ws))
    val a = pos.select(col("sess"), col("item").as("item_a"), col("pos").as("pa"))
    val b = pos.select(col("sess"), col("item").as("item_b"), col("pos").as("pb"))
    a.join(b, Seq("sess"))
      .filter(col("pb") - col("pa") >= 1 && col("pb") - col("pa") <= windowSize)
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Population Stability Index between a reference and a current
    * distribution per group — THE drift monitor a serving pipeline runs
    * on its features: PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i), with
    * fixed-width value bins and +1 Laplace smoothing so empty bins never
    * divide by zero. PSI < 0.1 is conventionally stable, > 0.25 drifted.
    *
    * Portability: each bin's term is ONE f64 expression assembled from
    * exact integer counts in a fixed association order and rounded to
    * integer micro BEFORE the sum (the q74/q82 ln pattern) — so the
    * per-group sum is an order-independent integer any engine
    * reproduces. With smoothing, p_i = (c_i+1)/(n+B), q_i = (d_i+1)/
    * (m+B) over the B observed bins (union of both sides).
    *
    * One aggregation per side on (grp, bin) riding the same exchange, a
    * full-outer bin merge within the group, and a final per-group sum —
    * bins-cardinality-bounded intermediates, row-bounded input scans.
    */
  def psi(
      ref: DataFrame, cur: DataFrame, groupCol: String, valueCol: String,
      binWidthMicro: Long): DataFrame = {
    require(binWidthMicro > 0, "binWidthMicro must be positive")
    // only the numeric bin width is interpolated into expr(); the caller's
    // column name goes through the Column API (DataPrep.micro)
    def binned(df: DataFrame, cnt: String) = df
      .withColumn("__vm", DataPrep.micro(col(valueCol)))
      .select(col(groupCol).as("grp"),
        expr(s"__vm DIV $binWidthMicro").as("bin"))
      .groupBy(col("grp"), col("bin")).agg(count(lit(1)).as(cnt))
    val merged = binned(ref, "c").join(binned(cur, "d"), Seq("grp", "bin"), "full_outer")
      .select(col("grp"), col("bin"),
        coalesce(col("c"), lit(0L)).as("c"), coalesce(col("d"), lit(0L)).as("d"))
    psiFromMerged(merged, Seq("grp"))
  }

  /** The PSI reduction over an already-merged `(keys..., bin, c, d)` bin
    * table — shared by [[psi]] and the streaming drift monitor
    * ([[graft.streaming.StreamingDrift]]), so the two cannot drift from
    * each other. `keyCols` is the per-distribution identity (e.g. `grp`,
    * or `window, grp`).
    */
  private[graft] def psiFromMerged(merged: DataFrame, keyCols: Seq[String]): DataFrame = {
    val wg = Window.partitionBy(keyCols.map(col): _*)
    merged
      .withColumn("n", sum(col("c")).over(wg))
      .withColumn("m", sum(col("d")).over(wg))
      .withColumn("nb", count(lit(1)).over(wg))
      // p = (c+1)/(n+nb), q = (d+1)/(m+nb); term assembled in ONE fixed
      // order: (p - q) * ln(p / q), each sub-ratio a single division of
      // exact-integer-valued doubles
      .withColumn("term_micro",
        round(lit(1e6) *
          ((col("c") + 1) / (col("n") + col("nb")) - (col("d") + 1) / (col("m") + col("nb"))) *
          log(((col("c") + 1) / (col("n") + col("nb"))) /
            ((col("d") + 1) / (col("m") + col("nb"))))).cast("bigint"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("term_micro")).as("psi_micro"),
        max(col("nb")).as("n_bins"),
        max(col("n")).as("n_ref"), max(col("m")).as("n_cur"))
  }

  /** Reference bin table for the streaming drift monitor: `(grp, bin,
    * c)` counts of the offline corpus at `binWidthMicro` — train once,
    * broadcast, compare live windows against it
    * ([[graft.streaming.StreamingDrift]]). Bins-cardinality-bounded.
    */
  def referenceBins(
      ref: DataFrame, groupCol: String, valueCol: String,
      binWidthMicro: Long): DataFrame = {
    require(binWidthMicro > 0, "binWidthMicro must be positive")
    ref.withColumn("__vm", DataPrep.micro(col(valueCol)))
      .select(col(groupCol).as("grp"),
        expr(s"__vm DIV $binWidthMicro").as("bin"))
      .groupBy(col("grp"), col("bin")).agg(count(lit(1)).as("c"))
  }

  /** Two-proportion A/B significance test with an EXACT integer decision
    * — experimentation analytics without a single float: per metric row
    * `(metric, x1, n1, x2, n2)` (successes/totals per arm), the pooled
    * two-proportion z-test `|z| ≥ z_c` is decided by clearing every
    * denominator (the q93 pattern):
    *
    *   z² ≥ c  ⟺  q·(x1·n2 − x2·n1)²·(n1+n2) ≥ p·n1·n2·s·(N − s)
    *
    * with s = x1+x2, N = n1+n2 and the critical value c = p/q as a
    * RATIONAL (default 2401/625 = 1.96², the 95% two-sided test) — both
    * sides exact decimal(38,0) products, so the verdict is bit-identical
    * in any engine at any parallelism (a float z computed two ways can
    * straddle the threshold; an integer comparison cannot). Emits the
    * inputs, the lift direction, and the verdict — effect SIZE stays
    * with the caller, in integers they choose.
    *
    * Degenerate pools (s = 0 or s = N: zero pooled variance) are not
    * significant by convention. One map-only projection over a
    * metric-cardinality-bounded input.
    *
    * Numeric window: both gate sides must fit decimal(38,0) — the larger
    * is critQ·num²·N (num can reach n1·n2). Rather than cap N at the
    * worst case (which would forbid realistic big-N/small-num rows), each
    * row's magnitudes are pre-estimated in double and any row whose gate
    * product would exceed ~5·10³⁷ raises loudly — Spark's non-ANSI
    * decimal overflow would otherwise NULL `significant` silently,
    * contradicting the bit-identical claim.
    */
  def abTest(
      metrics: DataFrame, metricCol: String,
      x1Col: String, n1Col: String, x2Col: String, n2Col: String,
      critP: Long = 2401L, critQ: Long = 625L): DataFrame = {
    require(critP >= 1 && critQ >= 1, "critical value p/q must be positive")
    val base = metrics.select(col(metricCol).as("metric"),
      col(x1Col).cast("bigint").as("x1"), col(n1Col).cast("bigint").as("n1"),
      col(x2Col).cast("bigint").as("x2"), col(n2Col).cast("bigint").as("n2"))
    val d = (c: String) => col(c).cast("decimal(38,0)")
    val s = d("x1") + d("x2")
    val nTot = d("n1") + d("n2")
    val num = d("x1") * d("n2") - d("x2") * d("n1")
    // magnitude pre-check in double (exact decimal values, ~1e-16 relative
    // estimate error vs a 2x safety margin): fail loudly instead of letting
    // decimal(38,0) overflow silently NULL the verdict
    val dd = (c: String) => col(c).cast("double")
    val numD = abs(dd("x1") * dd("n2") - dd("x2") * dd("n1"))
    val nD = dd("n1") + dd("n2")
    val sD = dd("x1") + dd("x2")
    val lhsD = lit(critQ.toDouble) * numD * numD * nD
    val rhsD = lit(critP.toDouble) * dd("n1") * dd("n2") * sD * (nD - sD)
    val guarded = base.withColumn("x1",
      when(lhsD < 5e37 && rhsD < 5e37, col("x1")).otherwise(raise_error(concat(
        lit("abTest: gate product would overflow decimal(38,0) for metric "),
        col("metric"),
        lit(" — shrink the arms or rescale counts (see numeric window)")))))
    guarded
      .withColumn("lift_sign",
        when(num > 0, lit(1L)).when(num < 0, lit(-1L)).otherwise(lit(0L)))
      .withColumn("significant",
        (s > 0 && s < nTot &&
          lit(critQ) * num * num * nTot >=
            lit(critP) * d("n1") * d("n2") * s * (nTot - s)).cast("bigint"))
  }

  /** DIFFERENCE-IN-DIFFERENCES estimator over a 2×2 (arm × period)
    * panel — the quasi-experimental readout when randomization isn't
    * available ("did the treated arm move MORE than the control moved
    * across the same cut"):
    *
    *   DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre)
    *
    * with each cell mean the truncating integer `sum_micro DIV n` (the
    * dailyStats dm convention — engine-portable; the ≤4-micro-ulp
    * truncation skew is documented, not hidden in float addition
    * order). Emits the four cell (n, mean_micro) pairs and `did_micro`;
    * any empty cell reads the −2·10⁶ sentinel (a 2×2 with a hole has
    * no estimand). One output row.
    *
    * `armCol` must be 0 (control) / 1 (treated) — enforced;
    * `periodCol` must be 0 (pre) / 1 (post) — enforced.
    *
    * Scale shape: ONE map-side-combined 4-cell aggregation; nothing
    * else.
    */
  def diffInDiff(
      df: DataFrame, armCol: String, periodCol: String,
      valueCol: String): DataFrame = {
    val base = df.select(col(armCol).cast("bigint").as("arm"),
        col(periodCol).cast("bigint").as("per"),
        DataPrep.micro(col(valueCol)).as("ym"))
      .withColumn("arm", when(col("arm").isin(0L, 1L), col("arm"))
        .otherwise(raise_error(lit("diffInDiff: arm must be 0/1"))))
      .withColumn("per", when(col("per").isin(0L, 1L), col("per"))
        .otherwise(raise_error(lit("diffInDiff: period must be 0/1"))))
    def cell(a: Int, p: Int, what: String) = Seq(
      sum(when(col("arm") === a.toLong && col("per") === p.toLong, 1L)
        .otherwise(0L)).as(s"n_$what"),
      sum(when(col("arm") === a.toLong && col("per") === p.toLong, col("ym"))
        .otherwise(0L)).as(s"s_$what"))
    val cells = cell(0, 0, "c0") ++ cell(0, 1, "c1") ++
      cell(1, 0, "t0") ++ cell(1, 1, "t1")
    val agg = base.agg(cells.head, cells.tail: _*)
    val names = Seq("c0", "c1", "t0", "t1")
    val anyEmpty = names.map(w => col(s"n_$w") === 0L).reduce(_ || _)
    val withMeans = names.foldLeft(agg) { (df2, w) =>
      df2.withColumn(s"mean_${w}_micro",
        when(col(s"n_$w") === 0L, lit(-2000000L))
          .otherwise(expr(s"s_$w DIV n_$w")))
    }
    withMeans
      .withColumn("did_micro",
        when(anyEmpty, lit(-2000000L))
          .otherwise((col("mean_t1_micro") - col("mean_t0_micro")) -
            (col("mean_c1_micro") - col("mean_c0_micro"))))
      .select(col("n_c0"), col("mean_c0_micro"), col("n_c1"),
        col("mean_c1_micro"), col("n_t0"), col("mean_t0_micro"),
        col("n_t1"), col("mean_t1_micro"), col("did_micro"))
  }

  /** Deterministic negative sampling for embedding-model training pairs
    * (the word2vec/item2vec companion of [[cooccurrencePairs]]): each
    * positive pair (a, b) gets `k` pseudo-random negatives drawn from
    * the item vocabulary by `md5(a:b:i) % |vocab|` over the DENSE
    * item-rank index — content-derived, so resampling is rerun- and
    * engine-stable (no RNG state), and any engine reproduces the exact
    * sample. Accidental hits (negative == a or b) are FLAGGED, not
    * resampled — the standard trade (resampling would make the draw
    * count data-dependent); downstream drops or keeps them knowingly.
    *
    * Scale shape: the vocabulary is a catalog, not a corpus — the dense
    * rank is one skinny global sort of DISTINCT items (small by
    * assumption; the subsequent join broadcasts it), then the pair side
    * explodes k rows each and equi-joins the broadcast index. Bounded by
    * k·|pairs| + |vocab|, no all-pairs anywhere. The catalog assumption
    * is ENFORCED: the distinct vocabulary is counted eagerly and must be
    * ≤ `maxVocab`, because the dense rank is a single-partition sort and
    * the index is broadcast — pointing this at an event stream would
    * otherwise degrade to a silent one-task bottleneck.
    */
  def negativeSamples(
      pairs: DataFrame, itemACol: String, itemBCol: String,
      vocab: DataFrame, vocabItemCol: String, k: Int,
      maxVocab: Long = 10000000L): DataFrame = {
    require(k >= 1 && k <= 100, "k in [1, 100]")
    require(maxVocab >= 1, "maxVocab must be >= 1")
    val items = vocab.select(col(vocabItemCol).cast("bigint").as("item")).distinct()
    val nVocab = items.count()
    require(nVocab >= 1, "negativeSamples: empty vocabulary")
    require(nVocab <= maxVocab,
      s"negativeSamples: $nVocab distinct vocabulary items exceed " +
        s"maxVocab=$maxVocab — the dense rank is a single-partition sort and " +
        "the index is broadcast, both sized for a catalog, not a corpus; " +
        "raise maxVocab only if the driver and executors can hold the index")
    val v = items.withColumn("idx",
      row_number().over(Window.orderBy(col("item"))).cast("bigint") - 1)
    val p = pairs.select(col(itemACol).cast("bigint").as("item_a"),
        col(itemBCol).cast("bigint").as("item_b"))
      .select(col("item_a"), col("item_b"),
        explode(sequence(lit(0L), lit(k.toLong - 1))).as("neg_rank"))
      .withColumn("idx",
        conv(substring(md5(concat_ws(":", col("item_a"), col("item_b"),
          col("neg_rank"))), 1, 8), 16, 10).cast("bigint") % lit(nVocab))
    p.join(broadcast(v), Seq("idx"))
      .select(col("item_a"), col("item_b"), col("neg_rank"),
        col("item").as("neg_item"),
        (col("item") === col("item_a") || col("item") === col("item_b"))
          .cast("bigint").as("collides"))
  }

  /** Regular-grid resampling with forward fill — the time-series
    * regularizer every downstream model assumes: per group, the value
    * series is bucketed to `bucketMicros`, each bucket keeps its LAST
    * observation (lexicographic (ts, id) max — deterministic under
    * ties), the grid is completed from the group's min to max bucket,
    * and gaps carry the previous value forward. `observed` flags real
    * vs filled rows; leading gaps cannot fill and emit the -1 sentinel.
    *
    * One exchange on the group key: the bucket aggregation, the
    * min/max-span grid explode (bounded by TIME SPAN / bucket, not by
    * event volume), and the forward-fill window all ride the same
    * partitioning.
    */
  def resampleFfill(
      events: DataFrame, groupCol: String, tsCol: String, valueCol: String,
      idCol: String, bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val bucketed = events
      .withColumn("__ts", col(tsCol).cast("bigint"))
      .select(col(groupCol).as("grp"),
        expr(s"__ts DIV $bucketMicros").as("bucket"),
        struct(col(tsCol).cast("bigint").as("tsu"),
          col(idCol).cast("bigint").as("id"),
          round(col(valueCol) * lit(1e6)).cast("bigint").as("vm")).as("obs"))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("obs")).getField("vm").as("vm"))
    val grid = bucketed.groupBy(col("grp"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("grp"), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val wf = Window.partitionBy(col("grp")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bucketed, Seq("grp", "bucket"), "left")
      .withColumn("filled",
        coalesce(last(col("vm"), ignoreNulls = true).over(wf), lit(-1L)))
      .select(col("grp"), col("bucket"),
        col("filled").as("value_micro"),
        col("vm").isNotNull.cast("bigint").as("observed"))
  }

  /** Per-group Pearson correlation between two columns with exact
    * integer moment accumulation: x quantizes to milli, y stays integer
    * (caller picks integer-valued y like hour-of-day or an integer
    * metric), all five moments (Σx, Σy, Σxy, Σx², Σy²) are exact
    * decimal(38,0) sums, and only the FINAL r = num/√(sxx·syy) touches
    * f64 — rounded to 6 decimals, the q34 cosine convention, so a 1-ulp
    * sqrt difference cannot surface. Groups with zero variance on either
    * side emit the -1000000 micro sentinel (r undefined).
    *
    * One aggregation on the group key; moment sums are
    * order-independent integers, so the result is bit-stable at any
    * parallelism.
    */
  def corrPearson(
      df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("grp"),
      round(col(xCol) * lit(1e3)).cast("bigint").as("x"),
      col(yCol).cast("bigint").as("y"))
    base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
      .select(col("grp"), col("n"),
        when(
          (col("n") * col("sxx") - col("sx") * col("sx")) === 0 ||
            (col("n") * col("syy") - col("sy") * col("sy")) === 0, lit(-1000000L))
          .otherwise(
            round(lit(1e6) *
              (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
                (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
              .cast("bigint"))
          .as("corr_micro"))
  }

  /** DETERMINISTIC BOOTSTRAP confidence interval for a per-group mean —
    * the uncertainty bar a metrics readout needs before anyone compares
    * two numbers ("source A quality 0.61 vs B 0.63" means nothing
    * without one). Poissonized resampling (the standard distributed
    * bootstrap: multinomial row counts decouple into independent
    * Poisson(1) weights), derandomized the repo way — each (row,
    * replica) weight is the Poisson(1) inverse CDF of an md5-uniform, so
    * every engine and every rerun draws the SAME replicas:
    *
    *   u(r, id) = hex8(md5("boot:" r ":" id)) mod 10⁶
    *   k = inverse-CDF ladder of Poisson(1) in exact ppm literals
    *   xμ = round(10⁶·x)  (the repo-wide micro quantization — fractional
    *        inputs are honest, not silently floor-truncated; for
    *        integer-valued inputs every output is bit-identical to the
    *        pre-quantization form since Σ k·(10⁶x) DIV Σk =
    *        (10⁶·Σ kx) DIV Σk. |x| ≲ 9·10⁹ keeps 10⁶x double-exact)
    *   mean_r = (Σ k·xμ) DIV Σ k
    *   [lo, hi] = percentile_disc 2.5% / 97.5% over replica means
    *              (the q81 ceil(p·R) rank convention)
    *
    * Replicas whose weights all drew 0 (tiny groups) are dropped from
    * the ranking — `n_reps` reports the effective count. All integers.
    *
    * Scale shape: the explode is corpus × reps rows (reps defaults to
    * 32 — bound it consciously; the weight is a literal CASE ladder, so
    * the expansion is map-only and codegen'd), then one (grp, rep)
    * aggregation with map-side combine and a reps-bounded per-group
    * rank. The full-sample mean rides the same pass as rep 0 with
    * weight 1.
    */
  def bootstrapCiMean(
      df: DataFrame, groupCol: String, valueCol: String, idCol: String,
      reps: Int = 32): DataFrame = {
    require(reps >= 4 && reps <= 1000, "bootstrapCiMean: reps in [4, 1000]")
    // P(K <= k) for Poisson(1), round(1e6 * cdf) — exact shared literals
    val cdfPpm = Seq(367879L, 735759L, 919699L, 981012L, 996340L,
      999406L, 999917L, 999990L, 999999L)
    val base = df.select(col(groupCol).as("grp"),
      round(col(valueCol) * lit(1e6)).cast("bigint").as("x"),
      col(idCol).cast("bigint").as("id"))
    val expanded = base
      .select(col("grp"), col("x"), col("id"),
        explode(sequence(lit(1), lit(reps))).as("rep"))
      .withColumn("u",
        conv(substring(md5(concat(lit("boot:"), col("rep"), lit(":"),
          col("id"))), 1, 8), 16, 10).cast("bigint") % lit(1000000L))
      .withColumn("k",
        cdfPpm.zipWithIndex.foldRight(lit(cdfPpm.length.toLong)) {
          case ((cdf, i), elseCol) =>
            when(col("u") < cdf, lit(i.toLong)).otherwise(elseCol)
        })
    val repMeans = expanded.groupBy(col("grp"), col("rep"))
      // cast each factor BEFORE multiplying: k·xμ on raw longs can
      // ANSI-overflow for micro-scaled magnitudes
      .agg(sum(col("k").cast("decimal(38,0)") *
        col("x").cast("decimal(38,0)")).as("kx"),
        sum(col("k")).as("kw"))
      .filter(col("kw") > 0)
      .select(col("grp"), col("rep"),
        expr("CAST(kx DIV kw AS BIGINT)").as("m"))
    val wRank = Window.partitionBy(col("grp")).orderBy(col("m"), col("rep"))
    val ci = repMeans
      .withColumn("r", row_number().over(wRank))
      .withColumn("nr", count(lit(1)).over(Window.partitionBy(col("grp"))))
      .groupBy(col("grp"))
      .agg(max(col("nr")).as("n_reps"),
        // ceil(0.025 * R) and ceil(0.975 * R) discrete ranks
        min(when(col("r") === expr("(25 * nr + 999) DIV 1000"), col("m")))
          .as("lo_micro"),
        min(when(col("r") === expr("(975 * nr + 999) DIV 1000"), col("m")))
          .as("hi_micro"))
    base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(x AS DECIMAL(38,0))) DIV count(1) AS BIGINT)")
          .as("mean_micro"))
      .join(ci, Seq("grp"), "left")
      .select(col("grp"), col("n"), col("mean_micro"),
        coalesce(col("n_reps"), lit(0L)).as("n_reps"),
        coalesce(col("lo_micro"), col("mean_micro")).as("lo_micro"),
        coalesce(col("hi_micro"), col("mean_micro")).as("hi_micro"))
  }

  /** Per-group OLS TREND LINE over integer (x, y) points — the
    * monitoring primitive behind "is this source's daily volume
    * growing/decaying?", "is quality drifting down week over week?":
    * fit y = a + b·x by least squares and emit the slope and intercept
    * as EXACT integers:
    *
    *   b_micro = (10⁶·(n·Σxy − Σx·Σy)) DIV (n·Σx² − (Σx)²)
    *   a_micro = (10⁶·(Σy·Σx² − Σx·Σxy)) DIV (n·Σx² − (Σx)²)
    *
    * — both numerators and the shared denominator are exact decimal(38,0)
    * moment sums (the [[corrPearson]] family), the DIV truncates toward
    * zero identically in Spark and DuckDB (the q156-pinned semantics, so
    * negative slopes stay engine-exact). Groups with a single distinct x
    * (denominator 0 — no line) emit `degenerate = 1` with slope and
    * intercept 0 rather than an in-range sentinel that could collide
    * with a real value.
    *
    * Scale shape: corpus → five integer moments per group in ONE
    * map-side-combine aggregation; callers fitting daily trends
    * pre-aggregate to (group, day, count) first so x is bounded.
    */
  def trendSlope(
      df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val d = (c: Column) => c.cast("decimal(38,0)")
    df.select(col(groupCol).as("grp"), col(xCol).cast("bigint").as("x"),
        col(yCol).cast("bigint").as("y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(d(col("x"))).as("sx"), sum(d(col("y"))).as("sy"),
        sum(d(col("x") * col("y"))).as("sxy"),
        sum(d(col("x") * col("x"))).as("sxx"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .select(col("grp"), col("n"),
        (col("den") === 0).cast("bigint").as("degenerate"),
        when(col("den") === 0, lit(0L))
          .otherwise(expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * (n * sxy - sx * sy)) DIV den AS BIGINT)"))
          .as("slope_micro"),
        when(col("den") === 0, lit(0L))
          .otherwise(expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * (sy * sxx - sx * sxy)) DIV den AS BIGINT)"))
          .as("intercept_micro"))
  }

  /** Per-group Spearman rank correlation — Pearson over DOUBLED average
    * ranks, which are exact integers even under ties:
    * `2·avgrank = 2·rank() + |ties| − 1` (the average-rank tie convention
    * with the ½ cleared), and correlation is scale-invariant, so doubling
    * changes nothing. The monotone-association companion to
    * [[corrPearson]]: outlier-robust and invariant to any monotone
    * transform of either column — the association check to run when the
    * relationship is nonlinear (quality score vs document length). Same
    * output contract as corrPearson — exact decimal(38,0) moment sums,
    * one f64 division+sqrt at the very end rounded to micro — except the
    * zero-variance sentinel is −2000000 (OUTSIDE [−1e6, 1e6]; corrPearson
    * predates the convention and its −1e6 sentinel collides with r = −1).
    *
    * Scale shape: two rank windows partitioned by group (ranking is the
    * irreducible cost of Spearman — per-group sorts, groups in parallel;
    * a single corpus-sized group is the skew risk, same as any per-group
    * rank), then ONE order-independent moment aggregation.
    */
  def corrSpearman(
      df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("grp"),
      round(col(xCol) * lit(1e6)).cast("bigint").as("xv"),
      round(col(yCol) * lit(1e6)).cast("bigint").as("yv"))
    val wx = Window.partitionBy(col("grp")).orderBy(col("xv"))
    val wy = Window.partitionBy(col("grp")).orderBy(col("yv"))
    val cx = Window.partitionBy(col("grp"), col("xv"))
    val cy = Window.partitionBy(col("grp"), col("yv"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    base
      .withColumn("x",
        lit(2L) * rank().over(wx).cast("bigint") + count(lit(1)).over(cx) - 1L)
      .withColumn("y",
        lit(2L) * rank().over(wy).cast("bigint") + count(lit(1)).over(cy) - 1L)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(d(col("x"))).as("sx"), sum(d(col("y"))).as("sy"),
        sum(d(col("x")) * d(col("y"))).as("sxy"),
        sum(d(col("x")) * d(col("x"))).as("sxx"),
        sum(d(col("y")) * d(col("y"))).as("syy"))
      .select(col("grp"), col("n"),
        when(
          (col("n") * col("sxx") - col("sx") * col("sx")) === 0 ||
            (col("n") * col("syy") - col("sy") * col("sy")) === 0, lit(-2000000L))
          .otherwise(
            round(lit(1e6) *
              (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
                (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
              .cast("bigint"))
          .as("spearman_micro"))
  }

  /** Cross-correlation of two per-type event series at integer lags:
    * bucket both series to `bucketMicros` counts, then for each lag
    * 0..`maxLag` score = Σ_t cntA(t)·cntB(t + lag) — the exact-integer
    * unnormalized cross-correlation a pipeline uses to detect "B follows
    * A by k buckets" lead/lag structure before building lagged features.
    * Output `(lag, score, n_terms)`.
    *
    * Two bucket aggregations (one scan), then a lag-expanded equi-join
    * on the bucket id: the A side explodes `maxLag + 1` rows per
    * NON-EMPTY bucket (bounded by observed time span / bucket size, not
    * by event volume) and joins B on `bucket = a.bucket + lag` — a pure
    * equi-join on a derived key, never a theta join over the series.
    */
  def crossCorrelation(
      events: DataFrame, typeCol: String, tsCol: String,
      typeA: String, typeB: String,
      bucketMicros: Long, maxLag: Int): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    require(maxLag >= 0 && maxLag <= 10000, "maxLag in [0, 10000]")
    def series(t: String) = events
      .filter(col(typeCol) === t)
      .withColumn("__ts", col(tsCol).cast("bigint"))
      .select(expr(s"__ts DIV $bucketMicros").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    val lagged = series(typeA)
      .select(col("bucket"), col("cnt").as("cnt_a"),
        explode(sequence(lit(0L), lit(maxLag.toLong))).as("lag"))
      .withColumn("bucket_b", col("bucket") + col("lag"))
    lagged.join(series(typeB).select(col("bucket").as("bucket_b"), col("cnt").as("cnt_b")),
        Seq("bucket_b"))
      .groupBy(col("lag"))
      .agg(sum(col("cnt_a") * col("cnt_b")).as("score"),
        count(lit(1)).as("n_terms"))
  }

  /** POST-STRATIFIED ATE — the confounder-adjusted treatment-effect
    * estimate next to [[abTest]]'s raw two-proportion test: when arms are
    * imbalanced WITHIN strata (mix shift, triggered exposure, partial
    * rollout), the naive mean difference confounds treatment with
    * composition. Post-stratification reweights per-stratum arm-mean
    * differences by stratum size,
    *
    *   ATE = Σ_s w_s · (ȳ_{1,s} − ȳ_{0,s}) / Σ_s w_s,   w_s = n_s
    *
    * over strata where BOTH arms are observed (singletons are reported,
    * not silently dropped: `n_strata_used` vs `n_strata`). Exactness:
    * values quantize to micro; every arm mean is one exact integer
    * division (micro resolution — documented truncation, identical in
    * both engines); the weighted sum routes through decimal(38,0). The
    * unadjusted difference is emitted next to the ATE so the confounding
    * correction is visible. Degenerate inputs (an empty arm overall, or
    * zero usable strata) read the −2·10⁶ sentinel with the count columns
    * explaining why.
    *
    * Scale shape: one (stratum, arm) aggregation with map-side combine —
    * the only data-scaled pass — then stratum-bounded conditional
    * pivots and one 1-row reduction. Nothing joins, nothing sorts.
    */
  def stratifiedAte(
      df: DataFrame, armCol: String, stratumCol: String,
      valueCol: String): DataFrame = {
    val cell = df
      .select(col(stratumCol).as("s"), col(armCol).cast("bigint").as("arm"),
        DataPrep.micro(col(valueCol)).as("ym"))
      .groupBy(col("s"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 0L, col("ym")).otherwise(0L)).as("s0"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 1L, col("ym")).otherwise(0L)).as("s1"))
    val d = (c: String) => col(c).cast("decimal(38,0)")
    cell.agg(
        sum(col("n0") + col("n1")).as("n_rows"),
        sum(col("n1")).as("n_treat"),
        sum(col("n0")).as("n_control"),
        sum(col("s1")).as("st"), sum(col("s0")).as("sc"),
        count(lit(1)).as("n_strata"),
        sum(when(col("n0") > 0 && col("n1") > 0, 1L).otherwise(0L))
          .as("n_strata_used"),
        sum(when(col("n0") > 0 && col("n1") > 0,
            (d("n0") + d("n1")) *
              (expr("s1 DIV n1").cast("decimal(38,0)")
                - expr("s0 DIV n0").cast("decimal(38,0)")))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("wd"),
        sum(when(col("n0") > 0 && col("n1") > 0, col("n0") + col("n1"))
          .otherwise(0L)).as("wsum"))
      .select(col("n_rows"), col("n_treat"), col("n_control"),
        col("n_strata"), col("n_strata_used"),
        when(col("n_treat") === 0L || col("n_control") === 0L, lit(-2000000L))
          .otherwise(expr("st DIV n_treat - sc DIV n_control"))
          .as("unadjusted_diff_micro"),
        when(col("n_strata_used") === 0L, lit(-2000000L))
          .otherwise(expr("CAST(wd DIV wsum AS BIGINT)"))
          .as("ate_micro"))
  }

  /** COCHRAN–MANTEL–HAENSZEL stratified 2×2 test — "does the binary
    * treatment move the binary outcome, CONTROLLING for the stratum
    * mix?" (the q222 post-stratification story for proportions: a
    * pooled 2×2 can show an association that is pure composition —
    * Simpson's paradox — while CMH pools the per-stratum evidence).
    * `armCol`/`outcomeCol` must be 0/1. One output row:
    *
    *   - `d_micro` = Σᵢ(10⁶·aᵢ − round(10⁶·n1ᵢm1ᵢ/Tᵢ)) — observed minus
    *     expected treated-successes, per-stratum micro-rounded (one
    *     deterministic f64 divide each, the q227 convention),
    *   - `var_micro2` = Σᵢ round(10¹²·n1ᵢn2ᵢm1ᵢm2ᵢ/(Tᵢ²(Tᵢ−1))),
    *   - `cmh_micro` = round(10⁶·(|D|−½·10⁶)₊²/V) — the continuity-
    *     corrected χ²₁ statistic (3.84·10⁶ ≈ the 5% line); −1 when
    *     V = 0 (no usable stratum carries both outcomes and both arms),
    *   - `or_mh_micro` = Mantel–Haenszel pooled odds ratio
    *     Σ(aᵢdᵢ/Tᵢ)/Σ(bᵢcᵢ/Tᵢ), per-term micro-rounded; −1 when the
    *     denominator vanishes.
    *
    * Single-row strata (Tᵢ < 2) are counted-but-excluded (the q222
    * convention — V's Tᵢ−1 is undefined there).
    *
    * Scale shape: ONE (stratum) aggregation collapses the data; every
    * later pass is strata-bounded arithmetic in a single reduction —
    * no joins, no windows, nothing driver-side.
    */
  def cmhTest(
      df: DataFrame, stratumCol: String, armCol: String,
      outcomeCol: String): DataFrame = {
    val cell = df.select(col(stratumCol).as("st"),
        col(armCol).cast("bigint").as("arm"),
        col(outcomeCol).cast("bigint").as("out"))
      .groupBy(col("st"))
      .agg(count(lit(1)).as("t"), sum(col("arm")).as("n1"),
        sum(col("out")).as("m1"), sum(col("arm") * col("out")).as("a"))
      .withColumn("ok", (col("t") >= 2L).cast("bigint"))
      .withColumn("e_micro", when(col("ok") === 1L, expr(
        "CAST(round(1e6 * (CAST(n1 AS DOUBLE) * m1) / t) AS BIGINT)"))
        .otherwise(lit(0L)))
      .withColumn("v_micro2", when(col("ok") === 1L, expr(
        """CAST(round(1e12 * CAST(CAST(n1 AS DECIMAL(38,0)) * (t - n1)
          |    * m1 * (t - m1) AS DOUBLE)
          |  / CAST(CAST(t AS DECIMAL(38,0)) * t * (t - 1) AS DOUBLE))
          |  AS DECIMAL(38,0))""".stripMargin))
        .otherwise(expr("CAST(0 AS DECIMAL(38,0))")))
      .withColumn("ad_micro", when(col("ok") === 1L, expr(
        "CAST(round(1e6 * (CAST(a AS DOUBLE) * (t - n1 - m1 + a)) / t)" +
          " AS BIGINT)")).otherwise(lit(0L)))
      .withColumn("bc_micro", when(col("ok") === 1L, expr(
        "CAST(round(1e6 * (CAST(n1 - a AS DOUBLE) * (m1 - a)) / t)" +
          " AS BIGINT)")).otherwise(lit(0L)))
    cell.agg(count(lit(1)).as("n_strata"), sum(col("ok")).as("n_used"),
        sum(when(col("ok") === 1L, lit(1000000L) * col("a") - col("e_micro"))
          .otherwise(lit(0L))).as("d"),
        sum(col("v_micro2")).as("v"),
        sum(col("ad_micro")).as("s_ad"), sum(col("bc_micro")).as("s_bc"))
      .select(col("n_strata"), coalesce(col("n_used"), lit(0L)).as("n_used"),
        coalesce(col("d"), lit(0L)).as("d_micro"),
        expr("CAST(coalesce(v, CAST(0 AS DECIMAL(38,0))) AS BIGINT)")
          .as("var_micro2"),
        when(coalesce(col("v"), expr("CAST(0 AS DECIMAL(38,0))")) ===
            expr("CAST(0 AS DECIMAL(38,0))"), lit(-1L))
          .otherwise(expr(
            """CAST(round(1e6 * CAST(CAST(greatest(CAST(0 AS BIGINT),
              |    abs(d) - 500000) AS DECIMAL(38,0))
              |    * greatest(CAST(0 AS BIGINT), abs(d) - 500000)
              |    AS DOUBLE)
              |  / CAST(v AS DOUBLE)) AS BIGINT)""".stripMargin))
          .as("cmh_micro"),
        when(coalesce(col("s_bc"), lit(0L)) === 0L, lit(-1L))
          .otherwise(expr(
            "CAST(round(1e6 * CAST(s_ad AS DOUBLE) / CAST(s_bc AS DOUBLE))" +
              " AS BIGINT)"))
          .as("or_mh_micro"))
  }

  /** JACKKNIFE standard error of a per-group RATIO metric
    * R = Σnum/Σden (CTR, ARPU, tokens-per-doc — the metrics whose
    * naive per-row variance is WRONG because numerator and denominator
    * covary). Leave-one-out is closed-form for ratios: the i-th
    * pseudo-estimate is `(Sn − n_i)/(Sd − d_i)` with the group totals
    * broadcast back, so the whole jackknife is ONE extra pass — no n
    * resamples. Emits `(grp, n_rows, ratio_micro, jk_se_micro)` with
    *
    *   SE² = (n−1)/n · Σ(R₍ᵢ₎ − R̄₍·₎)²,
    *
    * −1 sentinels when n < 2, when any leave-one-out denominator hits 0
    * (the estimator is undefined — a single row carries the whole
    * denominator), or when the full denominator is 0.
    *
    * Exactness: each pseudo-estimate is ONE f64 divide rounded to micro
    * (deterministic per row in both engines — identical exact-integer
    * operands); the SE reduces those integers with exact decimal
    * moments and ONE final sqrt (q227 convention).
    *
    * Scale shape: one (group) totals aggregation broadcast back, one
    * per-row projection, one moment aggregation — map-side combined,
    * nothing global, no per-row windows.
    */
  def jackknifeRatio(
      df: DataFrame, groupCol: String, numCol: String,
      denCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("grp"),
      DataPrep.micro(col(numCol)).as("nm"),
      DataPrep.micro(col(denCol)).as("dm"))
    val tot = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("nm")).as("sn"),
        sum(col("dm")).as("sd"))
    val pseudo = base.join(broadcast(tot), Seq("grp"))
      .withColumn("bad",
        (col("sd") - col("dm") === 0L).cast("bigint"))
      .withColumn("r_i",
        when(col("sd") - col("dm") === 0L, lit(0L))
          .otherwise(expr(
            """CAST(round(1e6 * CAST(sn - nm AS DOUBLE)
              |  / CAST(sd - dm AS DOUBLE)) AS BIGINT)""".stripMargin)))
    val d = (c: String) => col(c).cast("decimal(38,0)")
    pseudo.groupBy(col("grp"))
      .agg(max(col("n")).as("n_rows"), max(col("sn")).as("sn"),
        max(col("sd")).as("sd"), sum(col("bad")).as("n_bad"),
        sum(d("r_i")).as("sr"), sum(d("r_i") * d("r_i")).as("srr"))
      .select(col("grp"), col("n_rows"),
        when(col("sd") === 0L, lit(-1L))
          .otherwise(expr(
            "CAST(round(1e6 * CAST(sn AS DOUBLE) / CAST(sd AS DOUBLE))" +
              " AS BIGINT)"))
          .as("ratio_micro"),
        when(col("n_rows") < 2L || col("n_bad") > 0L || col("sd") === 0L,
          lit(-1L))
          .otherwise(expr(
            """CAST(round(sqrt((CAST(n_rows AS DOUBLE) - 1)
              |  * CAST(n_rows * srr - sr * sr AS DOUBLE)
              |  / CAST(n_rows AS DOUBLE) / n_rows)) AS BIGINT)"""
              .stripMargin))
          .as("jk_se_micro"))
  }

  /** SPEARMAN rank correlation between two measures, per group — the
    * outlier-robust, monotone-invariant companion of the q135 Pearson
    * family (a heavy-tailed measure pair can read Pearson ≈ 0 while the
    * ranks are almost perfectly coupled). Ties get average ranks, kept
    * exact by working with DOUBLED ranks: `r2 = 2·rank_min + (t − 1)`
    * is an integer for any tie width, and Pearson is invariant to the
    * common ×2. Emits `(grp, n_rows, rho_micro)`;
    *
    * Exactness: micro-quantized values rank identically in both
    * engines; moments over the doubled ranks are exact decimal sums,
    * and ONE f64 divide+sqrt at the very end rounds to micro (the
    * q135/q227 convention; −10⁶ sentinel when either margin is
    * constant, doubling as perfect anti-correlation).
    *
    * Scale shape: two group-partitioned rank windows + one tie-count
    * window each (never global), then a single moment aggregation per
    * group. The per-group sort is the honest cost of exact ranks —
    * partition-parallel across groups.
    */
  def spearmanCorr(
      df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("grp"),
      DataPrep.micro(col(xCol)).as("xm"),
      DataPrep.micro(col(yCol)).as("ym"))
    val ranked = base
      .withColumn("rx", rank().over(
        Window.partitionBy(col("grp")).orderBy(col("xm"))))
      .withColumn("tx", count(lit(1)).over(
        Window.partitionBy(col("grp"), col("xm"))))
      .withColumn("ry", rank().over(
        Window.partitionBy(col("grp")).orderBy(col("ym"))))
      .withColumn("ty", count(lit(1)).over(
        Window.partitionBy(col("grp"), col("ym"))))
      .select(col("grp"),
        (lit(2L) * col("rx") + col("tx") - lit(1L)).as("x"),
        (lit(2L) * col("ry") + col("ty") - lit(1L)).as("y"))
    val d = (c: String) => col(c).cast("decimal(38,0)")
    ranked.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(d("x")).as("sx"), sum(d("y")).as("sy"),
        sum(d("x") * d("y")).as("sxy"),
        sum(d("x") * d("x")).as("sxx"),
        sum(d("y") * d("y")).as("syy"))
      .select(col("grp"), col("n").as("n_rows"),
        when(expr("n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0"),
          lit(-1000000L))
          .otherwise(expr(
            """CAST(round(1e6 * CAST(n * sxy - sx * sy AS DOUBLE)
              |  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
              |    * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)"""
              .stripMargin))
          .as("rho_micro"))
  }
}

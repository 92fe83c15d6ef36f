package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Materialize.MaterializeOps

/** Privacy-preserving release transforms for training corpora — the
  * quasi-identifier side of PII handling (the direct-identifier side is
  * [[TextPipeline]]'s redaction): before events/user tables feed a
  * training pipeline, combinations of quasi-identifiers that single out
  * fewer than k individuals must be coarsened or suppressed.
  */
object Privacy {

  /** Cascading k-anonymity generalization (local recoding with a
    * generalization ladder): each row is published at the FINEST ladder
    * level whose quasi-identifier group still holds ≥ k rows among the
    * rows that reached that level; rows failing every level are fully
    * suppressed (`'*'`). Output: `(id, level, g1..gm)` — `level` is the
    * assigned ladder rung (ladder size = full suppression) and `g1..gm`
    * the published quasi values at that rung, all strings.
    *
    * Published equivalence classes are (level, g1..gm) tuples: level-0
    * classes pass the ≥ k test over the full input, level-i classes over
    * exactly the rows published at level i — so every non-suppressed
    * class holds ≥ k rows, the k-anonymity invariant (spec-pinned).
    * Suppressed rows reveal nothing and may number < k, the standard
    * convention.
    *
    * `levels(i)` names this level's PRE-COMPUTED quasi columns (the
    * caller owns the coarsening exprs — buckets, prefixes, decades);
    * all levels must share arity, and each level should be a genuine
    * coarsening of the previous for the ladder to make sense (not
    * checked — a non-monotone ladder still k-anonymizes, it just wastes
    * levels). All quasi values pass through `CAST(... AS STRING)`; keep
    * the source exprs integer/string so the cast is engine-portable.
    *
    * Plan shape: one aggregation + one aggregation-keyed join per level
    * over a geometrically shrinking residual (level i only re-processes
    * rows that failed level i−1) — ladder depth is small and fixed, so
    * the cost is ~2 shuffles of the residual per rung, never a
    * per-group loop; no driver-side state at all.
    */
  def kAnonymize(
      df: DataFrame, idCol: String, levels: Seq[Seq[String]], k: Long): DataFrame = {
    require(levels.nonEmpty, "need at least one generalization level")
    val m = levels.head.size
    require(m >= 1 && levels.forall(_.size == m), "all levels need the same arity")
    require(k >= 1, "k must be >= 1")
    val gNames = (1 to m).map(i => s"g$i")
    var rest = df.select(col(idCol).cast("bigint").as("id") +:
      levels.zipWithIndex.flatMap { case (cs, li) =>
        cs.zip(gNames).map { case (c, g) => col(c).cast("string").as(s"__l${li}_$g") }
      }: _*)
    val published = levels.zipWithIndex.map { case (_, li) =>
      val lcols = gNames.map(g => s"__l${li}_$g")
      val counts = rest.groupBy(lcols.map(col): _*).agg(count(lit(1)).as("__ka_n"))
      val joined = rest.join(counts, lcols)
      val pass = joined.filter(col("__ka_n") >= k)
        .select(col("id") +: lit(li.toLong).as("level") +:
          lcols.zip(gNames).map { case (lc, g) => col(lc).as(g) }: _*)
      // Pin the residual: without this, level i+1's counts, its join AND the
      // final union all re-derive the whole upstream chain from lineage, so
      // the base scan re-runs once per rung. Same loop-invariant pattern as
      // pageRank/connectedComponents.
      rest = joined.filter(col("__ka_n") < k).drop("__ka_n").materialize
      pass
    }
    val suppressed = rest.select(col("id") +: lit(levels.size.toLong).as("level") +:
      gNames.map(g => lit("*").as(g)): _*)
    (published :+ suppressed).reduce(_.unionByName(_))
  }

  /** Distinct-l-diversity audit — the attribute-disclosure complement of
    * [[kAnonymize]]: a class can hold ≥ k rows yet still leak (every
    * member shares one sensitive value, so membership reveals it). Per
    * quasi-identifier class, counts rows and DISTINCT sensitive values
    * and flags classes below `l` — the release gate a pipeline applies
    * AFTER generalization.
    *
    * One aggregation (count + count_distinct on the same keys, one
    * shuffle); output is class-cardinality-bounded, not row-bounded.
    */
  def lDiversityAudit(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(!quasiCols.contains(sensitiveCol), "sensitive column cannot be a quasi-identifier")
    require(l >= 1, "l must be >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("diverse", (col("n_sensitive") >= l).cast("bigint"))
  }

  /** T-CLOSENESS audit — the third rung of the disclosure-control ladder
    * ([[kAnonymize]] stops re-identification, [[lDiversityAudit]] stops
    * homogeneity, t-closeness stops SKEWNESS: a class can hold l distinct
    * sensitive values yet still leak — "90% of this class has condition
    * X" when the population rate is 1%). Per quasi class, the total-
    * variation distance between the class's sensitive-value distribution
    * and the GLOBAL one, exact integers (the q159 closure trick — values
    * absent from the class contribute their full global mass without a
    * classes × values grid):
    *
    *   TV_c = (Σ_{v∈c} |n_cv·N − n_v·N_c| + (N − covered_c)·N_c)
    *          / (2·N_c·N)
    *
    * `tv_ppm` is the DIV-truncated ratio; the `close` flag uses the
    * EXACT clear-denominator gate `num·10⁶ ≤ tPpm·2·N_c·N` (a truncated
    * ppm could mis-flag a class sitting exactly on the threshold).
    *
    * Scale shape: one (quasi, value) aggregation with map-side combine,
    * one value-keyed join against the values-bounded global table, one
    * per-class reduce, a broadcast 1-row total — nothing is ever
    * classes × values.
    */
  def tClosenessAudit(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      tPpm: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(!quasiCols.contains(sensitiveCol),
      "sensitive column cannot be a quasi-identifier")
    require(tPpm >= 1 && tPpm <= 1000000L, "tPpm in [1, 1e6]")
    val qs = quasiCols.map(col)
    val base = df.select(qs :+ col(sensitiveCol).as("__v"): _*)
    val cells = base.groupBy(qs :+ col("__v"): _*)
      .agg(count(lit(1)).as("n_cv"))
    val glob = base.groupBy(col("__v")).agg(count(lit(1)).as("n_v"))
    val tot = base.agg(count(lit(1)).as("n"))
    val nc = cells.groupBy(qs: _*).agg(sum(col("n_cv")).as("n_c"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    cells.join(glob, Seq("__v"))
      .join(nc, quasiCols)
      .crossJoin(broadcast(tot))
      .withColumn("dv",
        abs(d(col("n_cv")) * d(col("n")) - d(col("n_v")) * d(col("n_c"))))
      .groupBy(qs: _*)
      .agg(max(col("n_c")).as("n_rows"), max(col("n")).as("n"),
        sum(col("dv")).as("present"), sum(col("n_v")).as("covered"))
      .withColumn("num",
        col("present") + (d(col("n")) - d(col("covered"))) * d(col("n_rows")))
      .select(qs ++ Seq(col("n_rows"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * num)
               | DIV (CAST(2 AS DECIMAL(38,0)) * CAST(n_rows AS DECIMAL(38,0))
               |      * CAST(n AS DECIMAL(38,0))) AS BIGINT)""".stripMargin)
          .as("tv_ppm"),
        (col("num") * lit(1000000L)
          <= d(lit(tPpm)) * lit(2L) * d(col("n_rows")) * d(col("n")))
          .cast("bigint").as("close")): _*)
  }

  /** LAPLACE-NOISED COUNTS — the ε-differential-privacy release
    * MECHANISM for a count query (sensitivity 1), completing the
    * k-anonymity → l-diversity → t-closeness ladder with the noise-based
    * end of the privacy spectrum: per group, count + Lap(1/ε) via the
    * inverse CDF,
    *
    *   noise = −(1/ε) · sign(u − ½) · ln(1 − 2|u − ½|).
    *
    * ENGINE-TEST CAVEAT, stated loudly: `u` here is md5-derived from the
    * group key and a caller salt, so the release is DETERMINISTIC —
    * reproducible across engines (the oracle replays it) and across
    * retries (a re-run cannot burn extra privacy budget by re-sampling),
    * but a true production ε-DP release must draw u fresh from a CSPRNG per
    * release; swap the salt for that draw and the mechanism is the
    * textbook one. The TRUE count is emitted alongside (this is a
    * mechanism-machinery query, not a release).
    *
    * Exactness: u = (h + ½)/10⁶ with h = md5-hex8 mod 10⁶, so
    * t = 1 − 2|u − ½| has the exact integer form 10⁶ − |2h + 1 − 10⁶|
    * (odd numerator ⇒ never 0); ln t takes the one per-group rounded
    * micro-nat call (the q74 convention) and the 1/ε scaling is an
    * exact integer division. `noisy_micro = 10⁶·count + noise_micro`.
    *
    * Scale shape: one grouped count with map-side combine; the noise is
    * a per-row scalar expression on the group-bounded result. Nothing
    * else.
    */
  def dpNoisyCounts(
      df: DataFrame, groupCol: String, epsilonMicro: Long,
      salt: String): DataFrame = {
    require(epsilonMicro > 0, "dpNoisyCounts: epsilonMicro > 0")
    require(!salt.contains("'"), "dpNoisyCounts: salt must not contain quotes")
    df.select(col(groupCol).cast("string").as("grp"))
      .groupBy(col("grp")).agg(count(lit(1)).as("true_count"))
      .withColumn("h", expr(
        s"conv(substring(md5(concat(grp, ':$salt')), 1, 8), 16, 10)")
        .cast("bigint") % 1000000L)
      .withColumn("tm", lit(1000000L) - abs(lit(2L) * col("h") + 1L - 1000000L))
      .withColumn("ln_micro",
        round(lit(1e6) * log(col("tm").cast("double") / 1e6)).cast("bigint"))
      .withColumn("noise_micro", expr(
        s"""CAST(CASE WHEN 2 * h + 1 > 1000000
           |  THEN -(ln_micro * 1000000) DIV $epsilonMicro
           |  ELSE (ln_micro * 1000000) DIV $epsilonMicro END AS BIGINT)""".stripMargin))
      .select(col("grp"), col("true_count"),
        col("noise_micro"),
        (col("true_count") * lit(1000000L) + col("noise_micro"))
          .as("noisy_micro"))
  }
}

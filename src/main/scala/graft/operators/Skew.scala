package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join split (spark.sql.adaptive.skewJoin) handles most cases
  * at runtime; explicit salting remains the tool when one side must be a
  * shuffle join AND the hot keys are known or unbounded (e.g. a power-law
  * user_id). The big side gets a uniform random-ish salt derived from a
  * stable row expression (no rand() — deterministic, retry-safe); the
  * small side is replicated once per salt value. Join key becomes
  * (key, salt), spreading each hot key over `salts` reducers.
  *
  * Cost model: small side inflates by `salts`x (it shuffles or broadcasts
  * that many copies); choose salts ~ (hot-key rows / target rows per
  * partition). Correctness is identical to the unsalted join for
  * inner/left joins on equi-keys, which a spec pins.
  */
object Skew {

  /** Deterministic salt in [0, salts): hash of a stable discriminator
    * column (e.g. a unique id) — NOT rand(), so task retries and AQE
    * re-execution see the same assignment.
    */
  def saltCol(discriminator: Column, salts: Int): Column =
    pmod(xxhash64(discriminator), lit(salts)).cast("int")

  /** Inner/left equi-join of a skewed big side against a small side,
    * salted `salts` ways. `bigDiscriminator` must be stable per big-side
    * row (a primary key works).
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      bigDiscriminator: Column, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    // replication of the small side is only correct when unmatched
    // small-side rows never surface: right/full joins would emit each
    // unmatched small row once PER SALT
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType),
      s"saltedJoin supports inner/left joins only, got '$joinType'")
    val saltedBig = big.withColumn("__salt", saltCol(bigDiscriminator, salts))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** KEY-SKEW DIAGNOSTICS — the one-row report that decides whether a
    * join/aggregation key needs salting, AQE skew handling, or nothing:
    * exact count-distribution statistics of a key column. `skew_ratio_ppm`
    * is max/mean in ppm (10⁶ = perfectly uniform; the number to compare
    * against the salt factor), `gini_ppm` is the rank-form Gini of the
    * per-key counts (0 = uniform, → 10⁶ = one key owns everything),
    * p50/p99 are exact `percentile_disc` counts. Empty input reads the
    * −1 sentinels.
    *
    * Scale shape: one key count (map-side combined, the only key-scaled
    * aggregation), collapsed to the COUNT-OF-COUNTS histogram — bounded
    * by distinct count VALUES, not keys — so the cumulative pass is
    * [[Ranks.offsetCumSum]] over a resolution-bounded frame (the
    * q154/q198 ksFromCounts trick: no per-key global window, no
    * unpartitioned sort anywhere). Gini's rank sum folds tied blocks in
    * closed form: 2S = Σ_v c·f·(2·prior + f + 1). Percentile picks are
    * filtered min-aggregations against a broadcast totals row.
    * The histogram frame feeds four consumers, so it is persisted —
    * tracked, [[Dedup.releaseCaches]] frees it.
    */
  def keySkewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.select(col(keyCol).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("c"))
    val cc = Dedup.persistTracked(
      counts.groupBy(col("c")).agg(count(lit(1)).as("f")))
    val cum = Ranks.offsetCumSum(cc, Seq("c"), Seq("f"))
    val tot = broadcast(cc.agg(
      coalesce(sum(col("c") * col("f")), lit(0L)).as("n_rows"),
      coalesce(sum(col("f")), lit(0L)).as("n_keys"),
      coalesce(max(col("c")), lit(0L)).as("max_count")))
    val d = (s: String) => col(s).cast("decimal(38,0)")
    val gini = cum
      .withColumn("p", col("cum_f") - col("f"))
      .agg(coalesce(sum(d("c") * d("f") *
          (lit(2).cast("decimal(38,0)") * col("p") + col("f") + lit(1))),
        lit(0).cast("decimal(38,0)")).as("twos"))
    val p50 = cum.crossJoin(broadcast(tot))
      .filter(col("cum_f") >= expr("(n_keys + 1) DIV 2"))
      .agg(coalesce(min(col("c")), lit(-1L)).as("p50_count"))
    val p99 = cum.crossJoin(broadcast(tot))
      .filter(col("cum_f") >= expr("(99 * n_keys + 99) DIV 100"))
      .agg(coalesce(min(col("c")), lit(-1L)).as("p99_count"))
    tot.crossJoin(broadcast(p50)).crossJoin(broadcast(p99))
      .crossJoin(broadcast(gini))
      .select(col("n_rows"), col("n_keys"), col("max_count"),
        when(col("n_keys") === 0L, lit(-1L))
          .otherwise(expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * n_rows) DIV n_keys AS BIGINT)"))
          .as("mean_count_micro"),
        col("p50_count"), col("p99_count"),
        when(col("n_rows") === 0L, lit(-1L))
          .otherwise(expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * max_count) DIV n_rows AS BIGINT)"))
          .as("top1_share_ppm"),
        when(col("n_rows") === 0L, lit(-1L))
          .otherwise(expr(
            """CAST((CAST(1000000 AS DECIMAL(38,0)) * max_count * n_keys)
              | DIV n_rows AS BIGINT)""".stripMargin))
          .as("skew_ratio_ppm"),
        when(col("n_keys") === 0L || col("n_rows") === 0L, lit(-1L))
          .otherwise(expr(
            """CAST((CAST(1000000 AS DECIMAL(38,0)) *
              |  (twos - (CAST(n_keys AS DECIMAL(38,0)) + 1)
              |     * CAST(n_rows AS DECIMAL(38,0))))
              | DIV (CAST(n_keys AS DECIMAL(38,0))
              |      * CAST(n_rows AS DECIMAL(38,0))) AS BIGINT)""".stripMargin))
          .as("gini_ppm"))
  }
}

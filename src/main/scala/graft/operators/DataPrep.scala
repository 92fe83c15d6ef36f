package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Training-set preparation stages: deterministic splits, context-window
  * chunking, sequence packing, and TF-IDF term scoring. Everything is
  * stateless per row or a single keyed shuffle — no driver-side loops, no
  * collected side state — so each operator scales horizontally with the
  * corpus.
  */
object DataPrep {

  /** `CAST(round(v * 1e6) AS BIGINT)` built with the Column API — the
    * standard HALF_UP micro-quantization every histogram/stat operator
    * uses, expressed without interpolating caller column names into
    * `expr()` SQL (a name needing backticks would fail to parse or
    * evaluate as an unintended expression). Bit-identical to the SQL
    * form: same `round` (HALF_UP), same double literal, same cast.
    */
  private[graft] def micro(c: Column): Column =
    round(c * lit(1e6)).cast("bigint")

  /** Deterministic train/test assignment by content-independent id hash:
    * bucket = first 4 hex chars of md5(id), split = train iff bucket is
    * below `trainBps`/10000 of the 16^4 bucket space. Properties that
    * matter at 100 TB: (a) stateless and shuffle-free — a map-only
    * projection; (b) stable under reruns, repartitioning, and corpus
    * growth (a doc's split never depends on other rows); (c) portable —
    * fixed-width lowercase hex compares lexicographically == numerically
    * in any engine, so downstream systems can reproduce the split with
    * one SQL expression.
    */
  def hashSplit(df: DataFrame, idCol: String, trainBps: Int = 8000): DataFrame = {
    require(trainBps >= 0 && trainBps <= 10000, "trainBps is basis points in [0, 10000]")
    // trainBps == 10000 must mean "everything trains": the general cut would
    // be 65536 = "10000"(5 hex chars), and a 5-char cut compared against
    // 4-char buckets breaks the lexicographic==numeric equivalence the
    // fixed-width encoding relies on.
    val split =
      if (trainBps == 10000) lit("train")
      else {
        val cut = f"${trainBps.toLong * 65536 / 10000}%04x"
        when(col("bucket") < lit(cut), "train").otherwise("test")
      }
    df.withColumn("bucket", substring(md5(col(idCol).cast("string")), 1, 4))
      .withColumn("split", split)
  }

  /** LEAKAGE-SAFE train/test split: [[hashSplit]], but near-duplicate
    * documents always land in the SAME split — the eval-contamination
    * guard (a test doc whose near-twin is in train inflates every metric;
    * splitting doc-by-doc cannot prevent it). `pairs` is any near-dup
    * pair list (id_a, id_b) from the [[Dedup]] family; documents are
    * grouped into connected components over those pairs and the split is
    * decided by md5 of the COMPONENT representative (min doc id — the
    * [[Dedup.keepRepresentatives]] convention), so every member of a
    * near-dup cluster moves together. Isolated docs are their own
    * component, so with an empty pair list this IS hashSplit modulo the
    * hash input. Returns the docs plus (component, bucket, split).
    *
    * Scale shape: components are O(log n) alternating-star rounds over
    * the pair list (pairs only — docs without dups never enter the graph)
    * plus one left join of the component table; the split itself stays a
    * map-only projection.
    */
  def leakageSafeSplit(
      docs: DataFrame, idCol: String, pairs: DataFrame,
      trainBps: Int = 8000): DataFrame = {
    val comps = Dedup.connectedComponents(pairs)
    val tagged = docs
      .join(comps.withColumnsRenamed(Map("id" -> idCol)), Seq(idCol), "left")
      .withColumn("component", coalesce(col("comp"), col(idCol)))
      .drop("comp")
    hashSplit(tagged, "component", trainBps)
  }

  /** Sliding context-window chunking: token windows of `chunkSize` every
    * `stride` tokens (overlap = chunkSize - stride), the standard prep for
    * fixed-context-model training. A doc with n tokens yields
    * ceil((n - chunkSize) / stride) + 1 chunks (one chunk when
    * n <= chunkSize); empty docs yield none. One explode, no shuffle —
    * chunking happens where the doc is.
    */
  def chunkTokens(
      docs: DataFrame, textCol: String, idCol: String,
      chunkSize: Int = 64, stride: Int = 48): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      "need 1 <= stride <= chunkSize")
    docs
      // n > 0 <=> trim(text) != "": filtering BEFORE tokenizing keeps the
      // predicate cheap and pushdown-able — `filter(size(w) > 0)` after the
      // projection gets pushed below it by Catalyst with the whole tokenize
      // pipeline re-inlined, running the regex split twice per row
      .filter(trim(col(textCol)) =!= "")
      .select(col(idCol).as("doc"), T.tokens(col(textCol)).as("w"))
      .withColumn("n", size(col("w")))
      .withColumn("k",
        greatest(lit(0), ceil((col("n") - chunkSize).cast("double") / stride).cast("int")))
      .select(col("doc"), col("w"), col("n"),
        explode(sequence(lit(0), col("k"))).as("i"))
      .select(
        col("doc"),
        col("i").as("chunk_idx"),
        (col("i") * stride).as("start"),
        least(lit(chunkSize), col("n") - col("i") * stride).as("chunk_len"),
        concat_ws(" ", slice(col("w"), col("i") * stride + 1, lit(chunkSize))).as("chunk_text"))
  }

  /** Fixed-token-budget sequence packing: docs are laid out in (group,
    * id) order and assigned to consecutive packs of ~`budget` tokens —
    * pack boundaries fall where the RUNNING total crosses a multiple of
    * the budget (cumulative-offset packing: deterministic, one window
    * pass, no sequential bin state). Docs longer than the budget get a
    * pack of their own plus spillover, which downstream chunking
    * (see [[chunkTokens]]) splits anyway. One shuffle on the group key;
    * packs never cross groups, so skewed groups parallelize per group.
    */
  def packSequences(
      docs: DataFrame, textCol: String, idCol: String, groupCol: String,
      budget: Int = 512): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val w = Window.partitionBy(col("grp")).orderBy(col("doc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol).as("doc"), col(groupCol).as("grp"),
        T.tokenCount(col(textCol)).as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("doc"), col("grp"), col("n_tok"),
        expr(s"(cum - n_tok) DIV $budget").as("pack_id"))
  }

  /** Top-k TF-IDF terms per document: tf = in-doc occurrences, idf =
    * ln((N+1)/(df+1)) with df = docs containing the term. Two keyed
    * aggregations plus a broadcast of the (tiny) corpus size — the
    * document-frequency table shuffles on the term, the ranking windows
    * on the doc, and nothing is collected to the driver. Ranking ties
    * break on the ROUNDED score then term text, so ordering is stable
    * across engines computing ln() a ulp apart.
    */
  def tfidfTopTerms(
      docs: DataFrame, textCol: String, idCol: String, k: Int = 5): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc"), explode(T.tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy(col("doc"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df")) // tf rows are distinct (doc, tok)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(df, Seq("tok"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 6))
    val rankW = Window.partitionBy(col("doc"))
      .orderBy(col("score").desc, col("tok").asc)
    scored
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("doc"), col("rank"), col("tok"), col("tf"), col("df"), col("score"))
  }

  /** Morton / Z-ORDER interleave of two non-negative integer columns:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1, giving a
    * single key whose lexicographic order preserves MULTI-dimensional
    * locality — the layout trick behind "OPTIMIZE ZORDER BY": sorting/
    * range-partitioning 100 TB of parquet by z lets min/max row-group
    * statistics prune scans on EITHER (or both) dimension(s), where a
    * single-column sort only ever prunes one.
    *
    * The interleave is a static tree of 2*bits shift/and/or terms — pure
    * integer bit math inside whole-stage codegen, exact and identical in
    * any engine (the q104 oracle rebuilds it with the same shifts).
    * Key property (pinned in spec): a 2^k-aligned 2^k x 2^k box maps to
    * exactly one CONTIGUOUS z-range, so aligned box queries touch the
    * minimum possible partition count.
    *
    * Inputs must already be quantized to `bits` bits (mask or bucket
    * upstream); values outside [0, 2^bits) would alias silently, so the
    * caller masks — the operator composes with any monotone quantizer.
    */
  def zorderValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits in [1, 31] (z fits a signed long)")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-order layout assignment: adds the interleaved key `z` and a
    * `bucket` in [0, nBuckets) by taking z's TOP log2(nBuckets) bits —
    * equal-width z-ranges, so bucket boundaries are data-independent
    * (stable under corpus growth, no sampling pass). Writing one file
    * per bucket (or `repartitionByRange(z)`) yields the clustered
    * layout; nBuckets must be a power of two dividing the z-space.
    */
  def zorderLayout(
      df: DataFrame, xCol: String, yCol: String,
      bits: Int, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && (nBuckets & (nBuckets - 1)) == 0,
      "nBuckets must be a power of two")
    val logB = 31 - Integer.numberOfLeadingZeros(nBuckets)
    require(2 * bits >= logB, "nBuckets exceeds the z-space")
    df.withColumn("z",
        zorderValue(col(xCol).cast("long"), col(yCol).cast("long"), bits))
      .withColumn("bucket", shiftright(col("z"), 2 * bits - logB))
  }

  /** The buckets a half-open box query [x0, x1) × [y0, y1) can touch
    * under [[zorderLayout]]'s equal-width bucketing — the scan-planning
    * half of the z-order story: a reader writes the layout partitioned by
    * `bucket`, then turns a box predicate into `bucket IN (...)` with
    * this function and lets partition pruning skip every other
    * directory/file. Driver-side pure bit math: the top log2(nBuckets)
    * bits of z are the interleaved top bits of y and x, so buckets tile
    * the plane in a 2^floor(logB/2) × 2^ceil(logB/2) coarse grid and a
    * box covers the tiles its corners span — O(tiles-covered) to
    * enumerate, independent of data size.
    *
    * ZorderPruningSpec measures the payoff on a 256×256 grid in 64
    * buckets: a one-tile aligned box reads 1 of 64 files (64× fewer) and
    * a 2×1-tile box 2 of 64 — versus ALL 64 files for the same predicate
    * on an unclustered round-robin layout of equal file count.
    */
  def zorderBoxBuckets(
      x0: Long, x1: Long, y0: Long, y1: Long,
      bits: Int, nBuckets: Int): Seq[Long] = {
    require(bits >= 1 && bits <= 31, "bits in [1, 31]") // zorderValue's window
    require(nBuckets >= 1 && (nBuckets & (nBuckets - 1)) == 0,
      "nBuckets must be a power of two")
    val logB = 31 - Integer.numberOfLeadingZeros(nBuckets)
    require(2 * bits >= logB, "nBuckets exceeds the z-space")
    require(x0 < x1 && y0 < y1, "box must be non-empty (half-open)")
    val max = 1L << bits
    require(x0 >= 0 && x1 <= max && y0 >= 0 && y1 <= max,
      s"box must lie in the quantized space [0, 2^$bits)")
    // z bit 2i is x bit i, z bit 2i+1 is y bit i => the top logB z-bits
    // hold the top floor(logB/2) x-bits and top ceil(logB/2) y-bits
    val bx = logB / 2
    val by = logB - bx
    def interleave(x: Long, y: Long): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      ).reduce(_ | _)
    val shift = 2 * bits - logB
    (for {
      tx <- (x0 >> (bits - bx)) to ((x1 - 1) >> (bits - bx))
      ty <- (y0 >> (bits - by)) to ((y1 - 1) >> (bits - by))
    } yield interleave(tx << (bits - bx), ty << (bits - by)) >> shift).distinct
  }

  /** Quantile (rank) normalization per group — the distribution-free
    * feature transform: each value maps to its within-group percentile
    * in integer basis points, `pct_bps = 10000·(rn−1) div (n−1)` over
    * the deterministic (value, id) rank (a single-member group maps to
    * 0). Robust to arbitrary monotone distortions of the raw feature —
    * the standard "quantile transform" a tabular model consumes.
    *
    * One shuffle on grp, one per-partition sort shared by the rank and
    * count windows. Skew bound = group size, the natural per-key floor.
    */
  // shared quantize+rank prep for the scaling operators: (id, grp,
  // xm=micro value, n=group size, rn=deterministic (value, id) rank).
  // The quantization and tie-break conventions here are hash-parity-
  // critical — one definition, shared with FeatureEng's bin/winsorize.
  private[operators] def rankedByGroup(
      df: DataFrame, groupCol: String, valueCol: String, idCol: String): DataFrame = {
    val wg = Window.partitionBy(col("grp"))
    val wv = wg.orderBy(col("xm"), col("id"))
    df.select(col(idCol).cast("bigint").as("id"), col(groupCol).as("grp"),
        round(col(valueCol) * lit(1e6)).cast("bigint").as("xm"))
      .withColumn("n", count(lit(1)).over(wg))
      .withColumn("rn", row_number().over(wv))
  }

  def rankNormalize(
      df: DataFrame, groupCol: String, valueCol: String, idCol: String): DataFrame =
    rankedByGroup(df, groupCol, valueCol, idCol)
      .select(col("id"), col("grp"), col("xm").as("value_micro"),
        when(col("n") === 1, lit(0L))
          .otherwise(expr("(10000 * (rn - 1)) DIV (n - 1)")).as("pct_bps"))

  /** QUANTILE NORMALIZATION against the pooled distribution — the
    * batch-effect correction: each group's values are remapped onto the
    * CORPUS-WIDE value distribution at the same within-group quantile,
    * so every group ends up with (a subsample of) the same marginal
    * distribution and cross-group comparisons stop reflecting
    * per-source calibration quirks (source A's quality model scoring
    * systematically 0.1 higher stops mattering). The genomics-standard
    * "quantile normalize", exact-integer:
    *
    *   target rank in pool = ceil(q · N) over q = rn/n (clear-denominator
    *   form `pr = (rn·N + n − 1) DIV n`), normalized value = pooled
    *   value at pooled rank pr (deterministic (value, id) order both
    *   sides).
    *
    * Output: `(id, grp, value_micro, norm_micro)`.
    *
    * Scale shape: one grp-keyed rank window (the [[rankNormalize]]
    * exchange); the pooled reference is the [[Ranks.offsetRank]]
    * distributed rank of the full frame — a range exchange plus a
    * broadcast-offset join, NO single-partition sort (ranks are
    * bit-identical to the `row_number OVER (ORDER BY xm, id)` form, and
    * this beats a distinct-value prefix-sum when values are
    * micro-quantized doubles with distinct ≈ N) — then an equi-join on
    * the computed pooled rank. The pool size enters as a collected
    * literal, replacing the former `count(*) OVER ()` global window.
    * The pooled intermediate is persisted (tracked —
    * [[Dedup.releaseCaches]] frees it).
    */
  def quantileNormalize(
      df: DataFrame, groupCol: String, valueCol: String,
      idCol: String): DataFrame = {
    val ranked = rankedByGroup(df, groupCol, valueCol, idCol)
    val e = df.select(col(idCol).cast("bigint").as("id"),
      round(col(valueCol) * lit(1e6)).cast("bigint").as("xm"))
    val (pooled, np) = Ranks.offsetRank(e, Nil, Seq("xm", "id"), "pr")
    val pool = pooled.select(col("pr"), col("xm").as("norm_micro"))
    ranked
      .withColumn("pr", expr(s"(rn * ${np}L + n - 1) DIV n"))
      .join(pool, Seq("pr"))
      .select(col("id"), col("grp"), col("xm").as("value_micro"),
        col("norm_micro"))
  }

  /** Trimmed mean per group with an EXACT integer trim rule: keep ranks
    * with `20·rn > n` and `20·rn ≤ 19·n` (drop the bottom and top 5% by
    * rank — the fraction as a rational, no float thresholds), then
    * `mean_micro = sum div count`. The robust location estimate that
    * survives heavy tails where a plain mean is dragged; groups too
    * small to trim (every rank excluded) emit no row.
    *
    * Same one-exchange shape as [[rankNormalize]]; the final aggregation
    * rides the existing grp partitioning without a second shuffle.
    */
  def trimmedMean(
      df: DataFrame, groupCol: String, valueCol: String, idCol: String): DataFrame =
    rankedByGroup(df, groupCol, valueCol, idCol)
      .filter(lit(20L) * col("rn") > col("n") && lit(20L) * col("rn") <= lit(19L) * col("n"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_kept"), sum(col("xm")).as("sum_micro"))
      .select(col("grp"), col("n_kept"), col("sum_micro"),
        expr("sum_micro DIV n_kept").as("trimmed_mean_micro"))

  /** REFERENTIAL-INTEGRITY AUDIT — the join-health gate a lakehouse runs
    * before trusting a snapshot: for each declared child→parent key
    * relation, how many child rows carry NULL keys, how many reference a
    * parent that does not exist (orphans — the rows an inner join will
    * silently DROP), and how many parent keys are never referenced
    * (unreachable dimension rows). `orphan_ppm` is exact over the
    * non-null child rows (−1 when every key is NULL).
    *
    * One pass per relation: the child key column LEFT-joins the parent's
    * distinct key set with a match marker, and every child-side statistic
    * (row/null/distinct/orphan counts) falls out of ONE aggregation over
    * the marked frame; `unref_parents` is the parent's distinct key count
    * (a second, parent-bounded aggregate) minus the matched distinct
    * count — no second join. At scale the key-only projection keeps the
    * shuffle narrow (two columns), AQE broadcasts genuinely small
    * dimension sides, and the output is |relations| rows.
    */
  def referentialAudit(
      relations: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(relations.nonEmpty, "referentialAudit: at least one relation")
    require(relations.map(_._1).distinct.length == relations.length,
      "referentialAudit: relation names must be distinct")
    relations.map { case (name, child, childKey, parent, parentKey) =>
      val pkd = parent.select(col(parentKey).as("k"))
        .filter(col("k").isNotNull).distinct()
      val marked = child.select(col(childKey).as("k"))
        .join(pkd.withColumn("m", lit(1)), Seq("k"), "left")
      marked
        .agg(count(lit(1)).as("child_rows"),
          coalesce(sum(when(col("k").isNull, 1L).otherwise(0L)), lit(0L))
            .as("null_keys"),
          count_distinct(col("k")).as("distinct_keys"),
          coalesce(sum(when(col("k").isNotNull && col("m").isNull, 1L)
            .otherwise(0L)), lit(0L)).as("orphan_rows"),
          count_distinct(when(col("m").isNull, col("k"))).as("orphan_keys"),
          count_distinct(when(col("m").isNotNull, col("k"))).as("matched"))
        .crossJoin(broadcast(pkd.agg(count(lit(1)).as("parent_keys"))))
        .select(lit(name).as("relation"), col("child_rows"), col("null_keys"),
          col("distinct_keys"), col("orphan_rows"), col("orphan_keys"),
          when(col("child_rows") === col("null_keys"), lit(-1L))
            .otherwise(expr(
              """CAST((CAST(1000000 AS DECIMAL(38,0)) * orphan_rows)
                | DIV (child_rows - null_keys) AS BIGINT)""".stripMargin))
            .as("orphan_ppm"),
          col("parent_keys"),
          (col("parent_keys") - col("matched")).as("unref_parents"))
    }.reduce(_ union _)
  }

  /** DATA-CONTRACT AUDIT — declarative row-level constraint checking
    * (the Deequ/dbt-test shape): each rule is a boolean SQL predicate the
    * data PROMISES; the audit reports, per rule, how many rows break the
    * promise (a NULL predicate is a violation — "unknown" fails a
    * contract), the exact violation ppm, and the smallest violating key
    * for triage (−1 = clean). The gate a 100 TB ingest runs before
    * publishing a snapshot.
    *
    * Scale shape: ONE scan evaluates EVERY rule simultaneously — all
    * violation counts and first-key mins ride a single aggregation
    * (contrast [[referentialAudit]], which needs one join per relation
    * because its rules cross tables), then a |rules|-row `stack` unpivot
    * of the 1-row aggregate. Adding a rule costs zero extra passes.
    */
  def constraintAudit(
      df: DataFrame, keyCol: String,
      rules: Seq[(String, String)]): DataFrame = {
    require(rules.nonEmpty, "constraintAudit: at least one rule")
    require(rules.map(_._1).distinct.length == rules.length,
      "constraintAudit: rule names must be distinct")
    require(rules.forall(_._1.matches("[A-Za-z0-9_]+")),
      "constraintAudit: rule names must be [A-Za-z0-9_]+ (they are embedded " +
        "in the unpivot expression)")
    val viols = rules.map { case (n, p) =>
      n -> not(coalesce(expr(p), lit(false)))
    }
    val aggs = viols.flatMap { case (n, v) =>
      Seq(sum(when(v, 1L).otherwise(0L)).as(s"v_$n"),
        min(when(v, col(keyCol).cast("long"))).as(s"k_$n"))
    }
    val base = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackExpr = s"stack(${rules.length}, " +
      rules.map { case (n, _) => s"'$n', v_$n, k_$n" }.mkString(", ") +
      ") AS (rule, violations, first_bad_key)"
    base.select(col("n_rows"), expr(stackExpr))
      .select(col("rule"), col("n_rows"),
        coalesce(col("violations"), lit(0L)).as("violations"),
        when(col("n_rows") === 0L, lit(-1L))
          .otherwise(expr(
            """CAST((CAST(1000000 AS DECIMAL(38,0)) * violations)
              | DIV n_rows AS BIGINT)""".stripMargin))
          .as("violation_ppm"),
        coalesce(col("first_bad_key"), lit(-1L)).as("first_bad_key"))
  }

  /** Benford expectation for leading digit d, in exact ppm — computed
    * ONCE in Scala (`round(10⁶·log₁₀(1 + 1/d))`) so both engines compare
    * against the same nine integer literals and no SQL `ln` enters the
    * plan.
    */
  def benfordPpm(d: Int): Long = {
    require(d >= 1 && d <= 9, "benfordPpm: digit in [1, 9]")
    math.round(1e6 * math.log(1.0 + 1.0 / d) / math.log(10.0))
  }

  /** BENFORD FIRST-DIGIT AUDIT — the fabrication/truncation screen for
    * any naturally multi-magnitude positive measure (prices, revenues,
    * populations): the leading significant digit of organic data follows
    * log₁₀(1 + 1/d); fabricated, capped, or unit-mangled data does not.
    * Emits one row per digit 1–9 (zero-count digits included) with the
    * observed share and the Benford expectation in exact ppm, plus the
    * total-variation distance `tv_ppm = (Σ|obs − exp|) DIV 2` repeated
    * on every row as the single summary number to threshold on.
    *
    * Exactness: values quantize to micro Longs and the leading digit is
    * the first character of the INTEGER's decimal rendering — no float
    * formatting, no log₁₀ in either engine (expectations are Scala-
    * computed integer literals, [[benfordPpm]]); non-positive values are
    * excluded and reported via `n_used` vs the digit counts. Digit
    * ordering ties are impossible (digits are distinct).
    *
    * Scale shape: one filter + one 9-ary groupBy with map-side combine —
    * the only data-scaled pass — joined against a 9-row literal digit
    * frame (broadcast), then a 9-row reduction for TV. Nothing sorts,
    * nothing is corpus-wide after the count.
    */
  /** Shared quantize-and-extract: the leading decimal digit of
    * `round(value·10⁶)` as an INT (null for non-positive values) — the
    * one expression the batch audit and the streaming windowed monitor
    * both apply, so their digit grids cannot drift.
    */
  def leadingDigit(value: Column): Column = {
    val xm = round(value * lit(1e6)).cast("bigint")
    when(xm > 0L, substring(xm.cast("string"), 1, 1).cast("int"))
  }

  /** THE Benford reduction, factored over a `scope` (the windowed-monitor
    * convention of StreamingKs/StreamingDrift): given per-(scope, digit)
    * counts, emit per scope the 9 digit rows with observed vs expected
    * ppm and the total-variation summary. `scopeFrame` overrides the
    * reported scopes (the batch audit passes a 1-row literal so an empty
    * input still reads its 9 sentinel rows; the streaming reduction
    * derives scopes from the closed windows themselves).
    */
  def benfordOfCounts(
      digitCounts: DataFrame, scope: Seq[String],
      scopeFrame: Option[DataFrame] = None): DataFrame = {
    require(scope.nonEmpty,
      "benfordOfCounts: non-empty scope (wrap a literal for a global audit)")
    val spark = digitCounts.sparkSession
    import spark.implicits._
    val digits =
      (1 to 9).map(d => (d, benfordPpm(d))).toDF("digit", "benford_ppm")
    val sc = scope.map(col)
    val wins = scopeFrame.getOrElse(digitCounts.select(sc: _*).distinct())
    val tot = digitCounts.groupBy(sc: _*).agg(sum(col("c")).as("__n"))
    // alias-rename the grid side before joining frames derived from the
    // same digitCounts plan — the StreamingKs fresh-attribute-ids lesson
    // (a Deduplicate-into-self-join otherwise trips conflicting refs on
    // streaming memory tables)
    val grid = wins.crossJoin(broadcast(digits))
      .select(scope.map(s => col(s).as(s"__g_$s")) ++
        Seq(col("digit").as("__g_digit"), col("benford_ppm")): _*)
    val perDigit = grid
      .join(digitCounts,
        scope.map(s => col(s"__g_$s") === col(s)).reduce(_ && _) &&
          col("__g_digit") === col("digit"),
        "left")
      .select(scope.map(s => col(s"__g_$s").as(s)) ++
        Seq(col("__g_digit").as("digit"),
          coalesce(col("c"), lit(0L)).as("cnt"), col("benford_ppm")): _*)
      .join(broadcast(tot), scope, "left")
      .withColumn("n_used", coalesce(col("__n"), lit(0L)))
      .select(sc ++ Seq(col("digit"), col("cnt"), col("n_used"),
        when(col("n_used") === 0L, lit(-1L))
          .otherwise(expr(
            """CAST((CAST(1000000 AS DECIMAL(38,0)) * cnt)
              | DIV n_used AS BIGINT)""".stripMargin))
          .as("observed_ppm"),
        col("benford_ppm")): _*)
    val tv = perDigit.groupBy(sc: _*)
      .agg(when(max(col("n_used")) === 0L, lit(-1L))
        .otherwise(expr(
          "CAST(sum(abs(observed_ppm - benford_ppm)) DIV 2 AS BIGINT)"))
        .as("tv_ppm"))
    perDigit.join(broadcast(tv), scope)
      .select(sc ++ Seq(col("digit"), col("cnt"), col("n_used"),
        col("observed_ppm"), col("benford_ppm"), col("tv_ppm")): _*)
  }

  /** WEIGHTED DISCRETE QUANTILES per group — "the price below which half
    * the shipped QUANTITY falls": each row votes with its weight, and the
    * q-quantile is the smallest value whose cumulative weight reaches
    * q/10⁴ of the group total (the lower/disc convention, so results are
    * actual corpus values — q81's exactness argument, weight-generalized;
    * `q_bps = 5000` with unit weights degenerates to percentile_disc's
    * median). The threshold test is the integer cross-multiplication
    * `10⁴·cumw ≥ q·W` — no ceil, no division, decimal-cleared.
    *
    * Values and weights quantize to micro; rows with non-positive
    * weights are dropped (a group with none emits no rows — documented,
    * not a sentinel, since every output column is a weighted statistic).
    *
    * Scale shape: one (group, value) weight aggregation with map-side
    * combine bounds everything downstream by VALUE RESOLUTION per group;
    * the cumulative rides a window PARTITIONED by group (per-key
    * parallel, the Ranks guidance for grouped ranks); the |qs|-row
    * literal frame broadcast-joins and one min-aggregation picks each
    * quantile. No global window, no sort of raw rows.
    */
  def weightedQuantiles(
      df: DataFrame, groupCol: String, valueCol: String, weightCol: String,
      qBps: Seq[Int]): DataFrame = {
    require(qBps.nonEmpty && qBps.distinct.length == qBps.length &&
      qBps.forall(q => q >= 1 && q <= 10000),
      "weightedQuantiles: qBps must be distinct values in [1, 10000]")
    val spark = df.sparkSession
    import spark.implicits._
    val vw = df.select(col(groupCol).as("grp"),
        micro(col(valueCol)).as("vm"),
        micro(col(weightCol)).as("wm"))
      .filter(col("wm") > 0L)
      .groupBy(col("grp"), col("vm")).agg(sum(col("wm")).as("w"))
    val cum = vw
      .withColumn("cw", sum(col("w")).over(
        Window.partitionBy(col("grp")).orderBy(col("vm"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tw", sum(col("w")).over(Window.partitionBy(col("grp"))))
    // min(vm) over {cw·10⁴ ≥ q·tw} is exactly the FIRST crossing row
    // (cw is strictly increasing in vm within a group), so instead of
    // fanning the whole histogram × |qBps| into a grouped min (the old
    // crossJoin + filter shuffled ~half the histogram per quantile), keep
    // only rows whose [cw−w, cw) span crosses a threshold — ≤ |qBps| rows
    // per group survive and the final aggregation is control-plane-sized
    cum.crossJoin(broadcast(qBps.sorted.toDF("q_bps")))
      .filter(expr(
        """CAST(cw AS DECIMAL(38,0)) * 10000
          | >= CAST(q_bps AS DECIMAL(38,0)) * tw""".stripMargin) &&
        expr("""CAST(cw - w AS DECIMAL(38,0)) * 10000
               | < CAST(q_bps AS DECIMAL(38,0)) * tw""".stripMargin))
      .groupBy(col("grp"), col("q_bps"))
      .agg(min(col("vm")).as("wq_value_micro"),
        max(col("tw")).as("total_weight_micro"))
  }

  /** LORENZ CONCENTRATION CURVE per group — cumulative share of total
    * value held by the bottom d/`buckets` of rows (the "bottom 50% of
    * documents hold 4% of the tokens" data-balance report; the curve
    * whose area reads the q219 Gini). One row per (group, decile d):
    * `k_rows = (d·n) DIV buckets` bottom rows and their exact cumulative
    * value share in ppm; d = `buckets` reads exactly 10⁶.
    *
    * Exactness: values quantize to micro; the bottom-k sum is exact —
    * with the cumulative block sums cs/cc over the (group, value)
    * histogram, the block containing rank k contributes
    * `cs − vm·(cc − k)` (tied rows are interchangeable, so NO row-level
    * tiebreak is needed — the share at any cut is well-defined);
    * negative values are dropped (Lorenz needs a non-negative measure —
    * the [[weightedQuantiles]] drop convention); an all-zero group reads
    * the −1 sentinel.
    *
    * Scale shape: the ONE data-scaled pass is the (group, value)
    * histogram aggregation (map-side combined); the cumulative windows
    * ride the value-RESOLUTION-bounded histogram partitioned by group
    * (q219/q230 pattern), the decile frame is a `buckets`-row broadcast
    * literal, and the block pick is a min(struct) argmin — no
    * row_number over rows, nothing global.
    */
  /** Shared first pass of the value-profiling family: the (group,
    * micro-value) count histogram. Compute ONCE (persist) when feeding
    * several consumers — [[lorenzFromHistogram]],
    * [[trimmedMeanBpsFromHistogram]] and [[hillFromHistogram]] all take
    * this frame (the docTokenCounts / dailyStats materialize-once
    * convention), so a profiling dashboard scans the fact table once.
    */
  def valueHistogram(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.select(col(groupCol).as("grp"),
        micro(col(valueCol)).as("vm"))
      .groupBy(col("grp"), col("vm")).agg(count(lit(1)).as("c"))

  /** HERFINDAHL–HIRSCHMAN concentration index per group — how
    * concentrated a weight mass is across members, `hhi_ppm =
    * (10⁶·Σ mᵢ²) DIV S²` over the exact micro member masses (10⁶ = one
    * member holds everything; 10⁶/n = perfectly even across n). The
    * one-number companion to [[lorenzCurve]]/Gini for the questions a
    * mixing pipeline asks per source ("is this source's mass a few
    * giant documents?") and market-share analytics ask per segment.
    * Weights must be non-negative (enforced — a negative mass has no
    * share semantics); an all-zero group reads the −1 sentinel.
    *
    * Scale shape: one (group, member) sum with map-side combine, one
    * group-bounded moment reduce — squares routed through
    * decimal(38,0).
    */
  def hhiConcentration(
      df: DataFrame, groupCol: String, memberCol: String,
      weightCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("grp"), col(memberCol).as("member"),
        micro(col(weightCol)).as("wm"))
      .withColumn("wm", when(col("wm") >= 0L, col("wm"))
        .otherwise(raise_error(lit(
          "hhiConcentration: negative weight — shares are undefined"))))
    val d = (c: String) => col(c).cast("decimal(38,0)")
    base.groupBy(col("grp"), col("member")).agg(sum(col("wm")).as("m"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_members"), sum(col("m")).as("s"),
        sum(d("m") * d("m")).as("q"))
      .select(col("grp"), col("n_members"),
        when(col("s") === 0L, lit(-1L))
          .otherwise(expr(
            """CAST((CAST(1000000 AS DECIMAL(38,0)) * q)
              | DIV (CAST(s AS DECIMAL(38,0)) * s) AS BIGINT)""".stripMargin))
          .as("hhi_ppm"))
  }

  def lorenzCurve(
      df: DataFrame, groupCol: String, valueCol: String,
      buckets: Int = 10): DataFrame =
    lorenzFromHistogram(valueHistogram(df, groupCol, valueCol), buckets)

  /** [[lorenzCurve]] over a prepared [[valueHistogram]] frame. */
  def lorenzFromHistogram(hist: DataFrame, buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 1000,
      "lorenzCurve: buckets in [2, 1000]")
    val spark = hist.sparkSession
    import spark.implicits._
    // dropping negatives AFTER counting by value ≡ dropping rows first
    val h = hist.filter(col("vm") >= 0L)
    val cum = h
      .withColumn("bs", expr("CAST(vm AS DECIMAL(38,0)) * c"))
      .withColumn("cc", sum(col("c")).over(
        Window.partitionBy(col("grp")).orderBy(col("vm"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cs", sum(col("bs")).over(
        Window.partitionBy(col("grp")).orderBy(col("vm"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("grp"))))
      .withColumn("tv", sum(col("bs")).over(Window.partitionBy(col("grp"))))
    cum.crossJoin(broadcast((1 to buckets).toDF("decile")))
      .withColumn("kd", expr(s"(decile * n) DIV $buckets"))
      // the grouped min(struct(cc, …)) below picks the FIRST block with
      // cc ≥ kd; cc is strictly increasing within a group, so keeping
      // only the crossing block (previous cumulative cc−c below the cut;
      // greatest(kd,1) makes kd=0 read the first block) is equivalent —
      // and the aggregation shuffles ≤ buckets rows per group instead of
      // ~half the histogram per decile
      .filter(col("cc") >= col("kd") &&
        col("cc") - col("c") < greatest(col("kd"), lit(1L)))
      .groupBy(col("grp"), col("decile"))
      .agg(min(struct(col("cc"), col("vm"), col("cs"), col("kd"),
        col("n"), col("tv"))).as("pk"))
      .select(col("grp"), col("decile"),
        col("pk.kd").as("k_rows"), col("pk.n").as("n_rows"),
        when(col("pk.tv") === 0, lit(-1L))
          .otherwise(expr(
            """CAST((CAST(1000000 AS DECIMAL(38,0))
              |  * (pk.cs - CAST(pk.vm AS DECIMAL(38,0)) * (pk.cc - pk.kd)))
              |  DIV pk.tv AS BIGINT)""".stripMargin))
          .as("cum_share_ppm"))
  }

  /** HILL TAIL-INDEX estimator per group — "how heavy is this measure's
    * tail?" (α ≈ 1–2: extreme heavy tail, single keys can dominate a
    * shuffle; α > 3: near-light). With x₍₁₎ ≥ … the descending order
    * statistics and threshold t = x₍k+1₎,
    *
    *   α̂ = k / Σ_{i≤k} ln(x₍ᵢ₎ / t)
    *
    * Exactness: each ln-ratio term is rounded to integer micro-nats
    * (the per-term q74/q207 convention — ratio of exact micro integers,
    * one correctly-rounded f64 divide then the accepted 1-ulp ln);
    * rows TIED at the threshold contribute ln(t/t) = 0, so the sum
    * needs only blocks strictly above t; `alpha_micro =
    * (10⁶·k·10⁶) DIV sum`. Non-positive values are dropped (ln);
    * sentinels: −1 when the group has ≤ k positive rows, and when the
    * top k+1 values are all equal (sum 0, α undefined).
    *
    * Scale shape: ONE data-scaled pass (the (group, value) histogram);
    * the descending cumulative, the threshold argmin pick, and the term
    * sum all ride the value-RESOLUTION-bounded histogram partitioned by
    * group (the q219/q236 pattern) — no per-row window, no top-k sort.
    */
  def hillTailIndex(
      df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 100): DataFrame =
    hillFromHistogram(valueHistogram(df, groupCol, valueCol), k)

  /** [[hillTailIndex]] over a prepared [[valueHistogram]] frame. */
  def hillFromHistogram(hist: DataFrame, k: Int = 100): DataFrame = {
    require(k >= 2 && k <= 100000, "hillTailIndex: k in [2, 100000]")
    val h = hist.filter(col("vm") > 0L)
    val cum = h
      .withColumn("cc", sum(col("c")).over(
        Window.partitionBy(col("grp")).orderBy(col("vm").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("grp"))))
    // first-crossing-block filter (see lorenzFromHistogram): the min
    // picks the first block with cc ≥ k+1, and n is group-constant, so
    // restricting to the crossing block changes nothing
    val thr = cum.filter(col("cc") >= lit(k.toLong + 1L) &&
        col("cc") - col("c") < lit(k.toLong + 1L))
      .groupBy(col("grp"))
      .agg(min(struct(col("cc"), col("vm"))).as("pk"),
        max(col("n")).as("n_pos"))
      .select(col("grp").as("tgrp"), col("pk.vm").as("thr"), col("n_pos"))
    val terms = cum.join(thr, col("grp") === col("tgrp") &&
        col("vm") > col("thr"))
      .groupBy(col("grp"))
      .agg(sum(col("c") *
        expr("CAST(round(1e6 * ln(CAST(vm AS DOUBLE) / thr)) AS BIGINT)"))
        .as("sum_ln_micro"))
    val groups = h.groupBy(col("grp"))
      .agg(sum(col("c")).as("n_all"))
    groups
      .join(thr, col("grp") === col("tgrp"), "left").drop("tgrp")
      .join(terms, Seq("grp"), "left")
      .select(col("grp"), col("n_all").as("n_pos"), lit(k).as("k"),
        coalesce(col("thr"), lit(-1L)).as("threshold_micro"),
        coalesce(col("sum_ln_micro"), lit(0L)).as("sum_ln_micro"),
        when(col("thr").isNull ||
            coalesce(col("sum_ln_micro"), lit(0L)) === 0L, lit(-1L))
          .otherwise(expr(
            s"""CAST((CAST(1000000 AS DECIMAL(38,0)) * $k * 1000000)
               |  DIV sum_ln_micro AS BIGINT)""".stripMargin))
          .as("alpha_micro"))
  }

  /** TRIMMED MEAN per group — the mean of the middle rows after cutting
    * the bottom `loBps` and top `10000 − hiBps` basis points by rank
    * (the robust location estimate between median and mean; the
    * outlier-insensitive SLA/quality aggregate). Rank cuts are row
    * COUNTS: k_lo = (loBps·n) DIV 10⁴, k_hi = (hiBps·n) DIV 10⁴, and
    * the kept sum is the bottom-k closed form `cs − vm·(cc − k)`
    * evaluated at both cuts on the (group, value) histogram
    * ([[lorenzCurve]]'s block arithmetic — tied rows are
    * interchangeable, no row-level tiebreak). −1 sentinel when the cuts
    * leave nothing (k_hi = k_lo). Works for any sign of value — nothing
    * is dropped. The parameterized, histogram-bounded upgrade of the
    * fixed-5% rank-window [[trimmedMean]] (q119): same estimate at
    * (500, 9500) up to the rank-vs-count cut convention, but no per-row
    * window and every group emits a row.
    *
    * Scale shape: one histogram aggregation, then value-resolution-
    * bounded cumulative windows partitioned by group and a 2-row
    * broadcast cut frame — the q219/q236 pattern, no row_number over
    * rows.
    */
  def trimmedMeanBps(
      df: DataFrame, groupCol: String, valueCol: String,
      loBps: Int = 500, hiBps: Int = 9500): DataFrame =
    trimmedMeanBpsFromHistogram(
      valueHistogram(df, groupCol, valueCol), loBps, hiBps)

  /** [[trimmedMeanBps]] over a prepared [[valueHistogram]] frame. */
  def trimmedMeanBpsFromHistogram(
      hist: DataFrame, loBps: Int = 500, hiBps: Int = 9500): DataFrame = {
    require(loBps >= 0 && hiBps <= 10000 && loBps < hiBps,
      "trimmedMeanBps: 0 <= loBps < hiBps <= 10000")
    val spark = hist.sparkSession
    import spark.implicits._
    val cum = hist
      .withColumn("bs", expr("CAST(vm AS DECIMAL(38,0)) * c"))
      .withColumn("cc", sum(col("c")).over(
        Window.partitionBy(col("grp")).orderBy(col("vm"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cs", sum(col("bs")).over(
        Window.partitionBy(col("grp")).orderBy(col("vm"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("grp"))))
    // bottom-k sums at both cuts via the shared argmin-block pick
    val picks = cum
      .crossJoin(broadcast(Seq(("lo", loBps), ("hi", hiBps))
        .toDF("cut", "bps")))
      .withColumn("kd", expr("(bps * n) DIV 10000"))
      // first-crossing-block filter (see lorenzFromHistogram): equivalent
      // to the grouped min over all cc ≥ kd blocks, shuffling 2 rows per
      // group instead of the upper half of the histogram per cut
      .filter(col("cc") >= col("kd") &&
        col("cc") - col("c") < greatest(col("kd"), lit(1L)))
      .groupBy(col("grp"), col("cut"))
      .agg(min(struct(col("cc"), col("vm"), col("cs"), col("kd"),
        col("n"))).as("pk"))
      .select(col("grp"), col("cut"), col("pk.kd").as("kd"),
        col("pk.n").as("n"),
        expr("pk.cs - CAST(pk.vm AS DECIMAL(38,0)) * (pk.cc - pk.kd)")
          .as("bsum"))
    picks.groupBy(col("grp"))
      .agg(max(col("n")).as("n_rows"),
        max(when(col("cut") === "lo", col("kd"))).as("k_lo"),
        max(when(col("cut") === "hi", col("kd"))).as("k_hi"),
        max(when(col("cut") === "lo", col("bsum"))).as("blo"),
        max(when(col("cut") === "hi", col("bsum"))).as("bhi"))
      .select(col("grp"), col("n_rows"), col("k_lo"), col("k_hi"),
        when(col("k_hi") === col("k_lo"), lit(-1L))
          .otherwise(expr(
            "CAST((bhi - blo) DIV (k_hi - k_lo) AS BIGINT)"))
          .as("trimmed_mean_micro"))
  }

  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df
      .select(leadingDigit(expr(valueCol)).as("digit"))
      .filter(col("digit").isNotNull)
      .groupBy(col("digit")).agg(count(lit(1)).as("c"))
      .withColumn("__s", lit(1))
    benfordOfCounts(counts, Seq("__s"), Some(Seq(1).toDF("__s")))
      .drop("__s")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Materialize.MaterializeOps

/** Event-stream analytics over a (user, type, timestamp, value) event
  * table: ordered funnel conversion and exact-arithmetic outlier
  * flagging. Both are single-shuffle keyed plans — nothing materializes a
  * per-user event list on the driver or in one task beyond that user's
  * own rows.
  */
object EventAnalytics {

  /** Ordered funnel: for each user, the earliest chain of `steps` events
    * in sequence — step i must occur at or after the user's step i-1
    * time, and every step must land within `windowMicros` of the user's
    * FIRST step-0 event (the standard product-analytics definition:
    * "viewed, then clicked, then purchased, all within an hour").
    *
    * Returns one row per user that reached step 0:
    * `(user, t0_us..t{k-1}_us, n_steps, converted, dwell_us)` where
    * `t{i}_us` is the step-i completion time (epoch micros, null once the
    * chain breaks), `n_steps` counts completed steps, and `dwell_us` is
    * total time-to-convert (null unless every step completed).
    *
    * Plan shape: the step times are chained conditional `min`s over the
    * SAME unordered per-user window partition — one hash shuffle on user,
    * k window passes with no sort (unbounded frame, no ORDER BY), then a
    * per-user aggregate that Catalyst runs on the already-hash-partitioned
    * output without a second exchange. Skew = a user's own event count,
    * the natural lower bound for per-user semantics.
    */
  def funnel(
      events: DataFrame, userCol: String, typeCol: String, tsMicrosCol: String,
      steps: Seq[String], windowMicros: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(windowMicros > 0, "windowMicros must be positive")
    val w = Window.partitionBy(col("user"))
    var cur = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).as("user"), col(typeCol).as("et"),
        col(tsMicrosCol).as("tsu"))
      .withColumn("t0", min(when(col("et") === steps.head, col("tsu"))).over(w))
    for (i <- 1 until steps.size)
      cur = cur.withColumn(s"t$i",
        min(when(col("et") === steps(i) &&
          col("tsu") >= col(s"t${i - 1}") &&
          col("tsu") <= col("t0") + windowMicros, col("tsu"))).over(w))
    val tAliases = steps.indices.map(i => max(col(s"t$i")).as(s"t${i}_us"))
    val g = cur
      .filter(col("t0").isNotNull) // users who never reached step 0 have no funnel row
      .groupBy(col("user"))
      .agg(tAliases.head, tAliases.tail: _*)
    val last = s"t${steps.size - 1}_us"
    // n_steps: the chain guarantees monotone nulls (t_i null => t_{i+1}
    // null), so folding ASCENDING puts the deepest step's test outermost:
    // when(t_k-1 set, k).otherwise(... when(t_0 set, 1).otherwise(0))
    val nSteps = steps.indices.foldLeft(lit(0L)) { (acc, i) =>
      when(col(s"t${i}_us").isNotNull, lit((i + 1).toLong)).otherwise(acc)
    }
    g.withColumn("n_steps", nSteps)
      .withColumn("converted", col(last).isNotNull.cast("bigint"))
      .withColumn("dwell_us",
        when(col(last).isNotNull, col(last) - col("t0_us")))
  }

  /** Per-event rolling features over a trailing time range: for every
    * event, the count and micro-quantized sum of the SAME user's events in
    * the preceding `lookbackMicros` (exclusive of the event itself) — the
    * standard "activity in the last hour" feature a fraud/abuse model
    * consumes. RANGE frames bound by event time, not row count, so burst
    * density is measured correctly.
    *
    * Plan: one shuffle on user + one sort per partition (the range frame
    * needs event-time order); Spark evaluates the sliding frame with a
    * moving two-pointer over the sorted run, O(partition) total. Sums are
    * integer micros — order-independent and engine-exact.
    *
    * `tsMicrosCol` need not be unique per user: equal-timestamp peers
    * EXCLUDE each other (the frame's upper bound is tsu - 1, and RANGE
    * frames are value-based, so every same-instant event gets the
    * identical history), the same standard semantics in both engines —
    * output is deterministic either way.
    */
  def rollingCounts(
      events: DataFrame, userCol: String, tsMicrosCol: String, valueCol: String,
      idCol: String, lookbackMicros: Long): DataFrame = {
    require(lookbackMicros > 0, "lookbackMicros must be positive")
    val w = Window.partitionBy(col("user")).orderBy(col("tsu"))
      .rangeBetween(-lookbackMicros, -1)
    events
      .select(col(idCol).as("id"), col(userCol).as("user"),
        col(tsMicrosCol).as("tsu"),
        round(col(valueCol) * lit(1e6)).cast("bigint").as("vm"))
      .withColumn("prev_n", count(lit(1)).over(w))
      .withColumn("prev_sum_micro", coalesce(sum(col("vm")).over(w), lit(0L)))
      .select(col("id"), col("user"), col("tsu"), col("vm").as("value_micro"),
        col("prev_n"), col("prev_sum_micro"))
  }

  /** Gap-based sessionization: assign each event a per-user session index
    * (1-based, in time order) that increments whenever the gap to the
    * user's previous event exceeds `gapMicros` — the window-function
    * mirror of the streaming `session_window` aggregate (q49), emitting
    * per-EVENT session ids instead of per-session rollups so downstream
    * joins can tag raw events.
    *
    * Classic gaps-and-islands: lag to detect session starts, running sum
    * to number them. One shuffle on user, one per-partition sort shared
    * by both window passes.
    */
  def sessionize(
      events: DataFrame, userCol: String, tsMicrosCol: String, idCol: String,
      gapMicros: Long): DataFrame = {
    require(gapMicros > 0, "gapMicros must be positive")
    val w = Window.partitionBy(col("user")).orderBy(col("tsu"), col("id"))
    events
      .select(col(idCol).as("id"), col(userCol).as("user"),
        col(tsMicrosCol).as("tsu"))
      .withColumn("new_session",
        when(col("tsu") - lag(col("tsu"), 1).over(w) > gapMicros, 1L)
          .otherwise(when(lag(col("tsu"), 1).over(w).isNull, 1L).otherwise(0L)))
      .withColumn("session_idx",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("new_session")
  }

  /** Per-group z-score outlier flags with EXACT integer arithmetic. The
    * usual `abs(x - mean) > z * stddev` is order-dependent in f64 (both
    * mean and stddev are float sums); quantizing values to integer micro
    * units and clearing denominators makes the test a pure integer
    * comparison, bit-identical at any parallelism and in any engine:
    *
    *   |x - mean| > z * stddev_pop
    *   <=>  (n*x - S)^2 > z^2 * (n*SS - S^2)        [multiplied by n^2]
    *
    * with S = sum(x_micro), SS = sum(x_micro^2), both exact integers
    * (SS and the squares in 38-digit decimals).
    *
    * Numeric window: with |value| <= V and group size <= n, the largest
    * intermediate is (n * V * 1e6)^2, which must stay below 10^38 —
    * i.e. n * V <= 10^13 (a billion rows of |v| <= 10^4 per group). For
    * larger groups, pre-center on an approximate per-group mean first;
    * the operator `require`s nothing at build time (the bound depends on
    * data), but Spark's ANSI decimal overflow turns a breach into a hard
    * error rather than a silent wrap.
    *
    * Plan: one partial-aggregated groupBy on the group key (tiny result:
    * one row per group), broadcast back onto the events — map-only flag
    * evaluation, no second shuffle.
    */
  def zscoreOutliers(
      events: DataFrame, groupCol: String, valueCol: String, idCol: String,
      z: Int = 3): DataFrame = {
    require(z >= 1, "z must be a positive integer")
    val micro = round(col(valueCol) * lit(1e6)).cast("bigint")
    val microDec = micro.cast("decimal(38,0)")
    val stats = events
      .select(col(groupCol).as("grp"), micro.as("xm"), (microDec * microDec).as("xm2"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("xm")).as("s"), sum(col("xm2")).as("ss"))
    val nD = col("n").cast("decimal(38,0)")
    val sD = col("s").cast("decimal(38,0)")
    val xD = col("xm").cast("decimal(38,0)")
    val dev = nD * xD - sD
    val rhs = lit(z.toLong * z).cast("decimal(38,0)") * (nD * col("ss") - sD * sD)
    events
      .select(col(idCol).as("id"), col(groupCol).as("grp"), micro.as("xm"))
      .join(broadcast(stats), Seq("grp"))
      .select(col("id"), col("grp"), col("xm").as("value_micro"),
        (dev * dev > rhs).cast("bigint").as("is_outlier"))
  }

  /** Cohort retention: users are cohorted by their FIRST active day, and
    * each later active day counts toward (cohort_day, offset_days). The
    * standard product-retention matrix: "of the users who first appeared
    * on day D, how many came back k days later?"
    *
    * Days are floor(epoch_micros / 86_400_000_000) — pure integer, no
    * timezone/calendar arithmetic, so any engine reproduces the matrix
    * bit-for-bit. `retention_bps` = 10000 * n_users div cohort size
    * (integer basis points; offset 0 is 10000 by construction).
    *
    * Plan: dedup to (user, day) first — event volume collapses to
    * user-days BEFORE any window work, so a user with a million events on
    * one day costs one row past the first aggregation. Then one window
    * min per user (reuses the dedup's hash partitioning on user via the
    * (user, day)-keyed exchange), and a final small aggregation on
    * (cohort, offset) — the output is bounded by active-days², not data
    * volume. The cohort size rides a cohort-partitioned window over the
    * aggregated matrix (a self-join here re-ran the whole upstream for
    * its broadcast side — the round-11 pipeline_events job-count
    * finding).
    */
  def retentionCohorts(
      events: DataFrame, userCol: String, tsMicrosCol: String): DataFrame = {
    val dayUs = 86400000000L
    val active = events
      .select(col(userCol).as("user"), col(tsMicrosCol).cast("bigint").as("tsu"))
      // DIV, not "/": long / long is DOUBLE division in Spark, and a
      // near-integer quotient can round UP across the day boundary
      .select(col("user"), expr(s"tsu DIV ${dayUs}L").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user"))
    val matrix = active
      .withColumn("cohort_day", min(col("day")).over(w))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
      .agg(count(lit(1)).as("n_users"))
    // every cohort has its offset-0 row by construction (the cohort day
    // itself), so the size is a sum over the cohort's matrix partition
    matrix
      .withColumn("n_cohort",
        sum(when(col("offset_days") === 0, col("n_users")).otherwise(0L))
          .over(Window.partitionBy(col("cohort_day"))))
      .select(col("cohort_day"), col("offset_days"), col("n_users"), col("n_cohort"),
        expr("(10000 * n_users) DIV n_cohort").as("retention_bps"))
  }

  /** Rolling distinct active users — the DAU/WAU dashboard primitive: for
    * every day in the observed span, the count of DISTINCT users active
    * in the trailing `windowDays` (inclusive of the day itself), plus
    * that day's own distinct actives. A sliding COUNT DISTINCT cannot
    * ride a window frame (distinct does not decompose); the scalable
    * form is contribution fan-out: each (user, active-day) pair
    * contributes the user to `windowDays` target days, then one distinct
    * count per target day — fan-out bounded by windowDays, never by
    * window CONTENT, and the heavy dedup to (user, day) happens first,
    * so event volume collapses before the fan-out.
    *
    * Days past the last observed activity are cut (a dashboard's "today"
    * cap), and `wau >= dau >= 0` with dau = 0 for gap days the trailing
    * window still covers.
    */
  def rollingActives(
      events: DataFrame, userCol: String, tsMicrosCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1 && windowDays <= 370, "windowDays in [1, 370]")
    val dayUs = 86400000000L
    val active = events
      .select(col(userCol).as("user"), col(tsMicrosCol).cast("bigint").as("tsu"))
      .select(col("user"), expr(s"tsu DIV ${dayUs}L").as("day"))
      .distinct()
    val maxDay = active.agg(max(col("day")).as("max_day"))
    val contrib = active
      .select(col("user"),
        explode(sequence(col("day"), col("day") + (windowDays - 1))).as("day"))
      .crossJoin(broadcast(maxDay))
      .filter(col("day") <= col("max_day"))
    val wau = contrib.groupBy(col("day"))
      .agg(count_distinct(col("user")).as(s"active_${windowDays}d"))
    val dau = active.groupBy(col("day")).agg(count_distinct(col("user")).as("dau"))
    wau.join(dau, Seq("day"), "left")
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
        col(s"active_${windowDays}d"))
  }

  /** Top user-journey paths: per session (any session key — gap
    * sessions, visits, days), the ordered sequence of the first
    * `maxSteps` event types joined with `>`, counted across sessions —
    * the "what do users actually do" report product analytics opens
    * with. Truncation to `maxSteps` keeps the path vocabulary bounded
    * (untruncated paths are nearly unique, which is a list of sessions,
    * not a report).
    *
    * One exchange on the session key (the ordered collect), one on the
    * path string (the count) — path cardinality is bounded by
    * |event types|^maxSteps in the worst case and tiny in practice.
    * Ordering inside a session is the deterministic (ts, id) sort; the
    * collect is per-session-bounded, never a global collect.
    */
  def sessionPaths(
      events: DataFrame, sessionCol: String, typeCol: String,
      tsMicrosCol: String, idCol: String, maxSteps: Int = 5): DataFrame = {
    require(maxSteps >= 1 && maxSteps <= 32, "maxSteps in [1, 32]")
    events
      .select(col(sessionCol).as("sess"), col(typeCol).as("et"),
        col(tsMicrosCol).cast("bigint").as("tsu"), col(idCol).cast("bigint").as("id"))
      .groupBy(col("sess"))
      .agg(array_join(
        slice(transform(
          array_sort(collect_list(struct(col("tsu"), col("id"), col("et")))),
          s => s.getField("et")), 1, maxSteps), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
  }

  /** Multi-touch conversion attribution: each `convType` event's value is
    * credited to the `touchTypes` events of the SAME user in the
    * `windowMicros` before it (inclusive of the conversion instant) under
    * the four standard models at once — first-touch, last-touch, linear,
    * and position-based (U-shaped 40/20/40: 40% to the first touch, 40%
    * to the last, 20% split over the middles; 50/50 when there are only
    * two touches, everything to a lone touch). A conversion with no
    * preceding touch credits the synthetic `direct` channel in every
    * model.
    *
    * All credit is integer micros: linear splits value DIV n per touch
    * with the remainder to the FIRST touch (ordered by (ts, id)); the
    * U-shape computes the 40% shares by integer basis points and gives
    * each division's remainder to the earliest eligible touch — so
    * per-channel sums are exact and order-independent, and all four
    * models conserve total conversion value to the micro.
    *
    * Plan: one shuffle join on user (conversions ⋈ touches, the range
    * predicate applied post-join), then per-conversion window ranks on
    * the already-user-partitioned rows, then a tiny per-channel
    * aggregation. Skew = one user's touches × their conversions — the
    * same per-user bound as every keyed operator here; `windowMicros`
    * caps the lookback so an eternal user doesn't pair all history.
    */
  def attributeConversions(
      events: DataFrame, userCol: String, typeCol: String, tsMicrosCol: String,
      idCol: String, valueCol: String, touchTypes: Seq[String], convType: String,
      windowMicros: Long): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convType), "convType cannot also be a touch type")
    require(windowMicros > 0, "windowMicros must be positive")
    val base = events.select(col(userCol).as("user"), col(typeCol).as("et"),
      col(tsMicrosCol).cast("bigint").as("tsu"), col(idCol).cast("bigint").as("id"),
      round(col(valueCol) * lit(1e6)).cast("bigint").as("vm"))
    val conv = base.filter(col("et") === convType)
      .select(col("user"), col("tsu").as("ctsu"), col("id").as("cid"), col("vm"))
    val touch = base.filter(col("et").isin(touchTypes: _*))
      .select(col("user"), col("et").as("channel"), col("tsu").as("ttsu"),
        col("id").as("tid"))
    val paired = conv.join(touch,
      conv("user") === touch("user") &&
        col("ttsu") <= col("ctsu") && col("ttsu") >= col("ctsu") - windowMicros,
      "left").drop(touch("user"))
    // partition by (user, cid), not cid alone: cid is unique per
    // conversion so the semantics are identical, but the user prefix lets
    // Catalyst satisfy the window's clustering with the join's existing
    // hash-on-user exchange — the per-conversion ranking then costs a
    // sort, not a second full shuffle
    val wOrd = Window.partitionBy(col("user"), col("cid")).orderBy(col("ttsu"), col("tid"))
    val wAll = Window.partitionBy(col("user"), col("cid"))
    val credited = paired
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(col("tid")).over(wAll))
      .withColumn("ch", coalesce(col("channel"), lit("direct")))
      .withColumn("first_c", when(col("rn") === 1, col("vm")).otherwise(lit(0L)))
      .withColumn("last_c", when(col("rn") === col("n") || col("n") === 0, col("vm"))
        .otherwise(lit(0L)))
      .withColumn("linear_c",
        when(col("n") === 0, col("vm")).otherwise(
          expr("vm DIV n") + when(col("rn") === 1, expr("vm % n")).otherwise(lit(0L))))
      // U-shape: ends get (vm*4000) DIV 10000 each; the exact middle
      // budget vm - 2*ends splits DIV (n-2), remainder to the first middle
      .withColumn("pos_c",
        when(col("n") <= 1, col("vm")) // direct (n=0) or a lone touch
          .when(col("n") === 2,
            expr("vm DIV 2") + when(col("rn") === 1, expr("vm % 2")).otherwise(lit(0L)))
          .otherwise(
            when(col("rn") === 1 || col("rn") === col("n"), expr("(vm * 4000) DIV 10000"))
              .otherwise(
                expr("(vm - 2 * ((vm * 4000) DIV 10000)) DIV (n - 2)") +
                  when(col("rn") === 2,
                    expr("(vm - 2 * ((vm * 4000) DIV 10000)) % (n - 2)"))
                    .otherwise(lit(0L)))))
    credited.groupBy(col("ch").as("channel"))
      .agg(count(col("tid")).as("touches"),
        count_distinct(col("cid")).as("conversions"),
        sum(col("first_c")).as("first_micro"),
        sum(col("last_c")).as("last_micro"),
        sum(col("linear_c")).as("linear_micro"),
        sum(col("pos_c")).as("position_micro"))
  }

  /** Robust (median/MAD) outlier flags with EXACT integer arithmetic —
    * the heavy-tail-safe alternative to [[zscoreOutliers]]: a single
    * extreme value shifts a mean/stddev gate but not a median/MAD gate.
    *
    * Both medians use the explicit rank definition (smallest value whose
    * row_number ≥ ceil(n/2), the same convention as q81) so every engine
    * picks the identical corpus value — no interpolation. The flag is
    *   10000 * |x - med| > k * 14826 * MAD
    * i.e. |x - med| > k·1.4826·MAD with the normal-consistency constant
    * as an exact rational — all BIGINT, order-independent, portable.
    * MAD = 0 (over half the group identical) flags any deviation, the
    * standard degenerate-case behavior.
    *
    * Plan: one shuffle on grp; the two rank passes are window functions
    * over the SAME partition (Catalyst reuses the exchange and re-sorts
    * in place), so unlike the textbook two-aggregation formulation there
    * is no second shuffle and no join.
    */
  def madOutliers(
      events: DataFrame, groupCol: String, valueCol: String, idCol: String,
      k: Int = 3): DataFrame =
    madOutliersBy(
      events.select(col(idCol).as("__mo_id"), col(groupCol).as("grp"), col(valueCol).as("__mo_v")),
      Seq("grp"), "__mo_v", "__mo_id", k)

  /** Multi-key generalization of [[madOutliers]]: the group is the tuple
    * of `groupCols` (e.g. (event_type, hour-of-day) for a seasonal
    * baseline), passed through to the output under their own names.
    * Same single-shuffle plan — both rank passes re-sort the one
    * grp-keyed exchange in place.
    */
  def madOutliersBy(
      events: DataFrame, groupCols: Seq[String], valueCol: String, idCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, "k must be a positive integer")
    require(groupCols.nonEmpty, "need at least one group column")
    val gs = groupCols.map(col)
    val wg = Window.partitionBy(gs: _*)
    val wv = wg.orderBy(col("xm"), col("id"))
    val wa = wg.orderBy(col("adm"), col("id"))
    events
      .select((Seq(col(idCol).cast("bigint").as("id"),
        round(col(valueCol) * lit(1e6)).cast("bigint").as("xm")) ++ gs): _*)
      .withColumn("n", count(lit(1)).over(wg))
      .withColumn("rn", row_number().over(wv))
      .withColumn("med", min(when(lit(2) * col("rn") >= col("n"), col("xm"))).over(wg))
      .withColumn("adm", abs(col("xm") - col("med")))
      .withColumn("rn2", row_number().over(wa))
      .withColumn("mad", min(when(lit(2) * col("rn2") >= col("n"), col("adm"))).over(wg))
      .select((Seq(col("id")) ++ gs ++ Seq(col("xm").as("value_micro"),
        col("med").as("med_micro"), col("mad").as("mad_micro"),
        (lit(10000L) * col("adm") > lit(k.toLong * 14826L) * col("mad"))
          .cast("bigint").as("is_outlier"))): _*)
  }

  /** Per-user next-event transition matrix (first-order Markov chain over
    * event types): each user's events ordered by (ts, id) yield
    * (from → to) transitions; output per ordered pair the transition
    * count and the row-stochastic probability in integer ppm
    * (1e6 · n DIV n_from — floor, so rows sum to ≤ 1e6 exactly like the
    * PageRank mass convention). The standard user-journey / session-flow
    * analysis.
    *
    * Plan: one shuffle on user + one per-partition sort for the lag, then
    * a (from, to) aggregation whose cardinality is |types|² — tiny — so
    * the from-totals join is a broadcast. Skew bound = one user's events.
    */
  def transitionMatrix(
      events: DataFrame, userCol: String, typeCol: String, tsMicrosCol: String,
      idCol: String): DataFrame = {
    val wu = Window.partitionBy(col("user")).orderBy(col("tsu"), col("id"))
    val pairs = events
      .select(col(userCol).as("user"), col(typeCol).as("to_type"),
        col(tsMicrosCol).cast("bigint").as("tsu"), col(idCol).cast("bigint").as("id"))
      .withColumn("from_type", lag(col("to_type"), 1).over(wu))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    // row-normalize with a from_type-partitioned window over the tiny
    // aggregated matrix — the totals self-join re-ran the lag window +
    // aggregation a second time for its broadcast side (the round-11
    // pipeline_events job-count finding)
    pairs
      .withColumn("n_from",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        expr("(1000000 * n) DIV n_from").as("ppm"))
  }

  /** KAPLAN–MEIER survival curve for time-to-event with right censoring
    * — the statistically honest "how long until users convert" curve:
    * the naive mean-time-to-purchase silently drops everyone who hasn't
    * converted YET (survivorship bias toward fast converters); KM keeps
    * them in the risk set until their observation ends. Entry = the
    * user's first `entryType` event; event = their first `eventType` at
    * or after entry; users without the event are CENSORED at the global
    * observation end. Durations bucket by `bucketMicros` (exact integer
    * DIV).
    *
    * Emits one row per distinct EVENT duration t:
    * `(t, n_risk, n_events, ln_surv_micro, surv_ppm)` where
    *
    *   ln S(t) = Σ_{t'≤t} ln((n_risk − d)/n_risk)     (micro-nat terms,
    *             rounded per step then integer-summed — the q74/q82 ln
    *             convention), surv_ppm = round(10⁶·exp(lnS/10⁶))
    *
    * — the one exp carries the same 1-ulp libm caveat as the ln terms,
    * corpus-validated per SF.
    *
    * Scale shape: two per-user min-aggregations (entry, first event) and
    * a broadcast 1-row censor time; the KM table is a window over
    * DISTINCT durations (bounded by the time resolution, not user
    * count).
    */
  /** Loud bound on the distinct duration-bucket count the KM / log-rank
    * tables may carry. COST MODEL (why an unpartitioned window is OK
    * here, and exactly how far): the `perT` frame has at most
    * `(tmax − tmin) DIV bucketMicros + 1` rows — the calendar span of
    * the corpus in buckets, NOT the user count — and its global-ORDER-BY
    * windows sort that one frame on a single partition. 10⁶ rows of
    * (t, counts) is a few tens of MB — trivially sortable — while any
    * span beyond that means the caller picked a bucket width that turns
    * the survival table into row-per-microsecond noise. The guard rides
    * the broadcast censor row (zero extra jobs) and fails LOUDLY with
    * the measured span instead of silently single-sorting an unbounded
    * frame (the largestRemainder contract style).
    */
  private[operators] val MaxDurationBuckets = 1000000L

  /** `(coalesce(t1, tmax) − t0) DIV bucketMicros`, guarded: raises with
    * the measured span when the corpus's bucket span exceeds
    * [[MaxDurationBuckets]]. Expects `t0, t1, tmax, tmin` in scope.
    */
  private def guardedBucket(op: String, bucketMicros: Long): Column = {
    val span = expr(s"(tmax - tmin) DIV $bucketMicros")
    when(span <= lit(MaxDurationBuckets),
      expr(s"(coalesce(t1, tmax) - t0) DIV $bucketMicros"))
      .otherwise(raise_error(concat(
        lit(s"$op: duration span "), span.cast("string"),
        lit(s" buckets exceeds the $MaxDurationBuckets bound for the " +
          "single-partition survival-table sort — coarsen bucketMicros"))))
  }

  def kaplanMeier(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      entryType: String, eventType: String, bucketMicros: Long): DataFrame = {
    require(bucketMicros >= 1, "kaplanMeier: bucketMicros >= 1")
    val base = events.select(col(userCol).cast("bigint").as("u"),
      unix_micros(col(tsCol)).as("tsu"), col(typeCol).as("et"))
    val entry = base.filter(col("et") === entryType)
      .groupBy(col("u")).agg(min(col("tsu")).as("t0"))
    val evt = base.filter(col("et") === eventType)
      .join(entry, Seq("u"))
      .filter(col("tsu") >= col("t0"))
      .groupBy(col("u")).agg(min(col("tsu")).as("t1"))
    val censor = base.agg(max(col("tsu")).as("tmax"), min(col("tsu")).as("tmin"))
    val durations = entry.join(evt, Seq("u"), "left")
      .crossJoin(broadcast(censor))
      .select(col("u"),
        guardedBucket("kaplanMeier", bucketMicros).as("t"),
        col("t1").isNotNull.cast("bigint").as("observed"))
    val perT = durations.groupBy(col("t"))
      .agg(count(lit(1)).as("cnt"), sum(col("observed")).as("d"))
    val wAsc = Window.orderBy(col("t"))
    val wPrev = wAsc.rowsBetween(Window.unboundedPreceding, -1)
    val wCum = wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perT
      .withColumn("total", sum(col("cnt")).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("n_risk", col("total") - coalesce(sum(col("cnt")).over(wPrev), lit(0L)))
      .withColumn("step_micro",
        when(col("d") === 0, lit(0L))
          // every at-risk user converts at this t: S drops to 0 and
          // ln(0) = -inf — pin the step at -46e6 (e^-46 < 1e-20 ⇒
          // surv_ppm rounds to 0), a documented finite floor
          .when(col("n_risk") === col("d"), lit(-46000000L))
          .otherwise(round(log((col("n_risk") - col("d")).cast("double")
            / col("n_risk")) * lit(1e6)).cast("bigint")))
      .withColumn("ln_surv_micro", sum(col("step_micro")).over(wCum))
      .filter(col("d") > 0)
      .select(col("t"), col("n_risk"), col("d").as("n_events"),
        col("ln_surv_micro"),
        round(exp(col("ln_surv_micro").cast("double") / lit(1e6)) * lit(1e6))
          .cast("bigint").as("surv_ppm"))
  }

  /** KAPLAN–MEIER WITH GREENWOOD CONFIDENCE BANDS — the reporting form
    * of [[kaplanMeier]]: the same survival table plus the log-scale 95%
    * band every curve plot carries. Greenwood's variance of ln S is the
    * EXACT integer cumulative sum
    *
    *   var_ln_pico = Σ_{t'≤t} (10¹²·d) DIV (n_risk·(n_risk − d))
    *
    * (pico resolution — the per-step terms are ≪ 1 micro), and the band
    * is exp(ln S ± 1.96·√var) with the [[kaplanMeier]] float discipline:
    * each libm step rounds to an integer column before composing, so
    * both engines evaluate the identical chain (√ correctly rounded, exp
    * the accepted 1-ulp class). The upper bound caps at 10⁶ (S ≤ 1). A
    * full-conversion step (n_risk = d — the −46·10⁶ ln-floor) makes the
    * variance undefined from that time on: those rows read
    * `var_ln_pico = −1` with `lo_ppm = hi_ppm = 0` (S has hit 0).
    *
    * Scale shape: identical to [[kaplanMeier]] — time-resolution-bounded
    * duration frame, the same [[MaxDurationBuckets]] loud guard.
    */
  def kaplanMeierCi(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      entryType: String, eventType: String, bucketMicros: Long): DataFrame = {
    require(bucketMicros >= 1, "kaplanMeierCi: bucketMicros >= 1")
    val base = events.select(col(userCol).cast("bigint").as("u"),
      unix_micros(col(tsCol)).as("tsu"), col(typeCol).as("et"))
    val entry = base.filter(col("et") === entryType)
      .groupBy(col("u")).agg(min(col("tsu")).as("t0"))
    val evt = base.filter(col("et") === eventType)
      .join(entry, Seq("u"))
      .filter(col("tsu") >= col("t0"))
      .groupBy(col("u")).agg(min(col("tsu")).as("t1"))
    val censor = base.agg(max(col("tsu")).as("tmax"), min(col("tsu")).as("tmin"))
    val durations = entry.join(evt, Seq("u"), "left")
      .crossJoin(broadcast(censor))
      .select(col("u"),
        guardedBucket("kaplanMeierCi", bucketMicros).as("t"),
        col("t1").isNotNull.cast("bigint").as("observed"))
    val perT = durations.groupBy(col("t"))
      .agg(count(lit(1)).as("cnt"), sum(col("observed")).as("d"))
    val wAsc = Window.orderBy(col("t"))
    val wPrev = wAsc.rowsBetween(Window.unboundedPreceding, -1)
    val wCum = wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perT
      .withColumn("total", sum(col("cnt")).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("n_risk", col("total") - coalesce(sum(col("cnt")).over(wPrev), lit(0L)))
      .withColumn("step_micro",
        when(col("d") === 0, lit(0L))
          .when(col("n_risk") === col("d"), lit(-46000000L))
          .otherwise(round(log((col("n_risk") - col("d")).cast("double")
            / col("n_risk")) * lit(1e6)).cast("bigint")))
      .withColumn("ln_surv_micro", sum(col("step_micro")).over(wCum))
      .withColumn("g_step",
        when(col("d") === 0 || col("n_risk") === col("d"), lit(0L))
          .otherwise(expr(
            """CAST((CAST(1000000000000 AS DECIMAL(38,0)) * d)
              | DIV (CAST(n_risk AS DECIMAL(38,0)) * (n_risk - d))
              | AS BIGINT)""".stripMargin)))
      .withColumn("g_cum", sum(col("g_step")).over(wCum))
      .withColumn("floored",
        max((col("n_risk") === col("d") && col("d") > 0).cast("bigint"))
          .over(wCum))
      .withColumn("margin_micro",
        round(lit(1.96) * sqrt(col("g_cum").cast("double"))).cast("bigint"))
      .filter(col("d") > 0)
      .select(col("t"), col("n_risk"), col("d").as("n_events"),
        round(exp(col("ln_surv_micro").cast("double") / lit(1e6)) * lit(1e6))
          .cast("bigint").as("surv_ppm"),
        when(col("floored") === 1L, lit(-1L)).otherwise(col("g_cum"))
          .as("var_ln_pico"),
        when(col("floored") === 1L, lit(0L))
          .otherwise(round(exp((col("ln_surv_micro") - col("margin_micro"))
            .cast("double") / lit(1e6)) * lit(1e6)).cast("bigint"))
          .as("lo_ppm"),
        when(col("floored") === 1L, lit(0L))
          .otherwise(least(lit(1000000L),
            round(exp((col("ln_surv_micro") + col("margin_micro"))
              .cast("double") / lit(1e6)) * lit(1e6)).cast("bigint")))
          .as("hi_ppm"))
  }

  /** KM SURVIVAL QUANTILES — the "how long until a quarter / half /
    * three-quarters have converted" summary read straight off the
    * [[kaplanMeier]] table: t_qP = the first bucket where S drops to
    * ≤ 1 − P/100 (the standard survival-quantile convention — exact
    * integer comparisons on the already-pinned surv_ppm), −1 when the
    * curve never reaches the level inside the observation window (the
    * honest answer censoring-naive percentiles get wrong). One row.
    *
    * Scale shape: the KM plan plus one aggregate over the
    * time-resolution-bounded duration frame.
    */
  def kmQuantiles(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      entryType: String, eventType: String, bucketMicros: Long): DataFrame =
    kaplanMeier(events, userCol, tsCol, typeCol, entryType, eventType,
      bucketMicros)
      .agg(
        coalesce(min(when(col("surv_ppm") <= 750000L, col("t"))), lit(-1L))
          .as("t_q25"),
        coalesce(min(when(col("surv_ppm") <= 500000L, col("t"))), lit(-1L))
          .as("t_median"),
        coalesce(min(when(col("surv_ppm") <= 250000L, col("t"))), lit(-1L))
          .as("t_q75"),
        count(lit(1)).as("n_event_times"))

  /** COMPETING-RISKS CUMULATIVE INCIDENCE (Aalen–Johansen, discrete
    * buckets) — when a user's first qualifying event can be one of
    * SEVERAL mutually-exclusive outcomes (purchase vs churn-error vs …),
    * per-outcome "1 − KM" curves are WRONG (they treat the other
    * outcomes as censoring and overstate every incidence); the CIF
    * splits each bucket's hazard by outcome against the overall
    * survival:
    *
    *   CIF_k(t) = Σ_{t'≤t} S(t'−)·d_k(t')/n_risk(t')
    *
    * Exactness: the overall S rides [[kaplanMeier]]'s ln-chain (the same
    * float discipline — each libm step rounds to an integer column
    * before composing); each CIF step is then the EXACT integer
    * `(surv_prev_ppm·d_k) DIV n_risk` and the curve an integer cumsum —
    * CIFs never exceed 10⁶ and Σ_k CIF_k + S ≈ 10⁶ up to the documented
    * per-step truncation. A user's outcome is the type of their FIRST
    * qualifying event (same-microsecond ties break by type name — the
    * struct-min convention). One row per bucket with any event:
    * `(t, n_risk, d_total, d_<k>…, cif_<k>_ppm…)`.
    *
    * Scale shape: the KM plan (two per-user min-aggregations, broadcast
    * censor row, [[MaxDurationBuckets]]-guarded time-resolution-bounded
    * duration frame); outcome count is a require-bounded literal pivot.
    */
  def competingRisks(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      entryType: String, outcomeTypes: Seq[String],
      bucketMicros: Long): DataFrame = {
    require(bucketMicros >= 1, "competingRisks: bucketMicros >= 1")
    require(outcomeTypes.nonEmpty && outcomeTypes.size <= 8,
      "competingRisks: 1..8 outcome types")
    require(outcomeTypes.distinct.size == outcomeTypes.size,
      "competingRisks: outcome types must be distinct")
    val base = events.select(col(userCol).cast("bigint").as("u"),
      unix_micros(col(tsCol)).as("tsu"), col(typeCol).as("et"))
    val entry = base.filter(col("et") === entryType)
      .groupBy(col("u")).agg(min(col("tsu")).as("t0"))
    val evt = base.filter(col("et").isin(outcomeTypes: _*))
      .join(entry, Seq("u"))
      .filter(col("tsu") >= col("t0"))
      .groupBy(col("u"))
      .agg(min(struct(col("tsu"), col("et"))).as("fe"))
      .select(col("u"), col("fe.tsu").as("t1"), col("fe.et").as("outcome"))
    val censor = base.agg(max(col("tsu")).as("tmax"), min(col("tsu")).as("tmin"))
    val durations = entry.join(evt, Seq("u"), "left")
      .crossJoin(broadcast(censor))
      .select(col("u"),
        guardedBucket("competingRisks", bucketMicros).as("t"),
        col("outcome"))
    val aggs = Seq(count(lit(1)).as("cnt"),
      sum(col("outcome").isNotNull.cast("bigint")).as("d_total")) ++
      outcomeTypes.map(k =>
        sum(when(col("outcome") === k, 1L).otherwise(0L)).as(s"d_$k"))
    val perT2 = durations.groupBy(col("t")).agg(aggs.head, aggs.tail: _*)
    val wAsc = Window.orderBy(col("t"))
    val wPrev = wAsc.rowsBetween(Window.unboundedPreceding, -1)
    val wCum = wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stepped = perT2
      .withColumn("total", sum(col("cnt")).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("n_risk",
        col("total") - coalesce(sum(col("cnt")).over(wPrev), lit(0L)))
      .withColumn("step_micro",
        when(col("d_total") === 0, lit(0L))
          .when(col("n_risk") === col("d_total"), lit(-46000000L))
          .otherwise(round(log((col("n_risk") - col("d_total")).cast("double")
            / col("n_risk")) * lit(1e6)).cast("bigint")))
      .withColumn("ln_surv_micro", sum(col("step_micro")).over(wCum))
      .withColumn("surv_prev_ppm",
        round(exp(coalesce(lag(col("ln_surv_micro"), 1).over(wAsc), lit(0L))
          .cast("double") / lit(1e6)) * lit(1e6)).cast("bigint"))
    val withCif = outcomeTypes.foldLeft(stepped) { (df, k) =>
      df.withColumn(s"cif_${k}_ppm",
        sum(expr(s"(surv_prev_ppm * d_$k) DIV n_risk")).over(wCum))
    }
    withCif
      .filter(col("d_total") > 0)
      .select((Seq(col("t"), col("n_risk"), col("d_total")) ++
        outcomeTypes.map(k => col(s"d_$k")) ++
        outcomeTypes.map(k => col(s"cif_${k}_ppm"))): _*)
  }

  /** RFM SEGMENTATION — the classic user-value triage (recency,
    * frequency, monetary) as exact-rational quintiles: the sampling /
    * weighting prior a behavior-data pipeline applies before user events
    * feed training ("oversample engaged users, decay churned ones").
    * Per user: `recency_us` (observation end − last event), `frequency`
    * (event count), `monetary_micro` (Σ value). Each metric quintiles by
    * the q123 exact ntile `(5·rank + n − 1) DIV n` over the
    * deterministic (metric, user) order — quintile 1 = SMALLEST metric
    * (for recency that means most recent; flip downstream if a
    * 5-is-best convention is wanted), and `segment = 100·r + 10·f + m`.
    *
    * Scale shape: one per-user aggregation, then three
    * [[Ranks.offsetRank]] distributed ranks over the USER-level table
    * (one row per user, not per event) — range exchange +
    * broadcast-offset join each, bit-identical to the former
    * `row_number OVER (ORDER BY metric, u)` global windows but with NO
    * single-partition sort; `n_users` enters as the rank pass's
    * collected total, replacing the former `count(*) OVER ()` global
    * window. Intermediates are persisted (tracked —
    * [[Dedup.releaseCaches]] frees them).
    */
  /** NELSON–AALEN cumulative hazard — [[kaplanMeier]]'s companion
    * estimator, and the FULLY EXACT one: H(t) = Σ_{t'≤t} d/n_risk needs
    * no logarithm, so every emitted value is a truncating integer
    * division (`step_ppm = (10⁶·d) DIV n_risk`) integer-summed in event
    * order — bit-identical anywhere, no libm caveat at all. Same
    * entry/event/censoring prep, same duration bucketing (and the same
    * [[MaxDurationBuckets]] loud guard) as the KM table; one row per
    * distinct event duration: `(t, n_risk, n_events, step_ppm,
    * cum_hazard_ppm)`.
    *
    * Scale shape: two per-user min-aggregations, a broadcast censor row,
    * and the guarded duration-bucket windows — calendar-bounded, never
    * user-bounded (the q201/q202 argument).
    */
  def nelsonAalen(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      entryType: String, eventType: String, bucketMicros: Long): DataFrame = {
    require(bucketMicros >= 1, "nelsonAalen: bucketMicros >= 1")
    val base = events.select(col(userCol).cast("bigint").as("u"),
      unix_micros(col(tsCol)).as("tsu"), col(typeCol).as("et"))
    val entry = base.filter(col("et") === entryType)
      .groupBy(col("u")).agg(min(col("tsu")).as("t0"))
    val evt = base.filter(col("et") === eventType)
      .join(entry, Seq("u"))
      .filter(col("tsu") >= col("t0"))
      .groupBy(col("u")).agg(min(col("tsu")).as("t1"))
    val censor = base.agg(max(col("tsu")).as("tmax"), min(col("tsu")).as("tmin"))
    val durations = entry.join(evt, Seq("u"), "left")
      .crossJoin(broadcast(censor))
      .select(col("u"),
        guardedBucket("nelsonAalen", bucketMicros).as("t"),
        col("t1").isNotNull.cast("bigint").as("observed"))
    val perT = durations.groupBy(col("t"))
      .agg(count(lit(1)).as("cnt"), sum(col("observed")).as("d"))
    val wAsc = Window.orderBy(col("t"))
    val wPrev = wAsc.rowsBetween(Window.unboundedPreceding, -1)
    val wCum = wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perT
      .withColumn("total", sum(col("cnt")).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("n_risk", col("total") - coalesce(sum(col("cnt")).over(wPrev), lit(0L)))
      .withColumn("step_ppm", expr("(1000000 * d) DIV n_risk"))
      .withColumn("cum_hazard_ppm", sum(col("step_ppm")).over(wCum))
      .filter(col("d") > 0)
      .select(col("t"), col("n_risk"), col("d").as("n_events"),
        col("step_ppm"), col("cum_hazard_ppm"))
  }

  /** RESTRICTED MEAN SURVIVAL TIME — the ONE-NUMBER summary of the
    * [[kaplanMeier]] curve clinicians (and retention analysts) actually
    * report: RMST(τ) = ∫₀^τ S(t)dt, the mean duration survived inside the
    * first τ buckets ("average buckets-to-conversion among the first τ,
    * counting non-converters at full τ") — robust where the raw mean is
    * censoring-biased and the median is undefined past 50% survival.
    *
    * Exact on top of the KM table's integers: S is a step function (1
    * before the first event bucket, `surv_ppm_i` from t_i to t_{i+1}),
    * so the integral is
    *
    *   rmst_ppm_buckets = 10⁶·min(t₁, τ)
    *                    + Σ_i surv_ppm_i·(min(t_{i+1}, τ) − min(t_i, τ))
    *
    * — products of KM's already-exact ppm values with clamped integer
    * segment widths (decimal-routed), no new float steps at all. An
    * event-free corpus reads RMST = 10⁶·τ (everyone survives the whole
    * window). One output row: `(tau, n_event_times, rmst_ppm_buckets)`;
    * divide by 10⁶ for mean buckets.
    *
    * Scale shape: the KM plan plus ONE lead/aggregate pass over the
    * event-duration frame — time-resolution bounded like its parent
    * (and guarded by the same [[MaxDurationBuckets]] raise).
    */
  def rmst(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      entryType: String, eventType: String, bucketMicros: Long,
      tauBuckets: Long): DataFrame = {
    require(tauBuckets >= 1, "rmst: tauBuckets >= 1")
    val km = kaplanMeier(events, userCol, tsCol, typeCol, entryType,
      eventType, bucketMicros)
    val wLead = Window.orderBy(col("t"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    km.select(col("t"), col("surv_ppm"))
      .withColumn("t_next",
        least(coalesce(lead(col("t"), 1).over(wLead), lit(tauBuckets)),
          lit(tauBuckets)))
      .withColumn("seg", col("t_next") - least(col("t"), lit(tauBuckets)))
      .agg(
        coalesce(min(least(col("t"), lit(tauBuckets))), lit(tauBuckets))
          .as("t_first_c"),
        coalesce(sum(d(col("surv_ppm")) * d(col("seg"))),
          lit(0).cast("decimal(38,0)")).as("tail_ppm"),
        count(lit(1)).as("n_event_times"))
      .select(lit(tauBuckets).as("tau"), col("n_event_times"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * t_first_c + tail_ppm" +
          " AS BIGINT)").as("rmst_ppm_buckets"))
  }

  /** FANO DISPERSION INDEX of each group's DAILY event counts —
    * variance-to-mean of the per-day arrival counts, the classic "is
    * this count process Poisson" monitor (Poisson ⇒ Fano ≈ 1;
    * clumped/bursty traffic ≫ 1, metronomic bots ≪ 1 — the
    * interARRIVAL twin of [[interArrivalStats]]' CV², at daily
    * granularity where it composes with the q240 dailyStats family).
    * Exactly integral: with S = Σc, Q = Σc² over n days,
    *
    *   fano_ppm = (10⁶·(n·Q − S²)) DIV ((n−1)·S)
    *
    * — sample variance over mean collapses to ONE truncating division
    * of exact integers. `mean_micro = (10⁶·S) DIV n` rides along.
    * Groups with n < 2 days or S = 0 read the −2·10⁶ sentinel.
    *
    * Scale shape: one (group, day) count with map-side combine, one
    * group reduce — calendar-bounded after the first pass.
    */
  def fanoDispersion(
      events: DataFrame, tsCol: String, groupCol: String): DataFrame =
    fanoFromDailyCounts(
      events.select(col(groupCol).as("grp"),
          date_format(date_trunc("day", col(tsCol)), "yyyy-MM-dd").as("day"))
        .groupBy(col("grp"), col("day")).agg(count(lit(1)).as("dc")))

  /** [[fanoDispersion]] over a prepared `(grp, day, dc)` count frame
    * (the [[dailyStats]] shape — one daily aggregation feeds this AND
    * the q216/q220/q224 monitors).
    */
  def fanoFromDailyCounts(daily: DataFrame): DataFrame = {
    val d = (c: String) => col(c).cast("decimal(38,0)")
    daily.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_days"), sum(col("dc")).as("s"),
        sum(d("dc") * d("dc")).as("q"))
      .select(col("grp"), col("n_days"),
        when(col("n_days") < 2L || col("s") === 0L, lit(-2000000L))
          .otherwise(expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * s) DIV n_days AS BIGINT)"))
          .as("mean_micro"),
        when(col("n_days") < 2L || col("s") === 0L, lit(-2000000L))
          .otherwise(expr(
            """CAST((CAST(1000000 AS DECIMAL(38,0))
              |  * (n_days * q - CAST(s AS DECIMAL(38,0)) * s))
              | DIV ((n_days - 1) * CAST(s AS DECIMAL(38,0))) AS BIGINT)""".stripMargin))
          .as("fano_ppm"))
  }

  def rfmSegments(
      events: DataFrame, userCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val base = events.select(col(userCol).cast("bigint").as("u"),
      unix_micros(col(tsCol)).as("tsu"),
      round(col(valueCol) * lit(1e6)).cast("bigint").as("vm"))
    val perUser = base.groupBy(col("u"))
      .agg(max(col("tsu")).as("last_tsu"), count(lit(1)).as("frequency"),
        sum(col("vm")).as("monetary_micro"))
      .crossJoin(broadcast(base.agg(max(col("tsu")).as("tmax"))))
      .withColumn("recency_us", col("tmax") - col("last_tsu"))
      .drop("tmax", "last_tsu")
    val (r1, nUsers) =
      Ranks.offsetRank(perUser, Nil, Seq("recency_us", "u"), "rank_recency_us")
    val (r2, _) =
      Ranks.offsetRank(r1, Nil, Seq("frequency", "u"), "rank_frequency")
    val (r3, _) =
      Ranks.offsetRank(r2, Nil, Seq("monetary_micro", "u"), "rank_monetary_micro")
    val denom = math.max(nUsers, 1L) // empty frame: no rows evaluate, avoid DIV 0 fold
    def quintile(metric: String): Column =
      expr(s"(5 * rank_$metric + ${nUsers}L - 1) DIV ${denom}L")
    r3
      .withColumn("r", quintile("recency_us"))
      .withColumn("f", quintile("frequency"))
      .withColumn("m", quintile("monetary_micro"))
      .select(col("u"), col("recency_us"), col("frequency"),
        col("monetary_micro"), col("r"), col("f"), col("m"),
        (col("r") * 100L + col("f") * 10L + col("m")).as("segment"))
  }

  /** LOG-RANK TEST between two arms' time-to-event curves — the
    * experiment readout [[kaplanMeier]] feeds and the rate-based
    * `FeatureEng.abTest` cannot answer: two arms can convert at the SAME
    * final rate while one converts systematically FASTER; the log-rank
    * statistic compares the whole timing curve, censoring-honest. At
    * each event time t (either arm):
    *
    *   O1 += d1,  E1 += d·n1/n,  V += d·n1·n2·(n−d) / (n²·(n−1))
    *   χ² = (O1 − E1)² / V      (~χ²₁ under the null)
    *
    * E1/V terms are rounded to integer MICRO per event time then summed
    * (the q74 ln convention applied to rationals — deterministic at any
    * parallelism); `chi2_micro = (10⁶·O1 − E1μ)² DIV (10⁶·Vμ)` and the
    * significance flag compares against the χ²₁ 95% point 3.841459 as a
    * micro literal. Arms come from `armCol` (0/1, constant per user —
    * e.g. the q140 md5-parity assignment).
    *
    * Scale shape: the [[kaplanMeier]] prep per arm, then one window over
    * DISTINCT durations (time-resolution bounded) and a 1-row reduce.
    */
  def logRankTest(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      armCol: String, entryType: String, eventType: String,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros >= 1, "logRankTest: bucketMicros >= 1")
    val base = events.select(col(userCol).cast("bigint").as("u"),
      unix_micros(col(tsCol)).as("tsu"), col(typeCol).as("et"),
      col(armCol).cast("bigint").as("arm"))
      .withColumn("arm", when(col("arm").isin(0L, 1L), col("arm"))
        .otherwise(raise_error(lit("logRankTest: arm must be 0/1"))))
    val entry = base.filter(col("et") === entryType)
      .groupBy(col("u")).agg(min(col("tsu")).as("t0"), max(col("arm")).as("arm"))
    val evt = base.filter(col("et") === eventType)
      .join(entry.select(col("u"), col("t0")), Seq("u"))
      .filter(col("tsu") >= col("t0"))
      .groupBy(col("u")).agg(min(col("tsu")).as("t1"))
    val censor = base.agg(max(col("tsu")).as("tmax"), min(col("tsu")).as("tmin"))
    val durations = entry.join(evt, Seq("u"), "left")
      .crossJoin(broadcast(censor))
      .select(col("arm"),
        guardedBucket("logRankTest", bucketMicros).as("t"),
        col("t1").isNotNull.cast("bigint").as("observed"))
    val perT = durations.groupBy(col("t"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("cnt1"),
        sum(col("observed")).as("d"),
        sum(col("observed") * when(col("arm") === 1, 1L).otherwise(0L)).as("d1"))
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val steps = perT
      .withColumn("total", sum(col("cnt")).over(wAll))
      .withColumn("total1", sum(col("cnt1")).over(wAll))
      .withColumn("n", col("total") - coalesce(sum(col("cnt")).over(wPrev), lit(0L)))
      .withColumn("n1", col("total1") - coalesce(sum(col("cnt1")).over(wPrev), lit(0L)))
      .filter(col("d") > 0)
      .withColumn("e1_micro",
        round(lit(1e6) * col("d").cast("double") * col("n1") / col("n"))
          .cast("bigint"))
      .withColumn("v_micro",
        when(col("n") <= 1, lit(0L))
          .otherwise(round(lit(1e6)
            * (col("d").cast("double") * col("n1") * (col("n") - col("n1"))
              * (col("n") - col("d")))
            / (col("n").cast("double") * col("n") * (col("n") - lit(1L))))
            .cast("bigint")))
    steps.agg(count(lit(1)).as("n_event_times"),
        sum(col("d")).as("n_events"), sum(col("d1")).as("o1"),
        sum(col("e1_micro")).as("e1_micro"), sum(col("v_micro")).as("v_micro"))
      .select(col("n_event_times"), col("n_events"), col("o1"),
        col("e1_micro"), col("v_micro"),
        when(col("v_micro") <= 0, lit(-1L))
          .otherwise(expr(
            """CAST(((CAST(1000000 AS DECIMAL(38,0)) * o1 - e1_micro)
              |  * (CAST(1000000 AS DECIMAL(38,0)) * o1 - e1_micro))
              | DIV CAST(v_micro AS DECIMAL(38,0)) AS BIGINT)""".stripMargin))
          .as("chi2_micro"))
      .withColumn("significant_95",
        (col("chi2_micro") >= 3841459L && col("chi2_micro") >= 0).cast("bigint"))
  }

  /** Per-user INTER-ARRIVAL burstiness — mean gap and the squared
    * coefficient of variation of consecutive event gaps, the classic
    * behavioral fingerprint: a Poisson (human-ish) arrival process reads
    * CV² ≈ 1, a metronomic bot ≪ 1, a bursty scraper ≫ 1. The bot/abuse
    * screen a training pipeline runs before user-generated events feed
    * anything downstream.
    *
    *   gaps dᵢ over the deterministic (ts, id) order (micros);
    *   mean_gap_us = Σd DIV n,
    *   cv2_ppm = (10⁶·(n·Σd² − (Σd)²)) DIV (Σd)²   — exact integers,
    *
    * with Σd² through decimal(38,0) (a day-long gap squares to ~7·10²¹).
    * Users with < 2 events emit no row (no gap exists); all-simultaneous
    * users (Σd = 0) emit the −1 sentinel.
    *
    * Scale shape: one user-keyed shuffle for the lag window, then the
    * aggregation rides the same partitioning; skew bound = events per
    * user, the natural floor.
    */
  def interArrivalStats(
      events: DataFrame, userCol: String, tsCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(col("u")).orderBy(col("tsu"), col("id"))
    events.select(col(userCol).cast("bigint").as("u"),
        unix_micros(col(tsCol)).as("tsu"), col(idCol).cast("bigint").as("id"))
      .withColumn("d", col("tsu") - lag(col("tsu"), 1).over(w))
      .filter(col("d").isNotNull)
      .groupBy(col("u"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("d")).as("sd"),
        // cast BEFORE the square: a day-long gap in micros squares past
        // a long (8.6e10² ≈ 7.5e21)
        sum(col("d").cast("decimal(38,0)") * col("d").cast("decimal(38,0)"))
          .as("sdd"))
      .select(col("u"), col("n_gaps"),
        expr("sd DIV n_gaps").as("mean_gap_us"),
        when(col("sd") === 0, lit(-1L))
          .otherwise(expr(
            """CAST((CAST(1000000 AS DECIMAL(38,0)) *
              |  (n_gaps * sdd - CAST(sd AS DECIMAL(38,0)) * CAST(sd AS DECIMAL(38,0))))
              | DIV (CAST(sd AS DECIMAL(38,0)) * CAST(sd AS DECIMAL(38,0))) AS BIGINT)""".stripMargin))
          .as("cv2_ppm"))
  }

  /** CUSUM MEAN-SHIFT CHANGEPOINT — per group, the day that best splits
    * the daily value series into a "before" and "after" regime: the
    * classic offline CUSUM estimator, argmax_k |S_k| over the centered
    * prefix sums S_k = Σ_{i≤k} (x_i − x̄). The drift detector that answers
    * "WHEN did this metric move" next to q112's seasonal "is today
    * anomalous" and q132/q159's "did the distribution move" — the
    * monitoring triplet every ingest pipeline runs per source/metric.
    *
    * Exactness: events quantize to micro (round(value·10⁶)); the
    * centered prefix is cleared of the mean's division by scaling with
    * the total event count,
    *
    *   D_k = cnt_total · cumsum_k − cumcnt_k · sum_total   (exact),
    *
    * argmax on (|D_k| desc, day asc) via one min(struct) aggregation —
    * ties resolve to the EARLIEST day, so a constant series reads its
    * first day with zero magnitude. Reported at the peak:
    * `cusum_micro = D_k DIV cnt_total` (the unscaled CUSUM value),
    * before/after regime means, and their shift; a group whose peak
    * lands on its last day (single-day groups: D_n = 0 by construction)
    * has no "after" regime and emits the −2·10⁶ sentinel means/shift.
    *
    * Scale shape: one (group, day) aggregation with map-side combine
    * collapses the event stream to calendar-bounded series; the prefix
    * sums ride ONE window partitioned by group (bound = days per group,
    * the calendar — never event counts); group totals ride the same
    * partitioning; the argmax is a plain aggregation. Nothing global,
    * nothing event-scaled past the first aggregation.
    */
  /** Shared first pass of the daily-series monitor family
    * ([[cusumChangepoint]], [[onlineCusum]], [[stlDecompose]]): collapse
    * the event stream to per-(group, day) micro sums, counts, and the
    * exact integer daily mean. Compute ONCE and persist when feeding
    * several monitors — the materialize-once pattern the bench's
    * pipeline_monitor entry exercises.
    */
  def dailyStats(
      events: DataFrame, tsCol: String, valueCol: String,
      groupCol: String): DataFrame =
    events
      .select(col(groupCol).as("grp"),
        date_format(date_trunc("day", col(tsCol)), "yyyy-MM-dd").as("day"),
        DataPrep.micro(col(valueCol)).as("xm"))
      .groupBy(col("grp"), col("day"))
      .agg(sum(col("xm")).as("ds"), count(lit(1)).as("dc"))
      .withColumn("dm", expr("ds DIV dc"))

  /** KENDALL TAU-B between every PAIR of groups' daily series — the
    * cross-METRIC dependence monitor ("do error-rate and purchase-value
    * move together day over day?") completing the per-series tools
    * (Mann-Kendall is tau of ONE series against time): concordant /
    * discordant / tied day-pairs counted EXACTLY over the shared-day
    * join, with the tau-b tie correction
    *
    *   τ_b = (C − D) / √((n₀ − n₁)(n₀ − n₂)),   n₀ = n(n−1)/2,
    *   n₁/n₂ = pairs tied in the a/b series
    *
    * — all counts exact integers; the final micro value takes ONE f64
    * divide+√ (the q135 Pearson convention: exact integer moments, one
    * correctly-rounded float step, corpus-validated). A pair with a
    * constant series (denominator 0) reads the −2·10⁶ sentinel. One row
    * per unordered group pair.
    *
    * Scale shape: the daily pre-aggregation carries the data scale;
    * after it, a |types|²-bounded group-pair join and a calendar-bounded
    * day-pair join PARTITIONED by the group pair — never row-scaled.
    */
  def kendallTauPairs(
      events: DataFrame, tsCol: String, valueCol: String,
      groupCol: String): DataFrame =
    kendallTauPairsFromDaily(dailyStats(events, tsCol, valueCol, groupCol))

  /** [[kendallTauPairs]] over a prepared [[dailyStats]] frame. */
  def kendallTauPairsFromDaily(daily: DataFrame): DataFrame = {
    val a = daily.select(col("grp").as("ga"), col("day"), col("dm").as("va"))
    val b = daily.select(col("grp").as("gb"), col("day"), col("dm").as("vb"))
    val paired = a.join(b, Seq("day")).filter(col("ga") < col("gb"))
    val p1 = paired.select(col("ga"), col("gb"), col("day").as("d1"),
      col("va").as("a1"), col("vb").as("b1"))
    val p2 = paired.select(col("ga"), col("gb"), col("day").as("d2"),
      col("va").as("a2"), col("vb").as("b2"))
    val dayPairs = p1.join(p2, Seq("ga", "gb")).filter(col("d1") < col("d2"))
      .withColumn("sa", signum(col("a1") - col("a2")).cast("bigint"))
      .withColumn("sb", signum(col("b1") - col("b2")).cast("bigint"))
    val d = (c: String) => col(c).cast("decimal(38,0)")
    dayPairs.groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("n0"),
        sum(when(col("sa") * col("sb") === 1L, 1L).otherwise(0L)).as("c"),
        sum(when(col("sa") * col("sb") === -1L, 1L).otherwise(0L))
          .as("disc"),
        sum(when(col("sa") === 0L, 1L).otherwise(0L)).as("tie_a"),
        sum(when(col("sb") === 0L, 1L).otherwise(0L)).as("tie_b"))
      .select(col("ga"), col("gb"), col("n0"), col("c").as("concordant"),
        col("disc").as("discordant"),
        when((col("n0") === col("tie_a")) || (col("n0") === col("tie_b")),
          lit(-2000000L))
          .otherwise(round(lit(1e6) * (col("c") - col("disc")).cast("double")
            / sqrt(((d("n0") - d("tie_a")) * (d("n0") - d("tie_b")))
              .cast("double"))).cast("bigint"))
          .as("tau_b_micro"))
  }

  /** WALD–WOLFOWITZ RUNS TEST of each group's daily series — "is the
    * sequence of above/below-median days RANDOM, or does it cluster
    * (trend/regime) or alternate (overcorrection)?" — the
    * assumption-free randomness screen a monitoring stack runs before
    * trusting i.i.d.-flavored alarms. Signs come from each group's exact
    * LOWER MEDIAN of daily micro-means (rank `(n+1) DIV 2` over the
    * value histogram — no global sort); days equal to the median DROP
    * (the standard convention); `n_runs` counts maximal same-sign
    * stretches in day order.
    *
    * Verdict — cleared-denominator exact gate: with N = n₁+n₂ surviving
    * days, m = n₁·n₂, E[R] = 1 + 2m/N and Var[R] = 2m(2m−N)/(N²(N−1)),
    * the N-scaled deviation DN = N·(R−1) − 2m is an exact integer and
    * |R − E| > z·σ multiplies through by N²(N−1) into
    *
    *   q·DN²·(N−1) > p·2m·(2m−N)
    *
    * — all decimal(38,0) integers (days are calendar-bounded, no
    * pre-check needed). `random_95 = 1` when the null survives (the
    * [[ljungBox]] white_95 convention), 0 when rejected, −1 when the
    * variance term is ≤ 0 (one sign absent, or n₁ = n₂ = 1).
    *
    * Scale shape: calendar-bounded group-partitioned windows over the
    * daily frame only (median from the value histogram, runs from one
    * lag) — the [[dailyStats]] pre-aggregation carries the data scale.
    */
  def runsTest(
      events: DataFrame, tsCol: String, valueCol: String,
      groupCol: String): DataFrame =
    runsTestFromDaily(dailyStats(events, tsCol, valueCol, groupCol))

  /** [[runsTest]] over a prepared [[dailyStats]] frame. */
  def runsTestFromDaily(
      daily: DataFrame, critP: Long = 2401L, critQ: Long = 625L): DataFrame = {
    require(critP >= 1 && critQ >= 1, "critical value p/q must be positive")
    // exact lower median per group from the dm histogram
    val hist = daily.groupBy(col("grp"), col("dm")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("dm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("grp"))
    val med = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("ntot", sum(col("c")).over(wAll))
      .filter(col("cum") >= expr("(ntot + 1) DIV 2"))
      .groupBy(col("grp")).agg(min(col("dm")).as("med"))
    val signs = daily.join(med, Seq("grp"))
      .filter(col("dm") =!= col("med"))
      .select(col("grp"), col("day"),
        when(col("dm") > col("med"), 1L).otherwise(-1L).as("sg"))
    val wDay = Window.partitionBy(col("grp")).orderBy(col("day"))
    val d = (c: String) => col(c).cast("decimal(38,0)")
    val counted = signs
      .withColumn("chg",
        (lag(col("sg"), 1).over(wDay).isNull ||
          lag(col("sg"), 1).over(wDay) =!= col("sg")).cast("bigint"))
      .groupBy(col("grp"))
      .agg(sum(when(col("sg") === 1L, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("sg") === -1L, 1L).otherwise(0L)).as("n_neg"),
        sum(col("chg")).as("n_runs"))
    // Re-anchor on `med` (exactly one row per group): a group whose days
    // ALL equal its median contributes zero sign rows and would otherwise
    // vanish — it must emit (0, 0, 0, -1) like the other degenerate
    // (one-sign-absent) cases. With the filled zeros, m2 = 0 → vterm = 0
    // → the existing <= 0 branch produces the -1 sentinel.
    med.select(col("grp"))
      .join(counted, Seq("grp"), "left")
      .na.fill(0L, Seq("n_pos", "n_neg", "n_runs"))
      .withColumn("nn", col("n_pos") + col("n_neg"))
      .withColumn("m2", lit(2) * d("n_pos") * d("n_neg"))
      .withColumn("dn", d("nn") * (d("n_runs") - lit(1)) - col("m2"))
      .withColumn("vterm", col("m2") * (col("m2") - d("nn")))
      .select(col("grp"), col("n_pos"), col("n_neg"), col("n_runs"),
        when(col("vterm") <= 0, lit(-1L))
          .otherwise((!(lit(critQ) * col("dn") * col("dn") * (d("nn") - lit(1)) >
            lit(critP) * col("vterm"))).cast("bigint"))
          .as("random_95"))
  }

  /** TURNING-POINT TEST of each group's daily series — the [[runsTest]]
    * co-screen that needs NO median: count strict local extrema
    * (dm[i−1] < dm[i] > dm[i+1] or the mirror) over the day order; an
    * i.i.d. series has E[TP] = 2(n−2)/3 and Var[TP] = (16n−29)/90, so
    * too few turns = trend/regime, too many = alternation. Tie-adjacent
    * points are simply not strict extrema (deterministic, no drops).
    *
    * Verdict — cleared-denominator exact gate: D = 3·TP − 2(n−2) is the
    * 3-scaled integer deviation, and |TP − E| > z·σ multiplies through
    * into `10·q·D² > p·(16n−29)` — all exact integers (days are
    * calendar-bounded). `random_95 = 1` when the null survives (the
    * [[ljungBox]] white_95 convention); groups with n < 3 days read −1.
    *
    * Scale shape: one lag/lead window partitioned by group over the
    * daily frame, one group reduce — everything after [[dailyStats]] is
    * calendar-bounded.
    */
  def turningPoints(
      events: DataFrame, tsCol: String, valueCol: String,
      groupCol: String): DataFrame =
    turningPointsFromDaily(dailyStats(events, tsCol, valueCol, groupCol))

  /** [[turningPoints]] over a prepared [[dailyStats]] frame. */
  def turningPointsFromDaily(
      daily: DataFrame, critP: Long = 2401L, critQ: Long = 625L): DataFrame = {
    require(critP >= 1 && critQ >= 1, "critical value p/q must be positive")
    val wDay = Window.partitionBy(col("grp")).orderBy(col("day"))
    val d = (c: String) => col(c).cast("decimal(38,0)")
    daily
      .withColumn("pv", lag(col("dm"), 1).over(wDay))
      .withColumn("nx", lead(col("dm"), 1).over(wDay))
      .withColumn("tp",
        (col("pv").isNotNull && col("nx").isNotNull &&
          ((col("dm") > col("pv") && col("dm") > col("nx")) ||
            (col("dm") < col("pv") && col("dm") < col("nx")))).cast("bigint"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_days"), sum(col("tp")).as("n_turns"))
      .withColumn("dd",
        lit(3) * d("n_turns") - lit(2) * (d("n_days") - lit(2)))
      .select(col("grp"), col("n_days"), col("n_turns"),
        when(col("n_days") < 3L, lit(-1L))
          .otherwise((!(lit(critQ) * lit(10) * col("dd") * col("dd") >
            lit(critP) * (lit(16) * d("n_days") - lit(29)))).cast("bigint"))
          .as("random_95"))
  }

  def cusumChangepoint(
      events: DataFrame, tsCol: String, valueCol: String,
      groupCol: String): DataFrame =
    cusumChangepointFromDaily(dailyStats(events, tsCol, valueCol, groupCol))

  /** [[cusumChangepoint]] over a prepared [[dailyStats]] frame. */
  def cusumChangepointFromDaily(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("grp")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("grp"))
    val scored = daily
      .withColumn("cs", sum(col("ds")).over(w))
      .withColumn("cc", sum(col("dc")).over(w))
      .withColumn("ts_tot", sum(col("ds")).over(wAll))
      .withColumn("tc_tot", sum(col("dc")).over(wAll))
      .withColumn("n_days", count(lit(1)).over(wAll))
      // decimal factors: cnt·cumsum overflows a long once either side
      // carries corpus-scale micro sums
      .withColumn("d_k", expr(
        """CAST(tc_tot AS DECIMAL(38,0)) * cs
          | - CAST(cc AS DECIMAL(38,0)) * ts_tot""".stripMargin))
    scored
      .groupBy(col("grp"))
      .agg(max(col("n_days")).as("n_days"),
        max(col("tc_tot")).as("n_events"),
        min(struct(negate(abs(col("d_k"))).as("na"), col("day").as("day"),
          col("d_k").as("d"), col("cs").as("cs"), col("cc").as("cc"),
          col("ts_tot").as("ts"), col("tc_tot").as("tc"))).as("pk"))
      .select(col("grp"), col("n_days"), col("n_events"),
        col("pk.day").as("change_day"),
        expr("CAST(pk.d DIV pk.tc AS BIGINT)").as("cusum_micro"),
        expr("CAST(pk.cs DIV pk.cc AS BIGINT)").as("mean_before_micro"),
        when(col("pk.tc") === col("pk.cc"), lit(-2000000L))
          .otherwise(expr(
            "CAST((pk.ts - pk.cs) DIV (pk.tc - pk.cc) AS BIGINT)"))
          .as("mean_after_micro"),
        when(col("pk.tc") === col("pk.cc"), lit(-2000000L))
          .otherwise(expr(
            """CAST((pk.ts - pk.cs) DIV (pk.tc - pk.cc)
              | - pk.cs DIV pk.cc AS BIGINT)""".stripMargin))
          .as("shift_micro"))
  }

  /** ONLINE CUSUM DRIFT ALARMS over a grouped daily series — Page's
    * sequential detector ([[graft.functions.CusumFunctions]]) run against
    * a reference mean FROZEN on the first `refDays` days: the monitor
    * that pages you DURING the drift, where [[cusumChangepoint]] dates it
    * afterwards. Per group: daily micro-means (exact integer division of
    * the micro sum), μ₀ = the integer mean of the first `refDays` daily
    * means, then the two-sided CUSUM fold over the remaining days'
    * deviations in strict day order. Alarm counts, the surviving
    * statistics, and the first alarm day ('' = never) come back exactly —
    * the oracle replays the literal fold as a lockstep recursive CTE, and
    * the streaming twin shares [[graft.functions.CusumFunctions.step]]
    * verbatim.
    *
    * Scale shape: one (group, day) aggregation with map-side combine
    * collapses events to calendar-bounded series; the day rank rides a
    * window PARTITIONED by group; the fold is a typed UDAF whose buffer
    * is the group's probe DAYS (calendar-bounded, the Holt/EWMA state
    * contract). Groups whose series is shorter than `refDays` alarm on
    * nothing (no probe rows) and read zero-state sentinels.
    */
  def onlineCusum(
      events: DataFrame, tsCol: String, valueCol: String, groupCol: String,
      refDays: Int, slackMicro: Long, hMicro: Long): DataFrame =
    onlineCusumFromDaily(dailyStats(events, tsCol, valueCol, groupCol),
      refDays, slackMicro, hMicro)

  /** [[onlineCusum]] over a prepared [[dailyStats]] frame. */
  def onlineCusumFromDaily(
      daily: DataFrame, refDays: Int, slackMicro: Long,
      hMicro: Long): DataFrame = {
    require(refDays >= 1, "onlineCusum: refDays >= 1")
    val cusum = graft.functions.CusumFunctions.cusumUdaf(slackMicro, hMicro)
    val ranked = daily.withColumn("rk", row_number().over(
      Window.partitionBy(col("grp")).orderBy(col("day"))))
    val mu = ranked.filter(col("rk") <= refDays)
      .groupBy(col("grp"))
      .agg(expr("sum(dm) DIV count(1)").as("mu"), count(lit(1)).as("n_ref"))
    val folded = ranked.filter(col("rk") > refDays)
      .join(mu.select(col("grp"), col("mu")), Seq("grp"))
      .withColumn("dev", col("dm") - col("mu"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_probe"),
        cusum(col("day"), lit(0L), col("dev")).as("h"))
    mu.join(folded, Seq("grp"), "left")
      .select(col("grp"), col("mu").as("mu_micro"),
        col("n_ref").as("n_ref_days"),
        coalesce(col("n_probe"), lit(0L)).as("n_probe_days"),
        coalesce(col("h.s_hi_micro"), lit(0L)).as("s_hi_micro"),
        coalesce(col("h.s_lo_micro"), lit(0L)).as("s_lo_micro"),
        coalesce(col("h.alarms_hi"), lit(0L)).as("alarms_hi"),
        coalesce(col("h.alarms_lo"), lit(0L)).as("alarms_lo"),
        coalesce(col("h.first_alarm"), lit("")).as("first_alarm"))
  }

  /** STL-LITE SEASONAL DECOMPOSITION — split each group's daily series
    * into trend + weekly seasonal + residual, the classical additive
    * decomposition (moving-average trend, seasonal = per-weekday mean of
    * the detrended series) that makes q112's "is today anomalous" and
    * q216/q220's "did the level move" questions readable: monitor the
    * RESIDUAL, report the SEASONAL, alarm on the TREND.
    *
    *   trend_d    = centered ±3-day moving mean (window clips at edges),
    *   seasonal_w = mean over the group's days with ISO weekday w of
    *                (x_d − trend_d),
    *   residual_d = x_d − trend_d − seasonal_w(d).
    *
    * Exactness: daily means, the trend window, and the weekday means are
    * each ONE exact integer micro division (documented truncation,
    * identical in both engines); weekday = ISO 1–7 (Spark `weekday+1` ≡
    * DuckDB `isodow`). The seasonal is the raw per-weekday mean
    * (uncentered — the detrended series already sums near zero), so the
    * identity x = trend + seasonal + residual holds EXACTLY per row.
    *
    * Scale shape: one (group, day) aggregation with map-side combine
    * collapses the event stream; the trend window and the weekday means
    * are calendar-bounded passes partitioned by group. Nothing global.
    */
  def stlDecompose(
      events: DataFrame, tsCol: String, valueCol: String,
      groupCol: String): DataFrame =
    stlDecomposeFromDaily(dailyStats(events, tsCol, valueCol, groupCol))

  /** AUTOCORRELATION FUNCTION of each group's daily series at lags
    * 1..`maxLag` — the series fingerprint that picks the seasonal period
    * for [[graft.functions.HoltFunctions]]' Holt-Winters (the lag-7 spike
    * says "weekly"), validates [[stlDecompose]]'s residual whiteness, and
    * flags regime stickiness. Computed as the exact Pearson correlation
    * over the (x_t, x_{t−ℓ}) pair set of each lag (the q135 moment
    * convention: exact decimal moment sums, ONE f64 divide+sqrt at the
    * very end rounded to micro). A constant margin emits the −2·10⁶
    * OUT-OF-RANGE sentinel — deliberately NOT q135's −10⁶, which a
    * perfectly anti-correlated lag (e.g. an alternating series at odd
    * lags) produces legitimately; [[pacfFromAcf]] consumes these values
    * and must be able to tell the two apart. Lags with no pairs (series
    * shorter than ℓ+1) emit no row.
    *
    * Scale shape: ONE group-partitioned window pass carries all `maxLag`
    * lag columns (no self-join), a `stack` unpivot turns them into
    * (group, lag) pair rows, and one aggregation computes every lag's
    * moments — calendar-bounded throughout.
    */
  def acf(
      events: DataFrame, tsCol: String, valueCol: String, groupCol: String,
      maxLag: Int = 7): DataFrame =
    acfFromDaily(dailyStats(events, tsCol, valueCol, groupCol), maxLag)

  /** [[acf]] over a prepared [[dailyStats]] frame. */
  def acfFromDaily(daily: DataFrame, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 60, "acf: maxLag in [1, 60]")
    val wd = Window.partitionBy(col("grp")).orderBy(col("day"))
    val lagged = (1 to maxLag).foldLeft(daily) { (df, l) =>
      df.withColumn(s"lag_$l", lag(col("dm"), l).over(wd))
    }
    val pairs = lagged
      .select(col("grp"), col("dm").as("x"), expr(
        s"stack($maxLag, " +
          (1 to maxLag).map(l => s"$l, lag_$l").mkString(", ") +
          ") AS (lag, y)"))
      .filter(col("y").isNotNull)
    val d = (c: String) => col(c).cast("decimal(38,0)")
    pairs.groupBy(col("grp"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(d("x")).as("sx"), sum(d("y")).as("sy"),
        sum(d("x") * d("y")).as("sxy"),
        sum(d("x") * d("x")).as("sxx"),
        sum(d("y") * d("y")).as("syy"))
      .select(col("grp"), col("lag"), col("n_pairs"),
        when(expr("n_pairs * sxx - sx * sx = 0 OR n_pairs * syy - sy * sy = 0"),
          lit(-2000000L))
          .otherwise(expr(
            """CAST(round(1e6 * CAST(n_pairs * sxy - sx * sy AS DOUBLE)
              |  / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
              |    * CAST(n_pairs * syy - sy * sy AS DOUBLE))) AS BIGINT)""".stripMargin))
          .as("acf_micro"))
  }

  /** Signed permutation expansion of a k×k determinant as a SQL
    * expression string over pre-cast integer entry columns — shared by
    * the Spark build AND the DuckDB oracle generator (both engines then
    * run the SAME exact-integer arithmetic; sums of exact decimals are
    * order-independent, so nothing depends on evaluation order). k ≤ 5
    * keeps the 120-term expansion within decimal(38,0)/HUGEINT bounds
    * for micro-scaled entries (≤ 120·(10⁶)⁵ ≈ 1.2·10³²).
    */
  private[graft] def detExpansion(k: Int, entry: (Int, Int) => String): String = {
    val terms = (0 until k).toList.permutations.map { p =>
      val inv = (for {
        i <- 0 until k; j <- i + 1 until k if p(i) > p(j)
      } yield 1).sum
      val prod = (0 until k).map(i => entry(i, p(i))).mkString(" * ")
      if (inv % 2 == 0) s"($prod)" else s"(- ($prod))"
    }.toSeq
    // chunked, parenthesized sums: a flat 120-term left-associated chain
    // exceeds DuckDB's 128-deep binder limit; balancing is free because
    // the sums are exact integers (order-independent)
    terms.grouped(8).map(_.mkString("(", " + ", ")")).mkString(" + ")
  }

  /** PARTIAL AUTOCORRELATION FUNCTION of each group's daily series at
    * lags 1..`maxLag` — the AR-order picker that completes the q227 ACF
    * (an AR(p) process cuts off in PACF after lag p; ACF alone cannot
    * separate AR from MA structure). Computed EXACTLY by Cramer's rule
    * on the Yule–Walker Toeplitz system: with ρ in integer micro,
    *
    *   φ_kk = det(R_k with last column → (ρ₁..ρ_k)) / det(R_k),
    *
    * both determinants are exact integers (the micro scaling cancels:
    * each is homogeneous of degree k), so the ONLY float operation is
    * the final ratio — one correctly-rounded f64 divide per lag rounded
    * to micro (the q227 convention). This sidesteps the Durbin–Levinson
    * recursion's chained divisions, which would compound cross-engine
    * 1-ulp drift. −2·10⁶ sentinel on a singular R_k (e.g. a perfectly
    * periodic series); lags whose ACF prerequisites don't exist (series
    * shorter than the lag) emit no row. `maxLag` ≤ 5: the 120-term
    * expansion bound keeps k! ·(10⁶)^k inside decimal(38,0).
    *
    * Scale shape: everything after [[acfFromDaily]]'s calendar-bounded
    * passes is a |groups|-row pivot and per-row literal arithmetic —
    * the determinant expansions are one projection, no joins, no
    * windows.
    */
  def pacf(
      events: DataFrame, tsCol: String, valueCol: String, groupCol: String,
      maxLag: Int = 5): DataFrame =
    pacfFromAcf(
      acfFromDaily(dailyStats(events, tsCol, valueCol, groupCol), maxLag),
      maxLag)

  /** [[pacf]] over a prepared [[acfFromDaily]] frame. */
  def pacfFromAcf(acfDf: DataFrame, maxLag: Int = 5): DataFrame = {
    require(maxLag >= 1 && maxLag <= 5,
      "pacf: maxLag in [1, 5] (exact-determinant bound)")
    val aggs = (1 to maxLag).map(l =>
      max(when(col("lag") === l, col("acf_micro"))).as(s"r$l"))
    var piv = acfDf.groupBy(col("grp")).agg(aggs.head, aggs.tail: _*)
      .withColumn("r0", lit(1000000L))
    (0 to maxLag).foreach { j =>
      piv = piv.withColumn(s"d$j", col(s"r$j").cast("decimal(38,0)"))
    }
    val pacfCols = (1 to maxLag).map { k =>
      val den = detExpansion(k, (i, j) => s"d${math.abs(i - j)}")
      val num = detExpansion(k,
        (i, j) => if (j == k - 1) s"d${i + 1}" else s"d${math.abs(i - j)}")
      // a constant series reaches here as acfFromDaily's -2·10⁶
      // OUT-OF-RANGE sentinel (deliberately distinct from a legitimate
      // ρ = -1); feeding it into the determinants would yield
      // plausible-looking but meaningless PACF values, so any sentinel
      // ACF among r₁..r_k propagates as the same -2·10⁶ sentinel here.
      // NULL r (series shorter than the lag) still falls through to a
      // NULL ratio → row dropped, as documented.
      val sentinel = (1 to k).map(l => s"r$l = -2000000").mkString(" OR ")
      expr(
        s"""CASE WHEN $sentinel THEN CAST(-2000000 AS BIGINT)
           | WHEN ($den) = 0 THEN CAST(-2000000 AS BIGINT)
           | ELSE CAST(round(1e6 * CAST(($num) AS DOUBLE)
           |   / CAST(($den) AS DOUBLE)) AS BIGINT) END""".stripMargin)
        .as(s"p$k")
    }
    piv.select(col("grp") +: pacfCols: _*)
      .select(col("grp"), expr(
        s"stack($maxLag, " +
          (1 to maxLag).map(k => s"$k, p$k").mkString(", ") +
          ") AS (lag, pacf_micro)"))
      .filter(col("pacf_micro").isNotNull)
  }

  // χ²(df, 0.95) critical values in micro for the Ljung-Box verdict —
  // exact-to-6dp literals, the q119 fixed-constant convention
  private val Chi2Crit95Micro: Map[Int, Long] = Map(
    1 -> 3841459L, 2 -> 5991465L, 3 -> 7814728L, 4 -> 9487729L,
    5 -> 11070498L, 6 -> 12591587L, 7 -> 14067140L)

  /** LJUNG–BOX PORTMANTEAU whiteness test of each group's daily series —
    * the one-number "is there ANY autocorrelation left" verdict that
    * completes the q227 ACF / q242 PACF family (ACF shows where the
    * structure is; Ljung-Box decides whether the whole lag window is
    * jointly distinguishable from white noise, the residual check run
    * after a forecast model fits):
    *
    *   Q = n(n+2) Σ_{k≤maxLag} ρ_k² / (n − k)
    *
    * computed from the ACF's exact micro correlations with a DEFINED
    * integer evaluation order (each term `ρ_micro_k² DIV n_pairs_k`
    * truncates before the sum; the n(n+2) product and final 10⁶ descale
    * run in decimal(38,0)), so both engines produce the identical
    * q_micro. `white_95 = 1` iff q_micro < χ²(maxLag, 0.95) — an integer
    * compare against a fixed micro literal, never a float straddle.
    *
    * Groups whose series is too short for every lag in the window emit
    * no row (the PACF convention); a group with any constant-margin
    * sentinel ACF (−2·10⁶) emits the −2·10⁶ q_micro sentinel with
    * `white_95 = −1`.
    *
    * Scale shape: [[acfFromDaily]]'s calendar-bounded passes, then a
    * |groups|-row pivot and per-row literal arithmetic — no joins, no
    * windows after the ACF.
    */
  def ljungBox(
      events: DataFrame, tsCol: String, valueCol: String, groupCol: String,
      maxLag: Int = 5): DataFrame =
    ljungBoxFromAcf(
      acfFromDaily(dailyStats(events, tsCol, valueCol, groupCol), maxLag),
      maxLag)

  /** [[ljungBox]] over a prepared [[acfFromDaily]] frame. */
  def ljungBoxFromAcf(acfDf: DataFrame, maxLag: Int = 5): DataFrame = {
    require(maxLag >= 1 && maxLag <= 7,
      "ljungBox: maxLag in [1, 7] (critical-value table bound)")
    val crit = Chi2Crit95Micro(maxLag)
    val aggs = (1 to maxLag).flatMap(l => Seq(
      max(when(col("lag") === l, col("acf_micro"))).as(s"r$l"),
      max(when(col("lag") === l, col("n_pairs"))).as(s"np$l")))
    val piv = acfDf.groupBy(col("grp")).agg(aggs.head, aggs.tail: _*)
      // every lag in the window must exist (n_pairs ≥ 1 by construction)
      .filter((1 to maxLag).map(l => col(s"np$l").isNotNull).reduce(_ && _))
      .withColumn("n_days", col("np1") + lit(1L))
    val sentinel = (1 to maxLag).map(l => s"r$l = -2000000").mkString(" OR ")
    val termSum = (1 to maxLag)
      .map(l => s"(CAST(r$l AS DECIMAL(38,0)) * r$l) DIV np$l")
      .mkString(" + ")
    // double pre-check (the rankSumFromCounts guard): |acf_micro| ≤ 10^6 so
    // each term ≤ 10^12/np — the n·(n+2)·Σ product must fit decimal(38,0);
    // raise a NAMED error instead of the generic ANSI decimal overflow
    // (calendar-bounded n_days makes this unreachable in practice, but the
    // guard keeps the failure mode uniform across the rank-test family)
    val termSumD = (1 to maxLag)
      .map(l => s"(CAST(r$l AS DOUBLE) * r$l / np$l)")
      .mkString(" + ")
    piv.select(col("grp"), col("n_days"),
        expr(
          s"""CASE WHEN $sentinel THEN CAST(-2000000 AS BIGINT)
             | WHEN CAST(n_days AS DOUBLE) * (n_days + 2) * ($termSumD) >= 5e37
             |   THEN raise_error(concat(
             |     'ljungBox: statistic numerator would overflow ',
             |     'decimal(38,0) at n_days = ', CAST(n_days AS STRING),
             |     ' — shrink the window or rescale'))
             | ELSE CAST((CAST(n_days AS DECIMAL(38,0)) * (n_days + 2)
             |   * ($termSum)) DIV 1000000 AS BIGINT) END""".stripMargin)
          .as("q_micro"))
      .withColumn("white_95",
        when(col("q_micro") === -2000000L, lit(-1L))
          .otherwise((col("q_micro") < lit(crit)).cast("bigint")))
  }

  /** [[stlDecompose]] over a prepared [[dailyStats]] frame. */
  def stlDecomposeFromDaily(daily: DataFrame): DataFrame = {
    val wTrend = Window.partitionBy(col("grp")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val t2 = daily
      .withColumn("tsum", sum(col("dm")).over(wTrend))
      .withColumn("tcnt", count(lit(1)).over(wTrend))
      .withColumn("trend", expr("tsum DIV tcnt"))
      .withColumn("dow",
        (weekday(to_date(col("day"))) + lit(1)).cast("int"))
      .withColumn("det", col("dm") - col("trend"))
    val seasonal = t2.groupBy(col("grp"), col("dow"))
      .agg(expr("sum(det) DIV count(1)").as("seasonal"))
    t2.join(seasonal, Seq("grp", "dow"))
      .select(col("grp"), col("day"), col("dm").as("dm_micro"),
        col("trend").as("trend_micro"), col("dow"),
        col("seasonal").as("seasonal_micro"),
        (col("dm") - col("trend") - col("seasonal")).as("residual_micro"))
  }

  /** SEASONALITY / TREND STRENGTH of each group's daily series
    * (Hyndman–Athanasopoulos): from the [[stlDecompose]] components,
    *
    *   F_seasonal = max(0, 1 − Var(R)/Var(S+R)),
    *   F_trend    = max(0, 1 − Var(R)/Var(T+R)),
    *
    * in exact ppm — the one-number answers to "should Holt-Winters
    * carry a seasonal term (q210)?" and "is the q231 trend worth
    * modeling?". Because S+R = x − T and T+R = x − S hold EXACTLY per
    * row (the q224 additive identity), both comparison series are exact
    * integer micro columns of the decomposition.
    *
    * Exactness: the variance RATIO shares the common n, so it reduces
    * to a ratio of the integer moment combinations n·Σq² − (Σq)²
    * (decimal-routed, Cauchy–Schwarz keeps them ≥ 0) — ONE toward-zero
    * division per strength, no floats; −1 sentinel when the comparison
    * variance is 0 (constant series).
    *
    * Scale shape: the STL passes (calendar-bounded, group-partitioned)
    * plus one moment aggregation per group — nothing global.
    */
  def seasonalStrength(
      events: DataFrame, tsCol: String, valueCol: String,
      groupCol: String): DataFrame =
    seasonalStrengthFromDaily(dailyStats(events, tsCol, valueCol, groupCol))

  /** [[seasonalStrength]] over a prepared [[dailyStats]] frame. */
  def seasonalStrengthFromDaily(daily: DataFrame): DataFrame = {
    val d = (c: Column) => c.cast("decimal(38,0)")
    stlDecomposeFromDaily(daily)
      .select(col("grp"), col("residual_micro").as("r"),
        (col("dm_micro") - col("trend_micro")).as("qs"),
        (col("dm_micro") - col("seasonal_micro")).as("qt"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_days"),
        sum(d(col("r"))).as("sr"), sum(d(col("r")) * d(col("r"))).as("srr"),
        sum(d(col("qs"))).as("sqs"),
        sum(d(col("qs")) * d(col("qs"))).as("sqss"),
        sum(d(col("qt"))).as("sqt"),
        sum(d(col("qt")) * d(col("qt"))).as("sqtt"))
      .select(col("grp"), col("n_days"),
        when(expr("n_days * sqss - sqs * sqs = 0"), lit(-1L))
          .otherwise(greatest(lit(0L), expr(
            """CAST(1000000 - (CAST(1000000 AS DECIMAL(38,0))
              |  * (n_days * srr - sr * sr))
              |  DIV (n_days * sqss - sqs * sqs) AS BIGINT)""".stripMargin)))
          .as("seasonal_strength_ppm"),
        when(expr("n_days * sqtt - sqt * sqt = 0"), lit(-1L))
          .otherwise(greatest(lit(0L), expr(
            """CAST(1000000 - (CAST(1000000 AS DECIMAL(38,0))
              |  * (n_days * srr - sr * sr))
              |  DIV (n_days * sqtt - sqt * sqt) AS BIGINT)""".stripMargin)))
          .as("trend_strength_ppm"))
  }

  /** BINARY-SEGMENTATION multi-changepoint detection over each group's
    * daily series — the multi-shift extension of [[cusumChangepoint]]
    * (which finds exactly one): `maxSplits` greedy rounds, each
    * splitting AT MOST ONE segment per group — the one whose
    * within-segment CUSUM peak is largest — at that peak. The decision
    * statistic is exact integer micro: with cumulative event sums cs/cc
    * and segment totals ts/tc (event-weighted, the q216 convention),
    *
    *   stat_k = |tc·cs_k − cc_k·ts| DIV tc   (the raw CUSUM in micro),
    *
    * candidates exclude the segment's last day (both sides stay
    * nonempty) and zero-stat peaks (constant segments never split);
    * ties break earliest day, then segment label. Returns one row per
    * final segment: `(grp, seg_start, seg_end, n_days, n_events,
    * mean_micro)`.
    *
    * Exactness: decimal(38,0)-routed products, one toward-zero DIV per
    * candidate; picks are min(struct) argmaxes — no floats anywhere.
    *
    * Scale shape: the event stream collapses once ([[dailyStats]]);
    * each round is calendar-bounded windows partitioned by (group,
    * segment), a group-keyed argmax aggregation, and one equi-join of
    * the picks back — `maxSplits` bounded rounds, each Materialize.checkpoint-pinned
    * (the q120/q218 loop-invariant pattern) so plans don't nest.
    */
  def binarySegmentation(
      events: DataFrame, tsCol: String, valueCol: String,
      groupCol: String, maxSplits: Int = 2): DataFrame =
    binarySegmentationFromDaily(
      dailyStats(events, tsCol, valueCol, groupCol), maxSplits)

  /** [[binarySegmentation]] over a prepared [[dailyStats]] frame. */
  def binarySegmentationFromDaily(
      daily: DataFrame, maxSplits: Int = 2): DataFrame = {
    require(maxSplits >= 1 && maxSplits <= 8,
      "binarySegmentation: maxSplits in [1, 8]")
    var cur = daily.select(col("grp"), col("day"), col("ds"), col("dc"))
      .withColumn("seg", lit("r"))
    for (_ <- 1 to maxSplits) {
      val w = Window.partitionBy(col("grp"), col("seg")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wa = Window.partitionBy(col("grp"), col("seg"))
      val picks = cur
        .withColumn("cs", sum(col("ds")).over(w))
        .withColumn("cc", sum(col("dc")).over(w))
        .withColumn("ts", sum(col("ds")).over(wa))
        .withColumn("tc", sum(col("dc")).over(wa))
        .filter(col("cc") < col("tc"))
        .withColumn("stat", expr(
          """CAST(abs(CAST(tc AS DECIMAL(38,0)) * cs
            |  - CAST(cc AS DECIMAL(38,0)) * ts) DIV tc AS BIGINT)"""
            .stripMargin))
        .filter(col("stat") > 0L)
        .groupBy(col("grp"))
        .agg(min(struct(negate(col("stat")).as("ns"),
          col("day").as("pday"), col("seg").as("pseg"))).as("pk"))
        .select(col("grp").as("pgrp"), col("pk.pday").as("pday"),
          col("pk.pseg").as("pseg"))
      cur = cur
        .join(picks,
          col("grp") === col("pgrp") && col("seg") === col("pseg"), "left")
        .withColumn("seg",
          when(col("pday").isNotNull && col("day") > col("pday"),
            col("pday")).otherwise(col("seg")))
        .select(col("grp"), col("day"), col("ds"), col("dc"), col("seg"))
        .materialize
    }
    cur.groupBy(col("grp"), col("seg"))
      .agg(min(col("day")).as("seg_start"), max(col("day")).as("seg_end"),
        count(lit(1)).as("n_days"), sum(col("dc")).as("n_events"),
        expr("sum(ds) DIV sum(dc)").as("mean_micro"))
      .select(col("grp"), col("seg_start"), col("seg_end"),
        col("n_days"), col("n_events"), col("mean_micro"))
  }

  /** SEASONAL-NAIVE FORECAST BACKTEST (MASE) of each group's daily
    * series — before wiring a real forecaster, measure whether the
    * m-day seasonal-naive predictor (ŷ_d = y_{d−m}, default weekly) even
    * beats the 1-step naive (ŷ_d = y_{d−1}) on this metric; the MASE
    * convention (Hyndman–Koehler) scales the seasonal model's error by
    * the naive error so the ratio is unit-free:
    *
    *   mase_ppm = (10⁶ · Σ|y − y_{−m}|) DIV Σ|y − y_{−1}|
    *
    * over evaluation rows where the lag-m value exists (row lags over
    * the day-ordered series, the q227 acf convention). < 10⁶ says the
    * seasonal structure is real (use it as the forecast baseline /
    * Holt-Winters sanity floor, q210); −1 sentinel when the naive error
    * sums to zero (constant eval span). Groups too short to evaluate
    * emit `n_eval = 0` with sentinels instead of vanishing (the q⁠-
    * conformal every-group-emits-a-row convention).
    *
    * Exactness: daily means are exact micro longs, absolute errors sum
    * exactly, both MAEs and the ratio are single toward-zero integer
    * divisions.
    *
    * Scale shape: the event stream collapses in ONE aggregation
    * ([[dailyStats]]); the lag window and the per-group reduction are
    * calendar-bounded and group-partitioned — nothing global.
    */
  def forecastBacktest(
      events: DataFrame, tsCol: String, valueCol: String,
      groupCol: String, seasonLag: Int = 7): DataFrame =
    forecastBacktestFromDaily(
      dailyStats(events, tsCol, valueCol, groupCol), seasonLag)

  /** [[forecastBacktest]] over a prepared [[dailyStats]] frame. */
  def forecastBacktestFromDaily(
      daily: DataFrame, seasonLag: Int = 7): DataFrame = {
    require(seasonLag >= 2 && seasonLag <= 366,
      "forecastBacktest: seasonLag in [2, 366]")
    val wd = Window.partitionBy(col("grp")).orderBy(col("day"))
    val lagged = daily
      .withColumn("lm", lag(col("dm"), seasonLag).over(wd))
      .withColumn("l1", lag(col("dm"), 1).over(wd))
      .filter(col("lm").isNotNull)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("dm") - col("lm"))).as("se_model"),
        sum(abs(col("dm") - col("l1"))).as("se_naive"))
    daily.groupBy(col("grp")).agg(count(lit(1)).as("n_days"))
      .join(lagged, Seq("grp"), "left")
      .select(col("grp"), col("n_days"),
        coalesce(col("n_eval"), lit(0L)).as("n_eval"),
        when(coalesce(col("n_eval"), lit(0L)) === 0L, lit(-1L))
          .otherwise(expr("se_model DIV n_eval")).as("mae_model_micro"),
        when(coalesce(col("n_eval"), lit(0L)) === 0L, lit(-1L))
          .otherwise(expr("se_naive DIV n_eval")).as("mae_naive_micro"),
        when(coalesce(col("n_eval"), lit(0L)) === 0L ||
            col("se_naive") === 0L, lit(-1L))
          .otherwise(expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * se_model" +
              " DIV se_naive AS BIGINT)"))
          .as("mase_ppm"))
  }

  /** MANN-KENDALL trend test + THEIL-SEN slope of each group's daily
    * series — the nonparametric "is this metric drifting?" monitor that
    * complements [[cusumChangepoint]] (abrupt shift) with monotone-trend
    * detection, robust to outliers and to any monotone transform of the
    * values. Per group:
    *
    *   - `s_stat`  = Σ_{i<j} sign(x_j − x_i) over all day pairs (exact),
    *   - `var_num` = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) over tied-value
    *     blocks (18·Var(S), exact integer),
    *   - `z_micro` = round(10⁶·(S∓1)/sqrt(var_num/18)) with the standard
    *     continuity correction toward zero (ONE f64 divide+sqrt at the
    *     very end, the q227 acf convention); −2·10⁶ sentinel when
    *     `var_num = 0` (constant series or n < 2),
    *   - `sen_slope_nano` = median pairwise slope in NANO-units/day —
    *     each pair's `(1000·(x_j − x_i)) DIV Δdays` truncates toward
    *     zero identically in both engines; the median is the lower
    *     median (rank `(n_pairs+1) DIV 2`), deterministic under ties
    *     because equal slopes are interchangeable,
    *   - `trend` = 'inc' / 'dec' when |z| ≥ 1.959964 (5% two-sided),
    *     'none' otherwise, 'flat' for a constant multi-day series,
    *     'insufficient' for single-day groups.
    *
    * Exactness: sign counts, tie blocks, and pair slopes are exact
    * integers; only the final z divide+sqrt touches f64 (identical
    * operands ⇒ identical correctly-rounded result in both engines).
    *
    * Scale shape: the event stream collapses to (group, day) in the ONE
    * data-scaled aggregation ([[dailyStats]], map-side combined); the
    * pair self-join, tie counts, and the slope-median window are all
    * calendar-bounded (n days per group ⇒ ≤ n²/2 pairs, n ≤ corpus span
    * in days) and partitioned by group — nothing global, nothing
    * driver-side.
    */
  def mannKendall(
      events: DataFrame, tsCol: String, valueCol: String,
      groupCol: String): DataFrame =
    mannKendallFromDaily(dailyStats(events, tsCol, valueCol, groupCol))

  /** [[mannKendall]] over a prepared [[dailyStats]] frame. */
  def mannKendallFromDaily(daily: DataFrame): DataFrame = {
    val d = daily.select(col("grp"), col("day"), col("dm"))
    val pairs = d.alias("a")
      .join(d.alias("b"), expr("a.grp = b.grp AND a.day < b.day"))
      .select(col("a.grp").as("grp"),
        (col("b.dm") - col("a.dm")).as("diff"),
        datediff(to_date(col("b.day")), to_date(col("a.day"))).as("dt"))
      .withColumn("sgn", signum(col("diff")).cast("bigint"))
      .withColumn("slope_nano", expr("(1000 * diff) DIV dt"))
    val wRank = Window.partitionBy(col("grp")).orderBy(col("slope_nano"))
    val wGrp = Window.partitionBy(col("grp"))
    val sen = pairs
      .withColumn("rn", row_number().over(wRank))
      .withColumn("np", count(lit(1)).over(wGrp))
      .filter(expr("rn = (np + 1) DIV 2"))
      .select(col("grp"), col("slope_nano").as("sen_slope_nano"),
        col("np").as("n_pairs"))
    val sStat = pairs.groupBy(col("grp"))
      .agg(sum(col("sgn")).as("s_stat"))
    val nDays = d.groupBy(col("grp")).agg(count(lit(1)).as("n_days"))
    val ties = d.groupBy(col("grp"), col("dm")).agg(count(lit(1)).as("t"))
      .groupBy(col("grp"))
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_term"))
    nDays
      .join(ties, Seq("grp"))
      .join(sStat, Seq("grp"), "left")
      .join(sen, Seq("grp"), "left")
      .select(col("grp"), col("n_days"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("s_stat"), lit(0L)).as("s_stat"),
        expr("n_days * (n_days - 1) * (2 * n_days + 5) - tie_term")
          .as("var_num"),
        coalesce(col("sen_slope_nano"), lit(0L)).as("sen_slope_nano"))
      .withColumn("z_micro",
        when(col("var_num") <= 0, lit(-2000000L))
          .otherwise(expr(
            """CAST(round(1e6 * (s_stat - CAST(sign(s_stat) AS BIGINT))
              |  / sqrt(var_num / 18.0)) AS BIGINT)""".stripMargin)))
      .withColumn("trend",
        when(col("n_days") < 2, lit("insufficient"))
          .when(col("var_num") <= 0, lit("flat"))
          .when(col("z_micro") >= 1959964L, lit("inc"))
          .when(col("z_micro") <= -1959964L, lit("dec"))
          .otherwise(lit("none")))
  }
}

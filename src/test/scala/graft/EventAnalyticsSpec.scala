package graft

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

/** Ground-truth pins for funnel ordering/window semantics and the exact
  * integer z-score test (hand-computed cases; determinism under
  * repartitioning).
  */
class EventAnalyticsSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("u", "et", "tsu")

  test("funnel: completed chain in order within the window") {
    val got = EventAnalytics.funnel(
      ev((1L, "a", 100L), (1L, "b", 200L), (1L, "c", 300L)),
      "u", "et", "tsu", Seq("a", "b", "c"), windowMicros = 1000L).collect().head
    assert(got.getAs[Long]("n_steps") === 3L)
    assert(got.getAs[Long]("converted") === 1L)
    assert(got.getAs[Long]("dwell_us") === 200L)
  }

  test("funnel: out-of-order steps do not count (b before a breaks the chain)") {
    val got = EventAnalytics.funnel(
      ev((1L, "b", 50L), (1L, "a", 100L), (1L, "c", 300L)),
      "u", "et", "tsu", Seq("a", "b", "c"), windowMicros = 1000L).collect().head
    // the only 'b' precedes 'a': chain stops at step 1
    assert(got.getAs[Long]("n_steps") === 1L)
    assert(got.getAs[Long]("converted") === 0L)
    assert(got.isNullAt(got.fieldIndex("dwell_us")))
  }

  test("funnel: a later in-order occurrence rescues the chain") {
    val got = EventAnalytics.funnel(
      ev((1L, "b", 50L), (1L, "a", 100L), (1L, "b", 150L), (1L, "c", 300L)),
      "u", "et", "tsu", Seq("a", "b", "c"), windowMicros = 1000L).collect().head
    assert(got.getAs[Long]("n_steps") === 3L)
    assert(got.getAs[Long]("t1_us") === 150L)
  }

  test("funnel: window cutoff is measured from the FIRST step, inclusive") {
    val in = EventAnalytics.funnel(
      ev((1L, "a", 100L), (1L, "b", 1100L)),
      "u", "et", "tsu", Seq("a", "b"), windowMicros = 1000L).collect().head
    assert(in.getAs[Long]("n_steps") === 2L, "t0 + window is inclusive")
    val out = EventAnalytics.funnel(
      ev((1L, "a", 100L), (1L, "b", 1101L)),
      "u", "et", "tsu", Seq("a", "b"), windowMicros = 1000L).collect().head
    assert(out.getAs[Long]("n_steps") === 1L)
  }

  test("funnel generalizes past 3 steps: 4-step chain with a mid-chain break") {
    val got = EventAnalytics.funnel(
      ev((1L, "a", 100L), (1L, "b", 200L), (1L, "d", 300L), // no 'c' -> stops at 2
        (2L, "a", 10L), (2L, "b", 20L), (2L, "c", 30L), (2L, "d", 40L)),
      "u", "et", "tsu", Seq("a", "b", "c", "d"), windowMicros = 1000L)
      .collect().map(r => r.getAs[Long]("user") ->
        ((r.getAs[Long]("n_steps"), r.getAs[Long]("converted")))).toMap
    assert(got(1L) === ((2L, 0L)), "missing step 3 stops the chain even though step 4 occurred")
    assert(got(2L) === ((4L, 1L)))
  }

  test("funnel: users that never reach step 0 emit no row") {
    val got = EventAnalytics.funnel(
      ev((1L, "b", 50L), (2L, "a", 10L)),
      "u", "et", "tsu", Seq("a", "b"), windowMicros = 1000L)
    assert(got.select("user").as[Long].collect().toSeq === Seq(2L))
  }

  test("rollingCounts: trailing range excludes self, honors the time bound") {
    val d = Seq((1L, 1L, 100L, 1.0), (2L, 1L, 200L, 2.0), (3L, 1L, 1100L, 3.0),
        (4L, 2L, 150L, 9.0))
      .toDF("id", "u", "tsu", "v")
    val got = EventAnalytics.rollingCounts(d, "u", "tsu", "v", "id", lookbackMicros = 1000L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("prev_n"), r.getAs[Long]("prev_sum_micro")))).toMap
    assert(got(1L) === ((0L, 0L)), "first event has no history")
    assert(got(2L) === ((1L, 1000000L)), "sees only the event 100us earlier")
    assert(got(3L) === ((2L, 3000000L)), "frame [100, 1099] spans both priors")
    assert(got(4L) === ((0L, 0L)), "other users' events are invisible")
  }

  test("sessionize: strict gap threshold, per-user numbering") {
    val d = Seq((1L, 1L, 100L), (2L, 1L, 1100L), (3L, 1L, 2101L), (4L, 1L, 9000L),
        (5L, 2L, 50L))
      .toDF("id", "u", "tsu")
    val got = EventAnalytics.sessionize(d, "u", "tsu", "id", gapMicros = 1000L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("session_idx")).toMap
    assert(got(1L) === 1L)
    assert(got(2L) === 1L, "gap == gapMicros exactly stays in-session (strict >)")
    assert(got(3L) === 2L, "gap of 1001 > 1000 starts session 2")
    assert(got(4L) === 3L)
    assert(got(5L) === 1L, "each user numbers from 1")
  }

  test("rollingCounts and sessionize are deterministic under repartitioning") {
    val d = Tables.events(spark, sfDir).withColumn("tsu", unix_micros(col("ts")))
    val r1 = EventAnalytics.rollingCounts(d, "user_id", "tsu", "value", "event_id", 3600000000L)
    val r2 = EventAnalytics.rollingCounts(d.repartition(13), "user_id", "tsu", "value", "event_id", 3600000000L)
    assert(r1.except(r2).count() === 0 && r2.except(r1).count() === 0)
    val s1 = EventAnalytics.sessionize(d, "user_id", "tsu", "event_id", 3600000000L)
    val s2 = EventAnalytics.sessionize(d.repartition(13), "user_id", "tsu", "event_id", 3600000000L)
    assert(s1.except(s2).count() === 0 && s2.except(s1).count() === 0)
  }

  test("zscoreOutliers flags exactly the hand-computed outlier") {
    // group g: values 1,1,1,1,16 -> mean 4, var (9+9+9+9+144)/5 = 36, sd 6
    // z(16) = 2 -> NOT an outlier at z=3; at z=1 it is, the 1s are not
    val d = Seq((1L, "g", 1.0), (2L, "g", 1.0), (3L, "g", 1.0), (4L, "g", 1.0), (5L, "g", 16.0))
      .toDF("id", "grp", "v")
    val z3 = EventAnalytics.zscoreOutliers(d, "grp", "v", "id", z = 3)
      .filter(col("is_outlier") === 1).count()
    assert(z3 === 0L)
    val z1 = EventAnalytics.zscoreOutliers(d, "grp", "v", "id", z = 1)
      .filter(col("is_outlier") === 1)
      .select("id").as[Long].collect().toSet
    assert(z1 === Set(5L), "only the 16 is beyond 1 sd (|1-4|=3 < 6)")
  }

  test("zscoreOutliers: strict inequality at the exact boundary") {
    // values 0,0,8,8: mean 4, var 16, sd 4 -> |x-mean| = 4 = 1*sd exactly:
    // strict > means nothing flags at z=1
    val d = Seq((1L, "g", 0.0), (2L, "g", 0.0), (3L, "g", 8.0), (4L, "g", 8.0))
      .toDF("id", "grp", "v")
    val n = EventAnalytics.zscoreOutliers(d, "grp", "v", "id", z = 1)
      .filter(col("is_outlier") === 1).count()
    assert(n === 0L)
  }

  test("zscoreOutliers: values outside the micro-quantization window fail HARD, never wrap") {
    // |v| * 1e6 beyond Long range: ANSI cast overflow is a hard error —
    // the scaladoc's "breach is a hard error, not a silent wrap" contract
    val d = Seq((1L, "g", 1e15), (2L, "g", 2e15), (3L, "g", 3e15))
      .toDF("id", "grp", "v")
    val e = intercept[Exception] {
      EventAnalytics.zscoreOutliers(d, "grp", "v", "id").collect()
    }
    assert(e.getMessage.contains("OVERFLOW") || e.getMessage.contains("overflow"))
  }

  test("zscoreOutliers is exact under repartitioning (no float accumulation order)") {
    val d = Tables.events(spark, sfDir)
    val a = EventAnalytics.zscoreOutliers(d, "event_type", "value", "event_id")
    val b = EventAnalytics.zscoreOutliers(d.repartition(13), "event_type", "value", "event_id")
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  // ------------------------------------------------------ retentionCohorts

  private val day = 86400000000L

  test("retentionCohorts: hand-computed matrix, bps, and same-day collapse") {
    // u1 cohort day0, back on days 1 and 3 (day-1 twice: must collapse);
    // u2 cohort day0 only; u3 cohort day1, back on day2
    val e = Seq(
      (1L, 0L), (1L, day + 5L), (1L, day + 9L), (1L, 3 * day),
      (2L, 100L),
      (3L, day), (3L, 2 * day + 1L)).toDF("u", "tsu")
    val got = EventAnalytics.retentionCohorts(e, "u", "tsu")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      (0L, 0L) -> ((2L, 2L, 10000L)),
      (0L, 1L) -> ((1L, 2L, 5000L)),
      (0L, 3L) -> ((1L, 2L, 5000L)),
      (1L, 0L) -> ((1L, 1L, 10000L)),
      (1L, 1L) -> ((1L, 1L, 10000L))))
  }

  // -------------------------------------------------- attributeConversions

  private def att(rows: (Long, String, Long, Long, Double)*) =
    rows.toSeq.toDF("u", "et", "tsu", "id", "v")

  test("attribution: linear split is remainder-exact, first/last to the right touches") {
    // touches A(t=10) B(t=20) A(t=30), conversion v=10.0 at t=40:
    // vm=10_000_000, n=3 -> 3_333_333 each + remainder 1 to the first
    val got = EventAnalytics.attributeConversions(
        att((1L, "A", 10L, 1L, 0.0), (1L, "B", 20L, 2L, 0.0),
          (1L, "A", 30L, 3L, 0.0), (1L, "buy", 40L, 4L, 10.0)),
        "u", "et", "tsu", "id", "v", Seq("A", "B"), "buy", windowMicros = 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === Map(
      // A: first touch (credit 10M) AND last touch (10M); linear 3_333_334 + 3_333_333
      "A" -> ((2L, 1L, 10000000L, 10000000L, 6666667L)),
      "B" -> ((1L, 1L, 0L, 0L, 3333333L))))
    assert(got.values.map(_._5).sum === 10000000L, "linear conserves value exactly")
    // U-shape: ends (both A) 4M each, middle B gets the exact 2M budget
    val pos = EventAnalytics.attributeConversions(
        att((1L, "A", 10L, 1L, 0.0), (1L, "B", 20L, 2L, 0.0),
          (1L, "A", 30L, 3L, 0.0), (1L, "buy", 40L, 4L, 10.0)),
        "u", "et", "tsu", "id", "v", Seq("A", "B"), "buy", windowMicros = 100L)
      .collect().map(r => r.getString(0) -> r.getLong(6)).toMap
    assert(pos === Map("A" -> 8000000L, "B" -> 2000000L))
  }

  test("attribution: touchless conversion credits 'direct' fully in all models") {
    val got = EventAnalytics.attributeConversions(
        att((1L, "buy", 40L, 4L, 2.5)),
        "u", "et", "tsu", "id", "v", Seq("A"), "buy", windowMicros = 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === Map("direct" -> ((0L, 2500000L, 2500000L, 2500000L))))
  }

  test("attribution: window excludes stale touches, includes the conversion instant") {
    val got = EventAnalytics.attributeConversions(
        att((1L, "A", 5L, 1L, 0.0),   // too old: 40 - 5 > 30
          (1L, "B", 40L, 2L, 0.0),    // at the conversion instant: counts
          (1L, "buy", 40L, 3L, 4.0)),
        "u", "et", "tsu", "id", "v", Seq("A", "B"), "buy", windowMicros = 30L)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(got === Map("B" -> 4000000L))
  }

  test("attribution: touches never cross users") {
    val got = EventAnalytics.attributeConversions(
        att((1L, "A", 10L, 1L, 0.0), (2L, "buy", 20L, 2L, 1.0)),
        "u", "et", "tsu", "id", "v", Seq("A"), "buy", windowMicros = 100L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got === Map("direct" -> 1000000L))
  }

  // ------------------------------------------------------------ madOutliers

  test("madOutliers: hand-computed median/MAD; robust where the mean is dragged") {
    // 1..9 plus 1000: med = 5 (10 values, rank-5), adm sorted has MAD = 2;
    // gate 10000*adm > 3*14826*2 = 88956 -> only the 1000 row flags
    val d = ((1L to 9L).map(i => (i, "g", i.toDouble)) :+ ((10L, "g", 1000.0)))
      .toDF("id", "grp", "v")
    val got = EventAnalytics.madOutliers(d, "grp", "v", "id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(1L) === ((5000000L, 2000000L, 0L)))
    assert(got(10L) === ((5000000L, 2000000L, 1L)))
    assert(got.count(_._2._3 == 1L) === 1)
  }

  test("madOutliers: MAD = 0 flags any deviation (degenerate majority)") {
    val d = Seq((1L, "g", 5.0), (2L, "g", 5.0), (3L, "g", 5.0), (4L, "g", 7.0))
      .toDF("id", "grp", "v")
    val got = EventAnalytics.madOutliers(d, "grp", "v", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("madOutliers is exact under repartitioning") {
    val d = Tables.events(spark, sfDir)
    val a = EventAnalytics.madOutliers(d, "event_type", "value", "event_id")
    val b = EventAnalytics.madOutliers(d.repartition(13), "event_type", "value", "event_id")
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("madOutliersBy: composite (type, hour) groups get independent baselines") {
    // group (g, 0): values 1,1,1 -> med 1, mad 0; group (g, 1): 100s
    val d = Seq(
      (1L, "g", 0L, 1.0), (2L, "g", 0L, 1.0), (3L, "g", 0L, 1.0),
      (4L, "g", 1L, 100.0), (5L, "g", 1L, 100.0), (6L, "g", 1L, 107.0))
      .toDF("id", "t", "h", "v")
    val got = EventAnalytics.madOutliersBy(d, Seq("t", "h"), "v", "id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // columns: id, t, h, value_micro, med_micro, mad_micro, is_outlier
    assert(got(1L) === ((1000000L, 1000000L, 0L, 0L)))
    // hour-1 baseline: med 100, mad 0 -> 107 flags, 100s do not; a single
    // global baseline would have flagged nothing in hour 0
    assert(got(4L) === ((100000000L, 100000000L, 0L, 0L)))
    assert(got(6L) === ((107000000L, 100000000L, 0L, 1L)))
  }

  // -------------------------------------------------------- transitionMatrix

  test("transitionMatrix: hand-computed counts and ppm; users never chain together") {
    // u1: A@1 B@2 A@3 C@4 -> A->B, B->A, A->C; u2: B@1 B@2 -> B->B
    val d = Seq(
      (1L, "A", 1L, 1L), (1L, "B", 2L, 2L), (1L, "A", 3L, 3L), (1L, "C", 4L, 4L),
      (2L, "B", 1L, 5L), (2L, "B", 2L, 6L)).toDF("u", "et", "tsu", "id")
    val got = EventAnalytics.transitionMatrix(d, "u", "et", "tsu", "id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      ("A", "B") -> ((1L, 2L, 500000L)),
      ("A", "C") -> ((1L, 2L, 500000L)),
      ("B", "A") -> ((1L, 2L, 500000L)),
      ("B", "B") -> ((1L, 2L, 500000L))))
  }

  test("transitionMatrix: equal timestamps order by id (deterministic)") {
    val d = Seq((1L, "A", 5L, 1L), (1L, "B", 5L, 2L), (1L, "C", 5L, 3L))
      .toDF("u", "et", "tsu", "id")
    val got = EventAnalytics.transitionMatrix(d, "u", "et", "tsu", "id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("A", "B"), ("B", "C")))
  }

  // ----------------------------------------------------------- sessionPaths

  test("sessionPaths: ordered by (ts, id), truncated at maxSteps, counted") {
    // session A: C(5) then A(10,id1) then B(10,id2) -> "C>A>B"
    // session B: same path; session D: 4 events truncated to 3
    val d = Seq(
      ("s1", "C", 5L, 1L), ("s1", "A", 10L, 2L), ("s1", "B", 10L, 3L),
      ("s2", "C", 1L, 4L), ("s2", "A", 2L, 5L), ("s2", "B", 3L, 6L),
      ("s3", "W", 1L, 7L), ("s3", "X", 2L, 8L), ("s3", "Y", 3L, 9L), ("s3", "Z", 4L, 10L))
      .toDF("s", "et", "tsu", "id")
    val got = EventAnalytics.sessionPaths(d, "s", "et", "tsu", "id", maxSteps = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("C>A>B" -> 2L, "W>X>Y" -> 1L))
  }

  // --------------------------------------------------------- rollingActives

  test("rollingActives: hand case — trailing window, gap days, today cap") {
    val dayUs = 86400000000L
    // u1 active day 0 and 3; u2 active day 0; window 3:
    // day 0: dau 2, w3 {u1,u2}=2; day 1: dau 0, w3 (from day 0) 2
    // day 2: dau 0, w3 2; day 3: dau 1, w3 {u1 (day3)} + nothing from day 0 = 1
    // days 4,5 cut by the max-day cap (max day = 3)
    val d = Seq((1L, 0L * dayUs + 5L), (1L, 3L * dayUs + 5L), (2L, 0L * dayUs + 9L))
      .toDF("u", "tsu")
    val got = EventAnalytics.rollingActives(d, "u", "tsu", windowDays = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(
      0L -> ((2L, 2L)), 1L -> ((0L, 2L)), 2L -> ((0L, 2L)), 3L -> ((1L, 1L))))
    assert(!got.contains(4L), "days past the last activity are cut")
    assert(got.forall { case (_, (dau, wau)) => wau >= dau })
  }

  // ------------------------------------------- session-tagged frame reuse

  test("persisted session-tagged frame feeds funnel AND attribution from cache") {
    // the pipeline_insight bench composition: sessionize once, persist,
    // and both consumers' physical plans must read the InMemoryRelation
    // instead of re-running the sessionize shuffle
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir).withColumn("tsu", unix_micros(col("ts")))
    val sess = EventAnalytics.sessionize(
      ev, "user_id", "tsu", "event_id", gapMicros = 6L * 3600L * 1000000L)
    val tagged = ev.select(col("event_id").as("id"), col("event_type"), col("value"))
      .join(sess, Seq("id"))
      .withColumn("skey", concat(col("user"), lit("#"), col("session_idx")))
      .persist()
    try {
      tagged.count()
      val fun = EventAnalytics.funnel(tagged, "skey", "event_type", "tsu",
        Seq("view", "click", "purchase"), 86400L * 1000000L)
      val att = EventAnalytics.attributeConversions(tagged, "skey",
        "event_type", "tsu", "id", "value",
        Seq("view", "click", "signup"), "purchase", 86400L * 1000000L)
      Seq("funnel" -> fun, "attribution" -> att).foreach { case (name, df) =>
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
          s"$name must consume the cached session-tagged frame, got:\n$plan")
        assert(df.count() > 0, s"$name produces rows on the corpus")
      }
    } finally tagged.unpersist(blocking = false)
  }

  test("kaplanMeier: hand-computed survival with censoring; the censored " +
      "user holds the risk set; all-convert floor reads surv 0") {
    def ts(h: Long) = new java.sql.Timestamp(h * 3600L * 1000L)
    // all view at hour 0; u1/u4 purchase at 1h, u2 at 2h, u3 censored
    // (only a click at 3h -> tmax)
    val rows = Seq(
      (1L, "view", 0L), (2L, "view", 0L), (3L, "view", 0L), (4L, "view", 0L),
      (1L, "purchase", 1L), (4L, "purchase", 1L), (2L, "purchase", 2L),
      (3L, "click", 3L))
      .zipWithIndex.map { case ((u, et, h), i) => (i.toLong, u, et, ts(h)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = EventAnalytics.kaplanMeier(rows, "user_id", "ts", "event_type",
        "view", "purchase", 3600000000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    // t=1: risk 4, events 2 -> S=1/2; t=2: risk 2 (u2 + censored u3),
    // events 1 -> S=1/4. exp(round(ln(.5)e6)/1e6) rounds to the exact ppm
    assert(got(1L) === ((4L, 2L, 500000L)))
    assert(got(2L) === ((2L, 1L, 250000L)))
    // every at-risk user converts at the last bucket -> the -46e6 floor
    val all = Seq((0L, 9L, "view", ts(0)), (1L, 9L, "purchase", ts(1)),
      (2L, 8L, "view", ts(0)), (3L, 8L, "purchase", ts(1)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val g2 = EventAnalytics.kaplanMeier(all, "user_id", "ts", "event_type",
        "view", "purchase", 3600000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(g2(1L) === 0L)
  }

  test("nelsonAalen: hand-computed cumulative hazard on the KM corpus, " +
      "exact integer steps, censored user holds the risk set") {
    def ts(h: Long) = new java.sql.Timestamp(h * 3600L * 1000L)
    val rows = Seq(
      (1L, "view", 0L), (2L, "view", 0L), (3L, "view", 0L), (4L, "view", 0L),
      (1L, "purchase", 1L), (4L, "purchase", 1L), (2L, "purchase", 2L),
      (3L, "click", 3L))
      .zipWithIndex.map { case ((u, et, h), i) => (i.toLong, u, et, ts(h)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = EventAnalytics.nelsonAalen(rows, "user_id", "ts", "event_type",
        "view", "purchase", 3600000000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // t=1: risk 4, d=2 -> step 500000, cum 500000
    // t=2: risk 2 (u2 + censored u3), d=1 -> step 500000, cum 1000000
    assert(got === Map(
      1L -> ((4L, 2L, 500000L, 500000L)),
      2L -> ((2L, 1L, 500000L, 1000000L))))
  }

  test("fanoDispersion: hand counts, Poisson-flat reads ~0 dispersion " +
      "for constant counts, sentinels on one day, determinism") {
    def ts(day: Int, i: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-$day%02d 0$i:00:00")
    // g: daily counts 1, 3, 2 over 3 days: S=6, Q=14, n=3
    //   fano_ppm = 1e6*(3*14-36) DIV (2*6) = 1e6*6 DIV 12 = 500000
    //   mean_micro = 6e6 DIV 3 = 2e6
    val g = Seq((1, 1), (2, 1), (2, 2), (2, 3), (3, 1), (3, 2))
      .map { case (d, i) => ("g", ts(d, i)) }
    // c: constant 2 events/day over 3 days -> variance 0 -> fano 0
    val c = Seq((1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2))
      .map { case (d, i) => ("c", ts(d, i)) }
    // s: a single day -> n < 2 -> sentinel
    val s1 = Seq(("s", ts(1, 1)))
    val rows = (g ++ c ++ s1).toDF("event_type", "ts")
    def read(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val got = read(EventAnalytics.fanoDispersion(rows, "ts", "event_type"))
    assert(got("g") === ((3L, 2000000L, 500000L)))
    assert(got("c") === ((3L, 2000000L, 0L)))
    assert(got("s") === ((1L, -2000000L, -2000000L)))
    assert(read(EventAnalytics.fanoDispersion(
      rows.repartition(5), "ts", "event_type")) === got)
  }

  test("survival family: bucket-span guard fails loudly past " +
      "MaxDurationBuckets on ALL THREE of kaplanMeier / nelsonAalen / " +
      "logRankTest") {
    def ts(h: Long) = new java.sql.Timestamp(h * 3600L * 1000L)
    val rows = Seq(
      (0L, 1L, "view", ts(0)), (1L, 1L, "purchase", ts(2000000L)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val armed = rows.withColumn("arm", lit(0L))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    // span = 2e6 hours; bucketMicros = 1 hour -> 2e6 buckets > the 1e6 bound
    val attempts: Seq[(String, Long => Array[org.apache.spark.sql.Row])] = Seq(
      "kaplanMeier" -> ((b: Long) => EventAnalytics.kaplanMeier(
        rows, "user_id", "ts", "event_type", "view", "purchase", b).collect()),
      "nelsonAalen" -> ((b: Long) => EventAnalytics.nelsonAalen(
        rows, "user_id", "ts", "event_type", "view", "purchase", b).collect()),
      "logRankTest" -> ((b: Long) => EventAnalytics.logRankTest(
        armed, "user_id", "ts", "event_type", "arm", "view", "purchase",
        b).collect()))
    for ((name, run) <- attempts) {
      val e = intercept[Exception] { run(3600000000L) }
      assert(msgs(e).exists(m => m != null &&
        m.contains("coarsen bucketMicros") && m.contains(name)),
        s"$name did not raise the named guard")
      // the same corpus with a wide-enough bucket passes the guard
      assert(run(3600000000L * 10).nonEmpty, s"$name failed past the guard")
    }
  }

  test("ljungBox: statistic matches a BigInt replica from the pinned ACF, " +
      "constant series reads the sentinel, short series emits no row, " +
      "white series passes") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-$day%02d 09:00:00")
    val alt = (0 until 8).map(i => ("g", ts(1 + i), if (i % 2 == 0) 1.0 else 3.0))
    val wigVals = Seq(3.2, 1.5, 1.5, 4.0, 2.2, 2.2, 5.5, 0.7, 2.9, 3.3, 1.1, 4.4)
    val wig = wigVals.zipWithIndex.map { case (v, i) => ("w", ts(1 + i), v) }
    val const = (0 until 10).map(i => ("c", ts(1 + i), 7.0))
    val short = (0 until 4).map(i => ("s", ts(1 + i), i.toDouble))
    val rows = (alt ++ wig ++ const ++ short).toDF("event_type", "ts", "value")
    val got = EventAnalytics.ljungBox(rows, "ts", "value", "event_type")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // short series: lag-5 ACF has no pairs -> no row
    assert(!got.contains("s"))
    // constant series: every ACF is the -2e6 sentinel -> q sentinel
    assert(got("c") === ((10L, -2000000L, -1L)))
    // BigInt replica from the (already spec-pinned) ACF output, same
    // DIV-per-term evaluation order
    val acf = EventAnalytics.acf(rows, "ts", "value", "event_type", maxLag = 5)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    Seq("g", "w").foreach { grp =>
      val n = acf((grp, 1))._1 + 1
      val sum = (1 to 5).map { k =>
        val (np, r) = acf((grp, k))
        BigInt(r) * BigInt(r) / BigInt(np)
      }.sum
      val want = (BigInt(n) * BigInt(n + 2) * sum / BigInt(1000000)).toLong
      assert(got(grp)._1 === n, s"$grp n_days")
      assert(got(grp)._2 === want, s"$grp q_micro")
      assert(got(grp)._3 === (if (want < 11070498L) 1L else 0L), s"$grp white")
    }
    // the alternating series is maximally autocorrelated -> rejected
    assert(got("g")._3 === 0L)
    val again = EventAnalytics.ljungBox(
        rows.repartition(5), "ts", "value", "event_type")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(again === got)
    intercept[IllegalArgumentException] {
      EventAnalytics.ljungBox(rows, "ts", "value", "event_type", maxLag = 8)
    }
  }

  test("runsTest: alternating and clustered sign sequences reject " +
      "randomness, a balanced mixed sequence passes, median-equal days " +
      "drop, a one-sign series reads the sentinel, determinism") {
    def daily(vals: Seq[Long], grp: String = "g") =
      vals.zipWithIndex.map { case (v, i) => (grp, f"d$i%02d", v) }
        .toDF("grp", "day", "dm")
    def run(df: org.apache.spark.sql.DataFrame) =
      EventAnalytics.runsTestFromDaily(df).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // 12 distinct values interleaved low/high: med = 6 (drops), signs
    // -+-+-+-+-+ then a ++ tail -> R = 10 of N = 11 -> rejected
    val alt = run(daily(Seq(1L, 12L, 2L, 11L, 3L, 10L, 4L, 9L, 5L, 8L, 6L, 7L)))
    assert(alt("g") === ((6L, 5L, 10L, 0L)))
    // ascending 1..12: two runs -> rejected
    val asc = run(daily((1L to 12L)))
    assert(asc("g") === ((6L, 5L, 2L, 0L)))
    // balanced ++--+--++- (R = 6, E[R] = 6) -> passes; med 6 dropped
    val ok = run(daily(Seq(7L, 8L, 1L, 2L, 9L, 3L, 4L, 10L, 11L, 5L, 6L)))
    assert(ok("g") === ((5L, 5L, 6L, 1L)))
    // two days: the lower-median day drops, one sign survives -> sentinel
    val solo = run(daily(Seq(1L, 9L)))
    assert(solo("g") === ((1L, 0L, 1L, -1L)))
    // determinism under repartition, groups independent
    val both = daily(Seq(1L, 12L, 2L, 11L, 3L, 10L, 4L, 9L, 5L, 8L, 6L, 7L))
      .union(daily((1L to 12L), grp = "h")).repartition(7)
    val g2 = run(both)
    assert(g2("g") === alt("g") && g2("h") === asc("g"))
  }

  test("kendallTauPairs: perfect concordance reads +1e6, perfect " +
      "anti-concordance -1e6, a constant series reads the sentinel, " +
      "hand tie-corrected case, determinism") {
    def daily(rows: Seq[(String, Int, Long)]) =
      rows.map { case (g, i, v) => (g, f"d$i%02d", v) }
        .toDF("grp", "day", "dm")
    def run(df: org.apache.spark.sql.DataFrame) =
      EventAnalytics.kendallTauPairsFromDaily(df).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // a ascends, b ascends (concordant), c descends (anti), k constant
    val rows = (1 to 6).flatMap(i => Seq(
      ("a", i, i.toLong), ("b", i, 10L + i), ("c", i, 100L - i),
      ("k", i, 7L)))
    val got = run(daily(rows))
    assert(got(("a", "b")) === ((15L, 15L, 0L, 1000000L)))
    assert(got(("a", "c")) === ((15L, 0L, 15L, -1000000L)))
    assert(got(("a", "k")) === ((15L, 0L, 0L, -2000000L)))
    // tie-corrected hand case: a = (1,1,2,3), b = (1,2,2,3):
    // pairs (6): C = 4, D = 0, tie_a = 1 (days 1-2), tie_b = 1 (days 2-3)
    // tau_b = 4 / sqrt(5*5) = 0.8
    val tied = run(daily(Seq(("x", 1, 1L), ("x", 2, 1L), ("x", 3, 2L),
      ("x", 4, 3L), ("y", 1, 1L), ("y", 2, 2L), ("y", 3, 2L), ("y", 4, 3L))))
    assert(tied(("x", "y")) === ((6L, 4L, 0L, 800000L)))
    val again = run(daily(rows).repartition(7))
    assert(again === got)
  }

  test("turningPoints: wiggles pass, monotone and alternating series " +
      "reject, tie-adjacent points are not extrema, short series reads " +
      "the sentinel") {
    def daily(vals: Seq[Long], grp: String = "g") =
      vals.zipWithIndex.map { case (v, i) => (grp, f"d$i%02d", v) }
        .toDF("grp", "day", "dm")
    def run(df: org.apache.spark.sql.DataFrame) =
      EventAnalytics.turningPointsFromDaily(df).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // 1,5,2,6,3: three strict extrema of n=5 -> E = 2, passes
    assert(run(daily(Seq(1L, 5L, 2L, 6L, 3L)))("g") === ((5L, 3L, 1L)))
    // monotone ascent: zero turns -> rejected (trend)
    assert(run(daily((1L to 8L)))("g") === ((8L, 0L, 0L)))
    // strict alternation: every interior point turns -> rejected
    assert(run(daily(Seq(1L, 9L, 1L, 9L, 1L, 9L, 1L, 9L, 1L)))("g")
      === ((9L, 7L, 0L)))
    // tie-adjacent points are not strict extrema: 1,5,5,2 has no turn
    val tied = run(daily(Seq(1L, 5L, 5L, 2L)))("g")
    assert(tied._2 === 0L)
    // n < 3: no interior point exists -> sentinel
    assert(run(daily(Seq(3L, 7L)))("g") === ((2L, 0L, -1L)))
  }

  test("ljungBoxFromAcf: the double pre-check raises the NAMED overflow " +
      "error past the decimal(38,0) numerator window") {
    // calendar-bounded n_days makes the guard unreachable from real
    // corpora, so drive the FromAcf seam directly with a fabricated frame:
    // a huge lag-1 pair count (n_days ~ 9e18) against tiny higher-lag
    // counts keeps per-lag terms ~1e12 while n·(n+2) squares past 5e37
    val acfDf = (1 to 5).map(l =>
        ("g", l, 1000000L, if (l == 1) 9000000000000000000L else 1L))
      .toDF("grp", "lag", "acf_micro", "n_pairs")
    val e = intercept[Exception] {
      EventAnalytics.ljungBoxFromAcf(acfDf).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null &&
      m.contains("ljungBox") && m.contains("overflow")))
  }

  test("rfmSegments: quintiles balanced within 1, segment composition, " +
      "recency/frequency/monetary ranked correctly") {
    def ts(h: Long) = new java.sql.Timestamp(h * 3600L * 1000L)
    // 10 users: user u has u events at hours 1..u, each value u.0 —
    // so frequency and monetary both rank ascending with u, and recency
    // DESCENDS with u (later last event = smaller recency = lower quintile
    // for big u... reversed: u=10 has last event at hour 10 = most recent)
    val rows = (1L to 10L).flatMap(u => (1L to u).map(h => (u, ts(h), u.toDouble)))
      .zipWithIndex.map { case ((u, t, v), i) => (i.toLong, u, t, v) }
      .toDF("event_id", "user_id", "ts", "value")
    val got = EventAnalytics.rfmSegments(rows, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // 10 users over 5 quintiles -> every quintile holds exactly 2 users
    Seq(1, 2, 3).foreach { idx =>
      val counts = got.values.groupBy(v => idx match {
        case 1 => v._1; case 2 => v._2; case 3 => v._3
      }).view.mapValues(_.size).toMap
      assert(counts === Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 2, 5L -> 2))
    }
    // user 10: most events + highest value -> f = m = 5; most recent last
    // event -> recency quintile 1
    assert(got(10L) === ((1L, 5L, 5L, 155L)))
    // user 1: one event long ago, lowest value -> r = 5, f = m = 1
    assert(got(1L) === ((5L, 1L, 1L, 511L)))
  }

  test("logRankTest: a faster arm is significant, identical arms read " +
      "chi2 exactly 0, bad arm values raise") {
    def ts(h: Long) = new java.sql.Timestamp(h * 3600L * 1000L)
    def mk(rows: Seq[(Long, Long, String, Long)]) = rows.zipWithIndex
      .map { case ((u, arm, et, h), i) => (i.toLong, u, arm, et, ts(h)) }
      .toDF("event_id", "user_id", "arm", "event_type", "ts")
    // arm 1 converts at 1h, arm 0 at 10h (20 users each): chi2 ~ 39e6
    val fast = mk((1L to 20L).flatMap(u =>
      Seq((u, 1L, "view", 0L), (u, 1L, "purchase", 1L))) ++
      (21L to 40L).flatMap(u =>
        Seq((u, 0L, "view", 0L), (u, 0L, "purchase", 10L))))
    val r = EventAnalytics.logRankTest(fast, "user_id", "ts", "event_type",
      "arm", "view", "purchase", 3600000000L).collect().head
    assert(r.getLong(5) > 30000000L && r.getLong(6) === 1L)
    // identical timing in both arms (two event times so the variance is
    // positive — a single shared time is the legitimate v=0 sentinel):
    // O1 = E1 at every time -> chi2 exactly 0
    val same = mk((1L to 8L).flatMap(u =>
      Seq((u, u % 2, "view", 0L),
        (u, u % 2, "purchase", if (u <= 4) 2L else 5L))))
    val r2 = EventAnalytics.logRankTest(same, "user_id", "ts", "event_type",
      "arm", "view", "purchase", 3600000000L).collect().head
    assert(r2.getLong(5) === 0L && r2.getLong(6) === 0L)
    val e = intercept[Exception] {
      EventAnalytics.logRankTest(
        mk(Seq((1L, 2L, "view", 0L))), "user_id", "ts", "event_type",
        "arm", "view", "purchase", 3600000000L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("logRankTest")))
  }

  test("interArrivalStats: metronome reads cv2=0, burst inflates it, " +
      "singletons vanish, simultaneous events hit the sentinel") {
    def ts(us: Long) = new java.sql.Timestamp(us / 1000L)
    // metronome: gaps 10s,10s,10s -> var 0 -> cv2 0
    // burst: gaps 1s, 1s, 28s: mean 10s, cv2 = (3*(1+1+784)-900)/900 e6
    val rows = Seq(
      (1L, 0L), (1L, 10000000L), (1L, 20000000L), (1L, 30000000L),
      (2L, 0L), (2L, 1000000L), (2L, 2000000L), (2L, 30000000L),
      (3L, 5000000L),                       // single event -> no row
      (4L, 7000000L), (4L, 7000000L))       // same instant -> sd=0 sentinel
      .zipWithIndex.map { case ((u, t), i) => (u, ts(t), i.toLong) }
    val got = EventAnalytics.interArrivalStats(
        rows.toDF("user_id", "ts", "event_id"), "user_id", "ts", "event_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((3L, 10000000L, 0L)))
    val expected2 = 1000000L * (3L * (1L + 1L + 784L) - 900L) / 900L
    assert(got(2L) === ((3L, 10000000L, expected2)))
    assert(!got.contains(3L))
    assert(got(4L)._3 === -1L)
  }

  test("cusumChangepoint: step series peaks at the last pre-shift day, " +
      "constant series ties to its first day, single-day groups read the " +
      "sentinel regime, repartition-deterministic") {
    // g: 10,10,10 then 22 -> D_k (scaled by cnt=4): -12e6,-24e6,-36e6,0
    //    peak day 3, cusum = -36e6 DIV 4, before 10e6, after 22e6
    // c: 7,7 -> all D zero -> earliest day, zero shift
    // h: one day -> D_1 = 0, no after-regime
    val rows = Seq(
      ("g", "2024-03-01", 10.0), ("g", "2024-03-02", 10.0),
      ("g", "2024-03-03", 10.0), ("g", "2024-03-04", 22.0),
      ("c", "2024-03-01", 7.0), ("c", "2024-03-02", 7.0),
      ("h", "2024-03-05", 5.0))
      .toDF("event_type", "d", "value")
      .withColumn("ts", to_timestamp(col("d")))
    val expected = Map(
      "g" -> ((4L, 4L, "2024-03-03", -9000000L, 10000000L, 22000000L, 12000000L)),
      "c" -> ((2L, 2L, "2024-03-01", 0L, 7000000L, 7000000L, 0L)),
      "h" -> ((1L, 1L, "2024-03-05", 0L, 5000000L, -2000000L, -2000000L)))
    def read(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val got = read(EventAnalytics.cusumChangepoint(rows, "ts", "value", "event_type"))
    assert(got === expected)
    val again = read(EventAnalytics.cusumChangepoint(
      rows.repartition(5), "ts", "value", "event_type"))
    assert(again === expected)
  }

  test("stlDecompose: additive identity holds per row, edge windows clip, " +
      "ISO weekdays, constant series decomposes to itself") {
    // 2024-03-04 is a Monday; ten days of a noisy-ish series
    val vals = Seq(10.0, 14.0, 9.0, 20.0, 11.0, 16.0, 8.0, 12.0, 15.0, 10.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("g", java.sql.Timestamp.valueOf(f"2024-03-${4 + i}%02d 10:00:00"), v)
    }.toDF("event_type", "ts", "value")
    val got = EventAnalytics.stlDecompose(rows, "ts", "value", "event_type")
      .orderBy(col("day")).collect()
    assert(got.length === 10)
    // per-row additive identity, exact
    got.foreach { r =>
      assert(r.getLong(2) === r.getLong(3) + r.getLong(5) + r.getLong(6))
    }
    // ISO weekday: Monday = 1, next Sunday (2024-03-10) = 7
    assert(got.head.getInt(4) === 1 && got(6).getInt(4) === 7)
    // edge trend = mean of the first 4 days (window clips);
    // interior day 4 (index 3) = mean of days 1..7
    def microMean(xs: Seq[Double]): Long = {
      val s = xs.map(x => math.round(x * 1e6)).sum
      Math.floorDiv(s, xs.length) // all positive here; same as DIV
    }
    assert(got.head.getLong(3) === microMean(vals.take(4)))
    assert(got(3).getLong(3) === microMean(vals.take(7)))
    // constant series: trend = value, seasonal = residual = 0
    val const = (0 until 10).map { i =>
      ("c", java.sql.Timestamp.valueOf(f"2024-03-${4 + i}%02d 10:00:00"), 7.0)
    }.toDF("event_type", "ts", "value")
    EventAnalytics.stlDecompose(const, "ts", "value", "event_type")
      .collect().foreach { r =>
        assert((r.getLong(3), r.getLong(5), r.getLong(6)) ===
          ((7000000L, 0L, 0L)))
      }
  }

  test("acf: a period-2 series reads exactly -1 at lag 1 and +1 at lag 2, " +
      "short series emit only realizable lags, zero variance reads the " +
      "sentinel, guards fire") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-$day%02d 09:00:00")
    val alt = (0 until 8).map(i => ("g", ts(1 + i), if (i % 2 == 0) 1.0 else 3.0))
    val short = Seq(("h", ts(1), 5.0), ("h", ts(2), 5.0))
    val got = EventAnalytics.acf(
        (alt ++ short).toDF("event_type", "ts", "value"),
        "ts", "value", "event_type", maxLag = 7)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // y = 4 - x at odd lags (corr exactly -1), y = x at even lags (+1);
    // lag 7 has a SINGLE pair (zero variance both margins) -> sentinel
    (1 to 7).foreach { l =>
      val want =
        if (l == 7) -2000000L else if (l % 2 == 1) -1000000L else 1000000L
      assert(got(("g", l)) === (((8 - l).toLong, want)), s"lag $l")
    }
    // h has ONE lag-1 pair (zero variance -> the -2e6 OUT-OF-RANGE
    // sentinel, deliberately distinct from g's legitimate -1e6 at odd
    // lags — pacf consumes these and must tell them apart) and no
    // realizable higher lags
    assert(got(("h", 1)) === ((1L, -2000000L)))
    assert(!got.contains(("h", 2)))
    intercept[IllegalArgumentException] {
      EventAnalytics.acf(alt.toDF("event_type", "ts", "value"),
        "ts", "value", "event_type", maxLag = 0)
    }
  }

  test("binarySegmentation: one step splits once and stops, a two-step " +
      "ladder splits twice at the hand peaks, constant series never " +
      "splits, determinism, guards") {
    def day(i: Int) = f"2024-03-${i}%02d"
    // g: 10x4 then 30x4 -> round-1 peak at day 4, both halves constant
    val g = (1 to 8).map(i => ("g", day(i), if (i <= 4) 10.0 else 30.0))
    // h: 0x3, 10x3, 40x3 -> round-1 peak day 6, round-2 splits [1-6] at 3
    val h = (1 to 9).map(i =>
      ("h", day(i), if (i <= 3) 0.0 else if (i <= 6) 10.0 else 40.0))
    val c = (1 to 5).map(i => ("c", day(i), 7.0))
    val rows = (g ++ h ++ c).toDF("event_type", "d", "value")
      .withColumn("ts", to_timestamp(col("d"))).drop("d")
    def read(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val got = read(EventAnalytics.binarySegmentation(
      rows, "ts", "value", "event_type", maxSplits = 2))
    assert(got === Map(
      ("g", "2024-03-01") -> (("2024-03-04", 4L, 4L, 10000000L)),
      ("g", "2024-03-05") -> (("2024-03-08", 4L, 4L, 30000000L)),
      ("h", "2024-03-01") -> (("2024-03-03", 3L, 3L, 0L)),
      ("h", "2024-03-04") -> (("2024-03-06", 3L, 3L, 10000000L)),
      ("h", "2024-03-07") -> (("2024-03-09", 3L, 3L, 40000000L)),
      ("c", "2024-03-01") -> (("2024-03-05", 5L, 5L, 7000000L))))
    val again = read(EventAnalytics.binarySegmentation(
      rows.repartition(5), "ts", "value", "event_type", maxSplits = 2))
    assert(again === got)
    intercept[IllegalArgumentException] {
      EventAnalytics.binarySegmentation(
        rows, "ts", "value", "event_type", maxSplits = 0)
    }
  }

  test("pacf: lag 1 equals rho_1, the periodic singular system reads the " +
      "sentinel, all lags match a BigInt Cramer replica from the pinned " +
      "ACF, determinism, guards") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-$day%02d 09:00:00")
    val alt = (0 until 8).map(i => ("g", ts(1 + i), if (i % 2 == 0) 1.0 else 3.0))
    val wigVals = Seq(3.2, 1.5, 1.5, 4.0, 2.2, 2.2, 5.5, 0.7, 2.9, 3.3, 1.1, 4.4)
    val wig = wigVals.zipWithIndex.map { case (v, i) => ("w", ts(1 + i), v) }
    val rows = (alt ++ wig).toDF("event_type", "ts", "value")
    def read(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val got = read(EventAnalytics.pacf(rows, "ts", "value", "event_type"))
    // period-2: rho = (-1,+1,...)e6 exactly -> phi_11 = rho_1, every
    // higher-order Toeplitz system is singular
    assert(got(("g", 1)) === -1000000L)
    (2 to 5).foreach(k => assert(got(("g", k)) === -2000000L, s"lag $k"))
    // BigInt Cramer replica from the (already spec-pinned) ACF values
    val rho = EventAnalytics.acf(rows, "ts", "value", "event_type", maxLag = 5)
      .filter(col("grp") === "w").collect()
      .map(r => r.getInt(1) -> BigInt(r.getLong(3))).toMap
    def detB(m: IndexedSeq[IndexedSeq[BigInt]]): BigInt =
      (0 until m.length).toList.permutations.map { p =>
        val inv = (for {
          i <- m.indices; j <- i + 1 until m.length if p(i) > p(j)
        } yield 1).sum
        val sign = if (inv % 2 == 0) BigInt(1) else BigInt(-1)
        sign * m.indices.map(i => m(i)(p(i))).product
      }.sum
    def r(j: Int): BigInt = if (j == 0) BigInt(1000000) else rho(j)
    (1 to 5).foreach { k =>
      val den = detB(Vector.tabulate(k, k)((i, j) => r(math.abs(i - j))))
      val num = detB(Vector.tabulate(k, k)((i, j) =>
        if (j == k - 1) r(i + 1) else r(math.abs(i - j))))
      val want = if (den == 0) -2000000L
        else math.round(1e6 * num.toDouble / den.toDouble)
      assert(got(("w", k)) === want, s"lag $k replica")
    }
    // phi_11 is rho_1 exactly
    assert(got(("w", 1)) === rho(1).toLong)
    val again = read(EventAnalytics.pacf(
      rows.repartition(5), "ts", "value", "event_type"))
    assert(again === got)
    intercept[IllegalArgumentException] {
      EventAnalytics.pacf(rows, "ts", "value", "event_type", maxLag = 6)
    }
  }

  test("seasonalStrength: constant series hits both sentinels, strengths " +
      "match a BigInt replica of the moment arithmetic over the pinned " +
      "STL components, bounds hold, determinism") {
    def day(i: Int) = f"2024-03-${1 + i}%02d"
    val wk = (0 until 21).map(i =>
      ("wk", day(i), Seq(2.0, 5.0, 3.0, 8.0, 1.0, 9.0, 4.0)(i % 7)))
    val ln = (0 until 14).map(i => ("ln", day(i), 1.0 * i))
    val ct = (0 until 10).map(i => ("ct", day(i), 6.0))
    val rows = (wk ++ ln ++ ct).toDF("event_type", "d", "value")
      .withColumn("ts", to_timestamp(col("d"))).drop("d")
    def read(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val got = read(EventAnalytics.seasonalStrength(
      rows, "ts", "value", "event_type"))
    assert(got("ct") === ((10L, -1L, -1L)))
    // replica over the (already spec-pinned) STL components
    val stl = EventAnalytics.stlDecompose(rows, "ts", "value", "event_type")
      .collect().map(r => (r.getString(0),
        (BigInt(r.getLong(2) - r.getLong(3)),              // qs = dm - trend
         BigInt(r.getLong(2) - r.getLong(5)),              // qt = dm - seasonal
         BigInt(r.getLong(6)))))                           // r
    def strength(grp: String, pickQ: ((BigInt, BigInt, BigInt)) => BigInt)
        : Long = {
      val g = stl.filter(_._1 == grp).map(_._2)
      val n = BigInt(g.length)
      val (sr, srr) = (g.map(_._3).sum, g.map(t => t._3 * t._3).sum)
      val qs = g.map(pickQ)
      val (sq, sqq) = (qs.sum, qs.map(q => q * q).sum)
      val den = n * sqq - sq * sq
      if (den == 0) -1L
      else (BigInt(0).max(BigInt(1000000) -
        BigInt(1000000) * (n * srr - sr * sr) / den)).toLong
    }
    Seq("wk", "ln").foreach { g =>
      assert(got(g)._2 === strength(g, _._1), s"$g seasonal")
      assert(got(g)._3 === strength(g, _._2), s"$g trend")
      assert(got(g)._2 >= 0L && got(g)._2 <= 1000000L)
      assert(got(g)._3 >= 0L && got(g)._3 <= 1000000L)
    }
    // the weekly series reads strongly seasonal, the linear one strongly
    // trending — the gates the operator exists to inform
    assert(got("wk")._2 > 800000L && got("ln")._3 > 800000L)
    val again = read(EventAnalytics.seasonalStrength(
      rows.repartition(5), "ts", "value", "event_type"))
    assert(again === got)
  }

  test("forecastBacktest: exact weekly series scores mase 0, linear " +
      "series reads the hand ratio, constant and too-short series hit " +
      "sentinels, determinism, guards") {
    def day(i: Int) = f"2024-03-${1 + i}%02d"
    val weekly = (0 until 21).map(i =>
      ("wk", day(i), Seq(2.0, 5.0, 3.0, 8.0, 1.0, 9.0, 4.0)(i % 7)))
    val lin = (0 until 10).map(i => ("ln", day(i), 1.0 + i))
    val const = (0 until 10).map(i => ("ct", day(i), 4.0))
    val short = (0 until 5).map(i => ("sh", day(i), 1.0 + i))
    val rows = (weekly ++ lin ++ const ++ short)
      .toDF("event_type", "d", "value")
      .withColumn("ts", to_timestamp(col("d"))).drop("d")
    def read(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val got = read(
      EventAnalytics.forecastBacktest(rows, "ts", "value", "event_type"))
    // weekly: 14 eval rows, model error 0 -> mase 0; naive errors > 0
    assert(got("wk")._1 === 21L && got("wk")._2 === 14L)
    assert(got("wk")._3 === 0L && got("wk")._5 === 0L)
    // linear: eval days 8..10, |y - y_{-7}| = 7e6 each, naive 1e6 each
    assert(got("ln") === ((10L, 3L, 7000000L, 1000000L, 7000000L)))
    assert(got("ct") === ((10L, 3L, 0L, 0L, -1L)))
    assert(got("sh") === ((5L, 0L, -1L, -1L, -1L)))
    val again = read(EventAnalytics.forecastBacktest(
      rows.repartition(5), "ts", "value", "event_type"))
    assert(again === got)
    intercept[IllegalArgumentException] {
      EventAnalytics.forecastBacktest(rows, "ts", "value", "event_type",
        seasonLag = 1)
    }
  }

  /** Driver-side Mann-Kendall replica from first principles (BigInt pair
    * arithmetic; BigInt `/` truncates toward zero like Spark `DIV`).
    * Takes one group's (day, value) series, returns
    * (n_days, n_pairs, s_stat, var_num, sen_slope_nano, z_micro).
    */
  private def mkReplica(series: Seq[(String, Double)])
      : (Long, Long, Long, Long, Long, Long) = {
    val pts = series.map { case (d, v) =>
      (java.time.LocalDate.parse(d).toEpochDay, math.round(v * 1e6)) }
    val pairs = for {
      i <- pts.indices; j <- pts.indices if pts(i)._1 < pts(j)._1
    } yield (pts(j)._2 - pts(i)._2, pts(j)._1 - pts(i)._1)
    val s = pairs.map { case (d, _) => d.sign }.sum
    val n = pts.length.toLong
    val tie = pts.groupBy(_._2).values
      .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
    val varNum = n * (n - 1) * (2 * n + 5) - tie
    val slopes = pairs
      .map { case (d, dt) => (BigInt(1000) * d / dt).toLong }.sorted
    val sen = if (slopes.isEmpty) 0L
      else slopes((slopes.length + 1) / 2 - 1)
    val z = if (varNum <= 0) -2000000L
      else math.round(1e6 * (s - s.sign) / math.sqrt(varNum / 18.0))
    (n, pairs.length.toLong, s, varNum, sen, z)
  }

  test("mannKendall: monotone series trend at 5%, ties correct the " +
      "variance, constant reads flat, single day insufficient, gapped " +
      "series divide by true day spans, replica agreement, determinism") {
    val inc = (0 until 10).map(i => ("inc", f"2024-03-${1 + i}%02d", 1.0 + i))
    val dec = (0 until 10).map(i => ("dec", f"2024-03-${1 + i}%02d", 9.0 - i))
    val tied = Seq(("t", "2024-03-01", 1.0), ("t", "2024-03-02", 1.0),
      ("t", "2024-03-03", 2.0))
    val const = (0 until 3).map(i => ("c", f"2024-03-${1 + i}%02d", 4.0))
    val one = Seq(("s", "2024-03-05", 2.5))
    // gapped + tied wiggle: negative-slope truncation toward zero crosses
    // a multi-day span ((1000 * diff) DIV dt with dt > 1, diff < 0)
    val wig = Seq("2024-03-01" -> 3.2, "2024-03-02" -> 1.5,
      "2024-03-03" -> 1.5, "2024-03-05" -> 4.0, "2024-03-06" -> 2.2,
      "2024-03-09" -> 2.2, "2024-03-10" -> 5.5, "2024-03-12" -> 0.7)
    val rows = (inc ++ dec ++ tied ++ const ++ one ++
        wig.map { case (d, v) => ("w", d, v) })
      .toDF("event_type", "d", "value")
      .withColumn("ts", to_timestamp(col("d"))).drop("d")
    def read(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getString(7)))).toMap
    val got = read(
      EventAnalytics.mannKendall(rows, "ts", "value", "event_type"))
    // monotone 10-day: S = +/-45, no ties, var_num = 10*9*25, slope
    // exactly +/-1 unit/day = 1e9 nano/day, z = 44/sqrt(125) ~ 3.94
    val zInc = math.round(1e6 * 44.0 / math.sqrt(2250.0 / 18.0))
    assert(got("inc") === ((10L, 45L, 45L, 2250L, 1000000000L, zInc, "inc")))
    assert(got("dec") === ((10L, 45L, -45L, 2250L, -1000000000L, -zInc, "dec")))
    // hand tie case [1,1,2]: S=2, tie_term=18, var_num=66-18=48,
    // slopes {0, 5e8, 1e9} -> lower median 5e8, z = 1/sqrt(48/18)
    assert(got("t") === ((3L, 3L, 2L, 48L, 500000000L,
      math.round(1e6 / math.sqrt(48.0 / 18.0)), "none")))
    assert(got("c") === ((3L, 3L, 0L, 0L, 0L, -2000000L, "flat")))
    assert(got("s") === ((1L, 0L, 0L, 0L, 0L, -2000000L, "insufficient")))
    // replica agreement on the gapped/tied wiggle
    val (n, np, s, vn, sen, z) = mkReplica(wig)
    val w = got("w")
    assert((w._1, w._2, w._3, w._4, w._5, w._6) === ((n, np, s, vn, sen, z)))
    val again = read(EventAnalytics.mannKendall(
      rows.repartition(7), "ts", "value", "event_type"))
    assert(again === got)
  }
}

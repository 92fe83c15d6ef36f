package graft

import scala.util.Random

import graft.operators.EventAnalytics

/** Differential fuzzing for the survival family (kaplanMeier /
  * nelsonAalen / logRankTest) — the RankTestsRandomizedSpec recipe:
  * many random draws against independent driver-side references that
  * rebuild the risk table from first principles (BigInt/Long integer
  * arithmetic; the two libm steps use the identical java.lang.Math calls
  * and HALF_UP rounding Spark's log/exp/round compile to). Draws are
  * deliberately tie-dense (entry/event times on a small hour grid, so
  * duration buckets collide heavily) and censoring-heavy (users without
  * the event, events before entry, users without entry, noise event
  * types that only move the censoring horizon) — exactly the step/
  * sentinel edges (−46·10⁶ floor, d = n_risk, v = 0) the fuzz net is for.
  */
class SurvivalRandomizedSpec extends SparkSpec {
  import spark.implicits._

  private val HourUs = 3600000000L

  /** One random censoring-heavy corpus: rows (user, type, hour, arm). */
  private def draw(rnd: Random): Seq[(Long, String, Long, Long)] = {
    val nUsers = 5 + rnd.nextInt(20)
    (1L to nUsers).flatMap { u =>
      val arm = rnd.nextInt(2).toLong
      val hasEntry = rnd.nextInt(10) > 0 // ~10% never enter
      val entries =
        if (!hasEntry) Seq.empty
        else (0 to rnd.nextInt(2)).map(_ => (u, "view", rnd.nextInt(13).toLong, arm))
      // events may precede entry (filtered) or be absent (censored)
      val events = (1 to rnd.nextInt(3)).map(_ =>
        (u, "purchase", (rnd.nextInt(26) - 6).toLong, arm))
      // noise types only move the censoring horizon tmax/tmin
      val noise = (1 to rnd.nextInt(2)).map(_ =>
        (u, "click", rnd.nextInt(40).toLong, arm))
      entries ++ events ++ noise
    }
  }

  /** Driver-side risk table: t -> (n_risk, d, d1) over bucketed durations,
    * plus the per-user durations it came from.
    */
  private def riskTable(rows: Seq[(Long, String, Long, Long)], bucketH: Long)
      : Seq[(Long, Long, Long, Long)] = {
    val tmax = rows.map(_._3).max * HourUs
    val t0 = rows.filter(_._2 == "view").groupBy(_._1)
      .view.mapValues(_.map(_._3 * HourUs).min).toMap
    val t1 = rows.filter(_._2 == "purchase").groupBy(_._1).flatMap {
      case (u, es) =>
        t0.get(u).flatMap { e0 =>
          val after = es.map(_._3 * HourUs).filter(_ >= e0)
          if (after.isEmpty) None else Some(u -> after.min)
        }
    }
    val arms = rows.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
    val durations = t0.toSeq.map { case (u, e0) =>
      val end = t1.getOrElse(u, tmax)
      ((end - e0) / (bucketH * HourUs),
        if (t1.contains(u)) 1L else 0L, arms(u))
    }
    val byT = durations.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = durations.size.toLong
    byT.map { case (t, ds) =>
      val row = (t, atRisk, ds.map(_._2).sum,
        ds.filter(_._3 == 1L).map(_._2).sum)
      atRisk -= ds.size
      row
    }
  }

  private def toDf(rows: Seq[(Long, String, Long, Long)]) =
    rows.zipWithIndex.map { case ((u, et, h, arm), i) =>
      (i.toLong, u, et, new java.sql.Timestamp(h * 3600L * 1000L), arm)
    }.toDF("event_id", "user_id", "event_type", "ts", "arm")

  private def half(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("kaplanMeier pins the -46e6 full-conversion floor: every at-risk " +
      "user converting at t collapses surv_ppm to 0") {
    // 3 users enter at h0; 2 convert in bucket 1, the last in bucket 2
    // (n_risk = 1 = d there -> the ln(0) floor) — plus one noise row so
    // the censor horizon is past the conversions
    val rows = Seq(
      (1L, "view", 0L, 0L), (2L, "view", 0L, 0L), (3L, "view", 0L, 0L),
      (1L, "purchase", 1L, 0L), (2L, "purchase", 1L, 0L),
      (3L, "purchase", 2L, 0L), (1L, "click", 5L, 0L))
    val got = EventAnalytics.kaplanMeier(toDf(rows), "user_id", "ts",
        "event_type", "view", "purchase", HourUs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val step1 = half(math.log(1.0 / 3.0) * 1e6)
    assert(got === Map(
      1L -> ((3L, 2L, step1, half(math.exp(step1 / 1e6) * 1e6))),
      2L -> ((1L, 1L, step1 - 46000000L, 0L))))
  }

  test("kaplanMeier matches a first-principles driver replica on 15 " +
      "random censoring-heavy draws") {
    val rnd = new Random(307)
    (1 to 15).foreach { trial =>
      val rows = draw(rnd)
      val bucketH = 1L + rnd.nextInt(2)
      val got = EventAnalytics.kaplanMeier(toDf(rows), "user_id", "ts",
          "event_type", "view", "purchase", bucketH * HourUs)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      var lnCum = 0L
      val want = riskTable(rows, bucketH).map { case (t, n, d, _) =>
        val step =
          if (d == 0L) 0L
          else if (n == d) -46000000L
          else half(math.log((n - d).toDouble / n) * 1e6)
        lnCum += step
        t -> ((n, d, lnCum, half(math.exp(lnCum.toDouble / 1e6) * 1e6)))
      }.filter(_._2._2 > 0L).toMap
      assert(got === want, s"trial $trial")
    }
  }

  test("rmst matches a first-principles step-integral replica on 15 " +
      "random draws (clamping tau inside and beyond the span); an " +
      "event-free corpus reads 1e6*tau") {
    val rnd = new Random(331)
    (1 to 15).foreach { trial =>
      val rows = draw(rnd)
      val bucketH = 1L + rnd.nextInt(2)
      val tau = 1L + rnd.nextInt(30) // sometimes inside, sometimes past
      val got = EventAnalytics.rmst(toDf(rows), "user_id", "ts",
        "event_type", "view", "purchase", bucketH * HourUs, tau)
        .collect().head
      // KM replica -> step integral
      var lnCum = 0L
      val kmRows = riskTable(rows, bucketH).flatMap { case (t, n, d, _) =>
        val step =
          if (d == 0L) 0L
          else if (n == d) -46000000L
          else half(math.log((n - d).toDouble / n) * 1e6)
        lnCum += step
        if (d > 0L) Some((t, half(math.exp(lnCum.toDouble / 1e6) * 1e6)))
        else None
      }
      val tFirst = kmRows.headOption.map(r => math.min(r._1, tau)).getOrElse(tau)
      val tail = kmRows.zipWithIndex.map { case ((t, s), i) =>
        val tNext = math.min(
          kmRows.lift(i + 1).map(_._1).getOrElse(tau), tau)
        BigInt(s) * (tNext - math.min(t, tau))
      }.sum
      assert(got.getLong(0) === tau, s"trial $trial tau")
      assert(got.getLong(1) === kmRows.size.toLong, s"trial $trial times")
      assert(BigInt(got.getLong(2)) === BigInt(1000000) * tFirst + tail,
        s"trial $trial rmst")
    }
    // event-free corpus: everyone survives the whole window
    val noEvt = Seq((1L, "view", 0L, 0L), (2L, "view", 3L, 0L),
      (1L, "click", 9L, 0L))
    val g = EventAnalytics.rmst(toDf(noEvt), "user_id", "ts", "event_type",
      "view", "purchase", HourUs, 12L).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2)) === ((12L, 0L, 12000000L)))
  }

  test("nelsonAalen matches an ALL-INTEGER driver replica on 15 random " +
      "censoring-heavy draws") {
    val rnd = new Random(311)
    (1 to 15).foreach { trial =>
      val rows = draw(rnd)
      val bucketH = 1L + rnd.nextInt(2)
      val got = EventAnalytics.nelsonAalen(toDf(rows), "user_id", "ts",
          "event_type", "view", "purchase", bucketH * HourUs)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      var cum = 0L
      val want = riskTable(rows, bucketH).map { case (t, n, d, _) =>
        val step = 1000000L * d / n
        cum += step
        t -> ((n, d, step, cum))
      }.filter(_._2._2 > 0L).toMap
      assert(got === want, s"trial $trial")
    }
  }

  test("kaplanMeierCi matches a first-principles Greenwood replica on " +
      "15 random draws; full-conversion rows read the band sentinels") {
    val rnd = new Random(337)
    (1 to 15).foreach { trial =>
      val rows = draw(rnd)
      val bucketH = 1L + rnd.nextInt(2)
      val got = EventAnalytics.kaplanMeierCi(toDf(rows), "user_id", "ts",
          "event_type", "view", "purchase", bucketH * HourUs)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getLong(6)))).toMap
      var (lnCum, gCum, floored) = (0L, 0L, false)
      val want = riskTable(rows, bucketH).map { case (t, n, d, _) =>
        val step =
          if (d == 0L) 0L
          else if (n == d) -46000000L
          else half(math.log((n - d).toDouble / n) * 1e6)
        lnCum += step
        if (d > 0L && n > d)
          gCum += (BigInt(1000000000000L) * d / (BigInt(n) * (n - d))).toLong
        if (d > 0L && n == d) floored = true
        val surv = half(math.exp(lnCum.toDouble / 1e6) * 1e6)
        val margin = half(1.96 * math.sqrt(gCum.toDouble))
        val (v, lo, hi) =
          if (floored) (-1L, 0L, 0L)
          else (gCum,
            half(math.exp((lnCum - margin).toDouble / 1e6) * 1e6),
            math.min(1000000L,
              half(math.exp((lnCum + margin).toDouble / 1e6) * 1e6)))
        t -> ((n, d, surv, v, lo, hi))
      }.filter(_._2._2 > 0L).toMap
      assert(got === want, s"trial $trial")
      // the band brackets the estimate wherever it is defined
      got.values.filter(_._4 >= 0L).foreach { case (_, _, s, _, lo, hi) =>
        assert(lo <= s && s <= hi)
      }
    }
  }

  test("competingRisks matches a first-principles CIF replica on 15 " +
      "random two-outcome draws, with the incidence-mass identity") {
    val rnd = new Random(347)
    (1 to 15).foreach { trial =>
      // extend the base draw with a competing 'error' outcome stream
      val rows = draw(rnd) ++ (1L to 8L).flatMap { u =>
        (1 to rnd.nextInt(3)).map(_ =>
          (u, "error", (rnd.nextInt(26) - 6).toLong, 0L))
      }
      val bucketH = 1L + rnd.nextInt(2)
      val got = EventAnalytics.competingRisks(toDf(rows), "user_id", "ts",
          "event_type", "view", Seq("purchase", "error"), bucketH * HourUs)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getLong(6)))).toMap
      // replica: first qualifying event per user, tie-break by type name
      val tmax = rows.map(_._3).max * HourUs
      val t0 = rows.filter(_._2 == "view").groupBy(_._1)
        .view.mapValues(_.map(_._3 * HourUs).min).toMap
      val firstEvt = rows.filter(r => r._2 == "purchase" || r._2 == "error")
        .groupBy(_._1).flatMap { case (u, es) =>
          t0.get(u).flatMap { e0 =>
            val after = es.map(e => (e._3 * HourUs, e._2)).filter(_._1 >= e0)
            if (after.isEmpty) None else Some(u -> after.min)
          }
        }
      val durs = t0.toSeq.map { case (u, e0) =>
        val (end, out) = firstEvt.get(u)
          .map { case (t1, et) => (t1, Some(et)) }.getOrElse((tmax, None))
        ((end - e0) / (bucketH * HourUs), out)
      }
      val byT = durs.groupBy(_._1).toSeq.sortBy(_._1)
      var atRisk = durs.size.toLong
      var lnCum = 0L
      var (cifP, cifE) = (0L, 0L)
      val want = byT.map { case (t, ds) =>
        val n = atRisk
        val dp = ds.count(_._2.contains("purchase")).toLong
        val de = ds.count(_._2.contains("error")).toLong
        val dt = dp + de
        val survPrev = half(math.exp(lnCum.toDouble / 1e6) * 1e6)
        val step =
          if (dt == 0L) 0L
          else if (n == dt) -46000000L
          else half(math.log((n - dt).toDouble / n) * 1e6)
        lnCum += step
        cifP += survPrev * dp / n
        cifE += survPrev * de / n
        atRisk -= ds.size
        t -> ((n, dt, dp, de, cifP, cifE))
      }.filter(_._2._2 > 0L).toMap
      assert(got === want, s"trial $trial")
      // incidence-mass identity: CIFs + S account for all mass up to the
      // documented per-step truncation (< 1 ppm per event row) + exp ulps
      if (want.nonEmpty) {
        val lastT = want.keys.max
        val (_, _, _, _, cp, ce) = want(lastT)
        val sLast = half(math.exp(lnCum.toDouble / 1e6) * 1e6)
        assert(math.abs(cp + ce + sLast - 1000000L) <=
          byT.size.toLong * 2 + 2, s"trial $trial mass")
      }
    }
  }

  test("kmQuantiles reads the first bucket at each survival level; " +
      "never-reached levels read -1") {
    val rnd = new Random(353)
    (1 to 10).foreach { trial =>
      val rows = draw(rnd)
      val bucketH = 1L + rnd.nextInt(2)
      val got = EventAnalytics.kmQuantiles(toDf(rows), "user_id", "ts",
        "event_type", "view", "purchase", bucketH * HourUs).collect().head
      // KM replica -> quantiles
      var lnCum = 0L
      val km = riskTable(rows, bucketH).flatMap { case (t, n, d, _) =>
        val step =
          if (d == 0L) 0L
          else if (n == d) -46000000L
          else half(math.log((n - d).toDouble / n) * 1e6)
        lnCum += step
        if (d > 0L) Some((t, half(math.exp(lnCum.toDouble / 1e6) * 1e6)))
        else None
      }
      def firstAt(level: Long) =
        km.collectFirst { case (t, s) if s <= level => t }.getOrElse(-1L)
      assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
        === ((firstAt(750000L), firstAt(500000L), firstAt(250000L),
          km.size.toLong)), s"trial $trial")
    }
  }

  test("logRankTest matches a first-principles driver replica on 15 " +
      "random two-arm draws") {
    val rnd = new Random(313)
    (1 to 15).foreach { trial =>
      val rows = draw(rnd)
      val bucketH = 1L + rnd.nextInt(2)
      val got = EventAnalytics.logRankTest(toDf(rows), "user_id", "ts",
        "event_type", "arm", "view", "purchase", bucketH * HourUs)
        .collect().head
      // rebuild with per-arm at-risk counts
      val table = riskTable(rows, bucketH)
      val tmax = rows.map(_._3).max * HourUs
      val t0 = rows.filter(_._2 == "view").groupBy(_._1)
        .view.mapValues(_.map(_._3 * HourUs).min).toMap
      val t1 = rows.filter(_._2 == "purchase").groupBy(_._1).flatMap {
        case (u, es) => t0.get(u).flatMap { e0 =>
          val after = es.map(_._3 * HourUs).filter(_ >= e0)
          if (after.isEmpty) None else Some(u -> after.min)
        }
      }
      val arms = rows.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
      val durs = t0.toSeq.map { case (u, e0) =>
        ((t1.getOrElse(u, tmax) - e0) / (bucketH * HourUs), arms(u))
      }
      var n1AtRisk = durs.count(_._2 == 1L).toLong
      var (e1, v, o1, nEvents, nTimes) = (0L, 0L, 0L, 0L, 0L)
      table.foreach { case (t, n, d, d1) =>
        val n1 = n1AtRisk
        if (d > 0L) {
          nTimes += 1; nEvents += d; o1 += d1
          e1 += half(1e6 * d.toDouble * n1 / n)
          if (n > 1)
            v += half(1e6 * (d.toDouble * n1 * (n - n1) * (n - d)) /
              (n.toDouble * n * (n - 1)))
        }
        n1AtRisk -= durs.count(x => x._1 == t && x._2 == 1L)
      }
      assert(got.getLong(0) === nTimes, s"trial $trial n_event_times")
      assert(got.getLong(1) === nEvents, s"trial $trial n_events")
      assert(got.getLong(2) === o1, s"trial $trial o1")
      assert(got.getLong(3) === e1, s"trial $trial e1")
      assert(got.getLong(4) === v, s"trial $trial v")
      val wantChi =
        if (v <= 0L) -1L
        else ((BigInt(1000000) * o1 - e1) * (BigInt(1000000) * o1 - e1) /
          BigInt(v)).toLong
      assert(got.getLong(5) === wantChi, s"trial $trial chi2")
      assert(got.getLong(6) ===
        (if (wantChi >= 3841459L) 1L else 0L), s"trial $trial verdict")
    }
  }
}

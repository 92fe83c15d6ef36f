package graft

import scala.util.Random

import graft.operators.{EventAnalytics, ModelEval}

/** Differential fuzzing for the round-13 randomness/location screens —
  * driver-side first-principles replicas over tie-dense small-grid draws
  * (the RankTestsRandomizedSpec convention): runs test, turning points,
  * Mood's median. The CvM/signed-rank/survival members have their own
  * replicas in ModelEvalSpec / RankTestsRandomizedSpec /
  * SurvivalRandomizedSpec.
  */
class Round13RandomizedSpec extends SparkSpec {
  import spark.implicits._

  private def lowerMedian(vals: Seq[Long]): Long = {
    val sorted = vals.sorted
    sorted(((vals.size + 1) / 2) - 1)
  }

  test("runsTestFromDaily matches a first-principles replica on 20 " +
      "random tie-dense daily draws plus the all-tied degenerate draw") {
    val rnd = new Random(401)
    // trial 0 pins the all-tied group: every day equals the median, so
    // zero sign rows survive — the group must still emit (0, 0, 0, -1)
    // rather than vanish (round-13 ADVICE).
    (0 to 20).foreach { trial =>
      val n = 5 + rnd.nextInt(40)
      val vals =
        if (trial == 0) Seq.fill(n)(3L)
        else (0 until n).map(_ => rnd.nextInt(7).toLong)
      val daily = vals.zipWithIndex
        .map { case (v, i) => ("g", f"d$i%02d", v) }
        .toDF("grp", "day", "dm")
      val got = EventAnalytics.runsTestFromDaily(daily).collect().head
      val med = lowerMedian(vals)
      val signs = vals.filter(_ != med).map(v => if (v > med) 1L else -1L)
      val nPos = signs.count(_ == 1L).toLong
      val nNeg = signs.size - nPos
      val runs = if (signs.isEmpty) 0L
        else 1L + signs.sliding(2).count(p => p.size == 2 && p(0) != p(1))
      assert((got.getLong(1), got.getLong(2), got.getLong(3))
        === ((nPos, nNeg, runs)), s"trial $trial counts")
      val nn = BigInt(nPos + nNeg)
      val m2 = 2 * BigInt(nPos) * nNeg
      val dn = nn * (runs - 1) - m2
      val vterm = m2 * (m2 - nn)
      val want =
        if (vterm <= 0) -1L
        else if (BigInt(625) * dn * dn * (nn - 1) > BigInt(2401) * vterm) 0L
        else 1L
      assert(got.getLong(4) === want, s"trial $trial verdict")
    }
  }

  test("turningPointsFromDaily matches a first-principles replica on 20 " +
      "random draws") {
    val rnd = new Random(409)
    (1 to 20).foreach { trial =>
      val n = 3 + rnd.nextInt(40)
      val vals = (0 until n).map(_ => rnd.nextInt(6).toLong)
      val daily = vals.zipWithIndex
        .map { case (v, i) => ("g", f"d$i%02d", v) }
        .toDF("grp", "day", "dm")
      val got = EventAnalytics.turningPointsFromDaily(daily).collect().head
      val turns = (1 until n - 1).count(i =>
        (vals(i) > vals(i - 1) && vals(i) > vals(i + 1)) ||
          (vals(i) < vals(i - 1) && vals(i) < vals(i + 1))).toLong
      assert((got.getLong(1), got.getLong(2)) === ((n.toLong, turns)),
        s"trial $trial counts")
      val dd = BigInt(3) * turns - 2 * (BigInt(n) - 2)
      val want =
        if (n < 3) -1L
        else if (BigInt(625) * 10 * dd * dd > BigInt(2401) * (16 * BigInt(n) - 29)) 0L
        else 1L
      assert(got.getLong(3) === want, s"trial $trial verdict")
    }
  }

  test("moodMedianTest matches a first-principles replica on 20 random " +
      "tie-dense draws") {
    val rnd = new Random(419)
    (1 to 20).foreach { trial =>
      val k = 2 + rnd.nextInt(4)
      val n = 10 + rnd.nextInt(60)
      val rows = (1 to n).map(_ =>
        (s"c${rnd.nextInt(k)}", rnd.nextInt(6) * 0.5))
      val got = ModelEval.moodMedianTest(rows.toDF("cls", "v"), "cls", "v")
        .collect().head
      val micro = rows.map { case (c, v) => (c, math.round(v * 1e6)) }
      val med = lowerMedian(micro.map(_._2))
      val byCls = micro.groupBy(_._1)
      val kObs = byCls.size.toLong
      val nTot = BigInt(n)
      val mAbove = BigInt(micro.count(_._2 > med))
      assert((got.getLong(0), got.getLong(1), got.getLong(2))
        === ((kObs, n.toLong, mAbove.toLong)), s"trial $trial shape")
      if (kObs < 2 || mAbove == 0 || mAbove == nTot) {
        assert(got.getLong(3) === -2000000L && got.getLong(4) === -1L,
          s"trial $trial sentinel")
      } else {
        val s = byCls.values.map { grp =>
          val nj = BigInt(grp.size)
          val aj = BigInt(grp.count(_._2 > med))
          val dev = aj * nTot - nj * mAbove
          dev * dev / nj
        }.sum
        val want = BigInt(1000000) * s / (mAbove * (nTot - mAbove))
        assert(BigInt(got.getLong(3)) === want, s"trial $trial chi2")
      }
    }
  }
}

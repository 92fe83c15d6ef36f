package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

/** Randomized reference tests for the round-7 event operators: each test
  * generates seeded pseudo-random corpora and checks the distributed
  * operator against a brute-force in-memory implementation of the same
  * published semantics (plus the algebraic invariants that must hold for
  * ANY input — credit conservation, row-stochastic bounds). Deterministic
  * seeds keep failures reproducible.
  */
class InsightRandomizedSpec extends SparkSpec {

  import spark.implicits._

  private val types = Seq("view", "click", "signup", "purchase", "error")

  private def randomEvents(seed: Long, n: Int, users: Int) = {
    val rnd = new Random(seed)
    (1 to n).map { i =>
      (rnd.nextInt(users).toLong + 1, types(rnd.nextInt(types.size)),
        rnd.nextInt(5000).toLong, i.toLong, rnd.nextInt(10000) / 100.0)
    }
  }

  test("attribution: credit conservation + brute-force reference on random corpora") {
    val touchTypes = Seq("view", "click", "signup")
    for (seed <- 1 to 3) {
      val rows = randomEvents(seed, 300, 8)
      val window = 500L + seed * 400L
      val got = EventAnalytics.attributeConversions(
          rows.toDF("u", "et", "tsu", "id", "v"),
          "u", "et", "tsu", "id", "v", touchTypes, "purchase", window)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      // brute force: per conversion, window-filter + (tsu, id)-sort touches
      val byUser = rows.groupBy(_._1)
      val credits = scala.collection.mutable.Map.empty[String, (Long, Long, Long, Long)]
        .withDefaultValue((0L, 0L, 0L, 0L))
      var totalVm = 0L
      byUser.values.foreach { evs =>
        evs.filter(_._2 == "purchase").foreach { c =>
          val vm = math.round(c._5 * 1e6)
          totalVm += vm
          val ts = evs.filter(e => touchTypes.contains(e._2) &&
              e._3 <= c._3 && e._3 >= c._3 - window)
            .sortBy(e => (e._3, e._4))
          if (ts.isEmpty) {
            val (t, f, l, ln) = credits("direct")
            credits("direct") = (t, f + vm, l + vm, ln + vm)
          } else ts.zipWithIndex.foreach { case (e, i) =>
            val (t, f, l, ln) = credits(e._2)
            credits(e._2) = (t + 1,
              f + (if (i == 0) vm else 0L),
              l + (if (i == ts.size - 1) vm else 0L),
              ln + vm / ts.size + (if (i == 0) vm % ts.size else 0L))
          }
        }
      }
      assert(got === credits.toMap, s"seed $seed diverged from reference")
      // conservation: every model distributes exactly the total value
      assert(got.values.map(_._2).sum === totalVm, s"seed $seed first-touch leak")
      assert(got.values.map(_._3).sum === totalVm, s"seed $seed last-touch leak")
      assert(got.values.map(_._4).sum === totalVm, s"seed $seed linear leak")
      val posTotal = EventAnalytics.attributeConversions(
          rows.toDF("u", "et", "tsu", "id", "v"),
          "u", "et", "tsu", "id", "v", touchTypes, "purchase", window)
        .agg(org.apache.spark.sql.functions.sum("position_micro")).head.getLong(0)
      assert(posTotal === totalVm, s"seed $seed U-shape leak")
    }
  }

  test("madOutliers: brute-force rank-median reference on random groups") {
    for (seed <- 1 to 3) {
      val rnd = new Random(seed * 7L)
      val rows = (1 to 400).map { i =>
        (i.toLong, s"g${rnd.nextInt(5)}", (rnd.nextInt(4001) - 2000) / 20.0)
      }
      val got = EventAnalytics.madOutliers(rows.toDF("id", "g", "v"), "g", "v", "id")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      def rankMedian(xs: Seq[Long]): Long = {
        val s = xs.sorted; s((xs.size + 1) / 2 - 1) // smallest with 2*rn >= n
      }
      rows.groupBy(_._2).values.foreach { grp =>
        val xm = grp.map(e => math.round(e._3 * 1e6))
        val med = rankMedian(xm)
        val mad = rankMedian(xm.map(x => math.abs(x - med)))
        grp.foreach { e =>
          val x = math.round(e._3 * 1e6)
          val flag = if (10000L * math.abs(x - med) > 3L * 14826L * mad) 1L else 0L
          assert(got(e._1) === ((med, mad, flag)), s"seed $seed id ${e._1}")
        }
      }
    }
  }

  test("transitionMatrix: brute-force reference + row-stochastic bound") {
    for (seed <- 1 to 3) {
      val rows = randomEvents(seed * 13L, 250, 6)
        // unique (u, tsu) so reference ordering is unambiguous modulo id,
        // matching the operator's (tsu, id) sort key
        .groupBy(e => (e._1, e._3)).map(_._2.head).toSeq
      val got = EventAnalytics.transitionMatrix(
          rows.toDF("u", "et", "tsu", "id", "v"), "u", "et", "tsu", "id")
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val ref = rows.groupBy(_._1).values.flatMap { evs =>
        evs.sortBy(e => (e._3, e._4)).sliding(2).collect {
          case Seq(a, b) => (a._2, b._2)
        }
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val fromTotals = ref.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      assert(got.keySet === ref.keySet, s"seed $seed pair set")
      got.foreach { case ((f, t), (n, nf, ppm)) =>
        assert(n === ref((f, t)), s"seed $seed count $f->$t")
        assert(nf === fromTotals(f), s"seed $seed total $f")
        assert(ppm === 1000000L * n / nf, s"seed $seed ppm $f->$t")
      }
      // rows sum to <= 1e6 (floor) and > 1e6 - |types|
      got.groupBy(_._1._1).foreach { case (f, m) =>
        val s = m.values.map(_._3).sum
        assert(s <= 1000000L && s > 1000000L - types.size, s"seed $seed row $f")
      }
    }
  }

  test("retentionCohorts: brute-force reference on random corpora") {
    for (seed <- 1 to 3) {
      val rnd = new Random(seed * 29L)
      val day = 86400000000L
      val rows = (1 to 300).map { i =>
        (rnd.nextInt(20).toLong + 1, rnd.nextInt(10).toLong * day + rnd.nextInt(1000))
      }
      val got = EventAnalytics.retentionCohorts(rows.toDF("u", "tsu"), "u", "tsu")
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val active = rows.map(e => (e._1, e._2 / day)).distinct
      val cohort = active.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val ref = active.groupBy(e => (cohort(e._1), e._2 - cohort(e._1)))
        .view.mapValues(_.size.toLong).toMap
      assert(got.keySet === ref.keySet, s"seed $seed key set")
      got.foreach { case (k @ (c, _), (n, nc, bps)) =>
        assert(n === ref(k), s"seed $seed count $k")
        assert(nc === ref((c, 0L)), s"seed $seed cohort size $k")
        assert(bps === 10000L * n / nc, s"seed $seed bps $k")
      }
    }
  }
}

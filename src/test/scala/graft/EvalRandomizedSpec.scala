package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.ModelEval

/** Differential fuzzing for the continuation's eval operators: many
  * random draws against independent brute-force references — the
  * property net under the hand-case pins (FeatureRandomizedSpec /
  * InsightRandomizedSpec convention).
  */
class EvalRandomizedSpec extends SparkSpec {

  import spark.implicits._

  test("bhFdr matches a naive step-up reference across 20 random families") {
    val rnd = new Random(101)
    (1 to 20).foreach { trial =>
      val m = 1 + rnd.nextInt(40)
      val ps = (1L to m.toLong).map(t => ("f", t, rnd.nextInt(1000001).toLong))
      val got = ModelEval.bhFdr(ps.toDF("g", "t", "p"), "g", "t", "p")
        .collect().map(r => r.getLong(1) -> r.getLong(5)).toMap
      // reference: sort ascending, k = max rank with p*m*20 <= rank*1e6,
      // reject rank <= k
      val sorted = ps.sortBy(x => (x._3, x._2))
      val k = sorted.zipWithIndex.collect {
        case ((_, _, p), i) if p * m * 20 <= (i + 1).toLong * 1000000L => i + 1
      }.lastOption.getOrElse(0)
      val expected = sorted.zipWithIndex.map { case ((_, t, _), i) =>
        t -> (if (i + 1 <= k) 1L else 0L)
      }.toMap
      assert(got === expected, s"trial $trial (m=$m, k=$k)")
    }
  }

  test("gainChart cumulative counts match a sorted brute force on random draws") {
    val rnd = new Random(103)
    (1 to 5).foreach { trial =>
      val n = 50 + rnd.nextInt(200)
      val rows = (1L to n.toLong).map(id =>
        ("g", rnd.nextInt(30) / 3.0, id, rnd.nextInt(2).toLong))
      val got = ModelEval.gainChart(rows.toDF("g", "s", "id", "y"),
          "g", "s", "id", "y", nBuckets = 5)
        .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(4)))).toMap
      val ranked = rows.sortBy { case (_, s, id, _) => (-math.round(s * 1e6), id) }
      val totalPos = ranked.count(_._4 == 1L).toLong
      val byBucket = ranked.zipWithIndex.groupBy { case (_, i) =>
        (5L * (i + 1) + n - 1) / n
      }
      byBucket.toSeq.sortBy(_._1).foldLeft(0L) { case (cumPos, (b, rs)) =>
        val cp = cumPos + rs.count(_._1._4 == 1L)
        val (gotN, gotGain) = got(b)
        assert(gotN === rs.size.toLong, s"trial $trial bucket $b size")
        if (totalPos > 0)
          assert(gotGain === 1000000L * cp / totalPos, s"trial $trial bucket $b gain")
        cp
      }
    }
  }

  test("thresholdForPrecision is minimal and feasible on random draws") {
    val rnd = new Random(107)
    (1 to 10).foreach { trial =>
      val rows = (1 to 120).map(_ =>
        ("g", rnd.nextInt(25) / 4.0, rnd.nextInt(2).toLong))
      val target = 400000L + rnd.nextInt(400000).toLong
      val r = ModelEval.thresholdForPrecision(rows.toDF("g", "s", "y"),
        "g", "s", "y", target).collect().head
      val sm = rows.map(x => (math.round(x._2 * 1e6), x._3))
      val thr = r.getLong(3)
      if (thr >= 0) {
        // feasibility at thr and infeasibility below
        def prec(cut: Long): (Long, Long) = {
          val kept = sm.filter(_._1 >= cut)
          (kept.count(_._2 == 1L).toLong, kept.length.toLong)
        }
        val (tp, n) = prec(thr)
        assert(1000000L * tp >= target * n, s"trial $trial: chosen cut infeasible")
        sm.map(_._1).filter(_ < thr).distinct.foreach { cut =>
          val (tp2, n2) = prec(cut)
          assert(1000000L * tp2 < target * n2,
            s"trial $trial: lower cut $cut also feasible")
        }
      } else {
        // sentinel: NO cut may be feasible
        sm.map(_._1).distinct.foreach { cut =>
          val kept = sm.filter(_._1 >= cut)
          assert(1000000L * kept.count(_._2 == 1L) < target * kept.length,
            s"trial $trial: sentinel but cut $cut feasible")
        }
      }
    }
  }
}

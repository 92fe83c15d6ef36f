package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.ModelEval

/** Differential fuzzing for the round-12 rank-test family: many random
  * draws against independent BigInt brute-force references computing
  * doubled average ranks from first principles — the property net under
  * the hand-case pins (EvalRandomizedSpec convention). Ties are drawn
  * deliberately dense (values from a tiny grid) so every tie-correction
  * path is exercised.
  */
class RankTestsRandomizedSpec extends SparkSpec {

  import spark.implicits._

  // doubled average rank per value over a pooled multiset: value v's
  // tied block at cumulative offset c with t members reads 2c + t + 1
  private def doubledRanks(values: Seq[Long]): Map[Long, Long] = {
    val blocks = values.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    var cum = 0L
    blocks.map { case (v, t) =>
      val r2 = 2L * cum + t + 1L
      cum += t
      v -> r2
    }.toMap
  }

  test("rankSumTest matches a BigInt doubled-rank reference on 20 random " +
      "tie-dense draws") {
    val rnd = new Random(211)
    (1 to 20).foreach { trial =>
      val n = 10 + rnd.nextInt(60)
      val rows = (1 to n).map { _ =>
        ("g", rnd.nextInt(7) * 0.5, rnd.nextInt(2).toLong)
      }
      val got = ModelEval.rankSumTest(rows.toDF("g", "v", "side"),
        "g", "v", "side").collect().head
      val micro = rows.map { case (_, v, s) => (math.round(v * 1e6), s) }
      val na = micro.count(_._2 == 0L).toLong
      val nb = micro.size - na
      if (na == 0 || nb == 0) {
        assert(got.getLong(3) === -1L && got.getLong(5) === 0L, s"trial $trial")
      } else {
        val r2 = doubledRanks(micro.map(_._1))
        val r2a = micro.filter(_._2 == 0L).map(x => BigInt(r2(x._1))).sum
        val u2a = r2a - BigInt(na) * (na + 1)
        val dev = u2a - BigInt(na) * nb
        assert(BigInt(got.getLong(3)) === u2a, s"trial $trial u2")
        val nTot = BigInt(micro.size)
        val tieT = micro.map(_._1).groupBy(identity).values
          .map(g => BigInt(g.size).pow(3) - g.size).sum
        val lhs = BigInt(625) * 3 * dev * dev * nTot * (nTot - 1)
        val rhs = BigInt(2401) * na * nb * (nTot * (nTot - 1) * (nTot + 1) - tieT)
        assert(got.getLong(5) === (if (lhs > rhs) 1L else 0L),
          s"trial $trial significance")
      }
    }
  }

  test("kruskalWallis matches a BigInt reference on 20 random tie-dense " +
      "draws") {
    val rnd = new Random(223)
    (1 to 20).foreach { trial =>
      val k = 2 + rnd.nextInt(4)
      val n = 12 + rnd.nextInt(60)
      val rows = (1 to n).map { _ =>
        (s"c${rnd.nextInt(k)}", rnd.nextInt(6) * 0.25)
      }
      val got = ModelEval.kruskalWallis(rows.toDF("cls", "v"), "cls", "v")
        .collect().head
      val micro = rows.map { case (c, v) => (c, math.round(v * 1e6)) }
      val kObs = micro.map(_._1).distinct.size.toLong
      val nTot = micro.size.toLong
      val r2 = doubledRanks(micro.map(_._2))
      val s = micro.groupBy(_._1).values.map { grp =>
        val r2j = grp.map(x => BigInt(r2(x._2))).sum
        r2j * r2j / grp.size // truncating per-class DIV, same order
      }.sum
      val tieT = micro.map(_._2).groupBy(identity).values
        .map(g => BigInt(g.size).pow(3) - g.size).sum
      val den = BigInt(nTot).pow(3) - nTot - tieT
      assert(got.getLong(0) === kObs && got.getLong(1) === nTot, s"trial $trial")
      if (kObs < 2 || den <= 0) {
        assert(got.getLong(2) === -2000000L && got.getLong(3) === -1L,
          s"trial $trial sentinel")
      } else {
        val want = BigInt(1000000) * 3 *
          (s - BigInt(nTot) * (nTot + 1) * (nTot + 1)) * (nTot - 1) / den
        assert(BigInt(got.getLong(2)) === want, s"trial $trial h")
      }
    }
  }

  test("friedmanTest matches a BigInt reference on 20 random tie-dense " +
      "complete-block draws") {
    val rnd = new Random(227)
    (1 to 20).foreach { trial =>
      val k = 2 + rnd.nextInt(4)
      val nSubj = 3 + rnd.nextInt(10)
      val rows = for {
        s <- 1 to nSubj; j <- 0 until k
      } yield (s"s$s", s"sys$j", rnd.nextInt(4) * 0.5)
      val got = ModelEval.friedmanTest(
        rows.toDF("subj", "sys", "v"), "subj", "sys", "v").collect().head
      // reference: within-subject doubled average ranks
      val bySubj = rows.groupBy(_._1)
      val r2All = bySubj.values.toSeq.flatMap { cells =>
        val r2 = doubledRanks(cells.map(c => math.round(c._3 * 1e6)))
        cells.map(c => (c._2, BigInt(r2(math.round(c._3 * 1e6)))))
      }
      val a2 = r2All.map { case (_, r) => r * r }.sum
      val r2j = r2All.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val s2 = r2j.values.map { r =>
        val dev = r - BigInt(nSubj) * (k + 1); dev * dev
      }.sum
      val den = a2 - BigInt(nSubj) * k * (k + 1) * (k + 1)
      assert(got.getLong(0) === k.toLong && got.getLong(1) === nSubj.toLong,
        s"trial $trial shape")
      if (den <= 0) {
        assert(got.getLong(2) === -2000000L && got.getLong(3) === -1L,
          s"trial $trial sentinel")
      } else {
        val want = BigInt(1000000) * (k - 1) * s2 / den
        assert(BigInt(got.getLong(2)) === want, s"trial $trial q")
      }
    }
  }

  test("signedRankTest matches a BigInt doubled-rank reference on 20 " +
      "random tie-dense paired draws (zero diffs and incomplete pairs " +
      "dropped)") {
    val rnd = new Random(229)
    (1 to 20).foreach { trial =>
      val nSubj = 6 + rnd.nextInt(30)
      // one value per (subject, side); ~15% of subjects miss side 1
      val rows = (1 to nSubj).flatMap { s =>
        val both = rnd.nextInt(7) > 0
        Seq((s"g", s.toLong, rnd.nextInt(5) * 0.5, 0L)) ++
          (if (both) Seq((s"g", s.toLong, rnd.nextInt(5) * 0.5, 1L)) else Nil)
      }
      val gotRows = ModelEval.signedRankTest(
        rows.toDF("grp", "subj", "v", "side"), "grp", "subj", "v", "side")
        .collect()
      // reference: paired micro diffs, doubled ranks over |d|
      val bySubj = rows.groupBy(_._2)
      val diffs = bySubj.values.toSeq.flatMap { rs =>
        val s0 = rs.find(_._4 == 0L).map(r => math.round(r._3 * 1e6))
        val s1 = rs.find(_._4 == 1L).map(r => math.round(r._3 * 1e6))
        for (a <- s0; b <- s1; if b - a != 0L) yield b - a
      }
      if (diffs.isEmpty) {
        assert(gotRows.isEmpty, s"trial $trial expected no row")
      } else {
        val got = gotRows.head
        val n = diffs.size.toLong
        val r2 = doubledRanks(diffs.map(math.abs))
        val w2p = diffs.filter(_ > 0).map(dd => BigInt(r2(math.abs(dd)))).sum
        val tieT = diffs.map(math.abs).groupBy(identity).values
          .map(g => BigInt(g.size).pow(3) - g.size).sum
        val dev = 2 * w2p - BigInt(n) * (n + 1)
        assert(got.getLong(1) === n, s"trial $trial n")
        assert(BigInt(got.getLong(2)) === w2p, s"trial $trial w2+")
        assert(got.getLong(3) === dev.signum.toLong, s"trial $trial sign")
        val lhs = BigInt(625) * 3 * dev * dev
        val rhs = BigInt(2401) *
          (2 * BigInt(n) * (n + 1) * (2 * n + 1) - tieT)
        assert(got.getLong(4) === (if (lhs > rhs) 1L else 0L),
          s"trial $trial verdict")
      }
    }
  }
}

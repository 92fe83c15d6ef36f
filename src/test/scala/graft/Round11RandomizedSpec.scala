package graft

import scala.util.Random

import graft.functions.HoltFunctions
import graft.operators.TextPipeline

/** Differential fuzzing for the round-11 folds: Holt-Winters against an
  * independent BigInt replica across random parameters/series/periods,
  * and unigram cross-entropy against a driver-side replica on random
  * corpora (duplicates, empty docs, skewed vocabularies).
  */
class Round11RandomizedSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(1107)

  test("foldWintersOracle == BigInt replica on random series and parameters") {
    for (trial <- 1 to 25) {
      val m = 1 + rnd.nextInt(9)
      val n = rnd.nextInt(120)
      val a = rnd.nextInt(1000001).toLong
      val beta = rnd.nextInt(1000001).toLong
      val g = rnd.nextInt(1000001).toLong
      val xs = Seq.fill(n)((rnd.nextDouble() - 0.3) * 2000.0)
      var l = BigInt(0); var b = BigInt(0)
      val ring = Array.fill(m)(BigInt(0))
      xs.zipWithIndex.foreach { case (x, t) =>
        val xm = BigInt(math.round(x * 1e6))
        val sOld = ring(t % m)
        val lNew = (a * (xm - sOld) + (1000000L - a) * (l + b)) / 1000000
        b = (beta * (lNew - l) + (1000000L - beta) * b) / 1000000
        ring(t % m) = (g * (xm - lNew) + (1000000L - g) * sOld) / 1000000
        l = lNew
      }
      val got = HoltFunctions.foldWintersOracle(xs, a, beta, g, m)
      assert(got.level_micro === l.toLong && got.trend_micro === b.toLong &&
        got.season_micro === ring(n % m).toLong,
        s"trial $trial (n=$n m=$m a=$a b=$beta g=$g) diverged")
    }
  }

  test("unigramCrossEntropy == driver replica on random corpora") {
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    for (trial <- 1 to 3) {
      val nDocs = 2 + rnd.nextInt(20)
      val docs = (1L to nDocs.toLong).map { id =>
        val len = rnd.nextInt(12) // 0-length docs exercise the sentinel
        (id, Seq.fill(len)(vocab(rnd.nextInt(1 + rnd.nextInt(vocab.size)))).mkString(" "))
      }
      // driver replica with the operator's arithmetic
      val toks = docs.map { case (id, t) =>
        id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      }.toMap
      val cnt = toks.values.flatten.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
      val nv = cnt.values.sum + cnt.size
      def s(t: String): Long = math.round(1e6 * math.log(nv.toDouble / (cnt(t) + 1)))
      val expected = docs.map { case (id, _) =>
        val ts = toks(id)
        if (ts.isEmpty) id -> ((0L, -1L))
        else id -> ((ts.size.toLong,
          ts.map(t => BigInt(s(t))).sum.toLong / ts.size))
      }.toMap
      val got = TextPipeline.unigramCrossEntropy(
          docs.toDF("doc_id", "text"), "text", "doc_id")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got === expected, s"trial $trial (nDocs=$nDocs) diverged")
      graft.operators.Dedup.releaseCaches()
    }
  }

  test("cusumUdaf == independent driver fold on random series, params, " +
      "and row orders") {
    import graft.functions.CusumFunctions
    for (trial <- 1 to 10) {
      val n = rnd.nextInt(60)
      val slack = rnd.nextInt(3000000).toLong
      val h = 1L + rnd.nextInt(8000000).toLong
      val devs = (1 to n).map(i =>
        (f"d$i%03d", (rnd.nextInt(9000001) - 4500000).toLong))
      // independent re-derivation of Page's recursion
      var sh = 0L; var sl = 0L; var ah = 0L; var al = 0L; var fa = ""
      devs.foreach { case (ord, dv) =>
        val sh0 = math.max(0L, sh + dv - slack)
        val sl0 = math.max(0L, sl - dv - slack)
        if (sh0 > h) { ah += 1; if (fa.isEmpty) fa = ord; sh = 0L } else sh = sh0
        if (sl0 > h) { al += 1; if (fa.isEmpty) fa = ord; sl = 0L } else sl = sl0
      }
      val want = CusumFunctions.CusumState(sh, sl, ah, al, fa)
      assert(CusumFunctions.foldOracle(devs, slack, h) === want,
        s"trial $trial foldOracle diverged")
      if (n > 0) {
        val udaf = CusumFunctions.cusumUdaf(slack, h)
        val got = rnd.shuffle(devs).map { case (o, dv) => ("k", o, 0L, dv) }
          .toDF("k", "ord", "seq", "dev")
          .repartition(1 + rnd.nextInt(6))
          .groupBy($"k").agg(udaf($"ord", $"seq", $"dev").as("st"))
          .select($"st.*").as[CusumFunctions.CusumState].head()
        assert(got === want, s"trial $trial (n=$n slack=$slack h=$h) diverged")
      }
    }
  }

  test("bm25TopK == independent BigInt replica on random corpora and queries") {
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    for (trial <- 1 to 3) {
      val nDocs = 2 + rnd.nextInt(12)
      val docs = (1L to nDocs.toLong).map { id =>
        (id, Seq.fill(rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val terms = rnd.shuffle(vocab ++ Seq("zz")).take(1 + rnd.nextInt(3))
      val toks = docs.map { case (id, t) =>
        id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      }.toMap
      val l = toks.values.map(_.size.toLong).sum
      val nD = nDocs.toLong
      val df = toks.values.flatMap(_.distinct).groupBy(identity)
        .map { case (t, o) => t -> o.size.toLong }
      def idf(t: String): Long =
        math.round(1e6 * math.log((nD + 1.0) / (df(t) + 0.5)))
      val expected = (for {
        (id, ts) <- toks.toSeq if ts.nonEmpty
        matched = terms.filter(ts.contains)
        if matched.nonEmpty
      } yield {
        val dl = ts.size.toLong
        val score = matched.map { t =>
          val tf = ts.count(_ == t).toLong
          (BigInt(idf(t)) * 2200000 * tf * l /
            (BigInt(1000000) * tf * l + BigInt(300000) * l +
              BigInt(900000) * dl * nD)).toLong
        }.sum
        (id, matched.size.toLong, score)
      }).sortBy { case (id, _, sc) => (-sc, id) }
        .zipWithIndex.map { case ((id, m, sc), i) => id -> ((i + 1, m, sc)) }
        .toMap
      val qs = terms.map(t => (1L, t)).toDF("query_id", "term")
      val got = TextPipeline.bm25TopK(
          docs.toDF("doc_id", "text"), "text", "doc_id", qs, k = 1000)
        .collect()
        .map(r => r.getLong(2) -> ((r.getInt(1), r.getLong(3), r.getLong(4))))
        .toMap
      assert(got === expected,
        s"trial $trial (nDocs=$nDocs terms=${terms.mkString(",")}) diverged")
      graft.operators.Dedup.releaseCaches()
    }
  }
}

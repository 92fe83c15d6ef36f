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
}

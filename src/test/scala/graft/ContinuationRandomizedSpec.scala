package graft

import scala.util.Random

import graft.operators.{DataPrep, EventAnalytics}

/** Differential fuzzing for the continuation operators: the histogram
  * closed-form paths (Lorenz, trimmed mean, Hill) against brute-force
  * sorted-row replicas, and Mann-Kendall against a pairwise BigInt
  * replica — random sizes, tie-heavy value grids, negatives/zeros, and
  * gapped calendars.
  */
class ContinuationRandomizedSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(2311)

  test("lorenzCurve and trimmedMeanBps == brute-force sorted replicas " +
      "on random tie-heavy data") {
    for (trial <- 1 to 12) {
      val n = 1 + rnd.nextInt(40)
      // a small value grid forces tied blocks; negatives exercise the
      // lorenz drop and the trimmed keep
      val vals = Seq.fill(n)((rnd.nextInt(9) - 2) * 0.5)
      val df = vals.map(("g", _)).toDF("g", "v")
      val micro = vals.map(v => math.round(v * 1e6))

      // lorenz replica: non-negative sorted ascending, bottom-k shares
      val keep = micro.filter(_ >= 0L).sorted
      val tot = keep.map(BigInt(_)).sum
      if (keep.nonEmpty) {
        val buckets = 2 + rnd.nextInt(9)
        val got = DataPrep.lorenzCurve(df, "g", "v", buckets)
          .collect().map(r => r.getInt(1) ->
            ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
        (1 to buckets).foreach { d =>
          val kd = d.toLong * keep.length / buckets
          val share =
            if (tot == 0) -1L
            else (BigInt(1000000) * keep.take(kd.toInt).map(BigInt(_)).sum / tot).toLong
          assert(got(d) === ((kd, keep.length.toLong, share)),
            s"trial $trial lorenz d=$d")
        }
      }

      // trimmed replica: any-sign sorted, keep ranks (klo, khi]
      val s = micro.sorted
      val lo = rnd.nextInt(5000)
      val hiC = math.min(10000, lo + 1 + rnd.nextInt(10000 - lo))
      val kLo = (lo.toLong * n / 10000).toInt
      val kHi = (hiC.toLong * n / 10000).toInt
      val want =
        if (kHi == kLo) -1L
        else (s.slice(kLo, kHi).map(BigInt(_)).sum / (kHi - kLo)).toLong
      val gotT = DataPrep.trimmedMeanBps(df, "g", "v", lo, hiC)
        .collect().head
      assert((gotT.getLong(2), gotT.getLong(3), gotT.getLong(4)) ===
        ((kLo.toLong, kHi.toLong, want)), s"trial $trial trimmed ($lo,$hiC)")
    }
  }

  test("hillTailIndex == brute-force order-statistics replica on random " +
      "positive-heavy data") {
    for (trial <- 1 to 12) {
      val n = 3 + rnd.nextInt(40)
      val vals = Seq.fill(n)(math.pow(2.0, rnd.nextInt(10)) *
        (if (rnd.nextInt(8) == 0) 0.0 else 1.0))
      val k = 2 + rnd.nextInt(6)
      val df = vals.map(("g", _)).toDF("g", "v")
      val pos = vals.map(v => math.round(v * 1e6)).filter(_ > 0L)
      val desc = pos.sorted(Ordering[Long].reverse)
      val (thr, sumLn, alpha) =
        if (pos.length <= k) (-1L, 0L, -1L)
        else {
          val t = desc(k)
          val sl = desc.take(k).filter(_ > t)
            .map(v => math.round(1e6 * math.log(v.toDouble / t))).sum
          val a = if (sl == 0) -1L
            else (BigInt(1000000) * k * 1000000 / sl).toLong
          (t, sl, a)
        }
      if (pos.nonEmpty) {
        val r = DataPrep.hillTailIndex(df, "g", "v", k).collect().head
        assert((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)) ===
          ((pos.length.toLong, thr, sumLn, alpha)),
          s"trial $trial hill k=$k n=${pos.length}")
      }
    }
  }

  test("mannKendall == pairwise BigInt replica on random gapped tied " +
      "series") {
    for (trial <- 1 to 12) {
      val nDays = 1 + rnd.nextInt(25)
      var date = java.time.LocalDate.parse("2024-02-01")
      val series = (1 to nDays).map { _ =>
        date = date.plusDays(1 + rnd.nextInt(3)) // gapped calendar
        (date.toString, (rnd.nextInt(7) - 2) * 1.5) // tie-heavy grid
      }
      if (series.nonEmpty) {
        val df = series.map { case (d, v) => ("g", d, v) }
          .toDF("event_type", "d", "value")
          .withColumn("ts",
            org.apache.spark.sql.functions.to_timestamp(
              org.apache.spark.sql.functions.col("d")))
        val pts = series.map { case (d, v) =>
          (java.time.LocalDate.parse(d).toEpochDay, math.round(v * 1e6)) }
        val pairs = for {
          i <- pts.indices; j <- pts.indices if pts(i)._1 < pts(j)._1
        } yield (pts(j)._2 - pts(i)._2, pts(j)._1 - pts(i)._1)
        val sStat = pairs.map { case (d, _) => d.sign.toLong }.sum
        val nn = pts.length.toLong
        val tie = pts.groupBy(_._2).values
          .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
        val varNum = nn * (nn - 1) * (2 * nn + 5) - tie
        val slopes = pairs
          .map { case (d, dt) => (BigInt(1000) * d / dt).toLong }.sorted
        val sen = if (slopes.isEmpty) 0L
          else slopes((slopes.length + 1) / 2 - 1)
        val z = if (varNum <= 0) -2000000L
          else math.round(1e6 * (sStat - sStat.sign) / math.sqrt(varNum / 18.0))
        val r = EventAnalytics.mannKendall(df, "ts", "value", "event_type")
          .collect().head
        assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)) ===
          ((nn, pairs.length.toLong, sStat, varNum, sen, z)),
          s"trial $trial mk n=$nn")
      }
    }
  }
}

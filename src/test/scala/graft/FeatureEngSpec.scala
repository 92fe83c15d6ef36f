package graft

import org.apache.spark.sql.functions._

import graft.operators.FeatureEng

class FeatureEngSpec extends SparkSpec {

  import spark.implicits._

  // ---------------------------------------------------------- quantileBin

  test("quantileBin: hand case — rational rank ratio, id tie-break, per-group") {
    // group A: values 1..5 -> 2 bins: ranks 1,2 -> bin 0; 3,4,5 -> ... with
    // nBins=2, bin = (2*(rn-1)) DIV 5: rn 1,2,3 -> 0; rn 4,5 -> 1
    val d = Seq((1L, "A", 0.000001), (2L, "A", 0.000002), (3L, "A", 0.000003),
      (4L, "A", 0.000004), (5L, "A", 0.000005),
      (6L, "B", 0.000009), (7L, "B", 0.000009)) // tie: id order decides ranks
      .toDF("id", "g", "v")
    val got = FeatureEng.quantileBin(d, "g", "v", "id", nBins = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L,
      6L -> 0L, 7L -> 1L))
  }

  test("quantileBin: decile sizes on the corpus are equal within 1 row per group") {
    val got = FeatureEng.quantileBin(
        Tables.events(spark, sfDir), "event_type", "value", "event_id", nBins = 10)
      .groupBy(col("grp"), col("bin")).count()
      .groupBy(col("grp"))
      .agg((max(col("count")) - min(col("count"))).as("spread"),
        count_distinct(col("bin")).as("nb"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("spread") <= 1L, s"unequal bins: $r")
      assert(r.getAs[Long]("nb") === 10L, s"missing bins: $r")
    }
  }

  // ---------------------------------------------------------- targetEncode

  test("targetEncode: leave-one-out means by hand, singleton sentinel") {
    // cat X: targets 1, 2, 3 (micro 1e6, 2e6, 3e6):
    //   id1 -> (2+3)/2 = 2.5e6; id2 -> (1+3)/2 = 2e6; id3 -> 1.5e6
    // cat Y: a single row -> -1 sentinel
    val d = Seq((1L, "X", 1.0), (2L, "X", 2.0), (3L, "X", 3.0), (4L, "Y", 9.0))
      .toDF("id", "c", "t")
    val got = FeatureEng.targetEncode(d, "c", "t", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(1L -> 2500000L, 2L -> 2000000L, 3L -> 1500000L, 4L -> -1L))
  }

  test("targetEncode rejects negative targets (DIV is not floor below zero)") {
    val d = Seq((1L, "X", -1.0), (2L, "X", 2.0)).toDF("id", "c", "t")
    val ex = intercept[Exception] {
      FeatureEng.targetEncode(d, "c", "t", "id").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("negative target")), msgs(ex).mkString("; "))
  }

  // ----------------------------------------------------------- kFoldAssign

  test("kFoldAssign: folds in range, every fold populated, repartition-stable") {
    val d = Tables.events(spark, sfDir).select(col("event_id"))
    val a = FeatureEng.kFoldAssign(d, "event_id", k = 5)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("fold")).toMap
    assert(a.values.forall(f => f >= 0L && f <= 4L))
    assert(a.values.toSet.size === 5, "all 5 folds should be populated")
    // each fold holds roughly 1/5 of rows (md5 is uniform; allow 3x slack)
    val sizes = a.values.groupBy(identity).view.mapValues(_.size).values
    assert(sizes.min > a.size / 15, s"fold sizes badly skewed: $sizes")
    val b = FeatureEng.kFoldAssign(d.repartition(7), "event_id", k = 5)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("fold")).toMap
    assert(a === b, "fold assignment must not depend on partitioning")
  }

  // ------------------------------------------------------------- winsorize

  test("winsorize: hand case — tails clamp to the cut values, middle unchanged") {
    // 10 values 1..10 micro=1e6..10e6, lowBps=2000 highBps=8000:
    //   rlo = ceil(0.2*10)=2 -> lo = value@rank2 = 2e6
    //   rhi = ceil(0.8*10)=8 -> hi = value@rank8 = 8e6
    val d = (1L to 10L).map(i => (i, "G", i.toDouble)).toDF("id", "g", "v")
    val got = FeatureEng.winsorize(d, "g", "v", "id", lowBps = 2000, highBps = 8000)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(1L) === 2000000L && got(2L) === 2000000L)
    (3L to 8L).foreach(i => assert(got(i) === i * 1000000L))
    assert(got(9L) === 8000000L && got(10L) === 8000000L)
  }

  test("winsorize: output value distribution is bounded by the cuts on the corpus") {
    val out = FeatureEng.winsorize(
      Tables.events(spark, sfDir), "event_type", "value", "event_id")
    val chk = out.groupBy(col("grp"))
      .agg(min(col("winsorized_micro")).as("lo"), max(col("winsorized_micro")).as("hi"),
        min(col("value_micro")).as("rawlo"), max(col("value_micro")).as("rawhi"),
        count(lit(1)).as("n"))
      .collect()
    chk.foreach { r =>
      assert(r.getAs[Long]("lo") >= r.getAs[Long]("rawlo"))
      assert(r.getAs[Long]("hi") <= r.getAs[Long]("rawhi"))
    }
    assert(out.count() === Tables.events(spark, sfDir).count(),
      "winsorize keeps the row count")
  }

  // ----------------------------------------------------- cooccurrencePairs

  test("cooccurrencePairs: hand case — window, direction, session isolation") {
    // sess 1: A B C D (window 2): AB AC BC BD CD; sess 2: X A -> XA only
    // (no cross-session pairs)
    val d = Seq((1L, "A", 10L, 1L), (1L, "B", 20L, 2L), (1L, "C", 30L, 3L),
      (1L, "D", 40L, 4L), (2L, "X", 10L, 5L), (2L, "A", 20L, 6L))
      .toDF("s", "item", "tsu", "id")
    val got = FeatureEng.cooccurrencePairs(d, "s", "item", "tsu", "id", windowSize = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("A", "B") -> 1L, ("A", "C") -> 1L, ("B", "C") -> 1L,
      ("B", "D") -> 1L, ("C", "D") -> 1L, ("X", "A") -> 1L))
  }

  test("cooccurrencePairs: equal timestamps order by id; window 1 = adjacent only") {
    val d = Seq((1L, "A", 5L, 1L), (1L, "B", 5L, 2L), (1L, "C", 5L, 3L))
      .toDF("s", "item", "tsu", "id")
    val got = FeatureEng.cooccurrencePairs(d, "s", "item", "tsu", "id", windowSize = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("A", "B"), ("B", "C")))
  }

  // ----------------------------------------------------------- corrPearson

  test("corrPearson: perfect line reads 1e6, anti-line -1e6, constant the sentinel") {
    val up = (1 to 20).map(i => ("U", i.toDouble, i.toLong))
    val down = (1 to 20).map(i => ("D", i.toDouble, (100 - i).toLong))
    val flat = (1 to 20).map(i => ("F", 7.0, i.toLong)) // zero x-variance
    val d = (up ++ down ++ flat).zipWithIndex
      .map { case ((g, x, y), i) => (i.toLong, g, x, y) }.toDF("id", "g", "x", "y")
    val got = FeatureEng.corrPearson(d, "g", "x", "y")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("U") === 1000000L)
    assert(got("D") === -1000000L)
    // the zero-variance sentinel deliberately shares -1e6 with a perfect
    // anti-correlation (both mean "don't use this feature pair as-is")
    assert(got("F") === -1000000L)
  }

  test("corrPearson is deterministic under repartitioning (integer moments)") {
    val ev = Tables.events(spark, sfDir)
      .withColumn("tsu", unix_micros(col("ts")))
      .withColumn("hour", expr("(tsu DIV 3600000000) % 24"))
    val a = FeatureEng.corrPearson(ev, "event_type", "value", "hour")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val b = FeatureEng.corrPearson(ev.repartition(13), "event_type", "value", "hour")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(a === b)
    assert(a.values.forall(v => v >= -1000000L && v <= 1000000L))
  }

  // ------------------------------------------------------------------- psi

  test("psi: identical distributions read ~0, a hard shift reads large") {
    // identical: each side 50 rows uniform over bins 0..4 -> every term 0
    val same = (0 until 50).map(i => (i.toLong, "G", (i % 5) * 50.0)).toDF("id", "g", "v")
    val psiSame = FeatureEng.psi(same, same, "g", "v", binWidthMicro = 50000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(psiSame("G") === 0L)
    // hard shift: ref mass in bins 0-1, cur mass in bins 8-9 -> PSI >> 0.25
    val ref = (0 until 50).map(i => (i.toLong, "G", (i % 2) * 50.0)).toDF("id", "g", "v")
    val cur = (0 until 50).map(i => (i.toLong, "G", 400.0 + (i % 2) * 50.0)).toDF("id", "g", "v")
    val psiShift = FeatureEng.psi(ref, cur, "g", "v", binWidthMicro = 50000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(psiShift("G") > 250000L, s"hard drift must exceed 0.25: ${psiShift("G")}")
  }

  test("psi: empty bins on one side are smoothed, never divide by zero") {
    val ref = Seq((1L, "G", 10.0), (2L, "G", 10.0)).toDF("id", "g", "v")
    val cur = Seq((3L, "G", 460.0)).toDF("id", "g", "v")
    val got = FeatureEng.psi(ref, cur, "g", "v", binWidthMicro = 50000000L).collect()
    assert(got.length === 1 && got.head.getLong(1) > 0L)
    assert(got.head.getAs[Long]("n_bins") === 2L)
  }

  // ---------------------------------------------------------------- abTest

  test("abTest: strong lift significant, even split not, degenerate pools never") {
    val m = Seq(
      ("strong", 90L, 100L, 10L, 100L), // obvious win
      ("even", 50L, 100L, 50L, 100L), // identical arms
      ("allzero", 0L, 100L, 0L, 100L), // zero pooled variance
      ("allone", 100L, 100L, 50L, 50L)) // saturated pool
      .toDF("metric", "x1", "n1", "x2", "n2")
    val got = FeatureEng.abTest(m, "metric", "x1", "n1", "x2", "n2")
      .collect().map(r => r.getString(0) -> (r.getLong(5), r.getLong(6))).toMap
    assert(got("strong") === ((1L, 1L)))
    assert(got("even") === ((0L, 0L)))
    assert(got("allzero") === ((0L, 0L)))
    assert(got("allone") === ((0L, 0L)), "saturated pool has zero variance")
  }

  test("abTest verdicts match the float z-test on random inputs") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 200).map { i =>
      val n1 = 20L + rnd.nextInt(500)
      val n2 = 20L + rnd.nextInt(500)
      (s"m$i", rnd.nextInt(n1.toInt + 1).toLong, n1, rnd.nextInt(n2.toInt + 1).toLong, n2)
    }
    val got = FeatureEng.abTest(rows.toDF("metric", "x1", "n1", "x2", "n2"),
        "metric", "x1", "n1", "x2", "n2")
      .collect().map(r => r.getString(0) -> r.getLong(6)).toMap
    rows.foreach { case (m, x1, n1, x2, n2) =>
      val p = (x1 + x2).toDouble / (n1 + n2)
      val want =
        if (p == 0.0 || p == 1.0) 0L
        else {
          val z = (x1.toDouble / n1 - x2.toDouble / n2) /
            math.sqrt(p * (1 - p) * (1.0 / n1 + 1.0 / n2))
          if (z * z >= 2401.0 / 625.0) 1L else 0L
        }
      assert(got(m) === want, s"$m x1=$x1 n1=$n1 x2=$x2 n2=$n2")
    }
  }

  // ------------------------------------------------------- negativeSamples

  test("negativeSamples: k per pair, in-vocab, deterministic, collisions flagged") {
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val vocab = (1L to 50L).toDF("item")
    val out = FeatureEng.negativeSamples(pairs, "a", "b", vocab, "item", k = 4)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> (r.getLong(3), r.getLong(4)))
    assert(rows.length === 8, "k negatives per pair")
    assert(rows.map(_._1).toSet.size === 8, "ranks 0..3 per pair, no dups")
    assert(rows.forall { case (_, (neg, _)) => neg >= 1L && neg <= 50L }, "in vocab")
    rows.foreach { case ((a, b, _), (neg, coll)) =>
      assert((coll === 1L) === (neg === a || neg === b), "collision flag is honest")
    }
    val again = FeatureEng.negativeSamples(
        pairs.repartition(5), "a", "b", vocab.repartition(3), "item", k = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> (r.getLong(3), r.getLong(4)))
    assert(rows.toMap === again.toMap, "md5 draw is partitioning-independent")
  }

  test("negativeSamples: a 2-item vocab forces flagged collisions, never resamples") {
    val pairs = Seq((7L, 8L)).toDF("a", "b")
    val vocab = Seq(7L, 8L).toDF("item")
    val out = FeatureEng.negativeSamples(pairs, "a", "b", vocab, "item", k = 6)
      .collect()
    assert(out.length === 6)
    assert(out.forall(_.getLong(4) === 1L), "every draw collides and says so")
  }

  test("negativeSamples: oversized vocabulary trips the catalog guard") {
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val vocab = (1L to 50L).toDF("item")
    val ex = intercept[IllegalArgumentException] {
      FeatureEng.negativeSamples(pairs, "a", "b", vocab, "item", k = 2,
        maxVocab = 10L)
    }
    assert(ex.getMessage.contains("maxVocab"),
      s"expected the vocab-cardinality guard, got: ${ex.getMessage}")
  }

  test("abTest: arm sizes past the decimal(38,0) window raise, never NULL") {
    // n1 = n2 = 2e9, full separation: critQ*num^2*N ~ 2.4e39 would
    // silently overflow-to-NULL without the guard
    val m = Seq(("huge", 2000000000L, 2000000000L, 0L, 2000000000L))
      .toDF("metric", "x1", "n1", "x2", "n2")
    val ex = intercept[Exception] {
      FeatureEng.abTest(m, "metric", "x1", "n1", "x2", "n2").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("overflow")),
      s"expected the overflow guard, got: ${msgs(ex).mkString("; ")}")
    // and a big-but-safe row still decides exactly (num small, N large)
    val ok = Seq(("fine", 1000000L, 100000000L, 999000L, 100000000L))
      .toDF("metric", "x1", "n1", "x2", "n2")
    val got = FeatureEng.abTest(ok, "metric", "x1", "n1", "x2", "n2").collect()
    assert(got.length === 1 && !got.head.isNullAt(6), "verdict must be non-NULL")
  }

  // --------------------------------------------------------- resampleFfill

  test("resampleFfill: gaps carry forward, leading gap is the sentinel, last obs wins") {
    // grp G buckets: 10 -> two obs (later one wins), 11 missing, 12 obs;
    // grp H starts with a value immediately
    val d = Seq(
      (1L, "G", 1000L, 1.0), (2L, "G", 1050L, 2.0), // bucket 10, id 2 later
      (3L, "G", 1250L, 9.0), // bucket 12
      (4L, "H", 1120L, 5.0)) // bucket 11
      .toDF("id", "g", "tsu", "v")
    val got = FeatureEng.resampleFfill(d, "g", "tsu", "v", "id", bucketMicros = 100L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(
      ("G", 10L) -> ((2000000L, 1L)), // the LATER obs in the bucket
      ("G", 11L) -> ((2000000L, 0L)), // gap: carried forward, flagged filled
      ("G", 12L) -> ((9000000L, 1L)),
      ("H", 11L) -> ((5000000L, 1L))))
  }

  test("resampleFfill: equal timestamps break by id; span is per group") {
    val d = Seq((1L, "G", 500L, 1.0), (2L, "G", 500L, 3.0)).toDF("id", "g", "tsu", "v")
    val got = FeatureEng.resampleFfill(d, "g", "tsu", "v", "id", bucketMicros = 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(("G", 0L) -> 3000000L), "higher id wins the (ts, id) tie")
  }

  // ------------------------------------------------------ crossCorrelation

  test("crossCorrelation: a constructed 2-bucket lead shows up at lag 2") {
    // A fires in buckets 0,1 (10 each); B fires in buckets 2,3 (10 each):
    // lag 0: no shared bucket; lag 1: A@1*B@2; lag 2: A@0*B@2 + A@1*B@3;
    // lag 3: A@0*B@3
    val bucket = 100L
    val evs =
      (0 until 10).map(i => ("a", 0L * bucket + i)) ++
        (0 until 10).map(i => ("a", 1L * bucket + i)) ++
        (0 until 10).map(i => ("b", 2L * bucket + i)) ++
        (0 until 10).map(i => ("b", 3L * bucket + i))
    val d = evs.zipWithIndex.map { case ((t, ts), i) => (i.toLong, t, ts) }
      .toDF("id", "et", "tsu")
    val got = FeatureEng.crossCorrelation(d, "et", "tsu", "a", "b",
        bucketMicros = bucket, maxLag = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.get(0L).isEmpty, "no overlapping buckets at lag 0")
    assert(got(1L) === ((100L, 1L)))
    assert(got(2L) === ((200L, 2L)))
    assert(got(3L) === ((100L, 1L)))
  }

  // -------------------------------------------------------- corrSpearman

  test("corrSpearman: monotone maps to ±1e6 exactly (ties included), " +
      "0.5 hand case, zero-variance sentinel") {
    // A: y strictly increasing in x (nonlinearly) -> rho = 1 exactly
    // B: x has ties, y anti-monotone with matching tie shape -> rho = -1
    // C: x=[1,2,3], y=[1,3,2] -> rho = 0.5 exactly
    // D: constant y -> -2e6 sentinel (NOT -1e6, which is a legal rho)
    val d = Seq(
      ("A", 1.0, 10.0), ("A", 2.0, 100.0), ("A", 3.0, 100000.0),
      ("B", 1.0, 40.0), ("B", 2.0, 20.0), ("B", 2.0, 20.0), ("B", 3.0, 10.0),
      ("C", 1.0, 1.0), ("C", 2.0, 3.0), ("C", 3.0, 2.0),
      ("D", 1.0, 5.0), ("D", 2.0, 5.0))
      .toDF("g", "x", "y")
    val got = FeatureEng.corrSpearman(d, "g", "x", "y")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map("A" -> 1000000L, "B" -> -1000000L,
      "C" -> 500000L, "D" -> -2000000L))
  }

  test("corrSpearman matches a driver-side average-rank reference on random data") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 400).map(_ =>
      ("g", rnd.nextInt(40) / 3.0, rnd.nextInt(25).toDouble))
    def ranks2(vs: Seq[Long]): Map[Long, Long] = {
      // doubled average rank: 2*rank + ties - 1, replicated exactly
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val below = sorted.count(_ < v)
        val eq = sorted.count(_ === v)
        v -> (2L * (below + 1) + eq - 1)
      }.toMap
    }
    val xm = rows.map(r => math.round(r._2 * 1e6))
    val ym = rows.map(r => math.round(r._3 * 1e6))
    val (rx, ry) = (ranks2(xm), ranks2(ym))
    val xs = xm.map(rx); val ys = ym.map(ry)
    val n = xs.size.toDouble
    val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
    val sxy = xs.zip(ys).map { case (a, b) => a.toDouble * b }.sum
    val sxx = xs.map(a => a.toDouble * a).sum
    val syy = ys.map(a => a.toDouble * a).sum
    val expected = math.round(1e6 * (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
    val got = FeatureEng.corrSpearman(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head
    assert(got.getLong(1) === 400L)
    assert(got.getLong(2) === expected)
  }

  test("abPower: hand-computed MDE, shrinks with n, observed delta exact") {
    import spark.implicits._
    val d = Seq(
      ("m_small", 50L, 100L, 50L, 100L),
      ("m_big", 5000L, 10000L, 5000L, 10000L),
      ("m_delta", 30L, 100L, 60L, 100L))
      .toDF("metric", "x1", "n1", "x2", "n2")
    val got = graft.operators.FeatureEng.abPower(d, "metric", "x1", "n1", "x2", "n2")
      .collect().map(r => r.getString(0) -> ((r.getLong(5), r.getLong(6)))).toMap
    def mde(x1: Long, n1: Long, x2: Long, n2: Long): Long = {
      val p = (x1 + x2).toDouble / (n1 + n2)
      math.round(2.801585 * math.sqrt(p * (1.0 - p) * (1.0 / n1 + 1.0 / n2)) * 1e6)
    }
    assert(got("m_small")._2 === mde(50, 100, 50, 100))
    assert(got("m_big")._2 === mde(5000, 10000, 5000, 10000))
    // 100x the data -> 10x smaller detectable effect
    assert(got("m_big")._2 * 9 < got("m_small")._2)
    assert(got("m_delta")._1 === 300000L)   // |0.30 - 0.60| exactly
  }

  test("stratifiedKFold: every (stratum, fold) cell balanced within 1, " +
      "repartition-deterministic; small stratum covers all folds") {
    import spark.implicits._
    val df = ((1L to 97L).map(i => (i, "big")) ++ (98L to 104L).map(i => (i, "sml")))
      .toDF("id", "stratum")
    val got = graft.operators.FeatureEng.stratifiedKFold(df, "stratum", "id", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val cells = got.groupBy(t => (t._2, t._3)).view.mapValues(_.size).toMap
    // big: 97 rows over 5 folds -> sizes in {19, 20}; sml: 7 rows -> {1, 2}
    Seq("big", "sml").foreach { s =>
      val sizes = (0L until 5L).map(f => cells.getOrElse((s, f), 0))
      assert(sizes.max - sizes.min <= 1, s"stratum $s sizes: $sizes")
    }
    // the 7-row stratum still touches 5 distinct folds — the property
    // plain md5-mod loses
    assert(got.filter(_._2 == "sml").map(_._3).distinct.length === 5)
    val again = graft.operators.FeatureEng.stratifiedKFold(
        df.repartition(7), "stratum", "id", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSet === again.toSet)
  }

  test("encodingTableSmoothed: rare categories shrink to the prior, frequent " +
      "ones dominate it, and applyEncoding serves the table unchanged") {
    import spark.implicits._
    // global mean = (100*1 + 0*1 + 1*98... ) construct: cat 'rare' has one
    // 1.0 row; cat 'freq' has 100 rows of 0.2; global mean pulled near 0.2
    val rows = Seq(("rare", 1.0)) ++ (1 to 100).map(_ => ("freq", 0.2))
    val df = rows.toDF("cat", "v")
    val gm = ((1000000L + 100L * 200000L) / 101L)   // 207920
    val got = graft.operators.FeatureEng.encodingTableSmoothed(df, "cat", "v", m = 20L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rare: (1e6 + 20*gm) / 21 — mostly prior
    assert(got("rare") === (1000000L + 20L * gm) / 21L)
    // freq: (100*2e5 + 20*gm) / 120 — close to 0.2
    assert(got("freq") === (100L * 200000L + 20L * gm) / 120L)
    assert(math.abs(got("freq") - 200000L) < math.abs(got("rare") - 1000000L),
      "frequent category must sit nearer its own mean than the rare one does")
    // the smoothed table serves through the SAME apply
    val served = graft.operators.FeatureEng.applyEncoding(
        Seq((1L, "rare"), (2L, "nope")).toDF("id", "cat"),
        graft.operators.FeatureEng.encodingTableSmoothed(df, "cat", "v", m = 20L),
        "cat", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(served(1L) === got("rare") && served(2L) === -1L)
  }

  test("bootstrapCiMean: interval brackets the mean, shrinks with n, and is " +
      "rerun/repartition deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val small = (1L to 40L).map(i => ("s", 50L + rnd.nextInt(21) - 10L, i))
    val big = (1L to 2000L).map(i => ("b", 50L + rnd.nextInt(21) - 10L, i))
    val df = (small ++ big).toDF("g", "x", "id")
    val rows = graft.operators.FeatureEng.bootstrapCiMean(df, "g", "x", "id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    rows.foreach { case (g, (mean, lo, hi)) =>
      assert(lo <= mean && mean <= hi, s"group $g: CI must bracket the mean")
    }
    val widthS = rows("s")._3 - rows("s")._2
    val widthB = rows("b")._3 - rows("b")._2
    assert(widthB < widthS, "50x data must narrow the interval")
    // determinism: identical output on a repartitioned rerun
    val again = graft.operators.FeatureEng.bootstrapCiMean(
        df.repartition(7), "g", "x", "id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    assert(again === rows)
  }

  test("bootstrapCiMean: constant values give a zero-width interval") {
    import spark.implicits._
    val df = (1L to 100L).map(i => ("g", 42L, i)).toDF("g", "x", "id")
    val r = graft.operators.FeatureEng.bootstrapCiMean(df, "g", "x", "id")
      .collect().head
    assert(r.getLong(2) === 42000000L)
    assert(r.getLong(4) === 42000000L && r.getLong(5) === 42000000L)
  }

  test("bootstrapCiMean: fractional values micro-quantize instead of " +
      "truncating toward zero (round-11 ADVICE fix)") {
    import spark.implicits._
    // pre-fix, cast('bigint') floored 0.5 -> 0 and the mean read 0
    val df = (1L to 50L).map(i => ("g", 0.5, i)).toDF("g", "x", "id")
    val r = graft.operators.FeatureEng.bootstrapCiMean(df, "g", "x", "id")
      .collect().head
    assert(r.getLong(2) === 500000L)
    assert(r.getLong(4) === 500000L && r.getLong(5) === 500000L)
  }

  test("trendSlope: exact line recovers slope and intercept; noise floors " +
      "through DIV; single-x group is degenerate") {
    import spark.implicits._
    // g1: y = 3x + 7 exactly -> slope 3e6, intercept 7e6
    // g2: single distinct x -> degenerate, 0/0
    val d = (1L to 10L).map(x => ("g1", x, 3 * x + 7)) ++
      Seq(("g2", 5L, 1L), ("g2", 5L, 9L))
    val got = graft.operators.FeatureEng.trendSlope(d.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("g1") === ((0L, 3000000L, 7000000L)))
    assert(got("g2") === ((1L, 0L, 0L)))
  }

  test("trendSlope: negative slope matches a BigInt reference (trunc toward 0)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val pts = (1L to 50L).map(x => (x, 1000L - 7 * x + rnd.nextInt(5)))
    val ref = {
      val n = BigInt(pts.size)
      val sx = BigInt(pts.map(_._1).sum); val sy = BigInt(pts.map(_._2).sum)
      val sxy = pts.map { case (x, y) => BigInt(x) * y }.sum
      val sxx = pts.map { case (x, _) => BigInt(x) * x }.sum
      val den = n * sxx - sx * sx
      def tdiv(a: BigInt, b: BigInt) = a / b   // BigInt / truncates toward 0
      (tdiv(BigInt(1000000) * (n * sxy - sx * sy), den).toLong,
        tdiv(BigInt(1000000) * (sy * sxx - sx * sxy), den).toLong)
    }
    val got = graft.operators.FeatureEng.trendSlope(
        pts.map(p => ("g", p._1, p._2)).toDF("g", "x", "y"), "g", "x", "y")
      .collect().head
    assert((got.getLong(3), got.getLong(4)) === ref)
    assert(got.getLong(3) < 0L)
  }

  test("stratifiedAte: hand strata reweight the confounded naive diff, " +
      "single-arm strata counted but excluded, empty-arm sentinel") {
    // A: c=[10] t=[20] (w 2, diff 10e6); B: c=[0,0] t=[30] (w 3, diff 30e6);
    // C: t-only [99] -> excluded from ATE, counted in totals
    val df = Seq(
      ("A", 0L, 10.0), ("A", 1L, 20.0),
      ("B", 0L, 0.0), ("B", 0L, 0.0), ("B", 1L, 30.0),
      ("C", 1L, 99.0))
      .toDF("stratum", "arm", "y")
    val r = FeatureEng.stratifiedAte(df, "arm", "stratum", "y").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)) === ((6L, 3L, 3L, 3L, 2L)))
    // naive: (149e6 DIV 3) - (10e6 DIV 3); ATE: (2*10e6 + 3*30e6) DIV 5
    assert(r.getLong(5) === 149000000L / 3 - 10000000L / 3)
    assert(r.getLong(6) === 22000000L)
    // control arm absent entirely -> sentinel diffs, counts explain
    val oneArm = FeatureEng.stratifiedAte(
      df.filter(col("arm") === 1L), "arm", "stratum", "y").collect().head
    assert((r.getLong(0) > 0) && oneArm.getLong(2) === 0L)
    assert(oneArm.getLong(5) === -2000000L && oneArm.getLong(6) === -2000000L)
  }

  test("cmhTest: driver replica agreement on a two-stratum table, " +
      "single-row strata excluded, degenerate outcome and odds " +
      "denominators hit sentinels, determinism") {
    import spark.implicits._
    // stratum A: arm1 9/12 hits, arm0 3/10; stratum B: arm1 2/8, arm0 4/9
    def block(st: String, arm: Long, hits: Int, total: Int) =
      (0 until total).map(i => (st, arm, if (i < hits) 1L else 0L))
    val rows = (block("A", 1L, 9, 12) ++ block("A", 0L, 3, 10) ++
      block("B", 1L, 2, 8) ++ block("B", 0L, 4, 9) ++
      Seq(("solo", 1L, 1L)))                        // T = 1 -> excluded
      .toDF("st", "arm", "hit")
    // replica mirroring the operator's per-stratum rounding
    case class S(t: Long, n1: Long, m1: Long, a: Long)
    val strata = Seq(S(22, 12, 12, 9), S(17, 8, 6, 2))
    def rnd(x: Double) = math.round(x)
    val d = strata.map(s => 1000000L * s.a -
      rnd(1e6 * (s.n1.toDouble * s.m1) / s.t)).sum
    val v = strata.map(s => rnd(1e12 *
      (BigInt(s.n1) * (s.t - s.n1) * s.m1 * (s.t - s.m1)).toDouble /
      (BigInt(s.t) * s.t * (s.t - 1)).toDouble)).sum
    val sAd = strata.map(s => rnd(1e6 *
      (s.a.toDouble * (s.t - s.n1 - s.m1 + s.a)) / s.t)).sum
    val sBc = strata.map(s => rnd(1e6 *
      ((s.n1 - s.a).toDouble * (s.m1 - s.a)) / s.t)).sum
    val dd = math.max(0L, math.abs(d) - 500000L)
    val cmh = math.round(1e6 * (BigInt(dd) * dd).toDouble / v.toDouble)
    val or = math.round(1e6 * sAd.toDouble / sBc.toDouble)
    val got = FeatureEng.cmhTest(rows, "st", "arm", "hit").collect().head
    assert(got.toSeq === Seq(3L, 2L, d, v, cmh, or))
    // all-miss outcome: m1 = 0 everywhere -> V = 0 -> chi sentinel; and
    // a perfect separation zeroes every b*c term -> odds sentinel
    val flat = FeatureEng.cmhTest(
      rows.withColumn("hit", lit(0L)), "st", "arm", "hit").collect().head
    assert(flat.getLong(4) === -1L)
    val perfect = FeatureEng.cmhTest(
      rows.withColumn("hit", col("arm")), "st", "arm", "hit")
      .collect().head
    assert(perfect.getLong(5) === -1L)
    val again = FeatureEng.cmhTest(
      rows.repartition(5), "st", "arm", "hit").collect().head
    assert(again.toSeq === got.toSeq)
  }

  test("jackknifeRatio: constant ratio reads SE 0, the two-row hand case " +
      "reads SE exactly 1e6, zero leave-one-out denominators and " +
      "singletons hit sentinels, determinism") {
    import spark.implicits._
    val rows = Seq(
      ("c", 2.0, 1.0), ("c", 4.0, 2.0), ("c", 6.0, 3.0), // R_i all 2e6
      ("v", 1.0, 1.0), ("v", 3.0, 1.0),                  // pseudo 3e6/1e6
      ("z", 1.0, 0.0), ("z", 2.0, 5.0),                  // one d-zero LOO
      ("o", 7.0, 2.0),                                   // singleton
      ("d", 1.0, 0.0), ("d", 2.0, 0.0))                  // sd = 0
      .toDF("g", "num", "den")
    def read(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val got = read(FeatureEng.jackknifeRatio(rows, "g", "num", "den"))
    assert(got("c") === ((3L, 2000000L, 0L)))
    // v: R = 2e6, pseudo = {3e6, 1e6} -> SE^2 = (1/2)*(1e12+1e12) = 1e12
    assert(got("v") === ((2L, 2000000L, 1000000L)))
    assert(got("z") === ((2L, 600000L, -1L)))
    assert(got("o")._1 === 1L && got("o")._2 === 3500000L &&
      got("o")._3 === -1L)
    assert(got("d") === ((2L, -1L, -1L)))
    val again = read(FeatureEng.jackknifeRatio(
      rows.repartition(5), "g", "num", "den"))
    assert(again === got)
  }

  test("spearmanCorr: monotone nonlinear reads exactly +-1e6, the " +
      "tied hand case zeroes out like fractional ranks, constant " +
      "margin hits the sentinel, determinism") {
    import spark.implicits._
    val rows = Seq(
      // monotone cubic: ranks align perfectly despite nonlinearity
      ("m", 1.0, 1.0), ("m", 2.0, 8.0), ("m", 3.0, 27.0), ("m", 4.0, 64.0),
      // reversed
      ("v", 1.0, 64.0), ("v", 2.0, 27.0), ("v", 3.0, 8.0), ("v", 4.0, 1.0),
      // tied x block: avg ranks (1.5, 1.5, 3) vs y ranks (1, 3, 2) -> 0
      ("t", 1.0, 5.0), ("t", 1.0, 7.0), ("t", 2.0, 6.0),
      // constant y margin
      ("c", 1.0, 9.0), ("c", 2.0, 9.0))
      .toDF("g", "x", "y")
    def read(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    val got = read(FeatureEng.spearmanCorr(rows, "g", "x", "y"))
    assert(got === Map(
      "m" -> ((4L, 1000000L)), "v" -> ((4L, -1000000L)),
      "t" -> ((3L, 0L)), "c" -> ((2L, -1000000L))))
    val again = read(FeatureEng.spearmanCorr(
      rows.repartition(5), "g", "x", "y"))
    assert(again === got)
  }

  test("diffInDiff: hand 2x2 panel, empty-cell sentinel, arm/period " +
      "guards, determinism") {
    import spark.implicits._
    // control: pre mean 10, post mean 12 (+2); treated: pre 20, post 25
    // (+5) -> DiD = +3
    val panel = Seq(
      (0L, 0L, 9.0), (0L, 0L, 11.0),
      (0L, 1L, 11.0), (0L, 1L, 13.0),
      (1L, 0L, 19.0), (1L, 0L, 21.0),
      (1L, 1L, 24.0), (1L, 1L, 26.0)).toDF("arm", "per", "v")
    val got = FeatureEng.diffInDiff(panel, "arm", "per", "v").collect().head
    assert(got.getAs[Long]("did_micro") === 3000000L)
    assert(got.getAs[Long]("mean_c0_micro") === 10000000L)
    assert(got.getAs[Long]("mean_t1_micro") === 25000000L)
    assert(got.getAs[Long]("n_t0") === 2L)
    // truncating cell means: sums divide toward zero
    val trunc = Seq((0L, 0L, 1.0), (0L, 0L, 2.0), (0L, 1L, 1.0),
      (1L, 0L, 1.0), (1L, 1L, 1.0)).toDF("arm", "per", "v")
    val g2 = FeatureEng.diffInDiff(trunc, "arm", "per", "v").collect().head
    assert(g2.getAs[Long]("mean_c0_micro") === 1500000L)
    // empty treated-post cell -> sentinel
    val holed = panel.filter(!(col("arm") === 1L && col("per") === 1L))
    val g3 = FeatureEng.diffInDiff(holed, "arm", "per", "v").collect().head
    assert(g3.getAs[Long]("did_micro") === -2000000L)
    assert(g3.getAs[Long]("mean_t1_micro") === -2000000L)
    // determinism
    val again = FeatureEng.diffInDiff(panel.repartition(5), "arm", "per", "v")
      .collect().head
    assert(again.toSeq === got.toSeq)
    // guards
    val e = intercept[Exception] {
      FeatureEng.diffInDiff(
        Seq((2L, 0L, 1.0)).toDF("arm", "per", "v"), "arm", "per", "v").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("arm must be 0/1")))
  }
}

package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.ModelEval

class ModelEvalSpec extends SparkSpec {

  import spark.implicits._

  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  // --------------------------------------------------------------- rocAuc

  test("rocAuc: hand cases — perfect, inverted, tied, single-class sentinel") {
    // A: positives strictly above negatives -> AUC 1
    // B: positives strictly below           -> AUC 0
    // C: scores [1,1,2], labels [0,1,1]: pairs (tie=0.5 + concordant=1)/2
    //    -> 0.75
    // D: all positive -> -1 sentinel
    val d = Seq(
      ("A", 1.0, 0L), ("A", 2.0, 0L), ("A", 3.0, 1L), ("A", 4.0, 1L),
      ("B", 1.0, 1L), ("B", 2.0, 0L),
      ("C", 0.000001, 0L), ("C", 0.000001, 1L), ("C", 0.000002, 1L),
      ("D", 5.0, 1L), ("D", 6.0, 1L))
      .toDF("g", "s", "y")
    val got = ModelEval.rocAuc(d, "g", "s", "y")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got === Map("A" -> 1000000L, "B" -> 0L, "C" -> 750000L, "D" -> -1L))
  }

  test("rocAuc: matches the exact brute-force pair count on random data") {
    val rnd = new Random(42)
    val rows = (1 to 400).map { _ =>
      ("g", rnd.nextInt(50) / 1000000.0 * rnd.nextInt(1000), rnd.nextInt(2).toLong)
    }
    // exact integer reference: 2U = 2*concordant + ties over all pos x neg
    val pos = rows.collect { case (_, s, 1L) => math.round(s * 1e6) }
    val neg = rows.collect { case (_, s, 0L) => math.round(s * 1e6) }
    val u2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expected = (1000000L * u2) / (2L * pos.size * neg.size)
    val got = ModelEval.rocAuc(rows.toDF("g", "s", "y"), "g", "s", "y")
      .collect().head
    assert(got.getLong(1) === pos.size.toLong)
    assert(got.getLong(2) === neg.size.toLong)
    assert(got.getLong(3) === expected)
  }

  test("rocAuc rejects non-binary labels") {
    val d = Seq(("A", 1.0, 2L)).toDF("g", "s", "y")
    val ex = intercept[Exception] { ModelEval.rocAuc(d, "g", "s", "y").collect() }
    assert(msgs(ex).exists(_.contains("label must be 0/1")))
  }

  // -------------------------------------------------------------- prCurve

  test("prCurve: hand case — cumulative confusion counts from the top") {
    // scores 10,20,30,40 micro -> lo=10M hi=40M, width 30M+1, B=2:
    //   bucket = ((sm-lo)*2) DIV (hi-lo+1): 10,20 -> 0; 30,40 -> 1
    // labels:   10->0, 20->1, 30->0, 40->1
    // bucket 1: tp=1 fp=1 fn=1  precision 500000 recall 500000
    // bucket 0: tp=2 fp=2 fn=0  precision 500000 recall 1000000
    val d = Seq((10.0, 0L), (20.0, 1L), (30.0, 0L), (40.0, 1L)).toDF("s", "y")
    val got = ModelEval.prCurve(d, "s", "y", nBuckets = 2)
      .select("bucket", "tp", "fp", "fn", "precision_ppm", "recall_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (1L, 1L, 1L, 1L, 500000L, 500000L),
      (0L, 2L, 2L, 0L, 500000L, 1000000L)))
  }

  test("prCurve: bottom bucket recovers every positive (recall = 1)") {
    val e = Tables.events(spark, sfDir).withColumn("y",
      (get_json_object(col("props"), "$.k").cast("bigint") >= 50).cast("bigint"))
    val rows = ModelEval.prCurve(e, "value", "y", nBuckets = 20).collect()
    assert(rows.nonEmpty)
    val bottom = rows.last
    assert(bottom.getAs[Long]("recall_ppm") === 1000000L)
    assert(bottom.getAs[Long]("fn") === 0L)
    // tp is monotone nonincreasing as the threshold rises (rows are desc)
    val tps = rows.map(_.getAs[Long]("tp"))
    assert(tps.zip(tps.tail).forall { case (lo2, hi2) => lo2 <= hi2 })
  }

  // ------------------------------------------------------ calibrationBins

  test("calibrationBins: hand case and the 1e6-edge clamp") {
    // preds 0, 450000, 999999, 1000000 with nBins=10:
    //   bins 0, 4, 9, 9 (the 1e6 edge clamps into the last bin)
    val d = Seq((0L, 0L), (450000L, 1L), (999999L, 0L), (1000000L, 1L))
      .toDF("p", "y")
    val got = ModelEval.calibrationBins(d, "p", "y", nBins = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (0L, 1L, 0L, 0L, 0L),
      (4L, 1L, 1L, 450000L, 1000000L),
      (9L, 2L, 1L, 999999L, 500000L)))
  }

  test("calibrationBins rejects out-of-range predictions") {
    val d = Seq((1000001L, 0L)).toDF("p", "y")
    val ex = intercept[Exception] {
      ModelEval.calibrationBins(d, "p", "y").collect()
    }
    assert(msgs(ex).exists(_.contains("ppm in [0, 1e6]")))
  }

  // ------------------------------------------------------- chiSquareTerms

  test("chiSquareTerms: hand case — discriminative vs ubiquitous terms") {
    // 4 docs, 2 classes; "alpha" only in both A docs, "omega" only in both
    // B docs, "common" everywhere. For alpha vs class A: a=2 b=0 c=0 d=2
    //   chi2 = 4*(2*2-0)^2 / (2*2*2*2) = 4 -> 4000000 ppm
    // "common": column marginal (c+dd) = 0 -> -1 sentinel, ranked last
    val docs = Seq(
      ("A", "alpha common"), ("A", "alpha common"),
      ("B", "omega common"), ("B", "omega common")).toDF("cls", "text")
    val got = ModelEval.chiSquareTerms(docs, "cls", "text", topK = 3)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getString(2), r.getLong(5)))).toMap
    assert(got(("A", 1L)) === ("alpha", 4000000L))
    assert(got(("A", 2L)) === ("omega", 4000000L)) // absence is also evidence
    assert(got(("A", 3L)) === ("common", -1L))
    assert(got(("B", 1L)) === ("alpha", 4000000L))
  }

  test("chiSquareTerms: independent term scores zero") {
    // "x" in exactly half of each class: a=1 b=1 c=1 d=1 -> delta 0 -> chi2 0
    val docs = Seq(
      ("A", "x p"), ("A", "p"), ("B", "x q"), ("B", "q")).toDF("cls", "text")
    val got = ModelEval.chiSquareTerms(docs, "cls", "text", topK = 10)
      .filter(col("term") === "x").collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getAs[Long]("chi2_ppm") === 0L))
  }

  // ---------------------------------------------------------- cohenKappa

  test("cohenKappa: hand cases — perfect, chance, worse-than-chance, sentinel") {
    // A: identical raters -> kappa 1e6
    // B: the classic 2x2: a=20 b=5 c=10 d=15 over n=50:
    //    po=0.7, pe=(30*25 + 20*25)/2500=0.5 -> kappa=0.4 exactly
    // C: anti-correlated raters (ra = 1-rb, balanced): po=0, pe=0.5
    //    -> kappa = -1e6 (integer-exact)
    // D: both raters constant -> pe=1 -> -2000000 sentinel
    def rows(g: String, ra: Long, rb: Long, n: Int) =
      Seq.fill(n)((g, ra, rb))
    val d = (rows("A", 1L, 1L, 3) ++ rows("A", 0L, 0L, 2) ++
      rows("B", 1L, 1L, 20) ++ rows("B", 1L, 0L, 5) ++
      rows("B", 0L, 1L, 10) ++ rows("B", 0L, 0L, 15) ++
      rows("C", 1L, 0L, 5) ++ rows("C", 0L, 1L, 5) ++
      rows("D", 1L, 1L, 4))
      .toDF("g", "ra", "rb")
    val got = ModelEval.cohenKappa(d, "g", "ra", "rb")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got("A") === ((5L, 5L, 1000000L, 520000L, 1000000L)))
    assert(got("B") === ((50L, 35L, 700000L, 500000L, 400000L)))
    assert(got("C") === ((10L, 0L, 0L, 500000L, -1000000L)))
    assert(got("D") === ((4L, 4L, 1000000L, 1000000L, -2000000L)))
  }

  // --------------------------------------------------------- annRecallAtK

  test("annRecallAtK: hand case — partial hit, dropped query, rank cutoff") {
    // ground truth: q1 -> {10, 12}, q2 -> {20, 21} at k=2
    val exact = Seq(
      (1L, 1L, 10L), (1L, 2L, 12L), (1L, 3L, 99L), // rank 3 ignored
      (2L, 1L, 20L), (2L, 2L, 21L))
      .toDF("query_id", "rank", "neighbor_id")
    // approx: q1 found 10 (hit) and 11 (miss); q2 absent entirely —
    // the index dropped it, and it must still be reported at recall 0
    val approx = Seq(
      (1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L)) // 12 only at rank 3: no hit at k=2
      .toDF("query_id", "rank", "neighbor_id")
    val got = ModelEval.annRecallAtK(approx, exact, k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((2L, 1L, 500000L)))
    assert(got(2L) === ((2L, 0L, 0L)))
    assert(got.size === 2)
  }

  test("annRecallAtK: identical inputs score a perfect million everywhere") {
    val r = Seq((1L, 1L, 5L), (1L, 2L, 6L), (2L, 1L, 7L))
      .toDF("query_id", "rank", "neighbor_id")
    val got = ModelEval.annRecallAtK(r, r, k = 10).collect()
    assert(got.nonEmpty)
    got.foreach(row => assert(row.getAs[Long]("recall_ppm") === 1000000L))
  }

  // ---------------------------------------------------------------- ksTest

  test("ksTest: hand case — D = 1/3, smallest attaining value reported") {
    // side0 = {1,2,3}, side1 = {2,3,4}: the ECDF gap is 1/3 at x=1, 2 and
    // 3 — the reported location must be the SMALLEST (1.0 -> 1e6 micro)
    val d = Seq(
      ("A", 1.0, 0L), ("A", 2.0, 0L), ("A", 3.0, 0L),
      ("A", 2.0, 1L), ("A", 3.0, 1L), ("A", 4.0, 1L))
      .toDF("g", "v", "side")
    val r = ModelEval.ksTest(d, "g", "v", "side").collect().head
    assert((r.getLong(1), r.getLong(2)) === ((3L, 3L)))
    assert(r.getLong(3) === 333333L) // trunc(1e6 * 3 / 9)
    assert(r.getLong(4) === 1000000L)
  }

  test("ksTest: identical samples give D = 0; one-sided group gives -1") {
    val d = Seq(
      ("same", 1.5, 0L), ("same", 2.5, 0L),
      ("same", 1.5, 1L), ("same", 2.5, 1L),
      ("onesided", 3.0, 1L), ("onesided", 4.0, 1L))
      .toDF("g", "v", "side")
    val got = ModelEval.ksTest(d, "g", "v", "side")
      .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got("same") === ((0L, 1500000L))) // D=0 everywhere; smallest value
    assert(got("onesided") === ((-1L, -1L)))
  }

  test("ksTest: matches a brute-force ECDF sup-distance on random data") {
    val rnd = new Random(7)
    val rows = (1 to 500).map { _ =>
      ("g", rnd.nextInt(80) / 7.0, rnd.nextInt(2).toLong)
    }
    val a = rows.collect { case (_, v, 0L) => math.round(v * 1e6) }
    val b = rows.collect { case (_, v, 1L) => math.round(v * 1e6) }
    val pts = (a ++ b).distinct.sorted
    val diffs = pts.map(x => math.abs(
      b.length.toLong * a.count(_ <= x) - a.length.toLong * b.count(_ <= x)))
    val maxd = diffs.max
    val expD = (1000000L * maxd) / (a.length.toLong * b.length)
    val expAt = pts(diffs.indexOf(maxd))
    val r = ModelEval.ksTest(rows.toDF("g", "v", "side"), "g", "v", "side")
      .collect().head
    assert((r.getLong(1), r.getLong(2)) === ((a.length.toLong, b.length.toLong)))
    assert(r.getLong(3) === expD)
    assert(r.getLong(4) === expAt)
  }

  test("ksTest rejects non-binary side flags") {
    val d = Seq(("A", 1.0, 2L)).toDF("g", "v", "side")
    val ex = intercept[Exception] { ModelEval.ksTest(d, "g", "v", "side").collect() }
    assert(msgs(ex).exists(_.contains("side must be 0/1")))
  }

  // -------------------------------------------------------------- annMrrAtK

  test("annMrrAtK: first-hit ranks, truncated reciprocals, dropped query") {
    val exact = Seq(
      (1L, 1L, 10L), (1L, 2L, 12L),
      (2L, 1L, 20L), (2L, 2L, 21L),
      (3L, 1L, 30L))
      .toDF("query_id", "rank", "neighbor_id")
    // q1: first relevant at rank 3 (10 at rank 3; 11/13 are noise)
    // q2: relevant at rank 1; q3: absent from the approx side entirely
    val approx = Seq(
      (1L, 1L, 11L), (1L, 2L, 13L), (1L, 3L, 10L), (1L, 4L, 12L),
      (2L, 1L, 21L), (2L, 2L, 99L))
      .toDF("query_id", "rank", "neighbor_id")
    val got = ModelEval.annMrrAtK(approx, exact, k = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((3L, 333333L))) // trunc(1e6/3)
    assert(got(2L) === ((1L, 1000000L)))
    assert(got(3L) === ((-1L, 0L)))
    assert(got.size === 3)
  }

  test("annMrrAtK: relevant beyond the k cutoff does not count") {
    val exact = Seq((1L, 1L, 10L)).toDF("query_id", "rank", "neighbor_id")
    val approx = Seq((1L, 3L, 10L)).toDF("query_id", "rank", "neighbor_id")
    val got = ModelEval.annMrrAtK(approx, exact, k = 2).collect().head
    assert((got.getLong(1), got.getLong(2)) === ((-1L, 0L)))
  }

  // --------------------------------------------------- classificationReport

  test("classificationReport: hand case with an unpredicted and a " +
      "prediction-only class") {
    // truth:      1,1,1,2,2,3
    // predicted:  1,1,2,2,2,4   (class 3 never predicted, class 4 invented)
    val d = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 2L), (2L, 2L), (3L, 4L))
      .toDF("y", "p")
    val got = ModelEval.classificationReport(d, "y", "p")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // cls 1: tp=2 fp=0 fn=1 -> p=1e6, r=666666, f1=2e6*2/5=800000
    assert(got(1L) === ((2L, 0L, 1L, 1000000L, 666666L, 800000L)))
    // cls 2: tp=2 fp=1 fn=0 -> p=666666, r=1e6, f1=800000
    assert(got(2L) === ((2L, 1L, 0L, 666666L, 1000000L, 800000L)))
    // cls 3: never predicted -> precision -1, recall 0, f1 0
    assert(got(3L) === ((0L, 0L, 1L, -1L, 0L, 0L)))
    // cls 4: never actual -> recall -1, precision 0, f1 0
    assert(got(4L) === ((0L, 1L, 0L, 0L, -1L, 0L)))
    assert(got.size === 4)
  }

  test("classificationReport on a perfect classifier is all 1e6") {
    val d = Seq((1L, 1L), (2L, 2L), (2L, 2L)).toDF("y", "p")
    ModelEval.classificationReport(d, "y", "p").collect().foreach { r =>
      assert((r.getLong(4), r.getLong(5), r.getLong(6)) ===
        ((1000000L, 1000000L, 1000000L)))
    }
  }

  test("classificationReport keeps string class keys (language codes)") {
    val d = Seq(("en", "en"), ("en", "fr"), ("fr", "fr"), ("zh", "fr"))
      .toDF("y", "p")
    val got = ModelEval.classificationReport(d, "y", "p")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6)))).toMap
    // en: tp=1 fp=0 fn=1 -> f1 = 2e6/3 = 666666
    // fr: tp=1 fp=2 fn=0 -> f1 = 2e6/4 = 500000
    // zh: tp=0 fp=0 fn=1 -> f1 = 0
    assert(got === Map(
      "en" -> ((1L, 0L, 1L, 666666L)),
      "fr" -> ((1L, 2L, 0L, 500000L)),
      "zh" -> ((0L, 0L, 1L, 0L))))
  }

  // ------------------------------------------------------------------ mcc

  test("mcc: hand cases — balanced, perfect, degenerate sentinel") {
    // A: tp=2 tn=2 fp=1 fn=1 -> (4-1)/sqrt(3^4) = 1/3 -> 333333 ppm
    // B: perfect -> 1e6
    // C: all-positive labels -> tn+fp = 0 -> -2e6 sentinel
    val d = Seq(
      ("A", 1L, 1L), ("A", 1L, 1L), ("A", 0L, 0L), ("A", 0L, 0L),
      ("A", 0L, 1L), ("A", 1L, 0L),
      ("B", 1L, 1L), ("B", 0L, 0L),
      ("C", 1L, 1L), ("C", 1L, 0L))
      .toDF("g", "y", "p")
    val got = ModelEval.mcc(d, "g", "y", "p")
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(got === Map("A" -> 333333L, "B" -> 1000000L, "C" -> -2000000L))
  }

  test("mcc matches the textbook float formula on random data") {
    val rnd = new Random(7)
    val rows = (1 to 500).map { _ =>
      ("g", rnd.nextInt(2).toLong,
        if (rnd.nextInt(4) == 0) rnd.nextInt(2).toLong else rnd.nextInt(2).toLong)
    }
    val tp = rows.count(r => r._2 == 1 && r._3 == 1).toLong
    val tn = rows.count(r => r._2 == 0 && r._3 == 0).toLong
    val fp = rows.count(r => r._2 == 0 && r._3 == 1).toLong
    val fn = rows.count(r => r._2 == 1 && r._3 == 0).toLong
    val expected = math.round((tp * tn - fp * fn).toDouble * 1e6
      / math.sqrt((tp + fp).toDouble * (tp + fn).toDouble
        * (tn + fp).toDouble * (tn + fn).toDouble))
    val got = ModelEval.mcc(rows.toDF("g", "y", "p"), "g", "y", "p")
      .collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4))
      === ((tp, tn, fp, fn)))
    assert(got.getLong(5) === expected)
  }

  test("mcc rejects non-binary predictions") {
    val d = Seq(("A", 1L, 3L)).toDF("g", "y", "p")
    val ex = intercept[Exception] { ModelEval.mcc(d, "g", "y", "p").collect() }
    assert(msgs(ex).exists(_.contains("pred must be 0/1")))
  }

  // ------------------------------------------------------------- brierEce

  test("brierEce: hand case — exact integer Brier and bin-cancelled ECE") {
    // (250000,0) (250000,1) -> bin 2: sp=500000 np=1 |diff|=500000
    // (750000,1) (750000,1) -> bin 7: sp=1500000 np=2 |diff|=500000
    // brier = (625 + 5625 + 625 + 625)e8 / (4e6) = 187500 ppm
    // ece   = 1000000 / 4 = 250000 ppm
    val d = Seq(("g", 250000L, 0L), ("g", 250000L, 1L),
      ("g", 750000L, 1L), ("g", 750000L, 1L)).toDF("g", "p", "y")
    val got = ModelEval.brierEce(d, "g", "p", "y", nBins = 10).collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3))
      === ((4L, 187500L, 250000L)))
  }

  test("brierEce: perfectly calibrated hard predictions score 0/0") {
    val d = Seq(("g", 1000000L, 1L), ("g", 0L, 0L)).toDF("g", "p", "y")
    val got = ModelEval.brierEce(d, "g", "p", "y").collect().head
    assert((got.getLong(2), got.getLong(3)) === ((0L, 0L)))
  }

  test("brierEce rejects out-of-range predictions") {
    val d = Seq(("g", 1000001L, 1L)).toDF("g", "p", "y")
    val ex = intercept[Exception] {
      ModelEval.brierEce(d, "g", "p", "y").collect()
    }
    assert(msgs(ex).exists(_.contains("ppm in [0, 1e6]")))
  }

  // ----------------------------------------------------------- annNdcgAtK

  test("annNdcgAtK: hand case — discounted hits, dropped query scores 0") {
    val exact = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1)).toDF("query_id", "neighbor_id", "rank")
    // q1 approx: rank1 miss, rank2 + rank3 hit; q2 never surfaced
    val approx = Seq((1L, 99L, 1), (1L, 10L, 2), (1L, 12L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val disc = (r: Int) => 1.0 / (math.log(r + 1.0) / math.log(2.0))
    val expected1 = math.round(
      (disc(2) + disc(3)) * 1e6 / (disc(1) + disc(2) + disc(3)))
    val got = ModelEval.annNdcgAtK(approx, exact, k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((3L, expected1)), 2L -> ((1L, 0L))))
  }

  test("annNdcgAtK: perfect index scores 1e6 for every query") {
    val exact = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1))
      .toDF("query_id", "neighbor_id", "rank")
    ModelEval.annNdcgAtK(exact, exact, k = 5).collect().foreach { r =>
      assert(r.getLong(2) === 1000000L)
    }
  }

  // -------------------------------------------------------------- gainChart

  test("gainChart: a perfect ranker front-loads (top-bucket lift = nBuckets), " +
      "last bucket always reads gain 1e6 / lift 1e6; no-positive sentinel") {
    // 20 rows, 2 positives with the top scores, 10 buckets of 2 rows each:
    // bucket 1 holds both positives -> gain 1e6, lift = 1e6*2*20/(2*2) = 10e6
    val d = ((1 to 2).map(i => ("A", 100.0 - i, i.toLong, 1L)) ++
      (3 to 20).map(i => ("A", 100.0 - i, i.toLong, 0L)) ++
      Seq(("B", 1.0, 1L, 0L), ("B", 2.0, 2L, 0L)))
      .toDF("g", "s", "id", "y")
    val got = ModelEval.gainChart(d, "g", "s", "id", "y")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(("A", 1L)) === ((2L, 2L, 1000000L, 10000000L)))
    assert(got(("A", 10L))._3 === 1000000L && got(("A", 10L))._4 === 1000000L)
    // group with no positives: sentinels
    got.collect { case (("B", _), v) => v }.foreach { v =>
      assert(v._3 === -1L && v._4 === -1L)
    }
  }

  test("gainChart: gain is monotone and buckets partition the group") {
    val rnd = new Random(83)
    val d = (1L to 500L).map(id =>
      ("g", rnd.nextInt(100) / 9.0, id, (rnd.nextInt(5) == 0).compare(false).toLong))
      .toDF("g", "s", "id", "y")
    val rows = ModelEval.gainChart(d, "g", "s", "id", "y")
      .orderBy(col("bucket")).collect()
    assert(rows.map(_.getLong(2)).sum === 500L)
    val gains = rows.map(_.getLong(4))
    assert(gains.zip(gains.tail).forall { case (a, b) => a <= b })
    assert(gains.last === 1000000L)
  }

  // ------------------------------------------------------------ emdVsGlobal

  test("emdVsGlobal: identical-to-global reads 0, a pure shift reads the " +
      "shift distance, displacement beats TV-equal rearrangement") {
    // groups A and B have equal sizes; global = A ∪ B.
    // A = {0, 10}, B = {1, 11}: each group is the global shifted by ±0.5
    // (in the merged-support sense) -> both EMDs equal and positive
    val d = (Seq(("A", 0.0), ("A", 10.0), ("B", 1.0), ("B", 11.0)))
      .toDF("g", "v")
    val got = ModelEval.emdVsGlobal(d, "g", "v")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("A") === got("B") && got("A") > 0L)
    // a group that IS the global distribution reads exactly 0
    val same = (for (g <- Seq("X", "Y"); i <- 0 to 3) yield (g, i.toDouble))
      .toDF("g", "v")
    // X and Y both hold {0,1,2,3} uniformly = the global -> EMD 0
    ModelEval.emdVsGlobal(same, "g", "v").collect()
      .foreach(r => assert(r.getLong(2) === 0L))
    // displacement sensitivity: against a bulk group pinning the global
    // at 0, C moves 1 of 4 points to 2 and D moves 1 of 4 to 200 — same
    // moved MASS (same TV-ish deviation), ~10x the EMD
    val e = ((1 to 40).map(_ => ("E", 0.0)) ++
      Seq(("C", 0.0), ("C", 0.0), ("C", 0.0), ("C", 2.0),
        ("D", 0.0), ("D", 0.0), ("D", 0.0), ("D", 200.0))).toDF("g", "v")
    val emd = ModelEval.emdVsGlobal(e, "g", "v")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(emd("D") > 9L * emd("C"), s"C=${emd("C")} D=${emd("D")}")
  }

  test("emdVsGlobal matches a driver-side exact reference on random data") {
    val rnd = new Random(71)
    val rows = (1 to 300).map(_ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(50) / 7.0))
    val ref = {
      val sm = rows.map { case (g, v) => (g, math.round(v * 1e6)) }
      val support = sm.map(_._2).distinct.sorted
      val n = BigInt(sm.size)
      sm.map(_._1).distinct.map { g =>
        val ng = BigInt(sm.count(_._1 == g))
        var (cumG, cumAll) = (BigInt(0), BigInt(0))
        val s = support.zip(support.tail :+ support.last).map { case (x, nx) =>
          cumG += sm.count(r => r._1 == g && r._2 == x)
          cumAll += sm.count(_._2 == x)
          (cumG * n - cumAll * ng).abs * BigInt(nx - x)
        }.sum
        g -> (s / (ng * n)).toLong
      }.toMap
    }
    val got = ModelEval.emdVsGlobal(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === ref)
  }

  // ------------------------------------------------ splitConformalInterval

  test("splitConformalInterval: qhat is the exact conformal rank and " +
      "tiny calibration sets emit the sentinel") {
    // deterministic residuals |actual - pred|; find which ids calibrate
    // under the 5000-bps 'conf:' gate and hand-compute the rank
    def isCal(id: Long): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"conf:$id".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      h.substring(0, 4) < "8000"
    }
    val rows = (1L to 200L).map(id => ("g", 0.0, (id % 37).toDouble, id))
    val df = rows.toDF("g", "p", "a", "id")
    val cal = rows.filter(r => isCal(r._4)).map(r => math.round(r._3 * 1e6)).sorted
    val rank = ((cal.length + 1) * 9 + 9) / 10
    val expectedQ = if (rank <= cal.length) cal(rank - 1) else -1L
    val got = ModelEval.splitConformalInterval(df, "g", "p", "a", "id")
      .collect().head
    assert(got.getLong(3) === expectedQ)
    // coverage sanity: ±qhat must cover roughly 1-alpha of held-out rows
    assert(got.getLong(4) >= 800000L && got.getLong(4) <= 1000000L)
    // a 3-row calibration set cannot host the rank -> sentinel
    val tiny = Seq(("g", 0.0, 1.0, 2L), ("g", 0.0, 2.0, 8L), ("g", 0.0, 3.0, 3L),
      ("g", 0.0, 9.0, 5L)).toDF("g", "p", "a", "id")
    val t = ModelEval.splitConformalInterval(tiny, "g", "p", "a", "id").collect()
    t.foreach { r =>
      if (r.getLong(1) < 9) assert(r.getLong(3) === -1L && r.getLong(4) === -1L)
    }
  }

  test("splitConformalInterval: a group whose rows ALL calibrate still " +
      "emits a row with n_eval=0 and -1 coverage (round-11 ADVICE fix)") {
    def isCal(id: Long): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"conf:$id".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      h.substring(0, 4) < "8000"
    }
    val calIds = (1L to 200L).filter(isCal).take(5)
    val evalId = (1L to 200L).find(id => !isCal(id)).get
    val df = (calIds.map(id => ("allcal", 0.0, id.toDouble, id)) :+
      ("mixed", 0.0, 1.0, calIds.head) :+ ("mixed", 0.0, 2.0, evalId))
      .toDF("g", "p", "a", "id")
    val got = ModelEval.splitConformalInterval(df, "g", "p", "a", "id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(got.contains("allcal"), "all-calibration group must not vanish")
    assert(got("allcal")._1 === 5L && got("allcal")._2 === 0L &&
      got("allcal")._3 === -1L)
    assert(got("mixed")._2 === 1L)
  }

  // ---------------------------------------------------------- classBalance

  test("classBalance: balanced classes read ~K effective, dominance drags " +
      "toward 1, empty reads sentinels, driver replica matches") {
    def run(labels: Seq[String]) =
      ModelEval.classBalance(
        labels.zipWithIndex.map { case (l, i) => (i.toLong, l) }
          .toDF("id", "label"), "label").collect().head
    val balanced = run(Seq.fill(25)("a") ++ Seq.fill(25)("b") ++
      Seq.fill(25)("c") ++ Seq.fill(25)("d"))
    assert(balanced.getLong(1) === 4L)
    assert(math.abs(balanced.getLong(3) - 4000000L) <= 10L,
      s"4 balanced classes must read ~4e6, got ${balanced.getLong(3)}")
    assert(balanced.getLong(4) === 250000L && balanced.getLong(5) === 250000L)
    val skewed = run(Seq.fill(98)("a") ++ Seq("b", "c"))
    assert(skewed.getLong(3) < 1300000L,
      "one dominant class must drag the effective count toward 1")
    assert(skewed.getLong(4) === 980000L && skewed.getLong(5) === 10000L)
    val empty = run(Seq.empty[String])
    assert(empty.getLong(0) === 0L && empty.getLong(2) === -1L &&
      empty.getLong(3) === -1L)
    // driver replica with the operator's per-term rounding
    val labels = Seq.fill(13)("x") ++ Seq.fill(7)("y") ++ Seq.fill(3)("z")
    val n = labels.size.toDouble
    val h = Seq(13, 7, 3).map(c =>
      math.round(1e6 * (c * math.log(n / c)) / n)).sum
    val eff = math.round(1e6 * math.exp(h / 1e6))
    val got = run(labels)
    assert(got.getLong(2) === h && got.getLong(3) === eff)
  }

  // ------------------------------------------------------------ annRboAtK

  test("annRboAtK: identical lists read 1 - p^k exactly; disjoint read 0") {
    val ranked = (1 to 10).flatMap(r => Seq((1L, r * 100L, r))).toDF("query_id", "neighbor_id", "rank")
    val same = ModelEval.annRboAtK(ranked, ranked, k = 10).collect().head
    // (10^10 - 9^10)/10^10 in ppm, floored
    assert(same.getLong(3) === 651321L)
    val other = (1 to 10).map(r => (1L, r * 7L + 1L, r)).toDF("query_id", "neighbor_id", "rank")
    assert(ModelEval.annRboAtK(other, ranked, k = 10).collect().head.getLong(3) === 0L)
  }

  test("annRboAtK: order matters — swapped top-2 at p=1/2 reads exactly 1/4") {
    // A = [a, b], B = [b, a]: X_1 = 0, X_2 = 2
    // RBO = (1/2)(0/1 + (1/2)(2/2)) = 1/4
    val ex = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "neighbor_id", "rank")
    val ap = Seq((1L, 20L, 1), (1L, 10L, 2)).toDF("query_id", "neighbor_id", "rank")
    val r = ModelEval.annRboAtK(ap, ex, k = 2, pNum = 1L, pDen = 2L).collect().head
    assert(r.getLong(2) === 2L && r.getLong(3) === 250000L)
  }

  test("annRboAtK matches an exact BigInt rational reference on random lists") {
    val rnd = new Random(61)
    val ids = (1L to 30L).toVector
    def list10(): Vector[(Long, Int)] = rnd.shuffle(ids).take(10).zipWithIndex
      .map { case (n, i) => (n, i + 1) }
    val (la, lb) = (list10(), list10())
    val ap = la.map { case (n, r) => (1L, n, r) }.toDF("query_id", "neighbor_id", "rank")
    val ex = lb.map { case (n, r) => (1L, n, r) }.toDF("query_id", "neighbor_id", "rank")
    val ref = {
      // Σ (1-p)·p^(d-1)·X_d/d as one BigInt fraction over 10^10·lcm(1..10)
      val num = (1 to 10).map { d =>
        val xa = la.filter(_._2 <= d).map(_._1).toSet
        val xb = lb.filter(_._2 <= d).map(_._1).toSet
        BigInt(9).pow(d - 1) * BigInt(10).pow(10 - d) * (2520 / d) *
          (xa & xb).size
      }.sum
      (BigInt(1000000) * num / (BigInt(10).pow(10) * 2520)).toLong
    }
    assert(ModelEval.annRboAtK(ap, ex, k = 10).collect().head.getLong(3) === ref)
  }

  // ------------------------------------------------- thresholdForPrecision

  test("thresholdForPrecision: picks the LOWEST qualifying cutoff") {
    // scores desc: 4(y=1), 3(y=1), 2(y=0), 1(y=1)
    // cutoffs: >=4e6 prec 1/1; >=3e6 2/2; >=2e6 2/3=0.667; >=1e6 3/4=0.75
    // target 0.7 -> ok at 4e6, 3e6, 1e6 (NOT 2e6) -> lowest = 1e6,
    // achieved 750000 precision, recall 3/3 = 1e6, kept 4
    val d = Seq(("g", 4.0, 1L), ("g", 3.0, 1L), ("g", 2.0, 0L), ("g", 1.0, 1L))
      .toDF("g", "s", "y")
    val r = ModelEval.thresholdForPrecision(d, "g", "s", "y", 700000L)
      .collect().head
    assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) ===
      ((1000000L, 750000L, 1000000L, 4L)))
  }

  test("thresholdForPrecision: unreachable target and no positives -> sentinels") {
    val d = Seq(("a", 2.0, 0L), ("a", 1.0, 1L),   // best prec = 1/2 < 0.9
      ("b", 1.0, 0L))                              // no positives at all
      .toDF("g", "s", "y")
    val got = ModelEval.thresholdForPrecision(d, "g", "s", "y", 900000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got("a") === ((-1L, -1L, -1L, 0L)))
    assert(got("b") === ((-1L, -1L, -1L, 0L)))
  }

  test("thresholdForPrecision: achieved precision always meets the target " +
      "and is the max-recall qualifying cutoff on random data") {
    val rnd = new Random(53)
    val d = (1 to 500).map(_ =>
      ("g", rnd.nextInt(30) / 3.0, (rnd.nextInt(10) < 6).compare(false).toLong))
      .toDF("g", "s", "y")
    val r = ModelEval.thresholdForPrecision(d, "g", "s", "y", 650000L).collect().head
    if (r.getLong(3) >= 0) {
      assert(r.getLong(4) >= 650000L)
      // no lower cutoff may also qualify (it was the minimum)
      val rows = d.collect().map(x => (math.round(x.getDouble(1) * 1e6), x.getLong(2)))
      val below = rows.filter(_._1 < r.getLong(3)).map(_._1).distinct.sorted.reverse
      below.foreach { cut =>
        val kept = rows.filter(_._1 >= cut)
        assert(1000000L * kept.count(_._2 == 1L) < 650000L * kept.length,
          s"cutoff $cut would also qualify")
      }
    }
  }

  // ------------------------------------------------------ nmiClusterLabel

  test("nmiClusterLabel: perfect correspondence reads exactly 1e6, " +
      "independence 0, double-degenerate -1") {
    // perfect: cluster == label -> MI and H share identical per-cell
    // terms (diagonal ln(n/n_c)) so rounding cancels exactly
    val perfect = Seq((1L, 10L), (1L, 10L), (2L, 20L), (3L, 30L))
      .map { case (c, l) => ("g", c, l) }.toDF("g", "c", "l")
    val p = ModelEval.nmiClusterLabel(perfect, "g", "c", "l").collect().head
    assert(p.getLong(5) === 1000000L)
    // independence: every (c, l) cell has n_cl*n == n_c*n_l -> ln 1 = 0
    val indep = (for { c <- 1L to 2L; l <- 1L to 3L } yield ("g", c, l))
      .toDF("g", "c", "l")
    val i = ModelEval.nmiClusterLabel(indep, "g", "c", "l").collect().head
    assert(i.getLong(2) === 0L && i.getLong(5) === 0L)
    // single cluster AND single label -> both entropies 0 -> sentinel
    val deg = Seq(("g", 1L, 10L), ("g", 1L, 10L)).toDF("g", "c", "l")
    assert(ModelEval.nmiClusterLabel(deg, "g", "c", "l")
      .collect().head.getLong(5) === -1L)
  }

  test("nmiClusterLabel matches a driver-side reference on random data") {
    val rnd = new Random(41)
    val rows = (1 to 400).map(_ => ("g", rnd.nextInt(5).toLong, rnd.nextInt(3).toLong))
    val ref = {
      val n = rows.size.toDouble
      val cl = rows.groupBy(r => (r._2, r._3)).view.mapValues(_.size).toMap
      val mc = rows.groupBy(_._2).view.mapValues(_.size).toMap
      val ml = rows.groupBy(_._3).view.mapValues(_.size).toMap
      val mi = cl.map { case ((c, l), ncl) =>
        math.round(1e9 * (ncl / n) * math.log((ncl * n) / (mc(c).toDouble * ml(l))))
      }.sum
      val hc = mc.values.map(x => math.round(1e9 * (x / n) * math.log(n / x))).sum
      val hl = ml.values.map(x => math.round(1e9 * (x / n) * math.log(n / x))).sum
      (mi, hc, hl, 1000000L * mi / math.max(hc, hl))
    }
    val got = ModelEval.nmiClusterLabel(rows.toDF("g", "c", "l"), "g", "c", "l")
      .collect().head
    assert((got.getLong(2), got.getLong(3), got.getLong(4), got.getLong(5)) === ref)
  }

  // -------------------------------------------------------- fairnessGaps

  test("fairnessGaps: hand-computed rates, gaps, and sentinel exclusion") {
    // A: 4 rows, sel 2/4, y=1 rows {tp 1 of 2} -> tpr 500000, fpr 1/2
    // B: 2 rows, all selected, all positive, tp 2/2 -> tpr 1e6, fpr -1
    //    (no negatives; must NOT drag the fpr max)
    val d = Seq(
      ("A", 1L, 1L), ("A", 1L, 0L), ("A", 0L, 1L), ("A", 0L, 0L),
      ("B", 1L, 1L), ("B", 1L, 1L))
      .toDF("g", "y", "p")
    val got = ModelEval.fairnessGaps(d, "g", "y", "p")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // sel: A 500000, B 1000000 -> gaps 500000 / 0
    // tpr: A 500000, B 1000000 -> gaps 500000 / 0
    // fpr: A 500000, B -1 -> gap A 0 (max over non-sentinels = A), B -1
    assert(got("A") === ((500000L, 500000L, 500000L, 500000L, 500000L, 0L)))
    assert(got("B") === ((1000000L, 1000000L, -1L, 0L, 0L, -1L)))
  }

  test("fairnessGaps: best-treated cohort reads gap 0 everywhere") {
    val rnd = new Random(31)
    val d = (1 to 500).map { _ =>
      val g = s"g${rnd.nextInt(4)}"
      (g, rnd.nextInt(2).toLong, rnd.nextInt(2).toLong)
    }.toDF("g", "y", "p")
    val rows = ModelEval.fairnessGaps(d, "g", "y", "p").collect()
    assert(rows.exists(_.getLong(5) === 0L))   // some cohort has sel gap 0
    rows.foreach { r =>
      assert(r.getLong(5) >= 0L)
      if (r.getLong(3) >= 0L) assert(r.getLong(6) >= 0L)
    }
  }

  // ---------------------------------------------------- averagePrecision

  test("averagePrecision: hand cases — interleaved, perfect, empty") {
    // A: order (by score desc) y = [1,0,1,0] -> terms 1e6 (k=1, pc=1) and
    //    666666 (k=3, pc=2); AP = 1666666 // 2 = 833333
    // B: positives first -> every term 1e6 -> AP = 1e6
    // C: no positives -> sentinel -1, n_pos 0
    val d = Seq(
      ("A", 4.0, 1L, 1L), ("A", 3.0, 2L, 0L), ("A", 2.0, 3L, 1L), ("A", 1.0, 4L, 0L),
      ("B", 4.0, 1L, 1L), ("B", 3.0, 2L, 1L), ("B", 2.0, 3L, 0L),
      ("C", 1.0, 1L, 0L))
      .toDF("g", "s", "id", "y")
    val got = ModelEval.averagePrecision(d, "g", "s", "id", "y")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("A" -> ((2L, 833333L)), "B" -> ((2L, 1000000L)),
      "C" -> ((0L, -1L))))
  }

  test("averagePrecision: ties are ordered by id — the pinned convention") {
    // all scores equal; id order puts y = [0, 1]: term at k=2 pc=1 ->
    // 500000; a pos-first tie order would read 1e6
    val d = Seq(("g", 1.0, 1L, 0L), ("g", 1.0, 2L, 1L)).toDF("g", "s", "id", "y")
    val got = ModelEval.averagePrecision(d, "g", "s", "id", "y").collect().head
    assert(got.getLong(2) === 500000L)
  }

  test("averagePrecision matches an exact integer reference on random data") {
    val rnd = new Random(23)
    val rows = (1L to 300L).map(id =>
      ("g", rnd.nextInt(40) / 7.0, id, rnd.nextInt(3).min(1).toLong))
    val ref = {
      val ranked = rows.sortBy { case (_, s, id, _) =>
        (-math.round(s * 1e6), id)
      }
      val terms = ranked.zipWithIndex.collect {
        case ((_, _, _, 1L), i) =>
          val k = i + 1L
          val pc = ranked.take(i + 1).count(_._4 == 1L).toLong
          1000000L * pc / k
      }
      terms.sum / terms.length
    }
    val got = ModelEval.averagePrecision(rows.toDF("g", "s", "id", "y"),
      "g", "s", "id", "y").collect().head
    assert(got.getLong(2) === ref)
  }

  // ---------------------------------------------------------------- bhFdr

  test("bhFdr: textbook hand case — reject exactly the first three ranks") {
    // p = [.01, .02, .03, .5, .6], m=5, alpha=.05: per-rank thresholds
    // .01/.02/.03/.04/.05 -> k=3
    val d = Seq(("f", 1L, 10000L), ("f", 2L, 20000L), ("f", 3L, 30000L),
      ("f", 4L, 500000L), ("f", 5L, 600000L)).toDF("g", "t", "p")
    val got = ModelEval.bhFdr(d, "g", "t", "p")
      .collect().map(r => r.getLong(1) -> (r.getLong(4), r.getLong(5))).toMap
    assert(got.view.mapValues(_._2).toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 0L))
    // adjusted q-values: p*m//rank = [50000,50000,50000,625000,600000],
    // suffix-min -> [50000,50000,50000,600000,600000]
    assert(got.view.mapValues(_._1).toMap === Map(1L -> 50000L, 2L -> 50000L,
      3L -> 50000L, 4L -> 600000L, 5L -> 600000L))
  }

  test("bhFdr: step-up rejects a rank that fails its OWN threshold") {
    // p = [.04, .04], m=2, alpha=.05: rank 1 fails .025 but rank 2 passes
    // .05, and the step-up rejects EVERYTHING at or below k=2 — the case
    // a naive per-rank gate gets wrong
    val d = Seq(("f", 1L, 40000L), ("f", 2L, 40000L)).toDF("g", "t", "p")
    val got = ModelEval.bhFdr(d, "g", "t", "p")
      .collect().map(r => r.getLong(1) -> r.getLong(5)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L))
  }

  test("bhFdr: families are independent and out-of-range p raises") {
    val d = Seq(("a", 1L, 1000L), ("a", 2L, 900000L),
      ("b", 1L, 900000L)).toDF("g", "t", "p")
    val got = ModelEval.bhFdr(d, "g", "t", "p")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(5)).toMap
    assert(got(("a", 1L)) === 1L && got(("a", 2L)) === 0L && got(("b", 1L)) === 0L)
    val e = intercept[Exception] {
      ModelEval.bhFdr(Seq(("a", 1L, 1000001L)).toDF("g", "t", "p"), "g", "t", "p")
        .collect()
    }
    assert(msgs(e).exists(_.contains("bhFdr")))
  }

  test("mcnemarTest: hand discordant counts, concordant-only sentinel, " +
      "empty-frame sentinels, determinism") {
    import spark.implicits._
    val rows = (Seq.fill(5)((1L, 1L)) ++ Seq.fill(3)((1L, 0L)) ++
      Seq((0L, 1L)) ++ Seq.fill(2)((0L, 0L))).toDF("ok_a", "ok_b")
    val got = graft.operators.ModelEval.mcnemarTest(rows, "ok_a", "ok_b")
      .collect().head
    // n=11, na=8, nb=6, b=3, c=1 -> stat = (|2|-1)^2/4 = 250000 micro
    assert(got.toSeq === Seq(11L, 727272L, 545454L, 3L, 1L, 250000L))
    val conc = graft.operators.ModelEval.mcnemarTest(
      Seq((1L, 1L), (0L, 0L)).toDF("ok_a", "ok_b"), "ok_a", "ok_b")
      .collect().head
    assert(conc.getLong(5) === -1L)
    val empty = graft.operators.ModelEval.mcnemarTest(
      Seq.empty[(Long, Long)].toDF("ok_a", "ok_b"), "ok_a", "ok_b")
      .collect().head
    assert(empty.toSeq === Seq(0L, -1L, -1L, 0L, 0L, -1L))
    val again = graft.operators.ModelEval.mcnemarTest(
      rows.repartition(5), "ok_a", "ok_b").collect().head
    assert(again.toSeq === got.toSeq)
  }

  test("rankSumTest: hand doubled-U with ties, a clear shift is " +
      "significant, identical arms are not, one-arm group reads the " +
      "sentinel, determinism") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // group g: arm0 = {1, 2, 2}, arm1 = {2, 3} (tie block at 2).
    // Sorted blocks: 1(t=1), 2(t=3), 3(t=1); doubled ranks 2; 2+3+1=... r2
    // at v=1: 2*0+1+1=2; v=2: 2*1+3+1=6; v=3: 2*4+1+1=10.
    // 2R_a = 1*2 + 2*6 = 14; 2U_a = 14 - 3*4 = 2; dev = 2 - 6 = -4.
    val g = Seq((1.0, 0L), (2.0, 0L), (2.0, 0L), (2.0, 1L), (3.0, 1L))
      .map { case (v, s) => ("g", v, s) }
    // group h: arm1 clearly larger, 12 vs 12 values, no overlap
    val h = (1 to 12).map(i => ("h", i.toDouble, 0L)) ++
      (1 to 12).map(i => ("h", 100.0 + i, 1L))
    // group i: identical arms -> dev 0, not significant
    val iG = (1 to 8).flatMap(k => Seq(("i", k.toDouble, 0L), ("i", k.toDouble, 1L)))
    // group j: one-armed -> sentinel
    val j = Seq(("j", 5.0, 0L))
    val df = (g ++ h ++ iG ++ j).toDF("grp", "v", "side")
    def read(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val got = read(graft.operators.ModelEval.rankSumTest(df, "grp", "v", "side"))
    assert(got("g") === ((3L, 2L, 2L, -1L, 0L)))
    // h: arm0 ranks 1..12 -> 2R_a = 2*78 = 156; 2U_a = 156 - 12*13 = 0;
    // dev = 0 - 144 = -144 -> maximal shift, significant
    assert(got("h") === ((12L, 12L, 0L, -1L, 1L)))
    assert(got("i")._4 === 0L && got("i")._5 === 0L)
    assert(got("j") === ((1L, 0L, -1L, 0L, 0L)))
    assert(read(graft.operators.ModelEval.rankSumTest(
      df.repartition(7), "grp", "v", "side")) === got)
    // guard: a non-0/1 side fails loudly
    val bad = Seq(("k", 1.0, 2L)).toDF("grp", "v", "side")
    val e = intercept[Exception] {
      graft.operators.ModelEval.rankSumTest(bad, "grp", "v", "side").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("side must be 0/1")))
  }

  test("friedmanTest: consistent ranking is significant with the hand " +
      "statistic, all-tied reads the sentinel, incomplete blocks drop, " +
      "within-block ties average, determinism, class guard") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def fr(rows: Seq[(String, String, Double)]) =
      graft.operators.ModelEval.friedmanTest(
        rows.toDF("subj", "sys", "v"), "subj", "sys", "v").collect().head
    // 4 subjects, 3 systems, always a < b < c:
    // R2 = (8, 16, 24), n(k+1) = 16 -> S = 128; A2 = 224; den = 32
    // q = 1e6 * 2 * 128 / 32 = 8e6 >= chi2(2, .95) = 5.991465
    val consistent = for {
      s <- Seq("s1", "s2", "s3", "s4")
      (sys, v) <- Seq(("a", 1.0), ("b", 2.0), ("c", 3.0))
    } yield (s, sys, v + s.hashCode % 2 * 10.0) // per-subject level shifts out
    val g1 = fr(consistent)
    assert(g1.getLong(0) === 3L && g1.getLong(1) === 4L)
    assert(g1.getLong(2) === 8000000L && g1.getLong(3) === 1L)
    // an extra INCOMPLETE subject (one system only) must drop, not skew
    val g2 = fr(consistent ++ Seq(("s5", "a", 9.0)))
    assert(g2.toSeq === g1.toSeq)
    // all values tied within every subject -> zero denominator -> sentinel
    val tied = for {
      s <- Seq("s1", "s2"); sys <- Seq("a", "b", "c")
    } yield (s, sys, 7.0)
    val g3 = fr(tied)
    assert(g3.getLong(2) === -2000000L && g3.getLong(3) === -1L)
    // within-block tie: subject s1 has a == b < c -> doubled avg ranks
    // (3, 3, 6); replica over BigInt with the same arithmetic
    val withTie = Seq(
      ("s1", "a", 1.0), ("s1", "b", 1.0), ("s1", "c", 2.0),
      ("s2", "a", 1.0), ("s2", "b", 2.0), ("s2", "c", 3.0))
    val g4 = fr(withTie)
    val r2s = Map("a" -> (3L + 2L), "b" -> (3L + 4L), "c" -> (6L + 6L))
    val n = 2L; val k = 3L
    val s2 = r2s.values.map(r => BigInt(r - n * (k + 1)) * BigInt(r - n * (k + 1))).sum
    val a2 = BigInt(9 + 9 + 36) + BigInt(4 + 16 + 36)
    val den = a2 - BigInt(n * k * (k + 1) * (k + 1))
    val want = (BigInt(1000000) * (k - 1) * s2 / den).toLong
    assert(g4.getLong(2) === want)
    // determinism
    val again = graft.operators.ModelEval.friedmanTest(
      consistent.toDF("subj", "sys", "v").repartition(7),
      "subj", "sys", "v").collect().head
    assert(again.toSeq === g1.toSeq)
    // guard: > 8 systems
    val many = (1 to 9).map(i => ("s1", s"sys$i", i.toDouble))
    val e = intercept[IllegalArgumentException] {
      graft.operators.ModelEval.friedmanTest(
        many.toDF("subj", "sys", "v"), "subj", "sys", "v")
    }
    assert(e.getMessage.contains("table bound"))
  }

  test("kruskalWallis: two-class case reduces to the rank-sum frame, a " +
      "clear separation is significant, identical classes are not, " +
      "all-tied and single-class read sentinels, determinism, class guard") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def kw(rows: Seq[(String, Double)]) =
      graft.operators.ModelEval.kruskalWallis(
        rows.toDF("cls", "v"), "cls", "v").collect().head
    // three well-separated classes: H must clear chi2(2, .95) = 5.99
    val sep = (1 to 8).map(i => ("a", i.toDouble)) ++
      (1 to 8).map(i => ("b", 100.0 + i)) ++
      (1 to 8).map(i => ("c", 200.0 + i))
    val g1 = kw(sep)
    assert(g1.getLong(0) === 3L && g1.getLong(1) === 24L)
    assert(g1.getLong(3) === 1L, s"separated classes must reject: $g1")
    // BigInt replica with the same DIV order on the separated case
    val n = 24L
    // ranks: class a = 1..8, b = 9..16, c = 17..24 (no ties) -> doubled
    val r2 = Seq(1 to 8, 9 to 16, 17 to 24).map(_.map(_ * 2L).sum)
    val s = r2.map(x => BigInt(x) * BigInt(x) / 8).sum
    val want = (BigInt(1000000) * 3 *
      (s - BigInt(n) * (n + 1) * (n + 1)) * (n - 1) /
      (BigInt(n) * n * n - n)).toLong
    assert(g1.getLong(2) === want)
    // identical class distributions: H ~ 0, not significant
    val same = (1 to 10).flatMap(i =>
      Seq(("a", i.toDouble), ("b", i.toDouble), ("c", i.toDouble)))
    val g2 = kw(same)
    assert(g2.getLong(3) === 0L && math.abs(g2.getLong(2)) < 1000000L)
    // all values tied -> zero variance -> sentinel
    val tied = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0))
    val g3 = kw(tied)
    assert(g3.getLong(2) === -2000000L && g3.getLong(3) === -1L)
    // single class -> sentinel
    val solo = Seq(("a", 1.0), ("a", 2.0))
    val g4 = kw(solo)
    assert(g4.getLong(2) === -2000000L && g4.getLong(3) === -1L)
    // determinism under repartition
    val again = graft.operators.ModelEval.kruskalWallis(
      sep.toDF("cls", "v").repartition(7), "cls", "v").collect().head
    assert(again.toSeq === g1.toSeq)
    // class-count guard (chi-square table bound)
    val many = (1 to 9).map(i => (s"c$i", i.toDouble))
    val e2 = intercept[Exception] {
      graft.operators.ModelEval.kruskalWallis(
        many.toDF("cls", "v"), "cls", "v").collect()
    }
    def msgs2(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs2(x.getCause))
    assert(msgs2(e2).exists(m => m != null && m.contains("table bound")))
  }

  test("kruskalWallis: the double pre-check raises the NAMED overflow " +
      "error on counts past the decimal(38,0) numerator window, and a " +
      "same-shape small histogram passes") {
    import spark.implicits._
    // two classes on two extreme value blocks: s − N(N+1)² = 2c³, so the
    // numerator ~ 1.2e7·c⁴ clears 5e37 at c ≈ 1.5e8 — fabricated counts
    // drive the FromCounts seam the way rankSumFromCounts' guard is driven
    def hist(c: Long) =
      Seq(("a", 1L, c), ("b", 2L, c)).toDF("cls", "sm", "cc")
    val e = intercept[Exception] {
      graft.operators.ModelEval.kruskalWallisFromCounts(hist(200000000L))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null &&
      m.contains("kruskalWallis") && m.contains("overflow")))
    // identical shape below the window computes (and rejects the null)
    val ok = graft.operators.ModelEval.kruskalWallisFromCounts(hist(1000L))
      .collect().head
    assert(ok.getLong(3) === 1L)
  }

  test("cochranQ: textbook hand case, degenerate all-equal blocks read " +
      "the sentinel, incomplete blocks drop, cell max rule, 0/1 guard, " +
      "determinism") {
    import spark.implicits._
    def q(rows: Seq[(String, String, Long)]) =
      graft.operators.ModelEval.cochranQ(
        rows.toDF("subj", "sys", "y"), "subj", "sys", "y").collect().head
    // 4 subjects x 3 systems; G = (4, 2, 1), L = (3, 2, 1, 1), T = 7
    val rows = Seq(
      ("s1", "a", 1L), ("s1", "b", 1L), ("s1", "c", 1L),
      ("s2", "a", 1L), ("s2", "b", 1L), ("s2", "c", 0L),
      ("s3", "a", 1L), ("s3", "b", 0L), ("s3", "c", 0L),
      ("s4", "a", 1L), ("s4", "b", 0L), ("s4", "c", 0L))
    val got = q(rows)
    // Q = (k-1)(k*sumG2 - T^2)/(k*T - sumL2) = 2*(63-49)/(21-15) = 28/6
    val want = BigInt(1000000) * 2 * (3 * 21 - 49) / (3 * 7 - 15)
    assert(got.getLong(0) === 3L && got.getLong(1) === 4L)
    assert(got.getLong(2) === 7L)
    assert(got.getLong(3) === want.toLong)
    assert(got.getLong(4) === (if (want.toLong >= 5991465L) 1L else 0L))
    // all-equal blocks: den = 0 -> sentinel
    val flat = q(Seq(("s1", "a", 1L), ("s1", "b", 1L),
      ("s2", "a", 0L), ("s2", "b", 0L)))
    assert(flat.getLong(3) === -2000000L && flat.getLong(4) === -1L)
    // incomplete block drops: s3 missing system b contributes nothing
    val withIncomplete = q(rows ++ Seq(("s9", "a", 1L)))
    assert(withIncomplete.toSeq === got.toSeq)
    // multiple rows per cell reduce by max
    val dupCell = q(rows ++ Seq(("s3", "b", 0L)))
    assert(dupCell.toSeq === got.toSeq)
    // non-binary outcome raises
    val e = intercept[Exception] { q(rows ++ Seq(("s4", "a", 2L))) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("must be 0/1")))
    val again = graft.operators.ModelEval.cochranQ(
      rows.toDF("subj", "sys", "y").repartition(7), "subj", "sys", "y")
      .collect().head
    assert(again.toSeq === got.toSeq)
  }

  test("cvmTest: hand separated-arms integral, identical arms read 0, " +
      "empty arm reads the sentinel, BigInt replica on a mixed draw, " +
      "side guard") {
    import spark.implicits._
    def cvm(rows: Seq[(String, Double, Long)]) =
      graft.operators.ModelEval.cvmTest(
        rows.toDF("g", "v", "side"), "g", "v", "side")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // a = {1..5}, b = {11..15}: per-block S = i^2 then (5-j)^2,
    // ts = 55 + 30 = 85, T = 1e6*85/100 = 850000 >= 461360 -> drift
    val sep = (1 to 5).map(i => ("s", i.toDouble, 0L)) ++
      (11 to 15).map(i => ("s", i.toDouble, 1L))
    assert(cvm(sep)("s") === ((5L, 5L, 850000L, 1L)))
    // identical arms: every gap 0
    val same = (1 to 6).flatMap(i => Seq(("e", i.toDouble, 0L), ("e", i.toDouble, 1L)))
    assert(cvm(same)("e") === ((6L, 6L, 0L, 0L)))
    // one arm empty -> sentinels
    assert(cvm((1 to 4).map(i => ("o", i.toDouble, 0L)))("o")
      === ((4L, 0L, -1L, -1L)))
    // driver replica with the same DIV-then-weight order
    val rnd = new scala.util.Random(41)
    val mixed = (1 to 60).map(_ =>
      ("m", rnd.nextInt(9) * 0.5, rnd.nextInt(2).toLong))
    val byV = mixed.groupBy(x => math.round(x._2 * 1e6)).toSeq.sortBy(_._1)
    val na = mixed.count(_._3 == 0L).toLong
    val nb = mixed.size - na
    var (cumA, cumB) = (0L, 0L)
    var ts = BigInt(0)
    byV.foreach { case (_, rs) =>
      val ca = rs.count(_._3 == 0L).toLong
      val cb = rs.size - ca
      cumA += ca; cumB += cb
      val gap = BigInt(nb) * cumA - BigInt(na) * cumB
      ts += BigInt(ca + cb) * (gap * gap / (BigInt(na) * nb))
    }
    val n = BigInt(na + nb)
    val want = (BigInt(1000000) * ts / (n * n)).toLong
    assert(cvm(mixed)("m")._3 === want)
    val e = intercept[Exception] { cvm(sep ++ Seq(("s", 1.0, 5L))) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("side must be 0/1")))
  }

  test("moodMedianTest: separated classes reject, identical classes read " +
      "chi2=0, all-tied and single-class read sentinels, determinism") {
    import spark.implicits._
    def mm(rows: Seq[(String, Double)]) =
      graft.operators.ModelEval.moodMedianTest(
        rows.toDF("cls", "v"), "cls", "v").collect().head
    // a = {1..4}, b = {10..13}: pooled lower median 4, a_j = (0, 4),
    // S_j = 64 + 64, chi2 = 128/(4*4) = 8.0 -> rejected at chi2(1)
    val sep = (1 to 4).map(i => ("a", i.toDouble)) ++
      (10 to 13).map(i => ("b", i.toDouble))
    val g1 = mm(sep)
    assert(g1.toSeq === Seq(2L, 8L, 4L, 8000000L, 1L))
    // identical class distributions: chi2 exactly 0
    val same = (1 to 4).flatMap(i => Seq(("a", i.toDouble), ("b", i.toDouble)))
    val g2 = mm(same)
    assert(g2.getLong(3) === 0L && g2.getLong(4) === 0L)
    // all values equal: nothing above the median -> sentinel
    val flat = mm(Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)))
    assert(flat.getLong(3) === -2000000L && flat.getLong(4) === -1L)
    // single class -> sentinel
    val solo = mm(Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0)))
    assert(solo.getLong(3) === -2000000L && solo.getLong(4) === -1L)
    val again = graft.operators.ModelEval.moodMedianTest(
      sep.toDF("cls", "v").repartition(7), "cls", "v").collect().head
    assert(again.toSeq === g1.toSeq)
  }

  test("signedRankTest: hand doubled-W+ with ties, consistent shift is " +
      "significant, zero diffs and incomplete pairs drop, side guard") {
    import spark.implicits._
    def sr(rows: Seq[(String, Long, Double, Long)]) =
      graft.operators.ModelEval.signedRankTest(
        rows.toDF("g", "subj", "v", "side"), "g", "subj", "v", "side")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // 8 subjects all shifted up by the same amounts (tie-dense |d|):
    // diffs = (1,1,2,2,3,3,4,4) -> r2 blocks: |1|:t2 r2=3, |2|:t2 r2=7,
    // |3|:t2 r2=11, |4|:t2 r2=15 -> W2+ = 2(3+7+11+15) = 72 (all positive)
    val up = (1L to 8L).flatMap { s =>
      val d = ((s - 1) / 2 + 1).toDouble
      Seq(("g", s, 10.0, 0L), ("g", s, 10.0 + d, 1L))
    }
    val got = sr(up)
    assert(got("g")._1 === 8L && got("g")._2 === 72L && got("g")._3 === 1L)
    // n=8, no ties broken: dev = 144-72 = 72; gate 625*3*72^2 = 9.72e6 >
    // 2401*(2*8*9*17 - T), T = 4*(8-2) = 24 -> 2401*2424 = 5.82e6 -> sig
    assert(got("g")._4 === 1L)
    // zero diffs and incomplete pairs drop entirely
    val noisy = sr(up ++ Seq(("g", 90L, 5.0, 0L), ("g", 91L, 5.0, 0L),
      ("g", 91L, 5.0, 1L)))
    assert(noisy("g") === got("g"))
    // a group with ONLY zero/incomplete pairs emits no row
    assert(sr(Seq(("z", 1L, 5.0, 0L), ("z", 1L, 5.0, 1L))).isEmpty)
    val e = intercept[Exception] {
      sr(up ++ Seq(("g", 99L, 1.0, 2L)))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("side must be 0/1")))
  }

  test("cliffsDelta: perfect separation reads ±1e6/large, identical " +
      "distributions read 0/negligible, empty arm reads the sentinel, " +
      "magnitude thresholds") {
    import spark.implicits._
    def cd(rows: Seq[(String, Double, Long)]) =
      graft.operators.ModelEval.cliffsDelta(
        rows.toDF("g", "v", "side"), "g", "v", "side")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val rows =
      // arm 0 all above arm 1 -> delta = +1
      (1 to 4).map(i => ("hi", 10.0 + i, 0L)) ++
        (1 to 3).map(i => ("hi", i.toDouble, 1L)) ++
        // identical values -> delta = 0
        (1 to 4).flatMap(i => Seq(("eq", i.toDouble, 0L), ("eq", i.toDouble, 1L))) ++
        // one arm empty -> sentinel
        (1 to 3).map(i => ("solo", i.toDouble, 0L))
    val got = cd(rows)
    assert(got("hi") === ((4L, 3L, 1000000L, "large")))
    assert(got("eq") === ((4L, 4L, 0L, "negligible")))
    assert(got("solo") === ((3L, 0L, -2000000L, "undefined")))
    // driver replica on a mixed draw: delta = (#(a>b) - #(a<b))/(na*nb)
    val rnd = new scala.util.Random(97)
    val mixed = (1 to 40).map(_ =>
      ("m", rnd.nextInt(9) * 0.5, rnd.nextInt(2).toLong))
    val a = mixed.filter(_._3 == 0L).map(_._2)
    val b = mixed.filter(_._3 == 1L).map(_._2)
    val wins = (for (x <- a; y <- b) yield math.signum(x - y)).sum
    val want = BigInt(1000000) * BigInt(wins.toLong) /
      (BigInt(a.size) * b.size)
    assert(cd(mixed)("m")._3 === want.toLong)
  }
}

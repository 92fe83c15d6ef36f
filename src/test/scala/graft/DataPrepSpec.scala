package graft

import org.apache.spark.sql.functions._

import graft.operators.DataPrep

/** Pins the deterministic-split boundary semantics and the chunking
  * arithmetic the oracle queries exercise at only one parameter point.
  */
class DataPrepSpec extends SparkSpec {

  private lazy val docs = Tables.table(spark, sfDir, "documents").cache()

  test("hashSplit boundaries: trainBps=10000 is all train, trainBps=0 is all test") {
    val allTrain = DataPrep.hashSplit(docs, "doc_id", trainBps = 10000)
    assert(allTrain.filter(col("split") =!= "train").count() === 0L)
    val allTest = DataPrep.hashSplit(docs, "doc_id", trainBps = 0)
    assert(allTest.filter(col("split") =!= "test").count() === 0L)
  }

  test("leakageSafeSplit: near-dup components never straddle the split") {
    import spark.implicits._
    // 1-2-3 chained near-dups, 4 isolated, 5-6 a pair
    val d = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = DataPrep.leakageSafeSplit(d, "doc_id", pairs, trainBps = 5000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSeq
    val byDoc = got.map(t => t._1 -> t._3).toMap
    // the leakage property: every component is split-homogeneous
    assert(byDoc(1L) === byDoc(2L) && byDoc(2L) === byDoc(3L))
    assert(byDoc(5L) === byDoc(6L))
    // components follow the min-id convention; isolated docs are their own
    val comp = got.map(t => t._1 -> t._2).toMap
    assert(comp(1L) === 1L && comp(2L) === 1L && comp(3L) === 1L)
    assert(comp(4L) === 4L && comp(5L) === 5L && comp(6L) === 5L)
    // with no pairs at all, the split decision reduces to hashSplit on the
    // component (= the doc id) — same buckets, same cuts
    val noPairs = DataPrep.leakageSafeSplit(
        d, "doc_id", Seq.empty[(Long, Long)].toDF("id_a", "id_b"), trainBps = 5000)
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val plain = DataPrep.hashSplit(d, "doc_id", trainBps = 5000)
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(noPairs === plain)
  }

  test("hashSplit is deterministic and roughly proportional") {
    val n = docs.count().toDouble
    val split = DataPrep.hashSplit(docs, "doc_id", trainBps = 8000)
    val trainFrac = split.filter(col("split") === "train").count() / n
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction $trainFrac vs 0.8 target")
    // stable under repartitioning: a doc's split never depends on other rows
    val again = DataPrep.hashSplit(docs.repartition(7), "doc_id", trainBps = 8000)
    val moved = split.select("doc_id", "split")
      .except(again.select("doc_id", "split")).count()
    assert(moved === 0L)
  }

  test("packSequences: cumulative-offset invariants (monotone packs, bounded overflow)") {
    val packed = DataPrep.packSequences(docs, "text", "doc_id", "lang", budget = 128)
      .collect().map(r => (r.getString(r.fieldIndex("grp")), r.getLong(r.fieldIndex("doc")),
        r.getInt(r.fieldIndex("n_tok")).toLong, r.getLong(r.fieldIndex("pack_id"))))
    assert(packed.nonEmpty)
    packed.groupBy(_._1).foreach { case (grp, rows) =>
      val ordered = rows.sortBy(_._2)
      // packs start at 0 and never decrease in doc order
      assert(ordered.head._4 === 0L, s"$grp: first pack must be 0")
      ordered.sliding(2).foreach {
        case Array((_, _, prevTok, prevPack), (_, d, _, pack)) =>
          assert(pack >= prevPack, s"$grp/$d: pack went backwards")
          // a jump of more than one pack needs an oversize doc spanning windows
          if (pack > prevPack + 1)
            assert(prevTok > 128, s"$grp/$d: pack skipped without an oversize doc")
        case _ => ()
      }
      // cumulative-offset bound: a pack holds at most budget + maxDoc - 1 tokens
      val maxTok = ordered.map(_._3).max
      ordered.groupBy(_._4).foreach { case (p, members) =>
        val total = members.map(_._3).sum
        assert(total <= 128 + maxTok - 1, s"$grp pack $p: $total tokens breaks the bound")
      }
    }
  }

  test("zorderValue: known interleaves, and aligned boxes map to contiguous z-ranges") {
    import spark.implicits._
    // hand cases: x bits land at even positions, y bits at odd
    val hand = Seq((3L, 0L), (0L, 3L), (1L, 1L), (5L, 2L))
      .toDF("x", "y")
      .select(DataPrep.zorderValue(col("x"), col("y"), 4).as("z"))
      .as[Long].collect().toSeq
    // x=0b11 -> z=0b0101=5; y=0b11 -> z=0b1010=10; (1,1) -> 0b11=3;
    // x=0b101,y=0b010 -> even bits 1,0,1 odd bits 0,1,0 -> 0b010011=19? compute:
    // bit0=x0=1, bit1=y0=0, bit2=x1=0, bit3=y1=1, bit4=x2=1, bit5=y2=0 -> 1+8+16=25
    assert(hand === Seq(5L, 10L, 3L, 25L))

    // the Morton contiguity property: a 2^k-ALIGNED 2^k x 2^k box is one
    // contiguous z-range (here: every 16x16 aligned tile of a 64x64 grid)
    val grid = (0L until 64L).flatMap(x => (0L until 64L).map(y => (x, y))).toDF("x", "y")
      .withColumn("z", DataPrep.zorderValue(col("x"), col("y"), 6))
    val tiles = grid
      .withColumn("tile", concat_ws(":", col("x") / 16 cast "int", col("y") / 16 cast "int"))
      .groupBy("tile")
      .agg(min("z").as("mn"), max("z").as("mx"), count(lit(1)).as("c"))
      .filter(col("mx") - col("mn") =!= col("c") - 1)
    assert(tiles.count() === 0L, "every aligned 16x16 tile must be one contiguous z-range")
  }

  test("zorderLayout: data-independent equal-width buckets, stable under repartition") {
    val li = Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_orderkey").bitwiseAND(lit(65535L)).as("xq"),
        col("l_partkey").bitwiseAND(lit(65535L)).as("yq"))
    val a = DataPrep.zorderLayout(li, "xq", "yq", bits = 16, nBuckets = 256)
    assert(a.filter(col("bucket") < 0 || col("bucket") >= 256).count() === 0L)
    val b = DataPrep.zorderLayout(li.repartition(7), "xq", "yq", bits = 16, nBuckets = 256)
    assert(a.except(b).count() === 0L && b.except(a).count() === 0L)
  }

  test("chunkTokens covers every token exactly once at stride == chunkSize") {
    val chunks = DataPrep.chunkTokens(docs, "text", "doc_id", chunkSize = 32, stride = 32)
    val covered = chunks.agg(sum(col("chunk_len"))).head().getLong(0)
    val total = docs
      .select(graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(covered === total)
  }

  // ------------------------------------------- rankNormalize / trimmedMean

  test("rankNormalize: evenly spread ranks map to exact bps; singleton group is 0") {
    import spark.implicits._
    val d = (Seq((1L, "g", 10.0), (2L, "g", 20.0), (3L, "g", 30.0),
      (4L, "g", 40.0), (5L, "g", 50.0), (6L, "solo", 7.0)))
      .toDF("id", "grp", "v")
    val got = DataPrep.rankNormalize(d, "grp", "v", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(1L -> 0L, 2L -> 2500L, 3L -> 5000L, 4L -> 7500L,
      5L -> 10000L, 6L -> 0L))
  }

  test("trimmedMean: tail value trimmed away; untrimmable groups emit nothing") {
    import spark.implicits._
    // 1..19 plus 1000: ranks 1 and 20 trim -> mean of 2..19 = 10.5
    val d = ((1 to 19).map(i => (i.toLong, "g", i.toDouble)) :+ ((20L, "g", 1000.0)))
      .toDF("id", "grp", "v")
    val row = DataPrep.trimmedMean(d, "grp", "v", "id").collect().head
    assert(row.getAs[Long]("n_kept") === 18L)
    assert(row.getAs[Long]("trimmed_mean_micro") === 10500000L,
      "the 1000 outlier must not drag the trimmed mean (plain mean would be 59.5)")
    val solo = DataPrep.trimmedMean(
      Seq((1L, "s", 5.0)).toDF("id", "grp", "v"), "grp", "v", "id")
    assert(solo.count() === 0L, "a group where every rank trims emits no row")
  }

  test("quantileNormalize: shifted groups land on the pooled distribution, " +
      "order within a group is preserved") {
    import spark.implicits._
    // group a = {1,2,3,4}, group b = {101,102,103,104}: b is a pure shift;
    // after normalization both groups read values from the POOLED set and
    // the group maxima map to the pooled maximum
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), (4L, "a", 4.0),
      (5L, "b", 101.0), (6L, "b", 102.0), (7L, "b", 103.0), (8L, "b", 104.0))
      .toDF("id", "grp", "v")
    val got = DataPrep.quantileNormalize(df, "grp", "v", "id")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    val pooled = df.collect().map(r => math.round(r.getDouble(2) * 1e6)).toSet
    got.values.foreach { case (_, _, nm) => assert(pooled.contains(nm)) }
    // group maxima -> pooled maximum (rank n/n -> pooled rank N)
    assert(got(4L)._3 === 104000000L && got(8L)._3 === 104000000L)
    // both groups get the SAME normalized multiset (equal group sizes)
    val na = got.values.filter(_._1 == "a").map(_._3).toSeq.sorted
    val nb = got.values.filter(_._1 == "b").map(_._3).toSeq.sorted
    assert(na === nb)
    // monotone within group
    assert(na === na.sorted)
  }

  test("referentialAudit: null keys excluded from orphan base, orphan and " +
      "unreferenced-parent counts exact, all-null child reads the sentinel, " +
      "guards fire") {
    import spark.implicits._
    // child keys: 1 (matched, twice), 9 (orphan, twice), null; parents
    // {1, 2, 2}: parent 2 never referenced, duplicate parent keys collapse
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(9L), None).toDF("ck")
    val parent = Seq(Some(1L), Some(2L), Some(2L), None).toDF("pk")
    val r = DataPrep.referentialAudit(Seq(("rel", child, "ck", parent, "pk")))
      .collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)) ===
      (("rel", 5L, 1L, 2L, 2L, 1L, 1000000L * 2 / 4, 2L, 1L)))
    // all-NULL child: orphan base empty -> -1 sentinel
    val nulls = Seq[Option[Long]](None, None).toDF("ck")
    val r2 = DataPrep.referentialAudit(Seq(("n", nulls, "ck", parent, "pk")))
      .collect().head
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(6)) === ((2L, 2L, -1L)))
    intercept[IllegalArgumentException] { DataPrep.referentialAudit(Seq.empty) }
    intercept[IllegalArgumentException] {
      DataPrep.referentialAudit(Seq(
        ("dup", child, "ck", parent, "pk"), ("dup", child, "ck", parent, "pk")))
    }
  }

  test("constraintAudit: one scan evaluates all rules, NULL predicate is a " +
      "violation, first_bad_key is the smallest violating key, guards fire") {
    import spark.implicits._
    val df = Seq(
      (5L, Some(10.0)), (3L, Some(200.0)), (7L, None), (9L, Some(50.0)))
      .toDF("k", "v")
    val got = DataPrep.constraintAudit(df, "k", Seq(
        ("v_cap", "v <= 100"),        // row 3 breaks it; row 7 NULL breaks it
        ("v_present", "v IS NOT NULL"), // row 7
        ("k_positive", "k > 0")))       // clean
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      "v_cap" -> ((4L, 2L, 500000L, 3L)),
      "v_present" -> ((4L, 1L, 250000L, 7L)),
      "k_positive" -> ((4L, 0L, 0L, -1L))))
    // empty frame: zero rows, -1 ppm sentinel
    val empty = DataPrep.constraintAudit(
        df.filter(col("k") < 0), "k", Seq(("any", "v > 0")))
      .collect().head
    assert((empty.getLong(1), empty.getLong(3), empty.getLong(4)) ===
      ((0L, -1L, -1L)))
    intercept[IllegalArgumentException] {
      DataPrep.constraintAudit(df, "k", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      DataPrep.constraintAudit(df, "k", Seq(("a", "v > 0"), ("a", "v < 9")))
    }
    intercept[IllegalArgumentException] {
      DataPrep.constraintAudit(df, "k", Seq(("bad name", "v > 0")))
    }
  }

  test("benfordAudit: leading digits from the integer micro rendering, " +
      "non-positive values excluded, zero-count digits emitted, TV matches " +
      "the hand fold, empty input reads sentinels") {
    import spark.implicits._
    // 1.0 -> 1000000 (digit 1); 25.0 (digit 2); 900.0 (digit 9);
    // 0.0000001 -> micro 0 excluded; -5.0 excluded
    val df = Seq(1.0, 25.0, 900.0, 0.0000001, -5.0).toDF("v")
    val rows = DataPrep.benfordAudit(df, "v").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(rows.keySet === (1 to 9).toSet)
    val obs = (1 to 9).map(d =>
      d -> (if (Set(1, 2, 9)(d)) 1000000L / 3 else 0L)).toMap
    val tv = (1 to 9).map(d =>
      math.abs(obs(d) - DataPrep.benfordPpm(d))).sum / 2
    (1 to 9).foreach { d =>
      val (cnt, nUsed, oPpm, bPpm, tvPpm) = rows(d)
      assert(nUsed === 3L && oPpm === obs(d) && bPpm === DataPrep.benfordPpm(d)
        && tvPpm === tv)
      assert(cnt === (if (Set(1, 2, 9)(d)) 1L else 0L))
    }
    // Benford expectations sum to ~1e6 (rounding residue at most a few ppm)
    assert(math.abs((1 to 9).map(DataPrep.benfordPpm).sum - 1000000L) <= 3L)
    val empty = DataPrep.benfordAudit(df.filter(col("v") < -100), "v")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(5)))
    assert(empty.length === 9 && empty.forall(_ === ((0L, -1L, -1L))))
  }

  test("weightedQuantiles: weights move the median, unit weights reduce to " +
      "percentile_disc, non-positive weights dropped, guards fire") {
    import spark.implicits._
    // values 1..4; weight 7 on value 4 dominates: W=10, p50 threshold
    // 10000*cw >= 5000*10 -> cw >= 5 -> first value with cum weight >= 5
    // is 4 (cum: 1,2,3,10)
    val df = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 7.0),
        (9.0, 0.0), (8.0, -2.0)) // zero/negative weights: dropped
      .toDF("v", "w").withColumn("g", lit("G"))
    val got = DataPrep.weightedQuantiles(df, "g", "v", "w",
        qBps = Seq(2500, 5000, 10000))
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      2500 -> ((3000000L, 10000000L)),  // cw >= 2.5 -> value 3
      5000 -> ((4000000L, 10000000L)),
      10000 -> ((4000000L, 10000000L))))
    // unit weights == discrete percentiles: median of {10,20,30,40} lower
    // convention = 20
    val unit = Seq(10.0, 20.0, 30.0, 40.0).toDF("v")
      .withColumn("g", lit("G")).withColumn("w", lit(1.0))
    val med = DataPrep.weightedQuantiles(unit, "g", "v", "w", Seq(5000))
      .collect().head.getLong(2)
    assert(med === 20000000L)
    intercept[IllegalArgumentException] {
      DataPrep.weightedQuantiles(df, "g", "v", "w", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      DataPrep.weightedQuantiles(df, "g", "v", "w", Seq(0))
    }
    intercept[IllegalArgumentException] {
      DataPrep.weightedQuantiles(df, "g", "v", "w", Seq(5000, 5000))
    }
  }

  test("lorenzCurve: hand quartiles, equal values trace the diagonal, " +
      "all-zero group reads the sentinel, negatives drop, top decile " +
      "pins 1e6, determinism, guards") {
    import spark.implicits._
    val df = Seq(
      ("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 6.0),
      ("e", 5.0), ("e", 5.0), ("e", 5.0),
      ("z", 0.0), ("z", 0.0),
      ("n", -5.0), ("n", 1.0), ("n", 3.0))
      .toDF("g", "v")
    def read(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val got = read(DataPrep.lorenzCurve(df, "g", "v", buckets = 4))
    // a: values 1,1,2,6 (total 10): bottom 1/2/3/4 rows hold 1/2/4/10
    assert(got(("a", 1)) === ((1L, 4L, 100000L)))
    assert(got(("a", 2)) === ((2L, 4L, 200000L)))
    assert(got(("a", 3)) === ((3L, 4L, 400000L)))
    assert(got(("a", 4)) === ((4L, 4L, 1000000L)))
    // e: perfect equality -> diagonal (k/n, truncated ppm), ties need
    // no row-level ordering
    assert(got(("e", 1)) === ((0L, 3L, 0L)))
    assert(got(("e", 2)) === ((1L, 3L, 333333L)))
    assert(got(("e", 3)) === ((2L, 3L, 666666L)))
    assert(got(("e", 4)) === ((3L, 3L, 1000000L)))
    // z: all-zero total -> sentinel; n: the -5 row is dropped (n_rows 2)
    assert(got(("z", 4)) === ((2L, 2L, -1L)))
    assert(got(("n", 2)) === ((1L, 2L, 250000L)))
    assert(got(("n", 4)) === ((2L, 2L, 1000000L)))
    val again = read(DataPrep.lorenzCurve(
      df.repartition(5), "g", "v", buckets = 4))
    assert(again === got)
    intercept[IllegalArgumentException] {
      DataPrep.lorenzCurve(df, "g", "v", buckets = 1)
    }
  }

  test("hillTailIndex: hand ln terms at k=2, threshold ties contribute " +
      "zero, short and all-equal groups hit sentinels, non-positives " +
      "drop, determinism, guards") {
    import spark.implicits._
    val df = Seq(
      ("p", 8.0), ("p", 4.0), ("p", 2.0), ("p", 1.0), ("p", 1.0),
      ("p", 0.0), ("p", -3.0),                   // dropped
      ("t", 5.0), ("t", 3.0), ("t", 3.0), ("t", 3.0), ("t", 1.0),
      ("s", 9.0), ("s", 2.0),                    // only 2 positives
      ("e", 4.0), ("e", 4.0), ("e", 4.0), ("e", 4.0))
      .toDF("g", "v")
    def read(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    def ln(num: Long, den: Long): Long =
      math.round(1e6 * math.log(num.toDouble / den))
    val got = read(DataPrep.hillTailIndex(df, "g", "v", k = 2))
    val sumP = ln(8000000L, 2000000L) + ln(4000000L, 2000000L)
    val alphaP = (BigInt(1000000L) * 2 * 1000000L / sumP).toLong
    assert(got("p") === ((5L, 2, 2000000L, sumP, alphaP)))
    val sumT = ln(5000000L, 3000000L)
    val alphaT = (BigInt(1000000L) * 2 * 1000000L / sumT).toLong
    assert(got("t") === ((5L, 2, 3000000L, sumT, alphaT)))
    assert(got("s") === ((2L, 2, -1L, 0L, -1L)))
    assert(got("e") === ((4L, 2, 4000000L, 0L, -1L)))
    val again = read(DataPrep.hillTailIndex(
      df.repartition(5), "g", "v", k = 2))
    assert(again === got)
    intercept[IllegalArgumentException] {
      DataPrep.hillTailIndex(df, "g", "v", k = 1)
    }
  }

  test("trimmedMeanBps: asymmetric hand cut, ties interchangeable, " +
      "negatives kept, empty-keep sentinel, determinism, guards") {
    import spark.implicits._
    val a = (0 until 10).map(i => ("a", i.toDouble))
    val t = Seq.fill(4)(("t", 1.0))
    val n = Seq(("n", -10.0), ("n", -10.0), ("n", 10.0), ("n", 10.0))
    val s = Seq(("s", 42.0))
    val df = (a ++ t ++ n ++ s).toDF("g", "v")
    def read(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // a: values 0..9, cut 20/90% -> keep ranks 3..9 = values 2..8
    val g1 = read(DataPrep.trimmedMeanBps(df, "g", "v", 2000, 9000))
    assert(g1("a") === ((10L, 2L, 9L, 5000000L)))
    assert(g1("t") === ((4L, 0L, 3L, 1000000L)))
    assert(g1("s") === ((1L, 0L, 0L, -1L)))       // 90% of 1 row = 0 kept
    // n: keep bottom half only -> mean of the two -10s
    val g2 = read(DataPrep.trimmedMeanBps(df, "g", "v", 0, 5000))
    assert(g2("n") === ((4L, 0L, 2L, -10000000L)))
    val again = read(DataPrep.trimmedMeanBps(
      df.repartition(5), "g", "v", 2000, 9000))
    assert(again === g1)
    intercept[IllegalArgumentException] {
      DataPrep.trimmedMeanBps(df, "g", "v", 5000, 5000)
    }
  }

  test("hhiConcentration: monopoly reads 1e6, even split reads 1e6/n, " +
      "member rows pre-aggregate, zero-mass sentinel, negative guard, " +
      "determinism") {
    import spark.implicits._
    val df = Seq(
      ("mono", 1L, 10.0),
      ("even", 1L, 5.0), ("even", 2L, 5.0), ("even", 3L, 5.0), ("even", 4L, 5.0),
      // split rows for one member must merge before squaring:
      // member 1 holds 6 (2 rows), member 2 holds 2 -> hhi = (36+4)/64
      ("agg", 1L, 4.0), ("agg", 1L, 2.0), ("agg", 2L, 2.0),
      ("zero", 1L, 0.0)).toDF("g", "m", "w")
    def read(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = read(DataPrep.hhiConcentration(df, "g", "m", "w"))
    assert(got("mono") === ((1L, 1000000L)))
    assert(got("even") === ((4L, 250000L)))
    assert(got("agg") === ((2L, 625000L)))
    assert(got("zero") === ((1L, -1L)))
    assert(read(DataPrep.hhiConcentration(df.repartition(5), "g", "m", "w"))
      === got)
    val e = intercept[Exception] {
      DataPrep.hhiConcentration(
        Seq(("g", 1L, -1.0)).toDF("g", "m", "w"), "g", "m", "w").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("negative weight")))
  }
}

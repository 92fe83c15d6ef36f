package graft

import org.apache.spark.sql.functions._

import graft.operators.ChangeCapture

/** Pins the batch-MERGE semantics: latest-per-key compaction with a
  * deterministic tie-break, I/U/K op classification, the null-change
  * coalesce rule, and column routing for snapshot-only / change-only /
  * shared columns.
  */
class ChangeCaptureSpec extends SparkSpec {

  import spark.implicits._

  test("latestByKey keeps the greatest (ts, tie) row per key") {
    val log = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 1L, "b"), (1L, 20L, 2L, "c"), // tie on ts=20 -> tie 2 wins
      (2L, 5L, 9L, "d")
    ).toDF("k", "ts", "seq", "v")
    val got = ChangeCapture.latestByKey(log, "k", "ts", "seq")
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "c", 2L -> "d"))
  }

  test("latestByKey is stable under repartitioning") {
    val log = Seq.tabulate(200)(i => (i.toLong % 10, i.toLong, i.toLong, s"v$i"))
      .toDF("k", "ts", "seq", "v")
    val a = ChangeCapture.latestByKey(log, "k", "ts", "seq")
    val b = ChangeCapture.latestByKey(log.repartition(7), "k", "ts", "seq")
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("applyChanges classifies I/U/K and routes columns") {
    val snap = Seq((1L, 100.0, "seg-a"), (2L, 200.0, "seg-b"), (3L, 300.0, "seg-c"))
      .toDF("k", "bal", "seg")
    val chg = Seq((2L, 250.0, "note-2"), (9L, 900.0, "note-9"))
      .toDF("k", "bal", "note")
    val got = ChangeCapture.applyChanges(snap, chg, "k")
      .orderBy("k").collect()
    assert(got.map(_.getAs[String]("op")).toSeq === Seq("K", "U", "K", "I"))
    // shared column: change wins where present, snapshot value elsewhere
    assert(got.map(_.getAs[Double]("bal")).toSeq === Seq(100.0, 250.0, 300.0, 900.0))
    // snapshot-only column: null on inserts
    assert(got.map(_.getAs[String]("seg")).toSeq === Seq("seg-a", "seg-b", "seg-c", null))
    // change-only column: null on untouched rows
    assert(got.map(_.getAs[String]("note")).toSeq === Seq(null, "note-2", null, "note-9"))
  }

  test("applyChanges: a NULL change value does not clobber the snapshot") {
    val snap = Seq((1L, "keep-me")).toDF("k", "v")
    val chg = Seq((1L, Option.empty[String])).toDF("k", "v")
    val got = ChangeCapture.applyChanges(snap, chg, "k").collect().head
    assert(got.getAs[String]("v") === "keep-me" && got.getAs[String]("op") === "U")
  }

  test("applyChanges: a null DATA value in the snapshot still reads as existing (op=K, not I)") {
    val snap = Seq((1L, Option.empty[String])).toDF("k", "v")
    val chg = Seq((2L, "x")).toDF("k", "v")
    val got = ChangeCapture.applyChanges(snap, chg, "k")
      .orderBy("k").collect()
    assert(got.map(_.getAs[String]("op")).toSeq === Seq("K", "I"))
  }

  test("scd2Merge: closes the current version, opens the new one, passes closed history through") {
    val history = Seq(
      (1L, 100.0, 0L, Some(500L)),   // closed old version of key 1
      (1L, 110.0, 500L, None),       // current version of key 1
      (2L, 200.0, 0L, None)          // current version of key 2, untouched
    ).toDF("k", "bal", "valid_from_us", "valid_to_us")
    val changes = Seq((1L, 120.0, 900L), (9L, 900.0, 950L))
      .toDF("k", "bal", "ts_us")
    val got = ChangeCapture.scd2Merge(history, changes, "k", "ts_us")
      .orderBy(col("k"), col("valid_from_us"))
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Double]("bal"),
        r.getAs[Long]("valid_from_us"),
        if (r.isNullAt(r.fieldIndex("valid_to_us"))) -1L else r.getAs[Long]("valid_to_us")))
    assert(got.toSeq === Seq(
      (1L, 100.0, 0L, 500L),  // untouched closed history
      (1L, 110.0, 500L, 900L), // was current, now closed at the change time
      (1L, 120.0, 900L, -1L),  // the new current version
      (2L, 200.0, 0L, -1L),    // untouched current
      (9L, 900.0, 950L, -1L))) // brand-new key opens its first version
  }

  test("scd2Merge: exactly one current version per key after the merge") {
    val history = Tables.table(spark, sfDir, "customer")
      .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"),
        lit(0L).as("valid_from_us"), lit(null).cast("long").as("valid_to_us"))
    val changes = ChangeCapture.latestByKey(
        Tables.table(spark, sfDir, "orders"), "o_custkey", "o_orderdate", "o_orderkey")
      .select(col("o_custkey").as("k"), col("o_totalprice").as("bal"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"))
    val merged = ChangeCapture.scd2Merge(history, changes, "k", "ts_us").cache()
    val dup = merged.filter(col("valid_to_us").isNull)
      .groupBy("k").count().filter(col("count") =!= 1).count()
    assert(dup === 0L, "every key must have exactly one open version")
    // interval chain: each key's versions tile without overlap
    val bad = merged.withColumn("vt", coalesce(col("valid_to_us"), lit(Long.MaxValue)))
      .groupBy("k")
      .agg(sum(when(col("vt") < col("valid_from_us"), 1).otherwise(0)).as("inverted"))
      .filter(col("inverted") > 0).count()
    assert(bad === 0L)
    merged.unpersist()
  }

  test("scd2Merge folds: three sequential change batches build a tiling version chain") {
    var dim = Seq((1L, 100.0, 0L, Option.empty[Long]))
      .toDF("k", "bal", "valid_from_us", "valid_to_us")
    for ((ts, bal) <- Seq((100L, 110.0), (200L, 120.0), (300L, 130.0)))
      dim = ChangeCapture.scd2Merge(
        dim, Seq((1L, bal, ts)).toDF("k", "bal", "ts_us"), "k", "ts_us")
    val got = dim.orderBy(col("valid_from_us")).collect().map(r =>
      (r.getAs[Double]("bal"), r.getAs[Long]("valid_from_us"),
        if (r.isNullAt(r.fieldIndex("valid_to_us"))) -1L else r.getAs[Long]("valid_to_us")))
    assert(got.toSeq === Seq(
      (100.0, 0L, 100L), (110.0, 100L, 200L), (120.0, 200L, 300L), (130.0, 300L, -1L)),
      "each merge closes exactly the open version; intervals tile with no gaps")
  }

  test("merge is idempotent: applying the same compacted change set twice is a no-op") {
    val snap = Seq((1L, 100.0), (2L, 200.0)).toDF("k", "bal")
    val chg = Seq((2L, 250.0), (3L, 300.0)).toDF("k", "bal")
    val once = ChangeCapture.applyChanges(snap, chg, "k").drop("op")
    val twice = ChangeCapture.applyChanges(once, chg, "k").drop("op")
    assert(once.except(twice).count() === 0 && twice.except(once).count() === 0)
  }

  test("scd2Merge skipReapplied: double-applying the same change batch is a no-op") {
    val history = Seq((1L, 100.0, 0L, Option.empty[Long]))
      .toDF("k", "bal", "valid_from_us", "valid_to_us")
    val batch = Seq((1L, 110.0, 100L), (2L, 200.0, 100L)).toDF("k", "bal", "ts_us")
    val once = ChangeCapture.scd2Merge(history, batch, "k", "ts_us",
      skipReapplied = true).cache()
    val twice = ChangeCapture.scd2Merge(once, batch, "k", "ts_us",
      skipReapplied = true)
    assert(once.count() === 3L, "closed v1 of key 1, open v2 of key 1, open v1 of key 2")
    assert(once.except(twice).count() === 0 && twice.except(once).count() === 0,
      "re-merging the identical batch must not cut zero-length versions")
    // the unguarded merge, by contrast, cuts again on re-application
    val unguarded = ChangeCapture.scd2Merge(once, batch, "k", "ts_us")
    assert(unguarded.count() === 5L,
      "without the guard each change closes the open version a second time")
    once.unpersist()
  }

  test("scd2Merge skipReapplied also absorbs a stale change older than the open version") {
    val history = Seq((1L, 110.0, 100L, Option.empty[Long]))
      .toDF("k", "bal", "valid_from_us", "valid_to_us")
    val stale = Seq((1L, 105.0, 50L)).toDF("k", "bal", "ts_us")
    val got = ChangeCapture.scd2Merge(history, stale, "k", "ts_us",
      skipReapplied = true)
    assert(got.collect().map(r => (r.getAs[Long]("k"), r.getAs[Double]("bal"))).toSeq
      === Seq((1L, 110.0)),
      "a change at ts 50 against an open version from ts 100 is superseded, not applied")
  }

  test("reserved column names are rejected up front") {
    val snap = Seq((1L, 1.0)).toDF("k", "op")
    val chg = Seq((1L, 2.0)).toDF("k", "v")
    val e1 = intercept[IllegalArgumentException] {
      ChangeCapture.applyChanges(snap, chg, "k")
    }
    assert(e1.getMessage.contains("reserved column name"))
    intercept[IllegalArgumentException] {
      ChangeCapture.applyChanges(chg, Seq((1L, 2.0)).toDF("k", "__c_v"), "k")
    }
    intercept[IllegalArgumentException] {
      ChangeCapture.scd2Merge(
        Seq((1L, 1.0, 0L, Option.empty[Long], 9L))
          .toDF("k", "bal", "valid_from_us", "valid_to_us", "__s_mark"),
        Seq((1L, 2.0, 10L)).toDF("k", "bal", "ts_us"), "k", "ts_us")
    }
    // re-merging applyChanges output without dropping `op` — the exact
    // silent-collision case — now fails loudly
    val merged = ChangeCapture.applyChanges(
      Seq((1L, 1.0)).toDF("k", "v"), chg, "k")
    intercept[IllegalArgumentException] {
      ChangeCapture.applyChanges(merged, chg, "k")
    }
  }

  // ----------------------------------------------------------- pointInTimeJoin

  test("pointInTimeJoin: inclusive valid_from, no future leakage, null before first version") {
    val hist = Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 5L, 777L))
      .toDF("k", "vf", "bal")
    val probe = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 15L, "c"),
      (1L, 20L, "d"), (1L, 25L, "e"), (2L, 6L, "f"))
      .toDF("k", "ts", "tag")
    val got = ChangeCapture.pointInTimeJoin(probe, hist, "k", "ts", "vf", Seq("bal"))
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got === Map(
      "a" -> -1L,  // before the first version: NULL attr, never a leak
      "b" -> 100L, // valid_from == probe ts is INCLUSIVE
      "c" -> 100L, "d" -> 200L, "e" -> 200L,
      "f" -> 777L)) // keys never cross
  }

  test("pointInTimeJoin: probe columns pass through; attr-name collisions fail loudly") {
    val hist = Seq((1L, 10L, 9L)).toDF("k", "vf", "bal")
    val probe = Seq((1L, 12L, 42L, "x")).toDF("k", "ts", "payload", "tag")
    val row = ChangeCapture.pointInTimeJoin(probe, hist, "k", "ts", "vf", Seq("bal"))
      .collect().head
    assert(row.getAs[Long]("payload") === 42L && row.getAs[String]("tag") === "x"
      && row.getAs[Long]("bal") === 9L)
    intercept[IllegalArgumentException] {
      ChangeCapture.pointInTimeJoin(
        probe.withColumnRenamed("payload", "bal"), hist, "k", "ts", "vf", Seq("bal"))
    }
  }

  test("applyCdcToAggregate: random CDC replay equals the direct aggregate, any split") {
    // simulate a mutable table via a CDC log with before/after images,
    // fold the aggregate batch-by-batch, compare against aggregating the
    // surviving rows directly — the incremental-view-maintenance contract
    val rnd = new scala.util.Random(7)
    var live = Map.empty[Long, (String, Double)] // id -> (grp, value)
    val ops = scala.collection.mutable.ListBuffer.empty[(String, String, Double, Double)]
    var nextId = 0L
    for (_ <- 1 to 400) {
      val roll = rnd.nextInt(10)
      if (roll < 5 || live.isEmpty) { // insert
        val g = s"g${rnd.nextInt(4)}"
        val v = rnd.nextInt(1000) / 100.0
        live += (nextId -> (g, v)); nextId += 1
        ops += (("I", g, 0.0, v))
      } else if (roll < 8) { // update (value only, group kept)
        val id = live.keys.toSeq(rnd.nextInt(live.size))
        val (g, old) = live(id)
        val v = rnd.nextInt(1000) / 100.0
        live += (id -> (g, v))
        ops += (("U", g, old, v))
      } else { // delete
        val id = live.keys.toSeq(rnd.nextInt(live.size))
        val (g, old) = live(id)
        live -= id
        ops += (("D", g, old, 0.0))
      }
    }
    val batches = ops.toSeq.grouped(73).toSeq // uneven batch split
    var agg = ChangeCapture.aggregateOf(
      Seq.empty[(String, Double)].toDF("g", "v"), "g", "v")
    batches.foreach { b =>
      agg = ChangeCapture.applyCdcToAggregate(
        agg, b.toDF("op", "g", "before", "after"), "g", "op", "before", "after")
        .localCheckpoint(true) // fold across batches without deepening the plan
    }
    val got = agg.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = live.values.groupBy(_._1).map { case (g, vs) =>
      g -> ((vs.size.toLong, vs.map(v => math.round(v._2 * 1e6)).sum))
    }
    assert(got === want, "maintained aggregate must equal the direct aggregate")
  }

  test("applyCdcToAggregate: groups emptied by deletes drop out; unknown op fails") {
    val agg0 = ChangeCapture.aggregateOf(
      Seq(("a", 2.0), ("b", 3.0)).toDF("g", "v"), "g", "v")
    val afterDel = ChangeCapture.applyCdcToAggregate(agg0,
      Seq(("D", "a", 2.0, 0.0)).toDF("op", "g", "before", "after"),
      "g", "op", "before", "after")
    val got = afterDel.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("b" -> 1L), "group a must vanish at n=0")
    val ex = intercept[Exception] {
      ChangeCapture.applyCdcToAggregate(agg0,
        Seq(("X", "a", 0.0, 0.0)).toDF("op", "g", "before", "after"),
        "g", "op", "before", "after").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("unknown op")), msgs(ex).mkString("; "))
  }

  test("bitemporalAsOf: knowledge lag hides a valid version until tx time passes") {
    // version valid from t=10, recorded at t=15: probes at valid=12
    // see it only if their tx >= 15
    val hist = Seq((1L, 10L, Option.empty[Long], 15L, Option.empty[Long], 100L))
      .toDF("k", "vf", "vt", "tf", "tt", "bal")
    val probe = Seq(
      (1L, 1L, 12L, 12L), // valid hit, not yet known -> miss
      (2L, 1L, 12L, 20L), // backfill at tx=20 about valid=12 -> hit
      (3L, 1L, 8L, 99L)) // before validity -> miss regardless of tx
      .toDF("pid", "k", "vts", "tts")
    val got = ChangeCapture.bitemporalAsOf(probe, hist, "k", "vts", "tts",
        "vf", "vt", "tf", "tt", Seq("bal"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(got === Map(1L -> -1L, 2L -> 100L, 3L -> -1L))
  }

  test("bitemporalAsOf: a closed tx interval (superseded knowledge) stops serving") {
    // the correction story: bal=100 known during tx [15, 30), corrected
    // to 120 from tx=30 — same valid interval
    val hist = Seq(
      (1L, 10L, Option.empty[Long], 15L, Some(30L), 100L),
      (1L, 10L, Option.empty[Long], 30L, Option.empty[Long], 120L))
      .toDF("k", "vf", "vt", "tf", "tt", "bal")
    val probe = Seq((1L, 1L, 12L, 20L), (2L, 1L, 12L, 35L))
      .toDF("pid", "k", "vts", "tts")
    val got = ChangeCapture.bitemporalAsOf(probe, hist, "k", "vts", "tts",
        "vf", "vt", "tf", "tt", Seq("bal"))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got === Map(1L -> 100L, 2L -> 120L),
      "reproducing an old training run must read the OLD knowledge")
  }

  test("pointInTimeJoin matches a brute-force reference on a random corpus") {
    val rnd = new scala.util.Random(42)
    val hist = (1 to 60).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(40).toLong, i.toLong))
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique (k, vf)
    val probe = (1 to 200).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(50).toLong))
    val got = ChangeCapture.pointInTimeJoin(
        probe.toDF("id", "k", "ts"), hist.toDF("k", "vf", "bal"),
        "k", "ts", "vf", Seq("bal"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    probe.foreach { case (id, k, ts) =>
      val want = hist.filter(h => h._1 == k && h._2 <= ts)
        .sortBy(_._2).lastOption.map(_._3).getOrElse(-1L)
      assert(got(id) === want, s"probe $id (k=$k, ts=$ts)")
    }
  }

  test("snapshotDiff: IS DISTINCT FROM null semantics, added/removed/common " +
      "exact, no-common sentinel, guards fire") {
    val a = Seq(
      (1L, Some("x"), Some(10.0)), (2L, None, Some(20.0)),
      (3L, Some("z"), None), (4L, Some("w"), Some(40.0)),
      (6L, None, None))
      .toDF("k", "c1", "c2")
    val b = Seq(
      (1L, Some("x"), Some(10.0)), (2L, Some("y"), Some(20.0)),
      (3L, Some("z"), Some(5.0)), (5L, Some("new"), Some(1.0)),
      (6L, None, None))
      .toDF("k", "c1", "c2")
    val got = ChangeCapture.snapshotDiff(a, b, "k", Seq("c1", "c2"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // common = {1, 2, 3, 6}; c1 changes on key 2 (null -> y),
    // c2 on key 3 (null -> 5.0); key 6's null == null is NOT a change
    assert(got === Map(
      "c1" -> ((5L, 5L, 1L, 1L, 4L, 1L, 250000L)),
      "c2" -> ((5L, 5L, 1L, 1L, 4L, 1L, 250000L))))
    // disjoint snapshots: zero common -> ppm sentinel
    val disjoint = ChangeCapture.snapshotDiff(
        a.filter(col("k") <= 2), b.filter(col("k") >= 5), "k", Seq("c1"))
      .collect().head
    assert((disjoint.getLong(5), disjoint.getLong(7)) === ((0L, -1L)))
    intercept[IllegalArgumentException] {
      ChangeCapture.snapshotDiff(a, b, "k", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      ChangeCapture.snapshotDiff(a, b, "k", Seq("c1", "c1"))
    }
    intercept[IllegalArgumentException] {
      ChangeCapture.snapshotDiff(a, b, "k", Seq("bad col"))
    }
  }
}

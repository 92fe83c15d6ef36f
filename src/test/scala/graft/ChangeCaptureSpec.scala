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

  test("merge is idempotent: applying the same compacted change set twice is a no-op") {
    val snap = Seq((1L, 100.0), (2L, 200.0)).toDF("k", "bal")
    val chg = Seq((2L, 250.0), (3L, 300.0)).toDF("k", "bal")
    val once = ChangeCapture.applyChanges(snap, chg, "k").drop("op")
    val twice = ChangeCapture.applyChanges(once, chg, "k").drop("op")
    assert(once.except(twice).count() === 0 && twice.except(once).count() === 0)
  }
}

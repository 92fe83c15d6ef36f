package graft

import org.apache.spark.sql.functions._

import graft.operators.Temporal

class TemporalSpec extends SparkSpec {

  import spark.implicits._

  private def run(left: Seq[(Long, Long, Long, Long)],
      right: Seq[(Long, Long, Long, Long)], bucket: Long) = {
    val l = left.toDF("k", "ia", "sa", "ea")
    val r = right.toDF("k", "ib", "sb", "eb")
    Temporal.overlapJoin(l, r, "k", "ia", "sa", "ea", "ib", "sb", "eb", bucket)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)) -> x.getLong(3)).toMap
  }

  test("overlapJoin: hand cases — touch, contain, disjoint, key isolation") {
    val got = run(
      left = Seq((1L, 1L, 10L, 20L), (1L, 2L, 30L, 40L), (2L, 3L, 10L, 20L)),
      right = Seq(
        (1L, 7L, 15L, 35L), // overlaps interval 1 by 5 and interval 2 by 5
        (1L, 8L, 20L, 30L), // TOUCHES both (half-open: end==start is no overlap)
        (2L, 9L, 0L, 100L), // contains interval 3 entirely
        (3L, 5L, 10L, 20L)), // right key with no left rows
      bucket = 7L) // deliberately unaligned bucket width
    assert(got === Map(
      (1L, 1L, 7L) -> 5L, (1L, 2L, 7L) -> 5L, (2L, 3L, 9L) -> 10L))
  }

  test("overlapJoin: a pair sharing many buckets is emitted exactly once") {
    // both intervals span 10 buckets; the canonical-bucket rule must
    // yield ONE row, not ten
    val got = run(
      left = Seq((1L, 1L, 0L, 100L)),
      right = Seq((1L, 2L, 5L, 95L)),
      bucket = 10L)
    assert(got === Map((1L, 1L, 2L) -> 90L))
  }

  test("overlapJoin equals the theta join on the corpus (sessions x purchase days)") {
    val dayUs = 86400000000L
    val ev = Tables.events(spark, sfDir).withColumn("tsu", unix_micros(col("ts")))
    val sess = graft.operators.EventAnalytics.sessionize(
        ev, "user_id", "tsu", "event_id", gapMicros = 6L * 3600L * 1000000L)
      .groupBy(col("user"), col("session_idx"))
      .agg(min(col("tsu")).as("sa"), (max(col("tsu")) + 1).as("ea"))
    val pdays = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("user"), expr("tsu DIV 86400000000").as("day"))
      .distinct()
      .withColumn("sb", col("day") * dayUs)
      .withColumn("eb", (col("day") + 1) * dayUs)
    val blocked = Temporal.overlapJoin(sess, pdays, "user",
        "session_idx", "sa", "ea", "day", "sb", "eb", bucketMicros = dayUs / 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    val theta = sess.join(pdays, Seq("user"))
      .filter(col("sa") < col("eb") && col("sb") < col("ea"))
      .select(col("user"), col("session_idx"), col("day"),
        (least(col("ea"), col("eb")) - greatest(col("sa"), col("sb"))).as("o"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(blocked.nonEmpty && blocked === theta,
      "bucket blocking must reproduce the theta join exactly")
  }

  test("overlapJoin matches a brute-force theta reference on random intervals") {
    // spans from 1 up to ~50 buckets, negative starts (trunc-DIV bucketing
    // is monotonic, so the canonical-bucket emit must still be unique),
    // bucket widths from degenerate (1) to coarser-than-most-intervals
    val rnd = new scala.util.Random(43)
    for (bucket <- Seq(1L, 7L, 64L, 1000L)) {
      def side(): Seq[(Long, Long, Long, Long)] = (0 until 120).map { i =>
        val k = rnd.nextInt(5).toLong
        val s = rnd.nextLong() % 2000L // negative and positive starts
        val span = 1L + rnd.nextInt(3000)
        (k, i.toLong, s, s + span)
      }
      val l = side()
      val r = side()
      val got = run(l, r, bucket)
      val want = (for {
        (k, ia, sa, ea) <- l
        (k2, ib, sb, eb) <- r
        if k == k2 && sa < eb && sb < ea
      } yield (k, ia, ib) -> (math.min(ea, eb) - math.max(sa, sb))).toMap
      assert(got === want, s"bucket=$bucket: blocked join must equal theta join")
    }
  }

  test("overlapJoin rejects empty intervals loudly") {
    val ex = intercept[Exception] {
      run(left = Seq((1L, 1L, 10L, 10L)), right = Seq((1L, 2L, 0L, 100L)), bucket = 10L)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("empty interval")), msgs(ex).mkString("; "))
  }

  test("mergeIslands: overlap and closed-touch merge, a gap splits, " +
      "duplicates fold in, per-key independence, determinism, empty guard") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // key 1: [0,10) + [5,20) overlap; [20,30) touches (start == prev end)
    //        -> one island [0,30) of 3; [40,50) after a gap -> second island
    // key 2: [0,5) alone; a duplicate [0,5) folds into the same island
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L), (1L, 20L, 30L), (1L, 40L, 50L),
      (2L, 0L, 5L), (2L, 0L, 5L)).toDF("k", "s", "e")
    def read(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val got = read(Temporal.mergeIslands(iv, "k", "s", "e"))
    assert(got === Map(
      (1L, 1L) -> ((0L, 30L, 3L, 30L)),
      (1L, 2L) -> ((40L, 50L, 1L, 10L)),
      (2L, 1L) -> ((0L, 5L, 2L, 5L))))
    // an interval swallowed by a longer earlier one must not split the
    // island when a later interval overlaps only the long one
    val swallowed = Seq((3L, 0L, 100L), (3L, 10L, 20L), (3L, 90L, 120L))
      .toDF("k", "s", "e")
    assert(read(Temporal.mergeIslands(swallowed, "k", "s", "e")) ===
      Map((3L, 1L) -> ((0L, 120L, 3L, 120L))))
    assert(read(Temporal.mergeIslands(iv.repartition(5), "k", "s", "e"))
      === got)
    val ex = intercept[Exception] {
      Temporal.mergeIslands(Seq((1L, 5L, 5L)).toDF("k", "s", "e"),
        "k", "s", "e").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("empty interval")))
  }
}

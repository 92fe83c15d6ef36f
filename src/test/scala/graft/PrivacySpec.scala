package graft

import org.apache.spark.sql.functions._

import graft.operators.Privacy

/** Pins the cascading k-anonymity ladder: hand-computed level
  * assignment, the published-class ≥ k invariant on the real corpus, and
  * a brute-force reference on random data.
  */
class PrivacySpec extends SparkSpec {

  import spark.implicits._

  test("kAnonymize: hand case — pass, coarsen, suppress") {
    // level 0 on (city): NYC x3 passes k=3; LA x2 and SF x1 fail.
    // level 1 on (coast): LA+SF are both 'west' (2+1 = 3 rows) -> pass.
    // lone 'other' row fails both -> suppressed.
    val d = Seq(
      (1L, "NYC", "east"), (2L, "NYC", "east"), (3L, "NYC", "east"),
      (4L, "LA", "west"), (5L, "LA", "west"), (6L, "SF", "west"),
      (7L, "Reyk", "other"))
      .toDF("id", "city", "coast")
    val got = Privacy.kAnonymize(d, "id", Seq(Seq("city"), Seq("coast")), k = 3L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got === Map(
      1L -> ((0L, "NYC")), 2L -> ((0L, "NYC")), 3L -> ((0L, "NYC")),
      4L -> ((1L, "west")), 5L -> ((1L, "west")), 6L -> ((1L, "west")),
      7L -> ((2L, "*"))))
  }

  test("kAnonymize: every published class holds >= k rows on the corpus") {
    val k = 5L
    val out = Privacy.kAnonymize(
        Tables.events(spark, sfDir)
          .withColumn("tsu", unix_micros(col("ts")))
          .withColumn("hour", expr("(tsu DIV 3600000000) % 24"))
          .withColumn("a1", expr("user_id DIV 100"))
          .withColumn("b1", expr("hour DIV 6")),
        "event_id", Seq(Seq("user_id", "hour"), Seq("a1", "b1")), k)
      .cache()
    assert(out.count() === Tables.events(spark, sfDir).count(), "no row lost or duplicated")
    val bad = out.filter(col("level") < 2)
      .groupBy(col("level"), col("g1"), col("g2")).count()
      .filter(col("count") < k).count()
    assert(bad === 0L, "a published equivalence class smaller than k leaks identity")
  }

  test("lDiversityAudit: homogeneous class flagged even when k-large") {
    // class A: 4 rows but ONE sensitive value -> not diverse (the
    // homogeneity attack k-anonymity alone misses); class B: 3 rows,
    // 3 distinct values -> diverse
    val d = Seq(
      ("A", "flu"), ("A", "flu"), ("A", "flu"), ("A", "flu"),
      ("B", "flu"), ("B", "cold"), ("B", "none"))
      .toDF("q", "diag")
    val got = Privacy.lDiversityAudit(d, Seq("q"), "diag", l = 3L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map("A" -> ((4L, 1L, 0L)), "B" -> ((3L, 3L, 1L))))
  }

  test("kAnonymize matches a brute-force reference on random data") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(i => (i.toLong, rnd.nextInt(40).toLong))
    val d = rows.toDF("id", "q").withColumn("qc", expr("q DIV 10"))
    val got = Privacy.kAnonymize(d, "id", Seq(Seq("q"), Seq("qc")), k = 8L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val c0 = rows.groupBy(_._2).view.mapValues(_.size).toMap
    val rest = rows.filter(e => c0(e._2) < 8)
    val c1 = rest.groupBy(_._2 / 10).view.mapValues(_.size).toMap
    rows.foreach { case (id, q) =>
      val want =
        if (c0(q) >= 8) (0L, q.toString)
        else if (c1(q / 10) >= 8) (1L, (q / 10).toString)
        else (2L, "*")
      assert(got(id) === want, s"row $id (q=$q)")
    }
  }

  test("tClosenessAudit: skewed class fails where a diverse one passes, " +
      "hand-computed TV, global-mirror class reads 0") {
    // global is UNIFORM by construction (C and D mirror each other):
    // v1 = 6+5+1 = 12, v2 = 6+1+5 = 12, N = 24. Class A (6+6) mirrors
    // the global exactly -> TV = 0; classes C (5 v1, 1 v2) and D are
    // both 2-diverse yet SKEWED vs global — the leak l-diversity misses
    // and t-closeness exists to catch.
    val rows =
      (1 to 6).map(i => ("A", "v1", i.toLong)) ++
        (1 to 6).map(i => ("A", "v2", 100L + i)) ++
        (1 to 5).map(i => ("C", "v1", 300L + i)) :+ (("C", "v2", 306L)) :+
        (("D", "v1", 401L)) appendedAll (2 to 6).map(i => ("D", "v2", 400L + i))
    val df = rows.toDF("q", "v", "id")
    val got = Privacy.tClosenessAudit(df, Seq("q"), "v", tPpm = 200000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("A") === ((12L, 0L, 1L)))
    // C: (|5*24-12*6| + |1*24-12*6|) / (2*6*24) = 96/288 = 1/3 -> 333333
    assert(got("C") === ((6L, 333333L, 0L)))
    assert(got("D") === ((6L, 333333L, 0L)))
    // C passes l-diversity at l=2 but fails t-closeness — the skew leak
    val ldiv = Privacy.lDiversityAudit(df, Seq("q"), "v", l = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ldiv("C") === 1L && got("C")._3 === 0L)
  }

  test("dpNoisyCounts: noise matches the BigInt/MessageDigest replica, " +
      "shrinks with epsilon, is deterministic per (group, salt), guards fire") {
    def replicaNoise(grp: String, salt: String, epsMicro: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$grp:$salt".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val h = java.lang.Long.parseLong(hex, 16) % 1000000L
      val tm = 1000000L - math.abs(2 * h + 1 - 1000000L)
      val lnMicro = math.round(1e6 * math.log(tm.toDouble / 1e6))
      val scaled = BigInt(lnMicro) * 1000000L
      if (2 * h + 1 > 1000000L) (-(scaled / epsMicro)).toLong
      else (scaled / epsMicro).toLong
    }
    val df = Seq("a", "a", "a", "b", "c", "c").toDF("g")
    val got = Privacy.dpNoisyCounts(df, "g", 1000000L, "s1")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === Set("a", "b", "c"))
    Seq(("a", 3L), ("b", 1L), ("c", 2L)).foreach { case (g, n) =>
      val noise = replicaNoise(g, "s1", 1000000L)
      assert(got(g) === ((n, noise, n * 1000000L + noise)), s"group $g")
    }
    // bigger epsilon -> smaller-magnitude noise (integer truncation kept)
    val tight = Privacy.dpNoisyCounts(df, "g", 4000000L, "s1")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    tight.foreach { case (g, nz) =>
      assert(math.abs(nz) <= math.abs(got(g)._2), s"group $g")
    }
    // different salt -> different draw (for at least one group here)
    val other = Privacy.dpNoisyCounts(df, "g", 1000000L, "s2")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(other !== got.map { case (g, (_, nz, _)) => g -> nz })
    intercept[IllegalArgumentException] {
      Privacy.dpNoisyCounts(df, "g", 0L, "s")
    }
    intercept[IllegalArgumentException] {
      Privacy.dpNoisyCounts(df, "g", 1L, "s'quote")
    }
  }
}

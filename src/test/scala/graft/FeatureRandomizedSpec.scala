package graft

import org.apache.spark.sql.functions._

import graft.operators.FeatureEng

/** Randomized differential tests: every FeatureEng operator against an
  * independent driver-side reference on pseudo-random data (fixed seeds —
  * deterministic failures). The hand cases in FeatureEngSpec pin the
  * conventions; these sweep the input space.
  */
class FeatureRandomizedSpec extends SparkSpec {

  import spark.implicits._

  private def randRows(seed: Long, n: Int): Seq[(Long, String, Double)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, s"g${rnd.nextInt(5)}", rnd.nextInt(100000) / 100.0))
  }

  test("quantileBin matches a driver-side rank reference on random data") {
    val rows = randRows(1L, 800)
    val got = FeatureEng.quantileBin(rows.toDF("id", "g", "v"), "g", "v", "id", nBins = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val want = rows.groupBy(_._2).flatMap { case (_, grp) =>
      val n = grp.size
      grp.map(t => (t, math.round(t._3 * 1e6)))
        .sortBy { case ((id, _, _), vm) => (vm, id) }
        .zipWithIndex
        .map { case (((id, _, _), _), rn0) => id -> (7L * rn0) / n }
    }
    assert(got === want)
  }

  test("targetEncode matches a driver-side leave-one-out reference on random data") {
    val rows = randRows(2L, 600)
    val got = FeatureEng.targetEncode(rows.toDF("id", "c", "t"), "c", "t", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val byCat = rows.groupBy(_._2)
    val want = rows.map { case (id, c, t) =>
      val peers = byCat(c)
      val tm = math.round(t * 1e6)
      id -> (if (peers.size == 1) -1L
             else (peers.map(p => math.round(p._3 * 1e6)).sum - tm) / (peers.size - 1))
    }.toMap
    assert(got === want)
  }

  test("winsorize matches a driver-side percentile reference on random data") {
    val rows = randRows(3L, 700)
    val got = FeatureEng.winsorize(rows.toDF("id", "g", "v"), "g", "v", "id",
        lowBps = 1000, highBps = 9000)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val want = rows.groupBy(_._2).flatMap { case (_, grp) =>
      val sorted = grp.map(t => (t._1, math.round(t._3 * 1e6)))
        .sortBy { case (id, vm) => (vm, id) }
      val n = sorted.size.toLong
      def cut(bps: Long) = sorted((math.max(1L, (bps * n + 9999) / 10000) - 1).toInt)._2
      val (lo, hi) = (cut(1000), cut(9000))
      sorted.map { case (id, vm) => id -> math.max(lo, math.min(hi, vm)) }
    }
    assert(got === want)
  }

  test("resampleFfill matches a driver-side fold on random sparse series") {
    val rnd = new scala.util.Random(4L)
    val rows = (0 until 300).map(i =>
      (i.toLong, s"g${rnd.nextInt(3)}", rnd.nextInt(5000).toLong, rnd.nextInt(1000) / 10.0))
    val bucketW = 250L
    val got = FeatureEng.resampleFfill(rows.toDF("id", "g", "tsu", "v"),
        "g", "tsu", "v", "id", bucketMicros = bucketW)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val want = rows.groupBy(_._2).flatMap { case (g, grp) =>
      val byBucket = grp.groupBy(_._3 / bucketW).view.mapValues { obs =>
        // last observation by (tsu, id)
        math.round(obs.maxBy(t => (t._3, t._1))._4 * 1e6)
      }.toMap
      val (b0, b1) = (byBucket.keys.min, byBucket.keys.max)
      var lastV = -1L
      (b0 to b1).map { b =>
        val obs = byBucket.get(b)
        obs.foreach(v => lastV = v)
        (g, b) -> ((lastV, if (obs.isDefined) 1L else 0L))
      }
    }
    assert(got === want)
  }

  test("psi matches a driver-side reference on random ref/cur splits") {
    val rows = randRows(5L, 900)
    val (ref, cur) = rows.partition(_._1 % 3 == 0)
    val binW = 5000000L
    val got = FeatureEng.psi(ref.toDF("id", "g", "v"), cur.toDF("id", "g", "v"),
        "g", "v", binWidthMicro = binW)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def bins(rs: Seq[(Long, String, Double)]) =
      rs.groupBy(t => (t._2, math.round(t._3 * 1e6) / binW)).view.mapValues(_.size.toLong).toMap
    val (rb, cb) = (bins(ref), bins(cur))
    val want = (rb.keySet ++ cb.keySet).groupBy(_._1).map { case (g, keys) =>
      val c = keys.toSeq.map(k => (k, rb.getOrElse(k, 0L), cb.getOrElse(k, 0L)))
      val (n, m, nb) = (c.map(_._2).sum, c.map(_._3).sum, c.size.toLong)
      g -> c.map { case (_, ci, di) =>
        val p = (ci + 1).toDouble / (n + nb)
        val q = (di + 1).toDouble / (m + nb)
        math.round(1e6 * (p - q) * math.log(p / q))
      }.sum
    }
    assert(got === want)
  }

  test("crossCorrelation matches a driver-side reference on random series") {
    val rnd = new scala.util.Random(6L)
    val rows = (0 until 1000).map(i =>
      (i.toLong, if (rnd.nextBoolean()) "a" else "b", rnd.nextInt(4000).toLong))
    val bucketW = 100L
    val maxLag = 5
    val got = FeatureEng.crossCorrelation(rows.toDF("id", "et", "tsu"),
        "et", "tsu", "a", "b", bucketMicros = bucketW, maxLag = maxLag)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def counts(t: String) = rows.filter(_._2 == t)
      .groupBy(_._3 / bucketW).view.mapValues(_.size.toLong).toMap
    val (ca, cb) = (counts("a"), counts("b"))
    val want = (0L to maxLag).flatMap { lag =>
      val terms = ca.toSeq.flatMap { case (b, na) => cb.get(b + lag).map(nb => na * nb) }
      if (terms.isEmpty) None else Some(lag -> ((terms.sum, terms.size.toLong)))
    }.toMap
    assert(got === want)
  }
}

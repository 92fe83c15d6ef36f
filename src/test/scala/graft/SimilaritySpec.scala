package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb = Tables.table(spark, sfDir, "embeddings").cache()
  private lazy val queries = emb.filter(col("vec_id") < 5)

  test("brute-force top-k matches a driver-side exact computation") {
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = Similarity.bruteForceTopK(queries, emb, "embedding", "vec_id", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val want = (0L until 5L).map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .map(n => (n, cos(vecs(q), vecs(n))))
        .sortBy { case (n, c) => (-c, n) }
        .take(5).map(_._1)
    }.toMap
    assert(got === want)
  }

  test("LSH top-k achieves >= 60% recall@10 vs brute force on sf0.001") {
    val exact = Similarity.bruteForceTopK(queries, emb, "embedding", "vec_id", k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(queries, emb, "embedding", "vec_id",
        k = 10, bits = 16, probeHamming = 6)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("KMeans-IVF top-k reaches >= 40% recall@10 probing 3 of 8 clusters") {
    val exact = Similarity.bruteForceTopK(queries, emb, "embedding", "vec_id", k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfKmeansTopK(queries, emb, "embedding", "vec_id",
        k = 10, nClusters = 8, nProbe = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall")
  }

  test("integer-Lloyd KMeans-IVF: decent recall, rerun-stable, bounded buckets") {
    val exact = Similarity.bruteForceTopK(queries, emb, "embedding", "vec_id", k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = Similarity.kmeansIntTopK(queries, emb, "embedding", "vec_id",
      k = 10, nClusters = 8, nProbe = 3, iters = 3)
    val pairs = out.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pairs & exact).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall")
    // training is exact integer arithmetic: a repartitioned rerun is
    // bit-identical (the float-KMeans variant cannot promise this)
    val again = Similarity.kmeansIntTopK(queries, emb.repartition(7), "embedding",
        "vec_id", k = 10, nClusters = 8, nProbe = 3, iters = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === again)
    graft.operators.Dedup.releaseCaches()
  }

  test("kmeansIntTopK rejects vectors outside the exact-integer window") {
    import spark.implicits._
    // |v| ~ 1e5 -> micro coords ~ 1e11 -> vv far beyond 2^50: must THROW
    // at first scan, never silently return wrong neighbors
    val big = Seq((1L, Array.fill(8)(1.0e5f)), (2L, Array.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    val q = Seq((10L, Array.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.kmeansIntTopK(q, big, "embedding", "vec_id",
        k = 1, nClusters = 1, nProbe = 1, iters = 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("exact-integer f64 window")), msgs(ex).mkString("; "))
    graft.operators.Dedup.releaseCaches()
    // in-window vectors still work
    val ok = Similarity.kmeansIntTopK(q,
      Seq((1L, Array.fill(8)(0.9f)), (2L, Array.fill(8)(-0.9f))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", k = 1, nClusters = 1, nProbe = 1, iters = 1)
    assert(ok.count() === 1L)
    graft.operators.Dedup.releaseCaches()
  }

  test("IVF recall@10 curve: monotone in nProbe, concentrates >= 1.5x the scanned fraction") {
    // the scale-contract floor SCALE.md documents: on NEAR-UNIFORM random
    // embeddings (the adversarial case for a coarse quantizer — the
    // testdata corpus has no cluster structure), IVF recall must still
    // beat blind scanning by >= 1.5x at every probe depth, and more
    // probes can only help. Measured curve at sf0.1: 0.30/0.48/0.62/0.74
    // for nProbe=1..4 of 8 (~2.4x concentration); ScaleSmoke re-measures
    // both corpora per run. 50 queries (the ScaleSmoke set) — a 5-query
    // sample is too noisy for a ratio floor.
    val q50 = emb.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(q50, emb, "embedding", "vec_id", k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalls = (1 to 4).map { nProbe =>
      val got = Similarity.kmeansIntTopK(q50, emb, "embedding", "vec_id",
          k = 10, nClusters = 8, nProbe = nProbe, iters = 3)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.operators.Dedup.releaseCaches()
      (got & exact).size.toDouble / exact.size
    }
    // concentration floor only while the fraction is small — as the scan
    // approaches half the corpus, recall's 1.0 ceiling necessarily drags
    // the ratio toward 1x, so nProbe=4 gets an absolute floor instead
    recalls.take(3).zipWithIndex.foreach { case (r, i) =>
      val scannedFraction = (i + 1) / 8.0
      assert(r >= 1.5 * scannedFraction,
        s"nProbe=${i + 1}: recall $r < 1.5x scanned fraction $scannedFraction")
    }
    assert(recalls(3) >= 0.70, s"nProbe=4: recall ${recalls(3)} < 0.70")
    assert(recalls == recalls.sorted, s"recall not monotone in nProbe: $recalls")
  }

  test("IVF top-k returns k well-formed rows per query with valid ranks") {
    val bucketed = emb.withColumn("bucket", pmod(col("vec_id"), lit(8)))
    val out = Similarity.ivfTopK(queries, bucketed, "embedding", "vec_id", "bucket",
      k = 5, nProbe = 3).collect()
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      assert(rows.length === 5)
      assert(rows.map(_.getInt(1)).sorted.toSeq === (1 to 5))
    }
  }

  // ------------------------------------------------- nearestCentroidClassify

  test("pqTopK with a full-corpus rerank equals brute force exactly") {
    // the ADC pass only ORDERS candidates; with rerank >= |corpus| every
    // row survives to the exact cosine rerank, so the final top-k must be
    // bit-identical to bruteForceTopK — pins encoding, table lookups, and
    // the rerank plumbing end to end
    val n = emb.count().toInt
    val pq = Similarity.pqTopK(queries, emb, "embedding", "vec_id",
        k = 5, m = 4, nCentroids = 16, iters = 2, rerank = n)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val bf = Similarity.bruteForceTopK(queries, emb, "embedding", "vec_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(pq === bf)
  }

  test("pqTopK: decent recall at a small rerank, rerun-stable, m must divide dim") {
    val k = 10
    val bf = Similarity.bruteForceTopK(queries, emb, "embedding", "vec_id", k)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = Similarity.pqTopK(queries, emb, "embedding", "vec_id",
        k, m = 4, nCentroids = 16, iters = 3, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (pq & bf).size.toDouble / bf.size
    assert(recall >= 0.4,
      f"PQ recall@10 $recall%.2f below floor (ADC table should beat random)")
    val again = Similarity.pqTopK(queries, emb.repartition(7), "embedding",
        "vec_id", k, m = 4, nCentroids = 16, iters = 3, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(pq === again, "PQ pipeline must be partitioning-independent")
    val ex = intercept[IllegalArgumentException] {
      Similarity.pqTopK(queries, emb, "embedding", "vec_id",
        k, m = 7, nCentroids = 16, iters = 1, rerank = 100).collect()
    }
    assert(ex.getMessage.contains("divide"), ex.getMessage)
  }

  test("ivfPqTopK with all buckets probed and a full rerank equals brute force") {
    // nProbe = nClusters disables enumeration pruning, rerank >= |corpus|
    // disables ADC pruning — what remains must be the exact pipeline
    val n = emb.count().toInt
    val got = Similarity.ivfPqTopK(queries, emb, "embedding", "vec_id",
        k = 5, nClusters = 4, nProbe = 4, coarseIters = 2,
        m = 4, nCentroids = 16, pqIters = 2, rerank = n)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val bf = Similarity.bruteForceTopK(queries, emb, "embedding", "vec_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === bf)
  }

  test("ivfPqTopK is rerun-stable and bounded by nProbe buckets") {
    val a = Similarity.ivfPqTopK(queries, emb, "embedding", "vec_id",
        k = 10, nClusters = 8, nProbe = 3, coarseIters = 3,
        m = 4, nCentroids = 16, pqIters = 3, rerank = 50)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val b = Similarity.ivfPqTopK(queries, emb.repartition(9), "embedding",
        "vec_id", k = 10, nClusters = 8, nProbe = 3, coarseIters = 3,
        m = 4, nCentroids = 16, pqIters = 3, rerank = 50)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(a === b, "IVF-PQ must be partitioning-independent")
    assert(a.nonEmpty)
  }

  test("nearestCentroidClassify: separable clusters classify perfectly, dist 0 at centroid") {
    // label 0 sits at [1, 0, ...], label 1 at [0, 1, ...] exactly — the
    // per-label centroid IS the common vector, so every sq_dist is 0 and
    // every prediction is right regardless of the train split
    val v0 = Array(1f, 0f, 0f, 0f); val v1 = Array(0f, 1f, 0f, 0f)
    val e = ((0L until 8L).map(i => (i, v0, 0)) ++ (8L until 16L).map(i => (i, v1, 1)))
      .toDF("vec_id", "embedding", "label")
    val got = graft.operators.Similarity
      .nearestCentroidClassify(e, "embedding", "vec_id", "label", trainBps = 10000)
      .collect()
    assert(got.length === 16)
    assert(got.forall(_.getAs[Long]("correct") == 1L))
    assert(got.forall(_.getAs[Long]("sq_dist_micro2") == 0L))
    assert(got.forall(_.getAs[Long]("in_train") == 1L))
  }

  test("nearestCentroidClassify: equidistant vector ties to the SMALLER label") {
    // both labels train to the IDENTICAL centroid (1, 1): every row is an
    // exact tie, so every prediction must be the smaller label (3)
    val e = Seq(
      (1L, Array(2f, 0f), 5), (2L, Array(0f, 2f), 5),
      (3L, Array(2f, 0f), 3), (4L, Array(0f, 2f), 3)
    ).toDF("vec_id", "embedding", "label")
    val got = graft.operators.Similarity
      .nearestCentroidClassify(e, "embedding", "vec_id", "label", trainBps = 10000)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("predicted")).toMap
    assert(got === Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3),
      "exact centroid ties must all break to the smaller label")
  }

  test("nearestCentroidClassify: md5 split marks rows and centroids carry class signal") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val got = graft.operators.Similarity
      .nearestCentroidClassify(emb, "embedding", "vec_id", "label", trainBps = 8000)
      .cache()
    val byTrain = got.groupBy("in_train").count().as[(Long, Long)].collect().toMap
    // md5 gate: both splits populated, ~80/20
    assert(byTrain.keySet === Set(0L, 1L))
    assert(byTrain(1L) > byTrain(0L))
    // the synthetic labels carry weak but real structure: in-sample
    // accuracy must clear 2x chance (10 labels -> 0.1); HELD-OUT accuracy
    // on this corpus is ~chance at every SF (verified out-of-band), so
    // only the train side is a stable signal pin
    val train = got.filter(col("in_train") === 1)
    val acc = train.filter(col("correct") === 1).count().toDouble / train.count()
    assert(acc > 0.2, s"train accuracy $acc — centroids look like noise")
  }

  // ------------------------------------------------ principalAxisProjection

  test("principalAxisProjection: axis-aligned corpus projects exactly onto that axis") {
    // all variance on x: the axis converges to (1e6, 0) immediately, so
    // proj = x-coord * 1e6 exactly
    val e = Seq(
      (1L, Array(2f, 0f)), (2L, Array(-2f, 0f)), (3L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Similarity
      .principalAxisProjection(e, "embedding", "vec_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2000000000000L, 2L -> -2000000000000L, 3L -> 1000000000000L))
  }

  test("principalAxisProjection matches a BigInt reference replica on a pseudo-random corpus") {
    val dim = 8
    val vecs = (0 until 30).map { i =>
      i.toLong -> Array.tabulate(dim)(d => (((i * 31 + d * 17) % 13) - 6) / 4.0f)
    }
    val e = vecs.toDF("vec_id", "embedding")
    // reference: the documented algorithm, straight BigInt
    val vq = vecs.map { case (_, v) => v.map(x => BigInt(math.round(x.toDouble * 1e6))) }
    val g = Array.tabulate(dim, dim)((a, b) => vq.map(r => r(a) * r(b)).sum)
    var ax = Array.fill(dim)(BigInt(1000000))
    for (_ <- 1 to 3) {
      val w = Array.tabulate(dim)(i => (0 until dim).map(j => g(i)(j) * ax(j)).sum)
      val m = w.map(_.abs).max
      val jStar = w.indexWhere(_.abs == m)
      val s = if (w(jStar) < 0) BigInt(-1) else BigInt(1)
      ax = w.map(x => x * s * BigInt(1000000) / m)
    }
    val expect = vecs.map { case (id, _) =>
      id -> vq(id.toInt).zip(ax).map { case (x, a) => x * a }.sum.toLong
    }.toMap
    val got = graft.operators.Similarity
      .principalAxisProjection(e, "embedding", "vec_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
  }

  test("principalAxisProjection is deterministic under repartitioning") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val a = graft.operators.Similarity.principalAxisProjection(emb, "embedding", "vec_id")
    val b = graft.operators.Similarity
      .principalAxisProjection(emb.repartition(13), "embedding", "vec_id")
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("nearestCentroidClassify is deterministic under repartitioning") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val a = graft.operators.Similarity
      .nearestCentroidClassify(emb, "embedding", "vec_id", "label")
    val b = graft.operators.Similarity
      .nearestCentroidClassify(emb.repartition(13), "embedding", "vec_id", "label")
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  // -------------------------------------------------------- clusterSilhouette

  test("clusterSilhouette: hand case — exact a2/b2 and truncation toward zero") {
    // 1-D micro coords. label 0: {0, 12} -> centroid floor(12/2) = 6;
    // label 1: {1, 9} -> centroid floor(10/2) = 5.
    val d = Seq(
      (1L, Array(0.0f), 0), (2L, Array(12e-6f), 0),
      (3L, Array(1e-6f), 1), (4L, Array(9e-6f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = graft.operators.Similarity
      .clusterSilhouette(d, "embedding", "vec_id", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // vec 1: a2 = 36, b2 = 25 -> trunc(-11e6/36) = -305555 (floor would be
    // -305556 — this pins Spark DIV's truncation toward zero)
    assert(got(1L) === ((36L, 25L, -305555L)))
    assert(got(2L) === ((36L, 49L, 265306L)))  // trunc(13e6/49)
    assert(got(3L) === ((16L, 25L, 360000L)))  // exact 9e6/25
    assert(got(4L) === ((16L, 9L, -437500L)))  // exact -7e6/16
  }

  test("clusterSilhouette: coincident centroids with zero distances emit 0") {
    // both labels centered at the same point; the origin vec sits ON both
    val d = Seq(
      (1L, Array(0.0f), 0), (2L, Array(0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = graft.operators.Similarity
      .clusterSilhouette(d, "embedding", "vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L))
  }

  test("clusterSilhouette: single-label corpora are rejected") {
    val d = Seq((1L, Array(1e-6f), 7), (2L, Array(2e-6f), 7))
      .toDF("vec_id", "embedding", "label")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Similarity.clusterSilhouette(d, "embedding", "vec_id", "label")
    }
    assert(ex.getMessage.contains(">= 2 labels"))
  }

  test("clusterSilhouette is deterministic under repartitioning") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val a = graft.operators.Similarity
      .clusterSilhouette(emb, "embedding", "vec_id", "label")
    val b = graft.operators.Similarity
      .clusterSilhouette(emb.repartition(13), "embedding", "vec_id", "label")
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("embeddingIsotropy: identical vectors read 1e6, symmetric pairs read 0, " +
      "empty reads the sentinel, random corpus matches a driver replica") {
    import spark.implicits._
    def run(rows: Seq[(Long, Seq[Float])]) =
      graft.operators.Similarity.embeddingIsotropy(
        rows.toDF("vec_id", "embedding"), "embedding", "vec_id").collect().head
    val same = run((1L to 10L).map(i => (i, Seq(1.5f, -2.0f, 0.5f))))
    assert(same.getLong(4) === 1000000L, "identical vectors are fully collapsed")
    val sym = run(Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(-1.0f, -2.0f))))
    assert(sym.getLong(4) === 0L, "x and -x center exactly")
    val empty = run(Seq.empty[(Long, Seq[Float])])
    assert(empty.getLong(0) === 0L && empty.getLong(4) === -1L)
    // driver replica with the operator's floor arithmetic
    val rnd = new scala.util.Random(212)
    val rows = (1L to 40L).map(i =>
      (i, Seq.fill(4)((rnd.nextDouble() * 4 - 2).toFloat)))
    val vq = rows.map(_._2.map(x => math.round(x.toDouble * 1e6)))
    val n = vq.size
    val mu = (0 until 4).map(d => BigInt(vq.map(_(d)).sum) / n)
    val mu2 = mu.map(m => m * m).sum
    val meanSq = vq.map(v => v.map(x => BigInt(x) * BigInt(x)).sum).sum / n
    val got = run(rows)
    assert(got.getLong(2) === meanSq.toLong && got.getLong(3) === mu2.toLong)
    assert(got.getLong(4) === ((BigInt(1000000) * mu2) / meanSq).toLong)
  }

  test("mmrTopK: demotes the near-duplicate of the first pick below an " +
      "orthogonal moderately-relevant item, matches the greedy driver " +
      "replica, guards fire") {
    import spark.implicits._
    // query 100 = (1,0,0); A(1) top pick, B(2) ~ duplicate of A, C(3)
    // orthogonal-ish but moderately relevant; lambda=0.5 -> A, C, B
    // (pure relevance would read A, B, C)
    val vecs = Map(
      100L -> Array(1.0f, 0.0f, 0.0f),
      1L -> Array(0.96f, 0.28f, 0.0f),
      2L -> Array(0.955f, 0.29f, 0.03f),
      3L -> Array(0.5f, -0.866f, 0.0f))
    val df = vecs.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    def cos6(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      def n(x: Array[Double]) =
        math.sqrt(x.foldLeft(0.0)((acc, v) => acc + v * v))
      BigDecimal(d / (n(a) * n(b)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // greedy replica mirroring the operator: rounded-6 cosines, running
    // max similarity, ties on id ascending
    val qv = vecs(100L).map(_.toDouble)
    val cands = Seq(1L, 2L, 3L)
      .map(id => id -> vecs(id).map(_.toDouble)).toMap
    var remaining = cands.keySet
    var picked = List.empty[(Long, Double, Double)] // (id, rel, score)
    var ms = Map.empty[Long, Double]
    for (i <- 1 to 3) {
      val scored = remaining.toSeq.map { id =>
        val rel = cos6(qv, cands(id))
        val score = if (i == 1) rel else 0.5 * rel - 0.5 * ms(id)
        (id, rel, score)
      }
      val (pid, prel, pscore) = scored.minBy { case (id, _, s) => (-s, id) }
      picked = picked :+ ((pid, prel,
        BigDecimal(pscore).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      remaining -= pid
      ms = remaining.map { id =>
        val sim = cos6(cands(id), cands(pid))
        id -> (if (i == 1) sim else math.max(ms(id), sim))
      }.toMap
    }
    val got = Similarity.mmrTopK(
        df.filter(col("vec_id") === 100L), df.filter(col("vec_id") < 100L),
        "embedding", "vec_id", candidates = 3, k = 3, lambdaMilli = 500)
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toList === picked.map(_._1))
    assert(got.map(_._1).toList === List(1L, 3L, 2L)) // the diversity flip
    got.zip(picked).foreach { case ((_, gr, gs), (_, er, es)) =>
      assert(math.abs(gr - er) < 1e-9 && math.abs(gs - es) < 1e-9)
    }
    intercept[IllegalArgumentException] {
      Similarity.mmrTopK(df, df, "embedding", "vec_id", candidates = 2, k = 3)
    }
    intercept[IllegalArgumentException] {
      Similarity.mmrTopK(df, df, "embedding", "vec_id", lambdaMilli = 1001)
    }
  }

  test("centroidDrift: orthogonal centroids read cosine 0 with the exact " +
      "L2 shift, floorDiv centroids on negative sums, zero-norm sentinel, " +
      "one-sided labels emit no row") {
    import spark.implicits._
    def df(rows: Seq[(Int, Seq[Float])]) =
      rows.toDF("label", "embedding")
    // label 1: A centroid (2e6, 0) from (1,0)/(3,0); B centroid (0, 2e6)
    // label 3: all-zero vectors both sides -> -2 sentinel
    // label 4: A sums (-1000001, 0) over 2 -> floorDiv -500001
    // label 9: only in A -> no row
    val a = df(Seq(
      (1, Seq(1f, 0f)), (1, Seq(3f, 0f)),
      (3, Seq(0f, 0f)),
      (4, Seq(-1f, 0f)), (4, Seq(-0.000001f, 0f)),
      (9, Seq(1f, 1f))))
    val b = df(Seq(
      (1, Seq(0f, 2f)),
      (3, Seq(0f, 0f)), (3, Seq(0f, 0f)),
      (4, Seq(1f, 0f))))
    val got = Similarity.centroidDrift(a, b, "embedding", "label")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet === Set(1, 3, 4))
    val shift1 = math.round(math.sqrt(2.0) * 2e6)
    assert(got(1) === ((2L, 1L, 0.0, shift1, 2000000L, 2000000L)))
    assert(got(3) === ((1L, 2L, -2.0, 0L, 0L, 0L)))
    // A centroid (-500001, 0) vs B (1000000, 0): anti-parallel
    val (na4, nb4) = (500001.0, 1000000.0)
    assert(got(4)._3 === BigDecimal(-500001.0 * 1000000 / (na4 * nb4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(4)._4 === 1500001L && got(4)._5 === 500001L)
  }

  test("jlDistortion: Hadamard planes preserve distances exactly, k=1 " +
      "projects the hand ratio, coincident pair hits the sentinel, " +
      "md5-plane replica agreement, determinism, guards") {
    import spark.implicits._
    val vecs = Seq((0L, Seq(1f, 2f)), (1L, Seq(3f, 1f)), (2L, Seq(3f, 1f)))
      .toDF("vec_id", "embedding")
    def read(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // (1,1),(1,-1) is a 2x2 Hadamard: ||Pv||^2 = 2||v||^2 EXACTLY, so
    // every non-degenerate pair reads distortion exactly 1e6
    val had = read(Similarity.jlDistortion(
      vecs, "embedding", "vec_id", Seq(Seq(1.0, 1.0), Seq(1.0, -1.0))))
    assert(had((0L, 1L)) === ((5000000000000L, 10000000000000L, 1000000L)))
    assert(had((1L, 2L)) === ((0L, 0L, -1L)))
    // single plane (1,1): d2_proj = (dx+dy)^2 = 1e12, k=1 -> 200000 ppm
    val one = read(Similarity.jlDistortion(
      vecs, "embedding", "vec_id", Seq(Seq(1.0, 1.0))))
    assert(one((0L, 1L)) === ((5000000000000L, 1000000000000L, 200000L)))
    // BigInt replica on the real md5-plane family (dim 4, k 8)
    val planes = graft.functions.VectorFunctions.md5Planes(4, 8)
    val rvecs = Seq(
      (10L, Seq(0.25f, -1.5f, 2f, 0.125f)),
      (11L, Seq(-0.75f, 0.5f, -2.25f, 1f)),
      (12L, Seq(1.125f, 1.125f, 0.375f, -0.625f)))
    val rdf = rvecs.toDF("vec_id", "embedding")
    val micro = rvecs.map { case (id, v) =>
      id -> v.map(x => BigInt(math.round(x.toDouble * 1e6))) }.toMap
    def d2(a: Seq[BigInt], b: Seq[BigInt]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def proj(v: Seq[BigInt]) = planes.map(p =>
      v.zip(p).map { case (x, s) => x * BigInt(s.toLong) }.sum)
    val expect = Seq((10L, 11L), (11L, 12L)).map { case (ia, ib) =>
      val (va, vb) = (micro(ia), micro(ib))
      val (dOrig, dProj) = (d2(va, vb), d2(proj(va), proj(vb)))
      val ppm = (BigInt(1000000) * dProj / (8 * dOrig)).toLong
      (ia, ib) -> ((dOrig.toLong, dProj.toLong, ppm))
    }.toMap
    val gotR = read(Similarity.jlDistortion(rdf, "embedding", "vec_id", planes))
    assert(gotR === expect)
    val again = read(Similarity.jlDistortion(
      rdf.repartition(5), "embedding", "vec_id", planes))
    assert(again === expect)
    intercept[IllegalArgumentException] {
      Similarity.jlDistortion(vecs, "embedding", "vec_id", Nil)
    }
    intercept[IllegalArgumentException] {
      Similarity.jlDistortion(vecs, "embedding", "vec_id", Seq(Seq(0.5, 1.0)))
    }
  }

  // ------------------------- incremental IVF-PQ index maintenance (round 14)

  private def codeMap(df: org.apache.spark.sql.DataFrame) =
    df.select(col("neighbor_id"), col("bucket"), col("code")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Long](2).toSeq))).toMap

  private def probeRows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("incremental IVF-PQ: frozen-codebook delta encoding equals " +
      "full-corpus encoding for the delta rows") {
    val gate = substring(md5(col("vec_id").cast("string")), 1, 4) < lit("cccc")
    val base = emb.filter(gate)
    val delta = emb.filter(!gate)
    val nDelta = delta.count()
    assert(nDelta > 0 && nDelta < emb.count(), "split must be non-trivial")
    val model = Similarity.ivfPqTrain(base, "embedding", "vec_id")
    val fullCodes = codeMap(
      Similarity.ivfPqEncode(model, emb, "embedding", "vec_id"))
    val deltaCodes = codeMap(
      Similarity.ivfPqEncode(model, delta, "embedding", "vec_id"))
    assert(deltaCodes.nonEmpty)
    deltaCodes.foreach { case (id, bc) =>
      assert(fullCodes(id) === bc, s"delta row $id diverged from full encode")
    }
  }

  test("incremental IVF-PQ: train + encode + probe composition equals " +
      "ivfPqTopK, and the model round-trips through its tables") {
    val model = Similarity.ivfPqTrain(emb, "embedding", "vec_id",
      nClusters = 8, coarseIters = 3, m = 4, nCentroids = 16, pqIters = 3)
    val index = Similarity.ivfPqEncode(model, emb, "embedding", "vec_id")
    val composed = probeRows(Similarity.ivfPqProbeIndex(
      model, index, queries, "embedding", "vec_id",
      k = 10, nProbe = 3, rerank = 20))
    val oneShot = probeRows(Similarity.ivfPqTopK(
      queries, emb, "embedding", "vec_id", k = 10, nClusters = 8,
      nProbe = 3, coarseIters = 3, m = 4, nCentroids = 16, pqIters = 3,
      rerank = 20))
    assert(composed === oneShot)
    // the fused bootstrap (one shared quantized scan) is bit-identical
    // to the two-call composition, model and codes both
    val (fusedModel, fusedIndex) =
      Similarity.ivfPqTrainEncode(emb, "embedding", "vec_id",
        nClusters = 8, coarseIters = 3, m = 4, nCentroids = 16, pqIters = 3)
    assert(fusedModel.coarse.map(_.toSeq).toSeq ===
      model.coarse.map(_.toSeq).toSeq)
    assert(fusedModel.books.map(_.map(_.toSeq).toSeq).toSeq ===
      model.books.map(_.map(_.toSeq).toSeq).toSeq)
    assert(codeMap(fusedIndex) === codeMap(index))
    // persist the control plane as tables and rebuild: identical probe
    val (cents, books) = Similarity.ivfPqModelTables(spark, model)
    val rebuilt = Similarity.ivfPqModelFromTables(cents, books)
    assert(rebuilt.coarse.map(_.toSeq).toSeq === model.coarse.map(_.toSeq).toSeq)
    assert(rebuilt.books.map(_.map(_.toSeq).toSeq).toSeq ===
      model.books.map(_.map(_.toSeq).toSeq).toSeq)
    val viaTables = probeRows(Similarity.ivfPqProbeIndex(
      rebuilt, index, queries, "embedding", "vec_id",
      k = 10, nProbe = 3, rerank = 20))
    assert(viaTables === composed)
  }

  test("incremental IVF-PQ: the base-trained union index keeps recall@10 " +
      "within 0.1 of a full self-trained retrain (vs brute force)") {
    val gate = substring(md5(col("vec_id").cast("string")), 1, 4) < lit("cccc")
    val base = emb.filter(gate)
    val delta = emb.filter(!gate)
    val model = Similarity.ivfPqTrain(base, "embedding", "vec_id")
    val index = Similarity.ivfPqEncode(model, base, "embedding", "vec_id")
      .union(Similarity.ivfPqEncode(model, delta, "embedding", "vec_id"))
    val approx = Similarity.ivfPqProbeIndex(model, index, queries,
        "embedding", "vec_id", k = 10, nProbe = 3, rerank = 20)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(queries, emb, "embedding",
        "vec_id", k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = approx.intersect(exact).size.toDouble / exact.size
    // the retrain reference: the SAME params trained on the full union
    // (at sf0.001's 500 vectors and nProbe=3/rerank=20 the absolute
    // recall is modest for BOTH — what the incremental story must pin is
    // that freezing yesterday's codebooks costs almost nothing vs a full
    // retrain, plus a floor far above the ~0.02 random baseline)
    val selfTrained = Similarity.ivfPqTopK(queries, emb, "embedding",
        "vec_id", k = 10, nClusters = 8, nProbe = 3, coarseIters = 3,
        m = 4, nCentroids = 16, pqIters = 3, rerank = 20)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val selfRecall = selfTrained.intersect(exact).size.toDouble / exact.size
    assert(recall >= selfRecall - 0.1,
      s"base-trained recall $recall degraded vs self-trained $selfRecall")
    assert(recall >= 0.15, s"union-index recall@10 $recall below floor")
    // delta neighbors are reachable: at least one delta row surfaces
    // somewhere in the result set (the union is actually probed)
    val deltaIds = delta.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(approx.exists { case (_, n) => deltaIds.contains(n) },
      "no delta row ever surfaced — union index not actually probed")
  }

  test("recall-decay sweep: md5 splits deterministic and exhaustive, " +
      "recall monotone non-increasing in delta fraction, rerun-identical") {
    // q277's gate IS the 2000-bps point of the sweep's gate family
    assert(Similarity.baseGateHex(2000) === "cccc")
    assert(Similarity.baseGateHex(5000) === "8000")
    val qs = emb.filter(col("vec_id") < 40)
    def run() = Similarity.ivfPqRecallDecay(
        emb, qs, "embedding", "vec_id",
        deltaBps = Seq(2000, 5000, 8000), k = 10, nProbe = 3, rerank = 40)
      .orderBy(col("delta_bps")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val a = run()
    assert(a.map(_._1) === Seq(2000, 5000, 8000))
    val n = emb.count()
    a.foreach { case (bps, nb, nd, _) =>
      assert(nb + nd === n, s"split at $bps bps not exhaustive")
      assert(nb > 0 && nd > 0, s"split at $bps bps degenerate")
    }
    // base shrinks as the delta share grows
    assert(a.map(_._2) === a.map(_._2).sorted.reverse)
    // the operational claim: union-index recall decays (non-strictly) as
    // the frozen codebooks see less of the corpus
    val rec = a.map(_._4)
    assert(rec === rec.sorted.reverse,
      s"recall not monotone non-increasing in delta fraction: $rec")
    assert(rec.last > 0L, "recall collapsed to zero — probe broken")
    // deterministic end to end (md5 splits + bounded-sample training)
    assert(run() === a)
  }

  test("ivfPqRetrainTrigger: verdict flips exactly at the interpolated " +
      "crossing; endpoint clamps and first-point failure handled") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val curve = Seq((2000L, 990000L), (5000L, 950000L), (8000L, 890000L))
      .toDF("delta_bps", "mean_recall_ppm")
    def comp(nDelta: Long, nTotal: Long = 10000L) =
      spark.range(nTotal).withColumn("is_base", col("id") >= nDelta)
    def row(c: org.apache.spark.sql.DataFrame, floor: Long) =
      Similarity.ivfPqRetrainTrigger(curve, c, floor).collect()(0)
    // floor 930000 crosses segment (5000, 950000) -> (8000, 890000):
    // max_safe = 5000 + 3000 * 20000 DIV 60000 = 6000 exactly
    val atEdgeOfSafe = row(comp(6000), 930000L)
    assert(atEdgeOfSafe.getAs[Long]("max_safe_delta_bps") === 6000L)
    assert(atEdgeOfSafe.getAs[Boolean]("retrain") === false, "cur == max_safe keeps")
    assert(atEdgeOfSafe.getAs[Boolean]("at_curve_edge") === false)
    val justOver = row(comp(6001), 930000L)
    assert(justOver.getAs[Long]("current_delta_bps") === 6001L)
    assert(justOver.getAs[Boolean]("retrain") === true, "one bps past the crossing retrains")
    // floor equal to a measured recall: that point still satisfies the
    // floor, so the crossing starts at its share
    assert(row(comp(1000), 950000L).getAs[Long]("max_safe_delta_bps") === 5000L)
    // floor above the first measured point: retrain from share zero on
    val hard = row(comp(1), 995000L)
    assert(hard.getAs[Long]("max_safe_delta_bps") === 0L &&
      hard.getAs[Boolean]("retrain") === true)
    // floor below the whole curve: clamp to the measured edge, flag it
    val easy = row(comp(9999), 880000L)
    assert(easy.getAs[Long]("max_safe_delta_bps") === 8000L &&
      easy.getAs[Boolean]("at_curve_edge") === true &&
      easy.getAs[Boolean]("retrain") === true, // 9999 > 8000: beyond audit range
      easy.toString)
    assert(row(comp(8000), 880000L).getAs[Boolean]("retrain") === false)
  }
}

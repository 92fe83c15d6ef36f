package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, EmbeddingCuration}

/** Ground truth for the embedding-space curation operators: semDedup's
  * within-cluster greedy rule against a brute-force reference, planted
  * exact duplicates, prototypicality pinned exactly in the iters=0
  * degenerate case, and partitioning determinism (the exact-integer
  * training contract).
  */
class EmbeddingCurationSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    def dot(x: Seq[Double], y: Seq[Double]): Double =
      x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p * q }
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  test("semDedup: keep set matches the brute-force within-cluster rule") {
    val eps = 0.92
    val out = EmbeddingCuration.semDedup(emb, "embedding", "vec_id", eps).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    Dedup.releaseCaches()
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    assert(out.keySet === vecs.keySet, "one row per input vector")
    out.foreach { case (id, (bucket, keep)) =>
      val hasSmallerDup = out.exists { case (oid, (ob, _)) =>
        oid < id && ob == bucket && cosine(vecs(id), vecs(oid)) > eps
      }
      assert(keep === !hasSmallerDup, s"vec $id keep=$keep but brute force says ${!hasSmallerDup}")
    }
  }

  test("semDedup: planted exact duplicates always drop; originals keep their fate") {
    // copies under fresh larger ids quantize identically -> same bucket,
    // cosine 1.0 with the original -> must drop
    val copies = emb.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + lit(100000L))
    val out = EmbeddingCuration.semDedup(emb.union(copies), "embedding", "vec_id", eps = 0.92)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    Dedup.releaseCaches()
    (0L until 5L).foreach { i =>
      assert(!out(i + 100000L), s"planted duplicate of vec $i must be dropped")
    }
    val base = EmbeddingCuration.semDedup(emb, "embedding", "vec_id", eps = 0.92)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    Dedup.releaseCaches()
    // adding strictly-larger ids cannot change any original's decision
    base.foreach { case (id, keep) => assert(out(id) === keep, s"vec $id fate changed") }
  }

  test("prototypicality: iters=0, nClusters=1 pins the exact centroid cosine") {
    val out = EmbeddingCuration.prototypicality(
      emb, "embedding", "vec_id", nClusters = 1, iters = 0).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
    Dedup.releaseCaches()
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    // init centroid = micro-quantized vector of the smallest-md5(id) row
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seedId = vecs.keys.toSeq.sortBy(id => (md5hex(id.toString), id)).head
    val centroid = vecs(seedId).map(x => math.round(x * 1e6).toDouble)
    out.foreach { case (id, bucket, protoCos, _) =>
      assert(bucket === 0)
      val expected = BigDecimal(cosine(vecs(id), centroid))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(protoCos - expected) < 1e-9, s"vec $id: $protoCos vs $expected")
    }
    // the seed vector itself has cosine exactly 1 -> rank 1
    val byRank = out.sortBy(_._4)
    assert(byRank.head._1 === seedId && byRank.head._3 === 1.0)
    assert(byRank.map(_._4).toSeq === (1 to out.length).toSeq, "dense ranks within the cluster")
  }

  test("semDedup and prototypicality are partitioning-invariant") {
    val a = EmbeddingCuration.semDedup(emb, "embedding", "vec_id", eps = 0.92)
      .orderBy("vec_id").collect().toSeq
    Dedup.releaseCaches()
    val b = EmbeddingCuration.semDedup(emb.repartition(7), "embedding", "vec_id", eps = 0.92)
      .orderBy("vec_id").collect().toSeq
    Dedup.releaseCaches()
    assert(a === b)
    val p = EmbeddingCuration.prototypicality(emb, "embedding", "vec_id")
      .orderBy("vec_id").collect().toSeq
    Dedup.releaseCaches()
    val q = EmbeddingCuration.prototypicality(emb.repartition(5), "embedding", "vec_id")
      .orderBy("vec_id").collect().toSeq
    Dedup.releaseCaches()
    assert(p === q)
  }
}

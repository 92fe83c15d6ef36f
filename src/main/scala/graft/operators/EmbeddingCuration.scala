package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}

/** Embedding-space corpus curation: semantic deduplication (SemDeDup)
  * and prototypicality scoring/pruning (SSL-prototypes / D4), both on
  * top of the engine-portable integer-Lloyd KMeans from [[Similarity]].
  *
  * Scale design: the cluster assignment is one codegen'd corpus scan
  * against broadcast centroids (bounded driver state, nClusters * dim
  * longs). The quadratic work — pairwise cosine — happens ONLY within a
  * cluster (an equi-join on the cluster id, sum-of-cluster^2 pairs),
  * never all-pairs: at 100 TB you raise nClusters so clusters stay
  * small, exactly the knob the SemDeDup paper turns (50k clusters for
  * LAION-scale). Centroid training cost is iters bounded corpus scans,
  * once per corpus.
  *
  * Portability: training, assignment, and every keep/drop decision are
  * exact-integer or identically-ordered f64 arithmetic, so a SQL engine
  * replays them bit-for-bit (the q83/q84 DuckDB oracles do).
  */
object EmbeddingCuration {

  /** SEMANTIC DEDUPLICATION (SemDeDup, Abbas et al. 2023): cluster the
    * embeddings, then within each cluster drop every vector whose cosine
    * similarity to some SMALLER-id vector of the same cluster exceeds
    * `eps`. Greedy keep-lowest-id is deterministic and order-free: a
    * vector's fate depends only on the set of smaller-id near-duplicates
    * in its cluster, not on any scan order. (The paper keeps a random
    * member per duplicate group; min-id is the reproducible variant —
    * same dedup rate, pinned winners.)
    *
    * Returns one row per input vector: (idCol, bucket, keep). Cross-
    * cluster near-duplicates are NOT detected (the paper's accepted
    * approximation — boundary pairs land in different clusters).
    */
  def semDedup(
      corpus: DataFrame, vecCol: String, idCol: String,
      eps: Double = 0.97, nClusters: Int = 8, iters: Int = 3): DataFrame = {
    require(nClusters >= 1 && nClusters <= 256 && iters >= 0 && eps > 0 && eps < 1,
      "need 1 <= nClusters <= 256, iters >= 0, 0 < eps < 1")
    val e = Similarity.quantized(corpus, vecCol, idCol)
    val centroids = Similarity.trainIntCentroids(e, nClusters, iters)
    val a = e.select(
        col("vid"), col("v"),
        Similarity.nearestCid(col("vq"), col("vv"), centroids).as("bucket"))
      .withColumn("n", V.norm(col("v")))
    // pairwise ONLY within a bucket; y < x means x has a smaller-id dup.
    // The exact left-to-right f64 dot (same fold as the brute-force ANN
    // baseline) makes the eps comparison engine-portable.
    val dups = a.as("x").join(a.as("y"),
        col("x.bucket") === col("y.bucket") && col("y.vid") < col("x.vid"))
      .filter(V.dot(col("x.v"), col("y.v")) / (col("x.n") * col("y.n")) > eps)
      .select(col("x.vid").as("vid")).distinct()
    a.join(dups.withColumn("is_dup", lit(true)), Seq("vid"), "left")
      .select(col("vid").as(idCol), col("bucket"),
        coalesce(col("is_dup"), lit(false)).unary_!.as("keep"))
  }

  /** PROTOTYPICALITY scoring (SSL-prototypes pruning / the second stage
    * of D4): cosine of each vector to its cluster centroid, ranked
    * within the cluster (rank 1 = most prototypical). Downstream pruning
    * policies — drop the most prototypical (redundant core, D4), drop
    * the least (outliers/noise), keep a band — are one `filter` on the
    * returned rank/score.
    *
    * Returns (idCol, bucket, proto_cos rounded to 1e-6, rank). The
    * centroid is the exact-integer Lloyd mean (micro units); cosine is
    * scale-invariant, so micro-unit centroids give the same score as
    * their real-valued means up to f64 rounding — and the SAME f64
    * result in any engine, since both sides fold left-to-right.
    */
  def prototypicality(
      corpus: DataFrame, vecCol: String, idCol: String,
      nClusters: Int = 8, iters: Int = 3): DataFrame = {
    require(nClusters >= 1 && nClusters <= 256 && iters >= 0,
      "need 1 <= nClusters <= 256, iters >= 0")
    val e = Similarity.quantized(corpus, vecCol, idCol)
    val centroids = Similarity.trainIntCentroids(e, nClusters, iters)
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = broadcast(
      centroids.toIndexedSeq.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toDF("bucket", "centroid")
        .withColumn("cnorm", V.norm(col("centroid"))))
    val scored = e.select(
        col("vid"), col("v"),
        Similarity.nearestCid(col("vq"), col("vv"), centroids).as("bucket"))
      .withColumn("n", V.norm(col("v")))
      .join(cents, Seq("bucket"))
      .withColumn("cos", V.dot(col("v"), col("centroid")) / (col("n") * col("cnorm")))
    val w = Window.partitionBy(col("bucket")).orderBy(col("cos").desc, col("vid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .select(col("vid").as(idCol), col("bucket"),
        round(col("cos"), 6).as("proto_cos"), col("rank"))
  }
}

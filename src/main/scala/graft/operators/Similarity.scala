package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Materialize.MaterializeOps

import graft.functions.{VectorFunctions => V}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design:
  *  - [[bruteForceTopK]] broadcasts the (small) query set against the
  *    corpus — one corpus scan, no shuffle of the corpus, cost
  *    O(|corpus| * |queries| * dim). This is the exact baseline.
  *  - [[lshTopK]] prunes with sign-LSH buckets: corpus and queries are
  *    both signed with the same deterministic hyperplanes and only
  *    bucket-colliding rows are scored. Multi-probe (hamming-1 neighbors
  *    of the query signature) trades recall for cost.
  *  - [[ivfTopK]] is an IVF-style coarse quantizer: corpus is bucketed by
  *    a provided partition column (e.g. a cluster id); only the query's
  *    nProbe nearest buckets by centroid cosine are scanned.
  */
object Similarity {

  /** Exact top-k neighbors per query by cosine. Ties break on corpus id
    * ascending (deterministic). Queries are broadcast.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), V.asDouble(col(vecCol)).as("qv"))
        .withColumn("qn", V.norm(col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), V.asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", V.norm(col("cv")))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", V.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  /** MMR DIVERSIFIED TOP-K — maximal marginal relevance (Carbonell &
    * Goldstein): greedily pick k items that are RELEVANT to the query but
    * not redundant with what's already picked,
    *
    *   pick_1 = argmax rel,
    *   pick_i = argmax λ·rel − (1−λ)·max_{s ∈ picked} cos(c, s)
    *
    * — the de-duplicating selection every RAG context builder and
    * diverse-exemplar sampler runs after ANN retrieval. Relevance is the
    * exact cosine against the query; redundancy is the running maximum
    * cosine to the picked set.
    *
    * Exactness: cosines round to 6 decimals BEFORE scoring (the q69
    * rounded-rank convention — a 1-ulp sqrt/divide wobble cannot flip a
    * pick), λ enters as millis so both engines evaluate the identical
    * f64 literal, ties break on candidate id ascending. A query whose
    * candidate pool is smaller than k simply stops early.
    *
    * Scale shape: candidate generation is [[bruteForceTopK]]'s broadcast
    * scan bounded to `candidates` rows per query (swap in an ANN front
    * end upstream at 100 TB — the operator only needs the scored pool);
    * the greedy loop is k − 1 rounds over a (queries × candidates)-
    * bounded frame — each round ONE per-query min(struct) argmax, ONE
    * join against that round's single pick per query, and a
    * Materialize.checkpoint that pins the round (the q120 loop-invariant
    * pattern) so lineage cannot compound. Nothing in the loop ever
    * touches the corpus again.
    */
  def mmrTopK(
      queries: DataFrame, corpus: DataFrame, vecCol: String, idCol: String,
      candidates: Int = 20, k: Int = 5, lambdaMilli: Int = 700): DataFrame = {
    require(k >= 1 && candidates >= k,
      "mmrTopK: need k >= 1 and candidates >= k")
    require(lambdaMilli >= 0 && lambdaMilli <= 1000,
      "mmrTopK: lambdaMilli in [0, 1000]")
    val lam = lambdaMilli / 1000.0
    val mu = (1000 - lambdaMilli) / 1000.0
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), V.asDouble(col(vecCol)).as("qv"))
        .withColumn("qn", V.norm(col("qv"))))
    val c = corpus.select(col(idCol).as("cid"), V.asDouble(col(vecCol)).as("v"))
      .withColumn("cn", V.norm(col("v")))
    val scored = c.join(q, col("query_id") =!= col("cid"))
      .withColumn("rel",
        round(V.dot(col("qv"), col("v")) / (col("qn") * col("cn")), 6))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("cid").asc)
    var state = scored
      .withColumn("rk", row_number().over(wc)).filter(col("rk") <= candidates)
      .select(col("query_id"), col("cid"), col("rel"), col("v"), col("cn"))
      .withColumn("ms", lit(null).cast("double"))
      .materialize
    var picks: DataFrame = null
    for (i <- 1 to k) {
      val negScore =
        if (i == 1) negate(col("rel"))
        else negate(lit(lam) * col("rel") - lit(mu) * col("ms"))
      val pick = state
        .groupBy(col("query_id"))
        .agg(min(struct(negScore.as("negs"), col("cid").as("pcid"),
          col("rel").as("prel"), col("v").as("pv"), col("cn").as("pcn")))
          .as("p"))
        .select(col("query_id"), col("p.pcid").as("pcid"),
          col("p.prel").as("prel"), col("p.pv").as("pv"),
          col("p.pcn").as("pcn"), negate(col("p.negs")).as("score"))
      val pickOut = pick.select(col("query_id"), lit(i).as("rank"),
        col("pcid").as("cand_id"), col("prel").as("relevance"),
        round(col("score"), 6).as("mmr_score"))
      picks = if (picks == null) pickOut else picks.union(pickOut)
      if (i < k) {
        state = state
          .join(pick.select(col("query_id"), col("pcid"), col("pv"), col("pcn")),
            Seq("query_id"))
          .filter(col("cid") =!= col("pcid"))
          .withColumn("psim",
            round(V.dot(col("v"), col("pv")) / (col("cn") * col("pcn")), 6))
          .withColumn("ms", when(col("ms").isNull, col("psim"))
            .otherwise(greatest(col("ms"), col("psim"))))
          .select(col("query_id"), col("cid"), col("rel"), col("v"),
            col("cn"), col("ms"))
          .materialize
      }
    }
    picks
  }

  /** Approximate top-k: score only corpus rows whose sign-LSH signature is
    * within hamming distance `probeHamming` of the query's signature.
    * The signature test is a cheap codegen'd bit_count per (query, row)
    * pair — it prunes the EXPENSIVE cosine, not the pair enumeration, so
    * this is the right tool for a small broadcast query set against a huge
    * corpus (one corpus scan, no shuffle). For massive query sets use
    * [[ivfKmeansTopK]], whose bucket equi-join prunes pair enumeration too.
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, k: Int,
      bits: Int = 12, probeHamming: Int = 2,
      planes: Option[Seq[Seq[Double]]] = None): DataFrame = {
    planes.foreach(ps => require(ps.size == bits, s"need $bits planes, got ${ps.size}"))
    // explicit literal planes (e.g. V.md5Planes) make the signature — and
    // therefore the whole approximate result — reproducible outside Spark
    val sigOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      planes match {
        case Some(ps) => v => V.signLshWithPlanes(v, ps)
        case None => v => V.signLshSignature(v, bits)
      }
    val c = corpus.select(col(idCol).as("neighbor_id"), V.asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", V.norm(col("cv")))
      .withColumn("csig", sigOf(col("cv")))
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), V.asDouble(col(vecCol)).as("qv"))
        .withColumn("qn", V.norm(col("qv")))
        .withColumn("qsig", sigOf(col("qv"))))
    val scored = c.join(q,
        col("query_id") =!= col("neighbor_id") &&
          bit_count(col("csig").bitwiseXOR(col("qsig"))) <= probeHamming)
      .withColumn("cos", V.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  /** IVF with a LEARNED coarse quantizer: KMeans (MLlib) clusters the
    * corpus embeddings; each query scans its nProbe nearest clusters.
    * Training is one pass over a sample-able corpus (k-means|| init);
    * at serving time the cluster id is a persisted column, so queries
    * touch ~nProbe/nClusters of the corpus.
    */
  def ivfKmeansTopK(
      queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String,
      k: Int, nClusters: Int = 8, nProbe: Int = 2, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val train = corpus.select(
      col(idCol).as("neighbor_id"), V.asDouble(col(vecCol)).as("cv"),
      array_to_vector(col(vecCol)).as("features"))
    val model = new KMeans().setK(nClusters).setSeed(seed).setMaxIter(10).fit(train)
    val assigned = model.transform(train)
      .select(col("prediction").as("bucket"),
        col("neighbor_id").as(idCol), col("cv").as(vecCol))
    ivfTopK(queries, assigned, vecCol, idCol, "bucket", k, nProbe)
  }

  /** IVF-style search against a pre-bucketed corpus: centroids = mean
    * vector per bucket; each query scans its nProbe closest buckets.
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, bucketCol: String,
      k: Int, nProbe: Int = 2): DataFrame = {
    val c = corpus.select(
        col(bucketCol).as("bucket"), col(idCol).as("neighbor_id"), V.asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", V.norm(col("cv")))
    // centroid per bucket: elementwise mean via posexplode + re-assemble
    val centroids = c
      .select(col("bucket"), posexplode(col("cv")).as(Seq("d", "x")))
      .groupBy(col("bucket"), col("d")).agg(avg(col("x")).as("m"))
      .groupBy(col("bucket"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))), s => s.getField("m")).as("centroid"))
    val q = queries.select(col(idCol).as("query_id"), V.asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", V.norm(col("qv")))
    val probes = q.join(broadcast(centroids), lit(true))
      .withColumn("ccos", V.cosine(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("bucket").asc)))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("bucket"))
    val scored = c.join(broadcast(probes), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", V.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  /** IVF ANN with an ENGINE-PORTABLE KMeans coarse quantizer: Lloyd's
    * algorithm over micro-unit fixed-point vectors with exact integer
    * arithmetic end-to-end, so the learned centroids — and therefore the
    * whole probe-then-scan result — are bit-identical in any engine
    * (unlike float KMeans, where partition-order f64 accumulation makes
    * training engine-specific; that variant is [[ivfKmeansTopK]]).
    *
    *  - vectors quantize once: vq[d] = round(v[d] * 1e6), an integer
    *    carried exactly in f64 (all derived values stay below 2^53)
    *  - init: the `nClusters` vectors with the smallest md5(id) (a
    *    content-independent deterministic sample, cid = sample rank)
    *  - each Lloyd round: argmin over exact integer squared distances
    *    (ties -> lowest cid), then centroid[d] = floorDiv(sum, count) —
    *    exact integer sums are associative, so any partitioning or
    *    parallelism yields the same centroids; empty clusters keep their
    *    previous centroid
    *  - probes: the query's `nProbe` integer-nearest centroids; final
    *    scoring is the exact left-to-right f64 cosine on the original
    *    vectors (the portable fold the brute-force baseline uses)
    *
    * Driver state is bounded by nClusters * dim longs per round (the
    * centroid table — same driver footprint as any distributed KMeans).
    * Training runs over the [[TrainSampleSize]] md5-smallest vectors
    * (one bounded top-n select, then `iters` scans of that cached
    * ≤1024-row frame) — constant cost regardless of corpus size; only
    * the final assignment pass scans the full corpus.
    */
  // --- shared integer-Lloyd machinery (kmeansIntTopK + EmbeddingCuration) ---

  // micro-unit quantized coords, kept as EXACT-INTEGER-VALUED doubles:
  // every product (<= ~1.2e12), running dot sum (<= ~7.2e13) and the
  // expansion |v-c|^2 = v.v - 2 v.c + c.c (<= ~3e14) is an integer
  // below 2^53, so f64 arithmetic is exact and engine-portable AND the
  // distance goes through the codegen'd dot-product expression — the
  // naive per-centroid zip_with/aggregate HOF formulation built a
  // ~6000-node expression tree whose per-round planning alone cost
  // seconds (and evaluated interpreted)
  private val micro = (v: Column) => transform(v, x => round(x * 1e6))

  // RUNTIME GUARD for the exactness window: every cross dot is bounded
  // by sqrt(vv * cc) (Cauchy-Schwarz, term-wise on |.|) and centroids
  // are per-dimension means of member vq's, so cc <= max vv; requiring
  // vv <= 2^50 therefore keeps every product, running sum, and the
  // |v-c|^2 expansion (<= 4 * 2^50 = 2^52) strictly inside f64's exact
  // integer range. Unnormalized inputs that overflow the window now
  // fail loudly at first scan instead of silently returning wrong
  // neighbors. Zero extra jobs: the check rides the quantization scan.
  private val vvMax = 1.125899906842624e15 // 2^50, exactly representable
  private def guardedVv(vvCol: Column, idc: Column): Column =
    when(vvCol <= lit(vvMax), vvCol).otherwise(raise_error(concat(
      lit("Similarity quantize: micro-quantized |v|^2 > 2^50 — coordinate "
        + "magnitudes exceed the exact-integer f64 window; rescale or "
        + "normalize the embeddings (id="), idc.cast("string"), lit(")"))))

  /** (vid, v, vq, vv) quantized frame, persisted via the shared tracked
    * cache (one corpus scan feeds every Lloyd round + the final assign).
    */
  private[operators] def quantized(
      corpus: DataFrame, vecCol: String, idCol: String): DataFrame =
    Dedup.persistTracked(
      corpus.select(col(idCol).as("vid"), V.asDouble(col(vecCol)).as("v"))
        .withColumn("vq", micro(col("v")))
        .withColumn("vv", guardedVv(V.dot(col("vq"), col("vq")), col("vid"))))

  // (dist, cid) packed into one long — dist*256+cid preserves the
  // (dist asc, cid asc) order and keeps argmin/sort on plain integers
  // (micro distances are <= ~2^48, so the pack cannot overflow); the
  // SQL oracle ranks by the unpacked pair directly
  private[operators] def packedDist(
      vcol: Column, vvcol: Column, c: Array[Double], cid: Int): Column = {
    val cc = c.map(x => x * x).sum // exact: 64 integer-valued squares
    ((vvcol - lit(2.0) * V.dot(vcol, lit(c)) + lit(cc)).cast("long") * 256 + cid)
  }
  private[operators] def nearestCid(
      vcol: Column, vvcol: Column, cs: Array[Array[Double]]): Column =
    (array_min(array(cs.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      packedDist(vcol, vvcol, c, i) }: _*)) % 256).cast("int")

  /** Integer-Lloyd training over a [[quantized]] frame: init = the
    * `nClusters` vectors with the smallest md5(id), then `iters` rounds of
    * exact-integer assignment + floorDiv centroid means (empty clusters
    * keep their previous centroid). Centroids are bounded driver state
    * (nClusters * dim longs) — the broadcast-table pattern.
    */
  /** Codebook-training sample bound: every Lloyd trainer learns its
    * centroids/codebooks from the `TrainSampleSize` md5-smallest vectors
    * instead of scanning the full corpus once per round. KMeans codebook
    * quality saturates far below this sample size for the cluster counts
    * the API allows (≤ 256), so at 100 TB the training loop costs ONE
    * bounded top-n collect — CONSTANT, not corpus-linear — while the
    * assignment/encode/scan passes stay full-corpus and exact. Seeds are
    * the sample prefix (same md5 total order), so a corpus with ≤
    * `TrainSampleSize` vectors trains bit-identically to the former
    * full-corpus loop; larger corpora learn (equally valid, SQL-replayed)
    * sampled codebooks.
    */
  private[operators] val TrainSampleSize = 1024

  /** The md5-smallest [[TrainSampleSize]] rows of a [[quantized]] frame,
    * collected once (≤ 1024 × dim integer-valued doubles — bounded driver
    * state, the same contract as the centroid table itself). Every Lloyd
    * round then runs DRIVER-SIDE over this array instead of launching a
    * Spark job per round: the arithmetic is exact-integer-valued f64
    * (sums of integers < 2^53 are exact in any association), so the
    * driver loop is bit-identical to the former distributed rounds while
    * removing `iters` job launches + shuffles per trainer — a fixed
    * per-query stage-barrier cost at ANY corpus size (the top-n select is
    * a per-partition limit + merge, never a global sort).
    */
  private def collectTrainingSample(
      e: DataFrame): Array[(Array[Double], Double)] = e
    .select(col("vid"), col("vq"), col("vv"),
      md5(col("vid").cast("string")).as("__h"))
    .orderBy(col("__h"), col("vid")).limit(TrainSampleSize)
    .collect()
    .map(r => (r.getSeq[Double](1).toArray, r.getDouble(2)))

  /** Driver twin of [[nearestCid]]: same packed (dist * 256 + cid) argmin
    * over the same exact-integer f64 expansion, so assignments match the
    * codegen expression bit-for-bit.
    */
  private def nearestCidLocal(
      vq: Array[Double], vv: Double, cs: Array[Array[Double]]): Int = {
    var best = Long.MaxValue
    var i = 0
    while (i < cs.length) {
      val c = cs(i)
      var dot = 0.0
      var cc = 0.0
      var d = 0
      while (d < c.length) { dot += vq(d) * c(d); cc += c(d) * c(d); d += 1 }
      val packed = (vv - 2.0 * dot + cc).toLong * 256 + i
      if (packed < best) best = packed
      i += 1
    }
    (best % 256).toInt
  }

  /** One exact-integer Lloyd round over the collected sample: assignment
    * + floorDiv means (empty clusters keep their previous centroid).
    */
  private def coarseRoundLocal(
      sample: Array[(Array[Double], Double)],
      centroids: Array[Array[Double]]): Array[Array[Double]] = {
    val k = centroids.length
    val dim = if (k > 0) centroids(0).length else 0
    val sums = Array.ofDim[Long](k, dim)
    val cnt = new Array[Long](k)
    sample.foreach { case (vq, vv) =>
      val cid = nearestCidLocal(vq, vv, centroids)
      cnt(cid) += 1
      var d = 0
      while (d < dim) { sums(cid)(d) += vq(d).toLong; d += 1 }
    }
    val next = centroids.map(_.clone())
    var i = 0
    while (i < k) {
      if (cnt(i) > 0) {
        var d = 0
        while (d < dim) {
          next(i)(d) = Math.floorDiv(sums(i)(d), cnt(i)).toDouble
          d += 1
        }
      }
      i += 1
    }
    next
  }

  private def coarseLoopLocal(
      sample: Array[(Array[Double], Double)], nClusters: Int,
      iters: Int): Array[Array[Double]] = {
    var centroids = sample.take(nClusters).map(_._1.clone())
    for (_ <- 1 to iters) centroids = coarseRoundLocal(sample, centroids)
    centroids
  }

  private[operators] def trainIntCentroids(
      e: DataFrame, nClusters: Int, iters: Int): Array[Array[Double]] =
    coarseLoopLocal(collectTrainingSample(e), nClusters, iters)

  def kmeansIntTopK(
      queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String,
      k: Int, nClusters: Int = 8, nProbe: Int = 2, iters: Int = 3): DataFrame = {
    require(nClusters >= 1 && nClusters <= 256 && nProbe >= 1 && iters >= 0,
      "need 1 <= nClusters <= 256, nProbe >= 1, iters >= 0")
    val e = quantized(corpus, vecCol, idCol)
    val centroids = trainIntCentroids(e, nClusters, iters)

    val assigned = e.select(
        col("vid").as("neighbor_id"), col("v").as("cv"),
        nearestCid(col("vq"), col("vv"), centroids).as("bucket"))
      .withColumn("cn", V.norm(col("cv")))
    val q = queries
      .select(col(idCol).as("query_id"), V.asDouble(col(vecCol)).as("qv"))
      .withColumn("qvq", micro(col("qv")))
      .withColumn("qvv", guardedVv(V.dot(col("qvq"), col("qvq")), col("query_id")))
      .withColumn("qn", V.norm(col("qv")))
    val probes = q
      .withColumn("pr", array_sort(array(centroids.toIndexedSeq.zipWithIndex.map { case (c, i) =>
        packedDist(col("qvq"), col("qvv"), c, i) }: _*)))
      .select(col("query_id"), col("qv"), col("qn"),
        explode(slice(col("pr"), 1, nProbe)).as("pb"))
      .select(col("query_id"), col("qv"), col("qn"), (col("pb") % 256).cast("int").as("bucket"))
    val scored = assigned.join(broadcast(probes), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", V.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  /** Product-quantization codebooks: the corpus's micro-quantized
    * vectors are split into `m` contiguous subspaces and each subspace
    * gets its own `nCentroids`-entry integer-Lloyd codebook (same
    * fixed-point semantics as [[trainIntCentroids]]: smallest-md5 seeds,
    * exact integer assignment, floorDiv means, empty cells keep their
    * previous centroid — fully SQL-replayable). Training runs over the
    * [[TrainSampleSize]] md5-smallest vectors, ONE sample scan per
    * iteration for ALL m codebooks: per-row assignment columns, then a
    * single exploded (subspace, cid, dim) aggregation — never m scans,
    * never corpus-linear. Codebooks are bounded driver state
    * (nCentroids · dim longs total), broadcast back as literals.
    */
  /** One exact-integer PQ round over all m subspaces of the collected
    * sample. Same empty-cell keep-previous semantics; subspace slices and
    * their |sl|² are exact integers, so the driver loop reproduces the
    * former distributed round bit-for-bit.
    */
  private def pqRoundLocal(
      sample: Array[(Array[Double], Double)],
      books: Array[Array[Array[Double]]],
      sub: Int): Array[Array[Array[Double]]] = {
    val m = books.length
    val nc = books(0).length
    val sums = Array.ofDim[Long](m, nc, sub)
    val cnt = Array.ofDim[Long](m, nc)
    val sl = new Array[Double](sub)
    sample.foreach { case (vq, _) =>
      var j = 0
      while (j < m) {
        var d = 0
        var slvv = 0.0
        while (d < sub) {
          val x = vq(j * sub + d)
          sl(d) = x
          slvv += x * x
          d += 1
        }
        val cid = nearestCidLocal(sl, slvv, books(j))
        cnt(j)(cid) += 1
        d = 0
        while (d < sub) { sums(j)(cid)(d) += sl(d).toLong; d += 1 }
        j += 1
      }
    }
    val next = books.map(_.map(_.clone()))
    var j = 0
    while (j < m) {
      var c = 0
      while (c < nc) {
        if (cnt(j)(c) > 0) {
          var d = 0
          while (d < sub) {
            next(j)(c)(d) = Math.floorDiv(sums(j)(c)(d), cnt(j)(c)).toDouble
            d += 1
          }
        }
        c += 1
      }
      j += 1
    }
    next
  }

  private def pqSeedBooks(
      seeds: Array[Array[Double]], m: Int,
      nCentroids: Int): (Array[Array[Array[Double]]], Int) = {
    require(seeds.nonEmpty, "pq training needs a non-empty corpus")
    val dim = seeds.head.length
    require(dim % m == 0, s"m=$m must divide the embedding dim $dim")
    val sub = dim / m
    (Array.tabulate(m)(j =>
      seeds.take(nCentroids).map(_.slice(j * sub, (j + 1) * sub))), sub)
  }

  private def pqLoopLocal(
      sample: Array[(Array[Double], Double)], m: Int, nCentroids: Int,
      iters: Int): Array[Array[Array[Double]]] = {
    val (books0, sub) =
      pqSeedBooks(sample.take(nCentroids).map(_._1), m, nCentroids)
    var books = books0
    for (_ <- 1 to iters) books = pqRoundLocal(sample, books, sub)
    books
  }

  private[operators] def trainPqCodebooks(
      e: DataFrame, m: Int, nCentroids: Int,
      iters: Int): Array[Array[Array[Double]]] =
    pqLoopLocal(collectTrainingSample(e), m, nCentroids, iters)

  /** Trains the coarse centroids AND the PQ codebooks together, fusing
    * each pair of Lloyd rounds into ONE corpus scan (coarse assignment +
    * m subspace assignments in the same select; the union'd (family,
    * cid, dim) aggregation keys coarse cells as j = -1). Seeds come from
    * one shared smallest-md5 collect — both seed sets are prefixes of
    * the same md5 total order, so results are bit-identical to running
    * [[trainIntCentroids]] and [[trainPqCodebooks]] separately (which
    * the tail rounds do when the iteration counts differ).
    */
  private[operators] def trainIvfPqShared(
      e: DataFrame, nClusters: Int, coarseIters: Int, m: Int,
      nCentroids: Int, pqIters: Int)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    // the coarse and PQ state never interact (the former fused rounds
    // only shared the per-round corpus scan, which the driver loop no
    // longer pays), so the two loops run independently off ONE collected
    // sample — bit-identical to the fused formulation by construction
    val sample = collectTrainingSample(e)
    (coarseLoopLocal(sample, nClusters, coarseIters),
      pqLoopLocal(sample, m, nCentroids, pqIters))
  }

  /** PQ-ADC approximate top-k (asymmetric distance computation): the
    * corpus is ENCODED as m small codes (nearest codebook entry per
    * subspace), each query precomputes its m × nCentroids exact integer
    * subspace-distance table ONCE, and the scan scores a pair with m
    * table lookups instead of a dim-length dot product. The approximate
    * top-`rerank` per query (ties to the smaller id) is then re-scored
    * with exact cosine and the top-`k` of that emitted — the standard
    * PQ → exact-rerank pipeline.
    *
    * What PQ buys at scale: this is a COMPRESSED-DOMAIN LINEAR scan. It
    * prunes FLOPs and memory traffic — the scanned corpus representation
    * is m byte-sized codes (+ the rerank vector fetch for survivors)
    * instead of dim floats, dim/m × smaller — but NOT pair enumeration;
    * for that compose with the bucketed methods ([[lshTopK]],
    * [[kmeansIntTopK]]) exactly as IVF-PQ does. Everything is exact
    * integer arithmetic in micro² units (distances ≤ 2·2^50 < 2^53, sums
    * over subspaces telescope to the full-vector bound), so training,
    * codes, and candidate ranking are bit-identical in any engine at any
    * parallelism, and the oracle replays all of it in SQL.
    */
  def pqTopK(
      queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String,
      k: Int, m: Int = 4, nCentroids: Int = 16, iters: Int = 3,
      rerank: Int = 50): DataFrame = {
    require(m >= 1 && m <= 64, "m in [1, 64]")
    require(nCentroids >= 1 && nCentroids <= 256, "nCentroids in [1, 256]")
    require(iters >= 0 && k >= 1 && rerank >= k,
      "need iters >= 0, k >= 1, rerank >= k")
    val e = quantized(corpus, vecCol, idCol)
    val books = trainPqCodebooks(e, m, nCentroids, iters)
    val sub = books(0)(0).length
    val codes = e.select(col("vid").as("neighbor_id"), col("v").as("cv"),
        array((0 until m).map { j =>
          val sl = slice(col("vq"), j * sub + 1, sub)
          nearestCid(sl, V.dot(sl, sl), books(j)).cast("long")
        }: _*).as("code"))
      .withColumn("cn", V.norm(col("cv")))
    val q = queries
      .select(col(idCol).as("query_id"), V.asDouble(col(vecCol)).as("qv"))
      .withColumn("qvq", micro(col("qv")))
      .withColumn("qvv",
        guardedVv(V.dot(col("qvq"), col("qvq")), col("query_id")))
      .withColumn("tbl", array((0 until m).map { j =>
        val sl = slice(col("qvq"), j * sub + 1, sub)
        array(books(j).toIndexedSeq.map { c =>
          val cc = c.map(x => x * x).sum // exact: integer-valued squares
          V.dot(sl, sl) - lit(2.0) * V.dot(sl, lit(c)) + lit(cc)
        }: _*)
      }: _*))
      .withColumn("qn", V.norm(col("qv")))
      .select(col("query_id"), col("qv"), col("qn"), col("tbl"))
    val scored = codes.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", aggregate(
        zip_with(col("tbl"), col("code"),
          (t, c) => element_at(t, (c + 1).cast("int"))),
        lit(0.0), (acc, x) => acc + x))
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    val cand = scored.withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= rerank)
      .withColumn("cos", V.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** IVF-PQ: the production ANN shape — [[kmeansIntTopK]]'s coarse
    * integer-Lloyd buckets prune PAIR ENUMERATION (only the query's
    * `nProbe` nearest buckets are scanned) and [[pqTopK]]'s codes prune
    * PER-PAIR COST (m table lookups instead of a dim-length dot).
    * Candidates surviving the ADC ranking (top-`rerank` per query, ties
    * to the smaller id) get the exact cosine rerank. Codebooks here
    * quantize RAW vectors shared across buckets (not per-bucket
    * residuals — the residual variant buys accuracy at the price of
    * per-bucket codebooks; this keeps the code table one broadcast and
    * the whole pipeline SQL-replayable), so recall is tuned with
    * `nProbe` × `rerank`, the two independent cost knobs.
    *
    * Scale: bucket equi-join bounds scanned pairs by bucket size ×
    * nProbe; the scanned representation is m codes per row; both
    * training loops are bounded driver state broadcast back. Same exact
    * integer arithmetic as the parts, so bit-identical anywhere.
    */
  def ivfPqTopK(
      queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String,
      k: Int, nClusters: Int = 8, nProbe: Int = 2, coarseIters: Int = 3,
      m: Int = 4, nCentroids: Int = 16, pqIters: Int = 3,
      rerank: Int = 50): DataFrame = {
    require(nClusters >= 1 && nClusters <= 256 && nProbe >= 1,
      "need 1 <= nClusters <= 256, nProbe >= 1")
    require(m >= 1 && m <= 64 && nCentroids >= 1 && nCentroids <= 256,
      "need m in [1, 64], nCentroids in [1, 256]")
    require(coarseIters >= 0 && pqIters >= 0 && k >= 1 && rerank >= k,
      "need iters >= 0, k >= 1, rerank >= k")
    val e = quantized(corpus, vecCol, idCol)
    val (coarse, books) =
      trainIvfPqShared(e, nClusters, coarseIters, m, nCentroids, pqIters)
    val model = IvfPqModel(coarse, books)
    probeCoded(model, encodeQuantized(model, e), queries, vecCol, idCol,
      k, nProbe, rerank)
  }

  /** A FROZEN IVF-PQ model — the control-plane half of a persisted ANN
    * index: coarse centroids (nClusters ≤ 256 × dim) plus per-subspace PQ
    * codebooks (m × nCentroids ≤ 256 × dim/m). A few hundred KB of driver
    * state at most, broadcast into the encode/probe closures; the
    * data-plane half is the coded corpus frame ([[ivfPqEncode]]) persisted
    * as an ordinary table. Freezing the model is what makes the index
    * INCREMENTAL: a daily delta is encoded under yesterday's codebooks and
    * appended, so ingest cost tracks the delta, never the accumulated
    * corpus ([[ivfPqEncode]] doc).
    */
  final case class IvfPqModel(
      coarse: Array[Array[Double]], books: Array[Array[Array[Double]]]) {
    require(coarse.nonEmpty && coarse.length <= 256,
      "need 1 <= nClusters <= 256")
    require(books.nonEmpty && books.length <= 64 &&
      books.forall(b => b.nonEmpty && b.length <= 256),
      "need m in [1, 64], nCentroids in [1, 256]")
    require(books.forall(_.forall(_.length == books(0)(0).length)),
      "ragged codebooks")
    def m: Int = books.length
    def sub: Int = books(0)(0).length
  }

  /** Train an IVF-PQ model WITHOUT building the index — the seam the
    * incremental-maintenance story needs (train once on the base corpus,
    * freeze, encode deltas forever). Same bounded-sample integer-Lloyd
    * training as [[ivfPqTopK]] (md5-smallest [[TrainSampleSize]] rows,
    * fused coarse+PQ rounds), so training cost is CONSTANT in corpus
    * size and the oracle replays it in SQL.
    */
  def ivfPqTrain(
      corpus: DataFrame, vecCol: String, idCol: String,
      nClusters: Int = 8, coarseIters: Int = 3,
      m: Int = 4, nCentroids: Int = 16, pqIters: Int = 3): IvfPqModel = {
    require(nClusters >= 1 && nClusters <= 256, "need 1 <= nClusters <= 256")
    require(m >= 1 && m <= 64 && nCentroids >= 1 && nCentroids <= 256,
      "need m in [1, 64], nCentroids in [1, 256]")
    require(coarseIters >= 0 && pqIters >= 0, "need iters >= 0")
    val (coarse, books) = trainIvfPqShared(
      quantized(corpus, vecCol, idCol), nClusters, coarseIters, m,
      nCentroids, pqIters)
    IvfPqModel(coarse, books)
  }

  /** [[ivfPqTrain]] + [[ivfPqEncode]] over the SAME corpus in one call,
    * sharing ONE quantized scan/persist between training and encoding —
    * the base-corpus bootstrap of the incremental story (separate calls
    * quantize the corpus twice: each builds its own tracked cache entry).
    * Deltas still encode through [[ivfPqEncode]] with the returned frozen
    * model; results are bit-identical to the two-call composition.
    */
  def ivfPqTrainEncode(
      corpus: DataFrame, vecCol: String, idCol: String,
      nClusters: Int = 8, coarseIters: Int = 3,
      m: Int = 4, nCentroids: Int = 16, pqIters: Int = 3)
      : (IvfPqModel, DataFrame) = {
    require(nClusters >= 1 && nClusters <= 256, "need 1 <= nClusters <= 256")
    require(m >= 1 && m <= 64 && nCentroids >= 1 && nCentroids <= 256,
      "need m in [1, 64], nCentroids in [1, 256]")
    require(coarseIters >= 0 && pqIters >= 0, "need iters >= 0")
    val e = quantized(corpus, vecCol, idCol)
    val (coarse, books) =
      trainIvfPqShared(e, nClusters, coarseIters, m, nCentroids, pqIters)
    val model = IvfPqModel(coarse, books)
    (model, encodeQuantized(model, e))
  }

  /** Encode a corpus — or a DELTA of one — under a FROZEN model:
    * `(neighbor_id, cv, bucket, code, cn)`, the row layout
    * [[ivfPqProbeIndex]] scans and the unit an index table stores.
    *
    * This is the daily-ingest shape for a 100 TB embedding store (the
    * vector twin of the q193 incremental-MinHash pattern): the base
    * corpus is encoded ONCE and persisted; each day only the delta is
    * encoded (a stateless map-only scan over delta rows — no shuffle, no
    * training, no base re-read) and appended to the index table. Because
    * encoding is per-row given the frozen model, delta encoding is
    * bit-identical to what a full re-encode of the union would produce
    * for those rows (SimilaritySpec pins this), so probe results never
    * depend on WHEN a row was ingested.
    */
  def ivfPqEncode(
      model: IvfPqModel, corpus: DataFrame,
      vecCol: String, idCol: String): DataFrame =
    encodeQuantized(model, quantized(corpus, vecCol, idCol))

  private def encodeQuantized(model: IvfPqModel, e: DataFrame): DataFrame = {
    val sub = model.sub
    e.select(col("vid").as("neighbor_id"), col("v").as("cv"),
        nearestCid(col("vq"), col("vv"), model.coarse).as("bucket"),
        array((0 until model.m).map { j =>
          val sl = slice(col("vq"), j * sub + 1, sub)
          nearestCid(sl, V.dot(sl, sl), model.books(j)).cast("long")
        }: _*).as("code"))
      .withColumn("cn", V.norm(col("cv")))
  }

  /** Probe queries against a STORED coded index ([[ivfPqEncode]] rows,
    * possibly a base ∪ deltas union read back from a table) with the
    * model that encoded it: nProbe nearest coarse buckets per query, ADC
    * scoring over the m codes, exact-cosine rerank of the top-`rerank`.
    * Identical semantics to [[ivfPqTopK]]'s probe half — [[ivfPqTopK]]
    * IS train + encode + this.
    */
  def ivfPqProbeIndex(
      model: IvfPqModel, index: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String,
      k: Int, nProbe: Int = 2, rerank: Int = 50): DataFrame = {
    require(nProbe >= 1 && k >= 1 && rerank >= k,
      "need nProbe >= 1, k >= 1, rerank >= k")
    probeCoded(model, index, queries, vecCol, idCol, k, nProbe, rerank)
  }

  /** The model as two bounded tables — `(cid, c)` coarse centroids and
    * `(j, cid, c)` codebooks — so an index survives as ordinary parquet
    * alongside its coded rows. [[ivfPqModelFromTables]] reads them back;
    * both sides are ≤ a few hundred rows (control-plane state).
    */
  def ivfPqModelTables(
      spark: org.apache.spark.sql.SparkSession,
      model: IvfPqModel): (DataFrame, DataFrame) = {
    import spark.implicits._
    val cents = model.coarse.toIndexedSeq.zipWithIndex
      .map { case (c, i) => (i, c.toIndexedSeq) }.toDF("cid", "c")
    val books = (for {
      (book, j) <- model.books.toIndexedSeq.zipWithIndex
      (c, i) <- book.toIndexedSeq.zipWithIndex
    } yield (j, i, c.toIndexedSeq)).toDF("j", "cid", "c")
    (cents, books)
  }

  /** Rebuild a frozen model from its [[ivfPqModelTables]] tables. The
    * collects are control-plane-bounded (≤ 256 + m·256 rows). */
  def ivfPqModelFromTables(
      centroids: DataFrame, codebooks: DataFrame): IvfPqModel = {
    val coarse = centroids.select(col("cid"), col("c"))
      .collect().sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)
    val books = codebooks.select(col("j"), col("cid"), col("c"))
      .collect().groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
      }.toArray
    IvfPqModel(coarse, books)
  }

  /** The 4-hex-digit md5 gate threshold putting ~`(10000 - deltaBps)`
    * basis points of ids into the BASE split (q277's 'cccc' = 8000 bps
    * base). Exact integer arithmetic, so both engines derive the same
    * literal. */
  private[graft] def baseGateHex(deltaBps: Int): String =
    f"${(10000L - deltaBps) * 65536L / 10000L}%04x"

  /** RECALL-DECAY AUDIT for the incremental IVF-PQ index ([[ivfPqEncode]]
    * maintenance): the operational question a daily ingest pipeline must
    * answer is WHEN to retrain — every appended delta was encoded under
    * codebooks that never saw it, so union-index recall decays as the
    * delta share grows. This operator measures the decay curve: for each
    * `deltaBps` (delta share in basis points), split the corpus on the
    * deterministic md5 gate (base keeps ids whose md5 prefix is below
    * [[baseGateHex]] — the q277/q193 split, so every fraction's split is
    * reproducible), train + encode the base, encode the delta under the
    * FROZEN model, probe the union index, and report micro-averaged
    * recall@k against ONE shared brute-force ground truth over the full
    * corpus. Output: `(delta_bps, n_base, n_delta, mean_recall_ppm)`,
    * one row per fraction — read it as "retrain before the delta share
    * where this curve crosses your recall floor".
    *
    * Scale shape: ground truth is computed ONCE on the (sampled) query
    * set; each fraction costs one bounded-sample training (md5-smallest
    * [[TrainSampleSize]] base rows), one map-only encode, and one
    * nProbe-bounded probe — the same plan as q277 per point. The only
    * driver state is one (hits, true) pair per fraction.
    */
  def ivfPqRecallDecay(
      corpus: DataFrame, queries: DataFrame, vecCol: String, idCol: String,
      deltaBps: Seq[Int] = Seq(2000, 5000, 8000), k: Int = 10,
      nClusters: Int = 8, coarseIters: Int = 3,
      m: Int = 4, nCentroids: Int = 16, pqIters: Int = 3,
      nProbe: Int = 2, rerank: Int = 50): DataFrame = {
    require(deltaBps.nonEmpty && deltaBps.forall(b => b >= 1 && b <= 9999),
      "deltaBps must be non-empty with each fraction in [1, 9999]")
    require(k >= 1 && rerank >= k, "need k >= 1, rerank >= k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val exact = bruteForceTopK(queries, corpus, vecCol, idCol, k)
      .materialize // ONE ground truth shared by every fraction
    // the fractions are independent train+encode+probe pipelines over
    // the same inputs — run them as concurrent driver threads (Spark
    // schedules jobs from multiple threads freely); each fraction's
    // result is a single (hits, true, sizes) row, so the only shared
    // driver state is the bounded output list
    def point(bps: Int): (Int, Long, Long, Long) = {
      val gate =
        substring(md5(col(idCol).cast("string")), 1, 4) < lit(baseGateHex(bps))
      // split sizes FIRST: a fraction whose md5 gate matches no ids (tiny
      // corpus, extreme bps) must fail with a named error here, not with
      // the trainer's unrelated nClusters message deep inside
      val sizes = corpus
        .agg(sum(when(gate, 1L).otherwise(0L)), count(lit(1))).head()
      val (nBase, nAll) =
        (if (sizes.isNullAt(0)) 0L else sizes.getLong(0), sizes.getLong(1))
      require(nBase >= 1, s"ivfPqRecallDecay: delta_bps=$bps leaves an " +
        s"empty base split on this corpus ($nAll rows) — lower the fraction")
      val base = corpus.filter(gate)
      val delta = corpus.filter(!gate)
      val (model, baseIndex) = ivfPqTrainEncode(base, vecCol, idCol,
        nClusters, coarseIters, m, nCentroids, pqIters)
      val index = baseIndex.union(ivfPqEncode(model, delta, vecCol, idCol))
      val approx =
        ivfPqProbeIndex(model, index, queries, vecCol, idCol, k, nProbe, rerank)
      val tot = ModelEval.annRecallAtK(approx, exact, k)
        .agg(sum(col("n_true")), sum(col("n_hit"))).head()
      require(!tot.isNullAt(0) && tot.getLong(0) > 0,
        s"ivfPqRecallDecay: no ground-truth rows at delta_bps=$bps — " +
          "the query set is empty or matches no corpus vectors")
      val (nTrue, nHit) = (tot.getLong(0), tot.getLong(1))
      (bps, nBase, nAll - nBase, 1000000L * nHit / nTrue)
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(deltaBps.size)
    val rows = try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(
          deltaBps.map(bps => scala.concurrent.Future(point(bps)))),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
    rows.toDF("delta_bps", "n_base", "n_delta", "mean_recall_ppm")
  }

  /** RETRAIN TRIGGER — the operational decision on top of the
    * [[ivfPqRecallDecay]] curve: given the measured (delta_bps,
    * mean_recall_ppm) curve, a recall floor, and the CURRENT stored
    * index's base/delta composition, emit the maximum safe delta share
    * (piecewise-LINEAR interpolation of the curve, exact integer
    * arithmetic) and the retrain verdict a daily scheduler polls
    * alongside the isotropy/centroid-drift monitors.
    *
    * Semantics (first-crossing, endpoint-clamped):
    *  - let (b_i, r_i) be the curve sorted by delta share and i* the
    *    FIRST point with r < floorPpm;
    *  - no such point → `max_safe_delta_bps` = the largest measured
    *    share, `at_curve_edge` = true (the curve never crosses the
    *    floor INSIDE its measured range — extrapolating beyond it would
    *    be a claim the audit never tested, so the trigger clamps and
    *    says so);
    *  - i* is the first point → max_safe = 0 (the floor is violated
    *    from the smallest measured share on);
    *  - otherwise max_safe = b_{i*-1} +
    *    (b_{i*} − b_{i*-1})·(r_{i*-1} − floor) DIV (r_{i*-1} − r_{i*})
    *    — the integer-floor of the linear crossing, so the verdict
    *    flips EXACTLY at the interpolated boundary (SimilaritySpec pins
    *    the flip at max_safe vs max_safe + 1).
    *  - retrain ⟺ current_delta_bps > max_safe_delta_bps, with
    *    current_delta_bps = (10000·n_delta) DIV n_total.
    *
    * `composition` is the stored coded index with a boolean `is_base`
    * column (the caller knows which rows came from the base encode —
    * partition provenance in the production store). Scale shape: one
    * count aggregation over the index, then pure scalar arithmetic on
    * the ≤ |curve| rows via one-row broadcast crossJoins — no
    * unpartitioned windows, no collects.
    */
  def ivfPqRetrainTrigger(
      curve: DataFrame, composition: DataFrame, floorPpm: Long): DataFrame = {
    require(floorPpm >= 0L && floorPpm <= 1000000L, "floorPpm in [0, 1e6]")
    val c = curve.select(col("delta_bps").cast("bigint").as("b"),
      col("mean_recall_ppm").cast("bigint").as("r"))
    val comp = composition.agg(
        sum(when(col("is_base"), 1L).otherwise(0L)).as("n_base"),
        count(lit(1)).as("n_total"))
      .select(col("n_base"), (col("n_total") - col("n_base")).as("n_delta"),
        col("n_total"))
      .withColumn("current_delta_bps", expr("(10000 * n_delta) DIV n_total"))
    // first curve point below the floor (NULL when the curve never dips)
    val firstFail = c.filter(col("r") < floorPpm)
      .agg(min(col("b")).as("fail_b"))
    // its predecessor: the measured point with the largest share below
    // fail_b (every earlier point has r >= floor by minimality of fail_b)
    val prev = c.crossJoin(broadcast(firstFail))
      .filter(col("fail_b").isNotNull && col("b") < col("fail_b"))
      .agg(max_by(struct(col("b"), col("r")), col("b")).as("p"))
      .select(col("p.b").as("prev_b"), col("p.r").as("prev_r"))
    val failR = c.crossJoin(broadcast(firstFail))
      .filter(col("b") === col("fail_b"))
      .agg(min(col("r")).as("fail_r"))
    val edge = c.agg(max(col("b")).as("edge_b"))
    comp
      .crossJoin(broadcast(firstFail))
      .crossJoin(broadcast(prev))
      .crossJoin(broadcast(failR))
      .crossJoin(broadcast(edge))
      .withColumn("floor_ppm", lit(floorPpm))
      .withColumn("max_safe_delta_bps",
        when(col("fail_b").isNull, col("edge_b"))
          .when(col("prev_b").isNull, lit(0L))
          .otherwise(col("prev_b") +
            expr("((fail_b - prev_b) * (prev_r - floor_ppm)) DIV (prev_r - fail_r)")))
      .withColumn("at_curve_edge", col("fail_b").isNull)
      .withColumn("retrain", col("current_delta_bps") > col("max_safe_delta_bps"))
      .select(col("n_base"), col("n_delta"), col("current_delta_bps"),
        col("floor_ppm"), col("max_safe_delta_bps"), col("at_curve_edge"),
        col("retrain"))
  }

  private def probeCoded(
      model: IvfPqModel, coded: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String,
      k: Int, nProbe: Int, rerank: Int): DataFrame = {
    val coarse = model.coarse
    val books = model.books
    val m = model.m
    val sub = model.sub
    val q = queries
      .select(col(idCol).as("query_id"), V.asDouble(col(vecCol)).as("qv"))
      .withColumn("qvq", micro(col("qv")))
      .withColumn("qvv",
        guardedVv(V.dot(col("qvq"), col("qvq")), col("query_id")))
      .withColumn("qn", V.norm(col("qv")))
      .withColumn("tbl", array((0 until m).map { j =>
        val sl = slice(col("qvq"), j * sub + 1, sub)
        array(books(j).toIndexedSeq.map { c =>
          val cc = c.map(x => x * x).sum
          V.dot(sl, sl) - lit(2.0) * V.dot(sl, lit(c)) + lit(cc)
        }: _*)
      }: _*))
    val probes = q
      .withColumn("pr", array_sort(array(coarse.toIndexedSeq.zipWithIndex.map {
        case (c, i) => packedDist(col("qvq"), col("qvv"), c, i) }: _*)))
      .select(col("query_id"), col("qv"), col("qn"), col("tbl"),
        explode(slice(col("pr"), 1, nProbe)).as("pb"))
      .select(col("query_id"), col("qv"), col("qn"), col("tbl"),
        (col("pb") % 256).cast("int").as("bucket"))
    val scored = coded.join(broadcast(probes), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", aggregate(
        zip_with(col("tbl"), col("code"),
          (t, c) => element_at(t, (c + 1).cast("int"))),
        lit(0.0), (acc, x) => acc + x))
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    val cand = scored.withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= rerank)
      .withColumn("cos", V.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Per-row projection onto the corpus's top principal axis, computed
    * with EXACT integer arithmetic end-to-end — the curation signal
    * behind whitening / dominant-direction outlier filtering ("is this
    * embedding an extreme point along the corpus's main axis of
    * variation?").
    *
    * Three stages, every one engine-portable:
    *  1. Gram matrix G = Σ_rows vq vqᵀ over micro-quantized coords —
    *     ONE corpus scan: a typed Aggregator
    *     ([[graft.functions.VectorAggregates.OuterProductSumAgg]]) folds
    *     each row's upper triangle into a per-partition long array
    *     (grouped on spark_partition_id, so its addExact overflow guard
    *     only ever covers one partition's rows), then the partitions·1
    *     partial rows are exploded and cross-partition-summed in
    *     decimal(38,0) (q93 pattern) — exact at any scale. No n·dim²
    *     row materialization anywhere: the only exploded rows are the
    *     P·dim(dim+1)/2 partial cells (P = input partitions).
    *  2. `iters` rounds of power iteration on the driver over BigInt
    *     (dim ≤ 256, bounded state): w = G·v, sign-fixed so the
    *     smallest index attaining max|w| is positive (deterministic —
    *     power iteration's sign is otherwise arbitrary), then rescaled to
    *     v' = trunc(w · 1e6 / max|w|), components back in [−1e6, 1e6].
    *     Truncating division matches DuckDB's `//` and BigInt `/`, so the
    *     oracle unrolls the loop exactly (the PageRank/BPE pattern).
    *  3. Projection proj = vq · v (≤ dim · 2e6 · 1e6 < 2^53): exact in
    *     codegen'd doubles, broadcast as a literal vector — a shuffle-free
    *     map-only scan, like the classify side of
    *     [[nearestCentroidClassify]].
    *
    * v0 = (1e6, …): fixed, so results are bit-reproducible; the
    * measure-zero case of v0 ⊥ top eigenvector shifts convergence to the
    * next axis, the standard caveat for deterministic seeding.
    */
  def principalAxisProjection(
      embeddings: DataFrame, vecCol: String, idCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 20, "iters in [1, 20]")
    val e = quantized(embeddings, vecCol, idCol)
    val cells = e
      .groupBy(spark_partition_id().as("pid"))
      .agg(graft.functions.VectorAggregates.outerProductSum(col("vq")).as("tri"))
      .select(posexplode(col("tri")).as(Seq("idx", "p")))
      .groupBy(col("idx"))
      .agg(sum(col("p").cast("decimal(38,0)")).as("g"))
      .collect()
    require(cells.nonEmpty, "principalAxisProjection: empty corpus")
    val dim = graft.functions.VectorAggregates.triDim(
      cells.iterator.map(_.getInt(0)).max + 1)
    require(dim <= 256, "principalAxisProjection: dim <= 256 (bounded driver state)")
    val g = Array.fill(dim, dim)(BigInt(0))
    // replay the aggregator's row-major upper-triangle order: idx -> (i, j)
    val ij = (for (i <- 0 until dim; j <- i until dim) yield (i, j)).toArray
    cells.foreach { r =>
      val (i, j) = ij(r.getInt(0))
      val v = BigInt(r.getDecimal(1).toBigInteger)
      g(i)(j) = v
      g(j)(i) = v
    }
    var v = Array.fill(dim)(BigInt(1000000))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim)(i => (0 until dim).map(j => g(i)(j) * v(j)).sum)
      val m = w.map(_.abs).max
      require(m > BigInt(0),
        "principalAxisProjection: G·v vanished (degenerate/zero corpus)")
      val jStar = w.indexWhere(_.abs == m)
      val s = if (w(jStar) < 0) BigInt(-1) else BigInt(1)
      v = w.map(x => x * s * BigInt(1000000) / m) // BigInt `/` truncates, like DuckDB `//`
    }
    // exact-integer window: |proj| <= dim * maxcoord(2^21-ish) * 1e6 —
    // guardedVv already bounds coords, keeping the dot inside f64's 2^53
    val axis = v.map(_.toDouble).toArray
    e.select(col("vid").as("vec_id"),
      V.dot(col("vq"), lit(axis)).cast("long").as("proj_micro2"))
  }

  /** Supervised nearest-centroid (Rocchio) classification over an
    * embedding column: per-label centroids are trained on an
    * md5-hash-gated train split ([[DataPrep.hashSplit]]'s convention —
    * stateless, rerun-stable, portable) and every row is then assigned
    * the label of its nearest centroid by EXACT integer squared distance
    * (micro-quantized coords, ties to the smaller label). The classic
    * embedding-quality baseline for a curation pipeline: cheap to train,
    * fully deterministic, and the per-row `correct` flag aggregates to
    * held-out accuracy for free.
    *
    * Returns `(vec_id, label, in_train, predicted, sq_dist_micro2,
    * correct)`.
    *
    * Scale shape: training is ONE scan + one (label, dim)-keyed
    * aggregation collected as bounded driver state (nLabels × dim longs,
    * the [[trainIntCentroids]] pattern) and broadcast back as literal
    * expressions; classification is a map-only codegen'd scan — no
    * shuffle at all on the predict side, so the operator is two corpus
    * scans total regardless of data volume.
    */
  def nearestCentroidClassify(
      embeddings: DataFrame, vecCol: String, idCol: String, labelCol: String,
      trainBps: Int = 8000): DataFrame = {
    require(trainBps >= 1 && trainBps <= 10000, "trainBps in [1, 10000]")
    // 10000 bps = train-on-everything: the general cut would be the
    // 5-char "10000", which a 4-char bucket compares lexicographically
    // BELOW — the same fixed-width pitfall hashSplit documents
    val inTrain =
      if (trainBps == 10000) lit(1L)
      else (substring(md5(col("vid").cast("string")), 1, 4) <
        lit(f"${trainBps.toLong * 65536 / 10000}%04x")).cast("bigint")
    val base = embeddings.select(col(idCol).cast("bigint").as("vid"),
        col(labelCol).cast("int").as("label"), V.asDouble(col(vecCol)).as("v"))
      .withColumn("vq", micro(col("v")))
      .withColumn("vv", guardedVv(V.dot(col("vq"), col("vq")), col("vid")))
      .withColumn("in_train", inTrain)
    val p = Dedup.persistTracked(base)
    val sums = p.filter(col("in_train") === 1)
      .select(col("label"), posexplode(col("vq")).as(Seq("d", "x")))
      .groupBy(col("label"), col("d"))
      .agg(sum(col("x").cast("long")).as("s"), count(lit(1)).as("cnt"))
      .collect()
    require(sums.nonEmpty, "nearestCentroidClassify: train split is empty")
    val labels = sums.map(_.getInt(0)).distinct.sorted
    require(labels.length <= 256,
      "nearestCentroidClassify: at most 256 labels (packed-distance id space)")
    val dim = sums.map(_.getInt(1)).max + 1
    val idx = labels.zipWithIndex.toMap
    val cents = labels.map(_ => Array.fill(dim)(0.0))
    sums.foreach { r =>
      cents(idx(r.getInt(0)))(r.getInt(1)) =
        Math.floorDiv(r.getLong(2), r.getLong(3)).toDouble
    }
    // labels sorted ascending, so packedDist's smaller-cid tie-break IS
    // the smaller-label tie-break
    val packed = array_min(array(cents.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      packedDist(col("vq"), col("vv"), c, i) }: _*))
    val labArr = array(labels.toIndexedSeq.map(l => lit(l)): _*)
    p.withColumn("pk", packed)
      .select(col("vid").as("vec_id"), col("label"), col("in_train"),
        element_at(labArr, (col("pk") % 256).cast("int") + 1).as("predicted"),
        expr("pk DIV 256").as("sq_dist_micro2"),
        (element_at(labArr, (col("pk") % 256).cast("int") + 1) === col("label"))
          .cast("bigint").as("correct"))
  }

  /** SIMPLIFIED SILHOUETTE (centroid-based, squared-distance) per
    * embedding — the label-coherence audit of an embedding space: is each
    * vector closer to its own label's centroid than to any other's?
    * `sil_ppm = 1e6 · (b² − a²) / max(a², b²)` with a² = squared distance
    * to the own-label centroid and b² = min squared distance to any other
    * label's centroid; positive = coherent, negative = the point sits in
    * another cluster's territory. The deliberate scale choice over the
    * classic pairwise silhouette (which is O(n²) in cluster sizes and
    * cannot run at corpus scale): Hruschka's centroid variant needs ONE
    * aggregation and ONE map-only scan. Squared distances keep every
    * intermediate an exact integer (no sqrt) — any engine reproduces the
    * scores bit-for-bit.
    *
    * All-integer arithmetic: micro-quantized coords, [[Math.floorDiv]]
    * centroid coordinates (the [[nearestCentroidClassify]] convention the
    * q110 oracle replays), exact long squared distances (guarded by
    * `guardedVv`'s 2^50 coordinate-norm cap), and a final
    * decimal(38,0)-cleared DIV — truncation toward zero in both Spark
    * `DIV` and DuckDB `//`, verified for negative silhouettes by the
    * cohenKappa precedent. Both-zero distances (a point ON two coincident
    * centroids) emit 0.
    *
    * Scale shape: training state is nLabels × dim longs on the driver
    * (≤ 256 labels), broadcast back as literal arrays; scoring is a
    * shuffle-free codegen'd scan — two corpus scans total, no join, no
    * all-pairs anything.
    */
  def clusterSilhouette(
      embeddings: DataFrame, vecCol: String, idCol: String,
      labelCol: String): DataFrame = {
    val base = embeddings.select(col(idCol).cast("bigint").as("vid"),
        col(labelCol).cast("int").as("label"), V.asDouble(col(vecCol)).as("v"))
      .withColumn("label", when(col("label").isNotNull, col("label"))
        .otherwise(raise_error(concat(
          lit("clusterSilhouette: null label for vec "), col("vid")))))
      .withColumn("vq", micro(col("v")))
      .withColumn("vv", guardedVv(V.dot(col("vq"), col("vq")), col("vid")))
    val p = Dedup.persistTracked(base)
    val sums = p.select(col("label"), posexplode(col("vq")).as(Seq("d", "x")))
      .groupBy(col("label"), col("d"))
      .agg(sum(col("x").cast("long")).as("s"), count(lit(1)).as("cnt"))
      .collect()
    require(sums.nonEmpty, "clusterSilhouette: empty corpus")
    val labels = sums.map(_.getInt(0)).distinct.sorted
    require(labels.length >= 2,
      "clusterSilhouette: need >= 2 labels (b is a min over OTHER clusters)")
    require(labels.length <= 256,
      "clusterSilhouette: at most 256 labels (bounded driver state)")
    val dim = sums.map(_.getInt(1)).max + 1
    val idx = labels.zipWithIndex.toMap
    val cents = labels.map(_ => Array.fill(dim)(0.0))
    sums.foreach { r =>
      cents(idx(r.getInt(0)))(r.getInt(1)) =
        Math.floorDiv(r.getLong(2), r.getLong(3)).toDouble
    }
    // exact integer squared distance to EVERY label centroid, as one
    // literal-array column; own slot masked to Long.MaxValue for the b2 min
    val dists = array(cents.toIndexedSeq.map { c =>
      val cc = c.map(x => x * x).sum // exact: integer-valued squares
      (col("vv") - lit(2.0) * V.dot(col("vq"), lit(c)) + lit(cc)).cast("long")
    }: _*)
    val labToIdx = map(labels.toIndexedSeq.flatMap(l =>
      Seq(lit(l), lit(idx(l)))): _*)
    p.withColumn("ds", dists)
      .withColumn("oi", element_at(labToIdx, col("label")))
      .withColumn("a2", element_at(col("ds"), col("oi") + 1))
      .withColumn("b2", array_min(transform(col("ds"),
        (x, i) => when(i === col("oi"), lit(Long.MaxValue)).otherwise(x))))
      .select(col("vid").as("vec_id"), col("label"),
        col("a2").as("own_d2_micro2"), col("b2").as("min_other_d2_micro2"),
        when(greatest(col("a2"), col("b2")) === 0L, lit(0L))
          .otherwise(expr(
            """(CAST(1000000 AS DECIMAL(38,0)) *
              |   (CAST(b2 AS DECIMAL(38,0)) - CAST(a2 AS DECIMAL(38,0))))
              | DIV CAST(greatest(a2, b2) AS DECIMAL(38,0))""".stripMargin))
          .as("sil_ppm"))
  }

  /** EMBEDDING ISOTROPY diagnostics — the embedding-health monitor run
    * before an ANN index or a cosine-similarity pipeline trusts a new
    * embedding snapshot: a healthy spread has a mean vector near the
    * origin relative to typical vector energy; a drifting/collapsed
    * encoder concentrates mass in one direction (the known anisotropy
    * failure, where cosine similarity stops discriminating). Exact
    * integers on the repo's micro grid:
    *
    *   μ_d   = (Σ xq_d) DIV n                  (toward-zero per dimension;
    *           NOT floor — differs for negative coordinate sums. This is
    *           deliberately the decimal-DIV convention, unlike
    *           centroidDrift's true floorDiv; both engines agree either
    *           way, the doc just names the convention honestly.)
    *   mean‖x‖² = (Σ ‖xq‖²) DIV n              (micro² units)
    *   anisotropy_ppm = (10⁶·‖μ‖²) DIV mean‖x‖²  (0 = perfectly centered,
    *                    10⁶ = all vectors identical)
    *
    * One row out: `(n_vectors, dim, mean_norm_sq_micro2, mu_norm_sq_micro2,
    * anisotropy_ppm)`; the empty corpus and the all-zero corpus read the
    * −1 sentinel.
    *
    * Scale shape: one corpus scan → a dim-bounded (d, Σ) aggregation
    * (map-side combined posexplode) + a 1-row totals aggregate, joined
    * broadcast — no driver loops, no per-pair work.
    */
  def embeddingIsotropy(
      corpus: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val e = corpus
      .select(col(idCol).cast("bigint").as("vid"),
        V.asDouble(col(vecCol)).as("v"))
      .withColumn("vq", micro(col("v")))
      .withColumn("vv", guardedVv(V.dot(col("vq"), col("vq")), col("vid")))
    val tot = e.agg(count(lit(1)).as("n"),
      coalesce(sum(col("vv").cast("decimal(38,0)")), lit(0).cast("decimal(38,0)"))
        .as("svv"),
      coalesce(max(size(col("vq"))), lit(0)).cast("bigint").as("dim"))
    val mu2 = e.select(posexplode(col("vq")).as(Seq("d", "x")))
      .groupBy(col("d")).agg(sum(col("x").cast("long")).as("s"))
      .crossJoin(broadcast(tot.select(col("n").as("__n"))))
      .select(expr("CAST(s AS DECIMAL(38,0)) DIV __n").as("mu"))
      .agg(coalesce(sum(expr("mu * mu")), lit(0).cast("decimal(38,0)"))
        .as("mu2"))
    tot.crossJoin(broadcast(mu2))
      .select(col("n").as("n_vectors"), col("dim"),
        when(col("n") === 0L, lit(-1L))
          .otherwise(expr("CAST(svv DIV n AS BIGINT)"))
          .as("mean_norm_sq_micro2"),
        when(col("n") === 0L, lit(-1L))
          .otherwise(expr("CAST(mu2 AS BIGINT)")).as("mu_norm_sq_micro2"),
        when(col("n") === 0L || expr("svv DIV n") === 0L, lit(-1L))
          .otherwise(expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * mu2) DIV (svv DIV n) AS BIGINT)"))
          .as("anisotropy_ppm"))
  }

  /** JOHNSON–LINDENSTRAUSS random-projection DISTORTION audit — before
    * shipping a cheaper k-dim projection of the embedding corpus (ANN
    * pre-filter, sketch storage, bandwidth), measure how well ±1
    * projections preserve pairwise squared distances on a deterministic
    * probe set (consecutive ids, one pair per adjacent id — corpus-sized,
    * never all-pairs). For the ±1 family E[‖Pv‖²] = k·‖v‖², so
    *
    *   distortion_ppm = (10⁶ · d²_proj) DIV (k · d²_orig)
    *
    * reads 10⁶ when the projection preserves the pair's distance exactly
    * and the spread around 10⁶ quantifies the JL error at this k (−1
    * sentinel for coincident originals).
    *
    * Exactness: vectors quantize to micro Longs; each projection is the
    * codegen'd [[VectorFunctions.dot]] against a ±1 literal plane
    * ([[VectorFunctions.md5Planes]] — engine-portable, derived per
    * MATRIX CELL from md5, never stored), accumulated left-to-right over
    * exact-integer doubles, so every projection, vv, and cross dot is an
    * EXACT integer in both engines (|p_j| ≤ dim·max|x|_micro ≪ 2⁵³);
    * squared differences then sum in BIGINT and only the final ppm
    * division (decimal-routed) truncates.
    *
    * Scale shape: one corpus scan computes k projections + vv per row
    * (k·dim multiply-adds inside whole-stage codegen); the probe join is
    * an equi-join on id+1 (1-to-1, shuffle-partitioned, no windows, no
    * all-pairs); everything downstream is per-pair arithmetic.
    */
  def jlDistortion(
      corpus: DataFrame, vecCol: String, idCol: String,
      planes: Seq[Seq[Double]]): DataFrame = {
    require(planes.nonEmpty && planes.size <= 63,
      "jlDistortion: 1..63 planes")
    require(planes.forall(_.forall(x => x == 1.0 || x == -1.0)),
      "jlDistortion: planes must be +-1 (the portable md5Planes family)")
    val k = planes.size
    val e = corpus
      .select(col(idCol).cast("bigint").as("vid"),
        V.asDouble(col(vecCol)).as("v"))
      .withColumn("vq", micro(col("v")))
      .withColumn("vv", V.dot(col("vq"), col("vq")).cast("bigint"))
      .withColumn("proj", array(planes.map(p =>
        V.dot(col("vq"), typedlit(p)).cast("bigint")): _*))
      .select(col("vid"), col("vq"), col("vv"), col("proj"))
    val a = e.select(col("vid").as("id_a"), col("vq").as("vqa"),
      col("vv").as("vva"), col("proj").as("pa"))
    val b = e.select(col("vid").as("id_b"), col("vq").as("vqb"),
      col("vv").as("vvb"), col("proj").as("pb"))
    a.join(b, col("id_b") === col("id_a") + lit(1L))
      .withColumn("dab", V.dot(col("vqa"), col("vqb")).cast("bigint"))
      .withColumn("d2_orig",
        col("vva") + col("vvb") - lit(2L) * col("dab"))
      .withColumn("d2_proj",
        aggregate(zip_with(col("pa"), col("pb"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, x) => acc + x))
      .select(col("id_a"), col("id_b"), col("d2_orig"), col("d2_proj"),
        when(col("d2_orig") === 0L, lit(-1L))
          .otherwise(expr(
            s"""CAST((CAST(1000000 AS DECIMAL(38,0)) * d2_proj)
               |  DIV ($k * d2_orig) AS BIGINT)""".stripMargin))
          .as("distortion_ppm"))
  }

  /** CENTROID DRIFT between two embedding snapshots — the retrain /
    * re-ingest monitor next to [[embeddingIsotropy]]'s single-snapshot
    * health gate: per label, how far did the class centroid MOVE
    * (cosine between old and new centroids, L2 shift) and how did its
    * magnitude change. A cosine dropping below ~0.99 or a shift
    * comparable to the centroid norm says downstream ANN indexes,
    * nearest-centroid routers, and cached neighbors are stale.
    *
    * Exactness: vectors quantize to micro Longs, per-label centroids are
    * exact floorDiv per dimension (the q110/q162 convention), and the
    * resulting integer-valued f64 arrays feed one dot/sqrt/divide
    * rounded to 6 decimals (cosine, the q35 convention) — the squared
    * sums stay below 2⁵³ so both engines see EXACT integers before the
    * one sqrt. Labels present in only one snapshot emit no row (the
    * count columns on the q213 class-balance report catch those);
    * zero-norm centroids read the −2 cosine sentinel.
    *
    * Scale shape: per snapshot ONE posexplode → (label, dim) aggregation
    * with map-side combine, then a label-keyed collect_list bounded by
    * the DIMENSION (never rows); the join is |labels|-sized. Nothing
    * collects to the driver.
    */
  def centroidDrift(
      a: DataFrame, b: DataFrame, vecCol: String,
      labelCol: String): DataFrame = {
    def centroids(df: DataFrame) =
      df.select(col(labelCol).cast("int").as("label"),
          transform(V.asDouble(col(vecCol)),
            x => round(x * 1e6).cast("bigint")).as("vq"))
        .select(col("label"), posexplode(col("vq")).as(Seq("d", "x")))
        .groupBy(col("label"), col("d"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("cnt"))
        .withColumn("cd",
          expr("CAST((s - ((s % cnt + cnt) % cnt)) DIV cnt AS DOUBLE)"))
        .groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("d"), col("cd")))),
          p => p.getField("cd")).as("c"), max(col("cnt")).as("n"))
    val ca = centroids(a)
      .select(col("label"), col("c").as("ca"), col("n").as("n_a"))
    val cb = centroids(b)
      .select(col("label"), col("c").as("cb"), col("n").as("n_b"))
    ca.join(cb, Seq("label"))
      .withColumn("na", V.norm(col("ca")))
      .withColumn("nb", V.norm(col("cb")))
      .select(col("label"), col("n_a"), col("n_b"),
        when(col("na") === 0.0 || col("nb") === 0.0, lit(-2.0))
          .otherwise(round(V.dot(col("ca"), col("cb")) /
            (col("na") * col("nb")), 6))
          .as("cos_centroid"),
        round(V.norm(zip_with(col("ca"), col("cb"), (x, y) => x - y)))
          .cast("bigint").as("shift_micro"),
        round(col("na")).cast("bigint").as("norm_a_micro"),
        round(col("nb")).cast("bigint").as("norm_b_micro"))
  }
}

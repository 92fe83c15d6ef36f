package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
}

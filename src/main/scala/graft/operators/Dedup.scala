package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Deduplication operators for the training-data pipeline.
  *
  * Scale design (the 100 TB contract):
  *  - exact dedup is a hash aggregation on the dedup key — one shuffle,
  *    partial map-side combine for free;
  *  - MinHash-LSH never compares all pairs: docs are exploded to
  *    (band-key, doc) and only same-bucket docs meet, so the join cost is
  *    sum over buckets of |bucket|^2, not |corpus|^2;
  *  - SimHash uses 4x16-bit pigeonhole bands: hamming<=3 guarantees at
  *    least one identical band, so candidate generation is again an
  *    equi-join, not a cross join;
  *  - embedding near-dup buckets by sign-LSH signature before the exact
  *    cosine check.
  */
object Dedup {

  /** Exact dedup: one representative (min id) per identical `key` value. */
  def exact(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** (id, distinct HASHED shingle set) projection, staged so each array is
    * computed exactly once per row: tokens -> per-token xxhash64 -> codegen
    * rolling k-window chain hash -> distinct. Shingle STRINGS are never
    * materialized — Jaccard/MinHash only need set identity, which 64-bit
    * hashes preserve up to negligible collision odds, and the downstream
    * explode/join shuffles 8-byte longs instead of ~30-byte strings.
    */
  private[graft] def shingleSets(
      docs: DataFrame, textCol: String, idCol: String, shingleK: Int): DataFrame =
    docs
      .withColumn("__tok", T.hashAll(T.tokens(col(textCol))))
      .withColumn("__sh", array_distinct(
        org.apache.spark.sql.graftvec.TextExprs.shingleHashCol(col("__tok"), shingleK)))
      .select(col(idCol).as("doc"), col("__sh").as("sh"))

  /** LSH banding candidates from an (doc, sh) shingle-set frame. */
  private def lshCandidatesFromSets(
      sets: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = sets
      .withColumn("sig", T.minhashSignatureFromHashes(col("sh"), bands * rowsPerBand))
      .select(col("doc"), posexplode(T.lshBandKeys(col("sig"), bands, rowsPerBand)).as(Seq("band", "bkey")))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard verification of candidate pairs from an (doc, sh) frame. */
  private def jaccardVerifyFromSets(
      candidates: DataFrame, sets: DataFrame, threshold: Double): DataFrame = {
    val s = sets.select(col("doc").as("jid"), col("sh"))
    candidates
      .join(s.withColumnsRenamed(Map("jid" -> "jid_a", "sh" -> "sh_a")), col("id_a") === col("jid_a"))
      .join(s.withColumnsRenamed(Map("jid" -> "jid_b", "sh" -> "sh_b")), col("id_b") === col("jid_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** All candidate near-dup pairs from MinHash-LSH banding (id_a < id_b),
    * deduplicated across bands. `sigLen = bands * rowsPerBand` hashes.
    */
  def minhashLshCandidates(
      docs: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 5, bands: Int = 16, rowsPerBand: Int = 4): DataFrame =
    lshCandidatesFromSets(shingleSets(docs, textCol, idCol, shingleK), bands, rowsPerBand)

  /** Exact word-k-shingle Jaccard for given pairs (verification stage). */
  def jaccardVerify(
      candidates: DataFrame, docs: DataFrame, textCol: String, idCol: String,
      shingleK: Int, threshold: Double): DataFrame =
    jaccardVerifyFromSets(
      candidates, shingleSets(docs, textCol, idCol, shingleK), threshold)

  /** MinHash-LSH near-dup pairs with exact Jaccard verification.
    *
    * The shingle index is built ONCE and persisted for the run: lazy
    * evaluation would otherwise re-scan the tokenize->hash->distinct
    * pipeline for the banding stage and for EACH side of the verify join
    * (3x the dominant corpus scan). At production scale the index would
    * be materialized to storage instead; MEMORY_AND_DISK is the local
    * equivalent (it spills rather than OOMs).
    */
  def minhashNearDups(
      docs: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 5, threshold: Double = 0.8,
      bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val sets = shingleSets(docs, textCol, idCol, shingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    jaccardVerifyFromSets(
      lshCandidatesFromSets(sets, bands, rowsPerBand), sets, threshold)
  }

  /** Exact n-gram Jaccard near-dup pairs via an INVERTED-INDEX join: docs
    * explode to (shingle, doc) and only docs sharing a shingle ever meet —
    * cost is sum over shingles of |postings|^2, not |corpus|^2. This is the
    * exact (non-probabilistic) dedup reference; MinHash-LSH approximates it
    * with a bounded signature instead of the full shingle set.
    */
  def ngramJaccardPairs(
      docs: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 5, threshold: Double = 0.8): DataFrame = {
    val sets = shingleSets(docs, textCol, idCol, shingleK)
    val posting = sets.select(col("doc"), col("sh"), explode(col("sh")).as("s"))
      .select(col("doc"), size(col("sh")).as("sz"), col("s"))
    val a = posting.as("a")
    val b = posting.as("b")
    a.join(b, col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(count(lit(1)).cast("double").as("inter"))
      .withColumn("jaccard", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** SimHash near-dup pairs: hamming(sig_a, sig_b) <= maxHamming.
    * Pigeonhole banding into 4x16-bit chunks makes candidate generation an
    * equi-join (any pair with hamming <= 3 shares at least one chunk).
    */
  def simhashNearDups(
      docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSig = docs.select(col(idCol).as("doc"), T.simhash64(col(textCol)).as("sig"))
    val banded = withSig.select(
      col("doc"), col("sig"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("band", "chunk")))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        T.hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over a near-dup pair list (id_a, id_b):
    * min-label propagation to a fixpoint. Each iteration joins the
    * current labels across the edge list and keeps the minimum —
    * O(component diameter) DataFrame iterations, each a pair of
    * shuffles. Near-dup clusters have tiny diameters (usually 1-2), so
    * 2-3 iterations converge; a pathological chain longer than `maxIter`
    * THROWS rather than silently returning split labels (for graphs with
    * genuinely long chains, switch to a pointer-doubling/large-star
    * formulation before raising maxIter).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .cache()
    // cache the seed labels too: each iteration references `labels` three
    // times (neighbor join, update join, convergence check) and an uncached
    // seed would re-run the edge-distinct shuffle for each reference
    var cached = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("comp", col("id"))
      .cache()
    var labels = cached
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // neighbor's label via the edge list, keep the min of (own, neighbors)
      val viaEdges = edges
        .join(labels.withColumnsRenamed(Map("id" -> "dst", "comp" -> "ncomp")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("ncomp")).as("mincomp"))
      // carry the previous label alongside the new one so convergence is a
      // filter over THIS cached frame — no third join, no extra shuffle
      val next = labels.join(viaEdges, Seq("id"), "left")
        .select(col("id"), col("comp").as("oldcomp"),
          least(col("comp"), coalesce(col("mincomp"), col("comp"))).as("comp"))
        .cache()
      val changed = next.filter(col("comp") =!= col("oldcomp")).count()
      cached.unpersist()
      cached = next
      labels = next.select("id", "comp")
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIter iterations " +
        "(component diameter exceeds maxIter); see scaladoc")
    labels
  }

  /** Keep one representative (min id) per near-dup cluster: every doc not
    * in any pair keeps itself; clustered docs keep the cluster minimum.
    */
  def keepRepresentatives(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs)
    docs.join(comps.withColumnsRenamed(Map("id" -> idCol)), Seq(idCol), "left")
      .withColumn("component", coalesce(col("comp"), col(idCol)))
      .drop("comp")
      .withColumn("keep", col(idCol) === min(col(idCol)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("component"))))
  }

  /** Embedding near-dup pairs: cosine >= threshold. `bucketed=true` prunes
    * the pair space by sign-LSH signature equality (scale path — only
    * near-identical directions collide on all sign bits); `false` is the
    * exact all-pairs reference used by the oracle at test scale.
    */
  def embeddingNearDups(
      emb: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.95, bucketed: Boolean = false, lshBits: Int = 16): DataFrame = {
    // cast + norm ONCE per row before the pairwise join; the per-pair work
    // is then a single codegen'd dot product
    val base = emb.select(col(idCol).as("vid"), V.asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", V.norm(col("v")))
    val withB =
      if (bucketed) base.withColumn("bucket", V.signLshSignature(col("v"), lshBits))
      else base.withColumn("bucket", lit(0L))
    val a = withB.as("a")
    val b = withB.as("b")
    val joined =
      if (bucketed)
        a.join(b, col("a.bucket") === col("b.bucket") && col("a.vid") < col("b.vid"))
      else a.join(b, col("a.vid") < col("b.vid"))
    joined
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"),
        (V.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine"))
  }
}

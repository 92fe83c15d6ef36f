package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed daily-ingest FRONT DOOR: one decide() body that takes a
  * batch of new documents and emits a per-document keep/drop verdict by
  * running the four curation stages a pre-training pipeline gates new
  * data with, in funnel order —
  *
  *   1. Gopher quality rules ([[Curation.gopherRules]], the word-count /
  *      mean-word-length / alpha-ratio conjunction `pipeline_full` uses)
  *   2. near-dup against the STORED corpus fingerprint index
  *      ([[Dedup.minhashNearDupsAgainstBase]] — delta×base and
  *      delta×delta only; the base×base pair space is never touched)
  *   3. benchmark decontamination against a frozen merged bloom filter
  *      ([[TextPipeline.bloomProbe]], map-only broadcast probe)
  *   4. CCNet-style LM quality gate under a frozen unigram model
  *      ([[TextPipeline.unigramServe]], map-only broadcast scores)
  *
  * Later stages run ONLY on earlier stages' survivors (the funnel is the
  * cost structure: the cheap map-only gates shield the join-bearing dedup
  * stage's survivors from the LM's DP), and every input document gets
  * exactly one row with the first failing stage as its `verdict`. Stage
  * columns a document never reached are NULL, so the decision log
  * distinguishes "evaluated and passed" from "never evaluated".
  *
  * Dedup semantics are FIRST-ARRIVAL-WINS, the only semantics an
  * incremental front door can have: a document is a near-dup iff it
  * collides (exact word-shingle Jaccard >= threshold, LSH-pruned) with
  * anything already fingerprinted — the stored base, or an
  * earlier-arriving document of the same delta. The batch body realizes
  * "earlier" as smaller id (`id_a < id_b` inside the delta), so the
  * streaming twin ([[graft.streaming.StreamingCurationFunnel]]) matches
  * it row-for-row when arrival order is id order. Documents flagged as
  * dups (or later dropped by bloom/LM) still ENTER the fingerprint
  * index: they were seen, and a third copy arriving tomorrow must match
  * the earliest fingerprint, not re-litigate against only the kept one —
  * this is what makes the greedy rule associative across micro-batches.
  *
  * 100 TB shape: stages 1/3/4 are map-only over the delta (broadcast
  * bloom words + broadcast score map, zero shuffles); stage 2 shuffles
  * the delta's banded signatures against the stored index's — the cost
  * is delta-sized, never corpus-sized, because the base index arrives
  * pre-built (a stored parquet table of (doc, sh) fingerprints, exactly
  * the [[Dedup.buildShingleIndex]] schema).
  */
object CurationFunnel {

  /** The funnel's frozen artifacts + thresholds: everything decide()
    * needs beyond the batch itself. Bloom and LM are typed models
    * ([[TextPipeline.BloomModel]] / [[TextPipeline.UnigramModel]]) so
    * probe/serve geometry cannot drift from build/train geometry.
    */
  final case class FunnelModel(
      bloom: TextPipeline.BloomModel,
      lm: TextPipeline.UnigramModel,
      maxNllMicro: Long,
      minWords: Int = 20,
      maxWords: Int = 100000,
      shingleK: Int = 5,
      threshold: Double = 0.8,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      minShared: Int = 1) {
    require(maxNllMicro > 0, "maxNllMicro must be positive micro-nats")
    // minWords >= 1 guarantees every gated document has tokens, so the
    // LM stage emits a row for every document that reaches it (decide()
    // relies on this to make lm_keep non-null exactly on LM-evaluated docs)
    require(minWords >= 1 && maxWords >= minWords,
      "need 1 <= minWords <= maxWords")
    require(shingleK >= 1 && bands >= 1 && rowsPerBand >= 1 && minShared >= 1,
      "shingleK, bands, rowsPerBand, minShared must be >= 1")
    require(threshold > 0 && threshold <= 1, "threshold in (0, 1]")
  }

  /** Run the funnel over one batch of documents against a stored
    * fingerprint index (the [[Dedup.buildShingleIndex]] (doc, sh)
    * schema; pass an empty frame of that schema for a cold start).
    *
    * Returns (decisions, deltaIndex):
    *  - decisions — one row per input document:
    *    (doc, gopher_pass, near_dup, contaminated, lm_keep, nll_micro,
    *    keep, verdict) where verdict in
    *    {gopher, near_dup, contaminated, lm_gate, kept}, keep =
    *    (verdict = kept), and each stage column is NULL iff an earlier
    *    stage already dropped the document.
    *  - deltaIndex — the gated documents' fingerprints, the rows the
    *    caller appends to the stored index so tomorrow's batch dedups
    *    against today's arrivals.
    *
    * Doc ids must be unique within the batch and disjoint from the base
    * index (it is a log of already-ingested ids).
    */
  def decide(
      batch: DataFrame, textCol: String, idCol: String,
      baseIndex: DataFrame, model: FunnelModel): (DataFrame, DataFrame) = {
    // every stage and the final assembly re-derive from the batch; without
    // these two tracked persists the gopher pass (regex-heavy HOF work)
    // re-runs up to 6x — once per stage input plus the decision join
    // (registered for the ambient Dedup cache scope, like the indexes)
    // coalesce: a NULL text yields NULL rule flags (size(NULL) is NULL),
    // and a NULL gopher_pass would fall through every verdict arm to
    // "kept" with keep=false — an un-evaluated document logged as kept.
    // NULL text is a gopher drop, not a pass-through.
    val flags = Dedup.persistTracked(Curation
      .gopherRules(batch, textCol, idCol, model.minWords, model.maxWords)
      .select(col("doc"),
        coalesce(col("f_words") && col("f_mean_len") && col("f_alpha"),
          lit(false)).as("gopher_pass")))
    val gated = Dedup.persistTracked(batch.join(
      flags.filter(col("gopher_pass")).select(col("doc").as(idCol)),
      Seq(idCol), "left_semi"))

    // stage 2: fingerprint the gated delta once; the SAME frame feeds the
    // banding, the exact verify, and the caller's index append (it is
    // persisted inside minhashNearDupsAgainstBase, registered for the
    // ambient Dedup cache scope)
    val deltaIndex =
      Dedup.buildShingleIndex(gated, textCol, idCol, model.shingleK)
    // dupIds feeds surv1's anti-join, the decision join, AND (through
    // surv1/surv2) the bloom and LM subtrees — persist the tiny id frame
    // so the banding + verify join subtree runs once, not wherever plan
    // canonicalization fails to reuse it (conIds likewise, 2 uses)
    val dupIds = Dedup.persistTracked(Dedup
      .minhashNearDupsAgainstBase(baseIndex, deltaIndex,
        model.threshold, model.bands, model.rowsPerBand)
      .select(col("id_b").as("doc")).distinct()
      .withColumn("__dup", lit(true)))
    val surv1 = gated.join(
      dupIds.select(col("doc").as(idCol)), Seq(idCol), "left_anti")

    // stage 3: broadcast bloom probe, map-only over dedup survivors
    val conIds = Dedup.persistTracked(TextPipeline
      .bloomProbe(surv1, model.bloom, textCol, idCol, model.minShared)
      .select(col("doc")).withColumn("__con", lit(true)))
    val surv2 = surv1.join(
      conIds.select(col("doc").as(idCol)), Seq(idCol), "left_anti")

    // stage 4: unigram serve via the vocabulary join — the DP runs per
    // DISTINCT surviving word, not per token instance (every surv2 doc
    // has >= minWords tokens, so the serve emits a row for each —
    // lm_keep is non-null exactly on LM-evaluated documents)
    val lm = TextPipeline
      .unigramServeByVocab(surv2, textCol, idCol, model.lm, model.maxNllMicro)
      .select(col("doc"), col("nll_micro"), col("keep").as("__lmk"))

    val decisions = flags
      .join(dupIds, Seq("doc"), "left")
      .join(conIds, Seq("doc"), "left")
      .join(lm, Seq("doc"), "left")
      .select(
        col("doc"),
        col("gopher_pass"),
        when(col("gopher_pass"), coalesce(col("__dup"), lit(false)))
          .as("near_dup"),
        when(col("gopher_pass") && !coalesce(col("__dup"), lit(false)),
            coalesce(col("__con"), lit(false)))
          .as("contaminated"),
        col("__lmk").as("lm_keep"),
        col("nll_micro"),
        coalesce(col("__lmk"), lit(false)).as("keep"),
        when(!col("gopher_pass"), lit("gopher"))
          .when(coalesce(col("__dup"), lit(false)), lit("near_dup"))
          .when(coalesce(col("__con"), lit(false)), lit("contaminated"))
          .when(!col("__lmk"), lit("lm_gate"))
          .otherwise(lit("kept"))
          .as("verdict"))
    (decisions, deltaIndex)
  }
}

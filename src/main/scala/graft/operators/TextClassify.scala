package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Token-level text classification — the trainable cousin of the
  * stopword-ratio language-ID heuristic (`TextPipeline.languageId`) and
  * the embedding-space nearest-centroid classifier
  * (`Similarity.nearestCentroidClassify`): a multinomial Naive Bayes
  * model trained and served entirely inside the engine. A corpus
  * pipeline uses this as the cheap first-pass router (language, domain,
  * quality tier) before anything expensive runs; the audit loop closes
  * through `ModelEval.classificationReport` on the held-out split.
  *
  * Exactness contract (the q74/q82 ln convention): every log-probability
  * is rounded to integer MICRO-NATS at the vocabulary-table level —
  * `w(c,t) = round(1e6 · ln((cnt(c,t)+1)/(N_c+V)))` — so document scores
  * are exact integer sums of a deterministic weight table and the argmax
  * (ties → smallest class label) is bit-reproducible at any parallelism
  * in any engine. The one `ln` per (class, term) cell carries the usual
  * 1-ulp libm caveat, corpus-validated per SF.
  */
object TextClassify {

  /** Multinomial Naive Bayes with add-1 (Laplace) smoothing over
    * whitespace tokens, md5-hash-gated train/test split (the
    * `DataPrep.hashSplit` convention, same gate as
    * `nearestCentroidClassify`). Returns one row per TEST document:
    * `(did, y, predicted)` — actual and predicted label.
    *
    * Model:
    *   score(d, c) = round(1e6·ln(docs_c/docs)) + Σ_{t ∈ d} w(c, t)
    *   w(c, t)     = round(1e6·ln((cnt(c,t)+1) / (N_c + V)))
    * with `cnt(c,t)` token occurrences of `t` in class-c train docs,
    * `N_c` total class-c train tokens, `V` the train vocabulary size.
    * Tokens outside the train vocabulary are SKIPPED (no weight row
    * exists) — the standard open-vocabulary convention; a test doc with
    * zero in-vocabulary tokens falls back to the prior argmax.
    *
    * Scale shape (driver holds only the |classes|-bounded prior table —
    * the IVF-centroid bounded-state pattern; corpus data never leaves
    * the cluster):
    *  - training is one explode + (class, term) count with map-side
    *    combine, plus three class-bounded aggregates;
    *  - the weight table is the DENSE vocab×classes grid (absent cells
    *    get the smoothed floor — absence from a class is evidence, the
    *    chiSquareTerms a=0 rule) built by a vocab-sized cross join with
    *    the tiny class table;
    *  - serving joins exploded test tokens to the grid ON TERM (shuffle
    *    hash join keyed by term; per-occurrence fan-out = |classes|,
    *    never |vocab|), aggregates (doc, class) partial sums, then joins
    *    the tiny prior table and takes one per-doc window argmax over
    *    |classes| rows. A stop-word-heavy corpus skews the term join the
    *    same way it skews the count — both absorb it in map-side partial
    *    aggregation.
    */
  def naiveBayesPredict(
      docs: DataFrame, textCol: String, idCol: String, labelCol: String,
      trainBps: Int = 8000): DataFrame = {
    require(trainBps >= 1 && trainBps <= 9999,
      "naiveBayesPredict: trainBps in [1, 9999] (a held-out test split must exist)")
    val gate = f"${trainBps.toLong * 65536 / 10000}%04x"
    val base = docs.select(col(idCol).cast("bigint").as("did"),
        col(labelCol).cast("string").as("y"),
        T.tokens(col(textCol)).as("toks"))
      .withColumn("tr",
        (substring(md5(col("did").cast("string")), 1, 4) < lit(gate))
          .cast("int"))
    val tok = base.select(col("did"), col("y"), col("tr"),
      explode(col("toks")).as("t"))
    // (class, term) occurrence counts over the train split — the model
    val cnt = tok.filter(col("tr") === 1)
      .groupBy(col("y"), col("t")).agg(count(lit(1)).as("c"))
    val cntP = Dedup.persistTracked(cnt)
    // class-bounded scalars collected ONCE to the driver (the IVF-centroid
    // bounded-driver-state pattern — |classes| rows, never corpus data)
    // and re-entered as literals. All three aggregates ship as ONE tagged
    // union — one Spark job, not three: with a vocabulary this operator
    // is codegen/scheduling-bound locally, and every extra action is a
    // serial stage cascade
    val scalars = base.filter(col("tr") === 1).groupBy(col("y"))
      .agg(count(lit(1)).as("v")).select(lit("cls").as("tag"), col("y"), col("v"))
      .unionByName(cntP.groupBy(col("y")).agg(sum(col("c")).as("v"))
        .select(lit("ny").as("tag"), col("y"), col("v")))
      .unionByName(cntP.select(col("t")).distinct()
        .agg(count(lit(1)).as("v"))
        .select(lit("voc").as("tag"), lit("").as("y"), col("v")))
      .collect()
    val clsRows = scalars.filter(_.getString(0) == "cls")
      .map(r => (r.getString(1), r.getLong(2)))
    require(clsRows.nonEmpty, "naiveBayesPredict: train split is empty")
    require(clsRows.length <= 10000,
      "naiveBayesPredict: at most 10000 classes (driver-held class table)")
    val nyRows = scalars.filter(_.getString(0) == "ny")
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val vocV = scalars.find(_.getString(0) == "voc").get.getLong(2)
    val nTrain = clsRows.map(_._2).sum
    // prior + per-class smoothing constants as LITERALS (classes-bounded
    // driver maps) — every downstream use is a map lookup or a literal
    // explode, never a join: at local scale this operator is stage-count
    // bound, and each avoided exchange is one fewer serial AQE job
    val classes = clsRows.map(_._1).sorted.toSeq
    val nyLit = typedLit(nyRows)
    val priorPairs = clsRows.map { case (y, nd) =>
      (y, math.round(math.log(nd.toDouble / nTrain) * 1e6))
    }.toSeq.sortBy(_._1)
    // dense vocab × classes weight grid in ONE aggregation: per term a
    // class→count map, exploded over the literal class list; absent
    // (class, term) cells take the smoothed floor ln(1/(N_c+V))
    val grid = cntP.groupBy(col("t"))
      .agg(map_from_entries(collect_list(struct(col("y"), col("c")))).as("m"))
      .select(col("t"), explode(typedLit(classes)).as("y"), col("m"))
      .select(col("t"), col("y"),
        round(log((coalesce(element_at(col("m"), col("y")), lit(0L)) + lit(1.0))
          / (element_at(nyLit, col("y")) + lit(vocV))) * lit(1e6))
          .cast("bigint").as("w"))
    // serve the held-out split: token → grid join keyed by term, then
    // (doc, class) partial sums, literal-prior explode, per-doc argmax
    // as min(struct(-score, cand)) — an aggregate with map-side combine,
    // not a window sort
    val ts = tok.filter(col("tr") === 0).select(col("did"), col("t"))
      .join(grid, Seq("t"))
      .groupBy(col("did"), col("y"))
      .agg(sum(col("w")).as("s"))
      .select(col("did"), col("y").as("cand"), col("s"))
    val test = base.filter(col("tr") === 0).select(col("did"), col("y"))
    val scored = test
      .select(col("did"), col("y"), explode(typedLit(priorPairs)).as("pp"))
      .select(col("did"), col("y"), col("pp._1").as("cand"), col("pp._2").as("pw"))
      .join(ts, Seq("did", "cand"), "left")
      .select(col("did"), col("y"), col("cand"),
        (col("pw") + coalesce(col("s"), lit(0L))).as("score"))
    scored.groupBy(col("did"))
      .agg(first(col("y")).as("y"),
        min(struct((-col("score")).as("ns"), col("cand"))).as("best"))
      .select(col("did"), col("y"), col("best.cand").as("predicted"))
  }
}

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
    * Scale shape (nothing touches the driver):
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
    val p = Dedup.persistTracked(base)
    val tok = p.select(col("did"), col("y"), col("tr"),
      explode(col("toks")).as("t"))
    // (class, term) occurrence counts over the train split — the model
    val cnt = tok.filter(col("tr") === 1)
      .groupBy(col("y"), col("t")).agg(count(lit(1)).as("c"))
    val cntP = Dedup.persistTracked(cnt)
    // class-bounded scalars: train docs per class, total train tokens per
    // class; vocab size V is a 1-row aggregate crossed in
    val cls = p.filter(col("tr") === 1).groupBy(col("y"))
      .agg(count(lit(1)).as("nd"))
    val ny = cntP.groupBy(col("y")).agg(sum(col("c")).as("nt"))
    val voc = cntP.select(col("t")).distinct().agg(count(lit(1)).as("v"))
    val prior = cls.join(ny, Seq("y"))
      .crossJoin(p.filter(col("tr") === 1).agg(count(lit(1)).as("n")))
      .crossJoin(voc)
      .select(col("y"), col("nt"), col("v"),
        round(log(col("nd").cast("double") / col("n")) * lit(1e6))
          .cast("bigint").as("pw"))
    // dense vocab × classes weight grid; absent (class, term) cells take
    // the smoothed floor ln(1/(N_c+V))
    val grid = cntP.select(col("t")).distinct()
      .crossJoin(broadcast(prior.select(col("y"), col("nt"), col("v"))))
      .join(cntP, Seq("y", "t"), "left")
      .select(col("y"), col("t"),
        round(log((coalesce(col("c"), lit(0L)) + lit(1.0))
          / (col("nt") + col("v"))) * lit(1e6)).cast("bigint").as("w"))
    // serve the held-out split: token → grid join keyed by term, then
    // (doc, class) partial sums, prior add, per-doc argmax
    val ts = tok.filter(col("tr") === 0).select(col("did"), col("t"))
      .join(grid, Seq("t"))
      .groupBy(col("did"), col("y"))
      .agg(sum(col("w")).as("s"))
      .select(col("did"), col("y").as("cand"), col("s"))
    val test = p.filter(col("tr") === 0).select(col("did"), col("y"))
    val scored = test
      .crossJoin(broadcast(prior.select(col("y").as("cand"), col("pw"))))
      .join(ts, Seq("did", "cand"), "left")
      .select(col("did"), col("y"), col("cand"),
        (col("pw") + coalesce(col("s"), lit(0L))).as("score"))
    val wArg = Window.partitionBy(col("did"))
      .orderBy(col("score").desc, col("cand"))
    scored.withColumn("rn", row_number().over(wArg))
      .filter(col("rn") === 1)
      .select(col("did"), col("y"), col("cand").as("predicted"))
  }
}

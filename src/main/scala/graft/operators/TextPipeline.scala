package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Corpus-level text-pipeline stages that are joins/aggregations rather
  * than scalar functions: repetition scoring and benchmark
  * decontamination. Both are explode + equi-join/aggregate shapes — the
  * per-document "compare against everything" work happens in the shuffle,
  * never as a nested per-row loop.
  */
object TextPipeline {

  /** Gopher-style repetition signal per document: frequency of the most
    * common token over total tokens (near 1e6 ppm = the document repeats
    * one token). explode -> count -> max, one shuffle by (doc, token).
    * The ratio is emitted as exact integer parts-per-million
    * (floor(1e6*top/total)) rather than a rounded double: `round(x, 6)`
    * on a double differs in the last ulp between engines, while i64
    * arithmetic is bit-identical everywhere.
    */
  def repetitionScores(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc"), explode(T.tokens(col(textCol))).as("tok"))
    toks
      .groupBy(col("doc"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc"))
      .agg(max(col("c")).as("top_count"), sum(col("c")).as("n_tokens"))
      .select(
        col("doc"),
        col("n_tokens"),
        expr("(top_count * 1000000L) DIV n_tokens").as("repetition_ppm"))
  }

  /** Benchmark decontamination: documents sharing at least `minShared`
    * distinct word-k-shingles with any probe document (the held-out set a
    * training corpus must not contain). Inverted-index semi-join on
    * hashed shingles — probe side is usually tiny, so its posting list
    * broadcasts; returns (doc, n_shared) for every contaminated doc.
    */
  def contaminated(
      docs: DataFrame, probes: DataFrame,
      textCol: String, idCol: String,
      shingleK: Int = 5, minShared: Int = 1): DataFrame = {
    val docPostings = Dedup.shingleSets(docs, textCol, idCol, shingleK)
      .select(col("doc"), explode(col("sh")).as("s"))
    val probePostings = Dedup.shingleSets(probes, textCol, idCol, shingleK)
      .select(explode(col("sh")).as("s")).distinct()
    docPostings
      .join(broadcast(probePostings), Seq("s"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_shared")) // doc's sh is distinct -> count = distinct shared
      .filter(col("n_shared") >= minShared)
  }
}

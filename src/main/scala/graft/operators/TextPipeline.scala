package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** BLOOM-FILTER decontamination — the constant-memory scale path of
    * [[contaminated]]: the probe set's shingles are folded into an
    * `mBits`-bit bloom filter (`kHashes` md5-derived positions per
    * shingle), and each corpus document is then checked MAP-ONLY against
    * the filter. One-sided error: every truly-shared shingle hits
    * (superset of [[contaminated]]'s matches); a hit can be a false
    * positive with the usual (1-e^(-kn/m))^k probability.
    *
    * Why this exists alongside the semi-join: the posting-list join ships
    * probe shingles to every corpus partition per query run, while the
    * bloom filter is a few KB of longs broadcast ONCE — at 100 TB the
    * corpus-side cost is a pure scan (no shuffle, no join), which is how
    * production pipelines screen against a benchmark suite. The filter
    * build cost is bounded by the (tiny) probe set.
    *
    * Portability: positions are md5-derived (hash j of shingle s =
    * md5("j:" + s) head mod mBits), so the filter bits — and therefore
    * every hit/miss decision including false positives — are bit-identical
    * in any engine; the DuckDB oracle rebuilds the same filter in SQL.
    *
    * Returns (doc, n_hits) for documents with >= `minShared` shingles
    * hitting the filter. Driver state: mBits/32 ints (the collected
    * filter words — same bounded-collect pattern as the KMeans centroids);
    * on a real cluster this array rides the closure/broadcast to every
    * executor.
    */
  def bloomContaminated(
      docs: DataFrame, probes: DataFrame,
      textCol: String, idCol: String,
      shingleK: Int = 5, minShared: Int = 1,
      mBits: Int = 1 << 16, kHashes: Int = 4): DataFrame = {
    require(mBits >= 32 && mBits % 32 == 0, "mBits must be a positive multiple of 32")
    require(kHashes >= 1, "kHashes must be >= 1")
    def md5Head8(c: Column): Column =
      conv(substring(md5(c), 1, 8), 16, 10).cast("long")
    def position(s: Column, j: Int): Column =
      md5Head8(concat(lit(s"$j:"), s)) % mBits
    // STRING shingles (not the xxhash64'd fast-path sets): the md5
    // positions must be derivable from corpus bytes alone in any engine
    def stringShingles(df: DataFrame): DataFrame = df
      .withColumn("__w", T.tokens(col(textCol)))
      .withColumn("__sh", array_distinct(T.wordShinglesFromTokens(col("__w"), shingleK)))
      .select(col(idCol).as("doc"), col("__sh").as("sh"))
    val nWords = mBits / 32
    // 2^bit as an exact integer-valued double (pow with integer exponent
    // <= 31 is exact): shiftleft() takes only a literal shift count
    def mask(p: Column): Column = pow(lit(2.0), (p % 32).cast("int")).cast("long")
    val setBits = stringShingles(probes)
      .select(explode(col("sh")).as("s"))
      .distinct()
      .select(explode(array((0 until kHashes).map(j => position(col("s"), j)): _*)).as("p"))
      .select((col("p") / 32).cast("int").as("wd"), mask(col("p")).as("mask"))
      .groupBy(col("wd")).agg(bit_or(col("mask")).as("bits"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val words = lit(Array.tabulate(nWords)(i => setBits.getOrElse(i, 0L)))
    // map-only probe: a shingle hits iff ALL k of its bits are set
    def hit(s: Column): Column =
      (0 until kHashes).map { j =>
        val p = position(s, j)
        (element_at(words, (p / 32).cast("int") + 1).bitwiseAND(mask(p)) =!= 0L)
      }.reduce(_ && _)
    stringShingles(docs)
      .select(col("doc"), size(filter(col("sh"), s => hit(s))).cast("bigint").as("n_hits"))
      .filter(col("n_hits") >= minShared)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline, all built from
  * codegen'd built-ins (split / regexp / higher-order functions) so they
  * run inside whole-stage codegen at scan time — no UDF boundary, no
  * serialization, scales linearly with input bytes.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed, lowercased text; empty text -> []. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** Whitespace token count (0 for empty/blank text). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword token count: runs of letters, runs of digits, and
    * single non-alphanumeric marks each count as one token — a cheap,
    * deterministic proxy for a trained tokenizer's token count.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Word k-shingles from an ALREADY-MATERIALIZED token-array column
    * (duplicates preserved); documents shorter than k words yield one
    * shingle = the whole token sequence.
    *
    * PERFORMANCE CONTRACT (applies to every higher-order fn here): `w`
    * must be a materialized column (AttributeReference), not a nested
    * expression — HOF lambdas re-evaluate their free subexpressions per
    * element and HOFs never enter whole-stage codegen, so passing e.g.
    * `tokens(text)` directly would re-run the regex split once per
    * shingle per row. Stage arrays with `.withColumn` between steps;
    * Catalyst's CollapseProject keeps multiply-referenced non-cheap
    * projections from being re-inlined.
    */
  def wordShinglesFromTokens(w: Column, k: Int): Column =
    when(size(w) <= k, array(concat_ws(" ", w)))
      .otherwise(
        transform(sequence(lit(0), size(w) - k),
          i => concat_ws(" ", slice(w, i + 1, lit(k)))))

  /** Distinct shingle set (the unit of Jaccard / MinHash dedup). */
  def shingleSetFromTokens(w: Column, k: Int): Column =
    array_distinct(wordShinglesFromTokens(w, k))

  /** MinHash signature: `n` 64-bit min-hashes of the shingle set. Hash j of
    * shingle s is xxhash64(j, s) — n independent-enough hash families with
    * zero stored state, computable at scan time. `shingles` must be a
    * materialized column (see [[wordShinglesFromTokens]] contract).
    */
  def minhashSignature(shingles: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      j => array_min(transform(shingles, s => xxhash64(j, s))))

  /** MinHash signature from PRE-HASHED shingles (`array<long>`) — the
    * codegen'd scale path ([[org.apache.spark.sql.graftvec.TextExprs]]):
    * one compiled loop instead of n x |shingles| interpreted lambdas.
    * Materialize `hashAll(sh)` and pass that column.
    */
  def minhashSignatureFromHashes(hashedShingles: Column, n: Int): Column =
    org.apache.spark.sql.graftvec.TextExprs.minhashCol(hashedShingles, n)

  /** xxhash64 of every element of a string array (the one-time hash). */
  def hashAll(arr: Column): Column = transform(arr, s => xxhash64(s))

  /** LSH band keys from a minhash signature: `bands` hashes, band i hashing
    * rows [i*r, (i+1)*r). Two docs collide on a band iff that slice of
    * their signatures is identical.
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(signature, b * rowsPerBand + 1, lit(rowsPerBand))))

  /** SimHash-64 of the token multiset: per bit, sum +-1 over token hashes,
    * bit set iff the sum is positive. The per-(token x bit) vote loop is a
    * codegen'd expression ([[org.apache.spark.sql.graftvec.TextExprs]]);
    * the token array and each token's hash are evaluated exactly once.
    */
  def simhash64(text: Column): Column =
    org.apache.spark.sql.graftvec.TextExprs.simhashCol(hashAll(tokens(text)))

  /** Engine-PORTABLE SimHash-64: identical voting semantics to
    * [[simhash64]], but each token hashes to the first 16 hex chars of
    * md5(token) instead of xxhash64 — md5 is bit-identical across engines,
    * so the resulting signatures (and therefore the hamming-<=k pair set)
    * can be reproduced in ANSI SQL by any engine with md5(). Used by the
    * oracled q33 variant; [[simhash64]] stays the fast path (one codegen'd
    * hash vs md5's 16-byte digest per token).
    */
  def simhash64Md5(text: Column): Column =
    org.apache.spark.sql.graftvec.TextExprs.simhashCol(
      org.apache.spark.sql.graftvec.TextExprs.md5LongHashesCol(tokens(text)))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Rolling hash-chain fingerprint of the token sequence:
    * acc = xxhash64(acc, token). Order-sensitive (unlike a set hash) —
    * catches reordered near-dups as DIFFERENT, which is what a content
    * fingerprint should do. Chained hashing rather than polynomial
    * multiply-add so ANSI mode (Spark 4 default) can't overflow.
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => xxhash64(acc, t))

  /** Engine-PORTABLE rolling fingerprint: the chain state is the first 16
    * hex chars of md5(acc || token), seeded with "". Same order-sensitive
    * contract as [[rollingFingerprint]] but reproducible in any engine
    * with md5() and a fold (DuckDB: `list_reduce(list_prepend('', w), ...)`)
    * — used by the oracled q44 variant; the xxhash64 chain stays the fast
    * path (one 64-bit hash per step vs a 16-byte digest + hex slicing).
    */
  def rollingFingerprintMd5(text: Column): Column =
    aggregate(tokens(text), lit(""),
      (acc, t) => substring(md5(concat(acc, t)), 1, 16))

  /** PII redaction: emails, simple phone numbers and IPv4 addresses are
    * replaced with typed placeholders. Patterns stay in the regex subset
    * shared by Java regex and RE2 so the same expressions run in the
    * DuckDB oracle; a production deployment would widen the pattern set,
    * not the mechanism.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val phone = regexp_replace(email,
      "\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b", "<PHONE>")
    regexp_replace(phone,
      "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>")
  }

  /** Stopword sets for the n-gram/stopword language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "zu", "den", "mit", "von"),
    "es" -> Seq("el", "la", "de", "y", "un", "una", "es", "que", "por", "con"),
    "zh" -> Seq("de", "shi", "le", "zai", "he", "you", "wo", "ta", "men", "zhe"))

  /** Per-language stopword hit ratio from a MATERIALIZED token column:
    * |tokens ∩ stopwords(lang)| / |tokens|.
    */
  def stopwordRatioFromTokens(tk: Column, lang: String): Column = {
    val sw = array(stopwords(lang).map(lit): _*)
    when(size(tk) === 0, 0.0)
      .otherwise(size(filter(tk, t => array_contains(sw, t))).cast("double") / size(tk))
  }

  /** Per-language stopword hit ratio (single-use convenience; for repeated
    * ratios over one document materialize `tokens(text)` first).
    */
  def stopwordRatio(text: Column, lang: String): Column =
    stopwordRatioFromTokens(tokens(text), lang)

  /** All-language stopword hit counts for a MATERIALIZED token column:
    * one codegen'd pass over the array, languages in sorted-key order
    * (the order [[langIdFromHits]] expects). Stage this via `.withColumn`
    * when scoring, so the pass runs once regardless of evaluation mode.
    */
  def stopwordHitsAll(tk: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    org.apache.spark.sql.graftvec.TextExprs.stopwordHitsCol(tk, langs.map(stopwords(_)))
  }

  /** Heuristic language ID from a MATERIALIZED token column: the language
    * with the highest stopword ratio; ties and all-zero scores fall back
    * to "en" then lexicographic order. The per-language hit counts come
    * from ONE codegen'd pass over the token array
    * ([[org.apache.spark.sql.graftvec.TextExprs.StopwordHits]]) — the HOF
    * formulation walked the array once per language, interpreted. Pass
    * `tokens(text)` staged via withColumn, not inline.
    *
    * EVALUATION-MODE CAVEAT: the scoring expression references the hits
    * array once per language, so the "one pass" relies on whole-stage
    * codegen's common-subexpression elimination collapsing the copies
    * (StopwordHits is deterministic and codegen-capable, so inside a
    * codegen stage it does). Under INTERPRETED fallback each reference
    * re-runs the pass — callers on that path should materialize
    * [[stopwordHitsAll]] as a named column and use [[langIdFromHits]].
    */
  def langIdFromTokens(tk: Column): Column =
    langIdFromHits(tk, stopwordHitsAll(tk))

  /** Two-step language ID: score a PRE-MATERIALIZED hits column (from
    * [[stopwordHitsAll]]) against the token column — the multi-set pass
    * runs exactly once in every evaluation mode.
    */
  def langIdFromHits(tk: Column, hits: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scored = langs.zipWithIndex.map { case (l, i) =>
      struct(
        when(size(tk) === 0, 0.0)
          .otherwise(element_at(hits, i + 1).cast("double") / size(tk))
          .as("score"),
        lit(if (l == "en") 1 else 0).as("pref"),
        // descending rank: under array_max a HIGHER rank wins, so equal
        // non-en scores resolve to the lexicographically SMALLEST language
        // (the documented ascending-lexicographic fallback)
        lit(langs.size - i).as("rank"),
        lit(l).as("lang"))
    }
    // struct comparison is field-by-field: score, then en-pref, then rank.
    array_max(array(scored: _*)).getField("lang")
  }

  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  /** Composite quality score in [0,1]: rewards mid-length documents, low
    * punctuation density, presence of stopwords, and sane mean word length.
    * Deterministic arithmetic only — portable to any SQL oracle.
    */
  def qualityScoreFromTokens(text: Column, tk: Column): Column = {
    val nChars = length(text).cast("double")
    val nTok = size(tk).cast("double")
    val punct = length(regexp_replace(text, "[^.!,;:?]", "")).cast("double")
    val lenScore = least(nChars / 200.0, lit(1.0))
    val punctScore = lit(1.0) - least(punct / greatest(nTok, lit(1.0)), lit(1.0))
    val swScore = least(stopwordRatioFromTokens(tk, "en") * 5.0, lit(1.0))
    val meanWord = nChars / greatest(nTok, lit(1.0))
    val wordScore = when(meanWord.between(3.0, 10.0), 1.0).otherwise(0.5)
    round(lenScore * 0.3 + punctScore * 0.3 + swScore * 0.2 + wordScore * 0.2, 6)
  }

  def qualityScore(text: Column): Column = qualityScoreFromTokens(text, tokens(text))
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Curation, Dedup, WebCuration}

/** Corpus-curation queries (q71-q76): rule-based quality filtering,
  * deterministic sharding, duplicated-span detection, importance
  * weighting, count-min-sketch heavy hitters, and per-group hash
  * sampling. All oracled: signals are integer bps/ppm/micro units or md5
  * digests, so both engines compute bit-identical values (see
  * [[graft.operators.Curation]] portability contract).
  */
object CurationQueries {

  // DuckDB fold: first 8 md5 hex chars -> BIGINT (mirrors Spark's
  // conv(substring(md5(x), 1, 8), 16, 10); both < 2^32, exact)
  private def hex8 (e: String): String =
    s"""list_reduce(list_transform(generate_series(1, 8),
       |      i -> strpos('0123456789abcdef', substring($e, i, 1)) - 1),
       |      (a, x) -> a * 16 + x)""".stripMargin

  val queries: Seq[(String, Q)] = Seq(

    "q71_gopher_filter" -> Q(
      (s, dir) =>
        Curation.gopherRules(Tables.table(s, dir, "documents"), "text", "doc_id",
            minWords = 20, maxWords = 100000)
          .select(
            col("doc"), col("n_words"), col("n_lines"),
            col("mean_word_len_centi"), col("alpha_word_bps"),
            col("bullet_line_bps"), col("ellipsis_line_bps"),
            col("req_stopword_hits"),
            col("f_words").cast("bigint").as("f_words"),
            col("f_mean_len").cast("bigint").as("f_mean_len"),
            col("f_alpha").cast("bigint").as("f_alpha"),
            col("f_bullet").cast("bigint").as("f_bullet"),
            col("f_ellipsis").cast("bigint").as("f_ellipsis"),
            col("f_stopwords").cast("bigint").as("f_stopwords"),
            col("keep").cast("bigint").as("keep"))
          .orderBy(col("doc")),
      Some("""WITH d AS (
             |  SELECT doc_id AS doc, text,
             |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0) AS w,
             |    string_split(text, chr(10)) AS lines
             |  FROM documents),
             |m AS (
             |  SELECT doc,
             |    CAST(len(w) AS BIGINT) AS n_words,
             |    CAST(len(lines) AS BIGINT) AS n_lines,
             |    CASE WHEN len(w) = 0 THEN 0
             |         ELSE CAST(list_sum(list_transform(w, t -> len(t))) AS BIGINT) * 100 // len(w)
             |    END AS mean_word_len_centi,
             |    CASE WHEN len(w) = 0 THEN 0
             |         ELSE CAST(len(list_filter(w, t -> regexp_matches(t, '[a-z]'))) AS BIGINT) * 10000 // len(w)
             |    END AS alpha_word_bps,
             |    CAST(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) AS BIGINT) * 10000 // len(lines) AS bullet_line_bps,
             |    CAST(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS BIGINT) * 10000 // len(lines) AS ellipsis_line_bps,
             |    CAST(len(list_intersect(list_distinct(w),
             |      ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS req_stopword_hits
             |  FROM d),
             |f AS (
             |  SELECT *,
             |    (n_words BETWEEN 20 AND 100000) AS bf_words,
             |    (mean_word_len_centi BETWEEN 300 AND 1000) AS bf_mean_len,
             |    (alpha_word_bps >= 8000) AS bf_alpha,
             |    (bullet_line_bps < 9000) AS bf_bullet,
             |    (ellipsis_line_bps < 3000) AS bf_ellipsis,
             |    (req_stopword_hits >= 2) AS bf_stopwords
             |  FROM m)
             |SELECT doc, n_words, n_lines, mean_word_len_centi, alpha_word_bps,
             |  bullet_line_bps, ellipsis_line_bps, req_stopword_hits,
             |  CAST(bf_words AS BIGINT) AS f_words,
             |  CAST(bf_mean_len AS BIGINT) AS f_mean_len,
             |  CAST(bf_alpha AS BIGINT) AS f_alpha,
             |  CAST(bf_bullet AS BIGINT) AS f_bullet,
             |  CAST(bf_ellipsis AS BIGINT) AS f_ellipsis,
             |  CAST(bf_stopwords AS BIGINT) AS f_stopwords,
             |  CAST(bf_words AND bf_mean_len AND bf_alpha AND bf_bullet
             |       AND bf_ellipsis AND bf_stopwords AS BIGINT) AS keep
             |FROM f ORDER BY doc""".stripMargin),
      "Gopher-style quality rules: integer bps signals + per-rule flags + conjunctive keep"),

    "q72_corpus_shards" -> Q(
      (s, dir) =>
        Curation.corpusShards(Tables.table(s, dir, "documents"), "doc_id", nShards = 16)
          .orderBy(col("doc")),
      Some(s"""WITH d AS (
              |  SELECT doc_id AS doc, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
              |s AS (SELECT doc, h, ${hex8("h")} % 16 AS shard FROM d)
              |SELECT doc, CAST(shard AS BIGINT) AS shard,
              |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc) AS BIGINT) AS pos
              |FROM s ORDER BY doc""".stripMargin),
      "deterministic corpus sharding: md5-mod shard + hash-ordered within-shard position"),

    "q73_dup_spans" -> Q(
      (s, dir) =>
        Curation.dupSpans(Tables.table(s, dir, "documents"), "text", "doc_id",
            gramLen = 32, stride = 8)
          .orderBy(col("doc")),
      Some("""WITH d AS (
             |  SELECT doc_id AS doc, text, length(text) AS n
             |  FROM documents WHERE length(text) >= 32),
             |p AS (
             |  SELECT doc, text, unnest(generate_series(1, n - 31, 8)) AS i FROM d),
             |g AS (SELECT doc, md5(substr(text, CAST(i AS INT), 32)) AS g FROM p),
             |df AS (SELECT g, count(DISTINCT doc) AS gdocs FROM g GROUP BY g),
             |j AS (SELECT g.doc, df.gdocs FROM g JOIN df USING (g))
             |SELECT doc, CAST(count(*) AS BIGINT) AS n_grams,
             |  CAST(sum(CASE WHEN gdocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams,
             |  CAST(CAST(sum(CASE WHEN gdocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 10000
             |       // count(*) AS BIGINT) AS dup_bps
             |FROM j GROUP BY doc ORDER BY doc""".stripMargin),
      "cross-document duplicated-span detection: sampled char 32-grams, df >= 2 coverage in bps"),

    "q74_dsir_weights" -> Q(
      (s, dir) =>
        Curation.importanceWeights(Tables.table(s, dir, "documents"), "text", "doc_id",
            targetPred = col("lang") === "en")
          .orderBy(col("doc")),
      Some("""WITH toks AS (
             |  SELECT doc_id AS doc, (lang = 'en') AS is_target,
             |    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0)) AS tok
             |  FROM documents),
             |tf AS (
             |  SELECT doc, is_target, tok, CAST(count(*) AS BIGINT) AS tf
             |  FROM toks GROUP BY doc, is_target, tok),
             |model AS (
             |  SELECT tok, CAST(sum(tf) AS BIGINT) AS cs,
             |    CAST(sum(CASE WHEN is_target THEN tf ELSE 0 END) AS BIGINT) AS ct
             |  FROM tf GROUP BY tok),
             |tot AS (
             |  SELECT CAST(sum(cs) AS BIGINT) AS ns, CAST(sum(ct) AS BIGINT) AS nt,
             |    CAST(count(*) AS BIGINT) AS v
             |  FROM model),
             |llr AS (
             |  SELECT tok, CAST(round((ln((ct + 1.0) / (nt + v)) - ln((cs + 1.0) / (ns + v))) * 1e6) AS BIGINT) AS llr_micro
             |  FROM model CROSS JOIN tot)
             |SELECT tf.doc, CAST(sum(tf.tf) AS BIGINT) AS n_tok,
             |  CAST(sum(tf.tf * llr.llr_micro) AS BIGINT) AS weight_micro
             |FROM tf JOIN llr USING (tok)
             |GROUP BY tf.doc ORDER BY tf.doc""".stripMargin),
      "DSIR-style importance weights: unigram log-likelihood ratio vs lang='en' target, micro-unit integers"),

    "q75_cms_hitters" -> Q(
      (s, dir) =>
        Curation.cmsHeavyHitters(Tables.table(s, dir, "documents"), "text", "doc_id",
            depth = 4, width = 1024, minCount = 50L)
          .orderBy(col("tok")),
      Some(s"""WITH toks AS (
              |  SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> len(t) > 0)) AS tok
              |  FROM documents),
              |ex AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact FROM toks GROUP BY tok),
              |jb AS (
              |  SELECT tok, exact, j,
              |    ${hex8("md5(CAST(j AS VARCHAR) || ':' || tok)")} % 1024 AS b
              |  FROM ex CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)),
              |cells AS (SELECT j, b, CAST(sum(exact) AS BIGINT) AS cell FROM jb GROUP BY j, b),
              |cand AS (SELECT tok, exact, j, b FROM jb WHERE exact >= 50)
              |SELECT cand.tok, cand.exact, CAST(min(cells.cell) AS BIGINT) AS cms_est
              |FROM cand JOIN cells USING (j, b)
              |GROUP BY cand.tok, cand.exact ORDER BY cand.tok""".stripMargin),
      "count-min sketch (4x1024, md5 hash family): heavy hitters with exact vs sketch estimate"),

    "q77_dedup_substr_rm" -> Q(
      (s, dir) =>
        Curation.removeDupSpans(Tables.table(s, dir, "documents"), "text", "doc_id",
            gramLen = 32)
          .orderBy(col("doc")),
      Some("""WITH base AS (SELECT doc_id AS doc, text AS txt, length(text) AS n FROM documents),
             |g AS (
             |  SELECT doc, i, md5(substr(txt, CAST(i AS INT), 32)) AS g
             |  FROM (SELECT doc, txt, unnest(generate_series(1, n - 31)) AS i
             |        FROM base WHERE n >= 32)),
             |k AS (SELECT g, count(DISTINCT doc) AS gdocs, min(doc) AS keeper FROM g GROUP BY g),
             |r AS (SELECT g.doc, g.i FROM g JOIN k USING (g)
             |      WHERE k.gdocs >= 2 AND g.doc <> k.keeper),
             |fl AS (
             |  SELECT doc, i,
             |    CASE WHEN max(i + 32) OVER (PARTITION BY doc ORDER BY i
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             |         OR i > max(i + 32) OVER (PARTITION BY doc ORDER BY i
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |         THEN 1 ELSE 0 END AS newi
             |  FROM r),
             |il AS (SELECT doc, i, sum(newi) OVER (PARTITION BY doc ORDER BY i
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl FROM fl),
             |sp AS (SELECT doc, isl, min(i) AS s, max(i) + 32 AS e FROM il GROUP BY doc, isl),
             |spl AS (SELECT doc, list(struct_pack(s := s, e := e) ORDER BY s) AS spans
             |        FROM sp GROUP BY doc),
             |j AS (SELECT b.doc, b.txt, b.n, spl.spans FROM base b LEFT JOIN spl USING (doc)),
             |seg AS (
             |  SELECT doc, txt, spans,
             |    CASE WHEN spans IS NULL THEN [CAST(1 AS BIGINT)]
             |         ELSE list_prepend(CAST(1 AS BIGINT), list_transform(spans, p -> CAST(p.e AS BIGINT))) END AS starts,
             |    CASE WHEN spans IS NULL THEN [CAST(n + 1 AS BIGINT)]
             |         ELSE list_append(list_transform(spans, p -> CAST(p.s AS BIGINT)), CAST(n + 1 AS BIGINT)) END AS ends
             |  FROM j)
             |SELECT doc,
             |  CAST(COALESCE(len(spans), 0) AS BIGINT) AS n_spans,
             |  CAST(COALESCE(list_sum(list_transform(spans, p -> p.e - p.s)), 0) AS BIGINT) AS chars_removed,
             |  array_to_string(list_transform(generate_series(1, len(starts)),
             |    x -> substr(txt, CAST(starts[x] AS INT), CAST(ends[x] - starts[x] AS INT))), '') AS clean_text
             |FROM seg ORDER BY doc""".stripMargin),
      "exact-substring dedup transform: remove cross-doc duplicated spans, keep one copy corpus-wide"),

    "q78_bloom_decontaminate" -> Q(
      (s, dir) => {
        val docs = Tables.table(s, dir, "documents")
        // repartition: the LOCAL testdata file is a single parquet row
        // group, so the otherwise map-only probe would run as ONE task;
        // spreading the (tiny here) corpus restores scan parallelism. On
        // a real corpus the scan has thousands of splits and this line
        // would be wrong — the operator itself stays shuffle-free.
        graft.operators.TextPipeline.bloomContaminated(
            docs.filter(col("doc_id") >= 10).repartition(),
            docs.filter(col("doc_id") < 10),
            "text", "doc_id", shingleK = 5, minShared = 1,
            mBits = 1 << 16, kHashes = 4)
          .orderBy(col("doc"))
      },
      // the oracle REBUILDS the bloom filter bit-for-bit: position j of
      // shingle s = hex chars [8j+1 .. 8j+8] of md5(s) mod 2^16 — ONE
      // digest per shingle sliced 4 ways (mirrors FilterExprs
      // .md5BloomPosition / TextPipeline.bloomWords), so hits — including
      // any deterministic false positives — match
      Some(s"""WITH toks AS (
              |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> len(t) > 0) AS w
              |  FROM documents),
              |sets AS (
              |  SELECT doc_id, list_distinct(
              |    CASE WHEN len(w) <= 5 THEN [array_to_string(w, ' ')]
              |         ELSE list_transform(generate_series(1, len(w) - 4), i -> array_to_string(w[i:i+4], ' '))
              |    END) AS sh
              |  FROM toks),
              |psh AS (SELECT DISTINCT unnest(sh) AS s FROM sets WHERE doc_id < 10),
              |ppos AS (
              |  SELECT ${hex8("substring(md5(s), 1 + 8 * j, 8)")} % 65536 AS p
              |  FROM psh CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)),
              |words AS (
              |  SELECT p // 32 AS wd,
              |    bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
              |  FROM ppos GROUP BY wd),
              |dsh AS (SELECT doc_id AS doc, unnest(sh) AS s FROM sets WHERE doc_id >= 10),
              |dpos AS (
              |  SELECT doc, s, ${hex8("substring(md5(s), 1 + 8 * j, 8)")} % 65536 AS p
              |  FROM dsh CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)),
              |hits AS (
              |  SELECT doc, s
              |  FROM dpos JOIN words ON words.wd = dpos.p // 32
              |  WHERE (words.bits & (CAST(1 AS BIGINT) << CAST(dpos.p % 32 AS INT))) <> 0
              |  GROUP BY doc, s HAVING count(*) = 4)
              |SELECT doc, CAST(count(*) AS BIGINT) AS n_hits
              |FROM hits GROUP BY doc HAVING count(*) >= 1
              |ORDER BY doc""".stripMargin),
      "bloom-filter decontamination: md5-position filter rebuilt bit-for-bit by the oracle"),

    "q281_bloom_incremental" -> Q(
      (s, dir) => {
        // The incremental-decontamination shape: yesterday's filter
        // (probes doc_id < 5) OR-merged with today's delta filter
        // (5 <= doc_id < 10) — no re-read of yesterday's probes. Because
        // bloom positions are pure md5 functions and bit_or is
        // associative, the merged filter is bit-identical to one built
        // from the probe union, which is exactly what the oracle builds.
        val docs = Tables.table(s, dir, "documents")
        val base = graft.operators.TextPipeline.bloomModel(
          docs.filter(col("doc_id") < 5), "text", "doc_id",
          shingleK = 5, mBits = 1 << 16, kHashes = 4)
        val delta = graft.operators.TextPipeline.bloomModel(
          docs.filter(col("doc_id") >= 5 && col("doc_id") < 10), "text",
          "doc_id", shingleK = 5, mBits = 1 << 16, kHashes = 4)
        graft.operators.TextPipeline.bloomProbe(
            docs.filter(col("doc_id") >= 10).repartition(),
            graft.operators.TextPipeline.bloomMerge(base, delta),
            "text", "doc_id", minShared = 1)
          .orderBy(col("doc"))
      },
      // the oracle builds ONE filter from the probe UNION (doc_id < 10) —
      // merge ≡ union-build is the property under test, so this is the
      // q78 oracle verbatim
      Some(s"""WITH toks AS (
              |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> len(t) > 0) AS w
              |  FROM documents),
              |sets AS (
              |  SELECT doc_id, list_distinct(
              |    CASE WHEN len(w) <= 5 THEN [array_to_string(w, ' ')]
              |         ELSE list_transform(generate_series(1, len(w) - 4), i -> array_to_string(w[i:i+4], ' '))
              |    END) AS sh
              |  FROM toks),
              |psh AS (SELECT DISTINCT unnest(sh) AS s FROM sets WHERE doc_id < 10),
              |ppos AS (
              |  SELECT ${hex8("substring(md5(s), 1 + 8 * j, 8)")} % 65536 AS p
              |  FROM psh CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)),
              |words AS (
              |  SELECT p // 32 AS wd,
              |    bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
              |  FROM ppos GROUP BY wd),
              |dsh AS (SELECT doc_id AS doc, unnest(sh) AS s FROM sets WHERE doc_id >= 10),
              |dpos AS (
              |  SELECT doc, s, ${hex8("substring(md5(s), 1 + 8 * j, 8)")} % 65536 AS p
              |  FROM dsh CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)),
              |hits AS (
              |  SELECT doc, s
              |  FROM dpos JOIN words ON words.wd = dpos.p // 32
              |  WHERE (words.bits & (CAST(1 AS BIGINT) << CAST(dpos.p % 32 AS INT))) <> 0
              |  GROUP BY doc, s HAVING count(*) = 4)
              |SELECT doc, CAST(count(*) AS BIGINT) AS n_hits
              |FROM hits GROUP BY doc HAVING count(*) >= 1
              |ORDER BY doc""".stripMargin),
      "incremental bloom decontamination: yesterday's filter OR-merged with the delta " +
        "probes' filter equals the union-built filter bit-for-bit (oracle builds the " +
        "union) — benchmark screening that ingests new probe suites without re-reading " +
        "old ones"),

    "q282_length_percentile_gate" -> Q(
      (s, dir) =>
        Curation.lengthPercentileGate(
            Tables.table(s, dir, "documents"), "text", "doc_id", "source",
            loBps = 1000, hiBps = 9000)
          .orderBy(col("doc")),
      Some("""WITH lens AS (SELECT doc_id AS doc, source AS src,
             |    CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |      t -> len(t) > 0)) AS BIGINT) AS n_tokens
             |  FROM documents),
             |h AS (SELECT src, n_tokens, count(*) AS c FROM lens GROUP BY 1, 2),
             |w AS (SELECT src, n_tokens,
             |    sum(c) OVER (PARTITION BY src ORDER BY n_tokens
             |      ROWS UNBOUNDED PRECEDING) AS cum,
             |    sum(c) OVER (PARTITION BY src) AS n FROM h),
             |cuts AS (SELECT src,
             |    min(CASE WHEN cum * 10000 >= 1000 * n THEN n_tokens END) AS lo_len,
             |    min(CASE WHEN cum * 10000 >= 9000 * n THEN n_tokens END) AS hi_len
             |  FROM w GROUP BY src)
             |SELECT doc, lens.src, n_tokens,
             |  CAST(lo_len AS BIGINT) AS lo_len, CAST(hi_len AS BIGINT) AS hi_len,
             |  (n_tokens BETWEEN lo_len AND hi_len) AS keep
             |FROM lens JOIN cuts ON cuts.src = lens.src
             |ORDER BY doc""".stripMargin),
      "per-source relative length gate: keep docs inside their own source's [p10, p90] " +
        "discrete token-count percentiles (the outlier trim absolute Gopher bounds miss); " +
        "cut table from the length HISTOGRAM — windows bounded by length resolution per " +
        "source, never corpus size, then one broadcast join"),

    "q79_temperature_mix" -> Q(
      (s, dir) =>
        Curation.temperatureMix(Tables.table(s, dir, "documents"), "doc_id", "source",
            targetFrac = 0.5)
          .orderBy(col("doc")),
      Some(s"""WITH c AS (
              |  SELECT source AS src, CAST(count(*) AS BIGINT) AS n_src,
              |    sqrt(CAST(count(*) AS DOUBLE)) AS w
              |  FROM documents GROUP BY source),
              |t AS (
              |  SELECT CAST(sum(n_src) AS BIGINT) AS n_total,
              |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(w ORDER BY src)),
              |      (a, x) -> a + x) AS w_total
              |  FROM c),
              |r AS (
              |  SELECT src, least(1.0, ((0.5 * n_total) * w) / (w_total * n_src)) AS rate
              |  FROM c CROSS JOIN t)
              |SELECT doc_id AS doc, source AS src,
              |  CAST(floor(rate * 1e6) AS BIGINT) AS rate_ppm,
              |  CAST(${hex8("md5('mix:' || CAST(doc_id AS VARCHAR))")} / 4294967296.0 < rate
              |       AS BIGINT) AS keep
              |FROM documents JOIN r ON source = r.src
              |ORDER BY doc""".stripMargin),
      "temperature mixing: per-source rate ~ sqrt(count), deterministic md5 acceptance coin"),

    "q87_weighted_sample" -> Q(
      (s, dir) =>
        Curation.weightedSample(Tables.table(s, dir, "documents"),
            "doc_id", "n_chars", k = 50)
          .orderBy(col("rk")),
      Some(s"""WITH d AS (
              |  SELECT doc_id AS doc, CAST(n_chars AS DOUBLE) AS w,
              |    CAST(round(ln((${hex8("md5('wsample:' || CAST(doc_id AS VARCHAR))")} + 1)
              |      / 4294967296.0) / CAST(n_chars AS DOUBLE) * 1e9) AS BIGINT) AS key_nano
              |  FROM documents WHERE n_chars > 0),
              |r AS (
              |  SELECT doc, w, key_nano,
              |    CAST(row_number() OVER (ORDER BY key_nano DESC, doc) AS BIGINT) AS rk
              |  FROM d)
              |SELECT doc, w, key_nano, rk FROM r WHERE rk <= 50 ORDER BY rk""".stripMargin),
      "Efraimidis-Spirakis weighted sample without replacement: top-k by ln(u)/w with a " +
        "deterministic md5 uniform, planned as TakeOrderedAndProject (no global sort)"),

    "q80_line_dedup" -> Q(
      (s, dir) => {
        // the synthetic docs are single-line and all-distinct, so the
        // query PLANTS duplication: every doc is unioned with a copy
        // (id + 100000) that repeats the original line and appends a
        // short unique tail — the copy must lose exactly the repeated
        // line and keep the (sub-minLen) tail, originals pass untouched
        val base = Tables.table(s, dir, "documents").select(col("doc_id"), col("text"))
        val copies = base.select(
          (col("doc_id") + 100000L).as("doc_id"),
          concat(col("text"), lit("\n"),
            concat(lit("tail "), col("doc_id").cast("string"))).as("text"))
        Curation.dedupLines(base.unionByName(copies), "text", "doc_id", minLen = 20)
          .orderBy(col("doc"))
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id AS doc, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000, text || chr(10) || 'tail ' || CAST(doc_id AS VARCHAR)
             |  FROM documents),
             |d AS (SELECT doc, string_split(text, chr(10)) AS lines FROM corpus),
             |p AS (SELECT doc, lines, unnest(generate_series(1, len(lines))) AS i FROM d),
             |l AS (SELECT doc, i - 1 AS idx, lines[i] AS ln FROM p),
             |f AS (SELECT ln, min(doc * 2147483648 + idx) AS fk
             |      FROM l WHERE len(ln) >= 20 GROUP BY ln),
             |m AS (SELECT l.doc, l.idx, l.ln,
             |        (f.fk IS NULL OR l.doc * 2147483648 + l.idx = f.fk) AS keep
             |      FROM l LEFT JOIN f USING (ln))
             |SELECT doc,
             |  CAST(count(*) AS BIGINT) AS n_lines,
             |  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
             |  COALESCE(array_to_string(list(ln ORDER BY idx) FILTER (WHERE keep), chr(10)), '') AS clean_text
             |FROM m GROUP BY doc ORDER BY doc""".stripMargin),
      "line-level exact dedup: first corpus-wide occurrence survives, sub-minLen lines always pass"),

    "q86_boilerplate_rm" -> Q(
      (s, dir) => {
        // the synthetic docs are single-line and all-distinct, so the
        // query PLANTS boilerplate: every doc gains a per-source footer
        // line (shared by all docs of that source -> removed everywhere),
        // and every 10th doc also gains a unique >= minLen line (df = 1
        // -> kept): both sides of the df threshold are exercised
        val planted = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            concat(col("text"), lit("\n"),
              lit("FOOTER all rights reserved "), col("source"),
              when(col("doc_id") % 10 === 0,
                concat(lit("\nRARE LINE UNIQUE TO DOCUMENT "),
                  col("doc_id").cast("string"))).otherwise(lit(""))).as("text"))
        Curation.removeBoilerplate(planted, "text", "doc_id", "source",
            minLen = 20, maxDocs = 5)
          .orderBy(col("doc"))
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id AS doc, source AS grp,
             |    text || chr(10) || 'FOOTER all rights reserved ' || source ||
             |    CASE WHEN doc_id % 10 = 0
             |         THEN chr(10) || 'RARE LINE UNIQUE TO DOCUMENT ' || CAST(doc_id AS VARCHAR)
             |         ELSE '' END AS text
             |  FROM documents),
             |d AS (SELECT doc, grp, string_split(text, chr(10)) AS lines FROM corpus),
             |p AS (SELECT doc, grp, lines, unnest(generate_series(1, len(lines))) AS i FROM d),
             |l AS (SELECT doc, grp, i - 1 AS idx, lines[i] AS ln FROM p),
             |b AS (SELECT grp, ln FROM l WHERE len(ln) >= 20
             |      GROUP BY grp, ln HAVING count(DISTINCT doc) >= 5),
             |m AS (SELECT l.doc, l.idx, l.ln, (b.ln IS NULL) AS keep
             |      FROM l LEFT JOIN b ON l.grp = b.grp AND l.ln = b.ln)
             |SELECT doc,
             |  CAST(count(*) AS BIGINT) AS n_lines,
             |  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
             |  COALESCE(array_to_string(list(ln ORDER BY idx) FILTER (WHERE keep), chr(10)), '') AS clean_text
             |FROM m GROUP BY doc ORDER BY doc""".stripMargin),
      "boilerplate removal: lines repeated across >= maxDocs distinct docs of one source are " +
        "removed from every doc (no keeper), sub-minLen structural lines always pass"),

    "q82_lm_score" -> Q(
      (s, dir) =>
        Curation.bigramNll(Tables.table(s, dir, "documents"), "text", "doc_id",
            targetPred = col("lang") === "en")
          .orderBy(col("doc")),
      Some("""WITH t AS (
             |  SELECT doc_id AS doc, (lang = 'en') AS is_target,
             |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> len(x) > 0) AS w
             |  FROM documents),
             |b AS (SELECT doc, is_target, unnest(generate_series(1, len(w) - 1)) AS i, w
             |      FROM t WHERE len(w) >= 2),
             |bg AS (SELECT doc, is_target, w[i] AS w1, w[i+1] AS w2 FROM b),
             |tf AS (SELECT doc, is_target, w1, w2, CAST(count(*) AS BIGINT) AS tf
             |       FROM bg GROUP BY doc, is_target, w1, w2),
             |cb AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS cb FROM tf WHERE is_target GROUP BY w1, w2),
             |cs AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cs FROM cb GROUP BY w1),
             |v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM cb),
             |sc AS (
             |  SELECT tf.doc, tf.tf,
             |    CAST(round(-ln((COALESCE(cb.cb, 0) + 1.0) / (COALESCE(cs.cs, 0) + v.v)) * 1e6) AS BIGINT) AS nll
             |  FROM tf LEFT JOIN cb USING (w1, w2) LEFT JOIN cs USING (w1) CROSS JOIN v)
             |SELECT doc,
             |  CAST(sum(tf) AS BIGINT) AS n_bigrams,
             |  CAST(sum(tf * nll) AS BIGINT) AS nll_micro_total,
             |  CAST(sum(tf * nll) AS BIGINT) // CAST(sum(tf) AS BIGINT) AS avg_nll_micro
             |FROM sc GROUP BY doc ORDER BY doc""".stripMargin),
      "CCNet-style bigram-LM scoring: add-1 smoothed NLL vs lang='en' model, micro-unit integers"),

    "q85_token_budget" -> Q(
      (s, dir) => {
        val rep = graft.operators.TextPipeline.repetitionScores(
          Tables.table(s, dir, "documents"), "text", "doc_id")
        // least-repetitive docs first until 16k tokens are spent; ppm
        // buckets of 10k bound the per-bucket window partitions
        Curation.tokenBudgetSelect(rep, "doc", "repetition_ppm", "n_tokens",
            budget = 16000L, bucketScale = 1e-4)
          .orderBy(col("doc"))
      },
      // the oracle states the SEMANTICS (one global cumulative sum over
      // the quality order); the engine computes the identical result with
      // a two-level bucketed prefix sum that never sorts the corpus in
      // one task
      Some("""WITH toks AS (
             |  SELECT doc_id AS doc,
             |    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0)) AS tok
             |  FROM documents),
             |cnt AS (SELECT doc, tok, count(*) AS c FROM toks GROUP BY doc, tok),
             |rep AS (SELECT doc, CAST(sum(c) AS BIGINT) AS n_tokens,
             |    CAST((max(c) * 1000000) // sum(c) AS BIGINT) AS score
             |  FROM cnt GROUP BY doc),
             |run AS (SELECT doc, n_tokens, score,
             |    sum(n_tokens) OVER (ORDER BY score, doc
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
             |  FROM rep)
             |SELECT doc, n_tokens, score, (running <= 16000) AS keep
             |FROM run ORDER BY doc""".stripMargin),
      "token-budget corpus selection: best-quality-first prefix cut at 16k tokens, computed " +
        "as a bucketed two-level prefix sum (no global single-task sort)"),

    "q76_group_sample" -> Q(
      (s, dir) =>
        Curation.groupHashSample(Tables.table(s, dir, "documents"), "doc_id", "source", k = 5)
          .orderBy(col("grp"), col("rk")),
      Some("""WITH s AS (
             |  SELECT doc_id AS doc, source AS grp, md5(CAST(doc_id AS VARCHAR)) AS h
             |  FROM documents),
             |r AS (
             |  SELECT doc, grp,
             |    CAST(row_number() OVER (PARTITION BY grp ORDER BY h, doc) AS BIGINT) AS rk
             |  FROM s)
             |SELECT doc, grp, rk FROM r WHERE rk <= 5 ORDER BY grp, rk""".stripMargin),
      "deterministic per-group k-sample: smallest md5(id) per group (stateless reservoir equivalent)"),

    "q193_chunk_overlap" -> Q(
      (s, dir) =>
        Curation.chunkDocuments(Tables.table(s, dir, "documents"),
            "text", "doc_id", chunkLen = 64, stride = 16)
          .orderBy(col("doc"), col("chunk_idx")),
      Some("""WITH toks AS (SELECT doc_id AS doc,
             |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0) AS w
             |  FROM documents),
             |nn AS (SELECT doc, w, len(w) AS n FROM toks WHERE len(w) > 0),
             |x AS (SELECT doc, w, n,
             |    unnest(generate_series(0, (greatest(n - 64, 0) + 15) // 16)) AS chunk_idx
             |  FROM nn),
             |f AS (SELECT doc, chunk_idx, chunk_idx * 16 AS tok_start, n, w
             |  FROM x WHERE chunk_idx * 16 < n)
             |SELECT CAST(doc AS BIGINT) AS doc, CAST(chunk_idx AS BIGINT) AS chunk_idx,
             |  CAST(tok_start AS BIGINT) AS tok_start,
             |  CAST(least(64, n - tok_start) AS BIGINT) AS n_tok,
             |  array_to_string(w[tok_start + 1 : tok_start + 64], ' ') AS chunk_text
             |FROM f ORDER BY doc, chunk_idx""".stripMargin),
      "sliding-window chunking (64 tokens, stride 16 -> 48-token overlap) with " +
        "token-exact offsets and short final windows kept — the retrieval/RAG " +
        "splitter whose overlap keeps boundary-straddling facts whole in some " +
        "chunk; map-only, bounded per-doc explode, no shuffle"),

    "q141_pack_sequences" -> Q(
      (s, dir) =>
        Curation.packSequences(
            Tables.table(s, dir, "documents")
              .withColumn("n_tok", greatest(lit(1L), expr("n_chars DIV 4"))),
            "doc_id", "n_tok", contextLen = 2048L, nShards = 16)
          .orderBy(col("doc")),
      Some(s"""WITH d AS (
              |  SELECT doc_id AS doc, greatest(1, n_chars // 4) AS n_tokens,
              |    md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
              |s AS (SELECT doc, n_tokens, h, ${hex8("h")} % 16 AS shard FROM d),
              |o AS (SELECT doc, shard, n_tokens,
              |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc
              |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS off
              |  FROM s)
              |SELECT doc, CAST(shard AS BIGINT) AS shard,
              |  CAST(n_tokens AS BIGINT) AS n_tokens, off,
              |  off // 2048 AS first_bin,
              |  (off + n_tokens - 1) // 2048 AS last_bin,
              |  (off + n_tokens - 1) // 2048 - off // 2048 + 1 AS n_bins
              |FROM o ORDER BY doc""".stripMargin),
      "concat-and-chunk sequence packing: documents laid end to end in the " +
        "deterministic shard order and cut into 2048-token training windows — " +
        "per-doc shard, stream offset, and spanned window range; per-shard " +
        "prefix sums, never a global one"),

    "q155_budget_allocation" -> Q(
      (s, dir) =>
        Curation.largestRemainderAllocate(
            Tables.table(s, dir, "documents"), "lang", total = 997L)
          .orderBy(col("grp")),
      Some("""WITH c AS (SELECT lang AS grp, CAST(count(*) AS BIGINT) AS n_rows
             |  FROM documents GROUP BY 1),
             |t AS (SELECT *, sum(n_rows) OVER () AS t FROM c),
             |b AS (SELECT *, (997 * n_rows) // t AS base,
             |    (997 * n_rows) % t AS rem FROM t),
             |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, grp) AS rk,
             |    997 - sum(base) OVER () AS leftover FROM b)
             |SELECT grp, n_rows,
             |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             |    AS alloc
             |FROM r ORDER BY grp""".stripMargin),
      "largest-remainder (Hamilton) apportionment of a 997-document budget across " +
        "languages: floor quotas + remainder-ranked leftover units, sum EXACTLY the " +
        "budget — all-integer, one bounded groupBy, windows over group rows only"),

    "q157_stratified_sample" -> Q(
      (s, dir) =>
        Curation.stratifiedSampleExact(
            Tables.table(s, dir, "documents"), "doc_id", "source", total = 197L)
          .orderBy(col("grp"), col("rk")),
      Some("""WITH c AS (SELECT source AS grp, CAST(count(*) AS BIGINT) AS n_rows
             |  FROM documents GROUP BY 1),
             |t AS (SELECT *, sum(n_rows) OVER () AS t FROM c),
             |b AS (SELECT *, (197 * n_rows) // t AS base,
             |    (197 * n_rows) % t AS rem FROM t),
             |a AS (SELECT grp,
             |    base + CASE WHEN row_number() OVER (ORDER BY rem DESC, grp)
             |      <= 197 - sum(base) OVER () THEN 1 ELSE 0 END AS alloc
             |  FROM b),
             |s AS (SELECT doc_id AS doc, source AS grp,
             |    md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
             |r AS (SELECT doc, grp,
             |    CAST(row_number() OVER (PARTITION BY grp ORDER BY h, doc) AS BIGINT)
             |      AS rk
             |  FROM s)
             |SELECT r.doc, r.grp, r.rk, CAST(a.alloc AS BIGINT) AS alloc
             |FROM r JOIN a USING (grp) WHERE rk <= alloc
             |ORDER BY grp, rk""".stripMargin),
      "exact stratified sample of 197 documents across sources: Hamilton " +
        "allocation decides each group's count, smallest-md5 order draws it — " +
        "stateless, rerun-stable, sums EXACTLY to the budget; bounded allocation " +
        "broadcast back over one per-group rank"),

    // ---- URL/host web curation (the CCNet/RefinedWeb front half) ----
    // The corpus has no URL column, so both engines derive a DETERMINISTIC
    // messy URL per document from (doc_id, source) — every canonicalizer
    // rule exercised: scheme/host case, www., default ports, trailing
    // slash, utm_*/ref tracking params, fragments. The DuckDB oracle
    // states the EXPECTED canonical form from first principles (not a
    // replay of the regex chain), so it independently pins the rule set.

    "q262_url_canonicalize" -> Q(
      (s, dir) =>
        Tables.table(s, dir, "documents")
          .select(col("doc_id"),
            WebCuration.canonicalUrl(messyUrlA).as("canon_url"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  'http' || CASE WHEN doc_id % 3 = 0 THEN 's' ELSE '' END
             |  || '://' || source || '.example.com/Articles/'
             |  || CAST(doc_id // 7 AS VARCHAR)
             |  || CASE WHEN doc_id % 7 = 0 THEN ''
             |       WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id % 97 AS VARCHAR)
             |       WHEN doc_id % 3 = 2 THEN
             |         '?id=' || CAST(doc_id % 97 AS VARCHAR) || '&page=2'
             |       ELSE '' END AS canon_url
             |FROM documents ORDER BY doc_id""".stripMargin),
      "canonical-URL normalization (codegen url_canonicalize): fragment " +
        "dropped, scheme+host lowercased, www./default-port stripped, " +
        "utm_*/ref tracking params removed order-preserving, trailing slash " +
        "collapsed — map-only, the pre-dedup key of the web-curation recipe"),

    "q263_url_dedup" -> Q(
      (s, dir) =>
        WebCuration.urlKeyDedup(
            Tables.table(s, dir, "documents").withColumn("__url", messyUrlB),
            "__url", "doc_id")
          .orderBy(col("canon_url")),
      Some("""WITH c AS (SELECT doc_id,
             |  'http://site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/p/'
             |    || CAST(doc_id // 35 AS VARCHAR) AS canon_url
             |  FROM documents)
             |SELECT canon_url, CAST(min(doc_id) AS BIGINT) AS keep_id,
             |  CAST(count(*) AS BIGINT) AS n_variants
             |FROM c GROUP BY 1 ORDER BY canon_url""".stripMargin),
      "URL-keyed exact dedup: canonicalize (case/www/port/slash/utm noise " +
        "collapses 5-variant groups), ONE hash aggregation on the canonical " +
        "key keeping min doc_id — the cheapest dedup pass, run before any " +
        "content shingling at web scale"),

    "q264_domain_stats" -> Q(
      (s, dir) => {
        val stats = WebCuration.domainStats(
          Tables.table(s, dir, "documents").withColumn("__url", messyUrlA),
          "__url", "text", "n_chars")
        // deterministic md5-gated blocklist (~half the domains) standing in
        // for the curated list a real pipeline broadcasts
        val block = stats.select(col("domain"))
          .filter(substring(md5(col("domain")), 1, 1) < "8")
        WebCuration.withBlocklist(stats, block).orderBy(col("domain"))
      },
      Some("""WITH d AS (SELECT source || '.example.com' AS domain,
             |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |      t -> len(t) > 0)) AS nt,
             |    n_chars FROM documents),
             |s AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(nt) AS BIGINT) AS n_tokens,
             |    CAST((1000000 * CAST(sum(n_chars) AS HUGEINT)) // count(*)
             |      AS BIGINT) AS mean_chars_micro
             |  FROM d GROUP BY 1)
             |SELECT domain, n_docs, n_tokens, mean_chars_micro,
             |  CAST(CASE WHEN substring(md5(domain), 1, 1) < '8' THEN 1 ELSE 0 END
             |    AS BIGINT) AS blocked
             |FROM s ORDER BY domain""".stripMargin),
      "per-domain curation ledger: docs, whitespace tokens, mean chars in " +
        "exact micro per registered domain (ONE domain-keyed aggregation — " +
        "domain-cardinality-bounded), plus a broadcast blocklist flag join " +
        "(md5-gated deterministic stand-in for the curated list)"),

    "q292_html_extract" -> Q(
      (s, dir) => {
        // REAL markup in, per-line extraction signals out: htmlWrap
        // synthesizes a full HTML page per document (head noise, nav
        // links, title, the document text split across div+p, a
        // related-links list, an entity-bearing footer — the wavBytes
        // discipline applied to markup), and extractMainContent strips
        // script/style, breaks at block tags, and scores each candidate
        // line by visible-text length and link density. The oracle
        // replays BOTH the generator and the extractor, so the hash
        // match round-trips the whole boilerplate-removal stage.
        val docs = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        WebCuration.extractMainContent(
            docs.withColumn("page",
              WebCuration.htmlWrap(col("doc_id"), col("text"))),
            "page", "doc_id")
          .orderBy(col("doc"), col("line_no"))
      },
      Some("""WITH pg AS (SELECT doc_id AS doc,
             |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
             |    '</title><style>body { color: #222; }</style><script>var page = ' ||
             |    CAST(doc_id AS VARCHAR) ||
             |    '; if (page > 0) { track(page); }</script></head><body>' ||
             |    '<nav><a href="/">Home</a> <a href="/about">About us</a> ' ||
             |    '<a href="/tag">Tag ' || CAST(doc_id % 7 AS VARCHAR) ||
             |    '</a></nav><h1>Title ' || CAST(doc_id AS VARCHAR) ||
             |    '</h1><div>' || substring(text, 1, len(text) // 2) ||
             |    '</div><p>' || substring(text, len(text) // 2 + 1) ||
             |    '</p><ul><li><a href="/r1">Related one</a></li>' ||
             |    '<li><a href="/r2">Related two</a></li></ul>' ||
             |    '<footer>&copy; Site &amp; friends <a href="/tos">Terms &amp; ' ||
             |    'conditions</a></footer></body></html>' AS page
             |  FROM documents),
             |ln AS (SELECT doc, string_split(regexp_replace(regexp_replace(page,
             |    '(?is)<script[^>]*>.*?</script\s*>|<style[^>]*>.*?</style\s*>',
             |    ' ', 'g'),
             |    '(?i)</?(?:p|div|br|li|tr|h[1-6]|ul|ol|table|section|article|header|footer|nav|blockquote)\b[^>]*/?>',
             |    chr(10), 'g'), chr(10)) AS ls FROM pg),
             |lx0 AS (SELECT doc, ls,
             |    unnest(generate_series(1, CAST(len(ls) AS BIGINT))) AS i FROM ln),
             |lx AS (SELECT doc, i - 1 AS line_no, ls[i] AS raw FROM lx0),
             |tx AS (SELECT doc, line_no, raw,
             |    trim(regexp_replace(replace(replace(replace(replace(replace(replace(
             |      regexp_replace(raw, '<[^>]*>', '', 'g'),
             |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
             |      '&nbsp;', ' '), '&amp;', '&'), '\s+', ' ', 'g')) AS text,
             |    coalesce(list_sum(list_transform(
             |      regexp_extract_all(raw, '(?is)<a\b[^>]*>(.*?)</a\s*>', 1),
             |      a -> len(trim(regexp_replace(replace(replace(replace(replace(replace(replace(
             |        regexp_replace(a, '<[^>]*>', '', 'g'),
             |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
             |        '&nbsp;', ' '), '&amp;', '&'), '\s+', ' ', 'g'))))), 0) AS link_len
             |  FROM lx)
             |SELECT doc, CAST(line_no AS BIGINT) AS line_no, text,
             |  CAST(len(text) AS BIGINT) AS text_len,
             |  CAST(link_len AS BIGINT) AS link_len,
             |  CAST((10000 * link_len) // len(text) AS BIGINT) AS link_bps,
             |  (len(text) >= 25 AND link_len * 10000 <= len(text) * 3300) AS keep
             |FROM tx WHERE len(text) >= 1 ORDER BY doc, line_no""".stripMargin),
      "HTML main-content extraction (markup-level boilerplate removal, the " +
        "trafilatura-class first transform of a web-crawl pipeline): script/style " +
        "dropped, lines split at block tags, per-line visible-text length + anchor-text " +
        "link density in exact integer bps, keep = long-enough AND low-link-share; " +
        "oracle replays generator + extractor (RE2-safe patterns, no backreferences)"),

    "q302_robots_rules" -> Q(
      (s, dir) => {
        // the FETCH side of the crawl story (RFC 9309 — the Robots
        // Exclusion Protocol): robotsSynth writes a deterministic
        // robots.txt per host covering every parse class (comments,
        // mixed-case fields, consecutive user-agent lines sharing a
        // group, the empty-Disallow allow-all sentinel, a stray rule
        // before any group), and robotsRules parses it into the rule
        // table with RFC group semantics. The oracle replays generator
        // + parser (same windowed group assignment).
        val hosts = Tables.table(s, dir, "documents")
          .select((col("doc_id") % 40).as("host")).distinct()
        WebCuration.robotsRules(
            hosts.withColumn("robots", WebCuration.robotsSynth(col("host"))),
            "robots", "host")
          .orderBy(col("host"), col("line_no"))
      },
      Some(s"""$robotsRulesWith
              |SELECT host, CAST(grp AS BIGINT) AS grp,
              |  CAST(line_no AS BIGINT) AS line_no, directive, value
              |FROM gx WHERE grp >= 1 ORDER BY host, line_no""".stripMargin),
      "robots.txt parser (RFC 9309): comments stripped, case-insensitive fields, " +
        "group = maximal run of consecutive user-agent lines + following rules, " +
        "pre-group rules dropped; one per-host window for group assignment (robots " +
        "files are KB-sized control-plane data); oracle replays generator + parser"),

    "q303_robots_gate" -> Q(
      (s, dir) => {
        // REP evaluation for one crawler identity over a URL frontier:
        // group selection (the bot's own group when the host has one,
        // else `*` — rule ISOLATION between groups is the subtle part:
        // an even host's graftbot group does NOT inherit the `*`
        // group's /private rules), longest path-prefix match, allow
        // wins length ties, no-match means allowed, crawl-delay from
        // the chosen group.
        val docs = Tables.table(s, dir, "documents")
        val urls = docs.select(col("doc_id"),
          (col("doc_id") % 40).as("host"),
          robotsProbePath.as("path"))
        val rules = WebCuration.robotsRules(
          urls.select(col("host")).distinct()
            .withColumn("robots", WebCuration.robotsSynth(col("host"))),
          "robots", "host")
        WebCuration.robotsAllowed(urls, rules, "graftbot")
          .select(col("doc_id"), col("host"), col("path"), col("allowed"),
            col("crawl_delay_s"))
          .orderBy(col("doc_id"))
      },
      Some(s"""$robotsRulesWith,
              |$robotsEvalWith
              |SELECT doc_id, host, path, coalesce(is_allow, true) AS allowed,
              |  coalesce(d.crawl_delay_s, 1) AS crawl_delay_s
              |FROM best LEFT JOIN delays d USING (host)
              |ORDER BY doc_id""".stripMargin),
      "Robots Exclusion Protocol evaluation: per-host group selection with exact-agent-" +
        "over-star precedence and RFC group isolation, longest path-prefix match with " +
        "allow winning ties, unmatched paths allowed, crawl-delay resolved from the " +
        "chosen group — rules are host-bounded broadcast data, the longest-match pick " +
        "is one url-keyed aggregation (no corpus-wide window)"),

    "q304_crawl_frontier" -> Q(
      (s, dir) => {
        // the politeness-scheduled frontier: allowed URLs fetch in
        // priority order within their host, one slot per crawl-delay —
        // the per-host window IS the fetcher's sharding unit (a frontier
        // is consumed host-by-host; no global order exists or is wanted)
        val docs = Tables.table(s, dir, "documents")
        val urls = docs.select(col("doc_id"),
          (col("doc_id") % 40).as("host"),
          robotsProbePath.as("path"),
          col("n_chars").cast("bigint").as("priority"))
        val rules = WebCuration.robotsRules(
          urls.select(col("host")).distinct()
            .withColumn("robots", WebCuration.robotsSynth(col("host"))),
          "robots", "host")
        WebCuration.frontierSchedule(
            WebCuration.robotsAllowed(urls, rules, "graftbot"),
            "host", "priority", "doc_id")
          .select(col("doc_id"), col("host"), col("priority"), col("slot"),
            col("fetch_offset_s"))
          .orderBy(col("host"), col("slot"))
      },
      Some(s"""$robotsRulesWith,
              |$robotsEvalWith,
              |gated AS (SELECT b.doc_id, b.host, u2.priority,
              |    coalesce(d.crawl_delay_s, 1) AS cd
              |  FROM best b
              |  JOIN (SELECT doc_id, CAST(n_chars AS BIGINT) AS priority
              |        FROM documents) u2 USING (doc_id)
              |  LEFT JOIN delays d USING (host)
              |  WHERE coalesce(b.is_allow, true)),
              |sched AS (SELECT doc_id, host, priority,
              |    CAST(row_number() OVER (PARTITION BY host
              |      ORDER BY priority DESC, doc_id) AS BIGINT) AS slot, cd
              |  FROM gated)
              |SELECT doc_id, host, priority, slot,
              |  CAST((slot - 1) * cd AS BIGINT) AS fetch_offset_s
              |FROM sched ORDER BY host, slot""".stripMargin),
      "politeness-scheduled crawl frontier: REP-allowed URLs ranked by priority within " +
        "each host, one fetch slot per crawl-delay second — per-host windows only (the " +
        "fetcher's natural sharding unit), rules broadcast, exact integer offsets"),

    "q305_sitemap_discovery" -> Q(
      (s, dir) => {
        // crawl DISCOVERY: per-host sitemap.xml parsed through Spark's
        // NATIVE from_xml (declaration + xmlns ignored, entries in
        // document order, optional lastmod/priority NULL where the
        // protocol omits them), each discovered URL then gated by the
        // host's robots rules — the discovery → politeness composition
        // a fetcher runs before anything enters the frontier. Oracle
        // replays the decoded-content formula (the container-oracle
        // convention: loc/lastmod/priority are closed functions of
        // (host, entry)), never the XML bytes.
        val hosts = Tables.table(s, dir, "documents")
          .select((col("doc_id") % 40).as("host")).distinct()
        val discovered = WebCuration.sitemapUrls(
            hosts.withColumn("xml", WebCuration.sitemapSynth(col("host"))),
            "xml", "host")
          .withColumn("path",
            regexp_replace(col("loc"), "^[a-z]+://[^/]+", ""))
        val rules = WebCuration.robotsRules(
          hosts.withColumn("robots", WebCuration.robotsSynth(col("host"))),
          "robots", "host")
        WebCuration.robotsAllowed(discovered, rules, "graftbot")
          .select(col("host"), col("entry_no"), col("loc"), col("lastmod"),
            col("priority"), col("allowed"), col("crawl_delay_s"))
          .orderBy(col("host"), col("entry_no"))
      },
      Some(s"""$robotsRulesWith,
              |$robotsChosenWith,
              |sent AS (SELECT host,
              |    unnest(generate_series(0, host % 4 + 2)) AS i FROM h),
              |smu AS (SELECT host, CAST(i AS BIGINT) AS entry_no,
              |    'http://host' || CAST(host AS VARCHAR) || '.example.com' ||
              |    CASE WHEN (host + i) % 4 = 0 THEN '/private/doc' || CAST(i AS VARCHAR)
              |         WHEN (host + i) % 4 = 1 THEN '/tag/ok/' || CAST(i AS VARCHAR)
              |         WHEN (host + i) % 4 = 2 THEN '/tag/' || CAST(i AS VARCHAR)
              |         ELSE '/Articles/' || CAST(i AS VARCHAR) END AS loc,
              |    CASE WHEN (host + i) % 3 <> 0 THEN '2026-01-' ||
              |      lpad(CAST((host + i) % 28 + 1 AS VARCHAR), 2, '0') END AS lastmod,
              |    CASE WHEN (host + i) % 5 <> 0
              |      THEN '0.' || CAST((host + i) % 9 + 1 AS VARCHAR) END AS priority
              |  FROM sent),
              |smp AS (SELECT *, regexp_replace(loc, '^[a-z]+://[^/]+', '') AS path
              |  FROM smu),
              |cand2 AS (SELECT s.host, s.entry_no, s.loc, s.lastmod, s.priority,
              |    r.is_allow, len(r.rule_path) AS l
              |  FROM smp s LEFT JOIN prules r
              |    ON s.host = r.host AND starts_with(s.path, r.rule_path)),
              |best2 AS (SELECT host, entry_no, loc, lastmod, priority, is_allow
              |  FROM cand2
              |  QUALIFY row_number() OVER (PARTITION BY host, entry_no
              |    ORDER BY l DESC NULLS LAST, is_allow DESC) = 1)
              |SELECT host, entry_no, loc, lastmod, priority,
              |  coalesce(is_allow, true) AS allowed,
              |  coalesce(d.crawl_delay_s, 1) AS crawl_delay_s
              |FROM best2 LEFT JOIN delays d USING (host)
              |ORDER BY host, entry_no""".stripMargin),
      "sitemap discovery gated by robots: per-host Sitemaps-0.9 XML parsed with Spark's " +
        "native from_xml (document order, optional elements NULL), discovered URLs " +
        "evaluated under the host's REP rules with the chosen group's crawl-delay — " +
        "the discovery -> politeness composition ahead of the frontier; oracle replays " +
        "the decoded-content formula, never the XML bytes (the container convention)"),

    "q306_cdc_chunks" -> Q(
      (s, dir) => {
        // CONTENT-DEFINED chunking (the LBFS/rsync/FastCDC idea):
        // boundaries come from a rolling md5 window over the text, so a
        // copy with an inserted prefix keeps every interior chunk hash.
        // The union plants exactly that case — each doc_id%10==0 doc
        // reappears with an 8-char prefix under id+1000000 — making the
        // shift resistance part of the oracled surface, not a spec-only
        // claim: the shifted copy's chunks re-align after the first
        // content boundary and hash-match the original's.
        Dedup.cdcChunks(cdcCorpus(s, dir), "text", "doc_id")
          .orderBy(col("doc"), col("chunk_no"))
      },
      Some(s"""${cdcChunksWith()}
              |SELECT doc, CAST(chunk_no AS BIGINT) AS chunk_no,
              |  CAST(c_start AS BIGINT) AS c_start,
              |  CAST(clen AS BIGINT) AS chunk_len,
              |  md5(substring(text, CAST(c_start AS INT), CAST(clen AS INT)))
              |    AS chunk_hash
              |FROM ch WHERE clen >= 1 ORDER BY doc, chunk_no""".stripMargin),
      "content-defined chunking (rolling-md5 boundary predicate, 8-char window, " +
        "8/256 rate): chunks tile each doc between content-positioned boundaries, " +
        "so interior chunk hashes survive prefix insertion (planted shifted copies " +
        "in the corpus demonstrate it under the oracle); ONE map-only pass — " +
        "per-doc arrays, no shuffle, no window function"),

    "q307_cdc_dedup" -> Q(
      (s, dir) => {
        // the shift-resistant dupSpans: duplicated = same (hash, len)
        // chunk in >= 2 distinct docs; each planted shifted copy scores
        // near-full coverage against its original even though every
        // byte offset moved — the case fixed-offset L-gram sampling
        // (q73's stride) structurally misses.
        Dedup.cdcDedup(cdcCorpus(s, dir), "text", "doc_id")
          .orderBy(col("doc"))
      },
      Some(s"""${cdcChunksWith()},
              |ch2 AS (SELECT doc,
              |    md5(substring(text, CAST(c_start AS INT), CAST(clen AS INT)))
              |      AS h, clen
              |  FROM ch WHERE clen >= 1),
              |dup AS (SELECT h, clen FROM ch2 GROUP BY h, clen
              |  HAVING count(DISTINCT doc) >= 2)
              |SELECT c.doc, CAST(count(*) AS BIGINT) AS n_chunks,
              |  CAST(sum(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END)
              |    AS BIGINT) AS n_dup_chunks,
              |  CAST(sum(c.clen) AS BIGINT) AS total_chars,
              |  CAST(sum(CASE WHEN d.h IS NOT NULL THEN c.clen ELSE 0 END)
              |    AS BIGINT) AS dup_chars,
              |  CAST((10000 * sum(CASE WHEN d.h IS NOT NULL THEN c.clen
              |    ELSE 0 END)) // sum(c.clen) AS BIGINT) AS dup_bps
              |FROM ch2 c LEFT JOIN dup d ON c.h = d.h AND c.clen = d.clen
              |GROUP BY c.doc ORDER BY c.doc""".stripMargin),
      "cross-document duplicate-chunk coverage over content-defined chunks — the " +
        "shift-resistant exact-substring dedup signal: chunk df via ONE hash-keyed " +
        "aggregation (map-side combine absorbs boilerplate-chunk skew), one join " +
        "back, one doc-keyed rollup; exact integer bps, never a pairwise compare"),

    "q308_redirect_resolve" -> Q(
      (s, dir) => {
        // canonical-alias resolution ahead of URL dedup: walk each url
        // through the redirect map at most 4 hops. The synthesized map
        // covers plain chains (3->6->9->10), a 2-cycle (0<->1 mod 50),
        // and a chain INTO a cycle (99->100<->101) — the classes a
        // bounded resolver must terminate on and flag unresolved.
        val docs = Tables.table(s, dir, "documents")
        val redirects = docs.select(col("doc_id").as("src"),
            WebCuration.redirectSynth(col("doc_id")).as("dst"))
          .filter(col("dst").isNotNull)
        WebCuration.resolveRedirects(
            docs.select(col("doc_id").as("url")), redirects,
            "url", "src", "dst", maxHops = 4)
          .orderBy(col("url"))
      },
      Some("""WITH r0 AS (SELECT doc_id AS src,
             |    CASE WHEN doc_id % 50 = 0 THEN doc_id + 1
             |         WHEN doc_id % 50 = 1 THEN doc_id - 1
             |         WHEN doc_id % 3 = 0 THEN
             |           CASE WHEN doc_id % 9 = 0 THEN doc_id + 1
             |                ELSE doc_id + 3 END
             |    END AS dst FROM documents),
             |r AS (SELECT src, min(dst) AS dst FROM r0
             |  WHERE dst IS NOT NULL GROUP BY src),
             |h0 AS (SELECT doc_id AS url, doc_id AS f, 0 AS hops
             |  FROM documents),
             |h1 AS (SELECT url, coalesce(r.dst, f) AS f,
             |    hops + CASE WHEN r.dst IS NULL THEN 0 ELSE 1 END AS hops
             |  FROM h0 LEFT JOIN r ON h0.f = r.src),
             |h2 AS (SELECT url, coalesce(r.dst, f) AS f,
             |    hops + CASE WHEN r.dst IS NULL THEN 0 ELSE 1 END AS hops
             |  FROM h1 LEFT JOIN r ON h1.f = r.src),
             |h3 AS (SELECT url, coalesce(r.dst, f) AS f,
             |    hops + CASE WHEN r.dst IS NULL THEN 0 ELSE 1 END AS hops
             |  FROM h2 LEFT JOIN r ON h2.f = r.src),
             |h4 AS (SELECT url, coalesce(r.dst, f) AS f,
             |    hops + CASE WHEN r.dst IS NULL THEN 0 ELSE 1 END AS hops
             |  FROM h3 LEFT JOIN r ON h3.f = r.src)
             |SELECT h4.url, h4.f AS final_url, CAST(h4.hops AS BIGINT) AS hops,
             |  (r.src IS NULL) AS resolved
             |FROM h4 LEFT JOIN r ON h4.f = r.src
             |ORDER BY h4.url""".stripMargin),
      "bounded redirect-chain resolution (HTTP 3xx aliasing -> canonical URL): 4 " +
        "hash equi-joins on the current-location key (constant hop count, the " +
        "client-cap shape; Spark reuses the map side's exchange), terminal/chain/" +
        "cycle/chain-into-cycle classes all exercised, unresolved walks flagged " +
        "rather than iterated to fixpoint"),

    "q309_recrawl_schedule" -> Q(
      (s, dir) => {
        // freshness loop: per-url fetch history (4 + doc%5 daily probes;
        // probe j changed iff the first md5 hex of 'doc#j' < '4' — a
        // deterministic ~25% change rate, portable to the oracle), then
        // the exact-rational Cho-Garcia-Molina schedule: recrawl every
        // observed-window DIV changes seconds, clamped to [1h, 30d].
        val docs = Tables.table(s, dir, "documents")
        val hist = docs.select(col("doc_id"))
          .withColumn("obs_no",
            explode(sequence(lit(1), (col("doc_id") % 5 + 4).cast("int"))))
          .withColumn("changed",
            substring(md5(concat(col("doc_id").cast("string"), lit("#"),
              col("obs_no").cast("string"))), 1, 1) < lit("4"))
        WebCuration.recrawlSchedule(hist, "doc_id", "changed",
            obsIntervalS = 86400L, minIntervalS = 3600L,
            maxIntervalS = 2592000L)
          .orderBy(col("url"))
      },
      Some("""WITH h0 AS (SELECT doc_id,
             |    unnest(generate_series(1, doc_id % 5 + 4)) AS obs_no
             |  FROM documents),
             |h AS (SELECT doc_id AS url,
             |    substring(md5(CAST(doc_id AS VARCHAR) || '#' ||
             |      CAST(obs_no AS VARCHAR)), 1, 1) < '4' AS changed
             |  FROM h0),
             |a AS (SELECT url, count(*) AS n_obs,
             |    sum(CASE WHEN changed THEN 1 ELSE 0 END) AS n_changed
             |  FROM h GROUP BY url)
             |SELECT url, CAST(n_obs AS BIGINT) AS n_obs,
             |  CAST(n_changed AS BIGINT) AS n_changed,
             |  CAST((1000000 * n_changed) // n_obs AS BIGINT) AS change_ppm,
             |  CAST(CASE WHEN n_changed = 0 THEN 2592000
             |    ELSE least(greatest((n_obs * 86400) // n_changed, 3600),
             |      2592000) END AS BIGINT) AS recrawl_interval_s
             |FROM a ORDER BY url""".stripMargin),
      "change-rate-driven recrawl scheduling (the Cho-Garcia-Molina freshness " +
        "problem on the exact-rational estimator): ONE url-keyed aggregation over " +
        "the fetch log with map-side combine, interval = window DIV changes " +
        "clamped to [1h, 30d] — exact integers, no float MLE"),

    "q310_cdc_delta_dedup" -> Q(
      (s, dir) => {
        // the incremental crawl-vs-corpus question: how much of a fetch
        // batch is already stored, byte-for-byte, at any alignment.
        // Base = docs < 250's stored chunk table; delta = the rest PLUS
        // two planted classes — shifted copies of base docs (%10==0,
        // id+1000000: must score as dup_base through content-positioned
        // chunks) and shifted copies of delta docs (%10==5, id+2000000:
        // dup_delta pairs). delta x base + delta x delta only — the
        // stored base is never self-joined.
        val docs = Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val base = docs.filter(col("doc_id") < 250)
        val delta = docs.filter(col("doc_id") >= 250)
          .unionByName(base.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"),
              concat(lit("SHIFT>> "), col("text")).as("text")))
          .unionByName(docs
            .filter(col("doc_id") >= 250 && col("doc_id") % 10 === 5)
            .select((col("doc_id") + 2000000L).as("doc_id"),
              concat(lit("SHIFT>> "), col("text")).as("text")))
        Dedup.cdcDedupAgainstBase(
            Dedup.cdcChunks(base, "text", "doc_id"), delta,
            "text", "doc_id")
          .orderBy(col("doc"))
      },
      Some(s"""${cdcChunksWith(
               """SELECT doc_id AS doc, text FROM documents
                 |  UNION ALL
                 |  SELECT doc_id + 1000000, 'SHIFT>> ' || text FROM documents
                 |  WHERE doc_id < 250 AND doc_id % 10 = 0
                 |  UNION ALL
                 |  SELECT doc_id + 2000000, 'SHIFT>> ' || text FROM documents
                 |  WHERE doc_id >= 250 AND doc_id % 10 = 5""".stripMargin)},
              |chh AS (SELECT doc,
              |    md5(substring(text, CAST(c_start AS INT), CAST(clen AS INT)))
              |      AS h, clen
              |  FROM ch WHERE clen >= 1),
              |basek AS (SELECT DISTINCT h, clen FROM chh WHERE doc < 250),
              |dch AS (SELECT * FROM chh WHERE doc >= 250),
              |dsh AS (SELECT h, clen FROM dch GROUP BY h, clen
              |  HAVING count(DISTINCT doc) >= 2)
              |SELECT d.doc, CAST(count(*) AS BIGINT) AS n_chunks,
              |  CAST(sum(CASE WHEN b.h IS NOT NULL OR s.h IS NOT NULL
              |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
              |  CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END)
              |    AS BIGINT) AS dup_base_chunks,
              |  CAST(sum(CASE WHEN b.h IS NULL AND s.h IS NOT NULL
              |    THEN 1 ELSE 0 END) AS BIGINT) AS dup_delta_chunks,
              |  CAST(sum(d.clen) AS BIGINT) AS total_chars,
              |  CAST(sum(CASE WHEN b.h IS NOT NULL OR s.h IS NOT NULL
              |    THEN d.clen ELSE 0 END) AS BIGINT) AS dup_chars,
              |  CAST((10000 * sum(CASE WHEN b.h IS NOT NULL OR s.h IS NOT NULL
              |    THEN d.clen ELSE 0 END)) // sum(d.clen) AS BIGINT) AS dup_bps
              |FROM dch d
              |LEFT JOIN basek b ON d.h = b.h AND d.clen = b.clen
              |LEFT JOIN dsh s ON d.h = s.h AND d.clen = s.clen
              |GROUP BY d.doc ORDER BY d.doc""".stripMargin),
      "incremental content-defined dedup: delta batch scored against the STORED " +
        "base chunk table (delta x base + delta x delta, never base x base — the " +
        "against-base discipline on CDC chunks); base read once through a " +
        "key-distinct aggregation, delta chunked map-only into two hash joins; " +
        "planted shifted copies prove both dup classes under the oracle")
  )

  /** q306/q307's corpus: documents plus a prefix-shifted copy of every
    * tenth doc under id+1000000 — the planted shift-duplication case. */
  private def cdcCorpus(
      s: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("text"))
    docs.unionByName(
      docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("SHIFT>> "), col("text")).as("text")))
  }

  // the q306/q307 corpus in SQL (documents + prefix-shifted tenth docs)
  private def cdcCorpusSql =
    """SELECT doc_id AS doc, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, 'SHIFT>> ' || text FROM documents
      |  WHERE doc_id % 10 = 0""".stripMargin

  // the content-defined chunk table replayed in SQL over `corpusSql`
  // (shared by q306/q307/q310): leaves `ch` (doc, chunk_no, c_start,
  // clen, text) in scope — the clen >= 1 filter is NOT yet applied
  private def cdcChunksWith(corpusSql: String = cdcCorpusSql) =
    s"""WITH corpus AS (
      |  $corpusSql),
      |d AS (SELECT doc, text, len(text) AS l FROM corpus),
      |b AS (SELECT doc, text, l,
      |    CASE WHEN l <= 8 THEN [] ELSE list_filter(
      |      generate_series(8, CAST(l - 1 AS BIGINT)),
      |      i -> substring(md5(substring(text, CAST(i - 7 AS INT), 8)),
      |        1, 2) < '08') END AS bnds
      |  FROM d),
      |st AS (SELECT doc, text, l,
      |    list_concat([CAST(1 AS BIGINT)],
      |      list_transform(bnds, x -> x + 1)) AS ss,
      |    list_concat(bnds, [CAST(l AS BIGINT)]) AS es FROM b),
      |ex AS (SELECT doc, text, ss, es,
      |    unnest(generate_series(1, CAST(len(ss) AS BIGINT))) AS k
      |  FROM st),
      |ch AS (SELECT doc, k - 1 AS chunk_no, ss[k] AS c_start,
      |    es[k] - ss[k] + 1 AS clen, text FROM ex)""".stripMargin

  // deterministic probe paths exercising every REP rule class: /private
  // (star-group disallow), /private/pub (star-group allow override),
  // /tag and /tag/ok (bot-group rules — group ISOLATION on even hosts),
  // and a plain article path (no rule -> allowed)
  private def robotsProbePath =
    when(col("doc_id") % 6 === 0,
      concat(lit("/private/doc"), col("doc_id").cast("string")))
      .when(col("doc_id") % 6 === 1,
        concat(lit("/private/pub/doc"), col("doc_id").cast("string")))
      .when(col("doc_id") % 6 === 2,
        concat(lit("/tag/"), col("doc_id").cast("string")))
      .when(col("doc_id") % 6 === 3,
        concat(lit("/tag/ok/"), col("doc_id").cast("string")))
      .otherwise(concat(lit("/Articles/"), expr("doc_id DIV 7").cast("string")))

  // the q302 generator + parser replayed in SQL (shared by q302/q303/q304):
  // leaves `gx` (parsed rule rows with group ids) in scope
  private def robotsRulesWith =
    """WITH h AS (SELECT DISTINCT doc_id % 40 AS host FROM documents),
      |rb AS (SELECT host,
      |  '# graft robots, host ' || CAST(host AS VARCHAR) || chr(10) ||
      |  CASE WHEN host % 11 = 0 THEN 'Disallow: /orphan' || chr(10) ELSE '' END ||
      |  CASE WHEN host % 5 = 0 THEN 'user-agent: *' ELSE 'User-agent: *' END || chr(10) ||
      |  'Disallow: /private' || chr(10) ||
      |  CASE WHEN host % 3 = 0 THEN 'Allow: /private/pub' || chr(10) ELSE '' END ||
      |  CASE WHEN host % 7 = 0 THEN 'Disallow:' || chr(10) ELSE '' END ||
      |  'Crawl-delay: ' || CAST(host % 5 + 1 AS VARCHAR) || chr(10) ||
      |  CASE WHEN host % 2 = 0 THEN chr(10) || '# bot group' || chr(10) ||
      |    'User-agent: graftbot' || chr(10) ||
      |    CASE WHEN host % 4 = 0 THEN 'User-agent: otherbot' || chr(10) ELSE '' END ||
      |    'Disallow: /tag' || chr(10) || 'Allow: /tag/ok' || chr(10) ||
      |    'Crawl-delay: ' || CAST(host % 3 + 1 AS VARCHAR) || chr(10)
      |  ELSE '' END AS robots FROM h),
      |ln0 AS (SELECT host, string_split(robots, chr(10)) AS ls FROM rb),
      |lxr0 AS (SELECT host, ls,
      |  unnest(generate_series(1, CAST(len(ls) AS BIGINT))) AS i FROM ln0),
      |lxr AS (SELECT host, i - 1 AS line_no, ls[i] AS raw FROM lxr0),
      |px AS (SELECT host, line_no,
      |    lower(trim(regexp_extract(clean, '^([A-Za-z-]+)\s*:', 1))) AS directive,
      |    trim(regexp_extract(clean, '^[A-Za-z-]+\s*:\s*(.*)$', 1)) AS value
      |  FROM (SELECT host, line_no, trim(regexp_replace(raw, '#.*', '')) AS clean
      |        FROM lxr)
      |  WHERE lower(trim(regexp_extract(clean, '^([A-Za-z-]+)\s*:', 1)))
      |    IN ('user-agent', 'allow', 'disallow', 'crawl-delay')),
      |gx AS (SELECT host, line_no, directive, value,
      |    SUM(CASE WHEN directive = 'user-agent'
      |        AND (prev IS NULL OR prev <> 'user-agent') THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY host ORDER BY line_no) AS grp
      |  FROM (SELECT *, lag(directive)
      |      OVER (PARTITION BY host ORDER BY line_no) AS prev FROM px))""".stripMargin

  // graftbot's chosen groups, path rules, and crawl-delays (shared by
  // q303/q304/q305): leaves `prules` and `delays` in scope
  private def robotsChosenWith =
    """grx AS (SELECT * FROM gx WHERE grp >= 1),
      |uas AS (SELECT host, grp, value AS ua FROM grx
      |  WHERE directive = 'user-agent'),
      |hx AS (SELECT DISTINCT host FROM uas WHERE ua = 'graftbot'),
      |chosen AS (SELECT DISTINCT u.host, u.grp FROM uas u
      |  LEFT JOIN hx ON u.host = hx.host
      |  WHERE CASE WHEN hx.host IS NOT NULL THEN u.ua = 'graftbot'
      |        ELSE u.ua = '*' END),
      |prules AS (SELECT g.host, g.value AS rule_path,
      |    (g.directive = 'allow') AS is_allow
      |  FROM grx g JOIN chosen c ON g.host = c.host AND g.grp = c.grp
      |  WHERE g.directive IN ('allow', 'disallow') AND len(g.value) > 0),
      |delays AS (SELECT g.host,
      |    CAST(max(CAST(g.value AS BIGINT)) AS BIGINT) AS crawl_delay_s
      |  FROM grx g JOIN chosen c ON g.host = c.host AND g.grp = c.grp
      |  WHERE g.directive = 'crawl-delay' GROUP BY g.host)""".stripMargin

  // REP evaluation over the probe urls (q303/q304): leaves `best`
  // (per-url longest-match rule) in scope
  private def robotsEvalWith =
    s"""$robotsChosenWith,
      |urls AS (SELECT doc_id, doc_id % 40 AS host,
      |    CASE WHEN doc_id % 6 = 0 THEN '/private/doc' || CAST(doc_id AS VARCHAR)
      |         WHEN doc_id % 6 = 1 THEN '/private/pub/doc' || CAST(doc_id AS VARCHAR)
      |         WHEN doc_id % 6 = 2 THEN '/tag/' || CAST(doc_id AS VARCHAR)
      |         WHEN doc_id % 6 = 3 THEN '/tag/ok/' || CAST(doc_id AS VARCHAR)
      |         ELSE '/Articles/' || CAST(doc_id // 7 AS VARCHAR) END AS path
      |  FROM documents),
      |cand AS (SELECT u.doc_id, u.host, u.path, r.is_allow,
      |    len(r.rule_path) AS l
      |  FROM urls u LEFT JOIN prules r
      |    ON u.host = r.host AND starts_with(u.path, r.rule_path)),
      |best AS (SELECT doc_id, host, path, is_allow FROM cand
      |  QUALIFY row_number() OVER (PARTITION BY doc_id
      |    ORDER BY l DESC NULLS LAST, is_allow DESC) = 1)""".stripMargin

  // messy URL A: source-keyed host (q262/q264) — exercises every
  // canonicalizer rule; expected canonical derivable from first principles
  private def messyUrlA =
    concat(
      when(col("doc_id") % 3 === 0, lit("HTTPS://")).otherwise(lit("http://")),
      when(col("doc_id") % 2 === 0, lit("WWW.")).otherwise(lit("")),
      col("source"), lit(".Example.COM"),
      when(col("doc_id") % 5 === 0,
        when(col("doc_id") % 3 === 0, lit(":443")).otherwise(lit(":80")))
        .otherwise(lit("")),
      lit("/Articles/"), expr("doc_id DIV 7").cast("string"),
      when(col("doc_id") % 6 === 0, lit("/")).otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit("?utm_source=Feed&utm_medium=Mail"))
        .when(col("doc_id") % 3 === 1,
          concat(lit("?id="), (col("doc_id") % 97).cast("string"),
            lit("&utm_campaign=X")))
        .when(col("doc_id") % 3 === 2,
          concat(lit("?id="), (col("doc_id") % 97).cast("string"),
            lit("&ref=home&page=2")))
        .otherwise(lit("")),
      when(col("doc_id") % 6 === 3, lit("#Section-2")).otherwise(lit("")))

  // messy URL B: doc-keyed host/path with only canon-INVARIANT noise
  // (case, www., default port, trailing slash, utm, fragment), so each
  // (doc_id % 7, doc_id DIV 35) bucket collapses to one canonical URL
  private def messyUrlB =
    concat(
      when(col("doc_id") % 3 === 0, lit("HTTP://")).otherwise(lit("http://")),
      when(col("doc_id") % 2 === 0, lit("WWW.")).otherwise(lit("")),
      lit("site"), (col("doc_id") % 7).cast("string"), lit(".Example.COM"),
      when(col("doc_id") % 5 === 0, lit(":80")).otherwise(lit("")),
      lit("/p/"), expr("doc_id DIV 35").cast("string"),
      when(col("doc_id") % 6 === 0, lit("/")).otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit("?utm_source=Feed")).otherwise(lit("")),
      when(col("doc_id") % 6 === 3, lit("#x")).otherwise(lit("")))
}

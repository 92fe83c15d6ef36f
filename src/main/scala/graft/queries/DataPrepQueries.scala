package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{VectorFunctions => V}
import graft.operators.DataPrep

/** Training-set preparation queries (q66-q70): deterministic splits,
  * chunking, packing, TF-IDF, and embedding quantization — the stages
  * between "deduplicated corpus" and "training batches". All oracled:
  * every formulation sticks to engine-portable primitives (md5 hex,
  * integer window arithmetic, round-6 doubles, CSV-rendered arrays).
  */
object DataPrepQueries {

  val queries: Seq[(String, Q)] = Seq(

    "q66_train_test_split" -> Q(
      (s, dir) =>
        DataPrep.hashSplit(Tables.table(s, dir, "documents"), "doc_id", trainBps = 8000)
          .select(col("doc_id"), col("bucket"), col("split"))
          .orderBy(col("doc_id")),
      // 8000 bps of the 16^4 bucket space = hex cut 'cccc'; fixed-width
      // lowercase hex compares lexicographically == numerically
      Some("""SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS bucket,
             |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
             |       THEN 'train' ELSE 'test' END AS split
             |FROM documents ORDER BY doc_id""".stripMargin),
      "deterministic md5-bucket train/test split (stateless, rerun-stable)"),

    "q151_leakage_split" -> Q(
      (s, dir) => {
        val docs = Tables.table(s, dir, "documents")
        val pairs = graft.operators.Dedup.ngramJaccardPairs(
          docs, "text", "doc_id", shingleK = 5, threshold = 0.8)
        DataPrep.leakageSafeSplit(docs, "doc_id", pairs, trainBps = 8000)
          .select(col("doc_id"), col("component"), col("bucket"), col("split"))
          .orderBy(col("doc_id"))
      },
      // q39's recursive-CTE components over the same jaccard>=0.8 edges,
      // then q66's md5-bucket split keyed on the component representative
      // instead of the doc — near-dup clusters move between splits as one
      Some("""WITH RECURSIVE toks AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0) AS w
             |  FROM documents),
             |shg AS (
             |  SELECT doc_id,
             |    CASE WHEN len(w) <= 5 THEN [array_to_string(w, ' ')]
             |         ELSE list_transform(generate_series(1, len(w) - 4), i -> array_to_string(w[i:i+4], ' '))
             |    END AS shingles
             |  FROM toks),
             |sets AS (SELECT doc_id, list_distinct(shingles) AS sh FROM shg),
             |ex AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS s FROM sets),
             |inter AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
             |    CAST(count(*) AS DOUBLE) AS i
             |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2, 3, 4),
             |pairs AS (SELECT id_a, id_b FROM inter WHERE i / (sz_a + sz_b - i) >= 0.8),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION ALL SELECT id_b, id_a FROM pairs),
             |walk(id, lbl) AS (
             |  SELECT doc_id, doc_id FROM documents
             |  UNION
             |  SELECT e.dst, walk.lbl FROM walk JOIN edges e ON e.src = walk.id),
             |cc AS (SELECT id, min(lbl) AS component FROM walk GROUP BY id)
             |SELECT d.doc_id, c.component,
             |  substr(md5(CAST(c.component AS VARCHAR)), 1, 4) AS bucket,
             |  CASE WHEN substr(md5(CAST(c.component AS VARCHAR)), 1, 4) < 'cccc'
             |       THEN 'train' ELSE 'test' END AS split
             |FROM documents d JOIN cc c ON c.id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin),
      "leakage-safe split: near-dup components share one md5-bucket split decision — " +
        "the eval-contamination guard doc-by-doc splitting cannot provide"),

    "q67_doc_chunks" -> Q(
      (s, dir) =>
        DataPrep.chunkTokens(Tables.table(s, dir, "documents"), "text", "doc_id",
            chunkSize = 64, stride = 48)
          .orderBy(col("doc"), col("chunk_idx")),
      Some("""WITH toks AS (
             |  SELECT doc_id AS doc,
             |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0) AS w
             |  FROM documents),
             |nn AS (SELECT doc, w, len(w) AS n FROM toks WHERE len(w) > 0),
             |ix AS (
             |  SELECT doc, w, n,
             |    unnest(generate_series(0, GREATEST(0, CAST(ceil((n - 64) / 48.0) AS INT)))) AS i
             |  FROM nn)
             |SELECT doc, CAST(i AS INT) AS chunk_idx, CAST(i * 48 AS INT) AS start,
             |  CAST(LEAST(64, n - i * 48) AS INT) AS chunk_len,
             |  array_to_string(w[i*48 + 1 : i*48 + 64], ' ') AS chunk_text
             |FROM ix ORDER BY doc, chunk_idx""".stripMargin),
      "sliding context-window chunking (size 64, stride 48, overlap 16)"),

    "q68_token_packing" -> Q(
      (s, dir) =>
        DataPrep.packSequences(Tables.table(s, dir, "documents"), "text", "doc_id",
            "source", budget = 512)
          .orderBy(col("grp"), col("doc")),
      Some("""WITH t AS (
             |  SELECT doc_id AS doc, source AS grp,
             |    CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |                         x -> len(x) > 0)) AS INT) AS n_tok
             |  FROM documents),
             |c AS (
             |  SELECT doc, grp, n_tok,
             |    CAST(sum(n_tok) OVER (PARTITION BY grp ORDER BY doc
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
             |  FROM t)
             |SELECT doc, grp, n_tok, CAST((cum - n_tok) // 512 AS BIGINT) AS pack_id
             |FROM c ORDER BY grp, doc""".stripMargin),
      "cumulative-offset sequence packing into 512-token budgets per source"),

    "q69_tfidf" -> Q(
      (s, dir) =>
        DataPrep.tfidfTopTerms(Tables.table(s, dir, "documents"), "text", "doc_id", k = 5)
          .orderBy(col("doc"), col("rank")),
      // ranking uses the ROUNDED score in both engines so a 1-ulp ln()
      // difference cannot flip ranks
      Some("""WITH toks AS (
             |  SELECT doc_id AS doc,
             |    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0)) AS tok
             |  FROM documents),
             |tf AS (SELECT doc, tok, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY doc, tok),
             |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |scored AS (
             |  SELECT tf.doc, tf.tok, tf.tf, dfq.df,
             |    round(tf.tf * ln((n.n_docs + 1.0) / (dfq.df + 1.0)), 6) AS score
             |  FROM tf JOIN dfq USING (tok) CROSS JOIN n),
             |r AS (SELECT *, row_number() OVER (PARTITION BY doc ORDER BY score DESC, tok ASC) AS rk
             |      FROM scored)
             |SELECT doc, CAST(rk AS INT) AS rank, tok, tf, df, score
             |FROM r WHERE rk <= 5 ORDER BY doc, rank""".stripMargin),
      "top-5 TF-IDF terms per document (idf = ln((N+1)/(df+1)))"),

    "q70_vec_quantize" -> Q(
      (s, dir) => {
        val e = Tables.table(s, dir, "embeddings")
          .select(col("vec_id"), V.asDouble(col("embedding")).as("v"))
          .withColumn("scale", V.int8Scale(col("v")))
        e.select(
            col("vec_id"),
            round(col("scale"), 6).as("scale6"),
            concat_ws(",", transform(V.quantizeInt8(col("v"), col("scale")),
              q => q.cast("string"))).as("q_csv"))
          .orderBy(col("vec_id"))
      },
      // the int8 vector is rendered as CSV: identical integer strings in
      // both engines, and the comparator cannot sort raw array columns
      Some("""WITH e AS (
             |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |s AS (
             |  SELECT vec_id, v,
             |    CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0.0 THEN 0.0
             |         ELSE 127.0 / list_max(list_transform(v, x -> abs(x))) END AS scale
             |  FROM e)
             |SELECT vec_id, round(scale, 6) AS scale6,
             |  array_to_string(list_transform(v, x -> CAST(CAST(round(x * scale) AS INT) AS VARCHAR)), ',') AS q_csv
             |FROM s ORDER BY vec_id""".stripMargin),
      "int8 symmetric embedding quantization (scale = 127/max|v|)"),

    "q104_zorder_layout" -> Q(
      (s, dir) =>
        graft.operators.DataPrep.zorderLayout(
            Tables.table(s, dir, "lineitem")
              .select(col("l_orderkey"), col("l_linenumber"),
                col("l_orderkey").bitwiseAND(lit(65535L)).as("xq"),
                col("l_partkey").bitwiseAND(lit(65535L)).as("yq")),
            "xq", "yq", bits = 16, nBuckets = 256)
          .select(col("l_orderkey"), col("l_linenumber"), col("z"), col("bucket"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""WITH base AS (
             |  SELECT l_orderkey, l_linenumber,
             |    CAST(l_orderkey & 65535 AS BIGINT) AS x,
             |    CAST(l_partkey & 65535 AS BIGINT) AS y
             |  FROM lineitem),
             |zv AS (
             |  SELECT l_orderkey, l_linenumber,
             |    list_reduce(list_transform(generate_series(0, 15),
             |      i -> (((x >> CAST(i AS INT)) & 1) << CAST(2 * i AS INT))
             |         + (((y >> CAST(i AS INT)) & 1) << CAST(2 * i + 1 AS INT))),
             |      (a, b) -> a + b) AS z
             |  FROM base)
             |SELECT l_orderkey, l_linenumber, CAST(z AS BIGINT) AS z,
             |  CAST(z >> 24 AS BIGINT) AS bucket
             |FROM zv ORDER BY l_orderkey, l_linenumber""".stripMargin),
      "Z-order (Morton) layout key: bit-interleaved (orderkey, partkey) + top-8-bit " +
        "bucket — multidimensional clustering so row-group min/max stats prune on " +
        "either dimension; pure codegen'd bit math, oracle rebuilds the interleave"),

    // ------------------------------------------- quantile normalization
    "q185_quantile_normalize" -> Q(
      (s, dir) =>
        graft.operators.DataPrep.quantileNormalize(
            Tables.events(s, dir), "event_type", "value", "event_id")
          .orderBy(col("id")),
      Some("""WITH e AS (SELECT event_id AS id, event_type AS grp,
             |    CAST(round(value * 1e6) AS BIGINT) AS xm FROM events),
             |r AS (SELECT *, count(*) OVER (PARTITION BY grp) AS n,
             |    row_number() OVER (PARTITION BY grp ORDER BY xm, id) AS rn FROM e),
             |p AS (SELECT row_number() OVER (ORDER BY xm, id) AS pr,
             |    xm AS norm_micro FROM e),
             |j AS (SELECT id, grp, xm AS value_micro,
             |    (rn * (SELECT count(*) FROM e) + n - 1) // n AS pr FROM r)
             |SELECT id, grp, value_micro, norm_micro
             |FROM j JOIN p USING (pr) ORDER BY id""".stripMargin),
      "quantile normalization of per-type event values against the pooled " +
        "corpus distribution (ceil-rank lookup, deterministic (value, id) order " +
        "both sides) — the batch-effect correction that makes cross-source " +
        "score comparisons calibration-free; one group rank + one pooled rank " +
        "+ a rank equi-join")
  )
}

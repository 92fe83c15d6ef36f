package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.ModelEval

/** Round-9 queries (q144-q148): model-evaluation analytics — the
  * aggregates a scored corpus is thresholded with (exact Mann-Whitney
  * ROC-AUC, bucketed precision/recall curve, calibration/reliability
  * bins), chi-square term selection for quality-classifier vocabularies,
  * and the unpivot (wide→long melt) reshape. The synthetic model under
  * evaluation: `props.k` (a 0..99 integer every event carries) read as
  * score or probability, with labels from `k >= 50` or the purchase
  * event type — deterministic, engine-portable inputs; every emitted
  * statistic is an exact integer ppm ratio.
  */
object EvalQueries {

  private val label = "CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50 THEN 1 ELSE 0 END"

  // DuckDB fold: first 8 md5 hex chars -> BIGINT (mirrors Spark's
  // conv(substring(md5(x), 1, 8), 16, 10); both < 2^32, exact)
  private def hex8(e: String): String =
    s"""list_reduce(list_transform(generate_series(1, 8),
       |      i -> strpos('0123456789abcdef', substring($e, i, 1)) - 1),
       |      (a, x) -> a * 16 + x)""".stripMargin

  val queries: Seq[(String, Q)] = Seq(

    // ------------------------------------------------------ exact ROC-AUC
    "q144_roc_auc" -> Q(
      (s, dir) =>
        ModelEval.rocAuc(
            Tables.events(s, dir).withColumn("y",
              (get_json_object(col("props"), "$.k").cast("bigint") >= 50)
                .cast("bigint")),
            "event_type", "value", "y")
          .orderBy(col("grp")),
      Some(s"""WITH e AS (SELECT event_type AS grp,
              |    CAST(round(value * 1e6) AS BIGINT) AS sm, $label AS y
              |  FROM events),
              |s AS (SELECT grp, sm, sum(y) AS pos, count(*) - sum(y) AS neg
              |  FROM e GROUP BY 1, 2),
              |w AS (SELECT *, coalesce(sum(neg) OVER (PARTITION BY grp
              |    ORDER BY sm ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              |    0) AS neg_below FROM s),
              |g AS (SELECT grp, sum(pos) AS n_pos, sum(neg) AS n_neg,
              |    sum(pos * (2 * neg_below + neg)) AS u2 FROM w GROUP BY 1)
              |SELECT grp, CAST(n_pos AS BIGINT) AS n_pos,
              |  CAST(n_neg AS BIGINT) AS n_neg,
              |  CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN -1
              |    ELSE (1000000 * u2) // (2 * n_pos * n_neg) END
              |    AS BIGINT) AS auc_ppm
              |FROM g ORDER BY grp""".stripMargin),
      "exact tie-aware Mann-Whitney ROC-AUC per event type (score = value, label = " +
        "props.k >= 50) in ppm — distinct-score aggregation then a per-group prefix " +
        "window over distinct scores only; the integer pair-counting AUC any engine " +
        "reproduces bit-for-bit"),

    // ------------------------------------------------ precision/recall curve
    "q145_pr_curve" -> Q(
      (s, dir) =>
        ModelEval.prCurve(
            Tables.events(s, dir).withColumn("y",
              (get_json_object(col("props"), "$.k").cast("bigint") >= 50)
                .cast("bigint")),
            "value", "y", nBuckets = 20),
      Some(s"""WITH e AS (SELECT CAST(round(value * 1e6) AS BIGINT) AS sm,
              |    $label AS y FROM events),
              |b AS (SELECT min(sm) AS lo, max(sm) AS hi FROM e),
              |k AS (SELECT ((sm - lo) * 20) // (hi - lo + 1) AS bucket, lo, hi, y
              |  FROM e, b),
              |p AS (SELECT bucket, lo, hi, sum(y) AS pos,
              |    count(*) - sum(y) AS neg FROM k GROUP BY 1, 2, 3),
              |c AS (SELECT *,
              |    sum(pos) OVER (ORDER BY bucket DESC
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
              |    sum(neg) OVER (ORDER BY bucket DESC
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
              |    sum(pos) OVER () AS all_pos FROM p)
              |SELECT CAST(bucket AS BIGINT) AS bucket,
              |  CAST(lo + (bucket * (hi - lo + 1)) // 20 AS BIGINT)
              |    AS threshold_micro,
              |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
              |  CAST(all_pos - tp AS BIGINT) AS fn,
              |  CAST((1000000 * tp) // (tp + fp) AS BIGINT) AS precision_ppm,
              |  CAST(CASE WHEN all_pos = 0 THEN -1
              |    ELSE (1000000 * tp) // all_pos END AS BIGINT) AS recall_ppm
              |FROM c ORDER BY bucket DESC""".stripMargin),
      "threshold-bucketed PR curve (20 equal-width micro-score buckets, top-down " +
        "cumulative confusion counts, ppm precision/recall) — the corpus-filter " +
        "threshold picker; one 1-row min/max broadcast + one bounded groupBy, " +
        "no global rank"),

    // ------------------------------------------------------ calibration bins
    "q146_calibration" -> Q(
      (s, dir) =>
        ModelEval.calibrationBins(
            Tables.events(s, dir).select(
              (get_json_object(col("props"), "$.k").cast("bigint") * 10000)
                .as("pred_ppm"),
              (col("event_type") === "purchase").cast("bigint").as("y")),
            "pred_ppm", "y", nBins = 10),
      Some("""WITH e AS (SELECT
             |    CAST(json_extract_string(props, '$.k') AS BIGINT) * 10000 AS p,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
             |  FROM events),
             |g AS (SELECT least(9, (p * 10) // 1000000) AS bin, count(*) AS n,
             |    sum(y) AS n_pos, sum(p) AS sum_p FROM e GROUP BY 1)
             |SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
             |  CAST(n_pos AS BIGINT) AS n_pos,
             |  CAST(sum_p // n AS BIGINT) AS mean_pred_ppm,
             |  CAST((1000000 * n_pos) // n AS BIGINT) AS pos_rate_ppm
             |FROM g ORDER BY bin""".stripMargin),
      "reliability diagram: props.k/100 read as predicted purchase probability, cut " +
        "into 10 equal-width bins; per bin the count, mean prediction, and observed " +
        "positive rate (ppm) — pure map-side-combine groupBy, the ideal 100-TB " +
        "aggregate"),

    // -------------------------------------------- chi-square term selection
    "q147_chi2_terms" -> Q(
      (s, dir) =>
        ModelEval.chiSquareTerms(
            Tables.table(s, dir, "documents"), "lang", "text", topK = 5)
          .orderBy(col("cls"), col("rank")),
      Some("""WITH p AS (SELECT lang AS cls,
             |    unnest(list_distinct(list_filter(
             |      regexp_split_to_array(trim(lower(text)), '\s+'),
             |      t -> len(t) > 0))) AS term
             |  FROM documents),
             |ct AS (SELECT cls, term, count(*) AS a FROM p GROUP BY 1, 2),
             |tt AS (SELECT term, count(*) AS t FROM p GROUP BY 1),
             |k AS (SELECT lang AS cls, count(*) AS nc FROM documents GROUP BY 1),
             |nn AS (SELECT count(*) AS nn FROM documents),
             |cells AS (SELECT k.cls, tt.term, coalesce(ct.a, 0) AS a,
             |    t - coalesce(ct.a, 0) AS b, nc - coalesce(ct.a, 0) AS c,
             |    nn - t - (nc - coalesce(ct.a, 0)) AS dd, nn
             |  FROM tt CROSS JOIN k
             |    LEFT JOIN ct ON ct.cls = k.cls AND ct.term = tt.term
             |    CROSS JOIN nn),
             |sc AS (SELECT cls, term, a, b,
             |    CASE WHEN (a+b) * (c+dd) * (a+c) * (b+dd) = 0 THEN -1
             |      ELSE CAST((1000000::HUGEINT * nn * (a*dd - b*c) * (a*dd - b*c))
             |        // ((a+b)::HUGEINT * (c+dd) * (a+c) * (b+dd)) AS BIGINT)
             |      END AS chi2_ppm
             |  FROM cells),
             |r AS (SELECT *, row_number() OVER (PARTITION BY cls
             |    ORDER BY chi2_ppm DESC, term ASC) AS rank FROM sc)
             |SELECT cls, CAST(rank AS BIGINT) AS rank, term,
             |  CAST(a AS BIGINT) AS n_class_with_term,
             |  CAST(b AS BIGINT) AS n_other_with_term, chi2_ppm
             |FROM r WHERE rank <= 5 ORDER BY cls, rank""".stripMargin),
      "top-5 chi-square-selected terms per language over document token presence — " +
        "the supervised vocabulary pruner for quality classifiers; three keyed " +
        "aggregations joined on the term key, broadcast class totals, exact " +
        "decimal(38,0) chi-square in ppm"),

    // ------------------------------------------------------------- unpivot
    "q148_unpivot" -> Q(
      (s, dir) => {
        val micro = round(col("value") * lit(1e6)).cast("bigint")
        Tables.events(s, dir).groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(micro).as("sum_value_micro"),
            max(micro).as("max_value_micro"),
            countDistinct(col("user_id")).as("n_users"))
          .unpivot(Array(col("event_type")),
            Array(col("n_events"), col("sum_value_micro"),
              col("max_value_micro"), col("n_users")),
            "metric", "metric_value")
          .orderBy(col("event_type"), col("metric"))
      },
      Some("""WITH w AS (SELECT event_type, count(*) AS n_events,
             |    sum(CAST(round(value * 1e6) AS BIGINT)) AS sum_value_micro,
             |    max(CAST(round(value * 1e6) AS BIGINT)) AS max_value_micro,
             |    count(DISTINCT user_id) AS n_users FROM events GROUP BY 1)
             |SELECT event_type, metric, CAST(metric_value AS BIGINT) AS metric_value
             |FROM (
             |  SELECT event_type, 'n_events' AS metric, n_events AS metric_value
             |    FROM w
             |  UNION ALL SELECT event_type, 'sum_value_micro', sum_value_micro
             |    FROM w
             |  UNION ALL SELECT event_type, 'max_value_micro', max_value_micro
             |    FROM w
             |  UNION ALL SELECT event_type, 'n_users', n_users FROM w)
             |ORDER BY event_type, metric""".stripMargin),
      "wide→long melt of a per-event-type metric table via the native unpivot " +
        "operator (Expand under the hood: one pass, no join, output = rows × " +
        "metrics) — the reshape every metrics store ingests"),

    // ------------------------------------------------------- ANN recall@k
    "q150_ann_recall" -> Q(
      (s, dir) => {
        val emb = Tables.table(s, dir, "embeddings")
        val dim = emb.select(size(col("embedding"))).head().getInt(0)
        val queries = emb.filter(col("vec_id") < 5)
        // tight probe radius (hamming <= 2 of 16 bits) so the index
        // genuinely misses neighbors and the metric is non-degenerate
        val approx = graft.operators.Similarity.lshTopK(
          queries, emb, "embedding", "vec_id", k = 10, bits = 16,
          probeHamming = 2,
          planes = Some(graft.functions.VectorFunctions.md5Planes(dim, 16)))
        val exact = graft.operators.Similarity.bruteForceTopK(
          queries, emb, "embedding", "vec_id", k = 10)
        ModelEval.annRecallAtK(approx, exact, k = 10)
          .orderBy(col("query_id"))
      },
      // exact side = q35's oracle, approx side = q36's md5-plane oracle at
      // hamming <= 2, then the recall join — every stage engine-portable
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |sx AS (
             |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             |    list_dot_product(q.v, e.v) /
             |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS cos
             |  FROM e CROSS JOIN (SELECT * FROM e WHERE vec_id < 5) q
             |  WHERE e.vec_id <> q.vec_id),
             |rx AS (SELECT *, row_number() OVER
             |    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM sx),
             |gt AS (SELECT query_id, neighbor_id FROM rx WHERE rank <= 10),
             |planes AS (
             |  SELECT j.j AS j,
             |    list_transform(generate_series(0, len((SELECT v FROM e LIMIT 1)) - 1), d ->
             |      CASE WHEN ((strpos('0123456789abcdef',
             |                    substring(md5(d::VARCHAR || '_' || j.j::VARCHAR), 1, 1)) - 1) & 1) = 0
             |           THEN 1.0 ELSE -1.0 END) AS plane
             |  FROM generate_series(0, 15) AS j(j)),
             |sigs AS (
             |  SELECT e.vec_id,
             |    sum(CASE WHEN list_dot_product(e.v, p.plane) >= 0
             |             THEN (1::BIGINT << p.j) ELSE 0 END)::BIGINT AS sig
             |  FROM e CROSS JOIN planes p GROUP BY e.vec_id),
             |sa AS (
             |  SELECT qs.vec_id AS query_id, cs.vec_id AS neighbor_id,
             |    list_dot_product(eq.v, ec.v) /
             |      (sqrt(list_dot_product(eq.v, eq.v)) * sqrt(list_dot_product(ec.v, ec.v))) AS cos
             |  FROM sigs qs
             |  JOIN e eq ON eq.vec_id = qs.vec_id
             |  JOIN sigs cs ON cs.vec_id <> qs.vec_id
             |  JOIN e ec ON ec.vec_id = cs.vec_id
             |  WHERE qs.vec_id < 5 AND bit_count(xor(qs.sig, cs.sig)) <= 2),
             |ra AS (SELECT *, row_number() OVER
             |    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM sa),
             |ap AS (SELECT query_id, neighbor_id FROM ra WHERE rank <= 10),
             |h AS (SELECT gt.query_id, count(*) AS n_hit
             |  FROM gt JOIN ap USING (query_id, neighbor_id) GROUP BY 1),
             |t AS (SELECT query_id, count(*) AS n_true FROM gt GROUP BY 1)
             |SELECT t.query_id, CAST(n_true AS BIGINT) AS n_true,
             |  CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
             |  CAST((1000000 * coalesce(n_hit, 0)) // n_true AS BIGINT) AS recall_ppm
             |FROM t LEFT JOIN h ON t.query_id = h.query_id
             |ORDER BY t.query_id""".stripMargin),
      "per-query recall@10 of the sign-LSH index against brute-force ground truth " +
        "in integer ppm — the go/no-go metric for replacing exact search with an " +
        "ANN index; bounded by the sampled query set, never the corpus"),

    // ------------------------------------------------------ Cohen's kappa
    "q152_cohen_kappa" -> Q(
      (s, dir) => {
        import graft.functions.{TextFunctions => T}
        // two deterministic "annotators" of keep/drop quality labels: a
        // char-length rule vs a token-count rule — the agreement audit a
        // real dual-rater labeling pass would run per language
        val rated = Tables.table(s, dir, "documents")
          .select(col("lang"),
            (col("n_chars") >= 300).cast("bigint").as("ra"),
            (T.tokenCount(col("text")) >= 50).cast("bigint").as("rb"))
        ModelEval.cohenKappa(rated, "lang", "ra", "rb")
          .orderBy(col("grp"))
      },
      Some("""WITH r AS (SELECT lang AS grp,
             |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS ra,
             |    CASE WHEN len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0)) >= 50
             |         THEN 1 ELSE 0 END AS rb
             |  FROM documents),
             |cells AS (SELECT grp, ra, rb, CAST(count(*) AS BIGINT) AS c
             |  FROM r GROUP BY 1, 2, 3),
             |t AS (SELECT grp, sum(c) AS n,
             |    sum(CASE WHEN ra = rb THEN c ELSE 0 END) AS agree
             |  FROM cells GROUP BY 1),
             |ma AS (SELECT grp, ra AS k, sum(c) AS na FROM cells GROUP BY 1, 2),
             |mb AS (SELECT grp, rb AS k, sum(c) AS nb FROM cells GROUP BY 1, 2),
             |pe AS (SELECT ma.grp, sum(CAST(na AS HUGEINT) * nb) AS pe_num
             |  FROM ma JOIN mb ON ma.grp = mb.grp AND ma.k = mb.k GROUP BY 1)
             |SELECT t.grp, CAST(n AS BIGINT) AS n_items,
             |  CAST(agree AS BIGINT) AS n_agree,
             |  CAST((1000000 * agree) // n AS BIGINT) AS po_ppm,
             |  CAST((1000000::HUGEINT * coalesce(pe_num, 0)) // (n::HUGEINT * n)
             |    AS BIGINT) AS pe_ppm,
             |  CAST(CASE WHEN n::HUGEINT * n = coalesce(pe_num, 0) THEN -2000000
             |    ELSE (1000000::HUGEINT * (n::HUGEINT * agree - coalesce(pe_num, 0)))
             |      // (n::HUGEINT * n - coalesce(pe_num, 0)) END AS BIGINT) AS kappa_ppm
             |FROM t LEFT JOIN pe ON t.grp = pe.grp
             |ORDER BY t.grp""".stripMargin),
      "Cohen's kappa per language between a char-length rater and a token-count " +
        "rater — chance-corrected label agreement in exact integer ppm; one cell " +
        "aggregation bounded by groups x labels^2, marginal joins never touch the corpus"),

    // ------------------------------------------- two-sample KS distance
    "q154_ks_test" -> Q(
      (s, dir) => {
        // click vs purchase value distributions, audited per user cohort —
        // the binning-free drift check run next to PSI when a feature's
        // train/serve skew is suspected
        val ev = Tables.events(s, dir)
          .filter(col("event_type").isin("click", "purchase"))
          .select(concat(lit("u"), (col("user_id") % 3).cast("string")).as("g"),
            col("value"),
            (col("event_type") === "purchase").cast("bigint").as("side"))
        ModelEval.ksTest(ev, "g", "value", "side").orderBy(col("grp"))
      },
      Some("""WITH e AS (SELECT 'u' || CAST(user_id % 3 AS VARCHAR) AS grp,
             |    CAST(round(value * 1e6) AS BIGINT) AS sm,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side
             |  FROM events WHERE event_type IN ('click', 'purchase')),
             |s AS (SELECT grp, sm, sum(1 - side) AS ca, sum(side) AS cb
             |  FROM e GROUP BY 1, 2),
             |w AS (SELECT *,
             |    sum(ca) OVER (PARTITION BY grp ORDER BY sm
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
             |    sum(cb) OVER (PARTITION BY grp ORDER BY sm
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
             |    sum(ca) OVER (PARTITION BY grp) AS n_a,
             |    sum(cb) OVER (PARTITION BY grp) AS n_b
             |  FROM s),
             |d AS (SELECT *, abs(n_b * cum_a - n_a * cum_b) AS diff FROM w),
             |m AS (SELECT *, max(diff) OVER (PARTITION BY grp) AS maxd FROM d)
             |SELECT grp, CAST(max(n_a) AS BIGINT) AS n_a,
             |  CAST(max(n_b) AS BIGINT) AS n_b,
             |  CAST(CASE WHEN max(n_a) = 0 OR max(n_b) = 0 THEN -1
             |    ELSE (1000000 * max(maxd)) // (max(n_a) * max(n_b)) END
             |    AS BIGINT) AS d_ppm,
             |  CAST(CASE WHEN max(n_a) = 0 OR max(n_b) = 0 THEN -1
             |    ELSE min(CASE WHEN diff = maxd THEN sm END) END
             |    AS BIGINT) AS at_micro
             |FROM m GROUP BY grp ORDER BY grp""".stripMargin),
      "two-sample Kolmogorov-Smirnov distance (click vs purchase values per user " +
        "cohort) in exact integer ppm with its tie-broken argmax location — " +
        "distinct-value aggregation then per-group prefix windows over distinct " +
        "micro values only; the binning-free companion to the PSI drift monitor"),

    // -------------------------------------------- cluster silhouette
    "q156_silhouette" -> Q(
      (s, dir) =>
        graft.operators.Similarity.clusterSilhouette(
            Tables.table(s, dir, "embeddings"), "embedding", "vec_id", "label")
          .orderBy(col("vec_id")),
      // q110's integer floorDiv centroids, then per-row exact squared
      // distances to every label centroid — a2 = own, b2 = min other
      Some("""WITH e AS (SELECT vec_id, label,
             |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS vq
             |  FROM embeddings),
             |s AS (SELECT label, dd.d AS d, sum(vq[dd.d]) AS s, count(*) AS cnt
             |  FROM e CROSS JOIN generate_series(1, 64) AS dd(d)
             |  GROUP BY label, dd.d),
             |c AS (SELECT label AS clab,
             |    list((s - ((s % cnt + cnt) % cnt)) // cnt ORDER BY d) AS c
             |  FROM s GROUP BY label),
             |dist AS (SELECT e.vec_id, e.label, c.clab,
             |    list_sum(list_transform(generate_series(1, 64),
             |      d -> (e.vq[d] - c.c[d]) * (e.vq[d] - c.c[d]))) AS d2
             |  FROM e CROSS JOIN c),
             |ab AS (SELECT vec_id, label,
             |    min(CASE WHEN clab = label THEN d2 END) AS a2,
             |    min(CASE WHEN clab <> label THEN d2 END) AS b2
             |  FROM dist GROUP BY 1, 2)
             |SELECT vec_id, label, CAST(a2 AS BIGINT) AS own_d2_micro2,
             |  CAST(b2 AS BIGINT) AS min_other_d2_micro2,
             |  CAST(CASE WHEN greatest(a2, b2) = 0 THEN 0
             |    ELSE (1000000 * (b2 - a2)) // greatest(a2, b2) END
             |    AS BIGINT) AS sil_ppm
             |FROM ab ORDER BY vec_id""".stripMargin),
      "simplified (centroid-based, squared-distance) silhouette per embedding in " +
        "exact integer ppm — the label-coherence audit of an embedding space; " +
        "bounded driver centroids broadcast as literals, then a shuffle-free " +
        "map-only scoring scan"),

    // ------------------------------------------------------------ ANN MRR
    "q161_ann_mrr" -> Q(
      (s, dir) => {
        val emb = Tables.table(s, dir, "embeddings")
        val dim = emb.select(size(col("embedding"))).head().getInt(0)
        val queries = emb.filter(col("vec_id") < 5)
        val approx = graft.operators.Similarity.lshTopK(
          queries, emb, "embedding", "vec_id", k = 10, bits = 16,
          probeHamming = 2,
          planes = Some(graft.functions.VectorFunctions.md5Planes(dim, 16)))
        val exact = graft.operators.Similarity.bruteForceTopK(
          queries, emb, "embedding", "vec_id", k = 10)
        ModelEval.annMrrAtK(approx, exact, k = 10)
          .orderBy(col("query_id"))
      },
      // q150's exact + md5-plane LSH CTEs, then first-relevant-rank
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |sx AS (
             |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             |    list_dot_product(q.v, e.v) /
             |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS cos
             |  FROM e CROSS JOIN (SELECT * FROM e WHERE vec_id < 5) q
             |  WHERE e.vec_id <> q.vec_id),
             |rx AS (SELECT *, row_number() OVER
             |    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM sx),
             |gt AS (SELECT query_id, neighbor_id FROM rx WHERE rank <= 10),
             |planes AS (
             |  SELECT j.j AS j,
             |    list_transform(generate_series(0, len((SELECT v FROM e LIMIT 1)) - 1), d ->
             |      CASE WHEN ((strpos('0123456789abcdef',
             |                    substring(md5(d::VARCHAR || '_' || j.j::VARCHAR), 1, 1)) - 1) & 1) = 0
             |           THEN 1.0 ELSE -1.0 END) AS plane
             |  FROM generate_series(0, 15) AS j(j)),
             |sigs AS (
             |  SELECT e.vec_id,
             |    sum(CASE WHEN list_dot_product(e.v, p.plane) >= 0
             |             THEN (1::BIGINT << p.j) ELSE 0 END)::BIGINT AS sig
             |  FROM e CROSS JOIN planes p GROUP BY e.vec_id),
             |sa AS (
             |  SELECT qs.vec_id AS query_id, cs.vec_id AS neighbor_id,
             |    list_dot_product(eq.v, ec.v) /
             |      (sqrt(list_dot_product(eq.v, eq.v)) * sqrt(list_dot_product(ec.v, ec.v))) AS cos
             |  FROM sigs qs
             |  JOIN e eq ON eq.vec_id = qs.vec_id
             |  JOIN sigs cs ON cs.vec_id <> qs.vec_id
             |  JOIN e ec ON ec.vec_id = cs.vec_id
             |  WHERE qs.vec_id < 5 AND bit_count(xor(qs.sig, cs.sig)) <= 2),
             |ra AS (SELECT *, row_number() OVER
             |    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM sa),
             |fh AS (SELECT ra.query_id, min(ra.rank) AS fr
             |  FROM ra JOIN gt ON gt.query_id = ra.query_id
             |    AND gt.neighbor_id = ra.neighbor_id
             |  WHERE ra.rank <= 10 GROUP BY 1),
             |qs2 AS (SELECT DISTINCT query_id FROM gt)
             |SELECT qs2.query_id,
             |  CAST(coalesce(fr, -1) AS BIGINT) AS first_hit_rank,
             |  CAST(coalesce(1000000 // fr, 0) AS BIGINT) AS rr_ppm
             |FROM qs2 LEFT JOIN fh USING (query_id)
             |ORDER BY query_id""".stripMargin),
      "per-query first-relevant-rank and reciprocal rank (ppm) of the sign-LSH " +
        "index against brute-force top-10 — the how-deep-must-you-scroll ANN " +
        "metric next to recall@k; bounded by the sampled query set"),

    // --------------------------------------- classification report
    "q162_centroid_report" -> Q(
      (s, dir) =>
        ModelEval.classificationReport(
            graft.operators.Similarity.nearestCentroidClassify(
                Tables.table(s, dir, "embeddings"), "embedding", "vec_id", "label",
                trainBps = 8000)
              .select(col("label").cast("bigint").as("label"),
                col("predicted").cast("bigint").as("predicted")),
            "label", "predicted")
          .orderBy(col("cls")),
      // q110's oracle verbatim through the argmin, then the cell counts
      Some("""WITH e AS (SELECT vec_id, label,
             |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS vq
             |  FROM embeddings),
             |sp AS (SELECT vec_id, label, vq,
             |    CASE WHEN substring(md5(CAST(vec_id AS VARCHAR)), 1, 4) < 'cccc'
             |         THEN 1 ELSE 0 END AS tr
             |  FROM e),
             |s AS (SELECT label, dd.d AS d, sum(vq[dd.d]) AS s, count(*) AS cnt
             |  FROM sp CROSS JOIN generate_series(1, 64) AS dd(d)
             |  WHERE tr = 1 GROUP BY label, dd.d),
             |c AS (SELECT label AS clab,
             |    list((s - ((s % cnt + cnt) % cnt)) // cnt ORDER BY d) AS c
             |  FROM s GROUP BY label),
             |scored AS (SELECT sp.vec_id, sp.label, c.clab,
             |    row_number() OVER (PARTITION BY sp.vec_id ORDER BY
             |      list_sum(list_transform(generate_series(1, 64),
             |        d -> (sp.vq[d] - c.c[d]) * (sp.vq[d] - c.c[d]))), c.clab) AS rn
             |  FROM sp CROSS JOIN c),
             |rep AS (SELECT label AS y, clab AS p FROM scored WHERE rn = 1),
             |cells AS (SELECT y, p, CAST(count(*) AS BIGINT) AS c
             |  FROM rep GROUP BY 1, 2),
             |tp AS (SELECT y AS cls, c AS tp FROM cells WHERE y = p),
             |act AS (SELECT y AS cls, sum(c) AS n_actual FROM cells GROUP BY 1),
             |prd AS (SELECT p AS cls, sum(c) AS n_pred FROM cells GROUP BY 1),
             |f AS (SELECT cls,
             |    coalesce(tp, 0) AS tp,
             |    coalesce(n_pred, 0) - coalesce(tp, 0) AS fp,
             |    coalesce(n_actual, 0) - coalesce(tp, 0) AS fn
             |  FROM act FULL OUTER JOIN prd USING (cls)
             |    LEFT JOIN tp USING (cls))
             |SELECT CAST(cls AS BIGINT) AS cls, CAST(tp AS BIGINT) AS tp,
             |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
             |  CAST(CASE WHEN tp + fp = 0 THEN -1
             |    ELSE (1000000 * tp) // (tp + fp) END AS BIGINT) AS precision_ppm,
             |  CAST(CASE WHEN tp + fn = 0 THEN -1
             |    ELSE (1000000 * tp) // (tp + fn) END AS BIGINT) AS recall_ppm,
             |  CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN -1
             |    ELSE (2000000 * tp) // (2 * tp + fp + fn) END AS BIGINT) AS f1_ppm
             |FROM f ORDER BY cls""".stripMargin),
      "per-class precision/recall/F1 (exact integer ppm, F1 in the 2tp/(2tp+fp+fn) " +
        "form — no intermediate ratio to round) over the nearest-centroid " +
        "classifier — the model-quality audit before a filter threshold ships; " +
        "everything after one labels^2-bounded cell count"),

    // -------------------------------------- Matthews correlation coefficient
    "q167_mcc" -> Q(
      (s, dir) =>
        ModelEval.mcc(
            Tables.events(s, dir).withColumn("y",
                (get_json_object(col("props"), "$.k").cast("bigint") >= 50)
                  .cast("bigint"))
              .withColumn("p", (col("value") >= 0.5).cast("bigint")),
            "event_type", "y", "p")
          .orderBy(col("grp")),
      Some(s"""WITH e AS (SELECT event_type AS grp, $label AS y,
              |    CASE WHEN value >= 0.5 THEN 1 ELSE 0 END AS p FROM events),
              |c AS (SELECT grp,
              |    sum(CASE WHEN y = 1 AND p = 1 THEN 1 ELSE 0 END) AS tp,
              |    sum(CASE WHEN y = 0 AND p = 0 THEN 1 ELSE 0 END) AS tn,
              |    sum(CASE WHEN y = 0 AND p = 1 THEN 1 ELSE 0 END) AS fp,
              |    sum(CASE WHEN y = 1 AND p = 0 THEN 1 ELSE 0 END) AS fn
              |  FROM e GROUP BY 1)
              |SELECT grp, CAST(tp AS BIGINT) AS tp, CAST(tn AS BIGINT) AS tn,
              |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
              |  CAST(CASE WHEN tp + fp = 0 OR tp + fn = 0
              |      OR tn + fp = 0 OR tn + fn = 0 THEN -2000000
              |    ELSE round(CAST(tp::HUGEINT * tn - fp::HUGEINT * fn AS DOUBLE)
              |      * 1e6 / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
              |        * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)))
              |    END AS BIGINT) AS mcc_ppm
              |FROM c ORDER BY grp""".stripMargin),
      "Matthews correlation per event type (label = props.k >= 50, pred = " +
        "value >= 0.5) — the imbalance-honest binary summary; corpus to four " +
        "integers per group in one aggregation, ppm-rounded from an exact " +
        "decimal numerator"),

    // ----------------------------------------------- Brier score + ECE
    "q168_brier_ece" -> Q(
      (s, dir) =>
        ModelEval.brierEce(
            Tables.events(s, dir)
              .select(concat(lit("u"), (col("user_id") % 3).cast("string")).as("g"),
                (get_json_object(col("props"), "$.k").cast("bigint") * 10000L)
                  .as("pred_ppm"),
                col("event_type").isin("purchase", "signup")
                  .cast("bigint").as("y")),
            "g", "pred_ppm", "y", nBins = 10)
          .orderBy(col("grp")),
      Some("""WITH e AS (SELECT 'u' || CAST(user_id % 3 AS VARCHAR) AS grp,
             |    CAST(json_extract_string(props, '$.k') AS BIGINT) * 10000 AS p,
             |    CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END AS y
             |  FROM events),
             |b AS (SELECT grp, least(9, (p * 10) // 1000000) AS bin,
             |    count(*) AS n,
             |    sum((p - 1000000 * y) * (p - 1000000 * y)) AS se,
             |    sum(p) AS sp, sum(y) AS np
             |  FROM e GROUP BY 1, 2),
             |g AS (SELECT grp, sum(n) AS n, sum(se) AS se,
             |    sum(abs(sp - 1000000 * np)) AS ad FROM b GROUP BY 1)
             |SELECT grp, CAST(n AS BIGINT) AS n,
             |  CAST(se // (n::HUGEINT * 1000000) AS BIGINT) AS brier_ppm,
             |  CAST(ad // n AS BIGINT) AS ece_ppm
             |FROM g ORDER BY grp""".stripMargin),
      "Brier score and expected calibration error per user cohort (pred = " +
        "props.k in ppm, label = purchase/signup) — both EXACT integers: the " +
        "bin size cancels out of ECE's weighted |conf - acc|, leaving pure " +
        "integer arithmetic on per-bin sums; one (group, bin) map-side-combine " +
        "aggregation then a bounded reduce"),

    // --------------------------------------------------------- ANN nDCG@k
    "q169_ann_ndcg" -> Q(
      (s, dir) => {
        val emb = Tables.table(s, dir, "embeddings")
        val dim = emb.select(size(col("embedding"))).head().getInt(0)
        val queries = emb.filter(col("vec_id") < 5)
        val approx = graft.operators.Similarity.lshTopK(
          queries, emb, "embedding", "vec_id", k = 10, bits = 16,
          probeHamming = 2,
          planes = Some(graft.functions.VectorFunctions.md5Planes(dim, 16)))
        val exact = graft.operators.Similarity.bruteForceTopK(
          queries, emb, "embedding", "vec_id", k = 10)
        ModelEval.annNdcgAtK(approx, exact, k = 10)
          .orderBy(col("query_id"))
      },
      // q150's exact + md5-plane LSH CTEs, then the rank-discounted gain
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |sx AS (
             |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             |    list_dot_product(q.v, e.v) /
             |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS cos
             |  FROM e CROSS JOIN (SELECT * FROM e WHERE vec_id < 5) q
             |  WHERE e.vec_id <> q.vec_id),
             |rx AS (SELECT *, row_number() OVER
             |    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM sx),
             |gt AS (SELECT query_id, neighbor_id FROM rx WHERE rank <= 10),
             |planes AS (
             |  SELECT j.j AS j,
             |    list_transform(generate_series(0, len((SELECT v FROM e LIMIT 1)) - 1), d ->
             |      CASE WHEN ((strpos('0123456789abcdef',
             |                    substring(md5(d::VARCHAR || '_' || j.j::VARCHAR), 1, 1)) - 1) & 1) = 0
             |           THEN 1.0 ELSE -1.0 END) AS plane
             |  FROM generate_series(0, 15) AS j(j)),
             |sigs AS (
             |  SELECT e.vec_id,
             |    sum(CASE WHEN list_dot_product(e.v, p.plane) >= 0
             |             THEN (1::BIGINT << p.j) ELSE 0 END)::BIGINT AS sig
             |  FROM e CROSS JOIN planes p GROUP BY e.vec_id),
             |sa AS (
             |  SELECT qs.vec_id AS query_id, cs.vec_id AS neighbor_id,
             |    list_dot_product(eq.v, ec.v) /
             |      (sqrt(list_dot_product(eq.v, eq.v)) * sqrt(list_dot_product(ec.v, ec.v))) AS cos
             |  FROM sigs qs
             |  JOIN e eq ON eq.vec_id = qs.vec_id
             |  JOIN sigs cs ON cs.vec_id <> qs.vec_id
             |  JOIN e ec ON ec.vec_id = cs.vec_id
             |  WHERE qs.vec_id < 5 AND bit_count(xor(qs.sig, cs.sig)) <= 2),
             |ra AS (SELECT *, row_number() OVER
             |    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM sa),
             |dc AS (SELECT ra.query_id,
             |    list_sum(list_transform(list_sort(list(ra.rank)),
             |      r -> 1.0 / log2(CAST(r AS DOUBLE) + 1.0))) AS dcg
             |  FROM ra JOIN gt ON gt.query_id = ra.query_id
             |    AND gt.neighbor_id = ra.neighbor_id
             |  WHERE ra.rank <= 10 GROUP BY 1),
             |t AS (SELECT query_id, count(*) AS n_true FROM gt GROUP BY 1)
             |SELECT t.query_id, CAST(n_true AS BIGINT) AS n_true,
             |  CAST(round(coalesce(dcg, 0.0) * 1e6 /
             |    list_sum(list_transform(generate_series(1, CAST(n_true AS INT)),
             |      r -> 1.0 / log2(CAST(r AS DOUBLE) + 1.0)))) AS BIGINT) AS ndcg_ppm
             |FROM t LEFT JOIN dc USING (query_id)
             |ORDER BY t.query_id""".stripMargin),
      "per-query nDCG@10 of the sign-LSH index against brute-force ground truth — " +
        "position-weighted ANN quality (recall ignores where in the window a true " +
        "neighbor lands); fixed rank-sorted summation order so the f64 discounts " +
        "agree to the last ulp in any engine, then one ppm rounding"),

    // ------------------------------------- multinomial Naive Bayes router
    "q170_naive_bayes" -> Q(
      (s, dir) =>
        ModelEval.classificationReport(
            graft.operators.TextClassify.naiveBayesPredict(
              Tables.table(s, dir, "documents"), "text", "doc_id", "lang",
              trainBps = 8000),
            "y", "predicted")
          .orderBy(col("cls")),
      // train split, (class, term) counts, micro-nat weight grid, argmax,
      // then the q163 report aggregation — string class keys end to end
      Some("""WITH d AS (SELECT doc_id AS did, lang AS y,
             |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0) AS toks,
             |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
             |         THEN 1 ELSE 0 END AS tr
             |  FROM documents),
             |tok AS (SELECT did, y, tr, unnest(toks) AS t FROM d),
             |cnt AS (SELECT y, t, count(*) AS c FROM tok WHERE tr = 1 GROUP BY 1, 2),
             |cls AS (SELECT y, count(*) AS nd FROM d WHERE tr = 1 GROUP BY 1),
             |tot AS (SELECT count(*) AS n FROM d WHERE tr = 1),
             |ny AS (SELECT y, sum(c) AS nt FROM cnt GROUP BY 1),
             |voc AS (SELECT count(DISTINCT t) AS v FROM cnt),
             |prior AS (SELECT cls.y, ny.nt, voc.v,
             |    CAST(round(ln(CAST(cls.nd AS DOUBLE) / tot.n) * 1e6) AS BIGINT) AS pw
             |  FROM cls JOIN ny ON ny.y = cls.y CROSS JOIN tot CROSS JOIN voc),
             |grid AS (SELECT prior.y, vt.t,
             |    CAST(round(ln((COALESCE(cnt.c, 0) + 1.0) / (prior.nt + prior.v)) * 1e6) AS BIGINT) AS w
             |  FROM (SELECT DISTINCT t FROM cnt) vt CROSS JOIN prior
             |  LEFT JOIN cnt ON cnt.y = prior.y AND cnt.t = vt.t),
             |ts AS (SELECT tok.did, grid.y AS cand, sum(grid.w) AS s
             |  FROM tok JOIN grid ON grid.t = tok.t WHERE tok.tr = 0 GROUP BY 1, 2),
             |test AS (SELECT did, y FROM d WHERE tr = 0),
             |sc AS (SELECT test.did, test.y, prior.y AS cand,
             |    prior.pw + COALESCE(ts.s, 0) AS score
             |  FROM test CROSS JOIN prior
             |  LEFT JOIN ts ON ts.did = test.did AND ts.cand = prior.y),
             |pr AS (SELECT did, y, cand, row_number() OVER
             |    (PARTITION BY did ORDER BY score DESC, cand) AS rn FROM sc),
             |rep AS (SELECT y, cand AS p FROM pr WHERE rn = 1),
             |cells AS (SELECT y, p, CAST(count(*) AS BIGINT) AS c
             |  FROM rep GROUP BY 1, 2),
             |tp AS (SELECT y AS cls, c AS tp FROM cells WHERE y = p),
             |act AS (SELECT y AS cls, sum(c) AS n_actual FROM cells GROUP BY 1),
             |prd AS (SELECT p AS cls, sum(c) AS n_pred FROM cells GROUP BY 1),
             |f AS (SELECT cls,
             |    coalesce(tp, 0) AS tp,
             |    coalesce(n_pred, 0) - coalesce(tp, 0) AS fp,
             |    coalesce(n_actual, 0) - coalesce(tp, 0) AS fn
             |  FROM act FULL OUTER JOIN prd USING (cls)
             |    LEFT JOIN tp USING (cls))
             |SELECT cls, CAST(tp AS BIGINT) AS tp,
             |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
             |  CAST(CASE WHEN tp + fp = 0 THEN -1
             |    ELSE (1000000 * tp) // (tp + fp) END AS BIGINT) AS precision_ppm,
             |  CAST(CASE WHEN tp + fn = 0 THEN -1
             |    ELSE (1000000 * tp) // (tp + fn) END AS BIGINT) AS recall_ppm,
             |  CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN -1
             |    ELSE (2000000 * tp) // (2 * tp + fp + fn) END AS BIGINT) AS f1_ppm
             |FROM f ORDER BY cls""".stripMargin),
      "multinomial Naive Bayes language router trained IN-ENGINE on the md5-gated " +
        "80% split (add-1 smoothing, micro-nat integer weight grid so scores are " +
        "exact integer sums) and graded on the held-out 20% through the " +
        "classification report — train is one (class, term) count, serving is one " +
        "term-keyed join + (doc, class) partial sums; nothing touches the driver"),

    // ------------------------------------ Benjamini–Hochberg FDR step-up
    "q172_bh_fdr" -> Q(
      (s, dir) => {
        // one hypothesis test per (event_type, props.k) cell; p-values are
        // md5-derived uniforms with signal PLANTED in the purchase family
        // (÷50) — deterministic, engine-portable, and the procedure must
        // reject in the planted family while the null families survive
        val tests = Tables.events(s, dir)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("bigint").as("k"))
          .distinct()
          .withColumn("u",
            conv(substring(md5(concat(lit("bh:"), col("event_type"),
              lit(":"), col("k"))), 1, 8), 16, 10).cast("bigint")
              % lit(1000001L))
          .withColumn("p_ppm", when(col("event_type") === "purchase",
            expr("u DIV 50")).otherwise(col("u")))
        ModelEval.bhFdr(tests, "event_type", "k", "p_ppm",
            alphaNum = 1L, alphaDen = 20L)
          .orderBy(col("grp"), col("rank"))
      },
      Some(s"""WITH t AS (SELECT DISTINCT event_type AS grp,
              |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
              |  FROM events),
              |u AS (SELECT grp, k,
              |    ${hex8("md5('bh:' || grp || ':' || CAST(k AS VARCHAR))")} % 1000001 AS u
              |  FROM t),
              |p AS (SELECT grp, k AS test_id,
              |    CASE WHEN grp = 'purchase' THEN u // 50 ELSE u END AS p_ppm
              |  FROM u),
              |r AS (SELECT *, count(*) OVER (PARTITION BY grp) AS m,
              |    row_number() OVER (PARTITION BY grp ORDER BY p_ppm, test_id) AS rank
              |  FROM p),
              |g AS (SELECT *, CASE WHEN p_ppm::HUGEINT * m * 20
              |      <= rank::HUGEINT * 1000000 THEN rank END AS passr FROM r),
              |kk AS (SELECT *, max(passr) OVER (PARTITION BY grp) AS kmax,
              |    least(1000000, min((p_ppm::HUGEINT * m) // rank)
              |      OVER (PARTITION BY grp ORDER BY p_ppm, test_id
              |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS q_ppm
              |  FROM g)
              |SELECT grp, test_id, p_ppm, rank, CAST(q_ppm AS BIGINT) AS q_ppm,
              |  CAST(CASE WHEN rank <= COALESCE(kmax, 0) THEN 1 ELSE 0 END AS BIGINT) AS rejected
              |FROM kk ORDER BY grp, rank""".stripMargin),
      "Benjamini–Hochberg FDR step-up per test family (exact integer gate " +
        "p·m·alphaDen <= rank·alphaNum·1e6, suffix-min adjusted q-values) — the " +
        "multiple-comparisons control over per-segment test batteries; m is the " +
        "TEST count, one bounded window sort per family"),

    // ------------------------------------------------- average precision
    "q175_avg_precision" -> Q(
      (s, dir) =>
        ModelEval.averagePrecision(
            Tables.events(s, dir).withColumn("y",
              (get_json_object(col("props"), "$.k").cast("bigint") >= 50)
                .cast("bigint")),
            "event_type", "value", "event_id", "y")
          .orderBy(col("grp")),
      Some(s"""WITH e AS (SELECT event_type AS grp,
              |    CAST(round(value * 1e6) AS BIGINT) AS sm, event_id AS id,
              |    $label AS y
              |  FROM events),
              |r AS (SELECT grp, y,
              |    row_number() OVER (PARTITION BY grp ORDER BY sm DESC, id) AS rank,
              |    sum(y) OVER (PARTITION BY grp ORDER BY sm DESC, id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc
              |  FROM e),
              |t AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_pos,
              |    sum((1000000 * pc) // rank) AS s
              |  FROM r WHERE y = 1 GROUP BY 1)
              |SELECT g.grp, COALESCE(n_pos, 0) AS n_pos,
              |  CAST(CASE WHEN n_pos IS NULL THEN -1 ELSE s // n_pos END AS BIGINT) AS ap_ppm
              |FROM (SELECT DISTINCT grp FROM e) g LEFT JOIN t USING (grp)
              |ORDER BY g.grp""".stripMargin),
      "average precision per event type (exact integer ppm over the pinned " +
        "(score desc, id) order) — the early-ranking PR summary that moves " +
        "under class imbalance when ROC-AUC barely does; one per-group window " +
        "sort then a positives-only reduce"),

    // ------------------------------------------------- fairness audit
    "q178_fairness" -> Q(
      (s, dir) =>
        ModelEval.fairnessGaps(
            Tables.events(s, dir)
              .select(concat(lit("c"), (col("user_id") % 4).cast("string")).as("g"),
                (get_json_object(col("props"), "$.k").cast("bigint") >= 50)
                  .cast("bigint").as("y"),
                (col("value") >= 0.5).cast("bigint").as("p")),
            "g", "y", "p")
          .orderBy(col("grp")),
      Some(s"""WITH e AS (SELECT 'c' || CAST(user_id % 4 AS VARCHAR) AS grp,
              |    $label AS y,
              |    CASE WHEN value >= 0.5 THEN 1 ELSE 0 END AS p
              |  FROM events),
              |st AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
              |    sum(p) AS n_sel, sum(y) AS n_pos,
              |    sum(y * p) AS n_tp, sum((1 - y) * p) AS n_fp
              |  FROM e GROUP BY 1),
              |r AS (SELECT grp, n,
              |    CAST((1000000 * n_sel) // n AS BIGINT) AS sel_ppm,
              |    CAST(CASE WHEN n_pos = 0 THEN -1
              |      ELSE (1000000 * n_tp) // n_pos END AS BIGINT) AS tpr_ppm,
              |    CAST(CASE WHEN n - n_pos = 0 THEN -1
              |      ELSE (1000000 * n_fp) // (n - n_pos) END AS BIGINT) AS fpr_ppm
              |  FROM st)
              |SELECT grp, n, sel_ppm, tpr_ppm, fpr_ppm,
              |  CAST(max(sel_ppm) OVER () - sel_ppm AS BIGINT) AS sel_gap_ppm,
              |  CAST(CASE WHEN tpr_ppm = -1 THEN -1
              |    ELSE max(CASE WHEN tpr_ppm >= 0 THEN tpr_ppm END) OVER () - tpr_ppm
              |    END AS BIGINT) AS tpr_gap_ppm,
              |  CAST(CASE WHEN fpr_ppm = -1 THEN -1
              |    ELSE max(CASE WHEN fpr_ppm >= 0 THEN fpr_ppm END) OVER () - fpr_ppm
              |    END AS BIGINT) AS fpr_gap_ppm
              |FROM r ORDER BY grp""".stripMargin),
      "fairness audit across user cohorts: demographic-parity selection rate, " +
        "equalized-odds TPR/FPR, and each cohort's gap to the best-treated " +
        "cohort (exact integer ppm, sentinel cohorts excluded from the max) — " +
        "one map-side-combine aggregation then a cohort-bounded window"),

    // ------------------------------------- cluster-label NMI audit
    "q179_cluster_nmi" -> Q(
      (s, dir) => {
        import graft.functions.{VectorFunctions => V}
        val emb = Tables.table(s, dir, "embeddings")
        val dim = emb.select(size(col("embedding"))).head().getInt(0)
        val assigned = emb.select(lit("all").as("g"),
          V.signLshWithPlanes(V.asDouble(col("embedding")),
            V.md5Planes(dim, 4)).as("cluster"),
          col("label").cast("bigint").as("lab"))
        ModelEval.nmiClusterLabel(assigned, "g", "cluster", "lab")
          .orderBy(col("grp"))
      },
      // q36's md5-plane signature CTEs at 4 bits, then the contingency
      // table, nano-nat MI/entropy terms, and the max normalization
      Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
             |planes AS (
             |  SELECT j.j AS j,
             |    list_transform(generate_series(0, len((SELECT v FROM e LIMIT 1)) - 1), d ->
             |      CASE WHEN ((strpos('0123456789abcdef',
             |                    substring(md5(d::VARCHAR || '_' || j.j::VARCHAR), 1, 1)) - 1) & 1) = 0
             |           THEN 1.0 ELSE -1.0 END) AS plane
             |  FROM generate_series(0, 3) AS j(j)),
             |sigs AS (
             |  SELECT e.vec_id, e.label,
             |    sum(CASE WHEN list_dot_product(e.v, p.plane) >= 0
             |             THEN (1::BIGINT << p.j) ELSE 0 END)::BIGINT AS c
             |  FROM e CROSS JOIN planes p GROUP BY e.vec_id, e.label),
             |cells AS (SELECT 'all' AS grp, c, label AS l, count(*) AS n_cl
             |  FROM sigs GROUP BY 1, 2, 3),
             |mc AS (SELECT grp, c, sum(n_cl) AS n_c FROM cells GROUP BY 1, 2),
             |ml AS (SELECT grp, l, sum(n_cl) AS n_l FROM cells GROUP BY 1, 2),
             |nn AS (SELECT grp, sum(n_cl) AS n FROM cells GROUP BY 1),
             |mi AS (SELECT cells.grp,
             |    sum(CAST(round(1e9 * (CAST(n_cl AS DOUBLE) / n)
             |      * ln((CAST(n_cl AS DOUBLE) * n) / (CAST(n_c AS DOUBLE) * n_l))) AS BIGINT)) AS mi_nano
             |  FROM cells JOIN mc USING (grp, c) JOIN ml USING (grp, l)
             |  JOIN nn USING (grp) GROUP BY 1),
             |hc AS (SELECT mc.grp,
             |    sum(CAST(round(1e9 * (CAST(n_c AS DOUBLE) / n)
             |      * ln(CAST(n AS DOUBLE) / n_c)) AS BIGINT)) AS hc_nano
             |  FROM mc JOIN nn USING (grp) GROUP BY 1),
             |hl AS (SELECT ml.grp,
             |    sum(CAST(round(1e9 * (CAST(n_l AS DOUBLE) / n)
             |      * ln(CAST(n AS DOUBLE) / n_l)) AS BIGINT)) AS hl_nano
             |  FROM ml JOIN nn USING (grp) GROUP BY 1)
             |SELECT nn.grp, CAST(n AS BIGINT) AS n, CAST(mi_nano AS BIGINT) AS mi_nano,
             |  CAST(hc_nano AS BIGINT) AS hc_nano, CAST(hl_nano AS BIGINT) AS hl_nano,
             |  CAST(CASE WHEN greatest(hc_nano, hl_nano) = 0 THEN -1
             |    ELSE (1000000 * mi_nano) // greatest(hc_nano, hl_nano)
             |    END AS BIGINT) AS nmi_ppm
             |FROM nn JOIN mi USING (grp) JOIN hc USING (grp) JOIN hl USING (grp)
             |ORDER BY nn.grp""".stripMargin),
      "normalized mutual information between 4-bit sign-LSH buckets and the " +
        "embedding labels (nano-nat MI and entropies, max normalization) — the " +
        "external do-the-clusters-mean-anything audit next to q156's internal " +
        "silhouette; corpus to a clusters x labels contingency in one pass"),

    // ------------------------------------- precision-targeted threshold
    "q180_threshold_select" -> Q(
      (s, dir) =>
        ModelEval.thresholdForPrecision(
            Tables.events(s, dir).withColumn("y",
              (get_json_object(col("props"), "$.k").cast("bigint") >= 50)
                .cast("bigint")),
            "event_type", "value", "y", targetPpm = 600000L)
          .orderBy(col("grp")),
      Some(s"""WITH e AS (SELECT event_type AS grp,
              |    CAST(round(value * 1e6) AS BIGINT) AS sm, $label AS y
              |  FROM events),
              |s AS (SELECT grp, sm, sum(y) AS pos, count(*) AS cnt
              |  FROM e GROUP BY 1, 2),
              |c AS (SELECT *,
              |    sum(pos) OVER (PARTITION BY grp ORDER BY sm DESC) AS tp_cum,
              |    sum(cnt) OVER (PARTITION BY grp ORDER BY sm DESC) AS kept_cum
              |  FROM s),
              |o AS (SELECT *, 1000000 * tp_cum >= 600000 * kept_cum AS ok FROM c),
              |g AS (SELECT grp, sum(pos) AS n_pos, sum(cnt) AS n,
              |    min(CASE WHEN ok THEN sm END) AS thr,
              |    max(CASE WHEN ok THEN kept_cum END) AS bk
              |  FROM o GROUP BY 1),
              |b AS (SELECT g.*, o.tp_cum AS btp
              |  FROM g LEFT JOIN o ON o.grp = g.grp AND o.kept_cum = g.bk AND o.ok)
              |SELECT grp, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
              |  CAST(COALESCE(thr, -1) AS BIGINT) AS threshold_micro,
              |  CAST(CASE WHEN thr IS NULL THEN -1
              |    ELSE (1000000 * btp) // bk END AS BIGINT) AS precision_ppm,
              |  CAST(CASE WHEN thr IS NULL OR n_pos = 0 THEN -1
              |    ELSE (1000000 * btp) // n_pos END AS BIGINT) AS recall_ppm,
              |  CAST(COALESCE(bk, 0) AS BIGINT) AS n_kept
              |FROM b ORDER BY grp""".stripMargin),
      "lowest score cutoff meeting a 60% precision target per event type " +
        "(exact integer gate 1e6·tp >= target·kept over distinct-score prefix " +
        "sums) with achieved precision/recall/kept — the operator that turns a " +
        "quality model into a filter config; rocAuc's bounded-window shape"),

    // --------------------------------------------------------- ANN RBO@k
    "q181_ann_rbo" -> Q(
      (s, dir) => {
        val emb = Tables.table(s, dir, "embeddings")
        val dim = emb.select(size(col("embedding"))).head().getInt(0)
        val queries = emb.filter(col("vec_id") < 5)
        val approx = graft.operators.Similarity.lshTopK(
          queries, emb, "embedding", "vec_id", k = 10, bits = 16,
          probeHamming = 2,
          planes = Some(graft.functions.VectorFunctions.md5Planes(dim, 16)))
        val exact = graft.operators.Similarity.bruteForceTopK(
          queries, emb, "embedding", "vec_id", k = 10)
        ModelEval.annRboAtK(approx, exact, k = 10)
          .orderBy(col("query_id"))
      },
      // q169's exact + md5-plane LSH ranking CTEs, then the exact-rational
      // RBO fold: coeff(d) = (10-9)·9^(d-1)·10^(10-d)·(2520/d), C = 10^10·2520
      Some {
        val coeffs = (1 to 10).map(d =>
          (BigInt(9).pow(d - 1) * BigInt(10).pow(10 - d)).toLong * (2520L / d))
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |sx AS (
           |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           |    list_dot_product(q.v, e.v) /
           |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS cos
           |  FROM e CROSS JOIN (SELECT * FROM e WHERE vec_id < 5) q
           |  WHERE e.vec_id <> q.vec_id),
           |rx AS (SELECT *, row_number() OVER
           |    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM sx),
           |gt AS (SELECT query_id, neighbor_id, rank FROM rx WHERE rank <= 10),
           |planes AS (
           |  SELECT j.j AS j,
           |    list_transform(generate_series(0, len((SELECT v FROM e LIMIT 1)) - 1), d ->
           |      CASE WHEN ((strpos('0123456789abcdef',
           |                    substring(md5(d::VARCHAR || '_' || j.j::VARCHAR), 1, 1)) - 1) & 1) = 0
           |           THEN 1.0 ELSE -1.0 END) AS plane
           |  FROM generate_series(0, 15) AS j(j)),
           |sigs AS (
           |  SELECT e.vec_id,
           |    sum(CASE WHEN list_dot_product(e.v, p.plane) >= 0
           |             THEN (1::BIGINT << p.j) ELSE 0 END)::BIGINT AS sig
           |  FROM e CROSS JOIN planes p GROUP BY e.vec_id),
           |sa AS (
           |  SELECT qs.vec_id AS query_id, cs.vec_id AS neighbor_id,
           |    list_dot_product(eq.v, ec.v) /
           |      (sqrt(list_dot_product(eq.v, eq.v)) * sqrt(list_dot_product(ec.v, ec.v))) AS cos
           |  FROM sigs qs
           |  JOIN e eq ON eq.vec_id = qs.vec_id
           |  JOIN sigs cs ON cs.vec_id <> qs.vec_id
           |  JOIN e ec ON ec.vec_id = cs.vec_id
           |  WHERE qs.vec_id < 5 AND bit_count(xor(qs.sig, cs.sig)) <= 2),
           |ra AS (SELECT *, row_number() OVER
           |    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM sa),
           |ap AS (SELECT query_id, neighbor_id, rank FROM ra WHERE rank <= 10),
           |sh AS (SELECT gt.query_id, greatest(ap.rank, gt.rank) AS m
           |  FROM gt JOIN ap ON ap.query_id = gt.query_id
           |    AND ap.neighbor_id = gt.neighbor_id),
           |ms AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_shared,
           |    list_sort(list(m)) AS depths FROM sh GROUP BY 1),
           |t AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_true FROM gt GROUP BY 1)
           |SELECT t.query_id, t.n_true, COALESCE(ms.n_shared, 0) AS n_shared,
           |  CAST(COALESCE((1000000 * list_sum(list_transform(generate_series(1, 10),
           |      d -> (${coeffs.mkString("[", ", ", "]")})[d]
           |        * len(list_filter(depths, x -> x <= d)))))
           |    // ${BigInt(10).pow(10).toLong * 2520L}, 0) AS BIGINT) AS rbo_ppm
           |FROM t LEFT JOIN ms USING (query_id)
           |ORDER BY t.query_id""".stripMargin
      },
      "rank-biased overlap at 10 (p = 9/10) between the sign-LSH and exact " +
        "neighbor RANKINGS — top-weighted list agreement, fully exact via the " +
        "common-denominator rational fold (no float pow anywhere); the " +
        "reads-like-a-user companion to recall/MRR/nDCG"),

    // ------------------------------------- split-conformal intervals
    "q188_conformal" -> Q(
      (s, dir) =>
        ModelEval.splitConformalInterval(
            Tables.events(s, dir).withColumn("pred",
              get_json_object(col("props"), "$.k").cast("bigint")),
            "event_type", "pred", "value", "event_id",
            alphaNum = 1L, alphaDen = 10L, calBps = 5000)
          .orderBy(col("grp")),
      Some("""WITH e AS (SELECT event_type AS grp,
             |    CAST(json_extract_string(props, '$.k') AS BIGINT) * 1000000 AS pm,
             |    CAST(round(value * 1e6) AS BIGINT) AS am, event_id AS id
             |  FROM events),
             |b AS (SELECT grp, abs(am - pm) AS res, id,
             |    CASE WHEN substring(md5('conf:' || CAST(id AS VARCHAR)), 1, 4) < '8000'
             |         THEN 1 ELSE 0 END AS cal FROM e),
             |c AS (SELECT *, row_number() OVER (PARTITION BY grp ORDER BY res, id) AS rn,
             |    count(*) OVER (PARTITION BY grp) AS n_cal FROM b WHERE cal = 1),
             |q AS (SELECT grp, max(n_cal) AS n_cal,
             |    min(CASE WHEN rn = ((n_cal + 1) * 9 + 9) // 10 THEN res END) AS qhat
             |  FROM c GROUP BY 1),
             |v AS (SELECT b.grp, count(*) AS n_eval,
             |    sum(CASE WHEN res <= qhat THEN 1 ELSE 0 END) AS n_cov
             |  FROM b LEFT JOIN q ON q.grp = b.grp WHERE cal = 0 GROUP BY 1),
             |g AS (SELECT DISTINCT grp FROM b)
             |SELECT g.grp, CAST(COALESCE(q.n_cal, 0) AS BIGINT) AS n_cal,
             |  CAST(COALESCE(v.n_eval, 0) AS BIGINT) AS n_eval,
             |  CAST(COALESCE(q.qhat, -1) AS BIGINT) AS qhat_micro,
             |  CAST(CASE WHEN q.qhat IS NULL OR v.n_eval IS NULL THEN -1
             |    ELSE (1000000 * v.n_cov) // v.n_eval END AS BIGINT) AS coverage_ppm
             |FROM g LEFT JOIN q ON q.grp = g.grp LEFT JOIN v ON v.grp = g.grp
             |ORDER BY g.grp""".stripMargin),
      "split-conformal 90% prediction interval per event type (props.k as the " +
        "point model for value): exact conformal rank ceil((n+1)(1-alpha)) " +
        "over md5-gated calibration residuals, plus the EMPIRICAL held-out " +
        "coverage — distribution-free uncertainty with its own honesty check; " +
        "every input group emits a row (n_eval=0, -1 coverage when all rows " +
        "fell in the calibration split); one calibration rank window + " +
        "broadcast joins"),

    // ------------------------------------- matryoshka truncation eval
    "q194_matryoshka_recall" -> Q(
      (s, dir) => {
        // how much neighbor recall survives truncating the embedding to
        // its first 16 dims? — the matryoshka/compressed-index planning
        // number (truncate -> 4x memory traffic saved iff recall holds);
        // pure composition: brute force at both dims + the recall grader
        val emb = Tables.table(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 5)
        val exact = graft.operators.Similarity.bruteForceTopK(
          queries, emb, "embedding", "vec_id", k = 10)
        val tq = queries.withColumn("emb16", slice(col("embedding"), 1, 16))
        val tc = emb.withColumn("emb16", slice(col("embedding"), 1, 16))
        val approx = graft.operators.Similarity.bruteForceTopK(
          tq, tc, "emb16", "vec_id", k = 10)
        ModelEval.annRecallAtK(approx, exact, k = 10)
          .orderBy(col("query_id"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |sx AS (
             |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             |    list_dot_product(q.v, e.v) /
             |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS cos
             |  FROM e CROSS JOIN (SELECT * FROM e WHERE vec_id < 5) q
             |  WHERE e.vec_id <> q.vec_id),
             |rx AS (SELECT *, row_number() OVER
             |    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM sx),
             |gt AS (SELECT query_id, neighbor_id FROM rx WHERE rank <= 10),
             |t AS (SELECT vec_id, v[1:16] AS v FROM e),
             |st AS (
             |  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
             |    list_dot_product(q.v, t.v) /
             |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(t.v, t.v))) AS cos
             |  FROM t CROSS JOIN (SELECT * FROM t WHERE vec_id < 5) q
             |  WHERE t.vec_id <> q.vec_id),
             |rt AS (SELECT *, row_number() OVER
             |    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM st),
             |ap AS (SELECT query_id, neighbor_id FROM rt WHERE rank <= 10),
             |hits AS (SELECT gt.query_id, CAST(count(*) AS BIGINT) AS n_hit
             |  FROM gt JOIN ap ON ap.query_id = gt.query_id
             |    AND ap.neighbor_id = gt.neighbor_id
             |  GROUP BY 1),
             |tt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_true
             |  FROM gt GROUP BY 1)
             |SELECT tt.query_id, n_true, COALESCE(n_hit, 0) AS n_hit,
             |  CAST((1000000 * COALESCE(n_hit, 0)) // n_true AS BIGINT) AS recall_ppm
             |FROM tt LEFT JOIN hits USING (query_id)
             |ORDER BY tt.query_id""".stripMargin),
      "matryoshka truncation audit: neighbor recall@10 of the FIRST-16-DIM " +
        "embedding against the full-dim ground truth — the keep-how-many-dims " +
        "planning number for compressed indexes; pure composition of the " +
        "brute-force scorer at two dims and the recall grader"),

    // --------------------------------------- cascade routing audit
    "q195_route_margins" -> Q(
      (s, dir) => {
        // NB trained on the full corpus, served back with confidence
        // margins; per predicted class: volume, low-margin escalation
        // fraction (margin < 5 nats -> the expensive model), and the
        // rank-median margin — the numbers that price a model cascade
        val docs = Tables.table(s, dir, "documents")
        val model = graft.operators.TextClassify.naiveBayesTrain(
          docs, "text", "doc_id", "lang")
        val scored = graft.operators.TextClassify.naiveBayesApplyWithMargin(
          model, docs, "text", "doc_id")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("predicted"))
        val wr = w.orderBy(col("margin_micro"), col("did"))
        scored
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("rn", row_number().over(wr))
          .groupBy(col("predicted"))
          .agg(max(col("n")).as("n"),
            sum(when(col("margin_micro") < 5000000L, 1L).otherwise(0L))
              .as("n_escalate"),
            min(when(lit(2L) * col("rn") >= col("n"), col("margin_micro")))
              .as("med_margin_micro"))
          .select(col("predicted"), col("n"),
            col("n_escalate"),
            expr("(1000000 * n_escalate) DIV n").as("escalate_ppm"),
            col("med_margin_micro"))
          .orderBy(col("predicted"))
      },
      // q170's training CTEs WITHOUT the split (trained and served on the
      // full corpus), margins from the per-doc top-2 ranks, then the
      // q81-convention rank median per predicted class
      Some("""WITH d AS (SELECT doc_id AS did, lang AS y,
             |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0) AS toks
             |  FROM documents),
             |tok AS (SELECT did, y, unnest(toks) AS t FROM d),
             |cnt AS (SELECT y, t, count(*) AS c FROM tok GROUP BY 1, 2),
             |cls AS (SELECT y, count(*) AS nd FROM d GROUP BY 1),
             |tot AS (SELECT count(*) AS n FROM d),
             |ny AS (SELECT y, sum(c) AS nt FROM cnt GROUP BY 1),
             |voc AS (SELECT count(DISTINCT t) AS v FROM cnt),
             |prior AS (SELECT cls.y, ny.nt, voc.v,
             |    CAST(round(ln(CAST(cls.nd AS DOUBLE) / tot.n) * 1e6) AS BIGINT) AS pw
             |  FROM cls JOIN ny ON ny.y = cls.y CROSS JOIN tot CROSS JOIN voc),
             |grid AS (SELECT prior.y, vt.t,
             |    CAST(round(ln((COALESCE(cnt.c, 0) + 1.0) / (prior.nt + prior.v)) * 1e6) AS BIGINT) AS w
             |  FROM (SELECT DISTINCT t FROM cnt) vt CROSS JOIN prior
             |  LEFT JOIN cnt ON cnt.y = prior.y AND cnt.t = vt.t),
             |ts AS (SELECT tok.did, grid.y AS cand, sum(grid.w) AS s
             |  FROM tok JOIN grid ON grid.t = tok.t GROUP BY 1, 2),
             |sc AS (SELECT d.did, prior.y AS cand,
             |    prior.pw + COALESCE(ts.s, 0) AS score
             |  FROM d CROSS JOIN prior
             |  LEFT JOIN ts ON ts.did = d.did AND ts.cand = prior.y),
             |pr AS (SELECT did, cand, score, row_number() OVER
             |    (PARTITION BY did ORDER BY score DESC, cand) AS rn FROM sc),
             |m AS (SELECT p1.did, p1.cand AS predicted,
             |    CAST(p1.score - p2.score AS BIGINT) AS margin
             |  FROM pr p1 JOIN pr p2 ON p2.did = p1.did AND p2.rn = 2
             |  WHERE p1.rn = 1),
             |r AS (SELECT *, count(*) OVER (PARTITION BY predicted) AS n,
             |    row_number() OVER (PARTITION BY predicted ORDER BY margin, did) AS rn
             |  FROM m)
             |SELECT predicted, CAST(max(n) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN margin < 5000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_escalate,
             |  CAST((1000000 * sum(CASE WHEN margin < 5000000 THEN 1 ELSE 0 END)) // max(n) AS BIGINT) AS escalate_ppm,
             |  CAST(min(CASE WHEN 2 * rn >= n THEN margin END) AS BIGINT) AS med_margin_micro
             |FROM r GROUP BY predicted ORDER BY predicted""".stripMargin),
      "model-cascade routing audit: Naive Bayes confidence margins (best minus " +
        "runner-up score, exact integers) per predicted language — volume, " +
        "low-margin escalation fraction at 5 nats, rank-median margin; the " +
        "numbers that price a cheap-model/expensive-model cascade"),

    // ----------------------------------------------- 1-D earth mover's
    "q198_emd_drift" -> Q(
      (s, dir) =>
        ModelEval.emdVsGlobal(Tables.events(s, dir), "event_type", "value")
          .orderBy(col("grp")),
      Some("""WITH e AS (SELECT event_type AS grp,
             |    CAST(round(value * 1e6) AS BIGINT) AS sm FROM events),
             |bg AS (SELECT grp, sm, count(*) AS cg FROM e GROUP BY 1, 2),
             |gl AS (SELECT sm, count(*) AS c_all FROM e GROUP BY 1),
             |ng AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_g FROM e GROUP BY 1),
             |nn AS (SELECT count(*) AS n FROM e),
             |grid AS (SELECT ng.grp, gl.sm, gl.c_all,
             |    COALESCE(bg.cg, 0) AS cg, ng.n_g, nn.n
             |  FROM gl CROSS JOIN ng CROSS JOIN nn
             |  LEFT JOIN bg ON bg.grp = ng.grp AND bg.sm = gl.sm),
             |c AS (SELECT *,
             |    sum(cg) OVER (PARTITION BY grp ORDER BY sm) AS cum_g,
             |    sum(c_all) OVER (PARTITION BY grp ORDER BY sm) AS cum_all,
             |    COALESCE(lead(sm) OVER (PARTITION BY grp ORDER BY sm) - sm, 0) AS dx
             |  FROM grid),
             |t AS (SELECT grp, max(n_g) AS n, max(n) AS n_all,
             |    sum(abs(cum_g::HUGEINT * n - cum_all::HUGEINT * n_g) * dx) AS s
             |  FROM c GROUP BY 1)
             |SELECT grp, n, CAST(s // (n::HUGEINT * n_all) AS BIGINT) AS emd_micro
             |FROM t ORDER BY grp""".stripMargin),
      "1-D earth mover's distance between each event type's value distribution " +
        "and the pooled global one (exact integer cross-multiplied CDF gaps " +
        "weighted by value displacement) — the drift number that separates " +
        "'everything shifted slightly' from 'a tail teleported', which " +
        "TV/KS/PSI all read alike; grid bounded by score resolution"),

    // ------------------------------------------------ gains / lift chart
    "q200_gain_chart" -> Q(
      (s, dir) =>
        ModelEval.gainChart(
            Tables.events(s, dir).withColumn("y",
              (get_json_object(col("props"), "$.k").cast("bigint") >= 50)
                .cast("bigint")),
            "event_type", "value", "event_id", "y", nBuckets = 10)
          .orderBy(col("grp"), col("bucket")),
      Some(s"""WITH e AS (SELECT event_type AS grp,
              |    CAST(round(value * 1e6) AS BIGINT) AS sm, event_id AS id,
              |    $label AS y
              |  FROM events),
              |r AS (SELECT *, row_number() OVER (PARTITION BY grp ORDER BY sm DESC, id) AS rn,
              |    count(*) OVER (PARTITION BY grp) AS n FROM e),
              |b AS (SELECT grp, (10 * rn + n - 1) // n AS bucket,
              |    count(*) AS n_b, sum(y) AS n_pos, max(n) AS n_total
              |  FROM r GROUP BY 1, 2),
              |c AS (SELECT *,
              |    sum(n_b) OVER (PARTITION BY grp ORDER BY bucket) AS cum_n,
              |    sum(n_pos) OVER (PARTITION BY grp ORDER BY bucket) AS cum_pos,
              |    sum(n_pos) OVER (PARTITION BY grp) AS total_pos FROM b)
              |SELECT grp, CAST(bucket AS BIGINT) AS bucket, CAST(n_b AS BIGINT) AS n,
              |  CAST(n_pos AS BIGINT) AS n_pos,
              |  CAST(CASE WHEN total_pos = 0 THEN -1
              |    ELSE (1000000 * cum_pos) // total_pos END AS BIGINT) AS gain_ppm,
              |  CAST(CASE WHEN total_pos = 0 THEN -1
              |    ELSE (1000000::HUGEINT * cum_pos * n_total)
              |      // (total_pos::HUGEINT * cum_n) END AS BIGINT) AS lift_ppm
              |FROM c ORDER BY grp, bucket""".stripMargin),
      "cumulative gains / lift chart per event type (10 exact-rational " +
        "deciles over the pinned (score desc, id) order, integer gain and " +
        "lift) — 'keep the top 20% by quality score' reads its known-good " +
        "coverage straight off this table; one rank window + bounded buckets"),

    // -------------------------- embeddings: centroid drift monitor
    "q228_centroid_drift" -> Q(
      (s, dir) => {
        // vec_id parity plays the two snapshots (old = even, new = odd)
        val e = Tables.table(s, dir, "embeddings")
        graft.operators.Similarity.centroidDrift(
            e.filter(col("vec_id") % 2 === 0), e.filter(col("vec_id") % 2 === 1),
            "embedding", "label")
          .orderBy(col("label"))
      },
      Some("""WITH e AS (SELECT vec_id, label,
             |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS vq
             |  FROM embeddings),
             |sa AS (SELECT label, dd.d, sum(vq[dd.d]) AS s, count(*) AS cnt
             |  FROM e CROSS JOIN generate_series(1, 64) AS dd(d)
             |  WHERE vec_id % 2 = 0 GROUP BY 1, 2),
             |caa AS (SELECT label,
             |    list(CAST((s - ((s % cnt + cnt) % cnt)) // cnt AS DOUBLE) ORDER BY d) AS c,
             |    max(cnt) AS n FROM sa GROUP BY 1),
             |sb AS (SELECT label, dd.d, sum(vq[dd.d]) AS s, count(*) AS cnt
             |  FROM e CROSS JOIN generate_series(1, 64) AS dd(d)
             |  WHERE vec_id % 2 = 1 GROUP BY 1, 2),
             |cbb AS (SELECT label,
             |    list(CAST((s - ((s % cnt + cnt) % cnt)) // cnt AS DOUBLE) ORDER BY d) AS c,
             |    max(cnt) AS n FROM sb GROUP BY 1),
             |j AS (SELECT caa.label, caa.n AS n_a, cbb.n AS n_b,
             |    caa.c AS ca, cbb.c AS cb,
             |    sqrt(list_dot_product(caa.c, caa.c)) AS na,
             |    sqrt(list_dot_product(cbb.c, cbb.c)) AS nb
             |  FROM caa JOIN cbb USING (label))
             |SELECT CAST(label AS INT) AS label, CAST(n_a AS BIGINT) AS n_a,
             |  CAST(n_b AS BIGINT) AS n_b,
             |  CASE WHEN na = 0 OR nb = 0 THEN -2.0
             |    ELSE round(list_dot_product(ca, cb) / (na * nb), 6)
             |    END AS cos_centroid,
             |  CAST(round(sqrt(list_sum(list_transform(generate_series(1, 64),
             |    d -> (ca[d] - cb[d]) * (ca[d] - cb[d]))))) AS BIGINT) AS shift_micro,
             |  CAST(round(na) AS BIGINT) AS norm_a_micro,
             |  CAST(round(nb) AS BIGINT) AS norm_b_micro
             |FROM j ORDER BY label""".stripMargin),
      "per-label centroid drift between embedding snapshots (vec_id parity " +
        "plays old vs new): cosine between exact floorDiv micro centroids, " +
        "L2 shift, and both norms — the retrain monitor that says when ANN " +
        "indexes and centroid routers are stale; per snapshot one " +
        "(label, dim) aggregation then a dim-bounded per-label assembly, " +
        "nothing driver-side"),

    // ------------------------ eval: McNemar paired classifier test
    "q245_mcnemar" -> Q(
      (s, dir) => {
        val docs = Tables.table(s, dir, "documents")
          .withColumn("is_en", (col("lang") === "en").cast("bigint"))
          .withColumn("pred_a",
            array_contains(graft.functions.TextFunctions.tokens(col("text")),
              "the").cast("bigint"))
          .withColumn("pred_b",
            (graft.functions.TextFunctions.tokenCount(col("text")) >= 40)
              .cast("bigint"))
        graft.operators.ModelEval.mcnemarTest(
          docs
            .withColumn("ok_a",
              (col("pred_a") === col("is_en")).cast("bigint"))
            .withColumn("ok_b",
              (col("pred_b") === col("is_en")).cast("bigint")),
          "ok_a", "ok_b")
      },
      Some("""WITH d AS (SELECT
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
             |    CASE WHEN list_contains(list_filter(
             |        regexp_split_to_array(trim(lower(text)), '\s+'),
             |        t -> len(t) > 0), 'the') THEN 1 ELSE 0 END AS pred_a,
             |    CASE WHEN len(list_filter(
             |        regexp_split_to_array(trim(lower(text)), '\s+'),
             |        t -> len(t) > 0)) >= 40 THEN 1 ELSE 0 END AS pred_b
             |  FROM documents),
             |k AS (SELECT
             |    CASE WHEN pred_a = is_en THEN 1 ELSE 0 END AS ca,
             |    CASE WHEN pred_b = is_en THEN 1 ELSE 0 END AS cb
             |  FROM d),
             |m AS (SELECT count(*) AS n, sum(ca) AS na, sum(cb) AS nb,
             |    sum(ca * (1 - cb)) AS b, sum((1 - ca) * cb) AS c
             |  FROM k)
             |SELECT CAST(n AS BIGINT) AS n,
             |  CAST(CASE WHEN n = 0 THEN -1
             |    ELSE (1000000::HUGEINT * na) // n END AS BIGINT) AS acc_a_ppm,
             |  CAST(CASE WHEN n = 0 THEN -1
             |    ELSE (1000000::HUGEINT * nb) // n END AS BIGINT) AS acc_b_ppm,
             |  CAST(b AS BIGINT) AS b, CAST(c AS BIGINT) AS c,
             |  CAST(CASE WHEN b + c = 0 THEN -1
             |    ELSE CAST(round(1e6
             |      * CAST(greatest(0, abs(b - c) - 1)::HUGEINT
             |        * greatest(0, abs(b - c) - 1) AS DOUBLE)
             |      / CAST(b + c AS DOUBLE)) AS BIGINT) END AS BIGINT)
             |    AS mcnemar_micro
             |FROM m""".stripMargin),
      "McNemar paired test of two deterministic language filters " +
        "(contains-'the' vs length>=40 tokens) against the lang='en' " +
        "label on the SAME documents — comparing accuracies alone " +
        "ignores the pairing; only discordant docs carry evidence: " +
        "continuity-corrected chi-square from exact counts, ONE f64 " +
        "divide (q227 convention); a single map-side-combined " +
        "aggregation over the eval frame"),

    // --------------- Mann-Whitney U rank-sum location test per metric
    "q248_rank_sum" -> Q(
      (s, dir) => {
        // arms by md5 parity of user id (the q140 assignment); per
        // event-type group, does arm 1's value distribution sit shifted
        // against arm 0's?
        val ev = Tables.events(s, dir).withColumn("side",
          conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint") % 2)
        graft.operators.ModelEval.rankSumTest(ev, "event_type", "value", "side")
          .orderBy(col("grp"))
      },
      Some(s"""WITH e AS (SELECT event_type AS grp,
              |    CAST(round(value * 1e6) AS BIGINT) AS sm,
              |    ${hex8("md5(CAST(user_id AS VARCHAR))")} % 2 AS side
              |  FROM events),
              |pv AS (SELECT grp, sm,
              |    sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS ca,
              |    sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cb
              |  FROM e GROUP BY 1, 2),
              |st AS (SELECT grp, ca, cb, ca + cb AS t,
              |    sum(ca + cb) OVER (PARTITION BY grp ORDER BY sm
              |      ROWS UNBOUNDED PRECEDING) AS cum
              |  FROM pv),
              |r2 AS (SELECT grp, ca, cb, t, 2 * (cum - t) + t + 1 AS r2 FROM st),
              |ag AS (SELECT grp,
              |    CAST(sum(ca) AS HUGEINT) AS na, CAST(sum(cb) AS HUGEINT) AS nb,
              |    sum(CAST(ca AS HUGEINT) * r2) AS r2a,
              |    sum(CAST(t AS HUGEINT) * t * t - t) AS tie_t
              |  FROM r2 GROUP BY 1),
              |fin AS (SELECT grp, na, nb, na + nb AS nt, tie_t,
              |    r2a - na * (na + 1) AS u2a FROM ag),
              |dv AS (SELECT *, u2a - na * nb AS dev FROM fin)
              |SELECT grp, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
              |  CAST(CASE WHEN na = 0 OR nb = 0 THEN -1 ELSE u2a END AS BIGINT) AS u2_a,
              |  CAST(CASE WHEN na = 0 OR nb = 0 THEN 0
              |       WHEN dev > 0 THEN 1 WHEN dev < 0 THEN -1 ELSE 0 END AS BIGINT)
              |    AS shift_sign,
              |  CAST(CASE WHEN na = 0 OR nb = 0 THEN 0
              |    ELSE CAST(625 * 3 * dev * dev * nt * (nt - 1) >
              |      2401 * na * nb * (nt * (nt - 1) * (nt + 1) - tie_t) AS INT)
              |    END AS BIGINT) AS significant_95
              |FROM dv ORDER BY grp""".stripMargin),
      "Mann-Whitney U rank-sum location test per event type over " +
        "md5-parity user arms — the nonparametric shift companion to " +
        "q141's KS shape test: doubled average ranks keep tied blocks " +
        "exactly integral (2U_a is exact), and the tie-corrected normal " +
        "verdict clears every denominator into one decimal comparison " +
        "(q93/q140 pattern) — a float z can straddle the threshold, an " +
        "integer gate cannot; one value histogram + per-group " +
        "partitioned cumulative window"),

    // --------------- Kruskal-Wallis k-group nonparametric ANOVA
    "q250_kruskal_wallis" -> Q(
      (s, dir) =>
        graft.operators.ModelEval.kruskalWallis(
          Tables.events(s, dir), "event_type", "value"),
      Some("""WITH e AS (SELECT event_type AS cls,
             |    CAST(round(value * 1e6) AS BIGINT) AS sm FROM events),
             |h AS (SELECT cls, sm, count(*) AS cc FROM e GROUP BY 1, 2),
             |b AS (SELECT sm, sum(cc) AS t FROM h GROUP BY 1),
             |bb AS (SELECT sm, t,
             |    sum(t) OVER (ORDER BY sm ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM b),
             |r AS (SELECT sm, 2 * (cum - t) + t + 1 AS r2 FROM bb),
             |pc AS (SELECT cls, CAST(sum(cc) AS HUGEINT) AS n_j,
             |    sum(CAST(cc AS HUGEINT) * r2) AS r2j
             |  FROM h JOIN r USING (sm) GROUP BY 1),
             |tt AS (SELECT
             |    COALESCE(sum(CAST(t AS HUGEINT) * t * t - t), 0) AS tie_t,
             |    COALESCE(sum(t), 0) AS n_tot FROM b),
             |ag AS (SELECT count(*) AS k, sum((r2j * r2j) // n_j) AS s FROM pc),
             |fin AS (SELECT ag.k, tt.n_tot, ag.s, tt.tie_t,
             |    CAST(tt.n_tot AS HUGEINT) * tt.n_tot * tt.n_tot
             |      - tt.n_tot - tt.tie_t AS den
             |  FROM ag CROSS JOIN tt),
             |hm AS (SELECT k, n_tot, den,
             |    CASE WHEN k < 2 OR den <= 0 THEN CAST(-2000000 AS HUGEINT)
             |      ELSE (1000000::HUGEINT * 3
             |        * (s - CAST(n_tot AS HUGEINT) * (n_tot + 1) * (n_tot + 1))
             |        * (n_tot - 1)) // den END AS h_micro
             |  FROM fin)
             |SELECT CAST(k AS BIGINT) AS k, CAST(n_tot AS BIGINT) AS n,
             |  CAST(h_micro AS BIGINT) AS h_micro,
             |  CAST(CASE WHEN k < 2 OR den <= 0 THEN -1
             |    ELSE CAST(h_micro >= CASE k - 1
             |      WHEN 1 THEN 3841459 WHEN 2 THEN 5991465
             |      WHEN 3 THEN 7814728 WHEN 4 THEN 9487729
             |      WHEN 5 THEN 11070498 WHEN 6 THEN 12591587
             |      ELSE 14067140 END AS INT) END AS BIGINT) AS significant_95
             |FROM hm""".stripMargin),
      "Kruskal-Wallis H across the event types' value distributions — " +
        "the k-group generalization of q248's rank-sum (nonparametric " +
        "one-way ANOVA): doubled average ranks over the class-pooled " +
        "value histogram keep tied blocks exact, the tie-corrected " +
        "statistic reduces to ONE truncating decimal division per class " +
        "plus one final (the (N^3-N)/(N(N+1)) = N-1 cancellation keeps " +
        "products inside decimal(38,0)), and the verdict is an integer " +
        "compare against the chi2(k-1, .95) micro literal"),

    // -------- Friedman repeated-measures rank test over daily blocks
    "q261_friedman" -> Q(
      (s, dir) =>
        graft.operators.ModelEval.friedmanTest(
          Tables.events(s, dir)
            .withColumn("day",
              date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")),
          "day", "event_type", "value"),
      Some("""WITH cellt AS (SELECT
             |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS subj,
             |    event_type AS sys,
             |    sum(CAST(round(value * 1e6) AS BIGINT)) // count(*) AS sm
             |  FROM events GROUP BY 1, 2),
             |kk AS (SELECT count(DISTINCT sys) AS k FROM cellt),
             |comp AS (SELECT c.* FROM cellt c JOIN (
             |    SELECT subj FROM cellt GROUP BY subj
             |    HAVING count(*) = (SELECT k FROM kk)) g USING (subj)),
             |blk AS (SELECT subj, sm, count(*) AS t FROM comp GROUP BY 1, 2),
             |bb AS (SELECT subj, sm, t, sum(t) OVER (PARTITION BY subj
             |    ORDER BY sm ROWS UNBOUNDED PRECEDING) AS cum FROM blk),
             |rr AS (SELECT subj, sm, 2 * (cum - t) + t + 1 AS r2 FROM bb),
             |cells AS (SELECT c.subj, c.sys, rr.r2
             |  FROM comp c JOIN rr ON rr.subj = c.subj AND rr.sm = c.sm),
             |nn AS (SELECT count(DISTINCT subj) AS n,
             |    COALESCE(sum(CAST(r2 AS HUGEINT) * r2), 0) AS a2 FROM cells),
             |ps AS (SELECT sys, CAST(sum(r2) AS HUGEINT) AS r2j
             |  FROM cells GROUP BY 1),
             |ss AS (SELECT COALESCE(sum(
             |    (r2j - (SELECT n FROM nn) * ((SELECT k FROM kk) + 1))
             |    * (r2j - (SELECT n FROM nn) * ((SELECT k FROM kk) + 1))), 0)
             |    AS s2 FROM ps),
             |fin AS (SELECT (SELECT k FROM kk) AS k, nn.n, ss.s2,
             |    nn.a2 - CAST(nn.n AS HUGEINT) * (SELECT k FROM kk)
             |      * ((SELECT k FROM kk) + 1) * ((SELECT k FROM kk) + 1) AS den
             |  FROM nn CROSS JOIN ss),
             |hm AS (SELECT k, n, den,
             |    CASE WHEN n = 0 OR den <= 0 THEN CAST(-2000000 AS HUGEINT)
             |      ELSE (1000000::HUGEINT * (k - 1) * s2) // den END AS q_micro
             |  FROM fin)
             |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n_subjects,
             |  CAST(q_micro AS BIGINT) AS q_micro,
             |  CAST(CASE WHEN n = 0 OR den <= 0 THEN -1
             |    ELSE CAST(q_micro >= CASE k - 1
             |      WHEN 1 THEN 3841459 WHEN 2 THEN 5991465
             |      WHEN 3 THEN 7814728 WHEN 4 THEN 9487729
             |      WHEN 5 THEN 11070498 WHEN 6 THEN 12591587
             |      ELSE 14067140 END AS INT) END AS BIGINT) AS significant_95
             |FROM hm""".stripMargin),
      "Friedman repeated-measures rank test: do the event types rank " +
        "consistently by daily micro-mean across days (days = blocks, " +
        "types = systems — the same machinery compares k model variants " +
        "across benchmark items)? Doubled within-day average ranks keep " +
        "ties exact, incomplete days drop (complete-block design), the " +
        "tie-corrected statistic is integral up to ONE final truncating " +
        "division, verdict vs the chi2(k-1, .95) micro literal"),

    // --------------- Cochran-Q binary repeated-measures test
    "q265_cochran_q" -> Q(
      (s, dir) => {
        // binary per-(day, type) outcome: did the type's exact daily
        // micro-mean clear 50.0 that day — "do the k gates trip
        // consistently across days"
        val cells = Tables.events(s, dir)
          .withColumn("day",
            date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
          .groupBy(col("day"), col("event_type"))
          .agg((expr("sum(CAST(round(value * 1e6) AS BIGINT)) DIV count(1)")
            >= 50000000L).cast("bigint").as("y"))
        graft.operators.ModelEval.cochranQ(cells, "day", "event_type", "y")
      },
      Some("""WITH cell AS (SELECT
             |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS subj,
             |    event_type AS sys,
             |    CASE WHEN sum(CAST(round(value * 1e6) AS BIGINT)) // count(*)
             |      >= 50000000 THEN 1 ELSE 0 END AS y
             |  FROM events GROUP BY 1, 2),
             |kk AS (SELECT count(DISTINCT sys) AS k FROM cell),
             |comp AS (SELECT c.* FROM cell c JOIN (
             |    SELECT subj FROM cell GROUP BY subj
             |    HAVING count(*) = (SELECT k FROM kk)) g USING (subj)),
             |gj AS (SELECT COALESCE(sum(CAST(g AS HUGEINT) * g), 0) AS sum_g2,
             |    COALESCE(sum(g), 0) AS t_tot
             |  FROM (SELECT sys, sum(y) AS g FROM comp GROUP BY 1)),
             |li AS (SELECT count(*) AS n,
             |    COALESCE(sum(CAST(l AS HUGEINT) * l), 0) AS sum_l2
             |  FROM (SELECT subj, sum(y) AS l FROM comp GROUP BY 1)),
             |fin AS (SELECT (SELECT k FROM kk) AS k, li.n, gj.t_tot,
             |    (SELECT k FROM kk) * CAST(gj.t_tot AS HUGEINT) - li.sum_l2
             |      AS den,
             |    ((SELECT k FROM kk) - 1) * ((SELECT k FROM kk) * gj.sum_g2
             |      - CAST(gj.t_tot AS HUGEINT) * gj.t_tot) AS num
             |  FROM li CROSS JOIN gj),
             |qm AS (SELECT k, n, t_tot, den,
             |    CASE WHEN n = 0 OR den <= 0 THEN CAST(-2000000 AS HUGEINT)
             |      ELSE (1000000::HUGEINT * num) // den END AS q_micro
             |  FROM fin)
             |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n_subjects,
             |  CAST(t_tot AS BIGINT) AS n_successes,
             |  CAST(q_micro AS BIGINT) AS q_micro,
             |  CAST(CASE WHEN n = 0 OR den <= 0 THEN -1
             |    ELSE CAST(q_micro >= CASE k - 1
             |      WHEN 1 THEN 3841459 WHEN 2 THEN 5991465
             |      WHEN 3 THEN 7814728 WHEN 4 THEN 9487729
             |      WHEN 5 THEN 11070498 WHEN 6 THEN 12591587
             |      ELSE 14067140 END AS INT) END AS BIGINT) AS significant_95
             |FROM qm""".stripMargin),
      "Cochran-Q binary repeated-measures test (the pass/fail Friedman): " +
        "did the event types' daily above-50 gates trip consistently " +
        "across days? All-integer up to ONE truncating decimal division " +
        "(k*sum(G^2) - T^2 over k*T - sum(L^2)), complete blocks only, " +
        "verdict vs the chi2(k-1, .95) micro literal — no windows at all " +
        "(binary outcomes need no ranks)"),

    // --------------- Cliff's delta rank-sum effect size
    "q266_cliffs_delta" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir).withColumn("side",
          conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint") % 2)
        graft.operators.ModelEval.cliffsDelta(ev, "event_type", "value", "side")
          .orderBy(col("grp"))
      },
      Some(s"""WITH e AS (SELECT event_type AS grp,
              |    CAST(round(value * 1e6) AS BIGINT) AS sm,
              |    ${hex8("md5(CAST(user_id AS VARCHAR))")} % 2 AS side
              |  FROM events),
              |pv AS (SELECT grp, sm,
              |    sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS ca,
              |    sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cb
              |  FROM e GROUP BY 1, 2),
              |st AS (SELECT grp, ca, cb, ca + cb AS t,
              |    sum(ca + cb) OVER (PARTITION BY grp ORDER BY sm
              |      ROWS UNBOUNDED PRECEDING) AS cum
              |  FROM pv),
              |r2 AS (SELECT grp, ca, cb, t, 2 * (cum - t) + t + 1 AS r2 FROM st),
              |ag AS (SELECT grp,
              |    CAST(sum(ca) AS HUGEINT) AS na, CAST(sum(cb) AS HUGEINT) AS nb,
              |    sum(CAST(ca AS HUGEINT) * r2) AS r2a
              |  FROM r2 GROUP BY 1),
              |fin AS (SELECT grp, na, nb,
              |    r2a - na * (na + 1) - na * nb AS dev FROM ag),
              |dp AS (SELECT grp, na, nb,
              |    CASE WHEN na = 0 OR nb = 0 THEN -2000000
              |      ELSE (1000000::HUGEINT * dev) // (na * nb) END AS delta_ppm
              |  FROM fin)
              |SELECT grp, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
              |  CAST(delta_ppm AS BIGINT) AS delta_ppm,
              |  CASE WHEN delta_ppm = -2000000 THEN 'undefined'
              |    WHEN abs(delta_ppm) < 147000 THEN 'negligible'
              |    WHEN abs(delta_ppm) < 330000 THEN 'small'
              |    WHEN abs(delta_ppm) < 474000 THEN 'medium'
              |    ELSE 'large' END AS magnitude
              |FROM dp ORDER BY grp""".stripMargin),
      "Cliff's delta effect size per event type over the q248 md5-parity " +
        "arms: the normalized doubled-U deviation dev/(n_a*n_b) in exact " +
        "ppm (ONE truncating division over rank-sum's integers) with the " +
        "standard Romano magnitude labels — significance says nothing " +
        "about magnitude at web-scale n, this is the number that does"),

    // --------------- Wilcoxon signed-rank paired test
    "q268_signed_rank" -> Q(
      (s, dir) =>
        graft.operators.ModelEval.signedRankTest(
          Tables.events(s, dir)
            .withColumn("side", (dayofmonth(col("ts")) > 15).cast("bigint")),
          "event_type", "user_id", "value", "side")
          .orderBy(col("grp")),
      Some("""WITH cellt AS (SELECT event_type AS grp, user_id AS subj,
             |    CASE WHEN day(ts) > 15 THEN 1 ELSE 0 END AS side,
             |    sum(CAST(round(value * 1e6) AS BIGINT)) // count(*) AS sm
             |  FROM events GROUP BY 1, 2, 3),
             |pr AS (SELECT grp, subj,
             |    max(CASE WHEN side = 1 THEN sm END)
             |      - max(CASE WHEN side = 0 THEN sm END) AS dv
             |  FROM cellt GROUP BY 1, 2
             |  HAVING max(CASE WHEN side = 0 THEN sm END) IS NOT NULL
             |     AND max(CASE WHEN side = 1 THEN sm END) IS NOT NULL),
             |nz AS (SELECT grp, dv FROM pr WHERE dv <> 0),
             |h AS (SELECT grp, abs(dv) AS ad,
             |    sum(CASE WHEN dv > 0 THEN 1 ELSE 0 END) AS cp,
             |    sum(CASE WHEN dv < 0 THEN 1 ELSE 0 END) AS cn
             |  FROM nz GROUP BY 1, 2),
             |st AS (SELECT grp, cp, cn, cp + cn AS t,
             |    sum(cp + cn) OVER (PARTITION BY grp ORDER BY ad
             |      ROWS UNBOUNDED PRECEDING) AS cum FROM h),
             |r2 AS (SELECT grp, cp, t, 2 * (cum - t) + t + 1 AS r2 FROM st),
             |ag AS (SELECT grp, CAST(sum(t) AS HUGEINT) AS n,
             |    sum(CAST(cp AS HUGEINT) * r2) AS w2p,
             |    sum(CAST(t AS HUGEINT) * t * t - t) AS tie_t
             |  FROM r2 GROUP BY 1),
             |dv2 AS (SELECT grp, n, w2p, tie_t,
             |    2 * w2p - n * (n + 1) AS dev FROM ag)
             |SELECT grp, CAST(n AS BIGINT) AS n_pairs,
             |  CAST(w2p AS BIGINT) AS w2_plus,
             |  CAST(CASE WHEN dev > 0 THEN 1 WHEN dev < 0 THEN -1
             |    ELSE 0 END AS BIGINT) AS shift_sign,
             |  CAST(CASE WHEN 625 * 3 * dev * dev >
             |      2401 * (2 * n * (n + 1) * (2 * n + 1) - tie_t)
             |    THEN 1 ELSE 0 END AS BIGINT) AS significant_95
             |FROM dv2 ORDER BY grp""".stripMargin),
      "Wilcoxon signed-rank paired test per event type: did each USER's " +
        "exact micro-mean value shift between the first and second half " +
        "of the month (same subjects, two conditions — the paired " +
        "companion q248's independent-arm test cannot answer)? Doubled " +
        "average ranks over the |d| histogram keep ties exact (2*W+ " +
        "integral), zero diffs and incomplete pairs drop, verdict is one " +
        "cleared-denominator decimal comparison"),

    // --------------- Mood's median k-group test
    "q270_mood_median" -> Q(
      (s, dir) =>
        graft.operators.ModelEval.moodMedianTest(
          Tables.events(s, dir), "event_type", "value"),
      Some("""WITH e AS (SELECT event_type AS cls,
             |    CAST(round(value * 1e6) AS BIGINT) AS sm FROM events),
             |h AS (SELECT cls, sm, count(*) AS cc FROM e GROUP BY 1, 2),
             |b AS (SELECT sm, sum(cc) AS t FROM h GROUP BY 1),
             |w AS (SELECT sm,
             |    sum(t) OVER (ORDER BY sm ROWS UNBOUNDED PRECEDING) AS cum,
             |    sum(t) OVER () AS ntot FROM b),
             |md AS (SELECT min(sm) AS med FROM w WHERE cum >= (ntot + 1) // 2),
             |pc AS (SELECT cls, CAST(sum(cc) AS HUGEINT) AS n_j,
             |    CAST(sum(CASE WHEN sm > (SELECT med FROM md) THEN cc
             |      ELSE 0 END) AS HUGEINT) AS a_j
             |  FROM h GROUP BY 1),
             |tt AS (SELECT count(*) AS k, sum(n_j) AS n_tot,
             |    sum(a_j) AS m_above FROM pc),
             |sj AS (SELECT sum(
             |    ((a_j * (SELECT n_tot FROM tt) - n_j * (SELECT m_above FROM tt))
             |     * (a_j * (SELECT n_tot FROM tt) - n_j * (SELECT m_above FROM tt)))
             |    // n_j) AS s FROM pc),
             |fin AS (SELECT tt.k, tt.n_tot, tt.m_above,
             |    CASE WHEN tt.k < 2 OR tt.m_above = 0 OR tt.m_above = tt.n_tot
             |      THEN CAST(-2000000 AS HUGEINT)
             |      ELSE (1000000::HUGEINT * sj.s)
             |        // (tt.m_above * (tt.n_tot - tt.m_above)) END AS chi2
             |  FROM tt CROSS JOIN sj)
             |SELECT CAST(k AS BIGINT) AS k, CAST(n_tot AS BIGINT) AS n,
             |  CAST(m_above AS BIGINT) AS m_above,
             |  CAST(chi2 AS BIGINT) AS chi2_micro,
             |  CAST(CASE WHEN chi2 = -2000000 THEN -1
             |    ELSE CAST(chi2 >= CASE k - 1
             |      WHEN 1 THEN 3841459 WHEN 2 THEN 5991465
             |      WHEN 3 THEN 7814728 WHEN 4 THEN 9487729
             |      WHEN 5 THEN 11070498 WHEN 6 THEN 12591587
             |      ELSE 14067140 END AS INT) END AS BIGINT) AS significant_95
             |FROM fin""".stripMargin),
      "Mood's median test across the event types: classify every value " +
        "above / not-above the POOLED lower median (exact from the value " +
        "histogram, ties land low deterministically — no drops) and " +
        "chi-square the kx2 table with a DEFINED integer order (per-class " +
        "truncating DIV + one final micro division) — the outlier-proof " +
        "coarse companion to q250's rank ANOVA, verdict vs the " +
        "chi2(k-1, .95) micro literal"),

    // --------------- Cramér–von Mises integrated drift test
    "q272_cvm_drift" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir).withColumn("side",
          conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint") % 2)
        graft.operators.ModelEval.cvmTest(ev, "event_type", "value", "side")
          .orderBy(col("grp"))
      },
      Some(s"""WITH e AS (SELECT event_type AS grp,
              |    CAST(round(value * 1e6) AS BIGINT) AS sm,
              |    ${hex8("md5(CAST(user_id AS VARCHAR))")} % 2 AS side
              |  FROM events),
              |pv AS (SELECT grp, sm,
              |    sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS ca,
              |    sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cb
              |  FROM e GROUP BY 1, 2),
              |st AS (SELECT grp, ca, cb,
              |    sum(ca) OVER (PARTITION BY grp ORDER BY sm
              |      ROWS UNBOUNDED PRECEDING) AS cum_a,
              |    sum(cb) OVER (PARTITION BY grp ORDER BY sm
              |      ROWS UNBOUNDED PRECEDING) AS cum_b,
              |    sum(ca) OVER (PARTITION BY grp) AS na,
              |    sum(cb) OVER (PARTITION BY grp) AS nb FROM pv),
              |sb AS (SELECT grp, ca, cb, na, nb,
              |    CASE WHEN na = 0 OR nb = 0 THEN CAST(0 AS HUGEINT)
              |      ELSE ((CAST(nb AS HUGEINT) * cum_a
              |        - CAST(na AS HUGEINT) * cum_b)
              |       * (CAST(nb AS HUGEINT) * cum_a
              |        - CAST(na AS HUGEINT) * cum_b))
              |      // (CAST(na AS HUGEINT) * nb) END AS s FROM st),
              |ag AS (SELECT grp, max(na) AS n_a, max(nb) AS n_b,
              |    sum((CAST(ca AS HUGEINT) + cb) * s) AS ts FROM sb GROUP BY 1),
              |f AS (SELECT grp, n_a, n_b,
              |    CASE WHEN n_a = 0 OR n_b = 0 THEN CAST(-1 AS HUGEINT)
              |      ELSE (1000000::HUGEINT * ts)
              |        // ((CAST(n_a AS HUGEINT) + n_b)
              |           * (CAST(n_a AS HUGEINT) + n_b)) END AS t_cvm
              |  FROM ag)
              |SELECT grp, CAST(n_a AS BIGINT) AS n_a,
              |  CAST(n_b AS BIGINT) AS n_b,
              |  CAST(t_cvm AS BIGINT) AS t_cvm_micro,
              |  CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN -1
              |    WHEN t_cvm >= 461360 THEN 1 ELSE 0 END AS BIGINT)
              |    AS drift_95
              |FROM f ORDER BY grp""".stripMargin),
      "Cramér–von Mises two-sample criterion per event type over the " +
        "q248 md5-parity arms — the integrated squared-CDF-gap drift " +
        "test that catches slow persistent deviations KS's sup misses: " +
        "per-block DIV-then-weight defined integer order over the same " +
        "value histogram q141/q248 ride, verdict vs the asymptotic " +
        "0.46136 micro literal; the 4th reduction the streamed histogram " +
        "feeds (StreamingCvm)")
  )
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Second tranche of the §2.2 checklist: statistical aggregates,
  * argmin/argmax, session & sliding time windows (batch analogs of the
  * streaming forms), approximate distinct (HLL), correlated EXISTS, and
  * the IVF ANN path.
  */
object AdvancedQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.table(s, dir, n)
  private def r4(c: Column): Column = round(c, 4)

  /** DuckDB replay of `Similarity.trainIntCentroids` over `embeddings`
    * (8 clusters, 3 Lloyd rounds, dim fixed at 64 in the synthetic
    * corpus): iteration i assigns by exact integer squared distance to
    * c{i-1} and floor-divides per-dim sums into c{i} (empty clusters
    * keep the previous centroid); `af` is the final assignment against
    * c3. Training iterates over `tr` — the md5-smallest 1024 vectors
    * (Similarity.TrainSampleSize), the same bounded deterministic sample
    * the Scala trainers use — while `af` assigns the FULL corpus.
    * Shared WITH-prefix of the q58/q83/q84 oracles.
    */
  private def lloydIter(i: Int): String =
    s"""asg$i AS (SELECT vec_id, vq, cid FROM (
       |  SELECT e.vec_id, e.vq, c.cid, row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |    list_sum(list_transform(generate_series(1, 64), d -> (e.vq[d] - c.c[d]) * (e.vq[d] - c.c[d]))), c.cid) AS rn
       |  FROM tr e CROSS JOIN c${i - 1} c) WHERE rn = 1),
       |s$i AS (SELECT cid, dd.d AS d, sum(vq[dd.d]) AS s, count(*) AS cnt
       |  FROM asg$i CROSS JOIN generate_series(1, 64) AS dd(d) GROUP BY cid, dd.d),
       |m$i AS (SELECT cid, list((s - ((s % cnt + cnt) % cnt)) // cnt ORDER BY d) AS c FROM s$i GROUP BY cid),
       |c$i AS (SELECT p.cid, COALESCE(m$i.c, p.c) AS c FROM c${i - 1} p LEFT JOIN m$i USING (cid))""".stripMargin

  /** Subspace (product-quantization) Lloyd replay: the q58 recurrence
    * with the subspace index j carried as DATA — codebooks are keyed
    * (j, cid), slices are 16-wide (m=4 over dim 64), and every CTE
    * partitions by (vec_id, j) where q58's partitioned by vec_id.
    */
  private def pqIter(i: Int): String =
    s"""pasg$i AS (SELECT vec_id, j, sq, cid FROM (
       |  SELECT s.vec_id, s.j, s.sq, c.cid, row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY
       |    list_sum(list_transform(generate_series(1, 16), d -> (s.sq[d] - c.c[d]) * (s.sq[d] - c.c[d]))), c.cid) AS rn
       |  FROM ptr s JOIN pc${i - 1} c ON c.j = s.j) WHERE rn = 1),
       |ps$i AS (SELECT j, cid, dd.d AS d, sum(sq[dd.d]) AS s, count(*) AS cnt
       |  FROM pasg$i CROSS JOIN generate_series(1, 16) AS dd(d) GROUP BY j, cid, dd.d),
       |pm$i AS (SELECT j, cid, list((s - ((s % cnt + cnt) % cnt)) // cnt ORDER BY d) AS c FROM ps$i GROUP BY j, cid),
       |pc$i AS (SELECT p.j, p.cid, COALESCE(pm$i.c, p.c) AS c FROM pc${i - 1} p
       |  LEFT JOIN pm$i ON pm$i.j = p.j AND pm$i.cid = p.cid)""".stripMargin

  private val lloydWith: String =
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS vq
       |  FROM embeddings),
       |tr AS (SELECT vec_id, vq FROM e
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1024),
       |ini AS (SELECT vq, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk FROM e),
       |c0 AS (SELECT rk - 1 AS cid, vq AS c FROM ini WHERE rk <= 8),
       |${lloydIter(1)},
       |${lloydIter(2)},
       |${lloydIter(3)},
       |af AS (SELECT vec_id, cid FROM (
       |  SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |    list_sum(list_transform(generate_series(1, 64), d -> (e.vq[d] - c.c[d]) * (e.vq[d] - c.c[d]))), c.cid) AS rn
       |  FROM e CROSS JOIN c3 c) WHERE rn = 1)""".stripMargin

  /** [[lloydWith]] with training restricted to the md5-gated BASE corpus
    * (80% — the q193 incremental split): seeds (`ini`) and the Lloyd
    * sample (`tr`) read only base rows, while `e`/`af` keep covering the
    * FULL corpus, so downstream encode/probe CTEs replay base-trained
    * frozen-codebook encoding of base ∪ delta verbatim.
    */
  private val lloydWithBase: String =
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS vq
       |  FROM embeddings),
       |bs AS (SELECT vec_id, vq FROM e
       |  WHERE substring(md5(CAST(vec_id AS VARCHAR)), 1, 4) < 'cccc'),
       |tr AS (SELECT vec_id, vq FROM bs
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1024),
       |ini AS (SELECT vq, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk FROM bs),
       |c0 AS (SELECT rk - 1 AS cid, vq AS c FROM ini WHERE rk <= 8),
       |${lloydIter(1)},
       |${lloydIter(2)},
       |${lloydIter(3)},
       |af AS (SELECT vec_id, cid FROM (
       |  SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |    list_sum(list_transform(generate_series(1, 64), d -> (e.vq[d] - c.c[d]) * (e.vq[d] - c.c[d]))), c.cid) AS rn
       |  FROM e CROSS JOIN c3 c) WHERE rn = 1)""".stripMargin

  /** The IVF-PQ encode + probe replay shared by q143 (self-trained) and
    * q277 (base-trained incremental): PQ codebook rounds over `tr`/`ini`,
    * full-corpus encode, nProbe=3 coarse selection, ADC top-20, exact
    * cosine rerank to top-10. Which corpus TRAINED the model is entirely
    * a property of the WITH prefix (`lloydWith` vs `lloydWithBase`).
    */
  private val ivfPqBodySql: String =
    s"""psub AS (SELECT vec_id, js.j, list_slice(vq, js.j * 16 + 1, js.j * 16 + 16) AS sq
       |  FROM e CROSS JOIN generate_series(0, 3) AS js(j)),
       |ptr AS (SELECT s.vec_id, s.j, s.sq FROM psub s JOIN tr ON tr.vec_id = s.vec_id),
       |pc0 AS (SELECT js.j, rk - 1 AS cid, list_slice(vq, js.j * 16 + 1, js.j * 16 + 16) AS c
       |  FROM ini CROSS JOIN generate_series(0, 3) AS js(j) WHERE rk <= 16),
       |${pqIter(1)},
       |${pqIter(2)},
       |${pqIter(3)},
       |enc AS (SELECT vec_id, j, cid FROM (
       |  SELECT s.vec_id, s.j, c.cid, row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY
       |    list_sum(list_transform(generate_series(1, 16), d -> (s.sq[d] - c.c[d]) * (s.sq[d] - c.c[d]))), c.cid) AS rn
       |  FROM psub s JOIN pc3 c ON c.j = s.j) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, vq AS qvq FROM e WHERE vec_id < 5),
       |pr AS (SELECT query_id, c.cid AS bucket, row_number() OVER (PARTITION BY query_id ORDER BY
       |    list_sum(list_transform(generate_series(1, 64), d -> (q.qvq[d] - c.c[d]) * (q.qvq[d] - c.c[d]))), c.cid) AS crank
       |  FROM q CROSS JOIN c3 c),
       |sel AS (SELECT query_id, bucket FROM pr WHERE crank <= 3),
       |qsub AS (SELECT query_id, js.j, list_slice(qvq, js.j * 16 + 1, js.j * 16 + 16) AS sq
       |  FROM q CROSS JOIN generate_series(0, 3) AS js(j)),
       |tbl AS (SELECT s.query_id, c.j, c.cid,
       |    list_sum(list_transform(generate_series(1, 16), d -> (s.sq[d] - c.c[d]) * (s.sq[d] - c.c[d]))) AS dist
       |  FROM qsub s JOIN pc3 c ON c.j = s.j),
       |ad AS (SELECT t.query_id, enc.vec_id AS neighbor_id, CAST(sum(t.dist) AS BIGINT) AS adist
       |  FROM enc JOIN tbl t ON t.j = enc.j AND t.cid = enc.cid
       |  JOIN af a ON a.vec_id = enc.vec_id
       |  JOIN sel s ON s.query_id = t.query_id AND s.bucket = a.cid
       |  WHERE enc.vec_id <> t.query_id
       |  GROUP BY 1, 2),
       |cand AS (SELECT query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS arank
       |  FROM ad) WHERE arank <= 20),
       |scored AS (SELECT c.query_id, c.neighbor_id,
       |    list_dot_product(qe.v, ce.v) /
       |      (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))) AS cos
       |  FROM cand c JOIN e qe ON qe.vec_id = c.query_id JOIN e ce ON ce.vec_id = c.neighbor_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** [[lloydIter]] with every fraction-dependent CTE name prefixed, so
    * several trainings stack in ONE WITH (the q284 recall-decay sweep).
    * Chain CTEs are MATERIALIZED — DuckDB 1.0 inlines multi-referenced
    * CTEs, and three stacked trainings would re-execute each Lloyd round
    * exponentially otherwise (the q283 oracle lesson). `e` stays shared.
    */
  private def lloydIterP(x: String, i: Int): String =
    s"""${x}asg$i AS MATERIALIZED (SELECT vec_id, vq, cid FROM (
       |  SELECT e.vec_id, e.vq, c.cid, row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |    list_sum(list_transform(generate_series(1, 64), d -> (e.vq[d] - c.c[d]) * (e.vq[d] - c.c[d]))), c.cid) AS rn
       |  FROM ${x}tr e CROSS JOIN ${x}c${i - 1} c) WHERE rn = 1),
       |${x}s$i AS MATERIALIZED (SELECT cid, dd.d AS d, sum(vq[dd.d]) AS s, count(*) AS cnt
       |  FROM ${x}asg$i CROSS JOIN generate_series(1, 64) AS dd(d) GROUP BY cid, dd.d),
       |${x}m$i AS MATERIALIZED (SELECT cid, list((s - ((s % cnt + cnt) % cnt)) // cnt ORDER BY d) AS c FROM ${x}s$i GROUP BY cid),
       |${x}c$i AS MATERIALIZED (SELECT p.cid, COALESCE(${x}m$i.c, p.c) AS c FROM ${x}c${i - 1} p LEFT JOIN ${x}m$i USING (cid))""".stripMargin

  /** [[pqIter]], fraction-prefixed + MATERIALIZED like [[lloydIterP]]. */
  private def pqIterP(x: String, i: Int): String =
    s"""${x}pasg$i AS MATERIALIZED (SELECT vec_id, j, sq, cid FROM (
       |  SELECT s.vec_id, s.j, s.sq, c.cid, row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY
       |    list_sum(list_transform(generate_series(1, 16), d -> (s.sq[d] - c.c[d]) * (s.sq[d] - c.c[d]))), c.cid) AS rn
       |  FROM ${x}ptr s JOIN ${x}pc${i - 1} c ON c.j = s.j) WHERE rn = 1),
       |${x}ps$i AS MATERIALIZED (SELECT j, cid, dd.d AS d, sum(sq[dd.d]) AS s, count(*) AS cnt
       |  FROM ${x}pasg$i CROSS JOIN generate_series(1, 16) AS dd(d) GROUP BY j, cid, dd.d),
       |${x}pm$i AS MATERIALIZED (SELECT j, cid, list((s - ((s % cnt + cnt) % cnt)) // cnt ORDER BY d) AS c FROM ${x}ps$i GROUP BY j, cid),
       |${x}pc$i AS MATERIALIZED (SELECT p.j, p.cid, COALESCE(${x}pm$i.c, p.c) AS c FROM ${x}pc${i - 1} p
       |  LEFT JOIN ${x}pm$i ON ${x}pm$i.j = p.j AND ${x}pm$i.cid = p.cid)""".stripMargin

  /** One recall-decay point in SQL: the FULL q277 replay (base-gated
    * training, frozen-codebook full-corpus encode, nProbe=3 probe, ADC
    * top-`rerank`, exact-cosine top-10) under fraction prefix `x` with
    * gate threshold `hex`, reduced against the shared `gt` ground truth
    * to one `(delta_bps, n_base, n_delta, mean_recall_ppm)` row
    * (micro-averaged: 1e6·Σhits DIV Σtrue, exactly the Spark side's
    * integer convention).
    */
  /** The full q284 recall-decay WITH (shared verbatim by q291's trigger
    * oracle): ONE brute-force ground truth + the three per-fraction
    * train/encode/probe sweeps, ending after the `fcrow` CTE so callers
    * append their own final CTEs/SELECT. */
  private lazy val recallDecayWithSql: String =
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS vq
       |  FROM embeddings),
       |psub AS MATERIALIZED (SELECT vec_id, js.j, list_slice(vq, js.j * 16 + 1, js.j * 16 + 16) AS sq
       |  FROM e CROSS JOIN generate_series(0, 3) AS js(j)),
       |q AS MATERIALIZED (SELECT vec_id AS query_id, vq AS qvq FROM e WHERE vec_id < 40),
       |qsub AS MATERIALIZED (SELECT query_id, js.j, list_slice(qvq, js.j * 16 + 1, js.j * 16 + 16) AS sq
       |  FROM q CROSS JOIN generate_series(0, 3) AS js(j)),
       |gs AS (SELECT q.query_id, ce.vec_id AS neighbor_id,
       |    list_dot_product(qe.v, ce.v) /
       |      (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))) AS cos
       |  FROM q JOIN e qe ON qe.vec_id = q.query_id CROSS JOIN e ce
       |  WHERE ce.vec_id <> q.query_id),
       |gt AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM gs) WHERE rnk <= 10),
       |${sweepFracSql("fa", 2000, Similarity.baseGateHex(2000), 40)},
       |${sweepFracSql("fb", 5000, Similarity.baseGateHex(5000), 40)},
       |${sweepFracSql("fc", 8000, Similarity.baseGateHex(8000), 40)}""".stripMargin

  private def sweepFracSql(x: String, bps: Int, hex: String, rerank: Int): String =
    s"""${x}bs AS MATERIALIZED (SELECT vec_id, vq FROM e
       |  WHERE substring(md5(CAST(vec_id AS VARCHAR)), 1, 4) < '$hex'),
       |${x}tr AS MATERIALIZED (SELECT vec_id, vq FROM ${x}bs
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1024),
       |${x}ini AS MATERIALIZED (SELECT vq, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk FROM ${x}bs),
       |${x}c0 AS MATERIALIZED (SELECT rk - 1 AS cid, vq AS c FROM ${x}ini WHERE rk <= 8),
       |${lloydIterP(x, 1)},
       |${lloydIterP(x, 2)},
       |${lloydIterP(x, 3)},
       |${x}af AS MATERIALIZED (SELECT vec_id, cid FROM (
       |  SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |    list_sum(list_transform(generate_series(1, 64), d -> (e.vq[d] - c.c[d]) * (e.vq[d] - c.c[d]))), c.cid) AS rn
       |  FROM e CROSS JOIN ${x}c3 c) WHERE rn = 1),
       |${x}ptr AS MATERIALIZED (SELECT s.vec_id, s.j, s.sq FROM psub s JOIN ${x}tr tr ON tr.vec_id = s.vec_id),
       |${x}pc0 AS MATERIALIZED (SELECT js.j, rk - 1 AS cid, list_slice(vq, js.j * 16 + 1, js.j * 16 + 16) AS c
       |  FROM ${x}ini CROSS JOIN generate_series(0, 3) AS js(j) WHERE rk <= 16),
       |${pqIterP(x, 1)},
       |${pqIterP(x, 2)},
       |${pqIterP(x, 3)},
       |${x}enc AS MATERIALIZED (SELECT vec_id, j, cid FROM (
       |  SELECT s.vec_id, s.j, c.cid, row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY
       |    list_sum(list_transform(generate_series(1, 16), d -> (s.sq[d] - c.c[d]) * (s.sq[d] - c.c[d]))), c.cid) AS rn
       |  FROM psub s JOIN ${x}pc3 c ON c.j = s.j) WHERE rn = 1),
       |${x}pr AS MATERIALIZED (SELECT query_id, c.cid AS bucket, row_number() OVER (PARTITION BY query_id ORDER BY
       |    list_sum(list_transform(generate_series(1, 64), d -> (q.qvq[d] - c.c[d]) * (q.qvq[d] - c.c[d]))), c.cid) AS crank
       |  FROM q CROSS JOIN ${x}c3 c),
       |${x}sel AS MATERIALIZED (SELECT query_id, bucket FROM ${x}pr WHERE crank <= 3),
       |${x}tbl AS MATERIALIZED (SELECT s.query_id, c.j, c.cid,
       |    list_sum(list_transform(generate_series(1, 16), d -> (s.sq[d] - c.c[d]) * (s.sq[d] - c.c[d]))) AS dist
       |  FROM qsub s JOIN ${x}pc3 c ON c.j = s.j),
       |${x}ad AS MATERIALIZED (SELECT t.query_id, enc.vec_id AS neighbor_id, CAST(sum(t.dist) AS BIGINT) AS adist
       |  FROM ${x}enc enc JOIN ${x}tbl t ON t.j = enc.j AND t.cid = enc.cid
       |  JOIN ${x}af a ON a.vec_id = enc.vec_id
       |  JOIN ${x}sel s ON s.query_id = t.query_id AND s.bucket = a.cid
       |  WHERE enc.vec_id <> t.query_id
       |  GROUP BY 1, 2),
       |${x}cand AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS arank
       |  FROM ${x}ad) WHERE arank <= $rerank),
       |${x}scored AS MATERIALIZED (SELECT c.query_id, c.neighbor_id,
       |    list_dot_product(qe.v, ce.v) /
       |      (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))) AS cos
       |  FROM ${x}cand c JOIN e qe ON qe.vec_id = c.query_id JOIN e ce ON ce.vec_id = c.neighbor_id),
       |${x}ap AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM ${x}scored) WHERE rank <= 10),
       |${x}row AS MATERIALIZED (SELECT CAST($bps AS INTEGER) AS delta_bps,
       |  (SELECT CAST(count(*) AS BIGINT) FROM ${x}bs) AS n_base,
       |  (SELECT CAST(count(*) AS BIGINT) FROM e) -
       |    (SELECT CAST(count(*) AS BIGINT) FROM ${x}bs) AS n_delta,
       |  CAST((1000000 * (SELECT count(*) FROM gt JOIN ${x}ap USING (query_id, neighbor_id)))
       |    // (SELECT count(*) FROM gt) AS BIGINT) AS mean_recall_ppm)""".stripMargin

  val queries: Seq[(String, Q)] = Seq(

    // ------------------------------------------------- statistical aggregates
    "q47_stats_agg" -> Q(
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            r4(stddev(col("l_extendedprice"))).as("sd_price"),
            r4(var_samp(col("l_quantity"))).as("var_qty"),
            r4(corr(col("l_quantity"), col("l_extendedprice"))).as("qty_price_corr"),
            r4(covar_samp(col("l_quantity"), col("l_discount"))).as("qty_disc_cov"),
            r4(expr("percentile(l_extendedprice, 0.5)")).as("median_price"),
            r4(expr("percentile(l_extendedprice, 0.9)")).as("p90_price"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
             |  round(var_samp(l_quantity), 4) AS var_qty,
             |  round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
             |  round(covar_samp(l_quantity, l_discount), 4) AS qty_disc_cov,
             |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
             |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      "statistical aggregate family (stddev/var/corr/covar/exact percentile)"),

    // ------------------------------------------------------ discrete quantiles
    "q81_percentile_disc" -> Q(
      (s, dir) => {
        // DISCRETE quantiles (rank-based, standard ceil(p*n)-th smallest):
        // the result is an actual corpus value, so equality is exact with
        // no interpolation-arithmetic rounding (contrast q47's
        // percentile/quantile_cont, which must round to 4dp)
        t(s, dir, "lineitem").createOrReplaceTempView("__q81_lineitem")
        s.sql("""
          SELECT l_returnflag,
            percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25,
            percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
            percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS p75,
            percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS p95,
            count(*) AS n
          FROM __q81_lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
      },
      // the oracle states the rank definition explicitly (min value with
      // row_number >= ceil(p*n)) rather than relying on quantile_disc,
      // whose index convention differs across engines
      Some("""WITH r AS (
             |  SELECT l_returnflag, l_extendedprice AS v,
             |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
             |    count(*) OVER (PARTITION BY l_returnflag) AS n
             |  FROM lineitem)
             |SELECT l_returnflag,
             |  min(CASE WHEN rn >= ceil(0.25 * n) THEN v END) AS p25,
             |  min(CASE WHEN rn >= ceil(0.5 * n)  THEN v END) AS p50,
             |  min(CASE WHEN rn >= ceil(0.75 * n) THEN v END) AS p75,
             |  min(CASE WHEN rn >= ceil(0.95 * n) THEN v END) AS p95,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      "discrete (rank-based) quantiles via percentile_disc; exact value equality, no rounding"),

    // ----------------------------------------------------------- argmin/argmax
    "q48_argminmax" -> Q(
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            // ties on price resolve to the SMALLEST orderkey on both sides
            max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey") * -1)).as("priciest_order"),
            min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("cheapest_order"),
            r4(max(col("o_totalprice"))).as("max_price"))
          .orderBy(col("o_orderstatus")),
      Some("""WITH r AS (SELECT o_orderstatus, o_orderkey, o_totalprice,
             |  row_number() OVER (PARTITION BY o_orderstatus
             |    ORDER BY o_totalprice DESC, o_orderkey) AS rd,
             |  row_number() OVER (PARTITION BY o_orderstatus
             |    ORDER BY o_totalprice ASC, o_orderkey) AS ra
             |  FROM orders)
             |SELECT o_orderstatus,
             |  max(CASE WHEN rd = 1 THEN o_orderkey END) AS priciest_order,
             |  max(CASE WHEN ra = 1 THEN o_orderkey END) AS cheapest_order,
             |  round(max(o_totalprice), 4) AS max_price
             |FROM r GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      "max_by/min_by with deterministic price-then-key tiebreak"),

    // --------------------------------------------------------- session windows
    // Spark session_window: window.start = first event, end = last + gap.
    // The DuckDB oracle derives the same sessions with lag + cumulative sum.
    "q49_session_window" -> Q(
      (s, dir) =>
        Tables.events(s, dir)
          .filter(col("user_id") < 20)
          .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n_events"), r4(sum(col("value"))).as("sum_value"))
          .select(
            col("user_id"),
            date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            col("n_events"), col("sum_value"))
          .orderBy(col("user_id"), col("session_start")),
      Some("""WITH o AS (
             |  SELECT user_id, ts, value,
             |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |           > INTERVAL 30 MINUTE OR
             |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |    THEN 1 ELSE 0 END AS new_s
             |  FROM events WHERE user_id < 20),
             |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |        ROWS UNBOUNDED PRECEDING) AS sid FROM o)
             |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             |  count(*) AS n_events, round(sum(value), 4) AS sum_value
             |FROM s GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin),
      "session windows (30 min gap) — batch analog of streaming session_window"),

    // --------------------------------------------------------- sliding windows
    "q50_sliding_window" -> Q(
      (s, dir) =>
        Tables.events(s, dir)
          .filter(col("ts") < lit("2024-01-02"))
          .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
          // ORDER-INDEPENDENT mean: per-row fixed-point rounding to micro
          // units, exact integer sum, one double division — a plain
          // avg(double) accumulates in engine-specific order and flips the
          // 4th decimal on ~1% of sf0.1 windows vs the oracle
          .agg(
            count(lit(1)).as("n"),
            sum(round(col("value") * 1000000).cast("long")).as("s6"))
          .select(
            date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
            col("n"),
            round(col("s6").cast("double") / (col("n") * 1000000.0), 4).as("avg_value"))
          .orderBy(col("win_start")),
      Some("""WITH slid AS (
             |  SELECT time_bucket(INTERVAL 5 MINUTE, ts) - k * INTERVAL 5 MINUTE AS ws,
             |    value
             |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
             |  WHERE ts < TIMESTAMP '2024-01-02'
             |    AND ts >= time_bucket(INTERVAL 5 MINUTE, ts) - k * INTERVAL 5 MINUTE
             |    AND ts < time_bucket(INTERVAL 5 MINUTE, ts) - k * INTERVAL 5 MINUTE
             |          + INTERVAL 10 MINUTE)
             |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
             |  count(*) AS n,
             |  round(CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
             |        / (count(*) * 1000000.0), 4) AS avg_value
             |FROM slid GROUP BY ws ORDER BY win_start""".stripMargin),
      "sliding (hopping) windows: each event lands in length/slide windows"),

    // ------------------------------------------------- approx distinct (HLL)
    "q51_approx_distinct" -> Q(
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
            countDistinct(col("l_partkey")).as("exact_parts"))
          // the HLL sketch VALUE is engine-specific, so the oracled output
          // carries the exact count plus the sketch's error bound as a
          // boolean the oracle asserts true — a real cross-engine check of
          // both the exact distinct and the sketch's accuracy contract
          .select(
            col("l_returnflag"),
            col("exact_parts"),
            (abs(col("approx") - col("exact_parts")).cast("double") /
              col("exact_parts") <= 0.05).as("approx_ok"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
             |  true AS approx_ok
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      "approx_count_distinct (HyperLogLog++) pinned within 5% of exact"),

    // ------------------------------------------------------ correlated EXISTS
    "q52_correlated_exists" -> Q(
      (s, dir) => {
        Tables.register(s, dir, "part", "lineitem")
        s.sql("""SELECT p_partkey, p_brand
                |FROM part
                |WHERE p_partkey <= 200 AND EXISTS (
                |  SELECT 1 FROM lineitem
                |  WHERE l_partkey = p_partkey AND l_quantity > 45)
                |ORDER BY p_partkey""".stripMargin)
      },
      Some("""SELECT p_partkey, p_brand
             |FROM part
             |WHERE p_partkey <= 200 AND EXISTS (
             |  SELECT 1 FROM lineitem
             |  WHERE l_partkey = p_partkey AND l_quantity > 45)
             |ORDER BY p_partkey""".stripMargin),
      "correlated EXISTS subquery (decorrelated by Catalyst into a semi join)"),

    // ----------------------------------------------------------- IVF ANN path
    // Lloyd training reproduced in SQL: iteration i assigns by exact
    // integer squared distance to c{i-1} and floor-divides per-dim sums
    // into c{i} (empty clusters keep the previous centroid).
    "q58_sim_ivf_kmeans" -> Q(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.kmeansIntTopK(
            emb.filter(col("vec_id") < 5), emb, "embedding", "vec_id",
            k = 10, nClusters = 8, nProbe = 3, iters = 3)
          .orderBy(col("query_id"), col("rank"))
      },
      Some {
        s"""$lloydWith,
           |q AS (SELECT vec_id AS query_id, vq AS qvq FROM e WHERE vec_id < 5),
           |pr AS (SELECT query_id, c.cid AS bucket, row_number() OVER (PARTITION BY query_id ORDER BY
           |    list_sum(list_transform(generate_series(1, 64), d -> (q.qvq[d] - c.c[d]) * (q.qvq[d] - c.c[d]))), c.cid) AS crank
           |  FROM q CROSS JOIN c3 c),
           |sel AS (SELECT query_id, bucket FROM pr WHERE crank <= 3),
           |scored AS (SELECT s.query_id, a.vec_id AS neighbor_id,
           |    list_dot_product(qe.v, ce.v) /
           |      (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))) AS cos
           |  FROM sel s
           |  JOIN af a ON a.cid = s.bucket AND a.vec_id <> s.query_id
           |  JOIN e qe ON qe.vec_id = s.query_id
           |  JOIN e ce ON ce.vec_id = a.vec_id),
           |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM scored)
           |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
           |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
      },
      "IVF ANN with a KMeans-learned coarse quantizer — integer Lloyd's, fully engine-portable " +
        "(float-KMeans variant Similarity.ivfKmeansTopK stays spec-pinned)"),

    // -------------------------------------------------------- PQ-ADC ANN path
    // full subspace-Lloyd training + encoding + asymmetric-distance scan
    // + exact rerank replayed in SQL: everything up to the final cosine
    // is exact integer arithmetic in micro^2 units
    "q142_sim_pq_adc" -> Q(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.pqTopK(
            emb.filter(col("vec_id") < 5), emb, "embedding", "vec_id",
            k = 10, m = 4, nCentroids = 16, iters = 3, rerank = 20)
          .orderBy(col("query_id"), col("rank"))
      },
      Some {
        s"""WITH e AS (SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
           |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS vq
           |  FROM embeddings),
           |psub AS (SELECT vec_id, js.j, list_slice(vq, js.j * 16 + 1, js.j * 16 + 16) AS sq
           |  FROM e CROSS JOIN generate_series(0, 3) AS js(j)),
           |tr AS (SELECT vec_id, vq FROM e
           |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1024),
           |ptr AS (SELECT s.vec_id, s.j, s.sq FROM psub s JOIN tr ON tr.vec_id = s.vec_id),
           |ini AS (SELECT vec_id, vq, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk FROM e),
           |pc0 AS (SELECT js.j, rk - 1 AS cid, list_slice(vq, js.j * 16 + 1, js.j * 16 + 16) AS c
           |  FROM ini CROSS JOIN generate_series(0, 3) AS js(j) WHERE rk <= 16),
           |${pqIter(1)},
           |${pqIter(2)},
           |${pqIter(3)},
           |enc AS (SELECT vec_id, j, cid FROM (
           |  SELECT s.vec_id, s.j, c.cid, row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY
           |    list_sum(list_transform(generate_series(1, 16), d -> (s.sq[d] - c.c[d]) * (s.sq[d] - c.c[d]))), c.cid) AS rn
           |  FROM psub s JOIN pc3 c ON c.j = s.j) WHERE rn = 1),
           |q AS (SELECT vec_id AS query_id, vq FROM e WHERE vec_id < 5),
           |qsub AS (SELECT query_id, js.j, list_slice(vq, js.j * 16 + 1, js.j * 16 + 16) AS sq
           |  FROM q CROSS JOIN generate_series(0, 3) AS js(j)),
           |tbl AS (SELECT s.query_id, c.j, c.cid,
           |    list_sum(list_transform(generate_series(1, 16), d -> (s.sq[d] - c.c[d]) * (s.sq[d] - c.c[d]))) AS dist
           |  FROM qsub s JOIN pc3 c ON c.j = s.j),
           |ad AS (SELECT t.query_id, enc.vec_id AS neighbor_id, CAST(sum(t.dist) AS BIGINT) AS adist
           |  FROM enc JOIN tbl t ON t.j = enc.j AND t.cid = enc.cid
           |  WHERE enc.vec_id <> t.query_id
           |  GROUP BY 1, 2),
           |cand AS (SELECT query_id, neighbor_id FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS arank
           |  FROM ad) WHERE arank <= 20),
           |scored AS (SELECT c.query_id, c.neighbor_id,
           |    list_dot_product(qe.v, ce.v) /
           |      (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))) AS cos
           |  FROM cand c JOIN e qe ON qe.vec_id = c.query_id JOIN e ce ON ce.vec_id = c.neighbor_id),
           |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM scored)
           |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
           |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
      },
      "PQ-ADC ANN: per-subspace integer-Lloyd codebooks (trained on the md5-smallest " +
        "1024-vector sample, one scan per round trains all 4), m-byte corpus codes, " +
        "per-query exact integer distance tables, " +
        "approximate top-20 by table-lookup sums, exact cosine rerank to top-10 — " +
        "the compressed-domain scan that shrinks ANN memory traffic dim/m-fold"),

    // ------------------------------------------------------- IVF-PQ ANN path
    // coarse buckets (lloydWith's c3/af) prune enumeration, shared raw-
    // vector PQ codes prune per-pair cost; both training loops + probe +
    // ADC + exact rerank replayed in SQL
    "q143_sim_ivf_pq" -> Q(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfPqTopK(
            emb.filter(col("vec_id") < 5), emb, "embedding", "vec_id",
            k = 10, nClusters = 8, nProbe = 3, coarseIters = 3,
            m = 4, nCentroids = 16, pqIters = 3, rerank = 20)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"$lloydWith,\n$ivfPqBodySql"),
      "IVF-PQ ANN: integer-Lloyd coarse buckets prune pair enumeration (3 of 8 probed), " +
        "shared PQ codes prune per-pair cost, exact cosine rerank of the ADC top-20 — " +
        "nProbe and rerank as independent recall/cost knobs"),

    "q277_sim_ivf_pq_incremental" -> Q(
      (s, dir) => {
        // The daily-ingest index-maintenance shape (vector twin of q193's
        // incremental MinHash): TRAIN on the md5-gated 80% base only,
        // FREEZE the model, encode base and delta separately (the delta
        // encode is the stateless map-only pass a real pipeline runs per
        // day), union the coded index, probe against the union. Because
        // encoding is per-row under a frozen model, the union index is
        // bit-identical to a full re-encode — pinned by SimilaritySpec
        // and by this oracle, which replays base-trained codebooks over
        // the full corpus.
        val emb = t(s, dir, "embeddings")
        val gate =
          substring(md5(col("vec_id").cast("string")), 1, 4) < lit("cccc")
        val base = emb.filter(gate)
        val delta = emb.filter(!gate)
        // bootstrap: ONE quantized base scan shared by train + encode;
        // the delta encodes under the frozen model as usual
        val (model, baseIndex) = Similarity.ivfPqTrainEncode(
          base, "embedding", "vec_id",
          nClusters = 8, coarseIters = 3, m = 4, nCentroids = 16, pqIters = 3)
        val index = baseIndex
          .union(Similarity.ivfPqEncode(model, delta, "embedding", "vec_id"))
        Similarity.ivfPqProbeIndex(model, index,
            emb.filter(col("vec_id") < 5), "embedding", "vec_id",
            k = 10, nProbe = 3, rerank = 20)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"$lloydWithBase,\n$ivfPqBodySql"),
      "incremental IVF-PQ index maintenance: frozen base-trained codebooks encode the " +
        "delta without retraining or re-reading the base (map-only, delta-sized cost), " +
        "probe runs against the stored base ∪ delta index — the daily-ingest shape of a " +
        "100 TB embedding store"),

    "q284_sim_recall_decay" -> Q(
      (s, dir) => {
        // WHEN to retrain the incremental index (q277's operational
        // question): sweep the delta share, train on each md5-gated base,
        // encode the delta under the frozen model, probe the union, and
        // report micro-averaged recall@10 against ONE shared brute-force
        // ground truth — read the curve against your recall floor. The
        // three points run as concurrent driver threads (independent
        // pipelines over the same inputs).
        val emb = t(s, dir, "embeddings")
        Similarity.ivfPqRecallDecay(
            emb, emb.filter(col("vec_id") < 40), "embedding", "vec_id",
            deltaBps = Seq(2000, 5000, 8000), k = 10,
            nClusters = 8, coarseIters = 3, m = 4, nCentroids = 16,
            pqIters = 3, nProbe = 3, rerank = 40)
          .orderBy(col("delta_bps"))
      },
      Some(s"""$recallDecayWithSql
              |SELECT * FROM (
              |  SELECT * FROM farow UNION ALL
              |  SELECT * FROM fbrow UNION ALL
              |  SELECT * FROM fcrow)
              |ORDER BY delta_bps""".stripMargin),
      "recall-decay audit for the incremental IVF-PQ index: per delta share " +
        "(20/50/80%), base-trained frozen codebooks encode the union and the probe's " +
        "micro-averaged recall@10 vs shared brute-force ground truth is the retrain " +
        "trigger curve — oracle replays all three trainings + probes in one WITH"),

    "q291_sim_retrain_trigger" -> Q(
      (s, dir) => {
        // The operational DECISION on top of q284's curve: interpolate
        // the measured decay against a recall floor, compare the CURRENT
        // stored index's delta share (q277's md5-'cccc' composition —
        // one coded row per corpus vector, is_base = partition
        // provenance), and emit the retrain/no-retrain verdict a daily
        // scheduler polls. The curve arrives as a FROZEN artifact
        // (Pipelines.decayCurve, memoized — a scheduler polls a stored
        // curve; recomputation cost is q284's own entry), so this entry
        // measures the trigger itself.
        val emb = t(s, dir, "embeddings")
        val composition = emb.select(col("vec_id"))
          .withColumn("is_base",
            substring(md5(col("vec_id").cast("string")), 1, 4) < lit("cccc"))
        Similarity.ivfPqRetrainTrigger(
          graft.Pipelines.decayCurve(s, dir), composition, floorPpm = 350000L)
      },
      Some(s"""$recallDecayWithSql,
              |curve AS (SELECT delta_bps AS b, mean_recall_ppm AS r FROM (
              |  SELECT * FROM farow UNION ALL SELECT * FROM fbrow
              |  UNION ALL SELECT * FROM fcrow)),
              |compx AS (SELECT CAST(sum(CASE WHEN
              |      substring(md5(CAST(vec_id AS VARCHAR)), 1, 4) < 'cccc'
              |      THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
              |    CAST(count(*) AS BIGINT) AS n_total FROM embeddings),
              |ff AS (SELECT min(b) AS fail_b FROM curve WHERE r < 350000),
              |pv AS (SELECT arg_max(b, b) AS prev_b, arg_max(r, b) AS prev_r
              |  FROM curve, ff WHERE ff.fail_b IS NOT NULL AND b < ff.fail_b),
              |fr AS (SELECT min(r) AS fail_r FROM curve, ff WHERE b = ff.fail_b),
              |ed AS (SELECT max(b) AS edge_b FROM curve),
              |base AS (SELECT n_base, n_total - n_base AS n_delta,
              |    (10000 * (n_total - n_base)) // n_total AS current_delta_bps,
              |    CAST(350000 AS BIGINT) AS floor_ppm,
              |    CASE WHEN fail_b IS NULL THEN edge_b
              |         WHEN prev_b IS NULL THEN 0
              |         ELSE prev_b + ((fail_b - prev_b) * (prev_r - 350000))
              |           // (prev_r - fail_r) END AS max_safe_delta_bps,
              |    (fail_b IS NULL) AS at_curve_edge
              |  FROM compx, ff, pv, fr, ed)
              |SELECT n_base, n_delta, current_delta_bps, floor_ppm,
              |  max_safe_delta_bps, at_curve_edge,
              |  current_delta_bps > max_safe_delta_bps AS retrain
              |FROM base""".stripMargin),
      "retrain trigger for the incremental IVF-PQ index: piecewise-linear interpolation " +
        "of the q284 decay curve against a recall floor (exact integer crossing), joined " +
        "with the stored index's base/delta composition — emits max safe delta share and " +
        "the retrain verdict a daily scheduler polls; first-crossing semantics, endpoint " +
        "clamps flagged as at_curve_edge"),

    "q298_ann_retrain_loop" -> Q(
      (s, dir) => {
        // The EPOCH-SPLIT retrain LOOP — the batch composition the
        // streaming ANN index (StreamingAnnIndex, which ACTS on q291's
        // verdict) must equal row-for-row (StreamingAnnIndexSpec pins
        // stream ≡ this): vectors arrive in md5-banded batches (seed =
        // the 20%-base gate, batch 0 = the (20%, 50%] band, batch 1 =
        // the rest — NESTED gates, so every epoch's training corpus is a
        // standard gate the q284 oracle already replays); each batch is
        // encoded under the epoch in force, the retrain trigger is
        // polled against the FROZEN decay curve, and a firing verdict
        // retrains on everything ingested and hot-swaps the epoch.
        // `index_checksum` is an exact integer fold over the coded index
        // AFTER the batch — a model-epoch-dependent witness that the
        // retrain actually re-encoded (NULL only when batch 1 itself
        // fires: that epoch's full-corpus training is the one the curve
        // oracle does not precompute).
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        val curve = graft.Pipelines.decayCurve(s, dir)
        val floor = 350000L
        val h = substring(md5(col("vec_id").cast("string")), 1, 4)
        val g80 = Similarity.baseGateHex(8000) // 20% of ids below → seed
        val g50 = Similarity.baseGateHex(5000) // 50% below → seed ∪ batch0
        def trig(comp: org.apache.spark.sql.DataFrame) =
          Similarity.ivfPqRetrainTrigger(curve, comp, floor).collect()(0)
        def checksum(model: Similarity.IvfPqModel,
            rows: org.apache.spark.sql.DataFrame): Long = {
          val r = Similarity.ivfPqEncode(model, rows, "embedding", "vec_id")
            .agg((sum(col("bucket").cast("long")) * lit(1000003L) +
              sum(expr("aggregate(transform(code, (c, j) -> c * (j + 1)), " +
                "0L, (a, x) -> a + x)"))).as("cs"))
            .collect()(0).getLong(0)
          graft.operators.Dedup.releaseCaches()
          r
        }
        // batch 0: encode the (20%, 50%] band under the seed-trained
        // epoch, poll with is_base = seed
        val v0 = trig(emb.filter(h < lit(g50)).select(col("vec_id"))
          .withColumn("is_base",
            substring(md5(col("vec_id").cast("string")), 1, 4) < lit(g80)))
        val r0 = v0.getAs[Boolean]("retrain")
        val ms = v0.getAs[Long]("max_safe_delta_bps")
        // the epoch in force after batch 0: retrained on everything
        // ingested (= the 50% gate) when the verdict fired, else the
        // seed-trained epoch 0 (only the in-force model is trained here;
        // the streaming twin trains epoch 0 at seed() time)
        val mAfter0 = Similarity.ivfPqTrain(
          emb.filter(h < lit(if (r0) g50 else g80)), "embedding", "vec_id")
        val cs0 = checksum(mAfter0, emb.filter(h < lit(g50)))
        // batch 1: the rest arrives; base = whatever the epoch in force
        // was trained on
        val baseGate1 = if (r0) g50 else g80
        val v1 = trig(emb.select(col("vec_id"))
          .withColumn("is_base",
            substring(md5(col("vec_id").cast("string")), 1, 4) < lit(baseGate1)))
        val r1 = v1.getAs[Boolean]("retrain")
        val cs1: Option[Long] = if (r1) None else Some(checksum(mAfter0, emb))
        val b0After = if (r0) 1L else 0L
        val b1After = if (r1) 2L else b0After
        Seq(
          (0L, v0.getAs[Long]("n_base"), v0.getAs[Long]("n_delta"),
            v0.getAs[Long]("current_delta_bps"), ms, r0, b0After, Some(cs0)),
          (1L, v1.getAs[Long]("n_base"), v1.getAs[Long]("n_delta"),
            v1.getAs[Long]("current_delta_bps"), ms, r1, b1After, cs1))
          .toDF("batch_id", "n_base", "n_delta", "current_delta_bps",
            "max_safe_delta_bps", "retrain", "boundary_after", "index_checksum")
          .orderBy(col("batch_id"))
      },
      Some(s"""$recallDecayWithSql,
              |curve AS (SELECT delta_bps AS b, mean_recall_ppm AS r FROM (
              |  SELECT * FROM farow UNION ALL SELECT * FROM fbrow
              |  UNION ALL SELECT * FROM fcrow)),
              |ff AS (SELECT min(b) AS fail_b FROM curve WHERE r < 350000),
              |pv AS (SELECT arg_max(b, b) AS prev_b, arg_max(r, b) AS prev_r
              |  FROM curve, ff WHERE ff.fail_b IS NOT NULL AND b < ff.fail_b),
              |fr AS (SELECT min(r) AS fail_r FROM curve, ff WHERE b = ff.fail_b),
              |ed AS (SELECT max(b) AS edge_b FROM curve),
              |msx AS (SELECT CASE WHEN fail_b IS NULL THEN edge_b
              |    WHEN prev_b IS NULL THEN 0
              |    ELSE prev_b + ((fail_b - prev_b) * (prev_r - 350000))
              |      // (prev_r - fail_r) END AS ms FROM ff, pv, fr, ed),
              |hx AS (SELECT vec_id,
              |    substring(md5(CAST(vec_id AS VARCHAR)), 1, 4) AS h FROM embeddings),
              |cnt AS (SELECT
              |    CAST(sum(CASE WHEN h < '3333' THEN 1 ELSE 0 END) AS BIGINT) AS n_seed,
              |    CAST(sum(CASE WHEN h >= '3333' AND h < '8000' THEN 1 ELSE 0 END) AS BIGINT) AS n_b0,
              |    CAST(sum(CASE WHEN h >= '8000' THEN 1 ELSE 0 END) AS BIGINT) AS n_b1
              |  FROM hx),
              |g50v AS (SELECT vec_id FROM hx WHERE h < '8000'),
              |csfbh AS (SELECT (SELECT CAST(sum(cid) AS BIGINT) FROM fbaf JOIN g50v USING (vec_id)) * 1000003
              |    + (SELECT CAST(sum(cid * (j + 1)) AS BIGINT) FROM fbenc JOIN g50v USING (vec_id)) AS cs),
              |csfch AS (SELECT (SELECT CAST(sum(cid) AS BIGINT) FROM fcaf JOIN g50v USING (vec_id)) * 1000003
              |    + (SELECT CAST(sum(cid * (j + 1)) AS BIGINT) FROM fcenc JOIN g50v USING (vec_id)) AS cs),
              |csfba AS (SELECT (SELECT CAST(sum(cid) AS BIGINT) FROM fbaf) * 1000003
              |    + (SELECT CAST(sum(cid * (j + 1)) AS BIGINT) FROM fbenc) AS cs),
              |csfca AS (SELECT (SELECT CAST(sum(cid) AS BIGINT) FROM fcaf) * 1000003
              |    + (SELECT CAST(sum(cid * (j + 1)) AS BIGINT) FROM fcenc) AS cs),
              |led0 AS (SELECT n_seed AS n_base, n_b0 AS n_delta,
              |    (10000 * n_b0) // (n_seed + n_b0) AS bps0,
              |    (10000 * n_b0) // (n_seed + n_b0) > ms AS r0
              |  FROM cnt, msx),
              |led1 AS (SELECT
              |    CASE WHEN r0 THEN n_seed + n_b0 ELSE n_seed END AS n_base,
              |    CASE WHEN r0 THEN n_b1 ELSE n_b0 + n_b1 END AS n_delta,
              |    (10000 * (CASE WHEN r0 THEN n_b1 ELSE n_b0 + n_b1 END))
              |      // (n_seed + n_b0 + n_b1) AS bps1, r0
              |  FROM cnt, led0),
              |led1x AS (SELECT led1.*, msx.ms, bps1 > ms AS r1 FROM led1, msx)
              |SELECT CAST(0 AS BIGINT) AS batch_id, n_base, n_delta,
              |  CAST(bps0 AS BIGINT) AS current_delta_bps,
              |  CAST(ms AS BIGINT) AS max_safe_delta_bps, r0 AS retrain,
              |  CAST(CASE WHEN r0 THEN 1 ELSE 0 END AS BIGINT) AS boundary_after,
              |  CASE WHEN r0 THEN (SELECT cs FROM csfbh)
              |       ELSE (SELECT cs FROM csfch) END AS index_checksum
              |FROM led0, msx
              |UNION ALL
              |SELECT CAST(1 AS BIGINT), n_base, n_delta, CAST(bps1 AS BIGINT),
              |  CAST(ms AS BIGINT), r1,
              |  CAST(CASE WHEN r1 THEN 2 WHEN r0 THEN 1 ELSE 0 END AS BIGINT),
              |  CASE WHEN r1 THEN NULL
              |       WHEN r0 THEN (SELECT cs FROM csfba)
              |       ELSE (SELECT cs FROM csfca) END
              |FROM led1x
              |ORDER BY batch_id""".stripMargin),
      "streaming ANN retrain LOOP (the operator that ACTS on q291's verdict): " +
        "md5-banded micro-batches encode under the epoch in force, poll the trigger " +
        "against the frozen decay curve, and a firing verdict retrains on everything " +
        "ingested and hot-swaps the epoch — the ledger pins verdicts, boundaries, and " +
        "an exact integer checksum of the re-encoded index (model-epoch-dependent, so " +
        "the hash match proves the swap); oracle replays curve + both epoch trainings"),

    // ----------------------------------------------- embedding-space curation
    "q83_semdedup" -> Q(
      (s, dir) =>
        graft.operators.EmbeddingCuration.semDedup(
            t(s, dir, "embeddings"), "embedding", "vec_id",
            eps = 0.92, nClusters = 8, iters = 3)
          .orderBy(col("vec_id")),
      Some(
        s"""$lloydWith,
           |n AS (SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nn, af.cid
           |  FROM e JOIN af USING (vec_id)),
           |dup AS (SELECT DISTINCT x.vec_id
           |  FROM n x JOIN n y ON y.cid = x.cid AND y.vec_id < x.vec_id
           |  WHERE list_dot_product(x.v, y.v) / (x.nn * y.nn) > 0.92)
           |SELECT n.vec_id, n.cid AS bucket, (d.vec_id IS NULL) AS keep
           |FROM n LEFT JOIN dup d ON d.vec_id = n.vec_id
           |ORDER BY n.vec_id""".stripMargin),
      "SemDeDup: integer-Lloyd clusters, within-cluster cosine > eps to a smaller id -> drop " +
        "(pairwise work bounded by cluster size, never all-pairs)"),

    "q84_proto_rank" -> Q(
      (s, dir) =>
        graft.operators.EmbeddingCuration.prototypicality(
            t(s, dir, "embeddings"), "embedding", "vec_id",
            nClusters = 8, iters = 3)
          .orderBy(col("vec_id")),
      Some(
        s"""$lloydWith,
           |cl AS (SELECT cid, list_transform(c, x -> CAST(x AS DOUBLE)) AS cd FROM c3),
           |scored AS (SELECT e.vec_id, af.cid AS bucket,
           |    list_dot_product(e.v, cl.cd) /
           |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cl.cd, cl.cd))) AS cos
           |  FROM e JOIN af USING (vec_id) JOIN cl ON cl.cid = af.cid)
           |SELECT vec_id, bucket, round(cos, 6) AS proto_cos,
           |  row_number() OVER (PARTITION BY bucket ORDER BY cos DESC, vec_id) AS rank
           |FROM scored ORDER BY vec_id""".stripMargin),
      "prototypicality rank (SSL-prototypes / D4 stage 2): cosine to the integer-Lloyd " +
        "centroid, ranked within each cluster"),

    "q37_sim_ivf_topk" -> Q(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopK(
            emb.filter(col("vec_id") < 5), emb.withColumn("bucket", col("label")),
            "embedding", "vec_id", "bucket", k = 10, nProbe = 3)
          .orderBy(col("query_id"), col("rank"))
      },
      // the coarse quantizer is the deterministic label column and the
      // centroid is a per-dimension mean, so the whole probe-then-scan
      // pipeline is expressible in SQL. (Centroid means may differ by ulps
      // across engines — bucket selection margins dwarf that; the output
      // cosines come from exact left-to-right dots, not the means.)
      Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
             |cent AS (
             |  -- dim is fixed at 64 in the synthetic embeddings (all SFs);
             |  -- DuckDB table functions reject subquery arguments
             |  SELECT label AS bucket, d.d AS d, avg(v[d.d]) AS m
             |  FROM e CROSS JOIN generate_series(1, 64) AS d(d)
             |  GROUP BY label, d.d),
             |centl AS (SELECT bucket, list(m ORDER BY d) AS centroid FROM cent GROUP BY bucket),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
             |probes AS (
             |  SELECT query_id, bucket, row_number() OVER (PARTITION BY query_id ORDER BY
             |      list_dot_product(qv, centroid) /
             |        (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(centroid, centroid))) DESC,
             |      bucket ASC) AS crank
             |  FROM q CROSS JOIN centl),
             |sel AS (SELECT query_id, bucket FROM probes WHERE crank <= 3),
             |scored AS (
             |  SELECT s.query_id, c.vec_id AS neighbor_id,
             |    list_dot_product(qe.v, c.v) /
             |      (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
             |  FROM sel s
             |  JOIN e qe ON qe.vec_id = s.query_id
             |  JOIN e c ON c.label = s.bucket AND c.vec_id <> s.query_id),
             |ranked AS (SELECT *, row_number() OVER
             |    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
             |  FROM scored)
             |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
             |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin),
      "IVF-style ANN: label column as coarse quantizer, nProbe bucket scan"),

    // ------------------------------------------------------ outer & cross joins
    "q56_full_outer" -> Q(
      (s, dir) => {
        val bigCusts = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
          .select(col("c_custkey"), col("c_acctbal"))
        val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 350000)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big_orders"))
        bigCusts.join(bigOrders, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(
            coalesce(col("c_custkey"), lit(-1)).as("cust"),
            coalesce(col("o_custkey"), lit(-1)).as("ocust"),
            r4(coalesce(col("c_acctbal"), lit(0.0))).as("bal"),
            coalesce(col("n_big_orders"), lit(0)).as("n_big"))
          .orderBy(col("cust"), col("ocust"))
      },
      Some("""WITH bc AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
             |bo AS (SELECT o_custkey, count(*) AS n_big_orders FROM orders
             |       WHERE o_totalprice > 350000 GROUP BY o_custkey)
             |SELECT coalesce(c_custkey, -1) AS cust, coalesce(o_custkey, -1) AS ocust,
             |  round(coalesce(c_acctbal, 0), 4) AS bal,
             |  coalesce(n_big_orders, 0) AS n_big
             |FROM bc FULL OUTER JOIN bo ON c_custkey = o_custkey
             |ORDER BY cust, ocust""".stripMargin),
      "full outer join preserving unmatched rows from both sides"),

    "q57_cross_join" -> Q(
      (s, dir) => {
        val r = t(s, dir, "region").select(col("r_name"))
        val statuses = t(s, dir, "orders").select(col("o_orderstatus")).distinct()
        r.crossJoin(broadcast(statuses))
          .orderBy(col("r_name"), col("o_orderstatus"))
      },
      Some("""SELECT r_name, o_orderstatus
             |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
             |ORDER BY r_name, o_orderstatus""".stripMargin),
      "cartesian product of two tiny relations"),

    // ---------------------------------------------------------- map functions
    "q59_map_funcs" -> Q(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"), col("event_type"))
          .agg(max(col("event_id")).as("last_id")) // unique keys before map build
          .groupBy(col("user_id"))
          .agg(map_from_entries(array_sort(collect_list(
            struct(col("event_type"), col("last_id"))))).as("last_by_type"))
          .filter(col("user_id") < 10)
          .select(
            col("user_id"),
            size(col("last_by_type")).cast("bigint").as("n_types"),
            array_join(array_sort(map_keys(col("last_by_type"))), ",").as("types"))
          .orderBy(col("user_id")),
      Some("""SELECT user_id,
             |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
             |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
             |FROM events WHERE user_id < 10
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      "map construction + keys/size (map_from_entries keeps LAST dup entry)"),

    // ------------------------------------------------------------ lateral join
    "q60_lateral" -> Q(
      (s, dir) => {
        graft.Tables.register(s, dir, "nation", "orders", "customer")
        s.sql("""SELECT n_name, o_orderkey, top_price
                |FROM nation,
                |LATERAL (
                |  SELECT o.o_orderkey, round(o.o_totalprice, 4) AS top_price
                |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                |  WHERE c.c_nationkey = n_nationkey
                |  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2)
                |ORDER BY n_name, top_price DESC, o_orderkey""".stripMargin)
      },
      Some("""SELECT n_name, o_orderkey, top_price
             |FROM nation,
             |LATERAL (
             |  SELECT o.o_orderkey, round(o.o_totalprice, 4) AS top_price
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  WHERE c.c_nationkey = n_nationkey
             |  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2)
             |ORDER BY n_name, top_price DESC, o_orderkey""".stripMargin),
      "LATERAL correlated subquery: per-nation top-2 orders"),

    // ------------------------------------------------------ stratified sample
    "q61_stratified_sample" -> Q(
      (s, dir) => {
        val fractions = Map("purchase" -> 0.5, "click" -> 0.1, "view" -> 0.05)
        val ev = graft.Tables.events(s, dir)
        val sampled = ev
          .stat.sampleBy("event_type", fractions, seed = 42L)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_sampled"))
        val totals = ev
          .filter(col("event_type").isin(fractions.keys.toSeq.map(lit): _*))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_total"))
        // the sample RNG is engine-specific, so the oracled output carries
        // the exact stratum totals plus an in-bounds boolean (sampled count
        // within ±50% of fraction x total, floor 10) the oracle asserts
        // true — exact rates remain pinned by SamplingSpec
        val f = fractions.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
          when(col("event_type") === k, v).otherwise(acc) }
        totals.join(sampled, Seq("event_type"), "left")
          .select(
            col("event_type"),
            col("n_total"),
            (abs(coalesce(col("n_sampled"), lit(0L)) - f * col("n_total")) <=
              greatest(lit(10.0), f * col("n_total") * 0.5)).as("in_bounds"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n_total, true AS in_bounds
             |FROM events WHERE event_type IN ('purchase', 'click', 'view')
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      "seeded stratified sampling per class (corpus downsampling)"),

    // -------------------------------------------------------- column profiling
    "q62_profile" -> Q(
      (s, dir) =>
        t(s, dir, "lineitem")
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("l_quantity")).as("qty_nonnull"),
            countDistinct(col("l_partkey")).as("partkey_distinct"),
            r4(min(col("l_extendedprice"))).as("price_min"),
            r4(max(col("l_extendedprice"))).as("price_max"),
            r4(avg(col("l_extendedprice"))).as("price_mean"),
            min(date_format(col("l_shipdate"), "yyyy-MM-dd")).as("ship_min"),
            max(date_format(col("l_shipdate"), "yyyy-MM-dd")).as("ship_max")),
      Some("""SELECT count(*) AS n_rows,
             |  count(l_quantity) AS qty_nonnull,
             |  count(DISTINCT l_partkey) AS partkey_distinct,
             |  round(min(l_extendedprice), 4) AS price_min,
             |  round(max(l_extendedprice), 4) AS price_max,
             |  round(avg(l_extendedprice), 4) AS price_mean,
             |  strftime(min(l_shipdate), '%Y-%m-%d') AS ship_min,
             |  strftime(max(l_shipdate), '%Y-%m-%d') AS ship_max
             |FROM lineitem""".stripMargin),
      "single-pass column profiling (the data-quality summary a pipeline logs)"),

    // --------------------------------------------------- array/map/json surface
    "q53_array_funcs" -> Q(
      (s, dir) =>
        t(s, dir, "documents")
          .filter(col("doc_id") < 50)
          .withColumn("w", graft.functions.TextFunctions.tokens(col("text")))
          .select(
            col("doc_id"),
            size(col("w")).cast("bigint").as("n"),
            coalesce(array_min(col("w")), lit("")).as("first_alpha"),
            coalesce(array_max(col("w")), lit("")).as("last_alpha"),
            size(array_distinct(col("w"))).cast("bigint").as("n_distinct"),
            coalesce(element_at(col("w"), 1), lit("")).as("head"),
            r4(aggregate(col("w"), lit(0.0), (acc, x) => acc + length(x)).cast("double") /
              greatest(size(col("w")), lit(1))).as("mean_wordlen"))
          .orderBy(col("doc_id")),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0) AS w
             |  FROM documents WHERE doc_id < 50)
             |SELECT doc_id, CAST(len(w) AS BIGINT) AS n,
             |  coalesce(list_min(w), '') AS first_alpha,
             |  coalesce(list_max(w), '') AS last_alpha,
             |  CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
             |  coalesce(w[1], '') AS head,
             |  round(list_sum(list_transform(w, x -> len(x))) * 1.0 /
             |        greatest(len(w), 1), 4) AS mean_wordlen
             |FROM toks ORDER BY doc_id""".stripMargin),
      "array higher-order surface: min/max/distinct/element_at/aggregate"),

    // ------------------------- quality: referential-integrity audit
    "q217_referential_audit" -> Q(
      (s, dir) =>
        graft.operators.DataPrep.referentialAudit(Seq(
            ("customer_nation", t(s, dir, "customer"), "c_nationkey",
              t(s, dir, "nation"), "n_nationkey"),
            ("events_user_customer", Tables.events(s, dir), "user_id",
              t(s, dir, "customer"), "c_custkey"),
            ("events_user_supplier", Tables.events(s, dir), "user_id",
              t(s, dir, "supplier"), "s_suppkey"),
            ("lineitem_orders", t(s, dir, "lineitem"), "l_orderkey",
              t(s, dir, "orders"), "o_orderkey"),
            ("lineitem_part", t(s, dir, "lineitem"), "l_partkey",
              t(s, dir, "part"), "p_partkey"),
            ("orders_customer", t(s, dir, "orders"), "o_custkey",
              t(s, dir, "customer"), "c_custkey")))
          .orderBy(col("relation")),
      Some(Seq(
          ("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
          ("events_user_customer", "events", "user_id", "customer", "c_custkey"),
          ("events_user_supplier", "events", "user_id", "supplier", "s_suppkey"),
          ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
          ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
          ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"))
        .map { case (name, child, ck, parent, pk) =>
          s"""SELECT '$name' AS relation,
             |  CAST(count(*) AS BIGINT) AS child_rows,
             |  CAST(count(*) FILTER (WHERE k IS NULL) AS BIGINT) AS null_keys,
             |  CAST(count(DISTINCT k) AS BIGINT) AS distinct_keys,
             |  CAST(count(*) FILTER (WHERE k IS NOT NULL AND m IS NULL) AS BIGINT)
             |    AS orphan_rows,
             |  CAST(count(DISTINCT k) FILTER (WHERE m IS NULL) AS BIGINT) AS orphan_keys,
             |  CAST(CASE WHEN count(*) = count(*) FILTER (WHERE k IS NULL) THEN -1
             |    ELSE (1000000::HUGEINT * count(*) FILTER (WHERE k IS NOT NULL AND m IS NULL))
             |      // (count(*) - count(*) FILTER (WHERE k IS NULL)) END AS BIGINT)
             |    AS orphan_ppm,
             |  CAST((SELECT count(DISTINCT $pk) FROM $parent WHERE $pk IS NOT NULL)
             |    AS BIGINT) AS parent_keys,
             |  CAST((SELECT count(DISTINCT $pk) FROM $parent WHERE $pk IS NOT NULL)
             |    - count(DISTINCT k) FILTER (WHERE m IS NOT NULL) AS BIGINT)
             |    AS unref_parents
             |FROM (SELECT c.$ck AS k, p.m FROM $child c LEFT JOIN
             |  (SELECT DISTINCT $pk AS k2, 1 AS m FROM $parent WHERE $pk IS NOT NULL) p
             |  ON c.$ck = p.k2)""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY relation")),
      "referential-integrity audit over six declared child->parent key " +
        "relations (TPC-H FKs, events->customer, and a deliberately " +
        "mismatched events->supplier probe): NULL keys, orphan rows/keys " +
        "(what an inner join silently drops, exact ppm), and parent keys " +
        "never referenced — one marked left join + one aggregation per " +
        "relation, output |relations| rows"),

    // ------------------------------- quality: key-skew diagnostics
    "q219_key_skew" -> Q(
      (s, dir) =>
        graft.operators.Skew.keySkewReport(t(s, dir, "orders"), "o_custkey"),
      Some("""WITH counts AS (SELECT o_custkey AS k, count(*) AS c
             |  FROM orders GROUP BY 1),
             |cc AS (SELECT c, count(*) AS f FROM counts GROUP BY 1),
             |cum AS (SELECT c, f, sum(f) OVER (ORDER BY c
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_f
             |  FROM cc),
             |tot AS (SELECT COALESCE(sum(c * f), 0) AS n_rows,
             |    COALESCE(sum(f), 0) AS n_keys,
             |    COALESCE(max(c), 0) AS max_count FROM cc),
             |g AS (SELECT COALESCE(sum(c::HUGEINT * f * (2 * (cum_f - f) + f + 1)), 0)
             |    AS twos FROM cum),
             |p50 AS (SELECT COALESCE(min(c), -1) AS p50_count
             |  FROM cum CROSS JOIN tot WHERE cum_f >= (n_keys + 1) // 2),
             |p99 AS (SELECT COALESCE(min(c), -1) AS p99_count
             |  FROM cum CROSS JOIN tot WHERE cum_f >= (99 * n_keys + 99) // 100)
             |SELECT CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST(n_keys AS BIGINT) AS n_keys,
             |  CAST(max_count AS BIGINT) AS max_count,
             |  CAST(CASE WHEN n_keys = 0 THEN -1
             |    ELSE (1000000::HUGEINT * n_rows) // n_keys END AS BIGINT)
             |    AS mean_count_micro,
             |  CAST(p50_count AS BIGINT) AS p50_count,
             |  CAST(p99_count AS BIGINT) AS p99_count,
             |  CAST(CASE WHEN n_rows = 0 THEN -1
             |    ELSE (1000000::HUGEINT * max_count) // n_rows END AS BIGINT)
             |    AS top1_share_ppm,
             |  CAST(CASE WHEN n_rows = 0 THEN -1
             |    ELSE (1000000::HUGEINT * max_count * n_keys) // n_rows END AS BIGINT)
             |    AS skew_ratio_ppm,
             |  CAST(CASE WHEN n_keys = 0 OR n_rows = 0 THEN -1
             |    ELSE (1000000::HUGEINT *
             |      (twos - (n_keys + 1)::HUGEINT * n_rows))
             |      // (n_keys::HUGEINT * n_rows) END AS BIGINT) AS gini_ppm
             |FROM tot CROSS JOIN g CROSS JOIN p50 CROSS JOIN p99""".stripMargin),
      "key-skew diagnostics of orders.o_custkey (exact max/mean ratio, " +
        "p50/p99 percentile_disc counts, rank-form Gini in ppm) — the " +
        "salt-or-not report before a shuffle join; per-key counts collapse " +
        "to the count-of-counts histogram so every downstream pass is " +
        "resolution-bounded (ksFromCounts trick), cumulative via the " +
        "distributed offset prefix, no global window"),

    // ------------------------------- quality: data-contract audit
    "q221_constraint_audit" -> {
      // ONE predicate list drives both engines — the rules must parse
      // identically in Spark SQL and DuckDB (BETWEEN/IN/TIMESTAMP are)
      val rules = Seq(
        ("qty_range", "l_quantity BETWEEN 1 AND 50"),
        ("qty_cap40", "l_quantity <= 40"),
        ("discount_range", "l_discount BETWEEN 0.0 AND 0.1"),
        ("tax_cap", "l_tax <= 0.05"),
        ("flag_domain", "l_returnflag IN ('A', 'N', 'R')"),
        ("price_positive", "l_extendedprice > 0"),
        ("ship_cutoff", "l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'"))
      Q(
        (s, dir) =>
          graft.operators.DataPrep.constraintAudit(
              t(s, dir, "lineitem"), "l_orderkey", rules)
            .orderBy(col("rule")),
        Some(rules.map { case (name, pred) =>
          s"""SELECT '$name' AS rule, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(*) FILTER (WHERE NOT COALESCE(($pred), FALSE)) AS BIGINT)
             |    AS violations,
             |  CAST(CASE WHEN count(*) = 0 THEN -1
             |    ELSE (1000000::HUGEINT *
             |      count(*) FILTER (WHERE NOT COALESCE(($pred), FALSE)))
             |      // count(*) END AS BIGINT) AS violation_ppm,
             |  CAST(COALESCE(min(l_orderkey)
             |    FILTER (WHERE NOT COALESCE(($pred), FALSE)), -1) AS BIGINT)
             |    AS first_bad_key
             |FROM lineitem""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY rule")),
        "declarative data-contract audit over lineitem (Deequ/dbt-test " +
          "shape): seven promised predicates checked in ONE scan — all " +
          "violation counts and first-bad-key mins ride a single " +
          "aggregation, then a |rules|-row stack unpivot; NULL predicate = " +
          "violation, exact ppm, -1 sentinels; three rules genuinely fire " +
          "on the corpus (tax cap, quantity cap, ship cutoff)")
    },

    // ------------------------------- quality: Benford first-digit audit
    "q223_benford_audit" -> {
      // the nine expectations are Scala-computed integer literals shared
      // by both engines — no SQL ln anywhere
      val ben = (1 to 9).map(d => (d, graft.operators.DataPrep.benfordPpm(d)))
      Q(
        (s, dir) =>
          graft.operators.DataPrep.benfordAudit(
              t(s, dir, "lineitem"), "l_extendedprice")
            .orderBy(col("digit")),
        Some(s"""WITH v AS (SELECT CAST(round(l_extendedprice * 1e6) AS BIGINT) AS xm
               |  FROM lineitem),
               |p AS (SELECT CAST(substring(CAST(xm AS VARCHAR), 1, 1) AS INT) AS digit,
               |    count(*) AS c
               |  FROM v WHERE xm > 0 GROUP BY 1),
               |d(digit, benford_ppm) AS (VALUES
               |  ${ben.map { case (dd, e) => s"($dd, ${e}::BIGINT)" }.mkString(", ")}),
               |tot AS (SELECT COALESCE(sum(c), 0) AS n_used FROM p),
               |pd AS (SELECT d.digit, COALESCE(p.c, 0) AS cnt, n_used,
               |    CASE WHEN n_used = 0 THEN -1
               |      ELSE (1000000::HUGEINT * COALESCE(p.c, 0)) // n_used
               |      END AS observed_ppm,
               |    d.benford_ppm
               |  FROM d LEFT JOIN p ON p.digit = d.digit CROSS JOIN tot),
               |tv AS (SELECT CASE WHEN max(n_used) = 0 THEN -1
               |    ELSE sum(abs(observed_ppm - benford_ppm)) // 2 END AS tv_ppm
               |  FROM pd)
               |SELECT CAST(digit AS INT) AS digit, CAST(cnt AS BIGINT) AS cnt,
               |  CAST(n_used AS BIGINT) AS n_used,
               |  CAST(observed_ppm AS BIGINT) AS observed_ppm,
               |  CAST(benford_ppm AS BIGINT) AS benford_ppm,
               |  CAST(tv_ppm AS BIGINT) AS tv_ppm
               |FROM pd CROSS JOIN tv ORDER BY digit""".stripMargin),
        "Benford first-digit audit of lineitem extended prices: observed " +
          "vs expected leading-digit shares in exact ppm plus the " +
          "total-variation summary — the fabrication/truncation screen for " +
          "multi-magnitude measures; leading digit from the INTEGER micro " +
          "rendering (no float formatting), expectations as shared integer " +
          "literals, one 9-ary count as the only data-scaled pass")
    },

    // ------------------------ stats: weighted discrete quantiles
    "q230_weighted_quantiles" -> Q(
      (s, dir) =>
        graft.operators.DataPrep.weightedQuantiles(
            t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice",
            "l_quantity", qBps = Seq(2500, 5000, 7500, 9000))
          .orderBy(col("grp"), col("q_bps")),
      Some("""WITH vw AS (SELECT l_returnflag AS grp,
             |    CAST(round(l_extendedprice * 1e6) AS BIGINT) AS vm,
             |    sum(CAST(round(l_quantity * 1e6) AS BIGINT)) AS w
             |  FROM lineitem
             |  WHERE CAST(round(l_quantity * 1e6) AS BIGINT) > 0
             |  GROUP BY 1, 2),
             |c AS (SELECT grp, vm, w,
             |    sum(w) OVER (PARTITION BY grp ORDER BY vm
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             |    sum(w) OVER (PARTITION BY grp) AS tw
             |  FROM vw),
             |q(q_bps) AS (VALUES (2500), (5000), (7500), (9000))
             |SELECT grp, CAST(q_bps AS INT) AS q_bps,
             |  CAST(min(vm) AS BIGINT) AS wq_value_micro,
             |  CAST(max(tw) AS BIGINT) AS total_weight_micro
             |FROM c CROSS JOIN q
             |WHERE cw::HUGEINT * 10000 >= q_bps::HUGEINT * tw
             |GROUP BY grp, q_bps ORDER BY grp, q_bps""".stripMargin),
      "quantity-weighted price quantiles per return flag (p25/p50/p75/p90 " +
        "of the SHIPPED-VOLUME distribution, lower/disc convention so " +
        "results are actual corpus values; threshold by integer " +
        "cross-multiplication, no ceil, no division) — q81's " +
        "percentile_disc weight-generalized; (group, value) weight " +
        "aggregation then group-partitioned cumulative, no global window"),

    // ---------------------- profiling: Lorenz concentration curve
    "q236_lorenz_curve" -> Q(
      (s, dir) =>
        graft.operators.DataPrep.lorenzCurve(
            t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice",
            buckets = 10)
          .orderBy(col("grp"), col("decile")),
      Some("""WITH v AS (SELECT l_returnflag AS grp,
             |    CAST(round(l_extendedprice * 1e6) AS BIGINT) AS vm
             |  FROM lineitem
             |  WHERE CAST(round(l_extendedprice * 1e6) AS BIGINT) >= 0),
             |h AS (SELECT grp, vm, count(*) AS c FROM v GROUP BY 1, 2),
             |cum AS (SELECT grp, vm, c,
             |    sum(c) OVER (PARTITION BY grp ORDER BY vm
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
             |    sum(vm::HUGEINT * c) OVER (PARTITION BY grp ORDER BY vm
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
             |    sum(c) OVER (PARTITION BY grp) AS n,
             |    sum(vm::HUGEINT * c) OVER (PARTITION BY grp) AS tv
             |  FROM h),
             |d AS (SELECT range AS decile FROM range(1, 11)),
             |j AS (SELECT cum.*, d.decile, (d.decile * n) // 10 AS kd
             |  FROM cum CROSS JOIN d),
             |p AS (SELECT grp, decile, kd, n, tv, cc, vm, cs,
             |    row_number() OVER (PARTITION BY grp, decile ORDER BY cc)
             |      AS rn
             |  FROM j WHERE cc >= kd)
             |SELECT grp, CAST(decile AS INT) AS decile,
             |  CAST(kd AS BIGINT) AS k_rows, CAST(n AS BIGINT) AS n_rows,
             |  CAST(CASE WHEN tv = 0 THEN -1
             |    ELSE (1000000::HUGEINT * (cs - vm::HUGEINT * (cc - kd)))
             |      // tv END AS BIGINT) AS cum_share_ppm
             |FROM p WHERE rn = 1 ORDER BY grp, decile""".stripMargin),
      "Lorenz concentration curve of price per return flag: exact " +
        "cumulative value share of the bottom d/10 of rows (the " +
        "data-balance report whose area reads q219's Gini; decile 10 " +
        "pins 1e6 exactly); the bottom-k sum comes from the (group, " +
        "value) histogram in closed form — tied rows are " +
        "interchangeable, so no row-level tiebreak and NO row_number " +
        "over rows, every pass after the histogram aggregation is " +
        "value-resolution-bounded (q219/q230 pattern)"),

    // ---------------------- profiling: Hill tail-index estimator
    "q238_hill_tail" -> Q(
      (s, dir) =>
        graft.operators.DataPrep.hillTailIndex(
            t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice",
            k = 100)
          .orderBy(col("grp")),
      Some("""WITH v AS (SELECT l_returnflag AS grp,
             |    CAST(round(l_extendedprice * 1e6) AS BIGINT) AS vm
             |  FROM lineitem
             |  WHERE CAST(round(l_extendedprice * 1e6) AS BIGINT) > 0),
             |h AS (SELECT grp, vm, count(*) AS c FROM v GROUP BY 1, 2),
             |cum AS (SELECT grp, vm, c,
             |    sum(c) OVER (PARTITION BY grp ORDER BY vm DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
             |    sum(c) OVER (PARTITION BY grp) AS n
             |  FROM h),
             |thr AS (SELECT grp, vm AS thr FROM (
             |    SELECT grp, vm,
             |      row_number() OVER (PARTITION BY grp ORDER BY cc) AS rn
             |    FROM cum WHERE cc >= 101) WHERE rn = 1),
             |terms AS (SELECT cum.grp,
             |    sum(c * CAST(round(1e6 * ln(vm::DOUBLE / thr)) AS BIGINT))
             |      AS sum_ln
             |  FROM cum JOIN thr ON thr.grp = cum.grp AND cum.vm > thr.thr
             |  GROUP BY 1),
             |g AS (SELECT grp, sum(c) AS n_all FROM h GROUP BY 1)
             |SELECT g.grp, CAST(n_all AS BIGINT) AS n_pos,
             |  CAST(100 AS INT) AS k,
             |  CAST(COALESCE(thr.thr, -1) AS BIGINT) AS threshold_micro,
             |  CAST(COALESCE(terms.sum_ln, 0) AS BIGINT) AS sum_ln_micro,
             |  CAST(CASE WHEN thr.thr IS NULL OR COALESCE(terms.sum_ln, 0) = 0
             |    THEN -1
             |    ELSE (1000000::HUGEINT * 100 * 1000000) // terms.sum_ln
             |    END AS BIGINT) AS alpha_micro
             |FROM g LEFT JOIN thr ON thr.grp = g.grp
             |LEFT JOIN terms ON terms.grp = g.grp
             |ORDER BY 1""".stripMargin),
      "Hill tail-index of price per return flag (k = 100 upper order " +
        "statistics): how heavy is the tail — alpha near 1-2 warns a " +
        "single key class can dominate a shuffle, alpha > 3 reads " +
        "near-light; threshold-tied rows contribute exactly 0 so the " +
        "whole estimate rides the (group, value) histogram (q219/q236 " +
        "pattern, NO top-k sort), per-term micro-nat ln rounding " +
        "(q207 convention), one exact final division"),

    // ---------------------- profiling: trimmed mean
    "q239_trimmed_mean" -> Q(
      (s, dir) =>
        graft.operators.DataPrep.trimmedMeanBps(
            t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice",
            loBps = 500, hiBps = 9500)
          .orderBy(col("grp")),
      Some("""WITH h AS (SELECT l_returnflag AS grp,
             |    CAST(round(l_extendedprice * 1e6) AS BIGINT) AS vm,
             |    count(*) AS c
             |  FROM lineitem GROUP BY 1, 2),
             |cum AS (SELECT grp, vm, c,
             |    sum(c) OVER (PARTITION BY grp ORDER BY vm
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
             |    sum(vm::HUGEINT * c) OVER (PARTITION BY grp ORDER BY vm
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
             |    sum(c) OVER (PARTITION BY grp) AS n
             |  FROM h),
             |cuts(cut, bps) AS (VALUES ('lo', 500), ('hi', 9500)),
             |j AS (SELECT cum.*, cuts.cut, (cuts.bps * n) // 10000 AS kd
             |  FROM cum CROSS JOIN cuts),
             |p AS (SELECT grp, cut, kd, n,
             |    cs - vm::HUGEINT * (cc - kd) AS bsum,
             |    row_number() OVER (PARTITION BY grp, cut ORDER BY cc) AS rn
             |  FROM j WHERE cc >= kd),
             |a AS (SELECT grp, max(n) AS n_rows,
             |    max(CASE WHEN cut = 'lo' THEN kd END) AS k_lo,
             |    max(CASE WHEN cut = 'hi' THEN kd END) AS k_hi,
             |    max(CASE WHEN cut = 'lo' THEN bsum END) AS blo,
             |    max(CASE WHEN cut = 'hi' THEN bsum END) AS bhi
             |  FROM p WHERE rn = 1 GROUP BY 1)
             |SELECT grp, CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST(k_lo AS BIGINT) AS k_lo, CAST(k_hi AS BIGINT) AS k_hi,
             |  CAST(CASE WHEN k_hi = k_lo THEN -1
             |    ELSE (bhi - blo) // (k_hi - k_lo) END AS BIGINT)
             |    AS trimmed_mean_micro
             |FROM a ORDER BY grp""".stripMargin),
      "5/95 trimmed mean of price per return flag — the robust location " +
        "aggregate between median and mean; both rank cuts evaluate the " +
        "bottom-k closed form cs - vm*(cc - k) on the (group, value) " +
        "histogram (q236's block arithmetic — tied rows interchangeable, " +
        "no row-level tiebreak, no row_number over rows), so the whole " +
        "estimate is value-resolution-bounded after one aggregation"))
}

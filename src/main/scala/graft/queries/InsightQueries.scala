package graft.queries

import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.operators.{Associations, ChangeCapture, EventAnalytics, Graph, Similarity, Temporal}

/** Round-7 analytics queries (q106-q110): cohort retention, multi-touch
  * conversion attribution, degree-ordered triangle counting, robust
  * median/MAD outliers, and supervised nearest-centroid embedding
  * classification. Every emitted signal is an integer (days, basis
  * points, micros, exact ranks/counts) so both engines hash-match
  * bit-for-bit.
  */
object InsightQueries {

  private val dayUs = 86400000000L

  // DuckDB fold: first 8 md5 hex chars -> BIGINT (mirrors Spark's
  // conv(substring(md5(x), 1, 8), 16, 10); both < 2^32, exact)
  private def hex8(e: String): String =
    s"""list_reduce(list_transform(generate_series(1, 8),
       |      i -> strpos('0123456789abcdef', substring($e, i, 1)) - 1),
       |      (a, x) -> a * 16 + x)""".stripMargin

  val queries: Seq[(String, Q)] = Seq(

    // ------------------------------------------------------ cohort retention
    "q106_retention" -> Q(
      (s, dir) =>
        EventAnalytics.retentionCohorts(
            Tables.events(s, dir).withColumn("tsu", unix_micros(col("ts"))),
            "user_id", "tsu")
          .orderBy(col("cohort_day"), col("offset_days")),
      Some(s"""WITH a AS (
             |  SELECT DISTINCT user_id AS u,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // $dayUs AS day
             |  FROM events),
             |c AS (SELECT u, min(day) AS cohort_day FROM a GROUP BY u),
             |m AS (SELECT cohort_day, day - cohort_day AS offset_days,
             |    CAST(count(*) AS BIGINT) AS n_users
             |  FROM a JOIN c USING (u) GROUP BY 1, 2),
             |sz AS (SELECT cohort_day, n_users AS n_cohort FROM m WHERE offset_days = 0)
             |SELECT m.cohort_day, m.offset_days, m.n_users, sz.n_cohort,
             |  (10000 * m.n_users) // sz.n_cohort AS retention_bps
             |FROM m JOIN sz USING (cohort_day)
             |ORDER BY cohort_day, offset_days""".stripMargin),
      "cohort retention matrix: users cohorted by first active day (integer epoch-day), " +
        "per-(cohort, offset) distinct-user counts + basis-point retention"),

    // ------------------------------------------------ conversion attribution
    "q107_attribution" -> Q(
      (s, dir) =>
        EventAnalytics.attributeConversions(
            Tables.events(s, dir).withColumn("tsu", unix_micros(col("ts"))),
            "user_id", "event_type", "tsu", "event_id", "value",
            touchTypes = Seq("view", "click", "signup"), convType = "purchase",
            windowMicros = dayUs)
          .orderBy(col("channel")),
      Some(s"""WITH b AS (
             |  SELECT user_id AS u, event_type AS et,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, event_id AS id,
             |    CAST(round(value * 1e6) AS BIGINT) AS vm
             |  FROM events),
             |c AS (SELECT u, tsu AS ctsu, id AS cid, vm FROM b WHERE et = 'purchase'),
             |t AS (SELECT u, et AS channel, tsu AS ttsu, id AS tid FROM b
             |      WHERE et IN ('view', 'click', 'signup')),
             |p AS (SELECT c.cid, c.vm, t.channel, t.ttsu, t.tid
             |  FROM c LEFT JOIN t ON t.u = c.u
             |    AND t.ttsu <= c.ctsu AND t.ttsu >= c.ctsu - $dayUs),
             |r AS (SELECT *,
             |    row_number() OVER (PARTITION BY cid ORDER BY ttsu, tid) AS rn,
             |    count(tid) OVER (PARTITION BY cid) AS n
             |  FROM p),
             |cr AS (SELECT COALESCE(channel, 'direct') AS channel, tid, cid,
             |    CASE WHEN rn = 1 THEN vm ELSE 0 END AS first_c,
             |    CASE WHEN rn = n OR n = 0 THEN vm ELSE 0 END AS last_c,
             |    CASE WHEN n = 0 THEN vm
             |         ELSE vm // n + CASE WHEN rn = 1 THEN vm % n ELSE 0 END
             |    END AS linear_c,
             |    CASE WHEN n <= 1 THEN vm
             |         WHEN n = 2 THEN vm // 2 + CASE WHEN rn = 1 THEN vm % 2 ELSE 0 END
             |         WHEN rn = 1 OR rn = n THEN (vm * 4000) // 10000
             |         ELSE (vm - 2 * ((vm * 4000) // 10000)) // (n - 2)
             |            + CASE WHEN rn = 2
             |                   THEN (vm - 2 * ((vm * 4000) // 10000)) % (n - 2)
             |                   ELSE 0 END
             |    END AS pos_c
             |  FROM r)
             |SELECT channel, CAST(count(tid) AS BIGINT) AS touches,
             |  CAST(count(DISTINCT cid) AS BIGINT) AS conversions,
             |  CAST(sum(first_c) AS BIGINT) AS first_micro,
             |  CAST(sum(last_c) AS BIGINT) AS last_micro,
             |  CAST(sum(linear_c) AS BIGINT) AS linear_micro,
             |  CAST(sum(pos_c) AS BIGINT) AS position_micro
             |FROM cr GROUP BY channel ORDER BY channel""".stripMargin),
      "multi-touch attribution (first/last/linear/U-shaped-40-20-40 at once, 24h lookback, " +
        "remainder-exact integer splits, touchless conversions -> 'direct'): every model " +
        "conserves total conversion value to the micro"),

    // ------------------------------------------------------ triangle counting
    "q108_triangles" -> Q(
      (s, dir) => {
        val li = Tables.table(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct() // q129 rewrite: unique join rows ⇒ plain count below
        // co-purchase graph: parts sharing >= 2 distinct orders (the
        // support threshold keeps edge density at the association level,
        // not the random-co-occurrence level)
        val edges = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .groupBy(col("x.pk").as("pa"), col("y.pk").as("pb"))
          .agg(count(lit(1)).as("supp"))
          .filter(col("supp") >= 2)
        Graph.triangleCounts(edges, "pa", "pb").orderBy(col("node"))
      },
      Some("""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |e AS (SELECT x.pk AS a, y.pk AS b
             |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
             |  GROUP BY 1, 2 HAVING count(DISTINCT x.ok) >= 2),
             |tri AS (SELECT e1.a AS u, e1.b AS p, e2.b AS q
             |  FROM e e1 JOIN e e2 ON e2.a = e1.b
             |            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
             |nodes AS (SELECT u AS node FROM tri
             |          UNION ALL SELECT p FROM tri
             |          UNION ALL SELECT q FROM tri)
             |SELECT node, CAST(count(*) AS BIGINT) AS triangles
             |FROM nodes GROUP BY node ORDER BY node""".stripMargin),
      "per-node triangle counts on the co-purchase graph via degree-ordered wedge closure " +
        "(oracle enumerates a<b<c directly; the triangle set is orientation-invariant)"),

    // -------------------------------------------------- robust MAD outliers
    "q109_mad_outliers" -> Q(
      (s, dir) =>
        EventAnalytics.madOutliers(
            Tables.events(s, dir), "event_type", "value", "event_id", k = 3)
          .orderBy(col("id")),
      Some("""WITH e AS (
             |  SELECT event_id AS id, event_type AS grp,
             |    CAST(round(value * 1e6) AS BIGINT) AS xm
             |  FROM events),
             |w1 AS (SELECT *, count(*) OVER (PARTITION BY grp) AS n,
             |    row_number() OVER (PARTITION BY grp ORDER BY xm, id) AS rn FROM e),
             |w2 AS (SELECT *, min(CASE WHEN 2 * rn >= n THEN xm END)
             |    OVER (PARTITION BY grp) AS med FROM w1),
             |w3 AS (SELECT *, abs(xm - med) AS adm FROM w2),
             |w4 AS (SELECT *,
             |    row_number() OVER (PARTITION BY grp ORDER BY adm, id) AS rn2 FROM w3),
             |w5 AS (SELECT *, min(CASE WHEN 2 * rn2 >= n THEN adm END)
             |    OVER (PARTITION BY grp) AS mad FROM w4)
             |SELECT id, grp, xm AS value_micro, med AS med_micro, mad AS mad_micro,
             |  CAST(10000 * adm > 44478 * mad AS BIGINT) AS is_outlier
             |FROM w5 ORDER BY id""".stripMargin),
      "median/MAD robust outlier flags: rank-based medians (q81 convention) and the " +
        "1.4826 consistency constant as the exact rational 14826/10000 — all BIGINT"),

    // --------------------------------------- nearest-centroid classification
    "q110_centroid_classify" -> Q(
      (s, dir) =>
        Similarity.nearestCentroidClassify(
            Tables.table(s, dir, "embeddings"), "embedding", "vec_id", "label",
            trainBps = 8000)
          .orderBy(col("vec_id")),
      // 8000 bps -> md5-prefix cut 0xcccc (52428 = 8000 * 65536 / 10000)
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
             |scored AS (SELECT sp.vec_id, sp.label, sp.tr, c.clab,
             |    list_sum(list_transform(generate_series(1, 64),
             |      d -> (sp.vq[d] - c.c[d]) * (sp.vq[d] - c.c[d]))) AS dist,
             |    row_number() OVER (PARTITION BY sp.vec_id ORDER BY
             |      list_sum(list_transform(generate_series(1, 64),
             |        d -> (sp.vq[d] - c.c[d]) * (sp.vq[d] - c.c[d]))), c.clab) AS rn
             |  FROM sp CROSS JOIN c)
             |SELECT vec_id, label, CAST(tr AS BIGINT) AS in_train, clab AS predicted,
             |  CAST(dist AS BIGINT) AS sq_dist_micro2,
             |  CAST(clab = label AS BIGINT) AS correct
             |FROM scored WHERE rn = 1 ORDER BY vec_id""".stripMargin),
      "supervised nearest-centroid (Rocchio) classifier: md5-gated 80/20 split, integer " +
        "floorDiv centroids (bounded driver state, broadcast as literals), exact integer " +
        "argmin assignment — predict side is a shuffle-free map-only scan"),

    // ------------------------------------------------- association rules
    "q111_basket_rules" -> Q(
      (s, dir) =>
        Associations.pairRules(
            Tables.table(s, dir, "lineitem"), "l_orderkey", "l_partkey",
            minPairSupport = 2L)
          .orderBy(col("ante"), col("cons")),
      Some("""WITH bi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
             |nb AS (SELECT count(DISTINCT bk) AS n_baskets FROM bi),
             |ic AS (SELECT it, CAST(count(*) AS BIGINT) AS n_item FROM bi GROUP BY it),
             |pc AS (SELECT x.it AS ia, y.it AS ib, CAST(count(*) AS BIGINT) AS n_ab
             |  FROM bi x JOIN bi y ON x.bk = y.bk AND x.it < y.it
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |d AS (SELECT ia AS ante, ib AS cons, n_ab FROM pc
             |      UNION ALL SELECT ib, ia, n_ab FROM pc)
             |SELECT d.ante, d.cons, d.n_ab, a.n_item AS n_a, b.n_item AS n_b,
             |  nb.n_baskets,
             |  (1000000 * d.n_ab) // a.n_item AS confidence_ppm,
             |  (1000000 * nb.n_baskets * d.n_ab) // (a.n_item * b.n_item) AS lift_ppm
             |FROM d JOIN ic a ON a.it = d.ante
             |       JOIN ic b ON b.it = d.cons
             |       CROSS JOIN nb
             |ORDER BY ante, cons""".stripMargin),
      "pairwise association rules (Apriori 2-itemsets) over order baskets: support, " +
        "confidence and lift as exact integer ppm; pair fan-out bounded by basket size"),

    // --------------------------------------------- seasonal robust anomaly
    "q112_seasonal_anomaly" -> Q(
      (s, dir) =>
        EventAnalytics.madOutliersBy(
            Tables.events(s, dir)
              .withColumn("tsu", unix_micros(col("ts")))
              .withColumn("hour", expr("(tsu DIV 3600000000) % 24"))
              .withColumnRenamed("event_type", "etype"),
            Seq("etype", "hour"), "value", "event_id", k = 3)
          .orderBy(col("id")),
      Some("""WITH e AS (
             |  SELECT event_id AS id, event_type AS etype,
             |    (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS hour,
             |    CAST(round(value * 1e6) AS BIGINT) AS xm
             |  FROM events),
             |w1 AS (SELECT *, count(*) OVER (PARTITION BY etype, hour) AS n,
             |    row_number() OVER (PARTITION BY etype, hour ORDER BY xm, id) AS rn FROM e),
             |w2 AS (SELECT *, min(CASE WHEN 2 * rn >= n THEN xm END)
             |    OVER (PARTITION BY etype, hour) AS med FROM w1),
             |w3 AS (SELECT *, abs(xm - med) AS adm FROM w2),
             |w4 AS (SELECT *,
             |    row_number() OVER (PARTITION BY etype, hour ORDER BY adm, id) AS rn2 FROM w3),
             |w5 AS (SELECT *, min(CASE WHEN 2 * rn2 >= n THEN adm END)
             |    OVER (PARTITION BY etype, hour) AS mad FROM w4)
             |SELECT id, etype, hour, xm AS value_micro, med AS med_micro, mad AS mad_micro,
             |  CAST(10000 * adm > 44478 * mad AS BIGINT) AS is_outlier
             |FROM w5 ORDER BY id""".stripMargin),
      "seasonal robust anomaly: per-(type, hour-of-day) median/MAD baseline — the " +
        "multi-key MAD gate; a diurnal traffic pattern stops masking true anomalies"),

    // ------------------------------------------------- transition matrix
    "q113_transitions" -> Q(
      (s, dir) =>
        EventAnalytics.transitionMatrix(
            Tables.events(s, dir).withColumn("tsu", unix_micros(col("ts"))),
            "user_id", "event_type", "tsu", "event_id")
          .orderBy(col("from_type"), col("to_type")),
      Some("""WITH e AS (
             |  SELECT user_id AS u, event_type AS et,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, event_id AS id
             |  FROM events),
             |lagged AS (SELECT et AS to_type,
             |    lag(et) OVER (PARTITION BY u ORDER BY tsu, id) AS from_type
             |  FROM e),
             |p AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
             |  FROM lagged WHERE from_type IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM p GROUP BY 1)
             |SELECT p.from_type, p.to_type, p.n, t.n_from,
             |  (1000000 * p.n) // t.n_from AS ppm
             |FROM p JOIN t USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin),
      "first-order Markov transition matrix over per-user event sequences: counts + " +
        "row-stochastic ppm (floor, rows sum <= 1e6); one user-keyed shuffle, tiny agg"),

    // --------------------------------------- principal-axis projection (PCA)
    "q114_principal_axis" -> Q(
      (s, dir) =>
        Similarity.principalAxisProjection(
            Tables.table(s, dir, "embeddings"), "embedding", "vec_id", iters = 3)
          .orderBy(col("vec_id")),
      // the oracle replays all three stages exactly: HUGEINT Gram matrix,
      // 3 unrolled power-iteration rounds (sign fixed at the smallest
      // index attaining max|w|; truncating `//` == BigInt `/`), then the
      // integer projection
      Some {
        def iter(k: Int): String =
          s"""w$k AS (SELECT g.d1 AS d, sum(g.g * v.v) AS w
             |  FROM g JOIN v${k - 1} v ON v.d = g.d2 GROUP BY 1),
             |m$k AS (SELECT max(abs(w)) AS m FROM w$k),
             |s$k AS (SELECT CASE WHEN min_by(w, d) < 0 THEN -1 ELSE 1 END AS s
             |  FROM w$k, m$k WHERE abs(w) = m),
             |v$k AS (SELECT d, (w * s * 1000000) // m AS v FROM w$k, m$k, s$k)""".stripMargin
        s"""WITH e AS (SELECT vec_id,
           |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS vq
           |  FROM embeddings),
           |g AS (SELECT d1.d AS d1, d2.d AS d2,
           |    sum(CAST(vq[d1.d] AS HUGEINT) * vq[d2.d]) AS g
           |  FROM e CROSS JOIN generate_series(1, 64) d1(d)
           |         CROSS JOIN generate_series(1, 64) d2(d)
           |  GROUP BY 1, 2),
           |v0 AS (SELECT d, CAST(1000000 AS HUGEINT) AS v FROM generate_series(1, 64) t(d)),
           |${iter(1)},
           |${iter(2)},
           |${iter(3)}
           |SELECT e.vec_id, CAST(sum(CAST(vq[v3.d] AS HUGEINT) * v3.v) AS BIGINT) AS proj_micro2
           |FROM e CROSS JOIN v3 GROUP BY e.vec_id ORDER BY vec_id""".stripMargin
      },
      "top-principal-axis projection in exact integer fixed point: one-scan HUGEINT Gram " +
        "matrix, 3 sign-fixed power-iteration rounds (bounded driver state), shuffle-free " +
        "projection scan — the whitening / dominant-direction curation signal"),

    // ------------------------------------------------------------ k-core
    "q115_kcore" -> Q(
      (s, dir) => {
        // distinct (ok, pk) FIRST (the q129 rewrite): each (pa, pb, ok)
        // join row is then unique by construction, so the support count
        // is a plain count — the count_distinct expansion over the pair
        // fan-out drops away, and the self-join input shrinks
        val li = Tables.table(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val edges = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .groupBy(col("x.pk").as("pa"), col("y.pk").as("pb"))
          .agg(count(lit(1)).as("supp"))
          .filter(col("supp") >= 2)
        Graph.kCore(edges, "pa", "pb", k = 2, maxRounds = 6).orderBy(col("node"))
      },
      // peeling is monotone, so the oracle's 6 flat rounds equal the
      // operator's early-stopped loop whenever the graph stabilizes
      // inside the budget (measured: 3 rounds at sf0.01, 5 at sf0.1)
      Some {
        // MATERIALIZED: each round references its predecessor 3x; inlined
        // CTEs would re-expand the base join 3^6 times (and exhaust fds)
        def peel(r: Int): String =
          s"""k$r AS MATERIALIZED (SELECT node FROM
             |  (SELECT a AS node FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1})
             |  GROUP BY node HAVING count(*) >= 2),
             |e$r AS MATERIALIZED (SELECT a, b FROM e${r - 1}
             |  WHERE a IN (SELECT node FROM k$r) AND b IN (SELECT node FROM k$r))""".stripMargin
        s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           |e0 AS MATERIALIZED (SELECT x.pk AS a, y.pk AS b
           |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
           |  GROUP BY 1, 2 HAVING count(DISTINCT x.ok) >= 2),
           |${(1 to 6).map(peel).mkString(",\n")}
           |SELECT node, CAST(count(*) AS BIGINT) AS deg
           |FROM (SELECT a AS node FROM e6 UNION ALL SELECT b FROM e6)
           |GROUP BY node ORDER BY node""".stripMargin
      },
      "2-core of the co-purchase graph: iterative degree peel (monotone, early-stop == " +
        "fixed-round replay), per-round semi-join edge filter + re-checkpoint — the " +
        "dense-subgraph spam/bot-ring filter"),

    // ------------------------------------------- Holt level+trend smoothing
    "q116_holt_trend" -> Q(
      (s, dir) => {
        val holt = graft.functions.HoltFunctions.holtUdaf(300000L, 100000L)
        Tables.events(s, dir)
          .withColumn("day", date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
          .withColumn("tsl", unix_micros(col("ts")))
          .groupBy(col("event_type"), col("day"))
          .agg(holt(col("tsl"), col("event_id"), col("value")).as("h"),
            count(lit(1)).as("n"))
          .select(col("event_type"), col("day"),
            col("h.level_micro").as("level_micro"),
            col("h.trend_micro").as("trend_micro"),
            col("h.forecast_micro").as("forecast_micro"), col("n"))
          .orderBy(col("event_type"), col("day"))
      },
      // the oracle replays the integer fold with a recursive CTE: one
      // recursion level per in-group position, all groups advancing in
      // lockstep; `//` truncation == the aggregator's Long division
      Some("""WITH RECURSIVE ord AS (
             |  SELECT event_type AS et,
             |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |    CAST(round(value * 1e6) AS BIGINT) AS xm,
             |    row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
             |      ORDER BY ts, event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type, date_trunc('day', ts)) AS n
             |  FROM events),
             |f AS (
             |  SELECT et, day, 0 AS rn, CAST(0 AS BIGINT) AS l,
             |    CAST(0 AS BIGINT) AS b, max(n) AS n
             |  FROM ord GROUP BY et, day
             |  UNION ALL
             |  SELECT f.et, f.day, f.rn + 1,
             |    (300000 * o.xm + 700000 * (f.l + f.b)) // 1000000,
             |    (100000 * ((300000 * o.xm + 700000 * (f.l + f.b)) // 1000000 - f.l)
             |      + 900000 * f.b) // 1000000,
             |    f.n
             |  FROM f JOIN ord o ON o.et = f.et AND o.day = f.day AND o.rn = f.rn + 1)
             |SELECT et AS event_type, day, l AS level_micro, b AS trend_micro,
             |  l + b AS forecast_micro, n
             |FROM f WHERE rn = n ORDER BY event_type, day""".stripMargin),
      "Holt double-exponential level+trend smoothing per (type, day) in exact integer " +
        "fixed point (alpha=0.3, beta=0.1 ppm): zero-seeded ordered fold, typed Aggregator " +
        "with concat-merge buffers — the trending extension of the reference's EWMA"),

    // ------------------------------------------- point-in-time feature join
    "q117_pit_join" -> Q(
      (s, dir) => {
        val o = Tables.table(s, dir, "orders")
        // balance history: latest order per (custkey, day) keeps
        // (key, valid_from) unique — the SCD2 invariant the PIT join needs
        val hist = o.select(col("o_custkey").as("k"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("vf"),
            col("o_totalprice"), col("o_orderkey"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("k"), col("vf")).orderBy(col("o_orderkey").desc)))
          .filter(col("rn") === 1)
          .select(col("k"), col("vf"),
            round(col("o_totalprice") * lit(100)).cast("bigint").as("bal_cents"))
        val probe = Tables.table(s, dir, "lineitem")
          .join(o.select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("lo"),
            col("l_linenumber").cast("bigint").as("ln"),
            col("o_custkey").as("k"),
            unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
        ChangeCapture.pointInTimeJoin(probe, hist, "k", "ship_us", "vf", Seq("bal_cents"))
          .orderBy(col("lo"), col("ln"))
      },
      // oracle uses the same union trick (portable semantics): version
      // rows sort before same-instant probes, last_value IGNORE NULLS
      // carries the attribute; probe-order ties are harmless (all NULL)
      Some("""WITH h0 AS (
             |  SELECT o_custkey AS k, epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS vf,
             |    o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey, o_orderdate
             |      ORDER BY o_orderkey DESC) AS rn
             |  FROM orders),
             |h AS (SELECT k, vf, CAST(round(o_totalprice * 100) AS BIGINT) AS bal
             |      FROM h0 WHERE rn = 1),
             |p AS (SELECT l.l_orderkey AS lo, CAST(l.l_linenumber AS BIGINT) AS ln,
             |    o.o_custkey AS k, epoch_us(CAST(l.l_shipdate AS TIMESTAMP)) AS ts
             |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
             |u AS (SELECT k, vf AS ts, 0 AS kind, bal,
             |        NULL::BIGINT AS lo, NULL::BIGINT AS ln FROM h
             |      UNION ALL
             |      SELECT k, ts, 1, NULL, lo, ln FROM p),
             |w AS (SELECT *, last_value(bal IGNORE NULLS) OVER (
             |    PARTITION BY k ORDER BY ts, kind
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur
             |  FROM u)
             |SELECT lo, ln, k, ts AS ship_us, cur AS bal_cents
             |FROM w WHERE kind = 1 ORDER BY lo, ln""".stripMargin),
      "point-in-time feature join (feature-store backdating): each lineitem picks up the " +
        "customer's balance as KNOWN at ship time via the union/last-ignore-nulls trick — " +
        "one shuffle, no quadratic probe x version theta join, no future leakage"),

    // --------------------------------------------------- rank normalization
    "q118_rank_normalize" -> Q(
      (s, dir) =>
        graft.operators.DataPrep.rankNormalize(
            Tables.events(s, dir), "event_type", "value", "event_id")
          .orderBy(col("id")),
      Some("""WITH e AS (
             |  SELECT event_id AS id, event_type AS grp,
             |    CAST(round(value * 1e6) AS BIGINT) AS xm
             |  FROM events),
             |w AS (SELECT *, count(*) OVER (PARTITION BY grp) AS n,
             |    row_number() OVER (PARTITION BY grp ORDER BY xm, id) AS rn FROM e)
             |SELECT id, grp, xm AS value_micro,
             |  CASE WHEN n = 1 THEN CAST(0 AS BIGINT)
             |       ELSE (10000 * (rn - 1)) // (n - 1) END AS pct_bps
             |FROM w ORDER BY id""".stripMargin),
      "quantile (rank) normalization per type: value -> within-group percentile bps over " +
        "the deterministic (value, id) rank — the distribution-free feature transform"),

    // --------------------------------------------------------- trimmed mean
    "q119_trimmed_mean" -> Q(
      (s, dir) =>
        graft.operators.DataPrep.trimmedMean(
            Tables.events(s, dir), "event_type", "value", "event_id")
          .orderBy(col("grp")),
      Some("""WITH e AS (
             |  SELECT event_id AS id, event_type AS grp,
             |    CAST(round(value * 1e6) AS BIGINT) AS xm
             |  FROM events),
             |w AS (SELECT *, count(*) OVER (PARTITION BY grp) AS n,
             |    row_number() OVER (PARTITION BY grp ORDER BY xm, id) AS rn FROM e),
             |t AS (SELECT * FROM w WHERE 20 * rn > n AND 20 * rn <= 19 * n)
             |SELECT grp, CAST(count(*) AS BIGINT) AS n_kept,
             |  CAST(sum(xm) AS BIGINT) AS sum_micro,
             |  CAST(sum(xm) AS BIGINT) // count(*) AS trimmed_mean_micro
             |FROM t GROUP BY grp ORDER BY grp""".stripMargin),
      "5%-trimmed mean per type with an exact rational rank rule (20rn > n, 20rn <= 19n) " +
        "— robust location where a plain mean is dragged by the tail; one exchange total"),

    // ------------------------------------------------- k-anonymity ladder
    "q120_k_anonymize" -> Q(
      (s, dir) =>
        graft.operators.Privacy.kAnonymize(
            Tables.events(s, dir)
              .withColumn("tsu", unix_micros(col("ts")))
              .withColumn("hour", expr("(tsu DIV 3600000000) % 24"))
              .withColumn("a0", col("user_id"))
              .withColumn("b0", col("hour"))
              .withColumn("a1", expr("user_id DIV 100"))
              .withColumn("b1", expr("hour DIV 6")),
            "event_id", Seq(Seq("a0", "b0"), Seq("a1", "b1")), k = 5L)
          .orderBy(col("id")),
      Some("""WITH e AS (
             |  SELECT event_id AS id,
             |    CAST(user_id AS VARCHAR) AS a0,
             |    CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS VARCHAR) AS b0,
             |    CAST(user_id // 100 AS VARCHAR) AS a1,
             |    CAST(((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24) // 6 AS VARCHAR) AS b1
             |  FROM events),
             |c0 AS (SELECT a0, b0, count(*) AS n FROM e GROUP BY 1, 2),
             |l0 AS (SELECT e.id, CAST(0 AS BIGINT) AS level, e.a0 AS g1, e.b0 AS g2
             |       FROM e JOIN c0 USING (a0, b0) WHERE c0.n >= 5),
             |r1 AS (SELECT e.* FROM e JOIN c0 USING (a0, b0) WHERE c0.n < 5),
             |c1 AS (SELECT a1, b1, count(*) AS n FROM r1 GROUP BY 1, 2),
             |l1 AS (SELECT r1.id, CAST(1 AS BIGINT) AS level, r1.a1 AS g1, r1.b1 AS g2
             |       FROM r1 JOIN c1 USING (a1, b1) WHERE c1.n >= 5),
             |l2 AS (SELECT r1.id, CAST(2 AS BIGINT) AS level, '*' AS g1, '*' AS g2
             |       FROM r1 JOIN c1 USING (a1, b1) WHERE c1.n < 5)
             |SELECT id, level, g1, g2 FROM l0
             |UNION ALL SELECT id, level, g1, g2 FROM l1
             |UNION ALL SELECT id, level, g1, g2 FROM l2
             |ORDER BY id""".stripMargin),
      "cascading k-anonymity (k=5) over the (user, hour) quasi-identifier: exact pairs " +
        "that would single out < 5 rows coarsen to (user-block, day-part), residual " +
        "singletons suppress — every published class holds >= k rows"),

    // --------------------------------------------------- l-diversity audit
    "q121_l_diversity" -> Q(
      (s, dir) =>
        graft.operators.Privacy.lDiversityAudit(
            Tables.events(s, dir)
              .withColumn("tsu", unix_micros(col("ts")))
              .withColumn("ublock", expr("user_id DIV 100"))
              .withColumn("daypart", expr("((tsu DIV 3600000000) % 24) DIV 6")),
            Seq("ublock", "daypart"), "event_type", l = 3L)
          .orderBy(col("ublock"), col("daypart")),
      Some("""WITH e AS (
             |  SELECT user_id // 100 AS ublock,
             |    ((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24) // 6 AS daypart,
             |    event_type
             |  FROM events)
             |SELECT ublock, daypart, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_sensitive,
             |  CAST(count(DISTINCT event_type) >= 3 AS BIGINT) AS diverse
             |FROM e GROUP BY 1, 2 ORDER BY ublock, daypart""".stripMargin),
      "distinct-l-diversity audit (l=3) per generalized quasi class: the attribute-" +
        "disclosure gate applied after k-anonymity — one shuffle, class-bounded output"),

    // ---------------------------------------------------- t-closeness
    "q191_t_closeness" -> Q(
      (s, dir) =>
        graft.operators.Privacy.tClosenessAudit(
            Tables.events(s, dir)
              .withColumn("tsu", unix_micros(col("ts")))
              .withColumn("ublock", expr("user_id DIV 100"))
              .withColumn("daypart", expr("((tsu DIV 3600000000) % 24) DIV 6")),
            Seq("ublock", "daypart"), "event_type", tPpm = 200000L)
          .orderBy(col("ublock"), col("daypart")),
      Some("""WITH e AS (
             |  SELECT user_id // 100 AS ublock,
             |    ((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24) // 6 AS daypart,
             |    event_type AS v
             |  FROM events),
             |cells AS (SELECT ublock, daypart, v, count(*) AS n_cv
             |  FROM e GROUP BY 1, 2, 3),
             |gv AS (SELECT v, count(*) AS n_v FROM e GROUP BY 1),
             |tot AS (SELECT count(*) AS n FROM e),
             |nc AS (SELECT ublock, daypart, sum(n_cv) AS n_c
             |  FROM cells GROUP BY 1, 2),
             |j AS (SELECT cells.ublock, cells.daypart,
             |    abs(n_cv::HUGEINT * n - n_v::HUGEINT * n_c) AS dv, n_v, n_c, n
             |  FROM cells JOIN gv USING (v)
             |  JOIN nc ON nc.ublock = cells.ublock AND nc.daypart = cells.daypart
             |  CROSS JOIN tot),
             |a AS (SELECT ublock, daypart, max(n_c) AS n_rows, max(n) AS n,
             |    sum(dv) AS present, sum(n_v) AS covered
             |  FROM j GROUP BY 1, 2),
             |f AS (SELECT *, present + (n::HUGEINT - covered) * n_rows AS num FROM a)
             |SELECT ublock, daypart, CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST((1000000::HUGEINT * num) // (2::HUGEINT * n_rows * n) AS BIGINT) AS tv_ppm,
             |  CAST(CASE WHEN num * 1000000 <= 200000::HUGEINT * 2 * n_rows * n
             |    THEN 1 ELSE 0 END AS BIGINT) AS close
             |FROM f ORDER BY ublock, daypart""".stripMargin),
      "t-closeness audit (t=0.2) per generalized quasi class: exact-integer TV " +
        "between the class's sensitive distribution and the global one (q159 " +
        "closure trick — no classes x values grid), exact clear-denominator " +
        "threshold gate — the skewness-disclosure rung after k-anonymity and " +
        "l-diversity"),

    // -------------------------------------------------- sessionized funnel
    "q122_session_funnel" -> Q(
      (s, dir) => {
        // operator COMPOSITION: gap-sessionize tags every event with its
        // session, then the ordered funnel runs per (user, session) via a
        // composite key — conversion measured within a visit, the way
        // product analytics actually reports it. Both shuffles key on
        // user-derived keys; the join is id-equi.
        val ev = Tables.events(s, dir).withColumn("tsu", unix_micros(col("ts")))
        val sess = EventAnalytics.sessionize(
          ev, "user_id", "tsu", "event_id", gapMicros = 6L * 3600L * 1000000L)
        val tagged = ev.select(col("event_id").as("id"), col("event_type"))
          .join(sess, Seq("id"))
          .withColumn("skey", concat(col("user"), lit("#"), col("session_idx")))
        EventAnalytics.funnel(tagged, "skey", "event_type", "tsu",
            Seq("view", "click", "purchase"), windowMicros = 86400L * 1000000L)
          .withColumn("u", split(col("user"), "#").getItem(0).cast("bigint"))
          .withColumn("session", split(col("user"), "#").getItem(1).cast("bigint"))
          .select(col("u").as("user_id"), col("session"), col("t0_us"),
            // -1 sentinel (not NULL) for unreached steps: keeps the row bytes
            // canonicalization-proof across engines, mirroring q51/q100's gate
            // pattern — the oracle SQL COALESCEs identically.
            coalesce(col("t1_us"), lit(-1L)).as("t1_us"),
            coalesce(col("t2_us"), lit(-1L)).as("t2_us"),
            col("n_steps"), col("converted"),
            coalesce(col("dwell_us"), lit(-1L)).as("dwell_us"))
          .orderBy(col("user_id"), col("session"))
      },
      Some("""WITH e AS (
             |  SELECT event_id AS id, user_id AS u, event_type AS et,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu
             |  FROM events),
             |m AS (SELECT *, CASE WHEN lag(tsu) OVER w IS NULL
             |      OR tsu - lag(tsu) OVER w > 21600000000 THEN 1 ELSE 0 END AS ns
             |  FROM e WINDOW w AS (PARTITION BY u ORDER BY tsu, id)),
             |sx AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY u ORDER BY tsu, id
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM m),
             |s0 AS (SELECT u, sid, min(tsu) AS t0 FROM sx WHERE et = 'view' GROUP BY u, sid),
             |s1 AS (SELECT x.u, x.sid, min(tsu) AS t1 FROM sx x JOIN s0 USING (u, sid)
             |       WHERE et = 'click' AND tsu >= t0 AND tsu <= t0 + 86400000000
             |       GROUP BY x.u, x.sid),
             |s2 AS (SELECT x.u, x.sid, min(tsu) AS t2
             |       FROM sx x JOIN s0 USING (u, sid) JOIN s1 USING (u, sid)
             |       WHERE et = 'purchase' AND tsu >= t1 AND tsu <= t0 + 86400000000
             |       GROUP BY x.u, x.sid)
             |SELECT s0.u AS user_id, s0.sid AS session, t0 AS t0_us,
             |  COALESCE(t1, -1) AS t1_us,
             |  COALESCE(t2, -1) AS t2_us,
             |  CAST(CASE WHEN t2 IS NOT NULL THEN 3
             |            WHEN t1 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS n_steps,
             |  CAST(t2 IS NOT NULL AS BIGINT) AS converted,
             |  COALESCE(CASE WHEN t2 IS NOT NULL THEN t2 - t0 END, -1) AS dwell_us
             |FROM s0 LEFT JOIN s1 USING (u, sid) LEFT JOIN s2 USING (u, sid)
             |ORDER BY user_id, session""".stripMargin),
      "sessionized funnel: gap-based session ids (6h) composed with the ordered funnel " +
        "per (user, session) — within-visit conversion, the product-analytics report shape"),

    // --------------------------------------- inter-arrival burstiness
    "q190_burstiness" -> Q(
      (s, dir) =>
        graft.operators.EventAnalytics.interArrivalStats(
            Tables.events(s, dir), "user_id", "ts", "event_id")
          .orderBy(col("u")),
      Some("""WITH e AS (SELECT CAST(user_id AS BIGINT) AS u,
             |    epoch_us(ts) AS tsu, event_id AS id FROM events),
             |g AS (SELECT u, tsu - lag(tsu) OVER
             |    (PARTITION BY u ORDER BY tsu, id) AS d FROM e),
             |a AS (SELECT u, CAST(count(*) AS BIGINT) AS n_gaps,
             |    sum(d::HUGEINT) AS sd, sum(d::HUGEINT * d) AS sdd
             |  FROM g WHERE d IS NOT NULL GROUP BY 1)
             |SELECT u, n_gaps, CAST(sd // n_gaps AS BIGINT) AS mean_gap_us,
             |  CAST(CASE WHEN sd = 0 THEN -1
             |    ELSE (1000000::HUGEINT * (n_gaps * sdd - sd * sd)) // (sd * sd)
             |    END AS BIGINT) AS cv2_ppm
             |FROM a ORDER BY u""".stripMargin),
      "per-user inter-arrival burstiness: mean gap + squared coefficient of " +
        "variation of consecutive event gaps (exact integers; Poisson ~ 1e6, " +
        "metronomic bot << 1e6, bursty scraper >> 1e6) — the bot screen before " +
        "user events feed training; one user-keyed lag window + one reduce"),

    // ------------------------------------------ Kaplan-Meier survival
    "q201_kaplan_meier" -> Q(
      (s, dir) =>
        graft.operators.EventAnalytics.kaplanMeier(
            Tables.events(s, dir), "user_id", "ts", "event_type",
            entryType = "view", eventType = "purchase",
            bucketMicros = 3600000000L)
          .orderBy(col("t")),
      Some("""WITH b AS (SELECT CAST(user_id AS BIGINT) AS u,
             |    epoch_us(ts) AS tsu, event_type AS et FROM events),
             |en AS (SELECT u, min(tsu) AS t0 FROM b WHERE et = 'view' GROUP BY 1),
             |ev AS (SELECT b.u, min(tsu) AS t1 FROM b JOIN en ON en.u = b.u
             |       WHERE et = 'purchase' AND tsu >= t0 GROUP BY 1),
             |cz AS (SELECT max(tsu) AS tmax FROM b),
             |dd AS (SELECT en.u, (COALESCE(t1, tmax) - t0) // 3600000000 AS t,
             |    CASE WHEN t1 IS NULL THEN 0 ELSE 1 END AS observed
             |  FROM en LEFT JOIN ev ON ev.u = en.u CROSS JOIN cz),
             |p AS (SELECT t, count(*) AS cnt, sum(observed) AS nd FROM dd GROUP BY 1),
             |w AS (SELECT *, sum(cnt) OVER () AS total,
             |    sum(cnt) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevc
             |  FROM p),
             |st AS (SELECT *, total - COALESCE(prevc, 0) AS n_risk,
             |    CASE WHEN nd = 0 THEN 0
             |         WHEN total - COALESCE(prevc, 0) = nd THEN -46000000
             |         ELSE CAST(round(ln(CAST(total - COALESCE(prevc, 0) - nd AS DOUBLE)
             |           / (total - COALESCE(prevc, 0))) * 1e6) AS BIGINT) END AS step
             |  FROM w),
             |c AS (SELECT *, sum(step) OVER (ORDER BY t) AS lnsurv FROM st)
             |SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
             |  CAST(nd AS BIGINT) AS n_events,
             |  CAST(lnsurv AS BIGINT) AS ln_surv_micro,
             |  CAST(round(exp(CAST(lnsurv AS DOUBLE) / 1e6) * 1e6) AS BIGINT) AS surv_ppm
             |FROM c WHERE nd > 0 ORDER BY t""".stripMargin),
      "Kaplan-Meier time-to-purchase curve (hourly buckets from first view, " +
        "right-censored at observation end) — the survivorship-bias-free " +
        "conversion timing the naive mean silently gets wrong; micro-nat log " +
        "steps summed exactly, one exp per emitted row; risk table bounded by " +
        "time resolution"),

    // ---------------------------------------------------- log-rank test
    "q202_log_rank" -> Q(
      (s, dir) =>
        graft.operators.EventAnalytics.logRankTest(
            Tables.events(s, dir).withColumn("arm",
              conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
                .cast("bigint") % 2),
            "user_id", "ts", "event_type", "arm",
            entryType = "view", eventType = "purchase",
            bucketMicros = 3600000000L),
      Some(s"""WITH b AS (SELECT CAST(user_id AS BIGINT) AS u,
              |    epoch_us(ts) AS tsu, event_type AS et,
              |    ${hex8("md5(CAST(user_id AS VARCHAR))")} % 2 AS arm
              |  FROM events),
              |en AS (SELECT u, min(tsu) AS t0, max(arm) AS arm
              |  FROM b WHERE et = 'view' GROUP BY 1),
              |ev AS (SELECT b.u, min(tsu) AS t1 FROM b JOIN en ON en.u = b.u
              |       WHERE et = 'purchase' AND tsu >= t0 GROUP BY 1),
              |cz AS (SELECT max(tsu) AS tmax FROM b),
              |dd AS (SELECT en.arm, (COALESCE(t1, tmax) - t0) // 3600000000 AS t,
              |    CASE WHEN t1 IS NULL THEN 0 ELSE 1 END AS observed
              |  FROM en LEFT JOIN ev ON ev.u = en.u CROSS JOIN cz),
              |p AS (SELECT t, count(*) AS cnt,
              |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS cnt1,
              |    sum(observed) AS nd,
              |    sum(observed * CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nd1
              |  FROM dd GROUP BY 1),
              |w AS (SELECT *, sum(cnt) OVER () AS total,
              |    sum(cnt1) OVER () AS total1,
              |    sum(cnt) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc,
              |    sum(cnt1) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc1
              |  FROM p),
              |st AS (SELECT *, total - COALESCE(pc, 0) AS n,
              |    total1 - COALESCE(pc1, 0) AS n1 FROM w WHERE nd > 0),
              |tm AS (SELECT *,
              |    CAST(round(1e6 * CAST(nd AS DOUBLE) * n1 / n) AS BIGINT) AS e1m,
              |    CASE WHEN n <= 1 THEN 0
              |      ELSE CAST(round(1e6 * (CAST(nd AS DOUBLE) * n1 * (n - n1) * (n - nd))
              |        / (CAST(n AS DOUBLE) * n * (n - 1))) AS BIGINT) END AS vm
              |  FROM st),
              |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_event_times,
              |    CAST(sum(nd) AS BIGINT) AS n_events, CAST(sum(nd1) AS BIGINT) AS o1,
              |    CAST(sum(e1m) AS BIGINT) AS e1_micro, CAST(sum(vm) AS BIGINT) AS v_micro
              |  FROM tm)
              |SELECT n_event_times, n_events, o1, e1_micro, v_micro,
              |  CAST(CASE WHEN v_micro <= 0 THEN -1
              |    ELSE ((1000000::HUGEINT * o1 - e1_micro)
              |      * (1000000::HUGEINT * o1 - e1_micro)) // v_micro::HUGEINT
              |    END AS BIGINT) AS chi2_micro,
              |  CAST(CASE WHEN v_micro > 0
              |      AND ((1000000::HUGEINT * o1 - e1_micro)
              |        * (1000000::HUGEINT * o1 - e1_micro)) // v_micro::HUGEINT >= 3841459
              |    THEN 1 ELSE 0 END AS BIGINT) AS significant_95
              |FROM agg""".stripMargin),
      "log-rank test between md5-parity arms' time-to-purchase curves " +
        "(censoring-honest O-E and variance terms micro-rounded per event time, " +
        "exact integer chi-square gate at the 95% point) — detects 'same final " +
        "rate, different SPEED', which the rate-based A/B test cannot see"),

    // ---------------------------------------------- RFM segmentation
    "q203_rfm_segments" -> Q(
      (s, dir) =>
        graft.operators.EventAnalytics.rfmSegments(
            Tables.events(s, dir), "user_id", "ts", "value")
          .orderBy(col("u")),
      Some("""WITH b AS (SELECT CAST(user_id AS BIGINT) AS u,
             |    epoch_us(ts) AS tsu,
             |    CAST(round(value * 1e6) AS BIGINT) AS vm FROM events),
             |pu AS (SELECT u, max(tsu) AS last_tsu, CAST(count(*) AS BIGINT) AS frequency,
             |    CAST(sum(vm) AS BIGINT) AS monetary_micro FROM b GROUP BY 1),
             |t AS (SELECT max(tsu) AS tmax FROM b),
             |m AS (SELECT u, tmax - last_tsu AS recency_us, frequency,
             |    monetary_micro, count(*) OVER () AS n_users,
             |    row_number() OVER (ORDER BY tmax - last_tsu, u) AS rr,
             |    row_number() OVER (ORDER BY frequency, u) AS rf,
             |    row_number() OVER (ORDER BY monetary_micro, u) AS rm
             |  FROM pu CROSS JOIN t)
             |SELECT u, CAST(recency_us AS BIGINT) AS recency_us, frequency,
             |  monetary_micro,
             |  CAST((5 * rr + n_users - 1) // n_users AS BIGINT) AS r,
             |  CAST((5 * rf + n_users - 1) // n_users AS BIGINT) AS f,
             |  CAST((5 * rm + n_users - 1) // n_users AS BIGINT) AS m,
             |  CAST(((5 * rr + n_users - 1) // n_users) * 100
             |    + ((5 * rf + n_users - 1) // n_users) * 10
             |    + (5 * rm + n_users - 1) // n_users AS BIGINT) AS segment
             |FROM m ORDER BY u""".stripMargin),
      "RFM user-value segmentation (recency/frequency/monetary exact-rational " +
        "quintiles over deterministic (metric, user) order, quintile 1 = " +
        "smallest metric) — the sampling/weighting prior before behavior data " +
        "feeds training; one per-user aggregate + three user-level rank windows"),

    // ----------------------------------------------- funnel drop-off
    "q204_funnel_dropoff" -> Q(
      (s, dir) => {
        // the report the per-user funnel feeds: per step, how many users
        // arrived and what fraction of the PREVIOUS step's arrivals they
        // are — the where-do-we-lose-them table. Cumulative-from-top
        // counts fall out of a n_steps histogram suffix sum.
        val f = EventAnalytics.funnel(
          Tables.events(s, dir).withColumn("tsu", unix_micros(col("ts"))),
          "user_id", "event_type", "tsu",
          Seq("view", "click", "purchase"), windowMicros = 86400L * 1000000L)
        val byDepth = f.groupBy(col("n_steps")).agg(count(lit(1)).as("c"))
        val wSuffix = org.apache.spark.sql.expressions.Window
          .orderBy(col("n_steps"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        byDepth
          .withColumn("n_reached", sum(col("c")).over(wSuffix))
          .withColumn("prev",
            lag(col("n_reached"), 1).over(
              org.apache.spark.sql.expressions.Window.orderBy(col("n_steps"))))
          .select(col("n_steps").as("step"), col("n_reached"),
            when(col("prev").isNull, lit(1000000L))
              .otherwise(expr("(1000000 * n_reached) DIV prev"))
              .as("conv_from_prev_ppm"))
          .orderBy(col("step"))
      },
      // q92's funnel CTEs, then the depth histogram + suffix sums
      Some("""WITH e AS (
             |  SELECT user_id AS u, event_type AS et,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu
             |  FROM events),
             |s0 AS (SELECT u, min(tsu) AS t0 FROM e WHERE et = 'view' GROUP BY u),
             |s1 AS (SELECT e.u, min(tsu) AS t1 FROM e JOIN s0 USING (u)
             |       WHERE et = 'click' AND tsu >= t0 AND tsu <= t0 + 86400000000
             |       GROUP BY e.u),
             |s2 AS (SELECT e.u, min(tsu) AS t2 FROM e JOIN s0 USING (u) JOIN s1 USING (u)
             |       WHERE et = 'purchase' AND tsu >= t1 AND tsu <= t0 + 86400000000
             |       GROUP BY e.u),
             |d AS (SELECT CAST(CASE WHEN t2 IS NOT NULL THEN 3
             |              WHEN t1 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS n_steps
             |  FROM s0 LEFT JOIN s1 USING (u) LEFT JOIN s2 USING (u)),
             |h AS (SELECT n_steps, count(*) AS c FROM d GROUP BY 1),
             |r0 AS (SELECT *, sum(c) OVER (ORDER BY n_steps
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_reached
             |  FROM h),
             |r AS (SELECT *, lag(n_reached) OVER (ORDER BY n_steps) AS prev FROM r0)
             |SELECT n_steps AS step, CAST(n_reached AS BIGINT) AS n_reached,
             |  CAST(CASE WHEN prev IS NULL THEN 1000000
             |    ELSE (1000000 * n_reached) // prev END AS BIGINT) AS conv_from_prev_ppm
             |FROM r ORDER BY step""".stripMargin),
      "funnel drop-off table: per step the cumulative-from-top arrivals and " +
        "the conversion from the previous step (exact integer ppm) — the " +
        "where-do-we-lose-them report composed over the q92 per-user funnel " +
        "via a depth-histogram suffix sum"),

    // ---------------------------- series: CUSUM mean-shift changepoint
    "q216_cusum_changepoint" -> Q(
      (s, dir) =>
        EventAnalytics.cusumChangepoint(
            Tables.events(s, dir), "ts", "value", "event_type")
          .orderBy(col("grp")),
      Some("""WITH daily AS (SELECT event_type AS grp,
             |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |    sum(CAST(round(value * 1e6) AS BIGINT)) AS ds, count(*) AS dc
             |  FROM events GROUP BY 1, 2),
             |c AS (SELECT grp, day, ds, dc,
             |    sum(ds) OVER (PARTITION BY grp ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
             |    sum(dc) OVER (PARTITION BY grp ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
             |    sum(ds) OVER (PARTITION BY grp) AS tst,
             |    sum(dc) OVER (PARTITION BY grp) AS tct,
             |    count(*) OVER (PARTITION BY grp) AS nd
             |  FROM daily),
             |s AS (SELECT *, tct::HUGEINT * cs - cc::HUGEINT * tst AS dk FROM c),
             |r AS (SELECT *,
             |    row_number() OVER (PARTITION BY grp ORDER BY abs(dk) DESC, day) AS rk
             |  FROM s)
             |SELECT grp, CAST(nd AS BIGINT) AS n_days, CAST(tct AS BIGINT) AS n_events,
             |  day AS change_day,
             |  CAST(dk // tct AS BIGINT) AS cusum_micro,
             |  CAST(cs // cc AS BIGINT) AS mean_before_micro,
             |  CAST(CASE WHEN tct = cc THEN -2000000
             |    ELSE (tst - cs) // (tct - cc) END AS BIGINT) AS mean_after_micro,
             |  CAST(CASE WHEN tct = cc THEN -2000000
             |    ELSE (tst - cs) // (tct - cc) - cs // cc END AS BIGINT) AS shift_micro
             |FROM r WHERE rk = 1 ORDER BY grp""".stripMargin),
      "offline CUSUM mean-shift changepoint per event type: the day whose " +
        "centered prefix sum peaks (division-free via cnt_total-scaling, " +
        "exact micro; ties -> earliest day), with before/after regime means " +
        "and the shift — the WHEN-did-it-move monitor next to q112's " +
        "is-today-anomalous and q132/q159's did-the-distribution-move"),

    // ----------------------------- series: online CUSUM drift alarms
    "q220_online_cusum" -> Q(
      (s, dir) =>
        EventAnalytics.onlineCusum(
            Tables.events(s, dir), "ts", "value", "event_type",
            refDays = 10, slackMicro = 2000000L, hMicro = 10000000L)
          .orderBy(col("grp")),
      // the oracle replays the literal CusumFunctions.step fold as a
      // lockstep recursive CTE over day-ranked probe rows (q116 pattern)
      Some("""WITH RECURSIVE daily AS (SELECT event_type AS grp,
             |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |    sum(CAST(round(value * 1e6) AS BIGINT)) // count(*) AS dm
             |  FROM events GROUP BY 1, 2),
             |rk AS (SELECT grp, day, dm,
             |    row_number() OVER (PARTITION BY grp ORDER BY day) AS rk
             |  FROM daily),
             |mu AS (SELECT grp, sum(dm) // count(*) AS mu, count(*) AS n_ref
             |  FROM rk WHERE rk <= 10 GROUP BY grp),
             |probe AS (SELECT r.grp, r.day, r.dm - m.mu AS dev,
             |    row_number() OVER (PARTITION BY r.grp ORDER BY r.day) AS pn,
             |    count(*) OVER (PARTITION BY r.grp) AS np
             |  FROM rk r JOIN mu m ON m.grp = r.grp WHERE r.rk > 10),
             |f AS (
             |  SELECT grp, 0::BIGINT AS i, 0::BIGINT AS sh, 0::BIGINT AS sl,
             |    0::BIGINT AS ah, 0::BIGINT AS al, '' AS fa, np
             |  FROM (SELECT DISTINCT grp, np FROM probe)
             |  UNION ALL
             |  SELECT f.grp, f.i + 1,
             |    CASE WHEN greatest(0, f.sh + p.dev - 2000000) > 10000000
             |      THEN 0 ELSE greatest(0, f.sh + p.dev - 2000000) END,
             |    CASE WHEN greatest(0, f.sl - p.dev - 2000000) > 10000000
             |      THEN 0 ELSE greatest(0, f.sl - p.dev - 2000000) END,
             |    f.ah + CASE WHEN greatest(0, f.sh + p.dev - 2000000) > 10000000
             |      THEN 1 ELSE 0 END,
             |    f.al + CASE WHEN greatest(0, f.sl - p.dev - 2000000) > 10000000
             |      THEN 1 ELSE 0 END,
             |    CASE WHEN f.fa <> '' THEN f.fa
             |      WHEN greatest(0, f.sh + p.dev - 2000000) > 10000000
             |        OR greatest(0, f.sl - p.dev - 2000000) > 10000000 THEN p.day
             |      ELSE '' END,
             |    f.np
             |  FROM f JOIN probe p ON p.grp = f.grp AND p.pn = f.i + 1),
             |fin AS (SELECT grp, np, sh, sl, ah, al, fa FROM f WHERE i = np)
             |SELECT m.grp, CAST(m.mu AS BIGINT) AS mu_micro,
             |  CAST(m.n_ref AS BIGINT) AS n_ref_days,
             |  CAST(COALESCE(fin.np, 0) AS BIGINT) AS n_probe_days,
             |  CAST(COALESCE(fin.sh, 0) AS BIGINT) AS s_hi_micro,
             |  CAST(COALESCE(fin.sl, 0) AS BIGINT) AS s_lo_micro,
             |  CAST(COALESCE(fin.ah, 0) AS BIGINT) AS alarms_hi,
             |  CAST(COALESCE(fin.al, 0) AS BIGINT) AS alarms_lo,
             |  COALESCE(fin.fa, '') AS first_alarm
             |FROM mu m LEFT JOIN fin ON fin.grp = m.grp ORDER BY m.grp""".stripMargin),
      "online CUSUM drift alarms per event type (Page's detector, frozen " +
        "10-day reference mean, slack 2.0, threshold 10.0, two-sided with " +
        "restart-on-alarm) — the monitor that pages DURING the drift q216 " +
        "dates afterwards; exact integer fold shared verbatim with the " +
        "streaming twin, replayed lockstep by the oracle's recursive CTE"),

    // --------------------------- series: STL-lite seasonal decomposition
    "q224_stl_decompose" -> Q(
      (s, dir) =>
        EventAnalytics.stlDecompose(
            Tables.events(s, dir), "ts", "value", "event_type")
          .orderBy(col("grp"), col("day")),
      Some("""WITH daily AS (SELECT event_type AS grp,
             |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |    sum(CAST(round(value * 1e6) AS BIGINT)) // count(*) AS dm
             |  FROM events GROUP BY 1, 2),
             |t AS (SELECT grp, day, dm,
             |    sum(dm) OVER w // count(*) OVER w AS trend,
             |    CAST(isodow(CAST(day AS DATE)) AS INT) AS dow
             |  FROM daily
             |  WINDOW w AS (PARTITION BY grp ORDER BY day
             |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |d AS (SELECT *, dm - trend AS det FROM t),
             |se AS (SELECT grp, dow, sum(det) // count(*) AS seasonal
             |  FROM d GROUP BY 1, 2)
             |SELECT d.grp, d.day, CAST(d.dm AS BIGINT) AS dm_micro,
             |  CAST(d.trend AS BIGINT) AS trend_micro, d.dow,
             |  CAST(se.seasonal AS BIGINT) AS seasonal_micro,
             |  CAST(d.dm - d.trend - se.seasonal AS BIGINT) AS residual_micro
             |FROM d JOIN se ON se.grp = d.grp AND se.dow = d.dow
             |ORDER BY d.grp, d.day""".stripMargin),
      "STL-lite additive decomposition of each event type's daily series: " +
        "centered 7-day moving-average trend, per-ISO-weekday seasonal " +
        "means of the detrended values, exact residual (the identity " +
        "x = trend + seasonal + residual holds per row) — monitor the " +
        "residual, report the seasonal, alarm on the trend; " +
        "calendar-bounded windows partitioned by group"),

    // ------------------------------ privacy: Laplace-noised DP counts
    "q225_dp_counts" -> Q(
      (s, dir) =>
        graft.operators.Privacy.dpNoisyCounts(
            Tables.events(s, dir), "event_type",
            epsilonMicro = 1000000L, salt = "dp1")
          .orderBy(col("grp")),
      Some(s"""WITH c AS (SELECT CAST(event_type AS VARCHAR) AS grp,
             |    count(*) AS true_count FROM events GROUP BY 1),
             |n AS (SELECT grp, true_count,
             |    ${hex8("md5(grp || ':dp1')")} % 1000000 AS h FROM c),
             |t AS (SELECT *, 1000000 - abs(2 * h + 1 - 1000000) AS tm FROM n),
             |l AS (SELECT *,
             |    CAST(round(1e6 * ln(CAST(tm AS DOUBLE) / 1e6)) AS BIGINT) AS ln_micro
             |  FROM t)
             |SELECT grp, CAST(true_count AS BIGINT) AS true_count,
             |  CAST(CASE WHEN 2 * h + 1 > 1000000
             |    THEN -(ln_micro * 1000000) // 1000000
             |    ELSE (ln_micro * 1000000) // 1000000 END AS BIGINT) AS noise_micro,
             |  CAST(true_count * 1000000 + CASE WHEN 2 * h + 1 > 1000000
             |    THEN -(ln_micro * 1000000) // 1000000
             |    ELSE (ln_micro * 1000000) // 1000000 END AS BIGINT) AS noisy_micro
             |FROM l ORDER BY grp""".stripMargin),
      "Laplace-noised per-type counts (eps=1.0, sensitivity-1 inverse-CDF " +
        "mechanism) — the noise end of the privacy ladder after " +
        "k-anon/l-diversity/t-closeness; u is md5-derived (deterministic, " +
        "engine-replayable, retry-safe — a production release swaps the " +
        "salt for a CSPRNG draw, loudly documented), the Laplace tail " +
        "takes one rounded micro-nat ln per group, 1/eps is an exact " +
        "integer division"),

    // ------------------------------ cdc: snapshot reconciliation diff
    "q226_snapshot_diff" -> Q(
      (s, dir) => {
        // v2 = v1 with deterministic mutations: every 13th key removed,
        // every 7th price bumped, every 11th status flipped, every 17th
        // key re-added under a new id — the shapes a publish gate must
        // catch, reproduced identically by the oracle
        val o = Tables.table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val v2 = o.filter(col("o_orderkey") % 13 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.5)
              .otherwise(col("o_totalprice")))
          .withColumn("o_orderstatus",
            when(col("o_orderkey") % 11 === 0, lit("X"))
              .otherwise(col("o_orderstatus")))
          .unionByName(o.filter(col("o_orderkey") % 17 === 0)
            .withColumn("o_orderkey", col("o_orderkey") + 100000000L))
        ChangeCapture.snapshotDiff(o, v2, "o_orderkey",
            Seq("o_totalprice", "o_orderstatus"))
          .orderBy(col("column_name"))
      },
      Some("""WITH a AS (SELECT o_orderkey AS k, o_orderstatus, o_totalprice
             |  FROM orders),
             |b AS (
             |  SELECT k,
             |    CASE WHEN k % 11 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
             |    CASE WHEN k % 7 = 0 THEN o_totalprice + 1.5
             |      ELSE o_totalprice END AS o_totalprice
             |  FROM a WHERE k % 13 <> 0
             |  UNION ALL
             |  SELECT k + 100000000, o_orderstatus, o_totalprice
             |  FROM a WHERE k % 17 = 0),
             |j AS (SELECT a.k IS NOT NULL AS ina, b.k IS NOT NULL AS inb,
             |    a.o_totalprice AS ap, b.o_totalprice AS bp,
             |    a.o_orderstatus AS ast, b.o_orderstatus AS bst
             |  FROM a FULL OUTER JOIN b ON a.k = b.k),
             |g AS (SELECT
             |    count(*) FILTER (WHERE ina) AS n_a,
             |    count(*) FILTER (WHERE inb) AS n_b,
             |    count(*) FILTER (WHERE NOT ina) AS added,
             |    count(*) FILTER (WHERE NOT inb) AS removed,
             |    count(*) FILTER (WHERE ina AND inb) AS common,
             |    count(*) FILTER (WHERE ina AND inb AND ap IS DISTINCT FROM bp)
             |      AS chp,
             |    count(*) FILTER (WHERE ina AND inb AND ast IS DISTINCT FROM bst)
             |      AS chs
             |  FROM j)
             |SELECT 'o_orderstatus' AS column_name, CAST(n_a AS BIGINT) AS n_a,
             |  CAST(n_b AS BIGINT) AS n_b, CAST(added AS BIGINT) AS added,
             |  CAST(removed AS BIGINT) AS removed, CAST(common AS BIGINT) AS common,
             |  CAST(chs AS BIGINT) AS changed,
             |  CAST(CASE WHEN common = 0 THEN -1
             |    ELSE (1000000::HUGEINT * chs) // common END AS BIGINT) AS changed_ppm
             |FROM g
             |UNION ALL
             |SELECT 'o_totalprice', CAST(n_a AS BIGINT), CAST(n_b AS BIGINT),
             |  CAST(added AS BIGINT), CAST(removed AS BIGINT), CAST(common AS BIGINT),
             |  CAST(chp AS BIGINT),
             |  CAST(CASE WHEN common = 0 THEN -1
             |    ELSE (1000000::HUGEINT * chp) // common END AS BIGINT)
             |FROM g ORDER BY column_name""".stripMargin),
      "snapshot reconciliation diff of orders v1 vs a deterministically " +
        "mutated v2 (removed/bumped/flipped/re-added keys): per compared " +
        "column the added/removed/common key counts and IS-DISTINCT-FROM " +
        "change counts in exact ppm — the publish gate a lakehouse runs " +
        "before promoting; ONE full-outer key join + ONE aggregation " +
        "computes every column's count simultaneously (the q221 one-pass " +
        "shape)"),

    // ----------------------------- series: autocorrelation function
    "q227_acf" -> Q(
      (s, dir) =>
        EventAnalytics.acf(
            Tables.events(s, dir), "ts", "value", "event_type", maxLag = 7)
          .orderBy(col("grp"), col("lag")),
      Some {
        val arms = (1 to 7).map(l =>
          s"SELECT grp, $l AS lag, dm AS x, l$l AS y FROM lg WHERE l$l IS NOT NULL")
          .mkString("\nUNION ALL\n")
        s"""WITH daily AS (SELECT event_type AS grp,
           |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           |    sum(CAST(round(value * 1e6) AS BIGINT)) // count(*) AS dm
           |  FROM events GROUP BY 1, 2),
           |lg AS (SELECT grp, day, dm,
           |    ${(1 to 7).map(l => s"lag(dm, $l) OVER w AS l$l").mkString(", ")}
           |  FROM daily WINDOW w AS (PARTITION BY grp ORDER BY day)),
           |p AS ($arms),
           |m AS (SELECT grp, lag, count(*) AS n,
           |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
           |    sum(CAST(x AS HUGEINT) * y) AS sxy,
           |    sum(CAST(x AS HUGEINT) * x) AS sxx,
           |    sum(CAST(y AS HUGEINT) * y) AS syy
           |  FROM p GROUP BY 1, 2)
           |SELECT grp, CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_pairs,
           |  CAST(CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
           |    THEN -2000000
           |    ELSE CAST(round(1e6 * CAST(n * sxy - sx * sy AS DOUBLE)
           |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
           |        * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
           |    END AS BIGINT) AS acf_micro
           |FROM m ORDER BY grp, lag""".stripMargin
      },
      "autocorrelation of each type's daily mean series at lags 1-7 " +
        "(exact Pearson over the lagged pair sets, q135 moment convention, " +
        "one f64 divide+sqrt rounded to micro at the end) — the seasonal- " +
        "period picker for Holt-Winters and the residual-whiteness check " +
        "for q224; one group-partitioned window pass carries all lags, " +
        "stack-unpivoted into one aggregation"),

    // ------------------- quality: windowed Benford monitor (batch twin)
    "q229_windowed_benford" -> Q(
      (s, dir) =>
        graft.streaming.StreamingBenford.batchWindowBenford(
            Tables.events(s, dir), "value", "ts", "1 day")
          .orderBy(col("win_start_us"), col("digit")),
      Some {
        val ben = (1 to 9).map(d =>
          (d, graft.operators.DataPrep.benfordPpm(d)))
        s"""WITH v AS (SELECT epoch_us(date_trunc('day', ts)) AS w,
           |    CAST(round(value * 1e6) AS BIGINT) AS xm FROM events),
           |p AS (SELECT w, CAST(substring(CAST(xm AS VARCHAR), 1, 1) AS INT) AS digit,
           |    count(*) AS c
           |  FROM v WHERE xm > 0 GROUP BY 1, 2),
           |d(digit, bp) AS (VALUES
           |  ${ben.map { case (dd, e) => s"($dd, ${e}::BIGINT)" }.mkString(", ")}),
           |wins AS (SELECT DISTINCT w FROM p),
           |grid AS (SELECT w, digit, bp FROM wins CROSS JOIN d),
           |tot AS (SELECT w, sum(c) AS n_used FROM p GROUP BY 1),
           |pd AS (SELECT g.w, g.digit, COALESCE(p.c, 0) AS cnt, t.n_used,
           |    CASE WHEN t.n_used = 0 THEN -1
           |      ELSE (1000000::HUGEINT * COALESCE(p.c, 0)) // t.n_used
           |      END AS observed_ppm,
           |    g.bp AS benford_ppm
           |  FROM grid g LEFT JOIN p ON p.w = g.w AND p.digit = g.digit
           |  JOIN tot t ON t.w = g.w),
           |tv AS (SELECT w, sum(abs(observed_ppm - benford_ppm)) // 2 AS tv_ppm
           |  FROM pd GROUP BY 1)
           |SELECT pd.w AS win_start_us, pd.digit, CAST(cnt AS BIGINT) AS cnt,
           |  CAST(n_used AS BIGINT) AS n_used,
           |  CAST(observed_ppm AS BIGINT) AS observed_ppm,
           |  CAST(benford_ppm AS BIGINT) AS benford_ppm,
           |  CAST(tv.tv_ppm AS BIGINT) AS tv_ppm
           |FROM pd JOIN tv ON tv.w = pd.w ORDER BY 1, 2""".stripMargin
      },
      "per-day windowed Benford monitor over event values — q223's audit " +
        "as a live drift signal (a TV spike says the magnitude mix moved: " +
        "capping, unit mangling, synthetic feeds); batch twin of " +
        "StreamingBenford sharing leadingDigit and the benfordOfCounts " +
        "reduction VERBATIM, at most 9 digit rows of state per open window"),

    // ------------------------- series: Mann-Kendall trend + Sen slope
    "q231_mann_kendall" -> Q(
      (s, dir) =>
        EventAnalytics.mannKendall(
            Tables.events(s, dir), "ts", "value", "event_type")
          .orderBy(col("grp")),
      Some(
        """WITH daily AS (SELECT event_type AS grp,
          |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |    sum(CAST(round(value * 1e6) AS BIGINT)) // count(*) AS dm
          |  FROM events GROUP BY 1, 2),
          |p AS (SELECT a.grp, b.dm - a.dm AS diff,
          |    date_diff('day', strptime(a.day, '%Y-%m-%d'),
          |      strptime(b.day, '%Y-%m-%d')) AS dt
          |  FROM daily a JOIN daily b ON a.grp = b.grp AND a.day < b.day),
          |sl AS (SELECT grp, (1000 * diff) // dt AS slope_nano FROM p),
          |sen AS (SELECT grp, slope_nano AS sen_slope_nano, np AS n_pairs
          |  FROM (SELECT grp, slope_nano,
          |      row_number() OVER (PARTITION BY grp ORDER BY slope_nano) AS rn,
          |      count(*) OVER (PARTITION BY grp) AS np FROM sl)
          |  WHERE rn = (np + 1) // 2),
          |st AS (SELECT grp,
          |    sum(CASE WHEN diff > 0 THEN 1 WHEN diff < 0 THEN -1 ELSE 0 END)
          |      AS s_stat
          |  FROM p GROUP BY 1),
          |nn AS (SELECT grp, count(*) AS n_days FROM daily GROUP BY 1),
          |ti AS (SELECT grp, sum(t * (t - 1) * (2 * t + 5)) AS tie_term
          |  FROM (SELECT grp, count(*) AS t FROM daily GROUP BY grp, dm)
          |  GROUP BY 1),
          |base AS (SELECT nn.grp, nn.n_days,
          |    COALESCE(sen.n_pairs, 0) AS n_pairs,
          |    COALESCE(st.s_stat, 0) AS s_stat,
          |    nn.n_days * (nn.n_days - 1) * (2 * nn.n_days + 5) - ti.tie_term
          |      AS var_num,
          |    COALESCE(sen.sen_slope_nano, 0) AS sen_slope_nano
          |  FROM nn JOIN ti ON ti.grp = nn.grp
          |  LEFT JOIN st ON st.grp = nn.grp
          |  LEFT JOIN sen ON sen.grp = nn.grp),
          |z AS (SELECT *,
          |    CASE WHEN var_num <= 0 THEN -2000000
          |      ELSE CAST(round(1e6 * (s_stat - sign(s_stat))
          |        / sqrt(var_num / 18.0)) AS BIGINT) END AS z_micro
          |  FROM base)
          |SELECT grp, CAST(n_days AS BIGINT) AS n_days,
          |  CAST(n_pairs AS BIGINT) AS n_pairs,
          |  CAST(s_stat AS BIGINT) AS s_stat,
          |  CAST(var_num AS BIGINT) AS var_num,
          |  CAST(sen_slope_nano AS BIGINT) AS sen_slope_nano,
          |  CAST(z_micro AS BIGINT) AS z_micro,
          |  CASE WHEN n_days < 2 THEN 'insufficient'
          |    WHEN var_num <= 0 THEN 'flat'
          |    WHEN z_micro >= 1959964 THEN 'inc'
          |    WHEN z_micro <= -1959964 THEN 'dec'
          |    ELSE 'none' END AS trend
          |FROM z ORDER BY grp""".stripMargin),
      "Mann-Kendall monotone-trend test + Theil-Sen slope of each event " +
        "type's daily mean series — the nonparametric is-this-metric- " +
        "drifting monitor next to q216's abrupt-shift CUSUM: exact " +
        "pairwise sign counts with tied-value variance correction, one " +
        "f64 divide+sqrt for z (q227 convention), lower-median pairwise " +
        "slope in nano-units/day; everything after the (group, day) " +
        "collapse is calendar-bounded and group-partitioned"),

    // ---------------- series: seasonal-naive forecast backtest (MASE)
    "q234_mase_backtest" -> Q(
      (s, dir) =>
        EventAnalytics.forecastBacktest(
            Tables.events(s, dir), "ts", "value", "event_type",
            seasonLag = 7)
          .orderBy(col("grp")),
      Some(
        """WITH daily AS (SELECT event_type AS grp,
          |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |    sum(CAST(round(value * 1e6) AS BIGINT)) // count(*) AS dm
          |  FROM events GROUP BY 1, 2),
          |lg AS (SELECT grp, dm, lag(dm, 7) OVER w AS lm,
          |    lag(dm, 1) OVER w AS l1
          |  FROM daily WINDOW w AS (PARTITION BY grp ORDER BY day)),
          |ev AS (SELECT grp, count(*) AS n_eval,
          |    sum(abs(dm - lm)) AS se_model, sum(abs(dm - l1)) AS se_naive
          |  FROM lg WHERE lm IS NOT NULL GROUP BY 1),
          |nn AS (SELECT grp, count(*) AS n_days FROM daily GROUP BY 1)
          |SELECT nn.grp, CAST(nn.n_days AS BIGINT) AS n_days,
          |  CAST(COALESCE(ev.n_eval, 0) AS BIGINT) AS n_eval,
          |  CAST(CASE WHEN COALESCE(ev.n_eval, 0) = 0 THEN -1
          |    ELSE se_model // ev.n_eval END AS BIGINT) AS mae_model_micro,
          |  CAST(CASE WHEN COALESCE(ev.n_eval, 0) = 0 THEN -1
          |    ELSE se_naive // ev.n_eval END AS BIGINT) AS mae_naive_micro,
          |  CAST(CASE WHEN COALESCE(ev.n_eval, 0) = 0 OR se_naive = 0
          |    THEN -1
          |    ELSE (1000000::HUGEINT * se_model) // se_naive END AS BIGINT)
          |    AS mase_ppm
          |FROM nn LEFT JOIN ev ON ev.grp = nn.grp ORDER BY 1""".stripMargin),
      "seasonal-naive (lag-7) forecast backtest per event type, scored " +
        "as MASE against the 1-step naive (Hyndman-Koehler, exact " +
        "integer error sums, one toward-zero ppm division) — the " +
        "is-the-weekly-structure-real gate that sizes a forecast " +
        "baseline before Holt-Winters (q210) ships; groups too short to " +
        "evaluate emit n_eval=0 sentinels; one daily collapse + " +
        "group-partitioned lags, nothing global"),

    // ------------- series: binary-segmentation multi-changepoint
    "q235_binary_segmentation" -> Q(
      (s, dir) =>
        EventAnalytics.binarySegmentation(
            Tables.events(s, dir), "ts", "value", "event_type",
            maxSplits = 2)
          .orderBy(col("grp"), col("seg_start")),
      Some {
        val rounds = (1 to 2).map { r =>
          s"""c$r AS (SELECT grp, seg, day, ds, dc,
             |    sum(ds) OVER (PARTITION BY grp, seg ORDER BY day
             |      ROWS UNBOUNDED PRECEDING) AS cs,
             |    sum(dc) OVER (PARTITION BY grp, seg ORDER BY day
             |      ROWS UNBOUNDED PRECEDING) AS cc,
             |    sum(ds) OVER (PARTITION BY grp, seg) AS st,
             |    sum(dc) OVER (PARTITION BY grp, seg) AS tc
             |  FROM s${r - 1}),
             |p$r AS (SELECT grp, seg, day FROM (
             |    SELECT grp, seg, day, row_number() OVER
             |        (PARTITION BY grp ORDER BY stat DESC, day, seg) AS rn
             |    FROM (SELECT grp, seg, day,
             |        abs(tc::HUGEINT * cs - cc::HUGEINT * st) // tc AS stat
             |      FROM c$r WHERE cc < tc)
             |    WHERE stat > 0)
             |  WHERE rn = 1),
             |s$r AS (SELECT s.grp, s.day, s.ds, s.dc,
             |    CASE WHEN p.day IS NOT NULL AND s.day > p.day
             |      THEN p.day ELSE s.seg END AS seg
             |  FROM s${r - 1} s
             |  LEFT JOIN p$r p ON p.grp = s.grp AND p.seg = s.seg)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH s0 AS (SELECT event_type AS grp,
           |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           |    sum(CAST(round(value * 1e6) AS BIGINT)) AS ds,
           |    count(*) AS dc, 'r' AS seg
           |  FROM events GROUP BY 1, 2),
           |$rounds
           |SELECT grp, min(day) AS seg_start, max(day) AS seg_end,
           |  CAST(count(*) AS BIGINT) AS n_days,
           |  CAST(sum(dc) AS BIGINT) AS n_events,
           |  CAST(sum(ds) // sum(dc) AS BIGINT) AS mean_micro
           |FROM s2 GROUP BY grp, seg ORDER BY grp, seg_start""".stripMargin
      },
      "binary-segmentation multi-changepoint over each event type's " +
        "daily series (2 greedy rounds, at most one split per group per " +
        "round at the largest within-segment CUSUM peak, exact integer " +
        "micro statistic with earliest-day ties, constant segments never " +
        "split) — the multi-shift extension of q216's single " +
        "changepoint; each round is (group, segment)-partitioned windows " +
        "+ one group argmax + one picks join, Materialize.checkpoint-pinned"),

    // -------------- series: streaming daily-stats stage (batch twin)
    "q240_daily_stats" -> Q(
      (s, dir) =>
        graft.streaming.StreamingDailyStats.batchDailyStats(
            Tables.events(s, dir), "ts", "value", "event_type")
          .orderBy(col("grp"), col("day")),
      Some(
        """SELECT event_type AS grp,
          |  strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS ds,
          |  CAST(count(*) AS BIGINT) AS dc,
          |  CAST(sum(CAST(round(value * 1e6) AS BIGINT)) // count(*)
          |    AS BIGINT) AS dm
          |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      "the streaming daily-stats stage's batch twin: event-time 1-day " +
        "windows carrying exact (sum, count, mean) per (type, day) — " +
        "window(ts, '1 day').start ≡ date_trunc day in the pinned UTC " +
        "session, so the closed-window stream rows are bit-equal to the " +
        "dailyStats frame every FromDaily monitor (q216/q220/q224/q227/" +
        "q231/q234/q235) consumes; one watermarked aggregation, one " +
        "(sum, count) pair of state per open (group, day)"),

    // ----------------- series: seasonality / trend strength (Hyndman)
    "q241_seasonal_strength" -> Q(
      (s, dir) =>
        EventAnalytics.seasonalStrength(
            Tables.events(s, dir), "ts", "value", "event_type")
          .orderBy(col("grp")),
      Some(
        """WITH daily AS (SELECT event_type AS grp,
          |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |    sum(CAST(round(value * 1e6) AS BIGINT)) // count(*) AS dm
          |  FROM events GROUP BY 1, 2),
          |t AS (SELECT grp, day, dm,
          |    sum(dm) OVER w // count(*) OVER w AS trend,
          |    CAST(isodow(CAST(day AS DATE)) AS INT) AS dow
          |  FROM daily
          |  WINDOW w AS (PARTITION BY grp ORDER BY day
          |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
          |d AS (SELECT *, dm - trend AS det FROM t),
          |se AS (SELECT grp, dow, sum(det) // count(*) AS seasonal
          |  FROM d GROUP BY 1, 2),
          |comp AS (SELECT d.grp,
          |    d.dm - d.trend - se.seasonal AS r,
          |    d.dm - d.trend AS qs,
          |    d.dm - se.seasonal AS qt
          |  FROM d JOIN se ON se.grp = d.grp AND se.dow = d.dow),
          |m AS (SELECT grp, count(*) AS n,
          |    sum(r::HUGEINT) AS sr, sum(r::HUGEINT * r) AS srr,
          |    sum(qs::HUGEINT) AS sqs, sum(qs::HUGEINT * qs) AS sqss,
          |    sum(qt::HUGEINT) AS sqt, sum(qt::HUGEINT * qt) AS sqtt
          |  FROM comp GROUP BY 1)
          |SELECT grp, CAST(n AS BIGINT) AS n_days,
          |  CAST(CASE WHEN n * sqss - sqs * sqs = 0 THEN -1
          |    ELSE greatest(0, 1000000 - (1000000::HUGEINT
          |      * (n * srr - sr * sr)) // (n * sqss - sqs * sqs))
          |    END AS BIGINT) AS seasonal_strength_ppm,
          |  CAST(CASE WHEN n * sqtt - sqt * sqt = 0 THEN -1
          |    ELSE greatest(0, 1000000 - (1000000::HUGEINT
          |      * (n * srr - sr * sr)) // (n * sqtt - sqt * sqt))
          |    END AS BIGINT) AS trend_strength_ppm
          |FROM m ORDER BY grp""".stripMargin),
      "Hyndman seasonality and trend strength of each event type's " +
        "daily series from the q224 STL components — F = max(0, 1 - " +
        "Var(R)/Var(comparison)) in exact ppm, where S+R = x-T and " +
        "T+R = x-S hold exactly per row, so both strengths reduce to " +
        "ratios of integer moment combinations with ONE toward-zero " +
        "division each (no floats); the should-Holt-Winters-carry-a- " +
        "seasonal-term gate next to q227's period picker"),

    // ------------------ series: PACF via exact Cramer determinants
    "q242_pacf" -> Q(
      (s, dir) =>
        EventAnalytics.pacf(
            Tables.events(s, dir), "ts", "value", "event_type", maxLag = 5)
          .orderBy(col("grp"), col("lag")),
      Some {
        val arms = (1 to 5).map(l =>
          s"SELECT grp, $l AS lag, dm AS x, l$l AS y FROM lg WHERE l$l IS NOT NULL")
          .mkString("\nUNION ALL\n")
        def det(k: Int, num: Boolean) = EventAnalytics.detExpansion(k,
          (i, j) => if (num && j == k - 1) s"d${i + 1}"
            else s"d${math.abs(i - j)}")
        val resArms = (1 to 5).map { k =>
          val dn = det(k, num = false)
          val nm = det(k, num = true)
          val sentinel = (1 to k).map(l => s"r$l = -2000000").mkString(" OR ")
          s"""SELECT grp, CAST($k AS INT) AS lag,
             |  CASE WHEN $sentinel THEN CAST(-2000000 AS BIGINT)
             |    WHEN ($dn) = 0 THEN CAST(-2000000 AS BIGINT)
             |    ELSE CAST(round(1e6 * CAST(($nm) AS DOUBLE)
             |      / CAST(($dn) AS DOUBLE)) AS BIGINT) END AS pacf_micro
             |FROM wd""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH daily AS (SELECT event_type AS grp,
           |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           |    sum(CAST(round(value * 1e6) AS BIGINT)) // count(*) AS dm
           |  FROM events GROUP BY 1, 2),
           |lg AS (SELECT grp, day, dm,
           |    ${(1 to 5).map(l => s"lag(dm, $l) OVER w AS l$l").mkString(", ")}
           |  FROM daily WINDOW w AS (PARTITION BY grp ORDER BY day)),
           |p AS ($arms),
           |m AS (SELECT grp, lag, count(*) AS n,
           |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
           |    sum(CAST(x AS HUGEINT) * y) AS sxy,
           |    sum(CAST(x AS HUGEINT) * x) AS sxx,
           |    sum(CAST(y AS HUGEINT) * y) AS syy
           |  FROM p GROUP BY 1, 2),
           |av AS (SELECT grp, lag,
           |    CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
           |      THEN -2000000
           |      ELSE CAST(round(1e6 * CAST(n * sxy - sx * sy AS DOUBLE)
           |        / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
           |          * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
           |      END AS a
           |  FROM m),
           |pv AS (SELECT grp,
           |    ${(1 to 5).map(l => s"max(CASE WHEN lag = $l THEN a END) AS r$l").mkString(", ")}
           |  FROM av GROUP BY 1),
           |wd AS (SELECT grp, 1000000::HUGEINT AS d0,
           |    ${(1 to 5).map(l => s"r$l::HUGEINT AS d$l").mkString(", ")},
           |    ${(1 to 5).map(l => s"r$l").mkString(", ")}
           |  FROM pv),
           |res AS ($resArms)
           |SELECT grp, lag, pacf_micro FROM res
           |WHERE pacf_micro IS NOT NULL ORDER BY grp, lag""".stripMargin
      },
      "partial autocorrelation of each type's daily series at lags 1-5 " +
        "— the AR-order picker completing q227's ACF, computed EXACTLY " +
        "by Cramer's rule on the Yule-Walker Toeplitz system: both " +
        "determinants expand to exact integer sums (micro scaling " +
        "cancels, k<=5 keeps 120 terms inside decimal bounds; the SAME " +
        "Scala permutation generator emits both engines' expressions), " +
        "so the only float op is one final divide per lag — no " +
        "Durbin-Levinson chained-division drift; singular systems read " +
        "the -2e6 sentinel, everything after the ACF is a groups-row " +
        "projection"),

    // ----------------- series: Ljung-Box portmanteau whiteness verdict
    "q247_ljung_box" -> Q(
      (s, dir) =>
        EventAnalytics.ljungBox(
            Tables.events(s, dir), "ts", "value", "event_type", maxLag = 5)
          .orderBy(col("grp")),
      Some {
        val arms = (1 to 5).map(l =>
          s"SELECT grp, $l AS lag, dm AS x, l$l AS y FROM lg WHERE l$l IS NOT NULL")
          .mkString("\nUNION ALL\n")
        val sentinel = (1 to 5).map(l => s"r$l = -2000000").mkString(" OR ")
        val termSum = (1 to 5)
          .map(l => s"(r$l::HUGEINT * r$l) // np$l")
          .mkString(" + ")
        s"""WITH daily AS (SELECT event_type AS grp,
           |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           |    sum(CAST(round(value * 1e6) AS BIGINT)) // count(*) AS dm
           |  FROM events GROUP BY 1, 2),
           |lg AS (SELECT grp, day, dm,
           |    ${(1 to 5).map(l => s"lag(dm, $l) OVER w AS l$l").mkString(", ")}
           |  FROM daily WINDOW w AS (PARTITION BY grp ORDER BY day)),
           |p AS ($arms),
           |m AS (SELECT grp, lag, count(*) AS n,
           |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
           |    sum(CAST(x AS HUGEINT) * y) AS sxy,
           |    sum(CAST(x AS HUGEINT) * x) AS sxx,
           |    sum(CAST(y AS HUGEINT) * y) AS syy
           |  FROM p GROUP BY 1, 2),
           |av AS (SELECT grp, lag, n AS np,
           |    CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
           |      THEN -2000000
           |      ELSE CAST(round(1e6 * CAST(n * sxy - sx * sy AS DOUBLE)
           |        / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
           |          * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
           |      END AS a
           |  FROM m),
           |pv AS (SELECT grp,
           |    ${(1 to 5).map(l => s"max(CASE WHEN lag = $l THEN a END) AS r$l").mkString(", ")},
           |    ${(1 to 5).map(l => s"max(CASE WHEN lag = $l THEN np END) AS np$l").mkString(", ")}
           |  FROM av GROUP BY 1),
           |f AS (SELECT * FROM pv
           |  WHERE ${(1 to 5).map(l => s"np$l IS NOT NULL").mkString(" AND ")}),
           |res AS (SELECT grp, CAST(np1 + 1 AS BIGINT) AS n_days,
           |  CASE WHEN $sentinel THEN CAST(-2000000 AS BIGINT)
           |    ELSE CAST(((np1 + 1)::HUGEINT * (np1 + 3)
           |      * ($termSum)) // 1000000 AS BIGINT) END AS q_micro
           |  FROM f)
           |SELECT grp, n_days, q_micro,
           |  CAST(CASE WHEN q_micro = -2000000 THEN -1
           |    ELSE CAST(q_micro < 11070498 AS INT) END AS BIGINT) AS white_95
           |FROM res ORDER BY grp""".stripMargin
      },
      "Ljung-Box portmanteau whiteness test of each type's daily series " +
        "over lags 1-5 — the joint is-there-ANY-autocorrelation verdict " +
        "completing q227/q242 (the residual check run after a forecast " +
        "fits): Q = n(n+2) sum(rho_k^2/(n-k)) from the exact micro ACF " +
        "with a DEFINED integer evaluation order (per-term truncating " +
        "division, decimal products), verdict = integer compare against " +
        "the chi2(5, .95) micro literal — no float straddle; constant " +
        "series propagate the -2e6 ACF sentinel with white_95 = -1"),

    // ------------- graph: Adamic-Adar link prediction on co-purchases
    "q249_adamic_adar" -> Q(
      (s, dir) => {
        val li = Tables.table(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct() // q129 rewrite: unique join rows ⇒ plain count below
        // the q108 co-purchase graph: parts sharing >= 2 distinct orders
        val edges = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .groupBy(col("x.pk").as("pa"), col("y.pk").as("pb"))
          .agg(count(lit(1)).as("supp"))
          .filter(col("supp") >= 2)
        Graph.adamicAdar(edges, "pa", "pb", maxDeg = 1000)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |e AS (SELECT x.pk AS a, y.pk AS b
             |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
             |  GROUP BY 1, 2 HAVING count(DISTINCT x.ok) >= 2),
             |post AS (SELECT a AS z, b AS n FROM e UNION ALL SELECT b, a FROM e),
             |deg AS (SELECT z, count(*) AS d FROM post GROUP BY 1),
             |cap AS (SELECT post.z, post.n,
             |    CAST(round(1e6 / ln(deg.d)) AS BIGINT) AS term_micro
             |  FROM post JOIN deg USING (z) WHERE deg.d >= 2 AND deg.d <= 1000),
             |pr AS (SELECT l.n AS id_a, r.n AS id_b,
             |    CAST(count(*) AS BIGINT) AS common,
             |    CAST(sum(l.term_micro) AS BIGINT) AS aa_micro
             |  FROM cap l JOIN cap r ON l.z = r.z AND l.n < r.n
             |  GROUP BY 1, 2)
             |SELECT pr.id_a, pr.id_b, pr.common, pr.aa_micro,
             |  CAST(e.a IS NOT NULL AS BIGINT) AS is_edge
             |FROM pr LEFT JOIN e ON e.a = pr.id_a AND e.b = pr.id_b
             |ORDER BY id_a, id_b""".stripMargin),
      "Adamic-Adar link prediction on the q108 co-purchase graph: every " +
        "pair with a common neighbor scored sum(1/ln(deg z)) in exact " +
        "micro (one correctly-rounded f64 term per neighbor, the q74 ln " +
        "convention), existing edges flagged — the recommendation/" +
        "link-spam baseline; pairs enumerate THROUGH the neighbor " +
        "(wedge-bounded, maxDeg-capped hubs, full-graph exact degrees), " +
        "never nodes^2"),

    // -------------------- temporal: gap-and-island interval merge
    "q251_interval_islands" -> Q(
      (s, dir) => {
        // per-event 10-minute attention windows merged into activity
        // episodes per user — the gaps-and-islands reduction
        val iv = Tables.events(s, dir).select(col("user_id"),
          unix_micros(col("ts")).as("s0"),
          (unix_micros(col("ts")) + lit(600000000L)).as("e0"))
        Temporal.mergeIslands(iv, "user_id", "s0", "e0")
          .orderBy(col("user_id"), col("island"))
      },
      Some("""WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
             |    epoch_us(ts) + 600000000 AS e FROM events),
             |w1 AS (SELECT user_id, s, e,
             |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
             |  FROM iv),
             |w2 AS (SELECT *, CASE WHEN prev_end IS NULL OR s > prev_end
             |    THEN 1 ELSE 0 END AS brk FROM w1),
             |w3 AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
             |    ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS island FROM w2)
             |SELECT user_id, CAST(island AS BIGINT) AS island,
             |  min(s) AS start_us, max(e) AS end_us,
             |  CAST(count(*) AS BIGINT) AS n_intervals,
             |  max(e) - min(s) AS covered_us
             |FROM w3 GROUP BY user_id, island
             |ORDER BY user_id, island""".stripMargin),
      "gap-and-island interval merge: per-event 10-minute attention " +
        "windows coalesce into per-user activity episodes (closed-touch " +
        "merges, exact integer micros) — the machine-uptime/coverage " +
        "reduction a plain groupBy cannot express; ONE window pass " +
        "partitioned by user (running max end + running break sum) and " +
        "one (user, island) aggregation, per-key parallel, no global sort"),

    // ---------------- graph: local clustering coefficient per node
    "q253_clustering_coeff" -> Q(
      (s, dir) => {
        // distinct (ok, pk) FIRST (the q129 rewrite): each (pa, pb, ok)
        // join row is then unique by construction, so the support count
        // is a plain count — the count_distinct expansion over the pair
        // fan-out drops away, and the self-join input shrinks
        val li = Tables.table(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val edges = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .groupBy(col("x.pk").as("pa"), col("y.pk").as("pb"))
          .agg(count(lit(1)).as("supp"))
          .filter(col("supp") >= 2)
        Graph.clusteringCoefficient(edges, "pa", "pb").orderBy(col("node"))
      },
      Some("""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |e AS (SELECT x.pk AS a, y.pk AS b
             |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
             |  GROUP BY 1, 2 HAVING count(DISTINCT x.ok) >= 2),
             |tri AS (SELECT e1.a AS u, e1.b AS p, e2.b AS q
             |  FROM e e1 JOIN e e2 ON e2.a = e1.b
             |            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
             |nodes AS (SELECT u AS node FROM tri
             |          UNION ALL SELECT p FROM tri
             |          UNION ALL SELECT q FROM tri),
             |tc AS (SELECT node, count(*) AS triangles FROM nodes GROUP BY 1),
             |dg AS (SELECT node, count(*) AS degree FROM (
             |  SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1)
             |SELECT dg.node, CAST(dg.degree AS BIGINT) AS degree,
             |  CAST(COALESCE(tc.triangles, 0) AS BIGINT) AS triangles,
             |  CAST(CASE WHEN dg.degree < 2 THEN -1
             |    ELSE (1000000 * 2 * COALESCE(tc.triangles, 0))
             |      // (dg.degree * (dg.degree - 1)) END AS BIGINT) AS cc_ppm
             |FROM dg LEFT JOIN tc USING (node) ORDER BY node""".stripMargin),
      "local clustering coefficient per node on the q108 co-purchase " +
        "graph — 2*triangles/(deg*(deg-1)) in exact ppm, degree<2 reads " +
        "the -1 sentinel; community-tightness/spam-ring density next to " +
        "triangles and k-core, costing one degree pass + one node join " +
        "over the triangle plan it composes"),

    // ---------------- graph: degree assortativity (Newman r)
    "q254_assortativity" -> Q(
      (s, dir) => {
        // distinct (ok, pk) FIRST (the q129 rewrite): each (pa, pb, ok)
        // join row is then unique by construction, so the support count
        // is a plain count — the count_distinct expansion over the pair
        // fan-out drops away, and the self-join input shrinks
        val li = Tables.table(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val edges = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .groupBy(col("x.pk").as("pa"), col("y.pk").as("pb"))
          .agg(count(lit(1)).as("supp"))
          .filter(col("supp") >= 2)
        Graph.degreeAssortativity(edges, "pa", "pb")
      },
      Some("""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |e AS (SELECT x.pk AS a, y.pk AS b
             |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
             |  GROUP BY 1, 2 HAVING count(DISTINCT x.ok) >= 2),
             |dg AS (SELECT node, count(*) AS d FROM (
             |  SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
             |tg AS (SELECT da.d AS da, db.d AS db
             |  FROM e JOIN dg da ON da.node = e.a JOIN dg db ON db.node = e.b),
             |sym AS (SELECT da AS u, db AS v FROM tg
             |        UNION ALL SELECT db, da FROM tg),
             |mm AS (SELECT count(*) AS m,
             |    sum(CAST(u AS HUGEINT)) AS su, sum(CAST(v AS HUGEINT)) AS sv,
             |    sum(CAST(u AS HUGEINT) * v) AS suv,
             |    sum(CAST(u AS HUGEINT) * u) AS suu,
             |    sum(CAST(v AS HUGEINT) * v) AS svv
             |  FROM sym)
             |SELECT CAST(m // 2 AS BIGINT) AS n_edges,
             |  CAST(CASE WHEN m * suu - su * su = 0 OR m * svv - sv * sv = 0
             |    THEN -2000000
             |    ELSE CAST(round(1e6 * CAST(m * suv - su * sv AS DOUBLE)
             |      / sqrt(CAST(m * suu - su * su AS DOUBLE)
             |        * CAST(m * svv - sv * sv AS DOUBLE))) AS BIGINT)
             |    END AS BIGINT) AS r_micro
             |FROM mm""".stripMargin),
      "degree assortativity (Newman r) of the co-purchase graph — the " +
        "Pearson correlation of endpoint degrees with each edge counted " +
        "both orientations: positive = hubs link hubs, negative = " +
        "hub-and-spoke; exact decimal moments, ONE f64 divide+sqrt " +
        "rounded to micro (q135 convention), -2e6 on a degree-regular " +
        "graph; one degree pass + two node joins + a 1-row reduce"),

    // --------------- survival: Nelson-Aalen cumulative hazard
    "q256_nelson_aalen" -> Q(
      (s, dir) =>
        EventAnalytics.nelsonAalen(
            Tables.events(s, dir), "user_id", "ts", "event_type",
            entryType = "view", eventType = "purchase",
            bucketMicros = 3600000000L)
          .orderBy(col("t")),
      Some("""WITH b AS (SELECT CAST(user_id AS BIGINT) AS u,
             |    epoch_us(ts) AS tsu, event_type AS et FROM events),
             |en AS (SELECT u, min(tsu) AS t0 FROM b WHERE et = 'view' GROUP BY 1),
             |ev AS (SELECT b.u, min(tsu) AS t1 FROM b JOIN en ON en.u = b.u
             |       WHERE et = 'purchase' AND tsu >= t0 GROUP BY 1),
             |cz AS (SELECT max(tsu) AS tmax FROM b),
             |dd AS (SELECT en.u, (COALESCE(t1, tmax) - t0) // 3600000000 AS t,
             |    CASE WHEN t1 IS NULL THEN 0 ELSE 1 END AS observed
             |  FROM en LEFT JOIN ev ON ev.u = en.u CROSS JOIN cz),
             |p AS (SELECT t, count(*) AS cnt, sum(observed) AS nd FROM dd GROUP BY 1),
             |w AS (SELECT *, sum(cnt) OVER () AS total,
             |    sum(cnt) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevc
             |  FROM p),
             |st AS (SELECT *, total - COALESCE(prevc, 0) AS n_risk,
             |    (1000000 * nd) // (total - COALESCE(prevc, 0)) AS step_ppm
             |  FROM w),
             |c AS (SELECT *, sum(step_ppm) OVER (ORDER BY t) AS cum FROM st)
             |SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
             |  CAST(nd AS BIGINT) AS n_events,
             |  CAST(step_ppm AS BIGINT) AS step_ppm,
             |  CAST(cum AS BIGINT) AS cum_hazard_ppm
             |FROM c WHERE nd > 0 ORDER BY t""".stripMargin),
      "Nelson-Aalen cumulative hazard of time-to-purchase (hourly " +
        "buckets from first view, right-censored) — the FULLY exact " +
        "survival companion to q201's Kaplan-Meier: H(t) = sum(d/n_risk) " +
        "needs no logarithm, so every value is a truncating integer " +
        "division summed in event order (no libm caveat anywhere); same " +
        "calendar-bounded risk table and the same loud duration-span " +
        "guard"),

    // --------------- series: Fano dispersion of daily arrival counts
    "q257_fano_dispersion" -> Q(
      (s, dir) =>
        EventAnalytics.fanoDispersion(
            Tables.events(s, dir), "ts", "event_type")
          .orderBy(col("grp")),
      Some("""WITH d AS (SELECT event_type AS grp,
             |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |    count(*) AS dc
             |  FROM events GROUP BY 1, 2),
             |ag AS (SELECT grp, count(*) AS n_days,
             |    CAST(sum(dc) AS HUGEINT) AS s,
             |    sum(CAST(dc AS HUGEINT) * dc) AS q
             |  FROM d GROUP BY 1)
             |SELECT grp, CAST(n_days AS BIGINT) AS n_days,
             |  CAST(CASE WHEN n_days < 2 OR s = 0 THEN -2000000
             |    ELSE (1000000::HUGEINT * s) // n_days END AS BIGINT) AS mean_micro,
             |  CAST(CASE WHEN n_days < 2 OR s = 0 THEN -2000000
             |    ELSE (1000000::HUGEINT * (n_days * q - s * s))
             |      // ((n_days - 1) * s) END AS BIGINT) AS fano_ppm
             |FROM ag ORDER BY grp""".stripMargin),
      "Fano dispersion index of each type's daily arrival counts — " +
        "variance-to-mean in exact ppm (Poisson reads ~1e6, bursty " +
        "traffic >>, metronomic bots <<), the daily-granularity twin of " +
        "q190's inter-arrival CV^2 and a natural q240 dailyStats " +
        "co-monitor: sample-variance-over-mean collapses to ONE " +
        "truncating division of exact integer moments per group"),

    // --------------- survival: restricted mean survival time
    "q267_rmst" -> Q(
      (s, dir) =>
        EventAnalytics.rmst(
          Tables.events(s, dir), "user_id", "ts", "event_type",
          entryType = "view", eventType = "purchase",
          bucketMicros = 3600000000L, tauBuckets = 200L),
      Some("""WITH b AS (SELECT CAST(user_id AS BIGINT) AS u,
             |    epoch_us(ts) AS tsu, event_type AS et FROM events),
             |en AS (SELECT u, min(tsu) AS t0 FROM b WHERE et = 'view' GROUP BY 1),
             |ev AS (SELECT b.u, min(tsu) AS t1 FROM b JOIN en ON en.u = b.u
             |       WHERE et = 'purchase' AND tsu >= t0 GROUP BY 1),
             |cz AS (SELECT max(tsu) AS tmax FROM b),
             |dd AS (SELECT en.u, (COALESCE(t1, tmax) - t0) // 3600000000 AS t,
             |    CASE WHEN t1 IS NULL THEN 0 ELSE 1 END AS observed
             |  FROM en LEFT JOIN ev ON ev.u = en.u CROSS JOIN cz),
             |p AS (SELECT t, count(*) AS cnt, sum(observed) AS nd FROM dd GROUP BY 1),
             |w AS (SELECT *, sum(cnt) OVER () AS total,
             |    sum(cnt) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevc
             |  FROM p),
             |st AS (SELECT *, total - COALESCE(prevc, 0) AS n_risk,
             |    CASE WHEN nd = 0 THEN 0
             |         WHEN total - COALESCE(prevc, 0) = nd THEN -46000000
             |         ELSE CAST(round(ln(CAST(total - COALESCE(prevc, 0) - nd AS DOUBLE)
             |           / (total - COALESCE(prevc, 0))) * 1e6) AS BIGINT) END AS step
             |  FROM w),
             |c AS (SELECT *, sum(step) OVER (ORDER BY t) AS lnsurv FROM st),
             |km AS (SELECT CAST(t AS BIGINT) AS t,
             |    CAST(round(exp(CAST(lnsurv AS DOUBLE) / 1e6) * 1e6) AS BIGINT)
             |      AS surv_ppm
             |  FROM c WHERE nd > 0),
             |sg AS (SELECT t, surv_ppm,
             |    least(COALESCE(lead(t) OVER (ORDER BY t), 200), 200)
             |      - least(t, 200) AS seg
             |  FROM km),
             |ag AS (SELECT COALESCE(min(least(t, 200)), 200) AS t_first_c,
             |    COALESCE(sum(CAST(surv_ppm AS HUGEINT) * seg), 0) AS tail_ppm,
             |    count(*) AS n_event_times
             |  FROM sg)
             |SELECT CAST(200 AS BIGINT) AS tau,
             |  CAST(n_event_times AS BIGINT) AS n_event_times,
             |  CAST(1000000::HUGEINT * t_first_c + tail_ppm AS BIGINT)
             |    AS rmst_ppm_buckets
             |FROM ag""".stripMargin),
      "restricted mean survival time at tau = 200 hourly buckets — the " +
        "one-number KM summary (mean buckets-to-purchase with " +
        "non-converters counted at full tau): the step-function integral " +
        "is exact products of KM's ppm values with clamped integer " +
        "segment widths, no new float steps; one lead/aggregate pass " +
        "over the time-resolution-bounded duration frame"),

    // --------------- Wald-Wolfowitz runs test on the daily series
    "q269_runs_test" -> Q(
      (s, dir) =>
        EventAnalytics.runsTest(
            Tables.events(s, dir), "ts", "value", "event_type")
          .orderBy(col("grp")),
      Some("""WITH d AS (SELECT event_type AS grp,
             |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |    sum(CAST(round(value * 1e6) AS BIGINT)) // count(*) AS dm
             |  FROM events GROUP BY 1, 2),
             |h AS (SELECT grp, dm, count(*) AS c FROM d GROUP BY 1, 2),
             |w AS (SELECT grp, dm,
             |    sum(c) OVER (PARTITION BY grp ORDER BY dm
             |      ROWS UNBOUNDED PRECEDING) AS cum,
             |    sum(c) OVER (PARTITION BY grp) AS ntot FROM h),
             |md AS (SELECT grp, min(dm) AS med FROM w
             |  WHERE cum >= (ntot + 1) // 2 GROUP BY 1),
             |sg AS (SELECT d.grp, d.day,
             |    CASE WHEN dm > med THEN 1 ELSE -1 END AS sg
             |  FROM d JOIN md ON md.grp = d.grp WHERE dm <> med),
             |ch AS (SELECT grp, sg,
             |    CASE WHEN lag(sg) OVER (PARTITION BY grp ORDER BY day)
             |        IS NULL
             |      OR lag(sg) OVER (PARTITION BY grp ORDER BY day) <> sg
             |      THEN 1 ELSE 0 END AS chg FROM sg),
             |ag AS (SELECT md.grp,
             |    coalesce(sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END), 0)
             |      AS n_pos,
             |    coalesce(sum(CASE WHEN sg = -1 THEN 1 ELSE 0 END), 0)
             |      AS n_neg,
             |    coalesce(sum(chg), 0) AS n_runs
             |  FROM md LEFT JOIN ch ON ch.grp = md.grp GROUP BY 1),
             |fin AS (SELECT grp, n_pos, n_neg, n_runs,
             |    CAST(n_pos AS HUGEINT) + n_neg AS nn,
             |    2 * CAST(n_pos AS HUGEINT) * n_neg AS m2 FROM ag),
             |gg AS (SELECT *, nn * (n_runs - 1) - m2 AS dn,
             |    m2 * (m2 - nn) AS vterm FROM fin)
             |SELECT grp, CAST(n_pos AS BIGINT) AS n_pos,
             |  CAST(n_neg AS BIGINT) AS n_neg,
             |  CAST(n_runs AS BIGINT) AS n_runs,
             |  CAST(CASE WHEN vterm <= 0 THEN -1
             |    WHEN 625 * dn * dn * (nn - 1) > 2401 * vterm THEN 0
             |    ELSE 1 END AS BIGINT) AS random_95
             |FROM gg ORDER BY grp""".stripMargin),
      "Wald-Wolfowitz runs test of each type's daily above/below-median " +
        "sign sequence — the assumption-free randomness screen " +
        "(clustered signs = trend/regime, alternating = overcorrection) " +
        "run before trusting i.i.d.-flavored alarms: exact lower median " +
        "from the value histogram (no global sort), runs from one lag, " +
        "verdict one cleared-denominator decimal comparison; everything " +
        "after dailyStats is calendar-bounded"),

    // --------------- turning-point randomness test on the daily series
    "q271_turning_points" -> Q(
      (s, dir) =>
        EventAnalytics.turningPoints(
            Tables.events(s, dir), "ts", "value", "event_type")
          .orderBy(col("grp")),
      Some("""WITH d AS (SELECT event_type AS grp,
             |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |    sum(CAST(round(value * 1e6) AS BIGINT)) // count(*) AS dm
             |  FROM events GROUP BY 1, 2),
             |l AS (SELECT grp, dm,
             |    lag(dm) OVER (PARTITION BY grp ORDER BY day) AS pv,
             |    lead(dm) OVER (PARTITION BY grp ORDER BY day) AS nx FROM d),
             |t AS (SELECT grp, CASE WHEN pv IS NOT NULL AND nx IS NOT NULL
             |    AND ((dm > pv AND dm > nx) OR (dm < pv AND dm < nx))
             |    THEN 1 ELSE 0 END AS tp FROM l),
             |ag AS (SELECT grp, count(*) AS n_days, sum(tp) AS n_turns
             |  FROM t GROUP BY 1),
             |f AS (SELECT grp, n_days, n_turns,
             |    3 * CAST(n_turns AS HUGEINT)
             |      - 2 * (CAST(n_days AS HUGEINT) - 2) AS dd FROM ag)
             |SELECT grp, CAST(n_days AS BIGINT) AS n_days,
             |  CAST(n_turns AS BIGINT) AS n_turns,
             |  CAST(CASE WHEN n_days < 3 THEN -1
             |    WHEN 625 * 10 * dd * dd >
             |      2401 * (16 * CAST(n_days AS HUGEINT) - 29) THEN 0
             |    ELSE 1 END AS BIGINT) AS random_95
             |FROM f ORDER BY grp""".stripMargin),
      "turning-point randomness test of each type's daily series — " +
        "strict local extrema counted against the i.i.d. expectation " +
        "2(n-2)/3 (too few = trend, too many = alternation), the q269 " +
        "runs-test co-screen that needs NO median; exact integer gate " +
        "10*q*D^2 vs p*(16n-29), one lag/lead window after dailyStats"),

    // --------------- Kendall tau-b across metric pairs
    "q273_kendall_pairs" -> Q(
      (s, dir) =>
        EventAnalytics.kendallTauPairs(
            Tables.events(s, dir), "ts", "value", "event_type")
          .orderBy(col("ga"), col("gb")),
      Some("""WITH d AS (SELECT event_type AS grp,
             |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |    sum(CAST(round(value * 1e6) AS BIGINT)) // count(*) AS dm
             |  FROM events GROUP BY 1, 2),
             |p AS (SELECT a.grp AS ga, b.grp AS gb, a.day,
             |    a.dm AS va, b.dm AS vb
             |  FROM d a JOIN d b USING (day) WHERE a.grp < b.grp),
             |dp AS (SELECT p1.ga, p1.gb,
             |    CASE WHEN p1.va > p2.va THEN 1 WHEN p1.va < p2.va THEN -1
             |      ELSE 0 END AS sa,
             |    CASE WHEN p1.vb > p2.vb THEN 1 WHEN p1.vb < p2.vb THEN -1
             |      ELSE 0 END AS sb
             |  FROM p p1 JOIN p p2 ON p1.ga = p2.ga AND p1.gb = p2.gb
             |    AND p1.day < p2.day),
             |ag AS (SELECT ga, gb, count(*) AS n0,
             |    sum(CASE WHEN sa * sb = 1 THEN 1 ELSE 0 END) AS c,
             |    sum(CASE WHEN sa * sb = -1 THEN 1 ELSE 0 END) AS disc,
             |    sum(CASE WHEN sa = 0 THEN 1 ELSE 0 END) AS tie_a,
             |    sum(CASE WHEN sb = 0 THEN 1 ELSE 0 END) AS tie_b
             |  FROM dp GROUP BY 1, 2)
             |SELECT ga, gb, CAST(n0 AS BIGINT) AS n0,
             |  CAST(c AS BIGINT) AS concordant,
             |  CAST(disc AS BIGINT) AS discordant,
             |  CAST(CASE WHEN n0 = tie_a OR n0 = tie_b THEN -2000000
             |    ELSE CAST(round(1e6 * (c - disc) /
             |      sqrt(CAST((n0 - tie_a) * (n0 - tie_b) AS DOUBLE)))
             |      AS BIGINT) END AS BIGINT) AS tau_b_micro
             |FROM ag ORDER BY ga, gb""".stripMargin),
      "Kendall tau-b between every pair of event types' daily series — " +
        "the cross-metric dependence monitor (Mann-Kendall is tau of one " +
        "series vs time; this is metric vs metric): exact concordant/" +
        "discordant/tie counts over the calendar-bounded day-pair join, " +
        "one f64 divide+sqrt at the end (q135 convention), -2e6 on a " +
        "constant series"),

    // --------------- Kaplan-Meier with Greenwood bands
    "q274_km_greenwood" -> Q(
      (s, dir) =>
        EventAnalytics.kaplanMeierCi(
            Tables.events(s, dir), "user_id", "ts", "event_type",
            entryType = "view", eventType = "purchase",
            bucketMicros = 3600000000L)
          .orderBy(col("t")),
      Some("""WITH b AS (SELECT CAST(user_id AS BIGINT) AS u,
             |    epoch_us(ts) AS tsu, event_type AS et FROM events),
             |en AS (SELECT u, min(tsu) AS t0 FROM b WHERE et = 'view' GROUP BY 1),
             |ev AS (SELECT b.u, min(tsu) AS t1 FROM b JOIN en ON en.u = b.u
             |       WHERE et = 'purchase' AND tsu >= t0 GROUP BY 1),
             |cz AS (SELECT max(tsu) AS tmax FROM b),
             |dd AS (SELECT en.u, (COALESCE(t1, tmax) - t0) // 3600000000 AS t,
             |    CASE WHEN t1 IS NULL THEN 0 ELSE 1 END AS observed
             |  FROM en LEFT JOIN ev ON ev.u = en.u CROSS JOIN cz),
             |p AS (SELECT t, count(*) AS cnt, sum(observed) AS nd FROM dd GROUP BY 1),
             |w AS (SELECT *, sum(cnt) OVER () AS total,
             |    sum(cnt) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevc
             |  FROM p),
             |st AS (SELECT *, total - COALESCE(prevc, 0) AS n_risk,
             |    CASE WHEN nd = 0 THEN 0
             |         WHEN total - COALESCE(prevc, 0) = nd THEN -46000000
             |         ELSE CAST(round(ln(CAST(total - COALESCE(prevc, 0) - nd AS DOUBLE)
             |           / (total - COALESCE(prevc, 0))) * 1e6) AS BIGINT) END AS step,
             |    CASE WHEN nd = 0 OR total - COALESCE(prevc, 0) = nd THEN 0
             |      ELSE CAST((1000000000000::HUGEINT * nd)
             |        // (CAST(total - COALESCE(prevc, 0) AS HUGEINT)
             |           * (total - COALESCE(prevc, 0) - nd)) AS BIGINT)
             |      END AS gstep
             |  FROM w),
             |c AS (SELECT *, sum(step) OVER (ORDER BY t) AS lnsurv,
             |    sum(gstep) OVER (ORDER BY t) AS gcum,
             |    max(CASE WHEN n_risk = nd AND nd > 0 THEN 1 ELSE 0 END)
             |      OVER (ORDER BY t) AS floored
             |  FROM st),
             |m AS (SELECT *,
             |    CAST(round(1.96 * sqrt(CAST(gcum AS DOUBLE))) AS BIGINT)
             |      AS margin FROM c)
             |SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
             |  CAST(nd AS BIGINT) AS n_events,
             |  CAST(round(exp(CAST(lnsurv AS DOUBLE) / 1e6) * 1e6) AS BIGINT)
             |    AS surv_ppm,
             |  CAST(CASE WHEN floored = 1 THEN -1 ELSE gcum END AS BIGINT)
             |    AS var_ln_pico,
             |  CAST(CASE WHEN floored = 1 THEN 0
             |    ELSE CAST(round(exp(CAST(lnsurv - margin AS DOUBLE) / 1e6)
             |      * 1e6) AS BIGINT) END AS BIGINT) AS lo_ppm,
             |  CAST(CASE WHEN floored = 1 THEN 0
             |    ELSE least(1000000, CAST(round(exp(CAST(lnsurv + margin
             |      AS DOUBLE) / 1e6) * 1e6) AS BIGINT)) END AS BIGINT)
             |    AS hi_ppm
             |FROM m WHERE nd > 0 ORDER BY t""".stripMargin),
      "Kaplan-Meier with Greenwood log-scale 95% bands — the reporting " +
        "form of q201: Var(ln S) as an exact pico-resolution integer " +
        "cumulative sum (10^12*d DIV n(n-d)), band = exp(lnS +- " +
        "1.96*sqrt(var)) with every libm step rounded to an integer " +
        "column before composing (both engines evaluate the identical " +
        "chain); full-conversion rows read the -1/0 band sentinels"),

    // --------------- competing-risks cumulative incidence
    "q275_competing_risks" -> Q(
      (s, dir) =>
        EventAnalytics.competingRisks(
            Tables.events(s, dir), "user_id", "ts", "event_type",
            entryType = "view", outcomeTypes = Seq("purchase", "error"),
            bucketMicros = 3600000000L)
          .orderBy(col("t")),
      Some("""WITH b AS (SELECT CAST(user_id AS BIGINT) AS u,
             |    epoch_us(ts) AS tsu, event_type AS et FROM events),
             |en AS (SELECT u, min(tsu) AS t0 FROM b WHERE et = 'view' GROUP BY 1),
             |ev AS (SELECT b.u, min(tsu) AS t1 FROM b JOIN en ON en.u = b.u
             |       WHERE et IN ('purchase', 'error') AND tsu >= t0 GROUP BY 1),
             |oc AS (SELECT b.u, min(b.et) AS outcome
             |  FROM b JOIN en ON en.u = b.u JOIN ev ON ev.u = b.u
             |  WHERE b.et IN ('purchase', 'error') AND b.tsu = ev.t1
             |    AND b.tsu >= en.t0 GROUP BY 1),
             |cz AS (SELECT max(tsu) AS tmax FROM b),
             |dd AS (SELECT en.u,
             |    (COALESCE(ev.t1, cz.tmax) - t0) // 3600000000 AS t,
             |    oc.outcome
             |  FROM en LEFT JOIN ev ON ev.u = en.u
             |    LEFT JOIN oc ON oc.u = en.u CROSS JOIN cz),
             |p AS (SELECT t, count(*) AS cnt,
             |    sum(CASE WHEN outcome IS NOT NULL THEN 1 ELSE 0 END) AS dt,
             |    sum(CASE WHEN outcome = 'purchase' THEN 1 ELSE 0 END) AS dp,
             |    sum(CASE WHEN outcome = 'error' THEN 1 ELSE 0 END) AS de
             |  FROM dd GROUP BY 1),
             |w AS (SELECT *, sum(cnt) OVER () AS total,
             |    sum(cnt) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND 1 PRECEDING) AS prevc FROM p),
             |st AS (SELECT *, total - COALESCE(prevc, 0) AS n_risk,
             |    CASE WHEN dt = 0 THEN 0
             |         WHEN total - COALESCE(prevc, 0) = dt THEN -46000000
             |         ELSE CAST(round(ln(CAST(total - COALESCE(prevc, 0) - dt
             |           AS DOUBLE) / (total - COALESCE(prevc, 0))) * 1e6)
             |           AS BIGINT) END AS step
             |  FROM w),
             |c AS (SELECT *, sum(step) OVER (ORDER BY t) AS lnsurv FROM st),
             |sp AS (SELECT *, CAST(round(exp(CAST(COALESCE(
             |      lag(lnsurv) OVER (ORDER BY t), 0) AS DOUBLE) / 1e6) * 1e6)
             |      AS BIGINT) AS surv_prev FROM c),
             |ci AS (SELECT *,
             |    sum((surv_prev * dp) // n_risk) OVER (ORDER BY t) AS cif_p,
             |    sum((surv_prev * de) // n_risk) OVER (ORDER BY t) AS cif_e
             |  FROM sp)
             |SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
             |  CAST(dt AS BIGINT) AS d_total,
             |  CAST(dp AS BIGINT) AS d_purchase, CAST(de AS BIGINT) AS d_error,
             |  CAST(cif_p AS BIGINT) AS cif_purchase_ppm,
             |  CAST(cif_e AS BIGINT) AS cif_error_ppm
             |FROM ci WHERE dt > 0 ORDER BY t""".stripMargin),
      "competing-risks cumulative incidence (Aalen-Johansen) of purchase " +
        "vs error from first view — per-outcome 1-KM curves overstate " +
        "incidence when outcomes compete; the CIF splits each bucket's " +
        "hazard by outcome against the overall survival: exact integer " +
        "steps (surv_prev*d_k) DIV n_risk over the KM ln-chain, " +
        "first-event outcome with struct-min tie-break"),

    // --------------- KM survival quantiles
    "q276_km_quantiles" -> Q(
      (s, dir) =>
        EventAnalytics.kmQuantiles(
          Tables.events(s, dir), "user_id", "ts", "event_type",
          entryType = "view", eventType = "purchase",
          bucketMicros = 3600000000L),
      Some("""WITH b AS (SELECT CAST(user_id AS BIGINT) AS u,
             |    epoch_us(ts) AS tsu, event_type AS et FROM events),
             |en AS (SELECT u, min(tsu) AS t0 FROM b WHERE et = 'view' GROUP BY 1),
             |ev AS (SELECT b.u, min(tsu) AS t1 FROM b JOIN en ON en.u = b.u
             |       WHERE et = 'purchase' AND tsu >= t0 GROUP BY 1),
             |cz AS (SELECT max(tsu) AS tmax FROM b),
             |dd AS (SELECT en.u, (COALESCE(t1, tmax) - t0) // 3600000000 AS t,
             |    CASE WHEN t1 IS NULL THEN 0 ELSE 1 END AS observed
             |  FROM en LEFT JOIN ev ON ev.u = en.u CROSS JOIN cz),
             |p AS (SELECT t, count(*) AS cnt, sum(observed) AS nd FROM dd GROUP BY 1),
             |w AS (SELECT *, sum(cnt) OVER () AS total,
             |    sum(cnt) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevc
             |  FROM p),
             |st AS (SELECT *, total - COALESCE(prevc, 0) AS n_risk,
             |    CASE WHEN nd = 0 THEN 0
             |         WHEN total - COALESCE(prevc, 0) = nd THEN -46000000
             |         ELSE CAST(round(ln(CAST(total - COALESCE(prevc, 0) - nd AS DOUBLE)
             |           / (total - COALESCE(prevc, 0))) * 1e6) AS BIGINT) END AS step
             |  FROM w),
             |c AS (SELECT *, sum(step) OVER (ORDER BY t) AS lnsurv FROM st),
             |km AS (SELECT CAST(t AS BIGINT) AS t,
             |    CAST(round(exp(CAST(lnsurv AS DOUBLE) / 1e6) * 1e6) AS BIGINT)
             |      AS surv_ppm
             |  FROM c WHERE nd > 0)
             |SELECT
             |  COALESCE(min(CASE WHEN surv_ppm <= 750000 THEN t END), -1) AS t_q25,
             |  COALESCE(min(CASE WHEN surv_ppm <= 500000 THEN t END), -1) AS t_median,
             |  COALESCE(min(CASE WHEN surv_ppm <= 250000 THEN t END), -1) AS t_q75,
             |  CAST(count(*) AS BIGINT) AS n_event_times
             |FROM km""".stripMargin),
      "KM survival quantiles — first bucket where S drops to 75/50/25% " +
        "(how long until a quarter/half/three-quarters convert), -1 when " +
        "the curve never reaches the level inside the window (the honest " +
        "answer censoring-naive percentiles get wrong); exact integer " +
        "comparisons on q201's pinned surv_ppm")
  )
}

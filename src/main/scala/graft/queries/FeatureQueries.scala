package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{ChangeCapture, Dedup, EventAnalytics, FeatureEng, Graph, Temporal}

/** Round-8 queries (q123-q131): feature engineering (quantile binning,
  * leave-one-out target encoding, k-fold assignment, winsorization,
  * session co-occurrence pairs, integer-lag cross-correlation), plurality
  * label-propagation communities, the bucket-blocked interval overlap
  * join, and sparse TF-IDF cosine near-dup pairs. Every emitted signal is
  * exact integer fixed point (micro values, rational-rank bins,
  * md5-derived folds, clear-denominator cosine gates) so both engines
  * hash-match bit-for-bit.
  */
object FeatureQueries {

  // first-8-hex-chars-of-md5 -> integer, the CurationQueries hex fold
  // (mirrors Spark's conv(substring(md5(x), 1, 8), 16, 10); both < 2^32)
  private def hex8(e: String): String =
    s"""list_reduce(list_transform(generate_series(1, 8),
       |      i -> strpos('0123456789abcdef', substring($e, i, 1)) - 1),
       |      (a, x) -> a * 16 + x)""".stripMargin

  val queries: Seq[(String, Q)] = Seq(

    // ------------------------------------------------- quantile binning
    "q123_quantile_bin" -> Q(
      (s, dir) =>
        FeatureEng.quantileBin(
            Tables.events(s, dir), "event_type", "value", "event_id", nBins = 10)
          .orderBy(col("id")),
      Some("""WITH e AS (SELECT event_id AS id, event_type AS grp,
             |    CAST(round(value * 1e6) AS BIGINT) AS xm FROM events),
             |r AS (SELECT *,
             |    row_number() OVER (PARTITION BY grp ORDER BY xm, id) AS rn,
             |    count(*) OVER (PARTITION BY grp) AS n FROM e)
             |SELECT id, grp, xm AS value_micro,
             |  CAST((10 * (rn - 1)) // n AS BIGINT) AS bin
             |FROM r ORDER BY id""".stripMargin),
      "equal-frequency decile binning per event type via the exact rational rank ratio " +
        "(10*(rn-1)) DIV n — the portable ntile; one exchange on the group key"),

    // -------------------------------------------- leave-one-out target encoding
    "q124_target_encode" -> Q(
      (s, dir) =>
        FeatureEng.targetEncode(
            Tables.events(s, dir), "event_type", "value", "event_id")
          .orderBy(col("id")),
      Some("""WITH e AS (SELECT event_id AS id, event_type AS cat,
             |    CAST(round(value * 1e6) AS BIGINT) AS tm FROM events),
             |a AS (SELECT *, count(*) OVER (PARTITION BY cat) AS n,
             |    sum(tm) OVER (PARTITION BY cat) AS s FROM e)
             |SELECT id, cat, tm AS target_micro,
             |  CAST(CASE WHEN n = 1 THEN -1 ELSE (s - tm) // (n - 1) END
             |    AS BIGINT) AS loo_mean_micro
             |FROM a ORDER BY id""".stripMargin),
      "leave-one-out category mean of the target in micro fixed point — the leakage-" +
        "guarded categorical encoding; one window over the category key, -1 sentinel " +
        "for peerless singletons"),

    // --------------------------------------------------- k-fold assignment
    "q125_kfold" -> Q(
      (s, dir) =>
        FeatureEng.kFoldAssign(
            Tables.events(s, dir).select(col("event_id"), col("user_id")),
            "event_id", k = 5)
          .orderBy(col("event_id")),
      Some(s"""SELECT event_id, user_id,
              |  CAST(${hex8("md5(CAST(event_id AS VARCHAR))")} % 5 AS BIGINT) AS fold
              |FROM events ORDER BY event_id""".stripMargin),
      "deterministic 5-fold cross-validation assignment from md5(id) — stateless, " +
        "map-only, rerun/repartition/growth stable (the hashSplit family)"),

    // -------------------------------------------------------- winsorization
    "q126_winsorize" -> Q(
      (s, dir) =>
        FeatureEng.winsorize(
            Tables.events(s, dir), "event_type", "value", "event_id",
            lowBps = 500, highBps = 9500)
          .orderBy(col("id")),
      Some("""WITH e AS (SELECT event_id AS id, event_type AS grp,
             |    CAST(round(value * 1e6) AS BIGINT) AS xm FROM events),
             |r AS (SELECT *,
             |    row_number() OVER (PARTITION BY grp ORDER BY xm, id) AS rn,
             |    count(*) OVER (PARTITION BY grp) AS n FROM e),
             |c AS (SELECT grp,
             |    min(CASE WHEN rn >= greatest(1, (500 * n + 9999) // 10000)
             |        THEN xm END) AS lo,
             |    min(CASE WHEN rn >= greatest(1, (9500 * n + 9999) // 10000)
             |        THEN xm END) AS hi
             |  FROM r GROUP BY grp)
             |SELECT r.id, r.grp, r.xm AS value_micro,
             |  greatest(c.lo, least(c.hi, r.xm)) AS winsorized_micro
             |FROM r JOIN c USING (grp) ORDER BY id""".stripMargin),
      "p5/p95 percentile clamping per event type with the explicit discrete-rank cut " +
        "(q81's percentile convention as exact integers) — tail-robust features that " +
        "keep the row count"),

    // --------------------------------------- session co-occurrence pairs
    "q127_cooccurrence" -> Q(
      (s, dir) =>
        FeatureEng.cooccurrencePairs(
            Tables.events(s, dir).withColumn("tsu", unix_micros(col("ts"))),
            "user_id", "event_type", "tsu", "event_id", windowSize = 2)
          .orderBy(col("item_a"), col("item_b")),
      Some("""WITH e AS (SELECT user_id AS sess, event_type AS item,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, event_id AS id
             |  FROM events),
             |p AS (SELECT *, row_number() OVER (PARTITION BY sess
             |    ORDER BY tsu, id) AS pos FROM e)
             |SELECT a.item AS item_a, b.item AS item_b,
             |  CAST(count(*) AS BIGINT) AS n_pairs
             |FROM p a JOIN p b ON a.sess = b.sess
             |  AND b.pos - a.pos BETWEEN 1 AND 2
             |GROUP BY 1, 2 ORDER BY item_a, item_b""".stripMargin),
      "skip-gram co-occurrence counts (window 2) within per-user event streams — the " +
        "item2vec training-pair generator; position window + session equi-join, fan-out " +
        "n*w per session, never all-pairs"),

    // ---------------------------------------------- cross-correlation lags
    "q128_crosscorr" -> Q(
      (s, dir) =>
        FeatureEng.crossCorrelation(
            Tables.events(s, dir).withColumn("tsu", unix_micros(col("ts"))),
            "event_type", "tsu", typeA = "view", typeB = "purchase",
            bucketMicros = 3600000000L, maxLag = 24)
          .orderBy(col("lag")),
      Some("""WITH e AS (SELECT event_type AS et,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS bucket
             |  FROM events),
             |a AS (SELECT bucket, count(*) AS cnt FROM e WHERE et = 'view' GROUP BY 1),
             |b AS (SELECT bucket, count(*) AS cnt FROM e WHERE et = 'purchase' GROUP BY 1),
             |l AS (SELECT a.bucket, a.cnt AS cnt_a, t.lag
             |      FROM a CROSS JOIN generate_series(0, 24) t(lag))
             |SELECT lag, CAST(sum(cnt_a * b.cnt) AS BIGINT) AS score,
             |  CAST(count(*) AS BIGINT) AS n_terms
             |FROM l JOIN b ON b.bucket = l.bucket + l.lag
             |GROUP BY lag ORDER BY lag""".stripMargin),
      "exact-integer cross-correlation of hourly view/purchase count series at lags " +
        "0..24h — lead/lag structure detection before lagged-feature construction; " +
        "lag-expanded bucket equi-join, bounded by time span not event volume"),

    // -------------------------------------- label-propagation communities
    "q129_label_prop" -> Q(
      (s, dir) => {
        // distinct (ok, pk) FIRST: each (pa, pb, ok) join row is then
        // unique by construction, so the support count is a plain count —
        // the count_distinct expansion over the pair fan-out (the dominant
        // cost of this query; ~|order|² rows per order) drops away
        val li = Tables.table(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val edges = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .groupBy(col("x.pk").as("pa"), col("y.pk").as("pb"))
          .agg(count(lit(1)).as("supp"))
          .filter(col("supp") >= 2)
        Graph.labelPropagation(edges, "pa", "pb", rounds = 3).orderBy(col("node"))
      },
      // the oracle unrolls the 3 synchronous rounds; argmax by
      // (votes desc, label asc) via row_number — the exact tie rule the
      // operator's lexicographic struct-min implements
      Some {
        def round(r: Int): String =
          s"""v$r AS (SELECT adj.node, l.label, count(*) AS votes
             |  FROM adj JOIN l${r - 1} l ON l.node = adj.nbr GROUP BY 1, 2),
             |l$r AS MATERIALIZED (SELECT node, label FROM (
             |  SELECT node, label, row_number() OVER (PARTITION BY node
             |    ORDER BY votes DESC, label ASC) AS rn FROM v$r) WHERE rn = 1)""".stripMargin
        s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           |e0 AS MATERIALIZED (SELECT x.pk AS a, y.pk AS b
           |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
           |  GROUP BY 1, 2 HAVING count(DISTINCT x.ok) >= 2),
           |adj AS MATERIALIZED (SELECT a AS node, b AS nbr FROM e0
           |  UNION ALL SELECT b, a FROM e0),
           |l0 AS (SELECT DISTINCT node, node AS label FROM adj),
           |${(1 to 3).map(round).mkString(",\n")}
           |SELECT node, label FROM l3 ORDER BY node""".stripMargin
      },
      "synchronous plurality label propagation (3 rounds, smallest-label ties) over " +
        "the co-purchase graph — dense-community detection inside components; per " +
        "round one adjacency join + two keyed aggs over a checkpointed edge list"),

    // -------------------------------------------- interval overlap join
    "q130_overlap_join" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir).withColumn("tsu", unix_micros(col("ts")))
        val sess = EventAnalytics.sessionize(
            ev, "user_id", "tsu", "event_id", gapMicros = 6L * 3600L * 1000000L)
          .groupBy(col("user"), col("session_idx"))
          .agg(min(col("tsu")).as("sa"), (max(col("tsu")) + 1).as("ea"))
        val pdays = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("user"),
            expr("unix_micros(ts) DIV 86400000000").as("day"))
          .distinct()
          .withColumn("sb", col("day") * 86400000000L)
          .withColumn("eb", (col("day") + 1) * 86400000000L)
        Temporal.overlapJoin(sess, pdays, "user",
            "session_idx", "sa", "ea", "day", "sb", "eb",
            bucketMicros = 6L * 3600L * 1000000L)
          .withColumnRenamed("id_a", "session")
          .withColumnRenamed("id_b", "day")
          .orderBy(col("user"), col("session"), col("day"))
      },
      // the oracle is the plain theta join (viable at test scale only);
      // the operator's bucket blocking + canonical-bucket dedup must
      // reproduce it exactly
      Some("""WITH e AS (SELECT user_id AS u, event_type AS et, event_id AS id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu FROM events),
             |m AS (SELECT *, CASE WHEN lag(tsu) OVER w IS NULL
             |      OR tsu - lag(tsu) OVER w > 21600000000 THEN 1 ELSE 0 END AS ns
             |  FROM e WINDOW w AS (PARTITION BY u ORDER BY tsu, id)),
             |sx AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY u ORDER BY tsu, id
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM m),
             |sess AS (SELECT u, sid, min(tsu) AS sa, max(tsu) + 1 AS ea
             |         FROM sx GROUP BY 1, 2),
             |pd AS (SELECT DISTINCT u, tsu // 86400000000 AS day
             |       FROM e WHERE et = 'purchase'),
             |pdi AS (SELECT u, day, day * 86400000000 AS sb,
             |        (day + 1) * 86400000000 AS eb FROM pd)
             |SELECT s.u AS user, s.sid AS session, p.day,
             |  least(s.ea, p.eb) - greatest(s.sa, p.sb) AS overlap_us
             |FROM sess s JOIN pdi p ON s.u = p.u AND s.sa < p.eb AND p.sb < s.ea
             |ORDER BY user, session, day""".stripMargin),
      "bucket-blocked interval overlap join: which user sessions overlap which " +
        "purchase days — time-bucket equi-join with the canonical-bucket dedup-free " +
        "emit, never a per-key theta join; exact intersection lengths"),

    // --------------------------------------- sparse TF-IDF cosine pairs
    "q131_tfidf_cosine" -> Q(
      (s, dir) =>
        Dedup.tfidfCosinePairs(Tables.table(s, dir, "documents"),
            "text", "doc_id", thresholdP = 4, thresholdQ = 5)
          .orderBy(col("id_a"), col("id_b")),
      Some("""WITH toks AS (
             |  SELECT doc_id AS doc,
             |    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |      t -> len(t) > 0)) AS tok
             |  FROM documents),
             |tf AS (SELECT doc, tok, least(CAST(count(*) AS BIGINT), 255) AS tf
             |       FROM toks GROUP BY 1, 2),
             |n1 AS (SELECT count(*) + 1 AS n1 FROM documents),
             |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok
             |        HAVING count(*) <= 1000),
             |idf AS (SELECT tok, idf_milli FROM (
             |    SELECT tok, CAST(round(1000 * ln(n1.n1 / (df + 1))) AS BIGINT)
             |      AS idf_milli FROM dfq CROSS JOIN n1)
             |  WHERE idf_milli > 0),
             |w AS (SELECT tf.doc, tf.tok, tf.tf * idf.idf_milli AS w
             |      FROM tf JOIN idf USING (tok)),
             |ss AS (SELECT doc, sum(CAST(w AS HUGEINT) * w) AS ss FROM w GROUP BY doc),
             |sn AS (SELECT a.doc AS id_a, b.doc AS id_b,
             |    sum(CAST(a.w AS HUGEINT) * b.w) AS s
             |  FROM w a JOIN w b ON a.tok = b.tok AND a.doc < b.doc GROUP BY 1, 2)
             |SELECT id_a, id_b, CAST(s AS BIGINT) AS dot,
             |  CAST(sa.ss AS BIGINT) AS ss_a, CAST(sb.ss AS BIGINT) AS ss_b
             |FROM sn JOIN ss sa ON sa.doc = sn.id_a JOIN ss sb ON sb.doc = sn.id_b
             |WHERE s > 0 AND 25 * s * s >= 16 * sa.ss * sb.ss
             |ORDER BY id_a, id_b""".stripMargin),
      "sparse TF-IDF cosine near-dup pairs (cos >= 4/5) over the df-capped inverted " +
        "index: integer milli-idf weights, exact clear-denominator gate 25*S^2 >= " +
        "16*SSa*SSb — the lexical cousin of embedding near-dups, never all-pairs"),

    // ------------------------------------------------- PSI drift monitor
    "q132_psi_drift" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir).withColumn("tsu", unix_micros(col("ts")))
        val cut = 1705363200000000L // 2024-01-16T00:00:00Z in micros
        FeatureEng.psi(ev.filter(col("tsu") < cut), ev.filter(col("tsu") >= cut),
            "event_type", "value", binWidthMicro = 50000000L)
          .orderBy(col("grp"))
      },
      Some("""WITH e AS (SELECT event_type AS grp,
             |    CAST(round(value * 1e6) AS BIGINT) // 50000000 AS bin,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu FROM events),
             |r AS (SELECT grp, bin, count(*) AS c FROM e
             |      WHERE tsu < 1705363200000000 GROUP BY 1, 2),
             |u AS (SELECT grp, bin, count(*) AS d FROM e
             |      WHERE tsu >= 1705363200000000 GROUP BY 1, 2),
             |mg AS (SELECT COALESCE(r.grp, u.grp) AS grp,
             |    COALESCE(r.bin, u.bin) AS bin,
             |    COALESCE(c, 0) AS c, COALESCE(d, 0) AS d
             |  FROM r FULL OUTER JOIN u ON r.grp = u.grp AND r.bin = u.bin),
             |w AS (SELECT *, sum(c) OVER (PARTITION BY grp) AS n,
             |    sum(d) OVER (PARTITION BY grp) AS m,
             |    count(*) OVER (PARTITION BY grp) AS nb FROM mg),
             |t AS (SELECT grp,
             |    CAST(round(1e6 * ((c + 1) / (n + nb) - (d + 1) / (m + nb))
             |      * ln(((c + 1) / (n + nb)) / ((d + 1) / (m + nb)))) AS BIGINT)
             |      AS term, nb, n, m FROM w)
             |SELECT grp, CAST(sum(term) AS BIGINT) AS psi_micro,
             |  CAST(max(nb) AS BIGINT) AS n_bins,
             |  CAST(max(n) AS BIGINT) AS n_ref, CAST(max(m) AS BIGINT) AS n_cur
             |FROM t GROUP BY grp ORDER BY grp""".stripMargin),
      "Population Stability Index of the value distribution (50-unit bins, +1 " +
        "smoothing) between the first and second half of the corpus per event type — " +
        "the feature-drift monitor; per-bin ln terms rounded to integer micro before " +
        "the order-independent sum (q74/q82 pattern)"),

    // ---------------------------------------------- ancestor closure
    "q133_ancestors" -> Q(
      (s, dir) => {
        // 3-level synthetic hierarchy over the user population: user ->
        // user-block (10M+u DIV 10) -> block-group (20M + ...), the
        // category-tree shape; closure must surface depth-2 ancestors
        val u = Tables.events(s, dir).select(col("user_id").as("usr")).distinct()
        val e1 = u.select(col("usr").as("child"),
          (lit(10000000L) + expr("usr DIV 10")).as("parent"))
        val e2 = u.select((lit(10000000L) + expr("usr DIV 10")).as("child"),
            (lit(20000000L) + expr("(usr DIV 10) DIV 10")).as("parent"))
          .distinct()
        graft.operators.Graph.ancestorClosure(
            e1.unionByName(e2), "child", "parent", maxDepth = 4)
          .orderBy(col("node"), col("ancestor"))
      },
      Some("""WITH u AS (SELECT DISTINCT user_id AS usr FROM events),
             |e1 AS (SELECT usr AS child, 10000000 + usr // 10 AS parent FROM u),
             |e2 AS (SELECT DISTINCT 10000000 + usr // 10 AS child,
             |       20000000 + (usr // 10) // 10 AS parent FROM u),
             |e AS (SELECT DISTINCT child, parent FROM
             |      (SELECT * FROM e1 UNION ALL SELECT * FROM e2)),
             |c1 AS (SELECT child AS node, parent AS ancestor,
             |       CAST(1 AS BIGINT) AS depth FROM e),
             |c2 AS (SELECT a.child AS node, b.parent AS ancestor,
             |       CAST(2 AS BIGINT) AS depth FROM e a JOIN e b ON a.parent = b.child)
             |SELECT node, ancestor, min(depth) AS depth FROM
             |  (SELECT * FROM c1 UNION ALL SELECT * FROM c2)
             |GROUP BY 1, 2 ORDER BY node, ancestor""".stripMargin),
      "transitive ancestor closure of the 3-level user hierarchy (doubling joins, " +
        "min-hop depth, cycle guard) — the category-tree flattening a catalog or " +
        "org-chart rollup needs; log-rounds, never a per-level loop"),

    // ---------------------------------------------- rolling distinct actives
    "q134_rolling_actives" -> Q(
      (s, dir) =>
        graft.operators.EventAnalytics.rollingActives(
            Tables.events(s, dir).withColumn("tsu", unix_micros(col("ts"))),
            "user_id", "tsu", windowDays = 7)
          .orderBy(col("day")),
      Some("""WITH a AS (SELECT DISTINCT user_id AS u,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
             |mx AS (SELECT max(day) AS md FROM a),
             |c AS (SELECT a.u, a.day + t.o AS day
             |      FROM a CROSS JOIN generate_series(0, 6) t(o) CROSS JOIN mx
             |      WHERE a.day + t.o <= mx.md),
             |wau AS (SELECT day, CAST(count(DISTINCT u) AS BIGINT) AS active_7d
             |        FROM c GROUP BY day),
             |dau AS (SELECT day, CAST(count(DISTINCT u) AS BIGINT) AS dau
             |        FROM a GROUP BY day)
             |SELECT wau.day, COALESCE(dau.dau, 0) AS dau, wau.active_7d
             |FROM wau LEFT JOIN dau USING (day) ORDER BY day""".stripMargin),
      "rolling 7-day distinct active users per day (DAU + WAU) via contribution " +
        "fan-out — sliding COUNT DISTINCT doesn't decompose into window frames; " +
        "fan-out bounded by the window length, dedup to (user, day) happens first"),

    // ------------------------------------------------ Pearson correlation
    "q135_corr" -> Q(
      (s, dir) =>
        FeatureEng.corrPearson(
            Tables.events(s, dir)
              .withColumn("tsu", unix_micros(col("ts")))
              .withColumn("hour", expr("(tsu DIV 3600000000) % 24")),
            "event_type", "value", "hour")
          .orderBy(col("grp")),
      Some("""WITH e AS (SELECT event_type AS grp,
             |    CAST(round(value * 1e3) AS BIGINT) AS x,
             |    (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS y
             |  FROM events),
             |m AS (SELECT grp, count(*) AS n,
             |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             |    sum(CAST(x AS HUGEINT) * y) AS sxy,
             |    sum(CAST(x AS HUGEINT) * x) AS sxx,
             |    sum(CAST(y AS HUGEINT) * y) AS syy
             |  FROM e GROUP BY grp)
             |SELECT grp, CAST(n AS BIGINT) AS n,
             |  CAST(CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
             |    THEN -1000000
             |    ELSE CAST(round(1e6 * CAST(n * sxy - sx * sy AS DOUBLE)
             |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
             |        * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
             |    END AS BIGINT) AS corr_micro
             |FROM m ORDER BY grp""".stripMargin),
      "per-type Pearson correlation of value vs hour-of-day: exact decimal(38,0) " +
        "moment sums (order-independent), one f64 division+sqrt at the very end " +
        "rounded to micro (the q34 cosine convention); -1e6 sentinel for zero variance"),

    // ------------------------------------------------ Spearman correlation
    "q158_spearman" -> Q(
      (s, dir) =>
        FeatureEng.corrSpearman(
            Tables.events(s, dir).withColumn("k",
              get_json_object(col("props"), "$.k").cast("bigint")),
            "event_type", "value", "k")
          .orderBy(col("grp")),
      Some("""WITH e AS (SELECT event_type AS grp,
             |    CAST(round(value * 1e6) AS BIGINT) AS xv,
             |    CAST(round(CAST(json_extract_string(props, '$.k') AS DOUBLE) * 1e6)
             |      AS BIGINT) AS yv
             |  FROM events),
             |r AS (SELECT grp,
             |    2 * rank() OVER (PARTITION BY grp ORDER BY xv)
             |      + count(*) OVER (PARTITION BY grp, xv) - 1 AS x,
             |    2 * rank() OVER (PARTITION BY grp ORDER BY yv)
             |      + count(*) OVER (PARTITION BY grp, yv) - 1 AS y
             |  FROM e),
             |m AS (SELECT grp, count(*) AS n,
             |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             |    sum(CAST(x AS HUGEINT) * y) AS sxy,
             |    sum(CAST(x AS HUGEINT) * x) AS sxx,
             |    sum(CAST(y AS HUGEINT) * y) AS syy
             |  FROM r GROUP BY grp)
             |SELECT grp, CAST(n AS BIGINT) AS n,
             |  CAST(CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
             |    THEN -2000000
             |    ELSE CAST(round(1e6 * CAST(n * sxy - sx * sy AS DOUBLE)
             |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
             |        * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
             |    END AS BIGINT) AS spearman_micro
             |FROM m ORDER BY grp""".stripMargin),
      "per-type Spearman rank correlation of value vs props.k: doubled average " +
        "ranks stay exact integers under ties, then the corrPearson moment " +
        "pipeline; -2e6 sentinel (outside the correlation range) for zero variance"),

    // ------------------------------------------------- bitemporal as-of
    "q136_bitemporal" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // balance versions become KNOWN one day after they become valid
        // (the late-arriving dimension): what the pipeline knew at ship
        // time differs from what was true at ship time — q117 answers
        // the valid-time question, this answers the knowledge-time one
        val o = Tables.table(s, dir, "orders")
        val hist = o.select(col("o_custkey").as("k"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("vf"),
            col("o_totalprice"), col("o_orderkey"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("k"), col("vf")).orderBy(col("o_orderkey").desc)))
          .filter(col("rn") === 1)
          .withColumn("vt", lead(col("vf"), 1).over(
            Window.partitionBy(col("k")).orderBy(col("vf"))))
          .select(col("k"), col("vf"), col("vt"),
            (col("vf") + 86400000000L).as("tf"),
            lit(null).cast("bigint").as("tt"),
            round(col("o_totalprice") * lit(100)).cast("bigint").as("bal_cents"))
        val probe = Tables.table(s, dir, "lineitem")
          .join(o.select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("lo"),
            col("l_linenumber").cast("bigint").as("ln"),
            col("o_custkey").as("k"),
            unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
        ChangeCapture.bitemporalAsOf(probe, hist, "k", "ship_us", "ship_us",
            "vf", "vt", "tf", "tt", Seq("bal_cents"))
          .select(col("lo"), col("ln"), col("k"), col("ship_us"),
            coalesce(col("bal_cents"), lit(-1L)).as("bal_cents"))
          .orderBy(col("lo"), col("ln"))
      },
      Some("""WITH h0 AS (
             |  SELECT o_custkey AS k, epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS vf,
             |    o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey, o_orderdate
             |      ORDER BY o_orderkey DESC) AS rn
             |  FROM orders),
             |h1 AS (SELECT k, vf, CAST(round(o_totalprice * 100) AS BIGINT) AS bal
             |       FROM h0 WHERE rn = 1),
             |h AS (SELECT k, vf, lead(vf) OVER (PARTITION BY k ORDER BY vf) AS vt,
             |      vf + 86400000000 AS tf, bal FROM h1),
             |p AS (SELECT l.l_orderkey AS lo, CAST(l.l_linenumber AS BIGINT) AS ln,
             |    o.o_custkey AS k, epoch_us(CAST(l.l_shipdate AS TIMESTAMP)) AS ts
             |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
             |SELECT p.lo, p.ln, p.k, p.ts AS ship_us,
             |  COALESCE(h.bal, -1) AS bal_cents
             |FROM p LEFT JOIN h ON h.k = p.k AND h.vf <= p.ts
             |  AND (h.vt IS NULL OR p.ts < h.vt) AND h.tf <= p.ts
             |ORDER BY lo, ln""".stripMargin),
      "bitemporal as-of: the balance KNOWN at ship time about the value VALID at ship " +
        "time, with versions recorded a day late — differs from q117's valid-time " +
        "answer exactly where knowledge lagged; valid-tiling makes the match unique"),

    // ---------------------------------------------- negative sampling
    "q137_neg_samples" -> Q(
      (s, dir) => {
        val li = Tables.table(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        // q129 rewrite for the pair build only — the vocabulary argument
        // below keeps the raw frame, so negativeSamples' input is unchanged
        val liD = li.distinct()
        val pairs = liD.as("x").join(liD.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .groupBy(col("x.pk").as("pa"), col("y.pk").as("pb"))
          .agg(count(lit(1)).as("supp"))
          .filter(col("supp") >= 2)
        FeatureEng.negativeSamples(pairs, "pa", "pb",
            li.select(col("pk")), "pk", k = 4)
          .orderBy(col("item_a"), col("item_b"), col("neg_rank"))
      },
      Some(s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
              |e AS (SELECT x.pk AS a, y.pk AS b
              |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
              |  GROUP BY 1, 2 HAVING count(DISTINCT x.ok) >= 2),
              |v AS (SELECT pk AS item, row_number() OVER (ORDER BY pk) - 1 AS idx
              |      FROM (SELECT DISTINCT pk FROM li)),
              |nv AS (SELECT count(*) AS nv FROM v),
              |p AS (SELECT a AS item_a, b AS item_b, t.i AS neg_rank,
              |    ${hex8("md5(a || ':' || b || ':' || t.i)")} % nv.nv AS idx
              |  FROM e CROSS JOIN generate_series(0, 3) t(i) CROSS JOIN nv)
              |SELECT item_a, item_b, neg_rank, v.item AS neg_item,
              |  CAST(v.item = item_a OR v.item = item_b AS BIGINT) AS collides
              |FROM p JOIN v USING (idx)
              |ORDER BY item_a, item_b, neg_rank""".stripMargin),
      "deterministic md5-derived negative sampling (k=4) over the part vocabulary for " +
        "the co-purchase training pairs — rerun/engine-stable draws, flagged (never " +
        "resampled) accidental hits; catalog-sized vocab rank broadcast to the pairs"),

    // ------------------------------------------- resample + forward fill
    "q138_resample_ffill" -> Q(
      (s, dir) =>
        FeatureEng.resampleFfill(
            Tables.events(s, dir).withColumn("tsu", unix_micros(col("ts"))),
            "event_type", "tsu", "value", "event_id",
            bucketMicros = 3600000000L)
          .orderBy(col("grp"), col("bucket")),
      Some("""WITH e0 AS (SELECT event_type AS grp,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS bucket,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, event_id AS id,
             |    CAST(round(value * 1e6) AS BIGINT) AS vm
             |  FROM events),
             |b AS (SELECT grp, bucket, vm FROM (
             |    SELECT grp, bucket, vm, row_number() OVER (
             |      PARTITION BY grp, bucket ORDER BY tsu DESC, id DESC) AS rn
             |    FROM e0) WHERE rn = 1),
             |s AS (SELECT grp, min(bucket) AS b0, max(bucket) AS b1
             |      FROM b GROUP BY grp),
             |g AS (SELECT grp, unnest(generate_series(b0, b1)) AS bucket FROM s),
             |j AS (SELECT g.grp, g.bucket, b.vm
             |      FROM g LEFT JOIN b ON b.grp = g.grp AND b.bucket = g.bucket)
             |SELECT grp, bucket,
             |  COALESCE(last_value(vm IGNORE NULLS) OVER (PARTITION BY grp
             |    ORDER BY bucket ROWS UNBOUNDED PRECEDING), -1) AS value_micro,
             |  CAST(vm IS NOT NULL AS BIGINT) AS observed
             |FROM j ORDER BY grp, bucket""".stripMargin),
      "hourly regular-grid resampling with forward fill per event type: last " +
        "observation per bucket by deterministic (ts, id) max, span-bounded grid " +
        "explode, carry-forward window — the regularizer every downstream " +
        "time-series model assumes; -1 sentinel for unreachable leading gaps"),

    // ------------------------------------------------ session journey paths
    "q139_session_paths" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir).withColumn("tsu", unix_micros(col("ts")))
        val sess = EventAnalytics.sessionize(
          ev, "user_id", "tsu", "event_id", gapMicros = 6L * 3600L * 1000000L)
        val tagged = ev.select(col("event_id").as("id"), col("event_type"))
          .join(sess, Seq("id"))
          .withColumn("skey", concat(col("user"), lit("#"), col("session_idx")))
        EventAnalytics.sessionPaths(tagged, "skey", "event_type", "tsu", "id",
            maxSteps = 5)
          .orderBy(col("n_sessions").desc, col("path"))
      },
      Some("""WITH e AS (
             |  SELECT event_id AS id, user_id AS u, event_type AS et,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu
             |  FROM events),
             |m AS (SELECT *, CASE WHEN lag(tsu) OVER w IS NULL
             |      OR tsu - lag(tsu) OVER w > 21600000000 THEN 1 ELSE 0 END AS ns
             |  FROM e WINDOW w AS (PARTITION BY u ORDER BY tsu, id)),
             |sx AS (SELECT *, sum(ns) OVER (PARTITION BY u ORDER BY tsu, id
             |    ROWS UNBOUNDED PRECEDING) AS sid FROM m),
             |p AS (SELECT u, sid,
             |    array_to_string(list_slice(list(et ORDER BY tsu, id), 1, 5), '>')
             |      AS path
             |  FROM sx GROUP BY u, sid)
             |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
             |FROM p GROUP BY path ORDER BY n_sessions DESC, path""".stripMargin),
      "top user-journey paths: first 5 ordered event types per 6h-gap session, " +
        "counted across sessions — the opening product-analytics report; ordered " +
        "per-session collect + path count, cardinality bounded by truncation"),

    // ------------------------------------------------ A/B significance test
    "q140_ab_test" -> Q(
      (s, dir) => {
        // arms by md5 parity of user id (the hashSplit convention — the
        // assignment any engine can reproduce); per event-type metric,
        // x = distinct users in the arm who did it, n = arm size
        val ev = Tables.events(s, dir)
        val users = ev.select(col("user_id").as("u")).distinct()
          .withColumn("arm",
            conv(substring(md5(col("u").cast("string")), 1, 8), 16, 10)
              .cast("bigint") % 2)
        val tot = users.agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"))
        val hits = ev.select(col("event_type").as("metric"), col("user_id").as("u"))
          .distinct()
          .join(users, Seq("u"))
          .groupBy(col("metric"))
          .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("x1"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("x2"))
          .crossJoin(broadcast(tot))
        FeatureEng.abTest(hits, "metric", "x1", "n1", "x2", "n2")
          .orderBy(col("metric"))
      },
      Some(s"""WITH u AS (SELECT DISTINCT user_id AS u FROM events),
              |ua AS (SELECT u, ${hex8("md5(CAST(u AS VARCHAR))")} % 2 AS arm FROM u),
              |tot AS (SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n1,
              |        sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n2 FROM ua),
              |h AS (SELECT DISTINCT event_type AS metric, user_id AS u FROM events),
              |hx AS (SELECT metric,
              |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS x1,
              |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS x2
              |  FROM h JOIN ua USING (u) GROUP BY metric),
              |j AS (SELECT metric, CAST(x1 AS HUGEINT) AS x1, CAST(n1 AS HUGEINT) AS n1,
              |      CAST(x2 AS HUGEINT) AS x2, CAST(n2 AS HUGEINT) AS n2
              |      FROM hx CROSS JOIN tot)
              |SELECT metric, CAST(x1 AS BIGINT) AS x1, CAST(n1 AS BIGINT) AS n1,
              |  CAST(x2 AS BIGINT) AS x2, CAST(n2 AS BIGINT) AS n2,
              |  CAST(CASE WHEN x1 * n2 > x2 * n1 THEN 1
              |            WHEN x1 * n2 < x2 * n1 THEN -1 ELSE 0 END AS BIGINT)
              |    AS lift_sign,
              |  CAST((x1 + x2) > 0 AND (x1 + x2) < (n1 + n2) AND
              |    625 * (x1 * n2 - x2 * n1) * (x1 * n2 - x2 * n1) * (n1 + n2) >=
              |    2401 * n1 * n2 * (x1 + x2) * (n1 + n2 - x1 - x2)
              |    AS BIGINT) AS significant
              |FROM j ORDER BY metric""".stripMargin),
      "exact-integer two-proportion A/B test (95%, 1.96^2 = 2401/625) per event-type " +
        "metric over md5-parity user arms — the experimentation readout with a " +
        "clear-denominator verdict no float z-score can flip (q93 pattern)"),

    // -------------------------------------------------- OLS trend slope
    "q182_trend_slope" -> Q(
      (s, dir) =>
        graft.operators.FeatureEng.trendSlope(
            Tables.events(s, dir)
              .select(col("event_type"),
                expr("unix_timestamp(ts) DIV 86400").as("day"))
              .groupBy(col("event_type"), col("day"))
              .agg(count(lit(1)).as("y")),
            "event_type", "day", "y")
          .orderBy(col("grp")),
      Some("""WITH d AS (SELECT event_type AS grp,
             |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS x,
             |    CAST(count(*) AS BIGINT) AS y
             |  FROM events GROUP BY 1, 2),
             |m AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
             |    sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
             |    sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx
             |  FROM d GROUP BY 1),
             |f AS (SELECT *, n * sxx - sx * sx AS den FROM m)
             |SELECT grp, n,
             |  CAST(CASE WHEN den = 0 THEN 1 ELSE 0 END AS BIGINT) AS degenerate,
             |  CAST(CASE WHEN den = 0 THEN 0
             |    ELSE (1000000::HUGEINT * (n * sxy - sx * sy)) // den
             |    END AS BIGINT) AS slope_micro,
             |  CAST(CASE WHEN den = 0 THEN 0
             |    ELSE (1000000::HUGEINT * (sy * sxx - sx * sxy)) // den
             |    END AS BIGINT) AS intercept_micro
             |FROM f ORDER BY grp""".stripMargin),
      "per-type OLS trend of daily event volume (slope and intercept as exact " +
        "integer micro via decimal-cleared moment sums, truncation-matched DIV) " +
        "— the is-this-source-growing monitor; corpus to five moments per group " +
        "in one pass after the (type, day) pre-aggregation"),

    // --------------------------------------------- bootstrap CI for mean
    "q184_bootstrap_ci" -> Q(
      (s, dir) =>
        graft.operators.FeatureEng.bootstrapCiMean(
            Tables.events(s, dir)
              .select(col("event_type"),
                get_json_object(col("props"), "$.k").cast("bigint").as("x"),
                col("event_id")),
            "event_type", "x", "event_id", reps = 32)
          .orderBy(col("grp")),
      Some(s"""WITH e AS (SELECT event_type AS grp,
              |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS x,
              |    event_id AS id
              |  FROM events),
              |xr AS (SELECT grp, x, id, g.rep FROM e
              |  CROSS JOIN generate_series(1, 32) AS g(rep)),
              |w AS (SELECT grp, rep, x,
              |    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
              |         WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
              |         WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
              |         WHEN u < 999917 THEN 6 WHEN u < 999990 THEN 7
              |         WHEN u < 999999 THEN 8 ELSE 9 END AS k
              |  FROM (SELECT grp, rep, x,
              |      ${hex8("md5('boot:' || CAST(rep AS VARCHAR) || ':' || CAST(id AS VARCHAR))")} % 1000000 AS u
              |    FROM xr)),
              |rm AS (SELECT grp, rep,
              |    (1000000::HUGEINT * sum(k * x)) // sum(k) AS m
              |  FROM w GROUP BY 1, 2 HAVING sum(k) > 0),
              |r AS (SELECT *, row_number() OVER (PARTITION BY grp ORDER BY m, rep) AS rk,
              |    count(*) OVER (PARTITION BY grp) AS nr FROM rm),
              |ci AS (SELECT grp, max(nr) AS n_reps,
              |    min(CASE WHEN rk = (25 * nr + 999) // 1000 THEN m END) AS lo,
              |    min(CASE WHEN rk = (975 * nr + 999) // 1000 THEN m END) AS hi
              |  FROM r GROUP BY 1),
              |g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
              |    (1000000::HUGEINT * sum(x)) // count(*) AS mean FROM e GROUP BY 1)
              |SELECT g.grp, n, CAST(mean AS BIGINT) AS mean_micro,
              |  CAST(COALESCE(n_reps, 0) AS BIGINT) AS n_reps,
              |  CAST(COALESCE(lo, mean) AS BIGINT) AS lo_micro,
              |  CAST(COALESCE(hi, mean) AS BIGINT) AS hi_micro
              |FROM g LEFT JOIN ci USING (grp) ORDER BY g.grp""".stripMargin),
      "deterministic Poissonized bootstrap 95% CI for the per-type mean of " +
        "props.k (md5-derived Poisson(1) weights, 32 replicas, discrete-rank " +
        "percentiles) — the uncertainty bar every metric comparison needs; " +
        "map-only ladder expansion then one (grp, rep) aggregation"),

    // --------------------------------------- smoothed target encoding
    "q186_smoothed_encoding" -> Q(
      (s, dir) =>
        graft.operators.FeatureEng.encodingTableSmoothed(
            Tables.events(s, dir)
              .select(concat(col("event_type"), lit(":"),
                (col("user_id") % 50).cast("string")).as("cat"),
                col("value")),
            "cat", "value", m = 20L)
          .orderBy(col("cat")),
      Some("""WITH b AS (SELECT event_type || ':' || CAST(user_id % 50 AS VARCHAR) AS cat,
             |    CAST(round(value * 1e6) AS BIGINT) AS tm FROM events),
             |g AS (SELECT sum(tm::HUGEINT) // count(*) AS gm FROM b),
             |c AS (SELECT cat, CAST(count(*) AS BIGINT) AS n_rows,
             |    sum(tm::HUGEINT) AS s FROM b GROUP BY 1)
             |SELECT cat, CAST((s + 20 * gm) // (n_rows + 20) AS BIGINT) AS mean_micro,
             |  n_rows
             |FROM c CROSS JOIN g ORDER BY cat""".stripMargin),
      "m-estimate smoothed target-encoding table over the long-tail " +
        "(type, user-cohort) categories: rare cells shrink toward the global " +
        "prior with pseudo-count 20 (exact integer two-stage rounding) — the " +
        "leak-resistant production form of q124; serves through the same " +
        "applyEncoding broadcast join, batch or streaming"),

    // --------------------------------------------- A/B power analysis
    "q196_ab_power" -> Q(
      (s, dir) => {
        // q140's md5-parity arms and per-metric counts, graded for POWER
        // instead of significance: what effect size could this experiment
        // even see?
        val ev = Tables.events(s, dir)
        val users = ev.select(col("user_id").as("u")).distinct()
          .withColumn("arm",
            conv(substring(md5(col("u").cast("string")), 1, 8), 16, 10)
              .cast("bigint") % 2)
        val tot = users.agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"))
        val hits = ev.select(col("event_type").as("metric"), col("user_id").as("u"))
          .distinct()
          .join(users, Seq("u"))
          .groupBy(col("metric"))
          .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("x1"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("x2"))
          .crossJoin(broadcast(tot))
        FeatureEng.abPower(hits, "metric", "x1", "n1", "x2", "n2")
          .orderBy(col("metric"))
      },
      Some(s"""WITH u AS (SELECT DISTINCT user_id AS u FROM events),
              |ua AS (SELECT u, ${hex8("md5(CAST(u AS VARCHAR))")} % 2 AS arm FROM u),
              |tot AS (SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n1,
              |        sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n2 FROM ua),
              |h AS (SELECT DISTINCT event_type AS metric, user_id AS u FROM events),
              |hx AS (SELECT metric,
              |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS x1,
              |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS x2
              |  FROM h JOIN ua USING (u) GROUP BY 1),
              |j AS (SELECT metric, x1, x2, n1, n2,
              |    CAST(x1 + x2 AS DOUBLE) / (n1 + n2) AS p_pool
              |  FROM hx CROSS JOIN tot)
              |SELECT metric, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
              |  CAST((1000000 * x1) // n1 AS BIGINT) AS rate1_ppm,
              |  CAST((1000000 * x2) // n2 AS BIGINT) AS rate2_ppm,
              |  CAST(round(abs(CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2) * 1e6) AS BIGINT) AS observed_delta_ppm,
              |  CAST(round(2.801585 * sqrt(p_pool * (1.0 - p_pool)
              |    * (1.0 / n1 + 1.0 / n2)) * 1e6) AS BIGINT) AS mde_ppm
              |FROM j ORDER BY metric""".stripMargin),
      "A/B power analysis over the q140 arms: minimum detectable effect at " +
        "80% power / 95% confidence (z quantiles as micro literals, one " +
        "fixed-order sqrt) next to the observed delta — 'not significant' on " +
        "an underpowered metric is silence, not evidence; pure map over the " +
        "per-metric count table"),

    // --------------------------------------------- stratified k-fold
    "q187_stratified_kfold" -> Q(
      (s, dir) =>
        graft.operators.FeatureEng.stratifiedKFold(
            Tables.events(s, dir).select(col("event_id"), col("event_type")),
            "event_type", "event_id", k = 5)
          .orderBy(col("id")),
      Some("""WITH e AS (SELECT event_id AS id, event_type AS stratum,
             |    md5('skf:' || CAST(event_id AS VARCHAR)) AS h
             |  FROM events)
             |SELECT id, stratum,
             |  CAST((row_number() OVER (PARTITION BY stratum ORDER BY h, id) - 1) % 5 AS BIGINT) AS fold
             |FROM e ORDER BY id""".stripMargin),
      "stratified 5-fold assignment: md5-ranked within each event-type stratum " +
        "then round-robin, so every (stratum, fold) cell is exactly balanced " +
        "(plain hash-mod leaves small strata lopsided right where validation " +
        "is noisiest); one parallel per-stratum rank window"),

    // ----------------------------- experiments: post-stratified ATE
    "q222_stratified_ate" -> Q(
      (s, dir) =>
        FeatureEng.stratifiedAte(
          Tables.events(s, dir)
            .withColumn("arm",
              conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
                .cast("bigint") % 2),
          "arm", "event_type", "value"),
      Some(s"""WITH e AS (SELECT event_type AS st,
             |    ${hex8("md5(CAST(user_id AS VARCHAR))")} % 2 AS arm,
             |    CAST(round(value * 1e6) AS BIGINT) AS ym
             |  FROM events),
             |cell AS (SELECT st,
             |    count(*) FILTER (WHERE arm = 0) AS n0,
             |    COALESCE(sum(ym) FILTER (WHERE arm = 0), 0) AS s0,
             |    count(*) FILTER (WHERE arm = 1) AS n1,
             |    COALESCE(sum(ym) FILTER (WHERE arm = 1), 0) AS s1
             |  FROM e GROUP BY 1),
             |agg AS (SELECT
             |    COALESCE(sum(n0 + n1), 0) AS n_rows,
             |    COALESCE(sum(n1), 0) AS n_treat,
             |    COALESCE(sum(n0), 0) AS n_control,
             |    COALESCE(sum(s1), 0) AS stt,
             |    COALESCE(sum(s0), 0) AS sc,
             |    count(*) AS n_strata,
             |    count(*) FILTER (WHERE n0 > 0 AND n1 > 0) AS n_used,
             |    COALESCE(sum((n0 + n1)::HUGEINT * (s1 // n1 - s0 // n0))
             |      FILTER (WHERE n0 > 0 AND n1 > 0), 0) AS wd,
             |    COALESCE(sum(n0 + n1) FILTER (WHERE n0 > 0 AND n1 > 0), 0) AS wsum
             |  FROM cell)
             |SELECT CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST(n_treat AS BIGINT) AS n_treat,
             |  CAST(n_control AS BIGINT) AS n_control,
             |  CAST(n_strata AS BIGINT) AS n_strata,
             |  CAST(n_used AS BIGINT) AS n_strata_used,
             |  CAST(CASE WHEN n_treat = 0 OR n_control = 0 THEN -2000000
             |    ELSE stt // n_treat - sc // n_control END AS BIGINT)
             |    AS unadjusted_diff_micro,
             |  CAST(CASE WHEN n_used = 0 THEN -2000000
             |    ELSE wd // wsum END AS BIGINT) AS ate_micro
             |FROM agg""".stripMargin),
      "post-stratified average treatment effect over the md5-assigned " +
        "pseudo-experiment (arms by user hash, strata by event type): " +
        "per-stratum arm-mean differences reweighted by stratum size, " +
        "emitted next to the naive difference so composition confounding " +
        "is visible; one (stratum, arm) aggregation then stratum-bounded " +
        "reductions, exact micro integer arithmetic throughout"),

    // ------------------- stats: Spearman rank correlation per group
    "q237_spearman" -> Q(
      (s, dir) =>
        graft.operators.FeatureEng.spearmanCorr(
            Tables.table(s, dir, "lineitem"), "l_returnflag",
            "l_quantity", "l_extendedprice")
          .orderBy(col("grp")),
      Some("""WITH b AS (SELECT l_returnflag AS grp,
             |    CAST(round(l_quantity * 1e6) AS BIGINT) AS xm,
             |    CAST(round(l_extendedprice * 1e6) AS BIGINT) AS ym
             |  FROM lineitem),
             |r AS (SELECT grp,
             |    2 * rank() OVER (PARTITION BY grp ORDER BY xm)
             |      + count(*) OVER (PARTITION BY grp, xm) - 1 AS x,
             |    2 * rank() OVER (PARTITION BY grp ORDER BY ym)
             |      + count(*) OVER (PARTITION BY grp, ym) - 1 AS y
             |  FROM b),
             |m AS (SELECT grp, count(*) AS n,
             |    sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
             |    sum(x::HUGEINT * y) AS sxy,
             |    sum(x::HUGEINT * x) AS sxx,
             |    sum(y::HUGEINT * y) AS syy
             |  FROM r GROUP BY 1)
             |SELECT grp, CAST(n AS BIGINT) AS n_rows,
             |  CAST(CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
             |    THEN -1000000
             |    ELSE CAST(round(1e6 * CAST(n * sxy - sx * sy AS DOUBLE)
             |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
             |        * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
             |    END AS BIGINT) AS rho_micro
             |FROM m ORDER BY grp""".stripMargin),
      "Spearman rank correlation of quantity vs extended price per " +
        "return flag — the monotone-invariant companion of the q135 " +
        "Pearson family, exact under ties via doubled average ranks " +
        "(2*rank_min + t - 1, integer for any tie width, Pearson " +
        "invariant to the common x2); group-partitioned rank windows + " +
        "one moment aggregation, one f64 divide+sqrt rounded to micro " +
        "(q227 convention)"),

    // -------------------- stats: jackknife SE of a ratio metric
    "q243_jackknife_ratio" -> Q(
      (s, dir) =>
        graft.operators.FeatureEng.jackknifeRatio(
            Tables.table(s, dir, "lineitem"), "l_returnflag",
            "l_extendedprice", "l_quantity")
          .orderBy(col("grp")),
      Some("""WITH b AS (SELECT l_returnflag AS grp,
             |    CAST(round(l_extendedprice * 1e6) AS BIGINT) AS nm,
             |    CAST(round(l_quantity * 1e6) AS BIGINT) AS dm
             |  FROM lineitem),
             |t AS (SELECT grp, count(*) AS n, sum(nm) AS sn,
             |    sum(dm) AS sd FROM b GROUP BY 1),
             |ps AS (SELECT b.grp, t.n, t.sn, t.sd,
             |    CASE WHEN t.sd - b.dm = 0 THEN 1 ELSE 0 END AS bad,
             |    CASE WHEN t.sd - b.dm = 0 THEN 0
             |      ELSE CAST(round(1e6 * CAST(t.sn - b.nm AS DOUBLE)
             |        / CAST(t.sd - b.dm AS DOUBLE)) AS BIGINT) END AS r_i
             |  FROM b JOIN t ON t.grp = b.grp),
             |m AS (SELECT grp, max(n) AS n_rows, max(sn) AS sn,
             |    max(sd) AS sd, sum(bad) AS n_bad,
             |    sum(r_i::HUGEINT) AS sr, sum(r_i::HUGEINT * r_i) AS srr
             |  FROM ps GROUP BY 1)
             |SELECT grp, CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST(CASE WHEN sd = 0 THEN -1
             |    ELSE CAST(round(1e6 * CAST(sn AS DOUBLE)
             |      / CAST(sd AS DOUBLE)) AS BIGINT) END AS BIGINT)
             |    AS ratio_micro,
             |  CAST(CASE WHEN n_rows < 2 OR n_bad > 0 OR sd = 0 THEN -1
             |    ELSE CAST(round(sqrt((CAST(n_rows AS DOUBLE) - 1)
             |      * CAST(n_rows * srr - sr * sr AS DOUBLE)
             |      / CAST(n_rows AS DOUBLE) / n_rows)) AS BIGINT)
             |    END AS BIGINT) AS jk_se_micro
             |FROM m ORDER BY grp""".stripMargin),
      "jackknife standard error of price-per-unit-shipped per return " +
        "flag — the correct error bar for RATIO metrics (numerator and " +
        "denominator covary, so the naive per-row variance is wrong); " +
        "leave-one-out is closed-form for ratios, so the whole " +
        "jackknife is one broadcast-totals pass + one moment " +
        "aggregation: each pseudo-estimate is ONE deterministic f64 " +
        "divide rounded to micro, the SE one final sqrt (q227 " +
        "convention); sentinels for n<2 / zero leave-one-out " +
        "denominators"),

    // --------------- stats: Cochran-Mantel-Haenszel stratified 2x2
    "q244_cmh_test" -> Q(
      (s, dir) =>
        FeatureEng.cmhTest(
          Tables.events(s, dir)
            .withColumn("arm",
              conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
                .cast("bigint") % 2)
            .withColumn("hit", (col("value") >= 500.0).cast("bigint")),
          "event_type", "arm", "hit"),
      Some(s"""WITH e AS (SELECT event_type AS st,
             |    ${hex8("md5(CAST(user_id AS VARCHAR))")} % 2 AS arm,
             |    CASE WHEN value >= 500 THEN 1 ELSE 0 END AS outc
             |  FROM events),
             |cell AS (SELECT st, count(*) AS t, sum(arm) AS n1,
             |    sum(outc) AS m1, sum(arm * outc) AS a
             |  FROM e GROUP BY 1),
             |term AS (SELECT *,
             |    CASE WHEN t >= 2 THEN 1 ELSE 0 END AS ok,
             |    CASE WHEN t >= 2 THEN
             |      CAST(round(1e6 * (n1::DOUBLE * m1) / t) AS BIGINT)
             |      ELSE 0 END AS e_micro,
             |    CASE WHEN t >= 2 THEN
             |      CAST(round(1e12 * CAST(n1::HUGEINT * (t - n1) * m1
             |          * (t - m1) AS DOUBLE)
             |        / CAST(t::HUGEINT * t * (t - 1) AS DOUBLE)) AS HUGEINT)
             |      ELSE 0 END AS v_micro2,
             |    CASE WHEN t >= 2 THEN
             |      CAST(round(1e6 * (a::DOUBLE * (t - n1 - m1 + a)) / t)
             |        AS BIGINT) ELSE 0 END AS ad_micro,
             |    CASE WHEN t >= 2 THEN
             |      CAST(round(1e6 * ((n1 - a)::DOUBLE * (m1 - a)) / t)
             |        AS BIGINT) ELSE 0 END AS bc_micro
             |  FROM cell),
             |agg AS (SELECT count(*) AS n_strata,
             |    COALESCE(sum(ok), 0) AS n_used,
             |    COALESCE(sum(CASE WHEN ok = 1
             |      THEN 1000000 * a - e_micro ELSE 0 END), 0) AS d,
             |    COALESCE(sum(v_micro2), 0) AS v,
             |    COALESCE(sum(ad_micro), 0) AS s_ad,
             |    COALESCE(sum(bc_micro), 0) AS s_bc
             |  FROM term)
             |SELECT CAST(n_strata AS BIGINT) AS n_strata,
             |  CAST(n_used AS BIGINT) AS n_used,
             |  CAST(d AS BIGINT) AS d_micro, CAST(v AS BIGINT) AS var_micro2,
             |  CAST(CASE WHEN v = 0 THEN -1
             |    ELSE CAST(round(1e6
             |      * CAST(greatest(0, abs(d) - 500000)::HUGEINT
             |        * greatest(0, abs(d) - 500000) AS DOUBLE)
             |      / CAST(v AS DOUBLE)) AS BIGINT) END AS BIGINT)
             |    AS cmh_micro,
             |  CAST(CASE WHEN s_bc = 0 THEN -1
             |    ELSE CAST(round(1e6 * CAST(s_ad AS DOUBLE)
             |      / CAST(s_bc AS DOUBLE)) AS BIGINT) END AS BIGINT)
             |    AS or_mh_micro
             |FROM agg""".stripMargin),
      "Cochran-Mantel-Haenszel stratified 2x2 test over the md5-armed " +
        "pseudo-experiment (outcome = value >= 500, strata = event " +
        "type): continuity-corrected chi-square and the MH pooled odds " +
        "ratio, per-stratum expected/variance/odds terms micro-rounded " +
        "with ONE deterministic f64 divide each — the proportions " +
        "companion of q222 that survives Simpson's-paradox composition; " +
        "one stratum aggregation then strata-bounded reduction"),

    // ------------------- difference-in-differences over a 2x2 panel
    "q255_diff_in_diff" -> Q(
      (s, dir) => {
        // arms by md5 parity of user id (the q140 assignment), periods
        // split at the corpus midpoint date
        val ev = Tables.events(s, dir)
          .withColumn("arm",
            conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
              .cast("bigint") % 2)
          .withColumn("per",
            (col("ts") >= to_timestamp(lit("2024-01-16"))).cast("bigint"))
        FeatureEng.diffInDiff(ev, "arm", "per", "value")
      },
      Some(s"""WITH e AS (SELECT
              |    ${hex8("md5(CAST(user_id AS VARCHAR))")} % 2 AS arm,
              |    CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS per,
              |    CAST(round(value * 1e6) AS BIGINT) AS ym
              |  FROM events),
              |ag AS (SELECT
              |    sum(CASE WHEN arm = 0 AND per = 0 THEN 1 ELSE 0 END) AS n_c0,
              |    CAST(sum(CASE WHEN arm = 0 AND per = 0 THEN ym ELSE 0 END) AS HUGEINT) AS s_c0,
              |    sum(CASE WHEN arm = 0 AND per = 1 THEN 1 ELSE 0 END) AS n_c1,
              |    CAST(sum(CASE WHEN arm = 0 AND per = 1 THEN ym ELSE 0 END) AS HUGEINT) AS s_c1,
              |    sum(CASE WHEN arm = 1 AND per = 0 THEN 1 ELSE 0 END) AS n_t0,
              |    CAST(sum(CASE WHEN arm = 1 AND per = 0 THEN ym ELSE 0 END) AS HUGEINT) AS s_t0,
              |    sum(CASE WHEN arm = 1 AND per = 1 THEN 1 ELSE 0 END) AS n_t1,
              |    CAST(sum(CASE WHEN arm = 1 AND per = 1 THEN ym ELSE 0 END) AS HUGEINT) AS s_t1
              |  FROM e)
              |SELECT CAST(n_c0 AS BIGINT) AS n_c0,
              |  CAST(CASE WHEN n_c0 = 0 THEN -2000000 ELSE s_c0 // n_c0 END AS BIGINT) AS mean_c0_micro,
              |  CAST(n_c1 AS BIGINT) AS n_c1,
              |  CAST(CASE WHEN n_c1 = 0 THEN -2000000 ELSE s_c1 // n_c1 END AS BIGINT) AS mean_c1_micro,
              |  CAST(n_t0 AS BIGINT) AS n_t0,
              |  CAST(CASE WHEN n_t0 = 0 THEN -2000000 ELSE s_t0 // n_t0 END AS BIGINT) AS mean_t0_micro,
              |  CAST(n_t1 AS BIGINT) AS n_t1,
              |  CAST(CASE WHEN n_t1 = 0 THEN -2000000 ELSE s_t1 // n_t1 END AS BIGINT) AS mean_t1_micro,
              |  CAST(CASE WHEN n_c0 = 0 OR n_c1 = 0 OR n_t0 = 0 OR n_t1 = 0
              |    THEN -2000000
              |    ELSE (s_t1 // n_t1 - s_t0 // n_t0) - (s_c1 // n_c1 - s_c0 // n_c0)
              |    END AS BIGINT) AS did_micro
              |FROM ag""".stripMargin),
      "difference-in-differences over the 2x2 (md5-parity arm x " +
        "midpoint-date period) panel — the quasi-experimental estimand " +
        "when randomization isn't available: four truncating integer " +
        "cell means (the dailyStats dm convention) and their double " +
        "difference, -2e6 sentinel on an empty cell; ONE map-side-" +
        "combined 4-cell aggregation, nothing else")
  )
}

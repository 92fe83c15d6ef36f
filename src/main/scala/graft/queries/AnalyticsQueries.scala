package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{ChangeCapture, EventAnalytics, Graph, TextPipeline}
import graft.operators.Materialize.MaterializeOps

/** Round-6 analytics queries (q91-q102): batch CDC merge + SCD2 history,
  * funnel conversion, exact-integer outlier flags, character entropy, BPE
  * encoding, curriculum bucketing, rolling time-range features,
  * sessionization, gated approximate quantiles, unicode canonicalization,
  * and fixed-point PageRank.
  * Every signal
  * is an integer (micros/milli/micro-nats) or a raw-column passthrough,
  * so both engines hash-match bit-for-bit; the ln()-based entropy terms
  * carry the usual documented 1-ulp libm caveat, corpus-validated per SF.
  */
object AnalyticsQueries {

  val queries: Seq[(String, Q)] = Seq(

    // ---------------------------------------------------------- cdc merge
    "q91_cdc_merge" -> Q(
      (s, dir) => {
        val snapshot = Tables.table(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
        // change log: every order re-prices its customer's balance; compact
        // to the latest (o_orderdate, o_orderkey) per key, then plant
        // INSERT rows (shifted keys) so all three op classes are exercised
        val latest = ChangeCapture.latestByKey(
            Tables.table(s, dir, "orders"), "o_custkey", "o_orderdate", "o_orderkey")
          .select(col("o_custkey").as("c_custkey"), col("o_totalprice").as("c_acctbal"))
        val changes = latest.unionByName(
          latest.filter(col("c_custkey") % 50 === 0)
            .select((col("c_custkey") + 1000000L).as("c_custkey"), col("c_acctbal")))
        ChangeCapture.applyChanges(snapshot, changes, "c_custkey")
          .select(col("c_custkey").as("cust"), col("c_acctbal").as("acctbal"),
            col("c_mktsegment").as("mktsegment"), col("op"))
          .orderBy(col("cust"))
      },
      Some("""WITH latest AS (
             |  SELECT o_custkey AS k, o_totalprice AS bal,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             |  FROM orders),
             |chg0 AS (SELECT k, bal FROM latest WHERE rn = 1),
             |chg AS (SELECT k, bal FROM chg0
             |        UNION ALL
             |        SELECT k + 1000000, bal FROM chg0 WHERE k % 50 = 0)
             |SELECT COALESCE(c.c_custkey, chg.k) AS cust,
             |  COALESCE(chg.bal, c.c_acctbal) AS acctbal,
             |  c.c_mktsegment AS mktsegment,
             |  CASE WHEN c.c_custkey IS NULL THEN 'I'
             |       WHEN chg.k IS NULL THEN 'K' ELSE 'U' END AS op
             |FROM customer c FULL OUTER JOIN chg ON c.c_custkey = chg.k
             |ORDER BY cust""".stripMargin),
      "batch CDC MERGE: change log compacted to latest-per-key, full-outer upsert onto the " +
        "snapshot with I/U/K op classification (batch mirror of the pk-idempotent JDBC sink)"),

    // ------------------------------------------------------------- funnel
    "q92_funnel" -> Q(
      (s, dir) =>
        EventAnalytics.funnel(
            Tables.events(s, dir).withColumn("tsu", unix_micros(col("ts"))),
            "user_id", "event_type", "tsu",
            Seq("view", "click", "purchase"), windowMicros = 86400L * 1000000L)
          .orderBy(col("user")),
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
             |       GROUP BY e.u)
             |SELECT s0.u AS "user", t0 AS t0_us, t1 AS t1_us, t2 AS t2_us,
             |  CAST(CASE WHEN t2 IS NOT NULL THEN 3
             |            WHEN t1 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS n_steps,
             |  CAST(t2 IS NOT NULL AS BIGINT) AS converted,
             |  CASE WHEN t2 IS NOT NULL THEN t2 - t0 END AS dwell_us
             |FROM s0 LEFT JOIN s1 USING (u) LEFT JOIN s2 USING (u)
             |ORDER BY "user"""".stripMargin),
      "ordered funnel (view -> click -> purchase within 24h): chained conditional window " +
        "mins, one shuffle on user"),

    // --------------------------------------------------- outlier detection
    "q93_event_outliers" -> Q(
      (s, dir) =>
        EventAnalytics.zscoreOutliers(
            Tables.events(s, dir), "event_type", "value", "event_id", z = 3)
          .orderBy(col("id")),
      Some("""WITH e AS (
             |  SELECT event_id AS id, event_type AS grp,
             |    CAST(round(value * 1e6) AS BIGINT) AS xm
             |  FROM events),
             |st AS (
             |  SELECT grp, CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(xm) AS HUGEINT) AS s,
             |    sum(CAST(xm AS HUGEINT) * CAST(xm AS HUGEINT)) AS ss
             |  FROM e GROUP BY grp)
             |SELECT id, grp, xm AS value_micro,
             |  CAST((n * xm - s) * (n * xm - s) > 9 * (n * ss - s * s) AS BIGINT) AS is_outlier
             |FROM e JOIN st USING (grp) ORDER BY id""".stripMargin),
      "per-type 3-sigma outlier flags with EXACT integer arithmetic: " +
        "(n*x-S)^2 > 9(n*SS-S^2) on micro-quantized values — order-independent, engine-portable"),

    // ------------------------------------------------------- char entropy
    "q94_char_entropy" -> Q(
      (s, dir) =>
        TextPipeline.charEntropy(Tables.table(s, dir, "documents"), "text", "doc_id")
          .orderBy(col("doc")),
      Some("""WITH d AS (SELECT doc_id AS doc, text, length(text) AS n
             |          FROM documents WHERE length(text) >= 1),
             |p AS (SELECT doc, text, unnest(generate_series(1, n)) AS i FROM d),
             |c AS (SELECT doc, substr(text, CAST(i AS INT), 1) AS ch FROM p),
             |cnt AS (SELECT doc, ch, CAST(count(*) AS BIGINT) AS c FROM c GROUP BY doc, ch),
             |tot AS (SELECT doc, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY doc),
             |t AS (
             |  SELECT cnt.doc, n,
             |    CAST(round(-ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
             |      * (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS term
             |  FROM cnt JOIN tot USING (doc))
             |SELECT doc, max(n) AS n_chars, CAST(count(*) AS BIGINT) AS n_distinct,
             |  CAST(sum(term) AS BIGINT) AS entropy_micro
             |FROM t GROUP BY doc ORDER BY doc""".stripMargin),
      "character-level Shannon entropy per doc in micro-nats: per-char terms rounded to " +
        "integers before the (order-independent) sum"),

    // --------------------------------------------------------- bpe encode
    "q95_bpe_encode" -> Q(
      (s, dir) =>
        TextPipeline.bpeEncode(Tables.table(s, dir, "documents"), "text", "doc_id",
            merges = Seq("t" -> "h", "th" -> "e", "a" -> "n", "i" -> "n", "e" -> "r"))
          .orderBy(col("doc")),
      Some("""WITH toks AS (
             |  SELECT doc_id AS doc,
             |    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0)) AS w
             |  FROM documents),
             |wc AS (SELECT doc, w, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY doc, w),
             |v AS (SELECT DISTINCT w FROM wc),
             |w0 AS (SELECT w, array_to_string(list_transform(regexp_split_to_array(w, ''),
             |         ch -> chr(1) || ch || chr(2)), '') AS ws FROM v),
             |w1 AS (SELECT w, replace(ws, chr(1)||'t'||chr(2)||chr(1)||'h'||chr(2), chr(1)||'th'||chr(2)) AS ws FROM w0),
             |w2 AS (SELECT w, replace(ws, chr(1)||'th'||chr(2)||chr(1)||'e'||chr(2), chr(1)||'the'||chr(2)) AS ws FROM w1),
             |w3 AS (SELECT w, replace(ws, chr(1)||'a'||chr(2)||chr(1)||'n'||chr(2), chr(1)||'an'||chr(2)) AS ws FROM w2),
             |w4 AS (SELECT w, replace(ws, chr(1)||'i'||chr(2)||chr(1)||'n'||chr(2), chr(1)||'in'||chr(2)) AS ws FROM w3),
             |w5 AS (SELECT w, replace(ws, chr(1)||'e'||chr(2)||chr(1)||'r'||chr(2), chr(1)||'er'||chr(2)) AS ws FROM w4),
             |u AS (SELECT w, CAST(len(ws) - len(replace(ws, chr(1), '')) AS BIGINT) AS units FROM w5)
             |SELECT doc, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             |  CAST(sum(cnt * units) AS BIGINT) AS n_units
             |FROM wc JOIN u USING (w) GROUP BY doc ORDER BY doc""".stripMargin),
      "BPE encode with a fixed 5-rule merge table: vocab-level merge chain (each distinct " +
        "word encoded once), per-doc token and unit counts"),

    // ------------------------------------------------- curriculum buckets
    "q96_curriculum" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_chars"), col("doc_id"))
        val wp = Window.partitionBy(col("source"))
        Tables.table(s, dir, "documents")
          .select(col("doc_id").as("doc"), col("source").as("src"),
            col("source"), col("n_chars"), col("doc_id"))
          .withColumn("bucket", ntile(4).over(w).cast("bigint"))
          .withColumn("rn", row_number().over(w).cast("bigint"))
          .withColumn("n", count(lit(1)).over(wp).cast("bigint"))
          .select(col("doc"), col("src"), col("n_chars"), col("bucket"),
            expr("CASE WHEN n > 1 THEN ((rn - 1) * 1000) DIV (n - 1) ELSE 0L END").as("pr_milli"),
            expr("(rn * 1000) DIV n").as("cd_milli"))
          .orderBy(col("doc"))
      },
      Some("""WITH r AS (
             |  SELECT doc_id AS doc, source AS src, n_chars,
             |    CAST(ntile(4) OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS bucket,
             |    CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
             |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
             |  FROM documents)
             |SELECT doc, src, n_chars, bucket,
             |  CASE WHEN n > 1 THEN ((rn - 1) * 1000) // (n - 1) ELSE 0 END AS pr_milli,
             |  (rn * 1000) // n AS cd_milli
             |FROM r ORDER BY doc""".stripMargin),
      "curriculum difficulty buckets per source: ntile(4) + integer-milli percent_rank / " +
        "cume_dist over a unique (n_chars, doc) order"),

    // ----------------------------------------------- rolling time features
    "q98_rolling_features" -> Q(
      (s, dir) =>
        EventAnalytics.rollingCounts(
            Tables.events(s, dir).withColumn("tsu", unix_micros(col("ts"))),
            "user_id", "tsu", "value", "event_id", lookbackMicros = 6L * 3600L * 1000000L)
          .orderBy(col("id")),
      Some("""WITH e AS (
             |  SELECT event_id AS id, user_id AS "user",
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
             |    CAST(round(value * 1e6) AS BIGINT) AS value_micro
             |  FROM events)
             |SELECT id, "user", tsu, value_micro,
             |  CAST(count(*) OVER w AS BIGINT) AS prev_n,
             |  CAST(COALESCE(sum(value_micro) OVER w, 0) AS BIGINT) AS prev_sum_micro
             |FROM e
             |WINDOW w AS (PARTITION BY "user" ORDER BY tsu
             |  RANGE BETWEEN 21600000000 PRECEDING AND 1 PRECEDING)
             |ORDER BY id""".stripMargin),
      "per-event trailing-6h activity features (count + micro-sum of the user's prior " +
        "events): RANGE frame bound by event time, one shuffle + sort per user"),

    // ------------------------------------------------------ sessionization
    "q99_sessionize" -> Q(
      (s, dir) =>
        EventAnalytics.sessionize(
            Tables.events(s, dir).withColumn("tsu", unix_micros(col("ts"))),
            "user_id", "tsu", "event_id", gapMicros = 6L * 3600L * 1000000L)
          .orderBy(col("id")),
      Some("""WITH e AS (
             |  SELECT event_id AS id, user_id AS "user",
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu
             |  FROM events),
             |l AS (
             |  SELECT id, "user", tsu,
             |    CASE WHEN lag(tsu) OVER w IS NULL THEN 1
             |         WHEN tsu - lag(tsu) OVER w > 21600000000 THEN 1 ELSE 0 END AS ns
             |  FROM e WINDOW w AS (PARTITION BY "user" ORDER BY tsu, id))
             |SELECT id, "user", tsu,
             |  CAST(sum(ns) OVER (PARTITION BY "user" ORDER BY tsu, id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
             |FROM l ORDER BY id""".stripMargin),
      "gap-based sessionization (6h inactivity): per-event 1-based session index via " +
        "lag + running sum (gaps-and-islands), the window-function mirror of session_window"),

    // ----------------------------------------------------- scd2 dimension
    "q101_scd2_history" -> Q(
      (s, dir) => {
        // dimension snapshot opens at epoch 0; each customer's latest order
        // cuts a new balance version at its order date
        val history = Tables.table(s, dir, "customer")
          .select(col("c_custkey").as("cust"), col("c_acctbal").as("bal"),
            lit(0L).as("valid_from_us"), lit(null).cast("long").as("valid_to_us"))
        val changes = ChangeCapture.latestByKey(
            Tables.table(s, dir, "orders"), "o_custkey", "o_orderdate", "o_orderkey")
          .select(col("o_custkey").as("cust"), col("o_totalprice").as("bal"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"))
        ChangeCapture.scd2Merge(history, changes, "cust", "ts_us")
          .orderBy(col("cust"), col("valid_from_us"))
      },
      Some("""WITH latest AS (
             |  SELECT o_custkey AS cust, o_totalprice AS bal,
             |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS ts,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             |  FROM orders),
             |chg AS (SELECT cust, bal, ts FROM latest WHERE rn = 1),
             |cur AS (SELECT c_custkey AS cust, c_acctbal AS bal FROM customer)
             |SELECT cust, bal, valid_from_us, valid_to_us FROM (
             |  SELECT cur.cust, cur.bal, CAST(0 AS BIGINT) AS valid_from_us,
             |    chg.ts AS valid_to_us
             |  FROM cur JOIN chg USING (cust)
             |  UNION ALL
             |  SELECT cust, bal, ts, CAST(NULL AS BIGINT) FROM chg
             |  UNION ALL
             |  SELECT cur.cust, cur.bal, CAST(0 AS BIGINT), CAST(NULL AS BIGINT)
             |  FROM cur ANTI JOIN chg USING (cust))
             |ORDER BY cust, valid_from_us""".stripMargin),
      "SCD type-2 dimension merge: current versions close at the change's effective time, " +
        "new versions open, closed history passes through unshuffled"),

    // -------------------------------------------- approx quantiles, gated
    "q100_approx_quantile" -> Q(
      (s, dir) => {
        // the GK sketch VALUE is engine-specific (like q51's HLL), so the
        // oracled output carries the EXACT rank-based quantiles plus the
        // sketch's accuracy contract as booleans the oracle asserts true:
        // at accuracy 10000 the rank error is <= n/10000 ranks, far inside
        // a 5%-of-value (floor 1.0) tolerance on this data
        Tables.events(s, dir)
          .select(col("event_type"), round(col("value") * 1e6).cast("bigint").as("xm"))
          .createOrReplaceTempView("__q100_events")
        s.sql("""
          SELECT event_type, count(*) AS n,
            CAST(percentile_disc(0.5)  WITHIN GROUP (ORDER BY xm) AS BIGINT) AS p50_micro,
            CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY xm) AS BIGINT) AS p95_micro,
            abs(approx_percentile(xm, 0.5, 10000) -
                CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY xm) AS BIGINT)) <=
              greatest(abs(CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY xm) AS BIGINT)) DIV 20, 1000000L)
              AS approx_p50_ok,
            abs(approx_percentile(xm, 0.95, 10000) -
                CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY xm) AS BIGINT)) <=
              greatest(abs(CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY xm) AS BIGINT)) DIV 20, 1000000L)
              AS approx_p95_ok
          FROM __q100_events GROUP BY event_type ORDER BY event_type""")
      },
      Some("""WITH e AS (
             |  SELECT event_type, CAST(round(value * 1e6) AS BIGINT) AS xm FROM events),
             |r AS (
             |  SELECT event_type, xm,
             |    row_number() OVER (PARTITION BY event_type ORDER BY xm) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM e)
             |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             |  min(CASE WHEN rn >= ceil(0.5 * n) THEN xm END) AS p50_micro,
             |  min(CASE WHEN rn >= ceil(0.95 * n) THEN xm END) AS p95_micro,
             |  true AS approx_p50_ok, true AS approx_p95_ok
             |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin),
      "approx_percentile (Greenwald-Khanna) pinned within 5%-of-value of the exact " +
        "rank-based quantiles; exact p50/p95 in integer micros"),

    // -------------------------------------------- two-nation trade flows
    "q105_trade_flows" -> Q(
      (s, dir) => {
        // the classic "volume between nation pairs by year" shape: one
        // dimension table joined TWICE under different roles (customer
        // nation vs supplier nation) over a 4-table fact join — revenue
        // in exact cents so the aggregate is an integer sum
        val nation = Tables.table(s, dir, "nation")
        val cn = nation.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        val sn = nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        Tables.table(s, dir, "lineitem")
          .join(Tables.table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(Tables.table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(cn), col("c_nationkey") === col("c_nk"))
          .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
          // DIRECTED flows: (customer nation -> supplier nation); both
          // directions of a pair are distinct rows, every lineitem counted
          .groupBy(col("cust_nation"), col("supp_nation"),
            year(col("o_orderdate")).cast("bigint").as("yr"))
          .agg(count(lit(1)).as("n_items"),
            sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
              .cast("bigint")).as("revenue_cents"))
          .orderBy(col("cust_nation"), col("supp_nation"), col("yr"))
      },
      Some("""SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
             |  CAST(year(o_orderdate) AS BIGINT) AS yr,
             |  count(*) AS n_items,
             |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
             |    AS revenue_cents
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation cn ON c_nationkey = cn.n_nationkey
             |JOIN nation sn ON s_nationkey = sn.n_nationkey
             |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
      "directed nation-to-nation trade flows by year: one dimension joined twice under " +
        "different roles (both broadcast) over a 4-table fact join, exact integer cents"),

    // ------------------------------------- record linkage / token canon
    "q103_token_canon" -> Q(
      (s, dir) => {
        // entity-resolution shape over the corpus vocabulary: block via
        // deletion-neighborhood keys (fuzzyJoinEd1), link at edit
        // distance <= 1, close transitively (connected components on
        // STRING node ids), canonicalize to the lexicographic minimum
        import graft.functions.{TextFunctions => T}
        import graft.operators.Dedup
        // Materialize.checkpoint: the vocab subplan (full-corpus tokenize + top-k)
        // is consumed THREE times (both fuzzy-join sides + the final join);
        // materializing the tiny result once keeps it a single corpus scan
        val vocab = Tables.table(s, dir, "documents")
          .select(explode(T.tokens(col("text"))).as("w"))
          .filter(length(col("w")) >= 4)
          .groupBy(col("w")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("w")).limit(300)
          .select(col("w"))
          .materialize
        val pairs = Dedup.fuzzyJoinEd1(vocab, vocab, "w", "w")
          .filter(col("w1") < col("w2"))
          .select(col("w1").as("id_a"), col("w2").as("id_b"))
        Dedup.keepRepresentatives(vocab, "w", pairs)
          .select(col("w"), col("component").as("canon"),
            col("keep").cast("bigint").as("is_canon"))
          .orderBy(col("w"))
      },
      Some("""WITH RECURSIVE t AS (
             |  SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> len(x) > 0)) AS w
             |  FROM documents),
             |v AS (SELECT w FROM (
             |  SELECT w, count(*) AS c FROM t WHERE len(w) >= 4
             |  GROUP BY w ORDER BY c DESC, w LIMIT 300)),
             |p AS (SELECT a.w AS w1, b.w AS w2 FROM v a CROSS JOIN v b
             |      WHERE a.w < b.w AND levenshtein(a.w, b.w) <= 1),
             |edges AS (SELECT w1 AS src, w2 AS dst FROM p
             |          UNION ALL SELECT w2, w1 FROM p),
             |walk(id, lbl) AS (
             |  SELECT w, w FROM v
             |  UNION
             |  SELECT e.dst, walk.lbl FROM walk JOIN edges e ON e.src = walk.id),
             |cc AS (SELECT id, min(lbl) AS canon FROM walk GROUP BY id)
             |SELECT v.w, cc.canon, CAST(v.w = cc.canon AS BIGINT) AS is_canon
             |FROM v JOIN cc ON cc.id = v.w
             |ORDER BY v.w""".stripMargin),
      "record linkage over the vocabulary: deletion-key blocking -> edit-distance-1 links " +
        "-> transitive closure on string ids -> lexicographic-min canonical form"),

    // ------------------------------------------------ text canonicalization
    "q102_text_normalize" -> Q(
      (s, dir) => {
        // NFKC + accent fold is identity on ASCII; the `ascii_only` gate
        // column PROVES the precondition inside the compared output (the
        // q51/q100 pattern) — on a corpus where it ever goes 0, n_norm/fp
        // would legitimately diverge and the compare would flag it
        import org.apache.spark.sql.graftvec.TextExprs
        Tables.table(s, dir, "documents")
          .select(col("doc_id").as("doc"), col("text"))
          .withColumn("norm", TextExprs.normalizeTextCol(col("text"), "NFKC", stripAccents = true))
          .select(col("doc"),
            length(col("text")).cast("bigint").as("n_raw"),
            length(col("norm")).cast("bigint").as("n_norm"),
            md5(col("norm")).as("fp"),
            col("text").rlike("^[\\x00-\\x7F]*$").cast("bigint").as("ascii_only"))
          .orderBy(col("doc"))
      },
      Some("""SELECT doc_id AS doc,
             |  CAST(length(text) AS BIGINT) AS n_raw,
             |  CAST(length(text) AS BIGINT) AS n_norm,
             |  md5(text) AS fp,
             |  CAST(regexp_matches(text, '^[\x00-\x7F]*$') AS BIGINT) AS ascii_only
             |FROM documents ORDER BY doc""".stripMargin),
      "unicode canonicalization (NFKC + accent fold, codegen expression) for dedup keys; " +
        "ascii_only gate makes the identity oracle self-verifying"),

    // ----------------------------------------------------------- pagerank
    "q97_pagerank" -> Q(
      (s, dir) => {
        val edges = Tables.table(s, dir, "lineitem")
          .join(Tables.table(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.table(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(Tables.table(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
          .agg(count(lit(1)).as("w"))
        Graph.pageRank(edges, "src", "dst", "w", iterations = 3, dampPpm = 850000L)
          .orderBy(col("node"))
      },
      Some("""WITH edges AS (
             |  SELECT CAST(c_nationkey AS BIGINT) AS src,
             |    CAST(s_nationkey AS BIGINT) AS dst, CAST(count(*) AS BIGINT) AS w
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  GROUP BY 1, 2),
             |nodes AS (SELECT DISTINCT src AS node FROM edges
             |          UNION SELECT DISTINCT dst FROM edges),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
             |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM edges GROUP BY src),
             |p0 AS (SELECT node, 1000000 // n AS pr FROM nodes CROSS JOIN nn),
             |i1 AS (SELECT dst, CAST(sum((pr * w) // outw) AS BIGINT) AS inflow
             |       FROM edges JOIN outw USING (src) JOIN p0 ON p0.node = edges.src
             |       GROUP BY dst),
             |p1 AS (SELECT node, 150000 // n + (850000 * COALESCE(inflow, 0)) // 1000000 AS pr
             |       FROM nodes CROSS JOIN nn LEFT JOIN i1 ON i1.dst = node),
             |i2 AS (SELECT dst, CAST(sum((pr * w) // outw) AS BIGINT) AS inflow
             |       FROM edges JOIN outw USING (src) JOIN p1 ON p1.node = edges.src
             |       GROUP BY dst),
             |p2 AS (SELECT node, 150000 // n + (850000 * COALESCE(inflow, 0)) // 1000000 AS pr
             |       FROM nodes CROSS JOIN nn LEFT JOIN i2 ON i2.dst = node),
             |i3 AS (SELECT dst, CAST(sum((pr * w) // outw) AS BIGINT) AS inflow
             |       FROM edges JOIN outw USING (src) JOIN p2 ON p2.node = edges.src
             |       GROUP BY dst),
             |p3 AS (SELECT node, 150000 // n + (850000 * COALESCE(inflow, 0)) // 1000000 AS pr
             |       FROM nodes CROSS JOIN nn LEFT JOIN i3 ON i3.dst = node)
             |SELECT node, CAST(pr AS BIGINT) AS pr_micro FROM p3 ORDER BY node""".stripMargin),
      "fixed-point weighted PageRank (3 rounds, damping 0.85) over the customer-nation -> " +
        "supplier-nation trade graph; oracle unrolls the integer recurrence"),

    // ------------------------------------------- HITS hubs & authorities
    "q173_hits" -> Q(
      (s, dir) => {
        val edges = Tables.table(s, dir, "lineitem")
          .join(Tables.table(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.table(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(Tables.table(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        Graph.hits(edges, "src", "dst", iterations = 3)
          .orderBy(col("node"))
      },
      Some {
        val rounds = (1 to 3).map { r =>
          s"""ar$r AS (SELECT dst, sum(h) AS araw FROM edges
             |  JOIN h${r - 1} ON h${r - 1}.node = edges.src GROUP BY dst),
             |at$r AS (SELECT sum(araw) AS atot FROM ar$r),
             |a$r AS (SELECT node, (COALESCE(araw, 0)::HUGEINT * 1000000 * n) // atot AS a
             |  FROM nodes CROSS JOIN nn CROSS JOIN at$r
             |  LEFT JOIN ar$r ON ar$r.dst = node),
             |hr$r AS (SELECT src, sum(a) AS hraw FROM edges
             |  JOIN a$r ON a$r.node = edges.dst GROUP BY src),
             |ht$r AS (SELECT sum(hraw) AS htot FROM hr$r),
             |h$r AS (SELECT node, (COALESCE(hraw, 0)::HUGEINT * 1000000 * n) // htot AS h
             |  FROM nodes CROSS JOIN nn CROSS JOIN ht$r
             |  LEFT JOIN hr$r ON hr$r.src = node)""".stripMargin
        }.mkString(",\n")
        s"""WITH edges AS (
           |  SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS src,
           |    CAST(s_nationkey AS BIGINT) AS dst
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey),
           |nodes AS (SELECT DISTINCT src AS node FROM edges
           |          UNION SELECT DISTINCT dst FROM edges),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
           |h0 AS (SELECT node, 1000000::HUGEINT AS h FROM nodes),
           |$rounds
           |SELECT node, CAST(h AS BIGINT) AS hub_micro, CAST(a AS BIGINT) AS auth_micro
           |FROM h3 JOIN a3 USING (node) ORDER BY node""".stripMargin
      },
      "HITS hubs & authorities (3 rounds, exact integer L1-normalized recurrence) " +
        "over the nation trade digraph — separates good POINTERS from good " +
        "TARGETS, the curation prior PageRank can't express; oracle unrolls all " +
        "three mutual-reinforcement rounds in HUGEINT SQL"),

    // ------------------------------------------ personalized PageRank
    "q199_personalized_pr" -> Q(
      (s, dir) => {
        val edges = Tables.table(s, dir, "lineitem")
          .join(Tables.table(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.table(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(Tables.table(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
          .agg(count(lit(1)).as("w"))
        Graph.personalizedPageRank(edges, "src", "dst", "w",
            seeds = Seq(0L, 1L), iterations = 3, dampPpm = 850000L)
          .orderBy(col("node"))
      },
      // q97's unrolled recurrence with the teleport CASE-restricted to
      // the seed set {0, 1}
      Some("""WITH edges AS (
             |  SELECT CAST(c_nationkey AS BIGINT) AS src,
             |    CAST(s_nationkey AS BIGINT) AS dst, CAST(count(*) AS BIGINT) AS w
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  GROUP BY 1, 2),
             |nodes AS (SELECT DISTINCT src AS node FROM edges
             |          UNION SELECT DISTINCT dst FROM edges),
             |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM edges GROUP BY src),
             |p0 AS (SELECT node,
             |    CASE WHEN node IN (0, 1) THEN 1000000 // 2 ELSE 0 END AS pr
             |  FROM nodes),
             |i1 AS (SELECT dst, CAST(sum((pr * w) // outw) AS BIGINT) AS inflow
             |       FROM edges JOIN outw USING (src) JOIN p0 ON p0.node = edges.src
             |       GROUP BY dst),
             |p1 AS (SELECT node, CASE WHEN node IN (0, 1) THEN 150000 // 2 ELSE 0 END
             |         + (850000 * COALESCE(inflow, 0)) // 1000000 AS pr
             |       FROM nodes LEFT JOIN i1 ON i1.dst = node),
             |i2 AS (SELECT dst, CAST(sum((pr * w) // outw) AS BIGINT) AS inflow
             |       FROM edges JOIN outw USING (src) JOIN p1 ON p1.node = edges.src
             |       GROUP BY dst),
             |p2 AS (SELECT node, CASE WHEN node IN (0, 1) THEN 150000 // 2 ELSE 0 END
             |         + (850000 * COALESCE(inflow, 0)) // 1000000 AS pr
             |       FROM nodes LEFT JOIN i2 ON i2.dst = node),
             |i3 AS (SELECT dst, CAST(sum((pr * w) // outw) AS BIGINT) AS inflow
             |       FROM edges JOIN outw USING (src) JOIN p2 ON p2.node = edges.src
             |       GROUP BY dst),
             |p3 AS (SELECT node, CASE WHEN node IN (0, 1) THEN 150000 // 2 ELSE 0 END
             |         + (850000 * COALESCE(inflow, 0)) // 1000000 AS pr
             |       FROM nodes LEFT JOIN i3 ON i3.dst = node)
             |SELECT node, CAST(pr AS BIGINT) AS pr_micro FROM p3 ORDER BY node""".stripMargin),
      "personalized PageRank seeded at nations {0, 1} (teleport restricted to " +
        "the seed set, exact integer recurrence) — trust propagation / " +
        "random-walk relatedness from a trusted seed list, the expansion " +
        "primitive plain PageRank can't express; q97's plan with a CASE base"),

    // ------------------------------------------ random-walk skip-grams
    "q205_walk_pairs" -> Q(
      (s, dir) => {
        val edges = Tables.table(s, dir, "lineitem")
          .join(Tables.table(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.table(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(Tables.table(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        Graph.randomWalkPairs(edges, "src", "dst",
            walkLen = 3, walksPerNode = 2, window = 2)
          .orderBy(col("item_a"), col("item_b"))
      },
      Some {
        // keep '||' at line ends: the nested stripMargin passes would eat
        // leading pipes
        def h(p: Int) =
          "list_reduce(list_transform(generate_series(1, 8), " +
            "i -> strpos('0123456789abcdef', substring(md5('rw:' || CAST(r AS VARCHAR) || " +
            s"':' || CAST(start AS VARCHAR) || ':' || '$p' || ':' || " +
            "CAST(cur AS VARCHAR)), i, 1)) - 1), (a, x) -> a * 16 + x)"
        val steps = (0 until 3).map { p =>
          s"""s$p AS (SELECT start, r, path, path[len(path)] AS cur
             |  FROM w$p),
             |j$p AS (SELECT s$p.*, adj.nbrs FROM s$p
             |  LEFT JOIN adj ON adj.src = s$p.cur),
             |w${p + 1} AS (SELECT start, r,
             |    CASE WHEN nbrs IS NULL THEN path
             |         ELSE list_append(path,
             |           nbrs[CAST(${h(p)} % len(nbrs) AS INT) + 1])
             |    END AS path
             |  FROM j$p)""".stripMargin
        }.mkString(",\n")
        s"""WITH edges AS (
           |  SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS src,
           |    CAST(s_nationkey AS BIGINT) AS dst
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey),
           |adj AS (SELECT src, list_sort(list(dst)) AS nbrs FROM edges GROUP BY 1),
           |starts AS (SELECT DISTINCT src AS start FROM edges),
           |w0 AS (SELECT start, g.r AS r, [start] AS path
           |  FROM starts CROSS JOIN generate_series(0, 1) AS g(r)),
           |$steps,
           |pr AS (SELECT path FROM w3),
           |pairs AS (SELECT path[gi.i] AS a, path[gj.j] AS b
           |  FROM pr
           |  CROSS JOIN generate_series(1, 4) AS gi(i)
           |  CROSS JOIN generate_series(1, 4) AS gj(j)
           |  WHERE gi.i <= len(path) AND gj.j <= len(path)
           |    AND gj.j > gi.i AND gj.j - gi.i <= 2)
           |SELECT a AS item_a, b AS item_b, CAST(count(*) AS BIGINT) AS n_pairs
           |FROM pairs GROUP BY 1, 2 ORDER BY item_a, item_b""".stripMargin
      },
      "DeepWalk-style skip-gram pairs from md5-derandomized 3-step walks over " +
        "the nation trade digraph (2 walks/node, window 2) — the graph-embedding " +
        "training-pair generator, every walk replayable in SQL; adjacency built " +
        "once, one equi-join per step, pair fan-out walks x len x window")
  )
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.FeatureEng

/** Round-8 feature-engineering queries (q123-q128): quantile binning,
  * leave-one-out target encoding, k-fold assignment, winsorization,
  * session co-occurrence pair generation, and integer-lag
  * cross-correlation. Every emitted signal is exact integer fixed point
  * (micro values, rational-rank bins, md5-derived folds) so both engines
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
        "lag-expanded bucket equi-join, bounded by time span not event volume")
  )
}

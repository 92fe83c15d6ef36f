package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.EwmaFunctions

/** The reference's one real computation — the windowed, zero-seeded,
  * order-sensitive EWMA fold (SURVEY.md §2.3) — exercised as batch queries
  * over the `events` stream table. The streaming (file-replay / Kafka)
  * form of the same operator lives in [[graft.streaming.EwmaPipeline]] and
  * is pinned to these results by ScalaTest.
  *
  * alpha = 2/(300+1): the reference's default 5-minute period, with alpha
  * computed from the period in SECONDS (main.rs:111 quirk, pinned).
  *
  * Oracle note: DuckDB's list_reduce has no zero-seed form, so the oracle
  * uses the closed form  ewma = alpha * sum(x_i * (1-alpha)^(n-i))  which
  * is algebraically identical to the left fold; both sides round to 4 dp
  * to absorb the accumulation-order ULP difference.
  */
object EwmaQueries {

  val alpha5min: Double = EwmaFunctions.alpha(300) // 2/301, reference default

  val queries: Seq[(String, Q)] = Seq(

    "q27_ewma_by_type" -> Q(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(
            round(EwmaFunctions.ewmaOrdered(col("ts"), col("event_id"), col("value"), alpha5min), 4).as("ewma"),
            count(lit(1)).as("n"))
          .filter(col("ewma") > 0) // reference main.rs:118 suppression
          .orderBy(col("event_type")),
      Some(s"""WITH ord AS (
              |  SELECT event_type, value,
              |    row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
              |    count(*) OVER (PARTITION BY event_type) AS n
              |  FROM events)
              |SELECT event_type,
              |  round(sum(value * power(1 - $alpha5min, n - rn)) * $alpha5min, 4) AS ewma,
              |  count(*) AS n
              |FROM ord GROUP BY event_type
              |HAVING round(sum(value * power(1 - $alpha5min, n - rn)) * $alpha5min, 4) > 0
              |ORDER BY event_type""".stripMargin),
      "order-sensitive zero-seeded EWMA fold per key (reference R9+R11)"),

    "q28_ewma_daily" -> Q(
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn("day", date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
          .groupBy(col("event_type"), col("day"))
          .agg(
            round(EwmaFunctions.ewmaOrdered(col("ts"), col("event_id"), col("value"), alpha5min), 4).as("ewma"),
            count(lit(1)).as("n"))
          .filter(col("ewma") > 0)
          .orderBy(col("event_type"), col("day")),
      Some(s"""WITH ord AS (
              |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, value,
              |    row_number() OVER (PARTITION BY event_type, date_trunc('day', ts) ORDER BY ts, event_id) AS rn,
              |    count(*) OVER (PARTITION BY event_type, date_trunc('day', ts)) AS n
              |  FROM events)
              |SELECT event_type, day,
              |  round(sum(value * power(1 - $alpha5min, n - rn)) * $alpha5min, 4) AS ewma,
              |  count(*) AS n
              |FROM ord GROUP BY event_type, day
              |HAVING round(sum(value * power(1 - $alpha5min, n - rn)) * $alpha5min, 4) > 0
              |ORDER BY event_type, day""".stripMargin),
      "tumbling-window EWMA, state reset per window (reference R8-R11)"))
}

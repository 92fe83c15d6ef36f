package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the synthetic corpus (TESTDATA.md). One parquet per table.
  *
  * All loads are plain `spark.read.parquet` so Catalyst pushdown / column
  * pruning reach the scan. The only normalization is `events.ts`: the
  * testdata generator has shipped it as TIMESTAMP(NANOS), TIMESTAMP(US) with
  * timezone, and TIMESTAMP(US) without timezone across regenerations, so we
  * accept all three and normalize to TimestampType (microseconds):
  *  - nanos (with `spark.sql.legacy.parquet.nanosAsLong=true`) arrives as a
  *    Long which we integer-divide to micros (identical to DuckDB's ns->us
  *    cast semantics, so oracle comparisons stay exact);
  *  - TIMESTAMP_NTZ is cast to TimestampType — the session timezone is
  *    pinned to UTC everywhere (Verify/Bench/specs), so the cast is a
  *    re-tagging of the same micros value, not a wall-clock shift.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalizes a `ts` column of any generator flavor to TimestampType.
    * Works on batch AND streaming frames (pure column rewrite, no action) —
    * Bench's file-replay path and Tables.events share this so the two can't
    * drift apart on the next regeneration.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => // nanosAsLong: integer-divide, do NOT go through double
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case TimestampNTZType => // UTC session → identical micros, re-tagged
        df.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }

  /** events with `ts` normalized to a proper TimestampType (microseconds). */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(table(spark, dir, "events"))

  /** Registers the given tables of `dir` as temp views (events normalized). */
  def register(spark: SparkSession, dir: String, tables: String*): Unit =
    tables.foreach { n =>
      val df = if (n == "events") events(spark, dir) else table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  /** Registers every table of `dir` as a temp view (events normalized). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, names: _*)
}

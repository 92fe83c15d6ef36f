package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the synthetic corpus (TESTDATA.md). One parquet per table.
  *
  * All loads are plain `spark.read.parquet` so Catalyst pushdown / column
  * pruning reach the scan. The only normalization is `events.ts`: the file
  * carries TIMESTAMP(NANOS) which Spark's vectorized parquet reader rejects
  * ([PARQUET_TYPE_ILLEGAL]); with `spark.sql.legacy.parquet.nanosAsLong=true`
  * it arrives as a Long which we truncate to microseconds (identical to
  * DuckDB's ns->us cast semantics, so oracle comparisons stay exact).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` normalized to a proper TimestampType (microseconds). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanosAsLong: integer-divide, do NOT go through double
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
  }

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

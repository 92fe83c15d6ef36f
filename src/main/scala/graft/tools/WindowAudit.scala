package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

/** One-shot audit: which registry queries carry an UNPARTITIONED Window
  * node in their optimized plan (the single-partition-sort shape), and
  * over what expressions. Feeds the PlanInvariantSpec allowlist — every
  * hit must be either bounded-by-construction (documented) or fixed.
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.registerAll(spark, sfDir)
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val hits = df.queryExecution.optimizedPlan.collect {
          case w: LogicalWindow if w.partitionSpec.isEmpty =>
            w.windowExpressions.map(_.sql).mkString("; ").take(120)
        }
        if (hits.nonEmpty)
          println(s"[winaudit] $name :: ${hits.mkString(" | ")}")
      } catch {
        case e: Throwable =>
          println(s"[winaudit] $name !! construction failed: ${e.getMessage}")
      } finally graft.operators.Dedup.releaseAllCaches()
    }
    spark.stop()
  }
}

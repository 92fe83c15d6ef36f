package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Post-execution (AQE-final) plan dump of the incremental dedup stage —
  * which joins ended up broadcast vs sort-merge, and how many exchanges
  * the stage really ran. Usage: runMain graft.tools.DedupExplain <sfDir>
  */
object DedupExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators._
    val docs = graft.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val base = Dedup.persistTracked(Dedup.buildBandedIndex(
      Dedup.buildShingleIndex(docs.filter(col("doc_id") < 250), "text", "doc_id", 5)))
    val delta = Dedup.persistTracked(Dedup.buildBandedIndex(
      Dedup.buildShingleIndex(docs.filter(col("doc_id") >= 250), "text", "doc_id", 5)))
    val pairs = Dedup.minhashNearDupsAgainstBase(base, delta)
    val t0 = System.nanoTime()
    val n = pairs.count()
    println(f"[dexp] pairs=$n in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    val plan = pairs.queryExecution.executedPlan.toString
    println(plan)
    println("[dexp] SortMergeJoin count: " +
      "SortMergeJoin".r.findAllIn(plan).length)
    println("[dexp] BroadcastHashJoin count: " +
      "BroadcastHashJoin".r.findAllIn(plan).length)
    println("[dexp] Exchange count: " + "Exchange".r.findAllIn(plan).length)
    spark.stop()
  }
}

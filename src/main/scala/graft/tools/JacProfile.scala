package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage-level timing of the df-capped Jaccard pair core (q31's shape,
  * shared by q39/q151/q183/pipeline_dedup_shared): times each
  * intermediate of [[Dedup.ngramJaccardPairsFromIndex]] so the round-18
  * optimization targets facts. Usage: runMain graft.tools.JacProfile <sfDir>
  */
object JacProfile {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[jprof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
  }

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
    val docs = graft.Tables.table(spark, sfDir, "documents")
    for (rep <- 1 to 2) {
      println(s"[jprof] ---- rep $rep ----")
      val index = Dedup.persistTracked(
        Dedup.buildShingleIndex(docs, "text", "doc_id", 5))
      time("index build+persist")(index.count())
      val posting = index.select(col("doc"), explode(col("sh")).as("s"))
      time("posting explode")(posting.count())
      val dfs = posting.groupBy(col("s")).agg(count(lit(1)).as("df"))
      time("dfs groupBy")(dfs.count())
      val rare = dfs.filter(col("df") <= 1000).select(col("s"))
      val capped = posting.join(rare, Seq("s"), "left_semi")
      time("capped semi-join")(capped.count())
      val cntRare = capped.as("a")
        .join(capped.as("b"),
          col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
        .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
        .agg(count(lit(1)).as("cnt_rare"))
      time("pair self-join+agg")(cntRare.count())
      time("full ngramJaccardPairs")(
        Dedup.ngramJaccardPairsFromIndex(index, 0.8).count())
      Dedup.releaseAllCaches()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

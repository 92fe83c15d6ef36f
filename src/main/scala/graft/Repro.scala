package graft
import org.apache.spark.sql.SparkSession
object Repro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    for (q <- Seq("q01_pricing_summary", "q85_token_budget", "q31_dedup_jaccard",
        "q114_principal_axis", "q105_trade_flows", "q58_sim_ivf_kmeans", "q129_label_prop")) {
      val t0 = System.nanoTime()
      try {
        val n = SparkEntry.queries(q)(spark, sf).count()
        println(f"TIME $q ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
      } catch { case e: Throwable => println(s"ERR $q: ${String.valueOf(e.getMessage).take(200)}") }
      graft.operators.Dedup.releaseAllCaches(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}

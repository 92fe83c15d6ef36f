package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-family timing breakdown of the `pipeline_events` bench entry —
  * the round-11 directive to attribute its 11.6 s before optimizing.
  * Mirrors Bench's block exactly (one persisted normalized scan, five
  * consumers), but times each family separately and prints job counts.
  */
object ProfileEvents {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    def timed[A](name: String)(f: => A): A = {
      val j0 = sc.statusTracker.getJobIdsForGroup(null).length
      val t0 = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      val jobs = sc.statusTracker.getJobIdsForGroup(null).length - j0
      System.err.println(f"[profile] $name%-14s $secs%7.2f s  jobs=$jobs")
      r
    }

    (1 to 2).foreach { round =>
      System.err.println(s"[profile] ---- round $round ----")
      val ev = graft.Tables.events(spark, sfDir)
        .withColumn("tsu", unix_micros(col("ts")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        timed("materialize")(ev.count())
        timed("funnel")(graft.operators.EventAnalytics.funnel(ev, "user_id",
          "event_type", "tsu", Seq("view", "click", "purchase"),
          86400L * 1000000L).count())
        timed("attribution")(graft.operators.EventAnalytics.attributeConversions(
          ev, "user_id", "event_type", "tsu", "event_id", "value",
          Seq("view", "click", "signup"), "purchase", 86400L * 1000000L).count())
        timed("retention")(graft.operators.EventAnalytics.retentionCohorts(
          ev, "user_id", "tsu").count())
        timed("transitions")(graft.operators.EventAnalytics.transitionMatrix(
          ev, "user_id", "event_type", "tsu", "event_id").count())
        val holt = graft.functions.HoltFunctions.holtUdaf(300000L, 100000L)
        timed("holt")(ev.groupBy(col("event_type"))
          .agg(holt(col("tsu"), col("event_id"), col("value")).as("h")).count())
      } finally ev.unpersist(blocking = false)
    }
    spark.stop()
  }
}

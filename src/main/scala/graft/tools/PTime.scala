package graft.tools

import org.apache.spark.sql.SparkSession

/** Targeted timer for the composed Pipelines entries (the non-registry
  * bench bodies) without paying the full Bench sweep. Frozen artifacts
  * build untimed first, exactly like Bench. Repeats allowed.
  * Usage: runMain graft.tools.PTime <sfDir> [entry ...]
  *   entries: stream_funnel | dedup_shared | full | monitor
  */
object PTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", // decoupled from core count
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.registerAggregates(spark)
    val model = graft.Pipelines.funnelModel(spark, sfDir) // untimed, like Bench
    val entries = if (args.length <= 1) Seq("stream_funnel") else args.drop(1).toSeq
    entries.foreach { name =>
      graft.operators.Dedup.releaseAllCaches()
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val out = name match {
        case "stream_funnel" =>
          graft.Pipelines.streamFunnel(spark, sfDir, model).toString
        case "stream_replay" => // Bench's timed body (setup pre-staged)
          val tmp = graft.Pipelines.prepareStreamFunnel(spark, sfDir)
          try {
            graft.operators.Dedup.releaseAllCaches()
            spark.catalog.clearCache(); System.gc()
            val t = System.nanoTime()
            val r = graft.Pipelines.replayStreamFunnel(spark, sfDir, model, tmp)
            f"${(System.nanoTime() - t) / 1e9}%.2fs-inner $r"
          } finally {
            import scala.reflect.io.Directory
            new Directory(new java.io.File(tmp)).deleteRecursively(); ()
          }
        case "dedup_shared" => graft.Pipelines.dedupShared(spark, sfDir).toString
        case "stream_refresh" =>
          val tmp = graft.Pipelines.prepareStreamRefresh(spark, sfDir)
          try {
            graft.operators.Dedup.releaseAllCaches()
            spark.catalog.clearCache(); System.gc()
            val t = System.nanoTime()
            val r = graft.Pipelines.replayStreamRefresh(spark, sfDir, tmp)
            f"${(System.nanoTime() - t) / 1e9}%.2fs-inner $r"
          } finally {
            import scala.reflect.io.Directory
            new Directory(new java.io.File(tmp)).deleteRecursively(); ()
          }
        case "full" => graft.Pipelines.fullCuration(spark, sfDir).toString
        case "ann_refresh" =>
          val tmp = graft.Pipelines.prepareAnnRefresh(spark, sfDir)
          try {
            graft.operators.Dedup.releaseAllCaches()
            spark.catalog.clearCache(); System.gc()
            val t = System.nanoTime()
            val r = graft.Pipelines.replayAnnRefresh(spark, sfDir, tmp)
            f"${(System.nanoTime() - t) / 1e9}%.2fs-inner $r"
          } finally {
            import scala.reflect.io.Directory
            new Directory(new java.io.File(tmp)).deleteRecursively(); ()
          }
        case "crawl" =>
          val tmp = graft.Pipelines.prepareCrawl(spark, sfDir)
          try {
            graft.operators.Dedup.releaseAllCaches()
            spark.catalog.clearCache(); System.gc()
            val t = System.nanoTime()
            val r = graft.Pipelines.replayCrawl(spark, sfDir, tmp)
            f"${(System.nanoTime() - t) / 1e9}%.2fs-inner $r"
          } finally {
            import scala.reflect.io.Directory
            new Directory(new java.io.File(tmp)).deleteRecursively(); ()
          }
        case "monitor" => graft.Pipelines.monitorSuite(spark, sfDir).toString
        case other => s"unknown entry $other"
      }
      println(f"[ptime] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2fs  " +
        f"jobs=${spark.sparkContext.statusTracker.getJobIdsForGroup(null).length}  $out")
    }
    spark.stop()
  }
}

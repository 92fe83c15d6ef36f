package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level accounting of ONE small front-door decide (the refresh
  * entry's per-batch body): stage count, summed task time, summed
  * executor run time vs wall clock — distinguishes driver/scheduling
  * latency from actual task compute. Two reps (JIT warm).
  */
object DecideStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.registerAggregates(spark)
    import graft.operators._
    val docs = graft.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val (model0, _) = graft.Pipelines.refreshArtifacts(spark, sfDir)

    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMillis = 0L
    @volatile var runMillis = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        taskMillis += s.stageInfo.taskMetrics.executorRunTime +
          s.stageInfo.taskMetrics.executorDeserializeTime
        runMillis += s.stageInfo.taskMetrics.executorRunTime
      }
    })

    (1 to 3).foreach { rep =>
      Dedup.releaseAllCaches(); spark.catalog.clearCache()
      val tmp = java.nio.file.Files.createTempDirectory("graft-dstage-").toString
      graft.streaming.StreamingCurationFunnel.seedIndex(
        docs.filter(col("doc_id") < 250), "text", "doc_id", 5, s"$tmp/idx")
      stages = 0; tasks = 0; taskMillis = 0L; runMillis = 0L
      val t0 = System.nanoTime()
      val scope = Dedup.newScope()
      try Dedup.inScope(scope) {
        val base = graft.streaming.StreamingCurationFunnel.readIndex(
          spark, s"$tmp/idx", 0L)
        val batch = docs.filter(col("doc_id") >= 250 && col("doc_id") < 400)
        val (decisions, deltaIndex, _) =
          CurationFunnel.decideFull(batch, "text", "doc_id", base, model0)
        decisions.write.mode("overwrite").parquet(s"$tmp/out/batch_id=0")
        deltaIndex.write.mode("overwrite").parquet(s"$tmp/idx/batch_id=0")
      } finally Dedup.releaseScope(scope)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      println(f"[dstage] rep$rep wall=$wall%6.2fs stages=$stages tasks=$tasks " +
        f"taskTime=${taskMillis / 1e3}%6.2fs execRun=${runMillis / 1e3}%6.2fs " +
        f"(parallel-equiv=${taskMillis / 1e3 / 32}%5.2fs)")
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
    spark.stop()
  }
}

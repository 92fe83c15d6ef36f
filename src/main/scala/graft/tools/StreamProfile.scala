package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Micro-batch telemetry for the streaming EWMA replay entry: batch
  * count, per-batch duration breakdown (from the progress events), and
  * wall time, at a configurable `spark.sql.shuffle.partitions` — the
  * state-store partition count a stateful stream is sized by. Usage:
  * runMain graft.tools.StreamProfile <sfDir> [partitions ...]
  */
object StreamProfile {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val parts = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(32, 8, 2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    parts.foreach { p =>
      (1 to 2).foreach { rep =>
        spark.conf.set("spark.sql.shuffle.partitions", p)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val raw = spark.readStream.schema(
            spark.read.parquet(s"$sfDir/events.parquet").schema)
          .option("maxBytesPerTrigger", (512L * 1024 * 1024).toString)
          .option("pathGlobFilter", "events.parquet")
          .parquet(sfDir)
        val ev = graft.Tables.normalizeTs(raw)
          .withColumn("tsl", unix_micros(col("ts")))
        val agg = graft.streaming.EwmaPipeline.windowedEwma(
          ev, "event_type", "ts", "tsl", "event_id", "value",
          periodSeconds = 300, watermark = "10 minutes")
        val qn = s"sp_ewma_${p}_$rep"
        val q = agg.writeStream.format("memory").queryName(qn)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        val secs = (System.nanoTime() - t0) / 1e9
        val batches = q.recentProgress.length
        val dur = q.recentProgress.map(pr =>
          s"${pr.batchId}:${pr.durationMs.asScala.map { case (k, v) => s"$k=$v" }.mkString(",")}")
          .mkString(" | ")
        println(f"[sprof] ewma parts=$p%-3d rep=$rep ${secs}%6.2fs batches=$batches rows=${spark.table(qn).count()} $dur")
      }
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
    }
    spark.stop()
  }
}

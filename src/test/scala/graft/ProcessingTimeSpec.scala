package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EwmaPipeline

/** The faithful processing-time mode (reference main.rs:83-85 ticks on
  * wall clock). Not used for correctness gates — by design it is not
  * reproducible — but the wiring must run: a processing-time trigger
  * drains micro-batches on a cadence.
  */
class ProcessingTimeSpec extends SparkSpec {

  test("processingTimeTrigger converts minutes to the ms trigger") {
    assert(EwmaPipeline.processingTimeTrigger(5) ===
      Trigger.ProcessingTime(5L * 60 * 1000))
  }

  test("processing-time triggered stream drains batches on cadence") {
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "100")
      .load()
      .groupBy(window(col("timestamp"), "1 second"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("m"))
      .writeStream.format("memory").queryName("pt_mode")
      .outputMode("complete")
      .trigger(Trigger.ProcessingTime(300))
      .start()
    try {
      Thread.sleep(2500)
      q.processAllAvailable()
      assert(spark.table("pt_mode").count() > 0)
    } finally q.stop()
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{StreamingSessionize, TwsSessionize}

/** The transformWithState sessionizer must equal the
  * flatMapGroupsWithState one row-for-row on the real corpus replayed
  * across micro-batches, and its native TTL must evict idle users (state
  * reads as absent => a new numbering epoch), mirroring
  * StreamingEvictionSpec's contract for the fmgws variant.
  */
class TwsSessionizeSpec extends SparkSpec {

  private def withRocksDb[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState == flatMapGroupsWithState on the real corpus across batches") {
    val ev = Tables.events(spark, sfDir)
      .withColumn("tsu", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"), col("tsu"))
    val cut = unix_micros(to_timestamp(lit("2024-01-16")))
    val dir = Files.createTempDirectory("graft-twssess-").toString
    ev.filter(col("tsu") < cut).coalesce(1).write.parquet(s"$dir/in")
    ev.filter(col("tsu") >= cut).coalesce(1).write.mode("append").parquet(s"$dir/in")

    val gap = 6L * 3600L * 1000000L
    def src() = spark.readStream.schema(spark.read.parquet(s"$dir/in").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    def drain(name: String, df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        spark.table(name).collect()
          .map(r => r.getAs[Long]("id") -> r.getAs[Long]("session_idx")).toMap
      } finally q.stop()
    }
    val tws = withRocksDb {
      drain("twssess", TwsSessionize.assign(
        src(), "user_id", "tsu", "event_id", gap).toDF())
    }
    val fmgws = drain("fmgwssess", StreamingSessionize.assign(
      src(), "user_id", "tsu", "event_id", gap).toDF())
    assert(tws === fmgws, "the two state APIs must assign identical session ids")
    assert(tws.values.max > 1L, "corpus produces multi-session users")
  }

  test("native TTL evicts an idle user: the next event starts a fresh numbering epoch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-twsttl-").toString
    // two sessions before the idle gap (gap 1000 between t=100 and t=5000),
    // then an event INSIDE the gap of the last one — only TTL eviction can
    // send it back to session 1. TimeMode.ProcessingTime keeps scheduling
    // batches, so processAllAvailable never quiesces — poll cumulative
    // numInputRows instead (the StreamingEvictionSpec harness).
    Seq((1L, 4L, 100L), (2L, 4L, 5000L)).toDF("event_id", "user_id", "tsu")
      .coalesce(1).write.parquet(s"$dir/in")
    withRocksDb {
      val stream = TwsSessionize.assign(
        spark.readStream.schema(spark.read.parquet(s"$dir/in").schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$dir/in"),
        "user_id", "tsu", "event_id", gapMicros = 1000L, idleTimeoutMs = 2000L)
      val q = stream.toDF().writeStream.format("memory").queryName("twsttl")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
        .start()
      def awaitInput(n: Long): Unit = {
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (q.recentProgress.map(_.numInputRows).sum < n) {
          if (q.exception.isDefined) throw q.exception.get
          require(System.nanoTime() < deadline, s"query never consumed $n input rows")
          Thread.sleep(100)
        }
      }
      try {
        awaitInput(2)
        Thread.sleep(3500) // let the TTL expire in wall-clock time
        Seq((3L, 4L, 5500L)).toDF("event_id", "user_id", "tsu")
          .coalesce(1).write.mode("append").parquet(s"$dir/in")
        awaitInput(3)
        val got = spark.table("twsttl").collect()
          .map(r => r.getAs[Long]("id") -> r.getAs[Long]("session_idx")).toMap
        assert(got(1L) === 1L && got(2L) === 2L)
        assert(got(3L) === 1L,
          "expired state reads as absent: the small-gap event opens epoch-2 session 1")
      } finally q.stop()
    }
  }
}

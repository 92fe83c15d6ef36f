package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{StreamingVelocity, TwsVelocity}

/** The transformWithState velocity operator must equal the
  * flatMapGroupsWithState one row-for-row on the real corpus replayed
  * across micro-batches, and its native TTL must evict an idle user's
  * retained points (state reads as absent => trailing windows restart
  * empty), mirroring StreamingEvictionSpec's contract.
  */
class TwsVelocitySpec extends SparkSpec {

  private def withRocksDb[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  private val hour = 3600L * 1000000L

  test("transformWithState == flatMapGroupsWithState on the real corpus across batches") {
    val ev = Tables.events(spark, sfDir)
      .withColumn("tsu", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"), col("value"), col("tsu"))
    val cut = unix_micros(to_timestamp(lit("2024-01-16")))
    val dir = Files.createTempDirectory("graft-twsvel-").toString
    ev.filter(col("tsu") < cut).coalesce(1).write.parquet(s"$dir/in")
    ev.filter(col("tsu") >= cut).coalesce(1).write.mode("append").parquet(s"$dir/in")

    def src() = spark.readStream.schema(spark.read.parquet(s"$dir/in").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    def drain(name: String, df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] = {
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        spark.table(name).collect()
          .map(r => r.getAs[Long]("id") ->
            (r.getAs[Long]("prev_n"), r.getAs[Long]("prev_sum_micro"))).toMap
      } finally q.stop()
    }
    val tws = withRocksDb {
      drain("twsvel", TwsVelocity.features(
        src(), "user_id", "tsu", "value", "event_id", hour).toDF())
    }
    val fmgws = drain("fmgwsvel", StreamingVelocity.features(
      src(), "user_id", "tsu", "value", "event_id", hour).toDF())
    assert(tws === fmgws, "the two state APIs must compute identical windows")
    assert(tws.values.exists(_._1 > 0L), "corpus produces non-empty trailing windows")
  }

  test("native TTL evicts idle-user points: the next event sees an empty window") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-twsvelttl-").toString
    // one point at t=100; after TTL expiry a point at t=200 arrives —
    // with live state its trailing 1000us window would hold (n=1,
    // sum=1e6); only eviction explains an empty window
    Seq((1L, 4L, 1.0, 100L)).toDF("event_id", "user_id", "value", "tsu")
      .coalesce(1).write.parquet(s"$dir/in")
    withRocksDb {
      val stream = TwsVelocity.features(
        spark.readStream.schema(spark.read.parquet(s"$dir/in").schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$dir/in"),
        "user_id", "tsu", "value", "event_id", lookbackMicros = 1000L,
        idleTimeoutMs = 2000L)
      val q = stream.toDF().writeStream.format("memory").queryName("twsvelttl")
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
        awaitInput(1)
        Thread.sleep(3500) // let the TTL expire in wall-clock time
        Seq((2L, 4L, 2.0, 200L)).toDF("event_id", "user_id", "value", "tsu")
          .coalesce(1).write.mode("append").parquet(s"$dir/in")
        awaitInput(2)
        val got = spark.table("twsvelttl").collect()
          .map(r => r.getAs[Long]("id") ->
            (r.getAs[Long]("prev_n"), r.getAs[Long]("prev_sum_micro"))).toMap
        assert(got(1L) === ((0L, 0L)))
        assert(got(2L) === ((0L, 0L)),
          "expired points read as absent: the post-TTL event's window is empty")
      } finally q.stop()
    }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{StreamingFunnel, TwsFunnel}

/** The transformWithState funnel must equal the flatMapGroupsWithState
  * one row-for-row on the real corpus replayed across micro-batches, and
  * its native TTL must evict an idle user's partial chain (state reads
  * as absent => a fresh funnel attempt), mirroring StreamingEvictionSpec's
  * contract for the fmgws variant.
  */
class TwsFunnelSpec extends SparkSpec {

  private def withRocksDb[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  private val steps = Seq("view", "click", "purchase")
  private val day = 86400L * 1000000L

  test("transformWithState == flatMapGroupsWithState on the real corpus across batches") {
    val ev = Tables.events(spark, sfDir)
      .withColumn("tsu", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"), col("event_type"), col("tsu"))
    val cut = unix_micros(to_timestamp(lit("2024-01-16")))
    val dir = Files.createTempDirectory("graft-twsfun-").toString
    ev.filter(col("tsu") < cut).coalesce(1).write.parquet(s"$dir/in")
    ev.filter(col("tsu") >= cut).coalesce(1).write.mode("append").parquet(s"$dir/in")

    def src() = spark.readStream.schema(spark.read.parquet(s"$dir/in").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    // latest progress row per user = the funnel chain as of stream end
    def drain(name: String, df: org.apache.spark.sql.DataFrame): Map[Long, (Seq[Long], Int, Boolean)] = {
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        spark.table(name).collect()
          .map(r => (r.getAs[Long]("user"),
            (r.getAs[Seq[Long]]("times"), r.getAs[Int]("nSteps"),
              r.getAs[Boolean]("converted"))))
          .groupBy(_._1).view
          // append-mode progress rows are monotone: the chain only fills,
          // so the row with the most filled slots is the final one
          .mapValues(_.map(_._2).maxBy(_._1.count(_ != -1L))).toMap
      } finally q.stop()
    }
    val tws = withRocksDb {
      drain("twsfun", TwsFunnel.progress(
        src(), "user_id", "event_type", "tsu", "event_id", steps, day).toDF())
    }
    val fmgws = drain("fmgwsfun", StreamingFunnel.progress(
      src(), "user_id", "event_type", "tsu", "event_id", steps, day).toDF())
    assert(tws === fmgws, "the two state APIs must build identical chains")
    assert(tws.values.exists(_._3), "corpus produces converted users")
  }

  test("native TTL evicts an idle user's partial chain: next event restarts the funnel") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-twsfunttl-").toString
    // view at t=100 starts a chain; after TTL expiry a click at t=200
    // arrives — with live state it would fill step 1 (chain 100,200,-1);
    // only eviction explains an empty output (click can't start a chain)
    Seq((1L, 4L, "view", 100L)).toDF("event_id", "user_id", "event_type", "tsu")
      .coalesce(1).write.parquet(s"$dir/in")
    withRocksDb {
      val stream = TwsFunnel.progress(
        spark.readStream.schema(spark.read.parquet(s"$dir/in").schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$dir/in"),
        "user_id", "event_type", "tsu", "event_id", steps, day,
        idleTimeoutMs = 2000L)
      val q = stream.toDF().writeStream.format("memory").queryName("twsfunttl")
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
        Seq((2L, 4L, "click", 200L)).toDF("event_id", "user_id", "event_type", "tsu")
          .coalesce(1).write.mode("append").parquet(s"$dir/in")
        awaitInput(2)
        val rows = spark.table("twsfunttl").collect()
          .map(r => (r.getAs[Long]("user"), r.getAs[Seq[Long]]("times")))
        assert(rows.length === 1 && rows.head._2 === Seq(100L, -1L, -1L),
          "expired chain reads as absent: the orphan click emits nothing")
      } finally q.stop()
    }
  }
}

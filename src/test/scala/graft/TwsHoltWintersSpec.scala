package graft

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.streaming.{ContinuousHoltWinters, TwsHoltWinters}
import graft.streaming.ContinuousHolt.Sample

/** The transformWithState Holt-Winters (RocksDB store) must produce the
  * same final (level, trend, season, forecast) as the single global
  * integer fold per key — all three forms (batch aggregator, fMGWS,
  * tws) share the literal wintersStep, and this pins the tws wiring.
  */
class TwsHoltWintersSpec extends SparkSpec {

  test("transformWithState Holt-Winters == global fold oracle across micro-batches") {
    val period = 5
    val samples = (1 to 250).map { i =>
      Sample(key = s"k${i % 2}", ts = i.toLong, seq = i.toLong,
        price = Seq(3.0, 9.0, 6.0, 15.0, 1.0)(i % period) + i * 0.02)
    }
    // foldBatch contract: (ts, seq) unique per key (strict high-water mark)
    assert(samples.map(s => (s.key, s.ts, s.seq)).distinct.size ==
      samples.size)
    val dir = Files.createTempDirectory("graft-twshw-").toString
    samples.grouped(90).zipWithIndex.foreach { case (chunk, i) =>
      spark.createDataset(chunk)(Encoders.product[Sample])
        .coalesce(1).write.parquet(s"$dir/p_$i")
    }
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(Encoders.product[Sample].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/p_*")
      val out = TwsHoltWinters.run(
        stream.as[Sample](Encoders.product[Sample]),
        300000L, 100000L, 200000L, period)
      val q = out.writeStream.format("memory").queryName("tws_hw")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("tws_hw")
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("key").orderBy(col("n").desc)))
          .filter(col("rn") === 1)
          .select("key", "level_micro", "trend_micro", "season_micro",
            "forecast_micro")
          .collect()
          .map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
        val want = ContinuousHoltWinters.batchOracle(
          samples, 300000L, 100000L, 200000L, period)
        assert(got.keySet === want.keySet)
        got.foreach { case (k, (l, b, sn, f)) =>
          val w = want(k)
          assert((l, b, sn, f) === ((w.level_micro, w.trend_micro,
            w.season_micro, w.forecast_micro)),
            s"key $k diverged from the global fold")
        }
        // the replay exercised cross-batch state
        assert(spark.table("tws_hw").groupBy("key").count()
          .collect().forall(_.getLong(1) > 1L))
      } finally q.stop()
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}

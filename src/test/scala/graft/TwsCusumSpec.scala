package graft

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.streaming.{ContinuousCusum, TwsCusum}
import graft.streaming.ContinuousCusum.Sample

/** The transformWithState CUSUM (RocksDB store) must produce the same
  * final (statistics, alarm counts, first alarm) as the single global
  * fold per key — all three forms (batch UDAF, fMGWS, tws) share the
  * literal CusumFunctions.step, and this pins the tws wiring.
  */
class TwsCusumSpec extends SparkSpec {

  test("transformWithState CUSUM == global fold oracle across micro-batches") {
    val samples = (1 to 240).map { i =>
      Sample(key = s"k${i % 2}", ord = f"t$i%04d", seq = i.toLong,
        dev_micro = ((i % 19) - 9).toLong * 1000000L)
    }
    // foldBatch contract: (ord, seq) unique per key (strict high-water mark)
    assert(samples.map(s => (s.key, s.ord, s.seq)).distinct.size ==
      samples.size)
    val dir = Files.createTempDirectory("graft-twscusum-").toString
    samples.grouped(80).zipWithIndex.foreach { case (chunk, i) =>
      spark.createDataset(chunk)(Encoders.product[Sample])
        .coalesce(1).write.parquet(s"$dir/p_$i")
    }
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(Encoders.product[Sample].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/p_*")
      val out = TwsCusum.run(
        stream.as[Sample](Encoders.product[Sample]), 1000000L, 5000000L)
      val q = out.writeStream.format("memory").queryName("tws_cusum")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("tws_cusum")
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("key").orderBy(col("n").desc)))
          .filter(col("rn") === 1)
          .select("key", "s_hi_micro", "s_lo_micro", "alarms_hi",
            "alarms_lo", "first_alarm")
          .collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getString(5)))).toMap
        val want = ContinuousCusum.batchOracle(samples, 1000000L, 5000000L)
        assert(got.keySet === want.keySet)
        got.foreach { case (k, g) =>
          val w = want(k)
          assert(g === ((w.s_hi_micro, w.s_lo_micro, w.alarms_hi,
            w.alarms_lo, w.first_alarm)),
            s"key $k diverged from the global fold")
        }
        assert(want.values.map(w => w.alarms_hi + w.alarms_lo).sum > 0)
      } finally q.stop()
    } finally {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    }
  }
}

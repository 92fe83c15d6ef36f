package graft

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.streaming.{ContinuousEwma, TwsEwma}
import graft.streaming.ContinuousEwma.Sample

/** transformWithState variant must produce the same final running EWMA as
  * the flatMapGroupsWithState variant and the single-fold oracle.
  */
class TwsEwmaSpec extends SparkSpec {

  test("transformWithState EWMA == global fold oracle across micro-batches") {
    import spark.implicits._
    val alpha = 0.2
    val samples = (1 to 240).map { i =>
      Sample(key = s"k${i % 2}", ts = i.toLong, seq = i.toLong, price = (i % 13) + 0.5)
    }
    val dir = Files.createTempDirectory("graft-tws-").toString
    samples.grouped(80).zipWithIndex.foreach { case (chunk, i) =>
      spark.createDataset(chunk).coalesce(1).write.parquet(s"$dir/p_$i")
    }
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(Encoders.product[Sample].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/p_*")
      val out = TwsEwma.run(stream.as[Sample], alpha)
      val q = out.writeStream.format("memory").queryName("tws_ewma")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("tws_ewma")
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("key").orderBy(col("n").desc)))
          .filter(col("rn") === 1)
          .select("key", "current").collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        val want = ContinuousEwma.batchOracle(samples, alpha)
        assert(got.keySet === want.keySet)
        got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"key $k") }
      } finally q.stop()
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{StreamingLshDedup, TwsLshDedup}

/** The transformWithState LSH dedup must emit the IDENTICAL candidate
  * multiset as the flatMapGroupsWithState variant on the real corpus
  * replayed across micro-batches — they share the literal per-bucket
  * fold, and this spec keeps that honest — and its native TTL must
  * evict cold buckets (state reads as absent => a re-arrival pairs
  * against nothing), mirroring the sessionize/funnel/velocity tws
  * contracts.
  */
class TwsLshDedupSpec extends SparkSpec {

  private def withRocksDb[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  private def drain(name: String, df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table(name).collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSeq.sorted
    } finally q.stop()
  }

  test("transformWithState == flatMapGroupsWithState candidate multiset " +
      "on the corpus across micro-batches") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val dir = Files.createTempDirectory("graft-twslsh-").toString
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(s"$dir/in")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(s"$dir/in")
    def src() = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val tws = withRocksDb {
      drain("twslsh", TwsLshDedup.candidates(src(), "text", "doc_id").toDF())
    }
    val fmgws = drain("fmgwslsh",
      StreamingLshDedup.candidates(src(), "text", "doc_id").toDF())
    assert(tws === fmgws,
      "the two state APIs must emit identical candidate multisets")
    assert(tws.nonEmpty, "the corpus has near-dup candidates")
  }

  test("native bucket TTL evicts cold history: a duplicate re-arrival " +
      "after expiry pairs against nothing") {
    import spark.implicits._
    val text = "a b c d e f g h i j k l"
    // TimeMode.ProcessingTime keeps scheduling batches, so
    // processAllAvailable never quiesces — poll cumulative numInputRows
    // instead (the TwsSessionizeSpec TTL harness)
    def run(ttlMs: Long, secondDoc: Long): Seq[(Long, Long)] = {
      // fresh dir per run — the two runs must not see each other's files
      val dir = Files.createTempDirectory(s"graft-twslshttl$secondDoc-").toString
      Seq((1L, text)).toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/in")
      withRocksDb {
        val q = TwsLshDedup.candidates(
            spark.readStream.schema(spark.read.parquet(s"$dir/in").schema)
              .option("maxFilesPerTrigger", 1).parquet(s"$dir/in"),
            "text", "doc_id", bucketTtlMs = ttlMs)
          .toDF().writeStream.format("memory")
          .queryName(s"twslshttl$secondDoc").outputMode("append")
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
          if (ttlMs > 0) Thread.sleep(ttlMs + 1500)
          Seq((secondDoc, text)).toDF("doc_id", "text").coalesce(1)
            .write.mode("append").parquet(s"$dir/in")
          awaitInput(2)
          spark.table(s"twslshttl$secondDoc").collect()
            .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSeq
        } finally q.stop()
      }
    }
    // no TTL: the duplicate pairs against doc 1
    assert(run(0L, 2L).contains((1L, 2L)))
    // 1s TTL + sleep past it: the bucket expired, nothing to pair against
    assert(run(1000L, 3L).isEmpty)
  }
}

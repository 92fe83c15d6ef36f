package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamingLshDedup

/** The streaming LSH candidate stream must find exactly the pairs the
  * batch banding finds on the same corpus — including pairs whose two
  * docs arrive in DIFFERENT micro-batches (the whole point of the
  * per-bucket state).
  */
class StreamingLshDedupSpec extends SparkSpec {
  import spark.implicits._

  test("two-batch replay finds the batch LSH candidate set, across batches") {
    val docs = Tables.table(spark, sfDir, "documents").select("doc_id", "text")
    val batchPairs = Dedup.minhashLshCandidates(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs.nonEmpty, "test corpus must contain near-dups")

    // split the corpus into two parquet files -> two micro-batches, so
    // some near-dup pairs straddle the batch boundary
    val dir = Files.createTempDirectory("graft-slsh-").toString
    val n = docs.count()
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(dir)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(dir)

    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    val q = StreamingLshDedup.candidates(stream, "text", "doc_id")
      .writeStream.format("memory").queryName("slsh_pairs")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("slsh_pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batchPairs,
      s"missing=${batchPairs -- streamed} extra=${streamed -- batchPairs}")
    require(n > 0)
  }

  test("re-sent documents are absorbed idempotently (at-least-once upstream)") {
    val docs = Tables.table(spark, sfDir, "documents").select("doc_id", "text").limit(50)
    val dir = Files.createTempDirectory("graft-slsh-dup-").toString
    // the same file content delivered twice
    docs.coalesce(1).write.mode("append").parquet(dir)
    docs.coalesce(1).write.mode("append").parquet(dir)

    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    val q = StreamingLshDedup.candidates(stream, "text", "doc_id")
      .writeStream.format("memory").queryName("slsh_dup_pairs")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val pairs = spark.table("slsh_dup_pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // a redelivered doc never pairs with itself and never re-emits
    // candidate pairs beyond the per-band duplicates of the first delivery
    assert(pairs.forall { case (a, b) => a < b })
    val want = Dedup.minhashLshCandidates(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.toSet === want)
  }
}

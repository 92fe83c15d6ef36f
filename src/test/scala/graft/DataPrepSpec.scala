package graft

import org.apache.spark.sql.functions._

import graft.operators.DataPrep

/** Pins the deterministic-split boundary semantics and the chunking
  * arithmetic the oracle queries exercise at only one parameter point.
  */
class DataPrepSpec extends SparkSpec {

  private lazy val docs = Tables.table(spark, sfDir, "documents").cache()

  test("hashSplit boundaries: trainBps=10000 is all train, trainBps=0 is all test") {
    val allTrain = DataPrep.hashSplit(docs, "doc_id", trainBps = 10000)
    assert(allTrain.filter(col("split") =!= "train").count() === 0L)
    val allTest = DataPrep.hashSplit(docs, "doc_id", trainBps = 0)
    assert(allTest.filter(col("split") =!= "test").count() === 0L)
  }

  test("hashSplit is deterministic and roughly proportional") {
    val n = docs.count().toDouble
    val split = DataPrep.hashSplit(docs, "doc_id", trainBps = 8000)
    val trainFrac = split.filter(col("split") === "train").count() / n
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction $trainFrac vs 0.8 target")
    // stable under repartitioning: a doc's split never depends on other rows
    val again = DataPrep.hashSplit(docs.repartition(7), "doc_id", trainBps = 8000)
    val moved = split.select("doc_id", "split")
      .except(again.select("doc_id", "split")).count()
    assert(moved === 0L)
  }

  test("chunkTokens covers every token exactly once at stride == chunkSize") {
    val chunks = DataPrep.chunkTokens(docs, "text", "doc_id", chunkSize = 32, stride = 32)
    val covered = chunks.agg(sum(col("chunk_len"))).head().getLong(0)
    val total = docs
      .select(graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(covered === total)
  }
}

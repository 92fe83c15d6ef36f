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

  test("packSequences: cumulative-offset invariants (monotone packs, bounded overflow)") {
    val packed = DataPrep.packSequences(docs, "text", "doc_id", "lang", budget = 128)
      .collect().map(r => (r.getString(r.fieldIndex("grp")), r.getLong(r.fieldIndex("doc")),
        r.getInt(r.fieldIndex("n_tok")).toLong, r.getLong(r.fieldIndex("pack_id"))))
    assert(packed.nonEmpty)
    packed.groupBy(_._1).foreach { case (grp, rows) =>
      val ordered = rows.sortBy(_._2)
      // packs start at 0 and never decrease in doc order
      assert(ordered.head._4 === 0L, s"$grp: first pack must be 0")
      ordered.sliding(2).foreach {
        case Array((_, _, prevTok, prevPack), (_, d, _, pack)) =>
          assert(pack >= prevPack, s"$grp/$d: pack went backwards")
          // a jump of more than one pack needs an oversize doc spanning windows
          if (pack > prevPack + 1)
            assert(prevTok > 128, s"$grp/$d: pack skipped without an oversize doc")
        case _ => ()
      }
      // cumulative-offset bound: a pack holds at most budget + maxDoc - 1 tokens
      val maxTok = ordered.map(_._3).max
      ordered.groupBy(_._4).foreach { case (p, members) =>
        val total = members.map(_._3).sum
        assert(total <= 128 + maxTok - 1, s"$grp pack $p: $total tokens breaks the bound")
      }
    }
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

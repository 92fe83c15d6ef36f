package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("sampleFrames: empty payload yields ZERO frames (no phantom sequence(0,-1))") {
    import spark.implicits._
    val docs = Seq((1L, "hello world, this is a payload"), (2L, "")).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(Multimodal.withBinary(docs), frameBytes = 8)
    val byDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.get(2L).isEmpty, "empty doc must produce no frames")
    assert(byDoc(1L) === math.ceil(30 / 8.0).toLong)
    assert(frames.filter(col("frame_idx") < 0).count() === 0)
    // frames reassemble to the original payload
    val reassembled = frames.filter(col("doc_id") === 1L)
      .orderBy("frame_idx").collect()
      .map(_.getAs[Array[Byte]]("frame")).reduce(_ ++ _)
    assert(new String(reassembled, "UTF-8") === "hello world, this is a payload")
  }

  test("withBinary meta matches payload length") {
    import spark.implicits._
    val docs = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.withBinary(docs)
      .select(col("doc_id"), octet_length(col("payload")).as("n"), col("media_meta.n_bytes"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
    out.foreach { case (_, n, meta) => assert(n === meta) }
  }
}

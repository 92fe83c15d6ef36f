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

  test("dhashBits matches a MessageDigest replica; 56 bits, non-negative") {
    import spark.implicits._
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    def refDhash(payload: String): Long = {
      val h0 = md5hex(payload)
      val ch = (0 until 4).map(i => md5hex(s"$h0:$i")).mkString
      val px = (0 until 64).map(j =>
        Integer.parseInt(ch.substring(2 * j, 2 * j + 2), 16))
      (for (r <- 0 until 8; c <- 0 until 7) yield
        if (px(8 * r + c) > px(8 * r + c + 1)) 1L << (7 * r + c) else 0L).sum
    }
    val docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "zzz"))
      .toDF("doc_id", "t").withColumn("payload", encode(col("t"), "UTF-8"))
    val got = Multimodal.dhashBits(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === refDhash("hello world"))
    assert(got(1L) === got(2L))
    assert(got(3L) === refDhash("zzz"))
    got.values.foreach(h => assert(h >= 0L && h < (1L << 56)))
  }

  test("dhashNearDups: exact duplicates pair at hamming 0; banding equals " +
      "brute force on a small corpus; guard rejects maxHamming >= bands") {
    import spark.implicits._
    val docs = (1L to 30L).map(i => (i, s"payload ${i % 7}"))
      .toDF("doc_id", "t").withColumn("payload", encode(col("t"), "UTF-8"))
    val got = Multimodal.dhashNearDups(docs, "doc_id", maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force over the operator's own hashes
    val hashes = Multimodal.dhashBits(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      hm = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if hm <= 3
    } yield (a, b) -> hm.toLong).toMap
    assert(got === brute)
    // the i % 7 construction makes duplicate classes: all pairs hamming 0
    assert(got.nonEmpty && got.values.forall(_ === 0L))
    intercept[IllegalArgumentException] {
      Multimodal.dhashNearDups(docs, "doc_id", maxHamming = 4, bands = 4)
    }
  }
}

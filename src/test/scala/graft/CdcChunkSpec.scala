package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Content-defined chunking (Dedup.cdcChunks / cdcDedup): the general
  * contracts the q306/q307 oracles only exercise on the synthesized
  * corpus shapes — exact tiling, hash-of-tile, shift resistance as a
  * THEOREM (suffix chunks coincide, in order), degenerate docs, and the
  * cross-doc-only duplication rule.
  */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  // long enough that window=8/rate=32/256 yields several interior
  // boundaries; content arbitrary
  private val textA = "the quick brown fox jumps over the lazy dog and " +
    "then runs far away into the deep dark woods where nobody ever goes " +
    "at all on any night of the year no matter the weather"

  private def chunksOf(rows: Seq[(Long, String)]) =
    Dedup.cdcChunks(rows.toDF("doc_id", "text"), "text", "doc_id",
        window = 8, boundaryHex = "20")
      .orderBy("doc", "chunk_no").collect()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("chunks tile the document exactly and hash their own tile") {
    val ch = chunksOf(Seq((1L, textA)))
    assert(ch.length >= 4, s"expected several chunks, got ${ch.length}")
    var pos = 1L
    ch.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("chunk_no") === i.toLong)
      assert(r.getAs[Long]("c_start") === pos)
      assert(r.getAs[Long]("chunk_len") >= 1L)
      pos += r.getAs[Long]("chunk_len")
    }
    assert(pos === textA.length + 1L, "tiles must cover [1, len] exactly")
    ch.foreach { r =>
      val s = r.getAs[Long]("c_start").toInt - 1
      val e = s + r.getAs[Long]("chunk_len").toInt
      assert(r.getAs[String]("chunk_hash") === md5hex(textA.substring(s, e)))
    }
  }

  test("shift resistance: a prefix-shifted copy's chunks realign after " +
      "the first boundary — every suffix chunk hash coincides in order") {
    val ch = chunksOf(Seq((1L, textA), (2L, "PREFIX>> " + textA)))
    val a = ch.filter(_.getAs[Long]("doc") == 1L)
      .map(_.getAs[String]("chunk_hash")).toSeq
    val b = ch.filter(_.getAs[Long]("doc") == 2L)
      .map(_.getAs[String]("chunk_hash")).toSeq
    assert(a.length >= 3, "need interior boundaries for the claim to bite")
    // boundaries at content positions >= window are a pure function of
    // the window CONTENT, so original boundaries k=1.. map 1:1 into the
    // shifted copy: its last |a|-1 chunks ARE the original's, in order
    assert(b.takeRight(a.length - 1) === a.drop(1))
    // and fixed-offset blocking would NOT have survived: offsets all moved
    assert(b !== a)
  }

  test("degenerate docs: empty -> no rows; len <= window -> one chunk") {
    val ch = chunksOf(Seq((1L, ""), (2L, "abcdefgh"), (3L, "xy")))
    assert(!ch.exists(_.getAs[Long]("doc") == 1L))
    val d2 = ch.filter(_.getAs[Long]("doc") == 2L)
    assert(d2.length === 1 && d2.head.getAs[Long]("chunk_len") === 8L)
    val d3 = ch.filter(_.getAs[Long]("doc") == 3L)
    assert(d3.length === 1 && d3.head.getAs[Long]("chunk_len") === 2L)
  }

  test("cdcDedup: identical docs full coverage, unique doc zero, " +
      "within-doc repetition does NOT count (cross-doc df only)") {
    val uniq = "zq0 vx1 wj2 kp3 mh4 ng5 rb6 td7 lc8 fs9 yd10 qa11 ze12 " +
      "wr13 ty14 ui15 op16 as17 df18 gh19 jk20 lz21 xc22 vb23 nm24"
    val rep = "repeated block of text that goes on for quite a while " +
      "with enough length to chunk "
    val rows = Seq((1L, textA), (2L, textA), (3L, uniq), (4L, rep + rep))
    val out = Dedup.cdcDedup(rows.toDF("doc_id", "text"), "text", "doc_id",
        window = 8, boundaryHex = "20")
      .orderBy("doc").collect()
    val byDoc = out.map(r => r.getAs[Long]("doc") -> r).toMap
    assert(byDoc(1L).getAs[Long]("dup_bps") === 10000L)
    assert(byDoc(2L).getAs[Long]("dup_bps") === 10000L)
    assert(byDoc(3L).getAs[Long]("dup_bps") === 0L)
    // doc 4 repeats its own chunks but shares none with other docs
    assert(byDoc(4L).getAs[Long]("dup_bps") === 0L)
    // sanity on the ledger arithmetic
    out.foreach { r =>
      assert(r.getAs[Long]("n_dup_chunks") <= r.getAs[Long]("n_chunks"))
      assert(r.getAs[Long]("dup_chars") <= r.getAs[Long]("total_chars"))
    }
  }

  test("cdcDedupAgainstBase: shifted copy of a base doc scores dup_base, " +
      "a delta-only pair scores dup_delta, unique delta scores zero") {
    val uniq = "zq0 vx1 wj2 kp3 mh4 ng5 rb6 td7 lc8 fs9 yd10 qa11 ze12 " +
      "wr13 ty14 ui15 op16 as17 df18 gh19 jk20 lz21 xc22 vb23 nm24"
    val pair = "a wholly delta-side passage that appears twice in this " +
      "batch and nowhere in the stored corpus at all, long enough to chunk"
    val base = Seq((1L, textA)).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "PREFIX>> " + textA), // shifted copy of base doc 1
      (11L, pair), (12L, pair),   // delta-only duplicate pair
      (13L, uniq))                // unique
      .toDF("doc_id", "text")
    val out = Dedup.cdcDedupAgainstBase(
        Dedup.cdcChunks(base, "text", "doc_id", 8, "20"), delta,
        "text", "doc_id", window = 8, boundaryHex = "20")
      .collect().map(r => r.getAs[Long]("doc") -> r).toMap
    assert(out.keySet === Set(10L, 11L, 12L, 13L)) // base docs never output
    // doc 10: every chunk after the first realigned boundary is in base
    // (the few leading chunks overlapping the prefix may not be)
    assert(out(10L).getAs[Long]("dup_base_chunks") >=
      out(10L).getAs[Long]("n_chunks") - 3L)
    assert(out(10L).getAs[Long]("dup_base_chunks") >= 1L)
    assert(out(10L).getAs[Long]("dup_delta_chunks") === 0L)
    assert(out(10L).getAs[Long]("dup_bps") > 5000L)
    // the pair: full coverage, all of it delta-class
    Seq(11L, 12L).foreach { d =>
      assert(out(d).getAs[Long]("dup_bps") === 10000L)
      assert(out(d).getAs[Long]("dup_base_chunks") === 0L)
      assert(out(d).getAs[Long]("dup_delta_chunks") ===
        out(d).getAs[Long]("n_chunks"))
    }
    assert(out(13L).getAs[Long]("dup_bps") === 0L)
  }

  test("cdcChunks matches across repartitioning (map-only determinism)") {
    val df = Seq((1L, textA), (2L, "PREFIX>> " + textA), (3L, "abcdefgh"))
      .toDF("doc_id", "text")
    val one = Dedup.cdcChunks(df.repartition(1), "text", "doc_id")
      .orderBy("doc", "chunk_no").collect().toSeq
    val many = Dedup.cdcChunks(df.repartition(7), "text", "doc_id")
      .orderBy("doc", "chunk_no").collect().toSeq
    assert(one === many)
  }
}

package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ExpectsInputTypes, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Bloom-filter build/probe columns. Spark ships `BloomFilterAggregate` /
  * `BloomFilterMightContain` for its own runtime join filtering but does
  * not register them as SQL functions; this facade exposes them as
  * Columns so a pipeline can build a compact key filter on a small
  * relation and pre-prune a huge scan before the shuffle — the standard
  * semi-join reduction at the 100 TB design point.
  *
  * It also hosts [[BloomHitCountMd5]], the codegen'd probe loop of the
  * ENGINE-PORTABLE bloom filter used by decontamination
  * ([[graft.operators.TextPipeline.bloomContaminated]]): positions are
  * md5-derived so any engine can rebuild the identical filter, but the
  * hot corpus-side probe runs as one compiled loop per document instead
  * of an interpreted md5→hex→conv expression chain per shingle per hash.
  */
object FilterExprs {

  /** Aggregate: a serialized bloom filter over xxhash64-ed long inputs.
    * `expectedItems`/`numBits` size the filter (fpp ~ standard formulas).
    */
  def bloomFilterAgg(hashedKey: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(
        ExpressionUtils.expression(hashedKey),
        Literal(expectedItems), Literal(numBits))
        .toAggregateExpression())

  /** Probe: true if the (possibly) serialized filter may contain the hash. */
  def mightContain(bloom: Column, hashedValue: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(
        ExpressionUtils.expression(bloom),
        ExpressionUtils.expression(hashedValue)))

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Position j of shingle digest d: hex chars [8j+1 .. 8j+8] of the md5
    * hex string — i.e. digest bytes 4j..4j+3 read big-endian as an
    * unsigned 32-bit value — mod mBits. Identical to SQL
    * `conv(substring(md5(s), 1 + 8*j, 8), 16, 10) % mBits`, which is how
    * the filter BUILD side (and the DuckDB oracle) computes it.
    */
  def md5BloomPosition(d: Array[Byte], j: Int, mBits: Int): Long = {
    val v = ((d(4 * j) & 0xFFL) << 24) | ((d(4 * j + 1) & 0xFFL) << 16) |
      ((d(4 * j + 2) & 0xFFL) << 8) | (d(4 * j + 3) & 0xFFL)
    v % mBits
  }

  /** DISTINCT-shingle bloom hit count, straight from the TOKEN array: for
    * each word-k-shingle (tokens i..i+k-1 joined by ' '; fewer than k
    * tokens yield ONE shingle = the whole sequence, mirroring
    * `concat_ws(" ", slice(w, i, k))`), compute md5 via incremental
    * digest updates — the shingle string is never materialized — and
    * count DISTINCT shingles (by full 128-bit digest) whose kHashes bits
    * are all set in `words` (bit p lives in words(p/32), mask
    * 1L << (p%32) — the 32-bit word layout the portable SQL build uses).
    * Tokens must be non-null (the upstream tokenizer filters empties).
    */
  def bloomShingleHitsMd5(
      tokens: ArrayData, words: Array[Long], mBits: Int, kHashes: Int, k: Int): Long = {
    val md = md5Digest.get()
    val m = tokens.numElements()
    val toks = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) { toks(i) = tokens.getUTF8String(i).getBytes; i += 1 }
    val nOut = if (m <= k) 1 else m - k + 1
    val span = if (m <= k) m else k
    // distinct on the full digest: equality up to md5 collisions, the
    // same identity the filter positions themselves are derived from
    val seen = new java.util.HashSet[java.nio.ByteBuffer]()
    var hits = 0L
    i = 0
    while (i < nOut) {
      md.reset()
      var t = 0
      while (t < span) {
        if (t > 0) md.update(' '.toByte)
        md.update(toks(i + t))
        t += 1
      }
      val d = md.digest()
      if (seen.add(java.nio.ByteBuffer.wrap(d))) {
        var ok = true
        var j = 0
        while (ok && j < kHashes) {
          val p = md5BloomPosition(d, j, mBits)
          ok = (words((p / 32).toInt) & (1L << (p % 32).toInt)) != 0L
          j += 1
        }
        if (ok) hits += 1
      }
      i += 1
    }
    hits
  }

  /** Codegen'd portable-bloom probe over an `array<string>` TOKEN column
    * against an mBits-bit filter materialized as `Array[Long]` 32-bit
    * words. The higher-order-function formulation of the same probe
    * materialized every shingle string, array_distinct'ed them, and
    * evaluated a ~4-expression md5 chain per (shingle × hash),
    * interpreted — 17.5 s at sf0.1; this runs the identical semantics as
    * one compiled loop per document (~1 s).
    */
  case class BloomShingleHitCountMd5(
      child: Expression, words: Array[Long], mBits: Int, kHashes: Int, shingleK: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(mBits >= 32 && mBits % 32 == 0, "mBits must be a positive multiple of 32")
    require(words.length == mBits / 32, "words must hold mBits/32 32-bit words")
    require(kHashes >= 1 && kHashes <= 4,
      "kHashes must be in [1, 4]: each hash consumes 8 of md5's 32 hex chars")
    require(shingleK >= 1, "shingle size must be >= 1")
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any): Any =
      bloomShingleHitsMd5(a.asInstanceOf[ArrayData], words, mBits, kHashes, shingleK)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val w = ctx.addReferenceObj("bloomWords", words, "long[]")
        s"${ev.value} = org.apache.spark.sql.graftvec.FilterExprs.bloomShingleHitsMd5($a, $w, $mBits, $kHashes, $shingleK);"
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def bloomShingleHitsMd5Col(
      tokens: Column, words: Array[Long], mBits: Int, kHashes: Int, shingleK: Int): Column =
    ExpressionUtils.column(
      BloomShingleHitCountMd5(
        ExpressionUtils.expression(tokens), words, mBits, kHashes, shingleK))
}

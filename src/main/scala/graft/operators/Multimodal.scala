package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video are opaque `binary`
  * payloads with a typed metadata struct riding alongside. The Spark-side
  * mechanics — schema, chunked explode for frame sampling, deterministic
  * batch shape — are real and tested; the actual media DECODE step is a
  * clearly-marked deterministic stub ([[fakeDecode]]) because no codec
  * libraries ship in this environment. Swapping in a real decoder changes
  * only that one column expression.
  */
object Multimodal {

  /** Attach an opaque binary payload column (here: the UTF-8 bytes of the
    * text column stand in for media bytes) plus a metadata struct of the
    * kind an ingest service would carry (mime, size).
    */
  def withBinary(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("media_meta", struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col("payload")).cast("bigint").as("n_bytes")))

  /** STUB decode — deterministic fake in place of a real image decoder.
    * Emits (width, height, channels) derived from md5 of the payload so
    * downstream feature-extraction plumbing has realistic typed input —
    * md5 rather than xxhash so the stub's outputs are reproducible in any
    * engine (7 hex chars < 2^28: the conv result is exactly representable
    * and non-negative, so % agrees across engines). A real implementation
    * would decode `payload` via an image library; only this one column
    * expression changes.
    */
  def fakeDecode(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val hx = md5(col(payloadCol))
    df.withColumn("decoded", struct(
      (conv(substring(hx, 1, 7), 16, 10).cast("long") % 1280 + 32).cast("int").as("width"),
      (conv(substring(hx, 8, 7), 16, 10).cast("long") % 720 + 32).cast("int").as("height"),
      lit(3).as("channels")))
  }

  /** Frame sampling: explode the payload into fixed-size chunks — the
    * batch shape a video pipeline uses (doc, frame_idx, frame_bytes).
    * Pure expressions (sequence + transform + posexplode), so it scales as
    * a narrow map with no shuffle.
    */
  def sampleFrames(df: DataFrame, frameBytes: Int, payloadCol: String = "payload",
      idCol: String = "doc_id"): DataFrame = {
    val nFrames = ceil(octet_length(col(payloadCol)) / lit(frameBytes.toDouble)).cast("int")
    df
      // empty payload -> ZERO frames: guard the sequence, because
      // sequence(0, -1) yields a DESCENDING [0, -1] in Spark, which would
      // explode into two phantom frames
      .withColumn("frame_idx", explode(
        when(nFrames > 0, sequence(lit(0), nFrames - 1))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame", expr(s"substring($payloadCol, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col(idCol), col("frame_idx").cast("bigint").as("frame_idx"), col("frame"))
  }

  /** PERCEPTUAL HASH (dHash) of an image payload — the standard
    * duplicate-image fingerprint: resize to an 8×8 grayscale grid, set
    * bit `7r+c` iff pixel(r,c) > pixel(r,c+1) — 56 gradient bits, robust
    * (with a real decoder) to rescaling/recompression. The PIXELS here
    * come from the documented STUB decode: a 4-link md5 chain of the
    * payload yields 64 deterministic bytes standing in for the resized
    * grid — engine-portable, so the full hash replays in SQL. With the
    * stub, only EXACT payload duplicates land at Hamming 0 (md5
    * avalanche destroys locality); with a real decoder the same
    * operator catches near-identical images at small Hamming — only the
    * pixel-source expression changes.
    *
    * 56 bits keeps the hash in a non-negative long (no sign games in
    * portable SQL). Map-only, codegen'd.
    */
  def dhashBits(
      df: DataFrame, idCol: String, payloadCol: String = "payload"): DataFrame = {
    val h0 = md5(col(payloadCol))
    val chain = concat((0 until 4).map(i =>
      md5(concat(h0, lit(s":$i")))): _*)
    val withChain = df.withColumn("__ch", chain)
    val px = (j: Int) =>
      conv(substring(col("__ch"), 2 * j + 1, 2), 16, 10).cast("long")
    val bits = (for (r <- 0 until 8; c <- 0 until 7) yield {
      val k = 7 * r + c
      when(px(8 * r + c) > px(8 * r + c + 1), lit(1L << k)).otherwise(lit(0L))
    }).reduce(_ + _)
    withChain
      .select(col(idCol).cast("bigint").as("doc"), bits.as("dhash"))
  }

  /** Duplicate-image pairs by dHash Hamming distance, banded: the
    * 56-bit hash splits into `bands` equal slices and candidate pairs
    * agree on at least one slice — the [[graft.operators.Dedup]] SimHash
    * pigeonhole, EXACT for `maxHamming <= bands − 1` (a pair within that
    * distance cannot differ in every band), so the banding is a pure
    * pruning step and the oracle can be brute force. Verification is one
    * codegen'd `bit_count(xor)` per candidate.
    *
    * Scale shape: per-image fan-out = `bands` rows, band-keyed self-join
    * (identical template renders collide; unrelated images spread over
    * 2^14-value band keys), exact verify on the |candidates| set — no
    * all-pairs anywhere.
    */
  def dhashNearDups(
      df: DataFrame, idCol: String, payloadCol: String = "payload",
      maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(bands >= 1 && 56 % bands == 0, "bands must divide 56")
    require(maxHamming >= 0 && maxHamming <= bands - 1,
      "dhashNearDups: maxHamming <= bands - 1 (the pigeonhole guarantee)")
    val width = 56 / bands
    val hashes = dhashBits(df, idCol, payloadCol)
    val banded = hashes.select(col("doc"), col("dhash"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bkey",
        expr(s"shiftright(dhash, band * $width) & ${(1L << width) - 1}L"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        col("a.dhash").as("ha"), col("b.dhash").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("bigint"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** STUB feature extraction over decoded frames: a deterministic 8-dim
    * "embedding" per frame, dimension i = (3 md5 hex chars of the frame,
    * offset 3i) mod 1000 / 1000 — md5-derived so any engine reproduces the
    * vector exactly. The frame's digest is STAGED as a column (HOF lambdas
    * re-evaluate free subexpressions per element); the real version would
    * run a vision encoder with the identical Spark batch shape.
    */
  def fakeFrameFeatures(frames: DataFrame): DataFrame =
    frames
      .withColumn("__fh", md5(col("frame")))
      .withColumn("features",
        transform(sequence(lit(0), lit(7)),
          i => (conv(substr(col("__fh"), i * 3 + 1, lit(3)), 16, 10).cast("long") % 1000) / 1000.0))
      .drop("__fh")
}

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

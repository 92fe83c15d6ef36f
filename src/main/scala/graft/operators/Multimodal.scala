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
    * Emits (width, height, channels) derived from a hash of the payload so
    * downstream feature-extraction plumbing has realistic typed input.
    * A real implementation would decode `payload` via an image library.
    */
  def fakeDecode(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("decoded", struct(
      (pmod(xxhash64(col(payloadCol)), lit(1280)) + 32).cast("int").as("width"),
      (pmod(xxhash64(col(payloadCol), lit(1)), lit(720)) + 32).cast("int").as("height"),
      lit(3).as("channels")))

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
    * "embedding" per frame from hashed payload bytes — the real version
    * would run a vision encoder; the Spark batch shape is identical.
    */
  def fakeFrameFeatures(frames: DataFrame): DataFrame =
    frames.withColumn("features",
      transform(sequence(lit(0), lit(7)),
        i => (pmod(xxhash64(col("frame"), i), lit(1000)) / 1000.0)))
}

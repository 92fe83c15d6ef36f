package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` embedding columns,
  * built from codegen'd higher-order functions (zip_with / aggregate) —
  * no UDFs in the hot path, so whole-stage codegen spans stay wide.
  *
  * Accumulation is sequential over the array (left fold), matching how a
  * row-at-a-time engine (and the DuckDB oracle's list functions) computes
  * it, so cross-engine comparisons are stable.
  */
object VectorFunctions {

  /** Elementwise cast to double — embeddings are array<float> on disk. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** cosine(a, b) = dot / (|a| |b|); null-safe-ish: 0-norm yields null. */
  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a)
    val bd = asDouble(b)
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Random-hyperplane (sign) LSH signature of an embedding: `bits` sign
    * bits packed into a Long. Plane j's component for dimension d is a
    * deterministic pseudo-random +-1 derived from xxhash64(j, d) — no
    * stored plane matrix, so the signature is a pure expression computable
    * at scan time on every executor.
    */
  def signLshSignature(v: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")
    val vd = asDouble(v)
    val planes = (0 until bits).map { j =>
      // dot(v, r_j) with r_j[d] = +1 if xxhash64(j, d) even else -1
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), size(vd) - 1), (x, d) =>
          when(pmod(xxhash64(lit(j), d), lit(2)) === 0, x).otherwise(-x)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    planes.reduce(_.bitwiseOR(_))
  }
}

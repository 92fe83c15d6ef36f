package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.VectorExprs

/** Vector math over `array<float>` / `array<double>` embedding columns.
  *
  * dot and norm are custom codegen'd Catalyst expressions
  * ([[org.apache.spark.sql.graftvec.VectorExprs]]) — a tight primitive
  * loop in whole-stage codegen. The interpreted higher-order-function
  * formulation costs lambda dispatch + boxing per element, which
  * dominates all-pairs similarity scans.
  *
  * Accumulation is strictly left-to-right (index order), matching how
  * DuckDB's `list_dot_product` folds, so cross-engine f64 comparisons are
  * bit-stable.
  *
  * CALLER CONTRACT for the pair stage: materialize `asDouble(vec)` and
  * `norm(v)` as columns BEFORE a pairwise join, so each row is cast and
  * normed once, and only the dot product runs per pair.
  */
object VectorFunctions {

  /** Elementwise cast to double — embeddings are array<float> on disk. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column = VectorExprs.dotCol(a, b)

  def norm(a: Column): Column = VectorExprs.normCol(a)

  /** cosine = dot / (|a| |b|) over already-double arrays. Prefer
    * `dot(a,b) / (normA * normB)` with precomputed norm columns in joins.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane (sign) LSH signature of an embedding: `bits` sign
    * bits packed into a Long. Plane j's component for dimension d is a
    * deterministic pseudo-random +-1 derived from xxhash64(j, d) — no
    * stored plane matrix, so the signature is a pure expression computable
    * at scan time on every executor. Pass a MATERIALIZED double-array
    * column (HOF lambdas re-evaluate free subexpressions per element).
    */
  def signLshSignature(v: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")
    val planes = (0 until bits).map { j =>
      // dot(v, r_j) with r_j[d] = +1 if xxhash64(j, d) even else -1
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, d) =>
          when(pmod(xxhash64(lit(j), d), lit(2)) === 0, x).otherwise(-x)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    planes.reduce(_.bitwiseOR(_))
  }
}

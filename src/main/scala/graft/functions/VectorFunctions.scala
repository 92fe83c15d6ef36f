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
    * bits packed into a Long, from a deterministic hash-derived +-1 plane
    * family (no stored matrix — identical on every executor). Codegen'd
    * bits x dim loop ([[org.apache.spark.sql.graftvec.VectorExprs.SignLsh]]).
    */
  def signLshSignature(v: Column, bits: Int): Column =
    VectorExprs.signLshCol(v, bits)

  /** Engine-PORTABLE +-1 hyperplane family: sign(d, j) = +1 iff the first
    * hex nibble of md5("d_j") is even — one md5 per MATRIX CELL on the
    * driver (bits x dim, computed once per plan, never per row), and the
    * identical matrix is derivable in any engine with md5() (DuckDB:
    * `strpos('0123456789abcdef', substring(md5(d || '_' || j), 1, 1)) - 1`).
    */
  def md5Planes(dim: Int, bits: Int): Seq[Seq[Double]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0 until bits).map { j =>
      (0 until dim).map { d =>
        val firstByte = digest.digest(s"${d}_${j}".getBytes("UTF-8"))(0)
        if ((((firstByte >> 4) & 0xF) & 1) == 0) 1.0 else -1.0
      }
    }
  }

  /** Sign-LSH signature against EXPLICIT literal planes (e.g.
    * [[md5Planes]]): bit j set iff dot(v, plane_j) >= 0. Each projection
    * is the codegen'd [[dot]] against an array literal, accumulated in
    * index order — bit-identical to any engine whose dot product folds
    * left-to-right, which is what makes the q36 oracle possible.
    */
  def signLshWithPlanes(v: Column, planes: Seq[Seq[Double]]): Column = {
    require(planes.nonEmpty && planes.size <= 63, "need 1..63 planes")
    planes.zipWithIndex.map { case (p, j) =>
      when(dot(v, typedlit(p)) >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** max |v_i| — the symmetric-quantization range. */
  def maxAbs(v: Column): Column = array_max(transform(v, x => abs(x)))

  /** int8 symmetric quantization scale for a double vector: 127/max|v|
    * (0 for all-zero vectors, making [[quantizeInt8]] emit zeros).
    * MATERIALIZE this as a column before quantizing — `scale` is a free
    * subexpression of the quantize lambda and would otherwise be
    * recomputed per element (see TextFunctions HOF contract).
    */
  def int8Scale(v: Column): Column =
    when(maxAbs(v) === 0.0, 0.0).otherwise(lit(127.0) / maxAbs(v))

  /** Elementwise int8 symmetric quantization: round(v_i * scale) as int,
    * with `scale` a MATERIALIZED [[int8Scale]] column.
    */
  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x => round(x * scale).cast("int"))
}

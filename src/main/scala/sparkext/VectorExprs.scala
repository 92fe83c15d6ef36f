package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Codegen'd Catalyst expressions for the vector similarity hot path.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * interpreted — lambda dispatch and boxing per element — which is the
  * difference between minutes and seconds on an all-pairs similarity scan
  * (SURVEY.md §7.4-5). These expressions compile to a tight primitive loop
  * inside whole-stage codegen, reading `ArrayData.getDouble` with no
  * allocation, with an equivalent interpreted `nullSafeEval` fallback.
  *
  * Lives under `org.apache.spark.sql` because the `Column`-from-Expression
  * bridge (`classic.ExpressionUtils`) and `AbstractDataType` are
  * `private[sql]`; this file is the one sanctioned crossing point — all
  * engine code calls the public [[VectorExprs]] facade.
  */
object VectorExprs {

  /** dot(a, b) over array<double>; null if either side is null.
    * Mismatched lengths THROW (like DuckDB's list_dot_product) — a corrupt
    * embedding must surface, not fold into a plausible-but-wrong cosine.
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) throw new IllegalArgumentException(
        s"vec_dot: dimension mismatch ($n vs ${y.numElements()})")
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = $a.numElements();
           |if ($b.numElements() != $n) {
           |  throw new IllegalArgumentException(
           |    "vec_dot: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
           |}
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** L2 norm of an array<double>. */
  case class L2Norm(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) { val v = x.getDouble(i); acc += v * v; i += 1 }
      math.sqrt(acc)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val v = ctx.freshName("v")
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $v = $a.getDouble($i);
           |  $acc += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($acc);
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Random-hyperplane (sign) LSH signature: bit j of the result is the
    * sign of dot(v, r_j), where r_j[d] = +1 if XXH64(d, seed=j) is even
    * else -1 — a deterministic pseudo-random plane family with no stored
    * matrix, identical on every executor. One compiled bits x dim loop
    * per row (the HOF formulation pays a lambda per (plane, dimension)).
    */
  case class SignLsh(child: Expression, bits: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val dim = v.numElements()
      var sig = 0L
      var j = 0
      while (j < bits) {
        var proj = 0.0
        var d = 0
        while (d < dim) {
          val x = v.getDouble(d)
          proj += (if ((org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(d.toLong, j.toLong) & 1L) == 0L) x else -x)
          d += 1
        }
        if (proj >= 0) sig |= (1L << j)
        j += 1
      }
      sig
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val dim = ctx.freshName("dim")
        val sig = ctx.freshName("sig")
        val j = ctx.freshName("j")
        val d = ctx.freshName("d")
        val proj = ctx.freshName("proj")
        val x = ctx.freshName("x")
        s"""
           |int $dim = $a.numElements();
           |long $sig = 0L;
           |for (int $j = 0; $j < $bits; $j++) {
           |  double $proj = 0.0;
           |  for (int $d = 0; $d < $dim; $d++) {
           |    double $x = $a.getDouble($d);
           |    $proj += ((org.apache.spark.sql.catalyst.expressions.XXH64.hashLong((long) $d, (long) $j) & 1L) == 0L) ? $x : -$x;
           |  }
           |  if ($proj >= 0) $sig |= (1L << $j);
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def signLshCol(v: Column, bits: Int): Column =
    ExpressionUtils.column(SignLsh(ExpressionUtils.expression(v), bits))

  def dotCol(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def normCol(a: Column): Column =
    ExpressionUtils.column(L2Norm(ExpressionUtils.expression(a)))
}

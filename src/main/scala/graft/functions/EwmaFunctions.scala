package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.model.PricePoint

/** The reference's EWMA fold, re-expressed Spark-first.
  *
  * Exact semantics (reference indicators.rs:13-26 + agg-producer
  * main.rs:106-116, pinned by SURVEY.md §2.3):
  *
  *   alpha   = 2 / (periodSeconds + 1)
  *   current = 0.0                       // zero-seeded, NOT first-sample
  *   for x in window (ts, seq) order: current = alpha*x + (1-alpha)*current
  *   emit iff current > 0                // (main.rs:118)
  *
  * Two implementations with identical, test-pinned results:
  *
  *  1. [[ewmaOrdered]] — pure built-ins (collect_list + array_sort +
  *     higher-order aggregate). Fully codegen'd, oracle-checkable in any
  *     SQL engine, and the partial-aggregation (map-side collect) comes
  *     from Catalyst for free.
  *  2. [[EwmaAggregator]] — a typed `Aggregator` with a mutable buffer,
  *     sorted once at `finish`. Avoids the per-row Catalyst array copy of
  *     collect_list at very large windows; the merge is a buffer concat so
  *     it parallelizes across partitions, with the O(n log n) sort deferred
  *     to the single finish call per group.
  *
  * Both keep the fold strictly sequential (left fold in IEEE-754 double) —
  * EWMA is order-sensitive and MUST NOT be computed as a parallel
  * reduction (SURVEY.md §2.3 pitfall 5).
  */
object EwmaFunctions {

  /** alpha = 2/(periodSeconds+1) — reference indicators.rs:17. */
  def alpha(periodSeconds: Long): Double = 2.0 / (periodSeconds + 1)

  /** Sequential zero-seeded EWMA fold over an already-ordered array. */
  def ewmaFold(orderedPrices: Column, alphaVal: Double): Column =
    aggregate(
      orderedPrices,
      lit(0.0),
      (acc, x) => lit(alphaVal) * x + lit(1.0 - alphaVal) * acc)

  /** Aggregation column: EWMA over the group's rows in (ts, tie) order.
    * Usage: df.groupBy(...).agg(ewmaOrdered($"ts", $"event_id", $"v", a)).
    *
    * array_sort on structs orders lexicographically by field position, so
    * (ts, tie, value) sorts by ts then tie — the pinned deterministic order.
    */
  def ewmaOrdered(ts: Column, tie: Column, value: Column, alphaVal: Double): Column =
    ewmaFold(
      transform(
        array_sort(collect_list(struct(ts.as("ts"), tie.as("tie"), value.as("v")))),
        s => s.getField("v")),
      alphaVal)

  /** Scala-side oracle of the fold — the 6-line truth every test pins to. */
  def foldOracle(prices: Seq[Double], alphaVal: Double): Double =
    prices.foldLeft(0.0)((acc, x) => alphaVal * x + (1.0 - alphaVal) * acc)

  /** Typed order-sensitive EWMA aggregator (scale path).
    *
    * Buffer = unsorted growable array of (ts, seq, price); `merge` is a
    * concat (commutative w.r.t. the final sorted fold), `finish` sorts by
    * (ts, seq) and left-folds. State per group is O(window size) — at the
    * 100 TB design point windows are bounded by (key x window length), the
    * same bound the built-in collect_list path has, but with cheaper
    * per-row appends and a single sort per group.
    */
  class EwmaAggregator(alphaVal: Double)
      extends Aggregator[PricePoint, ArrayBuffer[PricePoint], Double] {
    override def zero: ArrayBuffer[PricePoint] = ArrayBuffer.empty
    override def reduce(b: ArrayBuffer[PricePoint], a: PricePoint): ArrayBuffer[PricePoint] = {
      b += a; b
    }
    override def merge(b1: ArrayBuffer[PricePoint], b2: ArrayBuffer[PricePoint]): ArrayBuffer[PricePoint] = {
      b1 ++= b2; b1
    }
    override def finish(b: ArrayBuffer[PricePoint]): Double = {
      // full-tuple order including price: ties on (ts, seq) must fold
      // deterministically regardless of partition merge order, matching
      // array_sort's lexicographic struct order in the built-in path
      val sorted = b.sortBy(p => (p.ts, p.seq, p.price))
      var cur = 0.0
      var i = 0
      while (i < sorted.length) {
        cur = alphaVal * sorted(i).price + (1.0 - alphaVal) * cur
        i += 1
      }
      cur
    }
    override def bufferEncoder: Encoder[ArrayBuffer[PricePoint]] =
      implicitly[Encoder[ArrayBuffer[PricePoint]]](
        org.apache.spark.sql.Encoders.kryo[ArrayBuffer[PricePoint]])
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Untyped (Column) form of [[EwmaAggregator]]: call with the three flat
    * columns `(ts, seq, price)` — the product encoder maps one arg per field.
    */
  def ewmaUdaf(alphaVal: Double): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new EwmaAggregator(alphaVal), Encoders.product[PricePoint])

  /** Row shape for the SQL-registered form: alpha rides as a fourth
    * (constant) argument because `spark.udf.register` binds one function
    * object — a pure-SQL caller has no closure to carry alpha in.
    */
  case class PricePointA(ts: Long, seq: Long, price: Double, alpha: Double)

  /** SQL-callable EWMA aggregate: `ewma_agg(ts, seq, price, alpha)` after
    * [[graft.GraftFunctions.registerAggregates]]. Same pinned fold as
    * [[EwmaAggregator]] ((ts, seq, price) order, zero seed, IEEE-754 left
    * fold); alpha must be the SAME literal on every row of a group —
    * mixed values raise rather than silently folding with one of them.
    */
  class EwmaSqlAggregator
      extends Aggregator[PricePointA, ArrayBuffer[PricePointA], Double] {
    override def zero: ArrayBuffer[PricePointA] = ArrayBuffer.empty
    override def reduce(b: ArrayBuffer[PricePointA], a: PricePointA): ArrayBuffer[PricePointA] = {
      b += a; b
    }
    override def merge(b1: ArrayBuffer[PricePointA], b2: ArrayBuffer[PricePointA]): ArrayBuffer[PricePointA] = {
      b1 ++= b2; b1
    }
    override def finish(b: ArrayBuffer[PricePointA]): Double =
      if (b.isEmpty) 0.0
      else {
        val a = b.head.alpha
        require(b.forall(_.alpha == a),
          "ewma_agg: alpha must be constant within a group")
        val sorted = b.sortBy(p => (p.ts, p.seq, p.price))
        var cur = 0.0
        var i = 0
        while (i < sorted.length) {
          cur = a * sorted(i).price + (1.0 - a) * cur
          i += 1
        }
        cur
      }
    override def bufferEncoder: Encoder[ArrayBuffer[PricePointA]] =
      implicitly[Encoder[ArrayBuffer[PricePointA]]](
        org.apache.spark.sql.Encoders.kryo[ArrayBuffer[PricePointA]])
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** The [[EwmaSqlAggregator]] as a registrable UDF object. */
  def ewmaSqlUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new EwmaSqlAggregator, Encoders.product[PricePointA])
}

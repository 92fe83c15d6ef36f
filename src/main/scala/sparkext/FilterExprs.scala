package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Bloom-filter build/probe columns. Spark ships `BloomFilterAggregate` /
  * `BloomFilterMightContain` for its own runtime join filtering but does
  * not register them as SQL functions; this facade exposes them as
  * Columns so a pipeline can build a compact key filter on a small
  * relation and pre-prune a huge scan before the shuffle — the standard
  * semi-join reduction at the 100 TB design point.
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
}

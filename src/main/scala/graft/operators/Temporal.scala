package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval algebra over event-time ranges — the join shapes session /
  * exposure / campaign analysis needs that a plain equi-join can't
  * express and a naive theta join can't scale.
  */
object Temporal {

  /** Co-keyed interval OVERLAP join on HALF-OPEN intervals `[start, end)`:
    * emits every (A, B) pair under the same key whose intervals
    * intersect (`aStart < bEnd && bStart < aEnd`), with the exact
    * intersection length. The "which sessions saw which campaign
    * windows" / "which exposures overlap which visits" primitive.
    *
    * Scale design — the reason this operator exists: the predicate alone
    * would force a per-key theta join (every A × every B under the key —
    * quadratic in key cardinality). Instead both sides explode their
    * intervals into fixed-width time buckets (fan-out = interval span /
    * `bucketMicros`, bounded by TIME, not by row count) and equi-join on
    * `(key, bucket)`; the overlap predicate rides the join as a filter.
    * A pair sharing many buckets is emitted ONCE, with zero dedup
    * shuffle, by the canonical-bucket trick: the pair only fires in the
    * bucket containing `greatest(aStart, bStart)` — which every
    * overlapping pair shares by construction (the overlap's own first
    * bucket). Pick `bucketMicros` near the typical interval length: much
    * smaller multiplies fan-out, much larger multiplies per-bucket
    * candidate pairs.
    *
    * Intervals must be non-empty (`end > start`) — enforced; empty
    * intervals overlap nothing under the strict predicate and would
    * silently vanish, so they fail loudly instead.
    */
  def overlapJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      idACol: String, startACol: String, endACol: String,
      idBCol: String, startBCol: String, endBCol: String,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    def sides(df: DataFrame, idc: String, sc: String, ec: String,
        idOut: String, sOut: String, eOut: String): DataFrame = {
      val checked = df.select(col(keyCol).as("k"), col(idc).as(idOut),
          col(sc).cast("bigint").as(sOut), col(ec).cast("bigint").as(eOut))
        .withColumn(sOut, when(col(eOut) > col(sOut), col(sOut))
          .otherwise(raise_error(concat(lit(s"overlapJoin: empty interval ($idOut="),
            col(idOut).cast("string"), lit(")")))))
      // end is exclusive: the last covered bucket is (end - 1) DIV width
      checked.withColumn("bucket",
        explode(sequence(expr(s"$sOut DIV $bucketMicros"),
          expr(s"($eOut - 1) DIV $bucketMicros"))))
    }
    val a = sides(left, idACol, startACol, endACol, "id_a", "sa", "ea")
    val b = sides(right, idBCol, startBCol, endBCol, "id_b", "sb", "eb")
    a.join(b, Seq("k", "bucket"))
      .filter(col("sa") < col("eb") && col("sb") < col("ea"))
      // canonical bucket: fire once, in the overlap's own first bucket
      .filter(col("bucket") === expr(s"greatest(sa, sb) DIV $bucketMicros"))
      .select(col("k").as(keyCol), col("id_a"), col("id_b"),
        (least(col("ea"), col("eb")) - greatest(col("sa"), col("sb"))).as("overlap_us"))
  }
}

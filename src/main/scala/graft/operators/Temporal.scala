package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** GAP-AND-ISLAND interval merge per key: overlapping-or-touching
    * intervals (`start ≤ running max end` — closed-touch merges)
    * coalesce into islands, the classic "activity episodes from raw
    * spans" reduction (machine uptime from heartbeats, user activity
    * episodes from per-event attention windows, contract coverage from
    * policy rows). Emits one row per island:
    * `(key, island, start_us, end_us, n_intervals, covered_us)` with
    * `covered_us = end − start` (the island is contiguous by
    * construction) and `island` = 1-based index in time order.
    *
    * Exact integer microseconds end-to-end; islands are determined by
    * the (start, end) order alone, so the output is independent of
    * partitioning and of any id column.
    *
    * Scale shape: ONE window pass partitioned by the key (running max
    * of `end` over the time order, island = running sum of the
    * gap-break flag) and one (key, island) aggregation — per-key
    * parallel, no global sort, no joins. A single hot key pays one
    * sort of its own rows, the [[overlapJoin]] contract.
    */
  def mergeIslands(
      df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val base = df.select(col(keyCol).as("k"),
        col(startCol).cast("bigint").as("s"),
        col(endCol).cast("bigint").as("e"))
      .withColumn("s", when(col("e") > col("s"), col("s"))
        .otherwise(raise_error(concat(
          lit("mergeIslands: empty interval (key="),
          col("k").cast("string"), lit(")")))))
    val order = Window.partitionBy(col("k")).orderBy(col("s"), col("e"))
    val prevMax = order.rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("prev_end", max(col("e")).over(prevMax))
      .withColumn("brk",
        when(col("prev_end").isNull || col("s") > col("prev_end"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("k").as(keyCol), col("island"))
      .agg(min(col("s")).as("start_us"), max(col("e")).as("end_us"),
        count(lit(1)).as("n_intervals"))
      .withColumn("covered_us", col("end_us") - col("start_us"))
  }
}

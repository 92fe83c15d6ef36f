package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed EXACT rank machinery — the replacement for unpartitioned
  * `row_number()` windows, which force a single-partition sort of the
  * whole frame (the one plan shape that dies outright at 10⁹ rows no
  * matter how many executors exist).
  *
  * The scheme is the classic two-pass partition-offset rank:
  *
  *   1. range-exchange on the sort key (each partition owns a contiguous
  *      key range, partitions ordered by partition id), sort within
  *      partitions, and tag each row with `monotonically_increasing_id()`
  *      — `pid << 33 | local_index`, where `local_index` follows the
  *      sorted iterator order. This is the standard distributed
  *      zipWithIndex idiom; the tagged frame is persisted (tracked by
  *      [[Dedup.releaseCaches]]) so both passes observe one tag
  *      assignment.
  *   2. ONE bounded collect of per-(partition, group) counts and first
  *      tags — at most `numShufflePartitions × #groups` rows of driver
  *      state (guarded loudly) — turned into running offsets and
  *      broadcast-joined back:  `rank = offset + (mid − first_mid) + 1`.
  *
  * Exactness contract: with a tie-free composite sort key (callers pass a
  * unique id as the last column) the produced ranks are IDENTICAL to
  * `row_number() OVER (PARTITION BY grp ORDER BY sortCols)` — ranks are a
  * total order, range partitions are disjoint ordered key intervals, and
  * offsets are exact counts — so oracle hash parity is preserved while
  * the plan has NO unpartitioned WindowExec (and in fact no WindowExec at
  * all: the local index rides the exchange's own sort).
  *
  * Scale shape: one range exchange of the frame + one map-side-combined
  * count aggregate + one broadcast hash join. Skew bound: range
  * partitioning balances by key density (RangePartitioner samples), not
  * by hash, so a hot VALUE cannot overload one task beyond the sampled
  * range width; the unique tie-break column keeps even constant-key
  * frames splittable.
  */
object Ranks {

  /** Hard bound on collected (partition × group) offset rows — this is
    * driver state, so it must stay a bounded broadcast table. With the
    * repo's 32 shuffle partitions this allows ~2k groups; callers with
    * unbounded group cardinality should use a plain partitioned window
    * instead (grouped ranks are per-key-parallel already).
    */
  private val MaxOffsetRows = 65536

  /** Adds `rankCol` = exact 1-based rank of each row within its `grpCols`
    * group (global when `grpCols` is empty) under the `sortCols`
    * lexicographic order. `sortCols` MUST end in a tie-breaking unique
    * column — offsets are computed per partition, so duplicate full keys
    * spanning a partition boundary would make the rank depend on the
    * sampled boundaries. Returns the ranked frame plus the TOTAL row
    * count (collected as a byproduct of the offset pass — callers use it
    * to replace `count(*) OVER ()` global windows with a literal).
    *
    * The ranked frame references a persisted intermediate registered with
    * [[Dedup.releaseCaches]]; call that once the result is consumed.
    */
  def offsetRank(
      df: DataFrame, grpCols: Seq[String], sortCols: Seq[String],
      rankCol: String): (DataFrame, Long) = {
    require(sortCols.nonEmpty, "offsetRank: sortCols must be non-empty")
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val keys = (grpCols ++ sortCols).map(col)
    val tagged = Dedup.persistTracked(
      df.repartitionByRange(p, keys: _*)
        .sortWithinPartitions(keys: _*)
        .withColumn("__mid", monotonically_increasing_id())
        .withColumn("__pid", shiftright(col("__mid"), 33)))
    // pass 2a: bounded offset collect — (pid, grp) → (count, first tag)
    val parts = tagged
      .groupBy(col("__pid") +: grpCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"), min(col("__mid")).as("__first"))
      .collect()
    require(parts.length <= MaxOffsetRows,
      s"offsetRank: ${parts.length} (partition × group) offset rows exceed " +
        s"the $MaxOffsetRows driver-state bound — group cardinality is too " +
        "high for the broadcast-offset scheme; use a partitioned window")
    // running offsets per group in partition-id order (partitions are
    // ordered key ranges, so pid order IS key order)
    val byGroup = parts
      .map(r => (grpCols.map(r.getAs[Any]), r.getAs[Long]("__pid"),
        r.getAs[Long]("__cnt"), r.getAs[Long]("__first")))
      .groupBy(_._1)
    val offsetRows = byGroup.valuesIterator.flatMap { rows =>
      var prior = 0L
      rows.sortBy(_._2).map { case (grpVals, pid, cnt, first) =>
        // rank = prior + (mid − first) + 1 = mid + base
        val base = prior - first + 1
        prior += cnt
        Row.fromSeq(pid +: grpVals :+ base)
      }
    }.toSeq
    val total = parts.iterator.map(_.getAs[Long]("__cnt")).sum
    val grpFields = grpCols.map(c => tagged.schema(c))
    val offSchema = StructType(
      StructField("__pid", LongType, nullable = false) +:
        grpFields :+ StructField("__base", LongType, nullable = false))
    val offsets = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(offsetRows).asJava), offSchema)
    // Null-safe (<=>) on the group columns: a plain USING join would
    // silently drop rows whose group-key value is NULL (null = null is
    // never true), vanishing whole null groups from the ranked output.
    val joinCond = grpCols
      .map(c => tagged(c) <=> offsets(c))
      .foldLeft(tagged("__pid") === offsets("__pid"))(_ && _)
    val ranked = tagged
      .join(broadcast(offsets), joinCond)
      .select(tagged.columns.map(tagged(_)) :+ offsets("__base"): _*)
      .withColumn(rankCol, col("__mid") + col("__base"))
      .drop("__mid", "__pid", "__base")
    (ranked, total)
  }

  /** Adds `cum_<valueCol>` = exact GLOBAL running sum of each value
    * column under the `sortCols` order — the distributed replacement for
    * `sum(v) OVER (ORDER BY ...)` on an unboundedly-growing frame (the
    * same single-partition-sort failure as the rank case). Same two-pass
    * scheme as [[offsetRank]]: range exchange, ONE bounded collect of
    * per-partition sums → running prior offsets broadcast back, then a
    * partition-LOCAL running-sum window (partitioned by the range
    * partition id — each window group is one bounded range partition,
    * never the frame). `sortCols` must form a UNIQUE key (ROWS-frame
    * running sums are tie-order-sensitive otherwise) and value columns
    * must be non-null longs (coalesce upstream).
    *
    * The intermediate is persisted and registered with
    * [[Dedup.releaseCaches]].
    */
  def offsetCumSum(
      df: DataFrame, sortCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(sortCols.nonEmpty && valueCols.nonEmpty,
      "offsetCumSum: sortCols and valueCols must be non-empty")
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val keys = sortCols.map(col)
    val tagged = Dedup.persistTracked(
      df.repartitionByRange(p, keys: _*)
        .withColumn("__pid", spark_partition_id().cast("long")))
    val sumAggs = valueCols.map(c => sum(col(c)).as(s"__s_$c"))
    val parts = tagged.groupBy(col("__pid"))
      .agg(sumAggs.head, sumAggs.tail: _*)
      .collect()
      .sortBy(_.getAs[Long]("__pid"))
    val priors = scala.collection.mutable.Map(valueCols.map(_ -> 0L): _*)
    val offsetRows = parts.map { r =>
      val row = Row.fromSeq(r.getAs[Long]("__pid") +:
        valueCols.map(c => priors(c)))
      valueCols.foreach(c => priors(c) += r.getAs[Long](s"__s_$c"))
      row
    }.toSeq
    val offSchema = StructType(
      StructField("__pid", LongType, nullable = false) +:
        valueCols.map(c => StructField(s"__prior_$c", LongType, nullable = false)))
    val offsets = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(offsetRows).asJava), offSchema)
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(keys: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    valueCols.foldLeft(tagged.join(broadcast(offsets), Seq("__pid"))) {
      (acc, c) =>
        acc.withColumn(s"cum_$c",
          col(s"__prior_$c") + sum(col(c)).over(wRun))
          .drop(s"__prior_$c")
    }.drop("__pid")
  }
}

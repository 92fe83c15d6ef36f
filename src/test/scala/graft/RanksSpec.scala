package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{DataPrep, Dedup, EventAnalytics, Ranks}

/** [[Ranks.offsetRank]] — the distributed exact-rank machinery that
  * replaced the unpartitioned `row_number()` windows in q203/q185.
  * Pins: bit-equality with the window form it replaced, repartition
  * determinism, the grouped variant, the driver-state guard, and —
  * the round-11 directive — that the two consumer operators' plans
  * contain NO unpartitioned Window node (the single-partition-sort
  * shape that dies at 10⁹ rows).
  */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm(df: DataFrame, sortCols: Seq[String]): DataFrame =
    df.withColumn("expected",
      row_number().over(Window.orderBy(sortCols.map(col): _*)))

  test("offsetRank ≡ global row_number window, including duplicate values") {
    // duplicate v values force the tie-break id to decide ranks
    val df = Seq((1L, 5L), (2L, 5L), (3L, 1L), (4L, 9L), (5L, 1L), (6L, 5L))
      .toDF("id", "v")
    val (got, total) = Ranks.offsetRank(df, Nil, Seq("v", "id"), "rnk")
    val expected = windowForm(df, Seq("v", "id"))
    assert(total === 6L)
    val merged = got.join(expected, Seq("id", "v")).collect()
    assert(merged.length === 6)
    merged.foreach(r =>
      assert(r.getAs[Long]("rnk") === r.getAs[Int]("expected").toLong))
    Dedup.releaseCaches()
  }

  test("offsetRank is repartition-deterministic on a larger frame") {
    val df = spark.range(0, 5000)
      .select(col("id"), (col("id") * 2654435761L % 977L).as("v"))
    val (a, totalA) = Ranks.offsetRank(
      df.repartition(7), Nil, Seq("v", "id"), "rnk")
    val (b, totalB) = Ranks.offsetRank(
      df.repartition(3, col("v")), Nil, Seq("v", "id"), "rnk")
    assert(totalA === 5000L && totalB === 5000L)
    assert(a.orderBy("id").collect().toSeq ===
      b.select(a.columns.map(col): _*).orderBy("id").collect().toSeq)
    // spot-check against the window form
    val exp = windowForm(df, Seq("v", "id"))
    assert(a.join(exp, Seq("id", "v"))
      .filter(col("rnk") =!= col("expected").cast("bigint")).count() === 0L)
    Dedup.releaseCaches()
  }

  test("offsetRank grouped variant ranks within each group") {
    val df = Seq(("a", 1L, 30L), ("a", 2L, 10L), ("a", 3L, 20L),
      ("b", 4L, 2L), ("b", 5L, 1L)).toDF("g", "id", "v")
    val (got, total) = Ranks.offsetRank(df, Seq("g"), Seq("v", "id"), "rnk")
    assert(total === 5L)
    val exp = df.withColumn("expected",
      row_number().over(Window.partitionBy("g").orderBy("v", "id")))
    assert(got.join(exp, Seq("g", "id", "v"))
      .filter(col("rnk") =!= col("expected").cast("bigint")).count() === 0L)
    Dedup.releaseCaches()
  }

  test("offsetRank grouped variant keeps NULL-key groups (null-safe join)") {
    // a null group key must form its own group, not vanish from the output
    val df = Seq((Option("a"), 1L, 30L), (Option("a"), 2L, 10L),
      (Option.empty[String], 3L, 20L), (Option.empty[String], 4L, 2L),
      (Option("b"), 5L, 1L)).toDF("g", "id", "v")
    val (got, total) = Ranks.offsetRank(df, Seq("g"), Seq("v", "id"), "rnk")
    assert(total === 5L)
    val rows = got.collect()
    assert(rows.length === 5, "null-group rows must survive the offset join")
    val exp = df.withColumn("expected",
      row_number().over(Window.partitionBy("g").orderBy("v", "id")))
    assert(got.join(exp, got("id") === exp("id"))
      .filter(col("rnk") =!= col("expected").cast("bigint")).count() === 0L)
    Dedup.releaseCaches()
  }

  test("offsetRank guards the (partition × group) driver-state bound") {
    val wide = spark.range(0, 70000).select(col("id").as("g"), col("id"))
    val e = intercept[IllegalArgumentException] {
      Ranks.offsetRank(wide, Seq("g"), Seq("id"), "rnk")
    }
    assert(e.getMessage.contains("driver-state bound"))
    Dedup.releaseCaches()
  }

  test("offsetCumSum ≡ running sum window, multiple columns, " +
      "pid-partitioned plan only") {
    val df = spark.range(0, 3000)
      .select(col("id").as("b"), (col("id") % 13L + 1L).as("v1"),
        (col("id") % 7L).as("v2"))
    val got = Ranks.offsetCumSum(df.repartition(5), Seq("b"), Seq("v1", "v2"))
    val exp = df.withColumn("e1",
        sum(col("v1")).over(Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("e2",
        sum(col("v2")).over(Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.join(exp, Seq("b", "v1", "v2"))
      .filter(col("cum_v1") =!= col("e1") || col("cum_v2") =!= col("e2"))
      .count() === 0L)
    assert(unpartitionedWindows(got).isEmpty,
      "offsetCumSum must only use range-partition-local windows")
    Dedup.releaseCaches()
  }

  private def unpartitionedWindows(df: DataFrame): Seq[LogicalWindow] =
    df.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty => w
    }

  test("rfmSegments plan has no unpartitioned Window (q203 scale gate)") {
    val events = Seq.tabulate(40)(i =>
      (i.toLong % 10L, java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"),
        (i % 7).toDouble))
      .toDF("user_id", "ts", "value")
    val got = EventAnalytics.rfmSegments(events, "user_id", "ts", "value")
    assert(unpartitionedWindows(got).isEmpty,
      "rfmSegments must not contain a global-sort Window node")
    assert(got.count() === 10L)
    Dedup.releaseCaches()
  }

  test("quantileNormalize plan has no unpartitioned Window (q185 scale gate)") {
    val df = Seq.tabulate(30)(i => (i.toLong, if (i % 2 == 0) "a" else "b",
      (i * 13 % 17).toDouble)).toDF("id", "grp", "v")
    val got = DataPrep.quantileNormalize(df, "grp", "v", "id")
    assert(unpartitionedWindows(got).isEmpty,
      "quantileNormalize must not contain a global-sort Window node")
    assert(got.count() === 30L)
    Dedup.releaseCaches()
  }
}

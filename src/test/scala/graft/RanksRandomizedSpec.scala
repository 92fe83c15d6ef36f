package graft

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Ranks}

/** Differential fuzzing for the distributed rank/prefix machinery: on
  * random frames (random sizes, value skew, duplicate densities, input
  * partitionings, group counts), [[Ranks.offsetRank]] must equal the
  * unpartitioned `row_number()` window and [[Ranks.offsetCumSum]] the
  * unpartitioned running-sum window, bit for bit. The machinery
  * replaces those windows in production plans, so equivalence IS its
  * correctness contract.
  */
class RanksRandomizedSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(4111)

  test("offsetRank ≡ row_number window on random frames") {
    for (trial <- 1 to 6) {
      val n = 1 + rnd.nextInt(4000)
      val valRange = 1 + rnd.nextInt(if (rnd.nextBoolean()) 5 else 5000)
      val nGroups = 1 + rnd.nextInt(4)
      val rows = (1L to n.toLong).map { id =>
        (s"g${rnd.nextInt(nGroups)}", rnd.nextInt(valRange).toLong, id)
      }
      val df = rows.toDF("g", "v", "id").repartition(1 + rnd.nextInt(7))
      val grouped = rnd.nextBoolean()
      val (got, total) =
        if (grouped) Ranks.offsetRank(df, Seq("g"), Seq("v", "id"), "rnk")
        else Ranks.offsetRank(df, Nil, Seq("v", "id"), "rnk")
      val w = if (grouped) Window.partitionBy("g").orderBy("v", "id")
        else Window.orderBy("v", "id")
      val exp = df.withColumn("expected", row_number().over(w))
      assert(total === n.toLong, s"trial $trial: total")
      val bad = got.join(exp, Seq("g", "v", "id"))
        .filter(col("rnk") =!= col("expected").cast("bigint")).count()
      assert(bad === 0L, s"trial $trial (n=$n grouped=$grouped): $bad mismatches")
      Dedup.releaseCaches()
    }
  }

  test("offsetCumSum ≡ running-sum window on random frames") {
    for (trial <- 1 to 6) {
      val n = 1 + rnd.nextInt(4000)
      val rows = (1L to n.toLong).map { id =>
        (id * (1 + rnd.nextInt(3)), rnd.nextInt(1000).toLong,
          rnd.nextInt(50).toLong)
      }
      // unique sort key required by the contract: make b unique
      val df = rows.zipWithIndex
        .map { case ((_, v1, v2), i) => (i.toLong * 7 % (8 * n) * 100000L + i, v1, v2) }
        .toDF("b", "v1", "v2").repartition(1 + rnd.nextInt(6))
      val got = Ranks.offsetCumSum(df, Seq("b"), Seq("v1", "v2"))
      val w = Window.orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val exp = df.withColumn("e1", sum(col("v1")).over(w))
        .withColumn("e2", sum(col("v2")).over(w))
      val bad = got.join(exp, Seq("b", "v1", "v2"))
        .filter(col("cum_v1") =!= col("e1") || col("cum_v2") =!= col("e2"))
        .count()
      assert(bad === 0L, s"trial $trial (n=$n): $bad mismatches")
      Dedup.releaseCaches()
    }
  }
}

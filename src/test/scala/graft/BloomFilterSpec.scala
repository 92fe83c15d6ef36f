package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.FilterExprs

/** Bloom-filter aggregate + might_contain — the pre-join filter tool at
  * scale: build a compact filter on the small side's keys, probe it on
  * the big side before the shuffle, and move only probable matches.
  */
class BloomFilterSpec extends SparkSpec {

  test("bloom filter has no false negatives and prunes most non-members") {
    val orders = Tables.table(spark, sfDir, "orders")
    val customers = Tables.table(spark, sfDir, "customer")

    val bloomRow = orders.filter(col("o_totalprice") > 100000)
      .agg(FilterExprs.bloomFilterAgg(xxhash64(col("o_custkey")), 1000L, 8000L).as("bf"))
      .head()
    val bloomBytes = bloomRow.getAs[Array[Byte]](0)

    val members = orders.filter(col("o_totalprice") > 100000)
      .select(col("o_custkey")).distinct()
      .collect().map(_.getLong(0)).toSet

    val checked = customers
      .select(col("c_custkey"),
        FilterExprs.mightContain(lit(bloomBytes), xxhash64(col("c_custkey"))).as("maybe"))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))

    val falseNeg = checked.count { case (k, maybe) => members(k) && !maybe }
    assert(falseNeg === 0, "bloom filters must never drop true members")

    val nonMembers = checked.count { case (k, _) => !members(k) }
    val falsePos = checked.count { case (k, maybe) => maybe && !members(k) }
    if (nonMembers > 50) {
      assert(falsePos.toDouble / nonMembers < 0.2,
        s"false-positive rate too high: $falsePos/$nonMembers")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {

  test("salted join result == plain join result (inner and left)") {
    val o = Tables.table(spark, sfDir, "orders")
    val c = Tables.table(spark, sfDir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

    for (jt <- Seq("inner", "left")) {
      val plain = o.join(c, Seq("o_custkey"), jt)
        .select("o_orderkey", "o_custkey", "c_mktsegment")
      val salted = Skew.saltedJoin(o, c, "o_custkey", col("o_orderkey"), salts = 8, jt)
        .select("o_orderkey", "o_custkey", "c_mktsegment")
      assert(canon(salted) === canon(plain), s"join type $jt")
    }
  }

  test("salt column is deterministic and uniform-ish") {
    val o = Tables.table(spark, sfDir, "orders")
    val s1 = o.select(Skew.saltCol(col("o_orderkey"), 8).as("s"))
    val counts = s1.groupBy("s").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet === (0 until 8).toSet)
    val (mn, mx) = (counts.values.min.toDouble, counts.values.max.toDouble)
    assert(mx / mn < 1.5, s"salt imbalance: $counts")
    // deterministic across evaluations
    assert(s1.collect().map(_.getInt(0)).toSeq === s1.collect().map(_.getInt(0)).toSeq)
  }
}

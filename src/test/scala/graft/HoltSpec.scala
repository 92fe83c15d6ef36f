package graft

import org.apache.spark.sql.functions._

import graft.functions.HoltFunctions

/** Ground-truth pins for the integer fixed-point Holt fold: hand-computed
  * steps, trend-sign behavior, and aggregator ≡ fold-oracle equality on
  * the real corpus under repartitioning (order-sensitivity guard).
  */
class HoltSpec extends SparkSpec {

  import spark.implicits._

  test("foldOracle: hand-computed two steps (alpha=0.5, beta=0.5)") {
    // x1=8: l=(5e5*8e6 + 5e5*0) div 1e6 = 4e6; b=(5e5*4e6) div 1e6 = 2e6
    // x2=8: l=(5e5*8e6 + 5e5*6e6) div 1e6 = 7e6
    //       b=(5e5*(7e6-4e6) + 5e5*2e6) div 1e6 = 2.5e6
    val got = HoltFunctions.foldOracle(Seq(8.0, 8.0), 500000L, 500000L)
    assert(got === HoltFunctions.HoltOut(7000000L, 2500000L, 9500000L))
  }

  test("foldOracle: steady ramp yields a positive trend, flat series decays it") {
    val ramp = HoltFunctions.foldOracle((1 to 50).map(_.toDouble), 300000L, 100000L)
    assert(ramp.trend_micro > 0, "increasing series must carry positive trend")
    val flat = HoltFunctions.foldOracle(Seq.fill(200)(5.0), 300000L, 100000L)
    // truncating divisions leak a few micro per step near the fixed point
    // (the PageRank mass convention) — the level parks a hair under x
    assert(math.abs(flat.level_micro - 5000000L) <= 5L,
      s"flat series level ${flat.level_micro} strayed from 5e6")
    assert(math.abs(flat.trend_micro) <= 2L, "flat series trend decays to ~0")
  }

  test("aggregator == foldOracle on the corpus, exact under repartitioning") {
    val holt = HoltFunctions.holtUdaf(300000L, 100000L)
    def run(rep: Int) = Tables.events(spark, sfDir)
      .repartition(rep)
      .withColumn("tsl", unix_micros(col("ts")))
      .groupBy(col("event_type"))
      .agg(holt(col("tsl"), col("event_id"), col("value")).as("h"))
      .select(col("event_type"), col("h.level_micro"), col("h.trend_micro"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val a = run(3)
    assert(a === run(17), "merge-order must not affect the sorted fold")
    // driver-side reference on one group
    val rows = Tables.events(spark, sfDir)
      .withColumn("tsl", unix_micros(col("ts")))
      .filter(col("event_type") === "click")
      .select("tsl", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).map(_._3).toSeq
    val ref = HoltFunctions.foldOracle(rows, 300000L, 100000L)
    assert(a("click") === ((ref.level_micro, ref.trend_micro)))
  }
}

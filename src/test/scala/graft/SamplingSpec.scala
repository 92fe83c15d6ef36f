package graft

import org.apache.spark.sql.functions._

import graft.queries.Registry

class SamplingSpec extends SparkSpec {

  test("q61: stratified sample rates land near the requested fractions and are seed-stable") {
    val totals = Tables.events(spark, sfDir)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fractions = Map("purchase" -> 0.5, "click" -> 0.1, "view" -> 0.05)
    val sampled = Registry.queries("q61_stratified_sample")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sampled.foreach { case (k, n) =>
      fractions.get(k).foreach { f =>
        val expect = totals(k) * f
        assert(n <= totals(k))
        assert(math.abs(n - expect) <= math.max(10, expect * 0.5),
          s"$k: sampled $n, expected ~$expect of ${totals(k)}")
      }
    }
    // non-requested classes are dropped entirely by sampleBy
    assert(sampled.keySet.subsetOf(fractions.keySet))
    // seed-stable
    val again = Registry.queries("q61_stratified_sample")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === sampled)
  }
}

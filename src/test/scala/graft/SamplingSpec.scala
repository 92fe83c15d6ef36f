package graft

import org.apache.spark.sql.functions._

import graft.queries.Registry

class SamplingSpec extends SparkSpec {

  test("q61: stratified sample rates land near the requested fractions and are seed-stable") {
    val totals = Tables.events(spark, sfDir)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fractions = Map("purchase" -> 0.5, "click" -> 0.1, "view" -> 0.05)
    // rate + drop-class assertions on the raw sampleBy output (the query's
    // oracled form reduces this to an in_bounds boolean)
    val sampled = Tables.events(spark, sfDir)
      .stat.sampleBy("event_type", fractions, seed = 42L)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
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
    // strong seed-stability pin: the raw sampler reproduces EXACT
    // per-stratum counts on a second run with the same seed
    val rerun = Tables.events(spark, sfDir)
      .stat.sampleBy("event_type", fractions, seed = 42L)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rerun === sampled, "sampleBy(seed=42) not reproducible run-to-run")
    // the query form: every stratum in bounds, totals exact, seed-stable
    val q = Registry.queries("q61_stratified_sample")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(q.keySet === fractions.keySet)
    q.foreach { case (k, (nTotal, inBounds)) =>
      assert(nTotal === totals(k))
      assert(inBounds, s"$k sampled count out of bounds")
    }
    val again = Registry.queries("q61_stratified_sample")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(again === q)
  }
}

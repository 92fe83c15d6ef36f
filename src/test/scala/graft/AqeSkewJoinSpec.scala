package graft

import org.apache.spark.sql.functions._

/** AQE's runtime skew-join split — the automatic complement to
  * Skew.saltedJoin: with thresholds scaled down to test size, a join
  * whose shuffle has one hot key must still produce exact results while
  * AQE marks the sort-merge join skew-handled.
  */
class AqeSkewJoinSpec extends SparkSpec {

  test("skewed shuffle join splits under AQE and stays correct") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key (0) with 60k rows, 100 cold keys with 100 each
      val fact = spark.range(60000).select(
          lit(0L).as("k"), col("id").as("payload"))
        .union(spark.range(10000).select(
          (col("id") % 100 + 1).as("k"), col("id").as("payload")))
        .withColumn("pad", concat_ws("", array_repeat(lit("x"), 64)))
      val dim = spark.range(101).select(col("id").as("k"), (col("id") * 10).as("dimval"))

      // no partitioning-preserving operator above the join: a downstream
      // groupBy(k) would make AQE skip the skew split (it would need an
      // extra shuffle); keep `pad` referenced so partitions have real bytes
      val joined = fact.join(dim, Seq("k"))
        .select(col("k"), col("dimval"), col("pad"))
      val rows = joined.collect()
      val byKey = rows.groupBy(_.getLong(0))
      assert(byKey(0L).length === 60000)
      assert(byKey(0L).forall(_.getLong(1) === 0L))
      (1L to 100L).foreach { k =>
        assert(byKey(k).length === 100)
        assert(byKey(k).forall(_.getLong(1) === k * 10))
      }

      val plan = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(plan.contains("skew=true"), s"expected AQE skew-handled join in:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}

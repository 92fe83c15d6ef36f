package graft

import java.nio.file.Files
import java.util.Properties

import org.apache.spark.sql.functions._

import graft.streaming.EwmaPipeline

/** Entry point C (SURVEY.md §3.3): stream -> JDBC table with pk-dedup
  * before insert, exercised end-to-end against embedded Derby (the only
  * JDBC engine in this container — it ships with Spark for the Hive
  * metastore).
  */
class JdbcSinkSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("streaming foreachBatch JDBC sink persists rows, deduped on the pk") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
      .limit(500)
    // duplicate every row to prove pk-dedup (the reference JDBC sink
    // upserts on pk.fields=timestamp; we dedup-before-insert per batch)
    val withDups = ev.union(ev)
    val dir = Files.createTempDirectory("graft-jdbc-").toString
    withDups.coalesce(1).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)

    val props = new Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val checkpoint = Files.createTempDirectory("graft-jdbc-ckpt-").toString
    val q = EwmaPipeline.jdbcSink(stream, url, "raw_events", props, "event_id", checkpoint)
      .start()
    try q.processAllAvailable() finally q.stop()

    val back = spark.read.jdbc(url, "raw_events", props)
    assert(back.count() === 500) // dups on the pk removed per batch
    assert(back.select("event_id").distinct().count() === 500)
    // values survived the round trip
    val sumWant = ev.agg(sum("value")).head().getDouble(0)
    val sumGot = back.agg(sum("value")).head().getDouble(0)
    assert(math.abs(sumWant - sumGot) < 1e-6)

    // crash-replay: a FRESH checkpoint re-delivers every batch (the
    // worst-case at-least-once retry); the table-level anti-join must
    // keep the table unchanged instead of duplicating or crash-looping
    val ckpt2 = Files.createTempDirectory("graft-jdbc-ckpt2-").toString
    val q2 = EwmaPipeline.jdbcSink(
      spark.readStream.schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", 1).parquet(dir),
      url, "raw_events", props, "event_id", ckpt2).start()
    try q2.processAllAvailable() finally q2.stop()
    val after = spark.read.jdbc(url, "raw_events", props)
    assert(after.count() === 500, "replayed batches must not re-insert pk rows")
  }

  test("table-absence probe: metadata check, not exception swallowing") {
    val props = new Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    // present after the sink test created it; absent name answers false
    assert(EwmaPipeline.jdbcTableExists(url, "raw_events", props))
    assert(!EwmaPipeline.jdbcTableExists(url, "no_such_table_here", props))
    // a broken connection PROPAGATES (would previously degrade to a blind
    // append exactly when the dedup probe mattered most)
    intercept[Exception] {
      EwmaPipeline.jdbcTableExists(
        "jdbc:derby:memory:absentdb", "raw_events", props) // no ;create=true
    }
  }

  test("table probe finds quoted mixed-case identifiers via the catalog fallback") {
    val props = new Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      conn.createStatement().execute(
        """CREATE TABLE "Raw_Trades" (id BIGINT PRIMARY KEY)""")
      // none of the exact/UPPER/lower case-fold probes hit a quoted
      // mixed-case name — only the full-catalog fallback does
      assert(EwmaPipeline.jdbcTableExists(url, "Raw_Trades", props))
      assert(EwmaPipeline.jdbcTableExists(url, "raw_trades", props))
    } finally {
      try conn.createStatement().execute("""DROP TABLE "Raw_Trades"""")
      finally conn.close()
    }
  }

  test("bounded probe is used only for collation-free pk types") {
    import org.apache.spark.sql.types._
    // numeric/temporal orderings mean the same thing in Spark and any DB
    for (dt <- Seq(LongType, IntegerType, DoubleType, DecimalType(10, 2),
        DateType, TimestampType, TimestampNTZType))
      assert(EwmaPipeline.collationFreePkType(dt), s"$dt should allow the bounded probe")
    // string ordering is collation-dependent (e.g. Postgres 'a' < 'B'):
    // a pushed [lo,hi] range evaluated under the DB's collation can
    // exclude an existing pk Spark considers in-range -> replay dup
    for (dt <- Seq(StringType, BinaryType, BooleanType))
      assert(!EwmaPipeline.collationFreePkType(dt), s"$dt must use the unbounded probe")
  }

  test("string-pk sink stays replay-idempotent via the unbounded probe") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select(concat(lit("doc-"), col("doc_id")).as("pk"), col("n_chars"))
      .limit(200)
    val dir = Files.createTempDirectory("graft-jdbc-str-").toString
    docs.union(docs).coalesce(1).write.mode("overwrite").parquet(dir)
    val props = new Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    def run(): Unit = {
      val ckpt = Files.createTempDirectory("graft-jdbc-str-ckpt-").toString
      val q = EwmaPipeline.jdbcSink(
        spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir),
        url, "raw_docs", props, "pk", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.jdbc(url, "raw_docs", props).count() === 200)
    run() // fresh checkpoint = full redelivery; table must be unchanged
    assert(spark.read.jdbc(url, "raw_docs", props).count() === 200,
      "string-pk replay must not re-insert rows")
  }

  test("idempotency probe pushes the batch pk range down to the database") {
    val props = new Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val probe = EwmaPipeline.boundedPkProbe(
      spark, url, "raw_events", props, "event_id", 100L, 200L)
    val scan = probe.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(EVENT_ID,100)") ||
      scan.contains("GreaterThanOrEqual(event_id,100)"),
      s"pk lower bound not pushed to JDBC:\n$scan")
    assert(scan.contains("LessThanOrEqual(EVENT_ID,200)") ||
      scan.contains("LessThanOrEqual(event_id,200)"),
      s"pk upper bound not pushed to JDBC:\n$scan")
    // and the bounded read is still correct
    val n = probe.count()
    val want = spark.read.jdbc(url, "raw_events", props)
      .filter(col("event_id").between(100L, 200L)).count()
    assert(n === want)
  }
}

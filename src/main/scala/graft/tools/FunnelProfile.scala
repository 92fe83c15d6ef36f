package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the curation front door's decide() body at a
  * given SF — the measure-don't-guess harness behind the round-16
  * headroom work. Each stage is timed twice (JIT warm).
  */
object FunnelProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.registerAggregates(spark)
    import graft.operators._
    val model = graft.Pipelines.funnelModel(spark, sfDir)
    val docs = graft.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def timed(name: String)(body: => Long): Unit =
      (1 to 2).foreach { i =>
        Dedup.releaseAllCaches(); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = body
        println(f"[fprof] $name%-22s#$i ${(System.nanoTime() - t0) / 1e9}%7.2fs  n=$n")
      }
    val delta = docs.filter(col("doc_id") >= 250)
    val base = docs.filter(col("doc_id") < 250)
    timed("gopher_flags") {
      Curation.gopherRules(delta, "text", "doc_id", 20, 100000)
        .filter(col("f_words") && col("f_mean_len") && col("f_alpha")).count()
    }
    timed("delta_index") {
      Dedup.buildShingleIndex(delta, "text", "doc_id", 5).count()
    }
    timed("delta_banded") {
      Dedup.buildBandedIndex(
        Dedup.buildShingleIndex(delta, "text", "doc_id", 5)).count()
    }
    timed("dedup_inc") {
      Dedup.minhashNearDupsAgainstBase(
        Dedup.buildBandedIndex(Dedup.buildShingleIndex(base, "text", "doc_id", 5)),
        Dedup.buildBandedIndex(Dedup.buildShingleIndex(delta, "text", "doc_id", 5))).count()
    }
    timed("bloom_probe") {
      TextPipeline.bloomProbe(delta, model.bloom, "text", "doc_id", 1).count()
    }
    timed("lm_serve") {
      TextPipeline.unigramServeByVocab(delta, "text", "doc_id",
        model.lm, model.maxNllMicro).count()
    }
    timed("decide_full") {
      val (d, _) = CurationFunnel.decide(delta, "text", "doc_id",
        Dedup.buildBandedIndex(Dedup.buildShingleIndex(base, "text", "doc_id", 5)),
        model)
      d.count()
    }
    // phase-split of the streamFunnel body (Pipelines.streamFunnel clone)
    (1 to 2).foreach { rep =>
      Dedup.releaseAllCaches(); spark.catalog.clearCache()
      import java.nio.file.Files
      val tmp = Files.createTempDirectory("graft-fprof-").toString
      def ph(name: String)(body: => Unit): Unit = {
        val t0 = System.nanoTime()
        body
        println(f"[fprof] stream.$name%-15s#$rep ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      }
      try {
        ph("seed") {
          graft.streaming.StreamingCurationFunnel.seedIndex(
            base, "text", "doc_id", 5, s"$tmp/idx")
        }
        ph("input_write") { delta.write.parquet(s"$tmp/in") }
        ph("stream_run") {
          val stream = spark.readStream.schema(docs.schema)
            .option("maxBytesPerTrigger", (64L * 1024 * 1024).toString)
            .parquet(s"$tmp/in")
          val q = graft.streaming.StreamingCurationFunnel.run(
            stream, "text", "doc_id", model, s"$tmp/idx", s"$tmp/out", s"$tmp/ckpt")
          try q.processAllAvailable() finally q.stop()
        }
        ph("read_counts") {
          val dec = spark.read.parquet(s"$tmp/out")
          println(s"[fprof]   counts=(${dec.count()},${dec.filter(col("keep")).count()})")
        }
      } finally {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(tmp)).deleteRecursively(); ()
      }
    }
    spark.stop()
  }
}

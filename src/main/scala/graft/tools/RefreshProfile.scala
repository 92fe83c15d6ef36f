package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the refresh-cadence replay
  * (pipeline_stream_refresh's body): drives the two micro-batches
  * DIRECTLY through processBatchWithRefresh's constituent steps so each
  * phase gets its own clock, then times the same work through the real
  * streaming query for the harness-overhead delta. Two reps (JIT warm).
  */
object RefreshProfile {
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
    import graft.streaming.StreamingCurationFunnel
    val docs = graft.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val (model0, bloomFor) = graft.Pipelines.refreshArtifacts(spark, sfDir)

    (1 to 2).foreach { rep =>
      Dedup.releaseAllCaches(); spark.catalog.clearCache()
      StreamingCurationFunnel.clearRefreshMemo()
      val tmp = graft.Pipelines.prepareStreamRefresh(spark, sfDir)
      def ph(name: String)(body: => Unit): Unit = {
        val t0 = System.nanoTime()
        body
        println(f"[rprof] $name%-28s#$rep ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      }
      try {
        Seq(0L, 1L).foreach { b =>
          val epoch = b // refreshEvery = 1
          var lm: TextPipeline.UnigramModel = null
          ph(s"b$b.model") {
            lm =
              if (epoch == 0L) model0.lm
              else StreamingCurationFunnel.refreshedLm(
                spark, s"$tmp/cnt", epoch, model0.lm)
          }
          val model = model0.copy(lm = lm, bloom = bloomFor(epoch))
          val batch =
            if (b == 0L) docs.filter(col("doc_id") >= 250 && col("doc_id") < 400)
            else docs.filter(col("doc_id") >= 400)
          val scope = Dedup.newScope()
          try Dedup.inScope(scope) {
            var base: org.apache.spark.sql.DataFrame = null
            ph(s"b$b.readIndex") {
              base = StreamingCurationFunnel.readIndex(spark, s"$tmp/idx", b)
            }
            var decisions: org.apache.spark.sql.DataFrame = null
            var deltaIndex: org.apache.spark.sql.DataFrame = null
            var evaluated: org.apache.spark.sql.DataFrame = null
            ph(s"b$b.decide_plan") {
              val r = CurationFunnel.decideFull(batch, "text", "doc_id", base, model)
              decisions = r._1; deltaIndex = r._2; evaluated = r._3
            }
            ph(s"b$b.decisions_write") {
              decisions.write.mode("overwrite").parquet(s"$tmp/out/batch_id=$b")
            }
            ph(s"b$b.index_write") {
              deltaIndex.write.mode("overwrite").parquet(s"$tmp/idx/batch_id=$b")
            }
            ph(s"b$b.kept_counts_write") {
              // the REAL body's counts fold, in isolation
              StreamingCurationFunnel.writeKeptCounts(
                decisions, evaluated, "text", "doc_id", model0,
                s"$tmp/cnt", b, segDir = None)
            }
          } finally Dedup.releaseScope(scope)
        }
      } finally {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(tmp)).deleteRecursively(); ()
      }
    }

    // the real streamed body for the harness-overhead delta
    (1 to 2).foreach { rep =>
      Dedup.releaseAllCaches(); spark.catalog.clearCache()
      StreamingCurationFunnel.clearRefreshMemo()
      val tmp = graft.Pipelines.prepareStreamRefresh(spark, sfDir)
      try {
        val t0 = System.nanoTime()
        val r = graft.Pipelines.replayStreamRefresh(spark, sfDir, tmp)
        println(f"[rprof] streamed_total             #$rep ${(System.nanoTime() - t0) / 1e9}%7.2fs  $r")
      } finally {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(tmp)).deleteRecursively(); ()
      }
    }
    spark.stop()
  }
}

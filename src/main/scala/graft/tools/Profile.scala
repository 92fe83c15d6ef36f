package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFunctions => T}
import graft.operators.Dedup

/** Stage-level timing harness for slow queries: times each intermediate
  * of the MinHash-LSH dedup chain so optimization targets facts, not
  * guesses. Usage: runMain graft.tools.Profile <sfDir>
  */
object Profile {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.table(spark, sfDir, "documents")
    time("scan")(docs.count())

    val sets = Dedup.shingleSets(docs, "text", "doc_id", 5)
    time("shingleSets")(sets.count())
    time("shingleSets agg size")(sets.agg(sum(size(col("sh")))).head().getLong(0))

    val sig = sets.withColumn("sig", T.minhashSignatureFromHashes(col("sh"), 64))
    time("minhashSignature")(sig.agg(sum(size(col("sig")))).head().getLong(0))

    val banded = sig.select(col("doc"),
      posexplode(T.lshBandKeys(col("sig"), 16, 4)).as(Seq("band", "bkey")))
    time("banded")(banded.count())

    val a = banded.as("a"); val b = banded.as("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
    time("band join (pre-distinct)")(pairs.count())
    val cand = pairs.distinct()
    time("candidates distinct")(cand.count())

    time("jaccard verify")(
      Dedup.jaccardVerify(cand, docs, "text", "doc_id", 5, 0.8).count())

    time("full minhashNearDups")(
      Dedup.minhashNearDups(docs, "text", "doc_id", 5, 0.8, 16, 4).count())

    // connected components at adversarial scale: path graphs maximize
    // diameter (the old min-label propagation was O(diameter) rounds and
    // could not finish these); large-star/small-star is O(log n) rounds
    for (n <- Seq(10000L, 100000L, 1000000L)) {
      val chain = spark.range(1L, n)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      time(f"cc path graph n=$n%,d")(Dedup.connectedComponents(chain).count())
    }
    // and a bushy random graph: 2M edges over 1M nodes
    val randomEdges = spark.range(0L, 2000000L).select(
      (org.apache.spark.sql.functions.rand(7) * 1000000).cast("long").as("id_a"),
      (org.apache.spark.sql.functions.rand(8) * 1000000).cast("long").as("id_b"))
    time("cc random 2M edges / 1M nodes")(
      Dedup.connectedComponents(randomEdges).count())

    spark.stop()
  }
}

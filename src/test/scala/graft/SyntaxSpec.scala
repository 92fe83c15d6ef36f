package graft

import org.apache.spark.sql.functions._

import graft.syntax._

/** The fluent API must delegate to the tested operators unchanged. */
class SyntaxSpec extends SparkSpec {

  private lazy val docs = Tables.table(spark, sfDir, "documents")
  private lazy val emb = Tables.table(spark, sfDir, "embeddings")

  test("dedup chain: pairs -> clusters -> kept corpus") {
    val pairs = docs.nearDupPairsJaccard("text", "doc_id")
    val kept = docs.keepOnePerCluster("doc_id", pairs).filter(col("keep"))
    assert(kept.count() > 0 && kept.count() <= docs.count())
    // matches the operator called directly
    val direct = graft.operators.Dedup
      .keepRepresentatives(docs, "doc_id",
        graft.operators.Dedup.ngramJaccardPairs(docs, "text", "doc_id", 5, 0.8))
      .filter(col("keep")).count()
    assert(kept.count() === direct)
  }

  test("similarity and text stats produce well-formed columns") {
    val topk = emb.cosineTopK(emb.filter(col("vec_id") < 2), "embedding", "vec_id", 3)
    assert(topk.columns.toSeq === Seq("query_id", "rank", "neighbor_id", "cosine"))
    assert(topk.count() === 6)

    val stats = docs.limit(20).withTextStats("text")
    assert(Seq("n_tokens", "n_chars", "n_bpeish", "quality", "lang_pred")
      .forall(stats.columns.contains))
    assert(stats.filter(col("quality") < 0 || col("quality") > 1).count() === 0)
  }

  test("curation methods delegate to the Curation operators unchanged") {
    val viaSyntax = docs.gopherFilter("text", "doc_id", minWords = 20)
    val direct = graft.operators.Curation.gopherRules(docs, "text", "doc_id", minWords = 20)
    assert(viaSyntax.except(direct).count() === 0L)
    assert(viaSyntax.count() === direct.count())

    val sample = docs.groupHashSample("doc_id", "source", k = 2)
    assert(sample.groupBy("grp").count().filter(col("count") > 2).count() === 0L)
  }

  test("ewmaByKey matches the registry query result") {
    import graft.functions.EwmaFunctions
    val ev = Tables.events(spark, sfDir).withColumn("tsl", col("ts").cast("long"))
    val viaSyntax = ev.ewmaByKey("event_type", "tsl", "event_id", "value", 300)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val alpha = EwmaFunctions.alpha(300)
    val direct = ev.groupBy(col("event_type"))
      .agg(EwmaFunctions.ewmaOrdered(col("tsl"), col("event_id"), col("value"), alpha).as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaSyntax === direct)
  }
}

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

  test("round-6 methods delegate to their operators unchanged") {
    import org.apache.spark.sql.functions.unix_micros
    val ev = Tables.events(spark, sfDir).withColumn("tsu", unix_micros(col("ts")))
    val f1 = ev.funnel("user_id", "event_type", "tsu", Seq("view", "click"), 3600000000L)
    val f2 = graft.operators.EventAnalytics.funnel(
      ev, "user_id", "event_type", "tsu", Seq("view", "click"), 3600000000L)
    assert(f1.except(f2).count() === 0 && f2.except(f1).count() === 0)

    val s1 = ev.sessionize("user_id", "tsu", "event_id", 3600000000L)
    val s2 = graft.operators.EventAnalytics.sessionize(ev, "user_id", "tsu", "event_id", 3600000000L)
    assert(s1.except(s2).count() === 0)

    val o1 = ev.zscoreOutliers("event_type", "value", "event_id")
    val o2 = graft.operators.EventAnalytics.zscoreOutliers(ev, "event_type", "value", "event_id")
    assert(o1.except(o2).count() === 0)

    val e1 = docs.charEntropy("text", "doc_id")
    val e2 = graft.operators.TextPipeline.charEntropy(docs, "text", "doc_id")
    assert(e1.except(e2).count() === 0)

    val l1 = Tables.table(spark, sfDir, "orders")
      .latestByKey("o_custkey", "o_orderdate", "o_orderkey")
    val l2 = graft.operators.ChangeCapture.latestByKey(
      Tables.table(spark, sfDir, "orders"), "o_custkey", "o_orderdate", "o_orderkey")
    assert(l1.except(l2).count() === 0)
  }

  test("continuation chainers delegate to their operators") {
    val docs = Tables.table(spark, sfDir, "documents")
    assert(docs.shingleNovelty("text", "doc_id").except(
      graft.operators.Dedup.shingleNovelty(docs, "text", "doc_id")).count() === 0)
    assert(docs.chunkWithOverlap("text", "doc_id", 64, 16).except(
      graft.operators.Curation.chunkDocuments(docs, "text", "doc_id", 64, 16))
      .count() === 0)
    assert(docs.hashedFeatures("text", "doc_id", 32).except(
      graft.operators.TextPipeline.hashedFeatures(docs, "text", "doc_id", 32))
      .count() === 0)
    assert(docs.jsDivergenceBySource("text", "source").except(
      graft.operators.TextPipeline.jsDivergencePairs(docs, "text", "source"))
      .count() === 0)
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

  test("session-11 chainers delegate to their operators") {
    import spark.implicits._
    val qs = Seq((1L, "hash"), (1L, "join")).toDF("query_id", "term")
    val viaChain = docs.bm25TopK("text", "doc_id", qs, k = 5).collect()
    val direct = graft.operators.TextPipeline
      .bm25TopK(docs, "text", "doc_id", qs, k = 5).collect()
    assert(viaChain.map(_.toSeq).toSeq === direct.map(_.toSeq).toSeq)
    graft.operators.Dedup.releaseCaches()

    val ev = Tables.events(spark, sfDir)
    val viaStl = ev.stlDecompose("ts", "value", "event_type")
      .orderBy(col("grp"), col("day")).collect()
    val directStl = graft.operators.EventAnalytics
      .stlDecompose(ev, "ts", "value", "event_type")
      .orderBy(col("grp"), col("day")).collect()
    assert(viaStl.map(_.toSeq).toSeq === directStl.map(_.toSeq).toSeq)

    val viaSkew = Tables.table(spark, sfDir, "orders")
      .keySkewReport("o_custkey").collect().head
    val directSkew = graft.operators.Skew
      .keySkewReport(Tables.table(spark, sfDir, "orders"), "o_custkey")
      .collect().head
    assert(viaSkew.toSeq === directSkew.toSeq)
    graft.operators.Dedup.releaseCaches()

    val viaAcf = ev.acf("ts", "value", "event_type", maxLag = 3)
      .orderBy(col("grp"), col("lag")).collect()
    val directAcf = graft.operators.EventAnalytics
      .acf(ev, "ts", "value", "event_type", maxLag = 3)
      .orderBy(col("grp"), col("lag")).collect()
    assert(viaAcf.map(_.toSeq).toSeq === directAcf.map(_.toSeq).toSeq)
  }

  test("series/vocab/projection chainers delegate to their operators") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val viaMk = ev.mannKendall("ts", "value", "event_type")
      .orderBy(col("grp")).collect()
    val directMk = graft.operators.EventAnalytics
      .mannKendall(ev, "ts", "value", "event_type")
      .orderBy(col("grp")).collect()
    assert(viaMk.map(_.toSeq).toSeq === directMk.map(_.toSeq).toSeq)

    val viaMase = ev.forecastBacktest("ts", "value", "event_type")
      .orderBy(col("grp")).collect()
    val directMase = graft.operators.EventAnalytics
      .forecastBacktest(ev, "ts", "value", "event_type")
      .orderBy(col("grp")).collect()
    assert(viaMase.map(_.toSeq).toSeq === directMase.map(_.toSeq).toSeq)

    val viaSeg = ev.binarySegmentation("ts", "value", "event_type")
      .orderBy(col("grp"), col("seg_start")).collect()
    val directSeg = graft.operators.EventAnalytics
      .binarySegmentation(ev, "ts", "value", "event_type")
      .orderBy(col("grp"), col("seg_start")).collect()
    assert(viaSeg.map(_.toSeq).toSeq === directSeg.map(_.toSeq).toSeq)

    val viaGt = docs.goodTuring("text", maxR = 5)
      .orderBy(col("r")).collect()
    val directGt = graft.operators.TextPipeline
      .goodTuring(docs, "text", maxR = 5).orderBy(col("r")).collect()
    assert(viaGt.map(_.toSeq).toSeq === directGt.map(_.toSeq).toSeq)
    graft.operators.Dedup.releaseCaches()

    val emb = Tables.table(spark, sfDir, "embeddings")
    val planes = graft.functions.VectorFunctions.md5Planes(
      emb.select(org.apache.spark.sql.functions.size(col("embedding")))
        .head().getInt(0), 8)
    val viaJl = emb.jlDistortion("embedding", "vec_id", planes)
      .orderBy(col("id_a")).collect()
    val directJl = graft.operators.Similarity
      .jlDistortion(emb, "embedding", "vec_id", planes)
      .orderBy(col("id_a")).collect()
    assert(viaJl.map(_.toSeq).toSeq === directJl.map(_.toSeq).toSeq)

    val li = Tables.table(spark, sfDir, "lineitem")
    val viaLz = li.lorenzCurve("l_returnflag", "l_extendedprice")
      .orderBy(col("grp"), col("decile")).collect()
    val directLz = graft.operators.DataPrep
      .lorenzCurve(li, "l_returnflag", "l_extendedprice")
      .orderBy(col("grp"), col("decile")).collect()
    assert(viaLz.map(_.toSeq).toSeq === directLz.map(_.toSeq).toSeq)

    val viaSp = li.spearmanCorr("l_returnflag", "l_quantity", "l_extendedprice")
      .orderBy(col("grp")).collect()
    val directSp = graft.operators.FeatureEng
      .spearmanCorr(li, "l_returnflag", "l_quantity", "l_extendedprice")
      .orderBy(col("grp")).collect()
    assert(viaSp.map(_.toSeq).toSeq === directSp.map(_.toSeq).toSeq)

    val viaHill = li.hillTailIndex("l_returnflag", "l_extendedprice", k = 50)
      .orderBy(col("grp")).collect()
    val directHill = graft.operators.DataPrep
      .hillTailIndex(li, "l_returnflag", "l_extendedprice", k = 50)
      .orderBy(col("grp")).collect()
    assert(viaHill.map(_.toSeq).toSeq === directHill.map(_.toSeq).toSeq)

    val viaTm = li.trimmedMeanBps("l_returnflag", "l_extendedprice")
      .orderBy(col("grp")).collect()
    val directTm = graft.operators.DataPrep
      .trimmedMeanBps(li, "l_returnflag", "l_extendedprice")
      .orderBy(col("grp")).collect()
    assert(viaTm.map(_.toSeq).toSeq === directTm.map(_.toSeq).toSeq)
  }
}

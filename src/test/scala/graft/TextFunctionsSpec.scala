package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c.as("out")).head().get(0)

  test("tokens: lowercase whitespace split, empties dropped") {
    assert(one("  Hello   WORLD  ", T.tokens(col("text"))) === Seq("hello", "world"))
    assert(one("", T.tokens(col("text"))) === Seq())
    assert(one("   ", T.tokens(col("text"))) === Seq())
  }

  test("token counts: whitespace and BPE-ish") {
    assert(one("one two three", T.tokenCount(col("text"))) === 3)
    // "don't stop" -> [don] ['] [t] [stop] = 4 bpe-ish tokens
    assert(one("don't stop", T.bpeishTokenCount(col("text"))) === 4)
    // digit runs and letter runs split: "abc123 x" -> [abc] [123] [x]
    assert(one("abc123 x", T.bpeishTokenCount(col("text"))) === 3)
  }

  test("word shingles: k-grams in order; short docs yield the whole doc") {
    def shingles(text: String, k: Int): Seq[String] =
      Seq(text).toDF("text")
        .withColumn("w", T.tokens(col("text")))
        .select(T.wordShinglesFromTokens(col("w"), k).as("out"))
        .head().getSeq[String](0)
    assert(shingles("a b c d", 2) === Seq("a b", "b c", "c d"))
    assert(shingles("a b", 5) === Seq("a b"))
  }

  test("simhash: identical text -> identical hash; distinct texts differ") {
    val df = Seq("the quick brown fox", "the quick brown fox", "entirely different words here")
      .toDF("text").select(T.simhash64(col("text")).as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(0) === hs(1))
    assert(hs(0) !== hs(2))
  }

  test("simhash: near-identical docs are close in hamming distance") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("dog", "cat")
    val far = "numerical weather prediction uses atmospheric physics models extensively"
    val hs = Seq(base, near, far).toDF("text")
      .select(T.simhash64(col("text")).as("h")).collect().map(_.getLong(0))
    val dNear = java.lang.Long.bitCount(hs(0) ^ hs(1))
    val dFar = java.lang.Long.bitCount(hs(0) ^ hs(2))
    assert(dNear < dFar, s"near=$dNear far=$dFar")
  }

  test("Md5LongHashes (codegen) == md5-hex conv formulation over the corpus") {
    import org.apache.spark.sql.functions._
    val docs = Tables.table(spark, sfDir, "documents")
      .withColumn("w", T.tokens(col("text")))
    val viaExpr = docs.select(
      org.apache.spark.sql.graftvec.TextExprs.md5LongHashesCol(col("w")).as("h"))
    val viaConv = docs.select(transform(col("w"), t =>
      shiftleft(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), 32)
        .bitwiseOR(conv(substring(md5(t), 9, 8), 16, 10).cast("long"))).as("h"))
    assert(viaExpr.exceptAll(viaConv).count() === 0L)
    assert(viaConv.exceptAll(viaExpr).count() === 0L)
  }

  test("rolling fingerprint is order-sensitive") {
    val hs = Seq("alpha beta gamma", "gamma beta alpha").toDF("text")
      .select(T.rollingFingerprint(col("text")).as("h")).collect().map(_.getLong(0))
    assert(hs(0) !== hs(1))
  }

  test("langId picks the language with densest stopwords") {
    assert(one("the cat sat on the mat and it is that for", T.langId(col("text"))) === "en")
    assert(one("le chat est dans la maison et pour que", T.langId(col("text"))) === "fr")
    assert(one("der hund ist in das haus und mit von", T.langId(col("text"))) === "de")
  }

  test("StopwordHits (codegen) == interpreted HOF formulation over the corpus") {
    val langs = T.stopwords.keys.toSeq.sorted
    val docs = Tables.table(spark, sfDir, "documents")
      .withColumn("w", T.tokens(col("text")))
    val fused = docs.select(
      col("doc_id"),
      org.apache.spark.sql.graftvec.TextExprs
        .stopwordHitsCol(col("w"), langs.map(T.stopwords(_))).as("hits"))
    val viaHof = docs.select(
      col("doc_id") +:
        langs.map(l => size(filter(col("w"),
          t => array_contains(array(T.stopwords(l).map(lit): _*), t))).as(l)): _*)
    val mismatches = fused
      .select(col("doc_id") +:
        (0 until langs.size).map(i => element_at(col("hits"), i + 1).as(langs(i))): _*)
      .exceptAll(viaHof).count()
    assert(mismatches === 0)
    // langId over the corpus agrees with the pre-fusion scoring rule on
    // every row (same ratios, same tie rules)
    val viaRatio = docs.select(col("doc_id"), array_max(array(
      langs.zipWithIndex.map { case (l, i) =>
        struct(
          T.stopwordRatioFromTokens(col("w"), l).as("score"),
          lit(if (l == "en") 1 else 0).as("pref"),
          lit(langs.size - i).as("rank"),
          lit(l).as("lang"))
      }: _*)).getField("lang").as("predicted"))
    val direct = docs.select(col("doc_id"), T.langIdFromTokens(col("w")).as("predicted"))
    assert(direct.exceptAll(viaRatio).count() === 0)
  }

  test("quality score is in [0,1] over the corpus") {
    val q = Tables.table(spark, sfDir, "documents")
      .select(T.qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).head()
    assert(q.getDouble(0) >= 0.0 && q.getDouble(1) <= 1.0)
  }

  test("CharGramMd5 (codegen) == md5(substr) formulation, incl. multibyte text") {
    import spark.implicits._
    import org.apache.spark.sql.graftvec.TextExprs
    // corpus rows + constructed multibyte/emoji/short/empty edge cases
    val edge = Seq("🎉漢字テスト🎉 mixed ascii und ümlaut ß text here",
      "ab", "", "exactly-eight", "🎉" * 12).toDF("text")
    val docs = Tables.table(spark, sfDir, "documents").select(col("text"))
      .unionByName(edge)
    for ((len, stride) <- Seq((8, 1), (8, 3), (32, 8))) {
      val mismatches = docs
        .withColumn("fast", TextExprs.charGramMd5Col(col("text"), len, stride))
        .withColumn("ref",
          when(length(col("text")) < len, array().cast("array<string>"))
            .otherwise(transform(
              sequence(lit(1), length(col("text")) - (len - 1), lit(stride)),
              i => md5(col("text").substr(i, lit(len))))))
        .filter(not(col("fast") === col("ref")))
        .count()
      assert(mismatches === 0L, s"len=$len stride=$stride")
    }
  }
}

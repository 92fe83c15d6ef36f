package graft

import java.security.MessageDigest

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.TextClassify

class TextClassifySpec extends SparkSpec {

  import spark.implicits._

  /** The operator's md5 train gate, replicated independently. */
  private def inTrain(did: Long, trainBps: Int): Boolean = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(did.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 4)
    hex < f"${trainBps.toLong * 65536 / 10000}%04x"
  }

  /** Exact integer reference: micro-nat weight grid + prior, argmax with
    * smallest-label tie-break — the operator's formula computed directly.
    */
  private def nbReference(
      docs: Seq[(Long, String, String)], trainBps: Int): Map[Long, String] = {
    val toks = docs.map { case (id, y, text) =>
      (id, y, text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    }
    val train = toks.filter(t => inTrain(t._1, trainBps))
    val cnt = train.flatMap(t => t._3.map(t._2 -> _))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val classes = train.map(_._2).distinct.sorted
    val nDocs = train.size.toLong
    val docsC = train.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val nC = classes.map(c =>
      c -> cnt.collect { case ((y, _), n) if y == c => n }.sum).toMap
    val vocab = cnt.keys.map(_._2).toSet
    val v = vocab.size.toLong
    val prior = classes.map(c =>
      c -> math.round(math.log(docsC(c).toDouble / nDocs) * 1e6)).toMap
    def w(c: String, t: String): Long =
      math.round(math.log((cnt.getOrElse((c, t), 0L) + 1.0) / (nC(c) + v)) * 1e6)
    toks.filter(t => !inTrain(t._1, trainBps)).map { case (id, _, ts) =>
      val best = classes.map { c =>
        (prior(c) + ts.filter(vocab).map(w(c, _)).sum, c)
      }.minBy { case (s, c) => (-s, c) }
      id -> best._2
    }.toMap
  }

  test("naiveBayes: separable vocab routes held-out docs to their class") {
    // two cleanly separable classes; enough docs that both splits are hit
    val docs = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, "alpha", "x x y common")
      else (i, "beta", "z z w common")
    }
    val got = TextClassify.naiveBayesPredict(
        docs.toDF("doc_id", "lang", "text"), "text", "doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.nonEmpty, "held-out split must be non-empty")
    got.foreach { case (id, y, p) =>
      assert(!inTrain(id, 8000), s"doc $id should be test-split")
      assert(p === y, s"doc $id: predicted $p, actual $y")
    }
  }

  test("naiveBayes: all-OOV test doc falls back to the prior argmax") {
    // class 'big' has 3x the train docs of 'sml'; the probe doc's tokens
    // are outside the train vocabulary so only priors differentiate.
    // doc_id 3 is test under the 8000-bps gate (md5('3') >= 'cccc').
    assert(!inTrain(3L, 8000))
    val train = (10L until 40L).map(i =>
      if (i % 4 == 0) (i, "sml", "aa bb") else (i, "big", "cc dd"))
      .filter(t => inTrain(t._1, 8000))
    val docs = train :+ ((3L, "big", "zz qq"))
    val got = TextClassify.naiveBayesPredict(
        docs.toDF("doc_id", "lang", "text"), "text", "doc_id", "lang")
      .filter(col("did") === 3L).collect()
    assert(got.length === 1 && got(0).getString(2) === "big")
  }

  test("naiveBayes: matches the exact integer reference on random corpus") {
    val rnd = new Random(7)
    val langs = Seq("aa", "bb", "cc")
    // per-class skewed vocab so the model has signal but overlap exists
    val vocab = Map(
      "aa" -> Seq("red", "red", "green", "blue", "k1", "k2"),
      "bb" -> Seq("green", "green", "blue", "red", "k2", "k3"),
      "cc" -> Seq("blue", "blue", "red", "green", "k3", "k1"))
    val docs = (0L until 120L).map { i =>
      val y = langs(rnd.nextInt(3))
      val text = (0 until (3 + rnd.nextInt(8)))
        .map(_ => vocab(y)(rnd.nextInt(6))).mkString(" ")
      (i, y, text)
    }
    val expected = nbReference(docs, 8000)
    val got = TextClassify.naiveBayesPredict(
        docs.toDF("doc_id", "lang", "text"), "text", "doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got === expected)
  }

  test("naiveBayes: repartition-invariant predictions") {
    val rnd = new Random(11)
    val docs = (0L until 60L).map { i =>
      val y = if (rnd.nextBoolean()) "p" else "q"
      (i, y, Seq.fill(5)(s"t${rnd.nextInt(10)}").mkString(" "))
    }
    val df = docs.toDF("doc_id", "lang", "text")
    val a = TextClassify.naiveBayesPredict(df, "text", "doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = TextClassify.naiveBayesPredict(df.repartition(7), "text", "doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a === b)
  }

  test("naiveBayesApplyWithMargin: margin = best minus runner-up, agrees " +
      "with apply's argmax; single-class model reads the infinite sentinel") {
    val docs = Seq((10L, "big", "cc dd"), (11L, "big", "cc dd"),
      (12L, "sml", "aa bb"), (13L, "sml", "aa bb"), (14L, "big", "cc ee"))
      .toDF("doc_id", "lang", "text")
    val model = TextClassify.naiveBayesTrain(docs, "text", "doc_id", "lang")
    val plain = TextClassify.naiveBayesApply(model, docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val m = TextClassify.naiveBayesApplyWithMargin(model, docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    m.foreach { case (id, (p, margin)) =>
      assert(p === plain(id), s"doc $id argmax must agree with apply")
      assert(margin >= 0L)
    }
    // clearly-separable docs carry strictly positive margins
    assert(m(10L)._2 > 0L && m(12L)._2 > 0L)
    // single-class model: the sentinel
    val solo = TextClassify.naiveBayesTrain(
      Seq((1L, "only", "x y")).toDF("doc_id", "lang", "text"),
      "text", "doc_id", "lang")
    val s1 = TextClassify.naiveBayesApplyWithMargin(solo,
        Seq((9L, "x")).toDF("doc_id", "text"), "text", "doc_id")
      .collect().head
    assert(s1.getString(1) === "only" && s1.getLong(2) === (1L << 62))
  }

  test("naiveBayes: trainBps=10000 rejected (no held-out split)") {
    val e = intercept[IllegalArgumentException] {
      TextClassify.naiveBayesPredict(
        Seq((1L, "a", "x")).toDF("doc_id", "lang", "text"),
        "text", "doc_id", "lang", trainBps = 10000)
    }
    assert(e.getMessage.contains("trainBps"))
  }
}

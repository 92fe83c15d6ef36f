package graft

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.TextPipeline

/** Differential fuzzing + guards for the unigram-LM tokenizer (round-14
  * directive #4): a pure-Scala first-principles replica of seed + hard-EM
  * Viterbi rounds + Laplace micro-nat scoring, run against
  * [[TextPipeline.unigramTrain]]/[[TextPipeline.unigramEncode]] on random
  * tie-dense small-alphabet corpora.
  */
class UnigramTokenizerSpec extends SparkSpec {
  import spark.implicits._

  private val Absent = -1000000000000L

  /** (piece, plen, cnt, logp_micro, kept) + per-word segmentations —
    * the exact arithmetic of the operator, re-derived from scratch. */
  private def replica(docs: Seq[String], maxLen: Int, nSeed: Int,
      rounds: Int): (Seq[(String, Long, Long, Long, Boolean)], Map[String, Seq[String]]) = {
    val toks = docs.flatMap(_.trim.toLowerCase
      .split("\\s+").filter(_.nonEmpty))
    val wf = toks.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val subCnt = mutable.Map.empty[String, Long].withDefaultValue(0L)
    wf.foreach { case (w, f) =>
      for (p <- 0 until w.length; l <- 1 to maxLen if p + l <= w.length)
        subCnt(w.substring(p, p + l)) += f
    }
    val chars = subCnt.filter(_._1.length == 1).toSeq
    val multi = subCnt.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(nSeed)
    val cands = chars ++ multi
    val v = cands.size
    def mstep(counts: Map[String, Long]): Map[String, Long] = {
      val full = cands.map { case (p, _) => p -> counts.getOrElse(p, 0L) }
      val t = full.map(_._2).sum
      full.map { case (p, c) =>
        p -> math.round(1e6 * math.log((c + 1.0) / (t + v).toDouble))
      }.toMap
    }
    var counts: Map[String, Long] = cands.toMap
    var scores = mstep(counts)
    def viterbi(w: String): Seq[String] = {
      val n = w.length
      val dp = Array.fill(n + 1)(0L)
      for (i <- 1 to n) {
        var best = Long.MinValue
        for (j <- 1 to math.min(maxLen, i)) {
          val prev = dp(i - j)
          val prevS = (prev - Math.floorMod(prev, 8L)) / 8L
          val sc = scores.getOrElse(w.substring(i - j, i), Absent)
          val cand = (prevS + sc) * 8L + j
          if (cand > best) best = cand
        }
        dp(i) = best
      }
      var pos = n
      val ps = mutable.Buffer.empty[String]
      while (pos > 0) {
        val j = Math.floorMod(dp(pos), 8L).toInt
        ps += w.substring(pos - j, pos)
        pos -= j
      }
      ps.toSeq
    }
    var segs = Map.empty[String, Seq[String]]
    for (_ <- 1 to rounds) {
      val c = mutable.Map.empty[String, Long].withDefaultValue(0L)
      segs = wf.keys.map(w => w -> viterbi(w)).toMap
      wf.foreach { case (w, f) => segs(w).foreach(p => c(p) += f) }
      counts = c.toMap
      scores = mstep(counts)
    }
    val out = cands.map { case (p, _) =>
      val c = counts.getOrElse(p, 0L)
      (p, p.length.toLong, c, scores(p), c > 0 || p.length == 1)
    }
    // encode segments under the FINAL scores (one more Viterbi pass)
    (out, wf.keys.map(w => w -> viterbi(w)).toMap)
  }

  private def randomCorpus(rnd: Random): Seq[String] = {
    val alpha = "abcde".take(3 + rnd.nextInt(3))
    val nWords = 5 + rnd.nextInt(25)
    (1 to nWords).map { _ =>
      val wordsInDoc = 1 + rnd.nextInt(4)
      (1 to wordsInDoc).map { _ =>
        val len = 1 + rnd.nextInt(7)
        (1 to len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }.mkString(" ")
    }
  }

  test("unigramTrain matches the first-principles replica on 12 random " +
      "tie-dense corpora") {
    val rnd = new Random(421)
    (1 to 12).foreach { trial =>
      val docs = randomCorpus(rnd)
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val maxLen = 2 + rnd.nextInt(2) // 2 or 3
      val nSeed = 4 + rnd.nextInt(12)
      val rounds = 1 + rnd.nextInt(2)
      val got = TextPipeline.unigramTrain(df, "text", maxLen, nSeed, rounds)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4))).sortBy(_._1)
      val (want, _) = replica(docs, maxLen, nSeed, rounds)
      assert(got.toSeq === want.sortBy(_._1),
        s"trial $trial (maxLen=$maxLen nSeed=$nSeed rounds=$rounds)")
    }
  }

  test("unigramEncode matches per-document piece counts and likelihood " +
      "from the replica's final segmentation") {
    val rnd = new Random(431)
    (1 to 6).foreach { trial =>
      val docs = randomCorpus(rnd)
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val (model, segs) = replica(docs, 3, 8, 2)
      val scores = model.map { case (p, _, _, s, _) => p -> s }.toMap
      val got = TextPipeline.unigramEncode(df, "text", "doc_id", 3, 8, 2)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val want = docs.zipWithIndex.map { case (t, i) =>
        val ws = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        val nPieces = ws.map(w => segs(w).size.toLong).sum
        val lp = ws.map(w => segs(w).map(scores).sum).sum
        i.toLong -> ((ws.size.toLong, nPieces, lp))
      }.toMap
      assert(got === want, s"trial $trial")
    }
  }

  test("unigram hand case: a dominant bigram becomes the kept piece and " +
      "segmentations prefer it over chars") {
    // 'ab' occurs 12x inside words; after EM its count must dominate and
    // every 'ab' word segments through the bigram (longer-piece tie-break
    // plus higher probability)
    val df = Seq.fill(6)((1L, "ab abab")).zipWithIndex
      .map { case ((_, t), i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextPipeline.unigramTrain(df, "text", 2, 4, 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(4)))).toMap
    assert(out("ab")._1 === 18L) // 6x "ab" (1 piece) + 6x "abab" (2 pieces)
    assert(out("ab")._2)
    assert(out("a")._1 === 0L && out("b")._1 === 0L) // chars unused...
    assert(out.contains("a") && out.contains("b")) // ...but kept
    val enc = TextPipeline.unigramEncode(df, "text", "doc_id", 2, 4, 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).distinct
    assert(enc === Array((2L, 3L))) // 2 tokens -> 3 'ab' pieces per doc
  }

  test("unigramQualityGate: nll is (-logp) DIV n_pieces of the encode " +
      "output, keep flags split at the threshold, guard fires") {
    val docs = randomCorpus(new Random(457))
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val enc = TextPipeline.unigramEncode(df, "text", "doc_id", 3, 8, 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val nlls = enc.map { case (d, (np, lp)) => d -> (-lp) / np }
    // a threshold strictly between min and max must split the flags
    val thr = (nlls.values.min + nlls.values.max) / 2 + 1
    val got = TextPipeline
      .unigramQualityGate(df, "text", "doc_id", thr, 3, 8, 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    got.foreach { case (d, (nll, keep)) =>
      assert(nll === nlls(d), s"doc $d nll")
      assert(keep === (nll < thr), s"doc $d keep")
    }
    if (nlls.values.min != nlls.values.max) {
      assert(got.values.exists(_._2) && got.values.exists(!_._2),
        "threshold between min and max must split the corpus")
    }
    intercept[IllegalArgumentException] {
      TextPipeline.unigramQualityGate(df, "text", "doc_id", 0L)
    }
  }

  test("unigramTrain is deterministic under repartitioning and rejects " +
      "out-of-contract parameters") {
    val docs = randomCorpus(new Random(443))
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val a = TextPipeline.unigramTrain(df, "text", 3, 8, 2).collect().toSeq
    val b = TextPipeline.unigramTrain(df.repartition(7), "text", 3, 8, 2)
      .collect().toSeq
    assert(a.map(_.toString).sorted === b.map(_.toString).sorted)
    intercept[IllegalArgumentException] {
      TextPipeline.unigramTrain(df, "text", maxPieceLen = 1)
    }
    intercept[IllegalArgumentException] {
      // 8 would alias to 0 in the mod-8 packed argmax — rejected
      TextPipeline.unigramTrain(df, "text", maxPieceLen = 8)
    }
    intercept[IllegalArgumentException] {
      TextPipeline.unigramTrain(df, "text", emRounds = 0)
    }
  }

  /** First-principles replica of the PRUNING schedule (round-15 directive
    * #1): seed + emRounds hard EM exactly as [[replica]], then pruneRounds
    * of (segment → per-piece ban-DP likelihood loss → drop the pruneFrac
    * lowest-loss multi pieces, clamped at targetVocab → M-step over the
    * survivors from the same segmentation's counts). */
  private def replicaPruned(docs: Seq[String], maxLen: Int, nSeed: Int,
      emRounds: Int, pruneRounds: Int, pruneFrac: Double,
      targetVocab: Int): Seq[(String, Long, Long, Long, Boolean)] = {
    val toks = docs.flatMap(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
    val wf = toks.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val subCnt = mutable.Map.empty[String, Long].withDefaultValue(0L)
    wf.foreach { case (w, f) =>
      for (p <- 0 until w.length; l <- 1 to maxLen if p + l <= w.length)
        subCnt(w.substring(p, p + l)) += f
    }
    val chars = subCnt.filter(_._1.length == 1).toSeq
    val multi0 = subCnt.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(nSeed)
    var cands: Seq[String] = (chars ++ multi0).map(_._1)
    def mstep(counts: Map[String, Long]): Map[String, Long] = {
      val full = cands.map(p => p -> counts.getOrElse(p, 0L))
      val t = full.map(_._2).sum
      val v = cands.size
      full.map { case (p, c) =>
        p -> math.round(1e6 * math.log((c + 1.0) / (t + v).toDouble))
      }.toMap
    }
    def viterbi(w: String, scores: Map[String, Long],
        ban: Option[String]): (Long, Seq[String]) = {
      val n = w.length
      val dp = Array.fill(n + 1)(0L)
      for (i <- 1 to n) {
        var best = Long.MinValue
        for (j <- 1 to math.min(maxLen, i)) {
          val piece = w.substring(i - j, i)
          val prev = dp(i - j)
          val prevS = (prev - Math.floorMod(prev, 8L)) / 8L
          val sc = if (ban.contains(piece)) Absent
            else scores.getOrElse(piece, Absent)
          val cand = (prevS + sc) * 8L + j
          if (cand > best) best = cand
        }
        dp(i) = best
      }
      var pos = n
      val ps = mutable.Buffer.empty[String]
      while (pos > 0) {
        val j = Math.floorMod(dp(pos), 8L).toInt
        ps += w.substring(pos - j, pos)
        pos -= j
      }
      ((dp(n) - Math.floorMod(dp(n), 8L)) / 8L, ps.toSeq)
    }
    var counts: Map[String, Long] = cands.map(p => p -> subCnt(p)).toMap
    var scores = mstep(counts)
    for (_ <- 1 to emRounds) {
      val c = mutable.Map.empty[String, Long].withDefaultValue(0L)
      wf.foreach { case (w, f) =>
        viterbi(w, scores, None)._2.foreach(p => c(p) += f)
      }
      counts = c.toMap
      scores = mstep(counts)
    }
    for (_ <- 1 to pruneRounds) {
      val segs = wf.keys.map(w => w -> viterbi(w, scores, None)).toMap
      val segCounts = mutable.Map.empty[String, Long].withDefaultValue(0L)
      wf.foreach { case (w, f) => segs(w)._2.foreach(p => segCounts(p) += f) }
      val multi = cands.filter(_.length >= 2)
      val nDrop = math.min(
        math.floor(multi.size * pruneFrac).toLong,
        math.max(cands.size.toLong - targetVocab, 0L)).toInt
      if (nDrop > 0) {
        val loss = mutable.Map.empty[String, Long].withDefaultValue(0L)
        wf.foreach { case (w, f) =>
          val (sFull, ps) = segs(w)
          ps.filter(_.length >= 2).distinct.foreach { p =>
            loss(p) += f * (sFull - viterbi(w, scores, Some(p))._1)
          }
        }
        val dropped = multi.map(p => (loss(p), p)).sorted.take(nDrop)
          .map(_._2).toSet
        cands = cands.filterNot(dropped)
      }
      counts = cands.map(p => p -> segCounts(p)).toMap
      scores = mstep(counts)
    }
    cands.map { p =>
      val c = counts(p)
      (p, p.length.toLong, c, scores(p), c > 0 || p.length == 1)
    }
  }

  test("unigramTrainPruned matches the first-principles pruning replica " +
      "on 8 random tie-dense corpora") {
    val rnd = new Random(467)
    (1 to 8).foreach { trial =>
      val docs = randomCorpus(rnd)
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val maxLen = 2 + rnd.nextInt(2)
      val nSeed = 6 + rnd.nextInt(10)
      val emRounds = 1 + rnd.nextInt(2)
      val pruneRounds = 1 + rnd.nextInt(3)
      val pruneFrac = Seq(0.2, 0.25, 0.5)(rnd.nextInt(3))
      val targetVocab = 4 + rnd.nextInt(12)
      val got = TextPipeline.unigramTrainPruned(df, "text", targetVocab,
          pruneFrac, maxLen, nSeed, emRounds, pruneRounds)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4))).sortBy(_._1)
      val want = replicaPruned(docs, maxLen, nSeed, emRounds, pruneRounds,
        pruneFrac, targetVocab).sortBy(_._1)
      assert(got.toSeq === want,
        s"trial $trial (maxLen=$maxLen nSeed=$nSeed em=$emRounds " +
          s"prune=$pruneRounds frac=$pruneFrac target=$targetVocab)")
    }
  }

  test("pruned training drops an obvious junk-piece tail, keeps every " +
      "single char, hits the target size, and every word stays servable") {
    // 200 copies of the real corpus word + ONE junk word: the junk word's
    // multi-char pieces make the frequency-shaped seed (nSeed is big
    // enough) but carry near-zero likelihood loss, so pruning must shed
    // them first while the dominant word's pieces survive
    val docs = Seq.fill(200)("tokfoo tokfoo") :+ "zqv"
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val nChars = docs.flatMap(_.split("\\s+")).flatten.distinct.size
    val targetVocab = nChars + 2
    val out = TextPipeline.unigramTrainPruned(df, "text", targetVocab,
        pruneFrac = 0.5, maxPieceLen = 3, nSeed = 16, emRounds = 1,
        pruneRounds = 5)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // the junk tail is gone — "zqv" carries real per-occurrence loss (its
    // char fallback is floor-priced) but only ONE occurrence weights it,
    // ~500x below the dominant word's pieces; coverage intact; size on target
    Seq("zq", "qv", "zqv").foreach(p =>
      assert(!out.contains(p), s"junk piece $p survived pruning"))
    "tokfzqv".foreach(ch =>
      assert(out.contains(ch.toString), s"char $ch pruned"))
    assert(out.size === targetVocab)
    // survivors are quality-shaped: the kept multi pieces all come from
    // the dominant word and carry its mass
    val multis = out.keys.filter(_.length >= 2)
    assert(multis.nonEmpty &&
      multis.forall(p => "tokfoo".contains(p) && out(p) > 0L))
    // every word (junk included) still segments under the pruned model
    val model = TextPipeline.unigramTrainPrunedModel(df, "text", targetVocab,
      pruneFrac = 0.5, maxPieceLen = 3, nSeed = 16, emRounds = 1,
      pruneRounds = 5)
    val served = TextPipeline
      .unigramServe(df, "text", "doc_id", model, maxNllMicro = 100000000L)
      .collect()
    assert(served.length === docs.size)
    served.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      "every token must yield at least one piece"))
  }

  test("a single token longer than the DP bound raises the named error " +
      "instead of mis-scoring (train and serve paths)") {
    val blob = "x" * 70000 // > MaxWordChars = 65536
    val df = Seq((1L, "normal words here"), (2L, blob)).toDF("doc_id", "text")
    val exTrain = intercept[Exception] {
      TextPipeline.unigramTrain(df, "text", 3, 4, 1).collect()
    }
    assert(exTrain.getMessage.contains("unigram") ||
      exTrain.getCause != null)
    val scores = TextPipeline
      .unigramTrain(df.filter(col("doc_id") === 1L), "text", 3, 4, 1)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val exServe = intercept[Exception] {
      TextPipeline.unigramServe(df, "text", "doc_id", scores, 1000000L, 3)
        .collect()
    }
    assert(exServe.getMessage != null)
    // well-formed docs still serve when the blob is gone
    assert(TextPipeline.unigramServe(df.filter(col("doc_id") === 1L),
      "text", "doc_id", scores, 1000000L, 3).count() === 1L)
  }

  test("unigramCounts are additive across disjoint corpora and refresh " +
      "equals the union M-step bit-for-bit (8 random splits)") {
    for (seed <- 1 to 8) {
      val rnd = new Random(7000 + seed)
      val docs = randomCorpus(rnd) ++ randomCorpus(rnd)
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val cut = docs.length / 2
      val base = df.filter(col("doc_id") < cut)
      val delta = df.filter(col("doc_id") >= cut)
      val model = TextPipeline.unigramTrainModel(base, "text", 3, 6, 1)
      val ca = TextPipeline.unigramCounts(base, "text", model)
      val cb = TextPipeline.unigramCounts(delta, "text", model)
      val union = TextPipeline.unigramCounts(df, "text", model)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val merged = TextPipeline.unigramRefresh(ca, cb).collect()
        .map(r => r.getString(0) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      // additivity: cnt_base + cnt_delta == counts over the union corpus
      assert(merged.view.mapValues(_._3).toMap === union, s"seed $seed")
      merged.foreach { case (p, (a, b, c, _)) =>
        assert(a + b === c, s"seed $seed piece $p")
      }
      // refreshed scores == the trainer's own M-step over union counts
      val v = merged.size
      val t = union.values.sum
      merged.foreach { case (p, (_, _, c, s)) =>
        assert(s === math.round(1e6 * math.log((c + 1.0) / (t + v).toDouble)),
          s"seed $seed piece $p")
      }
      // the refreshed MODEL serves: same geometry, scores from refresh
      val m2 = TextPipeline.unigramRefreshModel(ca, cb, model)
      assert(m2.maxPieceLen === model.maxPieceLen)
      assert(m2.scores === merged.view.mapValues(_._4).toMap)
    }
  }

  test("unigramCounts drops out-of-vocabulary pieces (closed-vocabulary " +
      "refresh) and zero-fills unseen ones") {
    val base = Seq((0L, "abab abab baba")).toDF("doc_id", "text")
    val delta = Seq((1L, "zzzz qq")).toDF("doc_id", "text") // z,q not in base
    val model = TextPipeline.unigramTrainModel(base, "text", 3, 4, 1)
    val cd = TextPipeline.unigramCounts(delta, "text", model).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cd.keySet === model.scores.keySet) // exactly the closed vocab
    assert(cd.values.forall(_ === 0L)) // nothing in-vocab occurred
  }

  test("unigramCountsFromSegments equals unigramCounts bit-for-bit — full " +
      "table, partial table (self-heal), and empty table (8 random corpora)") {
    import graft.functions.{TextFunctions => T}
    for (seed <- 1 to 8) {
      val rnd = new Random(9200 + seed)
      val docs = randomCorpus(rnd).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val model = TextPipeline.unigramTrainModel(docs, "text", 3, 6, 1)
      val direct = TextPipeline.unigramCounts(docs, "text", model)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val wordCounts = docs
        .select(explode(T.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("f"))
      val segs = TextPipeline.unigramSegments(
        wordCounts.select(col("w")), model)
      def via(table: org.apache.spark.sql.DataFrame) =
        TextPipeline.unigramCountsFromSegments(wordCounts, table, model)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(via(segs) === direct, s"seed $seed full table")
      // partial table: half the vocabulary missing -> coalesce self-heal
      assert(via(segs.filter(xxhash64(col("w")) % 2 === 0)) === direct,
        s"seed $seed partial table")
      // empty table: pure inline DP
      assert(via(segs.filter(lit(false))) === direct, s"seed $seed empty")
    }
  }
}

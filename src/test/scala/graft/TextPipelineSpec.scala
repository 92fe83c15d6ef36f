package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}
import graft.operators.TextPipeline

class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces emails, phones and IPs with placeholders") {
    val out = Seq("mail me at john.doe+x@corp.example.org or 555-123-4567, server 192.168.0.1 ok")
      .toDF("text").select(T.redactPii(col("text"))).head().getString(0)
    assert(out === "mail me at <EMAIL> or <PHONE>, server <IP> ok")
    // non-PII text untouched
    val clean = Seq("just words 12 and 3.14 here").toDF("text")
      .select(T.redactPii(col("text"))).head().getString(0)
    assert(clean === "just words 12 and 3.14 here")
  }

  test("pmiCollocations: an always-together pair outranks frequent independent tokens") {
    // "san francisco" always co-occurs (8x); "the" is everywhere but its
    // bigrams pair with many different neighbors -> low PMI
    val docs = (1L to 8L).map(i =>
      (i, s"the city of san francisco is the place number$i in the list")).toDF("doc_id", "text")
    val top = TextPipeline.pmiCollocations(docs, "text", minCount = 5, k = 8)
      .collect()
    val pairs = top.map(r => (r.getString(0), r.getString(1)))
    val pmiByPair = top.map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("pmi_micro")).toMap
    // every exclusive pair (cxy = cx = cy = 8) shares the maximal PMI;
    // ties break lexicographically on (w1, w2)
    val maxPmi = pmiByPair.values.max
    assert(pmiByPair(("san", "francisco")) === maxPmi,
      s"exclusive pair should carry max PMI, got ${pairs.toSeq}")
    assert(pairs.head === (("city", "of")), "lexicographic tie-break among equal-PMI pairs")
    // counts are exact: 8 docs x 1 occurrence
    assert(top.find(r => r.getString(0) == "san").get.getAs[Long]("cxy") === 8L)
    // any "the"-led bigram that survives minCount scores below the exclusive pair
    pmiByPair.collect { case ((w1, _), p) if w1 == "the" =>
      assert(p < pmiByPair(("san", "francisco"))) }
    // deterministic under repartitioning
    val again = TextPipeline.pmiCollocations(docs.repartition(5), "text", minCount = 5, k = 8)
    assert(again.collect().map(r => (r.getString(0), r.getString(1))).toSeq === pairs.toSeq)
  }

  test("bpeTrain matches an in-memory reference BPE, including greedy merge overlap") {
    val corpus = Seq(
      "low low low low low",
      "lower lower newest newest",
      "newest newest newest newest widest widest",
      "widest newest lower low",
      "aaaa aaaa baaaab") // odd runs exercise left-to-right non-overlap
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // reference: textbook BPE over the (word -> freq) table with greedy
    // left-to-right merge application and lexicographic tie-break
    def refBpe(words: Map[String, Long], n: Int): Seq[(Long, String, String, Long)] = {
      var syms: Map[Vector[String], Long] =
        words.map { case (w, f) => w.map(_.toString).toVector -> f }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
      var r = 1
      while (r <= n) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((s, f) <- syms; i <- 0 until s.length - 1)
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
        if (counts.isEmpty) r = n + 1
        else {
          val ((l, rr), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
          out += ((r.toLong, l, rr, cnt))
          syms = syms.toSeq.map { case (s, f) =>
            val b = Vector.newBuilder[String]; var i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == l && s(i + 1) == rr) { b += (l + rr); i += 2 }
              else { b += s(i); i += 1 }
            }
            (b.result(), f)
          }.groupMapReduce(_._1)(_._2)(_ + _)
          r += 1
        }
      }
      out.toSeq
    }
    val wordFreq = corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = refBpe(wordFreq, 8)
    val got = TextPipeline.bpeTrain(docs, "text", 8)
      .orderBy(col("merge_rank")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("bpeTrain stops early when no pairs remain") {
    val docs = Seq((1L, "ab ab a b")).toDF("doc_id", "text")
    val got = TextPipeline.bpeTrain(docs, "text", 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // one merge (a,b) with count 2 from the two "ab" occurrences; the
    // single-symbol words a/b/ab-merged leave nothing else to merge
    assert(got.toSeq === Seq((1L, "a", "b", 2L)))
  }

  test("repetitionScores: repeated-token doc scores high, diverse doc low") {
    val docs = Seq(
      (1L, "spam spam spam spam spam ham"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val scores = TextPipeline.repetitionScores(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(1L) === 1000000L * 5 / 6) // exact integer ppm
    assert(scores(2L) === 1000000L / 6)
  }

  test("contaminated finds exactly the docs sharing shingles with probes") {
    val probes = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "prefix words then the quick brown fox jumps over everything"), // shares 5-grams
      (2L, "completely different content with no overlap at all whatsoever"),
      (3L, "the quick brown fox jumps over the lazy dog verbatim copy")
    ).toDF("doc_id", "text")
    val hits = TextPipeline.contaminated(docs, probes, "text", "doc_id",
        shingleK = 5, minShared = 1)
      .collect().map(_.getLong(0)).toSet
    assert(hits === Set(1L, 3L))
  }

  test("bloomContaminated: superset of the exact semi-join, exact at generous width") {
    val docs = Tables.table(spark, sfDir, "documents")
    val probes = docs.filter(col("doc_id") < 10)
    val rest = docs.filter(col("doc_id") >= 10)
    val exact = TextPipeline.contaminated(rest, probes, "text", "doc_id", 5, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = TextPipeline.bloomContaminated(rest, probes, "text", "doc_id", 5, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one-sided error: every exact hit bloom-hits with at least as many shingles
    exact.foreach { case (doc, n) =>
      assert(bloom.contains(doc) && bloom(doc) >= n,
        s"doc $doc: exact n_shared=$n but bloom says ${bloom.get(doc)}")
    }
    // at 2^20 bits for a tiny probe set, FP probability ~ 0 -> exact equality
    val wide = TextPipeline.bloomContaminated(rest, probes, "text", "doc_id", 5, 1,
        mBits = 1 << 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wide === exact, "generous-width bloom must equal the exact semi-join")
  }

  test("bloomContaminated decisions are deterministic across partitioning") {
    val docs = Tables.table(spark, sfDir, "documents")
    val probes = docs.filter(col("doc_id") < 10)
    val rest = docs.filter(col("doc_id") >= 10)
    val a = TextPipeline.bloomContaminated(rest, probes, "text", "doc_id")
    val b = TextPipeline.bloomContaminated(rest.repartition(9), probes, "text", "doc_id")
    assert(a.except(b).count() === 0L && b.except(a).count() === 0L)
  }

  test("bloomContaminatedFast: superset of the exact semi-join (xxhash64 production path)") {
    val docs = Tables.table(spark, sfDir, "documents")
    val probes = docs.filter(col("doc_id") < 10)
    val rest = docs.filter(col("doc_id") >= 10)
    val exact = TextPipeline.contaminated(rest, probes, "text", "doc_id", 5, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = TextPipeline.bloomContaminatedFast(rest, probes, "text", "doc_id", 5, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no false negatives: every truly-contaminated doc hits with at least
    // as many shingles (bloom can only ADD false-positive hits)
    exact.foreach { case (doc, n) =>
      assert(fast.contains(doc) && fast(doc) >= n,
        s"doc $doc: exact n_shared=$n but fast bloom says ${fast.get(doc)}")
    }
    // at 2^19 bits for a tiny probe set the FP rate is ~0: both bloom
    // variants should agree with the exact doc set at this scale
    assert(fast.keySet === exact.keySet,
      "generous-width xxhash bloom should equal the exact semi-join doc set here")
  }

  test("bloomWords/bloomProbe split equals the composed bloomContaminated") {
    val docs = Tables.table(spark, sfDir, "documents")
    val probes = docs.filter(col("doc_id") < 10)
    val rest = docs.filter(col("doc_id") >= 10)
    val words = TextPipeline.bloomWords(probes, "text", "doc_id")
    assert(words.length === (1 << 16) / 32)
    val split = TextPipeline.bloomProbe(rest, words, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val composed = TextPipeline.bloomContaminated(rest, probes, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(split === composed)
  }

  test("bloomMerge of split probe filters is bit-identical to the " +
      "union-built filter, and probes agree; geometry mismatch rejected") {
    val docs = Tables.table(spark, sfDir, "documents")
    val a = TextPipeline.bloomWords(
      docs.filter(col("doc_id") < 5), "text", "doc_id")
    val b = TextPipeline.bloomWords(
      docs.filter(col("doc_id") >= 5 && col("doc_id") < 10), "text", "doc_id")
    val union = TextPipeline.bloomWords(
      docs.filter(col("doc_id") < 10), "text", "doc_id")
    val merged = TextPipeline.bloomMerge(a, b)
    assert(merged.toSeq === union.toSeq) // bit-for-bit, word by word
    // merge order cannot matter
    assert(TextPipeline.bloomMerge(b, a).toSeq === merged.toSeq)
    val rest = docs.filter(col("doc_id") >= 10)
    val viaMerge = TextPipeline.bloomProbe(rest, merged, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val viaUnion = TextPipeline.bloomProbe(rest, union, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(viaMerge === viaUnion)
    intercept[IllegalArgumentException] {
      TextPipeline.bloomMerge(a, TextPipeline.bloomWords(
        docs.filter(col("doc_id") < 5), "text", "doc_id", mBits = 1 << 10))
    }
    // the typed model catches the geometry the raw arrays CANNOT:
    // same mBits but different kHashes/shingleK must refuse to merge
    val ma = TextPipeline.bloomModel(
      docs.filter(col("doc_id") < 5), "text", "doc_id")
    val mKh = TextPipeline.bloomModel(
      docs.filter(col("doc_id") >= 5 && col("doc_id") < 10), "text",
      "doc_id", kHashes = 2)
    intercept[IllegalArgumentException] { TextPipeline.bloomMerge(ma, mKh) }
    val mSh = TextPipeline.bloomModel(
      docs.filter(col("doc_id") >= 5 && col("doc_id") < 10), "text",
      "doc_id", shingleK = 3)
    intercept[IllegalArgumentException] { TextPipeline.bloomMerge(ma, mSh) }
    // and the typed path equals the raw path when geometry agrees
    val mb = TextPipeline.bloomModel(
      docs.filter(col("doc_id") >= 5 && col("doc_id") < 10), "text", "doc_id")
    assert(TextPipeline.bloomMerge(ma, mb).words.toSeq === merged.toSeq)
    val viaModel = TextPipeline.bloomProbe(rest,
        TextPipeline.bloomMerge(ma, mb), "text", "doc_id", minShared = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(viaModel === viaUnion)
  }

  test("charEntropy: constant string scores 0, uniform pair scores 2x round(ln2/2 micro)") {
    import spark.implicits._
    val d = Seq((1L, "aaaa"), (2L, "ab"), (3L, "")).toDF("doc_id", "text")
    val got = TextPipeline.charEntropy(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((4L, 1L, 0L)), "single-char text has zero entropy")
    // per-char term: round(-ln(0.5) * 0.5 * 1e6) = round(346573.59) = 346574
    assert(got(2L) === ((2L, 2L, 693148L)))
    assert(!got.contains(3L), "empty doc emits no row (0/0 undefined)")
  }

  test("charEntropy is exact under repartitioning") {
    val docs = Tables.table(spark, sfDir, "documents")
    val a = TextPipeline.charEntropy(docs, "text", "doc_id")
    val b = TextPipeline.charEntropy(docs.repartition(9), "text", "doc_id")
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("bpeEncode: hand case, merge order matters, empty merges = char count") {
    import spark.implicits._
    val d = Seq((1L, "the the cat")).toDF("doc_id", "text")
    val got = TextPipeline.bpeEncode(d, "text", "doc_id",
      Seq("t" -> "h", "th" -> "e")).collect().head
    // "the" -> [th, e] -> [the] = 1 unit (x2), "cat" stays 3 units
    assert((got.getLong(1), got.getLong(2)) === ((3L, 5L)))
    val none = TextPipeline.bpeEncode(d, "text", "doc_id", Seq.empty).collect().head
    assert(none.getLong(2) === 9L, "no merges: unit count = character count")
    // ("th","e") before ("t","h") can never fire: [t,h,e] has no 'th' symbol yet
    val wrong = TextPipeline.bpeEncode(d, "text", "doc_id",
      Seq("th" -> "e", "t" -> "h")).collect().head
    assert(wrong.getLong(2) === 7L, "reversed rank order merges only t+h")
  }

  test("bpeEncode replays bpeTrain's merges: greedy overlap rule shared") {
    import spark.implicits._
    val d = Seq((1L, "aa aa aa a"), (2L, "aa aa")).toDF("doc_id", "text")
    val merges = TextPipeline.bpeTrain(d, "text", nMerges = 1)
      .collect().map(r => r.getString(1) -> r.getString(2)).toSeq
    assert(merges === Seq("a" -> "a"))
    val enc = TextPipeline.bpeEncode(d, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // "aa" -> 1 unit, "a" -> 1 unit: doc1 = 3*1 + 1 = 4, doc2 = 2
    assert(enc === Map(1L -> 4L, 2L -> 2L))
  }

  test("q65 result is consistent with a driver-side exact shingle overlap") {
    val docs = Tables.table(spark, sfDir, "documents")
    val probes = docs.filter(col("doc_id") < 10)
    val rest = docs.filter(col("doc_id") >= 10)
    val got = TextPipeline.contaminated(rest, probes, "text", "doc_id", 5, 1)
      .collect().map(_.getLong(0)).toSet
    // exact recomputation with string shingles on the driver
    def shingles(text: String): Set[String] = {
      val w = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      (if (w.length <= 5) Seq(w.mkString(" "))
       else w.sliding(5).map(_.mkString(" ")).toSeq).toSet
    }
    val probeSh = probes.select("text").collect().flatMap(r => shingles(r.getString(0))).toSet
    val want = rest.select("doc_id", "text").collect()
      .filter(r => shingles(r.getString(1)).exists(probeSh.contains))
      .map(_.getLong(0)).toSet
    assert(got === want)
  }

  // ------------------------------------------------ ngramRepetitionScores

  test("ngramRepetitionScores: chorus repetition scores, short docs score 0") {
    import spark.implicits._
    // doc 1: "a b c a b c a b c" -> 7 3-grams, 3 distinct -> 4/7 repeats
    // doc 2: all-distinct 3-grams -> 0
    // doc 3: two tokens (<= n) -> single whole-text gram -> 0
    val d = Seq(
      (1L, "a b c a b c a b c"),
      (2L, "p q r s t"),
      (3L, "x y"))
      .toDF("doc_id", "text")
    val got = TextPipeline.ngramRepetitionScores(d, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((7L, 3L, 571428L))) // trunc(4e6/7)
    assert(got(2L) === ((3L, 3L, 0L)))
    assert(got(3L) === ((1L, 1L, 0L)))
  }

  // ----------------------------------------------- tokenDistributionDrift

  test("tokenDistributionDrift: identical distribution scores 0, disjoint " +
      "vocab scores the exact closed form") {
    import spark.implicits._
    // A and B have the same token distribution as each other (and thus as
    // the corpus) -> TV = 0 for both. C's vocabulary is disjoint:
    // TV_C = 1/2*(sum_{t in C}|p_C - p| + corpus mass C doesn't cover)
    val d = Seq(
      (1L, "x x y", "A"), (2L, "x x y", "B"))
      .toDF("doc_id", "text", "src")
    val same = TextPipeline.tokenDistributionDrift(d, "text", "src")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(same === Map("A" -> 0L, "B" -> 0L))
    // A: {x}, B: {y}: p_A(x)=1 vs p(x)=1/2 -> |1-1/2| + absent y: 1/2
    //   -> TV = 1/2*(1/2+1/2) = 1/2 exactly
    val dj = Seq((1L, "x", "A"), (2L, "y", "B")).toDF("doc_id", "text", "src")
    val got = TextPipeline.tokenDistributionDrift(dj, "text", "src")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map("A" -> 500000L, "B" -> 500000L))
  }

  test("tokenDistributionDrift matches a driver-side reference on sf docs") {
    val docs = Tables.table(spark, sfDir, "documents")
    val got = TextPipeline.tokenDistributionDrift(docs, "text", "lang")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // exact BigInt reference
    val toks = docs.select("lang", "text").collect().flatMap { r =>
      r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .map(t => (r.getString(0), t))
    }
    val n = BigInt(toks.length)
    val byGrp = toks.groupBy(_._1)
    val ft = toks.groupBy(_._2).view.mapValues(v => BigInt(v.length)).toMap
    val want = byGrp.map { case (g, rows) =>
      val ns = BigInt(rows.length)
      val fst = rows.groupBy(_._2).view.mapValues(v => BigInt(v.length)).toMap
      val present = fst.map { case (t, f) => (f * n - ft(t) * ns).abs }.sum
      // .toSeq first: keys is a Set, and mapping it to ft values would
      // collapse equal frequencies before the sum
      val covered = fst.keys.toSeq.map(ft).sum
      g -> ((BigInt(1000000) * (present + (n - covered) * ns)) / (2 * ns * n)).toLong
    }
    assert(got === want)
  }

  // ---------------------------------------------------------- tokenGini

  test("tokenGini: uniform frequencies score 0, skew is exact") {
    import spark.implicits._
    // A: three tokens once each -> G = 0. B: freqs {1, 3}: sorted x=(1,3),
    // num = 2*(1*1+2*3) - 3*4 = 2, den = 2*4 -> G = 1/4 exactly
    val d = Seq(
      (1L, "a b c", "A"),
      (2L, "z z z q", "B"))
      .toDF("doc_id", "text", "src")
    val got = TextPipeline.tokenGini(d, "text", "src")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === Set(("A", 3L, 3L, 0L), ("B", 2L, 4L, 250000L)))
  }

  test("tokenGini is invariant to the internal order of tied frequencies") {
    import spark.implicits._
    // all four tokens appear twice: every rank assignment over ties gives
    // the same sum, and uniform frequencies mean G = 0
    val d = Seq((1L, "p q r s s r q p", "A")).toDF("doc_id", "text", "src")
    val r1 = TextPipeline.tokenGini(d, "text", "src").collect().head
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) === ((4L, 8L, 0L)))
  }

  private def htMd5(s: String): String = {
    java.security.MessageDigest.getInstance("MD5")
      .digest(("ht:" + s).getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }
  private def htBucket(t: String, dim: Int): Long =
    java.lang.Long.parseLong(htMd5(t).substring(0, 8), 16) % dim
  private def htSign(t: String): Long =
    if ((Integer.parseInt(htMd5(t).substring(8, 9), 16) % 2) == 0) 1L else -1L

  test("hashedFeatures matches a MessageDigest replica and cancels collisions") {
    import spark.implicits._
    // find two tokens in the SAME bucket with OPPOSITE signs — their
    // co-occurrence must cancel to v=0 and the row must be ABSENT
    val cands = (0 until 500).map(i => s"tok$i")
    val (t1, t2) = (for {
      a <- cands; b <- cands if a < b
      if htBucket(a, 64) == htBucket(b, 64) && htSign(a) != htSign(b)
    } yield (a, b)).head
    val docs = Seq(
      (1L, s"$t1 $t2"),                    // cancels entirely
      (2L, s"$t1 $t1 $t2"),                // net one t1
      (3L, "alpha beta alpha")             // plain counts
    ).toDF("doc_id", "text")
    val got = TextPipeline.hashedFeatures(docs, "text", "doc_id", dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(!got.keySet.exists(_._1 == 1L), "cancelled bucket must be absent")
    assert(got((2L, htBucket(t1, 64))) === htSign(t1))
    // replica over doc 3
    val exp3 = Seq("alpha", "beta", "alpha")
      .groupBy(t => htBucket(t, 64))
      .map { case (b, ts) => b -> ts.map(htSign).sum }
      .filter(_._2 != 0L)
    assert(got.collect { case ((3L, b), v) => b -> v }.toMap === exp3)
  }

  test("hashedFeatures is repartition-deterministic and guards dim") {
    import spark.implicits._
    val docs = Tables.table(spark, sfDir, "documents").limit(50)
    val a = TextPipeline.hashedFeatures(docs, "text", "doc_id", dim = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = TextPipeline.hashedFeatures(docs.repartition(5), "text", "doc_id", dim = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b && a.nonEmpty)
    intercept[IllegalArgumentException] {
      TextPipeline.hashedFeatures(docs, "text", "doc_id", dim = 1)
    }
  }

  test("jsDivergencePairs: identical sources score exactly 0, disjoint " +
      "vocabularies score ln2 in nano-nats") {
    import spark.implicits._
    val d = Seq(
      ("a", "x y x y"), ("b", "x y x y"),   // identical distributions
      ("c", "zq zq zq zq")                  // disjoint from both
    ).toDF("src", "text")
    val got = TextPipeline.jsDivergencePairs(d, "text", "src")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // identical: every ratio is 1 -> ln 1 = 0 -> exactly 0
    assert(got(("a", "b")) === 0L)
    // disjoint: each side sums p·ln2 over its own support; with p = 1/2
    // per term, each term rounds from 0.5·ln2·1e9 = 346573590.28 ->
    // 346573590, two terms per side -> 693147180 on both sides
    assert(got(("a", "c")) === 693147180L)
    assert(got(("b", "c")) === 693147180L)
  }

  test("jsDivergencePairs matches a driver-side reference on sf documents") {
    val docs = Tables.table(spark, sfDir, "documents")
    val ref = {
      val rows = docs.select("source", "text").collect()
        .map(r => (r.getString(0), r.getString(1)))
      val cnt = rows.flatMap { case (g, t) =>
        t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).map(g -> _)
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val tot = cnt.groupBy(_._1._1).map { case (g, m) => g -> m.values.sum }
      val groups = tot.keys.toSeq.sorted
      def dirSum(ga: String, gb: String): Long =
        cnt.collect { case ((g, t), c1) if g == ga =>
          val p = c1.toDouble / tot(ga)
          val q = cnt.getOrElse((gb, t), 0L).toDouble / tot(gb)
          math.round(1e9 * p * math.log((p + p) / (p + q)))
        }.sum
      (for {
        a <- groups; b <- groups if a < b
      } yield (a, b) -> Math.floorDiv(dirSum(a, b) + dirSum(b, a), 2L)).toMap
    }
    val got = TextPipeline.jsDivergencePairs(docs, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === ref)
  }

  test("unigramCrossEntropy: hand corpus matches the driver replica and " +
      "tokenless docs emit the sentinel") {
    // counts: a:3 b:1 c:1 -> N=5, V=3, N+V=8; s(t)=round(1e6 ln(8/(c+1)))
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "   "))
      .toDF("doc_id", "text")
    def s(c: Long): Long = math.round(1e6 * math.log(8.0 / (c + 1)))
    val expected = Map(
      1L -> (3L, (2 * s(3) + s(1)) / 3),
      2L -> (2L, (s(3) + s(1)) / 2),
      3L -> (0L, -1L))
    val got = TextPipeline.unigramCrossEntropy(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    graft.operators.Dedup.releaseCaches()
    // repartition determinism
    val again = TextPipeline.unigramCrossEntropy(
        docs.repartition(5), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again === expected)
    graft.operators.Dedup.releaseCaches()
  }

  test("tokenCoverageAtK: exact curve, k beyond vocab reads full coverage, " +
      "empty corpus reads the sentinel, guards fire") {
    // a:5 b:3 c:2 d:1 e:1 -> N=12, V=5
    val docs = Seq((1L, "a a a b b c"), (2L, "a a b c d e")).toDF("doc_id", "text")
    val got = TextPipeline.tokenCoverageAtK(docs, "text", ks = Seq(1L, 3L, 10L))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      1L -> (5L, 5L, 12L, 1000000L * 5 / 12),
      3L -> (5L, 10L, 12L, 1000000L * 10 / 12),
      10L -> (5L, 12L, 12L, 1000000L)))
    graft.operators.Dedup.releaseCaches()
    val empty = TextPipeline.tokenCoverageAtK(
        Seq((1L, "  ")).toDF("doc_id", "text"), "text", ks = Seq(2L))
      .collect().head
    assert(empty.getLong(1) === 0L && empty.getLong(4) === -1L)
    graft.operators.Dedup.releaseCaches()
    intercept[IllegalArgumentException] {
      TextPipeline.tokenCoverageAtK(docs, "text", ks = Seq(3L, 3L))
    }
    intercept[IllegalArgumentException] {
      TextPipeline.tokenCoverageAtK(docs, "text", ks = Seq(0L))
    }
  }

  test("bm25TopK: hand corpus matches the BigInt replica, OOV terms vote " +
      "nothing, guards fire") {
    // corpus: doc1 {a:2 b:1} dl=3, doc2 {a:1 c:1} dl=2, doc3 {b:3 c:1} dl=4,
    // doc4 tokenless -> N=4 docs, L=9 occurrences, df(a)=df(b)=df(c)=2
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "b b b c"), (4L, "   "))
      .toDF("doc_id", "text")
    val qs = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "zzz"))
      .toDF("query_id", "term")
    val idf = math.round(1e6 * math.log(5.0 / 2.5)) // 693147 for every term
    def s(tf: Long, dl: Long): Long =
      ((BigInt(idf) * 2200000 * tf * 9) /
        (BigInt(1000000) * tf * 9 + BigInt(300000) * 9 +
          BigInt(900000) * dl * 4)).toLong
    val expected = Map( // (query, doc) -> (rank, n_terms, score)
      (1L, 1L) -> ((1, 2L, s(2, 3) + s(1, 3))),
      (1L, 3L) -> ((2, 1L, s(3, 4))),
      (1L, 2L) -> ((3, 1L, s(1, 2))),
      // equal tf, equal idf: the SHORTER doc wins — BM25's length prior
      (2L, 2L) -> ((1, 1L, s(1, 2))),
      (2L, 3L) -> ((2, 1L, s(1, 4))))
    assert(expected((2L, 2L))._3 > expected((2L, 3L))._3)
    // doc1's two-term match must outrank both single-term docs
    assert(expected((1L, 1L))._3 > expected((1L, 3L))._3)
    val got = TextPipeline.bm25TopK(docs, "text", "doc_id", qs, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getInt(1), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expected) // query 3 (OOV only) emits no rows
    graft.operators.Dedup.releaseCaches()
    val again = TextPipeline.bm25TopK(
        docs.repartition(5), "text", "doc_id", qs, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getInt(1), r.getLong(3), r.getLong(4)))).toMap
    assert(again === expected)
    graft.operators.Dedup.releaseCaches()
    intercept[IllegalArgumentException] {
      TextPipeline.bm25TopK(docs, "text", "doc_id", qs, k = 0)
    }
    intercept[IllegalArgumentException] {
      TextPipeline.bm25TopK(docs, "text", "doc_id", qs, k = 1, bMilli = 1001)
    }
  }

  test("rrfFuse: votes add as exact integer divisions, missing items cast " +
      "no vote, topK truncates, guards fire") {
    val rankings = Seq(
      (1L, 10L, 1), (1L, 20L, 2),  // ranker A
      (1L, 20L, 1), (1L, 30L, 2))  // ranker B
      .toDF("query_id", "doc", "rank")
    val full = TextPipeline.rrfFuse(rankings, kRrf = 60, topK = 10)
      .collect()
      .map(r => r.getLong(2) -> ((r.getInt(1), r.getLong(3), r.getLong(4))))
      .toMap
    assert(full === Map(
      20L -> ((1, 2L, 1000000L / 62 + 1000000L / 61)),
      10L -> ((2, 1L, 1000000L / 61)),
      30L -> ((3, 1L, 1000000L / 62))))
    val top2 = TextPipeline.rrfFuse(rankings, kRrf = 60, topK = 2)
      .collect().map(_.getLong(2)).toSet
    assert(top2 === Set(20L, 10L))
    intercept[IllegalArgumentException] {
      TextPipeline.rrfFuse(rankings, kRrf = 0)
    }
    intercept[IllegalArgumentException] {
      TextPipeline.rrfFuse(rankings, topK = 0)
    }
  }

  test("goodTuring: hand histogram, unseen mass = N1/N, vanished N_{r+1} " +
      "reads r*=0, empty classes and empty corpus hit sentinels, " +
      "determinism, guards") {
    // tokens: a:3 b:2 c:2 d:1 -> N=8 V=4, cc = {1->1, 2->2, 3->1}
    val docs = Seq("a a a b b c", "c d").toDF("text")
    def read(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val got = read(TextPipeline.goodTuring(docs, "text", maxR = 4))
    assert(got === Map(
      0L -> ((0L, 8L, 4L, 125000L, -1L)),
      1L -> ((1L, 8L, 4L, 125000L, 4000000L)),
      2L -> ((2L, 8L, 4L, 500000L, 1500000L)),
      3L -> ((1L, 8L, 4L, 375000L, 0L)),       // raw-GT vanished N_4
      4L -> ((0L, 8L, 4L, 0L, -1L))))
    val again = read(
      TextPipeline.goodTuring(docs.repartition(5), "text", maxR = 4))
    assert(again === got)
    // empty corpus: every mass/adjusted count is a sentinel or zero
    val empty = read(TextPipeline.goodTuring(
      Seq("", "   ").toDF("text"), "text", maxR = 2))
    assert(empty === Map(
      0L -> ((0L, 0L, 0L, -1L, -1L)),
      1L -> ((0L, 0L, 0L, -1L, -1L)),
      2L -> ((0L, 0L, 0L, -1L, -1L))))
    intercept[IllegalArgumentException] {
      TextPipeline.goodTuring(docs, "text", maxR = 0)
    }
    graft.operators.Dedup.releaseCaches()
  }

  test("intraDocRepetition: looping text reads high, distinct text reads " +
      "0, short docs fold to one shingle, determinism") {
    import spark.implicits._
    val docs = Seq(
      // 10 tokens of pure loop: shingles all identical -> 6 total, 1
      // distinct -> rep = (1e6 * 5) DIV 6
      (1L, "a a a a a a a a a a"),
      // all-distinct tokens: every 5-shingle unique -> rep 0
      (2L, "t1 t2 t3 t4 t5 t6 t7 t8"),
      // short doc (< 5 tokens): ONE whole-text shingle -> rep 0
      (3L, "tiny doc")).toDF("doc_id", "text")
    def read(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val got = read(TextPipeline.intraDocRepetition(docs, "text", "doc_id"))
    assert(got(1L) === ((6L, 1L, 833333L)))
    assert(got(2L) === ((4L, 4L, 0L)))
    assert(got(3L) === ((1L, 1L, 0L)))
    assert(read(TextPipeline.intraDocRepetition(
      docs.repartition(3), "text", "doc_id")) === got)
  }

  test("bigramCondEntropy: deterministic text reads 0 conditional " +
      "entropy, a branching bigram reads exactly ln 2, driver replica, " +
      "determinism") {
    import spark.implicits._
    // s1: "a b a b a b" -> bigrams ab, ba, ab, ba, ab: every prefix
    // fully determines the next token -> H(w2|w1) = 0
    // s2: "x y x z" -> bigrams xy, yx, xz: prefix x branches 50/50
    //   H(bigram) = -2*(1/3 ln 1/3) - ... all three distinct: ln 3
    //   H(prefix): x: 2/3, y: 1/3 -> cond = H(bi) - H(pre)
    val docs = Seq(("s1", "a b a b a b"), ("s2", "x y x z"))
      .toDF("source", "text")
    val got = TextPipeline.bigramCondEntropy(docs, "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // driver replica with the exact per-term rounding
    def h(counts: Seq[Long]): Long = {
      val n = counts.sum.toDouble
      counts.map(c => math.round(-math.log(c / n) * (c / n) * 1e6)).sum
    }
    assert(got("s1") === ((5L, h(Seq(3L, 2L)), h(Seq(3L, 2L)), 0L)))
    val wantBi = h(Seq(1L, 1L, 1L))
    val wantPre = h(Seq(2L, 1L))
    assert(got("s2") === ((3L, wantBi, wantPre, wantBi - wantPre)))
    val again = TextPipeline.bigramCondEntropy(
        docs.repartition(3), "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(again === got)
    graft.operators.Dedup.releaseCaches()
  }

  test("chao1: hand histogram, bias-corrected F2=0 form, singleton-free " +
      "source reads exactly V, determinism") {
    import spark.implicits._
    // source s1: tokens a(1), b(1), c(2), d(3) -> V=4, F1=2, F2=1
    //   chao1 = 1e6*4 + (1e6*2*1) DIV (2*2) = 4_500_000
    // source s2: e(2), f(2) -> V=2, F1=0, F2=2 -> chao1 = 2e6 exactly
    // source s3: g(1), h(1), i(1) with F2=0 -> bias-corrected
    //   chao1 = 3e6 + (1e6*3*2) DIV 2 = 6_000_000
    val docs = Seq(
      ("s1", "a b c c"), ("s1", "d d d"),
      ("s2", "e e f f"),
      ("s3", "g h i")).toDF("source", "text")
    def read(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val got = read(TextPipeline.chao1(docs, "text", "source"))
    assert(got("s1") === ((4L, 2L, 1L, 4500000L)))
    assert(got("s2") === ((2L, 0L, 2L, 2000000L)))
    assert(got("s3") === ((3L, 3L, 0L, 6000000L)))
    assert(read(TextPipeline.chao1(docs.repartition(5), "text", "source"))
      === got)
  }
}

package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CurationFunnel, Dedup, TextPipeline}

/** Differential fuzz for the composed front door: a pure-Scala
  * first-principles replica of ALL FOUR stages — gopher rules, greedy
  * first-arrival exact-Jaccard dedup, md5 bloom membership, frozen-LM
  * Viterbi pricing — run against [[CurationFunnel.decide]] on random
  * dup-dense corpora (the UnigramTokenizerSpec replica discipline).
  * The engine's dedup stage is LSH-pruned/exact-verified; the replica
  * is fully exact, so agreement also re-pins the q32/q149 recall
  * contract on every fuzz corpus (dup pairs are crafted at J >= 0.857,
  * where the 16x4 banding's miss probability is ~1e-4 and the fixed
  * seeds make any run deterministic).
  */
class CurationFunnelReplicaSpec extends SparkSpec {
  import spark.implicits._

  private val Absent = -1000000000000L

  private def toks(text: String): Seq[String] =
    if (text == null) Seq.empty
    else text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  private def shingles(text: String, k: Int): Set[String] = {
    val w = toks(text)
    if (w.isEmpty) Set.empty
    else if (w.length <= k) Set(w.mkString(" "))
    else w.sliding(k).map(_.mkString(" ")).toSet
  }

  private def gopherPass(text: String, minWords: Int, maxWords: Int): Boolean = {
    val w = toks(text)
    if (w.isEmpty) false
    else {
      val meanCenti = w.map(_.length.toLong).sum * 100 / w.length
      val alphaBps =
        w.count(_.exists(c => c >= 'a' && c <= 'z')).toLong * 10000 / w.length
      w.length >= minWords && w.length <= maxWords &&
        meanCenti >= 300 && meanCenti <= 1000 &&
        alphaBps >= 8000
    }
  }

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0.0
    else (a & b).size.toDouble / (a | b).size

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString
  }

  /** The oracle/engine bloom position fold: first 4 8-hex-char windows
    * of md5(shingle), each folded base-16 -> % mBits. */
  private def bloomPositions(s: String, mBits: Int): Seq[Int] =
    (0 until 4).map { j =>
      md5Hex(s).slice(8 * j, 8 * j + 8)
        .foldLeft(0L)((a, c) => a * 16 + "0123456789abcdef".indexOf(c))
        .%(mBits).toInt
    }

  private def bloomBits(probeTexts: Seq[String], k: Int, mBits: Int): Set[Int] =
    probeTexts.flatMap(shingles(_, k)).distinct
      .flatMap(bloomPositions(_, mBits)).toSet

  private def contaminated(text: String, bits: Set[Int], k: Int,
      mBits: Int, minShared: Int): Boolean =
    shingles(text, k).count(s => bloomPositions(s, mBits).forall(bits)) >= minShared

  /** Pure-Scala serve-side Viterbi under a frozen score map: packed
    * tie-break (equal score -> LONGER last piece), absent floor, and the
    * (-logp) / n_pieces integer nll. */
  private def lmNll(text: String, scores: Map[String, Long], maxLen: Int): (Long, Long) = {
    var nPieces = 0L
    var logp = 0L
    toks(text).foreach { w =>
      val n = w.length
      val dp = Array.fill(n + 1)((0L, 0)) // (score, lastLen)
      for (i <- 1 to n) {
        var best = (Long.MinValue, 0)
        for (j <- 1 to math.min(maxLen, i)) {
          val s = dp(i - j)._1 + scores.getOrElse(w.substring(i - j, i), Absent)
          if (s > best._1 || (s == best._1 && j > best._2)) best = (s, j)
        }
        dp(i) = best
      }
      logp += dp(n)._1
      var i = n
      while (i > 0) { nPieces += 1; i -= dp(i)._2 }
    }
    (nPieces, logp)
  }

  /** Full-funnel replica: (doc -> verdict) under the decide() contract. */
  private def replicaVerdicts(
      baseTexts: Seq[(Long, String)], delta: Seq[(Long, String)],
      probeTexts: Seq[String], scores: Map[String, Long],
      maxLen: Int, maxNll: Long, minWords: Int, maxWords: Int,
      k: Int, threshold: Double, mBits: Int, minShared: Int)
      : Map[Long, String] = {
    val baseSets = baseTexts.map { case (_, t) => shingles(t, k) }
    val gated = delta.filter { case (_, t) => gopherPass(t, minWords, maxWords) }
    val gatedSets = gated.map { case (id, t) => (id, shingles(t, k)) }
    val bits = bloomBits(probeTexts, k, mBits)
    delta.map { case (id, t) =>
      id -> {
        if (!gopherPass(t, minWords, maxWords)) "gopher"
        else {
          val mySet = shingles(t, k)
          val dup = baseSets.exists(jaccard(mySet, _) >= threshold) ||
            gatedSets.exists { case (eid, es) =>
              eid < id && jaccard(mySet, es) >= threshold
            }
          if (dup) "near_dup"
          else if (contaminated(t, bits, k, mBits, minShared)) "contaminated"
          else {
            val (np, lp) = lmNll(t, scores, maxLen)
            if ((-lp) / np < maxNll) "kept" else "lm_gate"
          }
        }
      }
    }.toMap
  }

  private def word(rnd: Random, alpha: String): String = {
    val len = 3 + rnd.nextInt(6)
    (1 to len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
  }

  test("decide() matches the four-stage first-principles replica on 8 " +
      "random dup-dense corpora") {
    for (seed <- 1 to 8) {
      val rnd = new Random(5100 + seed)
      val alpha = "abcdef"
      def freshText(): String =
        (1 to (22 + rnd.nextInt(18))).map(_ => word(rnd, alpha)).mkString(" ")
      // a pool of base texts, some delta docs near-dup them (edge swaps
      // keep J >= 0.857 on 25+ word texts), some are junk (gopher), some
      // copy a probe (contamination), the rest are fresh
      val baseTexts = (0 until 4).map(i => (i.toLong, freshText()))
      val probeTexts = Seq(freshText(), freshText())
      def mutate(t: String): String = { // swap the last word: J = (n-5)/(n-3)
        val w = toks(t); (w.dropRight(1) :+ word(rnd, alpha)).mkString(" ")
      }
      val delta = (0 until 20).map { i =>
        val id = 100L + i
        rnd.nextInt(6) match {
          case 0 => (id, mutate(baseTexts(rnd.nextInt(baseTexts.size))._2))
          case 1 => (id, "tiny junk") // fails minWords
          case 2 => (id, probeTexts(rnd.nextInt(2))) // contaminated copy
          case 3 if i > 0 => (id, freshText()) // fresh
          case _ => (id, freshText())
        }
      }
      // a few intra-delta dups of EARLIER delta docs (first-arrival rule)
      val withIntra = delta ++ (0 until 3).map { j =>
        (200L + j, mutate(delta(rnd.nextInt(delta.size))._2))
      }
      val trainDocs = (baseTexts ++ probeTexts.zipWithIndex.map {
        case (t, i) => (900L + i, t)
      }).toDF("doc_id", "text")
      val model = CurationFunnel.FunnelModel(
        bloom = TextPipeline.bloomModel(
          probeTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
            .toDF("doc_id", "text"),
          "text", "doc_id", shingleK = 5, mBits = 1 << 16, kHashes = 4),
        lm = TextPipeline.unigramTrainModel(trainDocs, "text", 3, 8, 1),
        maxNllMicro = 3300000L)
      val (dec, _) = CurationFunnel.decide(
        withIntra.toDF("doc_id", "text"), "text", "doc_id",
        Dedup.buildShingleIndex(baseTexts.toDF("doc_id", "text"),
          "text", "doc_id", 5),
        model)
      val engine = dec.collect()
        .map(r => r.getLong(0) -> r.getString(r.fieldIndex("verdict"))).toMap
      Dedup.releaseCaches()
      val expect = replicaVerdicts(
        baseTexts, withIntra, probeTexts, model.lm.scores,
        model.lm.maxPieceLen, model.maxNllMicro,
        model.minWords, model.maxWords, model.shingleK, model.threshold,
        1 << 16, model.minShared)
      assert(engine === expect, s"seed $seed")
      // every verdict class should appear somewhere across the fuzz, and
      // this corpus must at least exercise kept + one drop class
      assert(engine.values.toSet.size >= 2, s"seed $seed degenerate corpus")
    }
  }
}

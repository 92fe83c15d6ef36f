package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

/** Repo-wide scale-plan invariant: NO registry query may carry an
  * unpartitioned Window node (a single-partition sort of its input — the
  * one plan shape that cannot scale past one executor) over an
  * unbounded frame. Every allowed occurrence is enumerated here WITH its
  * boundedness argument; a new query that introduces a global window
  * fails this spec until its author either reworks the plan (see
  * `Ranks.offsetRank` / `offsetCumSum` — the q203/q185/q206 fixes) or
  * consciously allowlists it with a reason.
  */
class PlanInvariantSpec extends SparkSpec {

  /** query -> why its unpartitioned window CANNOT grow with the corpus */
  private val boundedGlobalWindows: Map[String, String] = Map(
    "q137_neg_samples" -> "vocab rank; maxVocab require() guard bounds the frame",
    "q145_pr_curve" -> "score-bucket frame, <= nBuckets rows by construction",
    "q155_budget_allocation" -> "group-level aggregate frame (Hamilton seats)",
    "q157_stratified_sample" -> "group-level aggregate frame (allocation)",
    "q178_fairness" -> "per-group selection-rate frame (groups, not rows)",
    "q201_kaplan_meier" -> "distinct event-duration frame (time-resolution bounded)",
    "q202_log_rank" -> "distinct event-duration frame (time-resolution bounded)",
    "q256_nelson_aalen" -> ("distinct event-duration frame (time-resolution " +
      "bounded + the MaxDurationBuckets loud guard)"),
    "q267_rmst" -> ("the q201 KM event-duration frame plus one lead pass " +
      "(time-resolution bounded + the MaxDurationBuckets loud guard)"),
    "q274_km_greenwood" -> ("the q201 KM event-duration frame plus the " +
      "Greenwood cumulative term (time-resolution bounded + the " +
      "MaxDurationBuckets loud guard)"),
    "q275_competing_risks" -> ("the q201 KM event-duration frame with " +
      "per-outcome CIF cumsums (time-resolution bounded + the " +
      "MaxDurationBuckets loud guard)"),
    "q276_km_quantiles" -> ("the q201 KM event-duration frame reduced to " +
      "one quantile row (time-resolution bounded + the " +
      "MaxDurationBuckets loud guard)"),
    "q204_funnel_dropoff" -> "n_steps histogram, <= |funnel steps|+1 rows",
    "q85_token_budget" -> "score-bucket prefix frame (resolution bounded)",
    "q87_weighted_sample" -> "rank over the already-limited top-k frame",
    "q250_kruskal_wallis" -> ("class-pooled value HISTOGRAM frame (distinct " +
      "micro values, never rows — the q219 resolution bound)"),
    "q270_mood_median" -> ("pooled-median over the class-pooled value " +
      "HISTOGRAM frame (the q250 resolution bound)"))

  test("no registry query has an unpartitioned Window over an unbounded frame") {
    Tables.registerAll(spark, sfDir)
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val hits = df.queryExecution.optimizedPlan.collect {
            case w: LogicalWindow if w.partitionSpec.isEmpty => w
          }
          if (hits.nonEmpty && !boundedGlobalWindows.contains(name)) Seq(name)
          else Nil
        } finally graft.operators.Dedup.releaseCaches()
    }
    assert(offenders.isEmpty,
      s"unallowlisted global-sort Window in: ${offenders.mkString(", ")} — " +
        "rework with Ranks.offsetRank/offsetCumSum or allowlist with a " +
        "boundedness argument")
    // the allowlist must not go stale: every entry still has its window
    val stale = boundedGlobalWindows.keys.toSeq.sorted.filter { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val has = df.queryExecution.optimizedPlan.collect {
        case w: LogicalWindow if w.partitionSpec.isEmpty => w
      }.nonEmpty
      graft.operators.Dedup.releaseCaches()
      !has
    }
    assert(stale.isEmpty,
      s"allowlist entries with no global window anymore (remove them): " +
        stale.mkString(", "))
  }

  test("every crossJoin in main sources is broadcast-hinted (plan stability)") {
    // round-10 verdict: bounded-side crossJoins must carry the hint
    // rather than rely on AQE rescue. Source-level check so a new
    // unhinted cartesian cannot land silently.
    def scalaFiles(dir: java.io.File): Seq[java.io.File] =
      Option(dir.listFiles()).toSeq.flatten.flatMap { f =>
        if (f.isDirectory) scalaFiles(f)
        else if (f.getName.endsWith(".scala")) Seq(f) else Nil
      }
    val root = new java.io.File("src/main/scala")
    assert(root.isDirectory, s"expected to run from the repo root, cwd=${new java.io.File(".").getAbsolutePath}")
    val unhinted = scalaFiles(root).flatMap { f =>
      val src = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      "crossJoin\\(\\s*([a-zA-Z_]+)".r.findAllMatchIn(src)
        .filter(_.group(1) != "broadcast")
        .map(m => s"${f.getPath}: crossJoin(${m.group(1)}...)")
    }
    assert(unhinted.isEmpty,
      s"unhinted crossJoin call sites:\n${unhinted.mkString("\n")}")
  }
}

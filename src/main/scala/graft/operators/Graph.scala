package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms as join/aggregate rounds — the same
  * distributed shape as [[Dedup.connectedComponents]]'s star contraction:
  * each iteration is one equi-join plus one keyed aggregation, so a round
  * costs two shuffles regardless of graph size and no task ever holds
  * more than one node's incident edges.
  */
object Graph {

  /** Weighted PageRank in exact integer micro-units (total mass 10^6),
    * run for a FIXED number of iterations. Per iteration, node d's rank
    * becomes
    *
    *   pr'(d) = (10^6 - dampPpm) div n
    *          + (dampPpm * sum_{(s,d,w)} ((pr(s) * w) div outw(s))) div 10^6
    *
    * — every operation integer, every sum order-independent, so the
    * result is bit-identical at any parallelism and replayable in plain
    * SQL (the q97 oracle unrolls the loop). Floor divisions leak a few
    * micro-units of mass per round (standard for fixed-point PageRank);
    * ranks COMPARE correctly, they just sum to slightly under 10^6.
    * Dangling nodes (no out-edges) keep receiving the teleport base and
    * leak their damped mass, the usual simplification.
    *
    * Fixed iterations instead of convergence detection: PageRank's use in
    * corpus curation (domain authority as a quality prior) needs a
    * deterministic, budget-bounded plan; 3-10 rounds is the standard
    * operating range.
    *
    * Numeric window: pr <= 10^6, so each edge term needs w < 2^43 —
    * weights above ~8e12 (per edge!) must be pre-scaled by the caller;
    * Spark's ANSI overflow makes a breach a hard error, not a wrap.
    *
    * Plan: edges carry their source's out-weight (one join, computed
    * once); each round joins current ranks onto edges by source
    * (broadcast when the node table is small), aggregates inflow by
    * destination, and left-joins back onto the node set for the teleport
    * base. `localCheckpoint` every few rounds would bound lineage for
    * large iteration counts; at <= 10 rounds the plan stays compilable.
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String, weightCol: String,
      iterations: Int = 3, dampPpm: Long = 850000L): DataFrame = {
    require(iterations >= 1 && iterations <= 50, "iterations in [1, 50]")
    require(dampPpm >= 0 && dampPpm <= 1000000L, "dampPpm in [0, 1e6]")
    val e = edges.select(
      col(srcCol).cast("bigint").as("src"),
      col(dstCol).cast("bigint").as("dst"),
      col(weightCol).cast("bigint").as("w"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    // (src, dst, w, outw): the per-edge routing table, one corpus-sized
    // join, reused by every round
    val routed = e.join(outw, Seq("src"))
    val n = nodes.count()
    require(n > 0, "graph has no nodes")
    val base = (1000000L - dampPpm) / n
    var pr = nodes.select(col("node"), lit(1000000L / n).as("pr_micro"))
    for (_ <- 1 to iterations) {
      val inflow = routed
        .join(pr.select(col("node").as("src"), col("pr_micro")), Seq("src"))
        .select(col("dst"), expr("(pr_micro * w) DIV outw").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      pr = nodes
        .join(inflow.select(col("dst").as("node"), col("inflow")), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampPpm * coalesce(inflow, 0L)) DIV 1000000")).as("pr_micro"))
    }
    pr
  }
}

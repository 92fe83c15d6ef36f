package graft

import graft.queries.Registry

/** Pins for the rows-only (no-SQL-oracle) queries in the registry: the
  * properties the driver's row-count check can't see.
  */
class AdvancedSpec extends SparkSpec {

  private def run(name: String) = Registry.queries(name)(spark, sfDir)

  test("q51: HLL approx distinct within 5% of exact (rsd=0.02)") {
    // the bound is computed inside the query as `approx_ok` so the DuckDB
    // oracle can assert it; here we pin that it actually holds
    val rows = run("q51_approx_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("approx_ok")),
        s"${r.getString(0)}: exact=${r.getLong(r.fieldIndex("exact_parts"))}")
    }
  }

  test("q37: IVF ANN recall@10 >= 30% vs exact brute force (3 of 8 buckets probed)") {
    val exact = run("q35_sim_topk").select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = run("q37_sim_ivf_topk").select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall") // coarse quantizer: bounded, not exact
  }

  test("q42: language-ID is deterministic across runs") {
    val a = run("q42_text_langid").collect().map(_.toSeq).toSeq
    val b = run("q42_text_langid").collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("q44: fingerprints are stable and exact dups share them") {
    val fp = run("q44_text_fingerprint").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap // md5-chain hex + simhash long
    // doc pairs with identical text (from q30 groups with n_copies > 1)
    val groups = Tables.table(spark, sfDir, "documents")
      .groupBy("text").count().filter("count > 1").count()
    if (groups > 0) {
      val dupPairs = Tables.table(spark, sfDir, "documents")
        .select("doc_id", "text").collect()
        .groupBy(_.getString(1)).values.filter(_.length > 1)
      dupPairs.foreach { rows =>
        val fps = rows.map(r => fp(r.getLong(0))).distinct
        assert(fps.length === 1, "identical text must share fingerprint+simhash")
      }
    }
  }
}

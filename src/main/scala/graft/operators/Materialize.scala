package graft.operators

import org.apache.spark.sql.DataFrame

/** The ONE materialization primitive for iterative operators (PageRank /
  * connected components / k-core / HITS / label propagation / BPE rounds /
  * k-anonymity peeling / Lloyd trainers / split selection).
  *
  * Why a seam instead of calling `localCheckpoint` at ~20 sites:
  * `localCheckpoint(eager = true)` stores the cut blocks on EXECUTORS with
  * no lineage and no replication — the right call in `local[32]` (zero
  * disk round-trip, same JVM), but on a real cluster a single executor
  * loss mid-iteration makes every downstream stage unrecoverable (the
  * lineage was severed, the blocks are gone), killing a multi-hour 100 TB
  * job that a reliable checkpoint would have survived. So:
  *
  *   - `spark.sparkContext.setCheckpointDir(<hdfs/s3 path>)` set (the
  *     cluster deployment) → reliable `df.checkpoint(eager = true)`:
  *     blocks live in the fault-tolerant store, executor churn costs a
  *     re-read, not the job.
  *   - no checkpoint dir (local dev, tests, the bench) →
  *     `localCheckpoint(eager = true)` keeps the fast path.
  *
  * Both forms cut lineage at the same plan boundary and return the same
  * rows, so results are bit-identical either way (MaterializeSpec pins
  * PageRank/CC equality across the two modes). Eager in both modes: the
  * iterative callers rely on "materialize NOW" to stop per-round plan
  * growth and to pin loop-invariant frames before multi-consumer reads.
  */
object Materialize {
  /** Materialize `df` and cut its lineage: reliable when a checkpoint dir
    * is configured, executor-local otherwise (see class doc).
    */
  def checkpoint(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** Chainable form: `frame.transform(...).materialize`. */
  implicit final class MaterializeOps(private val df: DataFrame)
      extends AnyVal {
    def materialize: DataFrame = Materialize.checkpoint(df)
  }
}

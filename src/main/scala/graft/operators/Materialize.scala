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
  *
  * '''Reliable-mode disk hygiene (cluster deployments).''' Spark never
  * deletes reliable checkpoint files during an application unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` is set — and
  * the ContextCleaner reads that flag ONCE at SparkContext construction,
  * so it must be in the launch conf (`spark-submit --conf`), not set
  * after startup. The iterative callers here checkpoint per round
  * (PageRank every 10 rounds, CC/k-core/BPE/k-anonymity per round), so a
  * long 100 TB job WITHOUT the flag accumulates one superseded RDD
  * directory per round in the checkpoint dir until the application ends.
  * Set the flag in cluster deployments; `checkpoint` emits a one-time
  * stderr warning when it detects reliable mode without it. (Local mode
  * uses `localCheckpoint` — executor block-manager storage, cleaned by
  * normal block eviction — and is unaffected.)
  */
object Materialize {
  @volatile private var warnedCleanCheckpoints = false

  /** Materialize `df` and cut its lineage: reliable when a checkpoint dir
    * is configured, executor-local otherwise (see class doc).
    */
  def checkpoint(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      val sc = df.sparkSession.sparkContext
      if (!warnedCleanCheckpoints &&
          !sc.getConf.getBoolean(
            "spark.cleaner.referenceTracking.cleanCheckpoints",
            defaultValue = false)) {
        warnedCleanCheckpoints = true
        System.err.println(
          "[graft] Materialize.checkpoint: reliable checkpoint dir set " +
            "without spark.cleaner.referenceTracking.cleanCheckpoints=true " +
            "— superseded per-round checkpoint RDD dirs will accumulate " +
            "until the application exits. Set the flag in the LAUNCH conf " +
            "(ContextCleaner reads it once at SparkContext construction).")
      }
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)

  /** Chainable form: `frame.transform(...).materialize`. */
  implicit final class MaterializeOps(private val df: DataFrame)
      extends AnyVal {
    def materialize: DataFrame = Materialize.checkpoint(df)
  }
}

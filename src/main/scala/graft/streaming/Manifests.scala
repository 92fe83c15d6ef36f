package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** ATOMIC MANIFEST-POINTER COMMIT for stored partition stores — the one
  * mechanism that closes every "non-transactional swap" window in the
  * streaming state dirs (the fingerprint index's compaction here; the
  * counts partitions and the ANN model/coded epochs retire through the
  * same pointer discipline):
  *
  *  - a compaction writes its consolidated segment to a FRESH
  *    dot-prefixed directory (invisible to Spark's partition discovery
  *    and never a live target), then
  *  - commits by staging a dot-prefixed properties file and renaming it
  *    to a FRESH generation-versioned pointer name
  *    (`_graft_manifest.g<N>` — never renamed OVER: readers resolve the
  *    HIGHEST generation, so the commit point is the one rename that
  *    makes the new name visible), then
  *  - garbage-collects superseded pointer files and the superseded
  *    segment + folded partitions — everything GC touches is already
  *    INVISIBLE from the commit on, so a crash anywhere in cleanup
  *    leaves garbage, never duplicates.
  *
  * Readers resolve the pointer first: rows at or below the manifest's
  * horizon come from its segment; later partitions keep the plain
  * `batch_id=N` directory convention (appends never touch the manifest).
  * A store with no manifest reads exactly as before — the mechanism is
  * strictly additive.
  *
  * STORAGE ADDRESSING: every operation routes through Hadoop's
  * [[org.apache.hadoop.fs.FileSystem]] resolved from the store path's
  * scheme (the active Spark session's Hadoop conf when one exists), so
  * the same store works on `file:`, HDFS, and the cloud connectors —
  * the round-17 `java.io.File` version could address only local disk.
  * Per-scheme commit atomicity (the versioned-log design is exactly
  * what makes this portable — it never needs rename-with-overwrite,
  * whose non-HDFS emulation is delete-then-rename and NOT atomic):
  *  - HDFS / local POSIX: rename of the staged file to the fresh
  *    pointer name is one atomic metadata op; readers see the old max
  *    generation or the new one, never a half-state.
  *  - S3A: rename is a server-side copy that materializes the fresh
  *    key with ONE atomic object PUT (and S3 listing has been strongly
  *    consistent since 2020), so single-writer commits are still
  *    all-or-nothing. What S3 does NOT give through this API is a
  *    conditional put — two CONCURRENT committers could both "win" a
  *    generation. The compaction contract is single-writer (an offline
  *    maintenance job, like the funnel's compactIndex) — documented,
  *    not faked.
  */
object Manifests {

  /** The pointer: `dir` (relative, dot-prefixed) holds every row with
    * `batch_id <= upTo`; `generation` makes retried compactions write
    * fresh segment dirs instead of overwriting a live one, and orders
    * the versioned pointer files (readers take the max). */
  final case class Manifest(generation: Long, dir: String, upTo: Long)

  private val Prefix = "_graft_manifest"

  /** The Hadoop conf in force: the active session's (fs.* settings,
    * credentials, scheme registrations) when a session exists — tools
    * and specs without one fall back to vanilla defaults (local scheme). */
  private[streaming] def hadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** The FileSystem owning `p` under [[hadoopConf]] — the single
    * resolution point every streaming store-state walker shares. */
  private[streaming] def fsFor(p: Path): FileSystem =
    p.getFileSystem(hadoopConf())

  private def parse(fs: FileSystem, p: Path): Option[Manifest] =
    try {
      val props = new java.util.Properties()
      val in = fs.open(p)
      try props.load(in) finally in.close()
      Some(Manifest(props.getProperty("generation").toLong,
        props.getProperty("dir"), props.getProperty("upTo").toLong))
    } catch {
      // a pointer GC'd between our listing and open (post-commit cleanup
      // by a committer) — skip it; the surviving max generation wins
      case _: java.io.FileNotFoundException => None
    }

  /** Resolve the committed pointer: the highest-generation manifest
    * file under `root` (the legacy unversioned `_graft_manifest` name
    * from pre-versioned stores parses the same — its generation is in
    * the file body). */
  def read(root: String): Option[Manifest] = {
    val rootP = new Path(root)
    val fs = fsFor(rootP)
    if (!fs.exists(rootP)) return None
    val candidates = fs.listStatus(rootP).filter { st =>
      val n = st.getPath.getName
      st.isFile && n.startsWith(Prefix) && !n.endsWith(".tmp")
    }
    val parsed = candidates.flatMap(st => parse(fs, st.getPath))
    if (parsed.isEmpty) None else Some(parsed.maxBy(_.generation))
  }

  /** The atomic commit: stage the properties file under a dot-prefixed
    * name (invisible to [[read]]), rename it to the FRESH
    * generation-versioned pointer (the commit point — see the object
    * doc for per-scheme atomicity), then GC superseded pointer files
    * (already invisible: readers take the max generation). */
  def commit(root: String, m: Manifest): Unit = {
    val rootP = new Path(root)
    val fs = fsFor(rootP)
    val fin = new Path(rootP, s"$Prefix.g${m.generation}")
    val tmp = new Path(rootP, s".$Prefix.g${m.generation}.tmp")
    val out = fs.create(tmp, true)
    try {
      val props = new java.util.Properties()
      props.setProperty("generation", m.generation.toString)
      props.setProperty("dir", m.dir)
      props.setProperty("upTo", m.upTo.toString)
      props.store(out, "graft store manifest")
    } finally out.close()
    // a pre-existing fin can only be THIS commit retried after its own
    // rename already succeeded (generations are single-writer-monotonic:
    // nextSegment hands out prev.generation + 1) — same content, safe to
    // replace; readers fall back to the previous generation for the gap
    if (fs.exists(fin)) fs.delete(fin, false)
    require(fs.rename(tmp, fin), s"manifest commit rename failed: $tmp -> $fin")
    // GC superseded pointers — invisible from the commit on; a crash
    // here leaves extra files, never a wrong read
    fs.listStatus(rootP).foreach { st =>
      val n = st.getPath.getName
      if (st.isFile && n.startsWith(Prefix) && !n.endsWith(".tmp") &&
        n != fin.getName) {
        fs.delete(st.getPath, false); ()
      }
    }
    ()
  }

  /** The next compaction's segment path (relative to the root) — fresh
    * per generation, so a retry of a CRASHED (uncommitted) compaction
    * overwrites only its own staging, never a live segment. */
  def nextSegment(prev: Option[Manifest]): (Long, String) = {
    val gen = prev.map(_.generation + 1).getOrElse(0L)
    (gen, s".segments/compact-g$gen")
  }
}

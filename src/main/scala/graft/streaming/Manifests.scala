package graft.streaming

/** ATOMIC MANIFEST-POINTER COMMIT for stored partition stores — the one
  * mechanism that closes every "non-transactional swap" window in the
  * streaming state dirs (the fingerprint index's compaction here; the
  * counts partitions and the ANN model/coded epochs compact through the
  * same pointer discipline):
  *
  *  - a compaction writes its consolidated segment to a FRESH
  *    dot-prefixed directory (invisible to Spark's partition discovery
  *    and never a live target), then
  *  - commits by writing `_graft_manifest.tmp` and ATOMICALLY renaming
  *    it over `_graft_manifest` (one POSIX rename — readers see either
  *    the old pointer or the new one, never a half-state), then
  *  - garbage-collects the superseded segment + folded partitions —
  *    everything GC touches is already INVISIBLE from the commit on, so
  *    a crash anywhere in cleanup leaves garbage, never duplicates.
  *
  * Readers resolve the pointer first: rows at or below the manifest's
  * horizon come from its segment; later partitions keep the plain
  * `batch_id=N` directory convention (appends never touch the manifest).
  * A store with no manifest reads exactly as before — the mechanism is
  * strictly additive.
  */
object Manifests {

  /** The pointer: `dir` (relative, dot-prefixed) holds every row with
    * `batch_id <= upTo`; `generation` makes retried compactions write
    * fresh segment dirs instead of overwriting a live one. */
  final case class Manifest(generation: Long, dir: String, upTo: Long)

  private def manifestFile(root: String) =
    new java.io.File(root, "_graft_manifest")

  def read(root: String): Option[Manifest] = {
    val f = manifestFile(root)
    if (!f.exists()) None
    else {
      val p = new java.util.Properties()
      val in = new java.io.FileInputStream(f)
      try p.load(in) finally in.close()
      Some(Manifest(p.getProperty("generation").toLong,
        p.getProperty("dir"), p.getProperty("upTo").toLong))
    }
  }

  /** The atomic commit: stage the properties file, rename over the live
    * pointer (ATOMIC_MOVE — same directory, one rename syscall). */
  def commit(root: String, m: Manifest): Unit = {
    val tmp = new java.io.File(root, "_graft_manifest.tmp")
    val out = new java.io.FileOutputStream(tmp)
    try {
      val p = new java.util.Properties()
      p.setProperty("generation", m.generation.toString)
      p.setProperty("dir", m.dir)
      p.setProperty("upTo", m.upTo.toString)
      p.store(out, "graft store manifest")
    } finally out.close()
    java.nio.file.Files.move(tmp.toPath, manifestFile(root).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
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

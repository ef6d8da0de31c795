package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}

/** The storage primitives SnapshotTable's commit protocol stands on —
  * the typed seam between the protocol (staging, conflict checks,
  * CHECK constraints, sidecar manifests: pure computation, portable
  * anywhere) and the one thing each deployment target must provide:
  * atomic metadata operations. Porting the table off the local
  * filesystem means implementing THIS trait; no protocol code changes.
  *
  * Object-store mapping, per method (the documented cloud deployment —
  * no cloud SDK exists in this build, so the mapping lives here as the
  * implementation contract for that backend):
  *
  *  - `claim`: conditional PUT of `_log/N` with If-None-Match:* (S3
  *    2024+ conditional writes, GCS x-goog-if-generation-match: 0,
  *    Azure If-None-Match:*). The object body is the manifest content,
  *    so — like the hard link below — a visible marker is NEVER
  *    contentless. Exactly one writer's PUT succeeds; losers see 412.
  *  - `abortClaim`: DELETE of `_log/N` (idempotent).
  *  - `publish`: no-op. An object store has no rename; the staged
  *    objects are written DIRECTLY under `v=N/` after a successful
  *    claim instead (the claim, not the rename, is what makes `v=N`
  *    writer-exclusive; readers still can't see it until the pointer
  *    moves). The filesystem impl stages under `_staging/` and renames
  *    because a local directory write is not atomic against listers.
  *  - `advancePointer`: read `_VERSION` with its generation/ETag, and
  *    conditional-PUT the new value If-Match — retry on 412 re-reading
  *    the current value, keeping the monotonic guard. Equivalent to
  *    the file-lock + compare + atomic-replace below.
  *  - `currentVersion`: GET `_VERSION` (object stores are
  *    read-after-write consistent for single objects since 2020+).
  */
trait CommitBackend {

  /** Atomically claim version slot `next` by creating its commit
    * marker with the manifest's full content; false if the slot is
    * already taken (caller re-reads head and retries).
    */
  def claim(root: String, next: Int, manifest: Path): Boolean

  /** Roll back a claim whose publish failed (idempotent). */
  def abortClaim(root: String, next: Int): Unit

  /** Make the staged data visible under `v=next` atomically with
    * respect to readers.
    */
  def publish(root: String, staging: Path, next: Int): Unit

  /** Advance the reader pointer to `next` MONOTONICALLY: concurrent
    * out-of-claim-order publishes must never move it backward.
    */
  def advancePointer(root: String, next: Int): Unit

  /** Latest version visible to readers, 0 if none. */
  def currentVersion(root: String): Int
}

/** POSIX-filesystem backend: link(2) as the CAS, rename(2) as the
  * atomic publish, flock + compare + atomic replace as the pointer
  * CAS. This is the single-host / NFS-with-locks deployment; see the
  * trait doc for the object-store twin.
  */
object FilesystemCommitBackend extends CommitBackend {

  private def versionFile(root: String) = Paths.get(root, "_VERSION")

  override def claim(root: String, next: Int, manifest: Path): Boolean =
    try { Files.createLink(SnapshotTable.markerFile(root, next), manifest); true }
    catch { case _: FileAlreadyExistsException => false }

  override def abortClaim(root: String, next: Int): Unit = {
    Files.deleteIfExists(SnapshotTable.markerFile(root, next)); ()
  }

  override def publish(root: String, staging: Path, next: Int): Unit = {
    Files.move(staging, Paths.get(root, s"v=$next"),
      StandardCopyOption.ATOMIC_MOVE); ()
  }

  /** Per-root monitors serializing SAME-JVM pointer flips: JVM file
    * locks are held per (JVM, file) — a second thread's
    * `FileChannel.lock()` on the same file THROWS
    * OverlappingFileLockException instead of blocking (observed as a
    * rare racing-writers flake before this guard). The monitor
    * serializes threads; the file lock below still serializes
    * processes.
    */
  private val pointerMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  override def advancePointer(root: String, next: Int): Unit = {
    val monitor = pointerMonitors.computeIfAbsent(root, _ => new Object)
    monitor.synchronized {
      val lockPath = Paths.get(root, "_VERSION.lock")
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try {
          if (currentVersion(root) < next) {
            val tmp = Paths.get(root, s"_VERSION.tmp.$next")
            Files.writeString(tmp, next.toString)
            Files.move(tmp, versionFile(root), StandardCopyOption.ATOMIC_MOVE,
              StandardCopyOption.REPLACE_EXISTING)
          }
        } finally lock.release()
      } finally ch.close()
    }
  }

  override def currentVersion(root: String): Int = {
    val f = versionFile(root)
    if (Files.exists(f)) Files.readString(f).trim.toInt else 0
  }
}

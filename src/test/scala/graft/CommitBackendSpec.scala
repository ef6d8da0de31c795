package graft

import java.nio.file.{Files, Paths}

import graft.sources.{FilesystemCommitBackend => FB}
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the storage seam SnapshotTable's commit protocol stands on:
  * claim is an exclusive CAS born with full manifest content, abort is
  * idempotent, and the reader pointer only ever moves forward — under
  * thread races too (the protocol's correctness reduces to exactly
  * these properties; the 13 snapshot suites then exercise the protocol
  * end-to-end through the same backend).
  */
class CommitBackendSpec extends AnyFunSuite {

  private def freshRoot(tag: String): String = {
    val r = Files.createTempDirectory(s"graft-backend-$tag")
    Files.createDirectories(r.resolve("_log"))
    r.toString
  }

  private def manifest(root: String, body: String) = {
    val p = Paths.get(root, s"_staging-m-${java.util.UUID.randomUUID()}")
    Files.writeString(p, body)
    p
  }

  test("claim is exclusive per slot and the marker carries the manifest content") {
    val root = freshRoot("claim")
    val m1 = manifest(root, "p=1\np=2")
    val m2 = manifest(root, "p=3")
    assert(FB.claim(root, 1, m1))
    assert(!FB.claim(root, 1, m2), "second claim of the same slot must lose")
    assert(Files.readString(Paths.get(root, "_log", "1")) == "p=1\np=2")
    assert(FB.claim(root, 2, m2), "the next slot stays claimable")
  }

  test("racing threads: exactly one winner per slot") {
    val root = freshRoot("race")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 16).map { i =>
      val m = manifest(root, s"writer-$i")
      new Thread(() => if (FB.claim(root, 7, m)) { wins.incrementAndGet(); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() == 1)
  }

  test("abortClaim frees the slot and is idempotent") {
    val root = freshRoot("abort")
    assert(FB.claim(root, 1, manifest(root, "x")))
    FB.abortClaim(root, 1)
    FB.abortClaim(root, 1) // second abort: no-op, no throw
    assert(FB.claim(root, 1, manifest(root, "y")), "aborted slot is reclaimable")
  }

  test("advancePointer is monotonic: out-of-order publishes never move it back") {
    val root = freshRoot("ptr")
    assert(FB.currentVersion(root) == 0)
    FB.advancePointer(root, 3)
    assert(FB.currentVersion(root) == 3)
    FB.advancePointer(root, 2) // late out-of-claim-order publish
    assert(FB.currentVersion(root) == 3, "pointer moved backward")
    FB.advancePointer(root, 4)
    assert(FB.currentVersion(root) == 4)
  }

  test("publish renames staging to v=N atomically and exactly once") {
    val root = freshRoot("pub")
    val staging = Files.createDirectories(Paths.get(root, "_staging", "s1"))
    Files.writeString(staging.resolve("part-0.parquet"), "data")
    FB.publish(root, staging, 1)
    assert(Files.exists(Paths.get(root, "v=1", "part-0.parquet")))
    assert(!Files.exists(staging))
  }
}

package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshots over plain parquet — the time-travel half of
  * what a transactional table format adds on top of ParquetDml's
  * copy-on-write rewrites (the other half, concurrent writers, needs
  * a coordinating log and is out of scope offline — documented, not
  * faked).
  *
  * Layout: `root/v=N/` holds version N's parquet; `root/_VERSION` is
  * a one-line pointer to the latest committed N. Commit protocol:
  * write the new version directory COMPLETELY, then flip the pointer
  * via write-temp + atomic rename — a reader either sees the old
  * pointer (and the fully-written old directory) or the new one
  * (ditto); never a half-written table. Old versions are immutable
  * after commit, so `read(version = n)` is reproducible forever and
  * a long-running job that resolved its version keeps a consistent
  * view while later commits land.
  *
  * Single-writer contract: the rename makes the POINTER flip atomic,
  * but two concurrent writers could both build v=N+1 — last rename
  * wins, the loser's directory leaks. That coordination (optimistic
  * concurrency on the log) is precisely what Delta/Iceberg add.
  *
  * At 100 TB: a snapshot commit costs only the NEW data written
  * (unchanged partitions of a copy-on-write rewrite can be hard-linked
  * or referenced, as the real formats do via the manifest); `vacuum`
  * bounds storage by dropping versions older than a retention floor.
  */
object SnapshotTable {

  private def versionFile(root: String) = Paths.get(root, "_VERSION")

  /** Latest committed version, 0 if the table does not exist yet. */
  def currentVersion(root: String): Int = {
    val f = versionFile(root)
    if (Files.exists(f)) Files.readString(f).trim.toInt else 0
  }

  /** Commit `df` as the next version; returns the committed version. */
  def commit(spark: SparkSession, root: String, df: DataFrame): Int = {
    val next = currentVersion(root) + 1
    df.write.mode("overwrite").parquet(s"$root/v=$next")
    // pointer flip: temp file + ATOMIC_MOVE, never an in-place edit
    val tmp = Paths.get(root, s"_VERSION.tmp.$next")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, versionFile(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Read the latest snapshot (default) or time-travel to `version`. */
  def read(spark: SparkSession, root: String, version: Int = -1): DataFrame = {
    val cur = currentVersion(root)
    val v = if (version > 0) version else cur
    require(v > 0, s"no committed version at $root")
    // an orphan v=N directory from a crashed/losing writer can exist
    // ABOVE the pointer; reading it would surface uncommitted data
    require(v <= cur, s"version $v is not committed (latest is $cur)")
    require(Files.exists(Paths.get(root, s"v=$v")),
      s"version $v does not exist (vacuumed or never committed)")
    spark.read.parquet(s"$root/v=$v")
  }

  /** Drop versions older than `keepLast` (never the current one). */
  def vacuum(root: String, keepLast: Int = 2): Seq[Int] = {
    require(keepLast >= 1, s"keepLast must be >= 1 (got $keepLast): " +
      "retaining zero versions would delete the live snapshot")
    val cur = currentVersion(root)
    val dropBelow = cur - keepLast + 1
    val dropped = (1 until dropBelow).filter { v =>
      Files.exists(Paths.get(root, s"v=$v"))
    }
    dropped.foreach { v =>
      val dir = Paths.get(root, s"v=$v")
      val walk = Files.walk(dir) // stream holds a directory fd — close it
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally walk.close()
    }
    dropped
  }
}

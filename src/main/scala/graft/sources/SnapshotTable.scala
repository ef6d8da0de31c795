package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Versioned snapshots over plain parquet — time travel plus
  * OPTIMISTIC-CONCURRENCY commits, the two things a transactional
  * table format adds on top of ParquetDml's copy-on-write rewrites.
  *
  * Layout: `root/v=N/` holds version N's parquet; `root/_log/N` is
  * version N's commit marker (its content records the partitions the
  * commit touched); `root/_VERSION` is a one-line READER pointer to
  * the latest fully-committed N.
  *
  * Commit protocol (the same shape Delta's `_delta_log/N.json` CAS
  * uses, expressed on a filesystem):
  *   1. stage: write the new version's parquet COMPLETELY into a
  *      writer-unique `_staging/<uuid>` directory — no shared name,
  *      so concurrent writers never collide here. The touched-
  *      partition manifest is also written to a writer-unique temp
  *      file FIRST, so the claim step below is atomic WITH content;
  *   2. CAS: `Files.createLink(_log/N, manifestTmp)` with N = head+1.
  *      link(2) fails with EEXIST atomically, so exactly one writer
  *      wins version N — and because the marker is a hard link to the
  *      fully-written manifest, a marker is NEVER observable in a
  *      contentless state (a concurrent conflict check always reads
  *      the complete partition list, not a torn write). Losers get
  *      FileAlreadyExistsException and RETRY against the new head
  *      (after conflict-checking the commits that landed in between);
  *   3. publish: atomically rename the staging dir to `v=N` (the name
  *      is unreachable by readers until the pointer moves), then
  *      advance `_VERSION` MONOTONICALLY under an OS file lock
  *      (FileChannel.lock on `_VERSION.lock`): concurrent publishes
  *      may finish out of claim order, and a plain last-write-wins
  *      flip could move the reader pointer BACKWARD past an
  *      already-published version. On an object store the same step
  *      is a conditional PUT.
  * Steps 2-3's atomic operations (CAS claim, publish rename, pointer
  * advance, pointer read) are behind the [[CommitBackend]] trait —
  * the filesystem implementation is the one wired in; the
  * object-store mapping (conditional PUTs) is documented there as the
  * implementation contract for a cloud deployment.
  *
  * A reader either sees the old pointer (and the immutable old
  * directory) or the new one — never a half-written table. A writer
  * that crashes between CAS and publish leaves a complete marker with
  * no data directory: readers never see that version (the pointer
  * only moves on publish), later writers build on top of it, `read`
  * of it fails loudly as "never committed", and read-modify-write
  * writers conflict against its DECLARED partitions only — a dead
  * overlapping claim blocks its own partitions (conservative: the
  * checker cannot distinguish in-flight from dead), but never
  * disjoint writers.
  *
  * Conflict rule: a read-modify-write commit declares the snapshot
  * version it READ and the partition values it WRITES. If any commit
  * that landed after its read version touched an overlapping
  * partition (or either side is a full-table write), the writer's
  * inputs are stale — retrying would silently drop the other commit's
  * effect — so the commit aborts with [[SnapshotConflict]] and the
  * caller re-derives from the new snapshot. Disjoint-partition
  * writers rebase and retry automatically AT THE METADATA LEVEL —
  * but because a version directory is a COMPLETE snapshot, a raw
  * [[commit]] that rebases re-publishes its stale bytes for every
  * partition it did not touch, reverting the concurrent commit's
  * rows. Partition-sliced read-modify-write must therefore go
  * through [[commitPartitions]], which recomposes content against
  * the new head on every rebase; with it the layer honors the
  * serializable-unless-disjoint contract of Delta/Iceberg OCC
  * (SnapshotRaceFuzzSpec proves it under randomized races).
  *
  * Old versions are immutable after commit, so `read(version = n)` is
  * reproducible forever and a long-running job that resolved its
  * version keeps a consistent view while later commits land.
  *
  * At 100 TB: a snapshot commit costs only the NEW data written
  * (unchanged partitions of a copy-on-write rewrite can be hard-linked
  * or referenced, as the real formats do via the manifest); `vacuum`
  * bounds storage by dropping versions older than a retention floor.
  * The CAS is one metadata operation per commit regardless of data
  * size — on object stores the same step is a conditional PUT.
  *
  * Full surface on top of the commit protocol (each with its spec):
  * time travel (`read(version)`), manifest min/max data skipping
  * (`statsCols` → `readPruned`), value-set point-lookup skipping
  * (`setCols` → `readPoint`), log compaction (`compactLog`), batch +
  * streaming CDC (`changes`/`changesByKey`/`streamChanges`),
  * deletion vectors (`deleteWhere` — merge-on-read deletes over
  * hard-linked files), OPTIMIZE file compaction (`compactFiles`),
  * commit-time CHECK constraints (`addConstraint`), cross-table
  * transactions (`commitAll`/`recover`), and a streaming upsert sink
  * (streaming.SnapshotSink).
  */
object SnapshotTable {

  /** A read-modify-write commit lost to an overlapping concurrent
    * commit; the caller must re-read the new snapshot and re-derive.
    */
  final class SnapshotConflict(msg: String) extends RuntimeException(msg)

  private def versionFile(root: String) = Paths.get(root, "_VERSION")
  private def logDir(root: String) = Paths.get(root, "_log")

  /** The DV machinery stamps `__file`/`__idx` helper columns and joins
    * against `__dv_file`/`__dv_idx`; a table whose OWN schema used one
    * of those names would be silently clobbered by withColumn and then
    * corrupted by the anti-join. Every commit entry point (commit,
    * commitPartitions) must reserve them at the gate.
    */
  private[sources] def requireNoReservedColumns(df: DataFrame): Unit = {
    val reserved = df.columns.toSet
      .intersect(Set("__file", "__idx", "__dv_file", "__dv_idx"))
    require(reserved.isEmpty,
      s"column name(s) ${reserved.mkString(", ")} are reserved for the " +
        "deletion-vector machinery; rename before committing")
  }

  /** Publish a claimed slot: the shared tail of every commit path. On
    * publish failure the claim is rolled back so the slot does not
    * poison future read-modify-write commits (another writer may have
    * taken next+1 meanwhile — markers need not stay contiguous,
    * headVersion is a max).
    */
  private def publishClaimed(root: String, staging: Path, manifestTmp: Path,
      next: Int, cleanup: () => Unit): Int =
    try {
      backend.publish(root, staging, next)
      backend.advancePointer(root, next)
      Files.deleteIfExists(manifestTmp)
      next
    } catch {
      case e: Throwable =>
        deleteTree(Paths.get(root, s"v=$next"))
        backend.abortClaim(root, next)
        cleanup()
        throw e
    }
  private[sources] def markerFile(root: String, v: Int) = logDir(root).resolve(v.toString)

  /** The storage seam: every atomic metadata operation of the commit
    * protocol (CAS claim, publish, pointer advance, pointer read) goes
    * through [[CommitBackend]]; the rest of this object is portable
    * protocol logic. See CommitBackend's doc for the object-store
    * implementation contract.
    */
  private[sources] val backend: CommitBackend = FilesystemCommitBackend

  /** Latest committed version VISIBLE TO READERS, 0 if none. */
  def currentVersion(root: String): Int = backend.currentVersion(root)

  /** Latest version any writer has claimed (>= currentVersion):
    * markers exist the instant the CAS lands, before publish. After a
    * log compaction the checkpoint carries the folded-away range.
    */
  private[sources] def headVersion(root: String): Int = {
    val ld = logDir(root)
    val maxMarker = if (Files.isDirectory(ld)) {
      val s = Files.list(ld)
      try s.iterator().asScala
        .flatMap(p => p.getFileName.toString.toIntOption).maxOption.getOrElse(0)
      finally s.close()
    } else 0
    val ckptMax = checkpointed(root).keys.maxOption.getOrElse(0)
    // pre-_log tables: pointer only
    math.max(math.max(maxMarker, ckptMax), currentVersion(root))
  }

  // ---- log compaction ----------------------------------------------
  //
  // One marker file per commit is fine for thousands of commits; a
  // 100 TB table committing every few minutes for a year accumulates
  // ~10⁵ markers, and every headVersion() pays that directory
  // listing. `compactLog` folds all markers into one `_checkpoint`
  // file (version → declared partitions, same format markers use,
  // prefixed with the version number) and deletes the folded markers
  // — exactly Delta's N.checkpoint.parquet move. Ordering makes it
  // safe next to live writers: the checkpoint is staged and
  // atomically renamed BEFORE any marker is deleted, markers are
  // immutable once created, and readers consult marker-first then
  // checkpoint — so a version is always answerable from at least one
  // of the two, and the CAS slot for NEW versions (createLink on
  // `_log/N`) is untouched: a marker is only deleted after its
  // content is durable in the checkpoint, and claimed-but-unpublished
  // versions above the pointer are left alone so their rollback path
  // (delete own marker) stays valid.

  private def checkpointFile(root: String) = logDir(root).resolve("_checkpoint")

  /** version → declared partitions folded by past compactions. */
  private def checkpointed(root: String): Map[Int, Set[String]] = {
    val f = checkpointFile(root)
    if (!Files.exists(f)) Map.empty
    else Files.readString(f).linesIterator.flatMap { line =>
      line.split('\t') match {
        case Array(v, parts @ _*) if v.toIntOption.isDefined =>
          Some(v.toInt -> (if (parts.isEmpty) Set("*") else parts.toSet))
        case _ => None
      }
    }.toMap
  }

  /** Fold committed markers into `_checkpoint` and delete them.
    * Markers above the reader pointer are NOT folded: they may be
    * claims of in-flight writers whose failure path deletes their own
    * marker — folding those would make a crashed claim permanent.
    * Returns the number of markers folded away.
    */
  def compactLog(root: String): Int = {
    val cur = currentVersion(root)
    val ld = logDir(root)
    if (!Files.isDirectory(ld)) return 0
    val foldable = {
      val s = Files.list(ld)
      try s.iterator().asScala
        .flatMap(p => p.getFileName.toString.toIntOption)
        .filter(_ <= cur).toVector.sorted
      finally s.close()
    }
    if (foldable.isEmpty) return 0
    val merged = checkpointed(root) ++
      foldable.map(v => v -> touched(root, v)).toMap
    val body = merged.toSeq.sortBy(_._1).map { case (v, parts) =>
      (v.toString +: parts.toSeq.sorted).mkString("\t")
    }.mkString("", "\n", "\n")
    val tmp = ld.resolve(s"_checkpoint.tmp.${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, body)
    Files.move(tmp, checkpointFile(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // only now is it safe to drop the folded markers
    foldable.foreach(v => Files.deleteIfExists(markerFile(root, v)))
    foldable.size
  }

  /** Partitions version `v` declared touching; `Set("*")` = full table.
    * Markers are hard-linked from a fully-written manifest, so an
    * existing marker always carries complete content; a marker folded
    * into the log checkpoint answers from there; a version known to
    * neither (pre-_log table history) reads as full — the
    * conservative answer.
    */
  private[sources] def touched(root: String, v: Int): Set[String] = {
    val m = markerFile(root, v)
    val fromMarker =
      try {
        val body = Files.readString(m).trim
        Some(if (body.isEmpty) Set("*") else body.linesIterator.toSet)
      } catch {
        // deleted by a concurrent compaction between listing and read —
        // its content is durable in the checkpoint by ordering
        case _: java.nio.file.NoSuchFileException => None
        case _: java.io.FileNotFoundException => None
      }
    fromMarker.orElse(checkpointed(root).get(v)).getOrElse(Set("*"))
  }

  /** Advance the reader pointer to `next` unless a concurrent publish
    * already moved it past: out-of-claim-order publishes must never
    * move `_VERSION` backward (monotonic CAS, see CommitBackend).
    */
  private[sources] def advancePointer(root: String, next: Int): Unit =
    backend.advancePointer(root, next)

  private[sources] def overlaps(a: Set[String], b: Set[String]): Boolean =
    a.contains("*") || b.contains("*") || (a & b).nonEmpty

  /** Commit `df` as the next version via optimistic concurrency.
    *
    * `df` is the COMPLETE next table content. Declared `partitions`
    * only scope the conflict CHECK — they do not slice the data — so
    * a read-modify-write caller that passes them must accept that a
    * disjoint-rebase re-publishes its own (possibly stale) bytes for
    * the partitions it did not touch. For partition-sliced
    * concurrent writers use [[commitPartitions]], which recomposes
    * content on rebase instead.
    *
    * @param partitions  partition values this commit rewrites; empty
    *                    means "whole table" (blind overwrite)
    * @param readVersion the snapshot version the caller derived `df`
    *                    from; -1 (default) = blind write, which never
    *                    conflicts and only rebases
    * @return the committed version
    */
  def commit(spark: SparkSession, root: String, df: DataFrame,
      partitions: Seq[String] = Nil, readVersion: Int = -1,
      maxRetries: Int = 10, statsCols: Seq[String] = Nil,
      setCols: Seq[String] = Nil, setCap: Int = 1024,
      bloomCols: Seq[String] = Nil, bloomFpp: Double = 0.01): Int = {
    Files.createDirectories(logDir(root))
    requireNoReservedColumns(df)
    // escapeVal makes the newline-framed manifest injective: a
    // partition token carrying a newline must not split into bogus
    // entries that defeat a concurrent writer's overlap check (same
    // framing rule as the stats/sets manifests). Escaping happens on
    // BOTH the in-memory set and the written manifest, so overlaps()
    // always compares like with like.
    val mine: Set[String] =
      if (partitions.isEmpty) Set("*") else partitions.map(escapeVal).toSet
    // Stage once — the expensive (data-sized) step happens exactly one
    // time no matter how many CAS retries the (metadata-sized) loop
    // takes. The manifest temp is written once too: the CAS hard-links
    // it, so the marker is born with complete content.
    val staging = Paths.get(root, "_staging", java.util.UUID.randomUUID().toString)
    df.write.mode("overwrite").parquet(staging.toString)
    writeSchemaSidecar(staging, df.schema)
    try validateConstraints(spark, root, staging)
    catch { case e: Throwable => deleteTree(staging); throw e }
    if (statsCols.nonEmpty) writeStats(spark, staging, statsCols)
    if (setCols.nonEmpty) writeSets(spark, staging, setCols, setCap)
    if (bloomCols.nonEmpty) writeBlooms(spark, staging, bloomCols, bloomFpp)
    val manifestTmp = Paths.get(root, "_staging",
      staging.getFileName.toString + ".manifest")
    Files.writeString(manifestTmp, mine.toSeq.sorted.mkString("\n"))
    val committed = casCommit(root, staging, manifestTmp, mine, readVersion, maxRetries)
    // enrolled routing stats refresh AFTER publish (advisory — a stats
    // failure stales the scalar, never the commit); no-op one dir
    // check for non-enrolled tables. Full-content commit → recompute
    // (one counts aggregate, same order as the write just paid).
    TableStats.maintainFull(spark, root, committed)
    committed
  }

  /** The metadata half of [[commit]] — CAS-claim a version for an
    * already-staged directory and publish it. Shared by commit,
    * [[deleteWhere]], and [[compactFiles]], which stage differently
    * (Spark write vs hard-links) but follow one commit protocol.
    */
  private def casCommit(root: String, staging: Path, manifestTmp: Path,
      mine: Set[String], readVersion: Int, maxRetries: Int): Int = {
    def cleanup(): Unit = { deleteTree(staging); Files.deleteIfExists(manifestTmp); () }
    var attempt = 0
    while (true) {
      val base = headVersion(root)
      // Conflict check BEFORE claiming a version: any commit that
      // landed after our read snapshot and overlaps our partitions
      // makes our inputs stale.
      if (readVersion >= 0) {
        ((readVersion + 1) to base).find(v => overlaps(mine, touched(root, v)))
          .foreach { v =>
            cleanup()
            throw new SnapshotConflict(
              s"commit based on v$readVersion conflicts with v$v " +
                s"(overlapping partitions); re-read and re-derive")
          }
      }
      val next = base + 1
      val claimed = backend.claim(root, next, manifestTmp)
      if (!claimed) {
        attempt += 1
        if (attempt >= maxRetries) {
          cleanup()
          throw new SnapshotConflict(
            s"lost the commit race $maxRetries times at $root; giving up")
        }
        // loop: re-read head, re-check conflicts, next slot
      } else {
        // We own version `next` exclusively from here on.
        return publishClaimed(root, staging, manifestTmp, next, () => cleanup())
      }
    }
    -1 // unreachable
  }

  // ---- partition-sliced fast path: the file↔partition map ----------
  //
  // `_partmap` records, for a version written entirely through
  // [[commitPartitions]], which single partition token each data file
  // holds (newline-framed `escapeVal(file)\t<token>` lines; tokens are
  // the already-escaped manifest tokens). With it, composing the next
  // partition-sliced version is METADATA-SIZED for the untouched
  // partitions: their files are hard-linked (same inode — no read, no
  // write), and only the slice's rows are written. The map exists only
  // while every data file is single-partition:
  //  - born when commitPartitions CREATES the table (the slice is
  //    written one partition value at a time);
  //  - carried by every fast-path commit (linked files keep their
  //    token, new files take the slice's) and by RESTORE (1:1 links);
  //  - absent after any flat write (raw commit, mergeByKey, the
  //    slow-path compose) or OPTIMIZE (files rewritten), and IGNORED
  //    when the prior version carries a deletion vector — linking a
  //    file without its DV would resurrect deleted rows — all of
  //    which fall back to the always-correct full compose.
  private def partmapFile(dir: Path) = dir.resolve("_partmap")
  private val maxPartmapValues = 64

  /** The prior version's file→token map, or None when absent, when it
    * was built on a different partition column (the header line
    * records the exact column — token prefixes are ambiguous when a
    * column name contains '='), or when it does not cover exactly the
    * data files present (a torn or foreign layout must disable the
    * fast path, never corrupt it).
    */
  private def readPartmap(dir: Path,
      partitionCol: String): Option[Map[String, String]] = {
    if (!Files.exists(partmapFile(dir))) return None
    val lines = Files.readString(partmapFile(dir)).linesIterator
      .filter(_.nonEmpty).toSeq
    val colOk = lines.headOption.exists(_ ==
      s"#col\t${escapeVal(partitionCol)}")
    if (!colOk) return None
    val m = lines.tail.map { l =>
      val i = l.indexOf('\t')
      unescapeVal(l.take(i)) -> l.drop(i + 1)
    }.toMap
    if (m.keySet == listDataFiles(dir).toSet) Some(m) else None
  }

  private def writePartmap(staging: Path, partitionCol: String,
      entries: Map[String, String]): Unit = {
    Files.writeString(partmapFile(staging),
      (s"#col\t${escapeVal(partitionCol)}" +:
        entries.toSeq.sorted.map { case (f, t) => s"${escapeVal(f)}\t$t" })
        .mkString("\n"))
    ()
  }

  /** Does an existing sidecar manifest carry lines for every requested
    * column? Absent file or any missing column → no (recompute).
    */
  private def sidecarCovers(sidecar: Path, cols: Seq[String]): Boolean =
    Files.exists(sidecar) && {
      val present = Files.readString(sidecar).linesIterator
        .filter(_.nonEmpty).map(_.split("\t", 3)(1)).toSet
      cols.forall(present.contains)
    }

  private[sources] def listDataFiles(dir: Path): Vector[String] = {
    val s = Files.list(dir)
    try s.iterator().asScala.filter(p => Files.isRegularFile(p) && {
      val n = p.getFileName.toString
      !n.startsWith("_") && !n.startsWith(".")
    }).map(_.getFileName.toString).toVector
    finally s.close()
  }

  /** Write each partition value's slice rows as that value's own
    * files: one write job per value into a value-private temp subdir
    * (dot-prefixed — invisible to readers even if leaked), files then
    * moved into the staging root. The subdir is what makes file→token
    * attribution exact AND lets the jobs run CONCURRENTLY (Spark
    * schedules parallel jobs from one session; an append-into-shared-
    * dir design could do neither). Returns the partmap entries.
    */
  private def writeSlicePerValue(df: DataFrame, partitionCol: String,
      vals: Seq[Any], staging: Path): Map[String, String] = {
    import org.apache.spark.sql.functions.{col, lit}
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    // materialize the slice ONCE: each per-value job filters the
    // checkpointed blocks instead of re-running the slice's whole
    // lineage (an expensive upstream query would otherwise execute
    // up to |vals| times)
    val src = if (vals.length > 1) df.localCheckpoint(false) else df
    val sc = df.sparkSession.sparkContext
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, math.max(1, vals.length)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // Failure protocol: fail fast, but never hand the caller's
    // cleanup() a staging dir that sibling writes are still streaming
    // into (deleteTree racing live writers throws
    // DirectoryNotEmptyException, masking the real failure, or leaks
    // a half-deleted data-sized _staging). On the first error we
    // (a) flip `aborted` so queued-not-yet-started slices become
    // no-ops, (b) cancel the job group so RUNNING slice jobs die
    // (pool.shutdownNow only interrupts pool threads — the Spark jobs
    // they submitted would keep writing), then (c) await EVERY
    // future's completion before rethrowing, so by the time the
    // caller sees the exception nothing is writing into staging.
    val groupId = s"graft-slice-${java.util.UUID.randomUUID()}"
    @volatile var aborted = false
    val futs = vals.map { v =>
      Future {
        if (aborted) throw new IllegalStateException("sibling slice failed")
        sc.setJobGroup(groupId, s"slice $partitionCol=$v",
          interruptOnCancel = true)
        try {
          val sub = staging.resolve(s".slice-${java.util.UUID.randomUUID()}")
          src.filter(col(partitionCol) <=> lit(v))
            .write.mode("overwrite").parquet(sub.toString)
          val tok = escapeVal(s"$partitionCol=${tokenRender(v)}")
          val moved = listDataFiles(sub).map { f =>
            Files.move(sub.resolve(f), staging.resolve(f))
            f -> tok
          }
          deleteTree(sub)
          moved
        } finally sc.clearJobGroup()
      }
    }
    try Await.result(Future.sequence(futs), Duration.Inf).flatten.toMap
    catch {
      case e: Throwable =>
        aborted = true
        sc.cancelJobGroup(groupId)
        futs.foreach { f =>
          try { Await.ready(f, Duration.Inf); () }
          catch { case _: Throwable => () }
        }
        throw e
    } finally {
      pool.shutdown()
      // only the checkpoint WE minted: when vals has one element src
      // IS df, and df's own blocks may be a caller-owned checkpoint
      // (the streaming sink re-reads its slice across OCC retries)
      if (src ne df) freeLocalCheckpoint(src)
    }
  }

  /** Release the executor-storage blocks behind a `localCheckpoint`ed
    * DataFrame. `Dataset.unpersist` only uncaches `cache()`d plans;
    * checkpoint blocks belong to the underlying RDD inside the
    * returned plan's LogicalRDD leaf and otherwise live until the
    * ContextCleaner GCs the RDD — on a long-running stream that
    * checkpoints per micro-batch they accumulate and pressure
    * executor storage memory. Safe on any DataFrame: non-LogicalRDD
    * plans are untouched, and unpersisting a never-materialized lazy
    * checkpoint is a no-op.
    */
  private[graft] def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** Carry the per-file pruning sidecars (`_stats.json`, `_sets.json`)
    * across a fast-path compose: kept (hard-linked) files keep their
    * lines verbatim — both manifests describe immutable bytes — and
    * the slice's new files get freshly computed lines over JUST their
    * own bytes, so manifest data skipping keeps working on partmap
    * tables without ever rescanning the untouched partitions. New
    * files' set lines use the CALLER's cap (prior versions' caps are
    * not recorded; a cap difference only shifts which files carry the
    * OVERFLOW sentinel, which pruning treats conservatively).
    */
  private def carrySidecars(spark: SparkSession, priorDir: Path,
      staging: Path, keptFiles: Set[String], newFiles: Set[String],
      setCap: Int, bloomFpp: Double = 0.01): Unit = {
    val newPaths = newFiles.toSeq.sorted.map(f => staging.resolve(f).toString)
    def carry(sidecar: Path => Path, fresh: Seq[String] => String): Unit = {
      if (!Files.exists(sidecar(priorDir))) return
      val all = Files.readString(sidecar(priorDir)).linesIterator
        .filter(_.nonEmpty).toSeq
      val kept = all.filter(l => keptFiles.contains(l.takeWhile(_ != '\t')))
      val cols = all.map(_.split("\t", 3)(1)).distinct
      val body = if (newPaths.isEmpty) "" else fresh(cols)
      Files.writeString(sidecar(staging),
        (kept ++ body.linesIterator.filter(_.nonEmpty)).mkString("\n") + "\n")
      ()
    }
    carry(statsFile, cols => statsBody(spark, newPaths, cols))
    carry(setsFile, cols => setsBody(spark, newPaths, cols, setCap))
    carry(bloomFile, cols => bloomBody(spark, newPaths, cols, bloomFpp))
  }

  /** Partition-sliced read-modify-write commit — the SOUND concurrent
    * writer API for partitioned tables. `df` holds ONLY the new rows
    * of the partitions it rewrites (every distinct `partitionCol`
    * value in `df` is a rewritten partition); the committed version's
    * content is composed here as (published head minus those
    * partitions) ∪ `df`, and a lost CAS recomposes against the NEW
    * head before retrying — so a concurrent disjoint-partition
    * writer's rows are re-read and carried, never clobbered.
    *
    * This is the fix for the lost-update hazard of calling [[commit]]
    * with declared partitions directly: there the caller stages the
    * FULL table as read at `readVersion`, so a disjoint writer that
    * rebases (new version number, same stale bytes) silently reverts
    * every partition the concurrent commit touched. Here the rebase
    * recomposes content, which is what "rebase" must mean when a
    * version is a complete snapshot.
    *
    * Serialization contract (matches Delta/Iceberg OCC):
    *  - overlapping-partition writers: loser aborts with
    *    [[SnapshotConflict]] (stale inputs — re-read and re-derive);
    *  - disjoint-partition writers: both land, both updates survive;
    *  - a concurrent BLIND full-table write (`commit` with no
    *    readVersion) either conflicts us (its `*` claim is visible) or
    *    publishes after our claim, in which case its full overwrite is
    *    the valid later serialization.
    *
    * Claims here are taken CONTIGUOUSLY (exactly published-head + 1,
    * never skipping an in-flight claim), because composition can only
    * read published data: skipping would publish a version that lacks
    * the in-flight writer's rows. A dead writer's orphan claim at
    * head+1 therefore blocks this path until `maxRetries` (the
    * conservative trade documented on the class; recover by
    * [[abortClaim]]-ing the orphan after forensics).
    *
    * Cost: when the prior version carries a `_partmap` (tables written
    * entirely through this API), composition is the FAST PATH —
    * untouched partitions' files are hard-linked and only the slice's
    * rows are written, so a commit against a 100 TB table costs the
    * touched data plus |files| link syscalls. Otherwise (table born
    * from a flat commit, a deletion vector present, or a
    * pathologically wide slice) composition is one data-sized stage.
    * Either way a retry against a MOVED head pays a recomposition
    * (that IS the rebase); a retry against an unmoved head (in-flight
    * claim ahead) only waits.
    */
  /** @param dropValues additional partition values ATOMICALLY REMOVED
    *        in the same committed version (no window where old and new
    *        rows coexist) — the partition-DROP primitive an LSM-style
    *        OPTIMIZE needs (rewrite sealed slices into consolidated
    *        partitions AND drop the originals in one version; see
    *        BandHistory.optimize). Must be disjoint from `df`'s own
    *        partition values. On the partmap fast path dropped
    *        partitions' files are simply not linked forward; on the
    *        slow path they are filtered out of the composed content.
    */
  /** Distinct slice values, token-safety, and conflict-manifest tokens
    * for a partition-sliced commit — the shared preamble of
    * [[commitPartitions]] and sliced [[TableWrite]]s in
    * [[SnapshotTransaction.commitAll]].
    *
    * Distinct partition values are metadata-sized by the
    * partitioned-table contract (|partitions| ≪ |rows|). Partition
    * tokens are built from value.toString, which is only VALUE-BASED
    * for the listed types: a BinaryType value would tokenize as its
    * identity hash (different every run → the same partition gets two
    * tokens → kept-files filter misses → duplicated rows), and
    * java.sql.Timestamp/Date render through the JVM default timezone
    * (unstable across writers). Unsafe types: no tokens — the conflict
    * manifest degrades to the conservative full-table `*` and
    * composition takes the value-correct slow path. Tokens are
    * whole-token escaped (same framing rule as commit(): a value
    * carrying a newline must not split the manifest into bogus entries
    * that defeat a concurrent writer's overlap check), and dropped
    * partitions are claimed exactly like rewritten ones — a concurrent
    * writer of a dropped partition must conflict.
    */
  private[sources] def slicePreamble(df: DataFrame, partitionCol: String,
      dropValues: Seq[Any]): (Seq[Any], Boolean, Set[String]) = {
    require(df.columns.contains(partitionCol),
      s"partition column $partitionCol missing from ${df.columns.mkString(",")}")
    val vals = df.select(partitionCol).distinct().collect().map(_.get(0)).toSeq
    require(vals.nonEmpty, "partition-sliced commit carries no rows")
    require(!vals.contains(null),
      s"null $partitionCol values cannot address a partition")
    require(!dropValues.contains(null),
      s"null $partitionCol values cannot address a dropped partition")
    require(dropValues.intersect(vals).isEmpty,
      s"dropValues overlap the slice's own partition values: " +
        dropValues.intersect(vals).mkString(","))
    val tokenSafe = df.schema(partitionCol).dataType match {
      case org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.BooleanType |
           org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.DoubleType => true
      case _: org.apache.spark.sql.types.DecimalType => true
      case _ => false
    }
    val mine: Set[String] =
      if (tokenSafe) (vals ++ dropValues)
        .map(v => escapeVal(s"$partitionCol=${tokenRender(v)}")).toSet
      else Set("*")
    (vals, tokenSafe, mine)
  }

  /** Compose a partition-sliced staging directory against PUBLISHED
    * version `base` — the staging step shared by [[commitPartitions]]
    * and sliced [[TableWrite]]s in [[SnapshotTransaction.commitAll]].
    * The caller owns the claim/publish/cleanup protocol; on any throw
    * the caller must delete `staging`.
    */
  private[sources] def composeSliceStaging(spark: SparkSession, root: String,
      df: DataFrame, partitionCol: String, vals: Seq[Any],
      dropValues: Seq[Any], tokenSafe: Boolean, mine: Set[String],
      base: Int, staging: Path, statsCols: Seq[String],
      setCols: Seq[String], setCap: Int,
      bloomCols: Seq[String], bloomFpp: Double): Unit = {
    if (base == 0) {
      require(dropValues.isEmpty,
        "dropValues on a CREATE commit: nothing exists to drop")
      // CREATE: write one partition value at a time so the version
      // is born with a `_partmap` and every later slice commit can
      // take the file-link fast path (capped — a pathological
      // first slice with hundreds of values, or a token-unsafe
      // partition type, stays a flat write)
      Files.createDirectories(staging)
      if (tokenSafe && vals.length <= maxPartmapValues)
        writePartmap(staging, partitionCol,
          writeSlicePerValue(df, partitionCol, vals, staging))
      else df.write.mode("overwrite").parquet(staging.toString)
      writeSchemaSidecar(staging, df.schema)
    } else {
      val prior = read(spark, root, base)
      // names AND types must match exactly: a name-only check
      // would let unionByName silently widen the table's column
      // type table-wide on compose (a LONG column fed a DOUBLE
      // slice flips every row to DOUBLE) — the same-name type
      // flip mergeByKey's store-assignment guards exist to block
      val priorTypes = prior.schema.fields
        .map(f => f.name -> f.dataType).toMap
      val sliceTypes = df.schema.fields
        .map(f => f.name -> f.dataType).toMap
      require(priorTypes == sliceTypes,
        s"schema mismatch: table has ${prior.schema.simpleString}, " +
          s"slice has ${df.schema.simpleString} (same names AND types " +
          "required; evolve via mergeByKey)")
      val aligned = df.select(prior.columns.map(
        org.apache.spark.sql.functions.col): _*)
      val priorDir = Paths.get(root, s"v=$base")
      // the map is only usable when it was built on the SAME
      // partition column (its header records the exact column —
      // a token-prefix test would be fooled by a column name
      // containing '='): tokens for another column would never
      // match `mine`, every file would be "kept", and the slice's
      // rows would duplicate instead of replace. A column switch
      // (legal, if odd) takes the slow compose, which filters on
      // values and stays correct.
      val priorMap = readPartmap(priorDir, partitionCol)
        .filter(_ => !Files.exists(dvDir(priorDir)))
      priorMap match {
        case Some(pm) if tokenSafe && vals.length <= maxPartmapValues =>
          // FAST PATH: untouched partitions' files are hard-linked
          // (metadata-only — no read, no write of their bytes);
          // only the slice's rows are written. Commit cost is
          // ∝ touched data + |files| link syscalls, not table size
          // — the file-granularity economics the real formats get
          // from their manifests.
          Files.createDirectories(staging)
          val keep = pm.filter { case (_, tok) => !mine.contains(tok) }
          keep.keys.foreach(f =>
            Files.createLink(staging.resolve(f), priorDir.resolve(f)))
          val fresh = writeSlicePerValue(aligned, partitionCol, vals, staging)
          writePartmap(staging, partitionCol, keep ++ fresh)
          // pruning manifests survive the fast path too: kept
          // files' lines carry verbatim, new files are scanned
          carrySidecars(spark, priorDir, staging, keep.keySet,
            fresh.keySet, setCap, bloomFpp)
        case _ =>
          // SLOW PATH (no partmap / DV present / token-unsafe
          // type / too many values): full compose stays correct,
          // flat files, no partmap.
          // coalesce(…, false): a NULL partition value in the
          // prior table is unaddressable by a slice and survives
          val replaced = org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.col(partitionCol)
              .isin(vals ++ dropValues: _*),
            org.apache.spark.sql.functions.lit(false))
          prior.filter(!replaced).unionByName(aligned)
            .write.mode("overwrite").parquet(staging.toString)
      }
      // schema sidecar in the table's (prior) column order —
      // zero-job reads of the new version
      writeSchemaSidecar(staging, aligned.schema)
    }
    // explicit sidecar requests (same contract as commit()). A
    // carried manifest that does not cover the REQUESTED columns
    // is recomputed over the whole staging (a pruning-column
    // upgrade is a data-sized event, never a silent drop).
    if (statsCols.nonEmpty && !sidecarCovers(statsFile(staging), statsCols))
      writeStats(spark, staging, statsCols)
    if (setCols.nonEmpty && !sidecarCovers(setsFile(staging), setCols))
      writeSets(spark, staging, setCols, setCap)
    if (bloomCols.nonEmpty && !sidecarCovers(bloomFile(staging), bloomCols))
      writeBlooms(spark, staging, bloomCols, bloomFpp)
    validateConstraints(spark, root, staging)
  }

  def commitPartitions(spark: SparkSession, root: String, df: DataFrame,
      partitionCol: String, readVersion: Int = -1,
      maxRetries: Int = 10, statsCols: Seq[String] = Nil,
      setCols: Seq[String] = Nil, setCap: Int = 1024,
      dropValues: Seq[Any] = Nil,
      bloomCols: Seq[String] = Nil, bloomFpp: Double = 0.01): Int = {
    Files.createDirectories(logDir(root))
    requireNoReservedColumns(df)
    val (vals, tokenSafe, mine) = slicePreamble(df, partitionCol, dropValues)
    var attempt = 0
    var composedBase = -1 // version the current staging was composed against
    var staging: Path = null
    var manifestTmp: Path = null
    def cleanup(): Unit = {
      if (staging != null) deleteTree(staging)
      if (manifestTmp != null) { Files.deleteIfExists(manifestTmp); () }
    }
    while (attempt < maxRetries) {
      val base = currentVersion(root) // compose against PUBLISHED data only
      // conflict check spans CLAIMED head: an in-flight overlapping
      // claim already invalidates our inputs (conservative, same rule
      // as casCommit)
      if (readVersion >= 0) {
        ((readVersion + 1) to headVersion(root))
          .find(v => overlaps(mine, touched(root, v)))
          .foreach { v =>
            cleanup()
            throw new SnapshotConflict(
              s"commit based on v$readVersion conflicts with v$v " +
                s"(overlapping partitions); re-read and re-derive")
          }
      }
      if (base != composedBase) {
        cleanup()
        staging = Paths.get(root, "_staging", java.util.UUID.randomUUID().toString)
        try {
        composeSliceStaging(spark, root, df, partitionCol, vals, dropValues,
          tokenSafe, mine, base, staging, statsCols, setCols, setCap,
          bloomCols, bloomFpp)
        manifestTmp = Paths.get(root, "_staging",
          staging.getFileName.toString + ".manifest")
        Files.writeString(manifestTmp, mine.toSeq.sorted.mkString("\n"))
        composedBase = base
        } catch {
          // any staging-build failure (a per-value write, a sidecar
          // scan, a constraint violation) must not leak the data-sized
          // _staging directory
          case e: Throwable => cleanup(); throw e
        }
      }
      // contiguous claim: exactly composedBase + 1
      val next = composedBase + 1
      if (backend.claim(root, next, manifestTmp)) {
        val committed =
          publishClaimed(root, staging, manifestTmp, next, () => cleanup())
        // enrolled routing stats: fold the slice's counts in and the
        // replaced partitions' old counts out — the prior version's
        // partmap names the replaced files exactly, so the old-slice
        // read is ∝ touched data (never a table scan) on the fast
        // path; the DV/token-unsafe fallback filters the prior
        // version the same way the slow compose does. Advisory: runs
        // after publish, failures only stale the scalar.
        if (TableStats.hasEnrollments(root)) {
          val priorDir = Paths.get(root, s"v=$composedBase")
          val oldSlice =
            if (composedBase == 0) None
            else readPartmap(priorDir, partitionCol)
              .filter(_ => tokenSafe && !Files.exists(dvDir(priorDir))) match {
              case Some(pm) =>
                val replacedFiles = pm.collect {
                  case (f, tok) if mine.contains(tok) =>
                    priorDir.resolve(f).toString
                }.toSeq
                if (replacedFiles.isEmpty) None
                else Some(spark.read.parquet(replacedFiles: _*))
              case None =>
                val replaced = org.apache.spark.sql.functions.coalesce(
                  org.apache.spark.sql.functions.col(partitionCol)
                    .isin(vals ++ dropValues: _*),
                  org.apache.spark.sql.functions.lit(false))
                Some(read(spark, root, composedBase).filter(replaced))
            }
          TableStats.maintainPartitionOverwrite(spark, root, committed,
            df, oldSlice)
        }
        return committed
      }
      attempt += 1
      // head unmoved means an in-flight claim owns next: wait, don't
      // restage; a moved head recomposes on the next loop pass
      if (currentVersion(root) == composedBase) Thread.sleep(50L * attempt)
    }
    cleanup()
    throw new SnapshotConflict(
      s"lost the commit race $maxRetries times at $root; giving up")
  }

  // ---- schema sidecar: zero-job cold reads ---------------------------
  //
  // Without a declared schema, spark.read.parquet infers it by reading
  // footers in a SPARK JOB — the real table formats store the schema
  // in commit metadata precisely so a cold read is metadata-only.
  // Every staged version records its schema (all-nullable: the
  // conservative read form — linked files from earlier versions may
  // differ in nullability) as `_schema.json`; read() declares it so a
  // snapshot read plans with ZERO jobs. Tables without the sidecar
  // (pre-r15 history) fall back to inference.

  private[sources] def schemaFile(dir: Path) = dir.resolve("_schema.json")

  private[sources] def writeSchemaSidecar(staging: Path,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val nullable = org.apache.spark.sql.types.StructType(
      schema.fields.map(_.copy(nullable = true)))
    Files.writeString(schemaFile(staging), nullable.json); ()
  }

  private def readWithSidecarSchema(spark: SparkSession, dir: Path): DataFrame = {
    val sf = schemaFile(dir)
    if (Files.exists(sf))
      spark.read.schema(org.apache.spark.sql.types.DataType
        .fromJson(Files.readString(sf))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
        .parquet(dir.toString)
    else spark.read.parquet(dir.toString)
  }

  /** Read the latest snapshot (default) or time-travel to `version`. */
  def read(spark: SparkSession, root: String, version: Int = -1): DataFrame = {
    val cur = currentVersion(root)
    val v = if (version > 0) version else cur
    require(v > 0, s"no committed version at $root")
    // an orphan marker/directory from a crashed writer can exist ABOVE
    // the pointer; reading it would surface uncommitted data
    require(v <= cur, s"version $v is not committed (latest is $cur)")
    require(Files.exists(Paths.get(root, s"v=$v")),
      s"version $v does not exist (vacuumed or never committed)")
    applyDv(spark, Paths.get(root, s"v=$v"),
      readWithSidecarSchema(spark, Paths.get(root, s"v=$v")))
  }

  // ---- deletion vectors (row-level delete without rewrite) ---------
  //
  // A copy-on-write delete (ParquetDml.delete) rewrites every file
  // that holds a matching row — at 100 TB, deleting 0.1% of rows can
  // rewrite 100% of the bytes. Deletion vectors are the merge-on-read
  // alternative the real formats added (Delta DVs / Iceberg position
  // deletes): the commit records only WHICH rows died, as
  // (file, row_index) pairs, and readers subtract them. Here:
  //
  //  - the new version's data files are HARD LINKS to the previous
  //    version's (same inode, metadata-only cost — the filesystem
  //    stand-in for a manifest that re-references unchanged files;
  //    vacuum of either version just unlinks names);
  //  - the cumulative vector lives in `_dv/` parquet INSIDE the
  //    version directory — underscore-prefixed, so plain readers
  //    never list it, and it publishes atomically with the rename;
  //  - row identity is (_metadata.file_name, _metadata.row_index) —
  //    stable because data files are immutable and keep their names
  //    across link-only commits;
  //  - [[read]] and [[readPruned]] subtract the vector with a
  //    broadcast anti-join (|DV| ∝ deleted rows, not table size);
  //  - a later full [[commit]] writes fresh files and no `_dv`, and
  //    [[compactFiles]] materializes the subtraction — both end the
  //    merge-on-read debt, exactly like OPTIMIZE on the real formats.
  private[sources] def dvDir(dir: Path) = dir.resolve("_dv")

  private val dvSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("__dv_file",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("__dv_idx",
      org.apache.spark.sql.types.LongType)))

  /** The version's cumulative deletion vector (columns `__dv_file`,
    * `__dv_idx`), empty when the version carries none.
    */
  def deletionVectors(spark: SparkSession, root: String,
      version: Int = -1): DataFrame = {
    val cur = currentVersion(root)
    val v = if (version > 0) version else cur
    require(v > 0 && v <= cur, s"version $v is not committed (latest is $cur)")
    dvRead(spark, Paths.get(root, s"v=$v"))
  }

  private def dvRead(spark: SparkSession, dir: Path): DataFrame =
    if (Files.exists(dvDir(dir)))
      spark.read.schema(dvSchema).parquet(dvDir(dir).toString)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        dvSchema)

  private def applyDv(spark: SparkSession, dir: Path, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    if (!Files.exists(dvDir(dir))) df
    else {
      val dv = dvRead(spark, dir)
      df.withColumn("__file", col("_metadata.file_name"))
        .withColumn("__idx", col("_metadata.row_index"))
        .join(broadcast(dv),
          col("__file") === col("__dv_file") && col("__idx") === col("__dv_idx"),
          "left_anti")
        .drop("__file", "__idx")
    }
  }

  /** Row-level DELETE as a deletion-vector commit: no data file is
    * read for rewrite or written — the new version hard-links every
    * previous data file and adds the matching (file, row) pairs to
    * the cumulative `_dv`. Conflict-checked as a full-table
    * read-modify-write against the version the predicate was
    * evaluated on. Returns the new version.
    */
  def deleteWhere(spark: SparkSession, root: String, predicate: String,
      maxRetries: Int = 10): Int = {
    import org.apache.spark.sql.functions.{col, expr}
    val cur = currentVersion(root)
    require(cur > 0, s"no committed version at $root")
    val srcDir = Paths.get(root, s"v=$cur")
    val withMeta = spark.read.parquet(srcDir.toString)
      .withColumn("__file", col("_metadata.file_name"))
      .withColumn("__idx", col("_metadata.row_index"))
    val prev = dvRead(spark, srcDir)
    // evaluate the predicate on LIVE rows only (already-deleted rows
    // must not re-enter the vector as duplicates)
    val live = withMeta.join(prev,
      col("__file") === col("__dv_file") && col("__idx") === col("__dv_idx"),
      "left_anti")
    val newDv = live.filter(expr(predicate))
      .select(col("__file").as("__dv_file"), col("__idx").as("__dv_idx"))
    val staging = Paths.get(root, "_staging", java.util.UUID.randomUUID().toString)
    Files.createDirectories(staging)
    // cumulative vector first (a Spark job over src — reads nothing
    // from staging), then the metadata-only data-file links
    prev.unionAll(newDv).write.mode("overwrite")
      .parquet(dvDir(staging).toString)
    listDataFiles(srcDir).foreach(n =>
      Files.createLink(staging.resolve(n), srcDir.resolve(n)))
    // the stats manifest stays valid (same immutable files; deleted
    // rows only widen the ranges, which is conservative for pruning)
    if (Files.exists(statsFile(srcDir)))
      Files.copy(statsFile(srcDir), statsFile(staging),
        StandardCopyOption.COPY_ATTRIBUTES)
    // value sets stay valid for the same reason (files unchanged;
    // deleted values still listed = conservative keep)
    if (Files.exists(setsFile(srcDir)))
      Files.copy(setsFile(srcDir), setsFile(staging),
        StandardCopyOption.COPY_ATTRIBUTES)
    // token blooms likewise (r16: without the carry, a DV commit
    // silently dropped the third skipping leg until the next OPTIMIZE)
    if (Files.exists(bloomFile(srcDir)))
      Files.copy(bloomFile(srcDir), bloomFile(staging),
        StandardCopyOption.COPY_ATTRIBUTES)
    // schema unchanged by a DV-only commit
    if (Files.exists(schemaFile(srcDir)))
      Files.copy(schemaFile(srcDir), schemaFile(staging),
        StandardCopyOption.COPY_ATTRIBUTES)
    val manifestTmp = Paths.get(root, "_staging",
      staging.getFileName.toString + ".manifest")
    Files.writeString(manifestTmp, "*")
    val committed = casCommit(root, staging, manifestTmp, Set("*"), cur, maxRetries)
    TableStats.maintainFull(spark, root, committed) // enrolled stats (advisory)
    committed
  }

  // ---- MERGE (batch upsert) ----------------------------------------

  /** MERGE INTO for snapshot tables: rows whose key appears in
    * `source` are replaced by the source row (matched → update),
    * unmatched source rows are inserted, everything else is carried
    * forward — the batch twin of streaming.SnapshotSink's per-batch
    * merge, exposed as a first-class table op. The caller guarantees
    * `source` has one row per key (the standard MERGE cardinality
    * contract; enforced here because a violation would silently
    * duplicate rows). Committed as a read-modify-write of the
    * version merged against; concurrent overlapping commits abort
    * with [[SnapshotConflict]] for the caller to retry.
    *
    * At 100 TB the anti-join's right side is the source key set —
    * batch-sized, broadcastable; with the table bucketed on the key
    * the merge is shuffle-free.
    */
  def mergeByKey(spark: SparkSession, root: String, source: DataFrame,
      keyCols: Seq[String], maxRetries: Int = 10): Int = {
    import org.apache.spark.sql.functions.{col, count, lit}
    require(keyCols.nonEmpty, "mergeByKey needs at least one key column")
    val dups = source.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).collect()
    require(dups.isEmpty,
      s"merge source has duplicate keys (e.g. ${dups.headOption.getOrElse("")})")
    val cur = currentVersion(root)
    val merged =
      if (cur == 0) source
      else {
        val curDf = read(spark, root, cur)
        // shared VALUE columns keep the TABLE's type (the
        // store-assignment contract of the transactional formats):
        // the source is implicitly cast where ANSI store assignment
        // allows it (numeric widening/narrowing, not
        // string->numeric), so a merge can never silently flip a
        // column's physical type between versions — the changes()
        // alignment treats a same-name type change as corruption.
        val shared = curDf.schema.filter(f => source.columns.contains(f.name))
        for (f <- shared; sf = source.schema(f.name) if sf.dataType != f.dataType)
          require(org.apache.spark.sql.catalyst.expressions.Cast
            .canANSIStoreAssign(sf.dataType, f.dataType),
            s"merge source column ${f.name} has type ${sf.dataType}, " +
              s"table has ${f.dataType} — cast before merging")
        val srcAligned = source.select(source.columns.map { c =>
          curDf.schema.find(_.name == c) match {
            case Some(f) if f.dataType != source.schema(c).dataType =>
              col(c).cast(f.dataType).as(c)
            case _ => col(c)
          }
        }.toSeq: _*)
        // ANSI store assignment permits casts that are lossy for
        // SOME values (DOUBLE 1.9 -> LONG 1). A type-level guard
        // (canUpCast) would reject legitimate in-range narrowing, so
        // the contract is lossless-IN-FACT (ADVICE r9): every cast
        // column must round-trip back to its source value exactly,
        // checked in one pass over the batch-sized source; a row
        // that would lose precision fails the merge loudly instead
        // of committing silently truncated data. This also subsumes
        // the r9 key-collapse guard: an exact round-trip makes the
        // cast injective on the source's values (cast(a)=cast(b) ⇒
        // a = back(cast(a)) = back(cast(b)) = b), so distinct keys
        // can no longer collapse to duplicates after casting.
        val castCols = source.schema.flatMap { sf =>
          curDf.schema.find(_.name == sf.name)
            .filter(_.dataType != sf.dataType).map(f => (sf, f))
        }
        if (castCols.nonEmpty) {
          // null-safe inequality (<=>): a cast that OVERFLOWS to null
          // in a non-ANSI session would make the plain =!= round-trip
          // compare evaluate to null, slip through the filter, and
          // commit null over real data — the exact silent corruption
          // this guard exists to stop (code-review r10). Under ANSI
          // the same overflow throws inside the filter itself, so the
          // probe is wrapped to surface the friendly diagnostic
          // either way.
          val lossy = castCols.map { case (sf, f) =>
            !(source(sf.name).cast(f.dataType).cast(sf.dataType) <=> source(sf.name))
          }.reduce(_ || _)
          val castDesc = castCols.map(c => c._1.name +
            s" ${c._1.dataType.simpleString}->${c._2.dataType.simpleString}")
            .mkString(", ")
          val bad =
            try source.filter(lossy).limit(1).collect()
            catch { case e: org.apache.spark.SparkThrowable =>
              throw new IllegalArgumentException(
                s"merge source row loses precision (cast overflow) casting to " +
                  s"the table's column types (cast columns: $castDesc) — " +
                  s"cast explicitly before merging", e.asInstanceOf[Throwable])
            }
          require(bad.isEmpty,
            s"merge source row loses precision casting to the table's " +
              s"column types (e.g. ${bad.headOption.getOrElse("")}; " +
              s"cast columns: $castDesc) — cast explicitly before merging")
        }
        // Schema evolution semantics (Delta MERGE parity, ADVICE
        // r9): a source with a NEW column appends it (old rows
        // null). A source MISSING a table column must not null it on
        // MATCHED keys — updateAll preserves target columns absent
        // from the source — so matched rows pull the missing columns
        // from their CURRENT row via a left join on the keys;
        // unmatched (inserted) keys get null there, the insertAll
        // contract. The join's right side is the table projected to
        // (keys ++ missing) — one row per key by the table
        // invariant, so source cardinality is preserved.
        val missingCols = curDf.schema.map(_.name)
          .filterNot(source.columns.contains)
        val srcFull =
          if (missingCols.isEmpty) srcAligned
          else srcAligned.join(
            curDf.select((keyCols ++ missingCols).map(col): _*),
            keyCols, "left")
        // the using-columns join form moves keyCols to the FRONT of
        // its output; restore the table's column order so every
        // version shares one physical layout (changes() and any
        // positional consumer depend on it). allowMissingColumns
        // keeps the merge schema-evolving for source-side NEW
        // columns (appended, old rows null).
        curDf.join(srcAligned.select(keyCols.map(col): _*), keyCols, "left_anti")
          .select(curDf.columns.map(col): _*)
          .unionByName(srcFull, allowMissingColumns = true)
      }
    commit(spark, root, merged, readVersion = cur, maxRetries = maxRetries)
  }

  // ---- RESTORE -----------------------------------------------------

  /** Roll the table back to `toVersion` as a NEW commit (history is
    * never rewritten — the bad versions stay time-travelable until
    * vacuum). Metadata-only: the new version hard-links the target
    * version's data files and copies its sidecars (`_dv`, stats,
    * sets), so restoring a 100 TB table costs |files| link
    * operations, not a rewrite. Conflict-checked as a full-table
    * write against the current head.
    */
  def restore(spark: SparkSession, root: String, toVersion: Int,
      maxRetries: Int = 10): Int = {
    val cur = currentVersion(root)
    require(toVersion > 0 && toVersion <= cur,
      s"cannot restore to v$toVersion (latest is $cur)")
    val srcDir = Paths.get(root, s"v=$toVersion")
    require(Files.exists(srcDir),
      s"version $toVersion does not exist (vacuumed)")
    val staging = Paths.get(root, "_staging", java.util.UUID.randomUUID().toString)
    Files.createDirectories(staging)
    val entries = {
      val s = Files.list(srcDir)
      try s.iterator().asScala.toVector finally s.close()
    }
    entries.foreach { p =>
      val n = p.getFileName.toString
      if (Files.isRegularFile(p) && !n.startsWith("."))
        Files.createLink(staging.resolve(n), p)
      else if (Files.isDirectory(p) && n == "_dv") {
        // link the vector files too — the restored state includes its deletes
        Files.createDirectories(staging.resolve(n))
        val s2 = Files.list(p)
        try s2.iterator().asScala.filter(Files.isRegularFile(_))
          .foreach(f => Files.createLink(
            staging.resolve(n).resolve(f.getFileName), f))
        finally s2.close()
      }
    }
    // CHECK constraints bind RESTORE too: constraints added after
    // `toVersion` was written must not be bypassable by restoring to
    // it — no violating version may ever become the readable head.
    // One read-only scan of the (hard-linked, DV-applied) staged rows.
    try validateConstraints(spark, root, staging)
    catch { case e: Throwable => deleteTree(staging); throw e }
    val manifestTmp = Paths.get(root, "_staging",
      staging.getFileName.toString + ".manifest")
    Files.writeString(manifestTmp, "*")
    val committed = casCommit(root, staging, manifestTmp, Set("*"), cur, maxRetries)
    TableStats.maintainFull(spark, root, committed) // enrolled stats (advisory)
    committed
  }

  // ---- commit history (metadata table) -----------------------------

  /** The table's commit history as a DataFrame — (version,
    * committed_at, operation-visible metadata: touched partitions,
    * file count, has deletion vector) for every version still on
    * disk, newest first. The `DESCRIBE HISTORY` surface for audit
    * and debugging; timestamps are filesystem mtimes of the version
    * directories (observability data, not part of any oracle).
    */
  def historyTable(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val cur = currentVersion(root)
    val rows = (1 to cur).flatMap { v =>
      val dir = Paths.get(root, s"v=$v")
      if (!Files.exists(dir)) None // vacuumed
      else {
        val files = listDataFiles(dir).size
        val parts = try touched(root, v).toSeq.sorted.mkString(",")
                    catch { case _: Exception => "*" }
        Some((v, Files.getLastModifiedTime(dir).toMillis, parts, files,
          Files.exists(dvDir(dir))))
      }
    }
    rows.toDF("version", "committed_at_ms", "partitions", "n_files", "has_dv")
      .orderBy(org.apache.spark.sql.functions.col("version").desc)
  }

  // ---- OPTIMIZE (file compaction) ----------------------------------

  /** Bin-pack the current version's live rows into ~`targetFileBytes`
    * files as a new full-table version — the OPTIMIZE half of the
    * format: many small commits (or a streaming sink's per-batch
    * files) degrade scan parallelism and footer-listing cost, and
    * accumulated deletion vectors tax every read with the anti-join;
    * compaction pays the rewrite once and clears both debts.
    *
    * The output file count is sized from the version's LIVE byte
    * count (data bytes minus nothing — deleted-row bytes are an
    * overestimate, which errs toward slightly larger files, the
    * harmless direction). `coalesce` narrows without a shuffle —
    * the scale-correct default for a pure compaction; pass
    * `rebalance = true` to pay one round-robin shuffle when the
    * inputs are pathologically skewed. Time travel to pre-compaction
    * versions is untouched; vacuum reclaims them later.
    */
  def compactFiles(spark: SparkSession, root: String,
      targetFileBytes: Long = 128L << 20, rebalance: Boolean = false,
      statsCols: Seq[String] = Nil, maxRetries: Int = 10): Int = {
    val cur = currentVersion(root)
    require(cur > 0, s"no committed version at $root")
    val dir = Paths.get(root, s"v=$cur")
    val bytes = listDataFiles(dir).map(n => Files.size(dir.resolve(n))).sum
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val live = read(spark, root, cur)
    val packed = if (rebalance) live.repartition(nOut) else live.coalesce(nOut)
    commit(spark, root, packed, readVersion = cur,
      maxRetries = maxRetries, statsCols = statsCols)
  }

  // ---- CHECK constraints -------------------------------------------
  //
  // Table-level row invariants enforced at commit time, validated
  // against the STAGED files (the exact bytes about to publish, still
  // in page cache) so no violating version can ever become readable.
  // Stored one file per constraint under `_constraints/` — table
  // metadata, not version metadata, so they apply to every subsequent
  // commit until dropped.

  /** A commit's staged data violated a CHECK constraint; nothing was
    * published.
    */
  final class ConstraintViolation(msg: String) extends RuntimeException(msg)

  private def constraintsDir(root: String) = Paths.get(root, "_constraints")

  def addConstraint(root: String, name: String, sqlExpr: String): Unit = {
    require(name.matches("[A-Za-z0-9_-]+"), s"invalid constraint name '$name'")
    Files.createDirectories(constraintsDir(root))
    Files.writeString(constraintsDir(root).resolve(name), sqlExpr)
  }

  def dropConstraint(root: String, name: String): Unit = {
    Files.deleteIfExists(constraintsDir(root).resolve(name)); ()
  }

  /** The table's CHECK constraints, name → SQL predicate. */
  def constraints(root: String): Map[String, String] = {
    val dir = constraintsDir(root)
    if (!Files.exists(dir)) Map.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(p => p.getFileName.toString -> Files.readString(p).trim)
        .toMap
      finally s.close()
    }
  }

  /** Throws [[ConstraintViolation]] if any staged LIVE row fails a
    * CHECK predicate (null counts as failure, as in SQL `CHECK` the
    * constraint must be TRUE). One filtered count per constraint over
    * the staged files; a staged `_dv` sidecar (restore of a
    * DV-carrying version) is applied first so only visible rows are
    * judged.
    */
  private def validateConstraints(spark: SparkSession, root: String,
      staged: Path): Unit = {
    import org.apache.spark.sql.functions.{coalesce => fnCoalesce, expr, lit, not}
    val cs = constraints(root)
    if (cs.isEmpty) return
    val df = applyDv(spark, staged, spark.read.parquet(staged.toString))
    cs.foreach { case (name, sql) =>
      val bad = df.filter(not(fnCoalesce(expr(sql), lit(false)))).count()
      if (bad > 0)
        throw new ConstraintViolation(
          s"CHECK constraint '$name' ($sql) violated by $bad staged row(s); commit aborted")
    }
  }

  // ---- file-level stats manifest (manifest data skipping) ----------
  //
  // What Delta/Iceberg add beyond the commit protocol is MANIFEST
  // data skipping: per-file min/max column stats recorded at commit
  // time, so a selective read opens only the files whose range can
  // match — before any parquet footer is touched. Same idea here:
  // `commit(statsCols = ...)` computes per-file min/max for the named
  // columns from the STAGED files (one aggregate over data just
  // written and still in page cache; |files| rows to the driver — the
  // same small-by-construction collect contract as ParquetDml's
  // partition listing) into `_stats.json` INSIDE the staging dir, so
  // it publishes atomically with the version rename and is invisible
  // to readers (underscore-prefixed files are hidden from Spark's
  // parquet listing). `readPruned` consults it and hands Spark only
  // the surviving files. At 100 TB this is the difference between
  // listing 10⁶ footers and opening the 3 files a key-range probe
  // needs.

  private def statsFile(dir: Path) = dir.resolve("_stats.json")

  /** Per-file min/max for `cols`, one tab-separated line per
    * (file, col): `fileName  col  min  max` (values as strings, "\0N"
    * for an all-null file). File names are stored basename-only —
    * the directory is renamed at publish.
    */
  private def writeStats(spark: SparkSession, staged: Path, cols: Seq[String]): Unit = {
    Files.writeString(statsFile(staged),
      statsBody(spark, Seq(staged.toString), cols))
    ()
  }

  /** The stats manifest lines for exactly `srcs` (a whole staged dir
    * or an explicit file subset — the fast path computes stats for
    * its NEW files only and carries the linked files' lines).
    */
  private def statsBody(spark: SparkSession, srcs: Seq[String],
      cols: Seq[String]): String = {
    import org.apache.spark.sql.functions.{col => c, input_file_name, max => mx, min => mn}
    val aggs = cols.flatMap(n => Seq(
      mn(c(n)).cast("string").as(s"min:$n"), mx(c(n)).cast("string").as(s"max:$n")))
    val rows = spark.read.parquet(srcs: _*)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val sb = new StringBuilder
    rows.foreach { r =>
      val file = Paths.get(new java.net.URI(r.getString(0)).getPath)
        .getFileName.toString
      cols.zipWithIndex.foreach { case (n, i) =>
        val lo = Option(r.get(1 + 2 * i)).map(v => escapeVal(v.toString)).getOrElse("\\0N")
        val hi = Option(r.get(2 + 2 * i)).map(v => escapeVal(v.toString)).getOrElse("\\0N")
        sb.append(s"$file\t$n\t$lo\t$hi\n")
      }
    }
    sb.toString
  }

  // ---- value-set skipping (point-lookup pruning) -------------------
  //
  // Min/max ranges cannot prune a point probe on a column whose
  // values interleave across files (every range contains the key).
  // Value-set skipping is the exact-dictionary complement: at commit
  // time, files whose per-column distinct-value count fits a cap
  // record the full value set in `_sets.json`; a `column = value`
  // probe then opens only the files whose set contains the value.
  // Files over the cap record OVERFLOW and are always kept —
  // pruning stays an optimization, never a correctness filter. This
  // is the parquet-dictionary / bloom-filter idea at manifest level:
  // at 100 TB a point lookup opens |files-holding-key| files instead
  // of every file whose min..max straddles it.

  private def setsFile(dir: Path) = dir.resolve("_sets.json")
  private val setsOverflow = "\\0OVERFLOW"
  private val setsSep: Char = '\u0001'

  // TSV-framing escape for USER DATA VALUES in the stats/sets
  // manifests (both files are tab/newline-framed despite the
  // historical .json names). Unescaped, a string value containing a
  // newline would split its line in two: the first half parses as a
  // VALID line with a truncated value set, so a probe for the full
  // value wrongly prunes a file that contains it -- pruning must stay
  // an optimization, never a correctness filter. Escaping makes the
  // framing injective; the `\0N` / `\0OVERFLOW` sentinels stay
  // unambiguous because a real leading backslash escapes to `\\`.
  /** Render a partition VALUE as its token text. Float/Double go
    * through their IEEE-754 bit pattern (hex) instead of toString:
    * JDK 19 changed Double.toString to shortest-representation, so a
    * toString token minted on JDK<=18 would not equal the token the
    * same logical value mints on JDK>=19 — the kept-files filter
    * would then keep the old file AND write the new slice,
    * duplicating that partition's rows on the fast path (the exact
    * failure mode BinaryType is excluded for). Bits are value-based
    * and JVM-version-stable. NaN canonicalizes via floatToIntBits /
    * doubleToLongBits (all NaN payloads are one partition under
    * Spark's <=>), and -0.0 canonicalizes to 0.0 (Spark normalizes
    * signed zero in comparisons, so both zeros are one partition).
    * Tables partitioned on float/double BEFORE this change carry
    * toString tokens; rewrite them (one full commit) before slicing
    * them again — mixed-format tokens for one column never match, so
    * the fast path would duplicate rows.
    */
  private def tokenRender(v: Any): String = v match {
    case f: java.lang.Float =>
      val c = if (f.floatValue() == 0.0f) 0.0f else f.floatValue()
      "f" + Integer.toHexString(java.lang.Float.floatToIntBits(c))
    case d: java.lang.Double =>
      val c = if (d.doubleValue() == 0.0d) 0.0d else d.doubleValue()
      "d" + java.lang.Long.toHexString(java.lang.Double.doubleToLongBits(c))
    case other => other.toString
  }

  private[sources] def escapeVal(s: String): String = s.flatMap {
    case '\\'      => "\\\\"
    case '\t'      => "\\t"
    case '\n'      => "\\n"
    case '\r'      => "\\r"
    case `setsSep` => "\\x01"
    case c         => c.toString
  }
  private def unescapeVal(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => sb.append('\\'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 'x' if s.startsWith("\\x01", i) => sb.append(setsSep); i += 4
          case _    => sb.append(s.charAt(i)); i += 1 // lone backslash (sentinels)
        }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private def writeSets(spark: SparkSession, staged: Path, cols: Seq[String],
      cap: Int): Unit = {
    Files.writeString(setsFile(staged),
      setsBody(spark, Seq(staged.toString), cols, cap))
    ()
  }

  /** The value-set manifest lines for exactly `srcs` (see
    * [[statsBody]] for why the source set is explicit).
    */
  private def setsBody(spark: SparkSession, srcs: Seq[String],
      cols: Seq[String], cap: Int): String = {
    import org.apache.spark.sql.functions.{col => c, countDistinct, input_file_name}
    val df = spark.read.parquet(srcs: _*)
    val sb = new StringBuilder
    cols.foreach { n =>
      // two passes, both small-by-construction: distinct counts per
      // file first, then the value lists only for files under cap
      // (collect_set on an over-cap file would buffer unboundedly)
      val counts = df.groupBy(input_file_name().as("file"))
        .agg(countDistinct(c(n)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val under = counts.filter(_._2 <= cap).keySet
      val values: Map[String, Seq[String]] =
        if (under.isEmpty) Map.empty
        else df.select(input_file_name().as("file"), c(n).cast("string").as("v"))
          .filter(c("file").isin(under.toSeq: _*))
          .distinct().collect()
          .groupBy(_.getString(0))
          .map { case (f, rows) =>
            f -> rows.map(r => Option(r.getString(1)).map(escapeVal)
              .getOrElse("\\0N")).toSeq.sorted
          }
      counts.keys.foreach { uri =>
        val file = Paths.get(new java.net.URI(uri).getPath).getFileName.toString
        val payload =
          if (under(uri)) values.getOrElse(uri, Nil).mkString(setsSep.toString)
          else setsOverflow
        sb.append(s"$file\t$n\t$payload\n")
      }
    }
    sb.toString
  }

  // ---- bloom-filter skipping (high-cardinality point pruning) ------
  //
  // The value-set sidecar is exact but capped: files past `setCap`
  // distinct values record OVERFLOW and every point probe keeps them.
  // The bloom sidecar (`_bloom.json`, see sources/BloomSidecar) covers
  // exactly that regime — a fixed-size per-(file, column) bit array
  // with no false negatives — so `pruneFilesEq` stays useful on
  // non-clustered high-cardinality columns (IDs, hashes) where at
  // 100 TB the set cap is always exceeded. Probes consult the set
  // first (exact), and fall through to the bloom only for files whose
  // set is OVERFLOW or absent.

  private def bloomFile(dir: Path) = dir.resolve("_bloom.json")

  private def writeBlooms(spark: SparkSession, staged: Path,
      cols: Seq[String], fpp: Double): Unit = {
    Files.writeString(bloomFile(staged),
      bloomBody(spark, Seq(staged.toString), cols, fpp))
    ()
  }

  /** The bloom manifest lines for exactly `srcs` (explicit source set,
    * same contract as [[statsBody]]): `file \t col \t m:k:base64`.
    * Two passes per column, both bounded: per-file distinct counts
    * size the filters (one metadata-sized collect), then one
    * map-side-combined aggregate ORs each file's value hashes into an
    * `m`-bit buffer — the shuffle moves |files| buffers, never rows.
    */
  private def bloomBody(spark: SparkSession, srcs: Seq[String],
      cols: Seq[String], fpp: Double): String = {
    import org.apache.spark.sql.functions.{col => c, countDistinct, input_file_name, udaf}
    import org.apache.spark.sql.Encoders
    val df = spark.read.parquet(srcs: _*)
    val sb = new StringBuilder
    cols.foreach { n =>
      val counts = df.groupBy(input_file_name().as("file"))
        .agg(countDistinct(c(n)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      if (counts.nonEmpty) {
        // one (m, k) per column, sized for the LARGEST file so no
        // file's realized fpp exceeds the request (post-OPTIMIZE files
        // are near-uniform; smaller files just get a sparser filter)
        val (m, k) = BloomSidecar.size(counts.map(_._2).max, fpp)
        val agg = udaf(new BloomSidecar.BloomAgg(m, k), Encoders.STRING)
        val rows = df
          .select(input_file_name().as("file"), c(n).cast("string").as("v"))
          .groupBy(c("file")).agg(agg(c("v")).as("bits")).collect()
        rows.foreach { r =>
          val file = Paths.get(new java.net.URI(r.getString(0)).getPath)
            .getFileName.toString
          val bytes = r.getAs[Array[Byte]](1)
          val bb = java.nio.ByteBuffer.wrap(bytes)
          val longs = Array.fill(bytes.length / 8)(bb.getLong)
          sb.append(s"$file\t$n\t${BloomSidecar.encode(longs, m, k)}\n")
        }
      }
    }
    sb.toString
  }

  /** Driver-side bloom slice for one column of one version directory:
    * file → (m, k, bits). Absent manifest or malformed lines read as
    * "no filter" (callers keep those files conservatively).
    */
  private def loadBlooms(dir: Path,
      column: String): Map[String, (Int, Int, Array[Long])] = {
    val bf = bloomFile(dir)
    if (!Files.exists(bf)) Map.empty
    else Files.readString(bf).linesIterator.flatMap { line =>
      line.split('\t') match {
        case Array(f, cName, payload) if cName == column =>
          BloomSidecar.decode(payload).map(f -> _)
        case _ => None
      }
    }.toMap
  }

  /** Files of version `v` that can hold rows with `column = value`
    * according to the value-set manifest. Files with OVERFLOW, no
    * set line, or a table committed without sets are kept — unless a
    * bloom sidecar covers them, in which case the bloom's
    * no-false-negative `mightContain` decides. Returns full paths.
    */
  def pruneFilesEq(spark: SparkSession, root: String, column: String,
      value: String, version: Int = -1): Seq[String] = {
    val cur = currentVersion(root)
    val v = if (version > 0) version else cur
    require(v > 0 && v <= cur, s"version $v is not committed (latest is $cur)")
    val dir = Paths.get(root, s"v=$v")
    val all = {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        .toVector.sorted
      finally s.close()
    }
    val blooms = loadBlooms(dir, column)
    def bloomKeep(f: String): Boolean = blooms.get(f) match {
      case Some((m, k, bits)) => BloomSidecar.mightContain(bits, m, k, value)
      case None => true // no filter for this file: keep
    }
    val sf = setsFile(dir)
    if (!Files.exists(sf))
      return all.filter(bloomKeep).map(n => s"$root/v=$v/$n")
    val sets: Map[String, String] =
      Files.readString(sf).linesIterator.flatMap { line =>
        line.split('\t') match {
          case Array(f, cName, payload) if cName == column => Some(f -> payload)
          case Array(f, cName) if cName == column => Some(f -> "") // empty set
          case _ => None
        }
      }.toMap
    all.filter { f =>
      sets.get(f) match {
        case Some(p) if p == setsOverflow => bloomKeep(f)
        case Some(p) => p.split(setsSep).contains(escapeVal(value))
        case None => bloomKeep(f) // no set line for this file
      }
    }.map(n => s"$root/v=$v/$n")
  }

  /** Point-lookup read through the value-set manifest: open only the
    * files whose dictionary holds the value, then apply the residual
    * equality filter (and any deletion vectors). Exactly
    * `read(...).filter(column = value)`.
    */
  def readPoint(spark: SparkSession, root: String, column: String,
      value: String, version: Int = -1): DataFrame =
    readPointAll(spark, root, Seq(column -> value), version)

  /** Conjunctive point-lookup read: every (column, value) equality at
    * once, opening only the files that survive EVERY predicate's
    * sidecar pruning (set/bloom per column, intersected). Exactly
    * `read(...).filter(c1 = v1 AND c2 = v2 AND ...)`. This is the
    * compound-probe primitive for tables laid out on one column and
    * bloom-indexed on another (e.g. an inverted text index bucketed
    * by token hash with per-file token blooms: the bucket set prunes
    * to the slice, the token bloom prunes within it).
    */
  def readPointAll(spark: SparkSession, root: String,
      preds: Seq[(String, String)], version: Int = -1): DataFrame = {
    import org.apache.spark.sql.functions.{col => c, lit}
    require(preds.nonEmpty, "readPointAll needs at least one predicate")
    val cur = currentVersion(root)
    val v = if (version > 0) version else cur
    val files = preds
      .map { case (column, value) =>
        pruneFilesEq(spark, root, column, value, v).toSet
      }
      .reduce(_ intersect _)
    if (files.isEmpty)
      read(spark, root, v).filter(lit(false))
    else {
      val residual = preds
        .map { case (column, value) => c(column).cast("string") === value }
        .reduce(_ && _)
      applyDv(spark, Paths.get(root, s"v=$v"),
        spark.read.parquet(files.toSeq.sorted: _*))
        .filter(residual)
    }
  }

  /** Files of version `v` whose [min,max] range for `column` can
    * intersect [lo, hi] (numeric compare when `numeric`, else
    * lexicographic). Files without a stats line — or a table
    * committed without stats at all — are kept: pruning is an
    * optimization, never a correctness filter. Returns full paths.
    */
  def pruneFiles(spark: SparkSession, root: String, column: String,
      lo: String, hi: String, numeric: Boolean = true,
      version: Int = -1): Seq[String] = {
    val cur = currentVersion(root)
    val v = if (version > 0) version else cur
    require(v > 0 && v <= cur, s"version $v is not committed (latest is $cur)")
    val dir = Paths.get(root, s"v=$v")
    val all = {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        .toVector.sorted
      finally s.close()
    }
    val sf = statsFile(dir)
    if (!Files.exists(sf)) return all.map(n => s"$root/v=$v/$n")
    // ranges: file -> (min, max) for the requested column, if present
    val ranges: Map[String, (String, String)] =
      Files.readString(sf).linesIterator.flatMap { line =>
        line.split('\t') match {
          case Array(f, c, mnV, mxV) if c == column => Some(f -> (mnV, mxV))
          case _ => None
        }
      }.toMap
    def le(a: String, b: String): Boolean =
      if (!numeric) a <= b
      else (a.toDoubleOption, b.toDoubleOption) match {
        case (Some(x), Some(y)) => x <= y
        case _ => true // unparsable stat: conservative keep
      }
    all.filter { f =>
      ranges.get(f) match {
        case Some((mnV, mxV)) =>
          if (mnV == "\\0N" || mxV == "\\0N") true // all-null file: keep
          // range intersects [lo, hi] (stored stats are frame-escaped)
          else le(lo, unescapeVal(mxV)) && le(unescapeVal(mnV), hi)
        case None => true // no stats line for this file: keep
      }
    }.map(n => s"$root/v=$v/$n")
  }

  /** Range-probe read through the stats manifest: open only the
    * files whose stats range can match, then apply the residual
    * BETWEEN filter (kept files may still carry non-matching rows).
    * Exactly `read(...).filter(column between lo and hi)` — proven
    * by SnapshotStatsSpec — but touching a fraction of the files.
    */
  def readPruned(spark: SparkSession, root: String, column: String,
      lo: String, hi: String, numeric: Boolean = true,
      version: Int = -1): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    val files = pruneFiles(spark, root, column, lo, hi, numeric, version)
    val typed =
      if (numeric) c(column).cast("double").between(lo.toDouble, hi.toDouble)
      else c(column).between(lo, hi)
    if (files.isEmpty) {
      // every file pruned: empty result with the table's schema
      read(spark, root, version).filter(org.apache.spark.sql.functions.lit(false))
    } else {
      // deletion vectors apply to the surviving files too (the DV
      // join keys on file_name, so a file subset is fine)
      val cur = currentVersion(root)
      val v = if (version > 0) version else cur
      applyDv(spark, Paths.get(root, s"v=$v"),
        spark.read.parquet(files: _*)).filter(typed)
    }
  }

  /** The stats manifest as a queryable DataFrame — (file, column,
    * min, max, bytes) per data file of the version; the `describe
    * detail` surface for layout debugging ("which files would this
    * probe open?") without touching any parquet footer.
    */
  def statsTable(spark: SparkSession, root: String, version: Int = -1): DataFrame = {
    import spark.implicits._
    val cur = currentVersion(root)
    val v = if (version > 0) version else cur
    require(v > 0 && v <= cur, s"version $v is not committed (latest is $cur)")
    val dir = Paths.get(root, s"v=$v")
    val sf = statsFile(dir)
    val rows: Seq[(String, String, String, String, Long)] =
      if (!Files.exists(sf)) Nil
      else Files.readString(sf).linesIterator.flatMap { line =>
        line.split('\t') match {
          case Array(f, c, mnV, mxV) =>
            val sz = try Files.size(dir.resolve(f)) catch { case _: Exception => -1L }
            Some((f, c, unescapeVal(mnV), unescapeVal(mxV), sz))
          case _ => None
        }
      }.toSeq
    rows.toDF("file", "column", "min", "max", "bytes")
  }

  /** Driver-only stats-manifest slice: file → (min, max) for one
    * column of one version — the map [[pruneFiles]] builds internally,
    * exposed so per-batch probes (BandHistory) can memoize it per
    * (root, version) instead of re-collecting [[statsTable]] (which
    * also stats every data file's size) on every call. Zero Spark
    * jobs; an absent manifest is the empty map (callers keep files
    * conservatively).
    */
  private[sources] def statsRanges(root: String, column: String,
      version: Int): Map[String, (String, String)] = {
    val dir = Paths.get(root, s"v=$version")
    val sf = statsFile(dir)
    if (!Files.exists(sf)) Map.empty
    else Files.readString(sf).linesIterator.flatMap { line =>
      line.split('\t') match {
        case Array(f, c, mnV, mxV) if c == column =>
          Some(f -> (unescapeVal(mnV), unescapeVal(mxV)))
        case _ => None
      }
    }.toMap
  }

  // ---- change data feed --------------------------------------------

  /** Row-level changes between two committed versions, bag
    * semantics: rows only in `toV` are inserts, rows only in `fromV`
    * are deletes (exceptAll preserves multiplicity — two identical
    * new rows are two inserts). With no key contract an update reads
    * as delete+insert; `changesByKey` refines that. Incremental
    * consumers read `changes(v-1, v)` per commit — the CDC feed a
    * transactional format derives from its log, reconstructed here
    * from the immutable version directories.
    */
  def changes(spark: SparkSession, root: String, fromV: Int, toV: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val a = read(spark, root, fromV)
    val bRaw = read(spark, root, toV)
    // exceptAll/unionAll pair rows POSITIONALLY; align BOTH versions
    // to one column list by NAME first, so a version whose physical
    // column order drifted (e.g. a pre-fix mergeByKey moved key
    // columns to the front) can never mis-pair columns into
    // silently-wrong change rows. Across a schema-EVOLUTION boundary
    // (additive merge, or a restore past one) the alignment target is
    // the UNION of both column sets with typed nulls for the side
    // missing a column — a row whose new column went null→value then
    // reads as delete+insert, which is exactly what changed.
    val aligned = alignVersions(a, bRaw, "changes()")
    val (av, bv) = aligned
    bv.exceptAll(av).withColumn("_change_type", lit("insert"))
      .unionAll(av.exceptAll(bv).withColumn("_change_type", lit("delete")))
  }

  /** Align two versions of a table to one column list (the older
    * side's order, then columns only the newer side has), with typed
    * null literals where a side lacks a column. Shared columns must
    * agree on type — a same-name type change is genuine corruption,
    * not evolution, and fails loudly.
    */
  private def alignVersions(a: DataFrame, b: DataFrame,
      op: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, lit}
    for (f <- a.schema if b.columns.contains(f.name)) {
      val bt = b.schema(f.name).dataType
      require(bt == f.dataType,
        s"$op: column ${f.name} changed type ${f.dataType} -> $bt " +
          "between versions; cannot align")
    }
    val all = a.columns ++ b.columns.filterNot(a.columns.contains)
    def align(df: DataFrame, other: DataFrame): DataFrame =
      df.select(all.map { c =>
        if (df.columns.contains(c)) col(c)
        else lit(null).cast(other.schema(c).dataType).as(c)
      }.toSeq: _*)
    (align(a, b), align(b, a))
  }

  /** Keyed change feed: classify by `keyCols` into insert / delete /
    * update_preimage+update_postimage (key present in both versions
    * with any non-key column changed). One full-outer join on the
    * key; row equality via null-safe struct compare. Key columns
    * must be unique per version for the pre/post pairing to be
    * 1:1 — the usual CDC primary-key contract.
    */
  def changesByKey(spark: SparkSession, root: String,
      fromV: Int, toV: Int, keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, struct}
    val aRaw = read(spark, root, fromV)
    val bRaw = read(spark, root, toV)
    require(keyCols.forall(k =>
      aRaw.columns.contains(k) && bRaw.columns.contains(k)),
      s"changesByKey: key columns $keyCols must exist in both versions")
    // union-of-columns alignment, same contract as changes(): across
    // an additive evolution boundary the pre/postimages carry the
    // union schema with typed nulls for the missing side
    val (a, b) = alignVersions(aRaw, bRaw, "changesByKey()")
    val cols = a.columns.toSeq
    val onKeys = keyCols.map(k => col(s"a.$k") <=> col(s"b.$k")).reduce(_ && _)
    val j = a.as("a").join(b.as("b"), onKeys, "full_outer")
    val aKey = col(s"a.${keyCols.head}")
    val bKey = col(s"b.${keyCols.head}")
    val aRow = struct(cols.map(c => col(s"a.$c")): _*)
    val bRow = struct(cols.map(c => col(s"b.$c")): _*)
    val inserts = j.filter(aKey.isNull && bKey.isNotNull)
      .select(cols.map(c => col(s"b.$c")) :+ lit("insert").as("_change_type"): _*)
    val deletes = j.filter(aKey.isNotNull && bKey.isNull)
      .select(cols.map(c => col(s"a.$c")) :+ lit("delete").as("_change_type"): _*)
    val updated = j.filter(aKey.isNotNull && bKey.isNotNull && !(aRow <=> bRow))
    val pre = updated
      .select(cols.map(c => col(s"a.$c")) :+ lit("update_preimage").as("_change_type"): _*)
    val post = updated
      .select(cols.map(c => col(s"b.$c")) :+ lit("update_postimage").as("_change_type"): _*)
    inserts.unionAll(deletes).unionAll(pre).unionAll(post)
  }

  // ---- streaming change feed ---------------------------------------
  //
  // The batch feed above answers "what changed between v_a and v_b";
  // what a transactional format adds on top is a CONTINUOUS source —
  // `spark.readStream` over the table's change log, so a downstream
  // pipeline (incremental view, search-index sync, replication) keeps
  // up with commits without rescanning snapshots. Spark-first shape:
  // instead of a custom DataSourceV2, each commit's change batch is
  // MATERIALIZED once into `root/_cdc/commit_version=N/` via an atomic
  // directory rename, and the feed is the built-in parquet
  // FileStreamSource over `_cdc` — new commits appear as new files,
  // exactly-once file tracking, checkpointing and recovery all come
  // from Structured Streaming for free. The partition directory name
  // doubles as the `commit_version` column, so consumers can order or
  // window the feed by commit without any extra bookkeeping.

  private def cdcDir(root: String) = Paths.get(root, "_cdc")

  /** Versions whose change batch is already published under `_cdc`. */
  def publishedChangeVersions(root: String): Seq[Int] = {
    val dir = cdcDir(root)
    if (!Files.exists(dir)) Nil
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("commit_version=") =>
        s.stripPrefix("commit_version=").toInt }
      .toSeq.sorted
  }

  /** Materialize the change batch of every committed-but-unpublished
    * version into the CDC directory. Version 1 publishes as an
    * all-insert batch (the table's initial content IS its first
    * change set); later versions use the keyed feed when `keyCols` is
    * given, else the bag-semantics row feed. Each batch is written to
    * a writer-unique staging dir and atomically renamed into place, so
    * a concurrent streaming reader sees a commit's files all-or-
    * nothing, and concurrent publishers racing on the same version
    * resolve by first-rename-wins (the loser discards its copy — both
    * computed identical content from immutable version directories).
    * Requires a stable schema across published versions (same contract
    * as `changesByKey`). Cost ∝ changed data, not table size, except
    * the two-snapshot diff itself — a format with a row-level log
    * would read the log; reconstructing from immutable snapshots is
    * the price of keeping plain parquet underneath.
    *
    * @return versions published by THIS call (empty = already current)
    */
  def publishChanges(spark: SparkSession, root: String,
      keyCols: Seq[String] = Nil): Seq[Int] = {
    import org.apache.spark.sql.functions.lit
    val cur = currentVersion(root)
    require(cur > 0, s"no committed version at $root")
    val dir = cdcDir(root)
    Files.createDirectories(dir)
    val have = publishedChangeVersions(root).toSet
    val todo = (1 to cur).filterNot(have)
    val won = todo.filter { v =>
      val feed =
        if (v == 1) read(spark, root, 1).withColumn("_change_type", lit("insert"))
        else if (keyCols.nonEmpty) changesByKey(spark, root, v - 1, v, keyCols)
        else changes(spark, root, v - 1, v)
      val stage = dir.resolve(
        s".stage-$v-${java.util.UUID.randomUUID().toString}")
      feed.write.mode("overwrite").parquet(stage.toString)
      try {
        Files.move(stage, dir.resolve(s"commit_version=$v"),
          StandardCopyOption.ATOMIC_MOVE)
        true
      } catch {
        // a concurrent publisher landed this version first; identical
        // content, so dropping our copy loses nothing
        case _: FileAlreadyExistsException => deleteTree(stage); false
        case _: java.nio.file.DirectoryNotEmptyException => deleteTree(stage); false
      }
    }
    won
  }

  /** The full published feed as a batch DataFrame (commit_version is
    * the partition column — filter on it for a version range and the
    * scan prunes to those directories).
    */
  def readChanges(spark: SparkSession, root: String): DataFrame = {
    require(publishedChangeVersions(root).nonEmpty,
      s"no published change batches at $root — call publishChanges first")
    spark.read.parquet(cdcDir(root).toString)
  }

  /** Continuous CDC tail: a streaming DataFrame over the published
    * change directory. Each `publishChanges` after a commit surfaces
    * that commit's rows in the next micro-batch; `_change_type` and
    * `commit_version` columns ride along. File-arrival order inside a
    * micro-batch is not commit order — consumers needing strict order
    * sort or window by `commit_version`. At least one batch must be
    * published first (the file source needs a schema, read from the
    * feed itself so it always matches what was published).
    */
  def streamChanges(spark: SparkSession, root: String): DataFrame = {
    val schema = readChanges(spark, root).schema
    spark.readStream.schema(schema).parquet(cdcDir(root).toString)
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
    dropped.foreach(v => deleteTree(Paths.get(root, s"v=$v")))
    dropped
  }

  private[graft] def deleteTree(dir: Path): Unit = {
    if (Files.exists(dir)) {
      val walk = Files.walk(dir) // stream holds a directory fd — close it
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally walk.close()
    }
  }
}

/** One table's contribution to a cross-table transaction.
  *
  * @param partitions  partition values this write rewrites; empty =
  *                    whole table (same contract as SnapshotTable.commit)
  * @param readVersion snapshot version the DataFrame was derived from;
  *                    -1 = blind write (never conflicts, only rebases)
  */
/** One table's write inside a [[SnapshotTransaction.commitAll]].
  *
  * `appendFiles = true` (r15) stages the new version as HARD LINKS of
  * the current version's data files (plus its `_dv`/`_schema.json`
  * sidecars) with only `df`'s rows written as new files — an APPEND
  * whose staging cost is ∝ batch + |files| link metadata ops, never
  * the table (the property that makes a per-micro-batch transactional
  * sink viable at 100 TB). The linked base version becomes the
  * write's readVersion (unless one was given), and the write declares
  * the full table, so ANY commit landing after the link invalidates
  * the composition and the transaction aborts with a conflict rather
  * than publishing stale bytes. With `appendFiles = false` (default)
  * `df` is the complete next content, as in single-table [[SnapshotTable.commit]].
  *
  * `sliceCol = Some(col)` (r16) stages a PARTITION-SLICED
  * read-modify-write — the transactional twin of
  * [[SnapshotTable.commitPartitions]]: `df` holds only the touched
  * partitions' complete new rows; untouched partitions carry forward
  * from the published head (hard links on the partmap fast path), and
  * the conflict manifest claims only the touched partition tokens.
  * `setCols`/`setCap`/`bloomCols`/`bloomFpp` request pruning sidecars
  * exactly as in commitPartitions. Because composition reads ONLY
  * published data, the claimed slot must be contiguous with the
  * composed base; a concurrent claim in between aborts the whole
  * transaction with [[SnapshotTable.SnapshotConflict]] (re-read and
  * re-derive) rather than silently dropping the in-flight writer's
  * rows. Mutually exclusive with `appendFiles`.
  */
final case class TableWrite(root: String, df: DataFrame,
    partitions: Seq[String] = Nil, readVersion: Int = -1,
    appendFiles: Boolean = false,
    sliceCol: Option[String] = None,
    setCols: Seq[String] = Nil, setCap: Int = 1024,
    bloomCols: Seq[String] = Nil, bloomFpp: Double = 0.01)

/** Cross-table transactions over [[SnapshotTable]] — the piece even
  * most production formats lack (Delta/Iceberg commit one table at a
  * time). All-or-nothing durability via write-ahead intent:
  *
  *   1. STAGE every table's data (the expensive, lock-free step);
  *   2. CLAIM every table's next version slot with the same
  *      createLink CAS single-table commits use, conflict-checking
  *      each table against its declared readVersion. Any claim or
  *      conflict failure rolls back all claims already taken — no
  *      pointer has moved, so nothing was ever visible;
  *   3. write the transaction INTENT record (root, version, staging
  *      path per table) to `txnDir/txn-<uuid>.staged`, then atomically
  *      rename it to `.decided` — this rename is the commit point:
  *      before it, recovery rolls the transaction back; after it,
  *      recovery rolls it forward;
  *   4. PUBLISH: rename each staging dir to `v=N` and advance each
  *      reader pointer; delete the record when all tables are live.
  *
  * Data directories are renamed into place only AFTER the decision
  * point, so an undecided transaction's data can never become
  * reader-visible — even if an unrelated later commit pushes a
  * table's pointer past our claimed slot, `read` of that version
  * fails loudly as "never committed" rather than surfacing orphan
  * data. Visibility across tables is near-atomic, not atomic: during
  * step 4 a reader can observe table A at its new version while B's
  * pointer has not flipped yet (the classic 2PC visibility window).
  * Readers needing a consistent cross-table view pin the version
  * vector `commitAll` returns and time-travel-read it — snapshots are
  * immutable, so that view stays consistent forever.
  *
  * Crash recovery ([[recover]]) scans the transaction log: `.staged`
  * records roll back (delete stagings and claimed markers — claims
  * above the pointer are invisible dead weight otherwise), `.decided`
  * records roll forward (finish the renames and pointer flips —
  * idempotent, so recovering twice is safe).
  *
  * At 100 TB the cost profile matches single-table commits: staging
  * is proportional to data written, and steps 2-4 are a handful of
  * metadata operations per table regardless of data size.
  */
object SnapshotTransaction {
  import SnapshotTable._

  /** Deterministic fault injection for crash-recovery tests: invoked
    * with a checkpoint name at each protocol boundary; a test hook
    * that throws [[SimulatedCrash]] simulates a process death at
    * exactly that point — cleanup handlers rethrow it WITHOUT running
    * (a real crash runs nothing), leaving the on-disk state for
    * [[recover]] to repair.
    */
  @volatile private[graft] var failpoint: String => Unit = _ => ()

  /** See [[failpoint]]. */
  private[graft] final case class SimulatedCrash(at: String) extends Error(at)

  /** Atomically commit every write in `writes`; returns the committed
    * version vector (root → version). Throws [[SnapshotTable.SnapshotConflict]]
    * (after rolling back all claims) if any table's conflict check or
    * slot race fails.
    */
  def commitAll(spark: SparkSession, txnDir: String,
      writes: Seq[TableWrite], maxRetries: Int = 10): Map[String, Int] = {
    require(writes.nonEmpty, "empty transaction")
    require(writes.map(_.root).distinct.size == writes.size,
      "a transaction may write each table at most once")
    Files.createDirectories(Paths.get(txnDir))
    // ---- 1. stage (expensive, no locks, writer-unique names) -------
    val staged = writes.sortBy(_.root).map { w0 =>
      require(!(w0.appendFiles && w0.sliceCol.isDefined),
        s"${w0.root}: appendFiles and sliceCol are mutually exclusive")
      Files.createDirectories(Paths.get(w0.root, "_staging"))
      Files.createDirectories(Paths.get(w0.root, "_log"))
      val staging = Paths.get(w0.root, "_staging",
        java.util.UUID.randomUUID().toString)
      if (w0.sliceCol.isDefined) {
        // partition-sliced staging (r16): compose (published head minus
        // touched partitions) ∪ df exactly like commitPartitions —
        // partmap fast path, carried pruning sidecars, token manifest.
        // stagedBase records the composed-against version; the claim
        // phase enforces slot contiguity with it.
        val pcol = w0.sliceCol.get
        requireNoReservedColumns(w0.df)
        val (vals, tokenSafe, mine) = slicePreamble(w0.df, pcol, Nil)
        val base = currentVersion(w0.root)
        try composeSliceStaging(spark, w0.root, w0.df, pcol, vals, Nil,
          tokenSafe, mine, base, staging, Nil,
          w0.setCols, w0.setCap, w0.bloomCols, w0.bloomFpp)
        catch { case e: Throwable => deleteTree(staging); throw e }
        val w = if (w0.readVersion < 0) w0.copy(readVersion = base) else w0
        val manifestTmp = Paths.get(w.root, "_staging",
          staging.getFileName.toString + ".manifest")
        Files.writeString(manifestTmp, mine.toSeq.sorted.mkString("\n"))
        (w, staging, manifestTmp, mine, base)
      } else {
      val w =
        if (!w0.appendFiles) {
          w0.df.write.mode("overwrite").parquet(staging.toString)
          writeSchemaSidecar(staging, w0.df.schema)
          w0
        } else {
          // append staging: link the current version's files (and its
          // DV — linking data files without their deletion vector
          // would resurrect deleted rows), then write only the batch
          val base = currentVersion(w0.root)
          Files.createDirectories(staging)
          if (base > 0) {
            val curDir = Paths.get(w0.root, s"v=$base")
            listDataFiles(curDir).foreach(n =>
              Files.createLink(staging.resolve(n), curDir.resolve(n)))
            if (Files.exists(dvDir(curDir))) {
              Files.createDirectories(dvDir(staging))
              val s = Files.list(dvDir(curDir))
              try s.iterator().asScala.filter(Files.isRegularFile(_))
                .foreach(f => Files.createLink(
                  dvDir(staging).resolve(f.getFileName), f))
              finally s.close()
            }
            if (Files.exists(schemaFile(curDir)))
              Files.copy(schemaFile(curDir), schemaFile(staging))
          }
          w0.df.write.mode("append").parquet(staging.toString)
          if (!Files.exists(schemaFile(staging)))
            writeSchemaSidecar(staging, w0.df.schema)
          // the linked base is the version this composition is valid
          // against — any later commit must conflict the claim
          if (w0.readVersion < 0) w0.copy(readVersion = base) else w0
        }
      // escapeVal: SAME framing rule as single-table commit() — the
      // overlap check compares this set against claims written by
      // commit()/commitPartitions(), which escape; an unescaped token
      // here would never string-match an escaped claim for the same
      // partition (silent lost-update), and a newline-bearing token
      // would split this manifest into bogus entries. (Markers
      // written before escaping existed carry raw tokens; those only
      // under-match for values containing \ \t \n \r \x01, which no
      // pre-existing table of ours has — new tables are born escaped.)
      val mine: Set[String] =
        if (w.partitions.isEmpty) Set("*")
        else w.partitions.map(escapeVal).toSet
      val manifestTmp = Paths.get(w.root, "_staging",
        staging.getFileName.toString + ".manifest")
      Files.writeString(manifestTmp, mine.toSeq.sorted.mkString("\n"))
      (w, staging, manifestTmp, mine, -1)
      }
    }
    def dropStagings(): Unit = staged.foreach { case (_, s, m, _, _) =>
      deleteTree(s); Files.deleteIfExists(m); ()
    }
    // ---- 2. claim a slot per table (CAS + conflict check) ----------
    val claimed = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    def rollbackClaims(): Unit = claimed.foreach { case (root, v) =>
      backend.abortClaim(root, v)
    }
    val versions: Seq[(TableWrite, Path, Int)] =
      try staged.map { case (w, staging, manifestTmp, mine, stagedBase) =>
        var attempt = 0
        var slot = -1
        while (slot < 0) {
          val base = headVersion(w.root)
          if (w.readVersion >= 0) {
            ((w.readVersion + 1) to base)
              .find(v => overlaps(mine, touched(w.root, v)))
              .foreach { v =>
                throw new SnapshotConflict(
                  s"transaction write to ${w.root} based on " +
                    s"v${w.readVersion} conflicts with v$v")
              }
          }
          val next = base + 1
          // sliced staging composed untouched partitions from the
          // PUBLISHED head it read; a claim landing anywhere but the
          // very next slot means another writer is in flight whose
          // rows the composition cannot carry — abort rather than
          // publish a version missing them (commitPartitions' own
          // loop waits for contiguity; a multi-table transaction
          // cannot hold claims while waiting without deadlock risk,
          // so it surfaces the conflict for the caller to retry)
          if (stagedBase >= 0 && next != stagedBase + 1)
            throw new SnapshotConflict(
              s"sliced transaction write to ${w.root} composed against " +
                s"v$stagedBase but the next slot is v$next (concurrent " +
                "writer in flight); re-read and re-derive")
          if (backend.claim(w.root, next, manifestTmp)) {
            claimed += ((w.root, next))
            slot = next
          } else {
            attempt += 1
            if (attempt >= maxRetries)
              throw new SnapshotConflict(
                s"lost the claim race $maxRetries times at ${w.root}")
          }
        }
        (w, staging, slot)
      }
      catch {
        case e: Throwable => rollbackClaims(); dropStagings(); throw e
      }
    // ---- 3. durable intent, then the atomic decision point ---------
    val recId = java.util.UUID.randomUUID().toString
    val stagedRec = Paths.get(txnDir, s"txn-$recId.staged")
    val decidedRec = Paths.get(txnDir, s"txn-$recId.decided")
    try {
      Files.writeString(stagedRec, versions.map { case (w, staging, v) =>
        s"${w.root}\t$v\t$staging"
      }.mkString("\n"))
      failpoint("after-intent")
      Files.move(stagedRec, decidedRec, StandardCopyOption.ATOMIC_MOVE)
    } catch {
      case c: SimulatedCrash => throw c // test-only: die with state intact
      case e: Throwable =>
        // undecided: nothing visible yet — full rollback
        rollbackClaims(); dropStagings(); Files.deleteIfExists(stagedRec)
        throw e
    }
    // ---- 4. publish: decided, so failures roll FORWARD via recover —
    failpoint("after-decision")
    versions.foreach { case (w, staging, v) =>
      backend.publish(w.root, staging, v)
      failpoint("mid-publish")
      backend.advancePointer(w.root, v)
      Files.deleteIfExists(Paths.get(w.root, "_staging",
        staging.getFileName.toString + ".manifest"))
    }
    Files.deleteIfExists(decidedRec)
    // enrolled routing stats (advisory, after publish — same contract
    // as the single-table hooks): an append folds exactly its delta,
    // a full write recomputes
    versions.foreach { case (w, _, v) =>
      if (w.appendFiles)
        TableStats.maintainPartitionOverwrite(spark, w.root, v, w.df, None)
      else TableStats.maintainFull(spark, w.root, v)
    }
    versions.map { case (w, _, v) => w.root -> v }.toMap
  }

  /** Scan the transaction log and repair interrupted transactions:
    * `.staged` → roll back, `.decided` → roll forward. Idempotent.
    * Returns (rolledForward, rolledBack) transaction counts.
    */
  def recover(txnDir: String): (Int, Int) = {
    val dir = Paths.get(txnDir)
    if (!Files.isDirectory(dir)) return (0, 0)
    val recs = {
      val s = Files.list(dir)
      try s.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        n.startsWith("txn-") && (n.endsWith(".staged") || n.endsWith(".decided"))
      }.toVector
      finally s.close()
    }
    var fwd = 0
    var back = 0
    recs.foreach { rec =>
      val entries = Files.readString(rec).linesIterator.flatMap { line =>
        line.split('\t') match {
          case Array(root, v, staging) if v.toIntOption.isDefined =>
            Some((root, v.toInt, Paths.get(staging)))
          case _ => None
        }
      }.toVector
      if (rec.getFileName.toString.endsWith(".staged")) {
        // undecided: no data dir was ever renamed in — delete stagings
        // and dead claims, nothing was visible
        entries.foreach { case (root, v, staging) =>
          deleteTree(staging)
          Files.deleteIfExists(Paths.get(root, "_staging",
            staging.getFileName.toString + ".manifest"))
          Files.deleteIfExists(markerFile(root, v))
          ()
        }
        back += 1
      } else {
        // decided: finish what commitAll started, step by step
        entries.foreach { case (root, v, staging) =>
          val live = Paths.get(root, s"v=$v")
          if (!Files.exists(live) && Files.exists(staging))
            Files.move(staging, live, StandardCopyOption.ATOMIC_MOVE)
          if (Files.exists(live)) advancePointer(root, v)
          Files.deleteIfExists(Paths.get(root, "_staging",
            staging.getFileName.toString + ".manifest"))
          ()
        }
        fwd += 1
      }
      Files.deleteIfExists(rec)
    }
    (fwd, back)
  }
}

package graft.sources.avro

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming read over an Avro landing directory —
  * `spark.readStream.format("gavro").load(dir)` — the ingest edge a
  * large pipeline actually has (collectors drop Avro container files
  * into object storage; the pipeline tails the directory).
  *
  * Progress tracking mirrors Spark's own FileStreamSource design:
  * an append-only MANIFEST under the query checkpoint records, per
  * batch, the files first seen in that batch (path + size at
  * discovery). The offset is just the manifest length, so offsets
  * stay O(1) while the seen-set lives in the durable manifest — a
  * restart replays the manifest to rebuild it, and a batch re-plan
  * (recovery of an uncommitted batch) re-reads exactly the files its
  * manifest entry names. Files must be immutable once visible
  * (write-then-rename, which [[AvroBatchWrite]] itself does);
  * in-place appends to a visible file are NOT picked up.
  *
  * `maxFilesPerTrigger` (option) caps each batch's newly-admitted
  * files for backpressure; the remainder is admitted on subsequent
  * triggers (discovery order: modification time, then path).
  */
class AvroMicroBatchStream(path: String, tableSchema: StructType,
    required: StructType, checkpointLocation: String, maxFilesPerTrigger: Int,
    manifestCompactEvery: Int = 64)
    extends MicroBatchStream {

  private val conf: Configuration = AvroDataSource.hadoopConf()
  private val manifestDir = new Path(checkpointLocation, "graft-avro-manifest")
  private val fs = manifestDir.getFileSystem(conf)
  fs.mkdirs(manifestDir)

  // (path → size) of every file any manifest entry admitted; rebuilt
  // from the manifest on construction so restarts never re-admit.
  private val seen = mutable.LinkedHashMap.empty[String, Long]
  private var batches: Long = 0L
  // highest batch id folded into a `_compact_` snapshot (its
  // per-batch manifests are deleted; only COMMITTED batches are ever
  // folded, so batch recovery always finds its manifest)
  private var compactedThrough: Long = 0L
  rebuildFromManifest()

  private def manifestFile(batch: Long): Path =
    new Path(manifestDir, f"$batch%010d")
  private def compactFile(through: Long): Path =
    new Path(manifestDir, f"_compact_$through%010d")

  /** Rebuild from ONE directory listing (ADVICE r14: the per-batch
    * exists-probe loop paid O(total batches) filesystem RPCs on every
    * restart): load the newest `_compact_` seen-set snapshot, then
    * replay only the per-batch manifests at or above it.
    */
  private def rebuildFromManifest(): Unit = {
    val entries =
      try fs.listStatus(manifestDir)
      catch { case _: java.io.FileNotFoundException => Array.empty[org.apache.hadoop.fs.FileStatus] }
    val names = entries.map(_.getPath.getName)
    val compacts = names.filter(_.startsWith("_compact_"))
      .map(_.stripPrefix("_compact_").toLong).sorted
    compactedThrough = compacts.lastOption.getOrElse(0L)
    if (compactedThrough > 0L)
      readLines(compactFile(compactedThrough))
        .foreach { case (p, len) => seen.update(p, len) }
    val ids = names.filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong).filter(_ >= compactedThrough).sorted
    ids.foreach(b => readManifest(b).foreach { case (p, len) => seen.update(p, len) })
    batches = ids.lastOption.map(_ + 1L).getOrElse(compactedThrough)
  }

  private def readLines(f: Path): Seq[(String, Long)] = {
    val in = new BufferedReader(new InputStreamReader(
      fs.open(f), StandardCharsets.UTF_8))
    try {
      Iterator.continually(in.readLine()).takeWhile(_ != null).map { line =>
        val i = line.lastIndexOf('\t')
        (line.substring(0, i), line.substring(i + 1).toLong)
      }.toVector
    } finally in.close()
  }

  private def readManifest(batch: Long): Seq[(String, Long)] =
    readLines(manifestFile(batch))

  /** Atomic manifest append: create(overwrite=false) — two racing
    * writers for the same batch id (can't happen in one driver, but
    * cheap to be strict about) surface as an error, not a blend.
    */
  private def writeManifest(batch: Long, files: Seq[(String, Long)]): Unit = {
    val out = fs.create(manifestFile(batch), false)
    try {
      files.foreach { case (p, len) =>
        out.write(s"$p\t$len\n".getBytes(StandardCharsets.UTF_8))
      }
    } finally out.close()
  }

  override def initialOffset(): Offset = AvroStreamOffset(0L)

  override def latestOffset(): Offset = {
    val current = AvroDataSource.listAvroFiles(path, conf)
    val fresh = current.filter(f => !seen.contains(f.getPath.toString))
      .sortBy(f => (f.getModificationTime, f.getPath.toString))
    val admitted =
      if (maxFilesPerTrigger > 0) fresh.take(maxFilesPerTrigger) else fresh
    if (admitted.nonEmpty) {
      val entry = admitted.map(f => (f.getPath.toString, f.getLen))
      writeManifest(batches, entry)
      entry.foreach { case (p, len) => seen.update(p, len) }
      batches += 1
    }
    AvroStreamOffset(batches)
  }

  override def deserializeOffset(json: String): Offset =
    AvroStreamOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[AvroStreamOffset].batch
    val e = end.asInstanceOf[AvroStreamOffset].batch
    val files = (s until e).flatMap(readManifest)
    val slices = files.map { case (p, len) => AvroSlice(p, 0L, len) }
    // Landing files are bounded by the collector's roll size, so the
    // batch path's further sub-file splitting is skipped here; the
    // same open-cost packing keeps a bursty arrival from becoming
    // one task per tiny file.
    AvroPlanning.pack(slices)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // Streaming has no "first file" to anchor on (the dir may be
    // empty at start): the reader schema is synthesized from the
    // table schema and pruned; each file's writer schema resolves
    // against it by name, exactly as the batch path resolves
    // heterogeneous files.
    val tableAvro = AvroSchemas.toAvro(tableSchema)
    val reader = AvroSchemas.prune(tableAvro, required.fieldNames.toSeq)
    new AvroReaderFactory(reader.toString, required, new SerializableHadoopConf(conf))
  }

  /** Manifests are already durable; commit's job is COMPACTION
    * (ADVICE r14: one file per micro-batch grows the manifest dir
    * unboundedly — Spark's FileStreamSource compacts its log for
    * the same reason). Every `compactEvery` committed batches the
    * cumulative seen-set snapshots into `_compact_<end>` and the
    * folded per-batch manifests are deleted. Only batches below the
    * COMMITTED offset fold, so an uncommitted batch's re-plan always
    * finds its manifest; the snapshot is written before any delete,
    * so a crash mid-compaction loses nothing.
    */
  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[AvroStreamOffset].batch
    if (e - compactedThrough < math.max(1, manifestCompactEvery).toLong) return
    // fold exactly the batches < e (entries admitted by a NEWER,
    // uncommitted batch must stay in their own manifest files)
    val snapshot =
      (compactedThrough until e).flatMap(readManifest)
    val prev = compactedThrough
    val out = fs.create(compactFile(e), true)
    try {
      if (prev > 0L) readLines(compactFile(prev)).foreach { case (p, len) =>
        out.write(s"$p\t$len\n".getBytes(StandardCharsets.UTF_8))
      }
      snapshot.foreach { case (p, len) =>
        out.write(s"$p\t$len\n".getBytes(StandardCharsets.UTF_8))
      }
    } finally out.close()
    // snapshot durable — now drop what it covers
    (prev until e).foreach(b => fs.delete(manifestFile(b), false))
    if (prev > 0L) fs.delete(compactFile(prev), false)
    compactedThrough = e
  }

  override def stop(): Unit = ()
}

/** Offset = number of manifest entries admitted so far. */
case class AvroStreamOffset(batch: Long) extends Offset {
  override def json(): String = batch.toString
}

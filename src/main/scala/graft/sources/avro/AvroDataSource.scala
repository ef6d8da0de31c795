package graft.sources.avro

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Avro container-file connector as a DataSource V2 `TableProvider`
  * (SURVEY.md §2.1) — built on the Apache Avro core/mapred jars that
  * ship with Spark, since the separate `spark-avro` module is not on
  * this classpath. Usage:
  *
  *   spark.read.format("gavro").load(dir)
  *   df.write.format("gavro").mode("append"|"overwrite").save(dir)
  *
  * Scale posture:
  *   - READ SPLITS: Avro container files are block-structured with
  *     16-byte sync markers between blocks, so one large file fans
  *     out to many tasks. Planning cuts each file into byte ranges of
  *     `spark.sql.files.maxPartitionBytes`; each reader does the
  *     standard Avro split protocol (`sync(start)`, read while not
  *     `pastSync(end)`) — every block is decoded by exactly one task.
  *   - COLUMN PRUNING: `SupportsPushDownRequiredColumns` projects the
  *     Avro READER schema down to the required columns, so dropped
  *     fields are skipped during decode rather than materialized and
  *     discarded (Avro is row-oriented: bytes still stream over, but
  *     no object churn). Analytics should still land Avro into
  *     parquet at ingest — this source is the ingest edge, not the
  *     query-loop format.
  *   - SCHEMA EVOLUTION: the table schema is inferred from one file
  *     header; every file is then decoded THROUGH Avro schema
  *     resolution against it, so files written with older/newer
  *     field sets read correctly (missing fields take defaults,
  *     extra fields are skipped).
  *   - WRITES: one container file per task, staged under
  *     `_staging_<queryId>/` and moved into place on driver commit —
  *     a clean job fails atomically (no partial visible output).
  *     `overwrite` is truncate-on-commit. Codec: `compression` option
  *     (`snappy` default, `deflate`, `null`).
  */
class AvroDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gavro"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = AvroDataSource.pathOf(options)
    val conf = AvroDataSource.hadoopConf()
    val files = AvroDataSource.listAvroFiles(path, conf)
    if (files.isEmpty) new StructType() // fresh write target: schema comes from the query
    else if (options.getBoolean("mergeSchema", false)) {
      // union of every file's writer schema (one header read per
      // file — same planning cost class as parquet's mergeSchema;
      // default off). A field absent from any file must be nullable:
      // those files resolve it to null on read.
      val schemas = files.map(f => f.getPath.getName ->
        AvroSchemas.toSpark(AvroDataSource.readWriterSchema(f.getPath, conf)))
      AvroDataSource.mergeSchemas(schemas)
    } else AvroSchemas.toSpark(AvroDataSource.readWriterSchema(files.head.getPath, conf))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroTable(properties.get("path"), schema,
      "true".equalsIgnoreCase(properties.getOrDefault("mergeSchema", "false")))

  override def supportsExternalMetadata(): Boolean = true
}

object AvroDataSource {
  private[avro] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "gavro requires a path (use .load(dir)/.save(dir))")
    p
  }

  private[avro] def hadoopConf(): Configuration =
    SparkSession.active.sessionState.newHadoopConf()

  /** Manual recursive walk rather than `fs.listFiles(recursive)`:
    * `_`/`.`-prefixed directories (staging, checkpoints, metadata)
    * are never DESCENDED into — the recursive lister would stat
    * their children and race with a concurrent writer deleting its
    * staging dir (observed: streaming poll vs batch commit). Vanished
    * entries mid-walk are skipped, not fatal.
    */
  private[avro] def listAvroFiles(path: String, conf: Configuration): Seq[FileStatus] = {
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Nil
    val out = Seq.newBuilder[FileStatus]
    def walk(p: Path): Unit = {
      val children =
        try fs.listStatus(p)
        catch { case _: java.io.FileNotFoundException => Array.empty[FileStatus] }
      children.foreach { st =>
        val name = st.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) {
          if (st.isDirectory) walk(st.getPath)
          else if (st.isFile && st.getLen > 0 && name.endsWith(".avro")) out += st
        }
      }
    }
    walk(root)
    out.result().sortBy(_.getPath.toString)
  }

  /** Widening rank along Avro's numeric promotion chain
    * (int→long→float→double); -1 = not in the chain.
    */
  private def promoRank(dt: org.apache.spark.sql.types.DataType): Int = dt match {
    case org.apache.spark.sql.types.IntegerType => 0
    case org.apache.spark.sql.types.LongType => 1
    case org.apache.spark.sql.types.FloatType => 2
    case org.apache.spark.sql.types.DoubleType => 3
    case _ => -1
  }

  /** Field-name union across (file, schema) pairs: first-seen order;
    * type divergence WIDENS along Avro's promotion chain (the same
    * promotions read-time resolution applies) and anything beyond it
    * fails AT PLANNING with the field and the two conflicting files
    * named (ADVICE r14: first-type-wins deferred the conflict to an
    * opaque executor-side resolution error). Nullable when nullable
    * anywhere OR absent from any file.
    */
  private[avro] def mergeSchemas(schemas: Seq[(String, StructType)]): StructType = {
    val order = scala.collection.mutable.LinkedHashMap
      .empty[String, org.apache.spark.sql.types.StructField]
    val firstFile = scala.collection.mutable.HashMap.empty[String, String]
    val presentIn = scala.collection.mutable.HashMap.empty[String, Int].withDefaultValue(0)
    schemas.foreach { case (file, st) =>
      st.fields.foreach { f =>
        presentIn(f.name) += 1
        order.get(f.name) match {
          case None =>
            order.update(f.name, f)
            firstFile.update(f.name, file)
          case Some(prev) =>
            val widened =
              if (prev.dataType == f.dataType) prev.dataType
              else {
                val (a, b) = (promoRank(prev.dataType), promoRank(f.dataType))
                if (a >= 0 && b >= 0)
                  (if (a >= b) prev.dataType else f.dataType)
                else throw new IllegalArgumentException(
                  s"gavro mergeSchema: field '${f.name}' has incompatible " +
                    s"types ${prev.dataType.simpleString} " +
                    s"(in ${firstFile(f.name)}) vs ${f.dataType.simpleString} " +
                    s"(in $file) — beyond Avro's numeric promotion chain")
              }
            order.update(f.name, prev.copy(dataType = widened,
              nullable = prev.nullable || f.nullable))
        }
      }
    }
    StructType(order.values.map { f =>
      if (presentIn(f.name) < schemas.size) f.copy(nullable = true) else f
    }.toSeq)
  }

  private[avro] def readWriterSchema(file: Path, conf: Configuration): Schema = {
    val in = new FsInput(file, conf)
    try {
      val r = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    } finally in.close()
  }
}

/** One table = one directory of .avro container files. */
class AvroTable(path: String, tableSchema: StructType, mergedSchema: Boolean = false)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"gavro:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ, TableCapability.TRUNCATE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, tableSchema,
      options.getInt("maxFilesPerTrigger", 0),
      mergedSchema || options.getBoolean("mergeSchema", false),
      options.getInt("manifestCompactEvery", 64))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(path, tableSchema, info)
}

class AvroScanBuilder(path: String, full: StructType, maxFilesPerTrigger: Int,
    merged: Boolean = false, manifestCompactEvery: Int = 64)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new AvroScan(path, full, required, maxFilesPerTrigger, merged,
      manifestCompactEvery)
}

class AvroScan(path: String, full: StructType, required: StructType,
    maxFilesPerTrigger: Int, merged: Boolean = false,
    manifestCompactEvery: Int = 64) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new AvroMicroBatchStream(path, full, required, checkpointLocation,
      maxFilesPerTrigger, manifestCompactEvery)
  override def description(): String =
    s"gavro $path cols=[${required.fieldNames.mkString(",")}]"

  /** Mirror of Spark's own file-source packing: large files are cut
    * into `maxPartitionBytes` byte ranges, then slices are bin-packed
    * into partitions with each file charged `filesOpenCostInBytes` —
    * so a million tiny Avro files becomes ~total/maxPartitionBytes
    * tasks, not a million.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = AvroDataSource.hadoopConf()
    val files = AvroDataSource.listAvroFiles(path, conf)
    val splitBytes = AvroPlanning.splitBytes()
    val slices = files.flatMap { f =>
      val len = f.getLen
      (0L until len by splitBytes).map { start =>
        AvroSlice(f.getPath.toString, start, math.min(splitBytes, len - start))
      }
    }
    AvroPlanning.pack(slices)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = AvroDataSource.hadoopConf()
    val files = AvroDataSource.listAvroFiles(path, conf)
    // Reader schema: the table schema pruned to the required columns.
    // Each file resolves its own writer schema against this. Anchor
    // on a real file header when one exists (preserves enum/fixed
    // writer types exactly); a merged-schema table or an empty dir
    // (valid — zero partitions were planned) synthesizes from the
    // table schema, whose merged-only fields are nullable and so
    // carry the null default files missing them resolve to.
    val anchored =
      if (files.nonEmpty && !merged)
        AvroDataSource.readWriterSchema(files.head.getPath, conf)
      else AvroSchemas.toAvro(full)
    // The anchor file is arbitrary (ADVICE r14): with a user-supplied
    // schema, or files added between planning and factory creation,
    // a required column can be absent from THAT file's writer schema
    // even though other files (or the declared schema) carry it —
    // fall back to the synthesized table schema, whose nullable
    // fields carry the null defaults missing-field resolution needs.
    val anchorNames = anchored.getFields.asScala.map(_.name()).toSet
    val tableAvro =
      if (required.fieldNames.forall(anchorNames.contains)) anchored
      else AvroSchemas.toAvro(full)
    val reader = AvroSchemas.prune(tableAvro, required.fieldNames.toSeq)
    new AvroReaderFactory(reader.toString, required, new SerializableHadoopConf(conf))
  }
}

case class AvroSlice(file: String, start: Long, length: Long)

case class AvroInputPartition(slices: Seq[AvroSlice]) extends InputPartition

/** Shared split planning for the batch and micro-batch paths. */
object AvroPlanning {
  def splitBytes(): Long = math.max(1L << 20,
    org.apache.spark.sql.internal.SQLConf.get.filesMaxPartitionBytes)

  /** Bin-pack slices into partitions, each file range charged its
    * length plus `filesOpenCostInBytes`, biggest-first for tight
    * packing — a million tiny files becomes ~total/maxPartitionBytes
    * tasks, not a million.
    */
  def pack(slices: Seq[AvroSlice]): Array[InputPartition] = {
    val budget = splitBytes()
    val openCost = org.apache.spark.sql.internal.SQLConf.get.filesOpenCostInBytes
    val parts = Seq.newBuilder[AvroInputPartition]
    var current = Vector.empty[AvroSlice]
    var currentBytes = 0L
    slices.sortBy(-_.length).foreach { s =>
      val cost = s.length + openCost
      if (current.nonEmpty && currentBytes + cost > budget) {
        parts += AvroInputPartition(current)
        current = Vector.empty
        currentBytes = 0L
      }
      current :+= s
      currentBytes += cost
    }
    if (current.nonEmpty) parts += AvroInputPartition(current)
    parts.result().toArray
  }
}

class AvroReaderFactory(readerSchemaJson: String, sparkSchema: StructType,
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AvroInputPartition]
    new AvroPartitionReader(p.slices, readerSchemaJson, sparkSchema, conf.value)
  }
}

/** Reads a packed sequence of (file, byte-range) slices. Per slice:
  * the Avro split protocol — `sync(start)` seeks to the first block
  * boundary at-or-after start (the header's trailing sync makes
  * start=0 land on the first block), then blocks are consumed until
  * the next block would start past the range end. Every block
  * belongs to exactly one slice.
  */
class AvroPartitionReader(slices: Seq[AvroSlice], readerSchemaJson: String,
    sparkSchema: StructType, conf: Configuration) extends PartitionReader[InternalRow] {
  private val readerSchema = new Schema.Parser().parse(readerSchemaJson)
  private val convert = AvroConverters.recordToRow(readerSchema, sparkSchema)
  private val it = slices.iterator
  private var fileReader: DataFileReader[GenericRecord] = null
  private var end = 0L
  private var record: GenericRecord = null
  private var row: InternalRow = _

  private def openNext(): Boolean = {
    closeCurrent()
    if (!it.hasNext) return false
    val s = it.next()
    val in = new FsInput(new Path(s.file), conf)
    fileReader = new DataFileReader[GenericRecord](in,
      new GenericDatumReader[GenericRecord](null, readerSchema))
    fileReader.sync(s.start)
    end = s.start + s.length
    true
  }

  override def next(): Boolean = {
    while (fileReader == null || !fileReader.hasNext || fileReader.pastSync(end)) {
      if (!openNext()) return false
    }
    record = fileReader.next(record)
    row = convert(record)
    true
  }

  override def get(): InternalRow = row

  private def closeCurrent(): Unit = {
    if (fileReader != null) { fileReader.close(); fileReader = null }
  }

  override def close(): Unit = closeCurrent()
}

class AvroWriteBuilder(path: String, tableSchema: StructType, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  /** ACCEPT_ANY_SCHEMA means Spark hands the query's own schema
    * through unresolved — an `INSERT INTO ... VALUES` arrives with
    * synthetic column names (col1, col2, …). Table names are adopted
    * positionally ONLY for that synthetic case (ADVICE r14: a blanket
    * arity-match adoption silently relabeled an out-of-order or
    * differently-named DataFrame append — data corruption when the
    * swapped columns share a type). A query whose name SET already
    * matches the table case-insensitively keeps its own order but
    * takes the table's exact casing (Avro name resolution is
    * case-sensitive); any other query keeps its own names and
    * per-file Avro name resolution handles the read side.
    */
  private def writeSchema: StructType = {
    val q = info.schema()
    val synthetic = q.fieldNames.zipWithIndex.forall {
      case (n, i) => n.equalsIgnoreCase(s"col${i + 1}")
    }
    if (tableSchema.isEmpty || tableSchema.length != q.length) q
    else if (synthetic && q.nonEmpty) {
      StructType(q.fields.zip(tableSchema.fieldNames).map {
        case (f, n) => f.copy(name = n)
      })
    } else {
      val canon = tableSchema.fieldNames.map(n => n.toLowerCase -> n).toMap
      val sameSet = q.fieldNames.map(_.toLowerCase).toSet ==
        tableSchema.fieldNames.map(_.toLowerCase).toSet
      if (sameSet) // case-normalize, do NOT rearrange
        StructType(q.fields.map(f =>
          f.copy(name = canon(f.name.toLowerCase))))
      else q
    }
  }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new AvroBatchWrite(path, writeSchema, info.queryId(),
        Option(info.options.get("compression")).getOrElse("snappy"), doTruncate)
  }
}

class AvroBatchWrite(path: String, schema: StructType, queryId: String,
    codec: String, truncate: Boolean) extends BatchWrite {
  private val stagingDir = s"$path/_staging_$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = AvroDataSource.hadoopConf()
    val p = new Path(stagingDir)
    p.getFileSystem(conf).mkdirs(p)
    new AvroWriterFactory(stagingDir, queryId, schema,
      AvroSchemas.toAvro(schema).toString, codec, new SerializableHadoopConf(conf))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = AvroDataSource.hadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    if (truncate) {
      AvroDataSource.listAvroFiles(path, conf).foreach(f => fs.delete(f.getPath, false))
    }
    messages.foreach { case AvroCommitMessage(staged) =>
      val src = new Path(staged)
      val ok = fs.rename(src, new Path(root, src.getName))
      if (!ok) throw new IOException(s"commit rename failed for $staged")
    }
    fs.delete(new Path(stagingDir), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = AvroDataSource.hadoopConf()
    val p = new Path(stagingDir)
    p.getFileSystem(conf).delete(p, true)
  }
}

case class AvroCommitMessage(stagedFile: String) extends WriterCommitMessage

class AvroWriterFactory(stagingDir: String, queryId: String, schema: StructType,
    avroJson: String, codec: String, conf: SerializableHadoopConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(stagingDir, queryId, schema, avroJson, codec, conf.value,
      partitionId, taskId)
}

class AvroDataWriter(stagingDir: String, queryId: String, schema: StructType,
    avroJson: String, codec: String, conf: Configuration, partitionId: Int,
    taskId: Long) extends DataWriter[InternalRow] {
  private val avroSchema = new Schema.Parser().parse(avroJson)
  // queryId in the name: (partitionId, taskId) alone can collide when
  // two APPLICATIONS append to the same directory (taskIds restart
  // per app); rename-over-existing would fail the late committer
  private val file = new Path(stagingDir, f"part-$partitionId%05d-$taskId-$queryId.avro")
  private val out = file.getFileSystem(conf).create(file, false)
  private val writer = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
    w.setCodec(codec match {
      case "snappy" => CodecFactory.snappyCodec()
      case "deflate" => CodecFactory.deflateCodec(CodecFactory.DEFAULT_DEFLATE_LEVEL)
      case "null" | "none" => CodecFactory.nullCodec()
      case other => throw new IllegalArgumentException(s"unknown codec $other")
    })
    w.create(avroSchema, out)
  }
  private val convert = AvroConverters.rowToRecord(schema, avroSchema)

  override def write(record: InternalRow): Unit = writer.append(convert(record))

  override def commit(): WriterCommitMessage = {
    writer.close()
    AvroCommitMessage(file.toString)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: IOException => }
    file.getFileSystem(conf).delete(file, false)
  }

  override def close(): Unit = ()
}

/** Hadoop `Configuration` is `Writable`, not `Serializable`; this is
  * the standard wrapper to ship it from planning to executor tasks.
  */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

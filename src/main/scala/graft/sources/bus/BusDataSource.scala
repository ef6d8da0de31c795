package graft.sources.bus

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Message-bus micro-batch source ("gbus") — the SEAM for a Kafka
  * connector, proven against [[InMemoryLog]] since no broker client
  * jar ships in this sandbox (kafka-clients absent; zero egress).
  * Everything that makes a bus source correct lives HERE and is
  * spec-verified:
  *
  *   - offsets are a per-partition map {partition → next offset};
  *     an offset RANGE (start, end] defines a batch deterministically,
  *     so a recovered batch re-reads exactly the same records;
  *   - one InputPartition per bus partition per batch — consumption
  *     parallelism is the bus's partition count, the Kafka planning
  *     shape;
  *   - `maxPerTrigger` caps TOTAL records admitted per batch,
  *     distributed over partitions proportionally to backlog
  *     (`maxOffsetsPerTrigger`'s exact contract, r15 — and the
  *     engine-passed ReadLimit is honored, so composed limits bind);
  *   - per-partition ordering is preserved into the output; offsets
  *     are exposed as columns for downstream exactly-once dedup.
  *
  * A real Kafka binding replaces InMemoryLog.{endOffsets, read} with
  * consumer.endOffsets / poll over seek — the planning, offset
  * arithmetic, recovery, and schema stay identical. Output schema:
  * (partition INT, offset LONG, key STRING, value STRING).
  */
class BusDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gbus"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BusDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BusTable(properties.get("log"),
      Option(properties.get("maxPerTrigger")).map(_.toLong).getOrElse(0L))
}

object BusDataSource {
  val schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true)))
}

class BusTable(logName: String, maxPerTrigger: Long) extends Table with SupportsRead {
  require(logName != null && logName.nonEmpty, "gbus requires option log=<name>")
  override def name(): String = s"gbus:$logName"
  override def schema(): StructType = BusDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = BusDataSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new BusMicroBatchStream(logName, maxPerTrigger)
      }
    }
}

/** Offset = per-partition next-offset map, serialized as the sorted
  * "p:off" list (stable JSON-free encoding, deterministic equals).
  */
case class BusOffset(next: Map[Int, Long]) extends Offset {
  override def json(): String =
    next.toSeq.sorted.map { case (p, o) => s"$p:$o" }.mkString(",")
}

object BusOffset {
  def parse(s: String): BusOffset =
    BusOffset(s.split(",").filter(_.nonEmpty).map { kv =>
      val Array(p, o) = kv.split(":")
      p.toInt -> o.toLong
    }.toMap)
}

class BusMicroBatchStream(logName: String, maxPerTrigger: Long)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset =
    BusOffset((0 until InMemoryLog.partitions(logName)).map(_ -> 0L).toMap)

  override def getDefaultReadLimit: ReadLimit =
    if (maxPerTrigger > 0) ReadLimit.maxRows(maxPerTrigger) else ReadLimit.allAvailable()

  /** Admission-control variant — the engine passes the batch's true
    * start, so caps are relative to consumed progress and compose
    * with checkpoint recovery (the Kafka source shape). The PASSED
    * `limit` is honored (ADVICE r14: ignoring it meant admission
    * could exceed the declared cap by the partition count, and
    * engine-composed limits — e.g. Trigger.AvailableNow wrappers —
    * were silently dropped): ReadMaxRows is a GLOBAL row budget
    * distributed over partitions proportionally to backlog, exactly
    * `maxOffsetsPerTrigger`'s contract; composite limits apply each
    * member; min-rows/unknown kinds don't bound a bus admission.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[BusOffset].next
    val end = InMemoryLog.endOffsets(logName)

    def capGlobal(cur: Map[Int, Long], maxRows: Long): Map[Int, Long] = {
      val lag = cur.map { case (p, e) => p -> math.max(0L, e - s.getOrElse(p, 0L)) }
      val total = lag.values.sum
      if (total <= maxRows) cur
      else {
        val shared = cur.map { case (p, e) =>
          val share = (maxRows.toDouble * lag(p) / total).toLong // floor
          p -> math.min(e, s.getOrElse(p, 0L) + share)
        }
        // floor-rounding can starve every partition when
        // maxRows < |partitions|: always admit ≥1 record from the
        // largest backlog so the stream provably drains
        val admits = shared.map { case (p, e) => math.max(0L, e - s.getOrElse(p, 0L)) }.sum
        if (admits > 0L || total == 0L) shared
        else {
          val hottest = lag.maxBy(_._2)._1
          shared.updated(hottest, s.getOrElse(hottest, 0L) + 1L)
        }
      }
    }

    def apply(lim: ReadLimit, cur: Map[Int, Long]): Map[Int, Long] = lim match {
      case _: org.apache.spark.sql.connector.read.streaming.ReadAllAvailable => cur
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        capGlobal(cur, m.maxRows())
      case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
        c.getReadLimits.foldLeft(cur)((acc, l) => apply(l, acc))
      case _ => cur
    }

    BusOffset(apply(limit, end))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control source: engine must call latestOffset(start, limit)")

  override def deserializeOffset(json: String): Offset = BusOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BusOffset].next
    val e = end.asInstanceOf[BusOffset].next
    e.toSeq.sorted.flatMap { case (p, until) =>
      val from = s.getOrElse(p, 0L)
      if (until > from) Some(BusRange(logName, p, from, until)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new BusReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class BusRange(log: String, partition: Int, from: Long, until: Long)
    extends InputPartition

class BusReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[BusRange]
    // fake binding: the "broker read" is a local slice. A Kafka
    // binding would seek(from) and poll until `until` here.
    val records = InMemoryLog.read(r.log, r.partition, r.from, r.until).iterator
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (records.hasNext) {
          val rec = records.next()
          current = new GenericInternalRow(Array[Any](rec.partition, rec.offset,
            if (rec.key == null) null else UTF8String.fromString(rec.key),
            if (rec.value == null) null else UTF8String.fromString(rec.value)))
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

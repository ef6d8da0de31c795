package graft.sources.bus

import scala.collection.mutable.ArrayBuffer

/** In-memory partitioned append-only log — the Kafka-shaped contract
  * (named log, fixed partition count, per-partition monotonically
  * increasing offsets, records immutable once appended) used to prove
  * the [[BusDataSource]] micro-batch seam without a broker client on
  * the classpath (the same fake-backed-seam pattern as
  * InMemoryCommitBackend for the cloud commit protocol).
  *
  * Thread-safe: producers append concurrently; readers see a
  * consistent prefix per partition (endOffsets snapshots under the
  * same lock appends take).
  */
object InMemoryLog {

  final case class Record(partition: Int, offset: Long, key: String, value: String)

  private val logs =
    new java.util.concurrent.ConcurrentHashMap[String, IndexedSeq[ArrayBuffer[Record]]]()

  def create(name: String, partitions: Int): Unit = {
    require(partitions > 0, "need at least one partition")
    logs.putIfAbsent(name, Vector.fill(partitions)(ArrayBuffer.empty[Record]))
  }

  def drop(name: String): Unit = logs.remove(name)

  private def log(name: String): IndexedSeq[ArrayBuffer[Record]] = {
    val l = logs.get(name)
    require(l != null, s"no such log: $name (InMemoryLog.create it first)")
    l
  }

  def partitions(name: String): Int = log(name).size

  /** Append; returns the record's offset. Partition chosen by key
    * hash when not given explicitly (the producer-side default).
    */
  def append(name: String, key: String, value: String, partition: Int = -1): Long = {
    val l = log(name)
    val p = if (partition >= 0) partition
      else math.floorMod(if (key == null) 0 else key.hashCode, l.size)
    val buf = l(p)
    buf.synchronized {
      val off = buf.size.toLong
      buf += Record(p, off, key, value)
      off
    }
  }

  /** Next-offset-to-write per partition (exclusive upper bound). */
  def endOffsets(name: String): Map[Int, Long] =
    log(name).zipWithIndex.map { case (buf, p) =>
      p -> buf.synchronized(buf.size.toLong)
    }.toMap

  /** Records of one partition in [from, until) — immutable slice. */
  def read(name: String, partition: Int, from: Long, until: Long): Seq[Record] = {
    val buf = log(name)(partition)
    buf.synchronized(buf.slice(from.toInt, until.toInt).toVector)
  }
}

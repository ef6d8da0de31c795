package graft.sources.avro

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericData, GenericFixed, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Value-level Avro ⇄ Spark-internal converters. Converter functions
  * are resolved ONCE per schema (per task) into a `Any => Any` tree —
  * the per-row path is virtual-call-free pattern-match-free field
  * loops, which is what keeps a row-oriented decode from dominating
  * scan cost.
  */
object AvroConverters {

  /** Avro → Spark. Built against the (possibly pruned) reader schema
    * and the matching Spark schema; positions align by construction.
    */
  def recordToRow(avro: Schema, spark: StructType): GenericRecord => InternalRow = {
    val fields = spark.fields
    val converters = new Array[Any => Any](fields.length)
    var i = 0
    while (i < fields.length) {
      converters(i) = readerFor(avro.getFields.get(i).schema(), fields(i).dataType)
      i += 1
    }
    rec => {
      val out = new Array[Any](fields.length)
      var j = 0
      while (j < fields.length) {
        val v = rec.get(j)
        out(j) = if (v == null) null else converters(j)(v)
        j += 1
      }
      new GenericInternalRow(out)
    }
  }

  private def readerFor(avro: Schema, dt: DataType): Any => Any = {
    val s = nonNull(avro)
    (s.getType, dt) match {
      case (Schema.Type.BOOLEAN, BooleanType) => identity
      case (Schema.Type.INT, IntegerType) => identity
      case (Schema.Type.INT, DateType) => identity // both int days since epoch
      case (Schema.Type.LONG, LongType) => identity
      case (Schema.Type.LONG, TimestampType) =>
        s.getLogicalType match {
          case _: LogicalTypes.TimestampMillis =>
            v => v.asInstanceOf[Long] * 1000L
          case _ => identity // timestamp-micros == Spark internal micros
        }
      case (Schema.Type.FLOAT, FloatType) => identity
      case (Schema.Type.DOUBLE, DoubleType) => identity
      // widening promotions (Avro's own resolution set): files written
      // with a narrower type than the table declares still read
      case (Schema.Type.INT, LongType) => v => v.asInstanceOf[Int].toLong
      case (Schema.Type.INT, DoubleType) => v => v.asInstanceOf[Int].toDouble
      case (Schema.Type.LONG, DoubleType) => v => v.asInstanceOf[Long].toDouble
      case (Schema.Type.FLOAT, DoubleType) => v => v.asInstanceOf[Float].toDouble
      case (Schema.Type.STRING | Schema.Type.ENUM, StringType) =>
        v => UTF8String.fromString(v.toString)
      case (Schema.Type.BYTES, d: DecimalType) =>
        v => bytesToDecimal(bufBytes(v.asInstanceOf[ByteBuffer]), d)
      case (Schema.Type.FIXED, d: DecimalType) =>
        v => bytesToDecimal(v.asInstanceOf[GenericFixed].bytes(), d)
      case (Schema.Type.BYTES, BinaryType) =>
        v => bufBytes(v.asInstanceOf[ByteBuffer])
      case (Schema.Type.FIXED, BinaryType) =>
        v => v.asInstanceOf[GenericFixed].bytes().clone()
      case (Schema.Type.RECORD, st: StructType) =>
        val conv = recordToRow(s, st)
        v => conv(v.asInstanceOf[GenericRecord])
      case (Schema.Type.ARRAY, ArrayType(et, _)) =>
        val elem = readerFor(s.getElementType, et)
        v => {
          val in = v.asInstanceOf[java.util.Collection[Any]]
          val out = new Array[Any](in.size)
          val it = in.iterator()
          var i = 0
          while (it.hasNext) {
            val e = it.next()
            out(i) = if (e == null) null else elem(e)
            i += 1
          }
          new GenericArrayData(out)
        }
      case (Schema.Type.MAP, MapType(StringType, vt, _)) =>
        val value = readerFor(s.getValueType, vt)
        v => {
          val in = v.asInstanceOf[java.util.Map[Any, Any]]
          val keys = new Array[Any](in.size)
          val vals = new Array[Any](in.size)
          val it = in.entrySet().iterator()
          var i = 0
          while (it.hasNext) {
            val e = it.next()
            keys(i) = UTF8String.fromString(e.getKey.toString)
            vals(i) = if (e.getValue == null) null else value(e.getValue)
            i += 1
          }
          ArrayBasedMapData(keys, vals)
        }
      case other => throw new IllegalArgumentException(s"cannot read $other")
    }
  }

  /** Spark → Avro, against the Avro schema produced by
    * [[AvroSchemas.toAvro]] for this StructType (field order aligns).
    */
  def rowToRecord(spark: StructType, avro: Schema): InternalRow => GenericRecord = {
    val fields = spark.fields
    val writers = new Array[(InternalRow, Int) => Any](fields.length)
    var i = 0
    while (i < fields.length) {
      writers(i) = writerFor(fields(i).dataType, avro.getFields.get(i).schema())
      i += 1
    }
    row => {
      val rec = new GenericData.Record(avro)
      var j = 0
      while (j < fields.length) {
        rec.put(j, if (row.isNullAt(j)) null else writers(j)(row, j))
        j += 1
      }
      rec
    }
  }

  private def writerFor(dt: DataType, avro: Schema): (InternalRow, Int) => Any = {
    val s = nonNull(avro)
    dt match {
      case BooleanType => (r, i) => r.getBoolean(i)
      case ByteType => (r, i) => r.getByte(i).toInt
      case ShortType => (r, i) => r.getShort(i).toInt
      case IntegerType | DateType => (r, i) => r.getInt(i)
      case LongType | TimestampType => (r, i) => r.getLong(i)
      case FloatType => (r, i) => r.getFloat(i)
      case DoubleType => (r, i) => r.getDouble(i)
      case StringType => (r, i) => new Utf8(r.getUTF8String(i).toString)
      case BinaryType => (r, i) => ByteBuffer.wrap(r.getBinary(i))
      case d: DecimalType =>
        (r, i) => ByteBuffer.wrap(
          r.getDecimal(i, d.precision, d.scale).toJavaBigDecimal.unscaledValue().toByteArray)
      case st: StructType =>
        val conv = rowToRecord(st, s)
        (r, i) => conv(r.getStruct(i, st.size))
      case ArrayType(et, _) =>
        val elemDt = et
        val elem = elementWriterFor(elemDt, s.getElementType)
        (r, i) => {
          val arr = r.getArray(i)
          val out = new java.util.ArrayList[Any](arr.numElements())
          var k = 0
          while (k < arr.numElements()) {
            out.add(if (arr.isNullAt(k)) null else elem(arr, k))
            k += 1
          }
          out
        }
      case MapType(StringType, vt, _) =>
        val value = elementWriterFor(vt, s.getValueType)
        (r, i) => {
          val m = r.getMap(i)
          val keys = m.keyArray()
          val vals = m.valueArray()
          val out = new java.util.HashMap[Any, Any](m.numElements())
          var k = 0
          while (k < m.numElements()) {
            out.put(new Utf8(keys.getUTF8String(k).toString),
              if (vals.isNullAt(k)) null else value(vals, k))
            k += 1
          }
          out
        }
      case other => throw new IllegalArgumentException(s"cannot write $other")
    }
  }

  /** Element access against Catalyst's ArrayData (positional getters
    * mirror the row getters — shared with map key/value arrays).
    */
  private def elementWriterFor(dt: DataType,
      avro: Schema): (org.apache.spark.sql.catalyst.util.ArrayData, Int) => Any = {
    val s = nonNull(avro)
    dt match {
      case BooleanType => (a, i) => a.getBoolean(i)
      case IntegerType | DateType => (a, i) => a.getInt(i)
      case LongType | TimestampType => (a, i) => a.getLong(i)
      case FloatType => (a, i) => a.getFloat(i)
      case DoubleType => (a, i) => a.getDouble(i)
      case StringType => (a, i) => new Utf8(a.getUTF8String(i).toString)
      case BinaryType => (a, i) => ByteBuffer.wrap(a.getBinary(i))
      case d: DecimalType =>
        (a, i) => ByteBuffer.wrap(
          a.getDecimal(i, d.precision, d.scale).toJavaBigDecimal.unscaledValue().toByteArray)
      case st: StructType =>
        val conv = rowToRecord(st, s)
        (a, i) => conv(a.getStruct(i, st.size))
      case ArrayType(et, _) =>
        val elem = elementWriterFor(et, s.getElementType)
        (a, i) => {
          val arr = a.getArray(i)
          val out = new java.util.ArrayList[Any](arr.numElements())
          var k = 0
          while (k < arr.numElements()) {
            out.add(if (arr.isNullAt(k)) null else elem(arr, k))
            k += 1
          }
          out
        }
      case other => throw new IllegalArgumentException(s"cannot write array element $other")
    }
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) {
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(
        throw new IllegalArgumentException(s"union of only null: $s"))
    } else s

  private def bufBytes(b: ByteBuffer): Array[Byte] = {
    val dup = b.duplicate()
    val out = new Array[Byte](dup.remaining())
    dup.get(out)
    out
  }

  private def bytesToDecimal(bytes: Array[Byte], d: DecimalType): Decimal =
    Decimal(new JBigDecimal(new BigInteger(bytes), d.scale), d.precision, d.scale)
}

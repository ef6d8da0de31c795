package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (SURVEY.md §2.10): treat media
  * payloads as opaque `binary` columns with typed metadata, processed
  * per-partition with no driver involvement.
  *
  * The DECODE step is a deterministic STUB — this container has no
  * image/audio codecs, so `decodeMeta` fabricates metadata from the
  * bytes. Everything around it (schema, Dataset encoders,
  * mapPartitions batching, frame sampling) is the real Spark plumbing
  * a production decode would use: swap `fakeDecode` for a codec call
  * and nothing else changes.
  */
object BinaryPipeline {

  /** Decoded-media metadata row (what an image/audio probe returns). */
  final case class MediaMeta(
      id: Long, n_bytes: Long, format: String, width: Int, height: Int)

  /** STUB decoder: deterministic fake derived from the payload bytes.
    * Replace with e.g. an ImageIO/ffprobe call in deployment.
    */
  private def fakeDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val head = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val last = if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xff else 0
    MediaMeta(id, bytes.length.toLong, "stub/raw", head % 64 + 1, last % 64 + 1)
  }

  /** Attach an opaque binary payload column derived from a string
    * column (stand-in for reading real media bytes).
    */
  def withPayload(df: DataFrame, textCol: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, col(textCol).cast("binary"))

  /** Per-partition decode: binary payload → typed metadata. Runs as a
    * narrow mapPartitions — no shuffle, scales with input partitions.
    */
  def decodeMeta(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => fakeDecode(id, bytes) })
  }

  /** Frame sampling: slice the payload into n fixed-stride byte
    * windows ("frames"), one output row per frame — the shape a video
    * frame-sampler produces. Pure Catalyst (explode + substr on
    * binary), no UDF.
    */
  def sampleFrames(df: DataFrame, nFrames: Int, frameBytes: Int,
      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    val stride = greatest(
      ((col("total_bytes") - frameBytes) / lit(math.max(nFrames, 1))).cast("long"),
      lit(1L))
    df.select(col(idCol), col(payloadCol),
        octet_length(col(payloadCol)).cast("long").as("total_bytes"))
      .select(col(idCol), col(payloadCol), col("total_bytes"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_no"))
      .select(col(idCol), col("frame_no").cast("int").as("frame_no"),
        substr(col(payloadCol),
          (col("frame_no") * stride + 1).cast("int"),
          lit(frameBytes)).as("frame_payload"))
  }
}

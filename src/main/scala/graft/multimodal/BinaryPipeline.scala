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

  /** One media feature row: fixed-dimension float embedding per doc. */
  final case class MediaFeatures(id: Long, features: Array[Float])

  /** Feature extraction: binary payload → fixed-dim float vector, as
    * a per-partition narrow pass. The EXTRACTOR is a deterministic
    * STUB (byte histogram folded to `dim` buckets, L1-normalized) —
    * a real image/audio embedder slots into the same signature and
    * batch shape. Output schema matches the embeddings table
    * (array<float>), so downstream similarity ops (cosine_sim,
    * LshAnn, IvfAnn) work on it unchanged.
    */
  def extractFeatures(df: DataFrame, dim: Int = 16, idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[MediaFeatures] = {
    require(dim > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val acc = new Array[Float](dim)
        var i = 0
        while (i < bytes.length) { acc((bytes(i) & 0xff) % dim) += 1f; i += 1 }
        val total = math.max(1f, bytes.length.toFloat)
        var j = 0
        while (j < dim) { acc(j) /= total; j += 1 }
        MediaFeatures(id, acc)
      })
  }

  /** "Resize": deterministic downsample of the payload to at most
    * `maxBytes` by fixed-stride byte selection — the stand-in for an
    * image resize, with the real contract (output strictly bounded,
    * deterministic, computed inline in codegen via filter on byte
    * position). Implemented relationally: posexplode the byte
    * positions via substr slices would copy; instead take every k-th
    * 1-byte slice and reassemble with concat over an exploded
    * sequence — kept as a narrow mapPartitions for byte-array speed.
    */
  def resizePayload(df: DataFrame, maxBytes: Int, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    require(maxBytes > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        if (bytes.length <= maxBytes) (id, bytes)
        else {
          val stride = math.ceil(bytes.length.toDouble / maxBytes).toInt
          val resized = Array.ofDim[Byte]((bytes.length + stride - 1) / stride)
          var i = 0
          var j = 0
          while (i < bytes.length && j < resized.length) {
            resized(j) = bytes(i); i += stride; j += 1
          }
          (id, resized)
        }
      })
    out.toDF(idCol, payloadCol)
  }
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (SURVEY.md §2.10): treat media
  * payloads as opaque `binary` columns with typed metadata, processed
  * per-partition with no driver involvement.
  *
  * IMAGES are decoded FOR REAL via the JDK's built-in ImageIO codecs
  * (PNG/JPEG/BMP/GIF/WBMP readers ship in every JVM — no native libs,
  * headless-safe): `decodeImageMeta` reads true format/width/height,
  * `resizeImage` re-rasters with AWT, `extractPixelFeatures` builds a
  * luminance histogram from actual pixels. Audio/video codecs do NOT
  * exist in this container, so the generic `decodeMeta` keeps the
  * deterministic stub contract for non-image payloads (and the image
  * paths fall back to it on junk bytes — the pipeline never throws on
  * a corrupt payload; it tags it). Everything around the codec call
  * (schema, Dataset encoders, mapPartitions batching, frame sampling)
  * is the same Spark plumbing either way.
  */
object BinaryPipeline {

  /** Decoded-media metadata row (what an image/audio probe returns). */
  final case class MediaMeta(
      id: Long, n_bytes: Long, format: String, width: Int, height: Int)

  /** STUB decoder for formats with no in-JVM codec (audio/video):
    * deterministic fake derived from the payload bytes. Images have
    * the real path — [[decodeImageMeta]].
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

  /** REAL image decode via ImageIO header probe: format and pixel
    * dimensions come from the registered JDK codec (PNG/JPEG/BMP/GIF/
    * WBMP), reading only the header — the raster is NOT decoded, so
    * probing a 10 MB JPEG costs a few KB of I/O. Payloads no codec
    * recognizes fall back to the stub contract ("stub/raw") instead
    * of throwing — a corrupt payload is data to tag, not an executor
    * death at 100 TB.
    */
  def decodeImageMeta(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => imageDecode(id, bytes) })
  }

  private def imageDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) fakeDecode(id, bytes)
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          MediaMeta(id, bytes.length.toLong,
            "image/" + r.getFormatName.toLowerCase,
            r.getWidth(0), r.getHeight(0))
        } catch { case _: Exception => fakeDecode(id, bytes) }
        finally r.dispose()
      }
    } finally in.close()
  }

  /** REAL image resize (AWT, headless-safe): decode, scale so the
    * longest side is ≤ `maxDim` preserving aspect ratio (bilinear),
    * re-encode as PNG. Already-small images and non-image payloads
    * pass through byte-identical. Narrow per-partition pass.
    */
  def resizeImage(df: DataFrame, maxDim: Int, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    require(maxDim > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img == null || math.max(img.getWidth, img.getHeight) <= maxDim)
          (id, bytes)
        else {
          val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
          val w = math.max(1, math.round(img.getWidth * scale).toInt)
          val h = math.max(1, math.round(img.getHeight * scale).toInt)
          val dst = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          (id, bos.toByteArray)
        }
      })
      .toDF(idCol, payloadCol)
  }

  /** REAL pixel features: decode the raster and build an L1-normalized
    * luminance histogram over `dim` buckets — the classic pre-neural
    * image descriptor, from actual pixels (not payload bytes). Vectors
    * land in the embeddings shape (array<float>), so cosine / LSH /
    * IVF ops consume them unchanged. Non-image payloads fall back to
    * the byte-histogram so the column is total.
    */
  def extractPixelFeatures(df: DataFrame, dim: Int = 16,
      idCol: String = "doc_id", payloadCol: String = "payload"): Dataset[MediaFeatures] = {
    require(dim > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img == null) byteHistogram(id, bytes, dim)
        else {
          val acc = new Array[Float](dim)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              // integer ITU-R 601 luma: (77R + 150G + 29B) >> 8 ∈ [0, 255]
              val luma = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff)
                + 29 * (rgb & 0xff)) >> 8
              acc(luma * dim / 256) += 1f
              x += 1
            }
            y += 1
          }
          val total = math.max(1f, (img.getWidth * img.getHeight).toFloat)
          var j = 0
          while (j < dim) { acc(j) /= total; j += 1 }
          MediaFeatures(id, acc)
        }
      })
  }

  private def byteHistogram(id: Long, bytes: Array[Byte], dim: Int): MediaFeatures = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) { acc((bytes(i) & 0xff) % dim) += 1f; i += 1 }
    val total = math.max(1f, bytes.length.toFloat)
    var j = 0
    while (j < dim) { acc(j) /= total; j += 1 }
    MediaFeatures(id, acc)
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

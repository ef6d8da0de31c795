package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.multimodal.BinaryPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The REAL image path of the multimodal pipeline, end-to-end on
  * actual encoded images (PNG/JPEG via the JDK's ImageIO — generated
  * in-memory here, no fixtures or native libs): header-probe decode
  * returns true format/dimensions, resize bounds the raster
  * preserving aspect, pixel features come from the luminance of real
  * pixels, and junk payloads degrade to the tagged stub contract
  * instead of throwing.
  */
class ImagePipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Encode a w×h image filled with `rgb` (plus a distinct corner
    * pixel so JPEG doesn't collapse it entirely) as `format` bytes.
    */
  private def encode(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    img.setRGB(0, 0, 0x123456)
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos), s"no $format writer")
    bos.toByteArray
  }

  private def payloadDf(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "payload")
  }

  test("decodeImageMeta reads true format and dimensions from headers") {
    val df = payloadDf(Seq(
      1L -> encode(64, 48, 0x336699, "png"),
      2L -> encode(20, 100, 0x996633, "jpg"),
      3L -> "definitely not an image".getBytes("UTF-8")))
    val metas = BinaryPipeline.decodeImageMeta(df)
      .collect().map(m => m.id -> m).toMap
    assert(metas(1L).format === "image/png")
    assert((metas(1L).width, metas(1L).height) === ((64, 48)))
    assert(metas(2L).format === "image/jpeg")
    assert((metas(2L).width, metas(2L).height) === ((20, 100)))
    assert(metas(3L).format === "stub/raw", "junk must fall back, not throw")
  }

  test("resizeImage bounds the longest side and preserves aspect; small images pass through") {
    val big = encode(200, 100, 0x204080, "png")
    val small = encode(30, 10, 0x204080, "png")
    val out = BinaryPipeline.resizeImage(payloadDf(Seq(1L -> big, 2L -> small)), maxDim = 50)
    val metas = BinaryPipeline.decodeImageMeta(out).collect().map(m => m.id -> m).toMap
    assert((metas(1L).width, metas(1L).height) === ((50, 25)),
      "200x100 must land at 50x25 (aspect preserved)")
    assert((metas(2L).width, metas(2L).height) === ((30, 10)),
      "already-small image must pass through")
    // pass-through is byte-identical, not a re-encode
    val smallBytes = out.filter(col("doc_id") === 2L)
      .select(col("payload")).head().getAs[Array[Byte]](0)
    assert(smallBytes.sameElements(small))
  }

  test("extractPixelFeatures histograms real luminance, L1-normalized") {
    val dark = encode(32, 32, 0x000000, "png")   // luma ~0 → lowest bucket
    val light = encode(32, 32, 0xffffff, "png")  // luma ~255 → highest bucket
    val feats = BinaryPipeline
      .extractPixelFeatures(payloadDf(Seq(1L -> dark, 2L -> light)), dim = 8)
      .collect().map(f => f.id -> f.features).toMap
    feats.values.foreach { v =>
      assert(math.abs(v.sum - 1f) < 1e-3, s"not L1-normalized: ${v.toSeq}")
    }
    assert(feats(1L)(0) > 0.9f, s"dark image mass not in bucket 0: ${feats(1L).toSeq}")
    assert(feats(2L)(7) > 0.9f, s"light image mass not in bucket 7: ${feats(2L).toSeq}")
  }

  test("decode is a header probe and survives the frame-sampler's truncated slices") {
    // sampleFrames slices payloads mid-stream; decoding those slices
    // must degrade to the stub, never throw — the corrupt-payload
    // resilience contract on real codec bytes
    val df = payloadDf(Seq(1L -> encode(64, 64, 0x808080, "png")))
    val frames = BinaryPipeline.sampleFrames(df, nFrames = 3, frameBytes = 16)
      .select(col("doc_id"), col("frame_payload").as("payload"))
    val metas = BinaryPipeline.decodeImageMeta(frames, "doc_id", "payload").collect()
    assert(metas.length === 3)
    assert(metas.forall(_.format === "stub/raw"))
  }
}

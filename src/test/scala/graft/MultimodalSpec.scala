package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The real-codec multimodal path: javax.imageio decode inside the
  * mapPartitions plumbing, encode-time ground truth as the gate, and the
  * byte-level fallback for payloads without a codec. */
class MultimodalSpec extends SparkSpec {

  private lazy val fixture = {
    val dir = tmpDir("mm_fixture")
    Multimodal.ensurePngFixture(spark, dir, n = 25)
    dir
  }

  test("PNG decode reproduces encode-time channel means exactly") {
    val feats = Multimodal.extractFeatures(
      spark, Multimodal.pngMediaTable(spark, fixture))
      .select(col("media_id"), col("width"), col("height"),
        element_at(col("features"), 3).as("r_mean"),
        element_at(col("features"), 4).as("g_mean"),
        element_at(col("features"), 5).as("b_mean"))
    val expected = spark.read.parquet(s"$fixture/expected")
      .select("media_id", "width", "height", "r_mean", "g_mean", "b_mean")
    assert(feats.exceptAll(expected).isEmpty && expected.exceptAll(feats).isEmpty,
      "decoded channel means must equal the generator's pre-encode values")
  }

  test("resize: decoded nearest-neighbor resample matches ground truth and re-encodes") {
    val resized = Multimodal.resizeMedia(
      spark, Multimodal.pngMediaTable(spark, fixture))
    val got = resized.select(col("media_id"), col("res_width"), col("res_height"),
      col("res_r_mean"), col("res_g_mean"), col("res_b_mean"))
    val expected = spark.read.parquet(s"$fixture/expected")
      .select("media_id", "res_width", "res_height",
        "res_r_mean", "res_g_mean", "res_b_mean")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // the resized payload is itself a decodable PNG of the resized dims
    val rp = resized.select("res_width", "res_height", "resized_payload")
      .collect() // fixture-scale: 25 rows
    rp.foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("resized_payload")))
      assert(img != null && img.getWidth == r.getInt(0) && img.getHeight == r.getInt(1))
    }
  }

  test("undecodable payloads fall back to byte-mean features with declared dims") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(20)
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val out = Multimodal.extractFeatures(spark, media)
      .select(col("media_id"), col("width"), size(col("features")).as("dim"),
        element_at(col("features"), 1).as("f0"))
      .collect()
    assert(out.length == 20)
    assert(out.forall(_.getInt(2) == 8), "fallback features are 8-wide")
    assert(out.forall(r => !r.isNullAt(3)))
  }

  test("JPEG rides the REAL decode path: dHash perceptually tracks the PNG twin") {
    // encode the same pixels as PNG and JPEG: if JPEG went through the
    // decode path its dHash is within a few bits of the lossless twin
    // (dHash's whole point); if it fell through to the byte lattice the
    // codes are unrelated (~32 bits apart in expectation)
    def encode(fmt: String, w: Int, h: Int, pix: Array[Int]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, w, h, pix, 0, w)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val w = 40; val h = 32
    val pix = Array.tabulate(w * h) { p =>
      val x = p % w; val y = p / w
      ((x * 6 + y) & 0xff) << 16 | ((y * 5 + x * 2) & 0xff) << 8 |
        ((x * 3 + y * 7) & 0xff)
    }
    def hash(bytes: Array[Byte]): (Long, Boolean) =
      Multimodal.decodeImage(bytes) match {
        case Some((dw, dh, dp)) => (Multimodal.dHash64(dp, dw, dh), true)
        case None => (Multimodal.dHash64Bytes(bytes), false)
      }
    val (hp, dp) = hash(encode("png", w, h, pix))
    val jb = encode("jpg", w, h, pix)
    val (hj, dj) = hash(jb)
    assert(dp && dj, "both codecs must decode")
    assert(java.lang.Long.bitCount(hp ^ hj) <= 6,
      s"JPEG dHash drifted ${java.lang.Long.bitCount(hp ^ hj)} bits from " +
        "the lossless twin — decode path broken")
    // the byte lattice over the SAME jpeg bytes is unrelated to the
    // perceptual code — proof the fallback is not silently absorbing it
    assert(java.lang.Long.bitCount(hj ^ Multimodal.dHash64Bytes(jb)) > 6)
  }

  test("resampleNearest is identity at equal dims and exact on uniform images") {
    val pix = Array.tabulate(12 * 8)(i => i * 7)
    assert(Multimodal.resampleNearest(pix, 12, 8, 12, 8).toSeq == pix.toSeq)
    val uniform = Array.fill(10 * 10)(0x00804020)
    val down = Multimodal.resampleNearest(uniform, 10, 10, 5, 5)
    assert(down.length == 25 && down.forall(_ == 0x00804020))
  }
}

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

  test("resampleNearest is identity at equal dims and exact on uniform images") {
    val pix = Array.tabulate(12 * 8)(i => i * 7)
    assert(Multimodal.resampleNearest(pix, 12, 8, 12, 8).toSeq == pix.toSeq)
    val uniform = Array.fill(10 * 10)(0x00804020)
    val down = Multimodal.resampleNearest(uniform, 10, 10, 5, 5)
    assert(down.length == 25 && down.forall(_ == 0x00804020))
  }
}

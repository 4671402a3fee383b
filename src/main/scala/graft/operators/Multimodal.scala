package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `BinaryType`
  * columns with typed metadata, plus batch decode / feature-extraction
  * operators.
  *
  * The decode step itself is a STUB (this container has no image/audio
  * codecs): `decodeImageStub` produces deterministic fake pixels derived
  * from the bytes. Everything AROUND it is the real Spark plumbing that
  * a production pipeline needs at 100 TB:
  *  - schema: binary payload + `media_meta` struct (mime/width/height/...)
  *  - partition-local batch processing via `mapPartitions` (the Scala
  *    analog of arrow-batched pandas UDFs): the codec is initialized once
  *    per partition, rows stream through it, nothing is collected;
  *  - feature extraction returning fixed-width arrays suitable for the
  *    Similarity operators.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Wrap a text table into a media table: payload bytes + typed metadata.
    * (Deterministic fake "images": the UTF-8 bytes of the text; metadata
    * derived from byte length — stands in for a parquet of real blobs.) */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("image/fake").as("mime"),
        (pmod(xxhash64(col(textCol)), lit(512)) + 16).cast("int").as("width"),
        (pmod(xxhash64(lit(7), col(textCol)), lit(512)) + 16).cast("int").as("height"),
        length(col(textCol).cast("binary")).cast("long").as("n_bytes")).as("media_meta"))

  /** STUB decoder: a real implementation would hand `payload` to an image
    * codec here. Deterministic fake: "pixel mean" = mean byte value,
    * computed as ONE double division then a float cast — both IEEE
    * round-to-nearest steps any engine reproduces bit-for-bit (the DuckDB
    * oracle does), unlike a float-accumulating mean. */
  private def decodeImageStub(payload: Array[Byte], w: Int, h: Int): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake keeps tests runnable
    val mean =
      if (payload.isEmpty) 0f
      else (payload.map(_ & 0xff).sum.toDouble / payload.length).toFloat
    Array.tabulate(8)(i => mean + i)
  }

  /** Batch feature extraction: partition-local iterator processing — the
    * codec state (here: none) is set up once per partition; at scale this
    * is where an ONNX session / JNI codec handle would live. Output:
    * (media_id, features array<float>). */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select(col("media_id").cast("long"), col("payload"),
      col("media_meta.width"), col("media_meta.height"))
      .mapPartitions { rows =>
        // per-partition init of the (stub) codec happens here, once
        rows.map { r =>
          val feats = decodeImageStub(r.getAs[Array[Byte]]("payload"),
            r.getAs[Int]("width"), r.getAs[Int]("height"))
          Row(r.getAs[Long]("media_id"), feats)
        }
      }(enc)
  }

  /** Resize plumbing: payload → strided payload (every `stride`-th byte —
    * the deterministic stand-in for an image resampler) with metadata
    * updated to match. Same mapPartitions batch shape as the decoder:
    * per-partition codec init, streaming rows, binary in/binary out. */
  def resizeStub(spark: SparkSession, media: DataFrame, stride: Int = 4): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", LongType),
      StructField("resized_bytes", LongType),
      StructField("resized_payload", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          // ??? <- real resampler goes here; stride keeps it deterministic
          val resized = Array.range(0, payload.length, stride).map(payload(_))
          Row(r.getAs[Long]("media_id"), payload.length.toLong,
            resized.length.toLong, resized)
        }
      }(enc)
  }

  /** Frame-sample plumbing for "video": deterministic sample offsets from
    * the payload — shows the explode-per-frame shape (1 row in → n frames
    * out) used by real frame extractors. */
  def sampleFrames(media: DataFrame, everyNBytes: Int = 64): DataFrame =
    media.select(col("media_id"), col("media_meta.n_bytes").as("n_bytes"),
      explode(sequence(lit(0L), greatest(col("media_meta.n_bytes") - 1, lit(0L)),
        lit(everyNBytes.toLong))).as("frame_offset"))
      .withColumn("frame_id",
        concat(col("media_id").cast("string"), lit("_"),
          col("frame_offset").cast("string")))
}

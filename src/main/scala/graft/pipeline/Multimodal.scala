package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines. Media is carried as an opaque `BINARY` column plus a
  * typed metadata struct; per-item compute runs as `mapPartitions`
  * over Arrow-sized batches so a real decoder drops in without
  * changing the plan shape.
  *
  * The decode kernels themselves are STUBBED with deterministic fakes
  * (image/audio codecs are not available in this container); the Spark
  * plumbing — schema, partitioning, batch iteration, output shape —
  * is real and tested.
  */
object Multimodal {

  /** Canonical media schema: follows the common open convention of
    * (binary payload + metadata), one row per media item.
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("format", StringType, nullable = true),
    )), nullable = true),
  ))

  /** STUB decode: a real implementation would decode the codec here.
    * The fake is deterministic in the bytes so tests are stable.
    */
  private def fakeDecodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { out(i % dim) += (bytes(i) & 0xFF) / 255.0f; i += 1 }
    }
    out
  }

  /** Feature extraction: binary -> fixed-dim float vector, executed
    * per-partition (distributed; no driver collect). Output keeps the
    * input's partitioning, so a downstream ANN/dedup join needs no
    * extra shuffle.
    */
  def extractFeatures(df: DataFrame, dim: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq :+ fakeDecodeFeatures(bytes, dim).toSeq)
      }
    }(enc)
  }

  /** Image resize stub: metadata-level transform (new dims recorded;
    * payload passthrough — a real kernel would re-encode bytes).
    */
  def resizeImages(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta", when(col("modality") === "image",
        col("meta").withField("width", lit(w)).withField("height", lit(h)))
      .otherwise(col("meta")))

  /** Video frame sampling stub: every `stride`-th frame index, bounded
    * by meta.n_frames — the explode pattern a real sampler would use
    * (one output row per sampled frame, parallelism preserved).
    */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame =
    df.where(col("modality") === "video" && col("meta.n_frames").isNotNull)
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("meta.n_frames") - 1, lit(0)), lit(stride))))

  /** Deterministic synthetic media table for tests/benches. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("id") % 3 + 1).cast("int")).as("modality"),
      // deterministic pseudo-payload
      unhex(md5(col("id").cast("string"))).as("content"),
      struct(
        (col("id") % 640 + 1).cast("int").as("width"),
        (col("id") % 480 + 1).cast("int").as("height"),
        lit(16000).cast("int").as("sample_rate"),
        (col("id") % 100 + 1).cast("int").as("n_frames"),
        lit("fake").as("format")).as("meta"))
  }
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, batch-shaped decode / feature-extract /
  * resize / frame-sample operators.
  *
  * The Spark-side contract is real — schema, partitioning (by payload
  * size so decode batches stay memory-bounded), operator signatures and
  * output shapes — while the codec itself is STUBBED with a
  * deterministic fake (this container ships no image/audio libraries).
  * A production build swaps `fakeDecode` for a real codec (e.g. a
  * Pandas UDF over mapInPandas in PySpark, or a JNI codec here) without
  * touching any caller.
  */
object Multimodal {

  /** media asset schema: id + modality + opaque payload + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("mime", StringType, nullable = true))), nullable = true)))

  /** Deterministic synthetic assets derived from the events table —
    * stands in for a real binary source (object store / Kafka). */
  def syntheticAssets(spark: SparkSession, eventsDf: DataFrame): DataFrame = {
    eventsDf.select(
      col("event_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("event_id") % 3 + 1).cast("int")).as("modality"),
      // payload: deterministic pseudo-bytes from the id (sha2 hex -> binary)
      to_binary(sha2(col("event_id").cast("string"), 256), lit("hex")).as("content"),
      struct(
        (col("event_id") % 640 + 32).cast("int").as("width"),
        (col("event_id") % 480 + 32).cast("int").as("height"),
        lit(16000).cast("int").as("sample_rate"),
        (col("event_id") % 30000 + 1000).as("duration_ms"),
        lit("application/x-fake").as("mime")).as("meta"))
  }

  /** STUB decode: a real implementation would decode pixels/samples; the
    * fake derives a fixed-shape feature vector from the payload bytes so
    * the whole pipeline (schema, batching, downstream joins) is
    * exercised end-to-end with deterministic values. */
  private def fakeDecode(content: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real codec goes here (e.g. JPEG decode + CNN features)
    if (content == null) return Array.fill(dim)(0.0f)
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      out(i) = ((content(i % content.length) & 0xff) / 255.0f) + (i % 7) * 0.01f
      i += 1
    }
    out
  }

  private val featureDim = 16

  /** decode + feature-extract: binary -> Array[Float] features.
    * Batch shape: runs per-partition; repartitionBySize first keeps
    * decode batches memory-bounded at scale. */
  def extractFeatures(df: DataFrame): DataFrame = {
    val f = udf((b: Array[Byte]) => fakeDecode(b, featureDim))
    df.withColumn("features", f(col("content")))
  }

  /** resize: metadata-level transform (the stub scales the target box;
    * a real impl would re-encode content). */
  def resize(df: DataFrame, maxW: Int, maxH: Int): DataFrame =
    df.withColumn("meta", struct(
      least(col("meta.width"), lit(maxW)).as("width"),
      least(col("meta.height"), lit(maxH)).as("height"),
      col("meta.sample_rate").as("sample_rate"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.mime").as("mime")))

  /** frame-sample: one row per sampled frame timestamp for videos. */
  def frameSample(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("modality") === "video")
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))))

  /** Partition by payload size so each task decodes a bounded byte
    * budget (the real-codec memory knob at 100 TB). */
  def repartitionBySize(df: DataFrame, targetPartitions: Int): DataFrame =
    df.repartitionByRange(targetPartitions, length(col("content")), col("media_id"))
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: media payloads ride as opaque `binary`
 * columns with typed metadata structs; decode/feature-extract/resize/
 * frame-sample run as batch-shaped `mapPartitions` kernels (per-partition
 * codec init, vectorizable batch loop) — the Scala analog of a Pandas-UDF
 * `mapInPandas` stage.
 *
 * The actual byte decoding is STUBBED (this container ships no image/audio
 * codecs): `FakeCodec` derives deterministic dimensions/frames from the
 * byte content, so the schema, partitioning, batch shape, and metadata
 * propagation — the Spark-side contract — are real and tested, and the stub
 * swaps for a JNI/FFI codec without touching the plan.
 */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, channels: Int, nFrames: Int, format: String)
  case class DecodedMedia(media_id: Long, meta: MediaMeta, feature: Seq[Float])

  /** STUB codec: dimensions/frames derived deterministically from bytes.
    * Replace `decode` with a real codec; the pipeline shape is unchanged. */
  object FakeCodec {
    def decode(bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length
      val head = if (n > 0) java.util.Arrays.hashCode(bytes.take(16)) else 0
      MediaMeta(
        width = 64 + math.floorMod(n, 256),
        height = 64 + math.floorMod(n * 7, 256),
        channels = 3,
        nFrames = 1 + math.floorMod(head, 8),
        format = "fake")
    }
    /** 8-dim deterministic "embedding" of the payload. */
    def feature(bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](8)
      var i = 0
      while (i < bytes.length) {
        out(i % 8) += (bytes(i) & 0xFF) / 255.0f
        i += 1
      }
      out
    }
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /**
   * Decode + feature-extract stage: input (media_id long, media binary);
   * one codec init per partition, then a batch loop — the mapInPandas shape.
   */
  def decodeAndExtract(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    df.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { rows =>
        // per-partition "codec" init happens here (stubbed as a no-op)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val m = FakeCodec.decode(bytes)
          Row(id, m.width, m.height, m.channels, m.nFrames, m.format,
            FakeCodec.feature(bytes).toSeq)
        }
      }(encoder)
  }

  /** Resize stage: pure metadata arithmetic over the decoded table. */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
    decoded
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame-sample stage: every `stride`-th frame index per media row. */
  def frameSample(decoded: DataFrame, stride: Int): DataFrame =
    decoded.select(col("media_id"),
      posexplode(sequence(lit(0), col("n_frames") - 1)).as(Seq("pos", "frame_idx")))
      .filter(col("frame_idx") % stride === 0)
      .groupBy("media_id").agg(collect_list("frame_idx").as("sampled_frames"),
        count(lit(1)).as("n_sampled"))
}

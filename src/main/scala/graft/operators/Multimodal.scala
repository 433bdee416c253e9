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
 * Two codecs behind one interface: [[ImageIoCodec]] really decodes
 * image bytes (PNG/BMP/GIF/JPEG via the in-JDK `javax.imageio` — headless,
 * no native deps), and [[FakeCodec]] derives deterministic metadata from
 * the byte content for oracle-reproducible tests over text payloads. The
 * Spark-side contract — schema, partitioning, batch shape, per-partition
 * codec init, metadata propagation — is identical for both; video/audio
 * formats (no pure-JVM decoder in this container) would slot in as another
 * [[Codec]] without touching the plan.
 */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, channels: Int, nFrames: Int, format: String)
  case class DecodedMedia(media_id: Long, meta: MediaMeta, feature: Seq[Float])

  /** Decode interface: one instance is created per PARTITION (codec init —
    * buffer pools, native contexts — amortizes over the batch, the
    * mapInPandas shape). Implementations must be cheap to construct or do
    * their heavy init lazily. */
  trait Codec extends Serializable {
    def decode(bytes: Array[Byte]): MediaMeta
    def feature(bytes: Array[Byte]): Array[Float]
    /** Both in one pass — the hot batch loop uses this; codecs whose decode
      * is the dominant cost (a full pixel decode) override it to decode the
      * payload ONCE. */
    def decodeAll(bytes: Array[Byte]): (MediaMeta, Array[Float]) =
      (decode(bytes), feature(bytes))
  }

  /** Deterministic byte-derived codec: dimensions/frames are pure functions
    * of the payload, so DuckDB oracles can recompute them over arbitrary
    * (e.g. text) payloads — q32/q33's grading path. */
  object FakeCodec extends Codec {
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

  /**
   * REAL image codec over the JDK's ImageIO (PNG, BMP, GIF, JPEG, WBMP —
   * headless, zero native dependencies). Undecodable payloads yield the
   * sentinel `format="undecodable"` row instead of failing the task: at
   * web scale a corrupt image must not kill a 10⁹-row partition, and the
   * sentinel keeps the drop VISIBLE and filterable downstream.
   */
  final class ImageIoCodec extends Codec {
    private def withReader[T](bytes: Array[Byte])(
        f: javax.imageio.ImageReader => T): Option[T] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          r.setInput(iis)
          try Some(f(r)) finally r.dispose()
        }
      } catch { case _: Exception => None } finally iis.close()
    }

    def decode(bytes: Array[Byte]): MediaMeta =
      withReader(bytes) { r =>
        val img = r.read(0)
        // allowSearch: GIF frame count needs a stream walk; bounded by input
        val frames = try math.max(r.getNumImages(true), 1)
          catch { case _: Exception => 1 }
        MediaMeta(r.getWidth(0), r.getHeight(0),
          img.getColorModel.getNumComponents, frames,
          r.getFormatName.toLowerCase)
      }.getOrElse(MediaMeta(0, 0, 0, 0, "undecodable"))

    private def pixelFeature(img: java.awt.image.BufferedImage,
        out: Array[Float]): Unit = {
      val (w, h) = (img.getWidth, img.getHeight)
      val hasAlpha = img.getColorModel.hasAlpha
      var (sr, sg, sb, sa) = (0.0, 0.0, 0.0, 0.0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff; sb += p & 0xff
          if (hasAlpha) sa += (p >>> 24) & 0xff
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble * 255.0
      out(0) = (sr / n).toFloat; out(1) = (sg / n).toFloat
      out(2) = (sb / n).toFloat; out(3) = (sa / n).toFloat
      out(4) = w / 1000.0f; out(5) = h / 1000.0f
      out(6) = img.getColorModel.getNumComponents.toFloat
      out(7) = w.toFloat / h
    }

    /** 8-dim content feature from REAL pixels: per-channel means (r, g, b,
      * alpha-or-0) plus normalized dims/frames/aspect. */
    def feature(bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](8)
      withReader(bytes) { r => pixelFeature(r.read(0), out) }
      out
    }

    /** One pixel decode serves both meta and feature — the batch loop's
      * dominant cost would otherwise be paid twice per row. */
    override def decodeAll(bytes: Array[Byte]): (MediaMeta, Array[Float]) = {
      val out = new Array[Float](8)
      val meta = withReader(bytes) { r =>
        val img = r.read(0)
        val frames = try math.max(r.getNumImages(true), 1)
          catch { case _: Exception => 1 }
        pixelFeature(img, out)
        MediaMeta(img.getWidth, img.getHeight,
          img.getColorModel.getNumComponents, frames,
          r.getFormatName.toLowerCase)
      }.getOrElse(MediaMeta(0, 0, 0, 0, "undecodable"))
      (meta, out)
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
   * `mkCodec` runs once per PARTITION (not per row), executor-side.
   */
  def decodeAndExtract(df: DataFrame,
      mkCodec: () => Codec = () => FakeCodec): DataFrame = {
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    df.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { rows =>
        val codec = mkCodec() // per-partition codec init
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (m, feat) = codec.decodeAll(bytes)
          Row(id, m.width, m.height, m.channels, m.nFrames, m.format,
            feat.toSeq)
        }
      }(encoder)
  }

  /**
   * Deterministic test-image renderer: one SOLID-COLOR image per id,
   * dimensions and color pure functions of the id, encoded through the
   * REAL `javax.imageio` writers (PNG for even ids, BMP for odd) with a
   * planted undecodable payload every 5th id. Purpose: drive the real
   * [[ImageIoCodec]] under a relational oracle — solid color + lossless
   * formats make every decoded property (dims, channels, format, frame
   * count, per-channel pixel means) an exact integer / single-division
   * function of the id that DuckDB replays value-for-value (q91):
   *
   *   width  = 8 + id % 9          r = id % 256        r_mean = r / 255
   *   height = 8 + (id*3) % 7      g = (id*7) % 256    (one IEEE division
   *   format = png | bmp | (id%5==0) undecodable       -> exactly rounded
   *   channels = 3, frames = 1 (0s for undecodable)       in both engines)
   *
   * Same mapPartitions shape as the decode stage: encoder state per
   * partition, batch loop; the bytes themselves are never graded (an
   * encoder is free to pick any valid compression), only what the real
   * decoder recovers from them.
   */
  def renderSolidImages(ids: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    ids.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          require(id >= 0, s"renderSolidImages needs nonnegative ids, got $id")
          val bytes =
            if (id % 5 == 0) s"not an image $id".getBytes("UTF-8")
            else {
              val w = 8 + (id % 9).toInt
              val h = 8 + ((id * 3) % 7).toInt
              val rgb = (((id % 256) << 16) | (((id * 7) % 256) << 8) |
                ((id * 13) % 256)).toInt
              val img = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) { img.setRGB(x, y, rgb); x += 1 }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img,
                if (id % 2 == 0) "png" else "bmp", bos)
              bos.toByteArray
            }
          Row(id, bytes)
        }
      }(enc)
  }

  /** Resize stage: pure metadata arithmetic over the decoded table. */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
    decoded
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame-sample stage: every `stride`-th frame index per media row.
    * Zero-frame rows (the real codec's `undecodable` sentinel) are dropped
    * first: `sequence(0, -1)` would otherwise DESCEND to `[0, -1]` and claim
    * frame 0 was sampled from a media with nothing to sample. */
  def frameSample(decoded: DataFrame, stride: Int): DataFrame =
    decoded.filter(col("n_frames") >= 1)
      .select(col("media_id"),
        posexplode(sequence(lit(0), col("n_frames") - 1)).as(Seq("pos", "frame_idx")))
      .filter(col("frame_idx") % stride === 0)
      .groupBy("media_id").agg(collect_list("frame_idx").as("sampled_frames"),
        count(lit(1)).as("n_sampled"))
}

package graft

import graft.model.ConflationSegment
import graft.sources.{MbTiles, RasterTiles}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Raster tile render: lossless 16-bit PNG round-trip against the
  * declarative pixel counts, deterministic bytes, saturation clamp,
  * vectorize inverse, and the format=png mbtiles container. */
class RasterTilesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val segments =
    graft.operators.ConflationPipeline.run(spark, 200, 20).cache()

  private def pixelSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Int, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
      r.getLong(4))).toSet

  test("decode(render) returns exactly the declarative pixel counts") {
    val expected = pixelSet(RasterTiles.pixelCounts(segments, 12)
      .select(col("tile_x"), col("tile_y"), col("px"), col("py"),
        least(col("cnt"), lit(RasterTiles.MaxVal.toLong)).as("value")))
    assert(expected.nonEmpty)
    val got = pixelSet(RasterTiles.vectorize(RasterTiles.render(segments, 12))
      .select(col("tile_x"), col("tile_y"), col("px"), col("py"), col("value")))
    assert(got == expected)
  }

  test("render is byte-deterministic across runs") {
    def shas(): Map[(Long, Long), String] =
      RasterTiles.render(segments, 12)
        .select(col("tile_x"), col("tile_y"), sha2(col("tile_data"), 256).as("sha"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    val a = shas(); val b = shas()
    assert(a.nonEmpty && a == b)
  }

  test("decodeStats matches stats computed straight from pixel counts") {
    val direct = RasterTiles.pixelCounts(segments, 12)
      .withColumn("v", least(col("cnt"), lit(RasterTiles.MaxVal.toLong)))
      .groupBy("tile_x", "tile_y")
      .agg(count(lit(1)).as("n_lit"), sum("v").as("px_sum"), max("v").as("max_px"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val decoded = RasterTiles.decodeStats(RasterTiles.render(segments, 12))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(decoded.nonEmpty && decoded == direct)
  }

  test("pixel values saturate at 65535, not wrap") {
    import spark.implicits._
    val lon = 10.123; val lat = 20.456
    val seg = ConflationSegment("r1", "g1", "i1", "i2", 1, 1, 0.0, 0.01, 0.0,
      Seq("n1", "n2"), Seq.fill(70000)(Seq(lon, lat)), "w1", "Motorway", true,
      Seq.empty)
    val rendered = RasterTiles.render(spark.createDataset(Seq(seg)), 12)
    val px = RasterTiles.decodePixels(
      rendered.select("tile_data").as[Array[Byte]].head())
    assert(px.size == 1 && px.head._3 == RasterTiles.MaxVal)
  }

  test("vectorize pixel-center lon/lat re-bins to the same pixel") {
    val n = (1L << 12) * RasterTiles.TileSize
    val rows = RasterTiles.vectorize(RasterTiles.render(segments, 12))
      .select(col("tile_x"), col("tile_y"), col("px"), col("py"),
        col("lon"), col("lat")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gx = math.floor((r.getDouble(4) + 180.0) / 360.0 * n).toLong
      val gy = math.floor((90.0 - r.getDouble(5)) / 180.0 * n).toLong
      assert(gx == r.getLong(0) * RasterTiles.TileSize + r.getInt(2))
      assert(gy == r.getLong(1) * RasterTiles.TileSize + r.getInt(3))
    }
  }

  test("format=png mbtiles container round-trips the raster tiles") {
    val dir = java.nio.file.Files.createTempDirectory("raster_mbtiles").toFile
    val path = new java.io.File(dir, "raster.mbtiles").getAbsolutePath
    val n = RasterTiles.writeMbtiles(segments, 12, path)
    val (meta, tiles) = MbTiles.read(path)
    assert(meta("format") == "png" && tiles.size.toLong == n && n > 0)
    // container payloads decode and carry the expected per-tile pixel sets
    // (MbTiles.read already returns XYZ orientation)
    val expected = pixelSet(RasterTiles.pixelCounts(segments, 12)
      .select(col("tile_x"), col("tile_y"), col("px"), col("py"),
        least(col("cnt"), lit(RasterTiles.MaxVal.toLong)).as("value")))
    val got = tiles.flatMap { case (_, x, y, data) =>
      RasterTiles.decodePixels(data).map { case (px, py, v) =>
        (x, y, px, py, v.toLong)
      }
    }.toSet
    assert(got == expected)
  }
}

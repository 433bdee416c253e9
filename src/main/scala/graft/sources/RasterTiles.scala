package graft.sources

import graft.model.ConflationSegment
import graft.operators.ConflationPipeline
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Raster face of the tile sink (north-star "raster↔vector tile
 * rasterization of match density"; the reference's tippecanoe step renders
 * the vector face, `bin/data_transforming/createMBTilesFromGeoJSON:22-57` —
 * raster heat tiles are the standard companion artifact a tile server
 * derives from the same density data).
 *
 * Shape: every conflation-segment vertex bins into a global pixel grid of
 * `2^zoom · 256` cells per axis (the same plate-carrée scheme as
 * [[graft.geo.Cell.tile]] / q41, eight extra bits of resolution); the
 * per-pixel vertex counts are a purely declarative explode + groupBy —
 * partial aggregation collapses a pixel's count map-side, so the shuffle
 * carries at most one row per LIT pixel, never per vertex. Only the final
 * PNG encode is imperative, and it runs executor-side per tile over a
 * bounded 256×256 grid (`mapGroups`), exactly like the MVT render
 * ([[Mvt.renderTiles]]). Driver memory is never touched until the optional
 * single-file [[MbTiles]] export, which streams by TILE count.
 *
 * Pixels are 16-bit grayscale (counts saturate at 65535) and PNG is
 * lossless, so decode([[render]]) returns the exact clamped counts — q54
 * grades the decoded statistics of the real PNG bytes against DuckDB's
 * independent recomputation from the raw vertex table, making the whole
 * encode→decode path oracle-checked. [[vectorize]] is the inverse
 * direction: raster tiles back to per-pixel point rows.
 */
object RasterTiles {

  /** Pixels per tile edge (the standard raster web-tile size). */
  final val TileSize = 256

  /** 16-bit grayscale saturation. */
  final val MaxVal = 65535

  /**
   * Per-pixel vertex counts at `zoom`: (tile_x, tile_y, px, py, cnt).
   * Declarative end to end; the global pixel index is computed ONCE
   * (`floor((lon+180)/360 · 2^zoom·256)`) and tile/pixel split with integer
   * ops, so tile assignment and in-tile position can never disagree at a
   * boundary the way two separately-rounded floating-point formulas could.
   * Zoom gate matches the q41 tile sink (tippecanoe minzoom rule).
   */
  def pixelCounts(segments: Dataset[ConflationSegment], zoom: Int): DataFrame = {
    val n = (1L << zoom) * TileSize
    segments.toDF()
      .filter(lit(zoom) >= ConflationPipeline.minZoomForNetworkLevel(col("networklevel")))
      .select(explode(col("coordinates")).as("pt"))
      .select(
        least(greatest(floor((element_at(col("pt"), 1) + lit(180.0)) / lit(360.0) * lit(n.toDouble)),
          lit(0.0)), lit((n - 1).toDouble)).cast("long").as("gx"),
        least(greatest(floor((lit(90.0) - element_at(col("pt"), 2)) / lit(180.0) * lit(n.toDouble)),
          lit(0.0)), lit((n - 1).toDouble)).cast("long").as("gy"))
      .select(expr(s"gx div $TileSize").as("tile_x"),
        expr(s"gy div $TileSize").as("tile_y"),
        (col("gx") % TileSize).cast("int").as("px"),
        (col("gy") % TileSize).cast("int").as("py"))
      .groupBy("tile_x", "tile_y", "px", "py")
      .agg(count(lit(1)).as("cnt"))
  }

  private def pngBytes(pixels: Iterator[(Int, Int, Long)]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(TileSize, TileSize,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val raster = img.getRaster
    pixels.foreach { case (px, py, c) =>
      raster.setSample(px, py, 0, math.min(c, MaxVal.toLong).toInt)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /**
   * Distributed raster render: one 256×256 16-bit-gray PNG per tile,
   * pixel value = min(vertex count, 65535). Returns
   * (zoom, tile_x, tile_y, tile_data). The PNG encoder is the in-JDK
   * ImageIO writer (deterministic bytes for a given raster — asserted by
   * RasterTilesSpec), initialized per executor thread, no native deps.
   */
  def render(segments: Dataset[ConflationSegment], zoom: Int): DataFrame = {
    val spark = segments.sparkSession
    import spark.implicits._
    pixelCounts(segments, zoom)
      .as[(Long, Long, Int, Int, Long)]
      .groupByKey(r => (r._1, r._2))
      .mapGroups { (key, it) =>
        (zoom, key._1, key._2, pngBytes(it.map(r => (r._3, r._4, r._5))))
      }
      .toDF("zoom", "tile_x", "tile_y", "tile_data")
  }

  /** Decode one PNG tile back to its non-zero pixels (px, py, value). */
  def decodePixels(png: Array[Byte]): Seq[(Int, Int, Int)] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    require(img != null, "tile_data is not a decodable image")
    val raster = img.getRaster
    val out = Seq.newBuilder[(Int, Int, Int)]
    var py = 0
    while (py < img.getHeight) {
      var px = 0
      while (px < img.getWidth) {
        val v = raster.getSample(px, py, 0)
        if (v != 0) out += ((px, py, v))
        px += 1
      }
      py += 1
    }
    out.result()
  }

  /**
   * Per-tile statistics of the RENDERED bytes — the decode side of the q54
   * round-trip: each tile's PNG is read back and its lit-pixel count, value
   * sum, and max must equal DuckDB's independent per-pixel recomputation
   * from the raw vertex table.
   */
  def decodeStats(rendered: DataFrame): DataFrame = {
    val spark = rendered.sparkSession
    import spark.implicits._
    rendered.select(col("zoom"), col("tile_x"), col("tile_y"), col("tile_data"))
      .as[(Int, Long, Long, Array[Byte])]
      .map { case (z, tx, ty, png) =>
        val px = decodePixels(png)
        (tx, ty, px.size.toLong, px.map(_._3.toLong).sum, px.map(_._3).max.toLong, z)
      }
      .toDF("tile_x", "tile_y", "n_lit", "px_sum", "max_px", "zoom")
  }

  /**
   * Raster → vector: explode rendered tiles back to per-pixel point rows
   * (tile_x, tile_y, px, py, value, lon, lat) with lon/lat at the pixel
   * CENTER — the inverse direction of the rasterization arrow. Narrow map
   * over the tile rows; output bounded by lit pixels.
   */
  def vectorize(rendered: DataFrame): DataFrame = {
    val spark = rendered.sparkSession
    import spark.implicits._
    rendered.select(col("zoom"), col("tile_x"), col("tile_y"), col("tile_data"))
      .as[(Int, Long, Long, Array[Byte])]
      .flatMap { case (z, tx, ty, png) =>
        val n = ((1L << z) * TileSize).toDouble
        decodePixels(png).map { case (px, py, v) =>
          val gx = tx * TileSize + px
          val gy = ty * TileSize + py
          (tx, ty, px, py, v.toLong,
            (gx + 0.5) / n * 360.0 - 180.0,
            90.0 - (gy + 0.5) / n * 180.0)
        }
      }
      .toDF("tile_x", "tile_y", "px", "py", "value", "lon", "lat")
  }

  /**
   * Single-file raster `.mbtiles` (format=png per the MBTiles spec) — the
   * raster companion of [[Mvt.writeMbtiles]]. Tile rows arrive through
   * `toLocalIterator`, but this is a DRIVER-side single-file export: the
   * SQLite page builder holds the whole file in memory, so driver memory is
   * bounded by total tile bytes (fine for the zoom-gated quick-look
   * artifact; the scale sinks are the parquet/PBF/tile-directory paths).
   */
  def writeMbtiles(segments: Dataset[ConflationSegment], zoom: Int,
      path: String): Long = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Array[Byte])]
    val it = render(segments, zoom).toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      rows += ((r.getInt(0), r.getLong(1), r.getLong(2), r.getAs[Array[Byte]](3)))
    }
    MbTiles.write(path, Seq(
      "name" -> "graft-conflation-raster", "format" -> "png",
      "type" -> "overlay", "version" -> "1"),
      rows.toSeq)
    rows.size.toLong
  }
}

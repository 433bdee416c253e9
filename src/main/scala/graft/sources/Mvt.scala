package graft.sources

import graft.model.ConflationSegment
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Clean-room Mapbox Vector Tile encoder (public spec:
 * github.com/mapbox/vector-tile-spec 2.1) — the payload format the
 * reference's tippecanoe step produces inside `.mbtiles`
 * (createMBTilesFromGeoJSON:22-57). One protobuf Tile message per
 * (zoom, x, y): a `segments` LINESTRING layer (extent 4096, zigzag
 * command-encoded deltas) whose features carry the conflation segment's
 * id/networklevel/roadClass tags, plus a `density` POINT layer with the
 * q41 per-tile aggregates — the vector AND "raster" (density) faces of the
 * tile sink in one artifact.
 *
 * Encoding is distributed: segments group by tile id, each tile's layer
 * renders executor-side into bytes; only the finished (tile, blob) rows —
 * bounded by TILE COUNT, not input rows — flow to the single-file
 * [[MbTiles]] container. Geometry is quantized to the tile's local grid;
 * vertices beyond the tile edge are kept (spec-legal, renderers clip).
 */
object Mvt {

  final val Extent = 4096

  // ---- protobuf building blocks (wire writer shared with OsmPbf) ----------

  private def zigzag32(v: Long): Long = (v << 1) ^ (v >> 31)

  /** MVT Value message: only the variants we emit. */
  private def valueMsg(v: Any): Array[Byte] = {
    val w = new OsmPbf.Writer
    v match {
      case s: String => w.strField(1, s)
      case d: Double => w.tag(3, 1).rawDoubleLE(d)
      case i: Long => w.varField(4, i)
      case i: Int => w.varField(4, i.toLong)
      case b: Boolean => w.varField(7, if (b) 1L else 0L)
      case other => w.strField(1, String.valueOf(other))
    }
    w.bytes
  }

  /** Geometry commands for one linestring in tile-local integer coords:
    * MoveTo(1,count=1) + LineTo(2,count=n-1), params zigzag deltas. */
  private def lineGeometry(pts: Seq[(Long, Long)]): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    var (px, py) = (0L, 0L)
    out += ((1L & 0x7) | (1L << 3)) // MoveTo ×1
    out += zigzag32(pts.head._1 - px); out += zigzag32(pts.head._2 - py)
    px = pts.head._1; py = pts.head._2
    val rest = pts.tail
    if (rest.nonEmpty) {
      out += ((2L & 0x7) | (rest.size.toLong << 3)) // LineTo ×(n-1)
      rest.foreach { case (x, y) =>
        out += zigzag32(x - px); out += zigzag32(y - py); px = x; py = y
      }
    }
    out.result()
  }

  private def pointGeometry(x: Long, y: Long): Seq[Long] =
    Seq((1L & 0x7) | (1L << 3), zigzag32(x), zigzag32(y))

  final case class MvtFeature(id: Long, geomType: Int, geometry: Seq[Long],
      tags: Seq[(String, Any)])

  /** One Layer message (version 2, extent 4096) with a shared key/value
    * dictionary built across the layer's features. */
  def layer(name: String, features: Seq[MvtFeature]): Array[Byte] = {
    val keys = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val values = scala.collection.mutable.LinkedHashMap.empty[Seq[Byte], (Int, Array[Byte])]
    def keyIdx(k: String): Int = keys.getOrElseUpdate(k, keys.size)
    def valIdx(v: Any): Int = {
      val bytes = valueMsg(v)
      values.getOrElseUpdate(bytes.toSeq, (values.size, bytes))._1
    }
    val featMsgs = features.map { f =>
      val tagIdx = f.tags.flatMap { case (k, v) => Seq(keyIdx(k).toLong, valIdx(v).toLong) }
      val w = new OsmPbf.Writer
      w.varField(1, f.id)
      w.packed(2)(pw => tagIdx.foreach(pw.varint))
      w.varField(3, f.geomType.toLong)
      w.packed(4)(pw => f.geometry.foreach(pw.varint))
      w.bytes
    }
    val w = new OsmPbf.Writer
    w.varField(15, 2L).strField(1, name)
    featMsgs.foreach(w.lenField(2, _))
    keys.keys.foreach(w.strField(3, _))
    values.values.foreach { case (_, bytes) => w.lenField(4, bytes) }
    w.varField(5, Extent.toLong)
    w.bytes
  }

  /** Tile message = repeated Layer in field 3. */
  def tile(layers: Seq[Array[Byte]]): Array[Byte] = {
    val w = new OsmPbf.Writer
    layers.foreach(w.lenField(3, _))
    w.bytes
  }

  private def gzipBytes(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  /** Tile-local quantization for the repo's equirectangular tile scheme
    * (the q16/q41 math): tile (x,y) at `zoom` covers lon [west, west+dLon),
    * lat (north-dLat, north]. */
  private[sources] def quantize(lon: Double, lat: Double, tx: Long, ty: Long,
      zoom: Int): (Long, Long) = {
    val n = 1L << zoom
    val dLon = 360.0 / n
    val dLat = 180.0 / n
    val west = tx * dLon - 180.0
    val north = 90.0 - ty * dLat
    (math.round((lon - west) / dLon * Extent),
      math.round((north - lat) / dLat * Extent))
  }

  /**
   * Distributed MVT render of the conflation segments: one gzipped Tile
   * blob per (zoom, tile_x, tile_y), with the `segments` line layer and the
   * `density` point aggregate layer. Tile assignment and the zoom gate
   * match [[graft.operators.ConflationPipeline.tiles]] exactly (same first-
   * vertex rule, same networklevel→minZoom gate) so the mbtiles artifact
   * carries precisely the q41-graded tile set.
   */
  def renderTiles(segments: Dataset[ConflationSegment], zoom: Int): DataFrame = {
    val spark = segments.sparkSession
    import spark.implicits._
    val gated = segments.toDF()
      .filter(lit(zoom) >= graft.operators.ConflationPipeline
        .minZoomForNetworkLevel(col("networklevel")))
      .select(col("shstReferenceId"), col("segmentIndex"),
        col("networklevel"), col("roadClass"),
        (col("endDist") - col("startDist")).as("len_km"),
        size(col("tmMeta")).as("n_tm"), col("coordinates"))
      // a degenerate row would null the tile key and kill the whole
      // render (kernel output always has ≥2 points; this guards hand-fed
      // inputs) — and a 1-point "line" would encode as a MoveTo with no
      // LineTo, which MVT 2.1 forbids for LINESTRING, so the guard
      // enforces the real invariant: ≥ 2 coordinates
      .filter(size(col("coordinates")) >= 2)
      .withColumn("first", element_at(col("coordinates"), 1))
      .withColumn("tile_x", graft.functions.geo.tile_x(
        element_at(col("first"), 1), lit(zoom)))
      .withColumn("tile_y", graft.functions.geo.tile_y(
        element_at(col("first"), 2), lit(zoom)))
    gated.as[(String, Int, Double, String, Double, Int,
        Seq[Seq[Double]], Seq[Double], Long, Long)]
      .groupByKey(r => (r._9, r._10))
      .mapGroups { (key, it) =>
        val (tx, ty) = key
        val rows = it.toVector.sortBy(r => (r._1, r._2))
        val feats = rows.zipWithIndex.map { case (r, i) =>
          val pts = r._7.map(c => quantize(c.head, c(1), tx, ty, zoom))
          MvtFeature(i + 1L, 2, lineGeometry(pts), Seq(
            "ref" -> s"${r._1}:${r._2}",
            "networklevel" -> r._3,
            "road_class" -> r._4,
            "len_km" -> r._5))
        }
        val nSegs = rows.size.toLong
        val totalKm = rows.map(_._5).sum
        val density = rows.map(_._6.toLong).sum
        val densityFeat = MvtFeature(1L, 1,
          pointGeometry(Extent / 2, Extent / 2), Seq(
            "n_segments" -> nSegs, "total_km" -> totalKm,
            "match_density" -> density))
        (zoom, tx, ty, gzipBytes(tile(Seq(
          layer("segments", feats), layer("density", Seq(densityFeat))))))
      }
      .toDF("zoom", "tile_x", "tile_y", "tile_data")
  }

  /** The full tippecanoe-analog export: distributed MVT render → single
    * `.mbtiles` file (format=pbf per the MBTiles spec). */
  def writeMbtiles(segments: Dataset[ConflationSegment], zoom: Int,
      path: String): Long = {
    // no cluster-side orderBy: MbTiles.write re-sorts driver-side after the
    // TMS y-flip anyway, so a distributed range-partition+sort is pure waste
    val rendered = renderTiles(segments, zoom)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Array[Byte])]
    val it = rendered.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      rows += ((r.getInt(0), r.getLong(1), r.getLong(2), r.getAs[Array[Byte]](3)))
    }
    MbTiles.write(path, Seq(
      "name" -> "graft-conflation", "format" -> "pbf",
      "type" -> "overlay", "version" -> "1",
      "json" -> """{"vector_layers":[{"id":"segments"},{"id":"density"}]}"""),
      rows.toSeq)
    rows.size.toLong
  }

  // ---- minimal decoder (round-trip spec support) ---------------------------

  final case class DecodedFeature(id: Long, geomType: Int,
      commands: Seq[Long], tags: Map[String, Any])
  final case class DecodedLayer(name: String, extent: Int,
      features: Seq[DecodedFeature])

  def decode(tileBytes: Array[Byte]): Seq[DecodedLayer] = {
    val r = new ShstTiles.Reader(tileBytes, 0, tileBytes.length)
    val layers = Seq.newBuilder[DecodedLayer]
    while (r.hasRemaining) {
      val (t, w) = r.readTag()
      if (t == 3 && w == 2) layers += decodeLayer(r.sub()) else r.skip(w)
    }
    layers.result()
  }

  private def decodeLayer(r: ShstTiles.Reader): DecodedLayer = {
    var name = ""
    var extent = 4096
    val keys = Seq.newBuilder[String]
    val values = Seq.newBuilder[Any]
    val rawFeats = Seq.newBuilder[ShstTiles.Reader]
    while (r.hasRemaining) {
      val (t, w) = r.readTag()
      (t, w) match {
        case (1, 2) => name = r.readString()
        case (2, 2) => rawFeats += r.sub()
        case (3, 2) => keys += r.readString()
        case (4, 2) =>
          val v = r.sub()
          var out: Any = null
          while (v.hasRemaining) {
            val (vt, vw) = v.readTag()
            (vt, vw) match {
              case (1, 2) => out = v.readString()
              case (3, 1) => out = v.readDoubleLE()
              case (4, 0) => out = v.readVarint()
              case (7, 0) => out = v.readVarint() != 0
              case (_, ww) => v.skip(ww)
            }
          }
          values += out
        case (5, 0) => extent = r.readVarint().toInt
        case (_, ww) => r.skip(ww)
      }
    }
    val ks = keys.result(); val vs = values.result()
    val feats = rawFeats.result().map { f =>
      var id = 0L; var gt = 0
      val tagIdx = Seq.newBuilder[Long]
      val geom = Seq.newBuilder[Long]
      while (f.hasRemaining) {
        val (t, w) = f.readTag()
        (t, w) match {
          case (1, 0) => id = f.readVarint()
          case (2, _) =>
            if (w == 2) { val s = f.sub(); while (s.hasRemaining) tagIdx += s.readVarint() }
            else tagIdx += f.readVarint()
          case (3, 0) => gt = f.readVarint().toInt
          case (4, _) =>
            if (w == 2) { val s = f.sub(); while (s.hasRemaining) geom += s.readVarint() }
            else geom += f.readVarint()
          case (_, ww) => f.skip(ww)
        }
      }
      val tags = tagIdx.result().grouped(2).collect {
        case Seq(k, v) => ks(k.toInt) -> vs(v.toInt)
      }.toMap
      DecodedFeature(id, gt, geom.result(), tags)
    }
    DecodedLayer(name, extent, feats)
  }

  /** Decode zigzag command stream back to absolute tile coords (lines). */
  def decodeLine(commands: Seq[Long]): Seq[(Long, Long)] = {
    def unzig(v: Long): Long = (v >>> 1) ^ -(v & 1)
    val out = Seq.newBuilder[(Long, Long)]
    var (x, y) = (0L, 0L)
    var i = 0
    while (i < commands.size) {
      val cmd = commands(i) & 0x7
      val count = (commands(i) >>> 3).toInt
      i += 1
      if (cmd == 1 || cmd == 2) {
        (0 until count).foreach { _ =>
          x += unzig(commands(i)); y += unzig(commands(i + 1)); i += 2
          out += ((x, y))
        }
      }
    }
    out.result()
  }
}

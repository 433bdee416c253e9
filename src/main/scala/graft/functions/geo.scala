package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftshim.Shim.{col => toCol, expr => toExpr}

/**
 * Column-level API over the custom geo expressions, plus SQL registration.
 *
 * `import graft.functions.geo._` gives the DataFrame-side surface;
 * `geo.register(spark)` exposes the same functions to `spark.sql` /
 * `expr(...)` under snake_case names.
 */
object geo {

  def geodesic_length_km(line: Column): Column = toCol(GeodesicLength(toExpr(line)))

  def haversine_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    toCol(Haversine(toExpr(lon1), toExpr(lat1), toExpr(lon2), toExpr(lat2)))

  def final_bearing(line: Column): Column = toCol(FinalBearing(toExpr(line)))

  def bearing_delta(b1: Column, b2: Column): Column = toCol(BearingDelta(toExpr(b1), toExpr(b2)))

  def locate_along(line: Column, lon: Column, lat: Column): Column =
    toCol(LocateAlong(toExpr(line), toExpr(lon), toExpr(lat)))

  def nearest_point_on_line(line: Column, lon: Column, lat: Column): Column =
    toCol(NearestPointOnLine(toExpr(line), toExpr(lon), toExpr(lat)))

  def point_along(line: Column, dist: Column): Column =
    toCol(PointAlong(toExpr(line), toExpr(dist)))

  def line_slice_along(line: Column, start: Column, stop: Column): Column =
    toCol(LineSliceAlong(toExpr(line), toExpr(start), toExpr(stop)))

  def densify(line: Column): Column = toCol(Densify(toExpr(line)))

  def cell_encode(lon: Column, lat: Column, level: Column): Column =
    toCol(CellEncode(toExpr(lon), toExpr(lat), toExpr(level)))

  def cell_ring(cell: Column, k: Column): Column = toCol(CellRing(toExpr(cell), toExpr(k)))

  def cell_disk(cell: Column, k: Column): Column = toCol(CellDisk(toExpr(cell), toExpr(k)))

  def cell_cover_line(line: Column, level: Column): Column =
    toCol(CellCoverLine(toExpr(line), toExpr(level)))

  def geoprox_key(lon: Column, lat: Column): Column =
    toCol(GeoProxKey(toExpr(lon), toExpr(lat)))

  def within_ring(line: Column, ring: Column): Column =
    toCol(WithinRing(toExpr(line), toExpr(ring)))

  def point_in_ring(ring: Column, lon: Column, lat: Column): Column =
    toCol(PointInRing(toExpr(ring), toExpr(lon), toExpr(lat)))

  def frechet_km(a: Column, b: Column): Column = toCol(FrechetDistance(toExpr(a), toExpr(b)))

  def hausdorff_km(a: Column, b: Column): Column = toCol(HausdorffDistance(toExpr(a), toExpr(b)))

  def directed_hausdorff_km(a: Column, b: Column): Column =
    toCol(DirectedHausdorff(toExpr(a), toExpr(b)))

  def tile_x(lon: Column, zoom: Column): Column = toCol(TileX(toExpr(lon), toExpr(zoom)))

  def tile_y(lat: Column, zoom: Column): Column = toCol(TileY(toExpr(lat), toExpr(zoom)))

  /** Register all geo functions for SQL use on this session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def r(name: String)(builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression]
        => org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    r("geodesic_length_km") { case Seq(a) => GeodesicLength(a) }
    r("haversine_km") { case Seq(a, b, c, d) => Haversine(a, b, c, d) }
    r("final_bearing") { case Seq(a) => FinalBearing(a) }
    r("bearing_delta") { case Seq(a, b) => BearingDelta(a, b) }
    r("locate_along") { case Seq(a, b, c) => LocateAlong(a, b, c) }
    r("nearest_point_on_line") { case Seq(a, b, c) => NearestPointOnLine(a, b, c) }
    r("point_along") { case Seq(a, b) => PointAlong(a, b) }
    r("line_slice_along") { case Seq(a, b, c) => LineSliceAlong(a, b, c) }
    r("densify") { case Seq(a) => Densify(a) }
    r("cell_encode") { case Seq(a, b, c) => CellEncode(a, b, c) }
    r("cell_ring") { case Seq(a, b) => CellRing(a, b) }
    r("cell_disk") { case Seq(a, b) => CellDisk(a, b) }
    r("cell_cover_line") { case Seq(a, b) => CellCoverLine(a, b) }
    r("geoprox_key") { case Seq(a, b) => GeoProxKey(a, b) }
    r("within_ring") { case Seq(a, b) => WithinRing(a, b) }
    r("point_in_ring") { case Seq(a, b, c) => PointInRing(a, b, c) }
    r("frechet_km") { case Seq(a, b) => FrechetDistance(a, b) }
    r("hausdorff_km") { case Seq(a, b) => HausdorffDistance(a, b) }
    r("directed_hausdorff_km") { case Seq(a, b) => DirectedHausdorff(a, b) }
    r("tile_x") { case Seq(a, b) => TileX(a, b) }
    r("tile_y") { case Seq(a, b) => TileY(a, b) }
    r("cosine_sim") { case Seq(a, b) => CosineSim(a, b) }
  }
}

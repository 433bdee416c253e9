package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Codegen-capable Catalyst expressions over the geo kernel.
 *
 * These are the engine's custom scalar surface (SURVEY.md §2.8 F1–F13 and
 * §2.11): each generates a single static call into [[GeoFn]], so they stay
 * inside whole-stage codegen spans (no UDF boxing, no CodegenFallback).
 *
 * Reference semantics mirrored (citations into /root/reference):
 *  - GeodesicLength  ← turf.length        (getShstReferenceAuxProperties.js:89-92)
 *  - Haversine       ← turf.distance      (addMegaLevelMetadata.js:19-29)
 *  - FinalBearing    ← turf.bearing final (src/loaders/getTargetMapFeatureBearing.js:4-15)
 *  - LocateAlong     ← turf.nearestPointOnLine().properties.location
 *                                          (getOffsetsAlongShstRefForTargetMapSegments.js:31-37)
 *  - PointAlong      ← turf.along         (partitionShstReferenceByTargetMapsMatches/index.js:81)
 *  - LineSliceAlong  ← turf.lineSliceAlong (getOffsetsAlongShstRefForTargetMapSegments.js:45-57)
 *  - WithinRing      ← turf.booleanWithin (ShStReferenceFeatureIterator.js:26-31)
 *  - GeoProxKey      ← interleaved-hex curve (src/utils/getGeoProximityKey.js:5-19)
 *  - CellEncode/Ring/Cover, Frechet/Hausdorff: new (replace the external
 *    shst-match CLI, SharedStreetsMatcher.js:36-144, with cell-keyed joins +
 *    similarity scoring per BASELINE.json north_star).
 */

private[functions] object ExprHelp {
  val lineType: DataType = ArrayType(ArrayType(DoubleType))
}

case class GeodesicLength(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "geodesic_length_km"
  protected override def nullSafeEval(v: Any): Any =
    GeoFn.lengthKm(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeoFn.lengthKm($c)")
  protected override def withNewChildInternal(c: Expression): GeodesicLength = copy(c)
}

case class Haversine(lon1: Expression, lat1: Expression, lon2: Expression, lat2: Expression)
    extends QuaternaryExpression {
  override def first: Expression = lon1
  override def second: Expression = lat1
  override def third: Expression = lon2
  override def fourth: Expression = lat2
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "haversine_km"
  protected override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeoFn.haversineKm(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) => s"graft.functions.GeoFn.haversineKm($a, $b, $c, $d)")
  protected override def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Haversine =
    copy(a, b, c, d)
}

case class FinalBearing(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "final_bearing"
  protected override def nullSafeEval(v: Any): Any =
    GeoFn.finalBearing(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeoFn.finalBearing($c)")
  protected override def withNewChildInternal(c: Expression): FinalBearing = copy(c)
}

case class BearingDelta(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bearing_delta"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    GeoFn.bearingDelta(a.asInstanceOf[Double], b.asInstanceOf[Double])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoFn.bearingDelta($a, $b)")
  protected override def withNewChildrenInternal(l: Expression, r: Expression): BearingDelta =
    copy(l, r)
}

case class LocateAlong(line: Expression, lon: Expression, lat: Expression)
    extends TernaryExpression {
  override def first: Expression = line
  override def second: Expression = lon
  override def third: Expression = lat
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "locate_along"
  protected override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    GeoFn.locateAlong(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[Double], c.asInstanceOf[Double])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.functions.GeoFn.locateAlong($a, $b, $c)")
  protected override def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): LocateAlong =
    copy(a, b, c)
}

/** Returns array(lon, lat, distAlongKm, distToKm). */
case class NearestPointOnLine(line: Expression, lon: Expression, lat: Expression)
    extends TernaryExpression {
  override def first: Expression = line
  override def second: Expression = lon
  override def third: Expression = lat
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_point_on_line"
  protected override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    GeoFn.nearestPoint(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[Double], c.asInstanceOf[Double])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.functions.GeoFn.nearestPoint($a, $b, $c)")
  protected override def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): NearestPointOnLine =
    copy(a, b, c)
}

case class PointAlong(line: Expression, dist: Expression)
    extends BinaryExpression {
  override def left: Expression = line
  override def right: Expression = dist
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "point_along"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    GeoFn.pointAlong(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[Double])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoFn.pointAlong($a, $b)")
  protected override def withNewChildrenInternal(l: Expression, r: Expression): PointAlong =
    copy(l, r)
}

case class LineSliceAlong(line: Expression, start: Expression, stop: Expression)
    extends TernaryExpression {
  override def first: Expression = line
  override def second: Expression = start
  override def third: Expression = stop
  override def dataType: DataType = ExprHelp.lineType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "line_slice_along"
  protected override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    GeoFn.lineSliceAlong(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[Double], c.asInstanceOf[Double])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.functions.GeoFn.lineSliceAlong($a, $b, $c)")
  protected override def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): LineSliceAlong =
    copy(a, b, c)
}

case class Densify(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ExprHelp.lineType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "densify"
  protected override def nullSafeEval(v: Any): Any =
    GeoFn.densify(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeoFn.densify($c)")
  protected override def withNewChildInternal(c: Expression): Densify = copy(c)
}

case class CellEncode(lon: Expression, lat: Expression, level: Expression)
    extends TernaryExpression {
  override def first: Expression = lon
  override def second: Expression = lat
  override def third: Expression = level
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_encode"
  protected override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    GeoFn.cellEncode(a.asInstanceOf[Double], b.asInstanceOf[Double], c.asInstanceOf[Int])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.functions.GeoFn.cellEncode($a, $b, $c)")
  protected override def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): CellEncode =
    copy(a, b, c)
}

case class CellRing(cell: Expression, k: Expression)
    extends BinaryExpression {
  override def left: Expression = cell
  override def right: Expression = k
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_ring"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    GeoFn.cellRing(a.asInstanceOf[Long], b.asInstanceOf[Int])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoFn.cellRing($a, $b)")
  protected override def withNewChildrenInternal(l: Expression, r: Expression): CellRing =
    copy(l, r)
}

case class CellDisk(cell: Expression, k: Expression)
    extends BinaryExpression {
  override def left: Expression = cell
  override def right: Expression = k
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_disk"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    GeoFn.cellDisk(a.asInstanceOf[Long], b.asInstanceOf[Int])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoFn.cellDisk($a, $b)")
  protected override def withNewChildrenInternal(l: Expression, r: Expression): CellDisk =
    copy(l, r)
}

case class CellCoverLine(line: Expression, level: Expression)
    extends BinaryExpression {
  override def left: Expression = line
  override def right: Expression = level
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_cover_line"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    GeoFn.cellCoverLine(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[Int])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoFn.cellCoverLine($a, $b)")
  protected override def withNewChildrenInternal(l: Expression, r: Expression): CellCoverLine =
    copy(l, r)
}

case class GeoProxKey(lon: Expression, lat: Expression)
    extends BinaryExpression {
  override def left: Expression = lon
  override def right: Expression = lat
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "geoprox_key"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    GeoFn.geoProxKey(a.asInstanceOf[Double], b.asInstanceOf[Double])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoFn.geoProxKey($a, $b)")
  protected override def withNewChildrenInternal(l: Expression, r: Expression): GeoProxKey =
    copy(l, r)
}

/** True iff every vertex of `line` lies inside polygon `ring`. */
case class WithinRing(line: Expression, ring: Expression)
    extends BinaryExpression {
  override def left: Expression = line
  override def right: Expression = ring
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "within_ring"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    GeoFn.withinRing(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoFn.withinRing($a, $b)")
  protected override def withNewChildrenInternal(l: Expression, r: Expression): WithinRing =
    copy(l, r)
}

case class PointInRing(ring: Expression, lon: Expression, lat: Expression)
    extends TernaryExpression {
  override def first: Expression = ring
  override def second: Expression = lon
  override def third: Expression = lat
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "point_in_ring"
  protected override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    GeoFn.pointInRing(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[Double], c.asInstanceOf[Double])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.functions.GeoFn.pointInRing($a, $b, $c)")
  protected override def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): PointInRing =
    copy(a, b, c)
}

case class FrechetDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "frechet_km"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    GeoFn.frechetKm(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoFn.frechetKm($a, $b)")
  protected override def withNewChildrenInternal(l: Expression, r: Expression): FrechetDistance =
    copy(l, r)
}

case class HausdorffDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hausdorff_km"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    GeoFn.hausdorffKm(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoFn.hausdorffKm($a, $b)")
  protected override def withNewChildrenInternal(l: Expression, r: Expression): HausdorffDistance =
    copy(l, r)
}

/** Max distance (km) from any vertex of `left` to polyline `right` —
  * small iff `left` lies along `right` (one-sided containment score). */
case class DirectedHausdorff(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "directed_hausdorff_km"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    GeoFn.directedHausdorffKm(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoFn.directedHausdorffKm($a, $b)")
  protected override def withNewChildrenInternal(l: Expression, r: Expression): DirectedHausdorff =
    copy(l, r)
}

case class TileX(lon: Expression, zoom: Expression)
    extends BinaryExpression {
  override def left: Expression = lon
  override def right: Expression = zoom
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tile_x"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    GeoFn.tileX(a.asInstanceOf[Double], b.asInstanceOf[Int])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoFn.tileX($a, $b)")
  protected override def withNewChildrenInternal(l: Expression, r: Expression): TileX =
    copy(l, r)
}

case class TileY(lat: Expression, zoom: Expression)
    extends BinaryExpression {
  override def left: Expression = lat
  override def right: Expression = zoom
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tile_y"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    GeoFn.tileY(a.asInstanceOf[Double], b.asInstanceOf[Int])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoFn.tileY($a, $b)")
  protected override def withNewChildrenInternal(l: Expression, r: Expression): TileY =
    copy(l, r)
}

/**
 * Fused candidate scoring (the conflation matcher's hot pair kernel):
 * locate both feature endpoints along the reference, apply the
 * bidirectional + overlap gates, slice the reference, and compute the
 * directed-Hausdorff score — one [[GeoFn.matchScore]] call per pair
 * instead of the composed locate_along ×2 + line_slice_along +
 * directed_hausdorff_km chain (which re-converts the reference geometry
 * per call; the allocation traffic measured as the stage's 1.68×
 * 2→8-thread CPU inflation, BENCH.md r4). NULL when a gate drops the
 * pair, so the caller filters on isnotnull; results are bit-identical to
 * the composed chain (MatchScoreSpec pins equivalence).
 */
case class MatchScore(rGeom: Expression, fGeom: Expression, revOk: Expression,
    minOverlapKm: Double, maxHausdorffKm: Double)
    extends TernaryExpression {
  override def first: Expression = rGeom
  override def second: Expression = fGeom
  override def third: Expression = revOk
  override def dataType: DataType = MatchScore.schema
  override def nullable: Boolean = true
  override def prettyName: String = "match_score"
  protected override def nullSafeEval(r: Any, f: Any, rev: Any): Any =
    GeoFn.matchScore(r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      f.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      rev.asInstanceOf[Boolean], minOverlapKm, maxHausdorffKm)
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, f, rev) => s"""
      ${ev.value} = graft.functions.GeoFn.matchScore($r, $f, $rev,
        ${minOverlapKm}D, ${maxHausdorffKm}D);
      ${ev.isNull} = ${ev.value} == null;
    """)
  protected override def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): MatchScore =
    copy(a, b, c)
}

object MatchScore {
  /** struct<score: double, geometry: array<array<double>>> */
  val schema: DataType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("geometry", ExprHelp.lineType, nullable = false)))
}

/**
 * [[MatchScore]] fused one step further: the slice polyline never
 * materializes — endpoints, vertex count, geodesic length, and bbox are
 * accumulated in the same kernel pass ([[GeoFn.matchSummary]]). This is the
 * production matcher's form (ConflationPipeline.scoredCandidates); the
 * geometry-returning [[MatchScore]] stays as the API + equivalence anchor
 * (MatchScoreSpec pins field-for-field identity between the two).
 */
case class MatchSummary(rGeom: Expression, fGeom: Expression, revOk: Expression,
    minOverlapKm: Double, maxHausdorffKm: Double)
    extends TernaryExpression {
  override def first: Expression = rGeom
  override def second: Expression = fGeom
  override def third: Expression = revOk
  override def dataType: DataType = MatchSummary.schema
  override def nullable: Boolean = true
  override def prettyName: String = "match_summary"
  protected override def nullSafeEval(r: Any, f: Any, rev: Any): Any =
    GeoFn.matchSummary(r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      f.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      rev.asInstanceOf[Boolean], minOverlapKm, maxHausdorffKm)
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, f, rev) => s"""
      ${ev.value} = graft.functions.GeoFn.matchSummary($r, $f, $rev,
        ${minOverlapKm}D, ${maxHausdorffKm}D);
      ${ev.isNull} = ${ev.value} == null;
    """)
  protected override def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): MatchSummary =
    copy(a, b, c)
}

object MatchSummary {
  val schema: DataType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("mNumPts", IntegerType, nullable = false),
    StructField("msLon", DoubleType, nullable = false),
    StructField("msLat", DoubleType, nullable = false),
    StructField("meLon", DoubleType, nullable = false),
    StructField("meLat", DoubleType, nullable = false),
    StructField("mLenKm", DoubleType, nullable = false),
    StructField("mMinLon", DoubleType, nullable = false),
    StructField("mMinLat", DoubleType, nullable = false),
    StructField("mMaxLon", DoubleType, nullable = false),
    StructField("mMaxLat", DoubleType, nullable = false)))
}

package graft.functions

import graft.geo.{Geo, Cell}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/**
 * ArrayData-facing bridge between Catalyst and the pure geo kernel.
 *
 * Every method is a single static-call target for generated code
 * (`graft.functions.GeoFn.xxx(...)`), so the geo expressions participate in
 * whole-stage codegen without the expression tree knowing about the kernel.
 * Inputs are Catalyst `ArrayData` (array<array<double>> lines / rings);
 * outputs are Catalyst-native (primitives, UTF8String, GenericArrayData).
 */
object GeoFn {

  /** Catalyst array<array<double>> → kernel polyline. */
  def toLine(a: ArrayData): Array[Array[Double]] = {
    val n = a.numElements()
    val out = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val p = a.getArray(i)
      out(i) = Array(p.getDouble(0), p.getDouble(1))
      i += 1
    }
    out
  }

  /** Kernel polyline → Catalyst array<array<double>>. */
  def fromLine(line: Array[Array[Double]]): GenericArrayData = {
    val n = line.length
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = new GenericArrayData(line(i)); i += 1 }
    new GenericArrayData(out)
  }

  def lengthKm(a: ArrayData): Double = Geo.lengthKm(toLine(a))

  def haversineKm(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double =
    Geo.haversineKm(lon1, lat1, lon2, lat2)

  def finalBearing(a: ArrayData): Int = Geo.lineFinalBearing(toLine(a))

  def bearingDelta(b1: Double, b2: Double): Double = Geo.bearingDelta(b1, b2)

  def locateAlong(a: ArrayData, lon: Double, lat: Double): Double =
    Geo.locateAlong(toLine(a), lon, lat)

  /** (lon, lat, distAlongKm, distToKm) of nearest point on line. */
  def nearestPoint(a: ArrayData, lon: Double, lat: Double): GenericArrayData =
    new GenericArrayData(Geo.nearestPointOnLine(toLine(a), lon, lat))

  def pointAlong(a: ArrayData, distKm: Double): GenericArrayData =
    new GenericArrayData(Geo.along(toLine(a), distKm))

  def lineSliceAlong(a: ArrayData, startKm: Double, stopKm: Double): GenericArrayData =
    fromLine(Geo.lineSliceAlong(toLine(a), startKm, stopKm))

  def densify(a: ArrayData): GenericArrayData = fromLine(Geo.densify(toLine(a)))

  def cellEncode(lon: Double, lat: Double, level: Int): Long = Cell.encode(lon, lat, level)

  def cellRing(cellId: Long, k: Int): GenericArrayData =
    new GenericArrayData(Cell.ring(cellId, k))

  def cellDisk(cellId: Long, k: Int): GenericArrayData =
    new GenericArrayData(Cell.disk(cellId, k))

  def cellCoverLine(a: ArrayData, level: Int): GenericArrayData =
    new GenericArrayData(Cell.coverLine(toLine(a), level))

  def geoProxKey(lon: Double, lat: Double): UTF8String =
    UTF8String.fromString(Geo.geoProximityKey(lon, lat))

  def withinRing(line: ArrayData, ring: ArrayData): Boolean =
    Geo.lineWithinRing(toLine(ring), toLine(line))

  def pointInRing(ring: ArrayData, lon: Double, lat: Double): Boolean =
    Geo.pointInRing(toLine(ring), lon, lat)

  def frechetKm(a: ArrayData, b: ArrayData): Double = Geo.frechetKm(toLine(a), toLine(b))

  def hausdorffKm(a: ArrayData, b: ArrayData): Double = Geo.hausdorffKm(toLine(a), toLine(b))

  def directedHausdorffKm(a: ArrayData, b: ArrayData): Double =
    Geo.directedHausdorffKm(toLine(a), toLine(b))

  def tileX(lon: Double, zoom: Int): Long = Cell.tile(lon, 0.0, zoom)._2

  def tileY(lat: Double, zoom: Int): Long = Cell.tile(0.0, lat, zoom)._3

  /** Fused candidate scoring ([[Geo.matchScoreFlat]]): one flat conversion
    * per geometry, shared segment-length pass, early-exit threshold. Null
    * when any gate drops the pair; else struct(score, geometry). */
  def matchScore(r: ArrayData, f: ArrayData, revOk: Boolean,
      minOverlapKm: Double, maxHausdorffKm: Double): org.apache.spark.sql.catalyst.InternalRow = {
    val rn = r.numElements()
    val rx = new Array[Double](rn); val ry = new Array[Double](rn)
    var i = 0
    while (i < rn) { val p = r.getArray(i); rx(i) = p.getDouble(0); ry(i) = p.getDouble(1); i += 1 }
    val fn = f.numElements()
    val fx = new Array[Double](fn); val fy = new Array[Double](fn)
    i = 0
    while (i < fn) { val p = f.getArray(i); fx(i) = p.getDouble(0); fy(i) = p.getDouble(1); i += 1 }
    val res = Geo.matchScoreFlat(rx, ry, fx, fy, revOk, minOverlapKm, maxHausdorffKm)
    if (res == null) return null
    val m = res.line
    val mn = m.length / 2
    val pts = new Array[Any](mn)
    i = 0
    while (i < mn) { pts(i) = new GenericArrayData(Array(m(2 * i), m(2 * i + 1))); i += 1 }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    row.update(0, res.score)
    row.update(1, new GenericArrayData(pts))
    row
  }

  /** [[matchScore]] with the slice reduced to its summary in the same pass:
    * struct(score, mNumPts, msLon, msLat, meLon, meLat, mLenKm, mMinLon,
    * mMinLat, mMaxLon, mMaxLat). No per-point array materialization at all —
    * the length accumulates in [[Geo.lengthKm]]'s exact operation order, so
    * every field is bit-identical to computing it over matchScore's geometry
    * (MatchScoreSpec pins this). */
  def matchSummary(r: ArrayData, f: ArrayData, revOk: Boolean,
      minOverlapKm: Double, maxHausdorffKm: Double): org.apache.spark.sql.catalyst.InternalRow = {
    val rn = r.numElements()
    val rx = new Array[Double](rn); val ry = new Array[Double](rn)
    var i = 0
    while (i < rn) { val p = r.getArray(i); rx(i) = p.getDouble(0); ry(i) = p.getDouble(1); i += 1 }
    val fn = f.numElements()
    val fx = new Array[Double](fn); val fy = new Array[Double](fn)
    i = 0
    while (i < fn) { val p = f.getArray(i); fx(i) = p.getDouble(0); fy(i) = p.getDouble(1); i += 1 }
    val res = Geo.matchScoreFlat(rx, ry, fx, fy, revOk, minOverlapKm, maxHausdorffKm)
    if (res == null) return null
    val m = res.line
    val mn = m.length / 2
    var minLon = m(0); var maxLon = m(0); var minLat = m(1); var maxLat = m(1)
    var len = 0.0
    i = 1
    while (i < mn) {
      val x = m(2 * i); val y = m(2 * i + 1)
      if (x < minLon) minLon = x; if (x > maxLon) maxLon = x
      if (y < minLat) minLat = y; if (y > maxLat) maxLat = y
      len += Geo.haversineKm(m(2 * i - 2), m(2 * i - 1), x, y)
      i += 1
    }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(11)
    row.update(0, res.score)
    row.update(1, mn)
    row.update(2, m(0)); row.update(3, m(1))
    row.update(4, m(2 * mn - 2)); row.update(5, m(2 * mn - 1))
    row.update(6, len)
    row.update(7, minLon); row.update(8, minLat)
    row.update(9, maxLon); row.update(10, maxLat)
    row
  }
}

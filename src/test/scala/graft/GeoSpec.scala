package graft

import graft.geo.{Geo, Cell}
import org.scalatest.funsuite.AnyFunSuite

class GeoSpec extends AnyFunSuite {

  private val albany = Array(-73.8, 42.7) // reference dev county centroid
  private def line(pts: (Double, Double)*): Array[Array[Double]] =
    pts.map(p => Array(p._1, p._2)).toArray

  test("haversine: known distance (1 deg lat ≈ 111.195 km)") {
    val d = Geo.haversineKm(-73.8, 42.0, -73.8, 43.0)
    assert(math.abs(d - 111.195) < 0.01)
  }

  test("haversine symmetric and zero at identity") {
    assert(Geo.haversineKm(1, 2, 1, 2) == 0.0)
    assert(Geo.haversineKm(1, 2, 3, 4) == Geo.haversineKm(3, 4, 1, 2))
  }

  test("lengthKm sums segments") {
    val l = line((-73.8, 42.7), (-73.8, 42.71), (-73.8, 42.72))
    assert(math.abs(Geo.lengthKm(l) - Geo.haversineKm(-73.8, 42.7, -73.8, 42.72)) < 1e-9)
  }

  test("bearing: due north/east/south/west") {
    assert(math.abs(Geo.bearing(0, 0, 0, 1) - 0.0) < 1e-9)
    assert(math.abs(Geo.bearing(0, 0, 1, 0) - 90.0) < 0.01)
    assert(math.abs(math.abs(Geo.bearing(0, 0, 0, -1)) - 180.0) < 1e-9)
    assert(math.abs(Geo.bearing(0, 0, -1, 0) + 90.0) < 0.01)
  }

  test("finalBearing in [0,360) and ≈ initial bearing for short segments") {
    val fb = Geo.finalBearing(-73.8, 42.7, -73.79, 42.71)
    val ib = Geo.bearing(-73.8, 42.7, -73.79, 42.71)
    assert(fb >= 0 && fb < 360)
    assert(math.abs(fb - ((ib % 360) + 360) % 360) < 0.02)
  }

  test("destination + haversine round-trip") {
    val p = Geo.destination(-73.8, 42.7, 1.5, 37.0)
    assert(math.abs(Geo.haversineKm(-73.8, 42.7, p(0), p(1)) - 1.5) < 1e-6)
  }

  test("along: endpoint clamps and midpoint distance") {
    val l = line((-73.8, 42.7), (-73.8, 42.75))
    val total = Geo.lengthKm(l)
    assert(Geo.along(l, -1).sameElements(Array(-73.8, 42.7)))
    assert(Geo.along(l, total + 5).sameElements(Array(-73.8, 42.75)))
    val mid = Geo.along(l, total / 2)
    assert(math.abs(Geo.haversineKm(-73.8, 42.7, mid(0), mid(1)) - total / 2) < 1e-6)
  }

  test("lineSliceAlong: suffix from distance matches remaining length") {
    val l = line((-73.8, 42.7), (-73.79, 42.71), (-73.78, 42.71), (-73.77, 42.72))
    val total = Geo.lengthKm(l)
    val slice = Geo.lineSliceAlong(l, total * 0.25, Double.PositiveInfinity)
    assert(math.abs(Geo.lengthKm(slice) - total * 0.75) < 1e-6)
    val window = Geo.lineSliceAlong(l, total * 0.25, total * 0.5)
    assert(math.abs(Geo.lengthKm(window) - total * 0.25) < 1e-6)
  }

  test("nearestPointOnLine: vertex hit and interior projection") {
    val l = line((-73.8, 42.7), (-73.7, 42.7))
    val onVertex = Geo.nearestPointOnLine(l, -73.8, 42.7)
    assert(onVertex(3) < 1e-9 && onVertex(2) < 1e-9)
    // point north of the middle projects onto the interior
    val r = Geo.nearestPointOnLine(l, -73.75, 42.75)
    assert(math.abs(r(0) - -73.75) < 1e-4)
    assert(r(2) > 0 && r(2) < Geo.lengthKm(l))
    assert(math.abs(r(3) - Geo.haversineKm(-73.75, 42.75, r(0), r(1))) < 1e-9)
  }

  test("midpoint is equidistant") {
    val m = Geo.midpoint(-73.8, 42.7, -73.7, 42.8)
    val d1 = Geo.haversineKm(-73.8, 42.7, m(0), m(1))
    val d2 = Geo.haversineKm(-73.7, 42.8, m(0), m(1))
    assert(math.abs(d1 - d2) < 1e-9)
  }

  test("densify doubles segment count, preserves endpoints and ~length") {
    val l = line((-73.8, 42.7), (-73.79, 42.71), (-73.78, 42.72))
    val d = Geo.densify(l)
    assert(d.length == 5)
    assert(d(0).sameElements(l(0)) && d(4).sameElements(l(2)))
    assert(math.abs(Geo.lengthKm(d) - Geo.lengthKm(l)) < 1e-9)
  }

  test("bbox") {
    val b = Geo.bbox(line((-73.8, 42.7), (-73.7, 42.9), (-73.75, 42.6)))
    assert(b.sameElements(Array(-73.8, 42.6, -73.7, 42.9)))
  }

  test("pointInRing: square") {
    val sq = line((0, 0), (10, 0), (10, 10), (0, 10), (0, 0))
    assert(Geo.pointInRing(sq, 5, 5))
    assert(!Geo.pointInRing(sq, 15, 5))
    assert(!Geo.pointInRing(sq, -1, -1))
    assert(Geo.lineWithinRing(sq, line((1, 1), (9, 9))))
    assert(!Geo.lineWithinRing(sq, line((1, 1), (11, 9))))
  }

  test("geoProximityKey: interleaved hex of |lon|*1e5, |lat|*1e5") {
    // lon=-73.8 → 7380000 = 0x00709c20 ; lat=42.7 → 4270000 = 0x004127b0
    val k = Geo.geoProximityKey(-73.8, 42.7)
    assert(k.length == 16)
    assert(k == interleaved(f"${7380000}%08x", f"${4270000}%08x"))
    assert(k == interleaved("00709c20", "004127b0"))
  }
  private def interleaved(a: String, b: String): String =
    a.zip(b).flatMap { case (x, y) => Seq(x, y) }.mkString

  test("geoProximityKey monotone-ish: nearby points share prefix") {
    val k1 = Geo.geoProximityKey(-73.80001, 42.70001)
    val k2 = Geo.geoProximityKey(-73.80002, 42.70002)
    assert(k1.take(10) == k2.take(10))
  }

  test("hausdorff: identical lines → 0; offset lines → offset") {
    val a = line((-73.8, 42.7), (-73.7, 42.7))
    val b = line((-73.8, 42.701), (-73.7, 42.701))
    assert(Geo.hausdorffKm(a, a) == 0.0)
    val d = Geo.hausdorffKm(a, b)
    assert(math.abs(d - Geo.haversineKm(0, 42.7, 0, 42.701)) < 1e-4)
  }

  test("frechet: identical → 0; reversed direction is penalized") {
    val a = line((-73.8, 42.7), (-73.75, 42.7), (-73.7, 42.7))
    assert(Geo.frechetKm(a, a) == 0.0)
    val rev = a.reverse
    assert(Geo.frechetKm(a, rev) > Geo.hausdorffKm(a, rev) + 1.0)
  }

  test("bearingDelta folds to [0,180]") {
    assert(Geo.bearingDelta(10, 350) == 20.0)
    assert(Geo.bearingDelta(0, 180) == 180.0)
    assert(Geo.bearingDelta(90, 90) == 0.0)
  }

  // ---- Cell ----

  test("cell encode/center/level round-trip") {
    val id = Cell.encode(albany(0), albany(1), 12)
    assert(Cell.level(id) == 12)
    val (clon, clat) = Cell.center(id)
    val (w, h) = Cell.sizeDeg(12)
    assert(math.abs(clon - albany(0)) <= w / 2 + 1e-12)
    assert(math.abs(clat - albany(1)) <= h / 2 + 1e-12)
  }

  test("cell parent contains child") {
    val id = Cell.encode(albany(0), albany(1), 14)
    val p = Cell.parent(id, 10)
    assert(Cell.level(p) == 10)
    assert(p == Cell.encode(albany(0), albany(1), 10))
  }

  test("ring sizes: 1, 8, 16") {
    val id = Cell.encode(albany(0), albany(1), 12)
    assert(Cell.ring(id, 0).length == 1)
    assert(Cell.ring(id, 1).length == 8)
    assert(Cell.ring(id, 2).length == 16)
    assert(Cell.disk(id, 1).length == 9)
    assert(Cell.disk(id, 1).distinct.length == 9)
  }

  test("ring neighbors are adjacent cells") {
    val id = Cell.encode(albany(0), albany(1), 12)
    val (x, y) = Cell.xy(id)
    Cell.ring(id, 1).foreach { n =>
      val (nx, ny) = Cell.xy(n)
      assert(math.max(math.abs(nx - x), math.abs(ny - y)) == 1)
    }
  }

  test("coverLine covers both endpoints and interior of a long segment") {
    val l = line((-73.9, 42.7), (-73.5, 42.7))
    val cover = Cell.coverLine(l, 14)
    assert(cover.contains(Cell.encode(-73.9, 42.7, 14)))
    assert(cover.contains(Cell.encode(-73.5, 42.7, 14)))
    assert(cover.contains(Cell.encode(-73.7, 42.7, 14))) // interior sampled
    assert(cover.distinct.length == cover.length)
  }

  test("coverRing covers the polygon bbox") {
    val sq = line((-73.81, 42.69), (-73.79, 42.69), (-73.79, 42.71), (-73.81, 42.71), (-73.81, 42.69))
    val cover = Cell.coverRing(sq, 14)
    assert(cover.contains(Cell.encode(-73.8, 42.7, 14)))
  }

  test("tile: z/x/y stable and in range") {
    val (z, x, y) = Cell.tile(albany(0), albany(1), 12)
    assert(z == 12 && x >= 0 && x < (1L << 12) && y >= 0 && y < (1L << 12))
    // same point, higher zoom → child tile
    val (_, x2, y2) = Cell.tile(albany(0), albany(1), 13)
    assert(x2 >> 1 == x && y2 >> 1 == y)
  }
}

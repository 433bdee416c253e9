package graft.geo

/**
 * Pure-Scala geodesic kernel.
 *
 * Re-implements, from public formulas, the geometry semantics the reference
 * pipeline gets from turf.js (see SURVEY.md §2.8 F1–F13):
 *  - haversine distance / line length   (ref: getShstReferenceAuxProperties.js:89-92)
 *  - initial / final bearing            (ref: src/utils/getChainBearing.js:7-25)
 *  - destination / point-along-line     (ref: partitionShstReferenceByTargetMapsMatches/index.js:81)
 *  - line-slice-along                   (ref: getOffsetsAlongShstRefForTargetMapSegments.js:45-57)
 *  - nearest-point-on-line (locate)     (ref: getOffsetsAlongShstRefForTargetMapSegments.js:31-37)
 *  - point-in-polygon                   (ref: ShStReferenceFeatureIterator.js:26-31)
 *  - geo-proximity key (interleaved hex)(ref: src/utils/getGeoProximityKey.js:5-19)
 *  - discrete Fréchet / Hausdorff segment similarity (replaces the external
 *    shst-match CLI, ref: SharedStreetsMatcher.js:36-144 — new algorithm, not a port)
 *
 * All distances are kilometres; coordinates are (lon, lat) degrees, matching
 * GeoJSON axis order. Earth radius pinned to 6371.0088 km (IUGG mean radius,
 * the same constant turf.js publishes) so lengths are stable across rounds.
 *
 * Everything here is deterministic, allocation-light, and safe to call from
 * codegen'd Catalyst expressions and `flatMapGroups` kernels alike.
 */
object Geo {

  final val EarthRadiusKm: Double = 6371.0088
  private final val Deg2Rad = math.Pi / 180.0
  private final val Rad2Deg = 180.0 / math.Pi

  /** Haversine great-circle distance in km between (lon1,lat1) and (lon2,lat2). */
  def haversineKm(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val dLat = (lat2 - lat1) * Deg2Rad
    val dLon = (lon2 - lon1) * Deg2Rad
    val a = {
      val sLat = math.sin(dLat / 2)
      val sLon = math.sin(dLon / 2)
      sLat * sLat + math.cos(lat1 * Deg2Rad) * math.cos(lat2 * Deg2Rad) * sLon * sLon
    }
    2.0 * EarthRadiusKm * math.atan2(math.sqrt(a), math.sqrt(1.0 - a))
  }

  /** Geodesic length of a LineString (array of [lon,lat]) in km. */
  def lengthKm(coords: Array[Array[Double]]): Double = {
    var total = 0.0
    var i = 1
    while (i < coords.length) {
      total += haversineKm(coords(i - 1)(0), coords(i - 1)(1), coords(i)(0), coords(i)(1))
      i += 1
    }
    total
  }

  /** Initial great-circle bearing from p1 to p2, degrees in (-180, 180]. */
  def bearing(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val phi1 = lat1 * Deg2Rad
    val phi2 = lat2 * Deg2Rad
    val dLon = (lon2 - lon1) * Deg2Rad
    val y = math.sin(dLon) * math.cos(phi2)
    val x = math.cos(phi1) * math.sin(phi2) - math.sin(phi1) * math.cos(phi2) * math.cos(dLon)
    math.atan2(y, x) * Rad2Deg
  }

  /** Final bearing (bearing on arrival at p2), normalized to [0, 360).
    * turf's `{final: true}` semantics: reverse bearing + 180. */
  def finalBearing(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val b = bearing(lon2, lat2, lon1, lat1) + 180.0
    ((b % 360.0) + 360.0) % 360.0
  }

  /** Final bearing of the last segment of a line, rounded to Int like the
    * reference's getTargetMapFeatureBearing.js:4-15. */
  def lineFinalBearing(coords: Array[Array[Double]]): Int = {
    val n = coords.length
    math.round(finalBearing(coords(0)(0), coords(0)(1), coords(n - 1)(0), coords(n - 1)(1))).toInt
  }

  /** Great-circle destination point from (lon,lat) at bearing deg, dist km. */
  def destination(lon: Double, lat: Double, distKm: Double, bearingDeg: Double): Array[Double] = {
    val delta = distKm / EarthRadiusKm
    val theta = bearingDeg * Deg2Rad
    val phi1 = lat * Deg2Rad
    val lam1 = lon * Deg2Rad
    val sinPhi2 = math.sin(phi1) * math.cos(delta) + math.cos(phi1) * math.sin(delta) * math.cos(theta)
    val phi2 = math.asin(sinPhi2)
    val y = math.sin(theta) * math.sin(delta) * math.cos(phi1)
    val x = math.cos(delta) - math.sin(phi1) * sinPhi2
    val lam2 = lam1 + math.atan2(y, x)
    Array(lam2 * Rad2Deg, phi2 * Rad2Deg)
  }

  /** Point at distance `distKm` along the line (clamped to endpoints). */
  def along(coords: Array[Array[Double]], distKm: Double): Array[Double] = {
    if (distKm <= 0.0) return Array(coords(0)(0), coords(0)(1))
    var traveled = 0.0
    var i = 1
    while (i < coords.length) {
      val seg = haversineKm(coords(i - 1)(0), coords(i - 1)(1), coords(i)(0), coords(i)(1))
      if (traveled + seg >= distKm) {
        val remain = distKm - traveled
        if (remain <= 0.0 || seg == 0.0) return Array(coords(i - 1)(0), coords(i - 1)(1))
        val b = bearing(coords(i - 1)(0), coords(i - 1)(1), coords(i)(0), coords(i)(1))
        return destination(coords(i - 1)(0), coords(i - 1)(1), remain, b)
      }
      traveled += seg
      i += 1
    }
    Array(coords(coords.length - 1)(0), coords(coords.length - 1)(1))
  }

  /**
   * Slice of the line between startKm and stopKm distance-along.
   * Mirrors turf.lineSliceAlong: interpolated start/end vertices plus all
   * interior original vertices. stopKm = Double.PositiveInfinity gives the
   * suffix (reference passes ∞, getOffsetsAlongShstRefForTargetMapSegments.js:45-57).
   */
  def lineSliceAlong(coords: Array[Array[Double]], startKm: Double, stopKm: Double): Array[Array[Double]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var traveled = 0.0
    var started = startKm <= 0.0
    if (started) out += Array(coords(0)(0), coords(0)(1))
    var i = 1
    while (i < coords.length) {
      val p0 = coords(i - 1); val p1 = coords(i)
      val seg = haversineKm(p0(0), p0(1), p1(0), p1(1))
      val endOfSeg = traveled + seg
      if (!started && endOfSeg > startKm) {
        val b = bearing(p0(0), p0(1), p1(0), p1(1))
        out += destination(p0(0), p0(1), startKm - traveled, b)
        started = true
      }
      if (started) {
        if (endOfSeg >= stopKm) {
          if (stopKm > traveled) {
            val b = bearing(p0(0), p0(1), p1(0), p1(1))
            out += destination(p0(0), p0(1), stopKm - traveled, b)
          } else {
            out += Array(p0(0), p0(1))
          }
          return out.toArray
        }
        out += Array(p1(0), p1(1))
      }
      traveled = endOfSeg
      i += 1
    }
    if (out.length < 2) { // degenerate: start beyond line end
      val last = coords(coords.length - 1)
      out += Array(last(0), last(1))
      if (out.length < 2) out += Array(last(0), last(1))
    }
    out.toArray
  }

  /**
   * Nearest point on the line to pt: returns (lon, lat, distAlongKm, distToKm).
   * Per-segment projection in a local equirectangular frame (exact enough at
   * street scale), mirroring the role of turf.nearestPointOnLine's
   * `.properties.location` in the reference (SURVEY.md F4).
   */
  def nearestPointOnLine(coords: Array[Array[Double]], lon: Double, lat: Double): Array[Double] = {
    var bestLon = coords(0)(0); var bestLat = coords(0)(1)
    var bestAlong = 0.0; var bestDist = Double.MaxValue
    var traveled = 0.0
    var i = 1
    while (i < coords.length) {
      val ax = coords(i - 1)(0); val ay = coords(i - 1)(1)
      val bx = coords(i)(0); val by = coords(i)(1)
      val segLen = haversineKm(ax, ay, bx, by)
      // local planar frame: scale lon by cos(mean lat)
      val k = math.cos(((ay + by) / 2.0) * Deg2Rad)
      val dx = (bx - ax) * k; val dy = by - ay
      val px = (lon - ax) * k; val py = lat - ay
      val d2 = dx * dx + dy * dy
      val t = if (d2 == 0.0) 0.0 else math.max(0.0, math.min(1.0, (px * dx + py * dy) / d2))
      val cx = ax + (bx - ax) * t; val cy = ay + (by - ay) * t
      val dist = haversineKm(lon, lat, cx, cy)
      if (dist < bestDist) {
        bestDist = dist; bestLon = cx; bestLat = cy
        bestAlong = traveled + segLen * t
      }
      traveled += segLen
      i += 1
    }
    Array(bestLon, bestLat, bestAlong, bestDist)
  }

  /** Distance-along of the closest point (turf `.properties.location`). */
  def locateAlong(coords: Array[Array[Double]], lon: Double, lat: Double): Double =
    nearestPointOnLine(coords, lon, lat)(2)

  /** Geodesic midpoint of two points (used by the densify retry pass,
    * ref SharedStreetsMatcher.js:171-203). */
  def midpoint(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Array[Double] = {
    val d = haversineKm(lon1, lat1, lon2, lat2)
    val b = bearing(lon1, lat1, lon2, lat2)
    destination(lon1, lat1, d / 2.0, b)
  }

  /** Insert the geodesic midpoint into every segment (densification). */
  def densify(coords: Array[Array[Double]]): Array[Array[Double]] = {
    if (coords.length < 2) return coords
    val out = new Array[Array[Double]](coords.length * 2 - 1)
    var i = 0
    while (i < coords.length - 1) {
      out(2 * i) = coords(i)
      out(2 * i + 1) = midpoint(coords(i)(0), coords(i)(1), coords(i + 1)(0), coords(i + 1)(1))
      i += 1
    }
    out(out.length - 1) = coords(coords.length - 1)
    out
  }

  /** bbox as [minLon, minLat, maxLon, maxLat]. */
  def bbox(coords: Array[Array[Double]]): Array[Double] = {
    var minLon = Double.MaxValue; var minLat = Double.MaxValue
    var maxLon = -Double.MaxValue; var maxLat = -Double.MaxValue
    var i = 0
    while (i < coords.length) {
      val x = coords(i)(0); val y = coords(i)(1)
      if (x < minLon) minLon = x; if (x > maxLon) maxLon = x
      if (y < minLat) minLat = y; if (y > maxLat) maxLat = y
      i += 1
    }
    Array(minLon, minLat, maxLon, maxLat)
  }

  /** Ray-casting point-in-polygon (ring = closed or open array of [lon,lat]).
    * Points exactly on an edge count as inside. */
  def pointInRing(ring: Array[Array[Double]], lon: Double, lat: Double): Boolean = {
    var inside = false
    var i = 0
    var j = ring.length - 1
    while (i < ring.length) {
      val xi = ring(i)(0); val yi = ring(i)(1)
      val xj = ring(j)(0); val yj = ring(j)(1)
      val intersects = ((yi > lat) != (yj > lat)) &&
        (lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)
      if (intersects) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** All vertices of the line inside the polygon ring ⇒ "within"
    * (the reference's booleanWithin use is a containment gate on small
    * street geometries vs a state polygon — vertex test is its semantics
    * for LineStrings whose edges don't cross the boundary). */
  def lineWithinRing(ring: Array[Array[Double]], coords: Array[Array[Double]]): Boolean = {
    var i = 0
    while (i < coords.length) {
      if (!pointInRing(ring, coords(i)(0), coords(i)(1))) return false
      i += 1
    }
    true
  }

  // ---------------------------------------------------------------------
  // Geo-proximity key (reference: src/utils/getGeoProximityKey.js:5-19)
  // Interleaves the hex digits of |lon|*1e5 and |lat|*1e5 (each left-padded
  // to 8 hex digits) — a Morton/quadkey-style space-filling curve key.
  // ---------------------------------------------------------------------
  def geoProximityKey(lon: Double, lat: Double): String = {
    val lonHex = f"${math.abs(math.round(lon * 100000)).toInt}%08x"
    val latHex = f"${math.abs(math.round(lat * 100000)).toInt}%08x"
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    while (i < 8) {
      sb.append(lonHex.charAt(i))
      sb.append(latHex.charAt(i))
      i += 1
    }
    sb.toString
  }

  // ---------------------------------------------------------------------
  // Segment-similarity kernels (replace the external shst-match CLI).
  // Both operate on [lon,lat] polylines; distances in km.
  // ---------------------------------------------------------------------

  /** Directed Hausdorff distance from a to b (max over a's vertices of the
    * min distance to b's *segments*, via nearestPointOnLine). */
  def directedHausdorffKm(a: Array[Array[Double]], b: Array[Array[Double]]): Double = {
    var worst = 0.0
    var i = 0
    while (i < a.length) {
      val d = nearestPointOnLine(b, a(i)(0), a(i)(1))(3)
      if (d > worst) worst = d
      i += 1
    }
    worst
  }

  /** Symmetric Hausdorff distance in km. */
  def hausdorffKm(a: Array[Array[Double]], b: Array[Array[Double]]): Double =
    math.max(directedHausdorffKm(a, b), directedHausdorffKm(b, a))

  // ---------------------------------------------------------------------
  // Fused candidate-scoring kernel over FLAT coordinate arrays.
  //
  // Replaces the composed chain locate_along ×2 + line_slice_along +
  // directed_hausdorff_km in the conflation matcher's hottest stage. The
  // composed form re-converted the reference polyline to
  // Array[Array[Double]] once per call — 3|r|+|m|+|f| two-double
  // allocations per candidate pair — and the resulting allocator/cache
  // traffic was the measured source of the stage's 1.68× CPU inflation
  // between 2 and 8 local threads (N-vs-4N stage profile, BENCH.md r4).
  // This kernel converts each geometry once, shares one per-segment
  // length/prefix-sum pass between the two locates and the slice, and
  // early-exits the Hausdorff threshold test; every retained value is
  // bit-identical to the composed chain (same formulas, same accumulation
  // order, same comparison semantics — pinned by MatchScoreSpec).
  // ---------------------------------------------------------------------

  /** Survivor result: exact directed-Hausdorff score + interleaved
    * [x0,y0,x1,y1,...] match geometry (the lineSliceAlong output). */
  final class MatchResult(val score: Double, val line: Array[Double])

  /** Point-to-segment distance in the same local equirectangular frame as
    * [[nearestPointOnLine]] — identical arithmetic, flat inputs. */
  @inline private def segDistKm(ax: Double, ay: Double, bx: Double, by: Double,
      lon: Double, lat: Double): Double = {
    val k = math.cos(((ay + by) / 2.0) * Deg2Rad)
    val dx = (bx - ax) * k; val dy = by - ay
    val px = (lon - ax) * k; val py = lat - ay
    val d2 = dx * dx + dy * dy
    val t = if (d2 == 0.0) 0.0 else math.max(0.0, math.min(1.0, (px * dx + py * dy) / d2))
    val cx = ax + (bx - ax) * t; val cy = ay + (by - ay) * t
    haversineKm(lon, lat, cx, cy)
  }

  /** Distance-along of the nearest point — [[locateAlong]] with the
    * segment-length pass hoisted out (seg/cum precomputed by the caller in
    * the same sequential order, so `cum(i-1)` equals locateAlong's
    * `traveled` bit-for-bit). */
  private def locateFlat(rx: Array[Double], ry: Array[Double],
      seg: Array[Double], cum: Array[Double], lon: Double, lat: Double): Double = {
    var bestAlong = 0.0
    var bestDist = Double.MaxValue
    var i = 1
    while (i < rx.length) {
      val ax = rx(i - 1); val ay = ry(i - 1); val bx = rx(i); val by = ry(i)
      val k = math.cos(((ay + by) / 2.0) * Deg2Rad)
      val dx = (bx - ax) * k; val dy = by - ay
      val px = (lon - ax) * k; val py = lat - ay
      val d2 = dx * dx + dy * dy
      val t = if (d2 == 0.0) 0.0 else math.max(0.0, math.min(1.0, (px * dx + py * dy) / d2))
      val cx = ax + (bx - ax) * t; val cy = ay + (by - ay) * t
      val dist = haversineKm(lon, lat, cx, cy)
      if (dist < bestDist) { bestDist = dist; bestAlong = cum(i - 1) + seg(i) * t }
      i += 1
    }
    bestAlong
  }

  /** [[lineSliceAlong]] over flat arrays with precomputed segment lengths;
    * same vertex-emission logic including the post-loop degenerate fix
    * (and, like the original, NO degenerate fix on the early-return path). */
  private def sliceFlat(rx: Array[Double], ry: Array[Double], seg: Array[Double],
      startKm: Double, stopKm: Double): Array[Double] = {
    val out = new scala.collection.mutable.ArrayBuilder.ofDouble
    var n = 0
    var traveled = 0.0
    var started = startKm <= 0.0
    if (started) { out += rx(0); out += ry(0); n = 1 }
    var i = 1
    while (i < rx.length) {
      val endOfSeg = traveled + seg(i)
      if (!started && endOfSeg > startKm) {
        val b = bearing(rx(i - 1), ry(i - 1), rx(i), ry(i))
        val p = destination(rx(i - 1), ry(i - 1), startKm - traveled, b)
        out += p(0); out += p(1); n += 1
        started = true
      }
      if (started) {
        if (endOfSeg >= stopKm) {
          if (stopKm > traveled) {
            val b = bearing(rx(i - 1), ry(i - 1), rx(i), ry(i))
            val p = destination(rx(i - 1), ry(i - 1), stopKm - traveled, b)
            out += p(0); out += p(1)
          } else {
            out += rx(i - 1); out += ry(i - 1)
          }
          return out.result()
        }
        out += rx(i); out += ry(i); n += 1
      }
      traveled = endOfSeg
      i += 1
    }
    if (n < 2) {
      val lx = rx(rx.length - 1); val ly = ry(ry.length - 1)
      out += lx; out += ly; n += 1
      if (n < 2) { out += lx; out += ly }
    }
    out.result()
  }

  /**
   * Fused scoring of one candidate (reference r, feature f) pair:
   *
   *   s0 = locateAlong(r, f.head);  e0 = locateAlong(r, f.last)
   *   rev = revOk && s0 - e0 > minOverlapKm          (bidirectional gate)
   *   (s, e) = if (rev) (e0, s0) else (s0, e0)
   *   null unless e - s > minOverlapKm               (overlap gate)
   *   m = lineSliceAlong(r, s, e)
   *   null unless directedHausdorffKm(m, f) ≤ maxHausdorffKm
   *   → MatchResult(score, m)
   *
   * The threshold runs first as a prepass with per-vertex early exit
   * (max-min ≤ t ⟺ every m-vertex has some f-segment within t, so the
   * break cannot change the boolean); survivors then pay the exact score,
   * whose value equals directedHausdorffKm's (min and max over the same
   * distance sets are order-independent).
   */
  def matchScoreFlat(rx: Array[Double], ry: Array[Double],
      fx: Array[Double], fy: Array[Double], revOk: Boolean,
      minOverlapKm: Double, maxHausdorffKm: Double): MatchResult = {
    val rn = rx.length; val fn = fx.length
    if (rn == 0 || fn == 0) return null
    val seg = new Array[Double](rn)
    val cum = new Array[Double](rn)
    var i = 1
    while (i < rn) {
      seg(i) = haversineKm(rx(i - 1), ry(i - 1), rx(i), ry(i))
      cum(i) = cum(i - 1) + seg(i)
      i += 1
    }
    val s0 = locateFlat(rx, ry, seg, cum, fx(0), fy(0))
    val e0 = locateFlat(rx, ry, seg, cum, fx(fn - 1), fy(fn - 1))
    val rev = revOk && (s0 - e0 > minOverlapKm)
    val sRaw = if (rev) e0 else s0
    val eRaw = if (rev) s0 else e0
    if (!(eRaw - sRaw > minOverlapKm)) return null
    val m = sliceFlat(rx, ry, seg, sRaw, eRaw)
    val mn = m.length / 2
    // threshold prepass: reject at the first m-vertex with no f-segment
    // within maxHausdorffKm; accept a vertex at its first segment within
    i = 0
    while (i < mn) {
      val lon = m(2 * i); val lat = m(2 * i + 1)
      var ok = false
      var j = 1
      while (j < fn && !ok) {
        ok = segDistKm(fx(j - 1), fy(j - 1), fx(j), fy(j), lon, lat) <= maxHausdorffKm
        j += 1
      }
      if (!ok) return null
      i += 1
    }
    // exact score (survivors only) — value-identical to directedHausdorffKm
    var worst = 0.0
    i = 0
    while (i < mn) {
      val lon = m(2 * i); val lat = m(2 * i + 1)
      var best = Double.MaxValue
      var j = 1
      while (j < fn) {
        val d = segDistKm(fx(j - 1), fy(j - 1), fx(j), fy(j), lon, lat)
        if (d < best) best = d
        j += 1
      }
      if (best > worst) worst = best
      i += 1
    }
    new MatchResult(worst, m)
  }

  /** Discrete Fréchet distance in km (dynamic programming, O(|a||b|)).
    * Order-sensitive: distinguishes direction, unlike Hausdorff. */
  def frechetKm(a: Array[Array[Double]], b: Array[Array[Double]]): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return Double.MaxValue
    // rolling 2-row DP
    var prev = new Array[Double](m)
    var curr = new Array[Double](m)
    var j = 0
    var run = 0.0
    while (j < m) {
      val d = haversineKm(a(0)(0), a(0)(1), b(j)(0), b(j)(1))
      run = if (j == 0) d else math.max(run, d)
      prev(j) = run
      j += 1
    }
    var i = 1
    while (i < n) {
      var jj = 0
      while (jj < m) {
        val d = haversineKm(a(i)(0), a(i)(1), b(jj)(0), b(jj)(1))
        val best =
          if (jj == 0) prev(0)
          else math.min(math.min(prev(jj), prev(jj - 1)), curr(jj - 1))
        curr(jj) = math.max(best, d)
        jj += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m - 1)
  }

  /** Absolute bearing delta in degrees, folded to [0, 180]. */
  def bearingDelta(b1: Double, b2: Double): Double = {
    val d = math.abs(((b1 - b2) % 360.0 + 360.0) % 360.0)
    if (d > 180.0) 360.0 - d else d
  }
}

package graft.geo

/**
 * Hierarchical spatial cell index (quadkey / Z-order, S2-style levels).
 *
 * From-scratch design standing in for the reference's two locality devices:
 *  - the geoprox interleaved-hex key used as a clustered index
 *    (src/utils/getGeoProximityKey.js:5-19, targetMapsSQLiteService/index.js:27-38)
 *  - the zoom-12 quadkey tile cover used by the tile scraper
 *    (src/loaders/shst/scrapeMissingSharedStreetsGeometryFiles:35-80)
 *
 * A cell id packs (level, mortonCode) into one Long:
 *   id = (morton << 5) | level        — level ≤ 30, morton uses 2*level bits.
 * Equal-width lon/lat bins (plate carrée), which is exactly the Bing-quadkey
 * family the reference cites; fine for joins since both sides use the same
 * binning. Parent/child/neighbors are O(1) bit ops — codegen friendly.
 */
object Cell {

  final val MaxLevel = 30

  @inline private def clamp(v: Double, lo: Double, hi: Double): Double =
    if (v < lo) lo else if (v > hi) hi else v

  /** Interleave the low 30 bits of x (even positions) and y (odd positions). */
  private def interleave(x: Long, y: Long): Long = {
    var xx = x; var yy = y
    xx = (xx | (xx << 16)) & 0x0000FFFF0000FFFFL
    xx = (xx | (xx << 8)) & 0x00FF00FF00FF00FFL
    xx = (xx | (xx << 4)) & 0x0F0F0F0F0F0F0F0FL
    xx = (xx | (xx << 2)) & 0x3333333333333333L
    xx = (xx | (xx << 1)) & 0x5555555555555555L
    yy = (yy | (yy << 16)) & 0x0000FFFF0000FFFFL
    yy = (yy | (yy << 8)) & 0x00FF00FF00FF00FFL
    yy = (yy | (yy << 4)) & 0x0F0F0F0F0F0F0F0FL
    yy = (yy | (yy << 2)) & 0x3333333333333333L
    yy = (yy | (yy << 1)) & 0x5555555555555555L
    xx | (yy << 1)
  }

  /** Cell id containing (lon, lat) at `level` (0..30). */
  def encode(lon: Double, lat: Double, level: Int): Long = {
    val n = 1L << level
    val x = clamp(((lon + 180.0) / 360.0) * n, 0, n - 1).toLong
    val y = clamp(((lat + 90.0) / 180.0) * n, 0, n - 1).toLong
    (interleave(x, y) << 5) | level.toLong
  }

  def level(cellId: Long): Int = (cellId & 0x1FL).toInt

  /** (x, y) grid coordinates of the cell. */
  def xy(cellId: Long): (Long, Long) = {
    val m = cellId >>> 5
    (deinterleave(m), deinterleave(m >>> 1))
  }

  private def deinterleave(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >>> 1)) & 0x3333333333333333L
    x = (x | (x >>> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >>> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >>> 8)) & 0x0000FFFF0000FFFFL
    x = (x | (x >>> 16)) & 0x00000000FFFFFFFFL
    x
  }

  private def fromXY(x: Long, y: Long, lvl: Int): Long =
    (interleave(x, y) << 5) | lvl.toLong

  /** Parent cell at `parentLevel` < level(cellId). */
  def parent(cellId: Long, parentLevel: Int): Long = {
    val lvl = level(cellId)
    require(parentLevel <= lvl, s"parentLevel $parentLevel > level $lvl")
    val (x, y) = xy(cellId)
    fromXY(x >>> (lvl - parentLevel), y >>> (lvl - parentLevel), parentLevel)
  }

  /** Cell center (lon, lat). */
  def center(cellId: Long): (Double, Double) = {
    val lvl = level(cellId)
    val n = 1L << lvl
    val (x, y) = xy(cellId)
    ((x + 0.5) / n * 360.0 - 180.0, (y + 0.5) / n * 180.0 - 90.0)
  }

  /** Cell width/height in degrees at `level`. */
  def sizeDeg(lvl: Int): (Double, Double) = (360.0 / (1L << lvl), 180.0 / (1L << lvl))

  /**
   * Ring of cells at Chebyshev grid distance `k` around cellId (the 8k cells
   * of the square ring; k=0 → the cell itself). Drives kNN cell-ring
   * expansion (north_star) — expand k=0,1,2,... until enough candidates.
   */
  def ring(cellId: Long, k: Int): Array[Long] = {
    val lvl = level(cellId)
    val n = 1L << lvl
    val (cx, cy) = xy(cellId)
    if (k == 0) return Array(cellId)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var dx = -k
    while (dx <= k) {
      var dy = -k
      while (dy <= k) {
        if (math.max(math.abs(dx), math.abs(dy)) == k) {
          // wrap lon (x); clamp lat (y)
          val x = ((cx + dx) % n + n) % n
          val y = cy + dy
          if (y >= 0 && y < n) out += fromXY(x, y, lvl)
        }
        dy += 1
      }
      dx += 1
    }
    out.toArray
  }

  /** All cells within Chebyshev distance k (the (2k+1)² disk). */
  def disk(cellId: Long, k: Int): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i <= k) { out ++= ring(cellId, i); i += 1 }
    out.toArray
  }

  /** Distinct cells covering a polyline at `level`: cells of every vertex
    * plus densified intermediate samples so long segments don't skip cells. */
  def coverLine(coords: Array[Array[Double]], lvl: Int): Array[Long] = {
    val (wDeg, hDeg) = sizeDeg(lvl)
    val stepDeg = math.min(wDeg, hDeg) / 2.0
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var i = 0
    while (i < coords.length) {
      out += encode(coords(i)(0), coords(i)(1), lvl)
      if (i > 0) {
        val dx = coords(i)(0) - coords(i - 1)(0)
        val dy = coords(i)(1) - coords(i - 1)(1)
        val span = math.max(math.abs(dx), math.abs(dy))
        if (span > stepDeg) {
          val steps = math.ceil(span / stepDeg).toInt
          var s = 1
          while (s < steps) {
            val t = s.toDouble / steps
            out += encode(coords(i - 1)(0) + dx * t, coords(i - 1)(1) + dy * t, lvl)
            s += 1
          }
        }
      }
      i += 1
    }
    out.toArray
  }

  /** Cells covering a polygon ring's bbox, filtered to those whose center or
    * any corner is inside (or that contain a ring vertex) — a coarse cover
    * suitable for the containment-join prefilter (SURVEY.md J5). */
  def coverRing(ring0: Array[Array[Double]], lvl: Int): Array[Long] = {
    val bb = Geo.bbox(ring0)
    val n = 1L << lvl
    val x0 = clamp(((bb(0) + 180.0) / 360.0) * n, 0, n - 1).toLong
    val x1 = clamp(((bb(2) + 180.0) / 360.0) * n, 0, n - 1).toLong
    val y0 = clamp(((bb(1) + 90.0) / 180.0) * n, 0, n - 1).toLong
    val y1 = clamp(((bb(3) + 90.0) / 180.0) * n, 0, n - 1).toLong
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var x = x0
    while (x <= x1) {
      var y = y0
      while (y <= y1) { out += fromXY(x, y, lvl); y += 1 }
      x += 1
    }
    out.toArray
  }

  /** Web-Mercator-free "tile" assignment for the vector-tile sink analog
    * (S9): plate-carrée z/x/y from the same grid. Returns (z, x, y). */
  def tile(lon: Double, lat: Double, zoom: Int): (Int, Long, Long) = {
    val n = 1L << zoom
    val x = clamp(((lon + 180.0) / 360.0) * n, 0, n - 1).toLong
    val y = clamp(((90.0 - lat) / 180.0) * n, 0, n - 1).toLong
    (zoom, x, y)
  }
}

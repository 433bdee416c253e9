package graft.synth

import graft.geo.Geo
import graft.model._
import java.sql.Timestamp

/**
 * Deterministic synthetic-world generator (FIXTURES.md §1–§3).
 *
 * Everything derives from pure hashes — no wall clock, no RNG state — so any
 * slice of the world can be regenerated independently on any executor at any
 * scale: `page(i)` and `road(r)` are pure functions of their index. That is
 * what makes 100 TB-shape benchmarking possible without shipping data.
 *
 * World model: a grid "county" around (-73.8, 42.7) (the reference's Albany
 * dev subset, src/loaders/loadFeaturesFromGZippedNDSJON.js:36-39) containing
 * `nRoads` synthetic roads. Every web page deterministically geocodes to a
 * jittered sub-segment of one road (the graft: pages ↔ NPMRDS/RIS features);
 * the SharedStreets-style network derives from the same roads, chunked into
 * geometries with forward/back references (G1) and OSM waySection metadata.
 */
object Synth {

  // --- deterministic hashing (FNV-1a 64 + murmur3 fmix64 finalizer; raw
  // FNV low bits have too little entropy for small moduli) ----------------
  //
  // FNV-1a folds characters left to right, so hash64(a + b) can be computed
  // from the fold state after `a` plus a fold of `b` — WITHOUT allocating
  // the concatenated string. The generators below exploit that: the page
  // generator alone computed hash64(s"$url/w$i") ~50 times per page, and at
  // 6.4M pages those ~320M short-lived (String, char[]) pairs were the
  // single largest measured CPU+GC tax of the whole scaling run (stage
  // profile in BENCH.md round 4b: pages stage 216 CPU-s / 9.6 s GC at
  // local[8]). Values are bit-identical to the string forms (pinned by
  // SynthHashSpec).
  final val FnvSeed = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** FNV-1a fold of `s` onto state `h0` (no finalizer). */
  @inline def fnvFold(h0: Long, s: String): Long = {
    var h = h0
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= FnvPrime; i += 1 }
    h
  }

  /** FNV-1a fold of the decimal digits of `v` (≥ 0), most significant
    * first — exactly the fold of `v.toString`, zero allocations. */
  @inline def fnvFoldDigits(h0: Long, v: Long): Long = {
    var div = 1L
    while (v / div >= 10) div *= 10
    var h = h0
    var rest = v
    while (div > 0) {
      val d = rest / div
      h ^= ('0' + d).toLong; h *= FnvPrime
      rest -= d * div
      div /= 10
    }
    h
  }

  /** fmix64 avalanche finalizer (public-domain MurmurHash3). */
  @inline def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  def hash64(s: String): Long = fmix64(fnvFold(FnvSeed, s))
  /** bounded non-negative value from a finalized hash */
  @inline def modOf(h: Long, m: Int): Int = (((h % m) + m) % m).toInt
  /** uniform [0,1) from a finalized hash */
  @inline def fracOf(h: Long): Double = ((h >>> 11).toDouble) / (1L << 53).toDouble
  /** bounded non-negative hash */
  def hmod(s: String, m: Int): Int = modOf(hash64(s), m)
  /** uniform [0,1) from a hash */
  def hfrac(s: String): Double = fracOf(hash64(s))

  // --- world constants ---------------------------------------------------
  val Lon0 = -73.95
  val Lat0 = 42.55
  val CellDeg = 0.005 // ~410 m lon / ~556 m lat per grid cell

  /** Grid side grows with √nRoads so road density (and therefore spatial-
    * join fan-out per cell) stays constant as the world scales — the same
    * invariant a real planet-scale corpus has. ≥64 keeps small fixtures
    * identical across scales. */
  def gridCols(nRoads: Int): Int = math.max(64, math.ceil(math.sqrt(nRoads.toDouble) * 2).toInt)
  val RoadClasses = Vector("Motorway", "Trunk", "Primary", "Secondary", "Tertiary",
    "Residential", "Unclassified", "Service", "Other")

  /** Deterministic road polyline: seeded start cell + direction-biased walk.
    * 8–16 vertices, ~150–300 m steps. */
  def roadCoords(roadId: Int, nRoads: Int): Array[Array[Double]] = {
    val seedState = fnvFoldDigits(fnvFold(FnvSeed, "road/"), roadId.toLong)
    val g = gridCols(nRoads)
    val col = modOf(fmix64(fnvFold(seedState, "/c")), g)
    val row = modOf(fmix64(fnvFold(seedState, "/r")), g)
    var lon = Lon0 + col * CellDeg
    var lat = Lat0 + row * CellDeg
    val nV = 8 + modOf(fmix64(fnvFold(seedState, "/n")), 9)
    val baseDir = fracOf(fmix64(fnvFold(seedState, "/d"))) * 2 * math.Pi
    val wState = fnvFold(seedState, "/w")
    val sState = fnvFold(seedState, "/s")
    val out = new Array[Array[Double]](nV)
    var i = 0
    while (i < nV) {
      out(i) = Array(lon, lat)
      val wiggle = (fracOf(fmix64(fnvFoldDigits(wState, i))) - 0.5) * 0.9
      val dir = baseDir + wiggle
      val step = 0.0015 + fracOf(fmix64(fnvFoldDigits(sState, i))) * 0.0015
      lon += math.cos(dir) * step
      lat += math.sin(dir) * step * 0.75
      i += 1
    }
    out
  }

  def roadClass(roadId: Int): String = RoadClasses(hmod(s"road/$roadId/cls", RoadClasses.length))
  def roadRank(roadId: Int): Int = RoadClasses.indexOf(roadClass(roadId))
  def roadOneWay(roadId: Int): Boolean = hmod(s"road/$roadId/ow", 3) == 0

  // --- SharedStreets-style network (replaces the PBF tileset, SURVEY S2) --
  /** Chunk a road into geometries of `chunk` segments each; emit directed
    * references (forward always; back when not one-way — G1,
    * ShStReferenceFeatureIterator.js:64-144). */
  def shstReferencesForRoad(roadId: Int, nRoads: Int, chunk: Int = 3): Seq[ShstReference] = {
    val coords = roadCoords(roadId, nRoads)
    val cls = roadClass(roadId)
    val oneWay = roadOneWay(roadId)
    val nSeg = coords.length - 1
    val nChunks = (nSeg + chunk - 1) / chunk
    (0 until nChunks).flatMap { g =>
      val lo = g * chunk
      val hi = math.min(lo + chunk, nSeg)
      val geomCoords: Seq[Seq[Double]] = coords.slice(lo, hi + 1).map(_.toSeq).toSeq
      val nodeIds = (lo to hi).map(v => s"n${roadId}_$v")
      val geomId = s"g${roadId}_$g"
      val fromI = s"i${roadId}_$lo"
      val toI = s"i${roadId}_$hi"
      val ws = WaySection(s"w${roadId}_$g", nodeIds, cls, oneWay,
        roundabout = false, link = false, name = s"Road $roadId")
      val fwd = ShstReference(s"r${roadId}g${g}F", geomId, fromI, toI,
        isForward = true, cls, oneWay, geomCoords, Seq(ws))
      if (oneWay) Seq(fwd)
      else {
        val back = ShstReference(s"r${roadId}g${g}B", geomId, toI, fromI,
          isForward = false, cls, oneWay, geomCoords.reverse,
          Seq(ws.copy(nodeIds = nodeIds.reverse)))
        Seq(fwd, back)
      }
    }
  }

  def network(nRoads: Int): Seq[ShstReference] =
    (0 until nRoads).flatMap(shstReferencesForRoad(_, nRoads))

  /** Turn-restriction names the reference passes through opaquely. */
  val RestrictionTypes = Vector("no_left_turn", "no_right_turn", "no_u_turn",
    "only_straight_on")

  /** Deterministic raw turn restrictions: at interior chunk boundaries of a
    * road, via the boundary node, from the earlier way to the later way
    * (about half the boundaries carry one). */
  def restrictionsForRoad(roadId: Int, nRoads: Int,
      chunk: Int = 3): Seq[OsmRestriction] = {
    val nSeg = roadCoords(roadId, nRoads).length - 1
    val nChunks = (nSeg + chunk - 1) / chunk
    (1 until nChunks).flatMap { g =>
      if (hmod(s"road/$roadId/restr$g", 2) == 0) {
        val via = s"n${roadId}_${g * chunk}"
        val kind = RestrictionTypes(hmod(s"road/$roadId/rkind$g", RestrictionTypes.length))
        Some(OsmRestriction(via, s"w${roadId}_${g - 1}", via, s"w${roadId}_$g", kind))
      } else None
    }
  }

  // --- pages (graft input) ------------------------------------------------
  private val BaseTs = 1735689600000L // 2025-01-01T00:00:00Z, fixed epoch

  def pageUrl(i: Long, nRoads: Int): String = {
    val road = (i % nRoads).toInt
    val seq = i / nRoads
    s"https://example.test/albany/road$road/page$seq"
  }

  private val TextWords = Array("road", "traffic", "segment", "bridge", "county",
    "route", "travel", "miles", "lane", "speed", "network", "junction", "survey",
    "annual")
  private val Langs = Array("en", "de", "es")

  /** Deterministic page text; the engine must carry it byte-identically.
    * Hashes run incrementally off the url's fold state — one pass over the
    * url per page instead of one per word (bit-identical, SynthHashSpec). */
  def pageText(url: String): String = {
    val urlState = fnvFold(FnvSeed, url)
    val n = 20 + modOf(fmix64(fnvFold(urlState, "/len")), 60)
    val wState = fnvFold(urlState, "/w")
    val sb = new StringBuilder(16 + url.length + n * 9)
    sb.append("Report for ").append(url).append('.')
    var i = 0
    while (i < n) {
      sb.append(' ').append(TextWords(
        modOf(fmix64(fnvFoldDigits(wState, i)), TextWords.length)))
      if (i % 9 == 8) sb.append('.')
      i += 1
    }
    sb.append('.').toString
  }

  def page(i: Long, nRoads: Int): WebPage = {
    val url = pageUrl(i, nRoads)
    val text = pageText(url)
    val urlState = fnvFold(FnvSeed, url)
    val lang = Langs(modOf(fmix64(fnvFold(urlState, "/lang")), 3))
    val html = ("<html><body><p>" + text + "</p></body></html>").getBytes("UTF-8")
    new WebPage(url, new Timestamp(BaseTs + (fmix64(urlState) >>> 40)), html, text, lang)
  }

  // --- geocoder: page → target-map feature (the graft) --------------------
  /** Pure geocode: url/text → jittered sub-segment of the page's road plus
    * normalized targetMap* properties (P1/P2 analog). */
  def geocode(url: String, nRoads: Int): TargetMapFeature =
    geocode(url, pageText(url), nRoads)

  /** Slots per (road, targetMap): real NPMRDS/RIS features segment a road
    * into disjoint pieces, so feature identity is (tm, road, slot). Distinct
    * pages can geocode to the SAME feature id — the engine dedupes with
    * first-writer-wins like the reference's PK-conflict swallowing
    * (targetMapsSQLiteService/index.js:105-115, SURVEY §5.1.8). */
  val SlotsPerRoad = 4

  /** The feature id a url geocodes to — cheap (no geometry), for dedup keys. */
  def featureId(url: String, nRoads: Int): String = {
    val urlState = fnvFold(FnvSeed, url)
    val road = modOf(fmix64(fnvFold(urlState, "/road")), nRoads)
    val tm = if (modOf(fmix64(fnvFold(urlState, "/tm")), 2) == 0) "npmrds_2026" else "ris_2026"
    val slot = modOf(fmix64(fnvFold(urlState, "/slot")), SlotsPerRoad)
    s"${tm.take(1)}36001r${road}s$slot"
  }

  def geocode(url: String, text: String, nRoads: Int): TargetMapFeature = {
    val urlState = fnvFold(FnvSeed, url)
    val road = modOf(fmix64(fnvFold(urlState, "/road")), nRoads)
    val coords = roadCoords(road, nRoads)
    val roadLen = Geo.lengthKm(coords)
    val tm = if (modOf(fmix64(fnvFold(urlState, "/tm")), 2) == 0) "npmrds_2026" else "ris_2026"
    val slot = modOf(fmix64(fnvFold(urlState, "/slot")), SlotsPerRoad)
    val tmId = s"${tm.take(1)}36001r${road}s$slot"
    // the slot's disjoint sub-range of the road
    val a = slot * roadLen / SlotsPerRoad
    val b = (slot + 1) * roadLen / SlotsPerRoad
    val slice = Geo.lineSliceAlong(coords, a, b)
    // lateral jitter ±~6 m, keyed by FEATURE id so duplicate pages produce
    // byte-identical features (GPS noise analog)
    val tmIdState = fnvFold(FnvSeed, tmId)
    val jxState = fnvFold(tmIdState, "/jx")
    val jyState = fnvFold(tmIdState, "/jy")
    val jittered: Seq[Seq[Double]] = slice.zipWithIndex.map { case (p, k) =>
      Seq(p(0) + (fracOf(fmix64(fnvFoldDigits(jxState, k))) - 0.5) * 1.2e-4,
          p(1) + (fracOf(fmix64(fnvFoldDigits(jyState, k))) - 0.5) * 0.8e-4)
    }.toSeq
    val bearing = Geo.lineFinalBearing(jittered.map(_.toArray).toArray)
    val first = jittered.head
    TargetMapFeature(
      id = tmId,
      url = url,
      text = text,
      targetMap = tm,
      regionCode = "1",
      countyCode = "36001",
      geoproxKey = Geo.geoProximityKey(first(0), first(1)),
      targetMapId = tmId,
      targetMapMesoId = Some(s"36001|$road"),
      targetMapMacroId = Some(s"$road"),
      targetMapMegaId = Some(s"m${road / 16}"),
      targetMapIsPrimary = true,
      targetMapNetHrchyRank = roadRank(road),
      direction = Some(if (bearing <= 90 || bearing > 270) "NORTHBOUND" else "SOUTHBOUND"),
      roadOrder = Some(slot.toDouble),
      targetMapMicroLevelBearing = bearing,
      // meso level = the road corridor: its final bearing is the corridor
      // bearing every slot shares (addMesoLevelMetadata fallback input)
      targetMapMesoLevelBearing =
        math.round(Geo.lineFinalBearing(coords)).toInt,
      geometry = jittered)
  }
}

package graft.operators

import graft.geo.Geo
import scala.collection.mutable.ArrayBuffer

/**
 * Pure per-reference conflation kernel — the sequential algorithms the
 * reference runs row-at-a-time over SQLite cursors, re-expressed as a
 * deterministic Scala function applied per (shstReference × its matches)
 * group on executors (SURVEY.md §2.9 G5–G8, §2.4 A7).
 *
 * Faithful to the reference's observed semantics INCLUDING the §5.1 quirks
 * that change output rows:
 *  - overlap-removal priority is INPUT ORDER (the lodash sortBy/cloneDeep
 *    argument bug, removeTargetMapMatchSegmentsOverlaps.js:107-113)
 *  - first interval is admitted unconditionally (:116)
 *  - POFF snaps to 0 only when rawStart ≤ SPLIT_BUFF, NOFF snaps to 0 only
 *    when EXACTLY 0 (truthiness bug, getOffsetsAlongShstRefForTargetMapSegments.js:100-109)
 *  - snapShstMatchNodes computes a snapped start but returns
 *    startDist = raw POFF (snapping applied to end only, snapShstMatchNodes.js:157-162)
 *  - splitter's per-target-map assignment can use 6-dp-rounded interval ends
 *    against unrounded segment bounds (partitionShstReferenceByTargetMapsMatches/
 *    index.js:149-168) — behind `parityRound6` (default OFF: the round-up case
 *    silently drops a feature's own first segment, which breaks the QA
 *    length-conservation gate; a pinned test documents both behaviors)
 *  - segmentIndex is 1-based; totalSegments = |splitters| - 1 (:126-129)
 */
object ConflationKernel {

  /** src/conflation/constants.js:7-8 */
  final val SplitBuffKm = 0.010
  final val LengthRatioThreshold = 0.5

  /** A reference-geometry vertex with linear-referencing offsets
    * (getShstReferenceAuxProperties.js:60-77). */
  final case class RefVertex(lon: Double, lat: Double, osmNodeId: String, poff: Double, noff: Double)

  /** A matched interval along a reference, carrying target-map identity.
    * `rank`/`isPrimary` kept for the non-parity priority ordering. */
  final case class Interval(
      targetMap: String,
      targetMapId: String,
      matchedTargetMapId: String,
      matchedTargetMapMicroIdx: Int,
      isPrimary: Boolean,
      rank: Int,
      poff: Double,
      noff: Double,
      startDist: Double,
      endDist: Double)

  final case class SplitSegment(
      segmentIndex: Int,
      totalSegments: Int,
      startDist: Double,
      endDist: Double,
      nodeIds: Vector[String],
      coordinates: Vector[Array[Double]],
      tmAssignments: Vector[Interval])

  /**
   * G8: vertex sequence with adjacent-duplicate collapse, osmNodeId zip, and
   * cumulative POFF/NOFF. Returns None when the nodeId count disagrees with
   * the collapsed vertex count (the reference's punt path,
   * getShstReferenceAuxProperties.js:52-58).
   */
  def vertexSeq(coords: Array[Array[Double]], osmNodeIdsSeq: Vector[String]): Option[Vector[RefVertex]] = {
    if (osmNodeIdsSeq.isEmpty) return None
    val lenKm = Geo.lengthKm(coords)
    val collapsed = ArrayBuffer.empty[(Double, Double, String)]
    var i = 0
    while (i < coords.length) {
      val isDup = i != 0 && coords(i)(0) == collapsed.last._1 && coords(i)(1) == collapsed.last._2
      if (!isDup) {
        // nodeId indexed by ORIGINAL vertex position, as in the reference
        val nodeId = if (i < osmNodeIdsSeq.length) osmNodeIdsSeq(i) else null
        collapsed += ((coords(i)(0), coords(i)(1), nodeId))
      }
      i += 1
    }
    if (osmNodeIdsSeq.length != collapsed.length) return None
    val out = new Array[RefVertex](collapsed.length)
    var poff = 0.0
    i = 0
    while (i < collapsed.length) {
      val (lon, lat, nid) = collapsed(i)
      poff =
        if (i == 0) 0.0
        else if (i == collapsed.length - 1) lenKm
        else poff + Geo.haversineKm(collapsed(i - 1)._1, collapsed(i - 1)._2, lon, lat)
      out(i) = RefVertex(lon, lat, nid, poff, lenKm - poff)
      i += 1
    }
    // last vertex NOFF exactly 0 (reference sets POFF=len for the last vertex)
    out(out.length - 1) = out(out.length - 1).copy(poff = lenKm, noff = 0.0)
    Some(out.toVector)
  }

  /** Collapse adjacent-duplicate node ids across way sections
    * (getOsmNodeIdsSeq, getShstReferenceAuxProperties.js:10-21). */
  def osmNodeIdsSeq(waySectionNodeIds: Seq[Seq[String]]): Vector[String] = {
    val out = ArrayBuffer.empty[String]
    waySectionNodeIds.foreach(_.foreach { nid =>
      if (out.isEmpty || out.last != nid) out += nid
    })
    out.toVector
  }

  /**
   * G6 step 1: raw [start,end] offsets of a match along the reference
   * (getOffsetsAlongShstRefForTargetMapSegments.js:14-131). The end point is
   * located on the SUFFIX of the reference starting at
   * rawStart + matchLen/2 (loop-reference handling), then POFF/NOFF snapping
   * with the reference's exact (buggy) truthiness semantics.
   */
  def rawOffsets(refCoords: Array[Array[Double]], refLenKm: Double,
      matchCoords: Array[Array[Double]]): Option[(Double, Double, Double, Double)] = {
    val mStart = matchCoords(0)
    val mEnd = matchCoords(matchCoords.length - 1)
    rawOffsetsFromEndpoints(refCoords, refLenKm, mStart(0), mStart(1),
      mEnd(0), mEnd(1), Geo.lengthKm(matchCoords))
  }

  /** [[rawOffsets]] from the match-geometry SUMMARY (endpoints + geodesic
    * length) — all the kernel ever reads of a match geometry. Lets the
    * central conflation shuffle carry 5 doubles per match instead of the
    * full polyline (the summary is computed map-side with the same
    * Geo.lengthKm / element_at semantics, so values are bit-identical). */
  def rawOffsetsFromEndpoints(refCoords: Array[Array[Double]], refLenKm: Double,
      msLon: Double, msLat: Double, meLon: Double, meLat: Double,
      matchLen: Double): Option[(Double, Double, Double, Double)] = {
    val rawStart = Geo.locateAlong(refCoords, msLon, msLat)
    val sliceStart = rawStart + matchLen / 2
    val rest = Geo.lineSliceAlong(refCoords, sliceStart, Double.PositiveInfinity)
    val rawEndOnRest = Geo.locateAlong(rest, meLon, meLat)
    val rawEnd = sliceStart + rawEndOnRest
    if (rawStart > rawEnd) {
      // reference drops if inversion is small, throws otherwise — we drop
      // either way but keep the invariant observable via None
      return None
    }
    val poff = if (rawStart > SplitBuffKm) rawStart else 0.0
    // NOFF truthiness snap (§5.1.4): snaps only when the difference is exactly 0
    val noffRaw = refLenKm - rawEnd
    val noff = if (noffRaw != 0.0) noffRaw else 0.0
    val startDist = poff
    val endDist = refLenKm - noff
    val segLen = endDist - startDist
    if (segLen > SplitBuffKm) Some((poff, noff, startDist, endDist)) else None
  }

  /**
   * G6 step 2: snap match endpoints to existing reference vertices
   * (snapShstMatchNodes.js:25-163). NB the reference computes a snapped
   * start but RETURNS raw POFF as startDist (§5.1.3) — replicated.
   */
  def snapNodes(vertices: Vector[RefVertex], refLenKm: Double,
      poff: Double, noff: Double): Option[(Double, Double, Double, Double)] = {
    // end snapping (the only one that takes effect)
    val endDist: Double =
      if (noff <= SplitBuffKm) refLenKm
      else {
        var reusedIdx = -1
        var nearest = Double.PositiveInfinity
        var i = vertices.length - 1
        var done = false
        while (i > 0 && !done) {
          val d = math.abs(noff - vertices(i).noff)
          if (d < nearest) {
            nearest = d
            if (d <= SplitBuffKm / 2) reusedIdx = i
          } else done = true // distances monotone around the minimum
          i -= 1
        }
        if (reusedIdx != -1) vertices(reusedIdx).poff else refLenKm - noff
      }
    val segLen = endDist - poff
    if (segLen < SplitBuffKm && segLen / refLenKm < LengthRatioThreshold) None
    else Some((poff, noff, poff, endDist))
  }

  /**
   * A7: overlap removal. Priority order is the effective order of the
   * reference: INPUT ORDER when `parityInputOrder` (default, §5.1.1), else
   * the documented (isPrimary desc, rank asc, longest-first) order.
   */
  def removeOverlaps(input: Seq[Interval], threshold: Double = SplitBuffKm,
      parityInputOrder: Boolean = true): Vector[Interval] = {
    if (input.isEmpty) return Vector.empty
    val ranked = ArrayBuffer.empty[Interval]
    ranked ++= (if (parityInputOrder) input
                else input.sortBy(iv => (if (iv.isPrimary) -1 else 1, iv.rank, iv.startDist - iv.endDist)))
    val nonOverlapping = ArrayBuffer(ranked(0))
    var toAddIdx = 1
    while (toAddIdx < ranked.length) {
      var lower = ranked(toAddIdx)
      val stopIdx = nonOverlapping.length
      var h = 0
      var earlyBreak = false
      while (h < stopIdx && !earlyBreak) {
        val higher = nonOverlapping(h)
        // classify (removeTargetMapMatchSegmentsOverlaps.js:18-77)
        if (lower.startDist >= higher.endDist || lower.endDist <= higher.startDist) {
          // NO_OVERLAP
        } else if (lower.startDist >= higher.startDist && lower.endDist <= higher.endDist) {
          lower = lower.copy(startDist = 0, endDist = 0) // COVERED
        } else if (lower.startDist >= higher.startDist && lower.startDist < higher.endDist &&
            lower.endDist > higher.endDist) {
          lower = lower.copy(startDist = higher.endDist) // TRAILING overlap
        } else if (lower.startDist < higher.startDist && lower.endDist > higher.startDist &&
            lower.endDist <= higher.endDist) {
          lower = lower.copy(endDist = higher.startDist) // LEADING overlap
        } else if (lower.startDist < higher.startDist && lower.endDist > higher.endDist) {
          // COVERS: split — keep head, enqueue tail clone right after current
          val tail = lower.copy(startDist = higher.endDist)
          lower = lower.copy(endDist = higher.startDist)
          if (tail.endDist - tail.startDist > SplitBuffKm / 2)
            ranked.insert(toAddIdx + 1, tail)
        }
        if (lower.endDist - lower.startDist < threshold) earlyBreak = true
        h += 1
      }
      val len = lower.endDist - lower.startDist
      if (len > 0 && len >= threshold) nonOverlapping += lower
      toAddIdx += 1
    }
    nonOverlapping.sortBy(_.startDist).toVector
  }

  private def round6(v: Double): Double = math.rint(v * 1e6) / 1e6

  /**
   * G5: split the reference at the union of interval endpoints; emit one
   * sub-segment per adjacent offset pair with nodeIds + coordinate slice and
   * the overlapping per-target-map interval assignments
   * (partitionShstReferenceByTargetMapsMatches/index.js:38-193).
   */
  def split(refCoords: Array[Array[Double]], refLenKm: Double,
      vertices: Vector[RefVertex], intervals: Seq[Interval],
      parityRound6: Boolean = false): Vector[SplitSegment] = {
    if (intervals.isEmpty) return Vector.empty
    val splitters: Vector[Double] =
      (Vector(0.0, refLenKm) ++ intervals.flatMap(iv => Seq(iv.startDist, iv.endDist)))
        .sorted.distinct
    val verts = ArrayBuffer.empty[RefVertex]
    verts ++= vertices
    val segs = ArrayBuffer.empty[SplitSegment]
    var i = 1
    while (i < splitters.length) {
      val startDist = splitters(i - 1)
      val endDist = splitters(i)
      if (!verts.exists(_.poff == endDist)) {
        val p = Geo.along(refCoords, endDist)
        val nv = RefVertex(p(0), p(1), null, endDist, refLenKm - endDist)
        val insertIdx = verts.indexWhere(_.poff > endDist)
        if (insertIdx == -1) verts += nv else verts.insert(insertIdx, nv)
      }
      val nodeIds = ArrayBuffer.empty[String]
      val coords = ArrayBuffer.empty[Array[Double]]
      var j = 0
      var stop = false
      while (j < verts.length && !stop) {
        val v = verts(j)
        if (v.poff > endDist) stop = true
        else if (v.poff >= startDist) {
          nodeIds += v.osmNodeId
          coords += Array(v.lon, v.lat)
        }
        j += 1
      }
      segs += SplitSegment(i, splitters.length - 1, startDist, endDist,
        nodeIds.toVector, coords.toVector, Vector.empty)
      i += 1
    }
    // Per-target-map interval → segment assignment. The reference rounds the
    // interval ends to 6 dp but compares against UNROUNDED segment bounds
    // (partitionShstReferenceByTargetMapsMatches/index.js:150-168); when the
    // rounding goes up, an interval loses its own first segment and its
    // predecessor leaks in. That observed quirk is available behind
    // `parityRound6`; the default uses exact bounds (QA-correct).
    segs.zipWithIndex.foreach { case (seg, idx) =>
      val assigned = intervals.filter { iv =>
        val s = if (parityRound6) round6(iv.startDist) else iv.startDist
        val e = if (parityRound6) round6(iv.endDist) else iv.endDist
        s <= seg.startDist && s < seg.endDist && e > seg.startDist
      }
      // reference overwrites on duplicate targetMap (logs + last-writer-wins)
      val byTm = assigned.groupBy(_.targetMap).map { case (_, ivs) => ivs.last }.toVector
        .sortBy(iv => (iv.targetMap, iv.targetMapId))
      segs(idx) = seg.copy(tmAssignments = byTm)
    }
    segs.toVector
  }

  /** F19: OSM way-section rank (src/conflation/constants.js:11-21). */
  val OsmRoadClassRank: Map[String, Int] = Map(
    "Motorway" -> 0, "Trunk" -> 1, "Primary" -> 2, "Secondary" -> 3,
    "Tertiary" -> 4, "Residential" -> 5, "Unclassified" -> 6,
    "Service" -> 7, "Other" -> 8)

  /**
   * G7: intervals of the underlying OSM way sections along the reference
   * (getOffsetsAlongShstRefForUnderlyingOsmWays.js:9-135): walk each
   * section's start/end node ids against the vertex sequence (resuming the
   * scan where the previous section ended — sections tile the reference),
   * take the vertices' exact POFF as the interval (no snapping), rank by
   * road class, then overlap-remove with threshold 0.
   */
  def osmWayOffsets(vertices: Vector[RefVertex],
      waySections: Seq[(String, Seq[String], String, Boolean)],
      direction: Int, parityInputOrder: Boolean = true): Option[Vector[Interval]] = {
    var vertexIdx = 0
    val out = ArrayBuffer.empty[Interval]
    waySections.foreach { case (wayId, nodeIds, roadClass, _) =>
      if (nodeIds.nonEmpty) {
        val startNodeId = nodeIds.head
        val endNodeId = nodeIds.last
        var startV: RefVertex = null
        while (vertexIdx < vertices.length && startV == null) {
          val v = vertices(vertexIdx); vertexIdx += 1
          if (v.osmNodeId == startNodeId) startV = v
        }
        if (startV == null) return None // reference throws; we punt the ref
        var endV: RefVertex = null
        while (vertexIdx < vertices.length && endV == null) {
          if (vertices(vertexIdx).osmNodeId == endNodeId) endV = vertices(vertexIdx)
          else vertexIdx += 1
        }
        if (endV == null) return None
        val rank = OsmRoadClassRank.getOrElse(roadClass, OsmRoadClassRank("Other"))
        out += Interval("osm", wayId, s"$wayId!$direction", 0,
          isPrimary = true, rank, startV.poff, endV.noff, startV.poff, endV.poff)
      }
    }
    Some(removeOverlaps(out.toSeq, threshold = 0, parityInputOrder))
  }

  /** Match-geometry summary — everything [[conflateReference]] reads of a
    * match polyline: its endpoints and geodesic length (see
    * [[rawOffsetsFromEndpoints]]). */
  final case class MatchGeom(msLon: Double, msLat: Double,
      meLon: Double, meLat: Double, lenKm: Double)

  object MatchGeom {
    /** Summary of a full polyline — same element_at/lengthKm semantics the
      * map-side Columns compute, so either construction path is bit-equal. */
    def of(coords: Array[Array[Double]]): MatchGeom = {
      val s = coords(0); val e = coords(coords.length - 1)
      MatchGeom(s(0), s(1), e(0), e(1), Geo.lengthKm(coords))
    }
  }

  /** Full per-reference kernel over full match polylines (spec/back-compat
    * surface; the pipeline ships [[MatchGeom]] summaries instead — the
    * central shuffle then carries 5 doubles per match, not the polyline). */
  def conflateReference(
      refCoords: Array[Array[Double]],
      waySectionNodeIds: Seq[Seq[String]],
      matchesByTargetMap: Seq[(String, Seq[(Interval, Array[Array[Double]])])],
      parityInputOrder: Boolean = true,
      parityRound6: Boolean = false,
      waySections: Seq[(String, Seq[String], String, Boolean)] = Nil,
      direction: Int = 1): Vector[SplitSegment] =
    conflateReferenceSummarized(refCoords, waySectionNodeIds,
      matchesByTargetMap.map { case (tm, ms) =>
        tm -> ms.map { case (meta, mCoords) => (meta, MatchGeom.of(mCoords)) }
      },
      parityInputOrder, parityRound6, waySections, direction)

  /** Full per-reference kernel: raw offsets → snap → per-target-map overlap
    * removal → union → split (src/conflation/run:44-106 control flow). */
  def conflateReferenceSummarized(
      refCoords: Array[Array[Double]],
      waySectionNodeIds: Seq[Seq[String]],
      matchesByTargetMap: Seq[(String, Seq[(Interval, MatchGeom)])],
      parityInputOrder: Boolean = true,
      parityRound6: Boolean = false,
      waySections: Seq[(String, Seq[String], String, Boolean)] = Nil,
      direction: Int = 1): Vector[SplitSegment] = {
    val refLen = Geo.lengthKm(refCoords)
    val nodeSeq = osmNodeIdsSeq(waySectionNodeIds)
    val vertsOpt = vertexSeq(refCoords, nodeSeq)
    if (vertsOpt.isEmpty) return Vector.empty
    val verts = vertsOpt.get
    val perTm: Seq[Interval] = matchesByTargetMap.flatMap { case (_, ms) =>
      val offsets = ms.flatMap { case (meta, mg) =>
        rawOffsetsFromEndpoints(refCoords, refLen, mg.msLon, mg.msLat,
          mg.meLon, mg.meLat, mg.lenKm).flatMap { case (p, n, _, _) =>
          snapNodes(verts, refLen, p, n).map { case (p2, n2, s2, e2) =>
            meta.copy(poff = p2, noff = n2, startDist = s2, endDist = e2)
          }
        }
      }
      if (offsets.isEmpty) Nil
      else removeOverlaps(offsets, SplitBuffKm, parityInputOrder)
    }
    // the 'osm' pseudo target map: underlying way-section intervals (G7) —
    // the reference appends 'osm' to the target-map list and its offsets
    // partition the reference alongside the real matches (run:44-106,
    // outputConflationNDSJON:10-13)
    val osmIvs: Seq[Interval] =
      if (waySections.isEmpty) Nil
      else osmWayOffsets(verts, waySections, direction, parityInputOrder)
        .getOrElse(Vector.empty)
    val all = perTm ++ osmIvs
    if (perTm.isEmpty) Vector.empty
    else split(refCoords, refLen, verts, all, parityRound6)
  }
}

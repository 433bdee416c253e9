package graft

import graft.geo.Geo
import graft.operators.ConflationKernel
import graft.operators.ConflationKernel._
import org.scalatest.funsuite.AnyFunSuite

class ConflationKernelSpec extends AnyFunSuite {

  // straight ~2.2km west→east line at lat 42.7 with 5 vertices
  private val refCoords: Array[Array[Double]] =
    Array(-73.800, -73.793, -73.786, -73.779, -73.773).map(lon => Array(lon, 42.7))
  private val refLen = Geo.lengthKm(refCoords)
  private val nodeIds = Vector("n0", "n1", "n2", "n3", "n4")
  private val verts = ConflationKernel.vertexSeq(refCoords, nodeIds).get

  private def iv(tm: String, id: String, s: Double, e: Double, rank: Int = 5): Interval =
    Interval(tm, id, id + "|m", 0, isPrimary = true, rank, s, refLen - e, s, e)

  test("vertexSeq: POFF cumulative, NOFF complementary, endpoints exact") {
    assert(verts.length == 5)
    assert(verts.head.poff == 0.0 && verts.head.noff == refLen)
    assert(verts.last.poff == refLen && verts.last.noff == 0.0)
    assert(verts.map(_.poff) == verts.map(_.poff).sorted)
    verts.foreach(v => assert(math.abs(v.poff + v.noff - refLen) < 1e-12))
    assert(verts.map(_.osmNodeId) == nodeIds)
  }

  test("vertexSeq: adjacent duplicate coords collapse; count mismatch → None") {
    val dup = refCoords.patch(2, Array(refCoords(1)), 0) // duplicate vertex 1 adjacently
    // 6 coords, 5 collapsed — give 5 nodeIds → but reference indexes by
    // original position so nodeIds align only when dups drop matching ids
    assert(ConflationKernel.vertexSeq(dup, nodeIds ++ Vector("n5")).isEmpty) // 6 ids vs 5 collapsed
    assert(ConflationKernel.vertexSeq(dup, nodeIds).nonEmpty) // 5 ids == 5 collapsed
  }

  test("osmNodeIdsSeq collapses adjacent dups across way sections") {
    val seq = ConflationKernel.osmNodeIdsSeq(Seq(Seq("a", "b", "c"), Seq("c", "d")))
    assert(seq == Vector("a", "b", "c", "d"))
  }

  test("rawOffsets: match spanning middle of reference") {
    // match = the reference's middle portion, slightly offset laterally
    val m = Array(Array(-73.793, 42.7001), Array(-73.786, 42.7001))
    val Some((poff, noff, s, e)) = rawOffsets(refCoords, refLen, m)
    assert(poff > 0 && noff > 0)
    assert(s < e)
    assert(math.abs(s - Geo.locateAlong(refCoords, -73.793, 42.7001)) < 1e-9)
  }

  test("rawOffsets: POFF snaps to 0 within buffer; NOFF does NOT (truthiness quirk)") {
    // match start ~5m from ref start (< 10m buffer) → POFF = 0
    val m = Array(Array(-73.79995, 42.7), Array(-73.7862, 42.7))
    val Some((poff, noff, s, e)) = rawOffsets(refCoords, refLen, m)
    assert(poff == 0.0 && s == 0.0)
    // end is ~short of ref end but NOT exactly at it → NOFF stays > 0
    assert(noff > 0.0 && e < refLen)
  }

  test("rawOffsets: tiny inverted segment → None; sub-buffer segment → None") {
    val tiny = Array(Array(-73.7931, 42.7), Array(-73.79305, 42.7)) // ~4m
    assert(rawOffsets(refCoords, refLen, tiny).isEmpty)
  }

  test("snapNodes: end snaps to nearby interior vertex within half-buffer") {
    // end at poff of vertex n2 ± 3m  → reuse n2's exact poff
    val v2poff = verts(2).poff
    val rawEnd = v2poff + 0.003
    val noff = refLen - rawEnd
    val Some((_, _, s, e)) = snapNodes(verts, refLen, 0.0, noff)
    assert(e == v2poff)
    assert(s == 0.0)
  }

  test("snapNodes: end within buffer of ref end → snaps to full length") {
    val Some((_, _, _, e)) = snapNodes(verts, refLen, 0.0, 0.004)
    assert(e == refLen)
  }

  test("snapNodes: short segment below buffer and below coverage ratio → None") {
    // poff near the end, segment ~4m, ratio tiny
    assert(snapNodes(verts, refLen, refLen - 0.004, 0.0).isEmpty)
  }

  test("removeOverlaps: NO_OVERLAP keeps both") {
    val out = removeOverlaps(Seq(iv("tm", "a", 0.0, 0.5), iv("tm", "b", 0.8, 1.2)))
    assert(out.map(_.targetMapId) == Vector("a", "b"))
  }

  test("removeOverlaps: COVERED drops lower-ranked") {
    val out = removeOverlaps(Seq(iv("tm", "a", 0.0, 1.0), iv("tm", "b", 0.2, 0.8)))
    assert(out.map(_.targetMapId) == Vector("a"))
  }

  test("removeOverlaps: TRAILING overlap trims lower's start") {
    val out = removeOverlaps(Seq(iv("tm", "a", 0.0, 1.0), iv("tm", "b", 0.8, 1.6)))
    assert(out.map(_.targetMapId) == Vector("a", "b"))
    assert(out(1).startDist == 1.0 && out(1).endDist == 1.6)
  }

  test("removeOverlaps: LEADING overlap trims lower's end") {
    val out = removeOverlaps(Seq(iv("tm", "a", 0.5, 1.5), iv("tm", "b", 0.0, 0.7)))
    val b = out.find(_.targetMapId == "b").get
    assert(b.startDist == 0.0 && b.endDist == 0.5)
    assert(out.map(_.startDist) == out.map(_.startDist).sorted)
  }

  test("removeOverlaps: COVERS splits lower into head + tail") {
    val out = removeOverlaps(Seq(iv("tm", "a", 0.5, 1.0), iv("tm", "b", 0.0, 1.5)))
    val bs = out.filter(_.targetMapId == "b")
    assert(bs.map(x => (x.startDist, x.endDist)) == Vector((0.0, 0.5), (1.0, 1.5)))
    assert(out.length == 3)
  }

  test("removeOverlaps: COVERS tail below half-buffer is not re-enqueued") {
    val out = removeOverlaps(Seq(iv("tm", "a", 0.5, 1.496), iv("tm", "b", 0.0, 1.5)))
    val bs = out.filter(_.targetMapId == "b")
    assert(bs.map(x => (x.startDist, x.endDist)) == Vector((0.0, 0.5)))
  }

  test("removeOverlaps: priority is input order (parity quirk), first always kept") {
    // input order: b (lower doc-priority numbers irrelevant) before a
    val out = removeOverlaps(Seq(
      iv("tm", "b", 0.2, 0.8, rank = 9), iv("tm", "a", 0.0, 1.0, rank = 0)))
    // b admitted first (input order), a then COVERS b → a split into 2 pieces
    assert(out.filter(_.targetMapId == "b").nonEmpty)
    assert(out.filter(_.targetMapId == "a")
      .map(x => (x.startDist, x.endDist)) == Vector((0.0, 0.2), (0.8, 1.0)))
  }

  test("removeOverlaps: documented priority when parity off") {
    val out = removeOverlaps(Seq(
      iv("tm", "b", 0.2, 0.8, rank = 9), iv("tm", "a", 0.0, 1.0, rank = 0)),
      parityInputOrder = false)
    // a (rank 0) wins; b fully covered → dropped
    assert(out.map(_.targetMapId) == Vector("a"))
  }

  test("removeOverlaps: sub-threshold survivor dropped") {
    val out = removeOverlaps(Seq(iv("tm", "a", 0.0, 1.0), iv("tm", "b", 0.995, 1.004)))
    assert(out.map(_.targetMapId) == Vector("a"))
  }

  test("removeOverlaps: output is non-overlapping and sorted (property)") {
    val rng = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val n = 1 + rng.nextInt(8)
      val ivs = (1 to n).map { k =>
        val s = rng.nextDouble() * 2
        iv("tm", s"x$k", s, s + 0.02 + rng.nextDouble())
      }
      val out = removeOverlaps(ivs)
      out.sliding(2).foreach {
        case Vector(x, y) => assert(y.startDist >= x.endDist - 1e-12,
          s"overlap: $x vs $y from $ivs")
        case _ =>
      }
      out.foreach(x => assert(x.endDist - x.startDist >= SplitBuffKm - 1e-12))
    }
  }

  test("split: segments cover [0,len], 1-based index, vertices preserved") {
    val ivs = Seq(iv("tm", "a", 0.3, 0.9), iv("tm2", "b", 0.9, 1.4))
    val segs = ConflationKernel.split(refCoords, refLen, verts, ivs)
    assert(segs.head.startDist == 0.0)
    assert(math.abs(segs.last.endDist - refLen) < 1e-12)
    assert(segs.map(_.segmentIndex) == (1 to segs.length).toVector)
    assert(segs.forall(_.totalSegments == segs.length))
    // adjacency: each segment starts where previous ended
    segs.sliding(2).foreach {
      case Vector(x, y) => assert(y.startDist == x.endDist)
      case _ =>
    }
    // nodeId sequence concatenation preserves original node ids in order
    val allNodes = segs.flatMap(_.nodeIds).filter(_ != null)
    assert(nodeIds.forall(allNodes.contains))
    // coordinates: in/out length conservation (QA invariant, ratio ≤ 0.05)
    val outLen = segs.map(s => Geo.lengthKm(s.coordinates.toArray)).sum
    assert(math.abs(outLen - refLen) / refLen <= 0.05)
  }

  test("split: interval assignment respects rounded-start rule") {
    val ivs = Seq(iv("tmA", "a", 0.3, 0.9))
    val segs = ConflationKernel.split(refCoords, refLen, verts, ivs)
    val assigned = segs.filter(_.tmAssignments.nonEmpty)
    // exactly the [0.3, 0.9] sub-segments carry the assignment
    assert(assigned.forall(s => s.startDist >= 0.3 - 1e-9 && s.endDist <= 0.9 + 1e-9))
    assert(assigned.nonEmpty)
  }

  test("parityRound6 quirk: round-up boundary makes the predecessor leak (pinned)") {
    // boundary with >6dp that rounds UP: 0.1107648987
    val boundary = 0.1107648987
    val ivs = Seq(iv("tm", "a", 0.0, boundary), iv("tm", "b", boundary, 0.5))
    val parity = ConflationKernel.split(refCoords, refLen, verts, ivs, parityRound6 = true)
    val exact = ConflationKernel.split(refCoords, refLen, verts, ivs, parityRound6 = false)
    // exact mode: each interval owns its own segments
    val exactB = exact.filter(_.tmAssignments.exists(_.targetMapId == "b"))
    assert(exactB.nonEmpty && exactB.forall(s => s.startDist >= boundary - 1e-12))
    val exactA = exact.filter(_.tmAssignments.exists(_.targetMapId == "a"))
    assert(exactA.forall(s => s.endDist <= boundary + 1e-12))
    // parity mode: round6(boundary)=0.110765 > boundary → "a" leaks into b's
    // first segment and "b" loses it (observed reference behavior)
    val leakSeg = parity.find(s => math.abs(s.startDist - boundary) < 1e-12).get
    assert(leakSeg.tmAssignments.exists(_.targetMapId == "a"))
    assert(!leakSeg.tmAssignments.exists(_.targetMapId == "b"))
  }

  test("osmWayOffsets: sections tile the reference, ranked, zero-threshold sweep") {
    // two way sections: n0..n2 and n2..n4
    val sections = Seq(
      ("w0", Seq("n0", "n1", "n2"), "Primary", false),
      ("w1", Seq("n2", "n3", "n4"), "Residential", false))
    val Some(out) = ConflationKernel.osmWayOffsets(verts, sections, direction = 1)
    assert(out.length == 2)
    assert(out(0).targetMapId == "w0" && out(0).startDist == 0.0)
    assert(out(0).endDist == verts(2).poff)
    assert(out(1).startDist == verts(2).poff && out(1).endDist == refLen)
    assert(out(0).rank == 2 && out(1).rank == 5)
    assert(out.forall(_.targetMap == "osm"))
    assert(out(0).matchedTargetMapId == "w0!1")
    // missing node id → None (the reference's throw path)
    assert(ConflationKernel.osmWayOffsets(verts,
      Seq(("wX", Seq("n0", "nMISSING"), "Other", false)), 1).isEmpty)
  }

  test("conflateReference end-to-end: two target maps over one reference") {
    // matches: laterally-jittered sub-segments of the reference itself
    val m1 = Array(Array(-73.7995, 42.70005), Array(-73.7862, 42.70005)) // ~start→v2
    val m2 = Array(Array(-73.786, 42.69995), Array(-73.7733, 42.69995))  // ~v2→end
    val segs = ConflationKernel.conflateReference(
      refCoords, Seq(nodeIds),
      Seq(
        "npmrds_2026" -> Seq((iv("npmrds_2026", "t1", 0, 0), m1)),
        "ris_2026" -> Seq((iv("ris_2026", "r1", 0, 0), m2))))
    assert(segs.nonEmpty)
    assert(segs.head.startDist == 0.0)
    assert(math.abs(segs.last.endDist - refLen) < 1e-9)
    val tms = segs.flatMap(_.tmAssignments.map(_.targetMap)).distinct.sorted
    assert(tms == Vector("npmrds_2026", "ris_2026"))
  }
}

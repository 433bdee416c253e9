package graft

import graft.operators.MesoMega
import graft.operators.MesoMega.{MesoIn, mesoGroup}
import org.scalatest.funsuite.AnyFunSuite

class MesoMegaSpec extends AnyFunSuite {

  test("microDirectionOfTravel: parity quirk makes everything non-north EASTBOUND") {
    assert(MesoMega.microDirectionOfTravel(10) == MesoMega.Northbound)
    assert(MesoMega.microDirectionOfTravel(350) == MesoMega.Northbound)
    // quirk: south and west bearings return EASTBOUND
    assert(MesoMega.microDirectionOfTravel(180) == MesoMega.Eastbound)
    assert(MesoMega.microDirectionOfTravel(270) == MesoMega.Eastbound)
    assert(MesoMega.microDirectionOfTravel(90) == MesoMega.Eastbound)
    // intended semantics with parity off
    assert(MesoMega.microDirectionOfTravel(90, parity = false) == MesoMega.Eastbound)
    assert(MesoMega.microDirectionOfTravel(180, parity = false) == MesoMega.Southbound)
    assert(MesoMega.microDirectionOfTravel(270, parity = false) == MesoMega.Westbound)
  }

  private def mi(proto: String, idx: Int, from: String, to: String,
      lon0: Double, lon1: Double): MesoIn =
    MesoIn(s"$proto|$idx", proto, idx, from, to, Some(90), Some(92), Some(90),
      Seq(Seq(lon0, 42.7), Seq(lon1, 42.7)))

  test("mesoGroup: chained micro protos get meso indices in walk order") {
    // two micro chains A (n1→n2) and B (n2→n3), each of 2 matches
    val rows = Seq(
      mi("B", 0, "n2", "n2x", -73.78, -73.775), mi("B", 1, "n2x", "n3", -73.775, -73.77),
      mi("A", 0, "n1", "n1x", -73.80, -73.795), mi("A", 1, "n1x", "n2", -73.795, -73.79))
    // simplified edges: A: n1→n2, B: n2→n3 → one chain A,B
    val out = mesoGroup(rows)
    assert(out.map(_.matchedTargetMapId) == Seq("A|0", "A|1", "B|0", "B|1"))
    assert(out.map(_.matchedTargetMapMesoIdx) == Seq(Some(0), Some(1), Some(2), Some(3)))
    val bearing = out.head.matchedTargetMapMesoLevelBearing.get
    assert(bearing > 80 && bearing < 100) // west→east chain
  }

  test("mesoGroup: unsortable edges fall back to flip rule with null idx") {
    // three protos forming a directed 3-cycle (no opposite pairs, no source)
    val rows = Seq(
      mi("A", 0, "n1", "n2", -73.80, -73.79),
      mi("B", 0, "n2", "n3", -73.79, -73.78),
      mi("C", 0, "n3", "n1", -73.78, -73.80))
    // cycle → ERR_NO_SOURCE_NODES → fallback
    val out = mesoGroup(rows)
    assert(out.length == 3)
    assert(out.forall(_.matchedTargetMapMesoIdx.isEmpty))
    // bearing diff |90-92| < 45 → follows → meso bearing unchanged (90)
    assert(out.forall(_.matchedTargetMapMesoLevelBearing.contains(90)))
  }

  test("mesoGroup fallback: opposite-direction match flips meso bearing") {
    def m(proto: String, f: String, t: String) =
      MesoIn(s"$proto|0", proto, 0, f, t, Some(90), Some(271), Some(90),
        Seq(Seq(-73.8, 42.7), Seq(-73.79, 42.7)))
    // 3-cycle forces the fallback path
    val out = mesoGroup(Seq(m("X", "n1", "n2"), m("Y", "n2", "n3"), m("Z", "n3", "n1")))
    // |90-271| = 181 ≥ 45 → flipped: (90+180)%360 = 270
    assert(out.nonEmpty)
    assert(out.forall(_.matchedTargetMapMesoLevelBearing.contains(270)))
  }

  test("megaAxis + megaDirection: NS vs EW quadrant logic") {
    assert(MesoMega.megaAxisIsNorthSouth((-73.8, 42.6, -73.79, 42.9))) // tall
    assert(!MesoMega.megaAxisIsNorthSouth((-73.9, 42.7, -73.5, 42.71))) // wide
    assert(MesoMega.megaDirection(northSouth = true, 45) == "NORTHBOUND")
    assert(MesoMega.megaDirection(northSouth = true, 180) == "SOUTHBOUND")
    assert(MesoMega.megaDirection(northSouth = true, 300) == "NORTHBOUND")
    assert(MesoMega.megaDirection(northSouth = false, 90) == "EASTBOUND")
    assert(MesoMega.megaDirection(northSouth = false, 250) == "WESTBOUND")
  }
}

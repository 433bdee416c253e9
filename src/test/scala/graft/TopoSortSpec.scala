package graft

import graft.operators.{TopoSort, MatchPostProcessor}
import graft.operators.TopoSort.Edge
import org.scalatest.funsuite.AnyFunSuite

class TopoSortSpec extends AnyFunSuite {

  private def e(id: String, f: String, t: String) = Edge(id, f, t)

  test("linear directed chain sorts in walk order") {
    val edges = Seq(e("c", "3", "4"), e("a", "1", "2"), e("b", "2", "3"))
    val Right(chains) = TopoSort.sort(bidirectional = false, edges)
    assert(chains.map(_.map(_.id)) == Vector(Vector("a", "b", "c")))
  }

  test("cycle → ERR_NO_SOURCE_NODES") {
    val edges = Seq(e("a", "1", "2"), e("b", "2", "3"), e("c", "3", "1"))
    assert(TopoSort.sort(bidirectional = false, edges) == Left(TopoSort.ErrNoSourceNodes))
  }

  test("directed with two sources → ERR_NUM_SOURCE_NODES_EXCEEDS_1") {
    val edges = Seq(e("a", "1", "2"), e("b", "5", "6"))
    assert(TopoSort.sort(bidirectional = false, edges) ==
      Left(TopoSort.ErrNumSourceNodesExceeds1))
  }

  test("bidirectional with three sources → ERR_NUM_SOURCE_NODES_EXCEEDS_2") {
    val edges = Seq(e("a", "1", "2"), e("b", "5", "6"), e("c", "8", "9"))
    assert(TopoSort.sort(bidirectional = true, edges) ==
      Left(TopoSort.ErrNumSourceNodesExceeds2))
  }

  test("fork in directed mode → ERR_NUM_CHAINS_EXCEEDS_1") {
    val edges = Seq(e("a", "1", "2"), e("b", "2", "3"), e("c", "2", "4"))
    assert(TopoSort.sort(bidirectional = false, edges) == Left(TopoSort.ErrNumChainsExceeds1))
  }

  test("opposite-direction pair: both directions become chains (bidirectional)") {
    val edges = Seq(e("f", "1", "2"), e("r", "2", "1"))
    val Right(chains) = TopoSort.sort(bidirectional = true, edges)
    assert(chains.map(_.map(_.id)).toSet == Set(Vector("f"), Vector("r")))
  }

  test("two-chain bidirectional walk (forward + back chains)") {
    val edges = Seq(e("f1", "1", "2"), e("f2", "2", "3"), e("r2", "3", "2"), e("r1", "2", "1"))
    val Right(chains) = TopoSort.sort(bidirectional = true, edges)
    assert(chains.map(_.map(_.id)).toSet == Set(Vector("f1", "f2"), Vector("r2", "r1")))
  }

  test("subchain pruning: shorter chain that's an order-preserving subsequence is dropped") {
    // chains from sources 1 and 2 where the 2-chain is a suffix of the 1-chain
    // construct: a:1→2, b:2→3 and a second source edge d:0→1 creating chains
    // [d,a,b] and... use opposite pair so both sources exist
    val edges = Seq(e("a", "1", "2"), e("b", "2", "3"),
      e("a'", "2", "1")) // back edge makes node 2 a source candidate
    val r = TopoSort.sort(bidirectional = true, edges)
    assert(r.isRight)
    val Right(chains) = r
    // the pruned result contains the longest chain [a, b]
    assert(chains.exists(_.map(_.id) == Vector("a", "b")))
  }

  test("spatialEdges keys nodes by 5dp-rounded endpoints") {
    val f1 = ("x", Array(Array(-73.800001, 42.700001), Array(-73.79, 42.71)))
    val f2 = ("y", Array(Array(-73.79, 42.71), Array(-73.78, 42.72)))
    val edges = TopoSort.spatialEdges(Seq(f1, f2))
    assert(edges(0).toNodeId == edges(1).fromNodeId)
  }

  test("charShiftIdx: '0'→'A' shift by 17, zero-padded") {
    assert(TopoSort.charShiftIdx(0, 1) == "A")
    assert(TopoSort.charShiftIdx(1, 2) == "AB")
    assert(TopoSort.charShiftIdx(10, 2) == "BA")
  }

  test("processGroup: sorted chain gets tmId|bearing|idx ids and micro indices") {
    def m(ref: String, f: String, t: String, coords: Seq[Seq[Double]]) =
      MatchPostProcessor.MatchIn.fromGeometry(ref, f, t, "npmrds_2026", "t1", true, 3, 0.001, coords)
    val ms = Seq(
      m("r2", "B", "C", Seq(Seq(-73.79, 42.7), Seq(-73.78, 42.7))),
      m("r1", "A", "B", Seq(Seq(-73.80, 42.7), Seq(-73.79, 42.7))))
    val out = MatchPostProcessor.processGroup("t1", directed = true, ms)
    assert(out.map(_.shstReferenceId) == Seq("r1", "r2"))
    assert(out.map(_.matchedTargetMapMicroIdx) == Seq(0, 1))
    assert(out.forall(_.chainsSorted))
    assert(out.head.matchedTargetMapId.matches("""t1\|\d+\|0"""))
    val b = out.head.matchedTargetMapMicroLevelBearing
    assert(b > 80 && b < 100) // due-east chain
  }

  test("processGroup: duplicate (from,to) keeps the longest; exact dups removed") {
    def m(ref: String, coords: Seq[Seq[Double]]) =
      MatchPostProcessor.MatchIn.fromGeometry(ref, "A", "B", "tm", "t1", true, 3, 0.0, coords)
    val short = m("rS", Seq(Seq(-73.80, 42.7), Seq(-73.795, 42.7)))
    val long = m("rL", Seq(Seq(-73.80, 42.7), Seq(-73.797, 42.7), Seq(-73.79, 42.7)))
    val out = MatchPostProcessor.processGroup("t1", directed = true, Seq(short, long, long))
    assert(out.map(_.shstReferenceId) == Seq("rL"))
  }

  test("processGroup: unsortable matches fall back to charshift ids") {
    def m(ref: String, f: String, t: String) =
      MatchPostProcessor.MatchIn.fromGeometry(ref, f, t, "tm", "t1", true, 3, 0.0,
        Seq(Seq(-73.8, 42.7), Seq(-73.79, 42.7)))
    // cycle → no source nodes
    val ms = Seq(m("r1", "A", "B"), m("r2", "B", "C"), m("r3", "C", "A"))
    val out = MatchPostProcessor.processGroup("t1", directed = true, ms)
    assert(out.length == 3)
    assert(out.forall(!_.chainsSorted))
    assert(out.forall(_.matchedTargetMapId.contains("!")))
    assert(out.map(_.matchedTargetMapId).distinct.length == 3)
  }
}

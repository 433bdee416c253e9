package graft.operators

import graft.geo.Geo
import scala.collection.mutable.ArrayBuffer

/**
 * Topological chain sorter (SURVEY.md G2/G3) — re-expresses the reference's
 * FeaturesTopographicalSorter/sortFeatures.js:97-239 walk:
 *
 *  - source edges: no inbound edge from any other edge except opposite pairs
 *  - walk forward, consuming the LAST matching outbound edge (input order)
 *    and forking a chain clone per extra outbound edge
 *  - directed mode: exactly 1 source and 1 chain or error; bidirectional:
 *    ≤2 sources / ≤2 chains, then order-preserving subchain pruning
 *
 * Returns Left(errorCode) with the reference's five error codes.
 */
object TopoSort {

  final val ErrNoSourceNodes = "ERR_NO_SOURCE_NODES"
  final val ErrNumSourceNodesExceeds1 = "ERR_NUM_SOURCE_NODES_EXCEEDS_1"
  final val ErrNumChainsExceeds1 = "ERR_NUM_CHAINS_EXCEEDS_1"
  final val ErrNumSourceNodesExceeds2 = "ERR_NUM_SOURCE_NODES_EXCEEDS_2"
  final val ErrNumChainsExceeds2 = "ERR_NUM_CHAINS_EXCEEDS_2"

  final case class Edge(id: String, fromNodeId: String, toNodeId: String)

  @inline private def opposite(a: Edge, b: Edge): Boolean =
    a.fromNodeId == b.toNodeId && a.toNodeId == b.fromNodeId
  @inline private def outbound(a: Edge, b: Edge): Boolean =
    a.toNodeId == b.fromNodeId && a.id != b.id
  @inline private def sameOrOpposite(a: Edge, b: Edge): Boolean =
    a.id == b.id || opposite(a, b)

  /** Derive edges from geometry endpoints, keying nodes by 5-dp-rounded
    * coordinates (sortFeatures.js:28-62, COORD_PRECISION=5). */
  def spatialEdges(features: Seq[(String, Array[Array[Double]])]): Seq[Edge] = {
    val nodeIds = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var seq = 0
    def key(p: Array[Double]): String = {
      val k = s"${math.rint(p(0) * 1e5) / 1e5}|${math.rint(p(1) * 1e5) / 1e5}"
      nodeIds.getOrElseUpdate(k, { seq += 1; seq })
      k
    }
    features.map { case (id, coords) =>
      Edge(id, nodeIds(key(coords(0))).toString, nodeIds(key(coords(coords.length - 1))).toString)
    }
  }

  def sort(bidirectional: Boolean, edges: Seq[Edge]): Either[String, Vector[Vector[Edge]]] = {
    if (edges.isEmpty) return Right(Vector.empty)
    val edgeInfo = edges.toVector

    val sources = edgeInfo.filter(cand =>
      edgeInfo.forall(other => opposite(cand, other) || !outbound(other, cand)))

    if (sources.isEmpty) return Left(ErrNoSourceNodes)
    if (!bidirectional && sources.length > 1) return Left(ErrNumSourceNodesExceeds1)
    if (bidirectional && sources.length > 2) return Left(ErrNumSourceNodesExceeds2)

    val chains = ArrayBuffer(sources.map(s => ArrayBuffer(s)): _*)
    var i = 0
    while (i < chains.length) {
      val chain = chains(i)
      var candidates = edgeInfo.filter(cand => chain.forall(m => !sameOrOpposite(cand, m)))
      var continue = true
      while (continue) {
        val fromEdge = chain.last
        val outs = candidates.filter(cand => outbound(fromEdge, cand))
        if (outs.isEmpty) continue = false
        else {
          // reference pops the LAST matching edge and forks clones for the rest
          val chosen = outs.last
          outs.dropRight(1).foreach { fork =>
            val clone = chain.clone()
            clone += fork
            chains += clone
          }
          chain += chosen
          candidates = candidates.filter(cand => !sameOrOpposite(cand, chosen))
        }
      }
      i += 1
    }

    if (!bidirectional) {
      if (chains.length != 1) Left(ErrNumChainsExceeds1)
      else Right(Vector(chains(0).toVector))
    } else if (chains.length > 2) Left(ErrNumChainsExceeds2)
    else {
      // order-preserving subchain pruning (sortFeatures.js:206-236)
      val byLen = chains.map(_.toVector).sortBy(_.length).toVector
      val kept = byLen.zipWithIndex.filterNot { case (chain, idx) =>
        byLen.drop(idx + 1).exists { other =>
          var m = 0; var n = 0; var res = false; var done = false
          while (!done) {
            val cur = chain(m); val oth = other(n); n += 1
            if (cur.fromNodeId == oth.fromNodeId && cur.toNodeId == oth.toNodeId) m += 1
            if (m == chain.length) { res = true; done = true }
            else if (n == other.length) { res = false; done = true }
          }
          res
        }
      }.map(_._1)
      Right(kept)
    }
  }

  /** Chain final-bearing (src/utils/getChainBearing.js:7-25): final bearing
    * from the first coordinate of the first feature to the last coordinate
    * of the last feature, rounded to Int. */
  def chainBearing(chainGeoms: Seq[Array[Array[Double]]]): Int = {
    val first = chainGeoms.head(0)
    val lastG = chainGeoms.last
    val last = lastG(lastG.length - 1)
    math.round(Geo.finalBearing(first(0), first(1), last(0), last(1))).toInt
  }

  /** The unsorted-fallback id suffix: zero-padded index with each character
    * code shifted +17 (MatchedFeaturesProcessor.js:241-255; '0'→'A'). */
  def charShiftIdx(j: Int, padLen: Int): String =
    j.toString.reverse.padTo(padLen, '0').reverse.map(c => (c + 17).toChar).mkString
}

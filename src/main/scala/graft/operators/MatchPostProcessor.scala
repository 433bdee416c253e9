package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Match post-processing (SURVEY.md G4 = MatchedFeaturesProcessor.js:137-264):
 * per (targetMap, targetMapId) group —
 *   1. sort matches by vertex count ascending (O3, :71-97)
 *   2. exact dedup (U1 uniqWith, :31-34)
 *   3. duplicate-edge elimination: keep LAST (longest after the sort) per
 *      (fromIntersection, toIntersection) (U2)
 *   4. toposort into chains (G2); on success assign
 *      `targetMapId|chainBearing|paddedIdx` ids + micro indices (W3);
 *      on sort failure fall back to `targetMapId!<charshift idx>` ids in
 *      input order (:241-255)
 *
 * Runs as one `groupByKey.flatMapGroups` — groups are a single target-map
 * feature's matches (tiny, bounded by chain length), so the shuffle is the
 * only distributed cost.
 */
object MatchPostProcessor {

  case class MatchIn(
      shstReferenceId: String,
      shstFromIntersectionId: String,
      shstToIntersectionId: String,
      targetMap: String,
      targetMapId: String,
      targetMapIsPrimary: Boolean,
      targetMapNetHrchyRank: Int,
      score: Double,
      geometry: Seq[Seq[Double]])

  case class MatchOut(
      shstReferenceId: String,
      shstFromIntersectionId: String,
      shstToIntersectionId: String,
      targetMap: String,
      targetMapId: String,
      matchedTargetMapId: String,
      matchedTargetMapMicroIdx: Int,
      matchedTargetMapMicroLevelBearing: Int,
      chainsSorted: Boolean,
      targetMapIsPrimary: Boolean,
      targetMapNetHrchyRank: Int,
      matchIterationId: Int,
      score: Double,
      geometry: Seq[Seq[Double]])

  /** Pure per-group kernel (exposed for unit tests). */
  def processGroup(targetMapId: String, directed: Boolean,
      matches: Seq[MatchIn], iterationId: Int = 0): Seq[MatchOut] = {
    // 1. vertex-count ascending sort, deterministic tie-break
    val sorted = matches.sortBy(m => (m.geometry.length, m.shstReferenceId))
    // 2. exact dedup (full deep equality)
    val deduped = sorted.distinct
    // 3. keep LAST per (from, to) — last = longest after the sort
    val byEdge = scala.collection.mutable.LinkedHashMap.empty[(String, String), MatchIn]
    deduped.foreach(m => byEdge((m.shstFromIntersectionId, m.shstToIntersectionId)) = m)
    val normalized = byEdge.values.toVector
    if (normalized.isEmpty) return Nil

    val edges = normalized.map(m =>
      TopoSort.Edge(m.shstReferenceId, m.shstFromIntersectionId, m.shstToIntersectionId))
    val byId = normalized.map(m => m.shstReferenceId -> m).toMap

    TopoSort.sort(bidirectional = !directed, edges) match {
      case Right(chains) if chains.nonEmpty =>
        chains.flatMap { chain =>
          val ms = chain.map(e => byId(e.id))
          val bearing = TopoSort.chainBearing(ms.map(_.geometry.map(_.toArray).toArray))
          val padLen = (chain.length - 1).toString.length
          ms.zipWithIndex.map { case (m, k) =>
            val idxKey = k.toString.reverse.padTo(padLen, '0').reverse.mkString
            MatchOut(m.shstReferenceId, m.shstFromIntersectionId, m.shstToIntersectionId,
              m.targetMap, m.targetMapId,
              s"${m.targetMapId}|$bearing|$idxKey", k, bearing, chainsSorted = true,
              m.targetMapIsPrimary, m.targetMapNetHrchyRank, iterationId, m.score, m.geometry)
          }
        }
      case _ =>
        // unsorted fallback: charshift ids in input order (micro idx = input pos)
        val padLen = (normalized.length - 1).toString.length
        normalized.zipWithIndex.map { case (m, j) =>
          MatchOut(m.shstReferenceId, m.shstFromIntersectionId, m.shstToIntersectionId,
            m.targetMap, m.targetMapId,
            s"${m.targetMapId}!${TopoSort.charShiftIdx(j, padLen)}", j, -1,
            chainsSorted = false,
            m.targetMapIsPrimary, m.targetMapNetHrchyRank, iterationId, m.score, m.geometry)
        }
    }
  }

  /** Directedness per target map (the reference configures it per target
    * map): RIS-style maps are bidirectional — their features match both
    * directed references of a two-way road, and the toposort must accept
    * the opposite-pair chains (sortFeatures.js bidirectional mode). */
  def defaultDirectedFor(targetMap: String): Boolean =
    !targetMap.matches("^ris_\\d{4}$")

  /** Distributed operator: one shuffle on (targetMap, targetMapId). */
  def apply(scored: DataFrame,
      directedFor: String => Boolean = defaultDirectedFor,
      iterationId: Int = 0): Dataset[MatchOut] = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.select(
        col("shstReferenceId"), col("shstFromIntersectionId"), col("shstToIntersectionId"),
        col("targetMap"), col("targetMapId"),
        col("targetMapIsPrimary"), col("targetMapNetHrchyRank"),
        col("score"), col("geometry"))
      .as[MatchIn]
      .groupByKey(m => (m.targetMap, m.targetMapId))
      .flatMapGroups((key: (String, String), it: Iterator[MatchIn]) =>
        processGroup(key._2, directedFor(key._1), it.toSeq, iterationId).iterator)
  }
}

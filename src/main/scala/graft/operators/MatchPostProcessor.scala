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

  /**
   * Match row with the polyline reduced to its SUMMARY: vertex count (the
   * keep-longest sort key), endpoints (all any downstream bearing/offset
   * computation reads), geodesic length, and bbox (megaMetadata aggregates
   * group bboxes as min-of-mins / max-of-maxes, which is exact). The full
   * slice polyline stops at the scoring stage: carrying it here cost a
   * nested Seq[Seq[Double]] encoder round-trip per match in two typed
   * kernels plus ~3x the bytes through every downstream shuffle and cache
   * (measured 246 CPU-s of the 6.4M run's ~600, BENCH.md round 4c).
   * Two matches identical in every summary field are identical in geometry
   * too (same reference + same feature group ⇒ the same deterministic
   * slice), so the exact-dedup step is unchanged by the reduction.
   */
  case class MatchIn(
      shstReferenceId: String,
      shstFromIntersectionId: String,
      shstToIntersectionId: String,
      targetMap: String,
      targetMapId: String,
      targetMapIsPrimary: Boolean,
      targetMapNetHrchyRank: Int,
      score: Double,
      mNumPts: Int,
      msLon: Double, msLat: Double, meLon: Double, meLat: Double,
      mLenKm: Double,
      mMinLon: Double, mMinLat: Double, mMaxLon: Double, mMaxLat: Double)

  object MatchIn {
    /** Convenience for callers (and specs) holding an explicit polyline. */
    def fromGeometry(shstReferenceId: String, shstFromIntersectionId: String,
        shstToIntersectionId: String, targetMap: String, targetMapId: String,
        targetMapIsPrimary: Boolean, targetMapNetHrchyRank: Int, score: Double,
        geometry: Seq[Seq[Double]]): MatchIn = {
      val lons = geometry.map(_(0)); val lats = geometry.map(_(1))
      MatchIn(shstReferenceId, shstFromIntersectionId, shstToIntersectionId,
        targetMap, targetMapId, targetMapIsPrimary, targetMapNetHrchyRank, score,
        geometry.length,
        geometry.head(0), geometry.head(1), geometry.last(0), geometry.last(1),
        graft.geo.Geo.lengthKm(geometry.map(_.toArray).toArray),
        lons.min, lats.min, lons.max, lats.max)
    }
  }

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
      msLon: Double, msLat: Double, meLon: Double, meLat: Double,
      mLenKm: Double,
      mMinLon: Double, mMinLat: Double, mMaxLon: Double, mMaxLat: Double)

  /** Pure per-group kernel (exposed for unit tests). */
  def processGroup(targetMapId: String, directed: Boolean,
      matches: Seq[MatchIn], iterationId: Int = 0): Seq[MatchOut] = {
    // 1. vertex-count ascending sort, deterministic tie-break
    val sorted = matches.sortBy(m => (m.mNumPts, m.shstReferenceId))
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
          // chain bearing reads only first-of-first / last-of-last — the
          // summary endpoints are exactly those points
          val bearing = math.round(graft.geo.Geo.finalBearing(
            ms.head.msLon, ms.head.msLat, ms.last.meLon, ms.last.meLat)).toInt
          val padLen = (chain.length - 1).toString.length
          ms.zipWithIndex.map { case (m, k) =>
            val idxKey = k.toString.reverse.padTo(padLen, '0').reverse.mkString
            MatchOut(m.shstReferenceId, m.shstFromIntersectionId, m.shstToIntersectionId,
              m.targetMap, m.targetMapId,
              s"${m.targetMapId}|$bearing|$idxKey", k, bearing, chainsSorted = true,
              m.targetMapIsPrimary, m.targetMapNetHrchyRank, iterationId, m.score,
              m.msLon, m.msLat, m.meLon, m.meLat, m.mLenKm,
              m.mMinLon, m.mMinLat, m.mMaxLon, m.mMaxLat)
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
            m.targetMapIsPrimary, m.targetMapNetHrchyRank, iterationId, m.score,
            m.msLon, m.msLat, m.meLon, m.meLat, m.mLenKm,
            m.mMinLon, m.mMinLat, m.mMaxLon, m.mMaxLat)
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
        col("score"), col("mNumPts"),
        col("msLon"), col("msLat"), col("meLon"), col("meLat"), col("mLenKm"),
        col("mMinLon"), col("mMinLat"), col("mMaxLon"), col("mMaxLat"))
      .as[MatchIn]
      .groupByKey(m => (m.targetMap, m.targetMapId))
      .flatMapGroups((key: (String, String), it: Iterator[MatchIn]) =>
        processGroup(key._2, directedFor(key._1), it.toSeq, iterationId).iterator)
  }
}

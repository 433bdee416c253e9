package graft.model

/**
 * Typed data model (SURVEY.md §1.4, FIXTURES.md §1-§4).
 *
 * Spark encoders want `Seq[Seq[Double]]` for geometry; the pure kernels in
 * graft.operators convert to `Array[Array[Double]]` at the boundary.
 */

/** Graft input row (BASELINE.json input_hint): a Common-Crawl-style page. */
case class WebPage(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Normalized target-map feature (reference: target_maps.<tm> rows,
  * src/services/targetMapsSQLiteService/index.js:27-38 + the targetMap*
  * property convention, src/loaders/npmrds/loadTargetMapFeaturesIntoWorkDatabase.js:92-106). */
case class TargetMapFeature(
    id: String,
    url: String,
    text: String,
    targetMap: String,
    regionCode: String,
    countyCode: String,
    geoproxKey: String,
    targetMapId: String,
    targetMapMesoId: Option[String],
    targetMapMacroId: Option[String],
    targetMapMegaId: Option[String],
    targetMapIsPrimary: Boolean,
    targetMapNetHrchyRank: Int,
    direction: Option[String],
    roadOrder: Option[Double],
    targetMapMicroLevelBearing: Int,
    targetMapMesoLevelBearing: Int,
    geometry: Seq[Seq[Double]])

/** OSM way section carried on a SharedStreets geometry's metadata
  * (reference shape: src/conflation/TODO.md:4-28). */
case class WaySection(
    wayId: String,
    nodeIds: Seq[String],
    roadClass: String,
    oneWay: Boolean,
    roundabout: Boolean,
    link: Boolean,
    name: String)

/** A directed SharedStreets reference with its geometry + OSM metadata —
  * the output row shape of the reference's 3-way join view J1 + forward/back
  * expansion G1 (shstTilesetSQLiteService/index.js:67-83,
  * ShStReferenceFeatureIterator.js:64-144). */
case class ShstReference(
    shstReferenceId: String,
    geometryId: String,
    fromIntersectionId: String,
    toIntersectionId: String,
    isForward: Boolean,
    roadClass: String,
    oneWay: Boolean,
    coordinates: Seq[Seq[Double]],
    waySections: Seq[WaySection])

/** A match of a target-map feature onto a SharedStreets reference
  * (reference: shst_matches rows, shstMatchesSQLiteService/index.js:26-48). */
case class ShstMatch(
    shstReferenceId: String,
    shstFromIntersectionId: String,
    shstToIntersectionId: String,
    targetMap: String,
    targetMapId: String,
    matchedTargetMapId: String,
    matchedTargetMapMicroIdx: Int,
    targetMapIsPrimary: Boolean,
    targetMapNetHrchyRank: Int,
    matchIterationId: Int,
    score: Double,
    geometry: Seq[Seq[Double]])

/** Per-target-map metadata attached to a conflation segment. `megaDir` is
  * the match's mega-level direction of travel (addMegaLevelMetadata.js:34-45)
  * — the RIS majority-vote input of the output projection
  * (outputConflationNDSJON:36-59,75-92); None for osm intervals. */
case class SegmentTmMeta(
    targetMap: String,
    targetMapId: String,
    matchedTargetMapId: String,
    matchedTargetMapMicroIdx: Int,
    megaDir: Option[String])

/** A raw OSM turn restriction: via node + from/to way members
  * (rawOsmSQLiteService/index.js:38-42 `restrictions(node_id, members,
  * restriction)`). */
case class OsmRestriction(
    nodeId: String,
    fromWayId: String,
    viaNodeId: String,
    toWayId: String,
    restriction: String)

/** One split piece of a SharedStreets reference — the engine's signature
  * 1→N output row (reference: partitionShstReferenceByTargetMapsMatches/
  * index.js:119-137 + ConflationWorkDatabaseService.js:80-121). */
case class ConflationSegment(
    shstReferenceId: String,
    geometryId: String,
    fromIntersectionId: String,
    toIntersectionId: String,
    segmentIndex: Int,
    totalSegments: Int,
    startDist: Double,
    endDist: Double,
    networklevel: Double,
    nodeIds: Seq[String],
    coordinates: Seq[Seq[Double]],
    wayId: String,
    roadClass: String,
    oneWay: Boolean,
    tmMeta: Seq[SegmentTmMeta])

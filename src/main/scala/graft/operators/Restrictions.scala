package graft.operators

import graft.model.{ConflationSegment, OsmRestriction}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * J8: turn-restriction re-anchoring onto the conflation map
 * (src/osm/loadGeneratedOSM `loadRestrictions`:203-248):
 *
 * a raw restriction {from: rawWayId, via: nodeId, to: rawWayId} survives iff
 *  - some conflation way (= split segment) of the FROM raw way ENDS at the
 *    via node (conflationOsmSQLiteService `getWayIdByEndNodeAndRawOsmWayId`
 *    :195-219), and
 *  - some conflation way of the TO raw way STARTS at the via node
 *    (`getWayIdByStartNodeAndRawOsmWayId`:181-193);
 * its members are then rewritten to those conflation way ids.
 *
 * Spark shape: two equi-joins on (raw_osm_id, boundary node) — the
 * conflation-way side is derived from segments with a projection, no
 * geometry shuffled. The reference's SQLite `.get()` takes an arbitrary
 * first row on duplicates; here duplicates resolve deterministically to the
 * MIN conflation way id (a superset-stable choice, documented divergence).
 */
object Restrictions {

  /** Conflation-way endpoint projection: one row per segment with its raw
    * way id and first/last node (nulls ride through — an inserted split
    * vertex can never equal a raw via node). */
  def conflationWays(segments: Dataset[ConflationSegment]): DataFrame =
    segments.toDF().select(
      concat(col("shstReferenceId"), lit(":"), col("segmentIndex"))
        .as("conflation_way_id"),
      col("wayId").as("raw_osm_id"),
      element_at(col("nodeIds"), 1).as("start_node"),
      element_at(col("nodeIds"), -1).as("end_node"))

  /** Re-anchor raw restrictions; output one row per surviving restriction
    * with rewritten from/to members plus a dense ordered id (the
    * reference's `restrictionIdSeq`). */
  def reanchor(raw: Dataset[OsmRestriction],
      segments: Dataset[ConflationSegment]): DataFrame = {
    val ways = conflationWays(segments)
    val from = ways.select(col("raw_osm_id"), col("end_node"),
      col("conflation_way_id").as("from_way"))
    val to = ways.select(col("raw_osm_id"), col("start_node"),
      col("conflation_way_id").as("to_way"))
    val anchored = raw.toDF()
      .join(from, col("fromWayId") === from("raw_osm_id") &&
        col("viaNodeId") === from("end_node"))
      .drop("raw_osm_id", "end_node")
      .join(to, col("toWayId") === to("raw_osm_id") &&
        col("viaNodeId") === to("start_node"))
      .groupBy("viaNodeId", "fromWayId", "toWayId", "restriction")
      .agg(min("from_way").as("from_way"), min("to_way").as("to_way"))
    ConflationPipeline.withGlobalOrderedId(anchored,
      Seq("viaNodeId", "fromWayId", "toWayId", "restriction"), "restriction_id")
      .select(col("restriction_id"), col("viaNodeId"), col("from_way"),
        col("to_way"), col("restriction"))
  }
}

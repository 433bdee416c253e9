package graft.operators

import graft.model.ConflationSegment
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * G12: node-id reconciliation (src/osm/loadGeneratedOSM:91-132 + J7):
 * splitter-synthesized vertices (osmNodeId null) either REUSE an existing
 * node at the same rounded coordinates (7 dp, the reference's node-coord
 * precision, conflationOsmSQLiteService/index.js:61-62) or get a fresh id
 * allocated from a global sequence starting above the maximum existing
 * numeric id (A5 max + sequential allocation).
 *
 * Distribution: reuse is an equi-join on rounded (lon,lat); allocation is
 * the range-partition + per-partition-offset technique (never a
 * single-partition sort).
 */
object NodeIds {

  /** All (nodeId, vertex) pairs of the segments, coordinates rounded 7 dp. */
  private def vertexTable(segments: Dataset[ConflationSegment]): DataFrame =
    segments.toDF()
      .select(col("shstReferenceId"), col("segmentIndex"),
        arrays_zip(col("nodeIds"), col("coordinates")).as("vz"))
      .select(col("shstReferenceId"), col("segmentIndex"),
        posexplode(col("vz")).as(Seq("vertex_idx", "v")))
      .select(col("shstReferenceId"), col("segmentIndex"), col("vertex_idx"),
        col("v.nodeIds").as("node_id"),
        round(element_at(col("v.coordinates"), 1), 7).as("rlon"),
        round(element_at(col("v.coordinates"), 2), 7).as("rlat"))

  /**
   * Assign a node id to every vertex: existing ids pass through; synthetic
   * vertices reuse the id of any existing node at identical rounded coords,
   * else receive `synth_<seq>` with seq globally sequential and
   * deterministic (ordered by rounded coords).
   */
  def reconcile(segments: Dataset[ConflationSegment]): DataFrame = {
    val verts = vertexTable(segments)
    // J7: coordinate-equality lookup table of existing nodes (first id wins
    // deterministically on ties)
    val existing = verts.filter(col("node_id").isNotNull)
      .groupBy("rlon", "rlat").agg(min("node_id").as("reuse_id"))
    val withReuse = verts.join(existing, Seq("rlon", "rlat"), "left")
    // fresh ids for synthetic vertices with no coordinate match
    val toAllocate = withReuse
      .filter(col("node_id").isNull && col("reuse_id").isNull)
      .select("rlon", "rlat").distinct()
    val allocated = ConflationPipeline.withGlobalOrderedId(
        toAllocate, Seq("rlon", "rlat"), "seq")
      .withColumn("fresh_id", concat(lit("synth_"), col("seq")))
      .drop("seq")
    withReuse.join(allocated, Seq("rlon", "rlat"), "left")
      .withColumn("final_node_id",
        coalesce(col("node_id"), col("reuse_id"), col("fresh_id")))
      .select("shstReferenceId", "segmentIndex", "vertex_idx",
        "rlon", "rlat", "final_node_id")
  }
}

package graft.operators

import graft.functions.geo._
import graft.model.ShstReference
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * kNN segment lookup via cell-ring expansion (BASELINE.json north_star):
 * for each query point, candidate references are those whose cell cover
 * intersects the point's cell disk; exact distance = nearest-point-on-line.
 *
 * The ring radius bounds the search: a point's k nearest segments within
 * `maxRingKm` are guaranteed found when ring * cellSize ≥ maxRingKm. The
 * candidate join is an equi-join on cell id — no cross product, and hot
 * urban cells can be salted on the reference side.
 */
object Knn {

  /** cell level 14 ≈ 1.7 km lon × 1.2 km lat at this latitude. */
  val Level = 14

  /**
   * k nearest references per query point.
   * points: (point_id, lon, lat); output (point_id, shstReferenceId, rank,
   * dist_km rounded 6 dp, ranked by (dist, refId)).
   */
  def nearestReferences(points: DataFrame, refs: Dataset[ShstReference],
      k: Int, ring: Int = 2): DataFrame = {
    // ids only through the cell join and the multi-cell-overlap distinct —
    // a reference's polyline otherwise shuffles once PER COVERING CELL and
    // again through the distinct (VERDICT r2 #5); geometry and the query
    // coordinates re-attach once per surviving (point, ref) pair, each an
    // equi-join Spark can broadcast when the side is small, and AQE's
    // skew-join split handles hot urban cells on the slim join
    val refCells = refs.toDF()
      .select(col("shstReferenceId"),
        explode(cell_cover_line(col("coordinates"), lit(Level))).as("cell"))
    val probed = points.select(col("point_id"),
      explode(cell_disk(cell_encode(col("lon"), col("lat"), lit(Level)),
        lit(ring))).as("cell"))
    val cand = probed.join(refCells, Seq("cell"))
      .select("point_id", "shstReferenceId").distinct()
    val w = Window.partitionBy("point_id").orderBy(col("dist_km"), col("shstReferenceId"))
    cand
      .join(refs.toDF().select(col("shstReferenceId"), col("coordinates")),
        Seq("shstReferenceId"))
      .join(points.select("point_id", "lon", "lat"), Seq("point_id"))
      .withColumn("dist_km", round(
        element_at(nearest_point_on_line(col("coordinates"), col("lon"), col("lat")), 4), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("point_id", "shstReferenceId", "rank", "dist_km")
  }

  /** Exact full distance matrix (points × all refs) — the recall baseline's
    * input, and the q31 oracle side table (DuckDB re-ranks it exactly). */
  def allDistances(points: DataFrame, refs: Dataset[ShstReference]): DataFrame =
    points.crossJoin(refs.toDF().select(col("shstReferenceId"), col("coordinates")))
      .withColumn("dist_km", round(
        element_at(nearest_point_on_line(col("coordinates"), col("lon"), col("lat")), 4), 6))
      .select("point_id", "shstReferenceId", "dist_km")

  /** Exact brute-force baseline (points × all refs) for recall checks. */
  def bruteForce(points: DataFrame, refs: Dataset[ShstReference], k: Int): DataFrame = {
    val w = Window.partitionBy("point_id").orderBy(col("dist_km"), col("shstReferenceId"))
    allDistances(points, refs)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("point_id", "shstReferenceId", "rank", "dist_km")
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Input scans (SURVEY.md §2.1):
 *
 *  - S1 `loadFeaturesFromGzippedNdjson`: the reference's front door —
 *    gunzip → split lines → JSON.parse (parse failures skipped) → drop
 *    features without a ≥2-point coordinates array → county filter →
 *    id := targetMapId (loadFeaturesFromGZippedNDSJON.js:15-59). Spark
 *    decodes .gz transparently and PERMISSIVE mode + a corrupt-record
 *    column reproduces the per-line skip, distributed.
 *  - S3 `loadRawOsm*`: OSM XML scan via Spark 4's built-in `xml` source
 *    (one pass per rowTag), reproducing loadRawOSM:40-113's node/way/
 *    restriction extraction including the tags-map fold and the
 *    type=restriction + via-member gate.
 */
object Sources {

  /** Ingest schema of the reference's NDJSON features (the targetMap*
    * properties it reads before normalization). */
  val featureSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("properties", StructType(Seq(
      StructField("targetMapId", StringType),
      StructField("targetMapCountyCode", StringType),
      StructField("targetMap", StringType)))),
    StructField("geometry", StructType(Seq(
      StructField("type", StringType),
      StructField("coordinates", ArrayType(ArrayType(DoubleType)))))),
    StructField("_corrupt", StringType)))

  /** S1: see object doc. Returns (id, targetMap, targetMapCountyCode,
    * geometry) for the surviving features. */
  def loadFeaturesFromGzippedNdjson(spark: SparkSession, path: String,
      countyCode: String = "36001"): DataFrame =
    spark.read
      .schema(featureSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      // JSON.parse failure → line skipped (reference swallows per line)
      .filter(col("_corrupt").isNull)
      // geometry nil / non-array / <2 coordinates → skipped (:22-27)
      .filter(col("geometry.coordinates").isNotNull &&
        size(col("geometry.coordinates")) >= 2)
      // dev-subset county gate (:37-39)
      .filter(col("properties.targetMapCountyCode") === countyCode)
      .select(
        col("properties.targetMapId").as("id"),
        col("properties.targetMap").as("targetMap"),
        col("properties.targetMapCountyCode").as("targetMapCountyCode"),
        col("geometry.coordinates").as("geometry"))

  /** map_from_entries with the reference's JS-object semantics: a repeated
    * key takes the LAST value (`obj[k] = v` overwrites) instead of throwing
    * DUPLICATE_MAP_KEY under spark.sql.mapKeyDedupPolicy=EXCEPTION — real
    * OSM has repeated tag keys and multi-via restrictions, and one dirty
    * element must not fail the whole scan. Entry arrays are tiny (tags per
    * element), so the reversed keep-first scan is O(n²) on n≈10. */
  private def lastWriterWinsMap(entries: org.apache.spark.sql.Column) = {
    val rev = reverse(filter(entries, e => e.getField("k").isNotNull))
    map_from_entries(filter(rev, (e, i) =>
      !exists(slice(rev, lit(1), i), u => u.getField("k") === e.getField("k"))))
  }

  private def tagsMap(tagCol: org.apache.spark.sql.Column) =
    lastWriterWinsMap(transform(tagCol, t =>
      struct(t.getField("_k").as("k"), t.getField("_v").as("v"))))

  // explicit element schemas: inference would type a single <tag>/<nd>/
  // <member> child as a struct instead of a 1-element array
  private val tagArr = ArrayType(StructType(Seq(
    StructField("_k", StringType), StructField("_v", StringType))))
  val osmNodeSchema: StructType = StructType(Seq(
    StructField("_id", StringType), StructField("_lat", DoubleType),
    StructField("_lon", DoubleType), StructField("tag", tagArr)))
  val osmWaySchema: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("nd", ArrayType(StructType(Seq(StructField("_ref", StringType))))),
    StructField("tag", tagArr)))
  val osmRelationSchema: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("member", ArrayType(StructType(Seq(
      StructField("_type", StringType), StructField("_ref", StringType),
      StructField("_role", StringType))))),
    StructField("tag", tagArr)))

  /** S3: OSM XML nodes → (id, lon, lat, tags map). */
  def loadRawOsmNodes(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml").option("rowTag", "node").schema(osmNodeSchema).load(path)
      .select(col("_id").as("id"),
        col("_lon").as("lon"), col("_lat").as("lat"),
        when(col("tag").isNotNull, tagsMap(col("tag")))
          .otherwise(lit(null)).as("tags"))

  /** S3: OSM XML ways → (id, nodes array, tags map). */
  def loadRawOsmWays(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml").option("rowTag", "way").schema(osmWaySchema).load(path)
      .select(col("_id").as("id"),
        transform(col("nd"), n => n.getField("_ref")).as("nodes"),
        when(col("tag").isNotNull, tagsMap(col("tag")))
          .otherwise(lit(null)).as("tags"))

  /** S3: OSM XML relations → raw restrictions (type=restriction with a via
    * member only, loadRawOSM:50-78): (nodeId, fromWayId, viaNodeId,
    * toWayId, restriction). */
  def loadRawOsmRestrictions(spark: SparkSession, path: String): DataFrame = {
    val rels = spark.read.format("xml").option("rowTag", "relation")
      .schema(osmRelationSchema).load(path)
    // members[role] = ref in the reference (loadRawOSM:71): a repeated role
    // (multi-via restrictions) keeps the last member, same as tagsMap
    def roleRef(role: String) = element_at(
      lastWriterWinsMap(transform(
        filter(col("member"), m => m.getField("_role").isNotNull &&
          m.getField("_ref").isNotNull),
        m => struct(m.getField("_role").as("k"), m.getField("_ref").as("v")))), role)
    rels
      .withColumn("tags", tagsMap(col("tag")))
      .filter(element_at(col("tags"), "type") === "restriction")
      .select(
        roleRef("via").as("nodeId"),
        roleRef("from").as("fromWayId"),
        roleRef("via").as("viaNodeId"),
        roleRef("to").as("toWayId"),
        element_at(col("tags"), "restriction").as("restriction"))
      .filter(col("viaNodeId").isNotNull)
  }

  /**
   * `geojson_to_ndjson` analog (`bin/data_transforming/geojson_to_ndjson:8`
   * — a jq stream pulling `features[]` out of the envelope): a GeoJSON
   * FeatureCollection → one row per feature, the inverse of the S8 sink.
   * `multiLine` JSON parses one task per FILE — correct here because the
   * envelope is an inherently monolithic single-file artifact (its writer
   * is the same shape); a DIRECTORY of collections still fans out one task
   * per file, and the splittable scale path is NDJSON (S1).
   */
  def loadFeatureCollection(spark: SparkSession, path: String,
      feature: StructType): DataFrame =
    spark.read.option("multiLine", value = true)
      .schema(StructType(Seq(
        StructField("type", StringType),
        StructField("features", ArrayType(feature)))))
      .json(path)
      .select(explode(col("features")).as("feature"))
      .select("feature.*")

  /**
   * Stoplights task (`tasks/osm_stoplights_shapefile/data_transforms:7-14` →
   * `src/nodes_dump_to_ndjson:12-18`): the reference pipes a raw nodes dump
   * through `grep -v null | grep signal` — keep TAGGED nodes whose
   * serialized tags mention "signal" in any key OR value (the grep runs
   * over the whole psv line, so both match), shaped as point-feature rows
   * for the POINT shapefile ([[Shapefile.writePoints]]) / GeoJSON export.
   * Pure built-ins: the predicate is an `exists` over `map_entries`,
   * codegen'd, no UDF; at scale it is a narrow filter that pushes the
   * `tags IS NOT NULL` gate to the scan.
   */
  def trafficSignals(nodes: DataFrame): DataFrame =
    nodes.filter(col("tags").isNotNull &&
        exists(map_entries(col("tags")), e =>
          e.getField("key").contains("signal") ||
            e.getField("value").contains("signal")))
      .select(col("id"), col("lon"), col("lat"),
        size(col("tags")).as("n_tags"),
        element_at(col("tags"), "highway").as("highway"))
}

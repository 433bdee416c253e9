package graft

import graft.sources.Sources
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** S1 gzip-NDJSON ingest + S3 OSM XML scan. */
class SourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def gzWrite(path: java.io.File, lines: Seq[String]): Unit = {
    val gz = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(path))
    gz.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    gz.close()
  }

  test("S1: real .ndjson.gz ingest drops malformed/short-geometry/off-county rows") {
    val dir = Files.createTempDirectory("ndjson").toFile
    def feat(id: String, county: String, nCoords: Int): String = {
      val coords = (0 until nCoords)
        .map(i => s"[${-73.8 + i * 0.001},${42.7 + i * 0.001}]").mkString(",")
      s"""{"type":"Feature","properties":{"targetMapId":"$id","targetMapCountyCode":"$county","targetMap":"npmrds_2026"},"geometry":{"type":"LineString","coordinates":[$coords]}}"""
    }
    gzWrite(new java.io.File(dir, "a.ndjson.gz"), Seq(
      feat("keep1", "36001", 3),
      "{ totally broken json",
      feat("short_geom", "36001", 1),
      feat("keep2", "36001", 2)))
    gzWrite(new java.io.File(dir, "b.ndjson.gz"), Seq(
      feat("off_county", "36999", 4),
      """{"type":"Feature","properties":{"targetMapId":"nil_geom","targetMapCountyCode":"36001","targetMap":"x"}}""",
      feat("keep3", "36001", 5)))
    val got = Sources.loadFeaturesFromGzippedNdjson(
      spark, dir.getPath + "/*.ndjson.gz")
    val ids = got.select("id").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == Seq("keep1", "keep2", "keep3"))
    // geometry survives coordinate-exact
    val k3 = got.filter(col("id") === "keep3")
      .select(size(col("geometry"))).head().getInt(0)
    assert(k3 == 5)
  }

  test("S3: OSM XML scan extracts nodes, ways, and via-gated restrictions") {
    val dir = Files.createTempDirectory("osmxml").toFile
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<osm version="0.6">
        |  <node id="101" lat="42.70" lon="-73.80">
        |    <tag k="highway" v="traffic_signals"/>
        |  </node>
        |  <node id="102" lat="42.71" lon="-73.81"/>
        |  <node id="103" lat="42.72" lon="-73.82"/>
        |  <way id="9001">
        |    <nd ref="101"/>
        |    <nd ref="102"/>
        |    <tag k="highway" v="primary"/>
        |    <tag k="name" v="Main Street"/>
        |  </way>
        |  <way id="9002">
        |    <nd ref="102"/>
        |    <nd ref="103"/>
        |    <tag k="highway" v="primary"/>
        |  </way>
        |  <relation id="7001">
        |    <member type="way" ref="9001" role="from"/>
        |    <member type="node" ref="102" role="via"/>
        |    <member type="way" ref="9002" role="to"/>
        |    <tag k="type" v="restriction"/>
        |    <tag k="restriction" v="no_left_turn"/>
        |  </relation>
        |  <relation id="7002">
        |    <member type="way" ref="9001" role="outer"/>
        |    <tag k="type" v="multipolygon"/>
        |  </relation>
        |  <relation id="7003">
        |    <member type="way" ref="9001" role="from"/>
        |    <member type="way" ref="9002" role="to"/>
        |    <tag k="type" v="restriction"/>
        |    <tag k="restriction" v="no_u_turn"/>
        |  </relation>
        |</osm>""".stripMargin
    Files.writeString(new java.io.File(dir, "map.osm").toPath, xml)
    val path = dir.getPath + "/map.osm"

    val nodes = Sources.loadRawOsmNodes(spark, path).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(nodes.keySet == Set("101", "102", "103"))
    assert(nodes("101") == (-73.80, 42.70))

    val ways = Sources.loadRawOsmWays(spark, path)
    assert(ways.count() == 2)
    val w1 = ways.filter(col("id") === "9001").head()
    assert(w1.getSeq[String](1) == Seq("101", "102"))
    assert(w1.getMap[String, String](2)("name") == "Main Street")

    // only the type=restriction relation WITH a via member survives
    // (loadRawOSM:60-71: members.via || null → skip)
    val restr = Sources.loadRawOsmRestrictions(spark, path).collect()
    assert(restr.length == 1)
    val r = restr.head
    assert(r.getString(1) == "9001" && r.getString(2) == "102" &&
      r.getString(3) == "9002" && r.getString(4) == "no_left_turn")
  }

  test("S3: repeated tag keys / multi-via members keep the last value, not crash") {
    // real-world dirt: a repeated tag key and a restriction with two same-
    // role members — the reference's `obj[k] = v` keeps the last one; the
    // scan must do the same instead of DUPLICATE_MAP_KEY-failing (ADVICE r2)
    val dir = Files.createTempDirectory("osmdirty").toFile
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<osm version="0.6">
        |  <node id="201" lat="42.70" lon="-73.80">
        |    <tag k="name" v="first"/>
        |    <tag k="name" v="second"/>
        |    <tag k="ref" v="only"/>
        |  </node>
        |  <way id="9101">
        |    <nd ref="201"/>
        |    <nd ref="201"/>
        |    <tag k="highway" v="primary"/>
        |    <tag k="highway" v="service"/>
        |  </way>
        |  <relation id="7101">
        |    <member type="way" ref="9101" role="from"/>
        |    <member type="node" ref="201" role="via"/>
        |    <member type="node" ref="202" role="via"/>
        |    <member type="way" ref="9101" role="to"/>
        |    <tag k="type" v="restriction"/>
        |    <tag k="restriction" v="no_u_turn"/>
        |  </relation>
        |</osm>""".stripMargin
    Files.writeString(new java.io.File(dir, "dirty.osm").toPath, xml)
    val path = dir.getPath + "/dirty.osm"
    val n = Sources.loadRawOsmNodes(spark, path).head()
    assert(n.getMap[String, String](3) == Map("name" -> "second", "ref" -> "only"))
    val w = Sources.loadRawOsmWays(spark, path).head()
    assert(w.getMap[String, String](2)("highway") == "service")
    val r = Sources.loadRawOsmRestrictions(spark, path).head()
    assert(r.getString(2) == "202", "last via member wins")
  }

  test("S5/S10: shapefile export round-trips through the distributed scan") {
    import graft.sources.Shapefile
    val dir = Files.createTempDirectory("shp").toFile
    val base = new java.io.File(dir, "roads").getPath
    // polylines straight from the synthetic network
    val rows = (0 until 5).map { r =>
      (s"road_$r", graft.synth.Synth.roadCoords(r, 40).map(_.toSeq).toSeq)
    }
    Shapefile.writePolylines(rows, base)
    assert(new java.io.File(base + ".shp").length() > 100)
    assert(new java.io.File(base + ".shx").length() == 100 + 8 * rows.length)
    val back = Shapefile.read(spark, dir.getPath).cache()
    assert(back.count() == 5)
    // geometry round-trips double-exact
    val got = back.collect().map { r =>
      r.getAs[Map[String, String]]("attributes")("id") ->
        r.getSeq[Seq[Double]](2)
    }.toMap
    rows.foreach { case (id, coords) =>
      assert(got(id) == coords, s"geometry mismatch for $id")
    }
    assert(back.filter(col("shape_type") =!= 3).count() == 0)
  }

  test("S3/S11 loop: the OSM XML way sink reads back with the XML scan") {
    val segments = graft.operators.ConflationPipeline.run(spark, 200, 20)
    val path = Files.createTempDirectory("roundtrip").toString + "/ways"
    graft.operators.Sinks.osmXmlWays(segments, path)
    // wrap the fragments in a root element so the file is a valid OSM doc
    val frags = spark.read.text(path).collect().map(_.getString(0))
    val doc = "<osm>\n" + frags.mkString("\n") + "\n</osm>"
    val wrapped = Files.createTempDirectory("roundtrip2").toString + "/doc.osm"
    Files.writeString(java.nio.file.Path.of(wrapped), doc)
    val back = Sources.loadRawOsmWays(spark, wrapped)
    assert(back.count() == segments.count())
    // node refs round-trip (nulls are skipped by the sink)
    val sunkNodes = segments.toDF()
      .select(explode(col("nodeIds")).as("n")).filter(col("n").isNotNull)
      .distinct().count()
    val readNodes = back.select(explode(col("nodes")).as("n")).distinct().count()
    assert(readNodes == sunkNodes)
  }

  test("T2: conflation shapefile round-trip — 10-char DBF names, exact survival") {
    val segments = graft.operators.ConflationPipeline.run(spark, 200, 20)
    val dir = Files.createTempDirectory("shp").toString
    val n = graft.sources.Shapefile.writeConflationShapefile(segments, s"$dir/conflation")
    val back = graft.sources.Shapefile.read(spark, dir).cache()
    assert(n == segments.count() && back.count() == n)
    // the dBase 10-char field-name cap produced the reference's sed rename
    val keys = back.select(explode(map_keys(col("attributes"))).as("k"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(keys == Set("id", "networklev", "road_class", "len_km"))
    // attributes AND geometry doubles survive exactly (DBF text leg via
    // Double.toString→cast, shp leg as binary doubles)
    val want = segments.toDF().select(
      concat_ws(":", col("shstReferenceId"), col("segmentIndex")).as("id"),
      col("networklevel"), (col("endDist") - col("startDist")).as("len_km"),
      size(col("coordinates")).as("nc"),
      element_at(element_at(col("coordinates"), 1), 1).as("lon1"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getInt(3), r.getDouble(4)))).toMap
    val got = back.select(col("attributes")("id"),
      col("attributes")("networklev").cast("double"),
      col("attributes")("len_km").cast("double"),
      size(col("geometry")),
      element_at(element_at(col("geometry"), 1), 1))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getInt(3), r.getDouble(4)))).toMap
    assert(got == want)
  }

  test("S8 inverse: FeatureCollection envelope pulls back apart into feature rows") {
    val segments = graft.operators.ConflationPipeline.run(spark, 200, 20)
    val path = Files.createTempDirectory("fc").toString + "/collection"
    graft.operators.Sinks.geojsonFeatureCollection(segments, path)
    val feature = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("properties",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.StringType)))),
      org.apache.spark.sql.types.StructField("geometry",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("coordinates",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.DoubleType))))))))
    val back = Sources.loadFeatureCollection(spark, path, feature)
    assert(back.count() == segments.count())
    assert(back.filter(col("type") =!= "Feature").count() == 0)
    // geometry doubles survive the JSON round-trip exactly
    val wantFirst = segments.toDF()
      .select(concat(col("shstReferenceId"), lit(":"), col("segmentIndex")).as("id"),
        element_at(element_at(col("coordinates"), 1), 1).as("lon"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val gotFirst = back
      .select(col("properties.id"),
        element_at(element_at(col("geometry.coordinates"), 1), 1))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gotFirst == wantFirst)
  }
}

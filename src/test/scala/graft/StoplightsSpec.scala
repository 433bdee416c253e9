package graft

import graft.sources.{Shapefile, Sources}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stoplights task (tasks/osm_stoplights_shapefile): signal-node extraction
  * semantics (`grep -v null | grep signal` over the raw nodes dump), the
  * end-to-end XML-fixture → S3-scan → extraction parity with the generator,
  * and the POINT shapefile export round-trip. */
class StoplightsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("trafficSignals keeps key- and value-matches, drops untagged and non-matching nodes") {
    import spark.implicits._
    val nodes = Seq(
      ("n1", -73.9, 42.6, Some(Map("highway" -> "traffic_signals"))), // value match
      ("n2", -73.8, 42.5, Some(Map("traffic_signals:direction" -> "forward"))), // key match
      ("n3", -73.7, 42.4, Some(Map("highway" -> "stop"))), // tagged, no match
      ("n4", -73.6, 42.3, None), // null tags: the grep -v null case
      ("n5", -73.5, 42.2, Some(Map("crossing" -> "traffic_signals", "button_operated" -> "yes")))
    ).toDF("id", "lon", "lat", "tags")
    val got = Sources.trafficSignals(nodes)
      .select("id", "n_tags", "highway").collect()
      .map(r => (r.getString(0), r.getInt(1), Option(r.getString(2)))).toSet
    assert(got === Set(("n1", 1, Some("traffic_signals")), ("n2", 1, None),
      ("n5", 2, None)))
  }

  test("XML fixture through the real S3 scan matches the generator row-for-row") {
    val dir = java.nio.file.Files.createTempDirectory("stoplights").toString
    val xml = SmokeWorld.writeOsmNodesFixture(dir, force = true)
    val scanned = Sources.loadRawOsmNodes(spark, xml)
    assert(scanned.count() === SmokeWorld.osmNodeRows.size.toLong)
    // coordinates and tags survive the XML round-trip exactly
    val got = scanned.select(col("id"), col("lon"), col("lat"),
        when(col("tags").isNotNull, map_entries(col("tags"))).otherwise(lit(null)).as("kv"))
      .collect()
      .map { r =>
        // tag order is a map-construction artifact (lastWriterWinsMap scans
        // reversed); the task's semantics are order-free, so compare sorted
        val kv = Option(r.getSeq[org.apache.spark.sql.Row](3))
          .map(_.map(e => (e.getString(0), e.getString(1))).toList.sorted)
        (r.getString(0), r.getDouble(1), r.getDouble(2), kv)
      }.toSet
    val want = SmokeWorld.osmNodeRows.map { case (id, lon, lat, tags) =>
      (id, lon, lat, Option(tags).map(_.toList.sorted))
    }.toSet
    assert(got === want)
  }

  test("end-to-end extraction equals the grep recomputation over generator rows") {
    val dir = java.nio.file.Files.createTempDirectory("stoplights2").toString
    val xml = SmokeWorld.writeOsmNodesFixture(dir, force = true)
    val got = Sources.trafficSignals(Sources.loadRawOsmNodes(spark, xml))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getInt(3),
        Option(r.getString(4)))).toSet
    val want = SmokeWorld.osmNodeRows.collect {
      case (id, lon, lat, tags) if tags != null &&
          tags.exists { case (k, v) => k.contains("signal") || v.contains("signal") } =>
        (id, lon, lat, tags.size, tags.collectFirst { case ("highway", v) => v })
    }.toSet
    assert(got === want)
    assert(got.size === 360) // 3 of 10 generator groups match
  }

  test("POINT shapefile round-trips ids and exact coordinates") {
    val dir = java.nio.file.Files.createTempDirectory("shp_points").toString
    val rows = Seq(("sig_1", -73.912345, 42.654321),
      ("sig_2", -73.801, 42.702), ("sig_3", -73.75, 42.8))
    Shapefile.writePoints(rows, s"$dir/traffic_signals")
    val back = Shapefile.read(spark, dir).collect()
      .map(r => (r.getInt(1), // shape_type
        r.getSeq[scala.collection.Seq[Double]](2).head,
        r.getMap[String, String](3)("id")))
    assert(back.length === 3)
    assert(back.forall(_._1 === 1))
    val got = back.map(b => (b._3, b._2(0), b._2(1))).toSet
    assert(got === rows.toSet)
  }

  test("stoplights export: extraction → writePoints → read-back count") {
    val dir = java.nio.file.Files.createTempDirectory("stoplights3").toString
    val xml = SmokeWorld.writeOsmNodesFixture(dir, force = true)
    val sig = Sources.trafficSignals(Sources.loadRawOsmNodes(spark, xml))
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    Shapefile.writePoints(sig, s"$dir/signals")
    val n = Shapefile.read(spark, dir).count()
    assert(n === 360L)
  }
}

package graft

import graft.operators.{ConflationPipeline, Sinks}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SinksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val segments = ConflationPipeline.run(spark, 200, 20).cache()

  test("NDJSON sink: one feature per line, readable back, projection intact") {
    val path = Files.createTempDirectory("ndjson").toString + "/out"
    Sinks.conflationNdjson(segments, path)
    val back = spark.read.json(path)
    assert(back.count() == segments.count())
    assert(back.columns.toSet.contains("geometry"))
    assert(back.filter(col("type") =!= "Feature").count() == 0)
    // the reference's reduced properties (outputConflationNDSJON:30-33,63-69):
    // abbreviated per-target-map columns + split_seg + dir
    val props = back.select("properties.*").columns.toSet
    assert(Set("id", "split_seg", "networklevel", "dir").subsetOf(props), props)
    assert(Set("tmc26id", "tmc26idx", "ris26id", "ris26idx",
      "osmid", "osmidx").subsetOf(props), props)
    // composite ids are split on [|!]: no separator survives in <abbr>id
    assert(back.filter(col("properties.tmc26id").rlike("[|!]")).count() == 0)
    assert(back.filter(col("properties.osmid").rlike("[|!]")).count() == 0)
    // dir is always one of the four direction names
    assert(back.filter(!col("properties.dir").isin(
      "NORTHBOUND", "EASTBOUND", "SOUTHBOUND", "WESTBOUND")).count() == 0)
    // split_seg matches "<idx>:<total>"
    assert(back.filter(!col("properties.split_seg").rlike("^\\d+:\\d+$")).count() == 0)
  }

  test("GeoJSON FeatureCollection: valid envelope, all features present") {
    val path = Files.createTempDirectory("geojson").toString + "/fc"
    Sinks.geojsonFeatureCollection(segments, path)
    val txt = spark.read.text(path).collect().map(_.getString(0)).mkString("\n")
    assert(txt.startsWith("""{"type":"FeatureCollection","features":["""))
    assert(txt.endsWith("]}"))
    // parse it: line count of features == segment count
    val parsed = spark.read.json(
      spark.createDataset(Seq(txt))(org.apache.spark.sql.Encoders.STRING))
    assert(parsed.select(explode(col("features"))).count() == segments.count())
  }

  test("OSM-XML-shaped sink: well-formed way elements with sanitized tags") {
    val path = Files.createTempDirectory("osmxml").toString + "/ways"
    Sinks.osmXmlWays(segments, path)
    val lines = spark.read.text(path).collect().map(_.getString(0))
    val ways = lines.count(_.contains("<way id="))
    assert(ways == segments.count())
    assert(lines.exists(_.contains("<nd ref=")))
    assert(!lines.exists(l => l.contains("v=\"<")))
  }

  test("node→ways index: every non-null node appears; positions valid") {
    val idx = Sinks.nodeToWaysIndex(segments)
    assert(idx.count() > 0)
    assert(idx.filter(size(map_keys(col("ways"))) < 1).count() == 0)
    // every indexed node really is a node of some segment
    val nodes = segments.toDF().select(explode(col("nodeIds")).as("n"))
      .filter(col("n").isNotNull).distinct()
    assert(idx.join(nodes, idx("node_id") === nodes("n"), "left_anti").count() == 0)
  }

  test("QA CSV sink round-trips") {
    val feats = ConflationPipeline.features(ConflationPipeline.pages(spark, 200, 20), 20)
    val qa = ConflationPipeline.qaReport(feats, segments)
    val summary = ConflationPipeline.qaSummary(qa)
    val base = Files.createTempDirectory("qacsv").toString
    Sinks.qaCsv(qa, summary, base)
    val backQa = spark.read.option("header", "true").csv(s"$base/per_feature")
    val backSum = spark.read.option("header", "true").csv(s"$base/summary")
    assert(backQa.count() == qa.count())
    assert(backSum.count() == summary.count())
    assert(backQa.columns.contains("len_ratio_diff"))
  }
}

package graft

import graft.operators.{ConflationPipeline, Restrictions, Sinks}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** J8: restriction re-anchoring invariants (loadGeneratedOSM:203-248,
  * conflationOsmSQLiteService:181-219). */
class RestrictionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val segments = ConflationPipeline.run(spark, 200, 20).cache()
  private lazy val raw = ConflationPipeline.restrictions(spark, 20).cache()
  private lazy val anchored = Restrictions.reanchor(raw, segments).cache()

  test("synthetic world produces raw restrictions and some survive") {
    assert(raw.count() > 0)
    assert(anchored.count() > 0)
  }

  test("every surviving restriction's members are real conflation-way anchors") {
    val ways = Restrictions.conflationWays(segments).cache()
    // from_way must END at the via node
    val fromOk = anchored
      .join(ways, anchored("from_way") === ways("conflation_way_id"))
      .filter(col("end_node") =!= col("viaNodeId"))
    assert(fromOk.count() == 0)
    // to_way must START at the via node
    val toOk = anchored
      .join(ways, anchored("to_way") === ways("conflation_way_id"))
      .filter(col("start_node") =!= col("viaNodeId"))
    assert(toOk.count() == 0)
    // members reference ways derived from the restriction's RAW ways
    // (recover the raw ids by joining back on the unique via node)
    val fromRaw = anchored
      .join(ways, anchored("from_way") === ways("conflation_way_id"))
      .join(raw.toDF().select(col("viaNodeId").as("via2"), col("fromWayId")),
        col("viaNodeId") === col("via2"))
      .filter(col("raw_osm_id") =!= col("fromWayId"))
    assert(fromRaw.count() == 0)
  }

  test("a restriction without both anchors is dropped (reference nil-check)") {
    import spark.implicits._
    // a via node that exists on no segment boundary can never anchor
    val phantom = Seq(graft.model.OsmRestriction(
      "n_phantom", "w0_0", "n_phantom", "w0_1", "no_left_turn")).toDS()
    assert(Restrictions.reanchor(phantom, segments).count() == 0)
  }

  test("restriction ids are dense, ordered, and deterministic") {
    val ids = anchored.select("restriction_id").as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    assert(ids.head == 1L && ids.last == ids.length.toLong)
    val again = Restrictions.reanchor(raw, segments)
      .collect().map(_.toString).sorted
    assert(again.sameElements(anchored.collect().map(_.toString).sorted))
  }

  test("OSM XML relation sink renders well-formed restriction relations") {
    val path = Files.createTempDirectory("osmrel").toString + "/relations"
    Sinks.osmXmlRestrictions(anchored, path)
    val lines = spark.read.text(path).collect().map(_.getString(0))
    assert(lines.count(_.contains("<relation id=")) == anchored.count())
    assert(lines.count(_.contains("""role="via"""")) == anchored.count())
    assert(lines.exists(_.contains("""<tag k="type" v="restriction"/>""")))
  }
}

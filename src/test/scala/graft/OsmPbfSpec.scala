package graft

import graft.operators.ConflationPipeline
import graft.sources.OsmPbf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Native OSM PBF export (the osmosis-step analog) + scan round-trip. */
class OsmPbfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private lazy val segments = ConflationPipeline.run(spark, 200, 20).cache()

  test("block encoders round-trip dense nodes, ways, relations exactly") {
    // hand-assembled entity set, no Spark — pins the wire encoding itself
    val nodes = Seq(OsmPbf.PbfNode(101L, -73.8000001, 42.7000009),
      OsmPbf.PbfNode(-5L, -73.81, 42.71), OsmPbf.PbfNode(102L, -73.82, 42.72))
    val ways = Seq(
      OsmPbf.PbfWay(1L, Seq(101L, -5L, 102L), Seq("highway" -> "primary")),
      OsmPbf.PbfWay(2L, Seq(102L, 101L), Seq("highway" -> "service", "x" -> "<&\"y")))
    val rels = Seq(OsmPbf.PbfRelation(7L,
      Seq(OsmPbf.PbfMember("from", 1L, 1), OsmPbf.PbfMember("via", -5L, 0),
        OsmPbf.PbfMember("to", 2L, 1)),
      Seq("type" -> "restriction", "restriction" -> "no_left_turn")))
    val dir = Files.createTempDirectory("pbfblocks")
    val out = new java.io.FileOutputStream(dir.resolve("a.osm.pbf").toFile)
    val header = classOf[OsmPbf.type] // (keep the object initialized)
    out.write(framed("OSMHeader"))
    out.write(framedData(OsmPbf.nodesBlock(nodes)))
    out.write(framedData(OsmPbf.waysBlock(ways)))
    out.write(framedData(OsmPbf.relationsBlock(rels)))
    out.close()
    // a corrupt shard in the same glob is skipped whole, not fatal
    Files.write(dir.resolve("corrupt.osm.pbf"),
      Array[Byte](0, 0, 0, 9, 1, 2, 3, 4, 5, 6, 7, 8, 9, -1))
    val ents = OsmPbf.read(spark, dir.toString + "/*.osm.pbf").collect()
    val n = ents.filter(_.kind == "node").sortBy(_.id)
    assert(n.map(_.id).toSeq == Seq(-5L, 101L, 102L))
    // 100-nanodegree granularity: 7-dp coordinates round-trip exactly
    assert(n.find(_.id == 101L).get.lon == -73.8000001)
    assert(n.find(_.id == 101L).get.lat == 42.7000009)
    val w = ents.filter(_.kind == "way").sortBy(_.id)
    assert(w(0).refs == Seq(101L, -5L, 102L))
    assert(w(0).tags == Map("highway" -> "primary"))
    assert(w(1).tags("x") == "<&\"y") // binary format: no XML escaping needed
    val r = ents.filter(_.kind == "relation").head
    assert(r.memberRoles == Seq("from", "via", "to"))
    assert(r.memberIds == Seq(1L, -5L, 2L))
    assert(r.memberTypes == Seq(1, 0, 1))
    assert(r.tags("restriction") == "no_left_turn")
  }

  // test-local framing mirrors of the (private) production framing, so the
  // block-encoder test controls its own file layout
  private def zlibC(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(); d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(); val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }
  private def vint(v0: Long): Array[Byte] = {
    var x = v0; val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var done = false
    while (!done) {
      val c = (x & 0x7f).toInt; x = x >>> 7
      b += (if (x != 0) (c | 0x80) else c).toByte; done = x == 0
    }
    b.toArray
  }
  private def lenF(f: Int, body: Array[Byte]) =
    vint((f << 3) | 2) ++ vint(body.length.toLong) ++ body
  private def varFF(f: Int, v: Long) = vint((f << 3).toLong) ++ vint(v)
  private def blob(payload: Array[Byte]): Array[Byte] =
    varFF(2, payload.length.toLong) ++ lenF(3, zlibC(payload))
  private def framedOf(t: String, b: Array[Byte]): Array[Byte] = {
    val h = lenF(1, t.getBytes("UTF-8")) ++ varFF(3, b.length.toLong)
    java.nio.ByteBuffer.allocate(4 + h.length + b.length)
      .putInt(h.length).put(h).put(b).array()
  }
  private def framed(t: String): Array[Byte] =
    framedOf(t, blob(lenF(4, "OsmSchema-V0.6".getBytes("UTF-8"))))
  private def framedData(block: Array[Byte]): Array[Byte] =
    framedOf("OSMData", blob(block))

  test("dense-node keys_vals decode; packed fields accumulate across chunks") {
    // hand-assembled PrimitiveBlock the in-repo writer never emits:
    // stringtable ["", "highway", "crossing"], DenseNodes with per-node
    // 0-terminated (key,val) runs in field 10, AND every packed field split
    // into TWO length-delimited chunks (spec-legal re-encoding)
    def zzE(v: Long): Long = (v << 1) ^ (v >> 63)
    val st = lenF(1, lenF(1, Array.empty[Byte]) ++
      lenF(1, "highway".getBytes("UTF-8")) ++ lenF(1, "crossing".getBytes("UTF-8")))
    val dense =
      lenF(1, vint(zzE(5L))) ++ lenF(1, vint(zzE(3L))) ++          // ids 5, 8
      lenF(8, vint(zzE(427000000L)) ++ vint(zzE(1000L))) ++        // lats
      lenF(9, vint(zzE(-738000000L))) ++ lenF(9, vint(zzE(-500L))) ++ // lons (2 chunks)
      lenF(10, vint(1) ++ vint(2) ++ vint(0)) ++ lenF(10, vint(0)) // tags: n1 only
    val group = lenF(2, dense)
    val wayMsg = varFF(1, 77L) ++
      lenF(8, vint(zzE(100L)) ++ vint(zzE(1L))) ++ // refs 100, 101...
      lenF(8, vint(zzE(1L)))                       // ...then 102 (delta carries over)
    val block = st ++ lenF(2, group ++ lenF(3, wayMsg)) ++ varFF(17, 100L)
    val dir = Files.createTempDirectory("pbfdense")
    Files.write(dir.resolve("d.osm.pbf"),
      framed("OSMHeader") ++ framedData(block))
    val ents = OsmPbf.read(spark, dir.toString + "/*.osm.pbf").collect()
    val nodes = ents.filter(_.kind == "node").sortBy(_.id)
    assert(nodes.map(_.id).toSeq == Seq(5L, 8L))
    assert(nodes(0).tags == Map("highway" -> "crossing"))
    assert(nodes(1).tags == Map.empty)
    assert(math.abs(nodes(0).lat - 42.7) < 1e-9 &&
      math.abs(nodes(0).lon - (-73.8)) < 1e-9)
    assert(math.abs(nodes(1).lat - 42.7001) < 1e-9 &&
      math.abs(nodes(1).lon - (-73.80005)) < 1e-9)
    val way = ents.find(_.kind == "way").get
    assert(way.id == 77L && way.refs == Seq(100L, 101L, 102L))
  }

  test("malformed shard claiming a ~2GB length is skipped, not an executor OOM") {
    val dir = Files.createTempDirectory("pbfbad")
    // hlen = 0x7ffffff0: allocation without the bounds check would OOM
    Files.write(dir.resolve("huge-header.osm.pbf"),
      java.nio.ByteBuffer.allocate(16).putInt(0x7ffffff0)
        .put(Array.fill[Byte](12)(1)).array())
    // valid header, then a Blob claiming 2GB datasize
    val h = lenF(1, "OSMData".getBytes("UTF-8")) ++ varFF(3, 0x7ffffff0L)
    Files.write(dir.resolve("huge-blob.osm.pbf"),
      java.nio.ByteBuffer.allocate(4 + h.length + 8).putInt(h.length).put(h)
        .put(Array.fill[Byte](8)(2)).array())
    // a good shard in the same glob still parses
    Files.write(dir.resolve("good.osm.pbf"), framed("OSMHeader") ++
      framedData(OsmPbf.nodesBlock(Seq(OsmPbf.PbfNode(1L, -73.8, 42.7)))))
    val ents = OsmPbf.read(spark, dir.toString + "/*.osm.pbf").collect()
    assert(ents.map(_.id).toSeq == Seq(1L))
  }

  test("writeDocument: sharded pbf export round-trips with referential closure") {
    val reanchored = graft.operators.Restrictions.reanchor(
      ConflationPipeline.restrictions(spark, 20), segments)
    val base = Files.createTempDirectory("pbfdoc").toString
    OsmPbf.writeDocument(segments, reanchored, base)
    val ents = OsmPbf.read(spark, base + "/*/part-*.osm.pbf").cache()
    val nodes = ents.filter(col("kind") === "node")
    val ways = ents.filter(col("kind") === "way")
    val rels = ents.filter(col("kind") === "relation")
    assert(ways.count() == segments.count())
    assert(rels.count() == reanchored.count() && rels.count() > 0)
    // closure: every way ref and via member resolves to an emitted node
    val nodeIds = nodes.select(col("id"))
    assert(ways.select(explode(col("refs")).as("id"))
      .join(nodeIds, Seq("id"), "left_anti").count() == 0)
    val viaIds = rels.select(explode(arrays_zip(col("memberIds"), col("memberTypes"))).as("m"))
      .filter(col("m.memberTypes") === 0).select(col("m.memberIds").as("id"))
    assert(viaIds.join(nodeIds, Seq("id"), "left_anti").count() == 0)
    // way members resolve to emitted way ids
    val wayIds = ways.select(col("id"))
    val wayMembers = rels.select(explode(arrays_zip(col("memberIds"), col("memberTypes"))).as("m"))
      .filter(col("m.memberTypes") === 1).select(col("m.memberIds").as("id"))
    assert(wayMembers.join(wayIds, Seq("id"), "left_anti").count() == 0)
    // synthetic split vertices present as negative ids
    assert(nodes.filter(col("id") < 0).count() > 0)
    // composite id rides as the split_id tag and matches the XML document's ids
    assert(ways.filter(element_at(col("tags"), "split_id").isNull).count() == 0)
    // node coordinates: 7-dp round-trip against the reconciled vertex table
    val verts = segments.toDF()
      .select(explode(arrays_zip(col("nodeIds"), col("coordinates"))).as("v"))
      .filter(col("v.nodeIds").isNotNull)
      .select(OsmPbf.nodeIdExpr(col("v.nodeIds")).as("id"),
        round(element_at(col("v.coordinates"), 1), 7).as("lon"),
        round(element_at(col("v.coordinates"), 2), 7).as("lat"))
      .distinct()
    val mism = verts.join(nodes.select(col("id"), col("lon").as("plon"),
        col("lat").as("plat")), Seq("id"))
      .filter(abs(col("lon") - col("plon")) > 5e-8 || abs(col("lat") - col("plat")) > 5e-8)
    assert(mism.count() == 0, mism.take(3).mkString(","))
  }
}

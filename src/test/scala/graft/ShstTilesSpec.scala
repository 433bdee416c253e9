package graft

import graft.sources.ShstTiles
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import scala.collection.mutable.ArrayBuffer

/** S2: SharedStreets PBF tile converter on a hand-encoded fixture tileset.
  * The fixture bytes are assembled by a test-local encoder (below) plus one
  * fully hand-pinned byte literal, so the reader isn't graded against its
  * own serialization. */
class ShstTilesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- test-local protobuf encoder ----------------------------------------
  private def vint(v0: Long): Array[Byte] = {
    var x = v0
    val b = ArrayBuffer.empty[Byte]
    var done = false
    while (!done) {
      val c = (x & 0x7f).toInt
      x = x >>> 7
      b += (if (x != 0) (c | 0x80) else c).toByte
      done = x == 0
    }
    b.toArray
  }
  private def strF(tag: Int, s: String): Array[Byte] =
    vint((tag << 3) | 2) ++ vint(s.length.toLong) ++ s.getBytes("UTF-8")
  private def varF(tag: Int, v: Long): Array[Byte] = vint((tag << 3).toLong) ++ vint(v)
  private def dblLE(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    (0 until 8).map(i => ((bits >>> (8 * i)) & 0xff).toByte).toArray
  }
  private def packedD(tag: Int, ds: Seq[Double]): Array[Byte] =
    vint((tag << 3) | 2) ++ vint(ds.length * 8L) ++ ds.flatMap(dblLE)
  private def packedV(tag: Int, vs: Seq[Long]): Array[Byte] = {
    val body = vs.flatMap(vint)
    vint((tag << 3) | 2) ++ vint(body.length.toLong) ++ body
  }
  private def subF(tag: Int, body: Array[Byte]): Array[Byte] =
    vint((tag << 3) | 2) ++ vint(body.length.toLong) ++ body
  private def frame(msgs: Array[Byte]*): Array[Byte] =
    msgs.flatMap(m => vint(m.length.toLong) ++ m).toArray

  // ---- fixture tileset -----------------------------------------------------
  private lazy val tilesDir: String = {
    val dir = Files.createTempDirectory("shsttiles")
    val g1 = strF(1, "g1") ++ strF(2, "iA") ++ strF(3, "iB") ++
      strF(4, "fwd1") ++ strF(5, "back1") ++ varF(6, 2) ++ // Primary
      packedD(7, Seq(-73.80, 42.70, -73.81, 42.71, -73.82, 42.72)) ++
      varF(9, 99) // unknown field: must be skipped, not crash
    val g2 = strF(1, "g2") ++ strF(2, "iB") ++ strF(3, "iC") ++
      strF(4, "fwd2") ++ varF(6, 5) ++ // Residential, NO back ref → one-way
      packedD(7, Seq(-73.82, 42.72, -73.83, 42.73))
    Files.write(dir.resolve("12-100-200.geometry.8.pbf"), frame(g1, g2))

    def lr(iid: String, lon: Double, lat: Double, in: Option[Int],
        out: Option[Int], dist: Option[Int]): Array[Byte] =
      strF(1, iid) ++
        (vint((2 << 3) | 1) ++ dblLE(lon)) ++ (vint((3 << 3) | 1) ++ dblLE(lat)) ++
        in.map(varF(4, _)).getOrElse(Array.empty[Byte]) ++
        out.map(varF(5, _)).getOrElse(Array.empty[Byte]) ++
        dist.map(varF(6, _)).getOrElse(Array.empty[Byte])
    val rFwd1 = strF(1, "fwd1") ++ strF(2, "g1") ++ varF(3, 3) ++
      subF(4, lr("iA", -73.80, 42.70, None, Some(45), Some(283))) ++
      subF(4, lr("iB", -73.82, 42.72, Some(44), None, None))
    val rBack1 = strF(1, "back1") ++ strF(2, "g1") ++ varF(3, 3) ++
      subF(4, lr("iB", -73.82, 42.72, None, Some(225), Some(283))) ++
      subF(4, lr("iA", -73.80, 42.70, Some(224), None, None))
    val rFwd2 = strF(1, "fwd2") ++ strF(2, "g2") ++ varF(3, 4) ++
      subF(4, lr("iB", -73.82, 42.72, None, Some(45), Some(141))) ++
      subF(4, lr("iC", -73.83, 42.73, Some(44), None, None))
    Files.write(dir.resolve("12-100-200.reference.8.pbf"),
      frame(rFwd1, rBack1, rFwd2))

    def ws(wayId: Long, rc: Int, oneWay: Boolean, nodes: Seq[Long], name: String) =
      varF(1, wayId) ++ varF(2, rc) ++ varF(3, if (oneWay) 1 else 0) ++
        packedV(6, nodes) ++ strF(7, name)
    val m1 = strF(1, "g1") ++ subF(2,
      subF(1, ws(9001, 2, false, Seq(101, 102), "Main St")) ++
        subF(1, ws(9002, 2, false, Seq(102, 103), "Main St")))
    val m2 = strF(1, "g2") ++ subF(2, subF(1, ws(9003, 5, true, Seq(103, 104), "Side St")))
    Files.write(dir.resolve("12-100-200.metadata.8.pbf"), frame(m1, m2))

    // a corrupt tile: skipped whole, like the reference's try/catch
    Files.write(dir.resolve("12-100-201.geometry.8.pbf"),
      Array[Byte](0x7f, -1, -1, -1, -1, -1, 3, 9))
    // an intersection tile: no scan matches it (loadTiles skips the type)
    Files.write(dir.resolve("12-100-200.intersection.8.pbf"), frame(strF(1, "iA")))
    dir.toString
  }

  test("wire format: hand-pinned byte literal decodes exactly") {
    // field 1 = "g1" (0x0a len 2), field 6 = 2, field 7 = packed [1.5]
    // (1.5 = 0x3FF8000000000000, little-endian on the wire)
    val bytes = Array[Byte](0x0a, 0x02, 'g', '1', 0x30, 0x02,
      0x3a, 0x08, 0, 0, 0, 0, 0, 0, -8, 0x3f)
    val g = ShstTiles.parseGeometry("t",
      new ShstTiles.Reader(bytes, 0, bytes.length))
    assert(g.id == "g1" && g.roadClass == "Primary")
    assert(g.coordinates == Seq(Seq(1.5)))
  }

  test("geometry/reference/metadata tiles parse; corrupt tile skipped whole") {
    val geoms = ShstTiles.geometryTiles(spark, tilesDir).collect()
      .sortBy(_.id)
    assert(geoms.map(_.id).toSeq == Seq("g1", "g2"))
    val g1 = geoms(0)
    assert(g1.tile_id == "12-100-200" && g1.roadClass == "Primary")
    assert(g1.forwardReferenceId.contains("fwd1") &&
      g1.backReferenceId.contains("back1"))
    assert(g1.coordinates == Seq(Seq(-73.80, 42.70), Seq(-73.81, 42.71),
      Seq(-73.82, 42.72)))
    assert(geoms(1).backReferenceId.isEmpty)

    val refs = ShstTiles.referenceTiles(spark, tilesDir).collect().sortBy(_.id)
    assert(refs.map(_.id).toSeq == Seq("back1", "fwd1", "fwd2"))
    val fwd1 = refs(1)
    assert(fwd1.geometryId == "g1" && fwd1.formOfWay == "SingleCarriageway")
    assert(fwd1.locationReferences.map(_.intersectionId) == Seq("iA", "iB"))
    assert(fwd1.locationReferences.head.outboundBearing.contains(45))
    assert(fwd1.locationReferences.head.inboundBearing.isEmpty)
    assert(fwd1.locationReferences.head.distanceToNextRef.contains(283))
    assert(fwd1.locationReferences.head.lon == -73.80)

    val metas = ShstTiles.metadataTiles(spark, tilesDir).collect().sortBy(_.geometryId)
    assert(metas.map(_.geometryId).toSeq == Seq("g1", "g2"))
    assert(metas(0).waySections.map(_.wayId) == Seq("9001", "9002"))
    assert(metas(0).waySections.head.nodeIds == Seq("101", "102"))
    assert(metas(0).waySections.head.name == "Main St")
    assert(metas(1).waySections.head.oneWay)
  }

  test("referencesFromTiles: directed expansion with reversed back geometry") {
    val out = ShstTiles.referencesFromTiles(
      ShstTiles.geometryTiles(spark, tilesDir),
      ShstTiles.referenceTiles(spark, tilesDir),
      ShstTiles.metadataTiles(spark, tilesDir))
      .collect().map(r => r.shstReferenceId -> r).toMap
    assert(out.keySet == Set("fwd1", "back1", "fwd2"))
    val (f1, b1) = (out("fwd1"), out("back1"))
    assert(f1.isForward && !b1.isForward)
    assert(f1.coordinates == b1.coordinates.reverse)
    assert(f1.fromIntersectionId == "iA" && f1.toIntersectionId == "iB")
    assert(b1.fromIntersectionId == "iB" && b1.toIntersectionId == "iA")
    assert(!f1.oneWay && !b1.oneWay && out("fwd2").oneWay)
    assert(f1.waySections.map(_.wayId) == Seq("9001", "9002"))
    assert(f1.roadClass == "Primary" && out("fwd2").roadClass == "Residential")
  }

  test("referencesFromTiles: back reference reverses metadata section+node order") {
    val out = ShstTiles.referencesFromTiles(
      ShstTiles.geometryTiles(spark, tilesDir),
      ShstTiles.referenceTiles(spark, tilesDir),
      ShstTiles.metadataTiles(spark, tilesDir))
      .collect().map(r => r.shstReferenceId -> r).toMap
    val b1 = out("back1")
    assert(b1.waySections.map(_.wayId) == Seq("9002", "9001"))
    assert(b1.waySections.map(_.nodeIds) == Seq(Seq("103", "102"), Seq("102", "101")))
  }

  test("writeTileset → wire scans → referencesFromTiles equals the source network") {
    // the q51 loop: synth network → REAL tile files → the wire READER →
    // converter → directed expansion → synth-id decode; every field of every
    // reference must round-trip exactly (coordinates are fixed64 doubles on
    // the wire, so bit-exact)
    val synth = graft.operators.ConflationPipeline
      .references(spark, SmokeWorld.NRoads).collect().toSet
    val viaTiles = SmokeWorld.tileRefs(spark).collect().toSet
    assert(viaTiles.size == synth.size)
    val missing = synth -- viaTiles
    val extra = viaTiles -- synth
    assert(missing.isEmpty && extra.isEmpty,
      s"missing=${missing.take(2)} extra=${extra.take(2)}")
    // and the tileset on disk really is multi-file wire format
    val tiles = new java.io.File(s"${SmokeWorld.auxDir}/aux_shst_tiles")
      .listFiles().map(_.getName).filter(_.endsWith(".pbf"))
    assert(tiles.count(_.contains(".geometry.")) >= 1)
    assert(tiles.count(_.contains(".reference.")) >= 1)
    assert(tiles.count(_.contains(".metadata.")) >= 1)
  }

  test("convertTileset: parquet out + tile-id lineage ledger resumes exactly") {
    val out = Files.createTempDirectory("shstout").toString
    val first = ShstTiles.convertTileset(spark, tilesDir, out, "run1")
    assert(first == Map("geometry" -> 2L, "reference" -> 3L, "metadata" -> 2L))
    // re-run: every tile is ledgered → nothing recommits
    val again = ShstTiles.convertTileset(spark, tilesDir, out, "run2")
    assert(again.values.forall(_ == 0L), again)
    // a new tile arrives: only IT converts, existing rows untouched
    val extra = strF(1, "g9") ++ strF(2, "iX") ++ strF(3, "iY") ++
      strF(4, "fwd9") ++ varF(6, 0) ++ packedD(7, Seq(-73.9, 42.8, -73.91, 42.81))
    Files.write(Path.of(tilesDir).resolve("12-100-202.geometry.8.pbf"),
      frame(extra))
    val third = ShstTiles.convertTileset(spark, tilesDir, out, "run3")
    assert(third == Map("geometry" -> 1L, "reference" -> 0L, "metadata" -> 0L))
    val allGeom = spark.read.parquet(s"$out/geometry")
    assert(allGeom.count() == 3)
    assert(allGeom.select("tile_id").distinct().count() == 2)
  }

  test("writeTileset skips back-only geometry groups instead of flipping them") {
    import spark.implicits._
    // a group whose forward reference was filtered out upstream cannot be
    // exported faithfully (the back ref's coordinates are reversed relative
    // to the geometry's orientation) — it must be skipped, not silently
    // published with flipped orientation
    val backOnly = graft.operators.ConflationPipeline
      .references(spark, 40).filter(r => !r.isForward)
    assert(backOnly.count() > 0, "fixture needs at least one back reference")
    val dir = Files.createTempDirectory("tiles-backonly").toString
    val idEnc: String => Long = s => {
      val b = s.substring(1); val u = b.indexOf('_')
      (b.substring(0, u).toLong << 20) | b.substring(u + 1).toLong
    }
    val n = ShstTiles.writeTileset(backOnly, dir,
      wayIdEnc = idEnc, nodeIdEnc = idEnc)
    assert(n == 0)
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    assert(!files.exists(_.getName.endsWith(".pbf")), files.map(_.getName).toSeq)
  }
}

package graft

import graft.sources.{MbTiles, Mvt}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Clean-room Mapbox Vector Tile encoder: command/zigzag round-trip, layer
  * dictionary correctness, parity of the density layer with the q41 tile
  * aggregates, and the full tippecanoe-analog mbtiles export. */
class MvtSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val segments =
    graft.operators.ConflationPipeline.run(spark, 200, 20).cache()

  test("layer encoding round-trips features, tags, and line geometry") {
    val pts = Seq((100L, 200L), (150L, 180L), (90L, 300L))
    val lay = Mvt.layer("roads", Seq(
      Mvt.MvtFeature(1L, 2, {
        // MoveTo(100,200) + LineTo(150,180),(90,300)
        def zz(v: Long) = (v << 1) ^ (v >> 31)
        Seq((1L & 7) | (1L << 3), zz(100), zz(200),
          (2L & 7) | (2L << 3), zz(50), zz(-20), zz(-60), zz(120))
      }, Seq("name" -> "a", "rank" -> 3L, "len" -> 1.5, "oneway" -> true)),
      Mvt.MvtFeature(2L, 2, Seq((1L & 7) | (1L << 3), 0L, 0L),
        Seq("name" -> "a", "rank" -> 4L))))
    val decoded = Mvt.decode(Mvt.tile(Seq(lay)))
    assert(decoded.size == 1)
    val l = decoded.head
    assert(l.name == "roads" && l.extent == Mvt.Extent)
    assert(l.features.size == 2)
    val f1 = l.features.head
    assert(f1.id == 1L && f1.geomType == 2)
    assert(Mvt.decodeLine(f1.commands) == pts)
    assert(f1.tags("name") == "a" && f1.tags("rank") == 3L)
    assert(f1.tags("len") == 1.5 && f1.tags("oneway") == true)
    // dictionary sharing: "name"/"a" appear once in the layer tables; the
    // second feature references the same indices
    assert(l.features(1).tags("name") == "a")
  }

  test("renderTiles: tile set equals q41's, density layer carries its aggregates") {
    val zoom = 12
    val rendered = Mvt.renderTiles(segments, zoom).cache()
    val q41 = graft.operators.ConflationPipeline.tiles(segments, zoom).cache()
    val rKeys = rendered.select("tile_x", "tile_y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val qKeys = q41.select("tile_x", "tile_y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rKeys == qKeys && rKeys.nonEmpty)
    // pick one tile, decode, compare the density feature with q41's row
    val sample = q41.orderBy("tile_x", "tile_y").collect().head
    val (tx, ty) = (sample.getAs[Long]("tile_x"), sample.getAs[Long]("tile_y"))
    val blob = rendered.filter(col("tile_x") === tx && col("tile_y") === ty)
      .select("tile_data").collect().head.getAs[Array[Byte]](0)
    val gz = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(blob))
    val layers = Mvt.decode(gz.readAllBytes()).map(l => l.name -> l).toMap
    assert(layers.keySet == Set("segments", "density"))
    val density = layers("density").features.head.tags
    assert(density("n_segments") == sample.getAs[Long]("n_segments"))
    assert(density("match_density") == sample.getAs[Long]("match_density"))
    assert(math.abs(density("total_km").asInstanceOf[Double] -
      sample.getAs[Double]("total_km")) < 1e-9)
    // the segments layer has one line feature per gated segment in the tile
    assert(layers("segments").features.size == sample.getAs[Long]("n_segments"))
    assert(layers("segments").features.forall(_.geomType == 2))
    // geometry decodes to >= 2 vertices, near the tile's local grid
    val line = Mvt.decodeLine(layers("segments").features.head.commands)
    assert(line.size >= 2)
  }

  test("writeMbtiles: the tippecanoe-analog single-file vector-tile export") {
    val path = "target/mbtiles_mvt.mbtiles" // fixed: sqlite3 out-of-band check
    val n = Mvt.writeMbtiles(segments, zoom = 12, path)
    val q41n = graft.operators.ConflationPipeline.tiles(segments, 12).count()
    assert(n == q41n)
    val (meta, tiles) = MbTiles.read(path)
    assert(meta("format") == "pbf" && tiles.size == n)
    // every stored payload is a gzipped MVT tile with both layers
    val gz = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(tiles.head._4))
    val names = Mvt.decode(gz.readAllBytes()).map(_.name).toSet
    assert(names == Set("segments", "density"))
  }

  test("a single-point geometry is dropped, never encoded as a bare " +
      "MoveTo (invalid MVT LINESTRING)") {
    import spark.implicits._
    val onePoint = segments.limit(1)
      .withColumn("coordinates", slice(col("coordinates"), 1, 1))
      .as[graft.model.ConflationSegment]
    assert(Mvt.renderTiles(onePoint, zoom = 12).count() == 0L)
  }
}

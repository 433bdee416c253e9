package graft

import graft.sources.{ShstTiles, TileScraper}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** S6: the offline tile scraper — cover diff, file:// fetch, idempotence,
  * atomic publish, and the absent/failed status paths. */
class TileScraperSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def geomNames(dir: java.io.File): Set[String] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.endsWith(".geometry.8.pbf")).toSet

  test("coverTiles matches the tile-id math of the tileset writer") {
    import spark.implicits._
    val f = Seq(
      Tuple1(Array(Array(-73.8, 42.7), Array(-73.79, 42.71))),
      Tuple1(Array(Array(10.0, 10.0)))).toDF("geometry")
    val got = TileScraper.coverTiles(f).as[String].collect().toSet
    val want = Set(
      ShstTiles.tileIdFor(-73.8, 42.7, 12), ShstTiles.tileIdFor(-73.79, 42.71, 12),
      ShstTiles.tileIdFor(10.0, 10.0, 12))
    assert(got == want)
  }

  test("scrape fetches exactly the missing remote tiles, byte-identically") {
    val remote = Files.createTempDirectory("scrape-remote").toFile
    val dest = Files.createTempDirectory("scrape-dest").toFile
    val refs = graft.operators.ConflationPipeline.references(spark, 12)
    // synth ids are "w<r>_<g>" / "n<r>_<v>" — same injective encoding the
    // q51 fixture uses
    val enc: String => Long = s => {
      val b = s.substring(1); val u = b.indexOf('_')
      (b.substring(0, u).toLong << 20) | b.substring(u + 1).toLong
    }
    ShstTiles.writeTileset(refs, remote.getPath, wayIdEnc = enc, nodeIdEnc = enc)
    val remoteGeoms = geomNames(remote)
    assert(remoteGeoms.size > 2, s"fixture too small: $remoteGeoms")

    // seed one tile so the diff is non-trivial
    val seed = remoteGeoms.toSeq.sorted.head
    Files.copy(new java.io.File(remote, seed).toPath,
      new java.io.File(dest, seed).toPath)

    import spark.implicits._
    val cover = remoteGeoms.toSeq.sorted
      .map(_.stripSuffix(".geometry.8.pbf")).toDF("tile_id")
    val res = TileScraper.scrape(cover, s"file://${remote.getPath}",
      dest.getPath).collect()

    assert(res.forall(_.getString(1) == "fetched"))
    assert(res.map(_.getString(0)).toSet ==
      remoteGeoms.map(_.stripSuffix(".geometry.8.pbf")) - seed.stripSuffix(".geometry.8.pbf"))
    assert(geomNames(dest) == remoteGeoms)
    // fetched bytes identical to the remote files
    remoteGeoms.foreach { n =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(new java.io.File(remote, n).toPath),
        Files.readAllBytes(new java.io.File(dest, n).toPath)), n)
    }
    // no temp litter
    assert(Option(dest.listFiles()).get.forall(!_.getName.endsWith(".tmp")))

    // idempotent re-scrape: everything present, nothing re-downloaded
    val seedFile = new java.io.File(dest, seed)
    val mtimes = geomNames(dest).map(n => n -> new java.io.File(dest, n).lastModified()).toMap
    val again = TileScraper.scrape(cover, s"file://${remote.getPath}", dest.getPath)
      .collect()
    assert(again.isEmpty, "second scrape should see a complete listing")
    assert(geomNames(dest).forall(n => new java.io.File(dest, n).lastModified() == mtimes(n)))
    assert(seedFile.exists())
  }

  test("a covered tile with no remote file is reported absent, not written") {
    import spark.implicits._
    val remote = Files.createTempDirectory("scrape-remote2").toFile
    val dest = Files.createTempDirectory("scrape-dest2").toFile
    val res = TileScraper.scrape(Seq("12-1-1").toDF("tile_id"),
      s"file://${remote.getPath}", dest.getPath).collect()
    assert(res.length == 1 && res.head.getString(1) == "absent")
    assert(geomNames(dest).isEmpty)
  }

  test("http path: 200 fetch, 404 absent, and flaky-then-success retry") {
    import spark.implicits._
    val dest = Files.createTempDirectory("scrape-http").toFile
    val payload = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val hits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { exchange =>
      val name = exchange.getRequestURI.getPath.stripPrefix("/")
      val n = hits.merge(name, 1, (a, b) => a + b)
      name match {
        case "12-5-5.geometry.8.pbf" =>
          exchange.sendResponseHeaders(200, payload.length.toLong)
          exchange.getResponseBody.write(payload)
        case "12-6-6.geometry.8.pbf" if n < 3 => // flaky: 2 × 503, then 200
          exchange.sendResponseHeaders(503, -1)
        case "12-6-6.geometry.8.pbf" =>
          exchange.sendResponseHeaders(200, payload.length.toLong)
          exchange.getResponseBody.write(payload)
        case _ =>
          exchange.sendResponseHeaders(404, -1)
      }
      exchange.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val res = TileScraper.scrape(
        Seq("12-5-5", "12-6-6", "12-7-7").toDF("tile_id"), base, dest.getPath,
        maxAttempts = 3, fetchParallelism = 1)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(res == Map("12-5-5" -> "fetched", "12-6-6" -> "fetched",
        "12-7-7" -> "absent"))
      assert(hits.get("12-6-6.geometry.8.pbf") == 3, "two 503s then a 200")
      assert(java.util.Arrays.equals(payload, Files.readAllBytes(
        new java.io.File(dest, "12-5-5.geometry.8.pbf").toPath)))
      assert(java.util.Arrays.equals(payload, Files.readAllBytes(
        new java.io.File(dest, "12-6-6.geometry.8.pbf").toPath)))
      assert(!new java.io.File(dest, "12-7-7.geometry.8.pbf").exists())
    } finally server.stop(0)
  }

  test("transient IO errors retry then surface as failed, never silently") {
    import spark.implicits._
    val dest = Files.createTempDirectory("scrape-dest3").toFile
    // connection refused on a closed local port → IOException path
    val res = TileScraper.scrape(Seq("12-2-2").toDF("tile_id"),
      "http://127.0.0.1:1", dest.getPath, maxAttempts = 2).collect()
    assert(res.length == 1)
    assert(res.head.getString(1) == "failed")
    assert(res.head.getInt(2) == 2, "should have exhausted maxAttempts")
  }
}

package graft

import graft.sources.{MbTiles, Sqlite}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Clean-room SQLite/MBTiles container: writer↔reader round-trips covering
  * single-leaf, overflow-chain, and multi-level b-tree shapes. A sample file
  * also lands at target/mbtiles_sample.mbtiles for out-of-band validation
  * with the system sqlite3 module (tools/check_mbtiles.py). */
class MbTilesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpFile(name: String): String =
    Files.createTempDirectory("mbtiles").resolve(name).toString

  test("small mbtiles round-trips metadata, tiles, and the TMS row flip") {
    val path = tmpFile("small.mbtiles")
    val tiles = Seq(
      (12, 1205L, 1539L, "tile-a".getBytes("UTF-8")),
      (12, 1205L, 1540L, "tile-b".getBytes("UTF-8")),
      (13, 2410L, 3078L, "tile-c".getBytes("UTF-8")))
    MbTiles.write(path, Seq("name" -> "t", "format" -> "json"), tiles)
    val (meta, back) = MbTiles.read(path)
    assert(meta == Map("name" -> "t", "format" -> "json"))
    assert(back.map(t => (t._1, t._2, t._3)).toSet ==
      tiles.map(t => (t._1, t._2, t._3)).toSet)
    assert(back.find(_._3 == 1539L).get._4.sameElements("tile-a".getBytes("UTF-8")))
    // TMS on disk: the stored tile_row is flipped
    val r = new Sqlite.Reader(Files.readAllBytes(java.nio.file.Paths.get(path)))
    val stored = r.tableByName("tiles").map(row =>
      (row(0).asInstanceOf[Sqlite.VInt].v, row(2).asInstanceOf[Sqlite.VInt].v))
    assert(stored.contains((12L, (1L << 12) - 1 - 1539L)))
  }

  test("a tile blob larger than the page size round-trips via overflow chains") {
    val path = "target/mbtiles_overflow.mbtiles" // fixed: sqlite3 check too
    val big = Array.tabulate[Byte](20000)(i => (i * 31).toByte)
    MbTiles.write(path, Seq("name" -> "big"), Seq((5, 3L, 4L, big)))
    val (_, back) = MbTiles.read(path)
    assert(back.size == 1 && back.head._4.sameElements(big))
  }

  test("3000 tiles force multi-level table and index b-trees that round-trip") {
    val path = "target/mbtiles_multi.mbtiles" // fixed: sqlite3 check too
    val tiles = (0 until 3000).map { i =>
      (12, (i % 60).toLong, (i / 60).toLong,
        s"payload-$i-${"x" * (i % 40)}".getBytes("UTF-8"))
    }
    MbTiles.write(path, Seq("name" -> "multi"), tiles)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    val r = new Sqlite.Reader(bytes)
    // the tiles table really is multi-level (root is an interior page)
    val root = r.schema.find(s => s._1 == "table" && s._2 == "tiles").get._4
    assert(bytes((root - 1) * r.pageSize) == 0x05.toByte, "expected interior root")
    val (_, back) = MbTiles.read(path)
    assert(back.size == 3000)
    val byKey = back.map(t => (t._1, t._2, t._3) -> new String(t._4, "UTF-8")).toMap
    assert(byKey((12, 7L, 11L)) == s"payload-${11 * 60 + 7}-${"x" * ((11 * 60 + 7) % 40)}")
    // the unique index holds every key exactly once, in sorted order
    val idxRoot = r.schema.find(s => s._1 == "index" && s._2 == "tile_index").get._4
    val keys = r.indexKeys(idxRoot).map(k =>
      (k(0).asInstanceOf[Sqlite.VInt].v, k(1).asInstanceOf[Sqlite.VInt].v,
        k(2).asInstanceOf[Sqlite.VInt].v))
    assert(keys.size == 3000 && keys.distinct.size == 3000)
    assert(keys == keys.sorted)
  }

  test("writeFromTiles exports the q41 tile table; payload gunzips to the stats") {
    val segs = graft.operators.ConflationPipeline.run(spark, 200, 20)
    val tilesDf = graft.operators.ConflationPipeline.tiles(segs, zoom = 12).cache()
    val expected = tilesDf.count()
    val path = "target/mbtiles_sample.mbtiles" // fixed: out-of-band sqlite3 check
    val n = MbTiles.writeFromTiles(tilesDf, path)
    assert(n == expected && n > 0)
    val (meta, back) = MbTiles.read(path)
    assert(meta("format") == "json" && back.size == expected)
    // gunzip one payload and check it carries that tile's stats
    val first = tilesDf.orderBy("zoom", "tile_x", "tile_y").collect().head
    val payload = back.find(t =>
      t._2 == first.getAs[Long]("tile_x") && t._3 == first.getAs[Long]("tile_y")).get._4
    val gz = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(payload))
    val json = new String(gz.readAllBytes(), "UTF-8")
    assert(json.contains(s""""n_segments":${first.getAs[Long]("n_segments")}"""))
  }

  test("9-byte varints (rowids >= 2^56) round-trip — final byte carries 8 bits") {
    // the spec's 9-byte varint gives the LAST byte all 8 bits; nine 7-bit
    // groups would decode to a different number in any real sqlite3 reader
    for (base <- Seq((1L << 56) - 2, 1L << 56, (1L << 56) + 5, Long.MaxValue - 3)) {
      // addTable always numbers from 1, so drive tableBtree directly with an
      // explicit firstRowid and read the captured root back
      val w = new Sqlite.Writer(512)
      val root = w.tableBtree(
        (0 until 3).iterator.map(i => Seq(Sqlite.VText(s"row-$i"))), firstRowid = base)
      val path = tmpFile(s"varint9-$base.sqlite")
      w.writeTo(path)
      val r = new Sqlite.Reader(Files.readAllBytes(java.nio.file.Paths.get(path)))
      val rows = r.tableRows(root)
      assert(rows.map(_._1) == Seq(base, base + 1, base + 2))
      assert(rows.head._2 == Seq(Sqlite.VText("row-0")))
    }
  }

  test("no interior b-tree page is ever empty (close-at-last-separator edge)") {
    // sweep row counts across the boundary where the first interior level
    // overflows exactly at its last separator: pre-fix that produced a
    // zero-cell interior page (rightmost pointer only) in the final slot
    for (nRows <- 270 to 345) {
      val path = tmpFile(s"sweep-$nRows.sqlite")
      val w = new Sqlite.Writer(512)
      w.addTable("t", "CREATE TABLE t (v text)",
        (0 until nRows).iterator.map(i => Seq(Sqlite.VText(f"v-$i%04d-${"p" * 80}"))))
      w.writeTo(path)
      val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
      val r = new Sqlite.Reader(bytes)
      // payloads are < min-local so no overflow pages exist: every page past
      // page 1 is a b-tree page and its type byte is at offset 0
      for (p <- 2 to bytes.length / 512) {
        val base = (p - 1) * 512
        val t = bytes(base) & 0xff
        val ncells = ((bytes(base + 3) & 0xff) << 8) | (bytes(base + 4) & 0xff)
        if (t == 0x05 || t == 0x02)
          assert(ncells >= 1, s"empty interior page $p at nRows=$nRows")
      }
      val root = r.schema.find(s => s._1 == "table" && s._2 == "t").get._4
      val rows = r.tableRows(root)
      assert(rows.size == nRows && rows.map(_._1) == (1 to nRows).map(_.toLong))
    }
  }

  test("a sqlite_master catalog that outgrows page 1 fails loudly") {
    val w = new Sqlite.Writer(512)
    for (i <- 0 until 8)
      w.addTable(s"table_with_a_fairly_long_name_$i",
        s"CREATE TABLE table_with_a_fairly_long_name_$i (a text, b text, c integer)",
        Iterator.empty)
    val ex = intercept[IllegalArgumentException](w.writeTo(tmpFile("overflow1.sqlite")))
    assert(ex.getMessage.contains("overflows page 1"))
  }

  test("writer rejects page sizes it cannot encode directly") {
    // 65536 is spec-legal but encoded as the magic 1, and >32768 breaks the
    // reader's 2-byte cell pointers — constructor must refuse, not write a
    // file sqlite3 rejects
    intercept[IllegalArgumentException](new Sqlite.Writer(65536))
    intercept[IllegalArgumentException](new Sqlite.Writer(3000))
    new Sqlite.Writer(32768) // largest directly-encodable size is fine
  }

  test("record header length is self-consistent across the varint size " +
      "boundary (the +9 guess over-declared by one byte near 16383)") {
    // big-endian base-128; the 9-byte special case can't occur at these sizes
    def readVarint(b: Array[Byte], off: Int): (Long, Int) = {
      var v = 0L; var i = off
      while ((b(i) & 0x80) != 0) { v = (v << 7) | (b(i) & 0x7f); i += 1 }
      v = (v << 7) | (b(i) & 0x7f)
      (v, i - off + 1)
    }
    // n VText columns of 50 bytes each → stLen == n (one 1-byte serial
    // varint per column); sweep the 2→3-byte hl varint boundary
    val text = "x" * 50
    for (n <- 16370 to 16390) {
      val rec = Sqlite.record(Seq.fill(n)(Sqlite.VText(text)))
      val (hl, hlLen) = readVarint(rec, 0)
      // walk exactly the declared header: hlLen + n serial varints
      var off = hlLen
      var cols = 0
      while (off < hl) { val (_, l) = readVarint(rec, off); off += l; cols += 1 }
      assert(off == hl, s"n=$n: header walk landed at $off, declared $hl")
      assert(cols == n, s"n=$n: $cols serial types for $n columns")
      assert(rec.length == hl + n * 50L, s"n=$n: body size mismatch")
    }
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, functions => F}
import scala.collection.mutable.ArrayBuffer

/**
 * Clean-room minimal SQLite file writer/reader + the MBTiles container the
 * reference produces by shelling out to tippecanoe
 * (bin/data_transforming/createMBTilesFromGeoJSON:22-57). No SQLite library
 * exists in this sandbox, so the file format itself is implemented from the
 * PUBLIC spec (sqlite.org/fileformat2.html): 100-byte header, table/index
 * b-tree pages (0x0D/0x05/0x0A/0x02), record serial types, payload overflow
 * chains, sqlite_master schema rows. The writer builds bottom-up from
 * sorted row streams (leaves packed greedily, separators promoted level by
 * level), the reader walks any table/index b-tree back — the round-trip
 * spec grades the writer against the reader AND the file against the
 * system `python3 sqlite3` module out-of-band (tools/check_mbtiles.py).
 *
 * Scope note (COVERAGE.md): an `.mbtiles` file is a single SQLite database
 * — inherently a single-writer final-mile export, exactly like the
 * reference's tippecanoe step. The DATA path (zoom-gated tile density, S9/
 * q41) is fully distributed; this container serializes the already-
 * aggregated tile table (bounded by tile count, not input rows) through
 * `toLocalIterator`. Payload here is gzipped JSON tile stats; the
 * reference's tippecanoe emits gzipped MVT — the container is the same.
 */
object Sqlite {

  sealed trait V
  case object VNull extends V
  final case class VInt(v: Long) extends V
  final case class VReal(v: Double) extends V
  final case class VText(s: String) extends V
  final case class VBlob(b: Array[Byte]) extends V

  // ---- low-level encoding --------------------------------------------------

  /** SQLite varint: big-endian 7-bit groups, at most 9 bytes (non-negative
    * values only — lengths, rowids, serial types). In the 9-byte form the
    * spec gives the FINAL byte all 8 bits (not 7) — values ≥ 2⁵⁶ must use
    * it or a real sqlite3 reader decodes a different number. */
  def varint(v0: Long): Array[Byte] = {
    require(v0 >= 0, s"negative varint $v0")
    if (v0 < 0x80) Array(v0.toByte)
    else if (v0 >= (1L << 56)) {
      val out = new Array[Byte](9)
      out(8) = v0.toByte // low 8 bits, high bit NOT a continuation flag here
      var x = v0 >>> 8
      var i = 7
      while (i >= 0) { out(i) = ((x & 0x7f) | 0x80).toByte; x >>>= 7; i -= 1 }
      out
    } else {
      val groups = ArrayBuffer.empty[Byte]
      var x = v0
      while (x != 0) { groups += (x & 0x7f).toByte; x >>>= 7 }
      val out = groups.reverse.toArray
      var i = 0
      while (i < out.length - 1) { out(i) = (out(i) | 0x80).toByte; i += 1 }
      out
    }
  }

  private def be16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)
  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def beN(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >>> (8 * (n - 1 - i))) & 0xff).toByte).toArray

  private def intSerial(v: Long): (Long, Array[Byte]) =
    if (v >= -128 && v <= 127) (1L, beN(v, 1))
    else if (v >= -32768 && v <= 32767) (2L, beN(v, 2))
    else if (v >= -8388608 && v <= 8388607) (3L, beN(v, 3))
    else if (v >= Int.MinValue && v <= Int.MaxValue) (4L, beN(v, 4))
    else if (v >= -140737488355328L && v <= 140737488355327L) (5L, beN(v, 6))
    else (6L, beN(v, 8))

  /** Record format: header-length varint + serial-type varints + body. */
  def record(values: Seq[V]): Array[Byte] = {
    val parts = values.map {
      case VNull => (varint(0), Array.empty[Byte])
      case VInt(v) => val (st, b) = intSerial(v); (varint(st), b)
      case VReal(v) => (varint(7), beN(java.lang.Double.doubleToLongBits(v), 8))
      case VText(s) =>
        val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (varint(13L + 2L * b.length), b)
      case VBlob(b) => (varint(12L + 2L * b.length), b)
    }
    val stLen = parts.map(_._1.length).sum
    // the header length varint counts itself — iterate to the fixpoint:
    // guessing the varint width from (stLen + 9) over-declares by one
    // byte when stLen sits just below a varint size boundary (e.g.
    // 16375..16380), which would shift every decoded value
    var hl = stLen + 1
    while (hl != stLen + varint(hl.toLong).length)
      hl = stLen + varint(hl.toLong).length
    val out = new java.io.ByteArrayOutputStream()
    out.write(varint(hl.toLong))
    parts.foreach(p => out.write(p._1))
    parts.foreach(p => out.write(p._2))
    out.toByteArray
  }

  // ---- file writer ---------------------------------------------------------

  /**
   * Whole-file builder. Pages buffer in memory (an mbtiles export is
   * bounded by tile count; document at call sites), page numbers are
   * 1-based, page 1 is reserved for the schema.
   */
  final class Writer(val pageSize: Int = 4096) {
    // 65536 is legal SQLite but encoded as the magic value 1 at offset 16,
    // and pages >32768 break the reader's 2-byte big-endian cell pointers —
    // restrict to the directly-encodable power-of-two range instead of
    // writing a file real sqlite3 would reject
    require(pageSize >= 512 && pageSize <= 32768 &&
      Integer.bitCount(pageSize) == 1,
      s"pageSize must be a power of two in [512, 32768], got $pageSize")
    private val pages = ArrayBuffer[Array[Byte]](null) // slot 0 = page 1
    private val master = ArrayBuffer.empty[Seq[V]]     // sqlite_master rows
    private def usable: Int = pageSize                 // reserved space = 0

    private def alloc(bytes: Array[Byte]): Int = {
      require(bytes.length == pageSize)
      pages += bytes; pages.size
    }
    private def allocSlot(): Int = { pages += null; pages.size }
    private def fill(n: Int, bytes: Array[Byte]): Unit = {
      require(bytes.length == pageSize); pages(n - 1) = bytes
    }

    /** Assemble one b-tree page (cells already in key order). */
    private def page(pageType: Int, cells: Seq[Array[Byte]], rightMost: Int,
        isPage1: Boolean): Array[Byte] = {
      val buf = new Array[Byte](pageSize)
      val base = if (isPage1) 100 else 0
      val interior = pageType == 0x05 || pageType == 0x02
      val hdr = if (interior) 12 else 8
      var off = pageSize
      val ptrs = ArrayBuffer.empty[Int]
      cells.foreach { c => off -= c.length; System.arraycopy(c, 0, buf, off, c.length); ptrs += off }
      buf(base) = pageType.toByte
      System.arraycopy(be16(cells.size), 0, buf, base + 3, 2)
      System.arraycopy(be16(off & 0xffff), 0, buf, base + 5, 2)
      if (interior) System.arraycopy(be32(rightMost), 0, buf, base + 8, 4)
      var p = base + hdr
      ptrs.foreach { o => System.arraycopy(be16(o), 0, buf, p, 2); p += 2 }
      buf
    }

    /** Overflow chain for `data`; returns first overflow page number. */
    private def overflowChain(data: Array[Byte]): Int = {
      val cap = usable - 4
      val chunks = data.grouped(cap).toSeq
      var next = 0
      chunks.reverse.foreach { ch =>
        val b = new Array[Byte](pageSize)
        System.arraycopy(be32(next), 0, b, 0, 4)
        System.arraycopy(ch, 0, b, 4, ch.length)
        next = alloc(b)
      }
      next
    }

    /** Table-leaf cell with spec payload splitting (X = U-35). */
    private def tableLeafCell(rowid: Long, payload: Array[Byte]): Array[Byte] = {
      val u = usable
      val x = u - 35
      val p = payload.length
      if (p <= x) varint(p.toLong) ++ varint(rowid) ++ payload
      else {
        val m = ((u - 12) * 32) / 255 - 23
        val k = m + (p - m) % (u - 4)
        val local = if (k <= x) k else m
        val first = overflowChain(payload.drop(local))
        varint(p.toLong) ++ varint(rowid) ++ payload.take(local) ++ be32(first)
      }
    }

    /** Index cell payload splitting uses X = ((U-12)*64/255)-23. */
    private def indexCellBody(payload: Array[Byte]): Array[Byte] = {
      val u = usable
      val x = ((u - 12) * 64) / 255 - 23
      val p = payload.length
      if (p <= x) varint(p.toLong) ++ payload
      else {
        val m = ((u - 12) * 32) / 255 - 23
        val k = m + (p - m) % (u - 4)
        val local = if (k <= x) k else m
        val first = overflowChain(payload.drop(local))
        varint(p.toLong) ++ payload.take(local) ++ be32(first)
      }
    }

    /** Greedy leaf packing + bottom-up interior levels. `children` pairs
      * with `seps` (separator i between child i and i+1); the level loop
      * promotes the separator after each closed page. */
    private def buildUpper(leafType: Int, children0: Seq[Int],
        seps0: Seq[Array[Byte]], isPage1Root: Boolean): Int = {
      val interiorType = if (leafType == 0x0d) 0x05 else 0x02
      var children = children0
      var seps = seps0
      while (children.size > 1) {
        val newChildren = ArrayBuffer.empty[Int]
        val newSeps = ArrayBuffer.empty[Array[Byte]]
        val cells = ArrayBuffer.empty[Array[Byte]]
        var size = 12
        var i = 0
        while (i < children.size - 1) {
          val cell =
            if (interiorType == 0x05) be32(children(i)) ++ seps(i)
            else be32(children(i)) ++ indexCellBody(seps(i))
          if (size + 2 + cell.length > usable && cells.nonEmpty) {
            if (i == children.size - 2) {
              // closing on the LAST separator would leave this level's final
              // page with zero cells (rightmost pointer only) — split one
              // cell earlier instead so both pages stay non-empty. cells has
              // ≥ 2 entries here: any page fits at least two interior cells
              // (max local cell ≈ U/4 after index-payload splitting), so the
              // overflow can only fire with ≥ 2 already queued.
              cells.remove(cells.size - 1) // (children(i-1), seps(i-1)) cell
              newChildren += alloc(page(interiorType, cells.toSeq, children(i - 1), isPage1 = false))
              newSeps += seps(i - 1)
              cells.clear(); size = 12
              cells += cell; size += 2 + cell.length
            } else {
              // close this page: rightmost = children(i); promote seps(i)
              newChildren += alloc(page(interiorType, cells.toSeq, children(i), isPage1 = false))
              newSeps += seps(i)
              cells.clear(); size = 12
            }
          } else {
            cells += cell; size += 2 + cell.length
          }
          i += 1
        }
        newChildren += alloc(page(interiorType, cells.toSeq, children.last, isPage1 = false))
        children = newChildren.toSeq
        seps = newSeps.toSeq
      }
      children.head
    }

    /** Build a table b-tree from rows in rowid order; returns root page. */
    def tableBtree(rows: Iterator[Seq[V]], firstRowid: Long = 1L): Int = {
      val leaves = ArrayBuffer.empty[Int]
      val maxRowids = ArrayBuffer.empty[Long]
      val cells = ArrayBuffer.empty[Array[Byte]]
      var size = 8
      var rowid = firstRowid - 1
      var lastInLeaf = 0L
      rows.foreach { r =>
        rowid += 1
        val cell = tableLeafCell(rowid, record(r))
        if (size + 2 + cell.length > usable && cells.nonEmpty) {
          leaves += alloc(page(0x0d, cells.toSeq, 0, isPage1 = false))
          maxRowids += lastInLeaf
          cells.clear(); size = 8
        }
        cells += cell; size += 2 + cell.length
        lastInLeaf = rowid
      }
      leaves += alloc(page(0x0d, cells.toSeq, 0, isPage1 = false))
      maxRowids += lastInLeaf
      // table interior separators are the max rowid of each left child
      buildUpper(0x0d, leaves.toSeq, maxRowids.init.map(varint).toSeq,
        isPage1Root = false)
    }

    /** Build an index b-tree from KEY-SORTED records; a key lives exactly
      * once in the tree (B-tree, not B+), so leaf boundaries promote the
      * next key as the parent separator. Returns root page. */
    def indexBtree(keys: Iterator[Seq[V]]): Int = {
      val leaves = ArrayBuffer.empty[Int]
      val seps = ArrayBuffer.empty[Array[Byte]]
      val cells = ArrayBuffer.empty[Array[Byte]]
      var size = 8
      keys.foreach { k =>
        val payload = record(k)
        val cell = indexCellBody(payload)
        if (size + 2 + cell.length > usable && cells.nonEmpty) {
          leaves += alloc(page(0x0a, cells.toSeq, 0, isPage1 = false))
          cells.clear(); size = 8
          seps += payload // this key lives in the PARENT, not any leaf
        } else {
          cells += cell; size += 2 + cell.length
        }
      }
      leaves += alloc(page(0x0a, cells.toSeq, 0, isPage1 = false))
      buildUpper(0x0a, leaves.toSeq, seps.toSeq, isPage1Root = false)
    }

    def addTable(name: String, sql: String, rows: Iterator[Seq[V]]): Unit = {
      val root = tableBtree(rows)
      master += Seq(VText("table"), VText(name), VText(name), VInt(root), VText(sql))
    }

    def addIndex(name: String, table: String, sql: String,
        sortedKeys: Iterator[Seq[V]]): Unit = {
      val root = indexBtree(sortedKeys)
      master += Seq(VText("index"), VText(name), VText(table), VInt(root), VText(sql))
    }

    /** Assemble page 1 (header + sqlite_master leaf) and write the file. */
    def writeTo(path: String): Unit = {
      val cells = master.zipWithIndex.map { case (r, i) =>
        tableLeafCell(i + 1L, record(r))
      }
      // page 1 is a single leaf (no interior level for the schema table);
      // fail loudly if the catalog outgrows it rather than write a file
      // whose cell content area overlaps the pointer array
      val need = 100 + 8 + cells.map(_.length + 2).sum
      require(need <= pageSize,
        s"sqlite_master (${master.size} rows, $need bytes incl. header) " +
          s"overflows page 1 at pageSize $pageSize — use fewer/shorter " +
          "schema entries or a larger pageSize")
      val p1 = page(0x0d, cells.toSeq, 0, isPage1 = true)
      val h = java.nio.ByteBuffer.wrap(p1)
      h.put("SQLite format 3\u0000".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      h.putShort(pageSize.toShort)  // 16: page size
      h.put(1.toByte).put(1.toByte) // 18,19: write/read format legacy
      h.put(0.toByte)               // 20: reserved per page
      h.put(64.toByte).put(32.toByte).put(32.toByte) // 21-23: payload fractions
      h.putInt(1)                   // 24: change counter
      h.putInt(pages.size)          // 28: database size in pages
      h.putInt(0).putInt(0)         // 32,36: freelist trunk/count
      h.putInt(1)                   // 40: schema cookie
      h.putInt(1)                   // 44: schema format 1
      h.putInt(0)                   // 48: default page cache
      h.putInt(0)                   // 52: largest root (non-vacuum: 0)
      h.putInt(1)                   // 56: text encoding UTF-8
      h.putInt(0)                   // 60: user version
      h.putInt(0)                   // 64: incremental vacuum off
      h.putInt(0)                   // 68: application id
      h.position(92)
      h.putInt(1)                   // 92: version-valid-for == change counter
      h.putInt(3045000)             // 96: sqlite version number
      fill(1, p1)
      val out = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(path))
      try pages.foreach(out.write) finally out.close()
    }
  }

  // ---- file reader (round-trip verification / tile tooling) ---------------

  final class Reader(bytes: Array[Byte]) {
    val pageSize: Int = ((bytes(16) & 0xff) << 8) | (bytes(17) & 0xff)
    private def pageAt(n: Int): Int = (n - 1) * pageSize

    private def rdVarint(b: Array[Byte], off0: Int): (Long, Int) = {
      var off = off0
      var out = 0L
      var i = 0
      while (i < 8) {
        val c = b(off) & 0xff; off += 1
        if (c < 0x80) return (out << 7 | c, off)
        out = out << 7 | (c & 0x7f)
        i += 1
      }
      (out << 8 | (b(off) & 0xff), off + 1)
    }
    private def beInt(off: Int, n: Int): Long = {
      var v = 0L
      (0 until n).foreach(i => v = (v << 8) | (bytes(off + i) & 0xff))
      // sign-extend
      if (n < 8 && (v & (1L << (8 * n - 1))) != 0) v - (1L << (8 * n)) else v
    }

    def decodeRecord(rec: Array[Byte]): Seq[V] = {
      val (hl, afterHl) = rdVarint(rec, 0)
      val types = ArrayBuffer.empty[Long]
      var off = afterHl
      while (off < hl) { val (t, o) = rdVarint(rec, off); types += t; off = o }
      var body = hl.toInt
      types.map { t =>
        def take(n: Int): Array[Byte] = {
          val a = java.util.Arrays.copyOfRange(rec, body, body + n); body += n; a
        }
        t match {
          case 0 => VNull
          case n @ (1L | 2L | 3L | 4L) =>
            val a = take(n.toInt); var v = 0L
            a.foreach(b => v = (v << 8) | (b & 0xff))
            val bits = 8 * n.toInt
            VInt(if ((v & (1L << (bits - 1))) != 0) v - (1L << bits) else v)
          case 5 => val a = take(6); var v = 0L; a.foreach(b => v = (v << 8) | (b & 0xff))
            VInt(if ((v & (1L << 47)) != 0) v - (1L << 48) else v)
          case 6 => val a = take(8); var v = 0L; a.foreach(b => v = (v << 8) | (b & 0xff)); VInt(v)
          case 7 => val a = take(8); var v = 0L; a.foreach(b => v = (v << 8) | (b & 0xff))
            VReal(java.lang.Double.longBitsToDouble(v))
          case 8 => VInt(0)
          case 9 => VInt(1)
          case n if n >= 13 && n % 2 == 1 =>
            VText(new String(take(((n - 13) / 2).toInt), java.nio.charset.StandardCharsets.UTF_8))
          case n if n >= 12 =>
            VBlob(take(((n - 12) / 2).toInt))
        }
      }.toSeq
    }

    /** Reassemble a payload that may spill into an overflow chain. */
    private def payload(cellOff: Int, afterLen: Int, p: Long, x: Int): Array[Byte] = {
      val u = pageSize
      if (p <= x) java.util.Arrays.copyOfRange(bytes, afterLen, afterLen + p.toInt)
      else {
        val m = ((u - 12) * 32) / 255 - 23
        val k = m + (p - m) % (u - 4)
        val local = if (k <= x) k.toInt else m
        val out = new java.io.ByteArrayOutputStream()
        out.write(bytes, afterLen, local)
        var next = beInt(afterLen + local, 4).toInt
        var remaining = p.toInt - local
        while (next != 0 && remaining > 0) {
          val base = pageAt(next)
          val take = math.min(remaining, u - 4)
          out.write(bytes, base + 4, take)
          remaining -= take
          next = beInt(base, 4).toInt
        }
        out.toByteArray
      }
    }

    /** Walk a table b-tree: (rowid, record) per row, rowid order. */
    def tableRows(root: Int): Seq[(Long, Seq[V])] = {
      val out = ArrayBuffer.empty[(Long, Seq[V])]
      def walk(n: Int): Unit = {
        val base = pageAt(n)
        val hdrBase = if (n == 1) base + 100 else base
        val ptype = bytes(hdrBase) & 0xff
        val ncells = beInt(hdrBase + 3, 2).toInt
        val ptrArray = hdrBase + (if (ptype == 0x05) 12 else 8)
        ptype match {
          case 0x05 =>
            (0 until ncells).foreach { i =>
              val cell = base + beInt(ptrArray + 2 * i, 2).toInt
              walk(beInt(cell, 4).toInt)
            }
            walk(beInt(hdrBase + 8, 4).toInt)
          case 0x0d =>
            (0 until ncells).foreach { i =>
              val cell = base + beInt(ptrArray + 2 * i, 2).toInt
              val (p, o1) = rdVarint(bytes, cell)
              val (rowid, o2) = rdVarint(bytes, o1)
              out += (rowid -> decodeRecord(payload(cell, o2, p, pageSize - 35)))
            }
          case t => throw new IllegalStateException(s"page $n type $t in table walk")
        }
      }
      walk(root)
      out.toSeq
    }

    /** Walk an index b-tree: every key record, in key order. */
    def indexKeys(root: Int): Seq[Seq[V]] = {
      val x = ((pageSize - 12) * 64) / 255 - 23
      val out = ArrayBuffer.empty[Seq[V]]
      def walk(n: Int): Unit = {
        val base = pageAt(n)
        val ptype = bytes(base) & 0xff
        val ncells = beInt(base + 3, 2).toInt
        val ptrArray = base + (if (ptype == 0x02) 12 else 8)
        ptype match {
          case 0x02 =>
            (0 until ncells).foreach { i =>
              val cell = base + beInt(ptrArray + 2 * i, 2).toInt
              walk(beInt(cell, 4).toInt)
              val (p, o1) = rdVarint(bytes, cell + 4)
              out += decodeRecord(payload(cell, o1, p, x))
            }
            walk(beInt(base + 8, 4).toInt)
          case 0x0a =>
            (0 until ncells).foreach { i =>
              val cell = base + beInt(ptrArray + 2 * i, 2).toInt
              val (p, o1) = rdVarint(bytes, cell)
              out += decodeRecord(payload(cell, o1, p, x))
            }
          case t => throw new IllegalStateException(s"page $n type $t in index walk")
        }
      }
      walk(root)
      out.toSeq
    }

    /** sqlite_master rows: (type, name, tbl_name, rootpage, sql). */
    def schema: Seq[(String, String, String, Int, String)] =
      tableRows(1).map(_._2).map { r =>
        (r(0).asInstanceOf[VText].s, r(1).asInstanceOf[VText].s,
          r(2).asInstanceOf[VText].s, r(3).asInstanceOf[VInt].v.toInt,
          r(4).asInstanceOf[VText].s)
      }

    def tableByName(name: String): Seq[Seq[V]] = {
      val root = schema.find(s => s._1 == "table" && s._2 == name)
        .getOrElse(throw new NoSuchElementException(name))._4
      tableRows(root).map(_._2)
    }
  }
}

/** The MBTiles container over [[Sqlite]]: `metadata` + `tiles` tables and
  * the spec's unique (zoom_level, tile_column, tile_row) index, with XYZ→TMS
  * row flipping on write. */
object MbTiles {
  import Sqlite._

  /** Write rows (zoom, xyzX, xyzY, data) as an mbtiles file. Rows are
    * sorted and TMS-flipped here; tile payload bytes pass through opaque. */
  def write(path: String, metadata: Seq[(String, String)],
      tiles: Seq[(Int, Long, Long, Array[Byte])], pageSize: Int = 4096): Unit = {
    val w = new Writer(pageSize)
    w.addTable("metadata", "CREATE TABLE metadata (name text, value text)",
      metadata.iterator.map { case (k, v) => Seq(VText(k), VText(v)) })
    val tms = tiles.map { case (z, x, y, data) =>
      (z, x, (1L << z) - 1 - y, data)
    }.sortBy(t => (t._1, t._2, t._3))
    w.addTable("tiles",
      "CREATE TABLE tiles (zoom_level integer, tile_column integer, " +
        "tile_row integer, tile_data blob)",
      tms.iterator.map { case (z, x, row, data) =>
        Seq(VInt(z.toLong), VInt(x), VInt(row), VBlob(data)) })
    w.addIndex("tile_index", "tiles",
      "CREATE UNIQUE INDEX tile_index ON tiles (zoom_level, tile_column, tile_row)",
      tms.iterator.zipWithIndex.map { case ((z, x, row, _), i) =>
        Seq(VInt(z.toLong), VInt(x), VInt(row), VInt(i + 1L)) })
    w.writeTo(path)
  }

  /**
   * Final-mile export of the distributed tile table (q41's S9 output:
   * zoom, tile_x, tile_y, n_segments, total_km, match_density). The tile
   * payload is gzipped JSON of the per-tile stats (the reference's
   * tippecanoe writes gzipped MVT — same container, documented divergence
   * on payload encoding). Streams through toLocalIterator: driver memory is
   * bounded by the AGGREGATED tile count, never input rows.
   */
  def writeFromTiles(tilesDf: DataFrame, path: String,
      metadata: Seq[(String, String)] = Seq(
        "name" -> "graft-conflation", "format" -> "json",
        "type" -> "overlay", "version" -> "1")): Long = {
    import org.apache.spark.sql.Row
    // no cluster-side orderBy: write() re-sorts driver-side after the TMS
    // y-flip anyway, so a distributed range-partition+sort is pure waste
    val ordered = tilesDf
      .select(F.col("zoom").cast("int"), F.col("tile_x").cast("long"),
        F.col("tile_y").cast("long"), F.col("n_segments").cast("long"),
        F.col("total_km").cast("double"), F.col("match_density").cast("long"))
    val rows = ArrayBuffer.empty[(Int, Long, Long, Array[Byte])]
    val it = ordered.toLocalIterator()
    while (it.hasNext) {
      val r: Row = it.next()
      // Locale.ROOT: the f-interpolator uses the JVM default locale, and a
      // comma-decimal locale would render total_km as invalid JSON
      val totalKm = String.format(java.util.Locale.ROOT, "%.6f",
        Double.box(r.getDouble(4)))
      val json = s"""{"n_segments":${r.getLong(3)},"total_km":$totalKm,""" +
        s""""match_density":${r.getLong(5)}}"""
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8)); gz.close()
      rows += ((r.getInt(0), r.getLong(1), r.getLong(2), bos.toByteArray))
    }
    write(path, metadata, rows.toSeq)
    rows.size.toLong
  }

  /** Read back (metadata, tiles in XYZ orientation) with the clean-room
    * reader — the spec's round-trip counterpart. */
  def read(path: String): (Map[String, String], Seq[(Int, Long, Long, Array[Byte])]) = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val r = new Reader(bytes)
    val meta = r.tableByName("metadata").map { row =>
      row(0).asInstanceOf[VText].s -> row(1).asInstanceOf[VText].s
    }.toMap
    val tiles = r.tableByName("tiles").map { row =>
      val z = row(0).asInstanceOf[VInt].v.toInt
      val x = row(1).asInstanceOf[VInt].v
      val tmsRow = row(2).asInstanceOf[VInt].v
      (z, x, (1L << z) - 1 - tmsRow, row(3).asInstanceOf[VBlob].b)
    }
    (meta, tiles)
  }
}

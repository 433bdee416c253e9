package graft.sources

import graft.model.{ShstReference, WaySection}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * S2: SharedStreets PBF tileset → parquet converter (clean-room).
 *
 * The reference ingests planet tiles with the sharedstreets-pbf npm parsers
 * (src/loaders/shst/loadTiles:38-94): a tile file is a stream of
 * varint-length-delimited protobuf messages, one of three row types by file
 * name — `<z>-<x>-<y>.geometry.<level>.pbf`, `.reference.`, `.metadata.`
 * (intersection tiles are skipped, loadTiles:73-76). This reader implements
 * the protobuf WIRE FORMAT (public encoding spec: varints, 64-bit doubles,
 * length-delimited fields) directly against the public sharedstreets-types
 * schema — no protobuf dependency, no generated code — and parses each tile
 * file inside a `binaryFile`-scan flatMap, so a planet tileset converts as
 * one embarrassingly-parallel Spark job whose unit of work (and of lineage
 * resume, matching the reference's shst_loaded_tiles ledger) is the tile.
 *
 * Field numbers (sharedstreets-types, public):
 *   SharedStreetsGeometry:  1 id, 2 fromIntersectionId, 3 toIntersectionId,
 *     4 forwardReferenceId, 5 backReferenceId, 6 roadClass (enum),
 *     7 lonlats (packed double, lon/lat interleaved)
 *   SharedStreetsReference: 1 id, 2 geometryId, 3 formOfWay (enum),
 *     4 locationReferences (repeated LocationReference)
 *   LocationReference: 1 intersectionId, 2 lon (double), 3 lat (double),
 *     4 inboundBearing, 5 outboundBearing, 6 distanceToNextRef
 *   SharedStreetsMetadata:  1 geometryId, 2 osmMetadata (OSMMetadata)
 *   OSMMetadata: 1 waySections (repeated WaySection), 2 name
 *   WaySection: 1 wayId, 2 roadClass (enum), 3 oneWay, 4 roundabout,
 *     5 link, 6 nodeIds (repeated uint64), 7 name
 */
object ShstTiles {

  // ---- minimal protobuf wire reader --------------------------------------

  /** Cursor over one message's byte range. Throws on malformed input; the
    * per-file parser catches and skips the FILE (the reference's loadTiles
    * does the same, :86-89). */
  final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasRemaining: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0
      var out = 0L
      while (shift < 64) {
        val b = buf(pos); pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      throw new IllegalArgumentException("varint longer than 64 bits")
    }
    def readTag(): (Int, Int) = {
      val k = readVarint()
      ((k >>> 3).toInt, (k & 7L).toInt)
    }
    def readDoubleLE(): Double = {
      var bits = 0L
      var i = 0
      while (i < 8) { bits |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      java.lang.Double.longBitsToDouble(bits)
    }
    /** Length-delimited payload as a sub-reader (zero-copy). */
    def sub(): Reader = {
      val len = readVarint().toInt
      require(len >= 0 && pos + len <= end, s"bad length $len at $pos")
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }
    def readString(): String = {
      val s = sub()
      new String(buf, s.pos, s.end - s.pos, java.nio.charset.StandardCharsets.UTF_8)
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 => sub()
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  /** The tile framing: a stream of varint-length-delimited messages. */
  def delimited(bytes: Array[Byte]): Iterator[Reader] = new Iterator[Reader] {
    private val r = new Reader(bytes, 0, bytes.length)
    def hasNext: Boolean = r.hasRemaining
    def next(): Reader = r.sub()
  }

  /** Public sharedstreets-types RoadClass enum order — the same names the
    * synthetic network and the networklevel ranking use. */
  val RoadClasses: IndexedSeq[String] = IndexedSeq(
    "Motorway", "Trunk", "Primary", "Secondary", "Tertiary",
    "Residential", "Unclassified", "Service", "Other")
  private def roadClassName(i: Int): String =
    if (i >= 0 && i < RoadClasses.length) RoadClasses(i) else "Other"

  val FormsOfWay: IndexedSeq[String] = IndexedSeq(
    "Undefined", "Motorway", "MultipleCarriageway", "SingleCarriageway",
    "Roundabout", "TrafficSquare", "SlipRoad", "Other")
  private def formOfWayName(i: Int): String =
    if (i >= 0 && i < FormsOfWay.length) FormsOfWay(i) else "Other"

  // ---- tile row models ----------------------------------------------------

  case class GeometryRow(tile_id: String, id: String,
      fromIntersectionId: String, toIntersectionId: String,
      forwardReferenceId: Option[String], backReferenceId: Option[String],
      roadClass: String, coordinates: Seq[Seq[Double]])

  case class LocationRef(intersectionId: String, lon: Double, lat: Double,
      inboundBearing: Option[Int], outboundBearing: Option[Int],
      distanceToNextRef: Option[Int])

  case class ReferenceRow(tile_id: String, id: String, geometryId: String,
      formOfWay: String, locationReferences: Seq[LocationRef])

  case class MetadataRow(tile_id: String, geometryId: String,
      waySections: Seq[WaySection])

  // ---- message parsers ----------------------------------------------------

  def parseGeometry(tileId: String, r: Reader): GeometryRow = {
    var id: String = null; var from: String = null; var to: String = null
    var fwd: Option[String] = None; var back: Option[String] = None
    var rc = RoadClasses.length - 1
    val lonlats = scala.collection.mutable.ArrayBuffer.empty[Double]
    while (r.hasRemaining) {
      val (tag, wire) = r.readTag()
      (tag, wire) match {
        case (1, 2) => id = r.readString()
        case (2, 2) => from = r.readString()
        case (3, 2) => to = r.readString()
        case (4, 2) => fwd = Some(r.readString()).filter(_.nonEmpty)
        case (5, 2) => back = Some(r.readString()).filter(_.nonEmpty)
        case (6, 0) => rc = r.readVarint().toInt
        case (7, 2) => val s = r.sub(); while (s.hasRemaining) lonlats += s.readDoubleLE()
        case (7, 1) => lonlats += r.readDoubleLE() // non-packed encoder
        case (_, w) => r.skip(w)
      }
    }
    GeometryRow(tileId, id, from, to, fwd, back, roadClassName(rc),
      lonlats.grouped(2).map(_.toSeq).toSeq)
  }

  private def parseLocationRef(r: Reader): LocationRef = {
    var iid: String = null; var lon = 0.0; var lat = 0.0
    var in: Option[Int] = None; var out: Option[Int] = None
    var dist: Option[Int] = None
    while (r.hasRemaining) {
      val (tag, wire) = r.readTag()
      (tag, wire) match {
        case (1, 2) => iid = r.readString()
        case (2, 1) => lon = r.readDoubleLE()
        case (3, 1) => lat = r.readDoubleLE()
        case (4, 0) => in = Some(r.readVarint().toInt)
        case (5, 0) => out = Some(r.readVarint().toInt)
        case (6, 0) => dist = Some(r.readVarint().toInt)
        case (_, w) => r.skip(w)
      }
    }
    LocationRef(iid, lon, lat, in, out, dist)
  }

  def parseReference(tileId: String, r: Reader): ReferenceRow = {
    var id: String = null; var gid: String = null
    var fow = 0
    val lrs = scala.collection.mutable.ArrayBuffer.empty[LocationRef]
    while (r.hasRemaining) {
      val (tag, wire) = r.readTag()
      (tag, wire) match {
        case (1, 2) => id = r.readString()
        case (2, 2) => gid = r.readString()
        case (3, 0) => fow = r.readVarint().toInt
        case (4, 2) => lrs += parseLocationRef(r.sub())
        case (_, w) => r.skip(w)
      }
    }
    ReferenceRow(tileId, id, gid, formOfWayName(fow), lrs.toSeq)
  }

  private def parseWaySection(r: Reader): WaySection = {
    var wayId = 0L; var rc = RoadClasses.length - 1
    var oneWay = false; var roundabout = false; var link = false
    var name = ""
    val nodes = scala.collection.mutable.ArrayBuffer.empty[String]
    while (r.hasRemaining) {
      val (tag, wire) = r.readTag()
      (tag, wire) match {
        case (1, 0) => wayId = r.readVarint()
        case (2, 0) => rc = r.readVarint().toInt
        case (3, 0) => oneWay = r.readVarint() != 0
        case (4, 0) => roundabout = r.readVarint() != 0
        case (5, 0) => link = r.readVarint() != 0
        case (6, 0) => nodes += r.readVarint().toString
        case (6, 2) => val s = r.sub(); while (s.hasRemaining) nodes += s.readVarint().toString
        case (7, 2) => name = r.readString()
        case (_, w) => r.skip(w)
      }
    }
    WaySection(wayId.toString, nodes.toSeq, roadClassName(rc),
      oneWay, roundabout, link, name)
  }

  def parseMetadata(tileId: String, r: Reader): MetadataRow = {
    var gid: String = null
    val ws = scala.collection.mutable.ArrayBuffer.empty[WaySection]
    while (r.hasRemaining) {
      val (tag, wire) = r.readTag()
      (tag, wire) match {
        case (1, 2) => gid = r.readString()
        case (2, 2) =>
          val osm = r.sub()
          while (osm.hasRemaining) {
            val (t2, w2) = osm.readTag()
            if (t2 == 1 && w2 == 2) ws += parseWaySection(osm.sub())
            else osm.skip(w2)
          }
        case (_, w) => r.skip(w)
      }
    }
    MetadataRow(tileId, gid, ws.toSeq)
  }

  // ---- Spark scans ---------------------------------------------------------

  /** `12-1230-1534.metadata.8.pbf` → `12-1230-1534` (loadTiles:41-42). */
  def tileIdOf(path: String): String =
    path.substring(path.lastIndexOf('/') + 1).replaceAll("\\..*", "")

  private def scan[T: org.apache.spark.sql.Encoder](spark: SparkSession,
      glob: String)(parse: (String, Reader) => T): Dataset[T] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val tid = tileIdOf(path)
        // malformed file → skipped whole, like loadTiles:86-89
        try delimited(bytes).map(parse(tid, _)).toVector
        catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException =>
          Vector.empty }
      }
  }

  def geometryTiles(spark: SparkSession, dir: String): Dataset[GeometryRow] = {
    import spark.implicits._
    scan(spark, s"$dir/*.geometry.*.pbf")(parseGeometry)
  }

  def referenceTiles(spark: SparkSession, dir: String): Dataset[ReferenceRow] = {
    import spark.implicits._
    scan(spark, s"$dir/*.reference.*.pbf")(parseReference)
  }

  def metadataTiles(spark: SparkSession, dir: String): Dataset[MetadataRow] = {
    import spark.implicits._
    scan(spark, s"$dir/*.metadata.*.pbf")(parseMetadata)
  }

  /**
   * One-shot tileset → parquet conversion with the S2 resume ledger: each
   * row type commits through [[graft.operators.Lineage]] keyed by tile id —
   * the Spark analog of the reference's shst_loaded_tiles skip set
   * (loadTiles:40,58-68): a re-run after a crash converts only tiles whose
   * ledger row is missing, idempotently.
   */
  def convertTileset(spark: SparkSession, tilesDir: String, outDir: String,
      runId: String = "convert"): Map[String, Long] = {
    import graft.operators.Lineage
    def step(df: DataFrame, name: String): Long =
      Lineage.runIncremental(df, "tile_id", s"$outDir/$name",
        s"$outDir/ledger_$name", s"${runId}_$name")(identity)
    Map(
      "geometry" -> step(geometryTiles(spark, tilesDir).toDF(), "geometry"),
      "reference" -> step(referenceTiles(spark, tilesDir).toDF(), "reference"),
      "metadata" -> step(metadataTiles(spark, tilesDir).toDF(), "metadata"))
  }

  /**
   * G1 over REAL tiles: the directed [[ShstReference]] rows from a
   * converted tileset — forward references carry the geometry's
   * coordinates, back references the reversed coordinates
   * (ShStReferenceFeatureIterator.js:64-144); oneWay ⇔ the geometry has no
   * back reference; OSM way sections attach from the metadata tile.
   */
  def referencesFromTiles(geoms: Dataset[GeometryRow],
      refs: Dataset[ReferenceRow], metas: Dataset[MetadataRow]): Dataset[ShstReference] = {
    val spark = geoms.sparkSession
    import spark.implicits._
    val g = geoms.toDF().select(col("id").as("geometryId"),
      col("fromIntersectionId"), col("toIntersectionId"),
      col("forwardReferenceId"), col("backReferenceId"),
      col("roadClass"), col("coordinates"))
    val m = metas.toDF().select(col("geometryId"), col("waySections"))
    refs.toDF().select(col("id").as("shstReferenceId"), col("geometryId"))
      .join(g, Seq("geometryId"))
      .join(m, Seq("geometryId"), "left")
      // <=> not ===: a malformed tile with no forwardReferenceId must yield
      // false (back side), not a null that NPEs the Boolean encoder field
      .withColumn("isForward", col("shstReferenceId") <=> col("forwardReferenceId"))
      .select(col("shstReferenceId"), col("geometryId"),
        when(col("isForward"), col("fromIntersectionId"))
          .otherwise(col("toIntersectionId")).as("fromIntersectionId"),
        when(col("isForward"), col("toIntersectionId"))
          .otherwise(col("fromIntersectionId")).as("toIntersectionId"),
        col("isForward"),
        col("roadClass"),
        col("backReferenceId").isNull.as("oneWay"),
        when(col("isForward"), col("coordinates"))
          .otherwise(reverse(col("coordinates"))).as("coordinates"),
        {
          // back references traverse the OSM metadata in reverse too:
          // section order AND each section's node order flip, exactly like
          // the coordinates (the iterator's back-side expansion,
          // ShStReferenceFeatureIterator.js:64-144)
          val ws = coalesce(col("waySections"), array().cast(
            "array<struct<wayId:string,nodeIds:array<string>,roadClass:string," +
              "oneWay:boolean,roundabout:boolean,link:boolean,name:string>>"))
          when(col("isForward"), ws)
            .otherwise(reverse(transform(ws, s => struct(
              s.getField("wayId").as("wayId"),
              reverse(s.getField("nodeIds")).as("nodeIds"),
              s.getField("roadClass").as("roadClass"),
              s.getField("oneWay").as("oneWay"),
              s.getField("roundabout").as("roundabout"),
              s.getField("link").as("link"),
              s.getField("name").as("name")))))
            .as("waySections")
        })
      .as[ShstReference]
  }

  // ---- tileset encoder ------------------------------------------------------

  private def roadClassCode(name: String): Int = {
    val i = RoadClasses.indexOf(name)
    if (i >= 0) i else RoadClasses.length - 1
  }

  private[sources] def encGeometry(id: String, from: String, to: String,
      fwdId: String, backId: Option[String], rcCode: Int,
      coords: Seq[Seq[Double]]): Array[Byte] = {
    val w = new OsmPbf.Writer
    w.strField(1, id).strField(2, from).strField(3, to).strField(4, fwdId)
    backId.foreach(w.strField(5, _))
    w.varField(6, rcCode.toLong)
    w.packed(7)(pw => coords.foreach(c => { pw.rawDoubleLE(c(0)); pw.rawDoubleLE(c(1)) }))
    w.bytes
  }

  private[sources] def encReference(id: String, gid: String, fow: Int,
      lrs: Seq[LocationRef]): Array[Byte] = {
    val w = new OsmPbf.Writer
    w.strField(1, id).strField(2, gid).varField(3, fow.toLong)
    lrs.foreach { l =>
      val lw = new OsmPbf.Writer
      lw.strField(1, l.intersectionId).doubleField(2, l.lon).doubleField(3, l.lat)
      l.inboundBearing.foreach(v => lw.varField(4, v.toLong))
      l.outboundBearing.foreach(v => lw.varField(5, v.toLong))
      l.distanceToNextRef.foreach(v => lw.varField(6, v.toLong))
      w.lenField(4, lw.bytes)
    }
    w.bytes
  }

  private[sources] def encMetadata(gid: String, sections: Seq[WaySection],
      wayIdEnc: String => Long, nodeIdEnc: String => Long): Array[Byte] = {
    val osm = new OsmPbf.Writer
    sections.foreach { ws =>
      val sw = new OsmPbf.Writer
      sw.varField(1, wayIdEnc(ws.wayId)).varField(2, roadClassCode(ws.roadClass).toLong)
      sw.varField(3, if (ws.oneWay) 1L else 0L)
      sw.varField(4, if (ws.roundabout) 1L else 0L)
      sw.varField(5, if (ws.link) 1L else 0L)
      sw.packed(6)(pw => ws.nodeIds.foreach(n => pw.varint(nodeIdEnc(n))))
      sw.strField(7, ws.name)
      osm.lenField(1, sw.bytes)
    }
    val w = new OsmPbf.Writer
    w.strField(1, gid).lenField(2, osm.bytes)
    w.bytes
  }

  /** Equirectangular tile id (the repo's q16 tiling math) for file naming. */
  def tileIdFor(lon: Double, lat: Double, zoom: Int): String = {
    val n = 1L << zoom
    val x = math.min(math.max(math.floor((lon + 180.0) / 360.0 * n), 0), (n - 1).toDouble).toLong
    val y = math.min(math.max(math.floor((90.0 - lat) / 180.0 * n), 0), (n - 1).toDouble).toLong
    s"$zoom-$x-$y"
  }

  /**
   * Inverse of the tile scans: render a directed-reference network as a REAL
   * wire-format tileset (`<z>-<x>-<y>.{geometry,reference,metadata}.<level>
   * .pbf`, varint-delimited messages) — the fixture generator that lets the
   * driver gate exercise the tile READER end-to-end (q51), and an export
   * path for interchange with sharedstreets tooling. Work is partition-
   * parallel: geometries group by id, land whole in the partition owning
   * their (tile, kind), and files commit via attempt-unique temp + rename.
   * PBF way/node ids are int64, so non-numeric ids need an injective
   * `wayIdEnc`/`nodeIdEnc` (the caller owns the inverse mapping).
   */
  def writeTileset(refs: Dataset[ShstReference], dir: String, zoom: Int = 12,
      level: Int = 8,
      wayIdEnc: String => Long = _.toLong,
      nodeIdEnc: String => Long = _.toLong): Long = {
    val spark = refs.sparkSession
    import spark.implicits._
    val hadoopKVs = HadoopConf.kvs(spark)
    // a group with no forward reference cannot be exported faithfully (its
    // coordinates are reversed relative to the geometry's orientation, and
    // re-reading would silently flip the direction) — skip it, COUNTED
    val skippedBackOnly = spark.sparkContext.longAccumulator(
      "writeTileset.skippedBackOnlyGroups")
    val msgs = refs.groupByKey(_.geometryId).flatMapGroups { (gid, it) =>
      val rs = it.toSeq.sortBy(r => (!r.isForward, r.shstReferenceId))
      val fwdOpt = rs.find(_.isForward)
      if (fwdOpt.isEmpty) { skippedBackOnly.add(1); Seq.empty } else {
      val fwd = fwdOpt.get
      val back = rs.find(!_.isForward)
      val coords = fwd.coordinates
      val tid = tileIdFor(coords.head.head, coords.head(1), zoom)
      val rc = roadClassCode(fwd.roadClass)
      val fow = if (rc == 0) 1 else 3 // Motorway | SingleCarriageway
      def lrs(r: ShstReference): Seq[LocationRef] = {
        val c0 = r.coordinates.head; val c1 = r.coordinates.last
        Seq(LocationRef(r.fromIntersectionId, c0.head, c0(1), None, Some(45), Some(100)),
          LocationRef(r.toIntersectionId, c1.head, c1(1), Some(44), None, None))
      }
      val refMsgs = rs.map(r => (tid, "reference", r.shstReferenceId,
        encReference(r.shstReferenceId, gid, fow, lrs(r))))
      Seq(
        (tid, "geometry", gid, encGeometry(gid, fwd.fromIntersectionId,
          fwd.toIntersectionId, fwd.shstReferenceId,
          back.map(_.shstReferenceId), rc, coords)),
        (tid, "metadata", gid, encMetadata(gid, fwd.waySections,
          wayIdEnc, nodeIdEnc))) ++ refMsgs
      }
    }.toDF("tile_id", "kind", "sort_key", "bytes")
    // a (tile, kind) group lands whole in one partition; the sort makes each
    // file's bytes deterministic across reruns and parallelism levels
    val nFiles = msgs.repartition(col("tile_id"), col("kind"))
      .sortWithinPartitions("tile_id", "kind", "sort_key")
      .as[(String, String, String, Array[Byte])]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val conf = HadoopConf.build(hadoopKVs)
          val dirPath = new org.apache.hadoop.fs.Path(dir)
          val fs = dirPath.getFileSystem(conf)
          fs.mkdirs(dirPath)
          val ctx = org.apache.spark.TaskContext.get()
          val attempt = if (ctx == null) 0L else ctx.taskAttemptId()
          var cur: (String, String) = null
          var out: org.apache.hadoop.fs.FSDataOutputStream = null
          var tmp: org.apache.hadoop.fs.Path = null
          var fin: org.apache.hadoop.fs.Path = null
          val files = Seq.newBuilder[String]
          def closeFile(): Unit = if (out != null) {
            out.close()
            if (fs.exists(fin)) fs.delete(fin, false)
            // a failed rename must fail the task, not silently lose the tile
            if (!fs.rename(tmp, fin) && !fs.exists(fin))
              throw new java.io.IOException(s"rename $tmp -> $fin failed")
            files += fin.toString
            out = null
          }
          it.foreach { case (tid, kind, _, bytes) =>
            if (cur != ((tid, kind))) {
              closeFile()
              cur = (tid, kind)
              fin = new org.apache.hadoop.fs.Path(dirPath, s"$tid.$kind.$level.pbf")
              tmp = new org.apache.hadoop.fs.Path(dirPath, s".$tid.$kind.$level.$attempt.tmp")
              out = fs.create(tmp, true)
            }
            var x = bytes.length.toLong // varint length framing
            var done = false
            while (!done) {
              val c = (x & 0x7f).toInt; x = x >>> 7
              out.write(if (x != 0) c | 0x80 else c); done = x == 0
            }
            out.write(bytes)
          }
          closeFile()
          files.result().iterator
        }
      }.count()
    if (skippedBackOnly.value > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"writeTileset: skipped ${skippedBackOnly.value} geometry group(s) " +
          "with no forward reference (unexportable orientation)")
    nFiles
  }
}

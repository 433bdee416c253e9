package graft.sources

import graft.model.ConflationSegment
import graft.operators.NodeIds
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Clean-room OSM PBF sink + scan (the reference post-processes its XML into
 * `osm.pbf` with the external osmosis binary, README:14-18 — here the
 * encoding is native so no external tool is needed). Format from the PUBLIC
 * OSM PBF spec (wiki.openstreetmap.org/wiki/PBF_Format):
 *
 *   file      := ( int32-BE len(BlobHeader) · BlobHeader · Blob )*
 *   BlobHeader:= { 1: type ("OSMHeader"|"OSMData"), 3: datasize }
 *   Blob      := { 2: raw_size, 3: zlib_data }           (zlib via java.util.zip)
 *   OSMHeader := HeaderBlock { 4: required_features*, 16: writingprogram }
 *   OSMData   := PrimitiveBlock { 1: stringtable { 1: bytes* },
 *                 2: PrimitiveGroup*, 17: granularity=100 (1e-7°) }
 *   PrimitiveGroup := { 2: DenseNodes | 3: Way* | 4: Relation* }
 *   DenseNodes := { 1: id (packed sint64 delta), 8: lat, 9: lon (same) }
 *   Way  := { 1: id, 2: keys (packed), 3: vals, 8: refs (packed sint64 delta) }
 *   Relation := { 1: id, 2: keys, 3: vals, 8: roles_sid (packed),
 *                 9: memids (packed sint64 delta), 10: types (packed enum) }
 *
 * Sharding: a PBF file is a self-delimiting blob stream, so each Spark
 * partition renders its OWN complete file (header blob + data blobs) —
 * the export is a directory of valid `.osm.pbf` shards, no driver
 * materialization; readers (including this one) take the directory glob.
 *
 * Id mapping: PBF ids are int64. Numeric node ids pass through; synthetic
 * `synth_<n>` split vertices map to NEGATIVE ids (-(n+1)) — the standard
 * "temporary id" convention — and composite way ids (`shstRef:segIdx`)
 * get allocated sequential ids with the composite kept as a `split_id` tag.
 */
object OsmPbf {

  // ---- protobuf wire writer ------------------------------------------------

  final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def bytes: Array[Byte] = out.toByteArray
    def varint(v0: Long): this.type = {
      var x = v0
      var done = false
      while (!done) {
        val c = (x & 0x7f).toInt
        x = x >>> 7
        out.write(if (x != 0) c | 0x80 else c)
        done = x == 0
      }
      this
    }
    def zigzag(v: Long): this.type = varint((v << 1) ^ (v >> 63))
    def tag(field: Int, wire: Int): this.type = varint((field.toLong << 3) | wire)
    def lenField(field: Int, body: Array[Byte]): this.type = {
      tag(field, 2); varint(body.length.toLong); out.write(body, 0, body.length); this
    }
    def strField(field: Int, s: String): this.type =
      lenField(field, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def varField(field: Int, v: Long): this.type = { tag(field, 0); varint(v) }
    def packed(field: Int)(fill: Writer => Unit): this.type = {
      val w = new Writer; fill(w); lenField(field, w.bytes)
    }
    /** Raw little-endian 64-bit double (for packed double fields). */
    def rawDoubleLE(v: Double): this.type = {
      val bits = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
      this
    }
    /** `field` as wire-type-1 (fixed64) double. */
    def doubleField(field: Int, v: Double): this.type = { tag(field, 1); rawDoubleLE(v) }
  }

  private def zlib(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte], rawSize: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new Array[Byte](rawSize)
    var off = 0
    while (off < rawSize && !inf.finished())
      off += inf.inflate(out, off, rawSize - off)
    inf.end()
    out
  }

  /** One framed blob: len(BlobHeader) int32-BE · BlobHeader · Blob(zlib). */
  private def framedBlob(blobType: String, payload: Array[Byte]): Array[Byte] = {
    val blob = new Writer()
      .varField(2, payload.length.toLong)
      .lenField(3, zlib(payload))
      .bytes
    val header = new Writer()
      .strField(1, blobType)
      .varField(3, blob.length.toLong)
      .bytes
    java.nio.ByteBuffer.allocate(4 + header.length + blob.length)
      .putInt(header.length).put(header).put(blob).array()
  }

  private def headerBlob(): Array[Byte] =
    framedBlob("OSMHeader", new Writer()
      .strField(4, "OsmSchema-V0.6")
      .strField(4, "DenseNodes")
      .strField(16, "graft")
      .bytes)

  /** granularity 100 nanodegrees = exactly the 7-dp coordinate precision. */
  private final val Gran = 100L
  private def toNano7(deg: Double): Long = math.round(deg * 1e7)

  // ---- block builders (pure, per-partition) --------------------------------

  final case class PbfNode(id: Long, lon: Double, lat: Double)
  final case class PbfWay(id: Long, refs: Seq[Long], tags: Seq[(String, String)])
  final case class PbfMember(role: String, id: Long, mtype: Int) // 0 node 1 way 2 rel
  final case class PbfRelation(id: Long, members: Seq[PbfMember],
      tags: Seq[(String, String)])

  private final class StringTable {
    private val idx = scala.collection.mutable.LinkedHashMap("" -> 0)
    def apply(s: String): Int = idx.getOrElseUpdate(s, idx.size)
    def bytes: Array[Byte] = {
      val w = new Writer
      idx.keys.foreach(s => w.lenField(1,
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      w.bytes
    }
  }

  private def primitiveBlock(st: StringTable, groups: Seq[Array[Byte]]): Array[Byte] = {
    val w = new Writer
    w.lenField(1, st.bytes)
    groups.foreach(g => w.lenField(2, g))
    w.varField(17, Gran)
    w.bytes
  }

  def nodesBlock(nodes: Seq[PbfNode]): Array[Byte] = {
    val dense = new Writer
    dense.packed(1) { w => var p = 0L; nodes.foreach { n => w.zigzag(n.id - p); p = n.id } }
    // stored unit = granularity steps: deg·1e9 / 100 = exactly toNano7
    dense.packed(8) { w =>
      var p = 0L
      nodes.foreach { n => val v = toNano7(n.lat); w.zigzag(v - p); p = v }
    }
    dense.packed(9) { w =>
      var p = 0L
      nodes.foreach { n => val v = toNano7(n.lon); w.zigzag(v - p); p = v }
    }
    val group = new Writer().lenField(2, dense.bytes).bytes
    primitiveBlock(new StringTable, Seq(group))
  }

  def waysBlock(ways: Seq[PbfWay]): Array[Byte] = {
    val st = new StringTable
    val group = new Writer
    ways.foreach { way =>
      val w = new Writer().varField(1, way.id)
      w.packed(2)(pw => way.tags.foreach(t => pw.varint(st(t._1).toLong)))
      w.packed(3)(pw => way.tags.foreach(t => pw.varint(st(t._2).toLong)))
      w.packed(8) { pw => var p = 0L; way.refs.foreach { r => pw.zigzag(r - p); p = r } }
      group.lenField(3, w.bytes)
    }
    primitiveBlock(st, Seq(group.bytes))
  }

  def relationsBlock(rels: Seq[PbfRelation]): Array[Byte] = {
    val st = new StringTable
    val group = new Writer
    rels.foreach { rel =>
      val w = new Writer().varField(1, rel.id)
      w.packed(2)(pw => rel.tags.foreach(t => pw.varint(st(t._1).toLong)))
      w.packed(3)(pw => rel.tags.foreach(t => pw.varint(st(t._2).toLong)))
      w.packed(8)(pw => rel.members.foreach(m => pw.varint(st(m.role).toLong)))
      w.packed(9) { pw => var p = 0L; rel.members.foreach { m => pw.zigzag(m.id - p); p = m.id } }
      w.packed(10)(pw => rel.members.foreach(m => pw.varint(m.mtype.toLong)))
      group.lenField(4, w.bytes)
    }
    primitiveBlock(st, Seq(group.bytes))
  }

  // ---- id mapping ----------------------------------------------------------

  /** Numeric ids pass through; `synth_<n>` → -(n+1); anything else is a
    * deterministic negative hash (kept clear of the synth range). */
  def nodeIdExpr(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c.rlike("^-?[0-9]+$"), c.cast("long"))
      .when(c.rlike("^synth_[0-9]+$"),
        -(regexp_extract(c, "^synth_([0-9]+)$", 1).cast("long") + 1))
      // modulus leaves headroom for the +1e9 offset: pmod over the full
      // Long.MaxValue range could land within 1e9 of the top and the add
      // would overflow to a large POSITIVE id colliding with real node ids
      // (ADVICE r3)
      .otherwise(-(pmod(xxhash64(c), lit(Long.MaxValue - 1000000000L)) + lit(1000000000L)))

  // ---- Spark sink -----------------------------------------------------------

  /** Rows per data blob — the spec's ~8k-entity PrimitiveBlock convention. */
  private final val BlockRows = 8000

  private def writeShards[T](ds: Dataset[T], path: String)(
      render: Iterator[T] => Iterator[Array[Byte]]): Unit = {
    // Configuration isn't serializable — ship the session's hadoop overrides
    // (s3a credentials/endpoints etc.) as plain pairs and rebuild executor-
    // side, instead of a bare new Configuration() that silently dropped them
    // (ADVICE r3).
    val hadoopKVs = HadoopConf.kvs(ds.sparkSession)
    ds.rdd.mapPartitionsWithIndex { (i, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val conf = HadoopConf.build(hadoopKVs)
        val dir = new org.apache.hadoop.fs.Path(path)
        val fs = dir.getFileSystem(conf)
        fs.mkdirs(dir)
        // write to an attempt-unique temp file, then rename into place: a
        // speculative/retried attempt can't interleave writes into the final
        // part file, and the last rename wins whole (ADVICE r3)
        val ctx = org.apache.spark.TaskContext.get()
        val attempt = if (ctx == null) 0L else ctx.taskAttemptId()
        val f = new org.apache.hadoop.fs.Path(dir, f"part-$i%05d.osm.pbf")
        val tmp = new org.apache.hadoop.fs.Path(dir, f".part-$i%05d.$attempt.tmp")
        val out = fs.create(tmp, true)
        try {
          out.write(headerBlob())
          render(it).foreach(out.write)
        } finally out.close()
        if (fs.exists(f)) fs.delete(f, false)
        // a failed rename must fail the task, not silently lose the shard
        if (!fs.rename(tmp, f) && !fs.exists(f))
          throw new java.io.IOException(s"rename $tmp -> $f failed")
        Iterator.single(f.toString)
      }
    }.count()
    ()
  }

  /**
   * The full conflation export: nodes (reconciled ids incl. split
   * vertices), ways (resolved refs; `highway`/`shst_ref`/`split_id` tags),
   * restriction relations — same referential closure as
   * [[graft.operators.Sinks.osmXmlDocument]], binary-encoded.
   */
  def writeDocument(segments: Dataset[ConflationSegment], reanchored: DataFrame,
      path: String): Unit = {
    val spark = segments.sparkSession
    import spark.implicits._
    val rec = NodeIds.reconcile(segments)
      .withColumn("pbf_node_id", nodeIdExpr(col("final_node_id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val nodes = rec.groupBy("pbf_node_id")
      .agg(min("rlon").as("lon"), min("rlat").as("lat"))
      .orderBy("pbf_node_id")
      .select(col("pbf_node_id").as("id"), col("lon"), col("lat")).as[PbfNode]
    writeShards(nodes, s"$path/nodes")(_.grouped(BlockRows)
      .map(g => framedBlob("OSMData", nodesBlock(g))))

    // sequential int64 way ids; composite id kept as the split_id tag
    val wayKey = graft.operators.ConflationPipeline.withGlobalOrderedId(
      segments.toDF().select(col("shstReferenceId"), col("segmentIndex"),
        col("roadClass"), col("wayId")),
      Seq("shstReferenceId", "segmentIndex"), "pbf_way_id")
    val refsBySeg = rec.groupBy("shstReferenceId", "segmentIndex")
      .agg(array_sort(collect_list(struct(col("vertex_idx"), col("pbf_node_id"))))
        .as("vs"))
      .select(col("shstReferenceId"), col("segmentIndex"),
        transform(col("vs"), v => v.getField("pbf_node_id")).as("refs"))
    val ways = wayKey.join(refsBySeg, Seq("shstReferenceId", "segmentIndex"))
      .orderBy("pbf_way_id")
      .select(col("pbf_way_id"), col("refs"),
        col("roadClass"), col("shstReferenceId"),
        concat(col("shstReferenceId"), lit(":"), col("segmentIndex")).as("split_id"),
        col("wayId"))
      .map(r => PbfWay(r.getLong(0), r.getSeq[Long](1),
        Seq("highway" -> r.getString(2), "shst_ref" -> r.getString(3),
          "split_id" -> r.getString(4), "osm_way" -> r.getString(5))))
    writeShards(ways, s"$path/ways")(_.grouped(BlockRows)
      .map(g => framedBlob("OSMData", waysBlock(g))))

    // restriction members resolve through the way-id allocation table
    val wayIdOf = wayKey.select(
      concat(col("shstReferenceId"), lit(":"), col("segmentIndex")).as("split_id"),
      col("pbf_way_id"))
    val rels = reanchored
      .join(wayIdOf.withColumnRenamed("split_id", "from_way")
        .withColumnRenamed("pbf_way_id", "from_id"), Seq("from_way"))
      .join(wayIdOf.withColumnRenamed("split_id", "to_way")
        .withColumnRenamed("pbf_way_id", "to_id"), Seq("to_way"))
      .withColumn("via_id", nodeIdExpr(col("viaNodeId")))
      .orderBy("restriction_id")
      .select(col("restriction_id"), col("from_id"), col("via_id"), col("to_id"),
        col("restriction"))
      .map(r => PbfRelation(r.getLong(0),
        Seq(PbfMember("from", r.getLong(1), 1), PbfMember("via", r.getLong(2), 0),
          PbfMember("to", r.getLong(3), 1)),
        Seq("type" -> "restriction", "restriction" -> r.getString(4))))
    writeShards(rels, s"$path/relations")(_.grouped(BlockRows)
      .map(g => framedBlob("OSMData", relationsBlock(g))))
    rec.unpersist(blocking = false)
  }

  // ---- scan -----------------------------------------------------------------

  /** Parsed entity union row (one DataFrame, `kind` discriminates). */
  case class PbfEntity(kind: String, id: Long, lon: Double, lat: Double,
      refs: Seq[Long], tags: Map[String, String],
      memberRoles: Seq[String], memberIds: Seq[Long], memberTypes: Seq[Int])

  private def parsePacked(r: ShstTiles.Reader, wire: Int)(one: ShstTiles.Reader => Long): Seq[Long] =
    if (wire == 2) { val s = r.sub(); val b = Seq.newBuilder[Long]; while (s.hasRemaining) b += one(s); b.result() }
    else Seq(one(r))

  private def zz(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def parseBlock(block: Array[Byte]): Seq[PbfEntity] = {
    val r = new ShstTiles.Reader(block, 0, block.length)
    val strings = scala.collection.mutable.ArrayBuffer.empty[String]
    val groups = scala.collection.mutable.ArrayBuffer.empty[ShstTiles.Reader]
    var gran = 100L
    var latOff = 0L
    var lonOff = 0L
    while (r.hasRemaining) {
      val (tag, wire) = r.readTag()
      (tag, wire) match {
        case (1, 2) =>
          val st = r.sub()
          while (st.hasRemaining) {
            val (t2, w2) = st.readTag()
            if (t2 == 1 && w2 == 2) strings += st.readString() else st.skip(w2)
          }
        case (2, 2) => groups += r.sub()
        case (17, 0) => gran = r.readVarint()
        case (19, 0) => latOff = r.readVarint()
        case (20, 0) => lonOff = r.readVarint()
        case (_, w) => r.skip(w)
      }
    }
    def deg(v: Long, off: Long): Double = (off + gran * v) * 1e-9
    val out = Seq.newBuilder[PbfEntity]
    groups.foreach { g =>
      while (g.hasRemaining) {
        val (tag, wire) = g.readTag()
        (tag, wire) match {
          case (1, 2) => // plain Node
            val n = g.sub()
            var id = 0L; var lat = 0L; var lon = 0L
            val ks = Seq.newBuilder[Long]; val vs = Seq.newBuilder[Long]
            while (n.hasRemaining) {
              val (t2, w2) = n.readTag()
              (t2, w2) match {
                case (1, 0) => id = zz(n.readVarint())
                case (2, _) => ks ++= parsePacked(n, w2)(_.readVarint())
                case (3, _) => vs ++= parsePacked(n, w2)(_.readVarint())
                case (8, 0) => lat = zz(n.readVarint())
                case (9, 0) => lon = zz(n.readVarint())
                case (_, w) => n.skip(w)
              }
            }
            out += PbfEntity("node", id, deg(lon, lonOff), deg(lat, latOff),
              Nil, tagMap(strings, ks.result(), vs.result()), Nil, Nil, Nil)
          case (2, 2) => // DenseNodes
            val d = g.sub()
            // packed repeated fields may legally arrive as SEVERAL length-
            // delimited chunks — accumulate with ++= (the raw values here are
            // un-decoded deltas, so chunk order composes; the delta base is
            // carried once, below, over the concatenation) (ADVICE r3)
            val ids = Seq.newBuilder[Long]; val lats = Seq.newBuilder[Long]
            val lons = Seq.newBuilder[Long]; val kvs = Seq.newBuilder[Long]
            while (d.hasRemaining) {
              val (t2, w2) = d.readTag()
              (t2, w2) match {
                case (1, _) => ids ++= parsePacked(d, w2)(s => zz(s.readVarint()))
                case (8, _) => lats ++= parsePacked(d, w2)(s => zz(s.readVarint()))
                case (9, _) => lons ++= parsePacked(d, w2)(s => zz(s.readVarint()))
                case (10, _) => kvs ++= parsePacked(d, w2)(_.readVarint())
                case (_, w) => d.skip(w)
              }
            }
            val (idsV, latsV, lonsV, kvsV) =
              (ids.result(), lats.result(), lons.result(), kvs.result())
            // keys_vals (field 10): per-node runs of stringtable (key, val)
            // index pairs, each run 0-terminated; empty field ⇒ no node has
            // tags. Real planet files dense-encode virtually every node, so
            // dropping this silently lost all node tags (ADVICE r3).
            var kvPos = 0
            def nextTags(): Map[String, String] =
              if (kvsV.isEmpty) Map.empty
              else {
                val b = Map.newBuilder[String, String]
                while (kvPos < kvsV.length && kvsV(kvPos) != 0L) {
                  val k = kvsV(kvPos).toInt
                  val v = if (kvPos + 1 < kvsV.length) kvsV(kvPos + 1).toInt else 0
                  b += (strings(k) -> strings(v))
                  kvPos += 2
                }
                kvPos += 1 // the terminating 0
                b.result()
              }
            var (pi, pla, plo) = (0L, 0L, 0L)
            idsV.indices.foreach { i =>
              pi += idsV(i); pla += latsV(i); plo += lonsV(i)
              out += PbfEntity("node", pi, deg(plo, lonOff), deg(pla, latOff),
                Nil, nextTags(), Nil, Nil, Nil)
            }
          case (3, 2) => // Way
            val wmsg = g.sub()
            var id = 0L
            val ks = Seq.newBuilder[Long]; val vs = Seq.newBuilder[Long]
            val refDeltas = Seq.newBuilder[Long]
            while (wmsg.hasRemaining) {
              val (t2, w2) = wmsg.readTag()
              (t2, w2) match {
                case (1, 0) => id = wmsg.readVarint()
                case (2, _) => ks ++= parsePacked(wmsg, w2)(_.readVarint())
                case (3, _) => vs ++= parsePacked(wmsg, w2)(_.readVarint())
                // deltas accumulate across chunks; base applied once below
                // (a per-chunk base reset corrupted refs after chunk 1)
                case (8, _) => refDeltas ++= parsePacked(wmsg, w2)(s => zz(s.readVarint()))
                case (_, w) => wmsg.skip(w)
              }
            }
            var rp = 0L
            val refs = refDeltas.result().map { d0 => rp += d0; rp }
            out += PbfEntity("way", id, 0, 0, refs,
              tagMap(strings, ks.result(), vs.result()), Nil, Nil, Nil)
          case (4, 2) => // Relation
            val rm = g.sub()
            var id = 0L
            val ks = Seq.newBuilder[Long]; val vs = Seq.newBuilder[Long]
            val roles = Seq.newBuilder[Long]; val midDeltas = Seq.newBuilder[Long]
            val mts = Seq.newBuilder[Long]
            while (rm.hasRemaining) {
              val (t2, w2) = rm.readTag()
              (t2, w2) match {
                case (1, 0) => id = rm.readVarint()
                case (2, _) => ks ++= parsePacked(rm, w2)(_.readVarint())
                case (3, _) => vs ++= parsePacked(rm, w2)(_.readVarint())
                case (8, _) => roles ++= parsePacked(rm, w2)(_.readVarint())
                // raw deltas accumulate across chunks; the running base is
                // applied ONCE over the concatenation (ADVICE r3 — a per-
                // chunk base reset corrupted every id after the first chunk)
                case (9, _) => midDeltas ++= parsePacked(rm, w2)(s => zz(s.readVarint()))
                case (10, _) => mts ++= parsePacked(rm, w2)(_.readVarint())
                case (_, w) => rm.skip(w)
              }
            }
            var mp = 0L
            val mids = midDeltas.result().map { d0 => mp += d0; mp }
            out += PbfEntity("relation", id, 0, 0, Nil,
              tagMap(strings, ks.result(), vs.result()),
              roles.result().map(i => strings(i.toInt)), mids,
              mts.result().map(_.toInt))
          case (_, w) => g.skip(w)
        }
      }
    }
    out.result()
  }

  private def tagMap(strings: scala.collection.Seq[String], ks: Seq[Long],
      vs: Seq[Long]): Map[String, String] =
    ks.zip(vs).map { case (k, v) => strings(k.toInt) -> strings(v.toInt) }.toMap

  /** All entities of every `.osm.pbf` shard under `glob` (distributed per
    * file; a planet split into shards scans in parallel). */
  def read(spark: SparkSession, glob: String): Dataset[PbfEntity] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        // a corrupt shard is skipped whole (same policy as ShstTiles.scan)
        try parseFile(bytes)
        catch { case _: RuntimeException | _: java.util.zip.DataFormatException |
            _: java.nio.BufferUnderflowException => Vector.empty }
      }
  }

  /** Spec caps: BlobHeader ≤ 64 KiB, Blob ≤ 32 MiB (compressed and raw).
    * Untrusted length fields are checked against BOTH the cap and the bytes
    * actually remaining BEFORE any allocation: a malformed shard claiming a
    * ~2 GB length would otherwise OOM the executor (an Error, not caught by
    * read()'s skip path) instead of being skipped whole (ADVICE r3). */
  private final val MaxBlobHeader = 64 * 1024
  private final val MaxBlob = 32 * 1024 * 1024

  private def checkLen(len: Int, cap: Int, avail: Int, what: String): Unit =
    if (len < 0 || len > cap || len > avail)
      throw new IllegalArgumentException(
        s"$what length $len out of bounds (cap $cap, available $avail)")

  private def parseFile(bytes: Array[Byte]): Vector[PbfEntity] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = Vector.newBuilder[PbfEntity]
    while (bb.remaining() > 4) {
          val hlen = bb.getInt
          checkLen(hlen, MaxBlobHeader, bb.remaining(), "BlobHeader")
          val header = new Array[Byte](hlen); bb.get(header)
          val hr = new ShstTiles.Reader(header, 0, header.length)
          var btype = ""; var dsize = 0
          while (hr.hasRemaining) {
            val (t, w) = hr.readTag()
            (t, w) match {
              case (1, 2) => btype = hr.readString()
              case (3, 0) => dsize = hr.readVarint().toInt
              case (_, ww) => hr.skip(ww)
            }
          }
          checkLen(dsize, MaxBlob, bb.remaining(), "Blob")
          val blob = new Array[Byte](dsize); bb.get(blob)
          if (btype == "OSMData") {
            val br = new ShstTiles.Reader(blob, 0, blob.length)
            var raw: Array[Byte] = null; var rawSize = -1
            var z: Array[Byte] = null
            while (br.hasRemaining) {
              val (t, w) = br.readTag()
              (t, w) match {
                case (1, 2) => val s = br.sub(); raw = java.util.Arrays.copyOfRange(s.buf, s.pos, s.end)
                case (2, 0) => rawSize = br.readVarint().toInt
                case (3, 2) => val s = br.sub(); z = java.util.Arrays.copyOfRange(s.buf, s.pos, s.end)
                case (_, ww) => br.skip(ww)
              }
            }
            if (raw == null) checkLen(rawSize, MaxBlob, MaxBlob, "raw_size")
            val block = if (raw != null) raw else inflate(z, rawSize)
            out ++= parseBlock(block)
          }
    }
    out.result()
  }
}

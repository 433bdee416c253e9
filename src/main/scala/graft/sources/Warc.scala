package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import java.io.{ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/**
 * Clean-room WARC (Web ARChive, ISO 28500 / WARC 1.1) container sink +
 * scan — the wire format Common-Crawl-style corpora actually arrive in.
 * The graft's input table (BASELINE.json input_hint: url, warc_ts,
 * html, …) is exactly one `response` record per page; this module closes
 * the loop so the engine can both EMIT a corpus as standard WARC files
 * and INGEST real crawl archives without an external extraction step.
 *
 * Layout follows the Common Crawl convention: each record is its own
 * gzip member (so a file is streamable and records are individually
 * seekable by offset), files carry a leading `warcinfo` record, and a
 * `response` record's payload is a full HTTP/1.1 response
 * (`Content-Type: application/http; msgtype=response`) whose body is the
 * page bytes. `java.util.zip.GZIPInputStream` reads concatenated members
 * natively, so the scan is one sequential pass.
 *
 * Scale shape: the sink writes one `.warc.gz` per input partition with
 * no driver materialization (temp-file + rename commit, same protocol as
 * [[OsmPbf.writeShards]]); the scan parallelizes one task per FILE and
 * STREAMS each file (gzip-member framing is not block-splittable — the
 * within-crawl unit of parallelism is the file, of which a real crawl
 * has tens of thousands). Records are parsed strictly: header lines,
 * then exactly `Content-Length` payload bytes, then the CRLF CRLF
 * record terminator. A malformed record aborts only the REST of its
 * file (prior complete records are kept — gzip has already
 * authenticated them via per-member CRCs) and is surfaced as a
 * `__corrupt__` sentinel row, never a task failure; declared lengths
 * are validated against [[MaxRecord]] BEFORE allocation so a hostile
 * length field cannot OOM the executor (the OsmPbf ADVICE lesson).
 *
 * Determinism: record bytes are a pure function of (url, warc_ts, html)
 * — the record id is the RFC 4122 type-3 (name-based) UUID of the url,
 * the date is the fixed-width millisecond UTC form WARC 1.1 permits, and
 * `java.util.zip` deflate is deterministic at a fixed level — so the
 * sink is byte-reproducible and resumable jobs can overwrite in place.
 */
object Warc {

  /** Hard cap on a single record's declared payload (1 GiB): validated
    * before any allocation so a malformed/hostile Content-Length cannot
    * trigger an executor-killing OutOfMemoryError. */
  final val MaxRecord: Long = 1L << 30

  private final val CRLF = "\r\n"
  private val DateFmt = java.time.format.DateTimeFormatter
    .ofPattern("uuuu-MM-dd'T'HH:mm:ss.SSSX").withZone(java.time.ZoneOffset.UTC)

  // ---- sink -----------------------------------------------------------

  /** One WARC record as its own complete gzip member. */
  private def gzMember(record: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(record); gz.finish(); gz.close()
    bos.toByteArray
  }

  private def record(headers: Seq[(String, String)], payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.1").append(CRLF)
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append(CRLF) }
    sb.append("Content-Length: ").append(payload.length).append(CRLF).append(CRLF)
    val head = sb.toString.getBytes(ISO_8859_1)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  private def warcinfo(filename: String): Array[Byte] = {
    val body = ("software: graft" + CRLF +
      "format: WARC File Format 1.1" + CRLF).getBytes(ISO_8859_1)
    record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> recordId("warcinfo:" + filename),
      "WARC-Date" -> DateFmt.format(java.time.Instant.ofEpochMilli(0L)),
      "WARC-Filename" -> filename,
      "Content-Type" -> "application/warc-fields"), body)
  }

  /** Deterministic RFC 4122 type-3 (md5 name-based) record id. */
  private def recordId(name: String): String =
    "<urn:uuid:" + java.util.UUID.nameUUIDFromBytes(name.getBytes(UTF_8)) + ">"

  private def responseRecord(url: String, tsMillis: Long, html: Array[Byte]): Array[Byte] = {
    val http = ("HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/html; charset=UTF-8" + CRLF +
      "Content-Length: " + html.length + CRLF + CRLF).getBytes(ISO_8859_1)
    val payload = new Array[Byte](http.length + html.length)
    System.arraycopy(http, 0, payload, 0, http.length)
    System.arraycopy(html, 0, payload, http.length, html.length)
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> recordId(url),
      "WARC-Date" -> DateFmt.format(java.time.Instant.ofEpochMilli(tsMillis)),
      "WARC-Target-URI" -> url,
      "Content-Type" -> "application/http; msgtype=response"), payload)
  }

  /**
   * Write `(url, warc_ts, html)` rows as one `part-NNNNN.warc.gz` per
   * non-empty partition (warcinfo member first, then one response-record
   * member per page, input order preserved). Commit protocol: write to an
   * attempt-unique temp name, rename into place — a speculative retry
   * can't interleave with another attempt's bytes.
   */
  def writePages(df: DataFrame, path: String): Unit = {
    val hadoopKVs = HadoopConf.kvs(df.sparkSession)
    df.select("url", "warc_ts", "html").rdd.mapPartitionsWithIndex { (i, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val conf = HadoopConf.build(hadoopKVs)
        val dir = new org.apache.hadoop.fs.Path(path)
        val fs = dir.getFileSystem(conf)
        fs.mkdirs(dir)
        val name = f"part-$i%05d.warc.gz"
        val ctx = org.apache.spark.TaskContext.get()
        val attempt = if (ctx == null) 0L else ctx.taskAttemptId()
        val f = new org.apache.hadoop.fs.Path(dir, name)
        val tmp = new org.apache.hadoop.fs.Path(dir, s".$name.$attempt.tmp")
        val out = fs.create(tmp, true)
        try {
          out.write(gzMember(warcinfo(name)))
          it.foreach { r =>
            out.write(gzMember(responseRecord(
              r.getString(0), r.getTimestamp(1).getTime, r.getAs[Array[Byte]](2))))
          }
        } finally out.close()
        if (fs.exists(f)) fs.delete(f, false)
        if (!fs.rename(tmp, f) && !fs.exists(f))
          throw new java.io.IOException(s"rename $tmp -> $f failed")
        Iterator.single(f.toString)
      }
    }.count()
    ()
  }

  // ---- scan -----------------------------------------------------------

  /** A parsed record row. `record_id` is `__corrupt__` exactly when a
    * malformed record aborted the remainder of `warc_file` (url carries
    * the reason) — a visible sentinel, never a task failure. */
  case class WarcRow(
      url: String,
      warc_ts: java.sql.Timestamp,
      html: Array[Byte],
      record_id: String,
      warc_type: String,
      warc_file: String)

  /** Read one ISO-8859-1 header line (CRLF-terminated); None at clean EOF
    * before any byte. */
  private def readLine(in: InputStream): Option[String] = {
    val sb = new StringBuilder(64)
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    if (c < 0 && sb.isEmpty) None else Some(sb.toString)
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException(s"record truncated at $off/$n payload bytes")
      off += r
    }
    buf
  }

  /** Parse every record of one gzip-member stream. Strict framing; stops
    * the file at the first malformed record (already-parsed records are
    * kept) and appends a `__corrupt__` sentinel row. */
  private[graft] def parseStream(in: InputStream, file: String): Seq[WarcRow] = {
    val out = Seq.newBuilder[WarcRow]
    try {
      var line = readLine(in)
      while (line.isDefined) {
        // tolerate inter-record blank lines, then require the version line
        while (line.exists(_.isEmpty)) line = readLine(in)
        line match {
          case None => return out.result()
          case Some(v) if !v.startsWith("WARC/") =>
            throw new java.io.IOException(s"expected WARC version line, got '${v.take(40)}'")
          case _ => ()
        }
        var headers = Map.empty[String, String]
        var h = readLine(in).getOrElse(throw new EOFException("EOF in record headers"))
        while (h.nonEmpty) {
          val i = h.indexOf(':')
          if (i <= 0) throw new java.io.IOException(s"malformed header '${h.take(40)}'")
          headers += (h.substring(0, i).trim.toLowerCase -> h.substring(i + 1).trim)
          h = readLine(in).getOrElse(throw new EOFException("EOF in record headers"))
        }
        val len = headers.getOrElse("content-length",
          throw new java.io.IOException("record without Content-Length")).toLong
        // validate BEFORE allocating: a hostile length must not OOM the task
        if (len < 0 || len > MaxRecord)
          throw new java.io.IOException(s"unreasonable Content-Length $len")
        val payload = readFully(in, len.toInt)
        // record terminator
        val t = readFully(in, 4)
        if (!(t(0) == '\r' && t(1) == '\n' && t(2) == '\r' && t(3) == '\n'))
          throw new java.io.IOException("missing CRLFCRLF record terminator")
        val wtype = headers.getOrElse("warc-type", "")
        val ts = headers.get("warc-date")
          .map(d => new java.sql.Timestamp(java.time.Instant.parse(d).toEpochMilli))
          .getOrElse(new java.sql.Timestamp(0L))
        val body =
          if (wtype == "response" &&
              headers.get("content-type").exists(_.startsWith("application/http")))
            stripHttpEnvelope(payload)
          else payload
        out += WarcRow(
          url = headers.getOrElse("warc-target-uri", ""),
          warc_ts = ts,
          html = body,
          record_id = headers.getOrElse("warc-record-id", ""),
          warc_type = wtype,
          warc_file = file)
        line = readLine(in)
      }
      out.result()
    } catch {
      case e: Exception =>
        out += WarcRow(s"parse aborted: ${e.getMessage}",
          new java.sql.Timestamp(0L), Array.emptyByteArray,
          "__corrupt__", "__corrupt__", file)
        out.result()
    }
  }

  /** The HTTP response envelope ends at the first CRLFCRLF; the rest is
    * the entity body. No envelope → payload passes through whole. */
  private def stripHttpEnvelope(payload: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
      i += 1
    }
    payload
  }

  /**
   * Scan a directory/glob of `.warc.gz` files: one task per file (the
   * format's natural unit of parallelism), each STREAMED through one
   * `GZIPInputStream` (which walks concatenated members natively) — a
   * multi-GB archive never materializes in memory. Driver touches file
   * METADATA only (the listing), exactly like a FileFormat's planning
   * pass.
   */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val hadoopKVs = HadoopConf.kvs(spark)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".warc.gz"))
      .map(_.getPath.toString).sorted.toSeq
    spark.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .flatMap { f =>
        val conf = HadoopConf.build(hadoopKVs)
        val fp = new org.apache.hadoop.fs.Path(f)
        val in = new GZIPInputStream(fp.getFileSystem(conf).open(fp))
        try parseStream(in, f) finally in.close()
      }
      .toDS().toDF()
  }

  /** `response` records only, in the graft input-table projection. */
  def readPages(spark: SparkSession, path: String): DataFrame =
    read(spark, path).where(org.apache.spark.sql.functions.col("warc_type") === "response")
      .select("url", "warc_ts", "html", "record_id", "warc_file")

  // ---- CDX-style index + random access --------------------------------

  /** One index row per response record: because every record is its own
    * gzip member, (warc_file, offset, length) addresses it with ONE seek —
    * no scan. `surt` is the CDX sort key (reversed host labels + path). */
  case class WarcIndexEntry(
      surt: String,
      url: String,
      record_id: String,
      warc_file: String,
      offset: Long,
      length: Int)

  /** SURT (Sort-friendly URI Reordering Transform) key, the ordering CDX
    * indexes use so one host's records sort together: lowercased host
    * labels reversed and comma-joined, then `)` and the path (fragment
    * dropped, default ports gone via the lowering regex group). */
  def surtKey(url: String): String = {
    val m = java.util.regex.Pattern
      .compile("^[^/]+//(?:www\\.)?([^/:#]+)(?::\\d+)?([^#]*)").matcher(url.toLowerCase)
    if (!m.find()) url.toLowerCase
    else m.group(1).split('.').reverse.mkString(",") + ")" + m.group(2)
  }

  /**
   * Like [[writePages]], but additionally lands a parquet CDX index
   * (`$path/_index/`) built IN THE SAME PASS — each member's byte offset
   * is known as it is appended, so the index costs nothing extra. One
   * Spark job: the shard write happens inside the index rows'
   * materialization; no driver round-trip carries record data.
   */
  def writePagesIndexed(df: DataFrame, path: String): Unit = {
    val hadoopKVs = HadoopConf.kvs(df.sparkSession)
    val spark = df.sparkSession
    import spark.implicits._
    val idx = df.select("url", "warc_ts", "html").rdd.mapPartitionsWithIndex { (i, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val conf = HadoopConf.build(hadoopKVs)
        val dir = new org.apache.hadoop.fs.Path(path)
        val fs = dir.getFileSystem(conf)
        fs.mkdirs(dir)
        val name = f"part-$i%05d.warc.gz"
        val ctx = org.apache.spark.TaskContext.get()
        val attempt = if (ctx == null) 0L else ctx.taskAttemptId()
        val f = new org.apache.hadoop.fs.Path(dir, name)
        val tmp = new org.apache.hadoop.fs.Path(dir, s".$name.$attempt.tmp")
        val out = fs.create(tmp, true)
        val entries = Seq.newBuilder[WarcIndexEntry]
        try {
          var off = 0L
          val info = gzMember(warcinfo(name))
          out.write(info); off += info.length
          it.foreach { r =>
            val url = r.getString(0)
            val member = gzMember(responseRecord(
              url, r.getTimestamp(1).getTime, r.getAs[Array[Byte]](2)))
            out.write(member)
            entries += WarcIndexEntry(surtKey(url), url, recordId(url),
              f.toString, off, member.length)
            off += member.length
          }
        } finally out.close()
        if (fs.exists(f)) fs.delete(f, false)
        if (!fs.rename(tmp, f) && !fs.exists(f))
          throw new java.io.IOException(s"rename $tmp -> $f failed")
        entries.result().iterator
      }
    }.toDS()
    idx.write.mode("overwrite").parquet(s"$path/_index")
  }

  /** The CDX index of an archive written with [[writePagesIndexed]]. */
  def readIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/_index")

  /** Point read: ONE seek into the archive, gunzip one member, parse one
    * record. The 100-TB access path for url→page lookups (via the index)
    * that never touches the other 10¹² records. */
  def readRecordAt(conf: org.apache.hadoop.conf.Configuration,
      file: String, offset: Long, length: Int): WarcRow = {
    if (length < 0 || length > MaxRecord)
      return WarcRow(s"parse aborted: unreasonable member length $length",
        new java.sql.Timestamp(0L), Array.emptyByteArray, "__corrupt__", "__corrupt__", file)
    val fp = new org.apache.hadoop.fs.Path(file)
    val in = fp.getFileSystem(conf).open(fp)
    try {
      in.seek(offset)
      val member = readFully(in, length)
      val gz = new GZIPInputStream(new java.io.ByteArrayInputStream(member))
      parseStream(gz, file).headOption.getOrElse(
        WarcRow("parse aborted: empty member", new java.sql.Timestamp(0L),
          Array.emptyByteArray, "__corrupt__", "__corrupt__", file))
    } catch {
      case e: Exception =>
        WarcRow(s"parse aborted: ${e.getMessage}", new java.sql.Timestamp(0L),
          Array.emptyByteArray, "__corrupt__", "__corrupt__", file)
    } finally in.close()
  }

  /**
   * Read the whole archive THROUGH the index's random-access path —
   * distributed point reads, index rows repartitioned by file and sorted
   * by offset within each partition so one open stream per file walks
   * forward (seeks never go backwards). Exists to certify the seek path
   * at full coverage (q72); selective lookups filter the index first and
   * reuse the same kernel.
   */
  def readViaIndex(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val hadoopKVs = HadoopConf.kvs(spark)
    readIndex(spark, path)
      .repartition(col("warc_file"))
      .sortWithinPartitions(col("warc_file"), col("offset"))
      .select("warc_file", "offset", "length")
      .as[(String, Long, Int)]
      .mapPartitions { it =>
        val conf = HadoopConf.build(hadoopKVs)
        var curFile: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        val rows = it.map { case (file, off, len) =>
          if (file != curFile) {
            if (in != null) in.close()
            val fp = new org.apache.hadoop.fs.Path(file)
            in = fp.getFileSystem(conf).open(fp); curFile = file
          }
          try {
            in.seek(off)
            val gz = new GZIPInputStream(
              new java.io.ByteArrayInputStream(readFully(in, len)))
            parseStream(gz, file).headOption.getOrElse(
              WarcRow("parse aborted: empty member", new java.sql.Timestamp(0L),
                Array.emptyByteArray, "__corrupt__", "__corrupt__", file))
          } catch {
            case e: Exception =>
              WarcRow(s"parse aborted: ${e.getMessage}", new java.sql.Timestamp(0L),
                Array.emptyByteArray, "__corrupt__", "__corrupt__", file)
          }
        }
        new Iterator[WarcRow] {
          def hasNext: Boolean = { val h = rows.hasNext; if (!h && in != null) { in.close(); in = null }; h }
          def next(): WarcRow = rows.next()
        }
      }
      .toDF()
  }
}

package graft

import graft.sources.Warc
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** WARC (ISO 28500) container sink + scan round-trip. */
class WarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def pages(n: Int) = {
    (0 until n).map { i =>
      val url = s"https://example.test/road$i/page"
      val html = s"<html><body><p>doc $i &amp; more <b>text</b></p></body></html>"
        .getBytes("UTF-8")
      (url, new java.sql.Timestamp(1735689600000L + i * 1234L), html)
    }.toDF("url", "warc_ts", "html")
  }

  test("round-trip: every (url, warc_ts, html) row survives byte-identically") {
    val dir = Files.createTempDirectory("warcrt").toString
    Warc.writePages(pages(37).repartition(3, col("url")), dir)
    val back = Warc.readPages(spark, dir)
      .select("url", "warc_ts", "html").as[(String, java.sql.Timestamp, Array[Byte])]
      .collect().sortBy(_._1)
    val want = pages(37).as[(String, java.sql.Timestamp, Array[Byte])]
      .collect().sortBy(_._1)
    assert(back.length == want.length)
    back.zip(want).foreach { case ((u1, t1, h1), (u2, t2, h2)) =>
      assert(u1 == u2); assert(t1 == t2)
      assert(java.util.Arrays.equals(h1, h2), s"html bytes differ for $u1")
    }
    // one warcinfo per file, none leaking into the pages projection
    val all = Warc.read(spark, dir)
    assert(all.where($"warc_type" === "warcinfo").count() == 3)
    assert(all.where($"warc_type" === "response").count() == 37)
    // every record id is the deterministic type-3 uuid form
    assert(back.forall(_._1.nonEmpty))
  }

  test("sink bytes are deterministic: same partition rendered twice is identical") {
    val d1 = Files.createTempDirectory("warcdet1").toString
    val d2 = Files.createTempDirectory("warcdet2").toString
    val df = pages(11).sortWithinPartitions("url").coalesce(1)
    Warc.writePages(df, d1)
    Warc.writePages(df, d2)
    val b1 = Files.readAllBytes(new java.io.File(d1, "part-00000.warc.gz").toPath)
    val b2 = Files.readAllBytes(new java.io.File(d2, "part-00000.warc.gz").toPath)
    assert(java.util.Arrays.equals(b1, b2))
  }

  test("corruption: truncated tail loses only that file's remainder, visibly") {
    val dir = Files.createTempDirectory("warccor").toString
    Warc.writePages(pages(20).coalesce(1), dir)
    Warc.writePages(pages(40).where($"url".contains("road3")).coalesce(1)
      .withColumn("url", concat($"url", lit("-b"))), dir + "/b")
    // graft a good file plus a corrupt one into one scan dir
    val good = new java.io.File(dir, "part-00000.warc.gz")
    val corrupt = java.nio.file.Paths.get(dir, "zz-corrupt.warc.gz")
    // valid gzip member whose WARC content is garbage → parse aborts, task survives
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write("NOT A WARC RECORD\r\nstuff\r\n\r\n".getBytes("UTF-8")); gz.close()
    Files.write(corrupt, bos.toByteArray)
    val rows = Warc.read(spark, dir)
    assert(rows.where($"warc_type" === "response").count() == 20)
    val sentinels = rows.where($"record_id" === "__corrupt__").collect()
    assert(sentinels.length == 1)
    assert(sentinels.head.getAs[String]("warc_file").endsWith("zz-corrupt.warc.gz"))
    assert(good.exists())
  }

  test("hostile Content-Length is rejected before allocation") {
    val rec = ("WARC/1.1\r\nWARC-Type: response\r\nContent-Length: 99999999999\r\n\r\n")
      .getBytes("ISO-8859-1")
    val rows = Warc.parseStream(new java.io.ByteArrayInputStream(rec), "f")
    assert(rows.length == 1 && rows.head.record_id == "__corrupt__")
    assert(rows.head.url.contains("unreasonable Content-Length"))
  }

  test("cdx index: one-seek point lookup recovers exactly the asked record") {
    val dir = Files.createTempDirectory("warccdx").toString
    Warc.writePagesIndexed(pages(29).repartition(3, col("url")), dir)
    val idx = Warc.readIndex(spark, dir).collect()
    assert(idx.length == 29)
    val conf = spark.sparkContext.hadoopConfiguration
    // every entry random-accesses to its own record
    idx.foreach { e =>
      val r = Warc.readRecordAt(conf, e.getAs[String]("warc_file"),
        e.getAs[Long]("offset"), e.getAs[Int]("length"))
      assert(r.record_id != "__corrupt__", s"corrupt read for ${e.getAs[String]("url")}")
      assert(r.url == e.getAs[String]("url"))
      assert(new String(r.html, "UTF-8").contains(s"doc "))
    }
    // surt key sorts host-major
    assert(idx.forall(_.getAs[String]("surt").startsWith("test,example)/road")))
    // the index-driven full read equals the sequential scan, row for row
    val viaIdx = Warc.readViaIndex(spark, dir)
      .select("url", "warc_ts", "html").as[(String, java.sql.Timestamp, Array[Byte])]
      .collect().sortBy(_._1)
    val seqScan = Warc.readPages(spark, dir)
      .select("url", "warc_ts", "html").as[(String, java.sql.Timestamp, Array[Byte])]
      .collect().sortBy(_._1)
    assert(viaIdx.length == 29 && seqScan.length == 29)
    viaIdx.zip(seqScan).foreach { case ((u1, t1, h1), (u2, t2, h2)) =>
      assert(u1 == u2 && t1 == t2 && java.util.Arrays.equals(h1, h2))
    }
  }

  test("cdx point read survives a bad offset/length visibly") {
    val dir = Files.createTempDirectory("warccdx2").toString
    Warc.writePagesIndexed(pages(3).coalesce(1), dir)
    val e = Warc.readIndex(spark, dir).collect().head
    val conf = spark.sparkContext.hadoopConfiguration
    val file = e.getAs[String]("warc_file")
    // offset into the middle of a member: not a gzip header → sentinel
    val bad = Warc.readRecordAt(conf, file, e.getAs[Long]("offset") + 7, e.getAs[Int]("length"))
    assert(bad.record_id == "__corrupt__")
    // hostile length rejected before allocation
    val huge = Warc.readRecordAt(conf, file, e.getAs[Long]("offset"), Int.MaxValue)
    assert(huge.record_id == "__corrupt__")
    assert(huge.url.contains("unreasonable"))
  }

  test("surt key: host reversal, www/port/fragment drop") {
    assert(Warc.surtKey("https://www.News.Co.UK:443/p/1#f") == "uk,co,news)/p/1")
    assert(Warc.surtKey("http://a.b.c/x?q=2") == "c,b,a)/x?q=2")
    assert(Warc.surtKey("https://host/") == "host)/")
  }

  test("streaming ingest: two landing waves → two snapshots, exactly-once") {
    import graft.streaming.StreamingOps
    import graft.sources.SnapTable
    val landing = Files.createTempDirectory("warcland").toString
    val root = Files.createTempDirectory("warcsnap").toString + "/t"
    val ckpt = Files.createTempDirectory("warcckpt").toString
    Warc.writePages(pages(10).coalesce(1), landing)
    StreamingOps.warcIngestToSnap(spark, landing, root, ckpt).awaitTermination()
    assert(SnapTable.scan(spark, root).count() == 10)
    assert(SnapTable.currentVersion(spark, root).contains(1))
    // wave 2: more files into the same landing dir, same checkpoint
    Warc.writePages(pages(25).where(not($"url".isin(
      pages(10).select("url").as[String].collect().toSeq: _*))).coalesce(1),
      landing + "/wave2")
    // move wave2 shard in under a distinct name
    val w2 = new java.io.File(landing + "/wave2").listFiles().filter(_.getName.endsWith(".warc.gz")).head
    Files.move(w2.toPath, java.nio.file.Paths.get(landing, "part-10000.warc.gz"))
    StreamingOps.warcIngestToSnap(spark, landing, root, ckpt).awaitTermination()
    assert(SnapTable.scan(spark, root).count() == 25)
    assert(SnapTable.currentVersion(spark, root).contains(2))
    // exact rows: every url once
    val urls = SnapTable.scan(spark, root).select("url").as[String].collect()
    assert(urls.length == urls.distinct.length)
    // time travel still sees wave 1 alone
    assert(SnapTable.scan(spark, root, asOf = Some(1)).count() == 10)
  }

  test("streaming ingest survives a lost checkpoint: summary ledger makes replay a no-op") {
    import graft.streaming.StreamingOps
    import graft.sources.SnapTable
    val landing = Files.createTempDirectory("warcland2").toString
    val root = Files.createTempDirectory("warcsnap2").toString + "/t"
    val ckpt1 = Files.createTempDirectory("warcckpt2a").toString
    val ckpt2 = Files.createTempDirectory("warcckpt2b").toString
    Warc.writePages(pages(8).coalesce(1), landing)
    StreamingOps.warcIngestToSnap(spark, landing, root, ckpt1).awaitTermination()
    assert(SnapTable.currentVersion(spark, root).contains(1))
    // simulate the worst crash window: the checkpoint is GONE, the stream
    // restarts from scratch and replays every file — the file ledger in
    // the snapshot summary turns the replay into zero commits
    StreamingOps.warcIngestToSnap(spark, landing, root, ckpt2).awaitTermination()
    assert(SnapTable.currentVersion(spark, root).contains(1))
    assert(SnapTable.scan(spark, root).count() == 8)
  }

  test("ingest ledger keys on the full path: same-named files in " +
      "different directories both commit (day1/part-0 vs day2/part-0)") {
    import graft.streaming.StreamingOps
    import graft.sources.SnapTable
    val day1 = Files.createTempDirectory("warcday1").toString
    val day2 = Files.createTempDirectory("warcday2").toString
    val root = Files.createTempDirectory("warcsnap3").toString + "/t"
    def land(dir: String, lo: Int, hi: Int): Unit = {
      Warc.writePages(pages(hi)
        .where($"url".rlike(s"/road(${(lo until hi).mkString("|")})/"))
        .coalesce(1), dir)
      val f = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).head
      Files.move(f.toPath, java.nio.file.Paths.get(dir, "part-0.warc.gz"))
    }
    land(day1, 0, 4); land(day2, 4, 9)
    def batchOf(dir: String) = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").load(dir)
      .select($"path", $"modificationTime", $"length", $"content")
    assert(StreamingOps.warcIngestBatch(batchOf(day1), root) == 1)
    // second landing: SAME basename, different directory — must commit,
    // not be mistaken for the already-ingested file
    assert(StreamingOps.warcIngestBatch(batchOf(day2), root) == 1)
    assert(SnapTable.scan(spark, root).count() == 9)
    // and a true replay of either batch is still a no-op
    assert(StreamingOps.warcIngestBatch(batchOf(day1), root) == 0)
    assert(StreamingOps.warcIngestBatch(batchOf(day2), root) == 0)
  }

  test("mid-file corruption keeps the complete records before it") {
    // render two valid members, then append garbage INSIDE a valid gzip member
    val dir = Files.createTempDirectory("warcmid").toString
    Warc.writePages(pages(2).coalesce(1), dir)
    val f = new java.io.File(dir, "part-00000.warc.gz")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Files.readAllBytes(f.toPath))
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write("garbage tail".getBytes("UTF-8")); gz.close()
    Files.write(f.toPath, bos.toByteArray)
    // the local FS keeps a .crc sidecar from the original write; this test
    // rewrote the file out-of-band, so drop the stale sidecar (real object
    // stores have no such side channel)
    Files.deleteIfExists(new java.io.File(dir, ".part-00000.warc.gz.crc").toPath)
    val rows = Warc.read(spark, dir.toString)
    assert(rows.where($"warc_type" === "response").count() == 2)
    assert(rows.where($"record_id" === "__corrupt__").count() == 1)
  }
}

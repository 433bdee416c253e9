package graft

import graft.sources.SnapTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SnapTableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("snaptable").toString + "/t"

  private def docs(from: Int, until: Int) =
    spark.range(from, until).toDF("id")
      .withColumn("body", concat(lit("doc-"), col("id")))

  test("append + scan: snapshot grows, versions are monotone") {
    val root = freshRoot()
    assert(SnapTable.currentVersion(spark, root).isEmpty)
    val v1 = SnapTable.append(docs(0, 100), root, Seq("id"))
    assert(v1 == 1)
    val v2 = SnapTable.append(docs(100, 250), root, Seq("id"))
    assert(v2 == 2)
    assert(SnapTable.scan(spark, root).count() == 250)
    assert(SnapTable.scan(spark, root).agg(sum("id")).as[Long].head() ==
      (0L until 250).sum)
  }

  test("time travel: an old snapshot reads exactly its committed content") {
    val root = freshRoot()
    SnapTable.append(docs(0, 100), root, Seq("id"))
    SnapTable.append(docs(100, 250), root, Seq("id"))
    SnapTable.overwrite(docs(500, 520), root, Seq("id"))
    // v1 and v2 are untouched by both the later append and the overwrite
    assert(SnapTable.scan(spark, root, asOf = Some(1)).count() == 100)
    assert(SnapTable.scan(spark, root, asOf = Some(2)).count() == 250)
    assert(SnapTable.scan(spark, root).count() == 20)
    assert(SnapTable.scan(spark, root).agg(min("id")).as[Long].head() == 500)
  }

  test("overwrite publishes a manifest that stops referencing old files") {
    val root = freshRoot()
    SnapTable.append(docs(0, 100), root)
    SnapTable.overwrite(docs(0, 10), root)
    val m = SnapTable.manifest(spark, root, 2)
    assert(m.operation == "overwrite")
    val m1files = SnapTable.manifest(spark, root, 1).files.map(_.path).toSet
    assert(m.files.map(_.path).forall(p => !m1files.contains(p)))
  }

  test("range scan prunes files by manifest min/max stats") {
    val root = freshRoot()
    // range-partitioned write → each data file holds a tight id range
    SnapTable.append(docs(0, 1000).repartitionByRange(8, col("id")), root, Seq("id"))
    val all = SnapTable.manifest(spark, root, 1).files
    assert(all.size == 8)
    val planned = SnapTable.plannedFiles(spark, root, "id", "0", "99")
    assert(planned.size < all.size,
      s"expected manifest pruning to skip files: planned ${planned.size} of ${all.size}")
    val pruned = SnapTable.scanRange(spark, root, "id", "0", "99")
    val brute = SnapTable.scan(spark, root).filter(col("id").between(0, 99))
    assert(pruned.count() == 100)
    assert(pruned.exceptAll(brute).isEmpty && brute.exceptAll(pruned).isEmpty)
  }

  test("range scan on a string column prunes lexically") {
    val root = freshRoot()
    val df = Seq("apple", "banana", "cherry", "kiwi", "mango", "peach", "plum", "zucchini")
      .toDF("name").repartitionByRange(4, col("name"))
    SnapTable.append(df, root, Seq("name"))
    val planned = SnapTable.plannedFiles(spark, root, "name", "a", "b~")
    assert(planned.size < SnapTable.manifest(spark, root, 1).files.size)
    assert(SnapTable.scanRange(spark, root, "name", "a", "b~")
      .as[String].collect().sorted.toSeq == Seq("apple", "banana"))
  }

  test("concurrent appends: the lost CAS re-merges, no rows lost or doubled") {
    val root = freshRoot()
    SnapTable.append(docs(0, 10), root)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(SnapTable.append(docs(100, 160), root))
    val fb = Future(SnapTable.append(docs(200, 290), root))
    val (va, vb) = (Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    assert(Set(va, vb) == Set(2, 3), s"got versions $va, $vb")
    val ids = SnapTable.scan(spark, root).select("id").as[Long].collect().sorted
    assert(ids.toSeq == ((0L until 10) ++ (100L until 160) ++ (200L until 290)))
    // the later manifest carries BOTH appends' files (re-merge on lost CAS)
    assert(SnapTable.manifest(spark, root, 3).files.map(_.rows).sum == 160)
  }

  test("expire deletes dead manifests and unreferenced data files only") {
    val root = freshRoot()
    SnapTable.append(docs(0, 50), root)          // v1: files A
    SnapTable.append(docs(50, 80), root)         // v2: files A+B
    SnapTable.overwrite(docs(900, 910), root)    // v3: files C
    val (deadManifests, deadFiles) = SnapTable.expire(spark, root, keepFrom = 3)
    assert(deadManifests == 2)
    assert(deadFiles > 0) // A and B are only referenced by v1/v2
    assert(SnapTable.currentVersion(spark, root).contains(3))
    assert(SnapTable.scan(spark, root).count() == 10)
    intercept[IllegalArgumentException](SnapTable.scan(spark, root, asOf = Some(1)).count())
      : Unit
  }

  test("compact: many small files -> targetFiles range-clustered files, " +
      "rows identical, pruning restored, time travel intact") {
    val root = freshRoot()
    // 6 appends of 4 partitions each = 24 small files; ids INTERLEAVED
    // (id % 6 == i) so every file's min/max spans ~the whole [0,600) range —
    // the worst case incremental feeding produces for stats pruning
    (0 until 6).foreach { i =>
      val slice = spark.range(0, 600).toDF("id").filter(col("id") % 6 === i)
        .withColumn("body", concat(lit("doc-"), col("id")))
      SnapTable.append(slice.repartition(4), root, Seq("id"))
    }
    val before = SnapTable.manifest(spark, root, 6)
    assert(before.files.size >= 20, s"expected many small files, got ${before.files.size}")
    // every file overlaps [250,260) pre-compact (random repartition), so no pruning
    assert(SnapTable.plannedFiles(spark, root, "id", "250", "259").size ==
      before.files.size)

    val v = SnapTable.compact(spark, root, sortCol = Some("id"), targetFiles = 4)
    assert(v == 7)
    val after = SnapTable.manifest(spark, root, 7)
    assert(after.files.size <= 4)
    assert(after.summary == "compact of v6")
    // rows byte-identical (same multiset of (id, body))
    val got = SnapTable.scan(spark, root).select("id").as[Long].collect().sorted
    assert(got.toSeq == (0L until 600L))
    // range clustering makes per-file stats disjoint: a narrow slice plans 1 file
    assert(SnapTable.plannedFiles(spark, root, "id", "250", "259").size == 1)
    // time travel to the pre-compact snapshot still reads the old files
    assert(SnapTable.scan(spark, root, asOf = Some(6)).count() == 600)
  }

  test("compact CAS guard: a racing append fails the compaction, no row loss") {
    val root = freshRoot()
    SnapTable.append(docs(0, 50), root, Seq("id"))
    // simulate the race: head moves after compact's read would have happened —
    // drive commit directly with a stale expectedParent
    SnapTable.append(docs(50, 60), root, Seq("id")) // head is now v2
    intercept[java.util.ConcurrentModificationException] {
      SnapTable.commit(docs(0, 50), root, "overwrite", Seq("id"),
        summary = "compact of v1", expectedParent = Some(1))
    }: Unit
    // nothing was published: head still v2, all 60 rows readable
    assert(SnapTable.currentVersion(spark, root).contains(2))
    assert(SnapTable.scan(spark, root).count() == 60)
  }

  test("compactZorder: bbox pruning works on BOTH coordinate columns, " +
      "rows survive exactly, time travel intact") {
    val root = freshRoot()
    // 4096 points on a 64x64 grid, appended in ROW order (worst layout:
    // every file spans the full x and y range), in two waves
    val pts = spark.range(4096).select(col("id"),
      pmod(hash(col("id"), lit("zx")).cast("long"), lit(64L)).as("x"),
      pmod(hash(col("id"), lit("zy")).cast("long"), lit(64L)).as("y"))
    SnapTable.append(pts.where(col("id") < 2048).repartition(8), root)
    SnapTable.append(pts.where(col("id") >= 2048).repartition(8), root)
    val before = SnapTable.manifest(spark, root,
      SnapTable.currentVersion(spark, root).get).files.size
    // row-order layout: a narrow x slice prunes nothing
    assert(SnapTable.plannedFiles(spark, root, "x", "8", "11").size == before)
    val v = SnapTable.compactZorder(spark, root, "x", "y", bits = 6,
      targetFiles = 16)
    val m = SnapTable.manifest(spark, root, v)
    assert(m.files.size >= 12 && m.files.size <= 16, m.files.size.toString)
    // z-order bounds every file in both dimensions: a 4/64 slice on EITHER
    // column now plans a strict subset of the files
    val px = SnapTable.plannedFiles(spark, root, "x", "8", "11").size
    val py = SnapTable.plannedFiles(spark, root, "y", "8", "11").size
    assert(px <= m.files.size / 2, s"x-slice planned $px of ${m.files.size}")
    assert(py <= m.files.size / 2, s"y-slice planned $py of ${m.files.size}")
    // and the pruned scan loses nothing vs the full filter
    val got = SnapTable.scanRange(spark, root, "x", "8", "11")
      .select("id").as[Long].collect().sorted
    val want = pts.where(col("x") >= 8 && col("x") <= 11)
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want))
    // prior snapshots still read their own files
    assert(SnapTable.scan(spark, root, asOf = Some(1)).count() == 2048)
    // scanBox: the two-dimensional prune composes, and the result is
    // exactly the row-level box filter
    val box = SnapTable.scanBox(spark, root, "x", "8", "11", "y", "16", "23")
      .select("id").as[Long].collect().sorted
    val boxWant = pts.where(col("x").between(8, 11) && col("y").between(16, 23))
      .select("id").as[Long].collect().sorted
    assert(box.sameElements(boxWant) && box.nonEmpty)
  }

  test("schema rides in the manifest: scan needs no footer inference") {
    val root = freshRoot()
    SnapTable.append(docs(0, 5).withColumn("score", col("id") * 1.5), root)
    val m = SnapTable.manifest(spark, root, 1)
    assert(m.schemaDdl.contains("score"))
    val got = SnapTable.scan(spark, root)
    assert(got.schema("score").dataType ==
      org.apache.spark.sql.types.DoubleType)
  }
}

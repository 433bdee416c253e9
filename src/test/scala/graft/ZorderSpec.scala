package graft

import graft.functions.geo
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZorderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Reference interleave, independent scalar code. */
  private def ref(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, b) =>
      acc | (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
    }

  // deterministic pseudo-random points on a 1024x1024 grid
  private def points: DataFrame = spark.range(4096).select(
    col("id"),
    pmod(hash(col("id"), lit("x")).cast("long"), lit(1024L)).as("x"),
    pmod(hash(col("id"), lit("y")).cast("long"), lit(1024L)).as("y"))

  test("morton_key matches the scalar interleave bit-for-bit, and " +
      "ignores bits beyond `bits`") {
    val got = points
      .withColumn("x", col("x") + 4096L) // high bits beyond bits=10: ignored
      .select(col("x"), col("y"), geo.morton_key(col("x"), col("y"), 10).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == ref(x, y, 10), s"($x,$y)")
      assert(z == ref(x & 1023, y, 10)) // mask equivalence
    }
  }

  test("SQL surface: morton_key(x, y, bits) via spark.sql equals the " +
      "Column API") {
    geo.register(spark)
    points.limit(100).createOrReplaceTempView("zpts")
    val viaSql = spark.sql(
      "SELECT id, morton_key(x, y, 10) AS z FROM zpts")
      .as[(Long, Long)].collect().toMap
    val viaCol = points.limit(100)
      .select(col("id"), geo.morton_key(col("x"), col("y"), 10).as("z"))
      .as[(Long, Long)].collect().toMap
    assert(viaSql == viaCol)
  }

  /** Mean bbox semi-perimeter over equal-count buckets of `key`'s order —
    * the per-file spatial extent a range-partitioned writer would produce. */
  private def meanExtent(df: DataFrame, key: String, buckets: Int): Double =
    df.withColumn("b", ntile(buckets).over(
        org.apache.spark.sql.expressions.Window.orderBy(col(key), col("id"))))
      .groupBy("b")
      .agg(((max("x") - min("x")) + (max("y") - min("y"))).as("ext"))
      .agg(avg("ext")).as[Double].head()

  test("locality: z-ordered buckets are spatially FAR tighter than " +
      "insertion-ordered buckets (this is what file min/max pruning buys)") {
    val withZ = points.withColumn("z", geo.morton_key(col("x"), col("y"), 10))
    val zExt = meanExtent(withZ, "z", 64)
    val rowExt = meanExtent(withZ, "id", 64)
    // 64 buckets of a 1024^2 uniform grid: row order gives ~full-extent
    // bboxes (~2000); z-order gives compact blocks (~300). Assert the
    // structural gap, not the exact constants.
    assert(zExt < rowExt / 3, s"z=$zExt row=$rowExt")
    assert(rowExt > 1500, s"row-order bboxes unexpectedly tight: $rowExt")
  }

  test("a range-partitioned-by-zkey layout yields tight per-partition " +
      "bboxes — the partition-granularity form of footer min/max pruning") {
    val withZ = points.withColumn("z", geo.morton_key(col("x"), col("y"), 10))
    def partExtent(df: DataFrame): Double = df
      .withColumn("p", spark_partition_id())
      .groupBy("p")
      .agg(((max("x") - min("x")) + (max("y") - min("y"))).as("ext"))
      .agg(avg("ext")).as[Double].head()
    val zLayout = partExtent(withZ.repartitionByRange(16, col("z")))
    val hashLayout = partExtent(withZ.repartition(16, col("id")))
    assert(zLayout < hashLayout / 2, s"z=$zLayout hash=$hashLayout")
  }
}

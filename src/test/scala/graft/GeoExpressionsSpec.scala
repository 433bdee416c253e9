package graft

import graft.geo.{Geo, Cell}
import graft.functions.geo._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeoExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def lineDf = Seq(
    (1L, Seq(Seq(-73.80, 42.70), Seq(-73.79, 42.705), Seq(-73.78, 42.71)), -73.785, 42.712),
    (2L, Seq(Seq(-73.90, 42.60), Seq(-73.88, 42.60)), -73.89, 42.601)
  ).toDF("id", "line", "plon", "plat")
    .withColumn("line", $"line".cast("array<array<double>>"))

  test("geodesic_length_km matches kernel") {
    val rows = lineDf.select($"id", geodesic_length_km($"line").as("len"))
      .orderBy("id").collect()
    val l1 = Geo.lengthKm(Array(Array(-73.80, 42.70), Array(-73.79, 42.705), Array(-73.78, 42.71)))
    assert(rows(0).getDouble(1) == l1)
    assert(rows(1).getDouble(1) > 0)
  }

  test("haversine_km + locate_along + final_bearing + geoprox_key via DataFrame") {
    val r = lineDf.filter($"id" === 1)
      .select(
        haversine_km(lit(-73.8), lit(42.7), lit(-73.79), lit(42.705)).as("h"),
        locate_along($"line", $"plon", $"plat").as("loc"),
        final_bearing($"line").as("fb"),
        geoprox_key(lit(-73.8), lit(42.7)).as("gp"))
      .collect()(0)
    assert(r.getDouble(0) == Geo.haversineKm(-73.8, 42.7, -73.79, 42.705))
    assert(r.getDouble(1) > 0)
    assert(r.getInt(2) == Geo.lineFinalBearing(Array(Array(-73.80, 42.70), Array(-73.78, 42.71))))
    assert(r.getString(3) == Geo.geoProximityKey(-73.8, 42.7))
  }

  test("cell_encode / cell_ring / cell_cover_line") {
    val r = lineDf.filter($"id" === 1)
      .select(
        cell_encode($"plon", $"plat", lit(14)).as("cell"),
        size(cell_ring(cell_encode($"plon", $"plat", lit(14)), lit(1))).as("ringN"),
        size(cell_cover_line($"line", lit(14))).as("coverN"))
      .collect()(0)
    assert(r.getLong(0) == Cell.encode(-73.785, 42.712, 14))
    assert(r.getInt(1) == 8)
    assert(r.getInt(2) >= 1)
  }

  test("frechet/hausdorff distinguish direction") {
    val df = Seq((
      Seq(Seq(-73.8, 42.7), Seq(-73.75, 42.7), Seq(-73.7, 42.7)),
      Seq(Seq(-73.7, 42.7), Seq(-73.75, 42.7), Seq(-73.8, 42.7))
    )).toDF("a", "b")
      .select($"a".cast("array<array<double>>").as("a"), $"b".cast("array<array<double>>").as("b"))
    val r = df.select(frechet_km($"a", $"b").as("f"), hausdorff_km($"a", $"b").as("h")).collect()(0)
    assert(r.getDouble(0) > 5.0)  // reversed → Fréchet ≈ full length
    assert(r.getDouble(1) < 0.01) // same point set → Hausdorff ~0
  }

  test("SQL registration: functions usable from spark.sql") {
    register(spark)
    lineDf.createOrReplaceTempView("lines")
    val r = spark.sql(
      """SELECT id, geodesic_length_km(line) AS len,
        |       tile_x(plon, 12) AS tx, tile_y(plat, 12) AS ty,
        |       point_in_ring(array(array(-74.0d, 42.0d), array(-73.0d, 42.0d),
        |                           array(-73.0d, 43.0d), array(-74.0d, 43.0d),
        |                           array(-74.0d, 42.0d)), plon, plat) AS inside
        |FROM lines ORDER BY id""".stripMargin).collect()
    assert(r.length == 2)
    assert(r(0).getBoolean(4))
    assert(r(0).getLong(2) == Cell.tile(-73.785, 0, 12)._2)
  }

  test("expressions stay inside whole-stage codegen (parquet-backed plan)") {
    // a local Seq gets constant-folded to LocalTableScan; use a real scan
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(
        (lit(-73.8) + $"l_orderkey" % 100 / lit(10000.0)).as("lon"),
        (lit(42.7) + $"l_partkey" % 100 / lit(10000.0)).as("lat"))
    val q = li.select(
      haversine_km($"lon", $"lat", lit(-73.8), lit(42.7)).as("h"),
      cell_encode($"lon", $"lat", lit(14)).as("c"),
      geoprox_key($"lon", $"lat").as("gp"))
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [haversine_km"), plan)
    assert(q.count() > 0)
    // array-typed expression also executes inside a codegen'd projection
    val q2 = li.select(geodesic_length_km(
      array(array($"lon", $"lat"), array($"lon" + 0.01, $"lat" + 0.01))).as("len"))
    assert(q2.queryExecution.executedPlan.toString.contains("*(1) Project [geodesic_length_km"))
    assert(q2.agg(min($"len")).collect()(0).getDouble(0) > 0)
  }

  test("point_along / line_slice_along / nearest_point_on_line round-trip") {
    val r = lineDf.filter($"id" === 1).select(
      point_along($"line", geodesic_length_km($"line") / 2).as("mid"),
      geodesic_length_km(line_slice_along($"line", lit(0.0), geodesic_length_km($"line") / 2)).as("halfLen"),
      geodesic_length_km($"line").as("len"),
      nearest_point_on_line($"line", $"plon", $"plat").as("np"))
      .collect()(0)
    assert(math.abs(r.getDouble(1) - r.getDouble(2) / 2) < 1e-9)
    val np = r.getSeq[Double](3)
    assert(np.length == 4 && np(2) >= 0 && np(3) >= 0)
  }
}

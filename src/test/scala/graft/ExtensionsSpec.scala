package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  // getOrCreate() may return a session created by another suite (where
  // withExtensions is silently ignored) — attach the rule via the public
  // experimental hook, which works on an existing session.
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.experimental.extraOptimizations ++= Seq(graft.plans.SpatialFilterRewrite)
    s
  }

  import spark.implicits._

  private def ringCol = {
    // a box around half the derived lattice
    array(
      array(lit(-73.79995), lit(42.70005)), array(lit(-73.79505), lit(42.70005)),
      array(lit(-73.79505), lit(42.70495)), array(lit(-73.79995), lit(42.70495)),
      array(lit(-73.79995), lit(42.70005)))
  }

  private def geoms = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    .select(
      array(array(lit(-73.8) + $"l_orderkey" % 100 / 10000.0,
                  lit(42.7) + $"l_partkey" % 100 / 10000.0)).as("geom"),
      $"l_orderkey", $"l_linenumber")

  test("within_ring filter gets the cell-cover InSet prefilter") {
    val q = geoms.filter(graft.functions.geo.within_ring($"geom", ringCol))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("INSET") || optimized.contains("inset") ||
      optimized.toLowerCase.contains("cell_encode"), optimized)
    // exact predicate retained (refine step)
    assert(optimized.contains("within_ring"), optimized)
  }

  test("rewrite is idempotent: exactly ONE InSet after fixed-point optimization") {
    // extraOptimizations runs as its own fixed-point batch: a non-idempotent
    // rule re-wraps every iteration until the max-iteration cap and stacks
    // duplicate InSet conjuncts (ADVICE r1: 100 duplicates per row)
    val q = geoms.filter(graft.functions.geo.within_ring($"geom", ringCol))
    val optimized = q.queryExecution.optimizedPlan
    val planStr = optimized.toString.toLowerCase
    val nInset = "inset".r.findAllIn(planStr).length
    assert(nInset == 1, s"expected exactly 1 InSet, got $nInset:\n$optimized")
    // and a further manual application is a no-op (true fixed point)
    val again = graft.plans.SpatialFilterRewrite(optimized)
    assert(again fastEquals optimized, s"rule not a fixed point:\n$again")
  }

  test("GraftExtensions registers without error on a fresh extensions object") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // would throw if the injection API shifted
    // the rule itself is exercised through extraOptimizations above; the
    // injected function surface is the same table geo.register exposes,
    // exercised through SQL below
    succeed
  }

  test("SQL function surface: every table entry parses, runs, and checks arity") {
    graft.functions.geo.register(spark)
    // one smoke evaluation through the SQL parser for a representative of
    // each arity (1, 2, 3, 4 args)
    val r = spark.sql(
      """SELECT round(haversine_km(0D, 0D, 0D, 1D), 3) AS hav,
        |  round(geodesic_length_km(array(array(0D, 0D), array(0D, 1D))), 3) AS len,
        |  round(locate_along(array(array(0D, 0D), array(0D, 1D)), 0D, 0.5D), 3) AS loc,
        |  cell_encode(0D, 0D, 8) AS cell,
        |  round(cosine_sim(array(1F, 0F), array(1F, 0F)), 6) AS cs
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == r.getDouble(1), r.toString) // both are 1° meridian arcs
    assert(math.abs(r.getDouble(2) - r.getDouble(0) / 2) < 1e-3, r.toString)
    assert(r.getDouble(4) == 1.0, r.toString)
    // every registered name resolves through the parser (arity-correct call
    // built from the table itself)
    graft.functions.geo.sqlFunctions.foreach { case (name, arity, _) =>
      val args = Seq.fill(arity)("NULL").mkString(", ")
      spark.sql(s"SELECT $name($args)") // analyzes without unresolved-function error
    }
    // wrong arity fails with the readable message, not a MatchError
    val e = intercept[Exception](spark.sql("SELECT haversine_km(1D, 2D)").collect())
    assert(e.getMessage.contains("expects 4 argument"), e.getMessage)
  }

  test("rewrite preserves semantics exactly") {
    val q = geoms.filter(graft.functions.geo.within_ring($"geom", ringCol))
      .select("l_orderkey", "l_linenumber")
    val withExt = q.collect().map(_.toString).sorted
    assert(withExt.nonEmpty)
    // recompute expected count via plain column logic (no extension needed
    // for correctness — the rule only adds a prefilter)
    val expected = geoms
      .filter($"geom"(0)(0) > -73.79995 && $"geom"(0)(0) < -73.79505 &&
        $"geom"(0)(1) > 42.70005 && $"geom"(0)(1) < 42.70495)
      .select("l_orderkey", "l_linenumber").collect().map(_.toString).sorted
    assert(withExt.sameElements(expected))
  }
}

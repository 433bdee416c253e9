package graft

import graft.functions.HistSketch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HistSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def estimates(vs: Seq[Long], q: Double, parts: Int = 4): Long =
    vs.toDF("v").repartition(parts)
      .agg(HistSketch.histSketch(col("v")).as("sk"))
      .select(HistSketch.quantile(col("sk"), q))
      .as[Long].collect().head

  test("one-sided log-resolution bound: estimate >= true quantile and " +
      "< 2x the true quantile (next power of two)") {
    val vs = (1L to 1000L)
    for (q <- Seq(0.5, 0.9, 0.99)) {
      val truth = vs((math.ceil(q * vs.length) - 1).toInt)
      val est = estimates(vs, q)
      assert(est >= truth, s"q=$q est=$est truth=$truth")
      assert(est < truth * 2, s"q=$q est=$est truth=$truth")
    }
  }

  test("merge is order/partitioning-insensitive; nulls ignored; " +
      "non-positive values land in bucket 0") {
    val vs = Seq(5L, 100L, 100000L, -7L, 0L)
    val a = estimates(vs, 0.5, parts = 1)
    val b = estimates(scala.util.Random.shuffle(vs), 0.5, parts = 7)
    assert(a == b)
    val withNulls = Seq[Option[Long]](Some(8L), None, Some(8L)).toDF("v")
      .agg(HistSketch.histSketch(col("v")).as("sk"))
      .select(aggregate(col("sk"), lit(0L), (x, y) => x + y),
        HistSketch.quantile(col("sk"), 1.0))
      .as[(Long, Long)].collect().head
    assert(withNulls == ((2L, 15L))) // two values, bucket 4 ub = 15
    // all non-positive → p50 = 0 (bucket 0's upper bound)
    assert(estimates(Seq(-3L, 0L), 0.5) == 0L)
  }

  test("int-typed inputs implicitly cast (no mid-task ClassCastException); " +
      "finer-than-basis-point q rejected loudly") {
    // IntegerType column through the declared LongType input
    val viaInt = (1 to 100).map(i => i).toDF("v")
      .agg(HistSketch.histSketch(col("v")).as("sk"))
      .select(HistSketch.quantile(col("sk"), 0.5))
      .as[Long].collect().head
    assert(viaInt == 63L) // p50 of 1..100 → bucket 6 ub
    val e = intercept[IllegalArgumentException](
      HistSketch.quantile(col("sk"), 0.12345))
    assert(e.getMessage.contains("granularity"), e.getMessage)
  }

  test("empty sketch answers -1") {
    val got = Seq.empty[Long].toDF("v")
      .agg(HistSketch.histSketch(col("v")).as("sk"))
      .select(HistSketch.quantile(col("sk"), 0.5))
      .as[Long].collect().head
    assert(got == -1L)
  }

  test("plans as ObjectHashAggregate with a partial pass (520-byte " +
      "buffers cross the shuffle, not rows)") {
    val df = (1 to 100).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "v")
      .groupBy("g").agg(HistSketch.histSketch(col("v")).as("sk"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_hist_sketch"), plan)
  }
}

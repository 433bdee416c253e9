package graft

import graft.functions.KmvSketch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def sketch(values: Seq[String], k: Int, parts: Int = 4)
      : (Long, Long, Long) = {
    val r = values.toDF("v").repartition(parts)
      .agg(KmvSketch.kmvDistinct(col("v"), k).as("sk"))
      .select(col("sk.sketch_size"), coalesce(col("sk.kth_hash"), lit(-1L)),
        col("sk.est_distinct"))
      .as[(Long, Long, Long)].collect().head
    r
  }

  test("below k the sketch IS the distinct set: exact count, null kth") {
    val vs = Seq("a", "b", "c", "a", "b", "a") // 3 distinct, k=8
    assert(sketch(vs, 8) == ((3L, -1L, 3L)))
  }

  test("estimate is within KMV error bounds on 500 distinct values (k=64)") {
    val vs = (1 to 500).map(i => s"value-$i") ++ (1 to 300).map(i => s"value-$i")
    val (size, kth, est) = sketch(vs, 64)
    assert(size == 64L && kth > 0L)
    // stddev ≈ n/sqrt(k) = 500/8 ≈ 62; allow 4 sigma
    assert(math.abs(est - 500L) < 250, s"est=$est")
  }

  test("order- and parallelism-insensitive: same sketch at 1 and 13 " +
      "partitions, shuffled input") {
    val vs = (1 to 200).map(i => s"doc-$i")
    val a = sketch(vs, 16, parts = 1)
    val b = sketch(scala.util.Random.shuffle(vs), 16, parts = 13)
    assert(a == b)
  }

  test("nulls are ignored, duplicates collapse by hash") {
    val df = Seq(Some("x"), None, Some("x"), Some("y"), None)
      .toDF("v")
    val r = df.agg(KmvSketch.kmvDistinct(col("v"), 4).as("sk"))
      .select(col("sk.sketch_size"), col("sk.est_distinct"))
      .as[(Long, Long)].collect().head
    assert(r == ((2L, 2L)))
  }

  test("the hash matches the SQL md5-prefix contract exactly") {
    // kth at k == n_distinct boundary: with k=2 over {p, q} the kth hash
    // is the larger of the two md5-prefix values — computable in SQL
    val (size, kth, _) = sketch(Seq("p", "q"), 2)
    assert(size == 2L)
    val want = spark.sql(
      """SELECT greatest(conv(substr(md5('p'),1,15),16,10),
        |                conv(substr(md5('q'),1,15),16,10))""".stripMargin)
      .collect().head.getString(0).toLong
    assert(kth == want)
  }

  test("partial aggregation: the plan is ObjectHashAggregate with a " +
      "partial pass (sketch crosses the shuffle, not the rows)") {
    val df = (1 to 100).map(i => (s"g${i % 3}", s"v$i")).toDF("g", "v")
      .groupBy("g").agg(KmvSketch.kmvDistinct(col("v"), 8).as("sk"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_kmv_distinct"), plan)
  }

  test("SQL surface: kmv_distinct(x, k) after register()") {
    graft.functions.geo.register(spark)
    Seq("a", "b", "c").toDF("v").createOrReplaceTempView("kmv_in")
    val r = spark.sql(
      "SELECT kmv_distinct(v, 8).est_distinct AS e FROM kmv_in")
      .as[Long].collect().head
    assert(r == 3L)
  }

  test("hashes field: ascending bottom-k, size == sketch_size, last == kth") {
    val vs = (1 to 100).map(i => s"h-$i")
    val (size, hashes, kth) = vs.toDF("v").repartition(5)
      .agg(KmvSketch.kmvDistinct(col("v"), 16).as("sk"))
      .select(col("sk.sketch_size"), col("sk.hashes"), col("sk.kth_hash"))
      .as[(Long, Seq[Long], Long)].collect().head
    assert(size == 16L && hashes.length == 16)
    assert(hashes == hashes.sorted)
    assert(hashes.last == kth)
  }

  test("sketch algebra recovers EXACT Jaccard when k covers the union " +
      "(below-k sketches are the sets themselves)") {
    // |A|=30, |B|=30, |A∩B|=10, |A∪B|=50; k=64 > 50 → union bottom-k is
    // the whole union and k_intersect/union_k is exactly 10/50
    val a = ((1 to 20).map(i => s"onlyA-$i") ++ (1 to 10).map(i => s"both-$i"))
    val b = ((1 to 20).map(i => s"onlyB-$i") ++ (1 to 10).map(i => s"both-$i"))
    def hs(vs: Seq[String]) = vs.toDF("v")
      .agg(KmvSketch.kmvDistinct(col("v"), 64).as("sk"))
      .select(col("sk.hashes")).as[Seq[Long]].collect().head
    val (ha, hb) = (hs(a), hs(b))
    val union = (ha ++ hb).distinct.sorted.take(64)
    val kIntersect = union.count(h => ha.contains(h) && hb.contains(h))
    assert(union.length == 50)
    assert(kIntersect == 10)
  }
}

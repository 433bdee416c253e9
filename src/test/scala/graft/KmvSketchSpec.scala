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

  test("non-string child fails at ANALYSIS with a readable message, not a " +
    "mid-task ClassCastException") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L, 2L).toDF("v")
        .agg(KmvSketch.kmvDistinct(col("v"), 4)).collect()
    }
    assert(e.getMessage.contains("string column"))
  }

  test("pairOverlap: candidate-pair table and maxPairs bound the O(S^2) " +
    "pair space; values match the unrestricted run") {
    val docs = Seq(("s1", "a b c"), ("s2", "a b d"),
      ("s3", "x y z"), ("s4", "p q r")).toDF("source", "text")
    val sk = docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source")
      .agg(KmvSketch.kmvDistinct(col("w"), 16).as("sk"))
      .select(col("source"), col("sk.hashes").as("hs"))
      .cache()
    val full = KmvSketch.pairOverlap(sk, "source", "hs", 16).cache()
    assert(full.count() == 6) // C(4,2)
    // k=16 covers every union, so the estimate is EXACT Jaccard
    val j12 = full.filter(col("source_a") === "s1" && col("source_b") === "s2")
      .select("jaccard_bp").as[Long].head()
    assert(j12 == 5000L) // |{a,b}| / |{a,b,c,d}| = 2/4
    // pair table: unordered, non-canonical order and a self-pair tolerated
    val pairs = Seq(("s1", "s2"), ("s3", "s1"), ("s2", "s2"))
      .toDF("source_a", "source_b")
    val filtered = KmvSketch.pairOverlap(sk, "source", "hs", 16,
      pairs = Some(pairs))
    val want = full.filter(
      (col("source_a") === "s1" && col("source_b") === "s2") ||
      (col("source_a") === "s1" && col("source_b") === "s3"))
    assert(filtered.collect().toSet == want.collect().toSet)
    // hard cap: a subset of the full output, exactly maxPairs rows
    val capped = KmvSketch.pairOverlap(sk, "source", "hs", 16,
      maxPairs = Some(2L))
    assert(capped.count() == 2)
    assert(capped.collect().toSet.subsetOf(full.collect().toSet))
  }

}

package graft

import graft.functions.Bloom
import graft.operators.BloomJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // candidates: 400 keys, of which those ending 0..4 were "seen" before;
  // one null key rides along to pin the null-matches-nothing rule
  private def candidates = spark.range(400)
    .select(col("id"), concat(lit("key-"), col("id")).as("k"))
    .unionByName(Seq((-1L, null: String)).toDF("id", "k"))
  private def seen = spark.range(400)
    .where(col("id") % 10 < 5)
    .select(concat(lit("key-"), col("id")).as("sk"))

  test("bloom-pruned anti-join is row-identical to the plain left anti " +
      "(false positives removed, null key kept)") {
    val pruned = BloomJoin.antiJoin(candidates, "k", seen, "sk", 1024, 2)
      .select("id").as[Long].collect().sorted
    val plain = candidates.join(seen, col("k") === col("sk"), "left_anti")
      .select("id").as[Long].collect().sorted
    assert(pruned.sameElements(plain))
    assert(pruned.contains(-1L)) // the null-key row is guaranteed-new
    assert(pruned.length == 201)
  }

  test("same-named key columns on both sides resolve (the natural url-vs-" +
      "url call) — no ambiguous-reference failure") {
    val bigSame = candidates.withColumnRenamed("k", "url")
    val seenSame = seen.withColumnRenamed("sk", "url")
    val pruned = BloomJoin.antiJoin(bigSame, "url", seenSame, "url", 1024, 2)
      .select("id").as[Long].collect().sorted
    val plain = candidates.join(seen, col("k") === col("sk"), "left_anti")
      .select("id").as[Long].collect().sorted
    assert(pruned.sameElements(plain))
  }

  test("no false negatives: every seen key is bloom-positive, at any " +
      "sketch size") {
    for (m <- Seq(64, 256, 4096)) {
      val sketch = seen.agg(Bloom.bloomBuild(col("sk"), m, 3).as("bf"))
      val misses = seen.crossJoin(broadcast(sketch))
        .where(!Bloom.mightContain(col("bf"), col("sk"), m, 3))
        .count()
      assert(misses == 0L, s"false negative at m=$m")
    }
  }

  test("the sketch is a pure function of the input set: any " +
      "partitioning/order builds the identical bit array") {
    def build(df: org.apache.spark.sql.DataFrame) =
      df.agg(Bloom.bloomBuild(col("sk"), 512, 2)).as[Seq[Long]].head()
    val a = build(seen)
    val b = build(seen.repartition(7, col("sk")))
    val c = build(seen.orderBy(desc("sk")).coalesce(1))
    val d = build(seen.unionAll(seen)) // duplicates are idempotent
    assert(a == b && a == c && a == d)
  }

  test("guaranteed-new branch carries no shuffle join: the only join in " +
      "its plan is the one-row broadcast") {
    val sketch = seen.agg(Bloom.bloomBuild(col("sk"), 1024, 2).as("bf"))
    val neg = candidates.crossJoin(broadcast(sketch))
      .where(!coalesce(Bloom.mightContain(col("bf"), col("k"), 1024, 2), lit(false)))
    val plan = neg.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      plan)
  }

  test("fp rate is in the expected band for m/n bits per key (and the " +
      "probe expression agrees with the JVM-side bit set)") {
    // 200 seen keys into 2048 bits, k=2: fill = 1-exp(-400/2048) ~ 0.177,
    // fp ~ 0.031 — the disjoint probe set of 10k keys should see roughly
    // 313 positives; a generous band guards the hash contract, not luck
    val sk = seen.agg(Bloom.bloomBuild(col("sk"), 2048, 2).as("bf"))
    val probes = spark.range(10000)
      .select(concat(lit("other-"), col("id")).as("p"))
    val fp = probes.crossJoin(broadcast(sk))
      .where(Bloom.mightContain(col("bf"), col("p"), 2048, 2))
      .count()
    assert(fp > 100 && fp < 700, s"fp=$fp outside the plausible band")
  }

  test("non-string child fails at ANALYSIS with a readable message") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L, 2L).toDF("v")
        .agg(graft.functions.Bloom.bloomBuild(col("v"), 1024, 4)).collect()
    }
    assert(e.getMessage.contains("string column"))
  }

}

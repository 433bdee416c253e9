package graft

import graft.functions.CountMin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CountMinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def estimates(values: Seq[String], probes: Seq[String],
      depth: Int = 4, width: Int = 512, parts: Int = 4): Map[String, Long] = {
    val sk = values.toDF("v").repartition(parts)
      .agg(CountMin.countMin(col("v"), depth, width).as("sk"))
    probes.toDF("p").crossJoin(broadcast(sk))
      .select(col("p"), CountMin.probe(col("sk"), col("p"), depth, width).as("e"))
      .as[(String, Long)].collect().toMap
  }

  test("small vocabularies count exactly; estimates never underestimate") {
    val vs = Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val truth = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = estimates(vs, truth.keys.toSeq)
    truth.foreach { case (w, n) =>
      assert(est(w) >= n, s"$w underestimated: ${est(w)} < $n")
    }
    // 11 tokens into 4x512 buckets: collisions are (provably for this
    // fixed input) absent, so the estimate is exact
    assert(est == truth)
  }

  test("additive error stays within the CMS bound on 5000 tokens") {
    val vs = (1 to 5000).map(i => s"tok-${i % 800}") // 800 distinct
    val probes = (0 until 800 by 37).map(i => s"tok-$i")
    val truth = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = estimates(vs, probes, depth = 4, width = 256)
    probes.foreach { p =>
      assert(est(p) >= truth(p))
      // classic bound: overestimate <= 2n/w with prob 1-(1/2)^d; allow 4x
      assert(est(p) - truth(p) <= 4 * 2 * 5000 / 256, s"$p: ${est(p)} vs ${truth(p)}")
    }
  }

  test("merge is elementwise: sketch invariant under partitioning") {
    val vs = (1 to 2000).map(i => s"w${i % 97}")
    val a = estimates(vs, Seq("w0", "w13", "w96"), parts = 1)
    val b = estimates(vs, Seq("w0", "w13", "w96"), parts = 16)
    assert(a == b)
  }

  test("update's digest-slice buckets equal the SQL md5-substring contract") {
    // a single token: its own estimate is 1 only if update() and probe()
    // (the conv(substr(md5...)) form) land in the SAME buckets of every row
    val est = estimates(Seq("cross-check-token"), Seq("cross-check-token"))
    assert(est("cross-check-token") == 1L)
  }

  test("probing a never-seen value yields the pure-collision floor >= 0") {
    val vs = Seq.fill(10)("present")
    val est = estimates(vs, Seq("absent-token"))
    assert(est("absent-token") >= 0L)
  }

  test("non-string child fails at ANALYSIS with a readable message") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L, 2L).toDF("v")
        .agg(graft.functions.CountMin.countMin(col("v"), 4, 512)).collect()
    }
    assert(e.getMessage.contains("string column"))
  }

}

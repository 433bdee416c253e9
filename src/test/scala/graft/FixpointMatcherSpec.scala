package graft

import graft.operators.{ConflationPipeline, FixpointMatcher}
import graft.operators.FixpointMatcher.MatchPass
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FixpointMatcherSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private lazy val feats = ConflationPipeline.features(
    ConflationPipeline.pages(spark, 300, 30), 30).cache()
  private lazy val refs = ConflationPipeline.references(spark, 30).cache()

  test("retry passes recover features a strict first pass misses") {
    // pass 1 absurdly strict (1 m) → most features unmatched; pass 2 normal
    val strictOnly = FixpointMatcher.matchWithRetries(feats, refs,
      Seq(MatchPass(0.001, densifyGeometry = false)))
    val withRetry = FixpointMatcher.matchWithRetries(feats, refs,
      Seq(MatchPass(0.001, densifyGeometry = false),
        MatchPass(0.025, densifyGeometry = false)))
    val strictIds = strictOnly.select("targetMapId").distinct().count()
    val retryIds = withRetry.select("targetMapId").distinct().count()
    assert(retryIds > strictIds, s"retry $retryIds vs strict $strictIds")
    // second-pass rows are stamped with their iteration id
    assert(withRetry.filter(col("matchIterationId") === 1).count() > 0)
  }

  test("fixpoint terminates on no-progress and never rematches a matched feature") {
    val out = FixpointMatcher.matchWithRetries(feats, refs)
    // each feature id appears with exactly ONE iteration id
    val multi = out.groupBy("targetMap", "targetMapId")
      .agg(countDistinct("matchIterationId").as("n"))
      .filter(col("n") > 1)
    assert(multi.count() == 0)
    // coverage at least as good as the single-pass matcher
    val single = ConflationPipeline.matches(
      ConflationPipeline.matchCandidates(feats, refs))
    assert(out.select("targetMapId").distinct().count() >=
      single.select("targetMapId").distinct().count())
  }
}

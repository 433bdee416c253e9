package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan discipline: the plans we ship are the plans we want —
  * filters reach the parquet scan, column pruning works, small sides
  * broadcast, custom expressions stay inside whole-stage codegen. */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("filter + projection push down to the parquet scan (q14 plan)") {
    val plan = SparkEntry.queries("q14_filter_project")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(p_size,15)") &&
      plan.contains("StringContains(p_type,PROMO)"), plan)
    // column pruning: scan reads only the 3 needed columns
    assert(plan.contains("ReadSchema: struct<p_partkey:bigint,p_brand:string,p_type:string,p_size:int>"), plan)
  }

  test("embedding near-dup self-candidates join on buckets, never cross") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val plan = graft.operators.Similarity.lshSelfCandidates(
      SmokeWorld.nearDupCorpus(emb), "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("__b"), plan)
  }

  test("restriction re-anchoring is two equi-joins, never a cross product") {
    val segs = graft.operators.ConflationPipeline.run(spark, 100, 10)
    val plan = graft.operators.Restrictions.reanchor(
      graft.operators.ConflationPipeline.restrictions(spark, 10), segs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("smoke-world consumers plan against a truncated lineage") {
    // the conflation cache nests four persisted subtrees; without lineage
    // truncation every downstream query re-analyzes a 19k-line plan
    SmokeWorld(spark).segments.count()
    val plan = SparkEntry.queries("q43_output_projection")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.length < 300,
      s"plan blew up: ${plan.length} chars / ${plan.linesIterator.length} lines")
  }

  test("3-way join broadcasts the small dimension tables (q03 plan)") {
    val plan = SparkEntry.queries("q03_join3")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("central join aggregates partially before the shuffle (q01/q04 plans)") {
    val p1 = SparkEntry.queries("q01_agg")(spark, dir)
      .queryExecution.executedPlan.toString
    // two HashAggregates = map-side partial + final (partial_sum present)
    assert(p1.contains("partial_sum"), p1)
    val p4 = SparkEntry.queries("q04_central_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p4.contains("CartesianProduct"), p4)
  }

  test("geo expressions fuse into whole-stage codegen in driver queries (q15)") {
    val plan = SparkEntry.queries("q15_haversine")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(plan.contains("haversine_km"), plan)
  }

  test("conflation candidate join is an equi-join on cells, never a cross product") {
    val feats = graft.operators.ConflationPipeline.features(
      graft.operators.ConflationPipeline.pages(spark, 100, 10), 10)
    val refs = graft.operators.ConflationPipeline.references(spark, 10)
    val plan = graft.operators.ConflationPipeline.matchCandidates(feats, refs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("geocode winner semi-join is a shuffled hash join — no sort of page rows") {
    // Sorting the wide (url, text) page rows for a sort-merge join was the
    // most bus-contended stage of the 6.4M scaling run; the semi-join must
    // hash-build on the slim winner side instead.
    val plan = graft.operators.ConflationPipeline.features(
      graft.operators.ConflationPipeline.pages(spark, 100, 10), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin") && plan.contains("LeftSemi"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("minhash LSH pair join shuffles only slim columns (no shingle arrays)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the band self-join keys on (band, hash)
    assert(plan.contains("__b") && plan.contains("__h"), plan)
  }
}

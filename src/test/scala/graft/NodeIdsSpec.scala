package graft

import graft.operators.{ConflationPipeline, NodeIds}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NodeIdsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("node-id reconciliation: every vertex id resolved, synthetic ids deterministic") {
    val segments = ConflationPipeline.run(spark, 200, 20).cache()
    val rec = NodeIds.reconcile(segments).cache()
    // every vertex got an id
    assert(rec.filter(col("final_node_id").isNull).count() == 0)
    // identical rounded coords always map to the same id (J7 invariant)
    val multi = rec.groupBy("rlon", "rlat")
      .agg(countDistinct("final_node_id").as("n")).filter(col("n") > 1)
    assert(multi.count() == 0)
    // synthetic ids exist (splitters create non-vertex nodes) and are dense
    val synth = rec.filter(col("final_node_id").startsWith("synth_"))
      .select("final_node_id").distinct()
    assert(synth.count() > 0)
    // deterministic across re-runs
    val rec2 = NodeIds.reconcile(segments)
    assert(rec.exceptAll(rec2).count() == 0 && rec2.exceptAll(rec).count() == 0)
  }
}

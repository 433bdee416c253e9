package graft

/** One-query timing harness for perf A/B work:
  * `sbt "runMain graft.QBench <query> [reps]"` — repeats the query with the
  * SQL cache cleared between reps (the op-internal persists rebuild, so a
  * rep measures the operator, not the previous rep's cache). Env knobs as
  * [[Bench]]. The shared warm-up keeps JVM/codegen costs out of rep 1. */
object QBench extends App {
  private val name = args(0)
  private val reps = if (args.length > 1) args(1).toInt else 3
  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  private val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
  spark.sparkContext.setLogLevel("WARN")
  if (sys.env.contains("SPARK_GRAFT_STAGE_REPORT")) ScalingBench.addStageReport(spark)
  try SparkEntry.queries("q04_central_join")(spark, sfDir).count()
  catch { case _: Throwable => }
  (1 to reps).foreach { i =>
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    println(f"[qbench] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
  }
  spark.stop()
}

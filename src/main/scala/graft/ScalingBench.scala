package graft

import org.apache.spark.sql.SparkSession

/**
 * Two-cluster-size scaling evidence (BASELINE.json north_rule): run the
 * IDENTICAL conflation job on IDENTICAL deterministic input at N and 4N
 * parallelism (local[8] vs local[32] — the sandbox stand-in for N and 4N
 * executors per BASELINE.md). Each invocation measures ONE parallelism
 * level in a fresh JVM (same-JVM back-to-back sessions contaminate each
 * other through heap state); tools/scaling_bench.sh runs both and computes
 * efficiency = (T_N / T_4N) / 4.
 *
 * Usage: sbt "runMain graft.ScalingBench <cpus> [nPages] [nRoads]"
 */
object ScalingBench {

  def run(cpus: Int, nPages: Long, nRoads: Int): (Long, Long, Double) = {
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", cpus.toString)
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp")
    // on tmpfs, leaked shuffle dirs from killed runs are leaked RAM that
    // degrades this measurement — scaling runs are exclusive, so anything
    // already there is stale (same rationale as Bench.buildSession)
    if (localDir.startsWith("/dev/shm")) {
      val d = new java.io.File(localDir); d.mkdirs(); Bench.wipeStale(d)
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.inMemoryColumnarStorage.compressed",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_COMPRESS", "true"))
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try Bench.conflationThroughput(spark, nPages, nRoads)
    finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    // the JSON line below is f-interpolated; a comma-decimal default locale
    // would make it unparseable by the harness scripts
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = args(0).toInt
    val nPages = if (args.length > 1) args(1).toLong else 400000L
    val nRoads = if (args.length > 2) args(2).toInt else 16000
    // warm-up (JIT + codegen caches) at small scale, same parallelism
    run(cpus, 2000, 200)
    val (segs, tiles, sec) = run(cpus, nPages, nRoads)
    println(f"""{"cpus":$cpus,"n_pages":$nPages,"n_roads":$nRoads,""" +
      f""""segments":$segs,"tiles":$tiles,"sec":$sec%.2f,""" +
      f""""rows_per_sec":${segs / sec}%.1f,"tiles_per_sec":${tiles / sec}%.1f}""")
  }
}

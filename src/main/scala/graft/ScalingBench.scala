package graft

import org.apache.spark.sql.SparkSession

/**
 * Two-cluster-size scaling evidence (BASELINE.json north_rule): run the
 * IDENTICAL conflation job on IDENTICAL deterministic input at N and 4N
 * parallelism (local[8] vs local[32] — the sandbox stand-in for N and 4N
 * executors per BASELINE.md), report throughput at both plus
 * efficiency = (T_N_wall / T_4N_wall) / 4.
 *
 * Usage: sbt "runMain graft.ScalingBench [nPages] [nRoads]"
 */
object ScalingBench {

  def run(cpus: Int, nPages: Long, nRoads: Int): (Long, Long, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try Bench.conflationThroughput(spark, nPages, nRoads)
    finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 40000L
    val nRoads = if (args.length > 1) args(1).toInt else 1600
    // warm-up (JIT + codegen caches) at small scale so neither run pays it
    run(8, 2000, 200)
    val (s8, t8, sec8) = run(8, nPages, nRoads)
    val (s32, t32, sec32) = run(32, nPages, nRoads)
    require(s8 == s32 && t8 == t32, s"non-deterministic output: $s8/$s32 $t8/$t32")
    val eff = (sec8 / sec32) / 4.0
    println(f"""{"n_pages":$nPages,"n_roads":$nRoads,"segments":$s8,"tiles":$t8,""" +
      f""""sec_local8":$sec8%.2f,"sec_local32":$sec32%.2f,""" +
      f""""rows_per_sec_local8":${s8 / sec8}%.1f,"rows_per_sec_local32":${s8 / sec32}%.1f,""" +
      f""""tiles_per_sec_local8":${t8 / sec8}%.1f,"tiles_per_sec_local32":${t8 / sec32}%.1f,""" +
      f""""scaling_efficiency":$eff%.3f}""")
  }
}

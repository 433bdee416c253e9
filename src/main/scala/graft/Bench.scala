package graft

import graft.operators.ConflationPipeline
import org.apache.spark.sql.SparkSession

/**
 * Driver-run benchmark: every SparkEntry query on SPARK_GRAFT_SF_DIR, plus
 * the north-star throughput numbers (conflated segment-match rows/sec and
 * tiles/sec) on the deterministic synthetic world. One JSON line on stdout.
 *
 * Env knobs: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default
 * 4), SPARK_GRAFT_BENCH_PAGES / _ROADS (conflation scale; default 40k/1600).
 */
object Bench {

  def buildSession(cpus: String): SparkSession = {
    // shuffle on tmpfs when available: local-mode shuffle IO otherwise
    // serializes on the single disk (see BENCH.md)
    val localDir =
      if (new java.io.File("/dev/shm").isDirectory) {
        val d = new java.io.File("/dev/shm/spark-local"); d.mkdirs()
        d.getAbsolutePath
      } else "/tmp"
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // a broadcast build side over a big cached stage can legitimately
      // take minutes at low parallelism / large SF
      .config("spark.sql.broadcastTimeout", "1800")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** Run the conflation pipeline once; returns (segments, tiles, seconds). */
  def conflationThroughput(spark: SparkSession, nPages: Long, nRoads: Int): (Long, Long, Double) = {
    val t0 = System.nanoTime()
    val segs = ConflationPipeline.run(spark, nPages, nRoads)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSegs = segs.count()
    val nTiles = ConflationPipeline.tiles(segs, 12).count()
    val sec = (System.nanoTime() - t0) / 1e9
    segs.unpersist(blocking = false)
    (nSegs, nTiles, sec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "400000").toLong
    val nRoads = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROADS", "16000").toInt
    val spark = buildSession(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // unmeasured warm-up: JVM/codegen/parquet-footer costs otherwise bill
    // entirely to whichever query runs first (q01 ran 35 s vs its same-shape
    // twin's 13 s in BENCH_r01)
    try SparkEntry.queries("q04_central_join")(spark, sfDir).count()
    catch { case _: Throwable => }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val (nSegs, nTiles, confSec) = conflationThroughput(spark, nPages, nRoads)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + confSec
    val conf = f""""conflation":{"pages":$nPages,"roads":$nRoads,"segments":$nSegs,""" +
      f""""tiles":$nTiles,"sec":$confSec%.3f,""" +
      f""""segment_rows_per_sec":${nSegs / confSec}%.1f,""" +
      f""""tiles_per_sec":${nTiles / confSec}%.1f}"""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir",$conf}""")
    spark.stop()
  }
}

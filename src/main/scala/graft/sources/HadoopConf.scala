package graft.sources

import org.apache.spark.sql.SparkSession

/**
 * Ship the session's hadoop configuration to executors: `Configuration` is
 * not `Serializable`, so the driver flattens it to a KV seq (captured by the
 * task closure) and each executor partition rebuilds it. Shared by every
 * sink/scan that opens a `FileSystem` inside `mapPartitions` (OsmPbf,
 * ShstTiles.writeTileset, TileScraper) — credentials/endpoint settings
 * (e.g. `spark.hadoop.fs.s3a.*`) survive the trip exactly once, here.
 */
object HadoopConf {

  /** Driver side: flatten the session's hadoopConfiguration. */
  def kvs(spark: SparkSession): Seq[(String, String)] = {
    val it = spark.sparkContext.hadoopConfiguration.iterator()
    val b = Seq.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }

  /** Executor side: rebuild a Configuration from the shipped KVs. */
  def build(kvs: Seq[(String, String)]): org.apache.hadoop.conf.Configuration = {
    val conf = new org.apache.hadoop.conf.Configuration()
    kvs.foreach { case (k, v) => conf.set(k, v) }
    conf
  }
}

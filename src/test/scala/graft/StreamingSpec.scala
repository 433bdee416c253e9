package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("streaming windowed counts equal the batch query on a bounded source") {
    val dir = "/root/testdata/sf0.001"
    val batchEvents = spark.read.parquet(s"$dir/events.parquet")
    // the file stream source wants a directory; restage the single file
    val tmp = java.nio.file.Files.createTempDirectory("streamevents").toString
    batchEvents.repartition(4).write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(batchEvents.schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp)
    val agg = StreamingOps.windowedEventCounts(stream)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("winout")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("winout")
      .select("hour_start", "event_type", "n", "total_value")
    val batch = StreamingOps.windowedEventCounts(
      spark.read.parquet(s"$dir/events.parquet"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stream-static spatial candidate join matches the batch matcher's pairs") {
    val nRoads = 10
    val pages = graft.operators.ConflationPipeline.pages(spark, 60, nRoads).toDF()
    val tmp = java.nio.file.Files.createTempDirectory("streamcand").toString
    pages.select("url", "text").repartition(3).write.mode("overwrite").parquet(tmp)
    val refs = graft.operators.ConflationPipeline.references(spark, nRoads).cache()
    val stream = spark.readStream
      .schema(pages.select("url", "text").schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp)
    val cand = StreamingOps.streamingCandidates(stream, refs, nRoads)
    val q = cand.writeStream.outputMode("append")
      .format("memory").queryName("candout").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("candout")
      .select("feature_id", "ref_id").distinct()
      .as[(String, String)].collect().toSet
    // batch twin: the pipeline's candidate join (pre-refinement pairs)
    val feats = graft.operators.ConflationPipeline.features(
      graft.operators.ConflationPipeline.pages(spark, 60, nRoads), nRoads)
    val batch = graft.operators.ConflationPipeline.matchCandidates(feats, refs)
      .select("feature_id", "ref_id").distinct()
      .as[(String, String)].collect().toSet
    assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")
    assert(batch.nonEmpty)
  }

  test("streaming first-writer-wins dedup emits each url exactly once") {
    // duplicate the pages stream 3× — dedup must still emit each url once
    val pages = graft.operators.ConflationPipeline.pages(spark, 50, 10).toDF()
    val tripled = pages.union(pages).union(pages).select("url", "text")
    val tmp = java.nio.file.Files.createTempDirectory("streamdedup").toString
    tripled.repartition(3).write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(tripled.schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp)
    val deduped = StreamingOps.streamingDedupByUrl(stream)
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedupout").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("dedupout")
    assert(out.count() == 50)
    assert(out.select("url").distinct().count() == 50)
  }
}

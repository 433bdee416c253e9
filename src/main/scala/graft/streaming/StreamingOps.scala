package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming ingest surface (SURVEY.md §2.10). The reference's matcher is an
 * async-iterator micro-batcher with a matchBatchId stamped per row
 * (SharedStreetsMatchesAsyncIterator.js:7,56-99); Structured Streaming's
 * micro-batches are the native analog. `warc_ts` (input_hint) is the event
 * time for watermarked windows.
 */
object StreamingOps {

  /** Tumbling-window event aggregation with a watermark; same result as the
    * batch query when the source is bounded. */
  def windowedEventCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      // group by the window STRUCT (not a cast of it): append-mode watermark
      // propagation requires the grouping key to be the watermarked window
      // column itself; hour_start projects out afterwards
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
      .select(col("window.start").cast("long").as("hour_start"),
        col("event_type"), col("n"), col("total_value"))

  /**
   * Stream-static spatial candidate join — the continuous-ingest shape of
   * the pipeline's G10 matcher: unbounded pages geocode to features whose
   * covering cells equi-join the STATIC reference network (small, slowly
   * changing, broadcastable per micro-batch). Emits (feature_id, ref_id)
   * candidate pairs per batch; duplicate pairs from multi-cell overlap are
   * collapsed per micro-batch downstream (a global streaming `distinct`
   * would grow unbounded state — the batch matcher's distinct covers it on
   * replay/compaction).
   */
  def streamingCandidates(pages: DataFrame,
      refs: org.apache.spark.sql.Dataset[graft.model.ShstReference],
      nRoads: Int): DataFrame = {
    import graft.functions.geo._
    val spark = pages.sparkSession
    import spark.implicits._
    val feats = pages.select(col("url"), col("text")).as[(String, String)]
      .map { case (u, t) => graft.synth.Synth.geocode(u, t, nRoads) }
    val fCells = feats.toDF().select(col("id").as("feature_id"),
      explode(cell_cover_line(col("geometry"),
        lit(graft.operators.ConflationPipeline.CellLevel))).as("cell"))
    val rCells = refs.toDF().select(col("shstReferenceId").as("ref_id"),
      explode(cell_cover_line(col("coordinates"),
        lit(graft.operators.ConflationPipeline.CellLevel))).as("cell"))
    fCells.join(rCells, Seq("cell")).select("feature_id", "ref_id")
  }

  /**
   * The per-micro-batch lineage commit behind [[streamingCandidatesToLineage]]
   * — exposed because it IS the crash-recovery contract: Structured
   * Streaming re-executes an uncommitted batch with the SAME batchId on
   * restart, and the unit key (batchId × ref-hash bucket) makes that replay
   * idempotent through the [[Lineage]] ledger — already-committed buckets
   * anti-join away, a partially-committed batch finishes exactly the
   * missing buckets, and result partitions are dynamic-overwritten, never
   * appended twice. Returns rows newly committed (0 on a full replay).
   */
  def commitCandidateBatch(batch: DataFrame, batchId: Long, resultPath: String,
      ledgerPath: String, nBuckets: Int = 8): Long = {
    val work = batch.dropDuplicates("feature_id", "ref_id")
      .withColumn("unit_key", concat(lit(s"b${batchId}_"),
        pmod(xxhash64(col("ref_id")), lit(nBuckets))))
    graft.operators.Lineage.runIncremental(work, "unit_key", resultPath,
      ledgerPath, runId = s"stream_b$batchId")(identity)
  }

  /**
   * §2.10 ∘ north-rule checkpointing, end-to-end: the stream-static
   * candidate join committed through the per-partition lineage ledger via
   * foreachBatch. Kill the query mid-stream and restart with the same
   * checkpoint/result/ledger paths: the final match table is byte-identical
   * to an uninterrupted run (StreamingSpec asserts this).
   */
  def streamingCandidatesToLineage(pages: DataFrame,
      refs: org.apache.spark.sql.Dataset[graft.model.ShstReference],
      nRoads: Int, resultPath: String, ledgerPath: String,
      checkpointPath: String, nBuckets: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streamingCandidates(pages, refs, nRoads).writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitCandidateBatch(batch, batchId, resultPath, ledgerPath, nBuckets)
        ()
      }
      .start()

  // ---- incremental WARC → snapshot-table ingest -------------------------

  /** Landing-file names already committed, carried in the snapshot
    * summary — the Iceberg-snapshot-summary analog — so the ingest ledger
    * and the data are ONE atomic manifest (no separate ledger to desync
    * from). */
  def snapIngestedFiles(spark: SparkSession, tableRoot: String): Set[String] =
    graft.sources.SnapTable.currentVersion(spark, tableRoot)
      .map(v => graft.sources.SnapTable.manifest(spark, tableRoot, v)
        .summary.split('\n').filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

  /**
   * Commit one micro-batch of landed `.warc.gz` files into a [[graft.sources.SnapTable]]
   * exactly once. `batch` is the binaryFile source frame (path, content).
   * The already-ingested file set rides in the CURRENT snapshot's summary;
   * fresh files are parsed by the [[graft.sources.Warc]] kernel
   * (distributed — the driver touches file NAMES only) and appended with
   * the updated set in the same atomic manifest. Crash anywhere and the
   * replayed batch sees either the old summary (re-appends, parent
   * manifest unchanged — the half-written data dir is orphaned, swept by
   * expire) or the new one (skips everything): never a duplicate row.
   * Single-writer per table root, like any streaming sink. Returns the
   * number of files newly committed.
   */
  def warcIngestBatch(batch: DataFrame, tableRoot: String): Int = {
    val spark = batch.sparkSession
    import spark.implicits._
    def base(p: String): String = p.substring(p.lastIndexOf('/') + 1)
    val ingested = snapIngestedFiles(spark, tableRoot)
    // file PATHS only — per-batch metadata, bounded by the source's
    // maxFilesPerTrigger, never record data. The ledger keys on the FULL
    // path: a recursive landing dir can legally hold day1/part-0.warc.gz
    // and day2/part-0.warc.gz, and a basename ledger would silently skip
    // the second (basenames remain only as the warc_file display/CDX key)
    val files = batch.select("path").as[String].distinct().collect()
    val fresh = files.filterNot(ingested.contains)
    if (fresh.isEmpty) return 0
    val rows = batch
      .where(col("path").isin(fresh.toSeq: _*))
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val gz = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try graft.sources.Warc.parseStream(gz, base(p)) finally gz.close()
      }
      .where(col("warc_type") === "response")
      .select("url", "warc_ts", "html", "warc_file")
    graft.sources.SnapTable.append(rows, tableRoot, statsCols = Seq("url"),
      summary = (ingested ++ fresh).toSeq.sorted.mkString("\n"))
    fresh.length
  }

  /**
   * Continuous WARC ingest: watch a landing directory for `.warc.gz`
   * files (the shape a crawler delivers), parse each through the Warc
   * kernel, and land pages in a snapshot table with one atomic commit per
   * micro-batch — restartable from the checkpoint AND idempotent beyond
   * it via the summary-carried file ledger (kill −9 between the table
   * commit and the stream checkpoint replays the batch into a no-op).
   * Readers see snapshot-isolated versions throughout; `asOf` time travel
   * works per micro-batch.
   */
  def warcIngestToSnap(spark: SparkSession, landingDir: String, tableRoot: String,
      checkpointPath: String): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz")
      // binaryFile's fixed schema, stated explicitly (streaming file
      // sources don't infer)
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .load(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointPath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        warcIngestBatch(batch, tableRoot)
        ()
      }
      .start()

  case class UrlEvent(url: String, text: String)
  case class SeenState(firstText: String)

  /** Streaming first-writer-wins dedup by url (the reference's PK-conflict
    * swallow, §5.1.8) via mapGroupsWithState: emits a row only the first
    * time a url is seen; later duplicates are dropped. */
  def streamingDedupByUrl(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col("url"), col("text")).as[UrlEvent]
      .groupByKey(_.url)
      .flatMapGroupsWithState[SeenState, UrlEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (url: String, rows: Iterator[UrlEvent], state: GroupState[SeenState]) =>
          if (state.exists) Iterator.empty
          else {
            val first = rows.next()
            state.update(SeenState(first.text))
            Iterator(first)
          }
      }.toDF()
  }
}

package graft

import java.nio.file.{Files, Paths}

/** Writes `PLANS.md`: the formatted physical plans of the scale-critical
  * queries, for plan-shape review (pushdown reaching the scan, partial
  * aggregation, broadcast-vs-SMJ choices, WholeStageCodegen spans, absence
  * of cartesian products / hot-key windows).
  *
  * Usage: `sbt "runMain graft.PlanDump [sfDir] [outFile]"`.
  */
object PlanDump {

  private val Targets: Seq[(String, String)] = Seq(
    "q14_filter_project" -> "P3: filter/projection pushdown — PushedFilters + pruned ReadSchema must reach the parquet scan",
    "q04_central_join" -> "J2 twin: central equi-join + partial aggregation (map-side combine before the shuffle)",
    "q26_minhash_lsh" -> "MinHash+LSH: zero-shuffle signature kernel, slim (id, band, key) self-join, estimate prefilter before exact verify",
    "q27_ngram_jaccard" -> "df-capped n-gram Jaccard: partial-agg df table + broadcast anti-join (NO window over the hot gram key); self-join reuses the cached hash partitioning",
    "q30_ann_lsh" -> "LSH ANN: bucket equi-join on slim ids, exact cosine (codegen'd CosineSim) only on candidates",
    "q31_knn_cells" -> "kNN cell-ring: cell equi-join + id-only distinct, geometry re-attached after; rank window partitioned by point",
    "q47_ann_ivf" -> "IVF ANN: probed inverted lists joined slim, no cross product",
    "q49_winnow_fingerprint" -> "winnowing: zero-shuffle array-HOF form (slice minima per row; no explode, no Exchange — the window form remains the oracle twin)",
    "q53_tile_scrape" -> "S6 scraper: declarative cover (explode → tile expr → partial-agg distinct) feeding the fetch mapPartitions; the only exchanges are the distinct's hash and the bounded fetch repartition",
    "q54_raster_tiles" -> "raster face: explode → pixel groupBy with map-side partial aggregation (the shuffle carries one row per LIT pixel, never per vertex); PNG encode+decode confined to a bounded 256×256 per-tile mapGroups",
    "q61_html_extract" -> "html_text: ONE codegen'd projection over the binary column (zero-copy scan of the page bytes; no regexp chain, no Exchange)",
    "q63_stratified_sample" -> "salted stratified top-k: the first window partitions by (stratum, salt) — no single-task hot stratum; the global-rank window only sees the ≤ salts×k survivors per stratum",
    "q64_sequence_pack" -> "sequence packing: exactly one Exchange (repartition by md5 shard) + in-partition sort feeding the streaming next-fit mapPartitions; no window, no group materialization",
    "q78_pagerank" -> "host-graph PageRank (final iteration shown): the static edge+degree side reuses one persisted hash partitioning; per iteration only the rank table shuffles (join by src, partial-agg groupBy dst) — contributions combine map-side, so a 10^7-in-link host receives partial sums, not rows",
    "q79_repeated_spans" -> "ExactSubstr spans: gram extraction is projection+posexplode (no shuffle); the >1 filter is a partial-agg groupBy(gram); flagged positions via LEFT SEMI join (linear in occurrences, AQE-splittable — no k² pair blow-up); the islands merge is a per-document window bounded by doc length",
    "q80_chunk_windows" -> "token-window chunker: pure projection + posexplode — ZERO Exchange anywhere; chunk identity is a function of (doc, position), so the plan is embarrassingly parallel at any scale",
    "q81_kmv_sketch" -> "KMV sketch aggregate: ObjectHashAggregate with a partial_kmv_distinct pass on the map side — the shuffle carries one ≤k-long buffer per group, never the rows; merge is bottom-k of the union",
    "q82_asof_join" -> "as-of join: the lead() window runs over the SNAPSHOT side only (small per key); the event stream meets it in an equi-join on the key with the interval range as residual — one row out per event, no window and no pair blow-up on the big side",
    "q83_cms_heavy_hitters" -> "count-min sketch: ObjectHashAggregate partial pass merges fixed 16 KB buffers per map partition (the shuffle never carries words); the probe side broadcasts the one-row sketch and evaluates element_at minima inline",
    "q84_bloom_prune" -> "bloom pruning: the seen side partial-aggregates into ONE m-bit buffer per map task (OR-merged), the candidate side meets it through a one-row BroadcastNestedLoopJoin and a codegen'd bit-test projection — the membership check itself costs zero shuffle; only the exactness join at the end exchanges rows",
    "q85_zorder_layout" -> "z-order layout key: pure projection (shift/and/add chain inside one WholeStageCodegen span) — ZERO Exchange; the caller pays only the range partitioning of the sorted write it already wanted",
    "q86_kmv_set_algebra" -> "kmv set algebra: the corpus is scanned ONCE to build per-source sketches (partial ObjectHashAggregate); every cross-source pair then combines two ≤k-long arrays in a broadcast self-join — pair cost is independent of corpus size, the property that makes 10^6-source overlap profiling feasible at all",
    "q87_priority_sample" -> "weighted priority sample: Spark pushes WindowGroupLimit partial limits below BOTH exchanges (same certified shape as q63), so the shuffle carries ≤ k rows per (stratum, salt) — a 10^11-row stratum costs its salt count, never one task",
    "q89_sessionize" -> "sessionization: ONE exchange on the key feeds both the lag/boundary window and the summary aggregation; partitions are bounded by a single key's event count — the honest shape for an inherently sequential-per-key op",
    "q90_hist_quantiles" -> "histogram quantile sketch: ObjectHashAggregate with a partial_hist_sketch map-side pass — 520-byte buffers cross the shuffle, never rows; the three quantile probes are pure projections folding the 65 counters")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outFile = if (args.length > 1) args(1) else "PLANS.md"
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the scale-critical queries\n\n")
    sb.append(s"Generated by `graft.PlanDump` over `$sfDir`. Things to check per plan\n")
    sb.append("are noted in each section header; regenerate after plan-affecting\n")
    sb.append("changes with `sbt \"runMain graft.PlanDump\"`.\n")
    Targets.foreach { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // run once so AQE finalizes the adaptive plan it would really execute
      df.count()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n$note\n\n```\n$formatted```\n")
    }
    // The conflation matcher subtree (not reachable through a SparkEntry
    // query — q40 reads the checkpointed smoke world): evidence that the
    // scoring stage is ONE fused match_summary projection behind the pair-key
    // repartition (skew spread), with no composed locate/slice/Hausdorff
    // chain, no per-pair window, and no match polyline materialized.
    locally {
      val h = SmokeWorld(spark)
      val scored = graft.operators.ConflationPipeline.scoredCandidates(
        graft.operators.ConflationPipeline.matchCandidates(h.features, h.refs))
      scored.count()
      val formatted = scored.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb.append("\n## conflation matcher (scoredCandidates subtree)\n\n")
      sb.append("G10 scoring: cell equi-join candidates → pair-key repartition " +
        "(hot-cell skew spread) → ONE fused match_summary projection (endpoint " +
        "projection + direction/overlap gates + slice walk + directed Hausdorff, " +
        "early-exit threshold; the slice polyline never materializes — only its " +
        "endpoints/length/bbox summary) → isnotnull filter. No window, no cartesian.\n\n")
      sb.append(s"```\n$formatted```\n")
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    println(s"[plandump] wrote $outFile")
    spark.stop()
  }
}

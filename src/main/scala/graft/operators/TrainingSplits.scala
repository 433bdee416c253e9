package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-set assembly operators: deterministic holdout splits, skew-safe
 * stratified sampling, and fixed-token-budget sequence packing — the three
 * ops that turn a deduped document corpus into model-ready shards.
 *
 * All three are deterministic functions of the data (md5-keyed, no RNG, no
 * Date.now), so reruns and resumed jobs assign every document identically —
 * the same property the lineage ledger relies on elsewhere.
 */
object TrainingSplits {

  /** md5-derived bucket in [0, buckets): the first 6 hex digits parsed as an
    * integer. md5 (not xxhash64) so external systems — and the DuckDB
    * oracles — can reproduce assignments from the key alone. */
  private def md5Bucket(key: Column, buckets: Int): Column =
    conv(substr(md5(key.cast("string")), lit(1), lit(6)), 16, 10)
      .cast("long") % buckets

  /**
   * Deterministic train/val/test split. Every row gains `bucket` (stable
   * hash bucket of the key) and `split` (the named slice whose cumulative
   * weight range contains the bucket). Zero shuffle, zero state: split
   * membership is a pure projection, so it survives any re-partitioning,
   * resume, or backfill without drift — the property that matters when the
   * holdout must stay clean across 10^12 documents and months of reruns.
   *
   * Weights must sum to 1; ranges are whole buckets (rounded cumulative),
   * so with the default 100 buckets weights are percent-granular.
   */
  def hashSplit(
      df: DataFrame,
      key: Column,
      weights: Seq[(String, Double)],
      buckets: Int = 100): DataFrame = {
    require(weights.nonEmpty, "hashSplit: at least one split")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"hashSplit: weights must sum to 1, got ${weights.map(_._2).sum}")
    val hi = weights.scanLeft(0.0)(_ + _._2).tail
      .map(w => math.round(w * buckets).toInt)
    val bucket = md5Bucket(key, buckets)
    val split = weights.map(_._1).zip(hi).init
      .foldRight(lit(weights.last._1): Column) { case ((name, h), acc) =>
        when(bucket < h, name).otherwise(acc)
      }
    df.withColumn("bucket", bucket).withColumn("split", split)
  }

  /**
   * Deterministic mixture (per-stratum rate) downsampling: keep each row
   * with its stratum's configured probability, decided by the row's md5
   * bucket — the "data mixing" op that rebalances source proportions
   * (upweight curated sources, downweight boilerplate-heavy crawls) before
   * training. Like [[hashSplit]] it is a zero-shuffle pure projection of
   * (key, stratum): membership never changes across reruns, resumes, or
   * repartitioning, and a row kept at rate r stays kept at any rate ≥ r
   * (buckets are nested), so raising a source's weight only ADDS documents
   * — incremental remixes don't churn the kept set.
   *
   * Strata absent from `rates` keep `defaultRate`. Rates are granular to
   * 1/buckets (default 1e-6).
   */
  def mixtureSample(
      df: DataFrame,
      key: Column,
      stratum: Column,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      buckets: Int = 1000000): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      s"mixtureSample: rates must be in [0,1], got $rates / $defaultRate")
    val bucket = md5Bucket(key, buckets)
    val threshold = rates.foldLeft(lit(math.round(defaultRate * buckets)): Column) {
      case (acc, (name, r)) =>
        when(stratum === name, lit(math.round(r * buckets))).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /**
   * Deterministic stratified top-k sample: exactly min(k, |stratum|) rows
   * per stratum, chosen and ranked by md5(key) — a fixed pseudo-random
   * order reproducible by any engine.
   *
   * Scale shape: a naive `row_number() OVER (PARTITION BY strata)` puts an
   * entire stratum in one task — strata are few and huge at corpus scale
   * (think lang='en' over Common Crawl), the classic hot-partition killer.
   * Instead rows are salted into `salts` sub-partitions, each sub-partition
   * keeps its local top-k, and only the ≤ salts×k survivors per stratum
   * enter the global ranking window. Every global top-k row has local rank
   * ≤ its global rank ≤ k in its own salt, so the survivor set provably
   * contains the global top-k — the result is EXACTLY the naive window's
   * (the q63 oracle grades the salted plan against the straight SQL form).
   */
  def stratifiedSample(
      df: DataFrame,
      strata: Seq[String],
      key: Column,
      k: Int,
      salts: Int = 64): DataFrame = {
    val salted = df
      .withColumn("__key", key.cast("string"))
      .withColumn("__ord", md5(col("__key")))
      .withColumn("__salt", pmod(xxhash64(col("__key")), lit(salts.toLong)))
    val local = Window
      .partitionBy((strata.map(col) :+ col("__salt")): _*)
      .orderBy(col("__ord"), col("__key"))
    val global = Window
      .partitionBy(strata.map(col): _*)
      .orderBy(col("__ord"), col("__key"))
    salted
      .withColumn("__lr", row_number().over(local)).filter(col("__lr") <= k)
      .withColumn("rn", row_number().over(global)).filter(col("rn") <= k)
      .drop("__ord", "__key", "__salt", "__lr")
  }

  /**
   * Deterministic WEIGHTED sample: priority sampling (Duffield, Lund,
   * Thorup, "Priority sampling for estimation of arbitrary subset sums",
   * JACM 2007). Each row gets priority = u / w, where u is a fixed
   * md5-derived uniform (no RNG — the same rerun/resume stability as every
   * split here) and w the row's weight; the k SMALLEST priorities per
   * stratum are a without-replacement sample whose inclusion probability
   * scales with weight — the quality-weighted mixture draw a training
   * pipeline wants ("sample 1M pages per language, preferring high-quality
   * ones") that [[stratifiedSample]]'s unweighted order can't express.
   *
   * Same salted two-level top-k shape as stratifiedSample — no giant
   * stratum ever occupies one task; the salted plan is provably identical
   * to the naive per-stratum window (survivor-set argument, see above).
   * Determinism across engines: u and w pass through IEEE double
   * conversion and one division, both exactly-rounded operations, so the
   * ORDER (all that matters) replays bit-identically in the q87 oracle.
   * Weights < 1 are clamped to 1.
   *
   * Adds `rn` (1-based weighted-sample rank within the stratum).
   */
  def prioritySample(
      df: DataFrame,
      strata: Seq[String],
      key: Column,
      weight: Column,
      k: Int,
      salts: Int = 64): DataFrame = {
    val salted = df
      .withColumn("__key", key.cast("string"))
      .withColumn("__ord",
        (conv(substr(md5(col("__key")), lit(1), lit(15)), 16, 10)
          .cast("long") + 1L) / greatest(weight, lit(1L)))
      .withColumn("__salt", pmod(xxhash64(col("__key")), lit(salts.toLong)))
    val local = Window
      .partitionBy((strata.map(col) :+ col("__salt")): _*)
      .orderBy(col("__ord"), col("__key"))
    val global = Window
      .partitionBy(strata.map(col): _*)
      .orderBy(col("__ord"), col("__key"))
    salted
      .withColumn("__lr", row_number().over(local)).filter(col("__lr") <= k)
      .withColumn("rn", row_number().over(global)).filter(col("rn") <= k)
      .drop("__ord", "__key", "__salt", "__lr")
  }

  /**
   * Next-fit sequence packing: assign documents to fixed-token-budget bins
   * (training batches) within deterministic shards. Documents are sharded
   * by md5(key) % nShards, ordered inside a shard by md5(key) — a stable
   * pseudo-random order, which is what training wants (adjacent-document
   * correlation broken) — and packed next-fit: a running token total per
   * bin, a new bin when the next document would overflow `capacity`. A
   * document longer than the capacity opens (and overflows) its own bin —
   * never silently dropped or truncated.
   *
   * Scale shape: one shuffle (repartition by shard), then a single
   * streaming pass per partition — the packing state is two longs, the
   * sorted iterator never materializes a shard, and shards are hash-sized
   * (corpus/nShards) so no partition outgrows its executor. This is the
   * sanctioned mapPartitions case: a genuinely sequential per-shard scan
   * no relational operator expresses (the q64 oracle replays it with a
   * recursive CTE).
   *
   * Returns (shard, key, n_tokens, bin).
   */
  def packSequences(
      df: DataFrame,
      key: Column,
      tokens: Column,
      capacity: Long,
      nShards: Int): DataFrame = {
    require(capacity > 0 && nShards > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val ks = key.cast("string")
    val base = df.select(
      md5Bucket(ks, nShards).as("shard"),
      ks.as("key"),
      tokens.cast("long").as("n_tokens"),
      md5(ks).as("__ord"))
    val packed = base
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("__ord"), col("key"))
      .select(col("shard"), col("key"), col("n_tokens"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        // several shards can share a partition; state resets on boundary
        var curShard = Long.MinValue
        var bin = 0L
        var used = 0L
        it.map { case (shard, k, tok) =>
          if (shard != curShard) { curShard = shard; bin = 0L; used = tok }
          else if (used + tok <= capacity) used += tok
          else { bin += 1L; used = tok }
          (shard, k, tok, bin)
        }
      }
    packed.toDF("shard", "key", "n_tokens", "bin")
  }

  /**
   * Overlapping fixed-size token windows with stride — the chunker that
   * turns documents into model-context-sized training/retrieval pieces
   * (every RAG ingestion and long-document training pipeline carries one).
   * Chunk k of a document covers tokens [k*stride+1, k*stride+window]
   * (1-based); the last chunk starts at the last stride boundary that
   * still exposes a new token and may be short. A document of w tokens
   * yields 1 + ceil(max(w - window, 0) / stride) chunks; empty documents
   * yield none. Consecutive chunks overlap by exactly window - stride
   * tokens, so no token-boundary context is ever lost.
   *
   * Pure projection + posexplode: zero shuffle, zero state — chunk
   * identity is a function of (doc, position) alone, so reruns, resumes
   * and backfills produce identical chunk ids, the same determinism
   * contract as [[hashSplit]]. Integer arithmetic only (replayed exactly
   * by the q80 DuckDB oracle).
   */
  def chunkWindows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 64,
      stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val ws = filter(split(lower(col(textCol)), "[^a-z0-9]+"), w => w =!= "")
    val nChunks = when(size(col("ws")) <= 0, lit(0))
      .otherwise(lit(1) +
        floor((greatest(size(col("ws")) - window, lit(0)) +
          (stride - 1)) / stride).cast("int"))
    // keep the id's ORIGINAL type — a long cast silently nulls string ids
    // (urls), destroying chunk identity for every row
    df.select(col(idCol).as("doc_id"), ws.as("ws"))
      .select(col("doc_id"), col("ws"),
        posexplode(
          when(nChunks > 0, sequence(lit(0), nChunks - 1))
            .otherwise(array().cast("array<int>"))).as(Seq("p0", "k")))
      .select(col("doc_id"), col("k").cast("long").as("chunk_id"),
        (col("k") * stride + 1).cast("long").as("chunk_start"),
        slice(col("ws"), col("k") * stride + 1, lit(window)).as("toks"))
      .select(col("doc_id"), col("chunk_id"), col("chunk_start"),
        size(col("toks")).cast("long").as("n_tokens"),
        concat_ws(" ", col("toks")).as("chunk_text"))
  }
}

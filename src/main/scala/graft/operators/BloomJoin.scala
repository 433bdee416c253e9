package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Bloom

/**
 * Bloom-pruned anti-join: exact `LEFT ANTI` semantics at a fraction of
 * the shuffle. The direct anti-join shuffles the ENTIRE big side by key
 * — at 10^12 candidate pages against a 10^9-key seen set that is the
 * single most expensive exchange of an incremental-crawl pipeline (the
 * reference's already-loaded check, `src/services/targetMapsSQLiteService
 * /index.js:127` re-expressed distributedly). The bloom path:
 *
 *   1. aggregate the SEEN side into one m-bit [[graft.functions.BloomAgg]]
 *      row (a partial-agg ObjectHashAggregate — each map task contributes
 *      one m/8-byte buffer, OR-merged);
 *   2. broadcast that single row and probe it with a codegen'd per-row
 *      expression: bloom-NEGATIVE rows are guaranteed-new (no false
 *      negatives) and flow through with NO join and NO shuffle;
 *   3. only bloom-POSITIVE rows — true members plus the fp-rate sliver —
 *      pay the exact anti-join that removes the false positives.
 *
 * On a fresh crawl where most candidates are new, step 3 sees ~fp-rate
 * of the corpus instead of all of it. Null keys match nothing (standard
 * anti-join semantics) and are kept via the guaranteed-new branch.
 *
 * The result is row-identical to `big.join(seen, key, "left_anti")`
 * (BloomJoinSpec asserts equivalence and the no-false-negative
 * guarantee; q85 grades the underlying probe verdicts value-for-value
 * against DuckDB's replay of the bit set).
 */
object BloomJoin {

  /**
   * @param big      candidate side (kept where its key is absent from seen)
   * @param bigKey   string key column name on `big`
   * @param seen     membership side
   * @param seenKey  string key column name on `seen`
   * @param numBits  bloom size in bits (multiple of 64); size for the
   *                 seen-set cardinality: ~10 bits/key gives ~1% fp
   * @param numHashes hash count (2-3 is the sweet spot for 10 bits/key)
   */
  def antiJoin(
      big: DataFrame,
      bigKey: String,
      seen: DataFrame,
      seenKey: String,
      numBits: Int,
      numHashes: Int): DataFrame = {
    // the natural call keys both sides on the same name (url vs url) —
    // rename the seen side so the exact-check join resolves unambiguously
    require(!big.columns.contains("__bloom_seen_key"),
      "big side may not carry a __bloom_seen_key column")
    val seenKeys = seen.select(col(seenKey).as("__bloom_seen_key"))
    val sketch = seenKeys.agg(
      Bloom.bloomBuild(col("__bloom_seen_key"), numBits, numHashes).as("__bloom"))
    val probed = big.crossJoin(broadcast(sketch))
    val hit = Bloom.mightContain(col("__bloom"), col(bigKey), numBits, numHashes)
    // null key → null probe → guaranteed-new branch (coalesce), matching
    // the anti-join rule that a null key matches nothing
    val guaranteedNew = probed
      .where(!coalesce(hit, lit(false))).drop("__bloom")
    val possiblySeen = probed
      .where(coalesce(hit, lit(false))).drop("__bloom")
      .join(seenKeys, col(bigKey) === col("__bloom_seen_key"), "left_anti")
    guaranteedNew.unionByName(possiblySeen)
  }
}

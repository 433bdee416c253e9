package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Full-text relevance search over the corpus: an inverted index (term →
 * postings) scored with BM25 (Robertson–Spärck Jones; the Okapi form with
 * the standard k1/b saturation), top-k per query. The retrieval primitive
 * a training-data pipeline uses to audit a 10¹²-page corpus — "show me the
 * documents matching this probe" — and the lexical half of hybrid
 * search next to the ANN operators ([[Similarity]], [[Ivf]]).
 *
 * Scale shape:
 *  - The postings build is one map-side-combining groupBy keyed by
 *    (doc, term) — no hot key at any document size, cardinality bounded by
 *    corpus token-TYPE count.
 *  - Queries are SMALL by construction (an audit batch, not the crawl), so
 *    the query-term set is explicitly broadcast; the corpus side reduces
 *    to postings of query terms with one map-side semi-join before
 *    anything else touches them. Per-term document frequencies are then
 *    computed over that filtered slice (term-only filter, so df is exact)
 *    and broadcast too — tiny by the same argument.
 *  - Corpus-wide statistics (N, avgdl) ride along as a broadcast 1-row
 *    cross join; nothing collects to the driver.
 *  - Top-k per query is the q63 two-level salted window: each of `salts`
 *    sub-partitions keeps its local top-k, only ≤ salts×k survivors per
 *    query enter the global window — a popular query term over the whole
 *    crawl never lands one task with the full postings list. Local rank ≤
 *    global rank proves the survivor set contains the exact global top-k.
 *
 * Determinism: scores are rounded to 6dp BEFORE ranking and ties break on
 * doc id, so the ranking is engine-reproducible (the q76 oracle replays it
 * relationally in DuckDB).
 *
 * Output: (query_id, doc_id, n_terms matched, score, rank) for rank ≤ k.
 */
object Search {

  /** Lowercase word tokens (the corpus-wide tokenization q27/q69 use). */
  private def words(text: Column): Column =
    filter(split(lower(text), "[^a-z]+"), w => w =!= "")

  def bm25TopK(
      docs: DataFrame,
      queries: DataFrame,
      idCol: String,
      textCol: String,
      qidCol: String,
      qtextCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      salts: Int = 16): DataFrame = {
    val id = col(idCol)

    // inverted index: (doc, term, tf) + per-doc length
    val docLen = docs.select(id, words(col(textCol)).as("ws"))
      .select(id, col("ws"), size(col("ws")).as("dl"))
    val postings = docLen
      .select(id, col("dl"), explode(col("ws")).as("term"))
      .groupBy(id, col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))

    // corpus stats as a broadcast 1-row table — never a driver collect
    val stats = docLen.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))

    // broadcast query terms; postings reduce map-side to query terms only
    val qTerms = queries
      .select(col(qidCol).as("query_id"),
        explode(array_distinct(words(col(qtextCol)))).as("term"))
    val hit = postings.join(
      broadcast(qTerms.select("term").distinct()), Seq("term"), "left_semi")
    // df over the term-filtered slice is exact (the filter is term-only)
    val dfT = hit.groupBy("term").agg(count(lit(1)).as("df"))

    val scoredTerms = hit
      .join(broadcast(qTerms), Seq("term"))
      .join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), id,
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * (col("tf") * lit(k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
          .as("s"))
    val scored = scoredTerms
      .groupBy(col("query_id"), id)
      .agg(count(lit(1)).as("n_terms"), round(sum(col("s")), 6).as("score"))

    // exact top-k per query, hot-query-proof (q63's salted two-level proof)
    val salted = scored.withColumn("__salt", pmod(xxhash64(id), lit(salts.toLong)))
    val local = Window.partitionBy(col("query_id"), col("__salt"))
      .orderBy(col("score").desc, id)
    val global = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, id)
    salted
      .withColumn("__lr", row_number().over(local)).filter(col("__lr") <= k)
      .withColumn("rank", row_number().over(global)).filter(col("rank") <= k)
      .drop("__salt", "__lr")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Repeated-substring span detection — the distributed form of the
 * suffix-array "ExactSubstr" deduplication of Lee et al., "Deduplicating
 * Training Data Makes Language Models Better" (ACL 2022, arXiv
 * 2107.06499): instead of dropping whole near-duplicate documents, find
 * the exact token SPANS that occur more than once in the corpus (licence
 * boilerplate, quoted passages, templated footers) so the caller can cut
 * just those spans. A single suffix array over 10^12 documents doesn't
 * distribute; the standard relational equivalent is n-gram anchoring:
 * a token span is flagged iff it is covered by some word n-gram that
 * occurs >1 time corpus-wide (intra-document repeats count, as in the
 * paper), then overlapping/adjacent flagged windows are merged into
 * maximal spans per document.
 *
 * With n-gram anchoring a repeated region shorter than n tokens is
 * invisible and a repeated region of length L >= n is recovered exactly
 * (every one of its L-n+1 windows repeats); the merge step can also
 * bridge two distinct repeats separated by a gap < n tokens — the usual
 * precision trade documented with the technique.
 */
object ExactSubstr {

  /** Tokenization shared with the BM25/decontamination family; mirrored
    * verbatim by the DuckDB oracles (`regexp_split_to_array` +
    * `list_filter`). */
  private def words(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), w => w =!= "")

  /**
   * Maximal repeated spans per document. Output one row per span:
   * (doc_id, span_start, span_end, span_tokens), positions 1-based
   * inclusive in the document's token sequence.
   *
   * Plan shape at corpus scale:
   *  - gram extraction is a pure projection + posexplode (no shuffle);
   *  - the >1 filter is a partial-aggregated groupBy(gram) — counts for
   *    a boilerplate gram present in every document combine map-side, so
   *    the hot gram arrives at its reducer as one partial count per map
   *    partition, never as raw rows;
   *  - flagged positions come from a LEFT SEMI join keyed by gram. A hot
   *    gram funnels its (doc, pos) rows through one partition, but the
   *    cost is linear in occurrences (hash probe per row) and AQE splits
   *    the skewed partition; there is no k-squared blow-up anywhere — the
   *    semi join emits each position at most once.
   *  - span merge is a per-document window (lag + running sum, the
   *    gaps-and-islands rule: a new island starts when the gap between
   *    flagged starts exceeds n). Partitions are bounded by document
   *    length, the same justification as the winnowing window.
   */
  def repeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    val ws = words(col(textCol))
    // keep the id's ORIGINAL type: a long cast silently nulls string ids
    // (urls — the corpus's standard key), merging the whole corpus into
    // one null window partition (same lesson as Dedup's ADVICE-r2 fix)
    val base = docs.select(col(idCol).as("doc_id"), ws.as("ws"))
    val grams = base
      .select(col("doc_id"),
        posexplode(
          when(size(col("ws")) >= n,
            transform(sequence(lit(1), size(col("ws")) - (n - 1)),
              i => concat_ws(" ", slice(col("ws"), i, lit(n)))))
            .otherwise(array().cast("array<string>")))
          .as(Seq("p0", "gram")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"), col("gram"))

    val dup = grams.groupBy("gram").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 1)
      .select("gram")
    val flagged = grams.join(dup, Seq("gram"), "left_semi")

    val byPos = Window.partitionBy("doc_id").orderBy("p")
    val spans = flagged
      .withColumn("brk",
        when(col("p") - lag("p", 1).over(byPos) > n, 1L).otherwise(0L))
      .withColumn("island", sum("brk").over(byPos))
      .groupBy("doc_id", "island")
      .agg(min("p").as("span_start"),
        (max("p") + (n - 1)).as("span_end"))
    spans.select(col("doc_id"), col("span_start"), col("span_end"),
      (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }
}

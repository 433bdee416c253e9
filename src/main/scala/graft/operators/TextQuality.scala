package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Repetition-based quality filters, benchmark decontamination, and URL
 * canonicalization — the training-data gates a Common-Crawl-scale corpus
 * runs AFTER the near-dup passes ([[Dedup]]) and alongside the heuristic
 * quality score (q22). The repetition family follows the published Gopher
 * rules (Rae et al. 2021, §A1.1): duplicate-line fraction, duplicate-line
 * CHARACTER fraction, and the fraction of characters inside the single
 * most-frequent word 2-gram.
 *
 * Scale shape: the line/char stats are pure per-row array expressions —
 * zero shuffle, embarrassingly parallel. The top-2-gram stat is the one
 * genuinely relational piece (a per-document mode): explode → partial-agg
 * groupBy (map-side combine) → `max_by` per document → join back on the
 * document key. Both shuffles are keyed by (doc, gram) / doc, so
 * cardinality is bounded by corpus gram count and there is no hot key —
 * a 10⁶-word document spreads across its own gram groups rather than a
 * single task (the per-row-HOF alternative would be O(words²) CPU on one
 * row and was rejected for exactly that reason).
 */
object TextQuality {

  /** Sentence-ish lines: split on '.', trimmed, empties dropped. */
  private def lines(text: Column): Column =
    filter(transform(split(text, "\\."), s => trim(s)), s => s =!= "")

  /** Lowercase word array (the corpus-wide tokenization q27 uses). */
  private def words(text: Column): Column =
    filter(split(lower(text), "[^a-z]+"), w => w =!= "")

  private def sumLen(arr: Column): Column =
    aggregate(transform(arr, x => length(x)), lit(0), (a, x) => a + x)

  /**
   * Per-document repetition statistics + the Gopher-style flag.
   * Output: id, n_lines, dup_line_frac, dup_char_frac, top2_gram,
   * top2_frac, flagged.
   */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val ls = lines(text)
    val base = df.select(
      col(idCol),
      words(text).as("ws"),
      size(ls).as("n_lines"),
      when(size(ls) === 0, 0.0)
        .otherwise(round(lit(1.0) - size(array_distinct(ls)).cast("double") / size(ls), 6))
        .as("dup_line_frac"),
      when(size(ls) === 0, 0.0)
        .otherwise(round((sumLen(ls) - sumLen(array_distinct(ls))).cast("double")
          / greatest(sumLen(ls), lit(1)), 6))
        .as("dup_char_frac"))

    // the per-document 2-gram mode: the only relational stage
    val grams = base
      .select(col(idCol), col("ws"),
        explode(transform(sequence(lit(0), size(col("ws")) - 2),
          i => concat_ws(" ", element_at(col("ws"), i + 1), element_at(col("ws"), i + 2))))
          .as("g"))
      .where(size(col("ws")) >= 2)
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      // deterministic tie-break: highest count, then lexicographically
      // largest gram (struct ordering is field-by-field)
      .agg(max_by(struct(col("g"), col("c")), struct(col("c"), col("g"))).as("top"))
      .select(col(idCol), col("top.g").as("top2_gram"), col("top.c").as("top2_c"))

    base.join(grams, Seq(idCol), "left")
      .select(
        col(idCol), col("n_lines"), col("dup_line_frac"), col("dup_char_frac"),
        coalesce(col("top2_gram"), lit("")).as("top2_gram"),
        coalesce(
          round(col("top2_c") * (length(col("top2_gram"))).cast("double")
            / greatest(length(concat_ws(" ", col("ws"))), lit(1)), 6),
          lit(0.0)).as("top2_frac"))
      .withColumn("flagged",
        col("dup_line_frac") > 0.30 || col("dup_char_frac") > 0.20 ||
          col("top2_frac") > 0.18)
  }

  /**
   * Benchmark decontamination: flag every training document sharing at
   * least one word n-gram with the evaluation corpus (the standard
   * n-gram-overlap rule used to scrub eval sets out of web-scale training
   * data). The eval gram set is SMALL by construction (benchmarks are
   * ~10⁴ documents against a 10¹²-page corpus), so it is distinct-ed and
   * explicitly broadcast; the training side then flags itself with one
   * map-side semi-join on its exploded grams plus a count-distinct per
   * document — no all-pairs stage anywhere.
   *
   * Output: one row per training document — id, n_hit_grams (distinct
   * contaminated grams), contaminated.
   */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    def gramsOf(df: DataFrame): DataFrame = {
      val ws = words(col(textCol))
      df.select(col(idCol),
        explode(transform(sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*)))
          .as("g"))
        .where(size(ws) >= n)
    }
    val evalGrams = gramsOf(eval).select("g").distinct()
    val hits = gramsOf(train)
      .join(broadcast(evalGrams), Seq("g"), "left_semi")
      .groupBy(col(idCol)).agg(countDistinct(col("g")).as("n_hit_grams"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
        (coalesce(col("n_hit_grams"), lit(0L)) > 0).as("contaminated"))
  }

  /**
   * CCNet-style language-model quality scoring (Wenzek et al. 2020): train
   * an add-one-smoothed bigram model on a curated REFERENCE slice, then
   * score every corpus document by per-token negative log-likelihood —
   * low NLL ≈ reference-like prose, high NLL ≈ gibberish/boilerplate.
   * The reference pipeline uses a pruned KenLM; the relational core is the
   * same: a gram-count model plus a per-document weighted sum of log
   * conditional probabilities,
   *   p(w|ctx) = (c(ctx,w) + 1) / (c(ctx) + V).
   *
   * Scale shape: the model is built from the reference slice with two
   * map-side-combining groupBys (bigram counts, context counts) and one
   * count-distinct (vocabulary). Reference corpora are BOUNDED by
   * construction (a curated slice, not the crawl), so the model tables are
   * explicitly broadcast and the corpus side never shuffles on a gram key:
   * each document first collapses to its (doc, ctx, w) → k type counts
   * (shuffle keyed by doc+gram — no hot key at any document size), then
   * map-side-joins the model and reduces to one row per document. The
   * scoring pass over a 10¹²-page corpus is therefore one gram-keyed
   * aggregation plus broadcast lookups.
   *
   * Output: one row per corpus document — id, n_bigrams, nll_per_token
   * (rounded 6dp; 0.0 for docs with <2 tokens), oov_frac (fraction of
   * bigram tokens whose (ctx,w) pair the model never saw).
   */
  def lmScore(corpus: DataFrame, reference: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val id = col(idCol)
    def bigrams(df: DataFrame): DataFrame = {
      val ws = words(col(textCol))
      df.select(id,
          explode(transform(sequence(lit(0), size(ws) - 2),
            i => struct(element_at(ws, i + 1).as("ctx"),
              element_at(ws, i + 2).as("w")))).as("bg"))
        .where(size(ws) >= 2)
        .select(id, col("bg.ctx").as("ctx"), col("bg.w").as("w"))
    }
    val refBg = bigrams(reference)
    val model = refBg.groupBy("ctx", "w").agg(count(lit(1)).as("cnt"))
    val ctxCnt = refBg.groupBy("ctx").agg(count(lit(1)).as("ctx_cnt"))
    val vocab = reference.select(explode(words(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val docBg = bigrams(corpus)
      .groupBy(id, col("ctx"), col("w")).agg(count(lit(1)).as("k"))
    val scored = docBg
      .join(broadcast(model), Seq("ctx", "w"), "left")
      .join(broadcast(ctxCnt), Seq("ctx"), "left")
      .crossJoin(broadcast(vocab))
      .select(id, col("k"),
        (col("k") * log((coalesce(col("cnt"), lit(0L)) + 1).cast("double")
          / (coalesce(col("ctx_cnt"), lit(0L)) + col("v")).cast("double")))
          .as("term"),
        when(col("cnt").isNull, col("k")).otherwise(lit(0L)).as("oov_k"))
      .groupBy(id)
      .agg(sum(col("k")).as("n_bigrams"),
        round(-sum(col("term")) / sum(col("k")), 6).as("nll_per_token"),
        round(sum(col("oov_k")).cast("double") / sum(col("k")), 6).as("oov_frac"))
    corpus.select(id).join(scored, Seq(idCol), "left")
      .select(id,
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_per_token"), lit(0.0)).as("nll_per_token"),
        coalesce(col("oov_frac"), lit(0.0)).as("oov_frac"))
  }

  /**
   * Canonical URL: lowercase scheme+authority, strip the default port
   * (:443/:80), strip the fragment, strip a `www.` host prefix, strip one
   * trailing slash. A pure composed-builtin string kernel — zero shuffle,
   * codegen'd end to end — mirrored operator-for-operator in the DuckDB
   * oracle (q71).
   */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // lowercase scheme://host[:port] only, never the path. The rewrite
    // applies ONLY to authority-form URLs — on anything else (schemeless
    // hrefs, protocol-relative //host paths) the two extracts both return
    // "" and would silently canonicalize the whole corpus to one
    // empty-string key, so those pass through with just fragment+slash
    // stripping (pinned in TextQualitySpec)
    val lowered = concat(
      lower(regexp_extract(noFrag, "^([^/]+//[^/]*)", 1)),
      regexp_extract(noFrag, "^[^/]+//[^/]*(.*)$", 1))
    // ($|/) alternation instead of a lookahead: the pattern must sit in
    // the RE2 ∩ Java dialect so the DuckDB oracle reproduces it exactly
    val noPort = regexp_replace(lowered, "^(https://[^/:]+):443($|/)", "$1$2")
    val noPort2 = regexp_replace(noPort, "^(http://[^/:]+):80($|/)", "$1$2")
    val noWww = regexp_replace(noPort2, "^(https?://)www\\.", "$1")
    when(noFrag.rlike("^[^/]+//"), regexp_replace(noWww, "/$", ""))
      .otherwise(regexp_replace(noFrag, "/$", ""))
  }

  /**
   * Registrable domain (public-suffix-lite): the last two host labels,
   * or three when the penultimate label is a generic second-level suffix
   * (`co`/`ac`/`gov`/`com`/`org`/`net`) under a 2-letter ccTLD — the
   * deterministic heuristic core of the public-suffix rule.
   */
  def registrableDomain(url: Column): Column = {
    // authority form first; schemeless inputs fall back to treating the
    // leading segment as the host instead of collapsing to ""
    val host = when(url.rlike("^[^/]+//"),
      regexp_extract(lower(url), "^[^/]+//(?:www\\.)?([^/:#]+)", 1))
      .otherwise(regexp_extract(lower(url), "^(?:www\\.)?([^/:#]+)", 1))
    val l = split(host, "\\.")
    val n = size(l)
    val two = concat_ws(".", element_at(l, -2), element_at(l, -1))
    val three = concat_ws(".", element_at(l, -3), element_at(l, -2), element_at(l, -1))
    when(n <= 2, host)
      .when(element_at(l, -2).isin("co", "ac", "gov", "com", "org", "net")
        && length(element_at(l, -1)) === 2 && n >= 3, three)
      .otherwise(two)
  }
}

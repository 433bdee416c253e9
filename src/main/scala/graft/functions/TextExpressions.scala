package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim.{col => toCol, expr => toExpr}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Text kernels as codegen'd Catalyst expressions — the stopword-profile
 * side of the language-ID / quality-scoring family (reference analog:
 * per-document property derivation over page text). The composed form
 * these replace runs one interpreted `filter(words, w ->
 * w.isInCollection(set))` pass per language — k array scans with a
 * per-word linear `In` over the set literals, each behind a lambda
 * dispatch. One hash-lookup pass over the words array covers every
 * language at once and stays inside whole-stage codegen, which is the
 * shape that survives 10^12 documents: cost is O(words), not
 * O(words × languages × set size).
 */
object TextFn {

  /**
   * Per-set stopword hit counts in one pass. Immutable and serializable;
   * the UTF8String lookup table is rebuilt lazily once per JVM (it rides
   * into generated code via `addReferenceObj`, so executors deserialize
   * the plain-string sets and hash them locally).
   *
   * Semantics match `size(filter(words, w -> w.isInCollection(set)))`
   * exactly: a word contributes to EVERY set that contains it, null
   * array elements match nothing (the composed predicate yields null,
   * which `filter` drops), duplicates in a set count once (the lookup is
   * by word), and empty strings only count if a set contains "".
   */
  final class StopwordTable(val sets: Seq[Seq[String]]) extends Serializable {
    val nSets: Int = sets.length

    // word -> indices of the sets containing it (tiny arrays; overlap-safe)
    @transient private lazy val lookup: java.util.HashMap[UTF8String, Array[Int]] = {
      val m = new java.util.HashMap[UTF8String, Array[Int]]()
      for ((set, i) <- sets.zipWithIndex; w <- set.distinct) {
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(i) else prev :+ i)
      }
      m
    }

    def hits(words: ArrayData): ArrayData = {
      val counts = new Array[Int](nSets)
      val n = words.numElements()
      var i = 0
      while (i < n) {
        if (!words.isNullAt(i)) {
          val idxs = lookup.get(words.getUTF8String(i))
          if (idxs != null) {
            var j = 0
            while (j < idxs.length) { counts(idxs(j)) += 1; j += 1 }
          }
        }
        i += 1
      }
      new GenericArrayData(counts)
    }
  }

  // --- html_text: single-pass HTML → text extraction ----------------------
  //
  // The north-star invariant is "byte-identical extracted text per url":
  // pages arrive as UTF-8 html BINARY and the engine must recover the text
  // content exactly. One pass over the raw bytes — no regexp backtracking,
  // no intermediate string materialization per stripping stage (the composed
  // built-in form runs 4 regexp_replace passes + 5 replace passes, each
  // materializing a full copy of a multi-KB page; at 10^12 pages that is 9
  // allocations and 9 scans per page vs 1 here). ASCII-only control bytes
  // ('<', '&', '>') never appear inside UTF-8 multi-byte sequences, so the
  // byte-level scan is multi-byte safe and non-ASCII text passes through
  // verbatim.
  //
  // Semantics (pinned by TrainingOpsSpec parity + round-trip property):
  //  - <script ...>…</script ...> and <style ...>…</style ...> are removed
  //    whole, INCLUDING content (tag names ASCII case-insensitive, followed
  //    by '>', '/', or whitespace); an unclosed block is consumed to EOF.
  //  - <!-- … --> comments are removed; unclosed comments consume to EOF.
  //  - every other <…> tag is removed; an unclosed trailing '<' consumes to
  //    EOF (the composed regexp form leaves unclosed tags in place — the
  //    one documented divergence, covered by spec, never by the oracle's
  //    well-formed fixture).
  //  - entities decode left-to-right non-overlapping: &amp; &lt; &gt;
  //    &quot; &apos; plus decimal &#N; for 1 ≤ N ≤ 127; anything else after
  //    '&' (including &#x hex and super-ASCII refs) passes through verbatim,
  //    preserving bytes.
  //  - text content between tags is copied verbatim — NO whitespace
  //    collapse, which is what makes extract(wrap(text)) == text hold
  //    byte-identically.

  private def asciiLower(c: Byte): Byte =
    if (c >= 'A' && c <= 'Z') (c + 32).toByte else c

  /** b[i..) starts with `lit` (ASCII, lowercase), case-insensitively. */
  private def matchesIC(b: Array[Byte], i: Int, lit: String): Boolean = {
    if (i + lit.length > b.length) return false
    var k = 0
    while (k < lit.length) {
      if (asciiLower(b(i + k)) != lit.charAt(k)) return false
      k += 1
    }
    true
  }

  private def isNameEnd(c: Byte): Boolean =
    c == '>' || c == '/' || c == ' ' || c == '\t' || c == '\n' || c == '\r'

  /** Position just past the next '>' at/after i, or EOF. */
  private def skipPastGt(b: Array[Byte], i0: Int): Int = {
    var i = i0
    while (i < b.length && b(i) != '>') i += 1
    if (i < b.length) i + 1 else i
  }

  /** Position just past `close` + its tag's '>' (e.g. close = "</script"),
    * searching case-insensitively from i0; EOF if never closed. */
  private def skipElement(b: Array[Byte], i0: Int, close: String): Int = {
    var i = i0
    while (i < b.length) {
      if (b(i) == '<' && matchesIC(b, i, close)) return skipPastGt(b, i + close.length)
      i += 1
    }
    i
  }

  /** Position just past "-->" from i0, or EOF. */
  private def skipComment(b: Array[Byte], i0: Int): Int = {
    var i = i0
    while (i + 2 < b.length) {
      if (b(i) == '-' && b(i + 1) == '-' && b(i + 2) == '>') return i + 3
      i += 1
    }
    b.length
  }

  /** Decode an entity at b(i)=='&': returns (consumedLen << 8) | byte,
    * or -1 when not a recognized entity (caller copies '&' verbatim). */
  private def entityAt(b: Array[Byte], i: Int): Int = {
    def lit(s: String, c: Char): Int =
      if (matchesIC(b, i, s)) ((s.length << 8) | c.toInt) else -1
    if (i + 1 >= b.length) return -1
    b(i + 1) match {
      case 'a' | 'A' =>
        val r = lit("&amp;", '&'); if (r != -1) r else lit("&apos;", '\'')
      case 'l' | 'L' => lit("&lt;", '<')
      case 'g' | 'G' => lit("&gt;", '>')
      case 'q' | 'Q' => lit("&quot;", '"')
      case '#' =>
        var j = i + 2
        var v = 0
        while (j < b.length && b(j) >= '0' && b(j) <= '9' && v <= 127) {
          v = v * 10 + (b(j) - '0'); j += 1
        }
        if (j > i + 2 && j < b.length && b(j) == ';' && v >= 1 && v <= 127)
          (((j + 1 - i) << 8) | v)
        else -1
      case _ => -1
    }
  }

  /** The scanner over raw UTF-8 bytes; output can only shrink. */
  def htmlExtractBytes(b: Array[Byte]): UTF8String = {
    val n = b.length
    val out = new Array[Byte](n)
    var i = 0
    var o = 0
    while (i < n) {
      val c = b(i)
      if (c == '<') {
        if (matchesIC(b, i + 1, "script") &&
            (i + 7 >= n || isNameEnd(b(i + 7))))
          i = skipElement(b, i + 7, "</script")
        else if (matchesIC(b, i + 1, "style") &&
            (i + 6 >= n || isNameEnd(b(i + 6))))
          i = skipElement(b, i + 6, "</style")
        else if (matchesIC(b, i + 1, "!--"))
          i = skipComment(b, i + 4)
        else
          i = skipPastGt(b, i + 1)
      } else if (c == '&') {
        val e = entityAt(b, i)
        if (e == -1) { out(o) = c; o += 1; i += 1 }
        else { out(o) = (e & 0xff).toByte; o += 1; i += (e >> 8) }
      } else {
        out(o) = c; o += 1; i += 1
      }
    }
    UTF8String.fromBytes(out, 0, o)
  }

  def htmlExtract(s: UTF8String): UTF8String = htmlExtractBytes(s.getBytes)
}

/**
 * stopword_hits(words, sets) over an array<string> column: array<int> of
 * per-set hit counts, all sets in a single pass (see [[TextFn.StopwordTable]]
 * for the exact composed-form semantics it preserves).
 */
case class StopwordHits(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "stopword_hits"

  // checked lazily (child is unresolved at construction, like CosineSim)
  private def check(): Unit = child.dataType match {
    case ArrayType(StringType, _) => ()
    case t => throw new IllegalArgumentException(
      s"stopword_hits wants array<string>, got $t")
  }

  @transient private lazy val table = new TextFn.StopwordTable(sets)

  protected override def nullSafeEval(w: Any): Any = {
    check()
    table.hits(w.asInstanceOf[ArrayData])
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    check()
    val ref = ctx.addReferenceObj("stopwordTable", table,
      classOf[TextFn.StopwordTable].getName)
    defineCodeGen(ctx, ev, w => s"$ref.hits($w)")
  }

  protected override def withNewChildInternal(c: Expression): StopwordHits =
    copy(child = c)
}

/**
 * html_text(html) over a BINARY (UTF-8 page bytes) or STRING column: the
 * extracted text content (see [[TextFn.htmlExtractBytes]] for the exact
 * semantics). Binary input is the zero-copy path — the scanner reads the
 * parquet byte array directly, with no decode-to-string materialization
 * (input_hint: pages carry `html:binary`; the text must come back
 * byte-identical per url).
 */
case class HtmlText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "html_text"

  // checked lazily (child is unresolved at construction, like CosineSim)
  private def isBinary: Boolean = child.dataType match {
    case BinaryType => true
    case StringType => false
    case t => throw new IllegalArgumentException(
      s"html_text wants binary|string, got $t")
  }

  protected override def nullSafeEval(h: Any): Any =
    if (isBinary) TextFn.htmlExtractBytes(h.asInstanceOf[Array[Byte]])
    else TextFn.htmlExtract(h.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isBinary) "htmlExtractBytes" else "htmlExtract"
    defineCodeGen(ctx, ev, h => s"graft.functions.TextFn.$fn($h)")
  }

  protected override def withNewChildInternal(c: Expression): HtmlText =
    copy(child = c)
}

/** Column API for the text kernels (`import graft.functions.text._`). */
object text {
  def stopword_hits(words: Column, sets: Seq[Seq[String]]): Column =
    toCol(StopwordHits(toExpr(words), sets))
  def html_text(html: Column): Column = toCol(HtmlText(toExpr(html)))

  /**
   * PII redaction: emails → `<EMAIL>`, dotted-quad IPs → `<IP>`,
   * NNN-NNN-NNNN phones → `<PHONE>`. Composed codegen'd regexp passes
   * (three scans per page — each pattern needs its own replacement token,
   * so a single alternation pass can't express it). The patterns stay in
   * the RE2 ∩ java.util.regex common dialect (no lookaround, no backrefs)
   * so external engines — and the q66 DuckDB oracle — reproduce the
   * redaction byte-for-byte. Email runs first: an address can embed
   * digit-dot runs an earlier IP pass would split.
   */
  def redact_pii(c: Column): Column = {
    import org.apache.spark.sql.functions.regexp_replace
    regexp_replace(
      regexp_replace(
        regexp_replace(c,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
      "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>")
  }
}

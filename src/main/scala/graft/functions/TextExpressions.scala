package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim.{col => toCol, expr => toExpr}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
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

/** Column API for the text kernels (`import graft.functions.text._`). */
object text {
  def stopword_hits(words: Column, sets: Seq[Seq[String]]): Column =
    toCol(StopwordHits(toExpr(words), sets))
}

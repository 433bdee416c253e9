package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim.{col => toCol, expr => toExpr}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/**
 * Dense-vector kernels as codegen'd Catalyst expressions. The
 * `aggregate(zip_with(...))` higher-order form these replace is interpreted
 * per element (one closure dispatch per lambda per index); a single static
 * call with a tight primitive loop is ~10× on 64-dim embeddings and keeps
 * the whole projection inside whole-stage codegen.
 */
object VecFn {

  /** Cosine similarity. Accumulation is per-index products added left to
    * right — the exact fold order of the `aggregate(zip_with(x*y))` chain it
    * replaces, so results are bit-identical and the DuckDB oracles hold. */
  def cosine(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      ab += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  /** Count of positions where two long arrays agree. Matches the
    * `aggregate(zip_with(a, b, (x,y) -> if(x=y,1,0)), 0, +)` fold it
    * replaces: zip_with pads the shorter side with null and `null = y`
    * contributes 0, so only indices below min(len) can count. */
  def eqCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  private val LongMaxD = Long.MaxValue.toDouble

  /** Packed sign-bit LSH bucket over `nPlanes` deterministic hyperplanes.
    * Bit p is set iff Σ_i vec(i)·component(p, i) ≥ 0 where
    * component(p, i) = xxhash64(p, i) / Long.MaxValue — exactly the
    * `xxhash64(lit(p), i)` chain of the composed-expression form this
    * replaces (seed 42, int child hashed into the running hash), with the
    * same left-to-right double accumulation from +0.0, so buckets are
    * bit-identical. A +0.0-seeded sum can never be -0.0, and Spark's
    * NaN-safe `>=` (NaN sorts above 0) is mirrored explicitly, so the
    * primitive comparison matches Catalyst on every input. */
  def signBuckets(v: ArrayData, nPlanes: Int, isFloat: Boolean): Long = {
    val n = v.numElements()
    // empty vector → 0, matching the composed form: sequence(0, -1) yields
    // [0,-1], zip_with pads with nulls, the fold goes null, and the
    // when(null >= 0) branch falls through to 0 for every plane.
    if (n == 0) return 0L
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      val planeSeed = XXH64.hashInt(p, 42L)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        acc += x * (XXH64.hashInt(i, planeSeed).toDouble / LongMaxD)
        i += 1
      }
      if (java.lang.Double.isNaN(acc) || acc >= 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }
}

/** cosine(left, right) over array<float>/array<double> columns. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"cosine_sim wants array<float|double>, got $t")
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VecFn.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecFn.cosine($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  protected override def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(l, r)
}

/** eqCount(left, right) over array<bigint> columns — the MinHash
  * signature-agreement kernel. One tight primitive loop inside whole-stage
  * codegen vs ~2×128 interpreted lambda dispatches per candidate pair in the
  * higher-order form (the q26 estimate filter runs this over every LSH
  * candidate, ~780k pairs at sf0.1 — it was the single hottest stage). */
case class SigEqCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sig_eq_count"

  // checked lazily (children are unresolved at construction, like CosineSim)
  private def check(): Unit = Seq(left, right).foreach(e => e.dataType match {
    case ArrayType(LongType, _) => ()
    case t => throw new IllegalArgumentException(
      s"sig_eq_count wants array<bigint>, got $t")
  })

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    check()
    VecFn.eqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    check()
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecFn.eqCount($a, $b)")
  }

  protected override def withNewChildrenInternal(l: Expression, r: Expression): SigEqCount =
    copy(l, r)
}

/** sign_buckets(vec, nPlanes) over array<float|double> — the random-
  * hyperplane LSH bucket id, all planes in one pass. The composed form it
  * replaces ran nPlanes separate interpreted `aggregate(zip_with(vec,
  * sequence(...)))` folds per row — 8 array materializations + ~8×2×dim
  * lambda dispatches — the single hottest stage of the ANN-LSH and
  * cosine-near-dup pipelines (q30/q46). */
case class SignBuckets(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_buckets"

  // checked lazily (children are unresolved at construction, like CosineSim)
  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"sign_buckets wants (array<float|double>, int), got $t")
  }
  private def checkPlanes(): Unit = right.dataType match {
    case IntegerType => ()
    case t => throw new IllegalArgumentException(
      s"sign_buckets wants an int plane count, got $t")
  }

  protected override def nullSafeEval(v: Any, n: Any): Any = {
    checkPlanes()
    VecFn.signBuckets(v.asInstanceOf[ArrayData], n.asInstanceOf[Int], isFloat)
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    checkPlanes()
    defineCodeGen(ctx, ev, (v, n) =>
      s"graft.functions.VecFn.signBuckets($v, $n, $isFloat)")
  }

  protected override def withNewChildrenInternal(l: Expression, r: Expression): SignBuckets =
    copy(l, r)
}

/** Column API for the vector kernels (`import graft.functions.vec._`). */
object vec {
  def cosine_sim(a: Column, b: Column): Column = toCol(CosineSim(toExpr(a), toExpr(b)))
  def sig_eq_count(a: Column, b: Column): Column = toCol(SigEqCount(toExpr(a), toExpr(b)))
  def sign_buckets(v: Column, nPlanes: Int): Column =
    toCol(SignBuckets(toExpr(v), toExpr(org.apache.spark.sql.functions.lit(nPlanes))))
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/**
 * Log₂-bucket histogram sketch for quantile profiling — the fourth
 * mergeable-sketch archetype alongside [[KmvSketchAgg]] (bottom-k),
 * [[CountMinAgg]] (hashed counters) and [[BloomAgg]] (bit OR): a fixed
 * 65-counter array indexed by BIT LENGTH of the value (bucket 0 holds
 * v ≤ 0; bucket b holds v in [2^(b-1), 2^b)), merged by elementwise
 * addition. Per-group state is 520 bytes no matter how many rows or how
 * wide the value range, so "p50/p90/p99 document length per source over
 * 10^12 pages" crosses the shuffle as one buffer per source with map-side
 * partial aggregation — the exact-percentile alternative (sort or
 * per-group collect) shuffles the corpus.
 *
 * Quantile rule (log-resolution by design, one-sided like count-min's
 * overestimate): for target rank r = ceil(q·n), the estimate is the
 * UPPER BOUND (2^b − 1) of the first bucket whose cumulative count
 * reaches r — never below the true quantile's bucket, at most one
 * power-of-two above the true value. Pure integer arithmetic over the
 * counters, so DuckDB replays the whole sketch AND every estimate
 * value-for-value (bit length = `length(printf('%b', v))`). NULLs are
 * ignored.
 */
case class HistSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](65)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // integral widths vary by input type (Spark 4's AbstractDataType is
      // private, so no ImplicitCastInputTypes here); the builder casts to
      // long and this match keeps a directly-constructed int child from
      // dying in a mid-task ClassCastException
      val x = v match {
        case n: java.lang.Number => n.longValue()
        case other => throw new IllegalArgumentException(
          s"hist_sketch expects an integral column, got ${other.getClass}")
      }
      val b = if (x <= 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(x)
      buf(b) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "hist_sketch"
}

object HistSketch {
  import org.apache.spark.sql.functions._

  /** Aggregate an integral column into the 65-bucket log histogram (the
    * builder casts to long so int/short columns Just Work). */
  def histSketch(c: Column): Column =
    Shim.col(HistSketchAgg(Shim.expr(c.cast("long"))).toAggregateExpression())

  // upper bound of bucket b: 0 for b=0 (values ≤ 0), else 2^b − 1; the
  // b=63 entry wraps to Long.MaxValue, exactly the top of the long range.
  // A 64-literal lookup keeps the dynamic power inside plain built-ins
  // (same pattern as Bloom's bit masks).
  private val upperBounds: Column =
    array((0 until 64).map(b => lit(if (b == 0) 0L else (1L << b) - 1L)): _*)

  /** Quantile estimate from a sketch column at `q` (0 < q ≤ 1): the
    * upper bound 2^b − 1 of the first bucket whose cumulative count
    * reaches ceil(q·n); −1 for an empty sketch. Pure built-ins (one
    * `aggregate` fold over the 65 counters), mirroring the SQL replay. */
  def quantile(sketch: Column, q: Double): Column = {
    require(q > 0 && q <= 1, s"quantile must be in (0,1], got $q")
    // quantiles resolve in basis points; reject a finer q loudly rather
    // than silently rounding the rank away from the documented ceil(q·n)
    val bp = math.round(q * 10000)
    require(math.abs(q * 10000 - bp) < 1e-9,
      s"quantile granularity is 1e-4 (basis points); got $q")
    val n = aggregate(sketch, lit(0L), (acc, x) => acc + x)
    // ceil(q·n) in EXACT decimal arithmetic: n is cast to decimal BEFORE
    // the multiply (n·bp in long would overflow past ~9e14 rows at
    // q=0.99; double division would wobble past 2^53)
    val r = floor((n.cast("decimal(38,0)") * bp + lit(9999L)) / 10000)
      .cast("long")
    // fold over (count, index) pairs in bucket order: carry (cum, found)
    val found = aggregate(
      zip_with(sketch, sequence(lit(0), lit(64)),
        (c, i) => struct(c.as("c"), i.as("i"))),
      struct(lit(0L).as("cum"), lit(-1).as("b")),
      (acc, e) => struct(
        (acc("cum") + e("c")).as("cum"),
        when(acc("b") >= 0, acc("b"))
          .when(acc("cum") + e("c") >= r && e("c") > 0L, e("i"))
          .otherwise(lit(-1)).as("b")))
    when(n === 0L, lit(-1L))
      .otherwise(element_at(upperBounds, found("b") + 1))
  }
}

package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
 * summary: the count-min sketch and its applications", J. Algorithms
 * 2005) as a native Catalyst aggregate — the heavy-hitter counter for
 * streams too wide to count exactly: d×w counters answer "how often did
 * token x occur" within additive error n/w (never UNDER-estimating),
 * using d*w*8 bytes regardless of how many distinct tokens exist. The
 * web-scale use is gram/host frequency profiling: exact counting of
 * 10^11 distinct grams needs a gram-keyed shuffle of the whole corpus;
 * the sketch crosses the shuffle as one fixed 16 KB buffer per group,
 * merged by elementwise addition (the complement of [[KmvSketchAgg]]'s
 * bottom-k merge — together they cover both mergeable-sketch archetypes).
 *
 * Replayability contract (what the q83 oracle grades): row r of the
 * sketch hashes x to bucket `('0x' || substr(md5(x), 1+8r, 8))::BIGINT
 * % w` — four disjoint 32-bit slices of the same md5 both engines
 * compute — and every counter is an exact integer sum, so DuckDB
 * reproduces the entire sketch AND every probe estimate value-for-value.
 * NULL inputs are ignored.
 *
 * Output: the d×w counter matrix flattened row-major as array<long>;
 * probe with [[CountMin.probe]] (min over the d counters of x).
 */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 4,
    s"count-min depth must be in [1,4] (md5 has 4 disjoint 32-bit slices), got $depth")
  require(width >= 2, s"count-min width must be >= 2, got $width")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  // fail at analysis time, not as a mid-task ClassCastException: update()
  // reads the child as UTF8String, so demand a string child up front
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] ||
        child.dataType == NullType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"countmin_agg expects a string column, got ${child.dataType.catalogString}" +
        " — cast explicitly if the key is non-string")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = MessageDigest.getInstance("MD5")
        .digest(v.asInstanceOf[UTF8String].getBytes)
      var r = 0
      while (r < depth) {
        // 32-bit big-endian slice r of the digest == hex chars [8r, 8r+8)
        val slice =
          ((d(4 * r) & 0xffL) << 24) | ((d(4 * r + 1) & 0xffL) << 16) |
          ((d(4 * r + 2) & 0xffL) << 8) | (d(4 * r + 3) & 0xffL)
        buf(r * width + (slice % width).toInt) += 1L
        r += 1
      }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "count_min"
}

object CountMin {
  import org.apache.spark.sql.functions._

  /** Aggregate a string column into a d×w count-min sketch. */
  def countMin(c: Column, depth: Int, width: Int): Column =
    Shim.col(CountMinAgg(Shim.expr(c), depth, width).toAggregateExpression())

  /** Point estimate of `value`'s count from a sketch column: the minimum
    * of its d counters. Pure built-ins (element_at over the md5-slice
    * buckets), so it composes into any plan and mirrors the SQL replay. */
  def probe(sketch: Column, value: Column, depth: Int, width: Int): Column = {
    require(depth >= 1 && depth <= 4)
    val perRow = (0 until depth).map { r =>
      val bucket = conv(substring(md5(value), 1 + 8 * r, 8), 16, 10)
        .cast("long") % width
      element_at(sketch, (lit(r * width) + bucket + 1).cast("int"))
    }
    perRow.reduce(least(_, _))
  }
}

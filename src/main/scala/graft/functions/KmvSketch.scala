package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * KMV (k-minimum-values) distinct-count sketch as a native Catalyst
 * aggregate — the classic bottom-k estimator of Bar-Yossef, Jayram,
 * Kumar, Sivakumar, Trevisan, "Counting Distinct Elements in a Data
 * Stream" (RANDOM 2002): keep the k smallest hash values seen; if the
 * k-th smallest of a 2^60 hash space is h, the distinct count is about
 * (k-1) * 2^60 / h.
 *
 * Two properties make this one worth carrying as a first-class aggregate
 * rather than composing `collect_set`:
 *
 *  - **bounded state**: the aggregation buffer is at most k longs no
 *    matter how many rows a group holds — `collect_set` materializes the
 *    whole group. At 10^12 pages a per-host distinct-URL profile crosses
 *    the shuffle as ≤ k*8 bytes per host, combined map-side like any
 *    partial aggregate (Spark plans it as ObjectHashAggregate with a
 *    partial pass — merge is bottom-k of the union, order-insensitive).
 *  - **exact replayability**: unlike HLL, the sketch's content is a pure
 *    function of the input SET — the k smallest md5-prefix values, no
 *    RNG, no insertion-order effects — so the q81 DuckDB oracle grades
 *    the sketch AND the estimate value-for-value (the hash is the same
 *    `('0x' || substr(md5(x),1,15))::BIGINT` the holdout split uses, and
 *    the estimator is pure integer math: (k-1) * 2^60 // h).
 *
 * Output struct: sketch_size (#values kept), kth_hash (the k-th smallest
 * hash, null while the group has fewer than k distinct values),
 * est_distinct (exact size below k — the sketch IS the distinct set
 * there — else the KMV estimate). NULL inputs are ignored, matching
 * count(DISTINCT x) semantics.
 */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"kmv sketch needs k >= 2, got $k")

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
      s"kmv_sketch expects a string column, got ${child.dataType.catalogString}" +
        " — cast explicitly if the key is non-string")
  override def dataType: DataType = StructType(Seq(
    StructField("sketch_size", LongType, nullable = false),
    StructField("kth_hash", LongType, nullable = true),
    StructField("est_distinct", LongType, nullable = false),
    // the bottom-k hash values themselves (ascending) — the raw material
    // of sketch ALGEBRA: union = bottom-k of two sketches' concatenation,
    // Jaccard = |union-bottom-k present in both| / |union-bottom-k|
    // (Beyer et al., "On synopses for distinct-value estimation under
    // multiset operations", SIGMOD 2007). See q86.
    StructField("hashes", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** 60-bit hash: first 15 hex digits of md5(utf8) — numerically equal to
    * the SQL `('0x' || substr(md5(x),1,15))::BIGINT` on both engines. */
  private def hash60(s: UTF8String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes)
    // 15 hex digits = the top 7.5 bytes; build from the first 8 bytes and
    // drop the low nibble
    val top8 =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top8 >>> 4
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = hash60(v.asInstanceOf[UTF8String])
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { if (buf.add(h)) buf.remove(buf.last()) }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    buf.addAll(other)
    while (buf.size > k) buf.remove(buf.last())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val size = buf.size.toLong
    val hashes = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      buf.stream().mapToLong(_.longValue()).toArray)
    if (size < k) InternalRow(size, null, size, hashes)
    else {
      val kth = buf.last().longValue()
      val est = (BigInt(k - 1) * (BigInt(1) << 60) / BigInt(kth)).toLong
      InternalRow(size, kth, est, hashes)
    }
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "kmv_distinct"
}

object KmvSketch {
  /** Column-API entry: `df.groupBy(...).agg(KmvSketch.kmvDistinct(col, 16))`.
    * The child must be a string column (cast first for other types — the
    * hash is defined on the string image, same as the md5 oracles). */
  def kmvDistinct(c: Column, k: Int): Column =
    Shim.col(KmvSketchAgg(Shim.expr(c), k).toAggregateExpression())

  /**
   * All-pairs set algebra over per-source sketches (Beyer et al., SIGMOD
   * 2007): for every unordered pair of rows in `sketches`, the bottom-k of
   * the union of their hash arrays, the k-th union hash, the count of union
   * hashes present in BOTH sketches, and the Jaccard estimate in basis
   * points (integer division — exactly replayable relationally).
   *
   * **Pair-budget contract — this output is inherently O(S²)** in the
   * number of sources S: each combine costs only arithmetic over two ≤k
   * arrays (the point of the sketch — the corpus itself is never
   * re-touched), but the RESULT has S·(S−1)/2 rows. Fine to ~10³ sources
   * (≤5·10⁵ rows); at 10⁶ sources the caller MUST bound the pair space:
   *  - `pairs = Some(df)` — a (id_a, id_b) candidate table (e.g. same
   *    language, same crawl, an LSH prefilter on the sketches themselves);
   *    the cross join becomes two equi-joins and only listed pairs are
   *    computed;
   *  - `maxPairs = Some(n)` — a hard output cap (global limit AFTER the
   *    ordered pair filter) as a safety net against an accidental
   *    unbounded all-pairs run.
   *
   * @param sketches  one row per source: (idCol, hashesCol: array<long>
   *                  ascending bottom-k, as produced by `kmvDistinct`'s
   *                  `hashes` field)
   */
  def pairOverlap(
      sketches: DataFrame,
      idCol: String,
      hashesCol: String,
      k: Int,
      pairs: Option[DataFrame] = None,
      maxPairs: Option[Long] = None): DataFrame = {
    val a = sketches.select(col(idCol).as("source_a"), col(hashesCol).as("ha"))
    val b = sketches.select(col(idCol).as("source_b"), col(hashesCol).as("hb"))
    val paired = pairs match {
      case Some(p) =>
        // canonicalize the caller's pair list: unordered pairs in either
        // order, self-pairs and duplicates dropped
        val (pa, pb) = (col(idCol + "_a"), col(idCol + "_b"))
        p.select(least(pa, pb).as("source_a"), greatest(pa, pb).as("source_b"))
          .where(col("source_a") =!= col("source_b")).distinct()
          .join(a, "source_a").join(b, "source_b")
      case None => a.crossJoin(b).where(col("source_a") < col("source_b"))
    }
    val capped = maxPairs.fold(paired)(n => paired.limit(
      math.min(n, Int.MaxValue.toLong).toInt))
    capped
      .withColumn("u", slice(array_sort(array_union(col("ha"), col("hb"))), 1, k))
      .withColumn("union_k", size(col("u")).cast("long"))
      .withColumn("union_kth", element_at(col("u"), size(col("u"))))
      .withColumn("k_intersect", size(filter(col("u"),
        h => array_contains(col("ha"), h) && array_contains(col("hb"), h)))
        .cast("long"))
      .select(col("source_a"), col("source_b"), col("union_k"),
        col("union_kth"), col("k_intersect"),
        expr(s"k_intersect * 10000 div union_k").as("jaccard_bp"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
 * scale path beside the LSH buckets in [[Similarity]]:
 *
 *  1. `nlist` centroids trained with Lloyd iterations (k-means) — init is a
 *     deterministic hash-ordered sample, and per-cluster means accumulate in
 *     FIXED-POINT (value·2²⁰ as long): integer addition is order-independent,
 *     so the centroids — and therefore every downstream assignment — are
 *     bit-identical at any parallelism (a double-sum mean drifts with
 *     aggregation order and makes the index nondeterministic).
 *  2. every corpus vector is assigned to its nearest centroid (one slim
 *     (id, cluster) table — the inverted file).
 *  3. a query probes its `nprobe` nearest centroids and exact-reranks only
 *     those lists: the corpus×corpus/corpus×query cross never materializes.
 *
 * Centroid count is small (≤ a few thousand): the centroid table rides as a
 * broadcast closure into per-partition assignment kernels, the standard
 * shape for dense numeric scoring that expression trees handle poorly.
 */
object Ivf {

  /** Fixed-point scale for the deterministic centroid sums. 2²⁰ (≈1e-6
    * component precision, far below any centroid decision boundary) leaves
    * 2⁴³ ≈ 8.8e12 of summed unit-scale magnitude per cluster before a long
    * overflows — 2⁴⁰ capped out at ~8.4M rows/cluster and wrapped SILENTLY
    * (ADVICE r2). The adds below use Math.addExact so exceeding the budget
    * fails loudly instead of corrupting centroids. */
  private final val Fixed = 1L << 20

  /** Squared L2 — cheaper than cosine for assignment; for normalized-ish
    * vectors the argmin agrees, and probing is over centroids only. */
  private def dist2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private def nearest(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val d = dist2(v, cents(c))
      if (d < bestD || (d == bestD && c < best)) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def vecsOf(df: DataFrame, idCol: String, vecCol: String) =
    df.select(col(idCol).cast("long").as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))

  /**
   * Train `nlist` centroids. Returns them as a local array (they ARE the
   * broadcastable model — k·dim doubles).
   */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 5): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = vecsOf(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deterministic init: the nlist vectors with smallest xxhash64(id)
    var cents: Array[Array[Double]] = vecs
      .orderBy(xxhash64(col("__id")), col("__id"))
      .limit(nlist)
      .select("__v").as[Seq[Double]].collect().map(_.toArray)
    var it = 0
    while (it < iters) {
      val model = cents
      // fixed-point per-cluster sums: order-independent integer adds
      val sums = vecs.as[(Long, Seq[Double])]
        .mapPartitions(_.map { case (_, v) =>
          val arr = v.toArray
          (nearest(arr, model), arr.map(x => math.rint(x * Fixed).toLong), 1L)
        })
        .groupByKey(_._1)
        .reduceGroups { (a, b) =>
          val s = new Array[Long](a._2.length)
          var i = 0
          while (i < s.length) { s(i) = Math.addExact(a._2(i), b._2(i)); i += 1 }
          (a._1, s, a._3 + b._3)
        }
        .map(_._2)
        .collect()
      val next = cents.map(_.clone())
      sums.foreach { case (c, s, n) =>
        next(c) = s.map(x => x.toDouble / n / Fixed)
      }
      cents = next
      it += 1
    }
    vecs.unpersist(blocking = false)
    cents
  }

  /** The inverted file: (id, cluster) for every corpus vector. */
  def assignments(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    vecsOf(corpus, idCol, vecCol).as[(Long, Seq[Double])]
      .mapPartitions(_.map { case (id, v) => (id, nearest(v.toArray, cents)) })
      .toDF("neighbor_id", "cluster")
  }

  /** Probe lists per query: its `nprobe` nearest centroids. */
  def probes(queries: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]], nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    vecsOf(queries, idCol, vecCol).as[(Long, Seq[Double])]
      .mapPartitions(_.flatMap { case (id, v) =>
        val arr = v.toArray
        cents.indices
          .sortBy(c => (dist2(arr, cents(c)), c))
          .take(nprobe)
          .map(c => (id, c))
      })
      .toDF("query_id", "cluster")
  }

  /** Candidate pairs = probed lists joined to the inverted file. */
  def candidates(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, cents: Array[Array[Double]], nprobe: Int): DataFrame =
    probes(queries, idCol, vecCol, cents, nprobe)
      .join(assignments(corpus, idCol, vecCol, cents), Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()

  /**
   * IVF top-k: exact cosine rank over the probed candidates. Output shape
   * matches [[Similarity.bruteForceTopK]]: (query_id, neighbor_id, rank,
   * sim rounded 6 dp).
   */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      iters: Int = 5): DataFrame = {
    val cents = trainCentroids(corpus, idCol, vecCol, nlist, iters)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    candidates(queries, corpus, idCol, vecCol, cents, nprobe)
      .join(broadcast(queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).as("qv"))), Seq("query_id"))
      .join(corpus.select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).as("cv")), Seq("neighbor_id"))
      .withColumn("sim", round(Similarity.cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }
}

package graft

import graft.geo.Geo
import graft.functions.geo._
import graft.operators.ConflationPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the fused match_score expression to the composed chain it replaced
 * (locate_along ×2 + line_slice_along + directed_hausdorff_km with the
 * rev/overlap gates in Column form): same survivors, bit-identical score
 * and geometry doubles. The generator is a deterministic hash walk (no RNG
 * state), covering near/far/reversed/short/degenerate pairs.
 */
class MatchScoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val MinOv = ConflationPipeline.MinOverlapKm
  private val MaxH = ConflationPipeline.MatchHausdorffKm

  /** Deterministic pseudo-random double in [0,1) from a seed chain. */
  private def h(seed: Long): Double = {
    var x = seed * 0x9E3779B97F4A7C15L
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
    (x >>> 11).toDouble / (1L << 53).toDouble
  }

  /** Polyline of n points walking roughly east from a seeded origin. */
  private def line(seed: Long, n: Int, jitterDeg: Double): Seq[Seq[Double]] = {
    val lon0 = -73.9 + h(seed) * 0.2
    val lat0 = 42.6 + h(seed + 1) * 0.2
    (0 until n).map { i =>
      Seq(lon0 + i * 0.004 + (h(seed + 2 + i) - 0.5) * jitterDeg,
          lat0 + (h(seed + 100 + i) - 0.5) * jitterDeg)
    }
  }

  /** (refLine, featLine, revOk) cases: overlapping, reversed feature,
    * disjoint, short-overlap, single-point edge. */
  private def cases: Seq[(Seq[Seq[Double]], Seq[Seq[Double]], Boolean)] = {
    val base = (0 until 40).map { k =>
      val r = line(k * 7L, 3 + (k % 9), 0.0002)
      // feature: a jittered sub-walk of the same corridor (matching) or a
      // shifted one (non-matching), sometimes reversed
      val f0 =
        if (k % 3 == 0) line(k * 7L, 3 + (k % 7), 0.0006) // same corridor
        else if (k % 3 == 1) line(k * 7L + 1000L, 4, 0.0002) // different corridor
        else r.map(p => Seq(p(0) + 0.0001, p(1) + 0.0001)).take(4) // offset copy
      val f = if (k % 5 == 0) f0.reverse else f0
      (r, f, k % 2 == 0)
    }
    val edge = Seq(
      (line(900L, 2, 0.0), line(900L, 2, 0.0), true), // identical 2-pointers
      (line(901L, 5, 0.0003), line(901L, 1, 0.0), false), // 1-point feature
      (line(902L, 2, 0.0), line(902L, 5, 0.0004), true)
    )
    base ++ edge
  }

  /** The pre-fusion composed chain, in Column form, over (r_geom, f_geom,
    * revOk) — copied from the r3 scoredCandidates body. */
  private def composed(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val fFirst = element_at($"f_geom", 1)
    val fLast = element_at($"f_geom", -1)
    df
      .withColumn("s0", locate_along($"r_geom", element_at(fFirst, 1), element_at(fFirst, 2)))
      .withColumn("e0", locate_along($"r_geom", element_at(fLast, 1), element_at(fLast, 2)))
      .withColumn("rev", $"revOk" && ($"s0" - $"e0" > lit(MinOv)))
      .withColumn("s_raw", when($"rev", $"e0").otherwise($"s0"))
      .withColumn("e_raw", when($"rev", $"s0").otherwise($"e0"))
      .filter($"e_raw" - $"s_raw" > lit(MinOv))
      .withColumn("match_geom", line_slice_along($"r_geom", $"s_raw", $"e_raw"))
      .withColumn("score", directed_hausdorff_km($"match_geom", $"f_geom"))
      .filter($"score" <= lit(MaxH))
      .select($"id", $"score", $"match_geom".as("geometry"))
  }

  private def fused(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumn("msc", match_score($"r_geom", $"f_geom", $"revOk", MinOv, MaxH))
      .filter($"msc".isNotNull)
      .select($"id", $"msc.score".as("score"), $"msc.geometry".as("geometry"))

  test("fused match_score ≡ composed chain: same survivors, bit-identical values") {
    val df = cases.zipWithIndex.map { case ((r, f, rev), i) => (i.toLong, r, f, rev) }
      .toDF("id", "r_geom", "f_geom", "revOk")
      .withColumn("r_geom", $"r_geom".cast("array<array<double>>"))
      .withColumn("f_geom", $"f_geom".cast("array<array<double>>"))
    val want = composed(df).collect().map(r =>
      r.getLong(0) -> (r.getDouble(1), r.getSeq[Seq[Double]](2))).toMap
    val got = fused(df).collect().map(r =>
      r.getLong(0) -> (r.getDouble(1), r.getSeq[Seq[Double]](2))).toMap
    assert(got.keySet == want.keySet, "survivor sets differ")
    assert(want.nonEmpty, "generator produced no survivors — weak test")
    assert(got.size < cases.size, "generator produced no gated-out pairs — weak test")
    for ((id, (score, geom)) <- want) {
      val (gs, gg) = got(id)
      assert(java.lang.Double.doubleToLongBits(gs) == java.lang.Double.doubleToLongBits(score),
        s"score mismatch at id=$id: $gs vs $score")
      assert(gg == geom, s"geometry mismatch at id=$id")
    }
  }

  test("match_summary ≡ summarized match_score.geometry, field for field") {
    val df = cases.zipWithIndex.map { case ((r, f, rev), i) => (i.toLong, r, f, rev) }
      .toDF("id", "r_geom", "f_geom", "revOk")
      .withColumn("r_geom", $"r_geom".cast("array<array<double>>"))
      .withColumn("f_geom", $"f_geom".cast("array<array<double>>"))
    // summary recomputed from match_score's materialized geometry
    val g = $"msc.geometry"
    val want = df
      .withColumn("msc", match_score($"r_geom", $"f_geom", $"revOk", MinOv, MaxH))
      .filter($"msc".isNotNull)
      .select($"id", $"msc.score".as("score"), size(g).as("mNumPts"),
        element_at(element_at(g, 1), 1).as("msLon"),
        element_at(element_at(g, 1), 2).as("msLat"),
        element_at(element_at(g, -1), 1).as("meLon"),
        element_at(element_at(g, -1), 2).as("meLat"),
        geodesic_length_km(g).as("mLenKm"),
        array_min(transform(g, p => element_at(p, 1))).as("mMinLon"),
        array_min(transform(g, p => element_at(p, 2))).as("mMinLat"),
        array_max(transform(g, p => element_at(p, 1))).as("mMaxLon"),
        array_max(transform(g, p => element_at(p, 2))).as("mMaxLat"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val got = df
      .withColumn("msc", match_summary($"r_geom", $"f_geom", $"revOk", MinOv, MaxH))
      .filter($"msc".isNotNull)
      .select($"id", $"msc.score", $"msc.mNumPts", $"msc.msLon", $"msc.msLat",
        $"msc.meLon", $"msc.meLat", $"msc.mLenKm",
        $"msc.mMinLon", $"msc.mMinLat", $"msc.mMaxLon", $"msc.mMaxLat")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(got.keySet == want.keySet, "survivor sets differ")
    assert(want.nonEmpty, "no survivors — weak test")
    for ((id, w) <- want)
      assert(got(id) == w, s"summary mismatch at id=$id: ${got(id)} vs $w")
  }

  test("fused kernel matches composed kernels point-for-point off-Spark") {
    for ((r, f, revOk) <- cases) {
      val ra = r.map(_.toArray).toArray
      val fa = f.map(_.toArray).toArray
      val s0 = Geo.locateAlong(ra, fa.head(0), fa.head(1))
      val e0 = Geo.locateAlong(ra, fa.last(0), fa.last(1))
      val rev = revOk && (s0 - e0 > MinOv)
      val sRaw = if (rev) e0 else s0
      val eRaw = if (rev) s0 else e0
      val expected =
        if (!(eRaw - sRaw > MinOv)) None
        else {
          val m = Geo.lineSliceAlong(ra, sRaw, eRaw)
          val sc = Geo.directedHausdorffKm(m, fa)
          if (sc <= MaxH) Some((sc, m.map(_.toSeq).toSeq)) else None
        }
      val rx = ra.map(_(0)); val ry = ra.map(_(1))
      val fx = fa.map(_(0)); val fy = fa.map(_(1))
      val res = Option(Geo.matchScoreFlat(rx, ry, fx, fy, revOk, MinOv, MaxH))
        .map(mr => (mr.score, mr.line.grouped(2).map(_.toSeq).toSeq))
      assert(res.map(_._1.##) == expected.map(_._1.##) && res.map(_._2) == expected.map(_._2),
        s"kernel mismatch: $res vs $expected")
    }
  }
}

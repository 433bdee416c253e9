package graft

import graft.synth.Synth
import org.scalatest.funsuite.AnyFunSuite

/**
 * The generators hash incrementally off FNV fold states instead of
 * allocating concatenated strings (BENCH.md round 4b: the string forms were
 * the largest measured CPU+GC tax of the 6.4M scaling run). These tests pin
 * bit-identity of every fast path against the naive `hash64(a + b)` form the
 * round-3 generators used — any drift would silently change the whole
 * synthetic world.
 */
class SynthHashSpec extends AnyFunSuite {

  test("fnvFold state composition == hash64 of the concatenation") {
    val parts = Seq("", "a", "road/17", "https://example.test/albany/road3/page9",
      "ümlaut/πath", "n36001r123s2")
    val suffixes = Seq("", "/w", "/len", "/road", "/jx")
    for (a <- parts; b <- suffixes)
      assert(Synth.fmix64(Synth.fnvFold(Synth.fnvFold(Synth.FnvSeed, a), b))
        === Synth.hash64(a + b), s"'$a' + '$b'")
  }

  test("fnvFoldDigits == folding the decimal string, over digit-count edges") {
    val vals = Seq(0L, 1L, 9L, 10L, 11L, 99L, 100L, 101L, 999L, 1000L,
      123456L, 9999999999L, Long.MaxValue)
    for (v <- vals; pre <- Seq("", "x/", "road/42/w")) {
      val st = Synth.fnvFold(Synth.FnvSeed, pre)
      assert(Synth.fnvFoldDigits(st, v) === Synth.fnvFold(st, v.toString), s"$pre$v")
    }
  }

  test("pageText matches the per-word string-hash construction") {
    val words = Vector("road", "traffic", "segment", "bridge", "county", "route",
      "travel", "miles", "lane", "speed", "network", "junction", "survey", "annual")
    for (i <- 0L until 500L) {
      val url = Synth.pageUrl(i, 97)
      val n = 20 + Synth.hmod(url + "/len", 60)
      val sb = new StringBuilder(s"Report for $url.")
      var k = 0
      while (k < n) {
        sb.append(' ').append(words(Synth.hmod(s"$url/w$k", words.length)))
        if (k % 9 == 8) sb.append('.')
        k += 1
      }
      assert(Synth.pageText(url) === sb.append('.').toString, url)
    }
  }

  test("page fields match the string-hash construction") {
    for (i <- 0L until 300L) {
      val p = Synth.page(i, 97)
      assert(p.lang === Vector("en", "de", "es")(Synth.hmod(p.url + "/lang", 3)))
      assert(p.warc_ts.getTime ===
        1735689600000L + (Synth.hash64(p.url) >>> 40))
    }
  }

  test("roadCoords matches the string-hash construction") {
    for (r <- 0 until 200) {
      val seed = s"road/$r"
      val g = Synth.gridCols(997)
      var lon = Synth.Lon0 + Synth.hmod(seed + "/c", g) * Synth.CellDeg
      var lat = Synth.Lat0 + Synth.hmod(seed + "/r", g) * Synth.CellDeg
      val nV = 8 + Synth.hmod(seed + "/n", 9)
      val baseDir = Synth.hfrac(seed + "/d") * 2 * math.Pi
      val exp = Array.newBuilder[Array[Double]]
      var i = 0
      while (i < nV) {
        exp += Array(lon, lat)
        val dir = baseDir + (Synth.hfrac(s"$seed/w$i") - 0.5) * 0.9
        val step = 0.0015 + Synth.hfrac(s"$seed/s$i") * 0.0015
        lon += math.cos(dir) * step
        lat += math.sin(dir) * step * 0.75
        i += 1
      }
      val got = Synth.roadCoords(r, 997)
      assert(got.map(_.toSeq).toSeq === exp.result().map(_.toSeq).toSeq, s"road $r")
    }
  }

  test("featureId and geocode jitter match the string-hash construction") {
    for (i <- 0L until 300L) {
      val url = Synth.pageUrl(i, 97)
      val road = Synth.hmod(url + "/road", 97)
      val tm = if (Synth.hmod(url + "/tm", 2) == 0) "npmrds_2026" else "ris_2026"
      val slot = Synth.hmod(url + "/slot", Synth.SlotsPerRoad)
      val expId = s"${tm.take(1)}36001r${road}s$slot"
      assert(Synth.featureId(url, 97) === expId)
      val f = Synth.geocode(url, 97)
      assert(f.id === expId)
      // jitter: recompute the first vertex from the string-hash form
      val coords = Synth.roadCoords(road, 97)
      val roadLen = graft.geo.Geo.lengthKm(coords)
      val a = slot * roadLen / Synth.SlotsPerRoad
      val b = (slot + 1) * roadLen / Synth.SlotsPerRoad
      val slice = graft.geo.Geo.lineSliceAlong(coords, a, b)
      val exp0 = Seq(
        slice.head(0) + (Synth.hfrac(s"$expId/jx0") - 0.5) * 1.2e-4,
        slice.head(1) + (Synth.hfrac(s"$expId/jy0") - 0.5) * 0.8e-4)
      assert(f.geometry.head === exp0, url)
    }
  }
}

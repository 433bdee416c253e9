package graft

import graft.operators.TextQuality
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Repetition gates, decontamination, and URL canonicalization semantics. */
class TextQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("repetition stats: hand-computed document") {
    // 4 lines, 'same line' twice → dup_line_frac 1 - 3/4 = 0.25;
    // dup chars = 9 of 9+9+8+4 = 30 → 0.3
    val df = Seq((1L, "same line. same line. uniq one. tail.")).toDF("doc_id", "text")
    val r = TextQuality.repetitionStats(df, "doc_id", "text").collect().head
    assert(r.getAs[Int]("n_lines") == 4)
    assert(r.getAs[Double]("dup_line_frac") == 0.25)
    assert(r.getAs[Double]("dup_char_frac") == 0.3)
    // 2-grams: 'same line' x2, 'line same' x1, 'line uniq' 1, 'uniq one' 1,
    // 'one tail' 1 → top is ('same line', 2); joined text len = 33
    assert(r.getAs[String]("top2_gram") == "same line")
    assert(r.getAs[Double]("top2_frac") ==
      math.rint(2.0 * 9 / 33 * 1e6) / 1e6)
    assert(!r.getAs[Boolean]("flagged") ||
      r.getAs[Double]("top2_frac") > 0.18) // flag consistent with thresholds
  }

  test("repetition stats: heavy repetition flags, single word doesn't crash") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam."),
      (2L, "word.")).toDF("doc_id", "text")
    val rows = TextQuality.repetitionStats(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Boolean]("flagged")) // 'spam spam' dominates
    assert(rows(2L).getAs[String]("top2_gram") == "")
    assert(rows(2L).getAs[Double]("top2_frac") == 0.0)
    assert(!rows(2L).getAs[Boolean]("flagged"))
  }

  test("repetition top-gram tie-break is deterministic (count desc, gram desc)") {
    // 'a b' and 'b a' both occur twice → pick lexicographically larger 'b a'
    val df = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val r = TextQuality.repetitionStats(df, "doc_id", "text").collect().head
    assert(r.getAs[String]("top2_gram") == "b a")
  }

  test("decontaminate: planted eval overlap flags exactly the sharing docs") {
    val eval = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "xx quick brown fox jumps yy"), // shares 'quick brown fox jumps'
      (2L, "the quick brown wolf howls"), // no shared 4-gram
      (3L, "brown fox jumps over the lazy dog extra"), // multiple shared
      (4L, "tiny")) // < 4 words
      .toDF("doc_id", "text")
    val r = TextQuality.decontaminate(train, eval, "doc_id", "text", n = 4)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_hit_grams"), x.getAs[Boolean]("contaminated"))).toMap
    assert(r(1L) == (1L, true))
    assert(r(2L) == (0L, false))
    assert(r(3L)._1 == 4L && r(3L)._2)
    assert(r(4L) == (0L, false))
    assert(r.size == 4) // every training doc present, eval docs absent
  }

  test("decontaminate plan broadcasts the eval gram set") {
    val docs = (0L until 200L).map(i => (i, s"w$i x$i y$i z$i a b c d")).toDF("doc_id", "text")
    val plan = TextQuality.decontaminate(
      docs.where($"doc_id" % 50 =!= 0), docs.where($"doc_id" % 50 === 0),
      "doc_id", "text", 4).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"expected broadcast semi join in:\n$plan")
  }

  test("canonical url: scheme/host lowering, port, www, fragment, slash") {
    val cases = Seq(
      "HTTPS://WWW.Example.COM:443/p/1#frag" -> "https://example.com/p/1",
      "https://example.com:443" -> "https://example.com",
      "http://a.b:80/x" -> "http://a.b/x",
      "http://a.b:8080/x" -> "http://a.b:8080/x", // non-default port kept
      "https://News.co.uk/p/Q" -> "https://news.co.uk/p/Q", // path case kept
      "https://x.de/p/2/" -> "https://x.de/p/2")
    val got = cases.map(_._1).toDF("u")
      .select(TextQuality.canonicalUrl($"u")).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, w) => assert(g == w, s"want $w got $g") }
  }

  test("registrable domain: 2-label, ccSLD, deep subdomain, www") {
    val cases = Seq(
      "https://www.example.com/p" -> "example.com",
      "https://a.b.news.co.uk/p" -> "news.co.uk",
      "https://cdn.site3.org/p" -> "site3.org",
      "HTTPS://Site.DE/p" -> "site.de")
    val got = cases.map(_._1).toDF("u")
      .select(TextQuality.registrableDomain($"u")).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, w) => assert(g == w, s"want $w got $g") }
  }

  test("repetition/canon kernels are zero-shuffle pure projections") {
    val df = Seq((1L, "https://x.com/p")).toDF("doc_id", "url")
    val plan = df.select(TextQuality.canonicalUrl($"url"),
      TextQuality.registrableDomain($"url")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"url kernel must not shuffle:\n$plan")
  }

  test("schemeless / protocol-relative URLs pass through instead of " +
      "collapsing to the empty string") {
    val got = Seq(
      "example.com/Path?q=1",        // schemeless href
      "//cdn.example.com/x/",        // protocol-relative
      "www.example.com/a#frag")      // schemeless with www + fragment
      .toDF("u").select(TextQuality.canonicalUrl($"u")).as[String].collect()
    assert(got.forall(_.nonEmpty), got.toSeq.toString)
    // fragment and trailing slash still stripped on the fallback path
    assert(got(1) == "//cdn.example.com/x", got(1))
    assert(got(2) == "www.example.com/a", got(2))
    // every distinct input stays distinct — nothing merges into one key
    assert(got.distinct.length == 3)
    val doms = Seq("example.com/Path", "www.news.co.uk/x")
      .toDF("u").select(TextQuality.registrableDomain($"u")).as[String].collect()
    assert(doms.toSeq == Seq("example.com", "news.co.uk"), doms.toSeq.toString)
  }
}

package graft

import graft.operators.ExactSubstr
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExactSubstrSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], n: Int = 8): Set[(Long, Long, Long, Long)] =
    ExactSubstr.repeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .as[(Long, Long, Long, Long)].collect().toSet

  // 12 distinct filler words so no accidental 8-gram repeats
  private val fillerA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val fillerB = "nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
  private val passage = "one two three four five six seven eight nine ten eleven twelve"

  test("a shared 12-word passage is recovered exactly in both documents") {
    // doc 1: passage at positions 13..24 (after 12 filler words);
    // doc 2: passage at positions 1..12
    val got = spans(Seq(
      1L -> s"$fillerA $passage",
      2L -> s"$passage $fillerB"))
    assert(got == Set((1L, 13L, 24L, 12L), (2L, 1L, 12L, 12L)))
  }

  test("an intra-document doubled passage merges into one maximal span") {
    // passage twice back-to-back: period-12 text, so gram(p) == gram(p+12)
    // for p=1..5 and the flagged starts are {1..5, 13..17}; the 5→13 gap
    // is exactly n=8, which the islands rule merges (touching windows), so
    // the span covers 1..24; the other doc pins the passage corpus-wide
    val got = spans(Seq(
      1L -> s"$passage $passage",
      2L -> s"$fillerB $passage"))
    assert(got.contains((1L, 1L, 24L, 24L)))
    assert(got.contains((2L, 13L, 24L, 12L)))
  }

  test("two repeats separated by more than n tokens stay separate spans") {
    // 12 filler tokens (> n=8) between two planted passages
    val p2 = "red orange yellow green blue indigo violet black white gray pink brown"
    val got = spans(Seq(
      1L -> s"$passage $fillerA $p2",
      2L -> s"$passage $fillerB $p2"))
    // doc 1: passage at 1..12, p2 at 25..36 — two islands, gap 13..24 unique
    assert(got.filter(_._1 == 1L) ==
      Set((1L, 1L, 12L, 12L), (1L, 25L, 36L, 12L)))
  }

  test("documents shorter than n tokens and unique documents emit nothing") {
    val got = spans(Seq(
      1L -> "tiny doc",
      2L -> fillerA,
      3L -> fillerB))
    assert(got.isEmpty)
  }

  test("span boundaries are exact: no bleed into unique neighbors") {
    // unique prefix of 5 tokens, then the repeated passage: span starts at 6
    val got = spans(Seq(
      1L -> s"zero uno dos tres cuatro $passage",
      2L -> s"$passage"))
    assert(got == Set((1L, 6L, 17L, 12L), (2L, 1L, 12L, 12L)))
  }

  test("parallelism does not change the spans") {
    val docsSeq = (0L until 40L).map(i =>
      i -> (if (i % 3 == 0) s"$fillerA $passage" else s"doc $i " + fillerB))
    val a = spans(docsSeq)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    val b = try spans(docsSeq)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(a == b && a.nonEmpty)
  }

  test("string document ids (urls) keep their identity — no silent " +
      "long-cast to null") {
    import spark.implicits._
    val docs = Seq(
      "https://a.test/1" -> s"$fillerA $passage",
      "https://b.test/2" -> s"$passage $fillerB")
      .toDF("url", "text")
    val got = graft.operators.ExactSubstr.repeatedSpans(docs, "url", "text")
      .select("doc_id").as[String].collect().toSet
    assert(got == Set("https://a.test/1", "https://b.test/2"), got.toString)
  }
}

package graft

import graft.operators.WebGraph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WebGraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Independent in-memory replay of the exact integer recurrence —
    * a second implementation, not a call into the operator. */
  private def refRanks(edges: Set[(Long, Long)], iters: Int,
      scale: Long = 1000000L): Map[Long, Long] = {
    val e = edges.filter { case (s, d) => s != d }
    val nodes = e.flatMap { case (s, d) => Seq(s, d) }
    val outdeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> scale).toMap
    (1 to iters).foreach { _ =>
      val in = e.toSeq.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / outdeg(s) }.sum).toMap
      r = nodes.map(n => n -> (15L * scale + 85L * in.getOrElse(n, 0L)) / 100L).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    WebGraph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("matches the integer recurrence on a hand-built graph") {
    // hub (0) pointed at by everyone; a 2-cycle (3<->4); a dangling sink (9)
    val edges = Seq(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      3L -> 4L, 4L -> 3L, 0L -> 9L, 1L -> 9L)
    val got = run(edges, 10)
    val want = refRanks(edges.toSet, 10)
    assert(got == want)
    // the hub outranks its pure followers; the sink got mass but gives none
    assert(got(0L) > got(2L))
    assert(got(9L) > got(2L))
  }

  test("duplicate edges and self-loops do not change the result") {
    val clean = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L)
    val dirty = clean ++ Seq(1L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 3L)
    assert(run(clean, 6) == run(dirty, 6))
  }

  test("bit-identical across parallelism and iteration-by-iteration stable") {
    val edges = (0L until 200L).flatMap(i =>
      Seq(i % 29 -> (i * 7 + 1) % 29, i % 29 -> (i * 13 + 3) % 29))
    val a = run(edges, 10)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    val b = try run(edges, 10)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(a == b)
    assert(a == refRanks(edges.toSet, 10))
  }

  test("total mass is conserved-or-lost, never created") {
    // every new rank is (15*scale + 85*in)/100 floored; summed over nodes
    // the in-mass is at most the out-mass, so total never exceeds n*scale
    val edges = (0L until 50L).map(i => i % 11 -> (i * 3 + 1) % 11)
    val r = run(edges, 10)
    assert(r.values.sum <= r.size * 1000000L)
    assert(r.values.forall(_ >= 150000L)) // the damping floor
  }

  test("string node ids are rejected loudly, not silently nulled to an " +
    "empty result") {
    val hosts = Seq(("a.com", "b.com"), ("b.com", "a.com"))
      .toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      WebGraph.pageRank(hosts, "src", "dst", 2)
    }
    assert(e.getMessage.contains("xxhash64"))
    // the recipe the message prescribes works: hash explicitly, join back
    val hashed = hosts.select(xxhash64(col("src")).as("src"),
      xxhash64(col("dst")).as("dst"))
    val ranks = WebGraph.pageRank(hashed, "src", "dst", 2)
    val byHost = hosts.select(col("src").as("host")).distinct()
      .join(ranks, xxhash64(col("host")) === col("node"))
    assert(byHost.count() == 2)
  }

}

package graft

import graft.operators.AsOf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val snaps = Seq(
    // (key, ts, payload)
    (1L, 100L, "v1a"), (1L, 200L, "v1b"), (1L, 300L, "v1c"),
    (2L, 150L, "v2a")
  ).toDF("k", "sts", "payload")

  private def join(events: Seq[(Long, Long, Long)]) =
    AsOf.asofJoin(events.toDF("id", "k", "ts"), snaps,
      Seq("k"), "ts", "sts")
      .select(col("id"), col("payload"))
      .as[(Long, Option[String])].collect().toMap

  test("picks the latest version at-or-before; boundary is inclusive; " +
      "pre-history rows survive with null") {
    val got = join(Seq(
      (10L, 1L, 99L),   // before first version → null
      (11L, 1L, 100L),  // exactly at v1a → v1a (>= boundary)
      (12L, 1L, 199L),  // just before v1b → v1a
      (13L, 1L, 200L),  // exactly at v1b → v1b
      (14L, 1L, 250L),  // between → v1b
      (15L, 1L, 999L),  // after last → v1c (open-ended interval)
      (16L, 2L, 150L),  // other key
      (17L, 3L, 500L))) // key with no history → null
    assert(got == Map(
      10L -> None, 11L -> Some("v1a"), 12L -> Some("v1a"),
      13L -> Some("v1b"), 14L -> Some("v1b"), 15L -> Some("v1c"),
      16L -> Some("v2a"), 17L -> None))
  }

  test("emits exactly one row per left row (intervals partition the " +
      "timeline — no pair blow-up)") {
    val events = (0L until 500L).map(i => (i, 1L + i % 3, i % 400))
    val out = AsOf.asofJoin(events.toDF("id", "k", "ts"), snaps,
      Seq("k"), "ts", "sts")
    assert(out.count() == 500L)
    assert(out.select("id").distinct().count() == 500L)
  }

  test("parallelism-invariant") {
    val events = (0L until 300L).map(i => (i, 1L + i % 4, (i * 7) % 400))
    def run() = AsOf.asofJoin(events.toDF("id", "k", "ts"), snaps,
      Seq("k"), "ts", "sts")
      .select(col("id"), col("payload"))
      .as[(Long, Option[String])].collect().toSet
    val a = run()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    val b = try run()
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(a == b)
  }

  test("duplicate (key, ts) versions: the surviving payload is a pure " +
      "function of the data, not of partitioning") {
    // two versions of key 9 at the SAME timestamp with different payloads
    val dupSnaps = Seq((9L, 100L, "pA"), (9L, 100L, "pB"), (9L, 300L, "pC"))
      .toDF("k", "sts", "payload")
    val events = Seq((1L, 9L, 200L)).toDF("id", "k", "ts")
    def run(parts: Int) = AsOf.asofJoin(
      events, dupSnaps.repartition(parts), Seq("k"), "ts", "sts")
      .select("payload").as[String].collect().toSeq
    val results = Seq(1, 3, 7, 8).map(run)
    assert(results.head.length == 1) // still exactly one row per event
    assert(results.distinct.size == 1, results.toString) // same winner always
  }

  test("the only Window in the plan is over the snapshot side, never the " +
      "event stream") {
    val events = (0L until 50L).map(i => (i, 1L, i)).toDF("id", "k", "ts")
    val plan = AsOf.asofJoin(events, snaps, Seq("k"), "ts", "sts")
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    // the window subtree must scan the 4-row snapshot relation, not events
    windows.foreach { w =>
      val leaves = w.child.collectLeaves().map(_.toString).mkString
      assert(!leaves.contains("id#"), leaves)
    }
  }

  test("right payload named valid_to survives intact — the interval " +
    "bookkeeping column cannot collide with any prefixed right column") {
    val right = Seq((1L, 100L, 777L), (1L, 200L, 888L))
      .toDF("k", "sts", "valid_to")
    val left = Seq((10L, 1L, 250L), (11L, 1L, 150L)).toDF("id", "k", "ts")
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts", "sts")
    assert(out.columns.toSeq == Seq("id", "k", "ts", "valid_to"))
    val got = out.select(col("id"), col("valid_to"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 888L, 11L -> 777L)) // caller DATA, not lead()
  }

  test("left/right payload name collision is rejected up front instead of " +
    "emitting duplicate output columns") {
    val right = Seq((1L, 100L, "x")).toDF("k", "sts", "payload")
    val left = Seq((10L, 1L, 250L, "y")).toDF("id", "k", "ts", "payload")
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoin(left, right, Seq("k"), "ts", "sts")
    }
    assert(e.getMessage.contains("payload"))
  }

}

package graft.operators

import graft.functions.geo.densify
import graft.model.{ShstReference, TargetMapFeature}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Fixpoint match driver (SURVEY.md G9/G11): the reference retries unmatched
 * features through up to 4 iterations of progressively different matcher
 * configurations — motorway/surface passes, a densified-geometry pass, an
 * OSRM reroute pass (SharedStreetsMatcher.js:282-357) — looping until no
 * progress (the effective maxIterations=∞ quirk, loadMatchesForTargetMap.js:3-13).
 *
 * Spark re-expression: a driver-side loop over Datasets. Each pass matches
 * only the still-unmatched features (left-anti join on matched ids — the
 * reference's skip-set, ShstMatchingWorkDatabaseService.js:120-144), with a
 * per-pass candidate gate and optional geometry densification (the
 * attempt-2 analog; OSRM rerouting has no counterpart here — our matcher IS
 * the router replacement). Results are localCheckpoint'd per iteration so
 * lineage doesn't grow across passes.
 */
object FixpointMatcher {

  /** One matcher configuration (a "pass" in the reference's retry loop). */
  final case class MatchPass(hausdorffKm: Double, densifyGeometry: Boolean)

  /** Default schedule ≈ the reference's strict-then-lenient progression. */
  val DefaultPasses: Seq[MatchPass] = Seq(
    MatchPass(0.015, densifyGeometry = false),
    MatchPass(ConflationPipeline.MatchHausdorffKm, densifyGeometry = false),
    MatchPass(ConflationPipeline.MatchHausdorffKm, densifyGeometry = true),
    MatchPass(0.04, densifyGeometry = true))

  /**
   * Run the fixpoint loop; returns all matches with `matchIterationId`
   * recording the pass that produced each row (the reference stamps
   * matchBatchId the same way).
   */
  def matchWithRetries(features: Dataset[TargetMapFeature], refs: Dataset[ShstReference],
      passes: Seq[MatchPass] = DefaultPasses): DataFrame = {
    val spark = features.sparkSession
    var unmatched: DataFrame = features.toDF().localCheckpoint(true)
    var acc: Option[DataFrame] = None
    var i = 0
    var progress = true
    while (i < passes.length && progress && !unmatched.isEmpty) {
      val pass = passes(i)
      val attempt =
        if (pass.densifyGeometry) unmatched.withColumn("geometry", densify(col("geometry")))
        else unmatched
      val typed = attempt.as[TargetMapFeature](features.encoder)
      val cand = ConflationPipeline.matchCandidates(typed, refs)
      val scored = ConflationPipeline.scoredCandidates(cand, pass.hausdorffKm)
      val m = MatchPostProcessor(scored, iterationId = i).toDF().localCheckpoint(true)
      val nNew = m.count()
      progress = nNew > 0
      if (progress) {
        acc = Some(acc.map(_.unionByName(m)).getOrElse(m))
        val matchedIds = m.select(col("targetMap"), col("targetMapId")).distinct()
        unmatched = unmatched.join(matchedIds,
          unmatched("targetMap") === matchedIds("targetMap") &&
            unmatched("targetMapId") === matchedIds("targetMapId"),
          "left_anti").localCheckpoint(true)
      }
      i += 1
    }
    acc.getOrElse(spark.emptyDataFrame)
  }
}

package graft.operators

import graft.functions.geo._
import graft.geo.Geo
import graft.model._
import graft.synth.Synth
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * The Spark-native conflation pipeline (SURVEY.md §7.1), end to end:
 *
 *   pages ─geocode→ features ─cell-keyed candidate join→ scored matches
 *     ─per-reference kernel (flatMap after a single-shuffle collect_list join)→
 *   conflation segments ─window/global-id→ output + tiles + QA
 *
 * Scale posture:
 *  - ONE shuffle keys the central join (J2) on shst_reference_id; the
 *    per-reference kernel then runs as a map over the joined rows (groups
 *    are one road segment + its matches — tiny, bounded).
 *  - Candidate generation is an equi-join on spatial cell ids (the H3/S2
 *    analog) — no cross product, prunable, saltable on hot cells.
 *  - Global ordered ids use range-partitioned sort + per-partition offsets,
 *    never a single-partition window.
 */
object ConflationPipeline {

  /** Candidate-join cell level: ~430 m × 300 m cells at this latitude. */
  val CellLevel = 16
  /** Max symmetric Hausdorff (km) between match slice and feature. */
  val MatchHausdorffKm = 0.025
  /** Minimum overlap interval length (km) for a candidate match. */
  val MinOverlapKm = ConflationKernel.SplitBuffKm

  // ---------------------------------------------------------------- inputs

  /** Distributed deterministic pages table: generated per-index on executors
    * (no driver materialization, no data shipping). */
  def pages(spark: SparkSession, n: Long, nRoads: Int): Dataset[WebPage] = {
    import spark.implicits._
    spark.range(n).map(i => Synth.page(i, nRoads))
  }

  /** Graft geocoder: page → target-map feature; `text` carried byte-identical.
    * Distinct pages may geocode to the same feature id; dedupe is
    * first-writer-wins like the reference's PK-conflict swallowing
    * (SURVEY §5.1.8) — deterministically, the lexicographically-first url. */
  def features(pagesDs: Dataset[WebPage], nRoads: Int): Dataset[TargetMapFeature] = {
    val spark = pagesDs.sparkSession
    import spark.implicits._
    // Dedup on the CHEAP (feature id, url) projection first — shuffling full
    // page bodies through a min_by(struct) aggregate is ~10x the volume.
    // The winner join is a SHUFFLE_HASH left-semi: each url maps to exactly
    // one feature id, so the winner set is unique in url and an inner join
    // that keeps only page columns ≡ a semi-join. Hash instead of sort-merge
    // because sorting the wide (url, text) page rows was the single most
    // bus-contended stage of the 6.4M run (3.3x CPU at 8 threads vs 2, plus
    // a 0.5→17s G1 swing from sort-page humongous allocation); the build
    // side is the slim url-only winner set, a bounded fraction of one page
    // column per partition. A forced broadcast instead builds a
    // multi-hundred-MB driver-side hash table serially at large scale (at
    // 10^12 scale this becomes a bucketed join on url).
    val winners = pagesDs.map(p => (Synth.featureId(p.url, nRoads), p.url))
      .toDF("id", "url")
      .groupBy($col("id")).agg(min($col("url")).as("url"))
      .select("url")
    pagesDs.toDF().select("url", "text")
      .join(winners.hint("SHUFFLE_HASH"), Seq("url"), "left_semi")
      .as[(String, String)]
      .map { case (u, t) => Synth.geocode(u, t, nRoads) }
  }

  /** Synthetic SharedStreets-style reference network, generated distributed. */
  def references(spark: SparkSession, nRoads: Int): Dataset[ShstReference] = {
    import spark.implicits._
    spark.range(nRoads).flatMap(r => Synth.shstReferencesForRoad(r.toInt, nRoads))
  }

  /** Raw OSM turn restrictions for the synthetic network (J8 input). */
  def restrictions(spark: SparkSession, nRoads: Int): Dataset[graft.model.OsmRestriction] = {
    import spark.implicits._
    spark.range(nRoads).flatMap(r => Synth.restrictionsForRoad(r.toInt, nRoads))
  }

  // ------------------------------------------------------------- matching

  /**
   * Cell-keyed candidate join + similarity refinement (replaces the external
   * shst-match CLI, SURVEY G9/G10): explode both sides to covering cells at
   * CellLevel, equi-join, distinct pair, then refine with linear-reference
   * projection + symmetric Hausdorff + interval-length gates. Wrong-direction
   * candidates drop naturally because endpoint projections invert (s ≥ e).
   */
  def matchCandidates(featuresDs: Dataset[TargetMapFeature],
      refsDs: Dataset[ShstReference]): DataFrame = {
    val f = featuresDs.toDF()
    val r = refsDs.toDF()
    val fCells = f.select($col("id").as("feature_id"),
        explode(cell_cover_line($col("geometry"), lit(CellLevel))).as("cell"))
    val rCells = r.select($col("shstReferenceId").as("ref_id"),
        explode(cell_cover_line($col("coordinates"), lit(CellLevel))).as("cell"))
    val pairs = fCells.join(rCells, "cell")
      .select("feature_id", "ref_id").distinct()
    pairs
      .join(f.select($col("id").as("feature_id"), $col("targetMap"), $col("targetMapId"),
        $col("targetMapIsPrimary"), $col("targetMapNetHrchyRank"),
        $col("geometry").as("f_geom")), "feature_id")
      .join(r.select($col("shstReferenceId").as("ref_id"), $col("fromIntersectionId"),
        $col("toIntersectionId"), $col("coordinates").as("r_geom")), "ref_id")
  }

  private def $col(n: String) = org.apache.spark.sql.functions.col(n)

  /** Refine candidates into scored matches, then chain-assign ids via the
    * toposort post-processor (G4). */
  def matches(candidates: DataFrame): DataFrame =
    MatchPostProcessor(scoredCandidates(candidates)).toDF()

  // --------------------------------------------- meso/mega enrichment (§3.2)

  /** Row shape for the per-meso-group toposort. */
  case class MesoKeyed(
      targetMap: String,
      mesoId: String,
      matchedTargetMapId: String,
      matchedTargetMapMicroIdx: Int,
      shstFromIntersectionId: String,
      shstToIntersectionId: String,
      tmMicroBearing: Option[Int],
      matchedMicroBearing: Option[Int],
      tmMesoBearing: Option[Int],
      geometry: Seq[Seq[Double]])

  /** Micro proto id = the chain id without its per-edge index
    * (`tmId|bearing|idx` → `tmId|bearing`; unsorted `tmId!cs` ids stand
    * alone), the grouping key of addMesoLevelMetadata's simplified edges. */
  def microProtoId(matchedTargetMapId: String): String = {
    val i = matchedTargetMapId.lastIndexOf('|')
    if (i > 0) matchedTargetMapId.substring(0, i) else matchedTargetMapId
  }

  /**
   * §3.2 steps 4-5 (addMesoLevelMetadata.js / addMegaLevelMetadata.js):
   * attach meso chain indices+bearing (toposort per (targetMap, mesoId)
   * corridor; flip-rule fallback) and mega direction-of-travel (bbox axis ×
   * meso bearing) to post-processed matches. One shuffle per level, groups
   * are single corridors — tiny and bounded, like the micro post-processor.
   */
  def enrichMatches(featuresDs: Dataset[TargetMapFeature], matchesDf: DataFrame): DataFrame = {
    val spark = featuresDs.sparkSession
    import spark.implicits._
    val meta = featuresDs.toDF().select($col("targetMap"), $col("targetMapId"),
      $col("targetMapMesoId"), $col("targetMapMegaId"),
      $col("targetMapMicroLevelBearing"), $col("targetMapMesoLevelBearing"))
      .distinct()
    // persisted AND eagerly materialized: the meso shuffle, the mega bbox
    // pass, and the final joins all read it. The bbox side sits under a
    // broadcast exchange, and an unmaterialized cache there means the whole
    // matcher subtree runs inside the 300 s broadcast timeout — which it
    // blows at low parallelism (observed at local[2], 6.4M pages)
    val m = matchesDf.join(meta, Seq("targetMap", "targetMapId"), "left")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    m.count()
    val mesoIn = m.select(
        $col("targetMap"),
        coalesce($col("targetMapMesoId"), $col("targetMapId")).as("mesoId"),
        $col("matchedTargetMapId"), $col("matchedTargetMapMicroIdx"),
        $col("shstFromIntersectionId"), $col("shstToIntersectionId"),
        $col("targetMapMicroLevelBearing").as("tmMicroBearing"),
        $col("matchedTargetMapMicroLevelBearing").as("matchedMicroBearing"),
        $col("targetMapMesoLevelBearing").as("tmMesoBearing"),
        // chainBearing reads only first-of-first/last-of-last — shuffle the
        // 2-point endpoint summary, not a polyline
        array(array($col("msLon"), $col("msLat")),
          array($col("meLon"), $col("meLat"))).as("geometry")).as[MesoKeyed]
    val mesoOut = mesoIn.groupByKey(r => (r.targetMap, r.mesoId))
      .flatMapGroups { (key: (String, String), it: Iterator[MesoKeyed]) =>
        val rows = it.toSeq
        val ins = rows.map(r => MesoMega.MesoIn(r.matchedTargetMapId,
          microProtoId(r.matchedTargetMapId), r.matchedTargetMapMicroIdx,
          r.shstFromIntersectionId, r.shstToIntersectionId,
          r.tmMicroBearing,
          // unsorted-fallback matches carry bearing -1 = "none"
          r.matchedMicroBearing.filter(_ >= 0),
          r.tmMesoBearing, r.geometry))
        MesoMega.mesoGroup(ins).map(o => (key._1, o.matchedTargetMapId,
          o.matchedTargetMapMesoLevelBearing, o.matchedTargetMapMesoIdx)).iterator
      }
      .toDF("targetMap", "matchedTargetMapId",
        "matchedTargetMapMesoLevelBearing", "matchedTargetMapMesoIdx")
    // bidirectional meso sorts can fork clone chains that share edges, so a
    // match may flatten into TWO MesoOut rows (the reference's object-keyed
    // assignment silently last-writer-wins there) — dedupe deterministically
    // on the smallest (idx, bearing) so the left join below stays 1:1
    val w = Window.partitionBy("targetMap", "matchedTargetMapId")
      .orderBy($col("matchedTargetMapMesoIdx").asc_nulls_last,
        $col("matchedTargetMapMesoLevelBearing").asc_nulls_last)
    val mesoDeduped = mesoOut
      .withColumn("__rn", row_number().over(w)).filter($col("__rn") === 1).drop("__rn")
    MesoMega.megaMetadata(
      m.join(mesoDeduped, Seq("targetMap", "matchedTargetMapId"), "left"))
  }

  /** Target maps whose features are bidirectional (RIS-style): they match
    * BOTH directed references of a two-way road — which is exactly why the
    * reference's QA halves their output length (qaSQLiteService:104-117). */
  val UndirectedTmPattern = "^ris_\\d{4}$"

  /** Refine candidates into scored matches (one row per retained pair). */
  def scoredCandidates(candidates: DataFrame, hausdorffKm: Double = MatchHausdorffKm): DataFrame = {
    // the candidate join's output is hash-partitioned by cell — hot urban
    // cells skew it badly; spread the expensive geometry scoring uniformly
    // over the pair key before computing (north rule: explicit salting /
    // AQE-aware repartitioning for skewed cells)
    val parts = candidates.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // Fused pair kernel: endpoint projection (s0/e0), the direction gate
    // (opposite-direction refs project inverted, s0 > e0: directed target
    // maps drop those; bidirectional RIS-style features legitimately ride
    // the opposite reference — accepted with the interval swapped so the
    // slice stays in reference direction), the overlap gate, the slice,
    // and the one-sided Hausdorff score (the ref slice must lie along the
    // feature; the feature may span several reference chunks, so the
    // symmetric distance is unbounded) — one expression, NULL = gated out.
    // Bit-identical to the composed locate/slice/Hausdorff chain
    // (MatchScoreSpec) but converts each geometry once and early-exits the
    // threshold test: the composed chain's per-call conversions were the
    // measured allocator bottleneck of this stage (BENCH.md r4).
    val scored = candidates
      .repartition(parts, $col("feature_id"), $col("ref_id"))
      .withColumn("msc", match_summary(
        $col("r_geom"), $col("f_geom"),
        $col("targetMap").rlike(UndirectedTmPattern),
        MinOverlapKm, hausdorffKm))
      .filter($col("msc").isNotNull)
    // The slice polyline never materializes: match_summary accumulates its
    // SUMMARY — vertex count (keep-longest sort key), endpoints (chain
    // bearings + the kernel's rawOffsets), geodesic length, bbox
    // (megaMetadata min/maxes per-match bboxes — exact) — inside the scoring
    // kernel's own pass. Downstream of this projection no operator reads a
    // match polyline, so the post-processor shuffle, the meta join, the
    // enrichment cache, and the central conflate shuffle all carry 9 doubles
    // + an int instead of the nested point array (~3x the bytes on real-
    // world polylines, and a boxed Seq[Seq[Double]] encoder round-trip in
    // two typed kernels — 246 of the 6.4M run's ~600 CPU-s, BENCH.md r4c).
    scored.select(
      $col("ref_id").as("shstReferenceId"),
      $col("fromIntersectionId").as("shstFromIntersectionId"),
      $col("toIntersectionId").as("shstToIntersectionId"),
      $col("targetMap"), $col("targetMapId"),
      $col("targetMapIsPrimary"), $col("targetMapNetHrchyRank"),
      $col("msc.score").as("score"),
      $col("msc.mNumPts").as("mNumPts"),
      $col("msc.msLon").as("msLon"), $col("msc.msLat").as("msLat"),
      $col("msc.meLon").as("meLon"), $col("msc.meLat").as("meLat"),
      $col("msc.mLenKm").as("mLenKm"),
      $col("msc.mMinLon").as("mMinLon"), $col("msc.mMinLat").as("mMinLat"),
      $col("msc.mMaxLon").as("mMaxLon"), $col("msc.mMaxLat").as("mMaxLat"))
  }

  // ------------------------------------------------------------ conflation

  /** Way-section projection carried into the kernel (osm offsets, G7). */
  case class WsLite(wayId: String, nodeIds: Seq[String], roadClass: String, oneWay: Boolean)

  /** Row shape for the per-reference kernel input. `coords` is the
    * reference polyline INTERLEAVED (lon0, lat0, lon1, lat1, ...): an
    * Array[Double] field takes the encoder's primitive bulk-copy path where
    * Seq[Seq[Double]] deserialized through per-point boxed allocations in
    * the kernel flatMap (one of the two remaining encoder hot spots of the
    * 6.4M profile, BENCH.md r4c). */
  case class RefWithMatches(
      shstReferenceId: String,
      geometryId: String,
      fromIntersectionId: String,
      toIntersectionId: String,
      oneWay: Boolean,
      isForward: Boolean,
      roadClass: String,
      wayId: String,
      coords: Array[Double],
      sections: Seq[WsLite],
      ms: Seq[MatchRow])

  case class MatchRow(
      targetMap: String,
      targetMapId: String,
      matchedTargetMapId: String,
      matchedTargetMapMicroIdx: Int,
      targetMapIsPrimary: Boolean,
      targetMapNetHrchyRank: Int,
      megaDir: Option[String],
      // match-geometry SUMMARY (endpoints + geodesic length) — all the
      // kernel reads of a match polyline; computed map-side before the
      // central shuffle so the shuffle carries 5 doubles, not the polyline
      msLon: Double, msLat: Double, meLon: Double, meLat: Double,
      mLenKm: Double)

  /**
   * J2 (the central join) + per-reference kernel. One shuffle on
   * shst_reference_id for the match aggregation; refs join on the same key;
   * the kernel is a flatMap over joined rows (no second grouping shuffle).
   */
  def conflate(refsDs: Dataset[ShstReference], matchesDf: DataFrame): Dataset[ConflationSegment] = {
    val spark = refsDs.sparkSession
    import spark.implicits._
    // enrichMatches adds megaDir; plain MatchPostProcessor output doesn't —
    // default it to null so both feed the same kernel
    val withDir =
      if (matchesDf.columns.contains("matchedTargetMapMegaLevelDirectionOfTravel"))
        matchesDf.withColumn("megaDir",
          $col("matchedTargetMapMegaLevelDirectionOfTravel"))
      else if (matchesDf.columns.contains("megaDir")) matchesDf
      else matchesDf.withColumn("megaDir", lit(null).cast("string"))
    // the match-geometry summary was computed once at scoring time
    // (scoredCandidates) and rides as flat columns — the central shuffle
    // carries 5 doubles per match, and nothing here touches a polyline
    val matchesAgg = withDir
      .groupBy($col("shstReferenceId"))
      .agg(collect_list(struct(
        $col("targetMap"), $col("targetMapId"), $col("matchedTargetMapId"),
        $col("matchedTargetMapMicroIdx"), $col("targetMapIsPrimary"),
        $col("targetMapNetHrchyRank"), $col("megaDir"),
        $col("msLon"), $col("msLat"), $col("meLon"), $col("meLat"),
        $col("mLenKm"))).as("ms"))
    val joined = refsDs.toDF()
      .select($col("shstReferenceId"), $col("geometryId"), $col("fromIntersectionId"),
        $col("toIntersectionId"), $col("oneWay"), $col("isForward"), $col("roadClass"),
        element_at($col("waySections"), 1).getField("wayId").as("wayId"),
        flatten($col("coordinates")).as("coords"),
        transform($col("waySections"), ws => struct(
          ws.getField("wayId").as("wayId"), ws.getField("nodeIds").as("nodeIds"),
          ws.getField("roadClass").as("roadClass"), ws.getField("oneWay").as("oneWay")))
          .as("sections"))
      .join(matchesAgg, Seq("shstReferenceId"), "inner")
      .as[RefWithMatches]
    joined.flatMap { row =>
      val cs = row.coords
      val refCoords = Array.tabulate(cs.length / 2)(i => Array(cs(2 * i), cs(2 * i + 1)))
      val byTm = row.ms.groupBy(_.targetMap).toSeq.sortBy(_._1).map { case (tm, ms) =>
        tm -> ms.sortBy(m => (m.targetMapId, m.matchedTargetMapMicroIdx)).map { m =>
          (ConflationKernel.Interval(m.targetMap, m.targetMapId, m.matchedTargetMapId,
            m.matchedTargetMapMicroIdx, m.targetMapIsPrimary, m.targetMapNetHrchyRank,
            0, 0, 0, 0),
            ConflationKernel.MatchGeom(m.msLon, m.msLat, m.meLon, m.meLat, m.mLenKm))
        }
      }
      val segs = ConflationKernel.conflateReferenceSummarized(refCoords,
        row.sections.map(_.nodeIds), byTm,
        waySections = row.sections.map(w => (w.wayId, w.nodeIds, w.roadClass, w.oneWay)),
        direction = if (row.isForward) 1 else 0)
      // networklevel := rank (+0.5 if oneWay) — src/conflation/run:74-88
      val rank = Synth.RoadClasses.indexOf(row.roadClass).max(0)
      val nl = rank + (if (row.oneWay) 0.5 else 0.0)
      // megaDir rides per match, keyed back onto the kernel's assignments
      val dirByMatch = row.ms.iterator
        .map(mr => (mr.targetMap, mr.matchedTargetMapId) -> mr.megaDir).toMap
      segs.map { s =>
        ConflationSegment(
          row.shstReferenceId, row.geometryId, row.fromIntersectionId,
          row.toIntersectionId, s.segmentIndex, s.totalSegments,
          s.startDist, s.endDist, nl,
          s.nodeIds, s.coordinates.map(_.toSeq),
          row.wayId, row.roadClass, row.oneWay,
          s.tmAssignments.map(a => SegmentTmMeta(a.targetMap, a.targetMapId,
            a.matchedTargetMapId, a.matchedTargetMapMicroIdx,
            dirByMatch.getOrElse((a.targetMap, a.matchedTargetMapId), None))))
      }
    }
  }

  /** W1: per-(targetMap, targetMapId) conflation_map_idx over the exploded
    * per-segment metadata (ConflationWorkDatabaseService.js:136-153). */
  def conflationMetadata(segments: Dataset[ConflationSegment]): DataFrame = {
    val w = Window.partitionBy("targetMap", "targetMapId")
      .orderBy("matchedTargetMapMicroIdx", "shstReferenceId", "segmentIndex")
    segments.toDF()
      .select($col("shstReferenceId"), $col("segmentIndex"),
        explode($col("tmMeta")).as("m"))
      .select($col("shstReferenceId"), $col("segmentIndex"),
        $col("m.targetMap").as("targetMap"), $col("m.targetMapId").as("targetMapId"),
        $col("m.matchedTargetMapId").as("matchedTargetMapId"),
        $col("m.matchedTargetMapMicroIdx").as("matchedTargetMapMicroIdx"),
        $col("m.megaDir").as("megaDir"))
      .withColumn("conflation_map_idx", row_number().over(w) - 1)
  }

  /**
   * W2: global ordered id without a single-partition sort. Range-partition by
   * the sort key, sort within partitions, then add per-partition offsets
   * computed from a tiny aggregate — every step distributed.
   */
  def withGlobalOrderedId(df: DataFrame, sortCols: Seq[String], idCol: String,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val cols = sortCols.map($col)
    // persist: RangePartitioner samples per job, so the counting pass and the
    // result pass must see the SAME partitioning or offsets shift
    val sorted = df.repartitionByRange(parts, cols: _*)
      .sortWithinPartitions(cols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sorted.groupBy("__pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) => (pid, acc + c) }
      .tail.zip(counts).map { case ((pid, cum), (_, c)) => (pid, cum - c) }.toMap
    // offsets ride as a map literal: element_at stays inside whole-stage
    // codegen where a Scala UDF would break the pipeline (VERDICT r1 minor)
    val w = Window.partitionBy("__pid").orderBy(cols: _*)
    sorted
      .withColumn(idCol, row_number().over(w).cast("long") +
        coalesce(element_at(typedLit(offsets), $col("__pid")), lit(0L)))
      .drop("__pid")
  }

  // ------------------------------------------------------------ tiles / QA

  /** Zoom gate from the reference's tippecanoe invocation
    * (bin/data_transforming/createMBTilesFromGeoJSON:22-57). */
  def minZoomForNetworkLevel(nl: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(nl <= 1, 3).when(nl <= 2, 10).when(nl <= 3, 12).otherwise(13)

  /** S9 analog: tile assignment + match-density rasterization at `zoom`. */
  def tiles(segments: Dataset[ConflationSegment], zoom: Int): DataFrame = {
    val mid = element_at($col("coordinates"), 1)
    segments.toDF()
      .filter(lit(zoom) >= minZoomForNetworkLevel($col("networklevel")))
      .select(
        tile_x(element_at(mid, 1), lit(zoom)).as("tile_x"),
        tile_y(element_at(mid, 2), lit(zoom)).as("tile_y"),
        ($col("endDist") - $col("startDist")).as("len_km"),
        size($col("tmMeta")).as("n_tm"))
      .groupBy("tile_x", "tile_y")
      .agg(count(lit(1)).as("n_segments"),
        sum("len_km").as("total_km"),
        sum("n_tm").as("match_density"))
      .withColumn("zoom", lit(zoom))
  }

  /** QA length-conservation report (qaSQLiteService/index.js:75-147):
    * per target-map id, input length vs Σ assigned output lengths. A
    * bidirectional (non-oneWay) road emits forward AND backward references,
    * so its segments count a `ris_\d{4}` feature's length twice — the
    * reference halves the output contribution for those
    * (qaSQLiteService/index.js:104-117). */
  def qaReport(featuresDs: Dataset[TargetMapFeature],
      segments: Dataset[ConflationSegment]): DataFrame = {
    val inputLens = featuresDs.toDF()
      .select($col("targetMap"), $col("targetMapId"),
        geodesic_length_km($col("geometry")).as("input_km"))
    val outputLens = segments.toDF()
      .select(explode($col("tmMeta")).as("m"), $col("oneWay"),
        ($col("endDist") - $col("startDist")).as("len_km"))
      .withColumn("len_km", when(
        $col("m.targetMap").rlike("^ris_\\d{4}$") && !$col("oneWay"),
        $col("len_km") / 2).otherwise($col("len_km")))
      .groupBy($col("m.targetMap").as("targetMap"), $col("m.targetMapId").as("targetMapId"))
      .agg(sum("len_km").as("output_km"))
    inputLens.join(outputLens, Seq("targetMap", "targetMapId"), "left")
      .withColumn("output_km", coalesce($col("output_km"), lit(0.0)))
      .withColumn("len_ratio_diff",
        ($col("output_km") - $col("input_km")) / $col("input_km"))
      .withColumn("passes", abs($col("len_ratio_diff")) <= 0.05)
  }

  /** QA bearing gate (north-star "bearing-delta thresholds"; the constant
    * is the meso flip rule's 45°, addMesoLevelMetadata.js:11): share of
    * toposorted matches whose chain bearing lies within the threshold of
    * the feature's micro bearing ALONG EITHER ORIENTATION — bidirectional
    * (RIS) matches legitimately ride the opposite reference, so the delta
    * is folded onto the [0°, 90°] axis before gating. Unsorted-fallback
    * matches (bearing −1) are excluded. */
  def qaBearing(matchesDf: DataFrame, thresholdDeg: Double = 45.0): DataFrame = {
    val delta = graft.functions.geo.bearing_delta(
      $col("matchedTargetMapMicroLevelBearing").cast("double"),
      $col("targetMapMicroLevelBearing").cast("double"))
    matchesDf
      .filter($col("matchedTargetMapMicroLevelBearing") >= 0)
      .withColumn("__d", least(delta, lit(180.0) - delta))
      .groupBy("targetMap")
      .agg(count(lit(1)).as("n_matches"),
        sum(when($col("__d") <= thresholdDeg, 1).otherwise(0)).as("n_bearing_ok"))
      .withColumn("bearing_ok_rate",
        round($col("n_bearing_ok") / $col("n_matches"), 6))
  }

  /** QA summary per target map (A8). */
  def qaSummary(qa: DataFrame): DataFrame =
    qa.groupBy("targetMap").agg(
      count(lit(1)).as("n_features"),
      sum(when($col("output_km") > 0, 1).otherwise(0)).as("n_matched"),
      sum("input_km").as("total_input_km"),
      sum(when($col("passes"), $col("input_km")).otherwise(0.0)).as("passing_km"))
      .withColumn("match_rate", $col("n_matched") / $col("n_features"))
      .withColumn("passing_ratio", $col("passing_km") / $col("total_input_km"))

  /** Full pipeline at a given scale; returns the conflation segments.
    * features/references are persisted — both feed two downstream consumers
    * (cell-cover explode + geometry re-attach; candidate join + conflate),
    * and recomputing the geocode/dedup subtree doubles the work. */
  def run(spark: SparkSession, nPages: Long, nRoads: Int): Dataset[ConflationSegment] = {
    // pages persist: the dedup pass + winner join both scan them, and the
    // deterministic generator is CPU-heavy — one materialization, two reads
    // (with a real storage-backed input the re-scan is a cheap column read
    // and this persist would be dropped)
    val p = pages(spark, nPages, nRoads)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val f = features(p, nRoads).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val r = references(spark, nRoads).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    conflate(r, enrichMatches(f, matches(matchCandidates(f, r))))
  }
}

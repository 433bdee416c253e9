package graft

import graft.model.{ConflationSegment, ShstReference, TargetMapFeature}
import graft.operators.ConflationPipeline
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * The smoke-scale deterministic conflation world shared by the q34/q4x
 * driver queries, built ONCE per session and persisted — the driver's
 * Verify/Bench runs previously rebuilt the identical pipeline four times
 * (≈40 s of a 175 s bench round; see VERDICT r1 "Bench hygiene").
 *
 * `materializeAll` additionally writes relational projections of the
 * pipeline's inputs/outputs (plus a few sf-dependent side tables) as
 * parquet under [[auxDir]], so the driver's DuckDB oracle can verify the
 * flagship conflation outputs — tile assignment, QA summary, node→ways
 * index, segment index bookkeeping — as plain SQL over the same rows
 * (VERDICT r1 "Next round" item 1).
 */
object SmokeWorld {

  val NPages = 400L
  val NRoads = 40

  /** Absolute path the oracle SQL references via the `__AUX__` placeholder;
    * Verify substitutes it when dumping oracle_sql.json. */
  def auxDir: String =
    sys.env.getOrElse("GRAFT_AUX_DIR", "/root/repo/target/verify_aux")

  final case class Handles(
      features: Dataset[TargetMapFeature],
      refs: Dataset[ShstReference],
      matches: DataFrame,
      segments: Dataset[ConflationSegment])

  @volatile private var cached: (SparkSession, Handles) = null

  /** Build (or fetch the session-cached) smoke world. */
  def apply(spark: SparkSession): Handles = synchronized {
    if (cached == null || (cached._1 ne spark) || cached._1.sparkContext.isStopped) {
      val p = ConflationPipeline.pages(spark, NPages, NRoads)
      val f = ConflationPipeline.features(p, NRoads).persist(StorageLevel.MEMORY_AND_DISK)
      val r = ConflationPipeline.references(spark, NRoads).persist(StorageLevel.MEMORY_AND_DISK)
      // localCheckpoint (not persist): these lineages nest several
      // persisted subtrees whose InMemoryRelations re-print recursively —
      // a 7 MB / 19k-line plan string per downstream query, all driver-side
      // analysis cost. Truncating leaves a flat scan for q34/q40–q44/q50.
      // (On a real cluster this is a reliable checkpoint / parquet bounce.)
      val m = ConflationPipeline.enrichMatches(f,
          ConflationPipeline.matches(ConflationPipeline.matchCandidates(f, r)))
        .localCheckpoint(true)
      val segs = ConflationPipeline.conflate(r, m).localCheckpoint(true)
      cached = (spark, Handles(f, r, m, segs))
    }
    cached._2
  }

  private def write(df: DataFrame, dir: String, name: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")

  /** q46's near-dup corpus: the embeddings plus slightly perturbed copies
    * of the first 25 vectors (true cosine ≈ 0.999 to their source). */
  def nearDupCorpus(emb: DataFrame): DataFrame = {
    val planted = emb.filter(col("vec_id") < 25)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + (i % 7).cast("float") * lit(0.001f)).as("embedding"))
    emb.select(col("vec_id"), col("embedding")).union(planted)
  }

  /** q30/q47's ANN corpus: the embeddings plus 5 planted near-duplicates of
    * each query vector (vec_id < 10) at ids 200000 + 10·q + j. Perturbation
    * is ±6e-5 per component (angle ≈ 1.3e-4 rad, cosine ≈ 1 − 1e-8): the
    * exact top-5 of every query IS its planted set, so a DuckDB brute-force
    * top-k over this corpus is ground truth the Spark side cannot influence
    * — the LSH/IVF answers are graded on recall, not on re-ranking their
    * own candidates (VERDICT r2 "Next round" #2). */
  def annCorpus(emb: DataFrame): DataFrame = {
    val base = emb.select(col("vec_id"), col("embedding"))
    // one scan for all 5 perturbed copies (explode j), not a 5-way union
    val dups = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(4))).as("__j"))
      .select((col("vec_id") * 10 + col("__j") + 200000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + ((i + col("__j")) % 7 - 3).cast("float") * lit(2e-5f))
          .as("embedding"))
    base.union(dups)
  }

  /** q31's deterministic query points (nation-key lattice, 25 points). */
  def knnPoints(spark: SparkSession): DataFrame =
    spark.range(25).toDF("point_id")
      .withColumn("lon", lit(-73.85) + col("point_id") % 20 / lit(100.0))
      .withColumn("lat", lit(42.6) + col("point_id") % 15 / lit(100.0))

  /**
   * Write every oracle side table under `dir`:
   *
   *  - smoke-world projections: `aux_refs`, `aux_features`, `aux_segments`,
   *    `aux_seg_tm`, `aux_seg_nodes`, `aux_knn_dists`
   *  - sf-dependent side tables (over `sfDir`'s documents/embeddings):
   *    `aux_doc_simhash`, `aux_ann_candidates`, `aux_media_meta`
   *
   * The smoke projections let DuckDB recompute segment bookkeeping
   * (row_number/count vs the kernel's 1-based segmentIndex/totalSegments),
   * networklevel (roadClass rank + oneWay), tiles (the q16 math over first
   * vertices), QA sums, and the node→ways index. The sf tables pin the
   * non-SQL kernels' *blocking completeness* (simhash bands = brute-force
   * all-pairs; LSH rank = exact cosine rank over the candidate set; cell-
   * ring kNN = true top-k over the full distance matrix).
   */
  def materializeAll(spark: SparkSession, sfDir: String, dir: String = auxDir): Unit = {
    val h = apply(spark)

    write(h.refs.toDF().select(col("shstReferenceId"), col("roadClass"), col("oneWay")),
      dir, "aux_refs")

    // input_km stays UNROUNDED: the q42 oracle's sums must add the exact
    // same doubles qaReport adds, or the 6-dp-rounded totals drift
    write(h.features.toDF().select(col("targetMap"), col("targetMapId"), col("direction"),
      graft.functions.geo.geodesic_length_km(col("geometry")).as("input_km")),
      dir, "aux_features")

    val segDf = h.segments.toDF()
    write(segDf.select(col("shstReferenceId"), col("segmentIndex"), col("totalSegments"),
      col("startDist"), col("endDist"), col("networklevel"), col("roadClass"), col("wayId"),
      element_at(element_at(col("coordinates"), 1), 1).as("first_lon"),
      element_at(element_at(col("coordinates"), 1), 2).as("first_lat"),
      graft.functions.geo.final_bearing(col("coordinates")).as("seg_bearing"),
      element_at(col("nodeIds"), 1).as("start_node"),
      element_at(col("nodeIds"), -1).as("end_node"),
      size(col("tmMeta")).as("n_tm"),
      size(col("coordinates")).as("n_coords")),
      dir, "aux_segments")

    write(ConflationPipeline.restrictions(spark, NRoads).toDF(),
      dir, "aux_restrictions")

    write(segDf.select(col("shstReferenceId"), col("segmentIndex"),
        (col("endDist") - col("startDist")).as("len_km"), explode(col("tmMeta")).as("m"))
      .select(col("shstReferenceId"), col("segmentIndex"), col("len_km"),
        col("m.targetMap").as("targetMap"), col("m.targetMapId").as("targetMapId"),
        col("m.matchedTargetMapId").as("matchedTargetMapId"),
        col("m.matchedTargetMapMicroIdx").as("matchedTargetMapMicroIdx"),
        col("m.megaDir").as("megaDir")),
      dir, "aux_seg_tm")

    write(segDf.select(col("wayId"), posexplode(col("nodeIds")).as(Seq("node_idx", "node_id")))
      .filter(col("node_id").isNotNull),
      dir, "aux_seg_nodes")

    // every segment vertex with its zoom-gate key (q54's raster input): the
    // oracle recomputes the per-pixel binning and per-tile statistics from
    // these raw doubles, independent of the Spark-side PNG round-trip
    write(segDf.select(col("networklevel"), explode(col("coordinates")).as("pt"))
      .select(col("networklevel"),
        element_at(col("pt"), 1).as("lon"), element_at(col("pt"), 2).as("lat")),
      dir, "aux_segment_vertices")

    // full point×reference distance matrix (25 × |refs| — tiny); the q31
    // oracle takes exact top-k over it, checking cell-ring completeness
    write(Knn_allDistances(knnPoints(spark), h.refs), dir, "aux_knn_dists")

    writeNdjsonFixture(spark, dir, force = true)

    // q55: GENERATOR truth for the stoplights oracle — the Spark side reads
    // these same rows through the XML fixture + the real S3 scan, so any
    // scan corruption flips the hash; tags_json mirrors the psv line the
    // reference task greps
    locally {
      import spark.implicits._
      write(osmNodeRows.map { case (id, lon, lat, tags) =>
        val t = Option(tags)
        (id, lon, lat,
          t.map(_.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")),
          t.map(_.size),
          t.flatMap(_.collectFirst { case ("highway", v) => v }))
      }.toDF("id", "lon", "lat", "tags_json", "n_tags", "highway"),
        dir, "aux_osm_nodes")
    }
    writeOsmNodesFixture(dir, force = true)

    // --- sf-dependent side tables ---------------------------------------
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    write(graft.operators.Dedup.simhashTable(docs, "doc_id", "text"),
      dir, "aux_doc_simhash")

    // ANN ground-truth corpus (planted near-duplicates, see annCorpus):
    // q30's LSH and q47's IVF are graded against DuckDB brute-force top-k
    // over this table — the candidate sets themselves are NOT materialized,
    // so the oracle is independent of the Spark-side blocking
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    write(annCorpus(emb), dir, "aux_ann_corpus")

    // near-dup corpus = embeddings ∪ perturbed copies (the raw synthetic
    // vectors are uniform — max pairwise cosine ≈ 0.51 — so duplicates are
    // planted deterministically, ids offset by 100000); q46's oracle
    // brute-forces ALL pairs over it
    write(nearDupCorpus(emb), dir, "aux_neardup_corpus")

    // enriched-match bearings (q50's QA input)
    write(h.matches.select(col("targetMap"),
      col("matchedTargetMapMicroLevelBearing").as("matched_bearing"),
      col("targetMapMicroLevelBearing").as("tm_bearing")),
      dir, "aux_match_bearings")

    // positional k-gram hashes (q49's winnowing input): the oracle
    // recomputes the sliding-window-min selection relationally over them
    write(graft.operators.Dedup.kgramHashes(docs, "doc_id", "text", k = 8),
      dir, "aux_doc_kgrams")

    val media = docs.select(col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"))
    write(graft.operators.Multimodal.decodeAndExtract(media)
      .select(col("media_id"), col("n_frames")),
      dir, "aux_media_meta")

    // q53 (S6 tile scraper): every feature vertex (the oracle recomputes the
    // zoom-12 cover from these), and the fixture tileset's geometry-tile
    // listing (the oracle derives the seeded subset and fetched/absent
    // statuses from it)
    write(h.features.toDF().select(explode(col("geometry")).as("pt"))
      .select(element_at(col("pt"), 1).as("lon"), element_at(col("pt"), 2).as("lat")),
      dir, "aux_feature_vertices")
    val tilesDir = writeTilesetFixture(spark, dir)
    val geomTiles = new java.io.File(tilesDir).listFiles()
      .filter(_.getName.endsWith(".geometry.8.pbf"))
      .map(_.getName.stripSuffix(".geometry.8.pbf")).sorted.toSeq
    write(spark.createDataset(geomTiles)(
      org.apache.spark.sql.Encoders.STRING).toDF("tile_id"),
      dir, "aux_tileset_geoms")
  }

  private def Knn_allDistances(points: DataFrame,
      refs: Dataset[ShstReference]): DataFrame =
    graft.operators.Knn.allDistances(points, refs)

  // ---- real-tile fixture (q51) --------------------------------------------

  /** Injective synth-id ↔ int64 bijection for the PBF numeric way/node id
    * fields: `"w<r>_<g>"` / `"n<r>_<v>"` ↔ `(r << 20) | suffix`. */
  private def encSynthId(s: String): Long = {
    val body = s.substring(1)
    val u = body.indexOf('_')
    (body.substring(0, u).toLong << 20) | body.substring(u + 1).toLong
  }
  private def decSynthId(prefix: String, s: String): String = {
    val v = s.toLong
    s"$prefix${v >> 20}_${v & 0xfffff}"
  }

  private val TilesetVersion = 1

  /** Render the synth network ONCE per auxDir as a real wire-format tileset
    * (versioned marker; a version bump wipes and rewrites). */
  def writeTilesetFixture(spark: SparkSession, dir: String = auxDir): String = synchronized {
    val target = new java.io.File(s"$dir/aux_shst_tiles")
    val marker = new java.io.File(target, s"_GRAFT_TILESET_V$TilesetVersion")
    val hasTiles = Option(target.listFiles()).exists(_.exists(_.getName.endsWith(".pbf")))
    if (marker.exists() && hasTiles) return target.getPath
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    if (target.exists()) rm(target)
    graft.sources.ShstTiles.writeTileset(
      ConflationPipeline.references(spark, NRoads), target.getPath,
      wayIdEnc = encSynthId, nodeIdEnc = encSynthId)
    java.nio.file.Files.writeString(marker.toPath, s"v$TilesetVersion")
    target.getPath
  }

  /**
   * The smoke network REREAD through the real tile path: tileset file bytes
   * → wire-format scans → convertTileset parquet (tile-id lineage, so reruns
   * skip converted tiles) → referencesFromTiles → synth-id decode. Row-equal
   * to [[ConflationPipeline.references]] — asserted in ShstTilesSpec, and
   * q51 conflates THESE refs and grades the result against the synth-path
   * aux tables, making the wire reader driver-oracle-visible (VERDICT r3
   * "What's missing" #1).
   */
  def tileRefs(spark: SparkSession): Dataset[ShstReference] = {
    import spark.implicits._
    val tiles = writeTilesetFixture(spark)
    // conversion dir is version-tied: a fixture rewrite must not be masked
    // by a stale tile ledger
    val out = s"$auxDir/aux_shst_conv_v$TilesetVersion"
    graft.sources.ShstTiles.convertTileset(spark, tiles, out, "q51fixture")
    graft.sources.ShstTiles.referencesFromTiles(
      spark.read.parquet(s"$out/geometry").as[graft.sources.ShstTiles.GeometryRow],
      spark.read.parquet(s"$out/reference").as[graft.sources.ShstTiles.ReferenceRow],
      spark.read.parquet(s"$out/metadata").as[graft.sources.ShstTiles.MetadataRow])
      .map(r => r.copy(waySections = r.waySections.map(ws => ws.copy(
        wayId = decSynthId("w", ws.wayId),
        nodeIds = ws.nodeIds.map(decSynthId("n", _))))))
  }

  /** q58's snapshot table ([[graft.sources.SnapTable]]): built ONCE per
    * (auxDir, sf) from the sf `documents` table as two commits — v1 = the
    * `doc_id % 4 < 2` half (range-partitioned so every data file carries a
    * tight doc_id range and manifest min/max pruning has something to skip),
    * v2 = append of the other half — so the current snapshot equals the full
    * table and v1 time-travels to exactly the first half. Content is fully
    * determined by the sf tables, so an existing 2-snapshot table is reused. */
  def snapTableFixture(spark: SparkSession, sfDir: String): String = synchronized {
    val root = s"$auxDir/aux_snaptable_${new java.io.File(sfDir).getName}"
    if (graft.sources.SnapTable.currentVersion(spark, root).contains(2)) return root
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    val d = new java.io.File(root)
    if (d.exists()) rm(d) // partial build (crash between commits): rebuild
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    graft.sources.SnapTable.append(
      docs.filter(col("doc_id") % 4 < 2).repartitionByRange(4, col("doc_id")),
      root, statsCols = Seq("doc_id"))
    graft.sources.SnapTable.append(
      docs.filter(col("doc_id") % 4 >= 2).repartitionByRange(4, col("doc_id")),
      root, statsCols = Seq("doc_id"))
    root
  }

  /** q53's scrape destination: wiped and re-seeded on EVERY call with the
    * first `seedCount` geometry tiles (by tile id) of the fixture tileset,
    * so each scrape starts from the same deterministic "some tiles already
    * cached" diff the reference's `seenGeomTiles` readdir models. Returns
    * (fixture tileset dir, destination dir). */
  def scrapeDestReset(spark: SparkSession, seedCount: Int = 5): (String, String) =
    synchronized {
      val tiles = writeTilesetFixture(spark)
      val dest = new java.io.File(s"$auxDir/aux_scrape_dest")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      if (dest.exists()) rm(dest)
      dest.mkdirs()
      new java.io.File(tiles).listFiles()
        .filter(_.getName.endsWith(".geometry.8.pbf"))
        .map(_.getName).sorted.take(seedCount)
        .foreach { n =>
          java.nio.file.Files.copy(
            java.nio.file.Paths.get(tiles, n),
            java.nio.file.Paths.get(dest.getPath, n))
        }
      (tiles, dest.getPath)
    }

  // ---- raw-OSM stoplights fixture (q55) ------------------------------------

  /**
   * Deterministic raw-OSM node rows (id, lon, lat, tags — null tags ≈ the
   * reference's `grep -v null` case) spanning the stoplights task's grep
   * semantics (`tasks/osm_stoplights_shapefile/data_transforms:9-13`): tag
   * VALUE containing "signal" (i%10∈{0,1}), tag KEY containing "signal"
   * (i%10=2), tagged non-matches (3,5,6), untagged nodes (the rest).
   * Coordinates are plain generator doubles; the XML fixture renders them
   * via `Double.toString`, which `Double.parseDouble` round-trips EXACTLY,
   * so the Spark answer (through the real S3 XML scan) and the DuckDB
   * oracle (over the aux parquet of these same rows) compare bit-identical
   * with no rounding anywhere.
   */
  def osmNodeRows: Seq[(String, Double, Double, Seq[(String, String)])] =
    (0 until 1200).map { i =>
      val id = (7000000L + i).toString
      val lon = -73.95 + (i * 37 % 1000) / 1e4
      val lat = 42.60 + (i * 53 % 1000) / 1e4
      val tags: Seq[(String, String)] = (i % 10) match {
        case 0 => Seq("highway" -> "traffic_signals")
        case 1 => Seq("crossing" -> "traffic_signals", "button_operated" -> "yes")
        case 2 => Seq("traffic_signals:direction" -> "forward")
        case 3 => Seq("highway" -> "stop")
        case 5 => Seq("name" -> "Main Street")
        case 6 => Seq("highway" -> "crossing", "crossing" -> "marked")
        case _ => null
      }
      (id, lon, lat, tags)
    }

  private val OsmNodesFixtureVersion = 1

  /** Render [[osmNodeRows]] as a raw-OSM XML file for the real S3 scan;
    * returns the file path. Idempotent via a versioned marker (same
    * crash-safe marker-last protocol as [[writeNdjsonFixture]]). */
  def writeOsmNodesFixture(dir: String = auxDir,
      force: Boolean = false): String = synchronized {
    val target = new java.io.File(s"$dir/aux_osm_xml")
    val file = new java.io.File(target, "nodes.xml")
    val marker = new java.io.File(target, s"_GRAFT_FIXTURE_V$OsmNodesFixtureVersion")
    if (!force && marker.exists() && file.exists()) return file.getPath
    target.mkdirs()
    val sb = new StringBuilder("<osm version=\"0.6\">\n")
    osmNodeRows.foreach { case (id, lon, lat, tags) =>
      if (tags == null)
        sb.append(s"""  <node id="$id" lon="$lon" lat="$lat"/>""").append('\n')
      else {
        sb.append(s"""  <node id="$id" lon="$lon" lat="$lat">""").append('\n')
        tags.foreach { case (k, v) =>
          sb.append(s"""    <tag k="$k" v="$v"/>""").append('\n')
        }
        sb.append("  </node>\n")
      }
    }
    sb.append("</osm>\n")
    java.nio.file.Files.writeString(file.toPath, sb.toString)
    java.nio.file.Files.writeString(marker.toPath, s"v$OsmNodesFixtureVersion")
    file.getPath
  }

  /**
   * S1 ingest fixture: the smoke features as gzipped GeoJSON NDJSON, plus
   * planted bad rows (a <2-point geometry, a missing geometry, a
   * wrong-county feature, and a malformed-JSON line in its own .gz part) —
   * q45 and its DuckDB oracle must drop exactly the same rows. Lazily
   * idempotent: skipped only when a VERSIONED marker matches AND a data
   * part actually exists (a bare `_SUCCESS` check kept a stale older-schema
   * fixture alive for Bench runs and q45 silently threw inside the measured
   * loop, ADVICE r2); `force` (Verify, Bench warm-up) always rewrites.
   */
  private val FixtureVersion = 3

  def writeNdjsonFixture(spark: SparkSession, dir: String = auxDir,
      force: Boolean = false): Unit = synchronized {
    val target = new java.io.File(s"$dir/aux_ndjson")
    val marker = new java.io.File(target, s"_GRAFT_FIXTURE_V$FixtureVersion")
    val hasParts = Option(target.listFiles())
      .exists(_.exists(_.getName.endsWith(".txt.gz")))
    if (!force && marker.exists() && hasParts) return
    val h = apply(spark)
    val goodLines = h.features.toDF().select(to_json(struct(
      lit("Feature").as("type"),
      struct(col("targetMapId"),
        lit("36001").as("targetMapCountyCode"), col("targetMap")).as("properties"),
      struct(lit("LineString").as("type"),
        col("geometry").as("coordinates")).as("geometry"))).as("value"))
    val planted = spark.createDataset(Seq(
      """{"type":"Feature","properties":{"targetMapId":"bad_geom","targetMapCountyCode":"36001","targetMap":"x"},"geometry":{"type":"LineString","coordinates":[[-73.8,42.7]]}}""",
      """{"type":"Feature","properties":{"targetMapId":"no_geom","targetMapCountyCode":"36001","targetMap":"x"}}""",
      """{"type":"Feature","properties":{"targetMapId":"wrong_county","targetMapCountyCode":"36999","targetMap":"x"},"geometry":{"type":"LineString","coordinates":[[-73.8,42.7],[-73.81,42.71]]}}"""))(
      org.apache.spark.sql.Encoders.STRING).toDF("value")
    goodLines.union(planted).coalesce(1).write.mode("overwrite")
      .option("compression", "gzip").text(target.getPath)
    // malformed line AFTER the overwrite (which wipes the directory)
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(new java.io.File(target, "part-corrupt.txt.gz")))
    gz.write("{this is not json\n".getBytes("UTF-8"))
    gz.close()
    // marker LAST: a crash mid-write leaves no marker → next call rewrites
    java.nio.file.Files.writeString(marker.toPath, s"v$FixtureVersion")
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * S6: the tile scraper (`src/loaders/shst/scrapeMissingSharedStreetsGeometry
 * Files:35-80`) — for each matched feature, compute the zoom-12 tile cover,
 * diff it against the tiles already present in the local tileset directory,
 * and fetch the missing ones from `SHST_TILES_URL_BASE`, re-expressed
 * Spark-first and offline-testable:
 *
 *  - **cover** is a declarative plan (explode vertices → tile expression →
 *    distinct) instead of the reference's per-feature driver loop — at 100 TB
 *    the cover of a continent-scale match set is itself a big aggregation.
 *    The tile id uses the same equirectangular math as the tile sink (q16)
 *    and [[ShstTiles.tileIdFor]], so cover names match [[ShstTiles
 *    .writeTileset]] file names. Vertex cover (every vertex's tile) stands in
 *    for the reference's `conflator(feature, {zoom: 12})` line cover; at z12
 *    a tile is ~0.088° wide, far coarser than any single network edge, so
 *    the two covers agree on road networks (documented divergence: a segment
 *    longer than a tile could cross a tile containing none of its vertices).
 *  - **seen set** is the destination directory listing (the reference's
 *    `readdirSync` + in-memory `Set`), applied as a filter on the driver —
 *    the listing is one metadata call, the diff stays in the plan.
 *  - **fetch** is a partition-parallel `mapPartitions` over the missing tile
 *    names: each partition opens `urlBase/<name>` (any `java.net.URL` scheme
 *    — `http(s)://` in production, `file://` in the offline spec; both run
 *    the identical code path) and streams it to the tileset dir through the
 *    Hadoop `FileSystem` API via attempt-unique temp + rename, so a retried
 *    or speculative task never publishes a torn file. Missing-on-remote
 *    (HTTP 404 / FileNotFound) is recorded as `absent`, transient IO errors
 *    retry with linear backoff and end as `failed` — statuses are RETURNED,
 *    not swallowed, so callers can alert on non-zero failure counts (the
 *    no-silent-drop rule). A tile whose final file already exists is
 *    `fetched` without a re-download, making the operation idempotent under
 *    Spark plan re-execution.
 *
 * q53 drives this end-to-end against a wire-format fixture tileset served
 * over `file://`, graded by a DuckDB oracle that recomputes the cover, the
 * seeded-listing diff, and each tile's fetched/absent status relationally.
 */
object TileScraper {

  /** Distinct zoom-`zoom` tile ids (`"z-x-y"`) covering every vertex of
    * `geomCol` (an `Array[Array[Double]]` lon/lat polyline). */
  def coverTiles(features: DataFrame, geomCol: String = "geometry",
      zoom: Int = 12): DataFrame = {
    val n = 1L << zoom
    val pt = explode(col(geomCol)).as("pt")
    val x = least(greatest(floor((element_at(col("pt"), 1) + 180.0) / 360.0 * n),
      lit(0.0)), lit((n - 1).toDouble)).cast("long")
    val y = least(greatest(floor((lit(90.0) - element_at(col("pt"), 2)) / 180.0 * n),
      lit(0.0)), lit((n - 1).toDouble)).cast("long")
    features.select(pt)
      .select(concat_ws("-", lit(zoom), x, y).as("tile_id"))
      .distinct()
  }

  /** Tile ids already present in `destDir` for (`kind`, `level`) — the
    * reference's `seenGeomTiles` readdir (one FS metadata call). */
  def existingTiles(spark: SparkSession, destDir: String, kind: String,
      level: Int): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(destDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else {
      val suffix = s".$kind.$level.pbf"
      val it = fs.listStatus(path).iterator
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val name = it.next().getPath.getName
        if (name.endsWith(suffix)) b += name.dropRight(suffix.length)
      }
      b.result()
    }
  }

  /**
   * Fetch every tile of `cover` (a `tile_id` DataFrame) not already in
   * `destDir` from `urlBase/<tile_id>.<kind>.<level>.pbf`. Returns one row
   * per missing tile: (tile_id, status, attempts) with status ∈
   * `fetched` | `absent` | `failed`.
   */
  def scrape(cover: DataFrame, urlBase: String, destDir: String,
      kind: String = "geometry", level: Int = 8, maxAttempts: Int = 3,
      fetchParallelism: Int = 32): DataFrame = {
    val spark = cover.sparkSession
    import spark.implicits._
    val seen = existingTiles(spark, destDir, kind, level).toSet
    val seenB = spark.sparkContext.broadcast(seen)
    val hadoopKVs = HadoopConf.kvs(spark)
    cover.select(col("tile_id").cast("string")).as[String]
      .filter(tid => !seenB.value.contains(tid))
      .repartition(fetchParallelism)
      .mapPartitions { tiles =>
        if (tiles.isEmpty) Iterator.empty
        else {
          val conf = HadoopConf.build(hadoopKVs)
          val dirPath = new org.apache.hadoop.fs.Path(destDir)
          val fs = dirPath.getFileSystem(conf)
          fs.mkdirs(dirPath)
          val ctx = org.apache.spark.TaskContext.get()
          val attemptId = if (ctx == null) 0L else ctx.taskAttemptId()
          tiles.map { tid =>
            val name = s"$tid.$kind.$level.pbf"
            val fin = new org.apache.hadoop.fs.Path(dirPath, name)
            if (fs.exists(fin)) (tid, "fetched", 0)
            else {
              var attempt = 0
              var status: String = null
              while (status == null) {
                attempt += 1
                try {
                  val conn = new java.net.URI(s"$urlBase/$name").toURL.openConnection()
                  conn.setConnectTimeout(10000)
                  conn.setReadTimeout(60000)
                  conn match {
                    case h: java.net.HttpURLConnection if h.getResponseCode == 404 =>
                      status = "absent"
                    case _ =>
                      val in = conn.getInputStream
                      val tmp = new org.apache.hadoop.fs.Path(dirPath,
                        s".$name.$attemptId.tmp")
                      val out = fs.create(tmp, true)
                      try {
                        val buf = new Array[Byte](64 * 1024)
                        var r = in.read(buf)
                        while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
                      } finally { out.close(); in.close() }
                      // lost the publish race to another attempt = still fetched
                      if (fs.exists(fin)) fs.delete(tmp, false)
                      else if (!fs.rename(tmp, fin) && !fs.exists(fin)) {
                        fs.delete(tmp, false)
                        throw new java.io.IOException(s"rename to $fin failed")
                      }
                      status = "fetched"
                  }
                } catch {
                  case _: java.io.FileNotFoundException => status = "absent"
                  case _: java.io.IOException if attempt < maxAttempts =>
                    Thread.sleep(100L * attempt)
                  case _: java.io.IOException => status = "failed"
                }
              }
              (tid, status, attempt)
            }
          }
        }
      }
      .toDF("tile_id", "status", "attempts")
  }
}

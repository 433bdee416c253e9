package graft
import graft.operators.ConflationPipeline
object PhaseBench extends App {
  val cpus = args(0)
  val nPages = if (args.length > 1) args(1).toLong else 400000L
  val nRoads = if (args.length > 2) args(2).toInt else 16000
  val spark = Bench.buildSession(cpus)
  spark.sparkContext.setLogLevel("WARN")
  def time(name: String)(f: => Any): Unit = {
    val t0 = System.nanoTime(); val r = f
    println(f"[p$cpus] $name ${(System.nanoTime()-t0)/1e9}%.2f ($r)")
  }
  val pages = ConflationPipeline.pages(spark, nPages, nRoads)
  time("pages"){ pages.count() }
  val feats = ConflationPipeline.features(pages, nRoads)
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  time("features+dedup"){ feats.count() }
  val refs = ConflationPipeline.references(spark, nRoads)
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  time("refs"){ refs.count() }
  val cand = ConflationPipeline.matchCandidates(feats, refs)
  val scoredc = ConflationPipeline.scoredCandidates(cand)
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  time("candidates+score"){ scoredc.count() }
  val m = graft.operators.MatchPostProcessor(scoredc).toDF()
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  time("postprocess"){ m.count() }
  val em = ConflationPipeline.enrichMatches(feats, m)
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  time("meso+mega enrich"){ em.count() }
  val segs = ConflationPipeline.conflate(refs, em)
  time("conflate"){ segs.count() }
  time("tiles"){ ConflationPipeline.tiles(ConflationPipeline.conflate(refs, em), 12).count() }
  spark.stop()
}

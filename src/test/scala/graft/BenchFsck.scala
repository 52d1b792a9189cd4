package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: AUDIT-ONLY fsck cost over pre-built indexes (the
  * BenchServe build-once pattern). The declared q170–q172 rows time
  * build + audit together, so the in-query build dominates and the
  * number a deployment actually budgets — "what does the standing
  * 100 TB index's integrity sweep cost?" — stays hidden. This builds
  * each of the three saved layouts once, then times the fsck verb
  * alone (min of 2 passes). Results land in BASELINE.md.
  *
  * Usage: Test/runMain graft.BenchFsck   (env: SPARK_GRAFT_SF_DIR) */
object BenchFsck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.withGraftConf(Tables.withBenchShuffle(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"), cpus.toInt, sfDir))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files
      .createTempDirectory("graft_benchfsck").toString
    def t[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = body
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def timed2(label: String)(audit: => Long): Double = {
      val a = t(audit)._1; val b = t(audit)._1
      val best = math.min(a, b)
      System.err.println(f"[benchfsck] $label%-12s $best%8.2f s")
      best
    }
    // vector: IVF layout, the q170 geometry at this SF
    val e = Tables.load(spark, sfDir, "embeddings")
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    val (vBuild, _) = t {
      VectorIndex.create(e, "embedding", "vec_id", dim = dim,
        nlist = 16, topUpNlist = true).save(s"$work/vec")
    }
    val vec = timed2("vector")(
      VectorIndex.fsckSaved(spark, s"$work/vec").count())
    // text: postings layout, the q171 geometry
    val docs = Tables.load(spark, sfDir, "documents")
    val (tBuild, _) = t {
      operators.TextSearch.buildIndex(docs, "doc_id", "text",
        s"$work/txt", nBuckets = 16)
    }
    val txt = timed2("text")(
      operators.TextSearch.fsckIndex(spark, s"$work/txt").count())
    // LSH: the crawl reference layout, the q172 geometry
    val (lBuild, _) = t {
      operators.Dedup.buildRefIndex(docs, "doc_id", "text",
        s"$work/lsh", k = 8, rowsPerBand = 2, shingleN = 3,
        nBuckets = 16)
    }
    val lsh = timed2("lsh")(
      operators.Dedup.fsckRefIndex(spark, s"$work/lsh").count())
    println(
      s"""{"metric":"fsck_audit","unit":"sec","sf":"$sfDir",""" +
      s""""vector":{"build":$vBuild,"audit":$vec},""" +
      s""""text":{"build":$tBuild,"audit":$txt},""" +
      s""""lsh":{"build":$lBuild,"audit":$lsh}}""")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    spark.stop()
  }
}

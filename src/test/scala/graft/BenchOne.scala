package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: reproduce the driver Bench loop for a subset of queries.
  * Usage: Test/runMain graft.BenchOne q19_ngram_jaccard q20_minhash_lsh */
object BenchOne {
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
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = try { SparkEntry.queries(name)(spark, sfDir).count() }
        catch { case _: Throwable => -1L }
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s rows=$n")
      // Shuffle files live until ContextCleaner sees their dependencies
      // GC'd; with a large heap that never happens mid-run and a long
      // suite fills the disk with dead spill. Force the cycle per query.
      // localCheckpoint blocks are likewise invisible to clearCache
      // (the r10 exit-137 mechanism in the full Bench) — sweep them too.
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: BenchOne with the full Bench methodology (warmup pass at
  * sf0.001, N timed passes, per-query MIN) for a subset of queries —
  * the host shows 3-5x load spikes from outside the container
  * (BASELINE.md "host noise"), so single-pass numbers cannot support an
  * A/B. Usage: Test/runMain graft.BenchMin [passes] q19_... q20_... */
object BenchMin {
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
    val (passes, names) = args.headOption.flatMap(a =>
        scala.util.Try(a.toInt).toOption) match {
      case Some(p) => (p, args.drop(1).toSeq)
      case None => (2, args.toSeq)
    }
    val warmDir = "/root/testdata/sf0.001"
    def sweep(): Unit = {
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).count()
      catch { case _: Throwable => () }
      sweep()
    }
    val acc = scala.collection.mutable.Map[String, (Double, Long)]()
    for (p <- 1 to passes; name <- names) {
      val t0 = System.nanoTime()
      val n = try { SparkEntry.queries(name)(spark, sfDir).count() }
        catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      sweep()
      System.err.println(f"[pass $p] $name%-28s $dt%8.3f s rows=$n")
      val cur = acc.getOrElse(name, (Double.MaxValue, n))
      acc(name) = (math.min(cur._1, dt), n)
    }
    names.foreach { n =>
      val (dt, rows) = acc(n)
      println(f"$n%-28s $dt%8.3f s rows=$rows (min of $passes)")
    }
    println(f"TOTAL ${names.map(acc(_)._1).sum}%8.3f s")
    spark.stop()
  }
}

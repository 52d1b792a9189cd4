package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (test scope): stage timing for q108 pagerank. */
object ProfilePR {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.withGraftConf(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm
    SparkEntry.queries("q108_pagerank")(spark, sfDir).count()
    spark.sharedState.cacheManager.clearCache()
    val li = Tables.load(spark, sfDir, "lineitem")
    val sp = li.select(concat(lit("s"), col("l_suppkey")).as("src"),
      concat(lit("p"), col("l_partkey")).as("dst")).distinct()
    val edges = sp.union(sp.select(col("dst").as("src"), col("src").as("dst")))
    time("edges.count")(edges.count())
    val e = edges.distinct().persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("e materialize")(e.count())
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    val ew = e.join(outdeg, "src").persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("ew materialize")(ew.count())
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = time("nodes.count")(nodes.count())
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    time("warm ranks0")(ranks.count())
    for (i <- 1 to 3) {
      val in = ew.join(ranks, ew("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("__deg")).as("__in"))
      ranks = nodes.join(in, Seq("node"), "left")
        .select(col("node"), round(lit(0.15 / n) +
          lit(0.85) * coalesce(col("__in"), lit(0.0)), 9).as("rank"))
      ()
    }
    time("final topk")(ranks.orderBy(col("rank").desc, col("node"))
      .limit(50).collect())
    spark.stop()
  }
}

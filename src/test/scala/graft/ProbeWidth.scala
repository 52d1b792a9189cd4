package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: what does Dedup.dataWidth see for the graph edge inputs? */
object ProbeWidth {
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
    val sp = Tables.load(spark, sfDir, "lineitem").select(
      concat(lit("s"), col("l_suppkey")).as("src"),
      concat(lit("p"), col("l_partkey")).as("dst")).distinct()
    val edges = sp.union(sp.select(col("dst").as("src"), col("src").as("dst")))
    def stats(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      println(f"$name%-12s sizeInBytes=${df.queryExecution.optimizedPlan.stats.sizeInBytes}")
    stats("sp", sp)
    stats("edges", edges)
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst")).distinct()
    stats("e", e)
    val persisted = e.persist()
    persisted.count()
    stats("e-cached", persisted)
    spark.stop()
  }
}

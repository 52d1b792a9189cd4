package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: what does an N-task no-op stage cost in this session?
  * Isolates the per-stage scheduling floor the iterative loops pay. */
object ProbeFloor {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- Seq(1, 8, 32, 64); rep <- 1 to 3) {
      val t0 = System.nanoTime()
      spark.sparkContext.parallelize(0 until n, n).count()
      println(f"rdd  n=$n%3d rep=$rep  ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
    }
    // DataFrame path with a shuffle: closer to what a round's stage does
    for (n <- Seq(1, 8, 32, 64); rep <- 1 to 3) {
      val t0 = System.nanoTime()
      spark.range(0, 1000, 1, n).groupBy((org.apache.spark.sql.functions
        .col("id") % 7)).count().count()
      println(f"sql  n=$n%3d rep=$rep  ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
    }
    spark.stop()
  }
}

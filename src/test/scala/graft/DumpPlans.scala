package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` for declared queries to files —
  * the plans/r<N>/<query>_{before,after}.txt deliverable of the
  * optimization rounds. Usage:
  *   Test/runMain graft.DumpPlans <outDir> <suffix> q108_pagerank ...
  * writes <outDir>/q108_pagerank_<suffix>.txt etc. (sf0.01 — plan shape,
  * not timing). */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val spark = Tables.withGraftConf(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (q <- names) {
      val s = SparkEntry.queries(q)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${q}_$suffix.txt"),
        s.getBytes("UTF-8"))
      println(s"wrote $q")
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Scratch: dump formatted plans for plan-quality audit (test scope). */
object DebugPlans {
  def main(args: Array[String]): Unit = {
    val spark = Tables.withGraftConf(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    for (q <- args) {
      println(s"\n================ $q ================")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: split q47's cost into pair-input vs component-loop time. */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.withGraftConf(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUF", "32"))
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    // warm
    operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text").count()
    val pairs = time("pairs") {
      val p = operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text")
        .select(col("a"), col("b")).persist()
      p.count(); p
    }
    time("components") {
      operators.Dedup.connectedComponents(pairs).count()
    }
    time("components2") {
      operators.Dedup.connectedComponents(pairs).count()
    }
    spark.stop()
  }
}

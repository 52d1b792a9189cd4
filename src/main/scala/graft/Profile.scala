package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler (dev tool, not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.withGraftConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    // warm
    operators.Dedup.minhashCandidates(docs, "doc_id", "text").count()
    time("shingles")(operators.Dedup.shingles(docs, "doc_id", "text").count())
    time("signatures")(
      operators.Dedup.minhashSignatures(docs, "doc_id", "text").count())
    time("candidates")(
      operators.Dedup.minhashCandidates(docs, "doc_id", "text").count())
    time("candidates2")(
      operators.Dedup.minhashCandidates(docs, "doc_id", "text").count())
    time("jaccard")(operators.Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", 3, 0.5).count())
    // window vs aggregator top-k over a wider query batch
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 64)
      .select(col("vec_id").as("qid"), col("embedding"))
    operators.Search.knnBatch(e, "embedding", "vec_id", q, "embedding",
      "qid", k = 10).count() // warm
    time("topk_window_64q")(operators.Search.knnBatch(
      e, "embedding", "vec_id", q, "embedding", "qid", k = 10).count())
    time("topk_agg_64q")(operators.Search.knnBatchAgg(
      e, "embedding", "vec_id", q, "embedding", "qid", k = 10).count())
    spark.stop()
  }
}

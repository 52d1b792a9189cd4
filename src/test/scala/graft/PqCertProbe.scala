package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (test scope): certifyPqProbed margins across operating points
  * and searchPqExact-vs-brute-force parity, at a given sf dir. */
object PqCertProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Tables.withGraftConf(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, sfDir, "embeddings")
    val centroids = operators.IvfIndex.fitCentroids(e, "embedding", "vec_id", 16)
    val pq = operators.IvfIndex.fitPq(e, "embedding", "vec_id", m = 8)
    val index = operators.IvfIndex.withPqResiduals(
      operators.IvfIndex.withPqCodes(
        operators.IvfIndex.assign(e, "embedding", "vec_id", centroids),
        "embedding", pq),
      "embedding", pq).persist()
    val q = e.filter(col("vec_id") === 11).select(col("embedding")).head()
      .getSeq[Float](0).map(_.toDouble)
    for (nProbe <- Seq(4, 8); shortlist <- Seq(48, 192)) {
      val (pm, sm) = operators.IvfIndex.certifyPqProbed(index, "embedding",
        "vec_id", centroids, pq, q, k = 12, nProbe, shortlist)
      println(f"nProbe=$nProbe%2d shortlist=$shortlist%4d probeMargin=$pm%9.4f shortlistMargin=$sm%9.4f certified=${pm > 0 && sm > 0}")
    }
    for (qid <- Seq(3L, 11L, 42L); seed <- Seq(12, 48)) {
      val qv = e.filter(col("vec_id") === qid).select(col("embedding")).head()
        .getSeq[Float](0).map(_.toDouble)
      val t0 = System.nanoTime()
      val got = operators.IvfIndex.searchPqExact(index, "embedding", "vec_id",
          centroids, pq, qv, k = 12, seed = seed)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
      val dt = (System.nanoTime() - t0) / 1e9
      val brute = e
        .withColumn("dist", round(graft.functions.VectorFunctions.sqDist(
          col("embedding"), array(qv.map(lit): _*)), 6))
        .orderBy(col("dist"), col("vec_id")).limit(12)
        .select(col("vec_id"), col("dist"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
      println(f"qid=$qid%3d seed=$seed%3d exact=${got == brute} ($dt%5.2f s)")
      spark.sharedState.cacheManager.clearCache()
      index.persist()
    }
    spark.stop()
  }
}

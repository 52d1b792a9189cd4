package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-wise wall times of q76's searchPqExact chain, to
  * localize the ×100-scale superlinearity. Not part of the library. */
object DebugQ76 {
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
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q76] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val e = Tables.load(spark, sfDir, "embeddings")
    val centroids = timed("fitCentroids") {
      operators.IvfIndex.fitCentroids(e, "embedding", "vec_id", 16)
    }
    val pq = timed("fitPq") {
      operators.IvfIndex.fitPq(e, "embedding", "vec_id", m = 8)
    }
    val index = operators.IvfIndex.withPqResiduals(
      operators.IvfIndex.withPqCodes(
        operators.IvfIndex.assign(e, "embedding", "vec_id", centroids),
        "embedding", pq),
      "embedding", pq)
    timed("materialize index (count)") { index.count() }
    val radii = timed("listRadii") {
      operators.IvfIndex.listRadii(index, "embedding", centroids)
    }
    val q = e.filter(col("vec_id") === 11).select(col("embedding")).head()
      .getSeq[Float](0).map(_.toDouble)
    val res = timed("searchPqExact (radii given)") {
      operators.IvfIndex.searchPqExact(index, "embedding", "vec_id",
        centroids, pq, q, k = 12, seed = 48, radii = Some(radii)).collect()
    }
    println(s"[q76] rows=${res.length}")

    // inline bisection of searchPqExact's steps
    val adc = operators.IvfIndex.adcExpr(pq, q)
    timed("force encode chain") {
      index.select(sum(col(operators.IvfIndex.PqResCol)), sum(element_at(col(operators.IvfIndex.PqCol), 1)))
        .head()
    }
    val rStar = timed("rStar job") {
      index.select((sqrt(adc) + col(operators.IvfIndex.PqResCol)).as("__u"))
        .orderBy(col("__u")).limit(12)
        .agg(max(col("__u"))).head().getDouble(0)
    }
    def qDist(c: Seq[Double]): Double = math.sqrt(
      c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
    val lists = centroids.collect {
      case (id, c) if qDist(c) <= rStar + radii.getOrElse(id, 0.0) => id
    }
    println(s"[q76] rStar=$rStar lists=${lists.size}/16")
    val codes = timed("codes persist") {
      val c = index.filter(col("list_id").isin(lists: _*))
        .select(col("vec_id"), adc.as("__adist"), col(operators.IvfIndex.PqResCol)).persist()
      c.count(); c
    }
    val seedIds = codes.orderBy(col("__adist"), col("vec_id"))
      .limit(48).select(col("vec_id"))
    val probedVecs = index.filter(col("list_id").isin(lists: _*))
    val qVec = array(q.map(lit): _*)
    import graft.functions.VectorFunctions.sqDist
    val dk0 = timed("dk0 seed job") {
      probedVecs.join(broadcast(seedIds), Seq("vec_id"))
        .select(sqrt(sqDist(col("embedding").cast("array<double>"), qVec))
          .as("__d"))
        .orderBy(col("__d")).limit(12)
        .agg(max(col("__d"))).head().getDouble(0)
    }
    val expandIds = codes
      .filter(sqrt(col("__adist")) - col(operators.IvfIndex.PqResCol) <= lit(dk0))
      .select(col("vec_id"))
    timed("expand count") { println(s"[q76] expand=${expandIds.count()}") }
    timed("final join") {
      probedVecs.join(expandIds, Seq("vec_id"))
        .withColumn("dist",
          round(sqDist(col("embedding").cast("array<double>"), qVec), 6))
        .select(col("vec_id"), col("dist"))
        .orderBy(col("dist"), col("vec_id"))
        .limit(12).collect()
    }
    spark.stop()
  }
}

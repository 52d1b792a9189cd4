package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off generator for the BASELINE.md scaling datapoint (VERDICT r4
  * ask #6): replicate the driver's sf0.1 tables `factor`× with shifted
  * keys, producing an sf~1 dataset the bench can run against.
  *
  * Replication is designed so the WORKLOAD scales linearly in rows —
  * each copy is a disjoint, internally-identical world:
  *   - every key column shifts by copy × (max_key + 1), so joins never
  *     cross copies and per-key densities are unchanged;
  *   - document text gets a per-copy token prefix, so shingle/MinHash/
  *     Jaccard structure repeats per copy instead of pairing 10 identical
  *     copies of every doc (which would quadratically inflate pair counts
  *     for data reasons, not engine reasons);
  *   - embeddings shift by a large per-copy constant (and labels by a
  *     per-copy offset), keeping near-dup blocks copy-local;
  *   - customer balances shift per copy so the similarity self-join's
  *     pair density stays constant.
  * region/nation are fixed dimensions at every TPC-H scale and copy
  * verbatim. Copy 0 is bit-identical to the source, so fixed-literal
  * queries (vec_id = 0, etc.) keep their semantics.
  *
  * Usage: Test/runMain graft.MakeScale <srcSfDir> <outDir> <factor>
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.withGraftConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def src(name: String): DataFrame = Tables.load(spark, srcDir, name)
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0)

    def replicate(name: String, keyCols: Seq[(String, Long)],
                  tweak: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = src(name)
      val copies = (0 until factor).map { i =>
        val shifted = keyCols.foldLeft(base) { case (d, (c, space)) =>
          d.withColumn(c, col(c) + lit(i * space))
        }
        tweak(shifted, i)
      }
      copies.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scale] $name x$factor written")
    }

    // fixed dimension tables: identical at every TPC-H scale factor
    Seq("region", "nation").foreach { n =>
      src(n).write.mode("overwrite").parquet(s"$outDir/$n.parquet")
    }

    val cust = maxOf(src("customer"), "c_custkey") + 1
    val supp = maxOf(src("supplier"), "s_suppkey") + 1
    val part = maxOf(src("part"), "p_partkey") + 1
    val ord = maxOf(src("orders"), "o_orderkey") + 1
    val ev = maxOf(src("events"), "event_id") + 1
    val doc = maxOf(src("documents"), "doc_id") + 1
    val vec = maxOf(src("embeddings"), "vec_id") + 1

    replicate("customer", Seq("c_custkey" -> cust),
      // keep cross-copy balance densities constant for the similarity join
      (d, i) => d.withColumn("c_acctbal", col("c_acctbal") + lit(i * 20000)))
    replicate("supplier", Seq("s_suppkey" -> supp))
    replicate("part", Seq("p_partkey" -> part))
    replicate("orders", Seq("o_orderkey" -> ord, "o_custkey" -> cust))
    replicate("lineitem", Seq("l_orderkey" -> ord, "l_partkey" -> part,
      "l_suppkey" -> supp))
    replicate("events", Seq("event_id" -> ev, "user_id" -> cust))
    replicate("documents", Seq("doc_id" -> doc), (d, i) =>
      if (i == 0) d
      else d.withColumn("text", array_join(
        transform(split(col("text"), " "), w => concat(lit(s"c$i"), w)), " ")))
    replicate("embeddings", Seq("vec_id" -> vec), (d, i) =>
      if (i == 0) d
      else d
        .withColumn("embedding",
          transform(col("embedding"), x => (x + lit(i * 8.0)).cast("float")))
        .withColumn("label", col("label") + lit(i * 1000000)))

    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: the BPE merge-loop round-cost curve — recount
  * (`bpeMerges`: full pair recount per round through an r-deep replace
  * chain) vs delta (`bpeMergesDelta`: maintained pair counts, delta
  * sized by affected types). The question a real tokenizer build asks:
  * where is the crossover, and does the recount's per-round cost GROW
  * with r (it re-explodes the corpus through an ever-deeper chain)
  * while delta's stays flat?
  *
  * Prints one JSON line per (mode, nMerges) point: total secs and
  * secs/round for the LAST block of rounds (rounds [n/2, n] — the
  * marginal cost, where the recount's growth shows).
  * Usage: SPARK_GRAFT_SF_DIR=... Test/runMain graft.BenchBpe [maxMerges]
  *        [mode] — optional 2nd arg "delta" or "recount" runs one mode
  *        only (the 1k+-merge anchor wants delta alone: the recount's
  *        growing marginal makes it minutes-per-point there, and its
  *        curve is already recorded to 320).
  */
object BenchBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val maxMerges = args.headOption.map(_.toInt).getOrElse(160)
    val spark = Tables.withGraftConf(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("text")).cache()
    docs.count() // warm the input out of the measurement
    def secs(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val points = Iterator.iterate(10)(_ * 2).takeWhile(_ <= maxMerges).toSeq
    val modes = args.lift(1).map(Seq(_)).getOrElse(Seq("recount", "delta"))
    for (n <- points; mode <- modes) {
      val half = secs {
        (if (mode == "delta")
          graft.operators.TextAnalysis.bpeMergesDelta(docs, "text", n / 2)
        else graft.operators.TextAnalysis.bpeMerges(docs, "text", n / 2))
          .collect()
      }
      val full = secs {
        (if (mode == "delta")
          graft.operators.TextAnalysis.bpeMergesDelta(docs, "text", n)
        else graft.operators.TextAnalysis.bpeMerges(docs, "text", n))
          .collect()
      }
      // marginal cost of rounds (n/2, n]: the recount's chain-depth
      // growth lives here; a flat delta curve is the scale claim
      val marginal = (full - half) / (n - n / 2)
      println(
        s"""{"metric":"bpe","mode":"$mode","n_merges":$n,""" +
        s""""total_secs":$full,"marginal_secs_per_round":$marginal,""" +
        s""""sf":"$sfDir"}""")
      spark.sqlContext.clearCache()
      docs.cache(); docs.count()
      System.gc()
    }
    spark.stop()
  }
}

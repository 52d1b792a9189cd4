package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Sampling, Sketches, TextAnalysis}

/** Corruption cases for the FsckCore-family audit verbs (sketches, LM,
  * eval index, component assignment, packed shards): each test plants a
  * specific violation of the invariant the check names and asserts
  * exactly that check goes red — the audit diagnoses, it never crashes
  * on the corruption it exists to report. Healthy-path outputs are
  * pinned by the q173–q175 oracles; these specs pin the red paths. */
class FsckFamiliesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/rel"

  private def checks(df: DataFrame): Map[String, (Boolean, Long)] =
    df.collect().map(r =>
      r.getString(0) -> (r.getBoolean(1), r.getLong(2))).toMap

  test("CMS fsck: a cell outside the declared geometry and broken " +
       "per-seed mass go red; the healthy build is all-green") {
    val path = tmp("graft_fsck_cms")
    val docs = Seq((0L, "a b c a"), (1L, "b c d")).toDF("id", "t")
      .select(col("id"), explode(split(col("t"), " ")).as("token"))
    Sketches.saveCounters(
      Sketches.countMinCounters(docs, col("token"), 4, 64), path)
    val healthy = checks(Sketches.fsckCounters(spark, path, 4, 64))
    assert(healthy.values.forall(_._1), s"healthy build red: $healthy")
    assert(healthy("mass_per_seed_equal")._2 == 7L) // 7 tokens sketched
    // plant one cell violating every geometry invariant at once
    Seq((7, 600L, 5L)).toDF("seed", "bucket", "counter")
      .write.mode("append").parquet(path)
    val bad = checks(Sketches.fsckCounters(spark, path, 4, 64))
    assert(!bad("seed_domain")._1)
    assert(!bad("bucket_domain")._1)
    assert(!bad("mass_per_seed_equal")._1)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(path).getParentFile)
  }

  test("histogram fsck: out-of-domain bin and non-positive count go red") {
    val path = tmp("graft_fsck_hist")
    Sketches.saveHistogram(Sketches.histogramCounts(
      Seq(1.0, 2.0, 55.0).toDF("v"), col("v"), 0.0, 64.0, 8), path)
    assert(checks(Sketches.fsckHistogram(spark, path, 8))
      .values.forall(_._1))
    Seq((300L, -2L)).toDF("bin", "cnt").write.mode("append").parquet(path)
    val bad = checks(Sketches.fsckHistogram(spark, path, 8))
    assert(!bad("bin_domain")._1 && !bad("counts_positive")._1)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(path).getParentFile)
  }

  test("HLL fsck: bucket/rho outside the md5/bin construction's domain " +
       "go red; a missing relation is a failing readable row") {
    val path = tmp("graft_fsck_hll")
    val ev = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "u")
    Sketches.saveHll(
      Sketches.hllRegisters(ev, col("u"), 16, Seq("g")), path)
    val healthy = checks(Sketches.fsckHll(spark, path, 16, Seq("g")))
    assert(healthy.values.forall(_._1))
    assert(healthy("groups")._2 == 2L)
    Seq(("x", 999L, 40L)).toDF("g", "bucket", "reg")
      .write.mode("append").parquet(path)
    val bad = checks(Sketches.fsckHll(spark, path, 16, Seq("g")))
    assert(!bad("bucket_domain")._1 && !bad("reg_domain")._1)
    val missing = checks(Sketches.fsckHll(spark, path + "_nope", 16))
    assert(missing == Map("readable" -> (false, 0L)))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(path).getParentFile)
  }

  test("LM fsck: null token and non-positive count go red; vocabulary " +
       "and mass details are the base recompute") {
    val path = tmp("graft_fsck_lm")
    val docs = Seq((0L, "a b a"), (1L, "b c")).toDF("doc_id", "text")
    TextAnalysis.saveLm(TextAnalysis.lmCounts(docs, "text"), path)
    val healthy = checks(TextAnalysis.fsckLm(spark, path))
    assert(healthy.values.forall(_._1))
    assert(healthy("rows_nonempty")._2 == 3L) // vocab {a, b, c}
    assert(healthy("mass")._2 == 5L)          // 5 tokens
    Seq((Option.empty[String], 0L)).toDF("token", "cnt")
      .write.mode("append").parquet(path)
    val bad = checks(TextAnalysis.fsckLm(spark, path))
    assert(!bad("tokens_nonnull")._1 && !bad("counts_positive")._1)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(path).getParentFile)
  }

  test("eval-index fsck: cross-append duplicate rows are reported as " +
       "legal residue (ok stays true, detail counts them)") {
    val path = tmp("graft_fsck_eval")
    val suite = Seq((0L, "a b c d e f g h i"), (1L, "x y"))
      .toDF("doc_id", "text") // doc 1 is shorter than the shingle width
    TextAnalysis.buildEvalIndex(suite, "doc_id", "text", 8, path)
    val healthy = checks(TextAnalysis.fsckEvalIndex(spark, path))
    assert(healthy.values.forall(_._1))
    assert(healthy("rows_nonempty")._2 == 1L) // only doc 0 shingles
    assert(healthy("duplicate_rows")._2 == 0L)
    // a replayed append re-ships the same suite: rows double, scoring
    // still dedups — fsck reports the compaction-due residue
    TextAnalysis.appendEvalIndex(suite, "doc_id", "text", 8, path)
    val dup = checks(TextAnalysis.fsckEvalIndex(spark, path))
    assert(dup("duplicate_rows")._1 && dup("duplicate_rows")._2 == 2L)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(path).getParentFile)
  }

  test("component-assignment fsck: duplicate ids (appended snapshots), " +
       "unflattened chains and rep>id all go red") {
    val path = tmp("graft_fsck_cc")
    Dedup.saveComponents(
      Seq((2L, 1L), (3L, 1L)).toDF("a", "b"), path)
    assert(checks(Dedup.fsckComponents(spark, path)).values.forall(_._1))
    // an appended second snapshot breaks the one-rep-per-id function
    spark.read.parquet(path).localCheckpoint()
      .write.mode("append").parquet(path)
    assert(!checks(Dedup.fsckComponents(spark, path))("ids_unique")._1)
    // an unflattened pointer chain: 3 -> 2 while 2 -> 1
    val chained = tmp("graft_fsck_cc2")
    Seq((1L, 1L), (2L, 1L), (3L, 2L)).toDF("id", "rep")
      .write.parquet(chained)
    val c = checks(Dedup.fsckComponents(spark, chained))
    assert(!c("reps_canonical")._1 && c("reps_min")._1)
    // rep above id violates the min convention
    val inverted = tmp("graft_fsck_cc3")
    Seq((1L, 2L), (2L, 2L)).toDF("id", "rep").write.parquet(inverted)
    assert(!checks(Dedup.fsckComponents(spark, inverted))("reps_min")._1)
    Seq(path, chained, inverted).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(p).getParentFile))
  }

  test("shard fsck: a lost shard directory breaks the manifest " +
       "cross-checks; a missing manifest is a failing row while the " +
       "data checks still run") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_fsck_sh").toString + "/pack"
    val docs = (0L until 40L).map(i => (i, "tok " * ((i % 7).toInt + 1)))
      .toDF("doc_id", "text")
    Sampling.writeShards(Sampling.packSequences(docs, "doc_id",
      size(split(col("text"), " ")), budget = 16, nShards = 3),
      "doc_id", path)
    val healthy = checks(Sampling.fsckShards(spark, path))
    assert(healthy.values.forall(_._1), s"healthy pack red: $healthy")
    assert(healthy("shard_domain_match")._2 == 3L)
    // the partial-copy scenario: one loader rank's directory is gone
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$path/data/shard_part=0"))
    val bad = checks(Sampling.fsckShards(spark, path))
    assert(!bad("shard_domain_match")._1)
    assert(!bad("rows_match_manifest")._1)
    // manifest lost: failing row, data checks still present
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$path/manifest"))
    val noMan = checks(Sampling.fsckShards(spark, path))
    assert(!noMan("manifest_readable")._1)
    assert(noMan.contains("ids_unique"))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(path).getParentFile)
  }
}

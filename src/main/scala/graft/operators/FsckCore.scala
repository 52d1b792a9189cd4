package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared core of the at-rest fsck verbs (reference semantics: the
  * audit a deployment runs before trusting a persisted structure —
  * the at-rest analog of the reference's in-memory invariants,
  * `include/pktree.hpp:1290-1354` keeps them by construction; a
  * filesystem layout has to re-check them).
  *
  * The three index families (vector/text/LSH) carry sidecars and
  * bucket geometry, so their verbs stay bespoke
  * (VectorIndex.fsckSaved, TextSearch.fsckIndex, Dedup.fsckRefIndex).
  * The remaining saved families — the mergeable sketches (CMS,
  * histogram, HLL), the unigram LM, the decontamination eval index,
  * the component assignment, the packed shards — share this core:
  * every verb emits `(chk, ok, detail)` rows, a missing/unreadable
  * relation becomes a single failing `*_readable` row (the
  * partial-copy diagnosis) instead of a crash, and family invariants
  * plug in as plain checks. Details are recompute-predictable where a
  * base-table recompute can state them (mass conservation, vocabulary
  * size, group counts) and contract constants elsewhere — the q170
  * oracle discipline. */
private[graft] object FsckCore {
  type Check = (String, Boolean, Long)

  /** Read a saved relation, mapping the corruption fsck exists to
    * diagnose (missing dir, no parquet footers, torn copy) to a
    * failing check row rather than an exception out of the audit. */
  def readRelation(spark: SparkSession, path: String,
                   chk: String): Either[Check, DataFrame] =
    try Right(spark.read.parquet(path))
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        Left((chk, false, 0L))
    }

  def toDf(spark: SparkSession, rows: Seq[Check]): DataFrame = {
    import spark.implicits._
    rows.toDF("chk", "ok", "detail").orderBy("chk")
  }
}

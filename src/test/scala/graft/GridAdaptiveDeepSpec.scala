package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GridIndex, Search}

/** Recursive adaptive refinement (r16 verdict missing #2): the
  * K-instantiable split CASCADE — a hot cell whose fine cells are
  * still over the row cap re-splits again, to `maxLevels` depth —
  * where the two-level form stopped at one split and silently kept
  * >cap rows behind one pruning key. These specs drive a dataset with
  * a point-like hotspot (so one refinement cannot bring it under cap),
  * pin the level encoding's disjointness, prove serving losslessness
  * at depth >= 2 in memory and at rest, and pin the SATURATION signal
  * (fit-time Obs event + at-rest fsck row) for the hotspot that
  * out-refines its budget. */
class GridAdaptiveDeepSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits.{newLongEncoder, rddToDatasetHolder}

  /** 900 background rows spread over [0,100)² plus 600 rows packed
    * into a 0.2×0.2 hotspot square — one refinement (refine=4 over
    * cellsPerDim=5: 20-unit base cells, 5-unit fine cells) cannot
    * bring the hotspot under a 50-row cap; five levels can. */
  private lazy val df = {
    val rnd = new scala.util.Random(29)
    val bg = (0 until 900).map(i =>
      (i.toLong, Seq(rnd.nextDouble() * 100, rnd.nextDouble() * 100)))
    val hot = (0 until 600).map(i =>
      (900L + i, Seq(40.0 + rnd.nextDouble() * 0.2,
        40.0 + rnd.nextDouble() * 0.2)))
    spark.createDataset(spark.sparkContext.parallelize(bg ++ hot, 4))(
      org.apache.spark.sql.Encoders.product[(Long, Seq[Double])])
      .toDF("id", "vec")
  }

  test("fitAdaptive(maxLevels=5): the cascade recurses, level ids stay " +
       "disjoint, and no terminal pruning key holds more than rowCap " +
       "rows (the invariant the two-level form silently lost)") {
    val spec = GridIndex.fitAdaptive(df, "vec", 2, cellsPerDim = 5,
      rowCap = 50, refine = 4, maxLevels = 5)
    assert(spec.hot.nonEmpty, "the hotspot base cell must be hot")
    assert(spec.deepHots.nonEmpty,
      "a 0.2-unit hotspot must stay hot after one 4x refinement of " +
        "20-unit cells")
    assert(spec.depth >= 2)
    // encoding: every (level, raw id) pair maps to a unique stored id
    val all = (0 to spec.depth).flatMap { k =>
      (0L until math.min(spec.idSpaceAt(k), 4096L))
        .map(id => spec.encode(k, id))
    }
    assert(all.distinct.size == all.size,
      "level encodings must never collide")
    // the split invariant, restored: terminal keys all within cap
    val maxKey = GridIndex.withCellIdAdaptive(df, "vec", spec)
      .groupBy(col("cell_id")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxKey <= 50,
      s"terminal pruning keys must respect rowCap, max = $maxKey")
  }

  test("depth >= 2 serving is lossless: pruned range search and ring " +
       "kNN equal brute force, including inside the hotspot") {
    val spec = GridIndex.fitAdaptive(df, "vec", 2, cellsPerDim = 5,
      rowCap = 50, refine = 4, maxLevels = 5)
    val indexed = GridIndex.withCellIdAdaptive(df, "vec", spec)
    for ((q, r) <- Seq((Seq(40.1, 40.1), 0.05), (Seq(40.1, 40.1), 5.0),
                       (Seq(10.0, 90.0), 25.0))) {
      val got = GridIndex.rangeSearchAdaptive(indexed, "vec", spec, q, r)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      val brute = Search.rangeSearch(df, "vec",
          array(q.map(lit): _*), r)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == brute, s"range q=$q r=$r")
    }
    for (q <- Seq(Seq(40.05, 40.05), Seq(75.0, 20.0))) {
      val got = GridIndex.knnAdaptive(indexed, "vec", "id", spec, q, 12)
        .select("id").collect().map(_.getLong(0)).toSeq
      val brute = Search.knn(df, "vec", "id",
          array(q.map(lit): _*), 12)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(got == brute, s"knn q=$q")
    }
  }

  test("at rest: save/load round-trips deepHots + rowCap, fsck is green " +
       "with refinement_saturated detail 0, and the loaded index serves " +
       "the brute-force answer") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_deep_idx").toString + "/idx"
    try {
      VectorIndex.create(df, "vec", "id", dim = 2, cellsPerDim = 5,
        rowCap = 50, refine = 4, adaptiveLevels = 5).save(dir)
      val meta = IndexMeta.read(spark, dir).get
      val spec = meta.adaptiveSpec.get
      assert(spec.deepHots.nonEmpty && spec.rowCap.contains(50L))
      val fsck = VectorIndex.fsckSaved(spark, dir)
      assert(fsck.filter(!col("ok")).isEmpty)
      val sat = fsck.filter(col("chk") === "refinement_saturated")
        .select("detail").head().getLong(0)
      assert(sat == 0L, "a depth-5 cascade must leave no over-cap key")
      val got = VectorIndex.load(spark, dir)
        .rangeSearch(Seq(40.1, 40.1), 3.0)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      val brute = Search.rangeSearch(df, "vec",
          array(lit(40.1), lit(40.1)), 3.0)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == brute)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
    }
  }

  test("adjacent hot cells: the ±1-expanded blocks overlap, but the " +
       "enumerators emit each cell id exactly once (the batch cores' " +
       "probe-pair joins double-count duplicates — a TopK certificate " +
       "could fire with fewer than k real rows)") {
    val base = GridIndex.GridSpec(Seq(0.0, 0.0), Seq(10.0, 10.0),
      Seq(4, 4))
    val fine = GridIndex.GridSpec(Seq(0.0, 0.0), Seq(2.5, 2.5),
      Seq(16, 16))
    // two ADJACENT hot base cells along x: each expands its fine block
    // ±1, so the shared boundary's fine cells appear in BOTH blocks
    val hot = Set(base.linearize(Seq(0L, 0L)), base.linearize(Seq(1L, 0L)))
    val spec = GridIndex.AdaptiveSpec(base, fine, 4, hot)
    // ball centered on the shared boundary, covering both hot cells
    val cells = GridIndex.cellsForBallAdaptive(spec, Seq(10.0, 5.0), 8.0)
    assert(cells.distinct.size == cells.size,
      "unbounded enumerator must dedup the overlapping blocks")
    val bounded = GridIndex
      .cellsForBallAdaptiveBounded(spec, Seq(10.0, 5.0), 8.0).get
    assert(bounded.distinct.size == bounded.size,
      "bounded enumerator must dedup the overlapping blocks")
    assert(bounded.toSet == cells.toSet,
      "both enumerators must agree on the candidate set")
    // the overlap is real: the shared-boundary fine columns are inside
    // both parents' expanded blocks (the condition that used to emit
    // them twice)
    assert(cells.count(_ < 0) > 0)
  }

  test("saturation is signalled, not silent: maxLevels=1 on the hotspot " +
       "emits the fit-time Obs event and the at-rest fsck row reports " +
       "the over-cap terminal keys (ok stays true — a cost signal)") {
    val (_, events) = graft.Obs.withCapture {
      GridIndex.fitAdaptive(df, "vec", 2, cellsPerDim = 5,
        rowCap = 50, refine = 4, maxLevels = 1)
    }
    val sat = events.filter(_._1 == "adaptive-saturated")
    assert(sat.nonEmpty, "fit must report the out-refined hotspot")
    assert(sat.head._2.toMap.apply("overCapCells").asInstanceOf[Int] >= 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_deep_sat").toString + "/idx"
    try {
      VectorIndex.create(df, "vec", "id", dim = 2, cellsPerDim = 5,
        rowCap = 50, refine = 4, adaptiveLevels = 1).save(dir)
      val fsck = VectorIndex.fsckSaved(spark, dir)
      assert(fsck.filter(!col("ok")).isEmpty,
        "saturation is legal residue — no red row")
      val detail = fsck.filter(col("chk") === "refinement_saturated")
        .select("detail").head().getLong(0)
      assert(detail >= 1L,
        "fsck must surface the over-cap terminal keys")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
    }
  }
}

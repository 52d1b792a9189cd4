package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GridIndex, Search}

/** Pruned search must be lossless: identical results to the naive
  * full-scan path on every input (SURVEY §5.2 — the analog of validating
  * against the reference's recursive workers). */
class GridIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def randomDf(n: Int, dim: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 200 - 100)))
      .toDF("id", "vec")
  }

  test("pruned range == naive range (random 2-D / 3-D, many radii)") {
    for (dim <- Seq(2, 3); seed <- Seq(1, 2)) {
      val df = randomDf(400, dim, seed)
      val spec = GridIndex.fit(df, "vec", dim, cellsPerDim = 6)
      val indexed = GridIndex.withCellId(df, "vec", spec)
      val rnd = new scala.util.Random(seed + 100)
      for (_ <- 1 to 3) {
        val q = Seq.fill(dim)(rnd.nextDouble() * 240 - 120) // also out-of-grid
        val r = rnd.nextDouble() * 80
        val naive = Search.rangeSearch(df, "vec", array(q.map(lit): _*), r)
          .select("id").collect().map(_.getLong(0)).sorted.toSeq
        val pruned = GridIndex.rangeSearch(indexed, "vec", spec, q, r)
          .select("id").collect().map(_.getLong(0)).sorted.toSeq
        assert(pruned == naive, s"dim=$dim seed=$seed q=$q r=$r")
      }
    }
  }

  test("ring-expansion kNN == naive kNN (including k > cell population)") {
    val df = randomDf(500, 2, 7)
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 8)
    val indexed = GridIndex.withCellId(df, "vec", spec)
    for (k <- Seq(1, 5, 50); q <- Seq(Seq(0.0, 0.0), Seq(95.0, -95.0))) {
      val naive = Search.knn(df, "vec", "id", array(q.map(lit): _*), k)
        .select("id").collect().map(_.getLong(0)).toSeq
      val pruned = GridIndex.knn(indexed, "vec", "id", spec, q, k)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(pruned == naive, s"k=$k q=$q")
    }
  }

  test("materialized index round-trips and prunes losslessly") {
    val df = randomDf(300, 2, 11)
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 6)
    val path = java.nio.file.Files
      .createTempDirectory("graft_idx").toString + "/index"
    GridIndex.buildIndex(df, "vec", spec, path, numFiles = 4)
    val index = GridIndex.readIndex(spark, path)
    val q = Seq(10.0, -20.0)
    val naive = Search.rangeSearch(df, "vec", array(q.map(lit): _*), 30.0)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val viaIndex = GridIndex.rangeSearch(index, "vec", spec, q, 30.0)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(viaIndex == naive)
    assert(naive.nonEmpty)
  }

  test("cell_id is stable under repartitioning (property §5.3e)") {
    val df = randomDf(200, 2, 13)
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 5)
    val a = GridIndex.withCellId(df, "vec", spec)
      .select("id", "cell_id").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = GridIndex.withCellId(df.repartition(7), "vec", spec)
      .select("id", "cell_id").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("batch cell-pruned kNN == naive batch kNN (payloads carried)") {
    import spark.implicits._
    val df = randomDf(400, 2, 21)
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 8)
    val indexed = GridIndex.withCellId(df, "vec", spec)
    val rnd = new scala.util.Random(99)
    val queries = (0L until 6L).map(q =>
      (q, Seq(rnd.nextDouble() * 240 - 120, rnd.nextDouble() * 240 - 120)))
    val got = GridIndex.knnBatch(indexed, "vec", "id", spec, queries, k = 4)
      .select("qid", "id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val qDf = queries.toDF("qid", "qv")
    val naive = Search.knnBatch(df, "vec", "id", qDf, "qv", "qid", k = 4)
      .select("qid", "id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive)
    assert(got.size == 6 * 4)
  }

  test("cell-count seeding starts sparse queries at a k-feasible radius " +
    "(r7 ask #8)") {
    import spark.implicits._
    // Skew: 500 points in one dense corner cell, 5 in the far corner.
    // A far-corner query with k=10 must reach the dense blob; unseeded
    // ring expansion pays one Spark job per doubling from one cell width
    // (~11) to the blob (~250) — the sidecar histogram proves those
    // rounds empty in driver arithmetic instead.
    val dense = (0 until 500).map(i =>
      (i.toLong, Seq(-90.0 + (i % 10) * 0.5, -90.0 + (i / 10) * 0.2)))
    val sparse = (500 until 505).map(i =>
      (i.toLong, Seq(88.0 + (i - 500) * 0.5, 88.0)))
    val df = (dense ++ sparse).toDF("id", "vec")
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 16)
    val indexed = GridIndex.withCellId(df, "vec", spec)
    val counts = indexed.groupBy("cell_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sparse-region query: the seed must clear >= 3 doublings (>= 3
    // expansion rounds = 3+ Spark jobs skipped)
    val sparseSeed = GridIndex.seedRadius(spec, counts, Seq(90.0, 90.0), 10)
    assert(sparseSeed >= spec.width.max * 8,
      s"seed $sparseSeed vs cell width ${spec.width.max}")
    // dense-region query: seeding must NOT over-scan — one cell suffices
    assert(GridIndex.seedRadius(spec, counts, Seq(-90.0, -89.0), 10) ==
      spec.width.max)
    // seeding is a cost knob only: results identical to naive either way
    val queries = Seq((0L, Seq(90.0, 90.0)), (1L, Seq(-90.0, -89.5)))
    def keyed(got: org.apache.spark.sql.DataFrame) = got
      .select("qid", "id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val seeded = keyed(GridIndex.knnBatch(indexed, "vec", "id", spec,
      queries, k = 10, cellCounts = Some(counts)))
    val naive = keyed(Search.knnBatch(df, "vec", "id",
      queries.toDF("qid", "qv"), "qv", "qid", k = 10))
    assert(seeded == naive && naive.size == 20)
    // and the histogram survives the save()/load() round trip
    val path = java.nio.file.Files
      .createTempDirectory("graft_cc").toString + "/index"
    VectorIndex.create(df, "vec", "id", dim = 2, cellsPerDim = 16)
      .save(path)
    val loaded = VectorIndex.load(spark, path)
    assert(IndexMeta.read(spark, path).get.cellCountsMap.exists(_.nonEmpty))
    assert(keyed(loaded.knnBatch(queries, k = 10)) == naive)
  }

  test("out-of-grid query points still return exact results") {
    val df = randomDf(200, 2, 17)
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 5)
    val indexed = GridIndex.withCellId(df, "vec", spec)
    val q = Seq(500.0, 500.0) // far outside the fitted grid
    val naive = Search.knn(df, "vec", "id", array(q.map(lit): _*), 3)
      .select("id").collect().map(_.getLong(0)).toSeq
    val pruned = GridIndex.knn(indexed, "vec", "id", spec, q, 3)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(pruned == naive)
  }

  test("cellId expression == driver-side linearize on every point (lockstep)") {
    // THE losslessness invariant: the query side enumerates candidate
    // cells with GridSpec.linearize, the data side computes cell_id with
    // the Catalyst expression — any divergence silently drops rows.
    for (dim <- Seq(1, 2, 3, 4); seed <- Seq(11, 12)) {
      val df = randomDf(300, dim, seed)
      val spec = GridIndex.fit(df, "vec", dim, cellsPerDim = 7)
      val rows = GridIndex.withCellId(df, "vec", spec)
        .select(col("vec"), col("cell_id")).collect()
      rows.foreach { r =>
        val v = r.getSeq[Double](0)
        val coords = (0 until dim).map { i =>
          math.floor((v(i) - spec.origin(i)) / spec.width(i)).toLong
        }
        assert(r.getLong(1) == spec.linearize(coords),
          s"dim=$dim vec=$v: expression and linearize diverge")
      }
    }
  }

  test("mutualLevel: R12 analog — same cell = max, distance decreases it") {
    import spark.implicits._
    val df = Seq((0L, Seq(0.0, 0.0))).toDF("id", "vec") // fit a fixed grid
      .union(Seq((1L, Seq(100.0, 100.0))).toDF("id", "vec"))
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 8)
    def lvl(p: Seq[Double], q: Seq[Double]): Int =
      spark.range(1).select(GridIndex.mutualLevel(
        array(p.map(lit): _*), array(q.map(lit): _*), spec).as("l"))
        .head().getInt(0)
    // identical points: finest co-location
    assert(lvl(Seq(3.0, 3.0), Seq(3.0, 3.0)) == spec.bitsPerDim)
    // same cell: also finest level
    assert(lvl(Seq(1.0, 1.0), Seq(2.0, 2.0)) == spec.bitsPerDim)
    // opposite corners: no shared prefix
    assert(lvl(Seq(0.0, 0.0), Seq(100.0, 100.0)) == 0)
    // monotone-ish: nearby pair co-locates at least as deep as a far pair
    assert(lvl(Seq(10.0, 10.0), Seq(12.0, 12.0)) >=
      lvl(Seq(10.0, 10.0), Seq(60.0, 60.0)))
  }

  test("batch kNN: FAR-out-of-domain query still returns exactly k rows") {
    // regression: a query farther than maxR from every point used to hit
    // the forced-done branch with the dist <= r^2 filter still applied,
    // silently returning fewer than k rows
    import spark.implicits._
    val df = randomDf(150, 2, 31) // coords within [-100, 100]
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 6)
    val indexed = GridIndex.withCellId(df, "vec", spec)
    val queries = Seq((0L, Seq(5000.0, 5000.0)), (1L, Seq(0.0, 0.0)))
    val got = GridIndex.knnBatch(indexed, "vec", "id", spec, queries, k = 4)
      .select("qid", "id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val naive = Search.knnBatch(df, "vec", "id",
        queries.toDF("qid", "qv"), "qv", "qid", k = 4)
      .select("qid", "id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive)
    assert(got.count(_._1 == 0L) == 4, "far query must still fill k")
  }

  /** 80% of points clustered in a tiny disk, 20% uniform — the skewed
    * density regime the fixed grid is weak in (VERDICT r7 missing #1). */
  private def skewedDf(n: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val v = if (i % 5 != 0)
        Seq(10 + rnd.nextDouble() * 4, -20 + rnd.nextDouble() * 4)
      else Seq(rnd.nextDouble() * 200 - 100, rnd.nextDouble() * 200 - 100)
      (i.toLong, v)
    }.toDF("id", "vec")
  }

  test("adaptive grid: hot cells refine; range == naive on skewed data " +
    "(random balls incl. boundary-straddling and out-of-grid)") {
    val df = skewedDf(600, 11)
    val spec = GridIndex.fitAdaptive(df, "vec", 2, cellsPerDim = 6,
      rowCap = 30, refine = 4)
    assert(spec.hot.nonEmpty, "skewed fixture must trigger refinement")
    val indexed = GridIndex.withCellIdAdaptive(df, "vec", spec)
    val rnd = new scala.util.Random(42)
    val balls = Seq((Seq(12.0, -18.0), 3.0), (Seq(12.0, -18.0), 60.0),
      (Seq(150.0, 150.0), 80.0)) ++
      (1 to 4).map(_ => (Seq(rnd.nextDouble() * 240 - 120,
        rnd.nextDouble() * 240 - 120), rnd.nextDouble() * 70))
    balls.foreach { case (q, r) =>
      val naive = Search.rangeSearch(df, "vec", array(q.map(lit): _*), r)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      val pruned = GridIndex.rangeSearchAdaptive(indexed, "vec", spec, q, r)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(pruned == naive, s"q=$q r=$r")
    }
  }

  test("adaptive grid: kNN == naive on skewed data; hot-region ball " +
    "scans fewer rows than the fixed grid") {
    val df = skewedDf(600, 13)
    val fixedSpec = GridIndex.fit(df, "vec", 2, cellsPerDim = 6)
    val fixedIdx = GridIndex.withCellId(df, "vec", fixedSpec)
    val spec = GridIndex.fitAdaptive(df, "vec", 2, cellsPerDim = 6,
      rowCap = 30, refine = 4)
    val indexed = GridIndex.withCellIdAdaptive(df, "vec", spec)
    for (q <- Seq(Seq(12.0, -18.0), Seq(-90.0, 90.0)); k <- Seq(3, 10)) {
      val naive = Search.knn(df, "vec", "id", array(q.map(lit): _*), k)
        .select("id", "dist").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val adaptive = GridIndex.knnAdaptive(indexed, "vec", "id", spec, q, k)
        .select("id", "dist").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(adaptive == naive, s"q=$q k=$k")
    }
    // the cost claim: a small ball inside the hot region touches fewer
    // index rows through the refined cells than through the fixed grid
    val q = Seq(12.0, -18.0); val r = 1.0
    def scanned(idx: org.apache.spark.sql.DataFrame,
                cells: Seq[Long]): Long =
      idx.filter(col("cell_id").isin(cells: _*)).count()
    val fixedRows = scanned(fixedIdx,
      GridIndex.cellsForBall(fixedSpec, q, r))
    val adaptiveRows = scanned(indexed,
      GridIndex.cellsForBallAdaptive(spec, q, r))
    assert(adaptiveRows < fixedRows,
      s"adaptive $adaptiveRows !< fixed $fixedRows")
  }

  test("adaptive grid with no over-cap cell degenerates to the base " +
    "grid (cold ids everywhere, same pruning)") {
    val df = randomDf(300, 2, 17)
    val spec = GridIndex.fitAdaptive(df, "vec", 2, cellsPerDim = 6,
      rowCap = 1000, refine = 4)
    assert(spec.hot.isEmpty)
    val indexed = GridIndex.withCellIdAdaptive(df, "vec", spec)
    // ids coincide with the fixed grid's
    val base = GridIndex.withCellId(df, "vec", spec.base)
      .select("id", "cell_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    indexed.select("id", "cell_id").collect()
      .foreach(r => assert(r.getLong(1) == base(r.getLong(0))))
    val q = Seq(0.0, 0.0)
    assert(GridIndex.cellsForBallAdaptive(spec, q, 30.0).sorted ==
      GridIndex.cellsForBall(spec.base, q, 30.0).sorted)
  }

  private def withGroup(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("grp", (col("id") % 5).cast("int"))

  test("filtered kNN == filtered brute force across selectivities " +
       "(grid and adaptive, several queries)") {
    val df = withGroup(randomDf(500, 2, 23))
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 8)
    val indexed = GridIndex.withCellId(df, "vec", spec)
    val aspec = GridIndex.fitAdaptive(df, "vec", 2, cellsPerDim = 6,
      rowCap = 20, refine = 3)
    val aindexed = GridIndex.withCellIdAdaptive(df, "vec", aspec)
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 4; g <- Seq(0, 3)) {
      val q = Seq.fill(2)(rnd.nextDouble() * 260 - 130) // incl. off-grid
      val pred = col("grp") === g
      val brute = Search.knn(df.filter(pred), "vec", "id",
          array(q.map(lit): _*), 7)
        .select("id", "dist").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val grid = GridIndex.knnFiltered(indexed, "vec", "id", spec, q,
          k = 7, pred = pred)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(grid == brute, s"grid filtered kNN != brute at q=$q g=$g")
      val ad = GridIndex.knnFilteredAdaptive(aindexed, "vec", "id",
          aspec, q, k = 7, pred = pred)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(ad == brute, s"adaptive filtered kNN != brute at q=$q g=$g")
    }
  }

  test("filtered kNN with a sub-k population returns every match " +
       "(exact by exhaustion, never silently short)") {
    val df = withGroup(randomDf(400, 2, 31))
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 8)
    val indexed = GridIndex.withCellId(df, "vec", spec)
    // only ids 0..4 satisfy this predicate: population 5 < k = 12
    val pred = col("id") < 5
    val got = GridIndex.knnFiltered(indexed, "vec", "id", spec,
        Seq(10.0, -40.0), k = 12, pred = pred)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == (0L until 5L).toSet)
  }

  test("filtered kNN at rest: the predicate reaches the parquet reader " +
       "as a PushedFilter below the cell_id pruning") {
    val df = withGroup(randomDf(500, 2, 41))
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 8)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_grid_filt").toString + "/idx"
    GridIndex.withCellId(df, "vec", spec)
      .sortWithinPartitions("cell_id").write.parquet(dir)
    val atRest = spark.read.parquet(dir)
    val plan = GridIndex.knnFiltered(atRest, "vec", "id", spec,
      Seq(0.0, 0.0), k = 7, pred = col("grp") === 2)
    val brute = Search.knn(df.filter(col("grp") === 2), "vec", "id",
        array(lit(0.0), lit(0.0)), 7)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(plan.select("id").collect().map(_.getLong(0)).toSeq == brute)
    val physical = plan.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.contains("EqualTo(grp,2)"), physical)
    assert(physical.contains("In(cell_id"), physical)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir).getParentFile)
  }

  test("batch filtered kNN == per-query filtered kNN == brute force " +
       "(grid and adaptive; in-domain, FAR out-of-domain, and sub-k " +
       "anchors in one batch)") {
    val df = withGroup(randomDf(500, 2, 53))
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 8)
    val indexed = GridIndex.withCellId(df, "vec", spec)
    val aspec = GridIndex.fitAdaptive(df, "vec", 2, cellsPerDim = 6,
      rowCap = 20, refine = 3)
    val aindexed = GridIndex.withCellIdAdaptive(df, "vec", aspec)
    // data lives in [-100, 100]^2; anchor 2 sits ~13 domain-widths out
    // (the escalate-to-infinity case the r16 fix closed — a maxR-capped
    // final ring silently under-fills k there); anchor 3's predicate
    // population (ids 0..4) is sub-k
    val anchors = Seq(
      0L -> Seq(10.0, -40.0), 1L -> Seq(95.0, 95.0),
      2L -> Seq(2600.0, -1800.0), 3L -> Seq(0.0, 0.0))
    val predOf: Long => org.apache.spark.sql.Column =
      qid => if (qid == 3L) col("id") < 5 else col("grp") === 2
    // per-anchor predicates differ for the sub-k case, so run two
    // batches: anchors 0-2 under grp=2, anchor 3 under the sub-k pred
    def rows(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
      d.select("qid", "id", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
        .sortBy(x => (x._1, x._3, x._2))
    for ((batchOf, name) <- Seq(
      ((qs: Seq[(Long, Seq[Double])], p: org.apache.spark.sql.Column) =>
        GridIndex.knnFilteredBatch(indexed, "vec", "id", spec, qs,
          k = 7, pred = p), "grid"),
      ((qs: Seq[(Long, Seq[Double])], p: org.apache.spark.sql.Column) =>
        GridIndex.knnFilteredBatchAdaptive(aindexed, "vec", "id", aspec,
          qs, k = 7, pred = p), "adaptive"))) {
      val got = rows(batchOf(anchors.take(3), col("grp") === 2)) ++
        rows(batchOf(anchors.drop(3), col("id") < 5))
      val want = anchors.flatMap { case (qid, q) =>
        Search.knn(df.filter(predOf(qid)), "vec", "id",
            array(q.map(lit): _*), 7)
          .select("id", "dist").collect()
          .map(r => (qid, r.getLong(0), r.getDouble(1))).toSeq
      }.sortBy(x => (x._1, x._3, x._2))
      assert(got == want, s"$name batch filtered kNN != brute")
      // sub-k anchor returned every match, never silently short
      assert(got.count(_._1 == 3L) == 5, name)
    }
    // the single-query face shares the infinity-escalation fix: a FAR
    // out-of-domain anchor still fills k exactly
    val farSingle = GridIndex.knnFiltered(indexed, "vec", "id", spec,
        Seq(2600.0, -1800.0), k = 7, pred = col("grp") === 2)
      .select("id").collect().map(_.getLong(0)).toSeq
    val farBrute = Search.knn(df.filter(col("grp") === 2), "vec", "id",
        array(lit(2600.0), lit(-1800.0)), 7)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(farSingle == farBrute)
  }

  test("batch filtered kNN at rest: predicate AND the round's cell " +
       "union reach the parquet reader as PushedFilters (the flat " +
       "layout gets no partition pruning from the broadcast join)") {
    val df = withGroup(randomDf(500, 2, 59))
    val spec = GridIndex.fit(df, "vec", 2, cellsPerDim = 8)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_grid_bfilt").toString + "/idx"
    GridIndex.withCellId(df, "vec", spec)
      .sortWithinPartitions("cell_id").write.parquet(dir)
    val atRest = spark.read.parquet(dir)
    val plan = GridIndex.knnFilteredBatch(atRest, "vec", "id", spec,
      Seq(0L -> Seq(0.0, 0.0), 1L -> Seq(50.0, -50.0)), k = 7,
      pred = col("grp") === 2)
    val brute = Search.knn(df.filter(col("grp") === 2), "vec", "id",
        array(lit(0.0), lit(0.0)), 7)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(plan.filter(col("qid") === 0).orderBy("rn")
      .select("id").collect().map(_.getLong(0)).toSeq == brute)
    val physical = plan.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.contains("EqualTo(grp,2)"), physical)
    assert(physical.contains("In(cell_id"), physical)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir).getParentFile)
  }
}

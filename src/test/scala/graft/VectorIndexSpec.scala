package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Search

/** The reference-API facade must preserve the 2A semantics contract on
  * both execution strategies (grid low-dim, scan/IVF high-dim). */
class VectorIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def randomDf(n: Int, dim: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 100 - 50), s"payload_$i"))
      .toDF("id", "vec", "name")
  }

  test("low-dim: knn/range equal naive, payloads carried through") {
    val df = randomDf(300, 2, 3)
    val idx = VectorIndex.create(df, "vec", "id", dim = 2)
    val q = Seq(10.0, -5.0)
    val got = idx.knn(q, 7).select("id", "name").collect()
    val naive = Search.knn(df, "vec", "id", array(q.map(lit): _*), 7)
      .select("id", "name").collect()
    assert(got.map(_.getLong(0)).toSeq == naive.map(_.getLong(0)).toSeq)
    assert(got.forall(r => r.getString(1) == s"payload_${r.getLong(0)}"))
    val gotR = idx.rangeSearch(q, 25.0).select("id").collect()
      .map(_.getLong(0)).sorted
    val naiveR = Search.rangeSearch(df, "vec", array(q.map(lit): _*), 25.0)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(gotR.toSeq == naiveR.toSeq)
  }

  test("high-dim: exact scan path + ANN path") {
    val df = randomDf(200, 16, 5)
    val idx = VectorIndex.create(df, "vec", "id", dim = 16, nlist = 8)
    val q = Seq.fill(16)(0.0)
    val exact = idx.knn(q, 5).select("id").collect().map(_.getLong(0)).toSeq
    val naive = Search.knn(df, "vec", "id", array(q.map(lit): _*), 5)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(exact == naive)
    val ann = idx.annSearch(q, 5, nProbe = 8)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ann == naive) // nProbe = nlist ⇒ exhaustive ⇒ exact

    import spark.implicits._
    val q2 = Seq.fill(16)(0.5)
    val annCos = idx.annSearchCosine(q2, 5, nProbe = 8)
      .select("id").collect().map(_.getLong(0)).toSeq
    val naiveCos = Search.cosineTopK(df, "vec", "id",
        Seq((0L, q2)).toDF("qid", "qv"), "qv", "qid", k = 5)
      .orderBy(col("rn")).select("id").collect().map(_.getLong(0)).toSeq
    assert(annCos == naiveCos) // exhaustive probe ⇒ exact cosine ranking
  }

  test("append makes new points searchable (insert analog)") {
    import spark.implicits._
    val df = randomDf(50, 2, 9)
    val idx = VectorIndex.create(df, "vec", "id", dim = 2)
    val extra = Seq((999L, Seq(0.0, 0.0), "new_point")).toDF("id", "vec", "name")
    val idx2 = idx.append(extra)
    assert(idx2.size() == 51)
    val hit = idx2.knn(Seq(0.0, 0.0), 1).select("id").head().getLong(0)
    assert(hit == 999L)
  }

  test("dim invariant rejected at create (schema-level check)") {
    import spark.implicits._
    val ragged = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      VectorIndex.create(ragged, "vec", "id", dim = 2)
    }
    assert(e.getMessage.contains("dim"))
  }

  test("save/load round-trip preserves search results") {
    val df = randomDf(120, 2, 11)
    val idx = VectorIndex.create(df, "vec", "id", dim = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_vi").toString + "/idx"
    idx.save(path)
    val re = VectorIndex.load(spark, path)
    val q = Seq(1.0, 2.0)
    assert(re.knn(q, 5).select("id").collect().map(_.getLong(0)).toSeq ==
      idx.knn(q, 5).select("id").collect().map(_.getLong(0)).toSeq)
  }

  test("load restores the SAVED grid geometry, not a re-fit (hazard test)") {
    // Build at a non-default resolution: a load() that re-fit at the old
    // default (16 cells/dim) would enumerate query cells in a different
    // geometry than the stored cell_id column and silently drop rows.
    val df = randomDf(200, 2, 13)
    val idx = VectorIndex.create(df, "vec", "id", dim = 2, cellsPerDim = 8)
    val path = java.nio.file.Files
      .createTempDirectory("graft_vi_geo").toString + "/idx"
    idx.save(path)
    val re = VectorIndex.load(spark, path)
    val q = Seq(7.0, -3.0)
    val naive = Search.rangeSearch(df, "vec", array(q.map(lit): _*), 20.0)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val pruned = re.rangeSearch(q, 20.0)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(pruned == naive, "pruned search after reload must be lossless")
    val naiveK = Search.knn(df, "vec", "id", array(q.map(lit): _*), 9)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(re.knn(q, 9).select("id").collect().map(_.getLong(0)).toSeq
      == naiveK)
  }

  /** Skewed corpus: `nHot` rows packed into a unit square (one base
    * cell at 8 cells/dim over the ±50 domain goes over any small cap)
    * plus `nCold` spread over the whole domain. */
  private def skewedDf(nHot: Int, nCold: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val hot = (0 until nHot).map(i =>
      (i.toLong, Seq(10.0 + rnd.nextDouble(), 10.0 + rnd.nextDouble()),
        s"payload_$i"))
    val cold = (0 until nCold).map(i =>
      ((nHot + i).toLong, Seq.fill(2)(rnd.nextDouble() * 100 - 50),
        s"payload_${nHot + i}"))
    (hot ++ cold).toDF("id", "vec", "name")
  }

  test("adaptive create(rowCap): two-level grid, knn/range equal naive") {
    val df = skewedDf(300, 100, 17)
    val idx = VectorIndex.create(df, "vec", "id", dim = 2, cellsPerDim = 8,
      rowCap = 50)
    // the hot cluster must actually trigger refinement (negative fine ids)
    assert(idx.data.filter(col("cell_id") < 0).count() > 0,
      "skewed fixture must produce refined (negative) cell ids")
    val q = Seq(10.5, 10.5) // center of the HOT region
    val naiveK = Search.knn(df, "vec", "id", array(q.map(lit): _*), 12)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(idx.knn(q, 12).select("id").collect().map(_.getLong(0)).toSeq
      == naiveK)
    val naiveR = Search.rangeSearch(df, "vec", array(q.map(lit): _*), 3.0)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(idx.rangeSearch(q, 3.0).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == naiveR)
  }

  test("adaptive save/load round-trip: hot-cell rows survive reload " +
      "(regression: load() must restore AdaptiveMeta, not the base grid)") {
    val df = skewedDf(300, 100, 19)
    val idx = VectorIndex.create(df, "vec", "id", dim = 2, cellsPerDim = 8,
      rowCap = 50)
    val path = java.nio.file.Files
      .createTempDirectory("graft_vi_adpt").toString + "/idx"
    idx.save(path)
    // the at-rest layout holds MIXED-LEVEL ids: base-grid enumeration
    // (positive ids only) over it would drop every refined row
    val stored = spark.read.parquet(path)
    assert(stored.filter(col("cell_id") < 0).count() > 0,
      "saved adaptive layout must carry negative fine ids")
    val meta = IndexMeta.read(spark, path).get
    assert(meta.adaptiveSpec.isDefined,
      "sidecar must carry the adaptive extension")
    val re = VectorIndex.load(spark, path)
    // probe INSIDE the hot cell: under the base-grid-only load bug every
    // one of these rows is silently dropped from pruned search
    val q = Seq(10.5, 10.5)
    val naiveR = Search.rangeSearch(df, "vec", array(q.map(lit): _*), 0.6)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(naiveR.nonEmpty, "fixture sanity: the hot probe must hit rows")
    assert(re.rangeSearch(q, 0.6).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == naiveR,
      "hot-cell rows must survive save/load (lossless pruning)")
    val naiveK = Search.knn(df, "vec", "id", array(q.map(lit): _*), 15)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(re.knn(q, 15).select("id").collect().map(_.getLong(0)).toSeq
      == naiveK)
    // batch path falls back to the broadcast window form on adaptive
    val batch = re.knnBatch(Seq((7L, q)), 5)
    assert(batch.select("id").collect().map(_.getLong(0)).toSeq ==
      naiveK.take(5))
  }

  test("adaptive append after load buckets new rows in the STORED " +
      "two-level spec") {
    val df = skewedDf(300, 80, 23)
    val idx = VectorIndex.create(df, "vec", "id", dim = 2, cellsPerDim = 8,
      rowCap = 50)
    val path = java.nio.file.Files
      .createTempDirectory("graft_vi_adpt_app").toString + "/idx"
    idx.save(path)
    import spark.implicits._
    // one new row inside the hot cell, one in a cold region
    val extra = Seq((9001L, Seq(10.4, 10.6), "new_hot"),
      (9002L, Seq(-40.0, -40.0), "new_cold")).toDF("id", "vec", "name")
    val re = VectorIndex.load(spark, path).append(extra)
    // hot-region append must land on a NEGATIVE fine id (stored spec)
    assert(re.data.filter(col("id") === 9001L)
      .head().getAs[Long]("cell_id") < 0)
    val q = Seq(10.4, 10.6)
    val ids = re.rangeSearch(q, 0.3).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(ids.contains(9001L), "appended hot-cell row must be searchable")
  }

  test("IndexMeta sidecar round-trips exact doubles (no precision drift)") {
    // Geometry equality must be bit-exact: a spec differing in the last
    // ulp enumerates different cells than the stored ids were computed in.
    val spec = operators.GridIndex.GridSpec(
      Seq(-49.123456789012345, 1e-12),
      Seq(0.1234567890123456, 6.25), Seq(8, 8))
    val cents = Seq((0, Seq(0.30000000000000004, -0.2)),
      (1, Seq(1.7976931348623157e308, 4.9e-324)))
    val meta = IndexMeta.of("vec", "id", 2, Some(spec), Some(cents))
    val path = java.nio.file.Files
      .createTempDirectory("graft_meta").toString
    IndexMeta.write(spark, path, meta)
    val back = IndexMeta.read(spark, path).get
    assert(back.gridSpec.contains(spec))
    assert(back.ivfCentroids.contains(cents))
    assert(back.vecCol == "vec" && back.idCol == "id" && back.dim == 2)
  }

  test("append after load buckets new rows in the saved geometry") {
    import spark.implicits._
    val df = randomDf(100, 2, 21)
    val idx = VectorIndex.create(df, "vec", "id", dim = 2, cellsPerDim = 8)
    val path = java.nio.file.Files
      .createTempDirectory("graft_vi_app").toString + "/idx"
    idx.save(path)
    val extra = Seq((5000L, Seq(3.0, 4.0), "late_point"))
      .toDF("id", "vec", "name")
    val re = VectorIndex.load(spark, path).append(extra)
    assert(re.size() == 101)
    // the appended point is findable through the PRUNED search path, and
    // pruned == naive over the combined collection
    val q = Seq(3.0, 4.0)
    assert(re.knn(q, 1).select("id").head().getLong(0) == 5000L)
    val combined = df.unionByName(extra)
    val naive = Search.rangeSearch(combined, "vec", array(q.map(lit): _*), 15.0)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val pruned = re.rangeSearch(q, 15.0)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(pruned == naive)
  }

  test("high-dim save writes the partitionBy(list_id) layout and loaded " +
       "annSearch prunes partitions") {
    // The realistic embedding regime: a saved 64-dim index must answer
    // annSearch by reading ONLY the probed lists' directories — never a
    // full scan (VERDICT r4 'What's missing #1').
    val df = randomDf(300, 64, 23)
    val idx = VectorIndex.create(df, "vec", "id", dim = 64, nlist = 8)
    val path = java.nio.file.Files
      .createTempDirectory("graft_vi_part").toString + "/idx"
    idx.save(path)
    assert(new java.io.File(path).list().exists(_.startsWith("list_id=")),
      "high-dim save must write the partitioned IVF layout")
    val re = VectorIndex.load(spark, path)
    val q = Seq.fill(64)(5.0)
    val probed = re.annSearch(q, 5, nProbe = 2)
    val physical = probed.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
      physical.contains("list_id"),
      s"loaded high-dim annSearch must prune partitions:\n$physical")
    // same rows as the in-memory (pre-save) probe of the same lists
    val before = idx.annSearch(q, 5, nProbe = 2)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(probed.select("id").collect().map(_.getLong(0)).toSeq == before)
  }

  test("SQ codes ride in the saved IVF layout; annSearchSq after load " +
       "re-ranks exactly and covers exhaustive search") {
    val df = randomDf(250, 32, 29)
    val idx = VectorIndex.create(df, "vec", "id", dim = 32, nlist = 8)
    val path = java.nio.file.Files
      .createTempDirectory("graft_vi_sq").toString + "/idx"
    idx.save(path)
    // codes are physically in the saved lists + params in the sidecar
    assert(spark.read.parquet(path).columns
      .contains(graft.operators.IvfIndex.SqCol))
    assert(IndexMeta.read(spark, path).get.sqParams.isDefined)
    val re = VectorIndex.load(spark, path)
    val q = Seq.fill(32)(3.0)
    // covering settings (nProbe = nlist, shortlist >= n) = exact kNN
    val sq = re.annSearchSq(q, 5, nProbe = 8, shortlist = 250)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(sq == Search.knn(df, "vec", "id", array(q.map(lit): _*), 5)
      .select("id").collect().map(_.getLong(0)).toSeq)
    // tight shortlist still returns k rows, re-ranked by exact distance
    val tight = re.annSearchSq(q, 5, nProbe = 4)
    assert(tight.count() == 5)
    val dists = tight.select("dist").collect().map(_.getDouble(0)).toSeq
    assert(dists == dists.sorted)
    // append after load encodes new rows with the STORED params (codes
    // must stay comparable with the existing ones)
    import spark.implicits._
    val extra = Seq((9000L, Seq.fill(32)(3.0), "new"))
      .toDF("id", "vec", "name")
    val appended = re.append(extra)
    val hit = appended.annSearchSq(q, 1, nProbe = 8, shortlist = 251)
      .select("id").head().getLong(0)
    assert(hit == 9000L, "appended exact-match row must rank first")
  }

  test("PQ codes ride in the saved IVF layout; annSearchPq after load " +
       "prunes lists, re-ranks exactly, covers exhaustive search") {
    val df = randomDf(250, 32, 31)
    val idx = VectorIndex.create(df, "vec", "id", dim = 32, nlist = 8)
    val path = java.nio.file.Files
      .createTempDirectory("graft_vi_pq").toString + "/idx"
    idx.save(path)
    // 32 % 8 == 0 ⇒ save fits PQ automatically; codes in the layout,
    // codebooks in the sidecar
    assert(spark.read.parquet(path).columns
      .contains(graft.operators.IvfIndex.PqCol))
    val meta = IndexMeta.read(spark, path).get
    assert(meta.pqParams.isDefined)
    assert(meta.pqParams.get.m == 8 && meta.pqParams.get.subDim == 4)
    val re = VectorIndex.load(spark, path)
    val q = Seq.fill(32)(3.0)
    // covering settings (nProbe = nlist, shortlist >= n) = exact kNN
    val pq = re.annSearchPq(q, 5, nProbe = 8, shortlist = 250)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(pq == Search.knn(df, "vec", "id", array(q.map(lit): _*), 5)
      .select("id").collect().map(_.getLong(0)).toSeq)
    // tight shortlist still returns k exactly-ranked rows
    val tight = re.annSearchPq(q, 5, nProbe = 4)
    assert(tight.count() == 5)
    val dists = tight.select("dist").collect().map(_.getDouble(0)).toSeq
    assert(dists == dists.sorted)
    // append after load encodes new rows with the STORED codebooks
    import spark.implicits._
    val extra = Seq((9000L, Seq.fill(32)(3.0), "new"))
      .toDF("id", "vec", "name")
    val appended = re.append(extra)
    val hit = appended.annSearchPq(q, 1, nProbe = 8, shortlist = 251)
      .select("id").head().getLong(0)
    assert(hit == 9000L, "appended exact-match row must rank first")
  }

  test("PQ residuals + list radii ride in the saved layout/sidecar; " +
       "annSearchPqExact after load is exact; append stays sound") {
    val df = randomDf(250, 32, 33)
    val idx = VectorIndex.create(df, "vec", "id", dim = 32, nlist = 8)
    val path = java.nio.file.Files
      .createTempDirectory("graft_vi_pqx").toString + "/idx"
    idx.save(path)
    // the exact-serving artifacts are at rest: residual column in the
    // layout, per-list radii in the sidecar
    assert(spark.read.parquet(path).columns
      .contains(graft.operators.IvfIndex.PqResCol))
    val meta = IndexMeta.read(spark, path).get
    assert(meta.listRadiiMap.isDefined && meta.listRadiiMap.get.nonEmpty)
    val re = VectorIndex.load(spark, path)
    val q = Seq.fill(32)(2.5)
    def brute(d: org.apache.spark.sql.DataFrame, k: Int) =
      Search.knn(d, "vec", "id", array(q.map(lit): _*), k)
        .select(col("id"), col("dist"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // tight seed, pruned lists — still provably exact (values AND ids)
    val got = re.annSearchPqExact(q, 5, seed = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == brute(df, 5))
    // append: new rows get residuals, stale radii are NOT reused — the
    // appended exact-match row must surface (an unsound stale bound
    // could prune its list away)
    import spark.implicits._
    val extra = Seq((9000L, Seq.fill(32)(2.5), "new"))
      .toDF("id", "vec", "name")
    val appended = re.append(extra)
    val hit = appended.annSearchPqExact(q, 1, seed = 8)
      .select("id").head().getLong(0)
    assert(hit == 9000L, "appended exact-match row must rank first")
  }

  test("annSearchFiltered over the SAVED layout: exact vs filtered brute " +
       "force, predicate pushed to the parquet scan BELOW the list " +
       "pruning, sidecar radii reused (no radii job)") {
    val df = randomDf(250, 32, 47)
      .withColumn("grp", (col("id") % 5).cast("int"))
    val idx = VectorIndex.create(df, "vec", "id", dim = 32, nlist = 8)
    val path = java.nio.file.Files
      .createTempDirectory("graft_vi_filt").toString + "/idx"
    idx.save(path)
    val re = VectorIndex.load(spark, path)
    val q = Seq.fill(32)(2.5)
    val brute = Search.knn(df.filter(col("grp") === 2), "vec", "id",
        array(q.map(lit): _*), 5)
      .select("id").collect().map(_.getLong(0)).toSeq
    val plan = re.annSearchFiltered(q, 5, pred = col("grp") === 2,
      nProbe0 = 2)
    assert(plan.select("id").collect().map(_.getLong(0)).toSeq == brute)
    // I/O story at rest: list pruning is PARTITION-level (list_id is
    // the partition column) and the predicate reaches the reader as a
    // pushed filter below it — the scan touches only probed lists'
    // row groups that can contain grp = 2
    val physical = plan.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
      physical.contains("list_id"), physical)
    assert(physical.contains("PushedFilters") &&
      physical.contains("EqualTo(grp,2)"), physical)
  }

  test("fsckSaved: fresh build all-green; duplicate-id append flips " +
       "ids_unique; orphan tombstones counted; missing sidecar " +
       "short-circuits; append raises the file-geometry ledger") {
    import spark.implicits._
    val df = randomDf(200, 16, 53)
    val path = java.nio.file.Files
      .createTempDirectory("graft_fsck").toString + "/idx"
    VectorIndex.create(df, "vec", "id", dim = 16, nlist = 8,
      topUpNlist = true).save(path)
    def report(): Map[String, (Boolean, Long)] =
      VectorIndex.fsckSaved(spark, path).collect()
        .map(r => r.getString(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    val fresh = report()
    assert(fresh.values.forall(_._1), fresh)
    assert(fresh("ids_unique") == (true, 200L))
    assert(fresh("meta_parses") == (true, 8L))
    assert(fresh("write_eras") == (true, 1L))
    assert(fresh("orphan_tombstones") == (true, 0L))
    // delete an id that exists, and one that never did: the orphan is
    // counted (legal residue — deletes are idempotent), ok stays true
    VectorIndex.deleteSaved(spark, path, Seq(7L, 99999L).toDF("id"))
    assert(report()("orphan_tombstones") == (true, 1L))
    // re-append rows that are already in the layout: the physical audit
    // must flag the duplicate ids (ids-never-reused is the contract
    // every delete/compact verb leans on) and the file ledger must show
    // the second write era
    VectorIndex.appendSaved(spark, path, df.filter(col("id") < 20))
    val dup = report()
    assert(!dup("ids_unique")._1 && dup("ids_unique")._2 == 200L)
    assert(dup("write_eras")._1 &&
      dup("write_eras")._2 >= 2L)
    assert(dup("radii_sound")._1) // appends grow radii soundly
    // no sidecar: a single failing meta_parses row, nothing else probed
    val bare = java.nio.file.Files
      .createTempDirectory("graft_fsck_bare").toString
    df.limit(5).write.parquet(s"$bare/idx")
    val noMeta = VectorIndex.fsckSaved(spark, s"$bare/idx").collect()
    assert(noMeta.length == 1 && noMeta.head.getString(0) == "meta_parses"
      && !noMeta.head.getBoolean(1))
  }

  test("appendSaved: at-rest ingest into the IVF+PQ layout — appended " +
       "rows fully encoded, radii stay sound, exact path exact on union") {
    val df = randomDf(250, 32, 41)
    val even = df.filter(col("id") % 2 === 0)
    val odd = df.filter(col("id") % 2 =!= 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft_vi_apps").toString + "/idx"
    VectorIndex.create(even, "vec", "id", dim = 32, nlist = 8).save(path)
    val radiiBefore = IndexMeta.read(spark, path).get.listRadiiMap.get
    VectorIndex.appendSaved(spark, path, odd)
    // every appended row landed fully encoded — no null codes/residuals
    // that would silently vanish from the exact path's filters
    val onDisk = spark.read.parquet(path)
    assert(onDisk.count() == 250)
    assert(onDisk.filter(col(graft.operators.IvfIndex.SqCol).isNull ||
      col(graft.operators.IvfIndex.PqCol).isNull ||
      col(graft.operators.IvfIndex.PqResCol).isNull).isEmpty)
    // sidecar radii: grown where needed (never shrunk), and the invariant
    // the ring-pruning certificate rests on — radius(l) >= every member's
    // centroid distance — holds over the UNION
    val meta = IndexMeta.read(spark, path).get
    val radiiAfter = meta.listRadiiMap.get
    radiiBefore.foreach { case (l, r) =>
      assert(radiiAfter.getOrElse(l, 0.0) >= r, s"list $l radius shrank") }
    val trueRadii = graft.operators.IvfIndex.listRadii(
      onDisk, "vec", meta.ivfCentroids.get)
    trueRadii.foreach { case (l, r) =>
      assert(radiiAfter.getOrElse(l, 0.0) >= r - 1e-9,
        s"list $l sidecar radius $r unsound") }
    // the provably-exact serving path is exact over the union — the
    // query hits appended (odd-id) neighborhoods too
    val re = VectorIndex.load(spark, path)
    val q = Seq.fill(32)(2.5)
    val got = re.annSearchPqExact(q, 5, seed = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Search.knn(df, "vec", "id", array(q.map(lit): _*), 5)
      .select(col("id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == brute)
    assert(got.exists(_._1 % 2 == 1), "union result should include " +
      "appended rows for this fixture") // guards the fixture, not the op
  }

  test("appendSaved refuses ragged dims") {
    val hi = randomDf(80, 16, 9)
    val path = java.nio.file.Files
      .createTempDirectory("graft_vi_appd").toString + "/idx"
    VectorIndex.create(hi, "vec", "id", dim = 16, nlist = 4).save(path)
    val ed = intercept[IllegalArgumentException] {
      VectorIndex.appendSaved(spark, path, randomDf(5, 8, 11))
    }
    assert(ed.getMessage.contains("dim"))
  }

  test("appendSaved on GRID layouts: frozen stored geometry, sorted new " +
      "files, pruned search exact over the union — incl. out-of-box rows") {
    val df = randomDf(300, 2, 21)
    val even = df.filter(col("id") % 2 === 0)
    val odd = df.filter(col("id") % 2 =!= 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft_vi_appg").toString + "/idx"
    VectorIndex.create(even, "vec", "id", dim = 2).save(path)
    val specBefore = IndexMeta.read(spark, path).get.grid.get
    val countsBefore = IndexMeta.read(spark, path).get.cellCountsMap.get
    VectorIndex.appendSaved(spark, path, odd)
    val metaAfter = IndexMeta.read(spark, path).get
    // geometry FROZEN: spec identical (a re-fit from the union would
    // re-key every stored cell_id)
    assert(metaAfter.grid.get == specBefore)
    // cellCounts merged exactly: totals equal the union's rows
    assert(metaAfter.cellCountsMap.get.values.sum == 300)
    assert(countsBefore.values.sum == even.count())
    // range + kNN over the loaded union equal brute force
    val re = VectorIndex.load(spark, path)
    val q = Seq(10.0, -5.0)
    def sorted(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy(t => (t._2, t._1)).toSeq
    val knnGot = sorted(re.knn(q, 7)
      .select(col("id"), col("dist")).collect())
    val knnWant = sorted(Search.knn(df, "vec", "id",
        array(q.map(lit): _*), 7)
      .select(col("id"), col("dist")).collect())
    assert(knnGot == knnWant)
    assert(knnGot.exists(_._1 % 2 == 1),
      "union result should include appended rows for this fixture")
    // OUT-OF-BOX appended rows clamp into boundary cells on BOTH the
    // write and enumeration sides, so they stay findable: plant a
    // point far outside the fitted extent and range-search around it
    import spark.implicits._
    val far = Seq((9001L, Seq(500.0, 500.0), "payload_far"))
      .toDF("id", "vec", "name")
    VectorIndex.appendSaved(spark, path, far)
    val hit = VectorIndex.load(spark, path)
      .rangeSearch(Seq(500.0, 500.0), 1.0)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(hit == Set(9001L),
      s"out-of-box appended row must remain findable: $hit")
  }

  test("appendSaved on ADAPTIVE layouts: stored hot set frozen, probes " +
      "exact over the union") {
    val df = randomDf(400, 2, 33)
    val even = df.filter(col("id") % 2 === 0)
    val odd = df.filter(col("id") % 2 =!= 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft_vi_appa").toString + "/idx"
    VectorIndex.create(even, "vec", "id", dim = 2, cellsPerDim = 8,
      rowCap = 10, refine = 4).save(path)
    val hotBefore = IndexMeta.read(spark, path).get.adaptive.get.hot
    VectorIndex.appendSaved(spark, path, odd)
    assert(IndexMeta.read(spark, path).get.adaptive.get.hot == hotBefore,
      "append must not re-fit the hot set")
    val re = VectorIndex.load(spark, path)
    val q = Seq(10.0, -5.0)
    def sorted(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy(t => (t._2, t._1)).toSeq
    val got = sorted(re.knn(q, 9)
      .select(col("id"), col("dist")).collect())
    val want = sorted(Search.knn(df, "vec", "id",
        array(q.map(lit): _*), 9)
      .select(col("id"), col("dist")).collect())
    assert(got == want)
    val rng = re.rangeSearch(Seq(10.0, -5.0), 10.0)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val rngWant = df.withColumn("d",
        graft.functions.VectorFunctions.sqDist(col("vec"),
          array(lit(10.0), lit(-5.0))))
      .filter(col("d") <= 100.0).select(col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(rng == rngWant && rngWant.nonEmpty)
  }

  test("deleteSaved: tombstoned rows vanish from every search path; " +
       "idempotent; appended rows deletable too") {
    val df = randomDf(200, 32, 51)
    val path = java.nio.file.Files
      .createTempDirectory("graft_vi_del").toString + "/idx"
    VectorIndex.create(df.filter(col("id") < 150), "vec", "id",
      dim = 32, nlist = 8).save(path)
    VectorIndex.appendSaved(spark, path, df.filter(col("id") >= 150))
    import spark.implicits._
    VectorIndex.deleteSaved(spark, path,
      (0 until 200).filter(_ % 3 == 0).map(_.toLong).toDF("id"))
    // repeat-delete + absent ids: harmless
    VectorIndex.deleteSaved(spark, path, Seq(0L, 3L, 9999L).toDF("x"))
    val re = VectorIndex.load(spark, path)
    val survivors = df.filter(col("id") % 3 =!= 0)
    assert(re.size() == survivors.count())
    val q = Seq.fill(32)(1.5)
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("id").collect().map(_.getLong(0)).toSeq
    val brute = Search.knn(survivors, "vec", "id",
      array(q.map(lit): _*), 7)
    assert(ids(re.knn(q, 7)) == ids(brute))
    assert(ids(re.annSearchPqExact(q, 7, seed = 10)) == ids(brute))
    assert(ids(re.annSearch(q, 7, nProbe = 8)) == ids(brute)) // covering
    assert(!ids(re.knn(q, 200)).exists(_ % 3 == 0))
  }

  test("compactSaved: tombstones applied physically, one file per list, " +
       "radii tighten to exact survivor maxima, serving unchanged") {
    val df = randomDf(200, 32, 61)
    val path = java.nio.file.Files
      .createTempDirectory("graft_vi_cpt").toString + "/idx"
    VectorIndex.create(df.filter(col("id") < 150), "vec", "id",
      dim = 32, nlist = 8).save(path)
    VectorIndex.appendSaved(spark, path, df.filter(col("id") >= 150))
    VectorIndex.deleteSaved(spark, path,
      df.filter(col("id") % 3 === 0).select("id"))
    val q = Seq.fill(32)(1.5)
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("id").collect().map(_.getLong(0)).toSeq
    val before = ids(VectorIndex.load(spark, path)
      .annSearchPqExact(q, 7, seed = 10))
    val radiiBefore = IndexMeta.read(spark, path).get.listRadiiMap.get
    VectorIndex.compactSaved(spark, path)
    // layout physically clean: no tombstone dir, no .compacting residue,
    // one merged file per list directory, no tombstoned row on disk
    val root = new java.io.File(path)
    assert(!root.listFiles().exists(
      _.getName == VectorIndex.TombstoneDir))
    assert(!new java.io.File(path + ".compacting").exists())
    val lists = root.listFiles().filter(_.getName.startsWith("list_id="))
    assert(lists.nonEmpty)
    lists.foreach { l =>
      assert(l.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"list ${l.getName} not merged to one file")
    }
    val onDisk = spark.read.parquet(path)
    assert(onDisk.count() == df.filter(col("id") % 3 =!= 0).count())
    // radii snapped back to the exact survivor maxima: none grew, and
    // they equal a fresh recompute over the compacted files
    val meta = IndexMeta.read(spark, path).get
    val radiiAfter = meta.listRadiiMap.get
    radiiAfter.foreach { case (l, r) =>
      assert(r <= radiiBefore.getOrElse(l, Double.MaxValue) + 1e-12,
        s"list $l radius grew under compaction") }
    val trueRadii = graft.operators.IvfIndex.listRadii(
      onDisk, "vec", meta.ivfCentroids.get)
    trueRadii.foreach { case (l, r) =>
      assert(math.abs(radiiAfter.getOrElse(l, -1.0) - r) <= 1e-12,
        s"list $l radius not exact after compaction") }
    // serving bit-identical across the rewrite
    assert(ids(VectorIndex.load(spark, path)
      .annSearchPqExact(q, 7, seed = 10)) == before)
  }

  test("ANN works after save/load (centroids persisted in the sidecar)") {
    val df = randomDf(200, 16, 17)
    val idx = VectorIndex.create(df, "vec", "id", dim = 16, nlist = 8)
    val path = java.nio.file.Files
      .createTempDirectory("graft_vi_ann").toString + "/idx"
    idx.save(path)
    val re = VectorIndex.load(spark, path)
    val q = Seq.fill(16)(1.0)
    val before = idx.annSearch(q, 5, nProbe = 8)
      .select("id").collect().map(_.getLong(0)).toSeq
    val after = re.annSearch(q, 5, nProbe = 8)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(after == before)
    assert(after == Search.knn(df, "vec", "id", array(q.map(lit): _*), 5)
      .select("id").collect().map(_.getLong(0)).toSeq) // exhaustive = exact
  }

  test("fsckSaved grid checks: healthy build+append all-green (grid and " +
       "adaptive); a mis-celled row flips cell_ids_consistent and " +
       "cell_counts_consistent") {
    import spark.implicits._
    val df = randomDf(300, 2, 77)
    def report(path: String): Map[String, (Boolean, Long)] =
      VectorIndex.fsckSaved(spark, path).collect()
        .map(r => r.getString(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    for (adaptive <- Seq(false, true)) {
      val path = java.nio.file.Files
        .createTempDirectory("graft_fsck_grid").toString + "/idx"
      val even = df.filter(col("id") % 2 === 0)
      (if (adaptive)
        VectorIndex.create(even, "vec", "id", dim = 2, cellsPerDim = 6,
          rowCap = 20)
      else
        VectorIndex.create(even, "vec", "id", dim = 2, cellsPerDim = 6))
        .save(path)
      VectorIndex.appendSaved(spark, path, df.filter(col("id") % 2 =!= 0))
      val healthy = report(path)
      assert(healthy.values.forall(_._1), s"adaptive=$adaptive: $healthy")
      assert(healthy.contains("cell_ids_consistent") &&
        healthy.contains("cell_counts_consistent"))
      // plant one row whose stored cell id disagrees with the sidecar
      // spec (the mis-bucketed-append corruption)
      val schema = spark.read.parquet(path).select("id", "vec", "cell_id")
      Seq((9999L, Seq(0.0, 0.0), 123456789L)).toDF("id", "vec", "cell_id")
        .select(col("id"), col("vec"), col("cell_id").cast(
          schema.schema("cell_id").dataType))
        .write.mode("append").parquet(path)
      val bad = report(path)
      assert(!bad("cell_ids_consistent")._1, s"adaptive=$adaptive")
      assert(!bad("cell_counts_consistent")._1, s"adaptive=$adaptive")
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(path).getParentFile)
    }
  }

  test("facade knnFiltered/knnFilteredBatch: every layout answers the " +
       "filtered brute force (grid, adaptive, IVF, unindexed)") {
    import org.apache.spark.sql.DataFrame
    val q = Seq(10.0, -20.0)
    val anchors = Seq(0L -> q, 1L -> Seq(40.0, 40.0))
    def ids(d: DataFrame) = d.select("id").collect().map(_.getLong(0)).toSet
    def batchIds(d: DataFrame, qid: Long) =
      d.filter(col("qid") === qid).select("id")
        .collect().map(_.getLong(0)).toSet
    for (dim <- Seq(2, 8)) {
      val df = randomDf(300, dim, 83)
        .withColumn("grp", (col("id") % 4).cast("int"))
      val pred = col("grp") === 1
      val qd = q ++ Seq.fill(dim - 2)(0.0)
      val anchorsD = anchors.map { case (i, a) =>
        i -> (a ++ Seq.fill(dim - 2)(0.0)) }
      val brute = Search.knn(df.filter(pred), "vec", "id",
        array(qd.map(lit): _*), 6)
      val indexes: Seq[(String, VectorIndex)] =
        if (dim == 2) Seq(
          "grid" -> VectorIndex.create(df, "vec", "id", dim = 2,
            cellsPerDim = 6),
          "adaptive" -> VectorIndex.create(df, "vec", "id", dim = 2,
            cellsPerDim = 6, rowCap = 30))
        else Seq(
          "ivf" -> VectorIndex.create(df, "vec", "id", dim = 8,
            nlist = 8),
          "unindexed" -> VectorIndex.create(df, "vec", "id", dim = 8))
      for ((name, idx) <- indexes) {
        assert(ids(idx.knnFiltered(qd, 6, pred)) == ids(brute),
          s"$name single")
        val batch = idx.knnFilteredBatch(anchorsD, 6, pred)
        anchorsD.foreach { case (qid, a) =>
          val want = ids(Search.knn(df.filter(pred), "vec", "id",
            array(a.map(lit): _*), 6))
          assert(batchIds(batch, qid) == want, s"$name batch qid=$qid")
        }
      }
    }
  }

  test("grid compact rewrite width derives from survivors: build-default " +
       "floor at small scale, ceil(rows/MaxFileRows) beyond it") {
    import graft.operators.WriteGeometry
    // small layouts keep the build's default 8-file geometry
    assert(WriteGeometry.rewriteWidth(0L) == 8)
    assert(WriteGeometry.rewriteWidth(1000L) == 8)
    // exactly at the floor boundary: 8 x 4M rows still 8 files...
    assert(WriteGeometry.rewriteWidth(8L * WriteGeometry.MaxFileRows) == 8)
    // ...one row more fans out to 9; 100M rows to 25 — a 100 TB family
    // compaction writes proportionally, not through a fixed 8-task wave
    assert(WriteGeometry.rewriteWidth(
      8L * WriteGeometry.MaxFileRows + 1) == 9)
    assert(WriteGeometry.rewriteWidth(100000000L) == 25)
    // and the derived width is what buildSaved(numFiles) would need to
    // reproduce the same rows-per-file geometry
    assert(WriteGeometry.rewriteWidth(25L * WriteGeometry.MaxFileRows)
      == 25)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions.sqDist
import graft.operators.{GridIndex, Search}
import graft.plans.IndexAwareRules

/** The optimizer rule must turn a plain ball predicate over a registered
  * index into a cell-pruned scan — same rows, pruned plan — with no
  * user-side API change. */
class IndexAwareRulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val (indexPath, spec) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_idx").toString
    val p = Tables.load(spark, SparkTestSession.sf0001, "part")
      .withColumn("vec", array(col("p_retailprice").cast("double"),
        col("p_size").cast("double")))
    val s = GridIndex.fit(p, "vec", dim = 2, cellsPerDim = 8)
    GridIndex.buildIndex(p, "vec", s, s"$tmp/part_idx")
    (s"$tmp/part_idx", s)
  }
  private val q = Seq(910.0, 25.0)
  private val r = 20.0

  test("ball filter over a registered index gains a pushed cell_id IN filter") {
    IndexAwareRules.registerIndex(indexPath, spec)
    IndexAwareRules.install(spark)
    val idx = GridIndex.readIndex(spark, indexPath)
    val query = idx.filter(
      sqDist(col("vec"), array(q.map(lit): _*)) <= lit(r * r))

    val optimized = query.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cell_id IN") ||
      optimized.contains("cell_id#"), s"no cell conjunct:\n$optimized")
    val physical = query.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.contains("In(cell_id"),
      s"cell filter not pushed to parquet:\n$physical")

    // lossless: identical rows to the unpruned scan
    val raw = Tables.load(spark, SparkTestSession.sf0001, "part")
      .withColumn("vec", array(col("p_retailprice").cast("double"),
        col("p_size").cast("double")))
    val expect = Search.rangeSearch(raw, "vec", array(q.map(lit): _*), r)
      .select(col("p_partkey"))
    assert(query.select(col("p_partkey")).except(expect).isEmpty &&
      expect.except(query.select(col("p_partkey"))).isEmpty)
  }

  test("plain SQL over the saved index auto-prunes (full SQL-user path)") {
    GraftExtensions.register(spark)
    IndexAwareRules.registerIndex(indexPath, spec)
    IndexAwareRules.install(spark)
    val sqlDf = spark.sql(
      s"""SELECT p_partkey FROM parquet.`$indexPath`
         |WHERE graft_sqdist(vec, array(910.0D, 25.0D)) <= 400.0D
         |ORDER BY p_partkey""".stripMargin)
    assert(sqlDf.queryExecution.executedPlan.toString.contains("In(cell_id"),
      "SQL text should hit the same pruned plan")
    val raw = Tables.load(spark, SparkTestSession.sf0001, "part")
      .withColumn("vec", array(col("p_retailprice").cast("double"),
        col("p_size").cast("double")))
    val expect = Search.rangeSearch(raw, "vec", array(q.map(lit): _*), r)
      .select(col("p_partkey")).orderBy(col("p_partkey"))
    assert(sqlDf.collect().map(_.getLong(0)).toSeq ==
      expect.collect().map(_.getLong(0)).toSeq)
  }

  test("pure SQL kNN (ORDER BY graft_sqdist LIMIT k) gets a pruned scan") {
    GraftExtensions.register(spark)
    IndexAwareRules.registerIndex(indexPath, spec)
    IndexAwareRules.install(spark)
    val sqlDf = spark.sql(
      s"""SELECT p_partkey FROM parquet.`$indexPath`
         |ORDER BY graft_sqdist(vec, array(910.0D, 25.0D)) LIMIT 7""".stripMargin)
    val physical = sqlDf.queryExecution.executedPlan.toString
    assert(physical.contains("In(cell_id"),
      s"SQL kNN should scan only candidate cells:\n$physical")
    assert(physical.contains("TakeOrderedAndProject"),
      s"sort+limit should stay a top-k operator:\n$physical")
    // exact: identical ids, in order, to the naive full-scan kNN
    val raw = Tables.load(spark, SparkTestSession.sf0001, "part")
      .withColumn("vec", array(col("p_retailprice").cast("double"),
        col("p_size").cast("double")))
    val expect = Search.knn(raw, "vec", "p_partkey",
        array(q.map(lit): _*), 7)
      .select("p_partkey").collect().map(_.getLong(0)).toSeq
    assert(sqlDf.collect().map(_.getLong(0)).toSeq == expect)
  }

  test("DataFrame orderBy(sqdist).limit(k) hits the same kNN rewrite") {
    IndexAwareRules.registerIndex(indexPath, spec)
    IndexAwareRules.install(spark)
    val idx = GridIndex.readIndex(spark, indexPath)
    val knnDf = idx.orderBy(sqDist(col("vec"), array(q.map(lit): _*)))
      .limit(5).select("p_partkey")
    assert(knnDf.queryExecution.executedPlan.toString.contains("In(cell_id"))
    val raw = Tables.load(spark, SparkTestSession.sf0001, "part")
      .withColumn("vec", array(col("p_retailprice").cast("double"),
        col("p_size").cast("double")))
    val expect = Search.knn(raw, "vec", "p_partkey", array(q.map(lit): _*), 5)
      .select("p_partkey").collect().map(_.getLong(0)).toSeq
    assert(knnDf.collect().map(_.getLong(0)).toSeq == expect)
  }

  test("pure SQL COSINE top-k over a saved normalized index gets cell pruning") {
    // The cosine→L2 reduction (unit vectors: ||v−q̂||² = 2(1−cos)) must be
    // driven end-to-end by metadata: save() detects unit norms and the
    // sidecar re-registers them at load(), so a plain SQL user writing
    // ORDER BY graft_cosine(...) DESC LIMIT k over the saved path gets a
    // pruned scan with NO API call — and exactly Search.cosineTopK's rows
    // (the sort stays by cosine; only a superset ball filter is added).
    GraftExtensions.register(spark)
    IndexAwareRules.install(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_cos").toString
    val raw = Tables.load(spark, SparkTestSession.sf0001, "part")
      .withColumn("vec", graft.functions.VectorFunctions.normalize(
        array((col("p_retailprice") - lit(900.0)).cast("double"),
          (col("p_size") - lit(25.0)).cast("double"))))
      .filter(graft.functions.VectorFunctions.sqNorm(col("vec")) > 0)
    val idx = VectorIndex.create(raw, "vec", "p_partkey", dim = 2,
      cellsPerDim = 8)
    idx.save(s"$tmp/cos_idx")
    val reloaded = VectorIndex.load(spark, s"$tmp/cos_idx") // sidecar path
    assert(reloaded.data.columns.contains("cell_id"))
    val sqlDf = spark.sql(
      s"""SELECT p_partkey FROM parquet.`$tmp/cos_idx`
         |ORDER BY graft_cosine(vec, array(3.0D, 4.0D)) DESC
         |LIMIT 7""".stripMargin)
    val physical = sqlDf.queryExecution.executedPlan.toString
    assert(physical.contains("In(cell_id"),
      s"cosine SQL top-k should scan only candidate cells:\n$physical")
    val expect = Search.cosineTopK(raw, "vec", "p_partkey",
        spark.range(1).select(lit(0L).as("qid"),
          array(lit(3.0), lit(4.0)).as("qv")),
        "qv", "qid", k = 7)
      .orderBy(col("rn"))
      .select("p_partkey").collect().map(_.getLong(0)).toSeq
    assert(sqlDf.collect().map(_.getLong(0)).toSeq == expect)
  }

  test("cosine THRESHOLD filter over a normalized index gains cell pruning") {
    // The range-query twin of the cosine top-k rewrite: WHERE
    // graft_cosine(vec, lit) >= c over a unit-norm index is the ball
    // ||v - qhat||^2 <= 2(1-c) (+pad) — PruneBallSearch ANDs the cell
    // conjunct, exact predicate still runs.
    GraftExtensions.register(spark)
    IndexAwareRules.install(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_cosball").toString
    val raw = Tables.load(spark, SparkTestSession.sf0001, "part")
      .withColumn("vec", graft.functions.VectorFunctions.normalize(
        array((col("p_retailprice") - lit(900.0)).cast("double"),
          (col("p_size") - lit(25.0)).cast("double"))))
      .filter(graft.functions.VectorFunctions.sqNorm(col("vec")) > 0)
    VectorIndex.create(raw, "vec", "p_partkey", dim = 2, cellsPerDim = 8)
      .save(s"$tmp/idx")
    val sqlDf = spark.sql(
      s"""SELECT p_partkey FROM parquet.`$tmp/idx`
         |WHERE graft_cosine(vec, array(3.0D, 4.0D)) >= 0.95
         |ORDER BY p_partkey""".stripMargin)
    assert(sqlDf.queryExecution.executedPlan.toString.contains("In(cell_id"),
      "cosine threshold over a unit-norm index should cell-prune")
    // literal-on-left strict spelling must prune too (Catalyst does not
    // canonicalize comparison orientation)
    val flipped = spark.sql(
      s"""SELECT p_partkey FROM parquet.`$tmp/idx`
         |WHERE 0.95 < graft_cosine(vec, array(3.0D, 4.0D))""".stripMargin)
    assert(flipped.queryExecution.executedPlan.toString.contains("In(cell_id"),
      "lit < cosine orientation should cell-prune")
    val expect = raw
      .filter(graft.functions.VectorFunctions.cosine(col("vec"),
        array(lit(3.0), lit(4.0))) >= 0.95)
      .select(col("p_partkey")).orderBy(col("p_partkey"))
      .collect().map(_.getLong(0)).toSeq
    assert(sqlDf.collect().map(_.getLong(0)).toSeq == expect)
    assert(expect.nonEmpty)
  }

  test("cosine rewrite: randomized equivalence vs the unrewritten engine") {
    // Property-style sweep over random unit-vector datasets and queries:
    // the pruned SQL result must equal the same engine expression run
    // WITHOUT the rewrite (raw DataFrame, not a registered scan) — the
    // exact oracle for "the rule adds a filter, never changes ranking".
    // Similarity multisets are compared (no id tie-break in the SQL).
    import spark.implicits._
    GraftExtensions.register(spark)
    IndexAwareRules.install(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_cosprop").toString
    val rnd = new scala.util.Random(42)
    var pruned = 0
    for (trial <- 0 until 3) {
      val n = 80 + rnd.nextInt(120)
      val pts = Seq.tabulate(n) { i =>
        val a = rnd.nextDouble() * 2 * math.Pi
        (i.toLong, Seq(math.cos(a), math.sin(a)))
      }
      val df = pts.toDF("id", "vec")
        .withColumn("vec", col("vec").cast("array<double>"))
      val path = s"$tmp/idx_$trial"
      VectorIndex.create(df, "vec", "id", dim = 2, cellsPerDim = 8).save(path)
      for (_ <- 0 until 3) {
        val qa = rnd.nextDouble() * 2 * math.Pi
        val (qx, qy) = (3.0 * math.cos(qa), 3.0 * math.sin(qa)) // non-unit q
        val k = 1 + rnd.nextInt(7)
        val sqlDf = spark.sql(
          s"""SELECT id, graft_cosine(vec, array(${qx}D, ${qy}D)) AS sim
             |FROM parquet.`$path`
             |ORDER BY graft_cosine(vec, array(${qx}D, ${qy}D)) DESC
             |LIMIT $k""".stripMargin)
        if (sqlDf.queryExecution.executedPlan.toString.contains("In(cell_id"))
          pruned += 1
        val got = sqlDf.collect().map(_.getDouble(1)).sorted.toSeq
        val expect = df
          .select(graft.functions.VectorFunctions.cosine(col("vec"),
            array(lit(qx), lit(qy))).as("sim"))
          .orderBy(col("sim").desc).limit(k)
          .collect().map(_.getDouble(0)).sorted.toSeq
        assert(got == expect, s"trial=$trial k=$k q=($qx,$qy)")
      }
    }
    assert(pruned >= 5, s"rewrite fired only $pruned/9 times")
  }

  test("cosine kNN rewrite does NOT fire on a non-normalized index") {
    // Without the unit-norm fact the reduction is unsound (orders by
    // cosine and by L2 disagree when norms vary) — the plan must stay
    // unpruned and the result correct.
    GraftExtensions.register(spark)
    IndexAwareRules.registerIndex(indexPath, spec) // unitNorm = false
    IndexAwareRules.install(spark)
    val sqlDf = spark.sql(
      s"""SELECT p_partkey,
         |       round(graft_cosine(vec, array(910.0D, 25.0D)), 6) AS sim
         |FROM parquet.`$indexPath`
         |ORDER BY graft_cosine(vec, array(910.0D, 25.0D)) DESC
         |LIMIT 5""".stripMargin)
    assert(!sqlDf.queryExecution.executedPlan.toString.contains("In(cell_id"),
      "cosine pruning must require the unit-norm flag")
    val raw = Tables.load(spark, SparkTestSession.sf0001, "part")
      .withColumn("vec", array(col("p_retailprice").cast("double"),
        col("p_size").cast("double")))
    val expect = Search.cosineTopK(raw, "vec", "p_partkey",
        spark.range(1).select(lit(0L).as("qid"),
          array(lit(910.0), lit(25.0)).as("qv")),
        "qv", "qid", k = 5)
      .select("sim").collect().map(_.getDouble(0)).toSeq
    // the SQL has no id tie-break, so compare the similarity multiset
    assert(sqlDf.collect().map(_.getDouble(1)).sorted.toSeq == expect.sorted)
  }

  test("kNN rewrite bails when a user filter sits below the sort") {
    // The radius proof counts rows in the RAW index; a row-removing
    // operator between sort and scan invalidates it (the within-r
    // survivors after the user predicate can number < k, and the ball
    // conjunct would wrongly exclude true farther matches). The rewrite
    // must not fire — and the result must be the exact filtered kNN.
    IndexAwareRules.registerIndex(indexPath, spec)
    IndexAwareRules.install(spark)
    val idx = GridIndex.readIndex(spark, indexPath)
    val knnDf = idx.filter(col("p_size") > 25)
      .orderBy(sqDist(col("vec"), array(q.map(lit): _*)))
      .limit(10)
      .select(col("p_partkey"),
        round(sqDist(col("vec"), array(q.map(lit): _*)), 6).as("d"))
    assert(!knnDf.queryExecution.executedPlan.toString.contains("In(cell_id"),
      "must not prune below a row-removing predicate")
    val raw = Tables.load(spark, SparkTestSession.sf0001, "part")
      .withColumn("vec", array(col("p_retailprice").cast("double"),
        col("p_size").cast("double")))
    val expect = Search.knn(raw.filter(col("p_size") > 25), "vec",
        "p_partkey", array(q.map(lit): _*), 10)
      .select("dist").collect().map(_.getDouble(0)).toSeq
    // the query has no id tie-break, so compare the distance multiset
    // (equal-distance boundary rows may legally swap)
    assert(knnDf.collect().map(_.getDouble(1)).sorted.toSeq == expect.sorted)
  }

  test("self-join of an indexed scan is NOT rewritten (provenance guard)") {
    IndexAwareRules.registerIndex(indexPath, spec)
    IndexAwareRules.install(spark)
    val idx = GridIndex.readIndex(spark, indexPath)
    val l = idx.select(col("p_partkey").as("lk"), col("vec").as("lvec"),
      col("cell_id"))
    val r2 = idx.select(col("p_partkey").as("rk"), col("vec").as("rvec"))
    // ball predicate on the RIGHT side's vector, cell_id from the LEFT:
    // the old rule would AND a left-geometry cell filter against a
    // right-side ball and silently drop rows. Two registered relations
    // below the filter → the rule must bail.
    val joined = l.crossJoin(r2)
      .filter(sqDist(col("rvec"), array(q.map(lit): _*)) <= lit(r * r))
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("cell_id IN"),
      s"multi-relation plan must not gain a cell conjunct:\n$optimized")
    // and the result is what the unrewritten semantics say
    val nRight = idx.filter(
      sqDist(col("vec"), array(q.map(lit): _*)) <= lit(r * r)).count()
    assert(joined.count() == idx.count() * nRight)
  }

  // ---- IVF (high-dim, list-partitioned) geometry --------------------

  /** Tight, well-separated clusters in dim 16: the regime the IVF layout
    * exists for. 8 clusters of 60 points, centers ~650 apart, sigma 0.5,
    * so the radius proof converges in one round and probes ONE list. */
  private def clusteredHighDim(seed: Int, unitNorm: Boolean = false) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val dim = 16
    def norm(v: Seq[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Seq.tabulate(8) { _ =>
      val c = Seq.fill(dim)(rnd.nextDouble() * 400 - 200)
      if (unitNorm) norm(c) else c
    }
    val sigma = if (unitNorm) 0.01 else 0.5
    val pts = for { c <- 0 until 8; i <- 0 until 60 } yield {
      val raw = centers(c).map(_ + rnd.nextGaussian() * sigma)
      ((c * 60 + i).toLong, if (unitNorm) norm(raw) else raw)
    }
    val df = pts.toDF("id", "vec")
      .withColumn("vec", col("vec").cast("array<double>"))
    (df, centers)
  }

  test("pure SQL kNN over a saved high-dim IVF index prunes list " +
       "partitions (the saved-index scale story)") {
    GraftExtensions.register(spark)
    IndexAwareRules.install(spark)
    val (df, centers) = clusteredHighDim(31)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfsql").toString
    val path = s"$tmp/idx"
    VectorIndex.create(df, "vec", "id", dim = 16, nlist = 8,
      refineIters = 3).save(path)
    // the saved layout must be the partitioned one
    assert(new java.io.File(path).list().exists(_.startsWith("list_id=")),
      "high-dim save must write partitionBy(list_id)")
    val q = centers(2)
    val qSql = q.map(x => s"${x}D").mkString(", ")
    val sqlDf = spark.sql(
      s"""SELECT id FROM parquet.`$path`
         |ORDER BY graft_sqdist(vec, array($qSql)) LIMIT 5""".stripMargin)
    val physical = sqlDf.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
      physical.contains("list_id"),
      s"SQL kNN over an IVF index must prune partitions:\n$physical")
    assert(physical.contains("TakeOrderedAndProject"),
      s"sort+limit should stay a top-k operator:\n$physical")
    val expect = Search.knn(df, "vec", "id", array(q.map(lit): _*), 5)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(sqlDf.collect().map(_.getLong(0)).toSeq == expect,
      "pruned SQL kNN must equal the brute-force result")
  }

  test("SQL cosine top-k over a saved unit-norm IVF index prunes lists") {
    GraftExtensions.register(spark)
    IndexAwareRules.install(spark)
    val (df, centers) = clusteredHighDim(57, unitNorm = true)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfcos").toString
    val path = s"$tmp/idx"
    VectorIndex.create(df, "vec", "id", dim = 16, nlist = 8,
      refineIters = 3).save(path)
    // non-unit query: the rule must normalize it before the L2 reduction
    val q = centers(5).map(_ * 3.0)
    val qSql = q.map(x => s"${x}D").mkString(", ")
    val sqlDf = spark.sql(
      s"""SELECT id FROM parquet.`$path`
         |ORDER BY graft_cosine(vec, array($qSql)) DESC
         |LIMIT 5""".stripMargin)
    val physical = sqlDf.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
      physical.contains("list_id"),
      s"cosine SQL top-k over a unit-norm IVF index must prune:\n$physical")
    import spark.implicits._
    val expect = Search.cosineTopK(df, "vec", "id",
        Seq((0L, q)).toDF("qid", "qv"), "qv", "qid", k = 5)
      .orderBy(col("rn")).select("id").collect().map(_.getLong(0)).toSeq
    assert(sqlDf.collect().map(_.getLong(0)).toSeq == expect)
  }

  test("IVF ball filter (sqdist <= r²) gains a list_id conjunct, lossless") {
    GraftExtensions.register(spark)
    IndexAwareRules.install(spark)
    val (df, centers) = clusteredHighDim(73)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfball").toString
    val path = s"$tmp/idx"
    VectorIndex.create(df, "vec", "id", dim = 16, nlist = 8,
      refineIters = 3).save(path)
    val q = centers(1)
    val rr = 10.0 // covers the whole home cluster, no others
    val scan = spark.read.parquet(path)
    val query = scan.filter(
      sqDist(col("vec"), array(q.map(lit): _*)) <= lit(rr * rr))
    val physical = query.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
      physical.contains("list_id"),
      s"IVF ball search must prune partitions:\n$physical")
    val expect = Search.rangeSearch(df, "vec", array(q.map(lit): _*), rr)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(query.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == expect, "IVF-pruned ball search must be lossless")
    assert(expect.size == 60, "fixture: the ball should hold one cluster")
  }

  test("unregistered paths and non-ball filters are left untouched") {
    IndexAwareRules.install(spark)
    val idx = GridIndex.readIndex(spark, indexPath)
    IndexAwareRules.clear() // deregister: rule must no-op now
    try {
      val query = idx.filter(
        sqDist(col("vec"), array(q.map(lit): _*)) <= lit(r * r))
      val optimized = query.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("cell_id IN"))
      val plain = idx.filter(col("p_size") > 10)
      assert(!plain.queryExecution.optimizedPlan.toString.contains("cell_id IN"))
    } finally IndexAwareRules.registerIndex(indexPath, spec)
  }

  /** ADAPTIVE layout saved via the public lifecycle (create(rowCap) →
    * save → load): load() must register AdaptiveGeom, and the ball
    * rewrite must enumerate the MIXED-LEVEL candidate set — a hot-cell
    * probe under a (wrong) base-grid registration would silently drop
    * every refined row. This is the regression pin for the r9 load()
    * bug (VERDICT r9 "What's wrong #1"). */
  test("adaptive saved index: ball rewrite prunes with mixed-level ids, " +
      "lossless in the hot cell") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val hot = (0 until 300).map(i =>
      (i.toLong, Seq(10.0 + rnd.nextDouble(), 10.0 + rnd.nextDouble())))
    val cold = (0 until 100).map(i =>
      ((300 + i).toLong, Seq.fill(2)(rnd.nextDouble() * 100 - 50)))
    val df = (hot ++ cold).toDF("id", "vec")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_idx_adpt").toString + "/idx"
    VectorIndex.create(df, "vec", "id", dim = 2, cellsPerDim = 8,
      rowCap = 50).save(tmp)
    IndexAwareRules.install(spark)
    val re = VectorIndex.load(spark, tmp) // registers AdaptiveGeom
    val qh = Seq(10.5, 10.5) // inside the refined (hot) base cell
    val rr = 0.6
    val query = spark.read.parquet(tmp).filter(
      sqDist(col("vec"), array(qh.map(lit): _*)) <= lit(rr * rr))
    val optimized = query.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cell_id#"),
      s"adaptive ball filter must gain a cell conjunct:\n$optimized")
    // a single-candidate IN collapses to equality — accept either form
    assert(optimized.matches("(?s).*(IN \\([^)]*-\\d[^)]*\\)|= -\\d).*"),
      s"hot-cell candidate set must include NEGATIVE fine ids:\n$optimized")
    val physical = query.queryExecution.executedPlan.toString
    assert(physical.contains("In(cell_id") ||
        physical.contains("EqualTo(cell_id"),
      s"cell filter not pushed to parquet:\n$physical")
    val naive = Search.rangeSearch(df, "vec", array(qh.map(lit): _*), rr)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(naive.nonEmpty, "fixture sanity: hot probe must hit rows")
    assert(query.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == naive, "rewrite must be lossless over the mixed-level layout")
    // the kNN sort rewrite fires through the same geometry
    val knnQ = spark.read.parquet(tmp)
      .orderBy(sqDist(col("vec"), array(qh.map(lit): _*))).limit(10)
    val knnPhys = knnQ.queryExecution.executedPlan.toString
    assert(knnPhys.contains("In(cell_id") ||
        knnPhys.contains("EqualTo(cell_id"),
      "kNN sort over the adaptive index must get a pruned scan")
    val naiveK = Search.knn(df, "vec", "id", array(qh.map(lit): _*), 10)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(knnQ.select("id").collect().map(_.getLong(0)).toSeq == naiveK)
    assert(re.size() == 400)
  }

  /** FuseBallPredicate must not pre-empt PruneBallSearch: over a
    * registered index the final plan carries BOTH the injected key
    * conjunct AND the early-exit fused ball predicate, and stays
    * lossless. */
  test("early-exit fuse composes with index pruning (both in the plan)") {
    IndexAwareRules.registerIndex(indexPath, spec)
    IndexAwareRules.install(spark)
    val idx = GridIndex.readIndex(spark, indexPath)
    val query = idx.filter(
      sqDist(col("vec"), array(q.map(lit): _*)) <= lit(r * r))
    val optimized = query.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cell_id#"),
      s"pruning conjunct lost to the fuse rewrite:\n$optimized")
    assert(optimized.contains("graft_sqdist_within"),
      s"ball conjunct not fused:\n$optimized")
    val raw = Tables.load(spark, SparkTestSession.sf0001, "part")
      .withColumn("vec", array(col("p_retailprice").cast("double"),
        col("p_size").cast("double")))
    val expect = Search.rangeSearch(raw, "vec", array(q.map(lit): _*), r)
      .select(col("p_partkey")).collect().map(_.getLong(0)).sorted.toSeq
    assert(query.select(col("p_partkey")).collect().map(_.getLong(0))
      .sorted.toSeq == expect)
  }

  /** The hold-off must be a ONE-ROUND wait for PruneBallSearch, not a
    * blanket suppression: a ball whose vector operand is a computed
    * array (not an attribute of the registered relation) can never gain
    * a key conjunct, and before the round-11 fix pruningPending kept
    * the early-exit fusion off for it on every fixpoint round. */
  test("unprunable ball over a registered index still fuses immediately") {
    IndexAwareRules.registerIndex(indexPath, spec)
    IndexAwareRules.install(spark)
    val idx = GridIndex.readIndex(spark, indexPath)
    val computed = array(col("vec").getItem(0), col("vec").getItem(1))
    val query = idx.filter(
      sqDist(computed, array(q.map(lit): _*)) <= lit(r * r))
    val optimized = query.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_sqdist_within"),
      s"PruneBallSearch can never rewrite this filter — the fuse must " +
        s"not be held off:\n$optimized")
    // and it stays lossless: the computed array IS vec element-wise
    val raw = Tables.load(spark, SparkTestSession.sf0001, "part")
      .withColumn("vec", array(col("p_retailprice").cast("double"),
        col("p_size").cast("double")))
    val expect = Search.rangeSearch(raw, "vec", array(q.map(lit): _*), r)
      .select(col("p_partkey")).collect().map(_.getLong(0)).sorted.toSeq
    assert(query.select(col("p_partkey")).collect().map(_.getLong(0))
      .sorted.toSeq == expect)
  }
}

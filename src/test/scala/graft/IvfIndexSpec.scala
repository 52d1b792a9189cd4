package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, Search}

class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val e = Tables.load(spark, SparkTestSession.sf0001, "embeddings")

  private def queryVec(vecId: Long): Seq[Double] =
    e.filter(col("vec_id") === vecId).select(col("embedding")).head()
      .getSeq[Float](0).map(_.toDouble)

  test("nProbe = nlist degenerates to exact search (recall 1.0)") {
    val cents = IvfIndex.fitCentroids(e, "embedding", "vec_id", nlist = 8)
    val index = IvfIndex.assign(e, "embedding", "vec_id", cents)
    val q = queryVec(0)
    val exact = Search.knn(e, "embedding", "vec_id",
        array(q.map(lit): _*), 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val ivf = IvfIndex.search(index, "embedding", "vec_id", cents, q,
        k = 10, nProbe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ivf == exact)
  }

  test("recall@10 over 5 queries is usable at nProbe=4/16") {
    val cents = IvfIndex.fitCentroids(e, "embedding", "vec_id", nlist = 16)
    val index = IvfIndex.assign(e, "embedding", "vec_id", cents).cache()
    val recalls = (0L until 5L).map { qid =>
      val q = queryVec(qid)
      val exact = Search.knn(e, "embedding", "vec_id",
          array(q.map(lit): _*), 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val ivf = IvfIndex.search(index, "embedding", "vec_id", cents, q,
          k = 10, nProbe = 4)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (exact intersect ivf).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@10 = $mean (per-query: $recalls)")
    index.unpersist()
  }

  test("searchFilteredExact: equals filtered brute force for every label " +
       "(selectivity sweep), escalates from a tiny seed, and the " +
       "certificate stops short of brute force when bounds allow") {
    val cents = IvfIndex.fitCentroids(e, "embedding", "vec_id", nlist = 16)
    val index = IvfIndex.assign(e, "embedding", "vec_id", cents).cache()
    val radii = Some(IvfIndex.listRadii(index, "embedding", cents))
    val q = queryVec(7)
    (0 to 9).foreach { lbl =>
      val exact = Search.knn(e.filter(col("label") === lbl), "embedding",
          "vec_id", array(q.map(lit): _*), 10)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val (got, evs) = Obs.withCapture {
        IvfIndex.searchFilteredExact(index, "embedding", "vec_id", cents,
            q, k = 10, pred = col("label") === lbl, nProbe0 = 2,
            radii = radii)
          .select("vec_id").collect().map(_.getLong(0)).toSeq
      }
      assert(got == exact, s"label $lbl")
      val ev = evs.filter(_._1 == "filtered-knn")
      assert(ev.size == 1)
      val kv = ev.head._2.toMap
      assert(kv("matched") == 10, s"label $lbl matched ${kv("matched")}")
      // started at 2 lists; a selective predicate forces escalation
      assert(kv("probed").asInstanceOf[Int] >= 2)
    }
    index.unpersist()
  }

  test("searchFilteredExact: sub-k match population returns ALL matches " +
       "(doubling path exhausts the lists and stays exact)") {
    val cents = IvfIndex.fitCentroids(e, "embedding", "vec_id", nlist = 16)
    val index = IvfIndex.assign(e, "embedding", "vec_id", cents)
    val q = queryVec(7)
    // pred matching exactly 3 rows < k=10: the certificate can never
    // fire on a full top-k, so the doubling path must cover every list
    // and return precisely the filtered population, exactly ranked
    val pred = col("vec_id").isin(3L, 141L, 77L)
    val exact = Search.knn(e.filter(pred), "embedding", "vec_id",
        array(q.map(lit): _*), 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val (got, evs) = Obs.withCapture {
      IvfIndex.searchFilteredExact(index, "embedding", "vec_id", cents,
          q, k = 10, pred = pred, nProbe0 = 2)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
    }
    assert(got == exact && got.size == 3)
    val kv = evs.filter(_._1 == "filtered-knn").head._2.toMap
    // full coverage: every fitted list probed (fitCentroids may return
    // fewer than the requested nlist when the sample has collisions)
    assert(kv("probed") == kv("nlist") && kv("matched") == 3)
  }

  test("searchFilteredExact: permissive predicate on the clustered regime " +
       "certifies WITHOUT probing every list") {
    // clustered data is where the ring certificate has teeth: pull every
    // vector 4:1 toward its nearest of 8 anchors (the BenchServe
    // clustered-corpus construction) so list radii shrink well below
    // inter-centroid distances
    val anchors = IvfIndex.fitCentroids(e, "embedding", "vec_id", nlist = 8)
    val clustered = IvfIndex.assign(e, "embedding", "vec_id", anchors)
      .withColumn("embedding",
        zip_with(col("embedding").cast("array<double>"),
          element_at(
            typedLit(anchors.sortBy(_._1).map(_._2)),
            col("list_id") + 1),
          (x, c) => x * lit(0.2) + c * lit(0.8)))
      .drop("list_id")
    val cents = IvfIndex.fitCentroids(clustered, "embedding", "vec_id",
      nlist = 16)
    val index = IvfIndex.assign(clustered, "embedding", "vec_id", cents)
      .cache()
    val q = clustered.filter(col("vec_id") === 7)
      .select(col("embedding")).head().getSeq[Double](0)
    val exact = Search.knn(clustered.filter(col("label") >= 5),
        "embedding", "vec_id", array(q.map(lit): _*), 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val (got, evs) = Obs.withCapture {
      IvfIndex.searchFilteredExact(index, "embedding", "vec_id", cents,
          q, k = 10, pred = col("label") >= 5, nProbe0 = 2)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
    }
    assert(got == exact)
    val kv = evs.filter(_._1 == "filtered-knn").head._2.toMap
    val probed = kv("probed").asInstanceOf[Int]
    assert(probed < 16,
      s"clustered + permissive pred should certify early, probed $probed/16")
    index.unpersist()
  }

  test("searchFilteredExactBatch: per-query rows identical to the " +
       "single-query path; queries certify independently (one escalates " +
       "further than another); one event for the whole batch") {
    val cents = IvfIndex.fitCentroids(e, "embedding", "vec_id", nlist = 16)
    val index = IvfIndex.assign(e, "embedding", "vec_id", cents).cache()
    val radii = Some(IvfIndex.listRadii(index, "embedding", cents))
    val qids = Seq(0L, 1L, 2L, 3L)
    val qs = qids.map(q => q -> queryVec(q))
    val pred = col("label") >= 5
    val (batch, evs) = Obs.withCapture {
      IvfIndex.searchFilteredExactBatch(index, "embedding", "vec_id",
          cents, qs, k = 8, pred = pred, nProbe0 = 2, radii = radii)
        .orderBy(col("qid"), col("rn"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val single = qs.flatMap { case (qid, qv) =>
      IvfIndex.searchFilteredExact(index, "embedding", "vec_id", cents,
          qv, k = 8, pred = pred, nProbe0 = 2, radii = radii)
        .collect().map(r => (qid, r.getLong(0)))
    }
    assert(batch == single)
    val ev = evs.filter(_._1 == "filtered-knn-batch")
    assert(ev.size == 1)
    val kv = ev.head._2.toMap
    assert(kv("queries") == 4)
    index.unpersist()
  }

  test("fitCentroids topUp: the quantizer always has exactly the " +
       "requested nlist entries, and the default draw is its prefix " +
       "(opt-in only — frozen oracles keep the old sampling)") {
    import spark.implicits._
    val df = (0L until 1000L)
      .map(i => (i, Seq(i.toDouble, (i * 7 % 13).toDouble)))
      .toDF("id", "v")
    Seq(4, 8, 16, 32, 64).foreach { nl =>
      val plain = IvfIndex.fitCentroids(df, "v", "id", nl)
      val topped = IvfIndex.fitCentroids(df, "v", "id", nl, topUp = true)
      assert(topped.size == nl, s"nlist $nl: got ${topped.size}")
      assert(plain.size <= nl)
      // the stride draw survives verbatim at the front: topUp only
      // appends, so an under-filled draw's geometry is preserved
      assert(topped.take(plain.size) == plain, s"nlist $nl")
    }
  }

  test("fitCentroids topUp on a duplicate-heavy corpus: exactly nlist " +
       "VALUE-distinct centroids (r14 ADVICE — no coincident seats)") {
    import spark.implicits._
    // 1000 rows over exactly 40 distinct vectors, each repeated 25x —
    // the id-only top-up exclusion used to seat coincident centroids
    val df = (0L until 1000L)
      .map(i => (i, Seq((i % 40).toDouble, (i % 40 * 3).toDouble)))
      .toDF("id", "v")
    val cents = IvfIndex.fitCentroids(df, "v", "id", 16, topUp = true)
    assert(cents.size == 16)
    assert(cents.map(_._2).distinct.size == 16,
      "all 16 centroids must be value-distinct")
    // fewer distinct vectors than nlist: the count contract still holds
    // (id-distinct fallback), and every distinct value is seated
    val tiny = (0L until 200L)
      .map(i => (i, Seq((i % 10).toDouble, 0.0))).toDF("id", "v")
    val c2 = IvfIndex.fitCentroids(tiny, "v", "id", 16, topUp = true)
    assert(c2.size == 16)
    assert(c2.map(_._2).distinct.size == 10,
      "all 10 distinct vectors seated before the fallback fill")
  }

  test("fitCentroids topUp: distinct values BEYOND a bounded id-window " +
       "still seat value-distinct centroids (r16 ADVICE — the pool is " +
       "value-distinct at the source)") {
    import spark.implicits._
    // 2000 rows: ids 0..1599 share 4 distinct vectors (the old bounded
    // pool of max(4k, 256) low-id rows saw ONLY these duplicates and
    // fell to the id-distinct fill — coincident seats); the other 12+
    // distinct values live exclusively at ids 1600+, beyond that window
    val df = (0L until 2000L).map { i =>
      val v = if (i < 1600L) (i % 4).toDouble else (i % 32).toDouble + 100.0
      (i, Seq(v, v * 3))
    }.toDF("id", "v")
    val cents = IvfIndex.fitCentroids(df, "v", "id", 16, topUp = true)
    assert(cents.size == 16)
    assert(cents.map(_._2).distinct.size == 16,
      "beyond-window distinct values must be found — no coincident seats")
  }

  test("searchFilteredApprox: equals filtered brute force over exactly " +
       "its nProbe nearest lists, and at nProbe = nlist equals the " +
       "certified-exact face (the q185 regime, operator form)") {
    val cents = IvfIndex.fitCentroids(e, "embedding", "vec_id", nlist = 8)
    val index = IvfIndex.assign(e, "embedding", "vec_id", cents).cache()
    val q = queryVec(7)
    val pred = col("label") <= 3
    // the q185 regime's probe ranking: rounded squared distance, cid
    // tie-break — the formula the operator must share
    def qd(c: Seq[Double]) = BigDecimal(
        c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (nProbe <- Seq(1, 2, 8)) {
      val got = IvfIndex.searchFilteredApprox(index, "embedding",
          "vec_id", cents, q, k = 10, pred, nProbe)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val probe = cents.map { case (id, c) => (qd(c), id) }
        .sorted.take(nProbe).map(_._2)
      val brute = index.filter(pred)
        .filter(col("list_id").isin(probe: _*))
        .withColumn("dist", round(graft.functions.VectorFunctions
          .sqDist(col("embedding"), array(q.map(lit): _*)), 6))
        .orderBy(col("dist"), col("vec_id")).limit(10)
        .select(col("vec_id"), col("dist"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == brute, s"nProbe=$nProbe")
    }
    // full-probe approx = certified exact: recall 1 at the far end of
    // the q185 cost/recall sweep
    val full = IvfIndex.searchFilteredApprox(index, "embedding",
        "vec_id", cents, q, k = 10, pred, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = IvfIndex.searchFilteredExact(index, "embedding",
        "vec_id", cents, q, k = 10, pred, nProbe0 = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == exact)
    index.unpersist()
  }

  test("searchBatch: one job, per-query results match single-query search") {
    val cents = IvfIndex.fitCentroids(e, "embedding", "vec_id", nlist = 8)
    val index = IvfIndex.assign(e, "embedding", "vec_id", cents).cache()
    val qids = 0L until 4L
    val queries = qids.map(q => (q, queryVec(q)))
    val batch = IvfIndex.searchBatch(index, "embedding", "vec_id", cents,
        queries, k = 5, nProbe = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1)
    qids.foreach { qid =>
      val single = IvfIndex.search(index, "embedding", "vec_id", cents,
          queryVec(qid), k = 5, nProbe = 8)
        .select(col("vec_id"), col("dist")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val fromBatch = batch(qid).sortBy(_._4).map(t => (t._2, t._3)).toSeq
      assert(fromBatch == single, s"qid=$qid")
    }
    index.unpersist()
  }

  test("saved IVF index: probes prune at PARTITION level (I/O story)") {
    // buildIndex writes partitionBy(list_id); a probe over the saved
    // layout must show PartitionFilters on list_id — directories outside
    // the probed lists are never listed, the at-scale I/O contract.
    val cents = IvfIndex.fitCentroids(e, "embedding", "vec_id", nlist = 8)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf").toString + "/idx"
    IvfIndex.buildIndex(e, "embedding", "vec_id", cents, path)
    val onDisk = spark.read.parquet(path)
    val q = queryVec(3)
    val probed = IvfIndex.search(onDisk, "embedding", "vec_id", cents, q,
      k = 10, nProbe = 2)
    val physical = probed.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
      physical.contains("list_id"),
      s"probe must prune partitions:\n$physical")
    // and the pruned on-disk path returns the same rows as in-memory
    val inMem = IvfIndex.search(
        IvfIndex.assign(e, "embedding", "vec_id", cents),
        "embedding", "vec_id", cents, q, k = 10, nProbe = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(probed.select("vec_id").collect().map(_.getLong(0)).toSeq
      == inMem)
  }

  test("assignment is deterministic and complete") {
    val cents = IvfIndex.fitCentroids(e, "embedding", "vec_id", nlist = 8)
    val a1 = IvfIndex.assign(e, "embedding", "vec_id", cents)
      .groupBy("list_id").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val a2 = IvfIndex.assign(e.repartition(5), "embedding", "vec_id", cents)
      .groupBy("list_id").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(a1 == a2)
    assert(a1.values.sum == e.count())
  }

  test("PQ: covering shortlist degenerates to exact; tight ADC shortlist " +
       "keeps usable recall at 64x compression") {
    val p = IvfIndex.fitPq(e, "embedding", "vec_id", m = 8)
    assert(p.subDim == 8 && p.codebooks.size == 8)
    val index = IvfIndex.withPqCodes(e, "embedding", p).cache()
    val n = e.count().toInt
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSeq
    // covering shortlist: re-rank sees every row ⇒ exact kNN
    val q7 = queryVec(7)
    assert(ids(IvfIndex.searchPq(index, "embedding", "vec_id", p, q7,
        k = 10, shortlist = n))
      == ids(Search.knn(e, "embedding", "vec_id",
        array(q7.map(lit): _*), 10)))
    // 8 int codes vs 64 doubles at rest = 64x; ADC shortlist of 50/500
    // must still recover most of the true top-10 after exact re-rank
    val recalls = (0L until 5L).map { qid =>
      val q = queryVec(qid)
      val exact = ids(Search.knn(e, "embedding", "vec_id",
        array(q.map(lit): _*), 10)).toSet
      val pq = ids(IvfIndex.searchPq(index, "embedding", "vec_id", p, q,
        k = 10, shortlist = 50)).toSet
      (exact intersect pq).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"mean PQ recall@10 (shortlist 50/$n): $mean%.2f")
    assert(mean >= 0.5, s"mean PQ recall $mean below floor on fixture")
    // determinism: refit produces identical codebooks
    assert(IvfIndex.fitPq(e, "embedding", "vec_id", m = 8) == p)
  }

  test("searchPqExact: exact global top-k at any seed (self-certifying path)") {
    val cents = IvfIndex.fitCentroids(e, "embedding", "vec_id", nlist = 8)
    val p = IvfIndex.fitPq(e, "embedding", "vec_id", m = 8)
    val index = IvfIndex.withPqResiduals(
      IvfIndex.withPqCodes(
        IvfIndex.assign(e, "embedding", "vec_id", cents), "embedding", p),
      "embedding", p).cache()
    for (qid <- Seq(0L, 7L, 23L); seed <- Seq(10, 64)) {
      val q = queryVec(qid)
      val got = IvfIndex.searchPqExact(index, "embedding", "vec_id", cents,
          p, q, k = 10, seed = seed)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val brute = Search.knn(e, "embedding", "vec_id",
          array(q.map(lit): _*), 10)
        .select(col("vec_id"), col("dist"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == brute, s"qid=$qid seed=$seed")
    }
    index.unpersist()
  }

  test("searchPqExact surfaces its expansion count: full-scan regime " +
       "on the unclusterable fixture, pruned on separated clusters") {
    import spark.implicits._
    // r11 verdict item: the exact contract holds on ANY collection, but
    // when PQ lower bounds cannot prune, the certified expansion IS the
    // probed collection — that degradation must be visible, not
    // inferred. The stat line is the observable; parse it.
    // the stat is a structured Obs event (r12 ADVICE: stdout was a
    // load-bearing API); capturing also flips Obs.statsWanted on this
    // thread, which is what makes the operator compute the counts at all
    def statsOf(body: => Unit): (Long, Long, Int, Int) = {
      val (_, events) = graft.Obs.withCapture(body)
      val kv = events.collectFirst { case ("pq-exact", pairs) => pairs.toMap }
        .getOrElse(fail(s"no pq-exact event in: $events"))
      (kv("expand").asInstanceOf[Long], kv("probed").asInstanceOf[Long],
        kv("lists").asInstanceOf[Int], kv("nlist").asInstanceOf[Int])
    }
    // random-ish fixture: lower bounds can't separate anything — the
    // expansion must cover (nearly) everything probed
    val cents = IvfIndex.fitCentroids(e, "embedding", "vec_id", nlist = 8)
    val p = IvfIndex.fitPq(e, "embedding", "vec_id", m = 8)
    val index = IvfIndex.withPqResiduals(
      IvfIndex.withPqCodes(
        IvfIndex.assign(e, "embedding", "vec_id", cents), "embedding", p),
      "embedding", p).cache()
    val total = index.count()
    val (re, rp, _, _) = statsOf {
      IvfIndex.searchPqExact(index, "embedding", "vec_id", cents, p,
        queryVec(3L), k = 10, seed = 10).collect()
    }
    assert(rp == total && re == rp,
      s"unclusterable fixture must show the full-scan regime: $re of $rp" +
        s" (collection $total)")
    index.unpersist()
    // separated clusters with exhaustive codebooks (zero residual):
    // list pruning + tight bounds must expand far less than the corpus
    val centers = Seq(
      Seq(0.0, 0, 0, 0, 0, 0, 0, 0),
      Seq(200.0, 0, 0, 0, 0, 0, 0, 0),
      Seq(0.0, 200, 0, 0, 0, 0, 0, 0),
      Seq(0.0, 0, 200, 0, 0, 0, 0, 0))
    val pts = for (c <- 0 until 4; i <- 0 until 40) yield {
      val id = (c * 40 + i).toLong
      val off = (0 until 8).map(d => ((id * 31 + d * 7) % 11).toDouble / 10.0)
      (id, centers(c).zip(off).map { case (a, b) => a + b })
    }
    val df = pts.toDF("vec_id", "embedding")
    val ccents: IvfIndex.Centroids =
      centers.zipWithIndex.map { case (c, i) => (i, c) }
    val books = (0 until 4).map { j =>
      pts.map(_._2.slice(j * 2, j * 2 + 2)).distinct.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
    }
    val cp = IvfIndex.PqParams(4, 2, books)
    val cindex = IvfIndex.withPqResiduals(
      IvfIndex.withPqCodes(
        IvfIndex.assign(df, "embedding", "vec_id", ccents), "embedding", cp),
      "embedding", cp).cache()
    val (ce, cpn, clists, ctot) = statsOf {
      IvfIndex.searchPqExact(cindex, "embedding", "vec_id", ccents, cp,
        centers(0).map(_ + 0.05), k = 5, seed = 5).collect()
    }
    assert(clists < ctot && cpn <= 40L && ce <= cpn,
      s"separated clusters must prune: expand=$ce of $cpn, " +
        s"lists $clists of $ctot")
    cindex.unpersist()
  }

  test("certifyPqProbed: separated clusters certify a pruned operating " +
       "point; overlapping fixture honestly refuses") {
    import spark.implicits._
    // four clusters 200 apart in 8 dims, deterministic sub-unit offsets;
    // codebooks enumerate every distinct sub-vector so the PQ residual is
    // exactly 0 and ADC is the true distance — the geometry where the
    // worst-case bounds are tight enough to certify a FINITE shortlist
    val centers = Seq(
      Seq(0.0, 0, 0, 0, 0, 0, 0, 0),
      Seq(200.0, 0, 0, 0, 0, 0, 0, 0),
      Seq(0.0, 200, 0, 0, 0, 0, 0, 0),
      Seq(0.0, 0, 200, 0, 0, 0, 0, 0))
    val pts = for (c <- 0 until 4; i <- 0 until 40) yield {
      val id = (c * 40 + i).toLong
      val off = (0 until 8).map(d => ((id * 31 + d * 7) % 11).toDouble / 10.0)
      (id, centers(c).zip(off).map { case (a, b) => a + b })
    }
    val df = pts.toDF("vec_id", "embedding")
    val cents: IvfIndex.Centroids =
      centers.zipWithIndex.map { case (c, i) => (i, c) }
    val books = (0 until 4).map { j =>
      pts.map(_._2.slice(j * 2, j * 2 + 2)).distinct.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
    }
    val p = IvfIndex.PqParams(4, 2, books)
    val index = IvfIndex.withPqResiduals(
      IvfIndex.withPqCodes(
        IvfIndex.assign(df, "embedding", "vec_id", cents), "embedding", p),
      "embedding", p).cache()
    // zero residuals: the codebooks contain every point
    assert(index.agg(max(col(IvfIndex.PqResCol))).head().getDouble(0) < 1e-9)
    val q = centers(0).map(_ + 0.05)
    val (pm, sm) = IvfIndex.certifyPqProbed(index, "embedding", "vec_id",
      cents, p, q, k = 5, nProbe = 1, shortlist = 12)
    assert(pm > 0 && sm > 0, s"margins ($pm, $sm) should certify")
    // certified ⇒ the stacked probed search IS brute force
    val got = IvfIndex.searchPqProbed(index, "embedding", "vec_id", cents,
        p, q, k = 5, nProbe = 1, shortlist = 12)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val brute = Search.knn(df, "embedding", "vec_id",
        array(q.map(lit): _*), 5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == brute)
    index.unpersist()
    // honesty: the real fixture's overlapping clusters do NOT certify at
    // a tight operating point — searchPqExact exists precisely because
    // fixed (nProbe, shortlist) cannot be proven there
    val ecents = IvfIndex.fitCentroids(e, "embedding", "vec_id", nlist = 16)
    val ep = IvfIndex.fitPq(e, "embedding", "vec_id", m = 8)
    val eindex = IvfIndex.withPqResiduals(
      IvfIndex.withPqCodes(
        IvfIndex.assign(e, "embedding", "vec_id", ecents), "embedding", ep),
      "embedding", ep)
    val (epm, esm) = IvfIndex.certifyPqProbed(eindex, "embedding", "vec_id",
      ecents, ep, queryVec(11), k = 10, nProbe = 4, shortlist = 48)
    assert(epm < 0 || esm < 0)
  }

  test("searchPqProbed: non-covering nProbe keeps usable recall (approx regime)") {
    val cents = IvfIndex.fitCentroids(e, "embedding", "vec_id", nlist = 16)
    val p = IvfIndex.fitPq(e, "embedding", "vec_id", m = 8)
    val index = IvfIndex.withPqCodes(
      IvfIndex.assign(e, "embedding", "vec_id", cents), "embedding", p)
      .cache()
    val recalls = (0L until 5L).map { qid =>
      val q = queryVec(qid)
      val exact = Search.knn(e, "embedding", "vec_id",
          array(q.map(lit): _*), 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val got = IvfIndex.searchPqProbed(index, "embedding", "vec_id", cents,
          p, q, k = 10, nProbe = 4, shortlist = 50)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (exact intersect got).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"mean stacked-PQ recall@10 (nProbe 4/16, shortlist 50): $mean%.2f")
    assert(mean >= 0.4, s"mean stacked recall $mean below floor on fixture")
    index.unpersist()
  }

  test("multi-probe recall/cost curve on the clustered fixture: " +
    "recall@10 >= 0.9 at a pinned nProbe (r7 ask #7)") {
    // The tuning loop q115's harness exists for: sweep nProbe over the
    // stacked IVF+PQ serving path on CLUSTERED data (q51's fixture) and
    // read the recall/cost trade off the curve. Cost = rows the probe
    // admits (the partition-pruning win at rest); recall vs brute force.
    val ce = SparkEntry.clusteredEmbeddings(spark, SparkTestSession.sf0001)
      .persist()
    val total = ce.count()
    val cents = IvfIndex.fitCentroids(ce, "cvec", "vec_id", nlist = 20,
      refineIters = 5)
    val p = IvfIndex.fitPq(ce, "cvec", "vec_id", m = 8)
    val index = IvfIndex.withPqCodes(
      IvfIndex.assign(ce, "cvec", "vec_id", cents), "cvec", p).cache()
    def qv(qid: Long): Seq[Double] =
      ce.filter(col("vec_id") === qid).head().getSeq[Double](1)
    val qids = 0L until 5L
    val exact = qids.map { qid =>
      qid -> Search.knn(ce, "cvec", "vec_id",
          array(qv(qid).map(lit): _*), 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }.toMap
    val curve = Seq(1, 2, 4, 8).map { nProbe =>
      val rs = qids.map { qid =>
        val got = IvfIndex.searchPqProbed(index, "cvec", "vec_id", cents,
            p, qv(qid), k = 10, nProbe = nProbe, shortlist = 50)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        (exact(qid) intersect got).size / 10.0
      }
      val scanned = qids.map { qid =>
        val lists = IvfIndex.probeLists(cents, qv(qid), nProbe)
        index.filter(col("list_id").isin(lists: _*)).count()
      }.sum / qids.size
      (nProbe, rs.sum / rs.size, scanned)
    }
    curve.foreach { case (np, r, c) =>
      info(f"nProbe=$np%2d  recall@10=$r%.2f  rows-scanned=$c (of $total)") }
    // recall is non-decreasing in nProbe (more lists never hurt) ...
    curve.sliding(2).foreach { case Seq((_, r1, _), (_, r2, _)) =>
      assert(r2 >= r1 - 1e-9, s"recall regressed along the curve: $curve") }
    // ... and the curve reaches the operating point the ask pins, while
    // still pruning (scanning a fraction of the collection)
    val hit = curve.find(_._2 >= 0.9)
    assert(hit.isDefined, s"no nProbe reached recall 0.9: $curve")
    assert(hit.get._3 < total / 2,
      s"recall 0.9 should not require scanning half the collection: $curve")
    index.unpersist(); ce.unpersist()
  }

  test("SQ8: reconstruction error bounded by step/2 per dimension") {
    val p = IvfIndex.fitSq(e, "embedding")
    val recon = e.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"),
      IvfIndex.sqDecode(
        IvfIndex.sqEncode(col("embedding"), p), p).as("r"))
    // max |v_d - r_d| over every row and dimension <= max step/2 + eps
    val worst = recon
      .select(explode(zip_with(col("v"), col("r"),
        (a, b) => abs(a - b))).as("err"))
      .agg(max(col("err"))).head().getDouble(0)
    val bound = p.step.max / 2 + 1e-12
    assert(worst <= bound, s"worst-dim error $worst > step/2 bound $bound")
  }

  test("SQ8 search: recall >= exact-probe recall at equal nProbe, " +
       "covering shortlist degenerates to exact") {
    val cents = IvfIndex.fitCentroids(e, "embedding", "vec_id", nlist = 16)
    val p = IvfIndex.fitSq(e, "embedding")
    val index = IvfIndex.withSqCodes(
      IvfIndex.assign(e, "embedding", "vec_id", cents), "embedding", p)
      .cache()
    val n = e.count().toInt
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSeq
    val recalls = (0L until 5L).map { qid =>
      val q = queryVec(qid)
      val exact = ids(Search.knn(e, "embedding", "vec_id",
        array(q.map(lit): _*), 10)).toSet
      val plainIvf = ids(IvfIndex.search(index, "embedding", "vec_id",
        cents, q, k = 10, nProbe = 4)).toSet
      val sq = ids(IvfIndex.searchSq(index, "embedding", "vec_id", cents,
        p, q, k = 10, nProbe = 4, shortlist = 40)).toSet
      ((exact intersect plainIvf).size / 10.0,
        (exact intersect sq).size / 10.0)
    }
    // The gate: quantized-probe + exact re-rank must not lose recall vs
    // full-precision probing of the SAME lists. Asserted over the MEAN on
    // this pinned deterministic fixture — it is NOT a per-query
    // mathematical invariant (a tight shortlist ranked by reconstructed
    // distances can in principle drop a true neighbor that exact probing
    // keeps; at shortlist = 4k over ~n/4 probed rows the quantization
    // error never costs rank-40 placement here).
    val (meanPlain, meanSq) =
      (recalls.map(_._1).sum / 5, recalls.map(_._2).sum / 5)
    assert(meanSq >= meanPlain,
      s"mean SQ recall $meanSq < mean exact-probe recall $meanPlain")
    info(f"mean recall@10 (nProbe=4/16): exact-probe $meanPlain%.2f, " +
      f"SQ+rerank $meanSq%.2f")
    // shortlist >= collection size + nProbe = nlist ⇒ identical to exact
    val q = queryVec(7)
    assert(ids(IvfIndex.searchSq(index, "embedding", "vec_id", cents, p,
        q, k = 10, nProbe = 16, shortlist = n))
      == ids(Search.knn(e, "embedding", "vec_id",
        array(q.map(lit): _*), 10)))
    index.unpersist()
  }

  test("SQ8 bytes on disk: int8 codes are <4x smaller than the doubles") {
    val p = IvfIndex.fitSq(e, "embedding")
    val base = java.nio.file.Files
      .createTempDirectory("graft_sq_bytes").toString
    e.select(col("vec_id"), col("embedding").cast("array<double>"))
      .write.parquet(s"$base/doubles")
    IvfIndex.withSqCodes(e, "embedding", p)
      .select(col("vec_id"), col(IvfIndex.SqCol))
      .write.parquet(s"$base/codes")
    def bytes(dir: String): Long = {
      val d = new java.io.File(dir)
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.length()).sum
    }
    val (bd, bc) = (bytes(s"$base/doubles"), bytes(s"$base/codes"))
    // 8 bytes/dim vs 1; parquet encoding eats some of the ratio, but the
    // at-rest claim needs at least 4x
    assert(bc * 4 < bd, s"codes $bc bytes not <4x smaller than doubles $bd")
  }

  test("Lloyd refinement: lower quantization error, recall not worse, " +
       "deterministic across partitionings") {
    // Lloyd's provable invariant is the k-means objective: mean squared
    // distance to the nearest centroid is monotone non-increasing, and
    // strictly drops when sample points aren't already centroids —
    // that's what's asserted strictly. Recall is downstream of it and
    // data-dependent (member queries assign and probe with the SAME
    // metric, so IVF recall is fairly insensitive to quantizer quality);
    // it is pinned as not-worse at low nProbe. Determinism must be
    // bit-for-bit: refinement is driver-side over an id-ordered sample,
    // so the input's partitioning must not leak into centroid doubles.
    val ce = SparkEntry.clusteredEmbeddings(spark, SparkTestSession.sf0001)
      .persist()
    val plain = IvfIndex.fitCentroids(ce, "cvec", "vec_id", nlist = 16)
    val refined = IvfIndex.fitCentroids(ce, "cvec", "vec_id", nlist = 16,
      refineIters = 3)
    def qErr(cents: IvfIndex.Centroids): Double = {
      val arr = array(cents.map { case (_, v) =>
        graft.functions.VectorFunctions.sqDist(col("cvec"),
          array(v.map(lit): _*))
      }: _*)
      ce.select(array_min(arr).as("d")).agg(avg(col("d"))).head().getDouble(0)
    }
    val (e0, e1) = (qErr(plain), qErr(refined))
    assert(e1 < e0, s"refined quantization error $e1 !< sample-only $e0")
    def recall(cents: IvfIndex.Centroids): Double = {
      val index = IvfIndex.assign(ce, "cvec", "vec_id", cents).cache()
      def qv(id: Long) = ce.filter(col("vec_id") === id)
        .select(col("cvec")).head().getSeq[Double](0)
      val r = (0L until 5L).map { qid =>
        val q = qv(qid)
        val exact = Search.knn(ce, "cvec", "vec_id",
            array(q.map(lit): _*), 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val ivf = IvfIndex.search(index, "cvec", "vec_id", cents, q,
            k = 10, nProbe = 2)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        (exact intersect ivf).size.toDouble / exact.size
      }
      index.unpersist()
      r.sum / r.size
    }
    val (r0, r1) = (recall(plain), recall(refined))
    assert(r1 >= r0, s"refined recall $r1 < sample-only $r0")
    info(f"qErr $e0%.2f -> $e1%.2f, recall@10(nProbe=2) $r0%.2f -> $r1%.2f")
    val again = IvfIndex.fitCentroids(ce.repartition(7), "cvec", "vec_id",
      nlist = 16, refineIters = 3)
    assert(again == refined, "refinement must be partition-order-stable")
    ce.unpersist()
  }

  test("kmeans: separable blobs recovered, assignment partition-stable") {
    import spark.implicits._
    // two tight blobs around (0,0) and (100,100); seeds 0 and 1 land one
    // in each blob, so 2 iterations settle exactly
    val pts = (0L until 20L).map { i =>
      val (cx, off) = if (i % 2 == 0) (0.0, i.toDouble / 100)
                      else (100.0, i.toDouble / 100)
      (i, Seq(cx + off, cx - off))
    }
    val df = pts.toDF("id", "vec")
    val (asg, cents) = operators.Clustering.kmeans(df, "id", "vec",
      k = 2, iters = 2)
    val byCluster = asg.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 20L).forall(i => byCluster(i) == i % 2),
      "blob membership should follow parity seeding")
    assert(cents.size == 2)
    assert(math.abs(cents(0)._2.head) < 1.0 &&
      math.abs(cents(1)._2.head - 100.0) < 1.0)
    // content-deterministic: repartitioning must not change assignments
    val (asg2, cents2) = operators.Clustering.kmeans(df.repartition(7),
      "id", "vec", k = 2, iters = 2)
    assert(cents2 == cents)
    assert(asg2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      asg.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("kmeans large-k expression path is bit-identical to the literal " +
      "struct-array formulation (the ExprKMax switch)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.sqDist
    // 120 points on a noisy ring, k=20 > ExprKMax=16 → NearestCentroid
    // expression path; the spec re-derives the assignment through the
    // literal formulation kmeans uses at small k and demands equality —
    // including rounded-distance ties (several points land equidistant
    // under rounding to 1 decimal, exercising the smallest-id rule).
    assert(operators.Clustering.ExprKMax < 20)
    val pts = (0L until 120L).map { i =>
      val a = i.toDouble / 120 * 2 * math.Pi
      (i, Seq(math.cos(a) * 10, math.sin(a) * 10, (i % 7).toDouble))
    }
    val df = pts.toDF("id", "vec")
    val (asg, cents) = operators.Clustering.kmeans(df, "id", "vec",
      k = 20, iters = 2, roundTo = 1)
    val got = asg.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // literal-formulation replica over the SAME final centroids
    val options = array(cents.map { case (cid, c) =>
      struct(round(sqDist(col("__v"), array(c.map(lit): _*)), 1).as("d"),
        lit(cid).as("c"))
    }: _*)
    val want = df.select(col("id"),
        col("vec").cast("array<double>").as("__v"))
      .withColumn("__b", array_min(options))
      .select(col("id"), col("__b.c").cast("long"), col("__b.d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == want)
    assert(got.map(_._2).size > 10, "fixture should spread over clusters")
  }

  test("kmeans degenerate vectors (NaN / Inf-overflow / null / length " +
      "mismatch): no crash, identical rows across the ExprKMax switch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.sqDist
    // Round-10 advice: BigDecimal.valueOf(NaN) threw in the primitive-loop
    // path, and the literal path assigned degenerate rows to (cluster 0,
    // null dist) while the expression path returned null rows. Both fixed;
    // this pins the agreed semantics: NaN/Inf distances propagate (NaN ties
    // to cluster 0 — Spark orders NaN equal to itself), degenerate inputs
    // null-poison the whole row in BOTH formulations.
    val clean = (0L until 20L).map { i =>
      val a = i.toDouble / 20 * 2 * math.Pi
      (i, Option(Seq(math.cos(a) * 10, math.sin(a) * 10)))
    }
    val degenerate: Seq[(Long, Option[Seq[Double]])] = Seq(
      (100L, Some(Seq(Double.NaN, 0.0))),  // NaN poisons every distance
      (101L, Some(Seq(Double.NaN, Double.NaN))),
      (102L, Some(Seq(1e308, 1e308))),     // every distance overflows → Inf
      (103L, None),                        // null vector
      (104L, Some(Seq(1.0))))              // length mismatch
    val df = (clean ++ degenerate).toDF("id", "vec")
    assert(operators.Clustering.ExprKMax < 20)
    // k=20 > ExprKMax → primitive-loop NearestCentroid path; iters=0 seeds
    // centroids from ids 0..19, so a literal-formulation replica over the
    // returned cents shares them exactly
    val (asg, cents) = operators.Clustering.kmeans(df, "id", "vec",
      k = 20, iters = 0, roundTo = 1)
    def norm(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L
        else java.lang.Double.doubleToLongBits(r.getDouble(2)))
    }.toSet
    val got = norm(asg.collect())
    val options = array(cents.map { case (cid, c) =>
      struct(round(sqDist(col("__v"), array(c.map(lit): _*)), 1).as("d"),
        lit(cid).as("c"))
    }: _*)
    val m = array_min(options)
    val want = norm(df.select(col("id"),
        col("vec").cast("array<double>").as("__v"))
      .withColumn("__b", when(m.getField("d").isNull, lit(null)).otherwise(m))
      .select(col("id"), col("__b.c").cast("long"), col("__b.d"))
      .collect())
    assert(got == want)
    val byId = got.map(t => t._1 -> ((t._2, t._3))).toMap
    val nanBits = java.lang.Double.doubleToLongBits(Double.NaN)
    val infBits = java.lang.Double.doubleToLongBits(Double.PositiveInfinity)
    assert(byId(100L) == ((0L, nanBits)) && byId(101L) == ((0L, nanBits)))
    assert(byId(102L) == ((0L, infBits)))
    assert(byId(103L) == ((-1L, -1L)) && byId(104L) == ((-1L, -1L)))
    // and the SMALL-k literal path end-to-end (k=2 <= ExprKMax): the
    // null-poison wrapper inside kmeans itself, not the spec's replica
    val (asg2, _) = operators.Clustering.kmeans(df, "id", "vec",
      k = 2, iters = 0, roundTo = 1)
    val small = norm(asg2.collect()).map(t => t._1 -> ((t._2, t._3))).toMap
    assert(small(103L) == ((-1L, -1L)) && small(104L) == ((-1L, -1L)))
    assert(small(100L)._1 == 0L && small(100L)._2 == nanBits)
  }

  test("kCenterGreedy: hand-traced farthest-point traversal on a line; " +
    "seed is smallest id; ties break by id; partition-invariant") {
    import spark.implicits._
    // 1@0, 2@1, 3@10, 4@10.5 (squared distances): seed=1, then the
    // farthest is 4 (110.25), then 2 (min(1, 90.25)=1), then 3
    // (min(100, .25, 81)=0.25)
    val pts = Seq((1L, Seq(0.0)), (2L, Seq(1.0)), (3L, Seq(10.0)),
      (4L, Seq(10.5))).toDF("id", "vec")
    val got = operators.Clustering.kCenterGreedy(pts, "id", "vec", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 1L, 0.0), (2L, 4L, 110.25),
      (3L, 2L, 1.0), (4L, 3L, 0.25)), s"got ${got.toSeq}")
    // exact tie in max-min distance (5@-1 vs 2@1 both d=1 from seed 1
    // after picking 4... use k=2 on {1@0, 2@1, 5@-1}: both at d=1 →
    // smaller id 2 wins
    val tie = Seq((1L, Seq(0.0)), (2L, Seq(1.0)), (5L, Seq(-1.0)))
      .toDF("id", "vec")
    val t = operators.Clustering.kCenterGreedy(tie, "id", "vec", k = 2)
      .collect().map(r => r.getLong(1))
    assert(t.toSeq == Seq(1L, 2L))
    // content-deterministic under repartition
    val got2 = operators.Clustering
      .kCenterGreedy(pts.repartition(5), "id", "vec", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got2.toSeq == got.toSeq)
  }
}

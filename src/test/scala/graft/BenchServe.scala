package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the AT-REST SERVING bench — build-once / probe-forever,
  * timed separately, at any SF dir (the production face of the index
  * lifecycle, which the per-query BENCH protocol never isolates: q75–
  * q82 rebuild their index inside the query, so build dominates and
  * the partition-pruning claims are invisible).
  *
  * Knobs scale with data the way a real deployment's do — they are
  * BUILD-time parameters, so sizing them to the corpus is part of the
  * contract being measured:
  *   - vector: nlist = n/4096 (bounded lists) → an nProbe=4 probe
  *     reads ~4 lists ≈ 16k vectors at ANY corpus size; probe-from-
  *     disk cost should track that, not the corpus.
  *   - text: nBuckets = nDocs/3125 (bounded bucket dirs) → a 3-term
  *     query reads ≤3 bucket directories of shrinking corpus fraction
  *     + term row-group pushdown; probe cost should track the query
  *     terms' postings, not the corpus.
  * The certified-exact vector probe (annSearchPqExact) is reported
  * too: on this near-uniform fixture its expansion is the whole
  * collection by contract (the [pq-exact] stat makes that visible),
  * so it is the honest linear bound the pruned probes beat.
  *
  * Probes run 3× with the SQL cache cleared between runs (min
  * reported — steady-state serving with a warm OS page cache).
  * Usage: SPARK_GRAFT_SF_DIR=... Test/runMain graft.BenchServe */
object BenchServe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.withGraftConf(Tables.withBenchShuffle(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"), cpus.toInt, sfDir))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def secs(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def probeMin(body: => Long): (Double, Long) = {
      var best = Double.MaxValue; var rows = -1L
      for (_ <- 1 to 3) {
        spark.sqlContext.clearCache()
        val t0 = System.nanoTime()
        rows = body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, rows)
    }
    def freshDir(tag: String): String = {
      val p = s"${sys.props("java.io.tmpdir")}/graft_serve_${tag}_" +
        java.lang.Integer.toHexString(sfDir.hashCode)
      org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(p), true)
      p
    }

    // ---------------- vector row: IVF layout, list-pruned serving
    val e = Tables.load(spark, sfDir, "embeddings")
    val n = e.count()
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    val nlist = math.max(16L, n / 4096L).toInt
    val vecPath = freshDir("vec")
    // topUpNlist: hash-stride sampling is ~Poisson(nlist) and can halve
    // the quantizer a deployment sized (measured: ×10 fixture asked for
    // 16 lists, drew 8 — the recall/probe rows then measured a
    // half-resolution index labeled nlist 16); serving benches honor
    // the requested geometry
    val buildVec = secs {
      VectorIndex.create(e, "embedding", "vec_id", dim, nlist = nlist,
          topUpNlist = true)
        .save(vecPath)
    }
    val q = e.filter(col("vec_id") === 11).select(col("embedding")).head()
      .getSeq[Float](0).map(_.toDouble)
    val idx = VectorIndex.load(spark, vecPath)
    val (probeAnn, annRows) = probeMin {
      idx.annSearch(q, k = 12, nProbe = 4).count()
    }
    val (probeExact, exactRows) = probeMin {
      idx.annSearchPqExact(q, k = 12, seed = 48).count()
    }

    // ---------------- filtered row: predicate-attached EXACT serving
    // (annSearchFiltered, r14): top-12 among label = 3 rows (~10%
    // selectivity) over the same saved layout, certificate-escalated
    // until provably brute-force-equal on the filtered collection.
    // Beside the seconds, record how far the escalation went (probed/
    // nlist from the filtered-knn Obs event): on this near-uniform
    // fixture the ring certificate has little to prune with (radii ≈
    // inter-centroid distances), so probed/nlist is the honest cost of
    // EXACTNESS on unstructured data; the clustered row below is the
    // same query where the certificate has teeth.
    def filteredProbe(ix: VectorIndex, qv: Seq[Double],
                      pred: org.apache.spark.sql.Column)
        : (Double, Map[String, Any]) = {
      var ev: Map[String, Any] = Map.empty
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        spark.sqlContext.clearCache()
        val t0 = System.nanoTime()
        val (cnt, evs) = Obs.withCapture {
          ix.annSearchFiltered(qv, k = 12, pred = pred, nProbe0 = 4)
            .count()
        }
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        ev = evs.filter(_._1 == "filtered-knn").last._2.toMap
        require(cnt > 0, "filtered probe returned no rows")
      }
      (best, ev)
    }
    val (probeFiltered, filtEv) =
      filteredProbe(idx, q, col("label") === 3)

    // ---------------- recall row: is the FAST pruned probe also GOOD
    // at these exact deployment knobs? (r13 VERDICT: probe speed was
    // recorded at 3 SFs, recall only ever at fixture scale.) 64 query
    // vectors drawn from the corpus itself; truth = exact top-k by
    // brute force (Search.knnBatch); approx = the SAME annSearch call
    // the timing row measures, same nlist/nProbe.
    val recallK = 12
    val qRows = e.orderBy(col("vec_id")).limit(64)
      .select(col("vec_id"), col("embedding")).collect()
    val approxAll = qRows.map { r =>
      idx.annSearch(r.getSeq[Float](1).map(_.toDouble), k = recallK,
          nProbe = 4)
        .select(lit(r.getLong(0)).as("qid"), col("vec_id"))
    }.reduce(_ unionByName _)
    val exactAll = operators.Search.knnBatch(e, "embedding", "vec_id",
      e.orderBy(col("vec_id")).limit(64)
        .select(col("vec_id").as("qid"), col("embedding")),
      "embedding", "qid", k = recallK)
    val rec = operators.Search.recallAtK(
        approxAll, exactAll.select(col("qid"), col("vec_id")),
        "qid", "vec_id")
      .agg(avg(col("recall")), min(col("recall"))).head()
    val (recMean, recMin) = (rec.getDouble(0), rec.getDouble(1))
    // the recall/nProbe CURVE: what one more probe buys (recall) and
    // costs (probe seconds) at this corpus size — the knob a
    // deployment actually turns. On the near-uniform bench fixture
    // recall tracks ~nProbe/nlist (no cluster structure to exploit);
    // a clustered corpus (q115's harness) does better per probe.
    val sweep = Seq(4, 8, 16, math.max(nlist / 2, 24)).distinct
      .filter(_ <= nlist).map { np =>
        val (pSecs, _) = probeMin { idx.annSearch(q, k = 12, nProbe = np)
          .count() }
        val ap = qRows.map { r =>
          idx.annSearch(r.getSeq[Float](1).map(_.toDouble), k = recallK,
              nProbe = np)
            .select(lit(r.getLong(0)).as("qid"), col("vec_id"))
        }.reduce(_ unionByName _)
        val rw = operators.Search.recallAtK(
            ap, exactAll.select(col("qid"), col("vec_id")), "qid", "vec_id")
          .agg(avg(col("recall"))).head().getDouble(0)
        s"""{"n_probe":$np,"probe_secs":$pSecs,"mean_recall":$rw}"""
      }.mkString("[", ",", "]")

    // ---------------- clustered-recall row: the FAVORABLE regime at
    // the same corpus SIZE. The bench embeddings are near-uniform —
    // the IVF worst case, where recall can only track the probed
    // fraction. Real embedding corpora cluster; here a clustered
    // corpus of the SAME n and dim is derived deterministically from
    // the data itself (every vector pulled 4:1 toward one of nlist
    // anchor vectors, anchor = vec_id % nlist — engine arithmetic
    // only, no RNG), indexed with the SAME knobs, and recall@12 at
    // nProbe=4 measured the same way. The uniform row is the floor;
    // this is what the same index does when the data has the
    // structure IVF exploits.
    val anchors = e.orderBy(col("vec_id")).limit(nlist)
      .select((col("vec_id") % nlist).as("__a"),
        col("embedding").cast("array<double>").as("__av"))
    val clustered = e
      .select(col("vec_id"), (col("vec_id") % nlist).as("__a"),
        col("embedding").cast("array<double>").as("__v"))
      .join(broadcast(anchors), "__a")
      .select(col("vec_id"), zip_with(col("__av"), col("__v"),
        (a, x) => a * 4.0 + x).as("embedding"))
      .persist()
    clustered.count()
    // saved + loaded like the uniform index: the clustered rows measure
    // the AT-REST serving path (list_id partition pruning, sidecar
    // radii), not an in-memory re-assignment per probe
    val cPath = freshDir("vecc")
    VectorIndex.create(clustered, "embedding", "vec_id", dim,
        nlist = nlist, topUpNlist = true)
      .save(cPath)
    val cIdx = VectorIndex.load(spark, cPath)
    val cq = clustered.orderBy(col("vec_id")).limit(64)
      .select(col("vec_id"), col("embedding")).collect()
    val cApprox = cq.map { r =>
      cIdx.annSearch(r.getSeq[Double](1), k = recallK, nProbe = 4)
        .select(lit(r.getLong(0)).as("qid"), col("vec_id"))
    }.reduce(_ unionByName _)
    val cExact = operators.Search.knnBatch(clustered, "embedding",
      "vec_id", clustered.orderBy(col("vec_id")).limit(64)
        .select(col("vec_id").as("qid"), col("embedding")),
      "embedding", "qid", k = recallK)
    val cRec = operators.Search.recallAtK(
        cApprox, cExact.select(col("qid"), col("vec_id")), "qid", "vec_id")
      .agg(avg(col("recall")), min(col("recall"))).head()
    val (cMean, cMin) = (cRec.getDouble(0), cRec.getDouble(1))
    // filtered EXACT probe where the certificate has teeth: same
    // selectivity (~10%, vec_id % 10 = 3) over the clustered corpus —
    // tight list radii let the escalation stop far short of nlist
    val cqv = clustered.filter(col("vec_id") === 11)
      .select(col("embedding")).head().getSeq[Double](0)
    val (probeFilteredC, filtEvC) =
      filteredProbe(cIdx, cqv, col("vec_id") % 10 === 3)
    clustered.unpersist()

    // ---------------- text row: postings index, bucket-pruned serving
    val docs = Tables.load(spark, sfDir, "documents")
    val nDocs = docs.count()
    val nBuckets = math.max(16L, nDocs / 3125L).toInt
    val textPath = freshDir("text")
    val buildText = secs {
      operators.TextSearch.buildIndex(docs, "doc_id", "text", textPath,
        nBuckets = nBuckets)
    }
    val (probeText, textRows) = probeMin {
      operators.TextSearch.bm25Indexed(spark, textPath,
        Seq("spark", "vector", "query"), k = 20).count()
    }

    println(
      s"""{"metric":"serve","sf":"$sfDir","n_vecs":$n,"n_docs":$nDocs,""" +
      s""""vector":{"nlist":$nlist,"build_secs":$buildVec,""" +
      s""""probe_ann_secs":$probeAnn,"ann_rows":$annRows,""" +
      s""""probe_exact_secs":$probeExact,"exact_rows":$exactRows,""" +
      s""""recall":{"k":$recallK,"n_queries":64,"n_probe":4,""" +
      s""""mean":$recMean,"min":$recMin},""" +
      s""""recall_sweep":$sweep,""" +
      s""""recall_clustered":{"k":$recallK,"n_queries":64,"n_probe":4,""" +
      s""""mean":$cMean,"min":$cMin},""" +
      s""""filtered":{"probe_secs":$probeFiltered,""" +
      s""""probed":${filtEv("probed")},"nlist":${filtEv("nlist")},""" +
      s""""rounds":${filtEv("rounds")},"matched":${filtEv("matched")}},""" +
      s""""filtered_clustered":{"probe_secs":$probeFilteredC,""" +
      s""""probed":${filtEvC("probed")},"nlist":${filtEvC("nlist")},""" +
      s""""rounds":${filtEvC("rounds")},"matched":${filtEvC("matched")}}},""" +
      s""""text":{"n_buckets":$nBuckets,"build_secs":$buildText,""" +
      s""""probe_secs":$probeText,"rows":$textRows}}""")
    spark.stop()
  }
}

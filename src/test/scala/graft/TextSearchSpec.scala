package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextSearch

class TextSearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val corpus = Seq(
    (1L, "spark shuffle join spark spark"),
    (2L, "vector index search"),
    (3L, "spark vector spark"),
    (4L, "the quick brown fox"),
    (5L, "join join join join join join join join"))

  /** Reference BM25 computed independently in plain Scala. */
  private def refBm25(terms: Seq[String], k1: Double = 1.2,
                      b: Double = 0.75): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val dfm = terms.map(t => t -> toks.values.count(_.contains(t)).toDouble).toMap
    toks.flatMap { case (id, ts) =>
      val s = terms.map { term =>
        val tf = ts.count(_ == term).toDouble
        if (tf == 0) 0.0
        else math.log(1.0 + (n - dfm(term) + 0.5) / (dfm(term) + 0.5)) *
          tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * ts.size / avgdl))
      }.sum
      if (s > 0) Some(id -> s) else None
    }
  }

  test("filtered bm25 (allowed set): Lucene filter semantics — only " +
       "allowed docs return, each scoring EXACTLY its unfiltered score " +
       "(df/N/avgdl stay corpus-wide), on both the scan and index paths") {
    import spark.implicits._
    val docs = corpus.toDF("id", "text")
    val allowed = Seq(2L, 3L, 4L, 5L).toDF("id")
    val unfiltered = TextSearch.bm25(docs, "id", "text",
        Seq("spark", "vector"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val scan = TextSearch.bm25(docs, "id", "text",
        Seq("spark", "vector"), k = 10, allowed = Some(allowed))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // docs 1 (disallowed) and 4/5 (no matching terms) are out; the
    // survivors keep their unfiltered scores bit-identically
    assert(scan.map(_._1).toSet == Set(2L, 3L))
    scan.foreach { case (id, s) => assert(s == unfiltered(id), s"doc $id") }
    val path = java.nio.file.Files
      .createTempDirectory("graft_bm25_filt").toString + "/idx"
    TextSearch.buildIndex(docs, "id", "text", path, nBuckets = 4)
    val idx = TextSearch.bm25Indexed(spark, path,
        Seq("spark", "vector"), k = 10, allowed = Some(allowed))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(idx.toSeq == scan.toSeq)
  }

  test("fsckIndex: fresh build all-green with recompute-predicted " +
       "details; duplicate-doc append breaks the sidecar-scalar checks; " +
       "delete keeps them consistent (sidecar follows the data)") {
    import spark.implicits._
    val docs = corpus.toDF("id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft_fsck_txt").toString + "/idx"
    TextSearch.buildIndex(docs, "id", "text", path, nBuckets = 4)
    def report(): Map[String, (Boolean, Long)] =
      TextSearch.fsckIndex(spark, path).collect()
        .map(r => r.getString(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    val fresh = report()
    assert(fresh.values.forall(_._1), fresh)
    assert(fresh("doc_count_consistent") == (true, 5L))
    assert(fresh("sumdl_consistent")._2 ==
      corpus.map(_._2.split(" ").length).sum.toLong)
    assert(fresh("write_eras") == (true, 1L))
    // tombstone delete: sidecar scalars follow the live data, so the
    // consistency checks STAY green; the tombstone is not an orphan
    TextSearch.deleteFromIndex(spark, path, Seq(5L).toDF("id"))
    val afterDel = report()
    assert(afterDel("doc_count_consistent") == (true, 4L))
    assert(afterDel("sumdl_consistent")._1)
    assert(afterDel("orphan_tombstones") == (true, 0L))
    // re-appending an EXISTING doc doubles its postings: the sidecar
    // claims more docs than the live distinct count — both scalar
    // checks must flag it (the append-only id contract violated)
    TextSearch.appendIndex(docs.filter(col("id") === 1), "text", path)
    val dup = report()
    assert(!dup("doc_count_consistent")._1)
    assert(!dup("sumdl_consistent")._1)
    assert(dup("bucket_hash_consistent")._1) // geometry still sound
  }

  test("bm25 matches an independent plain-Scala computation") {
    import spark.implicits._
    val docs = corpus.toDF("id", "text")
    val got = TextSearch.bm25(docs, "id", "text",
        Seq("spark", "vector"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refBm25(Seq("spark", "vector"))
    assert(got.keySet === want.keySet)
    // scores come back rounded to 6 decimals (the pre-cut contract)
    got.foreach { case (id, s) =>
      assert(math.abs(s - want(id)) < 5e-7, s"doc $id") }
  }

  test("bm25 ranking: more occurrences of a rarer term scores higher") {
    import spark.implicits._
    val docs = corpus.toDF("id", "text")
    val top = TextSearch.bm25(docs, "id", "text", Seq("vector"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    // docs 2 and 3 both contain "vector" once; doc 2 is shorter → higher
    assert(top === Seq(2L, 3L))
  }

  test("bm25 repeated query terms count once") {
    import spark.implicits._
    val docs = corpus.toDF("id", "text")
    val once = TextSearch.bm25(docs, "id", "text", Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val twice = TextSearch.bm25(docs, "id", "text", Seq("spark", "SPARK"),
        k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(once === twice)
  }

  test("rrfFuse: hand-checked fusion of two shortlists") {
    import spark.implicits._
    // list A ranks: x=1, y=2; list B ranks: y=1, z=2
    val a = Seq(("x", 0.9), ("y", 0.5)).toDF("id", "s")
    val b = Seq(("y", 3.0), ("z", 2.0)).toDF("id", "s")
    val got = TextSearch.rrfFuse(a, b, "id", "s", "s", kRrf = 60)
      .collect().map(r => (r.getString(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getDouble(3))).toList
    val y = 1.0 / 62 + 1.0 / 61
    assert(got.map(_._1) === List("y", "x", "z")) // y in both lists wins
    assert(got.head === (("y", Some(2L), Some(1L), y)))
    assert(math.abs(got(1)._4 - 1.0 / 61) < 1e-15)
    assert(got(1)._2 === Some(1L)) // x absent from B
    assert(got(1)._3 === None)
  }

  test("rrfFuse ties break by id ascending") {
    import spark.implicits._
    // w only in A at rank 1; z only in B at rank 1 → equal rrf
    val a = Seq(("w", 1.0)).toDF("id", "s")
    val b = Seq(("z", 1.0)).toDF("id", "s")
    val got = TextSearch.rrfFuse(a, b, "id", "s", "s")
      .collect().map(_.getString(0)).toList
    assert(got === List("w", "z"))
  }

  test("rrfFuse fuses three shortlists (rank_1..rank_3)") {
    import spark.implicits._
    // A: x=1, y=2; B: y=1, z=2; C: x=1, z=2
    val a = Seq(("x", 0.9), ("y", 0.5)).toDF("id", "s")
    val b = Seq(("y", 3.0), ("z", 2.0)).toDF("id", "s")
    val c = Seq(("x", 7.0), ("z", 1.0)).toDF("id", "s")
    val got = TextSearch.rrfFuse(Seq(a -> "s", b -> "s", c -> "s"), "id",
        kRrf = 60)
      .collect().map(r => (r.getString(0),
        (1 to 3).map(i => Option(r.get(i)).map(_.asInstanceOf[Long])),
        r.getDouble(4))).toList
    val x = 1.0 / 61 + 1.0 / 61          // rank 1 in A and C
    val y = 1.0 / 62 + 1.0 / 61          // rank 2 in A, rank 1 in B
    val z = 1.0 / 62 + 1.0 / 62          // rank 2 in B and C
    assert(got.map(_._1) === List("x", "y", "z"))
    assert(got(0)._2 === Seq(Some(1L), None, Some(1L)))
    assert(got(1)._2 === Seq(Some(2L), Some(1L), None))
    assert(got(2)._2 === Seq(None, Some(2L), Some(2L)))
    assert(math.abs(got(0)._3 - x) < 1e-15)
    assert(math.abs(got(1)._3 - y) < 1e-15)
    assert(math.abs(got(2)._3 - z) < 1e-15)
  }

  test("bm25Indexed: saved-index ranking identical to the scan path") {
    import spark.implicits._
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_text_idx").toString
    try {
      TextSearch.buildIndex(docs, "doc_id", "text", dir, nBuckets = 8)
      val scan = TextSearch.bm25(docs, "doc_id", "text",
          Seq("spark", "vector", "query"), k = 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
      val probed = TextSearch.bm25Indexed(spark, dir,
          Seq("spark", "vector", "query"), k = 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
      assert(probed === scan && scan.nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("appendIndex: incremental ingest answers the full-corpus scan " +
       "ranking; sidecar scalars recombine exactly") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val dirA = java.nio.file.Files
      .createTempDirectory("graft_text_idx_app").toString
    val dirF = java.nio.file.Files
      .createTempDirectory("graft_text_idx_full").toString
    try {
      TextSearch.buildIndex(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", dirA, nBuckets = 8)
      TextSearch.appendIndex(docs.filter(col("doc_id") % 2 =!= 0),
        "text", dirA)
      val scan = TextSearch.bm25(docs, "doc_id", "text",
          Seq("spark", "vector", "query"), k = 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
      val probed = TextSearch.bm25Indexed(spark, dirA,
          Seq("spark", "vector", "query"), k = 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
      assert(probed === scan && scan.nonEmpty)
      // the appended sidecar is BIT-identical to a full build's (integer
      // token sums recombine exactly — no float drift across ingests)
      TextSearch.buildIndex(docs, "doc_id", "text", dirF, nBuckets = 8)
      val ma = TextSearch.TextIndexMeta.read(spark, dirA).get
      val mf = TextSearch.TextIndexMeta.read(spark, dirF).get
      assert(ma === mf)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dirA))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dirF))
    }
  }

  test("deleteFromIndex: probe equals an index REBUILT on survivors " +
       "(df, N, avgdl all shrink); idempotent") {
    import spark.implicits._
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val dirD = java.nio.file.Files
      .createTempDirectory("graft_text_idx_del").toString
    val dirR = java.nio.file.Files
      .createTempDirectory("graft_text_idx_reb").toString
    try {
      TextSearch.buildIndex(docs, "doc_id", "text", dirD, nBuckets = 8)
      val victims = docs.filter(col("doc_id") % 2 =!= 0).select("doc_id")
      TextSearch.deleteFromIndex(spark, dirD, victims)
      // repeat + absent ids: no double-subtraction, no error
      TextSearch.deleteFromIndex(spark, dirD,
        Seq(1L, 3L, 999999L).toDF("doc_id"))
      TextSearch.buildIndex(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", dirR, nBuckets = 8)
      def top(d: String) = TextSearch.bm25Indexed(spark, d,
          Seq("spark", "vector", "query"), k = 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
      assert(top(dirD) === top(dirR) && top(dirR).nonEmpty)
      // sidecar scalars equal the rebuilt index's exactly
      val md = TextSearch.TextIndexMeta.read(spark, dirD).get
      val mr = TextSearch.TextIndexMeta.read(spark, dirR).get
      assert(md.nDocs == mr.nDocs && md.sumDl == mr.sumDl &&
        md.avgdl == mr.avgdl)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dirD))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dirR))
    }
  }

  test("compactIndex: tombstones applied physically, one file per " +
       "bucket, probe result bit-identical") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_text_idx_cpt").toString
    try {
      TextSearch.buildIndex(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", dir, nBuckets = 8)
      TextSearch.appendIndex(docs.filter(col("doc_id") % 2 =!= 0),
        "text", dir)
      TextSearch.deleteFromIndex(spark, dir,
        docs.filter(col("doc_id") % 2 =!= 0).select("doc_id"))
      def top() = TextSearch.bm25Indexed(spark, dir,
          Seq("spark", "vector", "query"), k = 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
      val before = top()
      val metaBefore = TextSearch.TextIndexMeta.read(spark, dir).get
      TextSearch.compactIndex(spark, dir)
      assert(top() === before && before.nonEmpty)
      // the tombstone directory is gone and no .compacting residue
      val root = new java.io.File(dir)
      assert(!root.listFiles().exists(
        _.getName == TextSearch.TextTombstoneDir))
      assert(!new java.io.File(dir + ".compacting").exists())
      // every bucket dir collapsed to exactly one data file (append had
      // left at least two), and no tombstoned doc's postings remain
      val buckets = root.listFiles().filter(
        _.getName.startsWith(TextSearch.BucketCol + "="))
      assert(buckets.nonEmpty)
      buckets.foreach { b =>
        assert(b.listFiles().count(_.getName.endsWith(".parquet")) == 1,
          s"bucket ${b.getName} not merged to one file")
      }
      assert(spark.read.parquet(dir)
        .filter(col("doc_id") % 2 =!= 0).isEmpty)
      // sidecar untouched: the scalars were already exact
      val metaAfter = TextSearch.TextIndexMeta.read(spark, dir).get
      assert(metaAfter === metaBefore)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("appendIndex refuses a sidecar without the exact token sum") {
    import spark.implicits._
    val docs = corpus.toDF("id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_text_idx_old").toString
    try {
      TextSearch.buildIndex(docs, "id", "text", dir, nBuckets = 4)
      val meta = TextSearch.TextIndexMeta.read(spark, dir).get
      TextSearch.TextIndexMeta.write(spark, dir, meta.copy(sumDl = None))
      val e = intercept[IllegalArgumentException] {
        TextSearch.appendIndex(docs.limit(1), "text", dir)
      }
      assert(e.getMessage.contains("rebuild"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("bm25Indexed probe prunes to the query terms' buckets (plan audit)") {
    import spark.implicits._
    val docs = corpus.toDF("id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_text_idx").toString
    try {
      TextSearch.buildIndex(docs, "id", "text", dir, nBuckets = 8)
      val q = TextSearch.bm25Indexed(spark, dir, Seq("spark"), k = 5)
      val physical = q.queryExecution.executedPlan.toString
      // the bucket predicate must reach the scan's PartitionFilters (only
      // the matching bucket directories are listed/read) and the term
      // predicate the row-group PushedFilters — both named in the scan
      // node, not applied post-hoc above it
      assert(physical.contains("PartitionFilters") &&
        physical.contains(TextSearch.BucketCol), physical)
      // single-term isin folds to EqualTo; either form must be PUSHED
      assert(physical.contains("PushedFilters") &&
        (physical.contains("In(__term") ||
          physical.contains("EqualTo(__term")), physical)
      // and the pruned probe still scores correctly
      val got = q.collect().map(_.getLong(0)).toList
      assert(got === TextSearch.bm25(docs, "id", "text", Seq("spark"), k = 5)
        .collect().map(_.getLong(0)).toList)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("bm25 postings filter lands before the aggregation (plan audit)") {
    import spark.implicits._
    val docs = corpus.toDF("id", "text")
    val plan = TextSearch.bm25(docs, "id", "text", Seq("spark"), k = 5)
      .queryExecution.optimizedPlan.toString
    // the term filter must appear under the first aggregate, not above it
    assert(plan.contains("__term"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("phraseSearch: overlapping occurrences count, boundary substrings don't") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"),          // "a a" occurs at pos 1 and 2 (overlap)
      (2L, "concat dogma x y"), // substring "cat dog" but NOT token-consecutive
      (3L, "cat dog runs"),
      (4L, "no match here")).toDF("id", "text")
    val aa = TextSearch.phraseSearch(docs, "id", "text", Seq("a", "a"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(aa.toSeq == Seq((1L, 2L, 1L)))
    val cd = TextSearch.phraseSearch(docs, "id", "text",
        Seq("cat", "dog"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cd.toSeq == Seq((3L, 1L, 1L))) // doc 2's prefilter hit is rejected
  }

  test("proximitySearch: distance window and ordering") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha x beta"),        // dist 2
      (2L, "alpha beta"),          // dist 1
      (3L, "alpha x x x x beta"),  // dist 5 > maxDist
      (4L, "beta y alpha y beta")  // dists 2 and 2 -> two pairs
    ).toDF("id", "text")
    val out = TextSearch.proximitySearch(docs, "id", "text",
        "alpha", "beta", maxDist = 3, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // min_dist asc, then n_pairs desc, then id
    assert(out.toSeq == Seq((2L, 1L, 1L), (4L, 2L, 2L), (1L, 1L, 2L)))
  }
}

package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CompactSwap, Dedup, TextSearch}

/** The crash-recovery contract of every at-rest compactor (the r14
  * verdict's "What's wrong #2"): a compact that dies BETWEEN deleting
  * old bucket dirs and renaming the staged ones in leaves the only
  * copy of most buckets inside the `.compacting` staging dir — and the
  * natural recovery action is to re-run the compact verb. Before the
  * CompactSwap commit-marker protocol, that re-run's first statement
  * was `fs.delete(staging)`: it destroyed the only copy and then
  * "compacted" the partial survivors. These specs drive CompactSwap's
  * own steps to the worst crash point (marker written, every old
  * bucket dir deleted, only one staged dir renamed in), assert fsck
  * flags the residue, re-run the public compact verb, and assert the
  * probe answers equal a from-scratch rebuild over the survivors —
  * which fails under the old delete-first behavior because whole
  * buckets vanish. */
class CompactCrashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Reproduce the widest mid-swap crash window using the same steps
    * the compactors run: stage `live`, write the commit marker, delete
    * EVERY old bucket dir, rename exactly one staged dir in, "crash". */
  private def crashMidSwap(live: DataFrame, root: Path,
                           bucketCol: String): Unit = {
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = CompactSwap.stagingPath(root)
    CompactSwap.stage(live, bucketCol, tmp)
    val staged = CompactSwap.stagedNames(fs, tmp, bucketCol + "=")
    assert(staged.size >= 2, s"fixture too small: ${staged.size} buckets")
    CompactSwap.writeMarker(fs, root, staged)
    fs.listStatus(root).foreach { st =>
      if (st.getPath.getName.startsWith(bucketCol + "="))
        fs.delete(st.getPath, true)
    }
    fs.rename(new Path(tmp, staged.head), new Path(root, staged.head))
  }

  private def fsckRow(fsck: DataFrame, chk: String): (Boolean, Long) = {
    val r = fsck.filter(col("chk") === chk).collect()
    assert(r.length == 1, s"$chk rows: ${r.length}")
    (r(0).getBoolean(1), r(0).getLong(2))
  }

  test("text index: compact re-run after a mid-swap crash resumes from " +
       "the marker — no bucket is lost; fsck flags the residue") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_text_crash").toString + "/idx"
    try {
      TextSearch.buildIndex(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", dir, nBuckets = 8)
      TextSearch.appendIndex(docs.filter(col("doc_id") % 2 =!= 0),
        "text", dir)
      TextSearch.deleteFromIndex(spark, dir,
        docs.filter(col("doc_id") % 3 === 0).select("doc_id"))
      def top() = TextSearch.bm25Indexed(spark, dir,
          Seq("spark", "vector", "query"), k = 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
      val before = top()
      assert(before.nonEmpty)
      val root = new Path(dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // the live view exactly as compactIndex computes it
      val tomb = spark.read.parquet(s"$dir/${TextSearch.TextTombstoneDir}")
      val live = spark.read.parquet(dir)
        .join(tomb, Seq("doc_id"), "left_anti").localCheckpoint()
      crashMidSwap(live, root, TextSearch.BucketCol)
      // fsck diagnoses the crashed swap instead of trusting the layout
      val (ok, detail) = fsckRow(TextSearch.fsckIndex(spark, dir),
        "no_compact_residue")
      assert(!ok && detail == 2L,
        "fsck must flag marker + staging residue")
      // the recovery action: re-run the compact verb. Under the old
      // delete-first code this destroys every un-renamed bucket.
      TextSearch.compactIndex(spark, dir)
      assert(top() === before,
        "probe after crash + re-run must equal the pre-crash answers")
      assert(CompactSwap.residue(fs, root) == 0L)
      val fsckAfter = TextSearch.fsckIndex(spark, dir)
      assert(fsckAfter.filter(!col("ok")).isEmpty,
        "fsck must be all-green after recovery")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
    }
  }

  test("vector index: compactSaved re-run after a mid-swap crash " +
       "resumes — serving equals the pre-crash answers") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val df = (0L until 200L).map(i =>
      (i, Seq.fill(16)(rnd.nextDouble()))).toDF("id", "vec")
    val base = java.nio.file.Files
      .createTempDirectory("graft_vi_crash").toString
    val path = base + "/idx"
    try {
      VectorIndex.create(df.filter(col("id") < 150), "vec", "id",
        dim = 16, nlist = 8).save(path)
      VectorIndex.appendSaved(spark, path, df.filter(col("id") >= 150))
      VectorIndex.deleteSaved(spark, path,
        df.filter(col("id") % 3 === 0).select("id"))
      val q = Seq.fill(16)(0.5)
      def ids() = VectorIndex.load(spark, path).annSearchPqExact(q, 7)
        .select("id").collect().map(_.getLong(0)).toSeq
      val before = ids()
      assert(before.nonEmpty)
      val root = new Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tomb = spark.read.parquet(s"$path/${VectorIndex.TombstoneDir}")
      val live = spark.read.parquet(path)
        .join(tomb.select("id"), Seq("id"), "left_anti").localCheckpoint()
      crashMidSwap(live, root, "list_id")
      val (ok, detail) = fsckRow(VectorIndex.fsckSaved(spark, path),
        "no_compact_residue")
      assert(!ok && detail == 2L)
      VectorIndex.compactSaved(spark, path)
      assert(ids() === before,
        "serving after crash + re-run must equal the pre-crash answers")
      assert(CompactSwap.residue(fs, root) == 0L)
      assert(VectorIndex.fsckSaved(spark, path).filter(!col("ok")).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("LSH ref index: compactRefIndex re-run after a mid-swap crash in " +
       "the bands relation resumes — probe equals rebuild-on-survivors") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_lsh_crash").toString
    val idx = s"$tmp/idx"
    try {
      val ref = docs.filter(col("doc_id") % 5 === 0)
      val fresh = docs.filter(col("doc_id") % 5 =!= 0)
      Dedup.buildRefIndex(ref, "doc_id", "text", idx, nBuckets = 8)
      Dedup.deleteFromRefIndex(spark, idx,
        ref.filter(col("doc_id") % 10 === 0).select("doc_id"))
      val survivors = ref.filter(col("doc_id") % 10 =!= 0)
      def probe() = Dedup.minhashAgainstIndex(fresh, idx, "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toList
      val want = Dedup.minhashAgainst(fresh, survivors, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toList
      assert(probe() === want && want.nonEmpty)
      val bRoot = new Path(s"$idx/${Dedup.LshBandsDir}")
      val fs = bRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // live bands exactly as compactRelation computes them
      val tomb = spark.read.parquet(s"$idx/${Dedup.LshTombstoneDir}")
      val liveBands = spark.read.parquet(bRoot.toString)
        .join(tomb, Seq("__rid"), "left_anti").distinct().localCheckpoint()
      crashMidSwap(liveBands, bRoot, Dedup.LshBandBucketCol)
      val (ok, detail) = fsckRow(Dedup.fsckRefIndex(spark, idx),
        "no_compact_residue")
      assert(!ok && detail == 2L)
      Dedup.compactRefIndex(spark, idx)
      assert(probe() === want,
        "probe after crash + re-run must equal rebuild-on-survivors")
      assert(CompactSwap.residue(fs, bRoot) == 0L)
      assert(Dedup.fsckRefIndex(spark, idx).filter(!col("ok")).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("grid layout: compactSaved re-run after a mid-swap crash resumes " +
       "from the marker at FILE granularity — no part-file is lost") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    val df = (0L until 300L).map(i =>
      (i, Seq.fill(2)(rnd.nextDouble() * 100))).toDF("id", "vec")
    val base = java.nio.file.Files
      .createTempDirectory("graft_grid_crash").toString
    val path = base + "/idx"
    try {
      VectorIndex.create(df.filter(col("id") % 2 === 0), "vec", "id",
        dim = 2, cellsPerDim = 6).save(path)
      VectorIndex.appendSaved(spark, path,
        df.filter(col("id") % 2 =!= 0))
      VectorIndex.deleteSaved(spark, path,
        df.filter(col("id") % 3 === 0).select("id"))
      def probe() = VectorIndex.load(spark, path)
        .rangeSearch(Seq(50.0, 50.0), 30.0)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      val before = probe()
      assert(before.nonEmpty)
      val root = new Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // the mid-swap crash state at file granularity: staged rewrite
      // committed, marker written, every old part-file deleted, one
      // staged file renamed in
      val tomb = spark.read.parquet(s"$path/${VectorIndex.TombstoneDir}")
      val live = spark.read.parquet(path)
        .join(tomb.select("id"), Seq("id"), "left_anti")
        .localCheckpoint()
      val tmp = CompactSwap.stagingPath(root)
      live.repartitionByRange(4, col("cell_id"))
        .sortWithinPartitions(col("cell_id"))
        .write.mode("overwrite").parquet(tmp.toString)
      val staged = CompactSwap.stagedNames(fs, tmp, "part-")
      assert(staged.size >= 2)
      CompactSwap.writeMarker(fs, root, staged)
      fs.listStatus(root).foreach { st =>
        if (st.getPath.getName.startsWith("part-"))
          fs.delete(st.getPath, false)
      }
      fs.rename(new Path(tmp, staged.head), new Path(root, staged.head))
      val (ok, detail) = fsckRow(VectorIndex.fsckSaved(spark, path),
        "no_compact_residue")
      assert(!ok && detail == 2L)
      VectorIndex.compactSaved(spark, path)
      assert(probe() === before,
        "probe after crash + re-run must equal the pre-crash answers")
      assert(CompactSwap.residue(fs, root) == 0L)
      val after = VectorIndex.fsckSaved(spark, path)
      assert(after.filter(!col("ok")).isEmpty)
      // tombstones applied physically and the dir gone
      assert(!fs.exists(new Path(path, VectorIndex.TombstoneDir)))
      assert(spark.read.parquet(path).filter(col("id") % 3 === 0).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("fsck of a missing LSH relation dir reports a failing check row " +
       "instead of throwing (partial-copy diagnosis)") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
      .limit(50)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_lsh_partial").toString
    val idx = s"$tmp/idx"
    try {
      Dedup.buildRefIndex(docs, "doc_id", "text", idx, nBuckets = 8)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$idx/${Dedup.LshShinglesDir}"))
      val rows = Dedup.fsckRefIndex(spark, idx)
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
      assert(rows("shingles_readable") === false)
      assert(rows("meta_parses") === true)
      // short-circuits: no data-derived checks after the broken read
      assert(!rows.contains("bands_complete"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}

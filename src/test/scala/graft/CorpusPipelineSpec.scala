package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusPipeline, SkewJoin}

/** End-to-end corpus preparation + skew-join mitigation specs. */
class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def sf = SparkTestSession.sf0001

  test("prepare: filters compose, near-dups removed, split attached, deterministic") {
    val docs = Tables.load(spark, sf, "documents")
    val out = CorpusPipeline.prepare(docs, "doc_id", "text").persist()
    val n = docs.count()
    val kept = out.count()
    assert(kept > 0 && kept <= n)
    // near-dup removal actually fired (testdata plants near-duplicates)
    assert(kept < n)
    // survivors have no verified near-dup pair among themselves
    val residual = operators.Dedup.ngramJaccardPairs(
      out.select(col("doc_id"), col("text")), "doc_id", "text", 3, 0.5)
    assert(residual.isEmpty)
    // split column present and stable across a rerun
    assert(out.select(col("split")).distinct().count() <= 3)
    val again = CorpusPipeline.prepare(docs.repartition(13), "doc_id", "text")
    assert(out.select(col("doc_id"), col("split"))
      .except(again.select(col("doc_id"), col("split"))).isEmpty)
    out.unpersist()
  }

  test("prepareTraining: all gates fire, decontaminated, packed, deterministic") {
    import graft.operators.{Sampling, TextAnalysis}
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val eval = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text"))
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    val weights = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    def run() = CorpusPipeline.prepareTraining(train, "doc_id", "text",
      evalDocs = Some(eval), sourceWeights = weights,
      packBudget = 512, packShards = 2)
    val out = run()
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty && ids.size < train.count())
    // 1. decontamination is effective: no survivor shares an 8-gram
    //    with the eval set
    val leak = TextAnalysis.decontaminate(
      out.select(col("doc_id"), col("text")), eval, "doc_id")
    assert(leak.isEmpty, "surviving docs must have no eval 8-gram overlap")
    // 2. mixing restricted sources to the recipe
    val srcs = out.select("source").distinct()
      .collect().map(_.getString(0)).toSet
    assert(srcs.subsetOf(weights.keySet))
    // 3. packing covers exactly the train split, offsets inside budget,
    //    no bin exceeds budget + its own largest doc
    val trainRows = out.filter(col("split") === "train")
    assert(trainRows.filter(col("bin").isNull).isEmpty)
    assert(out.filter(col("split") =!= "train" && col("bin").isNotNull)
      .isEmpty)
    assert(trainRows.filter(col("offset_in_bin") < 0 ||
      col("offset_in_bin") >= 512).isEmpty)
    val maxDoc = trainRows.agg(max(col("n_tokens"))).head().getLong(0)
    val worst = trainRows.groupBy(col("shard"), col("bin"))
      .agg(sum(col("n_tokens")).as("s")).agg(max(col("s")))
      .head().getLong(0)
    assert(worst < 512 + maxDoc)
    // 4. deterministic: a rerun reproduces the exact relation
    val again = run()
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    out.unpersist(); again.unpersist()
  }

  test("prepareTraining(chunkDedupTokens): boilerplate chunks deduped, " +
       "rewritten text feeds packing, all-boilerplate docs drop") {
    import spark.implicits._
    // 3-token chunk window. Docs 1-3 share the boilerplate chunk; doc 4
    // is NOTHING BUT that chunk; doc 5 is unrelated. Texts are built to
    // pass the quality gate (>= 5 tokens, no repetition-gate trips) and
    // to not be near-dups of each other once the boilerplate is gone.
    val bp = "all rights reserved"
    val docs = Seq(
      (1L, s"$bp alpha beta gamma delta one", "src0"),
      (2L, s"$bp epsilon zeta etaa theta two", "src0"),
      (3L, s"$bp iota kappa lambda mu three", "src0"),
      (4L, bp, "src0"),
      (5L, "totally unrelated words here flow five", "src0"))
      .toDF("doc_id", "text", "source")
    // repetition gate opened wide: doc 4's 3-token text would trip the
    // top-bigram gate before ever reaching the chunk stage, muddying the
    // attribution this test is about
    val out = CorpusPipeline.prepareTraining(docs, "doc_id", "text",
      chunkDedupTokens = Some(3), packShards = 1, minTokens = 1,
      maxDupWordFrac = 1.0, maxTopBigramFrac = 1.0)
    val texts = out.select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 (smallest id) keeps the boilerplate; 2 and 3 lose that chunk
    assert(texts(1L) == s"$bp alpha beta gamma delta one")
    assert(texts(2L) == "epsilon zeta etaa theta two")
    assert(texts(3L) == "iota kappa lambda mu three")
    // doc 4 lost its only chunk → dropped from the corpus entirely
    assert(!texts.contains(4L))
    assert(texts.contains(5L))
    // packing token counts reflect the REWRITTEN text (5 tokens, not 8)
    val toks = out.filter(col("split") === "train")
      .select(col("doc_id"), col("n_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    toks.get(2L).foreach(n => assert(n == 5L))
    toks.get(3L).foreach(n => assert(n == 5L))
    // default off: the stage must not fire without the parameter
    val off = CorpusPipeline.prepareTraining(docs, "doc_id", "text",
      packShards = 1, minTokens = 1,
      maxDupWordFrac = 1.0, maxTopBigramFrac = 1.0)
    val offTexts = off.select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(offTexts(2L) == s"$bp epsilon zeta etaa theta two")
    assert(offTexts.contains(4L))
    out.unpersist(); off.unpersist()
  }

  test("prepareTraining(spanScrubTokens): duplicated spans deleted from " +
       "EVERY copy, scrubbed text feeds packing, all-span docs drop") {
    import spark.implicits._
    // 3-token spans. Docs 1 and 2 share one; doc 3 is nothing but a
    // span doc 4 also carries; doc 5 is clean. Unlike chunk dedup, NO
    // copy of a duplicated span survives.
    val sp = "click here now"
    val docs = Seq(
      (1L, s"$sp alpha beta gamma delta one", "src0"),
      (2L, s"$sp epsilon zeta etaa theta two", "src0"),
      (3L, sp, "src0"),
      (4L, s"$sp iota kappa lambda mu three", "src0"),
      (5L, "totally unrelated words here flow five", "src0"))
      .toDF("doc_id", "text", "source")
    val out = CorpusPipeline.prepareTraining(docs, "doc_id", "text",
      spanScrubTokens = Some(3), packShards = 1, minTokens = 1,
      maxDupWordFrac = 1.0, maxTopBigramFrac = 1.0)
    val texts = out.select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every copy of the span is gone — including doc 1's
    assert(texts(1L) == "alpha beta gamma delta one")
    assert(texts(2L) == "epsilon zeta etaa theta two")
    assert(texts(4L) == "iota kappa lambda mu three")
    // doc 3 was scrubbed to nothing → dropped
    assert(!texts.contains(3L))
    assert(texts.contains(5L))
    // packing token counts reflect the scrubbed text
    val toks = out.filter(col("split") === "train")
      .select(col("doc_id"), col("n_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    toks.get(1L).foreach(n => assert(n == 5L))
    toks.get(2L).foreach(n => assert(n == 5L))
    out.unpersist()
  }

  test("prepareTraining(embeddings): semantic stage thins the corpus, " +
       "unreachable threshold degrades to the text-only pipeline") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val emb = Tables.load(spark, SparkTestSession.sf0001, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    def ids(minCos: Double) = CorpusPipeline.prepareTraining(
        train, "doc_id", "text", embeddings = Some(emb),
        semanticMinCosine = minCos, packShards = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val without = CorpusPipeline.prepareTraining(
        train, "doc_id", "text", packShards = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // cosine is bounded by 1: a threshold above it makes the stage a
    // provable no-op, so the composed pipeline equals the text-only one
    assert(ids(1.1) == without)
    // at the declared threshold the stage actually fires and only
    // removes docs (never adds)
    val sem = ids(0.3)
    assert(sem.subsetOf(without) && sem.size < without.size)
  }

  test("scoped pipeline leaves ZERO persistent RDDs behind (localCheckpoint " +
       "blocks reclaimed, not left to the ContextCleaner)") {
    // The round-10 official bench died at exit 137: checkpoint blocks are
    // invisible to the SQL cacheManager and accumulate in a long-lived
    // session. CacheScope.registerCheckpoint is the engine-side fix —
    // this drives the FULL pipeline (every checkpoint site: stage cuts,
    // decontamination, chunk/span rewrites, CC rounds, semantic stage)
    // and asserts the session is block-clean afterwards.
    val sc = spark.sparkContext
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val eval = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text"))
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    val emb = Tables.load(spark, SparkTestSession.sf0001, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val before = sc.getPersistentRDDs.keySet
    val out = CorpusPipeline.prepareTraining(train, "doc_id", "text",
      evalDocs = Some(eval), chunkDedupTokens = Some(8),
      spanScrubTokens = Some(8), embeddings = Some(emb),
      collapseComponents = true, packShards = 2)
    assert(out.count() > 0)
    out.unpersist(blocking = true)
    val leaked = sc.getPersistentRDDs.filter { case (id, _) =>
      !before.contains(id) }
    assert(leaked.isEmpty, "leaked RDD blocks after a scoped pipeline: " +
      leaked.values.map(r => s"id=${r.id} ${r.name} ${r.getStorageLevel}")
        .mkString("; "))
  }

  test("connectedComponents: empty pair table yields empty labels, no NPE") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(operators.Dedup.connectedComponents(none).count() == 0)
    // end-to-end: component collapse on a corpus with no near-dups
    val clean = (0 until 6)
      .map(i => (i.toLong, s"totally distinct text number $i about topic $i"))
      .toDF("doc_id", "text")
    val out = CorpusPipeline.prepare(clean, "doc_id", "text",
      collapseComponents = true)
    assert(out.count() == 6)
  }

  test("connectedComponents: min-id representative per component") {
    import spark.implicits._
    // components: {1,2,3,4} as a chain, {10,11}, singleton edges only
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a", "b")
    val got = operators.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: 300-hop chain converges in O(log) rounds") {
    import spark.implicits._
    // Worst-case diameter: a single path 0-1-2-...-300. Plain min
    // propagation needs 300 rounds (over the 50-round cap); pointer
    // jumping needs ~log2(300) ≈ 9.
    val chain = (0 until 300).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    val got = operators.Dedup.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 301)
    assert(got.forall(_._2 == 0L), "every node must reach the chain min")
  }

  test("connectedComponents: reliable checkpoint dir gives identical " +
       "labels and writes real checkpoint files") {
    import spark.implicits._
    // The executor-loss-safe path for multi-hour corpus jobs: same plan,
    // same convergence, labels checkpointed to storage instead of
    // executor-local blocks.
    val pairs = (Seq((1L, 2L), (2L, 3L), (10L, 11L)) ++
      (20 until 60).map(i => (i.toLong, i + 1L))).toDF("a", "b")
    val local = operators.Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_ccckpt")
    val prevDir = spark.sparkContext.getCheckpointDir
    try {
      val reliable = operators.Dedup.connectedComponents(pairs,
          checkpointDir = Some(dir.toString))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(reliable == local)
      // files actually landed on reliable storage (not executor blocks)
      def anyFile(f: java.io.File): Boolean =
        f.isFile || Option(f.listFiles).exists(_.exists(anyFile))
      assert(anyFile(dir.toFile),
        "reliable path must write checkpoint files under the given dir")
      // zero session-global mutation: the implementation must not touch
      // SparkContext.setCheckpointDir (which would also nest a UUID
      // subdir under any pre-existing session dir per call)
      assert(spark.sparkContext.getCheckpointDir == prevDir,
        "connectedComponents must leave the session checkpoint dir alone")
    } finally prevDir.foreach(spark.sparkContext.setCheckpointDir)
  }

  test("prepareWithEmbeddings leaves no intermediate caches behind") {
    import spark.implicits._
    // VERDICT r4 hygiene ask: a completed call must not leak input-sized
    // persists into a long-lived session; the only cache left is the
    // returned (already materialized) corpus, owned by the caller.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val docs = (1L to 30L)
      .map(i => (i, (1 to 12).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val emb = (1L to 30L)
      .map(i => (i, Seq(math.cos(i.toDouble), math.sin(i.toDouble), 0.1 * i)))
      .toDF("vec_id", "embedding")
    val out = CorpusPipeline.prepareWithEmbeddings(docs, "doc_id", "text",
      emb, "vec_id", "embedding", nlist = 2, minCosine = 0.999)
    assert(out.count() == 30)
    out.unpersist(blocking = true)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }

  test("collapseComponents: one survivor per near-dup component") {
    import spark.implicits._
    // d3 overlaps d1 and d2 (J ≈ 10/22 each); d1 and d2 share nothing.
    // Pair graph: 1~3, 2~3. Per-edge removal keeps BOTH local minima
    // {1, 2} (they are not near-dups of each other); component collapse
    // keeps only the component min {1}.
    val xs = (1 to 12).map(i => s"x$i").mkString(" ")
    val ys = (1 to 12).map(i => s"y$i").mkString(" ")
    val docs = Seq((1L, xs), (2L, ys), (3L, s"$xs $ys"))
      .toDF("doc_id", "text")
    def surviving(collapse: Boolean): Set[Long] =
      CorpusPipeline.prepare(docs, "doc_id", "text",
          minJaccard = 0.4, minhashK = 32, collapseComponents = collapse)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surviving(collapse = false) == Set(1L, 2L))
    assert(surviving(collapse = true) == Set(1L))
  }

  test("prepareWithEmbeddings: semantic stage drops paraphrases text dedup keeps") {
    import spark.implicits._
    // Docs 1 and 2 share NO vocabulary (text dedup keeps both) but have
    // near-identical embeddings (a paraphrase pair); doc 3 is semantically
    // far from both. Rows without an embedding (doc 4) pass through.
    val t1 = (1 to 12).map(i => s"a$i").mkString(" ")
    val t2 = (1 to 12).map(i => s"b$i").mkString(" ")
    val t3 = (1 to 12).map(i => s"c$i").mkString(" ")
    val t4 = (1 to 12).map(i => s"d$i").mkString(" ")
    val docs = Seq((1L, t1), (2L, t2), (3L, t3), (4L, t4))
      .toDF("doc_id", "text")
    val emb = Seq(
      (1L, Seq(1.0, 0.01, 0.0)),
      (2L, Seq(1.0, 0.0, 0.01)), // cos(1,2) ~ 0.9999
      (3L, Seq(0.0, 1.0, 0.0)))  // orthogonal to both
      .toDF("vec_id", "embedding")
    val out = CorpusPipeline.prepareWithEmbeddings(docs, "doc_id", "text",
        emb, "vec_id", "embedding", nlist = 2, minCosine = 0.97)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // text stages keep all 4; semantic stage drops only doc 2 (larger id
    // of the paraphrase pair); docs 3 and the embedding-less 4 survive
    assert(out == Set(1L, 3L, 4L), s"got $out")
  }

  test("prepareWithEmbeddings: no overlapping embeddings degrades to text-only") {
    import spark.implicits._
    // Contract guard: with zero usable embeddings the semantic stage must
    // be a no-op (zero centroids used to throw at analysis), not a crash.
    val docs = Seq((1L, (1 to 12).map(i => s"a$i").mkString(" ")))
      .toDF("doc_id", "text")
    val emb = Seq((99L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val out = CorpusPipeline.prepareWithEmbeddings(docs, "doc_id", "text",
        emb, "vec_id", "embedding", nlist = 2, minCosine = 0.97)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L))
  }

  test("salted join == plain join, with the key salted nSalts ways") {
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val customer = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val salted = SkewJoin.saltedInner(orders, customer, "o_custkey", 4)
    val plain = orders.join(customer, Seq("o_custkey"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    assert(salted.count() == plain.count())
  }
}

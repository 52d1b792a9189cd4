package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, Sampling, TextAnalysis}

/** Specs for the training-pipeline operators added in round 2: as-of join
  * (vs a naive range-join + argmax oracle), deterministic sampling, and
  * tf-idf term summaries. */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def sf = SparkTestSession.sf0001

  test("asof backward == naive range-join argmax (incl. equal-ts inclusivity)") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", "2024-01-01 10:00:00"),
      (2L, "u1", "2024-01-01 11:00:00"),
      (3L, "u2", "2024-01-01 09:30:00"),
      (4L, "u3", "2024-01-01 12:00:00")) // u3 has no state rows at all
      .toDF("eid", "k", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq(
      (10L, "u1", "2024-01-01 09:00:00", 1.0),
      (11L, "u1", "2024-01-01 11:00:00", 2.0), // equal-ts: must match eid=2
      (12L, "u1", "2024-01-01 11:00:00", 3.0), // tie: greatest rid wins
      (13L, "u2", "2024-01-01 09:45:00", 4.0)) // after u2's event: no match
      .toDF("rid", "k", "rts", "v")
      .withColumn("rts", col("rts").cast("timestamp"))

    val got = AsOfJoin.backward(left, right, "k", "ts", "rts",
        Seq("rid", "v"), "rid")
      .orderBy(col("eid"))
      .select(col("eid"), col("rid"), col("v"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))

    assert(got.toSeq == Seq((1L, 10L), (2L, 12L), (3L, -1L), (4L, -1L)))
  }

  test("asof on testdata == per-row argmax oracle") {
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_custkey").as("user_id"), col("o_orderkey"),
        col("o_orderdate").cast("timestamp").as("o_ts"))
    val fast = AsOfJoin.backward(e, o, "user_id", "ts", "o_ts",
      Seq("o_orderkey"), "o_orderkey")
    // naive oracle: range join then max-(ts, key) per event
    val joined = e.join(o, Seq("user_id"), "left")
      .filter(col("o_ts") <= col("ts") || col("o_ts").isNull)
      .groupBy(col("event_id"))
      .agg(max(struct(col("o_ts"), col("o_orderkey"))).as("m"))
      .select(col("event_id"), col("m.o_orderkey").as("o_orderkey"))
    val naive = e.select(col("event_id")).join(joined, Seq("event_id"), "left")
    assert(fast.select(col("event_id"), col("o_orderkey"))
      .except(naive).isEmpty)
    assert(naive.except(
      fast.select(col("event_id"), col("o_orderkey"))).isEmpty)
    assert(fast.count() == e.count()) // every left row survives
  }

  test("hash split is deterministic, partition-independent, ~80/10/10") {
    val docs = Tables.load(spark, sf, "documents")
    val s1 = Sampling.trainValTest(docs, "doc_id")
    val s2 = Sampling.trainValTest(docs.repartition(7), "doc_id")
    // identical assignment regardless of physical layout
    assert(s1.select(col("doc_id"), col("split"))
      .except(s2.select(col("doc_id"), col("split"))).isEmpty)
    val counts = s1.groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9)
    assert(counts.values.sum == n)
  }

  test("groupAwareSplit: no near-dup pair straddles splits; singletons " +
      "match trainValTest") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val pairs = graft.operators.Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", n = 3, minJaccard = 0.5)
    val out = Sampling.groupAwareSplit(docs, "doc_id", pairs).persist()
    assert(out.count() == docs.count()) // one row per doc, rep attached
    // leakage check: every pair's two sides share a split
    val sides = pairs.select(col("a"), col("b"))
      .join(out.select(col("doc_id").as("a"), col("split").as("sa")), Seq("a"))
      .join(out.select(col("doc_id").as("b"), col("split").as("sb")), Seq("b"))
    assert(sides.filter(col("sa") =!= col("sb")).count() == 0)
    // the fixture's planted near-dups actually exercise the clustering
    assert(out.filter(col("rep") =!= col("doc_id")).count() > 0)
    // docs in no pair split exactly as the per-doc hash split would
    val paired = pairs.select(col("a").as("doc_id"))
      .union(pairs.select(col("b").as("doc_id"))).distinct()
    val single = out.join(paired, Seq("doc_id"), "left_anti")
    val base = Sampling.trainValTest(docs, "doc_id")
      .select(col("doc_id"), col("split"))
    assert(single.select(col("doc_id"), col("split")).except(base).isEmpty)
    // hand-planted chain: pairs (1,2),(2,3) → one cluster, one split,
    // rep = min id — even when the hash of 1, 2, 3 alone would disagree
    val chainDocs = Seq(1L, 2L, 3L, 9L).toDF("id")
    val chainPairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val chain = Sampling.groupAwareSplit(chainDocs, "id", chainPairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(chain(1L)._1 == 1L && chain(2L)._1 == 1L && chain(3L)._1 == 1L)
    assert(Set(chain(1L)._2, chain(2L)._2, chain(3L)._2).size == 1)
    assert(chain(9L)._1 == 9L)
    out.unpersist()
  }

  test("collocations: hand-planted corpus — PMI ranks the bound pair " +
      "above the frequent-but-independent pair") {
    import spark.implicits._
    // "hong kong" always co-occurs (PMI high); "the cat"/"the dog" are
    // frequent but 'the' pairs with everything (PMI ~ 0)
    val docs = (0 until 10).map { i =>
      (i.toLong, "hong kong the cat the dog the fish the bird")
    }.toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, "text", minCount = 5, k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.head._1 == "hong" && got.head._2 == "kong")
    assert(got.head._3 == 10L)
    // exact PMI: 10 tokens/doc → N1 = 100, Nb = 90;
    // c(hong)=c(kong)=10, c12=10
    val expect = math.log((10.0 * 100 * 100) / (90.0 * 10 * 10))
    assert(math.abs(got.head._4 -
      BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
    // every returned pmi is <= the top and counts respect the floor
    assert(got.forall(_._3 >= 5L))
    assert(got.map(_._4).sliding(2).forall(s =>
      s.length < 2 || s(0) >= s(1)))
  }

  test("stratified sample keeps ~fraction per stratum, deterministically") {
    val docs = Tables.load(spark, sf, "documents")
    val a = Sampling.stratifiedSample(docs, "doc_id", "lang", 0.5)
    val b = Sampling.stratifiedSample(docs, "doc_id", "lang", 0.5)
    assert(a.select(col("doc_id")).except(b.select(col("doc_id"))).isEmpty)
    val frac = a.count().toDouble / docs.count()
    assert(frac > 0.35 && frac < 0.65)
  }

  test("weightedSample: edge weights, determinism, ~proportional keep") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    assert(Sampling.weightedSample(docs, "doc_id", lit(0.0)).count() == 0)
    assert(Sampling.weightedSample(docs, "doc_id", lit(1.0)).count()
      == docs.count())
    // weights outside [0,1] clamp instead of misbehaving
    assert(Sampling.weightedSample(docs, "doc_id", lit(7.5)).count()
      == docs.count())
    val half = Sampling.weightedSample(docs, "doc_id", lit(0.5))
    val again = Sampling.weightedSample(docs.repartition(7), "doc_id", lit(0.5))
    assert(half.select("doc_id").except(again.select("doc_id")).isEmpty)
    val frac = half.count().toDouble / docs.count()
    assert(frac > 0.35 && frac < 0.65, s"keep rate $frac")
  }

  test("scrubPii replaces emails, phones, IPs; leaves clean text alone") {
    import spark.implicits._
    val rows = Seq(
      (1L, "reach bob.smith+x@corp.example.co.uk or 555-123-4567 now"),
      (2L, "server at 192.168.0.1 responded"),
      (3L, "no pii here, just words and the number 42"),
      (4L, "a@b.io 10.0.0.255 999-999-9999 all three"))
      .toDF("id", "t")
    val got = rows.select(col("id"), TextAnalysis.scrubPii(col("t")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "reach <EMAIL> or <PHONE> now")
    assert(got(2L) == "server at <IP> responded")
    assert(got(3L) == "no pii here, just words and the number 42")
    assert(got(4L) == "<EMAIL> <IP> <PHONE> all three")
  }

  test("chunking is lossless: dropping overlaps reconstructs every document") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val chunked = TextAnalysis.chunk(docs, "text",
      chunkTokens = 32, overlap = 8)
    val rebuilt = chunked.collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        val ordered = rows.sortBy(_.getLong(2))
        val toks = ordered.zipWithIndex.flatMap { case (r, i) =>
          val ts = r.getString(3).split(" ", -1)
          if (i == 0) ts else ts.drop(8) // strip the overlap
        }
        id -> toks.mkString(" ")
      }
    val original = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rebuilt.size == original.size)
    rebuilt.foreach { case (id, text) =>
      assert(text == original(id), s"doc $id not reconstructed")
    }
    // every chunk except possibly the tail is full-size
    chunked.collect().groupBy(_.getLong(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(2))
      sorted.dropRight(1).foreach(r => assert(r.getLong(4) == 32))
    }
  }

  test("repetitionSignals: hand-computed fractions, <2-token docs get 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),                              // all unique
      (2L, "a a a a"),                              // degenerate repeat
      (3L, "x"),                                    // no bigrams
      (4L, "the cat sat on the mat the cat ran"))   // mixed
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs, "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(1L) == ((4L, 0.0, 0.5)))       // "a b" etc each once: 2/4
    assert(got(2L) == ((4L, 0.75, 1.0)))      // "a a" x3: min(1, 6/4) capped
    assert(got(3L) == ((1L, 0.0, 0.0)))       // bigram-less
    // 9 tokens, 6 distinct -> 1 - 6/9; "the cat" x2 -> 4/9
    assert(got(4L) == ((9L, 0.333333, 0.444444)))
  }

  test("decontaminate: 8-gram overlap flags the leak, counts eval matches") {
    import spark.implicits._
    val eightGram = "one two three four five six seven eight"
    val evalSet = Seq(
      (100L, s"$eightGram nine ten"),
      (101L, s"prefix $eightGram"),
      (102L, "totally different benchmark question here right now ok"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, s"leading words then $eightGram and a tail"), // hits 100 AND 101
      (2L, "completely unrelated training text with plenty of tokens"),
      (3L, "one two three four five six seven"))         // 7 tokens: no 8-gram
      .toDF("doc_id", "text")
    val got = TextAnalysis.decontaminate(train, evalSet, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L), s"got $got")
    // hot-key guard: with a tiny cap, the leaked 8-grams (df=1 on the
    // train side here... shared boilerplate below) are dropped once more
    // train docs than the cap carry them
    val boiler = "this license text repeats in every single training doc"
    val train2 = (1L to 4L)
      .map(i => (i, s"$boiler unique tail token_$i")).toDF("doc_id", "text")
    val eval2 = Seq((200L, s"$boiler something else entirely here"))
      .toDF("doc_id", "text")
    assert(TextAnalysis.decontaminate(train2, eval2, "doc_id",
      maxShingleDf = 3).count() == 0, "ubiquitous shingles must be capped")
    assert(TextAnalysis.decontaminate(train2, eval2, "doc_id",
      maxShingleDf = 1000).count() == 4, "cap must be inert below df")
  }

  test("eval index at rest: build + append + probe == live decontaminate " +
      "over the union of suites") {
    val docs = Tables.load(spark, sf, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("graft_eidx").toString
    val evalAll = docs.filter(col("doc_id") % 7 === 0)
    TextAnalysis.buildEvalIndex(
      docs.filter(col("doc_id") % 14 === 0), "doc_id", "text", 8,
      s"$tmp/idx")
    TextAnalysis.appendEvalIndex(
      docs.filter(col("doc_id") % 14 === 7), "doc_id", "text", 8,
      s"$tmp/idx")
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    val viaIndex = TextAnalysis.decontaminateAgainstIndex(
      train, "doc_id", "text", 8, spark, s"$tmp/idx")
    val live = TextAnalysis.decontaminate(train, evalAll, "doc_id")
    assert(viaIndex.count() > 0, "fixture must contain leakage")
    assert(viaIndex.exceptAll(live).isEmpty &&
      live.exceptAll(viaIndex).isEmpty)
    // re-appending the SAME suite must not change scores (countDistinct
    // dedups eval ids — append idempotence for accidental double loads)
    TextAnalysis.appendEvalIndex(
      docs.filter(col("doc_id") % 14 === 7), "doc_id", "text", 8,
      s"$tmp/idx")
    val again = TextAnalysis.decontaminateAgainstIndex(
      train, "doc_id", "text", 8, spark, s"$tmp/idx")
    assert(again.exceptAll(live).isEmpty && live.exceptAll(again).isEmpty)
  }

  test("ngramNovelty: copied text scores 0, novel text 1, half-novel " +
      "the exact ratio") {
    import spark.implicits._
    val ref = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    // doc 1 = pure copy (every 4-gram in ref); doc 2 = disjoint tokens;
    // doc 3 = ref's first 5 tokens then 3 novel → 5 grams, 2 seen
    // ("a b c d", "b c d e"), 3 novel
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "p q r s t u v w"),
      (3L, "a b c d e x y z")).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(docs, ref, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((5L, 0L, 0.0)))
    assert(got(2L) == ((5L, 5L, 1.0)))
    assert(got(3L) == ((5L, 3L, 0.6)))
  }

  test("decontaminate bloom prefilter: lossless vs the unfiltered path, " +
       "empty eval set yields empty result") {
    val docs = Tables.load(spark, sf, "documents")
    // leak fixture: eval = every 7th doc, train = all docs — the seeded
    // duplicates plus the eval docs themselves guarantee real overlap
    val evalSet = docs.filter(col("doc_id") % 7 === 0)
    val on = TextAnalysis.decontaminate(docs, evalSet, "doc_id",
      bloomPrefilter = true)
    val off = TextAnalysis.decontaminate(docs, evalSet, "doc_id",
      bloomPrefilter = false)
    assert(on.count() > 0, "fixture must actually contain overlap")
    assert(on.exceptAll(off).isEmpty && off.exceptAll(on).isEmpty,
      "bloom prefilter must not change the result")
    assert(TextAnalysis.decontaminate(docs, evalSet.filter(lit(false)),
      "doc_id", bloomPrefilter = true).count() == 0)
    // the underlying filter can never false-negative a member
    import spark.implicits._
    val members = (1L to 5000L).map(_ * 7919L)
    val bloom = TextAnalysis.bloomOf(members.toDF("v"), "v", members.size)
    val missed = members.toDF("v")
      .filter(!TextAnalysis.mightContain(bloom, col("v"))).count()
    assert(missed == 0, "bloom filters have no false negatives")
  }

  test("mixBySource: limiting source kept whole, others thinned to the " +
       "recipe, deterministic under repartitioning") {
    import spark.implicits._
    // A=100, B=100, C=50 rows; weights 0.5/0.25/0.25 ⇒ T = min(100/0.5,
    // 100/0.25, 50/0.25) = 200 ⇒ keep A 1.0 (limiting with C), B 0.5, C 1.0
    val rows = (1L to 100L).map(i => (i, "A")) ++
      (101L to 200L).map(i => (i, "B")) ++
      (201L to 250L).map(i => (i, "C")) ++
      (300L to 320L).map(i => (i, "unweighted"))
    val df = rows.toDF("id", "src")
    val got = Sampling.mixBySource(df, "src", "id",
      Map("A" -> 0.5, "B" -> 0.25, "C" -> 0.25))
    val byFrac = got.select("src", "keep_frac").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byFrac == Map("A" -> 1.0, "B" -> 0.5, "C" -> 1.0))
    val counts = got.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("A") == 100 && counts("C") == 50) // full-keep is exact
    assert(math.abs(counts("B") - 50) <= 15, s"B kept ${counts("B")}")
    assert(!counts.contains("unweighted"), "absent-weight sources drop")
    // partition-independence: the kept set is a pure function of content
    val again = Sampling.mixBySource(df.repartition(7), "src", "id",
      Map("A" -> 0.5, "B" -> 0.25, "C" -> 0.25))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == got.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("mixByTemperature: alpha=1 keeps all, alpha=0.5 flattens to sqrt ratio") {
    import spark.implicits._
    // A=400, B=100 rows: alpha=0.5 -> weights 20/10, T = min(400/20,
    // 100/10) = 10 -> keep A 10*20/400 = 0.5 (~200 rows), B whole
    val rows = (1L to 400L).map(i => (i, "A")) ++
      (401L to 500L).map(i => (i, "B"))
    val df = rows.toDF("id", "src")
    val natural = Sampling.mixByTemperature(df, "src", "id", alpha = 1.0)
    assert(natural.count() == 500) // alpha=1: every source limiting, all kept
    val flat = Sampling.mixByTemperature(df, "src", "id", alpha = 0.5)
    val counts = flat.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("B") == 100, "limiting source kept whole")
    assert(math.abs(counts("A") - 200) <= 30, s"A kept ${counts("A")}")
  }

  test("writeShards: data+manifest round-trip, typed shard col, pruned read") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val packed = operators.Sampling.packSequences(
      docs.select("doc_id", "text"), "doc_id",
      size(split(col("text"), " ")), budget = 512, nShards = 4)
    val path = java.nio.file.Files.createTempDirectory("shards").toString
    operators.Sampling.writeShards(packed, "doc_id", path)
    // read-back data matches the recompute, with shard still LongType
    val back = operators.Sampling.readShards(spark, path)
    assert(back.schema("shard").dataType ==
      org.apache.spark.sql.types.LongType)
    val cols = Seq("doc_id", "shard", "bin", "offset_in_bin")
    assert(back.select(cols.map(col): _*).except(
      packed.select(cols.map(col): _*)).count() == 0)
    assert(back.count() == packed.count())
    // one rank's read prunes to its shard directory
    val one = operators.Sampling.readShards(spark, path, shard = Some(2L))
    assert(one.select("shard").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("shard_part"), "partition filter should show")
    // manifest on disk == manifest recomputed
    val m1 = operators.Sampling.readShardManifest(spark, path)
    val m2 = operators.Sampling.packManifest(packed, "doc_id")
    assert(m1.except(m2).count() == 0 && m2.except(m1).count() == 0)
    // each shard file is physically ordered by (bin, offset_in_bin) —
    // the sequential-read contract a training loader relies on (ADVICE
    // r13: the write-geometry repartition alone scatters the order).
    // Read WITHOUT a sort and check monotonicity per file.
    val fileOrder = spark.read.parquet(s"$path/data")
      .select(input_file_name().as("f"), col("bin"), col("offset_in_bin"),
        monotonically_increasing_id().as("pos"))
      .collect().groupBy(_.getString(0))
    fileOrder.foreach { case (f, rows) =>
      val inFile = rows.sortBy(_.getLong(3))
        .map(r => (r.getLong(1), r.getLong(2))).toSeq
      assert(inFile == inFile.sorted,
        s"shard file $f not in (bin, offset) order: ${inFile.take(8)}")
    }
  }

  test("packSequences: concat-then-chunk bins, straddle spills, order-stable") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // single shard: token counts 5,4,3,6 at budget 8 concatenate to
    // offsets 0,5,9,12 -> bins 0,0,1,1 (doc 2 straddles 8 and spills)
    val docs = Seq((1L, 5L), (2L, 4L), (3L, 3L), (4L, 6L))
      .toDF("doc_id", "toks")
    def pack(df: org.apache.spark.sql.DataFrame) =
      operators.Sampling.packSequences(df, "doc_id", col("toks"),
          budget = 8, nShards = 1)
        .select(col("doc_id"), col("bin"), col("offset_in_bin"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val got = pack(docs)
    assert(got === Set((1L, 0L, 0L), (2L, 0L, 5L), (3L, 1L, 1L),
      (4L, 1L, 4L)))
    // assignment depends only on ids+counts, not input row order
    assert(pack(docs.orderBy(col("doc_id").desc)) === got)
    // shards partition the corpus and each bin stays under
    // budget + max_doc - 1
    val d2 = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val packed = operators.Sampling.packSequences(d2, "doc_id",
      size(split(col("text"), " ")), budget = 2048, nShards = 4)
    assert(packed.count() == d2.count())
    val maxDoc = packed.agg(max(col("n_tokens"))).head().getLong(0)
    val worstBin = packed.groupBy(col("shard"), col("bin"))
      .agg(sum(col("n_tokens")).as("s"))
      .agg(max(col("s"))).head().getLong(0)
    assert(worstBin < 2048 + maxDoc,
      s"bin of $worstBin tokens exceeds budget+maxDoc bound")
  }

  test("packSequences orderBy: curriculum order drives offsets, id " +
       "breaks ties, default unchanged") {
    import spark.implicits._
    val docs = Seq((1L, 10L, 0.9), (2L, 20L, 0.1), (3L, 30L, 0.1))
      .toDF("id", "nt", "score")
    val packed = Sampling.packSequences(docs, "id", col("nt"),
        budget = 1000, nShards = 1, orderBy = Seq(col("score").asc))
      .select(col("id"), col("offset_in_bin"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // score order: id2 (0.1), id3 (0.1, id tie-break), id1 (0.9)
    assert(packed == Map(2L -> 0L, 3L -> 20L, 1L -> 50L))
    val default = Sampling.packSequences(docs, "id", col("nt"),
        budget = 1000, nShards = 1)
      .select(col("id"), col("offset_in_bin"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(default == Map(1L -> 0L, 2L -> 10L, 3L -> 30L))
  }

  test("packManifest: per-bin seq/token counts and ordered boundary spans") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // same fixture as the packing test: bins 0 = docs 1,2 / 1 = docs 3,4
    val docs = Seq((1L, 5L), (2L, 4L), (3L, 3L), (4L, 6L))
      .toDF("doc_id", "toks")
    val m = operators.Sampling.packManifest(
      operators.Sampling.packSequences(docs, "doc_id", col("toks"),
        budget = 8, nShards = 1), "doc_id")
      .orderBy("bin")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(m.toSeq == Seq(
      (0L, 2L, 9L, "1:0:5;2:5:4"),
      (1L, 2L, 9L, "3:1:3;4:4:6")))
  }

  test("calibrateQuality: hand-computed percent_rank, ties share a " +
       "percentile, 1-row source scores 0.0") {
    import spark.implicits._
    // srcA: scores 0.1, 0.2, 0.2, 0.4 → pct 0, 1/3, 1/3, 1
    // srcB: single row → 0.0
    val docs = Seq(
      (1L, "srcA", 0.1), (2L, "srcA", 0.2), (3L, "srcA", 0.2),
      (4L, "srcA", 0.4), (5L, "srcB", 0.9))
      .toDF("id", "src", "score")
    val got = TextAnalysis.calibrateQuality(docs, "id",
        col("score"), col("src"))
      .select(col("id"), col("quality_pct"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got(1L) == 0.0)
    assert(got(2L) == 0.333333 && got(3L) == 0.333333)
    assert(got(4L) == 1.0)
    assert(got(5L) == 0.0)
    // row count preserved (the join back loses nothing)
    assert(TextAnalysis.calibrateQuality(docs, "id",
      col("score"), col("src")).count() == 5)
  }

  test("unigramSurprisal: hand-computed count model and means") {
    import spark.implicits._
    // corpus: a:2 b:2 c:1, total 5
    // doc1 "a a b": all tokens p=0.4 → mean -ln(0.4) = 0.916291
    // doc2 "b c": (-ln(0.4) + -ln(0.2)) / 2 = 1.262864
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("id", "text")
    val got = TextAnalysis.unigramSurprisal(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got(1L) == ((3L, 0.916291)))
    assert(got(2L) == ((2L, 1.262864)))
  }

  test("tokenDrift: hand-computed smoothed log-ratios, |llr| ranking") {
    import spark.implicits._
    // A = "a a b" (a:2 b:1, na=3), B = "a c" (a:1 c:1, nb=2), |V|=3
    // llr(a) = ln((3/6)/(2/5)) = 0.223144; llr(b) = ln((2/6)/(1/5))
    //        = 0.510826; llr(c) = ln((1/6)/(2/5)) = -0.875469
    val a = Seq((1L, "a a b")).toDF("id", "text")
    val b = Seq((2L, "a c")).toDF("id", "text")
    val got = TextAnalysis.tokenDrift(a, b, "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toList
    assert(got == List(
      ("c", 0L, 1L, -0.875469),
      ("b", 1L, 0L, 0.510826),
      ("a", 2L, 1L, 0.223144)))
  }

  test("tfidf top terms: k rows per group, scores descending and >= 0") {
    val out = TextAnalysis.tfidfTopTerms(
      Tables.load(spark, sf, "documents"), "lang", "text", k = 3).collect()
    val perLang = out.groupBy(_.getString(0))
    perLang.foreach { case (_, rows) =>
      assert(rows.length == 3)
      val scores = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(scores.sameElements(scores.sorted.reverse))
      // idf = ln(n_groups/df) >= 0; == 0 only for everywhere-terms, which
      // can legitimately top a tiny corpus slice
      assert(scores.forall(_ >= 0))
    }
  }

  test("capPerGroup: exactly min(n, group size) survive, by priority") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.9), ("a", 3L, 0.5), ("a", 4L, 0.99),
      ("b", 5L, 0.1),
      ("c", 6L, 0.3), ("c", 7L, 0.3), ("c", 8L, 0.3))
      .toDF("src", "id", "score")
    val got = Sampling.capPerGroup(df, col("src"),
        Seq(col("score").desc, col("id")), n = 2)
      .orderBy(col("id")).collect().map(_.getLong(1)).toSeq
    // a: 4 (0.99) then 1 (0.9, id tie-break over 2); b: all of it;
    // c: ids 6,7 by tie-break
    assert(got == Seq(1L, 4L, 5L, 6L, 7L))
  }

  test("capPerGroup with n >= group size is the identity") {
    val docs = Tables.load(spark, sf, "documents")
    val got = Sampling.capPerGroup(docs, col("source"),
      Seq(col("n_chars").desc, col("doc_id")), n = 1000000)
    assert(got.count() == docs.count())
  }

  test("bigramSurprisal: hand-computed two-doc corpus") {
    import spark.implicits._
    // corpus "a b a" + "b a": bigrams d1 = [a b, b a], d2 = [b a]
    // c2(a b)=1, c2(b a)=2; prefixes c1(a)=1, c1(b)=2; V=2
    // p(b|a)=(1+1)/(1+2)=2/3; p(a|b)=(2+1)/(2+2)=3/4
    // d1 mean = (-ln(2/3) - ln(3/4))/2; d2 mean = -ln(3/4)
    val docs = Seq((1L, "a b a"), (2L, "b a")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramSurprisal(docs, "doc_id", "text")
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def rnd(x: Double) = math.round(x * 1e6) / 1e6
    assert(got.toSeq == Seq(
      (1L, 2L, rnd((-math.log(2.0 / 3.0) - math.log(3.0 / 4.0)) / 2)),
      (2L, 1L, rnd(-math.log(3.0 / 4.0)))))
  }

  test("bigramSurprisal: sub-2-token docs are absent by contract") {
    import spark.implicits._
    val docs = Seq((1L, "only"), (2L, "two tokens")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramSurprisal(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L))
  }

  test("selectByTokenBudget == naive global window cumsum prefix") {
    import org.apache.spark.sql.expressions.Window
    val feat = TextAnalysis.qualityFeatures(
      Tables.load(spark, sf, "documents"))
    val got = Sampling.selectByTokenBudget(feat, "doc_id",
        col("stop_ratio"), col("n_tokens"), budget = 10000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val w = Window.orderBy(col("stop_ratio").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val naive = feat.withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") <= 10000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == naive && got.nonEmpty)
  }

  test("selectByTokenBudget splits the boundary tie group by id") {
    import spark.implicits._
    // score ties at 0.5 hold ids 2,3,4 with 10 tokens each; budget 25
    // admits id1 (5) + id2 (10) + id3 (10) = 25, then id4 overflows
    val df = Seq((1L, 0.9, 5L), (2L, 0.5, 10L), (3L, 0.5, 10L),
      (4L, 0.5, 10L), (5L, 0.1, 1L)).toDF("id", "score", "tok")
    val got = Sampling.selectByTokenBudget(df, "id", col("score"),
        col("tok"), budget = 25L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("selectByTokenBudget: zero-token rows at an exact group boundary") {
    import spark.implicits._
    // the 0.9 group ends exactly at budget=15; the next group's leading
    // zero-token row (id=2) keeps a running total of exactly 15 and must
    // be kept per the inclusive-<= cumsum contract; id=3 (3 tokens) and
    // the zero-token row AFTER it (id=4, cum=18) must not
    val df = Seq((1L, 0.9, 15L), (2L, 0.5, 0L), (3L, 0.5, 3L),
      (4L, 0.5, 0L)).toDF("id", "score", "tok")
    val got = Sampling.selectByTokenBudget(df, "id", col("score"),
        col("tok"), budget = 15L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("selectByTokenBudget: zero budget keeps nothing; huge keeps all") {
    import spark.implicits._
    val df = Seq((1L, 0.9, 5L), (2L, 0.5, 10L)).toDF("id", "score", "tok")
    assert(Sampling.selectByTokenBudget(df, "id", col("score"),
      col("tok"), 0L).count() == 0)
    assert(Sampling.selectByTokenBudget(df, "id", col("score"),
      col("tok"), 1000000L).count() == 2)
  }

  test("selectByTokenBudget: scores split only BELOW the default 1e-6 " +
      "granularity tie and rank by id; a wider scoreDecimals separates " +
      "them (the documented back-compat knob)") {
    import spark.implicits._
    // r11 ADVICE pin: the default 6-decimal rounding is on for ALL
    // callers — two rows whose scores differ only at 1e-9 TIE at the
    // default granularity (rank by id: the lower id wins the budget),
    // and the same call at scoreDecimals=12 ranks them by true score.
    // Every in-repo caller (q111's stop_ratio) passes a pre-rounded
    // score, so the default changes nothing there — this pins what a
    // raw-score caller gets.
    val df = Seq((1L, 0.500000000, 10L), (2L, 0.500000001, 10L))
      .toDF("id", "score", "tok")
    val atDefault = Sampling.selectByTokenBudget(df, "id", col("score"),
        col("tok"), budget = 10L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(atDefault == Set(1L),
      "sub-1e-6 deltas must tie at the default granularity (id order)")
    val atFull = Sampling.selectByTokenBudget(df, "id", col("score"),
        col("tok"), budget = 10L, scoreDecimals = 12)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(atFull == Set(2L),
      "scoreDecimals=12 must rank by the true score")
  }

  test("selectByTokenBudget: raw continuous scores are discretized " +
      "internally — the global window stays histogram-sized") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // a score with n distinct full-precision values: before the round-11
    // hardening the "value-bounded histogram" was only a scaladoc @param
    // contract, and a raw quality proxy meant an n-row single-task
    // window; the internal rounding now enforces the bound
    val df = (1L to 500L).map(i => (i, 1.0 / i, 10L))
      .toDF("id", "score", "tok")
    def run() = Sampling.selectByTokenBudget(df, "id", col("score"),
      col("tok"), budget = 1000L, scoreDecimals = 2)
    val got = run().select("id").collect().map(_.getLong(0)).toSet
    // reference: naive cumsum over the ROUNDED score (the documented
    // discretization contract), id tie-break
    val w = Window.orderBy(round(col("score"), 2).desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val naive = df.withColumn("cum", sum(col("tok")).over(w))
      .filter(col("cum") <= 1000L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == naive && got.size == 100)
    // every window in the optimized plan declares a partition spec: the
    // intentional single-partition windows carry a constant key (which
    // the optimizer must not strip), so an EMPTY spec — the thing
    // WindowExec warns about — again means an accidental global window
    val lw = run().queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(lw.nonEmpty && lw.forall(_.partitionSpec.nonEmpty),
      "intentional global windows must keep their constant partition key")
  }

  test("weightedReservoir: exactly n, repartition-stable, weight-biased") {
    import spark.implicits._
    val rows = (1L to 2000L).map(i => (i, if (i <= 200) 50.0 else 1.0))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedReservoir(df, "id", col("w"), n = 200)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got.size == 200)
    // partition-independence: same sample from a different layout
    val got2 = Sampling.weightedReservoir(df.repartition(13), "id",
      col("w"), n = 200).select("id").collect().map(_.getLong(0)).toSet
    assert(got == got2)
    // the 10% of rows holding 50x weight must be heavily overrepresented
    val heavy = got.count(_ <= 200L)
    assert(heavy > 100, s"heavy rows in sample: $heavy")
    // n >= rows degenerates to everything
    assert(Sampling.weightedReservoir(df, "id", col("w"), 5000)
      .count() == 2000)
  }

  test("piiStats: hand-planted corpus counts per type") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail me at a@b.org or c@d.io today"),
      (2L, "call 555-123-4567"),
      (3L, "from 10.0.0.1 to 10.0.0.2 and 1.2.3.4"),
      (4L, "nothing sensitive here")).toDF("doc_id", "text")
    val got = TextAnalysis.piiStats(docs)
      .orderBy(col("pii_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("<EMAIL>", 1L, 2L), ("<IP>", 1L, 3L), ("<PHONE>", 1L, 1L)))
  }

  test("piiStats: sequential semantics match scrubPii on overlapping PII") {
    import spark.implicits._
    // u@1.2.3.4.com embeds an IP in the email domain, and
    // 555-123-4567@ex.org has a phone-shaped local part: scrubPii's
    // EMAIL replace (applied first) consumes the whole token in both, so
    // the IP/PHONE patterns never see their substrings — the report must
    // count each once, as EMAIL only (independent counting would say
    // EMAIL+IP and EMAIL+PHONE respectively).
    val docs = Seq(
      (1L, "contact u@1.2.3.4.com for access"),
      (2L, "reach 555-123-4567@ex.org now"),
      (3L, "server 9.8.7.6 is separate")).toDF("doc_id", "text")
    val got = TextAnalysis.piiStats(docs)
      .orderBy(col("pii_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("<EMAIL>", 2L, 2L), ("<IP>", 1L, 1L), ("<PHONE>", 0L, 0L)))
    // and the report agrees with what scrubbing actually removes: the
    // scrubbed corpus has zero residual matches for every pattern
    val scrubbed = docs.select(
      TextAnalysis.scrubPii(col("text")).as("text"))
    val residual = TextAnalysis.piiStats(scrubbed)
      .agg(sum(col("n_matches"))).collect()(0).getLong(0)
    assert(residual == 0L)
  }

  test("LM at rest: save + append + load-fold equals the one-shot fit; " +
    "external-model scoring drops OOV tokens") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val path = java.nio.file.Files
      .createTempDirectory("graft_lm_spec").toString + "/lm"
    TextAnalysis.saveLm(TextAnalysis.lmCounts(
      docs.filter(col("doc_id") % 2 === 0), "text"), path)
    TextAnalysis.appendLm(TextAnalysis.lmCounts(
      docs.filter(col("doc_id") % 2 =!= 0), "text"), path)
    val folded = TextAnalysis.loadLm(spark, path)
    val oneShot = TextAnalysis.lmCounts(docs, "text")
    assert(folded.except(oneShot).isEmpty && oneShot.except(folded).isEmpty)
    // scoring through the loaded model == the self-fit operator
    val a = TextAnalysis.unigramSurprisalWith(docs, "doc_id", "text",
      folded).collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2))).sortBy(_._1).toSeq
    val b = TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(a == b)
    // OOV contract: tokens absent from the model are dropped from both
    // the count and the mean
    val model = Seq(("aa", 3L), ("bb", 1L)).toDF("token", "cnt")
    val got = TextAnalysis.unigramSurprisalWith(
      Seq((1L, "aa zz bb")).toDF("doc_id", "text"), "doc_id", "text",
      model).collect()(0)
    assert(got.getLong(1) == 2L)
    def rnd(x: Double) = math.round(x * 1e6) / 1e6
    assert(got.getDouble(2) ==
      rnd((-math.log(3.0 / 4) - math.log(1.0 / 4)) / 2))
  }

  test("mixWithEpochs: limiting source repeats exactly maxEpochs, " +
    "fractional sources split full+coin, repartition-stable") {
    val docs = Tables.load(spark, sf, "documents")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.mixWithEpochs(df, "source", "doc_id",
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), maxEpochs = 2)
    val got = run(docs).select(col("doc_id"), col("source"), col("epoch"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // 25 docs/source at sf0.001: T = min(25·2/.5, 25·2/.3, 25·2/.2)
    // = 100 -> epochs (2.0, 1.2, 0.8)
    val bySrc = got.groupBy(_._2)
    // src0 is limiting: every doc exactly epochs {0, 1}
    val s0 = bySrc("src0").groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq)
    assert(s0.values.forall(_ == Seq(0L, 1L)) && s0.size == 25)
    // src1: every doc has epoch 0; SOME (not all, not none at 0.2
    // coin probability over 25 docs — vanishing chance of either
    // extreme, and deterministic for this fixture) carry epoch 1
    val s1 = bySrc("src1").groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq)
    assert(s1.size == 25 && s1.values.forall(v => v.head == 0L))
    val s1Partial = s1.values.count(_ == Seq(0L, 1L))
    assert(s1Partial > 0 && s1Partial < 25)
    // src2 (0.8 epochs): no doc repeats, roughly 80% kept once
    val s2 = bySrc("src2").groupBy(_._1).view.mapValues(_.map(_._3).toSeq)
    assert(s2.values.forall(_ == Seq(0L)))
    assert(s2.size > 12 && s2.size < 25)
    // deterministic under input repartitioning
    val again = run(docs.repartition(7))
      .select(col("doc_id"), col("source"), col("epoch"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.sorted.toSeq == again.sorted.toSeq)
  }

  test("dsirWeights: hand-computed log-likelihood ratios on a 2-token " +
    "model") {
    import spark.implicits._
    val raw = Seq((1L, "aa aa"), (2L, "bb")).toDF("doc_id", "text")
    val target = Seq((9L, "aa")).toDF("doc_id", "text")
    val nB = 1024
    val got = TextAnalysis.dsirWeights(raw, target, "doc_id", "text",
        nBuckets = nB)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // raw buckets: aa×2, bb×1 (nr = 3); target: aa×1 (nt = 1); the two
    // tokens land in distinct md5 buckets (the operator would otherwise
    // produce different counts and this test would fail loudly)
    def rnd(x: Double) = math.round(x * 1e6) / 1e6
    val llrA = math.log(2.0 / (1 + nB)) - math.log(3.0 / (3 + nB))
    val llrB = math.log(1.0 / (1 + nB)) - math.log(2.0 / (3 + nB))
    assert(got.toSeq == Seq(
      (1L, 2L, rnd(2 * llrA)), (2L, 1L, rnd(llrB))))
  }

  test("dsirWeights on testdata: English-target weights rank en docs " +
    "above every other language on average") {
    val docs = Tables.load(spark, sf, "documents")
    val w = TextAnalysis.dsirWeights(docs,
        docs.filter(col("lang") === "en"), "doc_id", "text")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"))
      .agg(avg(col("dsir_logweight")).as("mw"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w.keySet.contains("en"))
    (w - "en").values.foreach(other => assert(w("en") > other))
  }

  test("winnow: shared-run guarantee, window coverage, rightmost tie, " +
    "short-doc edges") {
    import spark.implicits._
    val k = 3; val w = 4
    // guarantee: a shared run of w+k-1 = 6 tokens must share >= 1
    // fingerprint HASH between the two docs (positions may differ)
    val docs = Seq(
      (1L, "p1 q1 r1 s1 t1 u1 v1 w1"),
      (2L, "z1 z2 p1 q1 r1 s1 t1 u1 z3 z4"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(docs, "doc_id", "text", k, w)
    val f1 = fps.filter(col("doc_id") === 1).select("fp")
    val f2 = fps.filter(col("doc_id") === 2).select("fp")
    assert(f1.intersect(f2).count() >= 1,
      "a 6-token shared run must yield a shared fingerprint")
    // coverage: within a doc, consecutive selected positions are never
    // more than w apart (every window contains a selected position),
    // the first is < w, and all lie in [0, nkg-1]
    val pos = fps.filter(col("doc_id") === 2)
      .orderBy(col("pos")).collect().map(_.getLong(1))
    assert(pos.head < w && pos.last >= 10 - k + 1 - w)
    pos.sliding(2).foreach { case Array(a, b) =>
      assert(b - a <= w, s"gap $a -> $b exceeds window")
    case _ => }
    // rightmost tie-break: all-equal hashes select the LAST position of
    // each window; unigrams "a a a a a" with w=5 = one window -> pos 4
    val rep = Seq((1L, "a a a a a")).toDF("doc_id", "text")
    val one = TextAnalysis.winnow(rep, "doc_id", "text", 1, 5).collect()
    assert(one.length == 1 && one.head.getLong(1) == 4L)
    // w=2: windows {0,1}..{3,4}, rightmost of each -> positions 1..4
    val r2 = TextAnalysis.winnow(rep, "doc_id", "text", 1, 2)
      .collect().map(_.getLong(1)).sorted
    assert(r2.toSeq == Seq(1L, 2L, 3L, 4L))
    // exactly k tokens: one k-gram, one window, selected at pos 0;
    // fewer than k tokens: nothing
    val short = Seq((1L, "x y z"), (2L, "x y")).toDF("doc_id", "text")
    val s = TextAnalysis.winnow(short, "doc_id", "text", k, w).collect()
    assert(s.length == 1 && s.head.getLong(0) == 1L &&
      s.head.getLong(1) == 0L)
  }

  test("winnowOverlapPairs: partial copy detected, unrelated not " +
    "paired, boilerplate fingerprints killed by the df cap") {
    import spark.implicits._
    val run = "c1 c2 c3 c4 c5 c6 c7 c8" // 8-token copied passage
    val docs = Seq(
      (1L, s"a1 a2 a3 $run a4 a5 a6"),
      (2L, s"b1 b2 $run b3 b4 b5 b6 b7"),
      (3L, "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.winnowOverlapPairs(docs, "doc_id", "text",
        k = 3, w = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)), s"got ${got.toSeq}")
    // df cap: the run appears in 3 docs -> its fps have df 3; with
    // maxFpDf = 2 those fingerprints cannot pair anyone
    val three = docs.union(Seq((4L, s"e1 e2 $run e3 e4")).toDF(
      "doc_id", "text"))
    val capped = TextAnalysis.winnowOverlapPairs(three, "doc_id", "text",
      k = 3, w = 4, minShared = 1, maxFpDf = 2)
    assert(capped.isEmpty,
      "a fingerprint in 3 docs must be dropped at maxFpDf = 2")
  }

  test("neymanSample: exact largest-remainder allocation, zero-spread " +
    "strata starve, all-zero falls back to size-proportional, budget " +
    "growth only adds rows") {
    import spark.implicits._
    // A: constant sizes (spread 0); B: spread 300
    val docs = ((1L to 4L).map(i => (i, "A", 10L)) ++
      Seq((5L, "B", 0L), (6L, "B", 100L), (7L, "B", 200L),
        (8L, "B", 300L))).toDF("doc_id", "source", "n_chars")
    val sel = Sampling.neymanSample(docs, "doc_id", "source",
        col("n_chars"), budget = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sel == Set(5L, 6L, 7L, 8L),
      s"all budget must go to the only variable stratum: $sel")
    // all-zero spreads: proportional to n (A has 4 rows, B2 has 2)
    val flat = ((1L to 4L).map(i => (i, "A", 7L)) ++
      Seq((5L, "B", 7L), (6L, "B", 7L)))
      .toDF("doc_id", "source", "n_chars")
    val f = Sampling.neymanSample(flat, "doc_id", "source",
        col("n_chars"), budget = 3)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f == Map("A" -> 2L, "B" -> 1L), s"got $f")
    // budget beyond rows caps at n_h (zero-weight A still starves by
    // the pure Neyman rule — the cap binds on the flat fixture where
    // every stratum carries weight)
    val all = Sampling.neymanSample(docs, "doc_id", "source",
        col("n_chars"), budget = 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(all == Set(5L, 6L, 7L, 8L))
    val allFlat = Sampling.neymanSample(flat, "doc_id", "source",
        col("n_chars"), budget = 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(allFlat == (1L to 6L).toSet)
    val b2 = Sampling.neymanSample(docs, "doc_id", "source",
        col("n_chars"), budget = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(b2.subsetOf(sel), "a smaller budget must select a subset")
  }

  test("rendezvousRoute: minimal disruption on node removal, every " +
    "node used, single-node degenerate") {
    import spark.implicits._
    val keys = (1L to 400L).toDF("k")
    val n8 = (0 until 8).map(i => s"n$i")
    def route(nodes: Seq[String]) = keys
      .select(col("k"), Sampling.rendezvousRoute(col("k"), nodes)
        .as("node"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = route(n8)
    assert(full.values.toSet == n8.toSet, "400 keys must hit all 8")
    // remove n3: ONLY n3's keys may move, and they land elsewhere
    val without = route(n8.filterNot(_ == "n3"))
    full.foreach { case (k, n) =>
      if (n == "n3") assert(without(k) != "n3")
      else assert(without(k) == n,
        s"key $k moved from $n though its node survived")
    }
    // single node routes everything to it
    assert(route(Seq("solo")).values.toSet == Set("solo"))
  }

  test("bpeMerges: hand-traced Sennrich corpus — counts, greedy merge " +
      "order, smallest-pair tie-break") {
    import spark.implicits._
    // the classic BPE corpus: low×5, lower×2, newest×6, widest×3
    // (one doc per occurrence — type counting must aggregate)
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, "text", 4)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // hand trace (end-of-word marker '_'):
    //  r1: e-s 9 ties s-t 9 and t-_ 9 → smallest pair (e,s) wins
    //  r2: es-t 9 ties t-_ 9 → (es,t) < (t,_)
    //  r3: est-_ 9 unique max
    //  r4: l-o 7 ties o-w 7 → (l,o) < (o,w)
    assert(got == Seq((1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "est", "_", 9L), (4, "l", "o", 7L)), got.toString)
    // greedy left-to-right on overlapping runs: "b a a a" merges (a,a)
    // once in the run of three — the leftmost pair
    val run = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeMerges(run, "text", 2)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // aaa → a a a _: pairs a-a 2 (per occurrence... 1 type, cnt 2 docs?
    // one type "aaa" ×2) → a-a counts 2×2=4? No: adjacent pairs of
    // (a,a,a,_) are (a,a),(a,a),(a,a_?) — (a,a) twice + (a,_) once,
    // weighted by type count 2 → a-a 4, a-_ 2 → merge (a,a); greedy
    // rewrite gives (aa,a,_) NOT (a,aa,_): round 2 pairs aa-a 2, a-_ 2
    // → tie (a,_) vs (aa,a): "a"<"aa" → (a,_) 2
    assert(m == Seq((1, "a", "a", 4L), (2, "a", "_", 2L)), m.toString)
  }

  test("bpeMergesDelta ≡ bpeMerges: identical merges on the Sennrich " +
      "corpus (incl. past exhaustion) and on the greedy-overlap run") {
    import spark.implicits._
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // 10 merges — the q160 operating point; delta maintenance must
    // reproduce the recount's counts, greedy order, and tie-breaks
    // exactly (exact longs → bit-identical argmax)
    assert(rows(TextAnalysis.bpeMergesDelta(docs, "text", 10))
      == rows(TextAnalysis.bpeMerges(docs, "text", 10)))
    // run both past pair exhaustion: every word fully merged into one
    // symbol → both stop at the same round with the same list
    assert(rows(TextAnalysis.bpeMergesDelta(docs, "text", 60))
      == rows(TextAnalysis.bpeMerges(docs, "text", 60)))
    // greedy left-to-right overlap semantics survive the delta rewrite
    val run = Seq((1L, "aaa aaa"), (2L, "abab cdcd")).toDF("doc_id", "text")
    assert(rows(TextAnalysis.bpeMergesDelta(run, "text", 6))
      == rows(TextAnalysis.bpeMerges(run, "text", 6)))
    // the loop frees every per-round checkpoint it takes (superseded
    // rounds immediately, the final pair on return) — an unbounded
    // merge loop must not accumulate vocab-sized RDD blocks
    val before = spark.sparkContext.getPersistentRDDs.keySet
    TextAnalysis.bpeMergesDelta(docs, "text", 5).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"bpeMergesDelta leaked RDD blocks: $leaked")
  }
}

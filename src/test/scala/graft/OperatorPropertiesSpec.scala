package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin
import graft.functions.TopK

/** ScalaCheck properties for the round-2 operators: as-of join vs an
  * in-memory oracle, and the bounded top-k Aggregator vs sort-take. */
class OperatorPropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(8)
    .withMaxDiscardRatio(10f)

  private def run(name: String, prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: $res")
  }

  // small epoch-second timestamps over few keys force plenty of
  // equal-ts and missing-key edge cases
  private val asofCase: Gen[(List[(Long, Int, Int)], List[(Long, Int, Int)])] =
    for {
      nl <- Gen.chooseNum(0, 25)
      nr <- Gen.chooseNum(0, 25)
      l <- Gen.listOfN(nl, for {
        k <- Gen.chooseNum(0, 3); t <- Gen.chooseNum(0, 20)
      } yield (0L, k, t))
      r <- Gen.listOfN(nr, for {
        k <- Gen.chooseNum(0, 3); t <- Gen.chooseNum(0, 20)
      } yield (0L, k, t))
    } yield (l.zipWithIndex.map { case ((_, k, t), i) => (i.toLong, k, t) },
      r.zipWithIndex.map { case ((_, k, t), i) => (i.toLong, k, t) })

  test("asof backward == in-memory oracle on random keyed event sets") {
    import spark.implicits._
    run("asof", Prop.forAll(asofCase) { case (lrows, rrows) =>
      val left = lrows.toDF("eid", "k", "t")
        .withColumn("ts", timestamp_seconds(col("t")))
      val right = rrows.toDF("rid", "k", "rt")
        .withColumn("rts", timestamp_seconds(col("rt")))
      val got = AsOfJoin.backward(left, right, "k", "ts", "rts",
          Seq("rid"), "rid")
        .select(col("eid"), col("rid")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      val oracle = lrows.map { case (eid, k, t) =>
        val m = rrows.filter(r => r._2 == k && r._3 <= t)
        eid -> (if (m.isEmpty) -1L
                else m.maxBy(r => (r._3, r._1))._1) // latest ts, max rid
      }.toMap
      got == oracle && got.size == lrows.size
    })
  }

  test("asof forward == in-memory oracle on random keyed event sets") {
    import spark.implicits._
    run("asof_fwd", Prop.forAll(asofCase) { case (lrows, rrows) =>
      val left = lrows.toDF("eid", "k", "t")
        .withColumn("ts", timestamp_seconds(col("t")))
      val right = rrows.toDF("rid", "k", "rt")
        .withColumn("rts", timestamp_seconds(col("rt")))
      val got = AsOfJoin.forward(left, right, "k", "ts", "rts",
          Seq("rid"), "rid")
        .select(col("eid"), col("rid")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      val oracle = lrows.map { case (eid, k, t) =>
        val m = rrows.filter(r => r._2 == k && r._3 >= t)
        eid -> (if (m.isEmpty) -1L
                else m.minBy(r => (r._3, r._1))._1) // earliest ts, min rid
      }.toMap
      got == oracle && got.size == lrows.size
    })
  }

  test("as-of null-ts semantics: null left ts matches nothing, both ways") {
    import spark.implicits._
    val left = Seq((1L, 0, Some(10L)), (2L, 0, None)).toDF("eid", "k", "t")
      .withColumn("ts", timestamp_seconds(col("t"))).drop("t")
    val right = Seq((100L, 0, Some(5L)), (101L, 0, Some(15L)),
        (102L, 0, None)).toDF("rid", "k", "rt")
      .withColumn("rts", timestamp_seconds(col("rt"))).drop("rt")
    def res(df: org.apache.spark.sql.DataFrame) = df
      .select(col("eid"), col("rid")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // backward: ts=10 → rid 100 (5 <= 10); null ts → no match (was: the
    // forward direction spuriously matched via desc nulls-last). The
    // null-rts right row 102 must be invisible to both directions.
    assert(res(AsOfJoin.backward(left, right, "k", "ts", "rts",
      Seq("rid"), "rid")) == Map(1L -> 100L, 2L -> -1L))
    assert(res(AsOfJoin.forward(left, right, "k", "ts", "rts",
      Seq("rid"), "rid")) == Map(1L -> 101L, 2L -> -1L))
  }

  test("connectedComponents == in-memory union-find on random graphs") {
    import spark.implicits._
    val graphGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.chooseNum(0, 20)
      edges <- Gen.listOfN(n, for {
        a <- Gen.chooseNum(0L, 14L); b <- Gen.chooseNum(0L, 14L)
        if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges
    run("components", Prop.forAll(graphGen) { edges =>
      val got = graft.operators.Dedup
        .connectedComponents(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // union-find oracle over the same edge set
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // canonical rep = min of component = find after min-directed unions
      val oracle = nodes.map(v => v -> find(v)).toMap
      got == oracle
    })
  }

  test("ngramJaccardPairs == in-memory brute force on random corpora") {
    import spark.implicits._
    val corpus: Gen[List[(Long, String)]] = for {
      n <- Gen.chooseNum(0, 15)
      docs <- Gen.listOfN(n, for {
        len <- Gen.chooseNum(0, 12)
        // tiny vocabulary on purpose: forces shared shingles + duplicates
        ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
      } yield ws.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

    def shingleSet(text: String): Set[String] = {
      val t = text.split(" ", -1)
      if (t.length < 3) Set.empty
      else (0 to t.length - 3).map(i => t.slice(i, i + 3).mkString(" ")).toSet
    }

    run("jaccard", Prop.forAll(corpus) { docs =>
      val got = operators.Dedup.ngramJaccardPairs(
          docs.toDF("doc_id", "text"), "doc_id", "text", 3, 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2))).toSet
      val expect = (for {
        (a, ta) <- docs; (b, tb) <- docs if a < b
        sa = shingleSet(ta); sb = shingleSet(tb)
        inter = (sa intersect sb).size if sa.nonEmpty || sb.nonEmpty
        uni = (sa union sb).size if uni > 0
        j = math.rint(inter.toDouble / uni * 1e6) / 1e6 if j >= 0.4
      } yield (a, b, j)).toSet
      got == expect
    })
  }

  test("IVF slack blocking == brute force on random vector sets (property)") {
    // The triangle-inequality slack proof is the most correctness-critical
    // math in the dedup family — sweep it over random low-dim vector sets,
    // thresholds, and quantizer sizes, with CLUSTERED structure (random
    // centers + noise) so blocking actually discriminates and boundary
    // pairs (dist straddling the threshold) get generated often.
    import spark.implicits._
    import graft.functions.VectorFunctions.sqDist
    import graft.operators.{Dedup, IvfIndex}
    val gen = for {
      nCenters <- Gen.chooseNum(1, 4)
      centers <- Gen.listOfN(nCenters,
        Gen.listOfN(3, Gen.chooseNum(-8.0, 8.0)))
      n <- Gen.chooseNum(2, 36)
      pts <- Gen.listOfN(n, for {
        c <- Gen.oneOf(centers)
        noise <- Gen.listOfN(3, Gen.chooseNum(-1.0, 1.0))
      } yield c.zip(noise).map { case (a, b) => a + b })
      nlist <- Gen.oneOf(1, 2, 5)
      maxSq <- Gen.chooseNum(0.5, 8.0)
    } yield (pts, nlist, maxSq)
    // forAllNoShrink: ScalaCheck shrinking ignores generator bounds and
    // produces invalid cases (nlist=0), masking the real counterexample.
    run("ivfblock", Prop.forAllNoShrink(gen) { case (pts, nlist, maxSq) =>
      val df = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "vec")
      val brute = {
        val l = df.select(col("id").as("a"), col("vec").as("va"))
        val r = df.select(col("id").as("b"), col("vec").as("vb"))
        l.join(r, col("a") < col("b"))
          .withColumn("d", round(sqDist(col("va"), col("vb")), 6))
          .filter(col("d") <= maxSq)
          .select(col("a"), col("b"))
          .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      }
      val cents = IvfIndex.fitCentroids(df, "vec", "id", nlist)
      val got = Dedup.embeddingNearDupByIvf(df, "id", "vec", cents, maxSq)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      got == brute
    })
  }

  test("topK aggregator == sorted take on random score sets") {
    import spark.implicits._
    val scored: Gen[(Int, List[(Double, Long)])] = for {
      k <- Gen.chooseNum(1, 10)
      n <- Gen.chooseNum(0, 80)
      // duplicate scores on purpose: the (score, id) tie-break must decide
      xs <- Gen.listOfN(n, Gen.chooseNum(0, 5).map(_.toDouble))
    } yield (k, xs.zipWithIndex.map { case (s, i) => (s, i.toLong) })
    run("topk", Prop.forAll(scored) { case (k, rows) =>
      val tk = TopK.topK(k)
      val got = rows.toDF("score", "id")
        .agg(tk(col("score"), col("id")).as("r"))
        .select(explode(col("r")).as("x"))
        .select(col("x.score"), col("x.id"))
        .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
      val expect = rows.sorted.take(k)
      got == expect
    })
  }

  // random keyed events over a small key/time space: plenty of
  // same-instant, boundary-exact, and cross-band pairs
  private val ivjCase: Gen[(List[(Long, Int, Int)], List[(Long, Int, Int)],
      Int, Int, Int)] =
    for {
      nl <- Gen.chooseNum(0, 30); nr <- Gen.chooseNum(0, 30)
      l <- Gen.listOfN(nl, for {
        k <- Gen.chooseNum(0, 3); t <- Gen.chooseNum(0, 600)
      } yield (0L, k, t))
      r <- Gen.listOfN(nr, for {
        k <- Gen.chooseNum(0, 3); t <- Gen.chooseNum(0, 600)
      } yield (0L, k, t))
      lo <- Gen.chooseNum(-120, 120)
      span <- Gen.chooseNum(1, 300)
      band <- Gen.oneOf(0, 7, 60, 1000) // 0 = default (= span)
    } yield (l.zipWithIndex.map { case ((_, k, t), i) => (i.toLong, k, t) },
      r.zipWithIndex.map { case ((_, k, t), i) => (i.toLong, k, t) },
      lo, span, band)

  test("banded interval join == in-memory oracle for any band width") {
    import spark.implicits._
    run("intervalJoin", Prop.forAll(ivjCase) {
      case (lrows, rrows, lo, span, band) =>
        val hi = lo + span
        val left = lrows.toDF("id", "k", "t")
          .withColumn("ts", timestamp_seconds(col("t")))
        val right = rrows.toDF("id", "k", "t")
          .withColumn("ts", timestamp_seconds(col("t")))
        val got = graft.operators.RangeJoin.intervalJoin(left, right,
            "k", "ts", "ts", lo, hi, band)
          .select(col("l_id"), col("r_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = (for {
          (lid, lk, lt) <- lrows
          (rid, rk, rt) <- rrows
          if lk == rk && rt >= lt + lo && rt < lt + hi
        } yield (lid, rid)).toSet
        got == want
    })
  }

  private val packCase: Gen[(List[Int], Int, Int)] =
    for {
      n <- Gen.chooseNum(0, 60)
      toks <- Gen.listOfN(n, Gen.chooseNum(1, 40))
      budget <- Gen.chooseNum(5, 80)
      shards <- Gen.chooseNum(1, 4)
    } yield (toks, budget, shards)

  /** The md5 shard coin, recomputed independently of Spark. */
  private def shardOf(id: Long, nShards: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"pack#$id".getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % nShards
  }

  test("packSequences == in-memory concat-then-chunk oracle") {
    import spark.implicits._
    run("pack", Prop.forAll(packCase) { case (toks, budget, shards) =>
      val rows = toks.zipWithIndex.map { case (t, i) => (i.toLong, t.toLong) }
      val got = graft.operators.Sampling.packSequences(
          rows.toDF("id", "n"), "id", col("n"), budget.toLong, shards)
        .select(col("id"), col("shard"), col("bin"), col("offset_in_bin"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = rows.groupBy { case (id, _) => shardOf(id, shards) }
        .flatMap { case (shard, members) =>
          members.sortBy(_._1)
            .scanLeft((-1L, 0L, 0L)) { case ((_, _, end), (id, n)) =>
              (id, end, end + n) // (id, start, running end)
            }.tail
            .map { case (id, start, _) =>
              (id, shard, start / budget, start % budget) }
        }.toSet
      got == want
    })
  }
}

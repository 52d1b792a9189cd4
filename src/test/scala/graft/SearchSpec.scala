package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Search

/** Golden capability test: reproduces the reference's only executable
  * workload (example_cpp/main.cpp) end-to-end — index the 229 Dutch
  * cities, kNN k=5 sorted from (52.0117, 4.3592), range r=0.1 inclusive —
  * and checks the engine against an independent plain-Scala brute force.
  * Distances are squared L2 (reference include/pktree.hpp:995-997); the
  * example prints sqrt at presentation time (main.cpp:77).
  */
class SearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val queryPoint = Seq(52.0117, 4.3592) // example_cpp/main.cpp:68

  private lazy val cities = {
    val path = getClass.getResource("/dutch_cities.csv").getPath
    spark.read.option("header", "true").csv(path)
      .select(col("city"),
        array(col("lat").cast("double"), col("lng").cast("double")).as("vec"))
      .withColumn("id", col("city")) // city names are unique in the fixture
  }

  /** Independent brute force in plain Scala. */
  private lazy val rows: Seq[(String, Double, Double)] = {
    val src = scala.io.Source.fromFile(
      getClass.getResource("/dutch_cities.csv").getPath, "UTF-8")
    try src.getLines().drop(1).map { l =>
      val p = l.split(",")
      (p(0), p(1).toDouble, p(2).toDouble)
    }.toList finally src.close()
  }
  private def sq(lat: Double, lng: Double): Double = {
    val d0 = lat - queryPoint(0); val d1 = lng - queryPoint(1)
    d0 * d0 + d1 * d1
  }

  test("golden kNN k=5 matches reference workload (brute force oracle)") {
    val expected = rows.map { case (c, la, ln) => (c, sq(la, ln)) }
      .sortBy { case (c, d) => (d, c) }.take(5)
    val got = Search.knn(cities, "vec", "id",
        array(queryPoint.map(lit): _*), k = 5, roundTo = 9)
      .select("city", "dist").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) == expected.map(_._1))
    got.zip(expected).foreach { case ((_, g), (_, e)) =>
      assert(math.abs(g - e) < 1e-6, s"dist mismatch: $g vs $e")
    }
    // the reference example's nearest city from this point is Delft
    assert(got.head._1 == "Delft")
  }

  test("golden range r=0.1 inclusive matches brute force") {
    val r = 0.1
    val expected = rows.filter { case (_, la, ln) => sq(la, ln) <= r * r }
      .map(_._1).sorted
    val got = Search.rangeSearch(cities, "vec",
        array(queryPoint.map(lit): _*), r)
      .select("city").collect().map(_.getString(0)).sorted.toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("range boundary is inclusive (dist² == r² kept)") {
    import spark.implicits._
    val df = Seq((1L, Seq(3.0, 4.0)), (2L, Seq(3.0, 4.1)))
      .toDF("id", "vec")
    // |(3,4)| = 5 exactly; r = 5 must keep it (reference pktree.hpp:1121)
    val got = Search.rangeSearch(df, "vec", array(lit(0.0), lit(0.0)), 5.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("kNN returns min(k, n) rows and is exact (random data)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val n = 300
    val data = (0 until n).map(i =>
      (i.toLong, Seq.fill(4)(rnd.nextDouble() * 100 - 50)))
    val df = data.toDF("id", "vec")
    val q = Seq.fill(4)(rnd.nextDouble() * 100 - 50)
    for (k <- Seq(0, 1, 10, n + 7)) {
      val got = Search.knn(df, "vec", "id", array(q.map(lit): _*), k,
        roundTo = 9).select("id", "dist").collect()
      assert(got.length == math.min(k, n))
      // exactness: the k-th best distance must be <= any non-member's
      val bf = data.map { case (id, v) =>
        val d = v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
        (id, d)
      }.sortBy { case (id, d) => (d, id) }
      assert(got.map(_.getLong(0)).toSeq == bf.take(math.min(k, n)).map(_._1))
    }
  }

  test("kNN duplicate points legitimately fill the result (reference #6)") {
    import spark.implicits._
    val df = (1L to 5L).map(i => (i, Seq(1.0, 1.0))).toDF("id", "vec")
    val got = Search.knn(df, "vec", "id", array(lit(1.0), lit(1.0)), 3)
      .select("id", "dist").collect()
    assert(got.length == 3)
    assert(got.forall(_.getDouble(1) == 0.0))
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L)) // id tie-break
  }

  test("hardNegatives == per-anchor kNN over the label-filtered corpus") {
    val e = Tables.load(spark, SparkTestSession.sf0001, "embeddings")
    val anchors = e.filter(col("vec_id") <= 2)
      .select(col("vec_id").as("qid"), col("embedding"), col("label"))
    val got = Search.hardNegatives(e, "embedding", "vec_id", "label",
        anchors, "embedding", "qid", "label", k = 4)
      .select(col("qid"), col("vec_id"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = anchors.collect().flatMap { a =>
      val qid = a.getLong(0)
      val lbl = a.getInt(2)
      val qv = array(a.getSeq[Float](1).map(v => lit(v.toDouble)): _*)
      Search.knn(e.filter(col("label") =!= lbl), "embedding", "vec_id",
          qv, 4)
        .select(col("vec_id")).collect().map(_.getLong(0))
        .zipWithIndex.map { case (id, i) => (qid, id, (i + 1).toLong) }
    }.toSet
    assert(got == expect)
  }

  test("knnClassify: hand-traced majority vote; vote ties break to the " +
    "smallest label") {
    import spark.implicits._
    val labeled = Seq(
      (1L, Seq(0.0), 1), (2L, Seq(0.1), 1), (3L, Seq(0.2), 2),
      (4L, Seq(10.0), 2), (5L, Seq(10.1), 2), (6L, Seq(10.2), 1))
      .toDF("vec_id", "embedding", "label")
    // A@0.0 k=3 -> {1,2,3} labels {1:2, 2:1} -> 1; B@10.1 k=3 ->
    // {4,5,6} labels {2:2, 1:1} -> 2
    val q3 = Seq((100L, Seq(0.0)), (101L, Seq(10.1)))
      .toDF("vec_id", "embedding")
    val got = Search.knnClassify(labeled, "embedding", "vec_id", "label",
        q3, "embedding", "vec_id", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((100L, 1L, 2L), (101L, 2L, 2L)), s"$got")
    // C@0.15 k=2 -> neighbors 2 (label 1) and 3 (label 2), one vote
    // each -> tie -> smallest label 1
    val qTie = Seq((200L, Seq(0.15))).toDF("vec_id", "embedding")
    val tie = Search.knnClassify(labeled, "embedding", "vec_id", "label",
        qTie, "embedding", "vec_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tie.toSeq == Seq((200L, 1L, 1L)))
  }

  test("mmrSelect: lambda trades relevance for diversity — low lambda " +
    "skips the near-duplicate of the first pick, high lambda keeps it") {
    import spark.implicits._
    def at(deg: Double) = Seq(math.cos(math.toRadians(deg)),
      math.sin(math.toRadians(deg)))
    // q at 0 deg; A@+5 (top rel), A2@+6 (near-dup of A), B@-20 (diverse)
    val cands = Seq((1L, at(5)), (2L, at(6)), (3L, at(-20)))
      .toDF("vec_id", "embedding")
    val q = Seq(1.0, 0.0)
    def picks(lambda: Double) =
      Search.mmrSelect(cands, "embedding", "vec_id", q, k = 2,
          lambda = lambda, shortlist = 3)
        .orderBy(col("sel_order")).collect().map(_.getLong(1)).toSeq
    // first pick is always the top-relevance item A
    assert(picks(0.5) == Seq(1L, 3L), "diversity: B beats the near-dup")
    assert(picks(0.95) == Seq(1L, 2L), "relevance-heavy: near-dup stays")
    // scores descend down the selection (greedy argmax each round)
    val s = Search.mmrSelect(cands, "embedding", "vec_id", q, k = 3,
        lambda = 0.5, shortlist = 3)
      .orderBy(col("sel_order")).collect().map(_.getDouble(2))
    assert(s.length == 3 && s(1) >= s(2),
      "later greedy rounds cannot find a better score than earlier ones")
  }
}

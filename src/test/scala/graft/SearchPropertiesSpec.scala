package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Search

/** ScalaCheck properties (SURVEY §5.3): ∀ random point sets & queries —
  * (a) kNN size = min(k, n); (b) kNN exactness vs in-memory brute force;
  * (c) range == filter with inclusive boundary; (d) dedup idempotence.
  * Kept to modest sizes/cases: each property evaluation runs Spark jobs. */
class SearchPropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(8)
    .withMaxDiscardRatio(10f)

  private def run(name: String, prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: $res")
  }

  private val pointSet: Gen[(Int, List[List[Double]])] = for {
    dim <- Gen.oneOf(1, 2, 3, 8)
    n <- Gen.chooseNum(0, 60)
    pts <- Gen.listOfN(n,
      Gen.listOfN(dim, Gen.chooseNum(-1e6, 1e6).map(_.toDouble)))
  } yield (dim, pts)

  test("kNN: result size = min(k, n) and matches brute force") {
    import spark.implicits._
    run("knn", Prop.forAll(pointSet, Gen.chooseNum(0, 70)) {
      case ((dim, pts), k) =>
        val df = pts.zipWithIndex.map { case (p, i) => (i.toLong, p) }
          .toDF("id", "vec")
        val q = List.fill(dim)(0.5e6)
        val got = Search.knn(df, "vec", "id", array(q.map(lit): _*), k,
            roundTo = 9)
          .select("id").collect().map(_.getLong(0)).toSeq
        val bf = pts.zipWithIndex.map { case (p, i) =>
          (i.toLong, p.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
        }.sortBy { case (id, d) => (d, id) }
          .take(math.min(k, pts.size)).map(_._1)
        got == bf
    })
  }

  test("range: equals inclusive filter (boundary kept)") {
    import spark.implicits._
    run("range", Prop.forAll(pointSet, Gen.chooseNum(0.0, 2e6)) {
      case ((dim, pts), r) =>
        val df = pts.zipWithIndex.map { case (p, i) => (i.toLong, p) }
          .toDF("id", "vec")
        val q = List.fill(dim)(0.0)
        val got = Search.rangeSearch(df, "vec", array(q.map(lit): _*), r)
          .select("id").collect().map(_.getLong(0)).toSet
        val bf = pts.zipWithIndex.collect {
          case (p, i) if p.map(x => x * x).sum <= r * r => i.toLong
        }.toSet
        got == bf
    })
  }

  test("exact dedup is idempotent") {
    import spark.implicits._
    run("dedup", Prop.forAll(Gen.listOf(Gen.chooseNum(0, 9))) { xs =>
      val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
        .toDF("id", "k")
      val once = operators.Dedup.exactByKey(df, Seq("k"), "id")
      val twice = operators.Dedup.exactByKey(once, Seq("k"), "id")
      once.collect().map(_.toSeq).toSet == twice.collect().map(_.toSeq).toSet
    })
  }
}

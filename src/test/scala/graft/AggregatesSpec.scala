package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggregatesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("approx_count_distinct (HLL) within 5% of exact at default rsd") {
    val ev = Tables.events(spark, SparkTestSession.sf0001)
    val row = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("graft_sqdist / graft_dot usable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_sqdist(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS sq,
        |       graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d
        |""".stripMargin).head()
    assert(r.getDouble(0) == 8.0)
    assert(r.getDouble(1) == 11.0)
  }

  test("GraftExtensions injects both functions (builder-level contract)") {
    // getOrCreate would return the shared session and skip extension
    // application, so assert the injection list directly.
    val names = GraftExtensions.registrations.map(_._1)
    assert(names == Seq("graft_sqdist", "graft_dot", "graft_cosine"))
  }

  test("meanVector: hand-computed centroids, no explode in the plan") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("x", Seq(1.0, 2.0, 3.0)),
      ("x", Seq(3.0, 4.0, 5.0)),
      ("y", Seq(10.0, 0.0, -2.0))).toDF("g", "vec")
    val got = operators.VectorAgg.meanVector(df, Seq("g"), "vec", 3)
      .orderBy("g")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getSeq[Double](2))).toList
    assert(got === List(
      ("x", 2L, Seq(2.0, 3.0, 4.0)),
      ("y", 1L, Seq(10.0, 0.0, -2.0))))
    // scale shape: one hash aggregate over element_at projections — a
    // posexplode formulation would show Generate in the plan
    val plan = operators.VectorAgg.meanVector(df, Seq("g"), "vec", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"))
  }

  test("centroidDrift: zero for identical snapshots, hand value for a " +
      "known shift, disjoint groups dropped") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val a = Seq(("x", Seq(1.0, 2.0)), ("x", Seq(3.0, 4.0)),
      ("y", Seq(0.0, 0.0)), ("gone", Seq(9.0, 9.0))).toDF("g", "vec")
    // x centroid moves (2,3) -> (3,4): drift = 1+1 = 2; y unmoved;
    // "gone"/"new" exist in only one snapshot — dropped
    val b = Seq(("x", Seq(2.0, 3.0)), ("x", Seq(4.0, 5.0)),
      ("y", Seq(0.0, 0.0)), ("new", Seq(1.0, 1.0))).toDF("g", "vec")
    val got = operators.VectorAgg.centroidDrift(a, b, Seq("g"), "vec", 2)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toList
    assert(got === List(("x", 2L, 2L, 2.0), ("y", 1L, 1L, 0.0)))
    val self = operators.VectorAgg.centroidDrift(a, a, Seq("g"), "vec", 2)
      .agg(sum(abs(col("drift")))).head().getDouble(0)
    assert(self == 0.0)
  }

  test("profile: null/distinct/range per column in one job; approx close") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (3L, null), (null, "b"), (5L, "c"))
      .toDF("k", "s")
    val got = operators.Profiling.profile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5)))).toMap
    assert(got("k") == ((5L, 1L, 4L, "1", "5")))
    assert(got("s") == ((5L, 1L, 3L, "a", "c")))
    // HLL path: same shape, cardinalities within the sketch's tolerance
    val li = Tables.load(spark, SparkTestSession.sf0001, "lineitem")
    val exact = operators.Profiling.profile(li, Seq("l_orderkey"))
      .head().getLong(3)
    val approx = operators.Profiling.profile(li, Seq("l_orderkey"),
      approx = true).head().getLong(3)
    // default sketch rsd is 5%; allow 2 sigma
    assert(math.abs(approx - exact).toDouble / exact <= 0.10)
  }
}

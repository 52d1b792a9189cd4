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
}

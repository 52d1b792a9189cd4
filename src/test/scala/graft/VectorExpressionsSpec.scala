package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** The fused codegen expressions must be bit-for-bit identical to their
  * builtin-composed oracles (SURVEY §7.3: custom exprs are perf-only). */
class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def compare(data: Seq[(Seq[Double], Seq[Double])]): Unit = {
    import spark.implicits._
    val df = data.toDF("a", "b")
    val out = df.select(
      VectorFunctions.sqDist(col("a"), col("b")).as("fast_sq"),
      VectorFunctions.sqDistBuiltin(col("a"), col("b")).as("ref_sq"),
      VectorFunctions.dot(col("a"), col("b")).as("fast_dot"),
      VectorFunctions.dotBuiltin(col("a"), col("b")).as("ref_dot"),
      VectorFunctions.cosine(col("a"), col("b")).as("fast_cos"),
      VectorFunctions.cosineBuiltin(col("a"), col("b")).as("ref_cos"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "sqDist differs")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), "dot differs")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(5)), "cosine differs")
    }
  }

  test("fused == builtin on random vectors (bitwise)") {
    val rnd = new scala.util.Random(1)
    val data = (1 to 50).map { _ =>
      val d = 1 + rnd.nextInt(80)
      (Seq.fill(d)(rnd.nextDouble() * 2e3 - 1e3),
        Seq.fill(d)(rnd.nextDouble() * 2e3 - 1e3))
    }
    compare(data)
  }

  test("fused == builtin on edge values") {
    compare(Seq(
      (Seq(0.0), Seq(0.0)),
      (Seq(1e308, -1e308), Seq(-1e308, 1e308)),
      (Seq(1e-320, 2e-320), Seq(0.0, 0.0)),
      (Seq.fill(64)(0.1), Seq.fill(64)(0.3))))
  }

  test("null array and length mismatch give null (zip_with parity)") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]),
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0))),
      (Some(Seq(1.0)), Some(Seq(2.0)))).toDF("a", "b")
    val rows = df.select(
      VectorFunctions.sqDist(col("a"), col("b")).as("fast"),
      VectorFunctions.sqDistBuiltin(col("a"), col("b")).as("ref"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).getDouble(0) == 1.0 && rows(2).getDouble(1) == 1.0)
  }

  test("non-nullable inputs compile under codegen (nullable override)") {
    // array(lit...) children are non-nullable; without the nullable=true
    // override the generated `isNull = true` assignment targeted the
    // literal `false` and the expression fell out of codegen. Force
    // CODEGEN_ONLY so a codegen regression fails the test instead of
    // silently falling back to interpreted eval.
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      import spark.implicits._
      val df = Seq((1.0, 2.0), (3.0, 4.0)).toDF("x", "y")
      val rows = df.select(
        VectorFunctions.sqDist(array(col("x"), col("y")),
          array(lit(0.0), lit(0.0))).as("sq"),
        VectorFunctions.dot(array(col("x"), col("y")),
          array(lit(1.0), lit(1.0))).as("dp"))
        .orderBy(col("sq")).collect()
      assert(rows(0).getDouble(0) == 5.0 && rows(0).getDouble(1) == 3.0)
      assert(rows(1).getDouble(0) == 25.0 && rows(1).getDouble(1) == 7.0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("float input arrays are cast and fold identically") {
    val e = Tables.load(spark, SparkTestSession.sf0001, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val rows = e.crossJoin(q).select(
      VectorFunctions.sqDist(col("embedding"), col("qv")).as("fast"),
      VectorFunctions.sqDistBuiltin(col("embedding"), col("qv")).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }
}

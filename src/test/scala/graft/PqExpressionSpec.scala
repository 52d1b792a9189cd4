package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex

/** Pins the primitive-loop PQ expressions (PqEncodeCodes /
  * PqResidualFromCodes) bit-for-bit against the literal-codebook builtin
  * formulations they replace — the same parity contract NearestCentroid
  * carries across the ExprKMax switch. The literal forms cost ~200 µs/row
  * (measured 43 s over 200k rows at the ×100 scale); these must be a pure
  * performance substitution, so any value drift is an oracle break. */
class PqExpressionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture(n: Int, dim: Int) = {
    // deterministic pseudo-random doubles, a few exact ties across rows
    val rows = (0 until n).map { i =>
      (i.toLong, (0 until dim).map { t =>
        if (i % 7 == 0) ((i + t) % 5).toDouble // coarse values force ties
        else math.sin(i * 31 + t).abs * 4 - 2
      })
    }
    rows.toDF("vec_id", "embedding")
  }

  test("PqEncodeCodes equals the literal argmin formulation row-for-row " +
      "(ties, coarse grids, refined codebooks)") {
    val df = fixture(400, 16)
    val p = IvfIndex.fitPq(df, "embedding", "vec_id", m = 4, ksub = 8)
    val both = df.select(col("vec_id"),
        IvfIndex.pqEncode(col("embedding"), p).as("fast"),
        IvfIndex.pqEncodeLiteral(col("embedding"), p).as("ref"))
      .collect()
    assert(both.nonEmpty)
    for (r <- both)
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"vec ${r.getLong(0)}: ${r.getSeq[Int](1)} != ${r.getSeq[Int](2)}")
  }

  test("PqResidualFromCodes equals sqrt(sqDist(vec, pqDecode(codes))) " +
      "bit-for-bit") {
    val df = fixture(300, 16)
    val p = IvfIndex.fitPq(df, "embedding", "vec_id", m = 4, ksub = 8)
    val coded = IvfIndex.withPqCodes(df, "embedding", p)
    val both = IvfIndex.withPqResiduals(coded, "embedding", p)
      .withColumn("ref", sqrt(graft.functions.VectorFunctions.sqDist(
        col("embedding").cast("array<double>"),
        IvfIndex.pqDecode(col(IvfIndex.PqCol), p))))
      .select(col("vec_id"), col(IvfIndex.PqResCol), col("ref"))
      .collect()
    for (r <- both)
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1))
          == java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
  }

  test("degenerate inputs: null element zeroes its subspace's code and " +
      "nulls the residual; null vector gives all-zero codes, null residual") {
    val p = IvfIndex.fitPq(fixture(64, 8), "embedding", "vec_id", m = 2,
      ksub = 4)
    val rows = Seq(
      (0L, Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0, null, 1.0, 1.0, 1.0)),
      (1L, null)
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
    val coded = IvfIndex.withPqCodes(rows, "embedding", p)
    val got = IvfIndex.withPqResiduals(coded, "embedding", p)
      .orderBy(col("vec_id")).collect()
    // null element in subspace 1 → that code 0 (literal-path parity: the
    // null-distance struct sorts first), residual null
    val codes0 = got(0).getSeq[Int](got(0).fieldIndex(IvfIndex.PqCol))
    assert(codes0(1) == 0)
    assert(got(0).isNullAt(got(0).fieldIndex(IvfIndex.PqResCol)))
    // literal-path parity on the intact subspace 0
    val lit0 = rows.filter(col("vec_id") === 0)
      .select(IvfIndex.pqEncodeLiteral(col("embedding"), p)).head()
      .getSeq[Int](0)
    assert(codes0(0) == lit0(0))
    // null vector → all-zero codes (documented stricter divergence),
    // null residual
    val codes1 = got(1).getSeq[Int](got(1).fieldIndex(IvfIndex.PqCol))
    assert(codes1 == Seq(0, 0))
    assert(got(1).isNullAt(got(1).fieldIndex(IvfIndex.PqResCol)))
  }
}

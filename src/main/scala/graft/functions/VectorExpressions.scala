package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Custom Catalyst expressions for the vector hot path (SURVEY §7.3: perf
  * only — semantics identical to the builtin-composed forms, which remain
  * the oracle).
  *
  * Why: `aggregate(zip_with(a, b, ...))` materializes an intermediate
  * array and evaluates two lambda closures per element; these fused loops
  * run the whole reduction in one codegen'd pass over the unsafe array
  * data — no allocation, no virtual calls — and stay inside whole-stage
  * codegen like any builtin.
  *
  * Arithmetic is the same left-to-right double fold as the builtin form,
  * so results are bit-for-bit identical (DuckDB-oracle parity preserved).
  *
  * Nulls: expression is null if either array is null, if lengths differ
  * (zip_with would pad with null and poison the sum), or if any element is
  * null — matching the builtin composition's null semantics.
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // Can return null even for non-null inputs (length mismatch / null
  // element). Without this override, non-nullable children make
  // `ev.isNull` the literal `false` and the generated `isNull = true;`
  // assignment fails to compile — silently dropping the whole plan out of
  // whole-stage codegen into interpreted eval.
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  /** Java statement: combine element doubles `xv`,`yv` into accumulator `s`. */
  protected def combine(s: String, xv: String, yv: String): String
  /** Scala-side combine for interpreted eval. */
  protected def combineEval(x: Double, y: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += combineEval(x.getDouble(i), y.getDouble(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    ${combine(s, s"$a.getDouble($i)", s"$b.getDouble($i)")}
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })
}

/** Squared L2 distance: SUM_i (a_i - b_i)², index order — the reference's
  * distance accumulation (include/pktree.hpp:995-997) as one fused loop. */
case class SqDistL2(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_sqdist"
  override protected def combine(s: String, xv: String, yv: String): String =
    s"final double ${s}_d = $xv - $yv; $s += ${s}_d * ${s}_d;"
  override protected def combineEval(x: Double, y: Double): Double = {
    val d = x - y; d * d
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistL2 =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity in ONE pass: dot, |a|², |b|² accumulate in the same
  * loop (the composed form `dot/(sqrt(dot(a,a))*sqrt(dot(b,b)))` walks
  * the arrays three times), then the identical final arithmetic — so the
  * result is bit-for-bit the composed form's. Zero-norm inputs yield 0.0
  * (matches VectorFunctions.cosineBuiltin's guard). */
case class CosineSim(left: Expression, right: Expression)
    extends VectorFold {
  override def prettyName: String = "graft_cosine"
  // unused by this class (eval/codegen overridden), required by the base
  override protected def combine(s: String, xv: String, yv: String): String = ""
  override protected def combineEval(x: Double, y: Double): Double = 0.0

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      d += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else d / denom
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val den = ctx.freshName("den")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $d = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double ${d}_x = $a.getDouble($i);
         |    final double ${d}_y = $b.getDouble($i);
         |    $d += ${d}_x * ${d}_y; $na += ${d}_x * ${d}_x; $nb += ${d}_y * ${d}_y;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    ${ev.value} = ($den == 0.0) ? 0.0 : $d / $den;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Dot product: SUM_i a_i * b_i, index order. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_dot"
  override protected def combine(s: String, xv: String, yv: String): String =
    s"$s += $xv * $yv;"
  override protected def combineEval(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** EARLY-EXIT ball predicate: `sqdist(a, b) <= r²` (or `<` when
  * `strict`) with the accumulation abandoned the moment the partial sum
  * already exceeds the bound — the reference's per-element distance
  * cutoff (include/pktree.hpp:1121: `if (dist>range) return`), the last
  * of its scan-loop optimizations. Sound and EXACT because squared
  * terms are non-negative and IEEE addition of a non-negative operand
  * is monotone: a partial sum over the bound proves the full sum is
  * too, so the predicate's value — though not the abandoned sum — is
  * bit-identical to comparing the fully-accumulated distance. (No
  * cosine analog exists: dot-product partial sums aren't monotone.)
  *
  * Planted ONLY by the optimizer rule (IndexAwareRules.FuseBallPredicate)
  * into top-level Filter conjuncts, never user-facing, because its null
  * semantics are filter-exact rather than expression-exact: a vector
  * pair whose sqdist would be NULL (length mismatch / null element) may
  * yield `false` here when the exit fires before the offending element
  * is reached. Under a Filter conjunct null and false are both "drop
  * the row", so the rewrite is semantics-preserving there — and only
  * there (inside NOT(...) it would not be; the rule never looks inside
  * one). */
case class SqDistWithin(left: Expression, right: Expression,
                        bound: Expression, strict: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with org.apache.spark.sql.catalyst.expressions.Predicate {
  import org.apache.spark.sql.types.BooleanType

  override def prettyName: String =
    if (strict) "graft_sqdist_within_strict" else "graft_sqdist_within"
  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = bound
  override def nullable: Boolean = true
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val arraysOk = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (arraysOk && bound.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>, double), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}, ${bound.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any, r2v: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val r2 = r2v.asInstanceOf[Double]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      // Early exit on the NEGATED keep-condition (not `s > r2`): once any
      // element is NaN the partial sum is NaN forever, and `NaN > r2` is
      // false — a positive exit test would run to completion and KEEP a
      // row whose unfused `sqdist <= r2` comparison is false (Spark
      // orders NaN above every double). `!(NaN <= r2)` bails instead.
      if (!(if (strict) s < r2 else s <= r2)) return false // early exit
      i += 1
    }
    true // completion implies the bound held at every step, incl. the last
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, r2) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      // negated keep-condition, same reason as nullSafeEval: a NaN partial
      // sum must bail (→ false), matching the unfused NaN-drops-row filter
      val keepCmp = if (strict) "<" else "<="
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  boolean $out = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double ${s}_d = $a.getDouble($i) - $b.getDouble($i);
         |    $s += ${s}_d * ${s}_d;
         |    if (!($s $keepCmp $r2)) { $out = true; break; }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = !$out; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SqDistWithin =
    copy(left = newFirst, right = newSecond, bound = newThird)
}

/** All IVF-list memberships of one vector under slack expansion, with the
  * home (nearest) list flagged — ONE primitive-array pass per row over a
  * plan-constant centroid matrix.
  *
  * Why an Expression and not `transform`/`filter`/`array_min` over a
  * centroid literal: higher-order functions evaluate their lambda
  * INTERPRETED per element — measured ~40 µs per 64-dim distance, which
  * made the auto-sized (nlist = 625) assignment scan 492 s of q51's
  * 505 s at sf1. This pass runs the same arithmetic as tight Java loops
  * over primitive double[][] (the matrix is decoded from the literal
  * once per task, not per row): ~0.04 µs per distance, three orders of
  * magnitude less. CodegenFallback is fine — the loop body IS the work;
  * there is no surrounding expression to fuse with.
  *
  * Contract (bit-identical to the HoF formulation it replaces):
  * membership iff sqrt(d²(v, c)) <= sqrt(min d²) + slack; home = argmin
  * by (d², list_id) with ties to the smallest list_id (rows arrive
  * sorted by list_id). Null/length-mismatch vectors yield null. */
case class IvfMemberships(child: Expression,
                          listIds: Array[Int],
                          centroids: Array[Array[Double]],
                          slack: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def prettyName: String = "graft_ivf_memberships"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("list_id", IntegerType, nullable = false),
    StructField("is_home", BooleanType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName requires array<double>, got ${other.sql}")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val k = centroids.length
    if (k == 0) return new GenericArrayData(Array.empty[Any])
    val dim = centroids(0).length
    if (x.numElements() != dim) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      v(i) = x.getDouble(i); i += 1
    }
    val d = new Array[Double](k)
    var dMin = Double.MaxValue
    var home = 0
    var j = 0
    while (j < k) {
      val c = centroids(j)
      var s = 0.0; var t = 0
      while (t < dim) { val df = v(t) - c(t); s += df * df; t += 1 }
      d(j) = s
      if (s < dMin) { dMin = s; home = j } // strict < = smallest-id tie
      j += 1
    }
    val bound = math.sqrt(dMin) + slack
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    j = 0
    while (j < k) {
      if (math.sqrt(d(j)) <= bound)
        out += InternalRow(listIds(j), j == home)
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): IvfMemberships = copy(child = newChild)
}

/** Rademacher random projection of one vector: out[j] =
  * roundHalfUp(Σ_i v[i]·sign(i,j) / scale, roundTo) — the JL dimension
  * cut as ONE primitive pass per row over a plan-constant ±1 sign
  * matrix (precomputed from the md5 family by the caller).
  *
  * Exists for the same reason as IvfMemberships: the
  * `aggregate(sequence(...))` higher-order formulation evaluates its
  * lambda interpreted per term — outDim × dim × ~40 µs made the q153
  * projection scan 45 s at sf1. The fold order (i ascending, 0.0 init)
  * and the HALF_UP rounding match Spark's `aggregate`+`round` exactly,
  * so results are bit-for-bit identical to the HoF form and the DuckDB
  * oracle. Null vector / length mismatch / null element → null. */
case class RademacherProject(child: Expression,
                             signs: Array[Array[Int]],
                             scale: Double, roundTo: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def prettyName: String = "graft_rademacher_project"
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName requires array<double>, got ${other.sql}")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val outDim = signs.length
    if (outDim == 0) return new GenericArrayData(Array.empty[Double])
    val dim = signs(0).length
    if (x.numElements() != dim) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      v(i) = x.getDouble(i); i += 1
    }
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      val sj = signs(j)
      var s = 0.0; var t = 0
      while (t < dim) {
        s = if (sj(t) > 0) s + v(t) else s - v(t)
        t += 1
      }
      out(j) = java.math.BigDecimal.valueOf(s / scale)
        .setScale(roundTo, java.math.RoundingMode.HALF_UP).doubleValue()
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): RademacherProject = copy(child = newChild)
}

/** Nearest centroid of one vector over a plan-constant centroid matrix:
  * struct(d, c) with d = round(sqDist(v, centroid_c), roundTo) minimal,
  * ties to the smallest centroid id — bit-identical to the
  * `array_min(array(struct(round(sqDist(v, c_i)), i) ...))` formulation
  * Clustering.kmeans uses at small k (struct comparison is
  * lexicographic: smallest rounded distance, then smallest id).
  *
  * Exists for the same reason as IvfMemberships: at SemDeDup's auto-k
  * (k ≈ √n — 670 at sf10) the literal-tree formulation is a ~90,000-node
  * expression that analysis walks repeatedly and codegen can't hold
  * (64 KB method limit → interpreted fallback); this is one primitive
  * double[][] pass per row, matrix decoded once per task. The
  * accumulation is the same ascending-index IEEE sum as SqDistL2 and the
  * rounding the same HALF_UP BigDecimal as Spark's `round`, so the two
  * paths agree bit-for-bit (ClusteringSpec pins the parity across the
  * switch threshold). Null vector / length mismatch / null element →
  * null row, matching the builtin composition's null poisoning. */
case class NearestCentroid(child: Expression,
                           centroids: Array[Array[Double]],
                           roundTo: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.InternalRow

  override def prettyName: String = "graft_nearest_centroid"
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("c", IntegerType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName requires array<double>, got ${other.sql}")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val k = centroids.length
    if (k == 0) return null
    val dim = centroids(0).length
    if (x.numElements() != dim) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      v(i) = x.getDouble(i); i += 1
    }
    var bestD = 0.0
    var best = -1
    var j = 0
    while (j < k) {
      val c = centroids(j)
      var s = 0.0; var t = 0
      while (t < dim) { val df = v(t) - c(t); s += df * df; t += 1 }
      // BigDecimal.valueOf throws NumberFormatException on NaN/Infinity;
      // Spark's round() (RoundBase) passes them through — mirror that, or
      // one NaN embedding element hard-fails the whole job at k > ExprKMax
      // where the literal path would have propagated it.
      val d = if (java.lang.Double.isNaN(s) || java.lang.Double.isInfinite(s)) s
        else java.math.BigDecimal.valueOf(s)
          .setScale(roundTo, java.math.RoundingMode.HALF_UP).doubleValue()
      // Double.compare matches Spark's double ordering for this argmin
      // (NaN above every value and equal to itself; negative zero cannot
      // arise from a sum of squares), so ties-to-smallest-id via strict <
      // stays bit-identical to array_min over the literal struct array
      // even when some — or all — distances are NaN/Infinite.
      if (best == -1 || java.lang.Double.compare(d, bestD) < 0) {
        bestD = d; best = j
      }
      j += 1
    }
    InternalRow(bestD, best)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)
}

/** PQ sub-centroid codes of one vector over a plan-constant codebook
  * tensor [m][ksub][subDim]: array<int> of the per-subspace argmin codes.
  * Bit-identical to the literal formulation
  * `array(array_min(transform(book_j, c -> struct(sqDist(slice_j, c), id)))
  * .getField("id") ...)` (IvfIndex.pqEncodeLiteral, kept as the spec's
  * reference): the per-subspace sum is the same ascending-index IEEE fold
  * as SqDistL2, the argmin the same smallest-distance-then-smallest-id
  * order (Double.compare handles NaN exactly like Spark's struct
  * comparison: NaN above every value, so NaN distances lose to any real
  * one and an all-NaN subspace keeps code 0), and a null element yields
  * code 0 for its subspace exactly as the literal path's null-distance
  * structs sort first in array_min. One documented divergence: a null
  * vector or wrong TOTAL length yields all-zero codes, where the literal
  * path zeroes only the subspaces whose slice underruns — the stricter
  * form, pinned in the spec (no fixture and no caller produces
  * malformed-length vectors; the require in fitPq fixes dim = m·subDim).
  *
  * Exists because the literal formulation costs ~200 µs/row: per row it
  * allocates m·ksub candidate structs plus slices and falls out of
  * whole-stage codegen (the ×100 bench measured the encode pass at 43 s
  * for 200k rows — 85% of q76's budget excess). This is one primitive
  * double[][][] pass, matrix decoded once per task, no per-row
  * allocation beyond the output array. */
case class PqEncodeCodes(child: Expression,
                         codebooks: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def prettyName: String = "graft_pq_encode"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def m = codebooks.length
  private def subDim = codebooks(0)(0).length

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName requires array<double>, got ${other.sql}")
    }

  // the literal path yields code 0 per subspace on any degenerate input
  // (null distances sort first in array_min); mirror it, including for a
  // NULL child — hence eval, not nullSafeEval
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = child.eval(input)
    val codes = new Array[Int](m)
    if (a == null) return new GenericArrayData(codes)
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != m * subDim) return new GenericArrayData(codes)
    var j = 0
    while (j < m) {
      val book = codebooks(j)
      val off = j * subDim
      var degenerate = false
      var t = 0
      while (t < subDim && !degenerate) {
        if (x.isNullAt(off + t)) degenerate = true
        t += 1
      }
      if (!degenerate) {
        var bestD = 0.0
        var best = -1
        var c = 0
        while (c < book.length) {
          val cent = book(c)
          var s = 0.0
          var u = 0
          while (u < subDim) {
            val df = x.getDouble(off + u) - cent(u); s += df * df; u += 1
          }
          if (best == -1 || java.lang.Double.compare(s, bestD) < 0) {
            bestD = s; best = c
          }
          c += 1
        }
        codes(j) = best
      }
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqEncodeCodes = copy(child = newChild)
}

/** PQ reconstruction residual ||x − decode(codes)|| from the STORED code
  * column: one primitive pass of m·subDim subtract-squares (the coded
  * sub-centroid looked up per subspace) accumulated in ascending
  * dimension order — the identical partial-sum sequence to
  * `sqrt(sqDist(vec, pqDecode(codes)))` (subspaces are contiguous
  * ascending slices), so the stored residual is bit-identical while
  * skipping the per-row decode materialization that dominated the ×100
  * encode pass. Null vector, wrong vector length, null element, null or
  * out-of-range code → null, matching the builtin composition's null
  * poisoning. */
case class PqResidualFromCodes(left: Expression, right: Expression,
                               codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._

  override def prettyName: String = "graft_pq_residual"
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  private def m = codebooks.length
  private def subDim = codebooks(0)(0).length

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName requires (array<double>, array<int>), " +
              s"got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    if (x.numElements() != m * subDim || codes.numElements() != m) return null
    var s = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= codebooks(j).length) return null
      val cent = codebooks(j)(c)
      val off = j * subDim
      var t = 0
      while (t < subDim) {
        if (x.isNullAt(off + t)) return null
        val df = x.getDouble(off + t) - cent(t); s += df * df; t += 1
      }
      j += 1
    }
    math.sqrt(s)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqResidualFromCodes =
    copy(left = newLeft, right = newRight)
}

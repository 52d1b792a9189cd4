package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

import graft.functions.SqDistL2
import graft.operators.GridIndex.{cellsForBall, GridSpec}

/** Catalyst optimizer rule that makes ball-search predicates index-aware
  * WITHOUT the caller doing anything: a filter
  * `graft_sqdist(vec, <literal q>) <= r²` over a registered cell-bucketed
  * parquet index gains a `cell_id IN (<cells overlapping the ball>)`
  * conjunct, which Spark's existing pushdown then turns into parquet
  * row-group pruning. The rewrite is the declarative form of the
  * reference's three-way node classification (include/pktree.hpp:1161:
  * fully-outside subtrees are never visited) — SURVEY §7.2 step 9.
  *
  * Lossless by construction: `cellsForBall` over-approximates (every cell
  * whose box intersects the ball is kept), the exact predicate still
  * runs, and the rule only ever ANDs a superset filter. Applied once per
  * filter (guarded by an existing cell_id conjunct check).
  */
object IndexAwareRules {

  /** Driver-side registry: parquet index root path -> grid geometry.
    * Metadata-sized (a few doubles per index). */
  private val registry = TrieMap.empty[String, GridSpec]

  private def normalize(path: String): String =
    new org.apache.hadoop.fs.Path(path).toUri.getPath

  def registerIndex(path: String, spec: GridSpec): Unit =
    registry.put(normalize(path), spec)

  def clear(): Unit = registry.clear()

  /** Max literal cells to inline; larger candidate sets would bloat the
    * plan (and the ball already covers most of the index anyway). */
  private val MaxCells = 4096

  /** Install on a live session (spark.experimental) — the config-free
    * path used by tests and interactive sessions. GraftExtensions wires
    * the same rule through SparkSessionExtensions for config-driven
    * deployments. */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[PruneBallSearch.type]))
      spark.experimental.extraOptimizations = existing :+ PruneBallSearch
  }

  object PruneBallSearch extends Rule[LogicalPlan] with PredicateHelper {

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, child) =>
        specFor(child) match {
          case Some((spec, cellAttr)) if !hasCellConjunct(cond, cellAttr) =>
            val conjuncts = splitConjunctivePredicates(cond)
            conjuncts.flatMap(ballOf(_, child)).headOption match {
              case Some((q, r)) =>
                val cells = cellsForBall(spec, q, r)
                if (cells.nonEmpty && cells.size <= MaxCells)
                  Filter(And(cond,
                    In(cellAttr, cells.map(Literal(_)))), child)
                else f
              case None => f
            }
          case _ => f
        }
    }

    /** The grid spec + cell_id attribute, if `plan` reads a registered
      * index (directly or through projections that keep cell_id). */
    private def specFor(plan: LogicalPlan): Option[(GridSpec, Attribute)] = {
      val cellAttr = plan.output.find(a =>
        a.name == "cell_id" && a.dataType == LongType)
      val spec = plan.collectFirst {
        case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.flatMap(p =>
            registry.get(normalize(p.toString))).headOption
      }.flatten
      for (s <- spec; a <- cellAttr) yield (s, a)
    }

    private def hasCellConjunct(cond: Expression, cell: Attribute): Boolean =
      splitConjunctivePredicates(cond).exists {
        case In(a: Attribute, _) => a.semanticEquals(cell)
        case EqualTo(a: Attribute, _) => a.semanticEquals(cell)
        case _ => false
      }

    /** Extract (query center, radius) from `sqdist(vec, lit) <= lit(r²)`
      * (either operand order; vec must be an output attribute so the
      * geometry applies to stored rows). */
    private def ballOf(e: Expression,
                       child: LogicalPlan): Option[(Seq[Double], Double)] = {
      def lits(x: Expression): Option[Seq[Double]] = x match {
        case Literal(a: ArrayData, ArrayType(DoubleType, _)) =>
          Some(a.toDoubleArray().toSeq)
        case _ => None
      }
      def fromSq(sq: SqDistL2, bound: Expression): Option[(Seq[Double], Double)] =
        (sq.left, sq.right, bound) match {
          case (_: Attribute, qv, Literal(r2: Double, DoubleType)) if r2 >= 0 =>
            lits(qv).map(q => (q, math.sqrt(r2)))
          case (qv, _: Attribute, Literal(r2: Double, DoubleType)) if r2 >= 0 =>
            lits(qv).map(q => (q, math.sqrt(r2)))
          case _ => None
        }
      e match {
        case LessThanOrEqual(sq: SqDistL2, b) => fromSq(sq, b)
        case GreaterThanOrEqual(b, sq: SqDistL2) => fromSq(sq, b)
        case LessThan(sq: SqDistL2, b) => fromSq(sq, b) // strict ⊂ inclusive
        case _ => None
      }
    }
  }
}

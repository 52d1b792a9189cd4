package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling: the schema-shaped summary an ingestion pipeline
  * computes before heavier work — row count, null counts, distinct
  * cardinalities, value ranges per column. The reference has no notion
  * of table statistics (its whole data model is one in-memory point
  * collection, include/pktree.hpp:44); this is declared extension
  * surface, and the everyday first step of profiling 100 TB of new
  * parquet before admitting it to a training corpus.
  *
  * Scale design: ONE full-scan aggregate job computes every column's
  * statistics together. With exact distinct counts Spark plans the
  * multi-count_distinct via Expand (|cols|-way row multiplication in
  * the map stage — still a single shuffle, partial-aggregated); pass
  * approx = true to swap in HLL approx_count_distinct sketches, which
  * fold all columns in one non-expanded pass — the right profile at
  * 100 TB, where a ±2% cardinality estimate steers the same decisions.
  * The unpivot to one-row-per-column happens AFTER aggregation on a
  * single driver-sized row (stack over |cols| tuples — never a shuffle).
  */
object Profiling {

  /** @param approx HLL distinct counts instead of exact (one pass, no
    *               Expand; non-deterministic across engines, so the
    *               oracle-anchored contract uses exact)
    * @return one row per profiled column, ordered by name:
    *         (column_name, n_rows, n_null, n_distinct, min_val, max_val)
    *         — min/max cast to string after aggregating on the native
    *         type, so numeric columns range numerically
    */
  def profile(df: DataFrame, cols: Seq[String],
              approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "give at least one column to profile")
    cols.foreach(c => require(df.columns.contains(c), s"no column $c"))
    def nd(c: String): Column =
      if (approx) approx_count_distinct(col(c)) else count_distinct(col(c))
    val aggExprs: Seq[Column] =
      count(lit(1)).as("__rows") +: cols.flatMap { c =>
        Seq(
          sum(col(c).isNull.cast("long")).as(s"__null__$c"),
          nd(c).as(s"__nd__$c"),
          min(col(c)).cast("string").as(s"__min__$c"),
          max(col(c)).cast("string").as(s"__max__$c"))
      }
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __rows, `__null__$c`, `__nd__$c`, `__min__$c`, `__max__$c`")
      .mkString(", ")
    one.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_rows, n_null, n_distinct, min_val, max_val)")
      .orderBy(col("column_name"))
  }
}

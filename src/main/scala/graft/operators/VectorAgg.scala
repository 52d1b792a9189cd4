package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vector-column aggregation: elementwise pooling of fixed-dim vectors
  * per group — chunk→document embedding pooling, per-cluster centroid
  * computation, class prototypes. The reference has no aggregation at
  * all; this is the vector-native member of the extension aggregate
  * family (SURVEY.md §2B).
  */
object VectorAgg {

  /** Per-group elementwise mean and member count: one hash aggregation
    * with `dim` scalar avg aggregates over `element_at` projections.
    *
    * Scale shape: deliberately NOT posexplode + groupBy(group, pos) —
    * that shuffles rows × dim records; this shuffles one partial state
    * per group per partition (map-side combine on every aggregate), the
    * same plan shape as any wide numeric rollup. dim is a schema
    * constant, so the wide agg list is fixed at plan time.
    *
    * @return (groupCols…, n, mean_vec: array<double> of length dim)
    */
  def meanVector(df: DataFrame, groupCols: Seq[String], vecCol: String,
                 dim: Int): DataFrame = {
    require(dim > 0 && groupCols.nonEmpty, "need dim > 0 and group keys")
    val v = col(vecCol).cast("array<double>")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        array((1 to dim).map(i => avg(element_at(v, i))): _*)
          .as("mean_vec"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the single right row with the
  * greatest timestamp <= the left timestamp (per join key) — the standard
  * point-in-time lookup of feature/training pipelines ("the user's state
  * when the event happened").
  *
  * Scale design: the naive formulation is a range join (left.ts >=
  * right.ts) whose output explodes to O(|left| × matches) before a
  * per-row argmax. Instead both sides are UNIONED and sorted once inside
  * each key partition; a running `last(right_payload, ignoreNulls)` window
  * carries the most recent right row forward onto each left row. Exactly
  * one shuffle (by key), no range-join blowup, no driver-side state —
  * at 100 TB this is a single sort-merge pass, skew keys handled by AQE.
  *
  * Determinism: right rows tie-broken by `rightTieBreak` ascending — the
  * LAST one under the window order wins, i.e. the max tie-break value.
  * Right rows sort BEFORE left rows at the same timestamp, so the match is
  * inclusive (right.ts == left.ts matches), mirroring the reference's
  * inclusive boundary convention (include/pktree.hpp:1121).
  */
object AsOfJoin {

  /** @param left          probe side (keeps all rows; unmatched -> null)
    * @param right         state side
    * @param key           equi-join key column name (same name both sides)
    * @param leftTs        left event-time column
    * @param rightTs       right event-time column
    * @param rightPayload  right columns to carry onto matched left rows
    * @param rightTieBreak unique right column breaking equal-timestamp ties
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightPayload: Seq[String],
               rightTieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct((rightTs +: rightTieBreak +: rightPayload)
      .distinct.map(col): _*)

    // A state row without a timestamp cannot participate in an as-of
    // match (there is no "as of when"); dropped on both directions so
    // backward and forward agree on null semantics.
    val r = right.filter(col(rightTs).isNotNull).select(
      col(key),
      col(rightTs).cast("timestamp").as("__t"),
      lit(0).as("__side"),
      payload.as("__rv"),
      // left columns as typed nulls so the union lines up
      struct(leftCols.map(c => lit(null).cast(left.schema(c).dataType)
        .as(c)): _*).as("__lv"))
    val l = left.select(
      col(key),
      col(leftTs).cast("timestamp").as("__t"),
      lit(1).as("__side"),
      lit(null).cast(r.schema("__rv").dataType).as("__rv"),
      struct(leftCols.map(col): _*).as("__lv"))

    // Right rows first at equal __t (inclusive match); among equal-ts right
    // rows the greatest tie-break sorts last and therefore wins last().
    // Ascending puts null-__t left rows FIRST: no preceding right row →
    // null match (a left row without a timestamp matches nothing).
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = r.unionByName(l)
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val outLeft = leftCols.map(c => col(s"__lv.$c").as(c))
    val outRight = rightPayload.map(c => col(s"__match.$c").as(c))
    matched.select(outLeft ++ outRight: _*)
  }

  /** Forward as-of join: the single right row with the SMALLEST timestamp
    * >= the left timestamp per key ("the next event after this point").
    * Same one-shuffle union+window mechanics as `backward`, with the
    * window looking forward; equal-timestamp right rows still match
    * (inclusive) and ties resolve to the SMALLEST `rightTieBreak`. */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTs: String, rightTs: String,
              rightPayload: Seq[String],
              rightTieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct((rightTs +: rightTieBreak +: rightPayload)
      .distinct.map(col): _*)

    val r = right.filter(col(rightTs).isNotNull).select(
      col(key),
      col(rightTs).cast("timestamp").as("__t"),
      lit(0).as("__side"),
      payload.as("__rv"),
      struct(leftCols.map(c => lit(null).cast(left.schema(c).dataType)
        .as(c)): _*).as("__lv"))
    val l = left.select(
      col(key),
      col(leftTs).cast("timestamp").as("__t"),
      lit(1).as("__side"),
      lit(null).cast(r.schema("__rv").dataType).as("__rv"),
      struct(leftCols.map(col): _*).as("__lv"))

    // Mirror of backward: order by time DESCENDING so "first right row at
    // or after ts" becomes the running last(). At equal __t, __side
    // ASCENDING keeps right rows (0) ahead of left rows (1) — inclusive
    // equal-timestamp match; __rv descending makes the SMALLEST tie-break
    // the nearest preceding right row, i.e. the winner. desc_nulls_first
    // (NOT plain desc, whose nulls-last would hand null-__t left rows the
    // running last() of the whole partition): null-timestamp left rows
    // sort first and match nothing — the same null semantics as backward.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").desc_nulls_first, col("__side"), col("__rv").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = r.unionByName(l)
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val outLeft = leftCols.map(c => col(s"__lv.$c").as(c))
    val outRight = rightPayload.map(c => col(s"__match.$c").as(c))
    matched.select(outLeft ++ outRight: _*)
  }
}

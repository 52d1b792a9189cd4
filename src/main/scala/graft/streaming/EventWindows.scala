package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured-Streaming surface over the events table (SURVEY.md §2B
  * streaming): event-time tumbling/sliding window aggregation with
  * watermarked late-data handling, and a foreachBatch incremental index
  * append (the distributed analog of the reference's online `insert`,
  * include/pktree.hpp:1262-1355 — mutation becomes micro-batch append).
  *
  * The batch query q14_events_window and `tumblingCounts` share the same
  * groupBy, so the streaming path is oracle-checked through its batch
  * twin; the streaming-specific machinery (source, watermark, sink) is
  * covered by ScalaTest with a file source driven to completion.
  */
object EventWindows {

  /** events schema after ts normalization (see Tables.events). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos (nanosAsLong read)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def normalize(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))

  /** The shared aggregation: tumbling event-time window counts + sums.
    * Works identically on a batch or streaming DataFrame. */
  def tumblingCounts(events: DataFrame, windowLen: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen).getField("start").as("wstart"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))

  /** Sliding event-time windows (length windowLen, hop slideLen): each
    * event lands in length/hop windows. Batch or streaming. */
  def slidingCounts(events: DataFrame, windowLen: String,
                    slideLen: String): DataFrame =
    events
      .groupBy(
        window(col("ts"), windowLen, slideLen).getField("start").as("wstart"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Streaming source over parquet events. Accepts a directory, or a
    * single file (FileStreamSource requires a directory base path, so a
    * file is read via its parent + pathGlobFilter). */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    val f = new java.io.File(path)
    val reader = spark.readStream.schema(schema)
    val src =
      if (f.isFile)
        reader.option("pathGlobFilter", f.getName).parquet(f.getParent)
      else reader.parquet(path)
    normalize(src)
  }

  /** Watermarked streaming tumbling counts → memory sink (for tests) or
    * any sink the caller attaches. Late rows beyond the watermark are
    * dropped — the documented late-data policy. */
  def streamingTumblingCounts(events: DataFrame, windowLen: String,
                              watermark: String): DataFrame =
    tumblingCounts(events.withWatermark("ts", watermark), windowLen)

  /** In-flight exact dedup: drop re-delivered rows by key while they are
    * inside the watermark horizon. State is BOUNDED — a key's entry
    * expires once the watermark passes it, so state size tracks the
    * late-data window, not the stream length. The streaming twin of
    * batch Dedup.exactByKey for at-least-once sources. */
  def dedupWithinWatermark(events: DataFrame, watermark: String,
                           keys: Seq[String] = Seq("event_id")): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** foreachBatch incremental index append — the reference-insert analog:
    * each micro-batch is cell-bucketed and appended to the index path.
    * Periodic compaction (rebuild) keeps file counts bounded, exactly like
    * the reference's periodic restructure.
    *
    * The spec is the caller's FIXED geometry: when appending to an index
    * written by `VectorIndex.save`, read it from the `_graft_meta.json`
    * sidecar (`IndexMeta.read(spark, indexPath).get.gridSpec.get`) — never
    * re-fit from data, the stored cell ids live in the saved geometry
    * (out-of-extent points clamp to border cells; pruning stays lossless
    * because query-side enumeration clamps identically). */
  def appendingIndexSink(events: DataFrame, spec: graft.operators.GridIndex.GridSpec,
                         vecCol: String, indexPath: String,
                         checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.GridIndex.withCellId(batch.toDF(), vecCol, spec)
          .write.mode("append").parquet(indexPath)
      }
      .start()
}

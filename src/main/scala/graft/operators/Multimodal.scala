package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque binary columns
  * with typed metadata, and a partition-parallel decode / feature-extract
  * stage (north-star surface, SURVEY.md §2B).
  *
  * Design: a multimodal row is (id, blob: binary, meta: struct). All Spark
  * plumbing — schema, batch iteration, partition parallelism, output
  * schema — is real and tested; only the innermost byte-decoding call is a
  * STUB (deterministic fake features) because no image/audio codec library
  * ships in this environment. Swapping `stubDecode` for a real codec (e.g.
  * javax.imageio / a JNI codec) changes no Spark-side code.
  *
  * Scale notes: decode runs inside mapPartitions — one JVM-local pass, no
  * shuffle, vectorized parquet read of the binary column upstream. Blobs
  * never transit a shuffle: extract features first, keep (id, features),
  * drop the blob before any wide operation.
  */
object Multimodal {

  /** Typed metadata carried with every blob. */
  case class MediaMeta(format: String, nBytes: Long)

  /** A multimodal record: opaque payload + metadata. */
  case class MediaRow(id: Long, blob: Array[Byte], meta: MediaMeta)

  /** Extracted feature record (what a real image/audio decoder would
    * emit: dimensions, channel stats, an embedding, ...). */
  case class MediaFeatures(id: Long, nBytes: Long, format: String,
                           checksum: Long, histogram: Array[Long])

  /** Wrap a DataFrame with a binary column into typed MediaRow form. */
  def asMedia(df: DataFrame, idCol: String, blobCol: String,
              format: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(blobCol).as("blob"),
        struct(lit(format).as("format"),
          length(col(blobCol)).cast("long").as("nBytes")).as("meta"))
      .as[MediaRow]
  }

  /** ====== STUB ======
    * Deterministic fake decoder: a real implementation would parse the
    * container format and decode pixels/samples here. The fake computes a
    * byte-value histogram (16 buckets) and an additive checksum — fully
    * deterministic, so the surrounding pipeline is testable end-to-end. */
  private[graft] def stubDecode(blob: Array[Byte]): (Long, Array[Long]) = {
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < blob.length) {
      val b = blob(i) & 0xff
      hist(b >> 4) += 1
      sum += b
      i += 1
    }
    (sum, hist)
  }

  /** Partition-parallel feature extraction — the shape a real decode
    * stage has: iterate the partition, decode each blob, emit a narrow
    * feature row, never retain the blob. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (checksum, hist) = stubDecode(r.blob)
        MediaFeatures(r.id, r.meta.nBytes, r.meta.format, checksum, hist)
      }
    }
  }

  /** A sampled frame/chunk: fixed-size slice of the blob at a stride —
    * the video-frame-sampling shape (a real decoder would seek keyframes;
    * the slicing, fan-out and output schema are identical). */
  case class MediaFrame(id: Long, frameIdx: Int, offset: Long,
                        nBytes: Int, checksum: Long)

  /** Frame/chunk sampling: every `stride` bytes take a `frameSize` slice,
    * emit (id, frame_idx, offset, bytes, checksum) — one row per frame,
    * blob dropped immediately. Partition-parallel fan-out with NO shuffle;
    * at 100 TB the frame rows are the only thing downstream ever sees. */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int,
                   stride: Int): Dataset[MediaFrame] = {
    require(frameSize > 0 && stride > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val n = r.blob.length
        Iterator.range(0, math.max(n, 1), stride).zipWithIndex
          .takeWhile { case (off, _) => off < n }
          .map { case (off, idx) =>
            val end = math.min(off + frameSize, n)
            val slice = java.util.Arrays.copyOfRange(r.blob, off, end)
            val (checksum, _) = stubDecode(slice)
            MediaFrame(r.id, idx, off.toLong, end - off, checksum)
          }
      }
    }
  }

  /** End-to-end demo pipeline used by tests: text bytes stand in for
    * media blobs (same plumbing, deterministic content). */
  def featuresFromText(spark: SparkSession, docs: DataFrame): DataFrame = {
    val media = asMedia(
      docs.withColumn("blob", encode(col("text"), "UTF-8")),
      "doc_id", "blob", format = "text/utf-8")
    extractFeatures(media).toDF()
  }
}

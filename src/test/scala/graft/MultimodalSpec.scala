package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("binary-column pipeline runs partition-parallel and is deterministic") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val f1 = Multimodal.featuresFromText(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val f2 = Multimodal.featuresFromText(spark, docs.repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(f1 == f2)
    assert(f1.size == docs.count())
  }

  test("stub decoder computes exact byte statistics") {
    val (sum, hist) = Multimodal.stubDecode("AB".getBytes("UTF-8"))
    assert(sum == 65 + 66)
    assert(hist(4) == 2) // 'A'=0x41, 'B'=0x42 both in bucket 4
    assert(hist.sum == 2)
  }

  test("metadata rides alongside the blob with correct byte length") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "héllo")).toDF("id", "text")
      .withColumn("blob", encode(col("text"), "UTF-8"))
    val media = Multimodal.asMedia(df, "id", "blob", "text/utf-8")
    val row = media.head()
    assert(row.meta.nBytes == 6) // é is 2 bytes in UTF-8
    assert(row.meta.format == "text/utf-8")
  }

  test("frame sampling: stride fan-out, byte-exact slices, no shuffle") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
      .filter(col("doc_id") < 50) // not limit(): GlobalLimit adds an Exchange
      .withColumn("blob", encode(col("text"), "UTF-8"))
    val media = Multimodal.asMedia(docs, "doc_id", "blob", "text/utf-8")
    val frames = Multimodal.sampleFrames(media, frameSize = 32, stride = 64)
    val byDoc = frames.collect().groupBy(_.id)
    val lens = media.collect().map(m => m.id -> m.blob.length).toMap
    byDoc.foreach { case (id, fs) =>
      val n = lens(id)
      assert(fs.length == (n + 63) / 64) // ceil(n / stride) frames
      fs.foreach { fr =>
        assert(fr.nBytes == math.min(32, n - fr.offset).toInt)
      }
      assert(fs.map(_.frameIdx).sorted.toSeq == fs.indices.toSeq)
    }
    // map-only: no exchange in the plan
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}

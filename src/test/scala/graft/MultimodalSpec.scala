package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphBuilder
import graft.pipeline.Multimodal

/** Multimodal binary-column plumbing: schema, typed batch map,
  * partition-independence (no real codecs in this environment — decode is
  * a deterministic stub; the Spark plumbing is what's under test). */
class MultimodalSpec extends SparkSpec {

  private def media = {
    val implicits = spark.implicits
    import implicits._
    Multimodal.asMedia(
      GraphBuilder.table(spark, sfDir, "documents"), "doc_id", "text", "image")
      .as[Multimodal.MediaRow]
  }

  test("asMedia produces the binary media schema") {
    val df = media.toDF()
    assert(df.schema("media").dataType.typeName == "binary")
    assert(df.schema("media_id").dataType.typeName == "long")
    assert(df.count() > 0)
  }

  test("extractFeatures is deterministic and tracks payload size") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq)
    val nchars = GraphBuilder.table(spark, sfDir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("l"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    f1.foreach(f => assert(f.byte_len == nchars(f.media_id)))
    f1.foreach(f => assert(f.width >= 64 && f.height >= 64 && f.n_frames == 1))
  }

  test("feature extraction is partition-independent") {
    val sparkS = spark
    import sparkS.implicits._
    val a = Multimodal.extractFeatures(media.repartition(1)).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(media.repartition(13)).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
  }

  test("resize emits target dims and a deterministic area-sized payload") {
    val a = Multimodal.resize(media, 64, 32).collect().sortBy(_.media_id)
    val b = Multimodal.resize(media.repartition(7), 64, 32).collect().sortBy(_.media_id)
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.width == 64 && x.height == 32)
      assert(x.media.length == 64 * 32 / 8)
      assert(x.media.toSeq == y.media.toSeq) // partition-independent
    }
  }

  test("frame sampling explodes every stride-th frame for videos") {
    val implicits = spark.implicits
    import implicits._
    val vids = Multimodal.extractFeatures(
      Multimodal.asMedia(GraphBuilder.table(spark, sfDir, "documents"),
        "doc_id", "text", "video").as[Multimodal.MediaRow])
    val frames = Multimodal.sampleFrames(vids, stride = 10)
    val byId = frames.groupBy("media_id").agg(count(lit(1)).as("c"),
        first("n_frames").as("n"))
      .collect()
    byId.foreach { r =>
      val expected = (r.getAs[Int]("n") + 9) / 10
      assert(r.getAs[Long]("c") == expected)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphBuilder
import graft.pipeline.Multimodal

/** Multimodal binary-column plumbing: schema, typed batch map,
  * partition-independence. Image decode is REAL (JDK ImageIO — PNG/BMP
  * specs below); payloads no reader accepts, plus audio/video (no JDK
  * codec), take the documented deterministic stub, which is what the
  * text-bytes fixtures here exercise. */
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

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("extractFeatures decodes real PNG and BMP payloads (JDK ImageIO)") {
    val implicits = spark.implicits
    import implicits._
    val bmp = {
      val img = new java.awt.image.BufferedImage(
        7, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", baos)
      baos.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", pngBytes(3, 5, 0xff0000)),
      Multimodal.MediaRow(2L, "image", bmp),
      Multimodal.MediaRow(3L, "image", "not an image".getBytes("UTF-8")))
    val f = Multimodal.extractFeatures(rows.toDS()).collect()
      .map(r => r.media_id -> ((r.width, r.height, r.n_frames))).toMap
    assert(f(1L) == ((3, 5, 1)))  // real PNG raster dims
    assert(f(2L) == ((7, 2, 1)))  // real BMP raster dims
    // undecodable bytes fall back to the documented deterministic stub
    assert(f(3L)._1 >= 64 && f(3L)._2 >= 64 && f(3L)._3 == 1)
  }

  test("resize operates on real pixels for decodable images") {
    val implicits = spark.implicits
    import implicits._
    val red = 0xff0000
    val rows = Seq(Multimodal.MediaRow(1L, "image", pngBytes(6, 4, red)))
    val out = Multimodal.resize(rows.toDS(), 3, 2).collect().head
    assert(out.width == 3 && out.height == 2)
    // the payload is a real PNG of the scaled raster: decode it back
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.media))
    assert(img.getWidth == 3 && img.getHeight == 2)
    // a solid-red source stays solid red through the scale
    for (x <- 0 until 3; y <- 0 until 2)
      assert((img.getRGB(x, y) & 0xffffff) == red)
    // deterministic across partitionings (same bytes)
    val again = Multimodal.resize(rows.toDS().repartition(3), 3, 2).collect().head
    assert(out.media.toSeq == again.media.toSeq)
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

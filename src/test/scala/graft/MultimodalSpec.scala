package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphBuilder
import graft.pipeline.Multimodal

/** Multimodal binary-column plumbing: schema, typed batch map,
  * partition-independence. Image decode is REAL (JDK ImageIO — PNG/BMP
  * specs below), audio decode is REAL (JDK javax.sound.sampled —
  * WAV/AIFF specs below), and video CONTAINER metadata is REAL
  * (ISO-BMFF moov parse — hand-built MP4 box specs below); payloads no
  * parser accepts take the documented deterministic stub, which is
  * what the text-bytes fixtures here exercise. */
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

  /** 16-bit PCM sine wave in any JDK container (WAV little-endian,
    * AIFF/AU big-endian), built with the same JDK API a user would
    * use. */
  private def pcmBytes(freqHz: Double, seconds: Double, rate: Float,
                       amplitude: Double, bigEndian: Boolean,
                       fileType: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
    val n = (rate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (amplitude * math.sin(2 * math.Pi * freqHz * i / rate) *
        32767.0).toInt.toShort
      val (lo, hi) = if (bigEndian) (2 * i + 1, 2 * i) else (2 * i, 2 * i + 1)
      pcm(lo) = (s & 0xff).toByte
      pcm(hi) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, bigEndian)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, fileType, out)
    out.toByteArray
  }

  private def wavBytes(freqHz: Double, seconds: Double, rate: Float,
                       amplitude: Double): Array[Byte] =
    pcmBytes(freqHz, seconds, rate, amplitude, bigEndian = false,
      javax.sound.sampled.AudioFileFormat.Type.WAVE)

  test("audioStats reads big-endian AIFF identically to little-endian WAV") {
    val implicits = spark.implicits
    import implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wavBytes(440.0, 0.5, 8000f, 0.5)),
      Multimodal.MediaRow(2L, "audio", pcmBytes(440.0, 0.5, 8000f, 0.5,
        bigEndian = true, javax.sound.sampled.AudioFileFormat.Type.AIFF)))
    val got = Multimodal.audioStats(rows.toDS()).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(3), r.getDouble(5), r.getLong(6)))).toMap
    // Same synthesized samples, different container/byte order — the
    // decoded features must agree exactly (both rows survive: AIFF is
    // no longer rejected as undecodable).
    assert(got.keySet == Set(1L, 2L))
    val (wf, wc, wr, wz) = got(1L)
    val (af, ac, ar, az) = got(2L)
    assert(af == wf && ac == wc && az == wz)
    assert(math.abs(ar - wr) < 1e-12)
    // Sanity: a 0.5-amplitude sine has RMS ≈ 0.5/√2
    assert(math.abs(ar - 0.5 / math.sqrt(2)) < 0.01)
  }

  test("audioStats decodes real WAV payloads (JDK sound API)") {
    val implicits = spark.implicits
    import implicits._
    // 440 Hz for 0.5 s at 8 kHz, amplitude 0.5 → rms ≈ 0.5/√2,
    // zero crossings ≈ 2·440·0.5
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wavBytes(440.0, 0.5, 8000f, 0.5)),
      Multimodal.MediaRow(2L, "audio", wavBytes(100.0, 1.0, 8000f, 0.9)),
      Multimodal.MediaRow(3L, "audio", Array[Byte](1, 2, 3, 4)), // undecodable
      Multimodal.MediaRow(4L, "image", wavBytes(440.0, 0.1, 8000f, 0.5)))
    val got = Multimodal.audioStats(rows.toDS()).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 2L)) // undecodable + non-audio dropped
    val a = got(1L)
    assert(a.getLong(1) == 4000L) // frames
    assert(a.getDouble(2) == 8000.0)
    assert(a.getInt(3) == 1)
    assert(math.abs(a.getDouble(4) - 0.5) < 1e-9) // duration
    assert(math.abs(a.getDouble(5) - 0.5 / math.sqrt(2)) < 0.01) // rms
    assert(math.abs(a.getLong(6) - 440L) < 10) // 2·440·0.5 crossings
    val b = got(2L)
    assert(b.getLong(1) == 8000L)
    assert(math.abs(b.getLong(6) - 200L) < 10)
  }

  test("extractFeatures reports REAL frame counts for decodable audio") {
    val implicits = spark.implicits
    import implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wavBytes(200.0, 0.25, 8000f, 0.5)))
    val f = Multimodal.extractFeatures(rows.toDS()).collect().head
    assert(f.n_frames == 2000) // 0.25 s · 8 kHz — from the actual stream
    assert(f.width == 0 && f.height == 0)
  }

  // ---- minimal ISO-BMFF (MP4) builders: size+type boxes, big-endian ----
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
  private def mkBox(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++ typ.getBytes("ISO-8859-1") ++ body
  }

  /** moov with mvhd v0 (timescale 600, duration 3000 → 5 s) and one
    * dimensioned trak (tkhd v0 640×360) whose stts totals 125 frames. */
  private def mp4Bytes: Array[Byte] = {
    val mvhd = mkBox("mvhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
      be32(600), be32(3000))
    val tkhd = mkBox("tkhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
      be32(1), be32(0), be32(3000), new Array[Byte](8 + 2 + 2 + 2 + 2 + 36),
      be32(640L << 16), be32(360L << 16))
    val stts = mkBox("stts", Array[Byte](0, 0, 0, 0), be32(2),
      be32(100), be32(1), be32(25), be32(2))
    val trak = mkBox("trak", tkhd, mkBox("mdia", mkBox("minf", mkBox("stbl", stts))))
    val ftyp = mkBox("ftyp", "isom".getBytes("ISO-8859-1"), be32(512))
    val mdat = mkBox("mdat", Array.fill[Byte](32)(7))
    ftyp ++ mkBox("moov", mvhd, trak) ++ mdat
  }

  /** Same movie with v1 (64-bit time) mvhd and tkhd — the field offsets
    * shift and the parser must follow the version byte. */
  private def mp4BytesV1: Array[Byte] = {
    val mvhd = mkBox("mvhd", Array[Byte](1, 0, 0, 0), be64(0), be64(0),
      be32(600), be64(3000))
    val tkhd = mkBox("tkhd", Array[Byte](1, 0, 0, 0), be64(0), be64(0),
      be32(1), be32(0), be64(3000), new Array[Byte](8 + 2 + 2 + 2 + 2 + 36),
      be32(640L << 16), be32(360L << 16))
    val stts = mkBox("stts", Array[Byte](0, 0, 0, 0), be32(2),
      be32(100), be32(1), be32(25), be32(2))
    val trak = mkBox("trak", tkhd, mkBox("mdia", mkBox("minf", mkBox("stbl", stts))))
    mkBox("moov", mvhd, trak)
  }

  test("extractFeatures reads REAL dims + frame count from MP4 containers") {
    val implicits = spark.implicits
    import implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", mp4Bytes),
      Multimodal.MediaRow(2L, "video", mp4BytesV1),
      Multimodal.MediaRow(3L, "video", Array[Byte](1, 2, 3, 4))) // not BMFF
    val f = Multimodal.extractFeatures(rows.toDS()).collect()
      .map(r => r.media_id -> r).toMap
    assert(f(1L).width == 640 && f(1L).height == 360 && f(1L).n_frames == 125)
    assert(f(2L).width == 640 && f(2L).height == 360 && f(2L).n_frames == 125)
    // non-BMFF video falls back to the deterministic stub (still a row)
    assert(f(3L).byte_len == 4L)
  }

  test("BMFF parser survives malformed boxes without throwing") {
    val implicits = spark.implicits
    import implicits._
    val good = mp4Bytes
    val cases = Seq[Array[Byte]](
      good.take(10),                          // truncated mid-header
      be32(0) ++ "free".getBytes("ISO-8859-1"), // size-0 box to EOF, no moov
      be32(1) ++ "moov".getBytes("ISO-8859-1") ++ be64(Long.MaxValue), // lying largesize
      mkBox("moov", mkBox("mvhd", Array[Byte](9, 0, 0, 0), be32(600))), // bad version
      mkBox("moov", mkBox("trak", mkBox("tkhd", Array[Byte](0, 0)))),  // short tkhd
      Array.fill[Byte](64)(-1))               // size 0xffffffff > len
    val rows = cases.zipWithIndex.map { case (b, i) =>
      Multimodal.MediaRow(i.toLong, "video", b)
    }
    // all undecodable → videoStats drops them; extractFeatures falls
    // back to the stub but never throws
    assert(Multimodal.videoStats(rows.toDS()).count() == 0)
    assert(Multimodal.extractFeatures(rows.toDS()).count() == cases.length)
    // a payload truncated INSIDE mdat keeps its intact moov readable —
    // the partial-download case where metadata must still decode
    val partial = Seq(Multimodal.MediaRow(99L, "video",
      good.take(good.length - 7)))
    val p = Multimodal.videoStats(partial.toDS()).collect()
    assert(p.length == 1 && p.head.getInt(1) == 640)
  }

  test("videoStats: container duration/timescale; unparseable rows dropped") {
    val implicits = spark.implicits
    import implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", mp4Bytes),
      Multimodal.MediaRow(2L, "video", Array[Byte](9, 9, 9)),
      Multimodal.MediaRow(3L, "audio", mp4Bytes)) // non-video filtered
    val got = Multimodal.videoStats(rows.toDS()).collect()
    assert(got.map(_.getLong(0)).toSet == Set(1L))
    val r = got.head
    assert(r.getInt(1) == 640 && r.getInt(2) == 360)
    assert(r.getLong(3) == 125L && r.getLong(4) == 600L)
    assert(math.abs(r.getDouble(5) - 5.0) < 1e-12)
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

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

  // ---- MJPEG fixtures: each frame a real JPEG (JDK ImageIO encode) ----
  private def jpegBytes(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
    id.getBytes("ISO-8859-1") ++ le32(body.length) ++ body ++ pad
  }

  /** Minimal MJPEG-in-AVI: RIFF/AVI with a LIST movi holding one 00dc
    * chunk per frame (each a complete JPEG) — the frame layout a real
    * MJPEG AVI uses; index/header lists are optional for a walker. */
  private def mjpegAviBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    val movi = "movi".getBytes("ISO-8859-1") ++
      frames.flatMap(f => riffChunk("00dc", f))
    val body = "AVI ".getBytes("ISO-8859-1") ++ riffChunk("LIST", movi)
    "RIFF".getBytes("ISO-8859-1") ++ le32(body.length) ++ body
  }

  /** Minimal MJPEG-in-MP4: moov (mvhd + dimensioned trak with
    * stsz/stsc/stco) + mdat holding the JPEG samples contiguously; the
    * stco offset points into mdat, 2 samples in chunk 1 and the rest
    * in chunk 2 so the stsc run logic is exercised. */
  private def mjpegMp4Bytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    val mvhd = mkBox("mvhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
      be32(600), be32(600L * frames.length))
    val tkhd = mkBox("tkhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
      be32(1), be32(0), be32(600L * frames.length),
      new Array[Byte](8 + 2 + 2 + 2 + 2 + 36),
      be32(16L << 16), be32(8L << 16))
    val stts = mkBox("stts", Array[Byte](0, 0, 0, 0), be32(1),
      be32(frames.length), be32(600))
    val stsz = mkBox("stsz", Array[Byte](0, 0, 0, 0), be32(0),
      be32(frames.length), frames.map(f => be32(f.length)).flatten.toArray)
    // chunk 1: first 2 samples; chunk 2: the rest
    val stsc = mkBox("stsc", Array[Byte](0, 0, 0, 0), be32(2),
      be32(1), be32(2), be32(1),
      be32(2), be32(math.max(frames.length - 2, 1)), be32(1))
    // moov precedes mdat; mdat payload starts at moovLen + 8
    def moovOf(stco: Array[Byte]): Array[Byte] = {
      val stbl = mkBox("stbl", stts, stsz, stsc, stco)
      mkBox("moov", mvhd,
        mkBox("trak", tkhd, mkBox("mdia", mkBox("minf", stbl))))
    }
    val probeLen = moovOf(mkBox("stco", Array[Byte](0, 0, 0, 0), be32(2),
      be32(0), be32(0))).length
    val off1 = probeLen + 8L
    val off2 = off1 + frames.take(2).map(_.length).sum
    val moov = moovOf(mkBox("stco", Array[Byte](0, 0, 0, 0), be32(2),
      be32(off1), be32(off2)))
    assert(moov.length == probeLen) // stco payload size is fixed
    moov ++ mkBox("mdat", frames.flatten.toArray)
  }

  test("videoFrames decodes REAL MJPEG pixels from AVI movi chunks") {
    val implicits = spark.implicits
    import implicits._
    // 3 frames, distinct gray levels → distinct mean luma, real dims
    val frames = Seq(jpegBytes(16, 8, 40), jpegBytes(16, 8, 128),
      jpegBytes(16, 8, 220))
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", mjpegAviBytes(frames)),
      Multimodal.MediaRow(2L, "video", Array[Byte](1, 2, 3))) // not AVI
    val got = Multimodal.videoFrames(rows.toDS())
      .orderBy("media_id", "frame_idx").collect()
    assert(got.length == 3 && got.forall(_.getLong(0) == 1L))
    assert(got.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    got.foreach(r => assert(r.getInt(2) == 16 && r.getInt(3) == 8))
    // JPEG is lossy but flat-gray frames decode within a few levels
    val lumas = got.map(_.getDouble(4))
    assert(math.abs(lumas(0) - 40) < 6 && math.abs(lumas(1) - 128) < 6 &&
      math.abs(lumas(2) - 220) < 6)
    assert(lumas(0) < lumas(1) && lumas(1) < lumas(2))
  }

  test("videoFrames walks the BMFF MJPEG sample table (stsz/stsc/stco)") {
    val implicits = spark.implicits
    import implicits._
    val frames = Seq(jpegBytes(16, 8, 30), jpegBytes(16, 8, 90),
      jpegBytes(16, 8, 150), jpegBytes(16, 8, 210))
    val rows = Seq(Multimodal.MediaRow(7L, "video", mjpegMp4Bytes(frames)))
    val got = Multimodal.videoFrames(rows.toDS())
      .orderBy("frame_idx").collect()
    assert(got.length == 4)
    assert(got.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L))
    got.foreach(r => assert(r.getInt(2) == 16 && r.getInt(3) == 8))
    val lumas = got.map(_.getDouble(4))
    assert(lumas.sliding(2).forall(p => p(0) < p(1))) // gray ramp survives
  }

  test("extractFeatures: MJPEG-AVI gets REAL dims + frame count (no stub)") {
    val implicits = spark.implicits
    import implicits._
    val frames = Seq(jpegBytes(20, 10, 60), jpegBytes(20, 10, 180))
    val avi = mjpegAviBytes(frames)
    val f = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRow(1L, "video", avi)).toDS()).collect().head
    assert(f.width == 20 && f.height == 10 && f.n_frames == 2)
    // and the stub would have produced none of these: its dims are a
    // payload-hash function, frames idem — equality here would be a
    // 1-in-2^60 coincidence, so assert against it directly
    val stub = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRow(2L, "video",
        java.util.Arrays.copyOfRange(avi, 4, avi.length))).toDS()) // de-RIFFed
      .collect().head
    assert((stub.width, stub.height, stub.n_frames) != ((20, 10, 2)))
  }

  /** Raw BI_RGB AVI: hdrl (strh 'vids' + strf BITMAPINFOHEADER,
    * biCompression 0, 24 bpp) + movi with one 00db chunk per frame —
    * bottom-up BGR rows DWORD-padded, the classic uncompressed-AVI
    * layout. Each frame is a flat gray level. */
  private def rawAviBytes(w: Int, h: Int, grays: Seq[Int]): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val strh = riffChunk("strh", "vids".getBytes("ISO-8859-1") ++
      new Array[Byte](52))
    val bih = le32(40) ++ le32(w) ++ le32(h) ++
      Array[Byte](1, 0) ++ Array[Byte](24, 0) ++ le32(0) ++ // planes, bits, BI_RGB
      le32(stride * h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strf = riffChunk("strf", bih)
    val strl = riffChunk("LIST", "strl".getBytes("ISO-8859-1") ++ strh ++ strf)
    val hdrl = riffChunk("LIST", "hdrl".getBytes("ISO-8859-1") ++ strl)
    val frames = grays.map { g =>
      val f = new Array[Byte](stride * h)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        f(y * stride + x * 3 + c) = g.toByte
      riffChunk("00db", f)
    }
    val movi = riffChunk("LIST",
      "movi".getBytes("ISO-8859-1") ++ frames.flatten)
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ le32(body.length) ++ body
  }

  test("videoFrames decodes UNCOMPRESSED AVI (BI_RGB) frames exactly") {
    val implicits = spark.implicits
    import implicits._
    // flat-gray raw frames: mean luma is EXACT (no JPEG loss)
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", rawAviBytes(5, 3, Seq(40, 128, 220))),
      Multimodal.MediaRow(2L, "video", Array[Byte](1, 2, 3)))
    val got = Multimodal.videoFrames(rows.toDS())
      .orderBy("media_id", "frame_idx").collect()
    assert(got.length == 3 && got.forall(_.getLong(0) == 1L))
    got.foreach(r => assert(r.getInt(2) == 5 && r.getInt(3) == 3))
    assert(got.map(_.getDouble(4)).toSeq == Seq(40.0, 128.0, 220.0))
  }

  test("raw AVI with a non-gradient pattern: BGR order + bottom-up rows honored") {
    // 1x2 image, two frames is overkill — one frame: bottom row pure
    // red (BGR bytes 0,0,255), top row pure blue (255,0,0); the
    // thumbnail path must reproduce the TOP-DOWN orientation
    val w = 1; val h = 2
    val stride = (w * 3 + 3) & ~3
    val f = new Array[Byte](stride * h)
    // row 0 in the byte plane = BOTTOM row (red)
    f(2) = -1 // R of bottom row (BGR: bytes b=0,g=1,r=2)
    f(stride) = -1 // B of top row
    val strh = riffChunk("strh", "vids".getBytes("ISO-8859-1") ++ new Array[Byte](52))
    val bih = le32(40) ++ le32(w) ++ le32(h) ++ Array[Byte](1, 0) ++
      Array[Byte](24, 0) ++ le32(0) ++ le32(stride * h) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strl = riffChunk("LIST", "strl".getBytes("ISO-8859-1") ++ strh ++
      riffChunk("strf", bih))
    val hdrl = riffChunk("LIST", "hdrl".getBytes("ISO-8859-1") ++ strl)
    val movi = riffChunk("LIST", "movi".getBytes("ISO-8859-1") ++ riffChunk("00db", f))
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    val avi = "RIFF".getBytes("ISO-8859-1") ++ le32(body.length) ++ body
    val rv = Multimodal.aviRawVideo(avi).get
    assert(rv.width == 1 && rv.height == 2 && rv.bgr && rv.bottomUp)
    val img = Multimodal.rawFrameImage(rv, rv.frames.head)
    assert((img.getRGB(0, 0) & 0xffffff) == 0x0000ff) // top = blue
    assert((img.getRGB(0, 1) & 0xffffff) == 0xff0000) // bottom = red
  }

  /** BMFF with a 'raw ' stsd sample entry: top-down packed RGB
    * samples of exactly w·h·3 bytes in mdat. */
  private def rawMp4Bytes(w: Int, h: Int, grays: Seq[Int]): Array[Byte] = {
    val mvhd = mkBox("mvhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
      be32(600), be32(600L * grays.length))
    val tkhd = mkBox("tkhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
      be32(1), be32(0), be32(600L * grays.length),
      new Array[Byte](8 + 2 + 2 + 2 + 2 + 36),
      be32(w.toLong << 16), be32(h.toLong << 16))
    val stts = mkBox("stts", Array[Byte](0, 0, 0, 0), be32(1),
      be32(grays.length), be32(600))
    // stsd with one 'raw ' visual sample entry (minimal body)
    val entry = mkBox("raw ", new Array[Byte](70))
    val stsd = mkBox("stsd", Array[Byte](0, 0, 0, 0), be32(1), entry)
    val fsize = w * h * 3
    val stsz = mkBox("stsz", Array[Byte](0, 0, 0, 0), be32(fsize),
      be32(grays.length))
    val stsc = mkBox("stsc", Array[Byte](0, 0, 0, 0), be32(1),
      be32(1), be32(grays.length), be32(1))
    def moovOf(stco: Array[Byte]): Array[Byte] =
      mkBox("moov", mvhd, mkBox("trak", tkhd, mkBox("mdia", mkBox("minf",
        mkBox("stbl", stsd, stts, stsz, stsc, stco)))))
    val probeLen = moovOf(mkBox("stco", Array[Byte](0, 0, 0, 0), be32(1),
      be32(0))).length
    val moov = moovOf(mkBox("stco", Array[Byte](0, 0, 0, 0), be32(1),
      be32(probeLen + 8L)))
    val frames = grays.map(g => Array.fill[Byte](fsize)(g.toByte))
    moov ++ mkBox("mdat", frames.flatten.toArray)
  }

  test("videoFrames decodes BMFF 'raw ' sample entries exactly") {
    val implicits = spark.implicits
    import implicits._
    val rows = Seq(Multimodal.MediaRow(5L, "video",
      rawMp4Bytes(4, 2, Seq(10, 200))))
    assert(Multimodal.bmffSampleFormat(rows.head.media).contains("raw "))
    val got = Multimodal.videoFrames(rows.toDS())
      .orderBy("frame_idx").collect()
    assert(got.length == 2)
    got.foreach(r => assert(r.getInt(2) == 4 && r.getInt(3) == 2))
    assert(got.map(_.getDouble(4)).toSeq == Seq(10.0, 200.0))
    // the MJPEG fixture still reports an 'mp4v'-free format: its stsd
    // is absent, so the raw path never claims it
    assert(Multimodal.bmffSampleFormat(mjpegMp4Bytes(
      Seq(jpegBytes(16, 8, 90)))).isEmpty)
  }

  test("videoThumbnails + extractFeatures cover raw AVI tracks") {
    val implicits = spark.implicits
    import implicits._
    val avi = rawAviBytes(6, 4, Seq(90, 150))
    val f = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRow(1L, "video", avi)).toDS()).collect().head
    assert(f.width == 6 && f.height == 4 && f.n_frames == 2)
    val thumbs = Multimodal.videoThumbnails(
      Seq(Multimodal.MediaRow(1L, "video", avi)).toDS(), 3, 2).collect()
    assert(thumbs.length == 1)
    assert(thumbs.head.getInt(1) == 6 && thumbs.head.getInt(2) == 4)
    val png = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(thumbs.head.getAs[Array[Byte]](3)))
    assert(png.getWidth == 3 && png.getHeight == 2)
    // flat gray 90 survives the resize exactly
    assert((png.getRGB(0, 0) & 0xff) == 90)
  }

  test("videoThumbnails re-encodes frame 0 through the real PNG path") {
    val implicits = spark.implicits
    import implicits._
    val avi = mjpegAviBytes(Seq(jpegBytes(24, 12, 100)))
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", avi),
      Multimodal.MediaRow(2L, "video", Array[Byte](5, 5))) // dropped
    val got = Multimodal.videoThumbnails(rows.toDS(), 8, 4).collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L)
    assert(got.head.getInt(1) == 24 && got.head.getInt(2) == 12)
    val thumb = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(got.head.getAs[Array[Byte]](3)))
    assert(thumb.getWidth == 8 && thumb.getHeight == 4)
  }

  test("dHash64/aHash64: pinned values on gradient and half-plane rasters") {
    // horizontal ramp (brighter to the right): every right-neighbor
    // cell is strictly brighter -> all 64 dHash bits set
    val ramp = new java.awt.image.BufferedImage(
      18, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 18; y <- 0 until 8) {
      val g = x * 14
      ramp.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    assert(Multimodal.dHash64(ramp) == -1L)
    // vertical ramp: zero horizontal gradient -> dHash 0
    val vert = new java.awt.image.BufferedImage(
      18, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 18; y <- 0 until 8) {
      val g = y * 30
      vert.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    assert(Multimodal.dHash64(vert) == 0L)
    // left half black / right half white, 16x16: aHash bits set exactly
    // on grid columns 4..7 of each row -> 0xf0 per row byte
    val half = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 16; y <- 0 until 16)
      half.setRGB(x, y, if (x >= 8) 0xffffff else 0x000000)
    assert(Multimodal.aHash64(half) == 0xf0f0f0f0f0f0f0f0L)
  }

  test("lumaGrid uses integer Rec.601 box means (floor division)") {
    // 2x1 image: pure red (299000 milli-luma) and pure blue (114000);
    // a 1x1 grid averages them with floor division
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x0000ff)
    val g = Multimodal.lumaGrid(img, 1, 1)
    assert(g.toSeq == Seq((299L * 255 + 114L * 255) / 2))
    // 2x1 grid separates them
    assert(Multimodal.lumaGrid(img, 2, 1).toSeq ==
      Seq(299L * 255, 114L * 255))
  }

  test("hammingPairs64: 4x16 pigeonhole blocking is complete for hamming <= 3") {
    val implicits = spark.implicits
    import implicits._
    val base = 0x123456789abcdef0L
    val rows = Seq(
      1L -> base,
      2L -> base,                                        // hamming 0
      3L -> (base ^ 1L),                                 // hamming 1 (chunk 0)
      4L -> (base ^ (1L << 5) ^ (1L << 21) ^ (1L << 40)), // 3 bits, 3 chunks
      5L -> (base ^ (1L << 1) ^ (1L << 17) ^ (1L << 33) ^ (1L << 49)), // 4 bits
      6L -> ~base)                                       // unrelated
    val df = rows.toDF("media_id", "h")
    val got = Multimodal.hammingPairs64(df, "media_id", "h", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 2L)) == 0L)
    assert(got((1L, 3L)) == 1L && got((2L, 3L)) == 1L)
    assert(got((1L, 4L)) == 3L && got((2L, 4L)) == 3L) // bits across 3 chunks
    assert(!got.contains((3L, 4L))) // bits {0,5,21,40}: hamming 4 -> filtered
    assert(!got.keySet.exists { case (a, b) => a == 5L || b == 5L ||
      a == 6L || b == 6L }) // hamming-4 row and unrelated row pair with nobody
    // maxHamming 0 keeps only the exact-dup pair
    val exact = Multimodal.hammingPairs64(df, "media_id", "h", 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((1L, 2L)))
  }

  test("hammingPairs64 hot-bucket cap: degenerate corpus bounded, generous cap exact") {
    val implicits = spark.implicits
    import implicits._
    // the degenerate media corpus: 40 monochrome thumbnails share ONE
    // hash (every chunk a hot bucket) + one spread near-dup pair
    val flat = (1L to 40L).map(_ -> 0L)
    val spread = Seq(100L -> 0x123456789abcdef0L, 101L -> 0x123456789abcdef1L)
    val df = (flat ++ spread).toDF("media_id", "h")
    // uncapped: the flat block alone is 40·39/2 = 780 pairs
    assert(Multimodal.hammingPairs64(df, "media_id", "h", 3).count() == 781L)
    // capped at 8: every flat bucket (population 40) drops — candidates
    // bounded; the spread pair (bucket populations 2) survives
    val capped = Multimodal.hammingPairs64(df, "media_id", "h", 3, maxBucket = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)))
    // the audit reports exactly the dropped buckets: 4 chunks of the
    // flat hash value 0 (cv = 0 in each chunk position), population 40
    val hot = Multimodal.hammingHotBuckets(df, "media_id", "h", 8L).collect()
    assert(hot.length == 4 && hot.forall(_.getAs[Long]("n_ids") == 40L))
    // cap >= max bucket population == uncapped (the exactness pin)
    val generous = Multimodal.hammingPairs64(df, "media_id", "h", 3, maxBucket = 40L)
    assert(generous.count() == 781L)
    assert(Multimodal.hammingHotBuckets(df, "media_id", "h", 40L).isEmpty)
  }

  test("mediaClusters + mediaClusterDropIds: cluster-canonical keep, not pair-drop") {
    val implicits = spark.implicits
    import implicits._
    // pair graph {(2,3), (1,3)}: doc 2 is NEVER the larger pair member
    // yet is a transitive dup of 1 — pair-drop would keep {1, 2},
    // cluster-canonical must keep only the min member 1
    val pairs = Seq((2L, 3L, 0L), (1L, 3L, 1L)).toDF("a", "b", "hamming")
    val clusters = graft.pipeline.Multimodal.mediaClusters(Seq("image" -> pairs))
      .collect()
    assert(clusters.length == 1)
    assert(clusters(0).getAs[String]("modality") == "image")
    assert(clusters(0).getAs[Long]("rep_id") == 1L)
    assert(clusters(0).getAs[Long]("n_members") == 3L)
    val drops = graft.pipeline.Multimodal.mediaClusterDropIds(Seq("image" -> pairs))
      .collect().map(_.getLong(0)).toSet
    assert(drops == Set(2L, 3L)) // everything but the representative
    // two modalities: drop sets union distinct; per-modality clusters stay apart
    val audioPairs = Seq((2L, 9L, 0L)).toDF("a", "b", "hamming")
    val multi = graft.pipeline.Multimodal.mediaClusters(
      Seq("image" -> pairs, "audio" -> audioPairs)).collect()
    assert(multi.length == 2 &&
      multi.map(_.getAs[String]("modality")).toSet == Set("image", "audio"))
    val allDrops = graft.pipeline.Multimodal.mediaClusterDropIds(
      Seq("image" -> pairs, "audio" -> audioPairs))
      .collect().map(_.getLong(0)).toSet
    assert(allDrops == Set(2L, 3L, 9L)) // 2 drops once despite both graphs
  }

  test("videoTemporalDedupPairs separates title-card collisions the first frame cannot") {
    val implicits = spark.implicits
    import implicits._
    // one temporal family (ids 0..3): frame 0 shared (m inversions
    // apart), frame 1 splits halves {0,1} / {2,3}
    val media = Multimodal.syntheticTemporalVideoCorpus(
      spark.range(4).toDF("id"), "id")
    // first-frame dedup sees the whole family as near-dups...
    val firstFrame = Multimodal.videoDedupPairs(media, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(firstFrame.contains((0L, 2L)) || firstFrame.contains((0L, 3L)) ||
      firstFrame.contains((1L, 2L)) || firstFrame.contains((1L, 3L)),
      s"fixture must plant a cross-half title-card collision, got $firstFrame")
    // ...the temporal signature keeps ONLY the within-half pairs
    val temporal = Multimodal.videoTemporalDedupPairs(media, 3, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(temporal == Set((0L, 1L), (2L, 3L)), s"temporal pairs: $temporal")
    // identical clips stay exact dups under the temporal signature
    val h = Multimodal.videoTemporalHashes(media, 3).collect()
    assert(h.length == 4 && h.forall(_.getAs[Seq[Long]]("vhashes").length == 3))
  }

  test("imageHashes + imageDedupPairs over REAL PNG payloads") {
    val implicits = spark.implicits
    import implicits._
    // two synthetic families of 4 (ids 0..7): variant = id % 3 makes
    // (0,3) and (4,7) EXACT image dups; other within-family pairs are
    // near-dups (a couple of inverted pixels)
    val ids = (0L to 7L).toDF("doc_id")
    val media = Multimodal.syntheticImageCorpus(ids, "doc_id")
    val hashes = Multimodal.imageHashes(media)
    assert(hashes.count() == 8L) // every PNG decodes
    // determinism + partition independence of the hash values
    val h1 = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h2 = Multimodal.imageHashes(media.repartition(5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1 == h2)
    assert(h1(0L) == h1(3L) && h1(4L) == h1(7L)) // exact dups hash equal
    val pairs = Multimodal.imageDedupPairs(media, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((0L, 3L)) == 0L && pairs((4L, 7L)) == 0L)
    // every surviving pair stays within its family (unrelated seeds
    // landing within hamming 3 would be a ~2^-48 coincidence)
    assert(pairs.keySet.forall { case (a, b) => a / 4 == b / 4 })
    // undecodable payloads are dropped, not stubbed, by imageHashes
    val broken = Seq(Multimodal.MediaRow(99L, "image",
      "not a png".getBytes("UTF-8"))).toDS()
    assert(Multimodal.imageHashes(broken).count() == 0L)
  }

  test("audioFingerprints + audioDedupPairs over REAL WAV payloads") {
    val implicits = spark.implicits
    import implicits._
    // two synthetic families of 4 (ids 0..7): (0,3) and (4,7) are
    // byte-identical WAVs; other within-family pairs are one boosted
    // energy cell apart (<= 2 gradient bits)
    val ids = (0L to 7L).toDF("doc_id")
    val media = Multimodal.syntheticAudioCorpus(ids, "doc_id")
    val fps = Multimodal.audioFingerprints(media)
    assert(fps.count() == 8L) // every WAV decodes
    val f1 = fps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val f2 = Multimodal.audioFingerprints(media.repartition(5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f1 == f2) // deterministic, partition-independent
    assert(f1(0L) == f1(3L) && f1(4L) == f1(7L)) // exact dups
    // variants flip at most 2 bits vs their family's base
    assert(java.lang.Long.bitCount(f1(0L) ^ f1(1L)) <= 2)
    assert(java.lang.Long.bitCount(f1(0L) ^ f1(2L)) <= 2)
    // different seeds produce well-separated fingerprints
    assert(java.lang.Long.bitCount(f1(0L) ^ f1(4L)) > 3)
    val pairs = Multimodal.audioDedupPairs(media, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((0L, 3L)) == 0L && pairs((4L, 7L)) == 0L)
    assert(pairs.keySet.forall { case (a, b) => a / 4 == b / 4 })
    // undecodable / too-short payloads are dropped, not stubbed
    val broken = Seq(
      Multimodal.MediaRow(98L, "audio", Array[Byte](1, 2, 3, 4)),
      Multimodal.MediaRow(99L, "audio", wavBytes(440.0, 0.005, 8000f, 0.5)))
    assert(Multimodal.audioFingerprints(broken.toDS()).count() == 0L)
  }

  // ---- H.264 baseline I_PCM fixtures: hand-assembled SPS/PPS/IDR
  // NALs (a tiny conforming encoder for the one raw-byte macroblock
  // mode), exactly like the raw-AVI/BMFF fixtures — no external codec.

  /** MSB-first bit writer with Exp-Golomb — the fixture-side twin of
    * H264.BitReader. */
  private final class BitW {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0; private var n = 0
    def u(v: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1); n += 1
        if (n == 8) { out += cur.toByte; cur = 0; n = 0 }
        i -= 1
      }
    }
    def ue(v: Int): Unit = {
      val k = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(k)
      u(0, len - 1); u(k, len)
    }
    def se(v: Int): Unit = ue(if (v <= 0) -2 * v else 2 * v - 1)
    def align0(): Unit = while (n != 0) u(0, 1)
    def trail(): Unit = { u(1, 1); align0() }
    def bytes: Array[Byte] = { require(n == 0, "not byte aligned"); out.toArray }
  }

  /** Insert emulation_prevention_three_byte after any 00 00 run that
    * precedes a byte <= 3 (7.4.1.1 — what a conforming encoder does). */
  private def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var zeros = 0
    for (b <- rbsp) {
      if (zeros >= 2 && (b & 0xff) <= 3) { out += 3; zeros = 0 }
      out += b
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toArray
  }

  private def spsNal(wMbs: Int, hMbs: Int): Array[Byte] = {
    val b = new BitW
    b.u(66, 8); b.u(0, 8); b.u(10, 8) // baseline, constraints, level 1.0
    b.ue(0) // sps_id
    b.ue(0) // log2_max_frame_num_minus4 → 4 bits
    b.ue(2) // pic_order_cnt_type 2 (no POC fields in slices)
    b.ue(0) // max_num_ref_frames
    b.u(0, 1) // gaps_in_frame_num_value_allowed
    b.ue(wMbs - 1); b.ue(hMbs - 1)
    b.u(1, 1) // frame_mbs_only
    b.u(0, 1) // direct_8x8_inference
    b.u(0, 1) // frame_cropping
    b.u(0, 1) // vui_parameters_present
    b.trail()
    Array(0x67.toByte) ++ escapeRbsp(b.bytes)
  }

  private def ppsNal(): Array[Byte] = {
    val b = new BitW
    b.ue(0); b.ue(0) // pps_id, sps_id
    b.u(0, 1) // entropy_coding_mode = CAVLC
    b.u(0, 1) // bottom_field_pic_order_in_frame_present
    b.ue(0) // num_slice_groups_minus1
    b.ue(0); b.ue(0) // num_ref_idx defaults
    b.u(0, 1); b.u(0, 2) // weighted_pred, weighted_bipred_idc
    b.se(0); b.se(0); b.se(0) // pic_init_qp/qs, chroma_qp_offset
    b.u(0, 1) // deblocking_filter_control_present
    b.u(0, 1) // constrained_intra_pred
    b.u(0, 1) // redundant_pic_cnt_present
    b.trail()
    Array(0x68.toByte) ++ escapeRbsp(b.bytes)
  }

  /** One IDR slice whose every macroblock is I_PCM; `luma(x, y)` fills
    * the Y plane, chroma is neutral gray (128) so RGB == Y exactly.
    * `mbType` overridable to build a NON-I_PCM stream for the
    * fallback test. */
  private def idrNal(wMbs: Int, hMbs: Int, luma: (Int, Int) => Int,
                     mbType: Int = 25): Array[Byte] = {
    val b = new BitW
    b.ue(0) // first_mb_in_slice
    b.ue(7) // slice_type: I (all slices of the picture)
    b.ue(0) // pps_id
    b.u(0, 4) // frame_num (log2MaxFrameNum = 4)
    b.ue(0) // idr_pic_id
    b.u(0, 1); b.u(0, 1) // dec_ref_pic_marking for IDR
    b.se(0) // slice_qp_delta
    for (mb <- 0 until wMbs * hMbs) {
      b.ue(mbType)
      if (mbType == 25) {
        b.align0() // pcm_alignment_zero_bit
        val mx = mb % wMbs; val my = mb / wMbs
        for (i <- 0 until 256)
          b.u(luma(mx * 16 + i % 16, my * 16 + i / 16) & 0xff, 8)
        for (_ <- 0 until 128) b.u(128, 8) // Cb then Cr, neutral
      }
    }
    b.trail()
    Array(0x65.toByte) ++ escapeRbsp(b.bytes)
  }

  /** BMFF with an 'avc1' stsd entry (avcC carrying the SPS/PPS) and
    * length-prefixed IDR samples in mdat — the fixture mirror of
    * rawMp4Bytes for the H.264 I_PCM path. */
  private def avcMp4Bytes(w: Int, h: Int,
                          lumas: Seq[(Int, Int) => Int],
                          mbType: Int = 25): Array[Byte] = {
    val wMbs = w / 16; val hMbs = h / 16
    val sps = spsNal(wMbs, hMbs); val pps = ppsNal()
    def len16(a: Array[Byte]) =
      Array(((a.length >> 8) & 0xff).toByte, (a.length & 0xff).toByte)
    val avcC = mkBox("avcC",
      Array[Byte](1, 66, 0, 10, (0xFC | 3).toByte, (0xE0 | 1).toByte),
      len16(sps), sps, Array[Byte](1), len16(pps), pps)
    val entry = mkBox("avc1", new Array[Byte](78), avcC)
    val stsd = mkBox("stsd", Array[Byte](0, 0, 0, 0), be32(1), entry)
    val samples = lumas.map { f =>
      val nal = idrNal(wMbs, hMbs, f, mbType)
      be32(nal.length.toLong) ++ nal // 4-byte length prefix (avcC 0xFF)
    }
    val mvhd = mkBox("mvhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
      be32(600), be32(600L * samples.length))
    val tkhd = mkBox("tkhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
      be32(1), be32(0), be32(600L * samples.length),
      new Array[Byte](8 + 2 + 2 + 2 + 2 + 36),
      be32(w.toLong << 16), be32(h.toLong << 16))
    val stts = mkBox("stts", Array[Byte](0, 0, 0, 0), be32(1),
      be32(samples.length), be32(600))
    val stsz = mkBox("stsz", Array[Byte](0, 0, 0, 0), be32(0),
      be32(samples.length), samples.map(s => be32(s.length)).flatten.toArray)
    val stsc = mkBox("stsc", Array[Byte](0, 0, 0, 0), be32(1),
      be32(1), be32(samples.length), be32(1))
    def moovOf(stco: Array[Byte]): Array[Byte] =
      mkBox("moov", mvhd, mkBox("trak", tkhd, mkBox("mdia", mkBox("minf",
        mkBox("stbl", stsd, stts, stsz, stsc, stco)))))
    val probeLen = moovOf(mkBox("stco", Array[Byte](0, 0, 0, 0), be32(1),
      be32(0))).length
    val moov = moovOf(mkBox("stco", Array[Byte](0, 0, 0, 0), be32(1),
      be32(probeLen + 8L)))
    moov ++ mkBox("mdat", samples.flatten.toArray)
  }

  test("H.264 baseline I_PCM: real pixel decode, grayscale exact") {
    // 32×32 = 2×2 macroblocks, horizontal luma ramp, neutral chroma
    val lum = (x: Int, _: Int) => math.min(255, 30 + x * 6)
    val clip = avcMp4Bytes(32, 32, Seq(lum))
    assert(Multimodal.bmffSampleFormat(clip).contains("avc1"))
    val rv = Multimodal.avcIPcmVideo(clip).get
    assert(rv.width == 32 && rv.height == 32 && rv.frames.length == 1)
    assert(!rv.bgr && !rv.bottomUp && rv.stride == 96)
    val f = rv.frames.head
    for (y <- 0 until 32; x <- 0 until 32) {
      val o = y * rv.stride + x * 3
      val exp = lum(x, y)
      assert((f(o) & 0xff) == exp && (f(o + 1) & 0xff) == exp &&
        (f(o + 2) & 0xff) == exp, s"pixel ($x,$y)")
    }
  }

  test("I_PCM clip flows through the SAME integer-grid dHash path as raw video") {
    val lum = (x: Int, y: Int) => math.min(255, 16 + x * 5 + y * 2)
    val implicits = spark.implicits
    import implicits._
    val rows = Seq(
      Multimodal.MediaRow(60L, "video", avcMp4Bytes(32, 32, Seq(lum))))
    val got = Multimodal.videoHashes(rows.toDS()).collect()
    assert(got.length == 1 && got(0).getInt(2) == 32 && got(0).getInt(3) == 32)
    // expected dHash via the shared rawFrameImage + dHash64 kernel on
    // a directly-constructed image with the same grayscale pixels
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val v = lum(x, y); img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val expected = Multimodal.dHash64(img)
    assert(got(0).getLong(1) == expected && expected != 0L)
  }

  test("I_PCM emulation-prevention bytes round-trip exactly") {
    // plant a luma run 0,0,1 inside the PCM bytes: the fixture encoder
    // must insert 0x03 and the decoder must strip it
    val lum = (x: Int, y: Int) =>
      if (y == 0 && (x == 4 || x == 5)) 0 else if (y == 0 && x == 6) 1 else 77
    val clip = avcMp4Bytes(16, 16, Seq(lum))
    // the escape byte is actually present in the coded sample
    val rv = Multimodal.avcIPcmVideo(clip).get
    val f = rv.frames.head
    assert((f(4 * 3) & 0xff) == 0 && (f(5 * 3) & 0xff) == 0 &&
      (f(6 * 3) & 0xff) == 1 && (f(7 * 3) & 0xff) == 77)
  }

  test("entropy-coded (non-I_PCM) H.264 still falls back, never mis-decodes") {
    // same container, mb_type 0 (I_4x4 — entropy-coded residuals):
    // out of scope by contract, must return None and be dropped
    val clip = avcMp4Bytes(16, 16, Seq((_, _) => 50), mbType = 0)
    assert(Multimodal.avcIPcmVideo(clip).isEmpty)
    val implicits = spark.implicits
    import implicits._
    val rows = Seq(Multimodal.MediaRow(61L, "video", clip))
    assert(Multimodal.videoHashes(rows.toDS()).count() == 0L)
  }

  test("bare Annex-B I_PCM stream decodes through the same RawVideo surface") {
    val sc4 = Array[Byte](0, 0, 0, 1); val sc3 = Array[Byte](0, 0, 1)
    val lum1 = (x: Int, y: Int) => math.min(255, 20 + x * 7 + y)
    val lum2 = (x: Int, _: Int) => math.min(255, 200 - x * 3)
    val stream = sc4 ++ spsNal(2, 2) ++ sc3 ++ ppsNal() ++
      sc3 ++ idrNal(2, 2, lum1) ++ sc3 ++ idrNal(2, 2, lum2)
    val rv = Multimodal.avcAnnexBVideo(stream).get
    assert(rv.width == 32 && rv.height == 32 && rv.frames.length == 2)
    for (x <- 0 until 32) {
      assert((rv.frames(0)(x * 3) & 0xff) == lum1(x, 0), s"f0 x=$x")
      assert((rv.frames(1)(x * 3) & 0xff) == lum2(x, 0), s"f1 x=$x")
    }
    // flows through videoHashes like every other decodable payload
    val implicits = spark.implicits
    import implicits._
    val got = Multimodal.videoHashes(
      Seq(Multimodal.MediaRow(63L, "video", stream)).toDS()).collect()
    assert(got.length == 1 && got(0).getLong(4) == 2L)
    // a non-I_PCM Annex-B stream falls back (dropped, never mis-decoded)
    val bad = sc4 ++ spsNal(1, 1) ++ sc3 ++ ppsNal() ++
      sc3 ++ idrNal(1, 1, (_, _) => 50, mbType = 0)
    assert(Multimodal.avcAnnexBVideo(bad).isEmpty)
  }

  test("I_PCM temporal signature: k frames decode through videoTemporalHashes") {
    val implicits = spark.implicits
    import implicits._
    val mk = (base: Int) => (x: Int, y: Int) =>
      math.min(255, base + x * 4 + y)
    val rows = Seq(Multimodal.MediaRow(62L, "video",
      avcMp4Bytes(32, 32, Seq(mk(10), mk(60), mk(120)))))
    val got = Multimodal.videoTemporalHashes(rows.toDS(), k = 3).collect()
    assert(got.length == 1)
    val hashes = got(0).getSeq[Long](1)
    assert(hashes.length == 3 && got(0).getLong(2) == 3L)
  }

  test("crossModalDedupPairs: a clip and its extracted poster still pair up") {
    val implicits = spark.implicits
    import implicits._
    val ids = (0L to 5L).toDF("doc_id")
    val vids = Multimodal.syntheticVideoCorpus(ids, "doc_id")
    val stills = Multimodal.syntheticPosterStills(ids, "doc_id", 1000L)
    val pairs = Multimodal.crossModalDedupPairs(vids.union(stills), 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // PNG re-encode is lossless: every poster (id+1000) collides with
    // its own clip (id) at hamming 0 through the shared dHash kernel
    for (id <- 0L to 5L)
      assert(pairs.exists { case (img, vid, h) =>
        img == id + 1000L && vid == id && h == 0L }, s"id=$id missing")
    // only cross-kind pairs are emitted (kind parity is in the low bit)
    assert(pairs.forall { case (img, vid, _) => img >= 1000L && vid < 1000L })
    // within-modality dedup alone NEVER produces these pairs: the two
    // copies live in different kind partitions by construction
    val withinV = Multimodal.videoDedupPairs(vids.union(stills), 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(withinV.forall { case (a, b) => a < 1000L && b < 1000L })
  }

  test("videoHashes + videoDedupPairs over REAL raw-AVI payloads") {
    val implicits = spark.implicits
    import implicits._
    val ids = (0L to 7L).toDF("doc_id")
    val media = Multimodal.syntheticVideoCorpus(ids, "doc_id")
    val hashes = Multimodal.videoHashes(media)
    assert(hashes.count() == 8L) // every raw AVI decodes
    val h1 = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h2 = Multimodal.videoHashes(media.repartition(5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1 == h2) // deterministic, partition-independent
    assert(h1(0L) == h1(3L) && h1(4L) == h1(7L)) // exact dups
    // different seeds produce well-separated first-frame hashes
    assert(java.lang.Long.bitCount(h1(0L) ^ h1(4L)) > 3)
    val pairs = Multimodal.videoDedupPairs(media, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((0L, 3L)) == 0L && pairs((4L, 7L)) == 0L)
    assert(pairs.keySet.forall { case (a, b) => a / 4 == b / 4 })
    // an MJPEG video hashes through the same ImageIO path: the same
    // flat-gray first frame in MJPEG and raw AVI must dHash equal
    // (flat frames have zero gradient -> hash 0 on both paths)
    val mj = Seq(Multimodal.MediaRow(50L, "video",
      mjpegAviBytes(Seq(jpegBytes(16, 16, 128))))).toDS()
    val raw = Seq(Multimodal.MediaRow(51L, "video",
      rawAviBytes(16, 16, Seq(128)))).toDS()
    val hm = Multimodal.videoHashes(mj).collect().head.getLong(1)
    val hr = Multimodal.videoHashes(raw).collect().head.getLong(1)
    assert(hm == hr && hm == 0L)
    // undecodable payloads are dropped, not stubbed
    val broken = Seq(Multimodal.MediaRow(99L, "video",
      Array[Byte](9, 9, 9, 9))).toDS()
    assert(Multimodal.videoHashes(broken).count() == 0L)
  }

  test("audioFingerprint: lock-free WAV fast path equals the JDK path (AIFF twin)") {
    // identical synthesized samples in WAV (fast path: inline RIFF
    // parser) and AIFF (fallback path: AudioSystem, big-endian) must
    // hash identically — pins the two decode paths to one kernel
    val samples = pcmBytes(440.0, 0.5, 8000f, 0.5,
      bigEndian = false, javax.sound.sampled.AudioFileFormat.Type.WAVE)
    val aiff = pcmBytes(440.0, 0.5, 8000f, 0.5,
      bigEndian = true, javax.sound.sampled.AudioFileFormat.Type.AIFF)
    assert(Multimodal.wavPcm16(samples).isDefined)  // WAV takes the fast path
    assert(Multimodal.wavPcm16(aiff).isEmpty)       // AIFF falls back to the JDK
    assert(Multimodal.audioFingerprint(samples) == Multimodal.audioFingerprint(aiff))
    assert(Multimodal.audioFingerprint(samples).isDefined)
  }

  test("audioFingerprint is gain-shift tolerant on the sign grid") {
    // the same envelope SHAPE at half gain flips no sign bits: scale
    // every sample of a synthetic clip by 1/2 via a re-synthesized wav
    val a = Multimodal.syntheticWav(7L, 0)
    val fpA = Multimodal.audioFingerprint(a).get
    // decode, halve, re-encode through the same JDK path
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(a))
    val buf = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](8192)
    var n = in.read(chunk)
    while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
    val pcm = buf.toByteArray
    var i = 0
    while (i < pcm.length / 2) {
      val s = (((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort / 2).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, (pcm.length / 2).toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val fpHalf = Multimodal.audioFingerprint(out.toByteArray).get
    // halving is s/2 with truncation — cell means halve (±1), so
    // strict inequalities can flip only on near-ties: allow a couple
    assert(java.lang.Long.bitCount(fpA ^ fpHalf) <= 4)
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

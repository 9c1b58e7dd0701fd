package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (brief-mandated): image/audio/video as
  * opaque BINARY columns with typed metadata, processed per-partition in
  * batches. The Spark side — schema, partitioning, batch iteration, typed
  * Encoders — is real and tested, and so is IMAGE decode: payloads in
  * any JDK-supported raster format (PNG, BMP, GIF, JPEG via
  * `javax.imageio.ImageIO`, no external dependency) are decoded for
  * real — dimensions from the actual raster, resize through a real
  * Graphics2D scale + PNG re-encode — and so is AUDIO decode:
  * WAV/AIFF/AU via `javax.sound.sampled` (also JDK-native), with
  * frames/rate/channels from the container and RMS + zero-crossings
  * computed from the actual PCM stream — and so is VIDEO container
  * metadata: MP4/ISO-BMFF moov parsing (`decodeVideoMeta`, pure byte
  * arithmetic) yields real dimensions, frame counts, timescale and
  * duration — and VIDEO frame PIXELS are real for MJPEG (each frame a
  * complete JPEG): AVI/RIFF `movi` chunks and BMFF stsz/stsc/stco
  * sample tables are walked and every frame decoded through the same
  * ImageIO path as still images (`videoFrames`, `videoThumbnails`) —
  * and for UNCOMPRESSED tracks (AVI BI_RGB 24bpp, BMFF 'raw ' sample
  * entries): pure byte slicing, losslessly exact per-frame luma —
  * and for baseline H.264 whose macroblocks are all I_PCM (the raw-
  * byte macroblock mode): real SPS/PPS/slice parsing + pixel decode
  * via [[H264]], through the same RawVideo surface. Only entropy-
  * CODED macroblocks (CAVLC/CABAC residuals) have no JDK decoder.
  * Payloads no parser accepts (arbitrary bytes, non-BMFF/AVI video)
  * fall back to `decodeStub` — a deterministic fake derived from the
  * bytes, kept so the pipeline shape is exercisable on synthetic
  * payloads; swap it for a media library (javacv etc.) without
  * touching the surrounding plumbing.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, media: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
                                 content_hash: Long, width: Int, height: Int,
                                 n_frames: Int)

  /** Wrap any table with a binary payload column into the media schema
    * (tests derive fake media from document text bytes). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("media"))

  /** Real image decode via the JDK's ImageIO: Some(raster) for any
    * format a registered reader understands (PNG/BMP/GIF/JPEG out of
    * the box), None otherwise. The in-memory stream + disabled disk
    * cache keep this executor-safe (no temp files per task). */
  private[pipeline] def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    } catch { case _: Exception => None }

  /** ==== STUB ==== deterministic fake decode — the FALLBACK for
    * payloads no real parser accepts (ImageIO for images,
    * javax.sound.sampled for audio, the BMFF walker for video
    * containers) and for video frame PIXELS, the one step with no JDK
    * codec; real implementations replace this body. */
  private[pipeline] def decodeStub(kind: String, bytes: Array[Byte]): (Int, Int, Int) = {
    var h = 1125899906842597L // FNV-ish rolling hash of the payload
    bytes.foreach(b => h = h * 31 + (b & 0xff))
    val pos = h & Long.MaxValue
    kind match {
      case "image" => (64 + (pos % 512).toInt, 64 + ((pos >> 9) % 512).toInt, 1)
      case "video" => (64 + (pos % 512).toInt, 64 + ((pos >> 9) % 512).toInt,
                       1 + ((pos >> 18) % 300).toInt)
      case _       => (0, 0, 1 + (pos % 300).toInt) // audio: frames only
    }
  }

  final case class AudioInfo(frames: Long, sampleRate: Float, channels: Int,
                             rms: Double, zeroCross: Long)

  /** Real audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * need no external codec): container header → (frames, rate,
    * channels), then the PCM stream is actually read — RMS amplitude
    * and zero-crossing count over the first channel of 16-bit PCM in
    * either byte order (WAV little-endian, AIFF/AU big-endian), the two
    * features every audio-quality gate starts from. None for payloads
    * no JDK reader accepts or with a non-16-bit encoding. */
  private[pipeline] def decodeAudio(bytes: Array[Byte]): Option[AudioInfo] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val frameSize = fmt.getFrameSize
          val channels = fmt.getChannels
          // WAV is little-endian; AIFF and AU carry big-endian PCM —
          // branch on the container's declared byte order so all three
          // JDK formats take the real decode path.
          val bigEndian = fmt.isBigEndian
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = in.read(chunk)
          while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          val pcm = buf.toByteArray
          val nFrames = pcm.length / frameSize
          var sumSq = 0.0
          var zc = 0L
          var prevNeg = false
          var f = 0
          while (f < nFrames) {
            val off = f * frameSize
            val s =
              if (bigEndian) (((pcm(off) << 8) | (pcm(off + 1) & 0xff))).toShort
              else ((pcm(off) & 0xff) | (pcm(off + 1) << 8)).toShort
            val x = s / 32768.0
            sumSq += x * x
            val neg = x < 0.0
            if (f > 0 && neg != prevNeg) zc += 1
            prevNeg = neg
            f += 1
          }
          val rms = if (nFrames == 0) 0.0 else math.sqrt(sumSq / nFrames)
          Some(AudioInfo(nFrames.toLong, fmt.getSampleRate, channels, rms, zc))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  final case class VideoInfo(width: Int, height: Int, nFrames: Int,
                             timescale: Long, durationS: Double)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  /** ISO-BMFF box walk over [start, end): (type, payloadStart,
    * payloadEnd) per well-formed box; stops (returning what it has) at
    * the first malformed header rather than throwing. Handles 64-bit
    * largesize (size==1) and to-end boxes (size==0). */
  private def boxes(b: Array[Byte], start: Int, end: Int): Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var at = start
    var ok = true
    while (ok && at + 8 <= end) {
      val size0 = be32(b, at)
      val typ = new String(b, at + 4, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      var hdr = 8L
      val size =
        if (size0 == 1L) { hdr = 16L; if (at + 16 <= end) be64(b, at + 8) else -1L }
        else if (size0 == 0L) (end - at).toLong
        else size0
      if (size < hdr || at + size > end) ok = false
      else {
        out += ((typ, (at + hdr).toInt, (at + size).toInt))
        at = (at + size).toInt
      }
    }
    out.toSeq
  }

  /** Real MP4/ISO-BMFF *container* metadata — pure JDK byte arithmetic,
    * no codec: moov/mvhd gives (timescale, duration), each moov/trak's
    * tkhd gives track dims (16.16 fixed point), and the video trak's
    * mdia/minf/stbl/stts gives the frame count (sum of sample counts).
    * The video track is the trak with non-zero tkhd dims. Frame PIXELS
    * still have no JDK decoder — only pixel decode remains stubbed.
    * None for payloads that are not parseable ISO-BMFF with a
    * dimensioned track. */
  private[pipeline] def decodeVideoMeta(bytes: Array[Byte]): Option[VideoInfo] =
    try {
      val moov = boxes(bytes, 0, bytes.length).find(_._1 == "moov")
      moov.flatMap { case (_, ms, me) =>
        val inMoov = boxes(bytes, ms, me)
        val mvhd = inMoov.find(_._1 == "mvhd").flatMap { case (_, s, e) =>
          val v = bytes(s) & 0xff
          if (v == 1 && e - s >= 32) Some((be32(bytes, s + 20), be64(bytes, s + 24)))
          else if (v == 0 && e - s >= 20) Some((be32(bytes, s + 12), be32(bytes, s + 16)))
          else None
        }
        val tracks = inMoov.filter(_._1 == "trak").flatMap { case (_, ts, te) =>
          val inTrak = boxes(bytes, ts, te)
          val dims = inTrak.find(_._1 == "tkhd").flatMap { case (_, s, e) =>
            val v = bytes(s) & 0xff
            // width/height close the box as 16.16 fixed point; their
            // offset shifts with the 32→64-bit time fields of v1.
            if (v == 1 && e - s >= 96)
              Some(((be32(bytes, s + 88) >> 16).toInt, (be32(bytes, s + 92) >> 16).toInt))
            else if (v == 0 && e - s >= 84)
              Some(((be32(bytes, s + 76) >> 16).toInt, (be32(bytes, s + 80) >> 16).toInt))
            else None
          }
          val frames = for {
            (_, as, ae) <- inTrak.find(_._1 == "mdia")
            (_, bs, be) <- boxes(bytes, as, ae).find(_._1 == "minf")
            (_, cs, ce) <- boxes(bytes, bs, be).find(_._1 == "stbl")
            (_, ss, se) <- boxes(bytes, cs, ce).find(_._1 == "stts")
            if se - ss >= 8
          } yield {
            val nEntries = be32(bytes, ss + 4).toInt
            var total = 0L
            var i = 0
            while (i < nEntries && ss + 8 + 8 * i + 8 <= se) {
              total += be32(bytes, ss + 8 + 8 * i)
              i += 1
            }
            total
          }
          dims.map { case (w, h) => (w, h, frames.getOrElse(0L)) }
        }
        for {
          (scale, dur) <- mvhd
          (w, h, nf) <- tracks.find(t => t._1 > 0 && t._2 > 0)
        } yield VideoInfo(w, h, math.min(nf, Int.MaxValue.toLong).toInt, scale,
          if (scale > 0) dur.toDouble / scale else 0.0)
      }
    } catch { case _: Exception => None }

  // ---- MJPEG frame-PIXEL decode (real, no external codec): each MJPEG
  // frame is a complete JPEG, which ImageIO decodes — so AVI/RIFF
  // ('00dc' movi chunks) and BMFF (stsz/stsc/stco sample table) MJPEG
  // video gets REAL pixels through the same JDK path as still images.

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def isJpeg(b: Array[Byte], off: Int, len: Int): Boolean =
    len >= 2 && (b(off) & 0xff) == 0xff && (b(off + 1) & 0xff) == 0xd8

  /** RIFF/AVI walk: video-stream chunks (`##dc`/`##db`, inside any
    * LIST — `movi` in practice) whose payload starts with the JPEG SOI
    * marker, in file order. Chunks are word-aligned (odd sizes pad one
    * byte). Stops at the first malformed header like [[boxes]]. */
  private[pipeline] def aviMjpegFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var at = start
      var ok = true
      while (ok && at + 8 <= end) {
        val id = new String(bytes, at, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
        val size = le32(bytes, at + 4)
        if (size < 0 || at + 8 + size > end) ok = false
        else {
          val ds = at + 8; val de = (ds + size).toInt
          if (id == "LIST" && size >= 4) walk(ds + 4, de)
          else if (id.length == 4 && id.charAt(2) == 'd' &&
                   (id.charAt(3) == 'c' || id.charAt(3) == 'b') &&
                   isJpeg(bytes, ds, de - ds))
            out += java.util.Arrays.copyOfRange(bytes, ds, de)
          at = de + (size & 1L).toInt // even-byte padding
        }
      }
    }
    if (bytes.length >= 12 &&
        new String(bytes, 0, 4, java.nio.charset.StandardCharsets.ISO_8859_1) == "RIFF" &&
        new String(bytes, 8, 4, java.nio.charset.StandardCharsets.ISO_8859_1) == "AVI ")
      walk(12, bytes.length)
    out.toSeq
  }

  /** BMFF sample extraction for the dimensioned (video) trak: stsz
    * sizes × stsc sample-to-chunk runs × stco/co64 chunk offsets give
    * each sample's absolute byte range (samples are contiguous within
    * a chunk); samples that start with the JPEG SOI marker are MJPEG
    * frames. Empty for non-BMFF or non-MJPEG payloads. */
  private[pipeline] def bmffMjpegFrames(bytes: Array[Byte]): Seq[Array[Byte]] =
    bmffSamples(bytes).filter(s => isJpeg(s, 0, s.length))

  /** The video trak's stsd first-entry sample format fourcc ('mp4v',
    * 'raw ', …) — how a demuxer decides which decoder a track needs.
    * None when the payload is not BMFF / has no stsd. */
  def bmffSampleFormat(bytes: Array[Byte]): Option[String] =
    try {
      videoStbl(bytes).flatMap { case (cs, ce) =>
        boxes(bytes, cs, ce).find(_._1 == "stsd").flatMap { case (_, s, e) =>
          // version/flags (4) + entry_count (4), then the first sample
          // entry is itself a box: size (4) + format fourcc (4)
          if (e - s >= 16)
            Some(new String(bytes, s + 12, 4,
              java.nio.charset.StandardCharsets.ISO_8859_1))
          else None
        }
      }
    } catch { case _: Exception => None }

  /** The stbl payload range of the dimensioned (video) trak. */
  private def videoStbl(bytes: Array[Byte]): Option[(Int, Int)] =
    try {
      (for {
        (_, ms, me) <- boxes(bytes, 0, bytes.length).find(_._1 == "moov")
        trak <- boxes(bytes, ms, me).filter(_._1 == "trak").find { case (_, ts, te) =>
          boxes(bytes, ts, te).exists { case (t, s, e) =>
            t == "tkhd" && {
              val v = bytes(s) & 0xff
              (v == 1 && e - s >= 96 && (be32(bytes, s + 88) >> 16) > 0) ||
              (v == 0 && e - s >= 84 && (be32(bytes, s + 76) >> 16) > 0)
            }
          }
        }
        (_, as, ae) <- boxes(bytes, trak._2, trak._3).find(_._1 == "mdia")
        (_, bs, be) <- boxes(bytes, as, ae).find(_._1 == "minf")
        stbl <- boxes(bytes, bs, be).find(_._1 == "stbl")
      } yield (stbl._2, stbl._3))
    } catch { case _: Exception => None }

  /** All samples of the dimensioned (video) trak, in sample-table
    * order, codec-agnostic: stsz sizes × stsc runs × stco/co64 chunk
    * offsets give each sample's absolute byte range (samples are
    * contiguous within a chunk). Empty for non-BMFF payloads. */
  private[pipeline] def bmffSamples(bytes: Array[Byte]): Seq[Array[Byte]] =
    try {
      videoStbl(bytes).toSeq.flatMap { case (cs, ce) =>
        val in = boxes(bytes, cs, ce)
        val sizes = in.find(_._1 == "stsz").toSeq.flatMap { case (_, s, e) =>
          if (e - s < 12) Seq.empty
          else {
            val fixed = be32(bytes, s + 4)
            val n = be32(bytes, s + 8).toInt
            if (fixed > 0) Seq.fill(n)(fixed)
            else (0 until n).takeWhile(i => s + 12 + 4 * i + 4 <= e)
              .map(i => be32(bytes, s + 12 + 4 * i))
          }
        }
        val chunkOffs = in.collectFirst {
          case ("stco", s, e) if e - s >= 8 =>
            val n = be32(bytes, s + 4).toInt
            (0 until n).takeWhile(i => s + 8 + 4 * i + 4 <= e)
              .map(i => be32(bytes, s + 8 + 4 * i))
          case ("co64", s, e) if e - s >= 8 =>
            val n = be32(bytes, s + 4).toInt
            (0 until n).takeWhile(i => s + 8 + 8 * i + 8 <= e)
              .map(i => be64(bytes, s + 8 + 8 * i))
        }.getOrElse(Seq.empty)
        val stscRuns = in.find(_._1 == "stsc").toSeq.flatMap { case (_, s, e) =>
          if (e - s < 8) Seq.empty
          else {
            val n = be32(bytes, s + 4).toInt
            (0 until n).takeWhile(i => s + 8 + 12 * i + 12 <= e)
              .map(i => (be32(bytes, s + 8 + 12 * i),       // first_chunk (1-based)
                be32(bytes, s + 8 + 12 * i + 4).toInt))     // samples_per_chunk
          }
        }
        if (sizes.isEmpty || chunkOffs.isEmpty) Seq.empty
        else {
          val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          var sample = 0
          var c = 0
          while (c < chunkOffs.length && sample < sizes.length) {
            val perChunk = stscRuns.filter(_._1 <= c + 1)
              .sortBy(_._1).lastOption.map(_._2).getOrElse(1)
            var off = chunkOffs(c)
            var k = 0
            while (k < perChunk && sample < sizes.length) {
              val sz = sizes(sample)
              if (off >= 0 && sz > 0 && off + sz <= bytes.length)
                out += java.util.Arrays.copyOfRange(
                  bytes, off.toInt, (off + sz).toInt)
              off += sz
              sample += 1; k += 1
            }
            c += 1
          }
          out.toSeq
        }
      }
    } catch { case _: Exception => Seq.empty }

  /** All decodable MJPEG frame payloads of a video byte blob, in
    * presentation (file/sample-table) order — AVI/RIFF first, BMFF
    * sample table otherwise. Empty when the payload is neither, or
    * carries a codec ImageIO can't decode (H.264 etc.). */
  private[pipeline] def mjpegFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val avi = aviMjpegFrames(bytes)
    if (avi.nonEmpty) avi else bmffMjpegFrames(bytes)
  }

  // ---- UNCOMPRESSED (raw-RGB) video-pixel decode: pure byte slicing,
  // no codec — AVI BI_RGB 24bpp ('DIB '/fourcc-0 streams, bottom-up
  // BGR rows DWORD-padded) and BMFF 'raw ' sample entries (top-down
  // RGB, unpadded). Shrinks the decode stub to entropy-coded codecs
  // (H.264 etc.) only.

  /** Decoded raw video: per-frame byte planes plus the layout needed
    * to address pixels — `bgr` (AVI order blue-green-red vs BMFF RGB),
    * `bottomUp` (AVI rows run bottom-to-top), `stride` (AVI rows pad
    * to 4 bytes; BMFF rows are packed). */
  final case class RawVideo(width: Int, height: Int,
                                              stride: Int, bgr: Boolean,
                                              bottomUp: Boolean,
                                              frames: Seq[Array[Byte]])

  /** AVI BI_RGB detection + frame slicing: LIST hdrl → LIST strl →
    * strh of type 'vids' followed by its strf BITMAPINFOHEADER; a raw
    * stream has biCompression == 0 (BI_RGB) and biBitCount == 24.
    * Frames are the '##db'/'##dc' movi chunks of exactly stride·h
    * bytes (stride = w·3 padded to 4), bottom-up BGR — the classic
    * uncompressed-AVI layout. None when the header says any other
    * codec (those chunks are MJPEG's or truly undecodable). */
  def aviRawVideo(bytes: Array[Byte]): Option[RawVideo] = {
    if (bytes.length < 12 ||
        new String(bytes, 0, 4, java.nio.charset.StandardCharsets.ISO_8859_1) != "RIFF" ||
        new String(bytes, 8, 4, java.nio.charset.StandardCharsets.ISO_8859_1) != "AVI ")
      return None
    var w = 0; var h = 0
    var isRaw = false
    var lastVids = false
    var topDown = false // negative biHeight = top-down row order (BMP rule)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var at = start
      var ok = true
      while (ok && at + 8 <= end) {
        val id = new String(bytes, at, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
        val size = le32(bytes, at + 4)
        if (size < 0 || at + 8 + size > end) ok = false
        else {
          val ds = at + 8; val de = (ds + size).toInt
          if (id == "LIST" && size >= 4) walk(ds + 4, de)
          else if (id == "strh" && size >= 4)
            lastVids = new String(bytes, ds, 4,
              java.nio.charset.StandardCharsets.ISO_8859_1) == "vids"
          else if (id == "strf" && lastVids && size >= 20) {
            // BITMAPINFOHEADER: biWidth @4, biHeight @8, biBitCount @14,
            // biCompression @16 (all little-endian)
            w = le32(bytes, ds + 4).toInt
            h = math.abs(le32(bytes, ds + 8).toInt)
            topDown = le32(bytes, ds + 8).toInt < 0
            val bitCount = (bytes(ds + 14) & 0xff) | ((bytes(ds + 15) & 0xff) << 8)
            isRaw = le32(bytes, ds + 16) == 0L && bitCount == 24
            lastVids = false
          }
          else if (id.length == 4 && id.charAt(2) == 'd' &&
                   (id.charAt(3) == 'c' || id.charAt(3) == 'b') &&
                   !isJpeg(bytes, ds, de - ds))
            frames += java.util.Arrays.copyOfRange(bytes, ds, de)
          at = de + (size & 1L).toInt
        }
      }
    }
    walk(12, bytes.length)
    val stride = (w * 3 + 3) & ~3
    if (isRaw && w > 0 && h > 0 &&
        frames.nonEmpty && frames.forall(_.length == stride * h))
      // bottomUp from the biHeight sign: a legal top-down AVI (negative
      // biHeight) must not decode vertically flipped, or a top-down and
      // a bottom-up copy of the same clip get different dHashes
      Some(RawVideo(w, h, stride, bgr = true, bottomUp = !topDown, frames.toSeq))
    else None
  }

  /** BMFF 'raw ' sample-entry detection: dims from the container parse,
    * frames from the codec-agnostic sample walk — accepted only when
    * every sample is exactly w·h·3 bytes (top-down packed RGB, the
    * QuickTime 'raw ' 24bpp layout). */
  def bmffRawVideo(bytes: Array[Byte]): Option[RawVideo] =
    if (!bmffSampleFormat(bytes).contains("raw ")) None
    else decodeVideoMeta(bytes).flatMap { v =>
      val frames = bmffSamples(bytes)
      if (v.width > 0 && v.height > 0 && frames.nonEmpty &&
          frames.forall(_.length == v.width * v.height * 3))
        Some(RawVideo(v.width, v.height, v.width * 3, bgr = false,
          bottomUp = false, frames))
      else None
    }

  // ---- H.264 baseline I_PCM pixel decode (real, pure JVM — see
  // [[H264]]): BMFF 'avc1' tracks whose every macroblock is I_PCM
  // decode through the same RawVideo surface as the uncompressed
  // paths, so dHash/temporal/thumbnail consumers need no new code.
  // Shrinks the decode stub to entropy-CODED H.264 (and other
  // entropy codecs) only.

  /** The avc1 sample entry's avcC decoder configuration: parsed SPS +
    * PPS + NAL length-prefix size. None when the track is not avc1 or
    * the configuration is outside [[H264]] scope. */
  private[pipeline] def avcConfig(bytes: Array[Byte])
      : Option[(H264.Sps, H264.Pps, Int)] =
    try {
      videoStbl(bytes).flatMap { case (cs, ce) =>
        boxes(bytes, cs, ce).find(_._1 == "stsd").flatMap { case (_, s, e) =>
          // version/flags + entry_count, then the first sample entry box
          if (e - s < 16) None
          else {
            val fmt = new String(bytes, s + 12, 4,
              java.nio.charset.StandardCharsets.ISO_8859_1)
            val entryEnd = math.min(e.toLong, s + 8 + be32(bytes, s + 8)).toInt
            // VisualSampleEntry fixed part is 78 bytes after the 8-byte
            // entry box header; child boxes (avcC, …) follow
            if (fmt != "avc1" || entryEnd < s + 16 + 78) None
            else boxes(bytes, s + 16 + 78, entryEnd).find(_._1 == "avcC")
              .flatMap { case (_, as, ae) =>
                // avcC: version, profile, compat, level,
                // 0xFC|lengthSizeMinusOne, 0xE0|numSPS, then SPS/PPS sets
                if (ae - as < 7) None
                else {
                  val lengthSize = (bytes(as + 4) & 0x3) + 1
                  val nSps = bytes(as + 5) & 0x1f
                  var at = as + 6
                  var sps: Option[H264.Sps] = None
                  var i = 0
                  while (i < nSps && at + 2 <= ae) {
                    val len = ((bytes(at) & 0xff) << 8) | (bytes(at + 1) & 0xff)
                    if (sps.isEmpty && at + 2 + len <= ae && len >= 1)
                      sps = H264.parseSps(
                        H264.rbspOf(bytes, at + 3, at + 2 + len)) // skip NAL hdr
                    at += 2 + len
                    i += 1
                  }
                  var pps: Option[H264.Pps] = None
                  if (at < ae) {
                    val nPps = bytes(at) & 0xff
                    at += 1
                    var j = 0
                    while (j < nPps && at + 2 <= ae) {
                      val len = ((bytes(at) & 0xff) << 8) | (bytes(at + 1) & 0xff)
                      if (pps.isEmpty && at + 2 + len <= ae && len >= 1)
                        pps = H264.parsePps(
                          H264.rbspOf(bytes, at + 3, at + 2 + len))
                      at += 2 + len
                      j += 1
                    }
                  }
                  for (s1 <- sps; p1 <- pps) yield (s1, p1, lengthSize)
                }
              }
          }
        }
      }
    } catch { case _: Exception => None }

  /** All-I_PCM baseline H.264 decode → the shared [[RawVideo]] surface
    * (top-down packed RGB, like BMFF raw). Accepted only when EVERY
    * sample decodes — a mixed stream (any entropy-coded macroblock)
    * falls through to the documented stub. */
  def avcIPcmVideo(bytes: Array[Byte]): Option[RawVideo] =
    avcConfig(bytes).flatMap { case (sps, pps, lengthSize) =>
      val w = sps.width; val h = sps.height
      if (w <= 0 || h <= 0) None
      else {
        val samples = bmffSamples(bytes)
        if (samples.isEmpty) None
        else {
          val frames = samples.map(H264.decodeSample(_, lengthSize, sps, pps))
          if (frames.exists(_.isEmpty)) None
          else Some(RawVideo(w, h, w * 3, bgr = false, bottomUp = false,
            frames.map(_.get)))
        }
      }
    }

  /** Bare Annex-B baseline H.264 all-I_PCM stream (the other common
    * storage form — raw `.h264` elementary streams with 00 00 [00] 01
    * start codes, no container) through the same RawVideo surface. */
  def avcAnnexBVideo(bytes: Array[Byte]): Option[RawVideo] =
    H264.decodeAnnexB(bytes).map { case (sps, frames) =>
      RawVideo(sps.width, sps.height, sps.width * 3, bgr = false,
        bottomUp = false, frames)
    }

  /** Raw video of any supported container/codec, AVI first (mirrors
    * [[mjpegFrames]] precedence), then BMFF uncompressed, then
    * baseline H.264 I_PCM in BMFF, then bare Annex-B I_PCM. */
  def rawVideo(bytes: Array[Byte]): Option[RawVideo] =
    aviRawVideo(bytes).orElse(bmffRawVideo(bytes))
      .orElse(avcIPcmVideo(bytes)).orElse(avcAnnexBVideo(bytes))

  /** Mean 8-bit Rec.601 luma of one raw frame — row order is
    * irrelevant for a mean, channel order is not. */
  def rawMeanLuma(rv: RawVideo, frame: Array[Byte]): Double = {
    var sum = 0.0
    var y = 0
    while (y < rv.height) {
      var x = 0
      while (x < rv.width) {
        val o = y * rv.stride + x * 3
        val c0 = frame(o) & 0xff; val c1 = frame(o + 1) & 0xff
        val c2 = frame(o + 2) & 0xff
        val (r, g, b) = if (rv.bgr) (c2, c1, c0) else (c0, c1, c2)
        sum += 0.299 * r + 0.587 * g + 0.114 * b
        x += 1
      }
      y += 1
    }
    math.rint(sum / (rv.width.toLong * rv.height) * 1e4) / 1e4
  }

  /** One raw frame as a BufferedImage (for the thumbnail/resize path). */
  def rawFrameImage(rv: RawVideo,
                                      frame: Array[Byte]): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      rv.width, rv.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < rv.height) {
      val srcY = if (rv.bottomUp) rv.height - 1 - y else y
      var x = 0
      while (x < rv.width) {
        val o = srcY * rv.stride + x * 3
        val c0 = frame(o) & 0xff; val c1 = frame(o + 1) & 0xff
        val c2 = frame(o + 2) & 0xff
        val rgb = if (rv.bgr) (c2 << 16) | (c1 << 8) | c0
                  else (c0 << 16) | (c1 << 8) | c2
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    img
  }

  /** (width, height, n_frames) for one payload: a real ImageIO decode
    * for image rows, a real JDK audio header+PCM decode for audio rows
    * (frames from the actual stream), a real ISO-BMFF container parse
    * for video rows (dims + frame count from moov), REAL MJPEG pixel
    * decode for MJPEG-in-AVI video (dims from the first frame's actual
    * raster, count from the movi chunk stream), and the stub only for
    * payloads no parser accepts. A still image is one frame by
    * definition. */
  private[pipeline] def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int) =
    kind match {
      case "image" => decodeImage(bytes) match {
        case Some(img) => (img.getWidth, img.getHeight, 1)
        case None      => decodeStub(kind, bytes)
      }
      case "audio" => decodeAudio(bytes) match {
        case Some(a) => (0, 0, math.min(a.frames, Int.MaxValue.toLong).toInt)
        case None    => decodeStub(kind, bytes)
      }
      case "video" => decodeVideoMeta(bytes) match {
        case Some(v) => (v.width, v.height, v.nFrames)
        case None =>
          val frames = aviMjpegFrames(bytes)
          frames.headOption.flatMap(decodeImage) match {
            case Some(first) => (first.getWidth, first.getHeight, frames.length)
            case None => aviRawVideo(bytes) match {
              case Some(rv) => (rv.width, rv.height, rv.frames.length)
              case None     => decodeStub(kind, bytes)
            }
          }
      }
      case _ => decodeStub(kind, bytes)
    }

  /** Feature extraction over the media column: mapPartitions so a real
    * decoder can amortize model/codec init once per partition and batch
    * its calls — the Spark-native analogue of mapInPandas. Image rows
    * decode for real; see [[decode]]. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init of heavier decoders goes here (ImageIO
      // readers are registered JVM-wide already)
      it.map { r =>
        val (w, h, f) = decode(r.kind, r.media)
        var hash = 1125899906842597L
        r.media.foreach(b => hash = hash * 31 + (b & 0xff))
        MediaFeatures(r.media_id, r.kind, r.media.length.toLong, hash, w, h, f)
      }
    }
  }

  final case class ResizedMedia(media_id: Long, kind: String,
                                width: Int, height: Int, media: Array[Byte])

  /** Real raster resize: scale through Graphics2D onto a (w, h) RGB
    * canvas and re-encode as PNG. Deterministic (fixed TYPE_INT_RGB
    * target, default scaling, PNG writer from the JDK). */
  private[pipeline] def resizeImage(img: java.awt.image.BufferedImage,
                                    w: Int, h: Int): Array[Byte] = {
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try g.drawImage(img, 0, 0, w, h, null)
    finally g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", baos)
    baos.toByteArray
  }

  /** Resize/resample: decode → scale to (w, h) → re-encode, batched per
    * partition like [[extractFeatures]] so a real codec inits once.
    * Image payloads ImageIO can read go through the REAL pixel path
    * ([[resizeImage]]: Graphics2D scale + PNG re-encode); everything
    * else takes the ==== STUB ==== re-encode — a deterministic byte
    * slice sized by the target area (payload shrinks/pads like a real
    * downscale would). Typed output schema and partition shape are the
    * same on both paths. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    require(w > 0 && h > 0, "target dims must be positive")
    media.mapPartitions { it =>
      // per-partition init of heavier codecs goes here
      it.map { r =>
        val real = if (r.kind == "image") decodeImage(r.media) else None
        real match {
          case Some(img) =>
            ResizedMedia(r.media_id, r.kind, w, h, resizeImage(img, w, h))
          case None =>
            // Long arithmetic: i·len overflows Int for MB-scale payloads
            // (255·9e6 > 2^31) and w·h for large target dims
            val target = math.min(math.max(1L, w.toLong * h.toLong / 8L),
              Int.MaxValue.toLong - 8).toInt
            val out = new Array[Byte](target)
            val len = r.media.length.toLong
            var i = 0L
            while (i < target) {
              out(i.toInt) = if (len == 0L) 0
                             else r.media(((i * len) / target % len).toInt)
              i += 1
            }
            ResizedMedia(r.media_id, r.kind, w, h, out)
        }
      }
    }
  }

  /** Real audio feature extraction over audio-kind rows: frames, rate,
    * channels, duration, RMS amplitude and zero-crossing count from the
    * actual PCM stream ([[decodeAudio]]). Rows whose payload no JDK
    * reader accepts are dropped (a production pipeline quarantines
    * them; the count of survivors IS the decode-health signal).
    * mapPartitions like [[extractFeatures]] so codec init amortizes. */
  def audioStats(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.flatMap { r =>
        decodeAudio(r.media).map { a =>
          (r.media_id, a.frames, a.sampleRate.toDouble, a.channels,
            if (a.sampleRate > 0) a.frames / a.sampleRate.toDouble else 0.0,
            a.rms, a.zeroCross)
        }
      }
    }.toDF("media_id", "frames", "sample_rate", "channels", "duration_s",
      "rms", "zero_cross")
  }

  /** Real video container metadata over video-kind rows: dimensions,
    * frame count, timescale and duration from the actual ISO-BMFF moov
    * structure ([[decodeVideoMeta]] — no codec needed for the
    * container). Rows whose payload is not parseable BMFF are dropped
    * (the survivor count is the decode-health signal, mirroring
    * [[audioStats]]). mapPartitions so a real demuxer would init once
    * per partition. */
  def videoStats(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { r =>
        decodeVideoMeta(r.media).map { v =>
          (r.media_id, v.width, v.height, v.nFrames.toLong, v.timescale,
            v.durationS)
        }
      }
    }.toDF("media_id", "width", "height", "n_frames", "timescale",
      "duration_s")
  }

  /** REAL per-frame pixel features over MJPEG video rows (AVI `movi`
    * chunks or BMFF MJPEG sample tables — see [[mjpegFrames]]): one row
    * per decodable frame with its actual raster dims and mean 8-bit
    * luma (Rec.601 weights over every pixel — the black-frame /
    * exposure screen a video-quality gate starts from). Rows whose
    * payload carries no decodable MJPEG frame are dropped (survivor
    * count is the decode-health signal, as in [[audioStats]]).
    * mapPartitions so a real codec inits once per partition. */
  def videoFrames(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { r =>
        val mjpeg = mjpegFrames(r.media)
        if (mjpeg.nonEmpty)
          mjpeg.iterator.zipWithIndex.flatMap { case (jpg, i) =>
            decodeImage(jpg).map { img =>
              val w = img.getWidth; val h = img.getHeight
              var sum = 0.0
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  sum += 0.299 * ((rgb >> 16) & 0xff) +
                    0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                  x += 1
                }
                y += 1
              }
              (r.media_id, i.toLong, w, h,
                math.rint(sum / (w.toLong * h) * 1e4) / 1e4)
            }
          }
        else rawVideo(r.media).iterator.flatMap { rv =>
          // uncompressed track: the luma comes straight off the byte
          // plane — no codec, and (unlike JPEG) losslessly exact
          rv.frames.iterator.zipWithIndex.map { case (f, i) =>
            (r.media_id, i.toLong, rv.width, rv.height, rawMeanLuma(rv, f))
          }
        }
      }
    }.toDF("media_id", "frame_idx", "width", "height", "mean_luma")
  }

  /** First-frame PNG thumbnail per MJPEG video row: frame 0 through the
    * REAL pixel path ([[resizeImage]] — Graphics2D scale + PNG
    * re-encode). Rows with no decodable first frame are dropped. */
  def videoThumbnails(media: Dataset[MediaRow], w: Int = 32, h: Int = 32): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    require(w > 0 && h > 0, "thumbnail dims must be positive")
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { r =>
        mjpegFrames(r.media).headOption.flatMap(decodeImage)
          .orElse(rawVideo(r.media).collect {
            case rv if rv.frames.nonEmpty => rawFrameImage(rv, rv.frames.head)
          })
          .map { img =>
            (r.media_id, img.getWidth, img.getHeight, resizeImage(img, w, h))
          }
      }
    }.toDF("media_id", "src_width", "src_height", "thumb_png")
  }

  /** Deterministic frame sampling plan for video rows: one row per
    * sampled frame index (every `stride`-th frame). The decode of each
    * frame is the stubbed step; the explode/partition shape is real. */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): DataFrame =
    features.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  // ==== Perceptual image hashing + near-dup detection ====
  // The missing modality of the dedup matrix (text ✓ MinHash/SimHash,
  // embeddings ✓ cosine-LSH): a multimodal training pipeline dedups
  // IMAGES too. dHash/aHash over the REAL decoded raster (same ImageIO
  // path as extractFeatures), hamming-blocked candidate pairs reusing
  // the SimHash pigeonhole discipline.

  /** Deterministic gw×gh grayscale grid of a decoded raster: integer
    * Rec.601 luma (299·R + 587·G + 114·B, kept in milli-luma 0..255000)
    * box-filter-averaged per cell with floor division. Deliberately NOT
    * Graphics2D (its scaler is implementation/JVM-flag dependent) —
    * pure integer arithmetic makes every perceptual hash below
    * bit-identical across machines. Cell (gx, gy) covers pixels
    * [gx·w/gw, (gx+1)·w/gw) × [gy·h/gh, (gy+1)·h/gh) (at least one
    * pixel each — requires w ≥ gw, h ≥ gh handled by clamping). */
  def lumaGrid(img: java.awt.image.BufferedImage,
                                 gw: Int, gh: Int): Array[Long] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Long](gw * gh)
    var gy = 0
    while (gy < gh) {
      val y0 = (gy.toLong * h / gh).toInt
      val y1 = math.max(y0 + 1, ((gy + 1).toLong * h / gh).toInt)
      var gx = 0
      while (gx < gw) {
        val x0 = (gx.toLong * w / gw).toInt
        val x1 = math.max(x0 + 1, ((gx + 1).toLong * w / gw).toInt)
        var sum = 0L
        var cnt = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            sum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)
            cnt += 1; x += 1
          }
          y += 1
        }
        out(gy * gw + gx) = if (cnt == 0) 0L else sum / cnt
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** 64-bit difference hash (dHash): 9×8 luma grid, bit (x, y) set iff
    * the cell to the right is strictly brighter — the horizontal
    * gradient signature, robust to global brightness/contrast shifts
    * and (with the integer grid) fully deterministic. */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val g = lumaGrid(img, 9, 8)
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x + 1) > g(y * 9 + x)) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** 64-bit average hash (aHash): 8×8 luma grid, bit set iff the cell
    * is strictly brighter than the (floor) grid mean. */
  def aHash64(img: java.awt.image.BufferedImage): Long = {
    val g = lumaGrid(img, 8, 8)
    val mean = g.sum / 64L
    var h = 0L
    var i = 0
    while (i < 64) { if (g(i) > mean) h |= 1L << i; i += 1 }
    h
  }

  /** Per-image perceptual hashes over the REAL decode path: one row per
    * image-kind payload ImageIO accepts — (media_id, dhash, ahash,
    * width, height). Undecodable rows are dropped (survivor count = the
    * decode-health signal, the audioStats discipline). mapPartitions so
    * a heavier codec would init once per partition. */
  def imageHashes(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.flatMap { r =>
        decodeImage(r.media).map { img =>
          (r.media_id, dHash64(img), aHash64(img), img.getWidth, img.getHeight)
        }
      }
    }.toDF("media_id", "dhash", "ahash", "width", "height")
  }

  /** ONE per-payload 64-bit perceptual fingerprint per modality — the
    * shared kernel of [[imageHashes]] (integer-grid dHash),
    * [[audioFingerprints]] (band-energy sign hash) and [[videoHashes]]
    * (first-decodable-frame dHash across the MJPEG / uncompressed /
    * I_PCM paths), factored as a pure payload function so the
    * streaming intake gate ([[graft.streaming.MediaStreams]]) computes
    * bit-identical hashes to the batch jobs. None when no real decoder
    * accepts the payload (the decode-health drop discipline). */
  def mediaFingerprint(kind: String, bytes: Array[Byte]): Option[Long] =
    kind match {
      case "image" => decodeImage(bytes).map(dHash64)
      case "audio" => audioFingerprint(bytes)
      case "video" =>
        val mj = mjpegFrames(bytes)
        mj.headOption.flatMap(decodeImage).map(dHash64)
          .orElse(rawVideo(bytes).collect {
            case rv if rv.frames.nonEmpty => dHash64(rawFrameImage(rv, rv.frames.head))
          })
      case _ => None
    }

  /** Hamming-blocked candidate pairs over a 64-bit hash column — the
    * pigeonhole blocking of [[graft.pipeline.Dedup.simhashPairs]]
    * lifted to 64 bits: 4 chunks of 16 bits; any pair within hamming
    * ≤ 3 agrees on at least one full chunk (≤ 3 flipped bits cannot
    * touch all 4 chunks), so the equi-join on (chunk, value) is
    * COMPLETE for maxHamming ≤ 3 and never all-pairs. Exact hamming is
    * verified per candidate with one codegen'd bit_count. Ties of
    * identical hashes land in the same bucket — output is bounded by
    * the true near-dup volume, a data property not a plan one.
    *
    * `maxBucket` is the production hot-bucket cap (the winnowPairs
    * maxDf / squareCountCapped discipline): a degenerate media corpus
    * (monochrome thumbnails, silence-only audio → one shared chunk
    * value) makes a (chunk, cv) bucket quadratic; buckets holding more
    * than `maxBucket` ids are excluded from the join (candidate volume
    * ≤ 4·maxBucket·n). A pair is still found if ANY of its ≤ 4 agreeing
    * chunks stays under the cap; pairs agreeing ONLY inside capped
    * buckets are dropped — audit what was skipped with
    * [[hammingHotBuckets]] before trusting a capped run. Default
    * uncapped (exact for maxHamming ≤ 3). */
  def hammingPairs64(hashed: DataFrame, idCol: String, hashCol: String,
                     maxHamming: Int = 3,
                     maxBucket: Long = Long.MaxValue): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "hammingPairs64's 4x16-bit blocking is complete only for maxHamming <= 3")
    require(maxBucket >= 2, "hammingPairs64 needs maxBucket >= 2 (a pair)")
    val h = hashed.select(col(idCol).as("id"), col(hashCol).as("h"))
    val chunks0 = (0 until 4).map { c =>
      h.select(col("id"), lit(c).cast("long").as("chunk"),
        shiftright(col("h"), c * 16).bitwiseAND(lit(0xffffL)).as("cv"),
        col("h"))
    }.reduce(_ unionByName _)
    val chunks =
      if (maxBucket == Long.MaxValue) chunks0
      else {
        // one extra map-side-combined count over the same keys; the
        // sub-cap filter joins back on (chunk, cv) — broadcast-sized
        // under any realistic cap, shuffle-safe when forced
        val ok = chunks0.groupBy("chunk", "cv")
          .agg(count(lit(1)).as("n_ids"))
          .filter(col("n_ids") <= maxBucket)
          .select("chunk", "cv")
        chunks0.join(ok, Seq("chunk", "cv"), "left_semi")
      }
    chunks.select(col("chunk"), col("cv"), col("id").as("a"), col("h").as("fa"))
      .join(chunks.select(col("chunk"), col("cv"), col("id").as("b"),
        col("h").as("fb")), Seq("chunk", "cv"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** The capped-run audit for [[hammingPairs64]]: the (chunk, cv)
    * buckets a cap of `maxBucket` would drop, with their population —
    * the `n_capped_buckets` report squareCountCapped emits for excluded
    * hubs, as a frame (empty ⇒ the capped run was exact). */
  def hammingHotBuckets(hashed: DataFrame, idCol: String, hashCol: String,
                        maxBucket: Long): DataFrame = {
    val h = hashed.select(col(idCol).as("id"), col(hashCol).as("h"))
    (0 until 4).map { c =>
      h.select(col("id"), lit(c).cast("long").as("chunk"),
        shiftright(col("h"), c * 16).bitwiseAND(lit(0xffffL)).as("cv"))
    }.reduce(_ unionByName _)
      .groupBy("chunk", "cv")
      .agg(count(lit(1)).cast("long").as("n_ids"))
      .filter(col("n_ids") > maxBucket)
  }

  /** Perceptual near-duplicate image pairs: [[imageHashes]] dHash →
    * [[hammingPairs64]]. The image twin of SimHash text dedup. */
  def imageDedupPairs(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame =
    hammingPairs64(imageHashes(media), "media_id", "dhash", maxHamming)

  /** Deterministic 16×16 RGB PNG from a 64-bit seed — the near-dup
    * FAMILY generator behind q_image_dedup and the specs: pixel (x, y)
    * gray level is a splitmix-style integer mix of (seed, x·16+y);
    * `variant` inverts that many fixed seed-derived pixels, so
    * variants of one seed are perceptual near-dups (small hamming) and
    * different seeds are unrelated. Encoded through the real ImageIO
    * PNG writer, so consumers exercise the REAL decode path. */
  def syntheticPng(seed: Long, variant: Int): Array[Byte] = {
    def mix(a: Long, b: Long): Long = {
      var z = a ^ (b * 0x9e3779b97f4a7c15L)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < 256) {
      val gray = (mix(seed, p.toLong) & 0xffL).toInt
      img.setRGB(p % 16, p / 16, (gray << 16) | (gray << 8) | gray)
      p += 1
    }
    var v = 0
    while (v < variant) {
      val pos = (math.abs(mix(seed, 1000L + v)) % 256L).toInt
      val old = img.getRGB(pos % 16, pos / 16) & 0xff
      val inv = 255 - old
      img.setRGB(pos % 16, pos / 16, (inv << 16) | (inv << 8) | inv)
      v += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Synthetic near-dup image corpus off a driver table: one REAL PNG
    * payload per row, family = id DIV 4 (4 members), variant = id MOD 3
    * (members 0 and 3 are EXACT dups; 1 and 2 near-dups) — the
    * deterministic stand-in for a crawl's resized/re-encoded image
    * variants, bounded pair volume (≤ 6 per family) by construction. */
  def syntheticImageCorpus(ids: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    // encode/decode is CPU-bound per row: fan out to every core — a
    // small parquet id source is often ONE scan partition, which
    // would serialize the whole synthesis (measured 1.7 effective
    // cores of 32 on the audio twin before this repartition)
    ids.select(col(idCol).cast("long").as("media_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions { it =>
        it.map { id =>
          MediaRow(id, "image", syntheticPng(id / 4L, (id % 3L).toInt))
        }
      }
  }

  // ==== Audio fingerprinting + near-dup detection ====
  // Completes the dedup modality matrix (text ✓, embeddings ✓,
  // images ✓ above): a chromaprint-style band-energy SIGN hash over
  // the real javax.sound.sampled PCM decode — FFT-free, exact
  // integers — then the same 4×16 hamming-blocked pair join.

  /** 64-bit band-energy sign fingerprint of a decoded 16-bit PCM
    * stream: the first channel's |sample| envelope is box-filtered
    * onto a 9 (time) × 8 (sub-band) integer grid — time cell t covers
    * samples [t·N/9, (t+1)·N/9) and band b is the b-th eighth of that
    * cell (consecutive sub-window energy sums: the zero-phase,
    * FFT-free stand-in for spectral bands) — and bit (t, b) is set
    * iff energy(t+1, b) > energy(t, b): the dHash of the energy
    * envelope, invariant to global gain-by-shift and deterministic
    * (integer floor means end to end). None for payloads the JDK
    * can't read or with non-16-bit encoding. The whole PCM buffers in
    * memory (same as [[decodeAudio]]) — per-row bounded, fine for
    * clip-scale payloads; a streaming two-pass would replace this for
    * hour-long masters. */
  def audioFingerprint(bytes: Array[Byte]): Option[Long] =
    // Fast path: parse the RIFF/WAVE PCM16 layout directly — a real
    // WAV parser, pure byte arithmetic, and LOCK-FREE: the JDK
    // AudioSystem provider registry serializes concurrent
    // getAudioInputStream calls (measured ~3 effective cores of 32 on
    // a WAV corpus), which would bottleneck the whole fingerprint
    // stage on exactly the payloads a crawl has most of. AIFF/AU and
    // anything else falls back to the JDK path; both paths feed the
    // identical grid/hash kernel (equality spec-pinned via the
    // same-samples WAV-vs-AIFF fixture).
    wavPcm16(bytes) match {
      case Some((frameSize, off, end)) =>
        val nFrames = (end - off) / frameSize
        if (nFrames < 72) None
        else Some(energySignHash(f => {
          val o = off + f * frameSize
          ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toLong
        }, nFrames))
      case None => try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16) None
          else {
            val frameSize = fmt.getFrameSize
            val bigEndian = fmt.isBigEndian
            val buf = new java.io.ByteArrayOutputStream()
            val chunk = new Array[Byte](8192)
            var n = in.read(chunk)
            while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
            val pcm = buf.toByteArray
            val nFrames = pcm.length / frameSize
            if (nFrames < 72) None // fewer samples than grid cells
            else Some(energySignHash(f => {
              val off = f * frameSize
              val s =
                if (bigEndian) ((pcm(off) << 8) | (pcm(off + 1) & 0xff)).toShort
                else ((pcm(off) & 0xff) | (pcm(off + 1) << 8)).toShort
              s.toLong
            }, nFrames))
          }
        } finally in.close()
      } catch { case _: Exception => None }
    }

  /** Minimal RIFF/WAVE chunk walk for 16-bit PCM mono/stereo
    * little-endian payloads: (frameSize, dataStart, dataEnd). None for
    * anything else — the caller falls back to the JDK decoder. */
  def wavPcm16(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes.length < 44 ||
        new String(bytes, 0, 4, java.nio.charset.StandardCharsets.ISO_8859_1) != "RIFF" ||
        new String(bytes, 8, 4, java.nio.charset.StandardCharsets.ISO_8859_1) != "WAVE")
      return None
    var at = 12
    var frameSize = -1
    var data: Option[(Int, Int)] = None
    while (at + 8 <= bytes.length && (frameSize < 0 || data.isEmpty)) {
      val id = new String(bytes, at, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      val size = le32(bytes, at + 4)
      if (size < 0 || at + 8 + size > bytes.length) return None
      val ds = at + 8; val de = (ds + size).toInt
      if (id == "fmt " && size >= 16) {
        val audioFormat = (bytes(ds) & 0xff) | ((bytes(ds + 1) & 0xff) << 8)
        val channels = (bytes(ds + 2) & 0xff) | ((bytes(ds + 3) & 0xff) << 8)
        val bits = (bytes(ds + 14) & 0xff) | ((bytes(ds + 15) & 0xff) << 8)
        if (audioFormat != 1 || bits != 16 || channels < 1) return None
        frameSize = channels * 2
      } else if (id == "data") data = Some((ds, de))
      at = de + (size & 1L).toInt // chunks are word-aligned
    }
    for ((ds, de) <- data; if frameSize > 0) yield (frameSize, ds, de)
  }

  /** The shared fingerprint kernel: 9 (time) × 8 (sub-band) grid of
    * integer mean |sample| over `sample(frameIdx)`, temporal-gradient
    * sign bits — both decode paths call exactly this. */
  private def energySignHash(sample: Int => Long, nFrames: Int): Long = {
    val grid = new Array[Long](72)
    var t = 0
    while (t < 9) {
      val t0 = (t.toLong * nFrames / 9).toInt
      val t1 = ((t + 1).toLong * nFrames / 9).toInt
      val len = t1 - t0
      var b = 0
      while (b < 8) {
        val s0 = t0 + (b.toLong * len / 8).toInt
        val s1 = t0 + ((b + 1).toLong * len / 8).toInt
        var sum = 0L
        var f = s0
        while (f < s1) { sum += math.abs(sample(f)); f += 1 }
        grid(t * 8 + b) = if (s1 > s0) sum / (s1 - s0) else 0L
        b += 1
      }
      t += 1
    }
    var h = 0L
    var tt = 0
    while (tt < 8) {
      var b = 0
      while (b < 8) {
        if (grid((tt + 1) * 8 + b) > grid(tt * 8 + b))
          h |= 1L << (tt * 8 + b)
        b += 1
      }
      tt += 1
    }
    h
  }

  /** Per-clip audio fingerprints over the REAL decode path: one row
    * per audio-kind payload the JDK reads — (media_id, afp). Rows no
    * reader accepts (or shorter than the 72-cell grid) are dropped —
    * the audioStats decode-health discipline. */
  def audioFingerprints(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.flatMap { r => audioFingerprint(r.media).map(h => (r.media_id, h)) }
    }.toDF("media_id", "afp")
  }

  /** Near-duplicate audio pairs: [[audioFingerprints]] →
    * [[hammingPairs64]] — the audio twin of [[imageDedupPairs]]. */
  def audioDedupPairs(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame =
    hammingPairs64(audioFingerprints(media), "media_id", "afp", maxHamming)

  /** Deterministic mono 16-bit WAV from a 64-bit seed: an integer
    * triangle wave (period and amplitude seed-derived — NO
    * platform-sensitive trig anywhere) of 3600 samples at 8 kHz;
    * `variant` boosts the energy of grid cell (t = variant,
    * b = variant) by 25% (integer s + s/4), flipping at most the two
    * gradient bits that touch that cell — a near-dup by construction.
    * Encoded through the real JDK WAV writer so consumers exercise
    * the REAL decode path. */
  def syntheticWav(seed: Long, variant: Int): Array[Byte] = {
    def mix(a: Long, b: Long): Long = {
      var z = a ^ (b * 0x9e3779b97f4a7c15L)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val n = 3600
    val period = 40 + (math.abs(mix(seed, 1L)) % 64L).toInt * 2
    val amp = 8000 + (math.abs(mix(seed, 2L)) % 8000L).toInt
    val pcm = new Array[Byte](n * 2)
    // the boosted cell's sample range (t = b = variant), matching the
    // fingerprint's integer grid bounds exactly
    val t0 = variant.toLong * n / 9; val t1 = (variant + 1).toLong * n / 9
    val len = t1 - t0
    val b0 = t0 + variant.toLong * len / 8
    val b1 = t0 + (variant + 1).toLong * len / 8
    var i = 0
    while (i < n) {
      val ph = i % period
      val tri = if (ph < period / 2) ph * 4 - period else period * 3 - ph * 4
      // slow seed-derived AM (×12/16..×19/16 per 200-sample block):
      // a FLAT envelope would leave all 72 cell energies near-equal,
      // collapse many seeds onto the same sign hash, and send the
      // blocked join quadratic on that bucket — the modulation keeps
      // fingerprints well-spread across seeds
      val f = 12 + (math.abs(mix(seed, 100L + i / 200)) % 8L).toInt
      var s = tri * amp / period * f / 16
      if (variant > 0 && i >= b0 && i < b1) s += s / 4
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    // canonical 44-byte RIFF/WAVE header written inline: AudioSystem
    // .write goes through the same provider registry whose lock
    // serializes the fingerprint's decode side — the synthesis side
    // must not reintroduce it (JDK readers accept this layout; the
    // WAV-vs-AIFF spec pins decode equivalence)
    val hdr = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdr.put("RIFF".getBytes("ISO-8859-1")).putInt(36 + pcm.length)
      .put("WAVE".getBytes("ISO-8859-1"))
      .put("fmt ".getBytes("ISO-8859-1")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000 * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("ISO-8859-1")).putInt(pcm.length)
    hdr.array() ++ pcm
  }

  // ==== Video fingerprinting + near-dup detection ====
  // Completes the dedup modality matrix (text, embeddings, image,
  // audio above): the standard first-frame perceptual thumbprint —
  // the first decodable frame (MJPEG via ImageIO, or an uncompressed
  // track via the raw byte path) through the SAME integer-grid dHash
  // as still images, then the shared 4×16 hamming-blocked pair join.

  /** Per-video first-frame dHash over the REAL decode paths: one row
    * per video-kind payload with at least one decodable frame —
    * (media_id, vhash, width, height, n_frames). Payloads with no
    * decodable frame (entropy-coded codecs, junk) are dropped — the
    * decode-health discipline of [[audioStats]]. */
  def videoHashes(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { r =>
        val mj = mjpegFrames(r.media)
        val viaMjpeg = mj.headOption.flatMap(decodeImage)
          .map(img => (img, mj.length))
        val first = viaMjpeg.orElse(rawVideo(r.media).collect {
          case rv if rv.frames.nonEmpty =>
            (rawFrameImage(rv, rv.frames.head), rv.frames.length)
        })
        first.map { case (img, n) =>
          (r.media_id, dHash64(img), img.getWidth, img.getHeight, n.toLong)
        }
      }
    }.toDF("media_id", "vhash", "width", "height", "n_frames")
  }

  /** Near-duplicate video pairs: [[videoHashes]] → [[hammingPairs64]]
    * — re-encoded/rescaled copies of the same clip collide on the
    * first-frame thumbprint exactly as re-encoded stills do on dHash. */
  def videoDedupPairs(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame =
    hammingPairs64(videoHashes(media), "media_id", "vhash", maxHamming)

  /** Poster-still corpus: for each id, the FIRST FRAME of its
    * [[syntheticVideoCorpus]] clip re-encoded as a REAL PNG still —
    * the thumbnail-extraction channel [[crossModalDedupPairs]] exists
    * to catch (a clip and its extracted poster are one piece of
    * content in two modalities). `offset` shifts the still ids so the
    * mixed corpus carries both copies under distinct media_ids. */
  def syntheticPosterStills(ids: DataFrame, idCol: String,
                            offset: Long,
                            corpusIn: Option[Dataset[MediaRow]] = None): Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    // corpusIn: a session that already synthesized the clip corpus
    // (build:media_pairs) must not pay the synthesis again
    corpusIn.getOrElse(syntheticVideoCorpus(ids, idCol)).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        // zero-frame guard: the sibling consumers (videoHashes,
        // mediaFingerprint) drop undecodable/empty containers rather
        // than throw — same contract here
        rawVideo(r.media).collect { case rv if rv.frames.nonEmpty =>
          val img = rawFrameImage(rv, rv.frames.head)
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", baos)
          MediaRow(r.media_id + offset, "image", baos.toByteArray)
        }
      }
    }
  }

  /** CROSS-MODALITY near-dup pairs: a video's first-frame thumbprint
    * against the still-image dHashes — the thumbnail-extraction
    * duplicate channel (a clip and its poster/preview still are the
    * SAME content twice; within-modality dedup alone never sees the
    * pair because the two copies live in different kind partitions).
    * The image and video hash kernels share [[dHash64]] over the same
    * integer luma grid, so identical rasters collide exactly. One
    * [[hammingPairs64]] over the kind-tagged union, cross-kind pairs
    * kept. Output (image_id, video_id, hamming).
    *
    * Scale: the union is one narrow decode map per modality; the pair
    * join is the shared pigeonhole blocking — never all-pairs. */
  def crossModalDedupPairs(media: Dataset[MediaRow],
                           maxHamming: Int = 3): DataFrame =
    crossModalPairsFromHashes(
      imageHashes(media).select(col("media_id"), col("dhash").as("h")),
      videoHashes(media).select(col("media_id"), col("vhash").as("h")),
      maxHamming)

  /** [[crossModalDedupPairs]] from PRE-COMPUTED hash frames (media_id,
    * h) — a session that already decoded one side (the memoized video
    * fingerprints behind build:media_pairs) pays only the other side's
    * decode, not both. */
  def crossModalPairsFromHashes(img: DataFrame, vid: DataFrame,
                                maxHamming: Int = 3): DataFrame = {
    // composite id keeps kinds distinct through the shared pair kernel:
    // even ids = images, odd = videos (kind bit in the low bit)
    val all = img.select(col("media_id"), col("h"), lit(0L).as("k"))
      .unionByName(vid.select(col("media_id"), col("h"), lit(1L).as("k")))
      .select((col("media_id") * 2L + col("k")).as("mk"), col("h"))
    hammingPairs64(all, "mk", "h", maxHamming)
      .filter(pmod(col("a"), lit(2L)) =!= pmod(col("b"), lit(2L)))
      .select(
        (when(pmod(col("a"), lit(2L)) === 0L, col("a")).otherwise(col("b"))
          / 2L).cast("long").as("image_id"),
        (when(pmod(col("a"), lit(2L)) === 1L, col("a")).otherwise(col("b"))
          / 2L).cast("long").as("video_id"),
        col("hamming"))
  }

  /** TEMPORAL video signature: dHash of k frames sampled evenly across
    * the clip (slot s reads frame ⌊s·(n−1)/(k−1)⌋) — (media_id,
    * vhashes[k], n_frames). Fixes the first-frame thumbprint's known
    * collision: two different clips sharing a title card agree on
    * frame 0 but nowhere else. Rows with ANY sampled frame undecodable
    * are dropped (the decode-health discipline); only the k sampled
    * frames are decoded, never the whole clip. */
  def videoTemporalHashes(media: Dataset[MediaRow], k: Int = 3): DataFrame = {
    require(k >= 1 && k <= 16, "videoTemporalHashes needs 1 <= k <= 16")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { r =>
        val mj = mjpegFrames(r.media)
        val access: Option[(Int, Int => Option[java.awt.image.BufferedImage])] =
          if (mj.nonEmpty) Some((mj.length, (i: Int) => decodeImage(mj(i))))
          else rawVideo(r.media).filter(_.frames.nonEmpty)
            .map(rv => (rv.frames.length,
              (i: Int) => Some(rawFrameImage(rv, rv.frames(i)))))
        access.flatMap { case (n, dec) =>
          val idxs = (0 until k).map(s =>
            if (k == 1) 0 else math.min(n - 1, s * (n - 1) / (k - 1)))
          val hs = idxs.map(i => dec(i).map(dHash64))
          if (hs.exists(_.isEmpty)) None
          else Some((r.media_id, hs.map(_.get).toArray, n.toLong))
        }
      }
    }.toDF("media_id", "vhashes", "n_frames")
  }

  /** Temporal near-dup video pairs: candidates from the SLOT-0 hash
    * through the shared 4×16 pigeonhole join (complete for the
    * all-slots-within semantics — a pair within maxHamming on EVERY
    * slot is in particular within it on slot 0), verified with the max
    * per-slot hamming over the full signature (one codegen'd
    * zip_with + bit_count). Title-card clips survive candidacy but die
    * at the later slots — exactly the separation the first-frame
    * thumbprint cannot make. `maxBucket` caps hot slot-0 buckets (the
    * [[hammingPairs64]] production knob). */
  def videoTemporalDedupPairs(media: Dataset[MediaRow], k: Int = 3,
                              maxHamming: Int = 3,
                              maxBucket: Long = Long.MaxValue): DataFrame = {
    val h = videoTemporalHashes(media, k)
    val cand = hammingPairs64(
      h.select(col("media_id"), element_at(col("vhashes"), 1).as("h0")),
      "media_id", "h0", maxHamming, maxBucket)
    cand.select("a", "b")
      .join(h.select(col("media_id").as("a"), col("vhashes").as("ha")), Seq("a"))
      .join(h.select(col("media_id").as("b"), col("vhashes").as("hb")), Seq("b"))
      .select(col("a"), col("b"),
        expr("CAST(array_max(zip_with(ha, hb, (x, y) -> bit_count(x ^ y))) AS BIGINT)")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Deterministic 2-frame uncompressed AVI (BI_RGB 24bpp, 16×16) from
    * a 64-bit seed — the video member of the synthetic near-dup family
    * generators: frame pixels are seed-derived grays (splitmix mix, as
    * [[syntheticPng]]), `variant` inverts that many fixed pixels of
    * frame 0. Pure byte assembly — no encoder, no registry locks. */
  def syntheticAvi(seed: Long, variant: Int): Array[Byte] = {
    def mix(a: Long, b: Long): Long = {
      var z = a ^ (b * 0x9e3779b97f4a7c15L)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val grays = (0 until 2).map { fi =>
      val g = new Array[Int](256)
      var p = 0
      while (p < 256) {
        g(p) = (mix(seed, fi.toLong * 256L + p) & 0xffL).toInt
        p += 1
      }
      if (fi == 0) {
        var v = 0
        while (v < variant) {
          val pos = (math.abs(mix(seed, 2000L + v)) % 256L).toInt
          g(pos) = 255 - g(pos)
          v += 1
        }
      }
      g
    }
    aviFromGrayFrames(grays, 16, 16)
  }

  /** Assemble a BI_RGB 24bpp uncompressed AVI from per-frame 8-bit gray
    * rasters (row-major, length w·h each) — the shared byte-assembly
    * behind the synthetic video generators. Pure bytes, no encoder. */
  private[pipeline] def aviFromGrayFrames(grays: Seq[Array[Int]],
                                          w: Int, h: Int): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    def le(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      id.getBytes("ISO-8859-1") ++ le(body.length) ++ body ++ pad
    }
    val frames = grays.map { gr =>
      require(gr.length == w * h, "aviFromGrayFrames: raster size mismatch")
      val f = new Array[Byte](stride * h)
      var p = 0
      while (p < w * h) {
        val g = gr(p)
        val y = p / w; val x = p % w
        val o = y * stride + x * 3
        f(o) = g.toByte; f(o + 1) = g.toByte; f(o + 2) = g.toByte
        p += 1
      }
      chunk("00db", f)
    }
    val strh = chunk("strh", "vids".getBytes("ISO-8859-1") ++ new Array[Byte](52))
    val bih = le(40) ++ le(w) ++ le(h) ++ Array[Byte](1, 0) ++
      Array[Byte](24, 0) ++ le(0) ++ le(stride * h) ++
      le(0) ++ le(0) ++ le(0) ++ le(0)
    val strl = chunk("LIST", "strl".getBytes("ISO-8859-1") ++ strh ++ chunk("strf", bih))
    val hdrl = chunk("LIST", "hdrl".getBytes("ISO-8859-1") ++ strl)
    val movi = chunk("LIST", "movi".getBytes("ISO-8859-1") ++ frames.flatten.toArray)
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ le(body.length) ++ body
  }

  /** Multi-frame seeded AVI: frame i's pixels derive from frameSeeds(i)
    * alone — the fixture generator for temporal-signature tests (two
    * clips sharing only frameSeeds.head are title-card collisions:
    * first-frame-equal, rest-different). */
  def syntheticAviSeeded(frameSeeds: Seq[Long]): Array[Byte] = {
    def mix(a: Long, b: Long): Long = {
      var z = a ^ (b * 0x9e3779b97f4a7c15L)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    aviFromGrayFrames(frameSeeds.map { s =>
      Array.tabulate(256)(p => (mix(s, p.toLong) & 0xffL).toInt)
    }, 16, 16)
  }

  /** Synthetic TEMPORAL near-dup video corpus: family = id DIV 4,
    * member = id MOD 4. All four members share frame 0 (one or two
    * seed-derived pixel inversions apart — a title card); frame 1's
    * seed splits the family into halves {0,1} / {2,3}. First-frame
    * dedup sees one 4-clip family; the temporal signature must keep
    * only the within-half pairs. */
  def syntheticTemporalVideoCorpus(ids: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("media_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions { it =>
        def mix(a: Long, b: Long): Long = {
          var z = a ^ (b * 0x9e3779b97f4a7c15L)
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z ^ (z >>> 31)
        }
        it.map { id =>
          val fam = id / 4L; val m = (id % 4L).toInt
          val s0 = fam * 1000L + 1L
          val s1 = fam * 1000L + 2L + (m / 2).toLong
          val f0 = Array.tabulate(256)(p => (mix(s0, p.toLong) & 0xffL).toInt)
          // m pixel inversions on the shared title card (near-dup, not
          // exact, within the family — mirrors syntheticAvi's variants)
          var v = 0
          while (v < m) {
            val pos = (math.abs(mix(s0, 3000L + v)) % 256L).toInt
            f0(pos) = 255 - f0(pos)
            v += 1
          }
          val f1 = Array.tabulate(256)(p => (mix(s1, p.toLong) & 0xffL).toInt)
          MediaRow(id, "video", aviFromGrayFrames(Seq(f0, f1), 16, 16))
        }
      }
  }

  /** Synthetic near-dup video corpus — the raw-AVI member of the
    * family generators: family = id DIV 4, variant = id MOD 3 (one
    * exact-dup pair per full family, the rest near-dups); same core
    * fan-out as the image/audio twins. */
  def syntheticVideoCorpus(ids: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("media_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions { it =>
        it.map { id =>
          MediaRow(id, "video", syntheticAvi(id / 4L, (id % 3L).toInt))
        }
      }
  }

  // ==== Media dedup clusters + canonical keep ====
  // The media families' completion of the text-dedup contract: pairs →
  // connected-component clusters → min-id representative. Pair lists
  // alone under-specify the keep decision (a transitive dup may never
  // appear as the larger pair member); the cluster algebra below is
  // the same dual-regime CC text dedup rides (Corpus.dedupClusters).

  /** Per-modality near-dup clusters over the media pair graphs: one row
    * per cluster — (modality, rep_id, n_members), rep_id = min member
    * (the canonical keeper). Survivors per modality =
    * n_media − Σ(n_members − 1). Scale: one CC fixpoint per modality
    * over its pair edges (dual-regime: driver-local under the broadcast
    * threshold, pointer-doubling shuffles above it). */
  def mediaClusters(pairsByModality: Seq[(String, DataFrame)],
                    maxIter: Int = 15): DataFrame =
    mediaClustersFromMembership(pairsByModality.map { case (m, p) =>
      m -> Corpus.clusterMembership(p, maxIter)
    })

  /** [[mediaClusters]] from PRE-COMPUTED per-modality membership frames
    * (id, rep_id) — a session that memoizes the CC (it feeds BOTH the
    * cluster report and the flagship's drop set) runs it once. */
  def mediaClustersFromMembership(
      membershipByModality: Seq[(String, DataFrame)]): DataFrame =
    membershipByModality.map { case (modality, ms) =>
      ms.groupBy("rep_id")
        .agg(count(lit(1)).cast("long").as("n_members"))
        .select(lit(modality).as("modality"), col("rep_id").cast("long"),
          col("n_members"))
    }.reduce(_ unionByName _)

  /** The drop set of [[mediaClusters]]: every non-representative member
    * across the given modalities, distinct — the frame
    * trainingMixReport's media gate anti-joins, so the flagship keeps
    * EXACTLY one copy per near-dup family (cluster-canonical, not
    * pair-drop). */
  def mediaClusterDropIds(pairsByModality: Seq[(String, DataFrame)],
                          maxIter: Int = 15): DataFrame =
    mediaClusterDropIdsFromMembership(pairsByModality.map { case (m, p) =>
      m -> Corpus.clusterMembership(p, maxIter)
    })

  /** [[mediaClusterDropIds]] from pre-computed membership frames. */
  def mediaClusterDropIdsFromMembership(
      membershipByModality: Seq[(String, DataFrame)]): DataFrame =
    membershipByModality.map { case (_, ms) =>
      ms.filter(col("id") =!= col("rep_id"))
        .select(col("id").as("doc_id"))
    }.reduce(_ unionByName _).distinct()

  /** Synthetic near-dup audio corpus — the WAV twin of
    * [[syntheticImageCorpus]]: family = id DIV 4, variant = id MOD 3
    * (one exact-dup pair per full family, the rest near-dups). */
  def syntheticAudioCorpus(ids: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    // same core fan-out as syntheticImageCorpus — WAV synthesis +
    // decode is the expensive per-row step
    ids.select(col(idCol).cast("long").as("media_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions { it =>
        it.map { id =>
          MediaRow(id, "audio", syntheticWav(id / 4L, (id % 3L).toInt))
        }
      }
  }
}

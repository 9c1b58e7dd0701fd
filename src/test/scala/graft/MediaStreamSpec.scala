package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal
import graft.pipeline.Multimodal.MediaRow
import graft.streaming.MediaStreams

/** Streaming media intake (MediaStreams): fingerprint = narrow map with
  * batch-identical hash kernels, dedup gate = broadcast index-snapshot
  * probe via the shared 4×16 pigeonhole — stream ≡ batch pinned over
  * MemoryStream, agreement with hammingPairs64 pinned by construction
  * on the same corpus. */
class MediaStreamSpec extends SparkSpec {

  private def ids(n: Int) = {
    val implicits = spark.implicits
    import implicits._
    (0L until n.toLong).toDF("doc_id")
  }

  test("fingerprintStream hashes equal the batch jobs per modality") {
    val img = Multimodal.syntheticImageCorpus(ids(6), "doc_id")
    val aud = Multimodal.syntheticAudioCorpus(ids(6), "doc_id")
    val vid = Multimodal.syntheticVideoCorpus(ids(6), "doc_id")
    val got = MediaStreams.fingerprintStream(img.union(aud).union(vid))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val bi = Multimodal.imageHashes(img).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ba = Multimodal.audioFingerprints(aud).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bv = Multimodal.videoHashes(vid).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bi.nonEmpty && ba.nonEmpty && bv.nonEmpty)
    bi.foreach { case (id, h) => assert(got((id, "image")) == h) }
    ba.foreach { case (id, h) => assert(got((id, "audio")) == h) }
    bv.foreach { case (id, h) => assert(got((id, "video")) == h) }
  }

  test("mediaDedupGate flags near-dups of the indexed corpus, batch and stream agree") {
    // accepted corpus = image families 0..5 (ids 0..23); arriving batch
    // re-sends id 1 (exact family member of indexed id 0-3 variants)
    // and brings a fresh family (ids 100..103 → families 25)
    val corpus = Multimodal.syntheticImageCorpus(ids(24), "doc_id")
    val fps = MediaStreams.fingerprintStream(corpus)
    val index = MediaStreams.mediaIndexSnapshot(fps, "kind", "mhash")
      .localCheckpoint()
    val implicits = spark.implicits
    import implicits._
    val arriving = Multimodal.syntheticImageCorpus(
      Seq(1L, 100L, 101L).toDF("doc_id"), "doc_id")
    val got = MediaStreams.mediaDedupGate(arriving, index)
      .select("media_id", "is_dup").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got(1L)) // identical payload already indexed
    assert(!got(100L) && !got(101L)) // fresh family: no indexed neighbor
    // agreement with the batch pair join: a flagged row must have a
    // hammingPairs64 partner in the indexed corpus and vice versa
    val pairs = Multimodal.hammingPairs64(
        fps.unionByName(MediaStreams.fingerprintStream(arriving)
          .withColumn("media_id", col("media_id") + 1000000L)),
        "media_id", "mhash", 3)
      .filter((col("a") >= 1000000L) =!= (col("b") >= 1000000L))
      .collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1)))
      .filter(_ >= 1000000L).map(_ - 1000000L).toSet
    assert(got.filter(_._2).keySet == pairs)
    // stream run over MemoryStream: identical flags
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[MediaRow]
    val sq = MediaStreams.mediaDedupGate(ms.toDS(), index)
      .select("media_id", "is_dup")
      .writeStream.format("memory").queryName("media_gate_stream").start()
    try {
      ms.addData(arriving.collect().toSeq)
      sq.processAllAvailable()
      val streamed = spark.table("media_gate_stream").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(streamed == got)
    } finally sq.stop()
  }

  test("hot-bucket cap excludes degenerate buckets from the gate") {
    val implicits = spark.implicits
    import implicits._
    // a degenerate index: the same hash 8 times → every band bucket
    // holds 8 ids; cap 4 excludes them all → nothing is flagged
    val hashed = (0L until 8L).map(i => (i, "image", 0x1234abcd5678L))
      .toDF("media_id", "kind", "mhash")
    val capped = MediaStreams.mediaIndexSnapshot(hashed, "kind", "mhash",
      maxBucket = 4)
    val open = MediaStreams.mediaIndexSnapshot(hashed, "kind", "mhash")
    // arriving: an exact copy of the indexed hash — build a MediaRow
    // whose image fingerprint we control is overkill; probe the gate's
    // index math directly through a synthetic image corpus instead
    val arriving = Multimodal.syntheticImageCorpus(Seq(0L).toDF("doc_id"),
      "doc_id")
    val fp = MediaStreams.fingerprintStream(arriving).head.getLong(2)
    val degen = (0L until 8L).map(i => (i, "image", fp))
      .toDF("media_id", "kind", "mhash")
    val cappedIdx = MediaStreams.mediaIndexSnapshot(degen, "kind", "mhash",
      maxBucket = 4)
    val openIdx = MediaStreams.mediaIndexSnapshot(degen, "kind", "mhash")
    assert(!MediaStreams.mediaDedupGate(arriving, cappedIdx)
      .head.getAs[Boolean]("is_dup"))
    assert(MediaStreams.mediaDedupGate(arriving, openIdx)
      .head.getAs[Boolean]("is_dup"))
    // an index row with no surviving bucket still joins (empty map)
    assert(capped.count() <= 1 && open.count() == 1)
  }
}

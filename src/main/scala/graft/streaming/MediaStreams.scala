package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal
import graft.pipeline.Multimodal.MediaRow

/** Streaming MEDIA intake — the incremental form of the batch media
  * dedup family ([[graft.pipeline.Multimodal.imageDedupPairs]] /
  * audioDedupPairs / videoDedupPairs), completing stream ≡ batch for
  * the media modality the way round 12's online monitors did for the
  * trend family. The [[CorpusStreams]] production split applies
  * unchanged: the FINGERPRINT is a narrow per-row map (real decode,
  * constant work per payload, zero stream state), the candidate check
  * probes a BROADCAST INDEX SNAPSHOT of the accepted corpus (built by
  * the nightly compaction job), and new-vs-new duplicates within the
  * stream itself remain the compaction job's duty — exactly how a
  * production ingest keeps its inline path stateless.
  *
  * The index probe is the 4×16-bit pigeonhole of
  * [[Multimodal.hammingPairs64]] re-expressed as a pure projection:
  * the snapshot explodes each indexed hash into its 4 band buckets,
  * caps hot buckets (the same maxBucket discipline — a degenerate
  * bucket is excluded, audited offline via hammingHotBuckets), and
  * folds the buckets into ONE map row that broadcasts as a
  * stream-static join; an arriving row looks up its 4 band values and
  * verifies candidates with a codegen'd xor bit_count. Complete for
  * hamming ≤ 3 by the pigeonhole argument, zero state, no shuffle of
  * the stream side.
  */
object MediaStreams {

  /** Per-payload media fingerprints as a streaming-safe narrow map:
    * (media_id, kind, mhash), real-decode only — payloads no decoder
    * accepts are dropped (the decode-health discipline). Hash kernels
    * are bit-identical to the batch jobs via
    * [[Multimodal.mediaFingerprint]]. */
  def fingerprintStream(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        Multimodal.mediaFingerprint(r.kind, r.media)
          .map(h => (r.media_id, r.kind, h))
      }
    }.toDF("media_id", "kind", "mhash")
  }

  /** The broadcastable index snapshot over the accepted corpus's
    * fingerprints (any frame with a 64-bit hash column): ONE row per
    * kind with a map band-key → hash bucket. Band key = chunk·2¹⁶ +
    * 16-bit chunk value (the hammingPairs64 blocking); buckets larger
    * than `maxBucket` are EXCLUDED (hot-bucket cap — candidate work
    * per arriving row is bounded by 4·maxBucket on ANY corpus; audit
    * exclusions with [[Multimodal.hammingHotBuckets]]). The snapshot
    * must fit the executors — the serving-index contract every ANN /
    * dedup index shares; 4 map entries per indexed item. */
  def mediaIndexSnapshot(hashed: DataFrame, kindCol: String,
                         hashCol: String,
                         maxBucket: Long = 1024L): DataFrame = {
    require(maxBucket >= 1, "mediaIndexSnapshot needs maxBucket >= 1")
    val h = hashed.select(col(kindCol).as("kind"), col(hashCol).as("h"))
    val bands = (0 until 4).map { c =>
      h.select(col("kind"),
        (lit(c.toLong * 65536L) +
          shiftright(col("h"), c * 16).bitwiseAND(lit(0xffffL))).as("bk"),
        col("h"))
    }.reduce(_ unionByName _)
    bands.groupBy("kind", "bk")
      .agg(collect_list("h").as("hs"), count(lit(1)).as("n"))
      .filter(col("n") <= maxBucket)
      .groupBy("kind")
      .agg(map_from_entries(collect_list(struct(col("bk"), col("hs"))))
        .as("_bands"))
  }

  /** The ingest-time media dedup gate: fingerprint (narrow map) +
    * near-dup check against the broadcast `index` snapshot
    * ([[mediaIndexSnapshot]]). Adds `is_dup`: true iff some indexed
    * hash of the SAME kind is within `maxHamming` (≤ 3 — the blocking
    * completeness bound). ZERO stream state: a stream-static
    * broadcast equi-join on `kind` + a pure probe expression (4 map
    * lookups + an `exists` bit_count scan of ≤ 4·maxBucket
    * candidates). Works identically on batch frames — stream ≡ batch
    * is spec-pinned, and the flag agrees with hammingPairs64 between
    * the stream row and the indexed corpus by the shared blocking. */
  def mediaDedupGate(media: Dataset[MediaRow], index: DataFrame,
                     maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "mediaDedupGate's pigeonhole check is complete only for maxHamming <= 3")
    val probe = (0 until 4).map { c =>
      exists(
        coalesce(
          element_at(col("_bands"),
            lit(c.toLong * 65536L) +
              shiftright(col("mhash"), c * 16).bitwiseAND(lit(0xffffL))),
          array().cast("array<long>")),
        h2 => bit_count(col("mhash").bitwiseXOR(h2)) <= maxHamming)
    }.reduce(_ || _)
    fingerprintStream(media)
      .join(broadcast(index), Seq("kind"), "left_outer")
      .withColumn("is_dup", coalesce(probe, lit(false)))
      .drop("_bands")
  }
}

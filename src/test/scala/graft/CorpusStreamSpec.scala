package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.CorpusStreams

/** Streaming corpus intake semantics: quality/lang gate as a narrow
  * projection, exact-dup guard across micro-batches, stream ≡ batch
  * twin on ordered arrivals. */
class CorpusStreamSpec extends SparkSpec {

  private val goodText = "the cat is on the mat and a dog is here"

  private def mkDocs(rows: (Long, String, String)*) = {
    val implicits = spark.implicits
    import implicits._
    rows.toSeq.toDF("doc_id", "text", "lang")
      .withColumn("ingest_ts", timestamp_micros(lit(1000000L)))
  }

  test("quality gate keeps lang-matched quality docs only") {
    val d = mkDocs(
      (1L, goodText, "en"),
      (2L, goodText, "de"), // guess=en ≠ labeled de
      (3L, "x", "en"))      // quality 0.304 < 0.5
    val kept = CorpusStreams.cleanBatch(d, 0.5).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("streaming clean dedups across micro-batches, first arrival wins") {
    val implicits = spark.implicits
    import implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, String)]
    val docs = ms.toDF().toDF("doc_id", "text", "lang")
      .withColumn("ingest_ts", timestamp_micros(lit(1000000L)))
    val q = CorpusStreams.cleanStream(docs, 0.5, "1 hour")
      .writeStream.format("memory").queryName("corpus_clean_stream").start()
    try {
      ms.addData((1L, goodText, "en"), (3L, "x", "en"))
      q.processAllAvailable()
      ms.addData((2L, goodText, "en")) // exact dup of doc 1, later batch
      q.processAllAvailable()
      val streamed = spark.table("corpus_clean_stream").collect()
        .map(_.getLong(0)).toSet
      assert(streamed == Set(1L)) // dup dropped, low-quality dropped
      // batch twin on the full input agrees (min doc_id keep)
      val batch = CorpusStreams.cleanBatch(
        mkDocs((1L, goodText, "en"), (3L, "x", "en"), (2L, goodText, "en")), 0.5)
        .collect().map(_.getLong(0)).toSet
      assert(batch == streamed)
    } finally q.stop()
  }
}

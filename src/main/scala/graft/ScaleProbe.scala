package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Corpus, Dedup, TextOps}
import graft.algorithms.Community

/** Scale probe: runs the heaviest pipeline kernels on a corpus
  * replicated K× (deterministically mutated per replica so the
  * replicas are not trivial duplicates of each other) and prints one
  * JSON line of wall-times. The point is the SHAPE of the scaling
  * curve — a kernel whose time grows superlinearly in K has a plan
  * that would not survive a 100× cluster-scale corpus.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_K=4 \
  *     sbt "runMain graft.ScaleProbe"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE_K", "4").toInt
    val dir = sys.env("SPARK_GRAFT_SF_DIR")
    // Optional regime override: SPARK_GRAFT_BROADCAST_THRESHOLD=0 forces
    // every dual-regime kernel onto its shuffle (cluster-scale) branch,
    // so the probe can time the code path a 100× run actually executes.
    val bThresh = sys.env.get("SPARK_GRAFT_BROADCAST_THRESHOLD")
    bThresh.foreach(v => sys.props("graft.broadcast.threshold") = v)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$dir/documents.parquet")
    val n = base.count()
    // K deterministic replicas: offset ids, salt the text tail so
    // replicas aren't exact dups (the minhash/banding load stays real)
    def corpusTimes(rep: Int): Map[String, Double] = {
      val docs = (0 until rep).map { r =>
        base.select(
          (col("doc_id") + lit(r.toLong * n)).as("doc_id"),
          concat(col("text"), lit(s" replica_salt_$r")).as("text"),
          col("lang"))
      }.reduce(_ unionByName _).localCheckpoint()
      def time(name: String)(df: => DataFrame): (String, Double) = {
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.foreach(_ => ())
        name -> (System.nanoTime() - t0) / 1e9
      }
      Map(
        time("minhash_pairs")(Dedup.minhashPairs(docs)),
        time("dedup_clusters")(Corpus.dedupClusters(Dedup.minhashPairs(docs))),
        time("decontam")(Corpus.decontaminate(docs)),
        time("fingerprint")(TextOps.fingerprint(docs)),
        time("lm_score")(Corpus.lmScore(docs)),
        // cross-replica repeated segments hit df·K and all drop — the
        // reassembly aggregation still sees each segment exactly once
        time("segment_dedup")(Corpus.segmentDedup(docs)),
        // replicas share almost all fingerprints → heavy hot-key load
        // on the pair join; the maxDf cap is what keeps it bounded
        time("winnow_pairs")(TextOps.winnowPairs(docs)),
        // candidate union of two generators with different growth laws:
        // the minhash side is output-bound (true near-dup pairs grow
        // ~K² under replication), the winnow side stays flat (maxDf
        // drops replica-shared fingerprints) — the probe shows the
        // union rides the minhash curve, not worse
        time("containment")(Dedup.containment(docs)))
    }

    val t1 = corpusTimes(1)
    val tk = corpusTimes(k)
    val ratios = t1.keys.map(q => q -> BigDecimal(tk(q) / t1(q))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    println(
      s"""{"probe":"scale","k":$k,"base_docs":$n,"broadcast_threshold":"${bThresh.getOrElse("default")}",""" +
        s""""t1":{${t1.map { case (q, t) => s""""$q":${BigDecimal(t).setScale(2, BigDecimal.RoundingMode.HALF_UP)}""" }.mkString(",")}},""" +
        s""""tk":{${tk.map { case (q, t) => s""""$q":${BigDecimal(t).setScale(2, BigDecimal.RoundingMode.HALF_UP)}""" }.mkString(",")}},""" +
        s""""ratio":{${ratios.map { case (q, r) => s""""$q":$r""" }.mkString(",")}}}""")
    spark.stop()
  }
}

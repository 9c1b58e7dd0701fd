package graft.algorithms

/** Shared regime knobs for the iterative kernels.
  *
  * Every dual-regime kernel (connected components, SCC, PageRank,
  * k-core, core numbers, triangle counts, Louvain, Brandes betweenness,
  * BFS, Bellman-Ford, A*, all-shortest-paths, IVF) gates "replay the
  * round semantics on the driver over a packed collect / broadcast the
  * |V|-bounded side" vs "shuffle join" on the same row-count threshold.
  * The default (4M rows ≈ tens of MB) is safely inside a driver/executor
  * heap; a 100 TB run crosses it and takes the shuffle branch. The
  * threshold is a system property so tests can force the shuffle regime
  * on small data (`-Dgraft.broadcast.threshold=0`, or the
  * `SPARK_GRAFT_BROADCAST_THRESHOLD` env bridge in Verify/Bench/
  * ScaleProbe) — the code path a large cluster actually runs must be
  * exercisable, oracle-checkable, and timeable without a large cluster.
  */
object Tuning {
  // Log-noise note: the value-domain window kernels (deciles, pooled
  // rank cumulatives — every PlanSpec-whitelisted unpartitioned
  // window) emit Spark's "WindowExec: No Partition Defined" warning
  // by design; the frames are value/time-domain bounded, not
  // corpus-sized (the whitelist documents each bound). Silence it in
  // bench/verify logs with
  //   log4j.logger.org.apache.spark.sql.execution.window=ERROR
  // rather than per-call suppression — the warning stays useful for
  // NEW windows that haven't passed review.
  val DefaultBroadcastThreshold = 4000000L

  def broadcastThreshold: Long =
    sys.props.get("graft.broadcast.threshold").map(_.toLong)
      .getOrElse(DefaultBroadcastThreshold)

  /** Run `body` with the broadcast gate forced to `n` rows (test/probe
    * helper; restores the previous setting on exit). */
  def withBroadcastThreshold[A](n: Long)(body: => A): A = {
    val prev = sys.props.get("graft.broadcast.threshold")
    sys.props("graft.broadcast.threshold") = n.toString
    try body
    finally prev match {
      case Some(v) => sys.props("graft.broadcast.threshold") = v
      case None    => sys.props -= "graft.broadcast.threshold"
    }
  }
}

package graft.algorithms

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Checkpoint-fused convergence probes for iterative kernels.
  *
  * Every DataFrame fixpoint here needs two things per round: materialize
  * the new state (`localCheckpoint`, an eager job) and read a scalar
  * summary of it — a count, or a monotone label sum — to decide
  * convergence. Running the probe as its own aggregation job doubles the
  * per-round job count, and on a real cluster each extra job is a full
  * driver/scheduler round trip. `Dataset.observe` (CollectMetrics)
  * piggybacks the aggregates onto the checkpoint job itself, so each
  * round schedules exactly one job and the probe values ride back on its
  * accumulators.
  */
object Probe {

  /** `df.localCheckpoint()` while computing the named aggregate columns
    * in the same job. Returns the checkpointed frame plus the observed
    * metric row as a name → value map (aggregates over an empty frame
    * follow SQL semantics: `count` is 0, `sum` is null). */
  def checkpointObserved(df: DataFrame, first: Column, rest: Column*):
      (DataFrame, Map[String, Any]) = {
    val obs = Observation()
    val out = df.observe(obs, first, rest: _*).localCheckpoint()
    (out, obs.get)
  }
}

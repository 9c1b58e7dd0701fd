package graft

import org.apache.spark.sql.functions._
import graft.algorithms.Probe

class ProbeSpec extends SparkSpec {

  test("checkpointObserved returns the frame and the metrics of one job") {
    val implicits = spark.implicits
    import implicits._
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
    val (out, m) = Probe.checkpointObserved(df,
      count(lit(1)).as("n"), sum(col("v").cast("decimal(38,0)")).as("s"))
    assert(out.count() === 3L)
    assert(m("n") === 3L)
    assert(m("s").asInstanceOf[java.math.BigDecimal].longValueExact() === 60L)
    // the checkpointed frame is live and re-usable downstream
    assert(out.agg(sum("id")).head.getLong(0) === 6L)
  }

  test("checkpointObserved on an empty frame: count 0, sum null") {
    val implicits = spark.implicits
    import implicits._
    val df = Seq.empty[(Long, Long)].toDF("id", "v")
    val (out, m) = Probe.checkpointObserved(df,
      count(lit(1)).as("n"), sum(col("v").cast("decimal(38,0)")).as("s"))
    assert(out.count() === 0L)
    assert(m("n") === 0L)
    assert(m("s") === null)
  }
}

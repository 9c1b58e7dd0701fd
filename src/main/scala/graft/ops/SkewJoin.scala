package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions — the standard remedy
  * when one hot key (the null-ish customer, the default part, the
  * empty-string token) lands an entire join's worth of rows on one
  * reducer while 999 executors idle. AQE's skew-join split handles
  * many cases at runtime; the explicit salt is the deterministic,
  * plan-visible form — and the ONLY form available when the skewed
  * side feeds a groupBy on the same key (AQE cannot split an exchange
  * an aggregation requires to be hash-partitioned).
  */
object SkewJoin {

  /** Inner equi-join `big(bigKey) = dim(dimKey)` with the big side
    * salted into `salts` sub-keys and the dim side replicated `salts`×
    * so every salted row still finds its match. The hot key's rows
    * spread over `salts` reducers instead of one straggler; the result
    * is row-for-row the plain inner join (spec-pinned). The salt is a
    * deterministic hash of the big row's content — reproducible across
    * runs and repartitioning, no RNG state.
    *
    * Cost model: dim side grows `salts`× (keep it the DIM side); use
    * where the skew is known and the dim is small — exactly the shape
    * AQE cannot rescue. */
  def salted(big: DataFrame, dim: DataFrame, bigKey: String,
             dimKey: String, salts: Int): DataFrame = {
    require(salts >= 1, "salted join needs salts >= 1")
    val b = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts.toLong)))
    val d = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    b.join(d, b("_salt") === d("_salt") && col(bigKey) === col(dimKey))
      .drop("_salt", dimKey)
  }
}

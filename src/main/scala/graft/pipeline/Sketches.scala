package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitters sketch as a typed Catalyst [[Aggregator]]
  * — the bounded-state frequent-items summary a 100 TB term stream
  * needs when the exact term table itself is too wide to shuffle.
  * State is at most `k` (term, count) slots per partial aggregate and
  * the merge is associative/commutative (sum the slot maps, then
  * subtract the (k+1)-th largest count from everything and drop the
  * non-positives), so Spark runs it map-side-combined like any built-in
  * aggregate. Standard MG guarantee after processing N items:
  * true(t) − N/(k+1) ≤ estimate(t) ≤ true(t), and any t with
  * true(t) > N/(k+1) is guaranteed to survive in the sketch.
  *
  * With k ≥ |distinct terms| no eviction ever fires and the sketch is
  * EXACT (and therefore deterministic under Spark's nondeterministic
  * partial-aggregation order) — that regime is what the DuckDB oracle
  * checks; the eviction regime's error bound is pinned by spec.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, "sketch capacity must be >= 1")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(s: Map[String, Long], t: String): Map[String, Long] =
    s.get(t) match {
      case Some(c)            => s.updated(t, c + 1L)
      case None if s.size < k => s.updated(t, 1L)
      // full and unseen: the classic all-slots decrement (the new item
      // cancels against one unit of every resident)
      case None => s.flatMap { case (x, c) =>
        if (c > 1L) Some(x -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(x => x -> (a.getOrElse(x, 0L) + b.getOrElse(x, 0L))).toMap
    if (sum.size <= k) sum
    else {
      // shrink back to ≤ k slots: subtracting the (k+1)-th largest
      // count from every slot zeroes at least |sum|-k of them while
      // adding ≤ that much undercount — the mergeable-MG bound
      val d = sum.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
      sum.flatMap { case (x, c) => if (c - d > 0L) Some(x -> (c - d)) else None }
    }
  }

  override def finish(s: Map[String, Long]): Map[String, Long] = s
  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object Sketches {

  /** Per-window heavy hitters: the [[MisraGries]] sketch registered
    * through `functions.udaf` so it composes into an UNTYPED windowed
    * groupBy like any built-in aggregate — per hour, the top `topN`
    * event types by sketch estimate. Capacity ≥ the per-window
    * alphabet ⇒ exact (the oracle regime); at true scale the same
    * plan carries the bounded-state sketch instead of a full
    * (window × term) table. */
  def windowHeavyHitters(events: DataFrame, k: Int = 16, topN: Int = 3): DataFrame = {
    val mg = udaf(new MisraGries(k), org.apache.spark.sql.Encoders.STRING)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("wstart").orderBy(col("est").desc, col("term").asc)
    events
      .groupBy(window(col("ts"), "1 hour"))
      .agg(mg(col("event_type")).as("m"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        explode(col("m")).as(Seq("term", "est")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topN)
      .select(col("wstart"), col("term"), col("est").cast("long").as("est"),
        col("rn").cast("long").as("rn"))
  }

  /** Heavy-hitter terms of the corpus via [[MisraGries]]: the top
    * `topN` surviving slots by (estimate desc, term asc). One narrow
    * explode + one bounded-state aggregation — the term table never
    * materializes. Capacity ≥ the true vocabulary ⇒ exact counts
    * (the oracle regime; a spec pins today's testdata under the
    * default capacities so regenerated data can't silently flip the
    * oracle into the order-dependent eviction regime). Tokenization is
    * [[Corpus.terms]] — the single definition shared with vocabTopK. */
  def heavyHitters(docs: DataFrame, k: Int = 64, topN: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = Corpus.terms(docs).as[String]
    terms.select(new MisraGries(k).toColumn).toDF("m")
      .select(explode(col("m")).as(Seq("term", "est")))
      .select(col("term"), col("est").cast("long").as("est"))
      .orderBy(col("est").desc, col("term").asc)
      .limit(topN)
  }
}

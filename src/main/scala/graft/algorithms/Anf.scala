package graft.algorithms

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Element-wise max over fixed-width register arrays — the HyperANF
  * merge. Buffer is one mutable m-int array (in-place max, no per-row
  * allocation); partial aggregation runs map-side, so a node's incoming
  * neighbor registers combine before the shuffle. */
final class RegMax(m: Int) extends Aggregator[Seq[Int], Array[Int], Seq[Int]] {
  override def zero: Array[Int] = new Array[Int](m)
  override def reduce(b: Array[Int], a: Seq[Int]): Array[Int] = {
    var i = 0
    while (i < m) { val x = a(i); if (x > b(i)) b(i) = x; i += 1 }
    b
  }
  override def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
    x
  }
  override def finish(s: Array[Int]): Seq[Int] = s.toSeq
  override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder()
}

/** HyperANF (Boldi, Rosa & Vigna, "HyperANF: approximating the
  * neighbourhood function of very large graphs on a budget", WWW 2011):
  * the approximate neighborhood function N(r) = Σ_v |B(v, r)| — how
  * many ordered node pairs are within distance r — estimated with one
  * HyperLogLog register VECTOR per node, element-wise-max-merged over
  * neighbors each round. N(r) is the scale diagnostic behind average
  * distance and effective diameter; the exact computation carries |V|²
  * reachable pairs, which is precisely what cannot exist at 100 TB.
  *
  * Scale: state is |V| rows of m = 2^p ints; each round shuffles
  * |E| + |V| array rows into ONE map-side-combined [[RegMax]]
  * aggregate — the paper's layout (register vectors, not register
  * rows; the long format was measured 10× slower at sf0.1 because the
  * message volume multiplied by m). The registers use the shared
  * 60-bit hash and the exact estimator arithmetic of
  * [[graft.pipeline.Sketches.hllSlot]]/`hllEstimate` (integer harmonic
  * sum, linear-counting small-range branch), so the DuckDB oracle
  * replays every estimate bit for bit, collisions and bias included.
  */
object Anf {

  /** Per-round neighborhood function estimates: (r, nf) for
    * r = 0..rounds, nf = Σ_v round(est(B̂(v, r)), 4) rounded to 2 dp.
    * `symEdges` must carry both directions of every undirected edge. */
  def neighborhoodFunction(nodes: DataFrame, symEdges: DataFrame,
                           rounds: Int = 3, p: Int = 4): DataFrame = {
    require(rounds >= 0, "anf needs rounds >= 0")
    require(p >= 4 && p <= 16, "anf precision must be in [4, 16]")
    val m = 1 << p; val maxRho = 61 - p
    val h = graft.pipeline.TextOps.hash60(col("id").cast("string"), "anf:")
    val wrest = shiftright(h, p)
    val bucket = pmod(h, lit(m.toLong)).cast("int")
    val rho = when(wrest === 0L, lit(maxRho))
      .otherwise(lit(maxRho) - length(bin(wrest)).cast("int"))
    // ball(v, 0) = {v}: a register vector with one hit
    val (regs0, mN) = Probe.checkpointObserved(
      nodes.select(col("id"),
        transform(sequence(lit(0), lit(m - 1)),
          i => when(i === bucket, rho).otherwise(lit(0))).as("sk")),
      count(lit(1)).as("n"))
    var regs = regs0
    // While the |V|-row register frame fits the gate it broadcasts into
    // the per-round edge join (m·|V| ints — the edge frame streams in
    // place); past it the join shuffles, same dual-regime discipline as
    // every iterative kernel. Register VALUES are identical either way.
    val small = mN("n").asInstanceOf[Long] <= Tuning.broadcastThreshold
    val merge = udaf(new RegMax(m), ExpressionEncoder[Seq[Int]]())
    val (edges, _) = Probe.checkpointObserved(
      symEdges.select("src", "dst"), count(lit(1)).as("n"))
    var out = estimate(regs, 0, p)
    for (r <- 1 to rounds) {
      // B(v, r) = B(v, r−1) ∪ ⋃_{(u,v)∈E} B(u, r−1)
      val msg = edges.join(if (small) broadcast(regs) else regs,
          col("src") === col("id"))
        .select(col("dst").as("id"), col("sk"))
      regs = regs.unionByName(msg)
        .groupBy("id").agg(merge(col("sk")).as("sk"))
        .localCheckpoint()
      out = out.unionByName(estimate(regs, r, p))
    }
    out
  }

  /** Σ_v of the per-node [[graft.pipeline.Sketches.hllEstimate]] — the
    * identical formula (and op order) the hllSql-style oracle replays. */
  private def estimate(regs: DataFrame, r: Int, p: Int): DataFrame =
    regs
      .select(graft.pipeline.Sketches.hllEstimate(col("sk"), p).as("est"))
      .agg(round(sum("est"), 2).as("nf"))
      .select(lit(r.toLong).as("r"), col("nf"))
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries partial state: `k` parallel (term, count) slots. A slot
  * with count ≤ 0 is free (its term is stale); occupied slots always
  * carry count ≥ 1. Arrays (not a Map) so the per-row reduce mutates
  * in place — the immutable-Map version allocated a rebuilt map per
  * input row, which a 100 TB term stream turns into GC pressure.
  * Only the two arrays are encoded; the term→slot hash index is
  * @transient and rebuilt lazily after each deserialization, giving
  * the O(1) hit path without widening the serialized state. */
final case class MGBuf(terms: Array[String], counts: Array[Long]) {
  @transient private lazy val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](terms.length * 2)
    var i = 0
    while (i < terms.length) {
      if (counts(i) > 0L) m.put(terms(i), i)
      i += 1
    }
    m
  }

  /** Slot of an OCCUPIED term, -1 if absent. */
  def slotOf(t: String): Int = {
    val v = index.get(t)
    if (v eq null) -1 else v.intValue()
  }

  /** First free slot, -1 when all k are occupied. O(k), but reached
    * only on unseen-term arrivals — the hit path never scans. */
  def freeSlot(): Int = {
    var i = 0
    while (i < counts.length) { if (counts(i) <= 0L) return i; i += 1 }
    -1
  }

  def occupy(i: Int, t: String): Unit = {
    terms(i) = t; counts(i) = 1L; index.put(t, i)
  }

  /** The classic MG all-slots decrement; slots reaching 0 leave the
    * index and become free in place. */
  def decrementAll(): Unit = {
    var i = 0
    while (i < counts.length) {
      if (counts(i) > 0L) {
        counts(i) -= 1L
        if (counts(i) == 0L) index.remove(terms(i))
      }
      i += 1
    }
  }
}

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
  *
  * The per-row reduce mutates the slot arrays in place and returns the
  * same buffer (the [[Aggregator.reduce]] contract explicitly allows
  * this): a seen term or a free slot costs one O(k) scan and zero
  * allocation, and the eviction branch is k in-place decrements —
  * replacing the earlier immutable-Map state whose eviction path
  * rebuilt the whole map per unseen item. */
class MisraGries(k: Int) extends Aggregator[String, MGBuf, Map[String, Long]] {
  require(k >= 1, "sketch capacity must be >= 1")

  override def zero: MGBuf = MGBuf(new Array[String](k), new Array[Long](k))

  override def reduce(b: MGBuf, t: String): MGBuf = {
    val i = b.slotOf(t)
    if (i >= 0) b.counts(i) += 1L // hit: one hash probe, zero allocation
    else {
      val free = b.freeSlot()
      if (free >= 0) b.occupy(free, t)
      // full and unseen: the classic all-slots decrement (the new item
      // cancels against one unit of every resident)
      else b.decrementAll()
    }
    b
  }

  override def merge(a: MGBuf, b: MGBuf): MGBuf = {
    // merge is once per partial-aggregate pair, not per row — a scratch
    // map here is fine; only the per-row reduce must be allocation-free
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    def add(buf: MGBuf): Unit = {
      var i = 0
      while (i < k) {
        if (buf.counts(i) > 0L)
          m.update(buf.terms(i), m.getOrElse(buf.terms(i), 0L) + buf.counts(i))
        i += 1
      }
    }
    add(a); add(b)
    // shrink back to ≤ k slots: subtracting the (k+1)-th largest count
    // from every slot zeroes at least |m|-k of them while adding ≤ that
    // much undercount — the mergeable-MG bound
    val d = if (m.size <= k) 0L
            else m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
    val out = zero
    var i = 0
    m.foreach { case (t, c) =>
      if (c - d > 0L) { out.terms(i) = t; out.counts(i) = c - d; i += 1 }
    }
    out
  }

  override def finish(s: MGBuf): Map[String, Long] =
    (0 until k).iterator.filter(s.counts(_) > 0L)
      .map(i => s.terms(i) -> s.counts(i)).toMap

  override def bufferEncoder: Encoder[MGBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

/** KMV (k-minimum-values) partial state: the `k` smallest DISTINCT
  * 60-bit hashes seen so far, sorted ascending in a fixed-capacity
  * array padded with `Long.MaxValue` sentinels (every real
  * `graft_hash60` value is < 2^60, so the sentinel can never collide
  * with data). Fixed array + in-place memmove for the same reason as
  * [[MGBuf]]: the per-row reduce must not allocate. */
final case class KMVBuf(hashes: Array[Long]) {
  def occupied: Int = {
    var n = 0
    while (n < hashes.length && hashes(n) != Long.MaxValue) n += 1
    n
  }
}

/** KMV distinct-count sketch as a typed Catalyst [[Aggregator]] — the
  * bounded-state COUNT(DISTINCT) a 100 TB corpus needs when the exact
  * distinct set is too wide to shuffle (exact distinct aggregation
  * shuffles every distinct value; the sketch shuffles ≤ k longs per
  * partial). Bar-Yossef et al. 2002: keep the k smallest hash values;
  * if fewer than k distinct hashes exist the count is EXACT, else
  * estimate (k−1)·2^60 / h_(k) with relative error ~1/√(k−2).
  *
  * Unlike Misra–Gries eviction, the k-min set — and therefore the
  * estimate — is ORDER-INDEPENDENT: the same inputs give the same
  * answer under any partial-aggregation schedule, in both regimes.
  * The DuckDB oracle still checks the exact regime (k ≥ distinct
  * inputs, where the answer equals COUNT(DISTINCT) with no hash
  * formula to mirror); the estimation regime's error bound is pinned
  * by spec.
  *
  * Input is the PRE-HASHED long (`TextOps.hash60` stays a codegen'd
  * Column in the plan); the reduce is one binary search plus, on the
  * rare shrinking-frequency insert, one in-place memmove — zero
  * allocation per row. */
class KMV(k: Int) extends Aggregator[Long, KMVBuf, Long] {
  require(k >= 2, "KMV needs capacity >= 2 (the estimator divides by k-1)")

  override def zero: KMVBuf =
    KMVBuf(Array.fill(k)(Long.MaxValue))

  override def reduce(b: KMVBuf, h: Long): KMVBuf = {
    val i = java.util.Arrays.binarySearch(b.hashes, h)
    if (i < 0) {
      val ins = -i - 1
      // ins == k ⇔ h exceeds the current k-th minimum: not a k-min
      // value, drop it. Otherwise shift the tail right (discarding
      // either a sentinel or the largest resident) and place h.
      if (ins < k) {
        System.arraycopy(b.hashes, ins, b.hashes, ins + 1, k - ins - 1)
        b.hashes(ins) = h
      }
    }
    b
  }

  override def merge(a: KMVBuf, b: KMVBuf): KMVBuf = {
    // two-pointer sorted merge keeping the k smallest distinct values;
    // once per partial pair, so the fresh buffer is fine
    val out = zero
    var ia = 0; var ib = 0; var io = 0
    while (io < k && (ia < k || ib < k)) {
      val ha = if (ia < k) a.hashes(ia) else Long.MaxValue
      val hb = if (ib < k) b.hashes(ib) else Long.MaxValue
      val h = math.min(ha, hb)
      if (h == Long.MaxValue) return out
      if (ha == h) ia += 1
      if (hb == h) ib += 1
      out.hashes(io) = h
      io += 1
    }
    out
  }

  override def finish(s: KMVBuf): Long = {
    val n = s.occupied
    if (n < k) n.toLong // saw < k distinct hashes: the count IS n
    else ((k - 1).toDouble * KMV.TwoPow60 / s.hashes(k - 1)).round
  }

  override def bufferEncoder: Encoder[KMVBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}

object KMV {
  /** `graft_hash60` is uniform on [0, 2^60): the estimator's hash-space
    * normalization constant. */
  val TwoPow60: Double = math.pow(2.0, 60)
}

/** Streaming-histogram partial state: ≤ k (value, count) centroids,
  * sorted by value in the first `n` slots of fixed-capacity arrays.
  * Occupancy is the EXPLICIT counter `n` — not a padding sentinel, so
  * any finite double (including `Double.MaxValue`) is a legal centroid
  * value. Same fixed-array in-place discipline as [[MGBuf]]/[[KMVBuf]].
  *
  * STREAMING-STATE SCHEMA (v2, see [[Sketches.StateSchemaVersion]]):
  * this case class IS the state-store row layout for
  * [[Sketches.windowQuantilesStream]] — adding the explicit `n` field
  * (v1 used sentinel padding) changed the encoded schema, so a
  * checkpoint written by the 2-field v1 buffer cannot be restored by
  * this build; such streams must restart from a fresh checkpoint. */
final case class SHBuf(vals: Array[Double], cnts: Array[Long], var n: Int) {
  def occupied: Int = n

  /** Merge the closest adjacent centroid pair (weighted mean, summed
    * count), freeing one slot. Ben-Haim & Yom-Tov's update step.
    * Only callable with ≥ 2 occupied centroids — there is no pair to
    * merge below that, and the callers' capacity checks guarantee it
    * (k ≥ 2 is a constructor precondition). */
  def mergeClosest(): Unit = {
    assert(n >= 2, s"mergeClosest needs >= 2 occupied centroids, have $n")
    var best = 0; var bestGap = Double.MaxValue
    var i = 0
    while (i < n - 1) {
      val gap = vals(i + 1) - vals(i)
      if (gap < bestGap) { bestGap = gap; best = i }
      i += 1
    }
    val c = cnts(best) + cnts(best + 1)
    vals(best) = (vals(best) * cnts(best) + vals(best + 1) * cnts(best + 1)) / c
    cnts(best) = c
    System.arraycopy(vals, best + 2, vals, best + 1, n - best - 2)
    System.arraycopy(cnts, best + 2, cnts, best + 1, n - best - 2)
    n -= 1
  }
}

/** Quantile sketch as a typed Catalyst [[Aggregator]] — the streaming
  * histogram of Ben-Haim & Yom-Tov (JMLR 2010, the SPDT histogram),
  * completing the bounded-state sketch family: frequencies
  * ([[MisraGries]]), cardinality ([[KMV]]), and now quantiles. State
  * is ≤ k (value, count) centroids; an arriving value either
  * increments its existing centroid (one binary search, zero
  * allocation) or inserts in place, merging the closest adjacent pair
  * only when a NEW distinct value overflows capacity — so a 100 TB
  * column shuffles k centroids per partial instead of the full value
  * multiset.
  *
  * With ≤ k distinct inputs per group no merge ever fires, every
  * centroid is an exact (value, count), and `finish` computes EXACT
  * discrete quantiles — the oracle regime, mirroring DuckDB's
  * `quantile_disc` convention (smallest value whose cumulative count
  * reaches max(1, ceil(q·N))). Past capacity the weighted-mean
  * centroids give the SPDT approximation; like Misra–Gries eviction
  * it is order-dependent, so the error envelope is pinned by spec
  * rather than oracle.
  *
  * Non-finite inputs: NaN is DROPPED (it has no position on the value
  * axis — a binary search lands on an arbitrary slot and corrupts the
  * sorted-prefix invariant — the SQL-NULL-like convention built-in
  * aggregates follow). ±Inf are KEPT as rankable extremes, matching
  * how SQL engines (and the [[TopK]] aggregator) order infinities, so
  * an Inf-bearing column agrees with the DuckDB quantile oracle in the
  * exact regime. Kept-Inf safety: equal values always combine into one
  * centroid, so with k ≥ 3 a −Inf centroid can never be ADJACENT to a
  * +Inf centroid when `mergeClosest` runs (that adjacency needs n == 2,
  * but merges only fire at n ≥ k) — the one pairing whose weighted
  * mean is NaN is structurally unreachable, hence `require(k >= 3)`.
  * In the approximation regime a finite centroid merged into an Inf
  * neighbor collapses to ±Inf (Inf absorbs the weighted mean); that
  * over-weights the extreme tail but never corrupts the buffer. */
class StreamHist(k: Int, qs: Seq[Double])
    extends Aggregator[Double, SHBuf, Seq[Double]] {
  require(k >= 3, "StreamHist needs k >= 3 (k == 2 could force merging " +
    "adjacent -Inf/+Inf centroids, whose weighted mean is NaN)")
  require(qs.nonEmpty, "StreamHist needs >= 1 quantile")
  require(qs.forall(q => q >= 0.0 && q <= 1.0), "quantiles must be in [0,1]")

  override def zero: SHBuf =
    SHBuf(new Array[Double](k), new Array[Long](k), 0)

  override def reduce(b: SHBuf, v: Double): SHBuf = {
    // NaN dropped, ±Inf kept — see the class doc for the contract and
    // why k >= 3 makes kept infinities merge-safe
    if (java.lang.Double.isNaN(v)) return b
    val i = java.util.Arrays.binarySearch(b.vals, 0, b.n, v)
    if (i >= 0) b.cnts(i) += 1L // existing centroid: zero allocation
    else {
      var ins = -i - 1
      if (b.n == k) {
        // full of real centroids: free a slot first, then re-locate
        b.mergeClosest()
        val j = java.util.Arrays.binarySearch(b.vals, 0, b.n, v)
        if (j >= 0) { b.cnts(j) += 1L; return b }
        ins = -j - 1
      }
      System.arraycopy(b.vals, ins, b.vals, ins + 1, b.n - ins)
      System.arraycopy(b.cnts, ins, b.cnts, ins + 1, b.n - ins)
      b.vals(ins) = v
      b.cnts(ins) = 1L
      b.n += 1
    }
    b
  }

  override def merge(a: SHBuf, b: SHBuf): SHBuf = {
    // two-pointer sorted merge (summing equal values), then shrink by
    // closest-pair merging back to capacity — once per partial pair
    val na = a.occupied; val nb = b.occupied
    val vs = new Array[Double](na + nb)
    val cs = new Array[Long](na + nb)
    var ia = 0; var ib = 0; var io = 0
    while (ia < na || ib < nb) {
      if (ia < na && ib < nb && a.vals(ia) == b.vals(ib)) {
        vs(io) = a.vals(ia); cs(io) = a.cnts(ia) + b.cnts(ib); ia += 1; ib += 1
      } else if (ib >= nb || (ia < na && a.vals(ia) < b.vals(ib))) {
        vs(io) = a.vals(ia); cs(io) = a.cnts(ia); ia += 1
      } else {
        vs(io) = b.vals(ib); cs(io) = b.cnts(ib); ib += 1
      }
      io += 1
    }
    val out = zero
    if (io <= k) {
      System.arraycopy(vs, 0, out.vals, 0, io)
      System.arraycopy(cs, 0, out.cnts, 0, io)
      out.n = io
    } else {
      // shrink the oversized merged run in place (vs/cs are scratch)
      val wide = SHBuf(vs, cs, io)
      while (wide.n > k) wide.mergeClosest()
      System.arraycopy(wide.vals, 0, out.vals, 0, k)
      System.arraycopy(wide.cnts, 0, out.cnts, 0, k)
      out.n = k
    }
    out
  }

  override def finish(s: SHBuf): Seq[Double] = {
    val n = s.occupied
    var total = 0L
    var i = 0
    while (i < n) { total += s.cnts(i); i += 1 }
    if (total == 0L) return qs.map(_ => Double.NaN)
    qs.map { q =>
      val target = math.max(1L, math.ceil(q * total).toLong)
      var cum = 0L; var j = 0
      while (j < n && cum + s.cnts(j) < target) { cum += s.cnts(j); j += 1 }
      s.vals(math.min(j, n - 1))
    }
  }

  override def bufferEncoder: Encoder[SHBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

/** Bounded top-k partial state: the first `n` slots hold (score, id)
  * pairs sorted by (score desc, id asc) in fixed-capacity arrays.
  * Occupancy is the EXPLICIT counter `n` — not a (−∞, Long.MaxValue)
  * padding sentinel, so an entry with id = Long.MaxValue or score = −∞
  * is a legal resident. Same fixed-array in-place discipline as the
  * sketch buffers.
  *
  * STREAMING-STATE SCHEMA (v2, see [[Sketches.StateSchemaVersion]]):
  * like [[SHBuf]], this layout is the state-store row for
  * [[Sketches.windowTopStream]]; the explicit `n` field (v2) is not
  * restore-compatible with a checkpoint written by the sentinel-padded
  * v1 buffer — such streams must restart from a fresh checkpoint. */
final case class TopKBuf(scores: Array[Double], ids: Array[Long], var n: Int) {
  /** True ordering: score desc, id asc; true if (s,i) ranks before the
    * OCCUPIED slot j. */
  def beats(j: Int, s: Double, i: Long): Boolean =
    s > scores(j) || (s == scores(j) && i < ids(j))
}

/** Exact grouped top-k as a typed Catalyst [[Aggregator]] — the
  * bounded-state alternative to `row_number().over(partitionBy …) ≤ k`:
  * the window plan shuffles and sorts EVERY row of every group, while
  * this aggregate carries at most k (score, id) pairs per partial and
  * merges map-side like any built-in — on a 100 TB corpus the
  * exchange drops from |rows| to k·|groups|. Unlike the sketches this
  * is EXACT in every regime (top-k is an associative, commutative,
  * order-insensitive reduction), so the oracle holds at any scale.
  * Ties break by smallest id, mirroring (score DESC, id ASC).
  * NaN scores are unrankable (both comparison branches are false, so
  * they would sort inconsistently with any SQL engine's NULLs-ordering
  * choice) and are explicitly DROPPED, mirroring how built-in ranking
  * over a quality formula treats missing scores; the spec pins it. */
class TopK(k: Int) extends Aggregator[(Double, Long), TopKBuf, Seq[(Double, Long)]] {
  require(k >= 1, "top-k needs k >= 1")

  override def zero: TopKBuf =
    TopKBuf(new Array[Double](k), new Array[Long](k), 0)

  override def reduce(b: TopKBuf, in: (Double, Long)): TopKBuf = {
    val (s, id) = in
    if (java.lang.Double.isNaN(s)) return b // unrankable: dropped by contract
    if (b.n < k || b.beats(k - 1, s, id)) {
      // find insertion point (first slot this entry beats), shift, place
      var ins = if (b.n < k) b.n else k - 1
      while (ins > 0 && b.beats(ins - 1, s, id)) ins -= 1
      System.arraycopy(b.scores, ins, b.scores, ins + 1, math.min(b.n, k - 1) - ins)
      System.arraycopy(b.ids, ins, b.ids, ins + 1, math.min(b.n, k - 1) - ins)
      b.scores(ins) = s
      b.ids(ins) = id
      if (b.n < k) b.n += 1
    }
    b
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    val out = zero
    var ia = 0; var ib = 0
    while (out.n < k && (ia < a.n || ib < b.n)) {
      // take a's head when it ranks before b's head (beats = candidate
      // ranks before slot); an exhausted side loses automatically
      val takeA = ia < a.n &&
        (ib >= b.n || b.beats(ib, a.scores(ia), a.ids(ia)))
      if (takeA) { out.scores(out.n) = a.scores(ia); out.ids(out.n) = a.ids(ia); ia += 1 }
      else { out.scores(out.n) = b.scores(ib); out.ids(out.n) = b.ids(ib); ib += 1 }
      out.n += 1
    }
    out
  }

  override def finish(s: TopKBuf): Seq[(Double, Long)] =
    (0 until s.n).map(i => (s.scores(i), s.ids(i)))

  override def bufferEncoder: Encoder[TopKBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}

/** Count–Min partial state: the d×w counter matrix, row-major in one
  * fixed-length array (row j occupies slots [j·w, (j+1)·w)). Same
  * fixed-array in-place discipline as the other sketch buffers. */
final case class CMBuf(counts: Array[Long])

/** Count–Min sketch (Cormode & Muthukrishnan 2005) as a typed Catalyst
  * [[Aggregator]] — point-frequency estimates for ANY term, completing
  * the bounded-state sketch family: [[MisraGries]] surfaces the heavy
  * hitters, this answers "how often did THIS term occur" for arbitrary
  * probes without materializing the term table. State is d·w counters;
  * reduce is d in-place increments; merge is one element-wise add —
  * associative, commutative and ORDER-INDEPENDENT (like [[KMV]], unlike
  * Misra–Gries eviction), so the estimate is a pure function of the
  * input multiset in every regime.
  *
  * est(t) = min_j counts[j][bucket_j(t)] ≥ true(t), with overcount
  * ≤ 2N/w at confidence 1 − 2^−d. The bucket functions are computed IN
  * THE PLAN (codegen'd `graft_hash60` of a per-row prefix, mod w — see
  * [[Sketches.cmsBuckets]]), which is what makes the sketch fully
  * DuckDB-mirrorable: the oracle rebuilds the same buckets from the md5
  * formula and reproduces the estimate INCLUDING collisions — a
  * stronger check than the exact-regime-only Misra–Gries oracle.
  * The aggregator itself therefore consumes the pre-computed bucket
  * vector, keeping the hash on the codegen side of the plan. */
class CountMin(d: Int, w: Int) extends Aggregator[Seq[Int], CMBuf, Seq[Long]] {
  require(d >= 1 && w >= 2, "CountMin needs depth >= 1 and width >= 2")

  override def zero: CMBuf = CMBuf(new Array[Long](d * w))

  override def reduce(b: CMBuf, buckets: Seq[Int]): CMBuf = {
    var j = 0
    while (j < d) { b.counts(j * w + buckets(j)) += 1L; j += 1 }
    b
  }

  override def merge(a: CMBuf, b: CMBuf): CMBuf = {
    var i = 0
    while (i < a.counts.length) { a.counts(i) += b.counts(i); i += 1 }
    a
  }

  override def finish(s: CMBuf): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(s.counts)

  override def bufferEncoder: Encoder[CMBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

/** [[KMV]] variant that surfaces the k-min SET itself (sorted
  * ascending) instead of the cardinality estimate — the form that
  * supports SKETCH ALGEBRA downstream: merged k-min sets answer union
  * cardinality, and the Beyer et al. 2007 ρ·est(∪) rule answers
  * intersection, without touching the original streams again. */
class KMVSet(k: Int) extends Aggregator[Long, KMVBuf, Seq[Long]] {
  private val inner = new KMV(k)
  override def zero: KMVBuf = inner.zero
  override def reduce(b: KMVBuf, h: Long): KMVBuf = inner.reduce(b, h)
  override def merge(a: KMVBuf, b: KMVBuf): KMVBuf = inner.merge(a, b)
  override def finish(s: KMVBuf): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(
      s.hashes.take(s.occupied))
  override def bufferEncoder: Encoder[KMVBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

/** HyperLogLog partial state: the 2^p register maxima. */
final case class HLLBuf(regs: Array[Int])

/** HyperLogLog cardinality sketch (Flajolet et al. 2007) as a typed
  * Catalyst [[Aggregator]] — the fixed-state COUNT(DISTINCT) standard
  * at 100 TB scale, completing the cardinality pair: [[KMV]] keeps the
  * k smallest hashes (state k longs, exact below capacity), HLL keeps
  * 2^p 6-bit register maxima (state 2^p no matter the cardinality,
  * ~1.04/√2^p relative error). Register update is MAX, so reduce and
  * merge are associative, commutative and ORDER-INDEPENDENT — the
  * estimate is a pure function of the input SET in every regime, like
  * [[KMV]] and [[CountMin]], unlike Misra–Gries eviction.
  *
  * The (bucket, rho) slot is computed IN THE PLAN from the shared
  * 60-bit hash mirror (see [[Sketches.hllSlot]]): bucket = the low p
  * hash bits, rho = leading-zero rank of the remaining 60−p bits.
  * Because both the slot formula and the estimator (see
  * [[Sketches.hllEstimate]]) are plain arithmetic on that mirrored
  * hash, the DuckDB oracle replays the ESTIMATE exactly — estimation
  * regime, small-range correction branch and all — a stronger check
  * than the exact-regime-only KMV oracle. The aggregator consumes the
  * finished slot int and never touches a digest. */
class HLL(p: Int) extends Aggregator[Int, HLLBuf, Seq[Int]] {
  require(p >= 4 && p <= 16, "HLL precision must be in [4, 16]")
  private val m = 1 << p

  override def zero: HLLBuf = HLLBuf(new Array[Int](m))

  override def reduce(b: HLLBuf, slot: Int): HLLBuf = {
    val bucket = slot >>> 6; val rho = slot & 63
    if (rho > b.regs(bucket)) b.regs(bucket) = rho
    b
  }

  override def merge(a: HLLBuf, b: HLLBuf): HLLBuf = {
    var i = 0
    while (i < m) {
      if (b.regs(i) > a.regs(i)) a.regs(i) = b.regs(i)
      i += 1
    }
    a
  }

  override def finish(s: HLLBuf): Seq[Int] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(s.regs)

  override def bufferEncoder: Encoder[HLLBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder()
}

object Sketches {

  /** Version of the sketch aggregation-buffer schemas as used for
    * Structured Streaming state (the buffer case classes ARE the
    * state-store row layouts). v1: sentinel-padded 2-field SHBuf /
    * TopKBuf. v2 (current): explicit-occupancy 3-field SHBuf/TopKBuf
    * (MGBuf/KMVBuf unchanged since v1). Checkpoints written under a
    * different version are NOT restorable — restart the affected
    * streams (windowQuantilesStream / windowTopStream) from a fresh
    * checkpoint directory after upgrading across v1→v2. */
  val StateSchemaVersion: Int = 2

  /** The d codegen'd Count–Min bucket indices for `term`, as one array
    * column: bucket_j = hash60("cm<j>:" ++ term) mod w. Stays entirely
    * inside whole-stage codegen (native `graft_hash60`, pmod) — the
    * aggregator receives finished indices and never touches a digest.
    * The same formula is reproducible in DuckDB from the md5 mirror,
    * which is what makes the sketch's estimates (collisions included)
    * oracle-checkable. */
  def cmsBuckets(term: org.apache.spark.sql.Column, d: Int, w: Int)
      : org.apache.spark.sql.Column =
    array((0 until d).map(j =>
      pmod(TextOps.hash60(term, s"cm$j:"), lit(w.toLong)).cast("int")): _*)

  /** Point-frequency estimate of `term` against a finished Count–Min
    * row `sk` (the d·w counter array): min over the d bucket lookups,
    * entirely codegen'd (element_at + the same bucket formula). */
  def cmsEstimate(sk: org.apache.spark.sql.Column,
                  term: org.apache.spark.sql.Column, d: Int, w: Int)
      : org.apache.spark.sql.Column =
    (0 until d).map(j =>
      element_at(sk,
        lit(j * w + 1) + pmod(TextOps.hash60(term, s"cm$j:"), lit(w.toLong))
          .cast("int")))
      .reduce(least(_, _))

  /** The codegen'd HyperLogLog slot of a value: bucket (low p bits of
    * the shared 60-bit hash) and rho (leading-zero rank of the
    * remaining 60−p bits, 1..61−p) packed as bucket·64 + rho. rho is
    * computed positionally — (61−p) − length(bin(w)) — because both
    * engines print minimal-width binary, making the formula exactly
    * mirrorable in DuckDB; the aggregator receives the finished slot
    * and never touches a digest. */
  def hllSlot(value: org.apache.spark.sql.Column, p: Int,
              prefix: String = "hll:"): org.apache.spark.sql.Column = {
    val m = 1 << p; val maxRho = 61 - p
    val h = TextOps.hash60(value, prefix)
    val bucket = pmod(h, lit(m.toLong)).cast("int")
    val w = shiftright(h, p)
    val rho = when(w === 0L, lit(maxRho))
      .otherwise(lit(maxRho) - length(bin(w)).cast("int"))
    (bucket * 64 + rho).cast("int")
  }

  /** The HLL estimate from a finished register row `sk`, entirely in
    * the plan and arithmetic-identical to the DuckDB mirror: the
    * harmonic sum Σ 2^−M_j is carried as the INTEGER Σ 2^(maxRho−M_j)
    * (exact in a BIGINT — no float accumulation order to disagree on),
    * then one deterministic double division; the small-range branch is
    * Flajolet's linear counting m·ln(m/V) over the zero-register count
    * V. Rounded to 4 dp like every double column the oracle compares. */
  def hllEstimate(sk: org.apache.spark.sql.Column, p: Int)
      : org.apache.spark.sql.Column = {
    val m = 1 << p; val maxRho = 61 - p
    val s = aggregate(sk, lit(0L),
      (acc, x) => acc + pow(lit(2.0), lit(maxRho) - x).cast("long"))
    val v = size(filter(sk, _ === 0))
    val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
      lit(m.toDouble) * lit(m.toDouble) * lit(math.pow(2.0, maxRho)) /
      s.cast("double")
    val est = when(raw <= lit(2.5 * m) && v > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double")))
      .otherwise(raw)
    round(est, 4)
  }

  /** Per-event-type HLL cardinalities with their exact counterparts:
    * distinct users (small per-type set → the linear-counting branch)
    * and distinct event ids (thousands per type → the raw-estimator
    * branch), so ONE query pins both branches against the oracle's
    * replay. One map-side-combined aggregation; the sketch state per
    * group is 2·2^p registers regardless of cardinality — the column
    * the exact countDistinct pair here could never be at 100 TB. */
  def hllDistinct(events: DataFrame, p: Int = 8): DataFrame = {
    val hll = udaf(new HLL(p), ExpressionEncoder[Int]())
    // The sketch agg and the exact-count agg stay SEPARATE aggregations
    // joined on the tiny group key: mixing a udaf with countDistinct in
    // one agg forces Catalyst into an Expand + SortAggregate pipeline
    // that re-serializes the register buffers per row (measured 4.9 s
    // vs 1.8 s for the two clean single-phase aggs at sf0.1). The
    // exact pair exists only to exhibit the estimator's error — at
    // true scale one would run the sketch agg alone.
    val sk = events
      .groupBy(col("event_type"))
      .agg(
        hll(hllSlot(col("user_id").cast("string"), p, "hllu:")).as("sku"),
        hll(hllSlot(col("event_id").cast("string"), p, "hlle:")).as("ske"))
    val exact = events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users_exact"),
        countDistinct(col("event_id")).as("ids_exact"))
    exact.join(broadcast(sk), Seq("event_type"))
      .select(col("event_type"),
        col("users_exact"), hllEstimate(col("sku"), p).as("users_est"),
        col("ids_exact"), hllEstimate(col("ske"), p).as("ids_est"))
      .orderBy("event_type")
  }

  /** Count–Min frequency estimates probed at the corpus's exact top-`n`
    * terms: (term, exact, est) with est ≥ exact by construction. The
    * sketch (a single d·w counter row) and the exact probe list each
    * aggregate the narrow term stream once — two scans, both map-side
    * combined; the probe then reads its d counters out of the broadcast
    * sketch row with `element_at`. The exact counts exist here only to
    * exhibit the estimation error; a production probe queries arbitrary
    * terms against the same sketch row. Tokenization is [[Corpus.terms]],
    * the single shared definition. */
  def cmsTermCounts(docs: DataFrame, d: Int = 3, w: Int = 1024,
                    topN: Int = 20): DataFrame = {
    val cm = udaf(new CountMin(d, w),
      ExpressionEncoder[Seq[Int]]())
    val terms = Corpus.terms(docs)
    val sketch = terms.select(cm(cmsBuckets(col("term"), d, w)).as("sk"))
    val probe = terms.groupBy("term")
      .agg(count(lit(1)).cast("long").as("exact"))
      .orderBy(col("exact").desc, col("term").asc)
      .limit(topN)
    probe.crossJoin(broadcast(sketch))
      .select(col("term"), col("exact"),
        cmsEstimate(col("sk"), col("term"), d, w).cast("long").as("est"))
      .orderBy(col("exact").desc, col("term").asc)
  }

  /** Per-hour Count–Min estimates probed at each window's event types
    * — the windowed form of [[cmsTermCounts]]: per window the state is
    * ONE d·w counter row no matter the type cardinality, and the probe
    * reads its estimates back with [[cmsEstimate]] against that row.
    * (wstart, term, est); the hash-mirrored oracle replays estimates
    * exactly, collisions included, per window. */
  def windowCms(events: DataFrame, d: Int = 3, w: Int = 256): DataFrame = {
    val cm = udaf(new CountMin(d, w), ExpressionEncoder[Seq[Int]]())
    val sk = events
      .groupBy(window(col("ts"), "1 hour").as("window"))
      .agg(cm(cmsBuckets(col("event_type"), d, w)).as("sk"))
    val probe = events
      .select(window(col("ts"), "1 hour").as("window"),
        col("event_type").as("term")).distinct()
    probe.join(sk, Seq("window"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("term"), cmsEstimate(col("sk"), col("term"), d, w).as("est"))
      .orderBy("wstart", "term")
  }

  /** Streaming twin of [[windowCms]] — the CountMin udaf under a
    * watermarked streaming window aggregation: the state-store row per
    * open window is the d·w CMBuf. Because the counter matrix is a
    * SUM, the sketch is order-independent and stream ≡ batch holds
    * exactly in EVERY regime (like [[KMV]], unlike Misra–Gries
    * eviction). Emits (wstart, sk); probing happens downstream of the
    * sink with [[cmsEstimate]]. */
  def windowCmsStream(events: DataFrame, d: Int = 3, w: Int = 256): DataFrame = {
    val cm = udaf(new CountMin(d, w), ExpressionEncoder[Seq[Int]]())
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(cm(cmsBuckets(col("event_type"), d, w)).as("sk"))
      .select(col("window.start").as("wstart"), col("sk"))
  }

  /** Streaming per-window HLL — the [[HLL]] udaf under a watermarked
    * streaming window aggregation: the state-store row per open window
    * is the 2^p-register HLLBuf, fixed-size no matter how many
    * distinct users the window sees (the [[windowDistinctStream]] KMV
    * row is ≤ k hashes; this is the constant-state alternative at
    * cluster scale). Register update is MAX, so stream ≡ batch holds
    * exactly in EVERY regime. Emits (wstart, sk); probe downstream of
    * the sink with [[hllEstimate]]. */
  def windowHllStream(events: DataFrame, p: Int = 8): DataFrame = {
    val hll = udaf(new HLL(p), ExpressionEncoder[Int]())
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(hll(hllSlot(col("user_id").cast("string"), p, "hllu:")).as("sk"))
      .select(col("window.start").as("wstart"), col("sk"))
  }

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

  /** Streaming twin of [[windowHeavyHitters]] — the same [[MisraGries]]
    * udaf inside a watermarked STREAMING window aggregation: the
    * per-window state row the state store carries between micro-batches
    * is the ≤ k-slot MGBuf (two encoded arrays), not a (window × term)
    * count table — bounded state per window regardless of term
    * cardinality, which is the whole point of the sketch on an
    * unbounded stream. Emits (wstart, sketch); ranking happens
    * downstream of the sink (row_number is not a streaming op). The
    * spec pins stream ≡ batch across micro-batch boundaries, which
    * exercises MGBuf's encode/decode through the state store. */
  def windowHeavyHittersStream(events: DataFrame, k: Int = 16): DataFrame = {
    val mg = udaf(new MisraGries(k), org.apache.spark.sql.Encoders.STRING)
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(mg(col("event_type")).as("sketch"))
      .select(col("window.start").as("wstart"), col("sketch"))
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

  /** Per-source distinct-vocabulary report via [[KMV]]: how lexically
    * diverse each corpus source is — the curation signal behind
    * source-mix decisions ("is src7 a near-constant template?"). One
    * explode + one bounded-state aggregation; the shuffle carries
    * ≤ k longs per (source, partial) instead of the full per-source
    * distinct term set, which is what makes COUNT(DISTINCT) affordable
    * when sources have 10^8-term vocabularies. Capacity ≥ every
    * per-source vocabulary ⇒ exact (the oracle regime, pinned by the
    * capacity-precondition spec alongside the Misra–Gries guards). */
  def sourceDistinctTerms(docs: DataFrame, k: Int = 64): DataFrame = {
    val kmv = udaf(new KMV(k), org.apache.spark.sql.Encoders.scalaLong)
    docs.select(col("source"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .select(col("source"), TextOps.hash60(col("term"), "kv:").as("h"))
      .groupBy("source")
      .agg(kmv(col("h")).as("n_distinct"))
      .orderBy(col("source"))
  }

  /** Per-hour distinct event types via [[KMV]] — the windowed
    * cardinality twin of [[windowHeavyHitters]], same udaf composition
    * into a plain windowed groupBy. Per-window state is ≤ k longs
    * regardless of type cardinality. */
  def windowDistinct(events: DataFrame, k: Int = 16): DataFrame = {
    val kmv = udaf(new KMV(k), org.apache.spark.sql.Encoders.scalaLong)
    events
      .select(window(col("ts"), "1 hour").as("window"),
        TextOps.hash60(col("event_type"), "kv:").as("h"))
      .groupBy("window")
      .agg(kmv(col("h")).as("n_types"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("n_types"))
      .orderBy(col("wstart"))
  }

  /** Streaming twin of [[windowDistinct]] — the same [[KMV]] udaf
    * inside a watermarked streaming window aggregation, so the state
    * store carries one ≤ k-long KMVBuf per open window. Because the
    * k-min set is order-independent, stream ≡ batch holds exactly in
    * BOTH sketch regimes — stronger than the Misra–Gries twin, whose
    * equivalence needs the no-eviction regime. */
  def windowDistinctStream(events: DataFrame, k: Int = 16): DataFrame = {
    val kmv = udaf(new KMV(k), org.apache.spark.sql.Encoders.scalaLong)
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .select(col("ts"), TextOps.hash60(col("event_type"), "kv:").as("h"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(kmv(col("h")).as("n_types"))
      .select(col("window.start").as("wstart"), col("n_types"))
  }

  /** Per-source top-k documents by quality via [[TopK]] — exact in
    * every regime (top-k is an order-insensitive reduction). The
    * window-function formulation (`row_number over (partition by
    * source order by quality desc)`) shuffles and sorts EVERY doc;
    * this aggregate exchanges ≤ k (score, id) pairs per (source,
    * partial). Quality is the shared 6-dp [[TextOps.withQuality]]
    * formula, so ranking compares the same rounded value in both
    * engines; ties break by smallest doc_id. */
  def topDocsBySource(docs: DataFrame, k: Int = 3): DataFrame = {
    val tk = udaf(new TopK(k), org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaDouble,
      org.apache.spark.sql.Encoders.scalaLong))
    TextOps.withQuality(docs)
      .groupBy("source")
      .agg(tk(col("quality"), col("doc_id")).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rn"),
        col("e._2").as("doc_id"), col("e._1").as("quality"))
      .orderBy("source", "rn")
  }

  /** Deterministic per-source quota sample: exactly min(n, |source|)
    * documents per source, chosen by smallest `hash60(doc_id)` — a
    * reproducible stratified sample whose membership is a pure
    * function of the data, like [[Corpus.hashSample]]'s percentage
    * gate but with an exact per-stratum COUNT. Reuses the [[TopK]]
    * aggregator on the negated hash, so the plan exchanges ≤ n
    * (hash, id) pairs per (source, partial) — the window-rank
    * formulation would shuffle every row to rank all of them. */
  def quotaSample(docs: DataFrame, n: Int = 5): DataFrame = {
    val tk = udaf(new TopK(n), org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaDouble,
      org.apache.spark.sql.Encoders.scalaLong))
    docs
      .select(col("source"), col("doc_id"),
        (-TextOps.hash60(col("doc_id").cast("string"), "qs:").cast("double"))
          .as("nh"))
      .groupBy("source")
      .agg(tk(col("nh"), col("doc_id")).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rn"),
        col("e._2").as("doc_id"))
      .orderBy("source", "rn")
  }

  /** KMV sketch algebra over source vocabularies: per source ONE k-min
    * sketch of the term-hash stream, then every source pair's UNION
    * and INTERSECTION cardinality computed from the 20 sketch rows
    * alone — merged k-min set for the union (Bar-Yossef), ρ·est(∪)
    * with ρ = |k-min ∩ A ∩ B|/|merged| for the intersection (Beyer et
    * al. 2007). The inter_d/union_d estimates are EXACT below sketch
    * capacity (the oracle regime; estimation error bound is
    * spec-pinned past it). The 100 TB contrast with the exact
    * formulation: the term streams aggregate ONCE map-side into
    * |sources| bounded rows and the pairwise combination is pure
    * array arithmetic on a broadcast self-join of those rows — no
    * per-pair shuffle of term sets ever happens. */
  def sourceSetOps(docs: DataFrame, k: Int = 1024): DataFrame = {
    val kmv = udaf(new KMVSet(k), org.apache.spark.sql.Encoders.scalaLong)
    val sk = docs
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .select(col("source"), TextOps.hash60(col("term"), "kv:").as("h"))
      .groupBy("source").agg(kmv(col("h")).as("sk"))
    val a = sk.select(col("source").as("src_a"), col("sk").as("ska"))
    val b = sk.select(col("source").as("src_b"), col("sk").as("skb"))
    val merged = slice(array_sort(array_union(col("ska"), col("skb"))), 1, k)
    val nMerged = size(merged)
    val unionEst = when(nMerged < k, nMerged.cast("double"))
      .otherwise(lit((k - 1).toDouble * KMV.TwoPow60) /
        element_at(merged, k).cast("double"))
    val ksect = size(array_intersect(array_intersect(merged, col("ska")),
      col("skb")))
    a.crossJoin(broadcast(b)).filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        round(unionEst).cast("long").as("union_d"),
        round(ksect * unionEst / nMerged).cast("long").as("inter_d"))
      .orderBy("src_a", "src_b")
  }

  /** Weighted sample WITHOUT replacement (Efraimidis–Spirakis 2006):
    * each doc gets the exponential-race key ln(u)/w with u the
    * hash-derived uniform in (0, 1] and w its weight (token-mass here,
    * so long documents are proportionally more likely); the k largest
    * keys ARE a weighted sample without replacement. One [[TopK]]
    * aggregation — ≤ k (key, id) pairs per partial, map-side combined,
    * no global sort — versus the window-rank formulation that would
    * shuffle every row. Deterministic: u is a pure function of doc_id,
    * so membership is reproducible across runs and engines, and the
    * oracle replays the same keys relationally (output is rank + id
    * only — integer columns, no float compare). */
  def weightedSample(docs: DataFrame, k: Int = 100): DataFrame = {
    val tk = udaf(new TopK(k), org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaDouble,
      org.apache.spark.sql.Encoders.scalaLong))
    val u = (TextOps.hash60(col("doc_id").cast("string"), "ws:")
      .cast("double") + lit(1.0)) / lit(math.pow(2.0, 60))
    docs
      .select(col("doc_id"),
        (log(u) / col("n_chars").cast("double")).as("key"))
      .agg(tk(col("key"), col("doc_id")).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "e")))
      .select((col("pos") + 1).cast("long").as("rn"),
        col("e._2").as("doc_id"))
      .orderBy("rn")
  }

  /** Per-hour top events by value via [[TopK]] — the windowed form of
    * the bounded top-k aggregate (per-window exchange is k pairs, not
    * the window's whole row set). */
  def windowTop(events: DataFrame, k: Int = 3): DataFrame = {
    val tk = udaf(new TopK(k), org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaDouble,
      org.apache.spark.sql.Encoders.scalaLong))
    events
      .groupBy(window(col("ts"), "1 hour"))
      .agg(tk(col("value"), col("event_id")).as("top"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("wstart"), (col("pos") + 1).cast("long").as("rn"),
        col("e._2").as("event_id"), round(col("e._1"), 6).as("value"))
      .orderBy("wstart", "rn")
  }

  /** Streaming twin of [[windowTop]] — [[TopK]] under a watermarked
    * streaming window agg; per-window state-store row is the ≤ k-pair
    * TopKBuf, completing the sketch-family streaming matrix
    * (frequency, cardinality, quantiles, top-k). */
  def windowTopStream(events: DataFrame, k: Int = 3): DataFrame = {
    val tk = udaf(new TopK(k), org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaDouble,
      org.apache.spark.sql.Encoders.scalaLong))
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(tk(col("value"), col("event_id")).as("top"))
      .select(col("window.start").as("wstart"), col("top"))
  }

  /** Per-source document-length quantiles via [[StreamHist]]: the
    * length-distribution fingerprint of each source (a skewed p90/p50
    * ratio marks template-heavy or truncated sources). Capacity ≥
    * every source's distinct-length alphabet ⇒ exact quantile_disc
    * (the oracle regime, capacity-precondition-pinned); at true scale
    * the same plan shuffles ≤ k centroids per (source, partial). */
  def sourceLengthQuantiles(docs: DataFrame, k: Int = 512): DataFrame = {
    val sh = udaf(new StreamHist(k, Seq(0.5, 0.9)),
      org.apache.spark.sql.Encoders.scalaDouble)
    docs.groupBy("source")
      .agg(sh(col("n_chars").cast("double")).as("qv"))
      .select(col("source"),
        element_at(col("qv"), 1).cast("long").as("p50"),
        element_at(col("qv"), 2).cast("long").as("p90"))
      .orderBy("source")
  }

  /** Per-hour value quantiles via [[StreamHist]] — the windowed
    * quantile twin of [[windowDistinct]]/[[windowHeavyHitters]]. */
  def windowQuantiles(events: DataFrame, k: Int = 512): DataFrame = {
    val sh = udaf(new StreamHist(k, Seq(0.5, 0.95)),
      org.apache.spark.sql.Encoders.scalaDouble)
    events
      .groupBy(window(col("ts"), "1 hour"))
      .agg(sh(col("value")).as("qv"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        round(element_at(col("qv"), 1), 6).as("p50"),
        round(element_at(col("qv"), 2), 6).as("p95"))
      .orderBy("wstart")
  }

  /** Streaming twin of [[windowQuantiles]] — [[StreamHist]] under a
    * watermarked streaming window agg; the state-store row per open
    * window is the ≤ k-centroid SHBuf (two encoded arrays). */
  def windowQuantilesStream(events: DataFrame, k: Int = 512): DataFrame = {
    val sh = udaf(new StreamHist(k, Seq(0.5, 0.95)),
      org.apache.spark.sql.Encoders.scalaDouble)
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(sh(col("value")).as("qv"))
      .select(col("window.start").as("wstart"),
        round(element_at(col("qv"), 1), 6).as("p50"),
        round(element_at(col("qv"), 2), 6).as("p95"))
  }
}

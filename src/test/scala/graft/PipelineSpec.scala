package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Similarity, TextOps}
import graft.streaming.EventStreams

/** Pipeline operator semantics on hand-built corpora with known answers. */
class PipelineSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    val implicits = spark.implicits
    import implicits._
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
  }

  private val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"

  test("tokenEntropy: uniform usage = ln(types) and norm 1; repeated = 0") {
    val d = docs(1L -> "a b c d", 2L -> "a a a a", 3L -> "a a b b")
    val got = TextOps.tokenEntropy(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    // uniform over 4 types: H = ln 4, normalized exactly 1
    assert(got(1L) == ((4L, 4L, math.rint(math.log(4) * 1e6) / 1e6, 1.0)))
    // degenerate single type: H = 0, normalized 0 by convention
    assert(got(2L) == ((4L, 1L, 0.0, 0.0)))
    // two even types: H = ln 2, normalized 1
    assert(got(3L)._3 == math.rint(math.log(2) * 1e6) / 1e6 && got(3L)._4 == 1.0)
  }

  test("basketPairs: support/confidence/lift with a-priori prune") {
    val implicits = spark.implicits
    import implicits._
    // 4 orders: {1,2} {1,2} {1,3} {4} — item 4 and pair (1,3) fall
    // below min counts; pair (1,2): c1=3, c2=2, pc=2, n=4
    val li = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L), (13L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val got = pipeline.Association.basketPairs(li).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getAs[Double]("support") == 0.5)
    assert(r.getAs[Double]("conf_1_2") == math.rint(2.0 / 3.0 * 1e6) / 1e6)
    assert(r.getAs[Double]("conf_2_1") == 1.0)
    // lift = pc*n/(c1*c2) = 2*4/(3*2) = 4/3
    assert(r.getAs[Double]("lift") == math.rint(4.0 / 3.0 * 1e6) / 1e6)
  }

  test("cusum: alarm fires on a sustained rate shift, not on flat series") {
    val implicits = spark.implicits
    import implicits._
    // "flat": 10 events/hour for 20 hours. "shift": 1/hour for 16 hours
    // then 50/hour for 4 — the up-CUSUM crosses 4·mean within the burst.
    val rows = (for (h <- 0 until 20; i <- 0 until 10)
      yield ("flat", h.toLong, i)) ++
      (for (h <- 0 until 20; i <- 0 until (if (h < 16) 1 else 50))
        yield ("shift", h.toLong, i))
    val ev = rows.toDF("event_type", "h", "i")
      .select(col("event_type"),
        (col("h") * 3600).cast("timestamp").as("ts"))
    val got = EventStreams.cusum(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getLong(5)))
    assert(!got.exists { case (t, _, _, a) => t == "flat" && a == 1 })
    // mean 10.8, alarm at 4·mean = 43.2: the up-CUSUM crosses during
    // the burst (s_up = 33.8·(h−15) from h=16); the down-CUSUM flags
    // the sustained low stretch before it — both are real shifts
    // relative to the series mean, so both alarm.
    val upAlarms = got.collect { case ("shift", hr, su, _) if su > 43.2 => hr }
    assert(upAlarms.toList == List(17L, 18L, 19L))
    val shiftAlarms = got.collect { case ("shift", hr, _, 1) => hr }
    assert(shiftAlarms.nonEmpty && Set(17L, 18L, 19L).subsetOf(shiftAlarms.toSet))
    // closed form ≡ direct recurrence on the shift series
    val mu = (16 * 1 + 4 * 50) / 20.0
    var s = 0.0
    val expectUp = (0 until 20).map { h =>
      val x = if (h < 16) 1.0 else 50.0
      s = math.max(0.0, s + x - 1.5 * mu); math.rint(s * 1e6) / 1e6
    }
    val gotUp = EventStreams.cusum(ev).collect()
      .filter(_.getString(0) == "shift").sortBy(_.getLong(1))
      .map(_.getDouble(3)).toSeq
    assert(gotUp.size == expectUp.size &&
      gotUp.zip(expectUp).forall { case (a, b) => math.abs(a - b) < 1e-6 })
  }

  test("burstiness: densified zeros push Fano up; constant series hits B = -1") {
    val implicits = spark.implicits
    import implicits._
    // steady: 5/hour for hours 0..3 → var 0, fano 0, B = -1
    // spike: 8 events at hour 0, none at 1..3 (densified zeros) →
    // mean 2, var_samp (36+4+4+4)/3 = 16, fano 8, B = (4-2)/(4+2)
    val rows = (for (h <- 0 until 4; i <- 0 until 5) yield ("steady", h)) ++
      (for (i <- 0 until 8) yield ("spike", 0)) :+ (("spike", 3))
    val ev = rows.toDF("event_type", "h")
      .select(col("event_type"), (col("h") * 3600).cast("timestamp").as("ts"))
    val got = EventStreams.burstiness(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(got("steady") == ((4L, 5.0, 0.0, -1.0)))
    val (nh, mr, fano, b) = got("spike")
    // spike series over hours 0..3 is (8,0,0,1): mean 2.25,
    // var_samp = (33.0625+5.0625+5.0625+1.5625)/3
    assert(nh == 4L && mr == 2.25)
    val vs = (33.0625 + 5.0625 + 5.0625 + 1.5625) / 3
    assert(math.abs(fano - vs / 2.25) < 1e-6)
    val sd = math.sqrt(vs)
    assert(math.abs(b - (sd - 2.25) / (sd + 2.25)) < 1e-6)
  }

  test("termGraphClusters: PMI edges clump terms into min-term components") {
    val implicits = spark.implicits
    import implicits._
    val d = docs(1L -> "alpha beta", 2L -> "alpha beta",
      3L -> "gamma delta", 4L -> "gamma delta", 5L -> "solo")
    val got = graft.pipeline.Corpus.termGraphClusters(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("alpha", "alpha", 2L), ("beta", "alpha", 2L),
      ("gamma", "delta", 2L), ("delta", "delta", 2L)))
  }

  test("substringDupRate: positional coverage counts within-doc repeats") {
    // k=4 grams. doc 1 = doc 2 → every position duplicated (rate 1).
    // doc 3 shares no 4-gram with anything and has an internal repeat
    // "abcd...abcd" → those positions count too.
    val d = docs(1L -> "xyzw1234", 2L -> "xyzw1234", 3L -> "abcdQQabcd")
    val got = graft.pipeline.Dedup.substringDupRate(d, 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) == ((5L, 5L, 1.0)) && got(2L) == ((5L, 5L, 1.0)))
    // doc 3: positions 1..7; only the two "abcd" occurrences (pos 1, 7)
    // share a gram value → dup_pos 2 of 7
    assert(got(3L)._1 == 7L && got(3L)._2 == 2L)
    assert(math.abs(got(3L)._3 - math.rint(2.0 / 7.0 * 1e6) / 1e6) < 1e-9)
  }

  test("typeDrift: identical-mix days score 0, a skewed day scores ln-ratio KL") {
    val implicits = spark.implicits
    import implicits._
    // day 0 and 1: 2 a + 2 b each (the global mix). day 2: 4 a only.
    val rows = Seq.tabulate(2) { d =>
      Seq(("a", d), ("a", d), ("b", d), ("b", d)) }.flatten ++
      Seq(("a", 2), ("a", 2), ("a", 2), ("a", 2))
    val ev = rows.toDF("event_type", "d")
      .select(col("event_type"), (col("d") * 86400).cast("timestamp").as("ts"))
    val got = EventStreams.typeDrift(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // global: a 8/12, b 4/12. days 0,1: p=(1/2,1/2) → KL = ½ln(3/4)+½ln(3/2)
    val kl01 = 0.5 * math.log(0.5 / (8.0 / 12)) + 0.5 * math.log(0.5 / (4.0 / 12))
    assert(math.abs(got(0L)._2 - kl01) < 1e-6 && math.abs(got(1L)._2 - kl01) < 1e-6)
    // day 2: all a → KL = ln(12/8); absent type contributes 0
    assert(got(2L)._1 == 4L &&
      math.abs(got(2L)._2 - math.log(12.0 / 8)) < 1e-6)
  }

  test("eventPaths: per-user trigrams, no cross-user chains") {
    val implicits = spark.implicits
    import implicits._
    // user 1: a b c d → abc, bcd. user 2: x y (no trigram — and no
    // chain borrowing user 1's tail)
    val rows = Seq((1L, 0, "a"), (1L, 1, "b"), (1L, 2, "c"), (1L, 3, "d"),
      (2L, 4, "x"), (2L, 5, "y"))
    val ev = rows.toDF("user_id", "i", "event_type")
      .select(col("user_id"), col("event_type"),
        (col("i") * 60).cast("timestamp").as("ts"),
        col("i").cast("long").as("event_id"))
    val got = EventStreams.eventPaths(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(got == Set(("a", "b", "c", 1L), ("b", "c", "d", 1L)))
  }

  test("dailyAcf: alternating series and zero-filled missing days") {
    val implicits = spark.implicits
    import implicits._
    // counts per day: [2, 4, 2, 4] → r1 = −0.75, r2 = 0.5
    val alt = (for (d <- 0 until 4; i <- 0 until (if (d % 2 == 0) 2 else 4))
      yield (d.toLong, i))
      .toDF("d", "i")
      .select((col("d") * 86400 + col("i")).cast("timestamp").as("ts"))
    val r = EventStreams.dailyAcf(alt, 2).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) == -0.75 && r(2L) == 0.5)
    // days 0,1,3 with 5 events each; day 2 absent → series [5,5,0,5],
    // r1 = −125/300 = −0.416667
    val gap = (for (d <- Seq(0, 1, 3); i <- 0 until 5) yield (d.toLong, i))
      .toDF("d", "i")
      .select((col("d") * 86400 + col("i")).cast("timestamp").as("ts"))
    val g = EventStreams.dailyAcf(gap, 1).collect()
    assert(g.head.getDouble(1) == -0.416667)
  }

  test("ewmaDaily: hand values, gap fill, and ≡ direct recurrence") {
    val implicits = spark.implicits
    import implicits._
    // counts [4, 8], window 2: day0 renormalizes to 4.0; day1 = 20/3
    val two = (for (d <- 0 until 2; i <- 0 until (if (d == 0) 4 else 8))
      yield (d.toLong, i)).toDF("d", "i")
      .select((col("d") * 86400 + col("i")).cast("timestamp").as("ts"))
    val r2 = EventStreams.ewmaDaily(two, 2).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r2(0L) == 4.0 && r2(1L) == 6.666667)
    // day 1 absent → series [3, 0, 6]; window 2 at day2 = 12/3
    val gap = (for (d <- Seq(0, 2); i <- 0 until (if (d == 0) 3 else 6))
      yield (d.toLong, i)).toDF("d", "i")
      .select((col("d") * 86400 + col("i")).cast("timestamp").as("ts"))
    val rg = EventStreams.ewmaDaily(gap, 2).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(rg(1L) == 1.0 && rg(2L) == 4.0) // day1: s=0·2+3·1=3, mass 3
    // window ≥ series length ≡ renormalized infinite-kernel EWMA
    val cnts = Vector(5L, 2L, 9L, 1L, 7L, 7L, 3L, 8L, 4L, 6L)
    val long = (for ((c, d) <- cnts.zipWithIndex; i <- 0L until c)
      yield (d.toLong, i)).toDF("d", "i")
      .select((col("d") * 86400 + col("i")).cast("timestamp").as("ts"))
    val rl = EventStreams.ewmaDaily(long, 30).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    for (t <- cnts.indices) {
      val num = (0 to t).map(k => cnts(t - k) * math.pow(0.5, k + 1)).sum
      val exp = num / (1.0 - math.pow(0.5, t + 1))
      assert(math.abs(rl(t.toLong) - exp) < 1e-6, s"day $t")
    }
  }

  test("cusum closed form ≡ direct recurrence on 10 seeded random series") {
    val implicits = spark.implicits
    import implicits._
    // 10 deterministic LCG series, lengths 5..24, counts 1..30 — one
    // Spark job covers them all as distinct event types
    def lcg(seed: Long): Iterator[Long] =
      Iterator.iterate(seed)(s => (s * 6364136223846793005L + 1442695040888963407L))
    val series = (0 until 10).map { i =>
      val len = 5 + (i * 7) % 20
      val cnts = lcg(i + 1).map(v => math.floorMod(v, 30L) + 1L).take(len).toVector
      s"s$i" -> cnts
    }
    val rows = for {
      (t, cnts) <- series; (c, h) <- cnts.zipWithIndex
      j <- 0L until c
    } yield (t, h)
    val ev = rows.toDF("event_type", "h")
      .select(col("event_type"), (col("h") * 3600).cast("timestamp").as("ts"))
    val got = EventStreams.cusum(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getDouble(3), r.getDouble(4)))
      .toMap
    series.foreach { case (t, cnts) =>
      val n = cnts.length.toLong; val tot = cnts.sum
      var su = 0L; var sd = 0L // 2n-scaled integer recurrence
      cnts.zipWithIndex.foreach { case (c, h) =>
        su = math.max(0L, su + 2 * n * c - 3 * tot)
        sd = math.max(0L, sd + tot - 2 * n * c)
        val (gu, gd) = got((t, h.toLong))
        assert(math.abs(gu - math.rint(su.toDouble / (2 * n) * 1e6) / 1e6) < 1e-9 &&
          math.abs(gd - math.rint(sd.toDouble / (2 * n) * 1e6) / 1e6) < 1e-9,
          s"$t hour $h: got ($gu,$gd) want scaled ($su,$sd)")
      }
    }
  }

  test("exact dedup groups identical keys, keeps min id") {
    val d = docs(1L -> "aaa bbb", 2L -> "aaa bbb", 3L -> "ccc")
    val g = Dedup.exact(d, col("text")).collect()
    assert(g.length == 1 && g(0).getAs[Long]("keep_id") == 1L && g(0).getAs[Long]("cnt") == 2L)
  }

  test("minhash pairs find near-identical docs, not unrelated ones") {
    val d = docs(
      1L -> base, 2L -> (base + " extra"),
      3L -> "completely different words about graphs spark partitions shuffles joins executors memory")
    val pairs = Dedup.minhashPairs(d).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("simhash: identical docs at hamming 0, near dups close") {
    val d = docs(1L -> base, 2L -> base, 3L -> (base + " tail"))
    val pairs = Dedup.simhashPairs(d, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) == 0L)
  }

  test("ngram jaccard of identical docs is 1") {
    val d = docs(1L -> base, 2L -> base)
    val j = Dedup.ngramJaccard(d).collect()
    assert(j.length == 1 && j(0).getAs[Double]("jaccard") == 1.0)
  }

  test("containment: embedded doc scores 1.0 on its own side only") {
    // doc 1 is a strict substring of doc 2 at ~8x the length — the
    // symmetric-Jaccard regime where MinHash bands essentially never
    // agree; the winnow side of the candidate union must find it
    val tail = (1 to 40).map(i => s"filler$i word$i").mkString(" ")
    val d = docs(1L -> base, 2L -> (base + " " + tail))
    val c = Dedup.containment(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Double]("c_ab"), r.getAs[Double]("c_ba")))).toMap
    assert(c.contains((1L, 2L)), s"subset pair missed: ${c.keySet}")
    assert(c((1L, 2L))._1 == 1.0)
    assert(c((1L, 2L))._2 < 0.5)
  }

  test("cosine topk: duplicate vector ranks first with cosine 1") {
    val implicits = spark.implicits
    import implicits._
    // probe 0 == vec 10; vec 11 orthogonal-ish
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 2.0f, 0.0f)),
      (10L, Array(1.0f, 0.0f, 2.0f, 0.0f)),
      (11L, Array(0.0f, 3.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(emb, probeMax = 10, k = 2).collect()
    val first = top.find(r => r.getLong(0) == 0L && r.getLong(3) == 1L).get
    assert(first.getAs[Long]("vid") == 10L && first.getAs[Double]("cosine") == 1.0)
  }

  test("lsh buckets are deterministic and ann stays within bucket") {
    val emb = GraphBuilder_table("embeddings")
    val b1 = Similarity.lshBuckets(emb).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = Similarity.lshBuckets(emb).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
    assert(b1.values.toSet.size > 1 && b1.values.toSet.size <= 16)
    val ann = Similarity.annLsh(emb).collect()
    ann.foreach(r => assert(b1(r.getLong(0)) == b1(r.getLong(1)))) // qid/vid co-bucketed
  }

  private def GraphBuilder_table(name: String) =
    graft.graph.GraphBuilder.table(spark, sfDir, name)

  test("lsh buckets derive dims from the data (non-64-dim vectors)") {
    val implicits = spark.implicits
    import implicits._
    // 8-dim vectors: the dims=64 hardcode would have projected garbage.
    // Expected buckets computed independently from the legacy fixed-dims
    // weight table at dims=8 (same per-(plane,pos) hash formula).
    val emb = Seq(
      (0L, Array.tabulate(8)(i => (i + 1).toFloat)),
      (1L, Array.tabulate(8)(i => -(i + 1).toFloat)),
      (2L, Array.tabulate(8)(i => if (i % 2 == 0) 1f else -1f))).toDF("vec_id", "embedding")
    val got = Similarity.lshBuckets(emb).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Similarity.planeWeights(spark, 4, 8)
    val expected = Similarity.exploded(emb).join(w, Seq("pos"))
      .groupBy("vec_id", "plane").agg(sum(col("w") * col("x")).as("proj"))
      .groupBy("vec_id")
      .agg(sum(when(col("proj") >= 0,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(plane AS INT))"))
        .otherwise(0L)).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected && got.size == 3)
    // opposite vectors land in complementary buckets (all signs flip)
    assert((got(0L) ^ got(1L)) == 15L)
  }

  test("cosine near-dup finds the planted duplicate pair, none below threshold") {
    val implicits = spark.implicits
    import implicits._
    val v = Array.tabulate(16)(i => (i + 1).toFloat)
    val vNear = v.clone(); vNear(0) = v(0) + 0.01f // cosine ≈ 1
    val vFar = Array.tabulate(16)(i => if (i % 2 == 0) 1f else -2f)
    val emb = Seq((1L, v), (2L, vNear), (3L, vFar)).toDF("vec_id", "embedding")
    val dups = Similarity.cosineNearDup(emb, planes = 4, minCosine = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(dups.map(d => (d._1, d._2)).toSet == Set((1L, 2L)))
    assert(dups.head._3 > 0.999)
  }

  test("multi-probe ann widens candidates and keeps single-probe results") {
    val emb = GraphBuilder_table("embeddings")
    val single = Similarity.annLsh(emb, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val multi = Similarity.annLsh(emb, k = 3, multiProbe = 2).collect()
    val multiPairs = multi.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // per-probe best cosine can only improve with more buckets probed
    val bestSingle = single.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val bestMulti = multi.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getDouble(2)).max).toMap
    bestSingle.foreach { case (qid, c) => assert(bestMulti(qid) >= c) }
    assert(multiPairs.size >= single.size)
    // multiProbe = 0 is exactly the single-probe plan
    assert(Similarity.annLsh(emb, k = 3, multiProbe = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet == single)
  }

  test("ivf: deterministic clusters; nprobe=k equals brute-force top-k") {
    val emb = GraphBuilder_table("embeddings")
    val a1 = Similarity.ivfAssignments(emb, k = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a2 = Similarity.ivfAssignments(emb, k = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a1 == a2 && a1.values.toSet.size > 1)
    // full-probe IVF searches every list → exactly the brute-force
    // result, cosine values included (the documented nprobe=k contract
    // as an executable full-row equality)
    val full = Similarity.annIvf(emb, k = 8, nprobe = 8, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val brute = Similarity.cosineTopK(emb, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(full == brute)
    // narrow probe returns a subset-quality result: same schema, ≤ rows
    val narrow = Similarity.annIvf(emb, k = 8, nprobe = 1, topK = 3)
    assert(narrow.count() <= full.size && narrow.count() > 0)
  }

  test("ivf invariant holds at sf0.01: nprobe=k equals brute-force, full rows") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val full = Similarity.annIvf(emb, k = 8, nprobe = 8, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val brute = Similarity.cosineTopK(emb, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(full == brute && full.nonEmpty)
  }

  test("triangle close: shuffle path equals broadcast path") {
    val implicits = spark.implicits
    import implicits._
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toDF("a", "b")
    val viaBroadcast = graft.algorithms.Structure.triangles(k4).count()
    val viaShuffle = graft.algorithms.Structure.triangles(k4, broadcastCloseMaxEdges = 0L).count()
    assert(viaBroadcast == 4L && viaShuffle == 4L)
  }

  test("langId picks the language with most markers") {
    val d = docs(
      1L -> "the cat is on a mat the dog is here",
      2L -> "der hund und die katze und das haus der garten die strasse")
    val out = Dedup_langId(d)
    assert(out(1L) == "en" && out(2L) == "de")
  }

  private def Dedup_langId(d: DataFrame): Map[Long, String] =
    TextOps.langId(d).collect().map(r => r.getLong(0) -> r.getString(2)).toMap

  test("quality score is in [0,1] and penalizes punctuation soup") {
    val d = docs(
      1L -> ("the data is clean and the words are real " * 3),
      2L -> "!!! ### $$$ %%% ^^^ &&& *** ((( ))) @@@ !!!")
    val q = TextOps.quality(d).collect().map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(2L))
  }

  test("token counts: whitespace vs bpe-ish") {
    val d = docs(1L -> "hello world, 42 tokens!")
    val r = TextOps.tokenCounts(d).head
    assert(r.getLong(1) == 4) // hello | world, | 42 | tokens!
    assert(r.getLong(2) == 7) // hello, world, ',', '4', '2', tokens, '!'
  }

  test("fingerprint is stable and equal for identical docs") {
    val d = docs(1L -> base, 2L -> base, 3L -> (base + " changed ending here"))
    val fp = TextOps.fingerprint(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
  }

  test("segment dedup drops cross-doc repeated windows, keeps order") {
    // width=3: docs 1 and 2 share their FIRST window verbatim; doc 1's
    // second window is unique; doc 3 is entirely the shared window.
    val shared = "one two three"
    val d = docs(
      1L -> (shared + " four five six"),
      2L -> (shared + " seven eight nine"),
      3L -> shared)
    val r = graft.pipeline.Corpus.segmentDedup(d, width = 3, minDf = 2)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) == ((2L, 1L, "four five six")))
    assert(r(2L) == ((2L, 1L, "seven eight nine")))
    assert(r(3L) == ((1L, 0L, ""))) // all-boilerplate doc survives as empty
  }

  test("segment dedup agrees with a driver reference on random corpora") {
    val implicits = spark.implicits
    import implicits._
    // 4-word vocabulary at width 4 → 256 possible windows over ~280
    // occurrences, so cross-doc collisions genuinely happen; doc
    // lengths aren't multiples of width, so short tail segments are
    // exercised too
    val words = Array("alpha", "beta", "gamma", "delta")
    val width = 4; val minDf = 2
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val corpus: Seq[(Long, String)] = (0L until 40L).map { id =>
        val len = 5 + rnd.nextInt(30)
        id -> Seq.fill(len)(words(rnd.nextInt(words.length))).mkString(" ")
      }
      def segsOf(t: String): Vector[String] =
        t.split(" ", -1).grouped(width).map(_.mkString(" ")).toVector
      val refDf = corpus.flatMap { case (id, t) => segsOf(t).distinct.map(_ -> id) }
        .groupBy(_._1).map { case (s, v) => s -> v.size }
      val ref = corpus.map { case (id, t) =>
        val ss = segsOf(t); val kept = ss.filter(s => refDf(s) < minDf)
        id -> ((ss.size.toLong, kept.size.toLong, kept.mkString(" ")))
      }.toMap
      val d = corpus.toDF("doc_id", "text").withColumn("lang", lit("en"))
      val got = graft.pipeline.Corpus.segmentDedup(d, width, minDf).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == ref, s"seed $seed")
    }
  }

  test("winnowing: shared substring of w+k-1 chars shares a fingerprint") {
    // guarantee: any common substring of length >= w+k-1 (= 12 here)
    // contains a full gram window in both docs, and the window min
    // depends only on the gram hashes, so both docs emit it
    val shared = "zzqqwwrrttyyuu" // 14 chars, nowhere else in the corpus
    val d = docs(
      1L -> ("aaa " + shared + " bbb"),
      2L -> ("ccccc " + shared + " ddddd"),
      3L -> "totally unrelated filler material with other letters")
    val fp = TextOps.winnow(d, 5, 8).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((fp(1L) intersect fp(2L)).nonEmpty)
    assert((fp(1L) intersect fp(3L)).isEmpty)
    // density: far fewer fingerprints than grams, but never zero
    assert(fp(1L).size < 15 && fp(1L).nonEmpty)
  }

  test("winnow agrees with a driver reference on random docs") {
    val implicits = spark.implicits
    import implicits._
    // driver-side mirror of hash60: conv(substr(md5(s),1,15),16,10)
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    val k = 5; val w = 8
    def refWinnow(text: String): Set[Long] = {
      val grams = (1 to math.max(text.length - (k - 1), 1))
        .map(i => text.slice(i - 1, i - 1 + k))
      val keys = grams.zipWithIndex.map { case (g, i0) =>
        val pos = i0 + 1L
        (h60("wn:" + g) >> 12) * 4096L + (4095L - pos % 4096L)
      }
      keys.sliding(w).filter(_.size == w).map(_.min).map(_ >> 12).toSet
    }
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd "
    val corpus = (0L until 25L).map { id =>
      id -> Seq.fill(20 + rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val got = graft.pipeline.TextOps.winnow(
        corpus.toDF("doc_id", "text").withColumn("lang", lit("en")), k, w)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    corpus.foreach { case (id, t) =>
      val ref = refWinnow(t)
      assert(got.getOrElse(id, Set.empty) == ref, s"doc $id")
    }
  }

  test("chargrams generator matches the whole-document SQL formula") {
    val implicits = spark.implicits
    import implicits._
    // random docs over an alphabet INCLUDING multi-byte code points
    // (2-, 3- and 4-byte UTF8): the generator's byte-cursor walk must
    // agree with substring()'s code-point semantics, positions included
    val rnd = new scala.util.Random(11)
    val alphabet = "abcde é漢😀".toCharArray // 😀 = surrogate pair
    def randDoc() = {
      val sb = new StringBuilder
      (0 until 40 + rnd.nextInt(200)).foreach { _ =>
        val c = alphabet(rnd.nextInt(alphabet.length))
        if (Character.isHighSurrogate(c)) sb.append("😀") else sb.append(c)
      }
      sb.toString
    }
    val corpus = (0L until 20L).map(id => id -> randDoc())
    val d = corpus.toDF("doc_id", "text").withColumn("lang", lit("en"))
    def bag(df: DataFrame) = df.collect()
      .groupBy(r => r.getLong(0)).view
      .mapValues(_.map(_.toSeq.tail).groupBy(identity).view.mapValues(_.length).toMap)
      .toMap
    val k = 5
    val formula = d.select(col("doc_id"),
      posexplode(expr(s"transform(sequence(1, greatest(length(text) - ${k - 1}, 1)), " +
        s"i -> substring(text, i, $k))")).as(Seq("pos0", "sh")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("sh"))
    assert(bag(TextOps.charGrams(d, k)) == bag(formula))
    // short-doc truncated-prefix and empty-doc semantics
    val tiny = Seq(1L -> "ab", 2L -> "").toDF("doc_id", "text")
    assert(TextOps.shingles(tiny, 5).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet == Set(1L -> "ab", 2L -> ""))
  }

  test("multi-MB document streams through the gram kernels") {
    val implicits = spark.implicits
    import implicits._
    // ~8 MB single document: the SQL-formula kernel would materialize
    // ~8M k-char substrings in one task AND walk the string per gram
    // (quadratic); the CharGrams generator streams the rows in O(1)
    // state — this whole test runs in seconds
    val rnd = new scala.util.Random(3)
    val alphabet = "abcdefgh "
    val sb = new StringBuilder(8 << 20)
    while (sb.length < (8 << 20)) sb.append(alphabet(rnd.nextInt(alphabet.length)))
    val text = sb.toString
    val d = Seq(1L -> text).toDF("doc_id", "text").withColumn("lang", lit("en"))
    val len = text.length.toLong
    assert(TextOps.shingles(d, 5).count() == len - 4)
    // winnow: completes within block-bounded memory; density sanity —
    // ~2/(w+1) of the gram count, and every fingerprint is distinct
    val fps = TextOps.winnow(d, 5, 8).count()
    assert(fps > 0L && fps < (len - 4) / 2)
    // segment path: token windows over the same doc reassemble losslessly
    val seg = graft.pipeline.Corpus.segmentDedup(d, width = 10, minDf = 2).head
    assert(seg.getLong(1) == seg.getLong(2)) // single doc → nothing mined
  }

  test("winnow pairs find substring overlap, cap drops boilerplate fp") {
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val d = docs(
      1L -> ("intro words here " + quote),
      2L -> (quote + " closing remarks follow"),
      3L -> "entirely different content with no overlap at all")
    val pairs = graft.pipeline.TextOps.winnowPairs(d, minShared = 2, maxDf = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) >= 2L)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    // maxDf=0 drops every fingerprint → no pairs survive
    assert(graft.pipeline.TextOps.winnowPairs(d, maxDf = 0).count() == 0L)
  }

  test("misra-gries: exact when k >= vocab, MG bound under eviction") {
    val implicits = spark.implicits
    import implicits._
    // exact regime: capacity above the vocabulary size
    val d = docs(1L -> "a a a b b c", 2L -> "a c c")
    val exact = graft.pipeline.Sketches.heavyHitters(d, k = 16, topN = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact == Map("a" -> 4L, "c" -> 3L, "b" -> 2L))
    // eviction regime: hot term over a long cold tail, k = 4,
    // N = 500 + 200 → the hot term must survive with
    // est >= true - N/(k+1) = 500 - 140, and never overcount
    val hot = Seq.fill(500)("hot")
    val cold = (1 to 100).flatMap(i => Seq.fill(2)(s"cold$i"))
    val terms = spark.sparkContext.parallelize(hot ++ cold, 8).toDS()
    val sketch = terms.select(new graft.pipeline.MisraGries(4).toColumn)
      .head()
    val est = sketch.getOrElse("hot", 0L)
    assert(est <= 500L && est >= 500L - (700L / 5L), s"hot estimate $est")
  }

  test("kmv: exact under capacity; bounded, order-independent estimate past it") {
    val implicits = spark.implicits
    import implicits._
    // exact regime, per-source: capacity above every source's vocabulary
    val d = Seq(
      (1L, "a a b c", "s1"), (2L, "c d", "s1"),
      (3L, "x y", "s2")).toDF("doc_id", "text", "source")
    val per = graft.pipeline.Sketches.sourceDistinctTerms(d, k = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per == Map("s1" -> 4L, "s2" -> 2L))
    // duplicates never inflate the count (k-min set is a SET)
    val dup = Seq((1L, "a a a a a a", "s")).toDF("doc_id", "text", "source")
    assert(graft.pipeline.Sketches.sourceDistinctTerms(dup, k = 4)
      .head().getLong(1) == 1L)
    // estimation regime: 5000 distinct values through k = 128 — the
    // Bar-Yossef bound gives ~1/sqrt(126) ≈ 9% relative error; assert
    // a 3-sigma-ish 25% envelope. hash60 is deterministic, so this is
    // a fixed number, not a flaky statistical test.
    val vals = (1 to 5000).map(i => s"v$i")
    def estOf(input: org.apache.spark.sql.Dataset[String]): Long =
      input.select(graft.pipeline.TextOps.hash60(col("value"), "kv:").as("h"))
        .as[Long].select(new graft.pipeline.KMV(128).toColumn).head()
    val e1 = estOf(vals.toDS())
    assert(math.abs(e1 - 5000.0) / 5000.0 < 0.25, s"estimate $e1")
    // order-independence: shuffled partitioning and reversed input give
    // the SAME estimate — the k-min set ignores arrival order entirely
    val e2 = estOf(spark.sparkContext.parallelize(vals.reverse, 13).toDS())
    assert(e2 == e1)
  }

  test("chunkDocs: overlap windows, tail chunk, empty doc emits one empty chunk") {
    val got = graft.pipeline.Corpus.chunkDocs(
        docs(1L -> "abcdefghij", 2L -> ""), size = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toList
    assert(got == List(
      (1L, 0L, 1L, "abcd"), (1L, 1L, 4L, "defg"),
      (1L, 2L, 7L, "ghij"), (1L, 3L, 10L, "j"),
      (2L, 0L, 1L, "")))
    // consecutive chunks share size - stride chars: no boundary loss
    assert(got(0)._4.takeRight(1) == got(1)._4.take(1))
  }

  test("bpePairs: within-word adjacent pairs; 1-char words contribute none") {
    val got = graft.pipeline.Corpus.bpePairs(
        docs(1L -> "ab ab abc x", 2L -> "ab"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toList
    // "ab"×3 and "abc" yield ab,ab,ab,ab,bc; the 1-char word "x" has
    // no adjacent pair and must not produce a truncated gram
    assert(got == List("ab" -> 4L, "bc" -> 1L))
  }

  test("corpusRollup: one-pass subtotals with grouping_id disambiguation") {
    val implicits = spark.implicits
    import implicits._
    val d = Seq(
      (1L, "s1", "en", 10L), (2L, "s1", "en", 20L), (3L, "s1", "de", 5L),
      (4L, "s2", "en", 7L)).toDF("doc_id", "source", "lang", "n_chars")
    val got = graft.pipeline.Corpus.corpusRollup(d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    assert(got == List(
      ("s1", "de", 0L, 1L, 5L), ("s1", "en", 0L, 2L, 30L),
      ("s2", "en", 0L, 1L, 7L),
      ("s1", "ALL", 1L, 3L, 35L), ("s2", "ALL", 1L, 1L, 7L),
      ("ALL", "ALL", 3L, 4L, 42L)))
  }

  test("weightedSample: E-S keys match a brute-force replay; scale-invariant") {
    val implicits = spark.implicits
    import implicits._
    val docs = (1L to 200L).map(i => (i, (i % 37 + 1))).toDF("doc_id", "n_chars")
    val got = graft.pipeline.Sketches.weightedSample(docs, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // brute-force replay of the same hash and key formula
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16)
    }
    val expect = (1L to 200L).map { i =>
      val u = (h60(s"ws:$i").toDouble + 1.0) / math.pow(2.0, 60)
      (math.log(u) / (i % 37 + 1).toDouble, i)
    }.sortBy { case (key, id) => (-key, id) }.take(10)
      .zipWithIndex.map { case ((_, id), ix) => ((ix + 1).toLong, id) }
    assert(got.toSeq == expect)
    // ranking is scale-invariant in the weights (keys are negative;
    // dividing all by the same c > 0 preserves order) — the sample is
    // a function of RELATIVE weights, as sampling-without-replacement
    // semantics require
    val scaled = graft.pipeline.Sketches.weightedSample(
        docs.withColumn("n_chars", col("n_chars") * 1000), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(scaled.toSeq == expect)
  }

  test("kmv set ops: exact under capacity, bounded estimates past it") {
    val implicits = spark.implicits
    import implicits._
    // exact regime: vocabularies fit the sketch
    val d = Seq((1L, "a b c", "s1"), (2L, "b c d e", "s2"))
      .toDF("doc_id", "text", "source")
    val got = graft.pipeline.Sketches.sourceSetOps(d, k = 16)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toList
    assert(got == List(("s1", "s2", 5L, 2L)))
    // estimation regime: 3000-term vocabularies overlapping in 1000,
    // k = 256 — union error ~1/sqrt(k-2) ≈ 6%, the intersection
    // inherits it through the ρ rule; assert generous envelopes.
    // hash60 is deterministic: fixed numbers, never flaky.
    val big = Seq(
      (1L, (1 to 3000).map(i => s"v$i").mkString(" "), "sa"),
      (2L, (2001 to 5000).map(i => s"v$i").mkString(" "), "sb"))
      .toDF("doc_id", "text", "source")
    val est = graft.pipeline.Sketches.sourceSetOps(big, k = 256)
      .collect().map(r => (r.getLong(2), r.getLong(3))).head
    assert(math.abs(est._1 - 5000.0) / 5000.0 < 0.15, s"union ${est._1}")
    assert(math.abs(est._2 - 1000.0) / 1000.0 < 0.30, s"inter ${est._2}")
    // repartitioned input gives the SAME estimates: the k-min set is
    // order-independent, so the algebra is too
    val est2 = graft.pipeline.Sketches.sourceSetOps(
        spark.sparkContext.parallelize(
          big.collect().toSeq.map(r => (r.getLong(0), r.getString(1),
            r.getString(2))).reverse, 7)
          .toDF("doc_id", "text", "source"), k = 256)
      .collect().map(r => (r.getLong(2), r.getLong(3))).head
    assert(est2 == est)
  }

  test("hll: deterministic bounded estimate, both branches, order-independent") {
    val implicits = spark.implicits
    import implicits._
    val p = 8
    def estOf(input: org.apache.spark.sql.Dataset[String]): Double = {
      val hll = udaf(new graft.pipeline.HLL(p),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Int]())
      input.toDF("value")
        .select(hll(graft.pipeline.Sketches.hllSlot(col("value"), p, "t:"))
          .as("sk"))
        .select(graft.pipeline.Sketches.hllEstimate(col("sk"), p).as("est"))
        .head().getDouble(0)
    }
    // raw-estimator branch: 5000 distinct >> 2.5m = 640; the standard
    // error is 1.04/sqrt(256) ~ 6.5% — assert a 3-sigma envelope.
    // hash60 is deterministic, so this is a fixed number, never flaky.
    val vals = (1 to 5000).map(i => s"v$i")
    val e1 = estOf(vals.toDS())
    assert(math.abs(e1 - 5000.0) / 5000.0 < 0.2, s"raw estimate $e1")
    // order-independence: register maxima ignore arrival order and
    // partitioning entirely — bit-identical estimate
    val e2 = estOf(spark.sparkContext.parallelize(vals.reverse, 13).toDS())
    assert(e2 == e1)
    // linear-counting branch: 50 distinct occupies ~50/256 registers →
    // raw <= 640 with zero registers present → m*ln(m/V), tight at
    // small cardinalities
    val small = estOf((1 to 50).map(i => s"s$i").toDS())
    assert(math.abs(small - 50.0) / 50.0 < 0.05, s"linear count $small")
    // duplicates never move a register past its max: same answer
    val dup = estOf((1 to 50).flatMap(i => Seq.fill(7)(s"s$i")).toDS())
    assert(dup == small)
  }

  test("streamhist: exact quantile_disc under capacity, SPDT estimate past it") {
    val implicits = spark.implicits
    import implicits._
    // exact regime: distinct values fit capacity, duplicates weighted.
    // quantile_disc convention: smallest value with cum >= max(1, ceil(q*N))
    val vs = Seq(1.0, 1.0, 1.0, 2.0, 3.0, 4.0) // N=6
    val got = vs.toDS().select(
      new graft.pipeline.StreamHist(8, Seq(0.0, 0.3, 0.5, 0.9, 1.0)).toColumn)
      .head()
    // targets: max(1,ceil(0))=1→1; ceil(1.8)=2→1; ceil(3)=3→1; ceil(5.4)=6→4; 6→4
    assert(got == Seq(1.0, 1.0, 1.0, 4.0, 4.0))
    // cross-check against DuckDB's convention probed on [1,2,3,4]
    val g2 = Seq(1.0, 2.0, 3.0, 4.0).toDS().select(
      new graft.pipeline.StreamHist(8, Seq(0.25, 0.5, 0.9)).toColumn).head()
    assert(g2 == Seq(1.0, 2.0, 4.0))
    // estimation regime: 10k uniform distinct values through k=128 —
    // SPDT centroids put the median well within a few percent
    val big = (1 to 10000).map(_.toDouble)
    val est = spark.sparkContext.parallelize(big, 16).toDS().select(
      new graft.pipeline.StreamHist(128, Seq(0.5)).toColumn).head().head
    assert(math.abs(est - 5000.0) / 5000.0 < 0.05, s"p50 estimate $est")
  }

  test("streamhist: NaN dropped, ±Inf rankable extremes (SQL semantics)") {
    val implicits = spark.implicits
    import implicits._
    // exact regime with infinities present: ±Inf rank like any SQL
    // engine ranks them (DuckDB quantile_disc keeps Inf as extreme
    // values and treats only NULL/NaN as missing) — p0 is -Inf, p100
    // is +Inf, the median ignores neither
    val vs = Seq(Double.NegativeInfinity, 1.0, 2.0, 3.0, Double.PositiveInfinity,
      Double.NaN) // NaN is the ONLY dropped value → N=5
    val got = vs.toDS().select(
      new graft.pipeline.StreamHist(8, Seq(0.0, 0.5, 1.0)).toColumn).head()
    assert(got == Seq(Double.NegativeInfinity, 2.0, Double.PositiveInfinity))
    // approximation regime with both infinities resident: forced merges
    // across 16 partitions never produce a NaN centroid (k >= 3 makes
    // the -Inf/+Inf adjacency unreachable) and the median of the bulk
    // stays finite and sane
    val big = Seq(Double.NegativeInfinity, Double.PositiveInfinity) ++
      (1 to 5000).map(_.toDouble)
    val est = spark.sparkContext.parallelize(big, 16).toDS().select(
      new graft.pipeline.StreamHist(64, Seq(0.5)).toColumn).head().head
    assert(!est.isNaN && math.abs(est - 2500.0) / 2500.0 < 0.10, s"p50 $est")
    // TopK agrees on Inf semantics: infinities are rankable, NaN dropped
    val tk = Seq((Double.PositiveInfinity, 1L), (5.0, 2L),
      (Double.NegativeInfinity, 3L), (Double.NaN, 4L)).toDS()
      .select(new graft.pipeline.TopK(2).toColumn).head()
    assert(tk == Seq((Double.PositiveInfinity, 1L), (5.0, 2L)))
  }

  test("topk aggregator: equals the window formulation on shuffled input") {
    val implicits = spark.implicits
    import implicits._
    // 500 rows over 7 groups across 16 partitions, scores with
    // deliberate ties — the aggregator must match row_number exactly
    val rows = (1 to 500).map(i => (s"g${i % 7}", (i * 37 % 50).toDouble, i.toLong))
    val df = spark.sparkContext.parallelize(rows, 16).toDF("g", "score", "id")
    val tk = udaf(new graft.pipeline.TopK(3), org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaDouble,
      org.apache.spark.sql.Encoders.scalaLong))
    val got = df.groupBy("g").agg(tk(col("score"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("g"), col("pos"), col("e._1").as("score"), col("e._2").as("id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toList
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .collect().map(r => (r.getString(0), r.getAs[Int]("rn") - 1,
        r.getDouble(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toList
    assert(got == want)
    // groups smaller than k emit all their rows
    val tiny = Seq(("g", 1.0, 1L)).toDF("g", "score", "id")
    assert(tiny.groupBy("g").agg(tk(col("score"), col("id")).as("t"))
      .select(size(col("t"))).head().getInt(0) == 1)
  }

  test("quotaSample: exact per-source counts, deterministic, a subset") {
    val implicits = spark.implicits
    import implicits._
    val d = (1L to 20L).map(i => (i, s"text $i", if (i <= 12) "s1" else "s2"))
      .toDF("doc_id", "text", "source")
    val got = graft.pipeline.Sketches.quotaSample(d, n = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // exact quota per source (s2 has 8 ≥ 5 docs too)
    assert(got.count(_._1 == "s1") == 5 && got.count(_._1 == "s2") == 5)
    // rn dense from 1 within each source; members are real doc ids
    assert(got.filter(_._1 == "s1").map(_._2).sorted.toSeq == (1L to 5L))
    assert(got.forall(t => t._3 >= 1L && t._3 <= 20L))
    // quota above the stratum size keeps the whole stratum
    assert(graft.pipeline.Sketches.quotaSample(d, n = 50).count() == 20L)
    // deterministic across runs
    val again = graft.pipeline.Sketches.quotaSample(d, n = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == got.toSeq)
  }

  test("sketch oracle precondition: testdata alphabets fit the capacities") {
    // q_heavy_hitters (k=64) and q_window_hh (k=16) compare against
    // EXACT DuckDB counts, which is only sound in the no-eviction
    // regime — if regenerated testdata ever exceeds these alphabets
    // the sketch silently becomes an order-dependent undercount, so
    // fail HERE with the violated precondition instead. Checked at
    // EVERY scale factor the harnesses run (the correctness gate runs
    // sf0.01, the bench sf0.1 — a guard pinned to sf0.001 alone would
    // miss regenerated data at the sizes that actually get compared).
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                    "/root/testdata/sf0.1")) {
      val docs = graft.graph.GraphBuilder.table(spark, dir, "documents")
      val vocab = graft.pipeline.Corpus.terms(docs).distinct().count()
      assert(vocab <= 64L,
        s"$dir: corpus vocabulary $vocab exceeds the q_heavy_hitters " +
          "capacity / q_term_pmi vocab prune (both 64)")
      // q_distinct_kmv (k=64) is exact only while every per-source
      // vocabulary fits the KMV capacity
      val maxPerSource = docs
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
        .groupBy("source").agg(countDistinct("term").as("n"))
        .agg(max("n")).head.getLong(0)
      assert(maxPerSource <= 64L,
        s"$dir: per-source vocabulary $maxPerSource exceeds q_distinct_kmv capacity 64")
      // q_len_quantiles (k=512) is exact only while every source's
      // distinct-length alphabet fits the StreamHist capacity
      val maxLenAlpha = docs.groupBy("source")
        .agg(countDistinct("n_chars").as("n")).agg(max("n")).head.getLong(0)
      assert(maxLenAlpha <= 512L,
        s"$dir: per-source distinct lengths $maxLenAlpha exceed q_len_quantiles capacity 512")
      val events = graft.streaming.EventStreams.eventsTable(spark, dir)
      val maxTypes = events
        .groupBy(date_trunc("hour", col("ts")))
        .agg(countDistinct(col("event_type")).as("n"))
        .agg(max("n")).head.getLong(0)
      assert(maxTypes <= 16L,
        s"$dir: per-hour event-type alphabet $maxTypes exceeds " +
          "q_window_hh / q_window_distinct capacity 16")
      // q_window_quantiles (k=512): distinct values per window are
      // bounded by the per-window row count
      val maxPerHour = events
        .groupBy(date_trunc("hour", col("ts")))
        .agg(count(lit(1)).as("n")).agg(max("n")).head.getLong(0)
      assert(maxPerHour <= 512L,
        s"$dir: per-hour event count $maxPerHour exceeds q_window_quantiles capacity 512")
    }
  }

  test("array_cosine zero-norm contract: 0.0 on a zero vector, null on null") {
    // documented Spark-vs-DuckDB divergence (DuckDB's list_cosine_
    // similarity divides by zero): the Spark-side contract — zero norm
    // on EITHER side yields 0.0 — is pinned here as a tested contract
    // rather than a footnote. Latent-only in the oracle queries because
    // the testdata has no zero embeddings.
    graft.sql.ArrayCosine.register(spark)
    val implicits = spark.implicits
    import implicits._
    val rows = Seq(
      (1L, Array(0f, 0f, 0f), Array(1f, 2f, 3f)),
      (2L, Array(1f, 2f, 3f), Array(0f, 0f, 0f)),
      (3L, Array(0f, 0f, 0f), Array(0f, 0f, 0f)),
      (4L, Array(1f, 2f, 3f), Array(1f, 2f, 3f)))
      .toDF("id", "a", "b")
      .selectExpr("id", "array_cosine(a, b) AS c")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(1L) == 0.0 && rows(2L) == 0.0 && rows(3L) == 0.0)
    assert(math.abs(rows(4L) - 1.0) < 1e-12)
    // null input propagates null (BinaryExpression null semantics),
    // distinct from the zero-vector 0.0
    val n = Seq((Option.empty[Array[Float]], Array(1f, 2f)))
      .toDF("a", "b").selectExpr("array_cosine(a, b) AS c").head
    assert(n.isNullAt(0))
  }

  test("sorted intersect count equals size(array_intersect) on set arrays") {
    graft.sql.ArraySortedIntersectCount.register(spark)
    val implicits = spark.implicits
    import implicits._
    val rnd = new scala.util.Random(17)
    val rows = (1 to 200).map { i =>
      def s() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted.toArray
      (i.toLong, s(), s())
    }
    val d = rows.toDF("id", "a", "b")
      .selectExpr("id", "array_sorted_intersect_count(a, b) AS fast",
        "CAST(size(array_intersect(a, b)) AS BIGINT) AS ref")
    assert(d.filter(col("fast") =!= col("ref")).count() == 0L)
    // empty arrays and null arrays behave like the built-in
    val edge = Seq((Array.empty[Long], Array(1L, 2L))).toDF("a", "b")
      .selectExpr("array_sorted_intersect_count(a, b) AS c").head
    assert(edge.getLong(0) == 0L)
    assert(spark.sql("SELECT array_sorted_intersect_count(CAST(NULL AS ARRAY<BIGINT>), array(1L))")
      .head.isNullAt(0))
    // the shingleArrays frames honor the sortedness contract
    val shs = Dedup.shingleArrays(docs(1L -> base, 2L -> (base + " tail")))
      .collect().map(_.getSeq[Long](1))
    shs.foreach(a => assert(a == a.sorted && a.distinct.length == a.length))
  }

  test("containment agrees with a driver reference on random corpora (all pairs)") {
    // end-to-end validation of the pairOverlap plan with the native
    // sorted-count: force ALL doc pairs as candidates and compare both
    // containment directions against driver-computed shingle sets
    val implicits = spark.implicits
    import implicits._
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    val rnd = new scala.util.Random(23)
    val alphabet = "abc "
    val corpus = (0L until 12L).map { id =>
      id -> Seq.fill(10 + rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    def shSet(t: String): Set[Long] =
      (1 to math.max(t.length - 4, 1)).map(i => h60("a:" + t.slice(i - 1, i - 1 + 5))).toSet
    val sets = corpus.toMap.view.mapValues(shSet).toMap
    val allPairs = (for (a <- 0L until 12L; b <- (a + 1) until 12L) yield (a, b))
      .toDF("a", "b")
    val d = corpus.toDF("doc_id", "text").withColumn("lang", lit("en"))
    val got = Dedup.containment(d, pairsIn = Some(allPairs))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Double]("c_ab"), r.getAs[Double]("c_ba")))).toMap
    assert(got.size == 66)
    got.foreach { case ((a, b), (cab, cba)) =>
      val common = (sets(a) intersect sets(b)).size.toDouble
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(cab == r6(common / sets(a).size), s"c_ab($a,$b)")
      assert(cba == r6(common / sets(b).size), s"c_ba($a,$b)")
    }
  }

  test("gopher rules: composite gate passes clean prose, rejects degenerate docs") {
    val good = "the quick brown fox jumps over a lazy dog and runs far away " +
      "of the woods tonight with many other simple clean words here now"   // 24 words
    val d = docs(
      1L -> good,
      2L -> ("spam spam spam spam spam spam spam spam spam spam spam spam " +
             "spam spam spam spam spam spam spam spam spam spam spam spam"), // top_frac 1.0
      3L -> "the a is and of too short",                                    // < minWords
      4L -> ("the a " + (1 to 22).map(i => s"x$i").mkString(" ")))          // digits → alpha_frac < 0.8
    val r = graft.pipeline.Corpus.gopherRules(d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Boolean]("keep"))
    assert(!r(2L).getAs[Boolean]("keep") && r(2L).getAs[Double]("top_frac") == 1.0)
    assert(!r(3L).getAs[Boolean]("keep") && r(3L).getAs[Long]("words") == 7L)
    assert(!r(4L).getAs[Boolean]("keep") && r(4L).getAs[Double]("alpha_frac") < 0.8)
    assert(r(1L).getAs[Double]("mean_word_len") >= 3.0)
    assert(r(1L).getAs[Long]("stop_hits") >= 2L)
  }

  test("countmin: upper bound, exactness without collisions, order-independence") {
    val implicits = spark.implicits
    import implicits._
    val rows = (1 to 400).map(i => s"t${i % 23}") // 23 distinct terms
    val d = docs(1L -> rows.mkString(" "))
    val got = graft.pipeline.Sketches.cmsTermCounts(d, d = 3, w = 1024, topN = 23)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 23)
    // est >= exact always; with 23 terms in 3×1024 buckets, no term
    // collides in every row — all estimates exact here
    assert(got.forall { case (_, exact, est) => est >= exact })
    assert(got.forall { case (_, exact, est) => est == exact })
    // order-independence: the counter matrix is a sum — reversed,
    // repartitioned input produces the identical probe table
    val d2 = spark.sparkContext.parallelize(rows.reverse, 13).toDF("t")
      .agg(concat_ws(" ", collect_list("t")).as("text"))
      .select(lit(1L).as("doc_id"), col("text"), lit("en").as("lang"))
    val got2 = graft.pipeline.Sketches.cmsTermCounts(d2, d = 3, w = 1024, topN = 23)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sortBy(_._1).toSeq == got2.sortBy(_._1).toSeq)
  }

  test("countmin reproduces collision overcounts deterministically") {
    val implicits = spark.implicits
    import implicits._
    // w=2 forces every term into 2 buckets per row: estimates are the
    // per-bucket sums — wildly over 'exact', but min over rows and
    // exactly reproducible (the property the SQL oracle replays)
    val d = docs(1L -> "a b c d a b")
    val got = graft.pipeline.Sketches.cmsTermCounts(d, d = 2, w = 2, topN = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.forall { case (_, exact, est) => est >= exact })
    assert(got.map(_._3).sum >= got.map(_._2).sum)
  }

  test("bloom: no false negatives; gate accepts a superset of exact decontam") {
    val implicits = spark.implicits
    import implicits._
    // doc_ids chosen so the ev: hash puts at least one doc in the eval
    // slice; every doc sharing an 8-gram with it MUST be flagged
    val d = (1L to 60L).map { i =>
      val txt = if (i % 3 == 0) base + s" shared tail marker $i"
                else s"unique payload number $i " + ("x" * 20)
      (i, txt)
    }
    val df = docs(d: _*)
    val exact = graft.pipeline.Corpus.decontaminate(df, 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = graft.pipeline.Bloom.bloomDecontaminate(df, 20,
        mBits = 1 << 16, k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no false negatives: every exactly-contaminated doc is flagged,
    // with at least as many accepted grams
    exact.foreach { case (id, n) =>
      assert(bloom.contains(id), s"bloom missed contaminated doc $id")
      assert(bloom(id) >= n, s"bloom undercounted doc $id")
    }
  }

  test("bloom mightContain: inserted keys always hit") {
    val implicits = spark.implicits
    import implicits._
    val keys = (1 to 200).map(i => s"key_$i")
    val m = 1 << 12; val k = 4
    val bl = udaf(new graft.pipeline.BloomAgg(m / 64, k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]())
    val filterRow = keys.toDF("key")
      .select(graft.pipeline.Bloom.positions(col("key"), k, m).as("ps"))
      .agg(bl(col("ps")).as("words"))
    val probes = (keys ++ (1 to 200).map(i => s"other_$i")).toDF("key")
    val got = probes.crossJoin(broadcast(filterRow))
      .select(col("key"),
        graft.pipeline.Bloom.mightContain(col("words"), col("key"), k, m)
          .as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(keys.forall(got(_)), "bloom false negative")
    // at 200 keys in 4096 bits the FP rate is ~0.2% — most non-keys miss
    val fps = (1 to 200).count(i => got(s"other_$i"))
    assert(fps < 20, s"implausible FP count $fps")
  }

  test("bigramNll: conditional probabilities from the corpus model") {
    val implicits = spark.implicits
    import implicits._
    // corpus: "a b" ×2 and "a c": c(a,b)=2, c(a,c)=1, c(a,·)=3
    val d = docs(1L -> "a b", 2L -> "a b", 3L -> "a c")
    val got = graft.pipeline.Corpus.bigramNll(d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
      .sortBy(_._1)
    val nllAB = math.rint(-math.log(2.0 / 3.0) * 1e6) / 1e6
    val nllAC = math.rint(-math.log(1.0 / 3.0) * 1e6) / 1e6
    assert(got == List((1L, 1L, nllAB), (2L, 1L, nllAB), (3L, 1L, nllAC)))
    // single-token docs contribute no bigram and no output row
    assert(graft.pipeline.Corpus.bigramNll(docs(9L -> "solo")).count() == 0)
  }

  test("kneserNeyNll: hand-computed interpolated KN probabilities") {
    val implicits = spark.implicits
    import implicits._
    // bigrams: doc1 (a,b)(b,a)(a,b), doc2 (a,c) →
    // cb(a,b)=2 cb(b,a)=1 cb(a,c)=1; cu(a)=3 n1(a)=2; cu(b)=1 n1(b)=1;
    // ncont(a)=ncont(b)=ncont(c)=1; types=3; d=0.75:
    // P(b|a)=(2-.75+.75*2/3)/3=7/12, P(a|b)=(1-.75+.75/3)/1=1/2,
    // P(c|a)=(1-.75+.75*2/3)/3=1/4
    val d = docs(1L -> "a b a b", 2L -> "a c")
    val got = graft.pipeline.Corpus.kneserNeyNll(d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val nll1 = math.rint(
      (-2 * math.log(7.0 / 12) - math.log(0.5)) / 3 * 1e6) / 1e6
    val nll2 = math.rint(-math.log(0.25) * 1e6) / 1e6
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - nll1) < 2e-6)
    assert(got(2L)._1 == 1L && math.abs(got(2L)._2 - nll2) < 2e-6)
    // discounted mass leaves headroom: P(b|a)+P(c|a) = 5/6 < 1
    // (the leftover 1/6 is the unseen-continuation reserve)
  }

  test("splitAssign: total, deterministic, growth-stable partition") {
    val implicits = spark.implicits
    import implicits._
    val d = docs((1L to 500L).map(i => i -> s"doc $i"): _*)
    val got = graft.pipeline.Corpus.splitAssign(d, 90, 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 500 && got.values.toSet.subsetOf(Set("train", "val", "test")))
    // roughly proportional (hash-uniform): train ≈ 450
    val n = got.values.count(_ == "train")
    assert(n > 400 && n < 500, s"train count $n")
    // growth stability: the first 100 docs keep their assignment when
    // 400 more arrive — membership is a pure function of doc_id
    val small = graft.pipeline.Corpus.splitAssign(
        docs((1L to 100L).map(i => i -> s"doc $i"): _*), 90, 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small.forall { case (id, s) => got(id) == s })
    // invalid percentages fail fast
    intercept[IllegalArgumentException] {
      graft.pipeline.Corpus.splitAssign(d, 80, 30)
    }
  }

  test("segment dedup keeps a doc's internal repeats when df < minDf") {
    // the same window twice WITHIN one doc is df=1 — kept both times,
    // in original positions (dedup is cross-document, not intra-doc)
    val d = docs(1L -> "a b c a b c x y z")
    val r = graft.pipeline.Corpus.segmentDedup(d, width = 3, minDf = 2).head
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getString(3) == "a b c a b c x y z")
  }

  test("bpeApply: rank-order merges, boundary chains merge to fixpoint") {
    // "ababab...": pair "ab" dominates ("ba" one fewer per word), so
    // merge 1 = "ab" — a 3-occurrence boundary-sharing chain that a
    // single replace pass would leave half-merged
    val d = docs(1L -> "ababab ababab ababab zz", 2L -> "ababab zz zz")
    // pair counts: ab 12, ba 8, zz 3 → merges (rank order) ab, ba, zz;
    // merge "ab" exhausts every "ba" site, merge "zz" still applies
    val r = graft.pipeline.Corpus.bpeApply(d, merges = 3).collect()
      .map(x => x.getString(0) -> (x.getString(1), x.getLong(2))).toMap
    assert(r("ababab") == ("ab ab ab", 3L), s"got $r")
    assert(r("zz") == ("zz", 1L), s"got $r")
  }

  test("unicodeAudit: decomposed accents and replacement chars flagged per source") {
    val implicits = spark.implicits
    import implicits._
    val d = Seq(
      (1L, "café menu", "src1"), // decomposed é → non-NFC, 1 char saved
      (2L, "café menu", "src1"),  // composed — NFC-clean
      (3L, "bad �� bytes", "src2"), // decode damage, NFC-clean
      (4L, "plain ascii", "src2")).toDF("doc_id", "text", "source")
    val r = graft.pipeline.TextOps.unicodeAudit(d).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getLong(5)))).toMap
    assert(r("src1") == ((2L, 1L, 1L, 0L, 0L)), s"got ${r("src1")}")
    assert(r("src2") == ((2L, 0L, 0L, 1L, 2L)), s"got ${r("src2")}")
    // engine parity on a NON-ASCII frame: graft_nfc must agree with
    // java.text.Normalizer directly (the expression under the audit)
    val got = d.select(call_function("graft_nfc", col("text"))).collect()
      .map(_.getString(0))
    val exp = d.select("text").collect().map(x =>
      java.text.Normalizer.normalize(x.getString(0),
        java.text.Normalizer.Form.NFC))
    assert(got.sameElements(exp))
  }

  test("dupSpans: maximal runs, boundary-straddling repeats, short docs") {
    // docs 1/2 share the 6-token substring "a b c d e f" which
    // STRADDLES every width-3 segment boundary — segmentDedup-style
    // fixed windows would miss it, stride-1 windows cannot
    val d = docs(
      1L -> "a b c d e f g h",
      2L -> "x a b c d e f y",
      3L -> "p q r",
      4L -> "z z")
    val r = graft.pipeline.Corpus.dupSpans(d, width = 3, minDf = 2)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getLong(5), x.getDouble(6)))).toMap
    // doc 1: dup positions 0..3 (windows abc bcd cde def), one run
    // covering tokens 0..5 = 6 of 8
    assert(r(1L) == ((8L, 6L, 4L, 1L, 6L, 0.75)), s"got ${r(1L)}")
    assert(r(2L) == ((8L, 6L, 4L, 1L, 6L, 0.75)), s"got ${r(2L)}")
    assert(r(3L) == ((3L, 1L, 0L, 0L, 0L, 0.0)), s"got ${r(3L)}")
    // shorter than one window: zero positions, kept with zeros
    assert(r(4L) == ((2L, 0L, 0L, 0L, 0L, 0.0)), s"got ${r(4L)}")
  }

  test("dupSpans: overlapping run coverages merge into one span") {
    // doc 8's dup positions 0 and 2 (window 1 unique): coverages 0-2
    // and 2-4 overlap -> ONE merged span of 5 tokens
    val d = docs(
      8L -> "a1 a2 a3 a4 a5",
      9L -> "a1 a2 a3",
      10L -> "a3 a4 a5")
    val r = graft.pipeline.Corpus.dupSpans(d, width = 3, minDf = 2)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(3), x.getLong(4), x.getLong(5), x.getDouble(6)))).toMap
    assert(r(8L) == ((2L, 1L, 5L, 1.0)), s"got ${r(8L)}")
    assert(r(9L) == ((1L, 1L, 3L, 1.0)), s"got ${r(9L)}")
    // disjoint coverages stay separate spans
    val d2 = docs(5L -> "s t u W1 W2 s t u", 6L -> "s t u")
    val r2 = graft.pipeline.Corpus.dupSpans(d2, width = 3, minDf = 2)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    assert(r2(5L) == ((2L, 2L, 6L)), s"got ${r2(5L)}")
  }

  test("stripDupSpans removes exactly the covered tokens, order kept") {
    val d = docs(
      1L -> "a b c d e f g h",
      2L -> "x a b c d e f y",
      3L -> "p q r")
    val r = graft.pipeline.Corpus.stripDupSpans(d, width = 3, minDf = 2)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    // doc 1: tokens 0..5 covered → "g h" survives; doc 2: 1..6 covered
    assert(r(1L) == ((8L, 6L, "g h")), s"got ${r(1L)}")
    assert(r(2L) == ((8L, 6L, "x y")), s"got ${r(2L)}")
    assert(r(3L) == ((3L, 0L, "p q r")), s"got ${r(3L)}")
    // an all-duplicated doc strips to ""
    val d2 = docs(5L -> "s t u", 6L -> "s t u")
    val r2 = graft.pipeline.Corpus.stripDupSpans(d2, width = 3, minDf = 2)
      .collect().map(x => x.getLong(0) -> x.getString(3)).toMap
    assert(r2(5L) == "" && r2(6L) == "")
  }

  test("stripDupSpans: many disjoint spans per doc (binary-search containment)") {
    // one doc with MANY separated duplicated spans — the worst case the
    // sorted-span-array rewrite exists for (the old doc_id-equi-join
    // shape replicated every token row once per span); each span "s<i>
    // t<i> u<i>" is width-3-duplicated via a partner doc, separated by
    // unique fillers so coverages never merge
    val n = 40
    val body = (0 until n).map(i => s"s$i t$i u$i F$i G$i").mkString(" ")
    val partners = (0 until n).map(i => (100L + i) -> s"s$i t$i u$i")
    val d = docs(((1L -> body) +: partners): _*)
    val r = graft.pipeline.Corpus.stripDupSpans(d, width = 3, minDf = 2)
      .filter(col("doc_id") === 1L).collect().head
    assert(r.getLong(1) == 5L * n, s"n_tokens ${r.getLong(1)}")
    assert(r.getLong(2) == 3L * n, s"dup_tokens ${r.getLong(2)}")
    assert(r.getString(3) ==
      (0 until n).map(i => s"F$i G$i").mkString(" "), s"got ${r.getString(3)}")
    // report/strip parity: dupSpans sees the same n spans + coverage
    val rep = graft.pipeline.Corpus.dupSpans(d, width = 3, minDf = 2)
      .filter(col("doc_id") === 1L).collect().head
    assert(rep.getLong(4) == n.toLong && rep.getLong(5) == 3L * n,
      s"n_spans ${rep.getLong(4)} dup_tokens ${rep.getLong(5)}")
  }

  test("sorted_ranges_contain: seeded random disjoint ranges == naive linear scan") {
    graft.sql.SortedRangesContain.register(spark)
    val rnd = new scala.util.Random(1405L)
    // 60 random disjoint sorted range sets (incl. empty and singleton),
    // each probed at every position 0..60 — binary search must agree
    // with the naive any-range containment everywhere
    val cases = (0 until 60).map { i =>
      val n = rnd.nextInt(6) // 0..5 ranges
      var cursor = 0L
      val ranges = (0 until n).map { _ =>
        val c0 = cursor + 1 + rnd.nextInt(4)
        val c1 = c0 + rnd.nextInt(5)
        cursor = c1 + 1 // +1 gap keeps them disjoint and non-adjacent-safe
        (c0, c1)
      }
      (i.toLong, ranges.map(_._1).toArray, ranges.map(_._2).toArray)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map { case (id, c0s, c1s) =>
        org.apache.spark.sql.Row(id, c0s.toSeq, c1s.toSeq)
      }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("c0s",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)),
        org.apache.spark.sql.types.StructField("c1s",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)))))
    val got = df
      .select(col("id"), explode(sequence(lit(0L), lit(60L))).as("pos"),
        col("c0s"), col("c1s"))
      .select(col("id"), col("pos"),
        call_function("sorted_ranges_contain",
          col("c0s"), col("c1s"), col("pos")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    for ((id, c0s, c1s) <- cases; pos <- 0L to 60L) {
      val naive = c0s.indices.exists(j => c0s(j) <= pos && pos <= c1s(j))
      assert(got((id, pos)) == naive,
        s"case $id pos $pos: got ${got((id, pos))}, naive $naive " +
          s"(${c0s.mkString(",")} / ${c1s.mkString(",")})")
    }
  }

  test("dupSpans/stripDupSpans parity on a seeded random corpus") {
    // report and strip must agree per doc: same n_tokens, same
    // dup_tokens, and the surviving text is exactly the uncovered
    // token count — on a corpus of random small-vocab docs (heavy
    // incidental repetition ⇒ many overlapping runs to merge)
    val rnd = new scala.util.Random(1414L)
    val vocab = Vector("a", "b", "c", "d")
    val d = docs((1L to 30L).map { id =>
      val len = 5 + rnd.nextInt(30)
      id -> (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }: _*)
    val rep = graft.pipeline.Corpus.dupSpans(d, width = 3, minDf = 2)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(5)))).toMap
    val str = graft.pipeline.Corpus.stripDupSpans(d, width = 3, minDf = 2)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(rep.keySet == str.keySet)
    for ((id, (nTok, dupTok)) <- rep) {
      val (sTok, sDup, clean) = str(id)
      assert(sTok == nTok, s"doc $id n_tokens: strip $sTok vs report $nTok")
      assert(sDup == dupTok, s"doc $id dup_tokens: strip $sDup vs report $dupTok")
      val survivors = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(survivors == nTok - dupTok,
        s"doc $id survivors $survivors != ${nTok - dupTok}")
    }
  }

  test("sorted_ranges_contain: boundaries, gaps, nulls, binary-search parity") {
    graft.sql.SortedRangesContain.register(spark)
    val rows = spark.sql(
      """SELECT pos, sorted_ranges_contain(array(2L, 10L, 20L),
        |                                  array(4L, 10L, 25L), pos) AS c
        |FROM VALUES (0L),(1L),(2L),(3L),(4L),(5L),(9L),(10L),(11L),
        |            (19L),(20L),(25L),(26L) AS t(pos)""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val exp = Map(0L -> false, 1L -> false, 2L -> true, 3L -> true,
      4L -> true, 5L -> false, 9L -> false, 10L -> true, 11L -> false,
      19L -> false, 20L -> true, 25L -> true, 26L -> false)
    assert(rows == exp, s"got $rows")
    // empty range set: nothing contained; null input: null out
    val e = spark.sql(
      """SELECT sorted_ranges_contain(CAST(array() AS array<bigint>),
        |                             CAST(array() AS array<bigint>), 5L),
        |       sorted_ranges_contain(CAST(NULL AS array<bigint>), array(1L), 5L)
        |""".stripMargin).collect().head
    assert(!e.getBoolean(0) && e.isNullAt(1))
  }

  test("bpeTrain: later merges operate on merged symbols (iterated, not first-round)") {
    val d = docs(1L -> "abab abab abab")
    // round 1 over ' a b a b ': 'a b' 6 (2/word ×3) beats 'b a' 3;
    // round 2 over ' ab ab ': the pair ('ab','ab') EXISTS ONLY after
    // round 1 merged it — bpeApply's first-round table can never pick it
    val t = graft.pipeline.Corpus.bpeTrain(d, merges = 2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3))))
      .toMap
    assert(t(1L) == (("a", "b", 6L)), s"got $t")
    assert(t(2L) == (("ab", "ab", 3L)), s"got $t")
    val seg = graft.pipeline.Corpus.bpeTrainSegments(d, merges = 2).collect()
    assert(seg.length == 1 && seg(0).getString(1) == "abab"
      && seg(0).getLong(2) == 1L)
  }

  test("bpeTrain stops early when every word is fully merged") {
    val d = docs(1L -> "aa aa")
    val t = graft.pipeline.Corpus.bpeTrain(d, merges = 5).collect()
    assert(t.length == 1
      && t(0).getString(1) == "a" && t(0).getString(2) == "a"
      && t(0).getLong(3) == 2L)
  }

  test("jlProject: linear in the input, outDims rows per vector") {
    val implicits = spark.implicits
    import implicits._
    val emb = Seq(
      (1L, Array(1.0f, 2.0f, 0.5f)),
      (2L, Array(2.0f, 4.0f, 1.0f))).toDF("vec_id", "embedding")
    val p = graft.pipeline.Similarity.jlProject(emb, outDims = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(p.keys.count(_._1 == 1L) == 4 && p.size == 8)
    // vec 2 = 2 · vec 1 → every projection doubles (projection is linear)
    (0L until 4L).foreach { j =>
      assert(math.abs(p((2L, j)) - 2 * p((1L, j))) < 1e-3,
        s"j=$j: ${p((2L, j))} vs 2*${p((1L, j))}")
    }
  }

  test("invertedIndex: df and tf-ranked postings, cap applies") {
    val d = docs(1L -> "a a b", 2L -> "a c")
    val ix = graft.pipeline.Corpus.invertedIndex(d).collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    // term a: df 2, rank 1 = (doc 1, tf 2), rank 2 = (doc 2, tf 1)
    assert(ix(("a", 1L)) == ((2L, 1L, 2L)) && ix(("a", 2L)) == ((2L, 2L, 1L)))
    assert(ix(("b", 1L)) == ((1L, 1L, 1L)) && ix(("c", 1L)) == ((1L, 2L, 1L)))
    assert(graft.pipeline.Corpus.invertedIndex(d, maxPostings = 1)
      .count() == 3L) // one posting per term under the cap
  }

  test("tokenFertility: occurrence-weighted subtokens per word by source") {
    val implicits = spark.implicits
    import implicits._
    // pair ranks: ab 12, ba 8, zz 2 → with 3 merges "ababab" → 3
    // tokens (ab ab ab), "zz" → 1, "q" → 1
    val d = Seq(
      (1L, "ababab ababab zz q", "en", "web"),
      (2L, "ababab ababab zz", "en", "books"))
      .toDF("doc_id", "text", "lang", "source")
    val f = graft.pipeline.Corpus.tokenFertility(d, merges = 3).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // web: words 4 → 3+3+1+1 = 8 subtokens; books: 3 → 3+3+1 = 7
    assert(f("web") == ((4L, 8L, 2.0)), s"got $f")
    assert(f("books") == ((3L, 7L, math.rint(7.0 / 3.0 * 1e6) / 1e6)))
  }

  test("contamScore: eval-identical train doc scores 1, disjoint doc 0") {
    val implicits = spark.implicits
    import implicits._
    // membership is a pure hash of doc_id — recompute it here so the
    // assertions track the split instead of assuming one
    val shared = "the exact same contaminated sentence appears here"
    val ids = (1L to 12L)
    // unique docs repeat an id-tagged trigram: every 8-char window spans
    // a full id group, so no two of them share ANY 8-gram
    val d = ids.map(i => (i, if (i <= 8) shared else s"u${i}x" * 8))
      .toDF("doc_id", "text")
    val evalIds = d.filter(
        pmod(TextOps.hash60(col("doc_id").cast("string"), "ev:"), lit(100L)) < 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sharedEval = ids.filter(i => i <= 8 && evalIds(i))
    assume(sharedEval.nonEmpty, "hash split put no shared doc in eval")
    val sc = graft.pipeline.Corpus.contamScore(d, evalPct = 50).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getAs[Double]("frac"))).toMap
    // every TRAIN doc present, no eval doc present
    assert(sc.keySet == ids.toSet -- evalIds)
    sc.foreach { case (_, (ng, nh, f)) =>
      assert(ng > 0 && nh >= 0 && nh <= ng && f >= 0.0 && f <= 1.0) }
    ids.filterNot(evalIds).foreach { i =>
      if (i <= 8) assert(sc(i)._3 == 1.0, s"doc $i shares ALL grams with eval")
      else assert(sc(i)._3 == 0.0, s"doc $i shares nothing with eval")
    }
  }

  test("dsirWeights: target-like raw doc outranks target-unlike one") {
    val implicits = spark.implicits
    import implicits._
    val tgtText = "alpha beta gamma delta alpha beta gamma delta alpha beta"
    val d = Seq(
      (1L, tgtText, "en"), (2L, tgtText, "en"), (3L, tgtText, "en"),
      // doc 10: pure target vocabulary; doc 11: disjoint vocabulary
      (10L, "alpha beta gamma delta alpha beta", "de"),
      (11L, "omega sigma tau rho omega sigma", "de")).toDF("doc_id", "text", "lang")
    val w = graft.pipeline.Corpus.dsirWeights(d, targetLang = "en", dim = 64, k = 10)
      .collect().map(r => r.getLong(1) -> (r.getLong(0), r.getAs[Double]("logw"))).toMap
    assert(w(10L)._2 > w(11L)._2, s"target-vocab doc must outrank: $w")
    // ranks are 1..n, descending in the rounded weight with id tiebreak
    val byRank = w.values.toSeq.sortBy(_._1)
    assert(byRank.map(_._1) == (1L to w.size))
    assert(byRank.map(_._2).sliding(2).forall(p => p.head >= p.last))
  }

  test("semDedup: within-cluster dup dropped, cross-cluster twin kept") {
    val implicits = spark.implicits
    import implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0), // dup pair in cluster 0
      (3L, Array(0.0f, 1.0f), 0),                             // distinct in cluster 0
      (4L, Array(1.0f, 0.0f), 1)                              // twin of 1 but other cluster
    ).toDF("vec_id", "embedding", "label")
    val r = graft.pipeline.Similarity.semDedup(emb, minCosine = 0.9).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) == (1L, 1L))   // representative keeps itself
    assert(r(2L) == (1L, 0L))   // near-dup of 1 → dropped
    assert(r(3L) == (3L, 1L))   // singleton kept
    assert(r(4L) == (4L, 1L))   // same direction, different cluster → kept
  }

  test("fuzzyMatch: word-blocked pairs within edit distance, cap kills hot blocks") {
    val implicits = spark.implicits
    import implicits._
    val n = Seq("red bolt", "red bolt!", "red colt", "blue gear", "red bolt")
      .toDF("p_name")
    val m = graft.pipeline.Dedup.fuzzyMatch(n, "p_name", maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("red bolt", "red bolt!")) == 1L)
    assert(m(("red bolt", "red colt")) == 1L)
    assert(m(("red bolt!", "red colt")) == 2L)
    // "blue gear" shares no block token with anything → never a candidate
    assert(!m.keySet.exists(p => p._1.contains("gear") || p._2.contains("gear")))
    // a df cap of 1 drops the shared "red" block (and "bolt") entirely
    assert(graft.pipeline.Dedup.fuzzyMatch(n, "p_name", maxDist = 3, maxDf = 1)
      .count() == 0L)
  }

  test("lexicalDiversity: TTR and Guiraud R from exact type/token counts") {
    val d = docs(1L -> "a a b c", 2L -> "x x x x")
    val got = TextOps.lexicalDiversity(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((4L, 3L, 0.75, 1.5)))   // 3/√4 = 1.5
    assert(got(2L) == ((4L, 1L, 0.25, 0.5)))   // degenerate repetition
  }

  test("piiDensity: per-source hit rollup over real matches") {
    val implicits = spark.implicits
    import implicits._
    val textA = "contact bob@example.com or 555-123-4567 now"
    val d = Seq((1L, "a", textA), (2L, "a", "clean text"),
      (3L, "b", "also clean")).toDF("doc_id", "source", "text")
    val got = graft.pipeline.Corpus.piiDensity(d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val chars = textA.length + "clean text".length
    val perK = math.rint(2 * 1000.0 / chars * 1e6) / 1e6
    assert(got("a") == ((2L, 1L, 2L, perK)))  // email + phone in doc 1
    assert(got("b") == ((1L, 0L, 0L, 0.0)))
  }

  test("minhashAudit: identical docs estimate 1.0 with zero error") {
    val d = docs(1L -> base, 2L -> base, 3L -> (base + " extra tail words"),
      4L -> "totally different content about spark shuffles and executors")
    val got = Dedup.minhashAudit(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Double]("jaccard"), r.getAs[Double]("est"),
          r.getAs[Double]("abs_err"))).toMap
    val (j12, e12, err12) = got((1L, 2L))
    assert(j12 == 1.0 && e12 == 1.0 && err12 == 0.0)
    // near-dup pair: both scores in (0,1], error bounded by 1
    got.values.foreach { case (j, e, err) =>
      assert(j >= 0 && j <= 1 && e >= 0 && e <= 1 && err >= 0 && err <= 1)
      assert(math.abs(err - math.abs(e - j)) < 1e-9)
    }
  }

  test("noveltyScore: copied docs share all grams; unique doc fully novel") {
    val other = "wholly distinct text with none of those other tokens anywhere around here"
    val d = docs(1L -> base, 2L -> base, 3L -> other)
    val got = Dedup.noveltyScore(d).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_grams"), r.getAs[Double]("dup_frac"),
          r.getAs[Double]("novelty"))).toMap
    assert(got(1L)._2 == 1.0 && got(2L)._2 == 1.0) // every gram duplicated
    assert(got(1L)._3 == 0.5 && got(2L)._3 == 0.5) // mean 1/df with df=2
    assert(got(3L)._2 == 0.0 && got(3L)._3 == 1.0) // fully novel
    assert(got(1L)._1 == got(2L)._1 && got(1L)._1 > 0)
  }

  test("dupInflation: per-source docs / unique fingerprints ratio") {
    val implicits = spark.implicits
    import implicits._
    val d = Seq((1L, "a", "same text"), (2L, "a", "same text"),
      (3L, "a", "other text"), (4L, "b", "solo"))
      .toDF("doc_id", "source", "text")
    val got = graft.pipeline.Corpus.dupInflation(d, col("text")).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_unique"),
          r.getAs[Double]("inflation"))).toMap
    assert(got("a") == ((3L, 2L, 1.5)))
    assert(got("b") == ((1L, 1L, 1.0)))
  }

  test("canonicalDedup keeps the best-quality member, min id on ties") {
    val implicits = spark.implicits
    import implicits._
    // docs 1/2/3 share a key; doc 2 has no punctuation → higher quality.
    // docs 4/5 share a key with IDENTICAL text → quality tie → min id.
    val d = Seq(
      (1L, "k1", "the fox is quick !!! ??? ;;; ###"),
      (2L, "k1", "the fox is quick and the dog is lazy"),
      (3L, "k1", "the fox is quick %%% &&& @@@ $$$"),
      (4L, "k2", "a plain tie sentence"),
      (5L, "k2", "a plain tie sentence"),
      (6L, "k3", "unique doc never grouped"))
      .toDF("doc_id", "key", "text")
    val got = Dedup.canonicalDedup(d, col("key")).collect()
      .map(r => r.getAs[Long]("canonical_id") ->
        (r.getAs[Long]("n_members"), r.getAs[Double]("best_quality"),
          r.getAs[Double]("worst_quality"))).toMap
    assert(got.keySet == Set(2L, 4L)) // best quality in k1; min-id tie in k2
    assert(got(2L)._1 == 3L && got(2L)._2 > got(2L)._3)
    assert(got(4L)._1 == 2L && got(4L)._2 == got(4L)._3)
  }

  test("temperatureMix: alpha=0.5 flattens shares; epochs hit the budget") {
    val implicits = spark.implicits
    import implicits._
    // 4 docs in a, 1 in b → sqrt weights 2:1
    val d = (1L to 4L).map(i => (i, "a", "x")).toDF("doc_id", "source", "text")
      .unionByName(Seq((5L, "b", "x")).toDF("doc_id", "source", "text"))
    val m = graft.pipeline.Corpus.temperatureMix(d, 0.5, 10L).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("a").getAs[Long]("n_docs") == 4L)
    assert(math.abs(m("a").getAs[Double]("nat_share") - 0.8) < 1e-9)
    assert(math.abs(m("a").getAs[Double]("temp_share") - 2.0 / 3) < 1e-6)
    assert(math.abs(m("b").getAs[Double]("temp_share") - 1.0 / 3) < 1e-6)
    // low-resource source upsampled, boost > 1; epochs = budget·p/n
    assert(m("b").getAs[Double]("boost") > 1.0 && m("a").getAs[Double]("boost") < 1.0)
    assert(math.abs(m("b").getAs[Double]("epochs") - 10.0 / 3) < 1e-6)
    // expected sample sizes sum to the budget
    val tot = m.values.map(r => r.getAs[Double]("epochs") * r.getAs[Long]("n_docs")).sum
    assert(math.abs(tot - 10.0) < 1e-5)
  }

  test("editMatch: one-word-off names link within the block, far names do not") {
    val implicits = spark.implicits
    import implicits._
    val names = Seq("alpha beta", "alpha betx", "alpha omega zz")
      .map(Tuple1(_)).toDF("p_name")
    val r = Dedup.editMatch(names, "p_name", maxDist = 4)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    assert(r.toSet == Set(("alpha beta", "alpha betx", 1L)))
  }

  test("phraseStats: a dominant adjacent bigram ranks first with the word2vec score") {
    val implicits = spark.implicits
    import implicits._
    // "new york" appears 6x; filler tokens keep unigram counts known:
    // c(new)=6, c(york)=6, c_ab=6, N=18 -> score=(6-5)*18/36=0.5
    val docs = Seq.tabulate(6)(i =>
        (i.toLong, "new york w" + i, "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val r = graft.pipeline.Corpus.phraseStats(docs, minCount = 5L).collect()
    assert(r.length == 1)
    assert((r(0).getString(0), r(0).getString(1)) == (("new", "york")))
    assert(r(0).getAs[Long]("c_ab") == 6L)
    assert(r(0).getAs[Double]("score") == 0.5)
  }

  test("stopwordProfile: hand-computed ratio") {
    val implicits = spark.implicits
    import implicits._
    // 4 tokens, 2 stopwords (the, of), 2 distinct stopwords
    val docs = Seq((1L, "the cat of doom", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val r = graft.pipeline.Corpus.stopwordProfile(docs).collect()(0)
    assert(r.getAs[Long]("n_toks") == 4L && r.getAs[Long]("n_stop") == 2L)
    assert(r.getAs[Double]("stop_ratio") == 0.5)
    assert(r.getAs[Long]("n_distinct_stop") == 2L)
  }

  test("silhouetteExact: two tight separated clusters land all mass in bucket 9") {
    val implicits = spark.implicits
    import implicits._
    // vectors 10..11 seed the 2 centroids; members sit exactly on them
    val emb = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array(base, base, base, base))
    }.toDF("vec_id", "embedding")
    val r = Similarity.silhouetteExact(emb, k = 2, iters = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // every vector coincides with its centroid: a2=0 -> s=1 -> bucket 9
    assert(r.forall(_._2 == 9L), r.mkString(", "))
    assert(r.map(_._3).sum == 20L)
  }

  test("bandingCurve: identical docs verify at every tiling with recall 1") {
    val implicits = spark.implicits
    import implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 3
    val docs = Seq(
      (1L, base, "en", "s0"), (2L, base, "en", "s0"),
      (3L, "completely different text about spark shuffles and joins zz",
        "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val r = Dedup.bandingCurve(docs).collect()
    assert(r.length == 3)
    r.foreach { x =>
      assert(x.getAs[Long]("verified") >= 1L)
      assert(x.getAs[Double]("recall") == 1.0 ||
        x.getAs[Long]("n_truth") > x.getAs[Long]("verified"))
    }
    // the identical pair must be truth everywhere -> n_truth >= 1
    assert(r.forall(_.getAs[Long]("n_truth") >= 1L))
  }

  test("kAnonymity: hand-built classes expose singletons") {
    val implicits = spark.implicits
    import implicits._
    // class (en,s0,0): 3 docs; class (de,s1,0): 1 doc (exposed at all k)
    val docs = Seq(
      (1L, "aa", "en", "s0"), (2L, "ab", "en", "s0"), (3L, "ac", "en", "s0"),
      (4L, "zz", "de", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("int"))
    val r = graft.pipeline.Corpus.kAnonymity(docs).collect()
      .map(x => x.getAs[Long]("k") -> x).toMap
    assert(r(2L).getAs[Long]("n_classes") == 2L)
    assert(r(2L).getAs[Long]("exposed") == 1L)   // the singleton
    assert(r(5L).getAs[Long]("exposed") == 4L)   // both classes < 5
    assert(r(2L).getAs[Double]("exposed_rate") == 0.25)
  }

  test("dpHistogram: noise equals the Laplace quantile of the salted hash, deterministic") {
    val implicits = spark.implicits
    import implicits._
    val docs = Seq((1L, "x", "en", "s0"), (2L, "y", "en", "s0"),
      (3L, "z", "en", "s1")).toDF("doc_id", "text", "lang", "source")
    val r1 = graft.pipeline.Corpus.dpHistogram(docs).collect()
      .map(x => x.getString(0) -> x.getAs[Double]("noised")).toMap
    // recompute expected noise from the same hash
    val hs = docs.select(col("source"),
        TextOps.hash60(col("source"), "dp:").as("h"))
      .distinct().collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    def expected(src: String, n: Long): Double = {
      val u = hs(src).toDouble / (1L << 60).toDouble
      val d = u - 0.5
      val noise = if (d >= 0) -math.log(1.0 - 2.0 * d)
        else math.log(1.0 + 2.0 * d)
      BigDecimal(n + noise).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    assert(r1("s0") == expected("s0", 2L))
    assert(r1("s1") == expected("s1", 1L))
    // determinism: second run identical
    val r2 = graft.pipeline.Corpus.dpHistogram(docs).collect()
      .map(x => x.getString(0) -> x.getAs[Double]("noised")).toMap
    assert(r1 == r2)
  }

  test("dpMean: clipping binds, noise is the salted Laplace draw, huge epsilon recovers the mean") {
    val implicits = spark.implicits
    import implicits._
    // n_chars: s0 -> {3, 10}, s1 -> {4}; clip 5 truncates the 10
    val docs = Seq((1L, "abc", "en", "s0"), (2L, "y" * 10, "en", "s0"),
      (3L, "wxyz", "en", "s1")).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("int"))
    // epsilon huge -> noise ~ 1e-9: dp_mean == clipped mean at 6dp
    val big = graft.pipeline.Corpus.dpMean(docs, clip = 5.0,
      epsilon = 1e9).collect()
      .map(x => x.getString(0) -> x.getAs[Double]("dp_mean")).toMap
    assert(math.abs(big("s0") - 4.0) < 1e-5) // (3 + 5)/2
    assert(math.abs(big("s1") - 4.0) < 1e-5)
    // epsilon 1: replay the exact salted draws
    val r = graft.pipeline.Corpus.dpMean(docs, clip = 5.0).collect()
      .map(x => x.getString(0) -> x).toMap
    def lap(src: String, saltN: String, scale: Double): Double = {
      val h = docs.where(col("source") === src)
        .select(TextOps.hash60(col("source"), saltN).as("h"))
        .head.getLong(0)
      val d = (h.toDouble + 0.5) / (1L << 60).toDouble - 0.5
      (if (d >= 0) -math.log(1.0 - 2.0 * d)
       else math.log(1.0 + 2.0 * d)) * scale
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dpn = 2.0 + lap("s0", "dpm:n:", 2.0)
    val dps = 8.0 + lap("s0", "dpm:s:", 10.0)
    assert(r("s0").getAs[Double]("dp_count") == r6(dpn))
    assert(r("s0").getAs[Double]("dp_sum") == r6(dps))
    assert(r("s0").getAs[Double]("dp_mean") == r6(dps / math.max(dpn, 1.0)))
    // determinism
    val again = graft.pipeline.Corpus.dpMean(docs, clip = 5.0).collect()
      .map(x => x.getString(0) -> x.getAs[Double]("dp_mean")).toMap
    assert(again("s0") == r("s0").getAs[Double]("dp_mean"))
  }

  test("simhashCurve: identical docs are candidates at hamming 0 and verify; recall 1 at t=3") {
    val implicits = spark.implicits
    import implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 3
    val docs = Seq((1L, base, "en", "s0"), (2L, base, "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val r = Dedup.simhashCurve(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2),
        x.getAs[Double]("recall"))).toMap
    assert(r(0L) == ((1L, 1L, 1.0)))   // hamming 0: the identical pair
    assert(r(3L)._2 == 1L && r(3L)._3 == 1.0)
  }

  test("jaccardSweep: an identical pair clears every threshold, a disjoint one none") {
    val implicits = spark.implicits
    import implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta " * 2
    val docs = Seq((1L, a, "en", "s0"), (2L, a, "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val r = Dedup.jaccardSweep(docs, pairsIn = Some(pairs)).collect()
    assert(r.length == 9)
    r.foreach { x =>
      assert(x.getAs[Long]("candidates") == 1L)
      assert(x.getAs[Long]("pairs_ge") == 1L)   // jaccard = 1 clears all
      assert(x.getAs[Double]("share") == 1.0)
    }
  }

  test("skyline: hand-built frontier keeps non-dominated docs, strict-edge rule") {
    val implicits = spark.implicits
    import implicits._
    // hand-computed qualities (0.4 len-term + 0.3 punct-term + 0.3
    // stopword-term): doc1 "a b" -> q=0.608, len 3; doc2 "aa bb" ->
    // q=0.308, len 5 (dominated by doc1: lower q, longer); doc3 has
    // six stopwords -> q=0.628 > doc1 but len 16: a true tradeoff,
    // both 1 and 3 are on the frontier
    val docs = Seq(
      (1L, "a b", "en", "s0"),
      (2L, "aa bb", "en", "s0"),
      (3L, "a a a a is the x", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("int"))
    val ids = graft.pipeline.Corpus.skyline(docs).collect()
      .map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L), ids.toString)
  }

  test("anisotropy: identical vectors give 1, mirrored vectors give 0") {
    val implicits = spark.implicits
    import implicits._
    val same = (0 until 8).map(i => (i.toLong, Array(0.5f, 0.25f, 0.125f)))
      .toDF("vec_id", "embedding")
    val r1 = Similarity.anisotropy(same).collect()(0)
    assert(r1.getAs[Double]("anisotropy") == 1.0)
    // half the vectors exactly negate the other half -> mean is 0
    val anti = (0 until 8).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array(0.5f * s, 0.25f * s, 0.125f * s))
    }.toDF("vec_id", "embedding")
    val r2 = Similarity.anisotropy(anti).collect()(0)
    assert(r2.getAs[Double]("anisotropy") <= 0.00001,
      r2.getAs[Double]("anisotropy").toString)
  }
}

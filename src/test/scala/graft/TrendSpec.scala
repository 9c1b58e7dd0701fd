package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.Trend

/** Trend statistics vs brute-force local recomputation on seeded
  * random and hand-built daily series. */
class TrendSpec extends SparkSpec {

  /** One event per (day, i) — builds an events frame whose daily
    * series equals `counts` (day 0 = 2024-01-01). */
  private lazy val testImplicits = spark.implicits

  private def eventsFromCounts(counts: Seq[Int]): DataFrame = {
    import testImplicits._
    val rows = for {
      (c, d) <- counts.zipWithIndex
      i <- 0 until c
    } yield (d.toLong * 1000 + i, d, i)
    rows.toDF("event_id", "d", "i")
      .select(col("event_id"),
        timestamp_seconds(lit(1704110400L) + col("d") * 86400L).as("ts"),
        col("i").cast("long").as("user_id"),
        lit("click").as("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
  }

  private def bruteMannKendall(c: Seq[Int]): (Long, Double) = {
    val n = c.length
    var s = 0L
    for (i <- 0 until n; j <- i + 1 until n)
      s += java.lang.Integer.signum(c(j) - c(i))
    val tieVar = c.groupBy(identity).values.map(_.size.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val varS = (n.toDouble * (n - 1) * (2 * n + 5) - tieVar) / 18.0
    val z =
      if (varS <= 0) Double.NaN
      else if (s > 0) (s - 1.0) / math.sqrt(varS)
      else if (s < 0) (s + 1.0) / math.sqrt(varS)
      else 0.0
    (s, z)
  }

  test("mannKendall matches brute force on seeded random series") {
    val rnd = new scala.util.Random(7)
    val counts = Seq.fill(25)(rnd.nextInt(8))
    val r = Trend.mannKendall(eventsFromCounts(counts)).collect()(0)
    val (s, z) = bruteMannKendall(counts)
    assert(r.getAs[Long]("n_days") == 25L)
    assert(r.getAs[Long]("s") == s)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-5)
  }

  test("mannKendall: strictly increasing series has S = n(n-1)/2, tau_b = 1") {
    val counts = (1 to 10).toSeq
    val r = Trend.mannKendall(eventsFromCounts(counts)).collect()(0)
    assert(r.getAs[Long]("s") == 45L)
    assert(r.getAs[Double]("tau_b") == 1.0)
  }

  test("theilSen recovers an exact linear trend's slope") {
    // c_d = 3 + 2d → every pairwise slope is exactly 2
    val counts = (0 until 12).map(d => 3 + 2 * d)
    val r = Trend.theilSen(eventsFromCounts(counts)).collect()(0)
    assert(r.getAs[Long]("n_pairs") == 66L)
    assert(r.getAs[Double]("slope") == 2.0)
  }

  test("theilSen median vs brute force on random series (even and odd pair counts)") {
    for (n <- Seq(8, 9)) {
      val rnd = new scala.util.Random(n)
      val counts = Seq.fill(n)(rnd.nextInt(20))
      val slopes = (for {
        i <- 0 until n; j <- i + 1 until n
      } yield (counts(j) - counts(i)).toDouble / (j - i)).sorted
      val p = slopes.length
      val med = (slopes((p - 1) / 2) + slopes(p / 2)) / 2.0
      val r = Trend.theilSen(eventsFromCounts(counts)).collect()(0)
      assert(math.abs(r.getAs[Double]("slope") - med) < 1e-5, s"n=$n")
    }
  }

  test("runsTest counts runs around the median correctly") {
    // series: 5 5 1 1 5 5 1 1 (median-equal days dropped: median of
    // sorted(1,1,1,1,5,5,5,5) = 3 → signs + + - - + + - - → 4 runs
    val counts = Seq(5, 5, 1, 1, 5, 5, 1, 1)
    val r = Trend.runsTest(eventsFromCounts(counts)).collect()(0)
    assert(r.getAs[Long]("n1") == 4L && r.getAs[Long]("n2") == 4L)
    assert(r.getAs[Long]("runs") == 4L)
  }

  test("kendallTau: y = x co-movement gives tau_b = 1, opposing gives -1") {
    import testImplicits._
    // x buys on even days, y views proportionally (co-moving)
    def ev(counts: Seq[(Int, Int)]): DataFrame = {
      val rows = for {
        ((cx, cy), d) <- counts.zipWithIndex
        (tpe, idx) <- Seq.fill(cx)("purchase").zipWithIndex ++
          Seq.fill(cy)("view").zipWithIndex.map(t => (t._1, cx + t._2))
      } yield (d.toLong * 1000 + idx, d, tpe)
      rows.toDF("event_id", "d", "event_type")
        .select(col("event_id"),
          timestamp_seconds(lit(1704110400L) + col("d") * 86400L).as("ts"),
          lit(1L).as("user_id"), col("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
    }
    val co = ev(Seq((1, 2), (2, 4), (3, 6), (4, 8)))
    assert(Trend.kendallTau(co).collect()(0).getAs[Double]("tau_b") == 1.0)
    val anti = ev(Seq((1, 8), (2, 6), (3, 4), (4, 2)))
    assert(Trend.kendallTau(anti).collect()(0).getAs[Double]("tau_b") == -1.0)
  }

  test("seasonalityStrength: pure weekly cycle gives r2 = 1, flat series r2 = 0-ish") {
    // 21 days of exact weekly pattern → dow explains everything
    val cycle = Seq(10, 2, 3, 4, 5, 6, 7)
    val r = Trend.seasonalityStrength(
      eventsFromCounts(Seq.fill(3)(cycle).flatten)).collect()(0)
    assert(r.getAs[Long]("n_days") == 21L && r.getAs[Long]("n_groups") == 7L)
    assert(r.getAs[Double]("r2") == 1.0)
    assert(r.isNullAt(r.fieldIndex("f"))) // ssw = 0 → F undefined
    // flat series: ss_total = 0 → r2 undefined (NULL)
    val flat = Trend.seasonalityStrength(
      eventsFromCounts(Seq.fill(14)(4))).collect()(0)
    assert(flat.isNullAt(flat.fieldIndex("r2")))
  }

  test("holtDaily matches the direct zero-initialized recurrence while t <= window") {
    val rnd = new scala.util.Random(11)
    val counts = Seq.fill(12)(rnd.nextInt(50))
    val alpha = 0.25; val beta = 0.125
    var l = 0.0; var b = 0.0
    val expect = counts.map { c =>
      val lPrev = l
      l = alpha * c + (1 - alpha) * (l + b)
      b = beta * (l - lPrev) + (1 - beta) * b
      (l, b)
    }
    val rows = Trend.holtDaily(eventsFromCounts(counts)).collect()
      .sortBy(_.getAs[Long]("day"))
    rows.zip(expect).foreach { case (r, (el, eb)) =>
      assert(math.abs(r.getAs[Double]("level") - el) < 1e-5)
      assert(math.abs(r.getAs[Double]("trend") - eb) < 1e-5)
      assert(math.abs(r.getAs[Double]("forecast") - (el + eb)) < 1e-5)
    }
  }

  test("bounceRate: single-event session bounces, multi-event does not") {
    import testImplicits._
    val ev = Seq(
      (1L, 0L, "view"),       // session 1: alone -> bounce
      (2L, 2400L, "click"),    // session 2 (40 min later): click then...
      (3L, 2700L, "purchase")) // ...purchase 5 min later -> no bounce
      .toDF("event_id", "sec", "event_type")
      .select(col("event_id"),
        timestamp_seconds(lit(1704110400L) + col("sec")).as("ts"),
        lit(7L).as("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
    val r = graft.streaming.EventStreams.bounceRate(ev).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r("view") == ((1L, 1L)))
    assert(r("click") == ((1L, 0L)))
  }

  test("newReturning: first-ever day is new, later days returning") {
    import testImplicits._
    val ev = Seq((1L, 0, 1L), (2L, 1, 1L), (3L, 1, 2L))
      .toDF("event_id", "d", "user_id")
      .select(col("event_id"),
        timestamp_seconds(lit(1704110400L) + col("d") * 86400L).as("ts"),
        col("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
    val r = graft.streaming.EventStreams.newReturning(ev).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    val d0 = 1704110400L / 86400L
    assert(r(d0) == ((1L, 1L, 0L)))
    assert(r(d0 + 1) == ((2L, 1L, 1L)))
  }

  private def brutePettitt(c: Seq[Int]): (Int, Long) = {
    val n = c.length
    var bestT = -1; var bestK = -1L; var uAtBest = 0L
    for (t <- 0 until n - 1) {
      var u = 0L
      for (i <- 0 to t; j <- t + 1 until n)
        u += java.lang.Integer.signum(c(j) - c(i))
      if (math.abs(u) > bestK) { bestK = math.abs(u); bestT = t; uAtBest = u }
    }
    (bestT, uAtBest)
  }

  test("pettitt locates a clean mean shift and matches brute force") {
    // 5 quiet days then 5 loud days: the change point is day index 4
    // (the last quiet day); U_4 = Σ sgn(loud − quiet) = +5·5 = 25
    val counts = Seq(1, 1, 1, 1, 1, 10, 10, 10, 10, 10)
    val r = Trend.pettitt(eventsFromCounts(counts)).collect()(0)
    val d0 = 1704110400L / 86400L
    val (bt, bu) = brutePettitt(counts)
    assert(bt == 4 && bu == 25L)
    assert(r.getAs[Long]("n_days") == 10L)
    assert(r.getAs[Long]("change_day") == d0 + bt)
    assert(r.getAs[Long]("u_at_k") == bu)
    assert(r.getAs[Long]("k") == 25L)
    val p = 2.0 * math.exp(-6.0 * 25 * 25 / (1000.0 + 100.0))
    assert(math.abs(r.getAs[Double]("p_approx") -
      BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("pettitt matches brute force on a seeded random series; ties go earliest") {
    val rnd = new scala.util.Random(13)
    val counts = Seq.fill(20)(rnd.nextInt(6))
    val r = Trend.pettitt(eventsFromCounts(counts)).collect()(0)
    val d0 = 1704110400L / 86400L
    // brute argmax with earliest-t tie rule (strict > in brutePettitt)
    val (bt, bu) = brutePettitt(counts)
    assert(r.getAs[Long]("change_day") == d0 + bt)
    assert(r.getAs[Long]("u_at_k") == bu)
    // flat series: K = 0, p capped at 1
    val flat = Trend.pettitt(eventsFromCounts(Seq(3, 3, 3, 3))).collect()(0)
    assert(flat.getAs[Long]("k") == 0L)
    assert(flat.getAs[Double]("p_approx") == 1.0)
    assert(flat.getAs[Long]("change_day") == d0) // earliest-day tie rule
  }

  /** Sequential Page–Hinkley replay: per day (ph_inc, ph_dec) plus
    * the λ = k·σ threshold off the whole series. */
  private def brutePageHinkley(c: Seq[Int], delta: Double = 0.0,
                               k: Double = 3.0)
      : (Seq[(Double, Double)], Double) = {
    var p = 0L
    var m = 0.0
    var mn = Double.MaxValue
    var mx = Double.MinValue
    val out = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    for (i <- 1 to c.length) {
      p += c(i - 1)
      m += c(i - 1) - p.toDouble / i - delta
      mn = math.min(mn, m)
      mx = math.max(mx, m)
      out += ((m - mn, mx - m))
    }
    val n = c.length
    val mean = c.map(_.toLong).sum.toDouble / n
    val sq = c.map(x => x.toLong * x.toLong).sum.toDouble / n
    (out.toSeq, k * math.sqrt(math.max(sq - mean * mean, 0.0)))
  }

  test("pageHinkley matches the sequential replay on a seeded series") {
    val rnd = new scala.util.Random(11)
    val counts = 3 +: Seq.fill(23)(rnd.nextInt(8)) :+ 5
    val (ph, lam) = brutePageHinkley(counts)
    val got = Trend.pageHinkley(eventsFromCounts(counts)).collect()
    assert(got.length == counts.length)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) == counts(i).toLong, s"day $i count")
      assert(math.abs(r.getAs[Double]("ph_inc") - ph(i)._1) < 1e-6, s"day $i")
      assert(math.abs(r.getAs[Double]("ph_dec") - ph(i)._2) < 1e-6, s"day $i")
      assert(r.getAs[Boolean]("alarm_inc") == ph(i)._1 > lam, s"day $i")
      assert(r.getAs[Boolean]("alarm_dec") == ph(i)._2 > lam, s"day $i")
    }
  }

  test("pageHinkley alarms on an upward mean shift, upward side only") {
    val counts = Seq.fill(10)(5) ++ Seq.fill(10)(60)
    val (ph, lam) = brutePageHinkley(counts)
    assert(ph.last._1 > lam) // the replay itself must cross
    val got = Trend.pageHinkley(eventsFromCounts(counts)).collect()
    assert(got.last.getAs[Boolean]("alarm_inc"))
    assert(got.forall(!_.getAs[Boolean]("alarm_dec")))
    // the flat prefix never alarms
    got.take(10).foreach(r => assert(!r.getAs[Boolean]("alarm_inc")))
  }
}

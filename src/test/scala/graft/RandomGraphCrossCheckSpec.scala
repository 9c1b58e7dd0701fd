package graft

import org.apache.spark.sql.DataFrame
import graft.algorithms.{Community, Structure, Traversal}

/** Randomized cross-checks: the DataFrame kernels vs trivially-correct
  * driver-side reference implementations on seeded random graphs —
  * the partitions/labels must agree exactly on every instance. Seeds
  * are fixed so runs are deterministic. */
class RandomGraphCrossCheckSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  private def randomDigraph(n: Int, p: Double, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    for {
      a <- 0L until n; b <- 0L until n
      if a != b && rnd.nextDouble() < p
    } yield (a, b)
  }

  private def df(pairs: Seq[(Long, Long)]): DataFrame = pairs.toDF("src", "dst")
  private def idsDf(n: Int): DataFrame = (0L until n).toDF("id")

  // ---- driver-side references ----

  private def unionFindCC(n: Int, sym: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    sym.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonicalize to min member
    val label = (0 until n).groupBy(find).map { case (_, m) => m.map(_.toLong).min -> m }
    label.flatMap { case (lbl, m) => m.map(_.toLong -> lbl) }.toMap
  }

  private def tarjanScc(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.groupBy(_._1.toInt).map { case (k, v) => k -> v.map(_._2.toInt) }
      .withDefaultValue(Seq.empty)
    val idx = Array.fill(n)(-1); val low = Array.fill(n)(0)
    val onStack = Array.fill(n)(false)
    val stack = scala.collection.mutable.Stack[Int]()
    var counter = 0
    val comp = Array.fill(n)(-1)
    var compCount = 0
    def strongConnect(v: Int): Unit = {
      idx(v) = counter; low(v) = counter; counter += 1
      stack.push(v); onStack(v) = true
      adj(v).foreach { w =>
        if (idx(w) == -1) { strongConnect(w); low(v) = math.min(low(v), low(w)) }
        else if (onStack(w)) low(v) = math.min(low(v), idx(w))
      }
      if (low(v) == idx(v)) {
        var done = false
        while (!done) {
          val w = stack.pop(); onStack(w) = false; comp(w) = compCount
          if (w == v) done = true
        }
        compCount += 1
      }
    }
    (0 until n).foreach(v => if (idx(v) == -1) strongConnect(v))
    // canonicalize to min member id
    val byComp = (0 until n).groupBy(comp)
    byComp.values.flatMap { m =>
      val lbl = m.map(_.toLong).min; m.map(_.toLong -> lbl)
    }.toMap
  }

  private def bfsRef(n: Int, edges: Seq[(Long, Long)], src: Long): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      .withDefaultValue(Seq.empty)
    val dist = scala.collection.mutable.Map(src -> 0L)
    var frontier = Seq(src)
    var d = 0L
    while (frontier.nonEmpty) {
      d += 1
      frontier = frontier.flatMap(adj).distinct.filterNot(dist.contains)
      frontier.foreach(v => dist(v) = d)
    }
    dist.toMap
  }

  private def kcoreRef(n: Int, sym: Seq[(Long, Long)], k: Int): Set[Long] = {
    var alive = (0L until n).filter(v => sym.exists(e => e._1 == v)).toSet
    var changed = true
    while (changed) {
      val deg = sym.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).map { case (v, es) => v -> es.size }
      val next = alive.filter(v => deg.getOrElse(v, 0) >= k)
      changed = next != alive
      alive = next
    }
    alive
  }

  private def brandesRef(n: Int, edges: Seq[(Long, Long)]): Map[Long, Double] = {
    val adj = edges.groupBy(_._1.toInt).map { case (k, v) => k -> v.map(_._2.toInt) }
      .withDefaultValue(Seq.empty)
    val bc = Array.fill(n)(0.0)
    for (s <- 0 until n) {
      val dist = Array.fill(n)(-1); val sigma = Array.fill(n)(0.0)
      val order = scala.collection.mutable.ArrayBuffer[Int]()
      dist(s) = 0; sigma(s) = 1.0
      var frontier = Seq(s)
      while (frontier.nonEmpty) {
        order ++= frontier
        val next = scala.collection.mutable.LinkedHashSet[Int]()
        frontier.foreach { v =>
          adj(v).foreach { w =>
            if (dist(w) == -1 || dist(w) == dist(v) + 1) {
              if (dist(w) == -1) { dist(w) = dist(v) + 1; next += w }
              sigma(w) += sigma(v)
            }
          }
        }
        frontier = next.toSeq
      }
      val delta = Array.fill(n)(0.0)
      order.reverse.foreach { v =>
        adj(v).foreach { w =>
          if (dist(w) == dist(v) + 1)
            delta(v) += sigma(v) / sigma(w) * (1.0 + delta(w))
        }
        if (v != s) bc(v) += delta(v)
      }
    }
    val norm = (n - 1.0) * (n - 2.0)
    (0 until n).map(v => v.toLong -> bc(v) / norm).toMap
  }

  private def dfsRef(edges: Seq[(Long, Long)], root: Long): Seq[Long] = {
    val adj = edges.groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).distinct.sorted }
      .withDefaultValue(Seq.empty)
    val visited = scala.collection.mutable.LinkedHashSet[Long](root)
    def go(v: Long): Unit = adj(v).foreach { w =>
      if (!visited(w)) { visited += w; go(w) }
    }
    go(root)
    visited.toSeq
  }

  private def coreRef(sym: Seq[(Long, Long)]): Map[Long, Long] = {
    var alive = sym.map(_._1).distinct.toSet
    val core = scala.collection.mutable.Map[Long, Long]()
    var k = 1L
    while (alive.nonEmpty) {
      var changed = true
      while (changed) {
        val deg = sym.filter(e => alive(e._1) && alive(e._2))
          .groupBy(_._1).map { case (v, es) => v -> es.size }
        val dead = alive.filter(v => deg.getOrElse(v, 0) < k)
        changed = dead.nonEmpty
        dead.foreach(v => core(v) = k - 1)
        alive --= dead
      }
      k += 1
    }
    core.toMap
  }

  private def louvainRef(sym: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = sym.map(_._1).distinct
    nodes.map { v =>
      // count incident endpoints per (singleton) neighbor community;
      // ties break to the smallest community id
      val counts = sym.filter(_._1 == v).map(_._2)
        .groupBy(identity).map { case (c, xs) => c -> xs.size }
      val best = counts.toSeq.maxBy { case (c, w) => (w, -c) }._1
      v -> best
    }.toMap
  }

  // ---- cross-checks ----

  test("betweenness agrees with driver Brandes on random digraphs") {
    for (seed <- 1L to 2L) {
      val n = 12
      val e = randomDigraph(n, 0.15, seed)
      val got = graft.algorithms.Centrality.betweenness(idsDf(n), df(e), n)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = brandesRef(n, e)
      assert(got.keySet == want.keySet, s"seed $seed")
      got.foreach { case (v, x) =>
        assert(math.abs(x - want(v)) < 1e-9, s"seed $seed node $v: $x vs ${want(v)}")
      }
    }
  }

  test("louvain one pass agrees with the synchronous move rule") {
    for (seed <- 1L to 2L) {
      val und = randomDigraph(16, 0.15, seed)
      val sym = (und ++ und.map(_.swap)).distinct
      val got = Community.louvainOnePass(df(sym))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == louvainRef(sym), s"seed $seed")
    }
  }

  test("all shortest paths count matches the sigma of a counting BFS") {
    for (seed <- 1L to 2L) {
      val n = 14
      val e = randomDigraph(n, 0.15, seed).map { case (a, b) => (a, b, "E") }
      val edf = e.toDF("src", "dst", "rel_type")
      // counting BFS from 0
      val adj = e.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
        .withDefaultValue(Seq.empty)
      val dist = scala.collection.mutable.Map(0L -> 0L)
      val sigma = scala.collection.mutable.Map(0L -> 1L).withDefaultValue(0L)
      var frontier = Seq(0L)
      while (frontier.nonEmpty) {
        val next = scala.collection.mutable.LinkedHashSet[Long]()
        frontier.foreach { v =>
          adj(v).foreach { w =>
            if (!dist.contains(w)) { dist(w) = dist(v) + 1; next += w }
            if (dist(w) == dist(v) + 1) sigma(w) += sigma(v)
          }
        }
        frontier = next.toSeq
      }
      // pick the farthest reachable node (deterministic tiebreak by id)
      val targets = dist.filter(_._1 != 0L)
      if (targets.nonEmpty) {
        val (tgt, d) = targets.toSeq.maxBy { case (v, dd) => (dd, -v) }
        val paths = graft.algorithms.Paths.allShortestPaths(edf, 0L, tgt, n).collect()
        assert(paths.length.toLong == sigma(tgt), s"seed $seed target $tgt")
        assert(paths.forall(_.getAs[Long]("hops") == d), s"seed $seed")
      }
    }
  }

  test("mst agrees with driver Kruskal on random weighted graphs") {
    for (seed <- 1L to 3L) {
      val n = 20
      val rnd = new scala.util.Random(seed + 100)
      val und = randomDigraph(n, 0.12, seed)
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // deliberate weight ties (w in 1..5) — the (w,a,b) total order
      // must keep the forest unique anyway
      val wed = und.map { case (a, b) => (a, b, (rnd.nextInt(5) + 1).toLong) }
      val got = algorithms.Spanning
        .minimumSpanningForest(wed.toDF("a", "b", "w"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // reference: Kruskal under the same (w, a, b) order
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      val expect = wed.sortBy { case (a, b, w) => (w, a, b) }.flatMap {
        case (a, b, w) =>
          val (ra, rb) = (find(a), find(b))
          if (ra == rb) None else { parent(ra) = rb; Some((a, b, w)) }
      }.toSet
      assert(got == expect, s"seed $seed")
    }
  }

  test("mis and coloring agree with sequential greedy on random graphs") {
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16)
    }
    for (seed <- 1L to 3L) {
      val n = 20
      val und = randomDigraph(n, 0.12, seed)
      val sym = (und ++ und.map(_.swap)).distinct
      val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        .withDefaultValue(Set.empty[Long])
      val order = (0L until n).sortBy(id => (h60(s"mis:$id"), id))
      // reference greedy MIS and greedy coloring in the same order
      val inMis = scala.collection.mutable.HashSet.empty[Long]
      order.foreach(v => if (!adj(v).exists(inMis)) inMis += v)
      val color = scala.collection.mutable.HashMap.empty[Long, Long]
      order.foreach { v =>
        val used = adj(v).flatMap(color.get)
        var c = 0L; while (used(c)) c += 1
        color(v) = c
      }
      val gotMis = algorithms.Independent
        .maximalIndependentSet(idsDf(n), df(sym))
        .collect().map(_.getLong(0)).toSet
      assert(gotMis == inMis.toSet, s"seed $seed")
      val gotCol = algorithms.Independent.greedyColoring(idsDf(n), df(sym))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotCol == color.toMap, s"seed $seed")
    }
  }

  test("k-truss agrees with a reference support peel on random graphs") {
    for (seed <- 1L to 3L; k <- Seq(3, 4)) {
      val n = 16
      val und = randomDigraph(n, 0.25, seed)
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      def support(es: Set[(Long, Long)]): Map[(Long, Long), Int] = {
        val adj = scala.collection.mutable.HashMap
          .empty[Long, Set[Long]].withDefaultValue(Set.empty)
        es.foreach { case (a, b) =>
          adj(a) = adj(a) + b; adj(b) = adj(b) + a }
        es.map(e => e -> (adj(e._1) & adj(e._2)).size).toMap
      }
      var es = und.toSet
      var stable = false
      while (!stable) {
        // NB: Map.collect producing pairs would rebuild a Map keyed by
        // the first endpoint and silently drop edges — filter + keySet
        val keep: Set[(Long, Long)] =
          support(es).filter(_._2 >= k - 2).keySet.toSet
        stable = keep == es; es = keep
      }
      val expect = support(es).map { case ((a, b), s) => (a, b, s.toLong) }.toSet
      val got = algorithms.Structure.kTruss(und.toDF("a", "b"), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expect, s"seed $seed k $k")
    }
  }

  test("connected components agree with union-find on random graphs") {
    for (seed <- 1L to 3L) {
      val n = 20
      val und = randomDigraph(n, 0.08, seed)
      val sym = (und ++ und.map(_.swap)).distinct
      val got = Community.connectedComponents(idsDf(n), df(sym), 15)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFindCC(n, sym), s"seed $seed")
    }
  }

  test("scc agrees with Tarjan on random digraphs") {
    for (seed <- 1L to 3L) {
      val n = 15
      val e = randomDigraph(n, 0.12, seed)
      val got = Community.scc(idsDf(n), df(e))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == tarjanScc(n, e), s"seed $seed")
    }
  }

  test("bfs distances agree with a driver BFS on random digraphs") {
    for (seed <- 1L to 3L) {
      val n = 20
      val e = randomDigraph(n, 0.1, seed)
      val got = Traversal.bfsDistances(df(e), Seq(0L).toDF("id"), 20)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == bfsRef(n, e, 0L), s"seed $seed")
    }
  }

  test("dfs visit order agrees with a driver recursive DFS") {
    for (seed <- 1L to 3L) {
      val n = 16
      val e = randomDigraph(n, 0.15, seed)
      val got = Traversal.dfsOrder(df(e), 0L)
        .collect().sortBy(_.getLong(1)).map(_.getLong(0)).toSeq
      assert(got == dfsRef(e, 0L), s"seed $seed")
    }
  }

  test("core numbers agree with a reference peel decomposition") {
    for (seed <- 1L to 3L) {
      val n = 18
      val und = randomDigraph(n, 0.2, seed)
      val sym = (und ++ und.map(_.swap)).distinct
      val got = Structure.coreNumbers(df(sym))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == coreRef(sym), s"seed $seed")
    }
  }

  test("k-core members agree with a reference peel on random graphs") {
    for (seed <- 1L to 3L) {
      val n = 18
      val und = randomDigraph(n, 0.2, seed)
      val sym = (und ++ und.map(_.swap)).distinct
      val got = Structure.kcoreMembers(df(sym), 3, 20)
        .collect().map(_.getLong(0)).toSet
      assert(got == kcoreRef(n, sym, 3), s"seed $seed")
    }
  }

  test("dag longest paths agree with a driver DP on random DAGs") {
    for (seed <- 1L to 3L) {
      val n = 15
      val rnd = new scala.util.Random(seed * 31)
      // orient small→large id: acyclic by construction; random weights
      val es = randomDigraph(n, 0.2, seed)
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b }.distinct
        .map { case (a, b) => (a, b, 1L + rnd.nextInt(9).toLong) }
      // reference: DP in topological (= id) order
      val best = Array.fill(n)(0L)
      for (v <- 0 until n; (a, b, w) <- es if b == v)
        best(v) = math.max(best(v), best(a.toInt) + w)
      val got = graft.algorithms.Dag.longestPaths(idsDf(n),
          es.toDF("src", "dst", "w"), n + 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == (0 until n).map(v => v.toLong -> best(v)).toMap, s"seed $seed")
    }
  }

  test("simrank agrees with a driver matrix iteration on random digraphs") {
    for (seed <- 1L to 3L) {
      val n = 10
      val e = randomDigraph(n, 0.15, seed).distinct
      val inN = e.groupBy(_._2.toInt).map { case (k, v) => k -> v.map(_._1.toInt) }
        .withDefaultValue(Seq.empty)
      var s = Array.tabulate(n, n)((a, b) => if (a == b) 1.0 else 0.0)
      for (_ <- 1 to 4) {
        val next = Array.tabulate(n, n) { (a, b) =>
          if (a == b) 1.0
          else {
            val (ia, ib) = (inN(a), inN(b))
            if (ia.isEmpty || ib.isEmpty) 0.0
            else 0.8 * ia.map(i => ib.map(j => s(i)(j)).sum).sum /
              (ia.size.toLong * ib.size)
          }
        }
        s = next
      }
      val got = graft.algorithms.SimRank.simRank(idsDf(n), df(e), 4)
        .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getDouble(2))
        .toMap
      for (a <- 0 until n; b <- 0 until n)
        assert(math.abs(got((a, b)) - s(a)(b)) < 1e-6, s"seed $seed ($a,$b)")
    }
  }

  test("katz agrees with a driver vector iteration on random digraphs") {
    for (seed <- 1L to 3L) {
      val n = 12
      val e = randomDigraph(n, 0.15, seed).distinct
      var x = Array.fill(n)(1.0)
      for (_ <- 1 to 6) {
        val nx = Array.fill(n)(0.0)
        e.foreach { case (a, b) => nx(b.toInt) += x(a.toInt) }
        for (v <- 0 until n) nx(v) = 1.0 + 0.1 * nx(v)
        x = nx
      }
      val got = graft.algorithms.Centrality.katz(idsDf(n), df(e), 6)
        .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
      for (v <- 0 until n)
        assert(math.abs(got(v) - x(v)) < 1e-7, s"seed $seed node $v")
    }
  }

  test("basketPairs agrees with a driver brute force on random baskets") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      // 40 orders, catalog of 12 parts, basket sizes 1..6
      val baskets: Seq[(Long, Set[Long])] = (0L until 40L).map { o =>
        o -> (0 until (1 + rnd.nextInt(6)))
          .map(_ => rnd.nextInt(12).toLong).toSet
      }
      val rows = baskets.flatMap { case (o, ps) => ps.map(p => (o, p)) }
      val got = graft.pipeline.Association
        .basketPairs(rows.toDF("l_orderkey", "l_partkey"),
          minItemCount = 2L, minPairCount = 2L, topK = 1000)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
      // brute force
      val icnt = rows.map(_._2).groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      val n = baskets.size.toLong
      val want = (for {
        (_, ps) <- baskets
        p1 <- ps; p2 <- ps if p1 < p2
        if icnt(p1) >= 2 && icnt(p2) >= 2
      } yield (p1, p2)).groupBy(identity)
        .collect { case (pair, xs) if xs.size >= 2 =>
          pair -> (xs.size.toLong, icnt(pair._1), icnt(pair._2), n) }
      assert(got == want.toMap, s"seed $seed")
    }
  }

  test("substringDupRate agrees with a driver brute force on random strings") {
    val implicits2 = spark.implicits
    import implicits2._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val alphabet = "abc"
      val docs = (1L to 12L).map { id =>
        id -> (0 until (3 + rnd.nextInt(30)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val k = 4
      val got = graft.pipeline.Dedup
        .substringDupRate(docs.toDF("doc_id", "text"), k)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      def grams(t: String): Seq[String] =
        if (t.length <= k) Seq(t.take(k))
        else (0 to t.length - k).map(i => t.substring(i, i + k))
      val all = docs.flatMap { case (_, t) => grams(t) }
        .groupBy(identity).map { case (g, xs) => g -> xs.size }
      docs.foreach { case (id, t) =>
        val gs = grams(t)
        val dup = gs.count(g => all(g) > 1).toLong
        assert(got(id) == ((gs.size.toLong, dup)), s"seed $seed doc $id")
      }
    }
  }

  // ---- full triad census ----

  /** Independent driver-side triad classifier: dyad states per triple,
    * then the Holland–Leinhardt M-A-N + orientation catalog via
    * in/out-degree patterns WITHIN the triple (a different derivation
    * than the kernel's c-relative wedge codes). */
  private def classifyTriad(nodes: Seq[Long],
                            has: Set[(Long, Long)]): String = {
    val Seq(a, b, c) = nodes.sorted
    val dyads = Seq((a, b), (a, c), (b, c))
    def st(p: (Long, Long)): Int = {
      val f = has(p); val r = has((p._2, p._1))
      if (f && r) 2 else if (f || r) 1 else 0
    }
    val states = dyads.map(st)
    val m = states.count(_ == 2)
    val asym = states.count(_ == 1)
    val within = has.filter(e => nodes.contains(e._1) && nodes.contains(e._2))
    def outd(x: Long) = within.count(e => e._1 == x &&
      !within((e._2, e._1))) // asym out-degree
    def ind(x: Long) = within.count(e => e._2 == x && !within((e._2, e._1)))
    (m, asym) match {
      case (0, 0) => "003"
      case (0, 1) => "012"
      case (1, 0) => "102"
      case (0, 2) =>
        if (nodes.exists(outd(_) == 2)) "021D"
        else if (nodes.exists(ind(_) == 2)) "021U" else "021C"
      case (1, 1) =>
        // the third node is the one outside the mutual pair
        val pair = dyads(states.indexOf(2))
        val third = nodes.find(x => x != pair._1 && x != pair._2).get
        if (outd(third) == 1) "111D" else "111U"
      case (0, 3) =>
        if (nodes.forall(outd(_) == 1)) "030C" else "030T"
      case (2, 0) => "201"
      case (1, 2) =>
        val pair = dyads(states.indexOf(2))
        val third = nodes.find(x => x != pair._1 && x != pair._2).get
        if (outd(third) == 2) "120D"
        else if (ind(third) == 2) "120U" else "120C"
      case (2, 1) => "210"
      case _ => "300"
    }
  }

  test("triadCensusFull: each canonical >=2-dyad config reads exactly itself") {
    val configs: Seq[(String, Seq[(Long, Long)])] = Seq(
      "021D" -> Seq((2L, 1L), (2L, 3L)),
      "021U" -> Seq((1L, 2L), (3L, 2L)),
      "021C" -> Seq((1L, 2L), (2L, 3L)),
      "111D" -> Seq((1L, 2L), (2L, 1L), (3L, 2L)),
      "111U" -> Seq((1L, 2L), (2L, 1L), (2L, 3L)),
      "030T" -> Seq((1L, 2L), (2L, 3L), (1L, 3L)),
      "030C" -> Seq((1L, 2L), (2L, 3L), (3L, 1L)),
      "201" -> Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)),
      "120D" -> Seq((2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L)),
      "120U" -> Seq((1L, 2L), (3L, 2L), (1L, 3L), (3L, 1L)),
      "120C" -> Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 1L)),
      "210" -> Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L)),
      "300" -> Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L)))
    for ((want, edges) <- configs) {
      val got = Structure.triadCensusFull(df(edges)).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got(want) == 1L, s"$want: $got")
      assert(got.values.sum == 1L, s"$want: only one triple exists, $got")
      // the driver classifier agrees on the same config
      assert(classifyTriad(Seq(1L, 2L, 3L), edges.toSet) == want)
    }
  }

  test("onionLayers: brute wave-peel, regime parity, cores == coreNumbers") {
    for (seed <- Seq(3L, 17L)) {
      val digest = randomDigraph(12, 0.25, seed)
      val symPairs = digest.flatMap { case (a, b) => Seq((a, b), (b, a)) }
        .distinct.filter(p => p._1 != p._2)
      val sdf = symPairs.toDF("src", "dst")
      def run = Structure.onionLayers(sdf).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val got = run
      val dist = graft.algorithms.Tuning.withBroadcastThreshold(0L)(run)
      assert(got == dist, s"seed $seed: regimes disagree")
      // brute sequential wave-peel
      val adj = symPairs.groupBy(_._1).map { case (k, v) =>
        k -> v.map(_._2).toSet }
      val alive = scala.collection.mutable.Set.empty[Long] ++ adj.keys
      val deg = scala.collection.mutable.Map.empty[Long, Int] ++
        adj.map { case (k, v) => k -> v.size }
      var c = 0L
      var layer = 0L
      val brute = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      while (alive.nonEmpty) {
        layer += 1
        c = math.max(c, alive.map(deg(_)).min.toLong)
        val wave = alive.filter(deg(_) <= c).toSeq
        wave.foreach { v => brute(v) = (c, layer); alive -= v }
        wave.foreach(v => adj(v).foreach(u =>
          if (alive(u)) deg(u) = deg(u) - 1))
      }
      assert(got == brute.toMap, s"seed $seed")
      // core numbers agree with the h-index kernel on the same graph
      val cores = Structure.coreNumbers(sdf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.view.mapValues(_._1).toMap == cores, s"seed $seed cores")
    }
  }

  test("attackCurve matches the brute-force threshold attack") {
    for (seed <- Seq(7L, 41L)) {
      val rnd = new scala.util.Random(seed)
      val pairs = for {
        a <- 0L until 14L; b <- a + 1 until 14L
        if rnd.nextDouble() < 0.3
      } yield (a, b)
      def run = Structure.attackCurve(pairs.toDF("a", "b")).collect()
        .map(r => r.getDouble(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
      val got = run
      // the inner CC kernel is dual-regime: force the shuffle branch
      val dist = graft.algorithms.Tuning.withBroadcastThreshold(0L)(run)
      assert(dist == got, s"seed $seed: regimes disagree")
      val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val nodes = adj.keys.toSeq.sorted
      val deg = nodes.map(x => x -> adj(x).size.toLong).toMap
      for (pct <- Seq(0.0, 0.01, 0.05, 0.1)) {
        val k = math.floor(pct * nodes.size).toLong
        val classesDesc = deg.values.groupBy(identity)
          .map { case (d, v) => (d, v.size.toLong) }.toSeq.sortBy(-_._1)
        var cum = 0L
        var dmin = classesDesc.head._1 + 1
        var removed = 0L
        var stop = false
        for ((d, c) <- classesDesc if !stop) {
          if (cum + c <= k) { cum += c; dmin = d; removed = cum }
          else stop = true
        }
        val keep = nodes.filter(x => deg(x) < dmin).toSet
        val keptEdges = pairs.filter(p => keep(p._1) && keep(p._2))
        // BFS component sizes over the kept subgraph
        var seen = Set.empty[Long]
        var lcc = 0L
        for (s <- keep if !seen(s)) {
          var comp = Set(s); var frontier = Set(s)
          while (frontier.nonEmpty) {
            frontier = frontier.flatMap(x => adj(x).filter(y =>
              keep(y) && !comp(y) &&
                (keptEdges.contains((math.min(x, y), math.max(x, y))))))
            comp ++= frontier
          }
          seen ++= comp
          lcc = math.max(lcc, comp.size.toLong)
        }
        val g = got(pct)
        assert(g._1 == removed, s"seed $seed pct $pct removed")
        assert(g._2 == keep.size.toLong, s"seed $seed pct $pct n_left")
        assert(g._3 == keptEdges.size.toLong, s"seed $seed pct $pct e_left")
        assert(g._4 == lcc, s"seed $seed pct $pct lcc")
        assert(math.abs(g._5 - lcc.toDouble / keep.size) < 1e-6)
      }
    }
  }

  test("triadCensusFull matches the brute-force census on seeded digraphs") {
    for (seed <- Seq(5L, 23L)) {
      val edges = randomDigraph(10, 0.3, seed)
      val has = edges.toSet
      val endpoints = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val brute = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      for {
        i <- endpoints.indices; j <- i + 1 until endpoints.size
        k <- j + 1 until endpoints.size
      } brute(classifyTriad(
        Seq(endpoints(i), endpoints(j), endpoints(k)), has)) += 1L
      val got = Structure.triadCensusFull(df(edges)).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val classes = got.keySet
      assert(classes.size == 16)
      classes.foreach { cl =>
        assert(got(cl) == brute(cl), s"seed $seed class $cl: " +
          s"got ${got(cl)} brute ${brute(cl)}")
      }
      val n = endpoints.size.toLong
      assert(got.values.sum == n * (n - 1) * (n - 2) / 6)
    }
  }
}

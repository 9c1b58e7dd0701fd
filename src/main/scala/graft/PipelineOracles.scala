package graft

/** DuckDB mirrors for the pipeline operators (graft.pipeline.*). The
  * shared 60-bit hash is ('0x' || substr(md5(s),1,15))::BIGINT — equal to
  * Spark's conv(substr(md5(s),1,15),16,10) for every input, so MinHash /
  * SimHash / LSH reproduce bit-identically in both engines.
  */
object PipelineOracles {

  private def h60(s: String): String = s"('0x' || substr(md5($s), 1, 15))::BIGINT"

  private val shinglesCte =
    """shingles AS MATERIALIZED (
  SELECT doc_id, substr(text, i, 5) AS sh
  FROM documents, unnest(generate_series(1, greatest(len(text) - 4, 1))) AS t(i))"""

  val dedupExactSql: String =
    """SELECT md5(lower(substr(text, 1, 100))) AS fp, MIN(doc_id) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM documents GROUP BY 1 HAVING COUNT(*) > 1"""

  private def minhashCtes(k: Int, bands: Int): String = {
    val rows = k / bands
    val mins = (0 until k).map(j => s"MIN(ha + $j * hb) AS m$j").mkString(", ")
    val bandSel = (0 until bands).map { b =>
      val ms = (0 until rows).map(r => s"m${b * rows + r}").mkString(", ")
      s"SELECT doc_id, CAST($b AS BIGINT) AS band, md5(concat_ws('_', $ms)) AS bh FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""$shinglesCte,
hs AS MATERIALIZED (SELECT doc_id, ${h60("'a:' || sh")} AS ha,
  ${h60("'b:' || sh")} % (CAST(1 AS BIGINT) << 55) AS hb FROM shingles),
sig AS MATERIALIZED (SELECT doc_id, $mins FROM hs GROUP BY doc_id),
bands AS MATERIALIZED (
  $bandSel),
pairs AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x
  JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id)"""
  }

  val dedupMinhashSql: String =
    s"WITH ${minhashCtes(16, 4)} SELECT a, b FROM pairs"

  val dedupSimhashSql: String = {
    val sums = (0 until 32)
      .map(i => s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS s$i")
      .mkString(", ")
    val fp = (0 until 32)
      .map(i => s"(CASE WHEN s$i >= 0 THEN CAST(1 AS BIGINT) << $i ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    s"""WITH $shinglesCte,
hsim AS MATERIALIZED (SELECT doc_id, ${h60("'a:' || sh")} AS h FROM shingles),
ssum AS MATERIALIZED (SELECT doc_id, $sums FROM hsim GROUP BY doc_id),
simh AS MATERIALIZED (SELECT doc_id, $fp AS simhash FROM ssum),
chunks AS MATERIALIZED (
  SELECT doc_id, CAST(c AS BIGINT) AS chunk, (simhash >> (c * 8)) & 255 AS cv, simhash
  FROM simh, unnest(generate_series(0, 3)) AS t(c)),
p AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
        CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
      FROM chunks x JOIN chunks y ON x.chunk = y.chunk AND x.cv = y.cv AND x.doc_id < y.doc_id)
SELECT a, b, hamming FROM p WHERE hamming <= 3"""
  }

  /** Shared overlap CTE chain over a pair relation — ONE copy of the
    * dsh/sizes/inter contract composed by ngramJaccardSql and
    * containmentSql. */
  private def overlapCtes(pairsRel: String): String =
    s"""dsh AS MATERIALIZED (SELECT DISTINCT doc_id, ${h60("'a:' || sh")} AS sh FROM shingles),
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz FROM dsh GROUP BY doc_id),
inter AS (SELECT p.a, p.b, COUNT(*) AS common
          FROM $pairsRel p JOIN dsh x ON x.doc_id = p.a JOIN dsh y ON y.doc_id = p.b AND y.sh = x.sh
          GROUP BY p.a, p.b)"""

  val ngramJaccardSql: String =
    s"""WITH ${minhashCtes(16, 4)},
${overlapCtes("pairs")}
SELECT p.a, p.b,
       ROUND(COALESCE(i.common, 0) / (sa.sz + sb.sz - COALESCE(i.common, 0)), 6) AS jaccard
FROM pairs p LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
JOIN sizes sa ON sa.doc_id = p.a JOIN sizes sb ON sb.doc_id = p.b"""

  /** MinHash estimator audit: slot-agreement estimate vs the exact
    * shingle Jaccard per banded candidate pair; est = eq/16 is an
    * exact binary rational, the error subtracts the 6-dp-rounded true
    * score — identical doubles in both engines before the final
    * round. */
  val minhashAuditSql: String = {
    val eq = (0 until 16)
      .map(j => s"(CASE WHEN x.m$j = y.m$j THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH ${minhashCtes(16, 4)},
${overlapCtes("pairs")},
tj AS (SELECT p.a, p.b,
  ROUND(COALESCE(i.common, 0) / (sa.sz + sb.sz - COALESCE(i.common, 0)), 6) AS jaccard
  FROM pairs p LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
  JOIN sizes sa ON sa.doc_id = p.a JOIN sizes sb ON sb.doc_id = p.b),
es AS (SELECT p.a, p.b, ($eq) AS eq
  FROM pairs p JOIN sig x ON x.doc_id = p.a JOIN sig y ON y.doc_id = p.b)
SELECT t.a, t.b, t.jaccard,
  ROUND(e.eq / 16.0, 6) AS est,
  ROUND(ABS(e.eq / 16.0 - t.jaccard), 6) AS abs_err
FROM tj t JOIN es e ON e.a = t.a AND e.b = t.b"""
  }

  /** Per-doc novelty over distinct shingle hashes: share seen in >= 2
    * docs + mean 1/df. */
  val noveltySql: String =
    s"""WITH $shinglesCte,
g AS MATERIALIZED (SELECT DISTINCT doc_id, ${h60("'a:' || sh")} AS g FROM shingles),
dfg AS MATERIALIZED (SELECT g, COUNT(*) AS df FROM g GROUP BY g)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
  ROUND(AVG(CASE WHEN df > 1 THEN 1.0 ELSE 0.0 END), 6) AS dup_frac,
  ROUND(AVG(1.0 / df), 6) AS novelty
FROM g JOIN dfg USING (g) GROUP BY doc_id"""

  /** Substring-duplication-rate mirror: same positional 20-gram stream
    * (substr formula ≡ the generator row-for-row, truncated prefix for
    * short docs), same hashed count join and per-doc coverage fold. */
  val substringDupSql: String =
    s"""WITH g AS MATERIALIZED (SELECT doc_id,
    ${h60("'sd:' || substr(text, i, 20)")} AS g
  FROM documents,
    unnest(generate_series(1, greatest(len(text) - 19, 1))) AS t(i)),
c AS MATERIALIZED (SELECT g, COUNT(*) AS c FROM g GROUP BY g)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pos,
  CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_pos,
  ROUND(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) / COUNT(*), 6) AS dup_rate
FROM g JOIN c USING (g) GROUP BY doc_id"""

  /** Per-source duplication inflation over the dedupExact fingerprint. */
  val dupInflationSql: String =
    """WITH pf AS (SELECT source, md5(lower(substr(text, 1, 100))) AS fp,
  COUNT(*) AS m FROM documents GROUP BY 1, 2)
SELECT source, CAST(SUM(m) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS BIGINT) AS n_unique,
  ROUND(SUM(m) / COUNT(*), 6) AS inflation
FROM pf GROUP BY source"""

  /** Containment candidates = minhash pairs UNION winnow-fingerprint
    * pairs (same 2/50 thresholds as TextOps.winnowPairs defaults) —
    * whole-doc bands under-recall strict subsets, winnowing is
    * substring-guaranteed; mirrors Dedup.containment's default. */
  val containmentSql: String =
    s"""WITH ${minhashCtes(16, 4)},
${winnowCtes(5, 8)},
rare AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) <= 50),
f AS (SELECT doc_id, fp FROM fp WHERE fp IN (SELECT fp FROM rare)),
wpairs AS (SELECT x.doc_id AS a, y.doc_id AS b
           FROM f x JOIN f y ON x.fp = y.fp AND x.doc_id < y.doc_id
           GROUP BY 1, 2 HAVING COUNT(*) >= 2),
allpairs AS MATERIALIZED (SELECT a, b FROM pairs UNION SELECT a, b FROM wpairs),
${overlapCtes("allpairs")}
SELECT p.a, p.b,
       ROUND(COALESCE(i.common, 0) / sa.sz, 6) AS c_ab,
       ROUND(COALESCE(i.common, 0) / sb.sz, 6) AS c_ba
FROM allpairs p LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
JOIN sizes sa ON sa.doc_id = p.a JOIN sizes sb ON sb.doc_id = p.b"""

  private val embCtes =
    """ex AS MATERIALIZED (
  SELECT vec_id, i - 1 AS pos, embedding[i]::DOUBLE AS x
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)),
nrm AS MATERIALIZED (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ex GROUP BY vec_id)"""

  val cosineTopKSql: String =
    s"""WITH $embCtes,
dots AS (SELECT q.vec_id AS qid, v.vec_id AS vid, SUM(q.x * v.x) AS dot
         FROM ex q JOIN ex v ON q.pos = v.pos AND q.vec_id < 10 AND v.vec_id >= 10
         GROUP BY 1, 2),
cos AS (SELECT qid, vid, ROUND(dot / (qn.nrm * vn.nrm), 6) AS cosine
        FROM dots JOIN nrm qn ON qn.vec_id = qid JOIN nrm vn ON vn.vec_id = vid),
rk AS (SELECT qid, vid, cosine, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid ASC) AS rn FROM cos)
SELECT qid, vid, cosine, CAST(rn AS BIGINT) AS rnk FROM rk WHERE rn <= 5"""

  /** PCA mirror: the same one-pass algebraic covariance
    * (Σxixj/n − μiμj) and the power iteration unrolled with the same
    * uniform start, per-step L2 normalizers, Rayleigh eigenvalue and
    * trace share. */
  def pcaTopSql(iters: Int): String =
    pcaCoreSql(iters) + s"""
SELECT v.pos, ROUND(v.v, 6) AS loading,
  ROUND((SELECT eigval FROM ei), 6) AS eigval,
  ROUND((SELECT eigval FROM ei) / (SELECT trace FROM tr), 6) AS var_explained
FROM v$iters v ORDER BY pos"""

  /** Projection mirror: coord = Σ(x − μ)·round6(loading) per vector —
    * the same rounded loading the pcaTop output carries. */
  def pcaProjectSql(iters: Int): String =
    pcaCoreSql(iters) + s""",
dims AS (SELECT v.pos, ROUND(v.v, 6) AS loading, mu.mu
  FROM v$iters v JOIN mu ON mu.pos = v.pos)
SELECT e.vec_id, ROUND(SUM((e.x - d.mu) * d.loading), 6) AS coord
FROM ex e JOIN dims d ON d.pos = e.pos GROUP BY e.vec_id ORDER BY e.vec_id"""

  /** PC2 mirror: deflation against the ROUNDED published first
    * component (6-dp loading + eigenvalue — the pcaProject
    * convention), then the same unrolled power iteration on C′;
    * var_explained over C′'s trace (share of remaining variance). */
  def pcaSecondSql(iters: Int): String = {
    val sb = new StringBuilder(pcaCoreSql(iters))
    sb ++= s""",
l1 AS (SELECT v.pos, ROUND(v.v, 6) AS l FROM v$iters v),
e1 AS (SELECT ROUND(eigval, 6) AS e FROM ei),
cv2 AS MATERIALIZED (SELECT cv.i, cv.j,
  cv.c - (SELECT e FROM e1) * a.l * b.l AS c
  FROM cv JOIN l1 a ON a.pos = cv.i JOIN l1 b ON b.pos = cv.j),
w0 AS (SELECT pos, 1.0 / sqrt((SELECT d FROM d1)) AS v FROM mu)"""
    for (k <- 1 to iters) {
      sb ++= s""",
s$k AS MATERIALIZED (SELECT cv2.i AS pos, SUM(cv2.c * p.v) AS nv
  FROM cv2 JOIN w${k - 1} p ON p.pos = cv2.j GROUP BY 1),
m$k AS (SELECT sqrt(SUM(nv * nv)) AS nrm FROM s$k),
w$k AS MATERIALIZED (SELECT pos, nv / (SELECT nrm FROM m$k) AS v FROM s$k)"""
    }
    sb ++= s""",
cvv2 AS (SELECT cv2.i AS pos, SUM(cv2.c * p.v) AS cvv
  FROM cv2 JOIN w$iters p ON p.pos = cv2.j GROUP BY 1),
ei2 AS (SELECT SUM(v.v * cvv2.cvv) AS eigval
  FROM cvv2 JOIN w$iters v USING (pos)),
tr2 AS (SELECT SUM(c) AS trace FROM cv2 WHERE i = j)
SELECT w.pos, ROUND(w.v, 6) AS loading,
  ROUND((SELECT eigval FROM ei2), 6) AS eigval,
  ROUND((SELECT eigval FROM ei2) / (SELECT trace FROM tr2), 6)
    AS var_explained
FROM w$iters w ORDER BY pos"""
    sb.toString
  }

  private def pcaCoreSql(iters: Int): String = {
    val sb = new StringBuilder(s"""WITH $embCtes,
nn AS (SELECT COUNT(DISTINCT vec_id)::DOUBLE AS n FROM ex),
mu AS MATERIALIZED (SELECT pos, SUM(x) / (SELECT n FROM nn) AS mu FROM ex GROUP BY pos),
pr AS MATERIALIZED (SELECT a.pos AS i, b.pos AS j, SUM(a.x * b.x) AS sxy
  FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2),
cv AS MATERIALIZED (SELECT i, j, sxy / (SELECT n FROM nn) - mi.mu * mj.mu AS c
  FROM pr JOIN mu mi ON mi.pos = pr.i JOIN mu mj ON mj.pos = pr.j),
d1 AS (SELECT COUNT(*)::DOUBLE AS d FROM mu),
v0 AS (SELECT pos, 1.0 / sqrt((SELECT d FROM d1)) AS v FROM mu)""")
    for (k <- 1 to iters) {
      sb ++= s""",
r$k AS MATERIALIZED (SELECT cv.i AS pos, SUM(cv.c * p.v) AS nv
  FROM cv JOIN v${k - 1} p ON p.pos = cv.j GROUP BY 1),
n$k AS (SELECT sqrt(SUM(nv * nv)) AS nrm FROM r$k),
v$k AS MATERIALIZED (SELECT pos, nv / (SELECT nrm FROM n$k) AS v FROM r$k)"""
    }
    sb ++= s""",
cvv AS (SELECT cv.i AS pos, SUM(cv.c * p.v) AS cvv
  FROM cv JOIN v$iters p ON p.pos = cv.j GROUP BY 1),
ei AS (SELECT SUM(v.v * cvv.cvv) AS eigval FROM cvv JOIN v$iters v USING (pos)),
tr AS (SELECT SUM(c) AS trace FROM cv WHERE i = j)"""
    sb.toString
  }

  /** Effective-rank mirror: same one-pass covariance cells, trace and
    * Frobenius sums off the d×d frame. */
  val effectiveRankSql: String =
    s"""WITH $embCtes,
nn AS (SELECT COUNT(DISTINCT vec_id)::DOUBLE AS n FROM ex),
mu AS MATERIALIZED (SELECT pos, SUM(x) / (SELECT n FROM nn) AS mu FROM ex GROUP BY pos),
pr AS MATERIALIZED (SELECT a.pos AS i, b.pos AS j, SUM(a.x * b.x) AS sxy
  FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2),
cv AS MATERIALIZED (SELECT i, j, sxy / (SELECT n FROM nn) - mi.mu * mj.mu AS c
  FROM pr JOIN mu mi ON mi.pos = pr.i JOIN mu mj ON mj.pos = pr.j),
ag AS (SELECT COUNT(*) AS cells,
  SUM(CASE WHEN i = j THEN c ELSE CAST(0 AS DOUBLE) END) AS tr,
  SUM(c * c) AS fro2 FROM cv)
SELECT CAST(CAST(sqrt(cells::DOUBLE) AS DOUBLE) AS BIGINT) AS n_dims,
  ROUND(tr, 6) AS trace, ROUND(fro2, 6) AS frobenius2,
  ROUND(tr * tr / fro2, 6) AS effective_rank,
  ROUND(tr * tr / fro2 / sqrt(cells::DOUBLE), 6) AS rank_share
FROM ag"""

  /** Shared CTE prefix for the filter-agreement family: the 6-dp
    * quality score (ff.q) and the Gopher keep predicate (gp.keep). */
  private def qualityGateCtes(minWords: Int, maxTopFrac: Double): String =
    s"""qq AS (SELECT doc_id,
  CAST(len(text) AS BIGINT) AS chars,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS words,
  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS punct,
  CAST(len(regexp_extract_all(text, '\\b(the|a|is)\\b')) AS BIGINT) AS stop
  FROM documents),
ff AS (SELECT doc_id,
  ROUND(0.4 * least(words / 100.0, 1.0) + 0.3 * (1.0 - punct / chars)
      + 0.3 * least(5.0 * stop / words, 1.0), 6) AS q FROM qq),
w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tc AS (SELECT doc_id, term, COUNT(*) AS c FROM w GROUP BY 1, 2),
m AS (SELECT doc_id, SUM(c) AS words, MAX(c) AS topc,
             SUM(c * length(term)) / SUM(c) AS mwl,
             SUM(CASE WHEN regexp_full_match(term, '[A-Za-z]+') THEN c ELSE 0 END)
               / SUM(c) AS alpha
      FROM tc GROUP BY 1),
s AS (SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\\b(the|a|is|and|of)\\b')) AS BIGINT)
               AS stop_hits FROM documents),
gp AS (SELECT m.doc_id,
  (words >= $minWords AND mwl >= 3.0 AND mwl <= 10.0 AND alpha >= 0.8
   AND s.stop_hits >= 2 AND topc / words <= $maxTopFrac) AS keep
  FROM m JOIN s USING (doc_id))"""

  /** Filter-agreement κ mirror: the shared 6-dp quality gate joined
    * to the Gopher keep predicate, exact contingency counts, same
    * double op order for po/pe/κ. */
  def filterKappaSql(theta: Double = 0.5, minWords: Int = 20,
                     maxTopFrac: Double = 0.2): String =
    s"""WITH ${qualityGateCtes(minWords, maxTopFrac)},
ab AS (SELECT CASE WHEN ff.q >= $theta THEN 1 ELSE 0 END AS a,
  CASE WHEN gp.keep THEN 1 ELSE 0 END AS b
  FROM ff JOIN gp USING (doc_id)),
ct AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(a * b) AS BIGINT) AS n11,
  CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
  CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
  CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00 FROM ab)
SELECT n, n11, n10, n01, n00,
  ROUND(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
  ROUND((CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE) +
    CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE)) /
    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe,
  ROUND(CASE WHEN (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE) +
      CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE)) /
      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < CAST(1 AS DOUBLE)
    THEN (CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) -
      (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE) +
       CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE)) /
      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) /
      (CAST(1 AS DOUBLE) -
      (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE) +
       CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE)) /
      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
    END, 6) AS kappa
FROM ct"""

  /** ECE mirror: same 10-bin split of the 6-dp quality score against
    * the Gopher keep rate, same Σ(n/N)·|acc − conf|. */
  def calibrationEceSql(minWords: Int = 20,
                        maxTopFrac: Double = 0.2): String =
    s"""WITH ${qualityGateCtes(minWords, maxTopFrac)},
b AS (SELECT CAST(LEAST(floor(ff.q * 10.0), 9.0) AS BIGINT) AS bin,
  ff.q, CASE WHEN gp.keep THEN 1 ELSE 0 END AS y
  FROM ff JOIN gp USING (doc_id)),
per AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs, SUM(q) AS sq,
  CAST(SUM(y) AS BIGINT) AS sy FROM b GROUP BY 1),
tot AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS nn FROM per),
ec AS (SELECT SUM((CAST(n_docs AS DOUBLE) / nn) *
  ABS(CAST(sy AS DOUBLE) / CAST(n_docs AS DOUBLE) -
    sq / CAST(n_docs AS DOUBLE))) AS ece FROM per, tot)
SELECT bin, n_docs,
  ROUND(sq / CAST(n_docs AS DOUBLE), 6) AS conf,
  ROUND(CAST(sy AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS acc,
  ROUND(ABS(CAST(sy AS DOUBLE) / CAST(n_docs AS DOUBLE) -
    sq / CAST(n_docs AS DOUBLE)), 6) AS gap,
  ROUND((SELECT ece FROM ec), 6) AS ece
FROM per ORDER BY bin"""

  /** MMR mirror: the cosineTopK candidate formula, the same pairwise
    * 6-dp cosine sims, and the greedy loop unrolled into selectK
    * chained CTEs — each step a NOT EXISTS drop of the selected set, a
    * max-sim roll-up, and an argmax. Scores use the integerized
    * λT·ri − (10−λT)·si form in exact 10⁻⁷-unit BIGINTs, mirroring
    * Similarity.mmrRerank — float round() half-boundaries can't
    * diverge between engines when the fold is integer. */
  def mmrSql(candK: Int, selectK: Int, lambdaTenths: Int): String = {
    val lamT = lambdaTenths
    val omT = 10 - lambdaTenths
    val sb = new StringBuilder(s"""WITH $embCtes,
dots AS (SELECT q.vec_id AS qid, v.vec_id AS vid, SUM(q.x * v.x) AS dot
         FROM ex q JOIN ex v ON q.pos = v.pos AND q.vec_id < 10 AND v.vec_id >= 10
         GROUP BY 1, 2),
cos AS (SELECT qid, vid, ROUND(dot / (qn.nrm * vn.nrm), 6) AS rel
        FROM dots JOIN nrm qn ON qn.vec_id = qid JOIN nrm vn ON vn.vec_id = vid),
cand AS MATERIALIZED (SELECT qid, vid,
  CAST(floor(rel * 1000000.0 + 0.5) AS BIGINT) AS ri FROM (
  SELECT qid, vid, rel, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, vid ASC) AS rn
  FROM cos) WHERE rn <= $candK),
prs AS (SELECT c1.qid, c1.vid AS va, c2.vid AS vb
        FROM cand c1 JOIN cand c2 ON c1.qid = c2.qid AND c1.vid < c2.vid),
pd AS (SELECT p.qid, p.va, p.vb, SUM(x.x * y.x) AS dot
       FROM prs p JOIN ex x ON x.vec_id = p.va
       JOIN ex y ON y.vec_id = p.vb AND y.pos = x.pos
       GROUP BY 1, 2, 3),
ps AS (SELECT qid, va, vb,
  CAST(floor(ROUND(dot / (na.nrm * nb.nrm), 6) * 1000000.0 + 0.5) AS BIGINT) AS si
       FROM pd JOIN nrm na ON na.vec_id = va JOIN nrm nb ON nb.vec_id = vb),
sym AS MATERIALIZED (SELECT qid, va, vb, si FROM ps
  UNION ALL SELECT qid, vb, va, si FROM ps),
sel1 AS (SELECT qid, vid, CAST(1 AS BIGINT) AS step, $lamT * ri AS scorei
  FROM (SELECT qid, vid, ri,
    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ri DESC, vid ASC) AS rn
    FROM cand) WHERE rn = 1)""")
    for (t <- 2 to selectK) {
      sb ++= s""",
ms$t AS (SELECT y.qid, y.va AS vid, MAX(y.si) AS msi
  FROM sym y JOIN sel${t - 1} s ON s.qid = y.qid AND s.vid = y.vb
  WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} z WHERE z.qid = y.qid AND z.vid = y.va)
  GROUP BY 1, 2),
pick$t AS (SELECT qid, vid, CAST($t AS BIGINT) AS step, scorei FROM (
  SELECT m.qid, m.vid, $lamT * c.ri - $omT * m.msi AS scorei,
    ROW_NUMBER() OVER (PARTITION BY m.qid
      ORDER BY $lamT * c.ri - $omT * m.msi DESC, m.vid ASC) AS rn
  FROM ms$t m JOIN cand c ON c.qid = m.qid AND c.vid = m.vid) WHERE rn = 1),
sel$t AS (SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM pick$t)"""
    }
    sb ++= s"""
SELECT CAST(qid AS BIGINT) AS qid, step, CAST(vid AS BIGINT) AS vid,
  scorei / 10000000.0 AS score
FROM sel$selectK ORDER BY qid, step"""
    sb.toString
  }

  val annLshSql: String =
    s"""WITH $embCtes,
w AS MATERIALIZED (
  SELECT p AS plane, d AS pos, ${h60("'lsh:' || p || ':' || d")} % 2001 - 1000 AS w
  FROM unnest(generate_series(0, 3)) AS tp(p), unnest(generate_series(0, 63)) AS td(d)),
proj AS MATERIALIZED (SELECT e.vec_id, w.plane, SUM(w.w * e.x) AS proj
  FROM ex e JOIN w ON w.pos = e.pos GROUP BY 1, 2),
bk AS MATERIALIZED (SELECT vec_id,
  SUM(CASE WHEN proj >= 0 THEN CAST(1 AS BIGINT) << CAST(plane AS INT) ELSE CAST(0 AS BIGINT) END) AS bucket
  FROM proj GROUP BY vec_id),
dots AS (SELECT q.vec_id AS qid, v.vec_id AS vid, SUM(q.x * v.x) AS dot
         FROM ex q JOIN bk qb ON qb.vec_id = q.vec_id
         JOIN ex v ON v.pos = q.pos JOIN bk vb ON vb.vec_id = v.vec_id AND vb.bucket = qb.bucket
         WHERE q.vec_id < 10 AND v.vec_id >= 10
         GROUP BY 1, 2),
cos AS (SELECT qid, vid, ROUND(dot / (qn.nrm * vn.nrm), 6) AS cosine
        FROM dots JOIN nrm qn ON qn.vec_id = qid JOIN nrm vn ON vn.vec_id = vid),
rk AS (SELECT qid, vid, cosine, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid ASC) AS rn FROM cos)
SELECT qid, vid, cosine, CAST(rn AS BIGINT) AS rnk FROM rk WHERE rn <= 3"""

  /** ANN-recall mirror: the annLsh chain and the brute-force chain
    * over the same shared ex/nrm CTEs, cut at the same k, joined per
    * probe. */
  def annRecallSql(k: Int): String =
    s"""WITH $embCtes,
w AS MATERIALIZED (
  SELECT p AS plane, d AS pos, ${h60("'lsh:' || p || ':' || d")} % 2001 - 1000 AS w
  FROM unnest(generate_series(0, 3)) AS tp(p), unnest(generate_series(0, 63)) AS td(d)),
proj AS MATERIALIZED (SELECT e.vec_id, w.plane, SUM(w.w * e.x) AS proj
  FROM ex e JOIN w ON w.pos = e.pos GROUP BY 1, 2),
bk AS MATERIALIZED (SELECT vec_id,
  SUM(CASE WHEN proj >= 0 THEN CAST(1 AS BIGINT) << CAST(plane AS INT) ELSE CAST(0 AS BIGINT) END) AS bucket
  FROM proj GROUP BY vec_id),
ldots AS (SELECT q.vec_id AS qid, v.vec_id AS vid, SUM(q.x * v.x) AS dot
         FROM ex q JOIN bk qb ON qb.vec_id = q.vec_id
         JOIN ex v ON v.pos = q.pos JOIN bk vb ON vb.vec_id = v.vec_id AND vb.bucket = qb.bucket
         WHERE q.vec_id < 10 AND v.vec_id >= 10
         GROUP BY 1, 2),
lcos AS (SELECT qid, vid, ROUND(dot / (qn.nrm * vn.nrm), 6) AS cosine
        FROM ldots JOIN nrm qn ON qn.vec_id = qid JOIN nrm vn ON vn.vec_id = vid),
lsh AS (SELECT qid, vid FROM (
  SELECT qid, vid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid ASC) AS rn
  FROM lcos) WHERE rn <= $k),
edots AS (SELECT q.vec_id AS qid, v.vec_id AS vid, SUM(q.x * v.x) AS dot
         FROM ex q JOIN ex v ON q.pos = v.pos AND q.vec_id < 10 AND v.vec_id >= 10
         GROUP BY 1, 2),
ecos AS (SELECT qid, vid, ROUND(dot / (qn.nrm * vn.nrm), 6) AS cosine
        FROM edots JOIN nrm qn ON qn.vec_id = qid JOIN nrm vn ON vn.vec_id = vid),
exact AS (SELECT qid, vid FROM (
  SELECT qid, vid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid ASC) AS rn
  FROM ecos) WHERE rn <= $k),
hits AS (SELECT e.qid, COUNT(*) AS n_hit FROM exact e
  JOIN lsh l ON l.qid = e.qid AND l.vid = e.vid GROUP BY 1),
exn AS (SELECT qid, COUNT(*) AS n_exact FROM exact GROUP BY 1)
SELECT x.qid, CAST(x.n_exact AS BIGINT) AS n_exact,
  CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
  ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / x.n_exact, 6) AS recall
FROM exn x LEFT JOIN hits h ON h.qid = x.qid ORDER BY x.qid"""

  /** Cosine near-dup pairs: 8-plane LSH buckets + exact cosine ≥ τ —
    * same weights formula as the Spark side at any dims (the Spark side
    * derives dims from the data; this mirror enumerates the testdata's
    * 64 positions). */
  def cosineNearDupSql(planes: Int, minCosine: Double): String =
    s"""WITH $embCtes,
w AS MATERIALIZED (
  SELECT p AS plane, d AS pos, ${h60("'lsh:' || p || ':' || d")} % 2001 - 1000 AS w
  FROM unnest(generate_series(0, ${planes - 1})) AS tp(p), unnest(generate_series(0, 63)) AS td(d)),
proj AS MATERIALIZED (SELECT e.vec_id, w.plane, SUM(w.w * e.x) AS proj
  FROM ex e JOIN w ON w.pos = e.pos GROUP BY 1, 2),
bk AS MATERIALIZED (SELECT vec_id,
  SUM(CASE WHEN proj >= 0 THEN CAST(1 AS BIGINT) << CAST(plane AS INT) ELSE CAST(0 AS BIGINT) END) AS bucket
  FROM proj GROUP BY vec_id),
cand AS (SELECT x.vec_id AS a, y.vec_id AS b FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.vec_id < y.vec_id),
dots AS (SELECT c.a, c.b, SUM(x.x * y.x) AS dot
         FROM cand c JOIN ex x ON x.vec_id = c.a JOIN ex y ON y.vec_id = c.b AND y.pos = x.pos
         GROUP BY 1, 2),
cos AS (SELECT a, b, ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
        FROM dots JOIN nrm na ON na.vec_id = a JOIN nrm nb ON nb.vec_id = b)
SELECT a, b, cosine FROM cos WHERE cosine >= $minCosine"""

  /** Semantic-audit mirror: cosine over the minhash candidate pairs,
    * bucketed by decile. */
  val semanticAuditSql: String =
    s"""WITH ${minhashCtes(16, 4)},
$embCtes,
dots AS (SELECT p.a, p.b, SUM(xa.x * xb.x) AS dot
         FROM pairs p JOIN ex xa ON xa.vec_id = p.a
         JOIN ex xb ON xb.vec_id = p.b AND xb.pos = xa.pos
         GROUP BY 1, 2),
cos AS (SELECT ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
        FROM dots JOIN nrm na ON na.vec_id = a JOIN nrm nb ON nb.vec_id = b)
SELECT CAST(FLOOR(cosine * 10) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(cosine), 6) AS avg_cosine
FROM cos GROUP BY 1"""

  /** Int8 quantization mirror: same scale formula, same floor(·+0.5)
    * rounding over the same IEEE doubles. */
  val quantizeInt8Sql: String =
    s"""WITH $embCtes,
s AS (SELECT vec_id, MAX(ABS(x)) / 127.0 AS scale, COUNT(*) AS dims
      FROM ex GROUP BY vec_id),
q AS (SELECT e.vec_id,
             CASE WHEN s.scale = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(FLOOR(e.x / s.scale + 0.5) AS BIGINT)
             END AS qv
      FROM ex e JOIN s USING (vec_id))
SELECT s.vec_id, ROUND(s.scale, 6) AS scale, CAST(s.dims AS BIGINT) AS dims,
       CAST(SUM(qv) AS BIGINT) AS qsum, MIN(qv) AS qmin, MAX(qv) AS qmax
FROM q JOIN s USING (vec_id) GROUP BY s.vec_id, s.scale, s.dims"""

  /** Quant-error mirror: same scale, same floor(+0.5) level, same
    * per-element 1e-9-unit integerized error (floor BEFORE abs), all
    * cross-row sums exact BIGINT. */
  val quantErrorSql: String =
    s"""WITH $embCtes,
s AS (SELECT vec_id, MAX(ABS(x)) / 127.0 AS scale FROM ex GROUP BY vec_id),
u AS (SELECT e.vec_id,
  CASE WHEN s.scale = 0 THEN CAST(0 AS BIGINT)
       ELSE CAST(FLOOR((e.x - s.scale *
         CAST(FLOOR(e.x / s.scale + 0.5) AS BIGINT)) * 1e9 + 0.5) AS BIGINT)
  END AS un
  FROM ex e JOIN s USING (vec_id)),
lb AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings)
SELECT label, CAST(COUNT(DISTINCT u.vec_id) AS BIGINT) AS n_vecs,
  ROUND(CAST(SUM(ABS(un)) AS DOUBLE) /
    (CAST(COUNT(*) AS DOUBLE) * 1e9), 9) AS mean_abs_err,
  ROUND(CAST(MAX(ABS(un)) AS DOUBLE) / 1e9, 9) AS max_abs_err
FROM u JOIN lb USING (vec_id)
GROUP BY label ORDER BY label"""

  /** Label-balance mirror: same entropy fold, same exp(H) and
    * max/min ratio. */
  val labelBalanceSql: String =
    """WITH lc AS (SELECT CAST(label AS BIGINT) AS label,
  CAST(COUNT(*) AS BIGINT) AS n
  FROM embeddings WHERE label IS NOT NULL GROUP BY 1),
ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_labels, SUM(n) AS tot,
  SUM(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))) AS slc,
  MAX(n) AS nmax, MIN(n) AS nmin FROM lc)
SELECT n_labels, CAST(tot AS BIGINT) AS n_vecs,
  ROUND(ln(CAST(tot AS DOUBLE)) - slc / CAST(tot AS DOUBLE), 6) AS entropy,
  ROUND(exp(ln(CAST(tot AS DOUBLE)) - slc / CAST(tot AS DOUBLE)), 6)
    AS eff_classes,
  ROUND(CAST(nmax AS DOUBLE) / CAST(nmin AS DOUBLE), 6) AS imbalance
FROM ag"""

  /** Embed-outlier mirror: same 1e-7-unit quantization, same
    * HUGEINT-exact n²·dist² sums (the decimal(38,0) twin), same
    * multiplied-through integer outlier compare. */
  def embedOutliersSql(factor: Int = 4): String =
    s"""WITH el AS MATERIALIZED (
  SELECT vec_id, CAST(label AS BIGINT) AS label, i - 1 AS pos,
    CAST(FLOOR(embedding[i]::DOUBLE * 1e7 + 0.5) AS BIGINT) AS q
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
  WHERE label IS NOT NULL),
dims AS (SELECT label, pos, CAST(SUM(q) AS BIGINT) AS sq
  FROM el GROUP BY 1, 2),
sz AS (SELECT label, CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n
  FROM el GROUP BY 1),
dist AS (SELECT el.label, el.vec_id, sz.n,
    SUM(CAST(sz.n * el.q - d.sq AS HUGEINT) * (sz.n * el.q - d.sq)) AS d2
  FROM el JOIN dims d ON d.label = el.label AND d.pos = el.pos
  JOIN sz ON sz.label = el.label
  GROUP BY 1, 2, 3),
per AS (SELECT label, SUM(d2) AS d2sum FROM dist GROUP BY 1)
SELECT dist.label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
  CAST(SUM(CASE WHEN dist.d2 * dist.n > $factor * per.d2sum
    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
  ROUND(SUM(CASE WHEN dist.d2 * dist.n > $factor * per.d2sum
    THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6) AS outlier_share,
  ROUND(sqrt(AVG(CAST(dist.d2 AS DOUBLE)) /
    CAST(MAX(dist.n) * MAX(dist.n) AS DOUBLE)) / 1e7, 6) AS rms_dist
FROM dist JOIN per ON per.label = dist.label
GROUP BY dist.label ORDER BY dist.label"""

  /** Vocab-coverage mirror: same (frequency, n_terms) class frame,
    * same 100·cum ≥ pct·T integer boundary, same ceil-division
    * remainder (`//` ≡ DIV on the positive operands). */
  def vocabCoverageSql(targets: Seq[Int] = Seq(50, 80, 90, 95)): String =
    s"""WITH tcn AS (SELECT t AS term, COUNT(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> '' GROUP BY 1),
g AS (SELECT c AS cnt, CAST(COUNT(*) AS BIGINT) AS nt FROM tcn GROUP BY 1),
cum AS (SELECT cnt, nt, cnt * nt AS mass,
  SUM(cnt * nt) OVER (ORDER BY cnt DESC ROWS UNBOUNDED PRECEDING) AS cum,
  COALESCE(SUM(nt) OVER (ORDER BY cnt DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tprev
  FROM g),
tt AS (SELECT SUM(cnt * nt) AS tt FROM g),
tg AS (SELECT unnest([${targets.mkString(", ")}]) AS pct),
q AS (SELECT pct, cum, cnt, tprev, mass, tt.tt
  FROM cum CROSS JOIN tt CROSS JOIN tg
  WHERE cum * 100 >= pct * tt.tt),
pick AS (SELECT pct, MIN(cum) AS mcum FROM q GROUP BY 1),
r AS (SELECT q.*, (q.pct * tt - 100 * (cum - mass) + 100 * cnt - 1)
    // (100 * cnt) AS j
  FROM q JOIN pick ON pick.pct = q.pct AND pick.mcum = q.cum)
SELECT CAST(pct AS BIGINT) AS pct,
  CAST(tprev + j AS BIGINT) AS k_terms,
  ROUND(CAST((cum - mass) + j * cnt AS DOUBLE) / CAST(tt AS DOUBLE), 6)
    AS coverage
FROM r ORDER BY pct"""

  private val markerRes = Seq(
    "en" -> "\\b(the|a|is)\\b",
    "de" -> "\\b(der|die|das)\\b",
    "es" -> "\\b(el|los|una)\\b",
    "fr" -> "\\b(le|la|les)\\b",
    "zh" -> "的")

  val langIdSql: String = {
    val scores = markerRes.map { case (l, re) =>
      s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS s_$l"
    }.mkString(", ")
    val langs = markerRes.map(_._1)
    val cases = langs.init.map { l =>
      val ge = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $ge THEN '$l'"
    }.mkString(" ")
    s"""WITH sc AS (SELECT doc_id, lang, $scores FROM documents)
SELECT doc_id, lang, guess, guess = lang AS matches FROM (
  SELECT doc_id, lang, CASE $cases ELSE '${langs.last}' END AS guess FROM sc) g"""
  }

  val qualitySql: String =
    """WITH q AS (SELECT doc_id,
  CAST(len(text) AS BIGINT) AS chars,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS words,
  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS punct,
  CAST(len(regexp_extract_all(text, '\b(the|a|is)\b')) AS BIGINT) AS stop
  FROM documents)
SELECT doc_id, chars, words,
  ROUND(0.4 * least(words / 100.0, 1.0) + 0.3 * (1.0 - punct / chars)
      + 0.3 * least(5.0 * stop / words, 1.0), 6) AS quality
FROM q"""

  /** Top-k by the shared quality formula per source: ranks the same
    * 6-dp-rounded quality the Spark side ranks, doc_id tiebreak. */
  def topDocsSql(k: Int): String =
    s"""WITH q AS (SELECT doc_id, source,
  CAST(len(text) AS BIGINT) AS chars,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS words,
  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS punct,
  CAST(len(regexp_extract_all(text, '\\b(the|a|is)\\b')) AS BIGINT) AS stop
  FROM documents),
 s AS (SELECT doc_id, source,
  ROUND(0.4 * least(words / 100.0, 1.0) + 0.3 * (1.0 - punct / chars)
      + 0.3 * least(5.0 * stop / words, 1.0), 6) AS quality
  FROM q)
SELECT source, rn, CAST(doc_id AS BIGINT) AS doc_id, quality FROM (
  SELECT source, doc_id, quality,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS rn
  FROM s) t WHERE rn <= $k ORDER BY source, rn"""

  /** Quota-sample mirror: rank by the DOUBLE-cast hash (matching the
    * Spark side's double score exactly, rounding included), doc_id
    * tiebreak. */
  def quotaSampleSql(n: Int): String =
    s"""WITH h AS (SELECT source, doc_id,
  CAST(${h60("'qs:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE) AS hd
  FROM documents)
SELECT source, rn, CAST(doc_id AS BIGINT) AS doc_id FROM (
  SELECT source, doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY hd ASC, doc_id ASC) AS BIGINT) AS rn
  FROM h) t WHERE rn <= $n ORDER BY source, rn"""

  /** BPE pair mirror: same word split, same within-word adjacent
    * character pairs. */
  def bpePairsSql(topN: Int): String =
    s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
p AS (SELECT substr(w, i, 2) AS pair
  FROM (SELECT w FROM w WHERE len(w) >= 2),
       unnest(generate_series(1, len(w) - 1)) AS t(i))
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM p
GROUP BY pair ORDER BY n DESC, pair ASC LIMIT $topN"""

  /** Rollup mirror: GROUPING bitmask identical to Spark's
    * grouping_id(source, lang). */
  val corpusRollupSql: String =
    """SELECT coalesce(source, 'ALL') AS source, coalesce(lang, 'ALL') AS lang,
  CAST(GROUPING(source, lang) AS BIGINT) AS gid,
  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY ROLLUP(source, lang)
ORDER BY gid, source, lang"""

  /** Efraimidis–Spirakis mirror: the same hash-derived uniform and
    * exponential-race key ln(u)/w, ranked (key DESC, doc_id ASC) —
    * output is integer rank + id, so no float column is compared. */
  def weightedSampleSql(k: Int): String =
    s"""WITH h AS (SELECT doc_id,
  ln((CAST(${h60("'ws:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE) + 1.0)
     / pow(2.0, 60.0)) / CAST(n_chars AS DOUBLE) AS key
  FROM documents)
SELECT rn, CAST(doc_id AS BIGINT) AS doc_id FROM (
  SELECT doc_id, CAST(ROW_NUMBER() OVER
    (ORDER BY key DESC, doc_id ASC) AS BIGINT) AS rn
  FROM h) t WHERE rn <= $k ORDER BY rn"""

  /** Hashing-trick mirror: same bucket hash, same c/sqrt(s2) operator
    * order, 6-dp round. */
  def hashedFeaturesSql(dim: Int): String =
    s"""WITH c AS (SELECT doc_id,
  ${h60("'fh:' || term")} % $dim AS pos, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> '' GROUP BY 1, 2),
 n AS (SELECT doc_id, SUM(c * c) AS s2 FROM c GROUP BY 1)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(pos AS BIGINT) AS pos,
       ROUND(CAST(c AS DOUBLE) / sqrt(CAST(s2 AS DOUBLE)), 6) AS v
FROM c JOIN n USING (doc_id)"""

  val tokenCountSql: String =
    """SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS bpe_tokens
FROM documents"""

  val fingerprintSql: String =
    s"""WITH sh8 AS MATERIALIZED (
  SELECT doc_id, substr(text, i, 8) AS sh
  FROM documents, unnest(generate_series(1, greatest(len(text) - 7, 1))) AS t(i))
SELECT doc_id, MIN(${h60("'fp:' || sh")}) AS fp FROM sh8 GROUP BY doc_id"""

  // ---- Corpus-preparation operators (graft.pipeline.Corpus) ----

  /** Connected components over the minhash candidate pairs via a
    * transitive-closure recursive CTE (UNION dedups → terminates);
    * cluster label = min member, matching the Spark CC contract. */
  val dedupClustersSql: String =
    s"""WITH RECURSIVE ${minhashCtes(16, 4)},
sym AS MATERIALIZED (SELECT a AS s, b AS t FROM pairs UNION ALL SELECT b, a FROM pairs),
walk(id, comp) AS (
  SELECT s, s FROM sym
  UNION
  SELECT e.t, w.comp FROM walk w JOIN sym e ON e.s = w.id),
comps AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id)
SELECT comp AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_docs FROM comps GROUP BY comp"""

  /** Cluster-size-histogram mirror: the dedupClusters walk + a size
    * rollup, singleton row = corpus total minus clustered. */
  val clusterSizesSql: String =
    s"""WITH RECURSIVE ${minhashCtes(16, 4)},
sym AS MATERIALIZED (SELECT a AS s, b AS t FROM pairs UNION ALL SELECT b, a FROM pairs),
walk(id, comp) AS (
  SELECT s, s FROM sym
  UNION
  SELECT e.t, w.comp FROM walk w JOIN sym e ON e.s = w.id),
comps AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id),
cl AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS n_docs FROM comps GROUP BY comp),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM documents),
icl AS (SELECT CAST(COALESCE(SUM(n_docs), 0) AS BIGINT) AS clustered FROM cl),
hist AS (SELECT n_docs AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
  FROM cl GROUP BY 1
  UNION ALL SELECT 1, total - clustered FROM tot, icl)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size, n_clusters,
  ROUND(CAST(cluster_size * n_clusters AS DOUBLE) / CAST(total AS DOUBLE), 6)
    AS doc_share
FROM hist CROSS JOIN tot ORDER BY cluster_size"""

  /** Dedup-retention mirror: same walk, removed = member ≠ min-label
    * component, per-source retention. */
  val dedupRetentionSql: String =
    s"""WITH RECURSIVE ${minhashCtes(16, 4)},
sym AS MATERIALIZED (SELECT a AS s, b AS t FROM pairs UNION ALL SELECT b, a FROM pairs),
walk(id, comp) AS (
  SELECT s, s FROM sym
  UNION
  SELECT e.t, w.comp FROM walk w JOIN sym e ON e.s = w.id),
comps AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id),
rm AS (SELECT id AS doc_id FROM comps WHERE id <> comp)
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN rm.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_removed,
  ROUND(1.0 - SUM(CASE WHEN rm.doc_id IS NOT NULL THEN 1 ELSE 0 END) /
    CAST(COUNT(*) AS DOUBLE), 6) AS retention
FROM documents d LEFT JOIN rm ON rm.doc_id = d.doc_id
GROUP BY d.source ORDER BY d.source"""

  /** Segment dedup mirror: same fixed-width token windows, document
    * frequency over the same 60-bit segment hash (so an improbable
    * hash collision collides identically in both engines), survivors
    * re-joined in position order. */
  /** dupSpans mirror: stride-1 windows, df over the window hash, the
    * same gaps-and-islands run grouping and running-max interval
    * union, every step MATERIALIZED. */
  private def dupSpanCtes(width: Int, minDf: Int): String = {
    val w = width
    s"""arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
wins AS MATERIALIZED (
  SELECT doc_id, i - 1 AS pos,
         ${h60(s"'sw:' || array_to_string(a[i : i + $w - 1], ' ')")} AS g
  FROM arr, unnest(generate_series(1, len(a) - $w + 1)) AS t(i)
  WHERE len(a) >= $w),
base AS MATERIALIZED (
  SELECT doc_id, CAST(len(a) AS BIGINT) AS n_tokens,
         CAST(greatest(len(a) - $w + 1, 0) AS BIGINT) AS n_positions
  FROM arr),
dfreq AS MATERIALIZED (
  SELECT g, COUNT(DISTINCT doc_id) AS df FROM wins GROUP BY g),
dup AS MATERIALIZED (
  SELECT w.doc_id, w.pos,
    w.pos - ROW_NUMBER() OVER (PARTITION BY w.doc_id ORDER BY w.pos) AS run
  FROM wins w JOIN dfreq USING (g) WHERE dfreq.df >= $minDf),
runs AS MATERIALIZED (
  SELECT doc_id, run, COUNT(*) AS n_dup_pos,
    MIN(pos) AS cov0, MAX(pos) + $w - 1 AS cov1
  FROM dup GROUP BY 1, 2),
mg AS MATERIALIZED (
  SELECT doc_id, n_dup_pos, cov0, cov1,
    CASE WHEN cov0 > COALESCE(MAX(cov1) OVER (PARTITION BY doc_id
      ORDER BY cov0 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
      THEN 1 ELSE 0 END AS newspan
  FROM runs),
grpd AS MATERIALIZED (
  SELECT doc_id, n_dup_pos, cov0, cov1,
    SUM(newspan) OVER (PARTITION BY doc_id ORDER BY cov0) AS grp
  FROM mg),
spans AS MATERIALIZED (
  SELECT doc_id, grp, SUM(n_dup_pos) AS dp, MIN(cov0) AS c0, MAX(cov1) AS c1
  FROM grpd GROUP BY 1, 2)"""
  }

  def dupSpansSql(width: Int, minDf: Int): String =
    s"""WITH ${dupSpanCtes(width, minDf)},
agg AS MATERIALIZED (
  SELECT doc_id, CAST(SUM(dp) AS BIGINT) AS n_dup_positions,
    CAST(COUNT(*) AS BIGINT) AS n_spans,
    CAST(SUM(c1 - c0 + 1) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY 1)
SELECT b.doc_id, b.n_tokens, b.n_positions,
  COALESCE(a.n_dup_positions, 0) AS n_dup_positions,
  COALESCE(a.n_spans, 0) AS n_spans,
  COALESCE(a.dup_tokens, 0) AS dup_tokens,
  ROUND(CAST(COALESCE(a.dup_tokens, 0) AS DOUBLE) / b.n_tokens, 6) AS dup_share
FROM base b LEFT JOIN agg a USING (doc_id)"""

  /** stripDupSpans mirror: the same span chain, tokens marked covered
    * via the doc-bounded range join, ordered reassembly of survivors. */
  def stripDupSpansSql(width: Int, minDf: Int): String =
    s"""WITH ${dupSpanCtes(width, minDf)},
toks AS MATERIALIZED (
  SELECT doc_id, i - 1 AS tpos, a[i] AS tok
  FROM arr, unnest(generate_series(1, len(a))) AS t(i)),
marked AS MATERIALIZED (
  SELECT t.doc_id, t.tpos, t.tok,
    MAX(CASE WHEN s.c0 IS NOT NULL AND t.tpos BETWEEN s.c0 AND s.c1
      THEN 1 ELSE 0 END) AS covered
  FROM toks t LEFT JOIN spans s ON t.doc_id = s.doc_id
  GROUP BY 1, 2, 3)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(covered) AS BIGINT) AS dup_tokens,
  COALESCE(string_agg(tok, ' ' ORDER BY tpos) FILTER (WHERE covered = 0), '')
    AS clean_text
FROM marked GROUP BY 1"""

  /** unicodeAudit mirror: DuckDB's built-in nfc_normalize against the
    * native graft_nfc expression — both UAX #15 canonical composition,
    * lengths in code points on both engines. */
  val unicodeAuditSql: String =
    """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN nfc_normalize(text) <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_nonnfc,
  CAST(SUM(length(text) - length(nfc_normalize(text))) AS BIGINT) AS nfc_len_delta,
  CAST(SUM(CASE WHEN length(text) > length(replace(text, chr(65533), '')) THEN 1 ELSE 0 END) AS BIGINT) AS n_replacement_docs,
  CAST(SUM(length(text) - length(replace(text, chr(65533), ''))) AS BIGINT) AS n_replacement_chars
FROM documents GROUP BY 1"""

  def segmentDedupSql(width: Int, minDf: Int): String =
    s"""WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
segs AS MATERIALIZED (
  SELECT doc_id, i AS pos, array_to_string(a[i*$width+1 : i*$width+$width], ' ') AS seg
  FROM arr, unnest(generate_series(0, (len(a)-1) // $width)) AS t(i)),
hs AS (SELECT doc_id, pos, seg, ${h60("'sg:' || seg")} AS g FROM segs),
dfreq AS (SELECT g, COUNT(DISTINCT doc_id) AS df FROM hs GROUP BY g)
SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
  CAST(COALESCE(SUM(CASE WHEN dfreq.df < $minDf THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_kept,
  COALESCE(string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE dfreq.df < $minDf), '') AS clean_text
FROM hs s JOIN dfreq USING (g) GROUP BY s.doc_id"""

  /** Shared winnowing CTE chain ending in `fp(doc_id, fp)` — the
    * fingerprint formula is the bit-for-bit contract with
    * TextOps.winnow, so there is exactly ONE copy of it, composed by
    * both winnowSql and winnowPairsSql. */
  private def winnowCtes(k: Int, w: Int): String =
    s"""grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos, substr(text, i, $k) AS sh
  FROM documents, unnest(generate_series(1, greatest(len(text) - ${k - 1}, 1))) AS t(i)),
keyed AS (
  SELECT doc_id, pos,
    (${h60("'wn:' || sh")} >> 12) * 4096 + (4095 - (pos % 4096)) AS key
  FROM grams),
win AS (
  SELECT doc_id,
    min(key) OVER (PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS sel,
    count(*) OVER (PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS n
  FROM keyed),
fp AS MATERIALIZED (SELECT DISTINCT doc_id, sel >> 12 AS fp FROM win WHERE n = $w)"""

  /** Winnowing mirror: same k-grams, same composite (hash≫12, 4095−pos
    * mod 4096) key, same full-window MIN — fingerprints match bit-for-
    * bit. */
  def winnowSql(k: Int, w: Int): String =
    s"WITH ${winnowCtes(k, w)} SELECT doc_id, fp FROM fp"

  def winnowPairsSql(k: Int, w: Int, minShared: Int, maxDf: Int): String =
    s"""WITH ${winnowCtes(k, w)},
rare AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) <= $maxDf),
f AS (SELECT doc_id, fp FROM fp WHERE fp IN (SELECT fp FROM rare))
SELECT x.doc_id AS a, y.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM f x JOIN f y ON x.fp = y.fp AND x.doc_id < y.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= $minShared"""

  /** Per-source mix report mirror — quality formula shared with
    * qualityQuantilesSql. */
  val mixReportSql: String =
    """WITH q AS (SELECT doc_id, source,
  CAST(len(text) AS BIGINT) AS chars,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS words,
  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS punct,
  CAST(len(regexp_extract_all(text, '\b(the|a|is)\b')) AS BIGINT) AS stop
  FROM documents),
qs AS (SELECT doc_id, source, words,
  ROUND(0.4 * least(words / 100.0, 1.0) + 0.3 * (1.0 - punct / chars)
      + 0.3 * least(5.0 * stop / words, 1.0), 6) AS quality FROM q)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(words) AS BIGINT) AS total_tokens,
       ROUND(AVG(quality), 6) AS mean_quality
FROM qs GROUP BY source"""

  /** Temperature-scaled source mixing: p_s ∝ n_s^alpha, normalized;
    * shares/boost/epochs rounded at 6 dp exactly like the Spark side
    * (power(n, 0.5) is IEEE sqrt in both engines). */
  def temperatureMixSql(alpha: Double, budgetDocs: Long): String =
    s"""WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1),
tot AS (SELECT SUM(n) AS tot, SUM(power(n, $alpha)) AS ptot FROM per)
SELECT source, n AS n_docs,
  ROUND(n / tot, 6) AS nat_share,
  ROUND(power(n, $alpha) / ptot, 6) AS temp_share,
  ROUND((power(n, $alpha) / ptot) / (n / tot), 6) AS boost,
  ROUND($budgetDocs.0 * (power(n, $alpha) / ptot) / n, 6) AS epochs
FROM per, tot"""

  /** Quality-aware canonical pick per exact-dup group: the same md5
    * fingerprint as dedupExactSql, survivor = best 6-dp quality then
    * smallest doc_id. */
  val canonicalDedupSql: String =
    """WITH q AS (SELECT doc_id, md5(lower(substr(text, 1, 100))) AS fp,
  CAST(len(text) AS BIGINT) AS chars,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS words,
  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS punct,
  CAST(len(regexp_extract_all(text, '\b(the|a|is)\b')) AS BIGINT) AS stop
  FROM documents),
s AS (SELECT doc_id, fp,
  ROUND(0.4 * least(words / 100.0, 1.0) + 0.3 * (1.0 - punct / chars)
      + 0.3 * least(5.0 * stop / words, 1.0), 6) AS quality FROM q),
r AS (SELECT fp, doc_id, quality,
  ROW_NUMBER() OVER (PARTITION BY fp ORDER BY quality DESC, doc_id ASC) AS rn,
  COUNT(*) OVER (PARTITION BY fp) AS cnt,
  MAX(quality) OVER (PARTITION BY fp) AS best_quality,
  MIN(quality) OVER (PARTITION BY fp) AS worst_quality
  FROM s)
SELECT fp, CAST(doc_id AS BIGINT) AS canonical_id,
  CAST(cnt AS BIGINT) AS n_members, best_quality, worst_quality
FROM r WHERE rn = 1 AND cnt > 1"""

  val sourceOverlapSql: String =
    s"""WITH ${minhashCtes(16, 4)}
SELECT least(da.source, db.source) AS src_a,
       greatest(da.source, db.source) AS src_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs p
JOIN documents da ON p.a = da.doc_id
JOIN documents db ON p.b = db.doc_id
GROUP BY 1, 2"""

  /** KMV set-ops mirror — the sketch runs in its exact regime
    * (capacity ≥ every pairwise union), so union/intersection
    * estimates equal the true distinct-term counts. */
  val sourceSetOpsSql: String =
    """WITH dt AS MATERIALIZED (SELECT DISTINCT source, term FROM
  (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''),
c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM dt GROUP BY source),
i AS (SELECT x.source AS src_a, y.source AS src_b, CAST(COUNT(*) AS BIGINT) AS ni
  FROM dt x JOIN dt y ON x.term = y.term AND x.source < y.source
  GROUP BY 1, 2)
SELECT ca.source AS src_a, cb.source AS src_b,
  ca.n + cb.n - COALESCE(i.ni, 0) AS union_d,
  COALESCE(i.ni, 0) AS inter_d
FROM c ca JOIN c cb ON ca.source < cb.source
LEFT JOIN i ON i.src_a = ca.source AND i.src_b = cb.source
ORDER BY src_a, src_b"""

  def hashSampleSql(pct: Int): String =
    s"""SELECT doc_id, lang FROM documents
WHERE ${h60("'s:' || CAST(doc_id AS VARCHAR)")} % 100 < $pct"""

  def packBinsSql(capacity: Long): String =
    s"""WITH tok AS (SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS tokens FROM documents),
c AS (SELECT doc_id, tokens, SUM(tokens) OVER (ORDER BY doc_id) AS cum FROM tok)
SELECT CAST(FLOOR((cum - tokens) / $capacity) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tokens) AS BIGINT) AS total_tokens
FROM c GROUP BY 1"""

  /** Fulltext OR/AND retrieval mirror (reference index_advanced.rs:129
    * `search` / :168 `search_and`): the SAME tokenizer as the Spark
    * plan — whitespace split, strip non-alphanumerics (Unicode classes,
    * RE2 ≡ Java on \p{L}\p{N}), lowercase — then distinct-matched-term
    * counts per doc; AND demands every query term. `terms` must already
    * be tokenized (Fulltext.tokenizeQuery runs driver-side and both
    * engines receive the same literal list). */
  def fulltextSql(terms: Seq[String], requireAll: Boolean): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val having = if (requireAll) s"HAVING COUNT(DISTINCT term) = ${terms.size}" else ""
    s"""WITH tk AS (SELECT doc_id,
  lower(regexp_replace(w, '[^\\p{L}\\p{N}]', '', 'g')) AS term
  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w
        FROM documents))
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(DISTINCT term) AS BIGINT) AS n_matched
FROM tk WHERE term IN ($inList) GROUP BY 1 $having"""
  }

  /** Ranked fulltext mirror: the fulltextSql tokenizer (whitespace
    * split → strip non-alphanumerics → lowercase) feeding the bm25Sql
    * formula verbatim — same constants, same operator order, same
    * 6-dp round, doc_id tiebreak at the LIMIT. */
  def fulltextBm25Sql(terms: Seq[String], k1: Double, b: Double,
                      k: Int): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH tk AS (SELECT doc_id,
  lower(regexp_replace(w, '[^\\p{L}\\p{N}]', '', 'g')) AS term
  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w
        FROM documents)
  WHERE lower(regexp_replace(w, '[^\\p{L}\\p{N}]', '', 'g')) <> ''),
 dl AS (SELECT doc_id, COUNT(*) AS dl FROM tk GROUP BY 1),
 st AS (SELECT COUNT(*)::DOUBLE AS n, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl),
 tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk
  WHERE term IN ($inList) GROUP BY 1, 2),
 dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
 sc AS (SELECT tf.doc_id,
     SUM(ln((st.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0) * (tf.tf * ${k1 + 1.0}) /
         (tf.tf + $k1 * (1.0 - $b + $b * dl.dl / st.avgdl))) AS score,
     CAST(COUNT(DISTINCT tf.term) AS BIGINT) AS n_matched
   FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st GROUP BY 1)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_matched, ROUND(score, 6) AS bm25
FROM sc ORDER BY bm25 DESC, doc_id ASC LIMIT $k"""
  }

  /** BM25 against a literal term set — constants (k1, b, k1+1)
    * interpolated from the same Scala doubles the Spark plan uses, and
    * every arithmetic operator in the same order, so the doubles agree
    * before the shared 6-dp rounding. */
  def bm25Sql(terms: Seq[String], k1: Double, b: Double, k: Int): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH tk AS (SELECT doc_id, term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''),
 dl AS (SELECT doc_id, COUNT(*) AS dl FROM tk GROUP BY 1),
 st AS (SELECT COUNT(*)::DOUBLE AS n, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl),
 tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk
  WHERE term IN ($inList) GROUP BY 1, 2),
 dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
 sc AS (SELECT tf.doc_id,
     SUM(ln((st.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0) * (tf.tf * ${k1 + 1.0}) /
         (tf.tf + $k1 * (1.0 - $b + $b * dl.dl / st.avgdl))) AS score
   FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st GROUP BY 1)
SELECT CAST(doc_id AS BIGINT) AS doc_id, ROUND(score, 6) AS bm25
FROM sc ORDER BY bm25 DESC, doc_id ASC LIMIT $k"""
  }

  /** RM3 mirror: same materialized (doc, term) counts, the bm25Sql
    * formula both rounds, same 6-dp-then-rank discipline at the
    * feedback-doc, feedback-term and final cuts. */
  def rm3Sql(rawTerms: Seq[String], k1: Double, b: Double, fbDocs: Int,
             fbTerms: Int, lambda: Double, k: Int): String = {
    val terms = rawTerms.distinct // mirror rm3Retrieval's seed dedupe
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val termVals = terms.map(t => s"('$t')").mkString(", ")
    s"""WITH tk AS (SELECT doc_id, term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''),
tfa AS MATERIALIZED (SELECT doc_id, term, COUNT(*) AS tf
  FROM tk GROUP BY 1, 2),
dl AS MATERIALIZED (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
  FROM tfa GROUP BY 1),
st AS (SELECT COUNT(*)::DOUBLE AS n, SUM(dl)::DOUBLE / COUNT(*) AS avgdl
  FROM dl),
tfq AS (SELECT doc_id, term, tf FROM tfa WHERE term IN ($inList)),
dfq AS (SELECT term, COUNT(*) AS df FROM tfq GROUP BY 1),
r1 AS (SELECT tfq.doc_id,
  ROUND(SUM(ln((st.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0) *
    (tfq.tf * ${k1 + 1.0}) /
    (tfq.tf + $k1 * (1.0 - $b + $b * dl.dl / st.avgdl))), 6) AS score
  FROM tfq JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1),
fb AS (SELECT doc_id FROM r1 ORDER BY score DESC, doc_id ASC
  LIMIT $fbDocs),
ex AS (SELECT term, CAST($lambda AS DOUBLE) AS w FROM (
  SELECT tfa.term,
    ROUND(SUM(CAST(tfa.tf AS DOUBLE) / CAST(dl.dl AS DOUBLE)), 6) AS fw
  FROM tfa JOIN fb USING (doc_id) JOIN dl USING (doc_id)
  WHERE tfa.term NOT IN ($inList) GROUP BY 1) t
  ORDER BY fw DESC, term ASC LIMIT $fbTerms),
q2 AS (SELECT term, CAST(1 AS DOUBLE) AS w FROM (VALUES $termVals) v(term)
  UNION ALL SELECT term, w FROM ex),
tf2 AS (SELECT tfa.doc_id, tfa.term, tfa.tf, q2.w
  FROM tfa JOIN q2 USING (term)),
df2 AS (SELECT term, COUNT(*) AS df FROM tf2 GROUP BY 1),
sc2 AS (SELECT tf2.doc_id,
  CAST(COUNT(DISTINCT tf2.term) AS BIGINT) AS n_matched,
  ROUND(SUM(tf2.w * (ln((st.n - df2.df + 0.5) / (df2.df + 0.5) + 1.0) *
    (tf2.tf * ${k1 + 1.0}) /
    (tf2.tf + $k1 * (1.0 - $b + $b * dl.dl / st.avgdl)))), 6) AS score
  FROM tf2 JOIN df2 USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  GROUP BY 1),
rk AS (SELECT doc_id, n_matched, score FROM sc2
  ORDER BY score DESC, doc_id ASC LIMIT $k)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
    AS BIGINT) AS rank,
  CAST(doc_id AS BIGINT) AS doc_id, score, n_matched
FROM rk ORDER BY rank"""
  }

  /** Hybrid-RRF mirror: same shared token stream, the same BM25 and
    * Dirichlet-QL formulas op for op (6-dp rounds BEFORE each rank,
    * doc_id tiebreaks), ranks cut at listK in a subquery, absent ranks
    * coalesced to 0 exactly like the Spark fusion join. */
  def hybridRrfSql(terms: Seq[String], k1: Double, b: Double, mu: Double,
                   listK: Int, rrfK: Int, k: Int): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH tk AS (SELECT doc_id, term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''),
 dl AS (SELECT doc_id, COUNT(*) AS dl FROM tk GROUP BY 1),
 st AS (SELECT COUNT(*)::DOUBLE AS n, SUM(dl)::DOUBLE / COUNT(*) AS avgdl,
        SUM(dl)::DOUBLE AS ctot FROM dl),
 tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk
  WHERE term IN ($inList) GROUP BY 1, 2),
 dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
 cf AS (SELECT term, SUM(tf) AS cf FROM tf GROUP BY 1),
 bm AS (SELECT tf.doc_id,
     ROUND(SUM(ln((st.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0) * (tf.tf * ${k1 + 1.0}) /
         (tf.tf + $k1 * (1.0 - $b + $b * dl.dl / st.avgdl))), 6) AS score
   FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st GROUP BY 1),
 cand AS (SELECT DISTINCT doc_id FROM tf),
 ql AS (SELECT c.doc_id,
     ROUND(SUM(ln((COALESCE(tf.tf, 0) + $mu * cf.cf / st.ctot) / (dl.dl + $mu))), 6) AS score
   FROM cand c CROSS JOIN cf
   LEFT JOIN tf ON tf.doc_id = c.doc_id AND tf.term = cf.term
   JOIN dl ON dl.doc_id = c.doc_id CROSS JOIN st GROUP BY 1),
 bmtop AS (SELECT doc_id, r_bm25 FROM (
   SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS r_bm25
   FROM bm) WHERE r_bm25 <= $listK),
 qltop AS (SELECT doc_id, r_ql FROM (
   SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS r_ql
   FROM ql) WHERE r_ql <= $listK)
SELECT CAST(COALESCE(bm.doc_id, q.doc_id) AS BIGINT) AS doc_id,
  ROUND(COALESCE(1.0 / ($rrfK + bm.r_bm25), 0.0) +
        COALESCE(1.0 / ($rrfK + q.r_ql), 0.0), 6) AS rrf,
  CAST(COALESCE(bm.r_bm25, 0) AS BIGINT) AS r_bm25,
  CAST(COALESCE(q.r_ql, 0) AS BIGINT) AS r_ql
FROM bmtop bm FULL OUTER JOIN qltop q ON q.doc_id = bm.doc_id
ORDER BY rrf DESC, doc_id ASC LIMIT $k"""
  }

  /** TF-IDF mirror: same term formula, same (tf/dl)·ln(n/df) operator
    * order, 6-dp rounding BEFORE the rank so both engines rank the
    * same value. */
  def tfidfSql(topN: Int): String =
    s"""WITH tk AS (SELECT doc_id, term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''),
 tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
 dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
 dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
 n AS (SELECT COUNT(DISTINCT doc_id)::DOUBLE AS n FROM tf),
 sc AS (SELECT tf.doc_id, tf.term,
     ROUND((CAST(tf.tf AS DOUBLE) / dl.dl) * ln(n.n / dfq.df), 6) AS tfidf
   FROM tf JOIN dl USING (doc_id) JOIN dfq USING (term) CROSS JOIN n)
SELECT CAST(doc_id AS BIGINT) AS doc_id, term, tfidf, rn FROM (
  SELECT doc_id, term, tfidf,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rn
  FROM sc) t WHERE rn <= $topN"""

  /** PMI mirror — document-level presence, a<b pair orientation, the
    * same ln(cab·D/(ca·cb)) operator order, 6-dp round. No vocab prune:
    * exact ⟺ vocabulary ≤ the Spark side's vocabK (precondition spec),
    * where the top-vocabK prune is a no-op. */
  def termPmiSql(minPairDocs: Long, k: Int): String =
    s"""WITH tk AS (SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''),
 d AS (SELECT COUNT(DISTINCT doc_id)::DOUBLE AS d FROM tk),
 ca AS (SELECT term, COUNT(*) AS c FROM tk GROUP BY 1),
 pr AS (SELECT a.term AS term_a, b.term AS term_b, COUNT(*) AS pair_docs
        FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND a.term < b.term
        GROUP BY 1, 2 HAVING COUNT(*) >= $minPairDocs)
SELECT term_a, term_b, CAST(pair_docs AS BIGINT) AS pair_docs,
       ROUND(ln((CAST(pair_docs AS DOUBLE) * d.d) /
                (CAST(c1.c AS DOUBLE) * c2.c)), 6) AS pmi
FROM pr CROSS JOIN d
JOIN ca c1 ON pr.term_a = c1.term
JOIN ca c2 ON pr.term_b = c2.term
ORDER BY pmi DESC, term_a ASC, term_b ASC LIMIT $k"""

  /** Term-graph cluster mirror: the PMI top-k as a derived table, then
    * min-reachable-term transitive closure via a recursive CTE (UNION
    * dedup terminates it); cluster = MIN over the reachable set ≡ the
    * component's lexicographic min term, so no id-scheme mirroring. */
  def termGraphClustersSql(minPairDocs: Long, k: Int): String =
    s"""WITH RECURSIVE pm AS (SELECT term_a, term_b FROM (${termPmiSql(minPairDocs, k)}) q),
nd AS (SELECT term_a AS term FROM pm UNION SELECT term_b FROM pm),
se AS (SELECT term_a AS a, term_b AS b FROM pm
  UNION ALL SELECT term_b, term_a FROM pm),
r AS (SELECT term AS v, term AS w FROM nd
  UNION SELECT r.v, se.b FROM r JOIN se ON se.a = r.w),
lbl AS (SELECT v AS term, MIN(w) AS cluster FROM r GROUP BY v),
sz AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM lbl GROUP BY 1)
SELECT lbl.term, lbl.cluster, sz.cluster_size
FROM lbl JOIN sz USING (cluster) ORDER BY cluster, term"""

  def vocabTopKSql(k: Int): String =
    s"""SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
WHERE term <> '' GROUP BY term ORDER BY cnt DESC, term ASC LIMIT $k"""

  val embedCentroidsSql: String =
    """SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS pos,
       ROUND(AVG(embedding[i]::DOUBLE), 6) AS c
FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
GROUP BY 1, 2"""

  val embedStatsSql: String =
    """SELECT CAST(i - 1 AS BIGINT) AS pos,
  ROUND(AVG(embedding[i]::DOUBLE), 6) AS mean,
  ROUND(STDDEV_SAMP(embedding[i]::DOUBLE), 6) AS sd,
  ROUND(MIN(embedding[i]::DOUBLE), 6) AS mn,
  ROUND(MAX(embedding[i]::DOUBLE), 6) AS mx
FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
GROUP BY 1 ORDER BY 1"""

  /** Chunking mirror: same start sequence, same substr windows. */
  def chunkDocsSql(size: Int, stride: Int): String =
    s"""SELECT doc_id, CAST((st - 1) // $stride AS BIGINT) AS chunk_ix,
  CAST(st AS BIGINT) AS start, substr(text, st, $size) AS chunk
FROM documents,
  unnest(generate_series(1, greatest(len(text), 1), $stride)) AS t(st)
ORDER BY doc_id, chunk_ix"""

  def lenHistogramSql(width: Long): String =
    s"""SELECT CAST(FLOOR(n_chars / $width) * $width AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1"""

  /** Eval-slice decontamination mirror: same 8-gram hashes, same hash
    * sample for the eval slice, one semi-join on the gram hash. */
  def decontaminateSql(evalPct: Int): String =
    s"""WITH sh8 AS MATERIALIZED (
  SELECT DISTINCT doc_id, ${h60("'dc:' || substr(text, i, 8)")} AS g
  FROM documents, unnest(generate_series(1, greatest(len(text) - 7, 1))) AS t(i)),
ev AS MATERIALIZED (SELECT doc_id FROM documents
  WHERE ${h60("'ev:' || CAST(doc_id AS VARCHAR)")} % 100 < $evalPct),
evg AS MATERIALIZED (SELECT DISTINCT g FROM sh8 JOIN ev USING (doc_id))
SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM sh8 s JOIN evg USING (g)
WHERE s.doc_id NOT IN (SELECT doc_id FROM ev)
GROUP BY s.doc_id"""

  /** Mixing-weight sampler mirror: same salted hash bucket, weights as
    * a CASE chain (unlisted langs drop). */
  def mixSampleSql(weights: Seq[(String, Double)]): String = {
    // Same integerized thresholds as Corpus.mixSample: both engines
    // compare BIGINT < BIGINT, so no decimal-vs-double boundary drift.
    val cases = weights.map { case (l, w) =>
      s"WHEN '$l' THEN ${math.round(w * 10000).min(10000L)}" }.mkString(" ")
    s"""SELECT doc_id, lang FROM documents
WHERE ${h60("'mx:' || CAST(doc_id AS VARCHAR)")} % 10000
      < (CASE lang $cases ELSE 0 END)"""
  }

  def boilerplateGramsSql(minDocFrac: Double): String =
    s"""WITH sh8 AS MATERIALIZED (
  SELECT DISTINCT doc_id, ${h60("'bp:' || substr(text, i, 8)")} AS g
  FROM documents, unnest(generate_series(1, greatest(len(text) - 7, 1))) AS t(i)),
tot AS (SELECT COUNT(*) AS nd FROM documents)
SELECT g, CAST(COUNT(*) AS BIGINT) AS df
FROM sh8 CROSS JOIN tot
GROUP BY g, nd HAVING COUNT(*) >= nd * $minDocFrac"""

  def zipfCoverageSql(ks: Seq[Int]): String = {
    val covs = ks.map(k =>
      s"ROUND(MAX(CASE WHEN rn <= $k THEN cum END) / MAX(tot), 6) AS c_$k")
      .mkString(",\n       ")
    s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT term, COUNT(*) AS c FROM w GROUP BY term),
tot AS (SELECT SUM(c) AS tot FROM tf),
rk AS (SELECT c, term,
              ROW_NUMBER() OVER (ORDER BY c DESC, term ASC) AS rn,
              SUM(c) OVER (ORDER BY c DESC, term ASC
                           ROWS UNBOUNDED PRECEDING) AS cum
       FROM tf ORDER BY c DESC, term ASC LIMIT ${ks.max})
SELECT $covs FROM rk CROSS JOIN tot"""
  }

  val qualityQuantilesSql: String =
    """WITH q AS (SELECT doc_id,
  CAST(len(text) AS BIGINT) AS chars,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS words,
  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS punct,
  CAST(len(regexp_extract_all(text, '\b(the|a|is)\b')) AS BIGINT) AS stop
  FROM documents),
qs AS (SELECT doc_id,
  ROUND(0.4 * least(words / 100.0, 1.0) + 0.3 * (1.0 - punct / chars)
      + 0.3 * least(5.0 * stop / words, 1.0), 6) AS quality FROM q)
SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(quantile_cont(quality, 0.25), 6) AS q25,
       ROUND(quantile_cont(quality, 0.5), 6) AS q50,
       ROUND(quantile_cont(quality, 0.75), 6) AS q75
FROM qs JOIN documents d USING (doc_id) GROUP BY d.lang"""

  val repetitionSql: String =
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
uc AS (SELECT doc_id, term, COUNT(*) AS c FROM w GROUP BY 1, 2),
u AS (SELECT doc_id, SUM(c) AS words, COUNT(*) AS uniq, MAX(c) AS topc
      FROM uc GROUP BY 1),
ar AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
bg AS (SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS bg
       FROM ar, unnest(generate_series(1, len(arr) - 1)) AS t(i)
       WHERE len(arr) >= 2),
bd AS (SELECT doc_id, SUM(c) AS n2,
              SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS d2
       FROM (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2) bc
       GROUP BY doc_id)
SELECT u.doc_id, CAST(words AS BIGINT) AS words,
       ROUND(uniq / words, 6) AS uniq_ratio,
       ROUND(topc / words, 6) AS top_frac,
       ROUND(COALESCE(d2 / n2, 0.0), 6) AS dup2_frac
FROM u LEFT JOIN bd ON bd.doc_id = u.doc_id"""

  /** Gopher-rules composite gate — thresholds inlined so both engines
    * evaluate the identical predicate (minWords, maxTopFrac mirrored
    * from Corpus.gopherRules defaults). */
  def gopherRulesSql(minWords: Int = 20, maxTopFrac: Double = 0.2): String =
    s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tc AS (SELECT doc_id, term, COUNT(*) AS c FROM w GROUP BY 1, 2),
m AS (SELECT doc_id, SUM(c) AS words, MAX(c) AS topc,
             SUM(c * length(term)) / SUM(c) AS mwl,
             SUM(CASE WHEN regexp_full_match(term, '[A-Za-z]+') THEN c ELSE 0 END)
               / SUM(c) AS alpha
      FROM tc GROUP BY 1),
s AS (SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\\b(the|a|is|and|of)\\b')) AS BIGINT)
               AS stop_hits FROM documents)
SELECT m.doc_id, CAST(words AS BIGINT) AS words,
       ROUND(mwl, 6) AS mean_word_len,
       ROUND(alpha, 6) AS alpha_frac,
       s.stop_hits,
       ROUND(topc / words, 6) AS top_frac,
       (words >= $minWords AND mwl >= 3.0 AND mwl <= 10.0 AND alpha >= 0.8
        AND s.stop_hits >= 2 AND topc / words <= $maxTopFrac) AS keep
FROM m JOIN s USING (doc_id)"""

  val lmScoreSql: String =
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS MATERIALIZED (SELECT term, COUNT(*) AS c FROM w GROUP BY term),
tot AS (SELECT SUM(c) AS tot FROM tf)
SELECT doc_id, ROUND(AVG(-ln(c / tot)), 6) AS nll
FROM w JOIN tf USING (term) CROSS JOIN tot
GROUP BY doc_id"""

  /** CCNet-bucket mirror: the lmScore formula + the same unique-order
    * NTILE. */
  def pplBucketsSql(nBuckets: Int): String =
    s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS MATERIALIZED (SELECT term, COUNT(*) AS c FROM w GROUP BY term),
tot AS (SELECT SUM(c) AS tot FROM tf),
sc AS (SELECT doc_id, ROUND(AVG(-ln(c / tot)), 6) AS nll
  FROM w JOIN tf USING (term) CROSS JOIN tot GROUP BY doc_id)
SELECT doc_id, nll,
  CAST(NTILE($nBuckets) OVER (ORDER BY nll ASC, doc_id ASC) AS BIGINT) AS bucket
FROM sc ORDER BY doc_id"""

  /** CUBE mirror: same grouping-id bit order (source high bit), same
    * `<all>` sentinel. */
  val sourceLangCubeSql: String =
    """SELECT CASE WHEN GROUPING(source) = 1 THEN '<all>' ELSE source END AS source,
  CASE WHEN GROUPING(lang) = 1 THEN '<all>' ELSE lang END AS lang,
  CAST(2 * GROUPING(source) + GROUPING(lang) AS BIGINT) AS gid,
  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY CUBE(source, lang) ORDER BY 1, 2"""

  /** Pivot mirror: one FILTER count per pinned type over epoch-day
    * buckets. */
  def eventTypePivotSql(types: Seq[String]): String = {
    val cols = types.map(t =>
      s"CAST(COUNT(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS \"$t\"").mkString(",\n  ")
    s"""SELECT CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day,
  $cols
FROM events GROUP BY 1 ORDER BY 1"""
  }

  /** K-step funnel mirror: unrolled greedy earliest-next chains — the
    * same strictly-after, anchor-windowed min per level. */
  def funnelStepsSql(steps: Seq[String], withinHours: Int): String = {
    val sb = new StringBuilder(
      s"""WITH l1 AS (SELECT event_id AS anchor_id, user_id, ts AS t1, ts AS cur
  FROM events WHERE event_type = '${steps.head}')""")
    for ((st, i) <- steps.tail.zipWithIndex) {
      val k = i + 2
      sb ++= s""",
l$k AS MATERIALIZED (SELECT l.anchor_id, l.user_id, l.t1, MIN(e.ts) AS cur
  FROM l${k - 1} l JOIN events e ON e.user_id = l.user_id
   AND e.event_type = '$st' AND e.ts > l.cur
   AND e.ts <= l.t1 + INTERVAL $withinHours HOURS
  GROUP BY 1, 2, 3)"""
    }
    val levels = steps.zipWithIndex.map { case (st, i) =>
      s"SELECT CAST(${i + 1} AS BIGINT) AS level, '$st' AS step, " +
        s"CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM l${i + 1}"
    }
    sb ++= "\n" + levels.mkString("\nUNION ALL\n") + "\nORDER BY level"
    sb.toString
  }

  /** Profile mirror: per-column aggregates unioned to long form (the
    * engine mirrors the VALUES, not the single-pass plan shape). */
  def numericProfileSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS "column", CAST(COUNT($c) AS BIGINT) AS n_nonnull,
 CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
 ROUND(AVG($c), 6) AS mean, ROUND(STDDEV_SAMP($c), 6) AS std,
 ROUND(CAST(MIN($c) AS DOUBLE), 6) AS mn, ROUND(CAST(MAX($c) AS DOUBLE), 6) AS mx
 FROM $table"""
    }.mkString("\nUNION ALL\n")

  /** Exact-integer IVF mirror: the same quantization, the k-means
    * unrolled with integer squared distances, floor-division means
    * and (dist, cid)/(dist, vid) tie rules — every value BIGINT, so
    * the driver hash check passes exactly. */
  def annIvfExactSql(k: Int, iters: Int, nprobe: Int, topK: Int,
                     scale: Int): String = {
    val sb = new StringBuilder(
      s"""WITH iv AS MATERIALIZED (
  SELECT vec_id, i - 1 AS pos,
    CAST(floor(embedding[i]::DOUBLE * $scale) AS BIGINT) AS xi
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)),
c0 AS (SELECT vec_id - 10 AS cid, pos, xi AS c FROM iv
  WHERE vec_id >= 10 AND vec_id < ${10 + k})""")
    for (t <- 1 to iters) {
      sb ++= s""",
d$t AS MATERIALIZED (SELECT iv.vec_id, c.cid,
  SUM((iv.xi - c.c) * (iv.xi - c.c)) AS dist
  FROM iv JOIN c${t - 1} c ON c.pos = iv.pos GROUP BY 1, 2),
a$t AS MATERIALIZED (SELECT vec_id, cid FROM (
  SELECT vec_id, cid, ROW_NUMBER() OVER (
    PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn FROM d$t)
  WHERE rn = 1),
c$t AS MATERIALIZED (SELECT a.cid, iv.pos,
  CAST(SUM(iv.xi) // COUNT(*) AS BIGINT) AS c
  FROM a$t a JOIN iv ON iv.vec_id = a.vec_id GROUP BY 1, 2)"""
    }
    sb ++= s""",
fd AS MATERIALIZED (SELECT iv.vec_id, c.cid,
  SUM((iv.xi - c.c) * (iv.xi - c.c)) AS dist
  FROM iv JOIN c$iters c ON c.pos = iv.pos GROUP BY 1, 2),
fr AS MATERIALIZED (SELECT vec_id, cid, ROW_NUMBER() OVER (
  PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn FROM fd),
mem AS (SELECT vec_id AS vid, cid FROM fr WHERE rn = 1 AND vec_id >= 10),
pc AS (SELECT vec_id AS qid, cid FROM fr WHERE rn <= $nprobe AND vec_id < 10),
cand AS MATERIALIZED (SELECT DISTINCT pc.qid, mem.vid
  FROM pc JOIN mem ON mem.cid = pc.cid),
dst AS (SELECT c.qid, c.vid, SUM((q.xi - m.xi) * (q.xi - m.xi)) AS dist
  FROM cand c JOIN iv q ON q.vec_id = c.qid
  JOIN iv m ON m.vec_id = c.vid AND m.pos = q.pos
  GROUP BY 1, 2)
SELECT qid, vid, CAST(dist AS BIGINT) AS dist, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT qid, vid, dist, ROW_NUMBER() OVER (
    PARTITION BY qid ORDER BY dist ASC, vid ASC) AS rnk FROM dst)
WHERE rnk <= $topK ORDER BY qid, rnk"""
    sb.toString
  }

  /** Set-similarity-join mirror: same rarest-first total order, the
    * same integer prefix length ((p·L + q−1) // q) and the same
    * cross-multiplied integer threshold. */
  def setSimJoinSql(tauNum: Int, tauDen: Int,
                    source: String = "src0"): String =
    s"""WITH tk AS MATERIALIZED (SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents WHERE source = '$source')
  WHERE term <> ''),
df AS MATERIALIZED (SELECT term, COUNT(*) AS df FROM tk GROUP BY 1),
rk AS MATERIALIZED (SELECT tk.doc_id, tk.term,
  ROW_NUMBER() OVER (PARTITION BY tk.doc_id ORDER BY df.df ASC, tk.term ASC) AS rn,
  COUNT(*) OVER (PARTITION BY tk.doc_id) AS cnt
  FROM tk JOIN df ON df.term = tk.term),
pfx AS MATERIALIZED (SELECT term, doc_id, cnt FROM rk
  WHERE rn <= cnt - (($tauNum * cnt + ${tauDen - 1}) // $tauDen) + 1),
cand AS MATERIALIZED (SELECT DISTINCT pa.doc_id AS a, pb.doc_id AS b,
    pa.cnt AS ca, pb.cnt AS cb
  FROM pfx pa JOIN pfx pb ON pa.term = pb.term AND pa.doc_id < pb.doc_id),
ov AS (SELECT c.a, c.b, c.ca, c.cb, COUNT(*) AS inter
  FROM cand c JOIN tk ta ON ta.doc_id = c.a
  JOIN tk tb ON tb.doc_id = c.b AND tb.term = ta.term
  GROUP BY 1, 2, 3, 4)
SELECT a, b, ROUND(CAST(inter AS DOUBLE) / (ca + cb - inter), 6) AS jaccard
FROM ov WHERE inter * $tauDen >= $tauNum * (ca + cb - inter)
ORDER BY a, b"""

  /** String-profile mirror: cardinality + length shape per column. */
  def stringProfileSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS "column", CAST(COUNT($c) AS BIGINT) AS n_nonnull,
 CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
 CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
 ROUND(AVG(len($c)), 6) AS avg_len,
 CAST(MIN(len($c)) AS BIGINT) AS min_len, CAST(MAX(len($c)) AS BIGINT) AS max_len
 FROM $table"""
    }.mkString("\nUNION ALL\n")

  /** Z-order audit mirror: the same exact-integer min-max quantization
    * and the identical bit-interleave sum (generated from the same
    * loop), top-bit bucketing over lineitem. */
  def zorderStatsSql(bits: Int, bucketBits: Int): String = {
    val m = (1L << bits) - 1
    val z = (0 until bits).map(i =>
      s"((qa >> $i) & 1) * ${1L << (2 * i + 1)} + " +
        s"((qb >> $i) & 1) * ${1L << (2 * i)}").mkString(" + ")
    s"""WITH ext AS (SELECT MIN(l_partkey) AS amin, MAX(l_partkey) AS amax,
  MIN(l_suppkey) AS bmin, MAX(l_suppkey) AS bmax FROM lineitem),
q AS (SELECT l_partkey AS a, l_suppkey AS b,
  CASE WHEN amax = amin THEN 0 ELSE ((l_partkey - amin) * $m) // (amax - amin) END AS qa,
  CASE WHEN bmax = bmin THEN 0 ELSE ((l_suppkey - bmin) * $m) // (bmax - bmin) END AS qb
  FROM lineitem CROSS JOIN ext),
zv AS (SELECT CAST($z AS BIGINT) AS z, a, b FROM q)
SELECT z >> ${2 * bits - bucketBits} AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
  MIN(a) AS a_min, MAX(a) AS a_max, MIN(b) AS b_min, MAX(b) AS b_max
FROM zv GROUP BY 1 ORDER BY 1"""
  }

  val piiScanSql: String = {
    // built from the SAME pattern list the Spark operator uses — the
    // triples are RE2-compatible precisely so one definition serves both
    val pats = graft.pipeline.TextOps.piiPatterns
    val counts = pats.map { case (kind, re, _) =>
      s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS n_$kind"
    }.mkString(",\n  ")
    val redacted = pats.foldLeft("text") { case (c, (_, re, repl)) =>
      s"regexp_replace($c, '$re', '$repl', 'g')"
    }
    s"""SELECT doc_id,
  $counts,
  CAST(len($redacted) AS BIGINT) AS clean_len
FROM documents"""
  }

  def corpusCleanSql(minQuality: Double): String = {
    val scores = markerRes.map { case (l, re) =>
      s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS s_$l"
    }.mkString(", ")
    val langs = markerRes.map(_._1)
    val cases = langs.init.map { l =>
      val ge = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $ge THEN '$l'"
    }.mkString(" ")
    s"""WITH ${minhashCtes(16, 4)},
sc AS (SELECT doc_id, lang, $scores FROM documents),
g AS (SELECT doc_id, lang, CASE $cases ELSE '${langs.last}' END AS guess FROM sc),
q AS (SELECT doc_id,
  CAST(len(text) AS BIGINT) AS chars,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS words,
  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS punct,
  CAST(len(regexp_extract_all(text, '\\b(the|a|is)\\b')) AS BIGINT) AS stop
  FROM documents),
qs AS (SELECT doc_id,
  ROUND(0.4 * least(words / 100.0, 1.0) + 0.3 * (1.0 - punct / chars)
      + 0.3 * least(5.0 * stop / words, 1.0), 6) AS quality FROM q),
dup AS (SELECT DISTINCT doc_id FROM
  (SELECT a AS doc_id FROM pairs UNION ALL SELECT b FROM pairs))
SELECT g.lang, CAST(COUNT(*) AS BIGINT) AS kept
FROM g JOIN qs USING (doc_id)
WHERE g.guess = g.lang AND qs.quality >= $minQuality
  AND doc_id NOT IN (SELECT doc_id FROM dup)
GROUP BY g.lang"""
  }

  /** End-to-end training-mix mirror: the composed prep DAG — the same
    * CTE bodies as the standalone langId / quality / dedupExact /
    * decontaminate / mixSample / splitAssign mirrors chained on
    * doc_id, with the dedup stage keeping each exact-fingerprint
    * cluster's min-id representative. */
  def trainingMixSql(weights: Seq[(String, Double)], minQuality: Double,
                     evalPct: Int, gram: Int,
                     trainPct: Int, valPct: Int): String = {
    val scores = markerRes.map { case (l, re) =>
      s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS s_$l"
    }.mkString(", ")
    val langs = markerRes.map(_._1)
    val cases = langs.init.map { l =>
      val ge = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $ge THEN '$l'"
    }.mkString(" ")
    val mixCases = weights.map { case (l, w) =>
      s"WHEN '$l' THEN ${math.round(w * 10000).min(10000L)}" }.mkString(" ")
    s"""WITH sc AS (SELECT doc_id, lang, $scores FROM documents),
g AS (SELECT doc_id, lang, CASE $cases ELSE '${langs.last}' END AS guess FROM sc),
q AS (SELECT doc_id,
  CAST(len(text) AS BIGINT) AS chars,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS words,
  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS punct,
  CAST(len(regexp_extract_all(text, '\\b(the|a|is)\\b')) AS BIGINT) AS stop
  FROM documents),
qs AS (SELECT doc_id,
  ROUND(0.4 * least(words / 100.0, 1.0) + 0.3 * (1.0 - punct / chars)
      + 0.3 * least(5.0 * stop / words, 1.0), 6) AS quality FROM q),
fp AS (SELECT doc_id, md5(lower(substr(text, 1, 100))) AS fp FROM documents),
dup AS (SELECT f.doc_id FROM fp f
  JOIN (SELECT fp, MIN(doc_id) AS keep_id FROM fp GROUP BY fp) k
  ON k.fp = f.fp WHERE f.doc_id <> k.keep_id),
sh8 AS MATERIALIZED (
  SELECT DISTINCT doc_id, ${h60(s"'dc:' || substr(text, i, $gram)")} AS gm
  FROM documents,
    unnest(generate_series(1, greatest(len(text) - ${gram - 1}, 1))) AS t(i)),
ev AS MATERIALIZED (SELECT doc_id FROM documents
  WHERE ${h60("'ev:' || CAST(doc_id AS VARCHAR)")} % 100 < $evalPct),
evg AS MATERIALIZED (SELECT DISTINCT gm FROM sh8 JOIN ev USING (doc_id)),
cont AS (SELECT DISTINCT s.doc_id FROM sh8 s JOIN evg USING (gm)
  WHERE s.doc_id NOT IN (SELECT doc_id FROM ev)),
surv AS (SELECT g.doc_id, g.lang FROM g JOIN qs USING (doc_id)
  WHERE g.guess = g.lang AND qs.quality >= $minQuality
    AND g.doc_id NOT IN (SELECT doc_id FROM dup)
    AND g.doc_id NOT IN (SELECT doc_id FROM cont)
    AND g.doc_id NOT IN (SELECT doc_id FROM ev)),
mixed AS (SELECT doc_id, lang FROM surv
  WHERE ${h60("'mx:' || CAST(doc_id AS VARCHAR)")} % 10000
        < (CASE lang $mixCases ELSE 0 END)),
sp AS (SELECT doc_id,
  CASE WHEN b < $trainPct THEN 'train'
       WHEN b < ${trainPct + valPct} THEN 'val'
       ELSE 'test' END AS split
  FROM (SELECT doc_id,
    ${h60("'sp:' || CAST(doc_id AS VARCHAR)")} % 100 AS b FROM documents))
SELECT m.lang, sp.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(d.n_chars) AS BIGINT) AS chars
FROM mixed m JOIN sp USING (doc_id) JOIN documents d USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  /** Count–Min mirror: rebuild the d bucket functions from the md5
    * formula and reproduce the sketch's estimate — collisions included
    * — at the exact top-`topN` probe terms. Stronger than an
    * exact-regime check: the estimate itself is replayed. */
  def cmsSql(d: Int, w: Int, topN: Int): String = {
    val bcols = (0 until d).map(j =>
      s"${h60(s"'cm$j:' || term")} % $w AS b$j").mkString(",\n  ")
    val sums = (0 until d).map(j =>
      s"s$j AS MATERIALIZED (SELECT b$j AS b, SUM(exact) AS n FROM b GROUP BY b$j)")
      .mkString(",\n")
    val joins = (0 until d).map(j => s"JOIN s$j ON s$j.b = b.b$j").mkString(" ")
    val est = "LEAST(" + (0 until d).map(j => s"s$j.n").mkString(", ") + ")"
    s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
c AS MATERIALIZED (SELECT term, CAST(COUNT(*) AS BIGINT) AS exact
  FROM t WHERE term <> '' GROUP BY term),
b AS MATERIALIZED (SELECT term, exact,
  $bcols
  FROM c),
$sums,
probe AS (SELECT term, exact FROM c ORDER BY exact DESC, term ASC LIMIT $topN)
SELECT p.term, p.exact, CAST($est AS BIGINT) AS est
FROM probe p JOIN b USING (term) $joins
ORDER BY p.exact DESC, p.term ASC"""
  }

  /** HyperLogLog mirror: rebuilds the register maxima relationally from
    * the same 60-bit hash (bucket = low p bits, rho positionally via
    * minimal-width `bin`, identical in both engines), carries the
    * harmonic sum as the exact integer Σ 2^(maxRho−M_j), and replays
    * the estimator — raw branch and linear-counting branch — with the
    * arithmetic written in the same operation order as the plan. */
  def hllSql(p: Int): String = {
    val m = 1 << p; val maxRho = 61 - p
    def regs(src: String, prefix: String) =
      s"""(SELECT event_type, h % $m AS bucket,
    MAX(CASE WHEN h >> $p = 0 THEN $maxRho
             ELSE $maxRho - length(bin(h >> $p)) END) AS mr
  FROM (SELECT event_type, ${h60(s"'$prefix' || $src")} AS h FROM events)
  GROUP BY 1, 2)"""
    def est(t: String) =
      s"""(SELECT event_type,
    SUM(CAST(1 AS BIGINT) << ($maxRho - mr))
      + ($m - COUNT(*)) * (CAST(1 AS BIGINT) << $maxRho) AS s,
    $m - COUNT(*) AS v
  FROM $t GROUP BY 1)"""
    val raw = s"0.7213 / (1.0 + 1.079 / $m.0) * $m.0 * $m.0 * " +
      s"pow(2.0, $maxRho.0) / CAST(s AS DOUBLE)"
    def estCol(alias: String) =
      s"""ROUND(CASE WHEN $raw <= ${2.5 * m} AND v > 0
         THEN $m.0 * ln($m.0 / CAST(v AS DOUBLE)) ELSE $raw END, 4)
    AS $alias"""
    s"""WITH ru AS ${regs("CAST(user_id AS VARCHAR)", "hllu:")},
re AS ${regs("CAST(event_id AS VARCHAR)", "hlle:")},
su AS (SELECT event_type, ${estCol("users_est")} FROM ${est("ru")}),
se AS (SELECT event_type, ${estCol("ids_est")} FROM ${est("re")}),
ex AS (SELECT event_type,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_exact,
  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS ids_exact
  FROM events GROUP BY 1)
SELECT ex.event_type, users_exact, users_est, ids_exact, ids_est
FROM ex JOIN su USING (event_type) JOIN se USING (event_type)
ORDER BY ex.event_type"""
  }

  /** Windowed z-score anomaly mirror: same per-(window, type) moments,
    * same threshold. */
  def windowAnomaliesSql(sigmas: Double): String =
    s"""WITH w AS (SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
    '%Y-%m-%d %H:%M:%S') AS wstart, event_type, event_id, value FROM events),
st AS (SELECT wstart, event_type, AVG(value) AS mu,
  STDDEV_SAMP(value) AS sd, COUNT(*) AS n FROM w GROUP BY 1, 2)
SELECT w.wstart, w.event_type, w.event_id,
  ROUND(w.value, 6) AS value, ROUND((w.value - mu) / sd, 6) AS z
FROM w JOIN st USING (wstart, event_type)
WHERE n >= 2 AND sd > 0 AND w.value > mu + $sigmas * sd
ORDER BY wstart, event_type, event_id"""

  /** Decay-score mirror: integer-second epochs on both sides (Spark unix_timestamp
    * floors; epoch() is floored to match) and differences cancel any
    * timezone convention, so only the same half-life weight formula matters. */
  def decayScoreSql(halfLifeHours: Double): String =
    s"""WITH t AS (SELECT user_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
m AS (SELECT MAX(t) AS tmax FROM t)
SELECT user_id,
  ROUND(SUM(value * pow(2.0, -(tmax - t) / ${halfLifeHours * 3600.0})), 6) AS score
FROM t CROSS JOIN m GROUP BY user_id ORDER BY user_id"""

  /** Per-window Count–Min mirror: the same bucket rebuild as [[cmsSql]]
    * with every aggregate keyed by the hour window. */
  def windowCmsSql(d: Int, w: Int): String = {
    val bcols = (0 until d).map(j =>
      s"${h60(s"'cm$j:' || term")} % $w AS b$j").mkString(",\n  ")
    val sums = (0 until d).map(j =>
      s"s$j AS MATERIALIZED (SELECT wstart, b$j AS b, SUM(n) AS n FROM b GROUP BY 1, 2)")
      .mkString(",\n")
    val joins = (0 until d).map(j =>
      s"JOIN s$j ON s$j.wstart = b.wstart AND s$j.b = b.b$j").mkString(" ")
    val est = "LEAST(" + (0 until d).map(j => s"s$j.n").mkString(", ") + ")"
    s"""WITH wv AS (SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS wstart,
  event_type AS term FROM events),
c AS MATERIALIZED (SELECT wstart, term, COUNT(*) AS n FROM wv GROUP BY 1, 2),
b AS MATERIALIZED (SELECT wstart, term, n,
  $bcols
  FROM c),
$sums
SELECT b.wstart, b.term, CAST($est AS BIGINT) AS est
FROM b $joins
ORDER BY b.wstart, b.term"""
  }

  /** Bloom-gate mirror: a Bloom filter's semantics reduce to "the set
    * of set bit positions", so the oracle rebuilds the eval slice's
    * position set relationally from the same md5 formulas and replays
    * membership EXACTLY — false positives included. */
  def bloomDecontamSql(evalPct: Int, mBits: Int, k: Int): String = {
    val posSelects = (0 until k).map(i =>
      s"SELECT DISTINCT ${h60(s"'bl$i:' || sh")} % $mBits AS p FROM evg")
      .mkString(" UNION ")
    val probeCols = (0 until k).map(i =>
      s"${h60(s"'bl$i:' || sh")} % $mBits AS p$i").mkString(",\n  ")
    val hits = (0 until k).map(i =>
      s"p$i IN (SELECT p FROM pos)").mkString(" AND ")
    s"""WITH sh AS MATERIALIZED (
  SELECT doc_id, substr(text, i, 8) AS sh
  FROM documents, unnest(generate_series(1, greatest(len(text) - 7, 1))) AS t(i)),
ev AS MATERIALIZED (SELECT doc_id FROM documents
  WHERE ${h60("'ev:' || CAST(doc_id AS VARCHAR)")} % 100 < $evalPct),
evg AS MATERIALIZED (SELECT DISTINCT sh FROM sh JOIN ev USING (doc_id)),
pos AS MATERIALIZED ($posSelects),
tg AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM sh
  WHERE doc_id NOT IN (SELECT doc_id FROM ev)),
tp AS (SELECT doc_id,
  $probeCols
  FROM tg)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_maybe
FROM tp WHERE $hits
GROUP BY doc_id"""
  }

  /** Bloom-FPR-audit mirror: same position set, same exact anti-join
    * ground truth, same k-fold fill multiply (never pow — libm pow
    * is not bit-stable across engines). */
  def bloomFprAuditSql(evalPct: Int, mBits: Int, k: Int): String = {
    val posSelects = (0 until k).map(i =>
      s"SELECT DISTINCT ${h60(s"'bl$i:' || sh")} % $mBits AS p FROM evg")
      .mkString(" UNION ")
    val probeCols = (0 until k).map(i =>
      s"${h60(s"'bl$i:' || sh")} % $mBits AS p$i").mkString(",\n  ")
    val hitCond = (0 until k).map(i =>
      s"p$i IN (SELECT p FROM pos)").mkString(" AND ")
    val fillChain = Seq.fill(k)("fl").mkString(" * ")
    s"""WITH sh AS MATERIALIZED (
  SELECT doc_id, substr(text, i, 8) AS sh
  FROM documents, unnest(generate_series(1, greatest(len(text) - 7, 1))) AS t(i)),
ev AS MATERIALIZED (SELECT doc_id FROM documents
  WHERE ${h60("'ev:' || CAST(doc_id AS VARCHAR)")} % 100 < $evalPct),
evg AS MATERIALIZED (SELECT DISTINCT sh FROM sh JOIN ev USING (doc_id)),
pos AS MATERIALIZED ($posSelects),
bits AS (SELECT CAST(COUNT(DISTINCT p) AS BIGINT) AS bits_set FROM pos),
ntr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_train_grams FROM evg),
pr AS MATERIALIZED (SELECT sh FROM (SELECT DISTINCT sh FROM sh
  WHERE doc_id NOT IN (SELECT doc_id FROM ev))
  WHERE sh NOT IN (SELECT sh FROM evg)),
np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_probes FROM pr),
fh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_false FROM (
  SELECT $probeCols FROM pr) WHERE $hitCond),
fr AS (SELECT CAST(bits_set AS DOUBLE) / $mBits AS fl FROM bits)
SELECT n_train_grams, bits_set,
  ROUND(fl, 6) AS fill_ratio, n_probes, n_false,
  ROUND(CAST(n_false AS DOUBLE) / CAST(n_probes AS DOUBLE), 6)
    AS measured_fpr,
  ROUND($fillChain, 9) AS est_fpr
FROM ntr CROSS JOIN bits CROSS JOIN np CROSS JOIN fh CROSS JOIN fr"""
  }

  /** User-lifespan mirror: same epoch-day spans, same lifecycle
    * bands, exact BIGINT sums. */
  val userLifespanSql: String =
    """WITH du AS (SELECT DISTINCT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT)
    AS day, user_id FROM events),
per AS (SELECT user_id, MAX(day) - MIN(day) + 1 AS span,
  CAST(COUNT(*) AS BIGINT) AS active FROM du GROUP BY 1),
b AS (SELECT CASE WHEN span = 1 THEN 'a_1d' WHEN span <= 7 THEN 'b_2_7d'
    WHEN span <= 28 THEN 'c_8_28d' ELSE 'd_gt_28d' END AS bucket,
  span, active FROM per),
ag AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(span) AS BIGINT) AS ssum, CAST(SUM(active) AS BIGINT) AS asum
  FROM b GROUP BY 1),
t AS (SELECT CAST(SUM(n_users) AS BIGINT) AS tot FROM ag)
SELECT bucket, n_users,
  ROUND(CAST(n_users AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share,
  ROUND(CAST(ssum AS DOUBLE) / CAST(n_users AS DOUBLE), 6) AS mean_span_d,
  ROUND(CAST(asum AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
    AS mean_active_d,
  ROUND(CAST(asum AS DOUBLE) / CAST(ssum AS DOUBLE), 6) AS density
FROM ag CROSS JOIN t ORDER BY bucket"""

  /** Probe-curve mirror: the annRecall body per plane count, each arm
    * micro-aggregated, unioned. */
  def annProbeCurveSql(planesSeq: Seq[Int] = Seq(2, 4, 6),
                       k: Int = 3): String = {
    def arm(p: Int): String =
      s"""SELECT * FROM (WITH $embCtes,
w AS MATERIALIZED (
  SELECT p AS plane, d AS pos, ${h60("'lsh:' || p || ':' || d")} % 2001 - 1000 AS w
  FROM unnest(generate_series(0, ${p - 1})) AS tp(p), unnest(generate_series(0, 63)) AS td(d)),
proj AS MATERIALIZED (SELECT e.vec_id, w.plane, SUM(w.w * e.x) AS proj
  FROM ex e JOIN w ON w.pos = e.pos GROUP BY 1, 2),
bk AS MATERIALIZED (SELECT vec_id,
  SUM(CASE WHEN proj >= 0 THEN CAST(1 AS BIGINT) << CAST(plane AS INT) ELSE CAST(0 AS BIGINT) END) AS bucket
  FROM proj GROUP BY vec_id),
ldots AS (SELECT q.vec_id AS qid, v.vec_id AS vid, SUM(q.x * v.x) AS dot
         FROM ex q JOIN bk qb ON qb.vec_id = q.vec_id
         JOIN ex v ON v.pos = q.pos JOIN bk vb ON vb.vec_id = v.vec_id AND vb.bucket = qb.bucket
         WHERE q.vec_id < 10 AND v.vec_id >= 10
         GROUP BY 1, 2),
lcos AS (SELECT qid, vid, ROUND(dot / (qn.nrm * vn.nrm), 6) AS cosine
        FROM ldots JOIN nrm qn ON qn.vec_id = qid JOIN nrm vn ON vn.vec_id = vid),
lsh AS (SELECT qid, vid FROM (
  SELECT qid, vid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid ASC) AS rn
  FROM lcos) WHERE rn <= $k),
edots AS (SELECT q.vec_id AS qid, v.vec_id AS vid, SUM(q.x * v.x) AS dot
         FROM ex q JOIN ex v ON q.pos = v.pos AND q.vec_id < 10 AND v.vec_id >= 10
         GROUP BY 1, 2),
ecos AS (SELECT qid, vid, ROUND(dot / (qn.nrm * vn.nrm), 6) AS cosine
        FROM edots JOIN nrm qn ON qn.vec_id = qid JOIN nrm vn ON vn.vec_id = vid),
exact AS (SELECT qid, vid FROM (
  SELECT qid, vid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid ASC) AS rn
  FROM ecos) WHERE rn <= $k),
hits AS (SELECT e.qid, COUNT(*) AS n_hit FROM exact e
  JOIN lsh l ON l.qid = e.qid AND l.vid = e.vid GROUP BY 1),
exn AS (SELECT qid, COUNT(*) AS n_exact FROM exact GROUP BY 1)
SELECT CAST($p AS BIGINT) AS planes,
  CAST(COUNT(*) AS BIGINT) AS n_queries,
  CAST(SUM(COALESCE(h.n_hit, 0)) AS BIGINT) AS n_hit,
  CAST(SUM(x.n_exact) AS BIGINT) AS n_exact,
  ROUND(CAST(SUM(COALESCE(h.n_hit, 0)) AS DOUBLE) /
    CAST(SUM(x.n_exact) AS DOUBLE), 6) AS recall
FROM exn x LEFT JOIN hits h ON h.qid = x.qid) arm$p"""
    planesSeq.map(arm).mkString("\nUNION ALL\n") + "\nORDER BY planes"
  }

  /** Bigram-LM mirror: positions from the zipped unnest, bigrams via
    * LEAD over the per-doc position window, conditional probability
    * c(w1,w2)/c(w1,·) with the context total derived from the bigram
    * counts themselves — operation for operation the Spark plan. */
  val bigramNllSql: String =
    """WITH w AS (SELECT doc_id,
  unnest(string_split(text, ' ')) AS term,
  generate_subscripts(string_split(text, ' '), 1) AS pos FROM documents),
bg AS MATERIALIZED (SELECT doc_id, term,
  LEAD(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM w
  QUALIFY nxt IS NOT NULL),
cb AS MATERIALIZED (SELECT term, nxt, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
cu AS MATERIALIZED (SELECT term, SUM(cb) AS cu FROM cb GROUP BY 1)
SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(-ln(cb.cb / cu.cu)), 6) AS nll
FROM bg JOIN cb USING (term, nxt) JOIN cu USING (term)
GROUP BY bg.doc_id"""

  /** Lexical diversity mirror: same two-stage type/token counts, same
    * round-6 ratios (sqrt is IEEE in both engines). */
  val lexicalDiversitySql: String =
    """WITH tk AS (SELECT doc_id, term, COUNT(*) AS c FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) u
  WHERE term <> '' GROUP BY 1, 2),
agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS tokens,
  CAST(COUNT(*) AS BIGINT) AS types FROM tk GROUP BY 1)
SELECT doc_id, tokens, types,
  ROUND(types / tokens, 6) AS ttr,
  ROUND(types / sqrt(tokens), 6) AS guiraud
FROM agg"""

  /** Token-entropy mirror: same (doc, term) counts, same per-doc
    * window totals, same −Σ p·ln p roll-up and round-6. */
  val tokenEntropySql: String =
    """WITH tk AS (SELECT doc_id, term, COUNT(*) AS c FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) u
  WHERE term <> '' GROUP BY 1, 2),
tw AS (SELECT doc_id, c,
  SUM(c) OVER (PARTITION BY doc_id) AS tokens,
  COUNT(*) OVER (PARTITION BY doc_id) AS types FROM tk)
SELECT doc_id, CAST(tokens AS BIGINT) AS tokens, CAST(types AS BIGINT) AS types,
  ROUND(SUM(-(c / tokens) * ln(c / tokens)), 6) AS entropy,
  ROUND(CASE WHEN types > 1
    THEN SUM(-(c / tokens) * ln(c / tokens)) / ln(types)
    ELSE 0.0 END, 6) AS norm_entropy
FROM tw GROUP BY doc_id, tokens, types"""

  /** Market-basket mirror: same distinct baskets, same A-priori item
    * prune, same within-order pair join and support/confidence/lift
    * arithmetic (integer numerators, one final division), same
    * lift-desc + (p1, p2) deterministic top-k cut. */
  def basketPairsSql(minItemCount: Long, minPairCount: Long, topK: Int): String =
    s"""WITH b AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders FROM b),
ic AS (SELECT pkey, COUNT(*) AS icnt FROM b GROUP BY 1
  HAVING COUNT(*) >= $minItemCount),
f AS (SELECT b.okey, b.pkey, ic.icnt FROM b JOIN ic USING (pkey)),
p AS (SELECT a.pkey AS p1, c.pkey AS p2, a.icnt AS c1, c.icnt AS c2,
    COUNT(*) AS pair_cnt
  FROM f a JOIN f c ON a.okey = c.okey AND a.pkey < c.pkey
  GROUP BY 1, 2, 3, 4 HAVING COUNT(*) >= $minPairCount)
SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2,
  CAST(pair_cnt AS BIGINT) AS pair_cnt,
  CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2, n.n_orders,
  ROUND(pair_cnt / n.n_orders, 6) AS support,
  ROUND(pair_cnt / c1, 6) AS conf_1_2,
  ROUND(pair_cnt / c2, 6) AS conf_2_1,
  ROUND(pair_cnt * n.n_orders / (c1 * c2), 6) AS lift
FROM p, n
ORDER BY lift DESC, p1, p2 LIMIT $topK"""

  /** CUSUM mirror: same hourly integer counts, same 2n-scaled exact-
    * integer drifts, the same prefix-sum − running-min closed form in
    * BIGINT windows, one final double division. */
  def cusumSql(k2: Long, h2: Long): String =
    s"""WITH hc AS (SELECT event_type AS etype,
    CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) AS hr,
    CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2),
tw AS (SELECT etype, hr, cnt,
  CAST(COUNT(*) OVER (PARTITION BY etype) AS BIGINT) AS n,
  CAST(SUM(cnt) OVER (PARTITION BY etype) AS BIGINT) AS tot FROM hc),
d AS (SELECT etype, hr, cnt, n, tot,
  2 * n * cnt - ${2 + k2} * tot AS du,
  ${2 - k2} * tot - 2 * n * cnt AS dd FROM tw),
pf AS (SELECT etype, hr, cnt, n, tot,
  SUM(du) OVER (PARTITION BY etype ORDER BY hr
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pu,
  SUM(dd) OVER (PARTITION BY etype ORDER BY hr
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd FROM d),
s AS (SELECT etype, hr, cnt, n, tot,
  pu - LEAST(MIN(pu) OVER (PARTITION BY etype ORDER BY hr
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS su,
  pd - LEAST(MIN(pd) OVER (PARTITION BY etype ORDER BY hr
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS sd FROM pf)
SELECT etype AS event_type, hr, cnt,
  ROUND(su / (2 * n), 6) AS s_up,
  ROUND(sd / (2 * n), 6) AS s_down,
  CAST(su > $h2 * tot OR sd > $h2 * tot AS BIGINT) AS alarm
FROM s ORDER BY event_type, hr"""

  /** Online-CUSUM mirror: fixed μ0 reference, so the scaled drifts are
    * plain 2-scaled integers; same closed-form windows as [[cusumSql]]. */
  def cusumOnlineSql(mu0: Long, k2: Long, h2: Long): String =
    s"""WITH hc AS (SELECT event_type AS etype,
    CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) AS hr,
    CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2),
d AS (SELECT etype, hr, cnt,
  2 * cnt - ${(2 + k2) * mu0} AS du,
  ${(2 - k2) * mu0} - 2 * cnt AS dd FROM hc),
pf AS (SELECT etype, hr, cnt,
  SUM(du) OVER (PARTITION BY etype ORDER BY hr
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pu,
  SUM(dd) OVER (PARTITION BY etype ORDER BY hr
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd FROM d),
s AS (SELECT etype, hr, cnt,
  pu - LEAST(MIN(pu) OVER (PARTITION BY etype ORDER BY hr
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS su,
  pd - LEAST(MIN(pd) OVER (PARTITION BY etype ORDER BY hr
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS sd FROM pf)
SELECT etype AS event_type, hr, cnt,
  ROUND(su / 2, 6) AS s_up,
  ROUND(sd / 2, 6) AS s_down,
  CAST(su > ${h2 * mu0} OR sd > ${h2 * mu0} AS BIGINT) AS alarm
FROM s ORDER BY event_type, hr"""

  /** Type-drift mirror: same epoch-day counts, same p·ln(p/q) fold. */
  val typeDriftSql: String =
    """WITH dt AS (SELECT CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day,
    event_type AS etype, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2),
dtot AS (SELECT day, CAST(SUM(cnt) AS BIGINT) AS dtot FROM dt GROUP BY 1),
g AS (SELECT etype, CAST(SUM(cnt) AS BIGINT) AS gcnt FROM dt GROUP BY 1),
gt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS gtot FROM dt)
SELECT dt.day, dtot.dtot AS n_events,
  ROUND(SUM((cnt / dtot.dtot) * ln((cnt / dtot.dtot) / (gcnt / gt.gtot))), 6) AS kl
FROM dt JOIN dtot USING (day) JOIN g USING (etype), gt
GROUP BY dt.day, dtot.dtot ORDER BY dt.day"""

  /** Event-path mirror: same per-user LEAD×2 trigram stream, same
    * count-desc + full-trigram tiebreak top-k. */
  def eventPathsSql(k: Int): String =
    s"""WITH s AS (SELECT event_type AS t1,
  LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS t2,
  LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS t3
  FROM events)
SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY 1, 2, 3 ORDER BY n DESC, t1, t2, t3 LIMIT $k"""

  /** Burstiness mirror: same hourly counts, same per-type densify over
    * [min, max] hours (generate_series ↔ sequence explode), same
    * Fano / Goh–Barabási arithmetic and round-6. */
  val burstinessSql: String =
    """WITH hc AS (SELECT event_type AS etype,
    CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) AS hr,
    CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2),
sp AS (SELECT etype, MIN(hr) AS h0, MAX(hr) AS h1 FROM hc GROUP BY 1),
dn AS (SELECT sp.etype, unnest(generate_series(sp.h0, sp.h1)) AS hr FROM sp),
dj AS (SELECT dn.etype, dn.hr, COALESCE(hc.cnt, 0) AS cnt
  FROM dn LEFT JOIN hc ON hc.etype = dn.etype AND hc.hr = dn.hr)
SELECT etype AS event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
  ROUND(AVG(cnt), 6) AS mean_rate,
  ROUND(VAR_SAMP(cnt) / AVG(cnt), 6) AS fano,
  ROUND((STDDEV_SAMP(cnt) - AVG(cnt)) / (STDDEV_SAMP(cnt) + AVG(cnt)), 6) AS burstiness
FROM dj GROUP BY etype ORDER BY event_type"""

  /** PII density mirror: same pattern list, same per-row hit fold. */
  val piiDensitySql: String = {
    val hits = graft.pipeline.TextOps.piiPatterns
      .map { case (_, re, _) => s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT)" }
      .mkString(" + ")
    s"""WITH h AS (SELECT source, ($hits) AS h,
  CAST(len(text) AS BIGINT) AS chars FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN h > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
  CAST(SUM(h) AS BIGINT) AS n_hits,
  ROUND(SUM(h) * 1000.0 / SUM(chars), 6) AS hits_per_kchar
FROM h GROUP BY source"""
  }

  /** Kneser–Ney bigram mirror: same counts, same left-associated
    * discount arithmetic (d = 0.75), same 6-dp round. */
  val kneserNeySql: String =
    """WITH w AS (SELECT doc_id,
  unnest(string_split(text, ' ')) AS term,
  generate_subscripts(string_split(text, ' '), 1) AS pos FROM documents),
bg AS MATERIALIZED (SELECT doc_id, term,
  LEAD(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM w
  QUALIFY nxt IS NOT NULL),
cb AS MATERIALIZED (SELECT term, nxt, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
cun1 AS MATERIALIZED (SELECT term, SUM(cb) AS cu, COUNT(*) AS n1 FROM cb GROUP BY 1),
nc AS MATERIALIZED (SELECT nxt, COUNT(*) AS ncont FROM cb GROUP BY 1),
tt AS (SELECT COUNT(*) AS tt FROM cb)
SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  ROUND(AVG(-ln((cb.cb - 0.75 + 0.75 * cun1.n1 * nc.ncont / tt.tt) / cun1.cu)), 6) AS nll
FROM bg JOIN cb USING (term, nxt) JOIN cun1 USING (term) JOIN nc USING (nxt), tt
GROUP BY bg.doc_id"""

  /** Deterministic split mirror: same salted bucket, same integer
    * compares. */
  def splitSql(trainPct: Int, valPct: Int): String =
    s"""SELECT doc_id,
  CASE WHEN b < $trainPct THEN 'train'
       WHEN b < ${trainPct + valPct} THEN 'val'
       ELSE 'test' END AS split
FROM (SELECT doc_id,
  ${h60("'sp:' || CAST(doc_id AS VARCHAR)")} % 100 AS b FROM documents)"""

  /** BPE-apply mirror: same merge ranking (count desc, pair asc), same
    * spaced symbol encoding, and the same two replace passes per merge
    * in rank order via a step-indexed recursive walk — replace() is
    * leftmost-non-overlapping in both engines, so the sweep is
    * character-identical. */
  private def bpeCtes(merges: Int): String =
    s"""wocc AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
mg AS MATERIALIZED (
  SELECT pair, ROW_NUMBER() OVER (ORDER BY n DESC, pair ASC) AS rn FROM (
    SELECT substr(w, i, 2) AS pair, COUNT(*) AS n
    FROM (SELECT w FROM wocc WHERE len(w) >= 2),
         unnest(generate_series(1, len(w) - 1)) AS t(i)
    GROUP BY 1 ORDER BY n DESC, pair ASC LIMIT $merges)),
vocab AS MATERIALIZED (SELECT DISTINCT w AS word FROM wocc WHERE w <> ''),
walk(step, word, seg) AS (
  SELECT 0, word, regexp_replace(word, '(.)', ' \\1', 'g') || ' ' FROM vocab
  UNION ALL
  SELECT w.step + 1, w.word, replace(replace(w.seg, m.p, m.r), m.p, m.r)
  FROM walk w JOIN (
    SELECT rn, ' ' || substr(pair, 1, 1) || ' ' || substr(pair, 2, 1) || ' ' AS p,
           ' ' || pair || ' ' AS r FROM mg) m ON m.rn = w.step + 1
  WHERE w.step < (SELECT COUNT(*) FROM mg)),
seg AS MATERIALIZED (
  SELECT word, trim(seg) AS seg,
         CAST(len(string_split(trim(seg), ' ')) AS BIGINT) AS n_tokens
  FROM walk WHERE step = (SELECT COUNT(*) FROM mg))"""

  def bpeApplySql(merges: Int): String =
    s"WITH RECURSIVE ${bpeCtes(merges)}\nSELECT word, seg, n_tokens FROM seg"

  /** Full BPE TRAINER mirror (bpeTrain): the iterated loop unrolled as
    * plain CTE steps — per round one pair count over the CURRENT
    * segmentation (occurrence-weighted), a 1-row argmax (n desc, pair
    * asc), and the same two-pass boundary replace. EVERY step CTE is
    * MATERIALIZED (the deep-chain planner-inlining lesson). A round
    * whose vocabulary is EXHAUSTED (empty m$i) is a no-op — the LEFT
    * JOIN + COALESCE carries the previous segmentation forward, so the
    * final s$merges equals the Spark side's early-stopped result (and
    * the merge-table UNION simply contributes no row for that round),
    * not an engine-divergent empty frame. */
  private def bpeTrainCtes(merges: Int): String = {
    val sb = new StringBuilder
    sb ++= """wc AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY 1),
s0 AS MATERIALIZED (
  SELECT w, cnt, regexp_replace(w, '(.)', ' \1', 'g') || ' ' AS seg FROM wc)"""
    for (i <- 1 to merges) {
      sb ++= s""",
p$i AS MATERIALIZED (
  SELECT s.syms[j] || ' ' || s.syms[j + 1] AS pair, CAST(SUM(s.cnt) AS BIGINT) AS n
  FROM (SELECT cnt, string_split(trim(seg), ' ') AS syms FROM s${i - 1}) s,
       unnest(generate_series(1, len(s.syms) - 1)) AS t(j)
  WHERE len(s.syms) >= 2 GROUP BY 1),
m$i AS MATERIALIZED (SELECT pair, n FROM p$i ORDER BY n DESC, pair ASC LIMIT 1),
s$i AS MATERIALIZED (
  SELECT s.w, s.cnt,
    COALESCE(
      replace(replace(s.seg, ' ' || m.pair || ' ', ' ' || replace(m.pair, ' ', '') || ' '),
              ' ' || m.pair || ' ', ' ' || replace(m.pair, ' ', '') || ' '),
      s.seg) AS seg
  FROM s${i - 1} s LEFT JOIN m$i m ON TRUE)"""
    }
    sb.toString
  }

  def bpeTrainSql(merges: Int): String = {
    val rows = (1 to merges).map { i =>
      s"SELECT CAST($i AS BIGINT) AS rank, split_part(pair, ' ', 1) AS lhs, " +
        s"split_part(pair, ' ', 2) AS rhs, n FROM m$i"
    }.mkString("\n  UNION ALL ")
    s"WITH ${bpeTrainCtes(merges)}\nSELECT * FROM (\n  $rows\n) ORDER BY rank"
  }

  def bpeTrainSegSql(merges: Int): String =
    s"""WITH ${bpeTrainCtes(merges)}
SELECT w AS word, trim(seg) AS seg,
       CAST(len(string_split(trim(seg), ' ')) AS BIGINT) AS n_tokens
FROM s$merges"""

  /** Subword-fertility mirror: the bpe CTE chain joined back to the
    * word occurrence stream, per-source token mass over word mass. */
  def tokenFertilitySql(merges: Int): String =
    s"""WITH RECURSIVE ${bpeCtes(merges)},
occ AS (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents)
SELECT o.source, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(s.n_tokens) AS BIGINT) AS n_subtokens,
       ROUND(CAST(SUM(s.n_tokens) AS DOUBLE) / COUNT(*), 6) AS fertility
FROM occ o JOIN seg s ON s.word = o.word
WHERE o.word <> '' GROUP BY 1"""

  /** JL-projection mirror: same integer weight grid and w·x sum, 4-dp
    * round. */
  def jlProjectSql(outDims: Int): String =
    s"""WITH ex AS MATERIALIZED (
  SELECT vec_id, i - 1 AS pos, embedding[i]::DOUBLE AS x
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)),
w AS MATERIALIZED (
  SELECT j, d AS pos, ${h60("'jl:' || j || ':' || d")} % 2001 - 1000 AS w
  FROM unnest(generate_series(0, ${outDims - 1})) AS tj(j),
       (SELECT DISTINCT pos AS d FROM ex))
SELECT e.vec_id, CAST(w.j AS BIGINT) AS j, ROUND(SUM(w.w * e.x), 4) AS y
FROM ex e JOIN w ON w.pos = e.pos GROUP BY 1, 2"""

  /** Inverted-index mirror: same (term, doc) tf counts, df over the
    * term window, (tf desc, doc_id asc) rank, cap. */
  def invertedIndexSql(maxPostings: Int): String =
    s"""WITH tf AS MATERIALIZED (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> '' GROUP BY 1, 2),
rk AS (SELECT term, doc_id, tf,
  CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df,
  CAST(ROW_NUMBER() OVER (PARTITION BY term ORDER BY tf DESC, doc_id ASC)
    AS BIGINT) AS rnk FROM tf)
SELECT term, df, rnk, doc_id, tf FROM rk WHERE rnk <= $maxPostings"""

  /** Graded-contamination mirror: same split-before-shingle frames as
    * decontaminateSql, one LEFT join instead of the semi-join, same
    * n_hit/n_grams division order, 6-dp round. */
  def contamScoreSql(evalPct: Int): String =
    s"""WITH sh8 AS MATERIALIZED (
  SELECT DISTINCT doc_id, ${h60("'dc:' || substr(text, i, 8)")} AS g
  FROM documents, unnest(generate_series(1, greatest(len(text) - 7, 1))) AS t(i)),
ev AS MATERIALIZED (SELECT doc_id FROM documents
  WHERE ${h60("'ev:' || CAST(doc_id AS VARCHAR)")} % 100 < $evalPct),
evg AS MATERIALIZED (SELECT DISTINCT g FROM sh8 JOIN ev USING (doc_id))
SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(e.g) AS BIGINT) AS n_hit,
       ROUND(COUNT(e.g)::DOUBLE / COUNT(*), 6) AS frac
FROM sh8 s LEFT JOIN evg e ON e.g = s.g
WHERE s.doc_id NOT IN (SELECT doc_id FROM ev)
GROUP BY s.doc_id"""

  /** DSIR mirror: same bucket hash, same one-pass conditional counts,
    * same ln((ct+1)/(nt+dim)) − ln((cr+1)/(nr+dim)) per-bucket
    * log-ratio (one double per bucket, identical op order →
    * bit-identical), per-doc ROUND(SUM, 6) ranked with doc_id
    * tiebreak. */
  def dsirWeightsSql(targetLang: String, dim: Int, k: Int): String =
    s"""WITH toks AS MATERIALIZED (
  SELECT doc_id, lang, ${h60("'ds:' || term")} % $dim AS b
  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        FROM documents) WHERE term <> ''),
d AS MATERIALIZED (SELECT b, COUNT(*) AS cr,
  COUNT(*) FILTER (WHERE lang = '$targetLang') AS ct FROM toks GROUP BY 1),
tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM d),
lr AS (SELECT b, ln((ct + 1)::DOUBLE / (nt + $dim)) -
                 ln((cr + 1)::DOUBLE / (nr + $dim)) AS lr
       FROM d CROSS JOIN tot),
sc AS (SELECT doc_id, ROUND(SUM(lr), 6) AS logw
       FROM toks JOIN lr USING (b) GROUP BY 1),
rk AS (SELECT doc_id, logw,
       ROW_NUMBER() OVER (ORDER BY logw DESC, doc_id ASC) AS rn FROM sc)
SELECT CAST(rn AS BIGINT) AS rn, doc_id, logw FROM rk WHERE rn <= $k"""

  /** SemDeDup mirror: label-blocked pairwise cosine (same ex/nrm CTEs
    * and round-6 discipline as the other cosine oracles), τ-graph
    * connected components via the recursive transitive walk (cluster
    * label = min member — the dedupClustersSql contract), every vector
    * emitted with singletons keeping themselves. */
  def semDedupSql(minCosine: Double): String =
    s"""WITH RECURSIVE ex AS MATERIALIZED (
  SELECT vec_id, i - 1 AS pos, embedding[i]::DOUBLE AS x
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)),
nrm AS MATERIALIZED (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ex GROUP BY vec_id),
cand AS MATERIALIZED (
  SELECT e1.vec_id AS a, e2.vec_id AS b
  FROM embeddings e1 JOIN embeddings e2
    ON e1.label = e2.label AND e1.vec_id < e2.vec_id),
dots AS (SELECT c.a, c.b, SUM(x.x * y.x) AS dot
         FROM cand c JOIN ex x ON x.vec_id = c.a
         JOIN ex y ON y.vec_id = c.b AND y.pos = x.pos
         GROUP BY 1, 2),
prs AS MATERIALIZED (SELECT a, b FROM (
  SELECT a, b, ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
  FROM dots JOIN nrm na ON na.vec_id = a JOIN nrm nb ON nb.vec_id = b)
  WHERE cosine >= $minCosine),
sym AS MATERIALIZED (SELECT a AS s, b AS t FROM prs
  UNION ALL SELECT b, a FROM prs),
walk(id, comp) AS (
  SELECT s, s FROM sym
  UNION
  SELECT e.t, w.comp FROM walk w JOIN sym e ON e.s = w.id),
comps AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id)
SELECT v.vec_id, COALESCE(c.comp, v.vec_id) AS rep_id,
       CAST(CASE WHEN COALESCE(c.comp, v.vec_id) = v.vec_id
            THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM embeddings v LEFT JOIN comps c ON c.id = v.vec_id"""

  /** Fuzzy-match mirror: same token blocking, same df cap, DuckDB's
    * levenshtein — the same integer edit distance Spark computes, so
    * the match set is exact. */
  def fuzzyMatchSql(maxDist: Int, maxDf: Long): String =
    s"""WITH n AS MATERIALIZED (
  SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL),
b AS MATERIALIZED (SELECT DISTINCT name, w FROM (
  SELECT name, unnest(string_split(name, ' ')) AS w FROM n) WHERE w <> ''),
keep AS MATERIALIZED (
  SELECT b.name, b.w FROM b JOIN (
    SELECT w, COUNT(*) AS df FROM b GROUP BY 1 HAVING COUNT(*) <= $maxDf)
    d ON d.w = b.w),
cand AS (SELECT DISTINCT x.name AS a, y.name AS b
         FROM keep x JOIN keep y ON x.w = y.w AND x.name < y.name)
SELECT a, b, CAST(levenshtein(a, b) AS BIGINT) AS dist
FROM cand WHERE levenshtein(a, b) <= $maxDist"""

  // ---- Corpus statistics & hypothesis tests (graft.pipeline.Stats) ----

  /** Shared doc-feature CTE: exact BIGINT (n_chars, ws_tokens,
    * distinct_types) per document — the same triple Stats.docFeatures
    * computes. */
  private val docFeaturesCte: String =
    """f AS (SELECT source, CAST(n_chars AS BIGINT) AS nc,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS nt,
  CAST(len(list_distinct(list_filter(string_split(text, ' '),
    t -> t <> ''))) AS BIGINT) AS ny
  FROM documents)"""

  val featureCorrSql: String =
    s"""WITH $docFeaturesCte,
a AS (SELECT COUNT(*) AS n, SUM(nc) AS sc, SUM(nt) AS st, SUM(ny) AS sy,
  SUM(nc*nc) AS scc, SUM(nt*nt) AS stt, SUM(ny*ny) AS syy,
  SUM(nc*nt) AS sct, SUM(nc*ny) AS scy, SUM(nt*ny) AS sty FROM f)
SELECT * FROM (
  SELECT 'n_chars' AS x_col, 'ws_tokens' AS y_col,
    ROUND(CAST(n*sct - sc*st AS DOUBLE) /
      (sqrt(CAST(n*scc - sc*sc AS DOUBLE)) *
       sqrt(CAST(n*stt - st*st AS DOUBLE))), 6) AS r FROM a
  UNION ALL
  SELECT 'n_chars', 'distinct_types',
    ROUND(CAST(n*scy - sc*sy AS DOUBLE) /
      (sqrt(CAST(n*scc - sc*sc AS DOUBLE)) *
       sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6) FROM a
  UNION ALL
  SELECT 'ws_tokens', 'distinct_types',
    ROUND(CAST(n*sty - st*sy AS DOUBLE) /
      (sqrt(CAST(n*stt - st*st AS DOUBLE)) *
       sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6) FROM a)
ORDER BY x_col, y_col"""

  val linRegSql: String =
    s"""WITH $docFeaturesCte,
s AS (SELECT source, COUNT(*) AS n, SUM(nc) AS sx, SUM(nt) AS sy,
  SUM(nc*nc) AS sxx, SUM(nt*nt) AS syy, SUM(nc*nt) AS sxy
  FROM f GROUP BY source),
t AS (SELECT source, n, sx, sy,
  CASE WHEN n >= 2 AND CAST(n*sxx - sx*sx AS DOUBLE) > 0.0
    THEN CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
  END AS slope,
  CASE WHEN n >= 2 AND CAST(n*sxx - sx*sx AS DOUBLE) > 0.0
    THEN CAST(n*sxy - sx*sy AS DOUBLE) /
      (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
       sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
  END AS r
  FROM s)
SELECT source, n, ROUND(slope, 6) AS slope,
  ROUND((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) /
    CAST(n AS DOUBLE), 6) AS intercept,
  ROUND(r * r, 6) AS r2
FROM t ORDER BY source"""

  val mutualInfoSql: String =
    """WITH cells AS (SELECT lang AS a, source AS b, COUNT(*) AS c
  FROM documents GROUP BY 1, 2),
ma AS (SELECT a, SUM(c) AS ca FROM cells GROUP BY 1),
mb AS (SELECT b, SUM(c) AS cb FROM cells GROUP BY 1),
nn AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM cells),
mi AS (SELECT ROUND(SUM((CAST(c AS DOUBLE) / n) *
    ln((CAST(c AS DOUBLE) * n) / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE)))),
    6) AS mi
  FROM cells JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN nn),
ha AS (SELECT ROUND(-SUM((CAST(ca AS DOUBLE) / n) *
    ln(CAST(ca AS DOUBLE) / n)), 6) AS h_a FROM ma CROSS JOIN nn),
hb AS (SELECT ROUND(-SUM((CAST(cb AS DOUBLE) / n) *
    ln(CAST(cb AS DOUBLE) / n)), 6) AS h_b FROM mb CROSS JOIN nn)
SELECT mi, h_a, h_b FROM mi CROSS JOIN ha CROSS JOIN hb"""

  val chiSquaredSql: String =
    """WITH cells AS (SELECT lang AS a, source AS b, COUNT(*) AS c
  FROM documents GROUP BY 1, 2),
ma AS (SELECT a, SUM(c) AS ca FROM cells GROUP BY 1),
mb AS (SELECT b, SUM(c) AS cb FROM cells GROUP BY 1),
nn AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM cells),
agg AS (SELECT
  SUM(CAST(c AS DOUBLE) * CAST(c AS DOUBLE) * n /
      (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))) AS s,
  COUNT(DISTINCT a) AS ka, COUNT(DISTINCT b) AS kb, ANY_VALUE(n) AS n
  FROM cells JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN nn)
SELECT ROUND(greatest(s - n, 0.0), 6) AS chi2,
  CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof,
  ROUND(sqrt(greatest(s - n, 0.0) /
    (n * CAST(least(ka - 1, kb - 1) AS DOUBLE))), 6) AS cramers_v
FROM agg"""

  /** Benford mirror: the leading digit comes from exact integer cents
    * rendered as a string (engine-identical), never from
    * ⌊log10 double⌋. */
  val benfordSql: String =
    """WITH d AS (SELECT CAST(substr(CAST(CAST(
    round(CAST(o_totalprice AS DOUBLE) * 100.0) AS BIGINT) AS VARCHAR),
    1, 1) AS BIGINT) AS digit
  FROM orders WHERE CAST(o_totalprice AS DOUBLE) > 0.0),
g AS (SELECT digit, COUNT(*) AS cnt FROM d
  WHERE digit BETWEEN 1 AND 9 GROUP BY 1),
nn AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM g)
SELECT digit, cnt,
  ROUND(CAST(cnt AS DOUBLE) / n, 6) AS freq,
  ROUND(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 6) AS expected,
  ROUND(CAST(cnt AS DOUBLE) / n -
    ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 6) AS dev
FROM g CROSS JOIN nn ORDER BY digit"""

  val welchTSql: String =
    """WITH s AS (SELECT source, COUNT(*) AS n,
  SUM(CAST(n_chars AS BIGINT)) AS sx,
  SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT)) AS sxx
  FROM documents GROUP BY 1),
sd AS (SELECT source, n, CAST(sx AS DOUBLE) / n AS m,
  CASE WHEN n >= 2 THEN
    (CAST(sxx AS DOUBLE) -
     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
    CAST(n - 1 AS DOUBLE)
  END AS v
  FROM s)
SELECT a.source AS src_a, b.source AS src_b, a.n AS n_a, b.n AS n_b,
  ROUND(CASE WHEN (a.v / CAST(a.n AS DOUBLE) + b.v / CAST(b.n AS DOUBLE)) > 0.0
    THEN (a.m - b.m) /
      sqrt(a.v / CAST(a.n AS DOUBLE) + b.v / CAST(b.n AS DOUBLE))
  END, 6) AS t,
  ROUND(CASE WHEN (a.v / CAST(a.n AS DOUBLE) + b.v / CAST(b.n AS DOUBLE)) > 0.0
    THEN (a.v / CAST(a.n AS DOUBLE) + b.v / CAST(b.n AS DOUBLE)) *
         (a.v / CAST(a.n AS DOUBLE) + b.v / CAST(b.n AS DOUBLE)) /
      ((a.v / CAST(a.n AS DOUBLE)) * (a.v / CAST(a.n AS DOUBLE)) /
         CAST(a.n - 1 AS DOUBLE) +
       (b.v / CAST(b.n AS DOUBLE)) * (b.v / CAST(b.n AS DOUBLE)) /
         CAST(b.n - 1 AS DOUBLE))
  END, 6) AS df
FROM sd a JOIN sd b ON a.source < b.source
ORDER BY src_a, src_b"""

  /** KS mirror: full (value × source) grid so every source's ECDF is
    * evaluated at every step point of the pooled distribution, exactly
    * as Stats.ksBySource does. */
  val ksBySourceSql: String =
    """WITH cnt AS (SELECT CAST(n_chars AS BIGINT) AS v, source,
  COUNT(*) AS c FROM documents GROUP BY 1, 2),
grid AS (SELECT vv.v, ss.source FROM (SELECT DISTINCT v FROM cnt) vv
  CROSS JOIN (SELECT DISTINCT source FROM cnt) ss),
cum AS (SELECT g.v, g.source, COALESCE(c.c, 0) AS c,
  SUM(COALESCE(c.c, 0)) OVER (PARTITION BY g.source ORDER BY g.v) AS cum
  FROM grid g LEFT JOIN cnt c ON c.v = g.v AND c.source = g.source),
ca AS (SELECT v, SUM(cum) AS cum_all FROM cum GROUP BY 1),
ts AS (SELECT source, SUM(c) AS n_s FROM cnt GROUP BY 1),
nn AS (SELECT SUM(c) AS n_all FROM cnt)
SELECT cum.source, CAST(ANY_VALUE(ts.n_s) AS BIGINT) AS n_s,
  ROUND(MAX(abs(CAST(cum.cum AS DOUBLE) / ts.n_s -
    CAST(ca.cum_all - cum.cum AS DOUBLE) / (nn.n_all - ts.n_s))), 6)
    AS d_stat
FROM cum JOIN ca USING (v) JOIN ts USING (source) CROSS JOIN nn
GROUP BY cum.source ORDER BY cum.source"""

  /** Mann–Whitney mirror: half-unit-integer 2U accumulation and the
    * pooled Σ(t³−t) tie term, exactly the Spark operator order. */
  val mannWhitneySql: String =
    """WITH cnt AS (SELECT CAST(n_chars AS BIGINT) AS v, source,
  COUNT(*) AS c FROM documents GROUP BY 1, 2),
al AS (SELECT v, SUM(c) AS c_all FROM cnt GROUP BY 1),
alc AS (SELECT v, c_all, SUM(c_all) OVER (ORDER BY v) AS cum_all FROM al),
cs AS (SELECT v, source, c,
  SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum_s FROM cnt),
ts AS (SELECT source, SUM(c) AS n_s FROM cnt GROUP BY 1),
gr AS (SELECT SUM(c_all) AS n_all,
  SUM(c_all * c_all * c_all - c_all) AS ties FROM al),
u AS (SELECT source,
  SUM(c * (2 * ((cum_all - c_all) - (cum_s - c)) + (c_all - c))) AS u2
  FROM cs JOIN alc USING (v) GROUP BY 1)
SELECT u.source, CAST(ts.n_s AS BIGINT) AS n_s,
  ROUND(CAST(u2 AS DOUBLE) / 2.0, 6) AS u,
  ROUND(CASE WHEN sqrt(CAST(ts.n_s AS DOUBLE) *
      CAST(gr.n_all - ts.n_s AS DOUBLE) / 12.0 *
      ((CAST(gr.n_all AS DOUBLE) + 1.0) -
       CAST(gr.ties AS DOUBLE) /
         (CAST(gr.n_all AS DOUBLE) * (CAST(gr.n_all AS DOUBLE) - 1.0)))) > 0.0
    THEN (CAST(u2 AS DOUBLE) / 2.0 -
      CAST(ts.n_s AS DOUBLE) * CAST(gr.n_all - ts.n_s AS DOUBLE) / 2.0) /
      sqrt(CAST(ts.n_s AS DOUBLE) *
      CAST(gr.n_all - ts.n_s AS DOUBLE) / 12.0 *
      ((CAST(gr.n_all AS DOUBLE) + 1.0) -
       CAST(gr.ties AS DOUBLE) /
         (CAST(gr.n_all AS DOUBLE) * (CAST(gr.n_all AS DOUBLE) - 1.0))))
  END, 6) AS z
FROM u JOIN ts USING (source) CROSS JOIN gr ORDER BY source"""

  val heapsFitSql: String =
    """WITH tk AS (SELECT source, t
  FROM (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> ''),
sv AS (SELECT ln(CAST(COUNT(*) AS DOUBLE)) AS x,
  ln(CAST(COUNT(DISTINCT t) AS DOUBLE)) AS y FROM tk GROUP BY source),
a AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k, SUM(x) AS sx, SUM(y) AS sy,
  SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy FROM sv)
SELECT CAST(k AS BIGINT) AS n_sources,
  ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS beta,
  ROUND((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k, 6)
    AS ln_k,
  ROUND(((k * sxy - sx * sy) /
      (sqrt(k * sxx - sx * sx) * sqrt(k * syy - sy * sy))) *
    ((k * sxy - sx * sy) /
      (sqrt(k * sxx - sx * sx) * sqrt(k * syy - sy * sy))), 6) AS r2
FROM a"""

  /** Centroid-similarity mirror: unrounded per-(label, pos) means feed
    * the dot/norm sums, rounding only at the final cosine. */
  val centroidSimSql: String =
    """WITH cen AS (SELECT CAST(label AS BIGINT) AS label,
  CAST(i - 1 AS BIGINT) AS pos, AVG(embedding[i]::DOUBLE) AS c
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
  GROUP BY 1, 2),
d AS (SELECT a.label AS la, b.label AS lb, SUM(a.c * b.c) AS dot
  FROM cen a JOIN cen b ON a.pos = b.pos AND a.label < b.label
  GROUP BY 1, 2),
nrm AS (SELECT label, SUM(c * c) AS nn FROM cen GROUP BY 1)
SELECT la, lb, ROUND(dot / (sqrt(na.nn) * sqrt(nb.nn)), 6) AS cos
FROM d JOIN nrm na ON na.label = d.la JOIN nrm nb ON nb.label = d.lb
ORDER BY la, lb"""

  val theilBySourceSql: String =
    """WITH s AS (SELECT source, COUNT(*) AS n,
  SUM(CAST(n_chars AS BIGINT)) AS sx,
  SUM(CAST(n_chars AS DOUBLE) * ln(CAST(n_chars AS DOUBLE))) AS sxlx
  FROM documents WHERE CAST(n_chars AS BIGINT) > 0 GROUP BY 1)
SELECT source, n,
  ROUND(sxlx / CAST(sx AS DOUBLE) -
    ln(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS theil
FROM s ORDER BY source"""

  /** JSD mirror: KL(Q‖M) closed over the source's terms only —
    * absent-term mass contributes ln 2·(1 − Σq), same as the Spark
    * side. */
  val jsdBySourceSql: String =
    """WITH tk AS (SELECT source, term
  FROM (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''),
st AS (SELECT source, term, COUNT(*) AS c_st FROM tk GROUP BY 1, 2),
stot AS (SELECT source, SUM(c_st) AS n_s FROM st GROUP BY 1),
ct AS (SELECT term, SUM(c_st) AS c_t FROM st GROUP BY 1),
nn AS (SELECT CAST(SUM(c_t) AS DOUBLE) AS n FROM ct),
j AS (SELECT source, CAST(c_st AS DOUBLE) / n_s AS p,
  CAST(c_t AS DOUBLE) / nn.n AS q
  FROM st JOIN stot USING (source) JOIN ct USING (term) CROSS JOIN nn),
ag AS (SELECT source, SUM(p * ln(p / ((p + q) / 2.0))) AS a,
  SUM(q * ln(q / ((p + q) / 2.0))) AS b, SUM(q) AS cq
  FROM j GROUP BY 1)
SELECT source, ROUND(0.5 * a + 0.5 * (b + ln(2.0) * (1.0 - cq)), 6) AS jsd
FROM ag ORDER BY source"""

  /** ACF mirror: same day grid, exact-integer centering (D·c − S), the
    * D² factors cancelling in the ratio. */
  /** EWMA mirror: identical power-of-two integer kernel, lag terms and
    * renormalizing weight mass, one final double division. */
  def ewmaDailySql(w: Int): String = {
    val terms = (0 until w)
      .map(k => s"COALESCE(LAG(c, $k) OVER (ORDER BY day), 0) * " +
        s"${1L << (w - 1 - k)}")
      .mkString(" + ")
    s"""WITH dc AS (SELECT CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day,
    CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1),
rng AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM dc),
grid AS (SELECT unnest(generate_series(d0, d1)) AS day FROM rng),
ser AS (SELECT g.day, COALESCE(dc.c, 0) AS c
  FROM grid g LEFT JOIN dc ON dc.day = g.day),
lg AS (SELECT day, c, $terms AS s,
  LEAST(CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT), $w) AS m
  FROM ser)
SELECT day, c, ROUND(CAST(s AS DOUBLE) /
  CAST(${1L << w} - (CAST(1 AS BIGINT) << CAST($w - m AS INT)) AS DOUBLE),
  6) AS ewma
FROM lg ORDER BY day"""
  }

  def dailyAcfSql(maxLag: Int): String = {
    val leads = (1 to maxLag)
      .map(k => s"LEAD(c, $k) OVER (ORDER BY day) AS c$k").mkString(", ")
    val nums = (1 to maxLag)
      .map(k => s"SUM((st.d * c - st.s) * (st.d * c$k - st.s)) AS num$k")
      .mkString(", ")
    val rows = (1 to maxLag).map(k =>
      s"""SELECT CAST($k AS BIGINT) AS lag, ROUND(CASE WHEN den > 0
  THEN CAST(num$k AS DOUBLE) / CAST(den AS DOUBLE) END, 6) AS r FROM ag""")
      .mkString("\n  UNION ALL ")
    s"""WITH dc AS (SELECT CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day,
    CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1),
rng AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM dc),
grid AS (SELECT unnest(generate_series(d0, d1)) AS day FROM rng),
ser AS (SELECT g.day, COALESCE(dc.c, 0) AS c
  FROM grid g LEFT JOIN dc ON dc.day = g.day),
lg AS (SELECT c, $leads FROM ser),
st AS (SELECT SUM(c) AS s, COUNT(*) AS d FROM ser),
ag AS (SELECT SUM((st.d * c - st.s) * (st.d * c - st.s)) AS den, $nums
  FROM lg CROSS JOIN st)
SELECT * FROM ($rows) ORDER BY lag"""
  }

  /** Per-doc entropy mirror: H = ln n − (Σ c·ln c)/n, identical
    * operator order. */
  val docEntropySql: String =
    """WITH tk AS (SELECT doc_id, t
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> ''),
tc AS (SELECT doc_id, t, COUNT(*) AS c FROM tk GROUP BY 1, 2),
ag AS (SELECT doc_id, SUM(c) AS n_toks, COUNT(*) AS n_types,
  SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS slc
  FROM tc GROUP BY 1)
SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks, n_types,
  ROUND(ln(CAST(n_toks AS DOUBLE)) - slc / CAST(n_toks AS DOUBLE), 6) AS h,
  ROUND(CASE WHEN n_types > 1 THEN
    (ln(CAST(n_toks AS DOUBLE)) - slc / CAST(n_toks AS DOUBLE)) /
    ln(CAST(n_types AS DOUBLE)) END, 6) AS h_norm
FROM ag"""

  /** Jaro–Winkler linkage mirror: DuckDB's jaro_winkler_similarity IS
    * the pinned semantics (graft.sql.JaroWinklerAlgo mirrors it);
    * same blocking, same round-then-gate. */
  def jaroMatchSql(minSim: Double, maxDf: Long): String =
    s"""WITH n AS (SELECT DISTINCT p_name AS name FROM part
  WHERE p_name IS NOT NULL),
bl AS (SELECT DISTINCT name, w
  FROM (SELECT name, unnest(string_split(name, ' ')) AS w FROM n)
  WHERE w <> ''),
kept AS (SELECT bl.name, bl.w FROM bl
  JOIN (SELECT w, COUNT(*) AS df FROM bl GROUP BY 1) d
    ON d.w = bl.w AND d.df <= $maxDf),
pairs AS (SELECT DISTINCT x.name AS a, y.name AS b
  FROM kept x JOIN kept y ON x.w = y.w AND x.name < y.name)
SELECT a, b, ROUND(jaro_winkler_similarity(a, b), 6) AS jw
FROM pairs WHERE ROUND(jaro_winkler_similarity(a, b), 6) >= $minSim"""

  /** Levenshtein-linkage mirror: the jaroMatchSql blocking with the
    * exact unit-cost edit distance. */
  def editMatchSql(maxDist: Int, maxDf: Long): String =
    s"""WITH n AS (SELECT DISTINCT p_name AS name FROM part
  WHERE p_name IS NOT NULL),
bl AS (SELECT DISTINCT name, w
  FROM (SELECT name, unnest(string_split(name, ' ')) AS w FROM n)
  WHERE w <> ''),
kept AS (SELECT bl.name, bl.w FROM bl
  JOIN (SELECT w, COUNT(*) AS df FROM bl GROUP BY 1) d
    ON d.w = bl.w AND d.df <= $maxDf),
pairs AS (SELECT DISTINCT x.name AS a, y.name AS b
  FROM kept x JOIN kept y ON x.w = y.w AND x.name < y.name)
SELECT a, b, CAST(levenshtein(a, b) AS BIGINT) AS dist
FROM pairs WHERE levenshtein(a, b) <= $maxDist"""

  /** Simplified-silhouette mirror: the annIvfExactSql k-means skeleton
    * (same init, same truncated integer means), then the per-cluster
    * decile histogram of s = (√b²−√a²)/√b². */
  def silhouetteSql(k: Int, iters: Int, scale: Int): String = {
    val sb = new StringBuilder(
      s"""WITH iv AS MATERIALIZED (
  SELECT vec_id, i - 1 AS pos,
    CAST(floor(embedding[i]::DOUBLE * $scale) AS BIGINT) AS xi
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)),
c0 AS (SELECT vec_id - 10 AS cid, pos, xi AS c FROM iv
  WHERE vec_id >= 10 AND vec_id < ${10 + k})""")
    for (t <- 1 to iters) {
      sb ++= s""",
d$t AS MATERIALIZED (SELECT iv.vec_id, c.cid,
  SUM((iv.xi - c.c) * (iv.xi - c.c)) AS dist
  FROM iv JOIN c${t - 1} c ON c.pos = iv.pos GROUP BY 1, 2),
a$t AS MATERIALIZED (SELECT vec_id, cid FROM (
  SELECT vec_id, cid, ROW_NUMBER() OVER (
    PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn FROM d$t)
  WHERE rn = 1),
c$t AS MATERIALIZED (SELECT a.cid, iv.pos,
  CAST(SUM(iv.xi) // COUNT(*) AS BIGINT) AS c
  FROM a$t a JOIN iv ON iv.vec_id = a.vec_id GROUP BY 1, 2)"""
    }
    sb ++= s""",
fd AS MATERIALIZED (SELECT iv.vec_id, c.cid,
  SUM((iv.xi - c.c) * (iv.xi - c.c)) AS dist
  FROM iv JOIN c$iters c ON c.pos = iv.pos GROUP BY 1, 2),
fr AS (SELECT vec_id, cid, dist, ROW_NUMBER() OVER (
  PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn FROM fd),
ab AS (SELECT vec_id, MAX(CASE WHEN rn = 1 THEN cid END) AS cid,
  MAX(CASE WHEN rn = 1 THEN dist END) AS a2,
  MAX(CASE WHEN rn = 2 THEN dist END) AS b2
  FROM fr WHERE rn <= 2 GROUP BY 1),
sv AS (SELECT cid, LEAST(CAST(floor((CASE WHEN b2 > 0
    THEN (sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE))) /
      sqrt(CAST(b2 AS DOUBLE)) ELSE 0.0 END) * 10) AS BIGINT), 9)
    AS bucket FROM ab)
SELECT CAST(cid AS BIGINT) AS cid, bucket, CAST(COUNT(*) AS BIGINT) AS n
FROM sv GROUP BY 1, 2 ORDER BY 1, 2"""
    sb.toString
  }

  /** Phrase-mining mirror: raw-split adjacency via toks[i]/toks[i+1],
    * the same (c_ab − δ)·N/(c_a·c_b) score and lexical tiebreak. */
  def phraseStatsSql(minCount: Long, delta: Double, topK: Int): String =
    s"""WITH tk AS MATERIALIZED (SELECT doc_id, i AS pos, toks[i] AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
  unnest(generate_series(1, len(toks))) AS t(i)),
uni AS MATERIALIZED (SELECT w, COUNT(*) AS c FROM tk WHERE w <> ''
  GROUP BY 1),
nn AS (SELECT SUM(c) AS n_toks FROM uni),
bi AS (SELECT a.w AS w1, b.w AS w2, COUNT(*) AS c_ab
  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.w <> '' AND b.w <> ''
  GROUP BY 1, 2 HAVING COUNT(*) >= $minCount)
SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
  ROUND((CAST(c_ab AS DOUBLE) - $delta) * CAST(n_toks AS DOUBLE) /
    (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE)), 6) AS score
FROM bi JOIN uni ua ON ua.w = bi.w1 JOIN uni ub ON ub.w = bi.w2
CROSS JOIN nn
ORDER BY score DESC, w1, w2 LIMIT $topK"""

  /** Stopword-profile mirror: the same fixed function-word list. */
  def stopwordProfileSql(stopwords: Seq[String]): String = {
    val lst = stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH tk AS (SELECT source, w
  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents)
  WHERE w <> '')
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_toks,
  CAST(SUM(CASE WHEN w IN ($lst) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
  ROUND(CAST(SUM(CASE WHEN w IN ($lst) THEN 1 ELSE 0 END) AS DOUBLE) /
    CAST(COUNT(*) AS DOUBLE), 6) AS stop_ratio,
  CAST(COUNT(DISTINCT CASE WHEN w IN ($lst) THEN w END) AS BIGINT)
    AS n_distinct_stop
FROM tk GROUP BY 1 ORDER BY 1"""
  }

  /** Naive-Bayes confusion mirror: same folded smoothing (absent
    * tokens collapse into the T_d·ln(N_c+V) term), same 6dp-then-
    * argmax tiebreak on class name. */
  val naiveBayesSql: String =
    """WITH tk AS (SELECT doc_id, source, t
  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
        FROM documents)
  WHERE t <> ''),
dt AS (SELECT doc_id, t, COUNT(*) AS n_dt FROM tk GROUP BY 1, 2),
ct AS (SELECT source AS cls, t, COUNT(*) AS c_tc FROM tk GROUP BY 1, 2),
vb AS (SELECT COUNT(DISTINCT t) AS v FROM ct),
cs AS (SELECT cls, SUM(c_tc) AS n_c FROM ct GROUP BY 1),
pr AS (SELECT source AS cls, COUNT(*) AS d_c FROM documents GROUP BY 1),
dtot AS (SELECT COUNT(*) AS d FROM documents),
csx AS (SELECT cs.cls,
  ln(CAST(d_c AS DOUBLE)) - ln(CAST(d AS DOUBLE)) AS lp,
  ln(CAST(n_c + v AS DOUBLE)) AS lnv
  FROM cs JOIN pr USING (cls) CROSS JOIN vb CROSS JOIN dtot),
pa AS (SELECT doc_id, cls,
  SUM(CAST(n_dt AS DOUBLE) * ln(CAST(c_tc + 1 AS DOUBLE))) AS part
  FROM dt JOIN ct USING (t) GROUP BY 1, 2),
ds AS (SELECT doc_id, source AS actual,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS t_d
  FROM documents),
sc AS (SELECT ds.doc_id, ds.actual, csx.cls,
  ROUND(lp - CAST(t_d AS DOUBLE) * lnv + COALESCE(part, 0.0), 6) AS score
  FROM ds CROSS JOIN csx
  LEFT JOIN pa ON pa.doc_id = ds.doc_id AND pa.cls = csx.cls),
pick AS (SELECT doc_id, actual, cls,
  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cls ASC)
    AS rk FROM sc)
SELECT actual, cls AS predicted, COUNT(*) AS n_docs
FROM pick WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Lexical-profile mirror: identical BIGINT sufficient statistics
    * per source, closed forms term for term. */
  val lexicalProfileSql: String =
    """WITH tk AS (SELECT source, t
  FROM (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> ''),
st AS (SELECT source, t, COUNT(*) AS c FROM tk GROUP BY 1, 2),
ag AS (SELECT source, SUM(c) AS n_toks, COUNT(*) AS n_types,
  SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS hapax,
  SUM(c * c) AS scc FROM st GROUP BY 1)
SELECT source, CAST(n_toks AS BIGINT) AS n_toks, n_types,
  ROUND(CAST(hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 6) AS hapax_ratio,
  ROUND(1e4 * CAST(scc - n_toks AS DOUBLE) /
    (CAST(n_toks AS DOUBLE) * CAST(n_toks AS DOUBLE)), 6) AS yule_k,
  ROUND(CASE WHEN n_toks > 1 THEN CAST(scc - n_toks AS DOUBLE) /
    (CAST(n_toks AS DOUBLE) * (CAST(n_toks AS DOUBLE) - 1.0)) END, 6)
    AS simpson
FROM ag ORDER BY source"""

  /** Flesch mirror: same regex counts (RE2 ≡ Java on these literal
    * classes), same clamp, same closed form. */
  val readabilitySql: String =
    """WITH per AS (SELECT source,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS w,
  GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1) AS s,
  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS y
  FROM documents),
ag AS (SELECT source, SUM(w) AS words, SUM(s) AS sentences,
  SUM(y) AS syllables FROM per GROUP BY 1)
SELECT source, CAST(words AS BIGINT) AS words,
  CAST(sentences AS BIGINT) AS sentences,
  CAST(syllables AS BIGINT) AS syllables,
  ROUND(206.835 - 1.015 * CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE)
    - 84.6 * CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE), 4) AS flesch
FROM ag ORDER BY source"""

  /** One-way ANOVA mirror: identical sufficient statistics and
    * closed-form operator order. */
  val anovaFSql: String =
    """WITH s AS (SELECT source, COUNT(*) AS n_s,
  SUM(CAST(n_chars AS BIGINT)) AS sx_s,
  SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT)) AS sxx_s
  FROM documents GROUP BY 1),
a AS (SELECT COUNT(*) AS k, SUM(n_s) AS n, SUM(sx_s) AS sx,
  SUM(sxx_s) AS sxx,
  SUM(CAST(sx_s AS DOUBLE) * CAST(sx_s AS DOUBLE) /
    CAST(n_s AS DOUBLE)) AS sb FROM s)
SELECT k, CAST(n AS BIGINT) AS n,
  ROUND(sb - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) /
    CAST(n AS DOUBLE), 4) AS ss_between,
  ROUND(CAST(sxx AS DOUBLE) - sb, 4) AS ss_within,
  ROUND(CASE WHEN k > 1 AND CAST(sxx AS DOUBLE) - sb > 0.0 THEN
    ((sb - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
      CAST(k - 1 AS DOUBLE)) /
    ((CAST(sxx AS DOUBLE) - sb) / CAST(n - k AS DOUBLE)) END, 6) AS f
FROM a"""

  /** Kruskal–Wallis mirror: exact 2·avgrank half-unit integers, H and
    * tie correction term for term. */
  val kruskalWallisSql: String =
    """WITH cnt AS (SELECT CAST(n_chars AS BIGINT) AS v, source,
  COUNT(*) AS c FROM documents GROUP BY 1, 2),
al AS (SELECT v, SUM(c) AS c_all FROM cnt GROUP BY 1),
alc AS (SELECT v, c_all, SUM(c_all) OVER (ORDER BY v) AS cum_all FROM al),
gr AS (SELECT SUM(c_all) AS n_all,
  SUM(c_all * c_all * c_all - c_all) AS ties FROM al),
rs AS (SELECT source, SUM(c) AS n_s,
  SUM(c * (2 * (cum_all - c_all) + c_all + 1)) AS r2_s
  FROM cnt JOIN alc USING (v) GROUP BY 1),
ag AS (SELECT COUNT(*) AS k,
  SUM(CAST(r2_s AS DOUBLE) * CAST(r2_s AS DOUBLE) /
    (4.0 * CAST(n_s AS DOUBLE))) AS srr FROM rs)
SELECT k, CAST(n_all AS BIGINT) AS n,
  ROUND(12.0 / (CAST(n_all AS DOUBLE) * (CAST(n_all AS DOUBLE) + 1.0))
    * srr - 3.0 * (CAST(n_all AS DOUBLE) + 1.0), 6) AS h,
  ROUND(CASE WHEN 1.0 - CAST(ties AS DOUBLE) /
      (CAST(n_all AS DOUBLE) * CAST(n_all AS DOUBLE) *
       CAST(n_all AS DOUBLE) - CAST(n_all AS DOUBLE)) > 0.0
    THEN (12.0 / (CAST(n_all AS DOUBLE) * (CAST(n_all AS DOUBLE) + 1.0))
      * srr - 3.0 * (CAST(n_all AS DOUBLE) + 1.0)) /
      (1.0 - CAST(ties AS DOUBLE) /
        (CAST(n_all AS DOUBLE) * CAST(n_all AS DOUBLE) *
         CAST(n_all AS DOUBLE) - CAST(n_all AS DOUBLE)))
    END, 6) AS h_corrected
FROM ag CROSS JOIN gr"""

  /** Spearman mirror: exact 2·avgrank integers per value block, exact
    * 128-bit rank-product sums (HUGEINT ↔ Spark DECIMAL(38,0)),
    * Pearson applied once to the aggregated scalars. */
  val spearmanSql: String =
    """WITH f AS (SELECT CAST(n_chars AS BIGINT) AS nc,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS nt
  FROM documents),
rx AS (SELECT nc AS v, COUNT(*) AS c FROM f GROUP BY 1),
rxc AS (SELECT v, 2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1 AS r FROM rx),
ry AS (SELECT nt AS v, COUNT(*) AS c FROM f GROUP BY 1),
ryc AS (SELECT v, 2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1 AS r FROM ry),
j AS (SELECT CAST(rxc.r AS HUGEINT) AS rxr, CAST(ryc.r AS HUGEINT) AS ryr
  FROM f JOIN rxc ON rxc.v = f.nc JOIN ryc ON ryc.v = f.nt),
a AS (SELECT COUNT(*) AS n, SUM(rxr) AS sx, SUM(ryr) AS sy,
  SUM(rxr * rxr) AS sxx, SUM(ryr * ryr) AS syy,
  SUM(rxr * ryr) AS sxy FROM j)
SELECT n, ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
  (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
   sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
    CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS rho
FROM a"""

  // ===== Round-10 wave: robust / rank statistics, audits, funnels =====

  /** Quantile-norm mirror: the SAME 6dp quality, half-unit ranks
    * (2·cum_below + c)/(2n) per source — term for term. */
  val quantileNormSql: String =
    """WITH q AS (SELECT doc_id, source,
  CAST(len(text) AS BIGINT) AS chars,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS words,
  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS punct,
  CAST(len(regexp_extract_all(text, '\b(the|a|is)\b')) AS BIGINT) AS stop
  FROM documents),
s AS (SELECT doc_id, source,
  ROUND(0.4 * least(words / 100.0, 1.0) + 0.3 * (1.0 - punct / chars)
      + 0.3 * least(5.0 * stop / words, 1.0), 6) AS q FROM q),
cnt AS (SELECT source, q, COUNT(*) AS c FROM s GROUP BY 1, 2),
r AS (SELECT source, q,
  ROUND(CAST(2 * (cum - c) + c AS DOUBLE) / CAST(2 * n_s AS DOUBLE), 6)
    AS pct
  FROM (SELECT source, q, c,
    SUM(c) OVER (PARTITION BY source ORDER BY q) AS cum,
    SUM(c) OVER (PARTITION BY source) AS n_s FROM cnt) t)
SELECT s.doc_id, s.source, s.q, r.pct
FROM s JOIN r USING (source, q)"""

  /** Neyman mirror: identical sufficient statistics and operator
    * order (variance → sqrt → ·n → share → floor(·+0.5)). */
  def neymanAllocationSql(total: Long): String =
    s"""WITH s AS (SELECT source, COUNT(*) AS n,
  SUM(CAST(n_chars AS BIGINT)) AS sx,
  SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT)) AS sxx
  FROM documents GROUP BY 1),
w AS (SELECT source, n,
  CAST(n AS DOUBLE) * sqrt(CASE WHEN n >= 2 THEN
    greatest((CAST(sxx AS DOUBLE) -
      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
      CAST(n - 1 AS DOUBLE), 0.0) ELSE 0.0 END) AS w FROM s),
t AS (SELECT SUM(w) AS wt FROM w)
SELECT source, CAST(n AS BIGINT) AS n_docs,
  ROUND(w / CAST(n AS DOUBLE), 6) AS sigma,
  ROUND(CASE WHEN wt > 0.0 THEN w / wt END, 6) AS share,
  CASE WHEN wt > 0.0
    THEN CAST(FLOOR(w / wt * $total.0 + 0.5) AS BIGINT) END AS n_alloc
FROM w CROSS JOIN t ORDER BY source"""

  /** MAD mirror: lower medians off the same (source, value) count
    * frame, deviation counts derived from it (no second scan). */
  def madOutliersSql(k: Int): String =
    s"""WITH cnt AS (SELECT source, CAST(n_chars AS BIGINT) AS v,
  COUNT(*) AS c FROM documents GROUP BY 1, 2),
c1 AS (SELECT source, v, c,
  SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum,
  SUM(c) OVER (PARTITION BY source) AS n_s FROM cnt),
med AS (SELECT source, MIN(v) AS med FROM c1
  WHERE 2 * cum >= n_s + 1 GROUP BY 1),
dev AS (SELECT cnt.source, abs(v - med) AS v, SUM(c) AS c
  FROM cnt JOIN med USING (source) GROUP BY 1, 2),
d1 AS (SELECT source, v, c,
  SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum,
  SUM(c) OVER (PARTITION BY source) AS n_s FROM dev),
mad AS (SELECT source, MIN(v) AS mad FROM d1
  WHERE 2 * cum >= n_s + 1 GROUP BY 1),
agg AS (SELECT cnt.source, SUM(c) AS n_docs, ANY_VALUE(med) AS median,
  ANY_VALUE(mad) AS mad,
  SUM(CASE WHEN abs(v - med) > $k * mad THEN c ELSE 0 END) AS n_outliers
  FROM cnt JOIN med USING (source) JOIN mad USING (source) GROUP BY 1)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs, median, mad,
  CAST(n_outliers AS BIGINT) AS n_outliers,
  ROUND(CAST(n_outliers AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
    AS outlier_rate
FROM agg ORDER BY source"""

  /** Trimmed-mean mirror: same ⌊α·n⌋ cut, same rank-interval overlap
    * arithmetic on the count frame. */
  def trimmedMeanSql(alpha: Double): String =
    s"""WITH cnt AS (SELECT source, CAST(n_chars AS BIGINT) AS v,
  COUNT(*) AS c FROM documents GROUP BY 1, 2),
c1 AS (SELECT source, v, c,
  SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum,
  SUM(c) OVER (PARTITION BY source) AS n_s FROM cnt),
k AS (SELECT source, v, c, cum, n_s,
  CAST(FLOOR(CAST(n_s AS DOUBLE) * $alpha) AS BIGINT) AS lo FROM c1),
g AS (SELECT source, ANY_VALUE(n_s) AS n_docs,
  SUM(greatest(least(cum, n_s - lo) - greatest(cum - c, lo), 0)) AS n_kept,
  SUM(v * greatest(least(cum, n_s - lo) - greatest(cum - c, lo), 0)) AS mass
  FROM k GROUP BY 1)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(n_kept AS BIGINT) AS n_kept,
  ROUND(CAST(mass AS DOUBLE) / CAST(n_kept AS DOUBLE), 6) AS trimmed_mean
FROM g ORDER BY source"""

  /** Dispersion mirror: the norm fold is a sequential list_reduce
    * (≡ Spark's aggregate() L-to-R), components integerized to 1e-7
    * units, exact HUGEINT sum-vector algebra (≡ Spark DECIMAL). */
  val embedDispersionSql: String =
    """WITH b AS (SELECT vec_id, CAST(label AS BIGINT) AS label, embedding,
  list_reduce(list_transform(embedding,
    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, x) -> a + x) AS nn
  FROM embeddings),
f AS (SELECT * FROM b WHERE nn > 0.0),
u AS (SELECT label, i - 1 AS pos,
  CAST(FLOOR(CAST(embedding[i] AS DOUBLE) / sqrt(nn) * 1e7 + 0.5) AS BIGINT)
    AS u
  FROM f, unnest(generate_series(1, len(embedding))) AS t(i)),
per AS (SELECT label, pos, SUM(u) AS s,
  SUM(CAST(u AS HUGEINT) * CAST(u AS HUGEINT)) AS self
  FROM u GROUP BY 1, 2),
ag AS (SELECT label, SUM(CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS s2,
  SUM(self) AS selfsum FROM per GROUP BY 1),
nn AS (SELECT label, COUNT(*) AS n FROM f GROUP BY 1)
SELECT ag.label, nn.n,
  ROUND(CASE WHEN n >= 2 THEN
    (CAST(s2 AS DOUBLE) - CAST(selfsum AS DOUBLE)) /
    (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) * 1e14) END, 6) AS mean_cos
FROM ag JOIN nn USING (label) ORDER BY label"""

  /** PII co-occurrence mirror: same patterns (the shared RE2-safe
    * list), same boolean flags and pair tallies. */
  val piiCooccurSql: String = {
    val pats = graft.pipeline.TextOps.piiPatterns
    val kinds = pats.map(_._1)
    val flags = pats.map { case (kind, re, _) =>
      s"len(regexp_extract_all(text, '$re')) > 0 AS has_$kind"
    }.mkString(",\n  ")
    val nKinds = kinds.map(k => s"CASE WHEN has_$k THEN 1 ELSE 0 END")
      .mkString(" + ")
    val pairCols = kinds.combinations(2).map { case Seq(a, b) =>
      s"CAST(SUM(CASE WHEN has_$a AND has_$b THEN 1 ELSE 0 END) AS BIGINT) AS n_${a}_$b"
    }.mkString(",\n  ")
    s"""WITH fl AS (SELECT source,
  $flags
  FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN $nKinds >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_any,
  CAST(SUM(CASE WHEN $nKinds >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi,
  $pairCols
FROM fl GROUP BY source ORDER BY source"""
  }

  /** Code-switch mirror: same marker regexes, same dominant-share /
    * language-count gates, same round-before-mean. */
  def codeSwitchSql(maxShare: Double): String = {
    val langs = markerRes.map(_._1)
    val scores = markerRes.map { case (l, re) =>
      s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS s_$l"
    }.mkString(",\n  ")
    val tot = langs.map(l => s"s_$l").mkString(" + ")
    val mx = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
    val nl = langs.map(l => s"CASE WHEN s_$l > 0 THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH sc AS (SELECT source,
  $scores
  FROM documents),
d AS (SELECT source, ($tot) AS tot, $mx AS mx, ($nl) AS nl FROM sc)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN tot > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
  CAST(SUM(CASE WHEN tot > 0 AND nl >= 2 AND
    CAST(mx AS DOUBLE) / CAST(tot AS DOUBLE) <= $maxShare
    THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed,
  ROUND(CASE WHEN SUM(CASE WHEN tot > 0 THEN 1 ELSE 0 END) > 0 THEN
    CAST(SUM(CASE WHEN tot > 0 AND nl >= 2 AND
      CAST(mx AS DOUBLE) / CAST(tot AS DOUBLE) <= $maxShare
      THEN 1 ELSE 0 END) AS DOUBLE) /
    CAST(SUM(CASE WHEN tot > 0 THEN 1 ELSE 0 END) AS DOUBLE) END, 6)
    AS mixed_rate,
  ROUND(AVG(CASE WHEN tot > 0 THEN
    ROUND(CAST(mx AS DOUBLE) / CAST(tot AS DOUBLE), 6) END), 6)
    AS mean_dom_share
FROM d GROUP BY source ORDER BY source"""
  }

  /** Markov-stationary mirror: same per-user lead steps, same
    * row-normalized P, π ← πP unrolled with the 1 − Σflow dangling
    * redistribution, 6dp round only at output. */
  def markovStationarySql(iters: Int): String = {
    val sb = new StringBuilder(
      """WITH stp AS (SELECT event_type AS ft,
  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS tt
  FROM events),
cnt AS (SELECT ft, tt, COUNT(*) AS n FROM stp WHERE tt IS NOT NULL
  GROUP BY 1, 2),
p AS (SELECT ft, tt, CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS p
  FROM cnt JOIN (SELECT ft, SUM(n) AS tot FROM cnt GROUP BY 1) t USING (ft)),
st AS (SELECT DISTINCT event_type AS state FROM events),
kk AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM st),
pi0 AS (SELECT state, 1.0 / k AS pi FROM st CROSS JOIN kk)""")
    for (i <- 1 to iters) {
      sb ++= s""",
f$i AS (SELECT p.tt AS state, SUM(x.pi * p.p) AS flow
  FROM pi${i - 1} x JOIN p ON p.ft = x.state GROUP BY 1),
s$i AS (SELECT SUM(flow) AS fs FROM f$i),
pi$i AS (SELECT st.state,
  COALESCE(f.flow, 0.0) + (1.0 - s$i.fs) / kk.k AS pi
  FROM st LEFT JOIN f$i f ON f.state = st.state CROSS JOIN s$i CROSS JOIN kk)"""
    }
    sb ++= s"\nSELECT state, ROUND(pi, 6) AS pi FROM pi$iters ORDER BY state"
    sb.toString
  }

  /** Entropy-rate mirror: the markovStationary chain + per-state
    * conditional entropies, same coalesce and op order. */
  def entropyRateSql(iters: Int): String = {
    val base = markovStationarySql(iters)
    val prefix = base.substring(0, base.lastIndexOf("\nSELECT"))
    prefix + s""",
h AS (SELECT ft AS state, SUM(-p * ln(p)) AS hc FROM p GROUP BY 1),
ag AS (SELECT SUM(x.pi * COALESCE(h.hc, 0.0)) AS hr
  FROM pi$iters x LEFT JOIN h ON h.state = x.state)
SELECT CAST(kk.k AS BIGINT) AS n_states, ROUND(hr, 6) AS h_rate,
  ROUND(ln(kk.k), 6) AS h_max,
  ROUND(CASE WHEN kk.k > 1 THEN hr / ln(kk.k) END, 6) AS h_ratio
FROM ag CROSS JOIN kk"""
  }

  private val budgetFeatCtes: String =
    """q0 AS (SELECT doc_id, lang,
  CAST(len(text) AS BIGINT) AS chars,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS words,
  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS punct,
  CAST(len(regexp_extract_all(text, '\b(the|a|is)\b')) AS BIGINT) AS stop
  FROM documents),
f AS (SELECT doc_id, lang,
  ROUND(0.4 * least(words / 100.0, 1.0) + 0.3 * (1.0 - punct / chars)
      + 0.3 * least(5.0 * stop / words, 1.0), 6) AS q, words AS nt FROM q0)"""

  /** Token-budget mirror: identical θ/above/tie-block decomposition
    * over the per-(lang, value) count frame. */
  def tokenBudgetSql(budget: Long): String =
    s"""WITH $budgetFeatCtes,
vc AS (SELECT lang, q, COUNT(*) AS c, SUM(nt) AS tok FROM f GROUP BY 1, 2),
cum AS (SELECT lang, q, c, tok,
  SUM(tok) OVER (PARTITION BY lang ORDER BY q DESC) - tok AS cum_above
  FROM vc),
th AS (SELECT lang, MIN(q) AS theta FROM cum WHERE cum_above < $budget
  GROUP BY 1),
ab AS (SELECT cum.lang, SUM(c) AS n_above, SUM(tok) AS tok_above
  FROM cum JOIN th USING (lang) WHERE q > theta GROUP BY 1),
bd AS (SELECT lang, COUNT(*) AS n_boundary, SUM(nt) AS tok_boundary FROM (
  SELECT f.lang, f.nt,
    SUM(f.nt) OVER (PARTITION BY f.lang ORDER BY f.doc_id) AS cum_nt
  FROM f JOIN th ON th.lang = f.lang AND f.q = th.theta) x
  JOIN th USING (lang) LEFT JOIN ab USING (lang)
  WHERE cum_nt <= $budget - COALESCE(tok_above, 0) GROUP BY 1)
SELECT th.lang, th.theta,
  CAST(COALESCE(n_above, 0) AS BIGINT) AS n_above,
  CAST(COALESCE(tok_above, 0) AS BIGINT) AS tok_above,
  CAST(COALESCE(n_boundary, 0) AS BIGINT) AS n_boundary,
  CAST(COALESCE(tok_boundary, 0) AS BIGINT) AS tok_boundary,
  CAST(COALESCE(n_above, 0) + COALESCE(n_boundary, 0) AS BIGINT)
    AS n_selected,
  CAST(COALESCE(tok_above, 0) + COALESCE(tok_boundary, 0) AS BIGINT)
    AS tokens_selected
FROM th LEFT JOIN ab USING (lang) LEFT JOIN bd USING (lang)
ORDER BY lang"""

  /** Quality↔dup calibration mirror: same global value-domain decile
    * formula, dup flags from the SAME minhash candidate CTEs. */
  val qualityDupLiftSql: String =
    s"""WITH ${minhashCtes(16, 4)},
qq AS (SELECT doc_id,
  CAST(len(text) AS BIGINT) AS chars,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS words,
  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS punct,
  CAST(len(regexp_extract_all(text, '\\b(the|a|is)\\b')) AS BIGINT) AS stop
  FROM documents),
ff AS (SELECT doc_id,
  ROUND(0.4 * least(words / 100.0, 1.0) + 0.3 * (1.0 - punct / chars)
      + 0.3 * least(5.0 * stop / words, 1.0), 6) AS q FROM qq),
cq AS (SELECT q, COUNT(*) AS c FROM ff GROUP BY 1),
rr AS (SELECT q, CAST(LEAST(FLOOR(
    CAST(2 * (cum - c) + c AS DOUBLE) / CAST(2 * n AS DOUBLE) * 10.0),
    9.0) AS BIGINT) AS decile
  FROM (SELECT q, c, SUM(c) OVER (ORDER BY q) AS cum,
    SUM(c) OVER () AS n FROM cq) t),
dup AS (SELECT DISTINCT doc_id FROM
  (SELECT a AS doc_id FROM pairs UNION ALL SELECT b AS doc_id FROM pairs)),
fl AS (SELECT ff.doc_id, rr.decile,
  CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup
  FROM ff JOIN rr USING (q) LEFT JOIN dup ON dup.doc_id = ff.doc_id)
SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(is_dup) AS BIGINT) AS n_dup,
  ROUND(CAST(SUM(is_dup) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
    AS dup_rate
FROM fl GROUP BY 1 ORDER BY 1"""

  /** Shard-mix mirror: same salted shard bucket, same (shard, source)
    * count frame, same KL formula. */
  def shardMixSql(shards: Int): String =
    s"""WITH c AS (SELECT ${h60("'shard:' || CAST(doc_id AS VARCHAR)")} % $shards AS shard,
  source, COUNT(*) AS c FROM documents GROUP BY 1, 2),
sh AS (SELECT shard, SUM(c) AS n_docs, COUNT(*) AS n_sources FROM c GROUP BY 1),
g AS (SELECT source, SUM(c) AS g FROM c GROUP BY 1),
t AS (SELECT SUM(g) AS n FROM g)
SELECT shard, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(n_sources AS BIGINT) AS n_sources,
  ROUND(SUM((c / CAST(n_docs AS DOUBLE)) *
    ln((c / CAST(n_docs AS DOUBLE)) / (g / CAST(n AS DOUBLE)))), 6) AS kl
FROM c JOIN sh USING (shard) JOIN g USING (source) CROSS JOIN t
GROUP BY shard, n_docs, n_sources ORDER BY shard"""

  /** Incremental-dedup mirror: same salted index/incoming split, same
    * md5 content fingerprints, same distinct-index left join. */
  def incrementalDedupSql(indexPct: Int): String =
    s"""WITH fp AS (SELECT doc_id, source, md5(text) AS fp,
  ${h60("'inc:' || CAST(doc_id AS VARCHAR)")} % 100 AS b FROM documents),
idx AS (SELECT DISTINCT fp FROM fp WHERE b < $indexPct),
inc AS (SELECT f.source, CASE WHEN i.fp IS NOT NULL THEN 1 ELSE 0 END AS h
  FROM fp f LEFT JOIN idx i ON i.fp = f.fp WHERE f.b >= $indexPct)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_incoming,
  CAST(SUM(h) AS BIGINT) AS n_hit,
  ROUND(SUM(h) / CAST(COUNT(*) AS DOUBLE), 6) AS hit_rate
FROM inc GROUP BY source ORDER BY source"""

  /** Vocab-overlap mirror: same whitespace tokenizer as vocabTopKSql,
    * same distinct (source, term) reduction, same a<b pair join. */
  val vocabOverlapSql: String =
    """WITH st AS (SELECT DISTINCT source, term FROM (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''),
sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS v FROM st GROUP BY 1),
bt AS (SELECT a.source AS source_a, b.source AS source_b,
  CAST(COUNT(*) AS BIGINT) AS n_both
  FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2)
SELECT source_a, source_b, sa.v AS vocab_a, sb.v AS vocab_b, n_both,
  ROUND(n_both / CAST(sa.v + sb.v - n_both AS DOUBLE), 6) AS jaccard
FROM bt JOIN sz sa ON sa.source = bt.source_a
  JOIN sz sb ON sb.source = bt.source_b
ORDER BY source_a, source_b"""

  /** Lang-confusion mirror: the langIdSql CASE chain rolled into the
    * (lang, guess) matrix with row shares. */
  val langConfusionSql: String = {
    val scores = markerRes.map { case (l, re) =>
      s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS s_$l"
    }.mkString(", ")
    val langs = markerRes.map(_._1)
    val cases = langs.init.map { l =>
      val ge = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $ge THEN '$l'"
    }.mkString(" ")
    s"""WITH sc AS (SELECT doc_id, lang, $scores FROM documents),
g AS (SELECT lang, CASE $cases ELSE '${langs.last}' END AS guess FROM sc),
c AS (SELECT lang, guess, COUNT(*) AS n FROM g GROUP BY 1, 2),
t AS (SELECT lang, SUM(n) AS nl FROM c GROUP BY 1)
SELECT lang, guess, CAST(n AS BIGINT) AS n,
  ROUND(n / CAST(nl AS DOUBLE), 6) AS row_share
FROM c JOIN t USING (lang) ORDER BY lang, guess"""
  }

  /** Quality-calibration mirror: the qualityDupLift decile CTEs joined
    * to the gopherRulesSql keep predicate. */
  def qualityCalibrationSql(minWords: Int = 20,
                            maxTopFrac: Double = 0.2): String =
    s"""WITH qq AS (SELECT doc_id,
  CAST(len(text) AS BIGINT) AS chars,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS words,
  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS punct,
  CAST(len(regexp_extract_all(text, '\\b(the|a|is)\\b')) AS BIGINT) AS stop
  FROM documents),
ff AS (SELECT doc_id,
  ROUND(0.4 * least(words / 100.0, 1.0) + 0.3 * (1.0 - punct / chars)
      + 0.3 * least(5.0 * stop / words, 1.0), 6) AS q FROM qq),
cq AS (SELECT q, COUNT(*) AS c FROM ff GROUP BY 1),
rr AS (SELECT q, CAST(LEAST(FLOOR(
    CAST(2 * (cum - c) + c AS DOUBLE) / CAST(2 * n AS DOUBLE) * 10.0),
    9.0) AS BIGINT) AS decile
  FROM (SELECT q, c, SUM(c) OVER (ORDER BY q) AS cum,
    SUM(c) OVER () AS n FROM cq) t),
wt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tc AS (SELECT doc_id, term, COUNT(*) AS c FROM wt GROUP BY 1, 2),
m AS (SELECT doc_id, SUM(c) AS words, MAX(c) AS topc,
             SUM(c * length(term)) / SUM(c) AS mwl,
             SUM(CASE WHEN regexp_full_match(term, '[A-Za-z]+') THEN c ELSE 0 END)
               / SUM(c) AS alpha
      FROM tc GROUP BY 1),
s AS (SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\\b(the|a|is|and|of)\\b')) AS BIGINT)
               AS stop_hits FROM documents),
kp AS (SELECT m.doc_id,
  (words >= $minWords AND mwl >= 3.0 AND mwl <= 10.0 AND alpha >= 0.8
   AND s.stop_hits >= 2 AND topc / words <= $maxTopFrac) AS keep
  FROM m JOIN s USING (doc_id))
SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
  ROUND(SUM(CASE WHEN keep THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6)
    AS keep_rate
FROM ff JOIN rr USING (q) JOIN kp USING (doc_id)
GROUP BY 1 ORDER BY 1"""

  /** Norm-profile mirror: same rounded-norm value frame, same lower
    * median rule. */
  val normProfileSql: String =
    s"""WITH $embCtes,
rn AS (SELECT n.vec_id, ROUND(n.nrm, 6) AS rn,
  CAST(e.label AS BIGINT) AS label
  FROM nrm n JOIN embeddings e ON e.vec_id = n.vec_id),
vc AS (SELECT label, rn, COUNT(*) AS c FROM rn GROUP BY 1, 2),
cum AS (SELECT label, rn, c,
  SUM(c) OVER (PARTITION BY label ORDER BY rn) AS cum,
  SUM(c) OVER (PARTITION BY label) AS n FROM vc),
p50 AS (SELECT label, MIN(rn) AS p50_nrm FROM cum
  WHERE cum * 2 >= n GROUP BY 1)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
  ROUND(AVG(rn), 6) AS mean_nrm, p50_nrm,
  MIN(rn) AS min_nrm, MAX(rn) AS max_nrm
FROM rn JOIN p50 USING (label) GROUP BY label, p50_nrm ORDER BY label"""

  /** DOW-profile mirror: same epoch-dow integers, same share and lift
    * operand order. */
  val dowProfileSql: String =
    """WITH c AS (SELECT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) % 7 AS dow,
  event_type, COUNT(*) AS n FROM events GROUP BY 1, 2),
bd AS (SELECT dow, SUM(n) AS nd FROM c GROUP BY 1),
bt AS (SELECT event_type, SUM(n) AS nt FROM c GROUP BY 1),
t AS (SELECT SUM(nt) AS ntot FROM bt)
SELECT dow, event_type, CAST(n AS BIGINT) AS n,
  ROUND(n / CAST(nd AS DOUBLE), 6) AS dow_share,
  ROUND((n / CAST(nd AS DOUBLE)) / (nt / CAST(ntot AS DOUBLE)), 6) AS lift
FROM c JOIN bd USING (dow) JOIN bt USING (event_type) CROSS JOIN t
ORDER BY dow, event_type"""

  /** Attribution mirror: same inclusive trailing window, zero row via
    * the same purchase-universe left join. */
  def attributionSql(windowHours: Int): String =
    s"""WITH p AS (SELECT event_id AS pid, user_id, ts FROM events
  WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'),
tt AS (SELECT p.pid, CAST(COUNT(*) AS BIGINT) AS t
  FROM p JOIN c ON c.user_id = p.user_id
   AND c.cts >= p.ts - INTERVAL $windowHours HOURS AND c.cts <= p.ts
  GROUP BY 1)
SELECT n_touches, CAST(COUNT(*) AS BIGINT) AS n_purchases FROM (
  SELECT COALESCE(t, 0) AS n_touches FROM p LEFT JOIN tt USING (pid))
GROUP BY 1 ORDER BY 1"""

  /** Split-leakage mirror: same salted split buckets as splitSql, same
    * 8-gram hashes as decontaminateSql (fresh 'lk:' salt), same
    * distinct-doc semi-join. */
  def splitLeakageSql(trainPct: Int, valPct: Int): String =
    s"""WITH b AS (SELECT doc_id,
  ${h60("'sp:' || CAST(doc_id AS VARCHAR)")} % 100 AS b FROM documents),
nt AS (SELECT doc_id, CASE WHEN b < ${trainPct + valPct} THEN 'val'
  ELSE 'test' END AS split FROM b WHERE b >= $trainPct),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, ${h60("'lk:' || substr(text, i, 8)")} AS g
  FROM documents, unnest(generate_series(1, greatest(len(text) - 7, 1))) AS t(i)),
trg AS MATERIALIZED (SELECT DISTINCT g FROM sh
  JOIN b USING (doc_id) WHERE b.b < $trainPct),
lk AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_leaked FROM (
  SELECT DISTINCT nt.split, sh.doc_id
  FROM sh JOIN nt USING (doc_id) JOIN trg USING (g)) GROUP BY 1),
cnt AS (SELECT split, COUNT(*) AS n_docs FROM nt GROUP BY 1)
SELECT split, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(COALESCE(n_leaked, 0) AS BIGINT) AS n_leaked,
  ROUND(COALESCE(n_leaked, 0) / CAST(n_docs AS DOUBLE), 6) AS leak_rate
FROM cnt LEFT JOIN lk USING (split) ORDER BY split"""

  /** Rolling-volume mirror: same observed-day ROWS frame, mean as the
    * same explicit sum/count division. */
  val rollingVolumeSql: String =
    """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
  CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1)
SELECT strftime(day, '%Y-%m-%d') AS day, n,
  ROUND(CAST(SUM(n) OVER w7 AS DOUBLE) / CAST(COUNT(n) OVER w7 AS DOUBLE), 6)
    AS ma7,
  CAST(MIN(n) OVER w7 AS BIGINT) AS min7,
  CAST(MAX(n) OVER w7 AS BIGINT) AS max7,
  CAST(n - lag(n, 1) OVER (ORDER BY day) AS BIGINT) AS delta
FROM daily
WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY day"""

  /** Churn mirror: same epoch-week integers, same shifted semi-join,
    * same last-week exclusion. */
  val churnSql: String =
    """WITH uw AS (SELECT DISTINCT CAST(FLOOR(epoch(ts) / 604800) AS BIGINT)
    AS wk, user_id FROM events),
act AS (SELECT wk, CAST(COUNT(*) AS BIGINT) AS active FROM uw GROUP BY 1),
ret AS (SELECT a.wk, CAST(COUNT(*) AS BIGINT) AS retained
  FROM uw a JOIN uw b ON b.wk = a.wk + 1 AND b.user_id = a.user_id
  GROUP BY 1),
mx AS (SELECT MAX(wk) AS mx FROM act)
SELECT wk, active, COALESCE(retained, 0) AS retained_next,
  active - COALESCE(retained, 0) AS churned_next,
  ROUND(CAST(active - COALESCE(retained, 0) AS DOUBLE) /
    CAST(active AS DOUBLE), 6) AS churn_rate
FROM act LEFT JOIN ret USING (wk) CROSS JOIN mx
WHERE wk < mx ORDER BY wk"""

  /** Hour-profile mirror: same epoch-hour mod 24 integers, same
    * share and lift operand order (the dowProfile formula). */
  val hourProfileSql: String =
    """WITH c AS (SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) % 24 AS hod,
  event_type, COUNT(*) AS n FROM events GROUP BY 1, 2),
bh AS (SELECT hod, SUM(n) AS nh FROM c GROUP BY 1),
bt AS (SELECT event_type, SUM(n) AS nt FROM c GROUP BY 1),
t AS (SELECT SUM(nt) AS ntot FROM bt)
SELECT hod, event_type, CAST(n AS BIGINT) AS n,
  ROUND(n / CAST(nh AS DOUBLE), 6) AS hod_share,
  ROUND((n / CAST(nh AS DOUBLE)) / (nt / CAST(ntot AS DOUBLE)), 6) AS lift
FROM c JOIN bh USING (hod) JOIN bt USING (event_type) CROSS JOIN t
ORDER BY hod, event_type"""

  /** Cohort-value mirror: same first-seen epoch-week cohorts, weekly
    * sums rounded BEFORE the age-ordered running cumulative. */
  val cohortValueSql: String =
    """WITH ev AS (SELECT user_id,
  CAST(FLOOR(epoch(ts) / 604800) AS BIGINT) AS wk, event_type, value
  FROM events),
f AS (SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY 1),
pv AS (SELECT cohort_wk, wk - cohort_wk AS age_wk,
  CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_buyers,
  ROUND(SUM(value), 6) AS wk_value
  FROM ev JOIN f ON f.user_id = ev.user_id
  WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT CAST(cohort_wk AS BIGINT) AS cohort_wk,
  CAST(age_wk AS BIGINT) AS age_wk, n_buyers, wk_value,
  ROUND(SUM(wk_value) OVER (PARTITION BY cohort_wk ORDER BY age_wk
    ROWS UNBOUNDED PRECEDING), 6) AS cum_value
FROM pv ORDER BY cohort_wk, age_wk"""

  /** Day-N retention mirror: same epoch-day first-activity frame,
    * same exploded checkpoint semi-join, zero rows kept. */
  def dayNRetentionSql(days: Seq[Int] = Seq(1, 3, 7, 14)): String =
    s"""WITH du AS (SELECT DISTINCT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT)
    AS day, user_id FROM events),
f AS (SELECT user_id, MIN(day) AS d0 FROM du GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM f),
tg AS (SELECT unnest([${days.mkString(", ")}]) AS n),
r AS (SELECT tg.n, CAST(COUNT(*) AS BIGINT) AS retained
  FROM f CROSS JOIN tg
  JOIN du ON du.user_id = f.user_id AND du.day = f.d0 + tg.n
  GROUP BY 1)
SELECT CAST(tg.n AS BIGINT) AS day_n, n_users,
  COALESCE(retained, 0) AS retained,
  ROUND(COALESCE(retained, 0) / CAST(n_users AS DOUBLE), 6) AS share
FROM tg LEFT JOIN r ON r.n = tg.n CROSS JOIN t ORDER BY day_n"""

  /** Dim-variance mirror: same 1e-7-unit quantization, HUGEINT-exact
    * n·Σq² − (Σq)² numerators (the decimal(38,0) twin), exact-integer
    * shares and desc-ordered cumulative. */
  val dimVarianceSql: String =
    s"""WITH $embCtes,
qv AS (SELECT pos, CAST(FLOOR(x * 1e7 + 0.5) AS BIGINT) AS q FROM ex),
per AS (SELECT pos, COUNT(*) AS n, SUM(q) AS sq,
  SUM(CAST(q AS HUGEINT) * q) AS sqq FROM qv GROUP BY 1),
nv AS (SELECT pos, n,
  CAST(n AS HUGEINT) * sqq - CAST(sq AS HUGEINT) * sq AS nvar FROM per),
tt AS (SELECT SUM(nvar) AS tot FROM nv),
cum AS (SELECT pos, n, nvar,
  SUM(nvar) OVER (ORDER BY nvar DESC, pos ASC ROWS UNBOUNDED PRECEDING)
    AS cum FROM nv)
SELECT CAST(pos AS BIGINT) AS pos,
  ROUND(CAST(nvar AS DOUBLE) /
    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e14), 9) AS variance,
  ROUND(CAST(nvar AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share,
  ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS cum_share
FROM cum CROSS JOIN tt ORDER BY pos"""

  /** Stickiness mirror: same epoch-day/epoch-week integers, same
    * observed-day mean, same exact BIGINT dau sums. */
  val stickinessSql: String =
    """WITH du AS (SELECT DISTINCT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT)
    AS day, user_id FROM events),
wd AS (SELECT CAST(FLOOR(day / 7) AS BIGINT) AS wk, day, user_id FROM du),
daily AS (SELECT wk, day, CAST(COUNT(*) AS BIGINT) AS dau
  FROM wd GROUP BY 1, 2),
weekly AS (SELECT wk, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM wd GROUP BY 1),
agg AS (SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_days,
  CAST(SUM(dau) AS BIGINT) AS dau_sum FROM daily GROUP BY 1)
SELECT wk, n_days, wau,
  ROUND(CAST(dau_sum AS DOUBLE) / CAST(n_days AS DOUBLE), 6) AS mean_dau,
  ROUND(CAST(dau_sum AS DOUBLE) / CAST(n_days * wau AS DOUBLE), 6)
    AS stickiness
FROM agg JOIN weekly USING (wk) ORDER BY wk"""

  /** Behavioral-entropy mirror: same per-user c·ln(c) fold, same
    * 1e-7-unit integerized H before the cross-user mean. */
  val behavioralEntropySql: String =
    """WITH tc AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
per AS (SELECT user_id, SUM(c) AS n, COUNT(*) AS n_types,
  SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS slc
  FROM tc GROUP BY 1),
h AS (SELECT n_types, CAST(FLOOR((ln(CAST(n AS DOUBLE)) -
    slc / CAST(n AS DOUBLE)) * 1e7 + 0.5) AS BIGINT) AS hu FROM per)
SELECT CAST(n_types AS BIGINT) AS n_types,
  CAST(COUNT(*) AS BIGINT) AS n_users,
  ROUND(CAST(SUM(hu) AS DOUBLE) /
    (CAST(COUNT(*) AS DOUBLE) * 1e7), 6) AS mean_entropy
FROM h GROUP BY 1 ORDER BY 1"""

  /** Purchase-interval mirror: same exact epoch-microsecond gaps,
    * same event_id tiebreak, same lifecycle bands. */
  val purchaseIntervalsSql: String =
    """WITH p AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events
  WHERE event_type = 'purchase'),
g AS (SELECT us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
    AS gap_us FROM p),
b AS (SELECT gap_us,
  CASE WHEN gap_us < 21600000000 THEN 'a_lt_6h'
       WHEN gap_us < 86400000000 THEN 'b_6h_24h'
       WHEN gap_us < 259200000000 THEN 'c_1d_3d'
       WHEN gap_us < 604800000000 THEN 'd_3d_7d'
       ELSE 'e_ge_7d' END AS bucket
  FROM g WHERE gap_us IS NOT NULL),
per AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(gap_us) AS BIGINT) AS gsum FROM b GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM per)
SELECT bucket, n AS n_gaps,
  ROUND(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share,
  ROUND(CAST(gsum AS DOUBLE) / (CAST(n AS DOUBLE) * 3.6e9), 4) AS mean_gap_h
FROM per CROSS JOIN t ORDER BY bucket"""

  /** Session-stats mirror: same microsecond gap splits, same running
    * session counter, same size bands. */
  def sessionStatsSql(gapMinutes: Int = 30): String = {
    val gapUs = gapMinutes * 60L * 1000000L
    s"""WITH p AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
m AS (SELECT user_id, us, event_id,
  CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > $gapUs
       THEN 1 ELSE 0 END AS new_s
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
sd AS (SELECT user_id, us,
  SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
    ROWS UNBOUNDED PRECEDING) AS sid FROM m),
sess AS (SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_ev,
  CAST(MAX(us) - MIN(us) AS BIGINT) AS dur_us FROM sd GROUP BY 1, 2),
per AS (SELECT CASE WHEN n_ev = 1 THEN 'a_1' WHEN n_ev <= 4 THEN 'b_2_4'
    WHEN n_ev <= 9 THEN 'c_5_9' ELSE 'd_ge_10' END AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n_sessions,
  CAST(SUM(n_ev) AS BIGINT) AS ev_sum,
  CAST(SUM(dur_us) AS BIGINT) AS dur_sum FROM sess GROUP BY 1),
t AS (SELECT CAST(SUM(n_sessions) AS BIGINT) AS tot FROM per)
SELECT bucket, n_sessions,
  ROUND(CAST(n_sessions AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share,
  ROUND(CAST(ev_sum AS DOUBLE) / CAST(n_sessions AS DOUBLE), 6)
    AS mean_events,
  ROUND(CAST(dur_sum AS DOUBLE) / (CAST(n_sessions AS DOUBLE) * 6e7), 4)
    AS mean_duration_min
FROM per CROSS JOIN t ORDER BY bucket"""
  }

  /** First-touch mirror: rn=1 over the same (us, event_id) order ≡
    * the min-struct argmin; same lift operand order. */
  val firstTouchSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
  FROM events),
f AS (SELECT user_id, event_type,
  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
  FROM e),
fc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_first
  FROM f WHERE rn = 1 GROUP BY 1),
vol AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_ev
  FROM e GROUP BY 1),
tt AS (SELECT CAST(SUM(n_first) AS BIGINT) AS n_users FROM fc),
tv AS (SELECT CAST(SUM(n_ev) AS BIGINT) AS n_events FROM vol)
SELECT event_type, n_first,
  ROUND(CAST(n_first AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
    AS first_share,
  ROUND(CAST(n_ev AS DOUBLE) / CAST(n_events AS DOUBLE), 6) AS event_share,
  ROUND((CAST(n_first AS DOUBLE) * CAST(n_events AS DOUBLE)) /
    (CAST(n_users AS DOUBLE) * CAST(n_ev AS DOUBLE)), 6) AS lift
FROM fc JOIN vol USING (event_type) CROSS JOIN tt CROSS JOIN tv
ORDER BY event_type"""

  /** Type-affinity mirror: same distinct (user,type) frame, same
    * x<y pair join, same lift/jaccard operand order. */
  val typeAffinitySql: String =
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM ut GROUP BY 1),
nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_u FROM ut),
pr AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
  CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM ut x JOIN ut y ON x.user_id = y.user_id
    AND x.event_type < y.event_type
  GROUP BY 1, 2)
SELECT type_a, type_b, n_ab,
  ROUND(CAST(n_ab AS DOUBLE) * CAST(n_u AS DOUBLE) /
    CAST(a.n * b.n AS DOUBLE), 6) AS lift,
  ROUND(CAST(n_ab AS DOUBLE) / CAST(a.n + b.n - n_ab AS DOUBLE), 6)
    AS jaccard
FROM pr JOIN tot a ON a.event_type = type_a
  JOIN tot b ON b.event_type = type_b CROSS JOIN nu
ORDER BY type_a, type_b"""

  /** Term-burstiness mirror: same per-doc term counts, same df/cf/df2
    * rollup, same (cf desc, term asc) top-k. */
  def termBurstinessSql(k: Int = 30): String =
    s"""WITH tc AS (SELECT doc_id, t AS term, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> '' GROUP BY 1, 2),
ag AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
  CAST(SUM(c) AS BIGINT) AS cf,
  CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS df2
  FROM tc GROUP BY 1)
SELECT term, df, cf, df2,
  ROUND(CAST(df2 AS DOUBLE) / CAST(df AS DOUBLE), 6) AS adaptation,
  ROUND(CAST(cf AS DOUBLE) / CAST(df AS DOUBLE), 6) AS rate
FROM ag ORDER BY cf DESC, term ASC LIMIT $k"""

  /** Char-bigram-entropy mirror: same substr gram stream as the
    * generator (truncated prefix for 1-char docs), same lang-level
    * c·ln(c) fold. */
  val charBigramEntropySql: String =
    """WITH g AS MATERIALIZED (SELECT d.doc_id, d.lang,
    substr(d.text, i, 2) AS sh
  FROM documents d,
    unnest(generate_series(1, greatest(len(text) - 1, 1))) AS t(i)),
lc AS (SELECT lang, sh, CAST(COUNT(*) AS BIGINT) AS c FROM g GROUP BY 1, 2),
ag AS (SELECT lang, SUM(c) AS n_grams, COUNT(*) AS distinct_grams,
  SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS slc FROM lc GROUP BY 1)
SELECT lang, CAST(n_grams AS BIGINT) AS n_grams,
  CAST(distinct_grams AS BIGINT) AS distinct_grams,
  ROUND(ln(CAST(n_grams AS DOUBLE)) - slc / CAST(n_grams AS DOUBLE), 6)
    AS entropy,
  ROUND(CASE WHEN distinct_grams > 1 THEN
    (ln(CAST(n_grams AS DOUBLE)) - slc / CAST(n_grams AS DOUBLE)) /
    ln(CAST(distinct_grams AS DOUBLE)) END, 6) AS entropy_norm
FROM ag ORDER BY lang"""

  /** PSI mirror: same half-unit corpus deciles, same empty-bucket-
    * contributes-0 convention, same (p−q)·ln(p/q) operand order. */
  val psiSql: String =
    """WITH vc AS (SELECT n_chars AS v, COUNT(*) AS c FROM documents
  GROUP BY 1),
dec AS (SELECT v, CAST(LEAST(FLOOR(
    CAST(2 * (cum - c) + c AS DOUBLE) / CAST(2 * n AS DOUBLE) * 10.0),
    9.0) AS BIGINT) AS decile
  FROM (SELECT v, c, SUM(c) OVER (ORDER BY v) AS cum,
    SUM(c) OVER () AS n FROM vc) t),
sd AS (SELECT d.source, dec.decile, COUNT(*) AS c
  FROM documents d JOIN dec ON dec.v = d.n_chars GROUP BY 1, 2),
bs AS (SELECT source, SUM(c) AS ns FROM sd GROUP BY 1),
bd AS (SELECT decile, SUM(c) AS cd FROM sd GROUP BY 1),
t AS (SELECT SUM(cd) AS n FROM bd)
SELECT source, CAST(MAX(ns) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS BIGINT) AS buckets_hit,
  ROUND(SUM((c / CAST(ns AS DOUBLE) - cd / CAST(n AS DOUBLE)) *
    ln((c / CAST(ns AS DOUBLE)) / (cd / CAST(n AS DOUBLE)))), 6) AS psi
FROM sd JOIN bs USING (source) JOIN bd USING (decile) CROSS JOIN t
GROUP BY source ORDER BY source"""

  /** Sample-bias mirror: same salted bucket as hashSample, same
    * expected-count formula. */
  def sampleBiasSql(pct: Int): String =
    s"""WITH f AS (SELECT source,
  CASE WHEN ${h60("'s:' || CAST(doc_id AS VARCHAR)")} % 100 < $pct
    THEN 1 ELSE 0 END AS s FROM documents),
ps AS (SELECT source, COUNT(*) AS ns, SUM(s) AS os FROM f GROUP BY 1),
t AS (SELECT SUM(ns) AS n, SUM(os) AS m FROM ps)
SELECT CAST(MAX(n) AS BIGINT) AS n_docs, CAST(MAX(m) AS BIGINT) AS n_sampled,
  CAST(COUNT(*) - 1 AS BIGINT) AS df,
  ROUND(SUM((CAST(os AS DOUBLE) - e) * (CAST(os AS DOUBLE) - e) / e), 6)
    AS chi2
FROM (SELECT ns, os, n, m,
  CAST(ns AS DOUBLE) * CAST(m AS DOUBLE) / CAST(n AS DOUBLE) AS e
  FROM ps CROSS JOIN t)"""

  /** Activity-tail mirror: the q_hill_tail chain over per-user event
    * counts (tie-safe top-(k+1) value multiset). */
  val activityTailSql: String =
    """WITH deg AS (SELECT COUNT(*) AS degree FROM events GROUP BY user_id),
top AS (SELECT CAST(degree AS BIGINT) AS deg FROM deg WHERE degree > 0
  ORDER BY deg DESC LIMIT 51),
m AS (SELECT MIN(deg) AS dmin, CAST(COUNT(*) AS BIGINT) AS m FROM top)
SELECT CAST(m.m - 1 AS BIGINT) AS k_used, CAST(m.dmin AS BIGINT) AS xmin,
 ROUND(CASE WHEN SUM(ln(deg / m.dmin)) > 0.0
   THEN (m.m - 1) / SUM(ln(deg / m.dmin)) END, 6) AS alpha
FROM top, m GROUP BY m.dmin, m.m"""

  /** Hubness mirror: the annLsh chain with every vector as query over
    * its own bucket, 0-in-degree rows kept via the norm universe. */
  def hubnessSql(k: Int): String =
    s"""WITH $embCtes,
w AS MATERIALIZED (
  SELECT p AS plane, d AS pos, ${h60("'lsh:' || p || ':' || d")} % 2001 - 1000 AS w
  FROM unnest(generate_series(0, 3)) AS tp(p), unnest(generate_series(0, 63)) AS td(d)),
proj AS MATERIALIZED (SELECT e.vec_id, w.plane, SUM(w.w * e.x) AS proj
  FROM ex e JOIN w ON w.pos = e.pos GROUP BY 1, 2),
bk AS MATERIALIZED (SELECT vec_id,
  SUM(CASE WHEN proj >= 0 THEN CAST(1 AS BIGINT) << CAST(plane AS INT) ELSE CAST(0 AS BIGINT) END) AS bucket
  FROM proj GROUP BY vec_id),
dots AS (SELECT q.vec_id AS qid, v.vec_id AS vid, SUM(q.x * v.x) AS dot
         FROM ex q JOIN bk qb ON qb.vec_id = q.vec_id
         JOIN ex v ON v.pos = q.pos
         JOIN bk vb ON vb.vec_id = v.vec_id AND vb.bucket = qb.bucket
         WHERE q.vec_id <> v.vec_id
         GROUP BY 1, 2),
cos AS (SELECT qid, vid, ROUND(dot / (qn.nrm * vn.nrm), 6) AS cosine
        FROM dots JOIN nrm qn ON qn.vec_id = qid JOIN nrm vn ON vn.vec_id = vid),
rk AS (SELECT vid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid ASC) AS rn FROM cos),
ind AS (SELECT vid, CAST(COUNT(*) AS BIGINT) AS in_deg FROM rk WHERE rn <= $k GROUP BY vid)
SELECT in_deg, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM (
  SELECT COALESCE(i.in_deg, 0) AS in_deg
  FROM nrm n LEFT JOIN ind i ON i.vid = n.vec_id)
GROUP BY in_deg ORDER BY in_deg"""

  /** Lorenz mirror: same half-unit value-domain decile rule, same
    * exact BIGINT share sums. */
  val lorenzSql: String =
    """WITH uc AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1),
vc AS (SELECT c, COUNT(*) AS nu FROM uc GROUP BY 1),
rk AS (SELECT c, nu, CAST(LEAST(FLOOR(
    CAST(2 * (cumu - nu) + nu AS DOUBLE) / CAST(2 * n AS DOUBLE) * 10.0),
    9.0) AS BIGINT) AS decile
  FROM (SELECT c, nu, SUM(nu) OVER (ORDER BY c) AS cumu,
    SUM(nu) OVER () AS n FROM vc) t),
dec AS (SELECT decile, CAST(SUM(nu) AS BIGINT) AS n_users,
  CAST(SUM(c * nu) AS BIGINT) AS events FROM rk GROUP BY 1)
SELECT decile, n_users, events,
  ROUND(CAST(events AS DOUBLE) / t.tot, 6) AS event_share,
  ROUND(CAST(SUM(events) OVER (ORDER BY decile) AS DOUBLE) / t.tot, 6)
    AS cum_share
FROM dec CROSS JOIN (SELECT CAST(SUM(events) AS DOUBLE) AS tot FROM dec) t
ORDER BY decile"""

  /** Audience-overlap mirror: same distinct (type, user) reduction,
    * same a<b pair join. */
  val audienceOverlapSql: String =
    """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS u FROM tu GROUP BY 1),
bt AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
  CAST(COUNT(*) AS BIGINT) AS n_both
  FROM tu a JOIN tu b ON a.user_id = b.user_id
    AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT type_a, type_b, sa.u AS users_a, sb.u AS users_b, n_both,
  ROUND(n_both / CAST(sa.u + sb.u - n_both AS DOUBLE), 6) AS jaccard
FROM bt JOIN sz sa ON sa.event_type = bt.type_a
  JOIN sz sb ON sb.event_type = bt.type_b
ORDER BY type_a, type_b"""

  /** Entity-density mirror: same word-boundary regexes, same per-1k
    * formula order. */
  val entityDensitySql: String =
    """WITH f AS (SELECT source,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS words,
  CAST(len(regexp_extract_all(text, '\b[A-Z][a-z]+\b')) AS BIGINT) AS caps,
  CAST(len(regexp_extract_all(text, '\b[A-Z]{2,}\b')) AS BIGINT) AS acros
  FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(words) AS BIGINT) AS words,
  CAST(SUM(caps) AS BIGINT) AS cap_words,
  CAST(SUM(acros) AS BIGINT) AS acronyms,
  ROUND(1000.0 * SUM(caps) / CAST(SUM(words) AS DOUBLE), 6) AS cap_per_1k,
  ROUND(1000.0 * SUM(acros) / CAST(SUM(words) AS DOUBLE), 6) AS acro_per_1k
FROM f GROUP BY source ORDER BY source"""

  /** Burrows-Delta mirror: same 1e-9-integerized frequencies, same
    * exact sufficient statistics for σ, same μ-cancelled |Δf|/σ sum. */
  def burrowsDeltaSql(k: Int): String =
    s"""WITH tc AS (SELECT source, term FROM (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''),
cnt AS (SELECT source, term, COUNT(*) AS c FROM tc GROUP BY 1, 2),
tot AS (SELECT source, SUM(c) AS n FROM cnt GROUP BY 1),
top AS (SELECT term FROM (SELECT term, SUM(c) AS ct FROM cnt GROUP BY 1)
  ORDER BY ct DESC, term ASC LIMIT $k),
grid AS (SELECT t.source, p.term,
  CAST(FLOOR(1e9 * COALESCE(c.c, 0) / CAST(t.n AS DOUBLE) + 0.5) AS BIGINT)
    AS fi
  FROM tot t CROSS JOIN top p
  LEFT JOIN cnt c ON c.source = t.source AND c.term = p.term),
sd AS (SELECT term,
  sqrt(CAST(SUM(CAST(fi AS HUGEINT) * fi) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
    - (CAST(SUM(fi) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) *
      (CAST(SUM(fi) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))) AS sigma
  FROM grid GROUP BY 1)
SELECT a.source AS source_a, b.source AS source_b,
  CAST(COUNT(*) AS BIGINT) AS k_used,
  ROUND(SUM(CASE WHEN sd.sigma > 0.0
    THEN CAST(ABS(a.fi - b.fi) AS DOUBLE) / sd.sigma ELSE 0.0 END) /
    CAST(COUNT(*) AS DOUBLE), 6) AS delta
FROM grid a JOIN grid b ON a.term = b.term AND a.source < b.source
JOIN sd ON sd.term = a.term
GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Charset-profile mirror: same four counted classes, punctuation
    * derived by the same subtraction. */
  val charsetProfileSql: String =
    """WITH f AS (SELECT source, CAST(len(text) AS BIGINT) AS chars,
  CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS letters,
  CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digits,
  CAST(len(regexp_extract_all(text, ' ')) AS BIGINT) AS spaces,
  CAST(len(regexp_extract_all(text, '[^\x00-\x7F]')) AS BIGINT) AS nonascii
  FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(chars) AS BIGINT) AS chars,
  ROUND(SUM(letters) / CAST(SUM(chars) AS DOUBLE), 6) AS letter_frac,
  ROUND(SUM(digits) / CAST(SUM(chars) AS DOUBLE), 6) AS digit_frac,
  ROUND(SUM(spaces) / CAST(SUM(chars) AS DOUBLE), 6) AS space_frac,
  ROUND((SUM(chars) - SUM(letters) - SUM(digits) - SUM(spaces) -
    SUM(nonascii)) / CAST(SUM(chars) AS DOUBLE), 6) AS punct_frac,
  ROUND(SUM(nonascii) / CAST(SUM(chars) AS DOUBLE), 6) AS nonascii_frac
FROM f GROUP BY source ORDER BY source"""

  /** Hapax mirror: same per-source term counts, same c=1 rollup. */
  val hapaxSql: String =
    """WITH cnt AS (SELECT source, term, COUNT(*) AS c FROM (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> '' GROUP BY 1, 2)
SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
  CAST(SUM(c) AS BIGINT) AS tokens,
  ROUND(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6)
    AS hapax_rate
FROM cnt GROUP BY source ORDER BY source"""

  /** Skip-gram mirror: positions from the RAW split (empties hold
    * their slot), same lead adjacency, same post-pair filter. */
  def skipgramSql(window: Int, topK: Int): String = {
    val leads = (1 to window)
      .map(j => s"lead(term, $j) OVER (PARTITION BY doc_id ORDER BY i) AS c$j")
      .mkString(",\n  ")
    val union = (1 to window)
      .map(j => s"SELECT center, c$j AS context FROM ld")
      .mkString("\n  UNION ALL ")
    s"""WITH toks AS (SELECT doc_id, i, parts[i] AS term FROM (
  SELECT doc_id, string_split(text, ' ') AS parts FROM documents),
  unnest(generate_series(1, len(parts))) AS t(i)),
ld AS (SELECT term AS center,
  $leads
  FROM toks),
pr AS ($union)
SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n
FROM pr WHERE center <> '' AND context IS NOT NULL AND context <> ''
GROUP BY 1, 2 ORDER BY n DESC, center ASC, context ASC LIMIT $topK"""
  }

  /** Funnel-latency mirror: first signup / first subsequent purchase
    * per user, integer-second latencies counted per value, lower
    * percentiles by the same k·cum ≥ q·n integer ceil rule. */
  def funnelLatencySql(fromType: String, toType: String): String =
    s"""WITH st AS (SELECT user_id,
  MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS t0 FROM events
  WHERE event_type = '$fromType' GROUP BY 1),
lat AS (SELECT st.user_id,
  MIN(CAST(floor(epoch(e.ts)) AS BIGINT) - t0) AS lat
  FROM st JOIN events e ON e.user_id = st.user_id
  WHERE e.event_type = '$toType'
    AND CAST(floor(epoch(e.ts)) AS BIGINT) >= t0 GROUP BY 1),
cnt AS (SELECT CAST(lat AS BIGINT) AS lat, COUNT(*) AS c
  FROM lat GROUP BY 1),
r AS (SELECT lat, SUM(c) OVER (ORDER BY lat) AS cum,
  SUM(c) OVER () AS n FROM cnt),
d AS (SELECT ANY_VALUE(n) AS n_converted,
  MIN(CASE WHEN cum * 2 >= n * 1 THEN lat END) AS p50_s,
  MIN(CASE WHEN cum * 10 >= n * 9 THEN lat END) AS p90_s,
  MAX(lat) AS max_s FROM r),
u AS (SELECT COUNT(*) AS n_users FROM st)
SELECT CAST(u.n_users AS BIGINT) AS n_users,
  CAST(d.n_converted AS BIGINT) AS n_converted,
  ROUND(CAST(d.n_converted AS DOUBLE) / CAST(u.n_users AS DOUBLE), 6)
    AS conv_rate,
  d.p50_s, d.p90_s, d.max_s
FROM u CROSS JOIN d"""

  /** Cohen's d / Hedges' g mirror: same sufficient statistics and
    * pair-join closed form as the engine. */
  val cohensDSql: String =
    """WITH s AS (SELECT source, COUNT(*) AS n,
  SUM(CAST(n_chars AS BIGINT)) AS sx,
  SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT)) AS sxx
  FROM documents GROUP BY 1),
sd AS (SELECT source, n, CAST(sx AS DOUBLE) / n AS m,
  CASE WHEN n >= 2 THEN (CAST(sxx AS DOUBLE) -
    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
    CAST(n - 1 AS DOUBLE) END AS v FROM s),
p AS (SELECT a.source AS src_a, b.source AS src_b, a.n AS n_a,
  b.n AS n_b, a.m AS m_a, b.m AS m_b,
  (CAST(a.n - 1 AS DOUBLE) * a.v + CAST(b.n - 1 AS DOUBLE) * b.v) /
    (CAST(a.n + b.n AS DOUBLE) - 2.0) AS pooled
  FROM sd a JOIN sd b ON a.source < b.source)
SELECT src_a, src_b, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  ROUND(CASE WHEN n_a + n_b > 2 AND pooled > 0.0
    THEN (m_a - m_b) / sqrt(pooled) END, 6) AS d,
  ROUND(CASE WHEN n_a + n_b > 2 AND pooled > 0.0
    THEN (m_a - m_b) / sqrt(pooled) *
      (1.0 - 3.0 / (4.0 * CAST(n_a + n_b AS DOUBLE) - 9.0)) END, 6) AS g
FROM p ORDER BY src_a, src_b"""

  /** Cliff's delta mirror: the mannWhitneySql 2U accumulation with the
    * δ = 2U/(n₁n₂) − 1 closed form and Romano magnitude bands off the
    * rounded δ. */
  val cliffsDeltaSql: String =
    """WITH cnt AS (SELECT CAST(n_chars AS BIGINT) AS v, source,
  COUNT(*) AS c FROM documents GROUP BY 1, 2),
al AS (SELECT v, SUM(c) AS c_all FROM cnt GROUP BY 1),
alc AS (SELECT v, c_all, SUM(c_all) OVER (ORDER BY v) AS cum_all FROM al),
cs AS (SELECT v, source, c,
  SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum_s FROM cnt),
ts AS (SELECT source, SUM(c) AS n_s FROM cnt GROUP BY 1),
gr AS (SELECT SUM(c_all) AS n_all FROM al),
u AS (SELECT source,
  SUM(c * (2 * ((cum_all - c_all) - (cum_s - c)) + (c_all - c))) AS u2
  FROM cs JOIN alc USING (v) GROUP BY 1),
dl AS (SELECT u.source, CAST(ts.n_s AS BIGINT) AS n_s,
  ROUND(CAST(u2 AS DOUBLE) /
    (CAST(ts.n_s AS DOUBLE) * CAST(gr.n_all - ts.n_s AS DOUBLE)) - 1.0, 6)
    AS delta
  FROM u JOIN ts USING (source) CROSS JOIN gr)
SELECT source, n_s, delta,
  CASE WHEN abs(delta) < 0.147 THEN 'negligible'
    WHEN abs(delta) < 0.33 THEN 'small'
    WHEN abs(delta) < 0.474 THEN 'medium'
    ELSE 'large' END AS magnitude
FROM dl ORDER BY source"""

  /** Brown–Forsythe mirror: half-unit-integer per-source medians off
    * the cumulative range, then the one-way ANOVA closed form on
    * z = |2x − m2|. */
  val brownForsytheSql: String =
    """WITH cnt AS (SELECT CAST(n_chars AS BIGINT) AS v, source,
  COUNT(*) AS c FROM documents GROUP BY 1, 2),
cc AS (SELECT v, source, c,
  SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum FROM cnt),
ts AS (SELECT source, SUM(c) AS n_s FROM cnt GROUP BY 1),
md AS (SELECT cc.source,
  SUM(CASE WHEN cum - c < (n_s + 1) // 2 AND (n_s + 1) // 2 <= cum
    THEN v ELSE 0 END) +
  SUM(CASE WHEN cum - c < (n_s + 2) // 2 AND (n_s + 2) // 2 <= cum
    THEN v ELSE 0 END) AS m2
  FROM cc JOIN ts USING (source) GROUP BY 1),
z AS (SELECT d.source, abs(CAST(d.n_chars AS BIGINT) * 2 - md.m2) AS z2
  FROM documents d JOIN md ON md.source = d.source),
g AS (SELECT source, COUNT(*) AS n_g, SUM(z2) AS sz,
  SUM(z2 * z2) AS szz FROM z GROUP BY 1),
a AS (SELECT COUNT(*) AS k, SUM(n_g) AS n, SUM(sz) AS sz,
  SUM(szz) AS szz,
  SUM(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / CAST(n_g AS DOUBLE))
    AS sb FROM g)
SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
  ROUND(CASE WHEN k > 1 AND CAST(szz AS DOUBLE) - sb > 0.0 THEN
    ((sb - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / CAST(n AS DOUBLE)) /
      CAST(k - 1 AS DOUBLE)) /
    ((CAST(szz AS DOUBLE) - sb) / CAST(n - k AS DOUBLE)) END, 6) AS w
FROM a"""

  /** Jarque–Bera mirror: HUGEINT power sums, the same raw→central
    * expansion term-for-term. */
  val jarqueBeraSql: String =
    """WITH s AS (SELECT source, COUNT(*) AS n,
  SUM(CAST(n_chars AS BIGINT)) AS s1,
  SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT)) AS s2,
  SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT) *
    CAST(n_chars AS BIGINT)) AS s3,
  SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT) *
    CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT)) AS s4
  FROM documents GROUP BY 1),
m AS (SELECT source, n, CAST(s1 AS DOUBLE) / n AS mu,
  CAST(s2 AS DOUBLE) / n AS r2, CAST(s3 AS DOUBLE) / n AS r3,
  CAST(s4 AS DOUBLE) / n AS r4 FROM s),
c AS (SELECT source, n, mu, r2 - mu * mu AS m2,
  r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
  r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2 -
    3.0 * mu * mu * mu * mu AS m4 FROM m)
SELECT source, CAST(n AS BIGINT) AS n,
  ROUND(CASE WHEN m2 > 0.0 THEN m3 / (m2 * sqrt(m2)) END, 6) AS skewness,
  ROUND(CASE WHEN m2 > 0.0 THEN m4 / (m2 * m2) - 3.0 END, 6) AS kurtosis,
  ROUND(CASE WHEN m2 > 0.0 THEN CAST(n AS DOUBLE) / 6.0 *
    ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2))) +
     (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0) / 4.0) END, 6) AS jb
FROM c ORDER BY source"""

  /** Shared zero-filled daily-series CTE text (epoch days) — the
    * grid contract of ewmaDailySql/dailyAcfSql. */
  private val dailySeriesCte: String =
    """dc AS (SELECT CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day,
    CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1),
rng AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM dc),
grid AS (SELECT unnest(generate_series(d0, d1)) AS day FROM rng),
ser AS (SELECT g.day, COALESCE(dc.c, 0) AS c
  FROM grid g LEFT JOIN dc ON dc.day = g.day)"""

  /** Banding-curve mirror: one signature build, per-tiling band+pair
    * CTEs, one exact-Jaccard verify over the union (distinct-shingle
    * match counts ≡ the engine's sorted-set intersect). */
  def bandingCurveSql(k: Int, bandings: Seq[(Int, Int)],
                      tauNum: Int, tauDen: Int): String = {
    val mins = (0 until k).map(j => s"MIN(ha + $j * hb) AS m$j").mkString(", ")
    val perBand = bandings.map { case (b, r) =>
      val bandSel = (0 until b).map { bi =>
        val ms = (0 until r).map(x => s"m${bi * r + x}").mkString(", ")
        s"SELECT doc_id, CAST($bi AS BIGINT) AS band, " +
          s"md5(concat_ws('_', $ms)) AS bh FROM sig"
      }.mkString("\n  UNION ALL ")
      s"""bands_$b AS MATERIALIZED (
  $bandSel),
pairs_$b AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands_$b x
  JOIN bands_$b y ON x.band = y.band AND x.bh = y.bh
    AND x.doc_id < y.doc_id)"""
    }.mkString(",\n")
    val unionSel = bandings.map { case (b, _) => s"SELECT a, b FROM pairs_$b" }
      .mkString(" UNION ")
    val arms = bandings.map { case (b, r) =>
      s"""SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs_$b) AS candidates,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs_$b p
     JOIN truth t ON t.a = p.a AND t.b = p.b) AS verified,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth"""
    }.mkString("\n  UNION ALL ")
    s"""WITH $shinglesCte,
hs AS MATERIALIZED (SELECT doc_id, ${h60("'a:' || sh")} AS ha,
  ${h60("'b:' || sh")} % (CAST(1 AS BIGINT) << 55) AS hb FROM shingles),
sig AS MATERIALIZED (SELECT doc_id, $mins FROM hs GROUP BY doc_id),
$perBand,
un AS MATERIALIZED (SELECT DISTINCT a, b FROM ($unionSel)),
had AS MATERIALIZED (SELECT DISTINCT doc_id, ha FROM hs),
sz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz FROM had GROUP BY 1),
cm AS (SELECT u.a, u.b, COUNT(*) AS common FROM un u
  JOIN had x ON x.doc_id = u.a
  JOIN had y ON y.doc_id = u.b AND y.ha = x.ha
  GROUP BY 1, 2),
truth AS MATERIALIZED (SELECT u.a, u.b FROM un u
  JOIN sz za ON za.doc_id = u.a JOIN sz zb ON zb.doc_id = u.b
  LEFT JOIN cm ON cm.a = u.a AND cm.b = u.b
  WHERE COALESCE(cm.common, 0) * $tauDen >=
    (za.sz + zb.sz - COALESCE(cm.common, 0)) * $tauNum),
ar AS (
  $arms)
SELECT bands, rows_per_band, candidates, verified, n_truth,
  ROUND(CASE WHEN candidates > 0
    THEN CAST(verified AS DOUBLE) / candidates END, 6) AS "precision",
  ROUND(CASE WHEN n_truth > 0
    THEN CAST(verified AS DOUBLE) / n_truth END, 6) AS recall
FROM ar ORDER BY bands"""
  }

  /** Winsorized-mean mirror: same order-statistic clamp values off
    * the cumulative range, same closed form. */
  def winsorizedMeanSql(alpha: Double): String =
    s"""WITH cnt AS (SELECT source, CAST(n_chars AS BIGINT) AS v,
  COUNT(*) AS c FROM documents GROUP BY 1, 2),
cc AS (SELECT source, v, c,
  SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum,
  SUM(c) OVER (PARTITION BY source) AS n_s FROM cnt),
cc2 AS (SELECT *, CAST(floor(CAST(n_s AS DOUBLE) * $alpha) AS BIGINT)
  AS lo FROM cc),
g AS (SELECT source, ANY_VALUE(n_s) AS n_docs, MAX(lo) AS k,
  SUM(v * GREATEST(LEAST(cum, n_s - lo) - GREATEST(cum - c, lo), 0))
    AS mass,
  SUM(CASE WHEN cum - c < lo + 1 AND lo + 1 <= cum THEN v ELSE 0 END)
    AS v_lo,
  SUM(CASE WHEN cum - c < n_s - lo AND n_s - lo <= cum THEN v ELSE 0 END)
    AS v_hi
  FROM cc2 GROUP BY 1)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(v_lo AS BIGINT) AS v_lo, CAST(v_hi AS BIGINT) AS v_hi,
  ROUND((CAST(mass AS DOUBLE) +
    CAST(k AS DOUBLE) * CAST(v_lo + v_hi AS DOUBLE)) /
    CAST(n_docs AS DOUBLE), 6) AS winsor_mean
FROM g ORDER BY source"""

  /** Zipf-fit mirror: same top-k cut (count desc, term tiebreak),
    * same ln-ln OLS closed form. */
  def zipfFitSql(k: Int): String =
    s"""WITH tk AS (SELECT unnest(string_split(text, ' ')) AS t
  FROM documents),
cnt AS (SELECT t, COUNT(*) AS c FROM tk WHERE t <> '' GROUP BY 1
  ORDER BY c DESC, t LIMIT $k),
rk AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS r FROM cnt),
pt AS (SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
  FROM rk),
a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
  SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy FROM pt)
SELECT n AS k_used,
  ROUND(CASE WHEN sxx - sx * sx / n > 0.0
    THEN (sxy - sx * sy / n) / (sxx - sx * sx / n) END, 6) AS slope,
  ROUND(CASE WHEN sxx - sx * sx / n > 0.0
    THEN (sy - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx) / n END, 6)
    AS intercept,
  ROUND(CASE WHEN sxx - sx * sx / n > 0.0 AND syy - sy * sy / n > 0.0
    THEN (sxy - sx * sy / n) * (sxy - sx * sy / n) /
      ((sxx - sx * sx / n) * (syy - sy * sy / n)) END, 6) AS r2
FROM a"""

  /** Skyline mirror: the shared quality CTE, per-quality min length,
    * one running min over the quality domain descending. */
  val skylineSql: String =
    """WITH qq AS (SELECT doc_id,
  CAST(len(text) AS BIGINT) AS chars,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS words,
  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS punct,
  CAST(len(regexp_extract_all(text, '\b(the|a|is)\b')) AS BIGINT) AS stop,
  CAST(n_chars AS BIGINT) AS len
  FROM documents),
sc AS (SELECT doc_id, len,
  ROUND(0.4 * least(words / 100.0, 1.0) + 0.3 * (1.0 - punct / chars)
      + 0.3 * least(5.0 * stop / words, 1.0), 6) AS quality
  FROM qq),
q AS (SELECT quality, MIN(len) AS min_len FROM sc GROUP BY 1),
dom AS (SELECT quality, min_len, MIN(min_len) OVER (
  ORDER BY quality DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
  AS best_above FROM q)
SELECT sc.doc_id, sc.quality, sc.len
FROM sc JOIN dom ON dom.quality = sc.quality
WHERE sc.len = dom.min_len
  AND (dom.best_above IS NULL OR sc.len < dom.best_above)
ORDER BY sc.quality DESC, sc.doc_id"""

  /** Anisotropy mirror: HUGEINT per-dimension sums, same closed form. */
  def anisotropySql(scale: Int): String =
    s"""WITH iv AS (SELECT vec_id, i - 1 AS pos,
  CAST(floor(embedding[i]::DOUBLE * $scale) AS BIGINT) AS xi
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)),
pd AS (SELECT pos, SUM(xi) AS s_p, SUM(xi * xi) AS t_p FROM iv GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS dims,
  SUM(s_p * s_p) AS ss, SUM(t_p) AS t FROM pd)
SELECT nn.n, ag.dims,
  ROUND(CAST(ss AS DOUBLE) /
    (CAST(n AS DOUBLE) * CAST(t AS DOUBLE)), 6) AS anisotropy,
  ROUND(sqrt(CAST(ss AS DOUBLE)) /
    (CAST(n AS DOUBLE) * CAST($scale AS DOUBLE)), 6) AS mean_vec_norm,
  ROUND(sqrt(CAST(t AS DOUBLE) / CAST(n AS DOUBLE)) /
    CAST($scale AS DOUBLE), 6) AS mean_norm
FROM ag CROSS JOIN nn"""

  /** SimHash-curve mirror: dedupSimhashSql's signature/chunk CTEs, one
    * overlap verify (LEFT JOIN + COALESCE — inter drops zero-common
    * pairs that the engine keeps as common = 0), conditional-sum arms. */
  def simhashCurveSql(tauNum: Int, tauDen: Int): String = {
    val sums = (0 until 32)
      .map(i => s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS s$i")
      .mkString(", ")
    val fp = (0 until 32)
      .map(i => s"(CASE WHEN s$i >= 0 THEN CAST(1 AS BIGINT) << $i ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    val aggs = (0 to 3).map { t =>
      s"""CAST(SUM(CASE WHEN hamming <= $t THEN 1 ELSE 0 END) AS BIGINT) AS c_$t,
  CAST(SUM(CASE WHEN hamming <= $t AND dup THEN 1 ELSE 0 END) AS BIGINT) AS v_$t"""
    }.mkString(",\n  ")
    val arms = (0 to 3).map { t =>
      s"SELECT CAST($t AS BIGINT) AS max_hamming, c_$t AS candidates, " +
        s"v_$t AS verified, v_3 AS v_base FROM ag"
    }.mkString("\n  UNION ALL ")
    s"""WITH $shinglesCte,
hsim AS MATERIALIZED (SELECT doc_id, ${h60("'a:' || sh")} AS h FROM shingles),
ssum AS MATERIALIZED (SELECT doc_id, $sums FROM hsim GROUP BY doc_id),
simh AS MATERIALIZED (SELECT doc_id, $fp AS simhash FROM ssum),
chunks AS MATERIALIZED (
  SELECT doc_id, CAST(c AS BIGINT) AS chunk, (simhash >> (c * 8)) & 255 AS cv, simhash
  FROM simh, unnest(generate_series(0, 3)) AS t(c)),
cand AS MATERIALIZED (SELECT a, b, hamming FROM (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
    CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
  FROM chunks x JOIN chunks y ON x.chunk = y.chunk AND x.cv = y.cv
    AND x.doc_id < y.doc_id) WHERE hamming <= 3),
${overlapCtes("cand")},
j AS (SELECT c.hamming,
  (COALESCE(i.common, 0) * $tauDen >=
    (za.sz + zb.sz - COALESCE(i.common, 0)) * $tauNum) AS dup
  FROM cand c JOIN sizes za ON za.doc_id = c.a
  JOIN sizes zb ON zb.doc_id = c.b
  LEFT JOIN inter i ON i.a = c.a AND i.b = c.b),
ag AS (SELECT $aggs FROM j),
ar AS (
  $arms)
SELECT max_hamming, candidates, verified,
  ROUND(CASE WHEN candidates > 0
    THEN CAST(verified AS DOUBLE) / candidates END, 6) AS "precision",
  ROUND(CASE WHEN v_base > 0
    THEN CAST(verified AS DOUBLE) / v_base END, 6) AS recall
FROM ar ORDER BY max_hamming"""
  }

  /** Jaccard-sweep mirror: one overlap pass over the minhash pairs,
    * the nine exact integer-compare arms off one aggregate. */
  val jaccardSweepSql: String = {
    val ges = (1 to 9).map(b =>
      s"CAST(SUM(CASE WHEN common * 10 >= un * $b THEN 1 ELSE 0 END) AS BIGINT) AS ge_$b")
      .mkString(",\n  ")
    val arms = (1 to 9).map(b =>
      s"SELECT CAST($b AS BIGINT) AS tau_tenths, candidates, ge_$b AS pairs_ge FROM ag")
      .mkString("\n  UNION ALL ")
    s"""WITH ${minhashCtes(16, 4)},
${overlapCtes("pairs")},
ov AS (SELECT COALESCE(i.common, 0) AS common,
  za.sz + zb.sz - COALESCE(i.common, 0) AS un
  FROM pairs p JOIN sizes za ON za.doc_id = p.a
  JOIN sizes zb ON zb.doc_id = p.b
  LEFT JOIN inter i ON i.a = p.a AND i.b = p.b),
ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS candidates,
  $ges FROM ov),
ar AS (
  $arms)
SELECT tau_tenths, candidates, pairs_ge,
  ROUND(CASE WHEN candidates > 0
    THEN CAST(pairs_ge AS DOUBLE) / candidates END, 6) AS share
FROM ar ORDER BY tau_tenths"""
  }

  /** DP-histogram mirror: same salted 60-bit hash, same Laplace
    * quantile transform. */
  def dpHistogramSql(epsilon: Double, salt: String = "dp:"): String =
    s"""WITH cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1),
n AS (SELECT source, n_docs,
  (CAST(${h60(s"'$salt' || source")} AS DOUBLE) + 0.5) /
    CAST(${1L << 60} AS DOUBLE) - 0.5 AS d FROM cnt)
SELECT source, n_docs,
  ROUND(CAST(n_docs AS DOUBLE) +
    (CASE WHEN d >= 0.0 THEN -ln(1.0 - 2.0 * d)
      ELSE ln(1.0 + 2.0 * d) END) / CAST($epsilon AS DOUBLE), 6)
    AS noised,
  CAST($epsilon AS DOUBLE) AS epsilon
FROM n ORDER BY source"""

  /** DP-mean mirror: same clipped sums, the same two salted
    * inverse-CDF Laplace draws, same scales and guard. */
  def dpMeanSql(valueCol: String = "n_chars", clip: Double = 2000.0,
                epsilon: Double = 1.0, salt: String = "dpm:"): String =
    s"""WITH g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
  SUM(LEAST(GREATEST(CAST($valueCol AS DOUBLE), CAST(0 AS DOUBLE)),
    CAST($clip AS DOUBLE))) AS csum
  FROM documents GROUP BY 1),
nz AS (SELECT source, n, csum,
  (CAST(${h60(s"'${salt}n:' || source")} AS DOUBLE) + 0.5) /
    CAST(${1L << 60} AS DOUBLE) - 0.5 AS dn,
  (CAST(${h60(s"'${salt}s:' || source")} AS DOUBLE) + 0.5) /
    CAST(${1L << 60} AS DOUBLE) - 0.5 AS ds
  FROM g),
nv AS (SELECT source, n,
  CAST(n AS DOUBLE) + (CASE WHEN dn >= 0.0 THEN -ln(1.0 - 2.0 * dn)
    ELSE ln(1.0 + 2.0 * dn) END) * ${2.0 / epsilon} AS dpn,
  csum + (CASE WHEN ds >= 0.0 THEN -ln(1.0 - 2.0 * ds)
    ELSE ln(1.0 + 2.0 * ds) END) * ${2.0 * clip / epsilon} AS dps
  FROM nz)
SELECT source, n AS n_docs, ROUND(dpn, 6) AS dp_count,
  ROUND(dps, 6) AS dp_sum,
  ROUND(dps / GREATEST(dpn, CAST(1 AS DOUBLE)), 6) AS dp_mean,
  CAST($epsilon AS DOUBLE) AS epsilon
FROM nv ORDER BY source"""

  /** k-anonymity mirror. */
  def kAnonymitySql(bucket: Long, ks: Seq[Int]): String = {
    val arms = ks.map { k =>
      s"""SELECT CAST($k AS BIGINT) AS k,
  (SELECT CAST(SUM(CASE WHEN csize < $k THEN csize ELSE 0 END) AS BIGINT)
     FROM cls) AS exposed"""
    }.mkString("\n  UNION ALL ")
    s"""WITH cls AS (SELECT lang, source,
  CAST(n_chars AS BIGINT) // $bucket AS len_b, COUNT(*) AS csize
  FROM documents GROUP BY 1, 2, 3),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
  CAST(SUM(csize) AS BIGINT) AS n_docs,
  CAST(MIN(csize) AS BIGINT) AS min_class,
  CAST(MAX(csize) AS BIGINT) AS max_class FROM cls),
ar AS (
  $arms)
SELECT k, n_classes, n_docs, min_class, max_class, exposed,
  ROUND(CAST(exposed AS DOUBLE) / n_docs, 6) AS exposed_rate
FROM ar CROSS JOIN t ORDER BY k"""
  }

  /** Holt mirror: the SAME impulse-response weights (one source of
    * truth — Trend.holtWeights) as explicit literals, identical
    * left-associated dot-product order. */
  def holtDailySql(window: Int): String = {
    val (wl, wb) = graft.streaming.Trend.holtWeights(window)
    // CAST each weight: a bare decimal literal is DECIMAL in DuckDB,
    // which would drag the whole kernel into DECIMAL(38,6) arithmetic
    def kernel(ws: Array[Double]): String = ws.zipWithIndex.map {
      case (v, k) =>
        s"COALESCE(LAG(c, $k) OVER (ORDER BY day), 0) * CAST($v AS DOUBLE)"
    }.mkString(" + ")
    s"""WITH $dailySeriesCte,
lg AS (SELECT day, c, ${kernel(wl)} AS l, ${kernel(wb)} AS b FROM ser)
SELECT day, c, ROUND(l, 6) AS level, ROUND(b, 6) AS trend,
  ROUND(l + b, 6) AS forecast
FROM lg ORDER BY day"""
  }

  /** Bounce-rate mirror: the sessionStatsSql split, entry type via
    * rn = 1 over the same (us, event_id) order. */
  def bounceRateSql(gapMinutes: Int = 30): String = {
    val gapUs = gapMinutes * 60L * 1000000L
    s"""WITH p AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
  FROM events),
m AS (SELECT user_id, us, event_id, event_type,
  CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > $gapUs
       THEN 1 ELSE 0 END AS new_s
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
sd AS (SELECT user_id, us, event_id, event_type,
  SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
    ROWS UNBOUNDED PRECEDING) AS sid FROM m),
sess AS (SELECT user_id, sid, COUNT(*) AS n_ev FROM sd GROUP BY 1, 2),
fst AS (SELECT user_id, sid, event_type FROM (
  SELECT user_id, sid, event_type, ROW_NUMBER() OVER (
    PARTITION BY user_id, sid ORDER BY us, event_id) AS rn FROM sd)
  WHERE rn = 1)
SELECT f.event_type AS entry_type, CAST(COUNT(*) AS BIGINT) AS n_sessions,
  CAST(SUM(CASE WHEN s.n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
  ROUND(CAST(SUM(CASE WHEN s.n_ev = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
    CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate
FROM fst f JOIN sess s ON s.user_id = f.user_id AND s.sid = f.sid
GROUP BY 1 ORDER BY 1"""
  }

  /** New-vs-returning mirror. */
  val newReturningSql: String =
    """WITH d AS (SELECT CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT)
    AS day, user_id FROM events),
f AS (SELECT user_id, MIN(day) AS d0 FROM d GROUP BY 1),
a AS (SELECT DISTINCT day, user_id FROM d)
SELECT a.day, CAST(COUNT(*) AS BIGINT) AS active_users,
  CAST(SUM(CASE WHEN f.d0 = a.day THEN 1 ELSE 0 END) AS BIGINT)
    AS new_users,
  CAST(COUNT(*) - SUM(CASE WHEN f.d0 = a.day THEN 1 ELSE 0 END) AS BIGINT)
    AS returning
FROM a JOIN f USING (user_id) GROUP BY 1 ORDER BY 1"""

  /** Mann–Kendall mirror: exact-BIGINT S and tie sums off the day-pair
    * join, the same ±1-corrected z and τ-b closed form. */
  val mannKendallSql: String =
    s"""WITH $dailySeriesCte,
pr AS (SELECT CAST(SUM(CASE WHEN b.c > a.c THEN 1
    WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM ser a JOIN ser b ON a.day < b.day),
tg AS (SELECT c, COUNT(*) AS t FROM ser GROUP BY 1),
ti AS (SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_var,
  CAST(SUM(t * (t - 1)) AS BIGINT) AS tie2 FROM tg),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ser)
SELECT nn.n AS n_days, pr.s,
  ROUND(CASE WHEN (CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
      - CAST(tie_var AS DOUBLE)) / 18.0 > 0.0 THEN
    CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) /
        sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
          - CAST(tie_var AS DOUBLE)) / 18.0)
      WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) /
        sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
          - CAST(tie_var AS DOUBLE)) / 18.0)
      ELSE 0.0 END END, 6) AS z,
  ROUND(CASE WHEN CAST(n AS DOUBLE) * (n - 1) / 2.0
      - CAST(tie2 AS DOUBLE) / 2.0 > 0.0 THEN
    CAST(s AS DOUBLE) / sqrt((CAST(n AS DOUBLE) * (n - 1) / 2.0) *
      (CAST(n AS DOUBLE) * (n - 1) / 2.0 - CAST(tie2 AS DOUBLE) / 2.0))
    END, 6) AS tau_b
FROM pr CROSS JOIN ti CROSS JOIN nn"""

  /** Theil–Sen mirror: IEEE pairwise slopes, tie-averaged median via
    * the same two order-statistic picks. */
  val theilSenSql: String =
    s"""WITH $dailySeriesCte,
sl AS (SELECT CAST(b.c - a.c AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
    AS slope
  FROM ser a JOIN ser b ON a.day < b.day),
rk AS (SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn,
  COUNT(*) OVER () AS p FROM sl)
SELECT CAST(MAX(p) AS BIGINT) AS n_pairs, ROUND(AVG(slope), 6) AS slope
FROM rk WHERE rn = (p + 1) // 2 OR rn = (p + 2) // 2"""

  /** Runs-test mirror: half-unit-integer median pick, median-equal
    * days dropped, runs counted off the lag sign change. */
  val runsTestSql: String =
    s"""WITH $dailySeriesCte,
rk AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c, day) AS rn,
  COUNT(*) OVER () AS n FROM ser),
m AS (SELECT CAST(SUM(CASE WHEN n % 2 = 1 THEN c * 2 ELSE c END)
    AS BIGINT) AS m2
  FROM rk WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2),
sg AS (SELECT day, (c * 2 > m2) AS up FROM ser CROSS JOIN m
  WHERE c * 2 <> m2),
br AS (SELECT up, CASE WHEN LAG(up) OVER (ORDER BY day) IS NULL
    OR LAG(up) OVER (ORDER BY day) <> up THEN 1 ELSE 0 END AS brk
  FROM sg),
ag AS (SELECT CAST(SUM(brk) AS BIGINT) AS runs,
  CAST(SUM(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS n1,
  CAST(SUM(CASE WHEN up THEN 0 ELSE 1 END) AS BIGINT) AS n2 FROM br)
SELECT n1, n2, runs,
  ROUND(CASE WHEN 2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2)) /
      (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1)) > 0.0
    THEN (CAST(runs AS DOUBLE) -
      (1.0 + 2.0 * n1 * n2 / CAST(n1 + n2 AS DOUBLE))) /
      sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2)) /
        (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1)))
    END, 6) AS z
FROM ag"""

  /** Kendall τ-b mirror over the (x=purchase, y=view) daily pair
    * series — exact concordant/discordant/tie counts. */
  def kendallTauSql(typeX: String = "purchase",
                    typeY: String = "view"): String =
    s"""WITH dc AS (SELECT CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day,
    CAST(SUM(CASE WHEN event_type = '$typeX' THEN 1 ELSE 0 END) AS BIGINT) AS x,
    CAST(SUM(CASE WHEN event_type = '$typeY' THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1),
rng AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM dc),
grid AS (SELECT unnest(generate_series(d0, d1)) AS day FROM rng),
ser AS (SELECT g.day, COALESCE(dc.x, 0) AS x, COALESCE(dc.y, 0) AS y
  FROM grid g LEFT JOIN dc ON dc.day = g.day),
pr AS (SELECT
  CAST(SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1 ELSE 0 END)
    AS BIGINT) AS nc,
  CAST(SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1 ELSE 0 END)
    AS BIGINT) AS nd,
  CAST(SUM(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
  CAST(SUM(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) AS BIGINT) AS ty,
  CAST(COUNT(*) AS BIGINT) AS d0
  FROM ser a JOIN ser b ON a.day < b.day),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM ser)
SELECT nn.n_days, pr.nc, pr.nd,
  ROUND(CASE WHEN CAST(d0 - tx AS DOUBLE) * CAST(d0 - ty AS DOUBLE) > 0.0
    THEN CAST(nc - nd AS DOUBLE) /
      sqrt(CAST(d0 - tx AS DOUBLE) * CAST(d0 - ty AS DOUBLE)) END, 6)
    AS tau_b
FROM pr CROSS JOIN nn"""

  /** Seasonality-strength mirror: DECIMAL(38,0) sufficient statistics
    * per dow, the same R²/F closed form. */
  val seasonalitySql: String =
    s"""WITH $dailySeriesCte,
sd AS (SELECT day % 7 AS dow, CAST(c AS DECIMAL(38,0)) AS c FROM ser),
g AS (SELECT dow, COUNT(*) AS n_g, SUM(c) AS s_g FROM sd GROUP BY 1),
t AS (SELECT COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS ss FROM sd),
sb AS (SELECT SUM(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) /
    CAST(n_g AS DOUBLE)) AS sb_sum, COUNT(*) AS k FROM g)
SELECT CAST(t.n AS BIGINT) AS n_days, CAST(sb.k AS BIGINT) AS n_groups,
  ROUND(CASE WHEN CAST(ss AS DOUBLE) -
      CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) > 0.0
    THEN (sb_sum - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) /
      (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
        CAST(n AS DOUBLE)) END, 6) AS r2,
  ROUND(CASE WHEN (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        / CAST(n AS DOUBLE)) -
      (sb_sum - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) > 0.0
      AND CAST(n AS DOUBLE) > CAST(k AS DOUBLE) AND k > 1
    THEN ((sb_sum - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) /
        (CAST(k AS DOUBLE) - 1.0)) /
      (((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
          CAST(n AS DOUBLE)) -
        (sb_sum - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) /
        (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) END, 6) AS f
FROM t CROSS JOIN sb"""

  /** Good-Turing mirror: same word-trigram stream (list-index walk),
    * N_r self-join for the (r+1)-class lookup, exact-integer products
    * before the single division. */
  def goodTuringSql(rMax: Int): String =
    s"""WITH ws AS (SELECT string_split(text, ' ') AS ts FROM documents),
w AS (SELECT ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS term
  FROM ws, unnest(generate_series(1, len(ts) - 2)) AS t(i)
  WHERE len(ts) >= 3),
tf AS (SELECT term, COUNT(*) AS c FROM w GROUP BY term),
nr AS (SELECT c AS r, CAST(COUNT(*) AS BIGINT) AS n_r FROM tf GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1 FROM tf)
SELECT CAST(a.r AS BIGINT) AS r, a.n_r,
  ROUND(CAST((a.r + 1) * b.n_r AS DOUBLE) / CAST(a.n_r AS DOUBLE), 6) AS r_star,
  ROUND(CAST(a.r * a.n_r AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS mass_share,
  ROUND(CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS p_unseen
FROM nr a LEFT JOIN nr b ON b.r = a.r + 1 CROSS JOIN tot
WHERE a.r <= $rMax ORDER BY r"""

  /** Pettitt mirror: the same W prefix-sum identity over the day grid,
    * argmax with the earliest-day tie rule, capped p approximation. */
  val pettittSql: String =
    s"""WITH $dailySeriesCte,
wd AS (SELECT a.day, CAST(SUM(CASE WHEN b.c > a.c THEN 1
    WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS w
  FROM ser a JOIN ser b ON a.day <> b.day GROUP BY 1),
uu AS (SELECT s.day, CAST(SUM(COALESCE(wd.w, 0))
    OVER (ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS u
  FROM ser s LEFT JOIN wd ON wd.day = s.day),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(day) AS d_last FROM ser),
best AS (SELECT u.day, u.u, ABS(u.u) AS k FROM uu u CROSS JOIN nn
  WHERE u.day < nn.d_last ORDER BY k DESC, u.day ASC LIMIT 1)
SELECT nn.n AS n_days, best.day AS change_day, best.u AS u_at_k,
  CAST(best.k AS BIGINT) AS k,
  ROUND(LEAST(CAST(1 AS DOUBLE), 2 * exp(-6 * CAST(k AS DOUBLE) * CAST(k AS DOUBLE) /
    (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n))), 6) AS p_approx
FROM best CROSS JOIN nn"""

  /** Shared survival-family risk-set CTE chain: per-user epoch-day
    * spans, horizon censoring, per-lifetime (d, cns, n_risk). */
  private def riskSetCtes(censorDays: Int): String =
    s"""WITH per AS (SELECT user_id,
  MIN(CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT)) AS d0,
  MAX(CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT)) AS d1
  FROM events GROUP BY 1),
hor AS (SELECT MAX(d1) AS h FROM per),
lab AS (SELECT d1 - d0 + 1 AS t,
  CASE WHEN d1 <= h - $censorDays THEN 1 ELSE 0 END AS ev FROM per, hor),
g AS (SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
  CAST(SUM(1 - ev) AS BIGINT) AS cns FROM lab GROUP BY 1),
tot AS (SELECT CAST(SUM(d) + SUM(cns) AS BIGINT) AS n_total FROM g),
r AS (SELECT t, d, cns,
  n_total - COALESCE(SUM(d + cns) OVER (ORDER BY t
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM g, tot)"""

  /** Kaplan–Meier mirror: same per-user epoch-day spans, same
    * horizon-censoring rule, same guarded exp-sum-ln product. */
  def survivalSql(censorDays: Int): String =
    riskSetCtes(censorDays) + s"""
SELECT CAST(t AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
  d AS n_event, cns AS n_censored,
  ROUND(CASE WHEN MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
      OVER cum = 1 THEN CAST(0 AS DOUBLE)
    ELSE exp(SUM(CASE WHEN d = 0 THEN CAST(0 AS DOUBLE)
      WHEN d = n_risk THEN CAST(0 AS DOUBLE)
      ELSE ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE)) END)
      OVER cum) END, 6) AS survival
FROM r
WINDOW cum AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY t_days"""

  /** Nelson–Aalen mirror: same risk sets, cumulative d/n and d/n². */
  def hazardSql(censorDays: Int): String =
    riskSetCtes(censorDays) + s"""
SELECT CAST(t AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
  d AS n_event, cns AS n_censored,
  ROUND(SUM(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)) OVER cum, 6)
    AS hazard,
  ROUND(SUM(CAST(d AS DOUBLE) /
    (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE))) OVER cum, 6)
    AS var_hazard
FROM r
WINDOW cum AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY t_days"""

  /** Log-rank mirror: same per-user spans + id-parity arms, same
    * per-lifetime risk sets and hypergeometric terms. */
  def logRankSql(censorDays: Int): String =
    s"""WITH per AS (SELECT user_id,
  MIN(CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT)) AS d0,
  MAX(CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT)) AS d1
  FROM events GROUP BY 1),
hor AS (SELECT MAX(d1) AS h FROM per),
lab AS (SELECT d1 - d0 + 1 AS t,
  CASE WHEN d1 <= h - $censorDays THEN 1 ELSE 0 END AS ev,
  CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS grp FROM per, hor),
byt AS (SELECT t, CAST(SUM(ev * grp) AS BIGINT) AS d1g,
  CAST(SUM(ev * (1 - grp)) AS BIGINT) AS d0g,
  CAST(SUM((1 - ev) * grp) AS BIGINT) AS c1g,
  CAST(SUM((1 - ev) * (1 - grp)) AS BIGINT) AS c0g FROM lab GROUP BY 1),
tot AS (SELECT CAST(SUM(d1g) + SUM(c1g) AS BIGINT) AS n1,
  CAST(SUM(d0g) + SUM(c0g) AS BIGINT) AS n0 FROM byt),
r AS (SELECT t, d1g, d0g, n1, n0,
  n1 - COALESCE(SUM(d1g + c1g) OVER w, 0) AS n1r,
  n0 - COALESCE(SUM(d0g + c0g) OVER w, 0) AS n0r
  FROM byt, tot
  WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
ag AS (SELECT MAX(n1) AS n_g1, MAX(n0) AS n_g0,
  CAST(SUM(d1g) AS BIGINT) AS o1,
  SUM(CAST(d1g + d0g AS DOUBLE) * CAST(n1r AS DOUBLE) /
    CAST(n1r + n0r AS DOUBLE)) AS e1r,
  SUM(CASE WHEN n1r + n0r > 1 THEN
    CAST(d1g + d0g AS DOUBLE) * (CAST(n1r AS DOUBLE) /
      CAST(n1r + n0r AS DOUBLE)) * (CAST(n0r AS DOUBLE) /
      CAST(n1r + n0r AS DOUBLE)) *
      (CAST(n1r + n0r AS DOUBLE) - CAST(d1g + d0g AS DOUBLE)) /
      (CAST(n1r + n0r AS DOUBLE) - CAST(1 AS DOUBLE))
    ELSE CAST(0 AS DOUBLE) END) AS vr
  FROM r WHERE d1g + d0g > 0)
SELECT n_g1, n_g0, o1, ROUND(e1r, 6) AS e1, ROUND(vr, 6) AS var_o1,
  ROUND(CASE WHEN vr > 0 THEN (CAST(o1 AS DOUBLE) - e1r) / sqrt(vr) END,
    6) AS z,
  ROUND(CASE WHEN vr > 0 THEN ((CAST(o1 AS DOUBLE) - e1r) / sqrt(vr)) *
    ((CAST(o1 AS DOUBLE) - e1r) / sqrt(vr)) END, 6) AS chi2
FROM ag"""

  /** Page–Hinkley mirror: same running-mean drift terms off the
    * zero-filled day grid, same σ-scaled λ, same cumulative extrema. */
  def pageHinkleySql(delta: Double, lambdaK: Double): String =
    s"""WITH $dailySeriesCte,
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s,
  CAST(SUM(c * c) AS BIGINT) AS ss FROM ser),
lam AS (SELECT CAST($lambdaK AS DOUBLE) * sqrt(GREATEST(
    CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) -
    (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) *
    (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)),
    CAST(0 AS DOUBLE))) AS lam FROM st),
tm AS (SELECT day, c,
  CAST(c AS DOUBLE) - CAST(SUM(c) OVER cum AS DOUBLE) /
    CAST(COUNT(*) OVER cum AS DOUBLE) - CAST($delta AS DOUBLE) AS term
  FROM ser
  WINDOW cum AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
mm AS (SELECT day, c, SUM(term) OVER cum AS m FROM tm
  WINDOW cum AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
ph AS (SELECT day, c, m - MIN(m) OVER cum AS ph_inc,
  MAX(m) OVER cum - m AS ph_dec FROM mm
  WINDOW cum AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT ph.day, ph.c, ROUND(ph_inc, 6) AS ph_inc, ROUND(ph_dec, 6) AS ph_dec,
  ph_inc > lam AS alarm_inc, ph_dec > lam AS alarm_dec
FROM ph CROSS JOIN lam ORDER BY day"""

  /** Poisson-bootstrap mirror: the identical salted-hash u -> Poisson
    * inverse-CDF weights (same exact decimal thresholds), exact BIGINT
    * per-resample sums, one division per mean, same (mean, rb) rank
    * picks. */
  def bootstrapMeanCiSql(valueCol: String, b: Int): String = {
    val cdf = graft.pipeline.Stats.poissonCdf
    def wExpr(i: Int): String = {
      val u = s"((CAST(${h60(s"'bs$i:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE) + 0.5) / CAST(${1L << 60} AS DOUBLE))"
      cdf.zipWithIndex.reverse.foldLeft(s"CAST(${cdf.length} AS BIGINT)") {
        case (elseExpr, (c, k)) => s"CASE WHEN $u < $c THEN CAST($k AS BIGINT) ELSE $elseExpr END"
      }
    }
    val aggCols = (0 until b).map(i =>
      s"CAST(SUM(w_$i * x) AS BIGINT) AS num_$i, CAST(SUM(w_$i) AS BIGINT) AS den_$i").mkString(",\n  ")
    val wCols = (0 until b).map(i => s"${wExpr(i)} AS w_$i").mkString(",\n  ")
    val branches = (0 until b).map(i =>
      s"SELECT source, n_docs, sx, CAST($i AS BIGINT) AS rb, num_$i AS num, den_$i AS den FROM per").mkString("\n  UNION ALL ")
    s"""WITH base AS (SELECT source, CAST($valueCol AS BIGINT) AS x,
  $wCols
  FROM documents),
per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(x) AS BIGINT) AS sx,
  $aggCols
  FROM base GROUP BY source),
st AS ($branches),
sm AS (SELECT source, n_docs, sx, rb,
  CASE WHEN den > 0 THEN ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) END AS mean_b
  FROM st),
rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
    ORDER BY mean_b ASC NULLS LAST, rb ASC) AS rn,
  COUNT(mean_b) OVER (PARTITION BY source) AS nn FROM sm)
SELECT source, MAX(n_docs) AS n_docs,
  ROUND(CAST(MAX(sx) AS DOUBLE) / CAST(MAX(n_docs) AS DOUBLE), 6) AS mean,
  MAX(CASE WHEN rn = 2 THEN mean_b END) AS boot_lo,
  MAX(CASE WHEN rn = nn - 1 THEN mean_b END) AS boot_hi,
  CAST(COUNT(CASE WHEN mean_b IS NOT NULL THEN 1 END) AS BIGINT) AS n_resamples
FROM rk GROUP BY source ORDER BY source"""
  }

  /** Shared PQ CTE chain: quantization + subspace key, per-subspace
    * integer k-means unrolled `iters` times (same truncated `//`
    * means, same (dist, cid) tie rule), ending at `fd` = every
    * (vec, sub, cid) squared distance against the final codebook. */
  private def pqCtes(m: Int, ksub: Int, iters: Int, scale: Int): String = {
    val sb = new StringBuilder(
      s"""WITH dm AS (SELECT MAX(len(embedding)) AS d FROM embeddings),
iv AS MATERIALIZED (
  SELECT vec_id, i - 1 AS pos, ((i - 1) * $m) // d AS sub,
    CAST(floor(embedding[i]::DOUBLE * $scale) AS BIGINT) AS xi
  FROM embeddings, dm, unnest(generate_series(1, len(embedding))) AS t(i)),
c0 AS (SELECT vec_id - 10 AS cid, sub, pos, xi AS c FROM iv
  WHERE vec_id >= 10 AND vec_id < ${10 + ksub})""")
    for (t <- 1 to iters) {
      sb ++= s""",
d$t AS MATERIALIZED (SELECT iv.vec_id, iv.sub, c.cid,
  SUM((iv.xi - c.c) * (iv.xi - c.c)) AS dist
  FROM iv JOIN c${t - 1} c ON c.pos = iv.pos GROUP BY 1, 2, 3),
a$t AS MATERIALIZED (SELECT vec_id, sub, cid FROM (
  SELECT vec_id, sub, cid, ROW_NUMBER() OVER (
    PARTITION BY vec_id, sub ORDER BY dist ASC, cid ASC) AS rn FROM d$t)
  WHERE rn = 1),
c$t AS MATERIALIZED (SELECT a.cid, iv.sub, iv.pos,
  CAST(SUM(iv.xi) // COUNT(*) AS BIGINT) AS c
  FROM a$t a JOIN iv ON iv.vec_id = a.vec_id AND iv.sub = a.sub
  GROUP BY 1, 2, 3)"""
    }
    sb ++= s""",
fd AS MATERIALIZED (SELECT iv.vec_id, iv.sub, c.cid,
  SUM((iv.xi - c.c) * (iv.xi - c.c)) AS dist
  FROM iv JOIN c$iters c ON c.pos = iv.pos GROUP BY 1, 2, 3)"""
    sb.toString
  }

  /** Shared PQ-ADC CTE block (append after [[pqCtes]]): corpus encode
    * (argmin code per (vec, sub)), probe lookup tables and
    * sum-of-lookups candidate distances. */
  private val pqAdcCtes: String = s""",
codes AS (SELECT vec_id AS vid, sub, cid FROM (
  SELECT vec_id, sub, cid, ROW_NUMBER() OVER (
    PARTITION BY vec_id, sub ORDER BY dist ASC, cid ASC) AS rn FROM fd)
  WHERE rn = 1 AND vec_id >= 10),
lut AS (SELECT vec_id AS qid, sub, cid, dist AS ld FROM fd
  WHERE vec_id < 10),
adc AS (SELECT l.qid, c.vid, SUM(l.ld) AS dist
  FROM codes c JOIN lut l ON l.sub = c.sub AND l.cid = c.cid GROUP BY 1, 2)"""

  /** PQ-ADC mirror: the same per-subspace codebooks, corpus encode,
    * probe lookup tables and sum-of-lookups candidate distances —
    * every value BIGINT. */
  def annPqSql(m: Int, ksub: Int, iters: Int, topK: Int,
               scale: Int): String =
    pqCtes(m, ksub, iters, scale) + pqAdcCtes + s"""
SELECT qid, vid, CAST(dist AS BIGINT) AS dist, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT qid, vid, dist, ROW_NUMBER() OVER (
    PARTITION BY qid ORDER BY dist ASC, vid ASC) AS rnk FROM adc)
WHERE rnk <= $topK ORDER BY qid, rnk"""

  /** PQ recall mirror: the ADC top-k intersected with the exact
    * integer brute-force top-k, per probe. */
  def pqRecallSql(m: Int, ksub: Int, iters: Int, k: Int,
                  scale: Int): String =
    pqCtes(m, ksub, iters, scale) + pqAdcCtes + s""",
apx AS (SELECT qid, vid FROM (SELECT qid, vid, ROW_NUMBER() OVER (
    PARTITION BY qid ORDER BY dist ASC, vid ASC) AS rnk FROM adc)
  WHERE rnk <= $k),
bf AS MATERIALIZED (SELECT q.vec_id AS qid, v.vec_id AS vid,
  SUM((q.xi - v.xi) * (q.xi - v.xi)) AS dist
  FROM iv q JOIN iv v ON v.pos = q.pos AND v.vec_id >= 10
  WHERE q.vec_id < 10 GROUP BY 1, 2),
ex AS (SELECT qid, vid FROM (SELECT qid, vid, ROW_NUMBER() OVER (
    PARTITION BY qid ORDER BY dist ASC, vid ASC) AS rn FROM bf)
  WHERE rn <= $k),
hits AS (SELECT e.qid, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM ex e JOIN apx a ON a.qid = e.qid AND a.vid = e.vid GROUP BY 1)
SELECT e.qid, CAST(COUNT(*) AS BIGINT) AS n_exact,
  CAST(COALESCE(MAX(h.n_hit), 0) AS BIGINT) AS n_hit,
  ROUND(CAST(COALESCE(MAX(h.n_hit), 0) AS DOUBLE) /
    CAST(COUNT(*) AS DOUBLE), 6) AS recall
FROM ex e LEFT JOIN hits h ON h.qid = e.qid GROUP BY e.qid
ORDER BY e.qid"""

  /** IVFADC mirror: the coarse integer k-means unrolled, owner-cell
    * residuals, the per-subspace residual k-means unrolled, probe
    * LUTs per probed cell and sum-of-lookups candidate distances —
    * every value BIGINT, same truncated means and tie rules. */
  def annIvfPqSql(kCoarse: Int, itersCoarse: Int, m: Int, ksub: Int,
                  itersPq: Int, nprobe: Int, topK: Int,
                  scale: Int): String = {
    val sb = new StringBuilder(
      s"""WITH dm AS (SELECT MAX(len(embedding)) AS d FROM embeddings),
iv AS MATERIALIZED (
  SELECT vec_id, i - 1 AS pos,
    CAST(floor(embedding[i]::DOUBLE * $scale) AS BIGINT) AS xi
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)),
g0 AS (SELECT vec_id - 10 AS cell, pos, xi AS c FROM iv
  WHERE vec_id >= 10 AND vec_id < ${10 + kCoarse})""")
    for (t <- 1 to itersCoarse) {
      sb ++= s""",
gd$t AS MATERIALIZED (SELECT iv.vec_id, g.cell,
  SUM((iv.xi - g.c) * (iv.xi - g.c)) AS dist
  FROM iv JOIN g${t - 1} g ON g.pos = iv.pos GROUP BY 1, 2),
ga$t AS MATERIALIZED (SELECT vec_id, cell FROM (
  SELECT vec_id, cell, ROW_NUMBER() OVER (
    PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn FROM gd$t)
  WHERE rn = 1),
g$t AS MATERIALIZED (SELECT a.cell, iv.pos,
  CAST(SUM(iv.xi) // COUNT(*) AS BIGINT) AS c
  FROM ga$t a JOIN iv ON iv.vec_id = a.vec_id GROUP BY 1, 2)"""
    }
    sb ++= s""",
fcd AS MATERIALIZED (SELECT iv.vec_id, g.cell,
  SUM((iv.xi - g.c) * (iv.xi - g.c)) AS dist
  FROM iv JOIN g$itersCoarse g ON g.pos = iv.pos GROUP BY 1, 2),
frk AS MATERIALIZED (SELECT vec_id, cell, ROW_NUMBER() OVER (
  PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn FROM fcd),
own AS (SELECT vec_id, cell FROM frk WHERE rn = 1),
prb AS (SELECT vec_id AS qid, cell FROM frk
  WHERE rn <= $nprobe AND vec_id < 10),
rv AS MATERIALIZED (SELECT iv.vec_id, iv.pos,
  (iv.pos * $m) // dm.d AS sub, iv.xi - g.c AS ri
  FROM iv JOIN own o ON o.vec_id = iv.vec_id
  JOIN g$itersCoarse g ON g.cell = o.cell AND g.pos = iv.pos
  CROSS JOIN dm),
p0 AS (SELECT vec_id - 10 AS cid, sub, pos, ri AS c FROM rv
  WHERE vec_id >= 10 AND vec_id < ${10 + ksub})"""
    for (t <- 1 to itersPq) {
      sb ++= s""",
pd$t AS MATERIALIZED (SELECT rv.vec_id, rv.sub, p.cid,
  SUM((rv.ri - p.c) * (rv.ri - p.c)) AS dist
  FROM rv JOIN p${t - 1} p ON p.pos = rv.pos GROUP BY 1, 2, 3),
pa$t AS MATERIALIZED (SELECT vec_id, sub, cid FROM (
  SELECT vec_id, sub, cid, ROW_NUMBER() OVER (
    PARTITION BY vec_id, sub ORDER BY dist ASC, cid ASC) AS rn FROM pd$t)
  WHERE rn = 1),
p$t AS MATERIALIZED (SELECT a.cid, rv.sub, rv.pos,
  CAST(SUM(rv.ri) // COUNT(*) AS BIGINT) AS c
  FROM pa$t a JOIN rv ON rv.vec_id = a.vec_id AND rv.sub = a.sub
  GROUP BY 1, 2, 3)"""
    }
    sb ++= s""",
pfd AS MATERIALIZED (SELECT rv.vec_id, rv.sub, p.cid,
  SUM((rv.ri - p.c) * (rv.ri - p.c)) AS dist
  FROM rv JOIN p$itersPq p ON p.pos = rv.pos GROUP BY 1, 2, 3),
codes AS (SELECT vec_id AS vid, sub, cid FROM (
  SELECT vec_id, sub, cid, ROW_NUMBER() OVER (
    PARTITION BY vec_id, sub ORDER BY dist ASC, cid ASC) AS rn FROM pfd)
  WHERE rn = 1 AND vec_id >= 10),
lut AS MATERIALIZED (SELECT pr.qid, pr.cell,
  (iv.pos * $m) // dm.d AS sub, p.cid,
  SUM((iv.xi - g.c - p.c) * (iv.xi - g.c - p.c)) AS ld
  FROM prb pr JOIN iv ON iv.vec_id = pr.qid
  JOIN g$itersCoarse g ON g.cell = pr.cell AND g.pos = iv.pos
  JOIN p$itersPq p ON p.pos = iv.pos CROSS JOIN dm GROUP BY 1, 2, 3, 4),
cand AS (SELECT pr.qid, pr.cell, o.vec_id AS vid FROM prb pr
  JOIN own o ON o.cell = pr.cell AND o.vec_id >= 10),
adc AS (SELECT c.qid, c.vid, SUM(l.ld) AS dist
  FROM cand c JOIN codes k ON k.vid = c.vid
  JOIN lut l ON l.qid = c.qid AND l.cell = c.cell
    AND l.sub = k.sub AND l.cid = k.cid
  GROUP BY 1, 2)
SELECT qid, vid, CAST(dist AS BIGINT) AS dist, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT qid, vid, dist, ROW_NUMBER() OVER (
    PARTITION BY qid ORDER BY dist ASC, vid ASC) AS rnk FROM adc)
WHERE rnk <= $topK ORDER BY qid, rnk"""
    sb.toString
  }

  /** PQ quantization-error mirror: per-subspace nearest-centroid SSE
    * off the same `fd` frame, mean squared error in original units. */
  def pqErrorSql(m: Int, ksub: Int, iters: Int, scale: Int): String =
    pqCtes(m, ksub, iters, scale) + s""",
best AS (SELECT vec_id, sub, MIN(dist) AS dist FROM fd GROUP BY 1, 2),
nd AS (SELECT sub, CAST(COUNT(DISTINCT pos) AS BIGINT) AS n_dims
  FROM iv GROUP BY 1),
ag AS (SELECT sub, CAST(COUNT(*) AS BIGINT) AS n_vecs,
  CAST(SUM(dist) AS BIGINT) AS sse FROM best GROUP BY 1)
SELECT CAST(ag.sub AS BIGINT) AS sub, nd.n_dims, ag.n_vecs, ag.sse,
  ROUND(CAST(ag.sse AS DOUBLE) / CAST(ag.n_vecs AS DOUBLE) /
    CAST(${scale.toLong * scale} AS DOUBLE), 6) AS mean_sqerr
FROM ag JOIN nd ON nd.sub = ag.sub ORDER BY sub"""
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.{Corpus, TextOps}

/** Round-4 corpus operators: decontamination, repetition metrics,
  * unigram-LM scoring, PII scan/redaction — semantics on hand-built
  * corpora with known answers (the synthetic testdata has no PII, so
  * redaction is exercised here on inline strings; the oracle query
  * checks cross-engine expression agreement). */
class CorpusPrepSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    val implicits = spark.implicits
    import implicits._
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
  }

  test("decontaminate flags exactly the train docs sharing an 8-gram with the eval slice") {
    // doc 14 hashes into the 5% eval slice (hash60("ev:14") % 100 = 2);
    // the others don't. 31 shares its text, 33 is disjoint.
    val evalId = (0L until 100L)
      .find { id =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(s"ev:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(md5.substring(0, 15), 16) % 100 < 5
      }.get
    val d = docs(
      evalId -> "shared secret benchmark sentence here",
      31L -> "shared secret benchmark sentence here",
      33L -> "zzz yyy xxx www vvv uuu qqq ppp")
    val out = Corpus.decontaminate(d, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(31L) && out(31L) > 0L)
    assert(!out.contains(33L))
    assert(!out.contains(evalId)) // eval docs are never reported
  }

  test("repetition metrics: degenerate repetition vs all-distinct") {
    val d = docs(1L -> "spam spam spam spam", 2L -> "all words here differ")
    val m = Corpus.repetition(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Long]("words") == 4L)
    assert(m(1L).getAs[Double]("uniq_ratio") == 0.25)
    assert(m(1L).getAs[Double]("top_frac") == 1.0)
    assert(m(1L).getAs[Double]("dup2_frac") == 1.0) // all 3 bigrams identical
    assert(m(2L).getAs[Double]("uniq_ratio") == 1.0)
    assert(m(2L).getAs[Double]("dup2_frac") == 0.0)
  }

  test("repetition on a single-word doc has no bigrams") {
    val m = Corpus.repetition(docs(7L -> "solo")).collect()
    assert(m.length == 1 && m(0).getAs[Double]("dup2_frac") == 0.0)
  }

  test("lm score: rarer words raise the per-doc NLL") {
    val d = docs(
      1L -> "common common common common",
      2L -> "common rare")
    val m = Corpus.lmScore(d).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // p(common)=5/6, p(rare)=1/6: doc 2 averages in the rare word
    assert(m(2L) > m(1L))
    val expected1 = -math.log(5.0 / 6.0)
    assert(math.abs(m(1L) - BigDecimal(expected1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("trainingMixReport mediaDropIds gate: complementary drops partition the mix") {
    val implicits = spark.implicits
    import implicits._
    // 40 English docs that pass the lang/quality gates, with unique
    // leading tokens (no exact-dup fingerprints) and per-doc salted
    // words (no shared 24-char decontam grams)
    val d = (0L until 40L).map { i =>
      (i, s"doc $i alpha$i the bravo$i a charlie$i is delta$i the echo$i here", "en")
    }.toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val w = Map("en" -> 1.0)
    def cells(df: DataFrame): Map[(String, String), (Long, Long)] =
      df.collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val plain = cells(Corpus.trainingMixReport(d, w))
    assert(plain.values.map(_._1).sum > 10L) // the fixture isn't vacuous
    // the gate is one anti-join on the survivor frame, so dropping the
    // evens and dropping the odds must partition every (lang, split)
    // cell of the plain report — additivity needs no knowledge of the
    // other gates
    val evens = d.filter(col("doc_id") % 2 === 0).select("doc_id")
    val odds = d.filter(col("doc_id") % 2 === 1).select("doc_id")
    val mmE = cells(Corpus.trainingMixReport(d, w, mediaDropIds = Some(evens)))
    val mmO = cells(Corpus.trainingMixReport(d, w, mediaDropIds = Some(odds)))
    assert(mmE.values.map(_._1).sum > 0L && mmO.values.map(_._1).sum > 0L)
    val keys = plain.keySet
    assert(mmE.keySet.subsetOf(keys) && mmO.keySet.subsetOf(keys))
    keys.foreach { k =>
      val (pn, pc) = plain(k)
      val (en_, ec) = mmE.getOrElse(k, (0L, 0L))
      val (on_, oc) = mmO.getOrElse(k, (0L, 0L))
      assert(en_ + on_ == pn && ec + oc == pc, s"cell $k not partitioned")
    }
    // dropping everything empties the mix
    assert(Corpus.trainingMixReport(d, w,
      mediaDropIds = Some(d.select("doc_id"))).count() == 0L)
  }

  test("goodTuring: trigram frequency-of-frequencies with the classic r* formula") {
    // trigrams: doc 1 "a b c d" -> {a b c, b c d}; doc 2 "a b c" ->
    // {a b c}. Counts: "a b c" 2, "b c d" 1 -> N_1 = 1, N_2 = 1,
    // N = 3 tokens; doc 3 is too short to emit any trigram.
    val d = docs(1L -> "a b c d", 2L -> "a b c", 3L -> "x y")
    val r = Corpus.goodTuring(d).collect().map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(1L, 2L))
    assert(r(1L).getAs[Long]("n_r") == 1L)
    assert(r(1L).getAs[Double]("r_star") == 2.0) // (1+1)*N_2/N_1 = 2
    assert(r(1L).getAs[Double]("mass_share") == 0.333333) // 1*1/3
    assert(r(1L).getAs[Double]("p_unseen") == 0.333333)   // N_1/N
    assert(r(2L).getAs[Long]("n_r") == 1L)
    assert(r(2L).isNullAt(r(2L).fieldIndex("r_star"))) // N_3 = 0 -> NULL
    assert(r(2L).getAs[Double]("mass_share") == 0.666667) // 2*1/3
  }

  test("mix sample keeps weight-1 langs fully, weight-0 langs never") {
    val implicits = spark.implicits
    import implicits._
    val d = (0L until 40L).map(i => (i, s"text $i", if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "text", "lang")
    val kept = Corpus.mixSample(d, Map("en" -> 1.0)).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(kept.length == 20 && kept.forall(_._2 == "en"))
  }

  test("boilerplate grams finds the shared template, not unique text") {
    val tmpl = "standard footer text"
    val d = docs(
      1L -> s"alpha unique words $tmpl",
      2L -> s"beta other phrasing $tmpl",
      3L -> s"gamma completely else $tmpl")
    val grams = Corpus.boilerplateGrams(d, 1.0).collect()
    assert(grams.nonEmpty && grams.forall(_.getAs[Long]("df") == 3L))
    // a gram unique to doc 1 must not appear at frac 1.0
    val loose = Corpus.boilerplateGrams(d, 0.3).collect()
    assert(loose.length > grams.length)
  }

  test("zipf coverage is monotone in k and reaches 1.0 past the vocab") {
    val d = docs(1L -> "a a a a b b c d e f")
    val row = Corpus.zipfCoverage(d, Seq(1, 2, 100)).collect()(0)
    assert(row.getAs[Double]("c_1") == 0.4)   // 'a' covers 4/10
    assert(row.getAs[Double]("c_2") == 0.6)   // +'b' 2/10
    assert(row.getAs[Double]("c_100") == 1.0) // whole vocab
  }

  test("native graft_hash60 is bit-identical to the SQL md5 formula") {
    val implicits = spark.implicits
    import implicits._
    val d = Seq("", "a", "abc", "the quick brown fox", "的的的",
      "x" * 500, "mixed 的 ascii 123").toDF("s")
    graft.sql.Hash60.register(spark)
    val cmp = d.select(
      call_function("graft_hash60", col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("formula"))
    assert(cmp.filter(col("native") =!= col("formula")).isEmpty)
    assert(cmp.filter(col("native") < 0L).isEmpty) // 60-bit ⇒ non-negative
  }

  test("centroidSim: orthogonal, identical, and opposed label centroids") {
    val implicits = spark.implicits
    import implicits._
    // label 0 → mean (1,0); label 1 → mean (0,1); label 2 → mean (2,0)
    // (parallel to 0); label 3 → mean (−1,0) (opposed to 0)
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0L), (2L, Array(1.0f, 0.0f), 0L),
      (3L, Array(0.0f, 1.0f), 1L),
      (4L, Array(2.0f, 0.0f), 2L),
      (5L, Array(-1.0f, 0.0f), 3L))
      .toDF("vec_id", "embedding", "label")
    val m = graft.pipeline.Similarity.centroidSim(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m((0L, 1L)) == 0.0)   // orthogonal
    assert(m((0L, 2L)) == 1.0)   // parallel
    assert(m((0L, 3L)) == -1.0)  // opposed
    assert(m((1L, 2L)) == 0.0)
  }

  test("int8 quantization: known vector, zero vector, range bounds") {
    val implicits = spark.implicits
    import implicits._
    val emb = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val m = graft.pipeline.Similarity.quantizeInt8(emb).collect()
      .map(r => r.getLong(0) -> r).toMap
    // scale = 1/127; q = floor(x·127 + 0.5) = (127, -63, 32, 0)
    assert(m(1L).getAs[Long]("qmax") == 127L)
    assert(m(1L).getAs[Long]("qmin") == -63L)
    assert(m(1L).getAs[Long]("qsum") == 127L - 63L + 32L + 0L)
    assert(m(1L).getAs[Long]("dims") == 4L)
    assert(m(2L).getAs[Double]("scale") == 0.0 &&
      m(2L).getAs[Long]("qsum") == 0L)
  }

  test("pii scan counts and redacts emails, phones, ips") {
    val d = docs(
      1L -> "mail me at jane.doe+x@example.com or call 415-555-1234 now",
      2L -> "server at 10.0.0.1 and 192.168.1.255 no contact",
      3L -> "nothing sensitive here at all")
    val m = TextOps.piiScan(d).collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Long]("n_email") == 1L)
    assert(m(1L).getAs[Long]("n_phone") == 1L)
    assert(m(2L).getAs[Long]("n_ip") == 2L)
    assert(m(3L).getAs[Long]("n_email") == 0L &&
      m(3L).getAs[Long]("n_phone") == 0L && m(3L).getAs[Long]("n_ip") == 0L)
    // redaction replaces, never leaks the original span
    val red = d.select(col("doc_id"), TextOps.piiRedact(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L) == "mail me at [EMAIL] or call [PHONE] now")
    assert(red(2L) == "server at [IP] and [IP] no contact")
    assert(red(3L) == "nothing sensitive here at all")
    assert(m(1L).getAs[Long]("clean_len") == red(1L).length.toLong)
  }
}

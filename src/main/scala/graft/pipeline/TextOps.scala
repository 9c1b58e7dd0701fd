package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines over the `documents`
  * table (brief-mandated; no counterpart in the reference, which is a
  * graph engine — these follow the standard corpus-prep recipes).
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * or native Catalyst expressions (no UDFs): shingling is the
  * [[graft.sql.CharGrams]] generator (row stream identical to the
  * sequence+transform+explode formula the oracle mirrors), hashing is
  * md5→bigint so the DuckDB oracle computes bit-identical values.
  *
  * Scale notes: every op here is a narrow map or a single map-side-
  * combined aggregation keyed by doc_id — embarrassingly parallel, no
  * shuffle beyond the final groupBy, safe at any corpus size.
  */
object TextOps {

  /** Deterministic 60-bit hash shared with the oracle:
    * Spark  conv(substr(md5(s),1,15),16,10)
    * DuckDB ('0x' || substr(md5(s),1,15))::BIGINT  — same value.
    * Computed by the native codegen'd [[graft.sql.Hash60]] expression
    * (digest once, shift — no hex string round-trip) when a session is
    * active to register it on; the SQL-formula fallback is bit-identical. */
  def hash60(c: Column, prefix: String): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) =>
        graft.sql.Hash60.register(s)
        call_function("graft_hash60", concat(lit(prefix), c))
      case None =>
        conv(substring(md5(concat(lit(prefix), c)), 1, 15), 16, 10).cast("long")
    }

  /** Positioned gram stream (doc_id, pos, sh), pos 1-based in code
    * points — the native [[graft.sql.CharGrams]] generator. The naive
    * `transform(sequence(1, len), i -> substring(text, i, k))` formula
    * (still mirrored verbatim in the DuckDB oracles) materializes a
    * |text|-element array per row AND is quadratic in |text| (each
    * substring walks the UTF8 string from byte 0); the generator
    * streams the same rows with two byte cursors — O(1) state, O(|text|)
    * walk, no array, at any document length (measured: 8 MB doc,
    * shingles 112 s → ~3 s). */
  private[graft] def charGrams(docs: DataFrame, k: Int): DataFrame = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.sql.CharGrams.register)
    docs.select(col("doc_id"),
      call_function("graft_chargrams", col("text"), lit(k)))
  }

  /** One row per character k-gram: (doc_id, sh). Short docs yield their
    * (truncated) prefix shingle, mirroring substr semantics in DuckDB;
    * row stream identical to the whole-document SQL formula
    * (spec-pinned, multi-byte chars included). */
  def shingles(docs: DataFrame, k: Int = 5): DataFrame =
    charGrams(docs, k).select(col("doc_id"), col("sh"))

  /** Winnowing fingerprints (Schleimer–Wilkerson–Aiken, the MOSS
    * scheme): hash every character k-gram, slide a w-gram window, keep
    * each window's minimal hash — guaranteeing any substring match of
    * length ≥ w+k-1 between two documents shares a fingerprint, with
    * density ~2/(w+1) instead of every gram. Returns distinct
    * (doc_id, fp).
    *
    * The rightmost-of-ties rule is encoded in the key itself:
    * fp = (gram-hash >> 12)·4096 + (4095 − pos mod 4096), so a plain
    * window MIN picks the smallest 48-bit hash and, among equal
    * hashes, the largest position — one aggregate, no argmin. The
    * position tiebreak wraps every 4096 grams; ties only matter
    * between EQUAL hashes inside one w-gram window, so the wrap is
    * harmless for w ≪ 4096 and the formula is mirrored verbatim in
    * the oracle. Scale: one explode + a per-document window (sorts
    * doc-bounded runs inside hash partitions — spillable, no global
    * sort) + distinct; rows out ≈ 2·len/w per doc. */
  def winnow(docs: DataFrame, k: Int = 5, w: Int = 8): DataFrame = {
    // positioned grams via the native generator — the same (doc_id,
    // pos, sh) stream as the whole-document formula, streamed with
    // O(1) state at any document length
    val grams = charGrams(docs, k)
    val keyed = grams.select(col("doc_id"), col("pos"),
      (shiftright(hash60(col("sh"), "wn:"), 12) * lit(4096L) +
        (lit(4095L) - pmod(col("pos"), lit(4096L)))).as("key"))
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    keyed
      .withColumn("sel", min("key").over(win))
      .withColumn("n", count(lit(1)).over(win))
      .filter(col("n") === w) // full windows only (standard winnowing)
      // emit only the hash part: the position bits exist to break ties
      // INSIDE the window min — leaving them in would make the same
      // substring at different offsets fingerprint differently
      .select(col("doc_id"), shiftright(col("sel"), 12).as("fp")).distinct()
  }

  /** Winnowing near-dup candidate pairs: doc pairs sharing ≥ `minShared`
    * winnowed fingerprints, with the shared count — detects substring-
    * level overlap (quotes, templated spans) that whole-doc MinHash
    * dilutes away. Fingerprints occurring in more than `maxDf` docs are
    * dropped before pairing (the standard hot-bucket cap: a boilerplate
    * fingerprint shared by f docs would emit f² rows; with the cap the
    * pair fan-out is ≤ maxDf·|fingerprints| — never quadratic in docs,
    * and what the cap removes is exactly the corpus-wide boilerplate
    * [[graft.pipeline.Corpus.boilerplateGrams]] reports). */
  def winnowPairs(docs: DataFrame, k: Int = 5, w: Int = 8,
                  minShared: Int = 2, maxDf: Int = 50,
                  fpIn: Option[DataFrame] = None): DataFrame = {
    // the fingerprint frame feeds the rare-df aggregate AND both join
    // sides — materialize it once (callers holding a persisted frame,
    // like SparkEntry's winnowCached, pass it via fpIn)
    val fp = fpIn.getOrElse(winnow(docs, k, w).localCheckpoint())
    val rare = fp.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("fp")
    val f = fp.join(rare, Seq("fp"), "left_semi")
    f.select(col("fp"), col("doc_id").as("a"))
      .join(f.select(col("fp"), col("doc_id").as("b")), Seq("fp"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).cast("long").as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Marker-word language heuristic: score per language = total marker
    * occurrences; highest score wins, ties resolved by fixed priority
    * order (deterministic, mirrored in the oracle's CASE chain). */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|is)\\b",
    "de" -> "\\b(der|die|das)\\b",
    "es" -> "\\b(el|los|una)\\b",
    "fr" -> "\\b(le|la|les)\\b",
    "zh" -> "的")

  /** Marker scores + `_guess` added to any frame with a text column —
    * the single definition of the language-ID rule, shared by [[langId]]
    * and the streaming gate (no second copy to drift). */
  private[graft] def withLangGuess(df: DataFrame): DataFrame = {
    val names = langMarkers.map(_._1)
    val scored = df.select(
      col("*") +: langMarkers.map { case (l, re) =>
        regexp_count(col("text"), lit(re)).cast("long").as(s"_s_$l")
      }: _*)
    val guess = names.foldRight(lit(names.last)) { case (l, elseCol) =>
      val ge = names.filter(_ != l)
        .map(o => col(s"_s_$l") >= col(s"_s_$o")).reduce(_ && _)
      when(ge, lit(l)).otherwise(elseCol)
    }
    scored.withColumn("_guess", guess)
  }

  private[graft] val langHelperCols: Seq[String] =
    langMarkers.map { case (l, _) => s"_s_$l" } :+ "_guess"

  def langId(docs: DataFrame): DataFrame =
    withLangGuess(docs)
      .select(col("doc_id"), col("lang"), col("_guess").as("guess"))
      .withColumn("matches", col("guess") === col("lang"))

  /** Counting columns + `quality` added to any frame with a text column
    * — 0.4·min(words/100,1) + 0.3·(1−punct/chars) +
    * 0.3·min(5·stop/words,1); single definition shared by [[quality]]
    * and the streaming gate. */
  private[graft] def withQuality(df: DataFrame): DataFrame =
    df.withColumn("_chars", length(col("text")).cast("long"))
      .withColumn("_words", regexp_count(col("text"), lit("[^ ]+")).cast("long"))
      .withColumn("_punct", regexp_count(col("text"), lit("[^A-Za-z0-9 ]")).cast("long"))
      .withColumn("_stop", regexp_count(col("text"), lit("\\b(the|a|is)\\b")).cast("long"))
      .withColumn("quality",
        round(lit(0.4) * least(col("_words") / lit(100.0), lit(1.0)) +
          lit(0.3) * (lit(1.0) - col("_punct") / col("_chars")) +
          lit(0.3) * least(lit(5.0) * col("_stop") / col("_words"), lit(1.0)), 6))

  private[graft] val qualityHelperCols: Seq[String] =
    Seq("_chars", "_words", "_punct", "_stop")

  def quality(docs: DataFrame): DataFrame =
    withQuality(docs).select(col("doc_id"), col("_chars").as("chars"),
      col("_words").as("words"), col("quality"))

  /** Whitespace tokens + BPE-ish regex tokens (letter runs, single
    * digits, single punctuation marks). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit("[^ ]+")).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"))
        .cast("long").as("bpe_tokens"))

  /** Unicode-normalization audit per source (UAX #15 NFC): documents
    * whose text is NOT in canonical composed form — the silent-dedup-
    * defeat signal every multilingual ingest screens before hashing
    * (two byte encodings of the same visible string tokenize and hash
    * DIFFERENTLY, so exact dedup misses them) — plus U+FFFD
    * replacement-character carriers (upstream decode damage). NFC via
    * the native codegen'd [[graft.sql.NfcNormalize]] (Spark ships no
    * normalizer; DuckDB mirrors with its built-in nfc_normalize —
    * both implement UAX #15, so the forms agree). Returns per source:
    * (source, n_docs, n_nonnfc, nfc_len_delta, n_replacement_docs,
    * n_replacement_chars). The synthetic corpus is ASCII-clean, so
    * the oracle validates the expressions agree engine-to-engine;
    * the spec exercises real decomposed/damaged strings (the
    * piiDensity precedent).
    *
    * Scale: ONE narrow scan (isNormalized fast path — allocation-free
    * on clean data) + a |sources|-key map-side-combined aggregate. */
  def unicodeAudit(docs: DataFrame): DataFrame = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.sql.NfcNormalize.register)
    val nfc = call_function("graft_nfc", col("text"))
    docs
      .select(col("source"),
        (nfc =!= col("text")).cast("long").as("_nonnfc"),
        (length(col("text")) - length(nfc)).cast("long").as("_delta"),
        (length(col("text")) -
          length(translate(col("text"), "\uFFFD", ""))).cast("long")
          .as("_repl"))
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("_nonnfc").cast("long").as("n_nonnfc"),
        sum("_delta").cast("long").as("nfc_len_delta"),
        sum((col("_repl") > 0).cast("long")).cast("long")
          .as("n_replacement_docs"),
        sum("_repl").cast("long").as("n_replacement_chars"))
  }

  /** Document fingerprint: min 8-gram rolling-window hash (min-sampling,
    * the 1-fingerprint case of winnowing). */
  def fingerprint(docs: DataFrame): DataFrame =
    shingles(docs, 8)
      .select(col("doc_id"), hash60(col("sh"), "fp:").as("h"))
      .groupBy("doc_id").agg(min("h").as("fp"))

  /** PII patterns (kind, regex, replacement) — the RE2-compatible subset
    * so the DuckDB oracle runs the very same expressions. Redaction
    * applies them in this order. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "[PHONE]"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"))

  /** Redacted text: every PII pattern replaced by its sentinel,
    * applied in [[piiPatterns]] order. Narrow map — scales trivially. */
  def piiRedact(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, re, repl)) =>
      regexp_replace(c, re, repl)
    }

  /** Per-document lexical diversity: type and token counts with the
    * type–token ratio and Guiraud's R = types/√tokens (the
    * length-robust variant — raw TTR decays mechanically with doc
    * length, so R is what a curation gate actually thresholds;
    * Guiraud 1954). Low diversity flags templated/repetitive text
    * from the vocabulary side, complementing the substring-based
    * repetition metrics.
    *
    * Scale: one (doc_id, term) partial-aggregated count, then a
    * per-doc roll-up — types = group count, tokens = count sum; NO
    * count-distinct Expand, no window. */
  def lexicalDiversity(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").cast("long").as("tokens"),
        count(lit(1)).cast("long").as("types"))
      .select(col("doc_id"), col("tokens"), col("types"),
        round(col("types") / col("tokens"), 6).as("ttr"),
        round(col("types") / sqrt(col("tokens")), 6).as("guiraud"))

  /** Per-document unigram (token) Shannon entropy in nats, plus the
    * length-normalized variant entropy/ln(types) ∈ [0,1] (1 = uniform
    * usage, 0 degenerate). A low-entropy doc concentrates its token
    * mass on a few terms — templated/boilerplate text that raw TTR
    * misses when the template itself is wide. Complements
    * [[lexicalDiversity]] (which counts types, blind to skew).
    *
    * Scale: one (doc_id, term) partial-aggregated count, then the
    * per-doc totals via a doc_id-partitioned window over that counts
    * frame (partition size = per-doc vocabulary — bounded, and the
    * counts frame is already hash-distributed by doc_id so the window
    * reuses the shuffle), then one final per-doc roll-up computing
    * Σ−(c/T)·ln(c/T). Single scan, no count-distinct Expand, no UDF —
    * all codegen'd arithmetic. */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    val perDoc = Window.partitionBy("doc_id")
    val tk = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      .withColumn("tokens", sum("c").over(perDoc).cast("long"))
      .withColumn("types", count(lit(1)).over(perDoc).cast("long"))
    val p = col("c").cast("double") / col("tokens")
    tk.groupBy(col("doc_id"), col("tokens"), col("types"))
      .agg(sum(-p * log(p)).as("ent"))
      .select(col("doc_id"), col("tokens"), col("types"),
        round(col("ent"), 6).as("entropy"),
        round(when(col("types") > 1, col("ent") / log(col("types").cast("double")))
          .otherwise(lit(0.0)), 6).as("norm_entropy"))
  }

  /** PII scan: per-doc match counts (on the original text, per pattern
    * independently) plus the length of the redacted text. The synthetic
    * testdata corpus contains no PII — the oracle checks the expressions
    * agree across engines; PiiSpec exercises real matches inline. */
  def piiScan(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id") +:
        piiPatterns.map { case (kind, re, _) =>
          regexp_count(col("text"), lit(re)).cast("long").as(s"n_$kind")
        } :+ length(piiRedact(col("text"))).cast("long").as("clean_len"): _*)

  /** PII co-occurrence audit per source: documents where MULTIPLE PII
    * kinds appear together are the re-identification risk a single-
    * pattern density report misses (an email next to a phone number is
    * a contact record, not a stray address). Per source: total docs,
    * docs with any PII, docs with ≥ 2 distinct kinds, and each
    * kind-pair's co-occurrence count. One narrow regex map + one
    * |S|-row aggregate — scan-bound at any corpus size. */
  def piiCooccur(docs: DataFrame): DataFrame = {
    val kinds = piiPatterns.map(_._1)
    val flagged = docs.select(
      col("source") +: piiPatterns.map { case (kind, re, _) =>
        (regexp_count(col("text"), lit(re)) > 0).as(s"has_$kind")
      }: _*)
    val nKinds = kinds.map(k => when(col(s"has_$k"), 1L).otherwise(0L))
      .reduce(_ + _)
    val pairCols = kinds.combinations(2).map { case Seq(a, b) =>
      sum(when(col(s"has_$a") && col(s"has_$b"), 1L).otherwise(0L))
        .as(s"n_${a}_$b")
    }.toSeq
    flagged.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        Seq(sum(when(nKinds >= 1L, 1L).otherwise(0L)).as("n_any"),
          sum(when(nKinds >= 2L, 1L).otherwise(0L)).as("n_multi")) ++
          pairCols: _*)
      .orderBy("source")
  }

  /** Code-switching (language-mixing) screen: per doc, how many of the
    * marker languages fire at all, and what share of total marker hits
    * the dominant language holds — a doc whose dominant share is low
    * with ≥ 2 languages present is mixed-language text (which poisons
    * single-language training buckets even when the doc-level lang-ID
    * is "right"). Per source: doc counts, mixed counts (≥ 2 langs AND
    * dominant share ≤ maxShare), mixed rate, mean dominant share over
    * docs with any hits. Reuses the single langMarkers definition —
    * one narrow regex map, one |S|-row aggregate. */
  def codeSwitch(docs: DataFrame, maxShare: Double = 0.9): DataFrame = {
    val names = langMarkers.map(_._1)
    val scored = withLangGuess(docs)
    val totalHits = names.map(l => col(s"_s_$l")).reduce(_ + _)
    val maxHits = greatest(names.map(l => col(s"_s_$l")): _*)
    val nLangs = names.map(l => when(col(s"_s_$l") > 0L, 1L).otherwise(0L))
      .reduce(_ + _)
    val domShare = col("_max").cast("double") / col("_tot").cast("double")
    scored
      .select(col("source"), totalHits.as("_tot"), maxHits.as("_max"),
        nLangs.as("_nl"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("_tot") > 0L, 1L).otherwise(0L)).as("n_scored"),
        sum(when(col("_tot") > 0L && col("_nl") >= 2L &&
          domShare <= lit(maxShare), 1L).otherwise(0L)).as("n_mixed"),
        round(avg(when(col("_tot") > 0L, round(domShare, 6))), 6)
          .as("mean_dom_share"))
      .select(col("source"), col("n_docs"), col("n_scored"), col("n_mixed"),
        round(when(col("n_scored") > 0L,
          col("n_mixed").cast("double") / col("n_scored").cast("double")), 6)
          .as("mixed_rate"),
        col("mean_dom_share"))
      .orderBy("source")
  }

  /** Language-ID confusion matrix: (labeled lang, guessed lang, count,
    * row share) — WHERE the heuristic classifier fails, which the
    * [[langId]] boolean accuracy can't show (en→de confusion needs a
    * different fix than zh→en). One |langs|²-key count off the langId
    * scan. */
  def langConfusion(docs: DataFrame): DataFrame = {
    val c = langId(docs).groupBy("lang", "guess")
      .agg(count(lit(1)).as("n"))
    val byLang = c.groupBy("lang").agg(sum("n").as("nl"))
    c.join(broadcast(byLang), Seq("lang"))
      .select(col("lang"), col("guess"), col("n").cast("long").as("n"),
        round(col("n") / col("nl").cast("double"), 6).as("row_share"))
      .orderBy("lang", "guess")
  }

  /** Heuristic named-entity density per source: capitalized-word and
    * acronym counts per 1000 whitespace words — the cheap proxy for
    * "how entity-rich is this source" that steers NER-pipeline
    * sampling and flags listicle/catalog text (acronym-heavy) vs prose
    * before any model runs. Word-boundary regexes identical in both
    * engines (the [[piiPatterns]] \b convention). One codegen'd map +
    * one |S|-row aggregate. */
  def entityDensity(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        regexp_count(col("text"), lit("[^ ]+")).cast("long").as("words"),
        regexp_count(col("text"), lit("\\b[A-Z][a-z]+\\b")).cast("long")
          .as("caps"),
        regexp_count(col("text"), lit("\\b[A-Z]{2,}\\b")).cast("long")
          .as("acros"))
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("words").cast("long").as("words"),
        sum("caps").cast("long").as("cap_words"),
        sum("acros").cast("long").as("acronyms"))
      .select(col("source"), col("n_docs"), col("words"), col("cap_words"),
        col("acronyms"),
        round(lit(1000.0) * col("cap_words") / col("words").cast("double"), 6)
          .as("cap_per_1k"),
        round(lit(1000.0) * col("acronyms") / col("words").cast("double"), 6)
          .as("acro_per_1k"))
      .orderBy("source")

  /** Character-class composition per source — the "code vs prose vs
    * tables vs foreign script" fingerprint: exact per-doc counts of
    * ASCII letters, digits, spaces, and non-ASCII code points, with
    * remaining ASCII (punctuation/control) DERIVED by subtraction so
    * no two regex definitions can disagree about the partition.
    * Fractions of total characters, 6 dp. One codegen'd map + one
    * |S|-row aggregate.
    *
    * Distinct from [[quality]] (which gates) and lexicalProfile (which
    * reads words): this reads raw bytes-level composition — the signal
    * that separates source code, markup, and tables from prose before
    * any tokenizer runs. */
  /** Per-language character-bigram entropy: the Shannon entropy of
    * the language's character-pair distribution (plus ln(V)-normalized
    * form) — the script-level fingerprint language-ID models train on,
    * and a drift alarm when a "lang=en" shard suddenly carries the
    * wrong bigram shape. Gram stream from the same spec-pinned
    * [[charGrams]] generator every shingle operator uses (truncated
    * prefix for 1-char docs).
    *
    * Scale: per-doc gram counts map-side combine BEFORE the lang
    * join, so the lang-keyed shuffle carries ≤ |docs|·|distinct
    * bigrams per doc| rows, never the raw character stream; final
    * rollup is ≤ |langs| keys. */
  def charBigramEntropy(docs: DataFrame): DataFrame = {
    val dc = charGrams(docs, 2)
      .groupBy("doc_id", "sh").agg(count(lit(1)).as("c"))
    val lc = dc.join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .groupBy("lang", "sh").agg(sum("c").as("c"))
    val h = log(col("n_grams").cast("double")) -
      col("slc") / col("n_grams").cast("double")
    lc.groupBy("lang")
      .agg(sum("c").cast("long").as("n_grams"),
        count(lit(1)).cast("long").as("distinct_grams"),
        sum(col("c").cast("double") * log(col("c").cast("double")))
          .as("slc"))
      .select(col("lang"), col("n_grams"), col("distinct_grams"),
        round(h, 6).as("entropy"),
        round(when(col("distinct_grams") > 1L,
          h / log(col("distinct_grams").cast("double"))), 6)
          .as("entropy_norm"))
      .orderBy("lang")
  }

  def charsetProfile(docs: DataFrame): DataFrame = {
    val f = docs.select(col("source"),
      length(col("text")).cast("long").as("chars"),
      regexp_count(col("text"), lit("[A-Za-z]")).cast("long").as("letters"),
      regexp_count(col("text"), lit("[0-9]")).cast("long").as("digits"),
      regexp_count(col("text"), lit(" ")).cast("long").as("spaces"),
      regexp_count(col("text"), lit("[^\\x00-\\x7F]")).cast("long")
        .as("nonascii"))
    f.groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("chars").as("chars"), sum("letters").as("letters"),
        sum("digits").as("digits"), sum("spaces").as("spaces"),
        sum("nonascii").as("nonascii"))
      .select(col("source"), col("n_docs"), col("chars").cast("long").as("chars"),
        round(col("letters") / col("chars").cast("double"), 6).as("letter_frac"),
        round(col("digits") / col("chars").cast("double"), 6).as("digit_frac"),
        round(col("spaces") / col("chars").cast("double"), 6).as("space_frac"),
        round((col("chars") - col("letters") - col("digits") - col("spaces") -
          col("nonascii")) / col("chars").cast("double"), 6).as("punct_frac"),
        round(col("nonascii") / col("chars").cast("double"), 6)
          .as("nonascii_frac"))
      .orderBy("source")
  }

  /** Deflate compression-ratio quality signal — the zlib screen the
    * Gopher/RefinedWeb-class pipelines run before training: templated
    * or repetitive text compresses far below natural prose, and a
    * source whose ratios collapse is boilerplate, not language. Per
    * source: doc count, mean/min/max deflate ratio (compressed bytes /
    * UTF-8 bytes, zlib level `level` — deterministic for a fixed JVM
    * zlib) and the share of docs under `repetitiveBelow`.
    *
    * A scalar UDF is the honest implementation here (no Catalyst
    * builtin deflates); the op is a pure per-row CPU map feeding a
    * |sources|-row aggregate — embarrassingly parallel, no shuffle
    * beyond the rollup. DuckDB exposes no deflate, so the driver
    * records the rows-only check; the kernel is spec-pinned on
    * known-ratio fixtures instead. */
  def compressionRatio(docs: DataFrame, level: Int = 6,
                       repetitiveBelow: Double = 0.35): DataFrame = {
    require(level >= 1 && level <= 9, s"zlib level 1..9, got $level")
    val ratio = udf { (s: String) =>
      val bytes = Option(s).getOrElse("").getBytes("UTF-8")
      if (bytes.isEmpty) 1.0
      else {
        val d = new java.util.zip.Deflater(level, false)
        d.setInput(bytes)
        d.finish()
        val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
        val buf = new Array[Byte](4096)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end()
        out.size.toDouble / bytes.length
      }
    }
    docs.select(col("source"), ratio(col("text")).as("r"))
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        round(avg("r"), 6).as("mean_ratio"),
        round(min("r"), 6).as("min_ratio"),
        round(max("r"), 6).as("max_ratio"),
        sum(when(col("r") < repetitiveBelow, 1L).otherwise(0L))
          .cast("long").as("n_repetitive"))
      .withColumn("repetitive_share",
        round(col("n_repetitive").cast("double") /
          col("n_docs").cast("double"), 6))
      .orderBy("source")
  }
}

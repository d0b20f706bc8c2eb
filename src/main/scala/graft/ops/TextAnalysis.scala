package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (north-star additions beyond the reference — SURVEY §7.3 step 12).
  *
  * Everything is pure `org.apache.spark.sql.functions` — codegen'd, no
  * UDFs, embarrassingly parallel (no shuffle at all: each doc is scored
  * independently, so these run at scan speed on any cluster size).
  *
  * Each helper has an exact DuckDB-SQL twin in SparkEntry.oracleSql; the
  * tokenizers/regexes are chosen so Java-regex (Spark) and RE2 (DuckDB)
  * agree.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text. Empty/whitespace-only text yields
    * an EMPTY array — Java split of "" returns [""], a phantom token that
    * would corrupt counts, ratios and fingerprints downstream. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), w => w =!= "")

  /** BPE-ish subword segmentation: letter runs | digit runs | single
    * punctuation — the standard pre-tokenizer shape. APPROXIMATION: no
    * merges are applied, so counts diverge 20-40% from a trained
    * tokenizer's; use [[bpeTokenCountReal]] when shard budgets / chunk
    * windows must track actual LLM token counts. Kept as the
    * regex-only, oracle-expressible twin (DuckDB shares the regex). */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** REAL byte-pair-encoding token count ([[graft.functions.Bpe]]:
    * GPT-2-style pre-tokenizer + ranked greedy merges, codegen'd
    * expression, shuffle-free). No SQL twin exists (the merge loop is
    * iterative) — verified instead by OpsSpec's cross-check against an
    * independent rank-sequential reference implementation, which the
    * well-ordered merge table makes provably equivalent. */
  def bpeTokenCountReal(spark: org.apache.spark.sql.SparkSession,
                        text: Column): Column = {
    graft.functions.GraftFunctions.register(spark)
    call_function(graft.functions.BpeTokenCount.Name, text)
  }

  /** REAL BPE token array — tokens concatenate back to the exact input
    * text (see [[graft.functions.BpeTokens]]). */
  def bpeTokensReal(spark: org.apache.spark.sql.SparkSession,
                    text: Column): Column = {
    graft.functions.GraftFunctions.register(spark)
    call_function(graft.functions.BpeTokens.Name, text)
  }

  /** TRAIN a BPE merge table on a corpus: ONE scan reduces it to a
    * (distinct pre-token, count) histogram — the same GPT-2
    * pre-tokenizer regex the encoder uses, one shuffle on the word —
    * and the exact merge loop then runs driver-side over the histogram
    * ([[graft.functions.Bpe.train]]): vocabulary-sized work per merge,
    * independent of corpus size, deterministic. `minCount`/`maxWords`
    * bound the driver histogram on open-vocabulary corpora (rare-word
    * pruning — standard trainer practice; the cap picks the most
    * frequent words, ties on the word for determinism). Serialize the
    * result with [[graft.functions.Bpe.toMergesLines]] and apply it at
    * scan speed via [[bpeTokenCountWith]]. */
  def bpeTrain(docs: org.apache.spark.sql.DataFrame, textCol: String,
               nMerges: Int, minCount: Long = 1,
               maxWords: Int = 1 << 20): Seq[(String, String)] = {
    val words = docs
      .select(explode(regexp_extract_all(
        coalesce(col(textCol), lit("")),
        lit(graft.functions.Bpe.PreTokenizerPattern), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    graft.functions.Bpe.train(words, nMerges)
  }

  /** [[bpeTokenCountReal]] under a caller-supplied merge table (standard
    * byte-level merges.txt lines, e.g. from [[bpeTrain]] +
    * `Bpe.toMergesLines`) — the lines travel as a plan literal, compiled
    * to a vocab once at plan time. */
  def bpeTokenCountWith(spark: org.apache.spark.sql.SparkSession,
                        text: Column, mergesLines: Seq[String]): Column = {
    graft.functions.GraftFunctions.register(spark)
    call_function(graft.functions.BpeTokenCountVocab.Name, text,
      lit(mergesLines.mkString("\n")))
  }

  /** Unicode NFC composition of a text column ([[graft.functions.NfcNormalize]]
    * — codegen'd; ASCII/already-normalized rows cost one scan, no copy).
    * Use before hashing/shingling so visually-identical text dedups
    * identically regardless of the crawler's Unicode form. */
  def nfc(spark: org.apache.spark.sql.SparkSession, text: Column): Column = {
    graft.functions.GraftFunctions.register(spark)
    call_function(graft.functions.NfcNormalize.Name, text)
  }

  /** Full text normalization for corpus ingest — the step every curation
    * pipeline runs FIRST so downstream fingerprints/shingles/token counts
    * see one canonical form:
    *   1. Unicode NFC composition ([[nfc]]);
    *   2. line-ending normalization (CRLF / lone CR → LF);
    *   3. strip remaining C0/DEL control chars (tab and LF survive);
    *   4. collapse space/tab runs to a single space;
    *   5. trim outer whitespace.
    * Pure codegen'd expression chain — shuffle-free, scan speed. Patterns
    * avoid backreferences/lookarounds so Java regex (Spark) and RE2
    * (DuckDB twin: `nfc_normalize` + the same `regexp_replace` chain)
    * agree byte-for-byte. */
  def normalizeText(spark: org.apache.spark.sql.SparkSession, text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(nfc(spark, text), "\\r\\n?", "\n"),
        "[\\x00-\\x08\\x0B-\\x1F\\x7F]", ""),
      "[ \\t]+", " "))

  /** Language-ID stopword tables (tiny n-gram heuristic; deterministic
    * priority en > es > de > fr on ties). */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "los", "y", "que", "en"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans"))

  private def stopCount(words: Column, stops: Seq[String]): Column =
    size(filter(words, w => array_contains(array(stops.map(lit): _*), w)))

  /** All four [[Stopwords]] set counts of a PROJECTED lowercase-token
    * column in ONE codegen'd pass ([[graft.functions.StopwordSetCounts]]
    * — word → membership-bitmask hash probe per token, vs one interpreted
    * HOF `filter` walk per set). Order matches [[Stopwords]]; feed the
    * projected result to [[langIdFromCounts]] / [[qualityColumnsFromCounts]]
    * on hot paths (the curation gate runs both). Bit-equal to the HOF
    * formulation — spec-pinned. */
  def stopwordCounts(spark: org.apache.spark.sql.SparkSession,
                     lowerTokens: Column): Column = {
    graft.functions.GraftFunctions.register(spark)
    call_function(graft.functions.StopwordSetCounts.Name, lowerTokens,
      lit(Stopwords.map(_._2.mkString(",")).mkString("|")))
  }

  /** [[langIdFrom]] over a projected [[stopwordCounts]] column. */
  def langIdFromCounts(text: Column, counts: Column): Column =
    langIdCore(text, Stopwords.indices.map(i => counts.getItem(i)))

  /** [[qualityColumnsFrom]] over projected token arrays AND a projected
    * [[stopwordCounts]] column (the English count is `counts[0]`) —
    * no interpreted stopword filter left in the row path. */
  def qualityColumnsFromCounts(text: Column, w: Column, counts: Column): Seq[Column] =
    qualityColumnsCore(text, w, counts.getItem(0))


  /** Heuristic language-ID: CJK chars → zh, else stopword-count argmax.
    *
    * Prefer [[langIdFrom]] with a PROJECTED token column in hot paths:
    * higher-order functions are interpreted and re-evaluate argument
    * subtrees, so the four stopword filters here re-run the
    * split-and-filter tokenizer four times per row. */
  def langId(text: Column): Column = langIdFrom(text, tokens(lower(text)))

  /** [[langId]] over an existing lowercase-token array column (tokenize
    * once in a projection, reference the column here). */
  def langIdFrom(text: Column, lowerTokens: Column): Column =
    langIdCore(text, Stopwords.map { case (_, s) => stopCount(lowerTokens, s) })

  /** The ONE language-decision chain both the HOF and counts-kernel
    * variants share — the tie-break order can never drift between them.
    * `cs` follows [[Stopwords]] order. */
  private def langIdCore(text: Column, cs: Seq[Column]): Column = {
    val Seq(en, es, de, fr) = cs
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(en >= es && en >= de && en >= fr && en > 0, "en")
      .when(es >= de && es >= fr && es > 0, "es")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("unknown")
  }

  /** Per-class character counts via strip-and-diff (identical formula in
    * the DuckDB twin, which needs the 'g' flag on regexp_replace). */
  def charClassCount(text: Column, charClass: String): Column =
    length(text) - length(regexp_replace(text, charClass, ""))

  /** Quality features + a deterministic composite score in [0,1].
    * Prefer [[qualityColumnsFrom]] with projected token columns in hot
    * paths (see [[langId]] — interpreted HOFs re-evaluate per use; this
    * convenience form runs the tokenizer ~6x per row). */
  def qualityColumns(text: Column): Seq[Column] =
    qualityColumnsFrom(text, tokens(text), tokens(lower(text)))

  /** [[qualityColumns]] over existing token / lowercase-token array
    * columns — each tokenizer runs once per row in the caller's
    * projection instead of once per feature. */
  def qualityColumnsFrom(text: Column, w: Column, lowerTokens: Column): Seq[Column] =
    qualityColumnsCore(text, w, stopCount(lowerTokens, Stopwords.head._2))

  /** The ONE feature/score definition both quality variants share — the
    * 0.4/0.4/0.2 weights, rounding and zero-denominator guards (empty
    * docs: score/ratio define to 0 — NULL in default mode,
    * DIVIDE_BY_ZERO under ANSI otherwise) can never drift between the
    * HOF and counts-kernel paths. The duplicated punct subtree inside
    * the score is eliminated by whole-stage codegen's common-
    * subexpression elimination. */
  private def qualityColumnsCore(text: Column, w: Column, stopCnt: Column): Seq[Column] = {
    val charLen = length(text).as("char_len")
    val wordCnt = size(w).as("word_cnt")
    val punct = charClassCount(text, "[.,;:!?]").as("punct_cnt")
    val digits = charClassCount(text, "[0-9]").as("digit_cnt")
    val stopRatio = when(size(w) > 0,
      round(stopCnt.cast("double") / size(w), 6)).otherwise(0.0).as("stop_ratio")
    val score = when(size(w) > 0 && length(text) > 0, round(
      lit(0.4) * least(size(w).cast("double") / 100.0, lit(1.0)) +
        lit(0.4) * (stopCnt.cast("double") / size(w)) +
        lit(0.2) * (lit(1.0) - charClassCount(text, "[.,;:!?]").cast("double") / length(text)),
      6)).otherwise(0.0).as("quality_score")
    Seq(charLen, wordCnt, punct, digits, stopRatio, score)
  }

  /** The eight English words Gopher's rule G7 requires at least two of —
    * a crude but effective "is this actually English prose" signal
    * (Rae et al. 2021, §A1.1.2, public). */
  val GopherRequiredWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The full Gopher document-quality rule suite (Rae et al. 2021 §A1.1.2
    * — the public heuristic filter stack MassiveText/RefinedWeb-style
    * pipelines run): per-document features plus one boolean per rule and
    * the combined `keep`. Complements [[qualityColumnsFrom]] (a composite
    * score) with the named-rule verdicts a curation report needs.
    *
    * Rules (defaults = the paper's):
    *   G1 50 ≤ word count ≤ 100 000
    *   G2 3 ≤ mean word length ≤ 10
    *   G3 symbol-to-word ratio < 0.1  (symbols: '#' chars + '...' runs)
    *   G4 < 90% of lines start with a bullet ('-' or '*')
    *   G5 < 30% of lines end with an ellipsis ('...')
    *   G6 > 80% of words contain at least one alphabetic character
    *   G7 ≥ 2 distinct [[GopherRequiredWords]] present
    *
    * Every rule evaluates as an INTEGER comparison (e.g. G3 as
    * `symbol_cnt * 10 < word_cnt`), so the flags are bit-exact
    * cross-engine by construction — no float threshold can drift; the
    * reported ratio columns are 6-dp display values only. Shuffle-free:
    * one projection at scan speed over PROJECTED token/line arrays
    * (tokenize/split once — the interpreted-HOF re-eval trap).
    *
    * @param text  raw text column
    * @param w     [[tokens]](text) projected once
    * @param lw    [[tokens]](lower(text)) projected once
    * @param lines `split(text, "\n")` projected once */
  def gopherColumnsFrom(text: Column, w: Column, lw: Column, lines: Column): Seq[Column] = {
    val wc = size(w).cast("long")
    // Σ word lengths == chars left after stripping ALL whitespace — an
    // exact identity that avoids an interpreted per-word length fold
    val sumLen = (length(text) - charClassCount(text, "\\s")).cast("long")
    val hashCnt = charClassCount(text, "#").cast("long")
    val ellCnt = ((length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3).cast("long")
    val symCnt = (hashCnt + ellCnt).as("symbol_cnt")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines,
      l => ltrim(l).startsWith("- ") || ltrim(l).startsWith("* "))).cast("long")
    val ellLines = size(filter(lines, l => rtrim(l).endsWith("..."))).cast("long")
    val alphaWords = size(filter(w, x => x.rlike("[A-Za-z]"))).cast("long")
    val reqCnt = GopherRequiredWords
      .map(s => when(array_contains(lw, s), 1L).otherwise(0L))
      .reduce(_ + _)
    val g1 = wc >= 50L && wc <= 100000L
    val g2 = sumLen >= lit(3L) * wc && sumLen <= lit(10L) * wc && wc > 0L
    val g3 = symCnt * 10L < wc
    val g4 = bulletLines * 10L < nLines * 9L
    val g5 = ellLines * 10L < nLines * 3L
    val g6 = alphaWords * 5L > wc * 4L
    val g7 = reqCnt >= 2L
    Seq(
      wc.as("word_cnt"),
      when(wc > 0L, round(sumLen.cast("double") / wc, 6)).otherwise(0.0)
        .as("mean_word_len"),
      when(wc > 0L, round(symCnt.cast("double") / wc, 6)).otherwise(0.0)
        .as("symbol_ratio"),
      when(nLines > 0L, round(bulletLines.cast("double") / nLines, 6)).otherwise(0.0)
        .as("bullet_line_ratio"),
      when(nLines > 0L, round(ellLines.cast("double") / nLines, 6)).otherwise(0.0)
        .as("ellipsis_line_ratio"),
      when(wc > 0L, round(alphaWords.cast("double") / wc, 6)).otherwise(0.0)
        .as("alpha_word_ratio"),
      reqCnt.as("req_word_cnt"),
      g1.as("g1_word_count"), g2.as("g2_mean_word_len"), g3.as("g3_symbol_ratio"),
      g4.as("g4_bullet_lines"), g5.as("g5_ellipsis_lines"), g6.as("g6_alpha_words"),
      g7.as("g7_required_words"),
      (g1 && g2 && g3 && g4 && g5 && g6 && g7).as("gopher_keep"))
  }

  /** HTML → text extraction (regex-grade, the C4/CCNet preprocessing
    * step for crawl corpora): drop script/style payloads and comments,
    * strip tags (→ space, so adjacent words don't fuse), decode the six
    * ubiquitous entities, collapse whitespace. Entity decode runs AFTER
    * tag stripping with `&amp;` LAST — so `&lt;script&gt;` decodes to
    * visible text instead of becoming a strippable tag, and `&amp;lt;`
    * yields the literal `&lt;` (no double decode). Pure codegen'd
    * regexp/replace chain — shuffle-free, scan speed; patterns are
    * backreference-free with non-greedy bodies under `(?is)`, which Java
    * regex and RE2 (DuckDB twin) evaluate identically. Not a DOM parser
    * by design: malformed HTML degrades to extra stripped spans, never an
    * error — the right trade for billions of crawled pages. */
  def stripHtml(text: Column): Column = {
    val noBlocks = Seq("script", "style").foldLeft(text) { (c, tag) =>
      regexp_replace(c, s"(?is)<$tag[^>]*>.*?</$tag>", " ")
    }
    val noTags = regexp_replace(
      regexp_replace(noBlocks, "(?s)<!--.*?-->", " "),
      "<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Character array of a text column, split by CODE POINT. Java regex
    * `.` matches one code point (a surrogate pair is ONE match of length
    * 2; verified: "x𝄞y" yields 3 matches), which agrees with
    * DuckDB's `string_split(text, '')` on valid UTF-8 and with the
    * [[graft.functions.CharEntropyStats]] kernel's codePointAt walk.
    * NOT `split(text, "")`: that splits by UTF-16 code unit, counting
    * each surrogate half separately — on astral text (emoji, U+1D11E) it
    * diverges from both the kernel and the DuckDB twin. `(?s)` keeps
    * newlines matchable; empty text → empty array (`.` never matches
    * empty, so no phantom-'' filter is needed). Project ONCE (the
    * interpreted-HOF re-eval trap). */
  def chars(text: Column): Column =
    regexp_extract_all(text, lit("(?s)."), lit(0))

  /** Character-distribution features over a PROJECTED [[chars]] column —
    * the entropy gibberish/compression filter (binary junk and repeated
    * padding score low-entropy, base64/random noise scores near the
    * uniform maximum; prose sits in a narrow band): total chars, distinct
    * chars, and the Shannon entropy `ln N − (Σ n_c·ln n_c)/N` in nats.
    *
    * Determinism: per-char counts are integers; the float fold runs over
    * the count list sorted ASCENDING, so summation order never depends on
    * char-encounter order or partitioning, and the DuckDB twin replays
    * the identical sorted fold (libm-ulp `ln` drift absorbed by the 6-dp
    * round — the [[lmScore]] discipline). Shuffle-free scan-speed
    * projection; per-row cost is O(distinct·len) interpreted-HOF compares
    * — bounded by the alphabet, not the corpus. */
  def charEntropyColumnsFrom(cs: Column): Seq[Column] = {
    val n = size(cs)
    val dc = array_distinct(cs)
    val counts = sort_array(transform(dc, c => size(filter(cs, x => x === c))))
    val s = aggregate(counts, lit(0.0),
      (acc, cnt) => acc + cnt.cast("double") * log(cnt.cast("double")))
    Seq(n.cast("long").as("n_chars"),
      size(dc).cast("long").as("distinct_chars"),
      when(n > 0, round(log(n.cast("double")) - s / n, 6))
        .otherwise(0.0).as("char_entropy"))
  }

  /** [[charEntropyColumnsFrom]] over a PROJECTED
    * [[graft.functions.CharEntropyStats]] struct column — the codegen'd
    * one-pass kernel (~21× the interpreted HOF formulation, which stays
    * above as the dependency-free reference; OpsSpec pins both paths
    * bit-identical). Project `charEntropyStats(...)` once and pass the
    * column here. */
  def charEntropyStats(spark: org.apache.spark.sql.SparkSession,
                       text: Column): Column = {
    graft.functions.GraftFunctions.register(spark)
    call_function(graft.functions.CharEntropyStats.Name, text)
  }

  def charEntropyColumnsFromStats(st: Column): Seq[Column] = {
    val n = st.getField("n_chars")
    val s = st.getField("sum_nlogn")
    Seq(n.as("n_chars"),
      st.getField("distinct_chars").as("distinct_chars"),
      when(n > 0, round(log(n.cast("double")) - s / n, 6))
        .otherwise(0.0).as("char_entropy"))
  }

  /** Canonical document fingerprint: md5 of whitespace-normalized
    * lowercase text — the exact-dedup key (DuckDB twin: `md5(...)`). */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))).cast("binary"))

  /** PII scrubbing patterns for training-corpus redaction. Ordered:
    * emails BEFORE phone-ish digit runs (an email's digits must not be
    * half-eaten by the phone pattern). Regexes avoid backreferences and
    * lookarounds so Java regex (Spark) and RE2 (DuckDB oracle) agree. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    // local@domain.tld
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    // IPv4 (byte-range checks left to consumers; redaction over-matches
    // rather than leaking)
    ("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    // phone-ish: optional +country, separators, 7+ digits total
    ("\\+?[0-9][0-9()\\[\\]. -]{5,}[0-9]", "<PHONE>"))

  /** Redact emails / IPv4s / phone-like digit runs — the standard PII
    * scrub before corpus release. Pure codegen'd `regexp_replace` chain:
    * shuffle-free, runs at scan speed; patterns applied in [[PiiPatterns]]
    * order. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (p, tag)) => regexp_replace(c, p, tag) }

  // ------------------------------------------------ URL / domain filtering

  /** URL pattern shared by extraction and the DuckDB twin. The scheme is
    * case-insensitive ((?i:…) — RFC 3986; 'HTTP://SPAM.BAD' must not slip
    * past a blocklist on casing). No backreferences/lookarounds (Java
    * regex and RE2 agree), no quote or bracket chars (dialect-neutral
    * escaping — the rare URLs containing them lose a suffix, never a
    * prefix, so the extracted DOMAIN is unaffected). */
  val UrlPattern = "(?i:https?)://[A-Za-z0-9._~:/?#@!$&()*+,;=%-]+"

  /** Host capture: skip optional userinfo ('http://evil@spam.bad' must
    * yield spam.bad, not evil — the classic blocklist-evasion form), then
    * capture a dot-separated run of hostname label chars ONLY — adjacent
    * punctuation the URL pattern over-grabs ("http://a.com," in running
    * text) never lands in the domain, and a trailing dot cannot occur by
    * construction (each dot must be followed by a label). The userinfo
    * class excludes '/', so a path '@' never back-extends the skip (and
    * it sticks to SQL-quote-safe chars so the twins embed it verbatim). */
  val HostPattern =
    "(?i:https?)://(?:[A-Za-z0-9._%+:-]*@)?([A-Za-z0-9-]+(?:\\.[A-Za-z0-9-]+)*)"

  /** Distinct (id, domain) per document: every URL's lowercased host —
    * the C4/RefinedWeb curation signal (domain blocklists, per-domain
    * caps, provenance stats). Scan-speed extraction; one shuffle for the
    * per-doc distinct. */
  def extractDomains(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        explode(regexp_extract_all(col(textCol), lit(UrlPattern), lit(0))).as("__url"))
      .select(col(idCol),
        lower(regexp_extract(col("__url"), HostPattern, 1)).as("domain"))
      .filter(col("domain") =!= "")
      .distinct()

  /** Drop documents that link to a blocked domain, with SUFFIX matching
    * (blocking `spam.bad` also blocks `www.spam.bad`) — the semantics
    * every real blocklist assumes. A naive `endswith` join is non-equi
    * (nested-loop at scale); instead each extracted domain explodes into
    * its dot-suffixes (≤ label count, a handful) and equi-joins the
    * blocklist — broadcast by AQE at any realistic blocklist size. The
    * label array is PROJECTED before the suffix lambda so the split runs
    * once per domain, not once per suffix (interpreted-HOF re-eval trap).
    * `blocked`: one `domain` column. */
  def dropBlockedDomains(docs: DataFrame, idCol: String, textCol: String,
                         blocked: DataFrame): DataFrame = {
    val suffixes = extractDomains(docs, idCol, textCol)
      .select(col(idCol), split(col("domain"), "\\.").as("__labels"))
      .select(col(idCol), explode(
        transform(sequence(lit(0), size(col("__labels")) - 1),
          i => array_join(slice(col("__labels"), i + 1, size(col("__labels")) - i), "."))
      ).as("domain"))
    val bad = suffixes.join(blocked.select(col("domain")), Seq("domain"))
      .select(col(idCol)).distinct()
    docs.join(bad, Seq(idCol), "left_anti")
  }

  /** C4-style per-domain document cap: keep at most `maxPerDomain` docs
    * per linked domain — the anti-SEO-farm / anti-mirror volume control
    * every crawl pipeline runs (unchecked, one boilerplate-heavy host can
    * dominate a source). A doc's PRIMARY domain is its lexicographically
    * smallest extracted host (deterministic for multi-link docs); within
    * a domain the `maxPerDomain` smallest doc ids survive. Docs with no
    * URL are never capped.
    *
    * Distributed shape: the (doc, primary-domain) table is ≪ corpus
    * (docs-with-URLs rows); the rank window partitions by domain (skew =
    * the biggest single host's doc count — exactly what the cap
    * removes); the loser list anti-joins back. The corpus itself is
    * scanned once for extraction and once for the anti-join. */
  def capPerDomain(docs: DataFrame, idCol: String, textCol: String,
                   maxPerDomain: Int): DataFrame = {
    require(maxPerDomain >= 1, s"maxPerDomain must be >= 1: $maxPerDomain")
    val primary = extractDomains(docs, idCol, textCol)
      .groupBy(idCol).agg(min("domain").as("__primary"))
    val w = Window.partitionBy("__primary").orderBy(col(idCol))
    val losers = primary
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") > maxPerDomain)
      .select(col(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** All word k-grams of a text column, duplicates INCLUDED (k = 1 is the
    * raw word list, for word-level shingling), built by zipping the word
    * array with its own shifted slices. Shape
    * matters: an `element_at(w, i+d)` lambda would re-evaluate the `split`
    * regex per ELEMENT in interpreted higher-order-function mode (profiled
    * ~15 s for 5k docs); `zip_with` evaluates each array argument once per
    * ROW. zip_with pads the shorter side with nulls and `concat` propagates
    * them, so trailing partial grams drop out in the filter — docs with
    * fewer than k words (or NULL text) yield an empty array.
    * [[Dedup.shingles]] is the distinct view. */
  def wordNgrams(text: Column, k: Int): Column = {
    require(k >= 1, s"k must be >= 1: $k")
    if (k == 1) return tokens(coalesce(text, lit(""))) // phantom-""-free words
    // total on NULL text (→ empty array, like a doc below k words): a null
    // would otherwise propagate to null sizes where the SQL twins define 0
    val w = split(trim(coalesce(text, lit(""))), "\\s+")
    val grams = (1 until k).foldLeft(w) { (acc, d) =>
      zip_with(acc, slice(w, d + 1, 1 << 28), (a, b) => concat(a, lit(" "), b))
    }
    filter(grams, g => g.isNotNull)
  }

  /** [[wordNgrams]] through the codegen'd one-pass kernel
    * ([[graft.functions.WordNgrams]] — splits once with the same
    * compiled `\s+` pattern the SQL `split` uses, then StringBuilder
    * gram assembly; bit-identical output, property-pinned). Registers on
    * the ACTIVE session; on a thread without one (never the case in
    * normal driver code) it falls back to the HOF reference — same
    * result, interpreted speed. Prefer this in every hot path; the HOF
    * stays as the dependency-free reference implementation. */
  def wordNgramsFast(text: Column, k: Int): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(sp) =>
        graft.functions.GraftFunctions.register(sp)
        call_function(graft.functions.WordNgrams.Name,
          coalesce(text, lit("")), lit(k))
      case None => wordNgrams(text, k)
    }

  /** Intra-document repetition features over a PROJECTED k-gram column
    * (project [[wordNgrams]] once — a multi-referenced non-cheap
    * projection survives CollapseProject, so the gram build runs once per
    * row): total grams, distinct grams, and the duplicated-gram ratio
    * `1 - distinct/total` — the Gopher/RefinedWeb-style repetition
    * quality rule (repetitive boilerplate → ratio near 1). Shuffle-free. */
  def repetitionColumnsFrom(grams: Column): Seq[Column] = {
    val total = size(grams)
    val distinct = size(array_distinct(grams))
    Seq(total.cast("long").as("total_grams"),
      distinct.cast("long").as("distinct_grams"),
      when(total > 0,
        round(lit(1.0) - distinct.cast("double") / total, 6))
        .otherwise(0.0).as("dup_ratio"))
  }

  /** Benchmark decontamination: all (training doc, benchmark doc) pairs
    * sharing at least `minShared` DISTINCT word k-grams — the standard
    * train/eval overlap check before a corpus ships (flagged docs get
    * dropped or their benchmark hits masked).
    *
    * Distributed shape: the benchmark side is tiny (eval sets), so its
    * exploded distinct grams BROADCAST — the training corpus streams
    * through a broadcast hash join at scan speed with NO shuffle; the only
    * shuffle is the pair-count aggregate, whose input is the hit set, not
    * the corpus. Ultra-common grams amplify hits bounded by the benchmark
    * side's gram count (cap k high enough — 8-grams in practice — that
    * boilerplate grams are rare). The broadcast is gated on the actual
    * benchmark gram count (`maxBroadcastGrams`): an oversized "benchmark"
    * side degrades to a shuffle join instead of failing on the broadcast
    * limit or OOMing the driver. */
  def benchmarkOverlap(docs: DataFrame, bench: DataFrame,
                       idCol: String, textCol: String,
                       k: Int, minShared: Long = 1L,
                       maxBroadcastGrams: Long = 4000000L): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession) // grams use graft_word_ngrams
    def grams(df: DataFrame, out: String) = df.select(col(idCol).as(out),
      explode(array_distinct(wordNgramsFast(col(textCol), k))).as("g"))
    val bg = grams(bench, "bench_id")
    // bg is scope-cached, so the gating count and the join read one
    // materialization; released once the (small) hit set materializes
    Caching.scoped(bg) {
      val right = if (bg.count() <= maxBroadcastGrams) broadcast(bg) else bg
      grams(docs, "doc_id")
        .join(right, "g")
        .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= minShared)
        .orderBy("doc_id", "bench_id")
    }
  }

  /** Corpus vocabulary: the top-V terms by total frequency (term-asc
    * tiebreak) among terms appearing in at least `minDf` documents — the
    * tokenizer-training / vocabulary-pruning step of a data pipeline.
    * Output `(term, tf, df)` ordered by (tf desc, term).
    *
    * Distributed shape: one shuffle on (term, doc) for per-doc counts
    * (map-side combined), one on term for the totals, then the global
    * top-V lowers to TakeOrderedAndProject — each task keeps its own V
    * candidates and only those reach the driver-side merge, so the full
    * term table never gathers anywhere. No single-partition window. */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String,
                 minDf: Long, topV: Int): DataFrame =
    termDocCounts(docs, idCol, textCol)
      .groupBy("term").agg(sum("tf").as("tf"), count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .orderBy(col("tf").desc, col("term"))
      .limit(topV)

  /** Distinct-(doc, term) counts shared by [[vocabulary]] and
    * [[tfIdfTopTerms]]: tokenize + lower + explode once, then ONE
    * map-side-combined shuffle on (doc_id, term) → `(doc_id, term, tf)`.
    * Per-term document frequency (row count per term) and corpus term
    * frequency (sum of tf per term) both derive from this table, so a
    * tokenizer or null-handling change lands in every consumer at once. */
  private def termDocCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Per-document top-k terms by TF-IDF — keyword extraction / topical
    * fingerprinting for corpus curation. Scoring uses the RATIONAL idf
    * `(N+1)/(df+1)` (monotone in the classic `ln`-idf): every operand is
    * integer-derived and IEEE division/multiplication are correctly
    * rounded, so Spark and the DuckDB oracle agree BIT-EXACTLY — an `ln`
    * would differ by libm ulps and could flip near-tie rankings.
    *
    * Distributed shape (the 100 TB path): one shuffle for per-doc term
    * counts, one for document frequencies, a term-keyed join back (terms
    * ≪ corpus; skew on ultra-common terms is bounded because df rows are
    * unique per term), a broadcast of the single-row corpus count, and a
    * per-doc window for top-k. No driver-side data.
    *
    * @param k    terms kept per document
    * @return (doc_id, term, score, rank), rank 1..k by score desc with
    *         term-asc tiebreak (deterministic) */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    // scope-cached: df derives from tf and the score join consumes tf
    // again — without it the corpus tokenizes+explodes once per consumer
    // (AQE does NOT reuse the exchange across the differently-shaped
    // subtrees; verified in the physical plan). Rows = distinct
    // (doc, term) pairs, released once the top-k output materializes
    val tf = termDocCounts(docs, idCol, textCol)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    Caching.scoped(tf)(
      tf.join(df, "term")
        .crossJoin(broadcast(n))
        .withColumn("score",
          col("tf").cast("double") * ((col("n") + lit(1.0)) / (col("df") + lit(1.0))))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select(col("doc_id"), col("term"), round(col("score"), 6).as("score"), col("rank"))
        .orderBy("doc_id", "rank"))
  }

  /** Bigram language-model scoring: train add-k-smoothed bigram
    * statistics on `train`, score every `target` document by its average
    * per-bigram log-probability and perplexity — the CCNet-style
    * "perplexity under a reference LM" quality filter (score the crawl
    * against a trusted-corpus model; low-probability docs are gibberish,
    * high-probability docs are boilerplate — both tails get reviewed).
    *
    * Model: P(w2|w1) = (c(w1 w2) + k) / (c(w1) + k·V), V = train vocab
    * size; unseen contexts/bigrams coalesce to 0 and still smooth. Docs
    * with fewer than 2 tokens keep a row with NULL scores (`n_bigrams`
    * 0) — dropping them silently would misread as "filtered by quality".
    *
    * Determinism: each position's log-probability is one `ln` of an
    * integer-derived rational (bit-stable mod libm ulps, absorbed by the
    * 6-dp round of the AVERAGE); the per-doc total folds a
    * position-SORTED array left-to-right, so float summation order never
    * depends on partitioning — the DuckDB twin replays the same ordered
    * fold. Collecting a doc's bigram list is bounded by the doc itself
    * (the text column was already in one row).
    *
    * Distributed shape (the 100 TB path): count tables are one shuffle
    * each over the train corpus (map-side combined); the score path joins
    * target positions to the bigram/context tables on their keys — count
    * tables are vocab-bounded, far smaller than the corpus, and AQE
    * broadcasts them when they fit (`minCount` prunes the bigram tail at
    * scale: pruned bigrams score as unseen, the standard trade). One
    * final shuffle on doc id for the fold. */
  def lmScore(train: DataFrame, target: DataFrame, idCol: String,
              textCol: String, addK: Double = 0.5,
              minCount: Long = 1L): DataFrame = {
    require(addK > 0, s"addK must be > 0: $addK")
    // r16 (guide §2.4 remove shuffles): the per-position pipeline
    // (posexplode → count-table joins → addKLogProb → pos-sorted fold)
    // is collapsed into ONE in-row kernel pass per document
    // ([[graft.functions.BigramLmFold]] — bit-parity argument there).
    // The corpus-sized position stream never materializes: no explode,
    // no per-position join rows, no doc-keyed fold shuffle. The count
    // tables — vocab-bounded, exactly what the join formulation already
    // broadcast — ride in as one broadcast row of sorted lookup arrays.
    // One doc id = one input row = one output row (the id-uniqueness
    // contract every caller already holds).
    val model = modelArraysRow(train, textCol, "", minCount)
    val res = target.select(col(idCol).as("doc_id"),
        wordNgramsFast(lower(col(textCol)), 2).as("__g"))
      .crossJoin(broadcast(model))
      .withColumn("__r", call_function(graft.functions.BigramLmFold.Name,
        col("__g"), col("__bk"), col("__bc"), col("__uk"), col("__uc"),
        lit(addK)))
    val n = col("__r").getField("n_bigrams")
    val total = col("__r").getField("total")
    res.select(col("doc_id"),
        n.as("n_bigrams"),
        round(total / n, 6).as("avg_logprob"),
        round(exp(-(total / n)), 6).as("perplexity"))
      .orderBy("doc_id")
  }

  /** CCNet-style head/middle/tail perplexity bucketing over [[lmScore]]
    * output — the quality-stratification step that routes "head" (most
    * fluent) data to training and "tail" to inspection/drop. Tertile
    * thresholds are computed over perplexity in integer MICRO-UNITS:
    * perplexity is already 6-dp rounded, so `*1e6` round-trips exactly,
    * and integer inputs are what makes exact `percentile`'s interpolation
    * bit-identical cross-engine (same rationale as [[Corpus.sourceStats]]).
    * Docs with no score (< 2 tokens) land in an `na` bucket.
    *
    * Distributed shape: one percentile aggregate → a 1-row threshold
    * table broadcast back onto the scored stream — no corpus-wide sort,
    * no global window, which is exactly why thresholds-from-percentile
    * beats `ntile(3)` at 100 TB. Two caveats the caller owns: (a) `scored`
    * feeds BOTH the threshold aggregate and the output stream — persist
    * it (the driver entries wrap it in `Caching.scoped`) or the upstream
    * scoring plan runs twice; (b) exact `percentile`'s buffer is one
    * counter per distinct micro-unit value on a single reducer — fine
    * while scores cluster (they do: 6-dp perplexities of same-language
    * text repeat heavily), but for a genuinely unbounded score domain
    * swap in `approx_percentile`, trading the oracle for a bounded
    * sketch (the same trade [[Corpus.sourceStats]] documents).
    *
    * Interpolated thresholds stay bit-identical cross-engine on integer
    * inputs: Spark's `percentile` and DuckDB's `quantile_cont` both
    * evaluate `lower*(1-g) + higher*g` (verified empirically on
    * ulp-distinguishing inputs — the `lower+(higher-lower)*g` form
    * differs in the last bit and is used by NEITHER engine). */
  def perplexityBuckets(scored: DataFrame): DataFrame = {
    val s = scored.withColumn("__ppl_int",
      round(col("perplexity") * 1e6).cast("long"))
    val th = s.filter(col("__ppl_int").isNotNull)
      .agg(expr("percentile(__ppl_int, array(1D/3, 2D/3))").as("__t"))
      .select(col("__t").getItem(0).as("__t1"), col("__t").getItem(1).as("__t2"))
    s.crossJoin(broadcast(th))
      .withColumn("ppl_bucket",
        when(col("__ppl_int").isNull, lit("na"))
          .when(col("__ppl_int") <= col("__t1"), lit("head"))
          .when(col("__ppl_int") <= col("__t2"), lit("middle"))
          .otherwise(lit("tail")))
      .drop("__ppl_int", "__t1", "__t2")
  }

  /** [[perplexityBuckets]] with per-GROUP thresholds — CCNet proper
    * buckets per language, and quality gates calibrate per source, so the
    * tertile boundaries come from a `groupBy(groupCol)` percentile
    * aggregate (one bounded shuffle, #groups rows) joined back onto the
    * stream (broadcast at any realistic group count). Docs without a
    * threshold row land in `na`: the unscored (NULL-perplexity) ones, and
    * scored docs whose GROUP key is NULL — the equi-join never matches a
    * NULL key, and classifying them into `tail` (the drop pile) with no
    * thresholds at all would be silent data loss. Same double-consumption
    * caveat as [[perplexityBuckets]]: persist `scored`. */
  def perplexityBucketsBy(scored: DataFrame, groupCol: String): DataFrame = {
    val s = scored.withColumn("__ppl_int",
      round(col("perplexity") * 1e6).cast("long"))
    val th = s.filter(col("__ppl_int").isNotNull)
      .groupBy(groupCol)
      .agg(expr("percentile(__ppl_int, array(1D/3, 2D/3))").as("__t"))
      .select(col(groupCol), col("__t").getItem(0).as("__t1"),
        col("__t").getItem(1).as("__t2"))
    s.join(broadcast(th), Seq(groupCol), "left")
      .withColumn("ppl_bucket",
        when(col("__ppl_int").isNull || col("__t1").isNull, lit("na"))
          .when(col("__ppl_int") <= col("__t1"), lit("head"))
          .when(col("__ppl_int") <= col("__t2"), lit("middle"))
          .otherwise(lit("tail")))
      .drop("__ppl_int", "__t1", "__t2")
  }

  /** The ONE add-k bigram LM estimator shared by [[lmScore]] and
    * [[dsirWeights]]: unigram context counts (`<p>c1`), bigram counts
    * pruned at `minCount` (`<p>c12` — the knob that keeps the bigram
    * table broadcastable at corpus scale: pruned bigrams score as
    * unseen, the standard trade), and the vocabulary size (`<p>v`).
    * Shared CODE, not convention — a change to tokenization, counting or
    * pruning here moves both operators together, which is what pins the
    * DSIR scaladoc's "every determinism property of lmScore carries
    * over". */
  private def bigramModel(train: DataFrame, textCol: String, p: String,
                          minCount: Long): (DataFrame, DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(train.sparkSession)
    val uni = train.select(explode(tokens(lower(col(textCol)))).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as(p + "c1"))
    val big = train
      .select(explode(wordNgramsFast(lower(col(textCol)), 2)).as("g"))
      .groupBy("g").agg(count(lit(1)).as(p + "c12"))
      .filter(col(p + "c12") >= minCount)
    (uni, big, uni.agg(count(lit(1)).as(p + "v")))
  }

  /** [[bigramModel]] collapsed to ONE row of sorted lookup arrays for the
    * in-row [[graft.functions.BigramLmFold]] kernel:
    * `(<p>__bk, <p>__bc, <p>__uk, <p>__uc)` — bigram keys/counts and
    * unigram keys/counts, each key array ascending in Spark's
    * UTF8_BINARY order (`sort_array` over unique keys) to match the
    * kernel's binary search. The vocab size V is `size(<p>__uk)` — the
    * same `count(*)` over the unigram table [[bigramModel]] returns.
    * Memory: these are the vocab-bounded count tables the join
    * formulation already broadcast, gathered once (two single-row
    * aggregates) instead of hash-relation builds per join. */
  private def modelArraysRow(train: DataFrame, textCol: String, p: String,
                             minCount: Long): DataFrame = {
    val (uni, big, _) = bigramModel(train, textCol, p, minCount)
    val u = uni
      .agg(sort_array(collect_list(struct(col("w1"), col(p + "c1")))).as("__s"))
      .select(col("__s").getField("w1").as(p + "__uk"),
        col("__s").getField(p + "c1").as(p + "__uc"))
    val b = big
      .agg(sort_array(collect_list(struct(col("g"), col(p + "c12")))).as("__s"))
      .select(col("__s").getField("g").as(p + "__bk"),
        col("__s").getField(p + "c12").as(p + "__bc"))
    b.crossJoin(u)
  }

  /** The shared add-k log-probability over a joined [[bigramModel]] row:
    * `ln((c12 + k) / (c1 + k·V))` with absent counts as 0. */
  private def addKLogProb(p: String, addK: Double): Column = log(
    (coalesce(col(p + "c12"), lit(0L)).cast("double") + lit(addK)) /
      (coalesce(col(p + "c1"), lit(0L)).cast("double") +
        lit(addK) * col(p + "v").cast("double")))

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection via
    * Importance Resampling" — public): per-document log importance weight
    * `avg-logprob under a TARGET-domain LM − avg-logprob under the
    * RAW-corpus LM`. Docs that look more like the target domain than like
    * the background corpus get positive weights; sampling/thresholding on
    * the weight steers the corpus mix toward the domain. Both models are
    * the [[lmScore]] add-k bigram LM (the paper uses hashed n-gram
    * features; a bigram LM is the same estimator family without the
    * hashing approximation), so every determinism property of
    * [[lmScore]] — ordered folds, 6-dp rounding — carries over, and the
    * weight (a difference of two 6-dp values, re-rounded) is bit-stable
    * cross-engine. Short docs (< 2 tokens) have NULL scores and NULL
    * weight.
    *
    * Distributed shape: one vocab-bounded count-table build per model
    * (one scan of target, one of raw), then ONE position stream over the
    * raw corpus scored under BOTH models in the same joins — not two
    * independent [[lmScore]] passes, which would tokenize and shuffle the
    * raw corpus twice for byte-identical results (the fused fold adds the
    * two lp columns in the same position order as two separate
    * gram-sorted folds, so the outputs are bit-equal by construction). At
    * 100 TB the count tables still broadcast; the only corpus-sized
    * shuffle is the per-doc fold. */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, addK: Double = 0.5,
                  minCount: Long = 1L): DataFrame = {
    require(addK > 0, s"addK must be > 0: $addK")
    graft.functions.GraftFunctions.register(raw.sparkSession)
    // r16: both models' per-position pipelines collapsed into two in-row
    // kernel passes over ONE gram array per document (the lmScore
    // rationale — [[graft.functions.BigramLmFold]]): no posexplode, no
    // 4-way per-position join, no doc-keyed fold shuffle. Each model's
    // count tables ride in as sorted lookup arrays in one broadcast row;
    // add order per model is the array (= pos) order, bit-equal to the
    // two-field pos-sorted fold this replaces.
    val models = modelArraysRow(target, textCol, "t", minCount)
      .crossJoin(modelArraysRow(raw, textCol, "r", minCount))
    def kernel(p: String) = call_function(graft.functions.BigramLmFold.Name,
      col("__g"), col(p + "__bk"), col(p + "__bc"), col(p + "__uk"),
      col(p + "__uc"), lit(addK))
    val res = raw.select(col(idCol).as("doc_id"),
        wordNgramsFast(lower(col(textCol)), 2).as("__g"))
      .crossJoin(broadcast(models))
      .withColumn("__rt", kernel("t"))
      .withColumn("__rr", kernel("r"))
    val n = col("__rt").getField("n_bigrams")
    val tAvg = round(col("__rt").getField("total") / n, 6)
    val rAvg = round(col("__rr").getField("total") / n, 6)
    res.select(col("doc_id"),
      n.as("n_bigrams"),
      tAvg.as("target_lp"), rAvg.as("raw_lp"),
      round(tAvg - rAvg, 6).as("dsir_weight"))
  }

  /** Select the top `keepFraction` of documents by [[dsirWeights]]: the
    * cut is an exact percentile of the weight in integer MICRO-UNITS
    * (6-dp weights × 1e6 round-trip exactly; integer inputs make the
    * interpolated percentile bit-identical cross-engine — the
    * [[perplexityBuckets]] rationale), broadcast back onto the stream.
    * No global sort/row_number: at 100 TB a threshold-broadcast is the
    * only shape that scales, and a boundary TIE admits every tied doc
    * rather than an arbitrary partition-order subset. NULL-weight docs
    * (short texts) are never selected.
    *
    * Caveat (the [[perplexityBuckets]] one): `weights` feeds BOTH the
    * threshold aggregate and the output stream — persist it (the driver
    * entry wraps it in `Caching.scoped`) or the whole two-model DSIR
    * scoring pipeline runs twice. */
  def dsirSelect(weights: DataFrame, keepFraction: Double): DataFrame = {
    require(keepFraction > 0 && keepFraction < 1,
      s"keepFraction must be in (0,1): $keepFraction")
    val wi = weights.withColumn("__w_int",
      round(col("dsir_weight") * 1e6).cast("long"))
    val th = wi.filter(col("__w_int").isNotNull)
      .agg(expr(s"percentile(__w_int, CAST(${1 - keepFraction} AS DOUBLE))")
        .as("__th"))
    wi.crossJoin(broadcast(th))
      .withColumn("selected",
        col("__w_int").isNotNull && col("__w_int") >= col("__th"))
      .drop("__w_int", "__th")
  }

  /** Overlapping character n-grams from a PROJECTED [[chars]] array
    * column (project the char array once, then call this on the
    * attribute — the interpreted-HOF re-eval trap). A chain of
    * single-pass `zip_with`s over n shifted slices, never
    * element_at-in-lambda. Code-point grams (via [[chars]]), so CJK
    * text grams correctly. */
  def charNgramsFrom(chArr: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1: $n")
    when(size(chArr) < n, array().cast("array<string>"))
      .otherwise((1 until n).foldLeft(slice(chArr, lit(1), size(chArr) - (n - 1))) {
        (acc, j) => zip_with(acc,
          slice(chArr, lit(1 + j), size(chArr) - (n - 1)),
          (x, y) => concat(x, y))
      })
  }

  /** Overlapping character bigrams — [[charNgramsFrom]] at n = 2. */
  def charBigramsFrom(chArr: Column): Column = charNgramsFrom(chArr, 2)

  /** Character n-grams of a TEXT column through the codegen'd one-pass
    * kernel ([[graft.functions.CharNgrams]], `graft_char_ngrams`) — the
    * langid-model hot path; bit-identical to
    * `charNgramsFrom(chars(text), n)` (OpsSpec pins kernel == HOF incl.
    * astral chars). Falls back to the HOF formulation when no session is
    * active to register on. */
  def charNgramsFast(text: Column, n: Int): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(sp) =>
        graft.functions.GraftFunctions.register(sp)
        call_function(graft.functions.CharNgrams.Name,
          coalesce(text, lit("")), lit(n))
      case None => charNgramsFrom(chars(coalesce(text, lit(""))), n)
    }

  /** Character bigrams of a TEXT column — [[charNgramsFast]] at n = 2. */
  def charBigramsFast(text: Column): Column = charNgramsFast(text, 2)

  /** Per-row character-n-gram COUNTS (`array<struct<gram, cnt>>`, one
    * entry per distinct gram, first-occurrence order) through the
    * codegen'd one-pass kernel [[graft.functions.CharNgramCounts]] — the
    * in-row form of `explode(charNgramsFast) → groupBy → count` (r15,
    * guide §2.3 "aggregate before you shuffle" taken to the row): the
    * model scorers need per-(doc, gram) counts, and counting inside the
    * row removes the corpus-sized occurrence explode + hash aggregate
    * that profiling showed dominating both model entries' CPU. Falls
    * back to the interpreted HOF formulation (array_distinct preserves
    * first-occurrence order; per-gram filter count) when no session is
    * active — same result, reference speed; OpsSpec pins the two paths
    * and the Σcnt == occurrence-count identity. */
  def charNgramCountsFast(text: Column, n: Int): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(sp) =>
        graft.functions.GraftFunctions.register(sp)
        call_function(graft.functions.CharNgramCounts.Name,
          coalesce(text, lit("")), lit(n))
      case None =>
        val g = charNgramsFrom(chars(coalesce(text, lit(""))), n)
        transform(array_distinct(g), x => struct(x.as("gram"),
          size(filter(g, y => y === x)).cast("long").as("cnt")))
    }

  /** Train a character-n-gram language-ID model: per-(language, n, gram)
    * counts from a LABELED corpus, one scan per gram size + one
    * vocab-bounded shuffle. This is the public fastText/CCNet-shaped
    * upgrade over the 4-language stopword heuristic [[langId]]:
    * character n-gram statistics distinguish any language pair given
    * labeled training text (accented letters, CJK ranges, orthographic
    * digraphs), so the curation gate can stratify beyond the stopword
    * list's languages. The default `ns = Seq(2, 3)` trains bigram AND
    * trigram LMs (fastText proper uses subword 2-5-grams): trigrams are
    * far more discriminative on short and mixed-script docs, while the
    * bigram LM keeps contributing evidence when a doc is too short to
    * gram at 3 — the backoff [[langIdModelScore]] interpolates. Model
    * size is vocab-bounded (≤ #langs × Σ #distinct-n-grams rows) —
    * broadcastable at any corpus scale. */
  def langIdModelTrain(train: DataFrame, textCol: String,
                       langCol: String, ns: Seq[Int] = Seq(2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1) && ns.distinct == ns,
      s"ns must be non-empty, distinct, >= 1: $ns")
    graft.functions.GraftFunctions.register(train.sparkSession)
    // in-row gram counting (r15): the aggregate's input shrinks from
    // every gram OCCURRENCE to distinct-grams-per-doc, and Σcnt over
    // those equals the old occurrence count exactly (guide §2.3)
    ns.map { n =>
      train.select(col(langCol).as("lang"), lit(n).as("n"),
        explode(charNgramCountsFast(lower(col(textCol)), n)).as("gc"))
    }.reduce(_ unionByName _)
      .select(col("lang"), col("n"), col("gc").getField("gram").as("gram"),
        col("gc").getField("cnt").as("cnt"))
      .groupBy("lang", "n", "gram").agg(sum("cnt").as("c"))
  }

  /** Score documents against a [[langIdModelTrain]] model: predicted
    * language = argmax over languages of the SUMMED add-k-smoothed
    * log-likelihoods across the model's gram sizes,
    * `Σ_n Σ_g cnt(g)·ln((c(lang,n,g)+k)/(tot(lang,n)+k·V_n))` — equal-
    * weight log-linear interpolation: a doc too short to gram at the
    * larger n simply contributes no terms there and is judged on the
    * smaller-n evidence (the backoff that stops very short docs from
    * flipping), while docs long enough get the sharper trigram margins
    * on top.
    *
    * Determinism: each per-(doc, lang, n, gram) log-likelihood term is
    * rounded to INTEGER MICRO-UNITS and the per-(doc, lang) total is a
    * long sum — integer addition is order-independent, so the score (and
    * the argmax) never depends on partitioning, with no per-group list
    * materialization (the [[dsirSelect]] discipline; r8 — replaces the
    * earlier sorted-collect_list fold, which built an O(#grams) array
    * per (doc, lang) group and evaluated its sum interpreted). The
    * argmax breaks exact micro-unit ties by language name via struct
    * ordering. Docs with no grams at any trained size predict
    * `unknown`.
    *
    * Distributed shape (the 100 TB path): the vocab-bounded model is
    * scope-cached ONCE — per-language totals, per-n vocabulary sizes and
    * the trained sizes all derive from the cache, so the training corpus
    * is never rescanned per derived table; gram extraction at scan
    * speed; one shuffle on (doc, n, gram) to dedupe counts; then two
    * doc-sized shuffles (doc×lang fold, argmax). Nothing rescans the
    * target per language — #langs multiplies only the post-dedup gram
    * rows. Returns a persisted handle (Caching.scoped contract). */
  def langIdModelScore(model: DataFrame, target: DataFrame, idCol: String,
                       textCol: String, addK: Double = 0.5): DataFrame =
    modelScore(model, target, idCol, textCol, addK, outCol = "pred_lang")

  /** Shared scorer behind [[langIdModelScore]] / [[qualityModelScore]]:
    * the prediction column is named INSIDE the scoped block, so the
    * returned persisted handle is the plan the caller unpersists — a
    * rename wrapper on top would make the caller's `unpersist()` a
    * silent no-op and leak the cached score table per call. */
  private def modelScore(model: DataFrame, target: DataFrame, idCol: String,
                         textCol: String, addK: Double, outCol: String): DataFrame = {
    require(addK > 0, s"addK must be > 0: $addK")
    graft.functions.GraftFunctions.register(target.sparkSession)
    Caching.scoped(model) {
      val ns = model.select("n").distinct().collect().map(_.getInt(0)).sorted.toSeq
      require(ns.nonEmpty, "langIdModelScore: model has no gram sizes (empty model)")
      // r16 (guide §2.4, the BigramLmFold rationale scaled up): the old
      // scoring stream exploded every (doc, n, gram) count row, CROSSED
      // it with every language (the langTot join — #langs× row
      // amplification), ran two broadcast joins per row, then shuffled
      // the (doc, lang) micro-sums twice (fold + argmax). All of that
      // collapses into per-row kernels: `graft_ngram_lm_scores` walks
      // the doc's in-row gram counts once per language against the
      // model's sorted lookup arrays — including the COMPLETED (lang, n)
      // grid: a language with no training rows at some gram size still
      // pays the smoothed penalty cnt·ln(addK/(0+addK·V_n)) via its
      // empty key array and zero total, exactly like the old
      // grid-completing left join — and `graft_lm_argmax` adds the
      // per-size micro sums (long addition, order-free) and replicates
      // `max(struct(micro, lang))` tie-breaking. Terms are the same
      // multiset through the same IEEE tree and the same per-term
      // micro-unit rounding (kernel scaladoc), so scores and argmax are
      // bit-identical (spec- and oracle-pinned). The model rides in as
      // ONE broadcast row of per-size arrays — the same vocab-bounded
      // payload the old path broadcast three ways.
      val langsRow = model.select("lang").distinct()
        .agg(sort_array(collect_list(col("lang"))).as("__langs"))
      val emptyK = array().cast("array<string>")
      val emptyC = array().cast("array<bigint>")
      val modelRow = ns.map { n =>
        val atN = model.filter(col("n") === n)
        val byLang = atN.groupBy("lang")
          .agg(sort_array(collect_list(struct(col("gram"), col("c")))).as("__kc"),
            sum("c").as("__tot"))
          .select(col("lang"), col("__kc").getField("gram").as("__k"),
            col("__kc").getField("c").as("__c"), col("__tot"))
        val grid = model.select("lang").distinct()
          .join(byLang, Seq("lang"), "left")
          .select(col("lang"), coalesce(col("__k"), emptyK).as("__k"),
            coalesce(col("__c"), emptyC).as("__c"),
            coalesce(col("__tot"), lit(0L)).as("__tot"))
        val packed = grid
          .agg(sort_array(collect_list(struct(col("lang"), col("__k"),
            col("__c"), col("__tot")))).as("__g"))
          .select(col("__g").getField("__k").as(s"__k$n"),
            col("__g").getField("__c").as(s"__c$n"),
            col("__g").getField("__tot").as(s"__t$n"))
        val vN = atN.agg(count_distinct(col("gram")).as(s"__v$n"))
        packed.crossJoin(vN)
      }.foldLeft(langsRow)(_ crossJoin _)
      val base = target.select(col(idCol).as("doc_id") +:
        ns.map(n => charNgramCountsFast(lower(col(textCol)), n).as(s"__gc$n")): _*)
      val scoreArrs = ns.map(n => call_function(graft.functions.NgramLmScores.Name,
        col(s"__gc$n"), col(s"__k$n"), col(s"__c$n"), col(s"__t$n"),
        col(s"__v$n"), lit(addK)))
      val hasGrams = ns.map(n => size(col(s"__gc$n")) > 0).reduce(_ || _)
      // gate BEFORE the argmax: a doc with no grams at any size produced
      // no scoring rows in the join formulation (→ NULL best → unknown),
      // while the kernels would hand it an all-zero argmax
      val best = when(hasGrams,
        call_function(graft.functions.LmArgmax.Name,
          array(scoreArrs: _*), col("__langs")))
      base.crossJoin(broadcast(modelRow))
        .withColumn("__m", best)
        .select(col("doc_id"),
          coalesce(col("__m").getField("lang"), lit("unknown")).as(outCol),
          round(col("__m").getField("micro") / 1e6, 6).as("score"))
    }
  }

  /** fastText-style supervised QUALITY classifier — the DCLM / CCNet
    * "model-based quality filtering" step (train on known-good vs
    * known-bad text, gate the crawl on the prediction): the SAME
    * char-n-gram LM machinery as [[langIdModelTrain]], trained on
    * quality labels instead of language labels — one estimator, two
    * gates, which is exactly how fastText is used in public pipelines
    * (lid.176 for language, a supervised quality head for filtering).
    * `labelCol` holds arbitrary class labels ("good"/"bad"/"adult"/...);
    * everything about scale, smoothing, and backoff carries over. */
  def qualityModelTrain(train: DataFrame, textCol: String, labelCol: String,
                        ns: Seq[Int] = Seq(2, 3)): DataFrame =
    langIdModelTrain(train, textCol, labelCol, ns)

  /** Score documents against a [[qualityModelTrain]] model — argmax
    * interpolated add-k log-likelihood over the label set, exactly
    * [[langIdModelScore]] with the prediction column named for its
    * meaning. Returns `(doc_id, pred_label, score)`; a persisted handle
    * (Caching.scoped contract). */
  def qualityModelScore(model: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, addK: Double = 0.5): DataFrame =
    modelScore(model, target, idCol, textCol, addK, outCol = "pred_label")

  /** BM25 keyword retrieval: top-`topK` documents for a bag-of-terms
    * query under Okapi BM25 (Lucene's `ln(1 + (N-df+0.5)/(df+0.5))` idf,
    * `k1`/`b` length normalization) — the eval-set mining / targeted-
    * inspection primitive of a curation pipeline ("show me the docs that
    * look most like this benchmark prompt").
    *
    * Only documents containing at least one query term are scored
    * (retrieval semantics; absent terms contribute 0 via the missing
    * pivot cell). Scores are summed over a FIXED per-term column order —
    * one conditional-aggregation column per query term — not a float
    * `sum()` over shuffled rows, so the total is bit-deterministic and
    * the DuckDB twin can replay the identical expression tree. Ranking
    * uses the ROUNDED score (6 dp) with doc-id tiebreak so a libm-ulp
    * `ln` difference can never flip the top-K boundary between engines.
    *
    * Distributed shape (the 100 TB path): tokenize at scan speed, filter
    * the exploded stream to the (tiny, plan-literal) query set BEFORE any
    * shuffle — the only shuffled volume is corpus occurrences of query
    * terms. Corpus stats are one two-value aggregate (`sum` of long
    * lengths — exact, order-independent), document frequencies a
    * #query-terms-row table; both broadcast. Top-K lowers to
    * TakeOrderedAndProject: each task keeps K candidates, only those
    * reach the driver merge. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               query: Seq[String], topK: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25TopK: empty query")
    val terms = query.map(_.toLowerCase).distinct
    val toks = docs.select(col(idCol).as("doc_id"),
      tokens(lower(col(textCol))).as("w"))
    val withLen = toks.select(col("doc_id"), col("w"), size(col("w")).as("dl"))
    // N and total token count: longs, so the aggregate is exact and
    // avgdl = sdl/N is the same IEEE division on both engines
    val stats = withLen.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
    val hits = withLen
      .select(col("doc_id"), col("dl"), explode(col("w")).as("t"))
      .filter(col("t").isin(terms: _*))
      .groupBy("doc_id", "dl", "t").agg(count(lit(1)).cast("double").as("tf"))
    val dfs = hits.groupBy("t").agg(count(lit(1)).cast("double").as("df"))
    val avgdl = col("sdl").cast("double") / col("n").cast("double")
    val scored = hits.join(broadcast(dfs), "t").crossJoin(broadcast(stats))
      .withColumn("s",
        log(lit(1.0) + (col("n").cast("double") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
          (col("tf") * (lit(k1) + lit(1.0))) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl)))
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("t") === t, col("s"))).as(s"__s$i")
    }
    val pivoted = scored.groupBy("doc_id").agg(perTerm.head, perTerm.tail: _*)
    val total = terms.indices.map(i => coalesce(col(s"__s$i"), lit(0.0))).reduce(_ + _)
    pivoted.select(col("doc_id"), round(total, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(topK)
  }

  // ------------------------------------------------- main-content extraction

  /** Block-level tags that delimit jusText blocks (the public jusText
    * segmentation set; `br`/`hr` included so runs of inline content
    * separated by them become separate blocks). */
  private val BlockTagRe =
    ("(?is)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tfoot|tr|td|th|" +
     "blockquote|pre|form|fieldset|legend|section|article|header|footer|nav|" +
     "aside|main|title|caption|figure|figcaption|address|br|hr)\\b[^>]*>").r

  private val AnchorRe = "(?is)<a\\b[^>]*>(.*?)</a>".r
  private val HeadingTagRe = "(?i)^<h[1-6]\\b".r
  private val AnchorOpenRe = "(?i)<a\\b".r
  private val InlineTagRe = "<[^>]+>".r

  /** Small English function-word set for the stopword-density rule
    * (jusText ships per-language lists; this is the standard top band of
    * English function words — public knowledge, mirrored verbatim in
    * the DuckDB twin). */
  private[graft] val StopwordsEn: Set[String] = Set(
    "the", "of", "and", "a", "to", "in", "is", "it", "you", "that",
    "he", "was", "for", "on", "are", "as", "with", "his", "they", "i",
    "at", "be", "this", "have", "from", "or", "one", "had", "by",
    "not", "but", "what", "all", "were", "we", "when", "your", "can",
    "an", "which", "their", "if", "will", "up", "other", "about",
    "out", "then", "them", "these", "so", "some", "her", "would",
    "there", "been", "has", "more", "its", "who", "did")

  /** One classified jusText block. `cls` is the context-free class
    * (`bad`/`short`/`neargood`/`good`); `kept` is the final verdict
    * after the context-sensitive pass. */
  private[graft] final case class JtBlock(idx: Int, cls: String,
                                          kept: Boolean, text: String)

  /** jusText-style boilerplate classification of one HTML page
    * (Pomikalek 2011, the public algorithm; deterministic simplified
    * variant — every rule below is integer/threshold arithmetic so the
    * oracle twin can replay it):
    *
    *  1. segment on block-level tags;
    *  2. per block: link density (anchor chars / chars), then inline
    *     strip + entity decode + whitespace collapse (the [[stripHtml]]
    *     chain per block);
    *  3. context-free class with the jusText default thresholds —
    *     `bad` if link density > 0.2 or the block carries a copyright
    *     mark; `short` if under 70 chars (but `bad` if a short block
    *     contains a link — link-list fragments); `good` if stopword
    *     density >= 0.32 and over 200 chars; `neargood` if density in
    *     [0.30, 0.32) or a high-density block under 200 chars; `bad`
    *     otherwise;
    *  4. context-sensitive pass: `neargood` promotes to kept when its
    *     NEAREST definite (good/bad) neighbor on either side is good;
    *     `short` needs BOTH nearest definite neighbors good —
    *     EXCEPT short HEADINGS (blocks opened by an h1-h6 tag), which
    *     promote when their NEXT definite neighbor is good (the
    *     jusText heading rule: a title belongs to the content it
    *     introduces, with the distance window simplified to
    *     nearest-definite).
    *
    * Boilerplate (nav link bars, footers, social chrome) classifies
    * `bad` and drops where [[stripHtml]] keeps it — this is the
    * content-vs-chrome stage a crawl corpus needs after tag stripping. */
  private[graft] def justext(html: String): Seq[JtBlock] = {
    if (html == null) return Seq.empty
    // tag-aware segmentation: each segment pairs with the block tag
    // that OPENED it (the delimiter preceding it), so the heading rule
    // can see h1-h6; the pre-first-delimiter prefix has no tag
    val delims = BlockTagRe.findAllMatchIn(html).toVector
    val segments: Seq[(String, String)] =
      if (delims.isEmpty) Seq(("", html))
      else {
        val head = ("", html.substring(0, delims.head.start))
        val rest = delims.zipWithIndex.map { case (m, i) =>
          val end = if (i + 1 < delims.length) delims(i + 1).start else html.length
          (m.matched, html.substring(m.end, end))
        }
        head +: rest
      }
    val cf = segments.flatMap { case (openTag, seg) =>
      val linkChars = AnchorRe.findAllMatchIn(seg)
        .map(m => InlineTagRe.replaceAllIn(m.group(1), " ")
          .replaceAll("\\s+", "").length).sum
      // word boundary: a bare contains("<a") would count <abbr>/<audio>
      // as links (review-caught)
      val hasLink = linkChars > 0 || AnchorOpenRe.findFirstIn(seg).isDefined
      val text = {
        val noTags = InlineTagRe.replaceAllIn(
          seg.replaceAll("(?s)<!--.*?-->", " "), " ")
        val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
          "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
          .foldLeft(noTags) { case (c, (e, r)) => c.replace(e, r) }
        decoded.replaceAll("\\s+", " ").trim
      }
      if (text.isEmpty) None
      else {
        val len = text.length
        val words = text.split(" ")
        val stop = words.count(w =>
          StopwordsEn(w.toLowerCase(java.util.Locale.ROOT)
            .replaceAll("[^a-z]", "")))
        val stopDensity = stop.toDouble / words.length
        val linkDensity = math.min(1.0, linkChars.toDouble / len)
        val lower = text.toLowerCase(java.util.Locale.ROOT)
        val cls =
          if (linkDensity > 0.2) "bad"
          else if (lower.contains("\u00a9") || lower.contains("copyright")) "bad"
          else if (len < 70) { if (hasLink) "bad" else "short" }
          else if (stopDensity >= 0.32) { if (len > 200) "good" else "neargood" }
          else if (stopDensity >= 0.30) "neargood"
          else "bad"
        Some((cls, text, HeadingTagRe.findFirstIn(openTag).isDefined))
      }
    }.toSeq
    // context pass: nearest DEFINITE neighbor classes
    val n = cf.length
    val prevDef = new Array[String](n)
    var last = "bad"
    for (i <- 0 until n) {
      prevDef(i) = last
      if (cf(i)._1 == "good" || cf(i)._1 == "bad") last = cf(i)._1
    }
    val nextDef = new Array[String](n)
    last = "bad"
    for (i <- (n - 1) to 0 by -1) {
      nextDef(i) = last
      if (cf(i)._1 == "good" || cf(i)._1 == "bad") last = cf(i)._1
    }
    cf.zipWithIndex.map { case ((cls, text, heading), i) =>
      val kept = cls match {
        case "good" => true
        case "neargood" => prevDef(i) == "good" || nextDef(i) == "good"
        case "short" if heading => nextDef(i) == "good" // the heading rule
        case "short" => prevDef(i) == "good" && nextDef(i) == "good"
        case _ => false
      }
      JtBlock(i, cls, kept, text)
    }
  }

  /** [[justext]] over a corpus: one row per block with its class and
    * final verdict — the auditable form (a curation pipeline wants to
    * SEE what was cut). Partition-local scan-shaped map, no shuffle. */
  def mainContentBlocks(df: DataFrame, htmlCol: String = "html",
                        idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("block_idx", IntegerType),
      StructField("cls", StringType),
      StructField("kept", BooleanType),
      StructField("text", StringType)))
    val rows = df.select(col(idCol).cast("long"), col(htmlCol)).rdd
      .flatMap { r =>
        val id: java.lang.Long = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
        justext(r.getString(1)).iterator.map(b =>
          Row(id, b.idx, b.cls, b.kept, b.text))
      }
    spark.createDataFrame(rows, schema)
  }

  /** The extracted main content: kept blocks joined by newline — what
    * feeds the downstream text pipeline in place of [[stripHtml]]'s
    * everything-including-chrome output.
    *
    * EVERY input document yields a row (ADVICE r11): a page whose
    * blocks all classify bad/unkept — or that segments to zero blocks —
    * comes back with `main_text = ""`, never silently missing, so a
    * downstream join can tell "no main content" from "document
    * missing" (null ids included — each input row maps to one output
    * row, so nothing can drop).
    *
    * ZERO-SHUFFLE (r12, the r11 verdict's fast-path note): each input
    * row IS one document, and [[justext]] emits its blocks in document
    * order, so the joined text assembles inside the same partition-local
    * pass that classifies — the old blocks→groupBy→join reassembly paid
    * a full shuffle for an order the scan already had. Callers who need
    * per-block audit rows keep [[mainContentBlocks]]. */
  def extractMainContent(df: DataFrame, htmlCol: String = "html",
                         idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("main_text", StringType)))
    val rows = df.select(col(idCol).cast("long"), col(htmlCol)).rdd.map { r =>
      val id: java.lang.Long =
        if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
      val sb = new java.lang.StringBuilder
      justext(if (r.isNullAt(1)) null else r.getString(1)).foreach { b =>
        if (b.kept) {
          if (sb.length > 0) sb.append('\n')
          sb.append(b.text)
        }
      }
      Row(id, sb.toString)
    }
    spark.createDataFrame(rows, schema)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines.
  *
  * Everything here composes built-in (whole-stage-codegen'd) expressions —
  * no Scala UDFs — so the hot path stays inside Tungsten and the same logic
  * is expressible as ANSI SQL for the DuckDB oracle. Content hashing uses
  * md5 (identical across engines) folded to 60-bit / 32-bit integers.
  */
object TextFunctions {

  /** Whitespace tokens. `split` on \s+ after trim; empty string → empty array. */
  def tokensWs(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Whitespace token count. */
  def tokenCountWs(c: Column): Column = size(tokensWs(c))

  /** BPE-ish tokenization: letter runs, digit runs, single non-space symbols.
    * A cheap stand-in for subword tokenizers when estimating token budgets.
    */
  val BpeLikePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def tokenCountBpe(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeLikePattern), lit(0)))

  /** Strip HTML/XML-ish markup from scraped text — the first normalization
    * pass of a web-crawl curation pipeline: tags (`<...>`) are replaced by
    * a space (so `a<br>b` stays two tokens), the six entities that
    * dominate crawled text are decoded ONE level (`&amp;` last, so
    * `&amp;lt;` correctly becomes the literal `&lt;` rather than
    * double-decoding to `<`), runs of whitespace collapse to one space,
    * and the result is trimmed.
    *
    * Deliberately regex-based, not a DOM parse: it is one codegen'd
    * expression chain (no UDF) over arbitrarily malformed input, and the
    * exact same chain replays in the ANSI-SQL oracle. Malformed markup is
    * handled lossily by design: a `<` with no later `>` survives as text,
    * while everything from a `<` to the NEXT `>` is consumed as one tag
    * even if it spans what a browser would render. The whitespace class
    * is spelled `[ \t\n\r]` (not `\s`) because Java and RE2 disagree on
    * `\s`'s vertical-tab membership.
    */
  def stripMarkup(c: Column): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", " ")
    val decoded = replace(
      replace(
        replace(
          replace(
            replace(
              replace(noTags, lit("&lt;"), lit("<")),
              lit("&gt;"), lit(">")),
            lit("&quot;"), lit("\"")),
          lit("&#39;"), lit("'")),
        lit("&nbsp;"), lit(" ")),
      lit("&amp;"), lit("&"))
    trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " "))
  }

  /** Ratio of punctuation/symbol characters to total characters (0 when empty). */
  def punctRatio(c: Column): Column = {
    val punct = size(regexp_extract_all(c, lit("[^A-Za-z0-9\\s]"), lit(0)))
    when(length(c) === 0, lit(0.0))
      .otherwise(punct.cast("double") / length(c).cast("double"))
  }

  /** English-ish stopwords; used for both quality scoring and lang-id. */
  val StopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "by", "at", "from")
  val StopwordsDe: Seq[String] = Seq(
    "der", "die", "das", "und", "oder", "von", "zu", "im", "ist", "es",
    "für", "auf", "mit", "als", "bei", "aus", "ein")
  val StopwordsEs: Seq[String] = Seq(
    "el", "la", "los", "las", "y", "o", "de", "a", "en", "es",
    "por", "con", "como", "para", "del", "un", "una")
  val StopwordsFr: Seq[String] = Seq(
    "le", "la", "les", "et", "ou", "de", "à", "en", "est", "il",
    "pour", "sur", "avec", "comme", "par", "un", "une")

  /** Count of tokens contained in `words` (with multiplicity). */
  def tokenHits(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => array_contains(typedLit(words), t)))

  /** Stopword ratio over whitespace tokens (English list), 0 when no tokens. */
  def stopwordRatio(c: Column): Column = {
    val toks = tokensWs(c)
    when(size(toks) === 0, lit(0.0))
      .otherwise(tokenHits(toks, StopwordsEn).cast("double") / size(toks).cast("double"))
  }

  /** Mean whitespace-token length, 0 when no tokens. Exact int/int division. */
  def meanTokenLen(c: Column): Column = {
    val toks = tokensWs(c)
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: rewards stopword presence and sane
    * token lengths, penalizes symbol soup. Deterministic double arithmetic
    * from exact integer ratios.
    */
  def qualityScore(c: Column): Column = {
    val sw = stopwordRatio(c)
    val pr = punctRatio(c)
    val mtl = meanTokenLen(c)
    val lenOk = when(mtl >= 3.0 && mtl <= 10.0, lit(1.0)).otherwise(lit(0.0))
    least(lit(1.0), greatest(lit(0.0),
      lit(0.4) * least(lit(1.0), sw * 4.0) + lit(0.3) * lenOk + lit(0.3) * (lit(1.0) - pr)))
  }

  /** Heuristic language id: stopword-hit counts per language over whitespace
    * tokens; argmax with fixed precedence (en > de > es > fr > und on ties).
    */
  def langId(c: Column): Column = {
    val s = langScores(c)
    val en = s.getField("en")
    val de = s.getField("de")
    val es = s.getField("es")
    val fr = s.getField("fr")
    val zh = s.getField("zh")
    val best = greatest(en, de, es, fr, zh)
    // null text → null label: without the guard every when-condition
    // evaluates null (not true) and control falls through to the LAST
    // branch, confidently labeling absent text
    when(c.isNull, lit(null).cast("string"))
      .when(best === 0, lit("und"))
      .when(en === best, lit("en"))
      .when(de === best, lit("de"))
      .when(es === best, lit("es"))
      .when(fr === best, lit("fr"))
      .otherwise(lit("zh"))
  }

  /** Count of CJK Unified Ideograph characters — the zh signal for
    * [[langId]]: scripts identify themselves per CHARACTER, so one count
    * over the ideograph block outweighs any stopword evidence on genuinely
    * Chinese text without a tokenizer (Chinese has no whitespace tokens to
    * hit a stopword list with).
    */
  def cjkCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[一-鿿]"), lit(0)))

  /** Per-language evidence counts behind [[langId]], as a struct
    * (en, de, es, fr, zh) — stopword token hits for the Latin-script
    * languages, CJK character count for zh. Every field is a codegen'd
    * builtin over one tokenization, map-only at any scale, and exactly
    * replayable in ANSI SQL (list_contains filters + one regexp count).
    */
  def langScores(c: Column): Column = {
    val toks = tokensWs(c)
    struct(
      tokenHits(toks, StopwordsEn).as("en"),
      tokenHits(toks, StopwordsDe).as("de"),
      tokenHits(toks, StopwordsEs).as("es"),
      tokenHits(toks, StopwordsFr).as("fr"),
      cjkCount(c).as("zh"))
  }

  /** PII redaction: emails, IPv4 literals, then long digit runs (phone-ish)
    * replaced with typed placeholders, in that order (the IP pass must see
    * dotted digits before the number pass eats them). Conservative patterns
    * in the RE2-compatible subset — no lookaround — so external engines
    * (and the DuckDB oracle) reproduce the result byte-for-byte; all three
    * are codegen'd `regexp_replace` built-ins, map-only at any scale.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
      "\\b\\d{7,15}\\b", "<NUM>")

  /** Canonical form for exact dedup: lowercase, punctuation/symbols
    * dropped, whitespace runs collapsed to single spaces, trimmed. Hashing
    * the canonical form instead of the raw text lets exact dedup catch the
    * trivial variants (case, spacing, stray punctuation) that otherwise
    * leak through to the much more expensive near-dup passes. RE2-safe
    * patterns, codegen'd builtins, map-only.
    */
  def canonicalize(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9\\s]", ""),
      "\\s+", " "))

  /** Candidate payment-card numbers: contiguous 13–19-digit runs on word
    * boundaries — the PAN shape every card network uses. Feed each through
    * [[luhnValid]] to separate real card numbers from order ids / tracking
    * numbers: blind digit-run redaction ([[redactPii]]'s `<NUM>` pass)
    * over-redacts, while a Luhn-gated pass targets actual PANs. RE2-safe
    * pattern, codegen'd builtin.
    */
  def panCandidates(c: Column): Column =
    regexp_extract_all(c, lit("\\b[0-9]{13,19}\\b"), lit(0))

  /** Luhn (mod-10) checksum validity of a digit string — the checksum all
    * payment-card numbers carry: from the RIGHTMOST digit, double every
    * second digit (subtracting 9 when the double exceeds 9) and require
    * the sum ≡ 0 mod 10. Pure integer arithmetic over `ascii` codes, so a
    * DuckDB oracle replays it bit-for-bit with the same fold; null/empty
    * input is not valid. Declarative HOF, but it runs over the handful of
    * PAN candidates per document, never the corpus text.
    */
  def luhnValid(c: Column): Column = {
    val r = reverse(c)
    val sum = aggregate(
      sequence(lit(0), length(c) - 1),
      lit(0),
      (acc, i) => {
        val d = ascii(r.substr(i + lit(1), lit(1))) - lit(48)
        acc + when(i % 2 === 1,
          when(d > 4, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      })
    // coalesce: a NULL input must read NOT VALID (false), per the doc
    // contract — a bare null would silently flip NOT-filters downstream
    coalesce(length(c) > 0 && sum % 10 === 0, lit(false))
  }

  /** Crawl-dedup URL canonicalization: drop the fragment, lowercase the
    * scheme://host[:port] prefix (path/query case is significant, host
    * case is not), strip the scheme's default port (https:443, http:80),
    * remove tracking parameters (utm_*, fbclid, gclid), sort the
    * remaining query parameters, normalize an empty path to "/", and drop
    * an emptied query entirely. The same resource crawled via
    * `HTTPS://Example.COM:443/p?utm_source=x&b=2&a=1#top` and
    * `https://example.com/p?a=1&b=2` hashes apart raw but identical
    * canonical — the cheap URL-level dedup pass that runs BEFORE any
    * content fetch. Userinfo (`user@`) keeps its case (RFC 3986 makes it
    * case-sensitive — lowercasing it would falsely merge distinct
    * resources) and the default-port strip anchors on the host:port part
    * AFTER the last '@', so userinfo/IPv6 colons cannot defeat it.
    * RE2-safe patterns ((?s)/\z, never a bare '$' — Java's '$' also
    * matches before a trailing newline, RE2's does not); the parameter
    * filter/sort is a HOF over the (tiny) parameter array; everything
    * else is codegen'd builtins, map-only at any scale.
    */
  def canonicalUrl(c: Column): Column = {
    // (?s) + \z instead of bare '.'/'$': Java's '$' matches BEFORE a
    // final newline while RE2's (the oracle's) matches only end-of-text —
    // a trailing-newline URL would canonicalize differently per engine
    val noFrag = regexp_replace(c, "(?s)#.*", "")
    val scheme = lower(regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    // userinfo (up to the LAST '@') keeps its case — RFC 3986 makes it
    // case-sensitive; only the host is case-insensitive. lower() on the
    // host:port part is safe for IPv6 literals too (hex is
    // case-insensitive there).
    val userinfo = regexp_extract(auth, "^(.*@)", 1)
    val hostPort = lower(regexp_replace(auth, "^.*@", ""))
    val hostNoPort = when(scheme === "https",
        regexp_replace(hostPort, ":443\\z", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80\\z", ""))
      .otherwise(hostPort)
    val prefixNoPort = concat(scheme, lit("://"), userinfo, hostNoPort)
    val rest = regexp_replace(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val path = regexp_replace(rest, "(?s)\\?.*", "")
    val q = when(instr(rest, "?") > 0,
      regexp_replace(rest, "^[^?]*\\?", "")).otherwise(lit(""))
    // startsWith, not LIKE: `_` is a single-char LIKE wildcard, so
    // 'utm_%' would also match 'utmx...' — the oracle escapes it, the
    // engine side must be literal too
    val params = filter(split(q, "&"), p =>
      !(p.startsWith("utm_") || p.startsWith("fbclid=") ||
        p.startsWith("gclid=") || p === ""))
    val cleanQ = array_join(array_sort(params), "&")
    concat(prefixNoPort,
      when(path === "", lit("/")).otherwise(path),
      when(cleanQ === "", lit("")).otherwise(concat(lit("?"), cleanQ)))
  }

  /** 60-bit content fingerprint: first 15 hex digits of md5, as BIGINT.
    * Stable across engines (md5 is md5 everywhere), collision-safe enough
    * for dedup bucketing at 100 TB (~2^30 docs vs 2^60 space).
    */
  def fingerprint64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 32-bit content hash (first 8 hex digits of md5) — the `h` fed to the
    * MinHash universal family, kept < 2^32 so (a*h+b) stays in signed 64-bit.
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Word k-shingles joined by a single space: ["a b c", "b c d", ...].
    * Documents shorter than k words yield a single shingle of the whole text,
    * so short docs still participate in dedup.
    */
  def wordShingles(c: Column, k: Int): Column = {
    val toks = tokensWs(c)
    val n = size(toks)
    when(n < k, array(concat_ws(" ", toks)))
      .otherwise(
        transform(sequence(lit(0), n - k), i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Distinct word k-shingles (set semantics for Jaccard). */
  def wordShingleSet(c: Column, k: Int): Column = array_distinct(wordShingles(c, k))
}

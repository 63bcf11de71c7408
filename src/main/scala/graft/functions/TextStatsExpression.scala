// Under org.apache.spark.sql for the same private[sql] access reasons as the
// sibling expression files.
package org.apache.spark.sql.graft

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All text metrics in one compiled pass per document — the semantics are
  * bit-for-bit those of the column-composed versions in
  * graft.functions.TextFunctions (which remain the executable spec and feed
  * the DuckDB oracle):
  *
  *  - tokens: `trim(text)` (ASCII-space trim, like Spark's `trim`) split by
  *    java `\s+` with limit -1 (exactly Spark's `split`);
  *  - n_tok_bpe: count of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` matches;
  *  - punct_ratio: `[^A-Za-z0-9\s]` matches / total chars (0 for empty);
  *  - stop_ratio / lang hits: token membership in the four stopword lists;
  *  - mean_tok_len: exact integer sum of token lengths / token count;
  *  - quality: the same double formula, same operation order;
  *  - lang: argmax with en > de > es > fr > zh precedence (zh evidence is
  *    the CJK-ideograph character count, not token hits), "und" on zero
  *    hits.
  *
  * One ~100-entry hash-set lookup per token replaces four `filter` +
  * `array_contains` higher-order chains, and the two regex scans replace
  * `regexp_extract_all` materializing match arrays.
  */
case class TextStats(child: Expression)
    extends UnaryExpression with NativeUnaryCodegen {

  override def dataType: DataType = TextStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val trimmed = TextStats.trimSpaces(text)
    val toks: Array[String] =
      if (trimmed.isEmpty) Array.empty
      else TextStats.Ws.split(trimmed, -1)

    val nTok = toks.length
    var lenSum = 0L
    var hitEn = 0; var hitDe = 0; var hitEs = 0; var hitFr = 0
    var i = 0
    while (i < nTok) {
      val t = toks(i)
      lenSum += t.length
      if (TextStats.En.contains(t)) hitEn += 1
      if (TextStats.De.contains(t)) hitDe += 1
      if (TextStats.Es.contains(t)) hitEs += 1
      if (TextStats.Fr.contains(t)) hitFr += 1
      i += 1
    }

    // single scan for punct count + BPE-ish token count + CJK count
    var punct = 0
    var bpe = 0
    var cjk = 0
    var j = 0
    var inLetter = false
    var inDigit = false
    val len = text.length
    while (j < len) {
      val c = text.charAt(j)
      val isLetter = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
      val isDigit = c >= '0' && c <= '9'
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
      if (isLetter) { if (!inLetter) bpe += 1 }
      else if (isDigit) { if (!inDigit) bpe += 1 }
      else if (!isWs) { punct += 1; bpe += 1 }
      if (c >= '一' && c <= '鿿') cjk += 1
      inLetter = isLetter
      inDigit = isDigit
      j += 1
    }

    val punctRatio = if (len == 0) 0.0 else punct.toDouble / len.toDouble
    val stopRatio = if (nTok == 0) 0.0 else hitEn.toDouble / nTok.toDouble
    val meanLen = if (nTok == 0) 0.0 else lenSum.toDouble / nTok.toDouble
    val lenOk = if (meanLen >= 3.0 && meanLen <= 10.0) 1.0 else 0.0
    val quality = math.min(1.0, math.max(0.0,
      0.4 * math.min(1.0, stopRatio * 4.0) + 0.3 * lenOk + 0.3 * (1.0 - punctRatio)))
    val best = math.max(cjk,
      math.max(math.max(hitEn, hitDe), math.max(hitEs, hitFr)))
    val lang =
      if (best == 0) "und"
      else if (hitEn == best) "en"
      else if (hitDe == best) "de"
      else if (hitEs == best) "es"
      else if (hitFr == best) "fr"
      else "zh"

    InternalRow(nTok, bpe, punctRatio, stopRatio, meanLen, quality,
      UTF8String.fromString(lang))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tok", IntegerType), StructField("n_tok_bpe", IntegerType),
    StructField("punct_ratio", DoubleType), StructField("stop_ratio", DoubleType),
    StructField("mean_tok_len", DoubleType), StructField("quality", DoubleType),
    StructField("lang_pred", StringType)))

  private[graft] val Ws = Pattern.compile("\\s+")

  /** Spark `trim` semantics: strips ASCII space (0x20) only. */
  private[graft] def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  import graft.functions.TextFunctions
  private[graft] val En = TextFunctions.StopwordsEn.toSet
  private[graft] val De = TextFunctions.StopwordsDe.toSet
  private[graft] val Es = TextFunctions.StopwordsEs.toSet
  private[graft] val Fr = TextFunctions.StopwordsFr.toSet

  def textStats(c: Column): Column =
    ExpressionUtilsShim.column(TextStats(ExpressionUtilsShim.expr(c)))

  def nfcNormalize(c: Column): Column =
    ExpressionUtilsShim.column(NfcNormalize(ExpressionUtilsShim.expr(c)))

  def charNgrams(c: Column, n: Int): Column =
    ExpressionUtilsShim.column(CharNgrams(ExpressionUtilsShim.expr(c), n))
}

/** The per-language evidence counts behind lang-id as ONE compiled pass —
  * bit-for-bit the column-composed `TextFunctions.langScores` (which
  * remains the executable spec and feeds the DuckDB oracle): stopword
  * token hits for en/de/es/fr, CJK-ideograph character count for zh.
  * Four interpreted `filter` + `array_contains` chains (plus a
  * `regexp_extract_all` materializing its match array) collapse into one
  * token loop over the shared hash sets and one char scan.
  */
case class LangScores(child: Expression)
    extends UnaryExpression with NativeUnaryCodegen {

  override def dataType: DataType = LangScores.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "lang_scores"

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val trimmed = TextStats.trimSpaces(text)
    val toks: Array[String] =
      if (trimmed.isEmpty) Array.empty
      else TextStats.Ws.split(trimmed, -1)
    var hitEn = 0; var hitDe = 0; var hitEs = 0; var hitFr = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (TextStats.En.contains(t)) hitEn += 1
      if (TextStats.De.contains(t)) hitDe += 1
      if (TextStats.Es.contains(t)) hitEs += 1
      if (TextStats.Fr.contains(t)) hitFr += 1
      i += 1
    }
    var cjk = 0
    var j = 0
    while (j < text.length) {
      val c = text.charAt(j)
      if (c >= '一' && c <= '鿿') cjk += 1
      j += 1
    }
    InternalRow(hitEn, hitDe, hitEs, hitFr, cjk)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangScores {
  val schema: StructType = StructType(Seq(
    StructField("en", IntegerType), StructField("de", IntegerType),
    StructField("es", IntegerType), StructField("fr", IntegerType),
    StructField("zh", IntegerType)))

  def langScores(c: Column): Column =
    ExpressionUtilsShim.column(LangScores(ExpressionUtilsShim.expr(c)))
}

/** Per-window language labels over a token array in ONE compiled pass —
  * bit-for-bit the composition `chunkTokens(stride = window)` →
  * `langId(chunk)` that remains the executable spec (QualityFilterSpec
  * asserts equality on random inputs) and feeds the DuckDB oracle:
  * windows of `window` tokens advancing by `window` (final window
  * clamped; an empty token array yields ONE "und" window, matching the
  * whole-text chunk of a blank doc), per-window stopword-hit counts for
  * en/de/es/fr and CJK-ideograph char count for zh (counting token chars
  * equals counting the joined chunk's chars — the separators are plain
  * spaces), argmax with en > de > es > fr > zh precedence, "und" on zero
  * evidence. Replaces a `transform`+`sequence`+`slice`+`array_join` HOF
  * chain that materialized every chunk as a string and re-tokenized it
  * inside `langScores`.
  */
case class WindowedLangLabels(child: Expression, window: Int)
    extends UnaryExpression with NativeUnaryCodegen {
  require(window > 0, s"window must be positive, got $window")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "windowed_lang_labels"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    // = chunkTokens' count: 1 when n <= window, ceil((n-window)/window)+1
    // above — both collapse to (n-1)/window + 1 for n >= 1
    val nChunks = if (n == 0) 1 else (n - 1) / window + 1
    val out = new Array[Any](nChunks)
    var ci = 0
    while (ci < nChunks) {
      val lo = ci * window
      val hi = math.min(lo + window, n)
      var en = 0; var de = 0; var es = 0; var fr = 0; var zh = 0
      var i = lo
      while (i < hi) {
        val t = arr.getUTF8String(i).toString
        if (TextStats.En.contains(t)) en += 1
        if (TextStats.De.contains(t)) de += 1
        if (TextStats.Es.contains(t)) es += 1
        if (TextStats.Fr.contains(t)) fr += 1
        var j = 0
        while (j < t.length) {
          val c = t.charAt(j)
          if (c >= '一' && c <= '鿿') zh += 1
          j += 1
        }
        i += 1
      }
      val best = math.max(math.max(math.max(en, de), math.max(es, fr)), zh)
      out(ci) = UTF8String.fromString(
        if (best == 0) "und"
        else if (en == best) "en"
        else if (de == best) "de"
        else if (es == best) "es"
        else if (fr == best) "fr"
        else "zh")
      ci += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowedLangLabels {
  def windowedLangLabels(tokens: Column, window: Int): Column =
    ExpressionUtilsShim.column(
      WindowedLangLabels(ExpressionUtilsShim.expr(tokens), window))
}

/** Unicode canonical composition (NFC, java.text.Normalizer) as a native
  * codegen'd expression — the normalization pass that belongs BEFORE any
  * fingerprint/dedup/shingle step: composed ("é" U+00E9) and decomposed
  * ("e"+U+0301) spellings are visually identical but hash apart, so a
  * crawl mixing editors silently defeats exact and near dedup without it.
  * DuckDB's nfc_normalize implements the same Unicode algorithm, so
  * results replay in the oracle.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with NativeUnaryCodegen {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      input // common case (ASCII, already-composed): no re-encode
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All character `n`-grams of a string in ONE compiled pass — by CODE
  * POINT, matching SQL `substring` semantics in Spark and DuckDB (so the
  * oracle can replay any downstream aggregation with
  * `substring(text, i, n)`). The naive declarative form —
  * `explode(sequence(...))` + `substring(text, i, n)` — re-scans the
  * string from the start for every position (code-point offsets aren't
  * indexable), turning a length-L document into O(L²) work; this pass is
  * O(L). Feeds the per-source trigram fingerprint
  * ([[graft.operators.TextIndex.charNgramProfile]]) and any future
  * char-gram LM. Empty array when the string has fewer than `n` code
  * points.
  */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression with NativeUnaryCodegen {
  require(n > 0, s"n must be positive, got $n")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_ngrams"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // one pass collecting code-point start offsets (UTF-16 indices)
    val starts = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < s.length) {
      starts.add(i)
      i += Character.charCount(s.codePointAt(i))
    }
    val cps = starts.size
    val count = math.max(0, cps - n + 1)
    val out = new Array[AnyRef](count)
    var g = 0
    while (g < count) {
      val from = starts.get(g).intValue
      val to = if (g + n < cps) starts.get(g + n).intValue else s.length
      out(g) = UTF8String.fromString(s.substring(from, to))
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hashed char-n-gram feature counts in ONE compiled pass — the PRODUCTION
  * featurizer behind the pinned linear classifier
  * ([[graft.operators.TextClassifier.linearScoresPinned]] with
  * family = "fast"): per document, every code-point n-gram is hashed with
  * Spark's own XXH64 (`xxhash64` seed 42) straight off the UTF-8 bytes —
  * no gram string materializes, no md5 — and bucketed
  * `floorMod(h, dims)`; the complete per-document (dim, count) table
  * comes back as one sorted array, so the caller's explode is already
  * the final count (NO per-(doc, dim) aggregation exchange — the md5
  * path needs one).
  *
  * Gram semantics mirror [[graft.operators.TextClassifier.charNgrams]]
  * exactly: a text with fewer than `n` code points (including the empty
  * string) contributes ONE gram — the whole text — so no document
  * featurizes to nothing.
  *
  * The md5 featurizer ([[graft.operators.TextClassifier.hashedGramDim]])
  * stays the ORACLE path — DuckDB replays md5, not xxhash64; weights for
  * each family are trained on that family's own features
  * ([[graft.tools.TrainArtifacts]]) and TextClassifierSpec pins the two
  * pipelines to identical predictions on the fixture corpus.
  */
case class CharNgramDimCounts(child: Expression, n: Int, dims: Int)
    extends UnaryExpression with NativeUnaryCodegen {
  require(n > 0, s"n must be positive, got $n")
  require(dims > 0 && dims <= (1 << 22),
    s"dims must be in [1, 2^22], got $dims")

  override def dataType: DataType = CharNgramDimCounts.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_ngram_dim_counts"

  // per-(instance, thread) reusable count buffer: the expression object is
  // shared by every task in the executor (codegen references it), so the
  // scratch space must be thread-local, like HashExpressions' digests
  @transient private lazy val buf: ThreadLocal[Array[Long]] =
    ThreadLocal.withInitial(() => new Array[Long](dims))

  private val Seed = 42L // Spark's xxhash64 SQL function seed

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val nb = u.numBytes
    // one pass collecting code-point BYTE starts (UTF-8 lead bytes)
    var starts = new Array[Int](math.max(8, math.min(nb, 64)))
    var cps = 0
    var i = 0
    while (i < nb) {
      if (cps == starts.length)
        starts = java.util.Arrays.copyOf(starts, starts.length * 2)
      starts(cps) = i
      cps += 1
      i += UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + i))
    }
    val counts = buf.get()
    val touched = new java.util.ArrayList[Integer]()
    // The count buffer is a shared per-thread pool: every touched slot MUST
    // be re-zeroed even if this eval throws mid-row (an abandoned non-zero
    // slot would silently inflate the next row evaluated on this thread).
    try {
      def bump(fromByte: Int, toByte: Int): Unit = {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off + fromByte, toByte - fromByte, Seed)
        val d = java.lang.Math.floorMod(h, dims.toLong).toInt
        if (counts(d) == 0L) touched.add(d)
        counts(d) += 1L
      }
      if (cps < n) bump(0, nb) // whole (short/empty) text as ONE gram
      else {
        var g = 0
        val grams = cps - n + 1
        while (g < grams) {
          bump(starts(g), if (g + n < cps) starts(g + n) else nb)
          g += 1
        }
      }
      val ds = new Array[Int](touched.size)
      var t = 0
      while (t < ds.length) { ds(t) = touched.get(t).intValue; t += 1 }
      java.util.Arrays.sort(ds)
      val out = new Array[AnyRef](ds.length)
      t = 0
      while (t < ds.length) {
        val d = ds(t)
        out(t) = InternalRow(d, counts(d))
        t += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } finally {
      var t = 0
      while (t < touched.size) { counts(touched.get(t).intValue) = 0L; t += 1 }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgramDimCounts {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("dim", IntegerType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  def charNgramDimCounts(c: Column, n: Int, dims: Int): Column =
    ExpressionUtilsShim.column(
      CharNgramDimCounts(ExpressionUtilsShim.expr(c), n, dims))
}

/** The md5 (ORACLE-family) twin of [[CharNgramDimCounts]]: per document,
  * every code-point n-gram is hashed with the engine's md5-32
  * ([[Md5Hash.hash32]] — first 8 md5 hex digits, bit-identical to
  * `('0x' || substring(md5(gram), 1, 8))::BIGINT` and to
  * [[graft.operators.TextClassifier.hashedGramDim]]'s column composition)
  * and bucketed `h % dims` (h ∈ [0, 2^32), so plain mod is non-negative);
  * the complete per-document (dim, count) table returns as one sorted
  * array. Replaces the declarative
  * `explode(charNgrams) → md5 → conv → substring → % → groupBy` chain in
  * [[graft.operators.TextClassifier.hashedGramCounts]]'s md5 branch: the
  * per-gram hex-string materialization (md5's 32-char hex render + the
  * conv re-parse) and the grams-sized aggregation exchange both
  * disappear — only ≤ min(grams, dims) finished (dim, count) rows leave
  * the map side. The md5 itself is unchanged, so every downstream value
  * is bit-identical and the DuckDB oracles keep replaying the chain.
  *
  * Gram semantics mirror [[graft.operators.TextClassifier.charNgrams]]
  * exactly (shared with the fast kernel): fewer than `n` code points —
  * including the empty string — contributes ONE gram, the whole text.
  * md5 hashes the gram's UTF-8 bytes, which are byte slices of the
  * document's UTF-8 bytes (code-point boundaries respect UTF-8 framing),
  * so hashing document byte-ranges is exactly hashing the gram strings.
  */
case class CharNgramMd5DimCounts(child: Expression, n: Int, dims: Int)
    extends UnaryExpression with NativeUnaryCodegen {
  require(n > 0, s"n must be positive, got $n")
  require(dims > 0 && dims <= (1 << 22),
    s"dims must be in [1, 2^22], got $dims")

  override def dataType: DataType = CharNgramDimCounts.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_ngram_md5_dim_counts"

  // per-(instance, thread) reusable count buffer — the CharNgramDimCounts
  // rationale: codegen shares the expression object across tasks
  @transient private lazy val buf: ThreadLocal[Array[Long]] =
    ThreadLocal.withInitial(() => new Array[Long](dims))

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    // one contiguous copy of the document's UTF-8 bytes (getBytes returns
    // the backing array when it is exactly array-backed), then per-gram
    // md5 over byte ranges — no per-gram allocation
    val arr = u.getBytes
    val nb = arr.length
    // one pass collecting code-point BYTE starts (UTF-8 lead bytes)
    var starts = new Array[Int](math.max(8, math.min(nb, 64)))
    var cps = 0
    var i = 0
    while (i < nb) {
      if (cps == starts.length)
        starts = java.util.Arrays.copyOf(starts, starts.length * 2)
      starts(cps) = i
      cps += 1
      i += UTF8String.numBytesForFirstByte(arr(i))
    }
    val counts = buf.get()
    val touched = new java.util.ArrayList[Integer]()
    // shared per-thread pool: re-zero every touched slot even on a
    // mid-row throw (same invariant as CharNgramDimCounts)
    try {
      def bump(fromByte: Int, toByte: Int): Unit = {
        val h = Md5Hash.hash32(arr, fromByte, toByte - fromByte)
        val d = (h % dims).toInt // h >= 0: plain mod, like hash32(gram) % dims
        if (counts(d) == 0L) touched.add(d)
        counts(d) += 1L
      }
      if (cps < n) bump(0, nb) // whole (short/empty) text as ONE gram
      else {
        var g = 0
        val grams = cps - n + 1
        while (g < grams) {
          bump(starts(g), if (g + n < cps) starts(g + n) else nb)
          g += 1
        }
      }
      val ds = new Array[Int](touched.size)
      var t = 0
      while (t < ds.length) { ds(t) = touched.get(t).intValue; t += 1 }
      java.util.Arrays.sort(ds)
      val out = new Array[AnyRef](ds.length)
      t = 0
      while (t < ds.length) {
        val d = ds(t)
        out(t) = InternalRow(d, counts(d))
        t += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } finally {
      var t = 0
      while (t < touched.size) { counts(touched.get(t).intValue) = 0L; t += 1 }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgramMd5DimCounts {
  def charNgramMd5DimCounts(c: Column, n: Int, dims: Int): Column =
    ExpressionUtilsShim.column(
      CharNgramMd5DimCounts(ExpressionUtilsShim.expr(c), n, dims))
}

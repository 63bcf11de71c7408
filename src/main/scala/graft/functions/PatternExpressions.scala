// Multi-pattern text matching. Under org.apache.spark.sql so the codegen
// shim types are reachable — same rationale as HashExpressions.scala.
package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.AbstractDataType
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick automaton (Aho & Corasick 1975): all `patterns` matched
  * against a text in ONE left-to-right pass, every match end-position
  * counted — including overlapping and nested occurrences ("aa" matches
  * twice in "aaa"; "ab" and "b" both fire on "ab"). Built once per
  * pattern set and reused across rows; match cost is O(chars + matches)
  * independent of the number of patterns, which is the entire point at
  * scale: a 10⁴-phrase blocklist or taxonomy costs ONE text scan per
  * document instead of 10⁴ contains()/regexp passes.
  *
  * Matching is exact on UTF-16 code units (Java String chars). A match
  * can never split a surrogate pair (the pattern itself is well-formed),
  * so occurrence COUNTS agree with any code-point-based engine — only
  * raw offsets would differ, and none are exposed.
  */
private[graft] final class AhoCorasick(patterns: Seq[String]) {
  require(patterns.nonEmpty, "AhoCorasick: empty pattern set")
  require(patterns.forall(_.nonEmpty), "AhoCorasick: empty pattern")

  private val children =
    scala.collection.mutable.ArrayBuffer(new java.util.HashMap[Character, Integer]())
  private val out = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)

  patterns.zipWithIndex.foreach { case (p, pid) =>
    var s = 0
    p.foreach { ch =>
      val nx = children(s).get(ch)
      if (nx == null) {
        children += new java.util.HashMap[Character, Integer]()
        out += Nil
        children(s).put(ch, children.size - 1)
        s = children.size - 1
      } else s = nx
    }
    out(s) = pid :: out(s)
  }

  private val fail = new Array[Int](children.size)
  locally {
    val q = scala.collection.mutable.Queue.empty[Int]
    children(0).values.forEach(v => q.enqueue(v)) // depth-1 fails to root
    while (q.nonEmpty) {
      val u = q.dequeue()
      children(u).forEach { (ch, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).containsKey(ch)) f = fail(f)
        val fv = children(f).get(ch)
        fail(v) = if (fv != null && fv != v) fv else 0
        // flatten dictionary-suffix outputs: BFS order guarantees
        // out(fail(v)) is already complete
        out(v) = out(v) ::: out(fail(v))
        q.enqueue(v)
      }
    }
  }

  /** Per-pattern occurrence counts over `text` (all end positions). */
  def countAll(text: String): Array[Int] = {
    val counts = new Array[Int](patterns.size)
    var s = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      var st = s
      while (st != 0 && !children(st).containsKey(ch)) st = fail(st)
      val nx = children(st).get(ch)
      s = if (nx != null) nx else 0
      var o = out(s)
      while (o.nonEmpty) { counts(o.head) += 1; o = o.tail }
      i += 1
    }
    counts
  }
}

/** `multi_pattern_hits(text)` → array<int>: occurrence count per pattern,
  * aligned with the constructor's pattern order. The automaton is built
  * lazily ONCE per task from the plan-embedded pattern list (patterns ride
  * the serialized expression — the broadcast-dim pattern without a join),
  * then every row pays one O(chars + matches) scan.
  */
case class MultiPatternHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression with NativeUnaryCodegen {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "multi_pattern_hits: patterns must be non-empty strings")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "multi_pattern_hits"

  @transient private lazy val ac = new AhoCorasick(patterns)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(ac.countAll(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): MultiPatternHits =
    copy(child = newChild)
}

object PatternFunctions {
  def multiPatternHits(text: Column, patterns: Seq[String]): Column =
    ExpressionUtilsShim.column(
      MultiPatternHits(ExpressionUtilsShim.expr(text), patterns))

  def wordDropoutKeep(tokens: Column, id: Column, seed: String,
      rate: Int): Column =
    ExpressionUtilsShim.column(WordDropoutKeep(
      ExpressionUtilsShim.expr(tokens), ExpressionUtilsShim.expr(id),
      seed, rate))

  def spanCorrupt(tokens: Column, id: Column, seed: String, rate: Int,
      spanLen: Int): Column =
    ExpressionUtilsShim.column(SpanCorrupt(
      ExpressionUtilsShim.expr(tokens), ExpressionUtilsShim.expr(id),
      seed, rate, spanLen))
}

/** `word_dropout_keep(tokens, id)` → the tokens that SURVIVE hash-decided
  * dropout: token i (1-based) of document `id` drops iff
  * hash32("seed:id:i:token") mod rate = 0, where hash32 is the engine's
  * replayable md5-prefix hash. Bit-for-bit the declarative
  * conv(substring(md5(concat_ws(':', seed, id, i+1, x)), 1, 8), 16, 10)
  * higher-order filter it replaces (AugmentSpec asserts equality on
  * random inputs) — hoisted to a native expression because the HOF runs
  * interpreted and pays ~4 s/600k docs where one compiled md5 pass pays
  * a fraction of that.
  */
case class WordDropoutKeep(left: Expression, right: Expression,
    seed: String, rate: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  require(rate >= 2, s"rate must be >= 2, got $rate")

  // Plan-time contract: without it, an INT doc id reaching the
  // asInstanceOf[Long] below is a runtime ClassCastException from SQL
  // (the Scala Augment API always casts to long; SQL callers may not).
  // ImplicitCast so an INT id coerces instead of failing analysis.
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), LongType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "word_dropout_keep"

  /** Public bridge for generated code (protected nullSafeEval). */
  final def evalPair(toks: Any, id: Any): Any = nullSafeEval(toks, id)

  override protected def nullSafeEval(toksAny: Any, idAny: Any): Any = {
    val toks = toksAny.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val prefix = seed + ":" + idAny.asInstanceOf[Long] + ":"
    val n = toks.numElements()
    val kept = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val tok = toks.getUTF8String(i)
      // hash the token's RAW bytes (concat at the byte level): a
      // String round-trip would substitute U+FFFD for malformed UTF-8
      // and diverge from the HOF/oracle md5 over concat_ws bytes
      val head = (prefix + (i + 1) + ":").getBytes(StandardCharsets.UTF_8)
      val tokBytes = tok.getBytes
      val key = java.util.Arrays.copyOf(head, head.length + tokBytes.length)
      System.arraycopy(tokBytes, 0, key, head.length, tokBytes.length)
      if (Md5Hash.hash32(key) % rate != 0L) kept.add(tok)
      i += 1
    }
    new GenericArrayData(kept.toArray)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("wordDropoutExpr", this,
      classOf[WordDropoutKeep].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$ref.evalPair($a, $b);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordDropoutKeep =
    copy(left = newLeft, right = newRight)
}

/** `span_corrupt(tokens, id)` → struct(input, target, n_masked, n_spans):
  * T5-style span corruption (Raffel et al. 2020) with every random choice
  * replaced by the engine's replayable md5-prefix hash. Position p
  * (1-based) STARTS a mask iff hash32("seed:id:p") mod rate = 0; a
  * position is masked iff some start lies within the trailing `spanLen`
  * window (overlapping starts merge into one run — stateless, so an SQL
  * oracle replays it positionally). Each maximal masked run k becomes the
  * sentinel `<extra_id_k>` in the input; the target lists each sentinel
  * followed by the tokens it hides and closes with `<extra_id_n_spans>`,
  * the T5 format. Start decisions hash the POSITION only (not the token):
  * corruption pattern and content are independent, as the objective
  * intends.
  */
case class SpanCorrupt(left: Expression, right: Expression,
    seed: String, rate: Int, spanLen: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  require(rate >= 2, s"rate must be >= 2, got $rate")

  // Same plan-time contract as WordDropoutKeep: INT ids coerce to LONG
  // at analysis instead of ClassCastException at runtime.
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), LongType)
  require(spanLen >= 1, s"spanLen must be >= 1, got $spanLen")

  override def dataType: DataType = StructType(Seq(
    StructField("input", StringType, nullable = false),
    StructField("target", StringType, nullable = false),
    StructField("n_masked", IntegerType, nullable = false),
    StructField("n_spans", IntegerType, nullable = false)))
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "span_corrupt"

  /** Public bridge for generated code (protected nullSafeEval). */
  final def evalPair(toks: Any, id: Any): Any = nullSafeEval(toks, id)

  override protected def nullSafeEval(toksAny: Any, idAny: Any): Any = {
    val toks = toksAny.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val prefix = seed + ":" + idAny.asInstanceOf[Long] + ":"
    val n = toks.numElements()
    val starts = new Array[Boolean](n)
    var p = 0
    while (p < n) {
      val key = (prefix + (p + 1)).getBytes(StandardCharsets.UTF_8)
      starts(p) = Md5Hash.hash32(key) % rate == 0L
      p += 1
    }
    val input = new java.lang.StringBuilder
    val target = new java.lang.StringBuilder
    var nMasked = 0
    var nSpans = 0
    var sinceStart = spanLen // distance since last start; >= spanLen = unmasked
    var inRun = false
    p = 0
    while (p < n) {
      if (starts(p)) sinceStart = 0
      val masked = sinceStart < spanLen
      if (masked) {
        if (!inRun) {
          if (input.length > 0) input.append(' ')
          input.append("<extra_id_").append(nSpans).append('>')
          if (target.length > 0) target.append(' ')
          target.append("<extra_id_").append(nSpans).append('>')
          nSpans += 1
          inRun = true
        }
        target.append(' ').append(toks.getUTF8String(p).toString)
        nMasked += 1
      } else {
        if (input.length > 0) input.append(' ')
        input.append(toks.getUTF8String(p).toString)
        inRun = false
      }
      sinceStart += 1
      p += 1
    }
    if (target.length > 0) target.append(' ')
    target.append("<extra_id_").append(nSpans).append('>')
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(input.toString),
        UTF8String.fromString(target.toString),
        nMasked, nSpans))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("spanCorruptExpr", this,
      classOf[SpanCorrupt].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"$ref.evalPair($a, $b);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanCorrupt =
    copy(left = newLeft, right = newRight)
}

// Under org.apache.spark.sql.graft with the sibling expression files.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Whole-stage-codegen bridge for the native unary expressions.
  *
  * The signature expressions (MinHash, SimHash, winnowing, TextStats, …) do
  * their per-row work in one compiled JVM loop inside `nullSafeEval`.
  * `CodegenFallback` would keep that loop but DISABLE whole-stage codegen
  * for every stage containing the expression — the surrounding project /
  * filter / aggregate operators lose operator fusion to pay for one
  * interpreted call site. This trait instead emits a single virtual call to
  * the expression instance (bound via `ctx.addReferenceObj`) from the
  * generated code, so:
  *
  *  - the per-row loop stays exactly the compiled implementation below
  *    (identical results, same speed), and
  *  - the stage remains one fused WholeStageCodegen body — the same
  *    pattern Spark's own regexp/date expressions use when the kernel is
  *    too complex to inline as Java source text.
  *
  * Contract: `nullSafeEval` must never return null (null-in/null-out is
  * handled by `nullSafeCodeGen`; a null return for a primitive result type
  * would NPE on unboxing). All graft unary natives satisfy this.
  */
trait NativeUnaryCodegen extends UnaryExpression {

  /** Public bridge: generated Java lives in another class and cannot call
    * the protected `nullSafeEval` directly.
    */
  final def evalInput(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this, classOf[NativeUnaryCodegen].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val call = s"$ref.evalInput($c)"
      val assign = dataType match {
        case LongType    => s"((java.lang.Long) $call).longValue()"
        case IntegerType => s"((java.lang.Integer) $call).intValue()"
        case DoubleType  => s"((java.lang.Double) $call).doubleValue()"
        case _           => s"(${CodeGenerator.javaType(dataType)}) $call"
      }
      s"${ev.value} = $assign;"
    })
  }
}

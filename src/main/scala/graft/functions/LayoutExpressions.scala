// Native data-layout expressions. Under org.apache.spark.sql for the same
// private[sql] reasons as VectorExpressions.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Z-order (Morton) interleave of the low 31 bits of two longs: bit i of
  * `left` lands at position 2i, bit i of `right` at 2i+1, yielding a value
  * in [0, 2⁶²). Sorting by it places rows that are close in BOTH dimensions
  * into the same neighborhoods, so range-partitioned, min/max-stat'd files
  * (parquet row groups) can be skipped by predicates on EITHER column — the
  * standard multi-dimensional clustering move for scan pruning at scale.
  *
  * Inputs are taken modulo 2³¹ (negative values contribute their low bits);
  * pre-scale or rank columns whose natural order isn't dense if pruning
  * quality matters. The spread uses the O(log w) magic-number shifts, not a
  * per-bit loop.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "interleave_bits"

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val cls = InterleaveBits.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.interleave($x, $y);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  /** Spreads the low 31 bits of x to even positions: bit i → bit 2i. */
  def spread(x0: Long): Long = {
    var x = x0 & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** Column-level entry points for layout math. */
object LayoutFunctions {
  /** Z-order key of two integral columns (see [[InterleaveBits]]). */
  def zOrderKey(a: Column, b: Column): Column =
    ExpressionUtils.column(InterleaveBits(
      ExpressionUtils.expression(a.cast("long")),
      ExpressionUtils.expression(b.cast("long"))))
}

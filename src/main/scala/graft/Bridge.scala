// Lives under org.apache.spark.sql to reach the private[sql] Column <->
// Expression converters; the rest of the engine goes through these two
// functions instead of touching Spark internals directly.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ExpressionUtils, UserDefinedFunctionUtils}
import org.apache.spark.sql.expressions.{SparkUserDefinedFunction, UserDefinedFunction}

object Bridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Typed ScalaUDF expression for a `functions.udf(...)`-built function —
    * the road the FunctionRegistry builders take to register scalar UDFs as
    * SQL functions with proper result types.
    */
  def scalaUdf(f: UserDefinedFunction, children: Seq[Expression]): Expression =
    UserDefinedFunctionUtils.toScalaUDF(f.asInstanceOf[SparkUserDefinedFunction], children)
}

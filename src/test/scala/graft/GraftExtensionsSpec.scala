// In the spark.sql package tree to reach the private[sql] registerFunctions
// hook — lets the extension be tested without tearing down the shared
// test SparkSession (extensions only apply at session construction).
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects m_add / max_with / cosine_sim builders") {
    val ext = new SparkSessionExtensions
    new graft.GraftExtensions()(ext)
    val reg = new SimpleFunctionRegistry
    ext.registerFunctions(reg)
    for (name <- Seq("m_add", "max_with", "cosine_sim"))
      assert(reg.functionExists(FunctionIdentifier(name)), name)
    // builders produce working expressions
    val mAdd = reg.lookupFunction(FunctionIdentifier("m_add"),
      Seq(Literal.create(Map("a" -> 1), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.IntegerType)),
        Literal.create(Map("b" -> 2), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.IntegerType))))
    assert(mAdd.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
  }
}

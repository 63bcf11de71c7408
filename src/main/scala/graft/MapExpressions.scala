package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, MapData}
import org.apache.spark.sql.types.{DataType, MapType}

/** `m_add(map, map, ...)` — map union where later maps overwrite earlier
  * keys, INDEPENDENT of `spark.sql.mapKeyDedupPolicy`: `MapConcat` only
  * last-wins when the session conf says LAST_WIN, so a deploy path that
  * injects functions without the engine session conf (the
  * `spark.sql.extensions=graft.GraftExtensions` spark-submit route) would
  * throw on duplicate keys under Spark's default EXCEPTION policy. The
  * reference silently overwrites (reference:
  * data-process/hive-udfs/src/main/java/com/thenetcircle/service/data/hive/udf/commons/UDFMapAdd.java:45-62),
  * so the engine's semantics must not depend on a conf being set.
  *
  * Key order: first occurrence wins position, last occurrence wins value —
  * same as MapConcat under LAST_WIN. Null in, null out.
  *
  * Codegen: the union loop is too stateful to inline as Java source, so
  * `doGenCode` emits one virtual call to [[unionMaps]] on the bound
  * expression instance (the n-ary analogue of [[NativeUnaryCodegen]]) —
  * the containing stage stays one fused WholeStageCodegen body instead of
  * losing operator fusion to a `CodegenFallback`.
  */
case class MapUnionLastWin(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure("m_add requires at least one map argument")
    else if (!children.forall(_.dataType.isInstanceOf[MapType]))
      TypeCheckResult.TypeCheckFailure(
        s"m_add arguments must all be maps, got ${children.map(_.dataType.simpleString).mkString(", ")}")
    else if (children.map(_.dataType).distinct.size != 1)
      TypeCheckResult.TypeCheckFailure(
        s"m_add arguments must share one map type, got ${children.map(_.dataType.simpleString).mkString(", ")}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = children.head.dataType

  private def mapType: MapType = children.head.dataType.asInstanceOf[MapType]

  override def nullable: Boolean = children.exists(_.nullable)

  /** LAST_WIN union of non-null child maps; public so generated code (which
    * lives in another class) can call it.
    */
  def unionMaps(maps: Array[MapData]): MapData = {
    val mt = mapType
    val kv = new java.util.LinkedHashMap[Any, Any]()
    var ci = 0
    while (ci < maps.length) {
      val md = maps(ci)
      val ks = md.keyArray()
      val vs = md.valueArray()
      var i = 0
      while (i < md.numElements()) {
        kv.put(ks.get(i, mt.keyType), vs.get(i, mt.valueType))
        i += 1
      }
      ci += 1
    }
    val keys = new Array[Any](kv.size())
    val vals = new Array[Any](kv.size())
    val it = kv.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey
      vals(i) = e.getValue
      i += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override def eval(input: InternalRow): Any = {
    // evaluate EVERY child before deciding nullness — the generated code
    // does (children are emitted unconditionally), and a short-circuiting
    // interpreter would make `m_add(null, throwing_expr)` return null
    // interpreted but throw under whole-stage codegen
    val maps = new Array[MapData](children.length)
    var anyNull = false
    var ci = 0
    while (ci < children.length) {
      val m = children(ci).eval(input)
      if (m == null) anyNull = true else maps(ci) = m.asInstanceOf[MapData]
      ci += 1
    }
    if (anyNull) null else unionMaps(maps)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mAdd", this, classOf[MapUnionLastWin].getName)
    val md = classOf[MapData].getName
    val javaType = CodeGenerator.javaType(dataType)
    val maps = ctx.freshName("maps")
    val hasNull = ctx.freshName("hasNull")
    val evals = children.map(_.genCode(ctx))
    // children evaluate unconditionally (pure expressions); a single null
    // child nulls the result, matching eval(). The reference fn is n-ary
    // varargs, so a wide m_add is in-contract: inlining every child's
    // evaluation into one method would blow the 64 KB JVM method limit and
    // fail Janino at runtime — split the per-child gather blocks into
    // helper functions like Spark's own n-ary expressions (MapConcat,
    // Concat). Split functions cannot write the caller's locals, so each
    // helper threads the null flag through its return value.
    val gathers = evals.zipWithIndex.map { case (e, i) =>
      s"""${e.code}
         |if (${e.isNull}) { $hasNull = true; } else { $maps[$i] = ${e.value}; }
         |""".stripMargin
    }
    val gatherCode = ctx.splitExpressionsWithCurrentInputs(
      expressions = gathers,
      funcName = "mAddGather",
      extraArguments = (s"$md[]", maps) :: ("boolean", hasNull) :: Nil,
      returnType = "boolean",
      makeSplitFunction = body =>
        s"""
           |$body
           |return $hasNull;
           |""".stripMargin,
      foldFunctions = _.map(call => s"$hasNull = $call;").mkString("\n"))
    ev.copy(code =
      code"""
        |boolean $hasNull = false;
        |$md[] $maps = new $md[${children.length}];
        |$gatherCode
        |boolean ${ev.isNull} = $hasNull;
        |$javaType ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = ($javaType) $ref.unionMaps($maps);
        |}
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

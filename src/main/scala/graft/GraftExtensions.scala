package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.MaxBy

/** Deploy-time function registration:
  * `spark-submit --conf spark.sql.extensions=graft.GraftExtensions` makes the
  * engine's expression-backed SQL functions available in every session
  * without calling GraftSession.configure — the injection point Spark
  * provides for engine extensions. Session-dependent functions (`cfgs`,
  * the HTTP UDFs with their client lifecycle) still register through
  * [[GraftSession.configure]], which remains the full surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // MapUnionLastWin, not MapConcat: the extension injection path doesn't
    // set spark.sql.mapKeyDedupPolicy, and m_add's overwrite semantics must
    // not depend on that conf (default EXCEPTION would make m_add throw).
    ext.injectFunction((
      FunctionIdentifier("m_add"),
      info("m_add", "m_add(map, map, ...) - LAST_WIN map union"),
      (exprs: Seq[Expression]) => org.apache.spark.sql.graft.MapUnionLastWin(exprs)))

    ext.injectFunction((
      FunctionIdentifier("max_with"),
      info("max_with", "max_with(sortKey, data) - data paired with max key"),
      (exprs: Seq[Expression]) => MaxBy(exprs(1), exprs(0))))

    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(array<float>, array<float>) - cosine similarity"),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.graft.CosineSimilarity(exprs(0), exprs(1))))
  }
}

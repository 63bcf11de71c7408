package graft.engine

import scala.reflect.runtime.{universe => ru}
import scala.tools.reflect.ToolBox

import org.apache.spark.sql.SparkSession

/** Hot script compilation — the reference embeds the Scala interpreter
  * (`IMain`) and evals HDFS-hosted scripts into `(SparkSession, P) => Any`
  * functions (reference:
  * data-process/spark-process/src/main/scala/process/InterpreterLoader.scala:66-125,
  * process/ScriptHelper.scala:77-78). A runtime ToolBox gives the same
  * capability without managing interpreter classpaths: compiled jobs remain
  * the primary path (SURVEY §7.2.6), scripts are the escape hatch.
  *
  * Cluster contract — ENFORCED, not just documented (r19 verdict #3):
  * ToolBox-generated classes live only in the driver JVM, so a script's
  * result must not carry its own generated classes into executor closures —
  * scripts declare plans (DataFrame ops), which serialize as Catalyst
  * expressions, not closures. A plan that embeds a script-defined function
  * (a typed `map`/`filter` lambda, a UDF, a custom Expression class) passes
  * local[*] — the single JVM resolves every class — and dies with
  * `ClassNotFoundException` on the first real cluster run, at task deser
  * time, long after the script "worked" in dev. [[compileTask]] therefore
  * walks every returned Dataset's logical plan and REFUSES any capture
  * whose class was loaded by the toolbox's in-memory classloader, before
  * the caller can execute it. (The reference's alternative — shipping
  * interpreter output to executors via `spark.repl.class.outputDir`,
  * InterpreterLoader.scala:107-108 — is deliberately not replicated.)
  */
object ScriptCompiler {

  private lazy val toolbox: ToolBox[ru.type] =
    ru.runtimeMirror(getClass.getClassLoader).mkToolBox()

  private val prelude =
    """import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
      |import org.apache.spark.sql.functions._
      |""".stripMargin

  /** Compile script source that evaluates to `SparkSession => Any`.
    * Standard imports are preloaded; compilation errors throw. The
    * returned function enforces the plan-only contract on each result
    * (see [[assertPlanOnly]]).
    */
  def compileTask(src: String): SparkSession => Any = synchronized {
    val fn = toolbox.eval(toolbox.parse(prelude + src))
      .asInstanceOf[SparkSession => Any]
    s => assertPlanOnly(fn(s))
  }

  /** The plan-only gate: when a script's result is a Dataset, scan its
    * UNEXECUTED logical plan for any captured object of a
    * toolbox-generated class and refuse loudly — turning the
    * would-be-cluster `ClassNotFoundException` at task-deserialization
    * time into an immediate, explainable error at script-eval time.
    * Non-Dataset results pass through: side effects the script already
    * performed are its own business (an executor-closure failure inside
    * them surfaces at that call site, not silently).
    */
  def assertPlanOnly(result: Any): Any = {
    result match {
      case ds: org.apache.spark.sql.Dataset[_] =>
        findGeneratedCapture(ds.queryExecution.logical).foreach { cls =>
          throw new IllegalArgumentException(
            s"script result captures the script-generated class $cls in " +
              "its plan — such classes exist only in the driver JVM, so " +
              "this plan would die with ClassNotFoundException at task " +
              "deserialization on a real cluster. Scripts must declare " +
              "plans with DataFrame/Column operations (which serialize " +
              "as Catalyst expressions); move the custom function into a " +
              "compiled, deployed jar instead")
        }
      case _ => ()
    }
    result
  }

  /** True when `cls` was loaded through an in-memory compiler classloader
    * (ToolBox/IMain both load generated code via
    * `scala.reflect.internal.util.AbstractFileClassLoader`) — classes no
    * executor can resolve. Jar-shipped classes load through the app/URL
    * classloader chain and never match.
    */
  private def isGeneratedClass(cls: Class[_]): Boolean = {
    var l = cls.getClassLoader
    while (l != null) {
      if (l.getClass.getName.contains("AbstractFileClassLoader")) return true
      l = l.getParent
    }
    false
  }

  /** Depth-bounded structural walk of a logical plan's object graph:
    * descends through Products (plan nodes, expressions, tuples, Options),
    * Iterables and Arrays — the shapes Catalyst trees are made of — and
    * class-checks every visited object, so a closure hiding anywhere in
    * the tree (MapElements.func, ScalaUDF.function, a script-defined
    * Expression node itself) is found. Leaves (SparkSession handles,
    * relations, strings) are checked but not entered, which keeps the
    * walk plan-sized. Identity-set guarded: shared subtrees visit once.
    */
  private def findGeneratedCapture(root: Any): Option[String] = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    def walk(v: Any, depth: Int): Option[String] = v match {
      case null => None
      case r: AnyRef =>
        if (depth > 256 || !seen.add(r)) None
        else if (isGeneratedClass(r.getClass)) Some(r.getClass.getName)
        else r match {
          case p: Product =>
            p.productIterator.flatMap(walk(_, depth + 1)).nextOption()
          case it: Iterable[_] =>
            it.iterator.flatMap(walk(_, depth + 1)).nextOption()
          case a: Array[_] =>
            a.iterator.flatMap(walk(_, depth + 1)).nextOption()
          case _ => None
        }
      case _ => None
    }
    walk(root, 0)
  }
}

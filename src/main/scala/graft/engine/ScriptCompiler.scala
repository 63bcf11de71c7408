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

  /** The plan-only gate: every Dataset reachable from the script's
    * result (top-level, or nested inside tuples/Seqs/Options/Maps — the
    * natural shapes of a `SparkSession => Any` contract) has its
    * UNEXECUTED plan scanned for any captured object of a
    * toolbox-generated class, refused loudly — turning the
    * would-be-cluster `ClassNotFoundException` at task-deserialization
    * time into an immediate, explainable error at script-eval time. The
    * ANALYZED plan is scanned, not the raw parse: a temp-view
    * indirection (`df.createOrReplaceTempView("v"); spark.sql("select *
    * from v")`) leaves only an UnresolvedRelation in the logical plan —
    * the captured lambda appears once the view is substituted.
    * Dataset-free results pass through: side effects the script already
    * performed are its own business (an executor-closure failure inside
    * them surfaces at that call site, not silently).
    */
  def assertPlanOnly(result: Any): Any = {
    collectDatasets(result).foreach { ds =>
      findGeneratedCapture(ds.queryExecution.analyzed).foreach { cls =>
        throw new IllegalArgumentException(
          s"script result captures the script-generated class $cls in " +
            "its plan — such classes exist only in the driver JVM, so " +
            "this plan would die with ClassNotFoundException at task " +
            "deserialization on a real cluster. Scripts must declare " +
            "plans with DataFrame/Column operations (which serialize " +
            "as Catalyst expressions); move the custom function into a " +
            "compiled, deployed jar instead")
      }
    }
    result
  }

  /** Every Dataset reachable from a script result through the shallow
    * container shapes a result realistically is (tuples, case classes,
    * Seqs, Options, Maps, Arrays). Bounded: result STRUCTURES are small;
    * the depth cap guards against pathological self-referential values,
    * not real results.
    */
  private def collectDatasets(result: Any): Seq[org.apache.spark.sql.Dataset[_]] = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    val found = Seq.newBuilder[org.apache.spark.sql.Dataset[_]]
    def walk(v: Any, depth: Int): Unit = v match {
      case null => ()
      case r: AnyRef if depth <= 16 && seen.add(r) =>
        r match {
          case ds: org.apache.spark.sql.Dataset[_] => found += ds
          case p: Product => p.productIterator.foreach(walk(_, depth + 1))
          case it: Iterable[_] => it.foreach(walk(_, depth + 1))
          case a: Array[_] => a.foreach(walk(_, depth + 1))
          case _ => ()
        }
      case _ => ()
    }
    walk(result, 0)
    found.result()
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
    * A refuse-loudly gate must not silently under-audit: if the depth
    * bound ever truncates the walk without an offender already found,
    * the gate REFUSES the script as unauditable rather than passing it.
    */
  private def findGeneratedCapture(root: Any): Option[String] = {
    var truncated = false
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    def walk(v: Any, depth: Int): Option[String] = v match {
      case null => None
      case r: AnyRef =>
        if (depth > 512) { truncated = true; None }
        else if (!seen.add(r)) None
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
    val offender = walk(root, 0)
    if (offender.isEmpty && truncated)
      throw new IllegalArgumentException(
        "script result's plan is nested deeper than the plan-only audit " +
          "bound (512 structural levels) — cannot certify it free of " +
          "script-generated classes; restructure the script or move the " +
          "job into a compiled, deployed jar")
    offender
  }
}

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
  * Cluster note: ToolBox-generated classes live only in the driver JVM, so a
  * script's lambda must not capture its own generated classes into executor
  * closures — scripts should declare plans (DataFrame ops), which serialize
  * as Catalyst expressions, not closures. That matches the reference's own
  * usage (scripts build DataFrames; `spark.repl.class.outputDir` served the
  * rare closure case, which we deliberately do not replicate).
  */
object ScriptCompiler {

  private lazy val toolbox: ToolBox[ru.type] =
    ru.runtimeMirror(getClass.getClassLoader).mkToolBox()

  private val prelude =
    """import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
      |import org.apache.spark.sql.functions._
      |""".stripMargin

  /** Compile script source that evaluates to `SparkSession => Any`.
    * Standard imports are preloaded; compilation errors throw.
    */
  def compileTask(src: String): SparkSession => Any = synchronized {
    toolbox.eval(toolbox.parse(prelude + src)).asInstanceOf[SparkSession => Any]
  }
}

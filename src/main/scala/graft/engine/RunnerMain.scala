package graft.engine

import java.time.Duration

import org.apache.spark.sql.SparkSession
import graft.GraftSession
import graft.etl.SqlRunner

/** Deployable runner — the engine's answer to the reference's
  * `InterpreterLoader.main` + `ProcessorLoader` pair (reference:
  * data-process/spark-process/src/main/scala/process/InterpreterLoader.scala:106-152,
  * src/main/script/ProcessorLoader.scala:12-22): watch a scripts directory,
  * hot-compile what changed, run what's due, journal every outcome.
  *
  *  - `*.scala` files must evaluate to `SparkSession => Any` (ToolBox
  *    compile — the reference's interpreted script type);
  *  - `*.sql` files run statement-by-statement through [[SqlRunner]]
  *    (the reference's Beeline script type), macros included;
  *  - per-script interval from a leading `-- interval: PT5M` /
  *    `// interval: PT5M` line, default PT1M
  *    (reference: annotation/ProcDescription.java:20);
  *  - journal at `<scriptsDir>/.journal` gates re-runs and records results.
  *
  * Usage: `runMain graft.engine.RunnerMain <scriptsDir> [tickMs] [maxTicks]`.
  */
object RunnerMain {

  private val IntervalRe = """(?m)^(?:--|//)\s*interval:\s*(\S+)\s*$""".r

  def intervalOf(src: String): Duration =
    IntervalRe.findFirstMatchIn(src)
      .map(m => Duration.parse(m.group(1)))
      .getOrElse(Duration.ofMinutes(1))

  /** One scheduler pass over the directory; returns (script, status). */
  def tick(spark: SparkSession, scriptsDir: String, journal: Journal,
      scalaJobs: ScriptJobs[SparkSession => Any],
      clock: () => Long = () => System.currentTimeMillis()): Seq[(String, String)] = {
    val fs = new FsUtils(spark)
    val runner = new Runner(spark, journal, clock)
    fs.ls(scriptsDir)
      .filter(p => p.endsWith(".scala") || p.endsWith(".sql"))
      .foreach { path =>
        val src = fs.cat(path)
        val job =
          if (path.endsWith(".scala"))
            Job(path, intervalOf(src), s => scalaJobs.instance(path)(s))
          else
            Job(path, intervalOf(src), s =>
              new SqlRunner(s).runScript(src)._1.map(_.status).mkString(","))
        runner.register(job)
      }
    runner.runOnce()
  }

  @volatile private[engine] var running = true

  /** Engine-level signal/exit handling (reference: process/MiscHelper.scala:31-59
    * installs TERM/HUP/INT handlers): a JVM shutdown hook — which TERM and
    * INT trigger — that stops the tick loop, closes every cached Closeable
    * script instance, and records the shutdown in the journal so an operator
    * can see a clean stop vs a crash. Returns the hook body so specs can
    * invoke it directly (idempotent).
    */
  def installShutdownHook(journal: Journal,
      scalaJobs: ScriptJobs[SparkSession => Any],
      clock: () => Long = () => System.currentTimeMillis()): () => Unit = {
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val body = () => if (done.compareAndSet(false, true)) {
      running = false
      scalaJobs.closeAll()
      val now = clock()
      try journal.save(ExecutionRecord("__engine__", now, now, "shutdown", "SUCCEED"))
      catch { case _: Exception => () } // never block JVM exit on the journal
    }
    sys.addShutdownHook(body())
    body
  }

  def main(args: Array[String]): Unit = {
    val scriptsDir = args.headOption.getOrElse(
      sys.error("usage: RunnerMain <scriptsDir> [tickMs] [maxTicks]"))
    val tickMs = args.lift(1).map(_.toLong).getOrElse(60000L)
    val maxTicks = args.lift(2).map(_.toInt).getOrElse(Int.MaxValue)
    val spark = GraftSession.local("graft-runner")
    val journal = new Journal(spark, s"$scriptsDir/.journal")
    val fs = new FsUtils(spark)
    val scalaJobs = new ScriptJobs[SparkSession => Any](
      compile = ScriptCompiler.compileTask, mtimeOf = fs.mtime, read = fs.cat)
    installShutdownHook(journal, scalaJobs)
    var i = 0
    while (i < maxTicks && running) {
      val results = tick(spark, scriptsDir, journal, scalaJobs)
      if (results.nonEmpty)
        println(results.map { case (p, s) => s"$p=$s" }.mkString("[runner] ", " ", ""))
      i += 1
      if (i < maxTicks && running) Thread.sleep(tickMs)
    }
    spark.stop()
  }
}

package graft.engine

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import graft.SparkSpec

class RunnerMainSpec extends SparkSpec {

  test("interval parsed from leading comment, default PT1M") {
    assert(RunnerMain.intervalOf("-- interval: PT5M\nSELECT 1;").toMinutes === 5)
    assert(RunnerMain.intervalOf("// interval: PT30S\n(spark: SparkSession) => 1").getSeconds === 30)
    assert(RunnerMain.intervalOf("SELECT 1;").toMinutes === 1)
  }

  test("shutdown hook stops the loop, closes script instances, journals the stop") {
    val dir = Files.createTempDirectory("graft-runner-hook").toString
    val journal = new Journal(spark, s"$dir/.journal")
    val closed = new java.util.concurrent.atomic.AtomicInteger(0)
    class ClosingTask extends (SparkSession => Any) with AutoCloseable {
      def apply(s: SparkSession): Any = 1
      def close(): Unit = closed.incrementAndGet()
    }
    val jobs = new ScriptJobs[SparkSession => Any](
      compile = _ => new ClosingTask, mtimeOf = _ => 1L, read = _ => "")
    jobs.instance("a.scala")
    jobs.instance("b.scala")
    RunnerMain.running = true
    val hook = RunnerMain.installShutdownHook(journal, jobs, () => 123456L)
    hook()
    assert(!RunnerMain.running)
    assert(closed.get() === 2)
    val rec = journal.lastExecution("__engine__").get
    assert(rec.result === "shutdown" && rec.status === "SUCCEED")
    hook() // idempotent: second invocation is a no-op
    assert(closed.get() === 2)
    RunnerMain.running = true // restore for other specs
  }

  test("tick runs scala + sql scripts, journals, gates, and hot-reloads") {
    val dir = Files.createTempDirectory("graft-runner").toString
    Files.writeString(Paths.get(s"$dir/count.scala"),
      "// interval: PT1M\n(spark: SparkSession) => spark.range(7).count()")
    Files.writeString(Paths.get(s"$dir/script.sql"),
      "-- interval: PT1M\nCREATE OR REPLACE TEMPORARY VIEW rm_v AS SELECT 42 AS x;\nSELECT x FROM rm_v;")

    var now = 1000000L
    val journal = new Journal(spark, s"$dir/.journal")
    val fs = new FsUtils(spark)
    val scalaJobs = new ScriptJobs[SparkSession => Any](
      compile = ScriptCompiler.compileTask, mtimeOf = fs.mtime, read = fs.cat)

    val r1 = RunnerMain.tick(spark, dir, journal, scalaJobs, () => now).toMap
    assert(r1.keys.exists(_.endsWith("count.scala")))
    assert(r1.values.toSet === Set("SUCCEED"))
    val scalaPath = r1.keys.find(_.endsWith("count.scala")).get
    assert(journal.lastExecution(scalaPath).get.result === "7")

    // within interval: gated
    now += 10000
    assert(RunnerMain.tick(spark, dir, journal, scalaJobs, () => now).isEmpty)

    // edit the scala script; after the interval the new version runs
    Thread.sleep(1100) // local-fs mtime granularity
    Files.writeString(Paths.get(s"$dir/count.scala"),
      "// interval: PT1M\n(spark: SparkSession) => spark.range(9).count()")
    now += 60001
    val r3 = RunnerMain.tick(spark, dir, journal, scalaJobs, () => now).toMap
    assert(r3.values.toSet === Set("SUCCEED"))
    assert(journal.lastExecution(scalaPath).get.result === "9")

    // a failing script journals FAILED but doesn't kill the tick
    Files.writeString(Paths.get(s"$dir/boom.sql"), "SELECT definitely_broken FROM nowhere;")
    now += 60001
    val r4 = RunnerMain.tick(spark, dir, journal, scalaJobs, () => now).toMap
    assert(r4.keys.exists(_.endsWith("boom.sql")))
    // sql scripts report per-statement status strings; the runner call
    // itself SUCCEEDs while recording the ERROR statement status
    val boomPath = r4.keys.find(_.endsWith("boom.sql")).get
    assert(journal.lastExecution(boomPath).get.result.contains("ERROR"))
  }
}

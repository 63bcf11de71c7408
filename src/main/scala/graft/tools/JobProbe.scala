package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Wall-clock breakdown probe: run ONE registry query with a listener
  * recording every Spark job's span, then print the job timeline plus the
  * gaps between jobs (driver-side work: planning, stream start/stop,
  * checkpoint IO, collects) — the tool that says whether an entry's time
  * is task compute or engine lifecycle. Builder-side only; the driver
  * never runs this.
  *
  * Usage: `runMain graft.tools.JobProbe <queryName> [sfDir]`
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: JobProbe <queryName> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.configure(spark)

    final case class J(id: Int, desc: String, start: Long, var end: Long)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(e.jobId, J(e.jobId, d, e.time, -1L))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
    })

    val t0 = System.currentTimeMillis()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val t1 = System.currentTimeMillis()

    import scala.jdk.CollectionConverters._
    val js = jobs.values.asScala.toSeq.sortBy(_.start)
    println(f"================ $name: total ${(t1 - t0) / 1000.0}%.2f s, ${js.size} jobs ================")
    var cursor = t0
    var gapTotal = 0L
    var jobTotal = 0L
    js.foreach { j =>
      val gap = j.start - cursor
      if (gap > 50) println(f"  [gap ${gap / 1000.0}%6.2f s]  (driver-side before job ${j.id})")
      gapTotal += math.max(0L, gap)
      val dur = (if (j.end > 0) j.end else t1) - j.start
      jobTotal += dur
      println(f"  job ${j.id}%4d ${dur / 1000.0}%6.2f s  ${j.desc.take(110)}")
      cursor = math.max(cursor, if (j.end > 0) j.end else t1)
    }
    val tail = t1 - cursor
    if (tail > 50) println(f"  [gap ${tail / 1000.0}%6.2f s]  (driver-side after last job)")
    println(f"  SUMMARY: jobs ${jobTotal / 1000.0}%.2f s, driver gaps ${(gapTotal + math.max(0L, tail)) / 1000.0}%.2f s")
    spark.stop()
  }
}

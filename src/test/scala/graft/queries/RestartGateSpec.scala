package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.Streams

/** The restart gates claim to SELF-POLICE: a broken recovery cannot
  * silently reproduce the clean answer, so the oracle hash compare is a
  * real detector, not a formality. This spec demonstrates both sides of
  * that claim on a synthetic corpus through the SAME
  * [[StreamGatesFam.runWithRestart]] lifecycle the registry entries use:
  * a clean stop/recover run lands on the exact dedup answer, and a
  * sabotaged one (the whole checkpoint wiped between incarnations — the
  * "lost offsets + lost state" operational failure) re-processes and
  * re-emits, producing duplicate rows the DISTINCT oracle would flag red.
  */
class RestartGateSpec extends SparkSpec {
  import spark.implicits._

  /** 10 keys, each arriving in ALL THREE terciles (secs ~1000 / ~4500 /
    * ~9000) — micro-batch 2 carries real duplicates (suppressed by
    * in-query state) and batch 3's arrive only after the restart, so
    * every key's final suppression depends on state surviving it.
    */
  private def mkCorpus(ss: SparkSession): DataFrame = {
    import ss.implicits._
    (0 until 10).flatMap { k =>
      Seq((k.toLong, 1000L + k), (k.toLong, 4500L + k), (k.toLong, 9000L + k))
    }.toDF("k", "sec")
      .select(col("k"), timestamp_seconds(col("sec")).as("event_time"))
  }

  private def lifecycle(tag: String, sabotage: Boolean,
      tune: SparkSession => Unit = _ => ()): Seq[Long] = {
    val scratch = java.nio.file.Files
      .createTempDirectory(s"graft-rg-$tag-src").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"graft-rg-$tag-ck").toString + "/ck"
    val out = java.nio.file.Files
      .createTempDirectory(s"graft-rg-$tag-out").toString + "/out"
    val ev = mkCorpus(spark)
    val sec = col("event_time").cast("long")
    ev.filter(sec < 4000L).write.mode("overwrite").parquet(scratch)
    def mk(sess: SparkSession): DataFrame =
      Streams.dedupWithinWatermark(
        Streams.parquetStream(sess, scratch, ev, glob = Some("*.parquet")),
        keys = Seq("k"), eventTime = "event_time", delay = "3650 days")
    val fsu = new graft.engine.FsUtils(spark)
    val result = StreamGates.runWithRestart(spark, mk, "append", ckpt, out,
      // batch 2: every key's FIRST duplicate — suppressed by in-query
      // state, so the checkpoint the restart resumes from covers two
      // data-carrying batches
      ev.filter(sec >= 4000L && sec < 5000L).write.mode("append")
        .parquet(scratch),
      {
        // batch 3: the late duplicates of every key...
        ev.filter(sec >= 5000L).write.mode("append").parquet(scratch)
        // ...and, in the sabotaged run, a wiped checkpoint between the
        // incarnations — the new query starts from scratch and
        // re-processes everything with fresh state
        if (sabotage) fsu.rm(ckpt)
      }, tune)
    lastCkpt = ckpt
    result.select(col("k")).as[Long].collect().toSeq
  }

  private var lastCkpt: String = ""

  test("clean checkpoint recovery lands on the exact dedup answer " +
      "(every key exactly once despite its duplicate arriving only " +
      "after the restart)") {
    val got = lifecycle("clean", sabotage = false)
    assert(got.sorted === (0L until 10L))
  }

  test("clean recovery under the ROCKSDB state store — the production " +
      "state backend when keyed state outgrows executor memory — lands " +
      "on the same exact answer through the same checkpoint lifecycle") {
    val got = lifecycle("rocks", sabotage = false,
      tune = _.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider"))
    assert(got.sorted === (0L until 10L))
    // the RocksDB provider really engaged: its checkpoint format writes
    // zip snapshots / changelogs, never the HDFS store's .delta files
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files
      .walk(java.nio.file.Paths.get(lastCkpt, "state"))
    val names =
      try walk.iterator().asScala.map(_.getFileName.toString).toList
      finally walk.close()
    assert(names.exists(n => n.endsWith(".zip") || n.endsWith(".changelog")),
      s"no RocksDB snapshot files under the checkpoint: $names")
    assert(!names.exists(_.endsWith(".delta")),
      "HDFS-backed store files present — the RocksDB provider did not engage")
  }

  test("a SABOTAGED recovery (checkpoint wiped between incarnations) " +
      "cannot silently reproduce the clean answer — the re-processing " +
      "re-emits keys, and the duplicate rows are exactly what the " +
      "DISTINCT oracle hash flags red") {
    val got = lifecycle("sabotage", sabotage = true)
    // same key SET (the answer looks superficially plausible)...
    assert(got.toSet === (0L until 10L).toSet)
    // ...but the lifecycle emitted duplicates: detection is guaranteed
    assert(got.size > 10,
      s"sabotaged run produced no duplicates (${got.size} rows) — the " +
        "gate would not detect this failure")
  }
}

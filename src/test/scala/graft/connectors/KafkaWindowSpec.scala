package graft.connectors

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KafkaWindowSpec extends SparkSpec {
  import spark.implicits._

  private def log = Seq(
    ("a", 0, 0L, 100L, "k1", "v1"),
    ("a", 0, 1L, 200L, "k2", "v2"),
    ("a", 1, 2L, 300L, "k3", "v3"),
    ("b", 0, 3L, 200L, "k4", "v4")
  ).toDF("t", "p", "o", "ct", "k", "v")

  test("pull window is [start, end): inclusive start, exclusive end") {
    val got = KafkaWindow.pull(log, 100L, 300L).orderBy("ct", "t")
      .as[(String, Long, String, String)].collect()
    assert(got === Array(("a", 100L, "k1", "v1"), ("a", 200L, "k2", "v2"),
      ("b", 200L, "k4", "v4")))
  }

  test("topic filter restricts the pull") {
    val got = KafkaWindow.pull(log, 0L, 1000L, "b").as[(String, Long, String, String)].collect()
    assert(got === Array(("b", 200L, "k4", "v4")))
  }

  test("null / equal / inverted windows yield empty (reference guard)") {
    assert(KafkaWindow.pull(log, null, 300L).count() === 0)
    assert(KafkaWindow.pull(log, 300L, null).count() === 0)
    assert(KafkaWindow.pull(log, 300L, 300L).count() === 0)
    assert(KafkaWindow.pull(log, 400L, 300L).count() === 0)
  }

  test("pullPattern / topicsMatching select topics by regex") {
    val got = KafkaWindow.pullPattern(log, 0L, 1000L, "^a$")
      .select("t").distinct().as[String].collect()
    assert(got === Array("a"))
    assert(KafkaWindow.topicsMatching(log, "b.*").select("t").distinct()
      .as[String].collect() === Array("b"))
    assert(KafkaWindow.pullPattern(log, null, 1000L, ".*").count() === 0)
  }

  test("topics lists distinct (t, p) pairs") {
    val got = KafkaWindow.topics(log).orderBy("t", "p").as[(String, Int)].collect()
    assert(got === Array(("a", 0), ("a", 1), ("b", 0)))
  }

  test("push records to the store with per-row acks; store reads back") {
    TopicStore.clear("spec")
    val store = TopicStore.Factory("spec")
    val acked = KafkaWindow.push(
      Seq((1L, "x"), (2L, "y")).toDF("id", "payload").repartition(2),
      store, lit("topic1"), lit(1000L) + col("id"), col("id").cast("string"),
      col("payload"))
    // no orderBy on the effectful plan: range-partition sampling would run
    // the push twice; sort driver-side instead
    val acks = acked.select($"ack.t", $"ack.ct", $"ack.k", $"ack.v")
      .as[(String, Long, String, String)].collect().sortBy(_._2)
    assert(acks === Array(("topic1", 1001L, "1", "x"), ("topic1", 1002L, "2", "y")))
    val back = KafkaWindow.fromStore(spark, store, "topic1")
      .select("ct", "k", "v").as[(Long, String, String)].collect().sortBy(_._1)
    assert(back === Array((1001L, "1", "x"), (1002L, "2", "y")))
  }

  test("pushTransactional commits a clean partition atomically") {
    TopicStore.clear("txn-ok")
    val store = TopicStore.Factory("txn-ok")
    val acked = KafkaWindow.pushTransactional(
      (1 to 6).map(i => (i.toLong, s"p$i")).toDF("id", "payload").repartition(2),
      store, lit("tx"), lit(2000L) + col("id"), col("id").cast("string"),
      col("payload"))
    assert(acked.count() === 6)
    val back = KafkaWindow.fromStore(spark, store, "tx")
      .select("ct").as[Long].collect().sorted
    assert(back === (1 to 6).map(2000L + _).toArray)
  }

  test("pushTransactional aborts on failure: no partial records visible") {
    TopicStore.clear("txn-abort")
    val store = TopicStore.Factory("txn-abort")
    // value evaluation throws mid-partition (ANSI division by zero on the
    // last row) — the drain fails before any append, so the store stays empty
    val doomed = KafkaWindow.pushTransactional(
      (1 to 5).map(i => (i.toLong, s"p$i")).toDF("id", "payload").coalesce(1),
      store, lit("tx"), lit(0L), col("id").cast("string"),
      expr("10 div (id - 5)").cast("string")) // ANSI integral ÷0 throws on id=5
    intercept[Exception](doomed.count()) // SparkArithmeticException in local mode
    assert(KafkaWindow.fromStore(spark, store, "tx").count() === 0L)
    // contrast: the per-row push would have left the pre-failure rows behind
    TopicStore.clear("row-abort")
    val rowStore = TopicStore.Factory("row-abort")
    val doomedRow = KafkaWindow.push(
      (1 to 5).map(i => (i.toLong, s"p$i")).toDF("id", "payload").coalesce(1),
      rowStore, lit("tx"), lit(0L), col("id").cast("string"),
      expr("10 div (id - 5)").cast("string")) // ANSI integral ÷0 throws on id=5
    intercept[Exception](doomedRow.count())
    assert(KafkaWindow.fromStore(spark, rowStore, "tx").count() > 0L)
  }

  test("sourceOptions realize the window contract on the real Kafka source") {
    val opts = KafkaWindow.sourceOptions("broker:9092", Seq("a", "b"),
      100L, 200L, minPartitions = Some(16))
    assert(opts("kafka.bootstrap.servers") === "broker:9092")
    assert(opts("subscribe") === "a,b")
    assert(opts("startingTimestamp") === "100")
    assert(opts("endingTimestamp") === "200")
    assert(opts("minPartitions") === "16")
  }

  test("fromEvents maps the events table to the log contract") {
    val dir = "/root/testdata/sf0.001"
    // T.events normalizes ts to BIGINT nanos (fromEvents's input contract)
    // whichever physical type the driver generated the file with
    val ev = graft.queries.T.events(spark, dir)
    val l = KafkaWindow.fromEvents(ev)
    assert(l.columns === Array("t", "p", "o", "ct", "k", "v"))
    assert(l.count() === ev.count())
    val ps = l.select("p").distinct().as[Int].collect().sorted
    assert(ps.forall(p => p >= 0 && p < 4))
  }
}

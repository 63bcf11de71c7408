package graft.connectors

import org.scalatest.funsuite.AnyFunSuite

/** Opt-in smoke test of [[KafkaWireClient]] against a REAL Kafka broker —
  * the one capability the byte-level [[FakeBroker]] specs cannot prove
  * (codec negotiation quirks, real batch framing, broker-side validation).
  *
  * The sandbox has no broker, so the suite self-cancels unless
  * `GRAFT_KAFKA_BOOTSTRAP=host:port` is exported; with it set, the suite
  * exercises the full control plane (Metadata, ListOffsets with both
  * timestamp sentinels, window resolution) and — when
  * `GRAFT_KAFKA_SMOKE_TOPIC` names a readable topic — the Fetch data
  * plane. Cancelled tests report as "canceled", not passed, so a CI run
  * with a broker wired up shows the coverage explicitly.
  *
  * Reference behavior being smoked: the listTopics/offsetsForTimes/
  * seek/poll dance of kafka/KafkaHelper.java:173-254, reimplemented as a
  * wire-protocol client in KafkaWire.scala.
  */
class KafkaWireRealBrokerSpec extends AnyFunSuite {

  private def bootstrap: Option[(String, Int)] =
    sys.env.get("GRAFT_KAFKA_BOOTSTRAP").map { hp =>
      val i = hp.lastIndexOf(':')
      require(i > 0, s"GRAFT_KAFKA_BOOTSTRAP must be host:port, got '$hp'")
      (hp.substring(0, i), hp.substring(i + 1).toInt)
    }

  private def withClient[A](f: KafkaWireClient => A): A = {
    val (host, port) = bootstrap.getOrElse(
      cancel("GRAFT_KAFKA_BOOTSTRAP not set — no broker in this environment"))
    f(new KafkaWireClient(host, port, clientId = "graft-smoke"))
  }

  test("metadata returns at least one live broker") {
    withClient { c =>
      val md = c.metadata(None)
      assert(md.brokers.nonEmpty, "broker list empty")
      assert(md.brokers.forall(b => b.host.nonEmpty && b.port > 0))
    }
  }

  test("listTopics returns distinct error-free topic-partitions") {
    withClient { c =>
      val tps = c.listTopics()
      assert(tps == tps.distinct, "duplicate topic-partitions")
      // a fresh broker may legitimately have zero topics; shape only
      assert(tps.forall { case (t, p) => t.nonEmpty && p >= 0 })
    }
  }

  test("offset sentinels bracket the log on every partition") {
    withClient { c =>
      val topic = sys.env.get("GRAFT_KAFKA_SMOKE_TOPIC")
        .orElse(c.listTopics().headOption.map(_._1))
        .getOrElse(cancel("broker has no topics to probe"))
      val earliest = c.offsetsForTimes(topic, KafkaWire.EarliestTimestamp)
      val latest = c.offsetsForTimes(topic, KafkaWire.LatestTimestamp)
      assert(earliest.keySet == latest.keySet)
      earliest.foreach { case (p, e) =>
        assert(e >= 0 && e <= latest(p),
          s"partition $p: earliest $e > latest ${latest(p)}")
      }
    }
  }

  test("a full-history window resolves to [log-start, log-end) and fetches") {
    withClient { c =>
      val topic = sys.env.getOrElse("GRAFT_KAFKA_SMOKE_TOPIC",
        cancel("GRAFT_KAFKA_SMOKE_TOPIC not set — skipping data-plane fetch"))
      val ranges = c.offsetRangeForWindow(topic, 0L, Long.MaxValue - 1)
      val earliest = c.offsetsForTimes(topic, KafkaWire.EarliestTimestamp)
      val latest = c.offsetsForTimes(topic, KafkaWire.LatestTimestamp)
      ranges.foreach { case (p, (s, e)) =>
        assert(s >= earliest(p) && e <= latest(p) && s <= e)
      }
      // Offset ranges bound the record count from above only: compaction
      // gaps and transaction control batches consume offsets without
      // yielding records on a real broker (the fake broker has neither).
      val n = ranges.values.map { case (s, e) => e - s }.sum
      val recs = c.fetchWindow(topic, ranges)
      assert(recs.size <= n,
        s"fetched ${recs.size} records, offset ranges only span $n")
      assert(recs.map(r => (r.partition, r.offset)).distinct.size == recs.size,
        "duplicate (partition, offset) in fetched window")
      // [start,end) contract: every offset inside its partition's range
      recs.foreach { r =>
        val (s, e) = ranges(r.partition)
        assert(r.offset >= s && r.offset < e)
      }
    }
  }
}

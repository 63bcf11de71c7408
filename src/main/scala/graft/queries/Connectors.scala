package graft.queries

/** Connector-backed queries (HTTP / Redis-KV / ZooKeeper-tree / Kafka-window
  * semantics against deterministic local stand-ins). Populated as the
  * connectors land.
  */
object Connectors {
  val all: Seq[Q] = Seq.empty
}

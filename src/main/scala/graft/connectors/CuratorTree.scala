package graft.connectors

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.curator.framework.{CuratorFramework, CuratorFrameworkFactory}
import org.apache.curator.retry.ExponentialBackoffRetry
import org.apache.zookeeper.KeeperException.NoNodeException

/** Real-ZooKeeper [[Tree]] binding via Apache Curator — the deployable
  * counterpart of the in-memory [[TreeStore]] stand-in. All ZkTree
  * operations (read/write/delete subtree semantics, reference
  * ZooKeeperHelper.java:52-137) run unchanged against it.
  *
  * Contract mapping:
  *  - values are UTF-8 strings (ZK stores bytes; a node created with null
  *    data reads back as "");
  *  - `children` returns ABSOLUTE paths in sorted order (ZK returns child
  *    names unordered);
  *  - `get` on a missing node is None, not an error;
  *  - `create`/`delete` are strict — ZkTree.writeTree/deleteTree already
  *    order parents-first / leaves-first, so NoNode/NodeExists here means a
  *    caller bug or an external writer, and should surface.
  *
  * Driver-side coordination metadata only (tiny trees), matching how the
  * reference uses ZooKeeper (offsets, configs) — never bulk data.
  */
class CuratorTree(client: CuratorFramework) extends Tree with AutoCloseable {

  /** Closes the underlying Curator client. */
  def close(): Unit = client.close()

  def get(path: String): Option[String] =
    try {
      val bytes = client.getData.forPath(ZkTree.norm(path))
      Some(if (bytes == null) "" else new String(bytes, UTF_8))
    } catch { case _: NoNodeException => None }

  def exists(path: String): Boolean =
    client.checkExists.forPath(ZkTree.norm(path)) != null

  def create(path: String, value: String): Unit =
    client.create().forPath(ZkTree.norm(path), value.getBytes(UTF_8))

  def setValue(path: String, value: String): Unit =
    client.setData().forPath(ZkTree.norm(path), value.getBytes(UTF_8))

  def delete(path: String): Unit =
    client.delete().forPath(ZkTree.norm(path))

  def children(path: String): Seq[String] = {
    val p = ZkTree.norm(path)
    val prefix = if (p == "/") "/" else p + "/"
    try {
      import scala.jdk.CollectionConverters._
      client.getChildren.forPath(p).asScala.toSeq.sorted.map(prefix + _)
    } catch { case _: NoNodeException => Seq.empty }
  }
}

object CuratorTree {
  /** Connects a Curator client (exponential-backoff retry, bounded) and
    * wraps it as a Tree. Caller owns the client lifecycle via `close()`.
    */
  def connect(connectString: String, sessionTimeoutMs: Int = 15000,
      connectionTimeoutMs: Int = 5000): CuratorTree = {
    val client = CuratorFrameworkFactory.newClient(
      connectString, sessionTimeoutMs, connectionTimeoutMs,
      new ExponentialBackoffRetry(100, 5))
    client.start()
    client.blockUntilConnected()
    new CuratorTree(client)
  }
}

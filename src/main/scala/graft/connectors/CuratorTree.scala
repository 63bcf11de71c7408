package graft.connectors

import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

import org.apache.curator.framework.{CuratorFramework, CuratorFrameworkFactory}
import org.apache.curator.retry.ExponentialBackoffRetry

/** Real ZooKeeper-backed [[Tree]] via Curator (the jars ship with Spark).
  *
  * This is the deployable binding behind the `zk_read` / `zk_write` /
  * `zk_delete` operators (reference manages a raw ZooKeeper handle itself:
  * data-process/hive-udfs/src/main/java/com/thenetcircle/service/data/hive/udf/zookeeper/ZooKeeperHelper.java:52-80,
  * connection watcher UDFZooKeeperWrite.java:40-55); Curator owns
  * connection lifecycle/retry here, so the operator code stays identical to
  * the in-memory [[TreeStore]] path — [[ZkTree]] only sees the [[Tree]]
  * trait.
  *
  * Semantics matched to [[TreeStore]]:
  *  - values are UTF-8 strings, absent data = empty string;
  *  - `children` returns full child paths in lexicographic order (ZooKeeper
  *    reports names unordered; the DFS read needs a stable order);
  *  - `create` requires an existing parent (ZkTree.writeTree auto-creates
  *    parents in sorted order, so no createParentsIfNeeded magic that would
  *    skip the old-value bookkeeping).
  */
class CuratorTree(val client: CuratorFramework) extends Tree with AutoCloseable {

  private def p(path: String): String = ZkTree.norm(path)

  override def get(path: String): Option[String] =
    if (client.checkExists().forPath(p(path)) == null) None
    else Option(client.getData.forPath(p(path))).map(new String(_, UTF_8)).orElse(Some(""))

  override def children(path: String): Seq[String] = {
    val base = p(path)
    val prefix = if (base == "/") "/" else base + "/"
    client.getChildren.forPath(base).asScala.toSeq.sorted.map(prefix + _)
  }

  override def create(path: String, value: String): Unit =
    client.create().forPath(p(path), value.getBytes(UTF_8))

  override def setValue(path: String, value: String): Unit =
    client.setData().forPath(p(path), value.getBytes(UTF_8))

  override def exists(path: String): Boolean =
    client.checkExists().forPath(p(path)) != null

  override def delete(path: String): Unit =
    client.delete().forPath(p(path))

  override def close(): Unit = client.close()
}

object CuratorTree {

  /** Connect and block until the session is live. The caller owns the
    * returned tree (close() releases the ZooKeeper session).
    */
  def connect(connectString: String, sessionTimeoutMs: Int = 15000,
      connectionTimeoutMs: Int = 15000): CuratorTree = {
    val client = CuratorFrameworkFactory.newClient(
      connectString, sessionTimeoutMs, connectionTimeoutMs,
      new ExponentialBackoffRetry(100, 3))
    client.start()
    client.blockUntilConnected()
    new CuratorTree(client)
  }
}

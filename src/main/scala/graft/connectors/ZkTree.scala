package graft.connectors

import java.util.concurrent.ConcurrentSkipListMap
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hierarchical key-value tree connector (ZooKeeper semantics).
  *
  * Reference surface: `zk_read` / `zk_write` / `zk_delete` UDFs + `t_zk_*`
  * UDTFs over `array<struct<p:string,v:string>>`
  * (reference: data-process/hive-udfs/src/main/java/com/thenetcircle/service/data/hive/udf/zookeeper/UDFZooKeeperRead.java:31,
  * UDFZooKeeperWrite.java:34, UDFZooKeeperDelete.java:33).
  *
  * Ported semantics (reimplemented, not copied):
  *  - recursive subtree DFS read (ZooKeeperHelper._readZKTree:52-80);
  *  - overlapping request paths deduped by prefix absorption
  *    (ZooKeeperHelper.mergePaths:150-169);
  *  - write = create-or-set in sorted path order with parent auto-create,
  *    returning old values (ZooKeeperHelper._writeZKTree:24-50, ensurePath:108-122);
  *  - delete = read subtree first, then delete leaf-first (deepest paths
  *    first), returning deleted values (ZooKeeperHelper.deleteZKTree:124-137).
  *
  * These are driver-side connector functions returning Datasets (SURVEY §2A
  * #6-10 mapping): tree mutations are tiny coordination metadata, not bulk
  * data, so they don't belong on executors. [[TreeStore]] is the in-memory
  * stand-in (FIXTURES.md §4); a Curator/ZooKeeper-backed [[Tree]] plugs into
  * the same operations.
  */
trait Tree {
  /** Value at exact path, if the node exists. */
  def get(path: String): Option[String]
  def children(path: String): Seq[String]
  def create(path: String, value: String): Unit
  def setValue(path: String, value: String): Unit
  def exists(path: String): Boolean
  def delete(path: String): Unit
}

object ZkTree {

  /** Normalize: must start with '/', no trailing '/' (except root). */
  def norm(p: String): String = {
    require(p != null && p.startsWith("/"), s"path must start with '/': $p")
    if (p.length > 1 && p.endsWith("/")) p.dropRight(1) else p
  }

  def parent(p: String): String = {
    val i = p.lastIndexOf('/')
    if (i <= 0) "/" else p.substring(0, i)
  }

  /** Sorted paths with descendants of an already-kept path absorbed
    * (reference: ZooKeeperHelper.mergePaths:150-169). "/a" absorbs "/a/b"
    * but not "/ab".
    */
  def mergePaths(paths: Seq[String]): Seq[String] = {
    val sorted = paths.filter(_ != null).map(norm).distinct.sorted
    sorted.foldLeft(Vector.empty[String]) { (kept, p) =>
      if (kept.nonEmpty &&
          (p == kept.last || p.startsWith(if (kept.last == "/") "/" else kept.last + "/")))
        kept
      else kept :+ p
    }
  }

  /** DFS of the subtree rooted at each (merged) path: (path, value) rows in
    * depth-first order; missing roots contribute nothing.
    */
  def readTree(tree: Tree, paths: Seq[String]): Seq[(String, String)] = {
    def dfs(p: String): Seq[(String, String)] =
      tree.get(p) match {
        case None => Seq.empty
        case Some(v) => (p, v) +: tree.children(p).flatMap(c => dfs(c))
      }
    mergePaths(paths).flatMap(dfs)
  }

  /** Create-or-set each (path, value) in sorted path order with parent
    * auto-create (parents get empty-string values); returns previous values
    * (null where the node is new) in write order.
    */
  def writeTree(tree: Tree, pathValues: Map[String, String]): Seq[(String, String)] = {
    def ensure(p: String): Unit =
      if (p != "/" && !tree.exists(p)) { ensure(parent(p)); tree.create(p, "") }
    pathValues.toSeq.map { case (p, v) => (norm(p), v) }.sortBy(_._1).map { case (p, v) =>
      val old = tree.get(p).orNull
      if (old == null) { ensure(parent(p)); tree.create(p, v) }
      else tree.setValue(p, v)
      (p, old)
    }
  }

  /** Read each subtree, then delete its nodes deepest-first; returns the
    * deleted (path, value) rows.
    */
  def deleteTree(tree: Tree, paths: Seq[String]): Seq[(String, String)] = {
    val doomed = readTree(tree, paths)
    doomed.sortBy { case (p, _) => -p.count(_ == '/') * 1000000 - p.length }
      .foreach { case (p, _) => tree.delete(p) }
    doomed
  }

  // ----------------------------------------------------------- DataFrame API

  def read(spark: SparkSession, tree: Tree, paths: String*): DataFrame = {
    import spark.implicits._
    readTree(tree, paths).toDF("p", "v")
  }

  def write(spark: SparkSession, tree: Tree, pathValues: Map[String, String]): DataFrame = {
    import spark.implicits._
    writeTree(tree, pathValues).toDF("p", "v")
  }

  def delete(spark: SparkSession, tree: Tree, paths: String*): DataFrame = {
    import spark.implicits._
    deleteTree(tree, paths).toDF("p", "v")
  }
}

/** In-memory [[Tree]]: sorted path map, children derived by range scan.
  * JVM-global registry keyed by name so queries and tests get isolated trees.
  */
class TreeStore extends Tree {
  private val nodes = new ConcurrentSkipListMap[String, String]()
  nodes.put("/", "")

  def get(path: String): Option[String] = Option(nodes.get(ZkTree.norm(path)))
  def exists(path: String): Boolean = nodes.containsKey(ZkTree.norm(path))
  def create(path: String, value: String): Unit = {
    val p = ZkTree.norm(path)
    require(p == "/" || nodes.containsKey(ZkTree.parent(p)), s"no parent for $p")
    nodes.put(p, value)
  }
  def setValue(path: String, value: String): Unit = nodes.put(ZkTree.norm(path), value)
  def delete(path: String): Unit = nodes.remove(ZkTree.norm(path))
  def children(path: String): Seq[String] = {
    val p = ZkTree.norm(path)
    val prefix = if (p == "/") "/" else p + "/"
    // iterator(), not asScala on the set: the Set wrapper's takeWhile/filter
    // rebuild into an unordered HashSet and lose the skip-list sort order
    nodes.keySet().tailSet(prefix, false).iterator().asScala
      .takeWhile(_.startsWith(prefix))
      .filter(k => !k.substring(prefix.length).contains('/'))
      .toList
  }
  def size: Int = nodes.size()
}

object TreeStore {
  private val registry = TrieMap.empty[String, TreeStore]
  def named(name: String): TreeStore = registry.getOrElseUpdate(name, new TreeStore)
  def drop(name: String): Unit = registry.remove(name)
}

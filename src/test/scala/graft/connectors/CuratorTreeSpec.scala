package graft.connectors

import java.net.InetSocketAddress
import java.nio.file.Files

import org.apache.zookeeper.server.{NIOServerCnxnFactory, ZooKeeperServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Live test of the Curator-backed Tree against a REAL in-process ZooKeeper
  * server (the zookeeper jar ships the embeddable server), proving the
  * binding is deployable — not just compile-checked. Every ZkTree
  * operation (subtree read, parent-auto-create write with old values,
  * leaf-first delete) runs unchanged against it and agrees with the
  * in-memory TreeStore semantics the oracle queries are gated on.
  */
class CuratorTreeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var factory: NIOServerCnxnFactory = _
  private var zks: ZooKeeperServer = _
  private var tree: CuratorTree = _

  override def beforeAll(): Unit = {
    val dir = Files.createTempDirectory("graft-zk").toFile
    zks = new ZooKeeperServer(dir, dir, 2000)
    factory = new NIOServerCnxnFactory()
    factory.configure(new InetSocketAddress("127.0.0.1", 0), 16)
    factory.startup(zks)
    tree = CuratorTree.connect(s"127.0.0.1:${zks.getClientPort}")
  }

  override def afterAll(): Unit = {
    if (tree != null) tree.close()
    if (factory != null) factory.shutdown()
    if (zks != null) zks.shutdown()
  }

  test("writeTree against live ZK: parent auto-create, old values returned") {
    val out1 = ZkTree.writeTree(tree, Map("/graft/a/b/c" -> "1"))
    assert(out1 === Seq("/graft/a/b/c" -> null))
    assert(tree.get("/graft/a") === Some("")) // auto-created parent
    val out2 = ZkTree.writeTree(tree, Map("/graft/a/b/c" -> "2", "/graft/a/b" -> "x"))
    assert(out2.toMap === Map("/graft/a/b/c" -> "1", "/graft/a/b" -> ""))
    assert(tree.get("/graft/a/b/c") === Some("2"))
  }

  test("readTree DFS over live ZK: sorted absolute child paths, DFS order") {
    ZkTree.writeTree(tree, Map(
      "/graft/r/a/x" -> "1", "/graft/r/a/y" -> "2", "/graft/r/b" -> "3"))
    val rows = ZkTree.readTree(tree, Seq("/graft/r"))
    assert(rows === Seq(
      "/graft/r" -> "",
      "/graft/r/a" -> "",
      "/graft/r/a/x" -> "1",
      "/graft/r/a/y" -> "2",
      "/graft/r/b" -> "3"))
    // overlapping request paths absorb into the subtree root
    assert(ZkTree.readTree(tree, Seq("/graft/r/a", "/graft/r")) === rows)
  }

  test("deleteTree against live ZK: leaf-first, returns deleted values, gone after") {
    ZkTree.writeTree(tree, Map("/graft/d/k1" -> "v1", "/graft/d/k1/sub" -> "v2"))
    val deleted = ZkTree.deleteTree(tree, Seq("/graft/d"))
    assert(deleted.toMap === Map(
      "/graft/d" -> "", "/graft/d/k1" -> "v1", "/graft/d/k1/sub" -> "v2"))
    assert(!tree.exists("/graft/d"))
    assert(ZkTree.readTree(tree, Seq("/graft/d")) === Seq.empty)
  }

  test("missing nodes: get None, children empty, exists false") {
    assert(tree.get("/graft/nope") === None)
    assert(tree.children("/graft/nope") === Seq.empty)
    assert(!tree.exists("/graft/nope"))
  }

  test("agrees with the in-memory TreeStore on the same operation sequence") {
    val mem = new TreeStore
    val ops = Map("/graft/eq/a" -> "1", "/graft/eq/b/c" -> "2", "/graft/eq" -> "root")
    val wLive = ZkTree.writeTree(tree, ops)
    val wMem = ZkTree.writeTree(mem, ops)
    assert(wLive === wMem)
    assert(ZkTree.readTree(tree, Seq("/graft/eq")) === ZkTree.readTree(mem, Seq("/graft/eq")))
    assert(ZkTree.deleteTree(tree, Seq("/graft/eq")) === ZkTree.deleteTree(mem, Seq("/graft/eq")))
  }
}

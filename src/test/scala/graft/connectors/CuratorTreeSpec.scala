package graft.connectors

import java.net.InetSocketAddress
import java.nio.file.Files

import org.apache.zookeeper.server.{ServerCnxnFactory, ZooKeeperServer}
import graft.SparkSpec

/** Drives the real Curator-backed [[Tree]] against an embedded ZooKeeper
  * server (the server classes ship in Spark's zookeeper jar) — the full
  * deployable path, zero egress: real sessions, real znodes, real watches-
  * free reads, through the same [[ZkTree]] operators the oracle queries use.
  */
object EmbeddedZk {
  lazy val port: Int = {
    System.setProperty("zookeeper.admin.enableServer", "false") // no 8080 admin
    val dir = Files.createTempDirectory("graft-zk").toFile
    val zks = new ZooKeeperServer(dir, dir, 2000)
    val cnxn = ServerCnxnFactory.createFactory(new InetSocketAddress("127.0.0.1", 0), 60)
    cnxn.startup(zks)
    sys.addShutdownHook(cnxn.shutdown())
    cnxn.getLocalPort
  }
}

class CuratorTreeSpec extends SparkSpec {

  private lazy val tree: CuratorTree = CuratorTree.connect(s"127.0.0.1:${EmbeddedZk.port}")

  override def afterAll(): Unit = { tree.close(); super.afterAll() }

  test("writeTree creates parents, returns old values; readTree DFS matches TreeStore") {
    val pvs = Map("/ct/a/x" -> "1", "/ct/a/y" -> "2", "/ct/b" -> "3")
    val w1 = ZkTree.writeTree(tree, pvs)
    assert(w1.map(_._2) === Seq(null, null, null)) // all new
    assert(tree.get("/ct") === Some("")) // parent auto-created, empty value

    val mem = TreeStore.named("curator-mirror")
    ZkTree.writeTree(mem, pvs)
    assert(ZkTree.readTree(tree, Seq("/ct")) === ZkTree.readTree(mem, Seq("/ct")))
    assert(ZkTree.readTree(tree, Seq("/ct")) === Seq(
      "/ct" -> "", "/ct/a" -> "", "/ct/a/x" -> "1", "/ct/a/y" -> "2", "/ct/b" -> "3"))

    val w2 = ZkTree.writeTree(tree, Map("/ct/b" -> "30"))
    assert(w2 === Seq("/ct/b" -> "3")) // overwrite returns the old value
    TreeStore.drop("curator-mirror")
  }

  test("deleteTree removes the subtree leaf-first and returns deleted rows") {
    ZkTree.writeTree(tree, Map("/cd/r/n1" -> "a", "/cd/r/n2" -> "b"))
    val deleted = ZkTree.deleteTree(tree, Seq("/cd"))
    assert(deleted.toSet === Set(
      "/cd" -> "", "/cd/r" -> "", "/cd/r/n1" -> "a", "/cd/r/n2" -> "b"))
    assert(!tree.exists("/cd"))
    assert(ZkTree.readTree(tree, Seq("/cd")) === Seq.empty) // missing root reads empty
  }

  test("mergePaths absorption holds against the live server") {
    ZkTree.writeTree(tree, Map("/cm/a/x" -> "1", "/cm/ab" -> "2"))
    // "/cm/a" absorbs "/cm/a/x" but not the sibling "/cm/ab"
    val rows = ZkTree.readTree(tree, Seq("/cm/a", "/cm/a/x", "/cm/ab"))
    assert(rows === Seq("/cm/a" -> "", "/cm/a/x" -> "1", "/cm/ab" -> "2"))
  }
}

package graft.connectors

import scala.util.Random
import graft.SparkSpec

class ZkTreeSpec extends SparkSpec {

  private def fresh(name: String): TreeStore = {
    TreeStore.drop(name)
    TreeStore.named(name)
  }

  test("mergePaths absorbs descendants of kept paths (reference mergePaths)") {
    assert(ZkTree.mergePaths(Seq("/a/b", "/a", "/a/b/c", "/ab", "/b")) ===
      Seq("/a", "/ab", "/b"))
    assert(ZkTree.mergePaths(Seq("/", "/x")) === Seq("/"))
    assert(ZkTree.mergePaths(Seq("/x", "/x")) === Seq("/x"))
  }

  test("mergePaths property: no kept path is a descendant of another") {
    val rnd = new Random(5)
    for (_ <- 1 to 50) {
      val paths = (1 to rnd.nextInt(12)).map { _ =>
        "/" + (1 to 1 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString("/")
      }
      val kept = ZkTree.mergePaths(paths)
      for (a <- kept; b <- kept if a != b)
        assert(!b.startsWith(if (a == "/") "/" else a + "/"),
          s"$b is a descendant of $a in $kept (input $paths)")
      // every input path is covered by some kept ancestor-or-self
      paths.map(ZkTree.norm).foreach { p =>
        assert(kept.exists(k => p == k || p.startsWith(if (k == "/") "/" else k + "/")))
      }
    }
  }

  test("writeTree auto-creates parents and returns old values") {
    val t = fresh("zk-write")
    val out1 = ZkTree.writeTree(t, Map("/a/b/c" -> "1"))
    assert(out1 === Seq("/a/b/c" -> null))
    assert(t.get("/a") === Some("")) // parent auto-created with empty value
    assert(t.get("/a/b") === Some(""))
    val out2 = ZkTree.writeTree(t, Map("/a/b/c" -> "2", "/a/b" -> "x"))
    assert(out2.toMap === Map("/a/b/c" -> "1", "/a/b" -> "")) // previous values
    assert(t.get("/a/b/c") === Some("2"))
  }

  test("readTree DFS over merged paths; missing roots contribute nothing") {
    val t = fresh("zk-read")
    ZkTree.writeTree(t, Map("/a/x" -> "1", "/a/y" -> "2", "/b" -> "3"))
    val rows = ZkTree.readTree(t, Seq("/a", "/a/x", "/missing"))
    assert(rows === Seq("/a" -> "", "/a/x" -> "1", "/a/y" -> "2"))
  }

  test("deleteTree removes leaf-first and returns deleted rows") {
    val t = fresh("zk-del")
    ZkTree.writeTree(t, Map("/a/b/c" -> "1", "/a/b/d" -> "2", "/a/e" -> "3"))
    val deleted = ZkTree.deleteTree(t, Seq("/a/b"))
    assert(deleted.toMap === Map("/a/b" -> "", "/a/b/c" -> "1", "/a/b/d" -> "2"))
    assert(t.get("/a/b").isEmpty)
    assert(t.get("/a/e") === Some("3"))
    assert(t.get("/a") === Some(""))
  }

  test("children are immediate only, sibling prefixes not confused") {
    val t = fresh("zk-child")
    ZkTree.writeTree(t, Map("/a/b" -> "1", "/a/bc" -> "2", "/a/b/d" -> "3"))
    assert(t.children("/a") === Seq("/a/b", "/a/bc"))
    assert(t.children("/a/b") === Seq("/a/b/d"))
  }
}

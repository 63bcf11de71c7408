package graft.connectors

import java.io.{BufferedOutputStream, DataInputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** In-process Redis-compatible stand-in speaking real RESP2 over a socket,
  * so [[RespKvClient]]'s wire protocol is exercised end-to-end with zero
  * egress. Implements exactly the verbs the engine uses.
  */
object MiniRespServer {

  final class Handle(val port: Int, server: ServerSocket,
      val store: TrieMap[String, (String, Long)]) extends AutoCloseable {
    override def close(): Unit = server.close()
  }

  def start(tlsContext: Option[javax.net.ssl.SSLContext] = None): Handle = {
    val server = tlsContext.fold(new ServerSocket()) {
      _.getServerSocketFactory.createServerSocket()
    }
    server.bind(new InetSocketAddress("127.0.0.1", 0))
    val store = TrieMap.empty[String, (String, Long)]
    val acceptor = new Thread(() => {
      try while (true) {
        val sock = server.accept()
        val t = new Thread(() => serve(sock, store), "mini-resp-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () } // server closed
    }, "mini-resp-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    new Handle(server.getLocalPort, server, store)
  }

  private def live(store: TrieMap[String, (String, Long)], k: String): Option[String] =
    store.get(k) match {
      case Some((v, exp)) if exp > System.currentTimeMillis() => Some(v)
      case Some(_) => store.remove(k); None
      case None => None
    }

  private def serve(sock: Socket, store: TrieMap[String, (String, Long)]): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    def line(): String = {
      val sb = new java.lang.StringBuilder
      var c = in.read()
      while (c != '\r' && c >= 0) { sb.append(c.toChar); c = in.read() }
      in.read() // '\n'
      sb.toString
    }
    def readCmd(): Option[Seq[String]] = {
      val first = in.read()
      if (first < 0) return None
      require(first == '*', s"expected array, got ${first.toChar}")
      val n = line().toInt
      Some(Seq.fill(n) {
        require(in.read() == '$', "expected bulk string")
        val len = line().toInt
        val buf = new Array[Byte](len)
        in.readFully(buf)
        in.read(); in.read() // CRLF
        new String(buf, UTF_8)
      })
    }
    def bulk(s: String): Unit =
      if (s == null) out.write("$-1\r\n".getBytes(UTF_8))
      else {
        val b = s.getBytes(UTF_8)
        out.write(s"$$${b.length}\r\n".getBytes(UTF_8)); out.write(b)
        out.write("\r\n".getBytes(UTF_8))
      }
    def simple(s: String): Unit = out.write(s"+$s\r\n".getBytes(UTF_8))
    def integer(n: Long): Unit = out.write(s":$n\r\n".getBytes(UTF_8))
    def array(xs: Seq[String]): Unit = {
      out.write(s"*${xs.length}\r\n".getBytes(UTF_8)); xs.foreach(bulk)
    }

    try {
      var open = true
      while (open) readCmd() match {
        case None => open = false
        case Some(cmd) =>
          val now = System.currentTimeMillis()
          cmd.head.toUpperCase match {
            case "GET" => bulk(live(store, cmd(1)).orNull)
            case "SET" =>
              val (k, v) = (cmd(1), cmd(2))
              val opts = cmd.drop(3).map(_.toUpperCase)
              val guard = opts.find(o => o == "NX" || o == "XX")
              val exp = opts.zipWithIndex.collectFirst {
                case ("EX", i) => now + cmd(4 + i).toLong * 1000
                case ("PX", i) => now + cmd(4 + i).toLong
              }.getOrElse(Long.MaxValue)
              val exists = live(store, k).isDefined
              val allowed = guard.forall(g => if (g == "NX") !exists else exists)
              if (!allowed) bulk(null)
              else { store.put(k, (v, exp)); simple("OK") }
            case "DEL" =>
              integer(cmd.tail.count(k =>
                live(store, k).isDefined && store.remove(k).isDefined).toLong)
            case "MGET" => array(cmd.tail.map(k => live(store, k).orNull))
            case "MSET" =>
              cmd.tail.grouped(2).foreach { case Seq(k, v) =>
                store.put(k, (v, Long.MaxValue))
              }
              simple("OK")
            case "KEYS" =>
              val re = InMemoryKv.globToRegex(cmd(1))
              array(store.keys.filter(k =>
                live(store, k).isDefined && re.matcher(k).matches()).toSeq.sorted)
            case "QUIT" => simple("OK"); open = false
            case other => out.write(s"-ERR unknown command $other\r\n".getBytes(UTF_8))
          }
          out.flush()
      }
    } catch { case _: Exception => () } finally sock.close()
  }
}

class RespKvSpec extends SparkSpec {
  import spark.implicits._

  private lazy val server = MiniRespServer.start()
  private def client() = new RespKvClient("127.0.0.1", server.port)

  override def afterAll(): Unit = { server.close(); super.afterAll() }

  test("set/get/mget/del/keys roundtrip over the real RESP socket protocol") {
    val c = client()
    try {
      assert(c.set("a", "1") === "OK")
      assert(c.mset(Seq("b" -> "2", "c" -> "3")) === "OK")
      assert(c.get("a") === "1")
      assert(c.get("missing") === null)
      assert(c.mget(Seq("a", "missing", "c")) === Seq("1", null, "3"))
      assert(c.keys("*").toSet === Set("a", "b", "c"))
      assert(c.keys("[ab]") === Seq("a", "b"))
      assert(c.del(Seq("a", "missing")) === 1L)
      assert(c.get("a") === null)
    } finally c.close()
  }

  test("set5 NX/XX guards and PX expiry over the wire") {
    val c = client()
    try {
      assert(c.set5("nx1", "v1", "NX", null, 0) === "OK")
      assert(c.set5("nx1", "v2", "NX", null, 0) === null) // exists: NX fails
      assert(c.set5("nx1", "v3", "XX", null, 0) === "OK") // exists: XX ok
      assert(c.get("nx1") === "v3")
      assert(c.set5("gone", "v", "XX", null, 0) === null) // absent: XX fails
      assert(c.set5("ttl", "v", null, "PX", 80) === "OK")
      assert(c.get("ttl") === "v")
      Thread.sleep(150)
      assert(c.get("ttl") === null)
    } finally c.close()
  }

  test("binary-safe values: multibyte UTF-8 and CRLF inside a value survive") {
    val c = client()
    try {
      val tricky = "héllo\r\nwörld 世界"
      assert(c.set("bin", tricky) === "OK")
      assert(c.get("bin") === tricky)
    } finally c.close()
  }

  test("DataFrame enrichment through RespKvFactory (one client per partition)") {
    val c = client()
    try c.mset((0 until 10).map(i => s"rk:$i" -> s"val$i")) finally c.close()
    val out = Kv.withGet(
        (0 until 10).map(_.toLong).toDF("id"),
        concat(lit("rk:"), col("id")),
        RespKvFactory("127.0.0.1", server.port))
      .select("id", "ret").as[(Long, String)].collect().sortBy(_._1)
    assert(out === (0 until 10).map(i => (i.toLong, s"val$i")).toArray)
  }

  test("TLS: the RESP roundtrip works over an SSL-wrapped socket; an " +
      "untrusting client refuses the handshake (no silent plaintext " +
      "fallback); hostname verification rejects a wrong-SAN cert unless " +
      "explicitly disabled") {
    val (serverCtx, clientCtx) = KafkaWireSpec.makeTlsContexts()
    val tlsSrv = MiniRespServer.start(Some(serverCtx))
    try {
      val c = new RespKvClient("127.0.0.1", tlsSrv.port,
        tls = Some(clientCtx))
      try {
        assert(c.set("tk", "tv") === "OK")
        assert(c.get("tk") === "tv")
      } finally c.close()
      // a client with an empty trust set must fail the handshake
      val untrusting = javax.net.ssl.SSLContext.getInstance("TLS")
      untrusting.init(null, null, null) // JDK default trust — not our cert
      intercept[Exception] {
        val bad = new RespKvClient("127.0.0.1", tlsSrv.port,
          tls = Some(untrusting))
        try bad.get("tk") finally bad.close()
      }
    } finally tlsSrv.close()
    // cert for a DIFFERENT name: verification on (default) rejects,
    // explicit opt-out connects — the KafkaWireClient contract
    val (wrongCtx, trustWrong) =
      KafkaWireSpec.makeTlsContexts(san = "DNS:graft-somewhere-else")
    val wrongSrv = MiniRespServer.start(Some(wrongCtx))
    try {
      intercept[Exception] {
        val bad = new RespKvClient("127.0.0.1", wrongSrv.port,
          tls = Some(trustWrong))
        try bad.get("tk") finally bad.close()
      }
      val lax = new RespKvClient("127.0.0.1", wrongSrv.port,
        tls = Some(trustWrong), tlsVerifyHostname = false)
      try assert(lax.set("lk", "lv") === "OK") finally lax.close()
    } finally wrongSrv.close()
  }

  test("RespTls descriptor builds an executor-local context from a " +
      "truststore file (the serializable factory path)") {
    // the shared helper writes the truststore ON DISK — the factory
    // ships only PATHS, the shape a cluster job distributes with --files
    val m = KafkaWireSpec.makeTlsMaterial()
    val srv = MiniRespServer.start(Some(m.serverCtx))
    try {
      val f = RespKvFactory("127.0.0.1", srv.port,
        tls = Some(RespTls(m.truststorePath, m.storePass)))
      val c = f.open()
      try {
        assert(c.set("pk", "pv") === "OK")
        assert(c.get("pk") === "pv")
      } finally c.close()
    } finally srv.close()
  }

  test("credential redaction: RespTls/RespKvFactory toString never renders " +
      "the truststore password or AUTH secret (these descriptors ride in " +
      "task closures — executor task-failure messages stringify them)") {
    val tls = RespTls("/etc/ts.p12", "s3cretPass")
    assert(!tls.toString.contains("s3cretPass"))
    assert(tls.toString.contains("/etc/ts.p12")) // non-secrets stay visible
    val f = RespKvFactory("h", 6379, auth = Some("authSecret"),
      tls = Some(tls))
    assert(!f.toString.contains("authSecret"))
    assert(!f.toString.contains("s3cretPass"))
    assert(f.toString.contains("h") && f.toString.contains("6379"))
    // the copy() path (case-class machinery) must not resurrect a leak
    assert(!f.copy(port = 6380).toString.contains("authSecret"))
  }
}

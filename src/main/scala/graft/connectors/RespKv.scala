package graft.connectors

import java.io.{BufferedOutputStream, DataInputStream, EOFException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** Real Redis binding for [[KvClient]]: a minimal RESP2 protocol client over
  * a raw socket — no driver dependency, deployable against any Redis-
  * compatible server (the reference binds Jedis:
  * data-process/hive-udfs/src/main/java/com/thenetcircle/service/data/hive/udf/redis/JedisUDTF.java:79-89;
  * the verb surface UDTFJedisGet.java:17 … UDTFJedisKeys.java:20).
  *
  * One client per partition via [[RespKvFactory]] + `Kv.with*` (the
  * reference's one-connection-per-operator lifecycle); the socket is closed
  * by the task-completion listener through `KvClient.close`.
  *
  * RESP2 is framed text: requests are arrays of bulk strings
  * (`*N\r\n$len\r\n<bytes>\r\n…`), replies are simple strings (`+OK`),
  * errors (`-ERR …`), integers (`:n`), bulk strings (`$len` / `$-1` = null)
  * or arrays (`*n` / `*-1` = null).
  */
class RespKvClient(host: String, port: Int, timeoutMs: Int = 3000,
    auth: Option[String] = None,
    tls: Option[javax.net.ssl.SSLContext] = None,
    tlsVerifyHostname: Boolean = true) extends KvClient {

  /** With `tls` set the plaintext connection is wrapped in an SSLSocket
    * and the handshake completes BEFORE any RESP bytes — including AUTH,
    * so the password never travels in clear (the managed-Redis TLS
    * deployment shape). Certificate chain validation comes from the
    * supplied SSLContext; hostname verification is ON by default (raw
    * SSLSockets skip it unless asked, which would accept any trusted
    * cert for any host) — same contract as
    * [[KafkaWireClient]]'s `tls`/`tlsVerifyHostname`.
    */
  // One guard covers connect → TLS wrap/handshake → stream acquisition:
  // a failure at ANY of those steps must not leak the descriptor (executor
  // tasks retry per partition and would exhaust FDs). Closing the plain
  // socket also closes a TLS wrapper created over it (autoClose), and
  // vice versa.
  private val (socket: Socket, in: DataInputStream,
      out: BufferedOutputStream) = {
    val plain = new Socket()
    try {
      plain.connect(new InetSocketAddress(host, port), timeoutMs)
      plain.setSoTimeout(timeoutMs)
      val s = tls.fold(plain) { ctx =>
        val ss = ctx.getSocketFactory
          .createSocket(plain, host, port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        if (tlsVerifyHostname) {
          val params = ss.getSSLParameters
          params.setEndpointIdentificationAlgorithm("HTTPS")
          ss.setSSLParameters(params)
        }
        ss.startHandshake()
        ss
      }
      (s, new DataInputStream(s.getInputStream),
        new BufferedOutputStream(s.getOutputStream))
    } catch {
      case e: Throwable =>
        try plain.close() catch { case _: Exception => () }
        throw e
    }
  }
  // AUTH runs over the established streams — same no-leak contract
  try auth.foreach(pw => expectOk(command("AUTH", pw)))
  catch {
    case e: Throwable =>
      try socket.close() catch { case _: Exception => () }
      throw e
  }

  // ------------------------------------------------------------ wire format

  private def command(args: String*): Any = {
    out.write(s"*${args.length}\r\n".getBytes(UTF_8))
    args.foreach { a =>
      val bytes = a.getBytes(UTF_8)
      out.write(s"$$${bytes.length}\r\n".getBytes(UTF_8))
      out.write(bytes)
      out.write('\r'); out.write('\n')
    }
    out.flush()
    readReply()
  }

  private def readLine(): String = {
    val sb = new java.lang.StringBuilder
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new EOFException("connection closed mid-reply")
      sb.append(c.toChar)
      c = in.read()
    }
    if (in.read() != '\n') throw new java.io.IOException("malformed RESP line end")
    sb.toString
  }

  private def readReply(): Any = {
    val t = in.read()
    if (t < 0) throw new EOFException("connection closed")
    t.toChar match {
      case '+' => readLine()
      case '-' => throw new java.io.IOException(s"server error: ${readLine()}")
      case ':' => readLine().toLong
      case '$' =>
        val n = readLine().toInt
        if (n < 0) null
        else {
          val buf = new Array[Byte](n)
          in.readFully(buf)
          if (in.read() != '\r' || in.read() != '\n')
            throw new java.io.IOException("malformed bulk string end")
          new String(buf, UTF_8)
        }
      case '*' =>
        val n = readLine().toInt
        if (n < 0) null else Seq.fill(n)(readReply())
      case other => throw new java.io.IOException(s"unknown RESP type byte: $other")
    }
  }

  private def expectOk(r: Any): String = r match {
    case s: String => s
    case null => null
    case other => throw new java.io.IOException(s"unexpected reply: $other")
  }

  private def asSeq(r: Any): Seq[String] = r match {
    case null => Seq.empty
    case s: Seq[_] => s.map(x => if (x == null) null else x.toString)
    case other => throw new java.io.IOException(s"unexpected reply: $other")
  }

  // ---------------------------------------------------------------- verbs

  override def get(k: String): String = command("GET", k).asInstanceOf[String]

  override def set(k: String, v: String): String = expectOk(command("SET", k, v))

  override def set5(k: String, v: String, nxxx: String, expx: String, time: Long): String = {
    val guard = Option(nxxx).filter(_.nonEmpty).map(_.toUpperCase)
    guard.foreach(g => require(g == "NX" || g == "XX", s"bad nxxx: $g"))
    val exp = Option(expx).filter(_.nonEmpty).map(_.toUpperCase)
    exp.foreach(e => require(e == "EX" || e == "PX", s"bad expx: $e"))
    val args = Seq("SET", k, v) ++ guard.toSeq ++
      exp.toSeq.flatMap(e => Seq(e, time.toString))
    expectOk(command(args: _*))
  }

  override def del(ks: Seq[String]): Long =
    if (ks.isEmpty) 0L else command("DEL" +: ks: _*).asInstanceOf[Long]

  override def mget(ks: Seq[String]): Seq[String] =
    if (ks.isEmpty) Seq.empty else asSeq(command("MGET" +: ks: _*))

  override def mset(kvs: Seq[(String, String)]): String =
    if (kvs.isEmpty) "OK"
    else expectOk(command("MSET" +: kvs.flatMap { case (k, v) => Seq(k, v) }: _*))

  override def keys(globPattern: String): Seq[String] =
    asSeq(command("KEYS", globPattern)).sorted

  override def close(): Unit = {
    try { command("QUIT"); () } catch { case _: Exception => () }
    socket.close()
  }
}

/** Serializable recipe: opens one RESP connection per executor partition. */
/** Serializable TLS descriptor for executor-side RESP clients: an
  * SSLContext cannot ship in a task closure, so the factory carries the
  * truststore PATH (distribute the file with `--files`; it must resolve on
  * every executor) and each task builds its context locally.
  */
case class RespTls(truststorePath: String, storePass: String,
    storeType: String = "PKCS12", verifyHostname: Boolean = true) {

  /** Case-class toString would print `storePass` verbatim — and these
    * descriptors ride in task closures, so executor task-FAILURE messages
    * (which stringify the closure's fields) and driver logs would leak the
    * credential. Redacted here, NOT at the log-config layer: every render
    * path (exceptions, debug strings, plan dumps) goes through toString.
    */
  override def toString: String =
    s"RespTls($truststorePath, ***, $storeType, $verifyHostname)"

  def context(): javax.net.ssl.SSLContext = {
    val st = java.security.KeyStore.getInstance(storeType)
    val in = java.nio.file.Files.newInputStream(
      java.nio.file.Paths.get(truststorePath))
    try st.load(in, storePass.toCharArray) finally in.close()
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(st)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }
}

case class RespKvFactory(host: String, port: Int, timeoutMs: Int = 3000,
    auth: Option[String] = None,
    tls: Option[RespTls] = None) extends KvClientFactory {

  /** Same redaction contract as [[RespTls.toString]]: the AUTH password
    * must never render in task-failure messages or logs.
    */
  override def toString: String =
    s"RespKvFactory($host, $port, $timeoutMs, " +
      s"${auth.map(_ => "***")}, $tls)"

  def open(): KvClient = new RespKvClient(host, port, timeoutMs, auth,
    tls.map(_.context()), tls.forall(_.verifyHostname))
}

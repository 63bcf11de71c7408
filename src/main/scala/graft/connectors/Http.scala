package graft.connectors

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HTTP reach-out for SQL/DataFrame pipelines.
  *
  * Reference surface: `http_get` / `http_post` scalar UDFs and the
  * `t_http_get` / `t_http_post` one-client-per-operator UDTFs
  * (reference: data-process/hive-udfs/src/main/java/com/thenetcircle/service/data/hive/udf/http/UDFHttpGet.java:31,
  * UDTFHttpGet.java:29; result struct + error contract HttpHelper.java:41-59).
  *
  * Spark-native restatement:
  *  - result is a `struct<code:int, headers:map<string,string>, content:string>`
  *    column appended to the input row (the reference's trailing-`ctx` protocol
  *    dissolves — input columns simply survive);
  *  - failures never kill the job: error rows are `(-1, null, message)`;
  *  - the client is cached per executor JVM (JDK HttpClient is thread-safe and
  *    has no close()), which is the reference's one-client-per-operator
  *    rationale (reference: README.md:96-105) taken one step further;
  *  - everything is `asNondeterministic`-style: these run once per surviving
  *    row, and Spark must not reorder/duplicate them past filters.
  *
  * At-least-once caveat for effectful calls (POST): Spark retries failed
  * tasks, so side effects may repeat — same contract as the reference, which
  * runs under Hive task retries; disable speculation on sink stages.
  */
/** `struct<code, headers, content>` result row; error rows are
  * `(-1, null, message)` (reference: hive-udfs/.../http/HttpHelper.java:41-59).
  */
case class HttpResult(code: Int, headers: Map[String, String], content: String)

object Http {

  val resultType: StructType = StructType(Seq(
    StructField("code", IntegerType),
    StructField("headers", MapType(StringType, StringType)),
    StructField("content", StringType)))

  /** Default connect+request timeout, reference's 3000 ms
    * (reference: hive-udfs/.../http/UDFHttpGet.java:34).
    */
  val DefaultTimeoutMs = 3000

  // One client per (JVM, timeout): thread-safe, shared by all partitions.
  @transient private lazy val clients =
    new java.util.concurrent.ConcurrentHashMap[Int, HttpClient]()

  private def client(timeoutMs: Int): HttpClient =
    clients.computeIfAbsent(timeoutMs, t =>
      HttpClient.newBuilder()
        .connectTimeout(Duration.ofMillis(t.toLong))
        .followRedirects(HttpClient.Redirect.NORMAL)
        .build())

  private def request(url: String, timeoutMs: Int, headers: Map[String, String],
      post: Option[String]): HttpRequest = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs.toLong))
    headers.foreach { case (k, v) => b.header(k, v) }
    post.fold(b.GET())(body => b.POST(HttpRequest.BodyPublishers.ofString(body)))
    b.build()
  }

  /** GET/POST one URL; never throws — error rows are (-1, null, message)
    * (reference error contract: hive-udfs/.../http/HttpHelper.java:53-59).
    */
  def fetchResult(url: String, timeoutMs: Int = DefaultTimeoutMs,
      headers: Map[String, String] = Map.empty,
      postBody: Option[String] = None): HttpResult =
    try {
      val resp = client(timeoutMs).send(
        request(url, timeoutMs, headers, postBody),
        HttpResponse.BodyHandlers.ofString())
      val hs = resp.headers().map().asScala.map { case (k, vs) =>
        k -> vs.asScala.mkString(",")
      }.toMap
      HttpResult(resp.statusCode(), hs, resp.body())
    } catch {
      case e: Exception => HttpResult(-1, null, String.valueOf(e.getMessage))
    }

  def fetch(url: String, timeoutMs: Int = DefaultTimeoutMs,
      headers: Map[String, String] = Map.empty,
      postBody: Option[String] = None): Row = {
    val r = fetchResult(url, timeoutMs, headers, postBody)
    Row(r.code, r.headers, r.content)
  }

  /** Appends `resultCol: struct<code,headers,content>` with the GET response
    * for `url` evaluated per row. mapPartitions-based: rows stream through one
    * shared client, no collect, scales with the number of partitions.
    */
  def withGet(df: DataFrame, url: Column, timeoutMs: Int = DefaultTimeoutMs,
      headers: Map[String, String] = Map.empty,
      resultCol: String = "resp"): DataFrame =
    withFetch(df, url, lit(null).cast("string"), timeoutMs, headers, resultCol, post = false)

  /** POST variant: `body` is evaluated per row and sent as a string entity. */
  def withPost(df: DataFrame, url: Column, body: Column,
      timeoutMs: Int = DefaultTimeoutMs,
      headers: Map[String, String] = Map.empty,
      resultCol: String = "resp"): DataFrame =
    withFetch(df, url, body, timeoutMs, headers, resultCol, post = true)

  private def withFetch(df: DataFrame, url: Column, body: Column, timeoutMs: Int,
      headers: Map[String, String], resultCol: String, post: Boolean): DataFrame = {
    // HTTP is latency-bound: concurrency = partition count, and the rows
    // must be SPREAD across those partitions (a prior filter can leave a
    // "wide" input with all rows in one partition, serializing the fetch).
    // So: always round-robin repartition — it rebalances skew — to
    // max(default parallelism, current width), which never NARROWS a
    // deliberately wide input (its width is the caller's requested
    // concurrency). The `df.rdd` partition-count probe materializes the
    // physical plan (under AQE it may run upstream exchanges), a one-time
    // cost that is noise next to per-row network round-trips.
    val par = df.sparkSession.sparkContext.defaultParallelism
    val widened = df.repartition(math.max(par, df.rdd.getNumPartitions))
    val in = widened.withColumn("__graft_url", url).withColumn("__graft_body", body)
    val n = in.schema.size
    val outSchema = StructType(df.schema.fields :+ StructField(resultCol, resultType))
    in.mapPartitions { rows =>
      rows.map { r =>
        val u = r.getString(n - 2)
        val b = if (post) Option(r.getString(n - 1)) else None
        val res =
          if (u == null) Row(-1, null, "null url")
          else fetch(u, timeoutMs, headers, b.orElse(Some("")).filter(_ => post))
        Row.fromSeq(r.toSeq.dropRight(2) :+ res)
      }
    }(Encoders.row(outSchema))
  }
}

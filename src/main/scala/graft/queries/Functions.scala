package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle queries for the registered SQL-function surface (SURVEY §2A rows
  * 3, 12, 14–15, 26–28): `cfgs`, `kf_consumer_cfgs` / `kf_producer_cfgs`,
  * `url_encode`/`url_decode`, and the `udf_test` / `gudf_tests` /
  * `udtf_tests` probes. Each emits only values a DuckDB oracle can
  * reconstruct from the source tables plus documented constants.
  */
object Functions {

  /** Renders a map<string,string> column as "k=v;…" sorted by key, so a
    * map-valued function result becomes one deterministic string (the
    * oracle-compare contract stringifies collection outputs).
    */
  private def mapAsString(m: String): String =
    s"array_join(transform(array_sort(map_entries($m)), e -> concat(e.key, '=', e.value)), ';')"

  /** cfgs(regex) session-conf snapshot + the constant Kafka default maps
    * (reference: hive-udfs/.../commons/UDFCfgs.java:24,
    * kafka/UDFKafkaDefaultConsumerCfgs.java:17, UDFKafkaDefaultProducerCfgs.java:17).
    */
  def fnCfgs(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("graft.test.alpha", "A1")
    s.conf.set("graft.test.beta", "B2")
    T(s, dir, "region").select(col("r_regionkey"))
      .withColumn("session_cfgs", expr(mapAsString("cfgs('graft\\\\.test\\\\..*')")))
      .withColumn("consumer_cfgs", expr(mapAsString("kf_consumer_cfgs()")))
      .withColumn("producer_cfgs", expr(mapAsString("kf_producer_cfgs()")))
      .orderBy(col("r_regionkey"))
  }

  val fnCfgsOracle: String =
    """SELECT r_regionkey,
      |  'graft.test.alpha=A1;graft.test.beta=B2' AS session_cfgs,
      |  'auto.offset.reset=earliest;enable.auto.commit=false;max.partition.fetch.bytes=2097152;max.poll.records=1000' AS consumer_cfgs,
      |  'acks=all;compression.type=gzip;request.timeout.ms=1000' AS producer_cfgs
      |FROM region
      |ORDER BY r_regionkey""".stripMargin

  /** url_encode percent-encoding (space→'+', '&'→%26, '+'→%2B, '/'→%2F —
    * java.net.URLEncoder form rules, reference:
    * hive-udfs/.../http/UDFUrlEncoder.java:26) plus a url_decode roundtrip.
    */
  def fnUrlEncode(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      .withColumn("enc", expr("url_encode(concat(n_name, ' &+/', n_nationkey))"))
      .withColumn("roundtrip",
        expr("url_decode(url_encode(concat(n_name, ' #', n_nationkey))) = concat(n_name, ' #', n_nationkey)"))
      .select(col("n_nationkey"), col("enc"), col("roundtrip"))
      .orderBy(col("n_nationkey"))

  val fnUrlEncodeOracle: String =
    """SELECT n_nationkey,
      |  replace(n_name, ' ', '+') || '+%26%2B%2F' || n_nationkey AS enc,
      |  true AS roundtrip
      |FROM nation
      |ORDER BY n_nationkey""".stripMargin

  /** udf_test / gudf_tests evaluation-site probes: the host/thread prefix is
    * execution-dependent, so the oracle checks the deterministic part (the
    * rendered args) plus the contract that a host was reported.
    */
  def fnProbe(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "nation")
      .withColumn("p1", expr("udf_test(n_nationkey, n_name)"))
      .withColumn("p2", expr("gudf_tests(n_name)"))
      .select(col("n_nationkey"),
        regexp_extract(col("p1"), "args=\\[(.*)\\]$", 1).as("probe_args"),
        col("p2").startsWith("host=").as("probe_on_host"))
      .orderBy(col("n_nationkey"))

  val fnProbeOracle: String =
    """SELECT n_nationkey,
      |  CAST(n_nationkey AS VARCHAR) || ',' || n_name AS probe_args,
      |  true AS probe_on_host
      |FROM nation
      |ORDER BY n_nationkey""".stripMargin

  /** udtf_tests generator probe: one output row per argument (the reference
    * UDTF's forward-per-arg contract).
    */
  def fnUdtfExplode(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "region")
      .select(col("r_regionkey"), expr("udtf_tests(r_name, r_regionkey)").as("part"))
      .orderBy(col("r_regionkey"), col("part"))

  val fnUdtfExplodeOracle: String =
    """SELECT r_regionkey, part FROM (
      |  SELECT r_regionkey, unnest([r_name, CAST(r_regionkey AS VARCHAR)]) AS part
      |  FROM region) t
      |ORDER BY r_regionkey, part""".stripMargin

  val all: Seq[Q] = Seq(
    Q("fn_cfgs", fnCfgs, Some(fnCfgsOracle)),
    Q("fn_url_encode", fnUrlEncode, Some(fnUrlEncodeOracle)),
    Q("fn_probe", fnProbe, Some(fnProbeOracle)),
    Q("fn_udtf_explode", fnUdtfExplode, Some(fnUdtfExplodeOracle))
  )
}

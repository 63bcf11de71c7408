package graft.functions

import scala.util.Random
import graft.SparkSpec

/** Property-style checks use a fixed-seed Random (scalatestplus is not in the
  * offline cache, so plain loops stand in for ScalaCheck's forAll).
  */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("m_add is LAST_WIN map union (reference UDFMapAdd semantics)") {
    val out = spark.sql(
      "SELECT m_add(map('a','1','b','2'), map('b','9'), map('c','3')) AS m")
      .as[Map[String, String]].head()
    assert(out === Map("a" -> "1", "b" -> "9", "c" -> "3"))
  }

  test("m_add last-wins even under the default EXCEPTION dedup policy") {
    // the extension deploy path doesn't pin spark.sql.mapKeyDedupPolicy, so
    // m_add must not depend on the session conf
    val prev = spark.conf.get("spark.sql.mapKeyDedupPolicy")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    try {
      val m = spark.sql("SELECT m_add(map('a','1'), map('a','9','b','2')) AS m")
        .as[Map[String, String]].head()
      assert(m === Map("a" -> "9", "b" -> "2"))
    } finally spark.conf.set("spark.sql.mapKeyDedupPolicy", prev)
  }

  test("m_add LAST_WIN property: later maps overwrite earlier keys") {
    val rnd = new Random(42)
    for (_ <- 1 to 20) {
      val m1 = (1 to rnd.nextInt(6)).map(_ => s"k${rnd.nextInt(8)}" -> rnd.nextInt(100).toString).toMap
      val m2 = (1 to rnd.nextInt(6)).map(_ => s"k${rnd.nextInt(8)}" -> rnd.nextInt(100).toString).toMap
      val merged = Seq((m1, m2)).toDF("a", "b")
        .selectExpr("m_add(a, b) AS m").as[Map[String, String]].head()
      assert(merged === m1 ++ m2)
    }
  }

  test("m_add wide arity: a 200-child call evaluates under codegen with " +
      "split gather functions (no 64 KB method blowup), interpreted agrees") {
    // The reference fn is n-ary varargs, so wide calls are in-contract.
    // CODEGEN_ONLY forbids the silent fall-back to interpreted evaluation,
    // so a Janino method-too-large failure would surface as a thrown error
    // instead of quietly passing.
    val args = (0 until 200).map(i => s"map('k${i % 50}','v$i')").mkString(", ")
    def run(): Map[String, String] =
      spark.range(1).selectExpr(s"m_add($args) AS m")
        .as[Map[String, String]].head()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val gen =
      try run()
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    // last win: for key k_j the winning child is i = 150 + j
    assert(gen.size === 50)
    for (j <- 0 until 50) assert(gen(s"k$j") === s"v${150 + j}")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp =
      try run()
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    assert(interp === gen)

    // The split itself fires in a plain codegen context (the non-WSCG
    // projection path — exactly where a huge-method WSCG compile falls
    // back to, so that fallback now succeeds instead of re-failing Janino).
    // Inside WholeStageCodegen, splitExpressionsWithCurrentInputs inlines
    // by design; WSCG's own hugeMethodLimit check handles that case.
    val ctx = new org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
    val kids = (0 until 200).map(i =>
      org.apache.spark.sql.catalyst.expressions.CreateMap(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal(s"k${i % 50}"),
        org.apache.spark.sql.catalyst.expressions.Literal(s"v$i"))))
    org.apache.spark.sql.graft.MapUnionLastWin(kids).genCode(ctx)
    assert(ctx.declareAddedFunctions().contains("mAddGather"))
  }

  test("redactPii masks emails, IPs, digit runs — and leaves clean text alone") {
    val out = Seq(
      "reach me at jane.doe+x@mail.example.org today",
      "server 192.168.1.250 answered",
      "call 55512345678 now",
      "short 123456 stays, year 2024 stays",
      "no pii here at all"
    ).toDF("t").select(TextFunctions.redactPii($"t").as("r")).as[String].collect()
    assert(out(0) === "reach me at <EMAIL> today")
    assert(out(1) === "server <IP> answered")
    assert(out(2) === "call <NUM> now")
    assert(out(3) === "short 123456 stays, year 2024 stays")
    assert(out(4) === "no pii here at all")
  }

  test("luhnValid: known-valid PANs pass, off-by-one checksums fail, " +
      "short/empty strings fail; panCandidates takes 13-19 digit runs only") {
    val cases = Seq(
      ("4111111111111111", true),  // classic Visa test PAN
      ("4111111111111112", false), // checksum off by one
      ("79927398713", true),       // the canonical Luhn example
      ("79927398714", false),
      ("0000000000000000", true),  // all zeros sum to 0
      ("", false)
    ).toDF("c", "expect")
    val got = cases.select($"expect",
        TextFunctions.luhnValid($"c").as("got"))
      .as[(Boolean, Boolean)].collect()
    got.foreach { case (e, g) => assert(e === g) }
    val cands = Seq(Tuple1(
      "pay 4111111111111111 ord 123456789012 big 12345678901234567890 x"))
      .toDF("t").select(TextFunctions.panCandidates($"t"))
      .head().getSeq[String](0)
    // 12 digits too short, 20 too long — only the 16-digit run qualifies
    assert(cands === Seq("4111111111111111"))
  }

  test("canonicalUrl: fragment dropped, scheme/host lowercased (path case " +
      "kept), default ports stripped, tracking params removed, params " +
      "sorted, empty path -> /, emptied query dropped") {
    val got = Seq(
      "HTTPS://WWW.Example.COM:443/Path/X?b=2&utm_source=x&a=1#frag",
      "https://www.example.com/Path/X?a=1&b=2",
      "http://Host.com:80",
      "https://h.io:8443/p?utm_campaign=c&fbclid=f&gclid=g",
      "https://h.io/p?z=1&y=2&utmx=keep"
    ).toDF("u").select(TextFunctions.canonicalUrl($"u").as("c"))
      .as[String].collect().toSeq
    assert(got(0) === "https://www.example.com/Path/X?a=1&b=2")
    assert(got(1) === got(0)) // the dedup collapse this exists for
    assert(got(2) === "http://host.com/")
    assert(got(3) === "https://h.io:8443/p") // non-default port KEPT
    // utmx is NOT utm_-prefixed (literal underscore, not a wildcard)
    assert(got(4) === "https://h.io/p?utmx=keep&y=2&z=1")
  }

  test("canonicalUrl: userinfo keeps its case (RFC 3986) and never " +
      "defeats the default-port strip; IPv6 hosts strip ports too; a " +
      "trailing newline cannot split the fragment regex across engines") {
    val got = Seq(
      "https://Alice@h.io/p",          // userinfo case preserved
      "https://alice@h.io/p",
      "https://bob@Example.COM:443/p", // ':' after '@' must still strip
      "https://[::1]:443/p",           // IPv6 colon must still strip
      "https://h.io/p#frag\n"          // trailing newline: frag fully gone
    ).toDF("u").select(TextFunctions.canonicalUrl($"u").as("c"))
      .as[String].collect().toSeq
    assert(got(0) === "https://Alice@h.io/p")
    assert(got(1) === "https://alice@h.io/p")
    assert(got(0) !== got(1)) // distinct resources stay distinct
    assert(got(2) === "https://bob@example.com/p")
    assert(got(3) === "https://[::1]/p")
    assert(got(4) === "https://h.io/p")
  }

  test("luhnValid: NULL input reads NOT VALID (false), never NULL — the " +
      "NOT-filter contract") {
    val out = Seq(Some("4111111111111111"), None)
      .toDF("c")
      .select(TextFunctions.luhnValid($"c").as("v"))
      .collect()
    assert(out(0).getBoolean(0) === true)
    assert(!out(1).isNullAt(0) && out(1).getBoolean(0) === false)
  }

  test("repetitionStats: duplicate-segment and top-segment fractions are exact ratios") {
    val df = Seq(
      (1L, "a b. a b. c d"), // 3 segments, 2 unique: dup 1/3, top 2/3
      (2L, "x. y. z")        // all unique
    ).toDF("doc_id", "text")
    val got = graft.operators.TextIndex.repetitionStats(df, $"doc_id", $"text")
      .orderBy("id").as[(Long, Long, Long, Double, Double)].collect()
    assert(got(0) === ((1L, 3L, 2L, 1.0 / 3.0, 2.0 / 3.0)))
    assert(got(1) === ((2L, 3L, 3L, 0.0, 1.0 / 3.0)))
  }

  test("chunkTokens: sliding windows with overlap, clamped tail, short-doc whole chunk") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // exact fit: last = t7..t10
      (2L, (1 to 9).map(i => s"t$i").mkString(" ")),  // ragged tail: last = t7..t9
      (3L, "a b c")                                   // shorter than one window
    ).toDF("id", "text")
    val got = graft.operators.TextIndex.chunks(df, $"id", $"text", window = 4, stride = 2)
      .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2))
    assert(got.filter(_._1 == 1).map(_._3).toSeq === Seq(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10"))
    assert(got.filter(_._1 == 2).map(_._3).toSeq === Seq(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9"))
    assert(got.filter(_._1 == 3).map(_._3).toSeq === Seq("a b c"))
    // every consecutive pair overlaps by window - stride tokens
    val c1 = got.filter(_._1 == 1).map(_._3.split(" ").toSeq).toSeq
    c1.sliding(2).foreach { w => assert(w(0).takeRight(2) === w(1).take(2)) }
  }

  test("max_with is argmax: returns data paired with the max sort key") {
    val df = Seq((1, "low"), (9, "high"), (5, "mid")).toDF("k", "v")
    assert(df.selectExpr("max_with(k, v) AS w").as[String].head() === "high")
  }

  test("max_with ≡ max_by(data, key) over random data incl. partial/merge") {
    val rnd = new Random(7)
    for (_ <- 1 to 10) {
      val xs = (1 to (1 + rnd.nextInt(40))).map(_ => (rnd.nextInt(1000), rnd.nextInt(1000)))
      val df = xs.toDF("k", "v").repartition(3) // force partial + merge paths
      val r = df.selectExpr("max_with(k, v) AS a", "max_by(v, k) AS b").head()
      assert(r.getInt(0) === r.getInt(1))
    }
  }

  test("cfgs() returns conf snapshot filtered by constant regex") {
    val m = spark.sql("SELECT cfgs('spark.sql.mapKeyDedupPolicy') AS c")
      .as[Map[String, String]].head()
    assert(m === Map("spark.sql.mapKeyDedupPolicy" -> "LAST_WIN"))
  }

  test("kf_consumer_cfgs / kf_producer_cfgs constant maps") {
    val c = spark.sql("SELECT kf_consumer_cfgs() AS c").as[Map[String, String]].head()
    assert(c("auto.offset.reset") === "earliest")
    assert(c("max.poll.records") === "1000")
    val p = spark.sql("SELECT kf_producer_cfgs() AS p").as[Map[String, String]].head()
    assert(p("compression.type") === "gzip")
  }

  test("url_encode built-in roundtrip (reference UDFUrlEncoder)") {
    val rnd = new Random(11)
    val samples = Seq("", "a b", "x?&=%#/y", "üñïçødé ✓", "a+b c") ++
      (1 to 10).map(_ => rnd.nextString(rnd.nextInt(20)))
    samples.foreach { s =>
      val roundtrip = Seq(Tuple1(s)).toDF("s")
        .selectExpr("url_decode(url_encode(s)) AS r").as[String].head()
      assert(roundtrip === s, s"roundtrip failed for ${s.toList}")
    }
  }

  test("cosine_sim SQL function: orthogonal, parallel, zero-norm") {
    val row = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS orth,
        |       cosine_sim(array(CAST(2.0 AS FLOAT)), array(CAST(4.0 AS FLOAT))) AS par,
        |       cosine_sim(array(CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS zero
        |""".stripMargin).head()
    assert(row.getDouble(0) === 0.0)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
    assert(row.isNullAt(2))
  }

  test("text-pipeline natives are SQL-callable: lang_scores, " +
      "shingle_fps32, cdc_chunks; int args must be constants") {
    val row = spark.sql(
      """SELECT lang_scores('the cat and the dog') AS ls,
        |       shingle_fps32(split('a b c d', ' '), 3) AS fps,
        |       cdc_chunks(split('a b c d e f', ' '), 3, 2) AS chunks
        |""".stripMargin).head()
    assert(row.getStruct(0).getInt(0) === 3) // en hits: the, and, the
    assert(row.getSeq[Long](1).length === 2) // 4 tokens → 2 trigrams
    val chunks = row.getSeq[org.apache.spark.sql.Row](2)
    assert(chunks.map(_.getInt(1)).sum === 6) // chunks tile all 6 tokens
    // SQL form == column form (same expressions underneath)
    val viaCol = Seq("the cat and the dog").toDF("t")
      .select(graft.functions.TextFunctions.langScores(
        org.apache.spark.sql.functions.col("t")).getField("en"))
      .head().getInt(0)
    assert(viaCol === 3)
    intercept[Exception] {
      spark.sql("SELECT cdc_chunks(split('a b', ' '), 3, CAST(rand()*2 AS INT))")
        .head()
    }
    // windowed_lang_labels: one label per window of `window` tokens
    val wl = spark.sql(
      "SELECT windowed_lang_labels(split('the cat and a dog der und', ' '), 4)")
      .head().getSeq[String](0)
    assert(wl === Seq("en", "de")) // [the cat and a] -> en; [dog der und] -> de
    // multi_pattern_hits: varargs patterns, counts in pattern order
    val mp = spark.sql(
      "SELECT multi_pattern_hits('aaa xabx', 'aa', 'ab')")
      .head().getSeq[Int](0)
    assert(mp === Seq(2, 1)) // overlapping "aa" twice; one "ab"
    // word_dropout_keep / span_corrupt: SQL form matches the column form
    val wd = spark.sql(
      "SELECT word_dropout_keep(split('a b c d e', ' '), 7L, 'sd', 7)")
      .head().getSeq[String](0)
    val wdCol = Seq((7L, "a b c d e")).toDF("id", "text")
      .select(org.apache.spark.sql.graft.PatternFunctions.wordDropoutKeep(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " "),
        org.apache.spark.sql.functions.col("id"), "sd", 7))
      .head().getSeq[String](0)
    assert(wd === wdCol)
    val sc = spark.sql(
      "SELECT span_corrupt(split('a b c d e f g h', ' '), 3L, 't5', 3, 2).n_spans")
      .head().getInt(0)
    assert(sc >= 0)
    // INT ids coerce at analysis (ExpectsInputTypes): before the contract
    // was declared this was a runtime ClassCastException from SQL
    val wdInt = spark.sql(
      "SELECT word_dropout_keep(split('a b c d e', ' '), 7, 'sd', 7)")
      .head().getSeq[String](0)
    assert(wdInt === wd)
    val scInt = spark.sql(
      "SELECT span_corrupt(split('a b c d e f g h', ' '), 3, 't5', 3, 2).n_spans")
      .head().getInt(0)
    assert(scInt === sc)
    intercept[Exception] {
      spark.sql("SELECT multi_pattern_hits('x', rand()::VARCHAR)").head()
    }
    // char_ngram_dim_counts: SQL form matches the column-form kernel and
    // the kernel params must be literals
    val cn = spark.sql(
      "SELECT char_ngram_dim_counts('abcab', 3, 16)")
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getLong(1)))
    val cnCol = Seq(Tuple1("abcab")).toDF("t")
      .select(org.apache.spark.sql.graft.CharNgramDimCounts
        .charNgramDimCounts(org.apache.spark.sql.functions.col("t"), 3, 16))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(cn === cnCol && cn.map(_._2).sum === 3L) // 3 grams of "abcab"
    intercept[Exception] {
      spark.sql("SELECT char_ngram_dim_counts('x', 3, CAST(rand()*4 AS INT))")
        .head()
    }
    // prefix_cosines: varargs prefix dims + the full cosine last,
    // element-equal to cosine_sim over slices
    val pc = spark.sql(
      "SELECT prefix_cosines(array(1.0f, 1.0f, 0.0f), " +
        "array(1.0f, 0.0f, 1.0f), 1, 2)")
      .head().getSeq[java.lang.Double](0)
    val pcRef = spark.sql(
      "SELECT array(cosine_sim(array(1.0f), array(1.0f)), " +
        "cosine_sim(array(1.0f, 1.0f), array(1.0f, 0.0f)), " +
        "cosine_sim(array(1.0f, 1.0f, 0.0f), array(1.0f, 0.0f, 1.0f)))")
      .head().getSeq[java.lang.Double](0)
    assert(pc === pcRef)
  }

  test("cosine_sim null on length mismatch; matches scala reference fold") {
    val rnd = new Random(3)
    val a = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val b = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val got = Seq((a, b)).toDF("a", "b").selectExpr("cosine_sim(a, b) AS c").as[Double].head()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- 0 until 16) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
    }
    assert(got === dot / (math.sqrt(na) * math.sqrt(nb)))
    val mismatch = Seq((a, b.take(8))).toDF("a", "b")
      .selectExpr("cosine_sim(a, b) AS c").head()
    assert(mismatch.isNullAt(0))
  }

  private def strip(s: String): String =
    Seq(s).toDF("t")
      .select(TextFunctions.stripMarkup(org.apache.spark.sql.functions.col("t"))
        .as("c"))
      .as[String].head()

  test("stripMarkup: tags become token boundaries, attributes vanish") {
    assert(strip("""<p class="big">Hello<br/>world</p>""") === "Hello world")
    assert(strip("a<b>c") === "a c")
    assert(strip("no markup at all") === "no markup at all")
  }

  test("stripMarkup decodes entities exactly one level") {
    assert(strip("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;") ===
      """a & b <tag> "q" 's'""")
    // double-escaped: &amp;lt; is the TEXT "&lt;", not a decoded <
    assert(strip("x &amp;lt;y") === "x &lt;y")
    assert(strip("a&nbsp;b") === "a b")
  }

  test("stripMarkup collapses whitespace runs and trims") {
    assert(strip("  a\n\n\tb   c\r\n  ") === "a b c")
    assert(strip("<div>\n  <p>x</p>\n</div>") === "x")
    assert(strip("") === "")
    assert(strip("<only></tags>") === "")
  }

  test("stripMarkup: an unclosed tag drops the rest (lossy by design)") {
    assert(strip("keep <unclosed forever") === "keep <unclosed forever")
    // a '<' with no '>' anywhere matches no tag — the text survives;
    // with a later '>' everything between is consumed as one tag
    assert(strip("keep <a b c> tail") === "keep tail")
  }
}

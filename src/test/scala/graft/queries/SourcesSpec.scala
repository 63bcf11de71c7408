package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Source-format roundtrips beyond parquet/ORC (§2B scan coverage): CSV with
  * header/schema inference and JSON lines, plus schema-on-read behaviors.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv write/read roundtrip with header and explicit schema") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/out"
    val df = Seq((1L, "a,comma", 1.5), (2L, "plain", -0.25)).toDF("id", "s", "x")
    df.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema("id LONG, s STRING, x DOUBLE").csv(dir)
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(back === Array((1L, "a,comma", 1.5), (2L, "plain", -0.25)))
  }

  test("json lines roundtrip preserves nested structs and arrays") {
    val dir = Files.createTempDirectory("graft-json").toString + "/out"
    val df = Seq((1L, Seq(1, 2, 3), ("x", 9))).toDF("id", "arr", "nested")
    df.write.json(dir)
    val back = spark.read.json(dir)
      .select(col("id"), col("arr"), col("nested._1").as("s"), col("nested._2").as("n"))
      .orderBy("id").as[(Long, Seq[Long], String, Long)].head()
    assert(back === ((1L, Seq(1L, 2L, 3L), "x", 9L)))
  }

  test("text source reads lines; from_json applies schema on read") {
    val dir = Files.createTempDirectory("graft-text").toString + "/out"
    Seq("""{"k":1,"v":"one"}""", """{"k":2,"v":"two"}""").toDF("value")
      .write.text(dir)
    val parsed = spark.read.text(dir)
      .select(from_json(col("value"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT, v STRING")).as("j"))
      .select(col("j.k"), col("j.v")).orderBy("k")
      .as[(Int, String)].collect()
    assert(parsed === Array((1, "one"), (2, "two")))
  }
}

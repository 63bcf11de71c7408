package graft

import java.nio.file.Files
import java.time.Duration

import org.apache.spark.sql.functions._

class PinsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "a b c a b", 0L), (1L, "a b c d e", 1L), (2L, "x y z x y", 0L),
    (3L, "a b c d e", 0L), (4L, "p q r s t", 1L)
  ).toDF("doc_id", "text", "split")

  test("back-to-back pinning operators hold storage until unpinAll " +
      "releases it at the materialization boundary") {
    Pins.unpinAll() // drain pins left behind by earlier suites
    val bleu = operators.TextIndex.selfBleu(docs, col("doc_id"), col("text"))
    assert(bleu.count() === 5)
    val leak = operators.Diagnostics.splitLeakReport(
      docs, col("split"), col("text"))
    val leakRows = leak.collect()
    // docs 1 and 3 are exact duplicates across splits 1 and 0
    assert(leakRows.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      Seq((0L, 1L)))
    // both operators' internal frames are still pinned (the back-to-back
    // accumulation the Runner-level release exists to stop)
    assert(Pins.livePinCount >= 2)
    assert(Pins.unpinAll() >= 2)
    assert(Pins.livePinCount === 0)
    // released pins only cost recompute — results stay correct
    assert(bleu.count() === 5)
    assert(leak.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      Seq((0L, 1L)))
  }

  test("Runner releases engine pins after every scheduled job") {
    Pins.unpinAll()
    val journal = new engine.Journal(spark,
      Files.createTempDirectory("graft-pins-journal").toString + "/j")
    val runner = new engine.Runner(spark, journal)
    runner.register(engine.Job("bleu", Duration.ZERO, s =>
      operators.TextIndex.selfBleu(docs, col("doc_id"), col("text")).count()))
    runner.register(engine.Job("boom", Duration.ZERO, s => {
      operators.Diagnostics.splitLeakReport(docs, col("split"), col("text"))
        .count()
      throw new RuntimeException("job failed AFTER pinning")
    }))
    val results = runner.runOnce().toMap
    assert(results === Map("bleu" -> "SUCCEED", "boom" -> "FAILED"))
    // pins are freed after each job — including the failing one
    assert(Pins.livePinCount === 0)
  }
}

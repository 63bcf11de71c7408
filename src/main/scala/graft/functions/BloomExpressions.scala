// Bloom-filter bridge. Lives under org.apache.spark.sql.graft to reach
// Spark's internal BloomFilterAggregate / BloomFilterMightContain — the
// codegen'd pair the optimizer itself uses for runtime filtering
// (InjectRuntimeFilter). We expose them as explicit Column builders so an
// operator can build a bloom over a small "needle" set once and prefilter a
// huge corpus scan with a map-only, codegen'd membership probe.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.{BinaryType, LongType}

object BloomFunctions {

  /** 64-bit hash BloomFilterAggregate expects: same XxHash64(seed=42) the
    * optimizer's runtime-filter rewrite feeds it.
    */
  def keyHash(key: Column): Column =
    Bridge.column(new XxHash64(Seq(Bridge.expr(key))))

  /** Aggregates `keyHash(key)` longs into one serialized bloom filter
    * (binary). Distributed build: partial blooms are OR-merged map-side, so
    * the shuffle carries one `numBits/8`-byte buffer per partition
    * regardless of row count.
    *
    * `expectedItems`/`numBits` are capped by Spark at
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` / `maxNumBits`
    * (defaults 4M / 67M) — raise those confs for bigger needle sets.
    */
  def bloomAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(
      Bridge.expr(hashed),
      Literal(expectedItems, LongType),
      Literal(numBits, LongType)).toAggregateExpression())

  /** Codegen'd membership probe of `keyHash(key)` against a driver-held
    * serialized bloom embedded as a literal (deserialized once per task,
    * like a broadcast). No false negatives; false-positive rate is the
    * `fpp` the bloom was sized for.
    */
  def mightContain(bloomBytes: Array[Byte], hashed: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), Bridge.expr(hashed)))
}

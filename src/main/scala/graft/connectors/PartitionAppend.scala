package graft.connectors

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{StructField, StructType}

/** Shared shape for effectful per-row enrichment: append one computed field
  * to every row, with a connector client opened once per partition and closed
  * on task completion (success or failure) — the Spark-native version of the
  * reference's open-once/close-once UDTF rationale
  * (reference: README.md:96-105; close() leak noted in SURVEY.md §7.4.5 is
  * avoided via TaskContext.addTaskCompletionListener).
  */
object PartitionAppend {

  /** `inputs` are evaluated as extra columns; `open()` runs once per
    * partition and returns (perRowFn over the input values, close).
    */
  def apply(df: DataFrame, inputs: Seq[Column], out: StructField)
      (open: () => (Seq[Any] => Any, () => Unit)): DataFrame = {
    val in = inputs.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(s"__graft_in_$i", c)
    }
    val base = df.schema.size
    val nIn = inputs.size
    val outSchema = StructType(df.schema.fields :+ out)
    in.mapPartitions { rows =>
      val (fn, close) = open()
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => close()))
      rows.map { r =>
        val args = (0 until nIn).map(i => r.get(base + i))
        Row.fromSeq(r.toSeq.take(base) :+ fn(args))
      }
    }(Encoders.row(outSchema))
  }
}

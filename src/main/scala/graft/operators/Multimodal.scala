package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted through a batched
  * partition-level codec interface.
  *
  * [[ImageIoCodec]] is a REAL image decode path (JDK javax.imageio header
  * parse — format/width/height with no extra dependency). Audio/video have
  * no JDK demuxer, so [[FakeCodec]] remains as a clearly-marked
  * deterministic STUB (md5-derived pseudo-metadata) for those and for the
  * SQL-oracle-checkable query. The Spark-side plumbing is shared and is the
  * part that matters at 100 TB:
  *  - payloads stay `BinaryType` end to end (no string round-trips);
  *  - the codec is opened once per partition and fed fixed-size batches
  *    (the JVM mirror of Arrow-batch UDF shape — batching amortizes codec
  *    init/native-call overhead);
  *  - output is a typed `meta` struct column; the payload column can be
  *    dropped right after decode so wide binary data doesn't cross shuffles.
  */
object Multimodal {

  final case class MediaMeta(
      format: String, width: Int, height: Int, nFrames: Int, nBytes: Int)

  val metaType: StructType = StructType(Seq(
    StructField("format", StringType), StructField("width", IntegerType),
    StructField("height", IntegerType), StructField("n_frames", IntegerType),
    StructField("n_bytes", IntegerType)))

  /** Batched decoder interface; implementations must be Serializable.
    * `open()` per partition (native contexts, model handles), `decode` per
    * batch of payloads.
    */
  trait Codec extends Serializable {
    def open(): Unit = ()
    def close(): Unit = ()
    def decode(batch: Seq[Array[Byte]]): Seq[MediaMeta]
  }

  /** STUB codec — deterministic md5-derived pseudo-metadata standing in for
    * a real image/audio decoder (the container has no media libs). Every
    * field is a pure function of the bytes, so a SQL oracle can recompute it.
    */
  object FakeCodec extends Codec {
    private val formats = Array("jpeg", "png", "webp")

    private[operators] def hash32(bytes: Array[Byte]): Long = {
      val md = MessageDigest.getInstance("MD5")
      val hex = md.digest(bytes).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }

    def decode(batch: Seq[Array[Byte]]): Seq[MediaMeta] = batch.map { b =>
      if (b == null) MediaMeta(null, 0, 0, 0, 0)
      else {
        val h = hash32(b)
        MediaMeta(
          formats((h % 3).toInt),
          (64 + h % 512).toInt,
          (64 + (h / 512) % 512).toInt,
          ((b.length + FrameBytes - 1) / FrameBytes),
          b.length)
      }
    }
  }

  /** REAL image codec backed by `javax.imageio` (ships with the JDK — no
    * new dependency): format from the registered reader's name, true pixel
    * width/height from the image header. ImageIO readers parse dimensions
    * from the header without decoding pixel data for the common formats, so
    * the per-image cost is a few hundred bytes of parsing, not a full
    * decode. Images are single-frame; audio/video payloads stay on
    * [[FakeCodec]] (no demuxer in the JDK). Unreadable/corrupt payloads
    * yield a null format and zero dimensions rather than failing the task —
    * at corpus scale a crawl always contains broken files.
    */
  object ImageIoCodec extends Codec {
    def decode(batch: Seq[Array[Byte]]): Seq[MediaMeta] = batch.map { b =>
      if (b == null) MediaMeta(null, 0, 0, 0, 0)
      else {
        var meta = MediaMeta(null, 0, 0, 0, b.length)
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(b))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (readers.hasNext) {
            val r = readers.next()
            try {
              r.setInput(in)
              meta = MediaMeta(r.getFormatName.toLowerCase(java.util.Locale.ROOT),
                r.getWidth(0), r.getHeight(0), 1, b.length)
            } catch { case _: Exception => () } finally r.dispose()
          }
        } finally in.close()
        meta
      }
    }
  }

  /** Fixed stand-in frame size for the "video" framing stub. */
  val FrameBytes = 256

  /** Ingest a directory of media files as the engine's multimodal contract:
    * Spark's `binaryFile` source yields (path, modificationTime, length,
    * content binary) — the opaque-binary column feeds [[decodeMeta]] /
    * [[sampleFrames]] directly. `glob` (e.g. `*.jpg`) is pushed into the
    * file listing via pathGlobFilter, so non-matching files are never
    * opened; partition sizing follows spark.sql.files.maxPartitionBytes
    * like any file scan.
    */
  def readBinaryDir(spark: org.apache.spark.sql.SparkSession, dir: String,
      glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(dir)
  }

  /** Appends `meta: struct<format,width,height,n_frames,n_bytes>` by running
    * `codec` over `batchSize`-row batches per partition.
    */
  def decodeMeta(df: DataFrame, payload: Column, codec: Codec = FakeCodec,
      batchSize: Int = 64, out: String = "meta"): DataFrame = {
    val in = df.withColumn("__graft_payload", payload)
    val n = in.schema.size
    val outSchema = StructType(df.schema.fields :+ StructField(out, metaType))
    in.mapPartitions { rows =>
      codec.open()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => codec.close()))
      rows.grouped(batchSize).flatMap { batch =>
        val metas = codec.decode(batch.map(r =>
          r.getAs[Array[Byte]](n - 1)))
        batch.lazyZip(metas).map { (r, m) =>
          Row.fromSeq(r.toSeq.dropRight(1) :+
            Row(m.format, m.width, m.height, m.nFrames, m.nBytes))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic frame sampling for "video" payloads: `k` evenly-spaced
    * [[FrameBytes]]-sized frames as `array<binary>` — the Spark-side shape
    * of frame extraction (a real implementation swaps the slicer for a
    * demuxer). Codegen'd built-ins only; no UDF.
    */
  def sampleFrames(payload: Column, k: Int): Column = {
    val nFrames = ceil(length(payload).cast("double") / FrameBytes).cast("int")
    val idx = transform(sequence(lit(0), lit(k - 1)), i =>
      least(i * greatest(floor(nFrames / lit(k)).cast("int"), lit(1)), nFrames - 1))
    transform(array_distinct(idx), i =>
      substring(payload, (i * FrameBytes + 1).cast("int"), lit(FrameBytes)))
  }
}

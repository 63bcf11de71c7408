package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted through a batched
  * partition-level codec interface.
  *
  * All three modalities have REAL header codecs, pure JVM, no new
  * dependency: [[ImageIoCodec]] (JDK javax.imageio — format/pixel
  * dimensions), [[WavCodec]] (RIFF/WAVE chunk parse — rate/channels/
  * frames), [[Mp4Codec]] (ISO BMFF box parse — duration/timescale/tracks).
  * [[FakeCodec]] remains only as the clearly-marked deterministic FIXTURE
  * (md5-derived pseudo-metadata) backing the SQL-oracle-checkable query —
  * an oracle can recompute its fields, which no real decoder allows. The
  * Spark-side plumbing is shared and is the part that matters at 100 TB:
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

  /** REAL audio header codec: RIFF/WAVE container parsing in pure JVM code
    * (the format is a public spec — chunked little-endian header; no
    * decoder library needed because metadata lives in the `fmt `/`data`
    * chunk headers, not the samples). Field mapping onto [[MediaMeta]],
    * documented here as the audio contract:
    * `format` = "wav", `width` = sample rate (Hz), `height` = channel
    * count, `n_frames` = sample frames (data bytes / block align — the
    * literal WAV meaning of "frame"), `n_bytes` = payload size. Malformed
    * or truncated payloads yield a null format rather than failing the
    * task.
    */
  object WavCodec extends Codec {
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    private def tag(b: Array[Byte], i: Int): String =
      new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    private[operators] def parse(b: Array[Byte]): MediaMeta = {
      if (b == null) return MediaMeta(null, 0, 0, 0, 0)
      val none = MediaMeta(null, 0, 0, 0, b.length)
      // never-fail contract (same as ImageIoCodec): a crafted/corrupt chunk
      // layout must degrade to the null-format meta, not throw
      try {
        if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return none
        // Long cursor: chunk sizes are unsigned 32-bit, so an Int cursor can
        // wrap negative on a crafted size and index out of bounds
        var i = 12L
        var rate = 0L; var channels = 0; var blockAlign = 0; var dataBytes = -1L
        while (i + 8 <= b.length && (rate == 0L || dataBytes < 0L)) {
          val at = i.toInt
          val id = tag(b, at)
          val sz = le32(b, at + 4)
          if (id == "fmt " && sz >= 16 && i + 8 + 16 <= b.length) {
            channels = le16(b, at + 10)
            rate = le32(b, at + 12)
            blockAlign = le16(b, at + 20)
          } else if (id == "data") {
            // size may exceed the (possibly truncated) payload — clamp
            dataBytes = math.min(sz, b.length - i - 8)
          }
          i += 8L + sz + (sz & 1L) // chunks are word-aligned
        }
        if (rate <= 0L || channels <= 0 || dataBytes < 0L) none
        else MediaMeta("wav", rate.toInt, channels,
          (if (blockAlign > 0) dataBytes / blockAlign else 0L).toInt, b.length)
      } catch { case _: Exception => none }
    }

    def decode(batch: Seq[Array[Byte]]): Seq[MediaMeta] = batch.map(parse)
  }

  /** REAL video header codec: ISO BMFF / MP4 box parsing in pure JVM code
    * (the container layout is a public spec — ISO/IEC 14496-12: big-endian
    * `[size][type][payload]` boxes, nestable). Walks the top-level boxes to
    * `moov`, reads `mvhd` (movie header: timescale + duration) and counts
    * `trak` children. Field mapping onto [[MediaMeta]], documented here as
    * the video contract: `format` = "mp4", `width` = duration in
    * MILLISECONDS (duration/timescale·1000 — the presentation length; pixel
    * dimensions live per-track in `tkhd` and are codec-specific),
    * `height` = track count, `n_frames` = mvhd timescale (ticks/second),
    * `n_bytes` = payload size. Malformed/truncated payloads yield a null
    * format rather than failing the task — same never-fail contract as the
    * other codecs.
    */
  object Mp4Codec extends Codec {
    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def be64(b: Array[Byte], i: Int): Long =
      (be32(b, i) << 32) | be32(b, i + 4)
    private def tag(b: Array[Byte], i: Int): String =
      new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Walk sibling boxes in [from, to); returns (boxType → (payloadStart,
      * payloadEnd)) for the FIRST occurrence plus a count per type. Long
      * cursor + explicit bounds: 64-bit `size == 1` boxes and crafted sizes
      * must not wrap or index out of range.
      */
    private def walk(b: Array[Byte], from: Long, to: Long)
        : (Map[String, (Long, Long)], Map[String, Int]) = {
      var i = from
      var first = Map.empty[String, (Long, Long)]
      var counts = Map.empty[String, Int]
      while (i + 8 <= to) {
        val size32 = be32(b, i.toInt)
        val tp = tag(b, i.toInt + 4)
        val (payload, boxEnd) =
          if (size32 == 1L && i + 16 <= to) (i + 16, i + be64(b, i.toInt + 8))
          else if (size32 == 0L) (i + 8, to) // box extends to end
          else (i + 8, i + size32)
        if (boxEnd < payload || boxEnd > to) return (first, counts) // malformed
        if (!first.contains(tp)) first += tp -> (payload, boxEnd)
        counts += tp -> (counts.getOrElse(tp, 0) + 1)
        i = boxEnd
      }
      (first, counts)
    }

    private[operators] def parse(b: Array[Byte]): MediaMeta = {
      if (b == null) return MediaMeta(null, 0, 0, 0, 0)
      val none = MediaMeta(null, 0, 0, 0, b.length)
      try {
        // an MP4 starts with an ftyp box (spec-recommended first box)
        if (b.length < 12 || tag(b, 4) != "ftyp") return none
        val (top, _) = walk(b, 0L, b.length.toLong)
        val (moovStart, moovEnd) = top.getOrElse("moov", return none)
        val (inMoov, moovCounts) = walk(b, moovStart, moovEnd)
        val (mv, mvEnd) = inMoov.getOrElse("mvhd", return none)
        // mvhd: version(1) flags(3), then v0: ctime(4) mtime(4)
        // timescale(4) duration(4); v1: ctime(8) mtime(8) timescale(4)
        // duration(8)
        val version = b(mv.toInt)
        val (timescale, duration) =
          // guards cover the LAST byte each branch reads: v1's be64 at
          // mv+24 needs mv+32, v0's be32 at mv+16 needs mv+20
          if (version == 1 && mv + 32 <= mvEnd)
            (be32(b, mv.toInt + 20), be64(b, mv.toInt + 24))
          else if (version == 0 && mv + 20 <= mvEnd)
            (be32(b, mv.toInt + 12), be32(b, mv.toInt + 16))
          else return none
        // degrade to null-format on values the Int meta cannot carry
        // (crafted timescale > 2^31, 64-bit duration whose *1000 would
        // overflow, duration in ms beyond Int range) — fabricating wrapped
        // numbers would violate the never-fail-never-lie contract
        if (timescale <= 0L || timescale > Int.MaxValue ||
          duration < 0L || duration > Long.MaxValue / 1000L) return none
        val durMs = duration * 1000L / timescale
        if (durMs > Int.MaxValue) return none
        MediaMeta("mp4", durMs.toInt, moovCounts.getOrElse("trak", 0),
          timescale.toInt, b.length)
      } catch { case _: Exception => none }
    }

    def decode(batch: Seq[Array[Byte]]): Seq[MediaMeta] = batch.map(parse)
  }

  /** Magic-byte auto-dispatch codec — the honest production default: image
    * signatures route to [[ImageIoCodec]] (real header decode), RIFF/WAVE
    * to [[WavCodec]] (real header parse), `ftyp` to [[Mp4Codec]] (real ISO
    * BMFF box parse), and anything unrecognized yields
    * a null-format meta carrying only `n_bytes` (NOT [[FakeCodec]]'s
    * pseudo-metadata — an unknown payload should look unknown downstream,
    * so quality filters can quarantine it instead of trusting fabricated
    * dimensions).
    */
  object AutoCodec extends Codec {
    private def isImage(b: Array[Byte]): Boolean =
      b.length >= 4 && (
        (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 0xff.toByte && b(1) == 0xd8.toByte) ||                // jpeg
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
        (b(0) == 'B' && b(1) == 'M') ||
        (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' &&
          b(11) == 'P'))                                              // webp
    private def isWav(b: Array[Byte]): Boolean =
      b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
    private def isMp4(b: Array[Byte]): Boolean =
      b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

    def decode(batch: Seq[Array[Byte]]): Seq[MediaMeta] = batch.map { b =>
      if (b == null) MediaMeta(null, 0, 0, 0, 0)
      else if (isWav(b)) WavCodec.parse(b)
      else if (isMp4(b)) Mp4Codec.parse(b)
      else if (isImage(b)) ImageIoCodec.decode(Seq(b)).head
      else MediaMeta(null, 0, 0, 0, b.length)
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

package graft.engine

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Thin Hadoop FileSystem helpers (reference:
  * data-process/spark-process/src/main/scala/process/HdfsHelper.scala:20-77 —
  * cat / append / ls / fileStatus). Works against any Hadoop-supported
  * scheme (hdfs://, s3a://, file://) via the session's Hadoop conf.
  */
class FsUtils(conf: Configuration) {

  def this(spark: SparkSession) = this(spark.sparkContext.hadoopConfiguration)

  private def fs(p: Path): FileSystem = p.getFileSystem(conf)

  def cat(path: String): String = {
    val p = new Path(path)
    val in = fs(p).open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  def write(path: String, content: String): Unit = {
    val p = new Path(path)
    val out = fs(p).create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Append when the scheme supports it, else read-modify-write (local fs
    * and object stores don't implement append).
    */
  def append(path: String, content: String): Unit = {
    val p = new Path(path)
    val f = fs(p)
    if (!f.exists(p)) write(path, content)
    else
      try {
        val out = f.append(p)
        try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
      } catch {
        case _: UnsupportedOperationException | _: java.io.IOException =>
          write(path, cat(path) + content)
      }
  }

  def ls(path: String): Seq[String] = {
    val p = new Path(path)
    fs(p).listStatus(p).toSeq.map(_.getPath.toString).sorted
  }

  def fileStatus(path: String): Option[FileStatus] = {
    val p = new Path(path)
    val f = fs(p)
    if (f.exists(p)) Some(f.getFileStatus(p)) else None
  }

  def mtime(path: String): Long =
    fileStatus(path).map(_.getModificationTime).getOrElse(-1L)

  def exists(path: String): Boolean = fileStatus(path).isDefined

  /** Recursive delete; no-op (false) when the path does not exist. */
  def rm(path: String): Boolean = {
    val p = new Path(path)
    val f = fs(p)
    f.exists(p) && f.delete(p, true)
  }

  /** Rename (same filesystem). The atomic-swap primitive the staged
    * writes build on; fails loudly rather than leaving a half-move.
    */
  def mv(src: String, dst: String): Unit = {
    val s = new Path(src)
    val d = new Path(dst)
    require(fs(s).rename(s, d), s"rename failed: $src -> $dst")
  }

  /** Recursive copy (source kept). Snapshot primitive — e.g. preserving a
    * streaming checkpoint generation before a later incarnation advances
    * it, so crash-replay recovery can be exercised from the older state.
    * Fails loudly on an existing destination (ADVICE r19): FileUtil.copy
    * would MERGE into an existing directory, and a snapshot silently
    * contaminated by leftover state is worse than no snapshot — callers
    * that mean to replace must `rm` first, visibly.
    */
  def cp(src: String, dst: String): Unit = {
    val s = new Path(src)
    val d = new Path(dst)
    require(!fs(d).exists(d),
      s"cp destination already exists: $dst — a copy would merge into " +
        "it; rm it first if replacement is intended")
    require(org.apache.hadoop.fs.FileUtil.copy(fs(s), s, fs(d), d,
      false, true, conf), s"copy failed: $src -> $dst")
  }
}

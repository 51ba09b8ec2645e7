package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Hadoop-FileSystem helpers for commit markers and small control files
  * (round-7 ADVICE fix). The resume/commit guards previously probed
  * java.io.File, which silently reports "missing" on any non-local
  * default filesystem — making parameter-drift protection and resume
  * skipping inert exactly where the stage data lives. Resolving each
  * path through `Path.getFileSystem` keeps local paths working (the
  * sandbox, unit tests) and makes HDFS/object-store URIs behave the same
  * as the stage writes themselves, which already go through Hadoop.
  */
object Fs {

  /** Fallback Hadoop conf from the global active/default session. In a
    * multi-session process (tests that create and stop sessions) this
    * can differ from a caller's own session — call sites that hold a
    * session should pass its `sparkContext.hadoopConfiguration`
    * explicitly via the `conf` parameter.
    */
  private def sessionConf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def exists(path: String, conf: Configuration = sessionConf): Boolean = {
    val p = new Path(path)
    p.getFileSystem(conf).exists(p)
  }

  /** True when `path` exists and contains at least one entry. */
  def nonEmptyDir(path: String,
                  conf: Configuration = sessionConf): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  def readString(path: String, conf: Configuration = sessionConf): String = {
    val p = new Path(path)
    val in = p.getFileSystem(conf).open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Write a small control file (parent directories created by the FS). */
  def writeString(path: String, s: String,
                  overwrite: Boolean = false,
                  conf: Configuration = sessionConf): Unit = {
    val p = new Path(path)
    val out = p.getFileSystem(conf).create(p, overwrite)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  /** Create an empty marker file (parents included), like touch. */
  def touch(path: String, conf: Configuration = sessionConf): Unit =
    writeString(path, "", overwrite = true, conf = conf)
}

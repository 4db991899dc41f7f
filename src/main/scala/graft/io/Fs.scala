package graft.io

import org.apache.spark.sql.SparkSession

/** Hadoop-filesystem helpers for index-path METADATA (tombstones,
  * applied-batch markers). `java.io.File` only sees the driver's local
  * disk — on a real cluster these paths live on HDFS/S3, so existence
  * checks and lifecycle deletes must go through the Hadoop FS API the
  * write path already uses. */
object Fs {

  private def fs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def exists(spark: SparkSession, dir: String): Boolean = {
    val (f, p) = fs(spark, dir); f.exists(p)
  }

  def delete(spark: SparkSession, dir: String): Unit = {
    val (f, p) = fs(spark, dir); f.delete(p, true): Unit
  }

  /** Create `dir/name` iff absent; true when THIS call created it. */
  def createMarker(spark: SparkSession, dir: String, name: String): Boolean = {
    val (f, p) = fs(spark, dir)
    f.mkdirs(p)
    f.createNewFile(new org.apache.hadoop.fs.Path(p, name))
  }

  def listDirNames(spark: SparkSession, dir: String): Seq[String] = {
    val (f, p) = fs(spark, dir)
    f.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }

  /** Recursive count of parquet data files under `dir` (markers,
    * _SUCCESS and other metadata excluded) — the small-files debt
    * metric of an incrementally appended store. Driver-side O(files)
    * METADATA listing, never a data scan; at 100 TB this is the same
    * listing cost every query's file-source planning already pays. */
  def countDataFiles(spark: SparkSession, dir: String): Long = {
    val (f, p) = fs(spark, dir)
    val it = f.listFiles(p, true)
    var n = 0L
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }

  /** Last-write time of `dir` in epoch millis: the max mtime over its
    * immediate entries, falling back to the directory's own status
    * when empty. The max-over-entries form is deliberate — appending
    * a file into an old directory refreshes its age, and object
    * stores (S3A) carry no real directory mtime, only the entries'. */
  def dirLastWriteMillis(spark: SparkSession, dir: String): Long = {
    val (f, p) = fs(spark, dir)
    val entries = f.listStatus(p)
    if (entries.isEmpty) f.getFileStatus(p).getModificationTime
    else entries.map(_.getModificationTime).max
  }
}

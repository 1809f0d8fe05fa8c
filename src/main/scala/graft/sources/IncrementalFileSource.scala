package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import graft.checkpoint.Checkpoint

/** Incremental file listing keyed by modification time — the raw-layer
  * "stream" (≡ reference S1/S2, scripts/raw-bronze.py:59-85: boto3
  * `list_objects_v2` with `LastModified > last_processed_time`, or local
  * `os.walk` + `getmtime`, dispatched on URL scheme).
  *
  * Built on the Hadoop FileSystem API so the same code lists local dirs,
  * HDFS, or an object store — the driver touches only file *metadata*
  * (names + mtimes), never data; listing 100k raw files is a single
  * recursive LIST. The checkpoint stores the max mtime of the files
  * actually processed (not wall-clock), so a slow producer can never race
  * the committer.
  */
final class IncrementalFileSource(
    spark: SparkSession,
    dir: String,
    checkpointPath: String,
    suffix: String = ".csv") {

  import IncrementalFileSource._

  private val hconf = spark.sparkContext.hadoopConfiguration
  private val dirPath = new Path(dir)
  private def fs: FileSystem = dirPath.getFileSystem(hconf)

  def lastProcessedTime: Option[Long] =
    Checkpoint.loadKey(checkpointPath, KEY).map(_.toLong)

  /** Files with mtime strictly greater than the checkpoint, with their
    * mtimes; empty when nothing new (≡ scripts/raw-bronze.py:59-67). */
  def newFiles(): Seq[(String, Long)] = {
    if (!fs.exists(dirPath)) return Nil
    val since = lastProcessedTime.getOrElse(Long.MinValue)
    val it = fs.listFiles(dirPath, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(suffix)
          && f.getModificationTime > since)
        buf += ((f.getPath.toString, f.getModificationTime))
    }
    buf.sortBy(_._1).toSeq
  }

  /** Commit the checkpoint — called ONLY after the downstream table write
    * succeeded (the reference's commit gate, scripts/raw-bronze.py:250-255). */
  def commit(processed: Seq[(String, Long)]): Unit =
    if (processed.nonEmpty)
      Checkpoint.save(checkpointPath,
        Map(KEY -> processed.map(_._2).max.toString))
}

object IncrementalFileSource {
  val KEY = "last_processed_time"
}

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
  * actually processed (not wall-clock) plus the file NAMES at that exact
  * mtime, so a producer writing a second file in the same mtime granule
  * after our listing is still picked up next run.
  *
  * Contract (inherent to mtime checkpointing, same as the reference's):
  * delivery must be mtime-monotonic. A file landing with an mtime BELOW
  * the committed boundary (mtime-preserving copies like `rsync -a`,
  * producer clock skew) is not detected — feeds like that should use
  * [[graft.streaming.StreamingRawToBronze]], whose seen-files log tracks
  * names, not times.
  */
final class IncrementalFileSource(
    spark: SparkSession,
    dir: String,
    checkpointPath: String,
    suffix: String = ".csv") {

  import IncrementalFileSource._

  // sessionState.newHadoopConf() folds runtime `spark.conf.set("fs...")`
  // entries on top of the core conf (same resolution as Spark's sources)
  private val hconf = spark.sessionState.newHadoopConf()
  private val dirPath = new Path(dir)
  private def fs: FileSystem = dirPath.getFileSystem(hconf)

  def lastProcessedTime: Option[Long] =
    Checkpoint.loadKey(checkpointPath, KEY).map(_.toLong)

  private def boundaryFiles: Set[String] =
    Checkpoint.loadKey(checkpointPath, BOUNDARY_KEY)
      .map(_.split('\n').toSet).getOrElse(Set.empty)

  /** Files newer than the checkpoint, with their mtimes; empty when
    * nothing new (≡ scripts/raw-bronze.py:59-67). Files AT the boundary
    * mtime are re-listed and filtered against the names processed at
    * that tick — a producer writing a second file in the same mtime
    * granule just after our listing can therefore never be skipped
    * (a strict `mtime > checkpoint` filter silently would). */
  def newFiles(): Seq[(String, Long)] = {
    if (!fs.exists(dirPath)) return Nil
    val since = lastProcessedTime.getOrElse(Long.MinValue)
    val seenAtBoundary = boundaryFiles
    val it = fs.listFiles(dirPath, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      val m = f.getModificationTime
      if (f.isFile && f.getPath.getName.endsWith(suffix)
          && (m > since ||
            (m == since && !seenAtBoundary(f.getPath.toString))))
        buf += ((f.getPath.toString, m))
    }
    buf.sortBy(_._1).toSeq
  }

  /** Commit the checkpoint — called ONLY after the downstream table write
    * succeeded (the reference's commit gate, scripts/raw-bronze.py:250-255).
    * Stores the max processed mtime plus the file names at that exact
    * mtime, so the next listing can detect same-tick late arrivals. */
  def commit(processed: Seq[(String, Long)]): Unit =
    if (processed.nonEmpty) {
      val maxM = processed.map(_._2).max
      val prevBoundary =
        if (lastProcessedTime.contains(maxM)) boundaryFiles else Set.empty
      val atBoundary = processed.collect { case (p, m) if m == maxM => p }
        .toSet ++ prevBoundary
      Checkpoint.save(checkpointPath, Map(
        KEY -> maxM.toString,
        BOUNDARY_KEY -> atBoundary.mkString("\n")))
    }
}

object IncrementalFileSource {
  val KEY = "last_processed_time"
  val BOUNDARY_KEY = "files_at_boundary"
}

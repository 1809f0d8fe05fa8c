package graft.lake

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local-filesystem plumbing fix (optimization guide §6, I/O): without
  * libhadoop native bindings, Hadoop's `RawLocalFileSystem` FORKS a
  * `chmod` child process for every file create and mkdir
  * (`Shell.execCommand` from `setPermission`) — measured ~15-30 ms per
  * fork, several forks per written file. Every engine write (data
  * files, manifest chunks, v-JSON commits, checkpoints) pays it, and
  * it dominates the fixed cost of small commits: a 5-row
  * `df.write.parquet` spends ~130 ms of its ~185 ms wall in these
  * forks.
  *
  * On a local filesystem the JVM already creates files/dirs honoring
  * the process umask, so the follow-up chmod to the SAME umask-derived
  * mode is a no-op; skipping it changes nothing observable (verified
  * by the unchanged oracle/golden runs). Sessions opt in with
  *
  *   .config("spark.hadoop.fs.file.impl",
  *           classOf[graft.lake.NoForkLocalFileSystem].getName)
  *
  * Production deployments on HDFS/S3 never hit this path (different
  * scheme), and a deployment WITH libhadoop native IO never forks in
  * the first place — this override only removes the no-native fallback
  * cost. Non-umask modes (e.g. 777 requests) are also skipped; graft
  * never writes such files.
  */
class NoForkRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}

/** `file://` FileSystem with checksum behavior identical to Hadoop's
  * default [[LocalFileSystem]], minus the permission forks. */
class NoForkLocalFileSystem
    extends LocalFileSystem(new NoForkRawLocalFileSystem)

/** [[org.apache.hadoop.fs.AbstractFileSystem]] twin for FileContext
  * users (Spark structured-streaming checkpoint managers resolve
  * `fs.AbstractFileSystem.file.impl`): delegates straight to the
  * no-fork raw fs. */
class NoForkLocalFs(uri: URI, conf: Configuration)
    extends DelegateToFileSystem(uri, new NoForkRawLocalFileSystem, conf,
      "file", false)

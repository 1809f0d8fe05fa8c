package graft.checkpoint

import java.nio.charset.StandardCharsets
import java.util.UUID

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path}

import scala.jdk.CollectionConverters._

/** Tiny JSON checkpoint document with atomic commit (tmp + rename),
  * scheme-dispatched through the Hadoop `FileSystem` API — a `file://`
  * path hits the local FS, an `hdfs://`/`s3a://` path hits the cluster
  * store, with no code change (the same dispatch every other component —
  * LakeTable, IncrementalFileSource — already uses).
  *
  * Capability parity with the reference's S3/local checkpoint helpers
  * (reference: scripts/raw-bronze.py:36-53,87-99 and
  * scripts/bronze-silver.py:78-112): a single small JSON object holding
  * e.g. `last_processed_time` or `last_processed_snapshot`, written only
  * AFTER the downstream table commit succeeds (the commit gate that gives
  * the pipeline its at-least-once / idempotent-upsert semantics).
  *
  * At cluster scale this file lives on the shared FS (HDFS/S3); the write
  * is a single small object PUT — never a bottleneck. Single-writer is
  * assumed (the reference's orchestration is strictly sequential).
  */
object Checkpoint {

  private val mapper = new ObjectMapper()

  /** Hadoop configuration resolved from the active Spark session, so
    * `spark.hadoop.*` settings (s3a credentials, endpoints, fs.defaultFS)
    * reach the checkpoint FileSystem exactly as they reach every other
    * component. `sessionState.newHadoopConf()` (not the bare
    * `sparkContext.hadoopConfiguration`) folds SQLConf entries set at
    * runtime via `spark.conf.set("fs...")` on top — the same resolution
    * Spark's own data sources use. Falls back to a bare `Configuration`
    * only when no session exists (pure-JVM tests). */
  private def conf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Load the checkpoint as a string->string map; None if absent/corrupt. */
  def load(path: String): Option[Map[String, String]] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else
      try {
        val root = mapper.readTree(
          graft.lake.LakeTable.readString(fs, p))
        val m = root.properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap
        Some(m)
      } catch { case _: Exception => None }
  }

  def loadKey(path: String, key: String): Option[String] =
    load(path).flatMap(_.get(key))

  /** Atomically write the checkpoint: tmp file + overwriting rename
    * (`FileContext.rename(OVERWRITE)` — atomic on HDFS and POSIX; on an
    * object store it degrades to copy+delete, which is still safe here
    * because the reader treats a torn/absent file as "no checkpoint"). */
  def save(path: String, doc: Map[String, String]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (p.getParent != null) fs.mkdirs(p.getParent)
    val node = mapper.createObjectNode()
    doc.foreach { case (k, v) => node.put(k, v) }
    val json = mapper.writeValueAsString(node)
    val tmp = new Path(
      if (p.getParent != null) p.getParent else new Path("."),
      s".ckpt-${UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, false)
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val fc = FileContext.getFileContext(p.toUri, conf)
    fc.rename(tmp, p, Options.Rename.OVERWRITE)
  }

  def delete(path: String): Unit = {
    val p = new Path(path)
    p.getFileSystem(conf).delete(p, false)
  }
}

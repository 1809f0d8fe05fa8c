package graft.checkpoint

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.ObjectMapper

import scala.jdk.CollectionConverters._

/** Tiny JSON checkpoint document with atomic commit (tmp + rename).
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

  /** Load the checkpoint as a string->string map; None if absent/corrupt. */
  def load(path: String): Option[Map[String, String]] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) None
    else
      try {
        val root = mapper.readTree(Files.readAllBytes(p))
        val m = root.properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap
        Some(m)
      } catch { case _: Exception => None }
  }

  def loadKey(path: String, key: String): Option[String] =
    load(path).flatMap(_.get(key))

  /** Atomically write the checkpoint: tmp file + ATOMIC_MOVE rename. */
  def save(path: String, doc: Map[String, String]): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val node = mapper.createObjectNode()
    doc.foreach { case (k, v) => node.put(k, v) }
    val json = mapper.writeValueAsString(node)
    val tmp: Path = Files.createTempFile(
      if (p.getParent != null) p.getParent else Paths.get("."), ".ckpt", ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def delete(path: String): Unit = Files.deleteIfExists(Paths.get(path))
}

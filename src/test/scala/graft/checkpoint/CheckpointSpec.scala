package graft.checkpoint

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Checkpoint must ride the Hadoop FileSystem API (scheme dispatch —
  * parity with the reference's S3-vs-local branch,
  * scripts/raw-bronze.py:36-53,87-99), with atomic overwriting rename. */
class CheckpointSpec extends AnyFunSuite {

  test("save/load roundtrip on a plain local path") {
    val p = TestSpark.tmpDir("ckpt") + "/state/ckpt.json"
    assert(Checkpoint.load(p).isEmpty)
    Checkpoint.save(p, Map("last_processed_time" -> "123.5"))
    assert(Checkpoint.loadKey(p, "last_processed_time").contains("123.5"))
    // overwrite (the atomic-rename path over an existing file)
    Checkpoint.save(p, Map("last_processed_time" -> "456.0", "extra" -> "x"))
    assert(Checkpoint.load(p).contains(
      Map("last_processed_time" -> "456.0", "extra" -> "x")))
  }

  test("save/load roundtrip on a file://-qualified URI") {
    val p = "file://" + TestSpark.tmpDir("ckpt-uri") + "/sub/ckpt.json"
    Checkpoint.save(p, Map("last_processed_snapshot" -> "7"))
    assert(Checkpoint.loadKey(p, "last_processed_snapshot").contains("7"))
    Checkpoint.delete(p)
    assert(Checkpoint.load(p).isEmpty)
  }

  test("corrupt checkpoint reads as absent") {
    val dir = TestSpark.tmpDir("ckpt-bad")
    val p = dir + "/ckpt.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p), "{not json")
    assert(Checkpoint.load(p).isEmpty)
  }

  test("no tmp files left behind after save") {
    val dir = TestSpark.tmpDir("ckpt-tmp")
    val p = dir + "/ckpt.json"
    Checkpoint.save(p, Map("k" -> "v"))
    Checkpoint.save(p, Map("k" -> "w"))
    // hidden .crc siblings are Hadoop LocalFileSystem bookkeeping; the
    // invariant is no VISIBLE tmp garbage
    val left = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSeq
    assert(left.sorted == Seq("ckpt.json"), s"leftovers: $left")
  }
}

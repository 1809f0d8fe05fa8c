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

  test("runtime session fs.* conf reaches the checkpoint FileSystem") {
    // a filesystem scheme registered ONLY via spark.conf.set at runtime
    // (a SQLConf entry, invisible to sparkContext.hadoopConfiguration) —
    // resolvable iff Checkpoint builds its conf with
    // sessionState.newHadoopConf(), the fix under test
    val spark = TestSpark.spark
    val key = "fs.graftckpt.impl"
    assert(spark.sparkContext.hadoopConfiguration.get(key) == null,
      "precondition: scheme must not leak into the core hadoop conf")
    spark.conf.set(key, classOf[GraftCkptTestFileSystem].getName)
    try {
      val dir = TestSpark.tmpDir("ckpt-scheme")
      val plain = dir + "/ckpt.json"
      Checkpoint.save(plain, Map("k" -> "via-session-conf"))
      // read the SAME file back through the session-registered scheme
      assert(Checkpoint.loadKey(s"graftckpt://$plain", "k")
        .contains("via-session-conf"))
    } finally spark.conf.unset(key)
  }
}

/** Local-FS clone under a scheme that exists only in the test session's
  * runtime SQLConf (see the session-conf test above). */
class GraftCkptTestFileSystem
    extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftckpt:///")
}

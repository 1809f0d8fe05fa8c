package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IncrementalFileSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def write(dir: String, name: String, mtime: Long): String = {
    val p = Paths.get(dir, name)
    Files.writeString(p, "h\n1\n")
    p.toFile.setLastModified(mtime)
    p.toString
  }

  test("same-mtime-tick late arrival is picked up, not skipped") {
    val dir = TestSpark.tmpDir("incsrc")
    val ckpt = s"$dir/ckpt.json"
    val src = new IncrementalFileSource(spark, dir, ckpt)
    val t = (System.currentTimeMillis() / 1000) * 1000 // whole tick

    write(dir, "a.csv", t)
    val batch1 = src.newFiles()
    assert(batch1.map(f => Paths.get(f._1).getFileName.toString) ==
      Seq("a.csv"))
    src.commit(batch1)

    // a second file lands in the SAME mtime tick after the listing —
    // the strict > filter would lose it forever; the boundary names
    // must rescue it
    write(dir, "b.csv", t)
    val batch2 = src.newFiles()
    assert(batch2.map(f => Paths.get(f._1).getFileName.toString) ==
      Seq("b.csv"))
    src.commit(batch2)

    // and committing the same-tick batch extends the boundary set:
    // nothing is re-read, nothing is lost
    assert(src.newFiles().isEmpty)

    // strictly newer file still flows
    write(dir, "c.csv", t + 2000)
    assert(src.newFiles().map(f =>
      Paths.get(f._1).getFileName.toString) == Seq("c.csv"))
  }

  test("non-matching suffixes are ignored") {
    val dir = TestSpark.tmpDir("incsrc2")
    val src = new IncrementalFileSource(spark, dir, s"$dir/ckpt.json")
    write(dir, "junk.tmp", System.currentTimeMillis())
    write(dir, "data.csv", System.currentTimeMillis())
    assert(src.newFiles().map(f =>
      Paths.get(f._1).getFileName.toString) == Seq("data.csv"))
  }
}

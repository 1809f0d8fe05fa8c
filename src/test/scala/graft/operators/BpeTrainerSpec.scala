package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeTrainerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learns the classic merges on the Sennrich-style toy corpus") {
    // word counts: low×5, lower×2, newest×6, widest×3 — the corpus
    // from the BPE paper's worked example
    val docs = Seq(
      Seq.fill(5)("low"), Seq.fill(2)("lower"),
      Seq.fill(6)("newest"), Seq.fill(3)("widest")
    ).flatten.mkString(" ")
    val df = Seq(Tuple1(docs)).toDF("text")
    val merges = BpeTrainer.train(df, "text", numMerges = 4)
    // hand-derived rounds: (e,s)=9 beats the (s,t</w>)=9 tie on the
    // lexicographic break; then (es,t</w>)=9; then (l,o)=7; then the
    // 6-count tie (e,w)/(n,e)/(w,est</w>) goes to (e,w)
    assert(merges == Seq(("e", "s"), ("es", "t</w>"), ("l", "o"),
      ("e", "w")))
    // the pure reference segmenter agrees with the learned merges
    assert(BpeTrainer.segmentWord("newest", merges) ==
      Seq("n", "ew", "est</w>"))
    assert(BpeTrainer.segmentWord("low", merges) == Seq("lo", "w</w>"))
  }

  test("greedy left-to-right merging handles overlapping pairs") {
    // symbols a,a,a,a</w>; merge (a,a) greedily: first two fuse to
    // "aa", the third 'a' cannot fuse with "aa", the last is 'a</w>'
    val seg = BpeTrainer.segmentWord("aaaa", Seq(("a", "a")))
    assert(seg == Seq("aa", "a", "a</w>"))
  }

  test("min pair count stops training on a diverse corpus") {
    val df = Seq(Tuple1("ab cd ef gh")).toDF("text")
    val merges = BpeTrainer.train(df, "text", numMerges = 10,
      minPairCount = 2)
    assert(merges.isEmpty) // every pair occurs once
  }

  test("trained merges compress the real corpus vocabulary") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = BpeTrainer.train(docs, "text", numMerges = 8)
    assert(merges.length == 8)
    // applying the merges shortens frequent words' segmentations
    val words = Seq("table", "query", "value")
    val lens = words.map(w =>
      BpeTrainer.segmentWord(w, merges).length)
    assert(lens.exists(l => l < "table".length + 0),
      s"no compression: $lens")
  }
}
